package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pruned parquet readers for the driver-generated test tables.
  *
  * Reads are plain `spark.read.parquet` so Catalyst keeps full pushdown
  * freedom (filter pushdown + column pruning reach the scan). At cluster
  * scale the same call works on a directory of thousands of files; callers
  * never assume a partition count.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.parquet has shipped `ts` in two physical encodings across
    * corpus generations: TIMESTAMP(NANOS) (readable only as long via the
    * legacy conf) and native TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ or
    * TIMESTAMP depending on isAdjustedToUTC). Branch on the loaded dataType
    * so either corpus works; the UTC session timeZone makes the NTZ→TZ cast
    * lossless and keeps window/oracle semantics identical. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // set-if-unset (repeated conf mutation invalidates cached session
    // state); only affects NANOS columns, so harmless on a µs corpus
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: floor-divide, same truncation DuckDB applies
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already TimestampType
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
