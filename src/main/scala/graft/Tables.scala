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
  /** events.parquet carries TIMESTAMP(NANOS), which Spark 4 only reads as
    * long via the legacy conf; convert to microsecond TimestampType with
    * floor division — the same truncation DuckDB applies reading nanos. */
  def events(s: SparkSession, d: String): DataFrame = {
    // set-if-unset: repeated conf mutation invalidates cached session
    // state on every call
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
