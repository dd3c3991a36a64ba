package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface — the Spark-4 face of the reference's input/output
  * formats (Spark 1.3 text/json/parquet sources and DStream file inputs).
  *
  * Readers take explicit schemas: at 100 TB, schema inference is a full
  * extra pass over the data. Writers expose the two layouts that matter
  * at scale: date/key partitioning (partition pruning on read) and
  * bucketing (co-located joins with no shuffle on the bucketed key).
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Hive-style partitioned parquet: directory per partition value →
    * partition pruning turns key-range scans into file skips. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table: joins/aggs on the bucket key skip their
    * shuffle entirely when both sides share the layout. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCol: String, sortCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** [[writeBucketed]] with an explicit external location, so callers can
    * lay out bucketed data outside the session warehouse (e.g. a scratch
    * dir shared by repeated runs). */
  def writeBucketedAt(df: DataFrame, table: String, path: String, buckets: Int,
                      bucketCol: String, sortCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
}
