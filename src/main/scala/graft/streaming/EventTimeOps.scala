package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time window transforms shared by the batch-verified queries
  * (SURVEY.md §2.2) and the live Structured Streaming pipelines — the
  * same code path runs under `read` and `readStream`, which is how the
  * reference's DStream window ops (window / reduceByKeyAndWindow /
  * updateStateByKey; /root/reference/streaming/.../dstream/) are
  * re-expressed on Spark 4.
  *
  * Window starts are emitted as epoch microseconds (long) so engine
  * timestamp precisions never leak into comparisons.
  */
object EventTimeOps {

  /** Tumbling event-time window aggregate per key. */
  def tumblingAgg(df: DataFrame, tsCol: String, duration: String, key: String): DataFrame =
    df.groupBy(window(col(tsCol), duration), col(key))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(
        unix_micros(col("window.start")).as("ws"),
        col(key), col("n"), col("total_value"))

  /** Sliding event-time window aggregate (reduceByKeyAndWindow shape). */
  def slidingAgg(df: DataFrame, tsCol: String, duration: String, slide: String, key: String): DataFrame =
    df.groupBy(window(col(tsCol), duration, slide), col(key))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(
        unix_micros(col("window.start")).as("ws"),
        col(key), col("n"), col("total_value"))

  /** Gap-based session windows per key (updateStateByKey shape). */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String, key: String): DataFrame =
    df.groupBy(session_window(col(tsCol), gap), col(key))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .select(
        unix_micros(col("session_window.start")).as("sess_start"),
        col(key), col("n"), col("total_value"))

  /** Deterministic streaming-dedup shape: first event per key ordered by
    * (ts, tiebreak). Implemented as a partitioned row_number so the kept
    * row is well-defined (plain dropDuplicates keeps an arbitrary row). */
  def firstPerKey(df: DataFrame, keys: Seq[String], tsCol: String, tiebreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(tiebreak))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
