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

  /** Incremental sliding window aggregate — the batch face of
    * reduceByKeyAndWindow WITH inverse reduce (reference
    * streaming/src/main/scala/org/apache/spark/streaming/dstream/
    * PairDStreamFunctions.scala:290): raw rows are folded ONCE into
    * per-(slide-slice, key) partials, and each sliding window combines
    * only the duration/slide slice partials it covers (the "panes"
    * technique). [[slidingAgg]] expands every RAW row into
    * duration/slide window copies before aggregating; here that Expand
    * moves above the first aggregate, so its input is the tiny slice
    * table — at a 1-hour window / 1-minute slide that is 60× less
    * expanded data. Combining partials by addition also avoids the
    * float-drift of literally subtracting expired slices from a running
    * aggregate while keeping the one-touch-per-row property that is the
    * point of the inverse-reduce optimization.
    *
    * Requires duration to be an exact multiple of slide (as
    * reduceByKeyAndWindow does). Result is identical to [[slidingAgg]].
    */
  def slidingAggIncremental(
      df: DataFrame, tsCol: String, duration: String, slide: String, key: String): DataFrame = {
    val durUs = intervalMicros(duration)
    val slideUs = intervalMicros(slide)
    require(durUs % slideUs == 0, s"duration $duration must be a multiple of slide $slide")
    val k = (durUs / slideUs).toInt
    val slices = df.groupBy(window(col(tsCol), slide), col(key))
      .agg(count(lit(1)).as("_n"), sum("value").as("_sum"))
      .select(unix_micros(col("window.start")).as("slice_us"),
        col(key), col("_n"), col("_sum"))
    // a slice starting at t contributes to the k windows starting at
    // t, t-slide, ..., t-(k-1)*slide — exactly window()'s row->window
    // assignment, applied to partials
    slices
      .select(col(key), col("_n"), col("_sum"),
        explode(array((0 until k).map(i => col("slice_us") - lit(i.toLong * slideUs)): _*)).as("ws"))
      .groupBy(col("ws"), col(key))
      .agg(sum("_n").as("n"), round(sum("_sum"), 2).as("total_value"))
      .select(col("ws"), col(key), col("n"), col("total_value"))
  }

  /** String interval → microseconds (day-time intervals only). */
  private[graft] def intervalMicros(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"month intervals are not fixed-length: $s")
    iv.days * 86400000000L + iv.microseconds
  }

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
