package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}
import org.apache.spark.sql.types.StructType

/** Live Structured Streaming pipelines — the Spark-4 re-expression of the
  * reference's DStream programs (file/receiver input → windowed transform
  * → output; /root/reference/streaming/.../StreamingContext.scala).
  * Micro-batch sources replace receivers; watermarks bound state exactly
  * where the reference bounded DStream window retention.
  */
object Pipelines {

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserRunning(n: Long, total: Double)
  final case class UserSnapshot(user_id: Long, n: Long, total_value: Double)

  /** File-source stream of events with a known schema (streaming sources
    * cannot infer schemas; at scale this is a bucketed landing dir fed by
    * upstream writers). */
  def eventStream(spark: SparkSession, srcDir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(srcDir)

  /** Tumbling window counts with a watermark bounding state: late data
    * beyond the delay is dropped instead of growing state forever. */
  def hourlyTypeCountsWatermarked(events: DataFrame, delay: String = "2 hours"): DataFrame =
    EventTimeOps.tumblingAgg(events.withWatermark("ts", delay), "ts", "1 hour", "event_type")

  /** Same aggregate without watermark, for complete-mode verification
    * against the batch-verified tumblingAgg. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    EventTimeOps.tumblingAgg(events, "ts", "1 hour", "event_type")

  /** Custom keyed state (updateStateByKey shape): per-user running count +
    * total maintained across micro-batches via mapGroupsWithState. */
  def runningUserAgg(events: Dataset[UserEvent]): Dataset[UserSnapshot] = {
    implicit val stateEnc = Encoders.product[UserRunning]
    implicit val outEnc = Encoders.product[UserSnapshot]
    implicit val keyEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(0L, 0.0))
          var n = prev.n
          var total = prev.total
          batch.foreach { e => n += 1; total += e.value }
          state.update(UserRunning(n, total))
          UserSnapshot(uid, n, total)
      }
  }

  /** Start a query into an in-memory table (testing / interactive). */
  def startToMemory(df: DataFrame, name: String, mode: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()

  /** Production-shaped sink: partitioned parquet with checkpointing —
    * exactly-once per micro-batch, resumable after failure. */
  def startToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** Watermarked stream-stream inner join: each side keeps only the state
    * the 10-minute join window needs — the DStream-era join(otherStream)
    * with bounded state instead of unbounded RDD retention. */
  def streamStreamJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p, expr(
      """c_user = p_user AND
        |p_ts >= c_ts AND
        |p_ts <= c_ts + interval 10 minutes""".stripMargin))
  }

  /** foreachBatch escape hatch: arbitrary batch-DataFrame logic per
    * micro-batch (multi-sink writes, upserts) with the batch id for
    * idempotence — the DStream foreachRDD analog. */
  def startForeachBatch(df: DataFrame, name: String)(
      handle: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .queryName(name)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        handle(batch.toDF(), id)
      }
      .start()
}
