package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{EventTimeOps, Pipelines}

class StreamingSpec extends SparkTestBase {

  private def eventsSchema = Tables.events(spark, sfDir).schema

  test("streaming tumbling agg over two micro-batches equals batch result") {
    val src = Files.createTempDirectory("graft-stream-src").toString
    val batchEvents = Tables.events(spark, sfDir).cache()

    val stream = Pipelines.hourlyTypeCounts(
      Pipelines.eventStream(spark, src, eventsSchema))
    val q = Pipelines.startToMemory(stream, "tumbling_test", "complete")

    // Feed in two chunks to force incremental micro-batch processing.
    batchEvents.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    q.processAllAvailable()
    batchEvents.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("tumbling_test")
      .orderBy("ws", "event_type").collect().toSeq
    val want = Pipelines.hourlyTypeCounts(batchEvents)
      .orderBy("ws", "event_type").collect().toSeq
    assert(got == want)
  }

  test("mapGroupsWithState running per-user agg accumulates across micro-batches") {
    val src = Files.createTempDirectory("graft-state-src").toString
    val batchEvents = Tables.events(spark, sfDir).cache()

    val typed = Pipelines.eventStream(spark, src, eventsSchema)
      .select(col("user_id"), col("ts"), col("value"))
      .as[Pipelines.UserEvent](org.apache.spark.sql.Encoders.product[Pipelines.UserEvent])
    val q = Pipelines.startToMemory(
      Pipelines.runningUserAgg(typed).toDF(), "running_test", "update")

    batchEvents.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    q.processAllAvailable()
    batchEvents.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    // The last snapshot per user (max n) must equal the batch count.
    val got = spark.table("running_test")
      .groupBy("user_id").agg(max("n").as("n"))
    val want = batchEvents.groupBy("user_id").agg(count(lit(1)).as("n"))
    val diff = got.join(want, "user_id")
      .filter(got("n") =!= want("n"))
    assert(diff.count() == 0)
    assert(got.count() == want.count())
  }

  test("watermarked append-mode window query emits finalized windows") {
    val src = Files.createTempDirectory("graft-wm-src").toString
    val batchEvents = Tables.events(spark, sfDir).cache()

    val stream = Pipelines.hourlyTypeCountsWatermarked(
      Pipelines.eventStream(spark, src, eventsSchema), "1 hour")
    val q = Pipelines.startToMemory(stream, "wm_test", "append")
    batchEvents.write.mode("append").parquet(src)
    q.processAllAvailable()
    // Advance the watermark past every window with a sentinel late batch.
    batchEvents.limit(0).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    // All windows strictly below (max ts - 1h watermark) must be finalized.
    val emitted = spark.table("wm_test").count()
    assert(emitted > 0, "append mode emitted nothing")
  }

  test("session windows via shared EventTimeOps match gaps-and-islands ground truth") {
    val ev = Tables.events(spark, sfDir)
    val sessions = EventTimeOps.sessionAgg(ev, "ts", "1 hour", "user_id")
    // Total events across sessions == total events; session starts unique per user.
    assert(sessions.agg(sum("n")).head.getLong(0) == ev.count())
    val dupStarts = sessions.groupBy("user_id", "sess_start").count().filter(col("count") > 1)
    assert(dupStarts.count() == 0)
  }
}
