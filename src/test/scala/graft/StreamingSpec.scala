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

  test("stream-stream join matches the batch join on the same windows") {
    val src1 = Files.createTempDirectory("graft-ss-clicks").toString
    val src2 = Files.createTempDirectory("graft-ss-buys").toString
    val ev = Tables.events(spark, sfDir).cache()
    val clicksB = ev.filter(col("event_type") === "click")
    val buysB = ev.filter(col("event_type") === "purchase")

    val joined = Pipelines.streamStreamJoin(
      Pipelines.eventStream(spark, src1, eventsSchema)
        .filter(col("event_type") === "click"),
      Pipelines.eventStream(spark, src2, eventsSchema)
        .filter(col("event_type") === "purchase"))
    val q = Pipelines.startToMemory(joined, "ss_join_test", "append")
    ev.filter(col("event_type") === "click").write.mode("append").parquet(src1)
    ev.filter(col("event_type") === "purchase").write.mode("append").parquet(src2)
    q.processAllAvailable()
    q.stop()

    val want = clicksB.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .join(buysB.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value")),
        expr("c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + interval 10 minutes"))
      .count()
    assert(spark.table("ss_join_test").count() == want)
    assert(want > 0, "test needs at least one click->purchase pair in range")
  }

  test("foreachBatch receives every micro-batch exactly once") {
    val src = Files.createTempDirectory("graft-feb-src").toString
    val seen = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val q = Pipelines.startForeachBatch(
      Pipelines.eventStream(spark, src, eventsSchema), "feb_test") { (batch, id) =>
      seen.put(id, batch.count())
    }
    val ev = Tables.events(spark, sfDir)
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    q.processAllAvailable()
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    val total = seen.values().stream().mapToLong(l => l).sum()
    assert(total == ev.count(), s"foreachBatch saw $total of ${ev.count()} rows")
    assert(seen.size() >= 2, "expected at least two micro-batches")
  }

  test("streaming query resumes from checkpoint without loss or duplication") {
    val src = Files.createTempDirectory("graft-ckpt-src").toString
    val out = Files.createTempDirectory("graft-ckpt-out").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val ev = Tables.events(spark, sfDir).cache()

    def start() = Pipelines.startToParquet(
      Pipelines.eventStream(spark, src, eventsSchema)
        .select(col("event_id"), col("user_id"), col("value")),
      out, ckpt)

    val q1 = start()
    ev.filter(col("event_id") % 2 === 0).write.mode("append").parquet(src)
    q1.processAllAvailable()
    q1.stop()

    // new data lands while the query is down; restart must pick it up
    ev.filter(col("event_id") % 2 === 1).write.mode("append").parquet(src)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val sunk = spark.read.parquet(out)
    assert(sunk.count() == ev.count(), "exactly-once across restart")
    assert(sunk.select("event_id").distinct().count() == ev.count(), "no duplicates")
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
