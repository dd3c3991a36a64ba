package graft

import org.apache.spark.sql.functions._
import graft.operators.EventTime

class AsOfSpec extends SparkTestBase {

  test("asof join picks the latest right row at or before each left row") {
    import TestSpark.spark.implicits._
    val left = Seq(
      (100L, 1L, 0L),   // before any purchase -> null
      (101L, 1L, 5L),   // equal ts matches (<= semantics)
      (102L, 1L, 12L),  // between 10 and future -> 10
      (103L, 2L, 7L))   // key with no right rows at all -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, 10.0),
      (1L, 5L, 50.0),
      (1L, 10L, 99.0))
      .toDF("user_id", "ts", "value")
    val got = EventTime.asofJoin(left, right, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got(100L) == (None, None), "no right row at or before ts=0")
    assert(got(101L) == (Some(5L), Some(50.0)), "equal ts must match")
    assert(got(102L) == (Some(10L), Some(99.0)), "latest at-or-before wins")
    assert(got(103L) == (None, None), "unmatched key is null-extended")
  }

  test("asof join ties at equal (key, ts) break to the greatest payload, deterministically") {
    import TestSpark.spark.implicits._
    val left = Seq((7L, 1L, 5L)).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, 5L, 201L), (1L, 5L, 305L), (1L, 5L, 112L))
      .toDF("user_id", "ts", "p_id")
    // output columns: event_id, user_id, ts, r_ts, r_p_id
    val rows = EventTime.asofJoin(left, right, "user_id", "ts").collect()
    assert(rows.length == 1 && rows.head.getLong(4) == 305L,
      s"max payload must win the tie, got ${rows.toSeq}")
  }

  test("asof join plans as union + window — zero join operators") {
    val p = EventTime.s10.run(spark, sfDir).queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"asof must not plan a join:\n$p")
    assert(p.contains("Window"), s"expected the running-last window:\n$p")
  }

  test("interval join matches boundaries inclusively, across bins, never across keys") {
    import TestSpark.spark.implicits._
    val left = Seq((1L, 10L, 0L), (2L, 10L, 90L), (3L, 99L, 0L))
      .toDF("view_id", "user_id", "lt")
    val right = Seq(
      (10L, 10L, 0L),    // == left 1 start (inclusive)
      (11L, 10L, 100L),  // == left 1 end (inclusive); in left 2's window
      (12L, 10L, 101L),  // past left 1's end; in left 2's window (bin 1)
      (13L, 10L, 191L),  // past left 2's end
      (14L, 99L, 50L))   // other key: only left 3 may match
      .toDF("purchase_id", "user_id", "rt")
    val got = EventTime.intervalJoinBinned(left, "lt", right, "rt", "user_id", 100L)
      .select("view_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L), (3L, 14L)),
      s"wrong pair set: $got")
  }

  test("interval join plans as an equality join, not a nested-loop scan") {
    val df = EventTime.s11.run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to all-pairs:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected a keyed equality join:\n$p")
  }
}
