package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.streaming.EventTimeOps

/** Batch-verified event-time window queries over the `events` table —
  * SURVEY.md §2.2. Each re-expresses a DStream operation of the reference
  * (window / reduceByKeyAndWindow / session state / dedup) through the
  * shared EventTimeOps transforms, which also run under readStream.
  */
object EventTime {

  /** Tumbling 1-hour windows per event type. */
  val s01 = Q.sql(
    "s01_tumbling_window",
    """SELECT CAST(epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS ws,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY ws, event_type
      |ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
    EventTimeOps.tumblingAgg(Tables.events(s, dir), "ts", "1 hour", "event_type")
      .orderBy("ws", "event_type")
  }

  /** Sliding 1-hour windows every 30 minutes: each event lands in 2
    * windows (k = 0,1 grid offsets in the oracle). */
  val s02 = Q.sql(
    "s02_sliding_window",
    """SELECT CAST(epoch_us(time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes') AS BIGINT) AS ws,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) g
      |GROUP BY ws, event_type
      |ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
    EventTimeOps.slidingAgg(Tables.events(s, dir), "ts", "1 hour", "30 minutes", "event_type")
      .orderBy("ws", "event_type")
  }

  /** Gap-based sessions (1 hour) per user — gaps-and-islands in the
    * oracle; Spark session_window starts a new session when
    * ts - prev_ts >= gap. */
  val s03 = Q.sql(
    "s03_session_window",
    """WITH marked AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL '1 hour' THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), numbered AS (
      |  SELECT user_id, ts, value,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM marked
      |)
      |SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS sess_start, user_id,
      |  count(*) AS n, round(sum(value), 2) AS total_value
      |FROM numbered
      |GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_start""".stripMargin) { (s, dir) =>
    EventTimeOps.sessionAgg(Tables.events(s, dir), "ts", "1 hour", "user_id")
      .orderBy("user_id", "sess_start")
  }

  /** Deterministic dedup: first event per (user, type) by (ts, event_id). */
  val s04 = Q.sql(
    "s04_event_dedup",
    """SELECT user_id, event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
      |FROM (
      |  SELECT user_id, event_type, event_id, ts,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
    EventTimeOps.firstPerKey(Tables.events(s, dir), Seq("user_id", "event_type"), "ts", "event_id")
      .select(col("user_id"), col("event_type"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .orderBy("user_id", "event_type")
  }

  /** Per-user per-day activity profile (countByValueAndWindow shape). */
  val s05 = Q.sql(
    "s05_user_activity",
    """SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |  count(*) AS n, count(DISTINCT event_type) AS n_types,
      |  round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY user_id, day
      |ORDER BY user_id, day""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct("event_type").as("n_types"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("user_id", "day")
  }

  /** Stream-to-static dimension join: events enriched with the customer
    * dimension (broadcast — the exact plan a streaming micro-batch uses). */
  val s06 = Q.sql(
    "s06_stream_batch_join",
    """SELECT c_mktsegment, event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type
      |ORDER BY c_mktsegment, event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .join(broadcast(Tables.customer(s, dir)), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("c_mktsegment", "event_type")
  }

  /** Top-2 event types per hour: windowed agg + per-window rank. */
  val s07 = Q.sql(
    "s07_window_topk",
    """SELECT ws, event_type, n, rk FROM (
      |  SELECT CAST(epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS ws,
      |    event_type, count(*) AS n,
      |    row_number() OVER (PARTITION BY time_bucket(INTERVAL '1 hour', ts)
      |                       ORDER BY count(*) DESC, event_type) AS rk
      |  FROM events GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type) t
      |WHERE rk <= 2
      |ORDER BY ws, rk""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"), col("n"))
    val w = Window.partitionBy("ws").orderBy(col("n").desc, col("event_type"))
    hourly.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .orderBy("ws", "rk")
  }

  /** Hour-over-hour delta per event type (lag across windows). */
  val s08 = Q.sql(
    "s08_window_delta",
    """SELECT ws, event_type, n,
      |  n - lag(n, 1) OVER (PARTITION BY event_type ORDER BY ws) AS delta
      |FROM (
      |  SELECT CAST(epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS ws,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY ws, event_type) t
      |ORDER BY event_type, ws""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"), col("n"))
    val w = Window.partitionBy("event_type").orderBy("ws")
    hourly
      .withColumn("delta", col("n") - lag("n", 1).over(w))
      .orderBy("event_type", "ws")
  }

  /** Incremental sliding window (reduceByKeyAndWindow-with-inverse parity):
    * same result as s02, but raw rows are aggregated once into slide-slice
    * partials and windows combine partials — the Expand runs over the
    * slice table, not the corpus. Oracle = s02's. */
  val s09 = Q.sql(
    "s09_sliding_incremental",
    """SELECT CAST(epoch_us(time_bucket(INTERVAL '30 minutes', ts) - k * INTERVAL '30 minutes') AS BIGINT) AS ws,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) g
      |GROUP BY ws, event_type
      |ORDER BY ws, event_type""".stripMargin) { (s, dir) =>
    EventTimeOps.slidingAggIncremental(
        Tables.events(s, dir), "ts", "1 hour", "30 minutes", "event_type")
      .orderBy("ws", "event_type")
  }

  /** Scalable AS-OF join: for each left row, the single right row with
    * the same `key` and the greatest `ts` not after the left row's —
    * point-in-time attribution/enrichment (the operator this Spark
    * lineage lacks natively; DuckDB/kdb ship it built in).
    *
    * NOT implemented as a range join: `l.key = r.key AND r.ts <= l.ts`
    * explodes into every-prior-row pairs before a per-row argmax prunes
    * them — quadratic in events-per-key, dead at 100 TB. Instead both
    * sides union into ONE keyed stream, sorted per key by (ts, side,
    * payload), and a running `last(right_payload, ignoreNulls)` window
    * carries the newest right row forward into each left row: one
    * shuffle on the key, one in-partition sort, zero join operators in
    * the plan (AsOfSpec locks that), each row touched once.
    *
    * Determinism: right rows sort before left rows at equal ts (<=
    * semantics), and equal-(key, ts) right rows tie-break by the full
    * payload struct — the lexicographically greatest payload wins.
    *
    * @param left  must contain `key` and `ts`
    * @param right must contain `key` and `ts`; all its other columns
    *              (plus `ts` itself) come back as `r_`-prefixed match
    *              columns, null where no right row is at or before
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(_ == key)
    val lp = struct(lCols.map(col): _*)
    val rp = struct(rPayload.map(col): _*)
    val lpType = left.select(lp).schema.head.dataType
    val rpType = right.select(rp).schema.head.dataType
    val l = left.select(col(key).as("_k"), col(ts).as("_t"), lit(0).as("_side"),
      lp.as("_lp"), lit(null).cast(rpType).as("_rp"))
    val r = right.select(col(key).as("_k"), col(ts).as("_t"), lit(1).as("_side"),
      lit(null).cast(lpType).as("_lp"), rp.as("_rp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").desc, col("_rp").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    l.unionByName(r)
      .withColumn("_match", last("_rp", ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
      .select(lCols.map(c => col(s"_lp.$c").as(c)) ++
        rPayload.map(c => col(s"_match.$c").as(s"r_$c")): _*)
  }

  /** Click-to-purchase attribution via [[asofJoin]]: each click event is
    * annotated with the same user's most recent purchase at or before
    * it. The oracle is the naive range join + per-click argmax — the
    * semantics the one-pass implementation must reproduce exactly. */
  val s10 = Q.sql(
    "s10_asof_join",
    """WITH clicks AS (SELECT DISTINCT event_id, user_id, ts FROM events
      |                WHERE event_type = 'click'),
      |purchases AS (SELECT DISTINCT user_id, ts, event_id AS p_event_id, value AS p_value
      |              FROM events WHERE event_type = 'purchase'),
      |ranked AS (
      |  SELECT c.event_id, c.user_id, CAST(epoch_us(c.ts) AS BIGINT) AS ts_us,
      |    p.p_event_id AS purchase_id, p.p_value AS purchase_value,
      |    CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us,
      |    row_number() OVER (PARTITION BY c.event_id, c.user_id, c.ts
      |                       ORDER BY p.ts DESC NULLS LAST, p.p_event_id DESC NULLS LAST) AS rk
      |  FROM clicks c LEFT JOIN purchases p ON p.user_id = c.user_id AND p.ts <= c.ts)
      |SELECT event_id, user_id, ts_us, purchase_id, purchase_value, purchase_ts_us
      |FROM ranked WHERE rk = 1
      |ORDER BY event_id, user_id, ts_us""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts").distinct()
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_event_id"), col("value").as("p_value"))
      .distinct()
    asofJoin(clicks, purchases, "user_id", "ts")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("r_p_event_id").as("purchase_id"), col("r_p_value").as("purchase_value"),
        unix_micros(col("r_ts")).as("purchase_ts_us"))
      .orderBy("event_id", "user_id", "ts_us")
  }

  /** Scalable RANGE (interval) join: all (left, right) pairs sharing
    * `key` with `right.rts ∈ [left.lts, left.lts + windowMicros]`.
    *
    * Spark plans a raw inequality join as BroadcastNestedLoop — an
    * all-pairs scan per key that dies at scale. Binning turns it into an
    * EQUALITY join: right rows land in bin `rts div W`, each left row's
    * window spans exactly bins `lts div W` and `+1` (bin width == window
    * width), so the left side fans out ×2, the join runs hash-partitioned
    * on (key, bin), and the exact range predicate filters inside the
    * join. A right row lives in ONE bin, so no pair can match twice — no
    * dedup pass. `div` (exact integer division) computes bins: a double
    * `/`+floor could flip a boundary bin at large epochs.
    *
    * @param lts,rts epoch-microsecond long columns, assumed non-negative
    *                (`div` truncates toward zero, so pre-1970 stamps
    *                would misalign one bin — floor-divide if you need
    *                them); all other column names must be disjoint
    *                between the two sides
    */
  def intervalJoinBinned(left: DataFrame, lts: String, right: DataFrame, rts: String,
      key: String, windowMicros: Long): DataFrame = {
    // exact integer division via the registered `div` (IntegralDivide)
    // function — pure Column construction, so odd column names that
    // would need backtick-quoting in SQL text still resolve
    def bin(c: String) = call_function("div", col(c), lit(windowMicros))
    val l = left.withColumn("_bin", explode(array(bin(lts), bin(lts) + 1L)))
    val r = right.withColumn("_bin", bin(rts))
    l.join(r, Seq(key, "_bin"))
      .filter(col(rts) >= col(lts) && col(rts) <= col(lts) + windowMicros)
      .drop("_bin")
  }

  /** View-to-purchase window attribution via [[intervalJoinBinned]]:
    * every (view, purchase) pair per user where the purchase follows the
    * view within 24 hours. The oracle is the naive inequality join. */
  val s11 = Q.sql(
    "s11_interval_join",
    """WITH v AS (SELECT DISTINCT event_id, user_id, ts FROM events
      |           WHERE event_type = 'view'),
      |p AS (SELECT DISTINCT event_id, user_id, ts FROM events
      |      WHERE event_type = 'purchase')
      |SELECT v.event_id AS view_id, v.user_id,
      |  CAST(epoch_us(v.ts) AS BIGINT) AS view_ts_us,
      |  p.event_id AS purchase_id, CAST(epoch_us(p.ts) AS BIGINT) AS purchase_ts_us
      |FROM v JOIN p ON p.user_id = v.user_id
      |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
      |ORDER BY view_id, v.user_id, view_ts_us, purchase_id, purchase_ts_us""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val dayUs = 24L * 3600L * 1000000L
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("view_ts_us")).distinct()
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_ts_us")).distinct()
    intervalJoinBinned(v, "view_ts_us", p, "purchase_ts_us", "user_id", dayUs)
      .select("view_id", "user_id", "view_ts_us", "purchase_id", "purchase_ts_us")
      .orderBy("view_id", "user_id", "view_ts_us", "purchase_id", "purchase_ts_us")
  }

  val all: Seq[Q] = Seq(s01, s02, s03, s04, s05, s06, s07, s08, s09, s10, s11)
}
