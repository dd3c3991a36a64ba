package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through a `noop` sink so the full result is
  * materialized (a bare count() would let Catalyst prune the computed
  * columns and undercount the work). A warmup query first absorbs JVM /
  * codegen / parquet-footer startup cost so per-query numbers reflect
  * steady-state throughput.
  *
  * De-noising: every query runs once per round for `rounds` (default 3)
  * full interleaved passes, and the reported number is the per-query
  * MEDIAN. Interleaving (round-robin, not back-to-back repeats) means a
  * transient contention spike on a shared machine hits at most one of a
  * query's samples, so the median survives a contended sandbox.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: one scan-agg absorbs session/codegen/scan setup cost
    exec("q01_agg")

    // time budget: always complete round 1 (full coverage); later rounds
    // only start while under budget, so a heavily contended machine gets
    // a complete single-pass result instead of a timeout. The default must
    // comfortably exceed one CONTENDED full pass (~900-950 s observed), or
    // rounds 2-3 never start and the "median" degenerates to a single
    // contended sample — hence 3600, not 900.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "3600").toDouble
    val start = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - start) / 1e9
    val names = SparkEntry.queries.keys.toSeq.sorted
    val samples = (1 to rounds).flatMap { r =>
      if (r == 1 || elapsed < budgetSec) names.map(n => n -> exec(n)) else Nil
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def median(xs: Seq[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.isEmpty) -1.0 else ok(ok.size / 2)
    }
    def r3(v: Double): Double = math.round(v * 1000.0) / 1000.0
    val results = names.map(n => n -> r3(median(samples(n))))
    val roundsRun = samples.values.map(_.size).max
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    // one parse-friendly JSON line, flushed straight to stdout (the
    // forked JVM inherits stdout — no sbt [info] prefix, see build.sbt).
    // Headline fields (total, rounds actually run) come FIRST so a
    // tail-truncated capture still carries the number that matters.
    println(s"""{"metric":"total","value":$total,"unit":"sec","rounds":$roundsRun,"sf":"$sfDir","queries":$qs}""")
    Console.flush()
    spark.stop()
  }
}
