package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import java.nio.file.{Files, Paths}

/** Plan-evidence dumper (r16 optimization round): writes the
  * `.explain("formatted")` text of registered queries to
  * `<outDir>/<name>.txt`, so plan-shape claims in OPTIMIZATION_rN.md are
  * checkable without running Spark. Usage:
  *
  *   tools/run.sh graft.PlanDump <sfDir> <outDir> <query>[,<query>...]
  *
  * Notes: this dumps the plan of the DataFrame the registered entry
  * RETURNS. Driver-iterated trainers do their heavy work in actions
  * inside the entry (the returned frame is often a small certificate
  * table); for those the evidence lives in the per-iteration job
  * structure, which the dump still reflects through the final frame's
  * lineage (checkpointed leaves vs composed projections).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: graft.PlanDump <sfDir> <outDir> <query>[,<query>...]")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    val names = args.drop(2).flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    // execution-shape evidence: count the jobs/stages/tasks the whole
    // entry submits (driver-iterated trainers do their work in actions,
    // not in the returned frame's plan — the job count IS the claim)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })
    for (n <- names) {
      try {
        val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(mode)
        df.write.format("noop").mode("overwrite").save()
        // listener events are async; block until the bus has delivered
        // everything (deterministic, unlike a fixed sleep — r16 advisor)
        org.apache.spark.sql.graftshim.GraftDatasetFactory.drainListenerBus(spark)
        Files.writeString(Paths.get(s"$outDir/$n.txt"),
          plan + s"\n\n# executed end-to-end (incl. noop sink): jobs=${jobs.get - j0} " +
            s"stages=${stages.get - s0} tasks=${tasks.get - t0}\n")
        System.err.println(s"[plandump] wrote $n jobs=${jobs.get - j0} stages=${stages.get - s0}")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
