package graft.operators

import org.apache.spark.sql.Dataset

/** External-process piping (reference core/src/main/scala/org/apache/
  * spark/rdd/PipedRDD.scala:1 — `RDD.pipe`): each PARTITION's rows
  * stream through one instance of a shell command, the command's stdout
  * lines become the output rows. Re-expressed on `Dataset[String]` via
  * `mapPartitions`: the subprocess spans the whole partition (one
  * process per task, exactly the reference's granularity — per-ROW
  * processes would be three orders of magnitude more spawns), a writer
  * thread feeds stdin while the task thread consumes stdout, so a
  * command that buffers arbitrarily (sort, uniq) cannot deadlock the
  * pipe.
  *
  * Scale: the command must be installed on every executor (the same
  * operational contract as the reference); throughput is bounded by the
  * subprocess, not Spark — use for legacy per-line tools a pipeline
  * can't avoid, native columnar functions otherwise. Output order
  * follows the command's output per partition; like the reference, no
  * cross-partition ordering is implied.
  */
object Pipe {

  def pipe(ds: Dataset[String], command: Seq[String],
           env: Map[String, String] = Map.empty): Dataset[String] = {
    require(command.nonEmpty, "pipe: empty command")
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val pb = new ProcessBuilder(command: _*)
        env.foreach { case (k, v) => pb.environment().put(k, v) }
        pb.redirectErrorStream(false)
        val proc = pb.start()
        // If the downstream consumer abandons the iterator early (e.g. a
        // limit), kill the subprocess at task end rather than leaking it.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            if (proc.isAlive) proc.destroyForcibly()
          })
        // Drain stderr on a dedicated daemon thread (the reference's
        // PipedRDD stderr-reader): a command writing more than the OS
        // pipe buffer (~64 KiB) to stderr would otherwise block on
        // write while the task thread waits on stdout — task hang.
        val errDrain = new Thread(() => {
          val err = new java.io.BufferedReader(new java.io.InputStreamReader(
            proc.getErrorStream, java.nio.charset.StandardCharsets.UTF_8))
          try {
            var l = err.readLine(); var n = 0L
            while (l != null) {
              // echo a bounded prefix (diagnostics), swallow-but-drain the
              // rest so a chatty command can't flood the executor log
              if (n < 100) System.err.println(s"[graft-pipe] $l")
              n += 1; l = err.readLine()
            }
            if (n > 100) System.err.println(
              s"[graft-pipe] ... ${n - 100} further stderr lines suppressed")
          } catch { case _: java.io.IOException => () } finally err.close()
        }, "graft-pipe-stderr")
        errDrain.setDaemon(true)
        errDrain.start()
        val writer = new Thread(() => {
          val out = new java.io.PrintWriter(new java.io.BufferedWriter(
            new java.io.OutputStreamWriter(proc.getOutputStream,
              java.nio.charset.StandardCharsets.UTF_8)))
          try rows.foreach(out.println)
          finally out.close()
        }, "graft-pipe-stdin")
        writer.setDaemon(true)
        writer.start()
        val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
          proc.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        new Iterator[String] {
          private var nextLine: String = reader.readLine()
          override def hasNext: Boolean = {
            if (nextLine == null) {
              // drain done: surface a nonzero exit as a task failure
              // instead of silently truncated output
              val rc = proc.waitFor()
              if (rc != 0) throw new RuntimeException(
                s"piped command ${command.head} exited with $rc")
            }
            nextLine != null
          }
          override def next(): String = {
            val l = nextLine; nextLine = reader.readLine(); l
          }
        }
      }
    }
  }
}
