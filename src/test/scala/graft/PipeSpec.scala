package graft

import graft.operators.Pipe

/** RDD.pipe parity (core/rdd/PipedRDD.scala:1): per-partition external
  * process, exactly-once lines, loud nonzero-exit failure. */
class PipeSpec extends SparkTestBase {

  test("pipe streams every row through the command exactly once") {
    import TestSpark.spark.implicits._
    val rows = (0 until 5000).map(i => s"line-$i")
    val ds = rows.toDS().repartition(6)
    val out = Pipe.pipe(ds, Seq("tr", "a-z", "A-Z")).collect().sorted
    assert(out.toSeq == rows.map(_.toUpperCase).sorted,
      "every line must pass through the subprocess exactly once")
  }

  test("a buffering command (sort) cannot deadlock the partition pipe") {
    import TestSpark.spark.implicits._
    val ds = (0 until 20000).map(i => f"k${i % 97}%s").toDS().repartition(2)
    // sort buffers ALL stdin before writing stdout: without the writer
    // thread this deadlocks once the pipe buffer fills
    val out = Pipe.pipe(ds, Seq("sort")).count()
    assert(out == 20000)
  }

  test("a stderr-heavy command cannot block on a full stderr pipe") {
    import TestSpark.spark.implicits._
    // write ~160 KiB to stderr BEFORE any stdout: without the stderr
    // drain thread the subprocess blocks once the ~64 KiB OS pipe
    // buffer fills and the task hangs on stdout readLine forever
    val ds = (0 until 10).map(_.toString).toDS().coalesce(1)
    val script = "i=0; while [ $i -lt 3000 ]; do " +
      "echo 'stderr filler line to overflow the pipe buffer' >&2; " +
      "i=$((i+1)); done; cat"
    val out = Pipe.pipe(ds, Seq("sh", "-c", script)).collect().sorted
    assert(out.toSeq == (0 until 10).map(_.toString).sorted,
      "stdout must flow even when stderr greatly exceeds the pipe buffer")
  }

  test("a failing command fails the task loudly, not with truncated output") {
    import TestSpark.spark.implicits._
    val ds = (0 until 100).map(_.toString).toDS().coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      Pipe.pipe(ds, Seq("false")).collect()
    }
    assert(e.getMessage.contains("exited with") ||
      Option(e.getCause).exists(_.getMessage.contains("exited with")))
  }
}
