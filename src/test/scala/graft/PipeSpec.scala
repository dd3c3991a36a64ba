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
