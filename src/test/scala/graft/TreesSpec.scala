package graft

import org.apache.spark.sql.functions._
import graft.operators.Trees

class TreesSpec extends SparkTestBase {

  test("tree recovers planted axis-aligned splits exactly") {
    import TestSpark.spark.implicits._
    // four quadrants with distinct labels: x0 <=> 0.5, x1 <=> 0.3
    val df = (0 until 800).map { i =>
      val x0 = (i % 40) / 40.0
      val x1 = ((i * 13) % 40) / 40.0
      val label = (if (x0 <= 0.5) "a" else "b") + (if (x1 <= 0.3) "0" else "1")
      (x0, x1, label)
    }.toDF("x0", "x1", "label")
    val (assigned, model) = Trees.train(
      df, Seq(col("x0"), col("x1")), col("label"), depth = 2, bins = 40)
    // all four leaves pure: training accuracy 1.0
    val leafPred = model.leafClass.toSeq.toDF("node", "pred")
    val correct = assigned.join(broadcast(leafPred), Seq("node"))
      .select(avg((col("label") === col("pred")).cast("double"))).head.getDouble(0)
    assert(correct == 1.0, s"planted quadrant accuracy $correct")
    assert(model.leafClass.size == 4 && model.splits.size == 3,
      s"want 3 splits + 4 leaves, got ${model.splits.size}/${model.leafClass.size}")
  }

  test("training is deterministic across runs") {
    import TestSpark.spark.implicits._
    val df = (0 until 500).map { i =>
      ((i % 23).toDouble, ((i * 7) % 19).toDouble, if ((i * 3) % 7 < 3) "x" else "y")
    }.toDF("x0", "x1", "label")
    val m1 = Trees.train(df, Seq(col("x0"), col("x1")), col("label"), 3, 16)._2
    val m2 = Trees.train(df, Seq(col("x0"), col("x1")), col("label"), 3, 16)._2
    assert(m1.splits == m2.splits && m1.leafClass == m2.leafClass)
  }

  test("dt01 on the real table: bounded leaf summary, accuracy >= majority") {
    val out = Trees.dt01.run(spark, sfDir).collect()
    assert(out.length <= 8 && out.nonEmpty, s"${out.length} leaves")
    val li = Tables.lineitem(spark, sfDir)
    val total = li.count()
    assert(out.map(_.getLong(2)).sum == total, "leaf rows must cover the table")
    val majority = li.groupBy("l_returnflag").count()
      .agg(max("count")).head.getLong(0)
    val correct = out.map(_.getLong(3)).sum
    assert(correct >= majority,
      s"majority-vote leaves can never undercut the majority class: $correct < $majority")
  }
}
