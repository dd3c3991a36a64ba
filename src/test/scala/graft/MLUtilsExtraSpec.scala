package graft

import org.apache.spark.sql.functions._
import graft.operators.MLUtilsExtra

/** DataValidators + RDDFunctions.sliding parity checks. */
class MLUtilsExtraSpec extends SparkTestBase {

  test("label validators accept valid labels and reject invalid ones") {
    import TestSpark.spark.implicits._
    val ok = Seq(0.0, 1.0, 1.0, 0.0).toDF("label")
    val bad = Seq(0.0, 1.0, 2.0).toDF("label")
    val frac = Seq(0.0, 0.5).toDF("label")
    assert(MLUtilsExtra.binaryLabelValid(ok, "label"))
    assert(!MLUtilsExtra.binaryLabelValid(bad, "label"))
    assert(!MLUtilsExtra.binaryLabelValid(frac, "label"))
    assert(MLUtilsExtra.multiLabelValid(bad, "label", k = 3))
    assert(!MLUtilsExtra.multiLabelValid(bad, "label", k = 2))
    assert(!MLUtilsExtra.multiLabelValid(frac, "label", k = 2))
    assert(!MLUtilsExtra.multiLabelValid(Seq(-1.0, 0.0).toDF("label"), "label", 2))
    // NULL labels are a data error, not a silently-dropped row: without
    // the isNull arm the three-valued predicate filters nulls out and
    // the validator wrongly reports valid
    val withNull = Seq(Some(0.0), Some(1.0), None).toDF("label")
    assert(!MLUtilsExtra.binaryLabelValid(withNull, "label"))
    assert(!MLUtilsExtra.multiLabelValid(withNull, "label", k = 2))
  }

  test("sliding matches Scala's sliding over the ordered values, across partitions") {
    import TestSpark.spark.implicits._
    val values = (0 until 500).map(i => ((i * 37) % 1000).toLong).distinct
    val df = values.toDF("v").repartition(7)
    val got = MLUtilsExtra.sliding(df, col("v"), col("v"), windowSize = 3)
      .select("window").collect()
      .map(_.getSeq[Long](0).toList).sortBy(_.head)
    val want = values.sorted.sliding(3).filter(_.size == 3).map(_.toList).toArray
    assert(got.length == want.length, s"${got.length} windows vs ${want.length}")
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    // windowSize > count -> empty (the reference's contract)
    val tiny = Seq(1L, 2L).toDF("v")
    assert(MLUtilsExtra.sliding(tiny, col("v"), col("v"), 3).isEmpty)
    // per-group form windows within each partition key only
    val grouped = Seq((0, 1L), (0, 2L), (0, 3L), (1, 10L), (1, 11L))
      .toDF("g", "v")
    val gw = MLUtilsExtra.sliding(grouped, col("v"), col("v"), 2,
      partitionCol = Some(col("g"))).select("g", "window").collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toList)).sortBy(x => (x._1, x._2.head))
    assert(gw.toList == List((0, List(1L, 2L)), (0, List(2L, 3L)), (1, List(10L, 11L))))
  }
}
