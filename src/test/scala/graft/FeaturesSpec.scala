package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import graft.operators.Features

class FeaturesSpec extends SparkTestBase {

  private val twoColSchema = StructType(Seq(
    StructField("a", StringType), StructField("b", StringType)))

  private def table(counts: Map[(String, String), Int]) = {
    val rows: java.util.List[Row] = new java.util.ArrayList()
    counts.foreach { case ((a, b), n) => (0 until n).foreach(_ => rows.add(Row(a, b))) }
    spark.createDataFrame(rows, twoColSchema)
  }

  test("chiSqPValue matches the classic chi-squared table at the 5% critical values") {
    // (dof, critical value at alpha = 0.05) — both odd and even dofs
    val crit = Seq(1 -> 3.841, 2 -> 5.991, 4 -> 9.488, 5 -> 11.070, 10 -> 18.307)
    crit.foreach { case (dof, x) =>
      val p = Features.chiSqPValue(x, dof)
      assert(math.abs(p - 0.05) < 5e-4, s"P(chi2_$dof > $x) = $p, want ~0.05")
    }
    assert(Features.chiSqPValue(0.0, 3) == 1.0)
    assert(Features.chiSqPValue(1000.0, 2) < 1e-100)
  }

  test("chiSqTest: perfectly uniform table gives statistic 0, p = 1; diagonal gives p ~ 0") {
    val uniform = table((for { a <- Seq("x", "y", "z"); b <- Seq("p", "q", "r") }
      yield (a, b) -> 10).toMap)
    val u = Features.chiSqTest(uniform, "a", "b").head
    assert(u.getDouble(0) == 0.0 && u.getLong(1) == 4L && u.getDouble(2) == 1.0,
      s"uniform 3x3: $u")

    val diag = table(Map(("x", "p") -> 30, ("y", "q") -> 30, ("z", "r") -> 30,
      ("x", "q") -> 1, ("y", "r") -> 1, ("z", "p") -> 1))
    val d = Features.chiSqTest(diag, "a", "b").head
    assert(d.getDouble(0) > 50.0 && d.getDouble(2) < 1e-6,
      s"strong diagonal must reject independence: $d")
  }

  test("fs02 on the real table: independent generator dims, series consistent with igamc") {
    val out = Features.fs02.run(spark, sfDir).head
    val stat = out.getDouble(0)
    val dof = out.getLong(1)
    val p = out.getDouble(2)
    assert(dof == 24L, s"5 quantity buckets x 7 line numbers -> dof 24, got $dof")
    assert(p > 0.001 && p < 0.999,
      s"independent generator dimensions must give an interior p-value, got $p (stat $stat)")
    val ref = Features.chiSqPValue(stat, dof.toInt)
    assert(math.abs(p - ref) < 1e-5,
      s"even-dof finite series $p must agree with the igamc path $ref")
  }
}
