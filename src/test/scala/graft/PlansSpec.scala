package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.plans.GraftFunctions

class PlansSpec extends SparkTestBase {

  test("native float_cosine is bit-identical to the HOF cosine") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir).limit(100)
    val both = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        call_function("float_cosine", col("a.embedding"), col("b.embedding")).as("native"),
        TextFunctions.cosine(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0,
      "native expression must reproduce the HOF arithmetic exactly")
  }

  test("float_cosine participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val df = emb.select(
      call_function("float_cosine", col("embedding"), col("embedding")).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"float_cosine fell out of codegen:\n$p")
    assert(df.filter(abs(col("c") - 1.0) > 1e-9).count() == 0,
      "self-cosine must be 1")
  }

  test("optimizer rule rewrites the HOF cosine into the native expression") {
    graft.plans.GraftRewrites.enable(spark)
    try {
      val emb = Tables.embeddings(spark, sfDir).limit(50)
      val df = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"),
          TextFunctions.cosine(col("a.embedding"), col("b.embedding")).as("c"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("float_cosine"),
        s"rule did not fire:\n${optimized.take(800)}")
      // and the rewrite is result-preserving
      val vals = df.collect().map(_.getDouble(2))
      assert(vals.forall(v => v >= -1.0001 && v <= 1.0001))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.RewriteHofCosine)
    }
  }

  test("registered function resolves from SQL text") {
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    val r = s2.sql("SELECT float_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
      .head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
