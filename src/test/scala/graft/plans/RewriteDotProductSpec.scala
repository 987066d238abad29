package graft.plans

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class RewriteDotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.util.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("the optimizer rule rewrites the HOF fold into FloatVecDot") {
    GraftOptimizations.install(spark)
    graft.expressions.GraftFunctions.register(spark)
    // parquet-backed input: a local Seq would be constant-folded into a
    // LocalRelation before the plan can be inspected
    val df = emb.select(col("vec_id"),
      Similarity.dotd(col("embedding"), col("embedding")).as("dot"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("floatvecdot"),
      s"expected rewrite in plan:\n$optimized")
    // rewritten result == portable fold result, bit for bit
    val viaRule = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaExpr = emb.select(col("vec_id"),
      org.apache.spark.sql.functions.expr("graft_dot(embedding, embedding)").as("dot"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaRule == viaExpr)
    assert(viaRule.values.forall(_ > 0.0))
  }

  test("non-matching folds are left alone") {
    GraftOptimizations.install(spark)
    // different zero literal → must NOT rewrite
    val df = emb.select(
      aggregate(zip_with(col("embedding"), col("embedding"),
          (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (acc, x) => acc + x).as("dot_plus_one"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("floatvecdot"))
    assert(df.count() == 500)
  }
}
