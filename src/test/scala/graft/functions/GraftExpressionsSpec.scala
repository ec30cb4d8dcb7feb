package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    val rng = new scala.util.Random(3)
    (0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rng.nextGaussian()), Array.fill(64)(rng.nextGaussian())))
      .toDF("id", "a", "b")
  }

  test("fused dot/cosine are bit-identical to the HOF forms") {
    val df = vecs.select(
      GraftFunctions.dot_product($"a", $"b").as("dot_fused"),
      VectorOps.dot($"a", $"b").as("dot_hof"),
      GraftFunctions.cosine_sim($"a", $"b").as("cos_fused"),
      VectorOps.cosine($"a", $"b").as("cos_hof"))
    val rows = df.collect()
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1)), "dot bit-equal")
    assert(rows.forall(r => r.getDouble(2) == r.getDouble(3)), "cosine bit-equal")
  }

  test("expressions are usable from SQL after registration") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_tbl")
    val r = spark.sql(
      "SELECT cosine_sim(a, b) AS c, dot_product(a, a) AS n2 FROM vecs_tbl LIMIT 5")
      .collect()
    assert(r.length === 5)
    assert(r.forall(row => math.abs(row.getDouble(0)) <= 1.0 + 1e-9))
    assert(r.forall(row => row.getDouble(1) > 0.0))
  }

  test("type checking rejects non-array arguments") {
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("x", "y")
        .select(GraftFunctions.dot_product($"x", $"y")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array"))
  }
}
