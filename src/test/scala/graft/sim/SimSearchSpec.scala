package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimSearchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("brute-force knn returns k ranked neighbors, no self matches") {
    val res = Knn.query(spark, dir).collect()
    assert(res.length === 50, "5 queries x 10 neighbors")
    val byQuery = res.groupBy(_.getAs[Long]("query_id"))
    for ((q, rows) <- byQuery) {
      assert(rows.map(_.getAs[Long]("rank")).sorted === (1L to 10L).toArray)
      assert(!rows.exists(_.getAs[Long]("neighbor_id") == q), "no self match")
      val coss = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b }, "descending")
    }
  }

  test("lsh ann achieves reasonable recall vs brute force") {
    val e = graft.Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 20)
    val exact = Knn.bruteForce(e, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = LshAnn.annTopK(e, q, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"ANN recall@10 = $recall%.3f (candidates are a strict subset of corpus)")
    assert(recall >= 0.3, f"recall $recall%.3f too low — buckets too selective")
    assert(approx.size <= exact.size, "at most k per query")
  }
}
