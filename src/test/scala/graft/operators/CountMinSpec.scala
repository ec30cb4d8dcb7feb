package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {

  test("cms: one-sided guarantee holds on every probe; estimate is tight for heavy keys") {
    val rows = CountMin.query(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length <= 20) // sf0.001 has < 20 users
    rows.foreach { r =>
      assert(r.getBoolean(4), s"est < exact — the CMS invariant is broken: $r")
      assert(r.getLong(3) >= 0L)
    }
  }

  test("cms: sketch is exactly d*w-bounded and partition-invariant") {
    import spark.implicits._
    val users = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"user_id")
    def sketchOf(parts: Int) = users.repartition(parts)
      .select(explode(array((0 until CountMin.D).map(s =>
        struct(lit(s).as("seed"), CountMin.cellOf($"user_id", s).as("c"))): _*)).as("sc"))
      .groupBy($"sc.seed", $"sc.c").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val a = sketchOf(2); val b = sketchOf(7)
    assert(a == b, "sketch must be identical under any partitioning")
    assert(a.size <= CountMin.D * CountMin.W, "sketch exceeded its d*w bound")
  }
}
