package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("upsert keeps the highest version per key, inserts new keys, leaves others untouched") {
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("k", "v", "version")
    val updates = Seq((2L, "B", 2L), (4L, "d", 2L))
      .toDF("k", "v", "version")
    val out = ScaleOps.upsert(base, updates, Seq("k"), "version")
      .select($"k", $"v").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
  }

  test("repeated upsert of the same batch is idempotent") {
    val base = Seq((1L, 10.0, 1L), (2L, 20.0, 1L)).toDF("k", "price", "version")
    val updates = Seq((1L, 11.0, 2L)).toDF("k", "price", "version")
    val once = ScaleOps.upsert(base, updates, Seq("k"), "version")
    val twice = ScaleOps.upsert(once, updates, Seq("k"), "version")
    assert(once.orderBy($"k").collect().toSeq == twice.orderBy($"k").collect().toSeq)
  }
}
