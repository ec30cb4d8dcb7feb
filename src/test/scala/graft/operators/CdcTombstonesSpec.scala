package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcTombstonesSpec extends SparkSpec {
  import spark.implicits._

  test("u19: tombstones delete, re-inserts beat older tombstones, upserts never resurrect deletes") {
    val base = Seq(
      (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0), (4L, "D", 40.0))
      .toDF("k", "s", "v").withColumn("version", lit(0L)).withColumn("op", lit("I"))
    val changes = Seq(
      (1L, "U", 11.0, 1L, "U"),  // plain update
      (2L, "B", 20.0, 1L, "D"),  // delete — key 2 must vanish
      (3L, "C", 30.0, 1L, "D"),  // delete then...
      (3L, "R", 33.0, 2L, "I"),  // ...re-insert — key 3 comes back new
      (4L, "X", 99.0, 1L, "U"),  // update then...
      (4L, "D", 40.0, 2L, "D")   // ...delete — the LATEST change wins
    ).toDF("k", "s", "v", "version", "op")
    val got = CdcTombstones.upsertWithTombstones(base, changes, Seq("k"), "version", "op")
      .select($"k", $"s", $"v").as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "U", 11.0), (3L, "R", 33.0)),
      s"merge produced $got")
  }

  test("u19: same-version ties break deterministically — the co-versioned tombstone wins") {
    val base = Seq((1L, "A", 10.0), (2L, "B", 20.0))
      .toDF("k", "s", "v").withColumn("version", lit(0L)).withColumn("op", lit("I"))
    val changes = Seq(
      (1L, "U", 11.0, 1L, "U"),  // a 'U' and a 'D' in ONE batch at v=1:
      (1L, "A", 10.0, 1L, "D"),  // precedence D > U — key 1 vanishes
      (2L, "B", 20.0, 1L, "D"),  // a 'D' and an 'I' at v=1:
      (2L, "R", 22.0, 1L, "I")   // D wins the tie — key 2 vanishes too
    ).toDF("k", "s", "v", "version", "op")
    for (shuffled <- Seq(changes, changes.orderBy($"op"), changes.orderBy($"op".desc))) {
      val got = CdcTombstones.upsertWithTombstones(base, shuffled, Seq("k"), "version", "op")
        .select($"k").as[Long].collect().toSet
      assert(got.isEmpty, s"co-versioned tombstones must win every tie, got survivors $got")
    }
  }

  test("u19 query: bucket-2 keys are gone, bucket-3 keys carry the re-inserted status") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables.orders(spark, dir)
    val n = orders.count()
    val got = CdcTombstones.u19CdcTombstonesQuery(spark, dir)
    val byStatus = got.collect().map(r =>
      r.getString(0) -> r.getAs[Long]("n_orders")).toMap
    // buckets are ~uniform: final rows = n − |bucket 2| (deleted for good)
    val finalRows = byStatus.values.sum
    assert(finalRows < n, "some keys must be deleted")
    assert(byStatus.contains("R") && byStatus("R") > 0,
      "re-inserted keys must surface with status R")
    assert(byStatus.contains("U") && byStatus("U") > 0)
    // the exact count identity: deleted-for-good = bucket 2
    val b2 = orders.filter(
      conv(substring(md5($"o_orderkey".cast("string")), 1, 8), 16, 10)
        .cast("long") % 10 === 2).count()
    assert(finalRows == n - b2, s"final $finalRows != $n - $b2")
  }
}
