package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CrossModalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mm7: true pairs correlate at exactly 1.0 and are kept; planted pairs are dropped") {
    val rows = CrossModal.query(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val planted = r.getBoolean(3)
      val kept = r.getBoolean(2)
      if (planted) {
        assert(!kept, s"planted pair ${r.getLong(0)} survived the gate")
        assert(math.abs(r.getDouble(1)) < CrossModal.Threshold)
      } else {
        assert(kept && r.getDouble(1) == 1.0,
          s"true pair ${r.getLong(0)} should correlate exactly (got ${r.getDouble(1)})")
      }
    }
    // the plant actually planted something
    assert(rows.count(_.getBoolean(3)) > 0)
  }

  test("mm7: the image side goes through the REAL BMP decode (a corrupted payload fails loudly)") {
    // strip the payload header → imageio can't decode → decodeBmp requires
    val bad = CrossModal.pairTable(spark, sf)
      .withColumn("payload", expr("substring(payload, 20)"))
      .limit(1)
      .select(col("payload")).as[Array[Byte]](
        org.apache.spark.sql.Encoders.BINARY).head()
    intercept[IllegalArgumentException] {
      MultimodalOps.decodeBmp(bad)
    }
  }

  test("mm7: planted flag replays the doc_id % 10 == 3 plant with an existing next doc") {
    val t = CrossModal.pairTable(spark, sf)
      .select(col("pair_id"), col("planted")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val maxId = t.keys.max
    t.foreach { case (id, planted) =>
      val expect = id % 10 == 3 && t.contains(id + 1)
      // the next doc exists iff id+1 is a pair too (every doc becomes a pair)
      assert(planted == expect || (id == maxId && !planted))
    }
  }
}
