package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarQuantSpec extends SparkSpec {

  test("int8 quantization: codes bounded, error small relative to scale, zero-vector safe") {
    val rows = ScalarQuant.query(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dim = r.getInt(1); val scaleMicro = r.getLong(2); val errPico = r.getLong(5)
      assert(dim == 64)
      // per-element quantization error ≤ scale/127 → squared ≤ (scale/127)²;
      // total err ≤ dim · (scale/127)² (+1 pico slack per element for the floor)
      val scale = scaleMicro / 1e6 + 1e-6
      val bound = dim * math.pow(scale / 127 * 1.01, 2) * 1e12 + dim
      assert(errPico <= bound.toLong,
        s"reconstruction error $errPico above bound ${bound.toLong} for $r")
      assert(errPico >= 0L)
    }
  }

  test("quantization is row-local: no shuffle in the core plan") {
    import spark.implicits._
    val df = ScalarQuant.query(spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join") && !opt.contains("Aggregate"),
      s"unexpected join/aggregate:\n$opt")
  }
}
