package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextNormalizeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("normalize is idempotent and composes decomposed forms") {
    import spark.implicits._
    // decomposed, composed, NBSP/ZWSP/control-ridden variants of one text
    val variants = Seq(
      "Cafe\u0301 nai\u0308ve\u00A0 text",
      "Caf\u00E9 na\u00EFve text",
      "Caf\u00E9\u0007 na\u00EFve\u200B text",
      "  Caf\u00E9  na\u00EFve \u000Btext ").toDF("raw")
    val out = variants.select(TextNormalize.normalize($"raw").as("n"))
      .distinct().as[String].collect()
    assert(out.toSeq == Seq("Caf\u00E9 na\u00EFve text"),
      s"all variants must normalize to one canonical form, got ${out.toSeq}")
    // idempotence: a normalized string is a fixed point
    val twice = variants.select(
        TextNormalize.normalize(TextNormalize.normalize($"raw")).as("a"),
        TextNormalize.normalize($"raw").as("b"))
      .filter($"a" =!= $"b").count()
    assert(twice == 0L, "normalize must be idempotent")
  }

  test("p42 exercises both plant branches (controls present and absent)") {
    val rows = TextNormalize.query(spark, dir)
      .select(col("n_controls")).collect().map(_.getLong(0))
    assert(rows.exists(_ > 0L), "no doc carries planted controls")
    // non-multiple-of-3 docs still carry the VT (1 control char)
    assert(rows.exists(_ == 1L) && rows.exists(_ == 3L),
      s"expected both 1-control and 3-control docs, got ${rows.distinct.toSeq.sorted}")
  }

  test("p42 core is row-local: no join, no aggregate, no shuffle") {
    import spark.implicits._
    val core = TextNormalize
      .withPlantedMess(graft.Tables.documents(spark, dir))
      .select($"doc_id", TextNormalize.normalize($"raw").as("norm"))
    val opt = core.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Join"), s"unexpected join:\n$opt")
    assert(!opt.contains("Aggregate"), s"unexpected aggregate:\n$opt")
    core.collect()
    val phys = core.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"unexpected shuffle:\n$phys")
  }
}
