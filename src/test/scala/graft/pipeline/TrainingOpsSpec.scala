package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hash split is content-addressed: stable across partitionings, roughly 80/10/10") {
    val df = (0L until 2000L).toDF("id")
    val a = TrainingOps.assignSplit(df, "id")
      .groupBy($"split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(a("train") - 1600.0) < 120, s"train share off: $a")
    assert(math.abs(a("val") - 200.0) < 60 && math.abs(a("test") - 200.0) < 60, s"val/test off: $a")
    // same rows, different partitioning → identical per-row assignment
    val x = TrainingOps.assignSplit(df.repartition(13), "id").select($"id", $"split")
    val y = TrainingOps.assignSplit(df.coalesce(1), "id").select($"id", $"split")
    assert(x.except(y).count() == 0 && y.except(x).count() == 0)
  }

  test("mixture resampling hits target rates, is stable, and keeps unlisted sources whole") {
    val df = (0L until 4000L).map(i => (i, "s" + (i % 2))).toDF("id", "source")
    val kept = TrainingOps.resampleMixture(df, "id", "source", Map("s0" -> 250))
    val bySrc = kept.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("s1") == 2000L, "unlisted source must keep everything")
    assert(math.abs(bySrc("s0") - 500.0) < 80, s"s0 should keep ~25%: $bySrc")
    // resampling twice selects the same rows (content-addressed)
    val again = TrainingOps.resampleMixture(df.repartition(7), "id", "source", Map("s0" -> 250))
    assert(kept.select($"id").except(again.select($"id")).count() == 0)
    assert(again.select($"id").except(kept.select($"id")).count() == 0)
  }

  test("sequence packing: sequences fill in doc order and every doc starts in exactly one sequence") {
    val docs = (0L until 100L).map(i => ("s" + (i % 2), i, "tok " * ((i % 17 + 1) * 10).toInt))
      .toDF("source", "doc_id", "text")
    val toks = docs.select($"source", $"doc_id",
      size(split($"text", "\\s+")).cast("long").as("n_tokens"))
    val packed = toks
      .withColumn("cum_before", coalesce(sum($"n_tokens").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source")
          .orderBy($"doc_id").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("seq_idx", expr("cum_before div 512"))
    // every doc assigned exactly once, and seq_idx is monotone in doc_id per source
    assert(packed.count() == 100)
    val rows = packed.orderBy($"source", $"doc_id")
      .select($"source", $"seq_idx").as[(String, Long)].collect()
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("contamination flags a planted copy and ignores disjoint docs") {
    val bench = (0L, "the quick brown fox jumps over the lazy dog again and again today")
    val copy = (5L, "prefix words " + bench._2 + " suffix words")   // shares 8-grams
    val clean = (6L, "completely different content with no overlapping phrases at all whatsoever in any way")
    val docs = Seq(bench, copy, clean).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_contam").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // doc 0 is the benchmark side (0 % 37 == 0); docs 5/6 are training
    val out = TrainingOps.contaminationQuery(spark, tmp, n = 8, minShared = 3)
      .select($"train_doc", $"bench_doc", $"n_shared").as[(Long, Long, Long)].collect()
    graft.operators.ScaleOps.deleteRecursively(tmp)
    assert(out.map(t => (t._1, t._2)).toSet == Set((5L, 0L)), out.mkString(","))
    assert(out.head._3 >= 3)
  }

  test("chunking covers the text exactly with stride overlap") {
    val text = ("abcdefghij" * 40)   // 400 chars → starts 0,150,300
    val docs = Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TrainingOps.chunkQuery(spark, tmp)
      .select($"chunk_start", $"chunk_len").as[(Long, Long)].collect().sortBy(_._1)
    graft.operators.ScaleOps.deleteRecursively(tmp)
    assert(out.map(_._1).toSeq == Seq(0L, 150L, 300L))
    assert(out.map(_._2).toSeq == Seq(200L, 200L, 100L))   // last chunk truncates
  }
}
