package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: NATURAL-TEXT-STATISTICS fixture + measurements for the
  * dedup family (the r12 VERDICT item). The driver's synthetic
  * documents draw tokens near-uniformly, which makes every position
  * look alike to the p33c ladder (dup fractions stay high for many
  * levels) and spreads LSH buckets unnaturally evenly. Real corpora
  * are Zipfian — a handful of stopword-class tokens dominate — which
  * is exactly the regime the singleton-pruning lemma and the
  * bucket-size caps were designed for.
  *
  * [[zipfized]] is a READ-TIME derivation (the langized pattern): each
  * token is deterministically remapped to rank ⌊V^u⌋ with u a uniform
  * per-position hash — the inverse-CDF of a log-uniform distribution,
  * i.e. token frequency ∝ 1/rank (Zipf exponent ≈ 1, the natural-text
  * law). No files are written; the fixture exists wherever a probe
  * derives it.
  *
  * Measurements (recorded in BENCH_HISTORY):
  *   - p33c dup-fraction curve per ladder level on the natural fixture
  *     at the decade, prune-vs-complete A/B (equal outputs, timing),
  *     and the level where the pruned path engages (frac < pruneBelow);
  *   - p2 (MinHash band) and p4 (char-3-gram band) bucket-size
  *     distributions — the skew the `DefaultMaxBucketSize` cap absorbs.
  */
object NaturalTextProbe {

  /** Zipf-ish token remap: text → w<rank> stream, rank = ⌊V^u⌋ with
    * u = per-(doc,pos) uniform hash in [0,1). Deterministic, one
    * narrow projection, order- and count-preserving. */
  def zipfized(docs: DataFrame, vocab: Int = 10000): DataFrame =
    docs.withColumn("text", expr(
      s"""array_join(transform(filter(split(text, '\\\\s+'), t -> t <> ''),
            (t, j) -> concat('w', cast(cast(pow($vocab.0d,
              (pmod(hash(doc_id * 1000003 + j), 1000000)) / 1000000.0d) as long) as string))),
          ' ')"""))

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxLevel = args.lift(1).map(_.toInt).getOrElse(graft.dedup.SaRepeats.MaxLevel)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = zipfized(graft.Tables.documents(spark, dir)).persist()

    // 1) fixture shape: Zipf head shares + vocabulary size
    val toks = docs.select(explode(split($"text", " ")).as("t"))
      .groupBy($"t").agg(count(lit(1)).as("n")).persist()
    val tot = toks.agg(sum($"n")).head().getLong(0)
    val top = toks.orderBy($"n".desc).limit(10).collect()
    System.err.println(s"[nat] tokens=$tot distinct=${toks.count()} " +
      s"top1=${top.head.getLong(1).toDouble / tot} " +
      s"top10=${top.map(_.getLong(1)).sum.toDouble / tot}")
    toks.unpersist()

    // 2) p33c dup-frac curve + prune-vs-complete A/B
    val chars = docs
      .select($"doc_id", posexplode(filter(split($"text", ""), x => x =!= lit(""))))
      .withColumnRenamed("col", "ch").persist()
    val n = chars.count()
    System.err.println(s"[nat] positions=$n")
    def run(label: String, pruneBelow: Double): Map[Int, Long] = {
      val t0 = System.nanoTime()
      val reps = graft.dedup.SaRepeats.repLadder(chars, maxLevel, pruneBelow = pruneBelow)
        .map { case (k, rep) =>
          k -> rep.agg(coalesce(sum(col(s"rep_$k")), lit(0L))).head().getLong(0)
        }.toMap
      val secs = (System.nanoTime() - t0) / 1e9
      reps.toSeq.sorted.foreach { case (k, dup) =>
        System.err.println(f"[nat] $label level $k%3d dup=$dup%12d frac=${dup.toDouble / n}%.4f")
      }
      val engaged = reps.toSeq.sorted.find(_._2.toDouble / n < 0.5).map(_._1)
      System.err.println(f"[nat] $label total $secs%.1fs; prune engages at level ${engaged.getOrElse(-1)}")
      reps
    }
    val pruned = run("pruned  ", 0.5)
    val complete = run("complete", 0.0)
    require(pruned == complete,
      s"prune-vs-complete mismatch:\n$pruned\nvs\n$complete")
    chars.unpersist()

    // 3) p2 MinHash band bucket-size distribution
    import graft.dedup.MinHashDedup
    val hashed = docs.select($"doc_id".as("id"),
      graft.functions.HashFunctions.token_shingle_hashes($"text", 3).as("hs"))
      .filter(size($"hs") > 0)
      .select($"id", MinHashDedup.bandKeys($"hs").as("bks"))
      .select($"id", posexplode($"bks"))
      .select($"pos".as("band"), $"col".as("key"))
    bucketHistogram("p2-minhash", hashed)

    // 4) p4 char-3-gram band bucket-size distribution
    val ng = docs.select($"doc_id".as("id"),
      graft.functions.HashFunctions.char_ngram_hashes($"text", 3).as("hs"))
      .filter(size($"hs") > 0)
      .select($"id", MinHashDedup.bandKeys($"hs").as("bks"))
      .select($"id", posexplode($"bks"))
      .select($"pos".as("band"), $"col".as("key"))
    bucketHistogram("p4-ngram", ng)

    spark.stop()
  }

  private def bucketHistogram(label: String, banded: DataFrame): Unit = {
    import banded.sparkSession.implicits._
    val sizes = banded.groupBy($"band", $"key").agg(count(lit(1)).as("sz"))
    val h = sizes.select(
      count(lit(1)).as("buckets"),
      sum(when($"sz" === 1, 1L).otherwise(0L)).as("singleton"),
      sum(when($"sz".between(2, 10), 1L).otherwise(0L)).as("s2_10"),
      sum(when($"sz".between(11, 200), 1L).otherwise(0L)).as("s11_200"),
      sum(when($"sz" > 200, 1L).otherwise(0L)).as("over_cap"),
      max($"sz").as("max_sz")).head()
    System.err.println(s"[nat] $label buckets=${h.getLong(0)} singleton=${h.getLong(1)} " +
      s"2-10=${h.getLong(2)} 11-200=${h.getLong(3)} over200=${h.getLong(4)} max=${h.getLong(5)}")
  }
}
