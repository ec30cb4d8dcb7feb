package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 P34: LEARNED quality classifier — the fastText-style stage real
  * curation pipelines run after heuristic scoring: distill a quality
  * label into a linear model over hashed bag-of-token features, then
  * score the whole corpus with the model (CCNet / LLaMA-style "quality
  * classifier trained on heuristic/LLM labels").
  *
  * Model: logistic regression on `D` hashed token-tf buckets (hashing
  * trick — xxhash64(token) mod D) plus one engineered length feature,
  * trained by distributed Newton/IRLS. Every per-doc contribution is
  * quantized ONCE to integer micro-units with `floor(1e6·x)` (floor is
  * toward −∞ on both engines — p29's technique), so every aggregation
  * in both fit and scoring is an order-independent INTEGER sum: the
  * fitted weights and every margin are bit-deterministic under any
  * partitioning.
  *
  * Scale shape: feature extraction is explode → one (doc_id, bucket)
  * keyed aggregation; each Newton step is one distributed aggregation
  * (gradient + (D+2)²/2 Hessian cells + loss in a single collect) and
  * the driver holds only the weight vector and the tiny dense system it
  * solves — nothing corpus-sized is ever collected or broadcast. At
  * 100 TB the fit runs on a train SPLIT (as here) at one corpus pass
  * per step — the classical distributed IRLS layout for small D.
  *
  * Persist-and-replay oracle (the m8/m12 pattern): the fit persists the
  * feature table and the weight vector; DuckDB recomputes every margin
  * from those files AND independently replays the label derivation from
  * the raw documents table, so a green row certifies feature join,
  * quantized scoring, the train/score split, and the label contract.
  * The fit itself is gated by spec (loss decreases, separates classes
  * better than chance).
  */
object QualityClassifier {

  val D = 64            // hash buckets (synthetic vocab is 31 tokens)
  val Thresh = 0.645    // p9 quality threshold — splits sf0.01 ~50/50
  val Iters = 5       // Newton/IRLS steps — loss is flat by step 5
                      // (sf0.1 trajectory: .693 .552 .536 .5335 .5328)
  val Ridge = 1e-8    // Hessian regularizer (relative to n)

  /** (doc_id, bucket, cnt): hashed token features, tf-normalized
    * (cnt = bucket count / doc token count) so the margin scale is
    * bounded by ‖w‖₁ and full-batch GD descends at a fixed lr
    * regardless of document length — plus ONE engineered length
    * feature at bucket D (n_tokens/100, the signal tf-normalization
    * would otherwise erase; fastText-style extra dense feature). */
  def featureTable(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select($"doc_id", explode(split($"text", "\\s+")).as("tok"))
      .select($"doc_id", pmod(xxhash64($"tok"), lit(D.toLong)).cast("int").as("bucket"))
      .groupBy($"doc_id", $"bucket")
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy($"doc_id").agg(sum($"c").as("t"))
    counts.join(totals, Seq("doc_id"))
      .select($"doc_id", $"bucket", ($"c" / $"t").as("cnt"))
      .union(totals.select($"doc_id", lit(D).as("bucket"), ($"t" / 100.0).as("cnt")))
  }

  /** Feature dimension including the engineered length slot. */
  val NumFeatures: Int = D + 1

  /** Binary label distilled from the p9 heuristic score. */
  def labelTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TextAnalysis.quality(spark, dir)
      .select($"doc_id",
        when($"quality_score" >= Thresh, 1).otherwise(0).as("y"))
  }

  /** Quantized margins: floor-micro per (doc,bucket) product, integer
    * sum per doc, bias added as a pre-quantized literal. */
  private def marginMicros(feat: DataFrame, w: Array[Double], bias: Double): DataFrame = {
    val spark = feat.sparkSession
    import spark.implicits._
    val warr = array(w.map(lit(_)): _*)
    feat
      .select($"doc_id",
        floor(element_at(warr, $"bucket" + 1) * $"cnt" * lit(1e6)).cast("long").as("c"))
      .groupBy($"doc_id")
      .agg((sum($"c") + lit(math.floor(bias * 1e6).toLong)).as("margin_micros"))
  }

  /** Stateless per-row margin — the streaming-inference shape: the whole
    * hashed-feature margin folds inside array higher-order functions
    * (tokenize → bucket → per-distinct-bucket tf → quantized dot), so
    * scoring needs NO aggregation state at all — a narrow map over the
    * stream, append mode, unbounded throughput. Bit-identical to
    * [[marginMicros]]: same xxhash64 bucketing, same c/t double
    * division, same floor-micro quantization per bucket, same integer
    * sum (order fixed by array_distinct's first-occurrence order —
    * irrelevant anyway, integer addition commutes). */
  def marginMicrosNarrow(docs: DataFrame, w: Array[Double], bias: Double): DataFrame = {
    val warr = array(w.map(lit(_)): _*)
    val toks = split(col("text"), "\\s+")
    val buckets = transform(toks, t => pmod(xxhash64(t), lit(D.toLong)).cast("int"))
    val t = size(toks)
    val tokenPart = aggregate(
      array_distinct(buckets), lit(0L),
      (acc, b) => acc + floor(element_at(warr, b + 1) *
        (size(filter(buckets, x => x === b)) / t) * lit(1e6)).cast("long"))
    val lenPart = floor(element_at(warr, lit(NumFeatures)) *
      (t / lit(100.0)) * lit(1e6)).cast("long")
    docs.select(col("doc_id"),
      (tokenPart + lenPart + lit(math.floor(bias * 1e6).toLong)).as("margin_micros"))
  }

  /** Load the persisted weight vector + bias (bucket −1). */
  def loadWeights(spark: SparkSession, dir: String): (Array[Double], Double) = {
    import spark.implicits._
    val wMap = spark.read.parquet(s"${root(dir)}/p34_weights")
      .as[(Int, Double)].collect().toMap
    (Array.tabulate(NumFeatures)(wMap(_)), wMap(-1))
  }

  /** Newton/IRLS fit on (doc_id, bucket, cnt) ⋈ (doc_id, y). Returns
    * (weights, bias, perIterLoss). D+1 is small, so the full Hessian
    * H = Σ_d σ_d(1−σ_d)·x_d x_dᵀ is one distributed aggregation per
    * step (the m3/m11 "one aggregate per Newton step" layout) and the
    * driver solves a (D+1)² system — quadratic convergence makes ~8
    * passes enough where fixed-lr GD needed 60+ (measured 29.5s → ~4s
    * at sf0.1).
    *
    * Determinism and plan reuse: every per-doc contribution (gradient,
    * Hessian cell, loss) is quantized ONCE with floor(1e6·x) and summed
    * as integers — order-independent under any partitioning. Weights
    * AND bias enter as a broadcast 66-row DataFrame (bias = constant
    * feature at bucket −1), never as literals: literal weights would
    * change the generated code each step and forced a fresh janino
    * compile per stage per iteration. Features are hash-partitioned by
    * doc_id once; the Hessian's per-doc pair expansion is a self-join
    * on that same partitioning (zero extra exchanges); each step is ONE
    * collect of ~(D+1)²/2 cells. The driver never holds anything
    * corpus-sized. */
  def fit(feat: DataFrame, labels: DataFrame,
          iters: Int = Iters): (Array[Double], Double, Seq[Double]) = {
    val spark = feat.sparkSession
    import spark.implicits._
    val lbl = labels.persist()
    // bias as a constant feature (bucket −1, cnt 1.0)
    val f = feat
      .union(lbl.select($"doc_id", lit(-1).as("bucket"), lit(1.0).as("cnt")))
      .repartition(8, $"doc_id").persist()
    val n = lbl.count().toDouble
    // slot mapping: token buckets 0..D−1, length feature D, bias at
    // slot NumFeatures (bucket −1 on the wire)
    val S = NumFeatures + 1
    def idx(b: Int): Int = if (b == -1) NumFeatures else b
    val w = Array.fill(S)(0.0)
    val losses = scala.collection.mutable.ArrayBuffer[Double]()
    // bounded iterative state: narrow static shuffle layout for the loop
    // (on a real cluster this knob is sized to executor count)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (_ <- 1 to iters) {
        val wDf = broadcast(
          w.toSeq.zipWithIndex
            .map { case (v, i) => (if (i == NumFeatures) -1 else i, v) }
            .toDF("bucket", "wv"))
        // per-doc residual r = σ(margin) − y and curvature s = σ(1−σ);
        // margin is an exact integer, so both are bit-deterministic
        val resid = f.join(wDf, Seq("bucket"))
          .select($"doc_id", floor($"wv" * $"cnt" * lit(1e6)).cast("long").as("c"))
          .groupBy($"doc_id")
          .agg(sum($"c").as("mm"))
          .join(lbl, Seq("doc_id"))
          .select($"doc_id", ($"mm" / lit(1e6)).as("m"), $"y")
          .select($"doc_id", $"m", $"y",
            (lit(1.0) / (lit(1.0) + exp(-$"m"))).as("p"))
          .select($"doc_id", $"m", $"y",
            ($"p" - $"y").as("r"), ($"p" * (lit(1.0) - $"p")).as("s"))
        val fr = f.join(resid, Seq("doc_id"))
        // one collect: gradient cells (i, −3), Hessian upper triangle
        // (i ≤ j), and the loss cell (−2, −2) ride the same aggregation
        val stats = fr
          .select($"bucket".as("i"), lit(-3).as("j"),
            floor($"r" * $"cnt" * lit(1e6)).cast("long").as("g"))
          .union(
            fr.select($"doc_id", $"bucket".as("i"), $"cnt".as("ca"), $"s")
              .join(f.select($"doc_id", $"bucket".as("j"), $"cnt".as("cb")),
                    Seq("doc_id"))
              .filter($"i" <= $"j")
              .select($"i", $"j",
                floor($"s" * $"ca" * $"cb" * lit(1e6)).cast("long").as("g")))
          // logistic loss via the stable log1p(exp(−m)) + [y=0]·m form
          .union(resid.select(lit(-2).as("i"), lit(-2).as("j"),
            floor((when($"y" === 1, log1p(exp(-$"m")))
              .otherwise(log1p(exp(-$"m")) + $"m")) * lit(1e6)).cast("long").as("g")))
          .groupBy($"i", $"j").agg(sum($"g").as("g"))
          .as[(Int, Int, Long)].collect()
        val grad = Array.fill(S)(0.0)
        val hess = Array.ofDim[Double](S, S)
        var loss = 0.0
        stats.foreach {
          case (-2, -2, g) => loss = g / 1e6 / n
          case (i, -3, g)  => grad(idx(i)) = g / 1e6 / n
          case (i, j, g)   =>
            val (a, b) = (idx(i), idx(j))
            hess(a)(b) = g / 1e6 / n
            hess(b)(a) = hess(a)(b)
        }
        losses += loss
        var k = 0
        while (k < S) { hess(k)(k) += Ridge * n; k += 1 }
        val H = breeze.linalg.DenseMatrix.tabulate(S, S)((a, b) => hess(a)(b))
        val g = breeze.linalg.DenseVector(grad)
        val delta = H \ g
        var k2 = 0
        while (k2 < S) { w(k2) -= delta(k2); k2 += 1 }
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    f.unpersist(false); lbl.unpersist(false)
    (w.take(NumFeatures), w(NumFeatures), losses.toSeq)
  }

  // one fit per (sf dir) per JVM — Verify and Bench score the same
  // persisted model rather than re-fitting per query (m8/u10 pattern)
  private val fittedDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def root(dir: String): String = graft.ml.ModelOracles.modelRoot(dir)

  /** Fit once per (JVM, dir): persist features + weights for the replay
    * oracle, keyed to the sf dir so verify/bench stay order-independent. */
  def ensureFitted(spark: SparkSession, dir: String): Unit =
    fittedDirs.synchronized {
      if (!fittedDirs.contains(dir)) {
        import spark.implicits._
        val feat = featureTable(Tables.documents(spark, dir)).persist()
        val lbl = labelTable(spark, dir)
        val train = feat.join(lbl.filter($"doc_id" % 4 =!= 0), Seq("doc_id"))
        val (w, bias, _) = fit(train.select($"doc_id", $"bucket", $"cnt"),
                               lbl.filter($"doc_id" % 4 =!= 0))
        feat.write.mode("overwrite").parquet(s"${root(dir)}/p34_features")
        val wRows = w.toSeq.zipWithIndex.map { case (v, i) => (i, v) } :+ (-1, bias)
        wRows.toDF("bucket", "w").coalesce(1)
          .write.mode("overwrite").parquet(s"${root(dir)}/p34_weights")
        feat.unpersist(false)
        fittedDirs.add(dir)
      }
    }

  /** p34: score EVERY doc with the persisted model — integer-exact
    * margins, predicted keep/drop, the distilled label, and the split
    * flag. The oracle recomputes all of it from the persisted files plus
    * the raw documents table. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ensureFitted(spark, dir)
    val feat = spark.read.parquet(s"${root(dir)}/p34_features")
    val wt = spark.read.parquet(s"${root(dir)}/p34_weights")
    val wMap = wt.as[(Int, Double)].collect().toMap
    val w = Array.tabulate(NumFeatures)(wMap(_))
    val bias = wMap(-1)
    marginMicros(feat, w, bias)
      .join(labelTable(spark, dir), Seq("doc_id"))
      .select($"doc_id", $"margin_micros",
        ($"margin_micros" >= 0).as("pred"), $"y",
        ($"doc_id" % 4 =!= 0).as("is_train"))
      .orderBy($"doc_id")
  }

  /** DuckDB replay: margins from the persisted feature/weight files with
    * the same floor-micro quantization; labels re-derived from the raw
    * documents via the p9 formula. */
  val oracleSql: String =
    """WITH f AS (
         SELECT * FROM read_parquet('/tmp/graft_models/sf0.01/p34_features/*.parquet')),
       wt AS (
         SELECT * FROM read_parquet('/tmp/graft_models/sf0.01/p34_weights/*.parquet')),
       m AS (
         SELECT f.doc_id,
           CAST(sum(CAST(floor(wt.w * f.cnt * 1e6) AS BIGINT)) AS BIGINT)
             + (SELECT CAST(floor(w * 1e6) AS BIGINT) FROM wt WHERE bucket = -1)
             AS margin_micros
         FROM f JOIN wt USING (bucket)
         GROUP BY f.doc_id),
       q AS (
         SELECT doc_id,
           round(0.4 * (len(list_distinct(toks)) / len(toks)) +
                 0.3 * (1.0 - len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) / len(toks)) +
                 0.3 * least(1.0, len(toks) / 100.0), 6) AS quality_score
         FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents) t),
       lbl AS (
         SELECT doc_id, CASE WHEN quality_score >= 0.645 THEN 1 ELSE 0 END AS y FROM q)
       SELECT m.doc_id, m.margin_micros, m.margin_micros >= 0 AS pred,
              lbl.y, (m.doc_id % 4 != 0) AS is_train
       FROM m JOIN lbl USING (doc_id)
       ORDER BY m.doc_id"""
}
