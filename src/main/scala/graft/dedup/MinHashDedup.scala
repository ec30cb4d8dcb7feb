package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.functions.HashFunctions

/** §2.3 P2 (+P4 verification): MinHash + LSH near-duplicate detection.
  *
  * Pipeline (DataFrame ops + fused codegen hash expressions, no UDFs):
  *   tokens → k-token shingles → hash shingles to longs → fused
  *   `minhash_band_keys` (signature + banding in one primitive loop per
  *   row) → explode (band_idx, band_key) → bucket aggregation → in-bucket
  *   pair expansion → verify candidate pairs with exact shingle Jaccard.
  *
  * Scale shape: ONE shuffle keys the bucket aggregation on
  * (band_idx, band_key); pairs are expanded inside each bucket (no
  * self-join shuffle), capped at `maxBucketSize` to stop boilerplate-
  * heavy corpora going quadratic (a capped bucket's members still pair
  * up in their other, more selective bands). The shingle arrays never
  * travel through the bucket shuffle — only (id, band) rows do; sets are
  * joined back narrowly for the final verification.
  */
object MinHashDedup {

  // 16 bands × 4 rows: at the τ=0.8 operating point a true pair misses
  // every band w.p. (1−0.8⁴)¹⁶ ≈ 2·10⁻⁴ (8×8 banding missed borderline
  // pairs at ~23%: 3 of 256 true pairs at sf0.1). Shorter bands admit
  // more false candidates, but token shingles are near-unique across
  // unrelated docs and verification is a cheap merge-intersect.
  val NumHashes = 64
  val Bands = 16
  val RowsPerBand = NumHashes / Bands

  /** Default skew cap: a bucket of b docs emits b(b−1)/2 candidate pairs,
    * so 200 bounds any one bucket at ~20k pairs while leaving real
    * near-dup clusters (typically ≪ 100 docs after exact dedup) intact. */
  val DefaultMaxBucketSize = 200

  /** k-token shingles, distinct. Short docs (< k tokens) get their whole
    * text as the single shingle. (The hot path uses the fused
    * `token_shingle_hashes` expression; this Column form exists for
    * generic set building and independent validation.) */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, "\\s+")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** 64-slot minhash signature (fused codegen loop; values bit-identical
    * to `transform(sequence(0,63), s -> array_min(transform(sh, e -> xxhash64(e, s))))`). */
  def signature(hashedCol: Column, numHashes: Int = NumHashes): Column =
    HashFunctions.minhash_signature(hashedCol, numHashes)

  /** Banded LSH keys, one per band, fused with the signature loop. */
  def bandKeys(hashedCol: Column, bands: Int = Bands, rows: Int = RowsPerBand): Column =
    HashFunctions.minhash_band_keys(hashedCol, bands, rows)

  /** Candidate pairs from LSH banding (id_a < id_b). Uses the fused
    * `token_shingle_hashes` expression — shingle construction, hashing,
    * distinct and sort in one compiled pass per document. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
                     maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    candidatePairsByHashed(
      df.select(col(idCol).as("id"),
        graft.functions.HashFunctions.token_shingle_hashes(col(textCol), k).as("sh")),
      maxBucketSize = maxBucketSize)

  /** Jaccard(A,B) = |A∩B| / (|A| + |B| − |A∩B|) — one intersect pass
    * instead of intersect + union. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Jaccard for SORTED distinct long arrays (what
    * [[candidatePairsBySets]] emits): fused merge-intersect, no per-pair
    * hash set — the verification step scores 100k+ candidates. */
  def jaccardSorted(a: Column, b: Column): Column = {
    val inter = graft.functions.HashFunctions.sorted_intersect_size(a, b).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Distinct in-bucket pairs from exploded (id, band_idx, band_key)
    * rows. Single shuffle: buckets are aggregated (not self-joined), the
    * b² pair expansion happens inside each bucket row, and buckets above
    * `maxBucketSize` are dropped before expanding (the aggregation buffer
    * is O(bucket), the output O(min(bucket, cap)²)). Shared by the
    * minhash (P2/P4) and simhash (P3) paths. */
  private[dedup] def pairsFromBands(banded: DataFrame, maxBucketSize: Int): DataFrame =
    banded.groupBy("band_idx", "band_key")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")

  /** Candidate pairs for any (id, sh: array<string>) set DataFrame —
    * shared by token-shingle (P2) and char-ngram (P4) paths. Returns
    * (id_a, id_b, sh_a, sh_b) ready for exact verification. */
  def candidatePairsBySets(sets: DataFrame, bands: Int = Bands,
                           rowsPerBand: Int = RowsPerBand,
                           maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    // compress shingle STRINGS to xxhash64 longs once, up front: the
    // signature pass and the set-intersection verification then run on
    // primitive longs (identical Jaccard modulo ~2⁻⁶⁴ collisions), which
    // cuts both CPU and the memory footprint of the cached/joined sets.
    // SORTED so verification can merge-intersect (jaccardSorted) —
    // minhash/banding are order-insensitive.
    candidatePairsByHashed(
      sets.select(col("id"),
        array_sort(array_distinct(transform(col("sh"), x => xxhash64(x)))).as("sh")),
      bands, rowsPerBand, maxBucketSize)

  /** Candidate pairs for a pre-hashed (id, sh: sorted array<long>) set
    * DataFrame — the shared LSH core for P2 (token shingles) and P4
    * (char n-grams). */
  def candidatePairsByHashed(hashed: DataFrame, bands: Int = Bands,
                             rowsPerBand: Int = RowsPerBand,
                             maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    // persist: banding + the two verification joins each consume this.
    // Repartition FIRST: the upstream is typically a compressed parquet
    // scan whose partition count reflects FILE bytes, not the 100×
    // decode+shingle+hash work this pipeline does per row — measured on
    // a 500k-doc corpus, a ~150MB scan arrived as 2 partitions and the
    // whole hash/band/verify pipeline ran 2-wide. Hash-partitioning on
    // id also pre-aligns the cache with the verification joins' keys.
    val np = hashed.sparkSession.sparkContext.defaultParallelism * 2
    val cached = hashed.repartition(np, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val banded = cached
      .select(col("id"), posexplode(bandKeys(col("sh"), bands, rowsPerBand)))
      .select(col("id"), col("pos").as("band_idx"), col("col").as("band_key"))
    // merge hint: the sets side is CORPUS-sized and must never broadcast.
    // Catalyst's size estimate for array columns is a small constant, so
    // on a big corpus it under-estimates this side below the broadcast
    // threshold and plans a BroadcastHashJoin — measured on 500k docs:
    // the driver built a ~600MB LongToUnsafeRowMap single-threaded, GC
    // stormed past the heartbeat timeout, and the context died. The hint
    // pins both verification joins to shuffle-merge at any scale.
    pairsFromBands(banded, maxBucketSize)
      .join(cached.select(col("id").as("id_a"), col("sh").as("sh_a")).hint("merge"),
        Seq("id_a"))
      .join(cached.select(col("id").as("id_b"), col("sh").as("sh_b")).hint("merge"),
        Seq("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
  }

  /** Verified pairs with BUCKET-LOCAL verification — the shape for
    * corpora whose LSH candidate volume is large relative to true pairs
    * (p4's char-gram sets on the scaled corpus: every doc has
    * factor−1 cross-replica twins at J ≈ 0.7–0.76, which 8×8 banding
    * admits as candidates ~50% of the time → ~12M candidates at the
    * 100× decade, none of them pairs). [[candidatePairsByHashed]] ships
    * BOTH gram arrays (~6 KB/pair) through two sort-merge joins to
    * verify those candidates — ~100 GB of shuffle there; here the exact
    * Jaccard is computed INSIDE the bucket row (pair expansion and
    * merge-intersect are row-local after one fat shuffle of the banded
    * gram arrays), so only thin (id_a, id_b, jaccard) rows ever leave.
    * A colliding pair is verified once per shared band (~1.3× average)
    * and deduped after — identical output, measured 689 → 100s-class
    * at the decade.
    *
    * The oversized-bucket cap is enforced BEFORE the fat aggregation by
    * a thin count pass + equi-join, so no aggregation buffer ever holds
    * an uncapped bucket's arrays. */
  def verifiedPairsByHashed(hashed: DataFrame, threshold: Double,
                            bands: Int = Bands, rowsPerBand: Int = RowsPerBand,
                            maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val np = hashed.sparkSession.sparkContext.defaultParallelism * 2
    val cached = hashed.repartition(np, col("id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def banded(c: Seq[Column]) = cached
      .select(c :+ posexplode(bandKeys(col("sh"), bands, rowsPerBand)): _*)
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_key"))
    // thin pass: ids only — decides which buckets are verifiable
    val good = banded(Seq(col("id")))
      .groupBy("band_idx", "band_key").agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, maxBucketSize))
      .select("band_idx", "band_key")
    // fat pass: arrays shuffle ONCE into surviving buckets; the join and
    // the aggregation share the (band_idx, band_key) partitioning
    banded(Seq(col("id"), col("sh")))
      .join(good, Seq("band_idx", "band_key"))
      .groupBy("band_idx", "band_key")
      .agg(collect_list(struct(col("id"), col("sh"))).as("items"))
      .select(explode(col("items")).as("a"), col("items"))
      .select(col("a.id").as("id_a"), col("a.sh").as("sh_a"),
        explode(col("items")).as("b"))
      .filter(col("id_a") < col("b.id"))
      .select(col("id_a"), col("b.id").as("id_b"),
        round(jaccardSorted(col("sh_a"), col("b.sh")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Verified near-duplicate pairs: LSH candidates with Jaccard >= τ. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.8, k: Int = 3,
                         maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    candidatePairs(df, idCol, textCol, k, maxBucketSize)
      .withColumn("jaccard", round(jaccardSorted(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** p2: near-dup pairs over documents. Oracle-checked: the DuckDB oracle
    * brute-forces exact all-pairs shingle Jaccard ≥ τ; with 16 bands × 4
    * rows the LSH recall on this corpus is exactly 1.0 (validated at
    * sf0.01 and sf0.1 — both engines are deterministic, so a local match
    * is a driver match), and verification makes precision 1.0. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // read the run's shared verified-pairs artifact (computed once per
    // process — p2 orders it, p14 clusters it, p25 joins it); before the
    // artifact, p2 and p14 each re-ran the whole LSH-verify pipeline
    DedupClusters.pairsTable(spark, dir).orderBy($"id_a", $"id_b")
  }

  /** DuckDB oracle: exact brute-force all-pairs token-shingle Jaccard.
    * Mirrors `shingles` (split on \s+, k=3 windows, distinct) and
    * `jaccard` exactly; the LSH query must therefore have perfect recall
    * to hash-match, which the banding choice guarantees on this corpus. */
  val oracleSql: String =
    """WITH sh AS (
         SELECT doc_id,
           list_distinct([array_to_string(t[i:i+2], ' ')
                          for i in range(1, greatest(len(t) - 2, 1) + 1)]) AS s
         FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t FROM documents))
       SELECT id_a, id_b, round(jc, 6) AS jaccard FROM (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jc
         FROM sh a, sh b WHERE a.doc_id < b.doc_id) t
       WHERE jc >= 0.8
       ORDER BY id_a, id_b"""
}
