package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 P2 (+P4 verification): MinHash + LSH near-duplicate detection.
  *
  * Pipeline (all DataFrame ops, no UDFs):
  *   tokens → k-token shingles → 64 minhashes (seeded xxhash64) →
  *   8 bands of 8 rows → explode (band_idx, band_key) → self-join on
  *   equal band → verify candidate pairs with exact shingle Jaccard.
  *
  * Scale: the only shuffles are the band-bucket self-join (keyed on
  * (band_idx, band_key) — 8× explode, then equi-join) and a distinct on
  * candidate pairs.  Degenerate buckets (many identical docs) would go
  * quadratic — exact duplicates should be removed first (P1), and a
  * bucket-size cap can drop pathological buckets (cap dropped buckets are
  * all mutual near-dups of an already-reported pair in practice).
  */
object MinHashDedup {

  val NumHashes = 64
  val Bands = 8
  val RowsPerBand = NumHashes / Bands

  /** k-token shingles, distinct. Short docs (< k tokens) get their whole
    * text as the single shingle. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = split(text, "\\s+")
    val sh = expr(
      s"transform(sequence(1, greatest(size(split(text, '\\\\s+')) - ${k - 1}, 1)), " +
      s"i -> concat_ws(' ', slice(split(text, '\\\\s+'), i, $k)))")
    array_distinct(sh)
  }

  /** 64-slot minhash signature: slot s keeps min over shingles of
    * xxhash64(shingle, salt=s). */
  def signature(shinglesCol: Column, numHashes: Int = NumHashes): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shinglesCol, sh => xxhash64(sh, s))))

  /** Banded LSH keys: one xxhash64 per band over its signature slice. */
  def bandKeys(sigCol: Column, bands: Int = Bands, rows: Int = RowsPerBand): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",", slice(sigCol, b * rows + 1, lit(rows)))))

  /** Candidate pairs from LSH banding (id_a < id_b). */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    candidatePairsBySets(df.select(col(idCol).as("id"), shingles(col(textCol), k).as("sh")))

  /** Jaccard(A,B) = |A∩B| / (|A| + |B| − |A∩B|) — one intersect pass
    * instead of intersect + union. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Candidate pairs for any (id, sh: array<string>) set DataFrame —
    * shared by token-shingle (P2) and char-ngram (P4) paths.
    *
    * The band table carries ONLY (id, band_idx, band_key): exploding the
    * (often large) shingle arrays 8× through the self-join shuffle would
    * dominate the cost at scale. Shingle sets are joined back to the
    * deduplicated pair list for verification — two narrow hash joins
    * instead of one wide one. */
  def candidatePairsBySets(sets: DataFrame, bands: Int = Bands,
                           rowsPerBand: Int = RowsPerBand,
                           maxBucketSize: Int = Int.MaxValue): DataFrame = {
    // compress shingle STRINGS to xxhash64 longs once, up front: the
    // signature pass and the set-intersection verification then run on
    // primitive longs (identical Jaccard modulo ~2⁻⁶⁴ collisions), which
    // cuts both CPU and the memory footprint of the cached/joined sets
    val hashed = sets.select(col("id"),
      array_distinct(transform(col("sh"), x => xxhash64(x))).as("sh"))
    // persist: the shingle→signature pipeline would otherwise be
    // recomputed once per self-join side and once per verification join
    val cached = hashed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val numHashes = bands * rowsPerBand
    val banded = cached
      .select(col("id"),
        posexplode(bandKeys(signature(col("sh"), numHashes), bands, rowsPerBand)))
      .select(col("id"), col("pos").as("band_idx"), col("col").as("band_key"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // skew control: a bucket of b docs yields b² candidate pairs; for
    // corpora with massive boilerplate overlap, cap the bucket size and
    // drop pathological buckets (their members still pair up in their
    // other, more selective bands)
    val buckets =
      if (maxBucketSize == Int.MaxValue) banded
      else banded
        .withColumn("__bsz", count(lit(1))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("band_idx"), col("band_key"))))
        .filter(col("__bsz") <= maxBucketSize)
        .drop("__bsz")
    val pairs = buckets.select(col("id").as("id_a"), col("band_idx"), col("band_key"))
      .join(buckets.select(col("id").as("id_b"), col("band_idx"), col("band_key")),
            Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    pairs
      .join(cached.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(cached.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
  }

  /** Verified near-duplicate pairs: LSH candidates with Jaccard >= τ. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double = 0.8, k: Int = 3): DataFrame =
    candidatePairs(df, idCol, textCol, k)
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")

  /** p2: near-dup pairs over documents (rows-only check; Spark's xxhash64
    * seeding is engine-specific so DuckDB can't mirror the LSH). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    nearDuplicatePairs(Tables.documents(spark, dir), "doc_id", "text", 0.8)
      .orderBy($"id_a", $"id_b")
  }
}
