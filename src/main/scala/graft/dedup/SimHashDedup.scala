package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.functions.HashFunctions

/** §2.3 P3: SimHash near-duplicate detection.
  *
  * 64-bit SimHash over token hashes: each token votes ±1 on every bit of
  * its hash; the signature takes the sign of each bit's vote sum, packed
  * into one long (fused codegen expression — round 1 computed this as 64
  * interpreted higher-order ops per token). Candidate keys apply the
  * pigeonhole principle TWICE: hamming ≤ 3 means (a) one of the 4 16-bit
  * bands is identical, and (b) all ≤ 3 differing bits then live in the
  * other 48 bits, so one of THEIR four 12-bit chunks is also identical —
  * a matching 28-bit (band ∥ sub-chunk) composite key is therefore
  * guaranteed for every true pair. Recall is EXACTLY 1.0, not
  * probabilistic, with 2¹² × more selective keys than 16-bit bands alone:
  * simhash bands are biased by corpus-wide token statistics (same-language
  * docs share stopword mass), and on a 500k-doc corpus plain 16-bit bands
  * produced buckets of 6k+ docs → 4·10⁸ candidate pairs, vs 2.2·10⁷ with
  * composite keys (and a 348-doc max bucket). Verified by exact
  * hamming = popcount(xor).
  *
  * The token hash is md5-derived (first 64 bits of the digest) rather
  * than xxhash64 so a DuckDB oracle can replay the signature bit-for-bit
  * (`useMd5 = false` switches to the faster xxhash64 for production).
  *
  * Scale shape: one linear signature pass; one shuffle for the bucket
  * aggregation on narrow (id, band) rows — the signature long rides along
  * only in the final join-back; pair expansion happens inside buckets.
  */
object SimHashDedup {

  val Bits = 64
  val Bands = 4
  val BitsPerBand = Bits / Bands
  /** Second pigeonhole level: the 48 bits outside a band, in 4 chunks. */
  val SubBands = 4
  val SubBits = (Bits - BitsPerBand) / SubBands

  /** Packed 64-bit simhash of a token-array column. */
  def signature(toks: Column, useMd5: Boolean = true): Column =
    HashFunctions.simhash64(toks, useMd5)

  /** 16-bit band key b of a packed signature. */
  def bandKey(sig: Column, band: Int): Column =
    shiftrightunsigned(sig, band * BitsPerBand).bitwiseAND(lit(0xFFFFL))

  /** The 16 composite 28-bit candidate keys of a signature: band b's 16
    * bits ∥ chunk s of the 48 bits OUTSIDE band b. Any pair at hamming ≤
    * min(Bands, SubBands) − 1 shares at least one composite key (double
    * pigeonhole, see the object doc). */
  def compositeKeys(sig: Column): Seq[Column] =
    for (b <- 0 until Bands; s <- 0 until SubBands) yield {
      val other48 = (0 until Bands).filter(_ != b).zipWithIndex
        .map { case (j, r) => shiftleft(bandKey(sig, j), BitsPerBand * r) }
        .reduce(_.bitwiseOR(_))
      val sub = shiftrightunsigned(other48, SubBits * s)
        .bitwiseAND(lit((1L << SubBits) - 1))
      shiftleft(bandKey(sig, b), SubBits).bitwiseOR(sub)
    }

  /** Hamming distance between packed signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Near-dup pairs with hamming distance ≤ maxHamming (must be <
    * min(Bands, SubBands) for the double-pigeonhole recall guarantee).
    *
    * UNCAPPED by default: capping buckets silently drops true pairs — at
    * sf0.1 a cap of 200 on plain 16-bit bands lost 9 of 312 pairs. The
    * composite 28-bit keys keep uncapped expansion affordable (≤ 348-doc
    * buckets on a 500k-doc corpus where 16-bit bands hit 6k+). Pass a
    * finite `maxBucketSize` only when trading recall for a hard skew
    * bound. */
  /** `eager = true` materializes the (small) pair output via
    * localCheckpoint and releases the internal signature cache before
    * returning — without it, the cached blocks can only be freed by the
    * session (they back the returned lazy plan), which leaks memory
    * across many calls in a long-lived session. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         maxHamming: Int = 3, useMd5: Boolean = true,
                         maxBucketSize: Int = Int.MaxValue,
                         eager: Boolean = false): DataFrame = {
    val sigs = df
      .select(col(idCol).as("id"),
              signature(split(col(textCol), "\\s+"), useMd5).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(maxHamming < math.min(Bands, SubBands),
      s"maxHamming $maxHamming breaks the double-pigeonhole guarantee")
    val banded = sigs
      .select(col("id"), posexplode(array(compositeKeys(col("sig")): _*)))
      .select(col("id"), col("pos").as("band_idx"), col("col").as("band_key"))
    val pairs = MinHashDedup.pairsFromBands(banded, maxBucketSize)
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
    if (eager) { val out = pairs.localCheckpoint(); sigs.unpersist(false); out }
    else pairs
  }

  /** p3: simhash near-dup pairs over documents. Oracle-checked: DuckDB
    * replays the md5-derived simhash and brute-forces all-pairs hamming;
    * the banded query matches it exactly because 4-band pigeonhole recall
    * at hamming ≤ 3 is 1.0 by construction. */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    nearDuplicatePairs(Tables.documents(spark, dir), "doc_id", "text", 3,
        eager = true)
      .orderBy($"id_a", $"id_b")
  }

  /** DuckDB oracle: exact all-pairs hamming over the same md5-derived
    * simhash. Bit j of a token's hash = bit (j % 4) of hex digit
    * (16 − j/4) of md5(tok) — i.e. bit j of the first-16-hex-chars value,
    * matching [[graft.functions.HashUtil.md5High64]]. */
  val oracleSql: String =
    """WITH th AS (
         SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
         FROM documents),
       votes AS (
         SELECT doc_id, j,
           sum(CASE WHEN
             ((instr('0123456789abcdef', substr(md5(tok), CAST(16 - j // 4 AS INT), 1)) - 1)
               >> (j % 4)) & 1 = 1
             THEN 1 ELSE -1 END) AS v
         FROM th, range(0, 64) r(j)
         GROUP BY doc_id, j),
       sigs AS (
         SELECT doc_id,
           CAST(sum(CASE WHEN v > 0 THEN
             CASE WHEN j = 63 THEN -9223372036854775808
                  ELSE (CAST(1 AS BIGINT) << CAST(j AS INT)) END
             ELSE 0 END) AS BIGINT) AS sig
         FROM votes GROUP BY doc_id)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       FROM sigs a, sigs b
       WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sig, b.sig)) <= 3
       ORDER BY id_a, id_b"""
}
