package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 P3: SimHash near-duplicate detection.
  *
  * 64-bit SimHash over token hashes: each token votes ±1 on every bit of
  * its xxhash64; the signature takes the sign of each bit's vote sum.
  * Near-dup candidates share at least one of 4 16-bit bands (pigeonhole:
  * hamming ≤ 3 ⇒ some band identical); verified by exact hamming ≤ k.
  *
  * All column algebra (nested higher-order functions) — no UDFs.
  */
object SimHashDedup {

  val Bits = 64
  val Bands = 4
  val BitsPerBand = Bits / Bands

  /** 64-element 0/1 bit array: sign of per-bit vote sums over all tokens.
    * SQL expr because the Scala API only takes literal shift amounts. */
  def simhashBits(toksSql: String): Column = expr(
    s"""transform(
          aggregate($toksSql,
            array_repeat(0L, $Bits),
            (acc, t) -> zip_with(acc,
              transform(sequence(0, ${Bits - 1}),
                j -> if((shiftright(xxhash64(t), j) & 1) = 1, 1L, -1L)),
              (a, v) -> a + v)),
          s -> if(s > 0, 1, 0))""")

  /** Pack a 16-bit band of the bit array into a long key. */
  def bandKey(bitsSql: String, band: Int): Column = expr(
    s"""aggregate(
          zip_with(slice($bitsSql, ${band * BitsPerBand + 1}, $BitsPerBand),
                   sequence(0, ${BitsPerBand - 1}),
                   (bit, j) -> cast(bit as bigint) * shiftleft(cast(1 as bigint), j)),
          cast(0 as bigint), (acc, v) -> acc + v)""")

  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, lit(0)).otherwise(lit(1))),
              lit(0), (acc, v) => acc + v)

  /** Near-dup pairs with hamming distance ≤ maxHamming. */
  def nearDuplicatePairs(df: DataFrame, idCol: String, textCol: String,
                         maxHamming: Int = 3): DataFrame = {
    val sigs = df
      .withColumn("__toks", split(col(textCol), "\\s+"))
      .select(col(idCol).as("id"), simhashBits("__toks").as("bits"))
    val banded = sigs
      .select(col("id"), col("bits"),
              posexplode(array((0 until Bands).map(b => bandKey("bits", b)): _*)))
      .select(col("id"), col("bits"), col("pos").as("band_idx"), col("col").as("band_key"))
    val a = banded.select(col("id").as("id_a"), col("bits").as("bits_a"),
                          col("band_idx"), col("band_key"))
    val b = banded.select(col("id").as("id_b"), col("bits").as("bits_b"),
                          col("band_idx"), col("band_key"))
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("bits_a"), col("bits_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** p3: simhash near-dup pairs over documents (rows-only check). */
  def query(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    nearDuplicatePairs(Tables.documents(spark, dir), "doc_id", "text", 3)
      .orderBy($"id_a", $"id_b")
  }
}
