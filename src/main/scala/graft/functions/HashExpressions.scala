package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Primitive-loop hash kernels shared by the fused LSH expressions below
  * (and callable from generated code — Scala objects expose static
  * forwarders, so codegen emits plain `graft.functions.HashUtil.f(...)`).
  *
  * Round-1's LSH signatures were nested Catalyst higher-order functions:
  * 64 interpreted `xxhash64(elem, slot)` calls per set element, each
  * inner `transform` materializing a fresh array — p2+p3+p4 cost 606s of
  * the 761s sf0.1 bench. These kernels compute the identical values in
  * one compiled loop per row.
  */
object HashUtil {

  /** Minhash signature, bit-identical to the round-1 HOF form
    * `transform(sequence(0, k-1), s -> array_min(transform(sh, e -> xxhash64(e, s))))`:
    * Spark's `xxhash64(e: long, s: int)` folds children over seed 42, i.e.
    * `hashInt(s, hashLong(e, 42))` — we hash each element once and derive
    * the k slots from the per-element hash.
    *
    * An EMPTY (or all-null) element set yields the Long.MaxValue-filled
    * sentinel — a deliberate divergence from the HOF form (whose
    * array_min over an empty array is null). Callers must not band
    * sentinel signatures (all empty sets would share every bucket);
    * [[minhashBandKeys]] guards this by emitting NO band keys for empty
    * input, so empty sets simply never become candidates (Jaccard over
    * empty sets is undefined anyway). */
  def minhashSignature(elems: ArrayData, numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      if (elems.isNullAt(i)) { i += 1 }
      else {
      val h0 = XXH64.hashLong(elems.getLong(i), 42L)
      var s = 0
      while (s < numHashes) {
        val h = XXH64.hashInt(s, h0)
        if (h < sig(s)) sig(s) = h
        s += 1
      }
      i += 1
      }
    }
    sig
  }

  /** Banded LSH keys straight from the element set: minhash signature,
    * then each band's `rowsPerBand` slots folded through xxhash64. Only
    * EQUALITY of band keys matters (they key a bucket join), so the fold
    * replaces round-1's `xxhash64(concat_ws(",", slice(sig, ...)))`
    * string round-trip without changing which documents collide. */
  def minhashBandKeys(elems: ArrayData, bands: Int, rowsPerBand: Int): Array[Long] = {
    val sig = minhashSignature(elems, bands * rowsPerBand)
    // empty/all-null set → sentinel signature → no bands (see above):
    // unhashable documents must not collide with every other empty one
    if (bands > 0 && sig(0) == Long.MaxValue) {
      var empty = true
      var t = 0
      val n = elems.numElements()
      while (empty && t < n) { if (!elems.isNullAt(t)) empty = false; t += 1 }
      if (empty) return new Array[Long](0)
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < rowsPerBand) { h = XXH64.hashLong(sig(b * rowsPerBand + r), h); r += 1 }
      keys(b) = h
      b += 1
    }
    keys
  }

  private def sortedDistinct(a: Array[Long], n: Int): Array[Long] = {
    java.util.Arrays.sort(a, 0, n)
    var w = 0; var i = 0
    while (i < n) {
      if (w == 0 || a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(a, w)
  }

  /** Sorted distinct xxhash64 values of the character n-grams of `text`
    * (whole string when shorter) — one fused pass, value-identical to
    * `array_sort(array_distinct(transform(ngrams, x -> xxhash64(x))))`
    * over `substring(text, i, n)` windows. */
  def charNgramHashes(text: UTF8String, n: Int): Array[Long] = {
    val len = text.numChars()
    val wins = math.max(len - n + 1, 1)
    val out = new Array[Long](wins)
    var i = 0
    while (i < wins) {
      out(i) = XXH64.hashUTF8String(text.substringSQL(i + 1, n), 42L)
      i += 1
    }
    sortedDistinct(out, wins)
  }

  /** Hash-bucket ids — pmod(xxhash64(window bytes, seed 42), d) — of
    * every byte n-gram of lower(text), in document order (whole lowered
    * string when shorter; empty text hashes one empty window). Byte
    * windows (≡ characters on ASCII) sidestep the per-window char-offset
    * scan SQL `substring` pays on UTF8 strings — one lowered byte copy
    * per doc, then O(n)-byte rolling windows (p54's feature extractor:
    * the substring formulation measured 13.9s of p54's 15.2s at sf0.1). */
  def byteNgramBuckets(text: UTF8String, n: Int, d: Int): Array[Int] = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val wins = math.max(len - n + 1, 1)
    val out = new Array[Int](wins)
    var i = 0
    while (i < wins) {
      val m = math.min(n, len - i)
      val h = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, m, 42L)
      out(i) = (((h % d) + d) % d).toInt
      i += 1
    }
    out
  }

  /** Sorted distinct xxhash64 values of k-token shingles (split on \s+,
    * shingle = tokens joined by one space; short docs yield their whole
    * token string) — fused twin of the shingles→hash column pipeline. */
  def tokenShingleHashes(text: UTF8String, k: Int): Array[Long] = {
    val toks = text.toString.split("\\s+", -1)
    val wins = math.max(toks.length - k + 1, 1)
    val out = new Array[Long](wins)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < wins) {
      sb.setLength(0)
      val end = math.min(i + k, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      i += 1
    }
    sortedDistinct(out, wins)
  }

  /** Like [[tokenShingleHashes]] but keeps every occurrence in document
    * order (NO distinct): the counting twin for repetition metrics,
    * where duplicate shingles are the signal, not noise. */
  def tokenShingleHashSeq(text: UTF8String, k: Int): Array[Long] = {
    val toks = text.toString.split("\\s+", -1)
    val wins = math.max(toks.length - k + 1, 1)
    val out = new Array[Long](wins)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < wins) {
      sb.setLength(0)
      val end = math.min(i + k, toks.length)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      i += 1
    }
    out
  }

  /** xxhash64 of every k-CHAR window of `text`, in document order (one
    * truncated window — the whole text — when shorter). ONE char-offset
    * walk records every character's byte offset, then each window
    * hashes its byte slice in place: O(len·k) bytes hashed total. The
    * SQL `xxhash64(substring(text, pos, k))` formulation pays an
    * additional O(len) UTF8 char-offset scan per window — O(len²) per
    * doc, the exact defect measured at 13.9s of p54's 15.2s and
    * re-introduced by p33b's first cut (r9 verdict). Values are
    * xxhash64 over the window's UTF-8 bytes (seed 42) — NOT equal to
    * Spark's `xxhash64(string)` column hash; only within-corpus
    * EQUALITY matters (the oracle compares gram STRINGS). */
  def charWindowHashSeq(text: UTF8String, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val nChars = text.numChars()
    // byte offset of each char (offs(c) = start of char c, offs(nChars) = end)
    val offs = new Array[Int](nChars + 1)
    var c = 0; var b = 0
    while (c < nChars) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(nChars) = bytes.length
    val wins = math.max(nChars - k + 1, 1)
    val out = new Array[Long](wins)
    var w = 0
    while (w < wins) {
      val s = offs(w)
      val e = offs(math.min(w + k, nChars))
      out(w) = XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s, e - s, 42L)
      w += 1
    }
    out
  }

  /** Re-render `text` with the 1-based CHAR positions in `sortedPos`
    * (sorted ascending; duplicates and past-the-end positions are
    * ignored) removed — one byte walk, O(len + |positions|). The
    * row-local rebuild for span dedup: replaces a per-CHARACTER
    * explode + anti-join + collect whose shuffle carried one row per
    * character of the corpus. */
  def removeCharPositions(text: UTF8String, sortedPos: ArrayData): UTF8String = {
    val bytes = text.getBytes
    val out = new Array[Byte](bytes.length)
    val np = sortedPos.numElements()
    var w = 0; var bi = 0; var c = 1; var pi = 0
    while (bi < bytes.length) {
      val l = UTF8String.numBytesForFirstByte(bytes(bi))
      while (pi < np && sortedPos.getInt(pi) < c) pi += 1
      if (!(pi < np && sortedPos.getInt(pi) == c)) {
        var j = 0
        while (j < l) { out(w) = bytes(bi + j); w += 1; j += 1 }
      }
      bi += l; c += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, w))
  }

  /** |A ∩ B| for two sorted distinct long arrays — linear merge walk.
    * Null slots (possible only for untrusted SQL input — the fused set
    * builders emit containsNull=false) are skipped, not counted. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) { i += 1 }
      else if (b.isNullAt(j)) { j += 1 }
      else {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
      }
    }
    n
  }

  private val md5Local: ThreadLocal[MessageDigest] =
    new ThreadLocal[MessageDigest] {
      override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
    }

  /** First 64 bits of md5(token) as a big-endian long — i.e. the value of
    * the first 16 hex chars of the standard md5 hex digest. md5 (not
    * xxhash64) so a DuckDB oracle can reproduce the simhash exactly:
    * both engines agree on `md5(tok)`. */
  def md5High64(s: UTF8String): Long = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** 64-bit SimHash over a token array, packed little-endian (bit j of
    * the result = sign of vote j). Each token votes ±1 on bit j according
    * to bit j of its hash; `useMd5` picks the oracle-mirrorable md5 hash,
    * otherwise Spark-compatible xxhash64(tok) (seed 42). */
  def simhash64(toks: ArrayData, useMd5: Boolean): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) { i += 1 }
      else {
      val t = toks.getUTF8String(i)
      val h = if (useMd5) md5High64(t) else XXH64.hashUTF8String(t, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

private[functions] trait RequiresArrayOf { self: UnaryExpression =>
  def elementType: DataType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == elementType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<${elementType.simpleString}>, got ${other.simpleString}")
  }
}

/** `minhash_signature(array<long>, k)` — k-slot minhash in one fused loop. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with RequiresArrayOf {
  override def elementType: DataType = LongType
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(HashUtil.minhashSignature(a.asInstanceOf[ArrayData], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.HashUtil.minhashSignature($a, $numHashes));")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `minhash_band_keys(array<long>, bands, rowsPerBand)` — banded LSH
  * bucket keys in one fused loop (signature never materialized per row
  * beyond a stack-local array). */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with RequiresArrayOf {
  override def elementType: DataType = LongType
  override def prettyName: String = "minhash_band_keys"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(HashUtil.minhashBandKeys(a.asInstanceOf[ArrayData], bands, rowsPerBand))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.HashUtil.minhashBandKeys($a, $bands, $rowsPerBand));")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `simhash64(array<string>[, useMd5])` — packed 64-bit SimHash. */
case class SimHash64(child: Expression, useMd5: Boolean)
    extends UnaryExpression with RequiresArrayOf {
  override def elementType: DataType = StringType
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    HashUtil.simhash64(a.asInstanceOf[ArrayData], useMd5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashUtil.simhash64($a, $useMd5);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

private[functions] abstract class TextToHashSet extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
}

/** `char_ngram_hashes(text, n)` — fused shingle+hash set builder. */
case class CharNgramHashes(child: Expression, n: Int) extends TextToHashSet {
  override def prettyName: String = "char_ngram_hashes"
  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(HashUtil.charNgramHashes(a.asInstanceOf[UTF8String], n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.HashUtil.charNgramHashes($a, $n));")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `byte_ngram_buckets(text, n, d)` — hash-bucket id per byte n-gram of
  * lower(text), document order (p54's fused feature extractor). */
case class ByteNgramBuckets(child: Expression, n: Int, d: Int) extends UnaryExpression {
  override def prettyName: String = "byte_ngram_buckets"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(HashUtil.byteNgramBuckets(a.asInstanceOf[UTF8String], n, d))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.HashUtil.byteNgramBuckets($a, $n, $d));")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `char_window_hash_seq(text, k)` — xxhash64 of every k-char window in
  * document order (p33b's fused gram stream: one char-offset walk per
  * doc instead of an O(len) substring scan per window). */
case class CharWindowHashSeq(child: Expression, k: Int) extends TextToHashSet {
  override def prettyName: String = "char_window_hash_seq"
  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(HashUtil.charWindowHashSeq(a.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.HashUtil.charWindowHashSeq($a, $k));")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `remove_char_positions(text, sorted_pos)` — text with the given
  * 1-based char positions removed (row-local span-dedup re-render). */
case class RemoveCharPositions(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "remove_char_positions"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (_: StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<int>) arguments")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.removeCharPositions(a.asInstanceOf[UTF8String], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashUtil.removeCharPositions($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `token_shingle_hashes(text, k)` — fused shingle+hash set builder. */
case class TokenShingleHashes(child: Expression, k: Int) extends TextToHashSet {
  override def prettyName: String = "token_shingle_hashes"
  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(HashUtil.tokenShingleHashes(a.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.HashUtil.tokenShingleHashes($a, $k));")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `token_shingle_hash_seq(text, k)` — every k-token shingle hash in
  * document order (counting twin of [[TokenShingleHashes]]). */
case class TokenShingleHashSeq(child: Expression, k: Int) extends TextToHashSet {
  override def prettyName: String = "token_shingle_hash_seq"
  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(HashUtil.tokenShingleHashSeq(a.asInstanceOf[UTF8String], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
      s"graft.functions.HashUtil.tokenShingleHashSeq($a, $k));")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `sorted_intersect_size(array<long>, array<long>)` — |A ∩ B| for two
  * SORTED distinct long arrays via a linear merge walk: no per-row hash
  * set (Spark's `array_intersect` builds one), which matters when an LSH
  * verification step scores hundreds of thousands of candidate pairs. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_size"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<long> arguments")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HashUtil.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashUtil.sortedIntersectSize($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column builders for the fused hash expressions. */
object HashFunctions {
  import org.apache.spark.sql.graft.GraftShim.{column, expression}

  def minhash_signature(elems: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(elems), numHashes))

  def minhash_band_keys(elems: Column, bands: Int, rowsPerBand: Int): Column =
    column(MinHashBandKeys(expression(elems), bands, rowsPerBand))

  def simhash64(toks: Column, useMd5: Boolean = true): Column =
    column(SimHash64(expression(toks), useMd5))

  def sorted_intersect_size(a: Column, b: Column): Column =
    column(SortedIntersectSize(expression(a), expression(b)))

  def char_ngram_hashes(text: Column, n: Int): Column =
    column(CharNgramHashes(expression(text), n))

  def byte_ngram_buckets(text: Column, n: Int, d: Int): Column =
    column(ByteNgramBuckets(expression(text), n, d))

  def char_window_hash_seq(text: Column, k: Int): Column =
    column(CharWindowHashSeq(expression(text), k))

  def remove_char_positions(text: Column, sortedPos: Column): Column =
    column(RemoveCharPositions(expression(text), expression(sortedPos)))

  def token_shingle_hashes(text: Column, k: Int): Column =
    column(TokenShingleHashes(expression(text), k))

  def token_shingle_hash_seq(text: Column, k: Int): Column =
    column(TokenShingleHashSeq(expression(text), k))
}
