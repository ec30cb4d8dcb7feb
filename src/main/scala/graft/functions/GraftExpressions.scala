package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot paths.
  *
  * The higher-order-function forms in [[VectorOps]] are correct and
  * SQL-mirrorable, but each `aggregate(zip_with(...))` materializes an
  * intermediate array per row — painful inside O(n²) similarity joins.
  * These expressions generate a single fused loop (whole-stage codegen),
  * with the SAME sequential accumulation order, so results stay
  * bit-identical to the HOF forms and the DuckDB oracles.
  */
abstract class FusedVectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
      s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
}

/** Sequential-order dot product over two array<double> columns. */
case class DotProduct(left: Expression, right: Expression) extends FusedVectorBinary {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused cosine similarity: dot, norms, and the division in one loop,
  * accumulation order identical to dot/(√Σx²·√Σy²) computed separately. */
case class CosineSimilarity(left: Expression, right: Expression) extends FusedVectorBinary {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i); double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused squared-L2 distance Σ(xᵢ−yᵢ)², sequential order identical to
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, +)`. */
case class SqDistance(left: Expression, right: Expression) extends FusedVectorBinary {
  override def prettyName: String = "sq_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused L1 distance Σ|xᵢ−yᵢ| (Laplacian kernel), sequential order. */
case class L1Distance(left: Expression, right: Expression) extends FusedVectorBinary {
  override def prettyName: String = "l1_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += math.abs(x.getDouble(i) - y.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Math.abs($a.getDouble($i) - $b.getDouble($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Unicode canonical/compatibility normalization (NFC/NFD/NFKC/NFKD) as
  * a native codegen expression — the curation-pipeline primitive Spark
  * lacks as a builtin (the same text byte-shifted into composed vs
  * decomposed form defeats exact dedup, md5 fingerprints, and token
  * matching unless everything is normalized first). Per-row map, zero
  * shuffle, stays inside whole-stage codegen. The `form` argument is a
  * compile-time literal so the plan carries no per-row dispatch.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_normalize form must be NFC/NFD/NFKC/NFKD, got $form")
  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }

  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(s: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(
        s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, nf))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column + SQL exposure for the native expressions. */
object GraftFunctions {

  private def litInt(e: Expression): Int = {
    require(e.foldable, s"argument must be a literal integer, got $e")
    e.eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"argument must be a literal integer, got $other")
    }
  }
  private def litBool(e: Expression): Boolean = {
    require(e.foldable, s"argument must be a literal boolean, got $e")
    e.eval(null) match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"argument must be a literal boolean, got $other")
    }
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> (es => DotProduct(es.head, es(1))),
    "cosine_sim"  -> (es => CosineSimilarity(es.head, es(1))),
    "sq_distance" -> (es => SqDistance(es.head, es(1))),
    "l1_distance" -> (es => L1Distance(es.head, es(1))),
    "minhash_signature" -> (es => MinHashSignature(es.head, litInt(es(1)))),
    "minhash_band_keys" -> (es => MinHashBandKeys(es.head, litInt(es(1)), litInt(es(2)))),
    "simhash64" -> (es => SimHash64(es.head,
      if (es.length > 1) litBool(es(1)) else true)),
    "unicode_normalize" -> (es => UnicodeNormalize(es.head, litString(es(1)))))

  private def litString(e: Expression): String = {
    require(e.foldable, s"argument must be a literal string, got $e")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"argument must be a literal string, got $other")
    }
  }

  /** Register `dot_product` / `cosine_sim` for SQL use in a session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.graft.GraftShim.registerFunction(spark, name, b)
    }

  /** Column forms (usable without SQL registration). */
  def dot_product(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftShim.column(
      DotProduct(org.apache.spark.sql.graft.GraftShim.expression(a),
                 org.apache.spark.sql.graft.GraftShim.expression(b)))
  def cosine_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftShim.column(
      CosineSimilarity(org.apache.spark.sql.graft.GraftShim.expression(a),
                       org.apache.spark.sql.graft.GraftShim.expression(b)))
  def sq_distance(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftShim.column(
      SqDistance(org.apache.spark.sql.graft.GraftShim.expression(a),
                 org.apache.spark.sql.graft.GraftShim.expression(b)))
  def l1_distance(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftShim.column(
      L1Distance(org.apache.spark.sql.graft.GraftShim.expression(a),
                 org.apache.spark.sql.graft.GraftShim.expression(b)))
  def unicode_normalize(s: Column, form: String): Column =
    org.apache.spark.sql.graft.GraftShim.column(
      UnicodeNormalize(org.apache.spark.sql.graft.GraftShim.expression(s), form))
}

/** `SparkSessionExtensions` hook: wire the graft functions into any
  * session via `spark.sql.extensions=graft.functions.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (es: Seq[Expression]) => DotProduct(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarity(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("sq_distance"),
      new ExpressionInfo(classOf[SqDistance].getName, "sq_distance"),
      (es: Seq[Expression]) => SqDistance(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("l1_distance"),
      new ExpressionInfo(classOf[L1Distance].getName, "l1_distance"),
      (es: Seq[Expression]) => L1Distance(es.head, es(1))))
    def litInt(e: Expression): Int = {
      require(e.foldable, s"argument must be a literal integer, got $e")
      e.eval(null).asInstanceOf[Number].intValue()
    }
    ext.injectFunction((FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (es: Seq[Expression]) => MinHashSignature(es.head, litInt(es(1)))))
    ext.injectFunction((FunctionIdentifier("minhash_band_keys"),
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "minhash_band_keys"),
      (es: Seq[Expression]) => MinHashBandKeys(es.head, litInt(es(1)), litInt(es(2)))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head,
        if (es.length > 1) es(1).eval(null).asInstanceOf[Boolean] else true)))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (es: Seq[Expression]) => SortedIntersectSize(es.head, es(1))))
    ext.injectFunction((FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (es: Seq[Expression]) => UnicodeNormalize(es.head,
        es(1).eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)))
  }
}
