package graft.ml

import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.1 M1: LIBSVM text format I/O (reference: psvm document.cc —
  * `label idx:val idx:val …`, 1-based sparse indices).
  *
  * Reading uses Spark's built-in libsvm source (splittable, distributed);
  * writing re-serializes with column algebra only.
  */
object LibSvmIO {

  /** Read → (label: double, features: array<double> dense). */
  def read(spark: SparkSession, path: String, numFeatures: Int = -1): DataFrame = {
    val base = spark.read.format("libsvm")
    val df = (if (numFeatures > 0) base.option("numFeatures", numFeatures.toString)
              else base).load(path)
    df.select(col("label"), vector_to_array(col("features")).as("features"))
  }

  /** Read WITHOUT densifying → (label: double, indices: array<int>
    * 0-based ascending, values: array<double>) — the representation the
    * reference actually stores (psvm document.cc sparse rows) and the
    * only one that survives rcv1-class dimensionality: a 47k-dim row
    * with ~75 non-zeros is ~1 KB sparse vs ~370 KB densified. Plain
    * splittable text parsing (one shuffle-free columnar map); libsvm
    * lines carry ascending 1-based indices, preserved here as ascending
    * 0-based — the order the merge-join kernels require. */
  def readSparse(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(trim(col("value")), "\\s+").as("t"))
      .filter(size(col("t")) >= 1 && length(element_at(col("t"), 1)) > 0)
      .select(
        element_at(col("t"), 1).cast("double").as("label"),
        expr("transform(slice(t, 2, greatest(size(t) - 1, 0)), " +
             "p -> cast(split(p, ':')[0] as int) - 1)").as("indices"),
        expr("transform(slice(t, 2, greatest(size(t) - 1, 0)), " +
             "p -> cast(split(p, ':')[1] as double))").as("values"))

  /** Write (labelCol, idxCol: array<int> 0-based, valCol: array<double>)
    * as LIBSVM text (1-based indices on disk). */
  def writeSparse(df: DataFrame, labelCol: String, idxCol: String,
                  valCol: String, path: String): Unit =
    df.select(concat_ws(" ",
        col(labelCol).cast("string"),
        array_join(zip_with(col(idxCol), col(valCol),
          (i, v) => concat((i + 1).cast("string"), lit(":"), v.cast("string"))), " "))
      .as("line"))
      .write.mode("overwrite").text(path)

  /** Write (labelCol, vecCol: array<double>) as LIBSVM text. */
  def write(df: DataFrame, labelCol: String, vecCol: String, path: String): Unit =
    df.select(concat_ws(" ",
        col(labelCol).cast("string"),
        array_join(expr(
          s"transform(filter(arrays_zip(sequence(1, size($vecCol)), $vecCol), " +
          s"p -> p.$vecCol <> 0.0d), " +
          s"p -> concat(cast(p.`0` as string), ':', cast(p.$vecCol as string)))"), " "))
      .as("line"))
      .write.mode("overwrite").text(path)
}
