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
