package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.3 P12: multimodal (image/audio/video) column plumbing.
  *
  * Design: media payloads are opaque `binary` columns with typed metadata
  * (kind/width/height/sample_rate). The decode step is a clearly-marked
  * DETERMINISTIC STUB (this container has no image/audio codecs): a
  * payload's "pixels" are derived from its md5 hex digits. Everything
  * around the stub — schema, partitioning, per-frame explode, batched
  * inference via mapPartitions — is the real plumbing a production
  * pipeline would keep while swapping the stub for a codec call.
  *
  * Scale: decode/featurize are narrow per-row maps (no shuffle); frame
  * explode multiplies rows by frame count and is immediately reduced by
  * the per-frame aggregate; batched scoring streams each partition
  * through fixed-size batches — the exact shape GPU inference needs.
  */
object MultimodalOps {

  /** Derive a deterministic media table from documents: payload bytes are
    * the md5 of the text (a stand-in for real image/audio bytes), with
    * typed metadata columns. */
  def mediaFromDocuments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id".as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        ($"doc_id" % 3 + 1).cast("int")).as("kind"),
      unhex(md5($"text")).as("payload"),
      md5($"text").as("payload_hex"),
      lit(8).as("width"), lit(4).as("height"),
      lit(16000).as("sample_rate"),
      (length($"text") * 10).cast("long").as("duration_ms"))
  }

  /** STUB decode: 32 "pixels" in [0,1], one per md5 hex digit.
    * (Real system: codec call here; the column contract — array<double>
    * of intensities — is what downstream ops depend on.) */
  def decodePixels(payloadHexCol: String): Column = expr(
    s"transform(sequence(1, 32), i -> " +
    s"(instr('0123456789abcdef', substring($payloadHexCol, i, 1)) - 1) / 15.0d)")

  /** mm1: decode + per-media feature extraction (mean/std/min/max of the
    * stub-decoded intensities) — oracle-checked. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .withColumn("px", decodePixels("payload_hex"))
      .withColumn("n", size($"px").cast("double"))
      .withColumn("mean_px", expr("aggregate(px, 0.0d, (a, v) -> a + v)") / $"n")
      .withColumn("var_px",
        expr("aggregate(px, 0.0d, (a, v) -> a + v * v)") / $"n" - $"mean_px" * $"mean_px")
      .select($"media_id", $"kind", $"duration_ms",
        round($"mean_px", 6).as("mean_px"),
        round(sqrt(greatest($"var_px", lit(0.0))), 6).as("std_px"),
        round(array_min($"px"), 6).as("min_px"),
        round(array_max($"px"), 6).as("max_px"))
      .orderBy($"media_id")
  }

  /** mm2: frame sampling for "video" media — split the payload into 4
    * frames of 8 hex digits, explode, per-frame mean — oracle-checked. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaFromDocuments(spark, dir)
      .filter($"kind" === "video")
      .select($"media_id", posexplode(expr(
        "transform(sequence(0, 3), f -> substring(payload_hex, f * 8 + 1, 8))")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumn("frame_mean", round(expr(
        "aggregate(transform(sequence(1, 8), i -> " +
        "(instr('0123456789abcdef', substring(col, i, 1)) - 1) / 15.0d), " +
        "0.0d, (a, v) -> a + v)") / 8.0, 6))
      .select($"media_id", $"frame_idx".cast("long").as("frame_idx"), $"frame_mean")
      .orderBy($"media_id", $"frame_idx")
  }

  /** Batched "inference" over media rows: the mapPartitions shape real
    * GPU scoring needs (fixed-size batches, one model handle per
    * partition). The model here is a deterministic stub (mean of decoded
    * pixels per batch element). */
  final case class MediaRow(media_id: Long, payload_hex: String)
  final case class Scored(media_id: Long, score: Double, batch_size: Int)

  def batchScore(media: Dataset[MediaRow], batchSize: Int = 32): Dataset[Scored] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: val model = loadModelOnce()   (per partition)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val px = r.payload_hex.take(32).map(c => ("0123456789abcdef".indexOf(c)) / 15.0)
          Scored(r.media_id, px.sum / px.length, batch.size)
        }
      }
    }
  }
}
