package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Sustained-rate streaming benchmark (SURVEY §7 "streaming rate/latency,
  * later rounds"): drives the S1 windowed-aggregation and S2
  * sessionization pipelines from the `rate` source at a fixed rows/sec,
  * then reports the engine's processed-rows/sec and state-store size per
  * micro-batch from StreamingQueryProgress.
  *
  * What it demonstrates beyond the s1/s2 correctness queries (which run
  * tiny fixtures through Trigger.AvailableNow): sustained throughput and
  * BOUNDED STATE — windowed-agg state is capped by windows-in-play ×
  * event_types, session state by distinct users, both enforced by the
  * watermark. The run fails loudly if state keeps growing batch over
  * batch.
  *
  * Usage: graft.tools.StreamBench [rowsPerSec] [seconds] [users]
  * (defaults 200000 / 20 / 1000). Prints one JSON line per pipeline.
  */
object StreamBench {

  def main(args: Array[String]): Unit = {
    val rowsPerSec = args.headOption.map(_.toInt).getOrElse(200000)
    val seconds = args.lift(1).map(_.toInt).getOrElse(20)
    val users = args.lift(2).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    /** rate-source rows shaped like the events table. */
    def events() = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSec)
      .option("numPartitions", cpus.toInt)
      .load()
      .select(col("value").as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % users).as("user_id"),
        element_at(array(lit("view"), lit("click"), lit("buy")),
          (col("value") % 3 + 1).cast("int")).as("event_type"),
        (col("value") % 97).cast("double").as("value"))

    def run(name: String, out: org.apache.spark.sql.DataFrame, mode: String): Unit = {
      val q = out.writeStream.format("memory")
        .queryName(s"bench_$name").outputMode(mode)
        .trigger(Trigger.ProcessingTime("2 seconds")).start()
      Thread.sleep(seconds * 1000L)
      val progress = q.recentProgress.toSeq
      q.stop(); q.awaitTermination()
      // skip the warmup batch; measure steady state
      val measured = progress.drop(2).filter(_.numInputRows > 0)
      val rps = measured.map(_.processedRowsPerSecond).sorted
      val medianRps = if (rps.isEmpty) 0.0 else rps(rps.size / 2)
      val stateRows = measured.flatMap(_.stateOperators.map(_.numRowsTotal))
      val stateBytes = measured.flatMap(_.stateOperators.map(_.memoryUsedBytes))
      // bounded state: the last batches must not keep growing
      val tail = stateRows.takeRight(3)
      val bounded = tail.size < 3 || tail.last <= tail.head * 1.10 + 10
      println(s"""{"stream":"$name","rows_per_sec_in":$rowsPerSec,""" +
        s""""median_processed_rps":${medianRps.round},""" +
        s""""batches":${measured.size},""" +
        s""""state_rows_last":${stateRows.lastOption.getOrElse(0L)},""" +
        s""""state_mb_last":${stateBytes.lastOption.map(_ / 1024 / 1024.0).getOrElse(0.0)},""" +
        s""""state_bounded":$bounded}""")
      require(bounded, s"$name state grew across final batches: $tail")
    }

    run("s1_windowed", graft.streaming.EventStreams.hourlyWindowed(events()), "complete")
    run("s2_sessions",
      graft.streaming.EventStreams.sessionize(
        events().as[graft.streaming.EventStreams.Event]).toDF(), "append")
    spark.stop()
  }
}
