package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import EventStreams.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch 0: an event AT the initial watermark (0) is
  // treated as late and dropped — a boundary we don't want to test
  private val Base = 86400000L
  private def ts(minutes: Long): Timestamp = new Timestamp(Base + minutes * 60000L)

  test("streaming hourly window aggregation counts per type") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStreams.hourlyWindowed(ms.toDF())
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      ms.addData(
        Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(20), 2, "view", 5.0), Event(4, ts(70), 1, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.table("hourly")
        .select($"window_start", $"event_type", $"n_events", $"sum_value")
        .collect().map(r => ((r.getTimestamp(0).getTime - Base) / 60000, r.getString(1),
                             r.getLong(2), r.getDouble(3))).toSet
      assert(rows === Set((0L, "click", 2L, 3.0), (0L, "view", 1L, 5.0),
                          (60L, "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops repeated event ids") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = EventStreams.dedupedEvents(ms.toDF())
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      ms.addData(
        Event(1, ts(1), 1, "click", 1.0), Event(1, ts(2), 1, "click", 1.0),
        Event(2, ts(3), 1, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("deduped").count() === 2)
    } finally q.stop()
  }

  test("streaming incremental dedup reproduces the batch p35 decisions exactly") {
    val dir = "/root/testdata/sf0.001"
    val stream = graft.streaming.EventStreams.s8StreamIncrDedup(spark, dir)
      .collect().map(_.toSeq).toSeq
    val batch = graft.dedup.IncrementalDedup.query(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(stream === batch,
      "stream-static probe of the persisted index must equal the batch decisions")
    assert(stream.nonEmpty)
  }

  test("streaming sessionization emits gap-separated sessions, matches batch twin") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Event]
    val sessions = EventStreams.sessionize(ms.toDS(), gapMs = 30 * 60000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: events at 0,10 min (session A), then 60 min (session B)
      ms.addData(
        Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(60), 1, "view", 4.0))
      q.processAllAvailable()
      // advance event time far enough that the watermark (max-1h) passes
      // session B's timeout (60+30 min) → both sessions flush
      ms.addData(Event(99, ts(400), 9, "click", 0.0))
      q.processAllAvailable()
      ms.addData(Event(100, ts(401), 9, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions").filter($"user_id" === 1)
        .select($"session_start", $"session_end", $"n_events", $"sum_value")
        .collect().map(r => ((r.getTimestamp(0).getTime - Base) / 60000,
          (r.getTimestamp(1).getTime - Base) / 60000, r.getInt(2), r.getDouble(3))).toSet
      assert(got === Set((0L, 10L, 2, 3.0), (60L, 60L, 1, 4.0)))
    } finally q.stop()
  }
}
