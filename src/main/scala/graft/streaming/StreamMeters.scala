package graft.streaming

/** Per-streaming-query engine meters, so the bench record can ATTRIBUTE
  * wall time from the artifact alone (the `artifact_build_sec` pattern,
  * applied to the r9 verdict's streaming-band finding: the s-queries ran
  * 1.9–2.5× their committed expected values and nothing in the JSON could
  * say whether that was plan regression or ambient contention).
  *
  * For each streaming query run we record
  *  - `wall`: seconds from `start()` to `awaitTermination()` returning —
  *    the full engine lifecycle (planning, state-store init, micro-batch
  *    execution, no-data batches, teardown);
  *  - `batch`: the engine's own per-trigger accounting — the sum of
  *    `durationMs.triggerExecution` over every progress event.
  *
  * `wall − batch` is engine fixed cost (startup/teardown/trigger gaps):
  * uniform inflation of THAT band across s-queries reads as co-tenant
  * contention; inflation inside `batch` on one query reads as a real
  * plan regression. Bench.scala rides these into BENCH_SUMMARY.json as
  * `stream_engine_sec`.
  */
object StreamMeters {
  private val meters =
    new java.util.concurrent.ConcurrentHashMap[String, (Double, Double)]()

  /** Record a finished engine run (latest run wins per label). */
  def record(label: String, wallSec: Double, batchSec: Double): Unit =
    meters.put(label, (wallSec, batchSec))

  /** Sum of triggerExecution millis over a query's retained progress,
    * in seconds (AvailableNow test runs stay far under the 100-event
    * retention default, so the sum is complete). */
  def batchSeconds(q: org.apache.spark.sql.streaming.StreamingQuery): Double =
    q.recentProgress.map { p =>
      val d = p.durationMs.getOrDefault("triggerExecution", 0L)
      d.toDouble
    }.sum / 1000.0

  def snapshot: Map[String, (Double, Double)] = {
    import scala.jdk.CollectionConverters._
    meters.asScala.toMap
  }
}
