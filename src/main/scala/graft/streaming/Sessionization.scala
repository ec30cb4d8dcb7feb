package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** S2 (batch twin): gap-based sessionization as window algebra — the
  * classic lag → new-session flag → running-sum session id → group-by.
  * Semantically identical to [[EventStreams.sessionize]] (the spec
  * cross-checks them); this form is SQL-mirrorable so it carries the
  * DuckDB oracle for the sessionization semantics.
  *
  * Scale: one shuffle on user_id (window), then a map-side-combinable
  * aggregation on (user_id, session_id).
  */
object Sessionization {

  val GapMs: Long = 30 * 60 * 1000L

  def sessionsBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("prev_ms", lag(unix_millis($"ts"), 1).over(w))
      .withColumn("new_s",
        when($"prev_ms".isNull || unix_millis($"ts") - $"prev_ms" > GapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"new_s").over(wRun))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
           count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value"))
      .orderBy($"user_id", $"session_id")
  }
}
