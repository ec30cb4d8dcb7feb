package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** §2.2 relational query pack — probe slice.
  *
  * Conventions (driver compare is column-name + value-hash based):
  *  - every computed column is aliased identically here and in the oracle;
  *  - double aggregates are rounded to 2 decimals on BOTH sides so
  *    summation-order ulp drift can't flip the hash;
  *  - every result has a total deterministic order key set (the driver may
  *    sort rows, but top-k/limit queries must be deterministic BEFORE the
  *    limit, so ties are always broken by a unique key).
  */
object Relational {

  /** R2: multi-aggregate hash aggregation (TPC-H Q1 pattern).
    * Scale: partial (map-side) aggregation on 6 grouping values → tiny
    * shuffle regardless of input size. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** R10: top-k by total order value; ties broken by key so the limit is
    * deterministic. Scale: TakeOrderedAndProject — no full sort. */
  def q2TopkOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }

  /** R1: filter+project pushed to the parquet scan, single scalar agg. */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
              $"l_discount".between(0.03, 0.07) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"))
  }

  /** R19: batch tumbling-window aggregation over the events stream table.
    * Scale: date_trunc is codegen'd; grouping keys are bounded. */
  def q19HourlyEvents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
           round(sum($"value"), 2).as("sum_value"))
      .orderBy($"hour", $"event_type")
  }
}
