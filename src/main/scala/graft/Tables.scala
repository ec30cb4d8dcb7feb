package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Each table is a single parquet file per scale-factor directory. At
  * cluster scale these would be partitioned directories; `spark.read
  * .parquet` handles both transparently, and every query in this repo
  * relies on Catalyst pushing filters/column pruning into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // events needs its nanos-timestamp handling on EVERY path
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across driver-generated
    * datasets: TIMESTAMP(NANOS) (unreadable by Spark without
    * `nanosAsLong`, surfacing as BIGINT nano-epochs) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfacing as
    * TIMESTAMP_NTZ). Adapt to whatever is actually on disk instead of
    * assuming one encoding; every path normalizes to a session-TZ
    * TimestampType column (all entry points pin the session to UTC, so
    * the NTZ→TZ cast preserves the stored epoch-micros exactly). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(s.read.parquet(s"$d/events.parquet"))
  }

  /** Normalize an events frame's `ts` column to TimestampType regardless
    * of the on-disk encoding. Integer division for the nanos branch (a
    * double-typed `/ 1000` would lose precision on ~1.7e18 ns-epochs). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType          => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType  => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType     => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet encoding read as $other " +
        "(expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Columns every query pack depends on, per table. Types are not pinned
    * here (the loaders adapt encodings); presence is the contract. */
  private val requiredColumns: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value"),
    "documents"  -> Seq("doc_id", "text", "lang", "source"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** KEY-UNIQUENESS CONTRACT — which candidate keys an operator may
    * treat as row identity (hash for a sample/split/dedup/tie-break,
    * assume one payload per key). Verified by [[contractCheck]] at
    * every Verify/Bench startup.
    *
    * lineitem is deliberately ABSENT: (l_orderkey, l_linenumber) is
    * NOT unique in the driver testdata (~24% duplicated pairs at every
    * sf — 11,785 extra rows at sf0.01 — with DIFFERENT payloads). The
    * r13 q29c flake came from tie-breaking on that pair as if it were
    * a primary key: the winning twin was scan-order luck, and the
    * sealed hash flipped between engines. Any operator that needs a
    * total order over lineitem rows must content-address the PAYLOAD
    * it reads (see SampleQuantiles.sampleOf), never assume the pair. */
  val uniqueKeys: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey"),
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey"),
    "events"     -> Seq("event_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Data-contract smoke check: load every table through its real loader,
    * verify the columns the query pack depends on are present, the
    * normalized `ts` is a timestamp, each table has rows, and every
    * [[uniqueKeys]] claim holds on THIS dataset. One loud startup
    * failure instead of 25 queries dying individually mid-suite
    * (the r05 regression mode: a silently-changed on-disk encoding;
    * the r13 q29c mode: an operator trusting a key that stopped being
    * unique). */
  def contractCheck(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.types._
    val problems = scala.collection.mutable.ArrayBuffer[String]()
    all.foreach { t =>
      try {
        val df = load(spark, sfDir, t)
        val have = df.schema.fieldNames.toSet
        val missing = requiredColumns(t).filterNot(have)
        if (missing.nonEmpty)
          problems += s"$t: missing columns ${missing.mkString(",")} (have ${have.mkString(",")})"
        if (t == "events") df.schema("ts").dataType match {
          case TimestampType | TimestampNTZType => ()
          case other => problems += s"events.ts normalized to $other, expected timestamp"
        }
        if (df.limit(1).count() != 1L) problems += s"$t: empty table"
        else uniqueKeys.get(t).filter(_.forall(have)).foreach { key =>
          import org.apache.spark.sql.functions.{count_distinct, lit, struct, count => cnt}
          val r = df.agg(cnt(lit(1)).as("n"),
                         count_distinct(struct(key.map(df(_)): _*)).as("d")).head()
          if (r.getLong(0) != r.getLong(1))
            problems += s"$t: key (${key.mkString(",")}) claimed unique but has " +
              s"${r.getLong(0) - r.getLong(1)} duplicate rows — operators hashing this " +
              "key as row identity are now nondeterministic"
        }
      } catch { case e: Throwable =>
        problems += s"$t: load failed: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }
    }
    if (problems.nonEmpty) throw new IllegalStateException(
      s"DATA CONTRACT violated for $sfDir:\n  " + problems.mkString("\n  "))
  }
}
