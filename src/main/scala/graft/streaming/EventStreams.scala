package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.4: Structured Streaming over the events stream.
  *
  * The same event schema as the batch `events` table; any streaming
  * source (kafka/files/socket) that produces (event_id, ts, user_id,
  * event_type, value) plugs in. Specs drive these with MemoryStream.
  *
  * Scale: windowed aggregation state is bounded by the watermark;
  * sessionization state is per-user and evicted on event-time timeout —
  * both shapes run unchanged on a 1000-executor cluster, partitioned by
  * grouping key.
  */
object EventStreams {

  /** S1: tumbling-window counts/sums per event_type with a watermark
    * (late data beyond 1 hour is dropped, state is evicted). */
  def hourlyWindowed(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** S6: sliding windows through the real engine — 1-hour windows every
    * 15 minutes (each event feeds 4 windows). Streaming twin of the
    * batch q34; the oracle replays the epoch-aligned window set in SQL. */
  def slidingWindowed(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** S3: streaming exact dedup on event_id within the watermark. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  // ---- driver-visible streaming queries ----
  // These run the REAL streaming engine over the events parquet as a
  // file-source stream with Trigger.AvailableNow (process everything,
  // then stop) into a memory sink, so the driver's DuckDB gate can
  // hash-compare genuine Structured Streaming output against the
  // batch-equivalent SQL. At cluster scale the same code tails a
  // directory/Kafka topic instead of finishing.

  /** File-source stream over any table of the dataset. The source lists
    * a DIRECTORY (that's its contract — new files arrive over time). A
    * directory-shaped table (the production layout, and any multi-file
    * write) streams as-is; the driver's single-FILE test tables are
    * staged behind a symlink in a temp dir. (The source does NOT recurse
    * into subdirectories, so pointing it at the parent with a file-named
    * child dir silently streams zero files — found when the 10× scaled
    * corpus produced empty streaming results.) */
  private def tableStream(spark: org.apache.spark.sql.SparkSession,
                          dir: String, table: String): DataFrame = {
    val src = java.nio.file.Paths.get(dir, s"$table.parquet")
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) src.toString
      else {
        val staged = java.nio.file.Files.createTempDirectory("graft_stream_src")
        // staged dirs hold one symlink each; clean them up on JVM exit so
        // repeated bench/verify sessions don't accumulate temp entries
        staged.toFile.deleteOnExit()
        val link = staged.resolve(s"$table.parquet")
        link.toFile.deleteOnExit()
        try java.nio.file.Files.createSymbolicLink(link, src)
        catch { case _: Throwable => java.nio.file.Files.copy(src, link) }
        staged.toString
      }
    val schema = spark.read.parquet(src.toString).schema
    spark.readStream.schema(schema).parquet(streamDir)
  }

  private def eventStream(spark: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // schema-adaptive: the batch schema applied by tableStream reflects
    // whatever ts encoding is on disk; normalize it the same way the
    // batch loader does (graft.Tables.normalizeTs)
    graft.Tables.normalizeTs(tableStream(spark, dir, "events"))
  }

  private def runToMemory(out: DataFrame, mode: String, label: String = ""): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val spark = out.sparkSession
    val name = "graft_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    // stateful operators instantiate one state store per shuffle
    // partition PER BATCH; on the bounded test streams the per-store
    // fixed cost dominates, so run the engine with a narrower state
    // layout. Sized from the cluster's core count, not hard-coded: on a
    // real cluster defaultParallelism = total executor cores, and the
    // floor keeps tiny local runs from serializing the keyed shuffle.
    // (State-layout width is a first-run choice — the store count is
    // fixed by the checkpoint afterwards — so it must come from cluster
    // shape, never the 200-partition SQL default.)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val stateParts = math.max(4, spark.sparkContext.defaultParallelism / 4)
    spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
    // RocksDB state store by default: the in-memory HDFSBackedStateStore
    // holds EVERY key of every stateful operator on-heap (s3's dedup set
    // is corpus-cardinality-sized — 10M keys at the 100× decade measured
    // 61s with GC pressure), while RocksDB keeps state off-heap with
    // spill-to-disk, the shape that survives billion-key streams.
    // Env-overridable for A/B (SPARK_GRAFT_STATE_STORE=memory).
    val prevProvider = spark.conf.get(ProviderConf, "")
    spark.conf.set(ProviderConf, stateStoreProvider)
    // Changelog checkpointing: commit per-batch DELTAS instead of a full
    // RocksDB snapshot upload per store per batch — strictly less commit
    // I/O at every scale (snapshots still happen, asynchronously in the
    // maintenance thread). Env-overridable for A/B.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true"))
    try {
      val t0 = System.nanoTime()
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      if (label.nonEmpty)
        StreamMeters.record(label, (System.nanoTime() - t0) / 1e9,
          StreamMeters.batchSeconds(q))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      if (prevProvider.isEmpty) spark.conf.unset(ProviderConf)
      else spark.conf.set(ProviderConf, prevProvider)
    }
    spark.table(name)
  }

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"

  /** The keyed state-layout width [[runToMemory]] uses, for the
    * self-managed foreachBatch streams (s11/s13) that don't go through
    * it: micro-batch plans run with AQE disabled, so every stateful or
    * batch-side shuffle otherwise executes at the session's full
    * shuffle width over batch-sized rows — measured 32-task stages per
    * micro-batch on frames of a few thousand rows. Same
    * cluster-shape-derived formula, same restore discipline. */
  private[streaming] def withStateParts[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val stateParts = math.max(4, spark.sparkContext.defaultParallelism / 4)
    spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
    // NOTE deliberately width-only: forcing the RocksDB provider here
    // was A/B'd in r15 and made s11 ~2× slower (7.2 vs 3.3 s — its
    // stateful agg pays per-store RocksDB spin-up every micro-batch
    // while its state is BOUNDED by design, windows × items, never
    // event volume), so the bounded-state self-managed streams keep the
    // session-default in-memory provider. runToMemory's corpus-keyed
    // streams (s3 dedup etc.) keep RocksDB — their state grows with
    // key cardinality.
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private[streaming] def stateStoreProvider: String =
    sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "rocksdb") match {
      case "memory" =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      case _ =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    }

  /** s1: S1 through the streaming engine, hash-compared to the batch
    * windowed aggregation (complete mode — every window survives). */
  def s1StreamHourly(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    runToMemory(hourlyWindowed(eventStream(spark, dir)), "complete", "s1_stream_hourly")
      .select(col("window_start"), col("event_type"), col("n_events"),
              round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** s6: S6 through the streaming engine (complete mode — bounded
    * window-slot cardinality regardless of event volume). */
  def s6StreamSliding(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    runToMemory(slidingWindowed(eventStream(spark, dir)), "complete", "s6_stream_sliding")
      .select(col("window_start"), col("event_type"), col("n_events"),
              round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** s2: S2 through the streaming engine. The engine emits (a) sessions
    * CLOSED by a later in-batch event and (b) per-user final sessions
    * flushed by the event-time timeout in the engine's trailing batch,
    * once the final watermark (global max ts − 1h) passes
    * session_end + gap. Both parts are deterministic and
    * SQL-expressible, and the oracle mirrors exactly that. */
  def s2StreamSessions(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val events = eventStream(spark, dir)
      .select(col("event_id").cast("long"), col("ts"),
              col("user_id").cast("long"), col("event_type"),
              col("value").cast("double"))
      .as[Event]
    runToMemory(sessionize(events).toDF(), "append", "s2_stream_sessions")
      .select(col("user_id"), col("session_start"), col("session_end"),
              col("n_events").cast("long").as("n_events"),
              round(col("sum_value"), 2).as("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** S4: stream-stream inner join — clicks joined to purchases by the
    * same user within 10 minutes AFTER the click. Both sides carry
    * watermarks and the join condition bounds event time on both ends,
    * so the engine can evict join state (the production shape for
    * attribution joins); on the bounded test stream the emitted matches
    * equal the batch join with the same time-range predicate, which is
    * exactly what the oracle computes. */
  def s4StreamJoin(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val clicks = eventStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = eventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
              col("value"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"))
    runToMemory(joined, "append", "s4_stream_join")
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("user_id")).as("n_users"),
           round(sum(col("value")), 2).as("sum_purchase_value"))
  }

  /** S10: stream-stream LEFT OUTER join — s4's attribution join, but
    * clicks that find NO purchase within the 10-minute window must ALSO
    * be emitted (with a null purchase side). Outer emission is the hard
    * streaming semantic: a null row may only be produced once the
    * watermark proves no matching purchase can still arrive, so the
    * engine evicts left state (and emits the null) when the watermark
    * passes click_ts + 10 min — the no-data trailing batches of
    * AvailableNow drive the final watermark to (max ts − 1 h) and flush
    * exactly the decidable clicks.
    *
    * Determinism: emissions for clicks NEAR the stream's end depend on
    * watermark boundary arithmetic, so the query aggregates only the
    * SAFE region (click_ts ≤ max ts − 2 h), where every click is
    * provably decided — the s2 final-flush pattern. The oracle is the
    * batch left join restricted identically. */
  def s10StreamOuterJoin(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val clicks = eventStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
              col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = eventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
              col("value"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 10 MINUTES"),
      "left_outer")
    val emitted = runToMemory(joined, "append", "s10_stream_outer_join")
    // safe-region bound: the engine's global watermark is the MIN of the
    // two per-stream watermarks (multipleWatermarkPolicy=min), so a click
    // is provably decided only once MIN(max click ts, max purchase ts)
    // − 1 h passes click_ts + 10 min; bound 2 h under that min (one
    // bounded driver scalar)
    val r = graft.Tables.events(spark, dir)
      .agg(max(when(col("event_type") === "click", col("ts"))).as("mc"),
           max(when(col("event_type") === "purchase", col("ts"))).as("mp"))
      .head()
    // either stream side absent → max is null → nothing is provably
    // decided; return the empty aggregate instead of dereferencing null
    // (the batch oracle's least(...) degrades to null the same way)
    if (r.isNullAt(0) || r.isNullAt(1))
      return emitted.filter(lit(false))
        .agg(count(lit(1)).as("n_rows"),
             count(col("purchase_ts")).as("n_matched"),
             sum(when(col("purchase_ts").isNull, 1L).otherwise(0L)).as("n_unmatched_clicks"),
             round(sum(col("value")), 2).as("sum_matched_value"))
    val minMax =
      if (r.getTimestamp(0).before(r.getTimestamp(1))) r.getTimestamp(0)
      else r.getTimestamp(1)
    emitted
      .filter(col("click_ts") <= lit(minMax) - expr("INTERVAL 2 HOURS"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("purchase_ts")).as("n_matched"),
           sum(when(col("purchase_ts").isNull, 1L).otherwise(0L)).as("n_unmatched_clicks"),
           round(sum(col("value")), 2).as("sum_matched_value"))
  }

  val s10OracleSql: String =
    """WITH mx AS (SELECT least(
             (SELECT max(ts) FROM events WHERE event_type = 'click'),
             (SELECT max(ts) FROM events WHERE event_type = 'purchase')) AS maxts),
       c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
             FROM events WHERE event_type = 'click'),
       p AS (SELECT user_id AS p_user, ts AS purchase_ts, value
             FROM events WHERE event_type = 'purchase'),
       j AS (SELECT c.click_ts, p.purchase_ts, p.value
             FROM c LEFT JOIN p
               ON c.user_id = p.p_user
              AND p.purchase_ts >= c.click_ts
              AND p.purchase_ts <= c.click_ts + INTERVAL 10 MINUTE)
       SELECT count(*) AS n_rows,
              count(purchase_ts) AS n_matched,
              CAST(sum(CASE WHEN purchase_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_unmatched_clicks,
              round(sum(value), 2) AS sum_matched_value
       FROM j, mx
       WHERE click_ts <= maxts - INTERVAL 2 HOUR"""

  /** S5: streaming CDC-apply — a `foreachBatch` sink that MERGES each
    * micro-batch into a persisted table version (the lakehouse
    * streaming-merge pattern): events become keyed price updates,
    * deduped per batch to the latest (event-time, event-id) writer and
    * last-writer-wins-merged into the prior state version. The merge is
    * associative, so the final state is identical however the engine
    * splits batches; updates aimed at keys outside the base are
    * ignored (insert semantics are u6's batch path). */
  def s5StreamUpsert(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val ordersBase = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val nOrders = ordersBase.count()
    val stateRoot = java.nio.file.Files.createTempDirectory("graft_stream_merge").toString
    ordersBase.withColumn("__v", lit(-1L)).withColumn("__e", lit(-1L))
      .write.mode("overwrite").parquet(s"$stateRoot/state_0")
    val updatesStream = eventStream(spark, dir).select(
      ((col("event_id") % nOrders) + 1).as("o_orderkey"),
      (col("value") * 100).as("o_totalprice"),
      unix_millis(col("ts")).as("__v"),
      col("event_id").as("__e"))
    val t0 = System.nanoTime()
    val q = updatesStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeUpsertBatch(spark, stateRoot, ordersBase, batch)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    StreamMeters.record("s5_stream_upsert", (System.nanoTime() - t0) / 1e9,
      StreamMeters.batchSeconds(q))
    val fin = spark.read.parquet(s"$stateRoot/state_${latestStateVersion(stateRoot)}")
    val out = fin.agg(
      count(lit(1)).as("n_orders"),
      round(sum(col("o_totalprice")), 2).as("total_value"),
      sum(when(col("__v") >= 0, 1L).otherwise(0L)).as("n_updated"))
    graft.operators.ScaleOps.materializeThen(out)(
      graft.operators.ScaleOps.deleteRecursively(stateRoot))
  }

  /** Highest COMMITTED state version under a versioned-merge root —
    * derived from the DIRECTORY LISTING, not a process-local counter, so
    * a restarted query (new JVM, same stateRoot) resumes from the state
    * its predecessor actually committed. "Committed" means the version
    * directory carries the `_SUCCESS` marker the parquet job commit
    * protocol writes LAST: a crash DURING a state write leaves a partial
    * `state_N` with no marker, and counting it would hand the restarted
    * chain a torn state file, silently dropping previously merged rows
    * (r9 ADVICE). Torn versions are simply skipped — the replayed
    * micro-batch re-merges onto the last good version and overwrites
    * the partial directory. */
  private[streaming] def latestStateVersion(stateRoot: String): Int = {
    val rootPath = java.nio.file.Paths.get(stateRoot)
    val listing = java.nio.file.Files.list(rootPath)
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.startsWith("state_") &&
          java.nio.file.Files.exists(rootPath.resolve(s).resolve("_SUCCESS")) =>
          s.stripPrefix("state_").toInt }
        .foldLeft(0)(math.max)
    } finally listing.close()
  }

  /** One CDC merge step (the s5 foreachBatch body, exposed so the
    * checkpoint-recovery spec drives the EXACT production merge across a
    * kill/restart): last-writer-wins merge of this micro-batch's update
    * rows into the latest state version, written as the NEXT version —
    * never in place, since the read streams from the current version's
    * files while the new one materializes.
    *
    * Restart safety, three layers: (a) the version cursor comes from
    * the directory listing COUNTING ONLY `_SUCCESS`-marked versions, so
    * a crash mid-write leaves a torn `state_N` that the restarted chain
    * skips and overwrites; (b) the merge is idempotent — after a crash
    * between the state write and the checkpoint commit, Structured
    * Streaming REPLAYS the uncommitted micro-batch with the same rows,
    * and re-merging them yields a state version with identical content
    * (the rank-1 winner per key cannot change when its own rows are
    * re-offered). The remaining window is the commit protocol's own:
    * `_SUCCESS` creation is not atomic WITH the task-file renames, so a
    * crash after the last rename but before the marker re-runs one
    * merge — idempotent by (b), never torn. On object stores without
    * atomic rename the marker-last ordering is the committer's
    * contract (magic committer / job-commit semantics), same as every
    * parquet job this library writes. */
  private[streaming] def mergeUpsertBatch(spark: org.apache.spark.sql.SparkSession,
                                          stateRoot: String,
                                          base: DataFrame,
                                          batch: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("__v").desc, col("__e").desc)
    val ver = latestStateVersion(stateRoot)
    val latest = batch
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
      .join(base.select(col("o_orderkey")), Seq("o_orderkey"), "left_semi")
    val merged = spark.read.parquet(s"$stateRoot/state_$ver")
      .unionByName(latest)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
    merged.write.mode("overwrite").parquet(s"$stateRoot/state_${ver + 1}")
  }

  /** s3: S3 through the streaming engine — dedup on event_id, then a
    * batch summary of the sink (oracle: DISTINCT over the table). */
  def s3StreamDedup(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    runToMemory(dedupedEvents(eventStream(spark, dir)), "append", "s3_stream_dedup")
      .agg(count(lit(1)).as("n_events"),
           countDistinct(col("user_id")).as("n_users"))

  // ---- S7: streaming ANN serving over the static IVF index ----

  /** One postings/probes build per (JVM, dir): the static side of the
    * serving join, persisted so the DuckDB oracle replays the exact
    * index this run served from. */
  private val s7Index =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Double]]]()

  /** S7: online similarity serving — query VECTORS arrive as a stream;
    * each probes its `nprobe` nearest cells of the STATIC corpus index
    * (the u10/p7d layout) through a stream-static equi-join on cell, and
    * a streaming aggregate emits per query its exact-cosine nearest
    * neighbor and candidate count. This is the serving half of the ANN
    * story: the batch side builds and persists the index; the stream
    * side never scans the corpus — each arriving query touches only its
    * probed cells' postings (at 100 TB: a pruned read of a bucketed
    * static table, with the centroid matrix a broadcast literal).
    *
    * The stream computes probe cells with the SAME centroid expressions
    * the batch probes table persists, so the oracle — which replays the
    * persisted probes ⋈ postings ⋈ vectors in DuckDB — also certifies
    * stream-side cell assignment agrees with the batch index. */
  def s7StreamAnnServe(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.sim.IvfAnn
    import graft.functions.{GraftFunctions, VectorOps}
    val root = graft.ml.ModelOracles.modelRoot(dir)
    val nlist = 16; val nprobe = 3
    val centroids = s7Index.computeIfAbsent(dir, _ => {
      val e = graft.Tables.embeddings(spark, dir)
      val cs = IvfAnn.fitCentroids(e, "embedding", nlist)
      e.select(col("vec_id"),
          VectorOps.toDoubleArray(col("embedding")).as("nvec"))
        .withColumn("cell", IvfAnn.cellOf(col("nvec"), cs))
        .select(col("vec_id"), col("cell"))
        .write.mode("overwrite").parquet(s"$root/s7_postings")
      e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"),
                VectorOps.toDoubleArray(col("embedding")).as("qvec"))
        .withColumn("cell", explode(IvfAnn.probeCellsCol(
          IvfAnn.distances(col("qvec"), cs), nlist, nprobe)))
        .select(col("query_id"), col("cell"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/s7_probes")
      cs
    })
    // static side: postings re-joined to their vectors (reading the
    // persisted assignment, not recomputing it — serving must use the
    // index as written)
    val corpus = spark.read.parquet(s"$root/s7_postings")
      .join(graft.Tables.embeddings(spark, dir)
              .select(col("vec_id"), VectorOps.toDoubleArray(col("embedding")).as("nvec")),
            Seq("vec_id"))
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("nvec"))
    val qStream = tableStream(spark, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"),
              VectorOps.toDoubleArray(col("embedding")).as("qvec"))
      .withColumn("cell", explode(IvfAnn.probeCellsCol(
        IvfAnn.distances(col("qvec"), centroids), nlist, nprobe)))
    val served = qStream.join(corpus, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", GraftFunctions.cosine_sim(col("qvec"), col("nvec")))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_candidates"),
           // lexicographic struct max = (highest cos, then lowest id)
           max(struct(col("cos").as("c"),
                      (-col("neighbor_id")).as("negid"))).as("__nn"))
    runToMemory(served, "complete", "s7_stream_ann_serve")
      .select(col("query_id"), col("n_candidates"),
              (-col("__nn.negid")).as("nn_id"),
              round(col("__nn.c"), 6).as("nn_cos"))
      .orderBy(col("query_id"))
  }

  // ---- S8: streaming incremental dedup over the static p35 index ----

  /** S8: incoming documents arrive as a STREAM and are deduped online
    * against the persisted p35 corpus index — the streaming half of the
    * continual-ingestion story (p35 is the batch half; s7's serve-over-
    * static-artifact pattern applied to dedup). Each arriving doc's
    * band keys probe the static band table (stream-static equi-join —
    * at 100 TB a pruned read of a band-key-bucketed table), candidates
    * verify exact Jaccard against the static shingle sets, and ONE
    * streaming aggregation folds the near-dup layer AND the exact-md5
    * layer per doc: an exact duplicate shares its full signature, so
    * its index twin is always among the band candidates — md5 equality
    * rides the same candidate rows, no second stream branch needed.
    * Docs with zero candidates (the keep case) can't appear in the
    * sink, so the final batch projection left-joins the incoming id
    * list to fill their decision rows. Output ≡ p35's batch decisions,
    * so the same DuckDB oracle gates both. */
  def s8StreamIncrDedup(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.dedup.{IncrementalDedup, MinHashDedup}
    import graft.functions.HashFunctions
    IncrementalDedup.ensureIndexed(spark, dir)
    val root = graft.ml.ModelOracles.modelRoot(dir)
    val idx = spark.read.parquet(s"$root/p35_index")
      .select(col("doc_id").as("rid"), col("sh").as("sh_r"), col("md5").as("md5_r"))
    val idxBands = spark.read.parquet(s"$root/p35_bands")
    val incStream = tableStream(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), md5(col("text")).as("md5"),
        HashFunctions.token_shingle_hashes(col("text"), IncrementalDedup.ShingleK).as("sh"))
    // band multiplicity is harmless: every aggregate below is min/max
    val decided = incStream
      .select(col("doc_id"), col("md5"), col("sh"),
        posexplode(MinHashDedup.bandKeys(col("sh"))))
      .select(col("doc_id"), col("md5"), col("sh"),
        col("pos").as("band_idx"), col("col").as("band_key"))
      .join(idxBands, Seq("band_idx", "band_key"))
      .join(idx, Seq("rid"))
      .withColumn("j", round(MinHashDedup.jaccardSorted(col("sh"), col("sh_r")), 6))
      .groupBy(col("doc_id"), col("md5"))
      .agg(max(when(col("md5_r") === col("md5"), lit(1)).otherwise(lit(0))).as("exn"),
           min(when(col("j") >= IncrementalDedup.Threshold, col("rid"))).as("near_dup_of"),
           max(when(col("j") >= IncrementalDedup.Threshold, col("j"))).as("best_jaccard"))
    val sink = runToMemory(decided, "complete", "s8_stream_incr_dedup")
    graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"))
      .join(sink, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (coalesce(col("exn"), lit(0)) === 1).as("exact_dup"),
        col("near_dup_of"), col("best_jaccard"),
        (coalesce(col("exn"), lit(0)) === 0 && col("near_dup_of").isNull).as("keep"))
      .orderBy(col("doc_id"))
  }

  // ---- S12: streaming maintenance of the persisted ANN index ----

  /** S12: arrivals flow THROUGH the streaming engine into the u18
    * upsert path — the continuous-ingestion closure of the ANN story
    * (u10 write-once layout → s7 read-only serving → u18 batch upsert →
    * THIS: a checkpointed file-source stream whose every micro-batch
    * routes its vectors with the persisted centroids and dynamically
    * overwrites only the touched cell partitions via foreachBatch, the
    * standard Structured-Streaming writer for sinks with their own
    * transactional semantics). The base index is rebuilt per invocation
    * (static overwrite) so the stream upsert is idempotent across
    * Verify/Bench runs; the read side and the in-query gates are
    * u18's, byte for byte, and the oracle replays the same candidate
    * aggregates + routing invariant from the s12 files — so a green
    * row certifies that STREAM-side maintenance leaves the index in
    * exactly the state batch maintenance would.
    *
    * Scale shape: each micro-batch's write touches only the cells its
    * arrivals route to (dynamic overwrite + per-cell compaction —
    * at 100 TB a batch of arrivals rewrites a few cell directories,
    * never the index); routing is a narrow map against the broadcast
    * centroid matrix. */
  def s12StreamAnnUpsert(spark: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    import graft.operators.AnnUpsert
    import graft.functions.VectorOps
    import org.apache.spark.sql.streaming.Trigger
    val root = graft.ml.ModelOracles.modelRoot(dir)
    val centroids = AnnUpsert.buildBase(spark, dir, "s12")
    val arrivals = tableStream(spark, dir, "embeddings")
      .filter(AnnUpsert.isInsert(col("vec_id")))
      .select(col("vec_id"), VectorOps.toDoubleArray(col("embedding")).as("v"),
              lit("upsert").as("src"))
    val ck = java.nio.file.Files.createTempDirectory("graft_s12_ck")
    ck.toFile.deleteOnExit()
    val t0 = System.nanoTime()
    val q = arrivals.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        AnnUpsert.upsertVectors(spark, s"$root/s12_postings", centroids, batch)
      }
      .option("checkpointLocation", ck.toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    StreamMeters.record("s12_stream_ann_upsert",
      (System.nanoTime() - t0) / 1e9, StreamMeters.batchSeconds(q))
    AnnUpsert.probeAndAggregate(spark, dir, "s12", centroids)
  }

  /** s9: streaming model scoring (online inference over the persisted
    * p34 quality classifier) — documents arrive as a file-source stream
    * and are scored per-row with `marginMicrosNarrow`: the entire
    * hashed-feature margin folds inside array higher-order functions, so
    * the query is STATELESS (append mode, no aggregation state, no
    * watermark) — the unbounded-throughput inference shape. The decision
    * record is identical to batch p34's, so the SAME DuckDB replay SQL
    * gates both, certifying that stream-side scoring agrees bit-exactly
    * with the batch margins computed from the persisted feature table. */
  def s9StreamQualityScore(spark: org.apache.spark.sql.SparkSession,
                           dir: String): DataFrame = {
    import graft.text.QualityClassifier
    QualityClassifier.ensureFitted(spark, dir)
    val (w, bias) = QualityClassifier.loadWeights(spark, dir)
    val scored = QualityClassifier.marginMicrosNarrow(
      tableStream(spark, dir, "documents"), w, bias)
    val sink = runToMemory(scored, "append", "s9_stream_score")
    sink.join(QualityClassifier.labelTable(spark, dir), Seq("doc_id"))
      .select(col("doc_id"), col("margin_micros"),
        (col("margin_micros") >= 0).as("pred"), col("y"),
        (col("doc_id") % 4 =!= 0).as("is_train"))
      .orderBy(col("doc_id"))
  }

  // ---- S2: gap-based sessionization via flatMapGroupsWithState ----

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionAcc(start: Long, end: Long, n: Int, sum: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Int, sum_value: Double)

  // session times are tracked in MICROSECONDS: java.sql.Timestamp.getTime
  // is ms-truncated, and sessions must reproduce event times exactly
  // (the s2 oracle hash-compares session bounds against the raw table).
  // floorDiv so pre-epoch timestamps don't wrap positive.
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  /** Emit a session after `gapMs` of user inactivity (event time).
    * Session BOUNDS keep microsecond precision, but the gap itself is
    * compared in floor-milliseconds — the same `epoch_ms` arithmetic the
    * batch twin and the SQL oracles use, so boundary events (gap within
    * 1ms of the threshold) land in the same session on every path. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, microsToTs(s.start),
              microsToTs(s.end), s.n, s.sum))
          } else {
            val sorted = it.toSeq.sortBy(e => micros(e.ts))
            var acc = state.getOption.orNull
            val out = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = micros(e.ts)
              acc match {
                case null => acc = SessionAcc(t, t, 1, e.value)
                case a if Math.floorDiv(t, 1000L) - Math.floorDiv(a.end, 1000L) <= gapMs =>
                  acc = SessionAcc(a.start, math.max(a.end, t), a.n + 1, a.sum + e.value)
                case a =>
                  out += Session(userId, microsToTs(a.start), microsToTs(a.end), a.n, a.sum)
                  acc = SessionAcc(t, t, 1, e.value)
              }
            }
            if (acc != null) {
              state.update(acc)
              // GroupState timeouts are in ms; floorDiv, not truncating
              // division, so pre-epoch session ends keep the same
              // epoch_ms semantics as the gap comparison above
              state.setTimeoutTimestamp(Math.floorDiv(acc.end, 1000L) + gapMs)
            }
            out.result().iterator
          }
      }
  }

  // ---- S11: streaming trending — a foreachBatch-maintained
  //      materialized AGGREGATE view + top-k serving query ----

  /** S11: streaming TRENDING detection — windowed per-item counts in
    * UPDATE mode merged into a persisted materialized view by a
    * `foreachBatch` sink, then served as per-window top-3 items (the
    * trending-dashboard shape: the stream maintains the view
    * incrementally; dashboards rank the view, they never re-scan the
    * event log).
    *
    * Update-mode emission means each batch carries the NEW total for
    * every (window, item) whose count changed, so a last-writer-wins
    * merge keyed on (window, item) leaves the view holding final
    * counts however the engine splits batches (counts are monotone and
    * every change is emitted — the merge, like s5's, is
    * order-insensitive across keys and final-writer-correct within
    * one). At scale the view is windows × items (bounded by item
    * cardinality and retention, not event volume), the merge is one
    * keyed anti-join + union per batch, and the watermark evicts
    * closed windows' aggregation state.
    *
    * The item key is extracted from the event's JSON props (the q30
    * path) — trending the `k` property, a 100-ary item space. */
  def s11StreamTrending(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.expressions.Window
    val counts = trendingCounts(eventStream(spark, dir))
    val stateRoot = java.nio.file.Files.createTempDirectory("graft_trend").toString
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("window_start",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("item",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_events",
            org.apache.spark.sql.types.LongType))))
      .write.mode("overwrite").parquet(s"$stateRoot/state_0")
    val t0s11 = System.nanoTime()
    val q = withStateParts(spark) {
      val q0 = counts.writeStream.outputMode("update")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // last-writer-wins: this batch's rows replace same-key view rows.
          // The version cursor is the _SUCCESS-gated directory listing (the
          // s5 rule) so a restarted query resumes from committed state and
          // skips torn writes — filesystem listing also gives the final
          // read below its cross-thread visibility (the r9 AtomicInteger
          // mirror is gone with it).
          val ver = latestStateVersion(stateRoot)
          val merged = spark.read.parquet(s"$stateRoot/state_$ver")
            .join(batch, Seq("window_start", "item"), "left_anti")
            .unionByName(batch)
          // next version, never in place (the s5 rule)
          merged.write.mode("overwrite").parquet(s"$stateRoot/state_${ver + 1}")
        }
        .trigger(Trigger.AvailableNow()).start()
      q0.awaitTermination()
      q0
    }
    StreamMeters.record("s11_stream_trending", (System.nanoTime() - t0s11) / 1e9,
      StreamMeters.batchSeconds(q))
    val fin = spark.read.parquet(s"$stateRoot/state_${latestStateVersion(stateRoot)}")
    val w = Window.partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("item"))
    val out = fin.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("window_start"), col("rank"), col("item"), col("n_events"))
      .orderBy(col("window_start"), col("rank"))
    graft.operators.ScaleOps.materializeThen(out)(
      graft.operators.ScaleOps.deleteRecursively(stateRoot))
  }

  /** The maintained aggregate: 1h tumbling windowed counts per JSON
    * item key — exposed so the spec can drive it through multi-batch
    * streams. */
  private[streaming] def trendingCounts(events: DataFrame): DataFrame =
    events
      .select(col("ts"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("item"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("item"),
        col("n_events"))

  /** DuckDB oracle for s11: the batch replay — epoch-aligned hourly
    * windows, JSON item extraction, per-window top-3. */
  val s11OracleSql: String =
    """SELECT window_start, rank, item, n_events FROM (
         SELECT window_start, item, n_events,
           CAST(row_number() OVER (PARTITION BY window_start
             ORDER BY n_events DESC, item) AS BIGINT) AS rank
         FROM (
           SELECT date_trunc('hour', ts) AS window_start,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
             count(*) AS n_events
           FROM events
           GROUP BY 1, 2) c) r
       WHERE rank <= 3
       ORDER BY window_start, rank"""

  // ---- S14: streaming KMV distinct sketch (mergeable state) ----

  /** s14: the q21c KMV/theta sketch maintained BY THE STREAM — the
    * mergeability the sketch was chosen for, exercised where it
    * matters: distinct-user counting over an unbounded event stream
    * with CONSTANT state (k = 256 longs, vs the corpus-sized key set
    * s3's exact dedup carries).
    *
    * Shape: each micro-batch partition pre-reduces to its local k
    * smallest hashes (a mapPartitions — so the single stateful group
    * receives ≤ k rows per partition per batch, never the raw stream),
    * and one flatMapGroupsWithState folds them into the global
    * bottom-k. Because KMV merge is exact (bottom-k of a union =
    * bottom-k of bottom-ks), the stream's final sketch EQUALS the
    * batch sketch over the same rows — gated in-query, and the same
    * oracle arithmetic hash-gates the estimate itself (q21c's
    * discipline over the events table). */
  def s14StreamKmv(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val k = graft.operators.KmvSketch.K
    val hashed = eventStream(spark, dir)
      .select(conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h")).as[Long]
    val localMins = hashed.mapPartitions { it =>
      val set = new java.util.TreeSet[java.lang.Long]()
      it.foreach { h => set.add(h); if (set.size > k) set.pollLast() }
      import scala.jdk.CollectionConverters._
      set.iterator().asScala.map(_.longValue())
    }
    val sketch = localMins.groupByKey(_ => 0)
      .flatMapGroupsWithState[Array[Long], (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[Long], state: GroupState[Array[Long]]) =>
          val set = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.foreach(set.add(_)))
          it.foreach { h => set.add(h); if (set.size > k) set.pollLast() }
          import scala.jdk.CollectionConverters._
          val arr = set.iterator().asScala.map(_.longValue()).toArray
          state.update(arr)
          // emit the batch's current (k_used, kth): monotone — k_used
          // grows, kth shrinks — so the final sketch is the extremal row
          Iterator((arr.length.toLong, arr.last))
      }.toDF("k_used", "kth_hash")
    val rows = runToMemory(sketch, "update", "s14_stream_kmv")
      .orderBy(col("k_used").desc, col("kth_hash").asc).limit(1)
      .collect()
    require(rows.nonEmpty, "s14: stream emitted no sketch")
    val (kUsed, kth) = (rows.head.getLong(0), rows.head.getLong(1))
    val est =
      if (kUsed < k) kUsed.toDouble
      else (kUsed - 1).toDouble * 4294967296.0 / kth.toDouble
    // gate: the streaming sketch must equal the BATCH sketch over the
    // same rows — KMV merge is exact, so any divergence is a bug
    val batch = graft.operators.KmvSketch
      .sketch(graft.Tables.events(spark, dir), "user_id").head()
    require(kUsed == batch.getAs[Long]("k_used") &&
            kth == batch.getAs[Long]("kth_hash"),
      s"s14: streaming sketch ($kUsed, $kth) != batch sketch " +
      s"(${batch.getAs[Long]("k_used")}, ${batch.getAs[Long]("kth_hash")})")
    Seq((kUsed, kth, math.floor(est * 1e6).toLong))
      .toDF("k_used", "kth_hash", "est_micro")
  }

  /** s14 oracle: q21c's KMV arithmetic over the events table. */
  val s14OracleSql: String =
    s"""WITH h AS (
         SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
         FROM events),
       km AS (SELECT h FROM h ORDER BY h ASC LIMIT ${graft.operators.KmvSketch.K}),
       agg AS (SELECT count(*) AS k_used, max(h) AS kth FROM km),
       est AS (
         SELECT k_used, kth,
           CASE WHEN k_used < ${graft.operators.KmvSketch.K} THEN CAST(k_used AS DOUBLE)
                ELSE (k_used - 1) * 4294967296.0 / kth END AS e
         FROM agg)
       SELECT CAST(k_used AS BIGINT) AS k_used, kth AS kth_hash,
         CAST(floor(e * 1e6) AS BIGINT) AS est_micro
       FROM est"""
}
