package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Fine-grained INITIAL shuffle partitioning, AQE coalesces small
      // stages back down: with a static 32, a shuffle whose rows are fat
      // (dedup verification joins carry ~1KB shingle arrays per pair)
      // concentrates gigabytes per sort buffer — measured GC-storm →
      // heartbeat-timeout → dead context on a 500k-doc corpus. 8×cpus
      // initial granularity caps per-partition bytes at scale and costs
      // nothing small (AQE merges sub-64MB partitions immediately).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      // finer scan grain than the 128m default: compressed columnar
      // bytes under-represent decode work, and a ~100MB single-file
      // table otherwise scans 1-wide on a 32-core box
      .config("spark.sql.files.maxPartitionBytes", "32m")
      // AQE's 64m coalesce target is tuned for byte-proportional work;
      // pair-expansion stages (dedup banding) multiply row counts after
      // the shuffle, so a finer target keeps their parallelism
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      // SPARK_GRAFT_MIN_COALESCED: optional AQE coalescing floor
      // (coalescePartitions.minPartitionNum), default UNSET. A/B'd in
      // r15 for the driver's anti-scaling cluster: floor=cpus at 32
      // cores was a wash on the cluster total (127.5 vs 129.1 s) and
      // systematically HURT the iterative flag-winners (p59 +1.3 s,
      // p39 +1.0 s, p7c +0.9 s — their tiny per-iteration cached frames
      // pay 32-task stages), while p33c stayed inside its noise band.
      // Kept as a knob for slow-box diagnosis, not as a default.
      // dev aid: SPARK_GRAFT_UI=true exposes the web UI / REST API for
      // plan-level debugging of scaled runs
      .config("spark.ui.enabled", sys.env.getOrElse("SPARK_GRAFT_UI", "false"))
      // let AQE coalesce the plans that MATERIALIZE persisted frames:
      // without this (default false) a persist() under the 8×cpus
      // initial shuffle grain is pinned at the un-coalesced width — the
      // iterative operators (pagerank/ppr/sssp, IPM feeds, dedup
      // clusters) were scheduling 256-task stages over kilobyte
      // partitions every iteration (measured: q52 ran 3120 tasks for a
      // 16k-row graph). Cached-plan output partitioning is not part of
      // any query's semantics; at scale the same flag lets cached
      // frames land at the advisory partition size instead of the raw
      // shuffle width.
      // Env-overridable (SPARK_GRAFT_CACHED_REPART=false) for per-query
      // A/B of the r14 flag at both core counts — the r14 verdict's
      // anti-scaling cluster investigation.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_REPART", "true"))
      // see Verify.scala: the codegen class cache (static conf, default
      // 100) must hold the whole query pack or evicted stages recompile
      // per task through janino — a 30-90x tax on later queries.
      // Env-overridable for A/B-ing the late-suite contamination band.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "1500"))
    val minCoalesced = sys.env.getOrElse("SPARK_GRAFT_MIN_COALESCED", "0")
    val spark = (if (minCoalesced == "0") builder
      else builder.config(
        "spark.sql.adaptive.coalescePartitions.minPartitionNum", minCoalesced))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Data-contract gate FIRST, and loudly: a changed on-disk encoding
    // must kill the run with one clear message, not let 25 queries fail
    // individually while the summary still reports a timing (the r05
    // regression). Emit a parseable error line before dying.
    try Tables.contractCheck(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(e.getMessage)
      println("""{"metric":"total","value":-1,"unit":"sec","contract_error":""" +
        "\"" + String.valueOf(e.getMessage).replaceAll("[\"\\n]", " ").take(500) + "\"}")
      spark.stop(); sys.exit(2)
    }
    // warmup: touch each table + force codegen/JIT of the common
    // expression paths once, so the first timed query doesn't absorb
    // JVM startup (standard bench hygiene; adds ~5s wall-clock, removes
    // ~10s of warmup noise from the first query's figure)
    Tables.all.foreach { t => Tables.load(spark, sfDir, t).limit(64).count() }
    try { SparkEntry.queries("m2_kernel_values")(spark, sfDir).count() }
    catch { case _: Throwable => () }
    // warm the ML fit path too: breeze's eigendecomposition, MLlib's
    // LinearSVC and the Nystrom codegen all JIT on first use, and the
    // alphabetically-first ML query would otherwise absorb ~5s of
    // one-time cost that has nothing to do with that query
    try {
      import org.apache.spark.sql.functions._
      val tiny = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 48)
        .withColumn("y", when(col("label") % 2 === 0, 1.0).otherwise(-1.0))
      graft.ml.KernelSvmTrainer.fit(tiny, "vec_id", "embedding", "y",
        graft.ml.KernelSvmParams(kernel = graft.ml.Kernel.Rbf(0.05),
          numLandmarks = 8, regParam = 1e-3, maxIter = 2, tol = 1e-3))
    } catch { case _: Throwable => () }
    spark.catalog.clearCache(); System.gc()
    // dev aid: SPARK_GRAFT_BENCH_ONLY="p14_dedup_clusters,p15_tfidf_topterms"
    // times just those queries (driver leaves it unset → full suite)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Contention guard (the r8 record was poisoned by one contended
    // window: p14 timed 204s on code that measures 4.8s quiet): when a
    // query exceeds 5× its committed expected value — BENCH_EXPECTED.json,
    // regenerated from each round's accepted quiet run — it is re-run
    // once and BOTH numbers are recorded; the official per-query figure
    // is the min (the rerun is warm but artifact-free, so it can only
    // remove noise, never hide a real regression that reproduces twice).
    val expected: Map[String, Double] = {
      val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXPECTED", "BENCH_EXPECTED.json")
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        """"([^"]+)"\s*:\s*([0-9.]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    }
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    // rerun figure is -1.0 when the rerun itself failed or returned a
    // DIFFERENT row count (then the first run's figure stands — a
    // fast-failing rerun must not masquerade as the official time)
    val reruns = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    def clearCaches(): Unit = {
      // queries are independent: drop caches leaked by iterative ops so
      // later queries aren't taxed by earlier ones' memory footprint
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    // Force FULL materialization of every output column: a bare count()
    // lets Catalyst prune unused columns and even eliminate whole
    // subtrees behind them (a left join against a grouped — hence
    // key-distinct — side preserves cardinality, so count() drops the
    // join). Measured: m6's entire kernel-sum scoring stage was being
    // optimized away, so its figure was fit-only. toRdd.count() consumes
    // the executed plan's UnsafeRows — every column computed, no
    // per-row object conversion tax.
    def forcedCount(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try { forcedCount(fn(spark, sfDir)) } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        -1L
      }
      var dt = (System.nanoTime() - t0) / 1e9
      clearCaches()
      val exp = expected.get(name)
      // streaming queries carry a large fixed engine cost, so ambient
      // contention inflates them 2–2.5× without ever tripping a 5×
      // guard (r9 verdict: the committed s-band ran 1.9–2.5× expected,
      // unattributable from the artifact) — trigger their rerun earlier
      val trigger = if (name.matches("s\\d+_.*")) 2.5 else 5.0
      if (n >= 0 && exp.exists(e => dt > math.max(trigger * e, 3.0))) {
        val t1 = System.nanoTime()
        // the rerun only counts if it SUCCEEDS with the same row count:
        // a rerun that fails fast (or returns different rows) must not
        // record its time-to-failure as the official figure (r9 ADVICE)
        val n2 = try { forcedCount(fn(spark, sfDir)) } catch { case _: Throwable => -1L }
        val dt2 = (System.nanoTime() - t1) / 1e9
        if (n2 == n) {
          System.err.println(f"[bench] $name%-24s rerun: first=$dt%.2fs second=$dt2%.2fs (expected ~${exp.get}%.2fs)")
          reruns += name -> (dt, dt2)
          dt = math.min(dt, dt2)
        } else {
          System.err.println(f"[bench] $name%-24s rerun FAILED (n=$n vs n2=$n2); first run's $dt%.2fs stands")
          reruns += name -> (dt, -1.0)
        }
        clearCaches()
      }
      System.err.println(f"[bench] $name%-24s $dt%8.2fs" +
        (if (n < 0) "  FAILED" else ""))
      name -> dt
    }
    val total = results.map(_._2).sum
    val artifacts = graft.ProcessArtifacts.buildSeconds
    // The summary line must stay parseable from a bounded (2000-char)
    // tail of stdout, so values are rounded and the line is re-emitted
    // at coarser precision if the query set ever grows past the window.
    // Full per-query precision goes to stderr above and BENCH_HISTORY.md.
    // Locale.ROOT: JSON needs dot decimals regardless of the JVM locale
    def fmt(dp: Int, v: Double): String =
      String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    def line(dp: Int, extras: Boolean = false): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(dp, v) }
        .mkString("{", ",", "}")
      val sfName = new java.io.File(sfDir).getName
      val failedJson =
        if (failed.isEmpty) ""
        else failed.map("\"" + _ + "\"").mkString(""","failed":[""", ",", "]")
      // artifact-build seconds + contention reruns ride only in the
      // canonical (file/sentinel) JSON, not the bounded tail line
      val extraJson = if (!extras) "" else {
        val art =
          if (artifacts.isEmpty) ""
          else artifacts.toSeq.sortBy(_._1)
            .map { case (k, v) => "\"" + k + "\":" + fmt(2, v) }
            .mkString(""","artifact_build_sec":{""", ",", "}")
        val rr =
          if (reruns.isEmpty) ""
          else reruns.map { case (k, (a, b)) =>
            "\"" + k + "\":{\"first\":" + fmt(2, a) + ",\"rerun\":" + fmt(2, b) + "}"
          }.mkString(""","contention_reruns":{""", ",", "}")
        // per-streaming-query engine meters: wall = start→termination,
        // batch = engine-accounted triggerExecution. wall−batch is the
        // fixed startup/teardown band — uniform inflation there is
        // ambient contention, batch inflation is a plan regression.
        val sm = graft.streaming.StreamMeters.snapshot
        val smJson =
          if (sm.isEmpty) ""
          else sm.toSeq.sortBy(_._1).map { case (k, (w, b)) =>
            "\"" + k + "\":{\"wall\":" + fmt(2, w) + ",\"batch\":" + fmt(2, b) + "}"
          }.mkString(""","stream_engine_sec":{""", ",", "}")
        art + rr + smJson
      }
      s"""{"metric":"total","value":${fmt(2, total)},"unit":"sec","queries":$qs$failedJson$extraJson,"sf":"$sfName"}"""
    }
    // If even dp=0 overflows the tail window, emit the SLOWEST queries
    // that fit (the informative ones) and declare BENCH_SUMMARY.json —
    // written above with ALL per-query rows at full precision — as the
    // canonical per-query record (160 names × ~20 chars can never fit a
    // 1900-char tail; a pointer beats silent truncation).
    def truncatedLine(): String = {
      val sfName = new java.io.File(sfDir).getName
      val suffix = s"""},"sf":"$sfName"}"""
      val prefix =
        s"""{"metric":"total","value":${fmt(2, total)},"unit":"sec","n_queries":${results.length},"queries_truncated":true,"canonical":"BENCH_SUMMARY.json","queries":{"""
      val budget = 1900 - prefix.length - suffix.length
      val entries = results.sortBy(-_._2)
        .map { case (k, v) => "\"" + k + "\":" + fmt(1, v) }
      val sb = new StringBuilder
      var used = 0
      entries.foreach { e =>
        val add = e.length + (if (used > 0) 1 else 0)
        if (sb.length + add <= budget) { if (used > 0) sb.append(','); sb.append(e); used += 1 }
      }
      prefix + sb.toString + suffix
    }
    // Machine-parseable summary, three redundant ways (the tail-window
    // rescue alone proved fragile — BENCH_r03/r04 both parsed null):
    // 1. full-precision JSON written to a file (SPARK_GRAFT_BENCH_OUT,
    //    default ./BENCH_SUMMARY.json);
    // 2. the same JSON on stdout prefixed with a grep-able sentinel;
    // 3. the legacy bounded line as the FINAL stdout line for any parser
    //    that reads a 2000-char tail.
    val full = line(2, extras = true)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SUMMARY.json")
    try {
      val w = new java.io.PrintWriter(new java.io.File(outPath), "UTF-8")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }
    println("GRAFT_BENCH_JSON " + full)
    // stop the session BEFORE the final line so no shutdown logging can
    // land after it — the bounded summary must be the LAST stdout line
    spark.stop()
    val out = Seq(2, 1, 0).map(d => line(d)).find(_.length <= 1900).getOrElse(truncatedLine())
    println(out)
    System.out.flush()
  }
}
