package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: run one named SparkEntry query and attribute wall time to
  * Spark jobs by call site — the §1 "where does the time go" loop for a
  * multi-job query (fits, iterative ladders, persist-and-replay builds
  * all submit many jobs; per-query seconds alone can't localize them).
  *
  * Usage: QueryProfile <sfDir> <queryName> [repeats]
  * Repeats > 1 separates memoized-artifact cost (first run) from
  * steady-state query cost (later runs).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 8).toString)
      .config("spark.sql.files.maxPartitionBytes", "32m")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHED_REPART", "true")) // match Bench/Verify
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "1500")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Attribute per STAGE: AQE runs each query stage as its own job on the
    // execution pool (the job-level call site is a CompletableFuture frame),
    // but StageInfo.details carries the full submission stack — the first
    // graft frame names the operator phase.
    val done = scala.collection.mutable.ArrayBuffer[(String, Double, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        val site = info.details.linesIterator
          .map(_.trim)
          .find(l => l.contains("graft.") && !l.contains("QueryProfile") &&
                     !l.contains("graft.tools"))
          .getOrElse(info.name)
        val wall = (for {a <- info.submissionTime; b <- info.completionTime}
          yield (b - a) / 1e3).getOrElse(0.0)
        done.synchronized { done += ((site, wall, info.numTasks)) }
      }
    })
    // Per-ACTION attribution: every count/collect/write/checkpoint fires
    // onSuccess with its duration — the reliable phase segmentation when
    // AQE hides job call sites.
    val actions = scala.collection.mutable.ArrayBuffer[(String, Double, String)]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        val cols = qe.analyzed.output.map(_.name).take(6).mkString(",")
        actions.synchronized { actions += ((funcName, durationNs / 1e9, cols)) }
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    val fn = graft.SparkEntry.queries(name)
    // same warmup the bench does so run 1 isn't JVM/codegen startup
    graft.Tables.all.foreach { t => graft.Tables.load(spark, dir, t).limit(64).count() }
    try { graft.SparkEntry.queries("m2_kernel_values")(spark, dir).count() }
    catch { case _: Throwable => () }
    for (r <- 1 to repeats) {
      done.synchronized(done.clear())
      actions.synchronized(actions.clear())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      println(f"\n=== run $r: $name total $dt%.2fs rows=$n ===")
      val snap = done.synchronized(done.toVector)
      val bySite = snap.groupBy(_._1).map { case (s, v) =>
        (s, v.map(_._2).sum, v.size, v.map(_._3).sum)
      }.toSeq.sortBy(-_._2)
      println(f"${"site (first graft frame)"}%-84s ${"sec"}%8s ${"stages"}%6s ${"tasks"}%6s")
      bySite.foreach { case (s, sec, nj, nt) =>
        println(f"${s.take(84)}%-84s $sec%8.2f $nj%6d $nt%6d")
      }
      println(f"[sum of stage wall] ${snap.map(_._2).sum}%.2fs over ${snap.size} stages")
      val acts = actions.synchronized(actions.toVector)
      println(f"\n-- actions (QueryExecutionListener), chronological --")
      acts.foreach { case (f2, sec, cols) =>
        if (sec >= 0.05) println(f"$f2%-18s $sec%7.2fs  [$cols]")
      }
      println(f"[sum of action wall] ${acts.map(_._2).sum}%.2fs over ${acts.size} actions")
    }
    spark.stop()
  }
}
