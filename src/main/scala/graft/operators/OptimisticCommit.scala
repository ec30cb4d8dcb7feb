package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** §2.4 U21 (u21): MULTI-WRITER OPTIMISTIC CONCURRENCY — the lakehouse
  * commit protocol U16 (single-writer write-audit-publish) leaves open:
  * two writers that both read snapshot v must not silently clobber
  * each other. The contract (Delta/Iceberg OCC, public semantics):
  *
  *   1. a writer STAGES its data files untracked, then claims version
  *      v+1 by an ATOMIC create-if-absent on the commit log — the CAS;
  *   2. a LOST CAS is not an error: the writer re-reads the commits
  *      that landed since its snapshot and checks CONFLICTS — if the
  *      interleaved commits touched disjoint partitions, it REBASES
  *      (claims the next version, data unchanged); if they overlap, it
  *      must abort (IllegalStateException here — a real system would
  *      re-read and re-derive);
  *   3. readers resolve a snapshot from the commit log alone: per
  *      partition, the highest committed version wins (partition-
  *      overwrite semantics); a claim without its DONE marker (a
  *      crashed writer) is skipped — versions may have gaps.
  *
  * Atomicity primitive: `Files.createFile` (O_CREAT|O_EXCL — atomic
  * claim on POSIX and object stores with if-none-match). Rename-based
  * schemes are NOT create-if-absent on POSIX (rename replaces), which
  * is exactly the mistake this object's claim path avoids.
  *
  * Scale shape: the commit log is O(commits) tiny files; staging and
  * the data move are pure metadata relative to data volume; conflict
  * detection reads only the interleaved commits' touched-partition
  * lists, never data. The spec drives two writers through a lost CAS
  * + rebase and through a genuine overlap abort; the u21 query runs
  * the deterministic disjoint-writer interleaving end-to-end and
  * hash-gates the resolved table against the oracle's arithmetic.
  */
object OptimisticCommit {

  private def commitsDir(root: String) = s"$root/_commits"

  /** Highest version with a DONE marker (0 = empty table). */
  def currentVersion(root: String): Int = {
    val d = Paths.get(commitsDir(root))
    if (!Files.isDirectory(d)) 0
    else {
      val it = Files.list(d)
      try {
        it.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
          .asScala
          .map(_.getFileName.toString)
          .collect { case s if s.startsWith("v") && s.endsWith(".done") =>
            s.stripPrefix("v").stripSuffix(".done").toInt }
          .foldLeft(0)(math.max)
      } finally it.close()
    }
  }
  private implicit class RichIt[A](val it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  /** Touched partitions recorded by a committed version. */
  def touchedOf(root: String, version: Int): Set[String] = {
    val p = Paths.get(commitsDir(root), s"v$version.meta")
    if (!Files.exists(p)) Set.empty
    else new String(Files.readAllBytes(p), "UTF-8").split("\n").filter(_.nonEmpty).toSet
  }

  /** Atomic CAS claim of `version`; true iff this writer won it. */
  private[operators] def tryClaim(root: String, version: Int): Boolean = {
    Files.createDirectories(Paths.get(commitsDir(root)))
    try { Files.createFile(Paths.get(commitsDir(root), s"v$version.claim")); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  /** Commit `df` (hive-partitioned by `partCol`) against snapshot
    * `readVersion` with OCC. Returns the committed version. Throws
    * IllegalStateException on a partition-overlap conflict. */
  def commit(df: DataFrame, root: String, partCol: String,
             readVersion: Int, maxRetries: Int = 10): Int = {
    val touched = df.select(col(partCol)).distinct()
      .collect().map(_.get(0).toString).toSet
    val staged = s"$root/_staged/${java.util.UUID.randomUUID()}"
    df.write.partitionBy(partCol).mode("overwrite").parquet(staged)
    var attempt = readVersion + 1
    while (attempt <= readVersion + math.max(1, maxRetries)) {
      if (tryClaim(root, attempt)) {
        // we own this version: conflict-check the commits that landed
        // between our snapshot and our claim
        val interleaved = ((readVersion + 1) until attempt)
          .flatMap(v => touchedOf(root, v)).toSet
        val overlap = interleaved.intersect(touched)
        if (overlap.nonEmpty) {
          // leave the claim (the version number is burned — readers
          // skip it without a done marker) and surface the conflict
          ScaleOps.deleteRecursively(staged)
          throw new IllegalStateException(
            s"u21 conflict: partitions ${overlap.toSeq.sorted.mkString(",")} " +
            s"were modified by a concurrent commit since v$readVersion")
        }
        Files.write(Paths.get(commitsDir(root), s"v$attempt.meta"),
          touched.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
        Files.createDirectories(Paths.get(s"$root/data"))
        Files.move(Paths.get(staged), Paths.get(s"$root/data/v$attempt"),
          StandardCopyOption.ATOMIC_MOVE)
        Files.createFile(Paths.get(commitsDir(root), s"v$attempt.done"))
        return attempt
      }
      attempt += 1 // lost the CAS: rebase onto the next version
    }
    ScaleOps.deleteRecursively(staged)
    throw new IllegalStateException(s"u21: gave up after $maxRetries rebase attempts")
  }

  /** Snapshot read: per partition the highest committed version wins. */
  def read(spark: SparkSession, root: String, partCol: String): DataFrame = {
    val cur = currentVersion(root)
    val byPart = scala.collection.mutable.Map[String, Int]()
    (1 to cur).foreach { v =>
      if (Files.exists(Paths.get(commitsDir(root), s"v$v.done")))
        touchedOf(root, v).foreach(p => byPart(p) = v)
    }
    if (byPart.isEmpty) spark.emptyDataFrame
    else byPart.groupBy(_._2).map { case (v, parts) =>
      spark.read.option("basePath", s"$root/data/v$v")
        .parquet(parts.keys.toSeq.sorted.map(p => s"$root/data/v$v/$partCol=$p"): _*)
    }.reduce(_ unionByName _)
  }

  private def bucket(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 8

  /** u21: base load (all 8 md5 buckets) at v1, then two writers that
    * both read v1 — A rewrites buckets 0,1 (+100), B rewrites buckets
    * 2,3 (+200). A claims v2; B loses the CAS, verifies disjointness,
    * rebases to v3. Output: per-bucket resolved state + the version
    * that owns each bucket — the protocol's outcome, hash-gated. */
  def u21OccQuery(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft_occ").toString
    val base = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      .withColumn("bkt", bucket(col("k")).cast("string"))
    val v1 = commit(base, root, "bkt", 0)
    require(v1 == 1, s"base commit got v$v1")
    // both writers snapshot v1, then land in claim order A, B
    val a = base.filter(col("bkt").isin("0", "1"))
      .withColumn("price", col("price") + 100.0)
    val b = base.filter(col("bkt").isin("2", "3"))
      .withColumn("price", col("price") + 200.0)
    val va = commit(a, root, "bkt", readVersion = 1)
    val vb = commit(b, root, "bkt", readVersion = 1) // lost CAS → rebase
    require(va == 2 && vb == 3, s"protocol order broke: A=v$va B=v$vb")
    // hive partition inference types bkt as INT; the table contract
    // (and the oracle) carry it as STRING
    val out = read(spark, root, "bkt")
      .groupBy(col("bkt").cast("string").as("bkt"))
      .agg(count(lit(1)).as("n_rows"), round(sum(col("price")), 2).as("sum_price"))
      .orderBy(col("bkt"))
    ScaleOps.materializeThen(out) { ScaleOps.deleteRecursively(root) }
  }

  /** DuckDB replay: the resolved table is pure arithmetic — buckets
    * 0,1 carry +100, buckets 2,3 carry +200, the rest the base. */
  val oracleSql: String =
    """WITH b AS (
         SELECT o_orderkey AS k, o_totalprice AS price,
           CAST(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 8
                AS VARCHAR) AS bkt
         FROM orders),
       resolved AS (
         SELECT bkt,
           CASE WHEN bkt IN ('0', '1') THEN price + 100.0
                WHEN bkt IN ('2', '3') THEN price + 200.0
                ELSE price END AS price
         FROM b)
       SELECT bkt, count(*) AS n_rows, round(sum(price), 2) AS sum_price
       FROM resolved GROUP BY bkt ORDER BY bkt"""
}
