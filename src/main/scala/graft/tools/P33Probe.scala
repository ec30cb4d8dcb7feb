package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r10 verdict #2 "done" evidence): p33b byte-span dedup must
  * be LINEAR in document length. Generates corpora of fixed doc count
  * and growing per-doc length (planted cross-doc duplicate spans so the
  * operator does real work), then times
  *   new  — the fused char_window_hash_seq + remove_char_positions path
  *   old  — the r9 formulation: xxhash64(substring(text, pos, k)) grams
  *          (O(len) char-offset scan per window → O(len²) per doc) and
  *          the per-character posexplode rebuild
  * Results land in BENCH_HISTORY.md round 10.
  */
object P33Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val k = graft.dedup.SpanDedup.DefaultK
    val nDocs = 200

    def corpus(lenChars: Int): DataFrame = {
      val shared = (0 until 120).map(i => s"shared$i").mkString(" ")
      val rows = (0 until nDocs).map { d =>
        val rnd = new scala.util.Random(d * 7919 + lenChars)
        val sb = new StringBuilder
        while (sb.length < lenChars) {
          sb.append("w").append(rnd.nextInt(100000)).append(' ')
          // even docs share a long verbatim span every ~1000 words —
          // ~11% of their bytes are duplicated spans (web-boilerplate
          // density; an earlier 1/40 draw made even docs ~75% spans and
          // the COVERAGE volume, not the gram stream, dominated)
          if (d % 2 == 0 && rnd.nextInt(1000) == 0) sb.append(shared).append(' ')
        }
        (d.toLong, sb.toString.trim.take(lenChars))
      }
      spark.createDataFrame(rows).toDF("doc_id", "text").repartition(16)
    }

    /** The r9 p33b formulation, kept here for the A/B. */
    def oldByteSpans(docs: DataFrame): DataFrame = {
      val grams = docs
        .select($"doc_id", $"text",
          explode(sequence(lit(1), greatest(length($"text") - (k - 1), lit(1)))).as("pos"))
        .select($"doc_id", $"pos",
          xxhash64(substring($"text", $"pos", lit(k))).as("g"))
        .persist()
      val dup = grams.groupBy($"g").agg(countDistinct($"doc_id").as("nd"))
        .filter($"nd" >= 2).select($"g")
      val covered = grams.join(dup, Seq("g"))
        .select($"doc_id", explode(sequence($"pos", $"pos" + lit(k - 1))).as("pos"))
        .distinct()
      val chars = docs
        .select($"doc_id", posexplode(split($"text", "")))
        .select($"doc_id", ($"pos" + 1).as("pos"), $"col".as("ch"))
      val kept = chars.join(covered, Seq("doc_id", "pos"), "left_anti")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_kept"),
             array_sort(collect_list(struct($"pos", $"ch"))).as("arr"))
        .select($"doc_id", $"n_kept",
                concat_ws("", expr("transform(arr, x -> x.ch)")).as("kept_text"))
      val nc = docs.select($"doc_id", length($"text").cast("long").as("n_chars"))
      nc.join(kept, Seq("doc_id"), "left")
        .select($"doc_id", $"n_chars",
          ($"n_chars" - coalesce($"n_kept", lit(0L))).as("n_dup_chars"),
          md5(coalesce($"kept_text", lit(""))).as("kept_md5"))
    }

    def time(tag: String)(df0: => DataFrame): Double = {
      val t0 = System.nanoTime()
      // fold EVERY output column into one checksum: a bare count() lets
      // Catalyst eliminate the unique-key left join (and with it the
      // whole gram subtree), timing an empty plan — measured 0.3s for a
      // stage that runs 389s when actually forced
      val df = df0
      val n = df.select(expr("bit_xor(" +
        s"xxhash64(concat_ws('|', ${df.columns.map(c => s"cast($c as string)").mkString(",")})))"))
        .head().getLong(0)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(f"$tag%-28s $dt%7.2fs  (checksum $n)")
      dt
    }

    val lens = sys.env.get("P33_LENS").map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(12800, 25600, 51200, 102400))
    val gramsOnly = args.contains("--grams")
    val withOld = !args.contains("--no-old")
    for (len <- lens) {
      val docs = corpus(len).persist()
      docs.count()
      if (gramsOnly) {
        // the isolated gram stage (hash aggregated so nothing else runs):
        // this is where the formulations differ
        time(f"new-grams len=$len%7d") {
          docs.select($"doc_id",
            posexplode(graft.functions.HashFunctions.char_window_hash_seq($"text", k)))
            .groupBy($"col").count()
        }
        if (withOld) time(f"old-grams len=$len%7d") {
          docs
            .select($"doc_id", $"text",
              explode(sequence(lit(1), greatest(length($"text") - (k - 1), lit(1)))).as("pos"))
            .select($"doc_id", $"pos",
              xxhash64(substring($"text", $"pos", lit(k))).as("g"))
            .groupBy($"g").count()
        }
      } else {
        time(f"new  len=$len%7d")(graft.dedup.SpanDedup.byteSpans(docs, k))
        if (withOld) time(f"old  len=$len%7d")(oldByteSpans(docs))
      }
      docs.unpersist(true)
    }
    spark.stop()
  }
}
