package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: plan-cost A/B of BPE merge application at growing merge
  * counts — the r10-verdict gate for the p39b/p39c/p50 fix.
  *
  * OLD shape: `merges.foldLeft(df.withColumn("sym", applyMerge(...)))`
  * — an M-deep Catalyst chain (M analysis passes, M-deep plan).
  * NEW shape: [[graft.text.BpeVocab.encodeWords]] — ONE typed
  * mapPartitions from a broadcast merge array; plan size O(1) in M.
  *
  * Both run on the same distinct-word table; padding merges beyond the
  * learned 8 never match (fresh symbols), so the DATA work is constant
  * and any growth isolates plan/analysis/codegen cost. Usage:
  *   runMain graft.tools.BpeMergeScaleProbe [sfDir] [maxOldM]
  */
object BpeMergeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val maxOldM = args.lift(1).map(_.toInt).getOrElse(512)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val words = graft.Tables.documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("word")).distinct()
      .persist()
    val nWords = words.count()
    System.err.println(s"[bpeM] $nWords distinct words from $dir")

    val learned = graft.text.BpeVocab.mergeTable(spark, dir).orderBy($"step")
      .select($"left", $"right").as[(String, String)].collect()

    def mergesAt(m: Int): Array[(String, String)] =
      learned ++ Array.tabulate(math.max(0, m - learned.length))(i => (s"x$i", s"y$i"))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    for (m <- Seq(8, 64, 512, 4096)) {
      val ms = mergesAt(m)
      val tNew = time {
        graft.text.BpeVocab.encodeWords(words, ms)
          .select(sum(size($"sym"))).head()
      }
      System.err.println(f"[bpeM] NEW typed  M=$m%-5d $tNew%8.2fs")
      if (m <= maxOldM) {
        try {
          val tOld = time {
            val enc0 = words.withColumn("sym",
              concat(filter(split($"word", ""), x => x =!= lit("")), array(lit("</w>"))))
            ms.foldLeft(enc0) { case (d, (a, b)) =>
              d.withColumn("sym", graft.text.BpeVocab.applyMerge(col("sym"), a, b))
            }.select(sum(size($"sym"))).head()
          }
          System.err.println(f"[bpeM] OLD fold   M=$m%-5d $tOld%8.2fs")
        } catch {
          // the expected production-M failure mode: the M-deep
          // expression chain dies inside analysis — that IS the result
          case e: Throwable =>
            val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .toSeq.last.getClass.getSimpleName
            System.err.println(f"[bpeM] OLD fold   M=$m%-5d FAILED ($root in analysis)")
        }
      }
    }
    spark.stop()
  }
}
