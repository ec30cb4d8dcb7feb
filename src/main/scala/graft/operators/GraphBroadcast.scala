package graft.operators

/** Shared broadcast cutoff for the iterative graph operators (q43
  * PageRank, q44 reachability).
  *
  * Both operators iterate with a VERTEX-sized table (message /
  * frontier) against an edge list that stays columnar on disk; while
  * the vertex table broadcasts, each iteration is one edge scan + one
  * map-side join + one keyed aggregation, with zero edge-sized
  * shuffles. The cutoff bounds that broadcast: each row is ~16 B on
  * the wire (long key + long/double value), and a torrent broadcast
  * materializes the table once on the driver plus once per executor,
  * so the safe vertex count scales with the smallest JVM heap in the
  * cluster. Past the cutoff the operators fall back to shuffling the
  * vertex-sized table against a co-partitioned edge layout — the shape
  * that holds for billion-node graphs.
  */
object GraphBroadcast {

  private val BytesPerRow = 16L

  /** Default cutoff, derived from the smallest JVM heap the broadcast
    * must fit — the MIN of this (driver) JVM's max heap and the
    * configured executor heap when one is set (`spark.executor.memory`;
    * in local mode there is no separate executor JVM and the driver
    * heap is the only budget). Budget 1/64 of that heap for one
    * resident broadcast (~2 copies may overlap across iterations while
    * the old one unpersists), floor 1M rows so tiny test JVMs still
    * take the broadcast path on realistic fixtures, cap 10M rows
    * (~160 MB — beyond that the per-iteration broadcast cost dominates
    * the saved shuffle even when memory allows it). On the 128 GiB
    * bench JVM this resolves to the cap; on a 4 GiB driver it backs
    * off to ~4M. Overridable per call (tests pin it to 0 to force the
    * shuffle branch) or process-wide via
    * -Dgraft.graph.broadcastMaxNodes= (malformed values fail with a
    * clear message, not an ExceptionInInitializerError). */
  def MaxBroadcastNodes: Long =
    sys.props.get("graft.graph.broadcastMaxNodes").map { s =>
      try s.trim.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"-Dgraft.graph.broadcastMaxNodes must be a long row count, got '$s'")
      }
    }.getOrElse {
      val driverHeap = Runtime.getRuntime.maxMemory()
      // active session's executor heap, when configured and parseable —
      // the broadcast lands on every executor, so the SMALLEST budget
      // governs; absent a session or the conf, the driver heap stands in
      val execHeap: Long =
        try {
          org.apache.spark.sql.SparkSession.getActiveSession
            .flatMap(s => s.conf.getOption("spark.executor.memory"))
            .map(parseMemoryBytes).getOrElse(Long.MaxValue)
        } catch { case _: Throwable => Long.MaxValue }
      val budget = math.min(driverHeap, execHeap) / 64
      math.min(10L * 1000 * 1000, math.max(1L * 1000 * 1000, budget / BytesPerRow))
    }

  /** "4g"/"512m"-style JVM memory string → bytes (defensive: unparseable
    * → Long.MaxValue so the driver-heap term governs alone). */
  private[operators] def parseMemoryBytes(s: String): Long =
    try {
      val t = s.trim.toLowerCase
      val (num, mult) = t.last match {
        case 'k' => (t.dropRight(1), 1L << 10)
        case 'm' => (t.dropRight(1), 1L << 20)
        case 'g' => (t.dropRight(1), 1L << 30)
        case 't' => (t.dropRight(1), 1L << 40)
        case _   => (t, 1L)
      }
      (num.toDouble * mult).toLong
    } catch { case _: Throwable => Long.MaxValue }
}
