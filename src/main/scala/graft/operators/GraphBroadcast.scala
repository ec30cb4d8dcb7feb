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

  /** Default cutoff, derived from this JVM's heap rather than a bare
    * constant: budget 1/64 of max heap for one resident broadcast
    * (~2 copies may overlap across iterations while the old one
    * unpersists), floor 1M rows so tiny test JVMs still take the
    * broadcast path on realistic fixtures, cap 10M rows (~160 MB —
    * beyond that the per-iteration broadcast cost dominates the saved
    * shuffle even when memory allows it). On the 128 GiB bench JVM
    * this resolves to the cap; on a 4 GiB driver it backs off to ~4M.
    * Overridable per call (tests pin it to 0 to force the shuffle
    * branch) or process-wide via -Dgraft.graph.broadcastMaxNodes=. */
  val MaxBroadcastNodes: Long =
    sys.props.get("graft.graph.broadcastMaxNodes").map(_.toLong).getOrElse {
      val budget = Runtime.getRuntime.maxMemory() / 64
      math.min(10L * 1000 * 1000, math.max(1L * 1000 * 1000, budget / BytesPerRow))
    }
}
