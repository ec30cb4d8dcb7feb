package graft.streaming

import graft.SparkSpec

class StreamKmvSpec extends SparkSpec {

  test("s14: the streaming KMV sketch equals the batch sketch (merge exactness) and the estimate is sane") {
    // the query's own require compares stream vs batch bit-for-bit —
    // a passing run IS the mergeability proof; here we additionally pin
    // the emitted estimate against the batch operator's
    val out = EventStreams.s14StreamKmv(spark, "/root/testdata/sf0.001").head()
    val batch = graft.operators.KmvSketch
      .sketch(graft.Tables.events(spark, "/root/testdata/sf0.001"), "user_id").head()
    assert(out.getAs[Long]("k_used") == batch.getAs[Long]("k_used"))
    assert(out.getAs[Long]("kth_hash") == batch.getAs[Long]("kth_hash"))
    assert(out.getAs[Long]("est_micro") == batch.getAs[Long]("est_micro"))
  }

  test("s14: state is sketch-sized — the stateful group never holds more than k hashes") {
    // structural property, checked through the public result: k_used is
    // capped at K regardless of stream cardinality
    val out = EventStreams.s14StreamKmv(spark, "/root/testdata/sf0.01").head()
    assert(out.getAs[Long]("k_used") <= graft.operators.KmvSketch.K)
  }
}
