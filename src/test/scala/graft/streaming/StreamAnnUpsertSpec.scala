package graft.streaming

import graft.SparkSpec

class StreamAnnUpsertSpec extends SparkSpec {

  test("s12: stream-side index maintenance leaves exactly the state batch maintenance would") {
    val dir = "/root/testdata/sf0.001"
    // same seeded fit on the same base split → identical centroids →
    // the two paths must agree record for record, checksums included
    val viaStream = EventStreams.s12StreamAnnUpsert(spark, dir)
      .collect().map(_.toSeq).toSeq
    val viaBatch = graft.operators.AnnUpsert.u18AnnUpsertQuery(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(viaStream == viaBatch,
      s"stream upsert diverged from batch upsert:\n$viaStream\nvs\n$viaBatch")
    assert(viaStream.nonEmpty)
  }
}
