package graft

import java.nio.file.Files

import graft.streaming.StreamingIngest

/** End-to-end streaming ingest over a real watched directory: files arrive
  * in two waves; the persisted table converges to the same state the batch
  * job would produce.
  */
class StreamingIngestSpec extends SparkSpec {

  test("directory stream → foreachBatch merge → persisted fast table") {
    val in = Files.createTempDirectory("graft_stream_in").toString
    val table = Files.createTempDirectory("graft_stream_tbl").toString + "/fast"
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    Files.writeString(java.nio.file.Paths.get(s"$in/a.nt"),
      "<http://id.worldcat.org/fast/1> <http://www.w3.org/2004/02/skos/core#prefLabel> \"First Doc\" .\n" +
      "<http://id.worldcat.org/fast/2> <http://www.w3.org/2004/02/skos/core#altLabel> \"Alt Two\" .\n")
    val q1 = StreamingIngest.start(spark, in, table, "Topical", ckpt)
    q1.awaitTermination()

    val afterWave1 = spark.read.parquet(table).collect()
      .map(r => r.getAs[Int]("_id") -> r.getAs[String]("prefLabel")).toMap
    assert(afterWave1 === Map(1 -> "First Doc", 2 -> null))

    // second wave: enriches doc 2 and re-delivers doc 1 (idempotent merge)
    Files.writeString(java.nio.file.Paths.get(s"$in/b.nt"),
      "<http://id.worldcat.org/fast/2> <http://www.w3.org/2004/02/skos/core#prefLabel> \"Second Doc\" .\n" +
      "<http://id.worldcat.org/fast/1> <http://www.w3.org/2004/02/skos/core#prefLabel> \"First Doc\" .\n")
    val q2 = StreamingIngest.start(spark, in, table, "Topical", ckpt)
    q2.awaitTermination()

    val docs = spark.read.parquet(table).collect()
      .map(r => r.getAs[Int]("_id") ->
        (r.getAs[String]("prefLabel"), r.getAs[Seq[String]]("altLabel"))).toMap
    assert(docs(1) === (("First Doc", Seq())))
    assert(docs(2) === (("Second Doc", Seq("Alt Two"))))
  }
}
