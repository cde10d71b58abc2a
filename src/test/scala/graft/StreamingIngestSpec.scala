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

  // Regression for the order-dependence hazard: an early winner whose
  // STORED arrays grew through unions must not beat a later contributor
  // whose ORIGINAL doc is richer — type selection compares originals, like
  // the batch MergeFastDocs Aggregator (best-contributor bookkeeping is
  // persisted in the table, not recomputed from merged arrays).
  test("late richer contributor wins type regardless of arrival order") {
    import spark.implicits._
    import graft.model.FastDoc
    val table = java.nio.file.Files.createTempDirectory("graft_merge_tbl").toString + "/fast"
    // rich(A)=4+7+10=21, rich(C)=5+10=15; stored merged arrays after batch 2
    // would total 4+7+20=31 — rich(B)=12+10=22 beats both ORIGINALS but not
    // the inflated merged doc
    val a = FastDoc(1, 1, "Topical", "AAAA", Seq("aaaaaaaaaa"), Nil, Nil, Nil)
    val c = FastDoc(1, 1, "Event", null, Seq("bbbbbbbbbb"), Nil, Nil, Nil)
    val b = FastDoc(1, 1, "Geographic", "CCCCCCCCCCCC", Nil, Nil, Nil, Nil)
    Seq(Seq(a), Seq(c), Seq(b)).foreach { batch =>
      StreamingIngest.mergeBatch(spark, spark.createDataset(batch).toDF(), table)
    }
    val row = spark.read.parquet(table).collect().head
    assert(row.getAs[String]("type") === "Geographic")
    assert(row.getAs[String]("prefLabel") === "CCCCCCCCCCCC")
    assert(row.getAs[Seq[String]]("altLabel").sorted === Seq("aaaaaaaaaa", "bbbbbbbbbb"))
    // converges to exactly what the batch Aggregator produces (buffer
    // chain, not merge2-through-finish — finish drops the bookkeeping)
    import graft.ingest.MergeFastDocs.{finishBuf, mergeBuf, toBuf}
    val batchDoc = finishBuf(mergeBuf(mergeBuf(toBuf(a), toBuf(c)), toBuf(b)))
    assert(row.getAs[String]("type") === batchDoc.`type`)
    assert(row.getAs[String]("prefLabel") === batchDoc.prefLabel)
  }

  // The full property the _bestRich bookkeeping claims: delivering the SAME
  // set of docs in different cross-batch groupings and orders converges to
  // an identical stored table — every column, bookkeeping included.
  test("cross-batch arrival order does not change the stored table") {
    import spark.implicits._
    import graft.model.FastDoc
    val docs = Seq(
      FastDoc(1, 1, "Topical", "Alpha", Seq("a1", "a2"), Seq("lc1"), Nil, Seq("alpha")),
      FastDoc(1, 1, "Event", null, Seq("a3"), Nil, Seq("v1"), Nil),
      FastDoc(1, 1, "Geographic", "A much richer label", Nil, Nil, Nil, Nil),
      FastDoc(2, 2, "Topical", "Beta", Nil, Nil, Nil, Nil),
      FastDoc(2, 2, "Topical", null, Seq("b1"), Nil, Nil, Nil),
      FastDoc(3, 3, "Event", null, Seq("c"), Nil, Nil, Nil))

    def ingest(batches: Seq[Seq[FastDoc]]): Seq[String] = {
      val table = Files.createTempDirectory("graft_order_tbl").toString + "/fast"
      batches.foreach(b =>
        StreamingIngest.mergeBatch(spark, spark.createDataset(b).toDF(), table))
      spark.read.parquet(table).collect().map(_.toString).sorted.toSeq
    }

    val o1 = ingest(Seq(Seq(docs(0), docs(3)), Seq(docs(1), docs(4), docs(5)), Seq(docs(2))))
    val o2 = ingest(Seq(Seq(docs(2), docs(5)), Seq(docs(4), docs(0)), Seq(docs(3), docs(1))))
    val o3 = ingest(Seq(docs.reverse)) // single batch, reversed delivery
    assert(o1 === o2, "three-batch orderings diverged")
    assert(o1 === o3, "batched vs single-shot ingest diverged")
  }

  // The scale property of the bucketed layout: a micro-batch must rewrite
  // ONLY the partitions its ids hash into — every other partition's files
  // stay byte-identical (same paths, same bytes), proving per-batch cost
  // is O(batch + touched partitions), not O(table).
  test("micro-batch merge leaves untouched partitions byte-identical") {
    import spark.implicits._
    import graft.model.FastDoc
    val table = Files.createTempDirectory("graft_prune_tbl").toString + "/fast"

    def md5s(root: String): Map[String, String] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val base = java.nio.file.Paths.get(root)
      val stream = Files.walk(base)
      try {
        val out = scala.collection.mutable.Map.empty[String, String]
        stream.forEach { p =>
          val name = p.getFileName.toString
          if (Files.isRegularFile(p) && !name.startsWith(".") && !name.startsWith("_"))
            out(base.relativize(p).toString) =
              md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
        }
        out.toMap
      } finally stream.close()
    }

    // wave 1: 200 ids spread across many buckets
    val wave1 = (1 to 200).map(i => FastDoc(i, i, "Topical", s"Doc $i", Nil, Nil, Nil, Nil))
    StreamingIngest.mergeBatch(spark, spark.createDataset(wave1).toDF(), table)
    val before = md5s(table)
    val bucketsBefore = before.keySet.map(_.split("/")(0)).filter(_.startsWith("_bucket="))
    assert(bucketsBefore.size > 10, s"expected many buckets, got $bucketsBefore")

    // wave 2: ONE doc → exactly one bucket may change
    val wave2 = Seq(FastDoc(5, 5, "Topical", "Doc 5 enriched label", Nil, Nil, Nil, Nil))
    StreamingIngest.mergeBatch(spark, spark.createDataset(wave2).toDF(), table)
    val after = md5s(table)

    val changedDirs = (before.keySet ++ after.keySet)
      .filter(f => before.get(f) != after.get(f))
      .map(_.split("/")(0)).filter(_.startsWith("_bucket="))
    assert(changedDirs.size === 1, s"expected exactly one rewritten bucket: $changedDirs")
    val untouched = before.keySet.filter(f => !changedDirs.exists(f.startsWith))
    untouched.foreach(f => assert(after.get(f).contains(before(f)), s"file $f changed"))

    // and the merge itself is correct: all 200 docs present, doc 5 enriched
    val docs = spark.read.parquet(table).select("_id", "prefLabel")
      .as[(Int, String)].collect().toMap
    assert(docs.size === 200)
    assert(docs(5) === "Doc 5 enriched label")
    assert(docs(7) === "Doc 7")

    // REPLAY the same micro-batch (a foreachBatch retry after a crash):
    // the merge must be idempotent — table content identical, and every
    // bucket the batch does NOT hash into byte-identical (dynamic
    // partition overwrite only rewrites the touched bucket)
    StreamingIngest.mergeBatch(spark, spark.createDataset(wave2).toDF(), table)
    val replayed = md5s(table)
    val changedOnReplay = (after.keySet ++ replayed.keySet)
      .filter(f => after.get(f) != replayed.get(f))
      .map(_.split("/")(0)).filter(_.startsWith("_bucket="))
    assert(changedOnReplay.subsetOf(changedDirs),
      s"replay touched foreign buckets: ${changedOnReplay -- changedDirs}")
    val docsReplayed = spark.read.parquet(table).select("_id", "prefLabel")
      .as[(Int, String)].collect().toMap
    assert(docsReplayed === docs, "replayed micro-batch changed table content")
  }
}
