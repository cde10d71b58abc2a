package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ingest.{FastIngest, Sinks}
import graft.sources.NtReader

/** End-to-end job test over real NT files on disk: term path (docs table)
  * and agent path (viaf update) — the committed form of the manual probe
  * that validated IngestJob's 4-arg mode.
  */
class IngestJobSpec extends SparkSpec {

  test("NT files on disk → fast table + viaf update, end to end") {
    val dir = Files.createTempDirectory("graft_job").toString
    Files.writeString(Paths.get(s"$dir/FASTTopical.nt"),
      """<http://id.worldcat.org/fast/101> <http://www.w3.org/2004/02/skos/core#prefLabel> "Alpha Conference" .
        |<http://id.worldcat.org/fast/101> <http://schema.org/sameAs> <http://viaf.org/viaf/900> .
        |<http://id.worldcat.org/fast/102> <http://www.w3.org/2000/01/rdf-schema#label> "Beta Only Label" .
        |garbage line that should be dropped
        |<http://id.worldcat.org/fast/NaN> <http://www.w3.org/2004/02/skos/core#prefLabel> "Bad" .
        |<http://viaf.org/viaf/900> <http://www.w3.org/2000/01/rdf-schema#label> "Alpha External Alias" .
        |""".stripMargin)

    val fragments = FastIngest.project(NtReader.triples(spark, s"$dir/FASTTopical.nt"))
    val docs = FastIngest.enrich(
      FastIngest.buildDocs(fragments, lit("Event")),
      FastIngest.sameAsLabels(fragments))
    val report = Sinks.writeFast(docs, s"$dir/fast")
    assert(report.rows === 2)

    val back = Sinks.readTable(spark, s"$dir/fast").collect()
      .map(r => r.getAs[Int]("_id") -> r).toMap
    assert(back(101).getAs[String]("prefLabel") === "Alpha Conference")
    assert(back(101).getAs[Seq[String]]("altLabel") === Seq("Alpha External Alias"))
    assert(back(102).getAs[String]("prefLabel") === "Beta Only Label") // rdfs fallback

    // agent path: update a viaf table keyed by the sameAs segment
    import spark.implicits._
    val viaf = Seq(("va", "900", "lcZ", null.asInstanceOf[Seq[Int]]))
      .toDF("_id", "viaf", "lcId", "fast")
    val updated = FastIngest.viafUpdate(FastIngest.agentOtherIds(fragments), viaf)
    Sinks.writeViaf(updated, s"$dir/viaf")
    val v = Sinks.readTable(spark, s"$dir/viaf").collect().head
    assert(v.getAs[Seq[Int]]("fast") === Seq(101))
  }
}
