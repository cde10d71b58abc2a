package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Synthetic NT corpus derived deterministically from the `part` table —
  * exercises the full reference dataflow (P1/P2/A1/A2/J1/A4 and the agent
  * path P4/J2/K4) against a relational DuckDB oracle. Line families:
  *  - every part: prefLabel = p_name, altLabel = p_brand
  *  - p%2=0: sameAs → viaf URI (id = 7·p)
  *  - p%3=0: sameAs → id.loc.gov URI (id = "lc"+p)
  *  - p%4=0: external rdfs:label on the viaf URI (label = p_type) — feeds J1
  *  - p%10=0: malformed line (dropped by the parser)
  *  - p%25=0: /fast/NaN line (dropped by P2)
  */
object DemoCorpus {
  def ntFromPart(part: DataFrame): DataFrame = {
    val p = col("p_partkey")
    def fastSubj: Column = concat(lit("<http://id.worldcat.org/fast/"), p, lit("> "))
    val pref = concat(fastSubj,
      lit("<http://www.w3.org/2004/02/skos/core#prefLabel> \""), col("p_name"), lit("\" ."))
    val alt = concat(fastSubj,
      lit("<http://www.w3.org/2004/02/skos/core#altLabel> \""), col("p_brand"), lit("\" ."))
    val viaf = when(p % 2 === 0, concat(fastSubj,
      lit("<http://schema.org/sameAs> <http://viaf.org/viaf/"), p * 7, lit("> .")))
    val lc = when(p % 3 === 0, concat(fastSubj,
      lit("<http://schema.org/sameAs> <http://id.loc.gov/authorities/names/lc"), p, lit("> .")))
    val ext = when(p % 4 === 0, concat(
      lit("<http://viaf.org/viaf/"), p * 7,
      lit("> <http://www.w3.org/2000/01/rdf-schema#label> \""), col("p_type"), lit("\" .")))
    val junk = when(p % 10 === 0, concat(lit("junk line "), p))
    val nan = when(p % 25 === 0,
      lit("<http://id.worldcat.org/fast/NaN> <http://www.w3.org/2004/02/skos/core#prefLabel> \"Bad\" ."))
    // one parquet scan; null entries (inactive line families) filtered out
    part.select(explode(filter(
      array(pref, alt, viaf, lc, ext, junk, nan), x => x.isNotNull)).as("line"))
  }
}
