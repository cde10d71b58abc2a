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
    val pref = part.select(concat(fastSubj,
      lit("<http://www.w3.org/2004/02/skos/core#prefLabel> \""), col("p_name"), lit("\" .")).as("line"))
    val alt = part.select(concat(fastSubj,
      lit("<http://www.w3.org/2004/02/skos/core#altLabel> \""), col("p_brand"), lit("\" .")).as("line"))
    val viaf = part.where(p % 2 === 0).select(concat(fastSubj,
      lit("<http://schema.org/sameAs> <http://viaf.org/viaf/"), p * 7, lit("> .")).as("line"))
    val lc = part.where(p % 3 === 0).select(concat(fastSubj,
      lit("<http://schema.org/sameAs> <http://id.loc.gov/authorities/names/lc"), p, lit("> .")).as("line"))
    val ext = part.where(p % 4 === 0).select(concat(
      lit("<http://viaf.org/viaf/"), p * 7,
      lit("> <http://www.w3.org/2000/01/rdf-schema#label> \""), col("p_type"), lit("\" .")).as("line"))
    val junk = part.where(p % 10 === 0).select(concat(lit("junk line "), p).as("line"))
    val nan = part.where(p % 25 === 0).select(
      lit("<http://id.worldcat.org/fast/NaN> <http://www.w3.org/2004/02/skos/core#prefLabel> \"Bad\" .").as("line"))
    pref.union(alt).union(viaf).union(lc).union(ext).union(junk).union(nan)
  }
}
