package graft

import org.apache.spark.sql.functions._

import graft.ingest.FastIngest

/** Stage-by-stage timing probe for viaf_update (VERDICT r15 #8): which of
  * the pipeline's pieces carries the ~1 s steady state — the NT parse of
  * the fragment stream, the matched-agent aggregation pair, or the final
  * broadcast re-join. Usage: ViafProbe [reps] [sfDir].
  */
object ViafProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-viaf-probe")
    val q = SparkEntry.queries("viaf_update")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        GraftSession.releaseAll(spark)
        println(f"[$label] RUN$i=$dt%.2f CTL=${Bench.control(spark)}%.2f")
      }
    }

    def fragments = {
      val part = spark.read.parquet(s"$sfDir/part.parquet")
      val nt = part.select(explode(filter(array(
        concat(lit("<http://id.worldcat.org/fast/"), col("p_partkey"), lit("> <http://www.w3.org/2004/02/skos/core#prefLabel> \""), col("p_name"), lit("\" .")),
        concat(lit("<http://id.worldcat.org/fast/"), col("p_partkey"), lit("> <http://www.w3.org/2004/02/skos/core#altLabel> \""), col("p_brand"), lit("\" .")),
        when(col("p_partkey") % 2 === 0, concat(lit("<http://id.worldcat.org/fast/"), col("p_partkey"), lit("> <http://schema.org/sameAs> <http://viaf.org/viaf/"), col("p_partkey") * 7, lit("> ."))),
        when(col("p_partkey") % 3 === 0, concat(lit("<http://id.worldcat.org/fast/"), col("p_partkey"), lit("> <http://schema.org/sameAs> <http://id.loc.gov/authorities/names/lc"), col("p_partkey"), lit("> ."))),
        when(col("p_partkey") % 4 === 0, concat(lit("<http://viaf.org/viaf/"), col("p_partkey") * 7, lit("> <http://www.w3.org/2000/01/rdf-schema#label> \""), col("p_type"), lit("\" ."))),
        when(col("p_partkey") % 10 === 0, concat(lit("junk line "), col("p_partkey"))),
        when(col("p_partkey") % 25 === 0, lit("<http://id.worldcat.org/fast/NaN> <http://www.w3.org/2004/02/skos/core#prefLabel> \"Bad\" ."))
      ), x => x.isNotNull)).as("line"))
      nt
    }

    // NOTE: the probe's NT construction mirrors SparkEntry.ntFromPart only
    // approximately — close enough for a stage-cost split, not for output
    // comparison. Absolute truth stays with BenchOne viaf_update.
    println(s"[probe] part scan partitions: " +
      spark.read.parquet(s"$sfDir/part.parquet").rdd.getNumPartitions)
    time("agents-wide")(FastIngest.agentOtherIds(
      FastIngest.project(FastIngest.parse(
        fragments.repartition(spark.sparkContext.defaultParallelism)))))
    time("full")(q(spark, sfDir))
    time("ntlines")(fragments)
    time("parse+project")(FastIngest.project(FastIngest.parse(fragments)))
    time("agents")(FastIngest.agentOtherIds(
      FastIngest.project(FastIngest.parse(fragments))))
    time("join+am") {
      val agents = FastIngest.agentOtherIds(
        FastIngest.project(FastIngest.parse(fragments)))
      val sup = spark.read.parquet(s"$sfDir/supplier.parquet")
      val viafKeys = broadcast(sup.select(
        concat(lit("v"), col("s_suppkey")).as("v_id"),
        explode(array((col("s_suppkey") * 7).cast("string"),
          concat(lit("lc"), col("s_suppkey")))).as("vkey"))
        .where(col("vkey").isNotNull))
      agents.join(viafKeys, col("otherId") === col("vkey"))
        .groupBy("otherId")
        .agg(min(col("v_id")).as("v_id"), collect_set(col("id")).as("newFast"))
    }
    spark.stop()
  }
}
