package graft

/** Physical-plan shape assertions for the scale-critical rewrites: these
  * queries were rebuilt specifically to remove exchanges (the 100 TB
  * bottleneck), and a silent regression back to the shuffled shape would
  * still pass the value gate — so the SHAPE is pinned here.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("quality_gopher is map-only: the sole exchange is the output sort") {
    val p = plan("quality_gopher")
    // zero-shuffle contract: no hash aggregation exchange, no explode
    assert(!p.contains("Generate"), s"token explode crept back:\n$p")
    assert(countOf(p, "Exchange") <= 1, // rangepartitioning for ORDER BY only
      s"extra exchanges in a row-local plan:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("embed_pq_adc search path: broadcast LUT, map-side top-k, no sort-merge join") {
    val p = plan("embed_pq_adc")
    assert(p.contains("BroadcastExchange"), s"LUT not broadcast:\n$p")
    assert(p.contains("TopKPerGroupPartial"),
      s"map-side top-k prune missing:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus-wide shuffled join in the ADC path:\n$p")
  }

  test("embed_matryoshka runs as ONE corpus scan, not one per prefix dim") {
    val p = plan("embed_matryoshka")
    // all 4 dims ride the same broadcast cross join + one exploding projection
    assert(countOf(p, "Scan parquet") <= 3, // corpus + query side (+1 reuse print)
      s"per-dim scans re-appeared:\n$p")
    assert(p.contains("TopKPerGroupPartial"), p)
  }

  test("dedup_topk_similar symmetrizes via explode, not a recomputing union") {
    val p = plan("dedup_topk_similar")
    assert(countOf(p, "Generate") >= 1, p) // the two-direction explode
    // the banded candidate join must appear ONCE, not twice (union shape)
    assert(countOf(p, "SortMergeJoin") + countOf(p, "ShuffledHashJoin") <= 2,
      s"candidate join duplicated:\n$p")
  }

  test("q24_percentile has no per-flag window: every Window runs over the bounded histogram") {
    val lp = SparkEntry.queries("q24_percentile")(spark, dir)
      .queryExecution.optimizedPlan
    // the 3-value-key single-task window sort is the regression this pins
    // against: any window whose partition key is l_returnflag alone puts a
    // whole flag (20M+ rows at 100×) into one task
    val badWindows = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.exists(_.references.exists(_.name == "l_returnflag")) &&
             w.child.maxRows.isEmpty &&
             !w.partitionSpec.exists(_.references.exists(_.name == "_b")) &&
             w.partitionSpec.forall(e =>
               e.references.forall(_.name == "l_returnflag")) => w
    }
    assert(badWindows.isEmpty,
      s"per-flag window over unbounded input returned:\n${lp.treeString}")
  }

  test("ivfAssign is map-only: no Window, no exchange of the corpus") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = emb.limit(4).select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    for (r <- Seq(1, 2)) {
      val p = graft.ops.Similarity.ivfAssign(emb, cents, "vec_id", "embedding",
        "c_id", "c_emb", replication = r).queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"r=$r assign windows the corpus:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"r=$r assign shuffles the corpus:\n$p")
      assert(p.contains("vec_top_cells"), s"fused kernel missing at r=$r:\n$p")
    }
  }

  test("topKPerGroupExecRanked emits rank without a Window node") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"$dir/orders.parquet")
    val p = graft.ops.TopK.topKPerGroupExecRanked(df, Seq("o_orderstatus"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3, "rank")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"trailing window re-rank:\n$p")
    assert(p.contains("TopKPerGroupFinal"), p)
  }
}
