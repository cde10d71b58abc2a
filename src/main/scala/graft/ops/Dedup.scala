package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All hash functions are md5-derived so every operator is deterministic,
  * engine-independent (mirrorable in the DuckDB oracle), and needs no
  * stored random state. At 100 TB:
  *   - exact dedup is one hash-shuffle on a 16-byte key;
  *   - MinHash/LSH turns the O(n²) pair space into hash-joins on band
  *     keys (candidates only where a full band collides);
  *   - SimHash reduces each document to one 60-bit integer, and near-dup
  *     detection to bucket joins on bit-prefixes.
  */
object Dedup {

  /** First 8 hex chars of md5 as a BIGINT — the engine's portable hash.
    * Native [[graft.functions.Md5Long]] expression (digest bytes → long,
    * no hex-string round trip); bit-identical to DuckDB's
    * `('0x' || substr(md5(x),1,8))::BIGINT`.
    */
  def md5Int(c: Column): Column = call_function("md5_long", c, lit(8))

  /** 60-bit variant (15 hex chars) — fits signed 64-bit on both engines. */
  def md5Int60(c: Column): Column = call_function("md5_long", c, lit(15))

  /** Exact duplicate groups by content hash: one row per distinct content,
    * keeping the smallest id (`keep_id`) and the group size.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Distinct word k-shingles of a text column, via the native
    * [[graft.functions.WordShingles]] expression (one compiled loop per
    * row). Documents with fewer than k tokens get an empty shingle set.
    * Requires `graft.Functions.register` on the session.
    */
  def shingles(text: Column, k: Int = 3): Column =
    call_function("word_shingles", text, lit(k))

  /** Exploded shingle rows: (idCol, n_sh, sh). */
  def shingleRows(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    df.select(col(idCol), shingles(col(textCol), k).as("_shingles"))
      .select(col(idCol), size(col("_shingles")).as("n_sh"),
        explode(col("_shingles")).as("sh"))

  /** MinHash signature with the Kirsch-Mitzenmacher construction:
    * h_i(x) = h1(x) + i·h2(x) from two base md5 hashes — 2 hash
    * evaluations per shingle instead of `numHashes`, same collision
    * guarantees. h1,h2 < 2^32 and i < numHashes keep h_i well inside
    * signed 64-bit.
    */
  def minhashSignature(df: DataFrame, textCol: String, idCol: String,
                       numHashes: Int = 8): DataFrame = {
    val ex = shingleRows(df, textCol, idCol)
      .select(col(idCol),
        md5Int(concat(lit("1:"), col("sh"))).as("h1"),
        md5Int(concat(lit("2:"), col("sh"))).as("h2"))
    val mins = (0 until numHashes).map(i =>
      min(col("h1") + lit(i.toLong) * col("h2")).as(s"s$i"))
    ex.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs from minhash signatures: `bandSize` signature
    * components per band; a pair is a candidate iff some band matches
    * entirely. `est_jaccard` = fraction of matching signature components.
    * Scale shape: explode(bands) → equi-join on (band, key) → distinct —
    * never a cross join; band-key skew is AQE's skew-join case.
    */
  def minhashCandidates(sigIn: DataFrame, idCol: String,
                        numHashes: Int = 8, bandSize: Int = 2,
                        threshold: Double = 0.5): DataFrame = {
    // The signature table is consumed three times (band explode + both
    // sides of the signature re-join) — persist it once.
    val sig = sigIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nBands = numHashes / bandSize
    val bandArr = array((0 until nBands).map(b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until bandSize).map(j => col(s"s${b * bandSize + j}")): _*)
          .as("key"))): _*)
    val withBands = sig
      .select(col(idCol), explode(bandArr).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    val left = withBands
      .select(col(idCol).as("a_id"), col("band"), col("key"))
    val right = withBands
      .select(col(idCol).as("b_id"), col("band").as("band_r"), col("key").as("key_r"))
    val cand = left.join(right,
        col("band") === col("band_r") && col("key") === col("key_r") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val sa = sig.select(col(idCol).as("a_id") +:
      (0 until numHashes).map(i => col(s"s$i").as(s"a_s$i")): _*)
    val sb = sig.select(col(idCol).as("b_id") +:
      (0 until numHashes).map(i => col(s"s$i").as(s"b_s$i")): _*)
    val matchCnt = (0 until numHashes)
      .map(i => when(col(s"a_s$i") === col(s"b_s$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sa, "a_id").join(sb, "b_id")
      .select(col("a_id"), col("b_id"),
        round(matchCnt.cast("double") / numHashes, 4).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** Connected components over candidate-pair edges → duplicate clusters:
    * every node gets the minimum id reachable in its component as
    * `cluster_id` (nodes outside any edge are their own cluster and are
    * not emitted — callers union singletons if needed).
    *
    * Iterative min-label propagation: each round joins labels to
    * neighbors and takes the min (both edge directions), converging in
    * O(component diameter) rounds — near-dup clusters are shallow, so
    * `maxIterations` defaults well above any real diameter. Each round is
    * one shuffle join + one aggregation; no driver-side graph state.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIterations: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the loop's per-round cost is dominated by fixed per-shuffle task
    // overhead, not data — size partitions to the edge count (≥1 per 100k
    // edges), restore the session setting after
    val nEdges = edges.count()
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val loopParts = math.max(4, math.min(prevParts.toInt, (nEdges / 100000L).toInt + 1))
    spark.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
    try {
      var labels = edges.select(col("src").as("node"))
        .distinct()
        .withColumn("cluster_id", col("node"))
        .localCheckpoint(true)
      var i = 0
      var converged = false
      while (i < maxIterations && !converged) {
        // hop: take the min over neighbors' labels
        val viaNeighbor = edges
          .join(labels, edges("dst") === labels("node"))
          .select(edges("src").as("node"), col("cluster_id"))
        val hopped = labels.select(col("node"), col("cluster_id"))
          .union(viaNeighbor)
          .groupBy("node")
          .agg(min("cluster_id").as("cluster_id"))
        // pointer jump: follow the label to ITS label (labels are node ids,
        // so this resolves chains in one join) — hop alone needs
        // O(diameter) rounds; hop+jump converges in O(log n)
        val resolver = hopped.select(col("node").as("_rn"), col("cluster_id").as("_rc"))
        val next = hopped
          .join(resolver, hopped("cluster_id") === col("_rn"), "left")
          .select(hopped("node"), coalesce(col("_rc"), hopped("cluster_id")).as("cluster_id"))
          // checkpoint the lineage each round: without this the plan doubles
          // per iteration and analysis time explodes
          .localCheckpoint(true)
        // convergence check every 2nd round (labels only decrease, so an
        // unchanged pass means a fixed point; checking late costs at most
        // one extra cheap round)
        if (i % 2 == 1 || i == maxIterations - 1) {
          val changed = next.join(labels.withColumnRenamed("cluster_id", "prev"), "node")
            .where(col("cluster_id") =!= col("prev")).limit(1).count()
          converged = changed == 0
        }
        labels = next
        i += 1
      }
      labels.select(col("node"), col("cluster_id"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      edges.unpersist()
    }
  }

  /** 60-bit SimHash over the token multiset: per token a 60-bit md5 hash;
    * each output bit is the sign of the per-bit vote sum.
    *
    * One shuffle, no row explosion: the 60 bit-votes are 60 independent
    * `sum(...)` columns in a single hash aggregation (partial-agg map-side
    * combines token rows before the shuffle), then the final signature is a
    * pure projection over the 60 vote columns — vs the naive
    * explode(sequence(0,59)) form this is 60× fewer shuffle rows.
    */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
      .select(col(idCol), md5Int60(col("tok")).as("h"))
    val votes = (0 until 60).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"_v$b"))
    val simhashCol = (0 until 60).map(b =>
      when(col(s"_v$b") > 0, lit(1L << b)).otherwise(lit(0L))).reduce(_ + _)
    toks.groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), simhashCol.as("simhash"))
  }
}
