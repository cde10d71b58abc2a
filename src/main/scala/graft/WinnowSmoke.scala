package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale smoke for the winnowing + lexical-cosine family: N id-shifted
  * copies of the documents corpus — the dense-duplicate worst case,
  * where every document has N−1 exact twins and the pair OUTPUT itself
  * is quadratic in N (the same reality PPJoinSmoke documents: candidate
  * cost is bounded by the df cap, output cost by how duplicated the
  * corpus really is).
  *
  * The raw fixture corpus draws from a ~30-word vocabulary, so EVERY
  * char-gram is corpus-wide boilerplate and the df cap (correctly)
  * removes all of it — a first run of this smoke produced pairs=0 and
  * proved its invariants vacuously. To make the twin joins real, each
  * ORIGINAL document's tokens are salted with its doc_id before the
  * copies are made: twins still share every gram (salt derives from the
  * original id), but distinct originals no longer collide, so each
  * fingerprint/term has df ≈ copies and the caps admit exactly the twin
  * groups.
  *
  * Copy-derived invariants checked exactly (and non-vacuously —
  * pair counts are asserted against the closed-form expectation
  * C(N,2)·docs):
  *  - winnowFingerprints: twins have identical (n_fp, fp_xor) digests —
  *    every digest's multiplicity must be a multiple of N;
  *  - winnowPairs: ALL C(N,2)·docs twin pairs are found, and within a
  *    twin group every pair reports the IDENTICAL contain_bp. Note
  *    contain_bp < 10000 here even for verbatim twins: char-grams that
  *    span salt-id prefixes collide ACROSS groups (`able~12` lives in
  *    both `table~123` and `table~1234`), the df cap prunes those from
  *    the join but not from the denominator, so the score is the
  *    documented containment LOWER bound under boilerplate capping —
  *    exact only when no gram is corpus-boilerplate;
  *  - cosinePairs: twin pairs score cos²_bp = 10000 exactly (word-level
  *    terms ARE group-unique — no substring effect).
  *
  * Usage: WinnowSmoke [sfDir] [copies]
  */
object WinnowSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local("graft-winnow-smoke")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr("array_join(transform(filter(split(text, ' '), w -> w <> ''), " +
          "w -> concat(w, '~', cast(doc_id as string))), ' ')").as("text"))
    val corpus = (0 until copies).map { c =>
      docs.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
    }.reduce(_ unionByName _)

    val t0 = System.nanoTime()
    val digests = Dedup.winnowFingerprints(corpus, "text", "doc_id")
    val multOff = digests.groupBy("n_fp", "fp_xor").agg(count(lit(1)).as("m"))
      .where(col("m") % copies =!= 0).count()
    val nDocs = digests.count()
    val nOrig = nDocs / copies
    // every twin pair, for every original doc
    val expectPairs = nOrig * (copies.toLong * (copies - 1) / 2)
    val t1 = System.nanoTime()

    // salted grams have df == copies (twin groups only), so cap at 2× —
    // twins join, any residual cross-group collision is cut
    val pairs = Dedup.winnowPairs(corpus, "text", "doc_id",
      dfCap = copies * 2, minShared = 3, minContainBp = 0)
    val twins = pairs.where(col("a") % 1000000L === col("b") % 1000000L)
      .persist()
    val twinFound = twins.count()
    // identical docs ⇒ identical (shared, nfa, nfb) ⇒ one contain_bp
    // value per twin group
    val groupsOff = twins.groupBy((col("a") % 1000000L).as("g"))
      .agg(countDistinct("contain_bp").as("d")).where(col("d") =!= 1).count()
    val minContain = twins.agg(min("contain_bp")).head().getLong(0)
    val nPairs = pairs.count()
    twins.unpersist()
    val t2 = System.nanoTime()

    val cos = Dedup.cosinePairs(corpus, "text", "doc_id",
      minCos2Bp = 9999, dfCap = copies * 4)
    val cosTwins = cos.where(col("a") % 1000000L === col("b") % 1000000L).count()
    val t3 = System.nanoTime()

    println(f"WINNOW_SMOKE copies=$copies docs=$nDocs expectPairs=$expectPairs " +
      f"digestMultOff=$multOff digestSecs=${(t1 - t0) / 1e9}%.1f " +
      f"pairs=$nPairs twinFound=$twinFound groupsOff=$groupsOff " +
      f"minContainBp=$minContain pairSecs=${(t2 - t1) / 1e9}%.1f " +
      f"cosTwinPairs=$cosTwins cosSecs=${(t3 - t2) / 1e9}%.1f")
    val ok = multOff == 0 && twinFound == expectPairs && groupsOff == 0 &&
      cosTwins == expectPairs
    println(s"WINNOW_SMOKE_OK=$ok")
    spark.stop()
  }
}
