package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. '16) as
  * DataFrame rounds — the step that turns a curated corpus into the
  * tokenizer artifact, not just applies one.
  *
  * Shape: the corpus collapses ONCE to the word-frequency table (the only
  * corpus-sized pass; everything after is vocabulary-sized, which is why
  * BPE training scales — 100 TB of text is still a few million distinct
  * words). Each merge round is (1) a pair-count aggregation over the
  * vocab, (2) a `limit(1)` argmax — a one-row frame, never a driver
  * value — broadcast into (3) a `regexp_replace` applying the merge to
  * every word's symbol string. Rounds are inherently sequential (merge
  * r+1's counts depend on merge r — the algorithm, not the
  * implementation), so each round materializes through [[Iterate]] to
  * keep plans O(1); the per-round `isEmpty` convergence probe on the
  * one-row argmax is the driver's only data contact.
  *
  * Learned symbols are regex-quoted before being spliced into the merge
  * pattern (and `\`/`$` escaped in the replacement), so corpora containing
  * regex metacharacters (`.`, `*`, `(`, `$`, …) merge correctly instead
  * of mis-merging or throwing PatternSyntaxException.
  */
object Bpe {

  /** Escape every Java-regex metacharacter in a symbol column so it can be
    * spliced into a pattern as a literal. */
  private def rxQuote(c: Column): Column =
    regexp_replace(c, "([.*+?^$(){}\\[\\]|\\\\])", "\\\\$1")

  /** Escape `\` and `$` (special in Java replacement strings). */
  private def replQuote(c: Column): Column =
    regexp_replace(c, "([\\\\$])", "\\\\$1")

  /** Learn up to `numMerges` merge rules. Output: `(rank, left, right,
    * pair_freq)`, rank-ordered — merge r was the most frequent adjacent
    * symbol pair (ties broken lexicographically) after merges 1..r−1.
    * Stops early when no adjacent pair remains.
    */
  def learnMerges(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val words0 = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat_ws(" ",
        concat(expr("filter(split(w, ''), x -> x <> '')"), array(lit("</w>")))).as("syms"),
        col("freq"))
    var words = Iterate.materialize(words0)
    var tops = List.empty[Iterate.Materialized]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val arr = split(col("syms"), " ")
      val pairs = words.df
        .select(col("freq"), arr.as("arr"))
        .where(size(col("arr")) >= 2)
        .select(col("freq"), explode(arrays_zip(
          slice(col("arr"), lit(1), size(col("arr")) - 1).as("l"),
          slice(col("arr"), lit(2), size(col("arr")) - 1).as("r"))).as("pz"))
        .select(col("pz.l").as("left"), col("pz.r").as("right"), col("freq"))
      val top = pairs.groupBy("left", "right").agg(sum("freq").as("pair_freq"))
        .orderBy(col("pair_freq").desc, col("left"), col("right"))
        .limit(1)
        .select(lit(r).as("rank"), col("left"), col("right"), col("pair_freq"))
      val mt = Iterate.materialize(top)
      if (mt.df.isEmpty) { mt.release(); done = true }
      else {
        tops = mt :: tops
        val merged = words.df.crossJoin(broadcast(mt.df))
          .select(regexp_replace(col("syms"),
            concat(lit("(?<=^| )"), rxQuote(col("left")), lit(" "),
              rxQuote(col("right")), lit("(?=$| )")),
            concat(replQuote(col("left")), replQuote(col("right")))).as("syms"),
            col("freq"))
        val next = Iterate.materialize(merged)
        words.release()
        words = next
        r += 1
      }
    }
    val merges =
      if (tops.isEmpty) df.sparkSession.emptyDataFrame
        .select(lit(0).as("rank"), lit("").as("left"), lit("").as("right"),
          lit(0L).as("pair_freq")).limit(0)
      else tops.reverse.map(_.df).reduce(_ unionAll _).orderBy("rank")
    val out = Iterate.scoped(merges)
    tops.foreach(_.release())
    words.release()
    out
  }

  /** Apply merges (a tiny driver-side artifact, like a broadcast
    * dictionary) to tokenize a text column: each doc's words become
    * space-joined BPE symbol strings in `bpe_syms`, words separated by a
    * unit-separator char (U+001F) so merges never cross word boundaries.
    *
    * Wire format is regex-free and engine-portable: symbols are padded
    * to DOUBLE internal gaps with single-space edges, so a literal
    * `replace(" l  r ", " lr ")` is exactly one greedy left-to-right
    * non-overlapping merge pass — consuming one space of each
    * neighboring gap leaves the single space the adjacent pair needs,
    * and the invariant (edges 1, gaps 2) is restored by the
    * replacement's own edge spaces. A SQL oracle mirrors the chain with
    * the same literal `replace`, no lookaround (which RE2 engines lack).
    */
  def encode(df: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    // native one-pass expression (graft.functions.BpeApply) — byte-equal
    // to encodeViaReplaceChain (BpeSpec pins the equivalence on the real
    // corpus), without the chain's O(merges) intermediate strings per row
    require(merges.forall { case (l, r) =>
      l.nonEmpty && r.nonEmpty &&
        !s"$l$r".contains(",") && !s"$l$r".contains(" ")
    }, "bpe_apply merge symbols must be non-empty and contain no space/comma")
    df.withColumn("bpe_syms", call_function("bpe_apply", col(textCol),
      lit(merges.map { case (l, r) => s"$l $r" }.mkString(","))))
  }

  /** The SQL-spelled reference implementation of [[encode]]: the double-gap
    * literal-replace chain (the same algebra the DuckDB oracle runs). Kept
    * as the equivalence baseline — BpeSpec asserts byte-identical output
    * against the native expression on the fixture corpus.
    */
  def encodeViaReplaceChain(df: DataFrame, textCol: String,
                            merges: Seq[(String, String)]): DataFrame = {
    val sep = "\u001f"
    // " c1  c2  ...  </w> " per word, words joined by U+001F
    val start = concat_ws(sep, expr(
      s"""transform(filter(split($textCol, ' '), w -> w <> ''),
         | w -> concat(' ', concat_ws('  ',
         |   concat(filter(split(w, ''), x -> x <> ''), array('</w>'))), ' '))"""
        .stripMargin.replace("\n", " ")))
    val encoded = merges.foldLeft(start) { case (acc, (l, r)) =>
      expr_replace(acc, s" $l  $r ", s" ${l}${r} ")
    }
    val singleSpaced = expr_replace(encoded, "  ", " ")
    val clean = trim(expr_replace(expr_replace(singleSpaced, s" $sep", sep), s"$sep ", sep))
    df.withColumn("bpe_syms", clean)
  }

  /** Literal (non-regex) global replace via the SQL `replace` function. */
  private def expr_replace(c: Column, find: String, repl: String): Column =
    call_function("replace", c, lit(find), lit(repl))
}
