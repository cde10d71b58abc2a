package graft

import org.apache.spark.sql.functions._

/** BreakIterator word segmentation: per-script goldens and the
  * single-space-contract composition into downstream token consumers.
  */
class UnicodeWordsSpec extends SparkSpec {
  import spark.implicits._

  private def seg(s: String): Seq[String] =
    Seq(s).toDF("x").select(expr("unicode_words(x)")).as[Seq[String]]
      .collect().head

  test("segmentation goldens across scripts, joiners, and numbers") {
    assert(seg("Hello, world! It's 42 meters-long.") ===
      Seq("Hello", "world", "It's", "42", "meters-long"))
    assert(seg("naïve café résumé") === Seq("naïve", "café", "résumé"))
    assert(seg("Ελληνικά κείμενο") === Seq("Ελληνικά", "κείμενο"))
    assert(seg("русский текст тут") === Seq("русский", "текст", "тут"))
    // Japanese: script-boundary runs — kanji | hiragana | katakana
    assert(seg("日本語のテキスト") === Seq("日本語", "の", "テキスト"))
    // Han runs stay whole (no dictionary segmentation in the JDK rules)
    assert(seg("中文文本处理") === Seq("中文文本处理"))
    assert(seg("한국어 텍스트") === Seq("한국어", "텍스트"))
    assert(seg("mixed 中文 and English 1,000") ===
      Seq("mixed", "中文", "and", "English", "1,000"))
    assert(seg("a_b a.b 3.14") === Seq("a_b", "a.b", "3.14"))
    assert(seg("") === Seq.empty)
    assert(seg("!!! ...") === Seq.empty)
  }

  test("null-safe and usable from SQL") {
    val out = Seq(("x", Option("One, two!")), ("y", None))
      .toDF("k", "s")
      .selectExpr("k", "unicode_words(s) AS w")
      .as[(String, Option[Seq[String]])].collect().toMap
    assert(out("x") === Some(Seq("One", "two")))
    assert(out("y") === None)
  }

  test("array_join(unicode_words) feeds the single-space token contract downstream") {
    // a CJK corpus has no spaces, so the split(' ') contract sees one
    // mega-token; canonicalized through unicode_words the SAME downstream
    // ops (shingles, BM25) work unchanged — the tokenizer swaps in
    // without touching them
    val docs = Seq(
      (1L, "日本語のテキストの処理"),
      (2L, "日本語のテキスト"),
      (3L, "mixed 中文 and English"))
      .toDF("doc_id", "raw")
      .select(col("doc_id"),
        array_join(expr("unicode_words(raw)"), " ").as("text"))
    // shingles over the canonicalized text segment at word level
    val sh = docs.where(col("doc_id") === 1L)
      .select(expr("word_shingles(text, 2)").as("s"))
      .as[Seq[String]].collect().head
    assert(sh.contains("日本語 の"))
    // BM25 runs over the same column — the shared kanji run scores as a
    // cross-doc term, the doc-1-only term ranks above it for doc 1
    val bm = graft.ops.Rank.bm25TopTerms(docs, "text", "doc_id", topK = 2)
      .as[(Long, String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(bm(1L).contains("処理"))
    assert(bm(3L).contains("mixed") || bm(3L).contains("english"))
  }
}
