package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Content-defined chunking laws (functions/CdcChunks.scala): boundary
  * correctness against a pure-Scala reference, byte-exact reassembly, and
  * the property CDC exists for — boundary re-alignment after edits.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], w: Int = 8, mask: Int = 5): Seq[Seq[Int]] =
    texts.toDF("text")
      .select(expr(s"cdc_chunks(text, $w, $mask)").as("cuts"))
      .collect().map(_.getSeq[Int](0)).toSeq

  /** Independent reference: positional polynomial over code points. */
  private def ref(s: String, w: Int, maskBits: Int): Seq[Int] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return Seq.empty
    val M = 1000000007L
    val pows = Iterator.iterate(1L)(_ * 31L % M).take(w).toArray
    val mask = (1L << maskBits) - 1
    val cuts = (w to n).filter { p =>
      val h = (0 until w).map(j => cps(p - 1 - j) * pows(j) % M).sum % M
      (h & mask) == 0L
    }
    if (cuts.nonEmpty && cuts.last == n) cuts else cuts :+ n
  }

  private def randText(rnd: Random, n: Int): String =
    (1 to n).map { _ =>
      rnd.nextInt(4) match {
        case 0 => ('a' + rnd.nextInt(26)).toChar.toString
        case 1 => (' ' + rnd.nextInt(15)).toChar.toString
        case 2 => "é"
        case _ => ('0' + rnd.nextInt(10)).toChar.toString
      }
    }.mkString

  test("boundaries match the pure-Scala reference on random unicode text") {
    val rnd = new Random(17)
    val texts = ("" +: "short" +: (1 to 20).map(_ => randText(rnd, 50 + rnd.nextInt(400))))
    val got = run(texts)
    texts.zip(got).foreach { case (s, cuts) =>
      assert(cuts == ref(s, 8, 5), s"text=${s.take(40)}…")
    }
  }

  test("chunks reassemble the document exactly; lengths average near 2^maskBits") {
    val rnd = new Random(23)
    val texts = (1 to 10).map(_ => randText(rnd, 500))
    val rows = texts.toDF("text")
      .select(col("text"), expr("cdc_chunks(text, 8, 5)").as("cuts"))
      .select(col("text"), expr(
        """transform(sequence(1, size(cuts)), i ->
           | substring(text, IF(i = 1, 0, element_at(cuts, i - 1)) + 1,
           |   element_at(cuts, i) - IF(i = 1, 0, element_at(cuts, i - 1))))"""
          .stripMargin.replace("\n", " ")).as("chunks"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val chunks = r.getSeq[String](1)
      assert(chunks.mkString == text)
      assert(chunks.forall(_.nonEmpty))
    }
    // expected chunk length 32: loose sanity band over the corpus
    val avg = rows.map(_.getSeq[String](1).size).sum.toDouble
    assert(avg >= 10 * 2 && avg <= 10 * 64, s"chunk count way off: $avg")
  }

  test("an insertion re-aligns later chunks (the CDC property)") {
    val rnd = new Random(31)
    val base = randText(rnd, 2000)
    val edited = "INSERTED!" + base
    val Seq(ca, cb) = run(Seq(base, edited))
    def chunkSet(s: String, cuts: Seq[Int]): Set[String] = {
      val cps = s.codePoints().toArray
      (0 +: cuts.init).zip(cuts).map { case (a, b) =>
        new String(cps.slice(a, b), 0, b - a)
      }.toSet
    }
    val sa = chunkSet(base, ca)
    val sb = chunkSet(edited, cb)
    // all but the chunks at the edit site must re-align and be shared
    val shared = sa.intersect(sb).size
    assert(shared >= sa.size - 3,
      s"only $shared of ${sa.size} chunks survived a front insertion")
  }
}
