package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.MergeFastDocs
import graft.model.FastDoc

/** ScalaCheck laws for the K3/A4 merge (SURVEY §5.2): a distributed
  * Aggregator only produces partition-independent results if its buffer
  * merge is commutative and associative, and re-delivery (streaming
  * at-least-once) only converges if merging a doc twice changes nothing.
  * Pure functions — no SparkSession; 300 random cases per law.
  */
class MergePropertySpec extends AnyFunSuite {

  private val genLabel = Gen.option(Gen.choose(1, 12).flatMap(n =>
    Gen.stringOfN(n, Gen.alphaLowerChar)))
  private val genArr = Gen.choose(0, 4).flatMap(n =>
    Gen.listOfN(n, Gen.stringOfN(3, Gen.alphaLowerChar)).map(_.distinct))

  private val genDoc: Gen[FastDoc] = for {
    tpe <- Gen.option(Gen.oneOf("Topical", "Event", "Geographic", "Form"))
    pref <- genLabel
    alt <- genArr; lc <- genArr; viaf <- genArr; norm <- genArr
  } yield FastDoc(1, 1, tpe.orNull, pref.orNull, alt, lc, viaf, norm)

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$name falsified: ${res.status}")
  }

  test("mergeBuf is commutative") {
    check("commutativity", Prop.forAll(genDoc, genDoc) { (a, b) =>
      val (x, y) = (MergeFastDocs.toBuf(a), MergeFastDocs.toBuf(b))
      MergeFastDocs.mergeBuf(x, y) == MergeFastDocs.mergeBuf(y, x)
    })
  }

  test("mergeBuf is associative") {
    check("associativity", Prop.forAll(genDoc, genDoc, genDoc) { (a, b, c) =>
      val Seq(x, y, z) = Seq(a, b, c).map(MergeFastDocs.toBuf)
      MergeFastDocs.mergeBuf(MergeFastDocs.mergeBuf(x, y), z) ==
        MergeFastDocs.mergeBuf(x, MergeFastDocs.mergeBuf(y, z))
    })
  }

  test("merging a doc in twice is a no-op (at-least-once delivery)") {
    check("idempotence", Prop.forAll(genDoc, genDoc) { (a, b) =>
      val (x, y) = (MergeFastDocs.toBuf(a), MergeFastDocs.toBuf(b))
      val once = MergeFastDocs.mergeBuf(x, y)
      MergeFastDocs.mergeBuf(once, y) == once
    })
  }

  test("finished doc independent of fold order and grouping") {
    val genDocs = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, genDoc))
    check("fold-order independence", Prop.forAll(genDocs, Gen.long) { (docs, seed) =>
      val bufs = docs.map(MergeFastDocs.toBuf)
      val shuffled = new scala.util.Random(seed).shuffle(bufs)
      def fold(bs: Seq[graft.ingest.MergeBuf]) =
        MergeFastDocs.finishBuf(bs.reduce(MergeFastDocs.mergeBuf))
      // left fold vs shuffled left fold vs balanced-tree reduction
      def tree(bs: Seq[graft.ingest.MergeBuf]): graft.ingest.MergeBuf =
        if (bs.size == 1) bs.head
        else {
          val (l, r) = bs.splitAt(bs.size / 2)
          MergeFastDocs.mergeBuf(tree(l), tree(r))
        }
      fold(bufs) == fold(shuffled) &&
        fold(bufs) == MergeFastDocs.finishBuf(tree(bufs))
    })
  }
}
