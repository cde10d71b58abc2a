package graft

import org.apache.spark.sql.functions._

import graft.ops.{Skew, Snapshot}

/** Snapshot lifecycle: diff statuses, SCD2 version transitions, CDC
  * compaction, and salted-join equivalence.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff: all four statuses, null-safe attribute compare") {
    val a = Seq((1L, Some(10), "x"), (2L, Some(20), "y"), (3L, None, "z"))
      .toDF("k", "v", "s")
    val b = Seq((2L, Some(20), "y"), (3L, Some(30), "z"), (4L, Some(40), "w"))
      .toDF("k", "v", "s")
    val out = Snapshot.diff(a, b, Seq("k"), Seq("v", "s"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", // null → 30 must be a change, not a match
      4L -> "added"))
  }

  test("scd2Apply: close-and-reopen, no-op update, new key, closed passthrough") {
    val current = Seq(
      (1L, "a", 0L, Some(5L)),   // closed history row
      (1L, "b", 5L, None),       // open, will change
      (2L, "c", 0L, None),       // open, no-op update
      (3L, "d", 0L, None)        // open, no update at all
    ).toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq((1L, "B", 9L), (2L, "c", 9L), (9L, "new", 9L))
      .toDF("k", "attr", "ts")
    val out = Snapshot.scd2Apply(current, updates, Seq("k"), Seq("attr"), "ts")
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(out === Seq(
      (1L, "a", 0L, Some(5L)),   // untouched closed row
      (1L, "b", 5L, Some(9L)),   // closed at update ts
      (1L, "B", 9L, None),       // new open version
      (2L, "c", 0L, None),       // no-op: still the original open row
      (3L, "d", 0L, None),       // no update: untouched
      (9L, "new", 9L, None)))    // first version of a new key
  }

  test("scd2Apply is idempotent for a repeated identical batch") {
    val current = Seq((1L, "x", 0L, Option.empty[Long])).toDF("k", "attr", "valid_from", "valid_to")
    val updates = Seq((1L, "y", 7L)).toDF("k", "attr", "ts")
    val once = Snapshot.scd2Apply(current, updates, Seq("k"), Seq("attr"), "ts")
    val twice = Snapshot.scd2Apply(once, updates, Seq("k"), Seq("attr"), "ts")
      .orderBy("k", "valid_from").as[(Long, String, Long, Option[Long])].collect()
    assert(twice.toSeq === Seq((1L, "x", 0L, Some(7L)), (1L, "y", 7L, None)))
  }

  test("latest: picks by full order with tiebreak") {
    val log = Seq((1L, 10L, 100L, "a"), (1L, 11L, 100L, "b"), (1L, 9L, 90L, "c"),
      (2L, 1L, 50L, "d")).toDF("k", "id", "ts", "v")
    val out = Snapshot.latest(log, Seq("k"), Seq(col("ts").desc, col("id").desc))
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "b", 2L -> "d")) // id 11 beats 10 at equal ts
  }

  test("diff is a faithful delta: applying it to A reconstructs B") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 3) {
      val a = (1 to 200).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, rnd.nextInt(5), rnd.nextBoolean().toString))
      val b = (1 to 200).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, rnd.nextInt(5), rnd.nextBoolean().toString))
      val d = Snapshot.diff(a.toDF("k", "v", "s"), b.toDF("k", "v", "s"),
          Seq("k"), Seq("v", "s"))
        .collect().map(r => (r.getLong(0), r.getString(5))).toMap
      // reconstruct B's key set and rows from A + the delta verdicts
      val aMap = a.map(r => r._1 -> r).toMap
      val bMap = b.map(r => r._1 -> r).toMap
      val rebuilt = (aMap.keySet ++ bMap.keySet).flatMap { k =>
        d(k) match {
          case "removed"   => None
          case "unchanged" => Some(aMap(k))
          case _           => Some(bMap(k)) // added / changed take B's row
        }
      }
      assert(rebuilt === bMap.values.toSet)
      // and diff(x, x) reports every key unchanged
      val self = Snapshot.diff(a.toDF("k", "v", "s"), a.toDF("k", "v", "s"),
          Seq("k"), Seq("v", "s"))
        .where(col("status") =!= "unchanged").count()
      assert(self === 0L)
    }
  }

  test("saltedJoin equals the plain join") {
    val fact = (1 to 3000).map(i => (s"k${i % 3}", i.toLong)).toDF("key", "v")
    val dim = Seq(("k0", "zero"), ("k1", "one"), ("k2", "two")).toDF("key", "label")
    val salted = Skew.saltedJoin(fact, dim, "key", col("v"), numSalts = 8)
      .orderBy("v").select("key", "v", "label").as[(String, Long, String)].collect()
    val plain = fact.join(dim, "key")
      .orderBy("v").select("key", "v", "label").as[(String, Long, String)].collect()
    assert(salted.sameElements(plain))
  }

  test("saltedJoin keeps rows whose salt source is NULL") {
    // a NULL salt source must default deterministically, not produce a NULL
    // _salt that the inner join silently drops
    val fact = Seq(("k0", Option(1L)), ("k0", Option.empty[Long]),
      ("k1", Option(2L)), ("k1", Option.empty[Long])).toDF("key", "v")
    val dim = Seq(("k0", "zero"), ("k1", "one")).toDF("key", "label")
    val salted = Skew.saltedJoin(fact, dim, "key", col("v"), numSalts = 8)
    val plain = fact.join(dim, "key")
    assert(salted.count() === plain.count())
    assert(salted.where(col("v").isNull).count() === 2L)
  }
}
