package graft

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf: latest right at-or-before left ts, per key; no match → null") {
    val trades = Seq(
      ("u1", 100L, 10L), // matches quote at 100 (equal ts)
      ("u1", 150L, 11L), // matches quote at 100
      ("u1", 250L, 12L), // matches quote at 200
      ("u1", 50L, 13L),  // before any quote → null
      ("u2", 500L, 14L)  // other key: matches u2's quote, not u1's
    ).toDF("k", "ts", "trade_id")
    val quotes = Seq(
      ("u1", 100L, 1.5), ("u1", 200L, 2.5), ("u2", 400L, 9.9)
    ).toDF("k", "q_ts", "px")
    val out = AsOfJoin.asOf(trades, quotes, "k", "ts", "q_ts", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(out === Map(
      10L -> Some(1.5), 11L -> Some(1.5), 12L -> Some(2.5),
      13L -> None, 14L -> Some(9.9)))
  }

  test("asOfForward: earliest right at-or-after left ts; no match → null") {
    val trades = Seq(
      ("u1", 100L, 10L), // matches quote at 100 (equal ts)
      ("u1", 150L, 11L), // matches quote at 200
      ("u1", 250L, 12L), // after all u1 quotes → null
      ("u1", 50L, 13L),  // matches quote at 100
      ("u2", 300L, 14L)  // other key: matches u2's quote at 400
    ).toDF("k", "ts", "trade_id")
    val quotes = Seq(
      ("u1", 100L, 1.5), ("u1", 200L, 2.5), ("u2", 400L, 9.9)
    ).toDF("k", "q_ts", "px")
    val out = AsOfJoin.asOfForward(trades, quotes, "k", "ts", "q_ts", Seq("px"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("asof_px")).map(_.toDouble)).toMap
    assert(out === Map(
      10L -> Some(1.5), 11L -> Some(2.5), 12L -> None,
      13L -> Some(1.5), 14L -> Some(9.9)))
  }
}
