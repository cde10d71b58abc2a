package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the runtime-filter pattern for selective
  * joins at scale: build a compact bit-vector sketch of the build side's
  * join keys, broadcast it (a 2^20-bit filter is 128 KB regardless of
  * data size), and drop probe-side rows that cannot match BEFORE they
  * reach the shuffle. The exact join still runs afterwards, so false
  * positives cost only wasted transfer, never wrong results; there are
  * no false negatives by construction.
  *
  * Build is fully distributed: each key explodes to k probe positions,
  * positions reduce to at most m/64 `(word, mask)` rows via a
  * partial-aggregating `bit_or` (map-side combine — the exchange moves
  * at most n_partitions * m/64 rows whatever the key count), and the
  * dense word array assembles with one tiny range join. Hashes are the
  * engine's portable md5 pair (Kirsch-Mitzenmacher: k positions from 2
  * hashes), so a filter built today matches rows hashed tomorrow on any
  * cluster.
  */
object Bloom {

  /** The two base hashes of a key (distinct salted md5 streams). */
  private def hashPair(key: Column): (Column, Column) = (
    Dedup.md5Int(concat(lit("b1:"), key.cast("string"))),
    Dedup.md5Int(concat(lit("b2:"), key.cast("string"))))

  /** Build a Bloom filter over `keyCol`: ONE row `(bits ARRAY<BIGINT>)`
    * of `mBits / 64` words. `mBits` must be a multiple of 64.
    */
  def build(keys: DataFrame, keyCol: String, mBits: Int = 1 << 20,
            k: Int = 5): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, "mBits must be a positive multiple of 64")
    val words = mBits / 64
    val (h1, h2) = hashPair(col(keyCol))
    val pos = keys.where(col(keyCol).isNotNull)
      .select(h1.as("h1"), h2.as("h2"),
        explode(sequence(lit(0L), lit((k - 1).toLong))).as("i"))
      .select(pmod(col("h1") + col("i") * col("h2"), lit(mBits.toLong)).as("pos"))
    val wordMasks = pos
      .select(expr("pos div 64").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").as("mask"))
      .groupBy("w").agg(expr("bit_or(mask)").as("mask"))
    keys.sparkSession.range(words.toLong).toDF("w")
      .join(wordMasks, Seq("w"), "left")
      .select(col("w"), coalesce(col("mask"), lit(0L)).as("mask"))
      .agg(collect_list(struct(col("w"), col("mask"))).as("wm"))
      // one-time assembly of one small array — interpreted HOF is fine here
      .select(transform(array_sort(col("wm")), x => x.getField("mask")).as("bits"))
  }

  /** Keep only rows whose `keyCol` MIGHT be in the filter (plus-or-minus
    * false positives): broadcast the one-row filter and probe with the
    * native codegen `bloom_might_contain`. `k` must match `build`'s.
    */
  def prune(df: DataFrame, keyCol: String, bloom: DataFrame, k: Int = 5): DataFrame = {
    val (h1, h2) = hashPair(col(keyCol))
    df.crossJoin(broadcast(bloom.select(col("bits").as("_bloom_bits"))))
      .where(call_function("bloom_might_contain", col("_bloom_bits"), h1, h2, lit(k)))
      .drop("_bloom_bits")
  }
}
