package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end and chunk the stream into
  * fixed-size context windows — the step that turns a curated corpus into
  * training sequences. This is the "concatenate then split" packing
  * (every token used, documents may straddle a window boundary), computed
  * relationally: each doc's global start offset is a running sum of token
  * counts, and its window assignment is integer arithmetic on the offset.
  *
  * Packing is per SHARD: an unpartitioned running sum would serialize the
  * corpus through one task, so the shard column (language, source, or an
  * explicit hash bucket) is the parallelism unit — exactly how packed
  * training shards are produced in practice, since shards are also the
  * unit a data loader consumes.
  */
object Pack {

  /** Per-document packing assignment within each shard:
    * `shardCol, idCol, n_tok, start_tok, bin_id, offset_in_bin` where
    * `bin_id` is the context window containing the doc's FIRST token and
    * `offset_in_bin` its position inside that window. Deterministic: docs
    * are laid out in `idCol` order within their shard.
    */
  def sequential(docs: DataFrame, tokCol: String, idCol: String,
      shardCol: String, ctxLen: Int): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(shardCol), col(idCol), col(tokCol).cast("long").as("n_tok"))
      .withColumn("start_tok", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin_id", floor(col("start_tok") / ctxLen))
      .withColumn("offset_in_bin", col("start_tok") % ctxLen)
  }
}
