package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ARRAY<FLOAT>`).
  *
  * Two paths:
  *  - brute force: exact cosine top-k, linear scan — the baseline and the
  *    within-candidate scorer;
  *  - LSH: sign-of-random-hyperplane buckets; hyperplane weights derive
  *    from md5 so they're deterministic and reproducible in the oracle.
  *    At 100 TB the bucket key prunes the candidate space to one shuffle
  *    partition per bucket instead of an all-pairs cross join.
  */
object Similarity {

  /** Cosine in double precision with sequential fold — matches DuckDB's
    * `list_dot_product` over `DOUBLE[]` casts bit-for-bit.
    */
  def cosine(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |          CAST(0 AS DOUBLE), (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE)*CAST(v AS DOUBLE)))
       |    * sqrt(aggregate($b, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE)*CAST(v AS DOUBLE))))
       |""".stripMargin.replace("\n", " "))

  /** Same md5→BIGINT mapping as [[Dedup.md5Int]], computed driver-side. */
  private def md5IntLocal(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** Hyperplane weight for (plane j, dimension d): md5("j:d") mapped to
    * [-500, 500]. DuckDB spelling:
    * `('0x'||substr(md5(j||':'||d),1,8))::BIGINT % 1001 - 500`.
    */
  def planeWeight(j: Int, d: Int): Long = md5IntLocal(s"$j:$d") % 1001L - 500L

  /** Sign-LSH bucket id from `numPlanes` hyperplanes (bit j = sign of the
    * dot product with plane j). Weights are literal arrays — no per-row
    * hashing on the scan path.
    */
  def lshBucket(emb: Column, dim: Int, numPlanes: Int = 6): Column = {
    val bits = (0 until numPlanes).map { j =>
      val w = (0 until dim).map(planeWeight(j, _))
      val dot = aggregate(
        zip_with(emb, lit(w.toArray), (x, wt) => x.cast("double") * wt.cast("double")),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, 1L << j).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Exact top-k neighbors for each query row (small query side broadcast
    * against the full corpus; linear in corpus size).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, qIdCol: String, qEmbCol: String,
                     k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .where(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol).as("neighbor_id"),
        cosine(qEmbCol, embCol).as("cos"))
    scored.select(col(qIdCol), col("neighbor_id"), col("cos"),
        row_number().over(
          Window.partitionBy(qIdCol).orderBy(col("cos").desc, col("neighbor_id")))
          .as("rank"))
      .where(col("rank") <= k)
  }

  /** LSH-pruned top-k: only corpus rows sharing the query's bucket are
    * scored. Approximate (recall < 1), but the candidate set per query is
    * |corpus| / 2^numPlanes in expectation — the 100 TB path.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, qIdCol: String, qEmbCol: String,
              dim: Int, k: Int, numPlanes: Int = 6): DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col(embCol), dim, numPlanes))
    val qb = queries.withColumn("bucket", lshBucket(col(qEmbCol), dim, numPlanes))
    val scored = cb.join(broadcast(qb), "bucket")
      .where(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol).as("neighbor_id"),
        cosine(qEmbCol, embCol).as("cos"))
    scored.select(col(qIdCol), col("neighbor_id"), col("cos"),
        row_number().over(
          Window.partitionBy(qIdCol).orderBy(col("cos").desc, col("neighbor_id")))
          .as("rank"))
      .where(col("rank") <= k)
  }
}
