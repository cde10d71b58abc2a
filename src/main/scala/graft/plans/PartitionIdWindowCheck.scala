package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  Expression, NTile, RankLike, RowNumberLike, SparkPartitionID, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Opt-in analysis guardrail against the PHANTOM partition-id exchange —
  * the r14 suffix-array diagnosis turned into a lint. The pattern:
  *
  *   df.withColumn("_pid", spark_partition_id())
  *     .withColumn("rn", row_number().over(Window.partitionBy("_pid")...))
  *
  * reads as "rank within the partitions I already have", but Spark
  * cannot prove the checkpoint/scan is clustered by `_pid`, so the
  * window inserts a HASH EXCHANGE of the entire table on the partition
  * id — a full shuffle the author believed was free (it cost the old
  * SuffixArray ranking and Rank.globalRowNumber one extra full-data
  * exchange per consumer). Ranking within physical partitions never
  * needs a window at all: sort within the exchange that created the
  * partitioning and derive ranks from `monotonically_increasing_id` +
  * a collected per-partition offset table, a pure expression (see
  * [[graft.ops.Rank.globalRowNumber]]).
  *
  * Only RANKING functions (row_number / rank / dense_rank / ntile) are
  * flagged: ordered-frame aggregates (running sums) and offset
  * functions (lag/lead neighbor access) over a partition-id window have
  * no expression-only equivalent — there the exchange is a conscious,
  * narrow price ([[graft.ops.SuffixArray.boundedRunMembers]] pays it
  * deliberately for lag/lead).
  *
  * Enabled with `spark.graft.forbidPartitionIdWindows=true` (default
  * off — zero behavior change otherwise). Injected via
  * [[graft.GraftExtensions]] `injectCheckRule` like
  * [[GlobalWindowCheck]]; ContractSpec arms both over every query.
  */
case class PartitionIdWindowCheck(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  private def isRanking(e: Expression): Boolean = e.exists {
    case we: WindowExpression => we.windowFunction match {
      case _: RankLike | _: RowNumberLike | _: NTile => true
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): Unit =
    if (spark.conf.getOption("spark.graft.forbidPartitionIdWindows")
        .contains("true")) {
      // every attribute anywhere in the plan aliased to
      // spark_partition_id() — resolution through Projects is what makes
      // the withColumn form detectable
      val pidIds = plan.flatMap {
        case p => p.expressions.flatMap(_.collect {
          case a: Alias if a.child.isInstanceOf[SparkPartitionID] => a.exprId
        })
      }.toSet
      plan.foreach {
        case w: Window if w.windowExpressions.exists(isRanking) &&
            w.partitionSpec.exists(_.exists {
              case _: SparkPartitionID => true
              case ar: AttributeReference => pidIds.contains(ar.exprId)
              case _ => false
            }) =>
          throw new IllegalStateException(
            "Ranking window partitioned by spark_partition_id(): Spark " +
              "cannot prove the input is clustered by partition id, so " +
              "this inserts a full hash exchange of the table — rank " +
              "within physical partitions via sortWithinPartitions + " +
              "monotonically_increasing_id + a collected offset table " +
              "instead (Rank.globalRowNumber), or unset " +
              "spark.graft.forbidPartitionIdWindows")
        case _ => ()
      }
    }
}
