package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, Window}

/** Opt-in analysis guardrail against the single-task global window: a
  * window with an empty PARTITION BY moves every row of its input into
  * ONE task — the plan works in demos and dies at 100 TB (see
  * [[graft.ops.Rank.globalRowNumber]] for the scalable alternative).
  *
  * Enabled with `spark.graft.forbidGlobalWindows=true` (default off —
  * zero behavior change otherwise). Global windows whose input subtree
  * contains an Aggregate or a LIMIT are allowed: post-aggregation
  * frames are already reduced (e.g. the parts-row offset table inside
  * `globalRowNumber` itself) and a limit bounds the window's input by
  * construction (e.g. ranking the 20 survivors of a top-k); the trap is
  * a global window over RAW data.
  *
  * Injected via [[graft.GraftExtensions]] `injectCheckRule` — the
  * extension point for analysis-time plan validation, run after
  * resolution on every query.
  */
case class GlobalWindowCheck(spark: SparkSession) extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit =
    if (spark.conf.getOption("spark.graft.forbidGlobalWindows").contains("true")) {
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty &&
            !w.child.exists(n =>
              n.isInstanceOf[Aggregate] || n.isInstanceOf[GlobalLimit]) =>
          throw new IllegalStateException(
            "Global window (no PARTITION BY) over raw data moves every row " +
              "into one task and cannot scale; use Rank.globalRowNumber " +
              "(range partition + local windows + offset join), or unset " +
              "spark.graft.forbidGlobalWindows")
        case _ => ()
      }
    }
}
