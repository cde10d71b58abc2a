package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, Window}

/** Opt-in analysis guardrail against the single-task global window: a
  * window with an empty PARTITION BY moves every row of its input into
  * ONE task — the plan works in demos and dies at 100 TB (see
  * [[graft.ops.Rank.globalRowNumber]] for the scalable alternative).
  *
  * Enabled with `spark.graft.forbidGlobalWindows=true` (default off —
  * zero behavior change otherwise). Global windows are allowed when the
  * input subtree contains an Aggregate (post-aggregation frames are
  * already reduced — e.g. the parts-row offset table inside
  * `globalRowNumber` itself), or when a LIMIT below the window still
  * bounds the window's DIRECT input (`GlobalLimit` in the subtree AND
  * `maxRows.isDefined` at the window's child — e.g. ranking the 20
  * survivors of a top-k). Both halves are required: a small limit under
  * a join/explode that re-expands to unbounded rows loses its `maxRows`
  * bound on the way up and is rejected, while a statically-sized local
  * relation (whose `maxRows` is just its data length, not a bound by
  * construction) doesn't whitelist itself. The trap is a global window
  * over RAW data.
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
            !(w.child.maxRows.isDefined &&
              w.child.exists(_.isInstanceOf[GlobalLimit])) &&
            !w.child.exists(_.isInstanceOf[Aggregate]) =>
          throw new IllegalStateException(
            "Global window (no PARTITION BY) over raw data moves every row " +
              "into one task and cannot scale; use Rank.globalRowNumber " +
              "(range partition + local windows + offset join), or unset " +
              "spark.graft.forbidGlobalWindows")
        case _ => ()
      }
    }
}
