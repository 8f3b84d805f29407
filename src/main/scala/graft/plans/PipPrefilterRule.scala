package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.{CellScalar, PipOrdinal}
import graft.index.Quadkey

/** The one custom optimizer rule this workload earns (SURVEY.md §7.3 phase 3,
  * north_rule "range-join pushdown on cell ID intervals"): any Filter whose
  * predicate keeps rows inside a [[PipOrdinal]] boundary set gets a pure-
  * arithmetic coarse-tile prefilter injected in front of the exact ray-cast —
  * the automatic analog of the reference's "AOI restricts the H2 grid cells
  * scanned" (InteractionsBuilder.java:166; SURVEY.md §4 partition pruning).
  *
  * The prefilter is plain codegen Column arithmetic (`Quadkey.cellIdCol` at
  * z6 + an IN set over the boundary bboxes' tiles), so Catalyst can push it
  * further toward the scan, and rows far from every boundary never reach the
  * (reference-object) containment test.
  *
  * Registration: `spark.experimental.extraOptimizations ++= Seq(PipPrefilterRule)`
  * or `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object PipPrefilterRule extends Rule[LogicalPlan] {

  val PrefilterZoom = 6
  /** Boundary sets covering more z6 tiles than this aren't worth an IN list. */
  val MaxTiles = 2048

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !alreadyRewritten(cond) =>
      pipPredicate(cond) match {
        case Some(p) =>
          tilesOf(p) match {
            case Some(tiles) =>
              val pre = prefilterExpr(p.left, p.right, tiles)
              Filter(And(pre, markRewritten(cond)), child)
            case None => f
          }
        case None => f
      }
  }

  /** Find a top-level conjunct of the form `pip_ordinal(...) >= 0` (or > -1). */
  private def pipPredicate(cond: Expression): Option[PipOrdinal] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).collectFirst {
      case GreaterThanOrEqual(p: PipOrdinal, Literal(0, IntegerType)) => p
      case GreaterThan(p: PipOrdinal, Literal(v: Integer, IntegerType)) if v == -1 => p
    }
  }

  private def tilesOf(p: PipOrdinal): Option[Seq[Long]] = {
    // an antimeridian-crossing bbox (minLon > maxLon) would yield an EMPTY
    // x-range and silently drop every point of that boundary — an optimizer
    // rule must never change results, so bail out of the rewrite entirely
    if (p.index.boundaries.exists(b => b.minLon > b.maxLon || b.minLat > b.maxLat)) return None
    val tiles = p.index.boundaries.toSeq.flatMap { b =>
      val x0 = Quadkey.tileX(b.minLon, PrefilterZoom); val x1 = Quadkey.tileX(b.maxLon, PrefilterZoom)
      val y0 = Quadkey.tileY(b.maxLat, PrefilterZoom); val y1 = Quadkey.tileY(b.minLat, PrefilterZoom)
      for (x <- x0 to x1; y <- y0 to y1) yield Quadkey.cellId(x, y, PrefilterZoom)
    }.distinct
    if (tiles.nonEmpty && tiles.size <= MaxTiles) Some(tiles) else None
  }

  private def prefilterExpr(lonE: Expression, latE: Expression, tiles: Seq[Long]): Expression =
    // built from already-resolved catalyst nodes — an optimizer rule must not
    // introduce unresolved functions (PLAN_VALIDATION_FAILED_RULE_IN_BATCH)
    In(CellScalar(latE, lonE, PrefilterZoom, "quadCell"),
      tiles.sorted.map(t => Literal(t, org.apache.spark.sql.types.LongType)))

  // fixpoint guard: tag the PipOrdinal as already-prefiltered
  private def alreadyRewritten(cond: Expression): Boolean =
    cond.exists { case p: PipOrdinal => p.prefiltered; case _ => false }

  private def markRewritten(cond: Expression): Expression = cond.transform {
    case p: PipOrdinal => p.copy(prefiltered = true)
  }
}

/** spark-submit entry point: `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => PipPrefilterRule)
}
