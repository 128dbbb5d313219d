package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: a radius filter `haversine_m(lat, lon, lat0, lon0) <= r`
  * (center + radius foldable, either argument order) additionally implies a
  * latitude/longitude BOUNDING BOX — and unlike the haversine expression,
  * the box conjuncts are sargable: they reach the parquet scan as
  * `PushedFilters` (min/max row-group skipping, partition pruning) and cost
  * four codegen'd comparisons per surviving row. The geo-circle prefilter
  * every native geo engine applies, done here as a `Rule[LogicalPlan]`
  * registered through [[GraftExtensions]] so EVERY engine session plans it.
  *
  * Semantics-preserving by construction: the original predicate is kept and
  * the box only ever CONTAINS the circle —
  *  - |Δlat| ≤ δ (angular distance bounds latitude difference exactly);
  *  - |Δlon| ≤ asin(sin δ / cos φ) grows with |φ|, so evaluating it at the
  *    band's extreme latitude φmax is conservative;
  *  - δ is inflated by 1e-6 relative so a point at EXACTLY radius r can
  *    never fall outside the box through floating-point disagreement
  *    between the analytic bound and the haversine formula's rounding
  *    (4 cm at 40 km — irrelevant to selectivity);
  *  - near-pole bands (φmax ≥ 89°), antimeridian-wrapping boxes, r ≥ half
  *    the globe, and negative radii degrade gracefully: the unsound bound
  *    is simply not emitted.
  *
  * Runs in the user-provided fixed-point batch, so it is idempotent: a box
  * it already added (or an equivalent user-written one) is detected via
  * `semanticEquals` and not re-added. */
object HaversineBoxPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def foldableDouble(e: Expression): Option[Double] =
    if (e.foldable && e.dataType == DoubleType)
      Option(e.eval()).map(_.asInstanceOf[Double])
    else None

  /** Box conjuncts implied by haversine(...) <= r with one variable
    * endpoint and one foldable center; Nil when no sound box exists. */
  private def boxConjuncts(h: Haversine, r: Double): Seq[Expression] = {
    if (r < 0) return Nil // vacuous predicate; nothing to improve
    val candidates = Seq(
      (h.lat1, h.lon1, foldableDouble(h.lat2), foldableDouble(h.lon2)),
      (h.lat2, h.lon2, foldableDouble(h.lat1), foldableDouble(h.lon1)))
    candidates.collectFirst {
      case (latE, lonE, Some(lat0), Some(lon0)) if !(latE.foldable && lonE.foldable) =>
        val deltaRad = (r / Haversine.EarthRadiusMeters) * (1.0 + 1e-6)
        if (deltaRad >= Math.PI) Nil // circle covers the globe
        else {
          val dLatDeg = Math.toDegrees(deltaRad)
          val latLo = lat0 - dLatDeg
          val latHi = lat0 + dLatDeg
          val latBounds: Seq[Expression] = Seq(
            GreaterThanOrEqual(latE, Literal(latLo)),
            LessThanOrEqual(latE, Literal(latHi)))
          val phiMax = Math.max(Math.abs(latLo), Math.abs(latHi))
          val lonBounds: Seq[Expression] =
            if (phiMax >= 89.0) Nil // pole inside/near the band: no lon bound
            else {
              val x = Math.sin(deltaRad) / Math.cos(Math.toRadians(phiMax))
              if (x >= 1.0) Nil
              else {
                val dLonDeg = Math.toDegrees(Math.asin(x))
                val lonLo = lon0 - dLonDeg
                val lonHi = lon0 + dLonDeg
                if (lonLo < -180.0 || lonHi > 180.0) Nil // wraparound: skip
                else Seq(
                  GreaterThanOrEqual(lonE, Literal(lonLo)),
                  LessThanOrEqual(lonE, Literal(lonHi)))
              }
            }
          latBounds ++ lonBounds
        }
    }.getOrElse(Nil)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val implied = conjuncts.flatMap {
        case LessThanOrEqual(h: Haversine, rl) =>
          foldableDouble(rl).toSeq.flatMap(boxConjuncts(h, _))
        case LessThan(h: Haversine, rl) =>
          foldableDouble(rl).toSeq.flatMap(boxConjuncts(h, _))
        case GreaterThanOrEqual(rl, h: Haversine) =>
          foldableDouble(rl).toSeq.flatMap(boxConjuncts(h, _))
        case GreaterThan(rl, h: Haversine) =>
          foldableDouble(rl).toSeq.flatMap(boxConjuncts(h, _))
        case _ => Nil
      }
      // fixed-point safety: only conjuncts not already present (added by a
      // previous pass of this rule, or written by the user), deduped
      val fresh = implied
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        .foldLeft(Seq.empty[Expression]) { (acc, e) =>
          if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
        }
      if (fresh.isEmpty) f
      else f.copy(condition = And(cond, fresh.reduce(And)))
  }
}
