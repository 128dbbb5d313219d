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
  * Semantics-preserving under the CANONICAL-COORDINATE contract
  * (lat ∈ [-90, 90], lon ∈ [-180, 180]): the original predicate is kept
  * and the box only ever CONTAINS the circle —
  *  - |Δlat| ≤ δ (angular distance bounds latitude difference exactly);
  *  - |Δlon| ≤ asin(sin δ / cos φ) grows with |φ|, so evaluating it at the
  *    band's extreme latitude φmax is conservative;
  *  - δ is inflated by 1e-6 relative so a point at EXACTLY radius r can
  *    never fall outside the box through floating-point disagreement
  *    between the analytic bound and the haversine formula's rounding
  *    (4 cm at 40 km — irrelevant to selectivity);
  *  - near-pole bands (φmax ≥ 89°), antimeridian-wrapping boxes, r ≥ half
  *    the globe, and NaN/negative radii degrade gracefully: the unsound
  *    bound is simply not emitted;
  *  - nondeterministic endpoint expressions are never duplicated (a second
  *    evaluation would draw different randomness than the haversine saw).
  *
  * The haversine FORMULA is periodic, interval bounds are not, so data
  * carrying denormalized coordinates (unwrapped ship-track longitudes like
  * 370°) would violate the contract: disable the rule for such data with
  * `spark.graft.geo.assumeCanonicalCoords=false` (the engine's own geo
  * sources — GBFS, geocoding — only ever produce canonical values).
  *
  * Fixpoint-safe two ways: a conjunct the rule already added is detected
  * via `semanticEquals`, and independently any existing upper/lower literal
  * bound on the same (cast-stripped) endpoint suppresses re-adding that
  * direction — so even if another batch rule rewrites our conjunct (e.g.
  * `UnwrapCastInBinaryComparison` on cast-wrapped int columns), the next
  * pass recognizes the endpoint as already bounded instead of re-deriving
  * forever. */
object HaversineBoxPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  val AssumeCanonicalCoordsKey = "spark.graft.geo.assumeCanonicalCoords"

  private def foldableDouble(e: Expression): Option[Double] =
    if (e.foldable && e.dataType == DoubleType)
      Option(e.eval()).map(_.asInstanceOf[Double])
    else None

  private def stripCast(e: Expression): Expression = e match {
    case Cast(child, _, _, _) => stripCast(child)
    case other => other
  }

  /** Candidate bound: direction (true = lower bound, `endpoint >= lit`),
    * the endpoint expression, and the literal value. */
  private final case class Bound(lower: Boolean, endpoint: Expression, value: Double) {
    def toExpression: Expression =
      if (lower) GreaterThanOrEqual(endpoint, Literal(value))
      else LessThanOrEqual(endpoint, Literal(value))
  }

  /** Bounds implied by haversine(...) <= r with one variable endpoint pair
    * and one foldable center; Nil when no sound box exists. */
  private def boxBounds(h: Haversine, r: Double): Seq[Bound] = {
    if (java.lang.Double.isNaN(r) || r < 0) return Nil // vacuous/NaN: no sound box
    val candidates = Seq(
      (h.lat1, h.lon1, foldableDouble(h.lat2), foldableDouble(h.lon2)),
      (h.lat2, h.lon2, foldableDouble(h.lat1), foldableDouble(h.lon1)))
    candidates.collectFirst {
      case (latE, lonE, Some(lat0), Some(lon0))
          if !(latE.foldable && lonE.foldable) &&
            latE.deterministic && lonE.deterministic &&
            !lat0.isNaN && !lon0.isNaN =>
        val deltaRad = (r / Haversine.EarthRadiusMeters) * (1.0 + 1e-6)
        if (deltaRad >= Math.PI) Nil // circle covers the globe
        else {
          val dLatDeg = Math.toDegrees(deltaRad)
          val latLo = lat0 - dLatDeg
          val latHi = lat0 + dLatDeg
          val latBounds = Seq(Bound(lower = true, latE, latLo), Bound(lower = false, latE, latHi))
          val phiMax = Math.max(Math.abs(latLo), Math.abs(latHi))
          val lonBounds =
            if (phiMax >= 89.0) Nil // pole inside/near the band: no lon bound
            else {
              val x = Math.sin(deltaRad) / Math.cos(Math.toRadians(phiMax))
              if (x >= 1.0) Nil
              else {
                val dLonDeg = Math.toDegrees(Math.asin(x))
                val lonLo = lon0 - dLonDeg
                val lonHi = lon0 + dLonDeg
                if (lonLo < -180.0 || lonHi > 180.0) Nil // wraparound: skip
                else Seq(Bound(lower = true, lonE, lonLo), Bound(lower = false, lonE, lonHi))
              }
            }
          latBounds ++ lonBounds
        }
    }.getOrElse(Nil)
  }

  /** True when `conjuncts` already carries a literal bound of the same
    * direction on the same (cast-stripped) endpoint — ours from a previous
    * fixed-point pass (possibly rewritten by another rule), or the user's
    * own. Either way, re-adding would not converge or not help. */
  private def alreadyBounded(conjuncts: Seq[Expression], b: Bound): Boolean = {
    val target = stripCast(b.endpoint).canonicalized
    def sameEndpoint(e: Expression): Boolean =
      stripCast(e).canonicalized == target
    conjuncts.exists {
      case GreaterThanOrEqual(e, lit) if lit.foldable => b.lower && sameEndpoint(e)
      case GreaterThan(e, lit) if lit.foldable => b.lower && sameEndpoint(e)
      case GreaterThanOrEqual(lit, e) if lit.foldable => !b.lower && sameEndpoint(e)
      case GreaterThan(lit, e) if lit.foldable => !b.lower && sameEndpoint(e)
      case LessThanOrEqual(e, lit) if lit.foldable => !b.lower && sameEndpoint(e)
      case LessThan(e, lit) if lit.foldable => !b.lower && sameEndpoint(e)
      case LessThanOrEqual(lit, e) if lit.foldable => b.lower && sameEndpoint(e)
      case LessThan(lit, e) if lit.foldable => b.lower && sameEndpoint(e)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(AssumeCanonicalCoordsKey, "true") != "true") return plan
    plan.transform {
      case f @ Filter(cond, _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val implied = conjuncts.flatMap {
          case LessThanOrEqual(h: Haversine, rl) =>
            foldableDouble(rl).toSeq.flatMap(boxBounds(h, _))
          case LessThan(h: Haversine, rl) =>
            foldableDouble(rl).toSeq.flatMap(boxBounds(h, _))
          case GreaterThanOrEqual(rl, h: Haversine) =>
            foldableDouble(rl).toSeq.flatMap(boxBounds(h, _))
          case GreaterThan(rl, h: Haversine) =>
            foldableDouble(rl).toSeq.flatMap(boxBounds(h, _))
          case _ => Nil
        }
        val fresh = implied
          .filterNot(b => alreadyBounded(conjuncts, b))
          .map(_.toExpression)
          .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
          .foldLeft(Seq.empty[Expression]) { (acc, e) =>
            if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
          }
        if (fresh.isEmpty) f
        else f.copy(condition = And(cond, fresh.reduce(And)))
    }
  }
}
