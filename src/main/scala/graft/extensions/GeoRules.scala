package graft.extensions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: geo-radius bounding-box prefilter.
  *
  * A predicate `haversine(latCol, lonCol, φ, λ) < r` (with (φ, λ, r)
  * foldable — the "points within r km of HERE" query) is exact but
  * opaque to the scan: trig on two columns can never push into parquet,
  * so every row of a 100 TB point table is read and evaluated. Radius
  * containment, however, IMPLIES simple range bounds: the great circle
  * of radius r around (φ, λ) fits inside
  * `lat ∈ [φ−Δφ, φ+Δφ] ∧ lon ∈ [λ−Δλ, λ+Δλ]` with Δφ = r/111.23 km/°
  * and Δλ widened by the worst-case 1/cos(lat) inside the lat band.
  * This rule CONJOINS those (slop-inflated, strictly implied) range
  * predicates to the filter — the haversine conjunct stays, so results
  * are bit-identical, but the new conjuncts are plain column
  * comparisons that reach `PushedFilters` and prune row groups /
  * partitions before any trig runs.
  *
  * Coordinate domain: lat must be in [-90, 90]; lon column values and
  * query centers may follow EITHER storage convention ([-180, 180] or
  * [0, 360]) — the lon window is emitted as an OR over its three ±360°
  * aliased bands, so periodic aliases of in-circle points (including
  * windows crossing the ±180° seam) are never shaved off. Near-polar
  * lat bands drop the lon bounds entirely (cos → 0 makes them
  * meaningless; the lat bounds still prune).
  *
  * Matches the haversine TREE SHAPE (2·6372.8 · asin(sqrt(…)) with its
  * two `cos(radians(lat))` factors and two coordinate differences), so
  * both the Column builder (NetFunctions.haversine) and the SQL
  * function (graft_haversine) — and any analyzer-inserted casts — are
  * recognized without a marker expression.
  */
object GeoRadiusPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private val TwoR = 2 * 6372.8
  private val KmPerDeg = math.Pi * 6372.8 / 180.0
  private val Slop = 1.0001 // inflate the box so float slop can't shave the circle

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case _ => e
  }

  /** Recognize our haversine tree; return (latSide, lonSide) where each
    * side is (columnExpr, centerLiteralValue). The rule runs AFTER
    * constant folding, so the center-side `cos(radians(φ))` has already
    * collapsed to a bare literal — the reliable anchors are the two
    * coordinate DIFFERENCES (each with exactly one foldable operand, the
    * center) plus the surviving column-side `cos(radians(latCol))`,
    * which tells the lat pair apart from the lon pair. Column-side
    * expressions keep their analyzer casts (double-typed there), so the
    * predicates built from them stay resolved; casts are stripped only
    * for identity comparisons.
    */
  private def asRadiusQuery(e: Expression): Option[((Expression, Double), (Expression, Double))] =
    e match {
      case Multiply(Literal(d: Double, DoubleType), Asin(Sqrt(inner)), _) if d == TwoR =>
        val colLats = inner.collect { case Cos(ToRadians(x)) if !x.foldable => x }
        val diffs = inner.collect { case ToRadians(s: Subtract) => s }
        def split(s: Subtract): Option[(Expression, Double)] = {
          val (folds, cols) = Seq(s.left, s.right).partition(_.foldable)
          (folds, cols) match {
            case (Seq(f), Seq(c)) => Option(f.eval()).collect {
              case n: java.lang.Number => (c, n.doubleValue())
            }
            case _ => None
          }
        }
        val pairs = diffs.flatMap(split(_).toSeq)
        if (diffs.size != 2 || pairs.size != 2) return None
        val latIdx = pairs.indexWhere { case (c, _) =>
          colLats.exists(x => stripCast(x).canonicalized == stripCast(c).canonicalized)
        }
        if (latIdx < 0) None else Some((pairs(latIdx), pairs(1 - latIdx)))
      case _ => None
    }

  /** The implied range conjuncts for one radius predicate, if derivable. */
  private def boundingBox(h: Expression, rExpr: Expression): Seq[Expression] = {
    if (!rExpr.foldable) return Nil
    val r = rExpr.eval() match {
      case n: java.lang.Number => n.doubleValue()
      case _ => return Nil
    }
    if (r < 0 || r.isNaN || r.isInfinite) return Nil
    asRadiusQuery(h).toSeq.flatMap { case ((latCol, lat0), (lonCol, lon0)) =>
      val dLat = r / KmPerDeg * Slop
      val latPreds = Seq(
        GreaterThanOrEqual(latCol, Literal(lat0 - dLat)),
        LessThanOrEqual(latCol, Literal(lat0 + dLat)))
      val maxAbsLat = math.min(math.abs(lat0) + dLat, 90.0)
      val lonPreds =
        if (maxAbsLat >= 89.0) Nil // near-polar: cos → 0, lon bounds useless
        else {
          val dLon = r / (KmPerDeg * math.cos(math.toRadians(maxAbsLat))) * Slop
          if (dLon >= 180.0) Nil // window spans the whole circle
          else {
            // haversine's sin²(Δλ/2) is 360°-periodic, so the exact
            // conjunct accepts any lon ALIAS of an in-circle point
            // (0–360-convention data, or a window crossing the ±180°
            // seam). Emit the window as an OR over the three ±360°
            // aliased bands: containment then holds for column values
            // and centers anywhere in [-180, 360] — both storage
            // conventions — and each band is still a plain range that
            // reaches PushedFilters (parquet handles Or-of-ranges).
            val bands: Seq[Expression] = Seq(0.0, 360.0, -360.0).map { off =>
              And(
                GreaterThanOrEqual(lonCol, Literal(lon0 - dLon + off)),
                LessThanOrEqual(lonCol, Literal(lon0 + dLon + off)))
            }
            Seq(bands.reduce(Or(_, _)))
          }
        }
      latPreds ++ lonPreds
    }
  }

  private def extraFor(conjunct: Expression): Seq[Expression] = conjunct match {
    case LessThan(h, rl)           => boundingBox(h, rl)
    case LessThanOrEqual(h, rl)    => boundingBox(h, rl)
    case GreaterThan(rl, h)        => boundingBox(h, rl)
    case GreaterThanOrEqual(rl, h) => boundingBox(h, rl)
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val have = conjuncts.map(_.canonicalized).toSet
      val extra = conjuncts.flatMap(extraFor)
        .filterNot(p => have(p.canonicalized)) // idempotent under re-runs
        .distinct
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }
}
