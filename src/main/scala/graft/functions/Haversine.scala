package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst haversine expression (reference
  * `/root/reference/src/bike_analyzer/utils.py:12-19`, asin form as in
  * [[graft.ops.GeoOps]]).
  *
  * The built-in composition in GeoOps is already codegen'd and correct; this
  * native expression is the optional perf tier SURVEY §4 reserves: one fused
  * JVM call per row instead of a 12-node expression tree — smaller generated
  * code, fewer intermediate null checks, and a `haversine_m` SQL function
  * registered through [[GraftExtensions]] so `spark.sql` users get it too.
  * Produces bit-identical doubles to the composition (same libm call
  * sequence).
  */
case class Haversine(lat1: Expression, lon1: Expression, lat2: Expression, lon2: Expression)
    extends QuaternaryExpression {

  override def first: Expression = lat1
  override def second: Expression = lon1
  override def third: Expression = lat2
  override def fourth: Expression = lon2

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"haversine_m expects DOUBLE arguments, got ${children.map(_.dataType.simpleString).mkString(", ")}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_m"

  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    Haversine.meters(
      a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.Haversine.meters($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Haversine =
    copy(lat1 = newFirst, lon1 = newSecond, lat2 = newThird, lon2 = newFourth)
}

object Haversine {
  val EarthRadiusMeters: Double = 6371000.0

  /** Scalar kernel, called from both interpreted eval and generated code.
    * Same operation sequence as GeoOps (radians → sin/cos/pow → asin) so
    * results are bit-identical to the composition form. */
  def meters(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = Math.toRadians(lat2 - lat1)
    val dLon = Math.toRadians(lon2 - lon1)
    val a = Math.pow(Math.sin(dLat / 2), 2) +
      Math.cos(Math.toRadians(lat1)) * Math.cos(Math.toRadians(lat2)) *
        Math.pow(Math.sin(dLon / 2), 2)
    2 * EarthRadiusMeters * Math.asin(Math.sqrt(a))
  }
}

/** Engine extensions: injected with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")` (or
  * programmatically via `SparkSession.builder.withExtensions`). Registers
  * `haversine_m(lat1, lon1, lat2, lon2)` in the function registry — usable
  * from SQL text and via `functions.call_function` — and the
  * [[HaversineBoxPrefilter]] optimizer rule that turns radius filters over
  * it into scan-pushable bounding-box prefilters. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => HaversineBoxPrefilter)
    ext.injectFunction((
      FunctionIdentifier("haversine_m"),
      new ExpressionInfo(classOf[Haversine].getCanonicalName, "haversine_m"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"haversine_m expects 4 arguments, got ${children.length}")
        val Seq(a, b, c, d) = children.map { ch =>
          if (ch.dataType == DoubleType) ch else Cast(ch, DoubleType)
        }
        Haversine(a, b, c, d)
      }))
  }
}
