package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Predicate, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Marker predicate for a backward time-band join:
  *
  *   `graft_band_join(leftTime, rightTime, bandSeconds)`
  *   ⇔ `rightTime ∈ [leftTime - bandSeconds, leftTime]`
  *
  * It is a REAL evaluable predicate (eval + whole-stage codegen over
  * the timestamps' physical micros), so a join written against it is
  * correct on any Spark session — Catalyst just plans the generic
  * O(|L|·|R|) BroadcastNestedLoopJoin, exactly as it would for the
  * hand-written `BETWEEN` condition. Registering
  * [[graft.plans.BandJoinRewrite]] (via [[graft.GraftExtensions]] or
  * `spark.experimental.extraOptimizations`) upgrades any inner join
  * whose condition carries this marker to the linear bucketed
  * equi-join shape of [[graft.operators.Temporal.bandJoinBackward]];
  * the marker itself survives as the residual filter, so the rewrite
  * can never change semantics — only the plan.
  *
  * Both timestamp children must share one of the two timestamp types
  * (`TIMESTAMP` / `TIMESTAMP_NTZ` — both store Long micros, compared
  * raw, no zone arithmetic). `bandSeconds` must be a foldable
  * non-negative integral — the rewrite needs a constant bucket width,
  * and a data-dependent band has no bucketed re-expression.
  */
final case class GraftBandJoin(first: Expression, second: Expression,
                               third: Expression)
    extends TernaryExpression with Predicate {

  override def prettyName: String = "graft_band_join"
  override def nullable: Boolean = true

  private def isTs(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!isTs(first.dataType) || first.dataType != second.dataType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two timestamps of the same type " +
          s"(TIMESTAMP or TIMESTAMP_NTZ), got ${first.dataType.sql} " +
          s"and ${second.dataType.sql}")
    else third.dataType match {
      case IntegerType | LongType if third.foldable =>
        val b = third.eval()
        if (b == null || b.asInstanceOf[Number].longValue < 0L)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName bandSeconds must be a non-negative constant")
        else if (b.asInstanceOf[Number].longValue > Long.MaxValue / 1000000L)
          // the seconds→micros conversion below would overflow; fail at
          // analysis as a clean type-check error instead of letting
          // Math.multiplyExact throw ArithmeticException at planning
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName bandSeconds must be <= ${Long.MaxValue / 1000000L} " +
              "(seconds-to-microseconds conversion must not overflow)")
        else TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName bandSeconds must be a foldable INT/BIGINT, " +
          s"got ${third.dataType.sql}")
    }

  /** Band width in microseconds (timestamps' physical unit). */
  lazy val bandMicros: Long =
    Math.multiplyExact(third.eval().asInstanceOf[Number].longValue, 1000000L)

  override def nullSafeEval(l: Any, r: Any, b: Any): Any = {
    val lt = l.asInstanceOf[Long]
    val rt = r.asInstanceOf[Long]
    rt <= lt && rt >= lt - bandMicros
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r, _) =>
      s"${ev.value} = $r <= $l && $r >= $l - ${bandMicros}L;")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): GraftBandJoin =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object GraftBandJoin {
  /** (identifier, info, builder) triple for FunctionRegistry /
    * SparkSessionExtensions.injectFunction. */
  val descriptor: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_band_join"),
    new ExpressionInfo(classOf[GraftBandJoin].getName, "graft_band_join"),
    (args: Seq[Expression]) => {
      require(args.length == 3, "graft_band_join takes exactly 3 arguments")
      GraftBandJoin(args.head, args(1), args(2))
    })
}

/** Bucket id of a timestamp at `widthMicros` granularity — the hash
  * key [[graft.plans.BandJoinRewrite]] equi-joins on. Plain Java Long
  * division over the timestamp's physical micros (truncation toward
  * zero, both timestamp flavors, no zone arithmetic — so the mapping
  * is exactly monotone in the raw value the marker compares). Around
  * zero truncation makes bucket 0 double-width; the rewrite's
  * two-bucket probe `{b, b-1}` still covers every in-band pair because
  * stepping a value down by ≤ widthMicros crosses at most one
  * truncation boundary.
  */
final case class GraftBandBucket(child: Expression, widthMicros: Long)
    extends UnaryExpression {
  require(widthMicros > 0, "widthMicros must be positive")

  override def prettyName: String = "graft_band_bucket"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a timestamp child, got ${t.sql}")
    }

  override def nullSafeEval(t: Any): Any = t.asInstanceOf[Long] / widthMicros

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"$t / ${widthMicros}L")

  override protected def withNewChildInternal(
      newChild: Expression): GraftBandBucket = copy(child = newChild)
}
