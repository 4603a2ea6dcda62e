package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Optimizer rule: rewrite range predicates over an integral division by
 * a positive constant into range predicates over the raw column, so
 * they reach the parquet scan as PushedFilters.
 *
 * Motivation: the canonical points view derives epoch-millis as
 * `ts_nanos div 1000000` (parquet TIMESTAMP(NANOS) read as raw long).
 * A time filter `millis >= T` then sits above a Project and never
 * prunes row groups — at 100 TB the scan reads every file. With
 * truncation-toward-zero division t = a div k (k > 0) these rewrites
 * are exact equivalences over ALL longs (negative dividends included):
 *
 *   t >= b  (b >= 1)  ⇔  a >= b*k
 *   t >  b  (b >= 0)  ⇔  a >= (b+1)*k
 *   t <= b  (b >= 0)  ⇔  a <= (b+1)*k - 1
 *   t <  b  (b >= 1)  ⇔  a <= b*k - 1
 *
 * (For b outside those ranges, or multiplication overflow, the
 * predicate is left untouched.) The reference achieves the same
 * pruning by building the scan key range from the query time range
 * (TsdbQuery.getScanStartTimeSeconds, src/core/TsdbQuery.java:
 * 1575-1660); here it is a Catalyst rule so every operator benefits
 * with no per-call-site plumbing.
 */
object IntegralDivRangeRewrite extends Rule[LogicalPlan] {

  private def mulOk(x: Long, y: Long): Boolean = {
    val r = BigInt(x) * BigInt(y)
    r >= Long.MinValue && r <= Long.MaxValue
  }

  private object DivByPosConst {
    def unapply(e: Expression): Option[(Expression, Long)] = e match {
      case d: IntegralDivide if d.dataType == LongType => d.right match {
        case Literal(k: Long, LongType) if k > 0 => Some((d.left, k))
        case _ => None
      }
      case _ => None
    }
  }

  /** `unix_millis(t)` over a TimestampType column. Catalyst stores
    * timestamps as epoch-MICROS longs and UnixMillis is
    * floorDiv(micros, 1000), so with floor division the range
    * equivalences below are exact for ALL bounds (negatives included):
    *
    *   floorDiv(a,k) >= b ⇔ a >= b*k
    *   floorDiv(a,k) <= b ⇔ a <= (b+1)*k - 1
    *
    * Rewriting onto the raw timestamp column turns a derived-millis
    * time filter into a parquet timestamp PushedFilter. */
  private object MillisOfTimestamp {
    def unapply(e: Expression): Option[Expression] = e match {
      case UnixMillis(t) => t match {
        // strip an NTZ→LTZ cast so the rewritten predicate lands on the
        // bare column (a Cast blocks data-source filter translation);
        // the cast is a no-op exactly when the session zone is UTC, so
        // only rewrite then
        case Cast(a, TimestampType, _, _) if a.dataType == TimestampNTZType &&
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
              == "UTC" => Some(a)
        case _ if t.dataType == TimestampType => Some(t)
        case _ => None
      }
      case _ => None
    }
  }

  /** Literal in the matched column's own timestamp flavor (both store
    * epoch-micros longs internally; NTZ-as-UTC == LTZ under a UTC
    * session, which MillisOfTimestamp guarantees for the NTZ arm). */
  private def tsLit(micros: Long, like: Expression): Literal =
    Literal(micros, like.dataType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThanOrEqual(DivByPosConst(a, k), Literal(b: Long, LongType))
          if b >= 1 && mulOk(b, k) =>
        GreaterThanOrEqual(a, Literal(b * k, LongType))
      case GreaterThan(DivByPosConst(a, k), Literal(b: Long, LongType))
          if b >= 0 && mulOk(b + 1, k) =>
        GreaterThanOrEqual(a, Literal((b + 1) * k, LongType))
      case LessThanOrEqual(DivByPosConst(a, k), Literal(b: Long, LongType))
          if b >= 0 && mulOk(b + 1, k) =>
        LessThanOrEqual(a, Literal((b + 1) * k - 1, LongType))
      case LessThan(DivByPosConst(a, k), Literal(b: Long, LongType))
          if b >= 1 && mulOk(b, k) =>
        LessThanOrEqual(a, Literal(b * k - 1, LongType))

      case GreaterThanOrEqual(MillisOfTimestamp(t), Literal(b: Long, LongType))
          if mulOk(b, 1000L) =>
        GreaterThanOrEqual(t, tsLit(b * 1000L, t))
      case GreaterThan(MillisOfTimestamp(t), Literal(b: Long, LongType))
          if mulOk(b + 1, 1000L) =>
        GreaterThanOrEqual(t, tsLit((b + 1) * 1000L, t))
      case LessThanOrEqual(MillisOfTimestamp(t), Literal(b: Long, LongType))
          if mulOk(b + 1, 1000L) =>
        LessThanOrEqual(t, tsLit((b + 1) * 1000L - 1, t))
      case LessThan(MillisOfTimestamp(t), Literal(b: Long, LongType))
          if mulOk(b, 1000L) =>
        LessThanOrEqual(t, tsLit(b * 1000L - 1, t))
    }
}

/** Session extension entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Injects the pushdown rule and registers the engine's native SQL
  * functions (`SELECT md5_prefix60(s)` works in spark.sql). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => IntegralDivRangeRewrite)
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("md5_prefix60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.Md5Prefix60].getName, "md5_prefix60"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(args.length == 1, "md5_prefix60 takes one argument")
        graft.functions.Md5Prefix60(args.head)
      }))
  }
}
