package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expressions for the ANN hot path: dot product and L2
 * norm over `array<float>` columns, accumulated in double in index
 * order — bit-identical to both the interpreted
 * `aggregate`/`zip_with` fold and the unrolled `getItem` chain they
 * replace (IEEE: 0.0 + t0 == t0, then strictly left-to-right).
 *
 * Why a custom expression (the brief's preference ladder, option b):
 * higher-order functions never enter whole-stage codegen, so on a
 * verify stage touching millions of candidate pairs the lambda
 * interpreter dominates; the unrolled chain fixes that but compiles
 * O(tables × dim) Janino terms (~9 s measured at 3×6×64), so the old
 * code had to pick a regime from the optimizer's size estimate. One
 * tight static loop costs neither: constant codegen size, scalar JIT
 * loop at runtime, no regime switch to reason about.
 */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f32 expects array<float> inputs, got $l / $r")
    }

  // Null on length mismatch, matching the aggregate/zip_with fold this
  // expression replaces (zip_with pads the shorter side with nulls, so
  // the fold null-propagates): a wrong-dimension vector must surface
  // as null, not a plausible partial dot product.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[ArrayData]
    val r = b.asInstanceOf[ArrayData]
    if (l.numElements() != r.numElements()) null
    else VectorMath.dot(l, r)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |if ($a.numElements() != $b.numElements()) {
      |  ${ev.isNull} = true;
      |} else {
      |  ${ev.value} = graft.functions.VectorMath.dot($a, $b);
      |}
      |""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

case class NormF32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm_f32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"norm_f32 expects array<float> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    VectorMath.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorMath.norm($a)")

  override protected def withNewChildInternal(newChild: Expression): NormF32 =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket id as a native expression: nBits
  * sign-dots against deterministic ±1 pseudo-hyperplanes
  * (graft.pipeline.Similarity.rhpSign), accumulated in index order —
  * bit-identical to both the zip_with-fold and unrolled column forms
  * (x·(+1.0) == x and x·(−1.0) == −x are exact in IEEE). Removes the
  * last compile-size-vs-eval-speed regime switch from the embedding
  * blocking path. */
case class RhpBucketF32(child: Expression, nBits: Int, dim: Int,
                        planeOffset: Int) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rhp_bucket_f32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rhp_bucket_f32 expects array<float> input, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    VectorMath.rhpBucket(a.asInstanceOf[ArrayData], nBits, dim, planeOffset)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorMath.rhpBucket($a, $nBits, $dim, $planeOffset)")

  override protected def withNewChildInternal(newChild: Expression): RhpBucketF32 =
    copy(child = newChild)
}

/** Nearest-centroid assignment as a native expression: argmin over
  * the rounded squared L2 distances to a driver-held centroid matrix,
  * ties to the lowest centroid id — the exact semantics of the
  * rounded-distance `array_min(struct(d, i))` column form it replaces
  * (same index-order accumulation, same `floor(d·1e6 + 0.5)/1e6`
  * rounding, strict `<` keeps the first = lowest id). The k
  * interpreted zip_with distance folds become one tight k×dim double
  * loop inside whole-stage codegen; the matrix rides as a codegen
  * reference object, not k literal subtrees. Accepts float vectors
  * (raw embeddings, subvector slices) and double vectors (residuals).
  * `cents` is Seq-shaped for structural plan equality. */
case class ArgminDistF(child: Expression, cents: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "argmin_dist"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"argmin_dist expects array<float|double> input, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val centsArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override protected def nullSafeEval(a: Any): Any =
    VectorMath.argminDist(a.asInstanceOf[ArrayData], centsArr, isFloat)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", centsArr, "double[][]")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorMath.argminDist($a, $ref, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): ArgminDistF =
    copy(child = newChild)
}

object VectorMath {

  /** Called from generated code. Index-order accumulation in double. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  /** Called from generated code. sqrt of the index-order square sum. */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  /** Called from generated code. Sign constants and accumulation order
    * replicate Similarity.rhpSign / rhpBucket exactly. */
  def rhpBucket(a: ArrayData, nBits: Int, dim: Int, planeOffset: Int): Long = {
    val n = math.min(dim, a.numElements())
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      val p = planeOffset + b
      var s = 0.0
      var j = 0
      while (j < n) {
        val x = a.getFloat(j).toDouble
        s += (if (((p * 1103515245L + j * 12345L) >> 16) % 2 == 0) x else -x)
        j += 1
      }
      if (s >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** Called from generated code. Distances accumulate in index order,
    * round to 1e-6 BEFORE the comparison (the cross-engine fp-noise
    * guard shared with the column form and the DuckDB oracle), and
    * strict `<` keeps the first minimum = lowest centroid id. */
  def argminDist(a: ArrayData, cents: Array[Array[Double]],
                 isFloat: Boolean): Int = {
    var best = -1
    var bestD = Double.PositiveInfinity
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val n = math.min(c.length, a.numElements())
      var d = 0.0
      var j = 0
      while (j < n) {
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        val t = x - c(j)
        d += t * t
        j += 1
      }
      val r = math.floor(d * 1e6 + 0.5) / 1e6
      if (r < bestD) { bestD = r; best = i }
      i += 1
    }
    best
  }

  /** Column forms. */
  def dotCol(a: Column, b: Column): Column =
    Bridge.column(new DotF32(Bridge.expression(a), Bridge.expression(b)))
  def normCol(a: Column): Column =
    Bridge.column(new NormF32(Bridge.expression(a)))
  def rhpBucketCol(a: Column, nBits: Int, dim: Int, planeOffset: Int): Column =
    Bridge.column(new RhpBucketF32(Bridge.expression(a), nBits, dim, planeOffset))
  def argminDistCol(a: Column, cents: Seq[Seq[Double]]): Column =
    Bridge.column(new ArgminDistF(Bridge.expression(a), cents))
}
