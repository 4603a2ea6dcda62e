package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/**
 * Static kernels for the bounded-memory sketch family
 * ([[graft.pipeline.Sketches]]): HyperLogLog register ranks, Bloom bit
 * probes, Count-Min counter probes. All index math is derived from the
 * engine's portable 60-bit md5-prefix hash with the two-hash
 * (Kirsch–Mitzenmacher) scheme on power-of-two tables, so the DuckDB
 * oracle can replicate every bit position with plain integer SQL:
 *
 *   h1 = h mod width, h2 = ((h div width) mod width) | 1  (odd stride)
 *   pos_i = (h1 + i * h2) mod width                       (i = 0..k-1)
 */
object SketchOps {

  /** HLL rank of the 52-bit remainder after the 8-bit register index
    * is consumed: 1 + leading zeros within the 52-bit window, i.e.
    * 53 - bitLength(w); all-zero remainder ranks 53. */
  def hllRank(h: Long): Int = {
    val w = h >>> 8
    if (w == 0L) 53 else 53 - (64 - java.lang.Long.numberOfLeadingZeros(w))
  }

  /** HLL register index: low 8 bits (m = 256). */
  def hllRegister(h: Long): Int = (h & 255L).toInt

  private def pos(h: Long, i: Int, width: Int): Int = {
    val mask = (width - 1).toLong
    val h1 = h & mask
    val h2 = ((h >>> java.lang.Integer.numberOfTrailingZeros(width)) & mask) | 1L
    ((h1 + i * h2) & mask).toInt
  }

  /** Set the k derived bit positions of hash `h` in `bits`. */
  def bloomSet(bits: Array[Byte], h: Long, mBits: Int, k: Int): Unit = {
    var i = 0
    while (i < k) {
      val p = pos(h, i, mBits)
      bits(p >>> 3) = (bits(p >>> 3) | (1 << (p & 7))).toByte
      i += 1
    }
  }

  /** True iff all k derived bit positions of hash `h` are set. */
  def bloomHit(h: Long, bits: Array[Byte], mBits: Int, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = pos(h, i, mBits)
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Add one occurrence of hash `h` to the depth×width counter grid. */
  def cmsAdd(counters: Array[Long], h: Long, width: Int, depth: Int): Unit = {
    var i = 0
    while (i < depth) {
      counters(i * width + pos(h, i, width)) += 1L
      i += 1
    }
  }

  /** Point estimate: min over rows of the counter at `h`'s position. */
  def cmsMin(h: Long, counters: Array[Long], width: Int, depth: Int): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters(i * width + pos(h, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }
}

/**
 * Bloom membership probe as a native expression: the frozen filter (an
 * 8 KB bitset for mBits = 2^16) rides into whole-stage codegen as a
 * referenced object, so screening a 100 TB corpus against it is a
 * plain projection — no join, no shuffle, no per-row virtual call.
 * This is the bounded-memory counterpart of the exact broadcast
 * semi-join in `Dedup.decontaminateFromPostings`: the filter size is
 * fixed by construction no matter how large the eval set grows (the
 * trade is a quantified false-positive rate, never a false negative).
 */
case class BloomHit(child: Expression, bits: Array[Byte], mBits: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_hit"

  override protected def nullSafeEval(input: Any): Any =
    SketchOps.bloomHit(input.asInstanceOf[Long], bits, mBits, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchOps.bloomHit($c, $ref, $mBits, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHit =
    copy(child = newChild)
}

/**
 * Count-Min point estimate as a native expression: the frozen counter
 * grid (64 KB at 4×2048 longs) is a codegen reference object, so
 * frequency estimation over an unbounded token stream is a projection
 * against fixed state — the sketch never grows with the vocabulary,
 * unlike the exact `groupBy(token).count()` it stands in for.
 */
case class CmsEstimate(child: Expression, counters: Array[Long],
                       width: Int, depth: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(input: Any): Any =
    SketchOps.cmsMin(input.asInstanceOf[Long], counters, width, depth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsCounters", counters, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchOps.cmsMin($c, $ref, $width, $depth)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}
