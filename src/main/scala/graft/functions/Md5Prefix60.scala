package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the engine's portable hash: the first
 * 15 hex digits of md5(input) as a 60-bit long — bit-identical to
 * `conv(substring(md5(s), 1, 15), 16, 10)` but computed straight from
 * the digest bytes. The expression-chain form materializes a 32-char
 * hex string per row and re-parses 15 chars of it back to a long; this
 * folds 7.5 digest bytes directly, with whole-stage codegen calling
 * one static method. It sits in the hot path of every dedup pass
 * (one call per shingle occurrence — billions of calls at corpus
 * scale), which is what justifies a custom expression over built-ins.
 */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

/**
 * Content-defined chunk boundaries: 1-based character positions `i`
 * (width ≤ i ≤ length) where the portable 32-bit hash of the trailing
 * `width`-char window satisfies `h32 % modulus == 0` — the rolling-
 * fingerprint cut rule of storage-dedup chunking (Rabin/FastCDC
 * family), using the engine's md5-prefix hash so the DuckDB oracle
 * can replicate boundaries exactly. Native expression: the per-
 * position digest loop runs as one static method inside whole-stage
 * codegen instead of an interpreted higher-order filter.
 */
case class CdcBoundaries(child: Expression, width: Int, modulus: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.cdcBoundaries(input.asInstanceOf[UTF8String], width, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix60.cdcBoundaries($c, $width, $modulus)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

object CdcBoundaries {
  def apply(c: Column, width: Int, modulus: Int): Column =
    Bridge.column(new CdcBoundaries(Bridge.expression(c), width, modulus))
}

/**
 * All `width`-char windows of a string in ONE forward pass:
 * `[substr(1,w), substr(2,w), ..., substr(n-w+1,w)]`, or `[text]` when
 * the text is shorter than the window — exactly the array the
 * substr-per-position form builds, but O(chars) instead of O(chars²):
 * `substr(i, w)` re-scans the UTF-8 bytes from the string START to
 * find character i, so a transform over positions is quadratic on
 * long documents (the rolling-fingerprint analog of the interpreted-
 * lambda trap documented at TextAnalysis.bindOnce). One char-offset
 * walk here makes every window an O(width) byte slice.
 */
case class CharWindows(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "char_windows"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix60.charWindows(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Prefix60.charWindows($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): CharWindows =
    copy(child = newChild)
}

object CharWindows {
  def apply(c: Column, width: Int): Column =
    Bridge.column(new CharWindows(Bridge.expression(c), width))
}

/**
 * `java.lang.String.hashCode` of a string column — the hash the
 * reference addresses tree branches with (each path element contributes
 * `Bytes.fromInt(name.hashCode())` to the branch row key,
 * reference src/tree/Branch.java:268-307). Native expression so branch
 * lookups stay inside whole-stage codegen; exact UTF-16 semantics via
 * the JDK's own implementation.
 */
case class JavaHashCode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "java_hash_code"

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JavaHashCode =
    copy(child = newChild)
}

object JavaHashCode {
  def apply(c: Column): Column = Bridge.column(new JavaHashCode(Bridge.expression(c)))
}

object Md5Prefix60 {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 15 hex digits of md5 = bytes 0..6 big-endian (56 bits) plus
    * the high nibble of byte 7. Called from generated code. */
  def hash(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Column form. */
  def apply(c: Column): Column =
    Bridge.column(new Md5Prefix60(Bridge.expression(c)))

  /** First 15 hex digits of md5 over a byte window, no allocation
    * beyond the caller-provided 16-byte scratch buffer. */
  private def hashWindow(bytes: Array[Byte], off: Int, len: Int,
                         scratch: Array[Byte]): Long = {
    val digest = md.get()
    digest.reset()
    digest.update(bytes, off, len)
    digest.digest(scratch, 0, 16)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (scratch(i) & 0xffL); i += 1 }
    (v << 4) | ((scratch(7) & 0xf0L) >>> 4)
  }

  /** Called from generated code (CdcBoundaries). Positions are 1-based
    * character offsets; window = chars [i-width, i), mirrored verbatim
    * by the oracle's substr+md5 expression. ASCII input (the common
    * case — byte count == char count) digests raw byte windows with
    * ZERO per-position allocation; multi-byte text falls back to
    * char-correct substrings. */
  /** Byte length of the UTF-8 character starting at lead byte `b`
    * (only ever called on character-start bytes of valid UTF-8). */
  private def utf8CharLen(b: Byte): Int = {
    val u = b & 0xFF
    if (u < 0x80) 1 else if (u < 0xE0) 2 else if (u < 0xF0) 3 else 4
  }

  /** Called from generated code (CharWindows). One char-offset walk,
    * then each window is a byte-range slice — O(chars + windows·width)
    * total. Character semantics match substr/substringSQL (code-point
    * indexed, surrogate-safe). */
  def charWindows(s: UTF8String, width: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val nChars = s.numChars()
    if (nChars <= width)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](s))
    val bytes = s.getBytes
    // byte offset of each character start, plus the end sentinel
    val offs = new Array[Int](nChars + 1)
    var b = 0; var c = 0
    while (c < nChars) { offs(c) = b; b += utf8CharLen(bytes(b)); c += 1 }
    offs(nChars) = bytes.length
    val n = nChars - width + 1
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = UTF8String.fromBytes(bytes, offs(i),
        offs(i + width) - offs(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def cdcBoundaries(s: UTF8String, width: Int,
                    modulus: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val nChars = s.numChars()
    if (s.numBytes() == nChars) {
      val bytes = s.getBytes
      val scratch = new Array[Byte](16)
      var i = width
      while (i <= nChars) {
        val h = hashWindow(bytes, i - width, width, scratch)
        if ((h % 4294967296L) % modulus == 0) out += i
        i += 1
      }
    } else {
      // substringSQL is code-point indexed (1-based), matching the
      // documented character semantics even for non-BMP text, where
      // java.lang.String.substring (UTF-16 code units) would split
      // surrogate pairs and misalign windows.
      var i = width
      while (i <= nChars) {
        val window = s.substringSQL(i - width + 1, width)
        if ((hash(window) % 4294967296L) % modulus == 0) out += i
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}
