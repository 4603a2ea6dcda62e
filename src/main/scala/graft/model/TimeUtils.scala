package graft.model

import java.time.{Instant, LocalDateTime, ZoneId}
import java.time.format.DateTimeFormatter

/**
 * Duration / date parsing with the reference's semantics
 * (reference: src/utils/DateTime.java:57-240).
 *
 * Durations: `<amount><unit>` with units ms/s/m/h/d/w/n/y where
 * `n` = 30 days and `y` = 365 days (no calendar awareness), returning
 * milliseconds.
 *
 * Dates: relative `<duration>-ago`, `now`, absolute
 * `yyyy/MM/dd[-HH:mm[:ss]]` (space or dash), an explicit `<digits>ms`
 * epoch, or unix epoch auto-detected by string length (<= 10 chars is
 * seconds; a `\d{10}.\d{1,3}` dotted form concatenates to millis).
 */
object TimeUtils {

  /** Parse `5m`, `100ms`, `2w` ... → milliseconds. Reference-exact
    * (src/utils/DateTime.java parseDuration): zero/negative counts are
    * rejected, the unit is dispatched on the LAST character with `ms`
    * special-cased (so the reference's lenient "1min" = 1 month quirk
    * is preserved — users rely on it), and an overflow past
    * Long.MaxValue ms throws rather than wrapping. */
  def parseDuration(s: String): Long = {
    val t = s.trim
    require(t.nonEmpty, "Cannot parse null or empty duration")
    val digits = t.takeWhile(_.isDigit)
    require(digits.nonEmpty && digits.length < t.length,
      s"Invalid duration, must have an integer and unit: $s")
    val n = digits.toLong
    require(n > 0, s"Zero or negative duration: $s")
    val lower = t.toLowerCase
    if (lower.length >= 2 && lower.endsWith("s") &&
        lower.charAt(lower.length - 2) == 'm')
      return n // milliseconds verbatim ('m' at len-2 can't be a digit)
    val mult: Long = lower.last match {
      case 's' => 1000L
      case 'm' => 60000L
      case 'h' => 3600000L
      case 'd' => 86400000L
      case 'w' => 7L * 86400000L
      case 'n' => 30L * 86400000L // month = 30 days in the reference
      case 'y' => 365L * 86400000L
      case _ => throw new IllegalArgumentException(
        s"Invalid duration (suffix): $s")
    }
    require(n.toDouble * mult <= Long.MaxValue,
      s"Duration must be < Long.MAX_VALUE ms: $s")
    n * mult
  }

  /** Parse a start/end spec → epoch millis. `now` is injected for
    * determinism. Numeric semantics mirror the reference exactly
    * (src/utils/DateTime.java:76-165, golden-vectored from
    * test/utils/TestDateTime.java): an explicit `<digits>ms` suffix
    * is millis verbatim; a dotted epoch must match `\d{10}\.\d{1,3}`
    * and concatenates (NOT pads) its digits; otherwise the STRING
    * length decides — ≤10 chars is seconds (×1000), longer is millis
    * ("works until November 2286"). */
  def parseDateTime(s: String, now: Long = System.currentTimeMillis()): Long = {
    val t = s.trim
    if (t.matches("^[0-9]+ms$")) t.dropRight(2).toLong
    else if (t.equalsIgnoreCase("now")) now
    else if (t.toLowerCase.endsWith("-ago")) now - parseDuration(t.dropRight(4))
    else if (t.nonEmpty && t.forall(c => c.isDigit || c == '.')) {
      val time =
        if (t.contains('.')) {
          require(t.matches("^[0-9]{10}\\.[0-9]{1,3}$"),
            s"Invalid time: $s. Millisecond timestamps must be in the " +
              "format <seconds>.<ms> with the milliseconds limited to 3 digits")
          t.replace(".", "").toLong
        } else t.toLong
      if (t.length <= 10) time * 1000 else time
    } else {
      val fmts = Seq("yyyy/MM/dd-HH:mm:ss", "yyyy/MM/dd HH:mm:ss",
        "yyyy/MM/dd-HH:mm", "yyyy/MM/dd HH:mm", "yyyy/MM/dd")
      val zone = ZoneId.of("UTC")
      fmts.view.flatMap { f =>
        try {
          val fmt = DateTimeFormatter.ofPattern(f)
          val ldt =
            if (f.contains("HH")) LocalDateTime.parse(t, fmt)
            else java.time.LocalDate.parse(t, fmt).atStartOfDay()
          Some(ldt.atZone(zone).toInstant.toEpochMilli)
        } catch { case _: Exception => None }
      }.headOption.getOrElse(
        throw new IllegalArgumentException(s"unparseable date: $s"))
    }
  }

  def toInstant(ms: Long): Instant = Instant.ofEpochMilli(ms)
}
