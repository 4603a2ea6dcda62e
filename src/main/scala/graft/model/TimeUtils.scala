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
 * `yyyy/MM/dd[-HH:mm[:ss]]`, or unix epoch in seconds or millis
 * (auto-detected: >= 13 digits, or a 10+-digit value with `.` ms
 * separator).
 */
object TimeUtils {

  private val unitMs: Map[String, Long] = Map(
    "ms" -> 1L,
    "s" -> 1000L,
    "m" -> 60L * 1000,
    "h" -> 3600L * 1000,
    "d" -> 86400L * 1000,
    "w" -> 7L * 86400 * 1000,
    "n" -> 30L * 86400 * 1000, // month = 30 days in the reference
    "y" -> 365L * 86400 * 1000
  )

  /** Parse `5m`, `100ms`, `2w` ... → milliseconds. */
  def parseDuration(s: String): Long = {
    val t = s.trim
    require(t.nonEmpty, "empty duration")
    val (digits, unit) = t.span(c => c.isDigit)
    require(digits.nonEmpty, s"invalid duration: $s")
    val u = unit.toLowerCase
    unitMs.get(u) match {
      case Some(ms) => digits.toLong * ms
      case None => throw new IllegalArgumentException(s"unknown duration unit '$unit' in $s")
    }
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
