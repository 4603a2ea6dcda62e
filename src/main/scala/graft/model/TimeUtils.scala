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
    * determinism. */
  def parseDateTime(s: String, now: Long = System.currentTimeMillis()): Long = {
    val t = s.trim
    if (t.equalsIgnoreCase("now")) now
    else if (t.endsWith("-ago")) now - parseDuration(t.dropRight(4))
    else if (t.forall(c => c.isDigit || c == '.')) {
      // epoch: seconds, seconds.millis, or millis
      if (t.contains('.')) {
        val Array(sec, ms) = t.split("\\.", 2)
        sec.toLong * 1000 + ms.padTo(3, '0').take(3).toLong
      } else if (t.length >= 13) t.toLong
      else t.toLong * 1000
    } else {
      val fmts = Seq("yyyy/MM/dd-HH:mm:ss", "yyyy/MM/dd HH:mm:ss",
        "yyyy/MM/dd-HH:mm", "yyyy/MM/dd")
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
