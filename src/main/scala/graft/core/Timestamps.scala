package graft.core

import java.time.{Instant, LocalDate, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/**
 * Timestamp parsing for CLI/batch arguments.
 *
 * Accepts unix-seconds integer, `yyyy-MM-dd`, or RFC3339; normalized to UTC
 * (reference `internal/app/timestamp.go:30-48`).
 */
object Timestamps {
  def parse(s: String): Either[String, Instant] = {
    val t = s.trim
    if (t.isEmpty) Left("empty timestamp")
    else if (t.matches("^-?\\d+$"))
      try Right(Instant.ofEpochSecond(t.toLong))
      catch { case _: Exception => Left(s"invalid unix timestamp: $s") }
    else
      try Right(LocalDate.parse(t, DateTimeFormatter.ISO_LOCAL_DATE)
        .atStartOfDay(ZoneOffset.UTC).toInstant)
      catch {
        case _: Exception =>
          try Right(OffsetDateTime.parse(t, DateTimeFormatter.ISO_OFFSET_DATE_TIME).toInstant)
          catch { case _: Exception => Left(s"could not parse timestamp: $s") }
      }
  }

  def unixSeconds(i: Instant): Long = i.getEpochSecond
}
