package graft.core

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneId}
import java.util.Locale

/** Epoch-millis → formatted-string, with the reference's named formats.
  *
  * Reference: src/com/blackberry/logdriver/pig/DateFormatter.java:30-51 (which
  * uses commons-lang `FastDateFormat`). Pattern compatibility notes:
  *   - FastDateFormat `ZZ` (colon offset, `+00:00`) → java.time `xxx`
  *   - FastDateFormat `Z`  (`+0000`)               → java.time `xx`
  * both rewritten here outside quoted literal sections; the remaining pattern
  * letters used by the reference (y M d H m s S) are identical in java.time.
  *
  * Serializable wrapper because [[DateTimeFormatter]] itself is not.
  */
final class LogDateFormat(val pattern: String, val zoneId: String) extends Serializable {
  @transient private lazy val formatter: DateTimeFormatter =
    DateTimeFormatter
      .ofPattern(LogDateFormat.translatePattern(pattern), Locale.ROOT)
      .withZone(ZoneId.of(zoneId))

  def format(epochMs: Long): String = formatter.format(Instant.ofEpochMilli(epochMs))
}

object LogDateFormat {
  // DateFormatter.java:30-34
  val Rfc822Pattern = "yyyy-MM-dd'T'HH:mm:ss.SSSZ"
  val Rfc822SecUtcPattern = "yyyy-MM-dd'T'HH:mm:ss'Z'"
  val Rfc3164Pattern = "MMM dd HH:mm:ss" // day zero-padded, like the reference
  val Rfc5424Pattern = "yyyy-MM-dd'T'HH:mm:ss.SSSZZ"

  /** Resolve a format name (RFC822 | RFC822_SEC_UTC | RFC3164 | RFC5424,
    * case-insensitive) or treat the string as a raw pattern
    * (DateFormatter.java:38-51).
    */
  def resolvePattern(nameOrPattern: String): String =
    nameOrPattern.toUpperCase(Locale.ROOT) match {
      case "RFC822" => Rfc822Pattern
      case "RFC822_SEC_UTC" => Rfc822SecUtcPattern
      case "RFC3164" => Rfc3164Pattern
      case "RFC5424" => Rfc5424Pattern
      case _ => nameOrPattern
    }

  def apply(nameOrPattern: String, zoneId: String = "UTC"): LogDateFormat =
    new LogDateFormat(resolvePattern(nameOrPattern), zoneId)

  /** Rewrite FastDateFormat zone tokens to java.time equivalents, leaving
    * single-quoted literal sections untouched.
    */
  private[core] def translatePattern(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    var inQuote = false
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\'') { inQuote = !inQuote; sb.append(c); i += 1 }
      else if (!inQuote && c == 'Z') {
        var n = 0
        while (i < p.length && p.charAt(i) == 'Z') { n += 1; i += 1 }
        sb.append(if (n >= 2) "xxx" else "xx")
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
