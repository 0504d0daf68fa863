package graft.core

import java.time.{LocalDate, LocalDateTime, ZoneOffset}

/** Splits a raw log line into (timestamp-string, rest) and parses the
  * timestamp to epoch millis.
  *
  * Reference semantics: src/com/blackberry/logdriver/timestamp/TimestampParser.java:24-48.
  * All parsing here is pinned to UTC (the engine stores epoch millis; the
  * reference corrected SimpleDateFormat's local-TZ parse back out, which is a
  * no-op under UTC — Rfc5424TimestampParser.java:144-153).
  */
trait TimestampParser extends Serializable {
  /** (timestampString | null, rest-of-line). */
  def splitLine(line: String): (String, String)

  /** Epoch millis; throws IllegalArgumentException on malformed input. */
  def parseTimestamp(ts: String): Long

  def tryParse(ts: String): Option[Long] =
    try Option(parseTimestamp(ts)) catch { case _: Exception => None }
}

/** RFC5424-style `yyyy-MM-ddTHH:mm:ss[.frac](Z|±hh:mm)` parser.
  *
  * Reference: src/com/blackberry/logdriver/timestamp/Rfc5424TimestampParser.java:56-155.
  * Notable reference behaviors replicated exactly:
  *   - fractional seconds: first three digits contribute (100/10/1 ms),
  *     further digits are consumed and discarded;
  *   - offset must be `Z` or `±hh:mm`;
  *   - `+hh:mm` subtracts, `-hh:mm` adds.
  */
class Rfc5424TimestampParser extends TimestampParser {

  override def splitLine(line: String): (String, String) = {
    val i = line.indexOf(' ')
    if (i < 0) (null, line)
    else (line.substring(0, i), line.substring(i + 1))
  }

  override def parseTimestamp(ts: String): Long = {
    try {
      // yyyy-MM-ddTHH:mm:ss — fixed 19-char prefix.
      val year = ts.substring(0, 4).toInt
      val month = ts.substring(5, 7).toInt
      val day = ts.substring(8, 10).toInt
      val hour = ts.substring(11, 13).toInt
      val minute = ts.substring(14, 16).toInt
      val second = ts.substring(17, 19).toInt
      var time = LocalDateTime.of(year, month, day, hour, minute, second)
        .toEpochSecond(ZoneOffset.UTC) * 1000L

      var i = 19
      var c = ts.charAt(i)
      if (c == '.') {
        // Up to 3 fractional digits count; the rest are skipped. The
        // FIRST fractional char must be a digit like the other two —
        // getNumericValue('a') is 10, so an unguarded read would credit a
        // letter with a whole second AND make detect() lock a malformed
        // first line in as valid RFC5424 for the whole partition.
        i += 1
        c = ts.charAt(i)
        if (!Character.isDigit(c))
          throw new IllegalArgumentException(
            s"bad fractional seconds in: $ts")
        time += 100L * Character.getNumericValue(c)
        i += 1
        c = ts.charAt(i)
        if (Character.isDigit(c)) {
          time += 10L * Character.getNumericValue(c)
          i += 1
          c = ts.charAt(i)
          if (Character.isDigit(c)) {
            time += Character.getNumericValue(c)
            i += 1
            c = ts.charAt(i)
            while (Character.isDigit(c)) { i += 1; c = ts.charAt(i) }
          }
        }
      }

      if (c != 'Z') {
        val positive = c match {
          case '+' => true
          case '-' => false
          case _ => throw new IllegalArgumentException("Malformed date:" + ts)
        }
        i += 1
        val offHour = ts.substring(i, i + 2).toInt
        i += 2
        if (ts.charAt(i) != ':')
          throw new IllegalArgumentException("Malformed date:" + ts)
        i += 1
        val offMin = ts.substring(i, i + 2).toInt
        val offset = (60 * offHour + offMin) * 60L * 1000L
        if (positive) time -= offset else time += offset
      }
      time
    } catch {
      case e: IllegalArgumentException => throw e
      case t: Throwable =>
        throw new IllegalArgumentException("Malformed date:" + ts, t)
    }
  }
}

/** RFC3164 (syslog) `MMM dd HH:mm:ss` parser; the year is inferred from a
  * supplied clock with Dec-31/Jan-1 rollover correction in both directions.
  *
  * Reference: src/com/blackberry/logdriver/timestamp/Rfc3164TimestampParser.java:30-85.
  * Lenient like the reference's SimpleDateFormat: out-of-range day-of-month
  * overflows into the next month (e.g. `Feb 30` in 2013 → Mar 2).
  *
  * @param nowMs injectable clock (epoch ms) used for year inference — fixed
  *              in tests, `System.currentTimeMillis()` in production.
  */
class Rfc3164TimestampParser(nowMs: () => Long = () => System.currentTimeMillis())
    extends TimestampParser {

  private val months = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  override def splitLine(line: String): (String, String) = {
    // Fixed 15-char prefix; char 15 (the separator) is dropped unconditionally
    // (Rfc3164TimestampParser.java:36-46).
    if (line.length >= 16) (line.substring(0, 15), line.substring(16))
    else (null, line)
  }

  override def parseTimestamp(ts: String): Long = {
    if (ts == null) throw new IllegalArgumentException("Timestamp is null")
    try {
      val monthName = ts.substring(0, 3)
      val month = months.indexOf(monthName) match {
        case -1 => throw new IllegalArgumentException("Bad month: " + monthName)
        case m => m + 1
      }
      val day = ts.substring(4, 6).trim.toInt
      val hour = ts.substring(7, 9).toInt
      val minute = ts.substring(10, 12).toInt
      val second = ts.substring(13, 15).toInt

      val now = LocalDateTime.ofEpochSecond(nowMs() / 1000L, 0, ZoneOffset.UTC)
      val currentYear = now.getYear
      // Lenient day arithmetic (SimpleDateFormat-style overflow).
      var date = LocalDate.of(currentYear, month, 1).plusDays(day - 1L)
      var dt = date.atStartOfDay
        .plusHours(hour.toLong).plusMinutes(minute.toLong).plusSeconds(second.toLong)

      // Dec-31 log seen on Jan-1 → belongs to last year; Jan-1 log seen on
      // Dec-31 (clock skew) → belongs to next year.
      if (dt.getMonthValue == 12 && dt.getDayOfMonth == 31 &&
          now.getMonthValue == 1 && now.getDayOfMonth == 1) {
        dt = dt.minusYears(1)
      } else if (now.getMonthValue == 12 && now.getDayOfMonth == 31 &&
          dt.getMonthValue == 1 && dt.getDayOfMonth == 1) {
        dt = dt.plusYears(1)
      }
      dt.toEpochSecond(ZoneOffset.UTC) * 1000L
    } catch {
      case e: IllegalArgumentException => throw e
      case t: Throwable =>
        throw new IllegalArgumentException("Malformed date:" + ts, t)
    }
  }
}

object TimestampParsers {
  val Rfc5424 = "RFC5424"
  val Rfc3164 = "RFC3164"

  def forName(name: String, nowMs: () => Long = () => System.currentTimeMillis()): TimestampParser =
    name.toUpperCase match {
      case Rfc5424 => new Rfc5424TimestampParser
      case Rfc3164 => new Rfc3164TimestampParser(nowMs)
      case other => throw new IllegalArgumentException(s"Unknown parser: $other")
    }

  /** Auto-detect the parser from a sample line: try 5424, then 3164
    * (reference: pig/TextToBoomConverter.java:54-80).
    */
  def detect(line: String, nowMs: () => Long = () => System.currentTimeMillis()): Option[TimestampParser] = {
    val p5424 = new Rfc5424TimestampParser
    val s5424 = p5424.splitLine(line)
    if (s5424._1 != null && p5424.tryParse(s5424._1).isDefined) return Some(p5424)
    val p3164 = new Rfc3164TimestampParser(nowMs)
    val s3164 = p3164.splitLine(line)
    if (s3164._1 != null && p3164.tryParse(s3164._1).isDefined) return Some(p3164)
    None
  }
}
