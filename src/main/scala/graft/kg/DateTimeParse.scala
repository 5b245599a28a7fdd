package graft.kg

import java.util.regex.{Matcher, Pattern}

/** Date/time string parsing with the reference's exact regex bank and
  * priority order (reference dateTimeParser.py:23-156). The regexes are
  * order-sensitive first-match; a calendar error (bad month name / day out of
  * range) moves to the NEXT regex, not the next match.
  */
object DateTimeParse {

  /** tz kept as signed minutes = h*60 + m with h signed, m unsigned — this is
    * what timedelta(hours=h, minutes=m) yields in the reference
    * (dateTimeParser.py:38), including the quirk that "UTC-3:30" means
    * -3h +30m = -150 minutes.
    */
  case class KTime(hour: Int, minute: Int, tzMin: Option[Int]) {
    /** Python str(time): "HH:MM:SS[+HH:MM]" (seconds always shown; tz offset
      * from a timedelta formats as ±HH:MM).
      */
    def pyStr: String = f"$hour%02d:$minute%02d:00${KTime.tzSuffix(tzMin)}"
  }
  object KTime {
    def tzSuffix(tzMin: Option[Int]): String = tzMin match {
      case None => ""
      case Some(m) =>
        val sign = if (m < 0) "-" else "+"
        val a = math.abs(m)
        f"$sign${a / 60}%02d:${a % 60}%02d"
    }
  }

  case class TimeDict(start: KTime, end: Option[KTime])

  case class KDateTime(y: Int, mo: Int, d: Int, h: Int = 0, mi: Int = 0, tzMin: Option[Int] = None) {
    def withTime(hour: Int, minute: Int): KDateTime = copy(h = hour, mi = minute)
    def withTz(tz: Option[Int]): KDateTime = copy(tzMin = tz)
    def hasTime: Boolean = h != 0 && mi != 0 // reference outputRdf.py:215-220
    /** Python str(datetime): "yyyy-MM-dd HH:MM:SS[+HH:MM]". */
    def pyStr: String = f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:00${KTime.tzSuffix(tzMin)}"
    /** Python datetime.isoformat(): "yyyy-MM-ddTHH:MM:SS[+HH:MM]". */
    def isoformat: String = f"$y%04d-$mo%02d-$d%02d" + "T" + f"$h%02d:$mi%02d:00${KTime.tzSuffix(tzMin)}"
  }

  case class DateDict(date: Option[KDateTime], until: Option[KDateTime], ongoing: Boolean)

  private val months = Array("january", "february", "march", "april", "may", "june",
    "july", "august", "september", "october", "november", "december")

  private val tzRe = Pattern.compile("""UTC(?<h>[+-]\d\d?)(?::(?<m>\d\d))?""")

  private val timeRe = Pattern.compile(
    """(?<hs>\d\d?):(?<ms>\d\d)\s*((?<ams>[aA].?[mM].?)|(?<pms>[pP].?[mM].?))?""" +
      """(\s*(-|and|to)\s*""" +
      """(?<he>\d\d?):(?<me>\d\d)\s*((?<ame>[aA].?[mM].?)|(?<pme>[pP].?[mM].?))?""" +
      """)?""")

  private def conv12to24(h: Int, pm: Boolean): Int =
    if (pm) { if (h != 12) h + 12 else h }
    else { if (h == 12) 0 else h }

  /** reference parseTimes (dateTimeParser.py:23-64). */
  def parseTimes(value: String): Option[TimeDict] = {
    val tzM = tzRe.matcher(value)
    val tz: Option[Int] =
      if (tzM.find()) {
        val h = tzM.group("h").toInt // sign included
        val m = Option(tzM.group("m")).map(_.toInt).getOrElse(0)
        Some(h * 60 + m)
      } else None

    val m = timeRe.matcher(value)
    if (m.find()) {
      def bound(x: String): Option[KTime] = {
        val h = m.group("h" + x)
        val mi = m.group("m" + x)
        if (h != null && mi != null) {
          var hh = h.toInt
          val am = m.group("am" + x)
          val pm = m.group("pm" + x)
          if (am != null || pm != null) hh = conv12to24(hh, pm != null)
          Some(KTime(hh, mi.toInt, tz))
        } else None
      }
      val start = bound("s")
      // reference asserts start present; the regex guarantees hs/ms on match
      start.map(st => TimeDict(st, bound("e")))
    } else None
  }

  /** One compiled date pattern + which optional groups it defines. */
  private case class DateRe(p: Pattern, hasDay2: Boolean, hasMon2: Boolean,
      hasYear2: Boolean, hasOn: Boolean)

  private val dateRes: Seq[DateRe] = {
    val to = """\s*(?:-|until|to)\s*"""
    val ongoing = """(?<on>([Pp]resent|[Oo]ngoing))"""
    val day = """(?<day>\d\d?)"""
    val day2 = """(?<day2>\d\d?)"""
    val month = """(?<mon>\w{3,9})"""
    val month2 = """(?<mon2>\w{3,9})"""
    val year = """(?<year>\d{2,4})"""
    val year2 = """(?<year2>\d{2,4})"""

    val dm = day + """\s+""" + month
    val dmy = dm + """\s+""" + year
    val dmyOn = dmy + to + ongoing
    val ddmy = day + to + day2 + """\s+""" + month + """\s+""" + year
    val dmdmy = dm + to + day2 + """\s+""" + month2 + """\s+""" + year
    val dmydmy = dmy + to + day2 + """\s+""" + month2 + """\s+""" + year2

    val md = month + """\s*(?:/|\s)\s*""" + day
    val mdy = md + """\s*[/,]\s*""" + year
    val mdyOn = mdy + to + ongoing
    val mddy = md + to + day2 + """\s*[/,]\s*""" + year
    val mdmdy = md + to + month2 + """\s*""" + day2 + """\s*[/,]\s*""" + year
    val mdymdy = mdy + to + month2 + """\s*(?:/|\s)\s*""" + day2 + """\s*[/,]\s*""" + year2

    def re(s: String, d2: Boolean = false, m2: Boolean = false, y2: Boolean = false,
        on: Boolean = false) =
      DateRe(Pattern.compile(s, Pattern.UNICODE_CHARACTER_CLASS), d2, m2, y2, on)

    // priority order per dateTimeParser.py:155-156
    Seq(
      re(mdymdy, d2 = true, m2 = true, y2 = true),
      re(dmydmy, d2 = true, m2 = true, y2 = true),
      re(mdmdy, d2 = true, m2 = true),
      re(dmdmy, d2 = true, m2 = true),
      re(mddy, d2 = true),
      re(ddmy, d2 = true),
      re(mdyOn, on = true),
      re(dmyOn, on = true),
      re(mdy),
      re(dmy))
  }

  private def monthIndex(name: String): Option[Int] = {
    val i = months.indexOf(name.toLowerCase)
    if (i < 0) None else Some(i + 1)
  }

  private def validDate(y: Int, mo: Int, d: Int): Boolean =
    try { java.time.LocalDate.of(y, mo, d); y >= 1 } catch { case _: Exception => false }

  /** reference parseDates (dateTimeParser.py:67-121). The broken timeDict
    * branch (undefined startTime/endTime NameError) is dead code in the
    * reference — callers never pass timeDict — so only the date path exists.
    */
  def parseDates(value: String): DateDict = {
    for (r <- dateRes) {
      val m = r.p.matcher(value)
      if (m.find()) {
        val parsed: Option[DateDict] = for {
          mon <- monthIndex(m.group("mon"))
          year = m.group("year").toInt
          dayN = m.group("day").toInt
          if validDate(year, mon, dayN)
          date = KDateTime(year, mon, dayN)
          res <- {
            if (r.hasDay2) {
              val mon2Opt = if (r.hasMon2) monthIndex(m.group("mon2")) else Some(mon)
              mon2Opt match {
                case None => None // bad month name → next regex (continue)
                case Some(mon2) =>
                  val year2 = if (r.hasYear2) m.group("year2").toInt else year
                  val day2 = m.group("day2").toInt
                  if (!validDate(year2, mon2, day2)) None
                  else Some(DateDict(Some(date), Some(KDateTime(year2, mon2, day2)), ongoing = false))
              }
            } else if (r.hasOn && m.group("on") != null) {
              Some(DateDict(Some(date), None, ongoing = true))
            } else {
              Some(DateDict(Some(date), None, ongoing = false))
            }
          }
        } yield res
        parsed match {
          case Some(dd) => return dd
          case None => () // ValueError path: try next regex
        }
      }
    }
    DateDict(None, None, ongoing = false)
  }

  /** en-dash/minus → '-' (reference articleExtractor.py:383,404). */
  def normalizeDashes(s: String): String = s.replaceAll("[–−]", "-")

  /** Microformat yyyy-MM-dd anywhere (reference articleExtractor.py:335-343). */
  private val mfRe = Pattern.compile("""(?<y>[0-9]{4})-(?<m>[0-9]{2})-(?<d>[0-9]{2})""")
  def parseMicroformat(s: String): Option[KDateTime] = {
    val m = mfRe.matcher(s)
    if (m.find()) Some(KDateTime(m.group("y").toInt, m.group("m").toInt, m.group("d").toInt))
    else None
  }

  /** DMS → signed decimal degrees (reference articleExtractor.py:588-609). */
  def dms2dd(dms: String): Double = {
    val parts = dms.split("[°′″]", -1)
    val (deg, min, sec, dir) = parts.length match {
      case 2 => (parts(0), "0", "0", parts(1))
      case 3 => (parts(0), parts(1), "0", parts(2))
      case 4 => (parts(0), parts(1), parts(2), parts(3))
      case _ => throw new IllegalArgumentException(s"bad DMS: $dms")
    }
    def f(s: String) = s.replace(",", ".").toDouble
    (f(deg) + f(min) / 60.0 + f(sec) / 3600.0) * (if (dir == "W" || dir == "S") -1 else 1)
  }
}
