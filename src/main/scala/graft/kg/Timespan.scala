package graft.kg

import DateTimeParse._

/** Timespan slot-filling for topic articles — a faithful port of the
  * imperative, order-dependent logic in reference outputRdf.py:195-329
  * (SURVEY.md §7 hard part 4). Runs in-row at emit time.
  */
object Timespan {

  case class Result(
      uri: String,
      label: String,
      startDate: Option[KDateTime],
      endDate: Option[KDateTime],
      ongoing: Boolean,
      startTime: Option[KTime],
      endTime: Option[KTime])


  /** Python str(timezone(timedelta)): "UTC" for zero offset else "UTC±HH:MM". */
  def tzName(tzMin: Int): String =
    if (tzMin == 0) "UTC" else "UTC" + KTime.tzSuffix(Some(tzMin))

  def build(
      microDtstart: Option[String], // yyyy-MM-dd
      microDtend: Option[String],
      dateRows: Seq[IbDateRow],
      timeRows: Seq[IbTimeRow]): Option[Result] = {

    def parseYmd(s: String): KDateTime =
      KDateTime(s.substring(0, 4).toInt, s.substring(5, 7).toInt, s.substring(8, 10).toInt)

    var startDate: Option[KDateTime] = None
    var endDate: Option[KDateTime] = None
    var startTime: Option[KTime] = None
    var endTime: Option[KTime] = None
    var ongoing = false
    var tz: Option[Int] = None
    val label = new StringBuilder

    microDtstart.foreach { v =>
      startDate = Some(parseYmd(v))
      label ++= s"dtstart: ${startDate.get.pyStr}\n"
    }
    microDtend.foreach { v =>
      endDate = Some(parseYmd(v))
      label ++= s"dtend: ${endDate.get.pyStr}\n"
    }

    for (row <- dateRows) {
      var filled = false
      row.date.foreach { rd =>
        startDate match {
          case None => startDate = Some(rd); filled = true
          case Some(sd) if !sd.hasTime && rd.hasTime =>
            startDate = Some(sd.withTime(rd.h, rd.mi)); filled = true
          case _ => ()
        }
      }
      if (row.ongoing && endDate.isEmpty) {
        ongoing = true
      } else if (row.until.isDefined && !ongoing) {
        val ru = row.until.get
        endDate match {
          case None => endDate = Some(ru); filled = true
          case Some(ed) if !ed.hasTime && ru.hasTime =>
            endDate = Some(ed.withTime(ru.h, ru.mi)); filled = true
          case _ => ()
        }
      }
      // date rows never carry tz in the reference (parseDates sets none)
      if (filled) label ++= s"${row.label}: ${row.value}\n"
    }

    for (row <- timeRows) {
      var filled = false
      if (startDate.isDefined && endDate.isEmpty) {
        if (!startDate.get.hasTime) {
          startDate = Some(startDate.get.withTime(row.start.hour, row.start.minute))
          filled = true
        }
        row.end.foreach { e =>
          endDate = Some(startDate.get.withTime(e.hour, e.minute))
          filled = true
        }
      } else if (startDate.isEmpty && endDate.isEmpty) {
        if (startTime.isEmpty) { startTime = Some(row.start); filled = true }
        if (endTime.isEmpty) { endTime = row.end; filled = true } // reference sets filled even on None
      }
      if (tz.isEmpty) {
        row.start.tzMin.orElse(row.end.flatMap(_.tzMin)) match {
          case Some(t) => tz = Some(t); filled = true
          case None => ()
        }
      }
      if (filled) label ++= s"${row.label}: ${row.value}\n"
    }

    // start-only ⇒ point in time (outputRdf.py:302-304)
    if (startDate.isDefined && endDate.isEmpty && !ongoing) endDate = startDate

    // apply found timezone to all slots (outputRdf.py:306-311)
    tz.foreach { t =>
      startDate = startDate.map(_.withTz(Some(t)))
      endDate = endDate.map(_.withTz(Some(t)))
      startTime = startTime.map(_.copy(tzMin = Some(t)))
      endTime = endTime.map(_.copy(tzMin = Some(t)))
    }

    if (startDate.isDefined || endDate.isDefined || ongoing ||
      startTime.isDefined || endTime.isDefined) {
      val uri = Uris.timespanUri(
        startDate.map(_.pyStr), endDate.map(_.pyStr), ongoing,
        startTime.map(_.pyStr), endTime.map(_.pyStr), tz.map(tzName))
      Some(Result(uri, label.result(), startDate, endDate, ongoing, startTime, endTime))
    } else None
  }
}
