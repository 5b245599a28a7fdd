package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import DateTimeParse._

/** Slot-filling semantics of reference outputRdf.py:195-329 — the
  * order-dependent imperative logic, case by case.
  */
class TimespanSpec extends AnyFunSuite {

  private def dRow(label: String, value: String, date: Option[KDateTime],
      until: Option[KDateTime] = None, ongoing: Boolean = false) =
    IbDateRow(label, value, date, until, ongoing)

  test("microformats fill first; date rows only merge time-of-day") {
    val r = Timespan.build(
      Some("2022-01-05"), None,
      Seq(dRow("Date", "7 January 2022", Some(KDateTime(2022, 1, 7)))),
      Nil).get
    // start already set by dtstart; row has no time ⇒ not merged, not labeled
    assert(r.startDate.contains(KDateTime(2022, 1, 5)))
    // start-only ⇒ point in time: end = start (outputRdf.py:302-304)
    assert(r.endDate.contains(KDateTime(2022, 1, 5)))
    assert(r.label == "dtstart: 2022-01-05 00:00:00\n")
  }

  test("date row with time merges hour/minute into dtstart") {
    val r = Timespan.build(
      Some("2022-01-05"), None,
      Seq(dRow("Date", "5 January 2022 13:30", Some(KDateTime(2022, 1, 5, 13, 30)))),
      Nil).get
    assert(r.startDate.contains(KDateTime(2022, 1, 5, 13, 30)))
    assert(r.label == "dtstart: 2022-01-05 00:00:00\nDate: 5 January 2022 13:30\n")
  }

  test("ongoing blocks later end dates") {
    val r = Timespan.build(None, None,
      Seq(
        dRow("Date", "1 January 2022 - present", Some(KDateTime(2022, 1, 1)), None, ongoing = true),
        dRow("Duration", "x - 3 January 2022", None, Some(KDateTime(2022, 1, 3)))),
      Nil).get
    assert(r.ongoing)
    assert(r.endDate.isEmpty)
    assert(r.uri == Uris.timespanUri(Some("2022-01-01 00:00:00"), None, true, None, None, None))
  }

  test("ending-only rows land in the end slot") {
    val r = Timespan.build(None, None,
      Seq(dRow("End Date", "3 January 2022", None, Some(KDateTime(2022, 1, 3)))),
      Nil).get
    assert(r.startDate.isEmpty)
    assert(r.endDate.contains(KDateTime(2022, 1, 3)))
  }

  test("time row combines with a start date; end derives from start's date") {
    val tr = IbTimeRow("Time", "13:05 - 14:10", KTime(13, 5, None), Some(KTime(14, 10, None)))
    val r = Timespan.build(None, None,
      Seq(dRow("Date", "5 January 2022", Some(KDateTime(2022, 1, 5)))),
      Seq(tr)).get
    assert(r.startDate.contains(KDateTime(2022, 1, 5, 13, 5)))
    assert(r.endDate.contains(KDateTime(2022, 1, 5, 14, 10)))
    assert(r.label == "Date: 5 January 2022\nTime: 13:05 - 14:10\n")
  }

  test("no dates: times fill the standalone time slots; tz applied to all") {
    val tr = IbTimeRow("Time", "14:29 - 14:50 (UTC+4:00)",
      KTime(14, 29, Some(240)), Some(KTime(14, 50, Some(240))))
    val r = Timespan.build(None, None, Nil, Seq(tr)).get
    assert(r.startDate.isEmpty && r.endDate.isEmpty)
    assert(r.startTime.contains(KTime(14, 29, Some(240))))
    assert(r.endTime.contains(KTime(14, 50, Some(240))))
    assert(r.uri == Uris.timespanUri(None, None, false,
      Some("14:29:00+04:00"), Some("14:50:00+04:00"), Some("UTC+04:00")))
  }

  test("timezone from time row is applied to date slots (str forms in URI)") {
    val tr = IbTimeRow("Time", "13:05 (UTC+3)", KTime(13, 5, Some(180)), None)
    val r = Timespan.build(None, None,
      Seq(dRow("Date", "5 January 2022", Some(KDateTime(2022, 1, 5)))),
      Seq(tr)).get
    assert(r.startDate.contains(KDateTime(2022, 1, 5, 13, 5, Some(180))))
    // point-in-time: end = start BEFORE tz application, both get tz
    assert(r.endDate.contains(KDateTime(2022, 1, 5, 13, 5, Some(180))))
    assert(r.startDate.get.isoformat == "2022-01-05T13:05:00+03:00")
  }

  test("no slots filled ⇒ no timespan") {
    assert(Timespan.build(None, None, Nil, Nil).isEmpty)
  }

  test("has_time quirk: hour!=0 AND minute!=0 (reference outputRdf.py:215-220)") {
    // 13:00 does NOT count as having a time ⇒ a later row may overwrite h/m
    val r = Timespan.build(None, None,
      Seq(
        dRow("Date", "5 January 2022 13:00", Some(KDateTime(2022, 1, 5, 13, 0))),
        dRow("Start Date", "5 January 2022 14:30", Some(KDateTime(2022, 1, 5, 14, 30)))),
      Nil).get
    assert(r.startDate.contains(KDateTime(2022, 1, 5, 14, 30)))
  }
}
