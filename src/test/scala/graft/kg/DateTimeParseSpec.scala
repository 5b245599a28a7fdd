package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import DateTimeParse._

/** Fixture bank seeded from the reference's own self-test corpus
  * (dateTimeParser.py:158-213) — behavior parity, re-expressed as asserts.
  */
class DateTimeParseSpec extends AnyFunSuite {

  private def dates(s: String): DateDict = parseDates(normalizeDashes(s))

  test("mdy: January 1, 2021") {
    assert(dates("January 1, 2021") == DateDict(Some(KDateTime(2021, 1, 1)), None, false))
  }
  test("mdyOn: January 1, 2021 - present") {
    assert(dates("January 1, 2021 - present") == DateDict(Some(KDateTime(2021, 1, 1)), None, true))
  }
  test("mddy: January 1 - 12, 2021") {
    assert(dates("January 1 - 12, 2021") ==
      DateDict(Some(KDateTime(2021, 1, 1)), Some(KDateTime(2021, 1, 12)), false))
  }
  test("mdmdy: January 1 - February 12, 2021") {
    assert(dates("January 1 - February 12, 2021") ==
      DateDict(Some(KDateTime(2021, 1, 1)), Some(KDateTime(2021, 2, 12)), false))
  }
  test("mdymdy: January 1, 2021 - February 12, 2022") {
    assert(dates("January 1, 2021 - February 12, 2022") ==
      DateDict(Some(KDateTime(2021, 1, 1)), Some(KDateTime(2022, 2, 12)), false))
  }
  test("dmy: 1 January 2021") {
    assert(dates("1 January 2021") == DateDict(Some(KDateTime(2021, 1, 1)), None, false))
  }
  test("dmyOn: 1 January 2021 - ongoing") {
    assert(dates("1 January 2021 - ongoing") == DateDict(Some(KDateTime(2021, 1, 1)), None, true))
  }
  test("ddmy: 1 - 2 January 2021") {
    assert(dates("1 - 2 January 2021") ==
      DateDict(Some(KDateTime(2021, 1, 1)), Some(KDateTime(2021, 1, 2)), false))
  }
  test("dmdmy: 1 January - 12 February 2022") {
    assert(dates("1 January - 12 February 2022") ==
      DateDict(Some(KDateTime(2022, 1, 1)), Some(KDateTime(2022, 2, 12)), false))
  }
  test("dmydmy: 1 January 2021 - 12 February 2022") {
    assert(dates("1 January 2021 - 12 February 2022") ==
      DateDict(Some(KDateTime(2021, 1, 1)), Some(KDateTime(2022, 2, 12)), false))
  }
  test("multiline with time suffix") {
    assert(dates("January 15, 2022 \n    10:41 a.m. – 9:22 p.m. (CST)").date
      .contains(KDateTime(2022, 1, 15)))
  }
  test("17 January 2022 (4 months ago)") {
    assert(dates("17 January 2022 (4 months ago)\n    14:29 – 14:50 (UTC+4:00)").date
      .contains(KDateTime(2022, 1, 17)))
  }
  test("Tanami Desert 27 June 2021") {
    assert(dates("Tanami Desert \n    27 June 2021 ") ==
      DateDict(Some(KDateTime(2021, 6, 27)), None, false))
  }
  test("December 30, 2021-January 1, 2022") {
    assert(dates("December 30, 2021-January 1, 2022 ") ==
      DateDict(Some(KDateTime(2021, 12, 30)), Some(KDateTime(2022, 1, 1)), false))
  }
  test("17 November 2019 - present (2 years and 6 months)") {
    assert(dates("17 November 2019 - present\n    (2 years and 6 months)") ==
      DateDict(Some(KDateTime(2019, 11, 17)), None, true))
  }
  test("non-date text yields nothing") {
    assert(dates("Wuhan, Hubei, China") == DateDict(None, None, false))
  }

  // timezone parsing asserts (dateTimeParser.py:189-212)
  test("parseTimes UTC offsets") {
    def tzOf(s: String): Option[Int] = parseTimes(s).get.start.tzMin
    assert(tzOf("10:41 a.m. (UTC+3)").contains(180))
    assert(tzOf("10:41 a.m. (UTC-3)").contains(-180))
    assert(tzOf("10:41 a.m. (UTC+3:30)").contains(210))
    // the reference's own quirk: timedelta(hours=-3, minutes=30) = -150
    assert(tzOf("10:41 a.m. (UTC-3:30)").contains(-150))
    assert(tzOf("10:41 a.m. (UTC+13)").contains(780))
    assert(tzOf("10:41 a.m. (UTC-13:30)").contains(-750))
  }

  test("parseTimes 12/24h conversion") {
    val t = parseTimes("10:41 a.m. – 9:22 p.m. (CST)".replaceAll("[–−]", "-")).get
    assert(t.start == KTime(10, 41, None))
    assert(t.end.contains(KTime(21, 22, None)))
    val noon = parseTimes("12:00 p.m.").get
    assert(noon.start == KTime(12, 0, None))
    val midnight = parseTimes("12:15 a.m.").get
    assert(midnight.start == KTime(0, 15, None))
    assert(parseTimes("no time here").isEmpty)
    val span24 = parseTimes("14:29 - 14:50 (UTC+4:00)").get
    assert(span24.start == KTime(14, 29, Some(240)))
    assert(span24.end.contains(KTime(14, 50, Some(240))))
  }

  test("dms2dd") {
    assert(math.abs(dms2dd("36°13′50.3″N") - (36.0 + 13.0 / 60 + 50.3 / 3600)) < 1e-9)
    assert(math.abs(dms2dd("3°41′W") - -(3.0 + 41.0 / 60)) < 1e-9)
    assert(dms2dd("12°S") == -12.0)
    assert(math.abs(dms2dd("1,5°N") - 1.5) < 1e-9) // comma decimals
  }

  test("python str forms") {
    assert(KDateTime(2022, 1, 5).pyStr == "2022-01-05 00:00:00")
    assert(KDateTime(2022, 1, 5, 13, 30).isoformat == "2022-01-05T13:30:00")
    assert(KDateTime(2022, 1, 5, 13, 30, Some(180)).isoformat == "2022-01-05T13:30:00+03:00")
    assert(KTime(9, 5, Some(-150)).pyStr == "09:05:00-02:30")
    assert(Timespan.tzName(0) == "UTC")
    assert(Timespan.tzName(240) == "UTC+04:00")
  }

  test("quote_plus parity with python") {
    assert(Uris.quotePlus("a b,c") == "a+b%2Cc")
    assert(Uris.quotePlus("x~y*z") == "x~y%2Az")
    assert(Uris.quotePlus("2022-01-05 00:00:00_o") == "2022-01-05+00%3A00%3A00_o")
  }
}
