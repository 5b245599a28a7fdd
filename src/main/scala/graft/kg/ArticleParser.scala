package graft.kg

import DateTimeParse._

/** Typed infobox rows after date/time extraction
  * (reference objects/infoboxRow.py:9-39).
  */
case class IbDateRow(label: String, value: String,
    date: Option[KDateTime], until: Option[KDateTime], ongoing: Boolean)
case class IbTimeRow(label: String, value: String, start: KTime, end: Option[KTime])

/** Article-page extraction (reference articleExtractor.py get_article /
  * __parseInfobox): pure fold over the article document's spans.
  */
object ArticleParser {

  /** Returns None where the reference's get_article returns None: missing
    * JSON-LD (redirect pages) or a namespace URL
    * (articleExtractor.py:85-99,255-264).
    */
  def parse(doc: SpanDoc): Option[ArticleRaw] = {
    val spans = doc.spans
    val meta = spans.filter(_.kind == "jsonld_meta").map(s => s.media_ref -> s.text).toMap
    val urlOpt = meta.get("url").map(Uris.urlDefrag)
    urlOpt match {
      case None => None // no JSON-LD ⇒ not an article
      case Some(url) if !DayPageParser.urlIsArticle(url) => None
      case Some(url) =>
        val templates = spans.filter(_.kind == "template").map(_.text)
        val ibClasses = spans.filter(_.kind == "ib_class").map(_.text)

        // group ib_row spans with their trailing value links
        val ibRows = Seq.newBuilder[IbRowRaw]
        var ibCoord: Option[Seq[Double]] = None
        var pageCoord: Option[Seq[Double]] = None
        var i = 0
        var currentLabel: String = null
        var currentValue: String = null
        var currentLinks = Seq.newBuilder[KLink]
        def flushRow(): Unit = {
          if (currentLabel != null) {
            ibRows += IbRowRaw(currentLabel, currentValue, currentLinks.result())
            currentLabel = null; currentValue = null; currentLinks = Seq.newBuilder[KLink]
          }
        }
        while (i < spans.length) {
          val s = spans(i)
          s.kind match {
            case "ib_row" =>
              flushRow()
              val tab = s.text.indexOf('\t')
              currentLabel = if (tab < 0) s.text else s.text.substring(0, tab)
              currentValue = if (tab < 0) "" else s.text.substring(tab + 1)
            case "wikilink" | "extlink" if currentLabel != null =>
              currentLinks += KLink(s.media_ref, s.text, s.offset,
                s.offset + s.text.length, s.kind == "extlink")
            case "geo_dms" =>
              val parts = s.text.split("\\|", 2)
              val coords = try {
                if (parts.length == 2) Some(Seq(dms2dd(parts(0)), dms2dd(parts(1)))) else None
              } catch { case _: Exception => None }
              if (s.media_ref == "page") pageCoord = coords else ibCoord = coords
            case "media" => () // flagicon etc — skipped by value flattening
            case _ => ()
          }
          i += 1
        }
        flushRow()

        val micro = spans.filter(_.kind == "microformat").map(s => s.media_ref -> s.text).toMap
        Some(ArticleRaw(
          url = url,
          name = meta.get("name"),
          headline = meta.get("headline"),
          datePublished = meta.get("datePublished"),
          dateModified = meta.get("dateModified"),
          wikidataEntity = meta.get("mainEntity"),
          templates = templates,
          ibClasses = ibClasses,
          ibRows = ibRows.result(),
          microDtstart = micro.get("dtstart").flatMap(v => parseMicroformat(v).map(d => f"${d.y}%04d-${d.mo}%02d-${d.d}%02d")),
          microDtend = micro.get("dtend").flatMap(v => parseMicroformat(v).map(d => f"${d.y}%04d-${d.mo}%02d-${d.d}%02d")),
          pageCoordinates = pageCoord,
          ibCoordinates = ibCoord,
          rawInfobox = SpanCodec.rawOf(spans.filter(s => s.kind == "ib_row" || s.kind == "ib_class"))))
    }
  }

  /** Location-flag classifier (reference articleExtractor.py:612-649). */
  def locationFlag(ibClasses: Seq[String], templates: Seq[String],
      placeTemplates: Set[String]): Boolean = {
    val cssHit = Seq("ib-settlement", "ib-country", "ib-islands", "ib-pol-div",
      "ib-school-district", "ib-uk-place").exists(ibClasses.contains)
    cssHit || templates.exists(placeTemplates.contains)
  }

  /** Location row selection: label depends on the storm template
    * (articleExtractor.py:499-502).
    */
  def locationRow(a: ArticleRaw): Option[IbRowRaw] = {
    val label = if (a.templates.contains("Template:Infobox_storm")) "Areas affected" else "Location"
    a.ibRows.find(_.label == label)
  }

  private val beginningLabels = Seq("Date", "Date(s)", "First outbreak", "Arrival Date", "Start Date")
  private val endingLabels = Seq("End Date", "Duration")

  /** Typed date/time row extraction for topic articles (reference
    * __getDateAndTimeFromTopicInfobox, articleExtractor.py:295-463). Returns
    * rows in the reference's dict-insertion order: time rows first, then
    * beginnings, then endings (each in fixed label order).
    */
  def extractDateTimeRows(a: ArticleRaw): (Seq[IbTimeRow], Seq[IbDateRow], Int, Int) = {
    var timeParseErrors = 0
    var dateParseErrors = 0

    val timeRows = a.ibRows.filter(_.label == "Time").flatMap { row =>
      val value = normalizeDashes(row.value)
      parseTimes(value) match {
        case Some(td) => Some(IbTimeRow(row.label, row.value, td.start, td.end))
        case None => timeParseErrors += 1; None
      }
    }

    def dateRowsFor(labels: Seq[String], isEnding: Boolean): Seq[IbDateRow] =
      labels.flatMap(l => a.ibRows.find(_.label == l)).flatMap { row =>
        val value = normalizeDashes(row.value)
        val asOf = value.contains("as of") || value.contains("As of")
        if (asOf || value == "Wuhan, Hubei, China" || value == "Wuhan, China") None
        else {
          val timeDict = parseTimes(value)
          val dd = parseDates(value)
          dd.date match {
            case None => dateParseErrors += 1; None
            case Some(d0) =>
              var date: Option[KDateTime] = Some(d0)
              var until: Option[KDateTime] = dd.until
              val ongoing = dd.ongoing
              if (until.isEmpty && !ongoing) {
                timeDict.foreach { td =>
                  val d1 = d0.withTime(td.start.hour, td.start.minute)
                  date = Some(d1)
                  td.end.foreach(e => until = Some(d1.withTime(e.hour, e.minute)))
                }
              }
              // note: span + time → time discarded, row still created (:440-444)
              if (date.isDefined && until.isEmpty && !ongoing && isEnding) {
                until = date
                date = None
              }
              Some(IbDateRow(row.label, row.value, date, until, ongoing))
          }
        }
      }

    val beginnings = dateRowsFor(beginningLabels, isEnding = false)
    val endings = dateRowsFor(endingLabels, isEnding = true)
    (timeRows, beginnings ++ endings, timeParseErrors, dateParseErrors)
  }
}
