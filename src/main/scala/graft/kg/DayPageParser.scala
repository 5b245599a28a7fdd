package graft.kg

import java.util.regex.Pattern

/** Day-page extraction (reference extraction.py): a pure fold over the span
  * array of one day document — no Spark types, so it runs inside
  * mapPartitions with zero shuffle (SURVEY.md §2.2 P1-P9).
  */
object DayPageParser {

  private val nsUrlRe = Pattern.compile("""https://en\.wikipedia\.org/wiki/\w*:.*""")

  /** reference articleExtractor.py:255-264 (__testIfUrlIsArticle). */
  def urlIsArticle(url: String): Boolean =
    !nsUrlRe.matcher(url).matches() && url.startsWith("https://en.wikipedia.org/wiki/")

  /** month page URL for a yyyy-MM-dd date (reference inputHtml.py:129-133). */
  def sourceUrlOf(date: String): String = {
    val y = date.substring(0, 4)
    val m = date.substring(5, 7).toInt
    s"https://en.wikipedia.org/wiki/Portal:Current_events/${Synth.monthNames(m - 1)}_$y"
  }

  private val markerKinds = Set("topic_open", "topic_close", "event_open", "event_close",
    "category", "day_marker", "cite_note")

  /** Fold of one event row's spans (reference __parseEventTagRecursive,
    * extraction.py:38-90): source-link text advances the index but is
    * excluded from the text.
    */
  def foldEventRow(row: Seq[Span]): (String, Seq[KLink], String, Seq[KLink], Seq[Int]) = {
    val text = new StringBuilder
    val sourceText = new StringBuilder
    val links = Seq.newBuilder[KLink]
    val sourceLinks = Seq.newBuilder[KLink]
    val refNrs = Seq.newBuilder[Int]
    var cur = 0
    for (s <- row) s.kind match {
      case "text" =>
        text ++= s.text; cur += s.text.length
      case "wikilink" | "extlink" =>
        val external = s.kind == "extlink"
        val t = s.text
        val isSource = external && t.nonEmpty && t.head == '(' && t.last == ')'
        val link = KLink(s.media_ref, t, cur, cur + t.length, external)
        if (isSource) { sourceLinks += link; sourceText ++= t }
        else { links += link; text ++= t }
        cur += t.length
      case "sup_ref" =>
        // citation marker: contributes no text (extraction.py:52-53 skips sup)
        val id = Option(s.media_ref).getOrElse("")
        val nr = id.split("-").last
        if (nr.nonEmpty && nr.forall(_.isDigit)) refNrs += nr.toInt
      case _ => () // media etc: no text contribution in event rows
    }
    (text.result(), links.result(), sourceText.result(), sourceLinks.result(), refNrs.result())
  }

  /** Topic row fold (reference getTextAndLinksRecursive — no sup skip, all
    * links collected, articleExtractor.py:221-252).
    */
  def foldTopicRow(row: Seq[Span]): (String, Seq[KLink]) = {
    val text = new StringBuilder
    val links = Seq.newBuilder[KLink]
    var cur = 0
    for (s <- row) s.kind match {
      case "text" =>
        text ++= s.text; cur += s.text.length
      case "wikilink" | "extlink" =>
        links += KLink(s.media_ref, s.text, cur, cur + s.text.length, s.kind == "extlink")
        text ++= s.text; cur += s.text.length
      case _ => ()
    }
    (text.result(), links.result())
  }

  /** Python str.strip(':') after str.strip() (extraction.py:103-104). */
  def stripTopicText(t: String): String = {
    val trimmed = t.trim
    trimmed.dropWhile(_ == ':').reverse.dropWhile(_ == ':').reverse
  }

  /** Comma label splitting (reference __parseTopic, extraction.py:114-161). */
  def topicLabels(text: String, links: Seq[KLink]): Map[KLink, String] = {
    if (links.isEmpty) Map.empty
    else if (links.size == 1) Map(links.head -> text)
    else {
      // commas outside links
      val seps = (0 until text.length).filter { i =>
        text.charAt(i) == ',' &&
          !links.exists(l => i >= l.startPos && (i + 1) <= l.endPos)
      }
      if (seps.isEmpty) links.map(_ -> text).toMap
      else {
        val sortedSeps = seps.sorted
        val sortedLinks = links.sortBy(_.startPos)
        var csi = 0
        var labelStart = 0
        var labelEnd = sortedSeps(0)
        val out = Map.newBuilder[KLink, String]
        for (link <- sortedLinks) {
          if (link.endPos > labelEnd) {
            if (csi + 1 < sortedSeps.length) {
              labelStart = sortedSeps(csi)
              labelEnd = sortedSeps(csi + 1)
              csi += 1
            } else {
              labelStart = sortedSeps(csi)
              labelEnd = text.length
            }
            labelStart += 1 // skip the ',' itself
          }
          out += link -> text.substring(math.min(labelStart, text.length),
            math.max(math.min(labelEnd, text.length), math.min(labelStart, text.length))).trim
        }
        out.result()
      }
    }
  }

  /** Sentence splitting (reference __splitEventTextIntoSentences,
    * extraction.py:225-288): split at ". " unless inside a link; links are
    * attached to the sentence they END in, consumed in order; trailing
    * fragment kept only if the text ends with '.'.
    */
  def splitSentences(text: String, wikiLinks: Seq[KLink]): Seq[KSentence] = {
    val sorted = wikiLinks // reference keeps event link order (already positional)
    var linkIndex = 0
    def linksInSpan(start: Int, end: Int): Seq[KLink] = {
      val out = Seq.newBuilder[KLink]
      while (linkIndex < sorted.length && sorted(linkIndex).endPos <= end) {
        val l = sorted(linkIndex)
        out += l.copy(startPos = l.startPos - start, endPos = l.endPos - start)
        linkIndex += 1
      }
      out.result()
    }
    val sentences = Seq.newBuilder[KSentence]
    var count = 0
    var start = 0
    var i = text.indexOf(". ")
    while (i >= 0) {
      val end = i + 2
      if (!wikiLinks.exists(wl => end > wl.startPos && end < wl.endPos)) {
        sentences += KSentence(text.substring(start, end), start, end, linksInSpan(start, end))
        count += 1
        start = end
      }
      i = text.indexOf(". ", i + 1)
    }
    if (start != text.length && text.nonEmpty && text.last == '.') {
      sentences += KSentence(text.substring(start), start, text.length, linksInSpan(start, text.length))
      count += 1
    }
    if (count == 0) {
      linkIndex = 0
      Seq(KSentence(text, 0, text.length, linksInSpan(0, text.length)))
    } else sentences.result()
  }

  /** Parse one day document into its events, topics and references. */
  def parse(doc: SpanDoc): (Seq[KEvent], Seq[KTopic], Seq[KReference]) = {
    val spans = doc.spans
    var date = ""
    var sourceUrl = ""
    var category: Option[String] = None
    // D4: reference numbers must be unique per page (extraction.py:397
    // asserts); we keep the first occurrence instead of failing the row
    val references = spans.filter(_.kind == "cite_note")
      .map(s => KReference(s.offset, s.media_ref, s.text))
      .distinctBy(_.nr)
    val refByNr = references.map(r => r.nr -> r).toMap

    val events = Seq.newBuilder[KEvent]
    val topics = Seq.newBuilder[KTopic]
    var tnum = 0
    var evnum = 0
    var topicIdCounter = 0L
    // stack of parent-topic-id frames; top = ids of the enclosing topic row
    var stack: List[Seq[Long]] = List(Nil)

    var i = 0
    while (i < spans.length) {
      val s = spans(i)
      s.kind match {
        case "day_marker" =>
          date = s.media_ref
          sourceUrl = sourceUrlOf(date)
          i += 1
        case "category" =>
          category = Some(s.text)
          i += 1
        case "event_open" =>
          val end = {
            var j = i + 1
            while (j < spans.length && spans(j).kind != "event_close") j += 1
            j
          }
          val row = spans.slice(i + 1, end)
          val (text, links, sourceText, sourceLinks, refNrs) = foldEventRow(row)
          val wikiArticleLinks = links.filter(l => urlIsArticle(l.href))
          val sentences = splitSentences(text, wikiArticleLinks)
          events += KEvent(
            doc_id = doc.doc_id, date = date, eventIndex = evnum, category = category,
            text = text, sourceText = sourceText, sourceUrl = sourceUrl,
            raw = SpanCodec.rawOf(row), sentences = sentences,
            links = wikiArticleLinks, sourceLinks = sourceLinks,
            refs = references.filter(r => refNrs.contains(r.nr)), parentTopicIds = stack.head)
          evnum += 1
          i = end + 1
        case "topic_open" =>
          var j = i + 1
          while (j < spans.length && !markerKinds.contains(spans(j).kind)) j += 1
          val row = spans.slice(i + 1, j)
          val (rawText, links) = foldTopicRow(row)
          val text = stripTopicText(rawText)
          val raw = SpanCodec.rawOf(row)
          val ids = Seq.newBuilder[Long]
          if (links.isEmpty) {
            val id = topicIdCounter; topicIdCounter += 1
            topics += KTopic(doc.doc_id, id, date, tnum, text, None, stack.head, sourceUrl, raw)
            tnum += 1
            ids += id
          } else {
            val labels = topicLabels(text, links)
            for (link <- links) {
              val id = topicIdCounter; topicIdCounter += 1
              topics += KTopic(doc.doc_id, id, date, tnum, labels(link),
                Some(link.href), stack.head, sourceUrl, raw)
              tnum += 1
              ids += id
            }
          }
          stack = ids.result() :: stack
          i = j
        case "topic_close" =>
          stack = stack.tail
          i += 1
        case _ =>
          i += 1
      }
    }
    (events.result(), topics.result(), references)
  }
}
