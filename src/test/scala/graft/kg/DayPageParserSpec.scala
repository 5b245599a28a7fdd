package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import DayPageParser._

class DayPageParserSpec extends AnyFunSuite {

  private def link(href: String, text: String, start: Int): KLink =
    KLink(href, text, start, start + text.length, external = false)

  // ---- sentence splitting (extraction.py:225-288 edge cases) --------------
  test("split at '. ' outside links") {
    val t = "One. Two. Three."
    val s = splitSentences(t, Nil)
    assert(s.map(_.text) == Seq("One. ", "Two. ", "Three."))
    assert(s.map(x => (x.start, x.end)) == Seq((0, 5), (5, 10), (10, 16)))
  }
  test("split point inside a link is skipped") {
    val t = "x A. B y. End."
    // link "A. B" covers the first candidate split point (". " at 3→5)
    val l = link("https://en.wikipedia.org/wiki/AB", "A. B", 2)
    val s = splitSentences(t, Seq(l))
    assert(s.map(_.text) == Seq("x A. B y. ", "End."))
    // a split point at the link's end boundary IS allowed (end > startPos
    // but not < endPos): "U. S." at 4..9, second ". " ends at 10
    val t2 = "See U. S. news. More."
    val l2 = link("https://en.wikipedia.org/wiki/US", "U. S.", 4)
    assert(splitSentences(t2, Seq(l2)).map(_.text) == Seq("See U. S. ", "news. ", "More."))
  }
  test("trailing fragment kept only when text ends with '.'") {
    assert(splitSentences("A. B", Nil).map(_.text) == Seq("A. ")) // 'B' dropped
    assert(splitSentences("A. B.", Nil).map(_.text) == Seq("A. ", "B."))
  }
  test("no split: whole text as one sentence") {
    val s = splitSentences("no periods here", Nil)
    assert(s.map(_.text) == Seq("no periods here"))
  }
  test("links rebased and attached to the sentence they end in") {
    val t = "Alpha beta. Gamma delta."
    val l1 = link("https://en.wikipedia.org/wiki/A", "beta", 6)
    val l2 = link("https://en.wikipedia.org/wiki/B", "Gamma", 12)
    val s = splitSentences(t, Seq(l1, l2))
    assert(s(0).links == Seq(l1.copy(startPos = 6, endPos = 10)))
    assert(s(1).links == Seq(l2.copy(startPos = 0, endPos = 5)))
  }
  test("link past the last kept sentence is dropped") {
    val t = "Kept. dangling tail"
    val l = link("https://en.wikipedia.org/wiki/X", "tail", 15)
    val s = splitSentences(t, Seq(l))
    assert(s.map(_.text) == Seq("Kept. "))
    assert(s.head.links.isEmpty)
  }

  // ---- topic label splitting (extraction.py:114-161) -----------------------
  test("single link gets whole text") {
    val l = link("https://en.wikipedia.org/wiki/X", "War in X", 0)
    assert(topicLabels("War in X", Seq(l)) == Map(l -> "War in X"))
  }
  test("multi links split at commas outside links") {
    val t = "Alpha war, Beta crisis"
    val l1 = link("h1", "Alpha war", 0)
    val l2 = link("h2", "Beta crisis", 11)
    val labels = topicLabels(t, Seq(l1, l2))
    assert(labels(l1) == "Alpha war")
    assert(labels(l2) == "Beta crisis")
  }
  test("comma inside a link does not split") {
    val t = "Foo, bar conflict and Baz"
    val l1 = link("h1", "Foo, bar conflict", 0) // contains the comma
    val l2 = link("h2", "Baz", 22)
    val labels = topicLabels(t, Seq(l1, l2))
    // no outside comma ⇒ both get full text
    assert(labels(l1) == t && labels(l2) == t)
  }
  test("three links two separators") {
    val t = "One a, Two b, Three c"
    val l1 = link("h1", "One a", 0)
    val l2 = link("h2", "Two b", 7)
    val l3 = link("h3", "Three c", 14)
    val labels = topicLabels(t, Seq(l1, l2, l3))
    assert(labels(l1) == "One a")
    assert(labels(l2) == "Two b")
    assert(labels(l3) == "Three c")
  }

  // ---- event row fold (extraction.py:38-90) --------------------------------
  test("source links excluded from text but advance offsets") {
    val row = Seq(
      Span("text", "Quake hits ", null, 0),
      Span("wikilink", "CityX", "https://en.wikipedia.org/wiki/CityX", 11),
      Span("text", ". ", null, 16),
      Span("text", " ", null, 18),
      Span("extlink", "(Reuters)", "https://news.example.org/r/1", 19),
      Span("sup_ref", "", "cite_ref-2", 28))
    val (text, links, srcText, srcLinks, refs) = foldEventRow(row)
    assert(text == "Quake hits CityX.  ")
    assert(srcText == "(Reuters)")
    assert(links == Seq(KLink("https://en.wikipedia.org/wiki/CityX", "CityX", 11, 16, false)))
    assert(srcLinks == Seq(KLink("https://news.example.org/r/1", "(Reuters)", 19, 28, true)))
    assert(refs == Seq(2))
  }
  test("external non-parenthesized link is a normal link") {
    val row = Seq(
      Span("extlink", "BBC report", "https://bbc.example/x", 0))
    val (text, links, srcText, srcLinks, _) = foldEventRow(row)
    assert(text == "BBC report" && srcText.isEmpty)
    assert(links.head.external && srcLinks.isEmpty)
  }

  test("strip topic text of colons and whitespace") {
    assert(stripTopicText(" :Topic name: ") == "Topic name")
  }

  test("url article test") {
    assert(urlIsArticle("https://en.wikipedia.org/wiki/Some_Event"))
    assert(!urlIsArticle("https://en.wikipedia.org/wiki/Category:Stuff"))
    assert(!urlIsArticle("https://news.example.org/x"))
  }

  // ---- full day-doc parse over the synthetic corpus ------------------------
  test("day docs parse with day-sequential indices and parent topics") {
    val p = Synth.Params(months = 1, articles = 50)
    val d = Synth.day(p, 1, 3)
    val doc = SpanCodec.dayDoc(p, d)
    val (events, topics, refs) = parse(doc)
    assert(events.nonEmpty)
    assert(events.map(_.eventIndex) == events.indices)
    assert(topics.map(_.index) == topics.indices)
    // every parent id refers to an existing topic
    val ids = topics.map(_.topicId).toSet
    assert(events.flatMap(_.parentTopicIds).forall(ids.contains))
    assert(topics.flatMap(_.parentTopicIds).forall(ids.contains))
    // refs resolved from cite_notes
    assert(events.flatMap(_.refs).forall(r => refs.contains(r)))
    assert(events.forall(_.date == "2022-01-03"))
  }

  test("span-sequence invariant: event/topic raws reconstruct the doc's rows") {
    val p = Synth.Params(months = 1, articles = 50)
    for (dayN <- 1 to 10) {
      val doc = SpanCodec.dayDoc(p, Synth.day(p, 1, dayN))
      val (events, topics, _) = parse(doc)
      // collect raw serializations of all row slices straight from the doc
      val markers = Set("topic_open", "topic_close", "event_open", "event_close",
        "category", "day_marker", "cite_note")
      val rows = Seq.newBuilder[String]
      var i = 0
      val spans = doc.spans
      while (i < spans.length) {
        spans(i).kind match {
          case "event_open" =>
            var j = i + 1
            while (spans(j).kind != "event_close") j += 1
            rows += SpanCodec.rawOf(spans.slice(i + 1, j)); i = j + 1
          case "topic_open" =>
            var j = i + 1
            while (!markers.contains(spans(j).kind)) j += 1
            rows += SpanCodec.rawOf(spans.slice(i + 1, j)); i = j
          case _ => i += 1
        }
      }
      val expected = rows.result()
      val got = (events.map(e => (e.raw, "e")) ++ topics.map(t => (t.raw, "t")))
      // every parsed raw is one of the original row serializations, with
      // multiplicity preserved for events (topics can share a row: 1 li → N topics)
      assert(events.map(_.raw).forall(expected.contains))
      assert(topics.map(_.raw).forall(expected.contains))
      assert(expected.toSet == got.map(_._1).toSet)
    }
  }
}
