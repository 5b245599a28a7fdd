package graft.kg

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed golden triples for one small event — first-principles check
  * of the storeEvent shapes (outputRdf.py:418-561) independent of the synth
  * generator and the sequential oracle.
  */
class EmitSpec extends AnyFunSuite {

  private val d = "2022-01-05"
  private val ev = Uris.eventUri(d, 3)
  private val ctx = Uris.contextUri(d, 3)

  private def mkEvent: KEvent = {
    val link = KLink("https://en.wikipedia.org/wiki/CityX", "CityX", 11, 16, external = false)
    val text = "Quake hits CityX. "
    KEvent(
      doc_id = "day:2022-01-05", date = d, eventIndex = 3,
      category = Some("Disasters and accidents"),
      text = text, sourceText = "(Reuters)",
      sourceUrl = "https://en.wikipedia.org/wiki/Portal:Current_events/January_2022",
      raw = "[raw]",
      sentences = Seq(KSentence("Quake hits CityX. ", 0, 18, Seq(link))),
      links = Seq(link),
      sourceLinks = Seq(KLink("https://news.example.org/r/1", "(Reuters)", 19, 28, external = true)),
      refs = Seq(KReference(2, "https://news.example.org/cite/9", "Cited story")),
      parentTopicIds = Seq(0L))
  }

  private val topicInfo = Emit.TopicInfo(0L, Uris.articleTopicUri("https://en.wikipedia.org/wiki/Storm_q"),
    Some("https://en.wikipedia.org/wiki/Storm_q"),
    Seq(ClassLabel("Q7", "instance class 7")), Nil)

  private val artLite = Emit.ArtLite("https://en.wikipedia.org/wiki/CityX",
    Some(Ns.WD + "Q205"), locationFlag = true, parentLocUris = Nil)

  test("storeEvent golden shapes") {
    val got = Emit.eventTriples(mkEvent, Map(0L -> topicInfo),
      Map("https://en.wikipedia.org/wiki/CityX" -> artLite)).toSet

    def iri(s: String, p: String, o: String) = Triple("base", s, p, o, true, null, null, d)
    def str(s: String, p: String, o: String) = Triple("base", s, p, o, false, Ns.xsdString, null, d)
    def nni(s: String, p: String, o: String) =
      Triple("base", s, p, o, false, Ns.xsdNonNegativeInteger, null, d)

    val sent = Ns.sentences + "2022-01-05_3_0"
    val phrase = Ns.phrases + "2022-01-05_3_0_0"
    val expected = Set(
      iri(ev, Ns.rdfType, Ns.COY + "NewsSummary"),
      iri(ev, Ns.rdfType, Ns.COY + "WikiNews"),
      iri(ev, Ns.rdfType, Ns.COY + "Event"),
      str(ev, Ns.rdfsLabel, "Quake hits CityX. "),
      iri(ev, Ns.COY + "isIdentifiedBy", ctx),
      str(ev, Ns.COY + "hasTag", "Disasters and accidents"),
      Triple("base", ev, Ns.COY + "hasMentionDate", "2022-01-05T00:00:00", false, Ns.xsdDateTime, null, d),
      Triple("raw", ev, Ns.COY + "hasRawHtml", "[raw]", false, Ns.xsdString, null, d),
      iri(ev, Ns.COY + "isOccuringDuring", Ns.articleTopics + "Storm_q"),
      iri(ev, Ns.COY + "hasWikidataEventType", Ns.WD + "Q7"),
      str(Ns.WD + "Q7", Ns.rdfsLabel, "instance class 7"),
      // context node
      iri(ctx, Ns.rdfType, Ns.NIF + "Context"),
      str(ctx, Ns.rdfsLabel, "Quake hits CityX. "),
      str(ctx, Ns.NIF + "isString", "Quake hits CityX. "),
      nni(ctx, Ns.NIF + "beginIndex", "0"),
      nni(ctx, Ns.NIF + "endIndex", "18"),
      iri(ctx, Ns.NIF + "sourceUrl", "https://en.wikipedia.org/wiki/Portal:Current_events/January_2022"),
      iri("https://en.wikipedia.org/wiki/Portal:Current_events/January_2022", Ns.rdfType, Ns.FOAF + "Document"),
      // news sources: trailing "(Reuters)" + cite reference
      iri(ctx, Ns.DCTERMS + "source", "https://news.example.org/r/1"),
      iri("https://news.example.org/r/1", Ns.rdfType, Ns.COY + "News"),
      str("https://news.example.org/r/1", Ns.rdfsLabel, "(Reuters)"),
      iri(ctx, Ns.DCTERMS + "source", "https://news.example.org/cite/9"),
      iri("https://news.example.org/cite/9", Ns.rdfType, Ns.COY + "News"),
      str("https://news.example.org/cite/9", Ns.rdfsLabel, "Cited story"),
      // sentence
      iri(sent, Ns.rdfType, Ns.NIF + "Sentence"),
      str(sent, Ns.rdfsLabel, "Quake hits CityX. "),
      iri(sent, Ns.NIF + "referenceContext", ctx),
      iri(ctx, Ns.NIF + "subString", sent),
      str(sent, Ns.NIF + "anchorOf", "Quake hits CityX. "),
      nni(sent, Ns.NIF + "beginIndex", "0"),
      nni(sent, Ns.NIF + "endIndex", "18"),
      // phrase
      iri(phrase, Ns.rdfType, Ns.NIF + "Phrase"),
      str(phrase, Ns.rdfsLabel, "CityX"),
      iri(phrase, Ns.NIF + "referenceContext", sent),
      iri(sent, Ns.NIF + "subString", phrase),
      str(phrase, Ns.NIF + "anchorOf", "CityX"),
      nni(phrase, Ns.NIF + "beginIndex", "11"),
      nni(phrase, Ns.NIF + "endIndex", "16"),
      iri(phrase, Ns.GN + "wikipediaArticle", Ns.wikipediaArticle + "CityX"))

    val missing = expected -- got
    val extra = got -- expected
    assert(missing.isEmpty, s"missing: ${missing.take(5)}")
    assert(extra.isEmpty, s"extra: ${extra.take(5)}")
  }

  test("URI minting matches reference literal forms") {
    assert(Uris.eventUri("2022-01-05", 3) ==
      "https://data.coypu.org/newssummary/wikipedia-current-events/2022-01-05_3")
    assert(Uris.textTopicUri("2022 storms, floods") ==
      "https://data.coypu.org/texttopic/wikipedia-current-events/2022+storms%2C+floods")
    assert(Uris.sentenceUri(Uris.contextUri("2022-01-05", 3), 1) ==
      "https://data.coypu.org/sentence/wikipedia-current-events/2022-01-05_3_1")
    assert(Uris.phraseUri(Uris.sentenceUri(Uris.contextUri("2022-01-05", 3), 1), 2) ==
      "https://data.coypu.org/phrase/wikipedia-current-events/2022-01-05_3_1_2")
    assert(Uris.osmUri("relation", 62422L) ==
      "https://data.coypu.org/osmelement/wikipedia-current-events/relation_62422")
    assert(Uris.pointUri(36.2306, -3.6833) ==
      "https://data.coypu.org/point/wikipedia-current-events/" +
        Uris.quotePlus("36.2306_-3.6833"))
  }
}
