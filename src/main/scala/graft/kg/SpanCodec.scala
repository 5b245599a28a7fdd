package graft.kg

/** Renders the synthetic model into the engine's input shape: one SpanDoc
  * per day page and per article page (FIXTURES.md §1 span vocabulary).
  * The rendered span sequence is the ground truth for the span-sequence
  * equality invariant.
  */
object SpanCodec {
  import Synth._

  def dayDocId(date: String): String = s"day:$date"
  def articleDocId(slug: String): String = s"article:$slug"

  /** Event row → spans with reference curIndex semantics: source-link text
    * advances the offset but is excluded from the row text
    * (extraction.py:38-90).
    */
  private def eventSpans(p: Params, e: MEventNode): Seq[Span] = {
    val out = Seq.newBuilder[Span]
    var off = 0
    out += Span("event_open", "", null, 0)
    for ((t, linkIdx) <- e.textParts if t.nonEmpty) {
      linkIdx match {
        case None =>
          out += Span("text", t, null, off); off += t.length
        case Some(a) =>
          val art = article(p, a)
          out += Span("wikilink", t, art.url, off); off += t.length
      }
    }
    for ((label, url) <- e.sources) {
      out += Span("text", " ", null, off); off += 1
      out += Span("extlink", label, url, off); off += label.length
    }
    for (nr <- e.refNrs)
      out += Span("sup_ref", "", s"cite_ref-$nr", off)
    out += Span("event_close", "", null, off)
    out.result()
  }

  private def topicSpans(p: Params, t: MTopicNode): Seq[Span] = {
    val out = Seq.newBuilder[Span]
    var off = 0
    out += Span("topic_open", "", null, 0)
    for ((txt, linkIdx) <- t.textParts if txt.nonEmpty) {
      linkIdx match {
        case None =>
          out += Span("text", txt, null, off); off += txt.length
        case Some(a) =>
          val art = article(p, a)
          out += Span("wikilink", txt, art.url, off); off += txt.length
      }
    }
    for (c <- t.children) out ++= nodeSpans(p, c)
    out += Span("topic_close", "", null, off)
    out.result()
  }

  private def nodeSpans(p: Params, n: MNode): Seq[Span] = n match {
    case e: MEventNode => eventSpans(p, e)
    case t: MTopicNode => topicSpans(p, t)
  }

  def dayDoc(p: Params, d: MDay): SpanDoc = {
    val out = Seq.newBuilder[Span]
    out += Span("day_marker", d.dayboxId, d.date, 0)
    for ((cat, nodes) <- d.categories) {
      cat.foreach(c => out += Span("category", c, null, 0))
      nodes.foreach(n => out ++= nodeSpans(p, n))
    }
    for (r <- d.references)
      out += Span("cite_note", r.anchorText, r.url, r.nr)
    SpanDoc(dayDocId(d.date), out.result())
  }

  def articleDoc(p: Params, a: MArticle): SpanDoc = {
    val out = Seq.newBuilder[Span]
    if (a.exists && !a.isNamespace) {
      out += Span("jsonld_meta", a.url, "url", 0)
      out += Span("jsonld_meta", a.name, "name", 0)
      out += Span("jsonld_meta", a.headline, "headline", 0)
      a.datePublished.foreach(v => out += Span("jsonld_meta", v, "datePublished", 0))
      a.dateModified.foreach(v => out += Span("jsonld_meta", v, "dateModified", 0))
      a.wdId.foreach(q => out += Span("jsonld_meta", s"${Ns.WD}$q", "mainEntity", 0))
    }
    a.templates.foreach(t => out += Span("template", t, null, 0))
    a.ibClasses.foreach(c => out += Span("ib_class", c, null, 0))
    a.pageCoord.foreach { case (lat, lon) =>
      out += Span("geo_dms", s"$lat|$lon", "page", 0)
    }
    // infobox rows: ib_row (label \t value) followed by its value links
    a.locationValue.foreach { v =>
      val label = if (a.templates.contains("Template:Infobox_storm")) "Areas affected" else "Location"
      out += Span("ib_row", s"$label\t$v", null, 0)
      for ((off, target) <- a.locationLinks) {
        val tart = article(paramsDummy, target)
        out += Span("wikilink", s"City ${target}", tart.url, off)
      }
      out += Span("media", "", "flagicon.svg", 0) // skipped by value flatten
      a.ibCoord.foreach { case (lat, lon) =>
        out += Span("geo_dms", s"$lat|$lon", "infobox", 0)
      }
    }
    for ((label, value) <- a.dateRows)
      out += Span("ib_row", s"$label\t$value", null, 0)
    for ((label, value) <- a.timeRows)
      out += Span("ib_row", s"$label\t$value", null, 0)
    a.dtstart.foreach(v => out += Span("microformat", v, "dtstart", 0))
    a.dtend.foreach(v => out += Span("microformat", v, "dtend", 0))
    SpanDoc(articleDocId(a.slug), out.result())
  }

  // article() only reads index-hashed fields; params only affects months in
  // dtstart which we don't read here — safe dummy for slug/url lookups.
  private val paramsDummy: Params = Params(months = 1, articles = 0)

  /** Canonical raw serialization of a row's spans — stands in for the
    * reference's str(html-element) in the raw graph module (our input has no
    * raw HTML; this is deterministic and reconstructable from spans).
    */
  def rawOf(spans: Seq[Span]): String =
    spans.map(s => s"${s.kind}|${Option(s.text).getOrElse("")}|${Option(s.media_ref).getOrElse("")}|${s.offset}")
      .mkString("[", ";", "]")
}
