package graft.kg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.KgPipeline

/** Fixtures for the KG query layer: expectations computed sequentially from
  * the generator model / oracle triple set (plain Scala, no Spark), compared
  * against the distributed query plans.
  */
class KgQueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val p = Synth.paramsFor(sfDir)
  private lazy val oracle: Set[Triple] = SequentialOracle.expectedTriples(p)
  private def edgeSet: Set[(String, String, String)] =
    oracle.map(t => (t.subj, t.pred, t.obj))

  test("company-subclass closure dim matches the hand-computed P279 walk") {
    // classParent(c) = c/2; chain reaches 5 exactly for {5,10,11,20,21,22,23}
    assert(Dicts.companySubclasses == Seq("Q5", "Q10", "Q11", "Q20", "Q21", "Q22", "Q23"))
  }

  test("kg07 flags exactly the event types in the company closure") {
    val companyUris = Dicts.companySubclasses.map(Ns.WD + _).toSet
    val rows = KgPipeline.kg07EventTypes(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val flagged = rows.map(r => r.getString(1) -> r.getInt(3)).toMap
    assert(flagged.forall { case (cls, f) => (f == 1) == companyUris.contains(cls) })
    assert(flagged.values.toSet == Set(0, 1)) // both branches exercised
  }

  test("kg11 company entities match the sequential chain over the oracle KG") {
    val es = edgeSet
    def objsOf(subj: String, pred: String): Set[String] =
      es.collect { case (s, pr, o) if s == subj && pr == pred => o }
    val companyUris = Dicts.companySubclasses.map(Ns.WD + _).toSet
    val expected = for {
      (ev, pr, ctx) <- es if pr == Ns.COY + "isIdentifiedBy" && ev.startsWith(Ns.events)
      sent <- objsOf(ctx, Ns.NIF + "subString") if sent.startsWith(Ns.sentences)
      phrase <- objsOf(sent, Ns.NIF + "subString") if phrase.startsWith(Ns.phrases)
      art <- objsOf(phrase, Ns.GN + "wikipediaArticle")
      wd <- objsOf(art, Ns.owlSameAs) if art.startsWith(Ns.wikipediaArticle)
      tpe <- objsOf(wd, "http://www.wikidata.org/prop/direct/P31")
      if companyUris.contains(tpe)
    } yield wd
    val got = KgPipeline.kg11CompanyEntities(spark, sfDir).collect().map(_.getString(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("kg15 co-occurrence matches the sequential bipartite projection") {
    val es = edgeSet
    def objsOf(subj: String, pred: String): Set[String] =
      es.collect { case (s, pr, o) if s == subj && pr == pred => o }
    val eventWd = (for {
      (ev, pr, ctx) <- es if pr == Ns.COY + "isIdentifiedBy" && ev.startsWith(Ns.events)
      sent <- objsOf(ctx, Ns.NIF + "subString") if sent.startsWith(Ns.sentences)
      phrase <- objsOf(sent, Ns.NIF + "subString") if phrase.startsWith(Ns.phrases)
      art <- objsOf(phrase, Ns.GN + "wikipediaArticle")
      wd <- objsOf(art, Ns.owlSameAs) if art.startsWith(Ns.wikipediaArticle)
    } yield (ev, wd)).toSet
    val byEvent = eventWd.groupBy(_._1).filter(_._2.size <= KgPipeline.Kg15MaxEntities)
    val expected = byEvent.values.flatMap { ws =>
      val sorted = ws.map(_._2).toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case ((a, b), xs) => (a, b, xs.size.toLong) }
      .toSeq.sortBy(p => (p._1, p._2))
    val got = KgPipeline.kg15EntityCooccurrence(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty) // the fixture really co-mentions entities
    assert(expected.exists(_._3 >= 2)) // some pair recurs across events
  }

  test("kg06 labels follow the reference UNION (article schema:name vs rdfs:label)") {
    val es = edgeSet
    val rows = KgPipeline.kg06TopicGraph(spark, sfDir).collect()
      .map(r => r.getString(0) -> (Option(r.getString(2)), r.getInt(4)))
      .toMap // topic -> (min label, is_pure_text); dup (topic,parent) rows agree on label
    val articleTopics = es.collect {
      case (s, pr, o) if pr == Ns.rdfType && o == Ns.COY + "ArticleTopic" => s
    }
    val artNames = es.collect {
      case (s, pr, o) if pr == Ns.SCHEMA + "name" && s.startsWith(Ns.wikipediaArticle) => s -> o
    }.toMap
    assert(articleTopics.nonEmpty)
    var checkedArticle = 0
    var checkedText = 0
    for ((topic, (label, pure)) <- rows) {
      if (articleTopics.contains(topic)) {
        assert(pure == 0)
        // expected: MIN over the topic's articles' schema:name values
        val expected = es.collect {
          case (s, pr, art) if s == topic && pr == Ns.GN + "wikipediaArticle" => artNames.get(art)
        }.flatten
        if (expected.nonEmpty) { assert(label.contains(expected.min)); checkedArticle += 1 }
        else assert(label.isEmpty) // article without schema:name -> no label row
      } else {
        assert(pure == 1)
        // pure TextTopic: own rdfs:label
        val expected = es.collect {
          case (s, pr, o) if s == topic && pr == Ns.rdfsLabel => o
        }
        assert(label.contains(expected.min))
        checkedText += 1
      }
    }
    assert(checkedArticle > 0 && checkedText > 0)
  }

  test("kg02/kg03 per-year counts match the sequential oracle") {
    val es = edgeSet
    // kg02: distinct events with a mention date, per year
    val evPairs = es.collect {
      case (s, p, o) if p == Ns.COY + "hasMentionDate" && s.startsWith(Ns.events) =>
        (s, o.take(4))
    }
    val expEv = evPairs.groupBy(_._2).view.mapValues(_.map(_._1).size.toLong).toMap
    val gotEv = KgPipeline.kg02EventsPerYear(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotEv == expEv)
    assert(gotEv.nonEmpty)
    // kg03: distinct (TextTopic, year) mention pairs, per year
    val topicUris = es.collect {
      case (s, p, o) if p == Ns.rdfType && o == Ns.COY + "TextTopic" => s
    }
    val topicPairs = es.collect {
      case (s, p, o) if p == Ns.COY + "hasMentionDate" && topicUris.contains(s) =>
        (s, o.take(4))
    }
    val expTop = topicPairs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val gotTop = KgPipeline.kg03TopicsPerYear(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotTop == expTop)
    assert(gotTop.nonEmpty)
  }

  test("kg04 closure matches a sequential BFS from the same seed") {
    val es = edgeSet
    val during = es.collect {
      case (s, p, o) if p == Ns.COY + "isOccuringDuring" => (s, o) // (child, parent)
    }
    // seed: most-referenced parent, ties to the lexicographically smallest
    val refCounts = during.groupBy(_._2).view.mapValues(_.size).toMap
    val maxN = refCounts.values.max
    val seedNode = refCounts.collect { case (par, n) if n == maxN => par }.min
    // BFS down the child edges
    val childrenOf = during.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var reach = Set(seedNode)
    var frontier = Set(seedNode)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(p => childrenOf.getOrElse(p, Set.empty)) -- reach
      reach ++= next
      frontier = next
    }
    // one row per distinct (event, pred, dateObj) triple → ym
    val exp = es.toSeq.collect {
      case (s, p, o) if p == Ns.COY + "hasMentionDate" && s.startsWith(Ns.events) &&
        reach.contains(s) => o.take(7)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = KgPipeline.kg04ClosureEventsPerMonth(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("kg05 WKT join chain matches the sequential comprehension") {
    val es = edgeSet
    def pairs(pred: String): Set[(String, String)] =
      es.collect { case (s, p, o) if p == pred => (s, o) }
    val evCtx = pairs(Ns.COY + "isIdentifiedBy")
    val sub = pairs(Ns.NIF + "subString")
    val ctxSent = sub.filter(_._2.startsWith(Ns.sentences))
    val sentPhrase = sub.filter(_._2.startsWith(Ns.phrases))
    val phraseArt = pairs(Ns.GN + "wikipediaArticle").filter(_._1.startsWith(Ns.phrases))
    val sameAs = pairs(Ns.owlSameAs).filter(_._1.startsWith(Ns.wikipediaArticle))
    val hasOsm = pairs(Ns.COY + "hasOsmElement")
    val wkt = pairs(Ns.GEO + "asWKT").groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val dates = pairs(Ns.COY + "hasMentionDate").filter(_._1.startsWith(Ns.events))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val artOsm: Set[(String, String)] =
      (for ((art, wd) <- sameAs; (holder, osm) <- hasOsm if holder == wd) yield (art, osm)) ++
        hasOsm.filter(_._1.startsWith(Ns.wikipediaArticle))
    val exp = for {
      (event, ctx) <- evCtx
      (c, sent) <- ctxSent if c == ctx
      (se, phrase) <- sentPhrase if se == sent
      (ph, article) <- phraseArt if ph == phrase
      (a, osm) <- artOsm if a == article
      w <- wkt.getOrElse(osm, Set.empty)
      date <- dates.getOrElse(event, Set.empty)
    } yield (date, event, article, w)
    val got = KgPipeline.kg05EventMapWkts(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("kg08 canonical clusters match sequential union-find (min canonical)") {
    val es = edgeSet
    val sameAs = es.collect { case (s, p, o) if p == Ns.owlSameAs => (s, o) }
    // union-find over the undirected sameAs graph
    val parent = scala.collection.mutable.Map.empty[String, String]
    def find(x: String): String = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: String, b: String): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    sameAs.foreach { case (a, b) => union(a, b) }
    val nodes = sameAs.flatMap { case (a, b) => Seq(a, b) }
    val exp = nodes.groupBy(find).flatMap { case (_, members) =>
      val canon = members.min
      members.map(_ -> canon)
    }
    val got = KgPipeline.kg08CanonicalClusters(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == exp)
    assert(got.values.toSet.size > 1) // multiple components exercised
  }

  test("kg09 partition metrics match the oracle triple set") {
    val exp = oracle.groupBy(t => (t.event_date, t.graph_module)).map { case (k, ts) =>
      k -> ((ts.size.toLong, ts.map(_.subj).size.toLong,
        ts.count(_.obj_is_iri).toLong))
    }
    val got = KgPipeline.kg09PartitionMetrics(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp)
    assert(got.size > 4)
  }

  test("kg12/kg13 cache counters match a sequential parse of the day pages") {
    // sequential expectation: every event-sentence/topic link is a request
    val perMonth = scala.collection.mutable.Map.empty[String, Seq[String]]
    val linksPerMonth = scala.collection.mutable.Map.empty[String, Long]
    var nEvents = 0L
    for ((y, m, dd) <- Synth.allDaysOf(p)) {
      val doc = SpanCodec.dayDoc(p, Synth.day(p, m, dd, y))
      val (events, topics, _) = DayPageParser.parse(doc)
      nEvents += events.size
      val ym = f"$y%04d-$m%02d"
      val hrefs = events.flatMap(_.sentences.flatMap(_.links).map(_.href)) ++
        topics.flatMap(_.linkHref)
      perMonth(ym) = perMonth.getOrElse(ym, Nil) ++ hrefs
      linksPerMonth(ym) = linksPerMonth.getOrElse(ym, 0L) +
        events.map(_.sentences.flatMap(_.links).size.toLong).sum
    }
    val m = KgPipeline.kg12MonthlyMetrics(spark, sfDir).collect()
      .map(r => r.getString(r.fieldIndex("ym")) -> r).toMap
    assert(m.keySet == perMonth.keySet)
    assert(m.values.map(_.getLong(m.head._2.fieldIndex("n_events"))).sum == nEvents)
    for ((ym, hrefs) <- perMonth) {
      val row = m(ym)
      def g(c: String) = row.getLong(row.fieldIndex(c))
      assert(g("n_article_requests") == hrefs.size)
      assert(g("article_cache_misses") == hrefs.distinct.size)
      assert(g("article_cache_hits") == hrefs.size - hrefs.distinct.size)
      assert(g("n_event_links") == linksPerMonth(ym))
      assert(row.schema.fieldNames.length >= 29) // >=28 counters + ym
      // KG-derived counters: exact against the sequential oracle triple set
      val C = Ns.COY
      def kgCnt(pred: String): Long =
        oracle.filter(t => t.pred == C + pred && t.event_date.startsWith(ym))
          .map(_.subj).size.toLong
      assert(g("n_topics_with_timespan") == kgCnt("hasTimespan"))
      assert(g("n_topics_with_location") == kgCnt("hasLocation"))
      assert(g("n_timespans_with_start_date") == kgCnt("hasStartDate"))
      assert(g("n_timespans_with_end_date") == kgCnt("hasEndDate"))
      assert(g("n_timespans_ongoing") == kgCnt("hasOngoingSpan"))
      assert(g("n_timespans_with_start_time") == kgCnt("hasStartTimestamp"))
      assert(g("n_timespans_with_end_time") == kgCnt("hasEndTimestamp"))
      assert(g("n_events_with_wd_type") == kgCnt("hasWikidataEventType"))
      // per-article flag counters are internally consistent
      assert(g("n_articles_with_wd") <= g("n_articles_resolved"))
      assert(g("n_articles_with_classes") <= g("n_articles_with_wd"))
      assert(g("n_wd_classes") >= g("n_articles_with_classes"))
      assert(g("n_child_links") >= g("n_articles_with_children"))
    }
    // window: final cumulative ratio equals the all-months total ratio
    val w = KgPipeline.kg13HitRatioWindow(spark, sfDir).collect()
    val totalHits = perMonth.values.map(h => (h.size - h.distinct.size).toLong).sum
    val totalReqs = perMonth.values.map(_.size.toLong).sum
    assert(w.last.getLong(w.last.fieldIndex("cumulative_ratio_e6")) ==
      1000000L * totalHits / totalReqs)
  }

  test("kg14 span inventory matches a sequential recompute and is order-sensitive") {
    // sequential truth straight from the synthesis model (no Spark)
    def coin(docId: String, i: Int, s: Span): Long = {
      val key = s"$docId|$i|${s.kind}|${Option(s.text).getOrElse("")}|" +
        s"${Option(s.media_ref).getOrElse("")}|${s.offset}"
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val days = Synth.allDaysOf(p).map { case (y, m, d) =>
      SpanCodec.dayDoc(p, Synth.day(p, m, d, y))
    }
    val arts = (0 until p.articles).map(i => SpanCodec.articleDoc(p, Synth.article(p, i)))
    val docs = days ++ arts
    case class Agg(nSpans: Long, docs: Set[String], nMedia: Long, checksum: Long)
    val expected = docs.flatMap(doc => doc.spans.zipWithIndex.map { case (s, j) =>
      (doc.doc_id, j + 1, s)
    }).groupBy(_._3.kind).map { case (kind, rows) =>
      kind -> Agg(rows.size.toLong, rows.map(_._1).toSet,
        rows.count(_._3.media_ref != null).toLong,
        rows.map { case (id, i, s) => coin(id, i, s) }.sum)
    }
    val got = KgPipeline.kg14SpanInventory(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        Agg(r.getLong(1), Set.empty, r.getLong(3), r.getLong(4)) ->
        r.getLong(2)).toMap
    assert(got.keys.map(_._1).toSet == expected.keySet)
    for (((kind, agg), nDocs) <- got) {
      val e = expected(kind)
      assert(agg.nSpans == e.nSpans, s"n_spans($kind)")
      assert(nDocs == e.docs.size.toLong, s"n_docs($kind)")
      assert(agg.nMedia == e.nMedia, s"n_media_refs($kind)")
      assert(agg.checksum == e.checksum, s"seq_checksum($kind)")
    }
    // both interleaved families present, media refs carried through
    assert(expected.keySet.intersect(Set("text", "wikilink", "media")).size == 3)
    assert(expected("wikilink").nMedia > 0)
    // ORDER sensitivity: swapping two spans of one doc changes its kind sums
    val doc = docs.find(_.spans.length >= 2).get
    val swapped = doc.spans.updated(0, doc.spans(1)).updated(1, doc.spans(0))
    val before = doc.spans.zipWithIndex.map { case (s, j) => coin(doc.doc_id, j + 1, s) }.sum
    val after = swapped.zipWithIndex.map { case (s, j) => coin(doc.doc_id, j + 1, s) }.sum
    assert(before != after)
  }

  test("m05 context alignment matches a sequential span-sequence scan") {
    val inline = Set("wikilink", "extlink", "media")
    val ctxKinds = Set("text", "ib_row")
    val days = Synth.allDaysOf(p).map { case (y, m, d) =>
      SpanCodec.dayDoc(p, Synth.day(p, m, d, y))
    }
    val arts = (0 until p.articles).map(i => SpanCodec.articleDoc(p, Synth.article(p, i)))
    val expected = (days ++ arts).flatMap { doc =>
      var ctx: Option[(Long, Span)] = None
      doc.spans.zipWithIndex.flatMap { case (s, j) =>
        val row = if (inline(s.kind))
          Seq((doc.doc_id, (j + 1).toLong, s.kind, s.media_ref,
            ctx.map(_._1), ctx.map(_._2.kind), ctx.map(_._2.text)))
        else Seq.empty
        if (ctxKinds(s.kind)) ctx = Some(((j + 1).toLong, s))
        row
      }
    }.sortBy(r => (r._1, r._2))
    val got = graft.multimodal.Multimodal.queries("m05_span_context_align")(spark, sfDir)
      .collect().map { r =>
        def opt[A](i: Int, f: Int => A): Option[A] = if (r.isNullAt(i)) None else Some(f(i))
        (r.getString(0), r.getLong(1), r.getString(2), r.getString(3),
          opt(4, r.getLong), opt(5, r.getString), opt(6, r.getString))
      }.toSeq
    assert(got == expected)
    assert(expected.nonEmpty)
    // fixture exercises all three inline kinds and both context kinds
    assert(expected.map(_._3).toSet == inline)
    assert(expected.flatMap(_._6).toSet == ctxKinds)
  }

  test("m06 media dedup matches a sequential ref aggregation; reuse is real") {
    val days = Synth.allDaysOf(p).map { case (y, m, d) =>
      SpanCodec.dayDoc(p, Synth.day(p, m, d, y))
    }
    val arts = (0 until p.articles).map(i => SpanCodec.articleDoc(p, Synth.article(p, i)))
    val refs = (days ++ arts).flatMap { doc =>
      doc.spans.filter(_.media_ref != null)
        .map(s => (s.kind, s.media_ref, doc.doc_id))
    }
    val expected = refs.groupBy(r => (r._1, r._2)).map { case ((k, ref), xs) =>
      (k, ref, xs.map(_._3).distinct.size.toLong, xs.size.toLong, xs.map(_._3).min)
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = graft.multimodal.Multimodal.queries("m06_media_dedup")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got == expected)
    // the operator is only meaningful if assets actually recur across docs
    assert(expected.exists(_._3 >= 2))
  }
}
