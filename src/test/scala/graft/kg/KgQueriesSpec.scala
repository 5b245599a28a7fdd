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
  private lazy val oracle: Set[Triple] = Oracle.expectedTriples(p)
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

  test("kg12/kg13 cache counters match a sequential parse of the day pages") {
    // sequential expectation: every event-sentence/topic link is a request
    val perMonth = scala.collection.mutable.Map.empty[String, Seq[String]]
    var nEvents = 0L
    for ((y, m, dd) <- Synth.allDaysOf(p)) {
      val doc = SpanCodec.dayDoc(p, Synth.day(p, m, dd, y))
      val (events, topics, _) = DayPageParser.parse(doc)
      nEvents += events.size
      val ym = f"$y%04d-$m%02d"
      val hrefs = events.flatMap(_.sentences.flatMap(_.links).map(_.href)) ++
        topics.flatMap(_.linkHref)
      perMonth(ym) = perMonth.getOrElse(ym, Nil) ++ hrefs
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
      assert(row.schema.fieldNames.length >= 14) // >=13 counters + ym
    }
    // window: final cumulative ratio equals the all-months total ratio
    val w = KgPipeline.kg13HitRatioWindow(spark, sfDir).collect()
    val totalHits = perMonth.values.map(h => (h.size - h.distinct.size).toLong).sum
    val totalReqs = perMonth.values.map(_.size.toLong).sum
    assert(w.last.getLong(w.last.fieldIndex("cumulative_ratio_e6")) ==
      1000000L * totalHits / totalReqs)
  }
}
