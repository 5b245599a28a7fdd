package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The KG-construction dataflow (SURVEY.md §3.1 Spark shape):
  *
  *   docs(day pages)    —mapPartitions P1-P9→  events + topics
  *   docs(article pages)—mapPartitions P10-16→ ArticleRaw —dedup urls→
  *   —broadcast dict joins J1-J7→ EnrichedArticle
  *   topics ⋈ articles → TopicInfo (URI needs the resolved article)
  *   events ⋈ per-doc topic map ⋈ per-event article map —flatMap→ triples
  *   mentions(url,date) ⋈ articles —flatMap→ article/place/osm triples
  *   mentions ⋈ onehop dictionary → ohg triples
  *   union → distinct → partitioned by (event_date, graph_module)
  *
  * Narrow stages end at exactly three shuffle families: the per-doc/per-event
  * groupings (keyed by doc_id — co-partitioned), the mention distinct, and
  * the final distinct+write exchange. Dictionaries broadcast; the one-hop
  * join is the Zipf-skew hotspot and is AQE/salting-eligible.
  */
object Pipeline {

  case class ParsedDay(events: Seq[KEvent], topics: Seq[KTopic])
  case class DocTopics(doc_id: String, infos: Seq[Emit.TopicInfo])
  case class EventArts(doc_id: String, eventIndex: Int, arts: Seq[(String, Emit.ArtLite)])
  case class Mention(url: String, date: String, isTopic: Boolean,
      forcePlace: Boolean, traverseChildren: Boolean)

  /** Distributed deterministic corpus: one task-side render per index — no
    * driver-side data, invariant to partitioning.
    */
  def dayDocs(spark: SparkSession, p: Synth.Params): Dataset[SpanDoc] = {
    import spark.implicits._
    val days = Synth.daysOf(p)
    spark.createDataset(days.indices).repartition(spark.sparkContext.defaultParallelism)
      .map { i => val (m, d) = days(i); SpanCodec.dayDoc(p, Synth.day(p, m, d)) }
  }

  def articleDocs(spark: SparkSession, p: Synth.Params): Dataset[SpanDoc] = {
    import spark.implicits._
    spark.range(p.articles).repartition(spark.sparkContext.defaultParallelism)
      .map(i => SpanCodec.articleDoc(p, Synth.article(p, i.toInt)))
  }

  case class Stage(
      events: Dataset[KEvent],
      topics: Dataset[KTopic],
      articles: Dataset[EnrichedArticle],
      topicRes: Dataset[(KTopic, Emit.TopicInfo)],
      docTopics: Dataset[DocTopics])

  def build(spark: SparkSession, sfDir: String): Stage = {
    import spark.implicits._
    val p = Synth.paramsFor(sfDir)

    val parsedDays = dayDocs(spark, p)
      .map(d => { val (e, t, _) = DayPageParser.parse(d); ParsedDay(e, t) })
      .persist(StorageLevel.MEMORY_AND_DISK)
    val events = parsedDays.flatMap(_.events)
    val topics = parsedDays.flatMap(_.topics)

    val dicts = spark.sparkContext.broadcast(Enrich.buildDicts(p))
    val articlesRaw = articleDocs(spark, p)
      .flatMap(ArticleParser.parse(_))
      .dropDuplicates("url") // J9: the reference's LRU memo, Spark-native
    val articles = Enrich.enrich(articlesRaw, dicts)(spark)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // topic URI needs the resolved article (outputRdf.py:80-89)
    val artKeyed = articles.map(a =>
      (a.url, Emit.ArtLite(a.url, a.wdUri, a.locationFlag, a.parentLocUris), a.classes))
    val topicRes = topics
      .joinWith(artKeyed, topics("linkHref") === artKeyed("_1"), "left_outer")
      .map { case (t, art) =>
        val (uri, artUrl, classes) =
          if (art == null) (Uris.textTopicUri(t.text), None, Seq.empty[ClassLabel])
          else (Uris.articleTopicUri(art._2.url), Some(art._2.url), art._3)
        (t, Emit.TopicInfo(t.topicId, uri, artUrl, classes, t.parentTopicIds))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)

    val docTopics = topicRes
      .groupByKey(_._1.doc_id)
      .mapGroups((k, it) => DocTopics(k, it.map(_._2).toSeq.sortBy(_.topicId)))

    Stage(events, topics, articles, topicRes, docTopics)
  }

  def triples(spark: SparkSession, sfDir: String): Dataset[Triple] = {
    import spark.implicits._
    val p = Synth.paramsFor(sfDir)
    val st = build(spark, sfDir)

    // ---- event triples ----------------------------------------------------
    val evWithTopics = st.events
      .joinWith(st.docTopics, st.events("doc_id") === st.docTopics("doc_id"), "left_outer")
      .map { case (e, dt) =>
        (e, if (dt == null) Seq.empty[Emit.TopicInfo] else dt.infos)
      }

    val artLite = st.articles.map(a =>
      Emit.ArtLite(a.url, a.wdUri, a.locationFlag, a.parentLocUris))
    val eventLinkRefs = st.events.flatMap(e =>
      e.sentences.flatMap(_.links).map(l => (e.doc_id, e.eventIndex, l.href)).distinct)
    val eventArts = eventLinkRefs
      .joinWith(artLite, eventLinkRefs("_3") === artLite("url"))
      .groupByKey(x => (x._1._1, x._1._2))
      .mapGroups { (key, it) =>
        EventArts(key._1, key._2, it.map(x => (x._1._3, x._2)).toSeq.sortBy(_._1))
      }

    val eventTriples = evWithTopics
      .joinWith(eventArts,
        evWithTopics("_1.doc_id") === eventArts("doc_id") &&
          evWithTopics("_1.eventIndex") === eventArts("eventIndex"),
        "left_outer")
      .flatMap { case ((e, infos), ea) =>
        val arts = if (ea == null) Map.empty[String, Emit.ArtLite]
          else ea.arts.toMap
        Emit.eventTriples(e, infos.map(i => i.topicId -> i).toMap, arts)
      }

    // ---- topic triples ----------------------------------------------------
    val topicWithDoc = st.topicRes
      .joinWith(st.docTopics, st.topicRes("_1.doc_id") === st.docTopics("doc_id"), "left_outer")
      .map { case ((t, info), dt) =>
        (t, info, if (dt == null) Seq.empty[Emit.TopicInfo] else dt.infos)
      }
    val topicTriples = topicWithDoc
      .joinWith(st.articles, topicWithDoc("_2.artUrl") === st.articles("url"), "left_outer")
      .flatMap { case ((t, info, infos), art) =>
        Emit.topicTriples(t, info, infos.map(i => i.topicId -> i).toMap, Option(art))
      }

    // ---- article mentions → article/place/osm triples ----------------------
    val evMentions = st.events
      .flatMap(e => e.sentences.flatMap(_.links).map(l => (l.href, e.date)))
      .distinct()
      .joinWith(st.articles, col("_1") === st.articles("url"))
      .map { case ((u, d), _) => Mention(u, d, isTopic = false, forcePlace = false, traverseChildren = true) }
    val topMentions = st.topicRes
      .filter(_._2.artUrl.isDefined)
      .map(x => Mention(x._2.artUrl.get, x._1.date, isTopic = true, forcePlace = false, traverseChildren = true))
    val depth1 = evMentions.union(topMentions).distinct()

    val childMentions = depth1
      .joinWith(st.articles, depth1("url") === st.articles("url"))
      .flatMap { case (m, a) =>
        val hasPlace = a.locationFlag || m.isTopic || m.forcePlace
        if (hasPlace)
          a.childUrls.map(c => Mention(c, m.date, isTopic = false, forcePlace = true, traverseChildren = false))
        else Nil
      }
      .distinct()

    val mentions = depth1.union(childMentions).distinct()
    val articleTriples = mentions
      .joinWith(st.articles, mentions("url") === st.articles("url"))
      .flatMap { case (m, a) =>
        Emit.articleTriples(a, m.date, m.isTopic, m.forcePlace, m.traverseChildren)
      }

    // ---- ohg module: one-hop dictionary join (the skew hotspot) ------------
    val onehop = spark.range(p.articles)
      .flatMap(i => if (Synth.article(p, i.toInt).wdId.isDefined) Dicts.onehopFor(i.toInt) else Nil)
    val wdMentions = mentions
      .joinWith(st.articles, mentions("url") === st.articles("url"))
      .flatMap { case (m, a) => a.wdUri.map(w => (w, m.date)) }
      .distinct()
    val ohgTriples = wdMentions
      .joinWith(broadcast(onehop), wdMentions("_1") === onehop("subj_wd"))
      .map { case ((_, date), r) =>
        Triple("ohg", r.subj_wd, r.pred, r.obj, r.obj_is_iri,
          r.obj_dtype.orNull, r.obj_lang.orNull, date)
      }

    eventTriples
      .unionByName(topicTriples)
      .unionByName(articleTriples)
      .unionByName(ohgTriples)
      .dropDuplicates() // D1: rdflib graph set semantics
  }
}
