package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.broadcast.Broadcast

/** Enriched article after the dictionary joins J1-J7 (SURVEY.md §2.4):
  * Wikidata P31 classes + labels, parent locations, OSM elements (via
  * Nominatim), Falcon2 entities (via wd→wp, location-flag filtered), and the
  * resolved location-row child articles (the reference's bounded
  * `article_recursions=2`, unrolled — children lists are traversed only for
  * depth-1 mentions).
  */
case class ClassLabel(id: String, label: String)
case class LocLinkWkt(osmId: Long, osmType: String, wkt: String)
case class EnrichedArticle(
    url: String,
    name: Option[String],
    headline: Option[String],
    datePublished: Option[String],
    dateModified: Option[String],
    wdUri: Option[String],
    locationFlag: Boolean,
    pageCoordinates: Seq[Double],
    ibCoordinates: Seq[Double],
    rawInfobox: String,
    locLabel: Option[String],
    locValue: Option[String],
    locLinkWkts: Seq[LocLinkWkt],
    falconEntityUris: Seq[String],
    classes: Seq[ClassLabel],
    parentLocUris: Seq[String],
    osmElements: Seq[KOsmElement],
    timeRows: Seq[IbTimeRow],
    dateRows: Seq[IbDateRow],
    microDtstart: Option[String],
    microDtend: Option[String],
    childUrls: Seq[String])

/** Dictionary bundle. In this sandbox the dictionaries are deterministic
  * synthetic tables small enough to broadcast — the map-side hash join below
  * is exactly what Catalyst's BroadcastHashJoinExec executes. At 10^12-doc
  * scale the one-hop dictionary exceeds broadcast size: that join runs as a
  * shuffle join through [[graft.plans.SaltedJoin]] (hot-key replication), and
  * ohg emission already goes through a real DataFrame join in TripleEmit.
  */
case class DictMaps(
    wdOsm: Map[String, (Seq[String], Seq[String])], // wd -> (rel ids, objs)
    parentLoc: Map[String, Seq[String]], // wd -> parent wds
    p31: Map[String, Seq[String]], // wd -> class ids
    classLabels: Map[String, String], // class id -> en label
    wd2wp: Map[String, String], // wd -> wp url
    artLocFlag: Map[String, Boolean], // existing article url -> location flag
    placeTemplates: Set[String],
    nArticles: Int) // corpus article-pool size (falcon dictionary domain)

object Enrich {

  private val objRe = "^(way|node)/\\d+$".r

  def bareWd(uri: String): String = Uris.urlBasename(uri)

  /** Enrich parsed articles with all dictionary joins — one mapPartitions
    * pass, zero shuffle (J9's LRU memo is replaced by the upstream
    * dropDuplicates("url")).
    */
  def enrich(parsed: Dataset[ArticleRaw], dicts: Broadcast[DictMaps])(
      implicit spark: SparkSession): Dataset[EnrichedArticle] = {
    import spark.implicits._
    parsed.mapPartitions { it =>
      val d = dicts.value
      it.map(a => enrichOne(a, d))
    }
  }

  def enrichOne(a: ArticleRaw, d: DictMaps): EnrichedArticle = {
    val locFlag = ArticleParser.locationFlag(a.ibClasses, a.templates, d.placeTemplates)
    val wdUri = a.wikidataEntity
    val wdBare = wdUri.map(bareWd)

    // J4-derived P31 classes + J1 label join (en only)
    val classes = wdBare.toSeq
      .flatMap(w => d.p31.getOrElse(w, Nil))
      .flatMap(c => d.classLabels.get(c).map(l => ClassLabel(c, l)))

    // J2 parent locations (keys only are consumed downstream, outputRdf.py:540-557)
    val parentLocs = wdBare.toSeq.flatMap(w => d.parentLoc.getOrElse(w, Nil))
      .map(p => Ns.WD + p)

    // J3 + J6: OSM ids -> Nominatim lookups (relation ids win, elif semantics
    // articleExtractor.py:184-197); validation filters per wikidataService.py:182-224
    val (relids, objs) = wdBare.flatMap(d.wdOsm.get).getOrElse((Nil, Nil))
    val validRelids = relids.filter(r => r.nonEmpty && r.forall(_.isDigit))
    val validObjs = objs.filter(o => objRe.pattern.matcher(o).matches())
    val osmKeys =
      if (validRelids.nonEmpty) validRelids.map("relation/" + _)
      else validObjs
    val osmElements = osmKeys.flatMap(Dicts.nominatimFor)

    // location row (P13)
    val locRow = ArticleParser.locationRow(a)
    val locValue = locRow.map(_.value).filter(_.nonEmpty)
    val locLinks = locRow.map(_.links).getOrElse(Nil)

    // J6 per-link WKTs (always computed when a location value exists)
    val locLinkWkts = if (locValue.isDefined)
      locLinks.flatMap(l => Dicts.nominatimFor(l.text)).map(e => LocLinkWkt(e.osmId, e.osmType, e.wkt))
    else Nil

    // J5 Falcon2 on the raw location value text
    val falconEntities = locValue.toSeq.flatMap(v => Dicts.falconEntitiesFor(d.nArticles, v))

    // children (depth+1): loc-row link articles (any flag) + falcon articles
    // (location-flag filtered, articleExtractor.py:546-550); deduped like the
    // reference's set() (outputRdf.py:185-189)
    val linkChildren = if (locValue.isDefined)
      locLinks.map(_.href).filter(DayPageParser.urlIsArticle)
        .filter(d.artLocFlag.contains)
    else Nil
    val falconChildren = falconEntities
      .flatMap(e => d.wd2wp.get(bareWd(e)))
      .filter(u => d.artLocFlag.get(u).contains(true))
    val children = (falconChildren ++ linkChildren).distinct.sorted

    val (timeRows, dateRows, _, _) = ArticleParser.extractDateTimeRows(a)
    val vevent = a.ibClasses.contains("vevent")

    EnrichedArticle(
      url = a.url,
      name = a.name, headline = a.headline,
      datePublished = a.datePublished, dateModified = a.dateModified,
      wdUri = wdUri,
      locationFlag = locFlag,
      pageCoordinates = a.pageCoordinates.getOrElse(Nil),
      ibCoordinates = a.ibCoordinates.getOrElse(Nil),
      rawInfobox = a.rawInfobox,
      locLabel = locRow.map(_.label),
      locValue = locValue,
      locLinkWkts = locLinkWkts,
      falconEntityUris = falconEntities,
      classes = classes,
      parentLocUris = parentLocs,
      osmElements = osmElements,
      timeRows = timeRows,
      dateRows = dateRows,
      microDtstart = if (vevent) a.microDtstart else None,
      microDtend = if (vevent) a.microDtend else None,
      childUrls = children)
  }

  /** Build the dictionary bundle for a corpus (driver-side, then broadcast). */
  def buildDicts(p: Synth.Params): DictMaps = {
    val arts = (0 until p.articles).map(i => Synth.article(p, i))
    val withWd = arts.filter(a => a.wdId.isDefined)
    DictMaps(
      wdOsm = withWd.map(a => a.wdId.get -> Dicts.osmFor(a.idx)).toMap,
      parentLoc = withWd.flatMap(a => Dicts.parentLocFor(p, a.idx))
        .groupBy(_.child_wd).view.mapValues(_.map(_.parent_wd)).toMap,
      p31 = withWd.map(a => a.wdId.get -> Dicts.p31ClassesFor(a.idx)).toMap,
      classLabels = Dicts.classLabels.filter(_.lang == "en").map(l => l.wd_id -> l.label).toMap,
      wd2wp = withWd.filter(a => a.exists && !a.isNamespace)
        .map(a => a.wdId.get -> a.url).toMap,
      artLocFlag = arts.filter(a => a.exists && !a.isNamespace)
        .map(a => a.url -> ArticleParser.locationFlag(
          a.ibClasses, a.templates, Dicts.placeTemplates)).toMap,
      placeTemplates = Dicts.placeTemplates,
      nArticles = p.articles)
  }
}
