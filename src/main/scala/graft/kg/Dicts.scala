package graft.kg

/** Deterministic dictionary tables standing in for the reference's remote
  * services (FIXTURES.md §2): Wikidata labels / parent locations / OSM ids /
  * one-hop subgraphs / wd→wp urls, Falcon 2.0 entity linking, Nominatim
  * geocoding, and the place-template set. Key frequencies follow the corpus'
  * Zipf link skew (head entities referenced from most docs).
  */
object Dicts {
  import Synth._

  case class WdLabel(wd_id: String, label: String, lang: String)
  case class WdParentLoc(child_wd: String, parent_wd: String)
  case class WdOsm(wd_id: String, osm_rel_ids: Seq[String], osm_objs: Seq[String])
  case class OnehopRow(subj_wd: String, pred: String, obj: String,
      obj_is_iri: Boolean, obj_dtype: Option[String], obj_lang: Option[String])
  case class Wd2Wp(wd_id: String, wp_url: String)
  case class Falcon2(text: String, wd_entities: Seq[String])
  case class NominatimRow(key: String, osm_id: Long, osm_type: String, wkt: String)

  val placeTemplates: Set[String] = Set(
    "Template:Infobox_settlement", "Template:Infobox_country",
    "Template:Infobox_islands", "Template:Infobox_french_commune")

  val nClasses = 30

  def classLabels: Seq[WdLabel] =
    (1 to nClasses).flatMap { c =>
      Seq(WdLabel(s"Q$c", s"instance class $c", "en"),
        WdLabel(s"Q$c", s"Klasse $c", "de")) // filtered out by lang='en'
    }

  def wdIdOf(articleIdx: Int): String = s"Q${articleIdx + 100}"

  /** P279 subclass edge among the synthetic classes: a binary tree rooted at
    * Q1 (class c subclass-of c/2). Deterministic so the closure below is the
    * pre-baked equivalent of walking wdt:P279 on real Wikidata.
    */
  def classParent(c: Int): Option[Int] = if (c <= 1) None else Some(c / 2)

  /** The class declared P460-equivalent to wd:Q783794 ("company"). */
  val companyEquivalentClass = 5 // closure = {Q5, Q10, Q11, Q20, Q21, Q22, Q23}

  /** `company_subclasses` dim (FIXTURES.md §2): classes whose P279 chain
    * reaches the company-equivalent class — the pre-baked closure of the
    * reference's ASK on wdt:P279-star / wdt:P460-opt to wd:Q783794
    * (company_events_per_month_diagram.py:184-189).
    */
  def companySubclasses: Seq[String] =
    (1 to nClasses).filter { c =>
      Iterator.iterate(Option(c))(_.flatMap(classParent))
        .takeWhile(_.isDefined).map(_.get)
        .contains(companyEquivalentClass)
    }.map(c => s"Q$c")

  def companySubclassesDs(spark: org.apache.spark.sql.SparkSession):
      org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    spark.createDataset(companySubclasses)
  }

  /** P31 classes of an article's wd entity (1-2, hash-chosen). */
  def p31ClassesFor(i: Int): Seq[String] = {
    val s = h(23L, i.toLong)
    (0 until (1 + pick(2, s, 1))).map(j => s"Q${1 + pick(nClasses, s, 2, j.toLong)}").distinct
  }

  /** One-hop subgraph rows for Q(i+100); head entities (low idx) are large —
    * the skew hotspot (SURVEY.md §4.1).
    */
  def onehopFor(i: Int): Seq[OnehopRow] = {
    val wd = wdIdOf(i)
    val subj = Ns.WD + wd
    val s = h(29L, i.toLong)
    val p31 = p31ClassesFor(i).map(c =>
      OnehopRow(subj, Ns.WDT + "P31", Ns.WD + c, obj_is_iri = true, None, None))
    val extraN = if (i < 5) 40 else 2 + pick(4, s, 1)
    val extra = (0 until extraN).map { j =>
      val js = h(s, j.toLong)
      val pred = s"${Ns.WDT}P${17 + pick(40, js, 1)}"
      pick(10, js, 2) match {
        case k if k < 5 =>
          OnehopRow(subj, pred, Ns.WD + s"Q${100 + pick(5000, js, 3)}", obj_is_iri = true, None, None)
        case k if k < 8 =>
          OnehopRow(subj, pred, s"value ${pick(1000, js, 4)}", obj_is_iri = false,
            Some(Ns.xsdString), Some("en"))
        case _ =>
          OnehopRow(subj, pred, s"${pick(10000, js, 5)}.${pick(100, js, 6)}", obj_is_iri = false,
            Some(Ns.xsdDecimal), None)
      }
    }
    p31 ++ extra
  }

  /** OSM ids from wd (P402 relation ids / P10689 objects), including some
    * invalid entries the validation filters drop (wikidataService.py:182-224).
    */
  def osmFor(i: Int): (Seq[String], Seq[String]) = {
    val s = h(31L, i.toLong)
    pick(10, s, 1) match {
      case k if k < 4 => (Seq((i * 7 + 11).toString), Nil)
      case k if k < 6 => (Nil, Seq(s"way/${i * 3 + 5}"))
      case 6 => (Nil, Seq(s"node/${i * 3 + 7}", s"area/${i}")) // area/ invalid
      case _ => (Nil, Nil)
    }
  }

  /** Parent location edge for the P1647+ closure dictionary. */
  def parentLocFor(p: Params, i: Int): Option[WdParentLoc] =
    if (i > 0 && chance(2, 3, h(37L, i.toLong))) {
      val parent = i / 4
      val pa = article(p, parent)
      if (pa.wdId.isDefined && parent != i) Some(WdParentLoc(wdIdOf(i), wdIdOf(parent)))
      else None
    } else None

  /** Falcon 2.0 entity linking keyed by raw location-value text
    * (falcon2Service.py:45-91).
    */
  def falconEntitiesFor(nArticles: Int, text: String): Seq[String] = {
    val s = h(41L, text.hashCode.toLong)
    val n = pick(3, s, 1) // 0-2 entities
    (0 until n).map(j => Ns.WD + wdIdOf(zipf(nArticles, s, 2, j.toLong))).distinct
  }

  /** The dbpedia half of the same Falcon 2.0 response
    * (falcon2Service.py:72-74): carried on the location row
    * (objects/infoboxRow.py:17-22) for row-model parity; like the reference,
    * never emitted to RDF (outputRdf.py has no consumer).
    */
  def falconDbpediaFor(nArticles: Int, text: String): Seq[String] = {
    val s = h(43L, text.hashCode.toLong)
    val n = pick(3, s, 1) // 0-2 entities, independent of the wd list
    (0 until n)
      .map(j => "http://dbpedia.org/resource/Entity_" + zipf(nArticles, s, 2, j.toLong))
      .distinct
  }

  // ---- distributed dictionary Datasets (the production join inputs) -------
  // Built task-side from the deterministic generator — the Spark-native
  // stand-in for `spark.read.parquet(dict_table)`. One row per wd entity /
  // article; at real scale these are table scans with the same schemas.

  /** Per-wd-entity bundle consumed by the J1/J2/J3/J4/J6 broadcast join. */
  case class WdBundle(wd: String, classes: Seq[ClassLabel],
      parent_loc_uris: Seq[String], osm_elements: Seq[KOsmElement])
  /** Article existence + location flag (J7 membership / child filtering). */
  case class ArtFlag(art_url: String, loc_flag: Boolean)

  def wdBundles(spark: org.apache.spark.sql.SparkSession, p: Params):
      org.apache.spark.sql.Dataset[WdBundle] = {
    import spark.implicits._
    val enLabels = classLabels.filter(_.lang == "en").map(l => l.wd_id -> l.label).toMap
    spark.range(p.articles).flatMap { li =>
      val i = li.toInt
      Synth.article(p, i).wdId.map { wd =>
        val classes = p31ClassesFor(i).flatMap(c => enLabels.get(c).map(l => ClassLabel(c, l)))
        val parents = parentLocFor(p, i).map(e => Ns.WD + e.parent_wd).toSeq
        val (relids, objs) = osmFor(i)
        WdBundle(wd, classes, parents, Enrich.resolveOsm(relids, objs))
      }
    }
  }

  def artFlagsDs(spark: org.apache.spark.sql.SparkSession, p: Params):
      org.apache.spark.sql.Dataset[ArtFlag] = {
    import spark.implicits._
    spark.range(p.articles).flatMap { li =>
      val a = Synth.article(p, li.toInt)
      if (a.exists && !a.isNamespace)
        Some(ArtFlag(a.url, ArticleParser.locationFlag(a.ibClasses, a.templates, placeTemplates)))
      else None
    }
  }

  def wd2wpDs(spark: org.apache.spark.sql.SparkSession, p: Params):
      org.apache.spark.sql.Dataset[Wd2Wp] = {
    import spark.implicits._
    spark.range(p.articles).flatMap { li =>
      val a = Synth.article(p, li.toInt)
      if (a.exists && !a.isNamespace) a.wdId.map(w => Wd2Wp(w, a.url)) else None
    }
  }

  /** Nominatim top-1 geocoding (nominatimService.py:47-51); ~10% misses. */
  def nominatimFor(key: String): Option[KOsmElement] = {
    val s = h(43L, key.hashCode.toLong)
    if (chance(1, 10, s, 1)) None
    else {
      val id = 1 + (Math.floorMod(h(s, 2), 1000000L))
      val tpes = Array("relation", "way", "node")
      val tpe: String =
        if (key.startsWith("relation/")) "relation"
        else if (key.startsWith("way/")) "way"
        else if (key.startsWith("node/")) "node"
        else tpes(pick(3, s, 3))
      val x = (pick(3600, s, 4) - 1800) / 10.0
      val y = (pick(1700, s, 5) - 850) / 10.0
      Some(KOsmElement(id, tpe, f"POINT($x%.1f $y%.1f)"))
    }
  }
}
