package graft.kg

/** Deterministic synthetic WikiEvents corpus (FIXTURES.md; BASELINE.json
  * north rule: no external data — seed → identical bytes).
  *
  * The generator builds a ground-truth MODEL (day trees of topics/events,
  * article metadata, dictionary tables) from pure hash functions of indices,
  * then RENDERS the model into the span-document shape the engine consumes
  * (doc_id, spans array). Tests derive expected triples from the model
  * independently of the parse path, so comparing engine output vs model
  * oracle exercises parsing + enrichment + emission end to end.
  *
  * Everything is computed per-index with splitmix64 — no sequential RNG
  * state — so generation distributes over Spark tasks and is invariant to
  * partitioning.
  */
object Synth {

  // ---- deterministic hashing --------------------------------------------
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def h(parts: Long*): Long = parts.foldLeft(0x5eed5eedL)((a, p) => mix(a ^ mix(p)))
  /** uniform in [0, n) */
  def pick(n: Int, parts: Long*): Int = (Math.floorMod(h(parts: _*), n.toLong)).toInt
  /** true with probability num/den */
  def chance(num: Int, den: Int, parts: Long*): Boolean = pick(den, parts: _*) < num

  /** Zipf-ish skewed pick in [0, n): square the uniform to pile onto low
    * indices (head entities) — exercises the salted skew-join path.
    */
  def zipf(n: Int, parts: Long*): Int = {
    val u = pick(1000000, parts: _*) / 1000000.0
    math.min(n - 1, (u * u * n).toInt)
  }

  // ---- corpus parameters --------------------------------------------------
  case class Params(months: Int, articles: Int, year: Int = 2022, years: Int = 1,
      density: Int = 1) // multiplies events/topics per day (bench corpus sizing)

  /** Scale from the sf dir name so driver queries scale with the suite. */
  def paramsFor(sfDir: String): Params = {
    val sf = sfDir.split("sf").lastOption.getOrElse("0.001")
    sf match {
      // growth-lap points (BENCH/BASELINE.md §growth): 2× and 4× the sf0.1
      // corpus via extra years of day pages + proportional article pools
      case s if s.startsWith("0.4") => Params(months = 8, articles = 4800, years = 4)
      case s if s.startsWith("0.2") => Params(months = 8, articles = 2400, years = 2)
      case s if s.startsWith("0.1") => Params(months = 8, articles = 1200)
      case s if s.startsWith("0.01") => Params(months = 4, articles = 500)
      case _ => Params(months = 2, articles = 240)
    }
  }

  val monthNames: Array[String] = Array("January", "February", "March", "April", "May",
    "June", "July", "August", "September", "October", "November", "December")
  private val monthDays = Array(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)

  val categories: Array[String] = Array(
    "Armed conflicts and attacks", "Disasters and accidents",
    "Health and environment", "Law and crime", "Politics and elections")

  private val words = Array("border", "storm", "court", "summit", "strike", "quake",
    "election", "treaty", "flood", "protest", "wildfire", "outbreak", "ceasefire",
    "blockade", "referendum", "eruption", "landslide", "sanction", "evacuation", "accord")

  // ---- articles -----------------------------------------------------------
  case class MArticle(
      idx: Int,
      slug: String,
      exists: Boolean, // false → no JSON-LD → get_article returns None
      isNamespace: Boolean, // "Xxx:Slug" url → rejected by article-url test
      name: String,
      headline: String,
      datePublished: Option[String],
      dateModified: Option[String],
      wdId: Option[String], // "Q<i>"
      templates: Seq[String],
      ibClasses: Seq[String],
      locationValue: Option[String],
      locationLinks: Seq[(Int, Int)], // (offset-in-value, target article idx)
      dateRows: Seq[(String, String)],
      timeRows: Seq[(String, String)],
      dtstart: Option[String],
      dtend: Option[String],
      pageCoord: Option[(String, String)], // DMS lat/lon
      ibCoord: Option[(String, String)]) {
    def url: String =
      if (isNamespace) s"https://en.wikipedia.org/wiki/Category:$slug"
      else s"https://en.wikipedia.org/wiki/$slug"
  }

  private val dmsLats = Array("36°13′50.3″N", "48°51′N", "12°58′12″S", "1°17′S", "40°42′46″N")
  private val dmsLons = Array("3°41′W", "2°21′E", "77°35′24″E", "36°49′E", "74°0′22″W")

  private val dateRowLabels = Array("Date", "Date(s)", "First outbreak", "Start Date")
  private val dateRowValues = Array(
    "1 January 2022", "January 5, 2022", "17 January 2022 – present",
    "1 – 12 February 2022", "January 3 – February 9, 2022",
    "3 March 2022 – 14 April 2022", "December 30, 2021-January 1, 2022",
    "as of 3 February 2022", "spring of 2022", "22 March 2022",
    "5 April 2022 – ongoing", "April 2/2022")
  private val timeRowValues = Array(
    "10:41 a.m. – 9:22 p.m. (CST)", "14:29 – 14:50 (UTC+4:00)",
    "About 1:00 a.m. (local time, UTC+3)", "c. 1:15 p.m.", "13:05",
    "9:00 am to 5:30 pm", "midnight")

  /** Generator's location intent for article i — the hand-label ground
    * truth the location-classifier eval (kg10) scores against. Single
    * definition so the generator and the eval cannot drift.
    */
  def isLocationIntent(i: Int): Boolean = chance(2, 5, h(7L, i.toLong), 1)

  def article(p: Params, i: Int): MArticle = {
    val s = h(7L, i.toLong)
    val isLocation = isLocationIntent(i) // 40% of articles are places
    val exists = !chance(1, 20, s, 2) // 5% redirect-ish (no JSON-LD)
    val isNamespace = chance(1, 25, s, 3) // 4% namespace links
    val slug = s"${words(pick(words.length, s, 4)).capitalize}_${words(pick(words.length, s, 5))}_$i"
    val name = slug.replace('_', ' ')
    val hasWd = exists && !chance(1, 10, s, 6)
    val wd = if (hasWd) Some(s"Q${i + 100}") else None
    val templates =
      (if (isLocation && chance(1, 2, s, 7)) Seq(s"Template:Infobox_settlement") else Seq(s"Template:Infobox_event")) ++
        (if (chance(1, 5, s, 8)) Seq("Template:Infobox_storm") else Nil) ++
        Seq(s"Template:Reflist")
    val ibClasses = Seq("infobox") ++
      (if (chance(3, 5, s, 9)) Seq("vevent") else Nil) ++
      (if (isLocation && chance(1, 2, s, 10)) Seq("ib-settlement") else Nil)
    val emptyIb = chance(1, 20, s, 11) // 5% empty infobox
    val hasLocRow = !emptyIb && chance(3, 4, s, 12)
    // location value links point at lower-indexed articles (acyclic recursion)
    val nLocLinks = if (hasLocRow) 1 + pick(2, s, 13) else 0
    val locTargets = (0 until nLocLinks).map(j => pick(math.max(i, 1), s, 14, j.toLong)).distinct
    val locParts = locTargets.map(t => s"City_${t}".replace('_', ' '))
    val locText = if (hasLocRow) Some((locParts :+ s"Region ${pick(50, s, 15)}").mkString(", ")) else None
    val locLinks = {
      var off = 0
      locTargets.zip(locParts).map { case (t, part) =>
        val o = off; off += part.length + 2; (o, t)
      }
    }
    val nDateRows = if (emptyIb) 0 else pick(3, s, 16)
    val dateRows = (0 until nDateRows).map { j =>
      (dateRowLabels(pick(dateRowLabels.length, s, 17, j.toLong)),
        dateRowValues(pick(dateRowValues.length, s, 18, j.toLong)))
    }.distinctBy(_._1)
    val timeRows = if (!emptyIb && chance(1, 3, s, 19))
      Seq(("Time", timeRowValues(pick(timeRowValues.length, s, 20)))) else Nil
    val hasVevent = ibClasses.contains("vevent")
    val dtstart = if (hasVevent && chance(1, 2, s, 21))
      Some(f"${p.year}%04d-${1 + pick(p.months, s, 22)}%02d-${1 + pick(28, s, 23)}%02d") else None
    val dtend = if (hasVevent && dtstart.isDefined && chance(1, 3, s, 24))
      Some(f"${p.year}%04d-${1 + pick(p.months, s, 25)}%02d-${1 + pick(28, s, 26)}%02d") else None
    MArticle(
      idx = i, slug = slug, exists = exists, isNamespace = isNamespace,
      name = name, headline = s"Headline about $name",
      datePublished = if (chance(4, 5, s, 27)) Some(f"2021-12-${1 + pick(28, s, 28)}%02dT08:00:00Z") else None,
      dateModified = if (chance(3, 5, s, 29)) Some(f"${p.year}-01-${1 + pick(28, s, 30)}%02dT09:30:00Z") else None,
      wdId = wd,
      templates = templates,
      ibClasses = ibClasses,
      locationValue = locText,
      locationLinks = locLinks,
      dateRows = dateRows,
      timeRows = timeRows,
      dtstart = dtstart, dtend = dtend,
      pageCoord = if (isLocation && chance(2, 3, s, 31))
        Some((dmsLats(pick(dmsLats.length, s, 32)), dmsLons(pick(dmsLons.length, s, 33)))) else None,
      ibCoord = if (hasLocRow && chance(1, 3, s, 34))
        Some((dmsLats(pick(dmsLats.length, s, 35)), dmsLons(pick(dmsLons.length, s, 36)))) else None)
  }

  // ---- day trees -----------------------------------------------------------
  sealed trait MNode
  case class MTopicNode(textParts: Seq[(String, Option[Int])], children: Seq[MNode]) extends MNode
  // textParts: (text, linked article idx) fragments; None = plain text
  case class MEventNode(
      textParts: Seq[(String, Option[Int])],
      sources: Seq[(String, String)], // (label "(Xyz)", url)
      refNrs: Seq[Int]) extends MNode

  case class MDay(date: String, dayboxId: String, sourceUrl: String,
      categories: Seq[(Option[String], Seq[MNode])],
      references: Seq[KReference])

  def sentenceText(s: Long, n: Int): String =
    (0 until n).map(j => words(pick(words.length, s, 100 + j.toLong))).mkString(" ")

  private def eventNode(p: Params, s: Long, nArticles: Int, refPool: Seq[Int]): MEventNode = {
    // 1-2 sentences, each with 0-2 links; final ". " then trailing source
    val nSent = 1 + pick(2, s, 1)
    val parts = Seq.newBuilder[(String, Option[Int])]
    for (si <- 0 until nSent) {
      val ss = h(s, 200L + si.toLong)
      parts += ((sentenceText(ss, 2 + pick(3, ss, 1)) + " ", None))
      val nLinks = pick(3, ss, 2)
      for (li <- 0 until nLinks) {
        val a = zipf(nArticles, ss, 3, li.toLong)
        parts += ((s"Item ${a}", Some(a)))
        parts += ((if (li == nLinks - 1) "" else " and ", None))
      }
      parts += ((if (si == nSent - 1) "." else ". ", None))
    }
    val nSrc = pick(3, s, 4)
    val agencies = Array("Reuters", "AP", "BBC", "AFP")
    val sources = (0 until nSrc).map { j =>
      val agency: String = agencies(pick(4, s, 5, j.toLong))
      (s"($agency)", s"https://news.example.org/${agency.toLowerCase}/${math.abs(h(s, 6, j.toLong)) % 100000}")
    }
    val refNrs = if (refPool.nonEmpty && chance(1, 3, s, 7))
      Seq(refPool(pick(refPool.length, s, 8))) else Nil
    MEventNode(parts.result(), sources, refNrs)
  }

  private def topicNode(p: Params, s: Long, nArticles: Int, depth: Int, refPool: Seq[Int]): MTopicNode = {
    // topic row: 1-3 links, comma separated (exercises label splitting)
    val nLinks = 1 + pick(3, s, 1)
    val linkless = chance(1, 8, s, 2)
    val parts = Seq.newBuilder[(String, Option[Int])]
    if (linkless) {
      parts += ((sentenceText(s, 3), None))
    } else {
      for (j <- 0 until nLinks) {
        if (j > 0) parts += ((", ", None))
        val a = zipf(nArticles, s, 3, j.toLong)
        parts += ((s"Topic item $a", Some(a)))
      }
    }
    val nChildren = 1 + pick(2, s, 4)
    val children = (0 until nChildren).map { c =>
      val cs = h(s, 300L + c.toLong)
      if (depth >= 2 || chance(3, 4, cs, 1)) eventNode(p, cs, nArticles, refPool)
      else topicNode(p, cs, nArticles, depth + 1, refPool)
    }
    MTopicNode(parts.result(), children)
  }

  def day(p: Params, month: Int, dayN: Int, year: Int = -1): MDay = {
    val y = if (year < 0) p.year else year
    val s = h(11L, y.toLong, month.toLong, dayN.toLong)
    val date = f"$y%04d-$month%02d-$dayN%02d"
    val dayboxId = s"${y}_${monthNames(month - 1)}_$dayN"
    val sourceUrl = s"https://en.wikipedia.org/wiki/Portal:Current_events/${monthNames(month - 1)}_$y"
    // page-bottom references
    val nRefs = pick(4, s, 1)
    val refs = (0 until nRefs).map { j =>
      val nr = j + 1
      KReference(nr, s"https://news.example.org/cite/${math.abs(h(s, 2, j.toLong)) % 100000}",
        s"Cited story ${math.abs(h(s, 3, j.toLong)) % 1000}")
    }
    val refPool = refs.map(_.nr)
    val preFormat = chance(1, 20, s, 4) // 5% pre-2004 layout: no categories
    val cats: Seq[(Option[String], Seq[MNode])] =
      if (preFormat) {
        Seq((None, (0 until (1 + pick(3, s, 5))).map(i => eventNode(p, h(s, 400L + i.toLong), p.articles, refPool))))
      } else {
        val nCats = 2 + pick(3, s, 6)
        (0 until nCats).map { c =>
          val cs = h(s, 500L + c.toLong)
          val name = categories(Math.floorMod(c + pick(5, cs, 1), categories.length))
          val nodes = (0 until (p.density * (1 + pick(2, cs, 2)))).map { i =>
            val ns = h(cs, 600L + i.toLong)
            if (chance(2, 5, ns, 1)) topicNode(p, ns, p.articles, 0, refPool)
            else eventNode(p, ns, p.articles, refPool)
          }
          (Some(name), nodes)
        }.distinctBy(_._1)
      }
    MDay(date, dayboxId, sourceUrl, cats, refs)
  }

  def daysOf(p: Params): Seq[(Int, Int)] =
    for (m <- 1 to p.months; d <- 1 to monthDays(m - 1)) yield (m, d)

  /** (year, month, day) across the full multi-year span. */
  def allDaysOf(p: Params): Seq[(Int, Int, Int)] =
    for (y <- p.year until (p.year + p.years);
         m <- 1 to p.months;
         d <- 1 to monthDays(m - 1)) yield (y, m, d)
}
