package graft.kg

import java.net.URLEncoder

/** Deterministic URI minting (reference outputRdf.py:52-136, __init__.py).
  * These must match the reference byte-for-byte (SURVEY.md §1.3).
  */
object Uris {

  /** Python urllib.parse.quote_plus parity. Python keeps [A-Za-z0-9_.~-] and
    * encodes '*'; java.net.URLEncoder keeps '*' and encodes '~'. Both use '+'
    * for space and uppercase hex.
    */
  def quotePlus(s: String): String =
    URLEncoder.encode(s, "UTF-8")
      .replace("*", "%2A")
      .replace("%7E", "~")

  /** url.rsplit('/', 1)[-1] (outputRdf.py:67). */
  def urlBasename(url: String): String = {
    val i = url.lastIndexOf('/')
    if (i < 0) url else url.substring(i + 1)
  }

  /** urldefrag(url).url (articleExtractor.py:96). */
  def urlDefrag(url: String): String = {
    val i = url.indexOf('#')
    if (i < 0) url else url.substring(0, i)
  }

  /** f"{y:04}-{m:02}-{d:02}_{eventIndex}" (outputRdf.py:62-64). Our dates are
    * already yyyy-MM-dd strings.
    */
  def eventId(date: String, eventIndex: Int): String = s"${date}_$eventIndex"

  def eventUri(date: String, eventIndex: Int): String =
    Ns.events + eventId(date, eventIndex)

  def articleTopicUri(articleUrl: String): String =
    Ns.articleTopics + urlBasename(articleUrl)

  def textTopicUri(text: String): String =
    Ns.textTopics + quotePlus(text)

  def contextUri(date: String, eventIndex: Int): String =
    Ns.contexts + eventId(date, eventIndex)

  /** sentences_ns[context_uri.rsplit('/',1)[-1] + f"_{index}"] (outputRdf.py:103-105). */
  def sentenceUri(contextUri: String, index: Int): String =
    Ns.sentences + urlBasename(contextUri) + s"_$index"

  def phraseUri(sentenceUri: String, index: Int): String =
    Ns.phrases + urlBasename(sentenceUri) + s"_$index"

  def placeUri(articleUrl: String): String =
    Ns.locations + urlBasename(articleUrl)

  def articleUri(articleUrl: String): String =
    Ns.wikipediaArticle + urlBasename(articleUrl)

  def osmUri(osmType: String, osmId: Long): String =
    Ns.osmElement + osmType + "_" + osmId.toString

  /** point_ns[quote_plus(f"{lat}_{lon}")] (outputRdf.py:57-60). Coordinates
    * are Python floats formatted via repr — shortest round-trip, which
    * matches Java Double.toString for these magnitudes except integral
    * values: Python "36.0" == Java "36.0" — both keep ".0".
    */
  def pointUri(lat: Double, lon: Double): String =
    Ns.point + quotePlus(pyFloat(lat) + "_" + pyFloat(lon))

  /** Python str(float) — repr shortest round-trip. Java Double.toString is
    * also shortest round-trip with the same tie rules for the values in play;
    * the difference is exponent formatting (1e-05 vs 1.0E-5), which DMS
    * coordinates never hit (|v| in [1e-4, 1e4)).
    */
  def pyFloat(d: Double): String = {
    val s = java.lang.Double.toString(d)
    s
  }

  /** Timespan URI parts (outputRdf.py:114-136): Python str() forms —
    * str(datetime) = "yyyy-MM-dd HH:mm:ss[+HH:MM]", str(time) = "HH:mm:ss[+HH:MM]".
    */
  def timespanUri(
      startDate: Option[String],
      endDate: Option[String],
      ongoing: Boolean,
      startTime: Option[String],
      endTime: Option[String],
      timezone: Option[String]): String = {
    val parts = Seq.newBuilder[String]
    startDate.foreach(sd => parts += s"sd_$sd")
    endDate match {
      case Some(ed) => parts += s"ed_$ed"
      case None => if (ongoing) parts += "o"
    }
    startTime.foreach(st => parts += s"st_$st")
    endTime.foreach(et => parts += s"et_$et")
    timezone.foreach(t => parts += s"t_$t")
    Ns.timespan + quotePlus(parts.result().mkString("_"))
  }
}
