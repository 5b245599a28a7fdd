package graft.kg

/** Data model of the KG-construction engine (SURVEY.md §1).
  *
  * Input (BASELINE.json input_hint): documents of interleaved text+media
  * spans. `Span` is the row-invariant unit — the parse stage must preserve
  * (kind, text, media_ref, order) exactly.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

case class SpanDoc(doc_id: String, spans: Seq[Span])

/** Anchor span inside a row's text (reference objects/link.py:6-13). */
case class KLink(href: String, text: String, startPos: Int, endPos: Int, external: Boolean)

/** Sentence with rebased link offsets (reference objects/sentence.py:10-15). */
case class KSentence(text: String, start: Int, end: Int, links: Seq[KLink])

/** Page-bottom news citation (reference objects/reference.py:6-10). */
case class KReference(nr: Int, url: String, anchorText: String)

/** Parsed event row of a day page (reference objects/event.py:13-29; the
  * object tree is flattened: parent topics become URI keys, articles are
  * joined in later).
  */
case class KEvent(
    doc_id: String,
    date: String, // yyyy-MM-dd
    eventIndex: Int,
    category: Option[String],
    text: String,
    sourceText: String,
    sourceUrl: String,
    raw: String,
    sentences: Seq[KSentence],
    links: Seq[KLink], // non-source links, event-level offsets
    sourceLinks: Seq[KLink],
    refs: Seq[KReference], // resolved page-bottom citations (extraction.py:216-219)
    parentTopicIds: Seq[Long]) { // topic ids within this doc (day-local)

  /** F11: event text with the trailing source text stripped
    * (reference objects/event.py:31-33).
    */
  def textWithoutSource: String =
    if (sourceText.isEmpty) text else text.dropRight(sourceText.length)
}

/** Parsed topic row (reference objects/topic.py:8-17). `topicId` is unique
  * within the doc; URI minting needs the resolved article, so it happens
  * post-enrichment.
  */
case class KTopic(
    doc_id: String,
    topicId: Long,
    date: String,
    index: Int,
    text: String,
    linkHref: Option[String], // candidate article url (None for link-less topics)
    parentTopicIds: Seq[Long],
    sourceUrl: String,
    raw: String)

/** One infobox row before typed extraction (label, flattened value, links
  * with value-local offsets).
  */
case class IbRowRaw(label: String, value: String, links: Seq[KLink])

/** Parsed article page (reference objects/article.py:10-34 minus the joined
  * enrichment fields, which live in EnrichedArticle).
  */
case class ArticleRaw(
    url: String,
    name: Option[String],
    headline: Option[String],
    datePublished: Option[String],
    dateModified: Option[String],
    wikidataEntity: Option[String],
    templates: Seq[String],
    ibClasses: Seq[String],
    ibRows: Seq[IbRowRaw],
    microDtstart: Option[String], // yyyy-MM-dd
    microDtend: Option[String],
    pageCoordinates: Option[Seq[Double]], // [lat, lon] from #coordinates geo-dms
    ibCoordinates: Option[Seq[Double]], // from Location row geo-dms
    rawInfobox: String)

/** OSM element (reference objects/osmElement.py:4-8). */
case class KOsmElement(osmId: Long, osmType: String, wkt: String)

/** RDF triple row (SURVEY.md §1.1): lexical object + datatype/lang columns;
  * partitioned by graph module + event date.
  */
case class Triple(
    graph_module: String, // base | raw | osm | ohg
    subj: String,
    pred: String,
    obj: String,
    obj_is_iri: Boolean,
    obj_dtype: String, // datatype IRI for literals, null for IRIs
    obj_lang: String, // language tag or null
    event_date: String) // yyyy-MM-dd mention date (partition key)

/** Namespaces and predicates (reference __init__.py:11-32). */
object Ns {
  private val data = "https://data.coypu.org/"
  private val src = "wikipedia-current-events/"
  val events: String = data + "newssummary/" + src
  val articleTopics: String = data + "articletopic/" + src
  val textTopics: String = data + "texttopic/" + src
  val contexts: String = data + "context/" + src
  val sentences: String = data + "sentence/" + src
  val phrases: String = data + "phrase/" + src
  val locations: String = data + "location/" + src
  val osmElement: String = data + "osmelement/" + src
  val point: String = data + "point/" + src
  val timespan: String = data + "timespan/" + src
  val wikipediaArticle: String = data + "wikipediaarticle/" + src

  val COY = "https://schema.coypu.org/global#"
  val NIF = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
  val WGS = "http://www.w3.org/2003/01/geo/wgs84_pos#"
  val GEO = "http://www.opengis.net/ont/geosparql#"
  val WD = "http://www.wikidata.org/entity/"
  val WDT = "http://www.wikidata.org/prop/direct/"
  val GN = "https://www.geonames.org/ontology#"
  val SCHEMA = "https://schema.org/"
  val DCTERMS = "http://purl.org/dc/terms/"
  val RDF_ = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
  val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  val OWL = "http://www.w3.org/2002/07/owl#"
  val FOAF = "http://xmlns.com/foaf/0.1/"
  val XSD = "http://www.w3.org/2001/XMLSchema#"

  val rdfType: String = RDF_ + "type"
  val rdfsLabel: String = RDFS + "label"
  val owlSameAs: String = OWL + "sameAs"
  val xsdString: String = XSD + "string"
  val xsdFloat: String = XSD + "float"
  val xsdDecimal: String = XSD + "decimal"
  val xsdInteger: String = XSD + "integer"
  val xsdDateTime: String = XSD + "dateTime"
  val xsdBoolean: String = XSD + "boolean"
  val xsdTime: String = XSD + "time"
  val xsdNonNegativeInteger: String = XSD + "nonNegativeInteger"
  val geoWktLiteral: String = GEO + "wktLiteral"
}
