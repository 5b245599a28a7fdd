package graft.emit

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg.{KEvent, Triple}

/** Export sinks mirroring the reference's output formats (SURVEY.md §2.7):
  * O1 is the partitioned triple table (TableIO); here:
  *  - O2: N-Triples text serialization (the reference exports JSON-LD/TTL via
  *    rdflib; a line-oriented RDF serialization is what a fixture diff needs)
  *  - O3: the NDJSON debug event sink (outputJson.py:26-49)
  *  - D6: merged-dataset compaction (all partitions → distinct → one table)
  */
object Exports {

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }

  /** One N-Triples line per triple row (lexical form; IRIs angled, literals
    * quoted with datatype/lang tags).
    */
  def toNTriples(triples: Dataset[Triple]): Dataset[String] = {
    import triples.sparkSession.implicits._
    triples.map { t =>
      val obj =
        if (t.obj_is_iri) s"<${t.obj}>"
        else {
          val lex = "\"" + escape(t.obj) + "\""
          if (t.obj_lang != null) s"$lex@${t.obj_lang}"
          else if (t.obj_dtype != null) s"$lex^^<${t.obj_dtype}>"
          else lex
        }
      s"<${t.subj}> <${t.pred}> $obj ."
    }
  }

  // ---- Turtle (prefixed) ---------------------------------------------------
  // The reference's {prefix}.ttl comes from rdflib's turtle serializer
  // (jsonld2ttl.py:9-37): @prefix header for every namespace in use,
  // prefixed names, `a` for rdf:type, one subject block with `;`-chained
  // predicates and `,`-chained objects. Prefix labels follow the reference's
  // namespace variable names (__init__.py:11-31).
  private val prefixTable: Seq[(String, String)] = {
    import graft.kg.Ns
    Seq(
      "coy" -> Ns.COY, "nif" -> Ns.NIF, "wgs" -> Ns.WGS, "geo" -> Ns.GEO,
      "wd" -> Ns.WD, "wdt" -> Ns.WDT,
      "gn" -> Ns.GN, "schema" -> Ns.SCHEMA, "dcterms" -> Ns.DCTERMS,
      "rdf" -> Ns.RDF_, "rdfs" -> Ns.RDFS, "owl" -> Ns.OWL,
      "foaf" -> Ns.FOAF, "xsd" -> Ns.XSD,
      "events" -> Ns.events, "articletopic" -> Ns.articleTopics,
      "texttopic" -> Ns.textTopics, "context" -> Ns.contexts,
      "sentence" -> Ns.sentences, "phrase" -> Ns.phrases,
      "location" -> Ns.locations, "osmelement" -> Ns.osmElement,
      "point" -> Ns.point, "timespan" -> Ns.timespan,
      "wikipediaarticle" -> Ns.wikipediaArticle)
      .sortBy(-_._2.length) // longest-namespace match wins
  }

  private val pnLocal = "^[A-Za-z0-9_]([A-Za-z0-9_.:-]*[A-Za-z0-9_:-])?$".r

  /** Prefixed name if a namespace matches and the local part is PN_LOCAL-
    * safe; angle-bracketed IRI otherwise. Returns (rendered, usedPrefix).
    */
  private def pname(iri: String): (String, Option[String]) =
    prefixTable.collectFirst {
      case (pfx, ns) if iri.startsWith(ns) &&
          pnLocal.pattern.matcher(iri.stripPrefix(ns)).matches() =>
        (s"$pfx:${iri.stripPrefix(ns)}", Some(pfx))
    }.getOrElse((s"<$iri>", None))

  private def turtleObj(t: Triple): (String, Seq[String]) =
    if (t.obj_is_iri) { val (r, p) = pname(t.obj); (r, p.toSeq) }
    else {
      val lex = "\"" + escape(t.obj) + "\""
      if (t.obj_lang != null) (s"$lex@${t.obj_lang}", Nil)
      else if (t.obj_dtype != null) {
        // rdflib omits ^^xsd:string (plain literal in Turtle)
        if (t.obj_dtype == graft.kg.Ns.xsdString) (lex, Nil)
        else { val (r, p) = pname(t.obj_dtype); (s"$lex^^$r", p.toSeq) }
      } else (lex, Nil)
    }

  /** O2 merged export: prefixed Turtle document for a triple set (the
    * driver-side byte assembly of saveMonthGraphs; rendering is pure so the
    * golden test pins the convention). Subjects/predicates/objects sorted
    * for deterministic bytes; `a` replaces rdf:type like rdflib.
    */
  def toTurtle(triples: Seq[Triple]): String = {
    val used = scala.collection.mutable.SortedSet.empty[String]
    val bySubj = triples.groupBy(_.subj).toSeq.sortBy(_._1)
    val blocks = bySubj.map { case (subj, ts) =>
      val (subjR, subjP) = pname(subj)
      used ++= subjP
      val predBlocks = ts.groupBy(_.pred).toSeq.sortBy(_._1).map { case (pred, pts) =>
        val predR =
          if (pred == graft.kg.Ns.rdfType) "a"
          else { val (r, p) = pname(pred); used ++= p; r }
        val objs = pts.map { t =>
          val (r, ps) = turtleObj(t); used ++= ps; r
        }.distinct.sorted
        s"$predR " + objs.mkString(",\n        ")
      }
      s"$subjR " + predBlocks.mkString(" ;\n    ") + " ."
    }
    val header = prefixTable.filter(p => used.contains(p._1)).sortBy(_._1)
      .map { case (pfx, ns) => s"@prefix $pfx: <$ns> ." }
    val headerPart = if (header.isEmpty) "" else header.mkString("", "\n", "\n\n")
    headerPart + blocks.mkString("\n\n") + "\n"
  }

  /** JSON-LD node objects for one graph module: triples grouped by subject,
    * each predicate holding an array of `{"@id"}` / `{"@value", "@type",
    * "@language"}` objects — the flattened JSON-LD shape rdflib emits
    * (outputRdf.py:631-637). Distributed group-by-subject, one JSON line per
    * node; the file assembly below just brackets the collected lines.
    */
  private def jsonldNodes(triples: Dataset[Triple]): Dataset[String] = {
    import triples.sparkSession.implicits._
    triples
      .groupByKey(_.subj)
      .mapGroups { (subj, it) =>
        val byPred = it.toSeq.groupBy(_.pred).toSeq.sortBy(_._1)
        val preds = byPred.map { case (pred, ts) =>
          val vals = ts.map { t =>
            if (t.obj_is_iri) s"""{"@id": "${escape(t.obj)}"}"""
            else {
              val v = s""""@value": "${escape(t.obj)}""""
              val tag =
                if (t.obj_lang != null) s""", "@language": "${t.obj_lang}""""
                else if (t.obj_dtype != null) s""", "@type": "${t.obj_dtype}""""
                else ""
              s"{$v$tag}"
            }
          }.sorted.distinct.mkString("[", ", ", "]")
          s""""${escape(pred)}": $vals"""
        }.mkString(", ")
        s"""{"@id": "${escape(subj)}", $preds}"""
      }
  }

  /** O2: the reference's per-month × per-module dataset files — one
    * `{prefix}_{module}.jsonld` per graph module (outputRdf.py:631-650,
    * `save(file_prefix)`; prefix is e.g. `January_2022`), plus the merged
    * `{prefix}.ttl` of jsonld2ttl.py:9-37 (all modules parsed into one graph,
    * serialized as Turtle — emitted in N-Triples lines, a Turtle subset).
    * Returns the written file names.
    *
    * The single-file-per-month contract is inherently driver-local (the
    * reference writes one rdflib serialization per file); node/line
    * rendering stays distributed and only the final byte assembly collects.
    * For cluster-scale exports use `toNTriples(...).write.text` instead.
    */
  def saveMonthGraphs(spark: SparkSession, triples: Dataset[Triple],
      outDir: String, prefix: String): Seq[String] = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    // driver-OOM guard: this method collects every rendered node; a caller
    // pointing it at a big slice must use the distributed text sink instead.
    // The limit is PAYLOAD BYTES, not rows — obj can carry full article-text
    // literals (~KBs each), so a row gate alone still admits multi-GB
    // collects. One agg pass off the cached frame measures the real string
    // mass; rendering inflates it ~3x, so the 512 MB default keeps the
    // collected form ~1.5 GB of driver heap.
    val maxBytes = spark.conf
      .get("graft.export.maxDriverBytes", (512L * 1024 * 1024).toString).toLong
    val Array(n, bytes) = triples
      .selectExpr("count(*) AS n",
        "CAST(COALESCE(SUM(octet_length(subj) + octet_length(pred) + " +
          "octet_length(obj) + COALESCE(octet_length(obj_dtype), 0) + " +
          "COALESCE(octet_length(obj_lang), 0)), 0) AS BIGINT) AS bytes")
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    require(bytes <= maxBytes,
      s"saveMonthGraphs is a driver-local single-file export: $n rows / " +
        s"$bytes payload bytes > graft.export.maxDriverBytes=$maxBytes — use " +
        "toNTriples(...).write.text for cluster-scale slices, or raise the " +
        "conf knowingly")
    Files.createDirectories(Paths.get(outDir))
    val modules = triples.select(col("graph_module")).distinct()
      .collect().map(_.getString(0)).sorted
    val written = modules.map { module =>
      val name = s"${prefix}_$module.jsonld"
      val nodes = jsonldNodes(triples.filter(col("graph_module") === module))
        .collect().sorted // deterministic file bytes
      val body = nodes.mkString("[\n", ",\n", "\n]\n")
      Files.writeString(Paths.get(outDir, name), body)
      name
    }
    val ttlName = s"$prefix.ttl"
    Files.writeString(Paths.get(outDir, ttlName),
      toTurtle(triples.dropDuplicates("subj", "pred", "obj", "obj_is_iri",
        "obj_dtype", "obj_lang").collect().toSeq))
    written :+ ttlName
  }

  /** O3: NDJSON debug sink — (text, s_begin, location, begin, end) of the
    * first located link per event (reference outputJson.py:26-49, emitting
    * only events that have a location link).
    */
  def eventDebugJson(events: Dataset[KEvent], locatedUrls: Set[String]): DataFrame = {
    import events.sparkSession.implicits._
    events.flatMap { e =>
      val hit = for {
        s <- e.sentences
        l <- s.links
        if locatedUrls.contains(l.href)
      } yield (s, l)
      hit.headOption.map { case (s, l) =>
        (e.text, s.start, l.text, l.startPos, l.endPos)
      }
    }.toDF("text", "s_begin", "location", "begin", "end")
  }

  /** D6 merged-dataset mode: all committed partitions → set union →
    * single compacted table (reference __main__.py:271-277).
    */
  def compact(spark: SparkSession, table: String, outDir: String): Long = {
    val merged = TableIO.read(spark, table, "event_date")
      .drop("event_date")
      .dropDuplicates()
    merged.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir).count()
  }
}
