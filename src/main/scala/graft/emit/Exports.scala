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
    val lines = toNTriples(triples).distinct().collect().sorted
    Files.writeString(Paths.get(outDir, ttlName),
      lines.mkString("", "\n", "\n"))
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
