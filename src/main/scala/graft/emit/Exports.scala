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
