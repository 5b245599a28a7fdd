package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // parquet µs timestamps so the driver's pyarrow read agrees with DuckDB
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // PREFLIGHT: the DuckDB oracles window their per-position scans (MinHash
    // substr, shingle/gram joins) with generate_series(1, 2048) — a DuckDB
    // 1.0 constant-only limit. The Spark side is unbounded, so a text longer
    // than the window would make the ORACLE the silently-truncated side and
    // the gate would report a baffling mismatch. Fail loudly up front
    // instead (current corpora max ~577 chars; same silent-cap class as the
    // kg04 depth find).
    val maxLen = graft.queries.Tables.documents(spark, sfDir)
      .selectExpr("coalesce(max(length(text)), 0) AS m").collect().head.getInt(0)
    require(maxLen <= 2040,
      s"documents.text max length $maxLen exceeds the oracle series window " +
        "(2048 incl. gram tails) — widen generate_series in the oracle SQL " +
        "before trusting the gate")
    // Dev-only narrowing (regex on query name) so a single new query can be
    // oracle-checked without the full 65-query sweep; the driver never sets
    // this, so its gate always runs everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    def selected(name: String): Boolean =
      only.forall(_.findFirstIn(name).isDefined)
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name))
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
    }
    // kg oracle inputs: the pipeline's intermediate tables, dumped AFTER the
    // queries so the shared caches are warm (KgOracles scaladoc has the why)
    val auxDir = new java.io.File(s"$outDir/_oracle_aux").getAbsolutePath
    // any SELECTED oracle that reads the aux dump ({AUX} placeholder) —
    // kg* and the corpus-shaped m05/m06 — must trigger it; keying on the
    // kg prefix alone broke narrowed m-query runs
    if (SparkEntry.oracleSql.exists { case (n, sql) =>
        selected(n) && sql.contains("{AUX}") })
      try KgOracles.dumpAux(spark, sfDir, auxDir)
      catch { case e: Throwable =>
        System.err.println(s"[verify] oracle aux dump failed: ${e.getMessage}")
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // `{AUX}` → the absolute aux-dump path: the driver's DuckDB runs with an
    // unknown cwd, so the oracle SQL must carry absolute read_parquet paths
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{AUX}", auxDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    KgPipeline.release()
    graft.queries.Dedup.release()
    spark.stop()
  }
}
