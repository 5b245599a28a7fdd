package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a training-data pipeline over the `documents`
  * table: token counting, quality scoring, language-ID (n-gram/marker
  * heuristic), document fingerprinting. All expressed with codegen'd builtins
  * (no UDFs), each with an exact DuckDB oracle.
  *
  * Portability rules: token counts via space arithmetic (identical in both
  * engines), hashes via md5 hex (identical), divisions on DOUBLE (IEEE, single
  * op, deterministic).
  */
object TextAnalysis {

  // Tokens = whitespace-separated words; corpus is single-space separated.
  // n_tokens = spaces+1 (pure length arithmetic, portable).
  def t01TokenStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr(
        "doc_id",
        "n_chars",
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens",
        "CAST(length(replace(text, ' ', '')) AS DOUBLE) / " +
          "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) AS mean_token_len")
      .orderBy(col("doc_id"))

  val t01Sql: String =
    """SELECT doc_id, n_chars,
      |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
      |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |    / CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE) AS mean_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  // Quality scoring: stopword ratio + short/long token share proxies via
  // marker-substring counting (occurrences = length delta / marker length).
  private def occurrences(textCol: String, marker: String): String =
    s"(length($textCol) - length(replace($textCol, '$marker', ''))) / ${marker.length}"

  def t02QualityScore(s: SparkSession, d: String): DataFrame = {
    val nTok = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)"
    val nStop = s"CAST(${occurrences("text", " the ")} + ${occurrences("text", " a ")} AS DOUBLE)"
    Tables.documents(s, d)
      .selectExpr(
        "doc_id",
        s"$nTok AS n_tokens",
        s"$nStop AS n_stopword_hits",
        s"$nStop / $nTok AS stopword_ratio",
        // crude fluency score in [0,1]: penalize very short docs
        s"least(1.0, $nTok / 32.0) * (1.0 - least(1.0, $nStop / $nTok)) AS quality")
      .orderBy(col("doc_id"))
  }

  val t02Sql: String = {
    val nTok = "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS DOUBLE)"
    val nStop = s"CAST(${occurrences("text", " the ")} + ${occurrences("text", " a ")} AS DOUBLE)"
    s"""SELECT doc_id, $nTok AS n_tokens, $nStop AS n_stopword_hits,
       |  $nStop / $nTok AS stopword_ratio,
       |  least(1.0, $nTok / 32.0) * (1.0 - least(1.0, $nStop / $nTok)) AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // Language-ID heuristic: score per language = count of marker-token hits in
  // the padded text; argmax with fixed precedence order (deterministic).
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " a ", " of "),
    "de" -> Seq(" der ", " die ", " und "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "),
    "zh" -> Seq(" 的 ", " 是 "))

  def t03LangId(s: SparkSession, d: String): DataFrame = {
    val padded = "(' ' || text || ' ')"
    val scores = langMarkers.map { case (lang, ms) =>
      val sum = ms.map(m => occurrences(padded, m)).mkString(" + ")
      s"($sum) AS score_$lang"
    }
    val best = langMarkers.map(_._1).foldRight("'und'") { (l, acc) =>
      s"CASE WHEN score_$l >= ${langMarkers.map(_._1).filter(_ != l).map(o => s"score_$o").mkString("greatest(", ", ", ")")} AND score_$l > 0 THEN '$l' ELSE $acc END"
    }
    Tables.documents(s, d)
      .selectExpr(Seq("doc_id", "lang AS labeled_lang") ++ scores: _*)
      .selectExpr("doc_id", "labeled_lang", s"$best AS predicted_lang")
      .withColumn("is_match", (col("labeled_lang") === col("predicted_lang")).cast(IntegerType))
      .orderBy(col("doc_id"))
  }

  val t03Sql: String = {
    val padded = "(' ' || text || ' ')"
    val scores = langMarkers.map { case (lang, ms) =>
      val sum = ms.map(m => occurrences(padded, m)).mkString(" + ")
      s"($sum) AS score_$lang"
    }
    val best = langMarkers.map(_._1).foldRight("'und'") { (l, acc) =>
      s"CASE WHEN score_$l >= ${langMarkers.map(_._1).filter(_ != l).map(o => s"score_$o").mkString("greatest(", ", ", ")")} AND score_$l > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS labeled_lang, ${scores.mkString(", ")}
       |  FROM documents)
       |SELECT doc_id, labeled_lang, $best AS predicted_lang,
       |  CAST(labeled_lang = ($best) AS INT) AS is_match
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  // Document fingerprint: md5 of the text and of the bag-of-words
  // normalization (sorted distinct tokens) — the exact-dedup keys.
  def t04Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .selectExpr(
        "doc_id",
        "md5(text) AS fp_exact",
        "md5(array_join(array_sort(array_distinct(split(text, ' '))), ' ')) AS fp_bow")
      .orderBy(col("doc_id"))

  val t04Sql: String =
    """SELECT doc_id, md5(text) AS fp_exact,
      |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp_bow
      |FROM documents ORDER BY doc_id""".stripMargin

  // BPE-ish token counting: the GPT-2-style pre-tokenizer shape — letter
  // runs, digit runs, and single punctuation marks each count as one token
  // (real BPE then merges within these pre-tokens, so this is the upper
  // bound a tokenizer-cost estimate wants). The pattern uses only plain
  // character classes + alternation, which Java regex (Spark) and RE2
  // (DuckDB) match identically; bytes_per_token is the single-division
  // training-cost metric.
  private val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def t05BpeTokens(s: SparkSession, d: String): DataFrame = {
    val nBpe = s"CAST(size(regexp_extract_all(text, '$bpePattern', 0)) AS BIGINT)"
    Tables.documents(s, d)
      .selectExpr(
        "doc_id",
        "CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens_ws",
        s"$nBpe AS n_tokens_bpe",
        s"CAST(octet_length(text) AS DOUBLE) / CAST(greatest($nBpe, CAST(1 AS BIGINT)) AS DOUBLE) AS bytes_per_token")
      .orderBy(col("doc_id"))
  }

  val t05Sql: String =
    s"""SELECT doc_id,
       |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens_ws,
       |  CAST(length(regexp_extract_all(text, '$bpePattern')) AS BIGINT) AS n_tokens_bpe,
       |  CAST(octet_length(encode(text)) AS DOUBLE) /
       |    CAST(greatest(length(regexp_extract_all(text, '$bpePattern')), 1) AS DOUBLE) AS bytes_per_token
       |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_token_stats" -> (t01TokenStats _),
    "t02_quality_score" -> (t02QualityScore _),
    "t03_lang_id" -> (t03LangId _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t05_bpe_tokens" -> (t05BpeTokens _))

  val oracleSql: Map[String, String] = Map(
    "t01_token_stats" -> t01Sql,
    "t02_quality_score" -> t02Sql,
    "t03_lang_id" -> t03Sql,
    "t04_fingerprint" -> t04Sql,
    "t05_bpe_tokens" -> t05Sql)
}
