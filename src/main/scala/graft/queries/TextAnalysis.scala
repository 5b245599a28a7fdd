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
        s"${Dedup.bowFp} AS fp_bow") // the ONE BoW-key definition (d04/d07/st03)
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

  // Intra-document repetition signals (the Gopher-rule family: repetitious
  // documents are boilerplate/spam and get filtered before training):
  // duplicate-token fraction, duplicate word-2-gram fraction, and the mass of
  // the single most frequent 2-gram. The 2-gram counts go through
  // explode + two-level groupBy (map-side partial agg, shuffle keyed on
  // (doc_id, gram)) instead of a per-row O(tokens²) array fold — per-doc
  // work stays linear no matter how long a 100 TB corpus's docs get. Short
  // docs (< 2 tokens) are filtered before the gram lambda
  // (Dedup.wordGramExpr caller contract) and rejoin via the left join as
  // zero-gram rows.
  def t06Repetition(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).selectExpr("doc_id", "split(text, ' ') AS toks")
    val base = docs.selectExpr(
      "doc_id",
      "CAST(size(toks) AS BIGINT) AS n_toks",
      "CAST(size(toks) - size(array_distinct(toks)) AS BIGINT) AS dup_toks")
    val gramCounts = docs.filter(size(col("toks")) >= 2)
      .selectExpr("doc_id", s"explode(${Dedup.wordGramExpr(2)}) AS g")
      .groupBy(col("doc_id"), col("g")).count()
      .groupBy(col("doc_id")).agg(
        sum(col("count")).as("n2"),
        max(col("count")).as("topc"),
        count(lit(1)).as("nd"))
    base.join(gramCounts, Seq("doc_id"), "left")
      .selectExpr(
        "doc_id",
        "CAST(coalesce(n2, CAST(0 AS BIGINT)) AS BIGINT) AS n_2grams",
        "CASE WHEN n2 IS NULL THEN CAST(0.0 AS DOUBLE) " +
          "ELSE CAST(n2 - nd AS DOUBLE) / CAST(n2 AS DOUBLE) END AS dup_2gram_frac",
        "CASE WHEN n2 IS NULL THEN CAST(0.0 AS DOUBLE) " +
          "ELSE CAST(topc AS DOUBLE) / CAST(n2 AS DOUBLE) END AS top_2gram_frac",
        "CAST(dup_toks AS DOUBLE) / CAST(n_toks AS DOUBLE) AS dup_tok_frac")
      .orderBy(col("doc_id"))
  }

  // Oracle: same grams via the constant series window (bounded by the Verify
  // text-length preflight), same single-IEEE-division arithmetic.
  val t06Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |cnt AS (
      |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g, count(*) AS c
      |  FROM toks, generate_series(1, 2048) s(i)
      |  WHERE i <= len(t) - 1
      |  GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, sum(c) AS n2, max(c) AS topc, count(*) AS nd
      |  FROM cnt GROUP BY 1)
      |SELECT toks.doc_id,
      |  CAST(coalesce(n2, 0) AS BIGINT) AS n_2grams,
      |  CASE WHEN n2 IS NULL THEN CAST(0.0 AS DOUBLE)
      |    ELSE CAST(n2 - nd AS DOUBLE) / CAST(n2 AS DOUBLE) END AS dup_2gram_frac,
      |  CASE WHEN n2 IS NULL THEN CAST(0.0 AS DOUBLE)
      |    ELSE CAST(topc AS DOUBLE) / CAST(n2 AS DOUBLE) END AS top_2gram_frac,
      |  CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE) AS dup_tok_frac
      |FROM toks LEFT JOIN agg ON toks.doc_id = agg.doc_id
      |ORDER BY toks.doc_id""".stripMargin

  // t07: cross-document n-gram novelty — the memorization-risk signal: what
  // fraction of a doc's distinct word 3-grams also appear in at least one
  // OTHER document (df >= 2 over doc-distinct grams; a doc can't share a
  // gram with itself). The classic inverted-index shape at 100 TB: explode
  // doc-distinct grams once, one gram-keyed shuffle for document frequency,
  // join the df back onto the SAME gram rows (output cardinality == gram
  // rows — a hot gram fattens no join product, it only raises its df), one
  // doc-keyed aggregate. Docs too short for a 3-gram surface novelty 1.0 by
  // convention. The single novelty division is one correctly-rounded DOUBLE
  // op on exact BIGINTs — identical in both engines (t02's rule).
  def t07NgramNovelty(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val grams = docs.selectExpr("doc_id", "split(text, ' ') AS toks")
      .filter(size(col("toks")) >= 3)
      .selectExpr("doc_id",
        s"explode(array_distinct(${Dedup.wordGramExpr(3)})) AS g")
    val dfreq = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val perDoc = grams.join(dfreq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams_distinct"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).cast("long").as("n_shared"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams_distinct", "n_shared"))
      .selectExpr("doc_id", "n_grams_distinct", "n_shared",
        "CASE WHEN n_grams_distinct = 0 THEN CAST(1.0 AS DOUBLE) " +
          "ELSE CAST(n_grams_distinct - n_shared AS DOUBLE) / " +
          "CAST(n_grams_distinct AS DOUBLE) END AS novelty")
      .orderBy(col("doc_id"))
  }

  val t07Sql: String =
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |series AS (SELECT i FROM generate_series(1, 2048) t(i)),
      |grams AS (
      |  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
      |  FROM docs JOIN series ON i <= length(toks) - 2),
      |dfreq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n1,
      |         SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n2
      |  FROM grams JOIN dfreq USING (g) GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(n1, 0) AS BIGINT) AS n_grams_distinct,
      |  CAST(COALESCE(n2, 0) AS BIGINT) AS n_shared,
      |  CASE WHEN COALESCE(n1, 0) = 0 THEN CAST(1.0 AS DOUBLE)
      |       ELSE CAST(n1 - n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS novelty
      |FROM documents d LEFT JOIN agg USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // t08: unigram SURPRISAL scoring — an LM-free rarity/quality signal in
  // EXACT integer arithmetic. True unigram cross-entropy needs log()
  // (float, not hash-portable); the integer proxy uses floor-log2 via
  // length(bin(x)) — identical in Spark and DuckDB (sk01's trick):
  // surprisal(tok) = bitlen(N_total) - bitlen(count(tok)), summed over a
  // doc's token INSTANCES. Rare-token-heavy docs score high; boilerplate
  // scores low — the ranking signal a quality filter thresholds on. Plan:
  // the t07 inverted-index shape (explode once, count per token, join the
  // counts back onto the same rows — no fan-out) plus a one-row broadcast
  // of the corpus total; per-doc agg folds map-side.
  def t08UnigramSurprisal(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.selectExpr("doc_id", "explode(split(text, ' ')) AS tok")
      .filter(col("tok") =!= "")
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).cast("long").as("n_total"))
    val perDoc = toks.join(counts, Seq("tok"))
      .crossJoin(broadcast(total))
      .selectExpr("doc_id",
        "CAST(length(bin(n_total)) - length(bin(cnt)) AS BIGINT) AS surp")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("surp")).cast("long").as("surprisal_sum"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_tokens", "surprisal_sum"))
      .selectExpr("doc_id", "n_tokens", "surprisal_sum",
        "CASE WHEN n_tokens = 0 THEN 0L " +
          "ELSE (1000 * surprisal_sum) DIV n_tokens END AS mean_surprisal_e3")
      .orderBy(col("doc_id"))
  }

  val t08Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tok2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
      |counts AS (SELECT tok, COUNT(*) AS cnt FROM tok2 GROUP BY tok),
      |total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM counts),
      |per AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    CAST(SUM(length(bin(n_total)) - length(bin(cnt))) AS BIGINT)
      |      AS surprisal_sum
      |  FROM tok2 JOIN counts USING (tok) CROSS JOIN total
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(n_tokens, 0) AS n_tokens,
      |  CAST(COALESCE(surprisal_sum, 0) AS BIGINT) AS surprisal_sum,
      |  CASE WHEN COALESCE(n_tokens, 0) = 0 THEN 0
      |       ELSE (1000 * COALESCE(surprisal_sum, 0)) // n_tokens
      |  END AS mean_surprisal_e3
      |FROM documents d LEFT JOIN per USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  // t09: PII SCRUBBING — the safety stage of a training-data pipeline:
  // detect and redact emails / IPv4s / phone numbers, counting what was
  // removed. The synthetic corpus is PII-free BY CONSTRUCTION (letters-only
  // word soup), so the operator would never fire on it; instead each doc is
  // augmented with DETERMINISTIC synthetic PII derived from doc_id
  // (doc_id%3 emails, doc_id%2 IPs, a phone iff doc_id%5=0 — honest fixture
  // injection, clearly not real data), then measured and scrubbed BY REGEX
  // over the augmented text. The patterns are RE2-and-Java-safe (character
  // classes only, no lookaround, no \d shorthand), replacements run in a
  // fixed order in both engines, and the redacted text is fingerprinted so
  // the gate hashes the scrub RESULT, not just the counts. Pure per-row
  // expressions — embarrassingly parallel at any scale.
  // escape-FREE patterns ([.] and [+] classes, never backslash): a backslash
  // inside a SQL string literal is an escape character with engine-specific
  // unknown-escape behavior — the exact parity trap this avoids
  private val piiPatterns = Seq( // (pattern, replacement) — applied in order
    ("[a-z0-9.]+@[a-z0-9]+[.][a-z]+", "[EMAIL]"),
    ("[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}", "[IP]"),
    ("[+]1-[0-9]{3}-[0-9]{4}", "[PHONE]"))

  def t09PiiScrub(s: SparkSession, d: String): DataFrame = {
    val aug = "concat(text, ' ', " +
      "repeat(concat('user', CAST(doc_id AS STRING), '@example.com '), CAST(doc_id % 3 AS INT)), " +
      "repeat(concat('10.0.0.', CAST(doc_id % 256 AS STRING), ' '), CAST(doc_id % 2 AS INT)), " +
      "CASE WHEN doc_id % 5 = 0 THEN '+1-555-0199 ' ELSE '' END)"
    val redacted = piiPatterns.foldLeft("aug") { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '$r')"
    }
    Tables.documents(s, d)
      .selectExpr("doc_id", s"$aug AS aug")
      .selectExpr("doc_id",
        s"CAST(size(regexp_extract_all(aug, '${piiPatterns(0)._1}', 0)) AS BIGINT) AS n_emails",
        s"CAST(size(regexp_extract_all(aug, '${piiPatterns(1)._1}', 0)) AS BIGINT) AS n_ips",
        s"CAST(size(regexp_extract_all(aug, '${piiPatterns(2)._1}', 0)) AS BIGINT) AS n_phones",
        s"md5($redacted) AS redacted_fp")
      .orderBy(col("doc_id"))
  }

  val t09Sql: String = {
    val aug = "text || ' ' || " +
      "repeat('user' || CAST(doc_id AS VARCHAR) || '@example.com ', CAST(doc_id % 3 AS INT)) || " +
      "repeat('10.0.0.' || CAST(doc_id % 256 AS VARCHAR) || ' ', CAST(doc_id % 2 AS INT)) || " +
      "CASE WHEN doc_id % 5 = 0 THEN '+1-555-0199 ' ELSE '' END"
    val redacted = piiPatterns.foldLeft("aug") { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '$r', 'g')"
    }
    s"""WITH a AS (SELECT doc_id, $aug AS aug FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(aug, '${piiPatterns(0)._1}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(aug, '${piiPatterns(1)._1}')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(aug, '${piiPatterns(2)._1}')) AS BIGINT) AS n_phones,
       |  md5($redacted) AS redacted_fp
       |FROM a ORDER BY doc_id""".stripMargin
  }

  /** t10: GRAM-VOCABULARY SATURATION curve — cumulative distinct word
    * 3-grams as a function of corpus position (doc_id buckets of 50). The
    * Heaps'-law diagnostic the growth lap (BENCH/BASELINE.md §3b) showed is
    * load-bearing: a flattening curve means the gram universe is saturating
    * and exact n-gram joins (d08) are drifting toward their quadratic
    * regime, so this table is what you READ to pick d02-sketch vs d08-exact
    * per corpus slice. Plan: one gram explode → min(doc_id) per gram (the
    * first-occurrence inverted index, map-side combinable) → tiny per-bucket
    * aggregate + running sum over buckets (the window runs over ~n_docs/50
    * rows, not the corpus).
    */
  def t10VocabSaturation(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(size(split(col("text"), " ")) >= 3)
      .selectExpr("doc_id", "split(text, ' ') AS toks")
      .selectExpr("doc_id", s"explode(array_distinct(${Dedup.wordGramExpr(3)})) AS g")
      .groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
      .selectExpr("first_doc DIV 50 AS bucket")
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_grams"))
      .selectExpr("bucket", "new_grams",
        "SUM(new_grams) OVER (ORDER BY bucket " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vocab_size")
      .orderBy(col("bucket"))

  val t10Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE length(string_split(text, ' ')) >= 3),
      |series AS (SELECT i FROM generate_series(1, 2048) t(i)),
      |grams AS (
      |  SELECT DISTINCT doc_id,
      |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
      |  FROM docs JOIN series ON i <= length(toks) - 2),
      |first_seen AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
      |bkt AS (
      |  SELECT first_doc // 50 AS bucket, COUNT(*) AS new_grams
      |  FROM first_seen GROUP BY bucket)
      |SELECT bucket, new_grams,
      |  CAST(SUM(new_grams) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size
      |FROM bkt ORDER BY bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t10_vocab_saturation" -> (t10VocabSaturation _),
    "t09_pii_scrub" -> (t09PiiScrub _),
    "t08_unigram_surprisal" -> (t08UnigramSurprisal _),
    "t07_ngram_novelty" -> (t07NgramNovelty _),
    "t01_token_stats" -> (t01TokenStats _),
    "t02_quality_score" -> (t02QualityScore _),
    "t03_lang_id" -> (t03LangId _),
    "t04_fingerprint" -> (t04Fingerprint _),
    "t05_bpe_tokens" -> (t05BpeTokens _),
    "t06_repetition" -> (t06Repetition _))

  val oracleSql: Map[String, String] = Map(
    "t01_token_stats" -> t01Sql,
    "t02_quality_score" -> t02Sql,
    "t03_lang_id" -> t03Sql,
    "t04_fingerprint" -> t04Sql,
    "t05_bpe_tokens" -> t05Sql,
    "t06_repetition" -> t06Sql,
    "t07_ngram_novelty" -> t07Sql,
    "t08_unigram_surprisal" -> t08Sql,
    "t09_pii_scrub" -> t09Sql,
    "t10_vocab_saturation" -> t10Sql)
}
