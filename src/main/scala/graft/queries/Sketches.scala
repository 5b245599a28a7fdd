package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic sketch operators — the approximate-aggregation family a
  * 100 TB pipeline leans on when exact distinct/frequency state would not
  * fit: HyperLogLog distinct counting and count-min frequency sketching.
  * (Reference analogue: the A3 ValueDict histogram and per-month counters —
  * analytics.py keeps exact dicts because its corpus is one month of pages;
  * at 10^12 documents those dicts must become fixed-size mergeable sketches.)
  *
  * Both sketches are built from md5 as the shared hash family (hex output is
  * identical in Spark and DuckDB), with every derivation in integer
  * arithmetic, so the driver gate checks the sketch STATE itself hash-exact —
  * not a tolerance band. Determinism is structural, not incidental:
  *  - HLL registers are per-bucket MAX — commutative/associative, so
  *    Catalyst's partial aggregation merges them map-side in any order;
  *  - CMS cells are per-(row, column) SUM — same property.
  * That is exactly the merge shape a 1000-executor tree aggregation needs:
  * each sketch is O(1)-sized state per group regardless of input rows.
  */
object Sketches {

  /** Hex nibble of a string expression at 1-based position `i` → 0..15
    * (instr is 1-based and identical in both engines). */
  private def nib(h: String, i: Int): String =
    s"(instr('0123456789abcdef', substr($h, $i, 1)) - 1)"

  // ---- sk01: HyperLogLog distinct sketch ----------------------------------
  // m = 256 registers (b = 8 bucket bits = the first 2 md5 nibbles).
  // The next 8 nibbles form a 32-bit value v; rho = position of the highest
  // set bit counted from bit 32 (leading-zero count + 1), computed exactly as
  // 33 - bitlength(v) via length(bin(v)) — bin() renders without leading
  // zeros in both engines; v = 0 (p = 2^-32) saturates at rho = 33.
  // Register_b = MAX(rho) over the bucket's items: the sketch state.
  //
  // The readout is the raw HLL estimate alpha_256 * m^2 / sum(2^-reg), kept
  // integer-exact by scaling: s_scaled = sum(2^(33-reg)) (empty bucket →
  // 2^33), est = floor(alpha_m2_e0 * 2^33 / s_scaled) where
  // alpha_m2_e0 = floor(0.718273 * 256 * 256) = floor(718273*65536/1e6)
  // = 47072 (alpha_256 = 0.7213/(1 + 1.079/256), e6-truncated — a fixed
  // published constant, same truncation in both engines by construction).
  // No small-range linear-counting correction: that needs ln(), which is
  // floating point; the raw estimate keeps the gate integer-exact and the
  // spec pins the accuracy band on a 65k-distinct synthetic input instead.
  private val hllHash = "md5(CAST(event_id AS STRING))"

  private def hllV32(h: String): String =
    (4 to 10).map(i => nib(h, i)) // first term BIGINT ⇒ the whole Horner
      .foldLeft(s"CAST(${nib(h, 3)} AS BIGINT)")( // chain is 64-bit (ANSI-safe)
        (acc, n) => s"($acc * 16 + $n)")

  def sk01HllDistinct(s: SparkSession, d: String): DataFrame = {
    val h = hllHash
    val perItem = Tables.events(s, d).selectExpr(
      s"CAST(${nib(h, 1)} * 16 + ${nib(h, 2)} AS BIGINT) AS bucket",
      s"CAST(${hllV32(h)} AS BIGINT) AS v")
      .selectExpr("bucket",
        "CASE WHEN v = 0 THEN 33L ELSE CAST(33 - length(bin(v)) AS BIGINT) END AS rho")
    val regs0 = perItem.groupBy(col("bucket")).agg(max(col("rho")).as("r"))
    // all 256 buckets, empty → register 0: the fixed-size state a merge sees
    val regs = s.range(256).toDF("bucket")
      .join(broadcast(regs0), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("r"), lit(0L)).as("register"))
    val summary = regs.selectExpr(
      "CAST(shiftleft(CAST(1 AS BIGINT), CAST(33 - register AS INT)) AS BIGINT) AS p")
      .agg(sum(col("p")).cast("long").as("s_scaled"))
      .selectExpr("s_scaled",
        "CAST(47072 AS BIGINT) * 8589934592 DIV s_scaled AS est_distinct")
    val exact = Tables.events(s, d)
      .agg(countDistinct(col("event_id")).as("n_exact"))
    regs.crossJoin(broadcast(summary)).crossJoin(broadcast(exact))
      .orderBy(col("bucket"))
  }

  val sk01Sql: String = {
    val h = "md5(CAST(event_id AS VARCHAR))"
    s"""WITH per AS (
       |  SELECT CAST(${nib(h, 1)} * 16 + ${nib(h, 2)} AS BIGINT) AS bucket,
       |         CAST(${hllV32(h)} AS BIGINT) AS v
       |  FROM events),
       |rho AS (
       |  SELECT bucket,
       |    CASE WHEN v = 0 THEN CAST(33 AS BIGINT)
       |         ELSE CAST(33 - length(bin(v)) AS BIGINT) END AS rho
       |  FROM per),
       |regs0 AS (SELECT bucket, MAX(rho) AS r FROM rho GROUP BY bucket),
       |frame AS (SELECT CAST(generate_series AS BIGINT) AS bucket
       |          FROM generate_series(0, 255)),
       |regs AS (
       |  SELECT f.bucket, CAST(COALESCE(r.r, 0) AS BIGINT) AS register
       |  FROM frame f LEFT JOIN regs0 r ON f.bucket = r.bucket),
       |summ AS (
       |  SELECT CAST(SUM(CAST(1 AS BIGINT) << CAST(33 - register AS INT)) AS BIGINT)
       |           AS s_scaled
       |  FROM regs),
       |summ2 AS (
       |  SELECT s_scaled,
       |         CAST(47072 AS BIGINT) * 8589934592 // s_scaled AS est_distinct
       |  FROM summ),
       |exact AS (SELECT COUNT(DISTINCT event_id) AS n_exact FROM events)
       |SELECT regs.bucket, regs.register, summ2.s_scaled, summ2.est_distinct,
       |       exact.n_exact
       |FROM regs CROSS JOIN summ2 CROSS JOIN exact
       |ORDER BY regs.bucket""".stripMargin
  }

  // ---- sk02: count-min sketch + heavy-hitter readout -----------------------
  // d = 3 seeded rows × w = 256 columns over the document token stream.
  // Column of token t in row k: first 2 nibbles of md5('c<k>' || t).
  // Cell value = SUM of token occurrences hashing there (order-free).
  // Readout: the exact top-20 tokens (row_number over cnt DESC, token ASC —
  // unique tiebreak keeps the boundary deterministic), each with
  // est = MIN over rows of its cell — the CMS guarantee est >= exact is a
  // hard invariant the spec pins alongside golden values.
  //
  // Plan shape: token counts are ONE explode+groupBy; the cell aggregation
  // and the top-k window both consume that same hash exchange, which
  // Catalyst's ReuseExchange dedupes — the corpus is scanned once. Cells
  // (768 rows) broadcast back onto the top-k, so the readout adds no
  // corpus-sized shuffle.
  private val cmsSeeds = 0 until 3

  /** CMS column of the token expression `tok` in sketch row `k`:
    * first 2 nibbles of md5('c<k>' || tok). `cat` is the engine's string
    * concatenation spelling. */
  private def cmsCol(k: Int, tok: String, cat: (String, String) => String): String = {
    val h = s"md5(${cat(s"'c$k'", tok)})"
    s"CAST(${nib(h, 1)} * 16 + ${nib(h, 2)} AS BIGINT)"
  }
  private def sparkCat(a: String, b: String) = s"concat($a, $b)"
  private def duckCat(a: String, b: String) = s"($a || $b)"

  def sk02CmsHeavyHitters(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.documents(s, d)
      .selectExpr("explode(split(text, ' ')) AS tok")
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
    // (row, column, cnt) triples via inline — ONE extra (tiny, 768-group)
    // shuffle over the vocab, not the corpus
    val cells = counts.selectExpr("exact_cnt",
      "inline(array(" + cmsSeeds.map(k =>
        s"named_struct('row_k', CAST($k AS BIGINT), " +
          s"'col_k', ${cmsCol(k, "tok", sparkCat)})").mkString(", ") + "))")
      .groupBy(col("row_k"), col("col_k"))
      .agg(sum(col("exact_cnt")).as("cell_cnt"))
    // distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    // (per-partition heads merged at the driver), NOT a global sort; the
    // row_number window then runs over 20 rows only
    val top = counts.orderBy(col("exact_cnt").desc, col("tok")).limit(20)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("exact_cnt").desc, col("tok"))).cast("int"))
    val withCols = top.selectExpr((Seq("rk", "tok", "exact_cnt") ++
      cmsSeeds.map(k => cmsCol(k, "tok", sparkCat) + s" AS c$k")): _*)
    val joined = cmsSeeds.foldLeft(withCols) { (acc, k) =>
      acc.join(
        broadcast(cells.filter(col("row_k") === k)
          .select(col("col_k").as(s"jc$k"), col("cell_cnt").as(s"e$k"))),
        col(s"c$k") === col(s"jc$k"), "left")
    }
    joined.selectExpr("rk", "tok", "exact_cnt",
      "CAST(least(e0, e1, e2) AS BIGINT) AS est_cnt")
      .orderBy(col("rk"))
  }

  val sk02Sql: String = {
    def c(k: Int, tok: String) = cmsCol(k, tok, duckCat)
    s"""WITH toks AS (
       |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
       |counts AS (
       |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt
       |  FROM toks WHERE tok <> '' GROUP BY tok),
       |cells AS (
       |  SELECT row_k, col_k, CAST(SUM(exact_cnt) AS BIGINT) AS cell_cnt
       |  FROM (
       |    ${cmsSeeds.map(k =>
              s"SELECT CAST($k AS BIGINT) AS row_k, ${c(k, "tok")} AS col_k, exact_cnt FROM counts")
              .mkString("\n    UNION ALL\n    ")}
       |  ) GROUP BY row_k, col_k),
       |top AS (
       |  SELECT * FROM (
       |    SELECT CAST(ROW_NUMBER() OVER (ORDER BY exact_cnt DESC, tok) AS INT)
       |             AS rk, tok, exact_cnt
       |    FROM counts)
       |  WHERE rk <= 20)
       |SELECT t.rk, t.tok, t.exact_cnt,
       |       CAST(LEAST(e0.cell_cnt, e1.cell_cnt, e2.cell_cnt) AS BIGINT) AS est_cnt
       |FROM top t
       |LEFT JOIN cells e0 ON e0.row_k = 0 AND e0.col_k = ${c(0, "t.tok")}
       |LEFT JOIN cells e1 ON e1.row_k = 1 AND e1.col_k = ${c(1, "t.tok")}
       |LEFT JOIN cells e2 ON e2.row_k = 2 AND e2.col_k = ${c(2, "t.tok")}
       |ORDER BY t.rk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sk01_hll_distinct" -> (sk01HllDistinct _),
    "sk02_cms_heavy_hitters" -> (sk02CmsHeavyHitters _))

  val oracleSql: Map[String, String] = Map(
    "sk01_hll_distinct" -> sk01Sql,
    "sk02_cms_heavy_hitters" -> sk02Sql)
}
