package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg.{CorpusStore, Dicts, Ns, SequentialOracle, Synth}

/** DuckDB oracles for the kg* query layer.
  *
  * The KG corpus is engine-side (deterministic synthesis, TESTDATA.md has no
  * triple table), so the driver cannot state these queries over its own
  * parquet inputs. Instead graft.Verify dumps the pipeline's INTERMEDIATE
  * tables — the materialized triple set, the per-day parse counters, the
  * enriched-article projection, the ground-truth labels and the
  * company-subclass dim — to `<outDir>/_oracle_aux/` and each oracle is
  * plain DuckDB SQL over those parquet files. What the oracle independently
  * recomputes is exactly what each kg query adds ON TOP of the intermediates:
  * the date-dedup distinct, the join chains, the recursive closures
  * (kg04/kg08 as recursive CTEs), the windows and the integer arithmetic.
  * The intermediates themselves are gated by the ScalaTest sequential-oracle
  * and golden-fixture specs (KgQueriesSpec/PipelineSpec/EmitSpec).
  *
  * `{AUX}` is substituted by graft.Verify with the absolute aux dir path at
  * dump time (DuckDB runs with an unknown cwd, so relative paths are unsafe).
  *
  * Type parity rules (driver compares arrow schemas after sorting columns by
  * name): DuckDB SUM(BIGINT) widens to HUGEINT — always CAST back to BIGINT;
  * COUNT/COUNT(DISTINCT) are BIGINT in both engines; Spark's `DIV` and
  * DuckDB's `//` agree on non-negative BIGINT; CASE WHEN → 1/0 stays INT32 in
  * both (kg06 is_pure_text, kg07 is_company_subclass).
  */
object KgOracles {

  private def t(name: String) = s"read_parquet('{AUX}/$name/*.parquet')"

  // predicate / prefix constants interpolated into the SQL so the oracle
  // can never drift from the engine's Ns definitions by a typo
  private val mention = Ns.COY + "hasMentionDate"
  private val during = Ns.COY + "isOccuringDuring"
  private val identifiedBy = Ns.COY + "isIdentifiedBy"
  private val hasOsm = Ns.COY + "hasOsmElement"
  private val hasWdType = Ns.COY + "hasWikidataEventType"
  private val subString = Ns.NIF + "subString"
  private val gnWP = Ns.GN + "wikipediaArticle"
  private val asWKT = Ns.GEO + "asWKT"
  private val schemaName = Ns.SCHEMA + "name"
  private val p31 = Ns.WDT + "P31"

  private val isTopicUriSql =
    s"(starts_with(subj, '${Ns.articleTopics}') OR starts_with(subj, '${Ns.textTopics}'))"

  val kg01Sql: String =
    s"""SELECT graph_module, COUNT(*) AS n_triples
       |FROM ${t("kg_triples")}
       |GROUP BY graph_module ORDER BY graph_module""".stripMargin

  val kg02Sql: String =
    s"""SELECT y, COUNT(DISTINCT subj) AS n_events FROM (
       |  SELECT DISTINCT subj, substr(obj, 1, 4) AS y
       |  FROM ${t("kg_triples")}
       |  WHERE pred = '$mention' AND starts_with(subj, '${Ns.events}'))
       |GROUP BY y ORDER BY y""".stripMargin

  val kg03Sql: String =
    s"""WITH e AS (SELECT DISTINCT subj, pred, obj FROM ${t("kg_triples")}
       |           WHERE pred IN ('$mention', '${Ns.rdfType}')),
       |topics AS (SELECT subj FROM e
       |           WHERE pred = '${Ns.rdfType}' AND obj = '${Ns.COY}TextTopic'),
       |md AS (SELECT DISTINCT m.subj, substr(m.obj, 1, 4) AS y
       |       FROM e m WHERE m.pred = '$mention'
       |         AND EXISTS (SELECT 1 FROM topics x WHERE x.subj = m.subj))
       |SELECT y, COUNT(*) AS n_topics FROM md GROUP BY y ORDER BY y""".stripMargin

  // kg04: the isOccuringDuring closure (to fixpoint, like the engine's
  // canon.Reach frontier loop) from the most-referenced parent — a
  // recursive CTE replaces the loop.
  val kg04Sql: String =
    s"""WITH RECURSIVE
       |e AS (SELECT DISTINCT subj AS child, obj AS parent FROM ${t("kg_triples")}
       |      WHERE pred = '$during'),
       |seed AS (SELECT parent AS node FROM e
       |         GROUP BY parent ORDER BY COUNT(*) DESC, parent LIMIT 1),
       |reach AS (SELECT node FROM seed
       |          UNION
       |          SELECT e.child FROM e JOIN reach r ON e.parent = r.node),
       |ev AS (SELECT subj AS node, substr(obj, 1, 7) AS ym
       |       FROM (SELECT DISTINCT subj, obj FROM ${t("kg_triples")}
       |             WHERE pred = '$mention' AND starts_with(subj, '${Ns.events}')))
       |SELECT ym, COUNT(*) AS n_events
       |FROM ev WHERE EXISTS (SELECT 1 FROM reach r WHERE r.node = ev.node)
       |GROUP BY ym ORDER BY ym""".stripMargin

  /** The five association-chain CTEs (evctx/ctxsent/sentphrase/phraseart/
    * sameas) shared by the kg05/kg11/kg15 oracles — the ONE SQL definition
    * mirroring KgPipeline.assocChain. `extraPreds` widens the `e` predicate
    * projection; `eventsOnly` adds the events-prefix guard on evctx.
    */
  private def assocCtes(extraPreds: Seq[String], eventsOnly: Boolean): String = {
    val preds = (Seq(identifiedBy, subString, gnWP, Ns.owlSameAs) ++ extraPreds)
      .map(x => s"'$x'").mkString(", ")
    val headGuard =
      if (eventsOnly) s" AND starts_with(subj, '${Ns.events}')" else ""
    s"""WITH e AS (SELECT DISTINCT subj, pred, obj FROM ${t("kg_triples")}
       |  WHERE pred IN ($preds)),
       |evctx AS (SELECT subj AS event, obj AS ctx FROM e
       |          WHERE pred = '$identifiedBy'$headGuard),
       |ctxsent AS (SELECT subj AS ctx, obj AS sent FROM e
       |            WHERE pred = '$subString' AND starts_with(obj, '${Ns.sentences}')),
       |sentphrase AS (SELECT subj AS sent, obj AS phrase FROM e
       |               WHERE pred = '$subString' AND starts_with(obj, '${Ns.phrases}')),
       |phraseart AS (SELECT subj AS phrase, obj AS article FROM e
       |              WHERE pred = '$gnWP' AND starts_with(subj, '${Ns.phrases}')),
       |sameas AS (SELECT subj AS article, obj AS wd FROM e
       |           WHERE pred = '${Ns.owlSameAs}' AND starts_with(subj, '${Ns.wikipediaArticle}'))""".stripMargin
  }

  val kg05Sql: String =
    s"""${assocCtes(Seq(hasOsm, asWKT, mention), eventsOnly = false)},
       |hasosm AS (SELECT subj AS holder, obj AS osm FROM e WHERE pred = '$hasOsm'),
       |wkts AS (SELECT subj AS osm, obj AS wkt FROM e WHERE pred = '$asWKT'),
       |dates AS (SELECT subj AS event, obj AS dt FROM e
       |          WHERE pred = '$mention' AND starts_with(subj, '${Ns.events}')),
       |artosm AS (SELECT s.article, h.osm FROM sameas s JOIN hasosm h ON s.wd = h.holder
       |           UNION ALL
       |           SELECT h.holder AS article, h.osm FROM hasosm h
       |           WHERE starts_with(h.holder, '${Ns.wikipediaArticle}'))
       |SELECT DISTINCT d.dt AS "date", ec.event, pa.article, w.wkt
       |FROM evctx ec JOIN ctxsent cs ON ec.ctx = cs.ctx
       |  JOIN sentphrase sp ON cs.sent = sp.sent
       |  JOIN phraseart pa ON sp.phrase = pa.phrase
       |  JOIN artosm ao ON pa.article = ao.article
       |  JOIN wkts w ON ao.osm = w.osm
       |  JOIN dates d ON ec.event = d.event
       |ORDER BY 1, 2, 3, 4""".stripMargin

  val kg06Sql: String =
    s"""WITH e AS (SELECT DISTINCT subj, pred, obj FROM ${t("kg_triples")}
       |  WHERE pred IN ('${Ns.rdfType}', '$gnWP', '$schemaName', '${Ns.rdfsLabel}',
       |                 '$during', '$mention')),
       |topics AS (SELECT subj AS topic FROM e
       |           WHERE pred = '${Ns.rdfType}' AND obj = '${Ns.COY}TextTopic'),
       |atopics AS (SELECT subj AS topic FROM e
       |            WHERE pred = '${Ns.rdfType}' AND obj = '${Ns.COY}ArticleTopic'),
       |pure AS (SELECT topic FROM topics tp
       |         WHERE NOT EXISTS (SELECT 1 FROM atopics a WHERE a.topic = tp.topic)),
       |wpart AS (SELECT subj AS topic, obj AS art FROM e
       |          WHERE pred = '$gnWP' AND $isTopicUriSql),
       |artnames AS (SELECT subj AS art, obj AS label FROM e
       |             WHERE pred = '$schemaName' AND starts_with(subj, '${Ns.wikipediaArticle}')),
       |alab AS (SELECT a.topic, n.label FROM atopics a
       |         JOIN wpart w ON w.topic = a.topic JOIN artnames n ON n.art = w.art),
       |tlab AS (SELECT subj AS topic, obj AS label FROM e
       |         WHERE pred = '${Ns.rdfsLabel}' AND $isTopicUriSql
       |           AND EXISTS (SELECT 1 FROM pure p WHERE p.topic = e.subj)),
       |labels AS (SELECT * FROM alab UNION ALL SELECT * FROM tlab),
       |parents AS (SELECT subj AS topic, obj AS parent FROM e
       |            WHERE pred = '$during' AND $isTopicUriSql),
       |dates AS (SELECT subj AS topic, obj AS dt FROM e
       |          WHERE pred = '$mention' AND $isTopicUriSql)
       |SELECT tp.topic, p.parent, MIN(l.label) AS label, MIN(d.dt) AS earliest,
       |  MAX(CASE WHEN pu.topic IS NOT NULL THEN 1 ELSE 0 END) AS is_pure_text
       |FROM topics tp
       |LEFT JOIN labels l ON l.topic = tp.topic
       |LEFT JOIN parents p ON p.topic = tp.topic
       |LEFT JOIN dates d ON d.topic = tp.topic
       |LEFT JOIN pure pu ON pu.topic = tp.topic
       |GROUP BY tp.topic, p.parent
       |ORDER BY 1, 2""".stripMargin

  val kg07Sql: String =
    s"""WITH e AS (SELECT DISTINCT subj, pred, obj FROM ${t("kg_triples")}
       |           WHERE pred IN ('$hasWdType', '${Ns.rdfsLabel}')),
       |ty AS (SELECT subj AS event, obj AS wd_class FROM e WHERE pred = '$hasWdType'),
       |lb AS (SELECT subj AS wd_class, obj AS class_label FROM e WHERE pred = '${Ns.rdfsLabel}'),
       |co AS (SELECT '${Ns.WD}' || value AS wd_class, 1 AS is_c FROM ${t("kg_company")})
       |SELECT DISTINCT ty.event, ty.wd_class, lb.class_label,
       |  COALESCE(co.is_c, 0) AS is_company_subclass
       |FROM ty LEFT JOIN lb ON ty.wd_class = lb.wd_class
       |        LEFT JOIN co ON ty.wd_class = co.wd_class
       |ORDER BY 1, 2""".stripMargin

  // kg08: connected components over owl:sameAs = per-node MIN reachable
  // label on the symmetrized graph, stated as a recursive CTE.
  val kg08Sql: String =
    s"""WITH RECURSIVE
       |sa AS (SELECT DISTINCT subj AS u, obj AS v FROM ${t("kg_triples")}
       |       WHERE pred = '${Ns.owlSameAs}'),
       |sym AS (SELECT u, v FROM sa UNION SELECT v AS u, u AS v FROM sa),
       |reach AS (SELECT u AS node, u AS lab FROM sym
       |          UNION
       |          SELECT s.u AS node, r.lab FROM sym s JOIN reach r ON s.v = r.node)
       |SELECT node AS entity, MIN(lab) AS canonical_id
       |FROM reach GROUP BY node ORDER BY entity""".stripMargin

  val kg09Sql: String =
    s"""SELECT event_date, graph_module, COUNT(*) AS n_triples,
       |  COUNT(DISTINCT subj) AS n_subjects,
       |  CAST(SUM(CASE WHEN obj_is_iri THEN 1 ELSE 0 END) AS BIGINT) AS n_iri_objects
       |FROM ${t("kg_triples")}
       |GROUP BY event_date, graph_module ORDER BY event_date, graph_module""".stripMargin

  val kg10Sql: String =
    s"""WITH j AS (SELECT l.labeled AS lab, a.location_flag AS prd
       |           FROM ${t("kg_labeled")} l
       |           JOIN ${t("kg_enriched")} a ON l.url = a.url
       |           WHERE l.resolvable),
       |c AS (SELECT
       |  CAST(SUM(CASE WHEN lab AND prd THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |  CAST(SUM(CASE WHEN NOT lab AND prd THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |  CAST(SUM(CASE WHEN lab AND NOT prd THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |  CAST(SUM(CASE WHEN NOT lab AND NOT prd THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM j)
       |SELECT tp, fp, fn, tn,
       |  (1000000 * tp) // GREATEST(tp + fp, 1) AS precision_e6,
       |  (1000000 * tp) // GREATEST(tp + fn, 1) AS recall_e6,
       |  (1000000 * (tp + tn)) // GREATEST(tp + fp + fn + tn, 1) AS accuracy_e6
       |FROM c""".stripMargin

  val kg11Sql: String =
    s"""${assocCtes(Seq(p31), eventsOnly = true)},
       |types AS (SELECT subj AS wd, obj AS tpe FROM e WHERE pred = '$p31'),
       |co AS (SELECT '${Ns.WD}' || value AS tpe FROM ${t("kg_company")})
       |SELECT DISTINCT sa.wd
       |FROM evctx ec JOIN ctxsent cs ON ec.ctx = cs.ctx
       |  JOIN sentphrase sp ON cs.sent = sp.sent
       |  JOIN phraseart pa ON sp.phrase = pa.phrase
       |  JOIN sameas sa ON pa.article = sa.article
       |  JOIN types ty ON sa.wd = ty.wd
       |WHERE EXISTS (SELECT 1 FROM co WHERE co.tpe = ty.tpe)
       |ORDER BY 1""".stripMargin

  private val kgStatPreds = Seq(
    "hasTimespan" -> "n_topics_with_timespan",
    "hasLocation" -> "n_topics_with_location",
    "hasStartDate" -> "n_timespans_with_start_date",
    "hasEndDate" -> "n_timespans_with_end_date",
    "hasOngoingSpan" -> "n_timespans_ongoing",
    "hasStartTimestamp" -> "n_timespans_with_start_time",
    "hasEndTimestamp" -> "n_timespans_with_end_time",
    "hasWikidataEventType" -> "n_events_with_wd_type")

  val kg12Sql: String = {
    val kgStatCols = kgStatPreds.map { case (p, name) =>
      s"  COUNT(DISTINCT CASE WHEN pred = '${Ns.COY}$p' THEN subj END) AS $name"
    }.mkString(",\n")
    val kgStatIn = kgStatPreds.map(p => s"'${Ns.COY}${p._1}'").mkString(", ")
    val coalesced = (Seq("n_article_requests", "article_cache_misses",
      "article_cache_hits", "n_articles_resolved", "n_articles_with_wd",
      "n_articles_with_loc_flag", "n_articles_with_osm", "n_articles_with_falcon",
      "n_osm_elements", "n_falcon_entities", "n_articles_with_wkt",
      "n_articles_with_coords", "n_articles_with_loc_row",
      "n_articles_with_parent_loc", "n_articles_with_classes", "n_wd_classes",
      "n_articles_with_children", "n_child_links", "n_articles_with_microformat",
      "n_time_rows", "n_date_rows", "n_time_parse_errors", "n_date_parse_errors")
      ++ kgStatPreds.map(_._2))
      .map(c => s"  COALESCE($c, 0) AS $c").mkString(",\n")
    s"""WITH pd AS (SELECT * FROM ${t("kg_perday")}),
       |monthly AS (SELECT ym, COUNT(*) AS n_days,
       |  CAST(SUM(n_events) AS BIGINT) AS n_events,
       |  CAST(SUM(n_topics) AS BIGINT) AS n_topics,
       |  CAST(SUM(n_sentences) AS BIGINT) AS n_sentences,
       |  CAST(SUM(n_references) AS BIGINT) AS n_references,
       |  CAST(SUM(n_events_with_refs) AS BIGINT) AS n_events_with_refs,
       |  CAST(SUM(n_event_links) AS BIGINT) AS n_event_links,
       |  CAST(SUM(n_linkless_topics) AS BIGINT) AS n_linkless_topics
       |  FROM pd GROUP BY ym),
       |reqs AS (SELECT ym, unnest(hrefs) AS href FROM pd),
       |cache AS (SELECT ym, COUNT(*) AS n_article_requests,
       |  COUNT(DISTINCT href) AS article_cache_misses,
       |  COUNT(*) - COUNT(DISTINCT href) AS article_cache_hits
       |  FROM reqs GROUP BY ym),
       |art AS (SELECT r.ym,
       |  COUNT(*) AS n_articles_resolved,
       |  CAST(SUM(CASE WHEN a.wd_uri IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_wd,
       |  CAST(SUM(CASE WHEN a.location_flag THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_loc_flag,
       |  CAST(SUM(CASE WHEN a.n_osm > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_osm,
       |  CAST(SUM(CASE WHEN a.n_falcon > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_falcon,
       |  CAST(SUM(a.n_osm) AS BIGINT) AS n_osm_elements,
       |  CAST(SUM(a.n_falcon) AS BIGINT) AS n_falcon_entities,
       |  CAST(SUM(CASE WHEN a.n_wkt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_wkt,
       |  CAST(SUM(CASE WHEN a.n_page_coords > 0 OR a.n_ib_coords > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_coords,
       |  CAST(SUM(CASE WHEN a.loc_value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_loc_row,
       |  CAST(SUM(CASE WHEN a.n_parent_loc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_parent_loc,
       |  CAST(SUM(CASE WHEN a.n_classes > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_classes,
       |  CAST(SUM(a.n_classes) AS BIGINT) AS n_wd_classes,
       |  CAST(SUM(CASE WHEN a.n_children > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_children,
       |  CAST(SUM(a.n_children) AS BIGINT) AS n_child_links,
       |  CAST(SUM(CASE WHEN a.micro_dtstart IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_articles_with_microformat,
       |  CAST(SUM(a.n_time_rows) AS BIGINT) AS n_time_rows,
       |  CAST(SUM(a.n_date_rows) AS BIGINT) AS n_date_rows,
       |  CAST(SUM(a.n_time_errs) AS BIGINT) AS n_time_parse_errors,
       |  CAST(SUM(a.n_date_errs) AS BIGINT) AS n_date_parse_errors
       |  FROM (SELECT DISTINCT ym, href FROM reqs) r
       |  JOIN ${t("kg_enriched")} a ON r.href = a.url GROUP BY r.ym),
       |kgs AS (SELECT substr(event_date, 1, 7) AS ym,
       |$kgStatCols
       |  FROM ${t("kg_triples")} WHERE pred IN ($kgStatIn) GROUP BY 1)
       |SELECT m.ym, m.n_days, m.n_events, m.n_topics, m.n_sentences,
       |  m.n_references, m.n_events_with_refs, m.n_event_links, m.n_linkless_topics,
       |$coalesced
       |FROM monthly m
       |LEFT JOIN cache USING (ym)
       |LEFT JOIN art USING (ym)
       |LEFT JOIN kgs USING (ym)
       |ORDER BY ym""".stripMargin
  }

  val kg13Sql: String =
    s"""WITH pd AS (SELECT * FROM ${t("kg_perday")}),
       |months AS (SELECT DISTINCT ym FROM pd),
       |reqs AS (SELECT ym, unnest(hrefs) AS href FROM pd),
       |c AS (SELECT ym, COUNT(*) AS total, COUNT(DISTINCT href) AS misses
       |      FROM reqs GROUP BY ym),
       |m AS (SELECT months.ym,
       |        COALESCE(c.total - c.misses, 0) AS hits,
       |        COALESCE(c.misses, 0) AS misses
       |      FROM months LEFT JOIN c USING (ym))
       |SELECT ym, hits, misses,
       |  CASE WHEN hits + misses = 0 THEN NULL
       |       ELSE (1000000 * hits) // (hits + misses) END AS ratio_e6,
       |  CASE WHEN SUM(hits + misses) OVER w = 0 THEN NULL
       |       ELSE CAST((1000000 * SUM(hits) OVER w) // (SUM(hits + misses) OVER w) AS BIGINT)
       |       END AS cumulative_ratio_e6
       |FROM m WINDOW w AS (ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |ORDER BY ym""".stripMargin

  // kg14: the input table itself. The oracle re-derives the flatten from the
  // NESTED dump (spans[i] list indexing + struct field access), so the
  // explode, the 1-based positions, and the per-span hash key are all
  // independently recomputed. The coin is the first 8 md5 hex digits as a
  // BIGINT — DuckDB has no conv(hex), so the nibble fold accumulates in
  // BIGINT (16^7·15 overflows INT32).
  val kg14Sql: String = {
    val nib = (i: Int) => s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val fold = (2 to 8).foldLeft(s"CAST(${nib(1)} AS BIGINT)")((acc, i) => s"($acc * 16 + ${nib(i)})")
    s"""WITH corpus AS (SELECT doc_id, spans FROM ${t("kg_corpus")}),
       |series AS (SELECT i FROM generate_series(1, 4096) t(i)),
       |sp AS (
       |  SELECT doc_id, spans[i].kind AS kind, spans[i].media_ref AS media_ref,
       |    md5(doc_id || '|' || CAST(i AS VARCHAR) || '|' || spans[i].kind || '|' ||
       |        COALESCE(spans[i].text, '') || '|' || COALESCE(spans[i].media_ref, '') ||
       |        '|' || CAST(spans[i].offset AS VARCHAR)) AS h
       |  FROM corpus JOIN series ON i <= len(spans))
       |SELECT kind, COUNT(*) AS n_spans, COUNT(DISTINCT doc_id) AS n_docs,
       |  CAST(SUM(CASE WHEN media_ref IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_media_refs,
       |  CAST(SUM($fold) AS BIGINT) AS seq_checksum
       |FROM sp GROUP BY kind ORDER BY kind""".stripMargin
  }

  // kg15: kg11's association chain (no company filter) projected to
  // entity-entity co-occurrence edges; the <= Kg15MaxEntities guard is part
  // of the definition and recomputed here.
  val kg15Sql: String =
    s"""${assocCtes(Nil, eventsOnly = true)},
       |ew AS (
       |  SELECT DISTINCT ec.event, sa.wd
       |  FROM evctx ec JOIN ctxsent cs ON ec.ctx = cs.ctx
       |    JOIN sentphrase sp ON cs.sent = sp.sent
       |    JOIN phraseart pa ON sp.phrase = pa.phrase
       |    JOIN sameas sa ON pa.article = sa.article),
       |ok AS (
       |  SELECT ew.* FROM ew JOIN (
       |    SELECT event FROM ew GROUP BY event
       |    HAVING COUNT(*) <= ${KgPipeline.Kg15MaxEntities}) k USING (event))
       |SELECT x.wd AS wd_a, y.wd AS wd_b, COUNT(*) AS n_events
       |FROM ok x JOIN ok y ON x.event = y.event AND x.wd < y.wd
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // kg16: the fidelity diff recomputed from the two dumped sets — the
  // engine's materialized triples vs the sequential oracle's independent
  // re-derivation. Same full-outer null-safe 8-column join as the engine
  // query (IS NOT DISTINCT FROM ↔ Spark's <=>); DuckDB SUM widens to
  // HUGEINT, hence the CASTs.
  val kg16Sql: String = {
    val cols = Seq("graph_module", "subj", "pred", "obj", "obj_is_iri",
      "obj_dtype", "obj_lang", "event_date")
    val cond = cols.map(c => s"e.$c IS NOT DISTINCT FROM o.$c").mkString(" AND ")
    s"""WITH e AS (SELECT DISTINCT * FROM ${t("kg_triples")}),
       |o AS (SELECT DISTINCT * FROM ${t("kg_oracle_triples")}),
       |j AS (
       |  SELECT CASE WHEN e.subj IS NOT NULL THEN 1 ELSE 0 END AS in_eng,
       |         CASE WHEN o.subj IS NOT NULL THEN 1 ELSE 0 END AS in_orc
       |  FROM e FULL OUTER JOIN o ON $cond),
       |c AS (
       |  SELECT CAST(SUM(in_eng) AS BIGINT) AS n_engine,
       |         CAST(SUM(in_orc) AS BIGINT) AS n_oracle,
       |         CAST(SUM(in_eng * in_orc) AS BIGINT) AS n_common
       |  FROM j)
       |SELECT n_engine, n_oracle, n_common,
       |  n_engine - n_common AS n_only_engine,
       |  n_oracle - n_common AS n_only_oracle,
       |  (1000000 * n_common) // n_engine AS precision_e6,
       |  (1000000 * n_common) // n_oracle AS recall_e6
       |FROM c""".stripMargin
  }

  /** kg17 oracle: the g03 unrolled-CTE pattern over the DUMPED kg15
    * co-occurrence edges — weighted integer PageRank recomputed by DuckDB
    * from artifacts. MATERIALIZED leaves (e / wt / nodes) keep DuckDB from
    * re-inlining the edge scan into every unrolled step (the g05 fd lesson).
    * CASTs pin BIGINT against HUGEINT widening (driver-oracle parity rules).
    */
  val kg17Sql: String = {
    val scale = KgPipeline.Kg17Scale
    val nn = "(SELECT n FROM nn)"
    val head =
      s"""WITH cooc AS (SELECT * FROM ${t("kg_cooc")}),
         |e AS MATERIALIZED (
         |  SELECT wd_a AS src, wd_b AS dst, n_events AS w FROM cooc
         |  UNION ALL
         |  SELECT wd_b AS src, wd_a AS dst, n_events AS w FROM cooc),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
         |nn AS (SELECT COUNT(*) AS n FROM nodes),
         |wt AS MATERIALIZED (
         |  SELECT src, CAST(SUM(w) AS BIGINT) AS wtot FROM e GROUP BY src),
         |p0 AS (SELECT node, CAST($scale // $nn AS BIGINT) AS pr FROM nodes)""".stripMargin
    val iters = (1 to KgPipeline.Kg17Iters).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT e.dst AS node,
         |    CAST((15 * ($scale // $nn)) // 100
         |      + (85 * CAST(SUM((p${i - 1}.pr * e.w) // wt.wtot) AS BIGINT)) // 100 AS BIGINT) AS pr
         |  FROM e JOIN p${i - 1} ON e.src = p${i - 1}.node
         |  JOIN wt ON e.src = wt.src
         |  GROUP BY e.dst)""".stripMargin
    }
    (Seq(head) ++ iters).mkString(",\n") +
      s"\nSELECT node AS wd, pr AS pr_e12 FROM p${KgPipeline.Kg17Iters} ORDER BY node"
  }

  /** kg18 oracle: identical per-(module, month) recount + LAG delta over the
    * dumped triple table.
    */
  val kg18Sql: String =
    s"""WITH m AS (
       |  SELECT graph_module, substr(event_date, 1, 7) AS month,
       |    COUNT(*) AS n_triples
       |  FROM ${t("kg_triples")}
       |  WHERE event_date IS NOT NULL
       |  GROUP BY graph_module, month)
       |SELECT graph_module, month, n_triples,
       |  CAST(COALESCE(n_triples - LAG(n_triples, 1) OVER (
       |    PARTITION BY graph_module ORDER BY month), n_triples) AS BIGINT) AS delta
       |FROM m ORDER BY graph_module, month""".stripMargin

  val sql: Map[String, String] = Map(
    "kg18_monthly_delta" -> kg18Sql,
    "kg17_entity_pagerank" -> kg17Sql,
    "kg16_triple_parity" -> kg16Sql,
    "kg15_entity_cooccurrence" -> kg15Sql,
    "kg01_module_counts" -> kg01Sql,
    "kg02_events_per_year" -> kg02Sql,
    "kg03_topics_per_year" -> kg03Sql,
    "kg04_closure_events_per_month" -> kg04Sql,
    "kg05_event_map_wkts" -> kg05Sql,
    "kg06_topic_graph" -> kg06Sql,
    "kg07_event_types" -> kg07Sql,
    "kg08_canonical_clusters" -> kg08Sql,
    "kg09_partition_metrics" -> kg09Sql,
    "kg10_location_eval" -> kg10Sql,
    "kg11_company_entities" -> kg11Sql,
    "kg12_monthly_metrics" -> kg12Sql,
    "kg13_hit_ratio_window" -> kg13Sql,
    "kg14_span_inventory" -> kg14Sql)

  /** Projection of the enriched-article frame the kg12/kg10 oracles read:
    * plain columns + array sizes (structs don't need to cross into DuckDB).
    */
  def enrichedView(s: SparkSession, sfDir: String): DataFrame =
    KgPipeline.enriched(s, sfDir).select(
      col("url"),
      col("wdUri").as("wd_uri"),
      col("locationFlag").as("location_flag"),
      col("locValue").as("loc_value"),
      col("microDtstart").as("micro_dtstart"),
      size(col("osmElements")).as("n_osm"),
      size(col("falconEntityUris")).as("n_falcon"),
      size(col("locLinkWkts")).as("n_wkt"),
      size(col("pageCoordinates")).as("n_page_coords"),
      size(col("ibCoordinates")).as("n_ib_coords"),
      size(col("parentLocUris")).as("n_parent_loc"),
      size(col("classes")).as("n_classes"),
      size(col("childUrls")).as("n_children"),
      size(col("timeRows")).as("n_time_rows"),
      size(col("dateRows")).as("n_date_rows"),
      col("nTimeParseErrors").as("n_time_errs"),
      col("nDateParseErrors").as("n_date_errs"))

  /** Dump every oracle input table under `auxDir` (called by graft.Verify
    * after the query outputs, so the shared caches are already warm).
    */
  def dumpAux(s: SparkSession, sfDir: String, auxDir: String): Unit = {
    def write(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$auxDir/$name")
    write(KgPipeline.triples(s, sfDir).toDF(), "kg_triples")
    // kg16's second input: the sequential oracle's INDEPENDENT triple set
    // (driver-side walk, no Spark) — dumped so DuckDB can recompute the
    // engine-vs-oracle fidelity diff from artifacts, not from in-JVM state
    write(s.createDataFrame(s.sparkContext.parallelize(
      SequentialOracle.expectedTriples(Synth.paramsFor(sfDir)).toSeq, 8)),
      "kg_oracle_triples")
    write(Dicts.companySubclassesDs(s).toDF("value"), "kg_company")
    write(KgPipeline.labeledLocations(s, sfDir), "kg_labeled")
    write(enrichedView(s, sfDir), "kg_enriched")
    write(KgPipeline.kg12PerDay(s, sfDir), "kg_perday")
    // kg14's input: the documents table itself, spans kept NESTED so the
    // oracle independently recomputes the flatten. Same silent-cap preflight
    // class as Verify's text-length check: the oracle's series window must
    // cover the longest span array.
    val corpus = CorpusStore.scan(s, Synth.paramsFor(sfDir))
      .select(col("doc_id"), col("spans"))
    val maxSpans = corpus.selectExpr("coalesce(max(size(spans)), 0) AS m")
      .collect().head.getInt(0)
    require(maxSpans <= 4096,
      s"corpus max spans length $maxSpans exceeds the kg14 oracle series " +
        "window (4096) — widen generate_series before trusting the gate")
    write(corpus, "kg_corpus")
    // kg17's input: the kg15 co-occurrence edge list, dumped so the oracle's
    // unrolled PageRank runs over the same artifact the engine ranks
    write(KgPipeline.kg15EntityCooccurrence(s, sfDir), "kg_cooc")
  }
}
