package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Exact._
import graft.Stage.StageOps
import graft.Tables
import graft.functions.Portable._
import graft.functions.VectorDot.vdot
import graft.functions.VectorDotLong.vdotl


/** The DuckDB oracle twins: shared SQL fragments and the oracleSql
  * map. Generated from the SAME declared constants as the Spark side
  * (one source, two engines, drift impossible).
  *
  * Implementation module of [[Pipeline]] (mixed into the one public
  * object; members are package-private to graft.queries). Split from
  * the former monolith in round 12 with zero behavior change. */
trait PipelineOracles extends PipelineOracleFragments {

  // the health report's oracle IS the sub-oracles verbatim, each scoped
  // inside its own parenthesized subquery (DuckDB scopes a nested WITH
  // locally, so their CTE names cannot collide) — the composite can
  // never drift from the checks it summarizes. Parameterized on the
  // semantic screen so p110 (exact, p126) and p137 (IVF-served, p136)
  // compose THE SAME report around their respective substrates.
  private def healthReportOracle(semScreenName: String): String =
    s"""WITH
       |v1 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v
       |  FROM (${oracleBase("p84_hourly_anomaly")}) t),
       |v2 AS (SELECT MAX(psi) AS v
       |  FROM (${oracleBase("p81_source_drift_psi")}) t),
       |v3 AS (SELECT MAX(psi) AS v
       |  FROM (${oracleBase("p100_embedding_drift")}) t),
       |v4 AS (SELECT recall AS v
       |  FROM (${oracleBase("p93_dedup_recall")}) t),
       |v5 AS (SELECT CAST(SUM(n_orphans) AS DOUBLE) AS v
       |  FROM (${oracleBase("p87_ref_integrity")}) t)
       |, v6 AS (SELECT CAST(SUM(alarm) AS DOUBLE) AS v
       |  FROM ($sqlP122) t)
       |, v7 AS (SELECT CAST(SUM(CASE WHEN level >= 1 THEN 1 ELSE 0
       |    END) AS DOUBLE) AS v
       |  FROM (${oracleBase("p124_psi_baseline_drift")}) t)
       |, v8 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v
       |  FROM (${oracleBase("p92_decontaminate")}) t)
       |, v9 AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v
       |  FROM (${oracleBase(semScreenName)}) t)
       |, v10 AS (SELECT CAST(SUM(verbatim_leak) AS DOUBLE) AS v
       |  FROM ($sqlP133) t)
       |SELECT 'feed_anomaly_cells' AS "check", v AS value,
       |  0.0 AS threshold, v > 0.0 AS alarm FROM v1
       |UNION ALL SELECT 'source_drift_psi_max', v, 0.2, v > 0.2 FROM v2
       |UNION ALL SELECT 'embedding_drift_psi', v, 0.2, v > 0.2 FROM v3
       |UNION ALL SELECT 'dedup_index_recall', v, 0.8, v < 0.8 FROM v4
       |UNION ALL SELECT 'index_orphans', v, 0.0, v > 0.0 FROM v5
       |UNION ALL SELECT 'cusum_drift_alarms', v, 0.0, v > 0.0 FROM v6
       |UNION ALL SELECT 'psi_window_alarms', v, 0.0, v > 0.0 FROM v7
       |UNION ALL SELECT 'lexical_contam_docs', v, 0.0, v > 0.0 FROM v8
       |UNION ALL SELECT 'semantic_contam_docs', v, 0.0, v > 0.0 FROM v9
       |UNION ALL SELECT 'substring_contam_docs', v, 0.0, v > 0.0
       |  FROM v10"""
      .stripMargin

  val oracleSql: Map[String, String] = oracleBase +
    ("p110_health_report" ->
      healthReportOracle("p126_semantic_decontam")) +
    ("p137_health_report_ivf" ->
      healthReportOracle("p136_semantic_decontam_ivf")) +
    // hybrid retrieval: p74's BM25 oracle embedded verbatim (one source,
    // the p110 rule), the p04-recipe cosine ranking at probe < 10, and
    // the exact-integer RRF fold — RrfScale/(60+rank) divides exactly
    ("p127_rrf_fusion" -> sqlP127) +
    // the IVF-SERVED fused list itself — the serving posture, one
    // source with p129's approximate side
    ("p135_rrf_ivf_serving" -> sqlP135) +
    // the approximation audit: the p127 oracle embedded verbatim as the
    // exact side, the p135 oracle embedded verbatim as the IVF-fused
    // side (the one-source rule both ways), per-probe top-10 overlap out
    ("p129_rrf_ivf_audit" ->
      s"""WITH ex AS (SELECT probe_id, doc_id FROM ($sqlP127) t),
         |iv AS (SELECT probe_id, doc_id FROM ($sqlP135) t),
         |ne AS (SELECT probe_id, CAST(COUNT(*) AS INT) AS n_exact
         |  FROM ex GROUP BY 1),
         |ni AS (SELECT probe_id, CAST(COUNT(*) AS INT) AS n_ivf
         |  FROM iv GROUP BY 1),
         |nb AS (SELECT ex.probe_id, CAST(COUNT(*) AS INT) AS n_overlap
         |  FROM ex JOIN iv ON ex.probe_id = iv.probe_id
         |    AND ex.doc_id = iv.doc_id
         |  GROUP BY 1)
         |SELECT ne.probe_id, ne.n_exact,
         |  COALESCE(ni.n_ivf, CAST(0 AS INT)) AS n_ivf,
         |  COALESCE(nb.n_overlap, CAST(0 AS INT)) AS n_overlap
         |FROM ne LEFT JOIN ni USING (probe_id)
         |LEFT JOIN nb USING (probe_id)""".stripMargin) +
    // per-source contamination: both screens' oracles embedded verbatim,
    // joined to the train split's source column, sources-sized census
    ("p130_contam_by_source" ->
      s"""WITH tr AS (SELECT doc_id, source FROM documents
         |  WHERE doc_id % 29 <> 7),
         |lex AS (SELECT l.doc_id, tr.source
         |  FROM (${oracleBase("p92_decontaminate")}) l JOIN tr USING (doc_id)),
         |sem AS (SELECT s2.doc_id, tr.source
         |  FROM (${oracleBase("p126_semantic_decontam")}) s2
         |  JOIN tr USING (doc_id)),
         |cen AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train_docs
         |  FROM tr GROUP BY 1),
         |nl AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_lexical
         |  FROM lex GROUP BY 1),
         |ns AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_semantic
         |  FROM sem GROUP BY 1),
         |nb AS (SELECT lex.source, CAST(COUNT(*) AS BIGINT) AS n_both
         |  FROM lex JOIN sem ON lex.doc_id = sem.doc_id GROUP BY 1)
         |SELECT cen.source, cen.n_train_docs,
         |  COALESCE(nl.n_lexical, CAST(0 AS BIGINT)) AS n_lexical,
         |  COALESCE(ns.n_semantic, CAST(0 AS BIGINT)) AS n_semantic,
         |  COALESCE(nb.n_both, CAST(0 AS BIGINT)) AS n_both
         |FROM cen LEFT JOIN nl USING (source)
         |LEFT JOIN ns USING (source)
         |LEFT JOIN nb USING (source)""".stripMargin) +
    // index-staleness diff: the postings twin built twice (standing
    // corpus vs corpus+batch, the p36/p65 arrival slice), full-outer
    // classified, 4-row grid census (`bo` not `both` — DuckDB keyword)
    ("p128_index_staleness" ->
      s"""WITH po AS (SELECT token, doc_id, term_q AS tq_old
         |  FROM ${sqlBm25Postings("WHERE doc_id % 10 <> 0")} t),
         |pn AS (SELECT token, doc_id, term_q AS tq_new
         |  FROM ${sqlBm25Postings("")} t),
         |j AS (SELECT CASE WHEN pn.tq_new IS NULL THEN 'retired'
         |      WHEN po.tq_old IS NULL THEN 'new'
         |      WHEN po.tq_old = pn.tq_new THEN 'unchanged'
         |      ELSE 'changed' END AS status,
         |    abs(COALESCE(pn.tq_new, 0) - COALESCE(po.tq_old, 0)) AS adq,
         |    (po.tq_old IS NOT NULL AND pn.tq_new IS NOT NULL) AS bo
         |  FROM po FULL OUTER JOIN pn
         |    ON po.token = pn.token AND po.doc_id = pn.doc_id),
         |c AS (SELECT status, CAST(COUNT(*) AS BIGINT) AS n_postings,
         |    CAST(MAX(CASE WHEN bo THEN adq END) AS DOUBLE) AS max_abs_dq
         |  FROM j GROUP BY 1)
         |SELECT g.status,
         |  COALESCE(c.n_postings, CAST(0 AS BIGINT)) AS n_postings,
         |  c.max_abs_dq
         |FROM (VALUES ('retired'), ('new'), ('changed'), ('unchanged'))
         |  g(status)
         |LEFT JOIN c USING (status)""".stripMargin) +
    ("p111_dedup_threshold_curve" ->
      s"""WITH p AS ($sqlP02),
         |taus AS (SELECT unnest(generate_series(5, 9)) AS tt),
         |hit AS (SELECT tt, doc_a, doc_b FROM p, taus
         |  WHERE jaccard * 10.0 >= tt),
         |pa AS (SELECT tt, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(COUNT(DISTINCT doc_b) AS BIGINT) AS n_dropped
         |  FROM hit GROUP BY 1),
         |da AS (SELECT tt, CAST(COUNT(DISTINCT doc) AS BIGINT)
         |      AS n_docs_linked
         |  FROM (SELECT tt, unnest([doc_a, doc_b]) AS doc FROM hit)
         |  GROUP BY 1)
         |SELECT CAST(t.tt AS DOUBLE) / 10.0 AS threshold,
         |  COALESCE(pa.n_pairs, 0) AS n_pairs,
         |  COALESCE(da.n_docs_linked, 0) AS n_docs_linked,
         |  COALESCE(pa.n_dropped, 0) AS n_dropped
         |FROM taus t LEFT JOIN pa ON pa.tt = t.tt
         |LEFT JOIN da ON da.tt = t.tt""".stripMargin) +
    ("p112_dup_spectrum" -> {
      // one block per width, generated from the SAME SpectrumWidths list
      // the Spark side explodes — the two sides cannot desynchronize
      val blocks = SpectrumWidths.map { w =>
        s"""(WITH sh AS (SELECT doc_id, unnest(${sqlShingles("t", w)})
           |    AS shingle
           |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
           |gr AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g
           |  FROM sh),
           |dfq AS (SELECT g, COUNT(*) AS df FROM gr GROUP BY 1),
           |ga AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_grams,
           |    CAST(COALESCE(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END), 0)
           |      AS BIGINT) AS n_dup_grams FROM dfq),
           |da AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(COALESCE(SUM(CASE WHEN mx > 1 THEN 1 ELSE 0 END), 0)
           |      AS BIGINT) AS n_docs_with_dup
           |  FROM (SELECT doc_id, MAX(df) AS mx
           |    FROM gr JOIN dfq USING (g) GROUP BY 1))
           |SELECT CAST($w AS INTEGER) AS w, da.n_docs, da.n_docs_with_dup,
           |  CASE WHEN da.n_docs = 0 THEN CAST(NULL AS DOUBLE)
           |    ELSE CAST((da.n_docs_with_dup * 1000000) // da.n_docs
           |      AS DOUBLE) / 1000000.0 END AS doc_dup_frac,
           |  ga.n_grams, ga.n_dup_grams,
           |  CASE WHEN ga.n_grams = 0 THEN CAST(NULL AS DOUBLE)
           |    ELSE CAST((ga.n_dup_grams * 1000000) // ga.n_grams
           |      AS DOUBLE) / 1000000.0 END AS gram_dup_frac
           |FROM ga, da)""".stripMargin
      }
      blocks.mkString("\nUNION ALL\n")
    }) +
    ("p113_dup_run_lengths" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |sp AS (SELECT doc_id, j,
         |    ${sqlH60(s"array_to_string(t[(j-1)*$SpanW+1:j*$SpanW], ' ')")}
         |      AS hv
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, len(t) // $SpanW)) AS j FROM tk)),
         |c AS (SELECT hv, COUNT(*) AS cnt FROM sp GROUP BY 1),
         |dw AS (SELECT doc_id, j FROM sp JOIN c USING (hv) WHERE cnt > 1),
         |runs AS (SELECT doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS run_len
         |  FROM (SELECT doc_id, j,
         |      j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j)
         |        AS isl FROM dw)
         |  GROUP BY doc_id, isl)
         |SELECT run_len, run_len * $SpanW AS run_tokens,
         |  CAST(COUNT(*) AS BIGINT) AS n_runs,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM runs GROUP BY 1""".stripMargin) +
    ("p114_run_strip" -> sqlP114) +
    ("p131_substring_strip" -> sqlP131) +
    ("p133_substring_contam" -> sqlP133) +
    // contamination surgery: p133's matched-run CTEs + p131's excision
    // tail, over the train grid
    ("p134_contam_surgery" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |base AS (SELECT doc_id, t, len(t) AS n FROM tk),
         |sp AS (SELECT doc_id, j,
         |    ${sqlH60(s"array_to_string(t[j:j+${SpanW - 1}], ' ')")} AS hv
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, n - ${SpanW - 1})) AS j
         |    FROM base)),
         |ev AS (SELECT DISTINCT hv FROM sp WHERE doc_id % 29 = 7),
         |ma AS (SELECT doc_id, j FROM sp
         |  WHERE doc_id % 29 <> 7 AND hv IN (SELECT hv FROM ev)),
         |runs AS (SELECT doc_id, MIN(j) AS j0, COUNT(*) AS m
         |  FROM (SELECT doc_id, j,
         |      j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j)
         |        AS isl FROM ma)
         |  GROUP BY doc_id, isl),
         |gr AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
         |    list_distinct(flatten(list(
         |      generate_series(j0, j0 + m + ${SpanW - 2})))) AS dp
         |  FROM runs WHERE m + ${SpanW - 1} >= $MinSubTokens
         |  GROUP BY doc_id),
         |fin AS (SELECT b.doc_id, b.n, gr.n_runs,
         |    list_transform(list_filter(generate_series(1, b.n),
         |        p -> NOT list_contains(
         |          coalesce(gr.dp, CAST([] AS BIGINT[])), p)),
         |      p -> b.t[p]) AS clean
         |  FROM base b LEFT JOIN gr ON b.doc_id = gr.doc_id
         |  WHERE b.doc_id % 29 <> 7)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  CAST(coalesce(n_runs, 0) AS BIGINT) AS n_runs_dropped,
         |  CAST(n - len(clean) AS BIGINT) AS n_dropped,
         |  CAST(len(clean) AS BIGINT) AS n_tokens_clean,
         |  md5(coalesce(array_to_string(clean, ' '), '')) AS clean_md5
         |FROM fin""".stripMargin) +
    // strip-policy matrix: each policy row aggregates that policy's
    // own oracle text embedded verbatim (p75 via oracleBase, p114/p131
    // via the shared vals) — the composite cannot drift from the
    // audits it summarizes
    ("p132_strip_policy_matrix" -> {
      // stripMargin runs BEFORE the policy SQL is spliced in: the
      // embedded texts carry `||` list-concats at line starts, and a
      // post-splice stripMargin would eat one pipe
      def blk(policy: String, sql: String, drop: String) =
        s"""(SELECT '$policy' AS policy,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(COALESCE(SUM(CASE WHEN n_dropped > 0 THEN 1 ELSE 0
           |    END), 0) AS BIGINT) AS n_docs_touched,
           |  CAST(COALESCE(SUM($drop), 0) AS BIGINT) AS n_tokens_dropped,
           |  CAST(COALESCE(SUM(n_tokens_clean + $drop), 0) AS BIGINT)
           |    AS n_tokens_total,
           |  CASE WHEN COALESCE(SUM(n_tokens_clean + $drop), 0) = 0
           |    THEN CAST(NULL AS DOUBLE)
           |    ELSE CAST((COALESCE(SUM($drop), 0) * 1000000)
           |      // SUM(n_tokens_clean + $drop) AS DOUBLE) / 1000000.0
           |    END AS drop_frac
           |FROM (""".stripMargin + sql + ") t)"
      Seq(
        blk("c4_span", oracleBase("p75_span_strip"),
          s"n_dropped * $SpanW"),
        blk("run_gated", sqlP114, s"n_dropped * $SpanW"),
        blk("substring", sqlP131, "n_dropped"),
        blk("substring_50", sqlP131Gate(ProdSubTokens), "n_dropped"))
        .mkString("\nUNION ALL\n")
    }) +
    ("p115_skew_audit" -> {
      // one block per key domain, generated from the SAME SkewDomains
      // list the Spark side iterates — the two sides cannot desync
      val blocks = SkewDomains.map { case (t, c) =>
        s"""(WITH cc AS (SELECT CAST($c AS VARCHAR) AS k, COUNT(*) AS c
           |    FROM $t GROUP BY 1),
           |tt AS (SELECT COALESCE(SUM(c), 0) AS n_rows,
           |    COUNT(*) AS n_keys, COALESCE(MAX(c), 0) AS mx FROM cc),
           |hh AS (SELECT MIN(k) AS hot_key FROM cc, tt WHERE cc.c = tt.mx)
           |SELECT '$t.$c' AS domain, CAST(tt.n_rows AS BIGINT) AS n_rows,
           |  CAST(tt.n_keys AS BIGINT) AS n_keys,
           |  CAST(tt.mx AS BIGINT) AS max_rows, hh.hot_key,
           |  CASE WHEN tt.n_rows = 0 THEN CAST(NULL AS DOUBLE)
           |    ELSE CAST((tt.mx * tt.n_keys * 1000000) // tt.n_rows
           |      AS DOUBLE) / 1000000.0 END AS skew
           |FROM tt, hh)""".stripMargin
      }
      blocks.mkString("\nUNION ALL\n")
    }) +
    ("p116_lsh_planner" -> {
      // one block per banding config, generated from the SAME
      // PlannerConfigs list; jt^r and c^b expanded as literal integer
      // products so no engine's pow() is in play
      val blocks = PlannerConfigs.map { case (b, r) =>
        val jr = Seq.fill(r)("jt").mkString(" * ")
        val cb = Seq.fill(b)("c").mkString(" * ")
        val cur = if (b == NumBands && r == BandRows) 1 else 0
        s"""(SELECT CAST($b AS INT) AS n_bands, CAST($r AS INT) AS n_rows,
           |  CAST(jt AS DOUBLE) / 10.0 AS j,
           |  CAST(1000000000000 - $cb AS DOUBLE) / 1000000000000.0
           |    AS p_detect,
           |  CAST($cur AS INT) AS is_current
           |FROM (SELECT jt, ${BigInt(10).pow(r)} - $jr AS c
           |  FROM (SELECT unnest(generate_series(1, 9)) AS jt)))"""
          .stripMargin
      }
      blocks.mkString("\nUNION ALL\n")
    }) +
    ("p117_dedup_agreement" -> {
      // each detector's pair set is its own oracle text embedded
      // verbatim as a scoped subquery (the p110 pattern), keyed by the
      // SAME AgreementMethods list the Spark side iterates
      val srcs = Map(
        "minhash" -> s"SELECT doc_a, doc_b FROM ($sqlP02) t",
        "simhash" -> ("SELECT doc_a, doc_b FROM (" +
          oracleBase("p12_simhash_pairs") + ") t"),
        "edit" -> ("SELECT doc_a, doc_b FROM (" +
          oracleBase("p29_edit_neardup") + ") t"),
        "semantic" -> ("SELECT doc_a, doc_b FROM (" +
          oracleBase("p49_semantic_neardup") +
          ") t WHERE text_confirmed = 1"))
      val ctes = AgreementMethods
        .map(m => s"m_$m AS (${srcs(m)})").mkString(",\n")
      val blocks = AgreementMethods.combinations(2).map {
        case Seq(ma, mb) =>
          s"""SELECT '$ma' AS method_a, '$mb' AS method_b,
             |  (SELECT COUNT(*) FROM m_$ma) AS n_a,
             |  (SELECT COUNT(*) FROM m_$mb) AS n_b,
             |  (SELECT COUNT(*) FROM m_$ma JOIN m_$mb
             |    USING (doc_a, doc_b)) AS n_both,
             |  (SELECT COUNT(*) FROM m_$ma)
             |    - (SELECT COUNT(*) FROM m_$ma JOIN m_$mb
             |      USING (doc_a, doc_b)) AS n_only_a,
             |  (SELECT COUNT(*) FROM m_$mb)
             |    - (SELECT COUNT(*) FROM m_$ma JOIN m_$mb
             |      USING (doc_a, doc_b)) AS n_only_b""".stripMargin
      }.toSeq
      s"WITH\n$ctes\n" + blocks.mkString("\nUNION ALL\n")
    }) +
    ("p118_source_scorecard" ->
      s"""WITH g AS (SELECT doc_id, keep
         |  FROM (${oracleBase("p76_gopher_rules")}) t),
         |b AS (SELECT doc_id, source,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tok,
         |    sha256(text) AS h FROM documents),
         |k AS (SELECT h, MIN(doc_id) AS keeper FROM b GROUP BY 1),
         |f AS (SELECT b.doc_id, b.source, b.n_tok,
         |    CASE WHEN b.doc_id <> k.keeper THEN 1 ELSE 0 END
         |      AS is_exact_dup
         |  FROM b JOIN k USING (h)),
         |pr AS (SELECT DISTINCT doc AS doc_id
         |  FROM (SELECT unnest([doc_a, doc_b]) AS doc
         |    FROM ($sqlP02) t)),
         |a AS (SELECT f.source, COUNT(*) AS n_docs,
         |    SUM(f.n_tok) AS n_tokens, SUM(g.keep) AS n_pass,
         |    SUM(f.is_exact_dup) AS n_exact,
         |    COUNT(pr.doc_id) AS n_near
         |  FROM f JOIN g USING (doc_id)
         |  LEFT JOIN pr USING (doc_id)
         |  GROUP BY 1)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST((n_pass * 1000000) // n_docs AS DOUBLE) / 1000000.0
         |    AS gopher_pass_frac,
         |  CAST((n_exact * 1000000) // n_docs AS DOUBLE) / 1000000.0
         |    AS exact_dup_frac,
         |  CAST((n_near * 1000000) // n_docs AS DOUBLE) / 1000000.0
         |    AS near_dup_frac
         |FROM a""".stripMargin) +
    ("p119_dedup_savings" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |tk AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |pc AS (SELECT l.cluster_id, COUNT(*) AS k,
         |    SUM(CASE WHEN l.doc_id <> l.cluster_id THEN t.n_tok
         |      ELSE 0 END) AS tok_dropped
         |  FROM lbl l JOIN tk t ON t.doc_id = l.doc_id GROUP BY 1),
         |cl AS (SELECT CAST(k AS BIGINT) AS cluster_size,
         |    CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |    CAST(SUM(k) AS BIGINT) AS n_docs,
         |    CAST(SUM(k - 1) AS BIGINT) AS n_docs_dropped,
         |    CAST(SUM(tok_dropped) AS BIGINT) AS n_tokens_dropped
         |  FROM pc GROUP BY k),
         |sg AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
         |    CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(0 AS BIGINT) AS n_docs_dropped,
         |    CAST(0 AS BIGINT) AS n_tokens_dropped
         |  FROM documents d
         |  WHERE NOT EXISTS (SELECT 1 FROM lbl WHERE lbl.doc_id = d.doc_id))
         |SELECT * FROM cl UNION ALL SELECT * FROM sg""".stripMargin) +
    ("p120_budget_allocation" ->
      s"""WITH g AS (SELECT doc_id, keep
         |  FROM (${oracleBase("p76_gopher_rules")}) t),
         |b AS (SELECT doc_id, source,
         |    CAST(len($sqlToks) AS BIGINT) AS n_tok FROM documents),
         |ps AS (SELECT b.source, COUNT(*) AS n_docs,
         |    SUM(g.keep) AS n_pass, SUM(b.n_tok) AS avail_tokens
         |  FROM b JOIN g USING (doc_id) GROUP BY 1),
         |pp AS (SELECT source, n_docs, avail_tokens,
         |    (n_pass * 1000000) // n_docs AS pass_ppm FROM ps),
         |tt AS (SELECT COALESCE(SUM(avail_tokens), 0) AS total FROM pp),
         |rk AS (SELECT pp.*, tt.total,
         |    (tt.total * $TrainBudgetPct) // 100 AS budget,
         |    CAST(ROW_NUMBER() OVER
         |      (ORDER BY pass_ppm DESC, source) AS INT) AS rnk,
         |    COALESCE(SUM(avail_tokens) OVER
         |      (ORDER BY pass_ppm DESC, source
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_before
         |  FROM pp, tt)
         |SELECT source, rnk,
         |  CAST(pass_ppm AS DOUBLE) / 1000000.0 AS gopher_pass_frac,
         |  CAST(avail_tokens AS BIGINT) AS avail_tokens,
         |  CAST(greatest(0, least(avail_tokens, budget - cum_before))
         |    AS BIGINT) AS alloc_tokens
         |FROM rk""".stripMargin) +
    ("p121_freq_spectrum" ->
      s"""WITH tc AS (SELECT tok, COUNT(*) AS c FROM (
         |    SELECT unnest($sqlToks) AS tok FROM documents)
         |  GROUP BY 1),
         |bk AS (SELECT CAST(len(bin(c)) - 1 AS INT) AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS n_terms,
         |    CAST(SUM(c) AS BIGINT) AS n_occurrences
         |  FROM tc GROUP BY 1),
         |tt AS (SELECT COALESCE(SUM(n_occurrences), 0) AS total FROM bk)
         |SELECT bucket,
         |  CAST(CAST(1 AS BIGINT) << bucket AS BIGINT) AS c_lo,
         |  n_terms, n_occurrences,
         |  CAST((n_occurrences * 1000000) // tt.total AS DOUBLE)
         |    / 1000000.0 AS mass_frac
         |FROM bk, tt""".stripMargin) +
    ("p122_cusum_drift" -> sqlP122) +
    ("p123_drift_changepoint" ->
      // the p122 oracle rides verbatim as a parenthesized scoped
      // subquery (DuckDB scopes its WITH RECURSIVE locally — the
      // p110/p112 embedding pattern)
      s"""WITH fin AS (SELECT * FROM ($sqlP122) t),
         |rnk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |    ORDER BY hour) AS rn FROM fin),
         |fa AS (SELECT event_type, MIN(rn) AS arn FROM rnk
         |  WHERE alarm = 1 GROUP BY 1),
         |lz AS (SELECT r.event_type, MAX(r.rn) AS zrn
         |  FROM rnk r JOIN fa ON fa.event_type = r.event_type
         |  WHERE r.cusum8nb = 0 AND r.rn < fa.arn GROUP BY 1),
         |cp AS (SELECT fa.event_type, fa.arn,
         |    COALESCE(lz.zrn + 1, 1) AS crn
         |  FROM fa LEFT JOIN lz ON lz.event_type = fa.event_type)
         |SELECT cp.event_type, a.hour AS first_alarm_hour,
         |  c.hour AS changepoint_hour,
         |  CAST(cp.arn - cp.crn + 1 AS BIGINT) AS hours_to_detect
         |FROM cp
         |JOIN rnk a ON a.event_type = cp.event_type AND a.rn = cp.arn
         |JOIN rnk c ON c.event_type = cp.event_type AND c.rn = cp.crn"""
        .stripMargin)


  /** The p122 oracle text, shared verbatim with p123's (which scopes
    * it as the first CTE of its changepoint chain). */

  private[queries] lazy val sqlP122: String =
      s"""WITH RECURSIVE h AS (
         |  SELECT event_type, STRFTIME(ts, '%Y-%m-%d %H') AS hour,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |nn AS (SELECT event_type, COUNT(*) AS n FROM h
         |  GROUP BY 1 HAVING COUNT(*) > $CusumBaselineHours),
         |rk AS (SELECT h.event_type, h.hour, h.c, nn.n,
         |    ROW_NUMBER() OVER (PARTITION BY h.event_type
         |      ORDER BY h.hour) AS rn
         |  FROM h JOIN nn ON nn.event_type = h.event_type),
         |bs AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nb,
         |    CAST(SUM(c) AS BIGINT) AS sb,
         |    CAST(SUM(c*c) AS BIGINT) AS ssb
         |  FROM rk WHERE rn <= $CusumBaselineHours GROUP BY 1),
         |cu AS (
         |  SELECT r.event_type, r.rn, r.hour, r.c,
         |    GREATEST(0, 8 * b.nb * r.c - 9 * b.sb) AS cusum
         |  FROM rk r JOIN bs b ON b.event_type = r.event_type
         |  WHERE r.rn = $CusumBaselineHours + 1
         |  UNION ALL
         |  SELECT r.event_type, r.rn, r.hour, r.c,
         |    GREATEST(0, cu.cusum + 8 * b.nb * r.c - 9 * b.sb)
         |  FROM cu
         |  JOIN rk r ON r.event_type = cu.event_type
         |    AND r.rn = cu.rn + 1
         |  JOIN bs b ON b.event_type = r.event_type)
         |SELECT cu.event_type, cu.hour, cu.c,
         |  CAST(cu.cusum AS BIGINT) AS cusum8nb,
         |  CAST(CASE WHEN cu.cusum * cu.cusum >
         |      4096 * (b.nb * b.ssb - b.sb * b.sb)
         |    THEN 1 ELSE 0 END AS INT) AS alarm
         |FROM cu JOIN bs b ON b.event_type = cu.event_type""".stripMargin

  private lazy val oracleBase: Map[String, String] = oracleFirst ++ Map(
    "p52_containment_dedup" ->
      s"""WITH shs AS (
         |  SELECT doc_id, ${sqlH60("shingle")} AS hv
         |  FROM (SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
         |        FROM (SELECT doc_id, $sqlToks AS t FROM documents))),
         |sets AS (SELECT doc_id, list(DISTINCT hv) AS st,
         |    CAST(len(st) AS BIGINT) AS n,
         |    list_sort(st)[1:$ContainProbeK] AS probes
         |  FROM shs GROUP BY doc_id),
         |rare AS (SELECT hv FROM shs GROUP BY hv
         |  HAVING COUNT(*) <= $ContainDfCap),
         |idx AS (SELECT s.hv, s.doc_id FROM shs s JOIN rare USING (hv)),
         |cand AS (
         |  SELECT DISTINCT p.doc_id AS doc_a, idx.doc_id AS doc_b
         |  FROM (SELECT doc_id, unnest(probes) AS hv FROM sets) p
         |  JOIN idx USING (hv)
         |  WHERE idx.doc_id != p.doc_id)
         |SELECT c.doc_a, c.doc_b, a.n AS na, b.n AS nb,
         |  round(CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) / a.n, 6)
         |    AS containment
         |FROM cand c
         |JOIN sets a ON a.doc_id = c.doc_a
         |JOIN sets b ON b.doc_id = c.doc_b
         |WHERE round(CAST(len(list_intersect(a.st, b.st)) AS DOUBLE) / a.n, 6)
         |  >= $ContainThreshold""".stripMargin,
    "p53_kmeans_cells" ->
      s"""WITH $sqlQuantCtes,
         |$sqlKmeansCtes
         |SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
         |  CAST(SUM(d2) AS BIGINT) AS sum_sqdist
         |FROM a2 GROUP BY 1""".stripMargin,
    "p94_semdedup_prune" ->
      s"""WITH $sqlQuantCtes,
         |$sqlKmeansCtes,
         |m AS (SELECT a2.vec_id, a2.cell, a2.d2, qq.qv,
         |    list_sum(list_transform(qq.qv, x -> x * x)) AS aa
         |  FROM a2 JOIN qq USING (vec_id)),
         |pr AS (SELECT a.vec_id, a.d2, a.aa,
         |    b.vec_id AS o_id, b.d2 AS o_d2, b.aa AS o_aa,
         |    list_sum(list_transform(generate_series(1, len(a.qv)),
         |      i -> a.qv[i] * b.qv[i])) AS dot
         |  FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
         |dropd AS (SELECT DISTINCT vec_id FROM pr
         |  WHERE dot > 0 AND 10000 * dot * dot >= $SemTau2E4 * aa * o_aa
         |    AND (o_d2 > d2 OR (o_d2 = d2 AND o_id < vec_id))),
         |kept AS (SELECT m.cell, COUNT(*) AS n_kept FROM m
         |  LEFT JOIN dropd ON m.vec_id = dropd.vec_id
         |  WHERE dropd.vec_id IS NULL GROUP BY 1),
         |mem AS (SELECT cell, COUNT(*) AS n_members FROM m GROUP BY 1)
         |SELECT mem.cell, CAST(mem.n_members AS BIGINT) AS n_members,
         |  CAST(COALESCE(kept.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(mem.n_members - COALESCE(kept.n_kept, 0) AS BIGINT)
         |    AS n_dropped
         |FROM mem LEFT JOIN kept USING (cell)""".stripMargin,
    "p95_tokenizer_fertility" -> {
      // global chain = sqlBpeChain (wf, sym0..symN keyed by w); per-lang
      // chain mirrors the p64 oracle with l-prefixed names and the
      // LEFT-join apply (winner-less languages keep their vocabulary)
      val lround = (r: Int) => s"""
         |lp$r AS (SELECT lang, l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt
         |  FROM lsym${r - 1}, UNNEST(generate_series(1, len(l)-1)) AS u(i)
         |  GROUP BY 1, 2, 3),
         |lw$r AS (SELECT lang, a, b FROM lp$r
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY cnt DESC, a, b) = 1),
         |lsym$r AS (SELECT lang, freq,
         |    list_reduce(list_transform(l, s -> [s]), (acc, x) ->
         |      CASE WHEN acc[len(acc)] = a AND x[1] = b
         |           THEN list_concat(acc[1:len(acc)-1], [a || b])
         |           ELSE list_concat(acc, x) END) AS l
         |  FROM lsym${r - 1} LEFT JOIN lw$r USING (lang))"""
      sqlBpeChain(BpeRounds) + s""",
         |lwf AS (
         |  SELECT lang, term AS w, COUNT(*) AS freq FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS term
         |    FROM documents)
         |  WHERE regexp_full_match(term, '[a-z]+') AND length(term) >= 2
         |  GROUP BY 1, 2),
         |lsym0 AS (SELECT lang, freq, string_split(w, '') AS l FROM lwf)"""
        .stripMargin +
        (1 to BpeRounds).map(r => "," + lround(r).stripMargin).mkString +
        s"""
         |,
         |gj AS (SELECT lwf.lang, lwf.freq, length(lwf.w) AS wlen,
         |    len(s.l) AS gs
         |  FROM lwf JOIN sym$BpeRounds s ON lwf.w = s.w),
         |gagg AS (SELECT lang, CAST(SUM(freq) AS BIGINT) AS n_occurrences,
         |    CAST(SUM(freq * wlen) AS BIGINT) AS syms_char,
         |    CAST(SUM(freq * gs) AS BIGINT) AS syms_global
         |  FROM gj GROUP BY 1),
         |own AS (SELECT lang, CAST(SUM(freq * len(l)) AS BIGINT) AS syms_own
         |  FROM lsym$BpeRounds GROUP BY 1)
         |SELECT g.lang, g.n_occurrences, g.syms_char, g.syms_global,
         |  o.syms_own,
         |  ROUND(CAST(g.syms_global AS DOUBLE) / g.n_occurrences, 6)
         |    AS fertility_global,
         |  ROUND(CAST(o.syms_own AS DOUBLE) / g.n_occurrences, 6)
         |    AS fertility_own
         |FROM gagg g JOIN own o ON g.lang = o.lang""".stripMargin
    },
    "p97_weighted_sample" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    CAST(greatest(1, len(string_split(text, ' '))) AS BIGINT) AS w,
         |    ${sqlH60("'wsample:' || CAST(doc_id AS VARCHAR)")}
         |      % 4294967296 AS h32
         |  FROM documents),
         |sc AS (SELECT doc_id, lang, w,
         |    CAST(2097152 - ${sqlQlog2("h32 + 1")} AS DOUBLE) / w AS priority
         |  FROM t),
         |r AS (SELECT doc_id, lang, w, priority,
         |  CAST(ROW_NUMBER() OVER (ORDER BY priority, doc_id) AS INT) AS rnk
         |  FROM sc)
         |SELECT rnk, doc_id, lang, w, ROUND(priority, 6) AS priority
         |FROM r WHERE rnk <= $SampleK""".stripMargin,
    "p98_leakage_free_split" -> {
      def sqlSplit(k: String) =
        s"""CASE WHEN ${sqlH60(s"'split:' || CAST($k AS VARCHAR)")} % 10 < 8
           |    THEN 'train'
           |  WHEN ${sqlH60(s"'split:' || CAST($k AS VARCHAR)")} % 10 = 8
           |    THEN 'val' ELSE 'test' END""".stripMargin
      s"""WITH RECURSIVE $sqlClusterLabels,
         |d AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_toks
         |  FROM documents),
         |a AS (SELECT d.doc_id, d.n_toks,
         |    COALESCE(lbl.cluster_id, d.doc_id) AS cluster_id
         |  FROM d LEFT JOIN lbl ON d.doc_id = lbl.doc_id),
         |s AS (SELECT doc_id, n_toks,
         |    ${sqlSplit("doc_id")} AS split_doc,
         |    ${sqlSplit("cluster_id")} AS split_cluster
         |  FROM a),
         |lkd AS (SELECT CAST(COUNT(*) AS BIGINT) AS leak_pairs FROM p
         |  JOIN s sa ON p.doc_a = sa.doc_id
         |  JOIN s sb ON p.doc_b = sb.doc_id
         |  WHERE sa.split_doc <> sb.split_doc),
         |lkc AS (SELECT CAST(COUNT(*) AS BIGINT) AS leak_pairs FROM p
         |  JOIN s sa ON p.doc_a = sa.doc_id
         |  JOIN s sb ON p.doc_b = sb.doc_id
         |  WHERE sa.split_cluster <> sb.split_cluster)
         |SELECT 'doc_hash' AS method, split_doc AS split,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  lkd.leak_pairs
         |FROM s, lkd GROUP BY 2, 5
         |UNION ALL
         |SELECT 'cluster_hash' AS method, split_cluster AS split,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |  lkc.leak_pairs
         |FROM s, lkc GROUP BY 2, 5""".stripMargin
    },
    "p99_provenance_reps" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |m AS (SELECT l.cluster_id, l.doc_id, d.n_chars,
         |    ${sqlTier("d.source")} AS tier
         |  FROM lbl l JOIN documents d ON l.doc_id = d.doc_id),
         |rp AS (SELECT cluster_id, doc_id, tier,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY tier ASC, n_chars DESC, doc_id ASC) AS rnk
         |  FROM m),
         |rl AS (SELECT cluster_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY n_chars DESC, doc_id ASC) AS rnk
         |  FROM m),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members
         |  FROM m GROUP BY 1)
         |SELECT sz.cluster_id, sz.n_members,
         |  p.doc_id AS rep_prov, p.tier AS rep_tier,
         |  g.doc_id AS rep_longest,
         |  p.doc_id <> g.doc_id AS overridden
         |FROM sz
         |JOIN (SELECT * FROM rp WHERE rnk = 1) p USING (cluster_id)
         |JOIN (SELECT * FROM rl WHERE rnk = 1) g USING (cluster_id)""".stripMargin,
    "p100_embedding_drift" ->
      s"""WITH $sqlQuantCtes,
         |$sqlKmeansCtes,
         |cc AS (SELECT cell,
         |    CAST(SUM(CASE WHEN vec_id % 7 <> 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_prev,
         |    CAST(SUM(CASE WHEN vec_id % 5 <> 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_next
         |  FROM a2 GROUP BY 1),
         |grid AS (SELECT unnest(generate_series(0,
         |    (SELECT k FROM kk) - 1)) AS cell),
         |f AS (SELECT g.cell,
         |    coalesce(cc.n_prev, 0) AS n_prev,
         |    coalesce(cc.n_next, 0) AS n_next
         |  FROM grid g LEFT JOIN cc USING (cell)),
         |tot AS (SELECT SUM(n_prev) AS tp, SUM(n_next) AS tn FROM f),
         |r AS (SELECT cell, n_prev, n_next,
         |    2 * n_next + 1 AS pn, 2 * tn + (SELECT k FROM kk) AS pd,
         |    2 * n_prev + 1 AS qn, 2 * tp + (SELECT k FROM kk) AS qd
         |  FROM f CROSS JOIN tot),
         |tm AS (SELECT cell, n_prev, n_next,
         |    (CAST(pn AS DOUBLE) / pd - CAST(qn AS DOUBLE) / qd)
         |      * (${sqlQlog2("pn * qd")} - ${sqlQlog2("qn * pd")})
         |      / 65536.0 AS term
         |  FROM r),
         |ps AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(term ORDER BY cell)), (a, x) -> a + x) AS psi FROM tm)
         |SELECT CAST(cell AS BIGINT) AS cell, n_prev, n_next,
         |  round(term, 6) AS term, round(psi, 6) AS psi
         |FROM tm CROSS JOIN ps""".stripMargin,
    "p101_source_mirror" ->
      s"""WITH p AS ($sqlP02),
         |s AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_a,
         |  greatest(a.source, b.source) AS source_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  least(a.source, b.source) <> greatest(a.source, b.source)
         |    AS cross_source
         |FROM p
         |JOIN s a ON p.doc_a = a.doc_id
         |JOIN s b ON p.doc_b = b.doc_id
         |GROUP BY 1, 2, 4""".stripMargin,
    "p102_dataset_card" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |base AS (SELECT doc_id, lang, source, n_chars,
         |    CAST(len(t) AS BIGINT) AS n_toks, sha256(text) AS h,
         |    (len(list_filter(t, x -> list_contains($sqlStops, x))) / len(t)
         |       >= $QualityMinStopRatio
         |      AND len(t) >= $QualityMinTokens) AS qpass
         |  FROM (SELECT doc_id, text, lang, source, n_chars, $sqlToks AS t
         |    FROM documents)),
         |census AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
         |    CAST(SUM(n_chars) AS BIGINT) AS n_chars,
         |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(SUM(CASE WHEN qpass THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_quality,
         |    CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_exact_dup
         |  FROM base),
         |sh AS (SELECT doc_id, unnest(${sqlShingles("t", ContamW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |gg AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g FROM sh),
         |ev AS (SELECT DISTINCT g FROM gg WHERE doc_id % 29 = 7),
         |tr AS (SELECT doc_id, g FROM gg WHERE doc_id % 29 <> 7),
         |ct AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_contam
         |  FROM tr WHERE g IN (SELECT g FROM ev)),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_near,
         |    CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters
         |  FROM lbl)
         |SELECT 'corpus' AS section, 'n_docs' AS metric, n_docs AS n,
         |  CAST(NULL AS DOUBLE) AS frac FROM census
         |UNION ALL SELECT 'corpus', 'n_tokens', n_tokens, NULL FROM census
         |UNION ALL SELECT 'corpus', 'n_chars', n_chars, NULL FROM census
         |UNION ALL SELECT 'corpus', 'n_sources', n_sources, NULL FROM census
         |UNION ALL SELECT 'corpus', 'n_langs', n_langs, NULL FROM census
         |UNION ALL SELECT 'lang', lang, CAST(COUNT(*) AS BIGINT),
         |  round(CAST(COUNT(*) AS DOUBLE) / (SELECT n_docs FROM census), 6)
         |  FROM base GROUP BY lang
         |UNION ALL SELECT 'source', source, CAST(COUNT(*) AS BIGINT),
         |  round(CAST(COUNT(*) AS DOUBLE) / (SELECT n_docs FROM census), 6)
         |  FROM base GROUP BY source
         |UNION ALL SELECT 'quality', 'gate_pass', n_quality,
         |  round(CAST(n_quality AS DOUBLE) / n_docs, 6) FROM census
         |UNION ALL SELECT 'dedup', 'exact_dup_docs', n_exact_dup,
         |  round(CAST(n_exact_dup AS DOUBLE) / n_docs, 6) FROM census
         |UNION ALL SELECT 'dedup', 'near_dup_docs', n_near,
         |  round(CAST(n_near AS DOUBLE) / n_docs, 6) FROM nd, census
         |UNION ALL SELECT 'dedup', 'near_dup_clusters', n_clusters, NULL
         |  FROM nd
         |UNION ALL SELECT 'contamination', 'contaminated_docs', n_contam,
         |  round(CAST(n_contam AS DOUBLE) / n_docs, 6) FROM ct, census""".stripMargin,
    "p55_dup_graph_hops" ->
      s"""WITH p AS ($sqlP02),
         |e AS (SELECT doc_a, doc_b FROM p
         |  UNION SELECT doc_b, doc_a FROM p),
         |th AS (
         |  SELECT a.doc_a AS src, b.doc_b AS dst
         |  FROM e a JOIN e b ON a.doc_b = b.doc_a
         |  WHERE a.doc_a != b.doc_b
         |  UNION
         |  SELECT doc_a, doc_b FROM e),
         |deg AS (SELECT doc_a AS src, COUNT(*) AS degree FROM e GROUP BY 1)
         |SELECT th.src AS doc_id, deg.degree, COUNT(*) AS n_within2
         |FROM th JOIN deg ON th.src = deg.src
         |GROUP BY 1, 2""".stripMargin,
    "p56_pii_redact" ->
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(text,
         |    '$EmailRe', '<EMAIL>', 'g'), '$PhoneRe', '<PHONE>', 'g')
         |    AS clean_text,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT)
         |    AS n_emails,
         |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT)
         |    AS n_phones
         |FROM documents""".stripMargin,
    "p54_sliding_window" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  COUNT(*) OVER w AS n_trailing,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
        |    AS sum_trailing
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "p15_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS p_ts_us, value AS p_value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts_us, p.p_ts_us, p.p_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts_us >= p.p_ts_us""".stripMargin,
    "p17_tfidf_topterms" ->
      s"""WITH terms AS (
         |  SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
         |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.term,
         |    round(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 4) AS score
         |  FROM tf JOIN dfreq USING (term), n),
         |ranked AS (
         |  SELECT doc_id, term, score,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, term ASC) AS INT) AS rnk
         |  FROM scored)
         |SELECT doc_id, rnk, term, score FROM ranked WHERE rnk <= 3""".stripMargin,
    "p18_bigram_top" ->
      s"""WITH bi AS (
         |  SELECT unnest(${sqlShingles("t", 2)}) AS bigram
         |  FROM (SELECT $sqlToks AS t FROM documents)),
         |counted AS (SELECT bigram, COUNT(*) AS n FROM bi GROUP BY bigram),
         |ranked AS (SELECT bigram, n,
         |  CAST(ROW_NUMBER() OVER (ORDER BY n DESC, bigram ASC) AS INT) AS rnk
         |  FROM counted)
         |SELECT rnk, bigram, n FROM ranked WHERE rnk <= 25""".stripMargin,
    "p19_train_val_split" ->
      s"""SELECT CASE WHEN ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 < 8
         |    THEN 'train'
         |  WHEN ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 8 THEN 'val'
         |  ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY 1, 2""".stripMargin,
    "p125_ann_ivf2" ->
      // The two-level hierarchy twin: same e/n/ik/c/a0/a chain as p20
      // (flat assignment), plus coarse anchors (first ceil(sqrt(K)) —
      // IEEE sqrt is correctly rounded, so both engines derive the
      // same C), centroid→anchor and vector→anchor argmins, the
      // member-keyed fine argmin, and the K-grid agreement census.
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |ik AS (SELECT greatest($IvfKFloor, (count(*) + ${IvfCellTarget - 1})
        |    // $IvfCellTarget) AS k FROM n),
        |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id < (SELECT k FROM ik)),
        |a0 AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
        |    round(list_sum(list_transform(generate_series(1, len(n.v)),
        |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS csim
        |  FROM n, c),
        |a AS (
        |  SELECT vec_id, cent_id AS cell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY csim DESC, cent_id) AS arnk FROM a0) t
        |  WHERE arnk = 1),
        |cg AS (SELECT CAST(ceil(sqrt(CAST((SELECT k FROM ik) AS DOUBLE)))
        |    AS BIGINT) AS cn),
        |co AS (SELECT cent_id AS co_id, cv AS gv, cnrm AS gnrm FROM c
        |  WHERE cent_id < (SELECT cn FROM cg)),
        |cc0 AS (SELECT c.cent_id, co.co_id,
        |    round(list_sum(list_transform(generate_series(1, len(c.cv)),
        |      i -> c.cv[i] * co.gv[i])) / (c.cnrm * co.gnrm), 6) AS csim
        |  FROM c, co),
        |cca AS (SELECT cent_id, co_id AS coarse FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY cent_id
        |      ORDER BY csim DESC, co_id) AS arnk FROM cc0) t
        |  WHERE arnk = 1),
        |vc0 AS (SELECT n.vec_id, co.co_id,
        |    round(list_sum(list_transform(generate_series(1, len(n.v)),
        |      i -> n.v[i] * co.gv[i])) / (n.nrm * co.gnrm), 6) AS csim
        |  FROM n, co),
        |vca AS (SELECT vec_id, co_id AS coarse FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY csim DESC, co_id) AS arnk FROM vc0) t
        |  WHERE arnk = 1),
        |m AS (SELECT c.cent_id, c.cv, c.cnrm, cca.coarse
        |  FROM c JOIN cca USING (cent_id)),
        |vf0 AS (SELECT n.vec_id, m.cent_id,
        |    round(list_sum(list_transform(generate_series(1, len(n.v)),
        |      i -> n.v[i] * m.cv[i])) / (n.nrm * m.cnrm), 6) AS fsim
        |  FROM n JOIN vca USING (vec_id) JOIN m ON vca.coarse = m.coarse),
        |two AS (SELECT vec_id, cent_id AS cell2 FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY fsim DESC, cent_id) AS rnk FROM vf0) t
        |  WHERE rnk = 1),
        |grid AS (SELECT unnest(generate_series(0,
        |    (SELECT k FROM ik) - 1)) AS cell),
        |nf AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_flat
        |  FROM a GROUP BY 1),
        |nt AS (SELECT cell2 AS cell, CAST(COUNT(*) AS BIGINT) AS n_twolevel
        |  FROM two GROUP BY 1),
        |na AS (SELECT a.cell, CAST(COUNT(*) AS BIGINT) AS n_agree
        |  FROM a JOIN two USING (vec_id) WHERE a.cell = two.cell2
        |  GROUP BY 1)
        |SELECT CAST(g.cell AS BIGINT) AS cell,
        |  coalesce(nf.n_flat, CAST(0 AS BIGINT)) AS n_flat,
        |  coalesce(nt.n_twolevel, CAST(0 AS BIGINT)) AS n_twolevel,
        |  coalesce(na.n_agree, CAST(0 AS BIGINT)) AS n_agree
        |FROM grid g LEFT JOIN nf USING (cell) LEFT JOIN nt USING (cell)
        |LEFT JOIN na USING (cell)""".stripMargin,
    "p126_semantic_decontam" ->
      // exact train×eval cosine (the eval slice is benchmark-sized, so
      // the cross product is N·|eval|, linear in the corpus), τ and the
      // eval slice rule identical to the Spark side's declared constants
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |ev AS (SELECT vec_id AS eval_id, v AS evv, nrm AS enrm FROM n
        |  WHERE vec_id % 29 = 7),
        |fl AS (
        |  SELECT t.vec_id AS doc_id, ev.eval_id,
        |    round(list_sum(list_transform(generate_series(1, len(t.v)),
        |      i -> t.v[i] * ev.evv[i])) / (t.nrm * ev.enrm), 6) AS sim
        |  FROM n t, ev WHERE t.vec_id % 29 <> 7),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY sim DESC, eval_id ASC) AS rnk
        |  FROM fl WHERE sim >= 0.40)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_eval_hits,
        |  MAX(CASE WHEN rnk = 1 THEN eval_id END) AS best_eval_id,
        |  MAX(CASE WHEN rnk = 1 THEN sim END) AS best_sim
        |FROM rk GROUP BY doc_id""".stripMargin,
    "p136_semantic_decontam_ivf" ->
      // the served screen: p126's flag logic restricted to SAME-CELL
      // pairs under the p20 IVF assignment chain (identical K rule,
      // 6dp-rounded cosine argmax, cent_id ASC ties)
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |ik AS (SELECT greatest($IvfKFloor, (count(*) + ${IvfCellTarget - 1})
        |    // $IvfCellTarget) AS k FROM n),
        |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id < (SELECT k FROM ik)),
        |a0 AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
        |    round(list_sum(list_transform(generate_series(1, len(n.v)),
        |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS csim
        |  FROM n, c),
        |a AS (
        |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY csim DESC, cent_id) AS arnk FROM a0) t
        |  WHERE arnk = 1),
        |ev AS (SELECT cell, vec_id AS eval_id, v AS evv, nrm AS enrm
        |  FROM a WHERE vec_id % 29 = 7),
        |fl AS (
        |  SELECT t.vec_id AS doc_id, ev.eval_id,
        |    round(list_sum(list_transform(generate_series(1, len(t.v)),
        |      i -> t.v[i] * ev.evv[i])) / (t.nrm * ev.enrm), 6) AS sim
        |  FROM a t JOIN ev USING (cell) WHERE t.vec_id % 29 <> 7),
        |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY sim DESC, eval_id ASC) AS rnk
        |  FROM fl WHERE sim >= 0.40)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_eval_hits,
        |  MAX(CASE WHEN rnk = 1 THEN eval_id END) AS best_eval_id,
        |  MAX(CASE WHEN rnk = 1 THEN sim END) AS best_sim
        |FROM rk GROUP BY doc_id""".stripMargin,
    "p20_ann_ivf" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |ik AS (SELECT greatest($IvfKFloor, (count(*) + ${IvfCellTarget - 1})
        |    // $IvfCellTarget) AS k FROM n),
        |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id < (SELECT k FROM ik)),
        |a0 AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
        |    round(list_sum(list_transform(generate_series(1, len(n.v)),
        |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS csim
        |  FROM n, c),
        |a AS (
        |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY csim DESC, cent_id) AS arnk FROM a0) t
        |  WHERE arnk = 1),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, cell
        |  FROM a WHERE vec_id < 20),
        |s AS (
        |  SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM a JOIN p USING (cell) WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rnk FROM s)
        |SELECT probe_id, vec_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "p33_knn_graph" ->
      s"""WITH $sqlP33Chain
         |SELECT vec_id, nbr_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "p96_knn_label_eval" ->
      s"""WITH $sqlP33Chain,
         |knn AS (SELECT vec_id, nbr_id FROM r WHERE rnk <= 3),
         |lb AS (SELECT vec_id, label FROM embeddings),
         |v AS (SELECT k.vec_id, l.label AS nbr_label, COUNT(*) AS cnt
         |  FROM knn k JOIN lb l ON k.nbr_id = l.vec_id GROUP BY 1, 2),
         |pred AS (SELECT vec_id, nbr_label AS pred_label FROM v
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
         |    ORDER BY cnt DESC, nbr_label) = 1),
         |j AS (SELECT lb.label, pred.pred_label
         |  FROM lb LEFT JOIN pred ON lb.vec_id = pred.vec_id)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |  CAST(COUNT(pred_label) AS BIGINT) AS n_voted,
         |  CAST(SUM(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  CASE WHEN COUNT(pred_label) > 0 THEN
         |    ROUND(CAST(SUM(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
         |      AS DOUBLE) / COUNT(pred_label), 6) END AS accuracy
         |FROM j GROUP BY 1""".stripMargin,
    "p21_winnow_fingerprint" ->
      s"""WITH wins AS (
         |  SELECT DISTINCT doc_id, ${sqlH60("substr(text, u.i, 8)")} AS whash
         |  FROM documents,
         |    UNNEST(generate_series(1, length(text) - 7)) AS u(i)
         |  WHERE length(text) >= 8),
         |r AS (SELECT doc_id, whash,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY whash)
         |    AS INT) AS rnk
         |  FROM wins)
         |SELECT doc_id, rnk, whash FROM r WHERE rnk <= 4""".stripMargin,
    "p22_langid_ngram" ->
      s"""WITH g AS (
         |  SELECT doc_id, lang, list_distinct(list_transform(
         |    generate_series(1, greatest(length(text) - 1, 1)),
         |    i -> substr(text, i, 2))) AS grams
         |  FROM documents),
         |h AS (SELECT doc_id, lang,
         |  CAST(len(list_intersect(grams,
         |    ${EnBigrams.map(b => s"'$b'").mkString("[", ", ", "]")}))
         |    AS BIGINT) AS en_hits,
         |  CAST(len(list_intersect(grams,
         |    ${FrBigrams.map(b => s"'$b'").mkString("[", ", ", "]")}))
         |    AS BIGINT) AS fr_hits
         |  FROM g)
         |SELECT doc_id, lang, en_hits, fr_hits,
         |  CASE WHEN en_hits >= fr_hits THEN 'en' ELSE 'fr' END AS pred
         |FROM h""".stripMargin,
    "p23_curation" ->
      s"""WITH sc AS (
         |  SELECT doc_id, text, CAST(len(t) AS BIGINT) AS n_tokens,
         |    len(list_filter(t, x -> list_contains($sqlStops, x))) / len(t)
         |      AS stop_ratio,
         |    len(list_distinct(t)) / len(t) AS uniq_ratio
         |  FROM (SELECT doc_id, text, $sqlToks AS t FROM documents)),
         |q AS (SELECT doc_id, n_tokens, stop_ratio,
         |    round((stop_ratio + uniq_ratio) / 2, 6) AS quality,
         |    MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
         |  FROM sc)
         |SELECT doc_id, n_tokens, quality FROM q
         |WHERE doc_id = keep_id AND stop_ratio >= 0.05
         |  AND n_tokens >= 5 AND quality >= 0.3""".stripMargin,
    "p26_funnel" ->
      """WITH fc AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS c_ts FROM events
        |  WHERE event_type = 'click' GROUP BY user_id),
        |hits AS (
        |  SELECT fc.user_id, MAX(CASE WHEN p.p_ts >= fc.c_ts
        |      AND p.p_ts <= fc.c_ts + 1800000000 THEN 1 ELSE 0 END)
        |    AS converted
        |  FROM fc LEFT JOIN
        |    (SELECT user_id, epoch_us(ts) AS p_ts FROM events
        |     WHERE event_type = 'purchase') p
        |    ON fc.user_id = p.user_id
        |  GROUP BY fc.user_id)
        |SELECT COUNT(*) AS n_clickers,
        |  CAST(SUM(converted) AS BIGINT) AS n_converted,
        |  round(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 4) AS conv_rate
        |FROM hits""".stripMargin,
    "p25_pmi_collocations" ->
      s"""WITH toks AS (SELECT unnest($sqlToks) AS w FROM documents),
         |uni AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
         |tt AS (SELECT COUNT(*) AS t_total FROM toks),
         |bi0 AS (
         |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
         |    i -> array_to_string(t[i:i+1], ' '))) AS bigram
         |  FROM (SELECT $sqlToks AS t FROM documents)),
         |bi AS (SELECT bigram, COUNT(*) AS c12,
         |    split_part(bigram, ' ', 1) AS w1,
         |    split_part(bigram, ' ', 2) AS w2
         |  FROM bi0 GROUP BY bigram),
         |bt AS (SELECT CAST(SUM(c12) AS BIGINT) AS b_total FROM bi),
         |sc AS (SELECT bigram, c12,
         |    round(ln((CAST(c12 AS DOUBLE) * t_total * t_total) /
         |      (CAST(b_total AS DOUBLE) * u1.c * u2.c)), 4) AS pmi
         |  FROM bi
         |  JOIN uni u1 ON u1.w = bi.w1
         |  JOIN uni u2 ON u2.w = bi.w2, tt, bt
         |  WHERE c12 >= 5),
         |r AS (SELECT bigram, c12, pmi,
         |  CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) AS INT) AS rnk
         |  FROM sc)
         |SELECT rnk, bigram, c12, pmi FROM r WHERE rnk <= 15""".stripMargin,
    "p24_cms_counts" -> {
      def b(j: String, t: String) = s"${sqlH60Seeded(j, t)} % $CmsWidth"
      val probeList = CmsProbes.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH terms AS (
         |  SELECT unnest($sqlToks) AS term FROM documents),
         |js AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS j),
         |cms AS (
         |  SELECT j, ${b("j", "term")} AS bucket, COUNT(*) AS n
         |  FROM terms, js GROUP BY 1, 2),
         |pb AS (
         |  SELECT p.term, js.j, ${b("js.j", "p.term")} AS bucket
         |  FROM (SELECT unnest($probeList) AS term) p, js),
         |est AS (
         |  SELECT term, MIN(coalesce(n, 0)) AS est_count
         |  FROM pb LEFT JOIN cms USING (j, bucket) GROUP BY term),
         |ex AS (
         |  SELECT term, COUNT(*) AS exact_count FROM terms
         |  WHERE list_contains($probeList, term) GROUP BY term)
         |SELECT term, CAST(est_count AS BIGINT) AS est_count,
         |  CAST(coalesce(exact_count, 0) AS BIGINT) AS exact_count
         |FROM est LEFT JOIN ex USING (term)""".stripMargin
    },
    "p16_range_join" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |p AS (SELECT event_id AS p_event_id, user_id, epoch_us(ts) AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.p_event_id, COUNT(*) AS n_follow
        |FROM p JOIN ev ON p.user_id = ev.user_id
        |  AND ev.ts_us >= p.p_ts AND ev.ts_us <= p.p_ts + 600000000
        |GROUP BY 1""".stripMargin,
    "p27_doc_chunking" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |c AS (SELECT doc_id, unnest(generate_series(1, len(t), $ChunkStride)) AS i, t
         |  FROM t)
         |SELECT doc_id, CAST((i-1)//$ChunkStride AS BIGINT) AS chunk_id,
         |  array_to_string(t[i:i+${ChunkTokens - 1}], ' ') AS chunk_text,
         |  CAST(len(t[i:i+${ChunkTokens - 1}]) AS BIGINT) AS n_tok
         |FROM c WHERE i = 1 OR i + ${ChunkTokens - ChunkStride} <= len(t)""".stripMargin,
    "p28_token_shards" ->
      s"""WITH n AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n
         |  FROM documents),
         |c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM n)
         |SELECT CAST((cum-1)//$ShardTokens AS BIGINT) AS shard,
         |  COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM c GROUP BY 1""".stripMargin,
    "p29_edit_neardup" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |sig AS (SELECT doc_id, MIN(${sqlHashFam(0, "shingle")}) AS b0,
         |    MIN(${sqlHashFam(1, "shingle")}) AS b1
         |  FROM sh GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, 0 AS band, b0 AS bkey FROM sig
         |  UNION ALL SELECT doc_id, 1, b1 FROM sig),
         |$sqlCappedCand,
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b, ta.text AS xa, tb.text AS xb,
         |    greatest(ta.n_chars, tb.n_chars) AS mx
         |  FROM cand c
         |  JOIN documents ta ON ta.doc_id = c.doc_a
         |  JOIN documents tb ON tb.doc_id = c.doc_b
         |  WHERE abs(ta.n_chars - tb.n_chars)
         |    <= $EditRelThreshold * greatest(ta.n_chars, tb.n_chars))
         |SELECT doc_a, doc_b, CAST(levenshtein(xa, xb) AS BIGINT) AS dist,
         |  round(levenshtein(xa, xb) * 1.0 / mx, 6) AS rel_dist
         |FROM pairs
         |WHERE levenshtein(xa, xb) <= $EditRelThreshold * mx""".stripMargin,
    "p30_stratified_sample" ->
      s"""SELECT doc_id, lang, source, rk FROM (
         |  SELECT doc_id, lang, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
         |      ORDER BY ${sqlH60("text")}, doc_id) AS INT) AS rk
         |  FROM documents) t
         |WHERE rk <= $StratumSampleK""".stripMargin,
    "p31_repetition_score" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
         |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2),
         |uni AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
         |    COUNT(*) AS n_distinct, CAST(MAX(c) AS BIGINT) AS top_cnt
         |  FROM tc GROUP BY 1),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-1),
         |    i -> array_to_string(t[i:i+1], ' '))) AS bigram
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |bi AS (SELECT doc_id, COUNT(*) AS n_bi,
         |    COUNT(DISTINCT bigram) AS n_bi_d
         |  FROM bg GROUP BY 1)
         |SELECT uni.doc_id, n AS n_tokens,
         |  round(n_distinct * 1.0 / n, 6) AS distinct_ratio,
         |  round(top_cnt * 1.0 / n, 6) AS top_token_frac,
         |  CASE WHEN coalesce(n_bi, 0) > 0
         |    THEN round(1.0 - n_bi_d * 1.0 / n_bi, 6)
         |    ELSE 0.0 END AS dup_bigram_frac
         |FROM uni LEFT JOIN bi USING (doc_id)""".stripMargin,
    "p36_incremental_dedup" ->
      s"""WITH d AS (SELECT doc_id, sha256(text) AS content_hash,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_new
         |  FROM documents),
         |existing AS (SELECT DISTINCT content_hash FROM d WHERE NOT is_new)
         |SELECT content_hash, MIN(doc_id) AS keep_id,
         |  COUNT(*) AS batch_dups
         |FROM d WHERE is_new
         |  AND content_hash NOT IN (SELECT content_hash FROM existing)
         |GROUP BY 1""".stripMargin,
    "p35_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(len($sqlToks) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text,
         |    '${BpeTokenRe.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
         |FROM documents""".stripMargin,
    "p34_retention_cohorts" ->
      """WITH d AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events GROUP BY 1, 2),
        |c AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY 1)
        |SELECT STRFTIME(c.cohort, '%Y-%m-%d') AS cohort_day,
        |  date_diff('day', c.cohort, d.day) AS offset_days,
        |  COUNT(DISTINCT d.user_id) AS n_users
        |FROM c JOIN d ON c.user_id = d.user_id
        |GROUP BY 1, 2""".stripMargin,
    "p37_span_dedup" ->
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |sp AS (SELECT doc_id, ${sqlH60("span")} AS hv FROM (
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(t) // $SpanW),
         |    j -> array_to_string(t[(j-1)*$SpanW+1:j*$SpanW], ' '))) AS span
         |  FROM tk)),
         |c AS (SELECT hv, COUNT(*) AS cnt FROM sp GROUP BY 1),
         |agg AS (SELECT doc_id, COUNT(*) AS n_spans,
         |    CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM sp JOIN c USING (hv) GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_spans, 0) AS n_spans,
         |  coalesce(n_dup, 0) AS n_dup_spans,
         |  CASE WHEN coalesce(n_spans, 0) > 0
         |    THEN round(n_dup * 1.0 / n_spans, 6)
         |    ELSE 0.0 END AS dup_span_frac
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    "p38_decontamination" ->
      s"""WITH g0 AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", DecontamW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |g AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS hv,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % $EvalSliceMod
         |      = $EvalSliceRem AS is_eval
         |  FROM g0),
         |ev AS (SELECT DISTINCT hv FROM g WHERE is_eval),
         |agg AS (SELECT g.doc_id, COUNT(*) AS n_grams,
         |    CAST(SUM(CASE WHEN ev.hv IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_hits
         |  FROM g LEFT JOIN ev ON g.hv = ev.hv
         |  WHERE NOT g.is_eval GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
         |  coalesce(n_hits, 0) AS n_hits,
         |  CASE WHEN coalesce(n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated,
         |  CASE WHEN coalesce(n_grams, 0) > 0
         |    THEN round(n_hits * 1.0 / n_grams, 6)
         |    ELSE 0.0 END AS contam_frac
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
         |WHERE ${sqlH60("CAST(d.doc_id AS VARCHAR)")} % $EvalSliceMod
         |  <> $EvalSliceRem""".stripMargin,
    "p39_inverted_index" ->
      s"""WITH tok AS (SELECT doc_id, unnest($sqlToks) AS term FROM documents),
         |tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |r AS (SELECT term, doc_id, tf,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY term
         |      ORDER BY tf DESC, doc_id) AS INT) AS rk
         |  FROM tf)
         |SELECT r.term, df.df AS df, r.rk, r.doc_id, r.tf
         |FROM r JOIN df ON r.term = df.term
         |WHERE r.rk <= $PostingsK""".stripMargin,
    "p57_hll_groups" ->
      s"""WITH h AS (
         |  SELECT event_type, ${sqlH60("CAST(user_id AS VARCHAR)")} AS hv
         |  FROM events),
         |b AS (SELECT event_type, hv & ${HllM - 1} AS bucket,
         |    hv >> $HllP AS w FROM h),
         |r AS (SELECT event_type, bucket,
         |    MAX(CASE WHEN w = 0 THEN $HllRhoMax
         |      ELSE CAST(bit_count((w & (0 - w)) - 1) AS INT) + 1 END) AS mj
         |  FROM b GROUP BY 1, 2),
         |s AS (SELECT event_type,
         |    CAST(SUM(CAST(1 AS BIGINT) << ($HllRhoMax - mj)) AS BIGINT)
         |      + ($HllM - COUNT(*)) * CAST($HllPow AS BIGINT) AS s_int,
         |    $HllM - COUNT(*) AS v
         |  FROM r GROUP BY 1),
         |e AS (SELECT event_type,
         |    round(CASE WHEN $HllRawNum / s_int <= ${2.5 * HllM} AND v > 0
         |      THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v)
         |      ELSE $HllRawNum / s_int END, 4) AS est FROM s),
         |x AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT x.event_type, n_exact, est AS hll_estimate,
         |  round(abs(est - n_exact) / n_exact, 6) AS rel_err
         |FROM e JOIN x ON e.event_type = x.event_type""".stripMargin,
    "p40_hll_distinct" ->
      s"""WITH h AS (
         |  SELECT ${sqlH60("CAST(user_id AS VARCHAR)")} AS hv FROM events),
         |b AS (SELECT hv & ${HllM - 1} AS bucket, hv >> $HllP AS w FROM h),
         |r AS (SELECT bucket, MAX(CASE WHEN w = 0 THEN $HllRhoMax
         |    ELSE CAST(bit_count((w & (0 - w)) - 1) AS INT) + 1 END) AS mj
         |  FROM b GROUP BY 1),
         |s AS (SELECT CAST(SUM(CAST(1 AS BIGINT) << ($HllRhoMax - mj)) AS BIGINT)
         |    + ($HllM - COUNT(*)) * CAST($HllPow AS BIGINT) AS s_int,
         |    $HllM - COUNT(*) AS v
         |  FROM r),
         |e AS (SELECT round(CASE WHEN $HllRawNum / s_int <= ${2.5 * HllM} AND v > 0
         |    THEN ${HllM.toDouble} * ln(${HllM.toDouble} / v)
         |    ELSE $HllRawNum / s_int END, 4) AS est FROM s),
         |x AS (SELECT COUNT(DISTINCT user_id) AS n_exact FROM events)
         |SELECT n_exact, est AS hll_estimate,
         |  round(abs(est - n_exact) / n_exact, 6) AS rel_err
         |FROM e, x""".stripMargin,
    "p11_events_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    LAG(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 600000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM g),
        |s AS (
        |  SELECT user_id, ts_us, CAST(SUM(new_sess) OVER
        |    (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS sess
        |  FROM f)
        |SELECT user_id, sess, COUNT(*) AS n_events,
        |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
        |FROM s GROUP BY user_id, sess""".stripMargin,
    "p79_source_quota_cap" ->
      s"""SELECT doc_id, source, n_chars FROM (
         |  SELECT doc_id, source, n_chars,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM documents) t
         |WHERE rk <= $QuotaK""".stripMargin,
    "p80_mixture_epochs" ->
      s"""WITH e AS (
         |  SELECT doc_id, source,
         |    1 + ${sqlH60("source")} % $MixEpochMax AS epochs
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source,
         |    CAST(unnest(generate_series(1, epochs)) AS BIGINT) AS epoch
         |  FROM e)
         |SELECT doc_id, source, epoch,
         |  ${sqlH60("CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)")}
         |    % $MixShardN AS shard
         |FROM r""".stripMargin,
    "p81_source_drift_psi" ->
      s"""WITH b AS (
         |  SELECT source, least($PsiMaxBin, n_chars // 100) AS bin
         |  FROM documents),
         |c AS (SELECT source, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
         |grid AS (
         |  SELECT source, bin
         |  FROM (SELECT DISTINCT source FROM documents),
         |    (SELECT unnest(generate_series(0, $PsiMaxBin)) AS bin)),
         |f AS (
         |  SELECT g.source, g.bin, coalesce(c.c, 0) AS c
         |  FROM grid g LEFT JOIN c ON g.source = c.source AND g.bin = c.bin),
         |tot AS (SELECT source, SUM(c) AS t FROM f GROUP BY 1),
         |gl AS (SELECT bin, SUM(c) AS gc FROM f GROUP BY 1),
         |n AS (SELECT SUM(c) AS n FROM f),
         |r AS (
         |  SELECT f.source, f.bin,
         |    2 * f.c + 1 AS pn, 2 * t + ${PsiMaxBin + 1} AS pd,
         |    2 * (gc - f.c) + 1 AS qn, 2 * (n - t) + ${PsiMaxBin + 1} AS qd
         |  FROM f JOIN tot USING (source) JOIN gl USING (bin) CROSS JOIN n),
         |tm AS (
         |  SELECT source, bin,
         |    (CAST(pn AS DOUBLE) / pd - CAST(qn AS DOUBLE) / qd)
         |      * (${sqlQlog2("pn * qd")} - ${sqlQlog2("qn * pd")})
         |      / 65536.0 AS term
         |  FROM r)
         |SELECT source,
         |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(term ORDER BY bin)), (a, x) -> a + x), 6) AS psi
         |FROM tm GROUP BY source""".stripMargin,
    "p124_psi_baseline_drift" ->
      s"""WITH ranked AS (
         |  SELECT source, doc_id,
         |    least($PsiMaxBin, n_chars // 100) AS bin,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id)
         |      AS idx
         |  FROM documents),
         |basecnt AS (
         |  SELECT source, bin, COUNT(*) AS bc FROM ranked
         |  WHERE idx <= $PsiBaselineDocs GROUP BY 1, 2),
         |winrows AS (
         |  SELECT source, bin,
         |    (idx - ${PsiBaselineDocs + 1}) // $PsiWindowDocs
         |      AS window_idx
         |  FROM ranked WHERE idx > $PsiBaselineDocs),
         |complete AS (
         |  SELECT source, window_idx FROM winrows
         |  GROUP BY 1, 2 HAVING COUNT(*) = $PsiWindowDocs),
         |wincnt AS (
         |  SELECT source, window_idx, bin, COUNT(*) AS wc
         |  FROM winrows GROUP BY 1, 2, 3),
         |grid AS (
         |  SELECT source, window_idx, bin FROM complete,
         |    (SELECT unnest(generate_series(0, $PsiMaxBin)) AS bin)),
         |f AS (
         |  SELECT g.source, g.window_idx, g.bin,
         |    2 * coalesce(w.wc, 0) + 1 AS pn,
         |    ${2 * PsiWindowDocs + PsiMaxBin + 1} AS pd,
         |    2 * coalesce(b.bc, 0) + 1 AS qn,
         |    ${2 * PsiBaselineDocs + PsiMaxBin + 1} AS qd
         |  FROM grid g
         |  LEFT JOIN wincnt w ON g.source = w.source
         |    AND g.window_idx = w.window_idx AND g.bin = w.bin
         |  LEFT JOIN basecnt b ON g.source = b.source AND g.bin = b.bin),
         |tm AS (
         |  SELECT source, window_idx, bin,
         |    (CAST(pn AS DOUBLE) / pd - CAST(qn AS DOUBLE) / qd)
         |      * (${sqlQlog2("pn * qd")} - ${sqlQlog2("qn * pd")})
         |      / 65536.0 AS term
         |  FROM f),
         |p AS (
         |  SELECT source, window_idx,
         |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(term ORDER BY bin)), (a, x) -> a + x), 6) AS psi
         |  FROM tm GROUP BY 1, 2)
         |SELECT source, window_idx, psi,
         |  CASE WHEN psi >= 0.25 THEN 2 WHEN psi >= 0.1 THEN 1
         |    ELSE 0 END AS level
         |FROM p""".stripMargin,
    "p82_soft_dedup_weights" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |sz AS (SELECT cluster_id, COUNT(*) AS n_members
         |  FROM lbl GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(l.cluster_id, d.doc_id) AS cluster_id,
         |  coalesce(sz.n_members, 1) AS n_members,
         |  round(CAST(1 AS DOUBLE) / coalesce(sz.n_members, 1), 6) AS weight
         |FROM documents d
         |LEFT JOIN lbl l ON d.doc_id = l.doc_id
         |LEFT JOIN sz ON l.cluster_id = sz.cluster_id""".stripMargin,
    "p83_quality_sampling" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS tk FROM documents),
         |b AS (SELECT doc_id,
         |    CAST(len(tk) AS BIGINT) AS n_tokens,
         |    CAST(len(list_filter(tk, x -> list_contains($sqlStops, x)))
         |      AS BIGINT) AS n_stop
         |  FROM t),
         |p AS (SELECT doc_id, n_tokens,
         |    greatest(CAST(0.05 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
         |      n_stop / n_tokens)) AS p_acc
         |  FROM b)
         |SELECT doc_id, n_tokens, round(p_acc, 6) AS accept_p,
         |  round(CAST(1 AS DOUBLE) / p_acc, 6) AS weight
         |FROM p
         |WHERE ${sqlH60("CAST(doc_id AS VARCHAR)")} % $SampleLanes
         |  < CAST(floor(p_acc * $SampleLanes.0) AS BIGINT)""".stripMargin,
    "p84_hourly_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, STRFTIME(ts, '%Y-%m-%d %H') AS hour,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n_hours,
        |    CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c*c) AS BIGINT) AS ss
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.hour, h.c, st.n_hours,
        |  (st.n_hours*h.c - st.s) * (st.n_hours*h.c - st.s) AS dev2,
        |  st.n_hours*st.ss - st.s*st.s AS nvar
        |FROM h JOIN st USING (event_type)
        |WHERE st.n_hours >= 2
        |  AND (st.n_hours*h.c - st.s) * (st.n_hours*h.c - st.s)
        |    > 9 * (st.n_hours*st.ss - st.s*st.s)""".stripMargin,
    // recomputes each nearest-neighbor-sampled source pixel straight
    // from the text hex that became the BMP pixels: resample index
    // bugs, stride/row-flip errors, or padding leakage flip the hash
    "p86_image_resize" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(4 + doc_id % 3 AS INT) AS width,
        |    CAST(2 + doc_id % 2 AS INT) AS height,
        |    lower(hex(text)) AS hx FROM documents),
        |px AS (SELECT doc_id, width, height,
        |    substr(hx, 1, height*width*6)
        |      || repeat('0', greatest(0, height*width*6 - len(hx)))
        |      AS pixhex
        |  FROM p),
        |g AS (SELECT doc_id, width, height, pixhex,
        |    CAST(ty AS INT) AS ty, CAST(tx AS INT) AS tx,
        |    (ty * height) // 2 AS sy, (tx * width) // 2 AS sx
        |  FROM px, unnest(generate_series(0, 1)) a(ty),
        |    unnest(generate_series(0, 1)) b(tx)),
        |b AS (SELECT doc_id, ty, tx,
        |    CAST('0x' || substr(pixhex, (sy*width*3 + sx*3 + k)*2 + 1, 2)
        |      AS BIGINT) AS bv
        |  FROM g, unnest(generate_series(0, 2)) c(k))
        |SELECT doc_id, ty, tx,
        |  round(CAST(SUM(bv) AS DOUBLE) / 3, 6) AS px_mean
        |FROM b GROUP BY doc_id, ty, tx""".stripMargin,
    "p90_fk_discovery" -> {
      // GENERATED from the same FkDomain/FkCandidatePairs enumeration the
      // Spark side require-checks against the live schemas, with the same
      // exact gate (parent unique, child NDV <= parent NDV) — the
      // approximate catalog-stats prune on the Spark side only skips
      // pairs this WHERE clause rejects anyway
      def blk(ct: String, cc: String, pt: String, pc: String,
          fam: String): String = {
        def v(x: String) = if (fam == "int") s"CAST($x AS BIGINT)" else x
        s"""SELECT '$ct.$cc' AS child_col, '$pt.$pc' AS parent_col,
           |  (SELECT CAST(COUNT(DISTINCT $cc) AS BIGINT) FROM $ct)
           |    AS n_child_distinct,
           |  (SELECT CAST(COUNT(*) AS BIGINT)
           |   FROM (SELECT DISTINCT ${v(cc)} AS v FROM $ct
           |         WHERE $cc IS NOT NULL) q
           |   WHERE v NOT IN (SELECT ${v(pc)} FROM $pt
           |                   WHERE $pc IS NOT NULL)) AS n_unmatched
           |WHERE (SELECT COUNT(DISTINCT $pc) FROM $pt)
           |    = (SELECT COUNT(*) FROM $pt)
           |  AND (SELECT COUNT(DISTINCT $cc) FROM $ct)
           |   <= (SELECT COUNT(DISTINCT $pc) FROM $pt)
           |  AND (SELECT COUNT(DISTINCT $cc) FROM $ct) >= 1
           |  AND (SELECT COUNT(DISTINCT $pc) FROM $pt) >= 1"""
          .stripMargin
      }
      val blocks = FkCandidatePairs.map { case ((ct, cc, fam), (pt, pc, _)) =>
        blk(ct, cc, pt, pc, fam)
      }.mkString("\nUNION ALL\n")
      s"""SELECT child_col, parent_col, n_child_distinct, n_unmatched,
         |  CAST(CASE WHEN n_unmatched = 0 THEN 1 ELSE 0 END AS INT)
         |    AS is_fk
         |FROM ($blocks)""".stripMargin
    },
    "p89_table_profile" ->
      // the unpivot is GENERATED from DocumentsColumns — the same list the
      // Spark side checks its scan against — so schema drift turns into
      // one loud require, never a silent two-sided desync (round-9 ADVICE)
      s"""WITH st AS (
        |  ${DocumentsColumns.map(c =>
             s"SELECT '$c' AS column_name, CAST($c AS VARCHAR) AS v" +
               " FROM documents").mkString("\n  UNION ALL ")}),
        |g AS (SELECT column_name, v, COUNT(*) AS cnt FROM st GROUP BY 1, 2),
        |s AS (SELECT column_name, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |    CAST(SUM(CASE WHEN v IS NULL THEN cnt ELSE 0 END) AS BIGINT)
        |      AS n_nulls,
        |    COUNT(CASE WHEN v IS NOT NULL THEN 1 END) AS n_distinct,
        |    MIN(v) AS min_value, MAX(v) AS max_value
        |  FROM g GROUP BY 1),
        |t AS (SELECT column_name, v AS top_value, cnt AS top_cnt,
        |    ROW_NUMBER() OVER (PARTITION BY column_name
        |      ORDER BY cnt DESC, v ASC) AS rk
        |  FROM g WHERE v IS NOT NULL)
        |SELECT s.column_name, n_rows, n_nulls, n_distinct,
        |  min_value, max_value, t.top_value, t.top_cnt
        |FROM s JOIN t ON s.column_name = t.column_name AND t.rk = 1"""
        .stripMargin,
    "p88_dup_pagerank" ->
      s"""WITH p AS ($sqlP02),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM p
         |  UNION ALL SELECT doc_b, doc_a FROM p),
         |deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1),
         |r0 AS (SELECT src AS doc_id, CAST($PrScale AS BIGINT) AS rank
         |  FROM deg),
         |c1 AS (SELECT e.dst AS doc_id,
         |    CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS sc
         |  FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r0 r ON e.src = r.doc_id GROUP BY 1),
         |r1 AS (SELECT doc_id,
         |    CAST($PrBase + (85 * sc) // 100 AS BIGINT) AS rank FROM c1),
         |c2 AS (SELECT e.dst AS doc_id,
         |    CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS sc
         |  FROM edges e JOIN deg d ON e.src = d.src
         |    JOIN r1 r ON e.src = r.doc_id GROUP BY 1),
         |r2 AS (SELECT doc_id,
         |    CAST($PrBase + (85 * sc) // 100 AS BIGINT) AS rank FROM c2)
         |SELECT r2.doc_id, d.outdeg AS degree, r2.rank
         |FROM r2 JOIN deg d ON r2.doc_id = d.src""".stripMargin,
    "p87_ref_integrity" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id % 13 <> 5),
        |v AS (SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 3),
        |a AS (SELECT 'doc_without_vec' AS category,
        |    COUNT(*) AS n_orphans, MIN(doc_id) AS min_id,
        |    MAX(doc_id) AS max_id
        |  FROM d WHERE doc_id NOT IN (SELECT vec_id FROM v)),
        |b AS (SELECT 'vec_without_doc' AS category,
        |    COUNT(*) AS n_orphans, MIN(vec_id) AS min_id,
        |    MAX(vec_id) AS max_id
        |  FROM v WHERE vec_id NOT IN (SELECT doc_id FROM d))
        |SELECT * FROM a UNION ALL SELECT * FROM b""".stripMargin,
    "p93_dedup_recall" ->
      // found = the full p02 oracle restricted to pairs touching the
      // fixed-size sample; truth = an INDEPENDENT sample-anchored exact
      // Jaccard (sample × all distinct shingle-id sets — own CTE names,
      // no reuse of p02's internals beyond the shared tokenizer/shingle
      // fragments). `dd` mirrors the Spark side's corpusCells divisor.
      s"""WITH p AS ($sqlP02),
         |dd AS (SELECT greatest(2, (count(*) + ${DedupSampleTarget - 1})
         |    // $DedupSampleTarget) AS dv FROM documents),
         |found AS (SELECT doc_a, doc_b FROM p
         |  WHERE doc_a % (SELECT dv FROM dd) = 0
         |     OR doc_b % (SELECT dv FROM dd) = 0),
         |tsh AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |tsig AS (SELECT doc_id,
         |    list(DISTINCT ${sqlH60("shingle")}) AS shset,
         |    len(shset) AS n
         |  FROM tsh GROUP BY doc_id),
         |samp AS (SELECT * FROM tsig
         |  WHERE doc_id % (SELECT dv FROM dd) = 0),
         |truth AS (
         |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
         |    greatest(a.doc_id, b.doc_id) AS doc_b
         |  FROM samp a JOIN tsig b ON a.doc_id <> b.doc_id
         |  WHERE CAST(len(list_intersect(a.shset, b.shset)) AS DOUBLE)
         |    / (a.n + b.n - len(list_intersect(a.shset, b.shset)))
         |    >= $JaccardThreshold),
         |hit AS (SELECT f.doc_a FROM found f
         |  JOIN truth t ON f.doc_a = t.doc_a AND f.doc_b = t.doc_b),
         |c AS (SELECT
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM found) AS n_found,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit)
         |SELECT n_true, n_found, n_hit,
         |  CASE WHEN n_true > 0
         |    THEN ROUND(CAST(n_hit AS DOUBLE) / n_true, 6) END AS recall,
         |  CASE WHEN n_found > 0
         |    THEN ROUND(CAST(n_hit AS DOUBLE) / n_found, 6) END AS precision
         |FROM c""".stripMargin,
    "p92_decontaminate" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", ContamW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |g AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g FROM sh),
         |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 29 = 7),
         |tr AS (SELECT doc_id, g FROM g WHERE doc_id % 29 <> 7),
         |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
         |  FROM tr GROUP BY 1),
         |hit AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
         |  FROM tr WHERE g IN (SELECT g FROM ev) GROUP BY 1)
         |SELECT h.doc_id, t.n_grams, h.n_contaminated,
         |  ROUND(CAST(h.n_contaminated AS DOUBLE) / t.n_grams, 6)
         |    AS contam_frac
         |FROM hit h JOIN tot t ON h.doc_id = t.doc_id""".stripMargin,
    "p91_upsert_tombstones" ->
      """WITH u AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |    value,
        |    CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END AS is_delete
        |  FROM events),
        |r AS (SELECT u.*, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rk FROM u)
        |SELECT user_id, event_type, event_id, ts_us, value
        |FROM r WHERE rk = 1 AND is_delete = 0""".stripMargin,
    "p85_upsert_latest" ->
      """WITH u AS (
        |  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
        |    value,
        |    CAST(CASE WHEN event_id % 10 = 9 THEN 1 ELSE 0 END AS INT)
        |      AS from_batch
        |  FROM events),
        |r AS (SELECT u.*, ROW_NUMBER() OVER (
        |    PARTITION BY user_id, event_type
        |    ORDER BY ts_us DESC, event_id DESC) AS rk FROM u)
        |SELECT user_id, event_type, event_id, ts_us, value, from_batch
        |FROM r WHERE rk = 1""".stripMargin,
  )

  /** The p127 oracle body — bound once so the p129 audit can embed
    * it verbatim as its exact side (the p110 one-source rule). */
  /** p114's oracle text — a val so the p132 policy matrix embeds the
    * SAME text verbatim (the p110 composite rule). */
  private lazy val sqlP114: String =
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |base AS (SELECT doc_id, t, len(t) AS n,
         |    len(t) // $SpanW AS n_spans FROM tk),
         |sp AS (SELECT doc_id, j,
         |    ${sqlH60(s"array_to_string(t[(j-1)*$SpanW+1:j*$SpanW], ' ')")}
         |      AS hv,
         |    doc_id * $StripPosPack + j AS pos
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, n_spans)) AS j FROM base)),
         |c AS (SELECT hv, COUNT(*) AS cnt, MIN(pos) AS keeper
         |  FROM sp GROUP BY 1),
         |cand AS (SELECT doc_id, j FROM sp JOIN c USING (hv)
         |  WHERE cnt > 1 AND pos <> keeper),
         |runs AS (SELECT doc_id, COUNT(*) AS run_len, list(j) AS js
         |  FROM (SELECT doc_id, j,
         |      j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j)
         |        AS isl FROM cand)
         |  GROUP BY doc_id, isl),
         |dr AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
         |    flatten(list(js)) AS drop_j
         |  FROM runs WHERE run_len >= $MinRunW GROUP BY doc_id),
         |fin AS (SELECT b.doc_id, b.n_spans, dr.n_runs,
         |    coalesce(dr.drop_j, CAST([] AS BIGINT[])) AS dj,
         |    flatten(list_transform(
         |        list_filter(generate_series(1, b.n_spans),
         |          j -> NOT list_contains(
         |            coalesce(dr.drop_j, CAST([] AS BIGINT[])), j)),
         |        j -> b.t[(j-1)*$SpanW+1:j*$SpanW]))
         |      || b.t[b.n_spans*$SpanW+1:b.n] AS clean
         |  FROM base b LEFT JOIN dr ON b.doc_id = dr.doc_id)
         |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
         |  CAST(coalesce(n_runs, 0) AS BIGINT) AS n_runs_dropped,
         |  CAST(len(dj) AS BIGINT) AS n_dropped,
         |  CAST(len(clean) AS BIGINT) AS n_tokens_clean,
         |  md5(coalesce(array_to_string(clean, ' '), '')) AS clean_md5
         |FROM fin""".stripMargin

  /** p133's oracle text — a val so the p110 health report embeds the
    * SAME text verbatim as its substring_contam check (the p110
    * one-source rule). */
  private lazy val sqlP133: String =
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |base AS (SELECT doc_id, t, len(t) AS n FROM tk),
         |sp AS (SELECT doc_id, j,
         |    ${sqlH60(s"array_to_string(t[j:j+${SpanW - 1}], ' ')")} AS hv
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, n - ${SpanW - 1})) AS j
         |    FROM base)),
         |ev AS (SELECT DISTINCT hv FROM sp WHERE doc_id % 29 = 7),
         |ma AS (SELECT doc_id, j FROM sp
         |  WHERE doc_id % 29 <> 7 AND hv IN (SELECT hv FROM ev)),
         |runs AS (SELECT doc_id, COUNT(*) AS m
         |  FROM (SELECT doc_id, j,
         |      j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j)
         |        AS isl FROM ma)
         |  GROUP BY doc_id, isl),
         |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
         |    AS n_matched_starts FROM ma GROUP BY 1),
         |mx AS (SELECT doc_id, MAX(m) + ${SpanW - 1}
         |    AS max_overlap_tokens FROM runs GROUP BY 1)
         |SELECT b.doc_id,
         |  CAST(CASE WHEN b.n >= $SpanW THEN b.n - ${SpanW - 1}
         |    ELSE 0 END AS BIGINT) AS n_starts,
         |  CAST(COALESCE(pd.n_matched_starts, 0) AS BIGINT)
         |    AS n_matched_starts,
         |  CAST(COALESCE(mx.max_overlap_tokens, 0) AS BIGINT)
         |    AS max_overlap_tokens,
         |  CAST(CASE WHEN COALESCE(mx.max_overlap_tokens, 0)
         |    >= $MinSubTokens THEN 1 ELSE 0 END AS INT) AS verbatim_leak
         |FROM base b LEFT JOIN pd ON b.doc_id = pd.doc_id
         |LEFT JOIN mx ON b.doc_id = mx.doc_id
         |WHERE b.doc_id % 29 <> 7""".stripMargin

  /** p131's oracle text — same sharing rule as [[sqlP114]]. */
  private lazy val sqlP131: String = sqlP131Gate(MinSubTokens)

  /** p131's oracle text at an explicit span gate — the p132 matrix
    * embeds it twice (the comparability gate and [[ProdSubTokens]],
    * Lee et al.'s production 50). */
  private def sqlP131Gate(gate: Int): String =
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |base AS (SELECT doc_id, t, len(t) AS n FROM tk),
         |sp AS (SELECT doc_id, j,
         |    ${sqlH60(s"array_to_string(t[j:j+${SpanW - 1}], ' ')")} AS hv,
         |    doc_id * $StripPosPack + j AS pos
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, n - ${SpanW - 1})) AS j
         |    FROM base)),
         |c AS (SELECT hv, COUNT(*) AS cnt, MIN(pos) AS keeper
         |  FROM sp GROUP BY 1),
         |cand AS (SELECT doc_id, j FROM sp JOIN c USING (hv)
         |  WHERE cnt > 1 AND pos <> keeper),
         |runs AS (SELECT doc_id, MIN(j) AS j0, COUNT(*) AS m
         |  FROM (SELECT doc_id, j,
         |      j - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j)
         |        AS isl FROM cand)
         |  GROUP BY doc_id, isl),
         |gr AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
         |    list_distinct(flatten(list(
         |      generate_series(j0, j0 + m + ${SpanW - 2})))) AS dp
         |  FROM runs WHERE m + ${SpanW - 1} >= $gate
         |  GROUP BY doc_id),
         |fin AS (SELECT b.doc_id, b.n, gr.n_runs,
         |    list_transform(list_filter(generate_series(1, b.n),
         |        p -> NOT list_contains(
         |          coalesce(gr.dp, CAST([] AS BIGINT[])), p)),
         |      p -> b.t[p]) AS clean
         |  FROM base b LEFT JOIN gr ON b.doc_id = gr.doc_id)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  CAST(coalesce(n_runs, 0) AS BIGINT) AS n_runs_dropped,
         |  CAST(n - len(clean) AS BIGINT) AS n_dropped,
         |  CAST(len(clean) AS BIGINT) AS n_tokens_clean,
         |  md5(coalesce(array_to_string(clean, ' '), '')) AS clean_md5
         |FROM fin""".stripMargin

  private lazy val sqlP127: String =
    s"""WITH bm AS (SELECT probe_id, doc_id, rnk AS bm25_rnk
           |  FROM (${oracleBase("p74_bm25_retrieval")}) t),
           |e AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |  FROM embeddings),
           |n AS (SELECT vec_id, v,
           |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
           |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
           |  FROM n WHERE vec_id < 10),
           |s AS (
           |  SELECT probe_id, vec_id AS doc_id,
           |    round(list_sum(list_transform(generate_series(1, len(pv)),
           |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
           |  FROM n, p WHERE vec_id <> probe_id),
           |an AS (SELECT probe_id, doc_id, rnk AS ann_rnk FROM (
           |  SELECT probe_id, doc_id,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
           |      ORDER BY sim DESC, doc_id) AS INT) AS rnk FROM s) t
           |  WHERE rnk <= $Bm25TopK),
           |fo AS (SELECT COALESCE(bm.probe_id, an.probe_id) AS probe_id,
           |    COALESCE(bm.doc_id, an.doc_id) AS doc_id,
           |    COALESCE(bm.bm25_rnk, 0) AS bm25_rnk,
           |    COALESCE(an.ann_rnk, 0) AS ann_rnk
           |  FROM bm FULL OUTER JOIN an
           |    ON bm.probe_id = an.probe_id AND bm.doc_id = an.doc_id),
           |sc AS (SELECT probe_id, doc_id, bm25_rnk, ann_rnk,
           |    (CASE WHEN bm25_rnk > 0
           |      THEN $RrfScale // ($RrfK + CAST(bm25_rnk AS BIGINT))
           |      ELSE CAST(0 AS BIGINT) END)
           |    + (CASE WHEN ann_rnk > 0
           |      THEN $RrfScale // ($RrfK + CAST(ann_rnk AS BIGINT))
           |      ELSE CAST(0 AS BIGINT) END) AS rrf_q
           |  FROM fo),
           |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
           |    ORDER BY rrf_q DESC, doc_id) AS INT) AS rnk FROM sc)
           |SELECT probe_id, doc_id, rnk, rrf_q, bm25_rnk, ann_rnk
           |FROM r WHERE rnk <= $Bm25TopK""".stripMargin

  /** p135's oracle text — the IVF-SERVED fused list: the p129 audit's
    * IVF chain (coarse assign, own-cell scan, shared BM25, exact-int64
    * RRF) with the FULL rank columns out. A val so p129's oracle
    * embeds it verbatim as its approximate side (the one-source rule:
    * serving op and audit cannot drift). */
  private lazy val sqlP135: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v,
       |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |ik AS (SELECT greatest($IvfKFloor, (count(*) + ${IvfCellTarget - 1})
       |    // $IvfCellTarget) AS k FROM n),
       |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
       |  FROM n WHERE vec_id < (SELECT k FROM ik)),
       |a0 AS (
       |  SELECT n.vec_id, n.v, n.nrm, c.cent_id,
       |    round(list_sum(list_transform(generate_series(1, len(n.v)),
       |      i -> n.v[i] * c.cv[i])) / (n.nrm * c.cnrm), 6) AS csim
       |  FROM n, c),
       |a AS (
       |  SELECT vec_id, v, nrm, cent_id AS cell FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY csim DESC, cent_id) AS arnk FROM a0) t
       |  WHERE arnk = 1),
       |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, cell
       |  FROM a WHERE vec_id < 10),
       |s AS (
       |  SELECT probe_id, vec_id AS doc_id,
       |    round(list_sum(list_transform(generate_series(1, len(pv)),
       |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
       |  FROM a JOIN p USING (cell) WHERE vec_id <> probe_id),
       |an AS (SELECT probe_id, doc_id, rnk AS ann_rnk FROM (
       |  SELECT probe_id, doc_id,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |      ORDER BY sim DESC, doc_id) AS INT) AS rnk FROM s) t
       |  WHERE rnk <= $Bm25TopK),
       |bm AS (SELECT probe_id, doc_id, rnk AS bm25_rnk
       |  FROM (${oracleBase("p74_bm25_retrieval")}) t),
       |fo AS (SELECT COALESCE(bm.probe_id, an.probe_id) AS probe_id,
       |    COALESCE(bm.doc_id, an.doc_id) AS doc_id,
       |    COALESCE(bm.bm25_rnk, 0) AS bm25_rnk,
       |    COALESCE(an.ann_rnk, 0) AS ann_rnk
       |  FROM bm FULL OUTER JOIN an
       |    ON bm.probe_id = an.probe_id AND bm.doc_id = an.doc_id),
       |sc AS (SELECT probe_id, doc_id, bm25_rnk, ann_rnk,
       |    (CASE WHEN bm25_rnk > 0
       |      THEN $RrfScale // ($RrfK + CAST(bm25_rnk AS BIGINT))
       |      ELSE CAST(0 AS BIGINT) END)
       |    + (CASE WHEN ann_rnk > 0
       |      THEN $RrfScale // ($RrfK + CAST(ann_rnk AS BIGINT))
       |      ELSE CAST(0 AS BIGINT) END) AS rrf_q
       |  FROM fo),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |    ORDER BY rrf_q DESC, doc_id) AS INT) AS rnk FROM sc)
       |SELECT probe_id, doc_id, rnk, rrf_q, bm25_rnk, ann_rnk
       |FROM r WHERE rnk <= $Bm25TopK""".stripMargin

}
