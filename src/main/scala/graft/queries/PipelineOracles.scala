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
trait PipelineOracles extends PipelineReports {


  // DuckDB twins. Shared SQL fragments:
  private[queries] val sqlToks = "string_split(text, ' ')"


  // twin of `qlog2`: piecewise-linear log2, 16 fractional bits, pure
  // integer arithmetic (DuckDB's // is BIGINT floor-division; the
  // power(2, …) divisor is a power of two, CAST-exact below 2^52)
  private[queries] def sqlQlog2(x: String): String =
    s"((CAST(length(bin($x)) AS BIGINT) - 1) * 65536" +
      s" + (($x) * 65536) // CAST(power(2, length(bin($x)) - 1) AS BIGINT)" +
      s" - 65536)"

  private[queries] val sqlSigList = (0 until NumHashes)
    .map(i => s"min(${sqlHashFam(i, "shingle")})").mkString(", ")

  private[queries] val sqlStops =
    Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")


  // The capped candidate-pair CTEs (twin of `candidatePairs`), appended
  // after any `bands(doc_id, band, bkey)` CTE — one copy for both the
  // p02 and p29 oracles so cap/ordering tweaks cannot diverge.
  private[queries] val sqlCappedCand: String =
    s"""capped AS (
       |  SELECT doc_id, band, bkey FROM (
       |    SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bsz
       |    FROM bands) t WHERE bsz <= $MaxBucket),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM capped a JOIN capped b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)""".stripMargin


  // p02's full oracle text, shared with p32 (which clusters p02's pairs).
  /** The global-BPE CTE chain (wf, sym0, then p_r/w_r/sym_r per round)
    * shared by p62 (merge table) and p66 (apply + compression summary).
    * LEFT JOIN ON TRUE replays the Scala chain's winner-less-round
    * behavior: NULL a/b never merge, the vocabulary passes through. */
  private[queries] def sqlBpeChain(rounds: Int): String = {
    val round = (r: Int) => s"""
       |p$r AS (SELECT l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt
       |  FROM sym${r - 1}, UNNEST(generate_series(1, len(l)-1)) AS u(i)
       |  GROUP BY 1, 2),
       |w$r AS (SELECT a, b, cnt FROM p$r ORDER BY cnt DESC, a, b LIMIT 1),
       |sym$r AS (SELECT w, freq,
       |    list_reduce(list_transform(l, s -> [s]), (acc, x) ->
       |      CASE WHEN acc[len(acc)] = a AND x[1] = b
       |           THEN list_concat(acc[1:len(acc)-1], [a || b])
       |           ELSE list_concat(acc, x) END) AS l
       |  FROM sym${r - 1} LEFT JOIN w$r ON TRUE)"""
    s"""WITH wf AS (
       |  SELECT term AS w, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS term FROM documents)
       |  WHERE regexp_full_match(term, '[a-z]+') AND length(term) >= 2
       |  GROUP BY 1),
       |sym0 AS (SELECT w, freq, string_split(w, '') AS l FROM wf)""".stripMargin +
      (1 to rounds).map(r => "," + round(r).stripMargin).mkString
  }


  /** The p02 sketch+bands CTE chain (sh, sig, bands) — shared with the
    * incremental form p65. */
  // The sketch/band CTE chain over any (doc_id, text) relation `src` —
  // twin of `minhashSigOf` + `bandRowsOf`, shared by p02/p65 (over
  // `documents`) and p78 (over its exact-dedup survivors).
  private[queries] def sqlMinhashBaseFrom(src: String): String =
    s"""sh AS (
       |  SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
       |  FROM (SELECT doc_id, $sqlToks AS t FROM $src)),
       |sig AS (SELECT doc_id, [$sqlSigList] AS sig,
       |    list(DISTINCT ${sqlH60("shingle")}) AS shset,
       |    len(shset) AS n
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b AS band, array_to_string(list_transform(
       |    sig[b*$BandRows+1 : b*$BandRows+$BandRows],
       |    x -> CAST(x AS VARCHAR)), ',') AS bkey
       |  FROM sig, (SELECT unnest(generate_series(0, ${NumBands - 1})) AS b) bs)"""
      .stripMargin


  private[queries] val sqlMinhashBase: String = sqlMinhashBaseFrom("documents")


  private[queries] val sqlP02: String =
    s"""WITH $sqlMinhashBase,
       |$sqlCappedCand,
       |pairs AS (
       |  SELECT c.doc_a, c.doc_b,
       |    len(list_intersect(da.shset, db.shset)) AS ninter,
       |    da.n AS na, db.n AS nb
       |  FROM cand c
       |  JOIN sig da ON da.doc_id = c.doc_a
       |  JOIN sig db ON db.doc_id = c.doc_b)
       |SELECT doc_a, doc_b,
       |  CAST(ninter AS DOUBLE) / (na + nb - ninter) AS jaccard
       |FROM pairs
       |WHERE CAST(ninter AS DOUBLE) / (na + nb - ninter)
       |  >= $JaccardThreshold""".stripMargin


  // Scalar-quantization CTEs (twin of `quantizedVectors`) shared by the
  // p42 and p47 oracles: per-dim min/max lists + int8 codes per vector.
  // Callers prepend WITH and read `q` (vec_id, label, v, nrm, qv) and
  // `sa` (mns, mxs).
  private[queries] val sqlQuantCtes: String =
    """e AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |st AS (
      |  SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
      |  FROM e, (SELECT unnest(generate_series(1,
      |    (SELECT max(len(v)) FROM e))) AS i) dims
      |  WHERE i <= len(v) GROUP BY i),
      |sa AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
      |  FROM st),
      |q AS (
      |  SELECT vec_id, label, v,
      |    sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
      |    list_transform(generate_series(1, len(v)), i ->
      |      CASE WHEN mxs[i] = mns[i] THEN 0
      |        ELSE least(127, CAST(floor((v[i] - mns[i]) * 255.0
      |          / (mxs[i] - mns[i])) AS BIGINT) - 128) END) AS qv
      |  FROM e, sa)""".stripMargin


  // The p53 two-Lloyd-iteration chain (twin of `kmeansState`), shared
  // by the p53 and p94 oracles. Prepend `sqlQuantCtes`; readers get
  // `qq` (vec_id, qv) and `a2` (vec_id, d2, cell).
  // The NB scoring chain shared by the p71 census and p103 calibration
  // oracles. Prepend WITH; readers get `sc` (doc_id, actual, cls, score).
  private[queries] val sqlNbScoredCtes: String =
    s"""d AS (SELECT doc_id, lang, text,
       |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_test
       |  FROM documents),
       |tk AS (SELECT doc_id, lang, is_test, unnest($sqlToks) AS token
       |  FROM d),
       |model AS (SELECT lang, token, COUNT(*) AS cnt
       |  FROM tk WHERE NOT is_test GROUP BY 1, 2),
       |vs AS (SELECT COUNT(DISTINCT token) AS v FROM model),
       |cs AS (SELECT m.lang AS cls,
       |    ${sqlQlog2("p.n_docs")} AS q_prior,
       |    ${sqlQlog2("CAST(SUM(m.cnt) + vs.v AS BIGINT)")} AS q_den
       |  FROM model m
       |  JOIN (SELECT lang, COUNT(*) AS n_docs FROM d
       |        WHERE NOT is_test GROUP BY 1) p ON p.lang = m.lang,
       |    vs
       |  GROUP BY m.lang, p.n_docs, vs.v),
       |sc AS (SELECT tk.doc_id, tk.lang AS actual, cs.cls,
       |    cs.q_prior
       |      + SUM(${sqlQlog2("COALESCE(m.cnt, 0) + 1")})
       |      - COUNT(*) * cs.q_den AS score
       |  FROM tk CROSS JOIN cs
       |  LEFT JOIN model m ON m.lang = cs.cls AND m.token = tk.token
       |  WHERE tk.is_test
       |  GROUP BY tk.doc_id, tk.lang, cs.cls, cs.q_prior, cs.q_den)""".stripMargin


  private[queries] val sqlKmeansCtes: String =
    s"""qq AS (SELECT vec_id, qv FROM q),
       |dims AS (SELECT unnest(generate_series(1,
       |    (SELECT max(len(qv)) FROM qq))) AS i),
       |c0 AS (SELECT vec_id AS cell, qv AS cv FROM qq
       |  WHERE vec_id < $KmeansK),
       |s1 AS (SELECT v.vec_id, c.cell,
       |    list_sum(list_transform(generate_series(1, len(v.qv)),
       |      i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS d2
       |  FROM qq v, c0 c),
       |b1 AS (SELECT vec_id, MIN(d2) AS d2 FROM s1 GROUP BY 1),
       |a1 AS (SELECT s1.vec_id, s1.d2, MIN(s1.cell) AS cell
       |  FROM s1 JOIN b1 ON s1.vec_id = b1.vec_id AND s1.d2 = b1.d2
       |  GROUP BY 1, 2),
       |u1 AS (SELECT a1.cell, i AS j, SUM(qq.qv[i]) AS sx, COUNT(*) AS n
       |  FROM a1 JOIN qq ON a1.vec_id = qq.vec_id, dims
       |  WHERE i <= len(qq.qv) GROUP BY 1, 2),
       |c1 AS (SELECT cell,
       |    list((sx - ((sx % n) + n) % n) // n ORDER BY j) AS cv
       |  FROM u1 GROUP BY 1),
       |s2 AS (SELECT v.vec_id, c.cell,
       |    list_sum(list_transform(generate_series(1, len(v.qv)),
       |      i -> (v.qv[i] - c.cv[i]) * (v.qv[i] - c.cv[i]))) AS d2
       |  FROM qq v, c1 c),
       |b2 AS (SELECT vec_id, MIN(d2) AS d2 FROM s2 GROUP BY 1),
       |a2 AS (SELECT s2.vec_id, s2.d2, MIN(s2.cell) AS cell
       |  FROM s2 JOIN b2 ON s2.vec_id = b2.vec_id AND s2.d2 = b2.d2
       |  GROUP BY 1, 2)""".stripMargin


  // The p33 IVF-bucketed kNN-graph chain, shared by the p33 and p96
  // oracles. Prepend WITH; readers get `r` (vec_id, nbr_id, sim, rnk).
  private[queries] val sqlP33Chain: String =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
      |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
      |  FROM n WHERE vec_id < 16),
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
      |s AS (
      |  SELECT x.vec_id, y.vec_id AS nbr_id,
      |    round(list_sum(list_transform(generate_series(1, len(x.v)),
      |      i -> x.v[i] * y.v[i])) / (x.nrm * y.nrm), 6) AS sim
      |  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id <> y.vec_id),
      |r AS (SELECT vec_id, nbr_id, sim,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
      |    ORDER BY sim DESC, nbr_id) AS INT) AS rnk FROM s)""".stripMargin


  // p13's full oracle text, shared with p49 (which text-verifies p13's
  // embedding-bucketed candidate pairs).
  private[queries] val sqlP13: String =
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
      |  ${sqlSignBucket("v", 4)} AS bucket
      |  FROM e)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_sum(list_transform(generate_series(1, len(a.v)),
      |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) AS sim
      |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE round(list_sum(list_transform(generate_series(1, len(a.v)),
      |    i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 6) >= 0.40""".stripMargin


  // Connected-component labels over p02's pair graph (transitive closure
  // + min-label per component) — the cluster CTE shared by the p32 and
  // p41 oracles. Callers prepend WITH RECURSIVE and read `lbl`.
  private[queries] val sqlClusterLabels: String =
    s"""p AS ($sqlP02),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM p
       |  UNION ALL SELECT doc_b, doc_a FROM p),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |lbl AS (
       |  SELECT src AS doc_id, least(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src)""".stripMargin


  val oracleSql: Map[String, String] = oracleBase +
    // the health report's oracle IS the five sub-oracles verbatim,
    // each scoped inside its own parenthesized subquery (DuckDB scopes
    // a nested WITH locally, so their CTE names cannot collide) — the
    // composite can never drift from the checks it summarizes
    ("p110_health_report" ->
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
         |SELECT 'feed_anomaly_cells' AS "check", v AS value,
         |  0.0 AS threshold, v > 0.0 AS alarm FROM v1
         |UNION ALL SELECT 'source_drift_psi_max', v, 0.2, v > 0.2 FROM v2
         |UNION ALL SELECT 'embedding_drift_psi', v, 0.2, v > 0.2 FROM v3
         |UNION ALL SELECT 'dedup_index_recall', v, 0.8, v < 0.8 FROM v4
         |UNION ALL SELECT 'index_orphans', v, 0.0, v > 0.0 FROM v5
         |UNION ALL SELECT 'cusum_drift_alarms', v, 0.0, v > 0.0 FROM v6
         |UNION ALL SELECT 'psi_window_alarms', v, 0.0, v > 0.0 FROM v7"""
        .stripMargin) +
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
    ("p114_run_strip" ->
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
         |FROM fin""".stripMargin) +
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


  private[queries] lazy val oracleBase: Map[String, String] = Map(
    // rebuilds each image row's bytes from the text's hex directly; a
    // byte-order, stride, offset, or row-flip bug on the Spark side
    // (which PARSES them back out of the composed BMP) flips the hash
    "p61_bmp_real_bytes" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(4 + doc_id % 3 AS INT) AS width,
        |    CAST(2 + doc_id % 2 AS INT) AS height,
        |    lower(hex(text)) AS hx FROM documents),
        |px AS (SELECT doc_id, width, height, width*3 AS rowbytes,
        |    substr(hx, 1, height*width*6)
        |      || repeat('0', greatest(0, height*width*6 - len(hx)))
        |      AS pixhex
        |  FROM p),
        |rws AS (SELECT doc_id, width, height, rowbytes,
        |    CAST(i AS INT) AS img_row,
        |    substr(pixhex, i*rowbytes*2 + 1, rowbytes*2) AS rowhex
        |  FROM px, unnest(generate_series(0, height-1)) u(i)),
        |b AS (SELECT doc_id, img_row, width, height, rowbytes,
        |    CAST('0x' || substr(rowhex, j*2+1, 2) AS BIGINT) AS bv
        |  FROM rws, unnest(generate_series(0, rowbytes-1)) v(j))
        |SELECT doc_id, img_row, '424d' AS magic, width, height,
        |  CAST(24 AS INT) AS bpp,
        |  round(CAST(SUM(bv) AS DOUBLE) / rowbytes, 6) AS row_mean
        |FROM b GROUP BY doc_id, img_row, width, height, rowbytes""".stripMargin,
    // the ImageIO decode must agree with the mean computed straight from
    // the text bytes that became the pixels (padding excluded): the real
    // codec's stride/row-flip/channel handling is checked against pure SQL
    "p68_bmp_imageio_decode" ->
      """WITH p AS (SELECT doc_id,
        |    CAST(4 + doc_id % 3 AS INT) AS width,
        |    CAST(2 + doc_id % 2 AS INT) AS height,
        |    lower(hex(text)) AS hx FROM documents),
        |px AS (SELECT doc_id, width, height, width*3*height AS npix,
        |    substr(hx, 1, height*width*6)
        |      || repeat('0', greatest(0, height*width*6 - len(hx)))
        |      AS pixhex
        |  FROM p),
        |b AS (SELECT doc_id, width, height, npix,
        |    CAST('0x' || substr(pixhex, j*2+1, 2) AS BIGINT) AS bv
        |  FROM px, unnest(generate_series(0, npix-1)) v(j))
        |SELECT doc_id, width, height,
        |  round(CAST(SUM(bv) AS DOUBLE) / npix, 6) AS mean_pixel
        |FROM b GROUP BY doc_id, width, height, npix""".stripMargin,
    // AudioSystem's decoded stream must return exactly the text's UTF-8
    // bytes as unsigned 8-bit samples, and its AudioFormat must report
    // the per-doc sample rate the WAV header declared
    "p69_wav_audio_decode" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
        |    lower(hex(text)) AS hx FROM documents),
        |b AS (SELECT doc_id,
        |    CAST('0x' || substr(hx, j*2+1, 2) AS BIGINT) AS bv
        |  FROM d, unnest(generate_series(0, len(hx)//2 - 1)) v(j)),
        |t AS (SELECT doc_id, SUM(bv) AS s, COUNT(*) AS cnt
        |  FROM b GROUP BY doc_id)
        |SELECT d.doc_id, d.sample_rate, CAST(1 AS INT) AS channels,
        |  CAST(8 AS INT) AS bits,
        |  CAST(coalesce(t.cnt, 0) AS BIGINT) AS n_samples,
        |  round(CAST(t.s AS DOUBLE) / t.cnt, 6) AS mean_sample
        |FROM d LEFT JOIN t ON d.doc_id = t.doc_id""".stripMargin,
    // the exact twin of the sketch-powered two-phase query: MG
    // guarantees every >= n/128 token reaches the recount, so plain
    // GROUP BY ... HAVING is the full answer
    "p70_heavy_hitters" ->
      s"""WITH tk AS (SELECT unnest($sqlToks) AS token FROM documents),
         |tot AS (SELECT COUNT(*) AS n FROM tk)
         |SELECT token, COUNT(*) AS cnt
         |FROM tk, tot
         |GROUP BY token, tot.n
         |HAVING COUNT(*) * $HhDen >= tot.n""".stripMargin,
    // the naive-Bayes replay: identical 16-fractional-bit quantized-log
    // scoring (sqlQlog2 twin of qlog2), identical smoothing, identical
    // argmax tiebreak — the confusion census must match exactly
    "p71_nb_classifier" ->
      s"""WITH $sqlNbScoredCtes,
         |pred AS (SELECT actual, cls FROM (
         |    SELECT actual, cls, ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cls) AS rn
         |    FROM sc) t WHERE rn = 1)
         |SELECT actual, cls AS predicted, COUNT(*) AS n_docs
         |FROM pred GROUP BY 1, 2""".stripMargin,
    "p103_nb_calibration" ->
      s"""WITH $sqlNbScoredCtes,
         |r AS (SELECT doc_id, actual, cls, score,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, cls) AS rn
         |  FROM sc),
         |pd AS (SELECT doc_id,
         |    MIN(CASE WHEN rn = 1 THEN cls END) AS predicted,
         |    MIN(actual) AS actual,
         |    MAX(CASE WHEN rn = 1 THEN score END)
         |      - COALESCE(MAX(CASE WHEN rn = 2 THEN score END),
         |        MAX(CASE WHEN rn = 1 THEN score END)
         |          - ${(CalMaxBin + 1) * 65536L}) AS margin_q
         |  FROM r WHERE rn <= 2 GROUP BY doc_id)
         |SELECT CAST(least($CalMaxBin, margin_q // 65536) AS BIGINT) AS bin,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  round(CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
         |      AS DOUBLE) / COUNT(*), 6) AS accuracy
         |FROM pd GROUP BY 1""".stripMargin,
    // the recall replay: the p04-shape exact scan vs the p05-shape
    // sign-bucket search AND the p20-shape IVF-cell search — hit counts
    // are integers, so both recalls are exact
    "p72_ann_recall" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |  ${sqlSignBucket("v", AnnBits)} AS bucket
        |  FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, bucket
        |  FROM n WHERE vec_id < 20),
        |es AS (SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n, p WHERE vec_id <> probe_id),
        |ex AS (SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS rnk FROM es) t WHERE rnk <= 3),
        |lss AS (SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n JOIN p USING (bucket) WHERE vec_id <> probe_id),
        |ls AS (SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS rnk FROM lss) t WHERE rnk <= 3),
        |pk AS (SELECT probe_id, pv, pnrm,
        |    unnest(list_prepend(bucket,
        |      list_transform(generate_series(1, $AnnBits), i ->
        |        substr(bucket, 1, CAST(i - 1 AS INT)) ||
        |        (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1'
        |          THEN '0' ELSE '1' END) ||
        |        substr(bucket, CAST(i + 1 AS INT), CAST($AnnBits - i AS INT)))))
        |      AS bucket
        |  FROM p),
        |mss AS (SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n JOIN pk USING (bucket) WHERE vec_id <> probe_id),
        |ms AS (SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS rnk FROM mss) t WHERE rnk <= 3),
        |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id < 16),
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
        |ip AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, cell
        |  FROM a WHERE vec_id < 20),
        |ivs AS (SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM a JOIN ip USING (cell) WHERE vec_id <> probe_id),
        |iv AS (SELECT probe_id, vec_id FROM (
        |  SELECT probe_id, vec_id, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS rnk FROM ivs) t WHERE rnk <= 3)
        |SELECT ex.probe_id,
        |  CAST(SUM(CASE WHEN ls.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_hits_lsh,
        |  round(SUM(CASE WHEN ls.vec_id IS NULL THEN 0 ELSE 1 END) / 3.0, 6)
        |    AS recall_lsh,
        |  CAST(SUM(CASE WHEN ms.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_hits_mp,
        |  round(SUM(CASE WHEN ms.vec_id IS NULL THEN 0 ELSE 1 END) / 3.0, 6)
        |    AS recall_mp,
        |  CAST(SUM(CASE WHEN iv.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_hits_ivf,
        |  round(SUM(CASE WHEN iv.vec_id IS NULL THEN 0 ELSE 1 END) / 3.0, 6)
        |    AS recall_ivf
        |FROM ex
        |  LEFT JOIN ls
        |    ON ls.probe_id = ex.probe_id AND ls.vec_id = ex.vec_id
        |  LEFT JOIN ms
        |    ON ms.probe_id = ex.probe_id AND ms.vec_id = ex.vec_id
        |  LEFT JOIN iv
        |    ON iv.probe_id = ex.probe_id AND iv.vec_id = ex.vec_id
        |GROUP BY ex.probe_id""".stripMargin,
    // the perplexity replay: identical bigram LM, identical qlog2
    // surprisal, identical value-histogram tercile cutoffs
    "p73_perplexity_buckets" ->
      s"""WITH d AS (SELECT doc_id, text,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_test
         |  FROM documents),
         |tk AS (SELECT doc_id, is_test, $sqlToks AS t FROM d),
         |bg AS (SELECT doc_id, is_test, t[i] AS prev, t[i + 1] AS cur
         |  FROM (SELECT doc_id, is_test, t,
         |    unnest(generate_series(1, len(t) - 1)) AS i
         |    FROM tk WHERE len(t) >= 2)),
         |model AS (SELECT prev, cur, COUNT(*) AS cnt
         |  FROM bg WHERE NOT is_test GROUP BY 1, 2),
         |ctx AS (SELECT prev, CAST(SUM(cnt) AS BIGINT) AS ctx
         |  FROM model GROUP BY 1),
         |vs AS (SELECT COUNT(DISTINCT tok) AS v FROM
         |  (SELECT unnest($sqlToks) AS tok FROM d WHERE NOT is_test)),
         |sc AS (SELECT bg.doc_id,
         |    CAST(SUM(${sqlQlog2("COALESCE(ctx.ctx, 0) + vs.v")}
         |      - ${sqlQlog2("COALESCE(m.cnt, 0) + 1")}) AS BIGINT) AS bits_q,
         |    COUNT(*) AS nb
         |  FROM bg LEFT JOIN model m
         |      ON m.prev = bg.prev AND m.cur = bg.cur
         |    LEFT JOIN ctx ON ctx.prev = bg.prev, vs
         |  WHERE bg.is_test GROUP BY bg.doc_id),
         |sp AS (SELECT doc_id, bits_q // nb AS bpt_q FROM sc),
         |hist AS (SELECT bpt_q, COUNT(*) AS n FROM sp GROUP BY 1),
         |cum AS (SELECT bpt_q,
         |    SUM(n) OVER (ORDER BY bpt_q ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM hist),
         |tot AS (SELECT COUNT(*) AS n_docs FROM sp),
         |cuts AS (SELECT
         |    MIN(CASE WHEN cum * 3 >= n_docs THEN bpt_q END) AS c1,
         |    MIN(CASE WHEN cum * 3 >= 2 * n_docs THEN bpt_q END) AS c2
         |  FROM cum, tot)
         |SELECT CASE WHEN bpt_q <= c1 THEN 'head'
         |    WHEN bpt_q <= c2 THEN 'middle' ELSE 'tail' END AS bucket,
         |  COUNT(*) AS n_docs, MIN(bpt_q) AS min_bpt_q,
         |  MAX(bpt_q) AS max_bpt_q, CAST(SUM(bpt_q) AS BIGINT) AS sum_bpt_q
         |FROM sp, cuts GROUP BY 1""".stripMargin,
    // the BM25 replay: identical scaled-integer Okapi arithmetic
    // (// is DuckDB's BIGINT floor division, the ldiv twin)
    "p74_bm25_retrieval" ->
      s"""WITH tkl AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |tf AS (SELECT doc_id, token, COUNT(*) AS tf
         |  FROM (SELECT doc_id, t[i] || ' ' || t[i + 1] AS token
         |    FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, len(t) - 1)) AS i
         |      FROM tkl WHERE len(t) >= 2))
         |  GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
         |  FROM tf GROUP BY 1),
         |st AS (SELECT COUNT(*) AS d_docs, CAST(SUM(dl) AS BIGINT) AS t_toks
         |  FROM dl),
         |dfx AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         |qt AS (SELECT tf.doc_id AS probe_id, tf.token,
         |    ${sqlQlog2("st.d_docs + 1")} - ${sqlQlog2("dfx.df")} AS idf_q,
         |    st.d_docs, st.t_toks
         |  FROM tf JOIN dfx USING (token), st
         |  WHERE tf.doc_id < 10 AND dfx.df * 20 <= st.d_docs),
         |cd AS (SELECT qt.probe_id, tf.doc_id,
         |    (qt.idf_q * tf.tf * 144179)
         |      // (tf.tf * 65536 + (3 * 65536
         |        + 9 * ((dl.dl * 65536 * qt.d_docs) // qt.t_toks)) // 10)
         |      AS term_q
         |  FROM qt JOIN tf USING (token) JOIN dl ON dl.doc_id = tf.doc_id
         |  WHERE tf.doc_id <> qt.probe_id),
         |sc AS (SELECT probe_id, doc_id, CAST(SUM(term_q) AS BIGINT) AS score_q
         |  FROM cd GROUP BY 1, 2),
         |r AS (SELECT probe_id, doc_id, score_q,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
         |    ORDER BY score_q DESC, doc_id) AS INT) AS rnk FROM sc)
         |SELECT probe_id, doc_id, rnk, score_q FROM r WHERE rnk <= 10""".stripMargin,
    "p75_span_strip" ->
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
         |dr AS (SELECT doc_id, list(j) AS drop_j
         |  FROM sp JOIN c USING (hv)
         |  WHERE cnt > 1 AND pos <> keeper GROUP BY doc_id),
         |fin AS (SELECT b.doc_id, b.n_spans,
         |    coalesce(dr.drop_j, CAST([] AS BIGINT[])) AS dj,
         |    flatten(list_transform(
         |        list_filter(generate_series(1, b.n_spans),
         |          j -> NOT list_contains(
         |            coalesce(dr.drop_j, CAST([] AS BIGINT[])), j)),
         |        j -> b.t[(j-1)*$SpanW+1:j*$SpanW]))
         |      || b.t[b.n_spans*$SpanW+1:b.n] AS clean
         |  FROM base b LEFT JOIN dr ON b.doc_id = dr.doc_id)
         |SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
         |  CAST(len(dj) AS BIGINT) AS n_dropped,
         |  CAST(len(clean) AS BIGINT) AS n_tokens_clean,
         |  md5(coalesce(array_to_string(clean, ' '), '')) AS clean_md5
         |FROM fin""".stripMargin,
    "p76_gopher_rules" -> {
      val stopSum = Stopwords
        .map(w => s"CASE WHEN list_contains(t, '$w') THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH tk AS (SELECT doc_id, $sqlToks AS t,
         |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters
         |  FROM documents),
         |m AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words, n_letters,
         |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |    CAST($stopSum AS BIGINT) AS n_stop
         |  FROM tk),
         |f AS (SELECT doc_id, n_words,
         |    CAST(CASE WHEN n_words BETWEEN 50 AND 100000
         |      THEN 1 ELSE 0 END AS INT) AS r_words,
         |    CAST(CASE WHEN n_letters >= 3 * n_words
         |        AND n_letters <= 10 * n_words
         |      THEN 1 ELSE 0 END AS INT) AS r_mean_len,
         |    CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INT) AS r_stop,
         |    CAST(CASE WHEN (n_words - n_distinct) * 100 <= n_words * 55
         |      THEN 1 ELSE 0 END AS INT) AS r_dup
         |  FROM m)
         |SELECT doc_id, n_words, r_words, r_mean_len, r_stop, r_dup,
         |  CAST(r_words * r_mean_len * r_stop * r_dup AS INT) AS keep
         |FROM f""".stripMargin
    },
    "p78_curation_funnel" -> {
      val stopSum = Stopwords
        .map(w => s"CASE WHEN list_contains(t, '$w') THEN 1 ELSE 0 END")
        .mkString(" + ")
      def census(no: Int, name: String, src: String) =
        s"""SELECT CAST($no AS INT) AS stage_no, '$name' AS stage,
           |  COUNT(*) AS n_docs,
           |  CAST(coalesce(SUM(n_words), 0) AS BIGINT) AS n_tokens
           |FROM $src""".stripMargin
      s"""WITH w AS (SELECT doc_id, text,
         |    CAST(len($sqlToks) AS BIGINT) AS n_words FROM documents),
         |gm AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_words,
         |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
         |    CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |    CAST($stopSum AS BIGINT) AS n_stop
         |  FROM (SELECT doc_id, text, $sqlToks AS t FROM documents)),
         |kept AS (SELECT w.* FROM w JOIN gm USING (doc_id)
         |  WHERE gm.n_words BETWEEN 50 AND 100000
         |    AND gm.n_letters >= 3 * gm.n_words
         |    AND gm.n_letters <= 10 * gm.n_words
         |    AND gm.n_stop >= 2
         |    AND (gm.n_words - gm.n_distinct) * 100 <= gm.n_words * 55),
         |rep0 AS (SELECT sha256(text) AS ch, MIN(doc_id) AS doc_id
         |  FROM kept GROUP BY 1),
         |reps AS (SELECT k.* FROM kept k JOIN rep0 r ON k.doc_id = r.doc_id),
         |${sqlMinhashBaseFrom("reps")},
         |$sqlCappedCand,
         |pairs AS (
         |  SELECT c.doc_a, c.doc_b,
         |    len(list_intersect(da.shset, db.shset)) AS ninter,
         |    da.n AS na, db.n AS nb
         |  FROM cand c
         |  JOIN sig da ON da.doc_id = c.doc_a
         |  JOIN sig db ON db.doc_id = c.doc_b),
         |dropd AS (SELECT DISTINCT doc_b AS doc_id FROM pairs
         |  WHERE CAST(ninter AS DOUBLE) / (na + nb - ninter)
         |    >= $JaccardThreshold),
         |near AS (SELECT r.* FROM reps r
         |  LEFT JOIN dropd d ON r.doc_id = d.doc_id WHERE d.doc_id IS NULL)
         |${census(0, "raw", "w")}
         |UNION ALL ${census(1, "gopher_rules", "kept")}
         |UNION ALL ${census(2, "exact_dedup", "reps")}
         |UNION ALL ${census(3, "near_dedup", "near")}""".stripMargin
    },
    "p77_dsir_weights" ->
      s"""WITH g AS (SELECT doc_id, is_target,
         |    ${sqlH60("t[i] || ' ' || t[i + 1]")} % $DsirBuckets AS f
         |  FROM (SELECT doc_id, lang = 'en' AS is_target, t,
         |      unnest(generate_series(1, len(t) - 1)) AS i
         |    FROM (SELECT doc_id, lang, $sqlToks AS t FROM documents)
         |    WHERE len(t) >= 2)),
         |cr AS (SELECT f, COUNT(*) AS cr FROM g GROUP BY 1),
         |ct AS (SELECT f, COUNT(*) AS ct FROM g WHERE is_target GROUP BY 1),
         |feat AS (SELECT cr.f,
         |    ${sqlQlog2("coalesce(ct.ct, 0) + 1")}
         |      - ${sqlQlog2("cr.cr + 1")} AS delta_q
         |  FROM cr LEFT JOIN ct ON cr.f = ct.f),
         |tot AS (SELECT COUNT(*) AS r_tot,
         |    CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
         |      AS t_tot FROM g),
         |sc AS (SELECT doc_id,
         |    CAST(MAX(CASE WHEN is_target THEN 1 ELSE 0 END) AS INT)
         |      AS is_target,
         |    COUNT(*) AS n_grams, CAST(SUM(delta_q) AS BIGINT) AS sum_delta
         |  FROM g JOIN feat USING (f) GROUP BY doc_id)
         |SELECT doc_id, is_target, CAST(n_grams AS BIGINT) AS n_grams,
         |  sum_delta + n_grams * (${sqlQlog2(s"r_tot + $DsirBuckets")}
         |    - ${sqlQlog2(s"t_tot + $DsirBuckets")}) AS w_q,
         |  CAST(CASE WHEN sum_delta + n_grams
         |      * (${sqlQlog2(s"r_tot + $DsirBuckets")}
         |        - ${sqlQlog2(s"t_tot + $DsirBuckets")}) > 0
         |    THEN 1 ELSE 0 END AS INT) AS keep
         |FROM sc, tot""".stripMargin,
    "p60_pack_whole_docs" ->
      s"""WITH n AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n
         |  FROM documents),
         |c AS (SELECT doc_id, n, SUM(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM n),
         |g AS (SELECT CAST((cum-n)//$ShardTokens AS BIGINT) AS pack,
         |    COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS n_tokens,
         |    MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
         |    MAX(cum) AS end_cum
         |  FROM c GROUP BY 1)
         |SELECT pack, n_docs, n_tokens, first_doc, last_doc,
         |  CAST(greatest(0, end_cum - (pack+1)*$ShardTokens) AS BIGINT)
         |    AS overflow_tokens
         |FROM g""".stripMargin,
    "p67_temperature_mix" ->
      s"""WITH dl AS (SELECT doc_id, lang FROM documents),
         |bl AS (SELECT lang, COUNT(*) AS n_in FROM dl GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS n_tot FROM dl),
         |sc AS (SELECT lang, n_in, n_tot,
         |    sqrt(CAST(n_in AS DOUBLE) / CAST(n_tot AS DOUBLE)) AS s
         |  FROM bl, tot),
         |z AS (SELECT list_reduce(list(s ORDER BY lang), (a, b) -> a + b)
         |    AS z FROM sc),
         |rates AS (SELECT lang, n_in, s / z AS q,
         |    least(1.0, ((s / z) * floor(CAST(n_tot AS DOUBLE) / 2.0))
         |      / CAST(n_in AS DOUBLE)) AS keep_rate
         |  FROM sc, z),
         |kept AS (SELECT d.lang, COUNT(*) AS n_kept
         |  FROM dl d JOIN rates r ON d.lang = r.lang
         |  WHERE ${sqlH60("'tmix:' || CAST(doc_id AS VARCHAR)")} % $MixScale
         |    < CAST(floor(r.keep_rate * $MixScale.0) AS BIGINT)
         |  GROUP BY 1)
         |SELECT r.lang, r.n_in, round(r.q, 6) AS target_share,
         |  round(r.keep_rate, 6) AS keep_rate,
         |  coalesce(k.n_kept, 0) AS n_kept
         |FROM rates r LEFT JOIN kept k ON r.lang = k.lang""".stripMargin,
    "p65_incremental_neardup" ->
      s"""WITH $sqlMinhashBase,
         |capped AS (
         |  SELECT doc_id, band, bkey FROM (
         |    SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bsz
         |    FROM bands) t WHERE bsz <= $MaxBucket),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
         |  FROM capped a JOIN capped b
         |    ON a.band = b.band AND a.bkey = b.bkey
         |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0),
         |j AS (
         |  SELECT c.new_id, c.old_id,
         |    CAST(len(list_intersect(da.shset, db.shset)) AS DOUBLE)
         |      / (da.n + db.n - len(list_intersect(da.shset, db.shset)))
         |      AS jaccard
         |  FROM cand c
         |  JOIN sig da ON da.doc_id = c.new_id
         |  JOIN sig db ON db.doc_id = c.old_id)
         |SELECT new_id,
         |  CAST(COUNT(*) OVER (PARTITION BY new_id) AS BIGINT) AS n_dups,
         |  old_id AS best_old, jaccard AS best_jaccard
         |FROM j WHERE jaccard >= $JaccardThreshold
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY new_id
         |  ORDER BY jaccard DESC, old_id) = 1""".stripMargin,
    "p64_bpe_by_lang" -> {
      val round = (r: Int) => s"""
         |p$r AS (SELECT lang, l[i] AS a, l[i+1] AS b, SUM(freq) AS cnt
         |  FROM sym${r - 1}, UNNEST(generate_series(1, len(l)-1)) AS u(i)
         |  GROUP BY 1, 2, 3),
         |w$r AS (SELECT lang, a, b, cnt FROM p$r
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY cnt DESC, a, b) = 1),
         |sym$r AS (SELECT lang, freq,
         |    list_reduce(list_transform(l, s -> [s]), (acc, x) ->
         |      CASE WHEN acc[len(acc)] = a AND x[1] = b
         |           THEN list_concat(acc[1:len(acc)-1], [a || b])
         |           ELSE list_concat(acc, x) END) AS l
         |  FROM sym${r - 1} JOIN w$r USING (lang))"""
      val selects = (1 to BpeRounds).map(r =>
        s"""SELECT lang, $r AS round, a AS left_sym, b AS right_sym,
           |  a || b AS merged, CAST(cnt AS BIGINT) AS cnt FROM w$r"""
          .stripMargin).mkString("\nUNION ALL ")
      s"""WITH wf AS (
         |  SELECT lang, term AS w, COUNT(*) AS freq FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS term
         |    FROM documents)
         |  WHERE regexp_full_match(term, '[a-z]+') AND length(term) >= 2
         |  GROUP BY 1, 2),
         |sym0 AS (SELECT lang, freq, string_split(w, '') AS l FROM wf)"""
        .stripMargin +
        (1 to BpeRounds).map(r => "," + round(r).stripMargin).mkString +
        "\n" + selects
    },
    "p63_snapshot_diff" ->
      """WITH a AS (SELECT doc_id, lang, md5(text) AS h FROM documents
        |  WHERE doc_id % 7 <> 0),
        |b AS (SELECT doc_id, lang,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' updated'
        |             ELSE text END) AS h
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(a.lang, b.lang) AS lang,
        |  CASE WHEN a.h IS NULL THEN 'added'
        |       WHEN b.h IS NULL THEN 'removed'
        |       WHEN a.h <> b.h THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  COUNT(*) AS n_docs
        |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        |GROUP BY 1, 2""".stripMargin,
    "p62_bpe_merges" -> {
      val selects = (1 to BpeRounds).map(r =>
        s"""SELECT $r AS round, a AS left_sym, b AS right_sym,
           |  a || b AS merged, CAST(cnt AS BIGINT) AS cnt FROM w$r"""
          .stripMargin).mkString("\nUNION ALL ")
      sqlBpeChain(BpeRounds) + "\n" + selects
    },
    "p66_bpe_apply" ->
      (sqlBpeChain(BpeRounds) + s"""
         |SELECT COUNT(*) AS n_words,
         |  CAST(SUM(freq) AS BIGINT) AS n_occurrences,
         |  CAST(SUM(freq * length(w)) AS BIGINT) AS syms_before,
         |  CAST(SUM(freq * len(l)) AS BIGINT) AS syms_after,
         |  CAST(SUM(freq * length(w)) - SUM(freq * len(l)) AS BIGINT)
         |    AS syms_saved
         |FROM sym$BpeRounds""".stripMargin),
    "p59_shingle_vocab" ->
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS tk FROM documents),
         |sh AS (SELECT lang, array_to_string(tk[i:i+${ShingleW - 1}], ' ') AS shingle
         |       FROM t, unnest(generate_series(1, len(tk)-${ShingleW - 1})) AS u(i)),
         |c AS (SELECT lang, shingle, COUNT(*) AS cnt FROM sh GROUP BY 1, 2),
         |tot AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS n_shingles,
         |        COUNT(*) AS n_distinct FROM c GROUP BY 1),
         |top AS (SELECT lang, shingle AS top_shingle, cnt AS top_cnt,
         |        ROW_NUMBER() OVER (PARTITION BY lang
         |          ORDER BY cnt DESC, shingle) AS rn FROM c)
         |SELECT lang, n_shingles, n_distinct, top_shingle, top_cnt
         |FROM tot JOIN top USING (lang) WHERE rn = 1""".stripMargin,
    "p32_dup_clusters" ->
      s"""WITH RECURSIVE $sqlClusterLabels
         |SELECT doc_id, cluster_id,
         |  CAST(CASE WHEN cluster_id = doc_id THEN 1 ELSE 0 END
         |    AS INT) AS keep
         |FROM lbl""".stripMargin,
    "p41_cluster_reps" ->
      s"""WITH RECURSIVE $sqlClusterLabels,
         |tk AS (SELECT doc_id, len($sqlToks) AS n_tokens FROM documents),
         |r AS (SELECT l.cluster_id, l.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY l.cluster_id
         |      ORDER BY t.n_tokens DESC, l.doc_id ASC) AS rnk
         |  FROM lbl l JOIN tk t ON l.doc_id = t.doc_id)
         |SELECT cluster_id,
         |  MIN(CASE WHEN rnk = 1 THEN doc_id END) AS rep_doc,
         |  COUNT(*) AS n_members
         |FROM r GROUP BY cluster_id""".stripMargin,
    "p42_ann_quantized" ->
      s"""WITH $sqlQuantCtes,
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, qv AS qpv
        |  FROM q WHERE vec_id < 5),
        |c AS (
        |  SELECT probe_id, vec_id, pv, v, pnrm, nrm,
        |    CAST(list_sum(list_transform(generate_series(1, len(qpv)),
        |      i -> qpv[i] * qv[i])) AS BIGINT) AS qsim
        |  FROM q, p WHERE vec_id <> probe_id),
        |t AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY qsim DESC, vec_id ASC) AS qrnk FROM c),
        |r AS (
        |  SELECT probe_id, vec_id, qsim,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM t WHERE qrnk <= 20)
        |SELECT probe_id, vec_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id ASC) AS INT) AS rnk,
        |  sim, qsim
        |FROM r
        |QUALIFY rnk <= 5""".stripMargin,
    "p47_quantized_centroids" ->
      s"""WITH $sqlQuantCtes,
         |x AS (
         |  SELECT label, i, qv[i] AS cq, mns[i] AS mn, mxs[i] AS mx
         |  FROM q, sa, (SELECT unnest(generate_series(1,
         |    (SELECT max(len(qv)) FROM q))) AS i) dims
         |  WHERE i <= len(qv))
         |SELECT label, CAST(i - 1 AS INT) AS dim, COUNT(*) AS n,
         |  round(CAST(SUM(cq) AS DOUBLE) / COUNT(*), 6) AS centroid_q,
         |  round(MIN(mn) + (CAST(SUM(cq) AS DOUBLE) / COUNT(*) + 128.0)
         |    * (MIN(mx) - MIN(mn)) / 255.0, 6) AS centroid
         |FROM x GROUP BY label, i""".stripMargin,
    "p48_hist_quantiles" ->
      s"""WITH mm AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx,
         |    COUNT(*) AS n FROM documents),
         |hist AS (
         |  SELECT least(${HistBins - 1},
         |      (n_chars - mn) * $HistBins // (mx - mn + 1)) AS b,
         |    COUNT(*) AS c
         |  FROM documents, mm GROUP BY 1),
         |cdf AS (SELECT b, SUM(c) OVER (ORDER BY b) AS cum FROM hist),
         |p50 AS (SELECT MIN(b) AS p50_bin FROM cdf, mm WHERE cum * 2 >= n),
         |p90 AS (SELECT MIN(b) AS p90_bin FROM cdf, mm
         |  WHERE cum * 10 >= n * 9),
         |ex AS (SELECT round(quantile_cont(n_chars, 0.5), 4) AS p50_exact,
         |  round(quantile_cont(n_chars, 0.9), 4) AS p90_exact
         |  FROM documents)
         |SELECT n, mn, mx, p50_bin,
         |  round(mn + CAST(p50_bin + 1 AS DOUBLE)
         |    * CAST(mx - mn + 1 AS DOUBLE) / $HistBins.0, 4) AS p50_approx,
         |  p50_exact, p90_bin,
         |  round(mn + CAST(p90_bin + 1 AS DOUBLE)
         |    * CAST(mx - mn + 1 AS DOUBLE) / $HistBins.0, 4) AS p90_approx,
         |  p90_exact
         |FROM mm, p50, p90, ex""".stripMargin,
    "p43_vocab_oov" ->
      s"""WITH occ AS (
         |  SELECT doc_id, lang, source, unnest($sqlToks) AS term
         |  FROM documents),
         |dtf AS (SELECT doc_id, lang, source, term, COUNT(*) AS tf
         |  FROM occ GROUP BY 1, 2, 3, 4),
         |corpus AS (SELECT term, SUM(tf) AS cnt FROM dtf GROUP BY 1),
         |vocab AS (SELECT term FROM corpus
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC)
         |    <= $VocabTopK)
         |SELECT lang, source, COUNT(DISTINCT doc_id) AS n_docs,
         |  CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN v.term IS NULL THEN tf ELSE 0 END)
         |    AS BIGINT) AS n_oov,
         |  round(CAST(SUM(CASE WHEN v.term IS NULL THEN tf ELSE 0 END)
         |      AS DOUBLE)
         |    / CAST(SUM(tf) AS BIGINT), 6) AS oov_rate
         |FROM dtf d LEFT JOIN vocab v ON d.term = v.term
         |GROUP BY 1, 2""".stripMargin,
    "p45_diversity_score" ->
      s"""WITH ch AS (
         |  SELECT doc_id, c FROM (
         |    SELECT doc_id, ch, COUNT(*) AS c FROM (
         |      SELECT doc_id, unnest(string_split(text, '')) AS ch
         |      FROM documents) WHERE ch <> '' GROUP BY 1, 2)),
         |cd AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_ch,
         |    CAST(SUM(c * c) AS BIGINT) AS s2_ch
         |  FROM ch GROUP BY 1),
         |tk AS (
         |  SELECT doc_id, c FROM (
         |    SELECT doc_id, term, COUNT(*) AS c FROM (
         |      SELECT doc_id, unnest($sqlToks) AS term
         |      FROM documents) GROUP BY 1, 2)),
         |td AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
         |    CAST(SUM(c * c) AS BIGINT) AS s2_tok
         |  FROM tk GROUP BY 1)
         |SELECT cd.doc_id, n_ch,
         |  round(1.0 - CAST(s2_ch AS DOUBLE) / CAST(n_ch * n_ch AS DOUBLE), 6)
         |    AS char_simpson,
         |  n_tok,
         |  round(1.0 - CAST(s2_tok AS DOUBLE) / CAST(n_tok * n_tok AS DOUBLE),
         |    6) AS token_simpson
         |FROM cd JOIN td ON cd.doc_id = td.doc_id""".stripMargin,
    "p46_mixture_sample" ->
      s"""WITH dt AS (
         |  SELECT doc_id, source, CAST(len($sqlToks) AS BIGINT) AS n_tok
         |  FROM documents),
         |bysrc AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tok,
         |    COUNT(*) AS n_docs_in
         |  FROM dt GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS tot_tok FROM dt),
         |rates AS (
         |  SELECT source, n_docs_in,
         |    least(1.0, $MixCap /
         |      (CAST(src_tok AS DOUBLE) / CAST(tot_tok AS DOUBLE)))
         |      AS keep_rate
         |  FROM bysrc, tot),
         |kept AS (
         |  SELECT d.source, COUNT(*) AS n_docs_kept,
         |    CAST(SUM(d.n_tok) AS BIGINT) AS n_tok_kept
         |  FROM dt d JOIN rates r ON d.source = r.source
         |  WHERE ${sqlH60("'mix:' || CAST(doc_id AS VARCHAR)")} % $MixScale
         |    < CAST(floor(r.keep_rate * $MixScale.0) AS BIGINT)
         |  GROUP BY 1)
         |SELECT r.source, round(r.keep_rate, 6) AS keep_rate, r.n_docs_in,
         |  coalesce(k.n_docs_kept, 0) AS n_docs_kept,
         |  coalesce(k.n_tok_kept, 0) AS n_tok_kept
         |FROM rates r LEFT JOIN kept k ON r.source = k.source""".stripMargin,
    "p44_bloom_prefilter" ->
      s"""WITH d AS (SELECT doc_id, sha256(text) AS content_hash,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_new
         |  FROM documents),
         |existing AS (SELECT DISTINCT content_hash FROM d WHERE NOT is_new),
         |seeds AS (SELECT unnest(generate_series(0, ${BloomK - 1})) AS k),
         |bits AS (SELECT DISTINCT
         |    ${sqlH60Seeded("k", "content_hash")} % $BloomBits AS pos
         |  FROM existing, seeds),
         |pr AS (SELECT doc_id, content_hash,
         |    ${sqlH60Seeded("k", "content_hash")} % $BloomBits AS pos
         |  FROM d, seeds WHERE is_new),
         |verdicts AS (
         |  SELECT doc_id, content_hash,
         |    CAST(CASE WHEN SUM(CASE WHEN b.pos IS NULL THEN 1 ELSE 0 END)
         |      = 0 THEN 1 ELSE 0 END AS INT) AS bloom_hit
         |  FROM pr LEFT JOIN bits b ON pr.pos = b.pos
         |  GROUP BY 1, 2)
         |SELECT h.doc_id, h.bloom_hit,
         |  CAST(CASE WHEN e.content_hash IS NULL THEN 0 ELSE 1 END
         |    AS INT) AS is_dup
         |FROM verdicts h
         |LEFT JOIN existing e ON h.content_hash = e.content_hash""".stripMargin,
    "p01_exact_dedup" ->
      """SELECT sha256(text) AS content_hash, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS dup_cnt
        |FROM documents GROUP BY 1""".stripMargin,
    "p02_minhash_neardup" -> sqlP02,
    "p03_simhash_fingerprint" ->
      s"""WITH tok AS (
         |  SELECT doc_id, ${sqlH60("tok")} AS hv FROM (
         |    SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS tok
         |    FROM (SELECT doc_id, $sqlToks AS t FROM documents))),
         |votes AS (
         |  SELECT doc_id, j, CAST(SUM(2 * ((hv >> j) & 1) - 1) AS BIGINT) AS s
         |  FROM tok, (SELECT unnest(generate_series(0, 31)) AS j) js
         |  GROUP BY doc_id, j)
         |SELECT doc_id, CAST(SUM(CASE WHEN s >= 0
         |  THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
         |FROM votes GROUP BY doc_id""".stripMargin,
    "p04_ann_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm
        |  FROM n WHERE vec_id < 5),
        |s AS (
        |  SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n, p WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rnk FROM s)
        |SELECT probe_id, vec_id, rnk, sim FROM r WHERE rnk <= 10""".stripMargin,
    "p05_ann_lsh_bucketed" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |  ${sqlSignBucket("v", AnnBits)} AS bucket
        |  FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, bucket
        |  FROM n WHERE vec_id < 20),
        |s AS (
        |  SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n JOIN p USING (bucket) WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rnk FROM s)
        |SELECT probe_id, vec_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "p106_perplexity_by_lang" ->
      s"""WITH d AS (SELECT doc_id, lang, text,
         |    ${sqlH60("CAST(doc_id AS VARCHAR)")} % 10 = 9 AS is_test
         |  FROM documents),
         |tk AS (SELECT doc_id, lang, is_test, $sqlToks AS t FROM d),
         |bg AS (SELECT doc_id, lang, is_test, t[i] AS prev, t[i + 1] AS cur
         |  FROM (SELECT doc_id, lang, is_test, t,
         |    unnest(generate_series(1, len(t) - 1)) AS i
         |    FROM tk WHERE len(t) >= 2)),
         |model AS (SELECT lang, prev, cur, COUNT(*) AS cnt
         |  FROM bg WHERE NOT is_test GROUP BY 1, 2, 3),
         |ctx AS (SELECT lang, prev, CAST(SUM(cnt) AS BIGINT) AS ctx
         |  FROM model GROUP BY 1, 2),
         |vs AS (SELECT lang, COUNT(DISTINCT tok) AS v FROM
         |  (SELECT lang, unnest($sqlToks) AS tok FROM d WHERE NOT is_test)
         |  GROUP BY 1),
         |sc AS (SELECT bg.doc_id, bg.lang,
         |    CAST(SUM(${sqlQlog2("COALESCE(ctx.ctx, 0) + vs.v")}
         |      - ${sqlQlog2("COALESCE(m.cnt, 0) + 1")}) AS BIGINT) AS bits_q,
         |    COUNT(*) AS nb
         |  FROM bg LEFT JOIN model m
         |      ON m.lang = bg.lang AND m.prev = bg.prev AND m.cur = bg.cur
         |    LEFT JOIN ctx ON ctx.lang = bg.lang AND ctx.prev = bg.prev
         |    JOIN vs ON vs.lang = bg.lang
         |  WHERE bg.is_test GROUP BY bg.doc_id, bg.lang),
         |sp AS (SELECT doc_id, lang, bits_q // nb AS bpt_q FROM sc),
         |hist AS (SELECT lang, bpt_q, COUNT(*) AS n FROM sp GROUP BY 1, 2),
         |cum AS (SELECT lang, bpt_q,
         |    SUM(n) OVER (PARTITION BY lang ORDER BY bpt_q
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM hist),
         |tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM sp GROUP BY 1),
         |cuts AS (SELECT cum.lang,
         |    MIN(CASE WHEN cum * 3 >= n_docs THEN bpt_q END) AS c1,
         |    MIN(CASE WHEN cum * 3 >= 2 * n_docs THEN bpt_q END) AS c2
         |  FROM cum JOIN tot ON tot.lang = cum.lang GROUP BY 1)
         |SELECT sp.lang,
         |  CASE WHEN bpt_q <= c1 THEN 'head'
         |    WHEN bpt_q <= c2 THEN 'middle' ELSE 'tail' END AS bucket,
         |  COUNT(*) AS n_docs, MIN(bpt_q) AS min_bpt_q,
         |  MAX(bpt_q) AS max_bpt_q
         |FROM sp JOIN cuts ON cuts.lang = sp.lang GROUP BY 1, 2""".stripMargin,
    "p109_decontam_release" ->
      s"""WITH sh AS (SELECT doc_id, unnest(${sqlShingles("t", ContamW)})
         |    AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |g AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g FROM sh),
         |ev AS (SELECT DISTINCT g FROM g WHERE doc_id % 29 = 7),
         |hit AS (SELECT DISTINCT doc_id FROM g
         |  WHERE doc_id % 29 <> 7 AND g IN (SELECT g FROM ev)),
         |tr AS (SELECT doc_id, CAST(len($sqlToks) AS BIGINT) AS n_toks
         |  FROM documents WHERE doc_id % 29 <> 7),
         |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens FROM tr),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens
         |  FROM tr WHERE doc_id NOT IN (SELECT doc_id FROM hit))
         |SELECT 'train_before' AS stage, n_docs, n_tokens FROM b
         |UNION ALL SELECT 'train_after', n_docs, n_tokens FROM a
         |UNION ALL SELECT 'dropped', b.n_docs - a.n_docs,
         |  b.n_tokens - a.n_tokens FROM b, a""".stripMargin,
    "p108_novelty_curve" ->
      s"""WITH sh AS (SELECT doc_id, unnest(${sqlShingles("t", ContamW)})
         |    AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents)),
         |gr AS (SELECT DISTINCT doc_id, ${sqlH60("shingle")} AS g FROM sh),
         |f AS (SELECT g, MIN(doc_id) AS first_doc FROM gr GROUP BY 1),
         |m AS (SELECT MAX(doc_id) + 1 AS m FROM gr)
         |SELECT (gr.doc_id * 10) // m AS decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_grams,
         |  CAST(SUM(CASE WHEN gr.doc_id = f.first_doc THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel,
         |  CAST((SUM(CASE WHEN gr.doc_id = f.first_doc THEN 1 ELSE 0 END)
         |    * 1000000) // COUNT(*) AS DOUBLE) / 1000000.0 AS novelty_frac
         |FROM gr JOIN f USING (g), m
         |GROUP BY 1""".stripMargin,
    "p107_padding_audit" ->
      s"""WITH l AS (SELECT doc_id,
         |    least(CAST(len($sqlToks) AS BIGINT), $PadCtx) AS len
         |  FROM documents),
         |a AS (SELECT len,
         |    (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // $PadBatch AS batch
         |  FROM l),
         |s AS (SELECT len,
         |    (ROW_NUMBER() OVER (ORDER BY len, doc_id) - 1) // $PadBatch
         |      AS batch
         |  FROM l),
         |ab AS (SELECT batch, COUNT(*) AS bsz, MAX(len) AS mx,
         |    SUM(len) AS tok FROM a GROUP BY 1),
         |sb AS (SELECT batch, COUNT(*) AS bsz, MAX(len) AS mx,
         |    SUM(len) AS tok FROM s GROUP BY 1)
         |SELECT 'arrival' AS strategy,
         |  CAST(COUNT(*) AS BIGINT) AS n_batches,
         |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
         |  CAST(SUM(bsz * mx - tok) AS BIGINT) AS padded_slots,
         |  CAST((SUM(bsz * mx - tok) * 1000000)
         |    // (SUM(bsz * mx - tok) + SUM(tok)) AS DOUBLE) / 1000000.0
         |    AS waste_frac
         |FROM ab
         |UNION ALL
         |SELECT 'length_sorted',
         |  CAST(COUNT(*) AS BIGINT),
         |  CAST(SUM(tok) AS BIGINT),
         |  CAST(SUM(bsz * mx - tok) AS BIGINT),
         |  CAST((SUM(bsz * mx - tok) * 1000000)
         |    // (SUM(bsz * mx - tok) + SUM(tok)) AS DOUBLE) / 1000000.0
         |FROM sb""".stripMargin,
    "p105_training_order" ->
      s"""WITH k AS (SELECT doc_id,
         |    ${sqlH60("'order:' || CAST(doc_id AS VARCHAR)")} AS hkey
         |  FROM documents),
         |r AS (SELECT doc_id,
         |    CAST(ROW_NUMBER() OVER (ORDER BY hkey, doc_id) - 1 AS BIGINT)
         |      AS step
         |  FROM k)
         |SELECT doc_id, step, step // $OrderBatch AS batch FROM r""".stripMargin,
    "p104_ann_multiprobe" ->
      s"""WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |  ${sqlSignBucket("v", AnnBits)} AS bucket
        |  FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, nrm AS pnrm, bucket
        |  FROM n WHERE vec_id < 20),
        |pk AS (SELECT probe_id, pv, pnrm,
        |    unnest(list_prepend(bucket,
        |      list_transform(generate_series(1, $AnnBits), i ->
        |        substr(bucket, 1, CAST(i - 1 AS INT)) ||
        |        (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1'
        |          THEN '0' ELSE '1' END) ||
        |        substr(bucket, CAST(i + 1 AS INT), CAST($AnnBits - i AS INT)))))
        |      AS bucket
        |  FROM p),
        |s AS (
        |  SELECT probe_id, vec_id,
        |    round(list_sum(list_transform(generate_series(1, len(pv)),
        |      i -> pv[i] * v[i])) / (pnrm * nrm), 6) AS sim
        |  FROM n JOIN pk USING (bucket) WHERE vec_id <> probe_id),
        |r AS (SELECT probe_id, vec_id, sim,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
        |    ORDER BY sim DESC, vec_id) AS INT) AS rnk FROM s)
        |SELECT probe_id, vec_id, rnk, sim FROM r WHERE rnk <= 3""".stripMargin,
    "p06_text_stats" ->
      s"""SELECT doc_id,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
         |    AS BIGINT) AS n_regex_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq,
         |  len(list_distinct(t)) / len(t) AS uniq_ratio,
         |  CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) / len(t)
         |    AS avg_tok_len,
         |  len(list_filter(t, x -> list_contains($sqlStops, x))) / len(t)
         |    AS stop_ratio,
         |  round((len(list_filter(t, x -> list_contains($sqlStops, x))) / len(t)
         |    + len(list_distinct(t)) / len(t)) / 2, 6) AS quality,
         |  CASE WHEN len(list_filter(t, x -> list_contains($sqlStops, x)))
         |    / len(t) >= 0.05 THEN 'en' ELSE 'unk' END AS lang_pred,
         |  md5(text) AS fingerprint
         |FROM (SELECT doc_id, text, $sqlToks AS t FROM documents)""".stripMargin,
    "p07_lang_profile" ->
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) / COUNT(*) AS avg_chars,
         |  CAST(SUM(len($sqlToks)) AS BIGINT) AS total_tokens
         |FROM documents GROUP BY lang, source""".stripMargin,
    "p08_multimodal_stub" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  lower(hex(encode(substr(text, 1, 4)))) AS magic,
        |  md5(text) AS digest,
        |  CAST(CEIL(octet_length(encode(text)) / 16.0) AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
    // DuckDB 1.0 lacks blob substr; the docs are ASCII so slicing the
    // varchar yields the same bytes (and the same md5) as the binary slice.
    "p58_wav_real_bytes" -> {
      // little-endian n-byte blob of a non-negative integer expression
      def le(v: String, nBytes: Int): String = {
        val h = s"lpad(hex($v), ${nBytes * 2}, '0')"
        "unhex(" + (0 until nBytes)
          .map(i => s"substr($h, ${(nBytes - 1 - i) * 2 + 1}, 2)")
          .mkString(" || ") + ")"
      }
      // byte value at 1-based byte position `pos` of hex string `ph`
      def b(pos: String): String =
        s"((strpos('0123456789ABCDEF', substr(ph, 2*($pos)-1, 1))-1)*16" +
          s" + strpos('0123456789ABCDEF', substr(ph, 2*($pos), 1))-1)"
      def leVal(start: Int): String =
        (0 until 4).map(i => s"${1L << (8 * i)}*${b((start + i).toString)}")
          .mkString(" + ")
      s"""WITH d AS (
         |  SELECT doc_id, encode(text) AS data,
         |    octet_length(encode(text)) AS len,
         |    CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS rate
         |  FROM documents),
         |p AS (
         |  SELECT doc_id,
         |    encode('RIFF') || ${le("len + 36", 4)} || encode('WAVE')
         |      || encode('fmt ') || ${le("16", 4)} || ${le("1", 2)}
         |      || ${le("1", 2)} || ${le("rate", 4)} || ${le("rate", 4)}
         |      || ${le("1", 2)} || ${le("8", 2)} || encode('data')
         |      || ${le("len", 4)} || data AS payload
         |  FROM d),
         |h AS (SELECT doc_id, hex(payload) AS ph FROM p),
         |hdr AS (SELECT doc_id, ph,
         |    lower(substr(ph, 1, 8)) AS riff_hex,
         |    lower(substr(ph, 17, 8)) AS wave_hex,
         |    CAST(${leVal(25)} AS INTEGER) AS sample_rate,
         |    CAST(${leVal(41)} AS INTEGER) AS data_len
         |  FROM h),
         |fr AS (SELECT doc_id, ph, riff_hex, wave_hex, sample_rate, data_len,
         |    CAST(u.k AS INT) AS frame_idx,
         |    CAST(LEAST(16, data_len - u.k*16) AS INT) AS frame_len
         |  FROM hdr,
         |    UNNEST(generate_series(0,
         |      CAST(CEIL(data_len/16.0) AS BIGINT)-1)) AS u(k))
         |SELECT doc_id, frame_idx, riff_hex, wave_hex, sample_rate,
         |  data_len, frame_len,
         |  round(CAST(list_aggregate(list_transform(
         |      generate_series(1, frame_len),
         |      j -> ${b("44 + frame_idx*16 + j")}), 'sum') AS DOUBLE)
         |    / frame_len, 6) AS mean_sample
         |FROM fr""".stripMargin
    },
    "p14_frame_sample" ->
      """SELECT doc_id, CAST(u.k AS INT) AS frame_idx,
        |  md5(substr(text, u.k*16+1, 16)) AS frame_md5,
        |  CAST(strlen(substr(text, u.k*16+1, 16)) AS INT) AS frame_len
        |FROM documents,
        |  UNNEST(generate_series(0,
        |    CAST(CEIL(strlen(text)/16.0) AS BIGINT)-1)) AS u(k)""".stripMargin,
    "p09_events_props" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  CAST(SUM(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
         |  ${sqlDsum("value")} AS sum_value,
         |  MIN(value) AS min_value, MAX(value) AS max_value
         |FROM events GROUP BY event_type""".stripMargin,
    "p10_events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         |  event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "p12_simhash_pairs" ->
      s"""WITH tok AS (
         |  SELECT doc_id, ${sqlH60("tok")} AS hv FROM (
         |    SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS tok
         |    FROM (SELECT doc_id, $sqlToks AS t FROM documents))),
         |votes AS (
         |  SELECT doc_id, j, CAST(SUM(2 * ((hv >> j) & 1) - 1) AS BIGINT) AS s
         |  FROM tok, (SELECT unnest(generate_series(0, 31)) AS j) js
         |  GROUP BY doc_id, j),
         |fp AS (
         |  SELECT doc_id, CAST(SUM(CASE WHEN s >= 0
         |    THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
         |  FROM votes GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, simhash, band, (simhash >> (band * 8)) & 255 AS bkey
         |  FROM fp, (SELECT unnest(generate_series(0, 3)) AS band) bs),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3""".stripMargin,
    "p13_cosine_neardup" -> sqlP13,
    "p49_semantic_neardup" ->
      s"""WITH pairs AS ($sqlP13),
         |sets AS (SELECT doc_id,
         |    list_distinct($sqlToks) AS tset FROM documents),
         |j AS (
         |  SELECT p.vec_a AS doc_a, p.vec_b AS doc_b, p.sim,
         |    len(list_intersect(a.tset, b.tset)) AS ninter,
         |    len(a.tset) AS na, len(b.tset) AS nb
         |  FROM pairs p
         |  JOIN sets a ON p.vec_a = a.doc_id
         |  JOIN sets b ON p.vec_b = b.doc_id)
         |SELECT doc_a, doc_b, sim,
         |  round(CAST(ninter AS DOUBLE) / CAST(na + nb - ninter AS DOUBLE),
         |    6) AS jaccard,
         |  CAST(CASE WHEN CAST(ninter AS DOUBLE)
         |      / CAST(na + nb - ninter AS DOUBLE) >= $JaccardThreshold
         |    THEN 1 ELSE 0 END AS INT) AS text_confirmed
         |FROM j""".stripMargin,
    "p50_interval_join_binned" ->
      s"""WITH ev AS (
         |  SELECT event_id, epoch_us(ts) AS ts_us, event_type FROM events),
         |p AS (SELECT event_id AS p_event_id, ts_us AS lo,
         |    ts_us + $IntervalW AS hi
         |  FROM ev WHERE event_type = 'purchase')
         |SELECT p_event_id, COUNT(*) AS n_overlap
         |FROM p JOIN ev ON ev.ts_us BETWEEN p.lo AND p.hi
         |GROUP BY 1""".stripMargin,
    "p51_lm_fluency" ->
      s"""WITH t AS (SELECT doc_id, $sqlToks AS t FROM documents),
         |pr AS (
         |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         |  FROM t, (SELECT unnest(generate_series(1, len(t) - 1)) AS i)),
         |uni AS (SELECT w1, COUNT(*) AS cu FROM pr GROUP BY 1),
         |bi AS (SELECT w1, w2, COUNT(*) AS cb FROM pr GROUP BY 1, 2),
         |per AS (
         |  SELECT pr.doc_id, COUNT(*) AS n_bigrams,
         |    SUM(CAST(length(bin(bi.cb)) - length(bin(uni.cu)) AS BIGINT))
         |      AS qsum
         |  FROM pr
         |  JOIN bi ON pr.w1 = bi.w1 AND pr.w2 = bi.w2
         |  JOIN uni ON pr.w1 = uni.w1
         |  GROUP BY 1)
         |SELECT d.doc_id, COALESCE(per.n_bigrams, 0) AS n_bigrams,
         |  round(CAST(qsum AS DOUBLE) / n_bigrams, 6) AS lm_score
         |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin,
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
         |grid AS (SELECT unnest(generate_series(0, ${KmeansK - 1})) AS cell),
         |f AS (SELECT g.cell,
         |    coalesce(cc.n_prev, 0) AS n_prev,
         |    coalesce(cc.n_next, 0) AS n_next
         |  FROM grid g LEFT JOIN cc USING (cell)),
         |tot AS (SELECT SUM(n_prev) AS tp, SUM(n_next) AS tn FROM f),
         |r AS (SELECT cell, n_prev, n_next,
         |    2 * n_next + 1 AS pn, 2 * tn + $KmeansK AS pd,
         |    2 * n_prev + 1 AS qn, 2 * tp + $KmeansK AS qd
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
    "p20_ann_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |n AS (SELECT vec_id, v,
        |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |c AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cnrm
        |  FROM n WHERE vec_id < 16),
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
      // found = the full p02 oracle restricted to sample-internal pairs;
      // truth = an INDEPENDENT exact all-pairs Jaccard over the sample's
      // distinct shingle-id sets (own CTE names, no reuse of p02's
      // internals beyond the shared tokenizer/shingle fragments)
      s"""WITH p AS ($sqlP02),
         |found AS (SELECT doc_a, doc_b FROM p
         |  WHERE doc_a % 2 = 0 AND doc_b % 2 = 0),
         |tsh AS (
         |  SELECT doc_id, unnest(${sqlShingles("t", ShingleW)}) AS shingle
         |  FROM (SELECT doc_id, $sqlToks AS t FROM documents
         |        WHERE doc_id % 2 = 0)),
         |tsig AS (SELECT doc_id,
         |    list(DISTINCT ${sqlH60("shingle")}) AS shset,
         |    len(shset) AS n
         |  FROM tsh GROUP BY doc_id),
         |truth AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM tsig a JOIN tsig b ON a.doc_id < b.doc_id
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
}
