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

/** First half of the DuckDB oracle twins plus every shared SQL
  * fragment they are generated from (the same declared constants as
  * the Spark side — one source, two engines, drift impossible).
  * Implementation module of [[Pipeline]]; [[PipelineOracles]] merges
  * [[oracleFirst]] with its own half into the full oracle map. Split
  * from the former monolith in round 12 with zero behavior change. */
trait PipelineOracleFragments extends PipelineReports {



  // DuckDB twins. Shared SQL fragments:
  private[queries] val sqlToks = "string_split(text, ' ')"

  /** The bm25Postings twin over `documents` restricted by `where`
    * ("" = whole corpus): one (token, doc_id, term_q) row per
    * impact-surviving posting, the complete scaled-integer Okapi term
    * precomputed — the same chain the p74 oracle inlines, stopped at
    * the posting instead of the probe ranking. Shared by p128's
    * staleness diff, which builds it twice over two corpus states. */
  private[queries] def sqlBm25Postings(where: String): String =
    s"""(WITH tkl AS (SELECT doc_id, $sqlToks AS t FROM documents $where),
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
       |idf AS (SELECT dfx.token,
       |    ${sqlQlog2("st.d_docs + 1")} - ${sqlQlog2("dfx.df")} AS idf_q
       |  FROM (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1) dfx, st
       |  WHERE dfx.df * 20 <= st.d_docs)
       |SELECT tf.token, tf.doc_id,
       |  (idf.idf_q * tf.tf * 144179)
       |    // (tf.tf * 65536 + (3 * 65536
       |      + 9 * ((dl.dl * 65536 * st.d_docs) // st.t_toks)) // 10)
       |    AS term_q
       |FROM tf JOIN idf USING (token) JOIN dl USING (doc_id), st)"""
      .stripMargin


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


  // `kk` mirrors [[PipelineVectors.kmeansK]]: max(floor, ceil(N/target))
  // via BIGINT ceil-division over the SAME relation the Spark side
  // counts — the corpus-scaled codebook stays bit-identical across
  // engines because K is a pure function of row count.
  //
  // The N×K distance scans (s1/s2) use the exact-integer identity
  // d2 = v·v + c·c − 2·v·c with DuckDB's VECTORIZED list_inner_product
  // instead of a per-pair list_transform lambda: the lambda form
  // evaluated ~612M interpreted 64-step closures at sf10 (>2300 s for
  // ONE assignment pass — the whole p100/p110/p117/p123/p125 timeout
  // family), the native form does the same arithmetic in ~200 s for
  // the full argmin. Exactness: qv entries are int8-range BIGINTs, so
  // every inner product is ≤ 64·128² ≈ 1.05M — exactly representable
  // in list_inner_product's DOUBLE regardless of summation order
  // (integer sums are order-independent), and the CAST back to the
  // lambda form's HUGEINT is value-identical (A/B-verified by EXCEPT
  // against the lambda form at sf10, 617k rows, 0 diffs).
  private[queries] val sqlKmeansCtes: String =
    s"""qq AS (SELECT vec_id, qv FROM q),
       |kk AS (SELECT greatest($KmeansK, (count(*) + ${KmeansCellTarget - 1})
       |    // $KmeansCellTarget) AS k FROM qq),
       |dims AS (SELECT unnest(generate_series(1,
       |    (SELECT max(len(qv)) FROM qq))) AS i),
       |c0 AS (SELECT vec_id AS cell, qv AS cv FROM qq
       |  WHERE vec_id < (SELECT k FROM kk)),
       |s1 AS (SELECT v.vec_id, c.cell,
       |    CAST(v.qsq + c.csq - 2 * list_inner_product(v.qv, c.cv)
       |      AS HUGEINT) AS d2
       |  FROM (SELECT vec_id, qv,
       |          list_inner_product(qv, qv) AS qsq FROM qq) v,
       |       (SELECT cell, cv,
       |          list_inner_product(cv, cv) AS csq FROM c0) c),
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
       |    CAST(v.qsq + c.csq - 2 * list_inner_product(v.qv, c.cv)
       |      AS HUGEINT) AS d2
       |  FROM (SELECT vec_id, qv,
       |          list_inner_product(qv, qv) AS qsq FROM qq) v,
       |       (SELECT cell, cv,
       |          list_inner_product(cv, cv) AS csq FROM c1) c),
       |b2 AS (SELECT vec_id, MIN(d2) AS d2 FROM s2 GROUP BY 1),
       |a2 AS (SELECT s2.vec_id, s2.d2, MIN(s2.cell) AS cell
       |  FROM s2 JOIN b2 ON s2.vec_id = b2.vec_id AND s2.d2 = b2.d2
       |  GROUP BY 1, 2)""".stripMargin


  // The p33 IVF-bucketed kNN-graph chain, shared by the p33 and p96
  // oracles. Prepend WITH; readers get `r` (vec_id, nbr_id, sim, rnk).
  private[queries] val sqlP33Chain: String =
    s"""e AS (
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
  // The bucket is the full AnnPairMaxBits-wide sign pattern truncated
  // to the corpus-scaled width (bit p's hyperplane is the same at any
  // width, so substr ≡ computing exactly `bits` signs — the Spark side
  // does the latter with the identical annPairBits threshold rule).
  // `pk` is the Hamming≤1 probe fan-out: the bucket itself plus each
  // one-bit flip, the flip positions bounded by the same scalar width —
  // probe-side vec_a < vec_b means every unordered pair surfaces from
  // exactly one orientation, so no DISTINCT is needed (matching the
  // Spark side's argument).
  private[queries] val sqlP13: String =
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |bb AS (SELECT ${sqlAnnPairBits("e")} AS b),
      |n AS (SELECT vec_id, v,
      |  sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
      |  substr(${sqlSignBucket("v", AnnPairMaxBits)},
      |    1, (SELECT b FROM bb)) AS bucket
      |  FROM e),
      |pk AS (
      |  SELECT vec_id AS vec_a, v AS va, nrm AS na, bucket FROM n
      |  UNION ALL
      |  SELECT vec_id, v, nrm,
      |    substr(bucket, 1, CAST(i - 1 AS INT)) ||
      |    (CASE WHEN substr(bucket, CAST(i AS INT), 1) = '1'
      |      THEN '0' ELSE '1' END) ||
      |    substr(bucket, CAST(i + 1 AS INT)) AS bucket
      |  FROM n, (SELECT unnest(generate_series(1,
      |    (SELECT b FROM bb))) AS i) ii)
      |SELECT a.vec_a, b.vec_id AS vec_b,
      |  round(list_sum(list_transform(generate_series(1, len(a.va)),
      |    i -> a.va[i] * b.v[i])) / (a.na * b.nrm), 6) AS sim
      |FROM pk a JOIN n b USING (bucket)
      |WHERE a.vec_a < b.vec_id
      |  AND round(list_sum(list_transform(generate_series(1, len(a.va)),
      |    i -> a.va[i] * b.v[i])) / (a.na * b.nrm), 6) >= 0.40""".stripMargin


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

  private[queries] lazy val oracleFirst: Map[String, String] = Map(
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
    // the BM25 replay, expressed over the ONE posting chain
    // (sqlBm25Postings): a probe's score is the sum of its distinct
    // bigrams' matching postings' precomputed term_q — pruned tokens
    // simply have no postings, so the df·20 ≤ D gate rides along
    "p74_bm25_retrieval" ->
      s"""WITH pt AS (SELECT * FROM ${sqlBm25Postings("")} t),
         |q AS (SELECT DISTINCT doc_id AS probe_id,
         |    t[i] || ' ' || t[i + 1] AS token
         |  FROM (SELECT doc_id, t,
         |      unnest(generate_series(1, len(t) - 1)) AS i
         |    FROM (SELECT doc_id, $sqlToks AS t FROM documents
         |      WHERE doc_id < 10)
         |    WHERE len(t) >= 2)),
         |sc AS (SELECT q.probe_id, pt.doc_id,
         |    CAST(SUM(pt.term_q) AS BIGINT) AS score_q
         |  FROM q JOIN pt USING (token) WHERE pt.doc_id <> q.probe_id
         |  GROUP BY 1, 2),
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
         |capped AS (
         |  SELECT doc_id, simhash, band, bkey FROM (
         |    SELECT *, COUNT(*) OVER (PARTITION BY band, bkey) AS bsz
         |    FROM bands) t WHERE bsz <= $MaxBucket),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM capped a JOIN capped b
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
  )
}
