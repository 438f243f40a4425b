package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** p1: THE CURATION PIPELINE — the engine's operators composed into
  * the standard training-data funnel (the FineWeb/CCNet/Dolma shape):
  *
  *   input → quality filter (t2's composite score) → language filter
  *   (t1's stopword-profile argmax) → exact dedup (keep-min-id per
  *   content md5) → near dedup (keep-min-id per t4 winnowing
  *   fingerprint) → benchmark decontamination (d7's shared-5-gram
  *   contract) → curated set
  *
  * Every stage reuses the named operator's EXACT expression tree
  * (same tokenizer, same roundP quality math, same tie-broken argmax,
  * same shingle derivation), so the composition is spec-checkable
  * against the standalone operators' own outputs — the funnel is the
  * system's integration statement, not a sixth re-implementation.
  *
  * The query emits the attrition funnel: one row per stage with
  * (docs in, docs out, docs dropped, surviving BPE tokens) — the
  * report every curation run publishes.
  *
  * Scale: ONE tokenize pass feeds every stage (signals are fused
  * projections over the cached scan); the two dedups are each one
  * hash-partition shuffle on their group key (content md5 /
  * fingerprint) + row_number — the canonical dedup shuffle; the
  * decontamination side is bench-sized and enters via the same
  * size-guarded broadcast as d7. At 100 TB each stage's survivor set
  * would land in the lake (st16's sink) instead of living in cache —
  * the per-stage funnel aggregates are then metadata-cheap; the
  * funnel's union-of-aggregates is 6 one-row frames, never a
  * data-sized collect.
  */
object Pipeline {

  /** The staged survivor frames, funnel order, each carrying
    * (doc_id, n_bpe, ...signals). Shared by the funnel query and the
    * `Graft.curate` facade (whose answer is the LAST frame).
    */
  private[graft] def stages(docs: DataFrame, qualityMin: Double,
      k: Int, benchMod: Long): Seq[(String, DataFrame)] = {
    graft.Caches.fresh()
    val profiles = TextAnalysis.profiles
    def pScore(words: Seq[String]): Column =
      size(filter(col("tk"), tk => tk.isin(words.map(w => w: Any): _*)))
    // one tokenize pass; every stage signal is a fused projection
    val scored = graft.Caches.materialized(docs
      .select(col("doc_id"), col("text"),
        length(col("text")).as("n_chars_t"),
        Text.tokenize(col("text")).as("tk"))
      .withColumn("n_tok", size(col("tk")))
      .withColumn("n_bpe",
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))
      .withColumns(profiles.map { case (l, ws) =>
        s"s_$l" -> pScore(ws) }.toMap)
      .withColumn("q_score", TextAnalysis.roundP(
        lit(0.4) * least(col("n_chars_t") / 500.0, lit(1.0)) +
          lit(0.3) * (size(array_distinct(col("tk"))) / col("n_tok")) +
          lit(0.3) * (col("s_en") / col("n_tok"))))
      .withColumn("sh", Text.shinglesFast(k)(col("tk"))))

    // stage 1: t2's quality cut (token-less docs are unscoreable →
    // dropped, t2's own domain rule)
    val st1 = scored.filter(col("n_tok") > 0 &&
      col("q_score") >= qualityMin)

    // stage 2: t1's argmax with t1's tie order (profiles seq order:
    // 'de' wins an en/de tie) — keep docs the ID calls English
    val mx = greatest(profiles.map { case (l, _) => col(s"s_$l") }: _*)
    val st2 = st1.filter(col("s_en") === mx && col("s_de") =!= mx)

    // stage 3: exact dedup — keep-min-id per content md5 (d1's policy
    // at document granularity)
    val st3 = st2
      .withColumn("rk_e", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk_e") === 1).drop("rk_e")

    // stage 4: near dedup — keep-min-id per t4 winnowing fingerprint
    // (min 5-gram md5); shingle-less docs have no fingerprint → kept
    val st4 = st3
      .withColumn("fingerprint", when(size(col("sh")) > 0,
        array_min(transform(col("sh"), s => md5(s)))))
      .withColumn("rk_n", row_number().over(
        Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))))
      .filter(col("fingerprint").isNull || col("rk_n") === 1)
      .drop("rk_n")

    // stage 5: d7's decontamination contract — the bench slice
    // (doc_id % benchMod == 0) is held out entirely, and any train
    // doc sharing a distinct 5-gram with it is dropped. The bench
    // shingle set is eval-suite-sized → the size-guarded broadcast
    // d7 uses; contamination is derived from the FULL corpus (a doc
    // deduped away is still evidence), exactly d7's frame.
    val shf = scored.select(col("doc_id"), explode(col("sh")).as("s5"))
    val bench = graft.Caches.materialized(
      shf.filter(col("doc_id") % benchMod === 0)
        .select("s5").distinct())
    val contaminated = shf.filter(col("doc_id") % benchMod =!= 0)
      .join(graft.Guards.sizedBroadcast(bench), "s5")
      .select("doc_id").distinct()
    val st5 = st4.filter(col("doc_id") % benchMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")

    Seq("input" -> scored, "quality" -> st1, "language" -> st2,
      "exact_dedup" -> st3, "near_dedup" -> st4,
      "decontaminate" -> st5)
  }

  /** The funnel report: (ord, stage, n_in, n_out, n_dropped,
    * toks_out) per stage — six one-row aggregates unioned in-plan,
    * n_in threaded by a lag window over the six rows.
    */
  def p1CurationFunnel(t: Tables, qualityMin: Double = 0.35,
      k: Int = 5, benchMod: Long = 97): DataFrame =
    funnelFrom(t.documents.select("doc_id", "text"), qualityMin, k,
      benchMod)

  private[graft] def funnelFrom(docs: DataFrame, qualityMin: Double,
      k: Int, benchMod: Long): DataFrame = {
    val st = stages(docs, qualityMin, k, benchMod)
    val rows = st.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).as("n_out"),
          coalesce(sum(col("n_bpe")), lit(0L)).as("toks_out"))
        .select(lit(i).as("ord"), lit(name).as("stage"),
          col("n_out"), col("toks_out"))
    }
    rows.reduce(_ union _)
      .withColumn("n_in", coalesce(
        lag(col("n_out"), 1).over(Window.orderBy("ord")),
        col("n_out")))
      .withColumn("n_dropped", col("n_in") - col("n_out"))
      .select(col("ord"), col("stage"), col("n_in"), col("n_out"),
        col("n_dropped"), col("toks_out"))
      .orderBy("ord")
  }

  /** The curated survivor set itself — the pipeline's ANSWER (the
    * funnel is its report): doc ids that passed every stage, with
    * their token counts and quality scores.
    */
  private[graft] def curatedFrom(docs: DataFrame, qualityMin: Double,
      k: Int, benchMod: Long): DataFrame =
    stages(docs, qualityMin, k, benchMod).last._2
      .select(col("doc_id"), col("n_bpe"), col("q_score"))

  /** Shared SQL fragments: the scored corpus (tokens + every stage
    * signal) and the five stage CTEs — the oracle replays the exact
    * expression trees the engine fuses.
    */
  private val stageCtes =
    """sc AS (
      |  SELECT doc_id, text,
      |    length(text) AS n_chars_t,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |                x -> x <> '') AS tk
      |  FROM documents),
      |sc2 AS (
      |  SELECT *, len(tk) AS n_tok,
      |    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
      |      AS n_bpe,
      |    len(list_filter(tk, x -> x IN ('der','die','und','das','ist'))) AS s_de,
      |    len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) AS s_en,
      |    len(list_filter(tk, x -> x IN ('el','la','de','los','y'))) AS s_es,
      |    len(list_filter(tk, x -> x IN ('le','la','et','les','des'))) AS s_fr,
      |    len(list_filter(tk, x -> x IN ('de','le','shi','bu','wo'))) AS s_zh,
      |    CASE WHEN len(tk) >= 5 THEN
      |      list_distinct([array_to_string(tk[i:i+4], ' ')
      |                     FOR i IN range(1, greatest(len(tk) - 3, 1))])
      |    ELSE [] END AS sh
      |  FROM sc),
      |sc3 AS (
      |  SELECT *, CASE WHEN n_tok > 0 THEN
      |      floor((0.4 * least(n_chars_t / 500.0, 1.0) +
      |             0.3 * (len(list_distinct(tk)) / n_tok) +
      |             0.3 * (s_en / n_tok)) * 10000 + 0.5) / 10000.0
      |    END AS q_score
      |  FROM sc2),
      |st1 AS (SELECT * FROM sc3 WHERE n_tok > 0 AND q_score >= 0.35),
      |st2 AS (SELECT * FROM st1
      |  WHERE s_en = greatest(s_de, s_en, s_es, s_fr, s_zh)
      |    AND s_de <> greatest(s_de, s_en, s_es, s_fr, s_zh)),
      |st3 AS (SELECT * FROM st2 QUALIFY
      |  row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
      |st4 AS (
      |  SELECT * FROM (
      |    SELECT *, CASE WHEN len(sh) > 0
      |        THEN list_min([md5(s) FOR s IN sh]) END AS fingerprint
      |    FROM st3)
      |  QUALIFY fingerprint IS NULL OR
      |    row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1),
      |shf AS (SELECT doc_id, unnest(sh) AS s5 FROM sc2),
      |bench AS (SELECT DISTINCT s5 FROM shf WHERE doc_id % 97 = 0),
      |cont AS (SELECT DISTINCT shf.doc_id FROM shf JOIN bench USING (s5)
      |         WHERE shf.doc_id % 97 <> 0),
      |st5 AS (SELECT * FROM st4 WHERE doc_id % 97 <> 0
      |  AND doc_id NOT IN (SELECT doc_id FROM cont))""".stripMargin

  val oracle: Map[String, String] = Map(
    // the full funnel replayed: every stage signal from the shared
    // scored CTE, six per-stage aggregates, n_in threaded by hand
    "p1_curation_funnel" ->
      s"""WITH $stageCtes,
         |c0 AS (SELECT count(*) AS n,
         |  CAST(coalesce(sum(n_bpe), 0) AS BIGINT) AS tk FROM sc2),
         |c1 AS (SELECT count(*) AS n,
         |  CAST(coalesce(sum(n_bpe), 0) AS BIGINT) AS tk FROM st1),
         |c2 AS (SELECT count(*) AS n,
         |  CAST(coalesce(sum(n_bpe), 0) AS BIGINT) AS tk FROM st2),
         |c3 AS (SELECT count(*) AS n,
         |  CAST(coalesce(sum(n_bpe), 0) AS BIGINT) AS tk FROM st3),
         |c4 AS (SELECT count(*) AS n,
         |  CAST(coalesce(sum(n_bpe), 0) AS BIGINT) AS tk FROM st4),
         |c5 AS (SELECT count(*) AS n,
         |  CAST(coalesce(sum(n_bpe), 0) AS BIGINT) AS tk FROM st5)
         |SELECT * FROM (
         |  SELECT 0 AS ord, 'input' AS stage, c0.n AS n_in,
         |    c0.n AS n_out, c0.n - c0.n AS n_dropped, c0.tk AS toks_out
         |  FROM c0
         |  UNION ALL SELECT 1, 'quality', c0.n, c1.n, c0.n - c1.n, c1.tk
         |  FROM c0, c1
         |  UNION ALL SELECT 2, 'language', c1.n, c2.n, c1.n - c2.n, c2.tk
         |  FROM c1, c2
         |  UNION ALL SELECT 3, 'exact_dedup', c2.n, c3.n, c2.n - c3.n, c3.tk
         |  FROM c2, c3
         |  UNION ALL SELECT 4, 'near_dedup', c3.n, c4.n, c3.n - c4.n, c4.tk
         |  FROM c3, c4
         |  UNION ALL SELECT 5, 'decontaminate', c4.n, c5.n, c4.n - c5.n, c5.tk
         |  FROM c4, c5)
         |ORDER BY ord""".stripMargin
  )
}
