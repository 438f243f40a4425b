package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All are pure
  * per-row projections over one scan (array expressions, codegen'd
  * built-ins) — embarrassingly parallel at any scale, no shuffle at
  * all; only final `orderBy` (verification cosmetics) sorts.
  */
object TextAnalysis {

  /** Marker-word profiles per language (stopword-profile language ID:
    * score = number of tokens, with multiplicity, in the profile;
    * predicted language = argmax, ties broken by language name asc).
    */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "los", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo"))

  private def profileScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, tk => tk.isin(words.map(w => w: Any): _*)))

  /** t1: n-gram/stopword-profile language ID. The synthetic corpus
    * shares one vocabulary across `lang` labels, so predictions mostly
    * collapse to the dominant profile — the operator verifies the
    * scoring machinery; `is_match` reports agreement with the label.
    */
  def t1Langid(t: Tables): DataFrame = {
    val withToks = t.documents
      .select(col("doc_id"), col("lang"), Text.tokenize(col("text")).as("tk"))
    val scored = profiles.foldLeft(withToks) { case (df, (lang, words)) =>
      df.withColumn(s"s_$lang", profileScore(col("tk"), words))
    }
    val mx = greatest(profiles.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = profiles.foldLeft(when(lit(false), lit("")): Column) {
      case (acc, (l, _)) => acc.when(col(s"s_$l") === mx, lit(l))
    }
    scored
      .withColumn("pred_lang", pred)
      .withColumn("score", mx)
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("score"),
        (col("pred_lang") === col("lang")).cast("int").as("is_match"))
      .orderBy("doc_id")
  }

  /** Engine-portable 4-decimal rounding: floor(x·10⁴ + 0.5)/10⁴.
    * Spark's `round(double, 4)` HALF_UPs the SHORTEST decimal string
    * (BigDecimal.valueOf) while DuckDB rounds the true binary value,
    * so doubles landing on a .xxxx5 boundary split between engines;
    * this formula is pure IEEE arithmetic and identical in both.
    */
  private def roundP(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0

  /** t2: composite quality score — length norm (0.4), lexical
    * diversity (0.3), stopword ratio (0.3); all ratios round(4).
    */
  def t2QualityScore(t: Tables): DataFrame = {
    val tk = Text.tokenize(col("text"))
    val en = profiles.toMap.apply("en")
    t.documents
      .select(col("doc_id"), length(col("text")).as("n_chars_t"), tk.as("tk"))
      .withColumn("n_tok", size(col("tk")))
      .filter(col("n_tok") > 0)
      .withColumn("distinct_ratio",
        roundP(size(array_distinct(col("tk"))) / col("n_tok")))
      .withColumn("stop_ratio",
        roundP(profileScore(col("tk"), en) / col("n_tok")))
      .withColumn("q_score", roundP(
        lit(0.4) * least(col("n_chars_t") / 500.0, lit(1.0)) +
          lit(0.3) * (size(array_distinct(col("tk"))) / col("n_tok")) +
          lit(0.3) * (profileScore(col("tk"), en) / col("n_tok"))))
      .select("doc_id", "n_tok", "distinct_ratio", "stop_ratio", "q_score")
      .orderBy("doc_id")
  }

  /** t3: token counts — whitespace tokens vs a BPE-ish lexer regex
    * (letter runs | digit runs | single non-alnum-non-space).
    */
  def t3TokenCount(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"),
        size(filter(split(col("text"), " +"), x => length(x) > 0)).as("n_ws"),
        size(regexp_extract_all(lower(col("text")),
          lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("n_bpe"),
        length(col("text")).as("n_chars_t"))
      .orderBy("doc_id")

  /** t4: document fingerprint — minimum word-5-gram md5 (winnowing
    * with one global window; lexicographic string min is portable).
    */
  def t4Fingerprint(t: Tables): DataFrame =
    t.documents
      .withColumn("tk", Text.tokenize(col("text")))
      .select(col("doc_id"), Text.shinglesFast(5)(col("tk")).as("sh"))
      .withColumn("fingerprint",
        when(size(col("sh")) > 0,
          array_min(transform(col("sh"), s => md5(s)))))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")

  /** t5: PII/URL scrubbing — the standard training-data hygiene pass.
    * Synthesizes emails/URLs into the text deterministically (oracle
    * constructs the same), then redacts with shared-regex replaces and
    * reports per-doc hit counts. Pure projection.
    */
  def t5PiiScrub(t: Tables): DataFrame = {
    val dirty = when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com now")))
      .otherwise(concat(col("text"), lit(" see https://docs.example.com/p/"),
        col("doc_id"), lit("?ref=x for details")))
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val urlRe = "https?://[^ ]+"
    t.documents
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("dirty"), lit(emailRe), lit(0)))
          .as("n_emails"),
        size(regexp_extract_all(col("dirty"), lit(urlRe), lit(0)))
          .as("n_urls"),
        md5(regexp_replace(regexp_replace(col("dirty"), urlRe, "<URL>"),
          emailRe, "<EMAIL>")).as("clean_md5"))
      .orderBy("doc_id")
  }

  private val tokCte =
    """tt AS (
      |  SELECT doc_id, lang, length(text) AS n_chars_t,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |                x -> x <> '') AS tk
      |  FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "t1_langid" ->
      s"""WITH $tokCte,
         |s AS (
         |  SELECT doc_id, lang,
         |    len(list_filter(tk, x -> x IN ('der','die','und','das','ist'))) AS s_de,
         |    len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) AS s_en,
         |    len(list_filter(tk, x -> x IN ('el','la','de','los','y'))) AS s_es,
         |    len(list_filter(tk, x -> x IN ('le','la','et','les','des'))) AS s_fr,
         |    len(list_filter(tk, x -> x IN ('de','le','shi','bu','wo'))) AS s_zh
         |  FROM tt),
         |p AS (
         |  SELECT doc_id, lang,
         |    greatest(s_de, s_en, s_es, s_fr, s_zh) AS score,
         |    CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
         |         WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
         |         WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
         |         WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
         |         ELSE 'zh' END AS pred_lang
         |  FROM s)
         |SELECT doc_id, lang, pred_lang, score,
         |  CASE WHEN pred_lang = lang THEN 1 ELSE 0 END AS is_match
         |FROM p ORDER BY doc_id""".stripMargin,
    "t2_quality_score" ->
      s"""WITH $tokCte,
         |q AS (
         |  SELECT doc_id, len(tk) AS n_tok,
         |    len(list_distinct(tk)) AS n_dis,
         |    len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) AS n_stop,
         |    n_chars_t
         |  FROM tt WHERE len(tk) > 0)
         |SELECT doc_id, n_tok,
         |  floor((n_dis / n_tok) * 10000 + 0.5) / 10000.0 AS distinct_ratio,
         |  floor((n_stop / n_tok) * 10000 + 0.5) / 10000.0 AS stop_ratio,
         |  floor((0.4 * least(n_chars_t / 500.0, 1.0) +
         |         0.3 * (n_dis / n_tok) + 0.3 * (n_stop / n_tok)) * 10000 + 0.5)
         |    / 10000.0 AS q_score
         |FROM q ORDER BY doc_id""".stripMargin,
    "t3_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(text, ' +'), x -> x <> '')) AS n_ws,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe,
        |  length(text) AS n_chars_t
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t5_pii_scrub" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN text || ' contact user' || doc_id || '@example.com now'
        |      ELSE text || ' see https://docs.example.com/p/' || doc_id || '?ref=x for details'
        |    END AS dirty
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(dirty, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(dirty, 'https?://[^ ]+')) AS n_urls,
        |  md5(regexp_replace(regexp_replace(dirty, 'https?://[^ ]+', '<URL>', 'g'),
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g')) AS clean_md5
        |FROM f ORDER BY doc_id""".stripMargin,
    "t4_fingerprint" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                t -> t <> '') AS tk
        |  FROM documents),
        |shl AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(tk) >= 5 THEN
        |      [array_to_string(tk[i:i+4], ' ') FOR i IN range(1, greatest(len(tk) - 3, 1))]
        |    ELSE [] END) AS sh
        |  FROM toks)
        |SELECT doc_id,
        |  CASE WHEN len(sh) > 0 THEN list_min([md5(s) FOR s IN sh]) END AS fingerprint
        |FROM shl ORDER BY doc_id""".stripMargin
  )
}
