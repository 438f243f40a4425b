package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-surface metrics, Spark-first.
  *
  * The reference runs a checklist of named boolean checks per agent
  * conversation log and reports a pass rate per check (reference:
  * zc_agent/eval/calculate_metrics.py:20-36 `CheckName` /
  * `CHECK_DESCRIPTIONS`, :229-233 per-check mean × 100).
  *
  * Here each `events` row stands in for one logged run; the checks are
  * deterministic predicates over its fields (the LLM judge is outside
  * an analytics engine's scope — the aggregation surface is what is
  * re-expressed). One scan, rows fan out ×5 map-side (explode of a
  * literal struct array — no shuffle), then a 7-group aggregate:
  * trivially parallel at any scale.
  */
object EvalMetrics {

  /** r10: per-check n / n_pass / pass_rate over the event log — all
    * SEVEN reference checks (calculate_metrics.py:19-26 CheckName):
    * instructions_follow/instructions_avoid are deterministic
    * predicate stand-ins like the other five (the LLM judge producing
    * the booleans is outside the engine; the 7-check aggregation
    * surface is what is re-expressed).
    */
  def r10EvalPassRates(t: Tables): DataFrame = {
    val checks = explode(array(
      struct(lit("instructions_follow").as("check_name"),
        (col("value") >= 20).as("pass")),
      struct(lit("instructions_avoid").as("check_name"),
        (col("event_type") =!= "error").as("pass")),
      struct(lit("answer_relevant").as("check_name"),
        (col("value") >= 50).as("pass")),
      struct(lit("answer_clear").as("check_name"),
        (col("k") % 2 === 0).as("pass")),
      struct(lit("answer_citations").as("check_name"),
        (col("k") % 3 === 0).as("pass")),
      struct(lit("completeness").as("check_name"),
        (col("value") >= 150).as("pass")),
      struct(lit("tool_call_search").as("check_name"),
        col("event_type").isin("click", "view").as("pass"))))
    t.events
      .select(col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .select(checks.as("c"))
      .select(col("c.check_name").as("check_name"),
        col("c.pass").cast("int").as("p"))
      .groupBy("check_name")
      .agg(count(lit(1)).as("n"), sum("p").as("n_pass"),
        round(avg(col("p")), 4).as("pass_rate"))
      .orderBy("check_name")
  }

  /** r11: deterministic eval-set sampling — top-2 docs per source by
    * md5(doc_id) (a stable pseudo-random order both engines share),
    * the Spark form of the reference's doc sampling before question
    * generation (reference: zc_agent/eval/generate_questions.py:60-70
    * random.sample over docs). Window top-k per group; at scale this
    * is the standard stratified-sample shape.
    */
  def r11EvalSample(t: Tables, perSource: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    t.documents
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perSource)
      .orderBy("source", "rk")
  }

  /** r14: CONVERSATION-LOG ANALYTICS — the reference's observability
    * output (zc_agent/logs.py ConversationJsonLogger: one JSON per
    * conversation with agent_name/model/messages[], each message
    * kind=request|response with parts[] tagged part_kind —
    * user-prompt/tool-call/tool-return/text; analyzed in
    * evals/analysis.ipynb). Each user's event history stands in for
    * one conversation: the operator ASSEMBLES the log JSON exactly in
    * that shape (deterministic message order via array_sort on
    * (ts, event_id)), then PARSES it back through `from_json` with
    * the explicit nested schema — the round trip through the log
    * format is the tested surface — and reports per-conversation
    * message/part-kind counts. The oracle computes the same counts
    * directly from events: any loss in the serialize→parse path
    * breaks the hash.
    *
    * Scale shape: one groupBy(user) shuffle builds the logs; the
    * parse + part counting is a pure projection (nested array folds),
    * no further shuffle.
    */
  def r14ConversationStats(t: Tables): DataFrame = {
    import org.apache.spark.sql.types._
    val pk = when(col("event_type") === "click", "user-prompt")
      .when(col("event_type") === "view", "text")
      .when(col("event_type") === "purchase", "tool-call")
      .when(col("event_type") === "signup", "tool-return")
      .otherwise("retry-prompt")
    val assembled = t.events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), pk.as("part_kind"))
      .withColumn("kind",
        when(col("part_kind").isin("user-prompt", "tool-return"), "request")
          .otherwise("response"))
      .groupBy("user_id")
      .agg(to_json(struct(
        lit("gh_agent").as("agent_name"),
        lit("m1").as("model"),
        transform(
          array_sort(collect_list(struct(col("ts_us"), col("event_id"),
            col("kind"), col("part_kind")))),
          m => struct(m.getField("kind").as("kind"),
            array(struct(m.getField("part_kind").as("part_kind")))
              .as("parts"))).as("messages"))).as("log_json"))
    val logT = StructType(Seq(
      StructField("agent_name", StringType),
      StructField("model", StringType),
      StructField("messages", ArrayType(StructType(Seq(
        StructField("kind", StringType),
        StructField("parts", ArrayType(StructType(Seq(
          StructField("part_kind", StringType)))))))))))
    def cnt(parts: org.apache.spark.sql.Column, kind: String) =
      size(filter(parts, p => p === kind)).cast("long")
    assembled
      .select(col("user_id"), from_json(col("log_json"), logT).as("log"))
      .withColumn("pks", transform(flatten(col("log.messages.parts")),
        p => p.getField("part_kind")))
      .select(col("user_id"),
        size(col("log.messages")).cast("long").as("n_messages"),
        cnt(col("pks"), "user-prompt").as("n_user_prompts"),
        cnt(col("pks"), "text").as("n_texts"),
        cnt(col("pks"), "tool-call").as("n_tool_calls"),
        cnt(col("pks"), "tool-return").as("n_tool_returns"),
        cnt(col("pks"), "retry-prompt").as("n_retries"))
      .orderBy("user_id")
  }

  val oracle: Map[String, String] = Map(
    // ground truth straight off events: the engine's numbers traveled
    // through assemble→to_json→from_json→nested-array folds, so a
    // hash match proves the log round trip is lossless
    "r14_conversation_stats" ->
      """SELECT user_id, count(*) AS n_messages,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_user_prompts,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_texts,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_calls,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool_returns,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_retries
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "r11_eval_sample" ->
      """SELECT source, doc_id, n_chars, rk FROM (
        |  SELECT source, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) x
        |WHERE rk <= 2 ORDER BY source, rk""".stripMargin,
    "r10_eval_pass_rates" ->
      """WITH e AS (
        |  SELECT event_type, value,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS k
        |  FROM events),
        |c AS (
        |  SELECT 'instructions_follow' AS check_name,
        |         CASE WHEN value >= 20 THEN 1 ELSE 0 END AS p FROM e
        |  UNION ALL SELECT 'instructions_avoid',
        |         CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END FROM e
        |  UNION ALL SELECT 'answer_relevant',
        |         CASE WHEN value >= 50 THEN 1 ELSE 0 END FROM e
        |  UNION ALL SELECT 'answer_clear',
        |         CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END FROM e
        |  UNION ALL SELECT 'answer_citations',
        |         CASE WHEN k % 3 = 0 THEN 1 ELSE 0 END FROM e
        |  UNION ALL SELECT 'completeness',
        |         CASE WHEN value >= 150 THEN 1 ELSE 0 END FROM e
        |  UNION ALL SELECT 'tool_call_search',
        |         CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END FROM e)
        |SELECT check_name, count(*) AS n, CAST(sum(p) AS BIGINT) AS n_pass,
        |  round(avg(p), 4) AS pass_rate
        |FROM c GROUP BY check_name ORDER BY check_name""".stripMargin
  )
}
