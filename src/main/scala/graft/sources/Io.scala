package graft.sources

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink surface: the engine's data can leave and re-enter
  * through interchange formats without loss, and its parquet sink
  * supports the layout features a 100 TB corpus depends on
  * (partitioned writes + partition-pruned reads; bucketed tables are
  * covered by Dedup.buildBucketedSignatures/BucketSpec).
  *
  * Each operator is a WRITE → READ-BACK → QUERY chain whose oracle
  * runs over the ORIGINAL parquet: the result hash-matches iff the
  * round trip is lossless, so the sink and the source are both under
  * the correctness gate, not just exercised. Reads always pass an
  * explicit schema — schema inference is a correctness hazard
  * (sampling) and a scale hazard (extra full scan) on real corpora.
  *
  * Staging dirs are per-(corpus, format), written once per JVM and
  * overwritten per run — the local stand-in for a lake path.
  */
object Io {

  private val staged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  // staged trees are JVM-scoped scratch: delete them on exit so disk
  // does not accumulate across processes (the memo map keeps them
  // alive for THIS JVM's lifetime)
  private val cleanup: Thread = {
    val th = new Thread(() => staged.values.forEach { d =>
      try deleteTree(java.nio.file.Paths.get(d)) catch { case _: Exception => }
    }, "graft-io-stage-cleanup")
    Runtime.getRuntime.addShutdownHook(th)
    th
  }

  private def deleteTree(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p))
      java.nio.file.Files.list(p).forEach(deleteTree)
    java.nio.file.Files.deleteIfExists(p)
    ()
  }

  /** Write `df` once per (corpus dir, tag) via `write`, return the
    * staging path (memoized — repeated operator calls reuse the
    * landed data, like repeated queries over one lake table).
    * WRITE-ONCE-PER-JVM: like every lake-snapshot cache here (see
    * Ann.codebooks), this assumes the source under `t.dir` is
    * immutable while the process lives — an in-JVM rewrite of the
    * corpus path would be served a stale staged copy. The staged
    * trees are removed by a shutdown hook.
    */
  private def stage(t: Tables, tag: String, df: => DataFrame)(
      write: (DataFrame, String) => Unit): String = {
    val _ = cleanup // force hook registration before first staging
    staged.computeIfAbsent(s"${t.dir}:$tag", { _ =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_io_${tag}_").toString
      write(df, dir)
      dir
    })
  }

  /** io1: JSON-lines round trip of the documents table. The sink is
    * `write.json` (one JSON object per line — the interchange format
    * of every LLM-corpus pipeline); the source reads it back with the
    * writer's schema. The query fingerprints EVERY column (md5 of the
    * text, not the text, so the dump stays small); the oracle runs on
    * the original parquet — a hash match proves byte-lossless text
    * round-trip through JSON escaping.
    */
  def io1JsonlRoundtrip(t: Tables): DataFrame = {
    val schema = t.documents.schema
    val dir = stage(t, "jsonl", t.documents)(
      (df, d) => df.coalesce(4).write.mode("overwrite").json(d))
    t.spark.read.schema(schema).json(dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** io2: CSV round trip of the customer table (header + explicit
    * read schema; doubles survive because Spark writes shortest
    * round-trip decimal strings). The aggregate is computed on the
    * READ-BACK side and compared against the original via the oracle:
    * any quoting/typing loss in the CSV path breaks the hash.
    */
  def io2CsvRoundtrip(t: Tables): DataFrame = {
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    val dir = stage(t, "csv", t.customer)(
      (df, d) => df.coalesce(4).write.mode("overwrite")
        .option("header", "true").csv(d))
    t.spark.read.schema(schema).option("header", "true").csv(dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
          .as("total_bal"),
        min("c_name").as("first_name"))
      .orderBy("c_mktsegment")
  }

  /** io3: partitioned parquet write + partition-PRUNED read. Orders
    * land partitioned by o_orderpriority (the layout choice a 100 TB
    * fact table makes for its dominant filter column); the query
    * filters one priority, so the scan must read 1/5 of the
    * directories — PlanSpec asserts the pruning on the live plan
    * (partitionFilters non-empty, data filters empty).
    */
  def io3PartitionedPrune(t: Tables): DataFrame = {
    val dir = stage(t, "part_parquet", t.orders)(
      (df, d) => df.write.mode("overwrite")
        .partitionBy("o_orderpriority").parquet(d))
    partitionedOrders(t, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** The partitioned-orders read half (explicit schema incl. the
    * partition column — no inference scan).
    */
  private def partitionedOrders(t: Tables, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType)))
    t.spark.read.schema(schema.add("o_orderpriority", StringType))
      .parquet(dir)
  }

  val oracle: Map[String, String] = Map(
    "io1_jsonl_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "io2_csv_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
        |  min(c_name) AS first_name
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "io3_partitioned_prune" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
