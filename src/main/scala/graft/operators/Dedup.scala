package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines.
  *
  * Scale design (100 TB posture): every near-dup operator is
  * join-driven — candidate pairs come from an inverted index
  * (shingle / minhash band / simhash block / hyperplane bucket)
  * equi-join, NEVER a cross join. Signature computation (minhash,
  * simhash, LSH buckets) is pure array-expression projection over one
  * scan — zero shuffles until the candidate join itself, whose key
  * distribution is handled by AQE (+ salting if a band degenerates).
  * Pairs are canonicalized `a < b` so each is produced once.
  *
  * Determinism / oracle parity: all hash-derived values stay STRINGS
  * (md5 hex, '0'/'1' bit strings) — lexicographic min/equality is
  * identical in any engine, so no integer-conversion or sign pitfalls.
  * Thresholds are applied to ROUNDED scores so Spark and DuckDB make
  * identical keep/drop decisions. Thresholds are parameters; the
  * defaults here are tuned to the synthetic corpus (e.g. cosine 0.45
  * — production near-dup would use 0.95; the plumbing is identical).
  */
object Dedup {

  /** Spread a small scan across all cores before compute-heavy per-row
    * signature work. The test tables are single parquet files → one
    * input partition → one task would do all the md5/minhash math. On
    * a real cluster the input is many files/row-groups and this is a
    * no-op-cost round-robin; locally it is what makes signature
    * computation parallel.
    */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** d1: exact dedup by content hash at chunk granularity (the planted
    * near-identical docs share identical leading chunks). keep-min-id
    * policy; hash-groupBy, no driver loop.
    */
  def d1DedupExact(t: Tables): DataFrame =
    Ingest.chunks(t)
      .groupBy(md5(col("chunk")).as("chunk_md5"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keep_doc"))
      .filter(col("n_copies") >= 2)
      .orderBy("chunk_md5")

  /** Distinct (doc_id, shingle) inverted-index rows. */
  private def shingleRows(t: Tables): DataFrame =
    spread(t.documents).select(col("doc_id"),
      explode(Text.shingles(3)(col("text"))).as("sh"))

  /** d2: word-3-gram Jaccard ≥ 0.5 pairs via shingle inverted-index
    * join (candidate generation is the only shuffle; complexity is
    * bounded by shingle co-occurrence, not n²).
    */
  def d2NgramJaccard(t: Tables, threshold: Double = 0.5): DataFrame = {
    val sh = shingleRows(t)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("nsh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("nsh", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("inter") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Per-doc arrays: distinct 3-shingles + 16 md5-permutation
    * minhashes (min of md5(p ++ ':' ++ shingle) — md5 IS the random
    * permutation, lexicographic string min IS the minimum). Pure
    * projection, no shuffle.
    */
  private def minhashDocs(t: Tables): DataFrame =
    spread(t.documents)
      .select(col("doc_id"), Text.shingles(3)(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("mhs", transform(sequence(lit(0), lit(15)),
        p => array_min(transform(col("sh"),
          s => md5(concat(p, lit(":"), s))))))

  /** d3: MinHash(16 perms) + LSH banding (4 bands × 4 rows) candidate
    * join, then exact-Jaccard verification of candidates at ≥ 0.5.
    */
  def d3MinhashLsh(t: Tables, threshold: Double = 0.5): DataFrame = {
    // signatures are consumed 4× (both self-join sides + both verify
    // joins) — cache is the local analog of materializing the
    // signature table, which is what a cluster pipeline would do
    val docs = minhashDocs(t).cache()
    val bands = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("band"),
        col("mhs"))
      .select(col("doc_id"), col("band"),
        concat_ws("", slice(col("mhs"), col("band") * 4 + 1, lit(4))).as("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val withSh = docs.select(col("doc_id"), col("sh"))
    cand
      .join(withSh.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sh", "sha"), "doc_a")
      .join(withSh.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sh", "shb"), "doc_b")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sha")) + size(col("shb")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Per-doc 64-bit tf-weighted SimHash (Charikar) as a '0'/'1'
    * string: per bit, sum ±tf over the doc's distinct tokens according
    * to bit b of md5(token); sign (≥ 0 → '1') is the signature bit.
    * tf weighting matters here: the synthetic corpus has a ~31-word
    * vocabulary, so unweighted (set-based) simhash collapses most
    * docs to one signature and the candidate join degenerates toward
    * n². md5 computed once per token; the 64 bit-sums are nested
    * array-expression folds — one projection, no shuffle.
    */
  private def simhashDocs(t: Tables): DataFrame =
    spread(t.documents)
      .select(col("doc_id"), Text.tokenize(col("text")).as("all_toks"))
      .withColumn("toks", array_distinct(col("all_toks")))
      .filter(size(col("toks")) > 0)
      .withColumn("md5s", transform(col("toks"), tk => md5(tk)))
      .withColumn("tfs", transform(col("toks"),
        tk => size(filter(col("all_toks"), x => x === tk)).cast("long")))
      .withColumn("sim", array_join(
        transform(sequence(lit(0), lit(63)), b =>
          when(aggregate(sequence(lit(0), size(col("toks")) - 1), lit(0L),
            (acc, ix) => acc +
              (Text.md5Bit(element_at(col("md5s"), ix + 1), b) * 2 - 1) *
                element_at(col("tfs"), ix + 1)) >= 0,
            lit("1")).otherwise(lit("0"))), ""))
      .select("doc_id", "sim")

  /** d4: SimHash near-dup pairs, Hamming ≤ 3, with the 4×16-bit block
    * pigeonhole prefilter (Hamming ≤ 3 ⇒ at least one block equal) as
    * the candidate equi-join.
    */
  def d4Simhash(t: Tables, maxHamming: Int = 3): DataFrame = {
    val docs = simhashDocs(t).cache()
    val blocks = docs.select(col("doc_id"), col("sim"),
        explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("bval", col("sim").substr(col("blk") * 16 + 1, lit(16)))
    val cand = blocks.as("x").join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.sim").as("sim_a"),
        col("y.doc_id").as("doc_b"), col("y.sim").as("sim_b"))
      .distinct()
    cand
      .withColumn("hamming", aggregate(sequence(lit(1), lit(64)), lit(0),
        (acc, i) => acc + when(
          col("sim_a").substr(i, lit(1)) =!= col("sim_b").substr(i, lit(1)),
          1).otherwise(0)))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Per-vector LSH signature over 4 bands × 2 md5-seeded random
    * hyperplanes (hyperplane component h,i = first-2-hex-digit value
    * of md5(h:':':i) scaled to [-1,1]). Dims exploded → per-(vec,h)
    * dot-sign → per-band 2-bit bucket strings.
    */
  private[operators] def hyperplaneBuckets(t: Tables, nPlanes: Int = 8): DataFrame = {
    val dims = spread(t.embeddings)
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))
    val planes = dims
      .select(col("vec_id"), col("i"), col("x"),
        explode(sequence(lit(0), lit(nPlanes - 1))).as("h"))
      .withColumn("m", md5(concat(col("h"), lit(":"), col("i"))))
      .withColumn("hp",
        (Text.hexVal(col("m").substr(1, 1)) * 16 +
          Text.hexVal(col("m").substr(2, 1))) / 255.0 * 2 - 1)
    planes.groupBy("vec_id", "h")
      .agg(sum(col("x") * col("hp")).as("dot"))
      .withColumn("bit", when(col("dot") >= 0, lit("1")).otherwise(lit("0")))
      .groupBy(col("vec_id"), expr("h div 2").as("band"))
      .agg(concat_ws("", sort_array(collect_list(struct(col("h"), col("bit"))))
        .getField("bit")).as("sig"))
  }

  /** d5: embedding near-dup pairs — hyperplane-LSH banded candidates,
    * exact-cosine verification at ≥ 0.45 (threshold parameterized;
    * 0.95 in production — synthetic vectors top out at 0.51).
    */
  def d5EmbeddingNeardup(t: Tables, threshold: Double = 0.45): DataFrame = {
    val buckets = hyperplaneBuckets(t).cache()
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val vecs = t.embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    cand
      .join(vecs.withColumnRenamed("vec_id", "vec_a")
        .withColumnRenamed("v", "va"), "vec_a")
      .join(vecs.withColumnRenamed("vec_id", "vec_b")
        .withColumnRenamed("v", "vb"), "vec_b")
      .withColumn("cos",
        round(graft.functions.Vectors.cosine(col("va"), col("vb")), 4))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  private val shingleCte =
    """toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS tk
      |  FROM documents),
      |shl AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(tk) >= 3 THEN
      |      [array_to_string(tk[i:i+2], ' ') FOR i IN range(1, greatest(len(tk) - 1, 1))]
      |    ELSE [] END) AS sh
      |  FROM toks),
      |shx AS (SELECT doc_id, unnest(sh) AS sh FROM shl)""".stripMargin

  val oracle: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """WITH o AS (
        |  SELECT doc_id, text, unnest(range(0, length(text), 100)) AS start
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, md5(substring(text, CAST(start AS INT) + 1, 200)) AS chunk_md5
        |  FROM o WHERE start = 0 OR start - 100 + 200 <= length(text))
        |SELECT chunk_md5, count(*) AS n_copies,
        |  count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_doc
        |FROM c GROUP BY chunk_md5 HAVING count(*) >= 2
        |ORDER BY chunk_md5""".stripMargin,
    "d2_ngram_jaccard" ->
      s"""WITH $shingleCte,
         |sz AS (SELECT doc_id, count(*) AS nsh FROM shx GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM shx a JOIN shx b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(inter / (sa.nsh + sb.nsh - inter), 4) AS jaccard
         |FROM inter
         |JOIN sz sa ON sa.doc_id = doc_a
         |JOIN sz sb ON sb.doc_id = doc_b
         |WHERE round(inter / (sa.nsh + sb.nsh - inter), 4) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d3_minhash_lsh" ->
      s"""WITH $shingleCte,
         |mh AS (
         |  SELECT doc_id, p, min(md5(p || ':' || sh)) AS v
         |  FROM shx, (SELECT unnest(range(0, 16)) AS p) perms
         |  GROUP BY doc_id, p),
         |bands AS (
         |  SELECT doc_id, CAST(p // 4 AS INT) AS band,
         |    string_agg(v, '' ORDER BY p) AS sig
         |  FROM mh GROUP BY doc_id, CAST(p // 4 AS INT)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |sz AS (SELECT doc_id, len(sh) AS nsh, sh FROM shl WHERE len(sh) > 0),
         |v AS (
         |  SELECT doc_a, doc_b,
         |    len(list_intersect(sa.sh, sb.sh)) AS inter, sa.nsh AS na, sb.nsh AS nb
         |  FROM cand JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b)
         |SELECT doc_a, doc_b, round(inter / (na + nb - inter), 4) AS jaccard
         |FROM v WHERE round(inter / (na + nb - inter), 4) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d4_simhash" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                x -> x <> '') AS all_toks,
        |    list_distinct(
        |      list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                  x -> x <> '')) AS toks
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, [md5(x) FOR x IN toks] AS md5s,
        |    [len(list_filter(all_toks, y -> y = x)) FOR x IN toks] AS tfs
        |  FROM t WHERE len(toks) > 0),
        |s AS (
        |  SELECT doc_id, array_to_string(
        |    [CASE WHEN list_sum([
        |        (CAST(floor((CASE WHEN ascii(substring(md5s[j], CAST(floor(b / 4) AS INT) + 1, 1)) >= 97
        |                    THEN ascii(substring(md5s[j], CAST(floor(b / 4) AS INT) + 1, 1)) - 87
        |                    ELSE ascii(substring(md5s[j], CAST(floor(b / 4) AS INT) + 1, 1)) - 48 END)
        |             / power(2, 3 - b % 4)) AS BIGINT) % 2 * 2 - 1) * tfs[CAST(j AS INT)]
        |        FOR j IN range(1, len(md5s) + 1)]) >= 0 THEN '1' ELSE '0' END
        |     FOR b IN range(0, 64)], '') AS sim
        |  FROM m),
        |blk AS (
        |  SELECT doc_id, sim, b AS blk,
        |    substring(sim, CAST(b AS INT) * 16 + 1, 16) AS bval
        |  FROM s, (SELECT unnest(range(0, 4)) AS b) bb),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, x.sim AS sim_a,
        |                  y.doc_id AS doc_b, y.sim AS sim_b
        |  FROM blk x JOIN blk y
        |    ON x.blk = y.blk AND x.bval = y.bval AND x.doc_id < y.doc_id),
        |h AS (
        |  SELECT doc_a, doc_b,
        |    len(list_filter(range(1, 65),
        |        i -> substring(sim_a, CAST(i AS INT), 1) <> substring(sim_b, CAST(i AS INT), 1))) AS hamming
        |  FROM cand)
        |SELECT doc_a, doc_b, hamming FROM h WHERE hamming <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d5_embedding_neardup" ->
      """WITH dims AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |    unnest(CAST(embedding AS DOUBLE[])) AS x
        |  FROM embeddings),
        |pl AS (
        |  SELECT vec_id, i, x, h, md5(h || ':' || i) AS m
        |  FROM dims, (SELECT unnest(range(0, 8)) AS h) hh),
        |dots AS (
        |  SELECT vec_id, h,
        |    sum(x * (((CASE WHEN ascii(substring(m, 1, 1)) >= 97
        |               THEN ascii(substring(m, 1, 1)) - 87
        |               ELSE ascii(substring(m, 1, 1)) - 48 END) * 16 +
        |              (CASE WHEN ascii(substring(m, 2, 1)) >= 97
        |               THEN ascii(substring(m, 2, 1)) - 87
        |               ELSE ascii(substring(m, 2, 1)) - 48 END)) / 255.0 * 2 - 1)) AS dot
        |  FROM pl GROUP BY vec_id, h),
        |buckets AS (
        |  SELECT vec_id, CAST(h // 2 AS INT) AS band,
        |    string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY h) AS sig
        |  FROM dots GROUP BY vec_id, CAST(h // 2 AS INT)),
        |cand AS (
        |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
        |  FROM buckets x JOIN buckets y
        |    ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id),
        |vv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (
        |  SELECT vec_a, vec_b,
        |    round(list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
        |  FROM cand JOIN vv a ON a.vec_id = vec_a JOIN vv b ON b.vec_id = vec_b)
        |SELECT vec_a, vec_b, cos FROM c WHERE cos >= 0.45
        |ORDER BY vec_a, vec_b""".stripMargin
  )
}
