package graft.operators

import graft.Tables
import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Scale design: the probe vector is a broadcast 1-row aggregate (the
  * only `first()`-free way to get "the row with vec_id = p" into every
  * task without a driver collect). Brute force (s1) is one scan with a
  * codegen-friendly fold per row + a top-k sort — the exact baseline.
  * The LSH variant (s2) prunes the scan to the probe's hyperplane
  * buckets BEFORE computing any cosine: at cluster scale the bucket
  * join is a partition-pruned lookup (bucket tables would be written
  * bucketed-by-sig), and only the candidate subset pays the O(d) math.
  */
object Ann {

  /** s1: exact top-10 cosine neighbors of probe vector (vec_id=0). */
  def s1AnnBruteforce(t: Tables, probeId: Long = 0L): DataFrame = {
    val probe = t.embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>").as("pv"))
    t.embeddings.filter(col("vec_id") =!= probeId)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(Vectors.cosine(col("v"), col("pv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  /** s2: LSH-bucketed ANN (*rows-only oracle*; recall vs s1 is
    * spec'd in ScalaTest): candidates = vectors sharing ≥1 of the
    * probe's 4 band buckets; exact cosine only on candidates.
    */
  def s2AnnLsh(t: Tables, probeId: Long = 0L): DataFrame = {
    val buckets = Dedup.hyperplaneBuckets(t.embeddings.select("vec_id", "embedding"))
    val probeBuckets = buckets.filter(col("vec_id") === probeId)
      .select(col("band").as("pband"), col("sig").as("psig"))
    val cands = buckets
      .join(broadcast(probeBuckets),
        col("band") === col("pband") && col("sig") === col("psig"))
      .filter(col("vec_id") =!= probeId)
      .select("vec_id").distinct()
    val probe = t.embeddings.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>").as("pv"))
    t.embeddings.join(cands, "vec_id")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(Vectors.cosine(col("v"), col("pv")), 4).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
  }

  val oracle: Map[String, String] = Map(
    "s1_ann_bruteforce" ->
      """WITH p AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS pv FROM embeddings WHERE vec_id = 0),
        |v AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id <> 0)
        |SELECT vec_id,
        |  round(list_dot_product(v, pv) /
        |        (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(pv, pv))), 4) AS cos
        |FROM v, p ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin
  )
}
