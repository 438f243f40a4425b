package graft

import org.apache.spark.sql.functions._

/** e1's claims: the batched stub encode is a pure per-record
  * function (batch-size- and partitioning-invariant), the float
  * vectors are unit-norm and bit-stable, and the facade frame is
  * drop-in for the similarity family's (vec_id, embedding) contract.
  */
class EmbedSpec extends SparkSpec {

  private def docs = Tables(spark, sf).documents.select("doc_id", "text")

  test("e1: gated output is batch-size-invariant (1, 7, 32, 1000) " +
      "and partitioning-invariant — the stub is a per-record pure " +
      "function, so batching is pure plumbing") {
    val base = run("e1_embed_batch").collect()
      .map(r => (r.getLong(0), r.getString(4))).sortBy(_._1).toSeq
    assert(base.nonEmpty)
    for (bs <- Seq(1, 7, 1000)) {
      val alt = graft.operators.Embed
        .e1EmbedBatch(Tables(spark, sf), batchSize = bs).collect()
        .map(r => (r.getLong(0), r.getString(4))).sortBy(_._1).toSeq
      assert(alt == base, s"batchSize=$bs diverged")
    }
    val repart = graft.operators.Embed
      .encodeFrame(docs.repartition(13), "doc_id", "text", 32)
      .select(col("vec_id"), col("u_md5")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(repart == base, "partitioning changed the encode")
  }

  test("e1: float vectors are L2-unit-norm, 64-dim, and bit-stable " +
      "across batch sizes; the facade frame has the s-family's " +
      "(vec_id, embedding) shape") {
    val a = graft.api.Graft.embed(docs, "doc_id", "text", batchSize = 32)
    assert(a.columns.toSeq == Seq("vec_id", "embedding"))
    val rows = a.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length == graft.operators.Embed.dim)
      val nrm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(nrm - 1.0) < 1e-5, s"norm $nrm off unit")
    }
    val b = graft.api.Graft.embed(docs, "doc_id", "text", batchSize = 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
      .sortBy(_._1).toSeq
    val aSorted = rows.map(r => (r.getLong(0), r.getSeq[Float](1).toVector))
      .sortBy(_._1).toSeq
    assert(b == aSorted, "float path not bit-stable across batch sizes")
  }

  test("e1: the encode answers a brute-force cosine query through " +
      "the s-family's own serving shape (the dense-tower contract)") {
    val emb = graft.api.Graft.embed(docs, "doc_id", "text")
    val probe = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>").as("pv"))
    val top = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        round(graft.functions.Vectors.cosine(col("v"), col("pv")), 4)
          .as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10).collect()
    assert(top.length == 10)
    // self-similarity sanity: a vector IS its own nearest neighbor
    val self = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(probe))
      .select(round(graft.functions.Vectors.cosine(col("v"), col("pv")), 4))
      .head().getDouble(0)
    assert(self == 1.0)
  }
}
