package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** e1: BATCHED EMBEDDING INFERENCE AT INGEST — the "Spark for batch
  * embedding generation" leg of the reference's north star: the
  * corpus flows through a partition-parallel, batch-grouped model
  * client and lands as the `(vec_id, embedding)` table the whole
  * similarity family (s1-s20, d5/d9, st5/st15) serves from. Until
  * now the engine only CONSUMED driver-generated embeddings; e1 is
  * the pass that PRODUCES them.
  *
  * Contract (r16's mapPartitions-batch shape, reference:
  * zc_agent/prepare_data.py:193-224 — the same per-batch client
  * amortization, applied to an encoder instead of a rewriter):
  * records group into `batchSize` requests inside each partition,
  * one "model call" per group, responses zipped back in order. The
  * encoder is a STUB (no model runtime exists in this environment):
  * dim `j` of a text's vector derives from md5(text ++ ":" ++ j) —
  * first 4 bytes as an unsigned 32-bit int u_j, mapped affinely to
  * [-1, 1) and L2-normalized. Deterministic per record, so output is
  * BATCH-SIZE-INVARIANT and ARRIVAL-ORDER-INVARIANT (spec-locked;
  * the streaming twin st23 lands the identical rows) — exactly the
  * property a pinned model version gives a production encode pass.
  *
  * Oracle gate: the u_j integers are EXACT in both engines
  * (`conv(hex,16,10)` ≡ DuckDB `('0x'||hex)::UBIGINT`), so the gated
  * projection hashes the full integer pre-image of every dimension
  * (md5 over the comma-joined u vector + its exact BIGINT sum) —
  * zero float formatting in the hash path. The float normalization
  * (JVM-side) is spec-checked (unit norm, bit-stable across batch
  * sizes).
  *
  * Scale: a pure mapPartitions projection — no shuffle, no state, no
  * driver collect; the exact shape (and cost profile) of every
  * billion-row embedding backfill. Batch size trades request count
  * against request latency; partition count is the parallelism knob.
  */
object Embed {

  /** Pinned model version every encode stamps — retraining is a NEW
    * version, never a silent change (st20's migration contract).
    */
  val modelVersion = "stub-emb-1"

  /** Output dimensionality — matches the driver `embeddings` table's
    * 64-dim layout so e1's output is drop-in for the s-family.
    */
  val dim = 64

  /** The stub "model response" for one record: the unsigned-int
    * pre-image u (one 32-bit value per dim) and the L2-normalized
    * float vector derived from it. A real client would send the whole
    * batch to an endpoint; the derivation here is the deterministic
    * stand-in with the same signature.
    */
  private def encodeOne(md: java.security.MessageDigest, text: String,
      d: Int): (Array[Long], Array[Float]) = {
    val u = new Array[Long](d)
    var j = 0
    while (j < d) {
      md.reset()
      val h = md.digest(s"$text:$j".getBytes("UTF-8"))
      u(j) = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      j += 1
    }
    val x = u.map(v => v.toDouble / 4294967296.0 * 2.0 - 1.0)
    val nrm = math.sqrt(x.map(v => v * v).sum)
    (u, x.map(v => (v / nrm).toFloat))
  }

  /** Batched encode over any (id, text) frame: one stub model request
    * per `batchSize` records per partition, vectors zipped back in
    * order. Emits (vec_id, model, embedding, u16, u_sum, u_md5) —
    * the float vector for consumers, the int16-quantized code column
    * (each dim's top 16 bits — the stored serving code a quantized
    * dense retriever dots against, p3's tower) and the exact integer
    * signature for the gate.
    */
  private[graft] def encodeFrame(df: DataFrame, idCol: String,
      textCol: String, batchSize: Int = 32, d: Int = dim): DataFrame = {
    require(batchSize > 0, s"batchSize=$batchSize must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(batchSize).flatMap { batch =>
          // --- STUB: one fake "encode request" per batch; a real
          // client posts the batch and zips responses back in order
          batch.map { case (id, text) =>
            val (u, emb) = encodeOne(md, text, d)
            val sig = u.mkString(",")
            md.reset()
            val hex = md.digest(sig.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            (id, modelVersion, emb, u.map(v => (v >>> 16).toInt),
              u.sum, hex)
          }
        }
      }.toDF("vec_id", "model", "embedding", "u16", "u_sum", "u_md5")
  }

  /** The query-side int16 code for a text — the SAME top-16-bit
    * derivation [[encodeFrame]] stores per dim, computed driver-side
    * for the one query string (a model constant, like a probe
    * vector).
    */
  private[graft] def u16Of(text: String, d: Int = dim): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until d).map { j =>
      md.reset()
      val h = md.digest(s"$text:$j".getBytes("UTF-8"))
      ((h(0) & 0xffL) << 8) | (h(1) & 0xffL)
    }
  }

  /** The `(vec_id, embedding)` table the s-family serves from — the
    * facade form (`Graft.embed`); p2's dense tower consumes this.
    */
  private[graft] def embeddingsFrame(df: DataFrame, idCol: String,
      textCol: String, batchSize: Int = 32, d: Int = dim): DataFrame =
    encodeFrame(df, idCol, textCol, batchSize, d)
      .select(col("vec_id"), col("embedding"))

  /** e1: the gated form — integer signature columns only (the float
    * vector is spec-territory; floats never enter the oracle hash).
    */
  def e1EmbedBatch(t: Tables, batchSize: Int = 32): DataFrame =
    encodeFrame(t.documents, "doc_id", "text", batchSize)
      .select(col("vec_id"), col("model"), lit(dim).as("n_dim"),
        col("u_sum"), col("u_md5"))
      .orderBy("vec_id")

  /** DuckDB replay of the stub: the same per-dim md5-derived unsigned
    * ints, joined and hashed — `('0x'||hex)::UBIGINT` ≡ Spark's
    * `conv(hex,16,10)` ≡ the JVM byte fold above.
    */
  val oracle: Map[String, String] = Map(
    "e1_embed_batch" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    [CAST(('0x' || substr(md5(text || ':' || CAST(j AS INT)), 1, 8))
         |          AS UBIGINT)
         |     FOR j IN range(0, $dim)] AS uu
         |  FROM documents)
         |SELECT doc_id AS vec_id, '$modelVersion' AS model,
         |  $dim AS n_dim,
         |  CAST(list_sum(uu) AS BIGINT) AS u_sum,
         |  md5(array_to_string(uu, ',')) AS u_md5
         |FROM u ORDER BY vec_id""".stripMargin
  )
}
