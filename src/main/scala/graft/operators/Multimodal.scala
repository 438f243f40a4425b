package graft.operators

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata alongside. The test
  * corpus has no media files, so the binary payload is the document
  * text's bytes — the point is that every step (schema, batching,
  * partition-parallel decode) is the real Spark shape a media pipeline
  * uses at scale.
  */
object Multimodal {

  /** m1: binary column + typed metadata — byte length, sha-256,
    * magic-bytes sniff (first 4 bytes, hex). Pure projection.
    */
  def m1BinaryMeta(t: Tables): DataFrame =
    t.documents
      .select(col("doc_id"), col("text"),
        col("text").cast("binary").as("bin"))
      .select(col("doc_id"),
        length(col("bin")).as("n_bytes"),
        lower(sha2(col("text"), 256)).as("sha256"),
        // first 4 BYTES as hex; full-blob hex then prefix because the
        // oracle engine cannot slice blobs directly
        substring(lower(hex(col("bin"))), 1, 8).as("magic_hex"))
      .orderBy("doc_id")

  /** m2: partition-batched decode / feature-extract (*rows-only*).
    * The decode step is STUBBED with a deterministic fake (byte
    * histogram + mean) — the real version would call an image/audio
    * codec here, which this container does not ship. Everything
    * around the stub is real: typed Dataset, `mapPartitions` with
    * explicit batch grouping (the Scala analog of `mapInPandas`
    * batch shape), fixed output schema.
    */
  def m2FeatureStub(t: Tables, batchSize: Int = 32): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch => // decode codecs amortize per batch
          batch.map { case (id, bytes) =>
            // --- STUB: deterministic fake decoder (byte histogram) ---
            val hist = new Array[Int](8)
            var sum = 0L
            bytes.foreach { b => val u = b & 0xff; hist(u % 8) += 1; sum += u }
            val top = hist.indexOf(hist.max)
            (id, bytes.length, top, sum.toDouble / bytes.length, hist.length)
          }
        }
      }
      .toDF("doc_id", "n_bytes", "top_bin", "mean_byte", "feat_dim")
      .withColumn("mean_byte", round(col("mean_byte"), 4))
      .orderBy("doc_id")
  }

  val oracle: Map[String, String] = Map(
    "m1_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  lower(sha256(text)) AS sha256,
        |  substring(lower(hex(CAST(text AS BLOB))), 1, 8) AS magic_hex
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
