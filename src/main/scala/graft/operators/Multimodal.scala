package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame}
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

  /** m2: partition-batched decode / feature-extract. The decode step
    * is STUBBED with a deterministic fake (byte histogram + mean) —
    * the real version would call an image/audio codec here, which
    * this container does not ship. Everything around the stub is
    * real: typed Dataset, `mapPartitions` with explicit batch
    * grouping (the Scala analog of `mapInPandas` batch shape), fixed
    * output schema. The fake decoder is pure byte math over an ASCII
    * payload, so even the stub is HASH-GATED: the oracle replays the
    * histogram/mean from the text — a codec swap-in would revert this
    * row to rows-only, the plumbing checks stay.
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
      // portable rounding: mean = sum/len has a small power-of-two-ish
      // denominator, exactly the regime where round() half-up on the
      // shortest-string repr and the oracle's binary rounding diverge
      .withColumn("mean_byte",
        floor(col("mean_byte") * 10000 + 0.5) / 10000.0)
      .orderBy("doc_id")
  }

  /** m3: frame sampling + thumbnail resize over a fake "video"
    * column: the binary payload is segmented into fixed-size FRAMES,
    * every `stride`-th frame is sampled (keyframe extraction), and
    * each sampled frame is "resized" to a 4-value thumbnail by
    * block-averaging its bytes (the downsample shape). One input row
    * fans out map-side to one row per sampled frame; partition
    * batching amortizes the (real-world) codec, exactly like m2. The
    * byte math is oracle-CHECKED (the synthetic payload is ASCII, so
    * DuckDB reproduces it from the text), unlike m2's declared-stub
    * histogram.
    */
  def m3FrameSample(t: Tables, frameBytes: Int = 32, stride: Int = 2,
      batchSize: Int = 32): DataFrame = {
    val spark = t.spark
    import spark.implicits._
    t.documents
      .select(col("doc_id"), col("text").cast("binary").as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.grouped(batchSize).flatMap { batch => // codec state amortizes per batch
          batch.flatMap { case (id, bytes) =>
            val nFrames = bytes.length / frameBytes
            (0 until nFrames by stride).map { f =>
              val off = f * frameBytes
              val block = frameBytes / 4
              val thumb = Array.tabulate(4) { b =>
                var s = 0
                var k = 0
                while (k < block) { s += bytes(off + b * block + k) & 0xff; k += 1 }
                s / block
              }
              md.reset()
              val h = md.digest(java.util.Arrays.copyOfRange(bytes, off,
                off + frameBytes)).map("%02x".format(_)).mkString
              (id, f, nFrames, thumb(0), thumb(1), thumb(2), thumb(3), h)
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "n_frames", "t0", "t1", "t2", "t3",
        "frame_md5")
      .orderBy("doc_id", "frame_idx")
  }

  /** m6: VISION-TOKEN PATCH BUDGETING — the preprocessing math every
    * modern VLM data pipeline runs per image (Qwen-VL's smart_resize
    * / LLaVA's anyres layout): the image's pixel grid is cut into
    * `patch`×`patch` ViT patches, and images whose patch count
    * exceeds the per-sample `budget` are downscaled by
    * s = √(budget/patches) with both dims snapped DOWN to patch
    * multiples — so every sample's token cost is known and bounded
    * BEFORE batch assembly (m4's packer consumes these counts).
    *
    * The decode is the STUB (this container ships no codec): (w, h)
    * derive deterministically from the payload's md5 — the swap
    * point is exactly one projection; every downstream expression is
    * the real budgeting math, so the whole op is HASH-GATED (the
    * oracle replays the md5-hex arithmetic via the proven
    * ('0x'||hex)::UBIGINT ≡ conv(hex,16,10) identity and the same
    * floor/sqrt doubles).
    *
    * Scale: pure per-row projection fused with the scan — no
    * shuffle, no state; the snap-down floor guarantees
    * patches_fit ≤ budget (w_fit·h_fit ≤ s²·w_s·h_s = budget·p²).
    */
  /** The REAL budgeting math over caller-supplied (w, h) decode
    * columns — the swap surface a production pipeline uses: pass the
    * projections a real header parse / codec emits and every
    * downstream expression is unchanged (`Graft.patchBudget`). Pure
    * fused projection; no shuffle.
    */
  private[graft] def patchBudgetFrom(df: DataFrame, idCol: String,
      wDecode: Column, hDecode: Column, patch: Int,
      budget: Int): DataFrame = {
    val p = lit(patch.toDouble)
    df
      .select(col(idCol), wDecode.as("w"), hDecode.as("h"))
      // snap the raw dims UP to patch multiples (the pixel grid a
      // ViT actually consumes), then count patches
      .withColumn("w_s", (ceil(col("w") / p) * patch).cast("long"))
      .withColumn("h_s", (ceil(col("h") / p) * patch).cast("long"))
      .withColumn("patches_raw",
        ((col("w_s") / patch) * (col("h_s") / patch)).cast("long"))
      .withColumn("s", when(col("patches_raw") <= budget, lit(1.0))
        .otherwise(sqrt(lit(budget.toDouble) / col("patches_raw"))))
      .withColumn("w_fit", greatest(lit(patch.toLong),
        (floor(col("w_s") * col("s") / p) * patch).cast("long")))
      .withColumn("h_fit", greatest(lit(patch.toLong),
        (floor(col("h_s") * col("s") / p) * patch).cast("long")))
      .withColumn("img_tokens",
        ((col("w_fit") / patch) * (col("h_fit") / patch)).cast("long"))
      .select(col(idCol), col("w"), col("h"), col("patches_raw"),
        col("w_fit"), col("h_fit"), col("img_tokens"))
  }

  /** m6's stub decode: (w, h) derive deterministically from the
    * payload's md5 — the ONE projection a real codec replaces.
    */
  private[graft] def stubDims: (Column, Column) = {
    val md = md5(col("text"))
    (lit(224) + (conv(substring(md, 1, 6), 16, 10).cast("long") % 1600),
      lit(224) + (conv(substring(md, 7, 6), 16, 10).cast("long") % 1200))
  }

  def m6PatchBudget(t: Tables, patch: Int = 14,
      budget: Int = 1024): DataFrame = {
    val (w, h) = stubDims
    patchBudgetFrom(t.documents, "doc_id", w, h, patch, budget)
      .orderBy("doc_id")
  }

  /** m4: PAIRED SAMPLE ASSEMBLY (CLIP-style) — the join that builds
    * multimodal training records: a CAPTIONS side (doc text,
    * truncated to caption length) and a MEDIA side (the binary
    * payload + its sha) matched on doc_id, fingerprinted as a pair,
    * and laid out into fixed-size PER-SHARD batches (batch id +
    * in-batch position) — the record layout a contrastive trainer
    * consumes. Per-shard batching for the same reason as t6: a
    * GLOBAL batch order would serialize the corpus through one
    * partition; shard-local order is what real pipelines ship.
    *
    * Scale: the caption⋈media join is id-keyed (co-partitioned /
    * bucketed storage in production — here one shuffle); the batch
    * window shuffles by source shard only; everything else is a
    * projection.
    */
  def m4PairedSample(t: Tables, batchSize: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val caps = t.documents.select(col("doc_id"), col("source"),
      md5(substring(col("text"), 1, 64)).as("cap_md5"))
    val media = t.documents.select(col("doc_id"),
      lower(sha2(col("text"), 256)).as("bin_sha"))
    val w = Window.partitionBy("source").orderBy("doc_id")
    caps.join(media, "doc_id")
      .withColumn("pair_fp", md5(concat(col("cap_md5"), col("bin_sha"))))
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("source"),
        col("pair_fp"),
        concat(col("source"), lit(":"),
          floor((col("rn") - 1) / batchSize).cast("long")).as("batch_id"),
        ((col("rn") - 1) % batchSize).cast("int").as("pos"))
      .orderBy("doc_id")
  }

  /** m5: BINARY CONTENT-HASH DEDUP — the FIRST dedup every
    * multimodal pipeline runs: identical media payloads re-crawled
    * under different ids collapse by their sha-256 BEFORE any decode
    * or embedding is paid (LAION/CommonCrawl image dedup by content
    * hash). The report emits each duplicated digest with its copy
    * count, keeper (min doc_id — the survivor convention), and the
    * payload bytes reclaimed by keeping one copy. Payload = the
    * document's first 128 bytes under the family's text-as-bytes
    * convention (the synthetic corpus's near-dup docs share their
    * head, so the corpus has genuine duplicate payloads; a media
    * corpus hashes the raw blob the same way).
    *
    * Scale: the payload is hashed IN the scan projection and only
    * the 32-byte digest + length shuffle to the ONE groupBy — the
    * blob itself never moves; digests are hash-uniform, so the
    * groupBy has no planned skew. Output is duplication-sized.
    */
  def m5BinaryDedup(t: Tables, payloadBytes: Int = 128): DataFrame =
    t.documents
      .select(col("doc_id"),
        lower(sha2(substring(col("text"), 1, payloadBytes), 256))
          .as("sha256"),
        length(substring(col("text"), 1, payloadBytes).cast("binary"))
          .as("n_bytes"))
      .groupBy("sha256")
      .agg(count(lit(1)).as("n_copies"),
        min("doc_id").as("keep_doc"),
        min("n_bytes").as("nb"))
      .filter(col("n_copies") >= 2)
      .select(col("sha256"), col("n_copies"), col("keep_doc"),
        ((col("n_copies") - 1) * col("nb")).as("bytes_saved"))
      .orderBy("sha256")

  val oracle: Map[String, String] = Map(
    // the digest groupBy replayed: per-dup-group copy count, min-id
    // keeper, reclaimed bytes
    "m5_binary_dedup" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    lower(sha256(substring(text, 1, 128))) AS sha256,
        |    octet_length(CAST(substring(text, 1, 128) AS BLOB)) AS n_bytes
        |  FROM documents)
        |SELECT sha256, count(*) AS n_copies, min(doc_id) AS keep_doc,
        |  (count(*) - 1) * min(n_bytes) AS bytes_saved
        |FROM h GROUP BY sha256 HAVING count(*) >= 2
        |ORDER BY sha256""".stripMargin,
    // the stub decode's md5-hex arithmetic via ('0x'||hex)::UBIGINT ≡
    // conv(hex,16,10), then the identical ceil/sqrt/floor budgeting
    // doubles — every cast input is an exact integer-valued double,
    // so DuckDB's round-on-cast and Spark's truncate agree
    "m6_patch_budget" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    224 + CAST(('0x' || substring(md5(text), 1, 6))::UBIGINT
        |               % 1600 AS BIGINT) AS w,
        |    224 + CAST(('0x' || substring(md5(text), 7, 6))::UBIGINT
        |               % 1200 AS BIGINT) AS h
        |  FROM documents),
        |s1 AS (
        |  SELECT doc_id, w, h,
        |    CAST(ceil(w / 14.0) * 14 AS BIGINT) AS w_s,
        |    CAST(ceil(h / 14.0) * 14 AS BIGINT) AS h_s
        |  FROM d),
        |s2 AS (
        |  SELECT *, CAST((w_s / 14.0) * (h_s / 14.0) AS BIGINT)
        |    AS patches_raw FROM s1),
        |s3 AS (
        |  SELECT *, CASE WHEN patches_raw <= 1024 THEN 1.0
        |                 ELSE sqrt(1024.0 / patches_raw) END AS s
        |  FROM s2),
        |s4 AS (
        |  SELECT doc_id, w, h, patches_raw,
        |    greatest(14, CAST(floor(w_s * s / 14.0) * 14 AS BIGINT))
        |      AS w_fit,
        |    greatest(14, CAST(floor(h_s * s / 14.0) * 14 AS BIGINT))
        |      AS h_fit
        |  FROM s3)
        |SELECT doc_id, w, h, patches_raw, w_fit, h_fit,
        |  CAST((w_fit / 14.0) * (h_fit / 14.0) AS BIGINT) AS img_tokens
        |FROM s4 ORDER BY doc_id""".stripMargin,
    // caption/media sides re-derived + the per-shard batch window
    "m4_paired_sample" ->
      """WITH caps AS (
        |  SELECT doc_id, source, md5(substring(text, 1, 64)) AS cap_md5
        |  FROM documents),
        |media AS (
        |  SELECT doc_id, lower(sha256(text)) AS bin_sha FROM documents),
        |j AS (
        |  SELECT c.doc_id, c.source,
        |    md5(c.cap_md5 || m.bin_sha) AS pair_fp,
        |    row_number() OVER (PARTITION BY c.source ORDER BY c.doc_id) AS rn
        |  FROM caps c JOIN media m ON m.doc_id = c.doc_id)
        |SELECT doc_id, source, pair_fp,
        |  source || ':' || CAST((rn - 1) // 32 AS BIGINT) AS batch_id,
        |  CAST((rn - 1) % 32 AS INT) AS pos
        |FROM j ORDER BY doc_id""".stripMargin,
    // replays the stub decoder's byte math from the ASCII payload:
    // mod-8 histogram, first-max bin, portable-rounded mean byte
    "m2_feature_stub" ->
      """WITH b AS (
        |  SELECT doc_id, length(text) AS n,
        |    [ascii(substring(text, CAST(i AS INT), 1))
        |     FOR i IN range(1, length(text) + 1)] AS bytes
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, n,
        |    [len(list_filter(bytes, x -> x % 8 = bin))
        |     FOR bin IN range(0, 8)] AS hist,
        |    list_sum(bytes) AS s
        |  FROM b)
        |SELECT doc_id, n AS n_bytes,
        |  list_position(hist, list_aggregate(hist, 'max')) - 1 AS top_bin,
        |  floor(CAST(s AS DOUBLE) / n * 10000 + 0.5) / 10000.0 AS mean_byte,
        |  8 AS feat_dim
        |FROM h ORDER BY doc_id""".stripMargin,
    "m1_binary_meta" ->
      """SELECT doc_id,
        |  octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  lower(sha256(text)) AS sha256,
        |  substring(lower(hex(CAST(text AS BLOB))), 1, 8) AS magic_hex
        |FROM documents ORDER BY doc_id""".stripMargin,
    // payload is ASCII text, so frames/thumbnails are reproducible
    // from substring+ascii byte math
    "m3_frame_sample" ->
      """WITH f AS (
        |  -- // not /: DuckDB '/' is float division and CAST rounds,
        |  -- which would invent a trailing partial frame
        |  SELECT doc_id, text, CAST(length(text) // 32 AS INT) AS n_frames
        |  FROM documents),
        |fr AS (
        |  SELECT doc_id, n_frames, CAST(i AS INT) AS frame_idx,
        |    substring(text, CAST(i AS INT) * 32 + 1, 32) AS frame
        |  FROM (SELECT doc_id, n_frames, text,
        |          unnest(range(0, n_frames, 2)) AS i
        |        FROM f) u)
        |SELECT doc_id, frame_idx, n_frames,
        |  CAST(list_sum([ascii(substring(frame, CAST(k AS INT), 1))
        |                 FOR k IN range(1, 9)]) // 8 AS INT) AS t0,
        |  CAST(list_sum([ascii(substring(frame, CAST(k AS INT), 1))
        |                 FOR k IN range(9, 17)]) // 8 AS INT) AS t1,
        |  CAST(list_sum([ascii(substring(frame, CAST(k AS INT), 1))
        |                 FOR k IN range(17, 25)]) // 8 AS INT) AS t2,
        |  CAST(list_sum([ascii(substring(frame, CAST(k AS INT), 1))
        |                 FOR k IN range(25, 33)]) // 8 AS INT) AS t3,
        |  md5(frame) AS frame_md5
        |FROM fr ORDER BY doc_id, frame_idx""".stripMargin
  )
}
