package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** The compiled expressions must be bit-identical to their
  * higher-order-function twins (which the DuckDB oracle mirrors).
  */
class ExprSpec extends SparkSpec {

  private def toksDf = Tables(spark, sf).documents
    .withColumn("tk", Text.tokenize(col("text")))

  test("ShingleArray == HOF shingles (set and order) for k=3 and k=5") {
    for (k <- Seq(3, 5)) {
      val rows = toksDf
        .select(Text.shingles(k)(col("tk")).as("slow"),
          Text.shinglesFast(k)(col("tk")).as("fast"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k")
      }
    }
  }

  test("MinHashSig == HOF conv/affine minhash") {
    val hof = toksDf
      .withColumn("sh", Text.shingles(3)(col("tk")))
      .filter(size(col("sh")) > 0)
      .withColumn("hs", transform(col("sh"), s => {
        val m = md5(s)
        struct(conv(m.substr(1, 8), 16, 10).cast("long").as("h1"),
          conv(m.substr(9, 8), 16, 10).cast("long").as("h2"))
      }))
      .select(col("doc_id"), transform(sequence(lit(0), lit(15)),
        p => array_min(transform(col("hs"),
          h => (h.getField("h1") + p * h.getField("h2")) % 4294967291L))).as("mhs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fast = toksDf
      .withColumn("sh", Text.shinglesFast(3)(col("tk")))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), Text.minhashSig(col("sh")).as("mhs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(hof.keySet == fast.keySet)
    hof.foreach { case (id, sig) => assert(fast(id) == sig, s"doc $id") }
  }
}
