package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property check: the Spark chunker reproduces the reference's
  * sliding_window loop (append; break after the first window that
  * overruns) for arbitrary text lengths and window geometries —
  * including step > size (gapped sampling) and size > text.
  */
class ChunkPropertySpec extends SparkSpec {

  private def referenceOffsets(n: Int, size: Int, step: Int): Seq[Int] = {
    val b = Seq.newBuilder[Int]
    var i = 0
    var break = false
    while (i < n && !break) { b += i; if (i + size > n) break = true; i += step }
    b.result()
  }

  test("chunk offsets match the reference loop for random texts × geometries") {
    val textGen = for {
      n <- Gen.choose(1, 800)
      cs <- Gen.listOfN(n, Gen.alphaLowerChar)
    } yield cs.mkString
    val texts = Gen.listOfN(60, textGen)
      .apply(Gen.Parameters.default, Seed(42L)).get

    val session = spark
    import session.implicits._
    for ((size, step) <- Seq((200, 100), (5, 3), (8, 8), (7, 11), (1000, 100))) {
      val df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "text")
      // same expression graft.operators.Ingest.chunks builds
      val n = length(col("text"))
      val offsets = filter(
        sequence(lit(0), n - 1, lit(step)),
        i => i === 0 || i - step + size <= n)
      val got = df
        .select(col("doc_id"), explode(offsets).as("start"))
        .collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getInt(1)).sorted.toSeq).toMap
      texts.zipWithIndex.foreach { case (s, i) =>
        val expect = referenceOffsets(s.length, size, step)
        assert(got.getOrElse(i.toLong, Seq.empty) == expect,
          s"len=${s.length} size=$size step=$step")
      }
    }
  }
}
