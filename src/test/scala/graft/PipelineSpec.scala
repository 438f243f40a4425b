package graft

import org.apache.spark.sql.functions._

/** p1's claim is COMPOSITION: each funnel stage must agree with the
  * standalone operator whose expression tree it reuses. These drills
  * check the funnel against t1/t2/t4/d7's own outputs, doc-set-level
  * where the report only shows counts.
  */
class PipelineSpec extends SparkSpec {

  private def funnel: Map[String, (Long, Long, Long, Long)] =
    run("p1_curation_funnel").collect().map { r =>
      r.getAs[String]("stage") -> ((r.getAs[Long]("n_in"),
        r.getAs[Long]("n_out"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("toks_out")))
    }.toMap

  private def stageDocs: Map[String, Set[Long]] = {
    val t = Tables(spark, sf)
    graft.operators.Pipeline
      .stages(t.documents.select("doc_id", "text"), 0.35, 5, 97L)
      .map { case (n, df) =>
        n -> df.select("doc_id").collect().map(_.getLong(0)).toSet
      }.toMap
  }

  test("p1 funnel: 6 chained rows — n_in threads, drops add up, " +
      "docs and tokens are non-increasing, every stage bites") {
    val rows = run("p1_curation_funnel").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Int]("ord")).toSeq == (0 to 5))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_out"))
      assert(b.getAs[Long]("n_out") <= b.getAs[Long]("n_in"))
      assert(b.getAs[Long]("toks_out") <= a.getAs[Long]("toks_out"))
    }
    rows.foreach(r => assert(r.getAs[Long]("n_dropped") ==
      r.getAs[Long]("n_in") - r.getAs[Long]("n_out")))
    // the synthetic corpus exercises the quality, language, near-dup
    // and decontamination cuts (exact dup text only exists at sf0.1)
    val f = funnel
    assert(f("quality")._3 > 0 && f("language")._3 > 0 &&
      f("near_dedup")._3 > 0 && f("decontaminate")._3 > 0)
  }

  test("p1 quality stage = t2's own score cut; language stage = t1's " +
      "own 'en' argmax over the quality survivors") {
    val docs = stageDocs
    val t2en = run("t2_quality_score").collect()
      .filter(_.getAs[Double]("q_score") >= 0.35)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(docs("quality") == t2en)
    val t1en = run("t1_langid").collect()
      .filter(_.getAs[String]("pred_lang") == "en")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(docs("language") == docs("quality").intersect(t1en))
  }

  test("p1 near-dedup keeps exactly one doc per t4 fingerprint; " +
      "exact dedup one per content md5") {
    val docs = stageDocs
    val fp = run("t4_fingerprint").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("fingerprint"))).toMap
    val kept = docs("near_dedup").toSeq.flatMap(id => fp(id).map(_ -> id))
    assert(kept.groupBy(_._1).forall(_._2.size == 1),
      "two near-dedup survivors share a fingerprint")
    // and every dropped doc lost to a SMALLER-id survivor with the
    // same fingerprint (keep-min-id policy)
    val surv = kept.toMap
    (docs("exact_dedup") -- docs("near_dedup")).foreach { id =>
      val f = fp(id).get
      assert(surv(f) < id)
    }
  }

  test("p1 decontamination = d7's contract: no survivor is a bench " +
      "doc or shares a 5-gram with one; facade returns the same set") {
    val docs = stageDocs
    val contaminated = run("d7_decontaminate").collect()
      .map(_.getAs[Long]("train_id")).toSet
    docs("decontaminate").foreach { id =>
      assert(id % 97 != 0, s"bench doc $id survived")
      assert(!contaminated(id), s"contaminated doc $id survived")
    }
    // the stage dropped ONLY bench/contaminated docs
    (docs("near_dedup") -- docs("decontaminate")).foreach { id =>
      assert(id % 97 == 0 || contaminated(id))
    }
    val t = Tables(spark, sf)
    val curated = graft.api.Graft
      .curate(t.documents, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(curated == docs("decontaminate"))
  }
}
