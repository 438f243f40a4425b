package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench prior sidecar's clobber-proofing contract (round-17
  * verdict finding #1 + ADVICE): a contended run can only TIGHTEN
  * the per-query guard levels, a faster clean run tightens them
  * further, and one scale's write never touches another scale's
  * line. Pure JVM — no Spark session.
  */
class BenchPriorSpec extends AnyFunSuite {
  import BenchPrior._

  private def rec(sf: String, c: Double, qs: (String, Entry)*) =
    ScaleRecord(sf, c, 0.15, "[[0,0.26]]", "[[0,0.15]]", qs.toMap)

  test("a contended run cannot loosen any sidecar entry; a faster " +
      "clean run tightens") {
    // clean prior: p2 at 13.65 s under canary 0.26 (level ~52.5)
    val clean = rec("sf0.1", 0.26,
      "p2_rag_ingest" -> Entry(13.65, 0.26, 0.15),
      "q1_pricing_summary" -> Entry(0.37, 0.26, 0.15))
    // the round-17 driver regime: p2 324.7 s at canary 0.30 (level
    // 1082 — the inflated value that, written as a prior, would
    // disarm the outlier guard: 3x of 324.7 never trips again)
    val contended = rec("sf0.1", 0.30,
      "p2_rag_ingest" -> Entry(324.7, 0.30, 2.1),
      "q1_pricing_summary" -> Entry(0.78, 0.30, 2.1))
    val m1 = merged(Some(clean), contended)
    assert(m1.queries("p2_rag_ingest") == clean.queries("p2_rag_ingest"),
      "contended p2 loosened the prior")
    assert(m1.queries("q1_pricing_summary") ==
      clean.queries("q1_pricing_summary"))
    // headline canaries describe the LATEST run even when entries
    // keep their clean levels
    assert(m1.canaryS == 0.30)
    // a genuinely faster clean run (same canary, lower seconds)
    // tightens the entry it beats and keeps its own canaries
    val faster = rec("sf0.1", 0.26,
      "p2_rag_ingest" -> Entry(11.2, 0.26, 0.15))
    val m2 = merged(Some(m1), faster)
    assert(m2.queries("p2_rag_ingest").secs == 11.2)
    // the query the faster (subset-shaped) record does not carry
    // keeps its existing entry
    assert(m2.queries("q1_pricing_summary") ==
      clean.queries("q1_pricing_summary"))
  }

  test("canary normalization decides the merge, not raw seconds") {
    // prior measured on a 2x slower machine regime: 20 s at canary
    // 0.52 (level ~38.5); new run 15 s at canary 0.26 (level ~57.7)
    // — raw seconds improved, the normalized level did NOT, so the
    // prior (the cheaper level) survives
    val slowMachine = rec("sf0.1", 0.52,
      "q2_top_revenue" -> Entry(20.0, 0.52, 0.3))
    val next = rec("sf0.1", 0.26,
      "q2_top_revenue" -> Entry(15.0, 0.26, 0.15))
    val m = merged(Some(slowMachine), next)
    assert(m.queries("q2_top_revenue").secs == 20.0,
      "raw-seconds comparison leaked into the merge")
  }

  test("upsert is per-scale: writing sf0.01 leaves the sf0.1 line " +
      "untouched, and reads resolve by scale") {
    val tmp = java.nio.file.Files.createTempFile("bench_prior", ".json")
    try {
      upsert(tmp, rec("sf0.1", 0.26,
        "q1_pricing_summary" -> Entry(0.37, 0.26, 0.15)))
      upsert(tmp, rec("sf0.01", 0.26,
        "q1_pricing_summary" -> Entry(0.09, 0.26, 0.15)))
      val all = readAll(tmp)
      assert(all.map(_.sfTail).sorted == Seq("sf0.01", "sf0.1"))
      assert(all.find(_.sfTail == "sf0.1").get
        .queries("q1_pricing_summary").secs == 0.37)
      assert(all.find(_.sfTail == "sf0.01").get
        .queries("q1_pricing_summary").secs == 0.09)
      // an inflated sf0.01 rewrite still leaves sf0.1 alone AND
      // keeps sf0.01's clean level
      upsert(tmp, rec("sf0.01", 0.26,
        "q1_pricing_summary" -> Entry(9.0, 0.26, 2.0)))
      val after = readAll(tmp)
      assert(after.find(_.sfTail == "sf0.1").get
        .queries("q1_pricing_summary").secs == 0.37)
      assert(after.find(_.sfTail == "sf0.01").get
        .queries("q1_pricing_summary").secs == 0.09)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }

  test("the legacy v1 single-line sidecar parses (2-tuple entries, " +
      "no io fields) and round-trips through render") {
    val v1 = """{"sf_dir":"sf0.1","canary_s":0.264,""" +
      """"canary_series":[[0,0.267],[20,0.264]],""" +
      """"queries":{"p2_rag_ingest":[13.650113173,0.258],""" +
      """"q1_pricing_summary":[0.372362039,0.275]}}"""
    val r = parseLine(v1).get
    assert(r.sfTail == "sf0.1" && r.canaryS == 0.264)
    assert(r.ioCanaryS == 0.0)
    assert(r.queries("p2_rag_ingest") ==
      Entry(13.650113173, 0.258, 0.0))
    assert(r.canarySeries == "[[0,0.267],[20,0.264]]")
    val r2 = parseLine(renderLine(r)).get
    assert(r2 == r, "render/parse round trip drifted")
  }

  test("entry levels: canary-less entries normalize against the " +
      "nominal canary instead of dividing by zero") {
    assert(Entry(3.0, 0.0, 0.0).level == 3.0 / 0.3)
    assert(Entry(3.0, 0.3, 0.0).level == 10.0)
  }

  test("IO-heavy queries merge by the IO canary: a CPU-contended " +
      "but IO-clean run cannot ratchet-loosen an IO-bound prior") {
    // clean prior: p5 at 11.5 s, cpu canary 0.26, io canary 0.15
    val clean = rec("sf0.1", 0.26,
      "p5_index_remove" -> Entry(11.5, 0.26, 0.15))
    // CPU-contended regime (cpu canary 0.52 — halves the CPU level)
    // with CLEAN IO (0.15) and WORSE actual seconds: under a
    // cpu-level merge this would replace the prior (14/0.52 = 26.9
    // < 11.5/0.26 = 44.2) and loosen the io-normalized guard from
    // 3x11.5 to 3x14 — the review's ratchet. The io-level merge
    // keeps the clean prior (14/0.15 > 11.5/0.15).
    val cpuSlow = rec("sf0.1", 0.52,
      "p5_index_remove" -> Entry(14.0, 0.52, 0.15))
    val m = merged(Some(clean), cpuSlow)
    assert(m.queries("p5_index_remove") ==
      clean.queries("p5_index_remove"),
      "cpu-level merge leaked into an IO-heavy query")
    // a genuinely faster IO level still tightens
    val faster = rec("sf0.1", 0.26,
      "p5_index_remove" -> Entry(9.0, 0.26, 0.15))
    assert(merged(Some(m), faster)
      .queries("p5_index_remove").secs == 9.0)
    // mixed v1/v2 (prior has no io canary) falls back to the CPU
    // level — the only unit both carry
    val v1prior = rec("sf0.1", 0.26,
      "p5_index_remove" -> Entry(11.5, 0.26, 0.0))
    val m2 = merged(Some(v1prior), cpuSlow)
    assert(m2.queries("p5_index_remove").secs == 14.0,
      "v1 fallback should compare cpu levels (26.9 < 44.2)")
  }

  test("upsert survives and replaces atomically: the rewrite goes " +
      "through a temp file, never a truncate-in-place") {
    val tmp = java.nio.file.Files.createTempFile("bench_prior", ".json")
    try {
      upsert(tmp, rec("sf0.1", 0.26,
        "q1_pricing_summary" -> Entry(0.37, 0.26, 0.15)))
      // no stray temp files left beside the sidecar
      val dir = tmp.toAbsolutePath.getParent
      val st = java.nio.file.Files.list(dir)
      val strays =
        try st.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .map(_.getFileName.toString)
          .filter(n => n.startsWith(tmp.getFileName.toString) &&
            n.endsWith(".tmp"))
        finally st.close()
      assert(strays.isEmpty, s"stray temp files: ${strays.toSeq}")
      assert(readAll(tmp).nonEmpty)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}
