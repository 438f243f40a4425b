package graft

/** The bench's self-sufficient prior sidecar (`bench_prior.json`):
  * one JSON line PER SCALE (keyed by `sf_dir`), each carrying every
  * query's (seconds, local CPU canary, local IO canary) plus the
  * run-level canary series. Two hardening rules, both from measured
  * failure modes:
  *
  *  - **Per-scale lines** — a clean full run at another scale (sf1
  *    after sf0.1) must not clobber this scale's priors; each scale
  *    merges only into its own line (round-17 ADVICE: the
  *    single-scale sidecar re-disarmed the outlier guard for the
  *    other scale's next run).
  *  - **Min-canary-normalized merge** — a write merges per query
  *    into the existing same-scale line, keeping whichever entry has
  *    the LOWER canary-normalized level (secs / cpu-canary), with
  *    its own canaries. A heavily IO-contended run (round 17: the
  *    driver bench recorded p2 at 324.7 s where two clean runs read
  *    13.7 s) can therefore only TIGHTEN the guard, never loosen it
  *    — 3x of an inflated prior would otherwise never trip again.
  *    A faster clean run still tightens every entry it beats.
  *
  * Parsing is a permissive per-line regex (the writer controls the
  * format; a junk line is skipped, never a failure), and the legacy
  * single-line v1 format (no `io_canary_s`, 2-tuple query entries)
  * reads as one scale record with io canaries of 0.
  */
private[graft] object BenchPrior {

  /** One query's prior: published seconds plus the CPU and IO canary
    * samples nearest its run position. `ioC == 0` means the entry
    * predates the IO canary (v1 sidecars / BENCH_r fallback).
    */
  final case class Entry(secs: Double, c: Double, ioC: Double) {
    /** CPU-canary-normalized level. A canary-less entry normalizes
      * against a nominal 0.3 s canary (this host's clean level)
      * rather than winning or losing by division by zero.
      */
    def level: Double = if (c > 0) secs / c else secs / 0.3

    /** IO-canary-normalized level (nominal 0.1 s when absent). */
    def ioLevel: Double = if (ioC > 0) secs / ioC else secs / 0.1
  }

  /** The queries whose dominant cost is the filesystem, not the CPU:
    * the streaming family (per-batch state stores + file sinks), the
    * lake family (table rewrites), and the index build/delete gates.
    * These guard, normalize, AND merge against the IO canary — their
    * contended inflation tracks device stalls the CPU canary is
    * blind to (round 17: p2 21x slow at CPU canary 1.15x).
    */
  private[graft] def ioHeavy(name: String): Boolean =
    name.startsWith("st") || name.startsWith("io") ||
      name == "p2_rag_ingest" || name == "p5_index_remove"

  /** The merge comparator: an IO-heavy query's entries compare by
    * IO-normalized level when BOTH carry an IO canary — a
    * CPU-contended-but-IO-clean run would otherwise read as a LOWER
    * cpu-level for an IO-bound query and ratchet-LOOSEN exactly the
    * priors the IO canary protects (its seconds didn't improve; its
    * CPU canary inflated). Mixed v1/v2 entries fall back to the
    * CPU level — the only comparable unit both sides carry.
    */
  private def levelFor(name: String, a: Entry, b: Entry)
      : (Double, Double) =
    if (ioHeavy(name) && a.ioC > 0 && b.ioC > 0)
      (a.ioLevel, b.ioLevel)
    else (a.level, b.level)

  /** One scale's full prior record. The series fields hold the raw
    * JSON arrays verbatim — the record is evidence, not a model.
    */
  final case class ScaleRecord(sfTail: String, canaryS: Double,
      ioCanaryS: Double, canarySeries: String, ioCanarySeries: String,
      queries: Map[String, Entry])

  private val sfRe = """"sf_dir":"([^"]+)"""".r
  private val cRe = """"canary_s":([0-9.eE+-]+)""".r
  private val ioCRe = """"io_canary_s":([0-9.eE+-]+)""".r
  private val serRe = """"canary_series":(\[(?:\[[^\]]*\],?)*\])""".r
  private val ioSerRe = """"io_canary_series":(\[(?:\[[^\]]*\],?)*\])""".r
  private val qRe =
    """"([a-z0-9_]+)":\[([0-9.eE+-]+),([0-9.eE+-]+)(?:,([0-9.eE+-]+))?\]""".r

  private[graft] def parseLine(line: String): Option[ScaleRecord] =
    try {
      val sf = sfRe.findFirstMatchIn(line).map(_.group(1))
      if (sf.isEmpty) None
      else {
        val c = cRe.findFirstMatchIn(line)
          .flatMap(_.group(1).toDoubleOption).getOrElse(0.0)
        val ioC = ioCRe.findFirstMatchIn(line)
          .flatMap(_.group(1).toDoubleOption).getOrElse(0.0)
        val ser = serRe.findFirstMatchIn(line).map(_.group(1))
          .getOrElse("[]")
        val ioSer = ioSerRe.findFirstMatchIn(line).map(_.group(1))
          .getOrElse("[]")
        // query entries live only after the "queries": key — the
        // series arrays above hold unquoted [i, secs] pairs that the
        // entry regex cannot match, but scoping is cheap insurance
        val at = line.indexOf("\"queries\":")
        val qs =
          if (at < 0) Map.empty[String, Entry]
          else qRe.findAllMatchIn(line.substring(at)).flatMap { m =>
            for (s <- m.group(2).toDoubleOption;
                 cc <- m.group(3).toDoubleOption)
              yield m.group(1) -> Entry(s, cc,
                Option(m.group(4)).flatMap(_.toDoubleOption)
                  .getOrElse(0.0))
          }.toMap
        if (qs.isEmpty) None
        else Some(ScaleRecord(sf.get, c, ioC, ser, ioSer, qs))
      }
    } catch { case _: Throwable => None }

  private[graft] def renderLine(r: ScaleRecord): String = {
    val qs = r.queries.toSeq.sortBy(_._1).map { case (k, e) =>
      s""""$k":[${e.secs},${e.c},${e.ioC}]"""
    }.mkString("{", ",", "}")
    s"""{"sf_dir":"${r.sfTail}","canary_s":${r.canaryS},""" +
      s""""io_canary_s":${r.ioCanaryS},""" +
      s""""canary_series":${r.canarySeries},""" +
      s""""io_canary_series":${r.ioCanarySeries},"queries":$qs}"""
  }

  /** Merge a fresh run's record into the same scale's existing one:
    * per query, keep the entry with the lower canary-normalized
    * level (its own canaries ride along); queries only one side
    * knows keep that side. Headline canaries and series are the NEW
    * run's — they describe the latest measurement; the per-query
    * entries are the guard's reference and each carries the canaries
    * it was measured under.
    */
  private[graft] def merged(prior: Option[ScaleRecord],
      next: ScaleRecord): ScaleRecord = prior match {
    case None => next
    case Some(p) =>
      val qs = (p.queries.keySet ++ next.queries.keySet).iterator.map {
        k =>
          k -> ((p.queries.get(k), next.queries.get(k)) match {
            case (Some(a), Some(b)) =>
              val (la, lb) = levelFor(k, a, b)
              if (lb < la) b else a
            case (Some(a), None) => a
            case (None, Some(b)) => b
            case (None, None) => sys.error("unreachable")
          })
      }.toMap
      next.copy(queries = qs)
  }

  private[graft] def readAll(
      path: java.nio.file.Path): Seq[ScaleRecord] =
    try {
      if (!java.nio.file.Files.exists(path)) Nil
      else new String(java.nio.file.Files.readAllBytes(path),
        java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .flatMap(parseLine)
    } catch { case _: Throwable => Nil }

  /** Replace-or-append `next`'s scale line, leaving every other
    * scale's line untouched, with the min-normalized merge applied
    * against the existing same-scale record. The rewrite is
    * temp-file + atomic-move — a truncating in-place write killed
    * mid-stream would destroy EVERY scale's priors at once (the
    * permissive reader skips torn lines silently, re-disarming the
    * guard — the exact failure this sidecar exists to prevent).
    */
  private[graft] def upsert(path: java.nio.file.Path,
      next: ScaleRecord): Unit = {
    val all = readAll(path)
    val m = merged(all.find(_.sfTail == next.sfTail), next)
    val out = (all.filterNot(_.sfTail == next.sfTail) :+ m)
      .sortBy(_.sfTail)
    val dir = Option(path.toAbsolutePath.getParent)
      .getOrElse(java.nio.file.Paths.get("."))
    val tmp = java.nio.file.Files.createTempFile(dir,
      path.getFileName.toString, ".tmp")
    java.nio.file.Files.write(tmp,
      (out.map(renderLine).mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, path.toAbsolutePath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }
}
