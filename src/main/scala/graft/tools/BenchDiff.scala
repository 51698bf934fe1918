package graft.tools

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Machine diff of two Bench records (the one-line JSON `graft.Bench`
  * writes), normalized by the machine-factor sentinel.
  *
  * Why this exists: three rounds in a row (r11–r13) a bench run taken
  * on a contended box was read as a performance regression, and each
  * time a human had to re-derive the same analysis by hand —
  * normalize by the sentinel, check per-query spreads, separate box
  * noise from plan changes. This tool IS that analysis:
  *
  *   - every candidate time is normalized by
  *     (baseline sentinel median / candidate sentinel median), so a
  *     uniformly slower box cancels out;
  *   - a query only counts as a REGRESSION when its normalized ratio
  *     exceeds the threshold, its own min/max spread is tight (wide
  *     spread = the box was noisy during that query), AND it clears
  *     the baseline's own observed max with real daylight: the two
  *     in-suite repeats share cache/GC state, so correlated noise
  *     inflates both and a tight spread alone can't rule it out —
  *     but a candidate min still INSIDE the band the baseline itself
  *     produced on a quiet box is movement the baseline has already
  *     exhibited, not a plan change (first real-record trial: 8 of 8
  *     zero-code-change "regressions" died on exactly this rule);
  *   - a candidate whose sentinel MEDIAN sits well above its own min
  *     was contended for most of the run: regressions are still
  *     listed, but downgraded to suspects and the exit stays 0 —
  *     re-run on a quiet box instead of "fixing" noise;
  *   - the interleaved sentinel also localizes pressure to a BLOCK of
  *     the run (Bench samples it every ⌈n/4⌉ queries): a finding
  *     whose block shows an inflated neighbor sample, and whose
  *     movement is within 2× that pressure ratio, is a suspect, not a
  *     verdict — this catches the mid-run contention window that a
  *     quiet whole-run median hides (the failure mode that burned
  *     three straight rounds of driver benches).
  *
  * Usage: runMain graft.tools.BenchDiff <baseline.json> <candidate.json>
  *        [ratioThreshold]        (default 1.5)
  * Exit 1 iff the candidate has confirmed regressions or new errors.
  */
object BenchDiff {

  final case class Record(
      total: Double,
      queries: Map[String, Double],
      spread: Map[String, (Double, Double)],
      sentinelRuns: Seq[Double],
      errors: Map[String, String],
      /** The documents-shaped sentinel (r15, `sentinel_docs` in the
        * record — empty for records that predate it): the lineitem
        * sentinel is blind to document-page-cache pressure, which the
        * r15 sf3 record showed inflating the doc-heavy block 3–10×
        * while every lineitem sample stayed flat. Same cadence, so
        * the block mapping is shared.
        */
      sentinelDocsRuns: Seq[Double] = Nil) {
    def sentinelMedian: Double = median(sentinelRuns)
    def sentinelMin: Double = if (sentinelRuns.isEmpty) 0.0 else sentinelRuns.min
    private def ratio(runs: Seq[Double]): Double =
      if (runs.isEmpty || runs.min <= 0) 1.0 else median(runs) / runs.min
    /** Contended = the TYPICAL sample is well above the best sample on
      * EITHER table shape: most of the run was slow, not one unlucky
      * interleave. A single outlier sample (max/min spikes, median/min
      * stays ~1) does NOT mark a run contended — the median
      * normalizer absorbs it.
      */
    def contentionRatio: Double =
      math.max(ratio(sentinelRuns), ratio(sentinelDocsRuns))
    def contended: Boolean = contentionRatio > 1.5
  }

  private def median(xs: Seq[Double]): Double = {
    if (xs.isEmpty) return 0.0
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  def parse(json: String): Record = {
    val root = new ObjectMapper().readTree(json)
    def objMap(field: String): Map[String, JsonNode] =
      Option(root.get(field)).map(_.properties().asScala
        .map(e => e.getKey -> e.getValue).toMap).getOrElse(Map.empty)
    Record(
      total = Option(root.get("value")).map(_.asDouble).getOrElse(0.0),
      queries = objMap("queries").map { case (k, v) => k -> v.asDouble },
      spread = objMap("spread").map { case (k, v) =>
        k -> (v.get(0).asDouble, v.get(1).asDouble)
      },
      sentinelRuns = Option(root.get("sentinel")).map(_.get("runs")
        .elements().asScala.map(_.asDouble).toSeq).getOrElse(Nil),
      errors = objMap("errors").map { case (k, v) => k -> v.asText },
      sentinelDocsRuns = Option(root.get("sentinel_docs")).map(_.get("runs")
        .elements().asScala.map(_.asDouble).toSeq).getOrElse(Nil))
  }

  sealed trait Kind
  case object Regression extends Kind      // tight spread, above threshold: real
  case object NoisySuspect extends Kind    // above threshold but wide spread or contended run
  case object Improvement extends Kind
  final case class Finding(kind: Kind, name: String, baseSec: Double,
      candNormSec: Double, ratio: Double)

  /** Floor for flagging: the ratio must be backed by real seconds.
    * Sub-threshold absolute movement on a fast query is run-to-run
    * jitter, never a plan change worth a red exit.
    */
  private val MinBaseSec = 0.05
  private val MinDeltaSec = 0.1

  /** Localized pressure around one query, read off the interleaved
    * sentinel: Bench re-runs the sentinel every ⌈n/4⌉ queries (in the
    * same alphabetical order this tool sees), so each query sits
    * between two known sentinel samples. If either neighbor sample is
    * >1.5× the run's best sample, that BLOCK was under pressure even
    * when the whole-run median looks quiet — the r14 sf3 pair showed
    * exactly this: two runs of identical code, each with one inflated
    * mid-run sample, flagging opposite halves of the same block as
    * "regressions" of each other. Returns the pressure ratio
    * (neighbor max / run min), 1.0 when calm.
    */
  private def blockPressure(r: Record, q: String): Double =
    math.max(blockPressureIn(r, q, r.sentinelRuns),
      // docs-shaped pressure (r15): same cadence, same block mapping —
      // whichever table shape saw the squeeze, the block is suspect
      blockPressureIn(r, q, r.sentinelDocsRuns))

  private def blockPressureIn(r: Record, q: String, runs: Seq[Double]): Double = {
    if (runs.isEmpty || runs.min <= 0) return 1.0
    // Bench's sentinel cadence indexes the FULL sorted selection,
    // including queries that later errored (they land in `errors`,
    // not `queries`) — reconstruct that order or every query after
    // the first error maps to the wrong neighbor samples
    val order = (r.queries.keySet ++ r.errors.keySet).toSeq.sorted
    val idx = order.indexOf(q)
    if (idx < 0) return 1.0
    val every = math.max(1, math.ceil(order.size / 4.0).toInt)
    val pre = math.min(idx / every, runs.size - 1)
    val post = math.min(pre + 1, runs.size - 1)
    math.max(runs(pre), runs(post)) / runs.min
  }

  /** Sentinel-median normalization factor: multiply candidate times by
    * this to land in baseline-box seconds. Shared by [[compare]] and
    * the report in [[main]] so the printed factor is BY CONSTRUCTION
    * the one classification used. Falls back to 1.0 when either
    * record predates the sentinel.
    */
  private def normFactor(base: Record, cand: Record): Double =
    if (base.sentinelMedian > 0 && cand.sentinelMedian > 0)
      base.sentinelMedian / cand.sentinelMedian
    else 1.0

  def compare(base: Record, cand: Record, threshold: Double): Seq[Finding] = {
    // Normalize by sentinel medians so a uniformly slower/faster box
    // cancels (see normFactor).
    val f = normFactor(base, cand)
    base.queries.keySet.intersect(cand.queries.keySet).toSeq.sorted.flatMap { q =>
      val b = base.queries(q)
      val cn = cand.queries(q) * f
      if (b <= 0) None
      else {
        val ratio = cn / b
        val wideSpread = cand.spread.get(q).exists { case (lo, hi) =>
          lo > 0 && hi / lo > 2.0
        }
        // The band the baseline ITSELF produced on its quiet box: a
        // candidate min inside it is movement the baseline already
        // exhibited. Only daylight above it is evidence of a change.
        val baseMax = base.spread.get(q).map(_._2).getOrElse(b)
        // Block-local pressure downgrades a finding only when it can
        // PLAUSIBLY explain it: movement beyond 2× the observed
        // pressure ratio is a change, whatever the sentinel saw (a
        // 500× improvement is not a 2.5× pressure artifact).
        def pressureExplains(moveRatio: Double, pressure: Double): Boolean =
          pressure > 1.5 && moveRatio <= pressure * 2.0
        // base.contended mirrors cand.contended on BOTH branches: a
        // contended baseline inflates the norm factor, manufacturing
        // confirmed-looking regressions from a quiet candidate the
        // same way a contended candidate manufactures improvements —
        // neither direction gets a verdict off a noisy record.
        if (ratio > threshold && b >= MinBaseSec && cn - baseMax >= MinDeltaSec)
          Some(Finding(
            if (wideSpread || cand.contended || base.contended ||
                pressureExplains(ratio, blockPressure(cand, q)))
              NoisySuspect
            else Regression,
            q, b, cn, ratio))
        else if (ratio < 1.0 / threshold && b >= MinBaseSec && (b - cn) >= MinDeltaSec)
          // an "improvement" whose block was under pressure in the
          // BASELINE run is the mirror artifact: the base was
          // inflated. A CONTENDED CANDIDATE is the other mirror: its
          // inflated sentinel median deflates every normalized time,
          // so confirmed-looking improvements print for free — same
          // downgrade as the regression branch, no free wins from a
          // noisy box in either direction.
          Some(Finding(
            if (cand.contended || base.contended ||
                pressureExplains(1.0 / ratio, blockPressure(base, q)))
              NoisySuspect
            else Improvement,
            q, b, cn, ratio))
        else None
      }
    }
  }

  /** The full diff verdict as printable lines + the red-exit flag
    * (confirmed regressions or new errors). Shared by [[main]] and by
    * `graft.Bench`, which runs it inline whenever it updates a
    * canonical record — the last manual step of the noise discipline
    * (remembering to run the diff) removed.
    */
  def report(base: Record, cand: Record,
      threshold: Double = 1.5): (Seq[String], Boolean) = {
    val out = Seq.newBuilder[String]
    val f = normFactor(base, cand)
    out += f"sentinel: base median ${base.sentinelMedian}%.2f  cand median ${cand.sentinelMedian}%.2f  norm factor ${f}%.3f"
    if (cand.contended)
      out += f"CONTENDED CANDIDATE: sentinel median/min ${cand.contentionRatio}%.2f > 1.5 (worst of lineitem/docs shapes) — " +
        "most of the run was slow; regressions below are SUSPECTS, re-run on a quiet box"
    if (base.contended)
      out += "WARNING: baseline record itself looks contended — comparisons are unreliable both ways"
    out += f"total: base ${base.total}%.1fs  cand ${cand.total}%.1fs  cand normalized ${cand.total * f}%.1fs"

    val newErrors = cand.errors.keySet.diff(base.errors.keySet).toSeq.sorted
    newErrors.foreach(q => out += s"NEW ERROR  $q: ${cand.errors(q)}")
    val added = cand.queries.keySet.diff(base.queries.keySet).toSeq.sorted
    val removed = base.queries.keySet.diff(cand.queries.keySet).toSeq.sorted
    if (added.nonEmpty) out += s"added queries: ${added.mkString(", ")}"
    if (removed.nonEmpty) out += s"removed queries: ${removed.mkString(", ")}"

    val findings = compare(base, cand, threshold)
    def show(kind: Kind, label: String): Unit =
      findings.filter(_.kind == kind).sortBy(-_.ratio).foreach { x =>
        out += f"$label  ${x.name}%-30s ${x.baseSec}%7.2fs -> ${x.candNormSec}%7.2fs (x${x.ratio}%.2f normalized)"
      }
    show(Regression, "REGRESSION")
    show(NoisySuspect, "suspect   ")
    show(Improvement, "improved  ")
    if (findings.isEmpty && newErrors.isEmpty) out += "no movement beyond threshold"
    (out.result(), findings.exists(_.kind == Regression) || newErrors.nonEmpty)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <baseline.json> <candidate.json> [ratioThreshold]")
    def read(p: String) = parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8))
    val (lines, bad) = report(read(args(0)), read(args(1)),
      if (args.length > 2) args(2).toDouble else 1.5)
    lines.foreach(println)
    if (bad) sys.exit(1)
  }
}
