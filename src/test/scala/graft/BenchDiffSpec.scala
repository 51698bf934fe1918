package graft

import graft.tools.BenchDiff
import graft.tools.BenchDiff.{Finding, Improvement, NoisySuspect, Record, Regression}
import org.scalatest.funsuite.AnyFunSuite

/** BenchDiff is the codified version of the sentinel-normalization
  * analysis BASELINE.md prescribes for every bench comparison: these
  * tests pin the exact classifications three rounds of manual
  * adjudication converged on (slower box ≠ regression; wide per-query
  * spread ≠ regression; contended run downgrades everything).
  */
class BenchDiffSpec extends AnyFunSuite {

  private def rec(
      queries: Map[String, Double],
      sentinel: Seq[Double],
      spread: Map[String, (Double, Double)] = Map.empty,
      errors: Map[String, String] = Map.empty) =
    Record(queries.values.sum, queries, spread, sentinel, errors)

  test("parse reads Bench's one-line shape: queries, spread, sentinel runs, errors") {
    val json =
      """{"metric":"total","value":1.5,"unit":"sec",
        |"queries":{"q1":1.0,"q2":0.5},
        |"spread":{"q1":[1.0,1.2],"q2":[0.5,1.3]},
        |"builds":{"_build:x":9.0},"build_total":9.0,
        |"sentinel":{"runs":[0.8,0.9,0.85],"min":0.8,"median":0.85,"max":0.9},
        |"n_err":1,"errors":{"q3":"boom"},"sf":"/tmp/x"}""".stripMargin.replace("\n", "")
    val r = BenchDiff.parse(json)
    assert(r.total == 1.5)
    assert(r.queries == Map("q1" -> 1.0, "q2" -> 0.5))
    assert(r.spread("q2") == (0.5, 1.3))
    assert(r.sentinelRuns == Seq(0.8, 0.9, 0.85))
    assert(r.sentinelMedian == 0.85)
    assert(r.errors == Map("q3" -> "boom"))
    assert(!r.contended)
  }

  test("a uniformly slower box is NOT a regression: sentinel normalization cancels it") {
    val base = rec(Map("q1" -> 1.0, "q2" -> 0.4), sentinel = Seq(0.8, 0.8, 0.8))
    // same plans on a 2x slower box: every query AND the sentinel double
    val cand = rec(Map("q1" -> 2.0, "q2" -> 0.8), sentinel = Seq(1.6, 1.6, 1.6))
    assert(BenchDiff.compare(base, cand, 1.5).isEmpty)
  }

  test("a tight-spread 2x on a quiet box IS a regression; sub-floor jitter is not") {
    val base = rec(Map("q1" -> 1.0, "tiny" -> 0.02), sentinel = Seq(0.8, 0.8, 0.8))
    val cand = rec(
      Map("q1" -> 2.0, "tiny" -> 0.06), // tiny tripled but moved 40ms
      sentinel = Seq(0.8, 0.8, 0.8),
      spread = Map("q1" -> (2.0, 2.1), "tiny" -> (0.06, 0.06)))
    val fs = BenchDiff.compare(base, cand, 1.5)
    assert(fs == Seq(Finding(Regression, "q1", 1.0, 2.0, 2.0)))
  }

  test("a candidate inside the baseline's own observed band is NOT a regression") {
    // the r11c->r14 false-positive shape: zero code change, candidate
    // min 0.71s over base min 0.31s (x2.3) — but the BASELINE itself
    // hit 1.07s on its max repeat, so 0.71 is movement the quiet box
    // already exhibited
    val base = rec(Map("q1" -> 0.31), sentinel = Seq(0.8, 0.8, 0.8),
      spread = Map("q1" -> (0.31, 1.07)))
    val cand = rec(Map("q1" -> 0.71), sentinel = Seq(0.8, 0.8, 0.8),
      spread = Map("q1" -> (0.71, 0.75)))
    assert(BenchDiff.compare(base, cand, 1.5).isEmpty)
    // daylight above the base band still flags
    val cand2 = rec(Map("q1" -> 1.3), sentinel = Seq(0.8, 0.8, 0.8),
      spread = Map("q1" -> (1.3, 1.35)))
    assert(BenchDiff.compare(base, cand2, 1.5).map(_.kind) == Seq(Regression))
  }

  test("wide per-query spread downgrades the same 2x to a noisy suspect") {
    val base = rec(Map("q1" -> 1.0), sentinel = Seq(0.8, 0.8, 0.8))
    val cand = rec(Map("q1" -> 2.0), sentinel = Seq(0.8, 0.8, 0.8),
      spread = Map("q1" -> (2.0, 5.0))) // the box was noisy during q1
    assert(BenchDiff.compare(base, cand, 1.5).map(_.kind) == Seq(NoisySuspect))
  }

  test("a contended candidate (sentinel median well above min) downgrades regressions") {
    val base = rec(Map("q1" -> 1.0), sentinel = Seq(0.8, 0.8, 0.8))
    val cand = rec(Map("q1" -> 4.0), sentinel = Seq(0.9, 2.0, 2.2),
      spread = Map("q1" -> (4.0, 4.1)))
    assert(cand.contended)
    assert(BenchDiff.compare(base, cand, 1.5).map(_.kind) == Seq(NoisySuspect))
  }

  test("one outlier sentinel sample does NOT mark a run contended (median absorbs it)") {
    // the r14 sf3 record's shape: four samples ~1.75, one 8.3 outlier
    val r = rec(Map("q1" -> 1.0), sentinel = Seq(1.72, 8.34, 1.8, 1.79, 1.73))
    assert(!r.contended)
  }

  test("improvements are reported with the same floor rules") {
    val base = rec(Map("q1" -> 2.0, "tiny" -> 0.03), sentinel = Seq(0.8))
    val cand = rec(Map("q1" -> 0.5, "tiny" -> 0.01), sentinel = Seq(0.8))
    val fs = BenchDiff.compare(base, cand, 1.5)
    assert(fs == Seq(Finding(Improvement, "q1", 2.0, 0.5, 0.25)))
  }

  // 8 queries -> sentinel every ceil(8/4)=2 queries; 5 samples total.
  // qa,qb sit between samples 0-1; qc,qd between 1-2; etc.
  private val eight = Seq("qa", "qb", "qc", "qd", "qe", "qf", "qg", "qh")

  test("block-local pressure downgrades a regression the inflated sample can explain") {
    // whole-run median is quiet (one bad sample out of five), but qc's
    // block neighbor (sample 1 = 2.4, 3x the run min) was inflated —
    // the r14 sf3-vs-sf3b failure shape
    val base = rec(eight.map(_ -> 1.0).toMap, sentinel = Seq(0.8, 0.8, 0.8, 0.8, 0.8))
    val cand = rec(eight.map(q => q -> (if (q == "qc") 3.0 else 1.0)).toMap,
      sentinel = Seq(0.8, 2.4, 0.8, 0.8, 0.8),
      spread = Map("qc" -> (3.0, 3.1)))
    assert(!cand.contended) // median/min = 1 — global rule sees nothing
    assert(BenchDiff.compare(base, cand, 1.5).map(_.kind) == Seq(NoisySuspect))
  }

  test("movement far beyond the block's pressure ratio stays a verdict") {
    // same inflated block, but a 20x regression: 2.4/0.8 = 3x pressure
    // cannot explain 20x (cap is pressure x2 = 6x)
    val base = rec(eight.map(_ -> 1.0).toMap, sentinel = Seq(0.8, 0.8, 0.8, 0.8, 0.8),
      spread = eight.map(_ -> (1.0, 1.1)).toMap)
    val cand = rec(eight.map(q => q -> (if (q == "qc") 20.0 else 1.0)).toMap,
      sentinel = Seq(0.8, 2.4, 0.8, 0.8, 0.8),
      spread = Map("qc" -> (20.0, 20.5)))
    assert(BenchDiff.compare(base, cand, 1.5).map(_.kind) == Seq(Regression))
  }

  test("errored queries keep their slot in the sentinel block mapping") {
    // Bench samples the sentinel by index over the FULL selection,
    // including queries that later error — qb errors here, so qe sits
    // at full-order index 4 (neighbor samples 2 and 3), while the
    // successful-only order would put it at index 3 (samples 1 and
    // 2). Pressure lives ONLY in sample 3: the error-aware order sees
    // qe's block pressured and downgrades the 3x movement to a
    // suspect; dropping errored names from the order maps qe to calm
    // samples and misreads it as a confirmed regression.
    val base = rec(eight.filterNot(_ == "qb").map(_ -> 1.0).toMap,
      sentinel = Seq(0.8, 0.8, 0.8, 0.8, 0.8))
    val cand = Record(
      total = 9.0,
      queries = eight.filterNot(_ == "qb")
        .map(q => q -> (if (q == "qe") 3.0 else 1.0)).toMap,
      spread = Map("qe" -> (3.0, 3.1)),
      sentinelRuns = Seq(0.8, 0.8, 0.8, 2.4, 0.8),
      errors = Map("qb" -> "boom"))
    assert(BenchDiff.compare(base, cand, 1.5).map(_.kind) == Seq(NoisySuspect))
  }

  test("an 'improvement' whose BASELINE block was under pressure is the mirror artifact") {
    val base = rec(eight.map(q => q -> (if (q == "qe") 3.0 else 1.0)).toMap,
      sentinel = Seq(0.8, 0.8, 2.4, 0.8, 0.8)) // qe's block inflated in base
    val cand = rec(eight.map(_ -> 1.0).toMap, sentinel = Seq(0.8, 0.8, 0.8, 0.8, 0.8))
    assert(BenchDiff.compare(base, cand, 1.5).map(_.kind) == Seq(NoisySuspect))
    // a quiet-base improvement of the same size is real
    val base2 = rec(eight.map(q => q -> (if (q == "qe") 3.0 else 1.0)).toMap,
      sentinel = Seq(0.8, 0.8, 0.8, 0.8, 0.8))
    assert(BenchDiff.compare(base2, cand, 1.5).map(_.kind) == Seq(Improvement))
  }

  test("a CONTENDED candidate's 'improvements' are suspects: deflated normalization buys no wins") {
    // quiet baseline, candidate whose sentinel median sits 2x above
    // its min: the norm factor (base median / cand median) halves
    // every candidate time, manufacturing across-the-board
    // "improvements" from a box that was merely slow — the mirror of
    // the regression-branch downgrade
    val base = rec(eight.map(_ -> 2.0).toMap,
      sentinel = Seq(0.8, 0.8, 0.8, 0.8, 0.8))
    val cand = rec(eight.map(_ -> 2.0).toMap,
      sentinel = Seq(0.8, 1.6, 1.6, 1.6, 1.6)) // median 1.6, min 0.8
    val findings = BenchDiff.compare(base, cand, 1.5)
    assert(findings.nonEmpty) // the deflation does cross the threshold
    assert(findings.forall(_.kind == NoisySuspect))
  }

  test("a CONTENDED baseline's 'regressions' are suspects: inflated normalization buys no red exits") {
    // the exact mirror (review fix): contended BASE inflates the norm
    // factor (base median / cand median), inflating every candidate
    // time — identical code on a quiet candidate box would print
    // across-the-board confirmed regressions and exit 1
    val base = rec(eight.map(_ -> 2.0).toMap,
      sentinel = Seq(0.8, 1.6, 1.6, 1.6, 1.6)) // median 1.6, min 0.8
    val cand = rec(eight.map(_ -> 2.0).toMap,
      sentinel = Seq(0.8, 0.8, 0.8, 0.8, 0.8))
    val findings = BenchDiff.compare(base, cand, 1.5)
    assert(findings.nonEmpty) // the inflation does cross the threshold
    assert(findings.forall(_.kind == NoisySuspect))
  }

  test("sentinel_docs parses; its absence (pre-r15 records) means no docs samples") {
    val json =
      """{"value":1.0,"queries":{"q1":1.0},
        |"sentinel":{"runs":[0.8,0.9],"min":0.8,"median":0.85,"max":0.9},
        |"sentinel_docs":{"runs":[1.2,1.3],"min":1.2,"median":1.25,"max":1.3},
        |"errors":{}}""".stripMargin.replace("\n", "")
    assert(BenchDiff.parse(json).sentinelDocsRuns == Seq(1.2, 1.3))
    val old = """{"value":1.0,"queries":{"q1":1.0},
        |"sentinel":{"runs":[0.8],"min":0.8,"median":0.8,"max":0.8},"errors":{}}"""
      .stripMargin.replace("\n", "")
    assert(BenchDiff.parse(old).sentinelDocsRuns.isEmpty)
    assert(!BenchDiff.parse(old).contended)
  }

  test("docs-sentinel pressure downgrades a regression the lineitem sentinel cannot see") {
    // the r15 sf3 shape: lineitem samples flat throughout, docs
    // samples spike in qe's block (document-page-cache churn) —
    // qe's 3x movement must be a suspect, not a confirmed regression
    val flat = Seq(0.8, 0.8, 0.8, 0.8, 0.8)
    val base = rec(eight.map(_ -> 1.0).toMap, sentinel = flat)
    val cand0 = rec(eight.map(q => q -> (if (q == "qe") 3.0 else 1.0)).toMap,
      sentinel = flat)
    val candPressured = cand0.copy(
      sentinelDocsRuns = Seq(0.8, 0.8, 2.4, 0.8, 0.8)) // qe's block squeezed
    assert(BenchDiff.compare(base, candPressured, 1.5).map(_.kind) == Seq(NoisySuspect))
    // same movement with BOTH sentinels flat stays a confirmed regression
    assert(BenchDiff.compare(base, cand0, 1.5).map(_.kind) == Seq(Regression))
    // and whole-run docs contention marks the record contended
    assert(cand0.copy(sentinelDocsRuns = Seq(0.8, 1.6, 1.6, 1.6, 1.6)).contended)
  }
}
