package graft

import org.scalatest.funsuite.AnyFunSuite

/** The layers manifest's headline claim is sum(build_s) ≈ cold − warm,
  * which only holds if nested builds are EXCLUSIVE (near_dup_pairs →
  * rep_pairs → collapse → grams is a 4-deep chain; inclusive timing would
  * publish the gram build four times over). Pin that, and the
  * reuse-counting side channel. */
class LayerMetricsSpec extends AnyFunSuite {

  test("nested builds record exclusive time; reuses accumulate") {
    LayerMetrics.build("lm_outer") {
      Thread.sleep(60)
      LayerMetrics.build("lm_inner") { Thread.sleep(120) }
      Thread.sleep(60)
    }
    LayerMetrics.reuse("lm_inner")
    LayerMetrics.reuse("lm_inner")
    val snap = LayerMetrics.snapshot.toMap
    val (outerSec, outerBuilds, _) = snap("lm_outer")
    val (innerSec, _, innerReuses) = snap("lm_inner")
    assert(innerSec >= 0.110, s"inner build under-measured: $innerSec")
    // outer slept ~120ms itself; the inner ~120ms must NOT be included
    assert(outerSec >= 0.110 && outerSec < 0.230,
      s"outer build not exclusive of the nested one: $outerSec")
    assert(outerBuilds === 1)
    assert(innerReuses === 2)
  }

  test("a build that throws still records and unwinds the stack") {
    intercept[RuntimeException] {
      LayerMetrics.build("lm_fail") { throw new RuntimeException("boom") }
    }
    // the stack must be balanced: a subsequent sibling build times itself,
    // not the leftovers of the failed frame
    LayerMetrics.build("lm_after") { Thread.sleep(30) }
    val snap = LayerMetrics.snapshot.toMap
    assert(snap("lm_fail")._2 === 1)
    assert(snap("lm_after")._1 >= 0.025)
  }
}
