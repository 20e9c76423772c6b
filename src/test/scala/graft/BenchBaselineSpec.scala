package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's committed-baseline parse must accept BOTH on-disk shapes —
  * the refresh's compact form and the pretty-printed form round-snapshot
  * tooling leaves behind. The r18→r19 regression this pins: the strict
  * no-space parse read the pretty form as an EMPTY baseline, silently
  * disabling the rerun-defense thresholds and the min-merge refresh. */
class BenchBaselineSpec extends AnyFunSuite {

  test("parseBaseline reads compact and pretty-printed forms identically") {
    val compact = """{"q1_pricing_summary":0.403,"dedup_lsh_tuning":2.664}"""
    val pretty =
      """{
        | "q1_pricing_summary": 0.403,
        | "dedup_lsh_tuning": 2.664
        |}""".stripMargin
    val expect = Map("q1_pricing_summary" -> 0.403, "dedup_lsh_tuning" -> 2.664)
    assert(Bench.parseBaseline(compact) == expect)
    assert(Bench.parseBaseline(pretty) == expect)
  }

  test("the committed sf0.1 baseline resource actually parses non-empty") {
    val b = Bench.loadBaseline("sf0.1")
    assert(b.size >= 300, s"committed baseline parsed only ${b.size} entries")
    assert(b.values.forall(v => v > 0 && v < 600))
  }
}
