package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pin [[Bench.parsePrior]] to BOTH serializations the prior file has
  * actually shipped in: the writer's compact one-line form and the
  * pretty-printed (spaces + newlines) form a tooling pass produced in
  * round 15 — which the then compact-pinned regexes silently failed
  * on, disabling the isolated re-run tripwire (round-15 ADVICE,
  * medium). */
class BenchPriorSpec extends AnyFunSuite {

  private val compact =
    """{"metric":"total","value":1.5,"unit":"sec","queries":{"q_a":0.25,"q_b":1.25,"q_err":-1},"isolated":{},"errors":["q_err"],"sf":"/data/sf0.1"}"""

  private val pretty =
    """{
      | "metric": "total",
      | "value": 1.5,
      | "queries": {
      |  "q_a": 0.25,
      |  "q_b": 1.25,
      |  "q_err": -1
      | },
      | "sf": "/data/sf0.1"
      |}""".stripMargin

  test("compact one-line prior parses") {
    val (qs, sf) = Bench.parsePrior(compact)
    assert(sf == "/data/sf0.1")
    assert(qs == Map("q_a" -> 0.25, "q_b" -> 1.25, "q_err" -> -1.0))
  }

  test("pretty-printed prior parses identically") {
    val (qs, sf) = Bench.parsePrior(pretty)
    assert(sf == "/data/sf0.1")
    assert(qs == Map("q_a" -> 0.25, "q_b" -> 1.25, "q_err" -> -1.0))
  }

  test("missing fields degrade to empty, not throw") {
    val (qs, sf) = Bench.parsePrior("""{"metric":"total"}""")
    assert(sf == "")
    assert(qs.isEmpty)
  }

  test("the committed BENCH_prior.json parses with a matching sf") {
    val p = java.nio.file.Paths.get("BENCH_prior.json")
    assume(java.nio.file.Files.exists(p))
    val (qs, sf) = Bench.parsePrior(java.nio.file.Files.readString(p))
    assert(sf.nonEmpty, "sf failed to parse from the committed prior")
    assert(qs.size > 100, s"only ${qs.size} queries parsed from the committed prior")
  }
}
