package graft

import org.scalatest.funsuite.AnyFunSuite

/** Makes the standing scale artifact load-bearing: `SCALING.json`
  * (written by `graft.BenchScale` — the 20 most expensive queries at
  * sf0.001/0.01/0.1 with growth exponents over the top scale step) must
  * carry a PASSING sub-quadratic gate for the dedup/ANN set. A re-run
  * that trips the gate both exits non-zero AND fails this suite, so a
  * quadratic regression cannot ride in behind a stale artifact claim.
  * Skipped (assume) when the artifact is absent — a fresh checkout
  * before the first BenchScale run.
  */
class ScalingArtifactSpec extends AnyFunSuite {

  test("SCALING.json present, gate passing, zero failed queries") {
    val f = new java.io.File("SCALING.json")
    assume(f.isFile, "SCALING.json not yet generated (run graft.BenchScale)")
    val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    assert(txt.contains("\"assert_pass\":true"),
      "SCALING.json records a FAILING sub-quadratic gate — re-run " +
        "graft.BenchScale and investigate the flagged queries")
    assert(txt.contains("\"n_failed\":0"),
      "SCALING.json records failed queries — the sweep must be clean")
    // every gate-set query must appear in the artifact
    BenchScale.assertSet.foreach(q =>
      assert(txt.contains("\"" + q + "\""), s"gate query $q missing from artifact"))
  }
}
