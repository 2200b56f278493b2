package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench integrity guard: cross-round minima parsed out of
  * the driver's BENCH_r*.json artifacts (which wrap the bench stdout line
  * escaped inside a "tail" string). Runs against the real artifacts in
  * the repo root — the exact inputs the guard sees in production. */
class BenchGuardSuite extends AnyFunSuite {

  test("priorPins parses driver artifacts and takes cross-round minima") {
    val pins = Bench.priorPins("/root/repo", "/root/testdata/sf0.1")
    assert(pins.nonEmpty, "expected pins from the committed BENCH_r*.json")
    // every registry family should be pinned
    Seq("q01", "d09", "v03", "t07", "m01", "p07", "s04").foreach(k =>
      assert(pins.contains(k), s"missing pin for $k in ${pins.keySet}"))
    // the r10 artifact was inflated (d09 5.5s); r09 and earlier were not —
    // the cross-round min must reflect the clean time, not the dirty one
    assert(pins("d09") < 2.0,
      s"cross-round min should shed the contaminated r10 value, got ${pins("d09")}")
    assert(pins.values.forall(_ >= 0))
  }

  test("priorPins is empty on an sf mismatch and a dir with no artifacts") {
    assert(Bench.priorPins("/root/repo", "/root/testdata/sf0.001").isEmpty)
    val tmp = java.nio.file.Files.createTempDirectory("bench_pins_").toFile
    tmp.deleteOnExit()
    assert(Bench.priorPins(tmp.getAbsolutePath, "/root/testdata/sf0.1").isEmpty)
  }
}
