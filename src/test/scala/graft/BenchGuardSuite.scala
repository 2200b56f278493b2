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

  test("calibration probes return positive, repeatable timings") {
    val cpu1 = Bench.cpuCalMs()
    val cpu2 = Bench.cpuCalMs()
    assert(cpu1 > 0 && cpu2 > 0)
    // same JVM, same box: the two readings must be the same order of
    // magnitude (the cross-session RATIO is the useful signal; a probe
    // this unstable within one process would be useless for it)
    assert(math.max(cpu1, cpu2) / math.min(cpu1, cpu2) < 5.0,
      s"cpu calibration unstable: $cpu1 vs $cpu2")
    val io = Bench.ioCalMs()
    assert(io > 0, s"io calibration failed: $io")
  }

  test("priorPins is empty on an sf mismatch and a dir with no artifacts") {
    assert(Bench.priorPins("/root/repo", "/root/testdata/sf0.001").isEmpty)
    val tmp = java.nio.file.Files.createTempDirectory("bench_pins_").toFile
    tmp.deleteOnExit()
    assert(Bench.priorPins(tmp.getAbsolutePath, "/root/testdata/sf0.1").isEmpty)
  }
}
