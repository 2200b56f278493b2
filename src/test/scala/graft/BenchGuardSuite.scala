package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench integrity guard: cross-round minima and clean-box
  * calibration baselines parsed out of BENCH artifacts. Fixtures are
  * SYNTHESIZED into a temp dir (structured driver-wrapper shape, legacy
  * escaped-"tail" shape, cross-sf decoys) so the suite holds on any
  * checkout and survives artifact re-pinning; one soft test checks the
  * live repo artifacts still parse when present. */
class BenchGuardSuite extends AnyFunSuite {

  private def tmpDir(): java.io.File = {
    val d = Files.createTempDirectory("bench_pins_").toFile
    d.deleteOnExit()
    d
  }

  private def write(dir: java.io.File, name: String, body: String): Unit =
    Files.write(new java.io.File(dir, name).toPath,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("structured artifacts: cross-round query minima and cal baselines") {
    val d = tmpDir()
    // driver-wrapper shape: numeric root sf + embedded parsed object
    write(d, "BENCH_r1.json",
      """{"n":1,"rc":0,"sf":0.1,"tail":"...","parsed":{"metric":"total",
        |"queries":{"q01":1.5,"d09":1.8,"v03":-1},
        |"sf":"/data/sf0.1","cal_cpu_ms":180.0,"cal_io_ms":200.0}}"""
        .stripMargin.replace("\n", ""))
    // a later, contaminated round: slower queries, slower box
    write(d, "BENCH_r2.json",
      """{"n":2,"rc":0,"sf":0.1,"tail":"...","parsed":{"metric":"total",
        |"queries":{"q01":3.9,"d09":5.5,"v03":0.4},
        |"sf":"/data/sf0.1","cal_cpu_ms":260.0,"cal_io_ms":540.0}}"""
        .stripMargin.replace("\n", ""))
    val pins = Bench.priorPins(d.getAbsolutePath, "/data/sf0.1")
    assert(pins.queries === Map("q01" -> 1.5, "d09" -> 1.8, "v03" -> 0.4),
      "minima must shed the contaminated round; -1 error runs drop out")
    assert(pins.calCpu === Some(180.0) && pins.calIo === Some(200.0),
      "cal baseline must be the FASTEST recorded probes")
  }

  test("legacy tail-only artifacts parse through the regex fallback") {
    val d = tmpDir()
    write(d, "BENCH_r3.json",
      """{"n":3,"rc":0,"tail":"noise \"queries\":{\"q01\":2.25,\"t07\":0.5}""" +
        """,\"sf\":\"/data/sf0.1\",\"cal_cpu_ms\":190.5,""" +
        """\"cal_io_ms\":210.0 more noise"}""")
    val pins = Bench.priorPins(d.getAbsolutePath, "/data/sf0.1")
    assert(pins.queries === Map("q01" -> 2.25, "t07" -> 0.5))
    assert(pins.calCpu === Some(190.5) && pins.calIo === Some(210.0))
  }

  test("sf matching is boundary-anchored: sf1 never matches sf10") {
    val d = tmpDir()
    write(d, "BENCH_r1.json",
      """{"parsed":{"queries":{"q01":9.9},"sf":"/data/sf10"}}""")
    write(d, "BENCH_r2.json",
      """{"tail":"\"queries\":{\"q01\":8.8},\"sf\":\"/data/sf10\""}""")
    assert(Bench.priorPins(d.getAbsolutePath, "/data/sf1").isEmpty,
      "sf10 artifacts must not pin an sf1 run")
    val sf10 = Bench.priorPins(d.getAbsolutePath, "/data/sf10")
    assert(sf10.queries === Map("q01" -> 8.8),
      "both artifact shapes must pin the sf10 run")
    // and the other direction: sf1 artifacts don't leak into sf0.1 etc.
    assert(Bench.priorPins(d.getAbsolutePath, "/data/sf0.1").isEmpty)
  }

  test("a local bench_out.json contributes pins") {
    val d = tmpDir()
    write(d, "bench_out.json",
      """{"metric":"total","value":1.0,"unit":"sec",
        |"queries":{"q01":0.9},"sf":"/data/sf0.1",
        |"cal_cpu_ms":170.0,"cal_io_ms":150.0}"""
        .stripMargin.replace("\n", ""))
    val pins = Bench.priorPins(d.getAbsolutePath, "/data/sf0.1")
    assert(pins.queries === Map("q01" -> 0.9))
    assert(pins.calCpu === Some(170.0))
  }

  test("live repo artifacts (when present) still parse") {
    val repo = sys.props.getOrElse("user.dir", ".")
    val have = Option(new java.io.File(repo).listFiles())
      .getOrElse(Array.empty).exists(_.getName.matches("BENCH_r\\d+\\.json"))
    if (have) {
      val pins = Bench.priorPins(repo, "/root/testdata/sf0.1")
      assert(pins.queries.nonEmpty,
        "committed BENCH_r*.json artifacts stopped parsing")
      assert(pins.queries.values.forall(_ >= 0))
      assert(pins.calCpu.exists(_ > 0) && pins.calIo.exists(_ > 0),
        "committed artifacts carry cal probes since r11")
    }
  }

  test("JOBREAL pins: best speedups per regime, path-anchored, " +
      "mismatches and foreign fixtures excluded") {
    val d = tmpDir()
    write(d, "JOBREAL_r1.json",
      """{"dir":"/data/imdb_job","runs":1,
        |"broadcast":{"geomean":0.9,"matches":2,"total":2,"queries":{
        |  "17c":{"off":7.5,"on":2.4,"speedup":3.06,"match":true},
        |  "18b":{"off":0.8,"on":2.8,"speedup":0.28,"match":true}}},
        |"shuffle":{"geomean":1.1,"matches":2,"total":2,"queries":{
        |  "17c":{"off":70.0,"on":2.7,"speedup":25.74,"match":true},
        |  "18b":{"off":1.6,"on":3.6,"speedup":0.44,"match":false}}}}"""
        .stripMargin.replace("\n", ""))
    // a later round, same fixture: 17c slower, 18b recovered
    write(d, "JOBREAL_r2.json",
      """{"dir":"/data/imdb_job/","runs":1,
        |"shuffle":{"geomean":1.0,"matches":2,"total":2,"queries":{
        |  "17c":{"off":60.0,"on":4.0,"speedup":15.0,"match":true},
        |  "18b":{"off":1.5,"on":1.4,"speedup":1.07,"match":true}}}}"""
        .stripMargin.replace("\n", ""))
    // a foreign fixture must contribute nothing
    write(d, "JOBREAL_r3.json",
      """{"dir":"/data/other_imdb","runs":1,
        |"shuffle":{"queries":{"17c":{"speedup":99.0,"match":true}}}}"""
        .stripMargin.replace("\n", ""))
    val pins = graft.tools.JobReal.priorPins(d.getAbsolutePath,
      "/data/imdb_job")
    assert(pins("broadcast") === Map("17c" -> 3.06, "18b" -> 0.28))
    // max across rounds; the r1 shuffle 18b mismatch row is excluded
    assert(pins("shuffle") === Map("17c" -> 25.74, "18b" -> 1.07))
  }

  test("JOBREAL live artifacts (when present) still parse") {
    val repo = sys.props.getOrElse("user.dir", ".")
    val have = Option(new java.io.File(repo).listFiles())
      .getOrElse(Array.empty)
      .exists(_.getName.matches("JOBREAL_r\\d+\\.json"))
    if (have) {
      val pins = graft.tools.JobReal.priorPins(repo,
        "/root/repo/benchdata/imdb_job")
      assert(pins.values.exists(_.nonEmpty),
        "committed JOBREAL_r*.json artifacts stopped parsing")
    }
  }

  test("drift factor: uniform slow-IO inflation normalizes the headline") {
    // synthesized slow-IO round (the r15 shape): every query ~3x its pin,
    // one genuine outlier at 12x — the MEDIAN reads the uniform drift
    val pins = (1 to 9).map(i => s"q0$i" -> 1.0).toMap
    val results = (1 to 8).map(i => s"q0${i}_x" -> 3.0) :+ ("q09_x" -> 12.0)
    val drift = Bench.driftFactor(results, pins)
    assert(drift === 3.0, s"uniform 3x inflation must read as drift: $drift")
    // value_normalized = value / drift recovers the clean-box total
    val total = results.map(_._2).sum
    assert(math.abs(total / drift - (8 * 1.0 + 4.0)) < 1e-9)
  }

  test("drift claim is gated by host calibration: a uniform code tax on " +
      "a clean box does NOT normalize") {
    // the r16-verdict hazard: pins are cross-round minima, so a binary
    // that taxes every query 1.5x reads EXACTLY like host drift in the
    // time/pin median — only the host probes can tell them apart.
    // Clean calibration (cal_ratio ~1.0) => raw headline, no normalization
    assert(Bench.appliedDrift(3.0, 1.0) === 1.0)
    assert(Bench.appliedDrift(1.5, 1.19) === 1.0)
    // calibration agrees the box is slow => the median is applied
    // (the genuine r16 shape: cal 1.43, median 1.61)
    assert(Bench.appliedDrift(1.61, 1.43) === 1.61)
    // but never past 1.5x what calibration can explain
    assert(Bench.appliedDrift(4.0, 1.43) === 1.43 * 1.5)
    // and never below 1 (fast box, median at 1)
    assert(Bench.appliedDrift(1.0, 2.0) === 1.0)
  }

  test("drift factor: clean box and thin pin coverage read as 1.0") {
    val pins = (1 to 9).map(i => s"q0$i" -> 2.0).toMap
    // clean box: ratios hover at/below 1 (pins are cross-round minima)
    val clean = (1 to 9).map(i => s"q0$i" -> (if (i % 2 == 0) 2.1 else 1.9))
    assert(Bench.driftFactor(clean, pins) === 1.0)
    // under 5 pinned queries: not enough evidence to call drift
    val thin = Seq("q01" -> 9.0, "q02" -> 9.0, "q03" -> 9.0, "q04" -> 9.0)
    assert(Bench.driftFactor(thin, pins) === 1.0)
    // error runs (-1) contribute nothing
    val errs = (1 to 9).map(i => s"q0$i" -> -1.0)
    assert(Bench.driftFactor(errs, pins) === 1.0)
  }

  test("degraded run: stdout error list is bounded, never a crash") {
    // the r17 failure: 38 sabotage errors inflated the stdout JSON line
    // to 2,788 chars and Bench.emit's `require` crashed the JVM with rc=1
    // AFTER bench_out.json was written — a lost artifact. The stdout list
    // must stay bounded (full list lives in bench_out.json).
    val errs = (1 to 38).map(i => f"q$i%02d_name: SparkException")
    val bounded = Bench.stdoutErrors(errs)
    assert(bounded.size === 4, s"expected 3 entries + summary: $bounded")
    assert(bounded.take(3) === errs.take(3))
    assert(bounded.last.contains("35 more"),
      s"summary entry must count the overflow: ${bounded.last}")
    // duplicates collapse before bounding
    assert(Bench.stdoutErrors(Seq("a: E", "a: E", "b: E")) ===
      Seq("a: E", "b: E"))
    // small lists pass through untouched
    assert(Bench.stdoutErrors(Seq("x: E")) === Seq("x: E"))
    // worst-case stdout JSON stays under the harness tail budget: 86
    // short-id queries + the bounded error list
    val qs = (1 to 86).map(i => f""""x$i%02d":12.345""").mkString(",")
    val line = s"""{"metric":"total","value":999.999,"unit":"sec",""" +
      s""""queries":{$qs},"sf":"/root/testdata/sf0.1",""" +
      """"load_before":0.50,"load_after":0.50,"jvms_before":2,""" +
      """"jvms_after":2,"reruns":38,"contended":true,""" +
      """"cal_cpu_ms":180.0,"cal_io_ms":200.0,"cal_ratio":1.00,""" +
      """"drift_median":1.000,"drift_factor":1.000,""" +
      """"value_normalized":999.999,"cause":"inflated","errors":""" +
      bounded.map("\"" + _ + "\"").mkString("[", ",", "]") + "}"
    assert(line.length <= 1800,
      s"bounded degraded line still too long: ${line.length}")
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
}
