package graft.rpt

import graft.SparkTestBase

/** Settings surface: reference snake_case spellings accepted, unknown
  * values raise instead of silently selecting another mode
  * (reference settings registry: rpt_extension.cpp:56-69). */
class RptConfSuite extends SparkTestBase {

  private def sqlConf = spark.sessionState.conf

  test("snake_case reference spellings map to every enum value") {
    withConf(
      RptConf.HEURISTIC -> "largest_root",
      RptConf.PASS_MODE -> "forward_only",
      RptConf.FILTER_TYPE -> "bf_only",
      RptConf.BUILD_FORM -> "semijoin") {
      assert(RptConf.heuristic(sqlConf) == "largestRoot")
      assert(RptConf.passMode(sqlConf) == "forwardOnly")
      assert(RptConf.filterType(sqlConf) == "bfOnly")
      assert(RptConf.buildForm(sqlConf) == "semijoin")
    }
    withConf(RptConf.FILTER_TYPE -> "minmax_only",
      RptConf.BUILD_FORM -> "CASCADE") {
      assert(RptConf.filterType(sqlConf) == "minmaxOnly")
      assert(RptConf.buildForm(sqlConf) == "cascade")
    }
  }

  test("unknown enum values raise rather than fall through") {
    for ((key, bad) <- Seq(
        RptConf.HEURISTIC -> "mst",
        RptConf.PASS_MODE -> "backwardOnly",
        RptConf.FILTER_TYPE -> "none",
        RptConf.BUILD_FORM -> "nested")) {
      withConf(key -> bad) {
        val e = intercept[IllegalArgumentException] {
          RptConf.heuristic(sqlConf)
          RptConf.passMode(sqlConf)
          RptConf.filterType(sqlConf)
          RptConf.buildForm(sqlConf)
        }
        assert(e.getMessage.contains(key), e.getMessage)
      }
    }
  }

  test("payoff gates have reference-faithful off switches") {
    withConf(
      RptConf.MIN_PROBE_ROWS -> "0",
      RptConf.MIN_BUILD_PROBE_RATIO -> "0",
      RptConf.FILTERED_BUILDS_ONLY -> "false",
      RptConf.SKIP_BROADCASTABLE_BUILDS -> "false") {
      assert(RptConf.minProbeRows(sqlConf) == 0L)
      assert(RptConf.minBuildProbeRatio(sqlConf) == 0.0)
      assert(!RptConf.filteredBuildsOnly(sqlConf))
      assert(!RptConf.skipBroadcastableBuilds(sqlConf))
    }
    // broadcast-conversion margin: default 4x with the deep-plan fallback
    // at 6 edges; margin 1.0 restores the bare threshold compare
    assert(RptConf.broadcastConversionMargin(sqlConf) == 4.0)
    assert(RptConf.deepPlanEdges(sqlConf) == 6)
    withConf(
      RptConf.BROADCAST_CONVERSION_MARGIN -> "1.0",
      RptConf.DEEP_PLAN_EDGES -> "99") {
      assert(RptConf.broadcastConversionMargin(sqlConf) == 1.0)
      assert(RptConf.deepPlanEdges(sqlConf) == 99)
    }
    // total-work floor: waveCostBytes=0 is the reference-faithful master
    // off switch (the reference pays ~zero per-wave fixed cost, so it
    // never needed this gate); the session base holds it open for tests
    withConf(RptConf.WAVE_COST_BYTES -> "8388608") {
      assert(RptConf.waveCostBytes(sqlConf) == 8388608L)
      assert(RptConf.minPlanWorkBytes(sqlConf) == 32L * 1024 * 1024)
      assert(RptConf.waveWorkFraction(sqlConf) == 0.15)
      assert(RptConf.waveBuildFraction(sqlConf) == 0.5)
    }
    assert(RptConf.waveCostBytes(sqlConf) == 0L) // test-session override
  }

  test("two-phase feature switches: defaults and overrides") {
    // defaults: ALL planning-time job features (runtime sizing, literal
    // bounds, cached builds, range summaries) are opt-in — each runs extra
    // work inside optimization and assumes build data static for the
    // session/plan
    assert(!RptConf.runtimeSizedBuilds(sqlConf))
    assert(RptConf.runtimeSizingMinRows(sqlConf) == 1048576L)
    assert(!RptConf.literalBounds(sqlConf))
    assert(!RptConf.cacheBuilds(sqlConf))
    assert(!RptConf.rangeSummaryFallback(sqlConf))
    assert(RptConf.rangeSummaryBuckets(sqlConf) == 64)
    withConf(RptConf.RANGE_SUMMARY_FALLBACK -> "true",
      RptConf.RANGE_SUMMARY_BUCKETS -> "16") {
      assert(RptConf.rangeSummaryFallback(sqlConf))
      assert(RptConf.rangeSummaryBuckets(sqlConf) == 16)
    }
    assert(!RptConf.probeFeedback(sqlConf))
    assert(RptConf.probeFeedbackKeep(sqlConf) == 0.98)
    withConf(RptConf.PROBE_FEEDBACK -> "true",
      RptConf.PROBE_FEEDBACK_KEEP -> "0.9") {
      assert(RptConf.probeFeedback(sqlConf))
      assert(RptConf.probeFeedbackKeep(sqlConf) == 0.9)
    }
    withConf(
      RptConf.RUNTIME_SIZED_BUILDS -> "true",
      RptConf.RUNTIME_SIZING_MIN_ROWS -> "0",
      RptConf.LITERAL_BOUNDS -> "true",
      RptConf.CACHE_BUILDS -> "true") {
      assert(RptConf.runtimeSizedBuilds(sqlConf))
      assert(RptConf.runtimeSizingMinRows(sqlConf) == 0L)
      assert(RptConf.literalBounds(sqlConf))
      assert(RptConf.cacheBuilds(sqlConf))
    }
  }
}
