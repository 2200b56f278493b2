package graft.rpt

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/**
 * Correctness pin over [[JobTopologies]] — the 33 JOB join topologies
 * (the exact workload shapes the reference was validated on, transcribed
 * onto the TPC-H-ish fixtures; full provenance in the shared object's
 * scaladoc): the transcription's relation/edge counts must match the
 * published FROM clauses, and rule-on ≡ rule-off under both schedule
 * heuristics.
 *
 * Runs on sf0.001 by default (shape coverage, like the fuzzer);
 * GRAFT_JOB_SF points at a bigger fixture for one-off artifact runs.
 * The rule-on/off DIFFERENTIAL on these shapes is measured by
 * [[JobTopologyBench]] (`Test/runMain graft.rpt.JobTopologyBench`).
 */
class JobTopologySuite extends SparkTestBase {

  private val jobSfDir = sys.env.getOrElse("GRAFT_JOB_SF", sfDir)

  private def fp(df: DataFrame): Seq[String] = fingerprint(df)

  private val openGates = Seq(
    RptConf.MIN_PROBE_ROWS -> "0",
    RptConf.MIN_BUILD_PROBE_RATIO -> "0",
    RptConf.FILTERED_BUILDS_ONLY -> "false",
    RptConf.SKIP_BROADCASTABLE_BUILDS -> "false",
    RptConf.FAIL_FAST -> "true")

  test("all 33 JOB topologies: relation counts match the published shapes " +
      "and rule-on == rule-off under both heuristics") {
    val tbls = JobTopologies.tableNames
      .map(n => n -> spark.read.parquet(s"$jobSfDir/$n.parquet")).toMap
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var rewritten = 0
    withConf(openGates: _*) {
      JobTopologies.all.foreach { t =>
        try {
          withConf(RptConf.ENABLED -> "false") {
            val df = JobTopologies.build(t, tbls)
            // pin the transcription: the extracted join graph must have
            // one unit per relation (+1: the global-MIN aggregate barrier)
            // and a spanning tree's worth of edges
            val g = JoinGraph.extract(df.queryExecution.optimizedPlan)
            if (g.units.size != t.relations + 1) {
              failures += s"q${t.q}: ${g.units.size - 1} relations extracted, " +
                s"expected ${t.relations}"
            }
            if (g.edges.size != t.relations - 1) {
              failures += s"q${t.q}: ${g.edges.size} edges, expected ${t.relations - 1}"
            }
          }
          val off = withConf(RptConf.ENABLED -> "false")(
            fp(JobTopologies.build(t, tbls)))
          Seq("largestRoot", "joinOrder").foreach { heur =>
            withConf(RptConf.HEURISTIC -> heur) {
              // fresh QueryExecution per variant
              val df = JobTopologies.build(t, tbls)
              if (heur == "largestRoot" &&
                  df.queryExecution.optimizedPlan.toString
                    .contains("might_contain")) {
                rewritten += 1
              }
              val on = fp(df)
              if (on != off) {
                failures += s"q${t.q} $heur changed results: $on vs $off"
              }
            }
          }
        } catch {
          case e: Throwable =>
            failures += s"q${t.q} threw ${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      }
    }
    assert(failures.isEmpty,
      s"${failures.size} JOB-topology failures:\n${failures.take(8).mkString("\n")}")
    info(s"33 topologies (4-17 relations), $rewritten rewritten")
    // the sweep must actually exercise the rewrite, not stand down
    assert(rewritten >= 25, s"only $rewritten/33 topologies were rewritten")
  }
}
