package graft.ops

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ConnectedComponentsSuite extends SparkTestBase {

  /** Driver-side union-find reference: node -> component-min labels. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def ccLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    ConnectedComponents.labels(df, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain graph (worst-case diameter) collapses to one component") {
    val n = 40L
    val chain = (1L until n).map(i => (i, i + 1))
    val got = ccLabels(chain)
    assert(got.keySet == (1L to n).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("two stars bridged by one edge merge; separate stars do not") {
    // star A rooted at 1, star B rooted at 100, bridge 5-100
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (100L, 101L), (100L, 102L), (5L, 100L),
      (1000L, 1001L)) // separate pair
    val got = ccLabels(edges)
    assert(got.filter(_._1 < 1000).values.toSet == Set(1L))
    assert(got(1000L) == 1000L && got(1001L) == 1000L)
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val edges = Seq((7L, 7L), (3L, 2L), (2L, 3L), (3L, 2L), (9L, 9L))
    val got = ccLabels(edges)
    // pure self-loops carry no connectivity information and drop out
    assert(got == Map(2L -> 2L, 3L -> 2L))
  }

  test("empty edge set yields empty labels") {
    assert(ccLabels(Seq.empty).isEmpty)
  }

  test("multi-round convergence: 2000-node forest of long chains") {
    // 20 chains of 100 nodes each — needs several large/small-star rounds
    // (exercises the per-round checkpoint + unpersist path), and the
    // label set must be exactly the 20 chain heads
    val edges = (0 until 20).flatMap { c =>
      val base = c * 1000L + 1
      (0 until 99).map(i => (base + i, base + i + 1))
    }
    val got = ccLabels(edges)
    assert(got.size == 2000)
    assert(got.values.toSet == (0 until 20).map(c => c * 1000L + 1).toSet)
    (0 until 20).foreach { c =>
      val base = c * 1000L + 1
      (0 until 100).foreach(i => assert(got(base + i) == base))
    }
  }

  test("random graphs match driver-side union-find") {
    val genEdge = for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L)
    } yield (a, b)
    val genGraph = Gen.listOfN(25, genEdge)
    (1 to 8).foreach { i =>
      val edges = genGraph(Gen.Parameters.default, Seed(i.toLong)).get
      val real = edges.filter(e => e._1 != e._2)
      assert(ccLabels(edges) == unionFind(real), s"seed=$i edges=$edges")
    }
  }
}
