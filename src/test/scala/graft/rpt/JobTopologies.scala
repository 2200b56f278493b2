package graft.rpt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The 33 JOB (Join Order Benchmark) join TOPOLOGIES — the exact workload
 * shapes the reference was validated on (test_job_queries.sh runs
 * queries 1a–33c; the IMDB data itself is absent from this sandbox) —
 * transcribed onto the TPC-H-ish fixtures. Shared by [[JobTopologySuite]]
 * (rule-on ≡ rule-off correctness at sf0.001) and [[JobTopologyBench]]
 * (rule-on/off differential at sf1).
 *
 * Structure transcription (public, from the JOB paper — Leis et al.,
 * "How Good Are Query Optimizers, Really?", VLDB 2015 — and the
 * published benchmark queries): every JOB query is an all-inner-join
 * snowflake around the `title` hub — bridge tables (movie_companies,
 * movie_keyword, movie_info, movie_info_idx, cast_info, complete_cast,
 * movie_link) fan out from the hub on its key, each carrying 0–4
 * dimension links (company_name, keyword, info_type, name, role_type,
 * char_name, …), some queries add hub-side dimensions (kind_type,
 * aka_title), and two families (32, 33) link a SECOND title hub through
 * movie_link. Predicates are dim equality/IN, LIKE on names, and
 * BETWEEN on production_year; the output is a global MIN aggregate.
 *
 * Fixture mapping: hub=orders (key o_orderkey, year filter →
 * o_orderdate BETWEEN), bridge=lineitem alias (l_orderkey = o_orderkey;
 * note-style filters → l_returnflag/l_shipdate), arm dims are part
 * (l_partkey), supplier (l_suppkey), nation (s_nationkey), region
 * (n_regionkey) in chain order; hub dims are customer (o_custkey),
 * nation, region. The two-hub families join the second orders hub on
 * the link bridge's own order key (the reference's linked_movie_id is a
 * different movie; the RELATION/EDGE structure — what the transfer
 * schedule consumes — is identical). Per-query relation counts match
 * the published FROM clauses (4–17 relations; asserted by the suite).
 */
object JobTopologies {

  /** One JOB topology: hub + `arms` bridge fan-outs (value = dim-chain
    * length under that bridge), optional hub-side dim chain, optional
    * second hub (via a link bridge with `linkDims` dims) carrying its
    * own `secondArms`/`secondHubDims`. */
  case class Topo(
      q: Int,
      arms: Seq[Int],
      hubDims: Int = 0,
      twoHub: Boolean = false,
      linkDims: Int = 0,
      secondArms: Seq[Int] = Nil,
      secondHubDims: Int = 0) {
    def relations: Int =
      1 + arms.map(_ + 1).sum + hubDims +
        (if (twoHub) 2 + linkDims + secondArms.map(_ + 1).sum + secondHubDims
         else 0)
  }

  /** The 33 families. Relation counts per the published FROM clauses:
    * e.g. 1a = {t, mc, ct, it, mi_idx} → 5; 29a = 17 relations (the JOB
    * maximum); 32a = {t1, mk, k, ml, lt, t2} → 6. */
  val all: Seq[Topo] = Seq(
    Topo(1, arms = Seq(1, 1)), // t, mc->ct, mi_idx->it (5)
    Topo(2, arms = Seq(1, 1)), // t, mc->cn, mk->k (5)
    Topo(3, arms = Seq(1, 0)), // t, mk->k, mi (4)
    Topo(4, arms = Seq(1, 1)), // t, mi_idx->it, mk->k (5)
    Topo(5, arms = Seq(1, 1)), // t, mc->ct, mi->it (5)
    Topo(6, arms = Seq(1, 1)), // t, ci->n, mk->k (5)
    Topo(7, arms = Seq(4, 1)), // t, ci->{n,an,pi,it}, ml->lt (8)
    Topo(8, arms = Seq(3, 1)), // t, ci->{an,n,rt}, mc->cn (7)
    Topo(9, arms = Seq(3, 1)), // t, an, ci->{n,rt}, mc->cn (7)
    Topo(10, arms = Seq(2, 2)), // t, ci->{chn,rt}, mc->{cn,ct} (7)
    Topo(11, arms = Seq(2, 1, 1)), // t, mc->{cn,ct}, mk->k, ml->lt (8)
    Topo(12, arms = Seq(2, 1, 1)), // t, mc->{cn,ct}, mi->it1, mi_idx->it2 (8)
    Topo(13, arms = Seq(2, 1, 1), hubDims = 1), // 12 + kt on the hub (9)
    Topo(14, arms = Seq(1, 1, 1), hubDims = 1), // t, mk->k, mi->it1, mi_idx->it2, kt (8)
    Topo(15, arms = Seq(1, 1, 1), hubDims = 1), // t, mc->cn, mi->it1, mk->k, at (8)
    Topo(16, arms = Seq(2, 1, 1)), // t, ci->{an,n}, mc->cn, mk->k (8)
    Topo(17, arms = Seq(1, 1, 1)), // t, ci->n, mc->cn, mk->k (7)
    Topo(18, arms = Seq(1, 1, 1)), // t, ci->n, mi->it1, mi_idx->it2 (7)
    Topo(19, arms = Seq(3, 1, 1)), // t, ci->{an,n,rt}, mc->cn, mi->it (9)
    Topo(20, arms = Seq(2, 2, 1), hubDims = 1), // t, cc->{cct1,cct2}, ci->{chn,n}, mk->k, kt (10)
    Topo(21, arms = Seq(2, 1, 1, 0)), // t, mc->{cn,ct}, mk->k, ml->lt, mi (9)
    Topo(22, arms = Seq(2, 1, 1, 1), hubDims = 1), // t, mc->{cn,ct}, mk->k, mi->it1, mi_idx->it2, kt (11)
    Topo(23, arms = Seq(1, 2, 1), hubDims = 1), // t, cc->cct1, mc->{cn,ct}, mi->it1, kt (9)
    Topo(24, arms = Seq(4, 1, 1, 1)), // t, ci->{an,chn,n,rt}, mc->cn, mi->it, mk->k (12)
    Topo(25, arms = Seq(1, 1, 1, 1)), // t, ci->n, mi->it1, mi_idx->it2, mk->k (9)
    Topo(26, arms = Seq(1, 2, 1, 1), hubDims = 1), // t, cc->cct1, ci->{chn,n}, mi_idx->it2, mk->k, kt (11)
    Topo(27, arms = Seq(2, 2, 1, 1, 0)), // t, cc->{cct1,cct2}, mc->{cn,ct}, mk->k, ml->lt, mi (12)
    Topo(28, arms = Seq(2, 2, 1, 1, 1), hubDims = 1), // t, cc->{cct1,cct2}, mc->{cn,ct}, mi->it1, mi_idx->it2, mk->k, kt (14)
    Topo(29, arms = Seq(2, 4, 1, 1, 1), hubDims = 2), // t, cc->{cct1,cct2}, ci->{an,chn,n,rt,(pi,it3 via hub chain)}, mc->cn, mi->it, mk->k (17)
    Topo(30, arms = Seq(2, 1, 1, 1, 1)), // t, cc->{cct1,cct2}, ci->n, mi->it1, mi_idx->it2, mk->k (12)
    Topo(31, arms = Seq(1, 1, 1, 1, 1)), // t, ci->n, mc->cn, mi->it1, mi_idx->it2, mk->k (11)
    Topo(32, arms = Seq(1), twoHub = true, linkDims = 1), // t1, mk->k, ml->lt, t2 (6)
    Topo(33, arms = Seq(1, 1), hubDims = 1, twoHub = true, linkDims = 1,
      secondArms = Seq(1, 1), secondHubDims = 1)) // t1{mc1->cn1, mi_idx1->it1, kt1}, ml->lt, t2{mc2->cn2, mi_idx2->it2, kt2} (14)

  // JOB predicate forms mapped to fixture columns: dim equality/IN (JOB's
  // k.keyword =, cn.country_code =, it.info =), LIKE on names, BETWEEN on
  // years (t.production_year)
  private val dimFilters = Map(
    "part" -> Seq("p_brand IN ('Brand#19','Brand#23','Brand#15')",
      "p_size BETWEEN 1 AND 25", "p_name LIKE '%e%'"),
    "supplier" -> Seq("s_acctbal BETWEEN -500 AND 8000", "s_name LIKE '%1%'"),
    "nation" -> Seq("n_name IN ('NATION_3','NATION_7','NATION_11')",
      "n_regionkey BETWEEN 0 AND 2"),
    "region" -> Seq("r_name IN ('ASIA','EUROPE')"),
    "customer" -> Seq("c_mktsegment IN ('BUILDING','AUTOMOBILE')",
      "c_acctbal BETWEEN 0 AND 5000"))
  private val bridgeFilters = Seq(
    "l_returnflag IN ('A','N')", "l_quantity BETWEEN 5 AND 45",
    "l_shipdate BETWEEN TIMESTAMP'1996-01-01' AND TIMESTAMP'1999-12-31'")
  private val hubFilters = Seq(
    "o_orderdate BETWEEN TIMESTAMP'1995-01-01' AND TIMESTAMP'1998-06-30'",
    "o_orderpriority LIKE '1%'", "o_orderstatus IN ('F','P')")

  /** Tables every topology reads, keyed by fixture name. */
  val tableNames: Seq[String] = Seq("orders", "lineitem", "part",
    "supplier", "nation", "region", "customer")

  /** Build one topology as a DataFrame. Pure function of `t` (filters
    * picked by a Random seeded with the query number — replays exactly). */
  def build(t: Topo, tbls: Map[String, DataFrame]): DataFrame = {
    val rnd = new scala.util.Random(t.q.toLong)
    var nextId = 0
    def prefixed(name: String, filter: Option[String]): (DataFrame, Int) = {
      val id = nextId; nextId += 1
      val base = tbls(name)
      val d = filter.map(base.where).getOrElse(base)
      (d.select(d.columns.map(c => col(c).as(s"a${id}_$c")).toSeq: _*), id)
    }
    def pick(xs: Seq[String]): String = xs(rnd.nextInt(xs.size))

    // hub with its year-style filter
    val (hub, hubId) = prefixed("orders", Some(pick(hubFilters)))
    var acc = hub

    def attachDims(bridgeId: Int, dims: Int): Unit = {
      // chain order: part (bridge FK), supplier (bridge FK),
      // nation (supplier FK), region (nation FK)
      var supId = -1; var natId = -1
      (1 to dims).foreach { d =>
        d match {
          case 1 =>
            val (p, pid) = prefixed("part", Some(pick(dimFilters("part"))))
            acc = acc.join(p,
              col(s"a${bridgeId}_l_partkey") === col(s"a${pid}_p_partkey"))
          case 2 =>
            val (s, sid) = prefixed("supplier",
              if (rnd.nextBoolean()) Some(pick(dimFilters("supplier"))) else None)
            acc = acc.join(s,
              col(s"a${bridgeId}_l_suppkey") === col(s"a${sid}_s_suppkey"))
            supId = sid
          case 3 =>
            val (n, nid) = prefixed("nation", Some(pick(dimFilters("nation"))))
            acc = acc.join(n,
              col(s"a${supId}_s_nationkey") === col(s"a${nid}_n_nationkey"))
            natId = nid
          case 4 =>
            val (r, rid) = prefixed("region", Some(pick(dimFilters("region"))))
            acc = acc.join(r,
              col(s"a${natId}_n_regionkey") === col(s"a${rid}_r_regionkey"))
        }
      }
    }

    def attachArm(hubOrderKeyCol: String, dims: Int): Int = {
      val (b, bid) = prefixed("lineitem",
        if (rnd.nextInt(3) == 0) Some(pick(bridgeFilters)) else None)
      acc = acc.join(b, col(hubOrderKeyCol) === col(s"a${bid}_l_orderkey"))
      attachDims(bid, dims)
      bid
    }

    def attachHubDims(hubCustKeyCol: String, dims: Int): Unit = {
      var custId = -1; var natId = -1
      (1 to dims).foreach { d =>
        d match {
          case 1 =>
            val (c, cid) = prefixed("customer",
              Some(pick(dimFilters("customer"))))
            acc = acc.join(c, col(hubCustKeyCol) === col(s"a${cid}_c_custkey"))
            custId = cid
          case 2 =>
            val (n, nid) = prefixed("nation", Some(pick(dimFilters("nation"))))
            acc = acc.join(n,
              col(s"a${custId}_c_nationkey") === col(s"a${nid}_n_nationkey"))
            natId = nid
          case 3 =>
            val (r, rid) = prefixed("region", Some(pick(dimFilters("region"))))
            acc = acc.join(r,
              col(s"a${natId}_n_regionkey") === col(s"a${rid}_r_regionkey"))
        }
      }
    }

    t.arms.foreach(d => attachArm(s"a${hubId}_o_orderkey", d))
    attachHubDims(s"a${hubId}_o_custkey", t.hubDims)

    if (t.twoHub) {
      // link bridge off hub 1, then the second hub on the bridge's own
      // order key, carrying its own arms/dims (families 32/33)
      val linkId = attachArm(s"a${hubId}_o_orderkey", t.linkDims)
      val (h2, h2id) = prefixed("orders", Some(pick(hubFilters)))
      acc = acc.join(h2,
        col(s"a${linkId}_l_orderkey") === col(s"a${h2id}_o_orderkey"))
      t.secondArms.foreach(d => attachArm(s"a${h2id}_o_orderkey", d))
      attachHubDims(s"a${h2id}_o_custkey", t.secondHubDims)
    }

    // JOB's global MIN aggregate shape
    acc.agg(count(lit(1)).as("n"),
      min(col(s"a${hubId}_o_totalprice")).as("m1"),
      min(col(s"a${hubId}_o_orderdate")).as("m2"))
  }
}
