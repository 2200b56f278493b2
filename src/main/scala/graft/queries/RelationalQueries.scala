package graft.queries

import org.apache.spark.sql.functions._

import QueryDef._

/**
 * The relational query surface: everything the reference workload exercises
 * (SURVEY.md §2.3 — pushed-down scans, up-to-17-table equi joins, global
 * MIN aggregates, projections) plus the operator classes the reference's
 * optimizer traverses as barriers/transparent nodes (§2.2 — grouped/global
 * aggregates, outer/semi/anti joins, set ops, windows, limits).
 *
 * Multi-join queries here are the RPT showcase: with
 * `spark.graft.rpt.enabled=true` (GraftSession default) they run with
 * bloom-filter predicate transfer injected; results must stay byte-identical
 * to the DuckDB oracle — the same differential protocol as the reference's
 * `test_job_queries.sh`.
 *
 * Determinism rules for oracle comparability: money sums are computed as
 * `sum(cast(floor(x * 100) as bigint))` (exact integer arithmetic, no float
 * accumulation-order sensitivity); int outputs are cast to BIGINT on both
 * engines; timestamps are reduced to dates or epoch microseconds.
 */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- scans, filters, projections (pushdown surface) ----
    common("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
        |       count(*) AS count_order,
        |       min(l_extendedprice) AS min_price,
        |       max(l_extendedprice) AS max_price
        |FROM lineitem
        |WHERE l_shipdate <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),

    common("q02_filter_pushdown",
      """SELECT p_partkey, p_name, p_brand, CAST(p_size AS BIGINT) AS p_size
        |FROM part
        |WHERE p_size BETWEEN 10 AND 30
        |  AND p_type LIKE '%a%'
        |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND p_retailprice > 500.0
        |  AND p_name IS NOT NULL""".stripMargin),

    // ---- joins ----
    common("q03_join_agg",
      """SELECT c_mktsegment,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY c_mktsegment""".stripMargin),

    common("q04_chain5_rpt",
      """SELECT n_name,
        |       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin),

    common("q05_star_join",
      """SELECT p_brand,
        |       count(*) AS n_items,
        |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus <> 'O' AND s_acctbal > 0
        |GROUP BY p_brand""".stripMargin),

    // JOB-style: many joins, selective filters, global MINs
    common("q06_job_global_min",
      """SELECT min(o_totalprice) AS min_total,
        |       min(p_name) AS min_pname,
        |       min(s_name) AS min_sname
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE p_size < 25 AND o_orderpriority LIKE '1%' AND n_nationkey < 15""".stripMargin),

    common("q07_semi_exists",
      """SELECT o_orderstatus, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderstatus""".stripMargin),

    common("q08_anti_not_exists",
      """SELECT n_name, count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY n_name""".stripMargin),

    common("q09_left_outer",
      """SELECT c_mktsegment,
        |       count(o_orderkey) AS n_orders,
        |       count(*) AS n_rows
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin),

    common("q10_full_outer",
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       count(c_custkey) AS n_cust,
        |       count(o_orderkey) AS n_ord
        |FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) c
        |FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders
        |                 WHERE o_totalprice > 400000) o
        |ON c.c_custkey = o.o_custkey""".stripMargin),

    // ---- set operations ----
    common("q11_union",
      """SELECT k, count(*) AS n FROM (
        |  SELECT CAST(c_nationkey AS BIGINT) AS k FROM customer
        |  UNION ALL
        |  SELECT CAST(s_nationkey AS BIGINT) AS k FROM supplier
        |) t GROUP BY k""".stripMargin),

    common("q12_intersect_except",
      """SELECT CAST(k AS BIGINT) AS k, src FROM (
        |  SELECT c_nationkey AS k, 'both' AS src FROM customer
        |  INTERSECT
        |  SELECT s_nationkey AS k, 'both' AS src FROM supplier
        |) a
        |UNION ALL
        |SELECT CAST(k AS BIGINT) AS k, src FROM (
        |  SELECT c_nationkey AS k, 'cust_only' AS src FROM customer
        |  EXCEPT
        |  SELECT s_nationkey AS k, 'cust_only' AS src FROM supplier
        |) b""".stripMargin),

    // ---- window functions ----
    common("q13_window_rank",
      """SELECT o_custkey, o_orderkey AS first_order
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders
        |) t WHERE rn = 1""".stripMargin),

    common("q14_window_running",
      """SELECT o_orderkey,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM orders
        |WHERE o_custkey < 50""".stripMargin),

    // ---- aggregation shapes ----
    common("q15_having",
      """SELECT l_partkey, count(*) AS n
        |FROM lineitem GROUP BY l_partkey HAVING count(*) > 40""".stripMargin),

    common("q16_distinct_agg",
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    dialect("q17_rollup",
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation_name,
        |       count(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation_name,
        |       count(*) AS n
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin),

    // ---- subqueries ----
    common("q18_scalar_subquery",
      """SELECT count(*) AS n_big
        |FROM orders
        |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)""".stripMargin),

    common("q19_in_subquery",
      """SELECT count(*) AS n
        |FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)""".stripMargin),

    common("q20_correlated_subquery",
      """SELECT n_name,
        |       (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust
        |FROM nation""".stripMargin),

    // ---- ordering / limits ----
    common("q21_topk",
      """SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),

    // ---- expressions: case / string / date ----
    common("q22_case_string",
      """SELECT upper(substr(c_name, 1, 9)) AS prefix,
        |       CASE WHEN c_acctbal < 0 THEN 'neg'
        |            WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_class,
        |       count(*) AS n,
        |       CAST(sum(length(c_name)) AS BIGINT) AS total_len
        |FROM customer GROUP BY 1, 2""".stripMargin),

    dialect("q23_date_parts",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       count(*) AS n,
        |       min(CAST(o_orderdate AS DATE)) AS first_day
        |FROM orders GROUP BY 1, 2""".stripMargin,
      """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
        |       CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
        |       count(*) AS n,
        |       min(CAST(o_orderdate AS DATE)) AS first_day
        |FROM orders GROUP BY 1, 2""".stripMargin),

    // 8-table join (TPC-H Q8 shape: two nation roles via self-join) — the
    // width class of the reference's JOB workload (up to 17 tables); the
    // transfer schedule must handle the diamond region->n1->customer and
    // the independent supplier->n2 branch
    common("q27_wide_join",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
        |                     THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
        |                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS nation_cents,
        |       count(*) AS n
        |FROM part
        |JOIN lineitem ON p_partkey = l_partkey
        |JOIN supplier ON s_suppkey = l_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA' AND p_size < 25
        |GROUP BY year(o_orderdate)""".stripMargin),

    // ---- events: time bucketing + sessionization (batch analogs of the
    //      streaming pipeline; ts reduced to epoch micros for comparability)
    dialect("q24_events_hourly",
      """SELECT unix_micros(window.start) AS bucket_us, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |GROUP BY window(ts, '1 hour'), event_type""".stripMargin,
      """SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS bucket_us, event_type,
        |       count(*) AS n,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |GROUP BY 1, 2""".stripMargin),

    dialect("q25_events_sessionize",
      """SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |         sum(is_new) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |           CASE WHEN unix_micros(ts) - lag(unix_micros(ts), 1, 0)
        |                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                > 1800000000 THEN 1 ELSE 0 END AS is_new
        |    FROM events) a
        |) b GROUP BY user_id""".stripMargin,
      """SELECT user_id, CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id,
        |         sum(is_new) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |           CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1, 0)
        |                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                > 1800000000 THEN 1 ELSE 0 END AS is_new
        |    FROM events) a
        |) b GROUP BY user_id""".stripMargin),

    // as-of join: for every click, the most recent prior purchase value of
    // the same user. Expressed as ONE window pass (union-free piggyback:
    // last_value IGNORE NULLS over user_id/time order) — the scale-right
    // shape for as-of joins: a single shuffle by user, no inequality join
    // blowup
    dialect("q28_asof_join",
      """SELECT user_id, event_id,
        |       CAST(coalesce(floor(asof_purchase * 100), -1) AS BIGINT) AS purchase_cents
        |FROM (
        |  SELECT user_id, event_id, event_type,
        |         last_value(CASE WHEN event_type = 'purchase' THEN value END, true)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_purchase
        |  FROM events) e
        |WHERE event_type = 'click'""".stripMargin,
      """SELECT user_id, event_id,
        |       CAST(coalesce(floor(asof_purchase * 100), -1) AS BIGINT) AS purchase_cents
        |FROM (
        |  SELECT user_id, event_id, event_type,
        |         last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_purchase
        |  FROM events) e
        |WHERE event_type = 'click'""".stripMargin),

    // banded range join: pairs of events of one user within 60s. The
    // inequality is turned into an equi-join on a time band (each left
    // event registers under its band and the next; a pair within W spans
    // at most adjacent bands, and matches exactly once since the two
    // exploded bands differ) — no O(n^2) inequality join at any scale,
    // shuffle keyed on (user, band)
    dialect("q29_range_band",
      """WITH e AS (SELECT user_id, event_id, unix_micros(ts) AS us FROM events),
        |a AS (SELECT user_id, event_id, us,
        |             explode(array(us DIV 60000000, us DIV 60000000 + 1)) AS bk
        |      FROM e)
        |SELECT a.user_id, count(*) AS n_pairs
        |FROM a JOIN e c
        |  ON a.user_id = c.user_id AND c.us DIV 60000000 = a.bk
        | AND (a.us < c.us OR (a.us = c.us AND a.event_id < c.event_id))
        | AND c.us - a.us <= 60000000
        |GROUP BY a.user_id""".stripMargin,
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |a AS (SELECT user_id, event_id, us,
        |             unnest([us // 60000000, us // 60000000 + 1]) AS bk
        |      FROM e)
        |SELECT a.user_id, count(*) AS n_pairs
        |FROM a JOIN e c
        |  ON a.user_id = c.user_id AND c.us // 60000000 = a.bk
        | AND (a.us < c.us OR (a.us = c.us AND a.event_id < c.event_id))
        | AND c.us - a.us <= 60000000
        |GROUP BY a.user_id""".stripMargin),

    // GROUPING SETS beyond q17's ROLLUP: mixed granularities in one pass
    // (Spark plans one Expand + one aggregation — a single shuffle carries
    // all grouping sets; grouping_id disambiguates the NULL groups)
    common("q30_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority,
        |       count(*) AS n,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority), ())""".stripMargin),

    // PIVOT: Spark's dedicated pivot operator (plans as a single
    // aggregate over the pivot column with one output column per IN
    // value — no row explosion); the oracle re-expresses it as
    // conditional aggregation, which is also its cluster-scale plan
    dialect("q31_pivot",
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderstatus,
        |         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |PIVOT (count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
        |       FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
        |""".stripMargin,
      """SELECT o_orderpriority,
        |       count(*) FILTER (o_orderstatus = 'F') AS f_n,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |            FILTER (o_orderstatus = 'F') AS BIGINT) AS f_cents,
        |       count(*) FILTER (o_orderstatus = 'O') AS o_n,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |            FILTER (o_orderstatus = 'O') AS BIGINT) AS o_cents,
        |       count(*) FILTER (o_orderstatus = 'P') AS p_n,
        |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT))
        |            FILTER (o_orderstatus = 'P') AS BIGINT) AS p_cents
        |FROM orders GROUP BY o_orderpriority""".stripMargin),

    // RECURSIVE CTE (Spark >= 4.0): gap-filled monthly series — the
    // fixed-point union runs on the driver plan side with a bounded
    // depth (84 iterations over 1-row deltas), then one broadcast join
    // against the fact; months with zero orders survive via LEFT JOIN
    common("q32_recursive_series",
      """WITH RECURSIVE months(m) AS (
        |  SELECT DATE '1992-01-01' AS m
        |  UNION ALL
        |  SELECT CAST(m + INTERVAL 1 MONTH AS DATE) AS m FROM months
        |  WHERE m < DATE '1998-12-01')
        |SELECT m, count(o_orderkey) AS n
        |FROM months
        |LEFT JOIN orders ON make_date(year(o_orderdate), month(o_orderdate), 1) = m
        |GROUP BY m""".stripMargin),

    // exact percentiles (median + quartiles): Spark's percentile() and
    // DuckDB's quantile_cont() both use linear interpolation; on the
    // integer-valued quantities the interpolated midpoints are exact in
    // binary, so the results hash-match. (approx_percentile/t-digest
    // sketches are NOT cross-engine comparable — exact percentile is the
    // oracle-checkable form; its plan is a single sort-based aggregate.)
    dialect("q33_percentiles",
      """SELECT l_returnflag,
        |       percentile(l_quantity, 0.5) AS med_qty,
        |       percentile(l_quantity, 0.25) AS q1_qty,
        |       percentile(l_quantity, 0.75) AS q3_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS med_qty,
        |       quantile_cont(l_quantity, 0.25) AS q1_qty,
        |       quantile_cont(l_quantity, 0.75) AS q3_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin),

    // correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    // "top-k per group via lateral" plan shape (distinct from q21's
    // global top-k and q13's window rank). Spark decorrelates the lateral
    // into a ranked join; DuckDB executes it natively. Tie-break on
    // o_orderkey keeps the row set deterministic on both engines.
    // per-group top-k via the bounded TopK aggregate (graft.ops.TopK)
    // instead of the LATERAL ... ORDER BY ... LIMIT form: the lateral (or
    // its window-rank equivalent) sorts every row of every group; the
    // aggregate keeps ≤2k candidates per partial buffer so the shuffle
    // carries k rows per group per partition — the shape that survives a
    // customer with millions of orders. Plan pinned by PlanShapeSuite (no
    // Window, no per-group Sort). The oracle keeps the lateral SQL: same
    // semantics, independent derivation.
    QueryDef("q34_lateral_topk",
      (spark, sfDir) => {
        views(spark, sfDir)
        import org.apache.spark.sql.functions.{col, explode}
        spark.table("customer").where("c_custkey < 20")
          .join(spark.table("orders"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_custkey")
          .agg(graft.ops.TopK.topK(2)(
            col("o_totalprice"), col("o_orderkey")).as("tk"))
          .select(col("c_custkey"), explode(col("tk")).as("t"))
          .selectExpr("c_custkey", "t._2 AS o_orderkey",
            "t._1 AS o_totalprice")
      },
      Some("""SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey < 20""".stripMargin)),

    // 14-table JOB-depth join — the workload depth the reference was built
    // for (its JOB envelope joins up to 17 tables; the registry previously
    // topped out at q27's 8). Shape: the customer chain region→nation→
    // customer→orders fans out through TWO lineitems of the same order,
    // each with its own part + supplier→nation→region chain — a chain ×
    // star mix whose transfer graph is a 14-node tree of diameter 8
    // (sr1→sn1→s1→l1→o→l2→s2→sn2→sr2): a region leaf's filter reaches
    // the opposite region leaf only through the full forward+backward
    // cascade (depth 5 per pass from the lineitem root — the schema's
    // maximum; pinned by JobDepthSuite). Global-MIN
    // aggregates keep the output 1 row (the JOB output convention) while
    // every join must still run in full. The l1↔l2 linenumber disequality
    // rides the o_orderkey equi edge as an "other" conjunct — the mixed
    // condition class JOB hits constantly.
    common("q35_job_depth",
      """SELECT count(*) AS n,
        |       min(CAST(floor(l1.l_extendedprice * 100) AS BIGINT)) AS min_price_cents,
        |       min(p1.p_name) AS min_part,
        |       min(s2.s_name) AS min_supp,
        |       min(c.c_name) AS min_cust
        |FROM region cr
        |JOIN nation cn ON cn.n_regionkey = cr.r_regionkey
        |JOIN customer c ON c.c_nationkey = cn.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l1 ON l1.l_orderkey = o.o_orderkey
        |JOIN part p1 ON p1.p_partkey = l1.l_partkey
        |JOIN supplier s1 ON s1.s_suppkey = l1.l_suppkey
        |JOIN nation sn1 ON sn1.n_nationkey = s1.s_nationkey
        |JOIN region sr1 ON sr1.r_regionkey = sn1.n_regionkey
        |JOIN lineitem l2 ON l2.l_orderkey = o.o_orderkey AND l2.l_linenumber <> l1.l_linenumber
        |JOIN part p2 ON p2.p_partkey = l2.l_partkey
        |JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |JOIN nation sn2 ON sn2.n_nationkey = s2.s_nationkey
        |JOIN region sr2 ON sr2.r_regionkey = sn2.n_regionkey
        |WHERE cr.r_name = 'ASIA'
        |  AND sr1.r_name = 'EUROPE'
        |  AND sr2.r_name = 'AMERICA'
        |  AND p1.p_size <= 10
        |  AND p2.p_size >= 40
        |  AND o.o_orderstatus = 'F'
        |  AND l1.l_quantity >= 25""".stripMargin),

    // 17-table join — the reference workload's MAXIMUM width (its JOB
    // envelope tops out at 17 tables). Extends q35's chain×star shape
    // with a second ORDER of the same customer (its own full lineitem→
    // part/supplier→nation→region chain) and a second lineitem of the
    // first order — so the transfer tree carries two fan-out diamonds
    // (customer→{o1,o2}, o1→{l1,l3}) that stress the schedule's
    // member-overlap guard alongside the depth. Selective filters keep
    // the result small while every join runs in full.
    common("q36_job_width",
      """SELECT count(*) AS n,
        |       min(CAST(floor(l1.l_extendedprice * 100) AS BIGINT)) AS min_price_cents,
        |       min(p3.p_name) AS min_part,
        |       min(s2.s_name) AS min_supp,
        |       min(o2.o_orderkey) AS min_o2
        |FROM region cr
        |JOIN nation cn ON cn.n_regionkey = cr.r_regionkey
        |JOIN customer c ON c.c_nationkey = cn.n_nationkey
        |JOIN orders o1 ON o1.o_custkey = c.c_custkey
        |JOIN lineitem l1 ON l1.l_orderkey = o1.o_orderkey
        |JOIN part p1 ON p1.p_partkey = l1.l_partkey
        |JOIN supplier s1 ON s1.s_suppkey = l1.l_suppkey
        |JOIN nation sn1 ON sn1.n_nationkey = s1.s_nationkey
        |JOIN region sr1 ON sr1.r_regionkey = sn1.n_regionkey
        |JOIN orders o2 ON o2.o_custkey = c.c_custkey AND o2.o_orderkey <> o1.o_orderkey
        |JOIN lineitem l2 ON l2.l_orderkey = o2.o_orderkey
        |JOIN part p2 ON p2.p_partkey = l2.l_partkey
        |JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        |JOIN nation sn2 ON sn2.n_nationkey = s2.s_nationkey
        |JOIN region sr2 ON sr2.r_regionkey = sn2.n_regionkey
        |JOIN lineitem l3 ON l3.l_orderkey = o1.o_orderkey AND l3.l_linenumber <> l1.l_linenumber
        |JOIN part p3 ON p3.p_partkey = l3.l_partkey
        |WHERE cr.r_name = 'EUROPE'
        |  AND sr1.r_name = 'ASIA'
        |  AND sr2.r_name = 'AMERICA'
        |  AND o2.o_orderstatus = 'P'
        |  AND p1.p_size <= 10
        |  AND p2.p_size >= 40
        |  AND p3.p_size BETWEEN 20 AND 25
        |  AND l1.l_quantity >= 40""".stripMargin),

    // The chain through the graft-parquet v2 source: same semantics as a
    // stock read (the oracle reads the same files), but the RPT rule's
    // in-scan transfer (v2ScanFilter) and the stock DPP path both light
    // up on these scans — this row keeps the source itself under the
    // external hash gate, not just its suite.
    QueryDef("q37_v2_scan_transfer",
      (spark, sfDir) => {
        val l = spark.read.format("graft-parquet")
          .load(s"$sfDir/lineitem.parquet")
        val o = spark.read.format("graft-parquet")
          .load(s"$sfDir/orders.parquet").where("o_totalprice < 20000")
        val c = spark.read.parquet(s"$sfDir/customer.parquet")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(c("c_mktsegment"))
          .agg(
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("cnt"),
            org.apache.spark.sql.functions.min(l("l_orderkey")).as("min_ok"),
            org.apache.spark.sql.functions.max(l("l_orderkey")).as("max_ok"))
      },
      Some("""SELECT c_mktsegment, count(*) AS cnt,
         |       min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE o_totalprice < 20000
         |GROUP BY c_mktsegment""".stripMargin)),

    // JSON-ish props column
    dialect("q26_events_json",
      """SELECT event_type,
        |       CAST(sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin,
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY event_type""".stripMargin)
  )
}
