package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The relational core: scans, projections, filters, every join shape,
  * aggregation, window functions, set ops, scalar functions, subqueries.
  *
  * The reference pipeline itself has no relational surface beyond a Kafka
  * scan + projection (SURVEY.md §2.3 — "no joins"); this module is the
  * generalized query surface mandated by BASELINE.json's north star, built
  * purely from declarative `org.apache.spark.sql` primitives so Catalyst
  * owns pushdown, join strategy (broadcast vs shuffle), and codegen.
  *
  * Money aggregates run in exact decimal: the per-row double product of
  * 2-dp inputs is mathematically a 4-dp value, so double->decimal(30,6)
  * rounds to the identical decimal in Spark and DuckDB, and decimal sums
  * are exact in both engines — bit-identical results at any parallelism.
  * Final money columns are then cast decimal->DOUBLE on BOTH sides: the
  * decimal values are identical, so the double conversions are identical,
  * and the driver's pandas-based hash compare (which renders parquet
  * decimals and DuckDB decimals as different Python types) can match.
  */
object Relational extends QueryModule {

  /** disc_price term used by several queries: exact decimal of a 4-dp value. */
  private def discPrice = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    .cast("decimal(30,6)")
  private val discPriceSql = "CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,6))"

  def defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q01
    // TPC-H Q1 shape: scan -> filter -> hash aggregate. Partial (map-side)
    // aggregation makes this shuffle only |groups| rows per partition.
    QueryDef("q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity".cast("decimal(30,6)")).cast("decimal(38,6)")
              .cast("double").as("sum_qty"),
            sum($"l_extendedprice".cast("decimal(30,6)")).cast("decimal(38,6)")
              .cast("double").as("sum_base_price"),
            sum(discPrice).cast("decimal(38,6)").cast("double").as("sum_disc_price"),
            round(avg($"l_quantity"), 4).as("avg_qty"),
            round(avg($"l_extendedprice"), 4).as("avg_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty,
        CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_base_price,
        CAST(CAST(sum($discPriceSql) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
        round(avg(l_quantity), 4) AS avg_qty,
        round(avg(l_extendedprice), 4) AS avg_price,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---------------------------------------------------------------- q02
    // Selective filter + narrow projection: both must reach the parquet scan
    // (PushedFilters + 4-column ReadSchema).
    QueryDef("q02_filter_project",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_quantity" > 49 && $"l_returnflag" === "R")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity > 49 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber""")),

    // ---------------------------------------------------------------- q03
    // TPC-H Q3 shape: 3-way join, aggregate, deterministic top-10.
    // customer is small relative to lineitem -> Catalyst broadcasts it.
    QueryDef("q03_topn_revenue",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
          .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .filter($"o_orderdate" < to_timestamp(lit("1998-01-01")) &&
                  $"l_shipdate" > to_timestamp(lit("1998-01-01")))
          .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
          .agg(sum(discPrice).cast("decimal(38,6)").cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(CAST(sum($discPriceSql) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---------------------------------------------------------------- q04
    // 5-way join (flagship): the two large tables shuffle-join on orderkey;
    // customer/nation/region are broadcast. Revenue per region/nation.
    QueryDef("q04_revenue_by_nation",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .join(t(s, dir, "nation"), $"c_nationkey" === $"n_nationkey")
          .join(t(s, dir, "region"), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"n_name")
          .agg(sum(discPrice).cast("decimal(38,6)").cast("double").as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"n_name")
      },
      Some(s"""SELECT r_name, n_name,
        CAST(CAST(sum($discPriceSql) AS DECIMAL(38,6)) AS DOUBLE) AS revenue, count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    // ---------------------------------------------------------------- q05
    // Left outer join preserving customers with zero orders.
    QueryDef("q05_left_join_spend",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_outer")
          .groupBy($"c_custkey", $"c_name")
          .agg(count($"o_orderkey").as("order_cnt"),
               coalesce(sum($"o_totalprice".cast("decimal(30,6)")).cast("decimal(38,6)"),
                        lit(0).cast("decimal(38,6)")).cast("double").as("spend"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt,
        CAST(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(38,6)),
                 CAST(0 AS DECIMAL(38,6))) AS DOUBLE) AS spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q29
    // Right outer join (J1 completes the join surface: q05 covers left).
    QueryDef("q29_right_outer",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey", "right_outer")
          .groupBy($"c_custkey", $"c_name")
          .agg(count($"o_orderkey").as("order_cnt"),
               max($"o_orderdate").as("last_order"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, count(o_orderkey) AS order_cnt,
        max(o_orderdate) AS last_order
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q06
    // Left-semi join = EXISTS.
    QueryDef("q06_semi_join",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders").filter($"o_totalprice" > 400000.0),
                $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q07
    // Left-anti join = NOT EXISTS. Filter on the right side (no finalized
    // orders) keeps the result non-empty at every fixture SF.
    QueryDef("q07_anti_join",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .join(t(s, dir, "orders").filter($"o_orderstatus" === "F"),
                $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q08
    // Full outer join of two aggregates (25 nations, only 10 have suppliers).
    QueryDef("q08_full_outer",
      (s, dir) => {
        import s.implicits._
        val cc = t(s, dir, "customer").groupBy($"c_nationkey".as("nk_c"))
          .agg(count(lit(1)).as("customers"))
        val sc = t(s, dir, "supplier").groupBy($"s_nationkey".as("nk_s"))
          .agg(count(lit(1)).as("suppliers"))
        cc.join(sc, $"nk_c" === $"nk_s", "full_outer")
          .select(coalesce($"nk_c", $"nk_s").as("nationkey"),
                  coalesce($"customers", lit(0L)).as("customers"),
                  coalesce($"suppliers", lit(0L)).as("suppliers"))
          .orderBy($"nationkey")
      },
      Some("""SELECT coalesce(cc.nk, sc.nk) AS nationkey,
        coalesce(cc.customers, 0) AS customers, coalesce(sc.suppliers, 0) AS suppliers
        FROM (SELECT c_nationkey AS nk, count(*) AS customers FROM customer GROUP BY 1) cc
        FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS suppliers FROM supplier GROUP BY 1) sc
        ON cc.nk = sc.nk ORDER BY nationkey""")),

    // ---------------------------------------------------------------- q09
    // Non-equi (theta) join: equi key + range predicate.
    QueryDef("q09_theta_join",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "supplier")
          .join(t(s, dir, "customer"),
                $"s_nationkey" === $"c_nationkey" && $"c_acctbal" > $"s_acctbal")
          .groupBy($"s_suppkey", $"s_name")
          .agg(count(lit(1)).as("richer_customers"))
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name, count(*) AS richer_customers
        FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
        GROUP BY s_suppkey, s_name ORDER BY s_suppkey""")),

    // ---------------------------------------------------------------- q10
    // Window top-k per key (reference W1 "latest chunk per stream",
    // generalized): rank on raw stored doubles — no arithmetic, so ordering
    // is exact in both engines; ties broken by key.
    QueryDef("q10_window_topk",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"rn")
      },
      Some("""SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // ---------------------------------------------------------------- q11
    // Running aggregate + lag (reference A2's "window over arrival order",
    // generalized). Frame-ordered sequential sum -> decimal keeps it exact.
    QueryDef("q11_window_running",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        t(s, dir, "orders")
          .select($"o_custkey", $"o_orderkey",
            sum($"o_totalprice".cast("decimal(30,6)"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("decimal(38,6)").cast("double").as("running_spend"),
            lag($"o_orderkey", 1).over(w).as("prev_orderkey"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,6))
          AS DOUBLE) AS running_spend,
        lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---------------------------------------------------------------- q12
    // ROLLUP grouping sets; null group keys coalesced to a sentinel so row
    // identity is total-order-able in both engines.
    QueryDef("q12_rollup",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .rollup($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast("decimal(30,6)")).cast("decimal(38,6)")
                 .cast("double").as("total"))
          .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
                  coalesce($"o_orderpriority", lit("ALL")).as("priority"),
                  $"n", $"total")
          .orderBy($"status", $"priority")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ---------------------------------------------------------------- q13
    // Exact distinct aggregation (expands to two-phase aggregate).
    QueryDef("q13_distinct_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(countDistinct($"l_orderkey").as("distinct_orders"),
               countDistinct($"l_partkey").as("distinct_parts"),
               count(lit(1)).as("n_rows"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_orderkey) AS distinct_orders,
        count(DISTINCT l_partkey) AS distinct_parts, count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---------------------------------------------------------------- q14
    // UNION (distinct).
    QueryDef("q14_union",
      (s, dir) => {
        import s.implicits._
        val f = t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_custkey".as("custkey"))
        val p = t(s, dir, "orders").filter($"o_orderstatus" === "P")
          .select($"o_custkey".as("custkey"))
        f.union(p).distinct().orderBy($"custkey")
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        UNION SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        ORDER BY custkey""")),

    // ---------------------------------------------------------------- q15
    // INTERSECT.
    QueryDef("q15_intersect",
      (s, dir) => {
        import s.implicits._
        val f = t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_custkey".as("custkey"))
        val o = t(s, dir, "orders").filter($"o_orderstatus" === "O")
          .select($"o_custkey".as("custkey"))
        f.intersect(o).orderBy($"custkey")
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY custkey""")),

    // ---------------------------------------------------------------- q16
    // EXCEPT.
    QueryDef("q16_except",
      (s, dir) => {
        import s.implicits._
        val f = t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_custkey".as("custkey"))
        val o = t(s, dir, "orders").filter($"o_orderstatus" === "O")
          .select($"o_custkey".as("custkey"))
        f.except(o).orderBy($"custkey")
      },
      Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY custkey""")),

    // ---------------------------------------------------------------- q17
    // Scalar string functions (reference F1/F2/F8-F10 generalized).
    QueryDef("q17_string_fns",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "customer")
          .select($"c_custkey",
            upper($"c_name").as("name_upper"),
            length($"c_name").as("name_len"),
            substring($"c_name", 1, 8).as("name_pfx"),
            concat_ws("/", $"c_mktsegment", $"c_name").as("seg_path"),
            md5($"c_name").as("name_md5"),
            regexp_replace($"c_name", "[0-9]+", "#").as("name_norm"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, upper(c_name) AS name_upper,
        CAST(length(c_name) AS INTEGER) AS name_len,
        substring(c_name, 1, 8) AS name_pfx,
        concat_ws('/', c_mktsegment, c_name) AS seg_path,
        md5(c_name) AS name_md5,
        regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_norm
        FROM customer ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q48
    // Id/serialization scalars (reference F2 uuid+substring, F9 to_json,
    // F10 initcap). uuid() is inherently non-deterministic, so the checked
    // columns are its SHAPE (length, hex-grammar, the reference's
    // vod-{hex12} id format), which pin the expression without pinning RNG.
    QueryDef("q48_scalar_ids",
      (s, dir) => {
        import s.implicits._
        val u = expr("uuid()")
        t(s, dir, "customer")
          .select($"c_custkey",
            length(u).cast("int").as("uuid_len"),
            u.rlike("^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
              .as("uuid_shape"),
            concat(lit("vod-"), substring(regexp_replace(expr("uuid()"), "-", ""), 1, 12))
              .rlike("^vod-[0-9a-f]{12}$").as("vod_id_shape"),
            initcap(lower($"c_name")).as("name_title"),
            to_json(struct($"c_custkey".as("k"), $"c_mktsegment".as("seg"))).as("j"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
        36 AS uuid_len, true AS uuid_shape, true AS vod_id_shape,
        array_to_string(list_transform(string_split(lower(c_name), ' '),
          w -> upper(w[1]) || w[2:]), ' ') AS name_title,
        to_json(struct_pack(k := c_custkey, seg := c_mktsegment)) AS j
        FROM customer ORDER BY c_custkey""")),

    // ---------------------------------------------------------------- q18
    // Date/time functions (reference F3-F5 generalized).
    QueryDef("q18_datetime_fns",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .select($"o_orderkey",
            year($"o_orderdate").as("yr"),
            quarter($"o_orderdate").as("qtr"),
            month($"o_orderdate").as("mo"),
            date_format($"o_orderdate", "yyyy-MM").as("ym"),
            expr("timestampadd(DAY, 30, o_orderdate)").as("due_ts"),
            expr("timestampdiff(DAY, o_orderdate, TIMESTAMP '2002-01-01')").as("age_days"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        CAST(month(o_orderdate) AS INTEGER) AS mo,
        strftime(o_orderdate, '%Y-%m') AS ym,
        o_orderdate + INTERVAL 30 DAY AS due_ts,
        datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS age_days
        FROM orders ORDER BY o_orderkey""")),

    // ---------------------------------------------------------------- q19
    // CASE WHEN bucketing + conditional aggregation (reference A8's status
    // machine generalized to value-dependent routing).
    QueryDef("q19_case_buckets",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .select($"o_totalprice",
            when($"o_totalprice" > 300000.0, "high")
              .when($"o_totalprice" > 100000.0, "mid")
              .otherwise("low").as("bucket"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n"),
               sum($"o_totalprice".cast("decimal(30,6)")).cast("decimal(38,6)")
                 .cast("double").as("total"))
          .orderBy($"bucket")
      },
      Some("""SELECT CASE WHEN o_totalprice > 300000.0 THEN 'high'
                         WHEN o_totalprice > 100000.0 THEN 'mid'
                         ELSE 'low' END AS bucket,
        count(*) AS n,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE) AS total
        FROM orders GROUP BY 1 ORDER BY bucket""")),

    // ---------------------------------------------------------------- q20
    // Scalar subquery / HAVING over an aggregate-of-aggregate: customers
    // whose spend exceeds 1.5x the mean per-customer spend.
    QueryDef("q20_having_subquery",
      (s, dir) => {
        import s.implicits._
        val spend = t(s, dir, "orders").groupBy($"o_custkey")
          .agg(sum($"o_totalprice".cast("decimal(30,6)")).cast("decimal(38,6)").as("spend"))
        val avgSpend = spend.agg(avg($"spend").cast("decimal(38,6)").as("threshold_base"))
        spend.crossJoin(avgSpend)
          .filter($"spend" > $"threshold_base" * 1.5)
          .select($"o_custkey", $"spend".cast("double").as("spend"))
          .orderBy($"o_custkey")
      },
      Some("""SELECT o_custkey,
        CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey
        HAVING CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(38,6)) >
          (SELECT CAST(avg(spend) AS DECIMAL(38,6)) FROM (
             SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS spend
             FROM orders GROUP BY o_custkey)) * 1.5
        ORDER BY o_custkey""")),

    // ---------------------------------------------------------------- q55
    // Skew-safe join: the salted form (operators.JoinStrategies.saltedJoin)
    // spreads each join key over `salts` shuffle partitions — the manual
    // remedy for a single key too large for one executor, where AQE's
    // skew-split can't help (it only splits the probe side). The result is
    // identical to the plain join, which is exactly what the oracle checks.
    QueryDef("q55_salted_join",
      (s, dir) => {
        import s.implicits._
        val lineitem = t(s, dir, "lineitem")
          .select($"l_suppkey", $"l_orderkey", $"l_quantity")
        val supplier = t(s, dir, "supplier")
          .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
        graft.operators.JoinStrategies
          .saltedJoin(lineitem, supplier, key = "l_suppkey",
            rowKey = "l_orderkey", salts = 8)
          .groupBy($"s_nationkey")
          .agg(count(lit(1)).as("line_cnt"),
               sum($"l_quantity".cast("decimal(30,6)")).cast("decimal(38,6)")
                 .cast("double").as("sum_qty"))
          .orderBy($"s_nationkey")
      },
      Some("""SELECT s_nationkey, count(*) AS line_cnt,
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // ---------------------------------------------------------------- q91
    // Bloom-filter join pruning, audited: build an md5-derived bit-set from
    // the BUILDING customers, prune orders to rows passing all k bits, and
    // report what the filter did — rows before/after, the true match count,
    // false negatives (pinned 0: a Bloom filter can only over-approximate),
    // and the false-positive spill. The probe side never shuffles: the bit
    // frame (≤ m rows however large the build side) broadcasts into k
    // map-only semi joins — the shape that drops most of a 100 TB probe at
    // the scan instead of carrying it to the join. The oracle rebuilds the
    // identical filter from the same hashes, so every count matches exactly.
    QueryDef("q91_bloom_prune_join",
      (s, dir) => {
        import s.implicits._
        import graft.operators.BloomJoin
        val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val orders = t(s, dir, "orders")
        val bits = BloomJoin.buildBits(cust, $"c_custkey")
        val pruned = BloomJoin.prune(orders, $"o_custkey", bits)
        val ck = cust.select($"c_custkey")
        val exact = orders.join(ck, $"o_custkey" === $"c_custkey", "left_semi")
        val exactAfter = pruned.join(ck, $"o_custkey" === $"c_custkey", "left_semi")
        orders.agg(count(lit(1)).as("n_probe"))
          .crossJoin(pruned.agg(count(lit(1)).as("n_after_bloom")))
          .crossJoin(exact.agg(count(lit(1)).as("n_true")))
          .crossJoin(exactAfter.agg(count(lit(1)).as("n_true_after")))
          .select($"n_probe", $"n_after_bloom", $"n_true",
            ($"n_true" - $"n_true_after").as("false_negatives"),
            ($"n_after_bloom" - $"n_true_after").as("false_positives"),
            round(lit(1.0) -
              $"n_after_bloom".cast("double") / $"n_probe".cast("double"), 6)
              .as("prune_ratio"))
      },
      Some {
        def bit(i: Int, key: String) =
          s"CAST(concat('0x', substr(md5('$i:' || CAST($key AS VARCHAR)), 1, 15)) AS BIGINT) % 16384"
        val passes = (0 until 3).map(i =>
          s"EXISTS (SELECT 1 FROM bits WHERE bit = ${bit(i, "o.o_custkey")})")
          .mkString("\n            AND ")
        s"""WITH cust AS (SELECT c_custkey FROM customer
            WHERE c_mktsegment = 'BUILDING'),
          ks AS (SELECT unnest([0, 1, 2]) AS i),
          bits AS (SELECT DISTINCT
              CAST(concat('0x', substr(md5(CAST(i AS VARCHAR) || ':' ||
                CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 16384 AS bit
            FROM cust CROSS JOIN ks),
          pruned AS (SELECT o.* FROM orders o
            WHERE $passes),
          m AS (SELECT
            (SELECT count(*) FROM orders) AS np,
            (SELECT count(*) FROM pruned) AS nab,
            (SELECT count(*) FROM orders o WHERE EXISTS
              (SELECT 1 FROM cust WHERE c_custkey = o.o_custkey)) AS nt,
            (SELECT count(*) FROM pruned o WHERE EXISTS
              (SELECT 1 FROM cust WHERE c_custkey = o.o_custkey)) AS nta)
        SELECT CAST(np AS BIGINT) AS n_probe, CAST(nab AS BIGINT) AS n_after_bloom,
          CAST(nt AS BIGINT) AS n_true,
          CAST(nt - nta AS BIGINT) AS false_negatives,
          CAST(nab - nta AS BIGINT) AS false_positives,
          round(CAST(1.0 AS DOUBLE) - CAST(nab AS DOUBLE) / CAST(np AS DOUBLE), 6)
            AS prune_ratio
        FROM m"""
      }),

    // ---------------------------------------------------------------- q96
    // Join-key skew profiles for the three hot keys in the schema — the
    // measurement that picks between plain shuffle, AQE skew-split, and
    // JoinStrategies.saltedJoin BEFORE a 100 TB shuffle launches, instead
    // of learning the hot key from a dying executor. One keyed count per
    // relation (map-side combined) plus a one-row aggregate; the salt
    // recommendation is ceil(max/mean) capped at 32.
    QueryDef("q96_skew_profile",
      (s, dir) => {
        import s.implicits._
        import graft.operators.JoinStrategies.skewProfile
        def p(df: org.apache.spark.sql.DataFrame, key: String, label: String) =
          skewProfile(df, key, label, exactP99 = true)
        p(t(s, dir, "events"), "user_id", "events.user_id")
          .unionByName(p(t(s, dir, "lineitem"), "l_suppkey",
            "lineitem.l_suppkey"))
          .unionByName(p(t(s, dir, "orders"), "o_custkey",
            "orders.o_custkey"))
          .orderBy($"rel")
      },
      Some {
        def one(rel: String, key: String, table: String) = {
          val skew = "round(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)" +
            " / CAST(sum(cnt) AS DOUBLE), 6)"
          s"""SELECT '$rel' AS rel, CAST(sum(cnt) AS BIGINT) AS n_rows,
            count(*) AS n_keys, max(cnt) AS max_cnt,
            round(quantile_cont(cnt, 0.99), 6) AS p99_cnt,
            round(CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
              AS mean_cnt,
            $skew AS skew_ratio,
            CAST(least(32, greatest(1, CAST(ceil($skew) AS BIGINT)))
              AS BIGINT) AS recommended_salts
          FROM (SELECT $key AS k, count(*) AS cnt FROM $table GROUP BY 1)"""
        }
        s"""SELECT * FROM (
          ${one("events.user_id", "user_id", "events")}
          UNION ALL ${one("lineitem.l_suppkey", "l_suppkey", "lineitem")}
          UNION ALL ${one("orders.o_custkey", "o_custkey", "orders")})
        ORDER BY rel"""
      }),

    // ---------------------------------------------------------------- q97
    // The decision q96's measurement feeds: a strategy verdict per
    // prospective join — broadcast the smaller side when it fits the
    // budget, salt when the shuffled key is skewed past threshold, plain
    // shuffle otherwise. Three pairs exercise all three verdicts; the
    // thresholds are explicit parameters (per-pair here), so the policy
    // itself is what the oracle pins, not one engine's size estimate.
    QueryDef("q97_join_advisor",
      (s, dir) => {
        import graft.operators.JoinStrategies.adviseJoin
        adviseJoin(t(s, dir, "orders"), "o_custkey",
            t(s, dir, "customer"), "c_custkey", "orders*customer")
          .unionByName(adviseJoin(t(s, dir, "lineitem"), "l_orderkey",
            t(s, dir, "orders"), "o_orderkey", "lineitem*orders",
            broadcastRows = 1000L, skewThreshold = 100.0))
          .unionByName(adviseJoin(t(s, dir, "lineitem"), "l_suppkey",
            t(s, dir, "supplier"), "s_suppkey", "lineitem*supplier",
            broadcastRows = 10L, skewThreshold = 1.0))
          .orderBy(col("rel"))
      },
      Some {
        def one(rel: String, lt: String, lk: String, rt: String, rk: String,
            bRows: Long, skewThr: Double) = {
          def prof(table: String, key: String, p: String) =
            s"""(SELECT CAST(sum(cnt) AS BIGINT) AS ${p}_rows,
              count(*) AS ${p}_keys,
              round(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                / CAST(sum(cnt) AS DOUBLE), 6) AS ${p}_skew,
              least(32, greatest(1, CAST(ceil(
                round(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                  / CAST(sum(cnt) AS DOUBLE), 6)) AS BIGINT))) AS ${p}_salts
            FROM (SELECT $key AS k, count(*) AS cnt FROM $table GROUP BY 1))"""
          s"""SELECT '$rel' AS rel, left_rows, right_rows, left_keys,
            right_keys, left_skew, right_skew,
            CASE WHEN least(left_rows, right_rows) <= $bRows THEN
                CASE WHEN right_rows <= left_rows THEN 'broadcast_right'
                  ELSE 'broadcast_left' END
              WHEN greatest(left_skew, right_skew)
                  >= CAST($skewThr AS DOUBLE) THEN 'salted_shuffle'
              ELSE 'shuffle' END AS strategy,
            CASE WHEN least(left_rows, right_rows) > $bRows
                AND greatest(left_skew, right_skew)
                  >= CAST($skewThr AS DOUBLE)
              THEN greatest(left_salts, right_salts)
              ELSE CAST(1 AS BIGINT) END AS salts
          FROM ${prof(lt, lk, "left")} AS l CROSS JOIN ${prof(rt, rk, "right")} AS r"""
        }
        s"""SELECT * FROM (
          ${one("orders*customer", "orders", "o_custkey", "customer",
            "c_custkey", 1000000L, 4.0)}
          UNION ALL ${one("lineitem*orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey", 1000L, 100.0)}
          UNION ALL ${one("lineitem*supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey", 10L, 1.0)})
        ORDER BY rel"""
      }),

    // ---------------------------------------------------------------- q98
    // Write/compaction plan for the documents corpus partitioned by
    // source: files-per-partition and rows-per-file sized so output files
    // land near the 64 KB target (scaled down for the fixture; the real
    // knob is 256 MB-1 GB). One map-side-combined groupBy over a byte
    // proxy the caller owns (n_chars), so the plan is engine-reproducible
    // — this is the small-files defense for a 1000-executor write.
    QueryDef("q98_compaction_plan",
      (s, dir) => {
        import s.implicits._
        graft.operators.Layout.compactionPlan(
            t(s, dir, "documents"), Seq("source"), $"n_chars", 65536L)
          .orderBy($"source")
      },
      Some("""SELECT source, count(*) AS n_rows,
          CAST(sum(n_chars) AS BIGINT) AS est_bytes,
          greatest(CAST(1 AS BIGINT), CAST(ceil(
            CAST(sum(n_chars) AS DOUBLE) / 65536.0) AS BIGINT)) AS target_files,
          CAST(ceil(CAST(count(*) AS DOUBLE) /
            CAST(greatest(CAST(1 AS BIGINT), CAST(ceil(CAST(sum(n_chars)
              AS DOUBLE) / 65536.0) AS BIGINT)) AS DOUBLE)) AS BIGINT)
            AS rows_per_file,
          round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
            AS avg_row_bytes
        FROM documents GROUP BY source ORDER BY source""")),

    // ---------------------------------------------------------------- q99
    // Range-partition layout audit: the 7 interior octile boundaries of
    // documents.n_chars (what repartitionByRange(8) would aim at) and the
    // row count + fraction each resulting bucket actually receives. The
    // boundaries are ONE interpolated-percentile aggregate; bucket
    // assignment is a broadcast array fold (no shuffle of the corpus);
    // the only exchange is the 8-row count. Octiles (p = i/8) keep the
    // interpolation arithmetic exact in binary floating point, so the
    // DuckDB quantile_cont boundaries are bit-identical.
    QueryDef("q99_range_layout_audit",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val bounds = graft.operators.Layout.rangeSplitPoints(docs, "n_chars", 8)
        val bal = graft.operators.Layout.rangeBalance(docs, $"n_chars", bounds)
        val tot = bal.agg(sum($"n_rows").cast("long").as("__t"))
        bal.crossJoin(broadcast(tot))
          .join(bounds.select(($"bucket" - 1).as("bucket"),
            $"boundary".as("ub")), Seq("bucket"), "left")
          .select($"bucket", round($"ub", 6).as("upper_boundary"), $"n_rows",
            round($"n_rows".cast("double") / $"__t".cast("double"), 6)
              .as("frac"))
          .orderBy($"bucket")
      },
      Some("""WITH qs AS (SELECT quantile_cont(n_chars,
            [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q
          FROM documents),
        b AS (SELECT CAST(len(list_filter((SELECT q FROM qs),
            x -> n_chars > x)) AS BIGINT) AS bucket FROM documents),
        bal AS (SELECT bucket, count(*) AS n_rows FROM b GROUP BY bucket),
        tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t FROM bal)
        SELECT bucket,
          round((SELECT q FROM qs)[CAST(bucket + 1 AS INTEGER)], 6)
            AS upper_boundary,
          n_rows,
          round(CAST(n_rows AS DOUBLE) / CAST(t AS DOUBLE), 6) AS frac
        FROM bal CROSS JOIN tot ORDER BY bucket""")),

    // --------------------------------------------------------------- q105
    // Data-quality expectations across the schema: row-level checks fold
    // into ONE count_if aggregate per table (k checks never cost k scans),
    // referential integrity is one anti-join each, PK uniqueness one keyed
    // count — all melted into a uniform (tbl, chk, n_bad, n_total,
    // bad_frac) audit a pipeline gate alerts on. Zeros on healthy fixture
    // tables are the point: the audit EARNS the zeros.
    QueryDef("q105_quality_audit",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Audits
        Audits.rowChecks(t(s, dir, "lineitem"), "lineitem", Seq(
            "li_nonpositive_qty" -> ($"l_quantity" <= 0),
            "li_negative_price" -> ($"l_extendedprice" < 0)))
          .unionByName(Audits.rowChecks(t(s, dir, "events"), "events", Seq(
            "ev_null_user" -> $"user_id".isNull,
            "ev_negative_value" -> ($"value" < 0))))
          .unionByName(Audits.fkOrphans(t(s, dir, "lineitem"), "l_orderkey",
            t(s, dir, "orders"), "o_orderkey", "lineitem",
            "li_orphan_orderkey"))
          .unionByName(Audits.fkOrphans(t(s, dir, "orders"), "o_custkey",
            t(s, dir, "customer"), "c_custkey", "orders",
            "ord_orphan_custkey"))
          .unionByName(Audits.dupKeys(t(s, dir, "customer"), "c_custkey",
            "customer", "cust_dup_pk"))
          .unionByName(Audits.dupKeys(t(s, dir, "documents"), "doc_id",
            "documents", "doc_dup_pk"))
          .orderBy($"tbl", $"chk")
      },
      Some("""SELECT * FROM (
          SELECT 'lineitem' AS tbl, 'li_nonpositive_qty' AS chk,
            CAST(count(*) FILTER (l_quantity <= 0) AS BIGINT) AS n_bad,
            count(*) AS n_total,
            round(CAST(count(*) FILTER (l_quantity <= 0) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6) AS bad_frac
          FROM lineitem
          UNION ALL
          SELECT 'lineitem', 'li_negative_price',
            CAST(count(*) FILTER (l_extendedprice < 0) AS BIGINT), count(*),
            round(CAST(count(*) FILTER (l_extendedprice < 0) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6)
          FROM lineitem
          UNION ALL
          SELECT 'events', 'ev_null_user',
            CAST(count(*) FILTER (user_id IS NULL) AS BIGINT), count(*),
            round(CAST(count(*) FILTER (user_id IS NULL) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6)
          FROM events
          UNION ALL
          SELECT 'events', 'ev_negative_value',
            CAST(count(*) FILTER (value < 0) AS BIGINT), count(*),
            round(CAST(count(*) FILTER (value < 0) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6)
          FROM events
          UNION ALL
          SELECT 'lineitem', 'li_orphan_orderkey',
            CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT), count(*),
            round(CAST(count(*) FILTER (o_orderkey IS NULL) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6)
          FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
            ON l.l_orderkey = o.o_orderkey
          UNION ALL
          SELECT 'orders', 'ord_orphan_custkey',
            CAST(count(*) FILTER (c_custkey IS NULL) AS BIGINT), count(*),
            round(CAST(count(*) FILTER (c_custkey IS NULL) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6)
          FROM orders r LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
            ON r.o_custkey = c.c_custkey
          UNION ALL
          SELECT 'customer', 'cust_dup_pk',
            CAST(count(*) FILTER (cnt > 1) AS BIGINT), count(*),
            round(CAST(count(*) FILTER (cnt > 1) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6)
          FROM (SELECT c_custkey, count(*) AS cnt FROM customer GROUP BY 1)
          UNION ALL
          SELECT 'documents', 'doc_dup_pk',
            CAST(count(*) FILTER (cnt > 1) AS BIGINT), count(*),
            round(CAST(count(*) FILTER (cnt > 1) AS DOUBLE)
              / CAST(count(*) AS DOUBLE), 6)
          FROM (SELECT doc_id, count(*) AS cnt FROM documents GROUP BY 1))
        ORDER BY tbl, chk""")))
}
