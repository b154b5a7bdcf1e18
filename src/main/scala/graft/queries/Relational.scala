package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational-operator coverage (SURVEY.md §2.6): scans, filters,
  * projections, broadcast + shuffle joins, aggregations, windows, set ops,
  * sort/limit/top-k, scalar functions — each with a DuckDB-checkable
  * oracle. Every output is fully ordered and every float is rounded so
  * the driver's hash compare is deterministic across engines.
  */
object Relational {

  // NO scan spread here (unlike the documents/embeddings readers): the
  // relational queries do only cheap expression work per row before their
  // first aggregation/join exchange, so hash-repartitioning the scan
  // shuffles the whole table to save near-zero map time — measured a
  // net regression (q01 0.24→0.43 s, q_events_windowed 0.29→0.53 s at
  // sf0.1). Spread pays only where the per-row map is expensive
  // (md5/shingling/page-build/vector math) — guide §1.2: the algorithm
  // decides, not a blanket knob.
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-H Q1 shape: filter → wide agg → sort (map-side partial agg; no
    // shuffle besides the 2-key groupBy)
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q3 shape: broadcast dim join + shuffle fact join + top-k.
    // customer is small → explicit broadcast; lineitem⋈orders shuffles.
    "q03_topk_revenue" -> ((s, dir) => {
      val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders").where(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val li = t(s, dir, "lineitem").where(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way join (broadcast chain for dims) + group agg
    "q05_region_revenue" -> ((s, dir) => {
      val region = t(s, dir, "region").where(col("r_name") === "EUROPE")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val ord = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey") &&
          sup("s_nationkey") === cust("c_nationkey"))
        .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // window: top-3 parts per brand by price (rank + filter)
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      t(s, dir, "part")
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("p_brand"), col("rnk"), col("p_partkey"),
          round(col("p_retailprice"), 2).as("price"))
        .orderBy(col("p_brand"), col("rnk"))
    }),

    // window: running revenue per supplier over ship time
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .where(col("l_suppkey") <= 5)
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(col("running_qty"), 2).as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // set ops: customers active in 1995 but not 1996 (EXCEPT = distinct)
    "q_setops_active" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val y95 = ord.where(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
      val y96 = ord.where(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
      y95.except(y96).orderBy(col("o_custkey"))
    }),

    // semi + anti joins: customers active in 1997 with no 1998 orders
    "q_semi_anti" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      val y97 = ord.where(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
      val y98 = ord.where(year(col("o_orderdate")) === 1998).select(col("o_custkey"))
      cust.join(y97, cust("c_custkey") === y97("o_custkey"), "left_semi")
        .join(y98, col("c_custkey") === y98("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // sort + limit with full tiebreak
    "q_orders_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("total"), col("o_orderpriority"))
        .orderBy(col("total").desc, col("o_orderkey"))
        .limit(25)
    }),

    // aggregation with distinct + min/max
    "q_agg_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"),
          round(min(col("o_totalprice")), 2).as("min_price"),
          round(max(col("o_totalprice")), 2).as("max_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // hierarchical aggregation: ROLLUP with subtotals + grand total
    "q_rollup_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // CUBE: all 4 grouping combinations in one pass (rollup's superset)
    "q_cube_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // GROUPING SETS: an explicit non-hierarchical combination rollup/cube
    // can't express — (flag, status) detail plus status-only totals plus
    // the grand total, one pass (SQL surface; the Dataset API only exposes
    // the rollup/cube specializations)
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  round(sum(l_extendedprice), 2) AS rev, count(*) AS n
          |FROM gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // RANGE window frame: per-customer running revenue over a VALUE range
    // (orders in the preceding 30 days incl. current — a range frame is
    // value-bounded, unlike the row-bounded frames elsewhere)
    "q_range_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"))
        .rangeBetween(-30L, 0L)
      t(s, dir, "orders")
        .withColumn("day", datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long"))
        .select(col("o_orderkey"), col("o_custkey"), col("day"),
          round(sum(col("o_totalprice")).over(w), 2).as("rev_30d"),
          count(lit(1)).over(w).as("n_30d"))
        .orderBy(col("o_orderkey"))
    }),

    // rank-family windows: ntile quartiles + percent_rank over order value
    "q_ntile" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"))
        .orderBy(col("o_orderkey"))
    }),

    // pivot-style conditional aggregation (portable FILTER/CASE form)
    "q_pivot_status" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"),
          round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("rev_f"))
        .orderBy(col("o_orderpriority"))
    }),

    // HLL sketch surface — engine-specific values, so no SQL oracle;
    // QueriesSpec bounds the relative error against the exact count
    "q_approx_distinct" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_custs"))
        .orderBy(col("o_orderpriority"))
    }),

    // scalar-function surface: string/date/hash functions, identical
    // semantics in DuckDB (md5, substr, concat_ws, year/month/day, regexp)
    "q_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .where(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          upper(substring(col("o_orderpriority"), 1, 1)).as("prio1"),
          length(col("o_orderpriority")).as("prio_len"),
          concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
          md5(col("o_orderstatus")).as("status_md5"),
          // decimal-exact on BOTH sides: round(double*0.1, 2) diverges
          // between engines at .xx5 boundaries (Spark rounds the shortest
          // decimal repr of the product, DuckDB rounds via float multiply).
          // NB the SQL literal 0.1 is DECIMAL(1,1); a Scala 0.1 would be a
          // Double and silently demote the whole expression to float math
          expr("cast(round(cast(o_totalprice as decimal(18,4)) * 0.1, 2) as double)")
            .as("tithe"))
        .orderBy(col("o_orderkey"))
    }),

    // event sessionization: lag-gap > 30 min starts a new session
    "q_events_sessions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("ms", unix_millis(col("ts").cast("timestamp"))) // ts is NTZ; session TZ is UTC
        .withColumn("prev_ms", lag(col("ms"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ms").isNull ||
            col("ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // AS-OF join: attach to every event the timestamp of the user's most
    // recent prior (or same-instant) 'signup'. Realized as a running max
    // over an ordered window — one shuffle on user_id, no range-join
    // blowup, the shape that survives 10^12 rows (a naive range join is
    // O(events × signups) per user).
    "q_asof_signup" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("ms", unix_millis(col("ts").cast("timestamp")))
        .withColumn("asof_signup_ms",
          max(when(col("event_type") === "signup", col("ms"))).over(w))
        .where(col("event_id") % 20 === 0) // sample output rows
        .select(col("event_id"), col("user_id"), col("ms"), col("asof_signup_ms"))
        .orderBy(col("event_id"))
    }),

    // tumbling-window agg (batch form; StreamingSpec proves the identical
    // readStream → window → agg produces the same result)
    // exact interpolated percentiles (distribution stats a data pipeline
    // reports per cohort). percentile() is the exact sort-based form —
    // the oracle-checkable baseline; approx_percentile is the sketch
    // variant at 10^12 rows (same call shape, bounded error).
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_extendedprice, 0.5)"), 2).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 2).as("p99"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    "q_events_windowed" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("w.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("wstart"), col("event_type"))
        .limit(500)
    }))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |  round(avg(l_quantity),2) AS avg_qty,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,

    "q03_topk_revenue" ->
      """SELECT l_orderkey, o_orderdate,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        |GROUP BY 1,2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q05_region_revenue" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q_window_topk" ->
      """SELECT p_brand, rnk, p_partkey, price FROM (
        |  SELECT p_brand, p_partkey, round(p_retailprice,2) AS price,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rnk
        |  FROM part) WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,

    "q_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_setops_active" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996
        |ORDER BY o_custkey""".stripMargin,

    "q_semi_anti" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1997)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998)
        |ORDER BY c_custkey""".stripMargin,

    "q_orders_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS total,
        |  o_orderpriority
        |FROM orders ORDER BY total DESC, o_orderkey LIMIT 25""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders, round(min(o_totalprice),2) AS min_price,
        |  round(max(o_totalprice),2) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rollup_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice),2) AS rev, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_cube_revenue" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice),2) AS rev, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice),2) AS rev, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_range_window" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, CAST(day AS BIGINT) AS day,
        |  round(sum(o_totalprice) OVER w, 2) AS rev_30d,
        |  count(*) OVER w AS n_30d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_pivot_status" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |  round(sum(CASE WHEN o_orderstatus='F' THEN o_totalprice ELSE 0 END),2) AS rev_f
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS d,
        |  upper(substr(o_orderpriority,1,1)) AS prio1,
        |  length(o_orderpriority) AS prio_len,
        |  concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio,
        |  md5(o_orderstatus) AS status_md5,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(18,4))*0.1, 2) AS DOUBLE) AS tithe
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.9), 2) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 2) AS p99,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_events_sessions" ->
      """WITH g AS (
        |  SELECT user_id,
        |    CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) IS NULL
        |      OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) > 1800000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events)
        |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_asof_signup" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ms,
        |  max(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS asof_signup_ms
        |FROM events QUALIFY event_id % 20 = 0
        |ORDER BY event_id""".stripMargin,

    "q_events_windowed" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS wstart, event_type,
        |  count(*) AS n, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2 LIMIT 500""".stripMargin)
}
