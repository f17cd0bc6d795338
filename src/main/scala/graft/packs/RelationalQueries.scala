package graft.packs

import graft.QueryPack
import graft.core.Tables
import graft.operators.{Relational, Skew}
import org.apache.spark.sql.functions._

/** The relational spine (SURVEY §2.8): scan → filter → join → aggregate →
  * window → sort/limit → set ops → grouping sets. The reference never had
  * these as first-class operators (its joins were positional zips); they are
  * table stakes for the Spark-native engine and the backbone every other
  * pack builds on.
  */
object RelationalQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped scan+aggregate: partial/final hash agg, no join.
    "q1_agg" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q3-shaped 3-way join + top-k. Revenue is pre-aggregated by orderkey
    // BEFORE joining (the largest table shrinks from |lineitem| to
    // |orders| rows entering the join — the single biggest shuffle saver
    // at scale); mktsegment is functionally dependent on the order, so
    // the result is identical to grouping after the join.
    "q3_join_topk" -> ((s, dir) => {
      val t = Tables(s, dir)
      val revenue = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
      revenue
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Q5-shaped star join: dims are broadcast (supplier/nation/region are
    // tiny at every scale — the explicit hint keeps the plan stable even
    // when stats are missing).
    "q5_broadcast_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // TPC-H Q6 shape: the selective filter-and-sum whose entire WHERE
    // clause should reach the parquet scan as pushed predicates — the
    // pushdown headline query (PlanSpec pins PushedFilters on d8; this
    // is the classic revenue variant). No join, no shuffle beyond the
    // 1-row final aggregate.
    "q6_revenue_filter" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          (round(sum(col("l_extendedprice") * col("l_discount")), 2)
            + lit(0.0)).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Window top-k per group (distributed TakeOrdered per key).
    "window_topk_per_group" -> ((s, dir) => {
      val t = Tables(s, dir)
      Relational
        .topKPerGroup(
          t.orders.select(col("o_orderpriority"), col("o_orderkey"),
            col("o_totalprice")),
          Seq(col("o_orderpriority")),
          Seq(col("o_totalprice").desc, col("o_orderkey")),
          3)
        .orderBy(col("o_orderpriority"), col("rnk"))
    }),

    // Join-type breadth: semi (customers with orders), anti (without),
    // outer (key union) — counted so the result is compact and exact.
    "join_variants" -> ((s, dir) => {
      val t = Tables(s, dir)
      val c = t.customer.select(col("c_custkey"))
      val o = t.orders.select(col("o_custkey")).distinct()
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_semi"))
      val anti = t.customer.select(col("c_custkey"))
        .join(t.orders.select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_anti"))
      val full = t.customer.select(col("c_custkey"))
        .join(t.orders.select(col("o_custkey")).distinct(),
          col("c_custkey") === col("o_custkey"), "full_outer")
        .agg(count(lit(1)).as("n_full"))
      semi.crossJoin(anti).crossJoin(full)
    }),

    // Range join: per event, orders of the same customer within the
    // 7 days ENDING at the event (equi key + time-range predicate). The
    // scale plan is an equi-shuffle on the key with the range as a
    // post-join filter; unbounded-range joins would need bucketized time.
    "range_join_counts" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events.select(col("event_id"), col("user_id"), col("ts"))
        .join(t.orders.select(col("o_custkey"), col("o_orderdate")),
          col("o_custkey") === col("user_id") &&
            col("o_orderdate") <= col("ts") &&
            col("o_orderdate") >= col("ts") - expr("INTERVAL 7 DAYS"))
        .groupBy(col("event_id"))
        .agg(count(lit(1)).as("n_orders_7d"))
        .orderBy(col("event_id"))
    }),

    // Window FRAME spec: per-user moving average over the last 3 events
    // (rows frame — the one window feature the rest of the suite
    // didn't exercise).
    "window_moving_avg" -> ((s, dir) => {
      val t = Tables(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, 0)
      t.events
        .select(col("event_id"), col("user_id"), col("value"),
          round(avg(col("value")).over(w), 4).as("mov_avg3"))
        .orderBy(col("event_id"))
    }),

    // Correlated-subquery shape (TPC-H Q2/Q17 family): orders priced above
    // their own customer's average. Spark expresses it as a grouped
    // self-join; the oracle keeps the correlated form — same semantics,
    // independent algorithms.
    "above_avg_orders" -> ((s, dir) => {
      val t = Tables(s, dir)
      val custAvg = t.orders.groupBy(col("o_custkey").as("ck"))
        .agg(avg(col("o_totalprice")).as("cust_avg"))
      t.orders
        .join(custAvg, col("o_custkey") === col("ck"))
        .where(col("o_totalprice") > col("cust_avg"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_above"),
          round(avg(col("o_totalprice")), 4).as("avg_above"))
        .orderBy(col("o_orderpriority"))
    }),

    // Date arithmetic rollup (Q7 family): revenue by order year/month.
    "revenue_by_month" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"),
          month(col("o_orderdate")).as("o_month"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_year"), col("o_month"))
    }),

    // Set ops over nation keys: intersect + except (SURVEY §2.8 set ops).
    "setops_nations" -> ((s, dir) => {
      val t = Tables(s, dir)
      val c = t.customer.select(col("c_nationkey").cast("int").as("nationkey")).distinct()
      val sup = t.supplier.select(col("s_nationkey").cast("int").as("nationkey")).distinct()
      val both = c.intersect(sup).withColumn("side", lit("both"))
      val cOnly = c.except(sup).withColumn("side", lit("customer_only"))
      val sOnly = sup.except(c).withColumn("side", lit("supplier_only"))
      both.unionByName(cOnly).unionByName(sOnly)
        .orderBy(col("side"), col("nationkey"))
    }),

    // Exact distinct counts (the HLL scale path is benchmarked separately:
    // approx_count_distinct is not bit-stable across engines so the oracle
    // pins the exact form).
    "distinct_counts" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.agg(
        countDistinct(col("o_custkey")).as("n_custkeys"),
        countDistinct(col("o_orderstatus")).as("n_statuses"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))
    }),

    // Salted two-phase aggregation: the hot-key fan-in mitigation. The
    // oracle is the PLAIN aggregate — pinning that salting is a pure
    // execution-strategy change (associative/commutative merge).
    "skew_salted_agg" -> ((s, dir) => {
      Skew.saltedAggregate(
        Tables(s, dir).lineitem,
        keyCols = Seq("l_returnflag"),
        saltBuckets = 8,
        partials = Seq(
          "p_sum" -> sum(col("l_quantity")),
          "p_cnt" -> count(lit(1))),
        finals = Seq(
          "sum_qty" -> round(sum(col("p_sum")), 2),
          "n_rows" -> sum(col("p_cnt"))))
        .orderBy(col("l_returnflag"))
    }),

    // HLL scale path: approx_count_distinct is THE 100 TB cardinality
    // operator (fixed-size sketch vs. a shuffle of every distinct value).
    // Sketches aren't bit-portable across engines, so the oracle pins the
    // exact count plus the accuracy contract.
    "hll_distinct_counts" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.orders.agg(
        countDistinct(col("o_custkey")).as("n_exact"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("_n_approx"))
        .select(col("n_exact"),
          (abs(col("_n_approx") - col("n_exact")) / col("n_exact") <= 0.05)
            .cast("int").as("hll_within_5pct"))
    }),

    // Grouping sets: CUBE over documents (lang × source) — free in Spark,
    // absent in the reference (SURVEY §2.8 aggregations).
    "cube_docs" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .cube(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .select(
          coalesce(col("lang"), lit("*")).as("lang_g"),
          coalesce(col("source"), lit("*")).as("source_g"),
          col("n_docs"), col("sum_chars"))
        .orderBy(col("lang_g"), col("source_g"))
    }),

    // ROLLUP (hierarchical grouping sets — region > nation), completing
    // the grouping-sets family next to cube_docs.
    "rollup_region_nation" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
          round(sum(col("s_acctbal")), 2).as("sum_bal"))
        .select(coalesce(col("r_name"), lit("*")).as("region_g"),
          coalesce(col("n_name"), lit("*")).as("nation_g"),
          col("n_suppliers"), col("sum_bal"))
        .orderBy(col("region_g"), col("nation_g"))
    }),

    // Scalar-function breadth: string ops over part names (SURVEY §2.8
    // scalar functions — the tokenize/case/substr family as one query).
    "string_functions" -> ((s, dir) => {
      Tables(s, dir).part
        .select(col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          length(col("p_name")).cast("int").as("name_len"),
          substring(col("p_name"), 1, 5).as("name_pfx"),
          regexp_replace(col("p_type"), " ", "_").as("type_snake"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          (size(split(col("p_name"), " "))).cast("int").as("name_words"))
        .orderBy(col("p_partkey"))
    }),

    // As-of join events->orders (union+window single-shuffle plan; see
    // Relational.asofJoin scale notes). Inner semantics: events with no
    // prior order are dropped on both sides.
    "asof_join_events_orders" -> ((s, dir) => {
      val t = Tables(s, dir)
      Relational
        .asofJoin(
          t.events.select(col("event_id"), col("user_id"), col("ts")),
          t.orders.select(col("o_custkey"), col("o_orderdate"), col("o_orderkey")),
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightOrder = "o_orderkey", payloadAlias = "asof_orderkey")
        .where(col("asof_orderkey").isNotNull)
        .select(col("event_id"), col("asof_orderkey"))
        .orderBy(col("event_id"))
    }),

    // Sessionization (batch twin of streaming session_window).
    "sessionize_events" -> ((s, dir) => {
      val t = Tables(s, dir)
      Relational.sessionize(t.events, "user_id", "ts", "event_id", gapMinutes = 30)
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          date_trunc("second", min(col("ts"))).as("session_start"),
          round(sum(col("value")), 2).as("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // Tumbling-window aggregation, batch form (streaming twin in
    // graft.streaming). Spark's window() start == date_trunc('hour').
    "window_tumbling_events" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(
          date_trunc("second", col("window.start")).as("hour_start"),
          col("event_type"), col("n_events"), col("sum_value"))
        .orderBy(col("hour_start"), col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_topk" ->
      """SELECT o_orderkey, c_mktsegment,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey, c_mktsegment
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    // Both engines parse the 0.01-step discount literals to identical
    // doubles, so the BETWEEN boundaries compare exactly.
    "q6_revenue_filter" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) + 0.0 AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q5_broadcast_join" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "window_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3
        |ORDER BY o_orderpriority, rnk""".stripMargin,

    "join_variants" ->
      """WITH o AS (SELECT DISTINCT o_custkey FROM orders)
        |SELECT
        |  (SELECT count(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM o)) AS n_semi,
        |  (SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM o)) AS n_anti,
        |  (SELECT count(*) FROM customer FULL OUTER JOIN o ON c_custkey = o_custkey) AS n_full""".stripMargin,

    "range_join_counts" ->
      """SELECT e.event_id, count(*) AS n_orders_7d
        |FROM events e
        |JOIN orders o ON o.o_custkey = e.user_id
        |  AND o.o_orderdate <= e.ts
        |  AND o.o_orderdate >= e.ts - INTERVAL 7 DAY
        |GROUP BY e.event_id
        |ORDER BY e.event_id""".stripMargin,

    "window_moving_avg" ->
      """SELECT event_id, user_id, value,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
        |    AS mov_avg3
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "above_avg_orders" ->
      """SELECT o_orderpriority, count(*) AS n_above,
        |  round(avg(o_totalprice), 4) AS avg_above
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "revenue_by_month" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  CAST(month(o_orderdate) AS INT) AS o_month,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2
        |ORDER BY o_year, o_month""".stripMargin,

    "setops_nations" ->
      """WITH c AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer),
        |     s AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        |SELECT nationkey, side FROM (
        |  SELECT nationkey, 'both' AS side FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        |  UNION ALL
        |  SELECT nationkey, 'customer_only' AS side FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        |  UNION ALL
        |  SELECT nationkey, 'supplier_only' AS side FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
        |) u
        |ORDER BY side, nationkey""".stripMargin,

    "distinct_counts" ->
      """SELECT count(DISTINCT o_custkey) AS n_custkeys,
        |  count(DISTINCT o_orderstatus) AS n_statuses,
        |  count(DISTINCT o_orderpriority) AS n_priorities,
        |  count(*) AS n_orders
        |FROM orders""".stripMargin,

    "hll_distinct_counts" ->
      """SELECT count(DISTINCT o_custkey) AS n_exact, 1 AS hll_within_5pct
        |FROM orders""".stripMargin,

    "skew_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "cube_docs" ->
      """SELECT coalesce(lang, '*') AS lang_g, coalesce(source, '*') AS source_g,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |GROUP BY CUBE (lang, source)
        |ORDER BY lang_g, source_g""".stripMargin,

    "rollup_region_nation" ->
      """SELECT coalesce(r_name, '*') AS region_g,
        |  coalesce(n_name, '*') AS nation_g,
        |  count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS sum_bal
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY region_g, nation_g""".stripMargin,

    "string_functions" ->
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  substr(p_name, 1, 5) AS name_pfx,
        |  regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
        |  p_brand || '|' || p_type AS brand_type,
        |  CAST(len(string_split(p_name, ' ')) AS INT) AS name_words
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "asof_join_events_orders" ->
      """SELECT event_id, asof_orderkey FROM (
        |  SELECT e.event_id, o.o_orderkey AS asof_orderkey,
        |    row_number() OVER (PARTITION BY e.event_id
        |                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e
        |  JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |) t WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "sessionize_events" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sessions AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  date_trunc('second', min(ts)) AS session_start,
        |  round(sum(value), 2) AS session_value
        |FROM sessions
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "window_tumbling_events" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_start, event_type""".stripMargin
  )
}
