package graft.operators

import graft.{QueryDef, Sql, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational / SQL surface (SURVEY.md §2.2): one named query per operator
  * category, each with the ANSI SQL its DuckDB oracle runs.
  *
  * Cross-engine rules applied throughout (see also [[graft.Sql]]):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregation goes through exact DECIMAL(12,2) arithmetic, so
  *    results are independent of partitioning/accumulation order — the same
  *    property that makes them reproducible on a 1000-executor cluster;
  *  - ORDER BY on a deterministic unique key everywhere, with NULLS FIRST
  *    spelled explicitly in the oracle (Spark's ascending default);
  *  - derived integer columns are cast to BIGINT (DuckDB's natural width);
  *  - timestamps leave the query as formatted strings (engines differ in
  *    sub-second physical precision).
  *
  * Scale notes per query are inline. The dimension tables (region, nation,
  * supplier, part, customer at these SFs) ride broadcast joins — lineitem,
  * the 100 TB fact at scale, is never shuffled for them.
  */
object Relational {

  private val ONE = lit(1)

  /** The event-type channels q168's unrolled DuckDB oracle enumerates one
    * removed-channel sweep chain for. Single source of truth: the Spark
    * side `require`s that the channels it observes in the data equal this
    * list, so a fixture drift fails with a readable message instead of a
    * silent oracle hash mismatch.
    */
  private val Q168_CHANNELS = Seq("click", "error", "signup", "view")

  def defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------------
    // Aggregation: groupBy + exact decimal sums/avgs (TPC-H Q1 shape).
    // Scale: partial aggregation map-side reduces 100 TB to |groups| rows
    // per partition before the single shuffle; filter is pushed to parquet.
    QueryDef("q01_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1999-12-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Sql.dsum(col("l_quantity")).as("sum_qty"),
          Sql.dsum(col("l_extendedprice")).as("sum_base_price"),
          Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")).as("sum_disc_price"),
          Sql.dsumProd3(col("l_extendedprice"), ONE - col("l_discount"), ONE + col("l_tax")).as("sum_charge"),
          Sql.davg(col("l_quantity")).as("avg_qty"),
          Sql.davg(col("l_discount")).as("avg_disc"),
          count(ONE).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${Sql.oDsum("l_quantity")} AS sum_qty,
               ${Sql.oDsum("l_extendedprice")} AS sum_base_price,
               ${Sql.oDsumProd("l_extendedprice", "1 - l_discount")} AS sum_disc_price,
               ${Sql.oDsumProd3("l_extendedprice", "1 - l_discount", "1 + l_tax")} AS sum_charge,
               ${Sql.oDavg("l_quantity")} AS avg_qty,
               ${Sql.oDavg("l_discount")} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // -------------------------------------------------------------------
    // Scan + filter + project: predicates and the projection reach the
    // parquet scan (PushedFilters / ReadSchema — asserted in PlanSpec).
    QueryDef("q02_filter_project",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_discount") >= 0.05 && col("l_quantity") < 25)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice").cast("decimal(12,2)") *
            (ONE - col("l_discount")).cast("decimal(12,2)")).cast("double").as("net_price"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2)) AS DOUBLE) AS net_price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_quantity < 25
        ORDER BY l_orderkey, l_linenumber""")),

    // -------------------------------------------------------------------
    // Join chain with broadcast dims: the 100 TB fact joins region/nation/
    // customer without shuffling itself (broadcast-hash all the way).
    QueryDef("q03_revenue_by_nation",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")).as("revenue"),
            countDistinct(col("c_custkey")).as("n_customers"),
            count(ONE).as("n_lineitems"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""
        SELECT r_name, n_name,
               ${Sql.oDsumProd("l_extendedprice", "1 - l_discount")} AS revenue,
               count(DISTINCT c_custkey) AS n_customers,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // -------------------------------------------------------------------
    // Top-k: orderBy+limit plans as TakeOrderedAndProject — per-partition
    // top-k then a k-row merge on the driver; no global sort at any scale.
    QueryDef("q04_top_orders",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")).as("revenue"))
        rev.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_name"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""
        SELECT o_orderkey, c_name, revenue, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        FROM (SELECT l_orderkey, ${Sql.oDsumProd("l_extendedprice", "1 - l_discount")} AS revenue
              FROM lineitem GROUP BY l_orderkey) r
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10""")),

    // -------------------------------------------------------------------
    // Semi/anti joins (EXISTS / NOT EXISTS).
    QueryDef("q05_semi_anti",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(ONE).as("n_with_orders"))
        val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment").agg(count(ONE).as("n_without_orders"))
        withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
          .select(col("c_mktsegment"),
            coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
            coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment,
               count(CASE WHEN has_o THEN 1 END) AS n_with_orders,
               count(CASE WHEN NOT has_o THEN 1 END) AS n_without_orders
        FROM (SELECT c_mktsegment,
                     EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
              FROM customer) t
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // -------------------------------------------------------------------
    // Window functions: row_number / rank / lag / running sum. The running
    // sum goes through decimal so the result is frame-order exact in both
    // engines. Partition by user_id — at scale, one shuffle by user.
    QueryDef("q06_window_funcs",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val byValue = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
            row_number().over(w).as("rn"),
            lag(col("value"), 1).over(w).as("prev_value"),
            sum(col("value").cast("decimal(12,2)")).over(running).cast("double").as("running_value"),
            rank().over(byValue).as("value_rank"))
          .orderBy("user_id", "rn")
      },
      Some("""
        SELECT user_id, event_id, event_type, value,
               CAST(row_number() OVER w AS INT) AS rn,
               lag(value, 1) OVER w AS prev_value,
               CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value,
               CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INT) AS value_rank
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY user_id, rn""")),

    // -------------------------------------------------------------------
    // ROLLUP with explicit grouping flags; NULLS FIRST pinned in the oracle.
    // Expressed via spark.sql: the DataFrame `rollup` + `grouping()` combo
    // trips Spark's ambiguous-self-join detection (SPARK analyzer limitation);
    // the SQL route builds the identical Catalyst Aggregate(Rollup) plan.
    QueryDef("q07_rollup",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("g_customer")
        Tables.nation(s, d).createOrReplaceTempView("g_nation")
        Tables.region(s, d).createOrReplaceTempView("g_region")
        s.sql(s"""
          SELECT r_name, n_name, count(*) AS n_customers,
                 ${Sql.oDsum("c_acctbal")} AS sum_acctbal,
                 CAST(GROUPING(r_name) AS INT) AS g_region,
                 CAST(GROUPING(n_name) AS INT) AS g_nation
          FROM g_customer
          JOIN g_nation ON c_nationkey = n_nationkey
          JOIN g_region ON n_regionkey = r_regionkey
          GROUP BY ROLLUP(r_name, n_name)
          ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")
      },
      Some(s"""
        SELECT r_name, n_name, count(*) AS n_customers,
               ${Sql.oDsum("c_acctbal")} AS sum_acctbal,
               CAST(GROUPING(r_name) AS INT) AS g_region,
               CAST(GROUPING(n_name) AS INT) AS g_nation
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")),

    // -------------------------------------------------------------------
    // CUBE over orders.
    QueryDef("q08_cube",
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(ONE).as("n_orders"), Sql.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
      Some(s"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               ${Sql.oDsum("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // -------------------------------------------------------------------
    // Set operations (distinct semantics on both sides).
    QueryDef("q09_setops",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
        c.union(sup).distinct().withColumn("op", lit("union"))
          .unionAll(c.intersect(sup).withColumn("op", lit("intersect")))
          .unionAll(c.except(sup).withColumn("op", lit("except")))
          .select("op", "nationkey")
          .orderBy("op", "nationkey")
      },
      Some("""
        SELECT 'union' AS op, nationkey
        FROM (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
        UNION ALL
        SELECT 'intersect' AS op, nationkey
        FROM (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier) t2(nationkey)
        UNION ALL
        SELECT 'except' AS op, nationkey
        FROM (SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier) t3(nationkey)
        ORDER BY op, nationkey""")),

    // -------------------------------------------------------------------
    // String scalar functions over documents.
    QueryDef("q10_string_funcs",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("len_text"),
          lower(substring(col("text"), 1, 20)).as("head_lower"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          regexp_extract(col("text"), "^(\\w+)", 1).as("first_word"),
          concat(col("lang"), lit(":"), col("source")).as("lang_source"),
          upper(col("source")).as("source_upper"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id, lang,
               length(text) AS len_text,
               lower(substr(text, 1, 20)) AS head_lower,
               len(string_split(text, ' ')) AS n_tokens,
               regexp_extract(text, '^(\w+)', 1) AS first_word,
               lang || ':' || source AS lang_source,
               upper(source) AS source_upper
        FROM documents
        ORDER BY doc_id""")),

    // -------------------------------------------------------------------
    // Date/time functions over orders.
    QueryDef("q11_datetime",
      (s, d) => Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
        .agg(count(ONE).as("n_orders"), Sql.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_year", "o_month"),
      Some(s"""
        SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               count(*) AS n_orders,
               ${Sql.oDsum("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY 1, 2, 3
        ORDER BY o_year, o_month""")),

    // -------------------------------------------------------------------
    // Array functions: explode/split + aggregation (word frequencies).
    QueryDef("q12_token_freq",
      (s, d) => Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(ONE).as("cnt"))
        .orderBy(col("cnt").desc, col("token")),
      Some("""
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
        GROUP BY token
        ORDER BY cnt DESC, token""")),

    // -------------------------------------------------------------------
    // JSON extraction from events.props.
    QueryDef("q13_json",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(ONE).as("n"), sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          (sum(col("k")).cast("double") / count(ONE)).as("avg_k"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k, max(k) AS max_k,
               CAST(sum(k) AS DOUBLE) / count(*) AS avg_k
        FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events) t
        GROUP BY event_type
        ORDER BY event_type""")),

    // -------------------------------------------------------------------
    // Distinct aggregation (exact; the approx variant is a separate
    // rows-only query since HLL internals are engine-specific).
    QueryDef("q14_distinct_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(ONE).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_suppliers,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_orderkey) AS n_orders,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // approx_count_distinct: HLL++ sketch internals are engine-specific,
    // but the sketch's CONTRACT is oracle-checkable: emit the exact
    // distinct counts plus a 3-sigma in-bounds boolean (rsd = 0.02), both
    // DuckDB-computable — the hash compare pins the exact values and the
    // error bound instead of HLL internals.
    QueryDef("q15_approx_distinct",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("ao"))
        .select(col("l_returnflag"), col("n_parts"), col("n_orders"),
          col("ap").between(col("n_parts") * 0.94, col("n_parts") * 1.06)
            .as("parts_in_bounds"),
          col("ao").between(col("n_orders") * 0.94, col("n_orders") * 1.06)
            .as("orders_in_bounds"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_orderkey) AS n_orders,
               TRUE AS parts_in_bounds,
               TRUE AS orders_in_bounds
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // -------------------------------------------------------------------
    // Range (theta) join: events within a trailing 5-minute window of each
    // error event by the same user. Equi part (user_id) keys the shuffle;
    // the range predicate filters inside each hash bucket — scales as a
    // normal shuffled hash join, not a cross join.
    QueryDef("q16_range_join",
      // the join itself is Streams.errorContextJoin — ONE definition of
      // the (user equi + 5-minute range) predicate serves q16, st06 and
      // the watermarked stream-stream form, so the three can never
      // silently diverge
      (s, d) => graft.streaming.Streams.errorContextJoin(Tables.events(s, d))
        .groupBy("err_id")
        .agg(count(ONE).as("n_preceding"))
        .orderBy("err_id"),
      Some("""
        SELECT e1.event_id AS err_id, count(*) AS n_preceding
        FROM events e1 JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts >= e1.ts - INTERVAL 5 MINUTE
         AND e2.ts < e1.ts
        WHERE e1.event_type = 'error'
        GROUP BY e1.event_id
        ORDER BY err_id""")),

    // -------------------------------------------------------------------
    // Exact interpolated percentiles (Spark `percentile` == DuckDB
    // `quantile_cont`: sorted, idx = p*(n-1), linear interpolation).
    // Rounded to 6 decimals to absorb interpolation-expression ulps.
    // Scale: exact percentile needs a per-group sort — at 100 TB swap in
    // approx_percentile (t-digest) and drop the oracle to tolerance.
    QueryDef("q17_percentiles",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
               round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
               round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // -------------------------------------------------------------------
    // Pivot (groupBy().pivot() with an explicit value list — at scale the
    // explicit list avoids the extra distinct-values job). Oracle is the
    // ANSI conditional-aggregation equivalent.
    QueryDef("q18_pivot",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(Sql.dsum(col("l_quantity")))
        .select(col("l_linestatus"),
          coalesce(col("A"), lit(0.0)).as("qty_a"),
          coalesce(col("N"), lit(0.0)).as("qty_n"),
          coalesce(col("R"), lit(0.0)).as("qty_r"))
        .orderBy("l_linestatus"),
      Some(s"""
        SELECT l_linestatus,
               coalesce(CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS qty_a,
               coalesce(CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS qty_n,
               coalesce(CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE), 0.0) AS qty_r
        FROM lineitem
        GROUP BY l_linestatus
        ORDER BY l_linestatus""")),

    // -------------------------------------------------------------------
    // As-of join (backward, inclusive): each error event matched to the
    // most recent purchase by the same user with p_ts <= err_ts. Spark
    // lacks a native ASOF operator; the scalable composition is the
    // union-and-running-last trick: tag both streams, ONE shuffle by
    // user, one window pass — no range self-join blowup, state bounded
    // by the window frame. Deterministic tie-breaks: (us, kind, id).
    QueryDef("q20_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "error"))
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            when(col("event_type") === "purchase", 0).otherwise(1).as("kind"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us"), col("kind"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev
          .withColumn("purchase_id",
            last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
          .withColumn("purchase_us",
            last(when(col("kind") === 0, col("us")), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("user_id"), col("event_id").as("err_id"),
            col("purchase_id"),
            ((col("us") - col("purchase_us")) / 1000000.0).as("gap_s"))
          .orderBy("user_id", "err_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind
          FROM events
          WHERE event_type IN ('purchase', 'error')),
        wl AS (
          SELECT user_id, event_id, us, kind,
                 last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY us, kind, event_id ROWS UNBOUNDED PRECEDING) AS purchase_id,
                 last_value(CASE WHEN kind = 0 THEN us END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY us, kind, event_id ROWS UNBOUNDED PRECEDING) AS purchase_us
          FROM ev)
        SELECT user_id, event_id AS err_id, purchase_id,
               (us - purchase_us) / 1000000.0 AS gap_s
        FROM wl WHERE kind = 1
        ORDER BY user_id, err_id""")),

    // -------------------------------------------------------------------
    // GROUPING SETS with an arbitrary (non-rollup/cube) set list.
    QueryDef("q21_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("g_orders")
        s.sql(s"""
          SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
                 ${Sql.oDsum("o_totalprice")} AS sum_price
          FROM g_orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
      },
      Some(s"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               ${Sql.oDsum("o_totalprice")} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // -------------------------------------------------------------------
    // Correlated scalar subqueries (decorrelated by Catalyst into
    // left-outer aggregated joins — no per-row re-execution at scale).
    QueryDef("q22_correlated_subquery",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("g_customer")
        Tables.orders(s, d).createOrReplaceTempView("g_orders2")
        s.sql("""
          SELECT c_custkey,
                 (SELECT count(*) FROM g_orders2 WHERE o_custkey = c_custkey) AS n_orders,
                 (SELECT CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                    FROM g_orders2 WHERE o_custkey = c_custkey) AS max_price
          FROM g_customer
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
               (SELECT CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                  FROM orders WHERE o_custkey = c_custkey) AS max_price
        FROM customer
        ORDER BY c_custkey""")),

    // -------------------------------------------------------------------
    // Deterministic stratified sampling: hash-mod instead of rand(), so
    // the sample is REPRODUCIBLE across runs, engines and cluster sizes
    // — the property a training-data pipeline needs for ablations. ~10%
    // of lineitem keyed on (orderkey, linenumber).
    QueryDef("q23_hash_sample",
      (s, d) => Tables.lineitem(s, d)
        .filter(expr(s"${graft.operators.Ns.hash60("concat(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING))")} % 100 < 10"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_sampled"),
          Sql.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag"),
      Some(s"""
        SELECT l_returnflag, count(*) AS n_sampled,
               ${Sql.oDsum("l_quantity")} AS sum_qty
        FROM lineitem
        WHERE ${graft.operators.Ns.oHash60("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")} % 100 < 10
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // approx_percentile: sketch internals are engine-specific, but the
    // rank-error contract is oracle-checkable — emit the exact
    // percentiles plus a boolean that the sketch value lands inside the
    // [p-0.05, p+0.05] exact-rank window (accuracy=1000 guarantees rank
    // error <= 0.001, so the window is 50x slack and partitioning-
    // invariant). Both sides DuckDB-computable -> green hash row.
    QueryDef("q24_approx_percentile",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_qty_exact"),
          round(expr("percentile(l_extendedprice, 0.95)"), 6).as("p95_price_exact"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("ap95"),
          expr("percentile(l_quantity, 0.45)").as("lo50"),
          expr("percentile(l_quantity, 0.55)").as("hi50"),
          expr("percentile(l_extendedprice, 0.93)").as("lo95"),
          expr("percentile(l_extendedprice, 0.97)").as("hi95"))
        .select(col("l_returnflag"), col("p50_qty_exact"), col("p95_price_exact"),
          col("ap50").between(col("lo50"), col("hi50")).as("p50_in_bounds"),
          col("ap95").between(col("lo95"), col("hi95")).as("p95_in_bounds"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 6) AS p50_qty_exact,
               round(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price_exact,
               TRUE AS p50_in_bounds,
               TRUE AS p95_in_bounds
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // -------------------------------------------------------------------
    // Z-order clustering key: the multi-dimensional layout primitive of
    // lakehouse table maintenance (Delta OPTIMIZE ZORDER, Iceberg
    // sort-order). Interleaving the bits of two sort keys gives one
    // linear key whose ranges are small rectangles in (x, y) space — a
    // write clustered by it (repartitionByRange(zval) + local sort)
    // lets min/max file stats prune scans on EITHER dimension. The
    // query computes the 32-bit z-value per order as a pure integer
    // fold (narrow, codegen-fused, zero shuffle until the final stats
    // groupBy) and reports per-bucket key ranges — the locality
    // evidence: each of the 64 coarse z-buckets covers only a 1/8
    // slice of each dimension.
    QueryDef("q25_zorder",
      (s, d) => Tables.orders(s, d)
        .select(
          pmod(col("o_custkey"), lit(65536L)).as("x"),
          pmod(expr("CAST(floor(o_totalprice) AS BIGINT)"), lit(65536L)).as("y"))
        .withColumn("zval", expr(
          """aggregate(sequence(0, 15), CAST(0 AS BIGINT),
             (acc, b) -> acc + shiftleft(shiftright(x, b) % 2, 2*b)
                             + shiftleft(shiftright(y, b) % 2, 2*b + 1))"""))
        .groupBy(expr("shiftright(zval, 26)").as("zbucket"))
        .agg(count(ONE).as("n_orders"),
          min(col("zval")).as("min_z"), max(col("zval")).as("max_z"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy("zbucket"),
      Some("""
        WITH z AS (
          SELECT o_custkey % 65536 AS x,
                 CAST(floor(o_totalprice) AS BIGINT) % 65536 AS y
          FROM orders),
        zz AS (
          SELECT x, y,
                 CAST(list_sum(list_transform(generate_series(0, 15),
                      b -> (((x >> b) & 1) << (2*b)) + (((y >> b) & 1) << (2*b + 1)))) AS BIGINT) AS zval
          FROM z)
        SELECT zval >> 26 AS zbucket, count(*) AS n_orders,
               min(zval) AS min_z, max(zval) AS max_z,
               min(x) AS min_x, max(x) AS max_x,
               min(y) AS min_y, max(y) AS max_y
        FROM zz
        GROUP BY zbucket
        ORDER BY zbucket""")),

    // -------------------------------------------------------------------
    // SCD2 (slowly-changing-dimension type 2) build: collapse an event
    // stream into versioned dimension rows with [valid_from, valid_to)
    // intervals and a current flag — the warehouse merge primitive.
    // Change detection and interval stitching are two window passes
    // over the same (user_id | us, event_id) ordering, so Spark plans
    // ONE shuffle + sort reused by both; at 100 TB that is a single
    // hash-partition by the dimension key. Timestamps leave as epoch
    // micros (the engines' shared physical precision).
    QueryDef("q26_scd2",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .filter(pmod(col("user_id"), lit(50)) === 7)
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("version", row_number().over(w).cast("int"))
          .withColumn("valid_to_us", lead(col("us"), 1).over(w))
          .select(col("user_id"), col("version"), col("event_type"),
            col("us").as("valid_from_us"), col("valid_to_us"),
            col("valid_to_us").isNull.as("is_current"))
          .orderBy("user_id", "version")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us
          FROM events WHERE user_id % 50 = 7),
        ch AS (
          SELECT user_id, event_id, event_type, us FROM (
            SELECT user_id, event_id, event_type, us,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
            FROM e)
          WHERE prev IS NULL OR prev <> event_type)
        SELECT user_id, CAST(row_number() OVER w AS INT) AS version, event_type,
               us AS valid_from_us,
               lead(us) OVER w AS valid_to_us,
               lead(us) OVER w IS NULL AS is_current
        FROM ch
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ORDER BY user_id, version""")),

    // -------------------------------------------------------------------
    // CDC upsert (MERGE INTO semantics): apply a changeset to a snapshot
    // — update on match, insert on no-match, delete on tombstone. Base =
    // latest event per user up to T0; changes = window (T0, T1]; an
    // 'error' change is the tombstone. The apply is ONE full-outer join
    // on the merge key (hash-partitioned both sides, the exact shape of
    // Delta/Iceberg MERGE at scale); latest-per-key on each side is a
    // window max, not a global sort. All comparisons are on epoch-micro
    // bigints.
    QueryDef("q27_cdc_upsert",
      (s, d) => {
        val t0 = 1705708800000000L // 2024-01-20T00:00:00Z
        val w = Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
            unix_micros(col("ts")).as("us"))
        def latest(side: org.apache.spark.sql.DataFrame, p: String) = side
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as(s"${p}_type"), col("value").as(s"${p}_value"))
        val base = latest(ev.filter(col("us") <= t0), "b")
        val chg = latest(ev.filter(col("us") > t0), "c")
        base.join(chg, Seq("user_id"), "full_outer")
          .filter(col("c_type").isNull || col("c_type") =!= "error")
          .select(col("user_id"),
            coalesce(col("c_type"), col("b_type")).as("event_type"),
            coalesce(col("c_value"), col("b_value")).as("value"),
            when(col("c_type").isNotNull, lit("upsert")).otherwise(lit("base")).as("src"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, value, epoch_us(ts) AS us FROM events),
        base AS (
          SELECT user_id, event_type AS b_type, value AS b_value FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
            FROM e WHERE us <= 1705708800000000) WHERE rn = 1),
        chg AS (
          SELECT user_id, event_type AS c_type, value AS c_value FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
            FROM e WHERE us > 1705708800000000) WHERE rn = 1)
        SELECT user_id,
               coalesce(c_type, b_type) AS event_type,
               coalesce(c_value, b_value) AS value,
               CASE WHEN c_type IS NOT NULL THEN 'upsert' ELSE 'base' END AS src
        FROM base FULL OUTER JOIN chg USING (user_id)
        WHERE c_type IS NULL OR c_type <> 'error'
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Equi-width histogram: 20 buckets of 25 over events.value, per
    // event type — one partial-aggregated groupBy on exact integer
    // bucket ids (the ANALYZE/statistics-collection shape).
    QueryDef("q28_histogram",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          least(expr("CAST(floor(value / 25) AS BIGINT)"), lit(19L)).as("bucket"),
          col("value"))
        .groupBy("event_type", "bucket")
        .agg(count(ONE).as("n"), min(col("value")).as("min_v"), max(col("value")).as("max_v"))
        .orderBy("event_type", "bucket"),
      Some("""
        SELECT event_type,
               least(CAST(floor(value / 25) AS BIGINT), 19) AS bucket,
               count(*) AS n, min(value) AS min_v, max(value) AS max_v
        FROM events
        GROUP BY event_type, least(CAST(floor(value / 25) AS BIGINT), 19)
        ORDER BY event_type, bucket""")),

    // -------------------------------------------------------------------
    // Z-score outlier detection: per-group mean/std from EXACT decimal
    // sums (sum and sum-of-squares), then a broadcast join of the tiny
    // stats table back onto the stream to count |v - mean| > 3*std. The
    // mean/std doubles are produced by identical expression trees in
    // both engines, so the outlier comparison is bit-deterministic; at
    // scale this is two passes over the facts with only 5 stat rows
    // shuffled.
    QueryDef("q29_zscore_outliers",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"), col("value"))
        val stats = ev.groupBy("event_type")
          .agg(count(ONE).as("n"),
            sum(col("value").cast("decimal(18,2)")).as("dsum"),
            sum(expr("CAST(value * value AS DECIMAL(28,8))")).as("dsumsq"))
          .select(col("event_type"), col("n"),
            expr("CAST(dsum AS DOUBLE) / n").as("mean"),
            expr("sqrt(CAST(dsumsq AS DOUBLE) / n - (CAST(dsum AS DOUBLE) / n) * (CAST(dsum AS DOUBLE) / n))").as("std"))
        val outs = ev.join(broadcast(stats), "event_type")
          .filter(abs(col("value") - col("mean")) > lit(3.0) * col("std"))
          .groupBy("event_type").agg(count(ONE).as("n_out"))
        stats.join(outs, Seq("event_type"), "left")
          .select(col("event_type"), col("n"),
            round(col("mean"), 6).as("mean"), round(col("std"), 6).as("std"),
            coalesce(col("n_out"), lit(0L)).as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""
        WITH stats AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
                 sqrt(CAST(sum(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) / count(*)
                      - (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                        * (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))) AS std
          FROM events GROUP BY event_type),
        outs AS (
          SELECT e.event_type, count(*) AS n_out
          FROM events e JOIN stats s ON e.event_type = s.event_type
          WHERE abs(e.value - s.mean) > CAST(3 AS DOUBLE) * s.std
          GROUP BY e.event_type)
        SELECT s.event_type, s.n, round(s.mean, 6) AS mean, round(s.std, 6) AS std,
               coalesce(o.n_out, 0) AS n_outliers
        FROM stats s LEFT JOIN outs o ON s.event_type = o.event_type
        ORDER BY s.event_type""")),

    // -------------------------------------------------------------------
    // Data profiling (ANALYZE-table shape): per-column exact distinct
    // counts and min/max rendered to engine-identical strings (bigints
    // verbatim, doubles via DECIMAL(18,2), timestamps as epoch micros).
    // Each column gets its own narrow pass — a column-pruned parquet
    // scan feeding a two-phase hash distinct (map-side combine shrinks
    // each partition to its distinct values before the shuffle), then a
    // scalar agg over the distinct set (count == n_distinct; min/max
    // over distinct values == min/max over all values). Six one-column
    // scans beat one all-column scan amplified ×7 by the Expand that a
    // multi-countDistinct agg plans: at 100 TB the Expand shape
    // materializes 7 copies of every row before the partial agg, while
    // this shape reads each column's pages once and shuffles only
    // distinct values. n_rows is one metadata-served count(*) broadcast
    // onto the 6-row result.
    QueryDef("q30_profile",
      (s, d) => {
        val orders = Tables.orders(s, d)
        // render: how to turn min(v)/max(v) into the cross-engine string form
        def prof(c: String, render: String => String) =
          // NULL is filtered BEFORE the distinct so n_distinct matches
          // count(DISTINCT col) semantics (which never counts NULL) —
          // inert on the NULL-free fixture, load-bearing the moment a
          // nullable column joins the profile
          orders.select(col(c).as("v")).filter(col("v").isNotNull).distinct()
            .agg(count(ONE).as("n_distinct"),
              expr(render("min(v)")).cast("string").as("min_value"),
              expr(render("max(v)")).cast("string").as("max_value"))
            .select(lit(c).as("column_name"), col("n_distinct"),
              col("min_value"), col("max_value"))
        val ident = (e: String) => e
        val money = (e: String) => s"CAST($e AS DECIMAL(18,2))"
        // o_orderdate is TIMESTAMP_NTZ; the session tz is UTC, so the
        // TIMESTAMP cast is instant-preserving and micros match DuckDB
        val micros = (e: String) => s"unix_micros(CAST($e AS TIMESTAMP))"
        val cols = prof("o_orderkey", ident)
          .unionAll(prof("o_custkey", ident))
          .unionAll(prof("o_orderstatus", ident))
          .unionAll(prof("o_totalprice", money))
          .unionAll(prof("o_orderdate", micros))
          .unionAll(prof("o_orderpriority", ident))
        val nRows = orders.agg(count(ONE).as("n_rows"))
        cols.crossJoin(broadcast(nRows))
          .select(col("column_name"), col("n_rows"), col("n_distinct"),
            col("min_value"), col("max_value"))
          .orderBy("column_name")
      },
      Some("""
        WITH a AS (
          SELECT count(*) AS n_rows,
                 count(DISTINCT o_orderkey) AS nd_key,
                 CAST(min(o_orderkey) AS VARCHAR) AS mn_key,
                 CAST(max(o_orderkey) AS VARCHAR) AS mx_key,
                 count(DISTINCT o_custkey) AS nd_cust,
                 CAST(min(o_custkey) AS VARCHAR) AS mn_cust,
                 CAST(max(o_custkey) AS VARCHAR) AS mx_cust,
                 count(DISTINCT o_orderstatus) AS nd_status,
                 min(o_orderstatus) AS mn_status,
                 max(o_orderstatus) AS mx_status,
                 count(DISTINCT o_totalprice) AS nd_price,
                 CAST(CAST(min(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mn_price,
                 CAST(CAST(max(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR) AS mx_price,
                 count(DISTINCT o_orderdate) AS nd_date,
                 CAST(min(epoch_us(o_orderdate)) AS VARCHAR) AS mn_date,
                 CAST(max(epoch_us(o_orderdate)) AS VARCHAR) AS mx_date,
                 count(DISTINCT o_orderpriority) AS nd_prio,
                 min(o_orderpriority) AS mn_prio,
                 max(o_orderpriority) AS mx_prio
          FROM orders)
        SELECT u.column_name, a.n_rows, u.n_distinct, u.min_value, u.max_value
        FROM a, (
          SELECT 'o_orderkey' AS column_name, nd_key AS n_distinct, mn_key AS min_value, mx_key AS max_value FROM a
          UNION ALL SELECT 'o_custkey', nd_cust, mn_cust, mx_cust FROM a
          UNION ALL SELECT 'o_orderstatus', nd_status, mn_status, mx_status FROM a
          UNION ALL SELECT 'o_totalprice', nd_price, mn_price, mx_price FROM a
          UNION ALL SELECT 'o_orderdate', nd_date, mn_date, mx_date FROM a
          UNION ALL SELECT 'o_orderpriority', nd_prio, mn_prio, mx_prio FROM a) u
        ORDER BY u.column_name""")),

    // -------------------------------------------------------------------
    // Time-series resampling + forward fill: regrid each user's event
    // values onto an hourly grid over one day, carrying the last
    // observation forward (the gap-filling primitive of metric
    // pipelines). The grid is generated per user (sequence + explode —
    // no driver loop), events land on it via floor-to-hour, and the
    // fill is one `last(value, ignoreNulls)` running window per user —
    // a single shuffle on user_id at any scale. A trailing join marks
    // which grid points carried real observations.
    QueryDef("q31_resample_ffill",
      (s, d) => {
        val dayStart = 1704067200000000L // 2024-01-01T00:00:00Z
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("us"), col("value"))
          .filter(pmod(col("user_id"), lit(100)) === 3)
          .filter(col("us") >= dayStart && col("us") < dayStart + 86400000000L)
          // integer floor division on BOTH sides: Spark Column `/` would
          // produce a double whose cast truncates while DuckDB's rounds
          .withColumn("slot", expr(s"(us - $dayStart) div 3600000000"))
        // last event per (user, slot) decides the slot's observed value;
        // event_id breaks equal-timestamp ties so the pick is total-ordered
        val wSlot = Window.partitionBy("user_id", "slot")
          .orderBy(col("us").desc, col("event_id").desc)
        val obs = ev.withColumn("rn", row_number().over(wSlot)).filter(col("rn") === 1)
          .select(col("user_id"), col("slot"), col("value"))
        val grid = obs.select("user_id").distinct()
          .select(col("user_id"), explode(expr("sequence(CAST(0 AS BIGINT), 23)")).as("slot"))
        val wFill = Window.partitionBy("user_id").orderBy("slot")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(obs, Seq("user_id", "slot"), "left")
          .withColumn("filled", last(col("value"), ignoreNulls = true).over(wFill))
          .select(col("user_id"), col("slot"),
            col("filled").as("value"), col("value").isNotNull.as("observed"))
          .orderBy("user_id", "slot")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value,
                 (epoch_us(ts) - 1704067200000000) // 3600000000 AS slot
          FROM events
          WHERE user_id % 100 = 3
            AND epoch_us(ts) >= 1704067200000000
            AND epoch_us(ts) < 1704067200000000 + 86400000000),
        obs AS (
          SELECT user_id, slot, value FROM (
            SELECT user_id, slot, value,
                   row_number() OVER (PARTITION BY user_id, slot
                                      ORDER BY us DESC, event_id DESC) AS rn
            FROM ev) WHERE rn = 1),
        grid AS (
          SELECT user_id, CAST(s AS BIGINT) AS slot
          FROM (SELECT DISTINCT user_id FROM obs)
          CROSS JOIN generate_series(0, 23) t(s))
        SELECT g.user_id, g.slot,
               last_value(o.value IGNORE NULLS) OVER
                 (PARTITION BY g.user_id ORDER BY g.slot
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
               o.value IS NOT NULL AS observed
        FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.slot = o.slot
        ORDER BY g.user_id, g.slot""")),

    // -------------------------------------------------------------------
    // Funnel analysis: how many users progress view -> click ->
    // purchase, in order, within the whole month. Each stage timestamp
    // is a conditional min over the user's events gated on the previous
    // stage (exact integer micros — no floats anywhere), so the whole
    // funnel is ONE groupBy(user) pass at any scale, then a 4-row
    // stage-count rollup.
    QueryDef("q32_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val stages = ev.groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("us"))).as("t_view"))
          .join(ev, "user_id")
          .groupBy("user_id", "t_view")
          .agg(min(when(col("event_type") === "click" && col("us") > col("t_view"), col("us"))).as("t_click"))
          .join(ev, "user_id")
          .groupBy("user_id", "t_view", "t_click")
          .agg(min(when(col("event_type") === "purchase" && col("us") > col("t_click"), col("us"))).as("t_purchase"))
        stages.agg(
          count(ONE).as("n_users"),
          count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_click"),
          count(col("t_purchase")).as("n_purchase"))
          .select(
            expr("stack(4, 'all_users', n_users, '1_view', n_view, '2_view_click', n_click, '3_view_click_purchase', n_purchase) AS (stage, n)"))
          .orderBy("stage")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        v AS (
          SELECT user_id,
                 min(CASE WHEN event_type = 'view' THEN us END) AS t_view
          FROM e GROUP BY user_id),
        c AS (
          SELECT e.user_id, v.t_view,
                 min(CASE WHEN e.event_type = 'click' AND e.us > v.t_view THEN e.us END) AS t_click
          FROM v JOIN e ON v.user_id = e.user_id
          GROUP BY e.user_id, v.t_view),
        p AS (
          SELECT e.user_id, c.t_view, c.t_click,
                 min(CASE WHEN e.event_type = 'purchase' AND e.us > c.t_click THEN e.us END) AS t_purchase
          FROM c JOIN e ON c.user_id = e.user_id
          GROUP BY e.user_id, c.t_view, c.t_click)
        SELECT stage, n FROM (
          SELECT 'all_users' AS stage, count(*) AS n FROM p
          UNION ALL SELECT '1_view', count(t_view) FROM p
          UNION ALL SELECT '2_view_click', count(t_click) FROM p
          UNION ALL SELECT '3_view_click_purchase', count(t_purchase) FROM p)
        ORDER BY stage""")),

    // -------------------------------------------------------------------
    // Cohort retention: users grouped by first-seen day, counted by how
    // many distinct later days they return on. First-seen is one
    // groupBy(user); the (cohort_day, day_offset) matrix is a second
    // partial-aggregated groupBy — the standard two-shuffle retention
    // shape. All keys are exact integer day numbers; rates are one
    // double division, rounded.
    QueryDef("q33_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val first = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
        val cohortSize = first.groupBy("cohort_day").agg(count(ONE).as("n_cohort"))
        ev.join(first, "user_id")
          .withColumn("offset", col("day") - col("cohort_day"))
          .filter(col("offset").between(1, 7))
          .groupBy("cohort_day", "offset")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(broadcast(cohortSize), "cohort_day")
          .select(col("cohort_day"), col("offset"), col("n_active"),
            round(col("n_active").cast("double") / col("n_cohort"), 6).as("retention"))
          .orderBy("cohort_day", "offset")
      },
      Some("""
        WITH ev AS (
          SELECT DISTINCT user_id,
                 epoch_us(ts) // 86400000000 AS day
          FROM events),
        first AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id),
        sz AS (SELECT cohort_day, count(*) AS n_cohort FROM first GROUP BY cohort_day),
        act AS (
          SELECT f.cohort_day, e.day - f.cohort_day AS "offset",
                 count(DISTINCT e.user_id) AS n_active
          FROM ev e JOIN first f ON e.user_id = f.user_id
          WHERE e.day - f.cohort_day BETWEEN 1 AND 7
          GROUP BY f.cohort_day, e.day - f.cohort_day)
        SELECT a.cohort_day, a."offset", a.n_active,
               round(CAST(a.n_active AS DOUBLE) / s.n_cohort, 6) AS retention
        FROM act a JOIN sz s ON a.cohort_day = s.cohort_day
        ORDER BY a.cohort_day, a."offset"""")),

    // -------------------------------------------------------------------
    // The classic TPC-H trio (Q3/Q10/Q18 shapes) on the driver's
    // fixtures — the canonical multi-join + decimal-agg + top-k
    // benchmark queries every warehouse engine is judged on. Dims ride
    // broadcast joins; revenue math is the exact-decimal recipe of
    // q01/q03; every ranking is rounded + key-tie-broken.
    //
    // Q3: shipping priority — unshipped orders of one segment, top 10
    // by discounted revenue.
    QueryDef("q34_tpch_q3",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") > to_timestamp(lit("1996-06-30 00:00:00")))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .agg(Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")).as("revenue"))
        .select(col("l_orderkey"), round(col("revenue"), 6).as("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some(s"""
        SELECT l_orderkey,
               round(${Sql.oDsumProd("l_extendedprice", "1 - l_discount")}, 6) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
        GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")),

    // Q10: returned-item reporting — customers who returned goods,
    // ranked by lost revenue. Top 20.
    QueryDef("q35_tpch_q10",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")).as("revenue"))
        .select(col("c_custkey"), col("c_name"),
          round(col("revenue"), 6).as("revenue"), col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20),
      Some(s"""
        SELECT c_custkey, c_name,
               round(${Sql.oDsumProd("l_extendedprice", "1 - l_discount")}, 6) AS revenue,
               c_acctbal, n_name
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    // Q18: large-volume customers — orders whose total quantity exceeds
    // a threshold; the group-then-semi-join-back shape (the inner
    // aggregate is the only shuffle of the fact).
    QueryDef("q36_tpch_q18",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(Sql.dsum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 300)
        big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      Some(s"""
        WITH big AS (
          SELECT l_orderkey, ${Sql.oDsum("l_quantity")} AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING ${Sql.oDsum("l_quantity")} > 300)
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey""")),

    // -------------------------------------------------------------------
    // Custom TypedImperativeAggregate: `topk_structs` keeps the k
    // smallest (price, orderkey, linenumber) structs per group inside
    // the aggregation tree itself — bounded binary state, partial +
    // merge, so at 100 TB only k rows per group per partition ever
    // exist (the aggregate-expression form of the TopKPerKey physical
    // operator). The unique (orderkey, linenumber) tie-break makes the
    // kept set merge-order-independent; DuckDB reproduces it with a
    // rank window.
    QueryDef("q37_topk_agg",
      (s, d) => {
        Ns.registerFast(s)
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(expr("topk_structs(struct(l_extendedprice, l_orderkey, l_linenumber), 3)").as("tk"))
          .select(col("l_returnflag"), posexplode(col("tk")))
          .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("pos"),
            col("col.l_extendedprice").as("l_extendedprice"),
            col("col.l_orderkey").as("l_orderkey"),
            col("col.l_linenumber").as("l_linenumber"))
          .orderBy("l_returnflag", "pos")
      },
      Some("""
        WITH r AS (
          SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
                 row_number() OVER (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
          FROM lineitem)
        SELECT l_returnflag, CAST(rn AS INT) AS pos,
               l_extendedprice, l_orderkey, l_linenumber
        FROM r WHERE rn <= 3
        ORDER BY l_returnflag, pos""")),

    // -------------------------------------------------------------------
    // Ordered string aggregation (LISTAGG): the report-building
    // primitive. Spark's collect_list is unordered by contract, so the
    // deterministic spelling is sort_array first — which is also the
    // partitioning-invariance recipe. DuckDB: string_agg ORDER BY.
    QueryDef("q38_string_agg",
      (s, d) => Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(ONE).as("n_nations"),
          expr("array_join(sort_array(collect_list(n_name)), ',')").as("nations"))
        .orderBy("r_name"),
      Some("""
        SELECT r_name, count(*) AS n_nations,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")),

    // -------------------------------------------------------------------
    // Extended window family beyond q06: ntile bucketing, percent_rank /
    // cume_dist, bounded-frame first/last values, and a centered moving
    // average — one shuffle+sort serves every function (same window
    // key). Rates are exact divisions of integer window positions; the
    // moving average is a decimal-exact sum over a 3-row frame. This
    // query's SEMANTICS is the window-function surface itself, so the
    // partitionBy spelling is the contract; a corpus-sized production
    // rank by a 5-value key would route through Prefix.orderStats
    // (q103/q132/q151 are that spelling).
    QueryDef("q39_window_family",
      (s, d) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val frame = w.rowsBetween(-1, 1)
        Tables.orders(s, d)
          .filter(pmod(col("o_orderkey"), lit(20)) === 0)
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("quartile", ntile(4).over(w).cast("int"))
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .withColumn("cheapest_neighbor",
            first(col("o_totalprice")).over(frame))
          .withColumn("moving_avg",
            round((sum(col("o_totalprice").cast("decimal(18,2)")).over(frame).cast("double") /
              count(lit(1)).over(frame)), 6))
          .orderBy("o_orderpriority", "o_totalprice", "o_orderkey")
      },
      Some("""
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume,
               first_value(o_totalprice) OVER
                 (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS cheapest_neighbor,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                 (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) /
                 count(*) OVER
                 (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6) AS moving_avg
        FROM orders
        WHERE o_orderkey % 20 = 0
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderpriority, o_totalprice, o_orderkey""")),

    // -------------------------------------------------------------------
    // Conditional aggregation family: FILTER-style counts, bool
    // aggregates, arg-max via the deterministic max(struct) recipe
    // (unique orderkey tie-break), all in ONE partial-aggregated pass.
    QueryDef("q41_conditional_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(ONE).as("n"),
          count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
          count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
          max(col("o_orderstatus") === "P").as("any_pending"),
          min(col("o_orderstatus") === "F").as("all_finished"),
          max(struct(col("o_totalprice"), col("o_orderkey"))).as("top"))
        .select(col("o_orderpriority"), col("n"), col("n_finished"), col("n_big"),
          col("any_pending"), col("all_finished"),
          col("top.o_orderkey").as("max_price_orderkey"),
          col("top.o_totalprice").as("max_price"))
        .orderBy("o_orderpriority"),
      Some("""
        SELECT o_orderpriority, count(*) AS n,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               bool_or(o_orderstatus = 'P') AS any_pending,
               bool_and(o_orderstatus = 'F') AS all_finished,
               max(struct_pack(o_totalprice := o_totalprice, o_orderkey := o_orderkey)).o_orderkey AS max_price_orderkey,
               max(struct_pack(o_totalprice := o_totalprice, o_orderkey := o_orderkey)).o_totalprice AS max_price
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------------
    // UNPIVOT / melt: the wide-aggregate -> long reporting shape, via
    // Spark's native Dataset.unpivot (an Expand of exactly
    // |measures| rows per input row — here over a 3-row aggregate, so
    // the expansion is on the reduced side, never the scan). Measures
    // are decimal-exact doubles so both engines unpivot identical
    // values.
    QueryDef("q42_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(Sql.dsum(col("l_quantity")).as("sum_qty"),
          Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")).as("sum_revenue"),
          count(ONE).cast("double").as("n_rows"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_revenue"), col("n_rows")),
          "measure", "value")
        .select(col("l_returnflag"), col("measure"),
          round(col("value"), 6).as("value"))
        .orderBy("l_returnflag", "measure"),
      Some(s"""
        WITH wide AS (
          SELECT l_returnflag,
                 ${Sql.oDsum("l_quantity")} AS sum_qty,
                 ${Sql.oDsumProd("l_extendedprice", "1 - l_discount")} AS sum_revenue,
                 CAST(count(*) AS DOUBLE) AS n_rows
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag, measure, round(value, 6) AS value
        FROM wide UNPIVOT (value FOR measure IN (sum_qty, sum_revenue, n_rows))
        ORDER BY l_returnflag, measure""")),

    // -------------------------------------------------------------------
    // TPC-H Q5: local-supplier volume — the 6-table join with the
    // customer-nation = supplier-nation equality. Shape for scale: the
    // one fact-fact shuffle is lineitem JOIN orders on orderkey;
    // customer, supplier and the nation⋈region dim chain all broadcast,
    // so the nation equality is checked inside the broadcast probes and
    // the only wide exchange is the final 25-group aggregate.
    QueryDef("q43_tpch_q5",
      (s, d) => {
        val asiaNations = broadcast(Tables.nation(s, d)
          .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey")))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")).as("revenue"))
          .select(col("n_name"), round(col("revenue"), 6).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""
        SELECT n_name,
               round(${Sql.oDsumProd("l_extendedprice", "1 - l_discount")}, 6) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name""")),

    // -------------------------------------------------------------------
    // Equi-depth (decile-edged) histogram — the profiling complement of
    // q28's equi-width bins. Scale shape: NO global-sort ntile window;
    // the 9 decile edges come from one exact-percentile aggregate (the
    // q17 recipe; at 100 TB swap in the q24 t-digest for the edges, the
    // binning pass is unchanged), broadcast to a narrow per-row bin
    // assignment, then one partial-agg groupBy. Edges are rounded to 6
    // before comparison so binning is ulp-robust across engines.
    QueryDef("q48_equidepth_histogram",
      (s, d) => {
        val edges = Tables.orders(s, d).agg(
          expr("""transform(percentile(o_totalprice,
                    array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)),
                  e -> round(e, 6))""").as("edges"))
        Tables.orders(s, d).crossJoin(broadcast(edges))
          .select(col("o_totalprice"),
            expr("CAST(1 + size(filter(edges, e -> o_totalprice > e)) AS INT)").as("bin"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
          .orderBy("bin")
      },
      Some("""
        WITH edges AS (
          SELECT list_transform(
                   quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                   e -> round(e, 6)) AS edges
          FROM orders)
        SELECT CAST(1 + len(list_filter(edges, e -> o_totalprice > e)) AS INT) AS bin,
               count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM orders CROSS JOIN edges
        GROUP BY 1
        ORDER BY bin""")),

    // -------------------------------------------------------------------
    // Date/time arithmetic family beyond q11: day arithmetic against an
    // epoch anchor, month addition, end-of-month, quarter, day-of-week
    // (aligned to Spark's 1=Sunday convention on both sides). All
    // results leave as ISO strings or exact integers — the cross-engine
    // safe renderings.
    QueryDef("q40_date_arithmetic",
      (s, d) => Tables.orders(s, d)
        .filter(pmod(col("o_orderkey"), lit(100)) === 0)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
          datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast("long").as("days_since_epoch"),
          date_format(add_months(to_date(col("o_orderdate")), 3), "yyyy-MM-dd").as("plus3m"),
          date_format(last_day(to_date(col("o_orderdate"))), "yyyy-MM-dd").as("month_end"),
          quarter(col("o_orderdate")).cast("int").as("q"),
          dayofweek(col("o_orderdate")).cast("int").as("dow"))
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS d,
               CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
               CAST(quarter(o_orderdate) AS INT) AS q,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        FROM orders
        WHERE o_orderkey % 100 = 0
        ORDER BY o_orderkey""")),

    // -------------------------------------------------------------------
    // LATERAL correlated subquery (SQL surface): for each high-balance
    // customer, the 2 most recent orders — the "top-n per row" join
    // Spark 4 decorrelates into a ranked join under the hood. Both
    // engines run the same ANSI text.
    QueryDef("q44_lateral",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_v")
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT c_custkey, t.o_orderkey,
                 date_format(t.o_orderdate, 'yyyy-MM-dd') AS o_orderdate
          FROM customer_v c,
          LATERAL (
            SELECT o_orderkey, o_orderdate FROM orders_v o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_orderdate DESC, o_orderkey DESC
            LIMIT 2
          ) t
          WHERE c.c_acctbal > 9000
          ORDER BY c_custkey, t.o_orderkey""")
      },
      Some("""
        SELECT c_custkey, t.o_orderkey,
               strftime(t.o_orderdate, '%Y-%m-%d') AS o_orderdate
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_orderdate FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC
          LIMIT 2
        ) t
        WHERE c.c_acctbal > 9000
        ORDER BY c_custkey, t.o_orderkey""")),

    // -------------------------------------------------------------------
    // Right-to-be-forgotten cascade (GDPR purge): given a tombstone set
    // (users whose latest event is an 'error'), report what a purge
    // would delete vs retain — the anti-join audit every privacy
    // pipeline runs before the destructive write. The tombstone set is
    // tiny by nature and broadcasts; the facts are scanned once.
    QueryDef("q45_purge_audit",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val tombstones = ev.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") === "error")
          .select(col("user_id"))
        ev.join(broadcast(tombstones.withColumn("purge", lit(true))), Seq("user_id"), "left")
          .groupBy("event_type")
          .agg(count(ONE).as("n_events"),
            count(when(col("purge"), 1)).as("n_purged"),
            countDistinct(when(col("purge"), col("user_id"))).as("n_purged_users"))
          .select(col("event_type"), col("n_events"), col("n_purged"),
            (col("n_events") - col("n_purged")).as("n_retained"),
            col("n_purged_users"))
          .orderBy("event_type")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
        t AS (
          SELECT user_id FROM (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
            FROM e) WHERE rn = 1 AND event_type = 'error')
        SELECT e.event_type, count(*) AS n_events,
               count(*) FILTER (WHERE t.user_id IS NOT NULL) AS n_purged,
               count(*) - count(*) FILTER (WHERE t.user_id IS NOT NULL) AS n_retained,
               count(DISTINCT CASE WHEN t.user_id IS NOT NULL THEN e.user_id END) AS n_purged_users
        FROM e LEFT JOIN t ON e.user_id = t.user_id
        GROUP BY e.event_type
        ORDER BY e.event_type""")),

    // -------------------------------------------------------------------
    // A/B-test lift analysis: users split into deterministic hash
    // variants, per-metric lift and a two-sample z statistic from
    // EXACT decimal moments (the q29 recipe) — every float op is one
    // expression written identically in both engines, so even the
    // significance boolean is bit-deterministic.
    QueryDef("q46_ab_lift",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("value"),
            pmod(expr(graft.operators.Ns.hash60("CAST(user_id AS STRING)")), lit(2L)).as("variant"))
        val stats = ev.groupBy("event_type", "variant")
          .agg(count(ONE).as("n"),
            sum(col("value").cast("decimal(18,2)")).as("dsum"),
            sum(expr("CAST(value * value AS DECIMAL(28,8))")).as("dsumsq"))
          .select(col("event_type"), col("variant"), col("n"),
            expr("CAST(dsum AS DOUBLE) / n").as("mean"),
            expr("(CAST(dsumsq AS DOUBLE) / n - (CAST(dsum AS DOUBLE) / n) * (CAST(dsum AS DOUBLE) / n)) / n").as("sem2"))
        val a = stats.filter(col("variant") === 0)
          .select(col("event_type"), col("n").as("n0"), col("mean").as("mean0"), col("sem2").as("s0"))
        a.join(stats.filter(col("variant") === 1)
            .select(col("event_type"), col("n").as("n1"), col("mean").as("mean1"), col("sem2").as("s1")),
          "event_type")
          .select(col("event_type"), col("n0"), col("n1"),
            round(col("mean0"), 6).as("mean0"), round(col("mean1"), 6).as("mean1"),
            round(expr("(mean1 - mean0) / mean0"), 6).as("lift"),
            round(expr("(mean1 - mean0) / sqrt(s0 + s1)"), 6).as("z"),
            expr("abs((mean1 - mean0) / sqrt(s0 + s1)) > CAST(1.96 AS DOUBLE)").as("significant"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH v AS (
          SELECT event_type, value,
                 ${graft.operators.Ns.oHash60("CAST(user_id AS VARCHAR)")} % 2 AS variant
          FROM events),
        stats AS (
          SELECT event_type, variant, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
                 (CAST(sum(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE) / count(*)
                  - (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
                    * (CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))) / count(*) AS sem2
          FROM v GROUP BY event_type, variant)
        SELECT a.event_type, a.n AS n0, b.n AS n1,
               round(a.mean, 6) AS mean0, round(b.mean, 6) AS mean1,
               round((b.mean - a.mean) / a.mean, 6) AS lift,
               round((b.mean - a.mean) / sqrt(a.sem2 + b.sem2), 6) AS z,
               abs((b.mean - a.mean) / sqrt(a.sem2 + b.sem2)) > CAST(1.96 AS DOUBLE) AS significant
        FROM stats a JOIN stats b ON a.event_type = b.event_type
        WHERE a.variant = 0 AND b.variant = 1
        ORDER BY a.event_type""")),

    // -------------------------------------------------------------------
    // Map-typed columns (completing the nested types next to structs and
    // arrays): build a per-flag map of linestatus -> row count, then
    // transform values, filter entries, and flatten back to rows — maps
    // never reach the comparator un-flattened (engines render map
    // literals differently), which is also the right shape for a
    // downstream consumer.
    QueryDef("q47_map_funcs",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(ONE).as("n"))
        .groupBy("l_returnflag")
        .agg(expr("map_from_entries(sort_array(collect_list(struct(l_linestatus, n))))").as("m"))
        .select(col("l_returnflag"),
          expr("map_keys(m)").as("ks"),
          expr("transform(map_values(m), v -> v * 2)").as("doubled"),
          expr("size(map_filter(m, (k, v) -> v > 100))").cast("int").as("n_big_entries"))
        .select(col("l_returnflag"), col("doubled"), col("n_big_entries"),
          posexplode(col("ks")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("pos"),
          col("col").as("linestatus"),
          expr("doubled[pos]").as("doubled_n"), col("n_big_entries"))
        .orderBy("l_returnflag", "pos"),
      Some("""
        WITH c AS (
          SELECT l_returnflag, l_linestatus, count(*) AS n
          FROM lineitem GROUP BY l_returnflag, l_linestatus),
        f AS (
          SELECT l_returnflag,
                 CAST(count(*) FILTER (WHERE n > 100) AS INT) AS n_big_entries
          FROM c GROUP BY l_returnflag)
        SELECT c.l_returnflag,
               CAST(row_number() OVER (PARTITION BY c.l_returnflag ORDER BY c.l_linestatus) AS INT) AS pos,
               c.l_linestatus AS linestatus,
               c.n * 2 AS doubled_n,
               f.n_big_entries
        FROM c JOIN f ON c.l_returnflag = f.l_returnflag
        ORDER BY c.l_returnflag, pos""")),

    // -------------------------------------------------------------------
    // ANSI NOT IN null semantics vs NOT EXISTS vs EXCEPT — the classic
    // anti-join trap, exercised deliberately: the subquery's key list
    // contains NULLs ('P'-status orders mapped to NULL), so `NOT IN`
    // is three-valued-logic-empty (no row can be proven absent from a
    // list containing NULL), while `NOT EXISTS` (equality never matches
    // NULL) and `EXCEPT` (distinct set difference, NULL-safe) both
    // return real survivors. One row, four counts. Spark plans the
    // NOT IN as a null-aware anti join (BroadcastNestedLoopJoin with
    // the null-aware flag) and NOT EXISTS as a plain left-anti hash
    // join — both engines implement ANSI semantics, so the counts
    // hash-match. Goes through spark.sql to exercise the SQL front-end
    // path (subqueries, CTEs) rather than the DataFrame builders the
    // rest of the suite uses.
    QueryDef("q49_null_antijoin",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("q49_customer")
        Tables.orders(s, d).createOrReplaceTempView("q49_orders")
        s.sql("""
          WITH keys AS (
            SELECT CASE WHEN o_orderstatus = 'P' THEN CAST(NULL AS BIGINT)
                        ELSE o_custkey END AS k
            FROM q49_orders)
          SELECT
            (SELECT count(*) FROM q49_customer
             WHERE c_custkey NOT IN (SELECT k FROM keys)) AS n_not_in,
            (SELECT count(*) FROM q49_customer c
             WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = c.c_custkey)) AS n_not_exists,
            (SELECT count(*) FROM
              (SELECT c_custkey FROM q49_customer EXCEPT SELECT k FROM keys)) AS n_except,
            (SELECT count(*) FROM keys WHERE k IS NULL) AS n_null_keys""")
      },
      Some("""
        WITH keys AS (
          SELECT CASE WHEN o_orderstatus = 'P' THEN CAST(NULL AS BIGINT)
                      ELSE o_custkey END AS k
          FROM orders)
        SELECT
          (SELECT count(*) FROM customer
           WHERE c_custkey NOT IN (SELECT k FROM keys)) AS n_not_in,
          (SELECT count(*) FROM customer c
           WHERE NOT EXISTS (SELECT 1 FROM keys WHERE k = c.c_custkey)) AS n_not_exists,
          (SELECT count(*) FROM
            (SELECT c_custkey FROM customer EXCEPT SELECT k FROM keys)) AS n_except,
          (SELECT count(*) FROM keys WHERE k IS NULL) AS n_null_keys""")),

    // -------------------------------------------------------------------
    // Rolling active users (trailing-24h DAU at hourly grain): for each
    // hour h, the distinct users and event count over (h-23h, h]. Unlike
    // the decomposable sliding counts of st02, DISTINCT over overlapping
    // windows cannot be merged from per-slot partials — the classic
    // approach is to EXPLODE each event into the 24 trailing slots it
    // participates in and de-duplicate (slot, user) pairs in one shuffle.
    // Scale: fan-out is a fixed x24 of (slot, user_id) pairs — two
    // narrow longs, never the event payload; the exact count-distinct is
    // a two-phase agg on those pairs (q15's HLL sketch is the lossy
    // alternative when x24 is too hot).
    QueryDef("q50_rolling_active",
      (s, d) => Tables.events(s, d)
        .select(col("user_id"),
          explode(expr("sequence(0, 23)")).as("k"),
          date_trunc("hour", col("ts")).as("h"))
        .select(col("user_id"),
          date_format(expr("timestampadd(HOUR, k, h)"),
            "yyyy-MM-dd HH:mm:ss").as("slot_hour"))
        // two-phase distinct: dedup (slot, user) while counting events,
        // then count users — NOT countDistinct + count in one agg, which
        // would plan an Expand x2 over the already x24-exploded rows
        // (q30's scan-amplification lesson)
        .groupBy("slot_hour", "user_id")
        .agg(count(lit(1)).as("n_ev_user"))
        .groupBy("slot_hour")
        .agg(count(lit(1)).as("n_users"), sum(col("n_ev_user")).as("n_events"))
        .orderBy("slot_hour"),
      Some("""
        WITH slots AS (
          SELECT user_id,
                 strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR * k.k,
                          '%Y-%m-%d %H:%M:%S') AS slot_hour
          FROM events CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS k) k)
        SELECT slot_hour, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        FROM slots
        GROUP BY slot_hour
        ORDER BY slot_hour""")),

    // -------------------------------------------------------------------
    // TPC-H Q21 shape (suppliers who kept orders waiting): for finalized
    // orders, suppliers whose line item was LATE (shipped > 60 days
    // after the order date) in a multi-supplier order where NO OTHER
    // supplier was late — a double-correlated EXISTS + NOT EXISTS that
    // stresses the decorrelator. Spark plans the EXISTS as a left-semi
    // and the NOT EXISTS as a left-anti hash join, both equi on
    // l_orderkey with the supplier inequality as a join residual; the
    // supplier name lookup broadcasts. The late-flag subtree is read
    // three times — at scale that re-scan is the standard Q21 plan (all
    // three reads push the same o_orderstatus filter + 3-column prune).
    QueryDef("q51_tpch_q21",
      (s, d) => {
        val l = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")).as("late"))
        val l1 = l.filter(col("late"))
        val others = l.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"),
          col("late").as("late2"))
        l1.join(others,
            col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
            "left_semi")
          .join(others.filter(col("late2")),
            col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
            "left_anti")
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_suppkey", "s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
          .limit(20)
      },
      Some("""
        WITH l AS (
          SELECT l_orderkey, l_suppkey,
                 l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F')
        SELECT s.s_suppkey, s.s_name, count(*) AS numwait
        FROM l l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM l l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.late)
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY numwait DESC, s.s_suppkey
        LIMIT 20""")),

    // -------------------------------------------------------------------
    // RANGE-interval window frame: the trailing-1-hour running aggregate
    // at every event — the value-based frame q39's ROWS frames can't
    // express (a ROWS frame counts rows; this one selects by timestamp
    // DISTANCE, so gaps shrink the window and bursts widen it). Spark
    // plans one sort per user partition with a sliding frame evaluated
    // by binary bound advance — no self-join, no explode. The frame is
    // defined by ORDER-BY VALUES, so equal-timestamp peers are always
    // included together: deterministic under any tie order, no unique
    // tie-break column needed (unlike every ROWS query here). Scale:
    // one shuffle on user_id, linear per-partition work.
    QueryDef("q59_interval_frame",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-3600000000L, 0L) // micros: trailing hour, inclusive
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            col("value"))
          .select(col("user_id"), col("event_id"), col("us"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast("decimal(12,2)")).over(w).cast("double").as("sum_1h"))
          .orderBy("user_id", "us", "event_id")
      },
      Some("""
        SELECT user_id, event_id, us,
               count(*) OVER w AS n_1h,
               CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
        FROM (SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, us, event_id""")),

    // -------------------------------------------------------------------
    // Point-in-time (temporal) join: every event of the q26 cohort joined
    // to the SCD2 dimension version that was valid AT THE EVENT'S
    // TIMESTAMP — the canonical "what did the dimension say when the fact
    // happened" lookup that SCD2 tables exist to answer. The join is equi
    // on user_id with the validity interval as a post-join filter, so
    // Spark plans a hash join on the key (NOT a nested loop: the range
    // is residual); each fact matches exactly one version (intervals
    // partition the timeline, half-open [from, to)). Scale: dim versions
    // are per-key few; the fact shuffles once on the join key — same
    // plan shape as any fact-dim join, the interval adds no exchange.
    QueryDef("q60_pit_join",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .filter(pmod(col("user_id"), lit(50)) === 7)
        val dim = ev
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("version", row_number().over(w).cast("int"))
          .withColumn("valid_to_us", lead(col("us"), 1).over(w))
          .select(col("user_id").as("d_user"), col("version"),
            col("event_type").as("state"), col("us").as("valid_from_us"),
            col("valid_to_us"))
        ev.join(dim,
            col("user_id") === col("d_user") &&
              col("us") >= col("valid_from_us") &&
              (col("valid_to_us").isNull || col("us") < col("valid_to_us")))
          .select(col("user_id"), col("event_id"), col("us"),
            col("version"), col("state"))
          .orderBy("user_id", "us", "event_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us
          FROM events WHERE user_id % 50 = 7),
        ch AS (
          SELECT user_id, event_id, event_type, us FROM (
            SELECT user_id, event_id, event_type, us,
                   lag(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
            FROM e)
          WHERE prev IS NULL OR prev <> event_type),
        dim AS (
          SELECT user_id AS d_user, CAST(row_number() OVER w AS INT) AS version,
                 event_type AS state, us AS valid_from_us,
                 lead(us) OVER w AS valid_to_us
          FROM ch
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id))
        SELECT e.user_id, e.event_id, e.us, dim.version, dim.state
        FROM e JOIN dim
          ON e.user_id = dim.d_user
         AND e.us >= dim.valid_from_us
         AND (dim.valid_to_us IS NULL OR e.us < dim.valid_to_us)
        ORDER BY user_id, us, event_id""")),

    // -------------------------------------------------------------------
    // Incremental rollup maintenance: the daily (day, type) rollup is
    // kept as MERGEABLE partial state (count + exact decimal sum), and a
    // new day's arrival merges fresh partials into it — the algebraic
    // (commutative-monoid) property that lets a 100-TB warehouse update
    // a rollup by scanning ONLY the new day, never re-reading history.
    // The query materializes history partials (< T0) and fresh partials
    // (>= T0) separately, merges them, and derives avg from the merged
    // state; the oracle is the straight full-scan GROUP BY — hash
    // equality IS the proof that the merge is exact (decimal sums are
    // associative; doubles would drift here). Derived measures (avg)
    // recompute from merged sums, they are never merged themselves.
    QueryDef("q61_incremental_rollup",
      (s, d) => {
        val t0 = 1705881600000000L // 2024-01-22T00:00:00Z — splits the fixture
        val ev = Tables.events(s, d)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
        def partials(side: org.apache.spark.sql.DataFrame) = side
          .groupBy("day", "event_type")
          .agg(count(ONE).as("n"),
            sum(col("value").cast("decimal(12,2)")).as("sv"))
        partials(ev.filter(col("us") < t0))
          .unionAll(partials(ev.filter(col("us") >= t0)))
          .groupBy("day", "event_type")
          .agg(sum(col("n")).as("n_events"),
            sum(col("sv")).cast("double").as("sum_value"),
            (sum(col("sv")).cast("double") / sum(col("n"))).as("avg_value"))
          .orderBy("day", "event_type")
      },
      Some("""
        SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
               CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value
        FROM events
        GROUP BY 1, 2
        ORDER BY day, event_type""")),

    // -------------------------------------------------------------------
    // Linear interpolation over a resampled hourly grid (q31's ffill
    // sibling): gaps get the straight line between the surrounding
    // observations. The interpolation is ENGINE-EXACT by construction:
    // values become integer micro-units (2-decimal money × 1e6, exact
    // decimal→bigint), and the interpolated point rounds the exact
    // rational (pv·m + Δv·k)/m half-up with pure bigint arithmetic
    // ((2N + m) div 2m) — a fractional weight like k/32 would otherwise
    // land the double on a 7th-decimal midpoint where engines' round()
    // split (the t02/s08 lesson, applied at design time). Scale: one
    // shuffle on user_id; slots explode from a per-user span row, and
    // both window passes share the (user_id, h) sort.
    QueryDef("q62_linear_interp",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(pmod(col("user_id"), lit(50)) === 11)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"))
          .withColumn("h", expr("us div 3600000000"))
        val wPick = Window.partitionBy("user_id", "h")
          .orderBy(col("us").desc, col("event_id").desc)
        val obs = ev.withColumn("rn", row_number().over(wPick)).filter(col("rn") === 1)
          .select(col("user_id"), col("h"), col("v6"))
        val slots = ev.groupBy("user_id").agg(min("h").as("h0"), max("h").as("h1"))
          .select(col("user_id"), explode(expr("sequence(h0, h1)")).as("h"))
        val wPrev = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wNext = Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(0, Window.unboundedFollowing)
        slots.join(obs, Seq("user_id", "h"), "left")
          .withColumn("pv", last(col("v6"), ignoreNulls = true).over(wPrev))
          .withColumn("ph", last(when(col("v6").isNotNull, col("h")), ignoreNulls = true).over(wPrev))
          .withColumn("nv", first(col("v6"), ignoreNulls = true).over(wNext))
          .withColumn("nh", first(when(col("v6").isNotNull, col("h")), ignoreNulls = true).over(wNext))
          .withColumn("v6i", expr(
            """CASE WHEN v6 IS NOT NULL THEN v6
               ELSE (2 * (pv * (nh - ph) + (nv - pv) * (h - ph)) + (nh - ph))
                    div (2 * (nh - ph)) END"""))
          .select(col("user_id"), col("h"), col("v6i"),
            col("v6").isNull.as("interpolated"),
            (col("v6i").cast("double") / lit(1000000.0)).as("v"))
          .orderBy("user_id", "h")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6,
                 epoch_us(ts) // 3600000000 AS h
          FROM events WHERE user_id % 50 = 11),
        obs AS (
          SELECT user_id, h, v6 FROM (
            SELECT user_id, h, v6,
                   row_number() OVER (PARTITION BY user_id, h
                                      ORDER BY us DESC, event_id DESC) AS rn
            FROM e)
          WHERE rn = 1),
        slots AS (
          SELECT user_id, unnest(generate_series(h0, h1)) AS h
          FROM (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY user_id)),
        j AS (
          SELECT s.user_id, s.h, o.v6 FROM slots s
          LEFT JOIN obs o ON s.user_id = o.user_id AND s.h = o.h),
        w AS (
          SELECT user_id, h, v6,
                 last_value(v6 IGNORE NULLS) OVER wp AS pv,
                 last_value(CASE WHEN v6 IS NOT NULL THEN h END IGNORE NULLS) OVER wp AS ph,
                 first_value(v6 IGNORE NULLS) OVER wn AS nv,
                 first_value(CASE WHEN v6 IS NOT NULL THEN h END IGNORE NULLS) OVER wn AS nh
          FROM j
          WINDOW wp AS (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY user_id ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        f AS (
          SELECT user_id, h,
                 CASE WHEN v6 IS NOT NULL THEN v6
                      ELSE (2 * (pv * (nh - ph) + (nv - pv) * (h - ph)) + (nh - ph))
                           // (2 * (nh - ph)) END AS v6i,
                 v6 IS NULL AS interpolated
          FROM w)
        SELECT user_id, h, v6i, interpolated,
               CAST(v6i AS DOUBLE) / 1000000.0 AS v
        FROM f
        ORDER BY user_id, h""")),

    // -------------------------------------------------------------------
    // Exact grouped MODE with a deterministic tie-break (q17's
    // percentile sibling for categorical columns). Spark 4 has mode(),
    // but its tie choice is arbitrary — useless for a reproducible
    // pipeline — so this is the canonical two-level shape: count per
    // (group, value) with map-side partials, then one ranked pick per
    // group (ties -> lexicographically smallest value). Scale: the
    // second phase runs on |groups x distinct values| rows, not data.
    QueryDef("q63_grouped_mode",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("n").desc, col("o_orderpriority"))
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment", "o_orderpriority")
          .agg(count(ONE).as("n"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"),
            col("n"))
          .orderBy("c_mktsegment")
      },
      Some("""
        SELECT c_mktsegment, o_orderpriority AS mode_priority, n
        FROM (
          SELECT c_mktsegment, o_orderpriority, count(*) AS n,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY count(*) DESC, o_orderpriority) AS rn
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment, o_orderpriority)
        WHERE rn = 1
        ORDER BY c_mktsegment""")),

    // -------------------------------------------------------------------
    // Mergeable HLL sketches (Apache DataSketches via hll_sketch_agg) —
    // the warehouse incremental-distinct primitive. Each shard persists a
    // ~KB binary sketch; the nightly rollup UNIONS sketches instead of
    // rescanning raw rows, so refreshing a global distinct count costs
    // O(shards), not O(data). The query proves the algebra the pattern
    // rests on: HLL union is a register-wise max, so the SHARD LAYOUT
    // cannot change the merged result — unioning 8 shard sketches and 3
    // shard sketches over the same rows yields identical estimates (note:
    // a union does NOT equal a direct one-pass sketch in HLL mode, since
    // direct updates keep the HIP estimator while unions fall back to the
    // composite estimator — equality across layouts is the invariant that
    // actually holds, and the one incremental pipelines rely on). The
    // merged estimate also lands within the lgK=12 error bound of the
    // exact count. q15's approx_count_distinct is the one-shot form; this
    // is the incremental/mergeable form.
    QueryDef("q64_hll_sketch",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // per-shard sketches — the state an incremental pipeline persists
        def mergedEst(nShards: Int) = li
          .withColumn("shard", pmod(col("l_orderkey"), lit(nShards)))
          .groupBy("shard")
          .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as(s"est_$nShards"))
        val exact = li.agg(
          countDistinct(col("l_partkey")).as("n_exact"),
          countDistinct(pmod(col("l_orderkey"), lit(8))).as("n_shards"))
        exact.crossJoin(mergedEst(8)).crossJoin(mergedEst(3)) // 1-row sides
          .select(col("n_exact"), col("n_shards"),
            (col("est_8") === col("est_3")).as("layout_invariant"),
            col("est_8")
              .between(col("n_exact") * 0.94, col("n_exact") * 1.06)
              .as("est_in_bounds"))
      },
      Some("""
        SELECT count(DISTINCT l_partkey) AS n_exact,
               count(DISTINCT l_orderkey % 8) AS n_shards,
               TRUE AS layout_invariant,
               TRUE AS est_in_bounds
        FROM lineitem""")),

    // -------------------------------------------------------------------
    // Sequential pattern detection over per-user event journeys — the
    // MATCH_RECOGNIZE / funnel-regex technique: encode each event as one
    // char, assemble the user's journey string in (ts, event_id) order,
    // then match patterns on the string. Subsequence conversion uses LIKE
    // ('%v%c%p%') and contiguous-funnel counting uses literal replace()
    // arithmetic — both have identical semantics in every SQL engine,
    // unlike regex counting (leftmost-first vs leftmost-longest). Scale:
    // state per user is its event count (same bound as sessionization);
    // the groupBy shuffles each event once, pre-projected to 1 char.
    // q32 is the stage-at-a-time funnel; this is the whole-journey form.
    QueryDef("q65_journey_pattern",
      (s, d) => {
        val ch = when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .when(col("event_type") === "signup", "s")
          .otherwise("e")
        Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), ch.as("ch"))
          .groupBy("user_id")
          .agg(array_join(
            transform(sort_array(collect_list(struct(col("us"), col("event_id"), col("ch")))),
              x => x.getField("ch")), "").as("journey"))
          .select(col("user_id"), col("journey"),
            length(col("journey")).as("n_events"),
            col("journey").like("%v%c%p%").as("converted"),
            ((length(col("journey")) -
              length(replace(col("journey"), lit("vcp"), lit("")))) / 3)
              .cast("int").as("n_direct_funnels"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                      ELSE 'e' END AS ch
          FROM events),
        j AS (
          SELECT user_id, string_agg(ch, '' ORDER BY us, event_id) AS journey
          FROM e GROUP BY user_id)
        SELECT user_id, journey,
               CAST(length(journey) AS INT) AS n_events,
               journey LIKE '%v%c%p%' AS converted,
               CAST((length(journey) - length(replace(journey, 'vcp', ''))) // 3
                    AS INT) AS n_direct_funnels
        FROM j
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Incremental maintenance of a JOIN materialized view (q61's sibling
    // for the join algebra, not just the rollup monoid). The stored MV is
    // agg(O_old ⋈ L_old); when delta batches ΔO and ΔL arrive, the exact
    // delta-join identity
    //   O ⋈ L = O_old⋈L_old ∪ ΔO⋈L_old ∪ O⋈ΔL      (disjoint union)
    // lets the refresh compute only the two delta joins and merge their
    // aggregate partials into the MV — never re-joining history against
    // history. Deltas are ~1% batches, hence broadcast: each refresh is
    // two broadcast joins over a bucketed history scan at 100 TB. The
    // DuckDB oracle is the NAIVE full join+agg — hash equality is the
    // differential proof that the delta algebra and the decimal partial
    // merge are exact.
    QueryDef("q66_join_ivm",
      (s, d) => {
        val dec = "decimal(12,2)"
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
        val l = Tables.lineitem(s, d).select(col("l_orderkey"),
          (col("l_extendedprice").cast(dec) * (ONE - col("l_discount")).cast(dec))
            .as("rev"))
        val isNewO = pmod(col("o_orderkey"), lit(97)) === 0
        val isNewL = pmod(col("l_orderkey"), lit(89)) === 0
        def partials(os: DataFrame, ls: DataFrame) =
          os.join(ls, col("o_orderkey") === col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(count(ONE).as("n"), sum(col("rev")).as("sv"))
        val mvOld  = partials(o.filter(!isNewO), l.filter(!isNewL))
        val deltaO = partials(broadcast(o.filter(isNewO)), l.filter(!isNewL))
        val deltaL = partials(o, broadcast(l.filter(isNewL)))
        mvOld.unionAll(deltaO).unionAll(deltaL)
          .groupBy("o_orderpriority")
          .agg(sum(col("n")).as("n_items"),
            sum(col("sv")).cast("double").as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some(s"""
        SELECT o_orderpriority, count(*) AS n_items,
               ${Sql.oDsumProd("l_extendedprice", "1 - l_discount")} AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------------
    // Bloom-filter membership audit: Spark's runtime-filter bloom
    // machinery (BloomFilterAggregate / BloomFilterMightContain — the
    // expressions InjectRuntimeFilter plans for join pre-filtering)
    // surfaced as user functions via graft's registry. Build the ~KB
    // sketch ONCE over the even-custkey "membership list" and probe the
    // whole events table against the broadcast sketch — the shape of a
    // 100 TB pre-join filter or a tombstone/purge pre-check (q45's exact
    // anti join, pre-screened for ~1% of the scan cost). The oracle pins
    // the bloom CONTRACT: exact member counts, zero false negatives
    // (every true member flagged — guaranteed by construction), and a
    // false-positive rate under the sizing bound (10k items / 100k bits
    // => ~1.6% expected; deterministic, fixed-seed hashing).
    QueryDef("q67_bloom_audit",
      (s, d) => {
        Ns.registerFast(s)
        // might_contain requires the sketch as a scalar subquery (or a
        // literal) — the exact shape InjectRuntimeFilter plans, so the
        // SQL front-end is the natural spelling here.
        Tables.customer(s, d)
          .filter(pmod(col("c_custkey"), lit(2)) === 0).select("c_custkey")
          .createOrReplaceTempView("g_bloom_members")
        Tables.events(s, d).select("user_id").createOrReplaceTempView("g_bloom_events")
        s.sql("""
          WITH probes AS (
            SELECT user_id,
                   graft_bloom_might_contain(
                     (SELECT graft_bloom_agg(xxhash64(c_custkey), 10000L, 100000L)
                      FROM g_bloom_members),
                     xxhash64(user_id)) AS flagged,
                   user_id IN (SELECT c_custkey FROM g_bloom_members) AS is_member
            FROM (SELECT DISTINCT user_id FROM g_bloom_events))
          SELECT count(*) AS n_probes,
                 CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true_members,
                 sum(CASE WHEN is_member AND NOT flagged THEN 1 ELSE 0 END) = 0
                   AS no_false_negatives,
                 sum(CASE WHEN NOT is_member AND flagged THEN 1 ELSE 0 END) <=
                   greatest(sum(CASE WHEN NOT is_member THEN 1 ELSE 0 END) * 0.05, 1.0)
                   AS fp_rate_in_bounds
          FROM probes""")
      },
      Some("""
        WITH m AS (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0),
        p AS (SELECT DISTINCT user_id FROM events)
        SELECT count(*) AS n_probes,
               CAST(sum(CASE WHEN user_id IN (SELECT c_custkey FROM m)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_true_members,
               TRUE AS no_false_negatives,
               TRUE AS fp_rate_in_bounds
        FROM p""")),

    // -------------------------------------------------------------------
    // Data-quality constraint audit — the dbt-test / Deequ shape: one
    // pass per constraint family, each emitted as (check, n_violations,
    // passed). Uniqueness = two-phase count per key (no row explosion),
    // referential integrity = anti-join orphan count, range / not-null =
    // partial-aggregable conditional counts. At 100 TB each check stays
    // a single narrow aggregate over the fact table, and the union is
    // checks-sized (constant rows). The audit reports BOTH outcomes on
    // this fixture: orders' PK and the four lineitem value checks pass,
    // while lineitem's nominal (orderkey, linenumber) PK genuinely FAILS
    // (the synthetic generator draws linenumber randomly) — the firing
    // check's exact violation count is oracle-pinned, which is precisely
    // what a nightly audit must get right.
    QueryDef("q68_dq_audit",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        def check(name: String, violations: DataFrame) = violations
          .select(lit(name).as("check"),
            col("n").cast("long").as("n_violations"),
            (col("n") === 0).as("passed"))
        def dupCheck(name: String, df: DataFrame, keys: Seq[String]) =
          check(name,
            df.groupBy(keys.map(col): _*).agg(count(ONE).as("c"))
              .agg(sum(when(col("c") > 1, col("c"))).as("sn"))
              .select(coalesce(col("sn"), lit(0L)).as("n")))
        val ordersPk = dupCheck("orders_pk_unique", o, Seq("o_orderkey"))
        val liPk = dupCheck("lineitem_pk_unique", li,
          Seq("l_orderkey", "l_linenumber"))
        val orphans = check("lineitem_orderkey_fk",
          li.select("l_orderkey")
            .join(o.select("o_orderkey"),
              col("l_orderkey") === col("o_orderkey"), "left_anti")
            .agg(count(ONE).as("n")))
        val qtyRange = check("quantity_in_1_50",
          li.agg(sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)).as("n")))
        val discRange = check("discount_in_0_0_1",
          li.agg(sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
            .otherwise(0L)).as("n")))
        val notNull = check("shipdate_not_null",
          li.agg(sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("n")))
        ordersPk.unionAll(liPk).unionAll(orphans).unionAll(qtyRange)
          .unionAll(discRange).unionAll(notNull)
          .orderBy("check")
      },
      Some("""
        WITH checks AS (
          SELECT 'orders_pk_unique' AS check,
                 CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
                   AS n_violations
          FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
          UNION ALL
          SELECT 'lineitem_pk_unique',
                 CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT)
          FROM (SELECT count(*) AS c FROM lineitem
                GROUP BY l_orderkey, l_linenumber)
          UNION ALL
          SELECT 'lineitem_orderkey_fk',
                 CAST(count(*) AS BIGINT)
          FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
          UNION ALL
          SELECT 'quantity_in_1_50',
                 CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                               THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'discount_in_0_0_1',
                 CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                               THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'shipdate_not_null',
                 CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          FROM lineitem)
        SELECT "check", n_violations, n_violations = 0 AS passed
        FROM checks
        ORDER BY "check"""")),

    // -------------------------------------------------------------------
    // Per-user EWMA (alpha = 1/2) of event values in event-time order —
    // the exponential smoothing a metrics pipeline keeps per entity.
    // An EWMA is inherently a SEQUENTIAL fold per key (each step needs
    // the previous accumulator), so the correct distribution is
    // parallel-across-users, ordered-fold-within-user: one shuffle to
    // the user key, collect the (us, event_id, value) sequence sorted,
    // fold with `aggregate` — the same left-to-right IEEE operation
    // sequence DuckDB's list_reduce performs, hence bit-identical
    // results with NO rounding crutch (the Ns.dot/oDot recipe applied
    // to a recurrence). alpha = 1/2 keeps every multiply an exact
    // halving. State per user is its event list — bounded by per-entity
    // history, the same bound st11/st12 carry; the incremental
    // production form is a v2 ValueState processor holding one double.
    QueryDef("q78_ewma",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            col("value"))
        ev.groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("us"), col("event_id"), col("value"))))
            .as("seq"))
          .select(col("user_id"),
            size(col("seq")).cast("long").as("n_events"),
            expr("""aggregate(slice(seq, 2, size(seq) - 1), seq[0].value,
                              (acc, x) -> 0.5 * acc + 0.5 * x.value)""").as("ewma"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id,
                 list(value ORDER BY epoch_us(ts), event_id) AS vals,
                 count(*) AS n
          FROM events GROUP BY user_id)
        SELECT user_id, CAST(n AS BIGINT) AS n_events,
               list_reduce(vals, (acc, x) -> 0.5 * acc + 0.5 * x) AS ewma
        FROM e
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Bivariate statistics per group: Pearson correlation, sample
    // covariance, and the least-squares regression line of price on
    // quantity. Built-in corr()/covar_samp() accumulate doubles in
    // partition order — non-deterministic across partitionings and
    // engines — so each statistic is instead a CLOSED FORM over the six
    // exact decimal sufficient statistics (n, Sx, Sy, Sxx, Syy, Sxy):
    // one partial-aggregable pass computes the sums exactly, then the
    // identical IEEE double formula runs on both engines. This is also
    // the scale shape: sufficient statistics are the mergeable state
    // (6 numbers/group), the formula is a final-projection cost.
    QueryDef("q79_corr_regression",
      (s, d) => {
        val g = Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(count(ONE).cast("double").as("n"),
            Sql.dsum(col("l_quantity")).as("sx"),
            Sql.dsum(col("l_extendedprice")).as("sy"),
            Sql.dsumProd(col("l_quantity"), col("l_quantity")).as("sxx"),
            Sql.dsumProd(col("l_extendedprice"), col("l_extendedprice")).as("syy"),
            Sql.dsumProd(col("l_quantity"), col("l_extendedprice")).as("sxy"))
        val covN = col("n") * col("sxy") - col("sx") * col("sy")
        val varX = col("n") * col("sxx") - col("sx") * col("sx")
        val varY = col("n") * col("syy") - col("sy") * col("sy")
        val slope = covN / varX
        g.select(col("l_returnflag"), col("n").cast("long").as("n"),
            round(covN / (sqrt(varX) * sqrt(varY)), 6).as("corr_qty_price"),
            round((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1), 6)
              .as("covar_samp"),
            round(slope, 6).as("slope"),
            round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"),
            round(covN * covN / (varX * varY), 6).as("r2"))
          .orderBy("l_returnflag")
      },
      Some(s"""
        WITH g AS (
          SELECT l_returnflag,
                 CAST(count(*) AS DOUBLE) AS n,
                 ${Sql.oDsum("l_quantity")} AS sx,
                 ${Sql.oDsum("l_extendedprice")} AS sy,
                 ${Sql.oDsumProd("l_quantity", "l_quantity")} AS sxx,
                 ${Sql.oDsumProd("l_extendedprice", "l_extendedprice")} AS syy,
                 ${Sql.oDsumProd("l_quantity", "l_extendedprice")} AS sxy
          FROM lineitem GROUP BY 1)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n,
               round((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
               round((sxy - sx * sy / n) / (n - 1), 6) AS covar_samp,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
               round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
               round((n * sxy - sx * sy) * (n * sxy - sx * sy) / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        FROM g
        ORDER BY l_returnflag""")),

    // -------------------------------------------------------------------
    // Market-basket association rules over order contents: part pairs
    // that co-occur in the same order, with support, confidence and
    // lift — the Apriori shape. Scale is governed by PRUNING BEFORE
    // PAIRING: items below minimum support are dropped before the
    // per-order self-join (the Apriori monotonicity argument — an
    // infrequent item cannot be in a frequent pair), which bounds the
    // quadratic step to frequent items only. The pair join is an
    // equi-shuffle on orderkey; supports re-attach as broadcast maps;
    // all ratios are single IEEE divisions of exact integer counts, so
    // no rounding crutch is needed for the hash compare — round(6) is
    // display-only. (lift > 1 means the pair co-occurs more often than
    // independent purchase would predict.)
    QueryDef("q80_market_basket",
      (s, d) => {
        // items feeds three consumers (support counts, the pair join's
        // two sides, the order total) — checkpoint the distinct once
        // instead of re-scanning lineitem per consumer
        val items = Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey").distinct().localCheckpoint()
        val sup = items.groupBy("l_partkey").agg(count(ONE).as("cnt"))
        val freq = sup.filter(col("cnt") >= 3)
        val nOrders = items.select(countDistinct(col("l_orderkey")).as("n_orders"))
        val fitems = items.join(broadcast(freq), Seq("l_partkey"))
          .select("l_orderkey", "l_partkey")
        val a = fitems.select(col("l_orderkey").as("ok"), col("l_partkey").as("part_a"))
        val b = fitems.select(col("l_orderkey").as("ok"), col("l_partkey").as("part_b"))
        val pairs = a.join(b, Seq("ok")).filter(col("part_a") < col("part_b"))
          .groupBy("part_a", "part_b").agg(count(ONE).as("pair_cnt"))
          .filter(col("pair_cnt") >= 2)
        pairs
          .join(broadcast(freq.select(col("l_partkey").as("part_a"), col("cnt").as("cnt_a"))),
            Seq("part_a"))
          .join(broadcast(freq.select(col("l_partkey").as("part_b"), col("cnt").as("cnt_b"))),
            Seq("part_b"))
          .crossJoin(broadcast(nOrders))
          .select(col("part_a"), col("part_b"), col("pair_cnt"),
            round(col("pair_cnt").cast("double") / col("cnt_a").cast("double"), 6)
              .as("confidence"),
            round(col("pair_cnt").cast("double") * col("n_orders").cast("double") /
              (col("cnt_a").cast("double") * col("cnt_b").cast("double")), 6).as("lift"))
          .orderBy(col("lift").desc, col("pair_cnt").desc, col("part_a"), col("part_b"))
          .limit(50)
      },
      Some("""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        sup AS (SELECT l_partkey, count(*) AS cnt FROM items GROUP BY 1),
        freq AS (SELECT * FROM sup WHERE cnt >= 3),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
        fitems AS (SELECT l_orderkey, i.l_partkey FROM items i JOIN freq f USING (l_partkey)),
        pairs AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS pair_cnt
          FROM fitems a JOIN fitems b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING count(*) >= 2)
        SELECT part_a, part_b, pair_cnt,
               round(CAST(pair_cnt AS DOUBLE) / CAST(fa.cnt AS DOUBLE), 6) AS confidence,
               round(CAST(pair_cnt AS DOUBLE) * CAST(n_orders AS DOUBLE) /
                     (CAST(fa.cnt AS DOUBLE) * CAST(fb.cnt AS DOUBLE)), 6) AS lift
        FROM pairs
        JOIN freq fa ON part_a = fa.l_partkey
        JOIN freq fb ON part_b = fb.l_partkey
        CROSS JOIN n
        ORDER BY lift DESC, pair_cnt DESC, part_a, part_b
        LIMIT 50""")),

    // -------------------------------------------------------------------
    // Rolling 7-day exact median of daily revenue per order priority —
    // an aggregate function (percentile) used as a WINDOW function over
    // a bounded ROWS frame, the time-series smoothing shape a metrics
    // dashboard runs. Daily revenue is an exact decimal sum cast to
    // double, and both engines define the 0.5-quantile by the same
    // linear interpolation on the sorted 7-row frame (q17 proved the
    // point-statistic parity), so the medians are bit-identical with no
    // rounding. Scale: the frame is bounded (7 rows/key) and the input
    // is the already-aggregated daily table — days x priorities rows,
    // not orders.
    QueryDef("q81_rolling_median",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(col("o_orderpriority"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(count(ONE).as("n_orders"), Sql.dsum(col("o_totalprice")).as("daily_rev"))
        val w = Window.partitionBy("o_orderpriority").orderBy("day")
          .rowsBetween(-6, Window.currentRow)
        daily
          .withColumn("median_7d", percentile(col("daily_rev"), lit(0.5)).over(w))
          .orderBy("o_orderpriority", "day")
      },
      Some(s"""
        WITH daily AS (
          SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS day,
                 count(*) AS n_orders, ${Sql.oDsum("o_totalprice")} AS daily_rev
          FROM orders GROUP BY 1, 2)
        SELECT o_orderpriority, day, CAST(n_orders AS BIGINT) AS n_orders, daily_rev,
               quantile_cont(daily_rev, 0.5) OVER
                 (PARTITION BY o_orderpriority ORDER BY day
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS median_7d
        FROM daily
        ORDER BY o_orderpriority, day""")),

    // -------------------------------------------------------------------
    // Gaps-and-islands: per-user consecutive-day activity streaks (the
    // classic day - row_number() grouping), reduced to streak stats plus
    // the start of the longest streak — product-analytics retention
    // material q33 does not cover. Everything is integer arithmetic on
    // epoch days, so the result is exact; the longest-streak tie breaks
    // deterministically to the earliest start via an explicit
    // row_number. Scale: one shuffle to the user key; islands form
    // inside each partition's sort, and only per-streak rows (bounded by
    // active days) survive the first aggregate.
    QueryDef("q82_activity_streaks",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val wDay = Window.partitionBy("user_id").orderBy("day")
        val streaks = days
          .withColumn("grp", col("day") - row_number().over(wDay))
          .groupBy("user_id", "grp")
          .agg(count(ONE).as("len"), min(col("day")).as("start_day"))
        val wBest = Window.partitionBy("user_id")
          .orderBy(col("len").desc, col("start_day"))
        val ranked = streaks.withColumn("rn", row_number().over(wBest))
        val agg = streaks.groupBy("user_id")
          .agg(sum(col("len")).as("n_active_days"), count(ONE).as("n_streaks"),
            max(col("len")).as("max_streak_days"))
        agg.join(ranked.filter(col("rn") === 1)
            .select(col("user_id"), col("start_day").as("best_start_day")),
          Seq("user_id"))
          .orderBy("user_id")
      },
      Some("""
        WITH days AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        isl AS (
          SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
          FROM days),
        streaks AS (
          SELECT user_id, grp, count(*) AS len, min(day) AS start_day
          FROM isl GROUP BY 1, 2),
        ranked AS (
          SELECT user_id, start_day,
                 row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_day) AS rn
          FROM streaks),
        agg AS (
          SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
                 count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak_days
          FROM streaks GROUP BY 1)
        SELECT a.user_id, n_active_days, n_streaks, max_streak_days,
               r.start_day AS best_start_day
        FROM agg a JOIN ranked r ON a.user_id = r.user_id AND r.rn = 1
        ORDER BY a.user_id""")),

    // -------------------------------------------------------------------
    // 2-D skyline (Pareto frontier; Börzsönyi et al. ICDE'01): orders
    // not dominated on (maximize o_totalprice, minimize o_orderdate) —
    // "no other order is at least as expensive AND at least as old with
    // one strict". The naive NOT EXISTS is an O(n^2) inequality join,
    // and the textbook one-window form (running min over a GLOBAL price
    // sort) plans a single-partition Window over |distinct prices| —
    // both scale killers. Instead the suffix-min decomposes over fixed-
    // width price bands: (1) per-price min dates (the only full-width
    // shuffle); (2) per-BAND running min windows, partitioned by band —
    // fully parallel; (3) a band-level suffix-min whose single-partition
    // window is bounded by the band COUNT (price range / 10k, ~60 rows
    // at any data size), broadcast back. A price survives iff its date
    // beats both the higher prices of its own band and every higher
    // band's min. All comparisons are exact DECIMAL/DATE, so the
    // frontier set is engine- and partitioning-exact. Round5OpsSpec
    // brute-forces the dominance definition against this plan.
    QueryDef("q86_skyline",
      (s, d) => {
        val pp = Tables.orders(s, d)
          .groupBy(col("o_totalprice").as("p")).agg(min("o_orderdate").as("md"))
          .withColumn("band", expr("CAST(floor(p / 10000) AS BIGINT)"))
        // bounded: one row per price BAND (~60 bands), never lineitem-sized
        val wBand = Window.orderBy(col("band").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val bandSuffix = pp.groupBy("band").agg(min("md").as("bmd"))
          .withColumn("higher_bmd", min("bmd").over(wBand))
          .select("band", "higher_bmd")
        val wIn = Window.partitionBy("band").orderBy(col("p").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = pp.join(broadcast(bandSuffix), "band")
          .withColumn("in_md", min("md").over(wIn))
          .withColumn("dom_md", expr(
            """CASE WHEN in_md IS NULL THEN higher_bmd
                    WHEN higher_bmd IS NULL THEN in_md
                    WHEN in_md < higher_bmd THEN in_md ELSE higher_bmd END"""))
          .filter(col("dom_md").isNull || col("md") < col("dom_md"))
        Tables.orders(s, d)
          .join(frontier,
            col("o_totalprice") === col("p") && col("o_orderdate") === col("md"))
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      },
      Some("""
        WITH pp AS (
          SELECT o_totalprice AS p, min(o_orderdate) AS md,
                 CAST(floor(o_totalprice / 10000) AS BIGINT) AS band
          FROM orders GROUP BY 1, 3),
        bs AS (
          SELECT band,
                 min(min(md)) OVER (ORDER BY band DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS higher_bmd
          FROM pp GROUP BY band),
        r AS (
          SELECT p, md, higher_bmd,
                 min(md) OVER (PARTITION BY pp.band ORDER BY p DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS in_md
          FROM pp JOIN bs ON pp.band = bs.band),
        frontier AS (
          SELECT p, md FROM (
            SELECT p, md,
                   CASE WHEN in_md IS NULL THEN higher_bmd
                        WHEN higher_bmd IS NULL THEN in_md
                        WHEN in_md < higher_bmd THEN in_md ELSE higher_bmd END AS dom_md
            FROM r)
          WHERE dom_md IS NULL OR md < dom_md)
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders JOIN frontier ON o_totalprice = p AND o_orderdate = md
        ORDER BY o_totalprice DESC, o_orderkey"""))
  ) ++ variantDefs

  /** Spark-4 VariantType over semi-structured events — see q83. */
  private[operators] def variantDefs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------------
    // Semi-structured access through Spark 4's VARIANT type: a nested
    // JSON document (built from the flat props on both engines with the
    // same string concat, so the inputs are byte-identical) is parsed
    // ONCE to the binary variant encoding, then fields come out of
    // typed variant_get paths — nested object, array index, top-level
    // int — plus a missing-path probe via try_variant_get. This is the
    // modern replacement for per-field get_json_object re-parsing
    // (q13): at 100 TB the parse cost is paid once per row, not once
    // per extracted field, and the binary encoding is columnar-friendly.
    // The DuckDB oracle runs the same paths through its JSON type.
    QueryDef("q83_variant",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          concat(lit("{\"k\":"), get_json_object(col("props"), "$.k"),
            lit(",\"nest\":{\"neg\":-"), get_json_object(col("props"), "$.k"),
            lit("},\"tags\":[\"t"), expr("CAST(get_json_object(props, '$.k') AS BIGINT) % 3"),
            lit("\"]}")).as("j"))
        .select(col("event_type"), expr("parse_json(j)").as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("variant_get(v, '$.nest.neg', 'long')").as("neg"),
          expr("variant_get(v, '$.tags[0]', 'string')").as("tag"),
          expr("try_variant_get(v, '$.absent', 'long')").as("missing"))
        .groupBy("event_type")
        .agg(count(ONE).as("n"), sum(col("k")).as("sum_k"),
          sum(col("neg")).as("sum_neg"), min(col("tag")).as("min_tag"),
          sum(when(col("missing").isNull, 1L).otherwise(0L)).as("n_missing"))
        .orderBy("event_type"),
      Some("""
        WITH j AS (
          SELECT event_type,
                 '{"k":' || (props->>'k') || ',"nest":{"neg":-' || (props->>'k')
                   || '},"tags":["t' || (CAST(props->>'k' AS BIGINT) % 3) || '"]}' AS doc
          FROM events)
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(doc->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(sum(CAST(doc->>'$.nest.neg' AS BIGINT)) AS BIGINT) AS sum_neg,
               min(doc->>'$.tags[0]') AS min_tag,
               CAST(sum(CASE WHEN doc->>'$.absent' IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        FROM j
        GROUP BY event_type
        ORDER BY event_type""")),

    // -------------------------------------------------------------------
    // KMV (k-minimum-values / theta-sketch bottom-k) distinct counting
    // with SKETCH-LEVEL union merge — the third sketch family next to
    // q64 (HLL) and t13 (count-min), and unlike q64's opaque binary
    // state this one is cross-engine bit-identical: the sketch is the k
    // smallest 52-bit md5-derived hashes (Ns.hash52 — exactly double-
    // representable), theta = kth/2^52, estimate = (k-1)/theta, i.e.
    // one exact-int-to-double conversion and ONE IEEE division in both
    // engines. Per-priority estimates come from per-group sketches; the
    // ALL row is computed by MERGING the five sketches (k smallest of
    // their union — never re-scanning base data), which is the property
    // that lets 1000 executors sketch independently and combine. A
    // group whose sketch is not full (n < k) reports its exact count,
    // the standard KMV small-cardinality branch — sf0.001 exercises it,
    // sf0.01+ exercises the estimator branch. The global window on the
    // union ranks at most |groups|*k = 1280 rows regardless of corpus
    // size (the whole point of a sketch), so the single-partition sort
    // is bounded, not a scale hazard.
    QueryDef("q84_kmv_sketch",
      (s, d) => {
        val k = 256
        val kthNum = 255L * 4503599627370496L // (k-1) * 2^52, exact
        val base = Tables.orders(s, d)
          .select(col("o_orderpriority").as("grp"), col("o_custkey")).distinct()
        val hashed = base
          .withColumn("h", expr(Ns.hash52("CAST(o_custkey AS STRING)")))
          .select("grp", "h").distinct()
        val sk = hashed
          .withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("h")))
          .filter(col("rn") <= k).select("grp", "h")
        def estimate(nSketch: Column, kth: Column): Column =
          round(when(nSketch < k, nSketch.cast("double"))
            .otherwise(lit(kthNum).cast("double") / kth.cast("double")), 4)
        val perGroup = base.groupBy("grp").agg(count(ONE).as("n_exact"))
          .join(sk.groupBy("grp")
            .agg(count(ONE).as("n_sketch"), max("h").as("kth")), "grp")
        val union = sk.select("h").distinct()
          // bounded: the union sketch ranks at most |groups|*k = 1280 rows
          .withColumn("rn", row_number().over(Window.orderBy("h")))
          .filter(col("rn") <= k)
          .agg(count(ONE).as("n_sketch"), max("h").as("kth"))
        val unionExact = base.select("o_custkey").distinct().agg(count(ONE).as("n_exact"))
        perGroup.unionByName(
            unionExact.crossJoin(union).withColumn("grp", lit("ALL")))
          .select(col("grp"), col("n_exact"), col("n_sketch"),
            estimate(col("n_sketch"), col("kth")).as("est_distinct"))
          .orderBy("grp")
      },
      Some(s"""
        WITH base AS (SELECT DISTINCT o_orderpriority AS grp, o_custkey FROM orders),
        h AS (SELECT DISTINCT grp, ${Ns.oHash52("CAST(o_custkey AS VARCHAR)")} AS h FROM base),
        r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn FROM h),
        sk AS (SELECT grp, h FROM r WHERE rn <= 256),
        per AS (SELECT grp, count(*) AS n_sketch, max(h) AS kth FROM sk GROUP BY grp),
        ex AS (SELECT grp, count(*) AS n_exact FROM base GROUP BY grp),
        uh AS (SELECT DISTINCT h FROM sk),
        ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM uh),
        us AS (SELECT count(*) AS n_sketch, max(h) AS kth FROM ur WHERE rn <= 256),
        ue AS (SELECT count(DISTINCT o_custkey) AS n_exact FROM orders),
        allrows AS (
          SELECT grp, n_exact, n_sketch, kth FROM ex JOIN per USING (grp)
          UNION ALL
          SELECT 'ALL' AS grp, ue.n_exact, us.n_sketch, us.kth FROM ue CROSS JOIN us)
        SELECT grp, CAST(n_exact AS BIGINT) AS n_exact,
               CAST(n_sketch AS BIGINT) AS n_sketch,
               round(CASE WHEN n_sketch < 256 THEN CAST(n_sketch AS DOUBLE)
                          ELSE CAST(1148417904979476480 AS DOUBLE) / CAST(kth AS DOUBLE) END,
                     4) AS est_distinct
        FROM allrows ORDER BY grp""")),

    // -------------------------------------------------------------------
    // KMV sketch INTERSECTION: join-cardinality estimation (the
    // optimizer / capacity-planning use of q84's sketches — Beyer et
    // al. SIGMOD'07). |A ∩ B| between the ordering custkeys (A) and
    // each market segment's custkeys (B_g) is estimated WITHOUT joining
    // the base tables: per side, keep the k smallest 52-bit hashes;
    // union-merge to the k smallest of S_A ∪ S_B_g (theta = kth/2^52);
    // then J_est = |{h in S_U : h in S_A and h in S_B_g}| / |S_U| and
    // |A ∩ B_g| ~= J_est * (k-1)/theta. When the union sketch is not
    // full it holds EVERY key of A ∪ B_g, so n_both IS the exact
    // intersection — the small-cardinality branch sf0.001/sf0.01
    // exercise (the estimator branch needs |A ∪ B_g| > k). Everything
    // shuffled is k-bounded; the only base-data passes are the two
    // distinct scans — the shape that lets two 100 TB fact tables
    // estimate their join size from kilobyte sketches. n_exact (the
    // semi-join ground truth, one narrow shuffle) rides along so the
    // oracle pins estimate AND truth.
    QueryDef("q85_kmv_join_est",
      (s, d) => {
        val k = 256
        val kthNum = 255L * 4503599627370496L // (k-1) * 2^52, exact
        val aKeys = Tables.orders(s, d).select(col("o_custkey")).distinct()
        // bottom-k of the hashed key set = a distributed top-k
        // (TakeOrderedAndProject), never a global rank window: only the
        // k smallest VALUES matter, so sort+limit is value-identical
        val aSk = aKeys
          .withColumn("h", expr(Ns.hash52("CAST(o_custkey AS STRING)")))
          .select("h").orderBy("h").limit(k)
        val bKeys = Tables.customer(s, d)
          .select(col("c_mktsegment").as("grp"), col("c_custkey"))
          // KMV sketches are over DISTINCT keys: without this dedup a
          // duplicated key would occupy several bottom-k slots and bias
          // kth/n_union low. A no-op on customer (c_custkey is the PK)
          // but load-bearing for any non-key input.
          .distinct()
        val bSk = bKeys
          .withColumn("h", expr(Ns.hash52("CAST(c_custkey AS STRING)")))
          .withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("h")))
          .filter(col("rn") <= k).select("grp", "h")
        val uSk = bSk.unionByName(
            bKeys.select("grp").distinct().crossJoin(aSk).select("grp", "h"))
          .distinct()
          .withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("h")))
          .filter(col("rn") <= k).select("grp", "h")
        val nBoth = uSk
          .join(aSk.select(col("h").as("ha")), col("h") === col("ha"), "left_semi")
          .join(bSk.select(col("grp").as("gb"), col("h").as("hb")),
            col("grp") === col("gb") && col("h") === col("hb"), "left_semi")
          .groupBy("grp").agg(count(ONE).as("n_both"))
        val stats = uSk.groupBy("grp").agg(count(ONE).as("n_union"), max("h").as("kth"))
        val exact = bKeys
          .join(aKeys, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("grp").agg(count(ONE).as("n_exact"))
        stats
          .join(nBoth, Seq("grp"), "left")
          .join(exact, Seq("grp"), "left")
          .select(col("grp"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            col("n_union"),
            coalesce(col("n_both"), lit(0L)).as("n_both"),
            round(when(col("n_union") < k, coalesce(col("n_both"), lit(0L)).cast("double"))
              .otherwise(coalesce(col("n_both"), lit(0L)).cast("double") / col("n_union").cast("double")
                * (lit(kthNum).cast("double") / col("kth").cast("double"))), 4)
              .as("est_intersect"))
          .orderBy("grp")
      },
      Some(s"""
        WITH a AS (SELECT DISTINCT o_custkey FROM orders),
        ask AS (
          SELECT h FROM (
            SELECT ${Ns.oHash52("CAST(o_custkey AS VARCHAR)")} AS h,
                   row_number() OVER (ORDER BY ${Ns.oHash52("CAST(o_custkey AS VARCHAR)")}) AS rn
            FROM a) WHERE rn <= 256),
        b AS (SELECT DISTINCT c_mktsegment AS grp, c_custkey FROM customer),
        bsk AS (
          SELECT grp, h FROM (
            SELECT grp, ${Ns.oHash52("CAST(c_custkey AS VARCHAR)")} AS h,
                   row_number() OVER (PARTITION BY grp
                     ORDER BY ${Ns.oHash52("CAST(c_custkey AS VARCHAR)")}) AS rn
            FROM b) WHERE rn <= 256),
        uall AS (
          SELECT DISTINCT grp, h FROM (
            SELECT grp, h FROM bsk
            UNION ALL
            SELECT g.grp, ask.h FROM (SELECT DISTINCT grp FROM b) g CROSS JOIN ask)),
        usk AS (
          SELECT grp, h FROM (
            SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM uall) WHERE rn <= 256),
        nboth AS (
          SELECT u.grp, count(*) AS n_both FROM usk u
          WHERE EXISTS (SELECT 1 FROM ask WHERE ask.h = u.h)
            AND EXISTS (SELECT 1 FROM bsk WHERE bsk.grp = u.grp AND bsk.h = u.h)
          GROUP BY u.grp),
        stats AS (SELECT grp, count(*) AS n_union, max(h) AS kth FROM usk GROUP BY grp),
        ex AS (
          SELECT grp, count(*) AS n_exact FROM b
          WHERE EXISTS (SELECT 1 FROM a WHERE a.o_custkey = b.c_custkey)
          GROUP BY grp)
        SELECT s.grp,
               CAST(coalesce(ex.n_exact, 0) AS BIGINT) AS n_exact,
               CAST(s.n_union AS BIGINT) AS n_union,
               CAST(coalesce(nboth.n_both, 0) AS BIGINT) AS n_both,
               round(CASE WHEN s.n_union < 256 THEN CAST(coalesce(nboth.n_both, 0) AS DOUBLE)
                          ELSE CAST(coalesce(nboth.n_both, 0) AS DOUBLE) / CAST(s.n_union AS DOUBLE)
                               * (CAST(1148417904979476480 AS DOUBLE) / CAST(s.kth AS DOUBLE)) END,
                     4) AS est_intersect
        FROM stats s
        LEFT JOIN nboth ON s.grp = nboth.grp
        LEFT JOIN ex ON s.grp = ex.grp
        ORDER BY s.grp""")),

    // -------------------------------------------------------------------
    // Count-Sketch heavy hitters (Charikar-Chen-Farach-Colton): the
    // UNBIASED sibling of t13's Count-Min — d=5 hash rows x w=16 signed
    // counters, cell_r(b) += sign_r(t)*count(t), est(t) = MEDIAN over r
    // of sign_r(t)*cell_r(b_r(t)). Where CMS only ever OVERcounts
    // (collisions add), Count-Sketch's random signs make collisions
    // cancel in expectation: the error is two-sided and centered — the
    // estimator a downstream mean/second-moment needs. d=5 (odd) makes
    // the median a single order statistic: both engines pick
    // sorted[2] — pure integer, no interpolation. The sketch is d*w =
    // 80 mergeable counters (cell-wise ADD across shards, like CMS);
    // w=16 < |fixture vocab| forces real collisions at every scale, so
    // the oracle pins actual signed errors — including UNDERestimates,
    // which CMS can never produce. Scoring joins 16-row broadcast
    // cell tables; top-20 rides TakeOrderedAndProject.
    QueryDef("q87_count_sketch",
      (s, d) => {
        val D = 5; val W = 16
        val bucketSign = expr(s"""transform(sequence(0, ${D - 1}),
          r -> struct(r AS r,
            ${Ns.hash32("concat('csb', CAST(r AS STRING), ':', token)")} % $W AS b,
            (${Ns.hash32("concat('css', CAST(r AS STRING), ':', token)")} % 2) * 2 - 1 AS sg))""")
        val counts = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(col("token") =!= "")
          .groupBy("token").agg(count(ONE).as("c"))
        val buckets = counts.select(col("token"), col("c"), explode(bucketSign).as("x"))
          .select(col("token"), col("c"), col("x.r"), col("x.b"), col("x.sg"))
        val cells = buckets.groupBy("r", "b").agg(sum(col("sg") * col("c")).as("cell"))
        val top = counts.orderBy(col("c").desc, col("token")).limit(20)
        top.select(col("token"), col("c"), explode(bucketSign).as("x"))
          .select(col("token"), col("c"), col("x.r"), col("x.b"), col("x.sg"))
          .join(broadcast(cells), Seq("r", "b"))
          .groupBy("token", "c")
          .agg(expr("element_at(sort_array(collect_list(sg * cell)), 3)").as("cs_est"))
          .select(col("token"), col("c").as("exact"), col("cs_est"),
            (col("cs_est") - col("c")).as("err"))
          .orderBy(col("exact").desc, col("token"))
      },
      Some(s"""
        WITH toks AS (
          SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        counts AS (
          SELECT token, count(*) AS c FROM toks WHERE token <> '' GROUP BY token),
        buckets AS (
          SELECT token, c, r,
                 ${Ns.oHash32("'csb' || CAST(r AS VARCHAR) || ':' || token")} % 16 AS b,
                 (${Ns.oHash32("'css' || CAST(r AS VARCHAR) || ':' || token")} % 2) * 2 - 1 AS sg
          FROM counts CROSS JOIN generate_series(0, 4) t(r)),
        cells AS (
          SELECT r, b, CAST(sum(sg * c) AS BIGINT) AS cell
          FROM buckets GROUP BY r, b),
        top AS (
          SELECT token, c FROM counts ORDER BY c DESC, token LIMIT 20),
        scored AS (
          SELECT t.token, t.c, list_sort(list(bk.sg * ce.cell))[3] AS cs_est
          FROM top t
          JOIN buckets bk ON bk.token = t.token
          JOIN cells ce ON ce.r = bk.r AND ce.b = bk.b
          GROUP BY t.token, t.c)
        SELECT token, c AS exact, cs_est, cs_est - c AS err
        FROM scored
        ORDER BY exact DESC, token""")),

    // -------------------------------------------------------------------
    // Bitemporal as-of query (Snodgrass): every event is a CORRECTION to
    // the user's value, effective from valid time = ts but only KNOWN
    // from transaction time tx = ts + a deterministic ingest delay of up
    // to 5 days (md5(event_id)-derived — late-arriving data, modeled, not
    // random). The query reconstructs "what did we BELIEVE at T1 the
    // value was at valid instant V" vs the same question asked at T2, and
    // flags users whose history was REWRITTEN in between — the
    // restatement audit (finance close, GDPR re-ingest) that uni-temporal
    // SCD2 (q26) / PIT (q60) cannot answer, because they keep only one
    // time axis. Both snapshots are one ranked pick over the same
    // user-partitioned sort; n_late counts the rewriting rows. Scale:
    // two windows + one join, all shuffled once by user_id.
    QueryDef("q90_bitemporal",
      (s, d) => {
        // valid instant V = Jan 15, snapshots T1 = Jan 18, T2 = Jan 28
        val V = 1705276800000000L; val T1 = 1705536000000000L; val T2 = 1706400000000000L
        val base = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("valid_us"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"))
          .withColumn("tx_us",
            col("valid_us") + expr(s"(${Ns.hash32("CAST(event_id AS STRING)")} % 432000) * 1000000"))
        def snapshot(tx: Long, alias: String) = {
          val w = Window.partitionBy("user_id")
            .orderBy(col("valid_us").desc, col("event_id").desc)
          base.filter(col("valid_us") <= V && col("tx_us") <= tx)
            .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .select(col("user_id"), col("v6").as(alias))
        }
        val late = base
          .filter(col("valid_us") <= V && col("tx_us") > T1 && col("tx_us") <= T2)
          .groupBy("user_id").agg(count(ONE).as("n_late"))
        snapshot(T1, "v1_6").join(snapshot(T2, "v2_6"), Seq("user_id"))
          .join(late, Seq("user_id"), "left")
          .select(col("user_id"), col("v1_6"), col("v2_6"),
            (col("v1_6") =!= col("v2_6")).as("restated"),
            coalesce(col("n_late"), lit(0L)).as("n_late"),
            (col("v1_6").cast("double") / lit(1000000.0)).as("v_at_t1"),
            (col("v2_6").cast("double") / lit(1000000.0)).as("v_at_t2"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH base AS (
          SELECT user_id, event_id, epoch_us(ts) AS valid_us,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6,
                 epoch_us(ts) + (${Ns.oHash32("CAST(event_id AS VARCHAR)")} % 432000) * 1000000 AS tx_us
          FROM events),
        s1 AS (
          SELECT user_id, v6 AS v1_6 FROM (
            SELECT user_id, v6, row_number() OVER (PARTITION BY user_id
              ORDER BY valid_us DESC, event_id DESC) AS rn
            FROM base WHERE valid_us <= 1705276800000000 AND tx_us <= 1705536000000000)
          WHERE rn = 1),
        s2 AS (
          SELECT user_id, v6 AS v2_6 FROM (
            SELECT user_id, v6, row_number() OVER (PARTITION BY user_id
              ORDER BY valid_us DESC, event_id DESC) AS rn
            FROM base WHERE valid_us <= 1705276800000000 AND tx_us <= 1706400000000000)
          WHERE rn = 1),
        late AS (
          SELECT user_id, count(*) AS n_late FROM base
          WHERE valid_us <= 1705276800000000
            AND tx_us > 1705536000000000 AND tx_us <= 1706400000000000
          GROUP BY user_id)
        SELECT s1.user_id, v1_6, v2_6,
               v1_6 <> v2_6 AS restated,
               coalesce(late.n_late, 0) AS n_late,
               CAST(v1_6 AS DOUBLE) / 1000000.0 AS v_at_t1,
               CAST(v2_6 AS DOUBLE) / 1000000.0 AS v_at_t2
        FROM s1 JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN late ON s1.user_id = late.user_id
        ORDER BY s1.user_id""")),

    // -------------------------------------------------------------------
    // Last-touch marketing attribution: each purchase is credited to the
    // user's most recent click/view STRICTLY before it and within a 24h
    // lookback; the touch's props.k is the campaign. One
    // strictly-preceding last_value(...IGNORE NULLS) window per touch
    // field (same frame + same CASE -> all three fields come from the
    // SAME last matching row), then a small groupBy — the q32-funnel
    // sibling that answers WHO GETS CREDIT rather than where users drop
    // off. Out-of-window / touchless purchases land in the 'none'
    // bucket, so revenue is partitioned exactly (sum over rows = all
    // purchase revenue, oracle-pinned). Revenue is exact micro-unit
    // BIGINT. Scale: one shuffle by user_id for the windows, then a
    // tiny aggregate; no joins at all.
    QueryDef("q91_attribution",
      (s, d) => {
        val LOOK = 86400000000L
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        def lastTouch(field: Column, name: String) =
          last(when(col("event_type").isin("click", "view"), field),
            ignoreNulls = true).over(w).as(name)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"),
            expr("CAST(get_json_object(props, '$.k') AS BIGINT)").as("k"))
          .select(col("*"),
            lastTouch(col("us"), "t_us"),
            lastTouch(col("event_type"), "t_type"),
            lastTouch(col("k"), "t_k"))
          .filter(col("event_type") === "purchase")
          .withColumn("attributed",
            col("t_us").isNotNull && col("us") - col("t_us") <= LOOK)
          .select(
            when(col("attributed"), col("t_type")).otherwise("none").as("touch_type"),
            when(col("attributed"), col("t_k")).otherwise(-1L).as("campaign"),
            col("v6"))
          .groupBy("touch_type", "campaign")
          .agg(count(ONE).as("n_purchases"), sum("v6").as("rev6"))
          .withColumn("revenue", col("rev6").cast("double") / lit(1000000.0))
          .orderBy("touch_type", "campaign")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events),
        tch AS (
          SELECT *,
                 last_value(CASE WHEN event_type IN ('click','view') THEN us END IGNORE NULLS)
                   OVER w AS t_us,
                 last_value(CASE WHEN event_type IN ('click','view') THEN event_type END IGNORE NULLS)
                   OVER w AS t_type,
                 last_value(CASE WHEN event_type IN ('click','view') THEN k END IGNORE NULLS)
                   OVER w AS t_k
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        p AS (
          SELECT CASE WHEN t_us IS NOT NULL AND us - t_us <= 86400000000
                      THEN t_type ELSE 'none' END AS touch_type,
                 CASE WHEN t_us IS NOT NULL AND us - t_us <= 86400000000
                      THEN t_k ELSE -1 END AS campaign,
                 v6
          FROM tch WHERE event_type = 'purchase')
        SELECT touch_type, CAST(campaign AS BIGINT) AS campaign,
               count(*) AS n_purchases,
               CAST(sum(v6) AS BIGINT) AS rev6,
               CAST(CAST(sum(v6) AS BIGINT) AS DOUBLE) / 1000000.0 AS revenue
        FROM p
        GROUP BY touch_type, campaign
        ORDER BY touch_type, campaign""")),

    // -------------------------------------------------------------------
    // Time-weighted average (TWAP): each event's value holds until the
    // user's next event; the mean weights each value by its holding
    // duration. The irregular-interval complement to q31's resample —
    // finance/metering semantics where plain avg() is wrong whenever
    // sampling is uneven. All arithmetic is exact: micro-unit BIGINT
    // values x microsecond durations in DECIMAL(38,0) (30-day gaps x
    // micro-values overflow int64), integer round-half-up division (the
    // q62 trick) — no float accumulates, so the result is partition- and
    // engine-independent. Scale: one lead() window per user (the shuffle
    // is by user_id, same key the sessionization family already uses)
    // then a plain groupBy.
    QueryDef("q88_twap",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        Tables.events(s, d)
          .filter(pmod(col("user_id"), lit(10)) === 3)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"))
          .withColumn("next_us", lead(col("us"), 1).over(w))
          .filter(col("next_us").isNotNull)
          .withColumn("dur", col("next_us") - col("us"))
          .groupBy("user_id")
          .agg(count(ONE).as("n_holds"),
            sum("dur").as("span_us"),
            sum(expr("CAST(v6 AS DECIMAL(38,0)) * dur")).as("num"))
          .withColumn("twap6", expr("CAST((2 * num + span_us) div (2 * span_us) AS BIGINT)"))
          .select(col("user_id"), col("n_holds"), col("span_us"), col("twap6"),
            (col("twap6").cast("double") / lit(1000000.0)).as("twap"))
          .orderBy("user_id")
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6
          FROM events WHERE user_id % 10 = 3),
        held AS (
          SELECT user_id, v6,
                 lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dur
          FROM e),
        agg AS (
          SELECT user_id, count(*) AS n_holds,
                 CAST(sum(dur) AS BIGINT) AS span_us,
                 sum(CAST(v6 AS HUGEINT) * dur) AS num
          FROM held WHERE dur IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_holds, span_us,
               CAST((2 * num + span_us) // (2 * span_us) AS BIGINT) AS twap6,
               CAST(CAST((2 * num + span_us) // (2 * span_us) AS BIGINT) AS DOUBLE)
                 / 1000000.0 AS twap
        FROM agg
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Largest-remainder proration: allocate each order's total across its
    // lineitems proportional to extended price, in whole cents, with the
    // per-order sum EXACTLY preserved — floor every share, then hand the
    // leftover cents to the largest fractional remainders (deterministic
    // tie-break on line number). The billing/ledger primitive naive
    // round() breaks (pennies appear/vanish). Pure int64 arithmetic
    // (tc*ec <= 5.6e14), two window passes over the same o_orderkey
    // partitioning — ONE shuffle, Catalyst collapses the windows. The
    // exact_total column proves conservation row-by-row in the oracle.
    QueryDef("q89_proration",
      (s, d) => {
        val part = Window.partitionBy("o_orderkey")
        // the fixture's l_linenumber is NOT unique within an order (dup
        // line numbers exist) — derive line_seq as the row identity, so
        // both the remainder tie-break and the output order are total.
        // (linenumber, ec) twins are interchangeable rows, so which twin
        // carries which seq cannot change the output.
        val seqW = part.orderBy(col("l_linenumber"), col("ec"))
        val rankW = part.orderBy(col("rem").desc, col("line_seq"))
        Tables.lineitem(s, d)
          .filter(pmod(col("l_orderkey"), lit(20)) === 0)
          .join(Tables.orders(s, d).filter(pmod(col("o_orderkey"), lit(20)) === 0),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey"), col("l_linenumber"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("tc"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("ec"))
          .withColumn("line_seq", row_number().over(seqW).cast("int"))
          .withColumn("etot", sum("ec").over(part))
          .withColumn("base", expr("(tc * ec) div etot"))
          .withColumn("rem", expr("(tc * ec) % etot"))
          .withColumn("leftover", col("tc") - sum("base").over(part))
          .withColumn("rnk", row_number().over(rankW))
          .withColumn("alloc_cents",
            (col("base") + when(col("rnk") <= col("leftover"), 1L).otherwise(0L))
              .cast("long"))
          .withColumn("exact_total",
            sum("alloc_cents").over(part) === col("tc"))
          .select(col("o_orderkey"), col("line_seq"), col("l_linenumber"),
            col("alloc_cents"),
            (col("alloc_cents").cast("double") / lit(100.0)).as("alloc_usd"),
            col("exact_total"))
          .orderBy("o_orderkey", "line_seq")
      },
      Some("""
        WITH li AS (
          SELECT o_orderkey, l_linenumber,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS tc,
                 CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS ec
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_orderkey % 20 = 0),
        seqd AS (
          SELECT o_orderkey, l_linenumber, tc, ec,
                 CAST(row_number() OVER (PARTITION BY o_orderkey
                                         ORDER BY l_linenumber, ec) AS INT) AS line_seq
          FROM li),
        shares AS (
          SELECT o_orderkey, line_seq, l_linenumber, tc, ec,
                 CAST(sum(ec) OVER (PARTITION BY o_orderkey) AS BIGINT) AS etot
          FROM seqd),
        based AS (
          SELECT o_orderkey, line_seq, l_linenumber, tc,
                 (tc * ec) // etot AS base,
                 (tc * ec) % etot AS rem
          FROM shares),
        ranked AS (
          SELECT o_orderkey, line_seq, l_linenumber, tc, base,
                 CAST(tc - sum(base) OVER (PARTITION BY o_orderkey) AS BIGINT) AS leftover,
                 row_number() OVER (PARTITION BY o_orderkey
                                    ORDER BY rem DESC, line_seq) AS rnk
          FROM based),
        alloc AS (
          SELECT o_orderkey, line_seq, l_linenumber, tc,
                 base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS alloc_cents
          FROM ranked)
        SELECT o_orderkey, line_seq, l_linenumber,
               CAST(alloc_cents AS BIGINT) AS alloc_cents,
               CAST(alloc_cents AS DOUBLE) / 100.0 AS alloc_usd,
               CAST(sum(alloc_cents) OVER (PARTITION BY o_orderkey) AS BIGINT) = tc
                 AS exact_total
        FROM alloc
        ORDER BY o_orderkey, line_seq""")),

    // -------------------------------------------------------------------
    // Hilbert-curve layout (the locality-preserving sibling of q25's
    // z-order): the Hilbert index never takes the long diagonal jumps
    // Morton order does, so consecutive index ranges map to tighter
    // bounding boxes — better file skipping for 2-D range predicates.
    // The xy2d walk (8 levels for 8-bit coords) is unrolled into 8
    // chained narrow projections — pure integer CASE/& arithmetic, fully
    // codegen-fused, zero shuffle until the final per-bucket stats (the
    // exact q25 shape, so the two layouts are directly comparable).
    // The SAME step expression text runs in both engines (no ^ operator:
    // Spark xor vs DuckDB power — the quadrant digit is a CASE table).
    QueryDef("q92_hilbert_layout",
      (s, d) => {
        var df = Tables.orders(s, d).selectExpr(
          "o_custkey % 256 AS x",
          "CAST(floor(o_totalprice) AS BIGINT) % 256 AS y",
          "o_custkey % 256 AS x0",
          "CAST(floor(o_totalprice) AS BIGINT) % 256 AS y0",
          "CAST(0 AS BIGINT) AS h")
        for (lvl <- HilbertSteps.LEVELS) {
          val (nx, ny, nh) = HilbertSteps.step(lvl)
          df = df.selectExpr(s"$nx AS x", s"$ny AS y", "x0", "y0", s"$nh AS h")
        }
        df.groupBy(expr("h div 1024").as("hbucket"))
          .agg(count(ONE).as("n_orders"),
            min(col("h")).as("min_h"), max(col("h")).as("max_h"),
            min(col("x0")).as("min_x"), max(col("x0")).as("max_x"),
            min(col("y0")).as("min_y"), max(col("y0")).as("max_y"))
          .orderBy("hbucket")
      },
      Some {
        val base = """
        h256 AS (
          SELECT o_custkey % 256 AS x,
                 CAST(floor(o_totalprice) AS BIGINT) % 256 AS y,
                 o_custkey % 256 AS x0,
                 CAST(floor(o_totalprice) AS BIGINT) % 256 AS y0,
                 CAST(0 AS BIGINT) AS h
          FROM orders)"""
        val steps = HilbertSteps.LEVELS.map { lvl =>
          val (nx, ny, nh) = HilbertSteps.step(lvl)
          s"""h$lvl AS (
          SELECT $nx AS x, $ny AS y, x0, y0, $nh AS h FROM h${lvl * 2})"""
        }.mkString(",\n        ")
        s"""
        WITH $base,
        $steps
        SELECT h // 1024 AS hbucket, count(*) AS n_orders,
               min(h) AS min_h, max(h) AS max_h,
               min(x0) AS min_x, max(x0) AS max_x,
               min(y0) AS min_y, max(y0) AS max_y
        FROM h1
        GROUP BY hbucket
        ORDER BY hbucket"""
      }),

    // -------------------------------------------------------------------
    // Portable bloom filter AS DATA — the cross-engine sibling of q67's
    // bloom audit: q67 exercises Spark's native BloomFilterAggregate
    // (opaque sketch bytes, oracle pins only the contract), while this
    // filter is 16 bit_or-aggregated BIGINT lanes with md5-derived bit
    // positions, so DuckDB rebuilds the IDENTICAL bits and the oracle
    // pins every per-segment hit/true/false-positive count exactly —
    // the representation you'd persist next to a 100 TB table for other
    // engines to probe (an Iceberg/Delta-style file-level filter).
    // Build: distinct high-value custkeys set 3 bits each; the filter
    // is a 32-row table regardless of corpus size (32-bit lanes — bit
    // 63 shifts overflow DuckDB's checked BIGINT <<), i.e. broadcast
    // state like a sketch. Probe: every customer tests its 3 bits
    // against the broadcast lanes — the probe side never shuffles.
    QueryDef("q93_bloom_membership",
      (s, d) => {
        val pos = Ns.hash32(
          "concat('bf', CAST(j AS STRING), ':', CAST(k AS STRING))") + " % 1024"
        val keys = Tables.orders(s, d)
          .filter(col("o_totalprice") > 150000.0)
          .select(col("o_custkey").as("k")).distinct()
        val lanes = keys
          .select(col("k"), explode(expr("sequence(0, 2)")).as("j"))
          .select(expr(pos).as("pos"))
          .select(expr("pos div 32").as("lane"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("m"))
          .groupBy("lane").agg(expr("bit_or(m)").as("word"))
        val probes = Tables.customer(s, d)
          .select(col("c_custkey").as("k"), col("c_mktsegment"))
          .select(col("k"), col("c_mktsegment"), explode(expr("sequence(0, 2)")).as("j"))
          .select(col("k"), col("c_mktsegment"), expr(pos).as("pos"))
          .select(col("k"), col("c_mktsegment"),
            expr("pos div 32").as("lane"), expr("CAST(pos % 32 AS INT)").as("bit"))
          .join(broadcast(lanes), Seq("lane"), "left")
          .groupBy(col("k"), col("c_mktsegment"))
          .agg(expr("bool_and(coalesce((word >> bit) & 1, CAST(0 AS BIGINT)) = 1)")
            .as("bloom_member"))
        probes
          .join(keys.withColumn("actual", lit(true)), Seq("k"), "left")
          .withColumn("actual", coalesce(col("actual"), lit(false)))
          .groupBy("c_mktsegment")
          .agg(count(ONE).as("n_customers"),
            sum(when(col("bloom_member"), 1L).otherwise(0L)).as("n_bloom_hits"),
            sum(when(col("actual"), 1L).otherwise(0L)).as("n_true"),
            sum(when(col("bloom_member") && !col("actual"), 1L).otherwise(0L))
              .as("n_false_pos"),
            expr("bool_and(bloom_member OR NOT actual)").as("no_false_negatives"))
          .orderBy("c_mktsegment")
      },
      Some(s"""
        WITH keys AS (
          SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 150000.0),
        lanes AS (
          SELECT pos // 32 AS lane,
                 CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS BIGINT) AS word
          FROM (
            SELECT ${Ns.oHash32("'bf' || CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)")} % 1024 AS pos
            FROM keys CROSS JOIN range(3) t(j))
          GROUP BY lane),
        probes AS (
          SELECT k, c_mktsegment,
                 bool_and(coalesce((word >> bit) & 1, CAST(0 AS BIGINT)) = 1) AS bloom_member
          FROM (
            SELECT c_custkey AS k, c_mktsegment,
                   pos // 32 AS lane, CAST(pos % 32 AS INT) AS bit
            FROM (
              SELECT c_custkey, c_mktsegment,
                     ${Ns.oHash32("'bf' || CAST(j AS VARCHAR) || ':' || CAST(c_custkey AS VARCHAR)")} % 1024 AS pos
              FROM customer CROSS JOIN range(3) t(j)))
          LEFT JOIN lanes USING (lane)
          GROUP BY k, c_mktsegment),
        tagged AS (
          SELECT p.k, p.c_mktsegment, p.bloom_member,
                 keys.k IS NOT NULL AS actual
          FROM probes p LEFT JOIN keys ON p.k = keys.k)
        SELECT c_mktsegment, count(*) AS n_customers,
               CAST(sum(CASE WHEN bloom_member THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
               CAST(sum(CASE WHEN actual THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
               CAST(sum(CASE WHEN bloom_member AND NOT actual THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               bool_and(bloom_member OR NOT actual) AS no_false_negatives
        FROM tagged
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")),

    // -------------------------------------------------------------------
    // CUSUM change-point / drift detection (Page's one-sided cumulative
    // sum — the SPC monitor a metrics pipeline runs per entity): per
    // user, over (ts, event_id)-ordered values, S = max(0, S + x - mean
    // - slack); crossing the threshold raises an alarm and resets S.
    // The recursion is inherently sequential per key, so it runs as ONE
    // sequential fold over the user's collected value list (the t01/q88
    // micro-unit recipe keeps every step exact BIGINT — no float ever
    // accumulates), with the per-user mean as the exact truncating
    // integer division of micro sums. The oracle replays the identical
    // recursion as a recursive CTE. Scale: one shuffle to the user key;
    // per-user state is that user's event list — the same per-key
    // boundedness contract as the session operators; a user too big for
    // one list is the st11 streaming processor's job instead.
    QueryDef("q94_cusum",
      (s, d) => {
        val K6 = 20000000L  // slack: 20 value units in micros
        val H6 = 200000000L // alarm threshold: 200 units in micros
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"))
        val step = (raw: String) => s"greatest(CAST(0 AS BIGINT), $raw)"
        val raw = "acc.s + x - mean6 - " + K6 + "L"
        ev.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            sum(col("v6")).as("sv6"),
            expr("transform(sort_array(collect_list(struct(us, event_id, v6))), e -> e.v6)")
              .as("vals"))
          .withColumn("mean6", expr("sv6 div n_events"))
          .withColumn("fin", expr(
            s"""aggregate(vals,
                named_struct('s', CAST(0 AS BIGINT), 'nal', 0,
                             'firstpos', CAST(NULL AS INT), 'maxs', CAST(0 AS BIGINT),
                             'pos', 0),
                (acc, x) -> named_struct(
                  's', CASE WHEN ${step(raw)} > ${H6}L THEN CAST(0 AS BIGINT)
                            ELSE ${step(raw)} END,
                  'nal', acc.nal + CASE WHEN ${step(raw)} > ${H6}L THEN 1 ELSE 0 END,
                  'firstpos', coalesce(acc.firstpos,
                    CASE WHEN ${step(raw)} > ${H6}L THEN acc.pos + 1 END),
                  'maxs', greatest(acc.maxs, ${step(raw)}),
                  'pos', acc.pos + 1))"""))
          .select(col("user_id"), col("n_events"), col("mean6"),
            col("fin.nal").as("n_alarms"), col("fin.firstpos").as("first_alarm_pos"),
            col("fin.maxs").as("max_s"))
          .orderBy("user_id")
      },
      Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6
          FROM events),
        seq AS (
          SELECT user_id, v6,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS INT) AS pos
          FROM ev),
        stats AS (
          SELECT user_id, count(*) AS n_events,
                 CAST(sum(v6) // count(*) AS BIGINT) AS mean6
          FROM seq GROUP BY user_id),
        walk(user_id, pos, s, nal, firstpos, maxs) AS (
          SELECT user_id, 0, CAST(0 AS BIGINT), 0, CAST(NULL AS INT), CAST(0 AS BIGINT)
          FROM stats
          UNION ALL
          SELECT w.user_id, e.pos,
                 CASE WHEN greatest(CAST(0 AS BIGINT), w.s + e.v6 - t.mean6 - 20000000) > 200000000
                      THEN CAST(0 AS BIGINT)
                      ELSE greatest(CAST(0 AS BIGINT), w.s + e.v6 - t.mean6 - 20000000) END,
                 w.nal + CASE WHEN greatest(CAST(0 AS BIGINT), w.s + e.v6 - t.mean6 - 20000000) > 200000000
                              THEN 1 ELSE 0 END,
                 coalesce(w.firstpos,
                   CASE WHEN greatest(CAST(0 AS BIGINT), w.s + e.v6 - t.mean6 - 20000000) > 200000000
                        THEN e.pos END),
                 greatest(w.maxs, greatest(CAST(0 AS BIGINT), w.s + e.v6 - t.mean6 - 20000000))
          FROM walk w
          JOIN seq e ON e.user_id = w.user_id AND e.pos = w.pos + 1
          JOIN stats t ON t.user_id = w.user_id),
        fin AS (
          SELECT user_id, max(pos) AS last_pos FROM walk GROUP BY user_id)
        SELECT w.user_id, t.n_events, t.mean6,
               w.nal AS n_alarms, w.firstpos AS first_alarm_pos, w.maxs AS max_s
        FROM walk w
        JOIN fin f ON w.user_id = f.user_id AND w.pos = f.last_pos
        JOIN stats t ON t.user_id = w.user_id
        ORDER BY w.user_id""")),

    // -------------------------------------------------------------------
    // Gini concentration per segment (the Lorenz-curve inequality
    // coefficient — "is 80% of this segment's revenue in 2% of its
    // orders?"): G = (2*SUM(i*x_i) - (n+1)*SUM(x_i)) / (n*SUM(x_i))
    // over ascending-sorted order totals. All sums run on exact cents
    // in DECIMAL(38)/HUGEINT (rank x value products overflow int64 at
    // warehouse scale); ONE double division at the end. Equal values
    // make rank order irrelevant to SUM(i*x_i), so the result is
    // deterministic without any value tie-break. Scale: one shuffle to
    // the segment key for the rank window, then a partial aggregate.
    QueryDef("q95_gini",
      (s, d) => {
        // 5 segments, each ORDER-table-sized: the per-segment Lorenz rank
        // runs as Prefix.orderStats (grouped two-pass range-partitioned
        // rank) — a plain partitionBy window would sort each whole
        // segment in ONE task
        val j = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
        Prefix.orderStats(j, Seq(col("cents"), col("o_orderkey")),
            group = Seq("c_mktsegment"), rn = Some("i"))
          .groupBy("c_mktsegment")
          .agg(count(ONE).as("n_orders"),
            sum(col("cents").cast("decimal(38,0)")).as("sx"),
            sum((col("i") * col("cents")).cast("decimal(38,0)")).as("six"))
          .select(col("c_mktsegment"), col("n_orders"),
            col("sx").cast("long").as("total_cents"),
            round(expr(
              "CAST(2 * six - (n_orders + 1) * sx AS DOUBLE) / CAST(n_orders * sx AS DOUBLE)"), 6)
              .as("gini"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH j AS (
          SELECT c_mktsegment, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey),
        ranked AS (
          SELECT c_mktsegment, cents,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY cents, o_orderkey) AS i
          FROM j),
        sums AS (
          SELECT c_mktsegment, count(*) AS n_orders,
                 CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS six
          FROM ranked GROUP BY c_mktsegment)
        SELECT c_mktsegment, n_orders,
               CAST(sx AS BIGINT) AS total_cents,
               round(CAST(2 * six - (n_orders + 1) * sx AS DOUBLE)
                     / CAST(n_orders * sx AS DOUBLE), 6) AS gini
        FROM sums
        ORDER BY c_mktsegment""")),

    // -------------------------------------------------------------------
    // Mann-Kendall trend test per user (the nonparametric monotone-trend
    // detector metric pipelines run next to q94's CUSUM): S = SUM over
    // i<j of sgn(x_j - x_i) in time order, with the tie-corrected
    // variance Var(S) = [n(n-1)(2n+5) - SUM_t t(t-1)(2t+5)] / 18. S and
    // 18*Var are EXACT integers (values are exact micro-unit longs);
    // the z-score is one sqrt+division of those. Pairs come from a
    // per-user self-join bounded by the per-user series length — the
    // q88/q94 per-key contract — and sgn sums partial-aggregate.
    QueryDef("q96_mann_kendall",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"))
          .withColumn("pos", row_number().over(
            Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))))
        val a = ev.select(col("user_id"), col("pos").as("pi"), col("v6").as("xi"))
        val b = ev.select(col("user_id").as("ub"), col("pos").as("pj"), col("v6").as("xj"))
        val sstat = a.join(b, col("user_id") === col("ub") && col("pi") < col("pj"))
          .groupBy("user_id")
          .agg(sum(signum(col("xj") - col("xi")).cast("long")).as("s_stat"))
        val ties = ev.groupBy(col("user_id").as("ut"), col("v6"))
          .agg(count(ONE).as("t"))
          .groupBy("ut")
          .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"),
            sum(col("t")).as("n"))
        sstat.join(ties, col("user_id") === col("ut"))
          .select(col("user_id"), col("n"), col("s_stat"),
            expr("n * (n - 1) * (2 * n + 5) - tie_term").as("var18"))
          .withColumn("z", round(expr(
            """CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                    WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                    ELSE CAST(0 AS DOUBLE) END"""), 6))
          .withColumn("trend",
            when(col("z") > 1.96, "increasing")
              .when(col("z") < -1.96, "decreasing").otherwise("no_trend"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6
          FROM events),
        seq AS (
          SELECT user_id, v6,
                 row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS pos
          FROM ev),
        sstat AS (
          SELECT a.user_id, CAST(sum(sign(b.v6 - a.v6)) AS BIGINT) AS s_stat
          FROM seq a JOIN seq b ON a.user_id = b.user_id AND a.pos < b.pos
          GROUP BY a.user_id),
        ties AS (
          SELECT ut, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
                 CAST(sum(t) AS BIGINT) AS n
          FROM (SELECT user_id AS ut, v6, count(*) AS t FROM seq GROUP BY user_id, v6)
          GROUP BY ut),
        m AS (
          SELECT user_id, n, s_stat,
                 n * (n - 1) * (2 * n + 5) - tie_term AS var18
          FROM sstat JOIN ties ON user_id = ut),
        z AS (
          SELECT user_id, n, s_stat, var18,
                 round(CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                            WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                            ELSE CAST(0 AS DOUBLE) END, 6) AS z
          FROM m)
        SELECT user_id, n, s_stat, var18, z,
               CASE WHEN z > 1.96 THEN 'increasing'
                    WHEN z < -1.96 THEN 'decreasing' ELSE 'no_trend' END AS trend
        FROM z
        ORDER BY user_id"""))
  ) ++ Seq(

    // -------------------------------------------------------------------
    // Holt double-exponential smoothing per user (level + trend — the
    // forecasting primitive over q78's single-EWMA): l = a*x + (1-a)*
    // (l' + b'), b = g*(l - l') + (1-g)*b', one-step forecast l + b.
    // a = g = 1/2 keeps every step EXACT dyadic IEEE arithmetic (0.5*x
    // is an exponent decrement) — the st14 recipe — so the sequential
    // fold is bit-identical across engines and partitionings with NO
    // rounding crutch anywhere. Spark folds a (level, trend) struct
    // accumulator per user; the DuckDB oracle replays the identical
    // recursion as a recursive CTE (its list_reduce cannot carry a
    // struct accumulator over scalar elements — the q94 precedent).
    QueryDef("q97_holt_smoothing",
      (s, d) => {
        Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            col("value"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            expr("transform(sort_array(collect_list(struct(us, event_id, value))), e -> e.value)")
              .as("vals"))
          .filter(col("n_events") >= 2)
          .withColumn("fin", expr(
            """aggregate(slice(vals, 2, size(vals) - 1),
                named_struct('l', element_at(vals, 1), 'b', CAST(0 AS DOUBLE)),
                (acc, x) -> named_struct(
                  'l', 0.5 * x + 0.5 * (acc.l + acc.b),
                  'b', 0.5 * ((0.5 * x + 0.5 * (acc.l + acc.b)) - acc.l) + 0.5 * acc.b))"""))
          .select(col("user_id"), col("n_events"),
            col("fin.l").as("level"), col("fin.b").as("trend"),
            (col("fin.l") + col("fin.b")).as("forecast_1"))
          .orderBy("user_id")
      },
      Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        seq AS (
          SELECT user_id, value,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS INT) AS pos
          FROM ev),
        stats AS (SELECT user_id, count(*) AS n_events FROM seq GROUP BY user_id),
        walk(user_id, pos, l, b) AS (
          SELECT user_id, 1, value, CAST(0 AS DOUBLE)
          FROM seq WHERE pos = 1
          UNION ALL
          SELECT w.user_id, e.pos,
                 0.5 * e.value + 0.5 * (w.l + w.b),
                 0.5 * ((0.5 * e.value + 0.5 * (w.l + w.b)) - w.l) + 0.5 * w.b
          FROM walk w JOIN seq e ON e.user_id = w.user_id AND e.pos = w.pos + 1),
        fin AS (SELECT user_id, max(pos) AS last_pos FROM walk GROUP BY user_id)
        SELECT w.user_id, t.n_events, w.l AS level, w.b AS trend,
               w.l + w.b AS forecast_1
        FROM walk w
        JOIN fin f ON w.user_id = f.user_id AND w.pos = f.last_pos
        JOIN stats t ON t.user_id = w.user_id
        WHERE t.n_events >= 2
        ORDER BY w.user_id""")),

    // -------------------------------------------------------------------
    // Inter-arrival burstiness per user (Goh & Barabasi's B =
    // (sigma - mu)/(sigma + mu) over event gaps: -1 = perfectly
    // regular, 0 = Poisson, ->1 = bursty — the traffic-shape signal
    // behind rate-limit and anomaly thresholds). Gap moments run as
    // EXACT DECIMAL(38)/HUGEINT sums (30-day gaps in micros overflow
    // int64 when squared); sigma and B are one identical double
    // combination in both engines.
    QueryDef("q98_burstiness",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
          .withColumn("prev", lag(col("us"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("user_id"), (col("us") - col("prev")).as("g"))
          .groupBy("user_id")
          .agg(count(ONE).as("n_gaps"),
            sum(col("g").cast("decimal(38,0)")).as("sg"),
            sum(col("g").cast("decimal(38,0)") * col("g")).as("sgg"))
          .select(col("user_id"), col("n_gaps"),
            expr("CAST(sg div n_gaps AS BIGINT)").as("mean_gap_us"),
            round(expr(
              """(sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) / n_gaps
                  - CAST(sg AS DOUBLE) / n_gaps)
                 / (sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) / n_gaps
                    + CAST(sg AS DOUBLE) / n_gaps)"""), 6).as("burstiness"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        gaps AS (
          SELECT user_id, us - prev AS g FROM (
            SELECT user_id, us,
                   lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
            FROM ev)
          WHERE prev IS NOT NULL),
        sums AS (
          SELECT user_id, count(*) AS n_gaps,
                 CAST(sum(CAST(g AS HUGEINT)) AS HUGEINT) AS sg,
                 CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sgg
          FROM gaps GROUP BY user_id)
        SELECT user_id, n_gaps,
               CAST(sg // n_gaps AS BIGINT) AS mean_gap_us,
               round((sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) / n_gaps
                      - CAST(sg AS DOUBLE) / n_gaps)
                     / (sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) / n_gaps
                        + CAST(sg AS DOUBLE) / n_gaps), 6) AS burstiness
        FROM sums
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Benford first-digit audit per priority class (the classic
    // fabricated-numbers screen: naturally-grown magnitudes follow
    // P(d) = log10(1 + 1/d); a flat or spiked digit histogram flags
    // synthetic or constrained data). Digit counts are exact; the
    // Benford expectations are micro-quantized at PLAN-BUILD time into
    // shared integer literals (the s15 discount move — no cross-engine
    // log10 ulp), so the chi-square statistic is one identical double
    // combination of exact integers per digit. The fixture's uniform-ish
    // price generator genuinely FAILS Benford — the audit fires, which
    // is the point (and the spec pins it).
    QueryDef("q99_benford",
      (s, d) => {
        // P(d) in parts-per-million, derived once in Scala
        val p6 = (1 to 9).map(dg => math.round(math.log10(1.0 + 1.0 / dg) * 1e6))
        val pArr = s"element_at(array(${p6.mkString("L, ")}L), digit)"
        Tables.orders(s, d)
          .select(col("o_orderpriority"),
            expr("CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT)")
              .as("digit"))
          .groupBy("o_orderpriority", "digit")
          .agg(count(ONE).as("obs"))
          .withColumn("n", sum(col("obs")).over(Window.partitionBy("o_orderpriority")))
          .withColumn("exp_ppm", expr(pArr))
          .withColumn("chi_term", expr(
            """(CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * exp_ppm / 1e6)
               * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * exp_ppm / 1e6)
               / (CAST(n AS DOUBLE) * exp_ppm / 1e6)"""))
          .groupBy("o_orderpriority")
          .agg(max(col("n")).as("n_orders"),
            count(ONE).cast("int").as("n_digits_seen"),
            round(expr(
              """aggregate(transform(sort_array(collect_list(struct(digit, chi_term))), x -> x.chi_term),
                 CAST(0 AS DOUBLE), (acc, x) -> acc + x)"""), 6).as("chi2"))
          .withColumn("benford_rejected_01", col("chi2") > lit(20.09))
          .orderBy("o_orderpriority")
      },
      Some {
        val p6 = (1 to 9).map(dg => math.round(math.log10(1.0 + 1.0 / dg) * 1e6))
        val pArr = s"[${p6.mkString(", ")}][digit]"
        s"""
        WITH digits AS (
          SELECT o_orderpriority,
                 CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
          FROM orders),
        cnt AS (
          SELECT o_orderpriority, digit, count(*) AS obs
          FROM digits GROUP BY o_orderpriority, digit),
        tot AS (
          SELECT o_orderpriority, digit, obs,
                 CAST(sum(obs) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n,
                 $pArr AS exp_ppm
          FROM cnt),
        terms AS (
          SELECT o_orderpriority, digit, n,
                 (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * exp_ppm / 1e6)
                 * (CAST(obs AS DOUBLE) - CAST(n AS DOUBLE) * exp_ppm / 1e6)
                 / (CAST(n AS DOUBLE) * exp_ppm / 1e6) AS chi_term
          FROM tot)
        SELECT o_orderpriority, max(n) AS n_orders,
               CAST(count(*) AS INT) AS n_digits_seen,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(chi_term ORDER BY digit)), (acc, x) -> acc + x), 6) AS chi2,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(chi_term ORDER BY digit)), (acc, x) -> acc + x), 6) > 20.09
                 AS benford_rejected_01
        FROM terms
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority"""
      })
  ) ++ Seq(

    // -------------------------------------------------------------------
    // Maximum drawdown per user (the risk metric every P&L/monitoring
    // pipeline computes): treat purchases as inflows and errors as
    // outflows in event-time order, build the running-equity curve, track
    // the running peak (floored at the starting equity 0), and report the
    // deepest peak-to-trough fall. Everything is exact integer cents
    // through two window passes (running sum, running max) — the q82/q94
    // per-key sequential contract — so the result is partitioning- and
    // engine-invariant; the only double is the final ratio, one IEEE
    // division rounded to 6. Scale: both windows partition by user_id —
    // one shuffle, no driver state, per-user series bounded.
    QueryDef("q100_drawdown",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "error"))
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("""CASE WHEN event_type = 'purchase'
                         THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                         ELSE -CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END""").as("flow"))
          .withColumn("eq", sum(col("flow")).over(w))
          .withColumn("peak", greatest(lit(0L), max(col("eq")).over(w)))
          .groupBy("user_id")
          .agg(count(ONE).as("n_flows"),
            max(struct(col("us"), col("event_id"), col("eq"))).getField("eq").as("final_cents"),
            max(col("peak")).as("peak_cents"),
            max(col("peak") - col("eq")).as("max_drawdown_cents"))
          .withColumn("drawdown_ratio", round(
            col("max_drawdown_cents").cast("double") / greatest(lit(1L), col("peak_cents")).cast("double"), 6))
          .orderBy("user_id")
      },
      Some("""
        WITH flows AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                      ELSE -CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) END AS flow
          FROM events WHERE event_type IN ('purchase', 'error')),
        curve AS (
          SELECT user_id, us, event_id,
                 CAST(sum(flow) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS eq
          FROM flows),
        peaked AS (
          SELECT user_id, us, event_id, eq,
                 greatest(CAST(0 AS BIGINT), CAST(max(eq) OVER (PARTITION BY user_id
                   ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)) AS peak
          FROM curve),
        agg AS (
          SELECT user_id, count(*) AS n_flows,
                 list(eq ORDER BY us, event_id)[-1] AS final_cents,
                 max(peak) AS peak_cents,
                 max(peak - eq) AS max_drawdown_cents
          FROM peaked GROUP BY user_id)
        SELECT user_id, n_flows, final_cents, peak_cents, max_drawdown_cents,
               round(CAST(max_drawdown_cents AS DOUBLE)
                     / CAST(greatest(CAST(1 AS BIGINT), peak_cents) AS DOUBLE), 6) AS drawdown_ratio
        FROM agg
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Autocorrelation function per user at lags 1..3 (the seasonality /
    // momentum probe next to q96's trend test and q97's Holt forecast).
    // Exactness: with x as micro-unit BIGINTs, clear the rational mean
    // from the textbook estimator by scaling both sides by n^2:
    //   r_k = [n^2*S_xx(k) - n*S*(A_k + B_k) + (n-k)*S^2]
    //         / [n^2*S_x2 - n*S^2]
    // where A_k/B_k are the head/tail partial sums the lag-k pairs
    // touch. Every term is an exact DECIMAL(38,0) integer (the q88/q95
    // HUGEINT recipe), so the only float is the final division. The
    // lagged pairs come from a per-user self-join bounded by lag <= 3 —
    // each row joins at most 3 partners, so the join output is 3x the
    // input, never quadratic (unlike q96's i<j pair sweep).
    QueryDef("q101_acf",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"))
          .withColumn("pos", row_number().over(
            Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))))
        val base = ev.groupBy("user_id")
          .agg(count(ONE).as("n"),
            sum(col("v6").cast("decimal(38,0)")).as("sx"),
            sum((col("v6").cast("decimal(38,0)") * col("v6")).cast("decimal(38,0)")).as("sx2"))
        val a = ev.select(col("user_id"), col("pos").as("pi"), col("v6").as("xi"))
        val b = ev.select(col("user_id").as("ub"), col("pos").as("pj"), col("v6").as("xj"))
        val lagged = a.join(b,
            col("user_id") === col("ub") && (col("pj") - col("pi")).between(1, 3))
          .select(col("user_id"), (col("pj") - col("pi")).cast("int").as("k"),
            col("xi"), col("xj"))
          .groupBy("user_id", "k")
          .agg(sum((col("xi").cast("decimal(38,0)") * col("xj")).cast("decimal(38,0)")).as("sxx"),
            sum(col("xi").cast("decimal(38,0)")).as("ak"),
            sum(col("xj").cast("decimal(38,0)")).as("bk"))
        lagged.join(base, "user_id")
          .filter(col("n") > col("k"))
          .select(col("user_id"), col("k"), col("n"),
            expr("CAST(n AS DECIMAL(38,0)) * n * sxx - CAST(n AS DECIMAL(38,0)) * sx * (ak + bk) + (CAST(n AS DECIMAL(38,0)) - k) * sx * sx").as("num"),
            expr("CAST(n AS DECIMAL(38,0)) * n * sx2 - CAST(n AS DECIMAL(38,0)) * sx * sx").as("den"))
          .filter(col("den") > lit(0))
          .select(col("user_id"), col("k"), col("n"),
            round(col("num").cast("double") / col("den").cast("double"), 6).as("acf"))
          .orderBy("user_id", "k")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6
          FROM events),
        seq AS (
          SELECT user_id, v6,
                 row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS pos
          FROM ev),
        base AS (
          SELECT user_id, count(*) AS n,
                 CAST(sum(CAST(v6 AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(v6 AS HUGEINT) * v6) AS HUGEINT) AS sx2
          FROM seq GROUP BY user_id),
        lagged AS (
          SELECT a.user_id, CAST(b.pos - a.pos AS INT) AS k,
                 CAST(sum(CAST(a.v6 AS HUGEINT) * b.v6) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(a.v6 AS HUGEINT)) AS HUGEINT) AS ak,
                 CAST(sum(CAST(b.v6 AS HUGEINT)) AS HUGEINT) AS bk
          FROM seq a JOIN seq b
            ON a.user_id = b.user_id AND b.pos - a.pos BETWEEN 1 AND 3
          GROUP BY a.user_id, b.pos - a.pos),
        terms AS (
          SELECT l.user_id, l.k, t.n,
                 CAST(t.n AS HUGEINT) * t.n * l.sxx
                   - CAST(t.n AS HUGEINT) * t.sx * (l.ak + l.bk)
                   + (CAST(t.n AS HUGEINT) - l.k) * t.sx * t.sx AS num,
                 CAST(t.n AS HUGEINT) * t.n * t.sx2
                   - CAST(t.n AS HUGEINT) * t.sx * t.sx AS den
          FROM lagged l JOIN base t ON l.user_id = t.user_id
          WHERE t.n > l.k)
        SELECT user_id, k, n,
               round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
        FROM terms WHERE den > 0
        ORDER BY user_id, k""")),

    // -------------------------------------------------------------------
    // Chi-square independence test: event_type x user cohort (id mod 4 —
    // the classic hash-cohort A/B assignment q46 uses). The statistic is
    // computed without ever forming the rational expected counts:
    //   (O - E)^2 / E  ==  (N*O - R*C)^2 / (N*R*C)
    // so each cell term is an exact integer ratio; we truncate each term
    // to micro-units with integer division (both engines floor positive
    // quotients identically) and integer-sum — the t01/t12 micro-nat
    // quantization recipe applied to a test statistic. DECIMAL(38,0)
    // keeps (N*O - R*C)^2 * 1e6 exact (~1e26 max at sf0.1, under the
    // 38-digit cap). One row out; marginals are two tiny broadcast aggs.
    QueryDef("q102_chi_square",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), expr("user_id % 4").as("cohort"))
        val obs = ev.groupBy("event_type", "cohort").agg(count(ONE).as("o"))
        val rowm = obs.groupBy("event_type").agg(sum(col("o")).as("r"))
        val colm = obs.groupBy("cohort").agg(sum(col("o")).as("c"))
        val tot = obs.agg(sum(col("o")).as("n"))
        val terms = obs.join(rowm, "event_type").join(colm, "cohort").crossJoin(tot)
          .select(expr(
            """(CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c)
               * (CAST(n AS DECIMAL(38,0)) * o - CAST(r AS DECIMAL(38,0)) * c) * 1000000
               div (CAST(n AS DECIMAL(38,0)) * r * c)""").as("term6"))
        val dims = obs.agg(
          countDistinct(col("event_type")).as("nr"), countDistinct(col("cohort")).as("nc"))
        terms.agg(sum(col("term6")).as("chi2_micro")).crossJoin(tot).crossJoin(dims)
          .select(col("n").as("n_events"),
            expr("CAST((nr - 1) * (nc - 1) AS INT)").as("df"),
            round(col("chi2_micro").cast("double") / lit(1e6), 6).as("chi2"))
      },
      Some("""
        WITH ev AS (SELECT event_type, user_id % 4 AS cohort FROM events),
        obs AS (SELECT event_type, cohort, count(*) AS o FROM ev GROUP BY 1, 2),
        rowm AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM obs GROUP BY 1),
        colm AS (SELECT cohort, CAST(sum(o) AS BIGINT) AS c FROM obs GROUP BY 1),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
        dims AS (SELECT count(DISTINCT event_type) AS nr, count(DISTINCT cohort) AS nc FROM obs),
        terms AS (
          SELECT CAST((CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c)
                 * (CAST(n AS HUGEINT) * o - CAST(r AS HUGEINT) * c) * 1000000
                 // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS term6
          FROM obs JOIN rowm USING (event_type) JOIN colm USING (cohort) CROSS JOIN tot)
        SELECT n AS n_events, CAST((nr - 1) * (nc - 1) AS INT) AS df,
               round(CAST(sum(term6) AS DOUBLE) / 1e6, 6) AS chi2
        FROM terms CROSS JOIN tot CROSS JOIN dims
        GROUP BY n, nr, nc""")),

    // -------------------------------------------------------------------
    // Robust outlier screen: median absolute deviation per market
    // segment (the q29 z-score screen's robust sibling — a single fat
    // tail distorts mean/stddev but not med/MAD). The median is the
    // LOWER median spelled explicitly as the ranked value at position
    // (n+1) div 2 — not percentile_disc/quantile_disc, whose even-n and
    // tie conventions differ across engines — so every intermediate is
    // an exact integer and the spelling is the contract. Two ranked
    // passes partitioned by segment — each a GROUPED Prefix.orderStats
    // two-pass prefix scan (5 segments × order-sized groups: a plain
    // partitionBy window would sort each whole segment in ONE task);
    // the per-segment counts ride along as groupCount — pass 1 of the
    // prefix scan already knows them, no separate agg or join.
    QueryDef("q103_mad_outliers",
      (s, d) => {
        val j = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
        val med = Prefix.orderStats(j, Seq(col("cents"), col("o_orderkey")),
            group = Seq("c_mktsegment"), rn = Some("i"), groupCount = Some("n"))
          .filter(expr("i = (n + 1) div 2"))
          .select(col("c_mktsegment").as("ms"), col("cents").as("med_cents"), col("n"))
        val dev = j.join(med, col("c_mktsegment") === col("ms"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("cents"), col("med_cents"), col("n"),
            abs(col("cents") - col("med_cents")).as("adev"))
        val mad = Prefix.orderStats(dev, Seq(col("adev"), col("o_orderkey")),
            group = Seq("c_mktsegment"), rn = Some("i"))
          .filter(expr("i = (n + 1) div 2"))
          .select(col("c_mktsegment").as("ms2"), col("adev").as("mad_cents"))
        dev.join(mad, col("c_mktsegment") === col("ms2"))
          .groupBy("c_mktsegment")
          .agg(max(col("n")).as("n_orders"),
            max(col("med_cents")).as("med_cents"),
            max(col("mad_cents")).as("mad_cents"),
            sum(when(col("adev") > lit(3) * col("mad_cents"), 1L).otherwise(0L)).as("n_outliers"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH j AS (
          SELECT c_mktsegment, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey),
        ranked AS (
          SELECT c_mktsegment, o_orderkey, cents,
                 row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents, o_orderkey) AS i,
                 count(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM j),
        med AS (
          SELECT c_mktsegment AS ms, cents AS med_cents, n
          FROM ranked WHERE i = (n + 1) // 2),
        dev AS (
          SELECT j.c_mktsegment, j.o_orderkey, j.cents, m.med_cents, m.n,
                 abs(j.cents - m.med_cents) AS adev
          FROM j JOIN med m ON j.c_mktsegment = m.ms),
        devranked AS (
          SELECT c_mktsegment, adev,
                 row_number() OVER (PARTITION BY c_mktsegment ORDER BY adev, o_orderkey) AS i,
                 n
          FROM dev),
        mad AS (
          SELECT c_mktsegment AS ms2, adev AS mad_cents
          FROM devranked WHERE i = (n + 1) // 2)
        SELECT d.c_mktsegment, max(d.n) AS n_orders,
               max(d.med_cents) AS med_cents, max(m.mad_cents) AS mad_cents,
               CAST(sum(CASE WHEN d.adev > 3 * m.mad_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d JOIN mad m ON d.c_mktsegment = m.ms2
        GROUP BY d.c_mktsegment
        ORDER BY d.c_mktsegment"""))
  ) ++ Seq(

    // -------------------------------------------------------------------
    // Kaplan-Meier survival: time-to-first-BIG-purchase (value >= 100 —
    // the ~15-25% tail, so censoring is real at every scale) per user in
    // whole days from their first event, right-censored at their last
    // event when no qualifying purchase ever happens — the retention-curve estimator
    // that q33's fixed-horizon retention cannot express (censoring).
    // S(t) = prod over event-days <= t of (1 - d/n_risk); the product
    // is a SEQUENTIAL double fold over the day-ordered factors (the
    // g01 recipe: Spark aggregate over sort_array, DuckDB list_reduce
    // over list(... ORDER BY day) — identical IEEE sequence), with
    // censor-only days contributing exactly 1.0 (IEEE identity). Risk
    // sets are exact integer prefix sums. Scale: one groupBy user, one
    // groupBy day; the day-level KM table is tiny by construction.
    QueryDef("q104_kaplan_meier",
      (s, d) => {
        val DAY = 86400000000L
        val peru = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"), col("value"))
          .groupBy("user_id")
          .agg(min(col("us")).as("t0"),
            min(when(col("event_type") === "purchase" && col("value") >= 100, col("us"))).as("fp"),
            max(col("us")).as("tmax"))
          .select(col("user_id"),
            when(col("fp").isNotNull, expr(s"(fp - t0) div $DAY"))
              .otherwise(expr(s"(tmax - t0) div $DAY")).as("day"),
            when(col("fp").isNotNull, 1L).otherwise(0L).as("event"))
        val n = peru.agg(count(ONE).as("n_total"))
        val byday = peru.groupBy("day")
          .agg(sum(col("event")).as("d"), sum(lit(1L) - col("event")).as("c"))
        val wPrev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
        val wCum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byday.crossJoin(n)
          .withColumn("n_risk", col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
          .withColumn("factor", expr(
            "CASE WHEN d > 0 THEN 1 - CAST(d AS DOUBLE) / n_risk ELSE CAST(1 AS DOUBLE) END"))
          .withColumn("fl", collect_list(struct(col("day"), col("factor"))).over(wCum))
          .withColumn("survival", round(expr(
            """aggregate(transform(sort_array(fl), x -> x.factor),
               CAST(1 AS DOUBLE), (acc, x) -> acc * x)"""), 6))
          .filter(col("d") > 0)
          .select(col("day"), col("n_risk"), col("d").as("n_events"),
            col("c").as("n_censored"), col("survival"))
          .orderBy("day")
      },
      Some("""
        WITH peru AS (
          SELECT user_id, min(epoch_us(ts)) AS t0,
                 min(CASE WHEN event_type = 'purchase' AND value >= 100 THEN epoch_us(ts) END) AS fp,
                 max(epoch_us(ts)) AS tmax
          FROM events GROUP BY user_id),
        tim AS (
          SELECT user_id,
                 CASE WHEN fp IS NOT NULL THEN (fp - t0) // 86400000000
                      ELSE (tmax - t0) // 86400000000 END AS day,
                 CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS event
          FROM peru),
        n AS (SELECT count(*) AS n_total FROM tim),
        byday AS (
          SELECT day, CAST(sum(event) AS BIGINT) AS d,
                 CAST(sum(1 - event) AS BIGINT) AS c
          FROM tim GROUP BY day),
        risked AS (
          SELECT day, d, c,
                 n_total - coalesce(CAST(sum(d + c) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
          FROM byday CROSS JOIN n),
        f AS (
          SELECT day, d, c, n_risk,
                 CASE WHEN d > 0 THEN 1 - CAST(d AS DOUBLE) / n_risk
                      ELSE CAST(1 AS DOUBLE) END AS factor
          FROM risked),
        surv AS (
          SELECT day, d, c, n_risk,
                 round(list_reduce(list_prepend(CAST(1 AS DOUBLE),
                   list(factor) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                   (acc, x) -> acc * x), 6) AS survival
          FROM f)
        SELECT day, n_risk, d AS n_events, c AS n_censored, survival
        FROM surv WHERE d > 0
        ORDER BY day""")),

    // -------------------------------------------------------------------
    // Theil-Sen robust slope per user: the lower median of all pairwise
    // slopes (v_j - v_i)/(j - i) over the event-order series — the
    // outlier-immune trend estimate next to q96's Mann-Kendall test
    // (they pair in the literature: MK decides IF there is a trend,
    // Theil-Sen says HOW steep). Slopes are micro-quantized with FLOOR
    // division made engine-portable by a positivity shift: Spark `div`
    // truncates toward zero but DuckDB `//` floors, so the quotient is
    // computed on the shifted-positive numerator (v_j - v_i + S*dx with
    // S > max|v|) and S*1e6 subtracted back — floor is translation-
    // equivariant, so this IS floor division, identically in both
    // engines. The pair sweep is per-user bounded (the q96 contract);
    // the median is the explicit ranked position (the q103 contract).
    QueryDef("q105_theil_sen",
      (s, d) => {
        val SHIFT = 1000000000L // > max v6 (~3.3e8), makes every numerator positive
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT)").as("v6"))
          .withColumn("pos", row_number().over(
            Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))))
        val a = ev.select(col("user_id"), col("pos").as("pi"), col("v6").as("xi"))
        val b = ev.select(col("user_id").as("ub"), col("pos").as("pj"), col("v6").as("xj"))
        val slopes = a.join(b, col("user_id") === col("ub") && col("pi") < col("pj"))
          .select(col("user_id"),
            (expr(s"(CAST(1000000 AS BIGINT) * (xj - xi + CAST($SHIFT AS BIGINT) * (pj - pi))) div (pj - pi)")
              - lit(SHIFT * 1000000L)).as("slope6"))
        val w = Window.partitionBy("user_id").orderBy(col("slope6"))
        slopes
          .withColumn("i", row_number().over(w))
          .withColumn("np", count(ONE).over(Window.partitionBy("user_id")))
          .filter(expr("i = (np + 1) div 2"))
          .select(col("user_id"), col("np").as("n_pairs"),
            col("slope6").as("med_slope6"),
            round(col("slope6").cast("double") / lit(1e6), 6).as("slope"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6
          FROM events),
        seq AS (
          SELECT user_id, v6,
                 row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS pos
          FROM ev),
        slopes AS (
          SELECT a.user_id,
                 (1000000 * (b.v6 - a.v6 + 1000000000 * (b.pos - a.pos)))
                   // (b.pos - a.pos) - 1000000000000000 AS slope6
          FROM seq a JOIN seq b ON a.user_id = b.user_id AND a.pos < b.pos),
        ranked AS (
          SELECT user_id, slope6,
                 row_number() OVER (PARTITION BY user_id ORDER BY slope6) AS i,
                 count(*) OVER (PARTITION BY user_id) AS np
          FROM slopes)
        SELECT user_id, np AS n_pairs, slope6 AS med_slope6,
               round(CAST(slope6 AS DOUBLE) / 1e6, 6) AS slope
        FROM ranked WHERE i = (np + 1) // 2
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Winsorized and trimmed means per market segment: clamp (or drop)
    // the k = n div 20 most extreme values on each side before
    // averaging — the robust-mean pair to q103's MAD screen; the
    // comparison of the three means (plain/winsorized/trimmed) is the
    // standard tail-contamination diagnostic. Boundary values are the
    // ranked positions k+1 and n-k (exact, engine-independent), sums
    // are exact integer cents, and each mean is one final division.
    QueryDef("q106_winsorized_mean",
      (s, d) => {
        val j = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"),  col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
        // grouped Prefix rank (5 segments × order-sized groups — never
        // one task per segment); per-segment counts ride along as
        // groupCount, no separate agg or join
        Prefix.orderStats(j, Seq(col("cents"), col("o_orderkey")),
            group = Seq("c_mktsegment"), rn = Some("i"), groupCount = Some("n"))
          .withColumn("k", expr("n div 20"))
          .groupBy("c_mktsegment")
          .agg(max(col("n")).as("n_orders"), max(col("k")).as("k"),
            sum(col("cents")).as("sum_all"),
            max(expr("CASE WHEN i = k + 1 THEN cents END")).as("lo_cents"),
            max(expr("CASE WHEN i = n - k THEN cents END")).as("hi_cents"),
            sum(expr("CASE WHEN i > k AND i <= n - k THEN cents ELSE 0 END")).as("sum_mid"),
            sum(expr("CASE WHEN i > k AND i <= n - k THEN 1 ELSE 0 END")).as("n_mid"))
          .select(col("c_mktsegment"), col("n_orders"), col("k"),
            round(col("sum_all").cast("double") / col("n_orders"), 6).as("mean_cents"),
            round((col("sum_mid") + col("k") * (col("lo_cents") + col("hi_cents")))
              .cast("double") / col("n_orders"), 6).as("winsorized_cents"),
            round(col("sum_mid").cast("double") / col("n_mid"), 6).as("trimmed_cents"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH j AS (
          SELECT c_mktsegment, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey),
        ranked AS (
          SELECT c_mktsegment, cents,
                 row_number() OVER (PARTITION BY c_mktsegment ORDER BY cents, o_orderkey) AS i,
                 count(*) OVER (PARTITION BY c_mktsegment) AS n,
                 count(*) OVER (PARTITION BY c_mktsegment) // 20 AS k
          FROM j),
        agg AS (
          SELECT c_mktsegment, max(n) AS n_orders, max(k) AS k,
                 CAST(sum(cents) AS BIGINT) AS sum_all,
                 max(CASE WHEN i = k + 1 THEN cents END) AS lo_cents,
                 max(CASE WHEN i = n - k THEN cents END) AS hi_cents,
                 CAST(sum(CASE WHEN i > k AND i <= n - k THEN cents ELSE 0 END) AS BIGINT) AS sum_mid,
                 CAST(sum(CASE WHEN i > k AND i <= n - k THEN 1 ELSE 0 END) AS BIGINT) AS n_mid
          FROM ranked GROUP BY c_mktsegment)
        SELECT c_mktsegment, n_orders, k,
               round(CAST(sum_all AS DOUBLE) / n_orders, 6) AS mean_cents,
               round(CAST(sum_mid + k * (lo_cents + hi_cents) AS DOUBLE) / n_orders, 6) AS winsorized_cents,
               round(CAST(sum_mid AS DOUBLE) / n_mid, 6) AS trimmed_cents
        FROM agg
        ORDER BY c_mktsegment""")),

    // -------------------------------------------------------------------
    // Offline changepoint detection per user (single change, binary-
    // segmentation step — the retrospective partner of q94's online
    // CUSUM): choose the split k that maximizes the two-segment fit
    // f(k) = S1^2/k + S2^2/(n-k), i.e. the largest between-segment SSE
    // reduction over the one-mean fit S^2/n. The rational f(k) is
    // micro-floor-quantized over a common exact DECIMAL(38) numerator
    // — (S1^2*(n-k) + S2^2*k) * 1e6 div (k*(n-k)) — so the argmax key
    // is an exact integer and tie-break (earliest k) is engine-free.
    // One prefix-sum window + one argmax window per user: linear work,
    // no pair sweep, unlike the q96/q105 O(n^2) statistics.
    QueryDef("q107_changepoint",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            // CENTS, not micro-units: the argmax key is f(k) in squared
            // units x 1e6, and cents keep it under 2^63 for per-user
            // series up to ~10^4 rows (micro-units overflow at n ~ 70)
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("v6"))
        val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val pre = ev
          .withColumn("k", row_number().over(wOrd))
          .withColumn("s1", sum(col("v6").cast("decimal(38,0)"))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", count(ONE).over(Window.partitionBy("user_id")))
          .withColumn("st", sum(col("v6").cast("decimal(38,0)"))
            .over(Window.partitionBy("user_id")))
          .filter(col("k") < col("n"))
          .withColumn("q6", expr(
            """(s1 * s1 * (CAST(n AS DECIMAL(38,0)) - k) + (st - s1) * (st - s1) * k) * 1000000
               div (CAST(k AS DECIMAL(38,0)) * (n - k))"""))
          .withColumn("base6", expr("st * st * 1000000 div CAST(n AS DECIMAL(38,0))"))
        val wBest = Window.partitionBy("user_id").orderBy(col("q6").desc, col("k"))
        pre.withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
          .select(col("user_id"), col("n"), col("k").cast("bigint").as("k_star"),
            (col("q6") - col("base6")).as("gain6"),
            // means as exact round-half-up micro-units then ONE identical
            // IEEE division — round(double, 6) diverged cross-engine on a
            // .x0934375 midpoint at sf0.1 (the t02/s08 knife-edge class)
            (expr("CAST((2 * s1 * 10000 + k) div (2 * CAST(k AS DECIMAL(38,0))) AS BIGINT)")
              .cast("double") / lit(1e6)).as("mean_before"),
            (expr("CAST((2 * (st - s1) * 10000 + (n - k)) div (2 * (CAST(n AS DECIMAL(38,0)) - k)) AS BIGINT)")
              .cast("double") / lit(1e6)).as("mean_after"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v6
          FROM events),
        pre AS (
          SELECT user_id,
                 row_number() OVER w AS k,
                 CAST(sum(CAST(v6 AS HUGEINT)) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS s1,
                 count(*) OVER (PARTITION BY user_id) AS n,
                 CAST(sum(CAST(v6 AS HUGEINT)) OVER (PARTITION BY user_id) AS HUGEINT) AS st
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        scoredcp AS (
          SELECT user_id, k, n, s1, st,
                 (s1 * s1 * (CAST(n AS HUGEINT) - k) + (st - s1) * (st - s1) * k) * 1000000
                   // (CAST(k AS HUGEINT) * (n - k)) AS q6,
                 st * st * 1000000 // CAST(n AS HUGEINT) AS base6
          FROM pre WHERE k < n),
        best AS (
          SELECT user_id, n, k, q6, base6, s1, st,
                 row_number() OVER (PARTITION BY user_id ORDER BY q6 DESC, k) AS rn
          FROM scoredcp)
        SELECT user_id, n, CAST(k AS BIGINT) AS k_star,
               CAST(q6 - base6 AS BIGINT) AS gain6,
               CAST(CAST((2 * s1 * 10000 + k) // (2 * CAST(k AS HUGEINT)) AS BIGINT) AS DOUBLE)
                 / 1e6 AS mean_before,
               CAST(CAST((2 * (st - s1) * 10000 + (n - k)) // (2 * (CAST(n AS HUGEINT) - k)) AS BIGINT) AS DOUBLE)
                 / 1e6 AS mean_after
        FROM best WHERE rn = 1
        ORDER BY user_id"""))
  ) ++ Seq(

    // -------------------------------------------------------------------
    // Holt-Winters additive seasonal smoothing per user (q97's Holt
    // level+trend extended with an m=4 seasonal component over the
    // event-order index): l' = a*(x - s_m) + (1-a)*(l + b),
    // b' = g*(l' - l) + (1-g)*b, s' = d*(x - l') + (1-d)*s_m, with
    // a = g = d = 1/2 so every step is exact dyadic IEEE arithmetic —
    // zero rounding anywhere, outputs compare raw-double-equal. The
    // state is a STRUCT WITH AN ARRAY FIELD (level, trend, 4 seasonal
    // slots, index) threaded through one sequential fold per user:
    // Spark `aggregate` over the sorted values; DuckDB's list_reduce
    // cannot seed a struct init into a double list, so the oracle walks
    // the identical recursion as a recursive CTE carrying a DOUBLE[]
    // column (the q97 oracle shape, plus list state). Scale: one
    // groupBy per user, state O(m), nothing quadratic.
    QueryDef("q108_holt_winters",
      (s, d) => {
        val SIDX = "CAST(acc.i % 4 AS INT) + 1"
        val LNEW = s"0.5 * (x - element_at(acc.s, $SIDX)) + 0.5 * (acc.l + acc.b)"
        Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            col("value"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            expr("transform(sort_array(collect_list(struct(us, event_id, value))), e -> e.value)")
              .as("vals"))
          .filter(col("n_events") >= 2)
          .withColumn("fin", expr(
            s"""aggregate(slice(vals, 2, size(vals) - 1),
                named_struct('l', element_at(vals, 1), 'b', CAST(0 AS DOUBLE),
                  's', array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)),
                  'i', 1),
                (acc, x) -> named_struct(
                  'l', $LNEW,
                  'b', 0.5 * (($LNEW) - acc.l) + 0.5 * acc.b,
                  's', transform(sequence(1, 4), j -> CASE WHEN j = $SIDX
                         THEN 0.5 * (x - ($LNEW)) + 0.5 * element_at(acc.s, j)
                         ELSE element_at(acc.s, j) END),
                  'i', acc.i + 1))"""))
          .select(col("user_id"), col("n_events"),
            col("fin.l").as("level"), col("fin.b").as("trend"),
            expr("element_at(fin.s, 1)").as("s1"),
            expr("element_at(fin.s, 2)").as("s2"),
            expr("element_at(fin.s, 3)").as("s3"),
            expr("element_at(fin.s, 4)").as("s4"),
            expr("fin.l + fin.b + element_at(fin.s, CAST(fin.i % 4 AS INT) + 1)").as("forecast_1"))
          .orderBy("user_id")
      },
      Some {
        val LNEW = "0.5 * (e.value - w.s[(w.pos % 4) + 1]) + 0.5 * (w.l + w.b)"
        s"""
        WITH RECURSIVE ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        seq AS (
          SELECT user_id, value,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS INT) AS pos
          FROM ev),
        stats AS (SELECT user_id, count(*) AS n_events FROM seq GROUP BY user_id),
        walk(user_id, pos, l, b, s) AS (
          SELECT user_id, 1, value, CAST(0 AS DOUBLE),
                 [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]
          FROM seq WHERE pos = 1
          UNION ALL
          SELECT w.user_id, e.pos,
                 $LNEW,
                 0.5 * (($LNEW) - w.l) + 0.5 * w.b,
                 list_transform([1, 2, 3, 4], j -> CASE WHEN j = (w.pos % 4) + 1
                   THEN 0.5 * (e.value - ($LNEW)) + 0.5 * w.s[j]
                   ELSE w.s[j] END)
          FROM walk w JOIN seq e ON e.user_id = w.user_id AND e.pos = w.pos + 1),
        fin AS (
          SELECT w.user_id, t.n_events, w.l, w.b, w.s, w.pos
          FROM walk w JOIN stats t ON w.user_id = t.user_id AND w.pos = t.n_events
          WHERE t.n_events >= 2)
        SELECT user_id, n_events, l AS level, b AS trend,
               s[1] AS s1, s[2] AS s2, s[3] AS s3, s[4] AS s4,
               l + b + s[(pos % 4) + 1] AS forecast_1
        FROM fin
        ORDER BY user_id"""
      }),

    // -------------------------------------------------------------------
    // Rule-table data-quality engine: a declared rule set evaluated in
    // ONE scan — each event computes all five violation flags, the
    // flags unpivot into (rule, violated) rows, and the rollup reports
    // checked/violation counts, exact ppm rates, and the first
    // offending event id per rule (q68's DQ audit generalized from
    // hard-coded checks to a rule-shaped result a quarantine pipeline
    // consumes). Passing rules stay in the output with zero violations
    // — absence-of-violations is itself the auditable fact. One narrow
    // projection + explode + one partial agg; nothing joins.
    QueryDef("q109_dq_rules",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_id"),
            expr("""array(
              named_struct('rule', 'r1_value_nonneg',  'bad', value < 0),
              named_struct('rule', 'r2_value_cap_100', 'bad', value > 100),
              named_struct('rule', 'r3_ts_in_2024',    'bad', year(ts) <> 2024),
              named_struct('rule', 'r4_campaign_le_50',
                'bad', CAST(get_json_object(props, '$.k') AS BIGINT) > 50),
              named_struct('rule', 'r5_type_known',
                'bad', NOT event_type IN ('view','click','purchase','signup','error'))
            )""").as("checks"))
          .select(col("event_id"), explode(col("checks")).as("c"))
          .select(col("event_id"), col("c.rule").as("rule"), col("c.bad").as("bad"))
          .groupBy("rule")
          .agg(count(ONE).as("n_checked"),
            sum(when(col("bad"), 1L).otherwise(0L)).as("n_violations"),
            min(when(col("bad"), col("event_id"))).as("first_bad_event"))
          .withColumn("violation_ppm", expr("1000000 * n_violations div n_checked"))
          .select(col("rule"), col("n_checked"), col("n_violations"),
            col("violation_ppm"), col("first_bad_event"))
          .orderBy("rule")
      },
      Some("""
        WITH checks AS (
          SELECT event_id,
                 unnest([
                   struct_pack(rule := 'r1_value_nonneg',  bad := value < 0),
                   struct_pack(rule := 'r2_value_cap_100', bad := value > 100),
                   struct_pack(rule := 'r3_ts_in_2024',    bad := year(ts) <> 2024),
                   struct_pack(rule := 'r4_campaign_le_50',
                     bad := CAST(json_extract_string(props, '$.k') AS BIGINT) > 50),
                   struct_pack(rule := 'r5_type_known',
                     bad := NOT event_type IN ('view','click','purchase','signup','error'))
                 ]) AS c
          FROM events),
        flat AS (SELECT event_id, c.rule AS rule, c.bad AS bad FROM checks)
        SELECT rule, count(*) AS n_checked,
               CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               1000000 * CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) // count(*) AS violation_ppm,
               min(CASE WHEN bad THEN event_id END) AS first_bad_event
        FROM flat
        GROUP BY rule
        ORDER BY rule""")),

    // -------------------------------------------------------------------
    // Poisson bootstrap confidence intervals for the per-segment mean
    // order value — the bootstrap that actually scales: instead of
    // drawing n-with-replacement resamples (a global operation), each
    // row independently receives a Poisson(1) multiplicity per replica
    // (Chamandy et al. 2012), so 16 replicas are one narrow projection
    // + one partial agg. Multiplicities are md5-derived: TWO md5s per
    // row yield 16 disjoint 16-bit lanes (one per replica — substr of
    // the hex, no per-replica hashing: 2 digest evals instead of 16),
    // and each lane is pushed through the Poisson(1) CDF as EXACT
    // INTEGER thresholds (floor(CDF(k) * 2^16) literals — no float
    // comparison), so every replica is deterministic cross-engine.
    // Replica means are round-half-up micro-cents (the q107 recipe);
    // the CI is the 2nd/15th ranked replica mean (~90%). The spec
    // checks conservation and that the interval brackets the point
    // estimate.
    QueryDef("q110_poisson_bootstrap",
      (s, d) => {
        val base = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"),
            expr("md5(concat('boot:a:', CAST(o_orderkey AS STRING)))").as("h1"),
            expr("md5(concat('boot:b:', CAST(o_orderkey AS STRING)))").as("h2"))
        // all 16 multiplicities in ONE per-row projection (each md5
        // evaluated exactly once, 8 lanes each), fanned out by posexplode
        // — no replica join at all; pos IS the replica id
        // the 32 hex chars of each md5 parse as three BIGINT chunks
        // (48+48+32 bits); the 16-bit lanes then slice out with shifts —
        // 6 conv()s per row total, everything whole-stage-codegen'd (an
        // HOF spelling of the same array ran ~30% slower: lambda
        // interpretation off the codegen path)
        def lane(chunk: String, shift: Int) =
          if (shift == 0) s"($chunk & 65535)" else s"(shiftright($chunk, $shift) & 65535)"
        val lanes = for {
          (h, cs) <- Seq("h1" -> Seq("cA", "cB", "cC"), "h2" -> Seq("cD", "cE", "cF"))
          l <- Seq(lane(cs(0), 32), lane(cs(0), 16), lane(cs(0), 0),
            lane(cs(1), 32), lane(cs(1), 16), lane(cs(1), 0),
            lane(cs(2), 16), lane(cs(2), 0))
        } yield l
        val wArr = lanes.map(l =>
          s"""CASE WHEN $l < 24109 THEN 0 WHEN $l < 48218 THEN 1
              WHEN $l < 60273 THEN 2 WHEN $l < 64291 THEN 3
              WHEN $l < 65296 THEN 4 WHEN $l < 65497 THEN 5
              ELSE 6 END""").mkString("array(", ", ", ")")
        val weighted = base
          .withColumn("cA", expr("CAST(conv(substr(h1, 1, 12), 16, 10) AS BIGINT)"))
          .withColumn("cB", expr("CAST(conv(substr(h1, 13, 12), 16, 10) AS BIGINT)"))
          .withColumn("cC", expr("CAST(conv(substr(h1, 25, 8), 16, 10) AS BIGINT)"))
          .withColumn("cD", expr("CAST(conv(substr(h2, 1, 12), 16, 10) AS BIGINT)"))
          .withColumn("cE", expr("CAST(conv(substr(h2, 13, 12), 16, 10) AS BIGINT)"))
          .withColumn("cF", expr("CAST(conv(substr(h2, 25, 8), 16, 10) AS BIGINT)"))
          .select(col("c_mktsegment"), col("o_orderkey"), col("cents"),
            posexplode(expr(wArr)))
          .withColumnRenamed("pos", "rep").withColumnRenamed("col", "w")
        val repMeans = weighted.groupBy("c_mktsegment", "rep")
          .agg(sum(col("w") * col("cents")).as("wsum"), sum(col("w")).as("wn"))
          .filter(col("wn") > 0)
          .withColumn("mean6", expr(
            "CAST((2 * wsum * 10000 + wn) div (2 * wn) AS BIGINT)"))
        val wRank = Window.partitionBy("c_mktsegment").orderBy(col("mean6"), col("rep"))
        val ci = repMeans.withColumn("rk", row_number().over(wRank))
          .groupBy("c_mktsegment")
          .agg(count(ONE).as("n_reps"),
            max(when(col("rk") === 2, col("mean6"))).as("lo6"),
            max(when(col("rk") === 15, col("mean6"))).as("hi6"))
        val point = base.groupBy("c_mktsegment")
          .agg(count(ONE).as("n_orders"),
            expr("CAST((2 * sum(cents) * 10000 + count(1)) div (2 * count(1)) AS BIGINT)").as("point6"))
        point.join(ci, "c_mktsegment")
          .select(col("c_mktsegment"), col("n_orders"), col("n_reps"),
            (col("point6").cast("double") / lit(1e6)).as("mean_cents"),
            (col("lo6").cast("double") / lit(1e6)).as("ci_lo_cents"),
            (col("hi6").cast("double") / lit(1e6)).as("ci_hi_cents"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH base AS (
          SELECT c_mktsegment, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
                 md5('boot:a:' || CAST(o_orderkey AS VARCHAR)) AS h1,
                 md5('boot:b:' || CAST(o_orderkey AS VARCHAR)) AS h2
          FROM orders JOIN customer ON o_custkey = c_custkey),
        reps AS (SELECT unnest(generate_series(0, 15)) AS rep),
        lanes AS (
          SELECT c_mktsegment, o_orderkey, cents, rep,
                 CAST('0x' || CASE WHEN rep < 8 THEN substr(h1, 4 * rep + 1, 4)
                                   ELSE substr(h2, 4 * (rep - 8) + 1, 4) END AS BIGINT) AS h
          FROM base CROSS JOIN reps),
        weighted AS (
          SELECT c_mktsegment, o_orderkey, cents, rep,
                 CASE WHEN h < 24109 THEN 0 WHEN h < 48218 THEN 1 WHEN h < 60273 THEN 2 WHEN h < 64291 THEN 3 WHEN h < 65296 THEN 4 WHEN h < 65497 THEN 5 ELSE 6 END AS w
          FROM lanes),
        repmeans AS (
          SELECT c_mktsegment, rep,
                 CAST((2 * sum(w * cents) * 10000 + sum(w)) // (2 * sum(w)) AS BIGINT) AS mean6
          FROM weighted GROUP BY c_mktsegment, rep
          HAVING sum(w) > 0),
        ranked AS (
          SELECT c_mktsegment, rep, mean6,
                 row_number() OVER (PARTITION BY c_mktsegment ORDER BY mean6, rep) AS rk
          FROM repmeans),
        ci AS (
          SELECT c_mktsegment, count(*) AS n_reps,
                 max(CASE WHEN rk = 2 THEN mean6 END) AS lo6,
                 max(CASE WHEN rk = 15 THEN mean6 END) AS hi6
          FROM ranked GROUP BY c_mktsegment),
        pt AS (
          SELECT c_mktsegment, count(*) AS n_orders,
                 CAST((2 * sum(cents) * 10000 + count(*)) // (2 * count(*)) AS BIGINT) AS point6
          FROM base GROUP BY c_mktsegment)
        SELECT p.c_mktsegment, p.n_orders, c.n_reps,
               CAST(p.point6 AS DOUBLE) / 1e6 AS mean_cents,
               CAST(c.lo6 AS DOUBLE) / 1e6 AS ci_lo_cents,
               CAST(c.hi6 AS DOUBLE) / 1e6 AS ci_hi_cents
        FROM pt p JOIN ci c USING (c_mktsegment)
        ORDER BY p.c_mktsegment""")),

    // -------------------------------------------------------------------
    // Neyman sampling allocation: split a 1000-row sample budget across
    // market segments proportionally to N_h * S_h (stratum size times
    // standard deviation — the variance-minimizing allocation for
    // stratified estimation). S_h comes from exact integer moment sums
    // (one sqrt — the identical IEEE expression both engines); the
    // weights are micro-quantized (t01 recipe) and the integer budget
    // is split by largest-remainder (the q89 cent-conservation recipe),
    // so allocations are exact integers that provably sum to 1000.
    QueryDef("q111_neyman_allocation",
      (s, d) => {
        val BUDGET = 1000L
        val stats = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
          .groupBy("c_mktsegment")
          .agg(count(ONE).as("nh"),
            sum(col("cents").cast("decimal(38,0)")).as("sx"),
            sum((col("cents").cast("decimal(38,0)") * col("cents")).cast("decimal(38,0)")).as("sx2"))
          .withColumn("sd", expr(
            "sqrt(CAST(nh * sx2 - sx * sx AS DOUBLE)) / nh"))
          .withColumn("w6", expr("CAST(round(nh * sd * 1e6, 0) AS BIGINT)"))
        val tot = stats.agg(sum(col("w6")).as("wtot"))
        val based = stats.crossJoin(tot)
          .withColumn("base", expr(s"(CAST($BUDGET AS DECIMAL(38,0)) * w6) div wtot"))
          .withColumn("rem", expr(s"CAST((CAST($BUDGET AS DECIMAL(38,0)) * w6) % wtot AS BIGINT)"))
        // bounded: one row per market segment (5), never customer-sized
        val wR = Window.orderBy(col("rem").desc, col("c_mktsegment"))
        based
          .withColumn("leftover", lit(BUDGET) - sum(col("base")).over(Window.partitionBy()))
          .withColumn("rk", row_number().over(wR))
          .withColumn("n_alloc",
            (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L)).cast("long"))
          .select(col("c_mktsegment"), col("nh").as("n_orders"),
            round(col("sd"), 6).as("sd_cents"), col("n_alloc"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH j AS (
          SELECT c_mktsegment,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey),
        stats AS (
          SELECT c_mktsegment, count(*) AS nh,
                 CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sx2
          FROM j GROUP BY c_mktsegment),
        wtd AS (
          SELECT c_mktsegment, nh,
                 sqrt(CAST(nh * sx2 - sx * sx AS DOUBLE)) / nh AS sd,
                 CAST(round(nh * (sqrt(CAST(nh * sx2 - sx * sx AS DOUBLE)) / nh) * 1e6, 0) AS BIGINT) AS w6
          FROM stats),
        tot AS (SELECT CAST(sum(w6) AS BIGINT) AS wtot FROM wtd),
        based AS (
          SELECT c_mktsegment, nh, sd, w6,
                 CAST((1000 * CAST(w6 AS HUGEINT)) // wtot AS BIGINT) AS base,
                 CAST((1000 * CAST(w6 AS HUGEINT)) % wtot AS BIGINT) AS rem
          FROM wtd CROSS JOIN tot),
        fin AS (
          SELECT c_mktsegment, nh, sd, base, rem,
                 1000 - sum(base) OVER () AS leftover,
                 row_number() OVER (ORDER BY rem DESC, c_mktsegment) AS rk
          FROM based)
        SELECT c_mktsegment, nh AS n_orders,
               round(sd, 6) AS sd_cents,
               CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
        FROM fin
        ORDER BY c_mktsegment""")),

    // -------------------------------------------------------------------
    // Wald-Wolfowitz runs test per user: is the above/below-median
    // sequence of event values random, or does it streak? (The
    // randomness audit that catches both autocorrelated drifts AND
    // value alternation — complements q96's monotone-trend test.)
    // Values equal to the per-user lower median are dropped (the
    // textbook treatment); n1/n2/R are exact integers from one ordered
    // window pass, and z = (R - mu)/sigma is built from them by the
    // IDENTICAL double expression in both engines, rounded to 6.
    QueryDef("q112_runs_test",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        val wMed = Window.partitionBy("user_id").orderBy(col("cents"), col("event_id"))
        val med = ev
          .withColumn("i", row_number().over(wMed))
          .withColumn("n", count(ONE).over(Window.partitionBy("user_id")))
          .filter(expr("i = (n + 1) div 2"))
          .select(col("user_id").as("mu_id"), col("cents").as("med"))
        val signed = ev.join(med, col("user_id") === col("mu_id"))
          .filter(col("cents") =!= col("med"))
          .withColumn("above", (col("cents") > col("med")).cast("int"))
        val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val runs = signed
          .withColumn("prev", lag(col("above"), 1).over(wOrd))
          .groupBy("user_id")
          .agg(sum(col("above")).as("n1"),
            sum(lit(1) - col("above")).as("n2"),
            (sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
              .otherwise(0L))).as("r"))
          .filter(col("n1") > 0 && col("n2") > 0)
        runs
          // CAST(2 AS DOUBLE), not the literal 2.0: both engines parse a
          // bare 2.0 as DECIMAL and their decimal-division rounding rules
          // differ — the whole z diverged at 1e-6 until every constant was
          // forced to double (the repo-wide CAST(0 AS DOUBLE) convention)
          .withColumn("mu", expr("CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + CAST(1 AS DOUBLE)"))
          .withColumn("sigma", expr("sqrt(CAST(2 AS DOUBLE) * n1 * n2 * (CAST(2 AS DOUBLE) * n1 * n2 - n1 - n2) / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))"))
          // floor-quantized z: round(double, 6) diverged cross-engine on a
          // decimal-midpoint z at sf0.001 (Spark rounds the shortest decimal
          // repr, DuckDB the exact binary value); floor is the same exact
          // operation on the same double in both engines
          .select(col("user_id"), col("n1"), col("n2"), col("r").as("n_runs"),
            (floor(expr("((CAST(r AS DOUBLE) - mu) / sigma) * 1e6")).cast("double") / lit(1e6)).as("z"),
            (abs(expr("(CAST(r AS DOUBLE) - mu) / sigma")) > 1.96).as("nonrandom_05"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        ranked AS (
          SELECT user_id, cents,
                 row_number() OVER (PARTITION BY user_id ORDER BY cents, event_id) AS i,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM ev),
        med AS (SELECT user_id AS mu_id, cents AS med FROM ranked WHERE i = (n + 1) // 2),
        signed AS (
          SELECT user_id, us, event_id,
                 CAST(cents > med AS INT) AS above
          FROM ev JOIN med ON user_id = mu_id
          WHERE cents <> med),
        lagged AS (
          SELECT user_id, above,
                 lag(above, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
          FROM signed),
        runs AS (
          SELECT user_id,
                 CAST(sum(above) AS BIGINT) AS n1,
                 CAST(sum(1 - above) AS BIGINT) AS n2,
                 CAST(sum(CASE WHEN prev IS NULL OR prev <> above THEN 1 ELSE 0 END) AS BIGINT) AS r
          FROM lagged GROUP BY user_id
          HAVING sum(above) > 0 AND sum(1 - above) > 0),
        z AS (
          SELECT user_id, n1, n2, r,
                 CAST(2 AS DOUBLE) * n1 * n2 / (n1 + n2) + CAST(1 AS DOUBLE) AS mu,
                 sqrt(CAST(2 AS DOUBLE) * n1 * n2 * (CAST(2 AS DOUBLE) * n1 * n2 - n1 - n2) / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))) AS sigma
          FROM runs)
        SELECT user_id, n1, n2, r AS n_runs,
               CAST(CAST(floor(((CAST(r AS DOUBLE) - mu) / sigma) * 1e6) AS BIGINT) AS DOUBLE)
                 / 1e6 AS z,
               abs((CAST(r AS DOUBLE) - mu) / sigma) > 1.96 AS nonrandom_05
        FROM z
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // ABC (Pareto) inventory classification: parts ranked by exact
    // revenue cents, class A = the head covering <= 80% of cumulative
    // revenue, B to 95%, C the tail — the warehouse prioritization
    // rollup (q95's Gini says HOW concentrated; this says WHICH items
    // make up the head). Cumulative shares are exact ppm on integer
    // cents with a total (revenue, partkey) order, so class boundaries
    // are engine-free. One agg + one window + one rollup.
    QueryDef("q113_abc_analysis",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy("l_partkey")
          .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .as("rev_cents"))
        // cumulative revenue over the PART dimension: a two-pass
        // range-partitioned prefix sum (Prefix.orderStats), not a
        // single-task global window — exact longs, so regrouping is
        // lossless and the class boundaries are unchanged; the grand
        // total rides along as an ungrouped groupSums column instead of
        // a separate scalar agg cross-joined back (one rev scan, not two)
        Prefix.orderStats(rev, Seq(col("rev_cents").desc, col("l_partkey")),
            cumSums = Seq(("rev_cents", "cum")),
            groupSums = Seq(("rev_cents", "total")))
          .withColumn("cum_ppm", expr("1000000 * cum div total"))
          .withColumn("abc_class",
            when(col("cum_ppm") <= 800000, "A")
              .when(col("cum_ppm") <= 950000, "B").otherwise("C"))
          .groupBy("abc_class")
          .agg(count(ONE).as("n_parts"),
            sum(col("rev_cents")).as("revenue_cents"),
            max(col("total")).as("total"))
          .withColumn("share_ppm", expr("1000000 * revenue_cents div total"))
          .select(col("abc_class"), col("n_parts"), col("revenue_cents"), col("share_ppm"))
          .orderBy("abc_class")
      },
      Some("""
        WITH rev AS (
          SELECT l_partkey,
                 CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
          FROM lineitem GROUP BY l_partkey),
        tot AS (SELECT CAST(sum(rev_cents) AS BIGINT) AS total FROM rev),
        cum AS (
          SELECT l_partkey, rev_cents,
                 CAST(sum(rev_cents) OVER (ORDER BY rev_cents DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
          FROM rev),
        classed AS (
          SELECT l_partkey, rev_cents,
                 CASE WHEN 1000000 * cum // total <= 800000 THEN 'A'
                      WHEN 1000000 * cum // total <= 950000 THEN 'B'
                      ELSE 'C' END AS abc_class
          FROM cum CROSS JOIN tot)
        SELECT abc_class, count(*) AS n_parts,
               CAST(sum(rev_cents) AS BIGINT) AS revenue_cents,
               1000000 * CAST(sum(rev_cents) AS BIGINT) // max(total) AS share_ppm
        FROM classed CROSS JOIN tot
        GROUP BY abc_class
        ORDER BY abc_class""")),

    // -------------------------------------------------------------------
    // First-order Markov transition matrix over event types per user
    // session stream: P(next = to | current = from) as exact ppm from
    // lead() pairs — the behavioral model every journey/funnel analysis
    // starts from (q65 mines specific paths; this is the full
    // transition operator). One window pass for the pairs, one groupBy
    // for the matrix, one broadcast row-marginal join.
    QueryDef("q114_markov_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(ONE).as("n"))
        val rowm = pairs.groupBy(col("from_type").as("ft")).agg(sum(col("n")).as("row_n"))
        pairs.join(broadcast(rowm), col("from_type") === col("ft"))
          .select(col("from_type"), col("to_type"), col("n"),
            expr("1000000 * n div row_n").as("p_ppm"))
          .orderBy("from_type", "to_type")
      },
      Some("""
        WITH seq AS (
          SELECT user_id, event_type,
                 lead(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS next_type
          FROM events),
        pairs AS (
          SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type),
        rowm AS (SELECT from_type AS ft, CAST(sum(n) AS BIGINT) AS row_n
                 FROM pairs GROUP BY from_type)
        SELECT from_type, to_type, n, 1000000 * n // row_n AS p_ppm
        FROM pairs JOIN rowm ON from_type = ft
        ORDER BY from_type, to_type"""))
  ) ++ Seq(

    // -------------------------------------------------------------------
    // Population Stability Index: the model-monitoring drift score over
    // the event-value distribution, early time half vs late (split at
    // the exact [min,max] timestamp midpoint). 10 equi-width bins over
    // the global cents range (integer edges — both engines bin
    // identically), Laplace +1 smoothing so empty bins are defined, and
    // PSI = sum (p-q)*ln(p/q) per bin emitted as floor-quantized micro
    // units (ln is irrational → the q112 floor recipe, not round).
    // Pairs with t24's KS distance (continuous CDF) and s19's embedding
    // drift: this is the binned-fraction monitor ops teams actually
    // alarm on (PSI > 0.2 rule). Scale: two narrow passes (extrema,
    // bin counts) + a 10-row broadcast — no shuffle wider than 10 rows
    // after the first aggregate.
    QueryDef("q115_psi",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(unix_micros(col("ts")).as("us"),
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
        val ext = ev.agg(min(col("us")).as("us_min"), max(col("us")).as("us_max"),
          min(col("cents")).as("c_min"), max(col("cents")).as("c_max"))
        val counts = ev.crossJoin(broadcast(ext))
          .select(expr("CAST(us * 2 >= us_min + us_max AS INT)").as("half"),
            expr("CAST(least(9, (cents - c_min) * 10 div (c_max - c_min + 1)) AS INT)").as("bin"))
          .groupBy("bin")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("en"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("ln_"))
        val bins = s.range(10).select(col("id").cast("int").as("bin"))
        val filled = bins.join(counts, Seq("bin"), "left")
          .select(col("bin"), coalesce(col("en"), lit(0L)).as("e_n"),
            coalesce(col("ln_"), lit(0L)).as("l_n"))
        val tot = filled.agg(sum(col("e_n")).as("e_all"), sum(col("l_n")).as("l_all"))
        filled.crossJoin(broadcast(tot))
          .select(col("bin"), col("e_n"), col("l_n"),
            expr("""CAST(floor(1e6 * (CAST(e_n + 1 AS DOUBLE) / (e_all + 10)
                                      - CAST(l_n + 1 AS DOUBLE) / (l_all + 10))
                                 * ln((CAST(e_n + 1 AS DOUBLE) * (l_all + 10))
                                      / (CAST(l_n + 1 AS DOUBLE) * (e_all + 10))))
                    AS BIGINT)""").as("psi_term_micro"))
          .orderBy("bin")
      },
      Some("""
        WITH ev AS (
          SELECT epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events),
        ext AS (SELECT min(us) AS us_min, max(us) AS us_max,
                       min(cents) AS c_min, max(cents) AS c_max FROM ev),
        halves AS (
          SELECT CAST(us * 2 >= us_min + us_max AS INT) AS half,
                 CAST(least(9, (cents - c_min) * 10 // (c_max - c_min + 1)) AS INT) AS bin
          FROM ev CROSS JOIN ext),
        counts AS (
          SELECT bin,
                 CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS en,
                 CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ln_
          FROM halves GROUP BY bin),
        filled AS (
          SELECT i AS bin, coalesce(en, 0) AS e_n, coalesce(ln_, 0) AS l_n
          FROM generate_series(0, 9) t(i) LEFT JOIN counts ON i = bin),
        tot AS (SELECT CAST(sum(e_n) AS BIGINT) AS e_all,
                       CAST(sum(l_n) AS BIGINT) AS l_all FROM filled)
        SELECT bin, e_n, l_n,
               CAST(floor(1e6 * (CAST(e_n + 1 AS DOUBLE) / (e_all + 10)
                                 - CAST(l_n + 1 AS DOUBLE) / (l_all + 10))
                            * ln((CAST(e_n + 1 AS DOUBLE) * (l_all + 10))
                                 / (CAST(l_n + 1 AS DOUBLE) * (e_all + 10))))
               AS BIGINT) AS psi_term_micro
        FROM filled CROSS JOIN tot
        ORDER BY bin""")),

    // -------------------------------------------------------------------
    // Kendall tau-b rank association per nation between a customer's
    // account balance and their lifetime order spend — the
    // cross-sectional sibling of q96's within-series Mann-Kendall
    // trend. Concordant/discordant/tie counts are exact integers from
    // an i<j pair join WITHIN each nation (pairs bounded by group size
    // squared, the same documented bound as q96's per-user pairs; the
    // O(n log n) merge-sort tau doesn't decompose into partial
    // aggregates). One sqrt at the end, floor-quantized micro tau.
    QueryDef("q116_kendall_tau",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).as("sp"))
        val base = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_nationkey"),
            expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("bal"),
            coalesce(col("sp"), lit(0L)).as("spend"))
        val a = base.select(col("c_nationkey").as("nk"), col("c_custkey").as("ka"),
          col("bal").as("xa"), col("spend").as("ya"))
        val b = base.select(col("c_nationkey").as("nkb"), col("c_custkey").as("kb"),
          col("bal").as("xb"), col("spend").as("yb"))
        val stats = a.join(b, col("nk") === col("nkb") && col("ka") < col("kb"))
          .select(col("nk"),
            expr("CASE WHEN xb > xa THEN 1 WHEN xb < xa THEN -1 ELSE 0 END").as("cx"),
            expr("CASE WHEN yb > ya THEN 1 WHEN yb < ya THEN -1 ELSE 0 END").as("cy"))
          .groupBy("nk")
          .agg(sum(when(expr("cx * cy = 1"), 1L).otherwise(0L)).as("c"),
            sum(when(expr("cx * cy = -1"), 1L).otherwise(0L)).as("disc"),
            sum(when(col("cx") === 0, 1L).otherwise(0L)).as("tx"),
            sum(when(col("cy") === 0, 1L).otherwise(0L)).as("ty"),
            count(ONE).as("n0"))
        stats.join(broadcast(Tables.nation(s, d)), col("nk") === col("n_nationkey"))
          .filter(expr("(n0 - tx) * (n0 - ty) > 0"))
          .select(col("n_name"), col("n0").as("n_pairs"),
            col("c").as("concordant"), col("disc").as("discordant"),
            expr("""CAST(floor(1e6 * CAST(c - disc AS DOUBLE)
                               / sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE))) AS BIGINT)""")
              .as("tau_micro"))
          .orderBy("n_name")
      },
      Some("""
        WITH spend AS (
          SELECT o_custkey,
                 CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS sp
          FROM orders GROUP BY o_custkey),
        base AS (
          SELECT c_custkey, c_nationkey,
                 CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS bal,
                 coalesce(sp, 0) AS spend
          FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        pairs AS (
          SELECT a.c_nationkey AS nk,
                 CASE WHEN b.bal > a.bal THEN 1 WHEN b.bal < a.bal THEN -1 ELSE 0 END AS cx,
                 CASE WHEN b.spend > a.spend THEN 1 WHEN b.spend < a.spend THEN -1 ELSE 0 END AS cy
          FROM base a JOIN base b
            ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey),
        stats AS (
          SELECT nk,
                 CAST(sum(CASE WHEN cx * cy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                 CAST(sum(CASE WHEN cx * cy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS disc,
                 CAST(sum(CASE WHEN cx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
                 CAST(sum(CASE WHEN cy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty,
                 count(*) AS n0
          FROM pairs GROUP BY nk)
        SELECT n_name, n0 AS n_pairs, c AS concordant, disc AS discordant,
               CAST(floor(1e6 * CAST(c - disc AS DOUBLE)
                          / sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE))) AS BIGINT) AS tau_micro
        FROM stats JOIN nation ON nk = n_nationkey
        WHERE (n0 - tx) * (n0 - ty) > 0
        ORDER BY n_name""")),

    // -------------------------------------------------------------------
    // Spearman rank correlation per market segment between account
    // balance and lifetime spend — q116's large-group partner. Average
    // tie ranks are kept EXACT by doubling: 2*avg_rank = 2*min_rank +
    // ties - 1 (integer), so the Pearson-on-ranks formula runs on exact
    // integer sufficient statistics (the q79 recipe) with one sqrt per
    // factor at the end. Two rank windows per segment — scale-clean
    // (no pair join; this is the O(n log n) rank path q116 can't take
    // because tau needs pair orientation, rho only needs ranks).
    QueryDef("q117_spearman",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).as("sp"))
        val base = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_mktsegment"),
            expr("CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT)").as("bal"),
            coalesce(col("sp"), lit(0L)).as("spend"))
        val ranked = base
          .withColumn("rx", expr("2 * (rank() OVER (PARTITION BY c_mktsegment ORDER BY bal)) + (count(*) OVER (PARTITION BY c_mktsegment, bal)) - 1"))
          .withColumn("ry", expr("2 * (rank() OVER (PARTITION BY c_mktsegment ORDER BY spend)) + (count(*) OVER (PARTITION BY c_mktsegment, spend)) - 1"))
        ranked.groupBy("c_mktsegment")
          .agg(count(ONE).as("n"),
            sum(expr("CAST(rx AS DECIMAL(38,0))")).as("sx"),
            sum(expr("CAST(ry AS DECIMAL(38,0))")).as("sy"),
            sum(expr("CAST(rx AS DECIMAL(38,0)) * rx")).as("sxx"),
            sum(expr("CAST(ry AS DECIMAL(38,0)) * ry")).as("syy"),
            sum(expr("CAST(rx AS DECIMAL(38,0)) * ry")).as("sxy"))
          .select(col("c_mktsegment"), col("n").as("n_cust"),
            expr("""CAST(floor(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
                               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)""")
              .as("rho_micro"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH spend AS (
          SELECT o_custkey,
                 CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS sp
          FROM orders GROUP BY o_custkey),
        base AS (
          SELECT c_mktsegment,
                 CAST(CAST(c_acctbal AS DECIMAL(14,2)) * 100 AS BIGINT) AS bal,
                 coalesce(sp, 0) AS spend
          FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        ranked AS (
          SELECT c_mktsegment,
                 2 * (rank() OVER (PARTITION BY c_mktsegment ORDER BY bal))
                   + (count(*) OVER (PARTITION BY c_mktsegment, bal)) - 1 AS rx,
                 2 * (rank() OVER (PARTITION BY c_mktsegment ORDER BY spend))
                   + (count(*) OVER (PARTITION BY c_mktsegment, spend)) - 1 AS ry
          FROM base),
        stats AS (
          SELECT c_mktsegment, count(*) AS n,
                 CAST(sum(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy,
                 CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy
          FROM ranked GROUP BY c_mktsegment)
        SELECT c_mktsegment, n AS n_cust,
               CAST(floor(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
                          / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                             * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT) AS rho_micro
        FROM stats
        ORDER BY c_mktsegment""")),

    // -------------------------------------------------------------------
    // Herfindahl-Hirschman supplier-concentration index per nation:
    // HHI = sum of squared revenue shares, the antitrust/marketplace
    // concentration metric that q95's Gini ranks by inequality but
    // cannot express as "effective number of players". Every term is
    // exact: supplier cents, sum of squared cents in DECIMAL(38)/
    // HUGEINT, and ONE integer division 1e6*sumsq div total^2 at the
    // end — partitioning-invariant by construction. Two shuffles
    // (supplier rollup, nation rollup) + a broadcast nation join.
    QueryDef("q118_hhi",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey"), col("s_suppkey"))
          .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .as("cents"))
        rev.groupBy("s_nationkey")
          .agg(count(ONE).as("n_suppliers"),
            sum(col("cents")).as("total_cents"),
            max(col("cents")).as("max_cents"),
            sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("sumsq"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("n_suppliers"), col("total_cents"),
            expr("""CAST(CAST(1000000 AS DECIMAL(38,0)) * sumsq
                    div (CAST(total_cents AS DECIMAL(38,0)) * total_cents) AS BIGINT)""")
              .as("hhi_ppm"),
            expr("CAST(1000000 * CAST(max_cents AS DECIMAL(38,0)) div total_cents AS BIGINT)")
              .as("top_share_ppm"))
          .orderBy("n_name")
      },
      Some("""
        WITH rev AS (
          SELECT s_nationkey, s_suppkey,
                 CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY s_nationkey, s_suppkey),
        agg AS (
          SELECT s_nationkey, count(*) AS n_suppliers,
                 CAST(sum(cents) AS BIGINT) AS total_cents,
                 CAST(max(cents) AS BIGINT) AS max_cents,
                 sum(CAST(cents AS HUGEINT) * cents) AS sumsq
          FROM rev GROUP BY s_nationkey)
        SELECT n_name, n_suppliers, total_cents,
               CAST(CAST(1000000 AS HUGEINT) * sumsq
                    // (CAST(total_cents AS HUGEINT) * total_cents) AS BIGINT) AS hhi_ppm,
               CAST(1000000 * CAST(max_cents AS HUGEINT) // total_cents AS BIGINT) AS top_share_ppm
        FROM agg JOIN nation ON s_nationkey = n_nationkey
        ORDER BY n_name""")),

    // -------------------------------------------------------------------
    // Volume-weighted average price per part — q88's TWAP weighted by
    // traded quantity instead of holding time (the execution-quality
    // benchmark). Quantity in exact hundredth-units, price in exact
    // cents, and the VWAP itself via the exact round-half-up integer
    // division (2N + D) div (2D) on micro-scaled cents — the q62/q88
    // recipe, so no double ever appears. One partial-aggregable
    // shuffle on l_partkey.
    QueryDef("q119_vwap",
      (s, d) => {
        Tables.lineitem(s, d)
          .groupBy("l_partkey")
          .agg(count(ONE).as("n_lines"),
            sum(expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("qty_units"),
            sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)")).as("price_cents"))
          .select(col("l_partkey"), col("n_lines"), col("qty_units"), col("price_cents"),
            expr("""(2 * (CAST(100000000 AS BIGINT) * price_cents) + qty_units)
                    div (2 * qty_units)""").as("vwap_micro"))
          .orderBy("l_partkey")
      },
      Some("""
        WITH agg AS (
          SELECT l_partkey, count(*) AS n_lines,
                 CAST(sum(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS qty_units,
                 CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS price_cents
          FROM lineitem GROUP BY l_partkey)
        SELECT l_partkey, n_lines, qty_units, price_cents,
               CAST((2 * (CAST(100000000 AS BIGINT) * price_cents) + qty_units)
                    // (2 * qty_units) AS BIGINT) AS vwap_micro
        FROM agg
        ORDER BY l_partkey""")),

    // -------------------------------------------------------------------
    // SAX symbolization (Lin/Keogh): each user's event-value series →
    // an 8-segment PAA (integer-floor segment split (pos-1)*8 div n —
    // the oracle-able simplification of fractional PAA weighting) →
    // z-normalized per user from exact integer moments → a 4-letter
    // alphabet at the N(0,1) quartile breakpoints (±0.6745, 0). The
    // output word is the indexable shape signature time-series motif /
    // anomaly search runs on. Doubles appear only in the final z
    // (identical expression text both engines); one window pass + two
    // shuffles, all group-bounded.
    QueryDef("q120_sax",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
          .withColumn("pos", row_number().over(w))
          .withColumn("n", count(ONE).over(Window.partitionBy("user_id")))
          .withColumn("seg", expr("CAST((pos - 1) * 8 div n AS INT)"))
        val mom = ev.groupBy(col("user_id").as("mu"))
          .agg(max(col("n")).as("n"), sum(col("cents")).as("tot"),
            sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("sumsq"))
          .filter(expr("n >= 8 AND n * sumsq > CAST(tot AS DECIMAL(38,0)) * tot"))
        val segs = ev.groupBy("user_id", "seg")
          .agg(count(ONE).as("n_s"), sum(col("cents")).as("sum_s"))
        segs.join(mom, col("user_id") === col("mu"))
          .withColumn("z", expr(
            """(CAST(sum_s AS DOUBLE) / n_s - CAST(tot AS DOUBLE) / n)
               / (sqrt(CAST(n * sumsq - CAST(tot AS DECIMAL(38,0)) * tot AS DOUBLE)) / n)"""))
          .withColumn("sym", expr(
            """CASE WHEN z < -CAST(0.6745 AS DOUBLE) THEN 'a'
                    WHEN z < CAST(0 AS DOUBLE) THEN 'b'
                    WHEN z < CAST(0.6745 AS DOUBLE) THEN 'c' ELSE 'd' END"""))
          .groupBy("user_id")
          .agg(max(col("n")).as("n_events"),
            expr("array_join(transform(sort_array(collect_list(struct(seg, sym))), x -> x.sym), '')")
              .as("sax_word"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        seq AS (
          SELECT user_id, cents,
                 row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS pos,
                 count(*) OVER (PARTITION BY user_id) AS n
          FROM ev),
        segd AS (
          SELECT user_id, cents, n, CAST((pos - 1) * 8 // n AS INT) AS seg
          FROM seq),
        mom AS (
          SELECT user_id AS mu, CAST(max(n) AS BIGINT) AS n,
                 CAST(sum(cents) AS BIGINT) AS tot,
                 sum(CAST(cents AS HUGEINT) * cents) AS sumsq
          FROM segd GROUP BY user_id
          HAVING max(n) >= 8 AND max(n) * sum(CAST(cents AS HUGEINT) * cents)
                 > CAST(sum(cents) AS HUGEINT) * sum(cents)),
        segs AS (
          SELECT user_id, seg, count(*) AS n_s, CAST(sum(cents) AS BIGINT) AS sum_s
          FROM segd GROUP BY user_id, seg),
        z AS (
          SELECT user_id, seg, n,
                 (CAST(sum_s AS DOUBLE) / n_s - CAST(tot AS DOUBLE) / n)
                 / (sqrt(CAST(n * sumsq - CAST(tot AS HUGEINT) * tot AS DOUBLE)) / n) AS z
          FROM segs JOIN mom ON user_id = mu),
        sym AS (
          SELECT user_id, seg, n,
                 CASE WHEN z < -CAST(0.6745 AS DOUBLE) THEN 'a'
                      WHEN z < CAST(0 AS DOUBLE) THEN 'b'
                      WHEN z < CAST(0.6745 AS DOUBLE) THEN 'c' ELSE 'd' END AS sym
          FROM z)
        SELECT user_id, max(n) AS n_events,
               string_agg(sym, '' ORDER BY seg) AS sax_word
        FROM sym
        GROUP BY user_id
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Cohen's kappa inter-rater agreement between two deterministic
    // document classifiers (token-count terciles vs char-count
    // terciles): observed vs chance-expected agreement from the exact
    // integer confusion matrix — the label-quality metric every
    // annotation/weak-supervision pipeline reports before training on
    // labels. kappa = (n*diag - sum(row*col)) / (n^2 - sum(row*col))
    // in micro units via the positivity-shift floor division (kappa
    // can be negative; q105's translation-equivariance recipe). Three
    // narrow aggregates over a 9-cell matrix.
    QueryDef("q121_cohens_kappa",
      (s, d) => {
        val r = Tables.documents(s, d).select(
          expr("""CASE WHEN CAST(size(split(text, ' ')) AS BIGINT) < 40 THEN 'short'
                       WHEN CAST(size(split(text, ' ')) AS BIGINT) < 70 THEN 'medium'
                       ELSE 'long' END""").as("r1"),
          expr("""CASE WHEN n_chars < 220 THEN 'short'
                       WHEN n_chars < 390 THEN 'medium'
                       ELSE 'long' END""").as("r2"))
        val cm = r.groupBy("r1", "r2").agg(count(ONE).as("nc"))
        val rowm = cm.groupBy(col("r1").as("cr")).agg(sum(col("nc")).as("rn"))
        val colm = cm.groupBy(col("r2").as("cc")).agg(sum(col("nc")).as("cn"))
        val pe = rowm.join(colm, col("cr") === col("cc"))
          .agg(coalesce(sum(expr("rn * cn")), lit(0L)).as("pe_num"))
        val agg = cm.agg(sum(col("nc")).as("n"),
          sum(when(col("r1") === col("r2"), col("nc")).otherwise(0L)).as("diag"))
        agg.crossJoin(pe)
          .select(col("n").as("n_docs"),
            expr("1000000 * diag div n").as("po_ppm"),
            expr("1000000 * pe_num div (n * n)").as("pe_ppm"),
            expr("""(1000000 * (n * diag - pe_num) + 1000000 * (n * n - pe_num))
                    div (n * n - pe_num) - 1000000""").as("kappa_micro"))
      },
      Some("""
        WITH r AS (
          SELECT CASE WHEN CAST(len(string_split(text, ' ')) AS BIGINT) < 40 THEN 'short'
                      WHEN CAST(len(string_split(text, ' ')) AS BIGINT) < 70 THEN 'medium'
                      ELSE 'long' END AS r1,
                 CASE WHEN n_chars < 220 THEN 'short'
                      WHEN n_chars < 390 THEN 'medium'
                      ELSE 'long' END AS r2
          FROM documents),
        cm AS (SELECT r1, r2, count(*) AS nc FROM r GROUP BY r1, r2),
        rowm AS (SELECT r1 AS cr, CAST(sum(nc) AS BIGINT) AS rn FROM cm GROUP BY r1),
        colm AS (SELECT r2 AS cc, CAST(sum(nc) AS BIGINT) AS cn FROM cm GROUP BY r2),
        pe AS (SELECT coalesce(CAST(sum(rn * cn) AS BIGINT), 0) AS pe_num
               FROM rowm JOIN colm ON cr = cc),
        agg AS (SELECT CAST(sum(nc) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN r1 = r2 THEN nc ELSE 0 END) AS BIGINT) AS diag
                FROM cm)
        SELECT n AS n_docs,
               1000000 * diag // n AS po_ppm,
               1000000 * pe_num // (n * n) AS pe_ppm,
               (1000000 * (n * diag - pe_num) + 1000000 * (n * n - pe_num))
                 // (n * n - pe_num) - 1000000 AS kappa_micro
        FROM agg CROSS JOIN pe""")),

    // -------------------------------------------------------------------
    // Bollinger bands per user: 8-event rolling mean +/- 2 sigma with
    // breach flags. The whole test is EXACT-INTEGER by
    // cross-multiplication: breach iff (n*x - sum)^2 > 4*(n*sumsq -
    // sum^2) — no sqrt ever enters the decision, so the flag can never
    // sit on a float knife-edge (the q112 lesson applied at the
    // operator's core instead of patched at the output). The displayed
    // band half-width does take the one sqrt, floor-quantized. One
    // rolling window pass per user, the q81 shuffle shape.
    QueryDef("q122_bollinger",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(-7, Window.currentRow)
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        ev.withColumn("n", count(ONE).over(w))
          .withColumn("sum8", sum(col("cents")).over(w))
          .withColumn("sumsq8", sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).over(w))
          .filter(col("n") === 8)
          .select(col("user_id"), col("event_id"), col("cents"),
            expr("CAST((2 * (1000000 * sum8) + 8) div 16 AS BIGINT)").as("mid_micro"),
            expr("""CAST(floor(1000000 * sqrt(CAST(8 * sumsq8 - CAST(sum8 AS DECIMAL(38,0)) * sum8 AS DOUBLE)) / 4)
                    AS BIGINT)""").as("half_width_micro"),
            expr("""CAST(CAST(8 * cents - sum8 AS DECIMAL(38,0)) * (8 * cents - sum8)
                    > 4 * (8 * sumsq8 - CAST(sum8 AS DECIMAL(38,0)) * sum8) AS BOOLEAN)""")
              .as("breach"),
            expr("CAST(8 * cents - sum8 > 0 AS BOOLEAN)").as("above_mid"))
          .orderBy("user_id", "event_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        roll AS (
          SELECT user_id, event_id, cents,
                 count(*) OVER w AS n,
                 CAST(sum(cents) OVER w AS BIGINT) AS sum8,
                 sum(CAST(cents AS HUGEINT) * cents) OVER w AS sumsq8
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id, cents,
               CAST((2 * (1000000 * sum8) + 8) // 16 AS BIGINT) AS mid_micro,
               CAST(floor(1000000 * sqrt(CAST(8 * sumsq8 - CAST(sum8 AS HUGEINT) * sum8 AS DOUBLE)) / 4)
                    AS BIGINT) AS half_width_micro,
               CAST(8 * cents - sum8 AS HUGEINT) * (8 * cents - sum8)
                 > 4 * (8 * sumsq8 - CAST(sum8 AS HUGEINT) * sum8) AS breach,
               8 * cents - sum8 > 0 AS above_mid
        FROM roll WHERE n = 8
        ORDER BY user_id, event_id""")),

    // -------------------------------------------------------------------
    // Cutler's RSI (simple-average relative strength index) per user
    // over a 14-move window: up/down move magnitudes are exact cents
    // deltas from one lag, the window sums are exact, and RSI_ppm =
    // 1e6*up div (up+down) is one integer division — no Wilder EWMA
    // recursion needed (that variant is st14's O(1)-state shape; this
    // is the windowed spelling an analyst expects to match a charting
    // library). Flags at the classic 70/30 thresholds.
    QueryDef("q123_rsi",
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val w14 = wOrd.rowsBetween(-13, Window.currentRow)
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
          .withColumn("delta", col("cents") - lag(col("cents"), 1).over(wOrd))
          .filter(col("delta").isNotNull)
        ev.withColumn("nmv", count(ONE).over(w14))
          .withColumn("up", sum(greatest(col("delta"), lit(0L))).over(w14))
          .withColumn("down", sum(greatest(-col("delta"), lit(0L))).over(w14))
          .filter(col("nmv") === 14 && (col("up") + col("down")) > 0)
          .select(col("user_id"), col("event_id"),
            col("up").as("up_cents"), col("down").as("down_cents"),
            expr("1000000 * up div (up + down)").as("rsi_ppm"))
          .withColumn("overbought", col("rsi_ppm") > 700000L)
          .withColumn("oversold", col("rsi_ppm") < 300000L)
          .orderBy("user_id", "event_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        moves AS (
          SELECT user_id, us, event_id,
                 cents - lag(cents, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS delta
          FROM ev),
        nn AS (SELECT * FROM moves WHERE delta IS NOT NULL),
        roll AS (
          SELECT user_id, event_id,
                 count(*) OVER w AS nmv,
                 CAST(sum(greatest(delta, 0)) OVER w AS BIGINT) AS up,
                 CAST(sum(greatest(-delta, 0)) OVER w AS BIGINT) AS down
          FROM nn
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        SELECT user_id, event_id, up AS up_cents, down AS down_cents,
               1000000 * up // (up + down) AS rsi_ppm,
               1000000 * up // (up + down) > 700000 AS overbought,
               1000000 * up // (up + down) < 300000 AS oversold
        FROM roll
        WHERE nmv = 14 AND up + down > 0
        ORDER BY user_id, event_id""")),

    // -------------------------------------------------------------------
    // Peak concurrency via the classic sweep line: build 30-min-gap
    // user sessions (gaps-and-islands, q82's shape), emit +1/-1
    // boundary deltas with ends-before-starts tie order (half-open
    // intervals), and take the running sum's maximum — "how many
    // sessions were EVER simultaneously open, and when first" is the
    // capacity-planning question the hourly rollup (q50) blurs. The
    // prefix sum is one global ordered window over 2*n_sessions
    // boundary rows (at 100 TB: range-partitioned two-phase scan —
    // per-partition totals broadcast back as offsets).
    QueryDef("q124_peak_concurrency",
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(wOrd))
          .withColumn("new_s",
            when(col("gap").isNull || col("gap") > 1800000000L, 1L).otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(wOrd))
        val sessions = ev.groupBy("user_id", "sid")
          .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        val bounds = sessions.select(col("s_us").as("us"), lit(1L).as("delta"))
          .unionByName(sessions.select((col("e_us") + 1L).as("us"), lit(-1L).as("delta")))
        // the sweep-line prefix sum over 2*n_sessions boundary rows runs
        // as Prefix.orderStats (range-partitioned two-phase scan with
        // per-partition totals broadcast back as offsets) — exact longs
        val curve = Prefix.orderStats(
          bounds.groupBy("us", "delta").agg(sum(col("delta")).as("dsum")),
          Seq(col("us"), col("delta")), cumSums = Seq(("dsum", "conc")))
        // n_sessions = the sum of +1 boundary deltas already on the curve
        // — no third pass over the sessionization chain for one scalar
        // coalesce: sum over an empty curve is NULL, but the count-based
        // spelling this replaced emitted 0 — keep that value on empty input
        curve.agg(min(struct((col("conc") * -1).as("nc"), col("us"))).as("p"),
            coalesce(sum(when(col("delta") === 1L, col("dsum")).otherwise(0L)),
              lit(0L)).as("n_sessions"))
          .select(col("n_sessions"),
            (col("p.nc") * -1).as("peak_concurrency"), col("p.us").as("first_peak_us"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        gapped AS (
          SELECT user_id, us,
                 CASE WHEN us - lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id)
                        > 1800000000 OR lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_s,
                 event_id
          FROM ev),
        sess AS (
          SELECT user_id, us,
                 CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS sid
          FROM gapped),
        sessions AS (
          SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
          FROM sess GROUP BY user_id, sid),
        bounds AS (
          SELECT s_us AS us, CAST(1 AS BIGINT) AS delta FROM sessions
          UNION ALL
          SELECT e_us + 1, CAST(-1 AS BIGINT) FROM sessions),
        dl AS (
          SELECT us, delta, CAST(sum(delta) AS BIGINT) AS dsum
          FROM bounds GROUP BY us, delta),
        curve AS (
          SELECT us, CAST(sum(dsum) OVER (ORDER BY us, delta
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
          FROM dl),
        peak AS (
          SELECT conc AS peak_concurrency, us AS first_peak_us
          FROM curve ORDER BY conc DESC, us LIMIT 1)
        SELECT (SELECT count(*) FROM sessions) AS n_sessions,
               peak_concurrency, first_peak_us
        FROM peak""")),

    // -------------------------------------------------------------------
    // Rolling-origin forecast backtest of the q97 Holt smoother: at
    // every step the PRIOR state's one-step forecast l+b is scored
    // against the arriving value before the state updates — the
    // walk-forward evaluation that turns a smoother into a measured
    // forecaster (MAE + signed bias per user). The error accumulators
    // ride in the SAME sequential fold as the state (alpha = gamma =
    // 1/2, identical expression text both engines → bit-identical
    // doubles, q97's contract), so no second pass and no rounding
    // anywhere. Recursive-CTE oracle replays the walk.
    QueryDef("q125_forecast_backtest",
      (s, d) => {
        Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            col("value"))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            expr("transform(sort_array(collect_list(struct(us, event_id, value))), e -> e.value)")
              .as("vals"))
          .filter(col("n_events") >= 2)
          .withColumn("fin", expr(
            """aggregate(slice(vals, 2, size(vals) - 1),
                named_struct('l', element_at(vals, 1), 'b', CAST(0 AS DOUBLE),
                             'sae', CAST(0 AS DOUBLE), 'sb', CAST(0 AS DOUBLE)),
                (acc, x) -> named_struct(
                  'l', 0.5 * x + 0.5 * (acc.l + acc.b),
                  'b', 0.5 * ((0.5 * x + 0.5 * (acc.l + acc.b)) - acc.l) + 0.5 * acc.b,
                  'sae', acc.sae + abs(x - (acc.l + acc.b)),
                  'sb', acc.sb + (x - (acc.l + acc.b))))"""))
          .select(col("user_id"), col("n_events"),
            (col("n_events") - 1).as("n_forecasts"),
            (col("fin.sae") / (col("n_events") - 1)).as("mae"),
            (col("fin.sb") / (col("n_events") - 1)).as("bias"))
          .orderBy("user_id")
      },
      Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events),
        seq AS (
          SELECT user_id, value,
                 CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS INT) AS pos
          FROM ev),
        stats AS (SELECT user_id, count(*) AS n_events FROM seq GROUP BY user_id),
        walk(user_id, pos, l, b, sae, sb) AS (
          SELECT user_id, 1, value, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
          FROM seq WHERE pos = 1
          UNION ALL
          SELECT w.user_id, e.pos,
                 0.5 * e.value + 0.5 * (w.l + w.b),
                 0.5 * ((0.5 * e.value + 0.5 * (w.l + w.b)) - w.l) + 0.5 * w.b,
                 w.sae + abs(e.value - (w.l + w.b)),
                 w.sb + (e.value - (w.l + w.b))
          FROM walk w JOIN seq e ON e.user_id = w.user_id AND e.pos = w.pos + 1),
        fin AS (SELECT user_id, max(pos) AS last_pos FROM walk GROUP BY user_id)
        SELECT w.user_id, t.n_events, t.n_events - 1 AS n_forecasts,
               w.sae / (t.n_events - 1) AS mae,
               w.sb / (t.n_events - 1) AS bias
        FROM walk w
        JOIN fin f ON w.user_id = f.user_id AND w.pos = f.last_pos
        JOIN stats t ON t.user_id = w.user_id
        WHERE t.n_events >= 2
        ORDER BY w.user_id""")),

    // -------------------------------------------------------------------
    // One-way ANOVA F-test of order value across the five order
    // priorities — the "does this segmentation explain any variance"
    // gate an experimentation platform runs before shipping a split.
    // Per-group n / sum(cents) / sum(cents^2) are exact integers
    // (DECIMAL(38,0) / HUGEINT for the squares); the only double layer
    // is the final one-row F computation, folded over the group list in
    // sorted-group order so both engines add in the same sequence.
    // F and eta^2 are floor-quantized micro/ppm. Scale: a partial
    // aggregate to 5 group rows, then a single-row reduce — no shuffle
    // beyond the groupBy.
    QueryDef("q126_anova_f",
      (s, d) => {
        Tables.orders(s, d)
          .select(col("o_orderpriority").as("grp"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
          .groupBy("grp")
          .agg(count(ONE).as("n"), sum(col("cents")).as("s"),
            sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("ss"))
          .agg(count(ONE).as("k"), sum(col("n")).as("n_total"),
            sum(col("s")).as("stot"), sum(col("ss")).as("sstot"),
            expr("""aggregate(
                      transform(sort_array(collect_list(struct(grp, n, s))),
                        x -> CAST(x.s AS DOUBLE) * CAST(x.s AS DOUBLE) / CAST(x.n AS DOUBLE)),
                      CAST(0 AS DOUBLE), (acc, x) -> acc + x)""").as("t"))
          .select(col("k"), col("n_total"),
            expr("""CAST(floor(1000000 * (
                      ((t - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE)) / (k - 1))
                      / (((CAST(sstot AS DOUBLE) - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE))
                          - (t - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE))) / (n_total - k))))
                    AS BIGINT)""").as("f_micro"),
            expr("""CAST(floor(1000000 * (
                      (t - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE))
                      / (CAST(sstot AS DOUBLE) - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE))))
                    AS BIGINT)""").as("eta2_ppm"),
            (col("k") - 1).as("df1"), (col("n_total") - col("k")).as("df2"))
      },
      Some("""
        WITH g AS (
          SELECT o_orderpriority AS grp, count(*) AS n,
                 CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS s,
                 sum(CAST(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS HUGEINT)
                     * CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS ss
          FROM orders GROUP BY o_orderpriority),
        tot AS (
          SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n_total,
                 CAST(sum(s) AS BIGINT) AS stot, sum(ss) AS sstot,
                 list_reduce(list_prepend(CAST(0 AS DOUBLE),
                   list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY grp)),
                   (acc, x) -> acc + x) AS t
          FROM g)
        SELECT k, n_total,
               CAST(floor(1000000 * (
                 ((t - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE)) / (k - 1))
                 / (((CAST(sstot AS DOUBLE) - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE))
                     - (t - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE))) / (n_total - k))))
               AS BIGINT) AS f_micro,
               CAST(floor(1000000 * (
                 (t - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE))
                 / (CAST(sstot AS DOUBLE) - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE) / CAST(n_total AS DOUBLE))))
               AS BIGINT) AS eta2_ppm,
               k - 1 AS df1, n_total - k AS df2
        FROM tot""")),

    // -------------------------------------------------------------------
    // STL-lite seasonal decomposition of daily revenue: 7-observation
    // centered moving-average trend, day-of-week seasonal means over the
    // detrended series, and the residual — entirely in EXACT integers by
    // working in a x7 fixed-point scale (cents/7 units): trend7 is just
    // the 7-day window sum, detrended7 = 7*rev - trend7, and the
    // seasonal mean uses the positivity-shift floor division (s_num can
    // be negative; |s_num| <= days_per_dow * 7 * max_daily_cents, far
    // under the 1e13 shift x count headroom). dow is days-since-epoch
    // mod 7 (engine-neutral, unlike dayofweek()). Scale: one daily
    // partial aggregate, a 7-row window, a 7-row broadcast join back.
    QueryDef("q127_seasonal_decompose",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)"))
            .cast("long").as("rev_cents"))
          .withColumn("dow", expr("CAST(datediff(day, DATE'1970-01-01') % 7 AS INT)"))
        // bounded: one row per calendar DAY of the fixture window
        val w7 = Window.orderBy("day").rowsBetween(-3, 3)
        val trended = daily
          .withColumn("cnt7", count(ONE).over(w7))
          .withColumn("trend_c7", sum(col("rev_cents")).over(w7))
          .filter(col("cnt7") === 7)
          .withColumn("detr_c7", expr("7 * rev_cents - trend_c7"))
        val seasonal = trended.groupBy(col("dow").as("sd"))
          .agg(expr("CAST((sum(detr_c7) + 10000000000000 * count(1)) div count(1) - 10000000000000 AS BIGINT)")
            .as("seasonal_c7"))
        trended.join(broadcast(seasonal), col("dow") === col("sd"))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dow"), col("rev_cents"), col("trend_c7"),
            col("seasonal_c7"),
            (col("detr_c7") - col("seasonal_c7")).as("rem_c7"))
          .orderBy("day")
      },
      Some("""
        WITH daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
          FROM orders GROUP BY 1),
        win AS (
          SELECT day, CAST(datediff('day', DATE '1970-01-01', day) % 7 AS INT) AS dow, rev_cents,
                 count(*) OVER w AS cnt7,
                 CAST(sum(rev_cents) OVER w AS BIGINT) AS trend_c7
          FROM daily
          WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        trended AS (
          SELECT day, dow, rev_cents, trend_c7, 7 * rev_cents - trend_c7 AS detr_c7
          FROM win WHERE cnt7 = 7),
        seasonal AS (
          SELECT dow AS sd,
                 CAST((sum(detr_c7) + 10000000000000 * count(*)) // count(*)
                      - 10000000000000 AS BIGINT) AS seasonal_c7
          FROM trended GROUP BY dow)
        SELECT strftime(day, '%Y-%m-%d') AS day, dow, rev_cents, trend_c7, seasonal_c7,
               detr_c7 - seasonal_c7 AS rem_c7
        FROM trended JOIN seasonal ON dow = sd
        ORDER BY day""")),

    // -------------------------------------------------------------------
    // Cohort LTV matrix (q33 retention's revenue sibling): users are
    // cohorted by the epoch-week (days-since-epoch div 7, engine-neutral;
    // the fixture spans one month, so week grain gives a real triangle)
    // of their first event; each purchase lands in (cohort, weeks_since)
    // and the cumulative revenue per cohort user is the triangular LTV
    // curve finance teams read. All money is exact cents; ltv-per-user
    // is integer division of nonneg ints. Scale: one groupBy(user) for
    // cohorts, a broadcast-sized matrix aggregate, a cumsum window over
    // months_since within each cohort row (bounded by the date span).
    QueryDef("q128_cohort_ltv",
      (s, d) => {
        val firsts = Tables.events(s, d)
          .groupBy("user_id")
          .agg(min(expr("datediff(ts, TIMESTAMP'1970-01-01 00:00:00') div 7")).as("cohort_w"))
        val cohortSize = firsts.groupBy(col("cohort_w").as("cm"))
          .agg(count(ONE).as("n_users"))
        val buys = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("datediff(ts, TIMESTAMP'1970-01-01 00:00:00') div 7").as("ev_w"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
          .join(firsts, Seq("user_id"))
          .groupBy(col("cohort_w"), (col("ev_w") - col("cohort_w")).as("weeks_since"))
          .agg(countDistinct(col("user_id")).as("n_buyers"),
            sum(col("cents")).as("rev_cents"))
        val w = Window.partitionBy("cohort_w").orderBy("weeks_since")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        buys
          .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
          .join(broadcast(cohortSize), col("cohort_w") === col("cm"))
          .select(col("cohort_w"), col("weeks_since"), col("n_users"),
            col("n_buyers"), col("rev_cents"), col("cum_rev_cents"),
            expr("cum_rev_cents div n_users").as("ltv_cents_per_user"))
          .orderBy("cohort_w", "weeks_since")
      },
      Some("""
        WITH firsts AS (
          SELECT user_id,
                 min(datediff('day', TIMESTAMP '1970-01-01 00:00:00', ts) // 7) AS cohort_w
          FROM events GROUP BY user_id),
        cohort_size AS (
          SELECT cohort_w AS cm, count(*) AS n_users FROM firsts GROUP BY cohort_w),
        buys AS (
          SELECT f.cohort_w,
                 datediff('day', TIMESTAMP '1970-01-01 00:00:00', e.ts) // 7 - f.cohort_w AS weeks_since,
                 count(DISTINCT e.user_id) AS n_buyers,
                 CAST(sum(CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
          FROM events e JOIN firsts f ON e.user_id = f.user_id
          WHERE e.event_type = 'purchase'
          GROUP BY 1, 2),
        cum AS (
          SELECT cohort_w, weeks_since, n_buyers, rev_cents,
                 CAST(sum(rev_cents) OVER (PARTITION BY cohort_w ORDER BY weeks_since
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_cents
          FROM buys)
        SELECT cohort_w, weeks_since, n_users, n_buyers, rev_cents, cum_rev_cents,
               cum_rev_cents // n_users AS ltv_cents_per_user
        FROM cum JOIN cohort_size ON cohort_w = cm
        ORDER BY cohort_w, weeks_since""")),

    // -------------------------------------------------------------------
    // Golden-record survivorship merge (the MDM consolidation step): one
    // consolidated profile per user where each attribute keeps its own
    // "latest non-null wins" lineage — the newest click's campaign k,
    // the newest purchase's cents, the newest event's type — resolved in
    // ONE ascending window pass of IGNORE-NULLS carries (q91's
    // machinery), then the final carried row is picked by rn=1 on the
    // descending twin. Ties on us break by event_id. Plain aggregates
    // (first/last seen, counts, max purchase) ride the same shuffle.
    QueryDef("q129_golden_record",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            col("event_type"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
        val wAsc = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val carried = ev
          .withColumn("last_click_k",
            last(when(col("event_type") === "click", col("k")), ignoreNulls = true).over(wAsc))
          .withColumn("last_purchase_cents",
            last(when(col("event_type") === "purchase", col("cents")), ignoreNulls = true).over(wAsc))
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy(col("us").desc, col("event_id").desc)))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("last_event_type"),
            col("last_click_k"), col("last_purchase_cents"))
        val aggs = ev.groupBy("user_id")
          .agg(count(ONE).as("n_events"), min(col("us")).as("first_seen_us"),
            max(col("us")).as("last_seen_us"),
            max(when(col("event_type") === "purchase", col("cents"))).as("max_purchase_cents"))
        aggs.join(carried, Seq("user_id"))
          .select(col("user_id"), col("n_events"), col("first_seen_us"),
            col("last_seen_us"), col("last_event_type"), col("last_click_k"),
            col("last_purchase_cents"), col("max_purchase_cents"))
          .orderBy("user_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events),
        carried AS (
          SELECT user_id, event_type, us, event_id,
                 last_value(CASE WHEN event_type = 'click' THEN k END IGNORE NULLS)
                   OVER w AS last_click_k,
                 last_value(CASE WHEN event_type = 'purchase' THEN cents END IGNORE NULLS)
                   OVER w AS last_purchase_cents,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY us DESC, event_id DESC) AS rn
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        fin AS (
          SELECT user_id, event_type AS last_event_type, last_click_k,
                 last_purchase_cents
          FROM carried WHERE rn = 1),
        aggs AS (
          SELECT user_id, count(*) AS n_events,
                 CAST(min(us) AS BIGINT) AS first_seen_us,
                 CAST(max(us) AS BIGINT) AS last_seen_us,
                 max(CASE WHEN event_type = 'purchase' THEN cents END) AS max_purchase_cents
          FROM ev GROUP BY user_id)
        SELECT a.user_id, n_events, first_seen_us, last_seen_us, last_event_type,
               last_click_k, last_purchase_cents, max_purchase_cents
        FROM aggs a JOIN fin f ON a.user_id = f.user_id
        ORDER BY a.user_id""")),

    // -------------------------------------------------------------------
    // Conversion-latency distribution: for every purchase, the time
    // since the user's most recent preceding view (q91's IGNORE-NULLS
    // carry), then the exact latency distribution — mean as one integer
    // division, p50/p90 as deterministic nearest-rank row picks
    // ((n+1) div 2 and ceil(0.9 n) = (9n+9) div 10 over the
    // (latency, event_id)-sorted order). Everything is exact integer
    // micros; one row out. Scale: one user-keyed window pass, then a
    // global sort of only the conversion rows (bounded by purchases).
    QueryDef("q130_time_to_convert",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val lat = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
          .withColumn("v_us",
            last(when(col("event_type") === "view", col("us")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase" && col("v_us").isNotNull)
          .select(col("event_id"), (col("us") - col("v_us")).as("lat_us"))
        // conversions scale with the corpus: the nearest-rank picks run
        // on a Prefix.orderStats global row number (two-pass, range-
        // partitioned). Count and sum ride along as groupCount/groupSums
        // and min/max are the rn=1 / rn=n picks, so the expensive lat
        // chain (events window + filter) is scanned ONCE, not three times
        val ranked = Prefix.orderStats(lat,
            Seq(col("lat_us"), col("event_id")), rn = Some("rn"),
            groupCount = Some("n"), groupSums = Seq(("lat_us", "sum_us")))
        ranked
          .filter(expr(
            "rn = 1 OR rn = n OR rn = (n + 1) div 2 OR rn = (9 * n + 9) div 10"))
          .groupBy()
          .agg(coalesce(max(col("n")), lit(0L)).as("n_conversions"),
            max(expr("sum_us div n")).as("mean_us"),
            max(when(expr("rn = (n + 1) div 2"), col("lat_us"))).as("p50_us"),
            max(when(expr("rn = (9 * n + 9) div 10"), col("lat_us"))).as("p90_us"),
            max(when(expr("rn = 1"), col("lat_us"))).as("min_us"),
            max(when(expr("rn = n"), col("lat_us"))).as("max_us"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, epoch_us(ts) AS us, event_type FROM events),
        carried AS (
          SELECT event_id, event_type,
                 us - last_value(CASE WHEN event_type = 'view' THEN us END IGNORE NULLS)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lat_us
          FROM ev),
        lat AS (
          SELECT event_id, lat_us FROM carried
          WHERE event_type = 'purchase' AND lat_us IS NOT NULL),
        ranked AS (
          SELECT lat_us,
                 row_number() OVER (ORDER BY lat_us, event_id) AS rn,
                 count(*) OVER () AS n
          FROM lat),
        picks AS (
          SELECT max(CASE WHEN rn = (n + 1) // 2 THEN lat_us END) AS p50_us,
                 max(CASE WHEN rn = (9 * n + 9) // 10 THEN lat_us END) AS p90_us
          FROM ranked WHERE rn = (n + 1) // 2 OR rn = (9 * n + 9) // 10),
        aggs AS (
          SELECT count(*) AS n_conversions, CAST(sum(lat_us) AS BIGINT) AS sum_us,
                 CAST(min(lat_us) AS BIGINT) AS min_us,
                 CAST(max(lat_us) AS BIGINT) AS max_us
          FROM lat)
        SELECT n_conversions, sum_us // n_conversions AS mean_us,
               p50_us, p90_us, min_us, max_us
        FROM aggs CROSS JOIN picks""")),

    // -------------------------------------------------------------------
    // Receivables-style order aging report: every order's age in days as
    // of the corpus max order date (the "as of" an AR report closes on),
    // bucketed 0-30 / 31-60 / 61-90 / 90+ per order status, with exact
    // cents totals and each bucket's within-status value share. One
    // broadcast scalar (as-of date) + one partial aggregate; the bucket
    // expression is pure integer CASE. ppm is exact integer division.
    QueryDef("q131_ar_aging",
      (s, d) => {
        val asOf = Tables.orders(s, d)
          .agg(max(expr("datediff(o_orderdate, DATE'1970-01-01')")).as("asof_day"))
        val aged = Tables.orders(s, d)
          .crossJoin(broadcast(asOf))
          .select(col("o_orderstatus").as("status"),
            expr("asof_day - datediff(o_orderdate, DATE'1970-01-01')").as("age_days"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
          .withColumn("bucket", expr(
            """CASE WHEN age_days <= 30 THEN '0-30'
                    WHEN age_days <= 60 THEN '31-60'
                    WHEN age_days <= 90 THEN '61-90'
                    ELSE '90+' END"""))
        val wStatus = Window.partitionBy("status")
        aged.groupBy("status", "bucket")
          .agg(count(ONE).as("n_orders"), sum(col("cents")).cast("long").as("total_cents"),
            min(col("age_days")).as("min_age"), max(col("age_days")).as("max_age"))
          .withColumn("status_cents", sum(col("total_cents")).over(wStatus))
          .select(col("status"), col("bucket"), col("n_orders"), col("total_cents"),
            col("min_age"), col("max_age"),
            expr("1000000 * total_cents div status_cents").as("share_ppm"))
          .orderBy("status", "bucket")
      },
      Some("""
        WITH aso AS (
          SELECT max(datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate)) AS asof_day
          FROM orders),
        aged AS (
          SELECT o_orderstatus AS status,
                 asof_day - datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) AS age_days,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
                 CASE WHEN asof_day - datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) <= 30 THEN '0-30'
                      WHEN asof_day - datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) <= 60 THEN '31-60'
                      WHEN asof_day - datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) <= 90 THEN '61-90'
                      ELSE '90+' END AS bucket
          FROM orders CROSS JOIN aso),
        g AS (
          SELECT status, bucket, count(*) AS n_orders,
                 CAST(sum(cents) AS BIGINT) AS total_cents,
                 min(age_days) AS min_age, max(age_days) AS max_age
          FROM aged GROUP BY status, bucket)
        SELECT status, bucket, n_orders, total_cents, min_age, max_age,
               1000000 * total_cents
                 // CAST(sum(total_cents) OVER (PARTITION BY status) AS BIGINT) AS share_ppm
        FROM g
        ORDER BY status, bucket""")),

    // -------------------------------------------------------------------
    // Exact five-number summary (boxplot) of order value per market
    // segment: min / Q1 / median / Q3 / max as deterministic
    // nearest-rank picks over the (cents, o_orderkey)-sorted order
    // (Q1 at ceil(n/4) = (n+3) div 4, median at (n+1) div 2, Q3 at
    // (3n+3) div 4 — the p18/q130 pick convention), plus Tukey-fence
    // outlier counts kept ENTIRELY in integers: 2*x < 2*Q1 - 3*IQR
    // instead of x < Q1 - 1.5*IQR. One rank window per segment + one
    // conditional aggregate.
    QueryDef("q132_boxplot_five_number",
      (s, d) => {
        val base = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
        // grouped Prefix rank (5 segments × order-sized groups — never
        // one task per segment); per-segment counts ride along as
        // groupCount, no separate agg or join
        val ranked = Prefix.orderStats(base,
            Seq(col("cents"), col("o_orderkey")), group = Seq("segment"),
            rn = Some("rn"), groupCount = Some("n"))
        val picks = ranked.groupBy("segment")
          .agg(max(col("n")).as("n_orders"),
            min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"),
            max(when(expr("rn = (n + 3) div 4"), col("cents"))).as("q1_cents"),
            max(when(expr("rn = (n + 1) div 2"), col("cents"))).as("med_cents"),
            max(when(expr("rn = (3 * n + 3) div 4"), col("cents"))).as("q3_cents"))
        base.join(broadcast(picks), Seq("segment"))
          .groupBy("segment")
          .agg(max(col("n_orders")).as("n_orders"),
            max(col("min_cents")).as("min_cents"), max(col("q1_cents")).as("q1_cents"),
            max(col("med_cents")).as("med_cents"), max(col("q3_cents")).as("q3_cents"),
            max(col("max_cents")).as("max_cents"),
            sum(when(expr("2 * cents < 2 * q1_cents - 3 * (q3_cents - q1_cents)"), 1L)
              .otherwise(0L)).as("n_low_outliers"),
            sum(when(expr("2 * cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)"), 1L)
              .otherwise(0L)).as("n_high_outliers"))
          .withColumn("iqr_cents", col("q3_cents") - col("q1_cents"))
          .select(col("segment"), col("n_orders"), col("min_cents"), col("q1_cents"),
            col("med_cents"), col("q3_cents"), col("max_cents"), col("iqr_cents"),
            col("n_low_outliers"), col("n_high_outliers"))
          .orderBy("segment")
      },
      Some("""
        WITH base AS (
          SELECT c_mktsegment AS segment, o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM orders JOIN customer ON o_custkey = c_custkey),
        ranked AS (
          SELECT segment, cents,
                 row_number() OVER (PARTITION BY segment ORDER BY cents, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY segment) AS n
          FROM base),
        picks AS (
          SELECT segment, max(n) AS n_orders,
                 CAST(min(cents) AS BIGINT) AS min_cents,
                 CAST(max(cents) AS BIGINT) AS max_cents,
                 max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1_cents,
                 max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med_cents,
                 max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3_cents
          FROM ranked GROUP BY segment)
        SELECT b.segment, CAST(max(n_orders) AS BIGINT) AS n_orders,
               max(min_cents) AS min_cents, max(q1_cents) AS q1_cents,
               max(med_cents) AS med_cents, max(q3_cents) AS q3_cents,
               max(max_cents) AS max_cents,
               max(q3_cents) - max(q1_cents) AS iqr_cents,
               CAST(sum(CASE WHEN 2 * cents < 2 * q1_cents - 3 * (q3_cents - q1_cents)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
               CAST(sum(CASE WHEN 2 * cents > 2 * q3_cents + 3 * (q3_cents - q1_cents)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
        FROM base b JOIN picks p ON b.segment = p.segment
        GROUP BY b.segment
        ORDER BY b.segment""")),

    // -------------------------------------------------------------------
    // Data-vault satellite load (hub hash key + hashdiff change
    // detection): each customer's orders in date order form the
    // satellite history of the volatile attribute set (status,
    // priority); a row loads only when its md5 hashdiff differs from the
    // customer's previous order's — the standard Data Vault 2.0 delta
    // check that keeps satellites append-only and idempotent. md5 hex is
    // engine-identical; the '|' concat is the DV hard-rule delimiter.
    // One customer-keyed window; only changed rows survive.
    QueryDef("q133_data_vault",
      (s, d) => {
        val w = Window.partitionBy("hub_customer_hk").orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .select(md5(concat_ws("|", col("o_custkey"))).as("hub_customer_hk"),
            col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            md5(concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))).as("hashdiff"),
            col("o_orderstatus"), col("o_orderpriority"))
          .withColumn("prev_hd", lag(col("hashdiff"), 1).over(w))
          .filter(col("prev_hd").isNull || col("prev_hd") =!= col("hashdiff"))
          .select(col("hub_customer_hk"), col("o_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("load_date"),
            col("hashdiff"), col("o_orderstatus").as("status"),
            col("o_orderpriority").as("priority"),
            col("prev_hd").isNull.as("is_first_version"))
          .orderBy("hub_customer_hk", "o_orderkey")
      },
      Some("""
        WITH sat AS (
          SELECT md5(CAST(o_custkey AS VARCHAR)) AS hub_customer_hk,
                 o_custkey, o_orderkey, o_orderdate,
                 md5(o_orderstatus || '|' || o_orderpriority) AS hashdiff,
                 o_orderstatus, o_orderpriority
          FROM orders),
        lagged AS (
          SELECT *, lag(hashdiff) OVER (PARTITION BY hub_customer_hk
                                        ORDER BY o_orderdate, o_orderkey) AS prev_hd
          FROM sat)
        SELECT hub_customer_hk, o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS load_date,
               hashdiff, o_orderstatus AS status, o_orderpriority AS priority,
               prev_hd IS NULL AS is_first_version
        FROM lagged
        WHERE prev_hd IS NULL OR prev_hd <> hashdiff
        ORDER BY hub_customer_hk, o_orderkey""")),

    // -------------------------------------------------------------------
    // Table snapshot diff (the Datafold/data-diff reconciliation op):
    // two simulated snapshots of orders — B drops a deterministic ~5%
    // hash slice of A, adds a ~5% slice A lacks, and bumps a ~10%
    // slice's price by one cent — are reconciled with ONE full outer
    // join on the key, classifying every differing key as added /
    // removed / changed (with the changed column named). The summary row
    // counts each class plus unchanged. Keys and classes are pure
    // hash-mod integers. Scale: one co-partitioned outer join on the
    // key, no row comparison outside the join.
    QueryDef("q134_snapshot_diff",
      (s, d) => {
        val base = Tables.orders(s, d)
          .select(col("o_orderkey").as("k"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"),
            col("o_orderstatus").as("status"),
            expr(s"${Ns.hash60("concat('diff:', CAST(o_orderkey AS STRING))")} % 20").as("h"))
        val snapA = base.filter(col("h") =!= 1)
          .select(col("k"), col("cents"), col("status"))
        val snapB = base.filter(col("h") =!= 2)
          .select(col("k"),
            when(col("h") === 3, col("cents") + 1).otherwise(col("cents")).as("cents"),
            col("status"))
        val a = snapA.select(col("k").as("ka"), col("cents").as("ca"), col("status").as("sa"))
        val b = snapB.select(col("k").as("kb"), col("cents").as("cb"), col("status").as("sb"))
        val joined = a.join(b, col("ka") === col("kb"), "full_outer")
          .select(coalesce(col("ka"), col("kb")).as("k"),
            expr("""CASE WHEN ka IS NULL THEN 'added'
                         WHEN kb IS NULL THEN 'removed'
                         WHEN ca <> cb OR sa <> sb THEN 'changed'
                         ELSE 'unchanged' END""").as("class"),
            expr("""CASE WHEN ka IS NOT NULL AND kb IS NOT NULL AND ca <> cb THEN 'cents'
                         WHEN ka IS NOT NULL AND kb IS NOT NULL AND sa <> sb THEN 'status'
                         END""").as("changed_col"))
        joined.groupBy("class")
          .agg(count(ONE).as("n_keys"),
            countDistinct(col("changed_col")).as("n_changed_cols"),
            min(col("k")).as("first_key"), max(col("k")).as("last_key"))
          .orderBy("class")
      },
      Some(s"""
        WITH base AS (
          SELECT o_orderkey AS k,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
                 o_orderstatus AS status,
                 ${Ns.oHash60("'diff:' || CAST(o_orderkey AS VARCHAR)")} % 20 AS h
          FROM orders),
        a AS (SELECT k AS ka, cents AS ca, status AS sa FROM base WHERE h <> 1),
        b AS (SELECT k AS kb,
                     CASE WHEN h = 3 THEN cents + 1 ELSE cents END AS cb,
                     status AS sb
              FROM base WHERE h <> 2),
        joined AS (
          SELECT coalesce(ka, kb) AS k,
                 CASE WHEN ka IS NULL THEN 'added'
                      WHEN kb IS NULL THEN 'removed'
                      WHEN ca <> cb OR sa <> sb THEN 'changed'
                      ELSE 'unchanged' END AS class,
                 CASE WHEN ka IS NOT NULL AND kb IS NOT NULL AND ca <> cb THEN 'cents'
                      WHEN ka IS NOT NULL AND kb IS NOT NULL AND sa <> sb THEN 'status'
                      END AS changed_col
          FROM a FULL OUTER JOIN b ON ka = kb)
        SELECT class, count(*) AS n_keys,
               count(DISTINCT changed_col) AS n_changed_cols,
               CAST(min(k) AS BIGINT) AS first_key, CAST(max(k) AS BIGINT) AS last_key
        FROM joined
        GROUP BY class
        ORDER BY class""")),

    // -------------------------------------------------------------------
    // Mergeable quantile sketch (one deterministic KLL compaction
    // round): order values are hash-scattered into 32 buckets, each
    // bucket keeps every 8th element of its sorted run starting at
    // rank 1 (deterministic subsample, weight 8 — where KLL flips a
    // coin we pin the offset, which keeps the sketch engine- and
    // partitioning-identical), and quantiles are read from the merged
    // weighted survivors as the smallest value whose cumulative weight
    // reaches ceil(q*W). The card reports estimate vs exact and the
    // realized rank error in ppm — the mergeability witness the sketch
    // family (q64 HLL, q84 KMV, q87 count-sketch, t13 CMS) lacked.
    // Scale: per-bucket sorts of n/32, survivors are n/8 rows.
    QueryDef("q135_quantile_sketch",
      (s, d) => {
        val base = Tables.orders(s, d)
          .select(col("o_orderkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"),
            expr(s"${Ns.hash60("concat('kll:', CAST(o_orderkey AS STRING))")} % 32").as("bkt"))
        // per-bucket compaction rank as a GROUPED Prefix scan: 32 buckets
        // × n/32 rows each is 32 single-task sorts at 100 TB if spelled
        // as a partitionBy window; the grouped prefix rank spreads every
        // bucket across all partitions with identical row numbers
        val kept = Prefix.orderStats(base,
            Seq(col("cents"), col("o_orderkey")), group = Seq("bkt"),
            rn = Some("brn"))
          .filter(expr("brn % 8 = 1"))
          .select(col("cents"), lit(8L).as("w"), col("o_orderkey"))
        // both rank walks are order-table-sized (survivors are n/8), so
        // they run as Prefix.orderStats two-pass prefix scans with the
        // totals riding along as groupCount/groupSums — no single-task
        // global windows, no scalar aggs joined back
        val cum = Prefix.orderStats(kept,
            Seq(col("cents"), col("o_orderkey")), cumSums = Seq(("w", "cw")),
            groupSums = Seq(("w", "tw")))
        val exact = Prefix.orderStats(base,
            Seq(col("cents"), col("o_orderkey")), rn = Some("rn"),
            groupCount = Some("n"))
        val qs = Seq(25, 50, 90, 99)
        // ONE conditional-aggregate scan for all four estimate picks and
        // one for all four exact picks (a per-q filter would scan the
        // prefix output — re-running its sort pass — 4 and 5 times)
        val estAggs = qs.map(q =>
          min(when(expr(s"cw >= ($q * tw + 99) div 100"), col("cents"))).as(s"e$q"))
        val est = cum.groupBy().agg(estAggs.head, estAggs.tail: _*)
          .select(expr(s"stack(4, ${qs.map(q => s"$q, e$q").mkString(", ")})" +
            " AS (q_pct, est_cents)"))
        val exaAggs = qs.map(q =>
          max(when(expr(s"rn = ($q * n + 99) div 100"), col("cents"))).as(s"x$q")) :+
          max(col("n")).as("nn")
        // the nn filter restores empty-input behavior: groupBy().agg over
        // an empty frame returns one all-null row (stack would fan it to
        // 4 spurious null-quantile rows where the oracle emits zero)
        val exa = exact.groupBy().agg(exaAggs.head, exaAggs.tail: _*)
          .select(expr(s"stack(4, ${qs.map(q => s"$q, x$q").mkString(", ")})" +
            " AS (qp, exact_cents)"), col("nn").as("n"))
          .filter(col("n").isNotNull)
        val ranks = est.join(exa, col("q_pct") === col("qp"))
          .join(exact.select(col("cents").as("c2")),
            col("c2") <= col("est_cents"), "left")
          .groupBy("q_pct", "est_cents", "exact_cents", "n")
          .agg(count(col("c2")).as("est_rank"))
        ranks
          .select(col("q_pct"), col("est_cents"), col("exact_cents"),
            expr("CAST(abs(1000000 * est_rank div n - 10000 * q_pct) AS BIGINT)")
              .as("rank_err_ppm"))
          .orderBy("q_pct")
      },
      Some(s"""
        WITH base AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents,
                 ${Ns.oHash60("'kll:' || CAST(o_orderkey AS VARCHAR)")} % 32 AS bkt
          FROM orders),
        kept AS (
          SELECT cents, 8 AS w, o_orderkey FROM (
            SELECT cents, o_orderkey,
                   row_number() OVER (PARTITION BY bkt ORDER BY cents, o_orderkey) AS brn
            FROM base) WHERE brn % 8 = 1),
        cum AS (
          SELECT cents, o_orderkey,
                 CAST(sum(w) OVER (ORDER BY cents, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
                 CAST(sum(w) OVER () AS BIGINT) AS tw
          FROM kept),
        exact AS (
          SELECT cents,
                 row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
                 count(*) OVER () AS n
          FROM base),
        qs(q_pct) AS (VALUES (25), (50), (90), (99)),
        est AS (
          SELECT q_pct, min(cents) AS est_cents
          FROM qs JOIN cum ON cw >= (q_pct * tw + 99) // 100
          GROUP BY q_pct),
        exa AS (
          SELECT q_pct AS qp, max(CASE WHEN rn = (q_pct * n + 99) // 100 THEN cents END)
                   AS exact_cents,
                 max(n) AS n
          FROM qs JOIN exact ON rn = (q_pct * n + 99) // 100
          GROUP BY q_pct),
        ranks AS (
          SELECT q_pct, est_cents, exact_cents, n,
                 (SELECT count(*) FROM exact e WHERE e.cents <= est_cents) AS est_rank
          FROM est JOIN exa ON q_pct = qp)
        SELECT q_pct, est_cents, exact_cents,
               CAST(abs(1000000 * est_rank // n - 10000 * q_pct) AS BIGINT) AS rank_err_ppm
        FROM ranks
        ORDER BY q_pct""")),

    // -------------------------------------------------------------------
    // Zone-map / data-skipping audit (the Iceberg-manifest /
    // ClickHouse-minmax effectiveness report): orders land in simulated
    // weekly files, each file carries its (min,max) cents zone map, and
    // three representative predicates are scored on how many files the
    // zone map alone can prove empty — plus the exact row counts those
    // skipped files held and how many rows actually match. The gap
    // between skip_ratio and selectivity is the "clustering debt" a
    // z-order rewrite (q25/q92) would reclaim. Pure integer aggregates.
    QueryDef("q136_zone_map_skipping",
      (s, d) => {
        val rows = Tables.orders(s, d)
          .select(expr("datediff(o_orderdate, DATE'1970-01-01') div 7").as("file_id"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
        val zones = rows.groupBy("file_id")
          .agg(count(ONE).as("n_rows"), min(col("cents")).as("zmin"),
            max(col("cents")).as("zmax"))
        val preds = Seq(
          ("p1_gt_30m", 3000000000L, Long.MaxValue),
          ("p2_band_1m_2m", 100000000L, 200000000L),
          ("p3_lt_500k", Long.MinValue, 50000000L))
        val perPred = preds.map { case (pid, lo, hi) =>
          val z = zones.select(lit(pid).as("pred"), col("file_id"), col("n_rows"),
            (col("zmax") < lo || col("zmin") > hi).as("skipped"))
          val m = rows.filter(col("cents") >= lo && col("cents") <= hi)
            .agg(count(ONE).as("matching_rows"))
          z.groupBy("pred")
            .agg(count(ONE).as("n_files"),
              sum(when(col("skipped"), 1L).otherwise(0L)).as("files_skipped"),
              sum(when(col("skipped"), col("n_rows")).otherwise(0L)).as("rows_skipped"),
              sum(col("n_rows")).as("total_rows"))
            .crossJoin(m)
        }.reduce(_.unionAll(_))
        perPred
          .select(col("pred"), col("n_files"), col("files_skipped"),
            col("rows_skipped"), col("total_rows"), col("matching_rows"),
            expr("1000000 * rows_skipped div total_rows").as("skip_ppm"),
            expr("1000000 * matching_rows div total_rows").as("selectivity_ppm"))
          .orderBy("pred")
      },
      Some(s"""
        WITH rows_t AS (
          SELECT datediff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) // 7 AS file_id,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM orders),
        zones AS (
          SELECT file_id, count(*) AS n_rows,
                 CAST(min(cents) AS BIGINT) AS zmin, CAST(max(cents) AS BIGINT) AS zmax
          FROM rows_t GROUP BY file_id),
        preds(pred, lo, hi) AS (
          VALUES ('p1_gt_30m', 3000000000, ${Long.MaxValue}),
                 ('p2_band_1m_2m', 100000000, 200000000),
                 ('p3_lt_500k', ${Long.MinValue}, 50000000)),
        z AS (
          SELECT pred, file_id, n_rows,
                 (zmax < lo OR zmin > hi) AS skipped
          FROM zones CROSS JOIN preds),
        m AS (
          SELECT pred, count(*) AS matching_rows
          FROM preds JOIN rows_t ON cents >= lo AND cents <= hi
          GROUP BY pred),
        g AS (
          SELECT pred, count(*) AS n_files,
                 CAST(sum(CASE WHEN skipped THEN 1 ELSE 0 END) AS BIGINT) AS files_skipped,
                 CAST(sum(CASE WHEN skipped THEN n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
                 CAST(sum(n_rows) AS BIGINT) AS total_rows
          FROM z GROUP BY pred)
        SELECT g.pred, n_files, files_skipped, rows_skipped, total_rows,
               CAST(coalesce(matching_rows, 0) AS BIGINT) AS matching_rows,
               1000000 * rows_skipped // total_rows AS skip_ppm,
               1000000 * CAST(coalesce(matching_rows, 0) AS BIGINT) // total_rows AS selectivity_ppm
        FROM g LEFT JOIN m ON g.pred = m.pred
        ORDER BY g.pred""")),

    // -------------------------------------------------------------------
    // Price-volume-mix revenue bridge (the FP&A decomposition): per part
    // brand, the 1995 -> 1996 revenue delta split into a volume effect
    // (quantity change at old price) and a price effect (new quantity at
    // the price change), with the classic exact identity dV = VE + PE
    // held in rationals and floor-quantized to cents via the
    // positivity-shift division (quantity deltas go negative). The
    // residual column pins the (bounded, <= 2 cent) quantization gap.
    // Scale: one join to part, two conditional partial aggregates, all
    // integer arithmetic.
    QueryDef("q137_price_volume_mix",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"), expr("year(l_shipdate)").as("yr"),
            expr("CAST(l_quantity AS BIGINT)").as("qty"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
          .filter(col("yr").isin(1995, 1996))
        li.groupBy("brand")
          .agg(sum(when(col("yr") === 1995, col("qty")).otherwise(0L)).as("qty_a"),
            sum(when(col("yr") === 1996, col("qty")).otherwise(0L)).as("qty_b"),
            sum(when(col("yr") === 1995, col("cents")).otherwise(0L)).as("val_a"),
            sum(when(col("yr") === 1996, col("cents")).otherwise(0L)).as("val_b"))
          .filter(col("qty_a") > 0 && col("qty_b") > 0)
          .withColumn("volume_effect_cents", expr(
            "((qty_b - qty_a) * val_a + 10000000000 * qty_a) div qty_a - 10000000000"))
          .withColumn("price_effect_cents", expr(
            "val_b - ((qty_b * val_a + 10000000000 * qty_a) div qty_a - 10000000000)"))
          .select(col("brand"), col("qty_a"), col("qty_b"), col("val_a"), col("val_b"),
            (col("val_b") - col("val_a")).as("delta_cents"),
            col("volume_effect_cents"), col("price_effect_cents"),
            (col("val_b") - col("val_a") - col("volume_effect_cents")
              - col("price_effect_cents")).as("residual_cents"))
          .orderBy("brand")
      },
      Some("""
        WITH li AS (
          SELECT p_brand AS brand, year(l_shipdate) AS yr,
                 CAST(l_quantity AS BIGINT) AS qty,
                 CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE year(l_shipdate) IN (1995, 1996)),
        g AS (
          SELECT brand,
                 CAST(sum(CASE WHEN yr = 1995 THEN qty ELSE 0 END) AS BIGINT) AS qty_a,
                 CAST(sum(CASE WHEN yr = 1996 THEN qty ELSE 0 END) AS BIGINT) AS qty_b,
                 CAST(sum(CASE WHEN yr = 1995 THEN cents ELSE 0 END) AS BIGINT) AS val_a,
                 CAST(sum(CASE WHEN yr = 1996 THEN cents ELSE 0 END) AS BIGINT) AS val_b
          FROM li GROUP BY brand
          HAVING sum(CASE WHEN yr = 1995 THEN qty ELSE 0 END) > 0
             AND sum(CASE WHEN yr = 1996 THEN qty ELSE 0 END) > 0),
        fx AS (
          SELECT brand, qty_a, qty_b, val_a, val_b,
                 ((qty_b - qty_a) * val_a + 10000000000 * qty_a) // qty_a - 10000000000
                   AS volume_effect_cents,
                 val_b - ((qty_b * val_a + 10000000000 * qty_a) // qty_a - 10000000000)
                   AS price_effect_cents
          FROM g)
        SELECT brand, qty_a, qty_b, val_a, val_b,
               val_b - val_a AS delta_cents,
               volume_effect_cents, price_effect_cents,
               val_b - val_a - volume_effect_cents - price_effect_cents AS residual_cents
        FROM fx
        ORDER BY brand""")),

    // -------------------------------------------------------------------
    // Earth-mover (Wasserstein-1) drift distance between the 1995 and
    // 1996 order-value distributions — the drift metric that, unlike
    // q115's PSI, sees HOW FAR mass moved, not just that bins changed.
    // 32 equal-width bins over the combined exact cents range; for
    // normalized histograms EMD = sum_bins |cumA/nA - cumB/nB| / nbins,
    // kept EXACT by cross-multiplying: sum |cumA*nB - cumB*nA| over the
    // bins, reported as floor(1e6 * that / (nA*nB*32)). One partial
    // histogram aggregate per period + a 32-row cumulative window.
    QueryDef("q138_emd_drift",
      (s, d) => {
        val base = Tables.orders(s, d)
          .select(expr("year(o_orderdate)").as("yr"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
          .filter(col("yr").isin(1995, 1996))
        val rng = base.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
        val binned = base.crossJoin(broadcast(rng))
          .select(col("yr"),
            least(expr("CAST(32 * (cents - lo) div (hi - lo + 1) AS INT)"), lit(31)).as("bin"))
        val hist = binned.groupBy("bin")
          .agg(sum(when(col("yr") === 1995, 1L).otherwise(0L)).as("ca"),
            sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("cb"))
        val wCum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist
          .withColumn("cum_a", sum(col("ca")).over(wCum))
          .withColumn("cum_b", sum(col("cb")).over(wCum))
          .withColumn("na", sum(col("ca")).over(Window.partitionBy()))
          .withColumn("nb", sum(col("cb")).over(Window.partitionBy()))
        cum.groupBy()
          .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
            count(ONE).as("n_bins_used"),
            sum(expr("abs(cum_a * nb - cum_b * na)")).as("cross_sum"))
          .select(col("n_a"), col("n_b"), col("n_bins_used"),
            expr("CAST(floor(CAST(1000000 AS DOUBLE) * CAST(cross_sum AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * CAST(32 AS DOUBLE))) AS BIGINT)")
              .as("emd_micro"))
      },
      Some("""
        WITH base AS (
          SELECT year(o_orderdate) AS yr,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM orders WHERE year(o_orderdate) IN (1995, 1996)),
        rng AS (SELECT CAST(min(cents) AS BIGINT) AS lo, CAST(max(cents) AS BIGINT) AS hi
                FROM base),
        binned AS (
          SELECT yr, least(CAST(32 * (cents - lo) // (hi - lo + 1) AS INT), 31) AS bin
          FROM base CROSS JOIN rng),
        hist AS (
          SELECT bin,
                 CAST(sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM binned GROUP BY bin),
        cum AS (
          SELECT bin, ca, cb,
                 CAST(sum(ca) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
                 CAST(sum(cb) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b,
                 CAST(sum(ca) OVER () AS BIGINT) AS na,
                 CAST(sum(cb) OVER () AS BIGINT) AS nb
          FROM hist)
        SELECT max(na) AS n_a, max(nb) AS n_b, count(*) AS n_bins_used,
               CAST(floor(CAST(1000000 AS DOUBLE) * CAST(sum(abs(cum_a * nb - cum_b * na)) AS DOUBLE)
                    / (CAST(max(na) AS DOUBLE) * CAST(max(nb) AS DOUBLE) * CAST(32 AS DOUBLE))) AS BIGINT)
                 AS emd_micro
        FROM cum""")),

    // -------------------------------------------------------------------
    // RFM customer segmentation — the classic CRM scoring warehouse op:
    // per ordering customer, Recency (days from last order to the
    // corpus's max order date), Frequency (order count), Monetary
    // (lifetime cents, exact), each quintiled with ntile(5) under a
    // TOTAL order (metric + custkey tie-break, so both engines bucket
    // identically), then mapped to the marketing segments. Scale note:
    // the facts aggregate in one shuffle on custkey; the three ntile
    // windows run over the CUSTOMER DIMENSION (|customers| rows of
    // three longs — megabytes at warehouse scale, not fact-sized), the
    // same bounded-by-construction argument as the k-means centroid
    // collect.
    QueryDef("q139_rfm_segmentation",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderdate"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("cents"))
        val anchor = o.agg(max(col("o_orderdate")).as("anchor"))
        val per = o.crossJoin(broadcast(anchor))
          .groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("last_order"),
            count(ONE).as("frequency"),
            sum(col("cents")).as("monetary_cents"),
            max(col("anchor")).as("anchor"))
          .select(col("o_custkey").as("custkey"),
            expr("CAST(datediff(anchor, last_order) AS BIGINT)").as("recency_days"),
            col("frequency"), col("monetary_cents"))
        // three global quintiles over the CUSTOMER dimension — each a
        // Prefix.orderStats two-pass rank (range-partitioned, no
        // single-task global sort even when customers are billions).
        // localCheckpoint between the chained ranks: each orderStats
        // runs two jobs over its input, so an unmaterialized chain
        // re-runs every predecessor's reduce-side sort per job (sort1
        // executed 4x, sort2 3x) — checkpointing makes each rank scan
        // materialized rows instead.
        val perC = per.localCheckpoint()
        // the three ranks are INDEPENDENT scans of the same base — run
        // their (eager) pass-1 subtotal jobs from parallel threads so
        // the per-job scheduling floors overlap instead of serializing
        // (the chained spelling paid 3x the floor; measured equal or
        // worse under every serial re-arrangement)
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        def quintile(src: String, desc: Boolean, out: String) = Future {
          val sc = if (desc) col(src).desc else col(src).asc
          Prefix.orderStats(perC.select(col("custkey"), col(src)),
            Seq(sc, col("custkey")), ntiles = Seq((5, out)))
            .select(col("custkey"), col(out))
        }
        val ranks = Await.result(Future.sequence(Seq(
          quintile("recency_days", desc = true, "r"),
          quintile("frequency", desc = false, "f"),
          quintile("monetary_cents", desc = false, "m"))), Duration.Inf)
        ranks.foldLeft(perC)((acc, r) => acc.join(r, "custkey"))
          .withColumn("segment", expr(
            """CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
                    WHEN r >= 4 AND f <= 2 THEN 'new'
                    WHEN r <= 2 AND f >= 4 THEN 'at_risk'
                    WHEN r <= 2 AND f <= 2 THEN 'hibernating'
                    ELSE 'regular' END"""))
          .orderBy("custkey")
      },
      Some("""
        WITH o AS (
          SELECT o_custkey, o_orderdate,
                 CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
          FROM orders),
        anchor AS (SELECT max(o_orderdate) AS anchor FROM o),
        per AS (
          SELECT o_custkey AS custkey,
                 CAST(date_diff('day', CAST(max(o_orderdate) AS DATE), CAST(max(anchor) AS DATE)) AS BIGINT) AS recency_days,
                 count(*) AS frequency,
                 CAST(sum(cents) AS BIGINT) AS monetary_cents
          FROM o CROSS JOIN anchor
          GROUP BY o_custkey),
        scored AS (
          SELECT custkey, recency_days, frequency, monetary_cents,
                 CAST(ntile(5) OVER (ORDER BY recency_days DESC, custkey) AS INT) AS r,
                 CAST(ntile(5) OVER (ORDER BY frequency ASC, custkey) AS INT) AS f,
                 CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, custkey) AS INT) AS m
          FROM per)
        SELECT custkey, recency_days, frequency, monetary_cents, r, f, m,
               CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
                    WHEN r >= 4 AND f <= 2 THEN 'new'
                    WHEN r <= 2 AND f >= 4 THEN 'at_risk'
                    WHEN r <= 2 AND f <= 2 THEN 'hibernating'
                    ELSE 'regular' END AS segment
        FROM scored
        ORDER BY custkey""")),

    // -------------------------------------------------------------------
    // Price elasticity of demand per part brand: the log-log OLS slope
    // of ln(quantity) on ln(unit price) — the econometric complement of
    // q79's linear OLS (elasticity is the slope in LOG space, i.e. the
    // % demand change per % price change, what a pricing engine
    // actually tunes on). Both logs are quantized to BIGINT micro-nats
    // (the t01 recipe) so every OLS sum is EXACT integer/decimal
    // arithmetic — order-independent across engines and partitionings;
    // the micro-units cancel in the slope and r². Products are summed
    // as DECIMAL(38,0) so the moment sums cannot overflow at any row
    // count. Scale: one partial-agg groupBy(brand), no second pass.
    QueryDef("q140_price_elasticity",
      (s, d) => {
        val base = Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            expr("CAST(round(ln(CAST(l_quantity AS DOUBLE)) * 1e6, 0) AS BIGINT)").as("y"),
            expr("""CAST(round(ln(CAST(l_extendedprice AS DOUBLE)
                    / CAST(l_quantity AS DOUBLE)) * 1e6, 0) AS BIGINT)""").as("x"))
        base.groupBy("brand")
          .agg(count(ONE).as("n"),
            sum(col("x").cast("decimal(38,0)")).as("sx"),
            sum(col("y").cast("decimal(38,0)")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(19,0)) * x")).as("sxx"),
            sum(expr("CAST(x AS DECIMAL(19,0)) * y")).as("sxy"),
            sum(expr("CAST(y AS DECIMAL(19,0)) * y")).as("syy"))
          .select(col("brand"), col("n"),
            expr("""round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)""").as("elasticity"),
            expr("""round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)""").as("r2"))
          .orderBy("brand")
      },
      Some("""
        WITH base AS (
          SELECT p_brand AS brand,
                 CAST(round(ln(CAST(l_quantity AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y,
                 CAST(round(ln(CAST(l_extendedprice AS DOUBLE)
                      / CAST(l_quantity AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        g AS (
          SELECT brand, count(*) AS n,
                 sum(CAST(x AS DECIMAL(38,0))) AS sx,
                 sum(CAST(y AS DECIMAL(38,0))) AS sy,
                 sum(CAST(x AS DECIMAL(19,0)) * x) AS sxx,
                 sum(CAST(x AS DECIMAL(19,0)) * y) AS sxy,
                 sum(CAST(y AS DECIMAL(19,0)) * y) AS syy
          FROM base GROUP BY brand)
        SELECT brand, n,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS elasticity,
               round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                     / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
        FROM g
        ORDER BY brand""")),

    // -------------------------------------------------------------------
    // Sequential probability ratio test (Wald's SPRT) on each A/B arm's
    // conversion stream — the ALWAYS-VALID monitor an experimentation
    // platform runs instead of q46's fixed-horizon t-test (peeking at a
    // fixed-horizon test inflates false positives; the SPRT boundary is
    // designed to be looked at after EVERY event). Arms are q46's
    // deterministic hash split; H0: p=0.10 vs H1: p=0.12 conversion
    // (conversion = a purchase event), alpha = beta = 0.05. Per-event
    // log-likelihood increments are FIXED micro-nat integers
    // (ln(p1/p0) -> +182322, ln((1-p1)/(1-p0)) -> -22473), the walk is
    // an exact integer cumsum, and the boundaries are ±ln(19) ->
    // ±2944439 — everything integer, so the first-crossing position is
    // cross-engine exact. Scale: one window cumsum per arm + one
    // grouped conditional-min; the per-arm window is the same
    // time-ordered shape as q94's CUSUM.
    QueryDef("q141_sprt_monitor",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(
            pmod(expr(graft.operators.Ns.hash60("CAST(user_id AS STRING)")), lit(2L)).as("variant"),
            unix_micros(col("ts")).as("us"), col("event_id"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("x"))
          .withColumn("llr_step",
            when(col("x") === 1L, lit(182322L)).otherwise(lit(-22473L)))
        // the two arms are each event-sized: the time-ordered walk runs
        // as a grouped Prefix.orderStats two-pass scan (rank + exact
        // cumsum), never one task per arm
        val walked = Prefix.orderStats(ev,
          Seq(col("us"), col("event_id")), group = Seq("variant"),
          rn = Some("seq"), cumSums = Seq(("llr_step", "cum")))
        walked.groupBy("variant")
          .agg(count(ONE).as("n_events"), sum(col("x")).as("n_conversions"),
            expr("max_by(cum, seq)").as("final_llr_micro"),
            min(when(col("cum") >= 2944439L, col("seq"))).as("h1_pos"),
            min(when(col("cum") <= -2944439L, col("seq"))).as("h0_pos"))
          .select(col("variant"), col("n_events"), col("n_conversions"),
            col("final_llr_micro"),
            expr("""CASE WHEN h1_pos IS NOT NULL AND (h0_pos IS NULL OR h1_pos <= h0_pos)
                         THEN h1_pos
                         WHEN h0_pos IS NOT NULL THEN h0_pos END""").as("cross_pos"),
            expr("""CASE WHEN h1_pos IS NOT NULL AND (h0_pos IS NULL OR h1_pos <= h0_pos)
                         THEN 'accept_h1'
                         WHEN h0_pos IS NOT NULL THEN 'accept_h0'
                         ELSE 'continue' END""").as("decision"))
          .orderBy("variant")
      },
      Some(s"""
        WITH ev AS (
          SELECT ${graft.operators.Ns.oHash60("CAST(user_id AS VARCHAR)")} % 2 AS variant,
                 epoch_us(ts) AS us, event_id,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
                 CASE WHEN event_type = 'purchase' THEN 182322 ELSE -22473 END AS llr_step
          FROM events),
        walked AS (
          SELECT variant, x,
                 CAST(row_number() OVER tw AS BIGINT) AS seq,
                 CAST(sum(llr_step) OVER tc AS BIGINT) AS cum
          FROM ev
          WINDOW tw AS (PARTITION BY variant ORDER BY us, event_id),
                 tc AS (PARTITION BY variant ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        g AS (
          SELECT variant, count(*) AS n_events,
                 CAST(sum(x) AS BIGINT) AS n_conversions,
                 CAST(max_by(cum, seq) AS BIGINT) AS final_llr_micro,
                 min(CASE WHEN cum >= 2944439 THEN seq END) AS h1_pos,
                 min(CASE WHEN cum <= -2944439 THEN seq END) AS h0_pos
          FROM walked GROUP BY variant)
        SELECT variant, n_events, n_conversions, final_llr_micro,
               CASE WHEN h1_pos IS NOT NULL AND (h0_pos IS NULL OR h1_pos <= h0_pos)
                    THEN h1_pos
                    WHEN h0_pos IS NOT NULL THEN h0_pos END AS cross_pos,
               CASE WHEN h1_pos IS NOT NULL AND (h0_pos IS NULL OR h1_pos <= h0_pos)
                    THEN 'accept_h1'
                    WHEN h0_pos IS NOT NULL THEN 'accept_h0'
                    ELSE 'continue' END AS decision
        FROM g
        ORDER BY variant""")),

    // -------------------------------------------------------------------
    // Decision-stump split search (CART's root-node step): find the
    // value threshold that best separates purchases from the rest, by
    // Gini impurity — the feature-importance probe an experimentation
    // team runs before shipping a model. Exactness: with integer counts,
    // weighted-Gini comparison reduces to maximizing
    //   Q(t) = sL/nL + sR/nR,  s = pos^2 + neg^2 per side,
    // so each candidate's score is the exact integer
    //   floor(1e12 * (sL*nR + sR*nL) / (nL*nR))
    // in DECIMAL(38,0) / HUGEINT (numerator <= ~2e27 at sf0.1) — the
    // q102 clear-the-rational-denominator recipe applied to impurity.
    // Scale: one agg over ~561 whole-unit buckets, one prefix-sum window
    // over the bucket table (never the events), one top-1.
    QueryDef("q142_gini_stump",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) div 100").as("vb"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        val buckets = ev.groupBy("vb")
          .agg(count(ONE).as("cnt"), sum(col("y")).as("pos"))
        val tot = buckets.agg(sum(col("cnt")).as("n"), sum(col("pos")).as("p"))
        val wc = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cand = buckets
          .withColumn("nl", sum(col("cnt")).over(wc))
          .withColumn("pl", sum(col("pos")).over(wc))
          .crossJoin(broadcast(tot))
          .filter(col("n") > col("nl"))
          .select(col("vb").as("threshold"), col("nl"), (col("n") - col("nl")).as("nr"),
            col("pl"), (col("p") - col("pl")).as("pr"), col("n"), col("p"))
          .select(col("threshold"), col("nl"), col("nr"), col("pl"), col("pr"),
            expr("""(CAST(pl AS DECIMAL(38,0)) * pl + CAST(nl - pl AS DECIMAL(38,0)) * (nl - pl))""").as("sl"),
            expr("""(CAST(pr AS DECIMAL(38,0)) * pr + CAST(nr - pr AS DECIMAL(38,0)) * (nr - pr))""").as("sr"),
            col("n"), col("p"))
          .select(col("threshold"), col("nl"), col("nr"), col("pl"), col("pr"),
            expr("CAST((sl * nr + sr * nl) * 1000000000000 div (CAST(nl AS DECIMAL(38,0)) * nr) AS BIGINT)")
              .as("split_score_micro12"),
            expr("""CAST((CAST(p AS DECIMAL(38,0)) * p + CAST(n - p AS DECIMAL(38,0)) * (n - p))
                    * 1000000000000 div CAST(n AS DECIMAL(38,0)) AS BIGINT)""")
              .as("parent_score_micro12"))
        cand
          .withColumn("rn", row_number().over(
            // bounded: one row per whole-unit value bucket (~561), never event-sized
            Window.orderBy(col("split_score_micro12").desc, col("threshold"))))
          .filter(col("rn") === 1)
          .select(col("threshold"), col("nl").as("n_left"), col("nr").as("n_right"),
            col("pl").as("pos_left"), col("pr").as("pos_right"),
            col("split_score_micro12"),
            (col("split_score_micro12") - col("parent_score_micro12")).as("gini_gain_micro12"))
      },
      Some("""
        WITH ev AS (
          SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) // 100 AS vb,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
          FROM events),
        buckets AS (
          SELECT vb, count(*) AS cnt, CAST(sum(y) AS BIGINT) AS pos
          FROM ev GROUP BY vb),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS p FROM buckets),
        pre AS (
          SELECT vb,
                 CAST(sum(cnt) OVER w AS BIGINT) AS nl,
                 CAST(sum(pos) OVER w AS BIGINT) AS pl
          FROM buckets
          WINDOW w AS (ORDER BY vb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        cand AS (
          SELECT vb AS threshold, nl, n - nl AS nr, pl, p - pl AS pr, n, p
          FROM pre CROSS JOIN tot
          WHERE n > nl),
        scored AS (
          SELECT threshold, nl, nr, pl, pr,
                 CAST(((CAST(pl AS HUGEINT) * pl + CAST(nl - pl AS HUGEINT) * (nl - pl)) * nr
                     + (CAST(pr AS HUGEINT) * pr + CAST(nr - pr AS HUGEINT) * (nr - pr)) * nl)
                      * 1000000000000 // (CAST(nl AS HUGEINT) * nr) AS BIGINT)
                   AS split_score_micro12,
                 CAST((CAST(p AS HUGEINT) * p + CAST(n - p AS HUGEINT) * (n - p))
                      * 1000000000000 // CAST(n AS HUGEINT) AS BIGINT)
                   AS parent_score_micro12
          FROM cand),
        best AS (
          SELECT *, row_number() OVER (ORDER BY split_score_micro12 DESC, threshold) AS rn
          FROM scored)
        SELECT threshold, nl AS n_left, nr AS n_right, pl AS pos_left, pr AS pos_right,
               split_score_micro12,
               split_score_micro12 - parent_score_micro12 AS gini_gain_micro12
        FROM best WHERE rn = 1""")),

    // -------------------------------------------------------------------
    // Consistent-hashing rebalance audit: assign every user to a shard
    // on a 64-point hash ring (8 shards x 8 virtual nodes), then re-run
    // the assignment with a 9th shard's 8 points added, and report the
    // (old shard, new shard) movement matrix. The consistent-hashing
    // guarantee under test: only successor arcs claimed by the NEW
    // shard's points move (every off-diagonal row has shard9 = 8), and
    // the moved fraction is ~1/9, not the ~8/9 of `hash % n_shards`.
    // Ring positions and user positions are the 60-bit md5 ([[Ns]]), so
    // both engines walk the identical ring. Scale: the ring is a 72-row
    // broadcast; assignment is min_by over a per-user conditional — one
    // map-side-combinable agg, no sort, no range join.
    QueryDef("q143_consistent_hash",
      (s, d) => {
        val ring = s.range(0, 72).toDF("i")
          .select((col("i") / 8).cast("long").as("shard"), (col("i") % 8).as("vn"))
          .select(col("shard"),
            expr(Ns.hash60("CONCAT('ring#', CAST(shard AS STRING), ':', CAST(vn AS STRING))")).as("pos"))
        val users = Tables.events(s, d).select(col("user_id")).distinct()
          .select(col("user_id"),
            expr(Ns.hash60("CONCAT('u#', CAST(user_id AS STRING))")).as("upos"))
        val assigned = users.crossJoin(broadcast(ring))
          .groupBy("user_id")
          .agg(
            min_by(when(col("shard") < 8, col("shard")),
              when(col("shard") < 8 && col("pos") >= col("upos"), col("pos"))).as("succ8"),
            min_by(when(col("shard") < 8, col("shard")),
              when(col("shard") < 8, col("pos"))).as("wrap8"),
            min_by(col("shard"), when(col("pos") >= col("upos"), col("pos"))).as("succ9"),
            min_by(col("shard"), col("pos")).as("wrap9"))
          .select(col("user_id"),
            coalesce(col("succ8"), col("wrap8")).as("shard8"),
            coalesce(col("succ9"), col("wrap9")).as("shard9"))
        assigned.groupBy("shard8", "shard9")
          .agg(count(ONE).as("n_users"))
          .select(col("shard8"), col("shard9"), col("n_users"),
            (col("shard8") =!= col("shard9")).as("moved"))
          .orderBy("shard8", "shard9")
      },
      Some(s"""
        WITH ring AS (
          SELECT CAST(i // 8 AS BIGINT) AS shard,
                 ${Ns.oHash60("'ring#' || CAST(i // 8 AS VARCHAR) || ':' || CAST(i % 8 AS VARCHAR)")} AS pos
          FROM range(72) t(i)),
        users AS (
          SELECT DISTINCT user_id FROM events),
        upos AS (
          SELECT user_id, ${Ns.oHash60("'u#' || CAST(user_id AS VARCHAR)")} AS upos
          FROM users),
        assigned AS (
          SELECT u.user_id,
                 coalesce(
                   arg_min(CASE WHEN r.shard < 8 THEN r.shard END,
                           CASE WHEN r.shard < 8 AND r.pos >= u.upos THEN r.pos END),
                   arg_min(CASE WHEN r.shard < 8 THEN r.shard END,
                           CASE WHEN r.shard < 8 THEN r.pos END)) AS shard8,
                 coalesce(
                   arg_min(r.shard, CASE WHEN r.pos >= u.upos THEN r.pos END),
                   arg_min(r.shard, r.pos)) AS shard9
          FROM upos u CROSS JOIN ring r
          GROUP BY u.user_id)
        SELECT shard8, shard9, count(*) AS n_users, shard8 <> shard9 AS moved
        FROM assigned
        GROUP BY shard8, shard9
        ORDER BY shard8, shard9""")),

    // -------------------------------------------------------------------
    // Haar wavelet energy spectrum of the daily-revenue series — the
    // multi-resolution decomposition that separates day-to-day noise
    // (level 1) from seasonal structure (high levels), feeding anomaly
    // and compression decisions. NO recursive transform: the unnormalized
    // Haar detail at level j, position k is
    //   (sum of cents in block [2k·h, (2k+1)·h)) − (sum in [(2k+1)·h, (2k+2)·h)),
    // h = 2^(j-1), so each level is ONE groupBy of the day series with a
    // ±1 sign by block parity — 12 levels over a fixed 4096-slot grid
    // (orders span 2405 days; absent days are implicit zeros because
    // absent rows simply contribute nothing to the block sums). Energy
    // per level = Σ detail² in exact DECIMAL(38,0) (detail ≤ total
    // revenue cents ~2e12, squared 5e24). Scale: the series is one
    // date-grain agg of orders; the 12-way explode is over the ~2400-row
    // day table, not the fact table.
    QueryDef("q144_haar_energy",
      (s, d) => {
        val day = Tables.orders(s, d)
          .select(col("o_orderdate"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        val minD = day.agg(min(expr("CAST(o_orderdate AS DATE)")).as("d0"))
        val series = day.crossJoin(broadcast(minD))
          .select(expr("CAST(datediff(CAST(o_orderdate AS DATE), d0) AS BIGINT)").as("idx"),
            col("cents"))
          .groupBy("idx").agg(sum(col("cents")).as("v"))
        val details = series
          .select(col("idx"), col("v"), explode(expr("sequence(1, 12)")).as("j"))
          .select(col("j"),
            expr("idx div shiftleft(1, j)").as("k"),
            expr("CASE WHEN (idx div shiftleft(1, j - 1)) % 2 = 0 THEN v ELSE -v END").as("sv"))
          .groupBy("j", "k").agg(sum(col("sv")).as("detail"))
        val energy = details.groupBy("j")
          .agg(count(ONE).as("n_coeffs"),
            sum(expr("CAST(detail AS DECIMAL(38,0)) * detail")).cast("decimal(38,0)").as("energy"))
        val tot = energy.agg(sum(col("energy")).cast("decimal(38,0)").as("e_tot"))
        energy.crossJoin(broadcast(tot))
          .select(col("j").as("level"), col("n_coeffs"),
            // cents² reaches ~1.3e20 at sf0.1 — past int64, so the exact
            // integer is published mega-quantized (div 1e6, positive
            // floor in both engines)
            expr("CAST(energy div 1000000 AS BIGINT)").as("energy_mega"),
            round(col("energy").cast("double") / col("e_tot").cast("double"), 6)
              .as("energy_share"))
          .orderBy("level")
      },
      Some("""
        WITH day AS (
          SELECT CAST(o_orderdate AS DATE) AS od,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM orders),
        mind AS (SELECT min(od) AS d0 FROM day),
        series AS (
          SELECT CAST(date_diff('day', d0, od) AS BIGINT) AS idx,
                 CAST(sum(cents) AS BIGINT) AS v
          FROM day CROSS JOIN mind
          GROUP BY 1),
        details AS (
          SELECT j, idx // (1 << j) AS k,
                 CAST(sum(CASE WHEN (idx // (1 << (j - 1))) % 2 = 0 THEN v ELSE -v END)
                      AS BIGINT) AS detail
          FROM series CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS j)
          GROUP BY j, k),
        energy AS (
          SELECT j, count(*) AS n_coeffs,
                 CAST(sum(CAST(detail AS HUGEINT) * detail) AS DECIMAL(38,0)) AS energy
          FROM details GROUP BY j),
        tot AS (SELECT CAST(sum(energy) AS DECIMAL(38,0)) AS e_tot FROM energy)
        SELECT j AS level, n_coeffs,
               CAST(CAST(energy AS HUGEINT) // 1000000 AS BIGINT) AS energy_mega,
               round(CAST(energy AS DOUBLE) / CAST(e_tot AS DOUBLE), 6) AS energy_share
        FROM energy CROSS JOIN tot
        ORDER BY level""")),

    // -------------------------------------------------------------------
    // Lagged cross-correlation of hourly view counts vs purchase counts
    // (does browsing LEAD buying, and by how many hours?) — q101's
    // n²-scaled exact estimator generalized to two series:
    //   num_l = D²·S_xy(l) − D·(Sx·B_l + Sy·A_l) + (D−l)·Sx·Sy
    //   r_l   = num_l / (D · sqrt((D·Sxx − Sx²)(D·Syy − Sy²)))
    // with D the full hour-grid span, A_l/B_l the head/tail partial sums
    // the lag-l overlap touches. Hours with zero events are implicit
    // grid zeros: they contribute nothing to any sum, so absent rows are
    // already correct. All terms exact DECIMAL(38,0); the only float is
    // the final division. Scale: the series is one hour-grain agg; the
    // lag pairing is a 4-way bounded self equi-join of the ~720-row
    // hour table.
    QueryDef("q145_xcorr_lead_lag",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(unix_micros(col("ts")).as("us"), col("event_type"))
        val m = ev.agg(min(col("us")).as("us0"), max(col("us")).as("us1"))
        val hourly = ev.crossJoin(broadcast(m))
          .select(expr("(us - us0) div 3600000000").as("b"),
            when(col("event_type") === "view", 1L).otherwise(0L).as("xv"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("yv"))
          .groupBy("b").agg(sum(col("xv")).as("x"), sum(col("yv")).as("y"))
        val dSpan = ev.crossJoin(broadcast(m))
          .agg(max(expr("(us - us0) div 3600000000 + 1")).as("sp")).select(col("sp"))
        val lags = s.range(0, 4).toDF("lag")
        val heads = hourly.crossJoin(broadcast(dSpan)).crossJoin(broadcast(lags))
          .groupBy("lag")
          .agg(max(col("sp")).as("sp"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
            sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
            sum(when(col("b") <= col("sp") - 1 - col("lag"), col("x")).otherwise(0L)).as("al"),
            sum(when(col("b") >= col("lag"), col("y")).otherwise(0L)).as("bl"))
        val sxy = hourly.select(col("b"), col("x"))
          .join(hourly.select(col("b").as("b2"), col("y")).crossJoin(broadcast(lags)),
            col("b2") === col("b") + col("lag"))
          .groupBy("lag")
          .agg(sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        heads.join(sxy, Seq("lag"), "left")
          .select(col("lag"), col("sp").as("n_hours"),
            coalesce(col("sxy"), lit(0)).cast("long").as("s_xy"),
            expr("""CAST(CAST(sp AS DECIMAL(38,0)) * sp * coalesce(sxy, 0)
                    - CAST(sp AS DECIMAL(38,0)) * (sx * bl + sy * al)
                    + (CAST(sp AS DECIMAL(38,0)) - lag) * sx * sy AS DECIMAL(38,0))""").as("num"),
            expr("CAST(CAST(sp AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0))").as("dx"),
            expr("CAST(CAST(sp AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS DECIMAL(38,0))").as("dy"))
          .select(col("lag"), col("n_hours"), col("s_xy"),
            round(col("num").cast("double")
              / (col("n_hours").cast("double")
                 * sqrt(col("dx").cast("double") * col("dy").cast("double"))), 6).as("xcorr"))
          .orderBy("lag")
      },
      Some("""
        WITH ev AS (
          SELECT epoch_us(ts) AS us, event_type FROM events),
        m AS (SELECT min(us) AS us0, max(us) AS us1 FROM ev),
        hourly AS (
          SELECT (us - us0) // 3600000000 AS b,
                 CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN m
          GROUP BY 1),
        span AS (
          SELECT CAST(max((us - us0) // 3600000000 + 1) AS BIGINT) AS sp
          FROM ev CROSS JOIN m),
        lags AS (SELECT unnest(generate_series(0, 3)) AS lag),
        heads AS (
          SELECT lag, max(sp) AS sp,
                 CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
                 CAST(sum(CASE WHEN b <= sp - 1 - lag THEN x ELSE 0 END) AS HUGEINT) AS al,
                 CAST(sum(CASE WHEN b >= lag THEN y ELSE 0 END) AS HUGEINT) AS bl
          FROM hourly CROSS JOIN span CROSS JOIN lags
          GROUP BY lag),
        sxy AS (
          SELECT lag, CAST(sum(CAST(a.x AS HUGEINT) * c.y) AS HUGEINT) AS sxy
          FROM hourly a CROSS JOIN lags
          JOIN (SELECT b, y FROM hourly) c ON c.b = a.b + lag
          GROUP BY lag),
        terms AS (
          SELECT h.lag, h.sp AS n_hours,
                 CAST(coalesce(s.sxy, 0) AS BIGINT) AS s_xy,
                 CAST(h.sp AS HUGEINT) * h.sp * coalesce(s.sxy, 0)
                   - CAST(h.sp AS HUGEINT) * (h.sx * h.bl + h.sy * h.al)
                   + (CAST(h.sp AS HUGEINT) - h.lag) * h.sx * h.sy AS num,
                 CAST(h.sp AS HUGEINT) * h.sxx - h.sx * h.sx AS dx,
                 CAST(h.sp AS HUGEINT) * h.syy - h.sy * h.sy AS dy
          FROM heads h LEFT JOIN sxy s ON h.lag = s.lag)
        SELECT lag, n_hours, s_xy,
               round(CAST(num AS DOUBLE)
                     / (CAST(n_hours AS DOUBLE) * sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE))), 6)
                 AS xcorr
        FROM terms
        ORDER BY lag""")),

    // -------------------------------------------------------------------
    // Horvitz-Thompson estimation audit: a deterministic 10% Bernoulli
    // hash-sample of orders (inclusion probability π = 1/10 exactly, so
    // the HT weight 1/π = 10 and the Bernoulli variance estimator
    // (1−π)/π²·Σy² = 90·Σy² are exact integers in cents) against the
    // true per-priority totals the full scan gives. This is the
    // estimate-vs-truth report a sampling pipeline publishes to justify
    // scanning 10% instead of 100 TB. Relative error is quantized by
    // abs() then integer floor division (both engines floor POSITIVE
    // quotients identically; signed floor/trunc differs — the q105
    // lesson). Scale: one projection + two aggs, no joins beyond the
    // group key.
    QueryDef("q146_ht_estimate",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderpriority"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"),
            (expr(Ns.hash60("CONCAT('ht#', CAST(o_orderkey AS STRING))")) % 10 === 0).as("inS"))
        o.groupBy("o_orderpriority")
          .agg(count(ONE).as("n_pop"),
            sum(col("cents")).as("total_cents"),
            sum(when(col("inS"), 1L).otherwise(0L)).as("n_sampled"),
            (sum(when(col("inS"), col("cents")).otherwise(0L)) * 10).as("ht_total_cents"),
            sum(when(col("inS"), expr("CAST(cents AS DECIMAL(38,0)) * cents * 90"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).cast("decimal(38,0)").as("var_hat"))
          .select(col("o_orderpriority"), col("n_pop"), col("total_cents"),
            col("n_sampled"), col("ht_total_cents"),
            (col("ht_total_cents") - col("total_cents")).as("err_cents"),
            // cents² variance reaches ~2.3e20 at sf0.1 — past int64, so
            // published mega-quantized (div 1e6, positive floor)
            expr("CAST(var_hat div 1000000 AS BIGINT)").as("var_hat_mega"),
            expr("abs(ht_total_cents - total_cents) * 1000000 div total_cents")
              .as("abs_rel_err_micro"))
          .orderBy("o_orderpriority")
      },
      Some(s"""
        WITH o AS (
          SELECT o_orderpriority,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
                 ${Ns.oHash60("'ht#' || CAST(o_orderkey AS VARCHAR)")} % 10 = 0 AS ins
          FROM orders),
        g AS (
          SELECT o_orderpriority, count(*) AS n_pop,
                 CAST(sum(cents) AS BIGINT) AS total_cents,
                 CAST(sum(CASE WHEN ins THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
                 CAST(sum(CASE WHEN ins THEN cents ELSE 0 END) * 10 AS BIGINT) AS ht_total_cents,
                 CAST(sum(CASE WHEN ins THEN CAST(cents AS HUGEINT) * cents * 90 ELSE 0 END)
                      AS DECIMAL(38,0)) AS var_hat
          FROM o GROUP BY o_orderpriority)
        SELECT o_orderpriority, n_pop, total_cents, n_sampled, ht_total_cents,
               ht_total_cents - total_cents AS err_cents,
               CAST(CAST(var_hat AS HUGEINT) // 1000000 AS BIGINT) AS var_hat_mega,
               CAST(abs(ht_total_cents - total_cents) * 1000000 // total_cents AS BIGINT)
                 AS abs_rel_err_micro
        FROM g
        ORDER BY o_orderpriority""")),

    // -------------------------------------------------------------------
    // Net present value of each market segment's order stream at a 10%
    // annual discount rate — finance's canonical "compare revenue
    // streams across time" rollup. NO float pow: 1/1.1^k = (10/11)^k,
    // so each order's discounted term is the EXACT integer
    //   (cents · 1e6 · 10^k) div 11^k
    // (k = years since the fixture's first order year, ≤ 6 → numerator
    // ≤ ~5e19, DECIMAL(38,0)/HUGEINT; both engines floor the positive
    // quotient identically — Math.pow/libm never runs, the q112 libm
    // lesson). Terms are micro-cents, summed exactly, published
    // back-quantized to cents. Scale: one broadcast (min year) + one
    // segment-key join + one agg.
    QueryDef("q147_npv_exact",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"),
            year(expr("CAST(o_orderdate AS DATE)")).as("yr"))
        val y0 = o.agg(min(col("yr")).as("yr0"))
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        o.crossJoin(broadcast(y0))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment"), col("cents"),
            (col("yr") - col("yr0")).as("k"))
          .select(col("c_mktsegment"), col("cents"),
            expr("""CAST(CAST(cents AS DECIMAL(38,0)) * 1000000
                    * CAST(power(10, k) AS DECIMAL(18,0))
                    div CAST(power(11, k) AS DECIMAL(18,0)) AS DECIMAL(38,0))""")
              .as("term_micro"))
          .groupBy("c_mktsegment")
          .agg(count(ONE).as("n_orders"),
            sum(col("cents")).as("nominal_cents"),
            expr("CAST(sum(term_micro) div 1000000 AS BIGINT)").as("npv_cents"))
          .select(col("c_mktsegment"), col("n_orders"), col("nominal_cents"),
            col("npv_cents"),
            expr("npv_cents * 1000000 div nominal_cents").as("npv_ratio_micro"))
          .orderBy("c_mktsegment")
      },
      Some("""
        WITH o AS (
          SELECT o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
                 year(CAST(o_orderdate AS DATE)) AS yr
          FROM orders),
        y0 AS (SELECT min(yr) AS yr0 FROM o),
        t AS (
          SELECT c.c_mktsegment, o.cents,
                 CAST(CAST(o.cents AS HUGEINT) * 1000000
                      * CAST(power(10, yr - yr0) AS BIGINT)
                      // CAST(power(11, yr - yr0) AS BIGINT) AS HUGEINT) AS term_micro
          FROM o CROSS JOIN y0
          JOIN customer c ON o.o_custkey = c.c_custkey),
        g AS (
          SELECT c_mktsegment, count(*) AS n_orders,
                 CAST(sum(cents) AS BIGINT) AS nominal_cents,
                 CAST(sum(term_micro) // 1000000 AS BIGINT) AS npv_cents
          FROM t GROUP BY c_mktsegment)
        SELECT c_mktsegment, n_orders, nominal_cents, npv_cents,
               CAST(npv_cents * 1000000 // nominal_cents AS BIGINT) AS npv_ratio_micro
        FROM g
        ORDER BY c_mktsegment""")),

    // -------------------------------------------------------------------
    // Benjamini-Hochberg FDR screen over per-nation account-balance
    // deviation tests — the multiple-comparison correction a metrics
    // platform applies before flagging "nation X's balances are off".
    // Per nation: the z² statistic against the global mean is the exact
    // rational (S_i·n − S·n_i)² / (n_i·(n·SS − S²)) in integer cents
    // (num/den, DECIMAL(38,0)); its distribution-free Chebyshev tail
    // bound p ≤ den/num is the p-value proxy. BH at α = 1/20 accepts
    // rank-i iff p_(i) ≤ i·α/m ⇔ 20·m·den_i ≤ i·num_i — evaluated by
    // EXACT integer cross-multiplication, no division anywhere in the
    // decision; ranking (p ascending = z² descending) uses the
    // micro-quantized z² with nation tie-break, identical in both
    // engines. Significant = rank ≤ k* = max accepted rank (the BH
    // step-up). Scale: one agg to 25 nation rows + a 25-row window.
    QueryDef("q148_bh_fdr",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_nationkey"),
            expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        val per = c.groupBy("c_nationkey")
          .agg(count(ONE).as("ni"), sum(col("cents")).as("si"))
        val tot = c.agg(count(ONE).as("n"), sum(col("cents")).as("ss_sum"),
          sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("ssq"))
        val scored = per.crossJoin(broadcast(tot))
          .select(col("c_nationkey"), col("ni"),
            expr("""CAST((CAST(si AS DECIMAL(38,0)) * n - CAST(ss_sum AS DECIMAL(38,0)) * ni)
                    * (CAST(si AS DECIMAL(38,0)) * n - CAST(ss_sum AS DECIMAL(38,0)) * ni)
                    AS DECIMAL(38,0))""").as("num"),
            expr("""CAST(CAST(ni AS DECIMAL(38,0))
                    * (CAST(n AS DECIMAL(38,0)) * ssq - CAST(ss_sum AS DECIMAL(38,0)) * ss_sum)
                    AS DECIMAL(38,0))""").as("den"))
          .withColumn("z2_micro", expr("CAST(num * 1000000 div den AS BIGINT)"))
          .withColumn("rank", row_number().over(
            // bounded: one row per nation (25), never customer-sized
            Window.orderBy(col("z2_micro").desc, col("c_nationkey"))).cast("long"))
        val m = scored.agg(count(ONE).as("m"))
        val flagged = scored.crossJoin(broadcast(m))
          .withColumn("accept", expr("20 * m * den <= rank * num"))
        val kstar = flagged.agg(max(when(col("accept"), col("rank"))).as("kstar"))
        flagged.crossJoin(broadcast(kstar))
          .select(col("c_nationkey"), col("ni").as("n_customers"), col("rank"),
            col("z2_micro"),
            expr("CASE WHEN num = 0 THEN 1000000 ELSE least(den * 1000000 div num, 1000000) END")
              .as("p_proxy_micro"),
            expr("rank * 1000000 div (20 * m)").as("bh_cutoff_micro"),
            expr("kstar IS NOT NULL AND rank <= kstar").as("significant"))
          .orderBy("rank")
      },
      Some("""
        WITH c AS (
          SELECT c_nationkey,
                 CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM customer),
        per AS (
          SELECT c_nationkey, count(*) AS ni, CAST(sum(cents) AS BIGINT) AS si
          FROM c GROUP BY c_nationkey),
        tot AS (
          SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS ss_sum,
                 CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS ssq
          FROM c),
        scored AS (
          SELECT c_nationkey, ni,
                 (CAST(si AS HUGEINT) * n - CAST(ss_sum AS HUGEINT) * ni)
                 * (CAST(si AS HUGEINT) * n - CAST(ss_sum AS HUGEINT) * ni) AS num,
                 CAST(ni AS HUGEINT)
                 * (CAST(n AS HUGEINT) * ssq - CAST(ss_sum AS HUGEINT) * ss_sum) AS den
          FROM per CROSS JOIN tot),
        ranked AS (
          SELECT *, CAST(num * 1000000 // den AS BIGINT) AS z2_micro
          FROM scored),
        rr AS (
          SELECT *, CAST(row_number() OVER (ORDER BY z2_micro DESC, c_nationkey) AS BIGINT) AS rank,
                 (SELECT count(*) FROM ranked) AS m
          FROM ranked),
        fl AS (
          SELECT *, 20 * m * den <= rank * num AS accept FROM rr),
        ks AS (SELECT max(CASE WHEN accept THEN rank END) AS kstar FROM fl)
        SELECT c_nationkey, ni AS n_customers, rank, z2_micro,
               CASE WHEN num = 0 THEN 1000000
                    ELSE CAST(least(den * 1000000 // num, 1000000) AS BIGINT) END AS p_proxy_micro,
               CAST(rank * 1000000 // (20 * m) AS BIGINT) AS bh_cutoff_micro,
               kstar IS NOT NULL AND rank <= kstar AS significant
        FROM fl CROSS JOIN ks
        ORDER BY rank""")),

    // -------------------------------------------------------------------
    // 24-hour ROLLING correlation between hourly view and purchase
    // counts — q145's single lead-lag number unrolled into the monitor
    // a dashboard actually plots (does the browse→buy coupling drift
    // over the month?). The window is a RANGE frame over the hour GRID
    // (range 23 preceding on the bucket index), so hours with zero
    // events — absent rows — are still correct implicit zeros: they
    // contribute nothing to any windowed sum, and the divisor W =
    // least(b+1, 24) counts grid slots, not present rows. All sums
    // exact BIGINT; r = (W·Sxy − Sx·Sy)/√((W·Sxx−Sx²)(W·Syy−Sy²)) is
    // the only float, null when either side is constant. Scale: one
    // hour-grain agg + one range-frame window pass, no self-join.
    QueryDef("q149_rolling_corr",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(unix_micros(col("ts")).as("us"), col("event_type"))
        val m = ev.agg(min(col("us")).as("us0"))
        val hourly = ev.crossJoin(broadcast(m))
          .select(expr("(us - us0) div 3600000000").as("b"),
            when(col("event_type") === "view", 1L).otherwise(0L).as("xv"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("yv"))
          .groupBy("b").agg(sum(col("xv")).as("x"), sum(col("yv")).as("y"))
        // bounded: one row per month bucket, never order-sized
        val w = Window.orderBy("b").rangeBetween(-23, 0)
        hourly
          .withColumn("sx", sum(col("x")).over(w))
          .withColumn("sy", sum(col("y")).over(w))
          .withColumn("sxx", sum(expr("x * x")).over(w))
          .withColumn("syy", sum(expr("y * y")).over(w))
          .withColumn("sxy", sum(expr("x * y")).over(w))
          .withColumn("wsz", least(col("b") + 1, lit(24L)))
          .select(col("b").as("hour_idx"), col("wsz").as("w"),
            col("sx").as("views_24h"), col("sy").as("purchases_24h"),
            expr("""CASE WHEN (wsz * sxx - sx * sx) > 0 AND (wsz * syy - sy * sy) > 0
                    THEN round(CAST(wsz * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(wsz * sxx - sx * sx AS DOUBLE)
                                * CAST(wsz * syy - sy * sy AS DOUBLE)), 6)
                    END""").as("roll_corr"))
          .orderBy("hour_idx")
      },
      Some("""
        WITH ev AS (
          SELECT epoch_us(ts) AS us, event_type FROM events),
        m AS (SELECT min(us) AS us0 FROM ev),
        hourly AS (
          SELECT (us - us0) // 3600000000 AS b,
                 CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN m
          GROUP BY 1),
        r AS (
          SELECT b,
                 CAST(sum(x) OVER w AS BIGINT) AS sx,
                 CAST(sum(y) OVER w AS BIGINT) AS sy,
                 CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
                 CAST(sum(y * y) OVER w AS BIGINT) AS syy,
                 CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
                 least(b + 1, 24) AS wsz
          FROM hourly
          WINDOW w AS (ORDER BY b RANGE BETWEEN 23 PRECEDING AND CURRENT ROW))
        SELECT b AS hour_idx, wsz AS w, sx AS views_24h, sy AS purchases_24h,
               CASE WHEN (wsz * sxx - sx * sx) > 0 AND (wsz * syy - sy * sy) > 0
                    THEN round(CAST(wsz * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(wsz * sxx - sx * sx AS DOUBLE)
                                * CAST(wsz * syy - sy * sy AS DOUBLE)), 6)
               END AS roll_corr
        FROM r
        ORDER BY hour_idx""")),

    // -------------------------------------------------------------------
    // CUPED variance reduction for the q46 A/B split: per user, X = the
    // pre-period covariate (first-15-day value sum) and Y = the outcome
    // (last-15-day sum); CUPED adjusts Y by θ·(X − X̄) with
    // θ = cov(X,Y)/var(X), cutting outcome variance by exactly
    // ρ²(X,Y) — the number this card reports per arm (experimentation
    // platforms ship faster because of it; Deng et al. 2013). All of
    // θ and ρ² come from the centered integer moment forms
    // Sxx = n·Σx²−(Σx)² etc. in DECIMAL(38,0)/HUGEINT: θ is a
    // positivity-shifted floor division (cov can be negative — the
    // q105 recipe), ρ²·1e6 = Sxy²·1e6 div (Sxx·Syy) is exact and
    // nonnegative. User sums are whole currency units (cents div 100)
    // so Sxy² stays under 38 digits at 10× the fixture. Scale: one
    // user-grain agg, one variant-grain agg — no joins.
    QueryDef("q150_cuped",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) div 100").as("u"))
        val m = ev.agg(min(col("us")).as("us0"))
        val per = ev.crossJoin(broadcast(m))
          .select(col("user_id"),
            when(col("us") < col("us0") + 1296000000000L, col("u")).otherwise(0L).as("xu"),
            when(col("us") >= col("us0") + 1296000000000L, col("u")).otherwise(0L).as("yu"))
          .groupBy("user_id")
          .agg(sum(col("xu")).as("x"), sum(col("yu")).as("y"))
          .select(
            pmod(expr(graft.operators.Ns.hash60("CAST(user_id AS STRING)")), lit(2L)).as("variant"),
            col("x"), col("y"))
        per.groupBy("variant")
          .agg(count(ONE).as("n_users"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
            sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
          .select(col("variant"), col("n_users"),
            col("sx").as("sum_pre_units"), col("sy").as("sum_out_units"),
            expr("CAST(n_users AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx").as("cxx"),
            expr("CAST(n_users AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy").as("cyy"),
            expr("CAST(n_users AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy").as("cxy"))
          .select(col("variant"), col("n_users"), col("sum_pre_units"), col("sum_out_units"),
            expr("""CASE WHEN cxx > 0 THEN
                    CAST((cxy * 1000000 + 1000000000 * cxx) div cxx AS BIGINT) - 1000000000
                    END""").as("theta_micro"),
            expr("""CASE WHEN cxx > 0 AND cyy > 0 THEN
                    CAST(cxy * cxy * 1000000 div (cxx * cyy) AS BIGINT)
                    END""").as("var_reduction_micro"))
          .orderBy("variant")
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) // 100 AS u
          FROM events),
        m AS (SELECT min(us) AS us0 FROM ev),
        per AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN us < us0 + 1296000000000 THEN u ELSE 0 END) AS BIGINT) AS x,
                 CAST(sum(CASE WHEN us >= us0 + 1296000000000 THEN u ELSE 0 END) AS BIGINT) AS y
          FROM ev CROSS JOIN m
          GROUP BY user_id),
        v AS (
          SELECT ${graft.operators.Ns.oHash60("CAST(user_id AS VARCHAR)")} % 2 AS variant, x, y
          FROM per),
        g AS (
          SELECT variant, count(*) AS n_users,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
          FROM v GROUP BY variant),
        c AS (
          SELECT variant, n_users, sx AS sum_pre_units, sy AS sum_out_units,
                 CAST(n_users AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS cxx,
                 CAST(n_users AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS cyy,
                 CAST(n_users AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cxy
          FROM g)
        SELECT variant, n_users, sum_pre_units, sum_out_units,
               CASE WHEN cxx > 0 THEN
                 CAST((cxy * 1000000 + 1000000000 * cxx) // cxx AS BIGINT) - 1000000000
               END AS theta_micro,
               CASE WHEN cxx > 0 AND cyy > 0 THEN
                 CAST(cxy * cxy * 1000000 // (cxx * cyy) AS BIGINT)
               END AS var_reduction_micro
        FROM c
        ORDER BY variant""")),

    // -------------------------------------------------------------------
    // QUANTITY-weighted price quantiles per brand — the "median sale
    // price" a merchandiser actually wants (each line item counts by
    // units sold, not once; q103's unweighted median can't say this).
    // Weighted quantile q = smallest price whose cumulative weight
    // reaches q·W, decided by integer cross-multiplication
    // (k·cumw ≥ q_num·W with weights in exact centi-units) — no
    // rational threshold, no interpolation, so engines agree exactly.
    // Scale: one brand-key join (part is the broadcast dim), one
    // per-brand window cumsum, one conditional-min agg.
    QueryDef("q151_weighted_quantile",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("price_c"),
            expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").as("w"))
        val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
        val rows = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        // 25 brands × lineitem-sized groups: the weighted cumulative walk
        // runs as a grouped Prefix.orderStats prefix sum, never one task
        // per brand; the group totals ride along in the same scan
        // (groupCount/groupSums) instead of a separate agg joined back —
        // which would scan the prefix RDD (and re-run its sort) twice
        val c = Prefix.orderStats(rows,
          Seq(col("price_c"), col("l_orderkey"), col("l_linenumber")),
          group = Seq("p_brand"), cumSums = Seq(("w", "cumw")),
          groupCount = Some("n_lines"), groupSums = Seq(("w", "tw")))
        c.groupBy("p_brand")
          .agg(max(col("n_lines")).as("n_lines"), max(col("tw")).as("total_weight"),
            min(when(expr("4 * cumw >= tw"), col("price_c"))).as("wp25_cents"),
            min(when(expr("2 * cumw >= tw"), col("price_c"))).as("wmedian_cents"),
            min(when(expr("4 * cumw >= 3 * tw"), col("price_c"))).as("wp75_cents"))
          .orderBy("p_brand")
      },
      Some("""
        WITH li AS (
          SELECT l_partkey, l_orderkey, l_linenumber,
                 CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS price_c,
                 CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS w
          FROM lineitem),
        rows_ AS (
          SELECT p.p_brand, li.price_c, li.w, li.l_orderkey, li.l_linenumber
          FROM li JOIN part p ON li.l_partkey = p.p_partkey),
        c AS (
          SELECT p_brand, price_c, w,
                 CAST(sum(w) OVER (PARTITION BY p_brand
                      ORDER BY price_c, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw
          FROM rows_),
        tot AS (
          SELECT p_brand, count(*) AS n_lines, CAST(sum(w) AS BIGINT) AS tw
          FROM c GROUP BY p_brand)
        SELECT c.p_brand, max(t.n_lines) AS n_lines, max(t.tw) AS total_weight,
               min(CASE WHEN 4 * c.cumw >= t.tw THEN c.price_c END) AS wp25_cents,
               min(CASE WHEN 2 * c.cumw >= t.tw THEN c.price_c END) AS wmedian_cents,
               min(CASE WHEN 4 * c.cumw >= 3 * t.tw THEN c.price_c END) AS wp75_cents
        FROM c JOIN tot t ON c.p_brand = t.p_brand
        GROUP BY c.p_brand
        ORDER BY c.p_brand""")),

    // -------------------------------------------------------------------
    // Bivariate Mahalanobis outliers per nation: each customer's
    // (account balance, order count) against the nation's 2×2
    // covariance — the multivariate screen that catches "balance
    // normal, order count normal, COMBINATION impossible" where q29's
    // univariate z-scores see nothing. Fully exact: with n-scaled
    // deviations dx = n·x − Σx and centered moments cxx = n·Σx² − (Σx)²
    // etc., the quadratic form Q = cyy·dx² − 2·cxy·dx·dy + cxx·dy²
    // satisfies d² = Q/det exactly, so d²·1e6 is one integer floor
    // division of DECIMAL(38,0)/HUGEINT products (balances in whole
    // units keep Q·1e6 under 38 digits at 10× fixture). Top-3 per
    // nation by the EXACT Q (det is constant within a nation), custkey
    // tie-break. Scale: one left join for order counts, one
    // nation-grain moment agg broadcast back, one top-k window.
    QueryDef("q152_mahalanobis_outliers",
      (s, d) => {
        val oc = Tables.orders(s, d).groupBy("o_custkey").agg(count(ONE).as("n_orders"))
        val base = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"),
            expr("CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) div 100").as("x"))
          .join(oc, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_nationkey"), col("x"),
            coalesce(col("n_orders"), lit(0L)).as("y"))
        val g = base.groupBy("c_nationkey")
          .agg(count(ONE).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
            sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
          .select(col("c_nationkey").as("nk"), col("n"), col("sx"), col("sy"),
            expr("CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx").as("cxx"),
            expr("CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy").as("cyy"),
            expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy").as("cxy"))
          .withColumn("det", expr("cxx * cyy - cxy * cxy"))
          .filter(col("det") > 0)
        val scored = base.join(broadcast(g), col("c_nationkey") === col("nk"))
          .select(col("c_nationkey"), col("c_custkey"), col("x"), col("y"),
            expr("CAST(n AS DECIMAL(38,0)) * x - sx").as("dx"),
            expr("CAST(n AS DECIMAL(38,0)) * y - sy").as("dy"),
            col("cxx"), col("cyy"), col("cxy"), col("det"))
          .select(col("c_nationkey"), col("c_custkey"), col("x"), col("y"),
            expr("CAST(cyy * dx * dx - 2 * cxy * dx * dy + cxx * dy * dy AS DECIMAL(38,0))")
              .as("q"),
            col("det"))
        scored
          .withColumn("rank", row_number().over(
            Window.partitionBy("c_nationkey").orderBy(col("q").desc, col("c_custkey"))).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("c_nationkey"), col("rank"), col("c_custkey"),
            col("x").as("acctbal_units"), col("y").as("n_orders"),
            expr("CAST(q * 1000000 div det AS BIGINT)").as("d2_micro"))
          .orderBy("c_nationkey", "rank")
      },
      Some("""
        WITH oc AS (
          SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey),
        base AS (
          SELECT c.c_custkey, c.c_nationkey,
                 CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) // 100 AS x,
                 CAST(coalesce(oc.n_orders, 0) AS BIGINT) AS y
          FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey),
        g AS (
          SELECT c_nationkey AS nk, count(*) AS n,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
          FROM base GROUP BY c_nationkey),
        cc AS (
          SELECT nk, n, sx, sy,
                 CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS cxx,
                 CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS cyy,
                 CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS cxy
          FROM g),
        cd AS (
          SELECT *, cxx * cyy - cxy * cxy AS det FROM cc WHERE cxx * cyy - cxy * cxy > 0),
        scored AS (
          SELECT b.c_nationkey, b.c_custkey, b.x, b.y,
                 cd.cyy * (CAST(cd.n AS HUGEINT) * b.x - cd.sx) * (CAST(cd.n AS HUGEINT) * b.x - cd.sx)
                 - 2 * cd.cxy * (CAST(cd.n AS HUGEINT) * b.x - cd.sx) * (CAST(cd.n AS HUGEINT) * b.y - cd.sy)
                 + cd.cxx * (CAST(cd.n AS HUGEINT) * b.y - cd.sy) * (CAST(cd.n AS HUGEINT) * b.y - cd.sy)
                   AS q,
                 cd.det
          FROM base b JOIN cd ON b.c_nationkey = cd.nk),
        ranked AS (
          SELECT *, CAST(row_number() OVER (PARTITION BY c_nationkey
                       ORDER BY q DESC, c_custkey) AS BIGINT) AS rank
          FROM scored)
        SELECT c_nationkey, rank, c_custkey, x AS acctbal_units, y AS n_orders,
               CAST(q * 1000000 // det AS BIGINT) AS d2_micro
        FROM ranked
        WHERE rank <= 3
        ORDER BY c_nationkey, rank""")),

    // -------------------------------------------------------------------
    // Empirical-Bayes shrinkage of per-user conversion rates: raw
    // x/n rates on a handful of events are noise — shrink toward the
    // prior with a Beta(10,10) pseudo-count, the standard "don't rank
    // a 1/1 user above a 90/100 user" fix (and the same math behind
    // rating sites' weighted scores). Both rates are exact positive
    // integer floor divisions in micro units; the rank comparison
    // column shows how many positions shrinkage moved each user (raw
    // rank and shrunk rank are both total orders with user tie-break).
    // Scale: one user-grain agg + two 1500-row rank windows.
    QueryDef("q153_eb_shrinkage",
      (s, d) => {
        val per = Tables.events(s, d)
          .groupBy("user_id")
          .agg(count(ONE).as("n_events"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_conv"))
          .select(col("user_id"), col("n_events"), col("n_conv"),
            expr("n_conv * 1000000 div n_events").as("raw_micro"),
            expr("(n_conv + 10) * 1000000 div (n_events + 20)").as("shrunk_micro"))
        // both ranks span the full USER dimension — Prefix.orderStats
        // two-pass ranks (range-partitioned), no single-task sort
        val rr = Prefix.orderStats(per,
          Seq(col("raw_micro").desc, col("user_id")), rn = Some("raw_rank"))
        Prefix.orderStats(rr,
            Seq(col("shrunk_micro").desc, col("user_id")), rn = Some("shrunk_rank"))
          .withColumn("rank_moved", col("raw_rank") - col("shrunk_rank"))
          .orderBy("user_id")
      },
      Some("""
        WITH per AS (
          SELECT user_id, count(*) AS n_events,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_conv
          FROM events GROUP BY user_id),
        r AS (
          SELECT user_id, n_events, n_conv,
                 CAST(n_conv * 1000000 // n_events AS BIGINT) AS raw_micro,
                 CAST((n_conv + 10) * 1000000 // (n_events + 20) AS BIGINT) AS shrunk_micro
          FROM per)
        SELECT user_id, n_events, n_conv, raw_micro, shrunk_micro,
               CAST(row_number() OVER (ORDER BY raw_micro DESC, user_id) AS BIGINT) AS raw_rank,
               CAST(row_number() OVER (ORDER BY shrunk_micro DESC, user_id) AS BIGINT) AS shrunk_rank,
               CAST(row_number() OVER (ORDER BY raw_micro DESC, user_id) AS BIGINT)
               - CAST(row_number() OVER (ORDER BY shrunk_micro DESC, user_id) AS BIGINT) AS rank_moved
        FROM r
        ORDER BY user_id""")),

    // -------------------------------------------------------------------
    // Difference-in-differences on the q46/q150 A/B split: event-level
    // mean value per (arm, pre/post-day-15 period), and the DiD
    // estimator (post−pre treatment change minus post−pre control
    // change) — the causal read when assignment isn't random over time
    // and a parallel-trends baseline is the best available control.
    // Each cell mean is an exact positive micro floor division; the
    // estimator is plain integer subtraction of the four cell means,
    // so both engines agree to the last micro. Output: the four cells
    // with their stats plus the constant did_micro column. Scale: one
    // projection + one 4-group agg + a broadcast of the 4-row pivot.
    QueryDef("q154_diff_in_diff",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        val m = ev.agg(min(col("us")).as("us0"))
        val cells = ev.crossJoin(broadcast(m))
          .select(
            pmod(expr(graft.operators.Ns.hash60("CAST(user_id AS STRING)")), lit(2L)).as("variant"),
            (col("us") >= col("us0") + 1296000000000L).as("post"), col("cents"))
          .groupBy("variant", "post")
          .agg(count(ONE).as("n_events"), sum(col("cents")).as("sum_cents"))
          .withColumn("mean_micro", expr("sum_cents * 1000000 div n_events"))
        val did = cells.agg(
          (sum(when(col("variant") === 1 && col("post"), col("mean_micro")).otherwise(0L))
            - sum(when(col("variant") === 1 && !col("post"), col("mean_micro")).otherwise(0L))
            - sum(when(col("variant") === 0 && col("post"), col("mean_micro")).otherwise(0L))
            + sum(when(col("variant") === 0 && !col("post"), col("mean_micro")).otherwise(0L)))
            .as("did_micro"))
        cells.crossJoin(broadcast(did))
          .select(col("variant"), col("post"), col("n_events"), col("sum_cents"),
            col("mean_micro"), col("did_micro"))
          .orderBy("variant", "post")
      },
      Some(s"""
        WITH ev AS (
          SELECT user_id, epoch_us(ts) AS us,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM events),
        m AS (SELECT min(us) AS us0 FROM ev),
        cells AS (
          SELECT ${graft.operators.Ns.oHash60("CAST(user_id AS VARCHAR)")} % 2 AS variant,
                 us >= us0 + 1296000000000 AS post,
                 count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents
          FROM ev CROSS JOIN m
          GROUP BY 1, 2),
        mm AS (
          SELECT variant, post, n_events, sum_cents,
                 CAST(sum_cents * 1000000 // n_events AS BIGINT) AS mean_micro
          FROM cells),
        did AS (
          SELECT CAST(sum(CASE WHEN variant = 1 AND post THEN mean_micro ELSE 0 END)
                 - sum(CASE WHEN variant = 1 AND NOT post THEN mean_micro ELSE 0 END)
                 - sum(CASE WHEN variant = 0 AND post THEN mean_micro ELSE 0 END)
                 + sum(CASE WHEN variant = 0 AND NOT post THEN mean_micro ELSE 0 END)
                 AS BIGINT) AS did_micro
          FROM mm)
        SELECT variant, post, n_events, sum_cents, mean_micro, did_micro
        FROM mm CROSS JOIN did
        ORDER BY variant, post""")),

    // -------------------------------------------------------------------
    // ABC-XYZ inventory matrix: parts classified by revenue
    // concentration (A = first 80% of cumulative revenue, B = to 95%,
    // C = tail — q113's discipline, thresholds as 5·cum<4·tot /
    // 20·cum<19·tot integer cross-multiplications on the PRECEDING
    // cumulative so the crossing part is included) × demand
    // variability (X/Y/Z by the squared coefficient of variation of
    // monthly quantities over the FULL month grid — missing months are
    // implicit zeros because n is the global month count, not the
    // part's present-month count; cv² = (n·Σq²−S²)·1e6 div S² exact).
    // The 9-cell matrix is what drives stocking policy (steady A-X on
    // auto-replenish; erratic C-Z on kill lists). Scale: one
    // month-grain agg, one part-grain rollup, one rank window over
    // parts, one 9-row matrix agg.
    QueryDef("q155_abc_xyz",
      (s, d) => {
        // orders is a fact table — no broadcast hint; the orderkey
        // equi-join shuffles both sides on their natural key (AQE may
        // still broadcast at small SF)
        val li = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey"),
            expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("rev_c"),
            expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").as("q_c"),
            date_format(expr("CAST(o_orderdate AS DATE)"), "yyyy-MM").as("mon"))
        val nMonths = li.agg(countDistinct(col("mon")).as("nm"))
        val pm = li.groupBy("l_partkey", "mon").agg(sum(col("q_c")).as("mq"))
        val xyz = pm.groupBy("l_partkey")
          .agg(sum(col("mq")).as("sq"),
            sum(expr("CAST(mq AS DECIMAL(38,0)) * mq")).as("sqq"))
          .crossJoin(broadcast(nMonths))
          .select(col("l_partkey").as("pk_x"),
            expr("""CAST((CAST(nm AS DECIMAL(38,0)) * sqq - CAST(sq AS DECIMAL(38,0)) * sq)
                    * 1000000 div (CAST(sq AS DECIMAL(38,0)) * sq) AS BIGINT)""").as("cv2_micro"))
          .select(col("pk_x"),
            when(col("cv2_micro") < 250000L, "X")
              .when(col("cv2_micro") < 1000000L, "Y").otherwise("Z").as("xyz_class"))
        val rev = li.groupBy("l_partkey").agg(sum(col("rev_c")).as("prc"))
        // exclusive cumulative revenue over the PART dimension — a
        // Prefix.orderStats two-pass prefix sum (exact longs), replacing
        // the single-task global window; the grand total rides along as
        // an ungrouped groupSums column (no scalar agg re-running the
        // lineitem join, no cross joins)
        val abc = Prefix.orderStats(rev, Seq(col("prc").desc, col("l_partkey")),
            cumSumsExclusive = Seq(("prc", "cum_before")),
            groupSums = Seq(("prc", "trc")))
          .select(col("l_partkey").as("pk_a"), col("prc"), col("trc"),
            when(expr("5 * cum_before < 4 * trc"), "A")
              .when(expr("20 * cum_before < 19 * trc"), "B").otherwise("C").as("abc_class"))
        abc.join(xyz, col("pk_a") === col("pk_x"))
          .groupBy("abc_class", "xyz_class")
          .agg(count(ONE).as("n_parts"), sum(col("prc")).as("revenue_cents"),
            expr("sum(prc) * 1000000 div max(trc)").as("revenue_share_micro"))
          .orderBy("abc_class", "xyz_class")
      },
      Some("""
        WITH li AS (
          SELECT l.l_partkey,
                 CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS rev_c,
                 CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS q_c,
                 strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS mon
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        nmv AS (SELECT count(DISTINCT mon) AS nm FROM li),
        pm AS (
          SELECT l_partkey, mon, CAST(sum(q_c) AS BIGINT) AS mq
          FROM li GROUP BY l_partkey, mon),
        xyz AS (
          SELECT l_partkey AS pk_x,
                 CASE WHEN (CAST(nm AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq) * 1000000
                           // (CAST(sq AS HUGEINT) * sq) < 250000 THEN 'X'
                      WHEN (CAST(nm AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq) * 1000000
                           // (CAST(sq AS HUGEINT) * sq) < 1000000 THEN 'Y'
                      ELSE 'Z' END AS xyz_class
          FROM (
            SELECT l_partkey, CAST(sum(mq) AS BIGINT) AS sq,
                   CAST(sum(CAST(mq AS HUGEINT) * mq) AS HUGEINT) AS sqq
            FROM pm GROUP BY l_partkey) CROSS JOIN nmv),
        rev AS (
          SELECT l_partkey, CAST(sum(rev_c) AS BIGINT) AS prc
          FROM li GROUP BY l_partkey),
        tot AS (SELECT CAST(sum(prc) AS BIGINT) AS trc FROM rev),
        abc AS (
          SELECT l_partkey AS pk_a, prc,
                 CASE WHEN 5 * cum_before < 4 * trc THEN 'A'
                      WHEN 20 * cum_before < 19 * trc THEN 'B'
                      ELSE 'C' END AS abc_class
          FROM (
            SELECT l_partkey, prc,
                   CAST(coalesce(sum(prc) OVER (ORDER BY prc DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                     AS cum_before
            FROM rev) CROSS JOIN tot)
        SELECT a.abc_class, x.xyz_class, count(*) AS n_parts,
               CAST(sum(a.prc) AS BIGINT) AS revenue_cents,
               CAST(sum(a.prc) * 1000000 // max(t.trc) AS BIGINT) AS revenue_share_micro
        FROM abc a JOIN xyz x ON a.pk_a = x.pk_x
        CROSS JOIN tot t
        GROUP BY a.abc_class, x.xyz_class
        ORDER BY a.abc_class, x.xyz_class""")),

    // -------------------------------------------------------------------
    // Western Electric control-chart rules per event_type: the first 15
    // days freeze the baseline (n, Σv, Σv² in exact milli-integers);
    // every later event is tested against the FOUR classic rules —
    // R1: one point beyond 3σ; R2: ≥2 of the last 3 beyond 2σ on the
    // same side; R3: ≥4 of the last 5 beyond 1σ on the same side;
    // R4: 8 in a row on the same side. Every zone test is the st22
    // cross-multiplied inequality dev² > k²·(n·Σv²−(Σv)²) with
    // dev = v·n − Σv (exact DECIMAL(38,0)/HUGEINT, no σ, no sqrt), and
    // the run counts are ROWS-frame window sums — so the whole rule
    // engine is integer-exact in both engines. Scale: one baseline
    // agg broadcast to the monitored stream + one per-type ordered
    // window pass (the q94 shape).
    QueryDef("q156_control_chart",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"),
            expr("CAST(round(value * 1000, 0) AS BIGINT)").as("vm"))
        val m = ev.agg(min(col("us")).as("us0"))
        val tagged = ev.crossJoin(broadcast(m))
          .withColumn("post", col("us") >= col("us0") + 1296000000000L)
        val base = tagged.filter(!col("post"))
          .groupBy(col("event_type").as("bt"))
          .agg(count(ONE).as("n"), sum(col("vm")).as("sv"),
            sum(expr("CAST(vm AS DECIMAL(38,0)) * vm")).as("svv"))
          .withColumn("vvar", expr("CAST(n AS DECIMAL(38,0)) * svv - CAST(sv AS DECIMAL(38,0)) * sv"))
        val zoned = tagged.filter(col("post"))
          .join(broadcast(base), col("event_type") === col("bt"))
          .select(col("event_type"), col("event_id"), col("us"),
            expr("CAST(vm AS DECIMAL(38,0)) * n - sv").as("dev"), col("vvar"))
          .select(col("event_type"), col("event_id"), col("us"),
            (col("dev") > 0).as("up"),
            expr("CAST(CASE WHEN dev * dev > 9 * vvar THEN 1 ELSE 0 END AS BIGINT)").as("b3"),
            expr("CAST(CASE WHEN dev * dev > 4 * vvar AND dev > 0 THEN 1 ELSE 0 END AS BIGINT)").as("b2u"),
            expr("CAST(CASE WHEN dev * dev > 4 * vvar AND dev < 0 THEN 1 ELSE 0 END AS BIGINT)").as("b2d"),
            expr("CAST(CASE WHEN dev * dev > 1 * vvar AND dev > 0 THEN 1 ELSE 0 END AS BIGINT)").as("b1u"),
            expr("CAST(CASE WHEN dev * dev > 1 * vvar AND dev < 0 THEN 1 ELSE 0 END AS BIGINT)").as("b1d"),
            expr("CAST(CASE WHEN dev > 0 THEN 1 ELSE 0 END AS BIGINT)").as("su"),
            expr("CAST(CASE WHEN dev < 0 THEN 1 ELSE 0 END AS BIGINT)").as("sd"))
        // ~6 metric streams × event-sized groups: the rolling
        // Western-Electric lookbacks (<= 8 rows) keep the per-stream
        // window spelling here — a ROLLING frame has no two-pass
        // prefix-sum form, and the honest at-scale spelling of a
        // per-stream control chart is the STREAMING engine (st22's
        // z-score guardrail runs the same math with O(1) state per key);
        // this batch card is the backfill/audit arm.
        def fr(k: Int) = Window.partitionBy("event_type")
          .orderBy(col("us"), col("event_id")).rowsBetween(-(k - 1), 0)
        val w0 = Window.partitionBy("event_type").orderBy(col("us"), col("event_id"))
        val flagged = zoned
          .withColumn("seq", row_number().over(w0).cast("long"))
          .withColumn("r1", col("b3") === 1L)
          .withColumn("r2", sum(col("b2u")).over(fr(3)) >= 2 || sum(col("b2d")).over(fr(3)) >= 2)
          .withColumn("r3", sum(col("b1u")).over(fr(5)) >= 4 || sum(col("b1d")).over(fr(5)) >= 4)
          .withColumn("r4", sum(col("su")).over(fr(8)) === 8 || sum(col("sd")).over(fr(8)) === 8)
        flagged.groupBy("event_type")
          .agg(count(ONE).as("n_monitored"),
            sum(when(col("r1"), 1L).otherwise(0L)).as("r1_hits"),
            sum(when(col("r2"), 1L).otherwise(0L)).as("r2_hits"),
            sum(when(col("r3"), 1L).otherwise(0L)).as("r3_hits"),
            sum(when(col("r4"), 1L).otherwise(0L)).as("r4_hits"),
            min(when(col("r1") || col("r2") || col("r3") || col("r4"), col("seq")))
              .as("first_violation_seq"))
          .orderBy("event_type")
      },
      Some("""
        WITH ev AS (
          SELECT event_type, event_id, epoch_us(ts) AS us,
                 CAST(round(value * 1000, 0) AS BIGINT) AS vm
          FROM events),
        m AS (SELECT min(us) AS us0 FROM ev),
        base AS (
          SELECT event_type AS bt, count(*) AS n, CAST(sum(vm) AS BIGINT) AS sv,
                 CAST(sum(CAST(vm AS HUGEINT) * vm) AS HUGEINT) AS svv
          FROM ev CROSS JOIN m WHERE us < us0 + 1296000000000
          GROUP BY event_type),
        zoned AS (
          SELECT e.event_type, e.event_id, e.us,
                 CAST(e.vm AS HUGEINT) * b.n - b.sv AS dev,
                 CAST(b.n AS HUGEINT) * b.svv - CAST(b.sv AS HUGEINT) * b.sv AS vvar
          FROM ev e CROSS JOIN m JOIN base b ON e.event_type = b.bt
          WHERE e.us >= m.us0 + 1296000000000),
        zz AS (
          SELECT event_type, event_id, us,
                 CASE WHEN dev * dev > 9 * vvar THEN 1 ELSE 0 END AS b3,
                 CASE WHEN dev * dev > 4 * vvar AND dev > 0 THEN 1 ELSE 0 END AS b2u,
                 CASE WHEN dev * dev > 4 * vvar AND dev < 0 THEN 1 ELSE 0 END AS b2d,
                 CASE WHEN dev * dev > 1 * vvar AND dev > 0 THEN 1 ELSE 0 END AS b1u,
                 CASE WHEN dev * dev > 1 * vvar AND dev < 0 THEN 1 ELSE 0 END AS b1d,
                 CASE WHEN dev > 0 THEN 1 ELSE 0 END AS su,
                 CASE WHEN dev < 0 THEN 1 ELSE 0 END AS sd
          FROM zoned),
        flagged AS (
          SELECT event_type,
                 CAST(row_number() OVER o AS BIGINT) AS seq,
                 b3 = 1 AS r1,
                 sum(b2u) OVER f3 >= 2 OR sum(b2d) OVER f3 >= 2 AS r2,
                 sum(b1u) OVER f5 >= 4 OR sum(b1d) OVER f5 >= 4 AS r3,
                 sum(su) OVER f8 = 8 OR sum(sd) OVER f8 = 8 AS r4
          FROM zz
          WINDOW o AS (PARTITION BY event_type ORDER BY us, event_id),
                 f3 AS (PARTITION BY event_type ORDER BY us, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 f5 AS (PARTITION BY event_type ORDER BY us, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                 f8 AS (PARTITION BY event_type ORDER BY us, event_id
                        ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        SELECT event_type, count(*) AS n_monitored,
               CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS r1_hits,
               CAST(sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS r2_hits,
               CAST(sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) AS r3_hits,
               CAST(sum(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT) AS r4_hits,
               min(CASE WHEN r1 OR r2 OR r3 OR r4 THEN seq END) AS first_violation_seq
        FROM flagged
        GROUP BY event_type
        ORDER BY event_type""")),

    // -------------------------------------------------------------------
    // Hierarchical forecast reconciliation: a naive last-4-month-mean
    // revenue forecast made independently per NATION (bottom-up) vs per
    // REGION then allocated down by trailing-12-month revenue shares
    // (top-down) — the coherence check every planning hierarchy runs,
    // because independently-made forecasts never add up. All integer
    // cents: means are positive floor divisions, the top-down split is
    // region_fc·share numerator-first (td = fc·nation12 div region12),
    // and the bottom-up/top-down gap is plain subtraction. Month
    // recency via dense_rank over the global month list. Scale: one
    // orders→customer key join + broadcast nation/region dims, then
    // month-grain and group-grain aggs.
    QueryDef("q158_forecast_reconcile",
      (s, d) => {
        val nat = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_regionkey"))
        val om = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_nationkey").as("nk"), col("n_regionkey").as("rk"),
            date_format(expr("CAST(o_orderdate AS DATE)"), "yyyy-MM").as("mon"),
            expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
        val months = om.select("mon").distinct()
          // bounded: one row per MONTH (dense_rank over the month grid)
          .withColumn("mrank", dense_rank().over(Window.orderBy(col("mon").desc)))
        val tagged = om.join(broadcast(months), "mon")
        val nation4 = tagged.filter(col("mrank") <= 4)
          .groupBy("nk", "rk").agg(expr("sum(cents) div 4").as("own_fc_cents"))
        val nation12 = tagged.filter(col("mrank") <= 12)
          .groupBy(col("nk").as("nk12")).agg(sum(col("cents")).as("n12"))
        val region4 = tagged.filter(col("mrank") <= 4)
          .groupBy(col("rk").as("rk4")).agg(expr("sum(cents) div 4").as("region_fc_cents"))
        val region12 = tagged.filter(col("mrank") <= 12)
          .groupBy(col("rk").as("rk12")).agg(sum(col("cents")).as("r12"))
        nation4
          .join(nation12, col("nk") === col("nk12"))
          .join(broadcast(region4), col("rk") === col("rk4"))
          .join(broadcast(region12), col("rk") === col("rk12"))
          .select(col("nk").as("n_nationkey"), col("rk").as("n_regionkey"),
            col("own_fc_cents"), col("region_fc_cents"),
            expr("""CAST(CAST(region_fc_cents AS DECIMAL(38,0)) * n12 div r12 AS BIGINT)""")
              .as("td_fc_cents"))
          .select(col("n_nationkey"), col("n_regionkey"), col("own_fc_cents"),
            col("region_fc_cents"), col("td_fc_cents"),
            (col("own_fc_cents") - col("td_fc_cents")).as("gap_cents"))
          .orderBy("n_nationkey")
      },
      Some("""
        WITH om AS (
          SELECT n.n_nationkey AS nk, n.n_regionkey AS rk,
                 strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS mon,
                 CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey),
        months AS (
          SELECT mon, dense_rank() OVER (ORDER BY mon DESC) AS mrank
          FROM (SELECT DISTINCT mon FROM om)),
        tagged AS (SELECT om.*, m.mrank FROM om JOIN months m USING (mon)),
        n4 AS (SELECT nk, rk, CAST(sum(cents) // 4 AS BIGINT) AS own_fc_cents
               FROM tagged WHERE mrank <= 4 GROUP BY nk, rk),
        n12 AS (SELECT nk AS nk12, CAST(sum(cents) AS BIGINT) AS n12
                FROM tagged WHERE mrank <= 12 GROUP BY nk),
        r4 AS (SELECT rk AS rk4, CAST(sum(cents) // 4 AS BIGINT) AS region_fc_cents
               FROM tagged WHERE mrank <= 4 GROUP BY rk),
        r12 AS (SELECT rk AS rk12, CAST(sum(cents) AS BIGINT) AS r12
                FROM tagged WHERE mrank <= 12 GROUP BY rk)
        SELECT n4.nk AS n_nationkey, n4.rk AS n_regionkey, n4.own_fc_cents,
               r4.region_fc_cents,
               CAST(CAST(r4.region_fc_cents AS HUGEINT) * n12.n12 // r12.r12 AS BIGINT)
                 AS td_fc_cents,
               n4.own_fc_cents
               - CAST(CAST(r4.region_fc_cents AS HUGEINT) * n12.n12 // r12.r12 AS BIGINT)
                 AS gap_cents
        FROM n4
        JOIN n12 ON n4.nk = n12.nk12
        JOIN r4 ON n4.rk = r4.rk4
        JOIN r12 ON n4.rk = r12.rk12
        ORDER BY n_nationkey""")),

    // -------------------------------------------------------------------
    // Little's law audit of the view→purchase funnel treated as a
    // queue: per hour, arrivals (views), completions (purchases), the
    // running depth Σ(a−c), and the one-row card L = avg depth,
    // λ = arrival rate, W = L/λ (the law says W is the average
    // time-in-system WITHOUT tracking any individual — the point of
    // the theorem). Depth can be negative in this synthetic funnel
    // (purchases aren't matched to views), so every mean/ratio is the
    // q105 positivity-shifted floor division. L and λ average over
    // OBSERVED hours (stated in the column names; W = L/λ =
    // depth_sum/arrivals is observation-count-free either way).
    // Scale: one hour-grain agg + one windowed cumsum.
    QueryDef("q159_littles_law",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(unix_micros(col("ts")).as("us"), col("event_type"))
        val m = ev.agg(min(col("us")).as("us0"))
        val hourly = ev.crossJoin(broadcast(m))
          .select(expr("(us - us0) div 3600000000").as("b"),
            when(col("event_type") === "view", 1L).otherwise(0L).as("a"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("c"))
          .groupBy("b").agg(sum(col("a")).as("arr"), sum(col("c")).as("comp"))
        val wc = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val depth = hourly
          .withColumn("depth", sum(col("arr") - col("comp")).over(wc))
        depth
          .agg(count(ONE).as("n_obs_hours"),
            sum(col("arr")).as("total_arrivals"),
            sum(col("comp")).as("total_completions"),
            expr("max_by(depth, b)").as("end_depth"),
            sum(col("depth")).as("depth_sum"))
          .select(col("n_obs_hours"), col("total_arrivals"), col("total_completions"),
            col("end_depth"),
            expr("(depth_sum * 1000 + 1000000000 * n_obs_hours) div n_obs_hours - 1000000000")
              .as("l_avg_milli"),
            expr("total_arrivals * 1000 div n_obs_hours").as("lambda_milli"),
            expr("(depth_sum * 1000 + 1000000000 * total_arrivals) div total_arrivals - 1000000000")
              .as("w_hours_milli"))
      },
      Some("""
        WITH ev AS (SELECT epoch_us(ts) AS us, event_type FROM events),
        m AS (SELECT min(us) AS us0 FROM ev),
        hourly AS (
          SELECT (us - us0) // 3600000000 AS b,
                 CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS arr,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS comp
          FROM ev CROSS JOIN m GROUP BY 1),
        dpt AS (
          SELECT b, arr, comp,
                 CAST(sum(arr - comp) OVER (ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS depth
          FROM hourly),
        agg AS (
          SELECT count(*) AS n_obs_hours,
                 CAST(sum(arr) AS BIGINT) AS total_arrivals,
                 CAST(sum(comp) AS BIGINT) AS total_completions,
                 CAST(max_by(depth, b) AS BIGINT) AS end_depth,
                 CAST(sum(depth) AS BIGINT) AS depth_sum
          FROM dpt)
        SELECT n_obs_hours, total_arrivals, total_completions, end_depth,
               CAST((depth_sum * 1000 + 1000000000 * n_obs_hours) // n_obs_hours
                    - 1000000000 AS BIGINT) AS l_avg_milli,
               CAST(total_arrivals * 1000 // n_obs_hours AS BIGINT) AS lambda_milli,
               CAST((depth_sum * 1000 + 1000000000 * total_arrivals) // total_arrivals
                    - 1000000000 AS BIGINT) AS w_hours_milli
        FROM agg""")),

    // -------------------------------------------------------------------
    // Sequential-pattern support (PrefixSpan's first two levels, exact):
    // for every ordered event-type pair A>B and triple A>B>C, the
    // number of USERS whose history contains the pattern as a
    // SUBSEQUENCE (gaps allowed — the support notion q114's adjacent
    // transition matrix cannot express). Pair support needs only each
    // user's per-type (min, max) times: A>B ⇔ min(A) < max(B) (and for
    // A>A the strict inequality forces two occurrences). Triple
    // support adds one middle witness: a B event strictly inside
    // (min(A), max(C)) — found by one bounded events×(A,C) join, never
    // a per-user sequence scan. Supports are exact micro shares.
    // Scale: one (user,type) agg (25 rows per user max), one 5×5
    // broadcast pair join, one 25-way bounded middle join.
    QueryDef("q160_seq_patterns",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
        val utp = ev.groupBy("user_id", "event_type")
          .agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
          .localCheckpoint() // three join arms below read this
        val nUsers = ev.select("user_id").distinct().count()
        val a = utp.select(col("user_id"), col("event_type").as("ta"), col("mn"))
        val b = utp.select(col("user_id").as("ub"), col("event_type").as("tb"), col("mx"))
        val pairs = a.join(b, col("user_id") === col("ub") && col("mn") < col("mx"))
          .groupBy("ta", "tb").agg(countDistinct(col("user_id")).as("support_users"))
          .select(concat(col("ta"), lit(">"), col("tb")).as("pattern"),
            lit(2).as("n_steps"), col("support_users"))
        val c = utp.select(col("user_id").as("uc"), col("event_type").as("tc"),
          col("mx").as("mxc"))
        val triples = a
          .join(c, col("user_id") === col("uc"))
          .join(ev.select(col("user_id").as("um"), col("event_type").as("tb"),
              col("us").as("usm")),
            col("user_id") === col("um") && col("usm") > col("mn") && col("usm") < col("mxc"))
          .groupBy("ta", "tb", "tc").agg(countDistinct(col("user_id")).as("support_users"))
          .select(concat(col("ta"), lit(">"), col("tb"), lit(">"), col("tc")).as("pattern"),
            lit(3).as("n_steps"), col("support_users"))
        pairs.unionByName(triples)
          .select(col("pattern"), col("n_steps"), col("support_users"),
            expr(s"support_users * 1000000 div ${nUsers}L").as("support_micro"))
          .orderBy("n_steps", "pattern")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        utp AS (
          SELECT user_id, event_type, min(us) AS mn, max(us) AS mx
          FROM ev GROUP BY user_id, event_type),
        nu AS (SELECT count(DISTINCT user_id) AS n_users FROM ev),
        pairs AS (
          SELECT a.event_type || '>' || b.event_type AS pattern, 2 AS n_steps,
                 count(DISTINCT a.user_id) AS support_users
          FROM utp a JOIN utp b ON a.user_id = b.user_id AND a.mn < b.mx
          GROUP BY 1),
        triples AS (
          SELECT a.event_type || '>' || m.event_type || '>' || c.event_type AS pattern,
                 3 AS n_steps, count(DISTINCT a.user_id) AS support_users
          FROM utp a
          JOIN utp c ON a.user_id = c.user_id
          JOIN ev m ON m.user_id = a.user_id AND m.us > a.mn AND m.us < c.mx
          GROUP BY 1)
        SELECT pattern, n_steps, CAST(support_users AS BIGINT) AS support_users,
               CAST(support_users * 1000000 // n_users AS BIGINT) AS support_micro
        FROM (SELECT * FROM pairs UNION ALL SELECT * FROM triples) CROSS JOIN nu
        ORDER BY n_steps, pattern""")),

    // -------------------------------------------------------------------
    // Referential-integrity conformance matrix: every FK edge of the
    // schema (lineitem→orders, lineitem→part, orders→customer,
    // customer→nation, supplier→nation, nation→region) with child
    // count, orphan count (left-anti join on the parent key set) and
    // conformance share — the one-page foreign-key health card a
    // warehouse publishes before anyone trusts a join. Orphan checks
    // are DISTINCT-key anti-joins (parent key sets are the small
    // side), so the cost is keys, not fact rows, and conformance is an
    // exact micro floor division. Scale: six independent key-set
    // anti-joins unioned into a 6-row report.
    QueryDef("q161_fk_conformance",
      (s, d) => {
        def edge(name: String, child: DataFrame, key: String,
            parent: DataFrame, pkey: String): DataFrame = {
          val orphans = child.select(col(key).as("k")).filter(col("k").isNotNull)
            .join(parent.select(col(pkey).as("pk")).distinct(),
              col("k") === col("pk"), "left_anti")
            .agg(count(ONE).as("orphan_rows"))
          child.agg(count(ONE).as("child_rows"),
            sum(when(col(key).isNull, 1L).otherwise(0L)).as("null_keys"))
            .crossJoin(orphans)
            .select(lit(name).as("fk_edge"), col("child_rows"), col("null_keys"),
              col("orphan_rows"),
              expr("(child_rows - null_keys - orphan_rows) * 1000000 div child_rows")
                .as("conform_micro"))
        }
        val li = Tables.lineitem(s, d); val o = Tables.orders(s, d)
        val c = Tables.customer(s, d); val p = Tables.part(s, d)
        val n = Tables.nation(s, d); val r = Tables.region(s, d)
        val su = Tables.supplier(s, d)
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey")
          .unionByName(edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"))
          .unionByName(edge("lineitem->part", li, "l_partkey", p, "p_partkey"))
          .unionByName(edge("nation->region", n, "n_regionkey", r, "r_regionkey"))
          .unionByName(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
          .unionByName(edge("supplier->nation", su, "s_nationkey", n, "n_nationkey"))
          .orderBy("fk_edge")
      },
      Some("""
        WITH e1 AS (
          SELECT 'customer->nation' AS fk_edge, count(*) AS child_rows,
                 CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_keys,
                 CAST((SELECT count(*) FROM customer
                       WHERE c_nationkey IS NOT NULL
                         AND c_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS BIGINT)
                   AS orphan_rows
          FROM customer),
        e2 AS (
          SELECT 'lineitem->orders', count(*),
                 CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST((SELECT count(*) FROM lineitem
                       WHERE l_orderkey IS NOT NULL
                         AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
          FROM lineitem),
        e3 AS (
          SELECT 'lineitem->part', count(*),
                 CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST((SELECT count(*) FROM lineitem
                       WHERE l_partkey IS NOT NULL
                         AND l_partkey NOT IN (SELECT p_partkey FROM part)) AS BIGINT)
          FROM lineitem),
        e4 AS (
          SELECT 'nation->region', count(*),
                 CAST(sum(CASE WHEN n_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST((SELECT count(*) FROM nation
                       WHERE n_regionkey IS NOT NULL
                         AND n_regionkey NOT IN (SELECT r_regionkey FROM region)) AS BIGINT)
          FROM nation),
        e5 AS (
          SELECT 'orders->customer', count(*),
                 CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST((SELECT count(*) FROM orders
                       WHERE o_custkey IS NOT NULL
                         AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
          FROM orders),
        e6 AS (
          SELECT 'supplier->nation', count(*),
                 CAST(sum(CASE WHEN s_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                 CAST((SELECT count(*) FROM supplier
                       WHERE s_nationkey IS NOT NULL
                         AND s_nationkey NOT IN (SELECT n_nationkey FROM nation)) AS BIGINT)
          FROM supplier),
        u AS (
          SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
          UNION ALL SELECT * FROM e4 UNION ALL SELECT * FROM e5 UNION ALL SELECT * FROM e6)
        SELECT fk_edge, CAST(child_rows AS BIGINT) AS child_rows, null_keys, orphan_rows,
               CAST((child_rows - null_keys - orphan_rows) * 1000000 // child_rows AS BIGINT)
                 AS conform_micro
        FROM u
        ORDER BY fk_edge""")),

    // -------------------------------------------------------------------
    // Parquet-encoding advisor over lineitem's columns: per column, the
    // cardinality ratio and run profile (sorted-adjacency runs on the
    // natural file order) that drive the dictionary / RLE / plain
    // choice a columnar writer makes — q136's zone-map audit for the
    // ENCODING decision instead of the skipping decision. Rule:
    // dictionary when distinct/n < 10%, RLE when runs/n < 50%, else
    // plain. Exact integers throughout (ratios micro-floored; run
    // boundaries via one lag window per column on the (orderkey,
    // linenumber) file order). Scale: the stack is a narrow per-column
    // projection — one pass per column over the fact table, each a
    // partial-aggregable count.
    QueryDef("q162_encoding_advisor",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .selectExpr("l_orderkey", "l_linenumber",
            """stack(6,
              'l_orderkey', CAST(l_orderkey AS STRING),
              'l_partkey', CAST(l_partkey AS STRING),
              'l_suppkey', CAST(l_suppkey AS STRING),
              'l_quantity', CAST(CAST(l_quantity AS DECIMAL(12,2)) AS STRING),
              'l_discount', CAST(CAST(l_discount AS DECIMAL(12,2)) AS STRING),
              'l_tax', CAST(CAST(l_tax AS DECIMAL(12,2)) AS STRING)) AS (col_name, v)""")
        // (l_orderkey, l_linenumber) is NOT unique in the fixture — the
        // value itself closes the total order so the run count is
        // deterministic in both engines
        val w = Window.partitionBy("col_name").orderBy("l_orderkey", "l_linenumber", "v")
        val runs = li
          .withColumn("boundary",
            when(lag(col("v"), 1).over(w).isNull
              || lag(col("v"), 1).over(w) =!= col("v"), 1L).otherwise(0L))
          .groupBy("col_name")
          .agg(count(ONE).as("n_rows"),
            countDistinct(col("v")).as("n_distinct"),
            sum(col("boundary")).as("n_runs"))
          .select(col("col_name"), col("n_rows"), col("n_distinct"), col("n_runs"),
            expr("n_distinct * 1000000 div n_rows").as("distinct_micro"),
            expr("n_runs * 1000000 div n_rows").as("runs_micro"))
        runs
          .withColumn("advice",
            when(col("distinct_micro") < 100000L, "dictionary")
              .when(col("runs_micro") < 500000L, "rle")
              .otherwise("plain"))
          .orderBy("col_name")
      },
      Some("""
        WITH base AS (
          SELECT l_orderkey, l_linenumber, u.col_name, u.v
          FROM lineitem, LATERAL (VALUES
            ('l_orderkey', CAST(l_orderkey AS VARCHAR)),
            ('l_partkey', CAST(l_partkey AS VARCHAR)),
            ('l_suppkey', CAST(l_suppkey AS VARCHAR)),
            ('l_quantity', CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR)),
            ('l_discount', CAST(CAST(l_discount AS DECIMAL(12,2)) AS VARCHAR)),
            ('l_tax', CAST(CAST(l_tax AS DECIMAL(12,2)) AS VARCHAR))) AS u(col_name, v)),
        runs AS (
          SELECT col_name,
                 CASE WHEN lag(v) OVER w IS NULL OR lag(v) OVER w <> v THEN 1 ELSE 0 END
                   AS boundary, v
          FROM base
          WINDOW w AS (PARTITION BY col_name ORDER BY l_orderkey, l_linenumber, v)),
        g AS (
          SELECT col_name, count(*) AS n_rows, count(DISTINCT v) AS n_distinct,
                 CAST(sum(boundary) AS BIGINT) AS n_runs
          FROM runs GROUP BY col_name)
        SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
               CAST(n_distinct AS BIGINT) AS n_distinct, n_runs,
               CAST(n_distinct * 1000000 // n_rows AS BIGINT) AS distinct_micro,
               CAST(n_runs * 1000000 // n_rows AS BIGINT) AS runs_micro,
               CASE WHEN n_distinct * 1000000 // n_rows < 100000 THEN 'dictionary'
                    WHEN n_runs * 1000000 // n_rows < 500000 THEN 'rle'
                    ELSE 'plain' END AS advice
        FROM g
        ORDER BY col_name""")),

    // -------------------------------------------------------------------
    // Nearest-event as-of join (pandas merge_asof direction='nearest'):
    // for each error event, the SAME user's nearest click in time —
    // backward OR forward, absolute-distance winner, earlier event on
    // ties. Spelled as the classic interleave: one window pass over
    // the user's merged (click ∪ error) timeline carrying the last
    // click backward (last_value IGNORE NULLS) and the next click
    // forward, then an exact integer distance comparison — never a
    // range join, never a cross product. Scale: one shuffle to the
    // user key, two frame passes over the same sort.
    QueryDef("q163_nearest_event",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("click", "error"))
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val back = w.rowsBetween(Window.unboundedPreceding, -1)
        val fwd = w.rowsBetween(1, Window.unboundedFollowing)
        val marked = ev
          .withColumn("click_id", when(col("event_type") === "click", col("event_id")))
          .withColumn("click_us", when(col("event_type") === "click", col("us")))
          .withColumn("prev_id", last(col("click_id"), ignoreNulls = true).over(back))
          .withColumn("prev_us", last(col("click_us"), ignoreNulls = true).over(back))
          .withColumn("next_id", first(col("click_id"), ignoreNulls = true).over(fwd))
          .withColumn("next_us", first(col("click_us"), ignoreNulls = true).over(fwd))
        marked.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"), col("us"),
            expr("""CASE
                WHEN prev_id IS NULL THEN next_id
                WHEN next_id IS NULL THEN prev_id
                WHEN us - prev_us <= next_us - us THEN prev_id
                ELSE next_id END""").as("nearest_click_id"),
            expr("""CASE
                WHEN prev_id IS NULL THEN next_us - us
                WHEN next_id IS NULL THEN us - prev_us
                WHEN us - prev_us <= next_us - us THEN us - prev_us
                ELSE next_us - us END""").as("gap_us"))
          .orderBy("user_id", "error_id")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type, epoch_us(ts) AS us
          FROM events WHERE event_type IN ('click', 'error')),
        marked AS (
          SELECT user_id, event_id, event_type, us,
                 last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER b AS prev_id,
                 last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
                   OVER b AS prev_us,
                 first_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER f AS next_id,
                 first_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
                   OVER f AS next_us
          FROM ev
          WINDOW b AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 f AS (PARTITION BY user_id ORDER BY us, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
        SELECT user_id, event_id AS error_id, us,
               CASE WHEN prev_id IS NULL THEN next_id
                    WHEN next_id IS NULL THEN prev_id
                    WHEN us - prev_us <= next_us - us THEN prev_id
                    ELSE next_id END AS nearest_click_id,
               CASE WHEN prev_id IS NULL THEN next_us - us
                    WHEN next_id IS NULL THEN us - prev_us
                    WHEN us - prev_us <= next_us - us THEN us - prev_us
                    ELSE next_us - us END AS gap_us
        FROM marked
        WHERE event_type = 'error'
        ORDER BY user_id, error_id""")),

    // -------------------------------------------------------------------
    // Share-of-parent rollup (RATIO_TO_REPORT at every level of the
    // region→nation hierarchy): each nation's revenue as a share of
    // its region AND of the world, plus each region's share of the
    // world — the percent-of-parent tree a drill-down UI renders.
    // Shares are exact micro floor divisions of integer cents; the
    // hierarchy comes from ONE aggregation reused at three grains
    // (window sums over the nation-grain table — never a re-scan of
    // the fact table per level). Scale: one fact-table agg to ~25
    // nation rows; everything above is window arithmetic on that.
    QueryDef("q164_share_of_parent",
      (s, d) => {
        val rev = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey"), col("n_nationkey"))
          .agg(expr("sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))")
            .as("cents"))
        val wr = Window.partitionBy("n_regionkey")
        val ww = Window.partitionBy()
        rev
          .withColumn("region_cents", sum(col("cents")).over(wr))
          .withColumn("world_cents", sum(col("cents")).over(ww))
          .select(col("n_regionkey"), col("n_nationkey"), col("cents").as("nation_cents"),
            col("region_cents"),
            expr("cents * 1000000 div region_cents").as("share_of_region_micro"),
            expr("cents * 1000000 div world_cents").as("share_of_world_micro"),
            expr("region_cents * 1000000 div world_cents").as("region_share_micro"))
          .orderBy("n_regionkey", "n_nationkey")
      },
      Some("""
        WITH rev AS (
          SELECT n.n_regionkey, n.n_nationkey,
                 CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY n.n_regionkey, n.n_nationkey),
        w AS (
          SELECT *,
                 CAST(sum(cents) OVER (PARTITION BY n_regionkey) AS BIGINT) AS region_cents,
                 CAST(sum(cents) OVER () AS BIGINT) AS world_cents
          FROM rev)
        SELECT n_regionkey, n_nationkey, cents AS nation_cents, region_cents,
               CAST(cents * 1000000 // region_cents AS BIGINT) AS share_of_region_micro,
               CAST(cents * 1000000 // world_cents AS BIGINT) AS share_of_world_micro,
               CAST(region_cents * 1000000 // world_cents AS BIGINT) AS region_share_micro
        FROM w
        ORDER BY n_regionkey, n_nationkey""")),

    // -------------------------------------------------------------------
    // Cumulative-uniques curve: distinct users ever seen, by day — the
    // growth chart every product dashboard opens with, computed the
    // SCALABLE way: each user's FIRST-seen day (one user-grain min),
    // then a day-grain count + running cumsum — never a per-day
    // distinct over growing prefixes (which is quadratic in days and
    // reshuffles the fact table per day). new/returning split per day
    // comes from the same first-seen join. Scale: one user-grain agg,
    // one day-grain agg, one ~30-row window.
    QueryDef("q165_cumulative_uniques",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("CAST(CAST(ts AS DATE) AS STRING)").as("day"))
        val firstSeen = ev.groupBy("user_id").agg(min(col("day")).as("first_day"))
        val daily = ev.join(firstSeen, "user_id")
          .groupBy("day")
          .agg(countDistinct(col("user_id")).as("dau"),
            countDistinct(when(col("day") === col("first_day"), col("user_id")))
              .as("new_users"))
        val wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("cumulative_uniques", sum(col("new_users")).over(wc))
          .select(col("day"), col("dau"), col("new_users"),
            (col("dau") - col("new_users")).as("returning_users"),
            col("cumulative_uniques"))
          .orderBy("day")
      },
      Some("""
        WITH ev AS (
          SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day FROM events),
        fs AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id),
        daily AS (
          SELECT e.day, count(DISTINCT e.user_id) AS dau,
                 count(DISTINCT CASE WHEN e.day = f.first_day THEN e.user_id END)
                   AS new_users
          FROM ev e JOIN fs f ON e.user_id = f.user_id
          GROUP BY e.day)
        SELECT day, CAST(dau AS BIGINT) AS dau, CAST(new_users AS BIGINT) AS new_users,
               CAST(dau - new_users AS BIGINT) AS returning_users,
               CAST(sum(new_users) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cumulative_uniques
        FROM daily
        ORDER BY day""")),

    // -------------------------------------------------------------------
    // Simpson's-paradox screen: does the (discount, quantity)
    // association FLIP sign when lineitem is split by brand? The
    // overall covariance sign vs each within-brand covariance sign,
    // compared WITHOUT any division: sign(n·Σxy − Σx·Σy) is exact in
    // DECIMAL(38,0)/HUGEINT centi-units, so "flipped" is a pure
    // integer predicate — the aggregation-bias tripwire that says
    // "don't quote the pooled trend". Output per brand, plus the
    // pooled sign and flip count on every row. Scale: one fact agg
    // per brand (the part join broadcasts), one pooled agg, a ~25-row
    // compare.
    QueryDef("q166_simpsons_screen",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)").as("x"),
            expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").as("y"))
        def covSign(g: DataFrame, keys: Seq[String]): DataFrame = {
          val grouped = if (keys.isEmpty) g.groupBy() else g.groupBy(keys.map(col): _*)
          grouped.agg(count(ONE).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
            .withColumn("cov_num",
              expr("CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"))
            .withColumn("sign", expr("CASE WHEN cov_num > 0 THEN 1 WHEN cov_num < 0 THEN -1 ELSE 0 END"))
        }
        val pooled = covSign(li, Nil)
          .select(col("sign").as("pooled_sign"))
        val per = covSign(li, Seq("p_brand"))
          .select(col("p_brand"), col("n").as("n_lines"), col("sign").as("brand_sign"))
        val flips = per.crossJoin(broadcast(pooled))
          .withColumn("flipped", col("brand_sign") =!= lit(0)
            && col("pooled_sign") =!= lit(0) && col("brand_sign") =!= col("pooled_sign"))
        val summary = flips.agg(sum(when(col("flipped"), 1L).otherwise(0L)).as("n_flipped"))
        flips.crossJoin(broadcast(summary))
          .select(col("p_brand"), col("n_lines"), col("brand_sign"),
            col("pooled_sign"), col("flipped"), col("n_flipped"))
          .orderBy("p_brand")
      },
      Some("""
        WITH li AS (
          SELECT p.p_brand,
                 CAST(CAST(l.l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
                 CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        pooled AS (
          SELECT CASE WHEN CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
                           - CAST(sum(x) AS HUGEINT) * sum(y) > 0 THEN 1
                      WHEN CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
                           - CAST(sum(x) AS HUGEINT) * sum(y) < 0 THEN -1
                      ELSE 0 END AS pooled_sign
          FROM li),
        per AS (
          SELECT p_brand, count(*) AS n_lines,
                 CASE WHEN CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
                           - CAST(sum(x) AS HUGEINT) * sum(y) > 0 THEN 1
                      WHEN CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
                           - CAST(sum(x) AS HUGEINT) * sum(y) < 0 THEN -1
                      ELSE 0 END AS brand_sign
          FROM li GROUP BY p_brand),
        fl AS (
          SELECT p.p_brand, p.n_lines, p.brand_sign, d.pooled_sign,
                 p.brand_sign <> 0 AND d.pooled_sign <> 0
                   AND p.brand_sign <> d.pooled_sign AS flipped
          FROM per p CROSS JOIN pooled d),
        su AS (SELECT CAST(sum(CASE WHEN flipped THEN 1 ELSE 0 END) AS BIGINT) AS n_flipped
               FROM fl)
        SELECT p_brand, CAST(n_lines AS BIGINT) AS n_lines, brand_sign, pooled_sign,
               flipped, n_flipped
        FROM fl CROSS JOIN su
        ORDER BY p_brand""")),

    // Bradley-Terry preference aggregation (the RLHF / LLM-eval
    // pairwise-comparison rollup: N matchups between K items -> one
    // latent strength per item). Matchups are derived from orders: in
    // every order whose priciest and cheapest lines carry different
    // brands, the pricier brand "beats" the cheaper (min-brand
    // tie-break at equal price, so the matchup is deterministic).
    // Three Minorization-Maximization sweeps (Hunter 2004):
    // p_i <- w_i / sum_j n_ij/(p_i+p_j), run entirely in micro-unit
    // BIGINTs — each term n_ij*1e12 div (pm_i+pm_j) and each update
    // wins*1e12 div denom is an exact floor both engines replay bit-
    // for-bit (DECIMAL(38,0)/HUGEINT widening on the update product;
    // the greatest(..,1) guard covers a 0-win item collapsing to
    // strength 0). Scale: matchups aggregate to a K^2-bounded pair
    // table BEFORE any iteration — the sweeps run on K rows, the one
    // corpus-sized pass is the first groupBy(order).
    QueryDef("q167_bradley_terry",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("l_extendedprice").as("price"), col("p_brand"))
        val ext = li.groupBy("l_orderkey").agg(max("price").as("mx"), min("price").as("mn"))
        val m = li.join(ext, "l_orderkey").groupBy("l_orderkey")
          .agg(min(when(col("price") === col("mx"), col("p_brand"))).as("wb"),
            min(when(col("price") === col("mn"), col("p_brand"))).as("lb"))
          .filter(col("wb") =!= col("lb"))
          .localCheckpoint()
        val pd = m.select(col("wb").as("i"), col("lb").as("j"))
          .unionAll(m.select(col("lb").as("i"), col("wb").as("j")))
          .groupBy("i", "j").agg(count(lit(1)).as("n"))
          .localCheckpoint()
        val wins = m.groupBy(col("wb").as("wbr")).agg(count(lit(1)).as("w"))
        var pm = pd.select(col("i").as("b")).distinct()
          .join(wins, col("b") === col("wbr"), "left")
          .select(col("b"), coalesce(col("w"), lit(0L)).as("wins"),
            lit(1000000L).as("pm"))
          .localCheckpoint(true)
        for (_ <- 1 to 3) {
          // n is a corpus-sized matchup count: widen the *1e12 product to
          // DECIMAL(38,0) (HUGEINT on the oracle side) BEFORE multiplying —
          // plain BIGINT wraps at n > ~9.2e6 where DuckDB's HUGEINT doesn't,
          // a silent cross-engine divergence at 100 TB matchup volumes. The
          // per-term quotient is back under 2^63 (n * 1e12 / ~2e6 micro).
          val denom = pd
            .join(pm.select(col("b").as("i"), col("pm").as("pm_i")), "i")
            .join(pm.select(col("b").as("j"), col("pm").as("pm_j")), "j")
            .groupBy("i")
            .agg(sum(expr(
              """CAST(CAST(n AS DECIMAL(38,0)) * 1000000000000
                 div greatest(pm_i + pm_j, 1) AS BIGINT)""")).as("denom"))
          pm = pm.join(denom, col("b") === col("i"))
            .select(col("b"), col("wins"), expr(
              """CAST(CAST(wins AS DECIMAL(38,0)) * 1000000000000
                 div greatest(CAST(denom AS DECIMAL(38,0)), 1) AS BIGINT)""").as("pm"))
            .localCheckpoint(true)
        }
        val mt = pd.groupBy(col("i")).agg(sum("n").as("matches"))
        pm.join(mt, col("b") === col("i"))
          .select(col("b").as("p_brand"), col("matches"), col("wins"),
            col("pm").as("strength_micro"))
          .withColumn("bt_rank", row_number().over(
            // bounded: one row per brand (25), never lineitem-sized
            Window.orderBy(col("strength_micro").desc, col("p_brand"))))
          .orderBy("bt_rank")
      },
      Some {
        def sweep(k: Int) = s"""
        d$k AS (
          SELECT pd.i AS b,
                 sum(CAST(CAST(n AS HUGEINT) * 1000000000000
                     // greatest(a.pm + c.pm, 1) AS BIGINT)) AS denom
          FROM pd JOIN it${k - 1} a ON pd.i = a.b JOIN it${k - 1} c ON pd.j = c.b
          GROUP BY pd.i),
        it$k AS (
          SELECT t.b, t.wins,
                 CAST(CAST(t.wins AS HUGEINT) * 1000000000000
                      // greatest(CAST(denom AS HUGEINT), 1) AS BIGINT) AS pm
          FROM it${k - 1} t JOIN d$k ON t.b = d$k.b)"""
        s"""
        WITH li AS (
          SELECT l_orderkey, l_extendedprice AS price, p_brand
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        ext AS (SELECT l_orderkey, max(price) AS mx, min(price) AS mn FROM li GROUP BY 1),
        m0 AS (
          SELECT l.l_orderkey,
                 min(CASE WHEN price = mx THEN p_brand END) AS wb,
                 min(CASE WHEN price = mn THEN p_brand END) AS lb
          FROM li l JOIN ext e ON l.l_orderkey = e.l_orderkey GROUP BY 1),
        m AS (SELECT * FROM m0 WHERE wb <> lb),
        pd AS (
          SELECT i, j, count(*) AS n
          FROM (SELECT wb AS i, lb AS j FROM m UNION ALL SELECT lb, wb FROM m)
          GROUP BY i, j),
        wins AS (SELECT wb AS b, count(*) AS w FROM m GROUP BY 1),
        it0 AS (
          SELECT u.b, CAST(coalesce(w, 0) AS BIGINT) AS wins,
                 CAST(1000000 AS BIGINT) AS pm
          FROM (SELECT DISTINCT i AS b FROM pd) u LEFT JOIN wins ON u.b = wins.b),
        ${sweep(1)},
        ${sweep(2)},
        ${sweep(3)},
        mt AS (SELECT i AS b, sum(n) AS matches FROM pd GROUP BY 1)
        SELECT it3.b AS p_brand, CAST(matches AS BIGINT) AS matches,
               it3.wins, it3.pm AS strength_micro,
               row_number() OVER (ORDER BY it3.pm DESC, it3.b) AS bt_rank
        FROM it3 JOIN mt ON it3.b = mt.b
        ORDER BY bt_rank"""
      }),

    // Markov-chain removal-effect attribution (Anderl et al. 2014 — the
    // data-driven multi-touch model that replaced last-touch heuristics):
    // user journeys become a first-order chain over event types with
    // START / CONV (absorb on first purchase) / END (journey ends
    // unconverted) states; a channel's credit is how much the chain's
    // START->CONV absorption mass drops when that channel is removed
    // (its inbound edges redirected to END). Absorption is evaluated at
    // a FIXED 8-sweep horizon: v_i <- sum_j n_ij * v_j div row_n_i runs
    // entirely in micro-unit BIGINTs, so every sweep is an exact floor
    // both engines and the scalar spec replay reproduce bit-for-bit.
    // Scale: ONE corpus pass builds the (states+2)^2-bounded transition
    // matrix; the 5 chains x 8 sweeps run on that K-row table (collected
    // driver-side — the bounded-collect pattern of the s08 shortlist /
    // c01 centroids), so cost is the journey groupBy, not the algebra.
    QueryDef("q168_markov_attribution",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
        val seq0 = Tables.events(s, d)
          .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
            col("event_type"))
          .withColumn("pos", row_number().over(w))
        val firstp = seq0.filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("fu")).agg(min(col("pos")).as("fpos"))
        val kept = seq0.join(firstp, col("user_id") === col("fu"), "left")
          .filter(col("fpos").isNull || col("pos") <= col("fpos"))
          .withColumn("state",
            when(col("event_type") === "purchase", lit("CONV")).otherwise(col("event_type")))
        val wk = Window.partitionBy("user_id").orderBy(col("pos"))
        val steps = kept
          .withColumn("from_state", coalesce(lag(col("state"), 1).over(wk), lit("START")))
          .withColumn("is_last", lead(col("state"), 1).over(wk).isNull)
          .select(col("from_state"), col("state").as("to_state"),
            col("is_last"), col("state"))
        // journey edges: every (prev -> cur) pair, plus a terminal
        // cur -> END edge when the journey ends unconverted
        val edges = steps.select(col("from_state"), col("to_state"))
          .unionAll(steps
            .filter(col("is_last") && col("state") =!= "CONV")
            .select(col("state").as("from_state"), lit("END").as("to_state")))
        val trans = edges.groupBy("from_state", "to_state")
          .agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        // exact integer 8-sweep absorption on the collected K^2 matrix
        def absorb(t: Seq[(String, String, Long)]): Long = {
          val rowN = t.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
          val states = t.map(_._1).distinct
          var v = Map("CONV" -> 1000000L, "END" -> 0L).withDefaultValue(0L)
          for (_ <- 1 to 8) {
            val nv = states.map { st =>
              st -> t.collect { case (f, to, n) if f == st => n * v(to) }.sum / rowN(st)
            }.toMap
            v = (nv + ("CONV" -> 1000000L) + ("END" -> 0L)).withDefaultValue(0L)
          }
          v("START")
        }
        def removed(c: String): Seq[(String, String, Long)] = trans.toSeq
          .filter(_._1 != c)
          .map { case (f, to, n) => (f, if (to == c) "END" else to, n) }
          .groupBy(t => (t._1, t._2)).map { case ((f, to), xs) => (f, to, xs.map(_._3).sum) }
          .toSeq
        val base = absorb(trans.toSeq)
        val channels = trans.map(_._1).filter(c => c != "START").distinct.sorted
        // The unrolled DuckDB oracle enumerates one removed-channel chain
        // per member of Q168_CHANNELS — a fixture gaining or losing an
        // event type would silently desynchronize the two sides. Fail
        // LOUDLY with the drifted set instead of hash-mismatching.
        require(channels.toSeq == Q168_CHANNELS,
          s"q168: observed channels ${channels.toSeq} != oracle's unrolled list " +
            s"$Q168_CHANNELS - regenerate the oracle's per-channel chains")
        val rows = channels.map { c =>
          val r = absorb(removed(c))
          (c, base, r, if (base == 0) 0L else (base - r) * 1000000L / base)
        }
        rows.toSeq
          .toDF("channel", "base_cvr_micro", "removed_cvr_micro", "removal_effect_ppm")
          .orderBy("channel")
      },
      Some {
        // unrolled sweeps: vterm pins the absorbing states, each sweep is
        // the same exact integer contraction the Spark side runs
        def sweeps(tag: String, transCte: String): String = {
          val chain = (1 to 8).map { k =>
            s"""v${tag}_$k AS (
              SELECT rn.from_state AS state,
                     CAST(sum(t.n * coalesce(v.v, CASE WHEN t.to_state = 'CONV' THEN 1000000 ELSE 0 END))
                          // rn.row_n AS BIGINT) AS v
              FROM $transCte t
              JOIN rown_$tag rn ON t.from_state = rn.from_state
              LEFT JOIN v${tag}_${k - 1} v ON t.to_state = v.state
              GROUP BY rn.from_state, rn.row_n)"""
          }.mkString(",\n        ")
          s"""rown_$tag AS (
            SELECT from_state, CAST(sum(n) AS BIGINT) AS row_n
            FROM $transCte GROUP BY from_state),
        v${tag}_0 AS (
          SELECT 'CONV' AS state, CAST(1000000 AS BIGINT) AS v
          UNION ALL SELECT 'END', CAST(0 AS BIGINT)),
        $chain"""
        }
        // NOTE on v_{k-1} lookup: non-terminal states missing from the
        // previous sweep's output contribute 0; CONV/END are pinned via
        // the coalesce CASE (CONV never appears as a from_state).
        s"""
        WITH seq0 AS (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS pos
          FROM events),
        firstp AS (
          SELECT user_id AS fu, min(pos) AS fpos FROM seq0
          WHERE event_type = 'purchase' GROUP BY user_id),
        kept AS (
          SELECT user_id, pos,
                 CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS state
          FROM seq0 LEFT JOIN firstp ON user_id = fu
          WHERE fpos IS NULL OR pos <= fpos),
        steps AS (
          SELECT coalesce(lag(state, 1) OVER (PARTITION BY user_id ORDER BY pos), 'START')
                   AS from_state,
                 state AS to_state,
                 lead(state, 1) OVER (PARTITION BY user_id ORDER BY pos) IS NULL AS is_last,
                 state
          FROM kept),
        edges AS (
          SELECT from_state, to_state FROM steps
          UNION ALL
          SELECT state, 'END' FROM steps WHERE is_last AND state <> 'CONV'),
        trans AS (
          SELECT from_state, to_state, count(*) AS n
          FROM edges GROUP BY from_state, to_state),
        chans AS (
          SELECT DISTINCT from_state AS c FROM trans WHERE from_state <> 'START'),
        ${sweeps("b", "trans")},
        base AS (SELECT v AS base_v FROM vb_8 WHERE state = 'START'),
        ${Q168_CHANNELS.map { c =>
          val tag = c.take(2)
          s"""tr_$tag AS (
            SELECT from_state,
                   CASE WHEN to_state = '$c' THEN 'END' ELSE to_state END AS to_state,
                   CAST(sum(n) AS BIGINT) AS n
            FROM trans WHERE from_state <> '$c'
            GROUP BY from_state, CASE WHEN to_state = '$c' THEN 'END' ELSE to_state END),
        ${sweeps(tag, s"tr_$tag")},
        out_$tag AS (
          SELECT '$c' AS channel, base_v AS base_cvr_micro, v AS removed_cvr_micro,
                 CASE WHEN base_v = 0 THEN CAST(0 AS BIGINT)
                      ELSE CAST((base_v - v) * 1000000 // base_v AS BIGINT) END
                   AS removal_effect_ppm
          FROM v${tag}_8 CROSS JOIN base WHERE state = 'START')"""
        }.mkString(",\n        ")}
        SELECT * FROM out_cl UNION ALL SELECT * FROM out_er
        UNION ALL SELECT * FROM out_si UNION ALL SELECT * FROM out_vi
        ORDER BY channel"""
      })
  )

  /** Shared per-level Hilbert xy2d step expressions — IDENTICAL SQL text
    * for Spark and DuckDB (integer CASE/&/- only; the (3*rx) XOR ry
    * quadrant digit is spelled as a CASE table because `^` means xor in
    * Spark but power in DuckDB). Standard d-from-xy walk: accumulate
    * s*s*digit, then reflect (rx=1, ry=0 quadrant) and swap x/y.
    */
  private[operators] object HilbertSteps {
    val LEVELS: Seq[Int] = Seq(128, 64, 32, 16, 8, 4, 2, 1)
    def step(s: Int): (String, String, String) = {
      val rx = s"(CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
      val digit = s"(CASE WHEN $ry = 1 THEN (CASE WHEN $rx = 1 THEN 2 ELSE 1 END)" +
        s" ELSE (CASE WHEN $rx = 1 THEN 3 ELSE 0 END) END)"
      val nh = s"h + CAST($s AS BIGINT) * $s * $digit"
      val nx = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $s - 1 - y ELSE y END) ELSE x END)"
      val ny = s"(CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $s - 1 - x ELSE x END) ELSE y END)"
      (nx, ny, nh)
    }
  }
}
