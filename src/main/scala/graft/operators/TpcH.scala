package graft.operators

import graft.{QueryDef, Sql, Tables}
import org.apache.spark.sql.functions._

/** The remaining distinctive TPC-H optimizer shapes (SURVEY.md §2.2),
  * adapted to the reduced test schema (no partsupp table, no
  * commit/receipt dates; nations are NATION_0..24, brands Brand#1..25,
  * p_type a single word). Q3/Q5/Q10/Q18/Q21 live in [[Relational]]
  * (q34/q43/q35/q36/q51); this module adds the shapes they don't cover:
  *
  *  - Q13: outer join with a join-side-only predicate + double
  *    aggregation (the count-of-counts histogram);
  *  - Q14: two-arm conditional aggregate ratio over a fact-dim join;
  *  - Q15: aggregate view reused on both sides of a global-max scalar
  *    subquery (exact decimal equality join);
  *  - Q17: correlated aggregate subquery on the fact table itself,
  *    decorrelated to a per-key aggregate + self-join;
  *  - Q19: OR-of-ANDs predicate spanning both join sides (disjunctive
  *    pushdown);
  *  - Q7: symmetric nation-pair OR join predicate + year rollup;
  *  - Q22: global scalar aggregate threshold + NOT EXISTS anti join.
  *
  * Cross-engine rules as in [[Relational]]: decimal-exact money math
  * ([[Sql]]), identical aliases both sides, deterministic ORDER BY.
  */
object TpcH {

  private val ONE = lit(1)

  def defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------------
    // Q13 custdist: how many customers placed k orders, excluding urgent
    // ones. The predicate lives in the JOIN condition (not WHERE), so
    // customers whose only orders are urgent still appear with count 0 —
    // the semantics that force a true outer join. Scale: orders
    // partial-aggregates to one row per customer before the second
    // (tiny, |distinct counts|-sized) aggregation; the outer join is a
    // shuffle join on c_custkey = o_custkey, never broadcast (both sides
    // are customer-cardinality at 100 TB).
    QueryDef("q52_tpch_q13",
      (s, d) => {
        val perCust = Tables.customer(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy("c_count")
          .agg(count(ONE).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")),

    // -------------------------------------------------------------------
    // Q14 promo revenue: the share of one month's discounted revenue on
    // PROMO-type parts. One fact scan (shipdate pushed to parquet), part
    // broadcast, both conditional sums in a single aggregate — the ratio
    // is one double division at the end (deterministic IEEE on exact
    // decimal sums).
    QueryDef("q58_tpch_q14",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-03-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100) *
            Sql.dsumProd(when(col("p_type") === "PROMO", col("l_extendedprice"))
              .otherwise(lit(0)), ONE - col("l_discount")) /
            Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")), 6)
            .as("promo_revenue_pct")),
      Some(s"""
        SELECT round(100 *
                 ${Sql.oDsumProd("CASE WHEN p_type = 'PROMO' THEN l_extendedprice ELSE 0 END", "1 - l_discount")} /
                 ${Sql.oDsumProd("l_extendedprice", "1 - l_discount")}, 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'""")),

    // -------------------------------------------------------------------
    // Q15 top supplier: the revenue view is computed ONCE and reused on
    // both sides of the scalar-max subquery; the max-equality join runs
    // on the EXACT decimal revenue (a double round-trip could split a
    // genuine tie), with the double rendering only in the output. Scale:
    // the view is supplier-cardinality (fact pre-aggregated map-side);
    // the 1-row max broadcasts back onto it.
    QueryDef("q54_tpch_q15",
      (s, d) => {
        val revenue = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (ONE - col("l_discount")).cast("decimal(12,2)")).as("rev_exact"))
        val top = revenue.agg(max(col("rev_exact")).as("rev_max"))
        revenue.join(broadcast(top), col("rev_exact") === col("rev_max"))
          .join(broadcast(Tables.supplier(s, d)),
            col("supplier_no") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            round(col("rev_exact").cast("double"), 6).as("total_revenue"))
          .orderBy("s_suppkey")
      },
      Some("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                     CAST(1 - l_discount AS DECIMAL(12,2))) AS rev_exact
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name,
               round(CAST(rev_exact AS DOUBLE), 6) AS total_revenue
        FROM revenue JOIN supplier ON supplier_no = s_suppkey
        WHERE rev_exact = (SELECT max(rev_exact) FROM revenue)
        ORDER BY s_suppkey""")),

    // -------------------------------------------------------------------
    // Q17 small-quantity-order revenue: for one brand's small parts, sum
    // the revenue of lineitems whose quantity is below 20% of that
    // part's average order quantity. The correlated AVG subquery
    // decorrelates to a per-partkey aggregate + join; the 20%-of-average
    // threshold is compared multiplied-through in exact decimal
    // (5 * qty * cnt < sum_qty), so tie behavior is engine-independent —
    // no decimal-division scale rules involved. Scale: the brand filter
    // prunes part to a broadcastable dimension; lineitem is touched
    // twice but only the semi-joined slice aggregates, and both passes
    // shuffle by l_partkey (one exchange reused under AQE).
    QueryDef("q53_tpch_q17",
      (s, d) => {
        val parts = Tables.part(s, d)
          .filter(col("p_brand") === "Brand#23" && col("p_size") <= 15)
          .select("p_partkey")
        val li = Tables.lineitem(s, d)
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        val stats = li.groupBy(col("l_partkey").as("sp_partkey"))
          .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("sum_qty"),
            count(ONE).as("cnt"))
        li.join(stats, col("l_partkey") === col("sp_partkey"))
          .filter(expr("""CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(3,0))
                          * CAST(cnt AS DECIMAL(12,0)) < sum_qty"""))
          .agg(round(Sql.dsum(col("l_extendedprice")) / lit(7.0), 6).as("avg_yearly"))
      },
      Some(s"""
        WITH parts AS (
          SELECT p_partkey FROM part WHERE p_brand = 'Brand#23' AND p_size <= 15),
        li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN parts ON l_partkey = p_partkey),
        stats AS (
          SELECT l_partkey AS sp_partkey,
                 sum(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty,
                 count(*) AS cnt
          FROM li GROUP BY l_partkey)
        SELECT round(${Sql.oDsum("l_extendedprice")} / 7.0, 6) AS avg_yearly
        FROM li JOIN stats ON l_partkey = sp_partkey
        WHERE CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(3,0))
              * CAST(cnt AS DECIMAL(12,0)) < sum_qty""")),

    // -------------------------------------------------------------------
    // Q19 discounted revenue: an OR of three brand/size/quantity
    // conjunctions that each reference BOTH join sides. The equi-join on
    // partkey must still be recognized (no nested loop); the disjunction
    // evaluates post-join, while its l_quantity-only common range
    // (1..30) is pushable to the fact scan. PlanSpec asserts the
    // broadcast-hash shape.
    QueryDef("q55_tpch_q19",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(round(Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")), 6)
          .as("revenue")),
      Some(s"""
        SELECT round(${Sql.oDsumProd("l_extendedprice", "1 - l_discount")}, 6) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""")),

    // -------------------------------------------------------------------
    // Q7 volume shipping: revenue flowing between two nations in either
    // direction, by supplier nation x customer nation x ship year. The
    // nation pair is a symmetric OR over two broadcast dimension chains
    // (supplier->n1, customer->n2); the fact joins stay equi on their
    // keys with the pair filter applied after — lineitem and orders
    // shuffle once on orderkey, everything else broadcasts.
    QueryDef("q56_tpch_q7",
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter(
            (col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(round(Sql.dsumProd(col("l_extendedprice"), ONE - col("l_discount")), 6)
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "l_year")
      },
      Some(s"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               round(${Sql.oDsumProd("l_extendedprice", "1 - l_discount")}, 6) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
           OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year""")),

    // -------------------------------------------------------------------
    // Q22 positive-balance customers without orders: a global scalar
    // aggregate (average positive account balance) gates the customer
    // scan, then a NOT EXISTS anti join against orders, rolled up by
    // market segment. The threshold compare is multiplied through to
    // exact decimal (bal * cnt > sum) — no division, engine-identical
    // ties; the 1-row aggregate broadcasts; the anti join shuffles
    // customer-cardinality keys only.
    QueryDef("q57_tpch_q22",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val thresh = cust.filter(col("c_acctbal") > 0.0)
          .agg(sum(col("c_acctbal").cast("decimal(12,2)")).as("bal_sum"),
            count(ONE).cast("decimal(12,0)").as("bal_cnt"))
        cust.crossJoin(broadcast(thresh))
          .filter(col("c_acctbal").cast("decimal(12,2)") * col("bal_cnt") > col("bal_sum"))
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(ONE).as("numcust"),
            Sql.dsum(col("c_acctbal")).as("totacctbal"))
          .orderBy("c_mktsegment")
      },
      Some(s"""
        WITH thresh AS (
          SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_sum,
                 CAST(count(*) AS DECIMAL(12,0)) AS bal_cnt
          FROM customer WHERE c_acctbal > 0.0)
        SELECT c_mktsegment, count(*) AS numcust,
               ${Sql.oDsum("c_acctbal")} AS totacctbal
        FROM customer CROSS JOIN thresh
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) * bal_cnt > bal_sum
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""))
  )
}
