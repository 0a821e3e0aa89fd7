package graft.operators

import graft.{QueryDef, Sql, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handles most runtime skew
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit
  * salting is the plan-level fallback when one join key dominates so
  * hard that even split shuffle blocks hot-spot a single executor —
  * e.g. the null-key or celebrity-user patterns in a 100 TB fact table.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways:
    *  - fact rows get a DETERMINISTIC salt (hash of the whole row's
    *    discriminator column — never `rand()`, which would break retry
    *    semantics and cross-run reproducibility);
    *  - dim rows are replicated once per salt value;
    *  - the shuffle keys on (key, salt), spreading a hot key over
    *    `salts` reducers. Result set is byte-identical to the unsalted
    *    join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      discriminator: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(hash(discriminator), lit(salts)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Equi-join `a ⋈ b` on `key` with HOT keys (those in `hotKeys`, a
    * one-column frame of key values) routed through [[saltedJoin]] and
    * the long tail through the plain shuffle join. The blocking-key
    * de-skew for self-join candidate generation: on a crawl corpus a
    * handful of boilerplate blocking keys ("The ", "http", "<!DO"
    * title prefixes) concentrate a huge row fraction on single
    * reducers even though the plan is a proper equi-join — salting
    * spreads each hot key over `salts` reducers (per-task candidate
    * work drops ~salts-fold) while the tail pays no replication at
    * all. `hotKeys` is broadcast (it is by definition a short list),
    * the two paths partition the key domain, and the union is
    * row-identical to the plain join.
    */
  def deskewedJoin(a: DataFrame, b: DataFrame, key: String,
      discriminator: Column, hotKeys: DataFrame, salts: Int): DataFrame = {
    val hk = broadcast(hotKeys.select(col(key)).distinct())
    val cold = a.join(hk, Seq(key), "left_anti")
      .join(b.join(hk, Seq(key), "left_anti"), Seq(key))
    val hot = saltedJoin(
      a.join(hk, Seq(key), "left_semi"),
      b.join(hk, Seq(key), "left_semi"), key, discriminator, salts)
    cold.unionByName(hot)
  }

  def defs: Seq[QueryDef] = Seq(

    // -------------------------------------------------------------------
    // Salted fact⋈dim join: same result as the plain join (which is the
    // oracle), but the shuffle distributes each o_orderkey over 8
    // reducers — the explicit-salting pattern for hot keys.
    QueryDef("q19_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
            col("l_extendedprice"), col("l_discount"))
        val o = Tables.orders(s, d).select("o_orderkey", "o_orderstatus")
        saltedJoin(li, o, "o_orderkey", col("l_linenumber"), salts = 8)
          .groupBy("o_orderstatus")
          .agg(Sql.dsumProd(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("o_orderstatus")
      },
      Some(s"""
        SELECT o_orderstatus,
               ${Sql.oDsumProd("l_extendedprice", "1 - l_discount")} AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus"""))
  )
}
