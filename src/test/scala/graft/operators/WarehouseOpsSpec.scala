package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the warehouse/maintenance operator batch: CDC upsert
  * (q27), histogram (q28), z-score outliers (q29), profiling (q30),
  * shuffle-sharding (p05).
  */
class WarehouseOpsSpec extends SparkSpec {

  test("q27: merge equals a direct latest-per-user computation") {
    val t0 = 1705708800000000L
    val ev = graft.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    // expected: latest event overall decides; users whose latest event in
    // (t0, inf) is an 'error' are tombstoned; users with no event at all
    // after t0 fall back to their latest base row
    val expected = ev.groupBy(_._1).flatMap { case (user, es) =>
      val latest = es.maxBy(e => (e._5, e._2))
      if (latest._5 > t0) {
        if (latest._3 == "error") None
        else Some((user, latest._3, latest._4, "upsert"))
      } else Some((user, latest._3, latest._4, "base"))
    }.toSet
    val got = graft.SparkEntry.queries("q27_cdc_upsert")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSet
    assert(got == expected)
  }

  test("q28: bucket counts partition the table and bounds hold") {
    val rows = graft.SparkEntry.queries("q28_histogram")(spark, sf0001).collect()
    val total = rows.map(_.getLong(2)).sum
    val nEvents = graft.Tables.events(spark, sf0001).count()
    assert(total == nEvents)
    rows.foreach { r =>
      val (b, lo, hi) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi)
      assert(lo >= b * 25.0, s"bucket $b min $lo")
      if (b < 19) assert(hi < (b + 1) * 25.0, s"bucket $b max $hi")
    }
  }

  test("q29: stats are sane and outliers are a small tail") {
    val rows = graft.SparkEntry.queries("q29_zscore_outliers")(spark, sf0001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(3) > 0)
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(1) / 10,
        s"${r.getString(0)}: ${r.getLong(4)} outliers of ${r.getLong(1)}")
    }
  }

  test("q30: profile has one row per column with consistent counts") {
    val rows = graft.SparkEntry.queries("q30_profile")(spark, sf0001).collect()
    assert(rows.map(_.getString(0)).toSet == Set(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"))
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"${r.getString(0)} distinct > rows")
      assert(r.getString(3).nonEmpty && r.getString(4).nonEmpty)
    }
  }

  test("q31: every user has a full 24-slot grid and fill carries forward") {
    val rows = graft.SparkEntry.queries("q31_resample_ffill")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (0L to 23L), s"user $user grid")
      val sorted = rs.sortBy(_.getLong(1))
      var lastSeen: Option[Double] = None
      sorted.foreach { r =>
        if (r.getBoolean(3)) lastSeen = Some(r.getDouble(2))
        else lastSeen match {
          case Some(v) => assert(r.getDouble(2) == v, s"user $user slot ${r.getLong(1)}")
          case None => assert(r.isNullAt(2), s"user $user slot ${r.getLong(1)} before first obs")
        }
      }
      assert(sorted.exists(_.getBoolean(3)), s"user $user has no observation")
    }
  }

  test("q32: funnel stages are monotonically decreasing") {
    val rows = graft.SparkEntry.queries("q32_funnel")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("all_users", "1_view", "2_view_click", "3_view_click_purchase"))
    assert(rows("all_users") >= rows("1_view"))
    assert(rows("1_view") >= rows("2_view_click"))
    assert(rows("2_view_click") >= rows("3_view_click_purchase"))
    assert(rows("1_view") > 0)
  }

  test("q33: retention rates are in (0, 1] and cohorts are day-keyed") {
    val rows = graft.SparkEntry.queries("q33_retention")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1 && r.getLong(1) <= 7)
      assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(2) > 0)
    }
  }

  test("p05: sharding is a balanced permutation with contiguous positions") {
    val rows = graft.SparkEntry.queries("p05_shuffle_shard")(spark, sf0001).collect()
    assert(rows.map(_.getLong(0)).distinct.length == 500)
    val byShard = rows.groupBy(_.getInt(1))
    assert(byShard.keySet == (0 until 8).toSet)
    byShard.foreach { case (shard, rs) =>
      assert(rs.length > 30 && rs.length < 100, s"shard $shard size ${rs.length}")
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to rs.length), s"shard $shard positions")
    }
  }
}
