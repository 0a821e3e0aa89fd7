package graft

/** Guards the driver-harness contract: every oracle entry must name a
  * real query, the flagship must return rows, and names must be stable.
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"orphan oracles: ${o -- q}")
  }

  test("oracle SQL strings are non-empty and reference no Spark-only syntax") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      // Spark-isms that DuckDB would reject outright
      assert(!sql.contains("get_json_object"), name)
      assert(!sql.contains("timestamp_micros"), name)
    }
  }

  test("flagship entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every multi-row oracle carries an ORDER BY (hash compare needs total order)") {
    // the driver hash-compares row sequences; an unordered multi-row
    // oracle is only green by luck. Single-row aggregates are exempt.
    val unordered = SparkEntry.oracleSql.filterNot(_._2.toUpperCase.contains("ORDER BY"))
    unordered.foreach { case (name, _) =>
      val n = SparkEntry.queries(name)(spark, sf0001).count()
      assert(n <= 1, s"$name returns $n rows with no ORDER BY in its oracle")
    }
  }

  test("all queries execute at sf0.001 and return deterministic row counts twice") {
    val counts1 = SparkEntry.queries.map { case (n, fn) => n -> fn(spark, sf0001).count() }
    val counts2 = SparkEntry.queries.map { case (n, fn) => n -> fn(spark, sf0001).count() }
    assert(counts1 == counts2)
    counts1.foreach { case (n, c) => assert(c >= 0, n) }
  }

  test("EVERY query's full content is identical with AQE enabled") {
    // production clusters run adaptive execution; runtime re-planning
    // (coalesced partitions, switched join strategies, skew splits) must
    // not change any result. Same content-hash sweep as the partition
    // invariance test, AQE off vs on.
    def contentHashes(aqe: String): Map[String, Int] = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      try SparkEntry.queries.map { case (n, fn) =>
        n -> fn(spark, sf0001).collect().map(_.toString).toSeq.sorted.hashCode
      }
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    val off = contentHashes("false")
    val on = contentHashes("true")
    val diff = off.keySet.filter(k => off(k) != on(k))
    assert(diff.isEmpty, s"AQE-sensitive queries: $diff")
  }

  test("EVERY query's full content is shuffle-partition-count invariant") {
    // the direct whole-surface proof of the scale claim: identical
    // results under different parallelism (family specs prove it per
    // operator; this sweeps all of them)
    def contentHashes(parts: String): Map[String, Int] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try SparkEntry.queries.map { case (n, fn) =>
        n -> fn(spark, sf0001).collect().map(_.toString).toSeq.sorted.hashCode
      }
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = contentHashes("7")
    val b = contentHashes("32")
    val diff = a.keySet.filter(k => a(k) != b(k))
    assert(diff.isEmpty, s"partition-sensitive queries: $diff")
  }
}
