package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-2 operator batch: PageRank (g01), semantic
  * dedup (c02), BM25 (t09), collocations (t10), z-order (q25), SCD2
  * (q26). The DuckDB oracles pin exact values; these pin the
  * distributed-correctness and scale-shape properties.
  */
class GraphOpsSpec extends SparkSpec {

  test("g05: recursive-CTE reachability == g03's hand-unrolled BFS on reached docs") {
    val bfs = graft.SparkEntry.queries("g03_bfs")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).filter(_._2 >= 0).toMap
    val rec = graft.SparkEntry.queries("g05_recursive_reach")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rec == bfs, "declarative recursion must equal the loop form")
    assert(rec.values.exists(_ > 0))
  }

  test("g01: isolated docs keep the teleport rank; linked docs exceed it") {
    val rows = graft.SparkEntry.queries("g01_pagerank")(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (rank, deg) = (r.getDouble(1), r.getLong(2))
      if (deg == 0) assert(rank == 0.15, s"doc ${r.getLong(0)}: $rank")
      else assert(rank > 0.15, s"doc ${r.getLong(0)}: $rank deg=$deg")
    }
    assert(rows.exists(_.getLong(2) > 0), "near-dup graph should have edges")
  }

  test("g01: result is shuffle-partition-count invariant") {
    def runWith(n: String) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try graft.SparkEntry.queries("g01_pagerank")(spark, sf0001).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(runWith("3") == runWith("13"))
  }

  test("c02: within-cluster pairs are a subset of the scalar all-pairs truth") {
    // d05 is sample-bound since r9, so the all-pairs ground truth is a
    // scalar replay over the 500-row fixture (test-only n²)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val all = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs if ia < ib
      c = round6(dot(va, vb) / (nrm(ia) * nrm(ib))) if c >= 0.35
    } yield (ia, ib) -> c).toMap
    val semi = graft.SparkEntry.queries("c02_semdedup")(spark, sf0001).collect()
    assert(semi.nonEmpty)
    semi.foreach { r =>
      val k = (r.getLong(1), r.getLong(2))
      assert(all.contains(k), s"pair $k not in exact all-pairs output")
      assert(all(k) == r.getDouble(3), s"cosine differs for $k")
    }
  }

  test("t09: scores are positive, ranked, and the stats/df sides broadcast") {
    val q = graft.SparkEntry.queries("t09_bm25")(spark, sf0001)
    val rows = q.collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(3))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("t10: every reported pair beats independence (pmi > 0 at count >= 5)") {
    val rows = graft.SparkEntry.queries("t10_collocations")(spark, sf0001).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getLong(3) >= 5)
      assert(r.getDouble(4) > 0, s"${r.getString(1)} ${r.getString(2)}")
    }
  }

  test("q25: z-buckets are disjoint z-ranges covering narrow x/y slices") {
    val rows = graft.SparkEntry.queries("q25_zorder")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // z-ranges of consecutive buckets must not overlap (they are the
    // file boundaries a range-partitioned write would produce)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
      case _ =>
    }
    rows.foreach { r =>
      // top-6-bit bucket = 3 high bits per dimension -> each bucket
      // spans at most 1/8 of each 16-bit key space
      assert(r.getLong(5) - r.getLong(4) < 8192, s"x span in bucket ${r.getLong(0)}")
      assert(r.getLong(7) - r.getLong(6) < 8192, s"y span in bucket ${r.getLong(0)}")
    }
  }

  test("q26: versions are contiguous, intervals chain, one current row per user") {
    val rows = graft.SparkEntry.queries("q26_scd2")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (user, vs) =>
      val sorted = vs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to vs.length), s"user $user versions")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(4) && a.getLong(4) == b.getLong(3),
            s"user $user: valid_to must equal next valid_from")
          assert(a.getString(2) != b.getString(2),
            s"user $user: consecutive versions must differ")
        case _ =>
      }
      assert(sorted.count(_.getBoolean(5)) == 1, s"user $user current rows")
      assert(sorted.last.isNullAt(4), s"user $user: last version must be open")
    }
  }
}
