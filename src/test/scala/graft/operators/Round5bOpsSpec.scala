package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-5 second-wave additions (q87 Count-Sketch, q88 TWAP,
  * q89 proration, s11 binary ANN, g06 k-core). Each query's VALUES are
  * already pinned by its DuckDB oracle; these tests pin the properties
  * the oracle hash alone cannot name — estimator bounds, conservation
  * laws, fixpoint convergence — against scalar reimplementations.
  */
class Round5bOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def h32(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  test("q87: Count-Sketch estimates equal a scalar signed-median sketch") {
    import scala.jdk.CollectionConverters._
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val counts = new java.util.HashMap[String, Long]()
    texts.foreach(_.split(" ", -1).filter(_.nonEmpty)
      .foreach(t => counts.merge(t, 1L, _ + _)))
    // scalar sketch: 5 rows x 16 SIGNED counters, same md5 buckets/signs
    def sign(r: Int, t: String): Long = (h32(s"css$r:$t") % 2) * 2 - 1
    def bucket(r: Int, t: String): Int = (h32(s"csb$r:$t") % 16).toInt
    val sketch = Array.fill(5, 16)(0L)
    counts.asScala.foreach { case (t, c) =>
      for (r <- 0 until 5) sketch(r)(bucket(r, t)) += sign(r, t) * c
    }
    val got = run("q87_count_sketch").collect()
    assert(got.length == 20)
    got.foreach { row =>
      val (tok, exact, est, err) =
        (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3))
      val want = (0 until 5).map(r => sign(r, tok) * sketch(r)(bucket(r, tok)))
        .sorted.apply(2) // median of 5
      assert(est == want, s"token $tok: est $est != scalar Count-Sketch $want")
      assert(exact == counts.get(tok), s"token $tok exact count")
      assert(err == est - exact, s"token $tok err column")
    }
    // the defining contrast with CMS (t13): the signed estimator is
    // two-sided — collisions can push estimates BELOW the true count
    // (CMS never can). w=16 < |vocab| forces collisions, so some token
    // must carry a nonzero signed error.
    val errs = got.map(_.getLong(3))
    assert(errs.exists(_ != 0L),
      "no signed-collision error at all — sketch width too large for the test to bite")
  }

  test("q88: TWAP equals a scalar duration-weighted BigInt fold") {
    val ev = graft.Tables.events(spark, sf0001)
      .filter(pmod(col("user_id"), lit(10)) === 3)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us",
        "CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).collect { case (u, rows) if rows.length > 1 =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      val holds = sorted.sliding(2).map { case Array(a, b) => (a._4, b._3 - a._3) }.toSeq
      val num = holds.map { case (v, d) => BigInt(v) * BigInt(d) }.sum
      val den = holds.map(_._2).sum
      u -> ((holds.length.toLong, den, ((2 * num + den) / (2 * BigInt(den))).toLong))
    }.toMap
    val got = run("q88_twap").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, s"TWAP mismatch: ${got.keySet.diff(want.keySet)}")
  }

  test("q89: allocation equals a scalar largest-remainder and conserves totals") {
    val got = run("q89_proration").collect()
    assert(got.nonEmpty)
    // conservation is asserted row-by-row by the query itself
    assert(got.forall(_.getBoolean(5)), "some order total was not conserved")
    // full scalar differential: recompute the largest-remainder
    // allocation per order (note the fixture has DUPLICATE l_linenumber
    // within orders — row identity is line_seq, ordered by
    // (linenumber, ec), exactly as the query derives it)
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(pmod(col("l_orderkey"), lit(20)) === 0)
      .join(spark.read.parquet(s"$sf0001/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .selectExpr("o_orderkey", "l_linenumber",
        "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS tc",
        "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS ec")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val want = li.groupBy(_._1).toSeq.flatMap { case (ok, rows) =>
      val seqd = rows.sortBy(r => (r._2, r._4)).zipWithIndex
        .map { case ((_, ln, tc, ec), i) => (i + 1, ln, tc, ec) }
      val etot = seqd.map(_._4).sum
      val based = seqd.map { case (seq, ln, tc, ec) =>
        (seq, ln, tc * ec / etot, tc * ec % etot) }
      val leftover = seqd.head._3 - based.map(_._3).sum
      val bonus = based.sortBy(b => (-b._4, b._1)).take(leftover.toInt).map(_._1).toSet
      based.map { case (seq, ln, base, _) =>
        (ok, seq) -> ((ln, base + (if (bonus(seq)) 1L else 0L))) }
    }.toMap
    val gotMap = got.map(r => (r.getLong(0), r.getInt(1)) ->
      ((r.getInt(2), r.getLong(3)))).toMap
    assert(gotMap.size == want.size)
    want.foreach { case (k, v) =>
      assert(gotMap(k) == v, s"order-line $k: got ${gotMap(k)} want $v") }
  }

  test("s11: hamming shortlist is exact sign-bit distance; recall is self-consistent") {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def words(v: Array[Double]): (Long, Long) = {
      var w0 = 0L; var w1 = 0L
      for (i <- 0 until 32) if (v(i) > 0) w0 |= 1L << i
      for (i <- 32 until 64) if (v(i) > 0) w1 |= 1L << (i - 32)
      (w0, w1)
    }
    val got = run("s11_binary_ann").collect()
    got.foreach { r =>
      val (q, n) = (vecs(r.getLong(0)), vecs(r.getLong(2)))
      val (qw, nw) = (words(q), words(n))
      val ham = java.lang.Long.bitCount(qw._1 ^ nw._1) + java.lang.Long.bitCount(qw._2 ^ nw._2)
      assert(r.getInt(4) == ham, s"row $r: hamming")
    }
    // recall5 = |reranked top-5 ∩ in_exact flags| / 5, constant per query
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val hits = rows.count(_.getBoolean(5))
      assert(rows.forall(r => math.abs(r.getDouble(6) - hits / 5.0) < 1e-12), s"qid $qid recall")
    }
    // the quantized index must be genuinely useful: mean recall@5 >= 0.5
    val mean = got.groupBy(_.getLong(0)).values.map(_.head.getDouble(6)).sum /
      got.map(_.getLong(0)).distinct.length
    assert(mean >= 0.5, s"mean recall@5 $mean — binary quantization lost the signal")
  }

  test("g06: bounded peel reached the true k-core fixpoint (scalar differential)") {
    val edges = Dedup.minhashPairs(spark, sf0001)
      .filter(col("est_jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
    // scalar peel to TRUE fixpoint (unbounded rounds)
    var live = edges.groupBy(_._1).collect { case (n, es) if es.length >= 2 => n }.toSet
    var changed = true
    var rounds = 0
    while (changed) {
      val next = edges.filter(e => live(e._1) && live(e._2))
        .groupBy(_._1).collect { case (n, es) if es.length >= 2 => n }.toSet
      changed = next != live; live = next; rounds += 1
    }
    assert(rounds <= 8, s"fixture needed $rounds peel rounds — raise KCORE_ROUNDS")
    val got = run("g06_kcore").collect()
    val gotCore = got.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(gotCore == live, s"2-core mismatch: got $gotCore want $live")
    // every core member keeps core-degree >= k at the fixpoint; outsiders report 0
    got.foreach { r =>
      if (r.getBoolean(2)) assert(r.getLong(3) >= 2, s"${r.getLong(0)}: core degree")
      else assert(r.getLong(3) == 0, s"${r.getLong(0)}: non-member with core edges")
    }
  }

  test("t21: readability counts equal a scalar regex recomputation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val wordRe = "[a-z]+".r
    val sentRe = "[.!?]+".r
    val vowRe = "[aeiouy]+".r
    val got = run("t21_readability").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val text = docs(r.getLong(0))
      val words = wordRe.findAllIn(text.toLowerCase).toSeq
      val nW = words.length.toLong
      val nS = math.max(sentRe.findAllIn(text).length.toLong, 1L)
      val nY = words.map(w => math.max(vowRe.findAllIn(w).length.toLong, 1L)).sum
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((nW, nS, nY)),
        s"doc ${r.getLong(0)} counts")
      val wps6 = (2 * 1000000L * nW + nS) / (2 * nS)
      val spw6 = (2 * 1000000L * nY + nW) / (2 * nW)
      assert((r.getLong(4), r.getLong(5)) == ((wps6, spw6)), s"doc ${r.getLong(0)} micro ratios")
      val flesch = BigDecimal(206.835 - (1.015 * wps6.toDouble) / 1000000.0
        - (84.6 * spw6.toDouble) / 1000000.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(6) == flesch, s"doc ${r.getLong(0)} flesch")
    }
  }

  test("q90: bitemporal snapshots equal a scalar rebuild; restatement implies late data") {
    val V = 1705276800000000L; val T1 = 1705536000000000L; val T2 = 1706400000000000L
    val rows = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us",
        "CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .map { case (u, id, us, v6) =>
        (u, id, us, v6, us + (h32(id.toString) % 432000L) * 1000000L) }
    def snap(t: Long) = rows.filter(r => r._3 <= V && r._5 <= t)
      .groupBy(_._1).view.mapValues(_.maxBy(r => (r._3, r._2))._4).toMap
    val (s1, s2) = (snap(T1), snap(T2))
    val late = rows.filter(r => r._3 <= V && r._5 > T1 && r._5 <= T2)
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = run("q90_bitemporal").collect()
    assert(got.map(_.getLong(0)).toSet == (s1.keySet & s2.keySet))
    got.foreach { r =>
      val u = r.getLong(0)
      assert((r.getLong(1), r.getLong(2)) == ((s1(u), s2(u))), s"user $u snapshots")
      assert(r.getBoolean(3) == (s1(u) != s2(u)), s"user $u restated flag")
      assert(r.getLong(4) == late.getOrElse(u, 0L), s"user $u n_late")
      // a rewrite REQUIRES at least one late-arriving row
      if (r.getBoolean(3)) assert(r.getLong(4) > 0, s"user $u restated without late data")
    }
  }

  test("q91: attribution partitions purchase revenue exactly; scalar walk agrees") {
    val LOOK = 86400000000L
    val rows = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us",
        "CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6",
        "CAST(get_json_object(props, '$.k') AS BIGINT) AS k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val want = new scala.collection.mutable.HashMap[(String, Long), (Long, Long)]()
    rows.groupBy(_._1).values.foreach { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      var lastTouch: Option[(Long, String, Long)] = None // (us, type, k)
      sorted.foreach { e =>
        if (e._3 == "purchase") {
          val key = lastTouch match {
            case Some((tus, tt, tk)) if e._4 - tus <= LOOK => (tt, tk)
            case _ => ("none", -1L)
          }
          val (n, rev) = want.getOrElse(key, (0L, 0L))
          want(key) = (n + 1, rev + e._5)
        }
        if (e._3 == "click" || e._3 == "view") lastTouch = Some((e._4, e._3, e._6))
      }
    }
    val got = run("q91_attribution").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == want.toMap, s"attribution mismatch")
    // conservation: every purchase's revenue lands in exactly one bucket
    val allPurch = rows.filter(_._3 == "purchase")
    assert(got.values.map(_._1).sum == allPurch.length.toLong)
    assert(got.values.map(_._2).sum == allPurch.map(_._5).sum)
  }
}
