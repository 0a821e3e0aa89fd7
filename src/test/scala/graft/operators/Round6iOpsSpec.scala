package graft.operators

import graft.SparkSpec

/** Differentials for the round-6 wave (d17 windowed substring dedup, t39
  * perplexity filter, q160 Bradley-Terry, c10 linkage threshold curve):
  * each product query vs an independent scalar replay at sf0.001.
  */
class Round6iOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  private def docs: Seq[(Long, Array[String])] =
    graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "split(text, ' ')").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray)).toSeq

  test("d17: per-doc duplicated-window stats equal a scalar replay on raw strings") {
    val W = 8
    val wins = docs.map { case (id, toks) =>
      id -> (if (toks.length < W) Array.empty[String]
             else (0 to toks.length - W).map(i => toks.slice(i, i + W).mkString(" ")).toArray)
    }
    // global occurrence counts on the RAW window strings — the product
    // counts 52-bit hashes, so equality also witnesses zero collisions
    // at fixture scale
    val occ = wins.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val want = wins.sortBy(_._1).map { case (id, ws) =>
      val n = ws.length.toLong
      val dup = ws.count(w => occ(w) >= 2).toLong
      (id, n, dup, if (n == 0) 0L else dup * 1000000L / n)
    }
    val got = run("d17_window_substring_dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"d17 mismatch: got ${got.take(3)} want ${want.take(3)}")
    // the corpus has real duplicated text (exact-dup docs exist), so the
    // signal must be non-trivial in both directions
    assert(want.exists(_._3 > 0L), "no duplicated window found at all")
    assert(want.exists(w => w._2 > 0L && w._3 < w._2), "every window duplicated?!")
  }

  test("t39: quintile buckets equal a scalar replay of the unigram-surprisal LM") {
    val toks = docs.flatMap { case (id, ts) => ts.map(id -> _) }
    val cnt = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = toks.size.toLong
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val sur = cnt.map { case (t, c) => t -> halfUp(math.log(n.toDouble / c.toDouble) * 1e6) }
    val scored = docs.map { case (id, ts) =>
      val s = ts.map(sur).sum
      val m = ts.length.toLong
      (id, (2 * s + m) / (2 * m)) // round-half-up mean (all terms >= 0)
    }.sortBy(x => (x._2, x._1))
    // ntile(5): first (len mod 5) buckets get ceil(len/5)
    val len = scored.length
    val base = len / 5; val extra = len % 5
    val wantBuckets = (1 to 5).flatMap { b =>
      val sz = base + (if (b <= extra) 1 else 0)
      Seq.fill(sz)(b)
    }
    val perBucket = scored.zip(wantBuckets).groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (b, xs) =>
        (b, xs.size.toLong, xs.map(_._1._2).min, xs.map(_._1._2).max)
      }
    val got = run("t39_perplexity_filter").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == perBucket, s"t39 mismatch: got $got want $perBucket")
    // buckets are ordered by score: non-overlapping ranges
    got.sliding(2).foreach { case Seq(a, b) => assert(a._4 <= b._3) case _ => }
  }

  test("q160: strengths equal a scalar BigInt replay of 3 MM sweeps; ranking follows wins-per-match") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.part(spark, sf0001),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("l_orderkey", "l_extendedprice", "p_brand").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    val matches = li.groupBy(_._1).values.flatMap { rows =>
      val mx = rows.map(_._2).max; val mn = rows.map(_._2).min
      val wb = rows.filter(_._2 == mx).map(_._3).min
      val lb = rows.filter(_._2 == mn).map(_._3).min
      if (wb != lb) Some((wb, lb)) else None
    }.toSeq
    val pd = (matches ++ matches.map(m => (m._2, m._1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap // (i,j) -> n
    val brands = pd.keys.map(_._1).toSeq.distinct.sorted
    val wins = matches.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pm = brands.map(b => b -> BigInt(1000000)).toMap
    for (_ <- 1 to 3) {
      val denom = brands.map { b =>
        b -> pd.collect { case ((i, j), nn) if i == b =>
          BigInt(nn) * BigInt("1000000000000") / (pm(i) + pm(j)).max(1)
        }.sum
      }.toMap
      pm = brands.map { b =>
        b -> BigInt(wins.getOrElse(b, 0L)) * BigInt("1000000000000") / denom(b).max(1)
      }.toMap
    }
    val mt = brands.map(b => b -> pd.collect { case ((i, _), nn) if i == b => nn }.sum).toMap
    val want = brands
      .map(b => (b, mt(b), wins.getOrElse(b, 0L), pm(b).toLong))
      .sortBy(x => (-x._4, x._1))
      .zipWithIndex.map { case ((b, m, w, p), k) => (b, m, w, p, k + 1) }
    val got = run("q167_bradley_terry").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toSeq
    assert(got == want, s"q160 mismatch: got ${got.take(3)} want ${want.take(3)}")
    // sanity: the top-ranked brand's win rate is >= the bottom-ranked one's
    val top = got.head; val bot = got.last
    assert(top._3 * bot._2 >= bot._3 * top._2, "BT ranking inverted win rates")
  }

  test("c10: component curve equals a scalar union-find at each threshold; curve is monotone") {
    val pairs = Dedup.minhashPairs(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val ids = docs.map(_._1)
    def cc(thr: Double): (Long, Long, Long) = {
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.filter(_._3 >= thr).foreach { case (a, b, _) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val sizes = ids.groupBy(find).values.map(_.size).filter(_ >= 2).toSeq
      (sizes.size.toLong, sizes.map(_.toLong).sum, if (sizes.isEmpty) 0L else sizes.max.toLong)
    }
    val want = Seq(500000L -> 0.5, 750000L -> 0.75, 875000L -> 0.875).map {
      case (ppm, t) => val (nc, nd, mx) = cc(t); (ppm, nc, nd, mx)
    }
    val got = run("c10_linkage_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"c10 mismatch: got $got want $want")
    // single-link monotonicity: clustered docs and max cluster shrink as t rises
    got.sliding(2).foreach {
      case Seq(lo, hi) => assert(lo._3 >= hi._3 && lo._4 >= hi._4)
      case _ =>
    }
  }
}
