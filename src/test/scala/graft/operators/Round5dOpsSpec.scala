package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-5 fourth-wave additions (s13 multi-probe LSH,
  * m08 shot boundaries, t23 Kneser-Ney, q94 CUSUM) — scalar differentials
  * plus the properties the oracle hash cannot name (probe-set dominance,
  * probability normalization, alarm/reset semantics).
  */
class Round5dOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("s13: multi-probe recall@5 dominates single-bucket s04 recall per query") {
    val exact = run("s01_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._2).toSet }
    val s04 = run("s04_ann_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rows) => q -> rows.map(_._2).toSet }
    val got = run("s13_multiprobe_lsh").collect()
    assert(got.nonEmpty)
    // recall5 column is self-consistent with the in_exact flags
    got.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val want = rows.count(_.getBoolean(4)).toDouble / 5.0
      assert(rows.forall(_.getDouble(5) == want), s"recall5 inconsistent for $qid")
      // dominance: s13's candidate set contains s04's bucket, so its
      // exact-top-5 hits can only grow
      val r13 = rows.map(_.getLong(2)).toSet.intersect(exact(qid)).size
      val r04 = s04.getOrElse(qid, Set.empty[Long]).intersect(exact(qid)).size
      assert(r13 >= r04, s"qid $qid: multi-probe recall $r13 < single-bucket $r04")
    }
  }

  test("m08: shot boundaries equal a scalar histogram-L1 walk") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8")))
    val want = docs.flatMap { case (id, bytes) =>
      val nf = bytes.length / 32
      val hists = Array.tabulate(nf) { f =>
        val h = new Array[Int](16)
        for (i <- f * 32 until f * 32 + 32) h((bytes(i) & 0xff) / 16) += 1
        h
      }
      var shot = 0
      (1 until nf).map { f =>
        val l1 = (0 until 16).map(b => math.abs(hists(f)(b) - hists(f - 1)(b))).sum
        if (l1 >= 24) shot += 1
        (id, f, l1, l1 >= 24, shot)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val got = run("m08_shot_boundary").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3), r.getInt(4))).toSeq
    assert(got == want, s"shot walk mismatch: got ${got.take(3)} want ${want.take(3)}")
  }

  test("t23: doc scores equal a scalar Kneser-Ney model; probabilities normalize") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val bigrams = docs.flatMap { case (id, t) =>
      t.sliding(2).filter(_.length == 2).map(p => (id, p(0), p(1)))
    }
    val cvw = bigrams.groupBy(b => (b._2, b._3)).map { case (k, g) => k -> g.length.toLong }
    val cv = cvw.groupBy(_._1._1).map { case (v, g) => v -> g.values.sum }
    val n1f = cvw.groupBy(_._1._1).map { case (v, g) => v -> g.size.toLong }
    val n1b = cvw.groupBy(_._1._2).map { case (w, g) => w -> g.size.toLong }
    val nbb = cvw.size.toLong
    def p(v: String, w: String): Double =
      (4.0 * cvw((v, w)) - 3) / (4 * cv(v)) + (3.0 * n1f(v) * n1b(w)) / (4.0 * cv(v) * nbb)
    // KN with d=3/4 is a proper conditional distribution: for each
    // context v, sum over OBSERVED continuations w of p(w|v) plus the
    // reserved mass d*N1+(v.)/c(v) spread over unseen w sums to <= 1
    // and the observed part alone stays below 1
    cv.keys.take(50).foreach { v =>
      val seen = cvw.keys.filter(_._1 == v).map(_._2)
      val mass = seen.map(w => p(v, w)).sum
      assert(mass <= 1.0 + 1e-9, s"context $v: observed KN mass $mass > 1")
    }
    val want = docs.flatMap { case (id, t) =>
      val bs = t.sliding(2).filter(_.length == 2).toSeq
      if (bs.isEmpty) None
      else {
        val lls = bs.map(b => math.round(math.log(p(b(0), b(1))) * 1e6))
        Some((id, bs.length.toLong, lls.sum))
      }
    }.sortBy(_._1).toSeq
    val got = run("t23_kneser_ney").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"KN ll mismatch: got ${got.take(3)} want ${want.take(3)}")
  }

  test("q94: per-user walk equals a scalar CUSUM with alarm reset") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "CAST(CAST(value AS DECIMAL(12,2)) * 1000000 AS BIGINT) AS v6")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (u, rows) =>
      val vals = rows.sortBy(r => (r._2, r._3)).map(_._4)
      val mean6 = vals.sum / vals.length
      var s = 0L; var nal = 0; var first: Option[Int] = None; var maxs = 0L
      vals.zipWithIndex.foreach { case (x, i) =>
        val clipped = math.max(0L, s + x - mean6 - 20000000L)
        maxs = math.max(maxs, clipped)
        if (clipped > 200000000L) { nal += 1; if (first.isEmpty) first = Some(i + 1); s = 0L }
        else s = clipped
      }
      (u, vals.length.toLong, mean6, nal, first, maxs)
    }
    val got = run("q94_cusum").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getLong(5))).toSeq
    assert(got == want, s"cusum mismatch: got ${got.take(3)} want ${want.take(3)}")
    // the fixture must actually exercise the alarm path somewhere
    assert(got.exists(_._4 > 0), "no user ever alarmed — thresholds never bite")
  }
}
