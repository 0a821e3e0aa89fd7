package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants for the round-2 additions: matryoshka retrieval (s05),
  * incremental dedup (p06), quality filter (p07), windowed top-k (st04).
  */
class PipelineOps2Spec extends SparkSpec {

  test("s05: 5 truncated-rank rows per query, full-dim cosine attached") {
    val rows = graft.SparkEntry.queries("s05_matryoshka")(spark, sf0001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5), s"q$qid ranks")
      val trunc = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(trunc.sameElements(trunc.sorted(Ordering[Double].reverse)), s"q$qid order")
      rs.foreach(r => assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9))
    }
  }

  test("p06: statuses match a scalar recomputation over the hashes") {
    val hs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), sha2(col("text"), 256).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val existing = hs.filter(_._1 < 400).groupBy(_._2).map { case (h, xs) => h -> xs.map(_._1).min }
    val batch = hs.filter(_._1 >= 400)
    val batchMin = batch.groupBy(_._2).map { case (h, xs) => h -> xs.map(_._1).min }
    val expected = batch.map { case (id, h) =>
      if (existing.contains(h)) (id, "dup_of_existing", Some(existing(h)))
      else if (id != batchMin(h)) (id, "dup_in_batch", Some(batchMin(h)))
      else (id, "accepted", None)
    }.toSet
    val got = graft.SparkEntry.queries("p06_incremental_dedup")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == expected)
  }

  test("p07: keep iff no reasons, and the short-doc rule fires correctly") {
    val texts = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.SparkEntry.queries("p07_quality_filter")(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getBoolean(1) == r.getString(2).isEmpty)
      val nTok = texts(r.getLong(0)).split(" ", -1).length
      assert(r.getString(2).contains("too_short") == (nTok < 5), s"doc ${r.getLong(0)}")
    }
  }

  test("t11: chunks tile each document with the promised stride and overlap") {
    val nChars = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = graft.SparkEntry.queries("t11_chunking")(spark, sf0001).collect()
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val n = nChars(doc)
      val expected = ((n - 1) / 150 + 1).toInt
      assert(rs.length == expected, s"doc $doc chunks")
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (0 until expected))
      // every chunk except possibly the last is full-size
      sorted.init.foreach(r => assert(r.getLong(2) == 200 ||
        150L * r.getInt(1) + r.getLong(2) == n, s"doc $doc idx ${r.getInt(1)}"))
    }
  }

  test("t12: likelihood is negative, ppl >= 1, and short docs score harsher ppl variance") {
    val rows = graft.SparkEntry.queries("t12_lm_perplexity")(spark, sf0001).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getDouble(2) < 0, s"doc ${r.getLong(0)} ll")
      assert(r.getDouble(3) >= 1.0, s"doc ${r.getLong(0)} ppl")
      // sanity bound: ppl can exceed the 31-word vocab size only when a
      // doc leans on rare tokens; anything far beyond is a math bug
      assert(r.getDouble(3) <= 100.0, s"doc ${r.getLong(0)} ppl too high")
    }
  }

  test("s06: every vector gets 4 codes in range and a nonnegative error") {
    val rows = graft.SparkEntry.queries("s06_pq")(spark, sf0001).collect()
    assert(rows.length == 500)
    val tuples = rows.map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    tuples.foreach { t =>
      Seq(t._1, t._2, t._3, t._4).foreach(c => assert(c >= 0 && c < 4))
    }
    assert(tuples.distinct.length > 10, "codebooks must actually partition the corpus")
    rows.foreach(r => assert(r.getDouble(5) >= 0))
  }

  test("st04: at most 3 contiguous ranks per hour, counts non-increasing") {
    val rows = graft.SparkEntry.queries("st04_window_topk")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (hour, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length) && rs.length <= 3, s"$hour")
      val counts = sorted.map(_.getLong(3))
      assert(counts.sameElements(counts.sorted(Ordering[Long].reverse)), s"$hour counts")
    }
  }
}
