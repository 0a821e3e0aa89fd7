package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent checks for the north-star operators beyond the DuckDB
  * oracle: algorithmic properties the hash-compare can't express, and
  * the rows-only queries (q15, m02) that have no oracle.
  */
class NsOperatorsSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("d01: every doc maps to exactly one canonical; canonicals are self-canonical") {
    val df = run("d01_exact_dedup").cache()
    assert(df.count() == 500)
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
    val canon = df.filter(col("is_canonical"))
    assert(canon.filter(col("canonical_id") =!= col("doc_id")).count() == 0)
    df.unpersist()
  }

  test("d02: LSH recall >= 90% on pairs with shingle-jaccard >= 0.95") {
    // Exact all-pairs shingle jaccard (no lang blocking — unlike d04).
    // At j ~ 0.99 a (16,4,4) LSH collides with prob ~1-2e-6 per pair, so
    // requiring 90% recall is robust, not flaky.
    val sh = graft.Tables.documents(spark, sf0001)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))).as("s"))
    val sets = sh.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    val ids = sets.keys.toSeq.sorted
    val exact = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = sets(ids(i)); b = sets(ids(j))
      inter = (a & b).size
      if inter.toDouble / (a.size + b.size - inter) >= 0.95
    } yield (ids(i), ids(j))).toSet
    val cand = run("d02_minhash_lsh")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain near-dups")
    val recall = (exact & cand).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; missing: ${exact -- cand}")
  }

  test("d02: est_jaccard is 1.0 for identical shingle sets") {
    val full = run("d02_minhash_lsh").filter(col("est_jaccard") === 1.0).count()
    assert(full >= 6) // the planted near-dup pairs
  }

  test("d03: near-dup docs (est_jaccard >= 0.95) have small simhash hamming") {
    val dups = run("d02_minhash_lsh").filter(col("est_jaccard") >= 0.95)
      .select("doc_a", "doc_b").collect()
    assert(dups.nonEmpty, "test data should contain near-dup candidates")
    val fp = run("d03_simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-token-edit near-dups flip at most a few fingerprint bits
    val hams = dups.map { r =>
      java.lang.Long.bitCount(fp(r.getLong(0)) ^ fp(r.getLong(1)))
    }
    assert(hams.count(_ <= 6).toDouble / hams.length >= 0.8,
      s"hammings: ${hams.mkString(",")}")
  }

  test("q15: sketch stays inside its 3-sigma bound and exact counts match q14") {
    val rows = run("q15_approx_distinct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} parts sketch out of bounds")
      assert(r.getBoolean(4), s"${r.getString(0)} orders sketch out of bounds")
    }
    val exact = run("q14_distinct_agg").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == exact(r.getString(0)))
    }
  }

  test("d05b: LSH-bucketed near-dup vs scalar all-pairs truth; d05 is its sampled stratum") {
    // ground truth: a scalar all-pairs replay (the product queries no
    // longer contain ANY all-pairs join — d05 is sample-bound since r9,
    // so the n² ground truth lives only here, on the 500-row fixture)
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val nrm = rows.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val exact = (for {
      (ia, va) <- rows; (ib, vb) <- rows if ia < ib
      c = round6(dot(va, vb) / (nrm(ia) * nrm(ib))) if c >= 0.35
    } yield (ia, ib)).toSet
    val lsh = run("d05b_embedding_neardup_lsh").collect()
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lshPairs.subsetOf(exact), s"false positives: ${lshPairs -- exact}")
    lsh.foreach(r => assert(r.getDouble(2) >= 0.35))
    // deterministic (md5 hyperplanes, fixed data): measured 0.941 on the
    // adversarial near-orthogonal synthetic corpus
    val recall = (exact & lshPairs).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
    // d05 (the fixed-count sampled exact arm) is exactly the stratum of
    // the truth touching the 64 smallest-md5-rank ids — no more, no less
    val md = java.security.MessageDigest.getInstance("MD5")
    def mrank(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val smp = rows.map(_._1).sortBy(id => (mrank(id), id)).take(64).toSet
    val wantSampled = exact.filter { case (a, b) => smp(a) || smp(b) }
    val gotSampled = run("d05_embedding_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotSampled === wantSampled)
  }

  test("s02: IVF top-k has nonzero recall vs brute force and valid ranks") {
    val bf = run("s01_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = run("s02_ann_ivf").collect()
    val ivfPairs = ivf.map(r => (r.getLong(0), r.getLong(2))).toSet
    // every query has exactly TOPK=5 ranked results
    val perQ = ivf.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq)
    perQ.foreach { case (q, ranks) => assert(ranks == (1 to 5), s"query $q ranks $ranks") }
    val recall = (bf & ivfPairs).size.toDouble / bf.size
    assert(recall > 0.0, "IVF should find at least some true neighbors")
  }

  test("s09: IVFPQ ADC ranking — 5 ranks/query, no self, distances ascend") {
    // recall floors are fixture-limited here for the same reason as s02
    // (labels are geometrically uncorrelated, so any label-bucketed
    // coarse quantizer caps recall); the DuckDB oracle is the numeric
    // differential — this pins the ranking contract.
    val rows = run("s09_ann_ivfpq").collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size == 10) // vec_id % 50 == 0 queries
    perQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to 5), s"query $q ranks")
      assert(!rs.exists(_.getLong(2) == q), s"query $q returned itself")
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        s"query $q ADC distances not ascending: $byRank")
      rs.foreach(r => assert(r.getDouble(3) >= 0.0))
    }
  }

  test("d08: blocked levenshtein pairs match a scalar recompute of the same contract") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val titles = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "substr(text, 1, 24) AS title").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val expected = (for {
      i <- titles.indices.iterator; j <- (i + 1) until titles.length
      (ida, ta) = titles(i); (idb, tb) = titles(j)
      if ta.take(4) == tb.take(4) && math.abs(ta.length - tb.length) <= 2
      d = lev(ta, tb) if d <= 2
    } yield (ida, idb, d)).toSet
    val got = run("d08_editdist_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("t01: corpus-trained lang-id beats the 1/|langs| random baseline") {
    val df = run("t01_lang_id").cache()
    val acc = df.filter(col("correct")).count().toDouble / df.count()
    df.unpersist()
    // word-soup text shares one vocabulary across langs; the NB model
    // still must do no worse than random guessing by construction
    assert(acc >= 0.2 - 0.05, s"accuracy $acc")
  }

  test("q24: t-digest lands in the exact-rank window; exact percentiles match q17") {
    val rows = run("q24_approx_percentile").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"${r.getString(0)} p50 sketch out of rank window")
      assert(r.getBoolean(4), s"${r.getString(0)} p95 sketch out of rank window")
    }
    val exact = run("q17_percentiles").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    rows.foreach { r =>
      assert((r.getDouble(1), r.getDouble(2)) == exact(r.getString(0)), r.getString(0))
    }
  }

  test("m02: byte features are deterministic, in-range, and self-consistent") {
    val a = run("m02_media_features").collect()
    val b = run("m02_media_features").collect()
    assert(a.sameElements(b))
    assert(a.length == 500)
    a.foreach { r =>
      val n = r.getInt(1); val sum = r.getLong(2); val sumsq = r.getLong(3)
      assert(r.getDouble(6) == sum.toDouble / n) // mean from exact sums
      assert(r.getDouble(7) == (n.toLong * sumsq - sum * sum).toDouble / (n.toLong * n))
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 255)
      assert(r.getDouble(7) >= 0)
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 256) // distinct bytes
      assert(r.getInt(5) >= 0 && r.getInt(5) <= 255) // first byte
    }
  }

  test("m02: extractFeatures respects partitioning (no shuffle) and batch shape") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(spark, sf0001).repartition(7)
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 16)
    assert(feats.rdd.getNumPartitions == 7)
    assert(feats.count() == 500)
    // feature dim fixed at 8
    assert(feats.collect().forall(_.feature.length == 8))
  }
}
