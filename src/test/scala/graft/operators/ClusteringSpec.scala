package graft.operators

import graft.SparkSpec

/** k-means (c01) and repetition-signal (t08) invariants. The DuckDB
  * oracle pins exact values; these pin the distributed-correctness
  * properties: assignments are exhaustive and shuffle-partitioning-
  * invariant, and the narrow per-row fractions agree with a scalar
  * recomputation from the raw text.
  */
class ClusteringSpec extends SparkSpec {

  test("c01: every vector gets exactly one cluster and all K survive") {
    val rows = graft.SparkEntry.queries("c01_kmeans")(spark, sf0001).collect()
    assert(rows.length == 500)
    assert(rows.map(_.getLong(0)).distinct.length == 500)
    val clusters = rows.map(_.getInt(1)).toSet
    assert(clusters == Set(0, 1, 2, 3), s"clusters: $clusters")
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("c01: result is shuffle-partition-count invariant") {
    def runWith(n: String) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try graft.SparkEntry.queries("c01_kmeans")(spark, sf0001).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(runWith("3") == runWith("11"))
  }

  /** Spark's round(col, 6): exact-binary BigDecimal, HALF_UP. */
  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("t08: fractions agree with a scalar recomputation from raw text") {
    val byDoc = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = graft.SparkEntry.queries("t08_repetition")(spark, sf0001).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val toks = byDoc(r.getLong(0)).split(" ", -1).toSeq
      def dupFrac(k: Int): Double = {
        val grams = toks.sliding(k).map(_.mkString(" ")).toSeq
        val v = (grams.size - grams.distinct.size).toDouble / grams.size
        r6(v)
      }
      val top = toks.groupBy(identity).values.map(_.size).max
      assert(r.getLong(1) == toks.size)
      assert(r.getDouble(2) == dupFrac(2), s"doc ${r.getLong(0)} bigram")
      assert(r.getDouble(3) == dupFrac(3), s"doc ${r.getLong(0)} trigram")
      assert(r.getDouble(4) == r6(top.toDouble / toks.size),
        s"doc ${r.getLong(0)} top token")
    }
  }

  test("t08: the plan is a pure narrow projection (no exchange before the sort)") {
    val p = graft.SparkEntry.queries("t08_repetition")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // only the final presentation orderBy may shuffle; the scan feeds
    // the projection directly
    val scanIdx = p.indexOf("FileScan parquet")
    assert(scanIdx >= 0, p)
    assert(!p.substring(scanIdx).contains("Exchange"), p.substring(scanIdx))
  }
}
