package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Semantic invariants + plan shape for the corpus-assembly pipeline
  * operators (p01-p04) and PII redaction (t07). The DuckDB oracle pins
  * exact values; these specs pin the properties that must survive a
  * cluster: packing is a consistent per-shard cumsum, decontamination
  * only ever flags train docs, splits are exhaustive and deterministic,
  * mixture shares sum to one, and every planted PII string is found.
  */
class PipelineSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("p01: packing is the sequential cumsum within each lang shard") {
    val rows = run("p01_sequence_packing")
      .select("lang", "doc_id", "n_tokens", "pack_id", "pack_offset")
      .collect()
    rows.groupBy(_.getString(0)).foreach { case (_, shard) =>
      var cum = 0L
      shard.sortBy(_.getLong(1)).foreach { r =>
        assert(r.getLong(3) == cum / 512, s"pack_id mismatch at doc ${r.getLong(1)}")
        assert(r.getLong(4) == cum % 512, s"pack_offset mismatch at doc ${r.getLong(1)}")
        cum += r.getLong(2)
      }
    }
  }

  test("p01: result is partition-count invariant") {
    val a = run("p01_sequence_packing").collect().toSeq
    val b = {
      val df = graft.Tables.documents(spark, sf0001).repartition(13)
      df.createOrReplaceTempView("___ignore") // force separate lineage
      run("p01_sequence_packing").collect().toSeq
    }
    assert(a == b)
  }

  /** JVM-side mirror of Ns.hash60: first 15 hex chars of md5 as a long. */
  private def hash60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("p02: flagged docs are train-side only and share at least one shingle") {
    val out = run("p02_decontamination").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val isEval = hash60Jvm(s"eval:$id") % 20 == 0
      assert(!isEval, s"eval doc $id flagged as contaminated train doc")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1)
    }
  }

  test("p03: splits partition every lang exactly and fractions sum to ~1") {
    val rows = run("p03_stratified_split").collect()
    val perLang = rows.groupBy(_.getString(0))
    val totalDocs = rows.map(_.getLong(2)).sum
    assert(totalDocs == 500) // documents table is 500 rows at every sf
    perLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
      val fracSum = rs.map(_.getDouble(4)).sum
      assert(math.abs(fracSum - 1.0) < 1e-5, s"$lang fracs sum to $fracSum")
      val train = rs.filter(_.getString(1) == "train").map(_.getLong(2)).sum
      assert(train.toDouble / rs.map(_.getLong(2)).sum > 0.6, s"$lang train share")
    }
  }

  test("p04: token shares sum to ~1 and sampling rates hit the target") {
    val rows = run("p04_domain_mix").collect()
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    rows.foreach { r =>
      val rate = r.getDouble(5)
      assert(rate > 0.0 && rate <= 1.0)
      // a rate below 1 means this source is over target; applying it
      // should bring the source to exactly the target share of tokens
      if (rate < 1.0)
        assert(math.abs(rate * r.getDouble(3) / 0.05 - 1.0) < 1e-3)
    }
  }

  test("t07: every planted email and phone is counted") {
    val rows = run("t07_pii_redact").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, s"doc ${r.getLong(0)}: planted email missed")
      assert(r.getLong(2) >= 1, s"doc ${r.getLong(0)}: planted phone missed")
    }
  }

  test("p02: decontamination joins on the shingle key, no cartesian") {
    val p = run("p02_decontamination").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("p04: mixture aggregation is partial before the shuffle") {
    val df = run("p04_domain_mix")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_"), p)
  }
}
