package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** The custom graft_normalize codegen expression: UAX #15 semantics
  * (composition, decomposition, idempotence, compatibility forms),
  * null handling, and clean analysis-time rejection of bad forms.
  */
class NormalizeTextSpec extends SparkSpec {

  private def registered = { GraftFunctions.register(spark); spark }

  private val eAcuteDecomposed = "e\u0301" // -> U+00E9 under NFC
  private val eAcuteComposed = "\u00E9"
  private val noPrecomposed = "k\u0337" // no precomposed form exists

  test("NFC composes combining marks; NFD decomposes; both idempotent") {
    val s = registered
    import s.implicits._
    val df = Seq((1L, s"x $eAcuteDecomposed $noPrecomposed"))
      .toDF("id", "t")
      .select(
        expr("graft_normalize(t, 'NFC')").as("nfc"),
        expr("graft_normalize(t, 'NFD')").as("nfd"),
        expr("graft_normalize(graft_normalize(t, 'NFC'), 'NFC')").as("nfc2"))
    val r = df.collect().head
    assert(r.getString(0) === s"x $eAcuteComposed $noPrecomposed")
    assert(r.getString(1) === s"x $eAcuteDecomposed $noPrecomposed")
    assert(r.getString(2) === r.getString(0), "NFC is idempotent")
  }

  test("NFKC folds compatibility characters NFC leaves alone") {
    val s = registered
    import s.implicits._
    // U+FB01 LATIN SMALL LIGATURE FI and U+2460 CIRCLED DIGIT ONE
    val df = Seq(("\uFB01le \u2460")).toDF("t")
      .select(expr("graft_normalize(t, 'NFC')").as("nfc"),
        expr("graft_normalize(t, 'NFKC')").as("nfkc"))
    val r = df.collect().head
    assert(r.getString(0) === "\uFB01le \u2460", "NFC preserves compatibility chars")
    assert(r.getString(1) === "file 1", "NFKC folds them")
  }

  test("null input -> null; codegen path runs and agrees") {
    val s = registered
    // non-foldable input so the projection cannot constant-fold away
    val out = s.range(2).toDF("id")
      .select(when(col("id") === 0, concat(lit("a "), lit(eAcuteDecomposed)))
        .as("t"))
      .select(expr("graft_normalize(t, 'NFC')").as("n"))
    assert(out.collect().map(r => Option(r.getString(0))).toSet ===
      Set(Some(s"a $eAcuteComposed"), None))
    // the projection stays inside whole-stage codegen
    val wscg = out.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
    assert(wscg.nonEmpty, out.queryExecution.executedPlan.toString)
  }

  test("bad arguments fail analysis cleanly") {
    val s = registered
    import s.implicits._
    val df = Seq((1L, "a")).toDF("id", "t")
    val e1 = intercept[AnalysisException] {
      df.select(expr("graft_normalize(t, 'NOPE')")).collect()
    }
    assert(e1.getMessage.contains("graft_normalize"))
    val e2 = intercept[AnalysisException] {
      df.select(expr("graft_normalize(id, 'NFC')")).collect()
    }
    assert(e2.getMessage.contains("graft_normalize"))
    val e3 = intercept[AnalysisException] {
      df.select(expr("graft_normalize(t, id)")).collect()
    }
    assert(e3.getMessage.contains("graft_normalize"))
  }
}
