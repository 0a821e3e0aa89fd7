package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.functions._

/** The custom word_ngrams Generator: row parity with the built-in
  * split+explode composition, lazy plan shape (GenerateExec), and clean
  * analysis-time rejection of bad arguments.
  */
class WordNGramsSpec extends SparkSpec {

  private def registered = { GraftFunctions.register(spark); spark }

  test("word_ngrams(text, 2) matches the built-in split+posexplode composition") {
    val s = registered
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "single"),
      (3L, ""),
      (4L, "x y")).toDF("doc_id", "text")
    val viaGen = docs.select(col("doc_id"), expr("word_ngrams(text, 2)"))
    val viaBuiltin = docs
      .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      .select(col("doc_id"), posexplode(expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)), (x, i) -> concat(x, ' ', w[i + 1]))")))
      .select(col("doc_id"), col("pos").cast("int").as("pos"), col("col").as("ngram"))
    assert(viaGen.collect().toSet === viaBuiltin.collect().toSet)
    // "single" (one word) and "" (one empty token) emit no bigrams
    assert(viaGen.filter(col("doc_id").isin(2L, 3L)).count() === 0)
    // positions are 0-based and in order
    assert(viaGen.filter(col("doc_id") === 1L).orderBy("pos")
      .select("ngram").as[String].collect().toSeq === Seq("a b", "b c", "c d"))
  }

  test("trigrams and null text") {
    val s = registered
    import s.implicits._
    val docs = Seq((1L, Some("p q r s")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), expr("word_ngrams(text, 3)"))
      .orderBy("doc_id", "pos").select("ngram").as[String].collect().toSeq
    assert(out === Seq("p q r", "q r s"))
  }

  test("plans as GenerateExec (streaming expansion, no array materialization)") {
    val s = registered
    import s.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(col("doc_id"), expr("word_ngrams(text, 2)"))
    val gens = df.queryExecution.executedPlan.collect {
      case g: GenerateExec => g }
    assert(gens.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(gens.head.boundGenerator.isInstanceOf[WordNGrams])
  }

  test("bad arguments fail analysis cleanly, not with ClassCastException") {
    val s = registered
    import s.implicits._
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // non-integral n
    val e1 = intercept[AnalysisException] {
      docs.select(expr("word_ngrams(text, 'x')")).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("word_ngrams"))
    // n < 1
    val e2 = intercept[AnalysisException] {
      docs.select(expr("word_ngrams(text, 0)")).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("word_ngrams"))
    // non-string input
    val e3 = intercept[AnalysisException] {
      docs.select(expr("word_ngrams(doc_id, 2)")).collect()
    }
    assert(e3.getMessage.toLowerCase.contains("word_ngrams"))
  }
}
