package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Ns
import org.apache.spark.sql.functions._

/** char_hist16 must reproduce EXACTLY the built-in spelling it replaces
  * in m04 (`ascii(ch) div 16` binning, bins 0..15) — that equality on
  * the real documents table is what keeps the DuckDB oracle valid.
  */
class CharHistSpec extends SparkSpec {

  private def builtinSpelling(c: String): String =
    s"""transform(sequence(0, 15),
        b -> CAST(size(filter(transform(split($c, ''),
                                        ch -> ascii(ch) div 16),
                              x -> x = b)) AS BIGINT))"""

  test("char_hist16 == explode/ascii spelling on every document") {
    Ns.registerFast(spark)
    val mismatches = Tables.documents(spark, sf0001)
      .select(expr("char_hist16(text)").as("fast"),
        expr(builtinSpelling("text")).as("slow"))
      .filter(col("fast") =!= col("slow"))
      .count()
    assert(mismatches == 0)
  }

  test("non-ASCII codepoints bin like ascii(): <256 counted, >=256 dropped") {
    Ns.registerFast(spark)
    // 'é' = U+00E9 -> bin 14; '€' = U+20AC -> bin 527, outside 0..15.
    val r = spark.sql("SELECT char_hist16('abé€') AS h").head()
      .getSeq[Long](0)
    assert(r.sum == 3 && r(6) == 2 && r(14) == 1)
  }

  test("empty string is all zeros; null is null") {
    Ns.registerFast(spark)
    val r = spark.sql(
      "SELECT char_hist16('') AS e, char_hist16(CAST(NULL AS STRING)) AS n").head()
    assert(r.getSeq[Long](0).forall(_ == 0L) && r.isNullAt(1))
  }

  test("random strings (codepoints 1..255) match a scalar reference count") {
    Ns.registerFast(spark)
    val rnd = new scala.util.Random(7)
    val sp = spark
    import sp.implicits._
    val cases = Seq.fill(200)(
      (0 until rnd.nextInt(80)).map(_ => (rnd.nextInt(255) + 1).toChar).mkString)
    val got = cases.toDF("s").select(expr("char_hist16(s)").as("h"))
      .collect().map(_.getSeq[Long](0))
    cases.zip(got).foreach { case (s, h) =>
      val want = Array.fill(16)(0L)
      s.codePoints().forEach(cp => if ((cp >>> 4) < 16) want(cp >>> 4) += 1)
      assert(h == want.toSeq, s"mismatch on ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("m04's histogram phase plans no shuffle") {
    Ns.registerFast(spark)
    val plan = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        expr("transform(char_hist16(text), x -> CAST(x AS DOUBLE))").as("hist"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"histogram should be narrow:\n$plan")
  }
}
