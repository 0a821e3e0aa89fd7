package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE train/encode (t18/t19) against an independent scalar BPE: the
  * classic merge loop (count adjacent pairs over the word-frequency
  * table, merge the winner greedily left-to-right) implemented directly
  * on Scala collections, no delimited-string `replace` trick. Proves
  * the distributed query computes canonical BPE, not merely something
  * self-consistent with its oracle.
  */
class BpeSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  /** (word -> corpus count) from the raw fixture. */
  private lazy val wordCounts: Map[String, Long] =
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Scalar greedy BPE: returns the merge list and final per-word
    * symbol sequences.
    */
  private def scalarBpe(rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var seqs: Map[String, Seq[String]] =
      wordCounts.keys.map(w => w -> (w.map(_.toString) :+ "_")).toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (k <- 1 to rounds) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- seqs; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) =
          pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + wordCounts(w)
      val ((l, r), c) = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      merges += ((k, l, r, c))
      seqs = seqs.map { case (w, syms) =>
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        w -> out.result()
      }
    }
    (merges.result(), seqs)
  }

  test("t18: learned merges equal scalar greedy BPE (order, pairs, counts)") {
    val (expected, _) = scalarBpe(Bpe.Rounds)
    val got = run("t18_bpe_train").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == expected)
    // multi-symbol merges must appear: the point of BPE over bigrams
    assert(got.exists { case (_, l, r, _) => l.length > 1 || r.length > 1 },
      "no merge consumed a previously merged symbol — rounds too few to exercise BPE")
  }

  test("t19: per-doc token counts equal scalar re-encoding of every document") {
    val (_, seqs) = scalarBpe(Bpe.Rounds)
    val tokLen: Map[String, Long] = seqs.map { case (w, s) => w -> s.length.toLong }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run("t19_bpe_encode").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == docs.keySet)
    for ((id, text) <- docs) {
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      val exp = (ws.length.toLong,
        ws.map(_.length.toLong + 1).sum,
        ws.map(tokLen).sum)
      assert(got(id) == exp, s"doc $id")
    }
    // compression must be strictly < 1 somewhere: merges actually shrink
    val comp = run("t19_bpe_encode").agg(min("compression")).collect()(0).getDouble(0)
    assert(comp < 1.0)
  }
}
