package graft.operators

import graft.SparkSpec

/** Differential for the round-5 fifty-eighth wave (q160 sequential
  * pattern support).
  */
class Round6fOpsSpec extends SparkSpec {

  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf0001)

  test("q160: pair and triple supports equal a scalar subsequence replay") {
    val ev = graft.Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_type", "unix_micros(ts)").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val nUsers = byUser.size.toLong
    val types = ev.map(_._2).distinct.sorted
    def hasPair(g: Seq[(Long, String, Long)], a: String, b: String) = {
      val as = g.filter(_._2 == a).map(_._3)
      val bs = g.filter(_._2 == b).map(_._3)
      as.nonEmpty && bs.nonEmpty && as.min < bs.max
    }
    def hasTriple(g: Seq[(Long, String, Long)], a: String, b: String, c: String) = {
      val as = g.filter(_._2 == a).map(_._3)
      val cs = g.filter(_._2 == c).map(_._3)
      as.nonEmpty && cs.nonEmpty &&
        g.exists(e => e._2 == b && e._3 > as.min && e._3 < cs.max)
    }
    val wantPairs = for (a <- types; b <- types) yield {
      val sup = byUser.count { case (_, g) => hasPair(g.toSeq, a, b) }.toLong
      (s"$a>$b", 2, sup, sup * 1000000L / nUsers)
    }
    val wantTriples = for (a <- types; b <- types; c <- types) yield {
      val sup = byUser.count { case (_, g) => hasTriple(g.toSeq, a, b, c) }.toLong
      (s"$a>$b>$c", 3, sup, sup * 1000000L / nUsers)
    }
    val want = (wantPairs.filter(_._3 > 0) ++ wantTriples.filter(_._3 > 0))
      .sortBy(r => (r._2, r._1)).toSeq
    val got = run("q160_seq_patterns").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want, s"seq mismatch: got ${got.take(3)} want ${want.take(3)}")
    // subsequence support is monotone: every triple's support is bounded
    // by its prefix pair's
    val pairSup = got.filter(_._2 == 2).map(r => r._1 -> r._3).toMap
    got.filter(_._2 == 3).foreach { r =>
      val ab = r._1.split(">").take(2).mkString(">")
      assert(r._3 <= pairSup.getOrElse(ab, 0L), s"${r._1} exceeds $ab")
    }
  }
}
