package graft.functions

import graft.SparkSpec
import graft.operators.Ns
import org.apache.spark.sql.functions._

/** Randomized-property checks (seeded, deterministic): the native
  * expressions must equal a scalar left-fold reference on arbitrary
  * inputs, and the convergence accumulator must behave like elementwise
  * max under any merge order (including retry duplication).
  */
class VectorPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def vec(): Array[Double] =
    Array.fill(rnd.nextInt(17))(rnd.nextDouble() * 2000 - 1000)

  test("vec_dot / vec_l2sq equal scalar sequential folds on random vectors") {
    Ns.registerFast(spark)
    val sp = spark
    import sp.implicits._
    val cases = Seq.fill(100)((vec(), vec()))
    val df = cases.toDF("a", "b")
      .select(expr("vec_dot(a, b)").as("dot"), expr("vec_l2sq(a, b)").as("l2"))
    val got = df.collect()
    cases.zip(got).foreach { case ((a, b), row) =>
      if (a.length != b.length) {
        // HOF-faithful contract: ragged inputs yield NULL (zip_with pads
        // with null, nulling the fold), never a silently truncated dot
        assert(row.isNullAt(0), s"ragged dot must be NULL on ${a.toSeq} / ${b.toSeq}")
        assert(row.isNullAt(1), s"ragged l2 must be NULL on ${a.toSeq} / ${b.toSeq}")
      } else {
        val n = a.length
        val dot = (0 until n).foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
        val l2 = (0 until n).foldLeft(0.0)((acc, i) => acc + (a(i) - b(i)) * (a(i) - b(i)))
        assert(java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
          java.lang.Double.doubleToLongBits(dot), s"dot mismatch on ${a.toSeq} / ${b.toSeq}")
        assert(java.lang.Double.doubleToLongBits(row.getDouble(1)) ==
          java.lang.Double.doubleToLongBits(l2), s"l2 mismatch on ${a.toSeq} / ${b.toSeq}")
      }
    }
  }

  test("MaxVecAccumulator merge is order-insensitive and retry-idempotent") {
    import graft.laplace.MaxVecAccumulator
    (1 to 50).foreach { _ =>
      val parts = List.fill(3)(List.fill(4)(rnd.nextDouble() * 100))
      def build(vals: List[List[Double]]): Seq[Double] = {
        val acc = new MaxVecAccumulator(4)
        vals.foreach(_.zipWithIndex.foreach { case (v, i) => acc.add((i, v)) })
        acc.value.toSeq
      }
      val fwd = build(parts)
      assert(fwd == build(parts.reverse))
      assert(fwd == build(parts ++ parts)) // task-retry duplication
      assert(fwd == (0 until 4).map(i => parts.map(_(i)).max))
    }
  }
}
