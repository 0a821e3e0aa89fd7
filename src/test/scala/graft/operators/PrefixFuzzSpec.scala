package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded fuzz harness for Prefix.orderStats: many small random shapes
  * (empty / single-row / all-ties / skewed groups / n < P), each
  * checked bit-for-bit against the `Window` spelling it replaces, under
  * a random shuffle-partition count. Complements PrefixSpec's directed
  * cases — the sort keys deliberately collide hard so range-partition
  * boundaries land inside tie runs, and group domains are tiny so some
  * groups are empty on some partitions. Deterministic: fixed seed, no
  * wall-clock or JVM-dependent input anywhere.
  */
class PrefixFuzzSpec extends SparkSpec {

  test("orderStats equals the Window spelling on 25 seeded random shapes") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260816L)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (c <- 1 to 25) {
        val n = rnd.nextInt(5) match {
          case 0 => rnd.nextInt(3)            // empty / near-empty
          case _ => 1 + rnd.nextInt(400)
        }
        val gDom = rnd.nextInt(4)             // 0 = ungrouped, else 1..3 groups
        val vDom = 1 + rnd.nextInt(6)         // heavy ties in the sort key
        val k = 1 + rnd.nextInt(7)
        val p = Seq(1, 3, 5, 8)(rnd.nextInt(4))
        val desc = rnd.nextBoolean()
        val rows = (0 until n).map { i =>
          (if (gDom == 0) "g" else s"g${rnd.nextInt(gDom)}",
            i.toLong, rnd.nextInt(vDom).toLong, (1 + rnd.nextInt(9)).toLong)
        }
        val df = rows.toDF("g", "id", "v", "w")
        val sort = Seq(if (desc) col("v").desc else col("v").asc, col("id"))
        spark.conf.set("spark.sql.shuffle.partitions", p)
        val group = if (gDom == 0) Nil else Seq("g")
        val w0 = if (gDom == 0) Window.orderBy(sort: _*)
          else Window.partitionBy("g").orderBy(sort: _*)
        val wg = if (gDom == 0) Window.partitionBy() else Window.partitionBy("g")
        val expected = df
          .withColumn("rn", row_number().over(w0).cast("long"))
          .withColumn("cw", sum(col("w")).over(
            w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cwx", coalesce(sum(col("w")).over(
            w0.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("t", ntile(k).over(w0))
          .withColumn("gn", count(lit(1)).over(wg))
          .withColumn("gw", sum(col("w")).over(wg))
        val got = Prefix.orderStats(df, sort, group = group,
          rn = Some("rn"), cumSums = Seq(("w", "cw")),
          cumSumsExclusive = Seq(("w", "cwx")), ntiles = Seq((k, "t")),
          groupCount = Some("gn"), groupSums = Seq(("w", "gw")))
        val label = s"case $c: n=$n gDom=$gDom vDom=$vDom k=$k P=$p desc=$desc"
        assert(got.count() === n.toLong, label)
        assert(got.orderBy("id").collect().toSeq ===
          expected.select(got.columns.map(col): _*).orderBy("id").collect().toSeq,
          label)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
