package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The DSv2 write path's exactly-once contract: commit publishes exactly
  * the task-committed rows behind a _SUCCESS manifest; a failed job
  * publishes nothing and leaves no staging residue.
  */
class GridSinkWriteSpec extends SparkSpec {

  private def readBack(dir: String): Seq[(Long, Long, String)] = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
    files.toSeq.flatMap { f =>
      scala.io.Source.fromFile(f).getLines().map { line =>
        val Array(i, j, v) = line.split(",")
        (i.toLong, j.toLong, v)
      }.toSeq
    }
  }

  test("commit publishes all rows with a _SUCCESS manifest, dump-format values") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/out"
    val grid = spark.read.format("graft.sources.GridSourceProvider")
      .option("n", "16").option("partitions", "4").load()
    grid.repartition(3).write.format("graft.sources.GridSinkProvider")
      .mode("append").option("path", dir).save()
    val success = new java.io.File(dir, "_SUCCESS")
    assert(success.exists(), "_SUCCESS manifest must be written on commit")
    val manifest = scala.io.Source.fromFile(success).getLines().toSeq
    assert(manifest.head == s"total,${16 * 16}")
    // manifest lists each published file with its row count
    val listed = manifest.tail.filter(_.nonEmpty).map { l =>
      val Array(f, n) = l.split(","); (f, n.toLong)
    }
    assert(listed.map(_._2).sum == 16 * 16)
    listed.foreach { case (f, _) => assert(new java.io.File(dir, f).exists()) }
    // no staging residue after commit
    assert(!new java.io.File(dir, "_staging").exists())
    // round-trip: published cells == the source grid, %.10f formatted
    val got = readBack(dir).map { case (i, j, v) => (i, j) -> v }.toMap
    val want = grid.collect().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        "%.10f".formatLocal(java.util.Locale.ROOT, r.getDouble(2))).toMap
    assert(got == want)
  }

  test("a failing job publishes nothing and cleans its staging area") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-abort").toString + "/out"
    val sp = spark
    import sp.implicits._
    val poisoned = spark.range(0, 1000).select(
      col("id").as("i"), col("id").as("j"),
      when(col("id") === 999, lit(1.0) / (col("id") - col("id")))
        .otherwise(lit(0.5)).as("v"))
      .as[(Long, Long, Double)]
      .map { case (i, j, v) =>
        if (i == 999) throw new RuntimeException("poison row")
        (i, j, v)
      }.toDF("i", "j", "v")
    intercept[Exception] {
      poisoned.coalesce(2).write.format("graft.sources.GridSinkProvider")
        .mode("append").option("path", dir).save()
    }
    assert(!new java.io.File(dir, "_SUCCESS").exists(), "no manifest after abort")
    val leftover = Option(new java.io.File(dir).listFiles()).map(_.toSeq).getOrElse(Nil)
    assert(!leftover.exists(_.getName.startsWith("part-")), s"published files: $leftover")
    val staging = new java.io.File(dir, "_staging")
    assert(!staging.exists() || staging.listFiles().isEmpty,
      "staging residue after abort")
  }
}
