package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class FormatsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)

  test("partitioned write + partition pruning: lang predicate prunes directories") {
    val dir = Files.createTempDirectory("graft-part").toString
    Formats.writePartitioned(docs, dir, "lang")
    val read = Formats.readParquet(spark, dir).filter(col("lang") === "es")
    val plan = read.queryExecution.executedPlan.toString
    // the lang predicate lands in PartitionFilters, NOT in data filters
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(plan.contains("(lang"), plan)
    // correctness: same rows as filtering the unpartitioned table
    val got = read.select("doc_id").collect().map(_.getLong(0)).toSet
    val want = docs.filter(col("lang") === "es")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("schema evolution: mergeSchema unifies drifting parquet writers") {
    val dir = Files.createTempDirectory("graft-evolve").toString
    // writer v1: (doc_id, lang); writer v2 adds a column
    docs.select("doc_id", "lang").write.parquet(s"$dir/p=1")
    docs.select("doc_id", "lang", "n_chars").write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "p"))
    assert(merged.count() == docs.count() * 2)
    // old-writer rows surface the new column as NULL
    assert(merged.filter(col("p") === 1 && col("n_chars").isNull).count() == docs.count())
  }

  test("CSV round-trip with explicit schema preserves all rows") {
    val dir = Files.createTempDirectory("graft-csv").toString
    // text contains no quotes/newlines in the corpus; header + schema read
    Formats.writeCsv(docs, dir)
    val back = Formats.readCsv(spark, dir, docs.schema)
    assert(back.schema == docs.schema)
    val got = back.orderBy("doc_id").collect()
    val want = docs.orderBy("doc_id").collect()
    assert(got.sameElements(want))
  }

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(docs, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.orderBy("doc_id").collect()
      .sameElements(docs.orderBy("doc_id").collect()))
    val plan = back.filter(col("n_chars") > 100).select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars)"), plan)
  }

  test("JSON round-trip with explicit schema preserves all rows") {
    val dir = Files.createTempDirectory("graft-json").toString
    Formats.writeJson(docs, dir)
    val back = Formats.readJson(spark, dir, docs.schema)
    val got = back.orderBy("doc_id").collect()
    val want = docs.orderBy("doc_id").collect()
    assert(got.sameElements(want))
  }
}
