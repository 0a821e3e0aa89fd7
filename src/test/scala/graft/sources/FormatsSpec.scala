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

  test("dynamic partition pruning: a filtered dim prunes fact partitions at runtime") {
    val dir = Files.createTempDirectory("graft-dpp").toString
    Formats.writePartitioned(docs, dir, "lang")
    val fact = Formats.readParquet(spark, dir)
    // dim carries the selective predicate; the fact has NO static filter
    // on lang, so only runtime pruning (from the broadcast dim) can skip
    // its partition directories — the 100-TB star-join shape where the
    // date dim's WHERE clause prunes years of fact partitions.
    val sp = spark
    import sp.implicits._
    // the dim must be a real source with a surviving Filter node — an
    // in-memory LocalRelation constant-folds the predicate away and the
    // pruning rule no longer sees a selective filtering side
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("es", "keep"), ("de", "keep"), ("en", "drop"), ("fr", "drop"))
      .toDF("lang", "tier").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.filter(col("tier") === "keep"), "lang")
    val got = joined.select("doc_id").collect().map(_.getLong(0)).toSet
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"no DPP subquery in:\n${plan.take(4000)}")
    val want = docs.filter(col("lang").isin("es", "de"))
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

  test("XML round-trip with explicit schema preserves all rows (built-in since Spark 4)") {
    val dir = Files.createTempDirectory("graft-xml").toString
    Formats.writeXml(docs, dir, rowTag = "doc")
    val back = Formats.readXml(spark, dir, rowTag = "doc", docs.schema)
    assert(back.schema == docs.schema)
    assert(back.orderBy("doc_id").collect()
      .sameElements(docs.orderBy("doc_id").collect()))
  }

  test("z-order clustered write: per-file zval ranges are disjoint (skippable)") {
    // the write pattern q25_zorder's scale note promises: range-partition
    // on the interleaved key + sort within partitions, then prove the
    // resulting files carry non-overlapping min/max stats — the property
    // file-skipping needs on EITHER original dimension
    val orders = graft.Tables.orders(spark, sf0001)
      .select(
        pmod(col("o_custkey"), lit(65536L)).as("x"),
        pmod(expr("CAST(floor(o_totalprice) AS BIGINT)"), lit(65536L)).as("y"))
      .withColumn("zval", expr(
        """aggregate(sequence(0, 15), CAST(0 AS BIGINT),
           (acc, b) -> acc + shiftleft(shiftright(x, b) % 2, 2*b)
                           + shiftleft(shiftright(y, b) % 2, 2*b + 1))"""))
    val dir = Files.createTempDirectory("graft-zorder").toString
    orders.repartitionByRange(8, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(dir)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("lo")
      .collect()
    assert(ranges.length >= 4, s"expected several files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1),
        s"overlap: ${a.getString(0)} [..${a.getLong(2)}] vs ${b.getString(0)} [${b.getLong(1)}..]")
      case _ =>
    }
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
