package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's read-only parquet tables (see TESTDATA.md /
  * FIXTURES.md). All queries take the sf directory as a parameter so the
  * same code runs at every scale factor — and, on a real cluster, against
  * any path (s3://, hdfs://) Spark's data sources resolve.
  *
  * Scale note: `spark.read.parquet` gives vectorized scans, predicate
  * pushdown and column pruning for free; at 100 TB the same call reads a
  * partitioned directory tree and Catalyst prunes partitions from query
  * predicates. Nothing here assumes local files.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is physically TIMESTAMP(NANOS) parquet, which Spark's
    * TimestampType (microseconds) refuses by default. The DuckDB oracle
    * truncates it to microseconds on read, so exact cross-engine parity =
    * read the raw int64 nanos (`nanosAsLong`) and floor-divide to micros —
    * identical values to what the oracle sees, full TimestampType surface
    * (windows, intervals, streaming watermarks) downstream.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    // Deliberately NOT save/restored: parquet readers consult the session
    // conf again at ACTION time (ParquetFileFormat.buildReader copies it
    // into the task hadoopConf), so unsetting after plan construction
    // would crash any not-yet-executed events scan. The flag only alters
    // TIMESTAMP(NANOS) columns, which exist in no other table, so leaving
    // it set is semantically inert for the rest of the session.
    //
    // A session-scoped alternative was tested and does NOT work on
    // Spark 4.1.2: `.option("spark.sql.legacy.parquet.nanosAsLong",
    // "true")` reaches schema INFERENCE (newHadoopConfWithOptions merges
    // read options into the hadoop conf the footer converter sees, so
    // the read plans with ts: bigint) but the scan still throws
    // PARQUET_TYPE_ILLEGAL at execution, because buildReader overwrites
    // the key in the task hadoopConf from the SESSION conf. Hence the
    // session conf is the only lever that reaches both phases.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    // integral `div` — a double division would lose precision on 1.7e18-ns
    // epoch values (> 2^53).
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  def region(spark: SparkSession, d: String): DataFrame    = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = table(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}

/** One named query: the Spark implementation plus (when SQL-expressible)
  * the ANSI SQL a DuckDB oracle runs over the same parquet tables.
  * Column names and row values must match the oracle exactly — see
  * `Sql.scala` for the cross-engine determinism helpers.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
