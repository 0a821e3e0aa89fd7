package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers beyond the driver's parquet tables: Hive-style
  * partitioned layout (the 100 TB organization — partition pruning turns
  * predicate queries into directory-pruned scans) and schema-explicit
  * CSV/JSON interchange.
  *
  * All writers take a `path` so the same code targets local disk,
  * `hdfs://` or `s3://` — Spark's data source API resolves the scheme.
  */
object Formats {

  /** Write Hive-style partitioned parquet (`path/col=value/...`). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.partitionBy(partitionCols: _*).mode(SaveMode.Overwrite).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with header; schema supplied explicitly on read (schema
    * inference double-scans the data — never at 100 TB).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode(SaveMode.Overwrite).csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Newline-delimited JSON. */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the second columnar format warehouses interchange with;
    * same pushdown/pruning machinery as parquet in Spark's reader.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML — built into Spark since 4.0 (no external package): the
    * interchange format feeds/catalogs still arrive in. Row tag is
    * explicit; schema supplied on read for the same
    * no-inference-double-scan reason as CSV.
    */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.option("rowTag", rowTag).mode(SaveMode.Overwrite).format("xml").save(path)

  def readXml(spark: SparkSession, path: String, rowTag: String,
      schema: StructType): DataFrame =
    spark.read.option("rowTag", rowTag).schema(schema).format("xml").load(path)
}
