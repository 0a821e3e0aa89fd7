package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * `oracleSql` on the same tables. Plain `sum(double)` is
  * order-of-accumulation dependent, so two engines (or two runs with a
  * different partitioning — i.e., any change of cluster size) can differ in
  * the last ulps. All the money columns in the test data are 2-decimal
  * values stored as doubles, so the exact-parity recipe is: cast to
  * DECIMAL(18,2) (identical rounding in both engines for values this far
  * from the .005 midpoint), aggregate exactly in decimal, cast the final
  * value back to double (identical IEEE conversion). This also makes every
  * aggregate *scale-invariant*: the result is the same for any partition
  * count, which is exactly what a 1000-executor run needs.
  */
object Sql {
  /** DECIMAL(12,2) holds every 2-decimal value in the test data (money
    * <= ~1e6) and keeps even triple products within both engines' 38-digit
    * cap: (12,2)*(12,2)*(12,2) -> (38,6) in Spark, 36 digits in DuckDB.
    */
  private val D = DecimalType(12, 2)

  /** Exact sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact sum of a product of two 2-decimal double expressions, as double.
    * The multiply happens in decimal (exact), so the sum is exact too.
    */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(D) * b.cast(D)).cast("double")

  /** Exact sum of a triple product of 2-decimal double expressions. */
  def dsumProd3(a: Column, b: Column, c: Column): Column =
    sum(a.cast(D) * b.cast(D) * c.cast(D)).cast("double")

  /** Exact-sum-based average of a 2-decimal double column, as double:
    * exact decimal sum -> double, then one IEEE division by the count.
    */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(lit(1))

  /** DuckDB-side spellings of the same. */
  def oDsum(x: String): String =
    s"CAST(sum(CAST($x AS DECIMAL(12,2))) AS DOUBLE)"
  def oDsumProd(a: String, b: String): String =
    s"CAST(sum(CAST($a AS DECIMAL(12,2)) * CAST($b AS DECIMAL(12,2))) AS DOUBLE)"
  def oDsumProd3(a: String, b: String, c: String): String =
    s"CAST(sum(CAST($a AS DECIMAL(12,2)) * CAST($b AS DECIMAL(12,2)) * CAST($c AS DECIMAL(12,2))) AS DOUBLE)"
  def oDavg(x: String): String =
    s"CAST(sum(CAST($x AS DECIMAL(12,2))) AS DOUBLE) / count(*)"
}
