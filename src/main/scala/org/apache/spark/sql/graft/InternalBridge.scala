package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door the engine needs: building a DataFrame
  * directly over an `RDD[InternalRow]`.
  *
  * `Prefix.orderStats` hands corpus-sized data through an RDD scan pass
  * (genuine per-partition imperative logic — the two-pass prefix scan).
  * The public spelling, `Dataset.rdd` + `createDataFrame(rowRDD,
  * schema)`, pays TWO full external-row conversions per pass:
  * InternalRow → Row (boxing every field, `UTF8String` → `String`) on
  * the way out and Row → InternalRow (converter dispatch per field) on
  * the way back — measured at 2-7× the whole query on the Prefix-
  * rewritten surface. `SparkSession.internalCreateDataFrame` skips both
  * but is `private[sql]`, hence this shim package — the standard
  * connector-library spelling (spark-avro and the Hive integration do
  * the same). Confined to exactly one method so the internal-API
  * surface stays auditable.
  */
object InternalBridge {

  /** `spark.internalCreateDataFrame(rdd, schema)` — a batch (non-
    * streaming) LogicalRDD leaf. Rows may be reused by the producer:
    * `RDDScanExec` re-projects every row through its own
    * `UnsafeProjection` before anything downstream buffers it
    * (ExistingRDD's contract for exactly this constructor).
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)
}
