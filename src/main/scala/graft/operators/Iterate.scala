package graft.operators

import org.apache.spark.sql.DataFrame

/** Helpers for DataFrame fixpoint loops (d06 / g06 / c03 style). */
object Iterate {

  /** Eager localCheckpoint + STATS RESET — the companion to the lineage
    * cut the iterative operators already document.
    *
    * `Dataset.localCheckpoint` truncates the plan but COPIES the
    * checkpointed plan's statistics onto the new leaf. A loop whose body
    * reads its state k times (a self-join, or joining state against two
    * arms) therefore multiplies sizeInBytes into the next round's stats:
    * after N rounds the BigInt is ~k^N times the bit LENGTH, and
    * Catalyst's size estimation starts multiplying million-bit integers
    * — measured on c03's 3-reference body: planning grew from 0.3 s to
    * 17 s per round by round 12, with task time flat at ~150 ms (the
    * driver burns the wall time in BigInteger.multiply). Rebuilding the
    * Dataset from the checkpointed RDD gives the leaf the session's
    * default size estimate, so every round plans identically.
    *
    * The row conversion this adds runs once per round over state-sized
    * (frontier-sized) data — noise next to one shuffle.
    */
  def checkpointFresh(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
