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

  /** Unpersist the checkpoint blocks behind a SUPERSEDED loop state.
    *
    * A fixpoint loop that assigns `state = nextCheckpoint` each round
    * leaves every prior round's `localCheckpoint(true)` blocks pinned in
    * the block manager for the life of the process — in a 361-query
    * bench JVM the dead rounds accumulate into real memory pressure (the
    * r7 adjudication's median-above-first signature on g16/d16). Call
    * this on the round's PREVIOUS state right after the new one is
    * materialized; never on state still referenced (the edge list, the
    * final result).
    *
    * Works on both checkpoint spellings: a plain `localCheckpoint` result
    * (LogicalRDD over the persisted internal RDD) and a
    * [[checkpointFresh]] result (LogicalRDD over a row-conversion RDD a
    * few narrow dependencies above the persisted one) — it walks the RDD
    * dependency chain to the first persisted ancestor. A non-RDD-backed
    * plan is a no-op, so calling it on a never-checkpointed frame is safe.
    */
  // Unpersisting a locally-checkpointed RDD makes Spark WARN that its
  // truncated lineage "cannot be recomputed" — which is the POINT here
  // (superseded loop state is never reread), so silence exactly that
  // logger once rather than spray hundreds of red herrings into every
  // bench/verify log. Scoped to the one RDD class that carries the
  // message; real RDD warnings elsewhere stay visible.
  private lazy val quietUnpersistWarn: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  def release(df: DataFrame): Unit = {
    quietUnpersistWarn
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        r.unpersist(blocking = false)
      else r.dependencies.foreach(dep => walk(dep.rdd))
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => walk(l.rdd)
      case _ => ()
    }
  }
}
