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
  // (superseded loop state is never reread). Silence EXACTLY that
  // message with a log4j2 filter on the emitting logger; every other
  // WARN from that class (and everything else) stays visible — the r8
  // spelling raised the whole class logger to ERROR, muting unrelated
  // warnings process-wide.
  private lazy val quietUnpersistWarn: Unit =
    try {
      import org.apache.logging.log4j.core.LoggerContext
      import org.apache.logging.log4j.core.config.LoggerConfig
      val ctx = org.apache.logging.log4j.LogManager
        .getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      val name = "org.apache.spark.rdd.MapPartitionsRDD"
      val lc = cfg.getLoggerConfig(name) match {
        case exact if exact.getName == name => exact
        case parent =>
          val nc = new LoggerConfig(name, parent.getLevel, true)
          cfg.addLogger(name, nc)
          nc
      }
      lc.addFilter(new org.apache.logging.log4j.core.filter.AbstractFilter() {
        override def filter(event: org.apache.logging.log4j.core.LogEvent)
            : org.apache.logging.log4j.core.Filter.Result = {
          val msg = if (event.getMessage == null) null
            else event.getMessage.getFormattedMessage
          if (msg != null && msg.contains("cannot be recomputed after unpersisting"))
            org.apache.logging.log4j.core.Filter.Result.DENY
          else org.apache.logging.log4j.core.Filter.Result.NEUTRAL
        }
      })
      ctx.updateLoggers()
    } catch { case _: Throwable => () }

  /** True when at least one persisted ancestor block set was released —
    * exposed so loops (and Round8OpsSpec) can ASSERT the release took,
    * instead of the call failing open.
    */
  def release(df: DataFrame): Boolean = {
    quietUnpersistWarn
    var released = false
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE) {
        r.unpersist(blocking = false)
        released = true
      } else r.dependencies.foreach(dep => walk(dep.rdd))
    // collect EVERY RDD-backed leaf (handles a .select/.filter layered
    // over the checkpoint — the r8 spelling matched only a BARE
    // LogicalRDD root and silently no-opped otherwise)
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }.foreach(l => walk(l.rdd))
    if (!released)
      org.apache.logging.log4j.LogManager.getLogger("graft.operators.Iterate")
        .warn("Iterate.release: no persisted ancestor found — the frame was " +
          "not checkpointed (or already released); checkpoint blocks may leak")
    released
  }
}
