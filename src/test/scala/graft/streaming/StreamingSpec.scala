package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}

/** Structured-Streaming equivalence tests: the same transforms run (a)
  * as a batch plan — already DuckDB-oracle-verified via SparkEntry —
  * and (b) as a file-source stream across multiple micro-batches with
  * watermarks / state. Stream results must equal batch results.
  */
class StreamingSpec extends SparkSpec {

  private lazy val eventsBatch = Tables.events(spark, sf0001)
    .select("event_id", "ts", "user_id", "event_type", "value", "props").cache()

  /** Put a DataFrame into `dir` as ONE flat parquet file (the file
    * streaming source does not recurse into subdirectories) with a
    * chosen modification time (the source processes oldest-first).
    */
  private def writeFlatFile(df: org.apache.spark.sql.DataFrame, dir: Path,
      name: String, mtime: Long): Unit = {
    val stage = Files.createTempDirectory("graft-stage")
    df.coalesce(1).write.mode("overwrite").parquet(s"$stage/out")
    val part = Files.list(Path.of(s"$stage/out")).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val dest = dir.resolve(name)
    Files.move(part, dest)
    dest.toFile.setLastModified(mtime)
  }

  /** Write events into `n` time-ordered flat parquet files so
    * maxFilesPerTrigger=1 yields n micro-batches in event-time order.
    */
  private def writeOrderedFiles(dir: Path, n: Int): Unit = {
    val rows = eventsBatch.orderBy("ts", "event_id").collect()
    val schema = eventsBatch.schema
    val chunk = math.ceil(rows.length.toDouble / n).toInt
    rows.grouped(chunk).zipWithIndex.foreach { case (part, i) =>
      val df = spark.createDataFrame(java.util.Arrays.asList(part: _*), schema)
      writeFlatFile(df, dir, s"chunk$i.parquet", 1700000000000L + i * 60000L)
    }
  }

  test("hourly windowed agg: stream (complete mode) == batch") {
    val dir = Files.createTempDirectory("graft-stream")
    eventsBatch.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(Streams.eventsSchema).parquet(s"$dir/in")
    val q = Streams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_complete")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_complete")
        .orderBy("hour_start", "event_type").collect()
      val want = Streams.hourlyCounts(eventsBatch)
        .orderBy("hour_start", "event_type").collect()
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("windowed top-k: foreachBatch rank over the streamed agg == batch st04") {
    val dir = Files.createTempDirectory("graft-stream-topk")
    eventsBatch.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream.schema(Streams.eventsSchema).parquet(s"$dir/in")
    val sink = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
    val q = Streams.hourlyCounts(stream)
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the st04 postprocess: rank within each window of the completed agg
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("hour_start")
          .orderBy(col("n_events").desc, col("event_type"))
        sink.synchronized {
          sink.clear() // complete mode: each batch is the full state
          sink ++= batch.withColumn("rank", row_number().over(w).cast("int"))
            .filter(col("rank") <= 3)
            .select("hour_start", "rank", "event_type", "n_events")
            .collect()
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      val want = graft.SparkEntry.queries("st04_window_topk")(spark, sf0001)
        .collect()
      val got = sink.synchronized {
        sink.sortBy(r => (r.getString(0), r.getInt(1))).toArray
      }
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("st05 native session_window agrees with st03's lag+cumsum sessions") {
    val native = graft.SparkEntry.queries("st05_session_window")(spark, sf0001)
      .collect()
    val custom = Streams.sessionizeBatch(eventsBatch).collect()
    // same session structure: per user, same number of sessions and the
    // same multiset of per-session event counts
    val nByUser = native.groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(3)).sorted.toSeq }
    val cByUser = custom.groupBy(_.getLong(0))
      .map { case (u, rs) => u -> rs.map(_.getLong(2)).sorted.toSeq }
    assert(nByUser == cByUser)
    // session bounds are consistent: end = last event + gap > start
    native.foreach(r => assert(r.getLong(2) > r.getLong(1)))
  }

  test("watermarked append-mode windows finalize correctly over micro-batches") {
    val dir = Files.createTempDirectory("graft-stream-wm")
    writeOrderedFiles(dir, 4)
    // sentinel far in the future pushes the watermark past all real data
    val maxTs = eventsBatch.agg(max("ts")).head().getTimestamp(0)
    val sentinel = spark.sql(
      s"SELECT CAST(-1 AS BIGINT) AS event_id, timestamp'$maxTs' + INTERVAL 6 HOURS AS ts, " +
        "CAST(-1 AS BIGINT) AS user_id, 'sentinel' AS event_type, 0.0 AS value, '' AS props")
    writeFlatFile(sentinel, dir, "z_sentinel.parquet", 1700009000000L)

    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = Streams.hourlyCounts(stream.withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("hourly_append")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_append")
        .filter(col("event_type") =!= "sentinel")
        .orderBy("hour_start", "event_type").collect()
      val want = Streams.hourlyCounts(eventsBatch)
        .orderBy("hour_start", "event_type").collect()
      assert(got.sameElements(want),
        s"append-mode emitted ${got.length} rows, batch has ${want.length}")
    } finally q.stop()
  }

  test("st09 dynamic-gap sessions: watermarked append-mode stream == batch") {
    val dir = Files.createTempDirectory("graft-stream-dyngap")
    writeOrderedFiles(dir, 4)
    // sentinel far past all data so every session finalizes and is emitted
    val maxTs = eventsBatch.agg(max("ts")).head().getTimestamp(0)
    val sentinel = spark.sql(
      s"SELECT CAST(-1 AS BIGINT) AS event_id, timestamp'$maxTs' + INTERVAL 6 HOURS AS ts, " +
        "CAST(-1 AS BIGINT) AS user_id, 'sentinel' AS event_type, 0.0 AS value, '' AS props")
    writeFlatFile(sentinel, dir, "z_sentinel.parquet", 1700009000000L)

    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = Streams.dynamicGapSessions(stream.withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("dyngap_append")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dyngap_append")
        .filter(col("user_id") >= 0)
        .orderBy("user_id", "session_start_us").collect()
      val want = Streams.dynamicGapSessions(eventsBatch)
        .orderBy("user_id", "session_start_us").collect()
      assert(got.sameElements(want),
        s"append-mode emitted ${got.length} sessions, batch has ${want.length}")
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark removes replayed events") {
    val dir = Files.createTempDirectory("graft-stream-dedup")
    // the same events arrive twice (two files) — an at-least-once replay
    writeFlatFile(eventsBatch, dir, "a.parquet", 1700000000000L)
    writeFlatFile(eventsBatch, dir, "b.parquet", 1700000060000L)
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // SAME transform as the st07 batch oracle row, streaming form
    val q = Streams.dedupCounts(stream.withWatermark("ts", "1 hour"), streaming = true)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = eventsBatch.groupBy("event_type").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"$got != $want")
    } finally q.stop()
  }

  test("stream-stream interval join == batch range join (q16 semantics)") {
    val dir = Files.createTempDirectory("graft-ss-join")
    writeOrderedFiles(dir, 3)
    val src = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // SAME transform as the st06 batch oracle row, on a watermarked stream
    val joined = Streams.errorContextJoin(src.withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_join").select("err_id", "ctx_event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = graft.SparkEntry.queries("q16_range_join")(spark, sf0001)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // same pairs grouped: compare per-error counts
      val gotCounts = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(gotCounts == want, s"$gotCounts != $want")
    } finally q.stop()
  }

  test("stream-stream LEFT-OUTER interval join == batch, null rows included") {
    val dir = Files.createTempDirectory("graft-ss-ljoin")
    writeOrderedFiles(dir, 3)
    // outer-join null rows are only emitted once the watermark passes the
    // error's join horizon; a far-future sentinel finalizes everything
    val maxTs = eventsBatch.agg(max("ts")).head().getTimestamp(0)
    val sentinel = spark.sql(
      s"SELECT CAST(-1 AS BIGINT) AS event_id, timestamp'$maxTs' + INTERVAL 6 HOURS AS ts, " +
        "CAST(-1 AS BIGINT) AS user_id, 'sentinel' AS event_type, 0.0 AS value, '' AS props")
    writeFlatFile(sentinel, dir, "z_sentinel.parquet", 1700009000000L)
    val src = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val joined = Streams.errorContextJoinLeftOuter(src.withWatermark("ts", "10 minutes"))
    val q = joined.writeStream.format("memory").queryName("ss_ljoin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      def pairs(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      val got = pairs(spark.table("ss_ljoin").collect())
      val want = pairs(Streams.errorContextJoinLeftOuter(eventsBatch).collect())
      assert(got == want && want.exists(_._2.isEmpty) && want.exists(_._2.nonEmpty),
        s"got ${got.size} rows, want ${want.size}")
    } finally q.stop()
  }

  test("stream-static join: st08's enrichedSegmentCounts on a stream == batch") {
    val dir = Files.createTempDirectory("graft-ss-static")
    eventsBatch.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val dim = Tables.customer(spark, sf0001)
    val stream = spark.readStream.schema(Streams.eventsSchema).parquet(s"$dir/in")
    val q = Streams.enrichedSegmentCounts(stream, dim)
      .writeStream.format("memory").queryName("ss_static")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      def keyed(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val got = keyed(spark.table("ss_static").collect())
      val want = keyed(
        Streams.enrichedSegmentCounts(eventsBatch, dim).collect())
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("stream admission: st10's admitNew on a stream == batch, index broadcast") {
    val dir = Files.createTempDirectory("graft-ss-admit")
    eventsBatch.coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    val seen = eventsBatch.filter(pmod(col("event_id"), lit(3)) === 0)
      .select("event_id")
    val stream = spark.readStream.schema(Streams.eventsSchema).parquet(s"$dir/in")
    // stateless filter: append mode, rows emitted as they pass
    val q = Streams.admitNew(stream.select(col("event_id"), col("event_type")), seen)
      .writeStream.format("memory").queryName("ss_admit")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_admit").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = Streams.admitNew(
          eventsBatch.select(col("event_id"), col("event_type")), seen)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want && got.nonEmpty)
      // no event with id % 3 == 0 may be admitted
      assert(got.forall(_._1 % 3 != 0))
      // the broadcast hint drives the same join choice the micro-batch
      // planner makes; assert it on the batch physical plan
      val physical = Streams.admitNew(
          eventsBatch.select(col("event_id"), col("event_type")), seen)
        .queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin") && physical.contains("LeftAnti"),
        s"expected a broadcast anti join in:\n$physical")
    } finally q.stop()
  }

  test("update-mode aggregation: last emitted state per key converges to batch") {
    // update mode re-emits only the keys each micro-batch changed; the
    // last emission per key must equal the batch answer. foreachBatch
    // applies them in order — the upsert-sink contract (complete mode
    // rewrites everything; update is what a 100-TB keyed sink wants).
    val dir = Files.createTempDirectory("graft-stream-upd")
    writeOrderedFiles(dir, 4)
    val state = new java.util.concurrent.ConcurrentHashMap[(String, String), (Long, Double)]()
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = Streams.hourlyCounts(stream)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach { r =>
          state.put((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))
        }
      }.start()
    try q.processAllAvailable() finally q.stop()
    val want = Streams.hourlyCounts(eventsBatch).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    import scala.jdk.CollectionConverters._
    assert(state.asScala.toMap == want)
  }

  test("checkpoint recovery: a restarted query resumes exactly-once from its offsets") {
    // the production failure mode: the driver dies mid-stream and the
    // query restarts from its checkpoint — no window may be lost or
    // double-emitted. Phase 1 processes half the files and STOPS; phase
    // 2 starts a fresh query object on the same checkpoint + file sink
    // and processes the rest. The parquet sink's commit log + state
    // checkpoint must splice to exactly the batch answer.
    val dir = Files.createTempDirectory("graft-ckpt-in")
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString
    val rows = eventsBatch.orderBy("ts", "event_id").collect()
    val schema = eventsBatch.schema
    val chunks = rows.grouped(math.ceil(rows.length / 4.0).toInt).toSeq
    def writeChunk(i: Int): Unit = writeFlatFile(
      spark.createDataFrame(java.util.Arrays.asList(chunks(i): _*), schema),
      dir, s"chunk$i.parquet", 1700000000000L + i * 60000L)
    def startQuery() = {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      Streams.hourlyCounts(stream.withWatermark("ts", "10 minutes"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }
    writeChunk(0); writeChunk(1)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    writeChunk(2); writeChunk(3)
    val maxTs = eventsBatch.agg(max("ts")).head().getTimestamp(0)
    val sentinel = spark.sql(
      s"SELECT CAST(-1 AS BIGINT) AS event_id, timestamp'$maxTs' + INTERVAL 6 HOURS AS ts, " +
        "CAST(-1 AS BIGINT) AS user_id, 'sentinel' AS event_type, 0.0 AS value, '' AS props")
    writeFlatFile(sentinel, dir, "z_sentinel.parquet", 1700009000000L)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val got = keyed(spark.read.parquet(outDir)
      .filter(col("event_type") =!= "sentinel").collect())
    val want = keyed(Streams.hourlyCounts(eventsBatch).collect())
    assert(got == want, s"spliced output ${got.size} windows, batch ${want.size}")
  }

  test("foreachBatch idempotent sink: batchId-keyed writes survive replays") {
    val dir = Files.createTempDirectory("graft-feb")
    writeOrderedFiles(dir, 3)
    val outDir = Files.createTempDirectory("graft-feb-out")
    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    // exactly-once pattern: partition output by batchId + overwrite that
    // partition, so re-processing a batch replaces rather than duplicates
    val q = stream
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        df.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")
        // simulate an at-least-once replay of the same batch
        df.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val written = spark.read.parquet(outDir.toString)
      assert(written.count() == eventsBatch.count(), "no duplicates despite replay")
      assert(written.select("event_id").distinct().count() == eventsBatch.count())
    } finally q.stop()
  }

  test("state API v2 ValueState running EWMA == the st14 prefix-fold plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-ewma-v2")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .as[Streams.EvV]
      val q = Streams.runningEwmaStream(spark, stream)
        .writeStream.format("memory").queryName("ewma_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("ewma_stream").collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getDouble(2)))).toMap
        val want = Streams.runningEwma(eventsBatch).collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getDouble(2)))).toMap
        assert(got.size == want.size, s"${got.size} != ${want.size}")
        // bit-exact: both sides fold the identical IEEE sequence
        assert(got == want)
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state API v2 ValueState streaming CUSUM == the st17 prefix-fold plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-cusum")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .as[Streams.EvV]
      val q = Streams.cusumStream(spark, stream)
        .writeStream.format("memory").queryName("cusum_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("cusum_stream").collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2), r.getBoolean(3)))).toMap
        val want = Streams.streamingCusum(eventsBatch).collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2), r.getBoolean(3)))).toMap
        assert(got.size == want.size, s"${got.size} != ${want.size}")
        // exact equality: both sides walk the identical integer recursion
        assert(got == want)
        // the alarm path fires across a micro-batch boundary somewhere
        assert(got.values.exists(_._3), "no alarm ever fired on the stream")
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state API v2 CEP sequence detect == the st18 chained-window plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-seq")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[Streams.Ev2]
      val q = Streams.sequenceDetectStream(spark, stream)
        .writeStream.format("memory").queryName("seq_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("seq_stream").collect()
          .map(r => r.getLong(3) -> ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))))
          .toMap
        val want = Streams.sequenceDetect(eventsBatch).collect()
          .map(r => r.getLong(3) -> ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))))
          .toMap
        assert(got.size == want.size, s"${got.size} != ${want.size}")
        // exact: both sides carry the identical integer state machine
        assert(got == want)
        assert(got.nonEmpty, "no pattern match fired on the stream")
        // at least one match's view/click/purchase span different
        // micro-batches: the span exceeds a third of the event-time range
        val spanMax = got.values.map(_._4).max
        assert(spanMax > 0L, "all matches were instantaneous")
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state API v2 drawdown monitor == the st19 window plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-dd")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Streams.EvT]
      val q = Streams.drawdownStream(spark, stream)
        .writeStream.format("memory").queryName("dd_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("dd_stream").collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))))
          .toMap
        val want = Streams.drawdownRows(eventsBatch).collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))))
          .toMap
        assert(got.size == want.size, s"${got.size} != ${want.size}")
        // exact: both sides walk the identical integer recursion
        assert(got == want)
        // a peak established in an early micro-batch constrains a later one
        assert(got.values.exists(_._4 > 0), "no drawdown ever observed")
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state API v2 MapState type stats == the st11 window plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-types-v2")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
        .as[Streams.Ev2]
      val q = Streams.runningTypeStatsStream(spark, stream)
        .writeStream.format("memory").queryName("type_stats_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("type_stats_stream").collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getInt(2), r.getInt(3)))).toMap
        val want = Streams.runningTypeStats(eventsBatch).collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getInt(2), r.getInt(3)))).toMap
        assert(got.size == want.size, s"${got.size} != ${want.size}")
        assert(got == want)
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state API v2 ListState recent context == the st12 window-frame plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-ctx-v2")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id")).as[Streams.Ev]
      val q = Streams.recentContextStream(spark, stream)
        .writeStream.format("memory").queryName("ctx_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("ctx_stream").collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getString(2)))).toMap
        val want = Streams.recentContext(eventsBatch).collect()
          .map(r => r.getLong(1) -> ((r.getLong(0), r.getString(2)))).toMap
        assert(got.size == want.size && got == want)
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state API v2 sessionization (transformWithState + RocksDB) == batch plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-sess-v2")
    writeOrderedFiles(dir, 3)
    val maxTs = eventsBatch.agg(max("ts")).head().getTimestamp(0)
    val flush = eventsBatch.select("user_id").distinct()
      .select(lit(-1L).as("event_id"),
        lit(maxTs).cast("timestamp").plus(expr("INTERVAL 2 HOURS")).as("ts"),
        col("user_id"), lit("flush").as("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
    writeFlatFile(flush, dir, "z_flush.parquet", 1700009000000L)

    // the v2 API requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id")).as[Streams.Ev]
      val q = Streams.sessionizeStreamV2(spark, stream)
        .writeStream.format("memory").queryName("sessions_stream_v2")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("sessions_stream_v2")
          .orderBy("user_id", "session_id").collect()
        val want = Streams.sessionizeBatch(eventsBatch)
          .orderBy("user_id", "session_id").collect()
        assert(got.length == want.length,
          s"v2 stream sessions ${got.length} != batch ${want.length}")
        got.zip(want).foreach { case (g, w) =>
          assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1)
            && g.getLong(2) == w.getLong(2)
            && math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9, s"$g != $w")
        }
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("v2 timers: the watermark closes sessions — no flush sentinels needed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-sess-timer")
    writeOrderedFiles(dir, 3) // deliberately NO flush file
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id")).as[Streams.Ev]
      val q = Streams.sessionizeStreamV2Timers(spark, stream)
        .writeStream.format("memory").queryName("sessions_timer")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("sessions_timer")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
            r.getLong(4)))
          .toSet
        // scalar expectation: every session the 30-min-gap fold closes,
        // plus each user's final session iff the end-of-stream watermark
        // (max event time, ms, delay 0) passes its last event + gap
        val gapUs = 1800000000L
        val gapMs = gapUs / 1000L
        val evs = eventsBatch.select("event_id", "ts", "user_id").collect()
          .map(r => (r.getLong(2), Streams.usOf(r.getTimestamp(1)), r.getLong(0)))
        val wmMs = evs.map(_._2).max / 1000L
        val expected = evs.groupBy(_._1).flatMap { case (user, es) =>
          val sorted = es.sortBy(e => (e._2, e._3)).map(_._2)
          val sessions = sorted.foldLeft(Vector.empty[(Long, Long, Long, Long)]) {
            case (acc, us) => acc.lastOption match {
              case Some((sid, st, last, n)) if us - last <= gapUs =>
                acc.init :+ ((sid, st, math.max(last, us), n + 1))
              case prev => acc :+ ((prev.map(_._1).getOrElse(0L) + 1, us, us, 1L))
            }
          }
          val closedByGap = sessions.init
          val lastClosed = sessions.lastOption
            .filter { case (_, _, last, _) => last / 1000L + gapMs + 1 <= wmMs }
          (closedByGap ++ lastClosed).map { case (sid, st, last, n) =>
            (user, sid, n, (last - st) / 1e6, last / 1000L + gapMs + 1)
          }
        }.toSet
        assert(got == expected,
          s"got ${got.size} sessions, expected ${expected.size}; " +
            s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
        assert(expected.nonEmpty)
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stateful sessionization: stream across micro-batches == batch window plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-sess")
    writeOrderedFiles(dir, 3)
    // per-user flush sentinels > gap after the last real event
    val maxTs = eventsBatch.agg(max("ts")).head().getTimestamp(0)
    val flush = eventsBatch.select("user_id").distinct()
      .select(lit(-1L).as("event_id"),
        lit(maxTs).cast("timestamp").plus(expr("INTERVAL 2 HOURS")).as("ts"),
        col("user_id"), lit("flush").as("event_type"),
        lit(0.0).as("value"), lit("").as("props"))
    writeFlatFile(flush, dir, "z_flush.parquet", 1700009000000L)

    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .select(col("event_id"), col("ts"), col("user_id")).as[Streams.Ev]
    val q = Streams.sessionizeStream(spark, stream)
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions_stream")
        .orderBy("user_id", "session_id")
        .collect()
      val want = Streams.sessionizeBatch(eventsBatch)
        .orderBy("user_id", "session_id").collect()
      assert(got.length == want.length,
        s"stream sessions ${got.length} != batch ${want.length}")
      got.zip(want).foreach { case (g, w) =>
        assert(g.getLong(0) == w.getLong(0) && g.getLong(1) == w.getLong(1)
          && g.getLong(2) == w.getLong(2)
          && math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-9, s"$g != $w")
      }
    } finally q.stop()
  }

  test("st16 chained stateful: session_window -> hourly rollup stream == batch") {
    val dir = Files.createTempDirectory("graft-stream-chain")
    writeOrderedFiles(dir, 4)
    // sentinel far past all data: watermark passes every session window
    // AND every downstream hour window, so both stateful stages flush
    val maxTs = eventsBatch.agg(max("ts")).head().getTimestamp(0)
    val sentinel = spark.sql(
      s"SELECT CAST(-1 AS BIGINT) AS event_id, timestamp'$maxTs' + INTERVAL 12 HOURS AS ts, " +
        "CAST(-1 AS BIGINT) AS user_id, 'sentinel' AS event_type, 0.0 AS value, '' AS props")
    writeFlatFile(sentinel, dir, "z_sentinel.parquet", 1700009000000L)
    val sentinelHour =
      (maxTs.getTime + 12L * 3600 * 1000) * 1000L / 3600000000L - 1 // first h to exclude

    val stream = spark.readStream.schema(Streams.eventsSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    val q = Streams.sessionHourlyRollup(stream.withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("chain_append")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("chain_append")
        .filter(col("h") < sentinelHour).orderBy("h").collect()
      val want = Streams.sessionHourlyRollup(eventsBatch).orderBy("h").collect()
      assert(got.length == want.length,
        s"chained stream emitted ${got.length} hour rows, batch has ${want.length}")
      got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
    } finally q.stop()
  }

  test("state API v2 one-step forecaster == the st20 batch fold") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-fc")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Streams.EvT]
      val q = Streams.forecastStream(spark, stream)
        .writeStream.format("memory").queryName("fc_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("fc_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            ((r.getInt(2), r.getDouble(3), r.getDouble(4))))
          .toMap
        val want = Streams.forecastRows(eventsBatch).collect()
          .map(r => (r.getLong(0), r.getLong(1)) ->
            ((r.getInt(2), r.getDouble(3), r.getDouble(4))))
          .toMap
        assert(got.size == want.size, s"${got.size} != ${want.size}")
        // exact: both sides walk the identical double recursion
        assert(got == want)
        // a state carried across micro-batches produced a forecast: some
        // pos >= 2 row exists whose err differs from the naive x - x1
        assert(got.values.exists(_._1 > 2), "all series ended inside one batch")
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state API v2 decayed trending counter == the st21 batch fold") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-dc")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .selectExpr("event_id", "ts",
          "CAST(get_json_object(props, '$.k') AS BIGINT) AS item_k")
        .as[Streams.EvK]
      val q = Streams.decayedStream(spark, stream)
        .writeStream.format("memory").queryName("dc_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("dc_stream").collect()
          .map(r => (r.getLong(0), r.getInt(1)) ->
            ((r.getLong(2), r.getInt(3), r.getLong(4))))
          .toMap
        val want = Streams.decayedRows(eventsBatch).collect()
          .map(r => (r.getLong(0), r.getInt(1)) ->
            ((r.getLong(2), r.getInt(3), r.getLong(4))))
          .toMap
        assert(got.size == want.size, s"${got.size} != ${want.size}")
        // exact: both sides walk the identical truncating integer decay
        assert(got == want)
        // decay state survived a micro-batch boundary: some item's score
        // shrank between consecutive rows (a day gap truncated it)
        val shrank = got.groupBy(_._1._1).values.exists { xs =>
          val ord = xs.toSeq.sortBy(_._1._2).map(_._2._3)
          ord.zip(ord.tail).exists { case (a, b) => b < a }
        }
        assert(shrank, "no decay step observed across the stream")
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("v2 absence timers: stream alerts+conversions == batch twin minus pending") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-absence")
    writeOrderedFiles(dir, 3) // NO flush sentinel — the watermark alerts
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Streams.EvT]
      val q = Streams.absenceAlertStream(spark, stream)
        .writeStream.format("memory").queryName("absence_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("absence_stream").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
            if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
        val want = Streams.absenceAlerts(eventsBatch).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
            if (r.isNullAt(4)) None else Some(r.getLong(4))))
          .filter(_._4 != "pending").toSet
        assert(got == want,
          s"got ${got.size} rows, want ${want.size}; " +
            s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
        // both mechanisms actually fired
        assert(got.exists(_._4 == "alert") && got.exists(_._4 == "converted"))
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("v2 sketch-in-state: final streaming KMV row per type == batch twin") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-kmv")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Streams.EvT]
      val q = Streams.kmvStream(spark, stream)
        .writeStream.format("memory").queryName("kmv_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // one row per (type, batch); n_sketch grows monotonically and,
        // once saturated, kth only shrinks — so the final state per type
        // is max n_sketch with MIN kth as tie-break
        val rows = spark.table("kmv_stream").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        val got = rows.groupBy(_._1).map { case (_, g) =>
          g.maxBy(r => (r._2, -r._3))
        }.toSet
        val want = Streams.kmvByType(eventsBatch).collect()
          .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
        assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
        assert(got.nonEmpty)
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("state API v2 running 3-sigma guardrail == the st22 window plan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-zscore-v2")
    writeOrderedFiles(dir, 3)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(Streams.eventsSchema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .as[Streams.EvT]
      val q = Streams.zscoreGuardrailStream(spark, stream)
        .writeStream.format("memory").queryName("zscore_stream")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val got = spark.table("zscore_stream").collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
        val want = Streams.zscoreGuardrail(eventsBatch).collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getInt(2), r.getLong(3), r.getBoolean(4)))).toMap
        assert(got.size == want.size, s"${got.size} != ${want.size}")
        assert(got == want)
        // the guardrail actually fires somewhere, and never before warm-up
        assert(got.values.exists(_._3), "no anomaly flagged on the whole stream")
        assert(got.values.forall(v => !v._3 || v._2 >= 10))
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
