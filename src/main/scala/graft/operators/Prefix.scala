package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graft.InternalBridge
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Scale-safe global order statistics — the two-pass range-partitioned
  * prefix scan that replaces `Window.orderBy(...)` with no
  * `partitionBy` (or with a tiny-domain `partitionBy` whose groups are
  * each corpus-sized).
  *
  * Spark executes an unpartitioned window in ONE task: the whole input
  * is shuffled to a single reducer and sorted there — fine on 60k rows,
  * a guaranteed straggler (or OOM) on a 100 TB key domain. The classic
  * fix (Blelloch's scan; the same shape MPI_Scan distributes) is:
  *
  *   1. a distributed range sort — every task sorts only n/P rows;
  *   2. per-partition subtotals (P tiny rows — bounded by the partition
  *      count, not the data) collected to the driver and prefix-summed
  *      into per-partition OFFSETS;
  *   3. one streaming pass per partition attaches
  *      global stat = local running stat + offset.
  *
  * For row counts and exact integer sums this regrouping is lossless,
  * so the result is bit-identical to the single-window spelling AND
  * invariant to the partition count — the bench's partitioning-
  * invariance witness runs the rewritten queries under several shuffle-
  * partition counts and AQE on/off.
  *
  * Why the scan pass is an RDD `mapPartitionsWithIndex` and not a
  * `Window.partitionBy(spark_partition_id())`: Spark SQL creates a NEW
  * `RangePartitioner` per exchange node, seeded by the stage's RDD id —
  * two plan branches over the same `repartitionByRange` (the window arm
  * and a subtotal arm) can therefore sample DIFFERENT boundaries once
  * column pruning makes their exchange subtrees non-reusable, and the
  * offsets silently mismatch (observed: an 11th ntile(10) bucket at
  * sf0.01). One RDD object = one partitioner; the subtotal job and the
  * scan job share it by construction, and the shuffle's map outputs are
  * computed once (the second job's map stage is skipped). This is the
  * "genuine per-partition imperative logic" case RDDs exist for.
  *
  * Both passes run on `InternalRow` (`queryExecution.toRdd` in,
  * [[org.apache.spark.sql.graft.InternalBridge]] out): the public
  * `Dataset.rdd` / `createDataFrame(rowRDD, schema)` spelling pays two
  * full external-row conversions per pass (boxing every field,
  * `UTF8String` ↔ `String`), measured at 2-7× the whole query on the
  * rewritten surface. Sort-output rows are REUSED buffers, so group
  * keys are copied before being held across rows, and the scan emits a
  * reused `JoinedRow` — safe because `RDDScanExec` re-projects every
  * row through its own `UnsafeProjection` before anything downstream
  * buffers it.
  *
  * Requirements on the caller:
  *   - `sort` must be a TOTAL order (include a unique tiebreak column)
  *     — the same requirement the engine-determinism contract already
  *     imposes on every ranked query;
  *   - running-sum value columns must be non-null `LongType` (or
  *     `IntegerType`, summed as long — exactly what `sum(long)` over a
  *     window returns); float sums would change under regrouping;
  *   - `group` columns, if any, must be a SMALL domain (they replace a
  *     tiny-domain `partitionBy` whose groups are corpus-sized; the
  *     driver holds one offset entry per (group, partition)). This is
  *     ENFORCED: pass 1 fails fast once any partition sees more than
  *     `maxGroups` distinct group runs (the range sort keeps each
  *     group's rows contiguous, so per-partition runs ≈ groups in that
  *     partition), and the driver re-checks the collected total — a
  *     high-cardinality group key aborts with a pointer at the
  *     per-key-window spelling instead of silently collecting
  *     |groups|×P tuples;
  *   - `group` column types must have value-based equality on their
  *     INTERNAL representation (pass 1's run detection compares held
  *     copies with `equals`). Atomic types, strings, decimals and
  *     structs of those qualify; `BinaryType` (Array[Byte] — reference
  *     equality) and map types do not and are rejected up front.
  */
object Prefix {

  /** Types whose Catalyst-internal values compare correctly with
    * `equals` — the contract pass 1's run-length group detection needs.
    * BinaryType is atomic but its internal value is Array[Byte]
    * (reference equality): a binary group key would fragment every row
    * into its own run and then miss the pass-2 offset lookup. MapData
    * likewise has no value equality. Arrays (GenericArrayData) do
    * implement equals, but every current call site is atomic — keep the
    * gate tight until a real caller needs more.
    */
  private def hasValueEquality(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BinaryType => false
      case s: StructType => s.fields.forall(f => hasValueEquality(f.dataType))
      case _: NumericType | StringType | BooleanType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
  }

  /** Adds global order statistics over `sort` (within optional `group`
    * columns) to `df`:
    *   - `rn`: global 1-based row_number column name (LongType);
    *   - `cumSums`: (valueCol, outCol) inclusive running sums
    *     (UNBOUNDED PRECEDING .. CURRENT ROW, LongType);
    *   - `cumSumsExclusive`: (valueCol, outCol) exclusive running sums
    *     (UNBOUNDED PRECEDING .. 1 PRECEDING), 0 for the first row;
    *   - `ntiles`: (k, outCol) SQL-standard NTILE(k) buckets
    *     (IntegerType);
    *   - `groupCount`: total row count of the row's group (LongType) —
    *     `count(*) OVER (PARTITION BY group)`;
    *   - `groupSums`: (valueCol, outCol) total sum of valueCol over the
    *     row's group (LongType) — `sum(v) OVER (PARTITION BY group)`.
    *
    * `groupCount`/`groupSums` cost nothing extra: pass 1's subtotals
    * already hold them, so a caller that needs "cumulative vs total"
    * (weighted quantiles, Lorenz/ABC shares, nucleus cuts, median
    * ranks) gets the total attached in the SAME scan instead of
    * aggregating separately and joining back — which would re-run the
    * scan pass (and its reduce-side sort) a second time.
    */
  def orderStats(
      df: DataFrame,
      sort: Seq[Column],
      group: Seq[String] = Nil,
      rn: Option[String] = None,
      cumSums: Seq[(String, String)] = Nil,
      cumSumsExclusive: Seq[(String, String)] = Nil,
      ntiles: Seq[(Int, String)] = Nil,
      groupCount: Option[String] = None,
      groupSums: Seq[(String, String)] = Nil,
      maxGroups: Int = 65536): DataFrame = {
    val spark = df.sparkSession
    val P = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = group.map(df.col) ++ sort
    // ONE sorted plan → ONE lazy `toRdd` → ONE range partitioner shared
    // by the subtotal job and the scan job.
    val sorted = df.repartitionByRange(P, keys: _*).sortWithinPartitions(keys: _*)
    val schema = sorted.schema
    val rdd: RDD[InternalRow] = sorted.queryExecution.toRdd
    val sumSrcs =
      (cumSums ++ cumSumsExclusive ++ groupSums).map(_._1).distinct
    val gIdx = group.map(schema.fieldIndex).toArray
    val sIdx = sumSrcs.map(schema.fieldIndex).toArray
    sIdx.foreach { i =>
      val dt = schema(i).dataType
      require(dt == LongType || dt == IntegerType,
        s"Prefix running sums need exact integer columns; ${schema(i).name} is $dt")
    }
    val sIsInt = sIdx.map(i => schema(i).dataType == IntegerType)
    gIdx.foreach { i =>
      require(hasValueEquality(schema(i).dataType),
        s"Prefix group columns need value-based equality on their internal " +
          s"representation; ${schema(i).name} is ${schema(i).dataType} " +
          "(binary/map internals compare by reference)")
    }
    val gAcc = gIdx.map(i => InternalRow.getAccessor(schema(i).dataType, nullable = true))
    val nSums = sIdx.length
    def sval(r: InternalRow, i: Int): Long = {
      val idx = sIdx(i)
      if (r.isNullAt(idx)) throw new IllegalArgumentException(
        s"Prefix sum column ${sumSrcs(i)}: null value")
      if (sIsInt(i)) r.getInt(idx).toLong else r.getLong(idx)
    }
    // Sort output reuses row buffers, so key values held across rows
    // must be copied out — but ONLY on a group change: the range sort
    // orders by (group ++ sort), so each partition's groups are
    // contiguous runs, and rows inside a run are compared IN PLACE
    // against the held copy (no per-row allocation or value copy).
    def copyKey(r: InternalRow): Array[Any] = {
      val a = new Array[Any](gIdx.length)
      var i = 0
      while (i < gIdx.length) {
        a(i) = InternalRow.copyValue(gAcc(i)(r, gIdx(i)))
        i += 1
      }
      a
    }
    def keyEquals(r: InternalRow, held: Array[Any]): Boolean = {
      var i = 0
      while (i < gIdx.length) {
        val v = gAcc(i)(r, gIdx(i))
        val h = held(i)
        if (if (v == null) h != null else !v.equals(h)) return false
        i += 1
      }
      true
    }
    def wrap(a: Array[Any]): Seq[Any] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    // ungrouped fast path: most call sites have no group columns — skip
    // key handling entirely
    val grouped = gIdx.nonEmpty
    val emptyKey: Seq[Any] = Nil

    // pass 1 (small job): per-(partition, group) row counts and sums, in
    // each partition's encounter order. ≤ P * |groups| tiny tuples on
    // the driver — bounded by the partition count by construction.
    val partials: Array[(Int, Seq[(Seq[Any], Long, Array[Long])])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        if (!grouped) {
          var c = 0L
          val ss = new Array[Long](nSums)
          it.foreach { r =>
            var i = 0
            while (i < nSums) { ss(i) += sval(r, i); i += 1 }
            c += 1L
          }
          Iterator.single((pid, if (c == 0L) Nil else Seq((emptyKey, c, ss))))
        } else {
          // groups are contiguous runs in the (group ++ sort)-sorted
          // partition: run-length accumulate, one key copy per group.
          // Fail FAST (in the executor, before anything is collected)
          // if the group domain violates the small-domain contract —
          // runs per partition ≈ groups per partition under the range
          // sort, so a cap here bounds the driver's offset map.
          val out = Seq.newBuilder[(Seq[Any], Long, Array[Long])]
          var held: Array[Any] = null
          var c = 0L
          var runs = 0
          var ss: Array[Long] = null
          it.foreach { r =>
            if (held == null || !keyEquals(r, held)) {
              if (held != null) out += ((wrap(held), c, ss))
              held = copyKey(r)
              runs += 1
              if (runs > maxGroups) throw new IllegalArgumentException(
                s"Prefix.orderStats: more than $maxGroups distinct group keys " +
                  s"in one range partition (partition $pid) — the group " +
                  "columns must be a SMALL domain (the driver holds one " +
                  "offset per (group, partition)). For a high-cardinality " +
                  "key, use Window.partitionBy(key) instead: per-key " +
                  "windows distribute on their own.")
              c = 0L
              ss = new Array[Long](nSums)
            }
            var i = 0
            while (i < nSums) { ss(i) += sval(r, i); i += 1 }
            c += 1L
          }
          if (held != null) out += ((wrap(held), c, ss))
          Iterator.single((pid, out.result()))
        }
      }.collect()
    // recheck the collected TOTAL: per-partition runs can each pass the
    // cap while their union still exceeds it (groups split across few
    // partitions each). Range sorting keeps groups contiguous, so total
    // runs ≤ |groups| + P - 1.
    require(partials.iterator.map(_._2.size.toLong).sum <= maxGroups.toLong + P,
      s"Prefix.orderStats: pass-1 subtotals exceed $maxGroups entries — " +
        "group columns must be a SMALL domain; use Window.partitionBy for " +
        "high-cardinality keys")

    // driver: exclusive prefix offsets per (group, pid) + group totals
    val byGroup = partials.sortBy(_._1)
      .flatMap { case (pid, gs) => gs.map { case (k, c, ss) => (k, pid, c, ss) } }
      .groupBy(_._1)
    val offsets: Map[(Seq[Any], Int), (Long, Array[Long])] = byGroup.flatMap {
      case (_, rows) =>
        var cnt = 0L
        val ss = new Array[Long](nSums)
        rows.sortBy(_._2).map { case (k, pid, c, s) =>
          val off = ((k, pid), (cnt, ss.clone()))
          cnt += c
          var i = 0
          while (i < nSums) { ss(i) += s(i); i += 1 }
          off
        }
    }
    // group total row count + total sum per sum column (pass 1 already
    // paid for them — exposed via groupCount/groupSums for free)
    val totals: Map[Seq[Any], (Long, Array[Long])] =
      byGroup.map { case (k, rows) =>
        val ts = new Array[Long](nSums)
        rows.foreach { case (_, _, _, s) =>
          var i = 0
          while (i < nSums) { ts(i) += s(i); i += 1 }
        }
        (k, (rows.map(_._3).sum, ts))
      }
    val bcOff = spark.sparkContext.broadcast(offsets)
    val bcTot = spark.sparkContext.broadcast(totals)

    // SQL-standard NTILE from the global row number and total count:
    // base = n div k rows per bucket; the first n mod k buckets get one
    // extra row.
    def ntileOf(grn: Long, n: Long, k: Int): Int = {
      val base = n / k
      val rem = n % k
      if (grn <= rem * (base + 1)) ((grn - 1) / (base + 1) + 1).toInt
      else (rem + (grn - rem * (base + 1) - 1) / base + 1).toInt
    }

    // pass 2: streaming per-partition scan (the shuffle map outputs are
    // reused from pass 1; only the reduce-side sort re-runs). Emits a
    // reused JoinedRow(input, stats) — RDDScanExec's own projection
    // materializes each row before anything downstream sees the next.
    val kList = ntiles.map(_._1).toArray
    val cumIdx = cumSums.map(c => sumSrcs.indexOf(c._1)).toArray
    val exclIdx = cumSumsExclusive.map(c => sumSrcs.indexOf(c._1)).toArray
    val gsumIdx = groupSums.map(c => sumSrcs.indexOf(c._1)).toArray
    val nStats = rn.size + cumIdx.length + exclIdx.length + kList.length +
      groupCount.size + gsumIdx.length
    val hasCount = groupCount.isDefined
    val out: RDD[InternalRow] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val offMap = bcOff.value
      val totMap = bcTot.value
      val stats = new GenericInternalRow(nStats)
      val joined = new JoinedRow
      var heldKey: Array[Any] = null
      var started = false
      var lrn = 0L
      var rnOff = 0L
      var total = 0L
      var totSums: Array[Long] = null
      val runSums = new Array[Long](nSums)
      val sumOffs = new Array[Long](nSums)
      it.map { r =>
        if (!started || (grouped && !keyEquals(r, heldKey))) {
          started = true
          val k = if (grouped) { heldKey = copyKey(r); wrap(heldKey) } else emptyKey
          lrn = 0L
          java.util.Arrays.fill(runSums, 0L)
          val (ro, so) = offMap((k, pid))
          rnOff = ro
          System.arraycopy(so, 0, sumOffs, 0, nSums)
          val (tc, ts) = totMap(k)
          total = tc
          totSums = ts
        }
        lrn += 1L
        val grn = rnOff + lrn
        var i = 0
        while (i < nSums) { runSums(i) += sval(r, i); i += 1 }
        var j = 0
        rn.foreach { _ => stats.update(j, grn); j += 1 }
        cumIdx.foreach { i => stats.update(j, sumOffs(i) + runSums(i)); j += 1 }
        exclIdx.foreach { i =>
          stats.update(j, sumOffs(i) + runSums(i) - sval(r, i)); j += 1
        }
        kList.foreach { kk => stats.update(j, ntileOf(grn, total, kk)); j += 1 }
        if (hasCount) { stats.update(j, total); j += 1 }
        gsumIdx.foreach { i => stats.update(j, totSums(i)); j += 1 }
        joined(r, stats)
      }
    }
    val statFields =
      rn.map(StructField(_, LongType, nullable = false)).toSeq ++
        cumSums.map { case (_, o) => StructField(o, LongType, nullable = false) } ++
        cumSumsExclusive.map { case (_, o) => StructField(o, LongType, nullable = false) } ++
        ntiles.map { case (_, o) => StructField(o, IntegerType, nullable = false) } ++
        groupCount.map(StructField(_, LongType, nullable = false)).toSeq ++
        groupSums.map { case (_, o) => StructField(o, LongType, nullable = false) }
    InternalBridge.internalCreateDataFrame(
      spark, out, StructType(schema.fields ++ statFields))
  }
}
