package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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
  * Requirements on the caller:
  *   - `sort` must be a TOTAL order (include a unique tiebreak column)
  *     — the same requirement the engine-determinism contract already
  *     imposes on every ranked query;
  *   - running-sum value columns must be non-null `LongType` (or
  *     `IntegerType`, summed as long — exactly what `sum(long)` over a
  *     window returns); float sums would change under regrouping;
  *   - `group` columns, if any, must be a SMALL domain (they replace a
  *     tiny-domain `partitionBy` whose groups are corpus-sized; the
  *     driver holds one offset entry per (group, partition)).
  */
object Prefix {

  /** Adds global order statistics over `sort` (within optional `group`
    * columns) to `df`:
    *   - `rn`: global 1-based row_number column name (LongType);
    *   - `cumSums`: (valueCol, outCol) inclusive running sums
    *     (UNBOUNDED PRECEDING .. CURRENT ROW, LongType);
    *   - `cumSumsExclusive`: (valueCol, outCol) exclusive running sums
    *     (UNBOUNDED PRECEDING .. 1 PRECEDING), 0 for the first row;
    *   - `ntiles`: (k, outCol) SQL-standard NTILE(k) buckets
    *     (IntegerType).
    */
  def orderStats(
      df: DataFrame,
      sort: Seq[Column],
      group: Seq[String] = Nil,
      rn: Option[String] = None,
      cumSums: Seq[(String, String)] = Nil,
      cumSumsExclusive: Seq[(String, String)] = Nil,
      ntiles: Seq[(Int, String)] = Nil): DataFrame = {
    val spark = df.sparkSession
    val P = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = group.map(df.col) ++ sort
    // ONE sorted Dataset → ONE lazy `.rdd` → ONE range partitioner
    // shared by the subtotal job and the scan job.
    val sorted = df.repartitionByRange(P, keys: _*).sortWithinPartitions(keys: _*)
    val schema = sorted.schema
    val rdd = sorted.rdd
    val sumSrcs = (cumSums ++ cumSumsExclusive).map(_._1).distinct
    val gIdx = group.map(schema.fieldIndex).toArray
    val sIdx = sumSrcs.map(schema.fieldIndex).toArray
    sIdx.foreach { i =>
      val dt = schema(i).dataType
      require(dt == LongType || dt == IntegerType,
        s"Prefix running sums need exact integer columns; ${schema(i).name} is $dt")
    }
    def sval(r: Row, i: Int): Long = r.get(sIdx(i)) match {
      case l: Long => l
      case n: Int  => n.toLong
      case other   => throw new IllegalArgumentException(
        s"Prefix sum column ${sumSrcs(i)}: non-integer value $other")
    }
    val nSums = sIdx.length

    // pass 1 (small job): per-(partition, group) row counts and sums, in
    // each partition's encounter order. ≤ P * |groups| tiny tuples on
    // the driver — bounded by the partition count by construction.
    val partials: Array[(Int, Seq[(Seq[Any], Long, Array[Long])])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[Seq[Any], (Long, Array[Long])]
        it.foreach { r =>
          val k = gIdx.map(r.get).toSeq
          val (c, ss) = acc.getOrElseUpdate(k, (0L, new Array[Long](nSums)))
          var i = 0
          while (i < nSums) { ss(i) += sval(r, i); i += 1 }
          acc.update(k, (c + 1L, ss))
        }
        Iterator.single((pid, acc.iterator.map { case (k, (c, ss)) => (k, c, ss) }.toSeq))
      }.collect()

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
    val totals: Map[Seq[Any], Long] =
      byGroup.map { case (k, rows) => (k, rows.map(_._3).sum) }
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
    // reused from pass 1; only the reduce-side sort re-runs).
    val kList = ntiles.map(_._1).toArray
    val cumIdx = cumSums.map(c => sumSrcs.indexOf(c._1)).toArray
    val exclIdx = cumSumsExclusive.map(c => sumSrcs.indexOf(c._1)).toArray
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val offMap = bcOff.value
      val totMap = bcTot.value
      var curKey: Seq[Any] = null
      var lrn = 0L
      var rnOff = 0L
      var total = 0L
      val runSums = new Array[Long](nSums)
      val sumOffs = new Array[Long](nSums)
      it.map { r =>
        val k = gIdx.map(r.get).toSeq
        if (curKey == null || k != curKey) {
          curKey = k
          lrn = 0L
          java.util.Arrays.fill(runSums, 0L)
          val (ro, so) = offMap((k, pid))
          rnOff = ro
          System.arraycopy(so, 0, sumOffs, 0, nSums)
          total = totMap(k)
        }
        lrn += 1L
        val grn = rnOff + lrn
        var i = 0
        while (i < nSums) { runSums(i) += sval(r, i); i += 1 }
        val stats = Seq.newBuilder[Any]
        rn.foreach(_ => stats += grn)
        cumIdx.foreach(i => stats += (sumOffs(i) + runSums(i)))
        exclIdx.foreach(i => stats += (sumOffs(i) + runSums(i) - sval(r, i)))
        kList.foreach(k => stats += ntileOf(grn, total, k))
        Row.fromSeq(r.toSeq ++ stats.result())
      }
    }
    val statFields =
      rn.map(StructField(_, LongType, nullable = false)).toSeq ++
        cumSums.map { case (_, o) => StructField(o, LongType, nullable = false) } ++
        cumSumsExclusive.map { case (_, o) => StructField(o, LongType, nullable = false) } ++
        ntiles.map { case (_, o) => StructField(o, IntegerType, nullable = false) }
    spark.createDataFrame(out, StructType(schema.fields ++ statFields))
  }
}
