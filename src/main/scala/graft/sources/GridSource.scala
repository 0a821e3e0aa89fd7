package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector for the reference's grid generator
  * (SURVEY.md O1): `spark.read.format("graft.sources.GridSourceProvider")
  * .option("n", 64).option("partitions", 8).load()` yields the N×N
  * Laplace boundary grid as a first-class table — schema inference,
  * row-range partition planning (the reference's 1-D block split,
  * laplace-par.c:245-251), and column pruning pushed INTO the reader
  * (a `select("i")` never materializes `v`). The generator runs inside
  * each partition reader, so a 10^6-per-dim grid materializes fully in
  * parallel with zero driver state — the connector-API form of
  * [[graft.laplace.GridGen]].
  */
class GridSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSourceProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val n = Option(properties.get("n")).map(_.toInt).getOrElse(32)
    val parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(4)
    require(n >= 2, "grid needs n >= 2")
    require(parts >= 1, "grid needs partitions >= 1")
    new GridTable(n, parts)
  }
}

object GridSourceProvider {
  val schema: StructType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))
}

class GridTable(n: Int, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"laplace_grid(n=$n)"
  override def schema(): StructType = GridSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(n, parts)
}

class GridScanBuilder(n: Int, parts: Int)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters with SupportsPushDownAggregates {

  private var required: StructType = GridSourceProvider.schema
  private var accepted: Array[sources.Filter] = Array.empty
  // i-range the accepted filters bound: [lo, hi) row interval
  private var lo: Long = 0L
  private var hi: Long = n.toLong
  // pushed aggregation: supported agg tokens + whether grouped by i
  private var aggSpec: Option[GridAggSpec] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown (the footer-stats trick parquet scans use, in
    * connector form): COUNT(*)/COUNT(col)/MIN/MAX over the generated
    * grid — optionally GROUP BY i — have closed forms, so the scan
    * answers them with one row per partition (or per grid row) and
    * never materializes cells. Spark still runs the final merge agg
    * (supportCompletePushDown stays false), which keeps the contract
    * correct across partition pruning and multi-partition plans.
    */
  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: org.apache.spark.sql.connector.expressions.NamedReference
          if r.fieldNames.length == 1 => Some(r.fieldNames()(0))
        case _ => None
      }
    val groupByI = agg.groupByExpressions() match {
      case Array() => Some(false)
      case Array(g) if colOf(g).contains("i") => Some(true)
      case _ => None
    }
    val toks = agg.aggregateExpressions().map {
      case _: aggregate.CountStar => Some("count")
      case c: aggregate.Count if !c.isDistinct && colOf(c.column).isDefined =>
        Some("count") // i/j/v are non-nullable: COUNT(col) == COUNT(*)
      case m: aggregate.Min =>
        colOf(m.column).filter(Set("i", "j", "v")).map("min_" + _)
      case m: aggregate.Max =>
        colOf(m.column).filter(Set("i", "j", "v")).map("max_" + _)
      case _ => None
    }
    (groupByI, toks) match {
      case (Some(g), ts) if ts.forall(_.isDefined) =>
        aggSpec = Some(GridAggSpec(ts.flatten.toSeq, g)); true
      case _ => false
    }
  }

  /** Row-range pushdown (the reference's per-rank row ownership,
    * laplace-par.c:245-251, as scan pruning): conjunctive range
    * predicates on `i` are consumed EXACTLY — they narrow both the
    * partition plan (non-overlapping row blocks are never scheduled)
    * and each reader's row interval (no post-scan residual needed).
    * Anything else stays with Spark.
    */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (ok, residual) = filters.partition(consume)
    accepted = ok
    residual
  }

  private def consume(f: sources.Filter): Boolean = f match {
    case sources.And(l, r) =>
      // both arms must be consumable; probe without mutating first
      val (l0, h0) = (lo, hi)
      if (consume(l) && consume(r)) true
      else { lo = l0; hi = h0; false }
    case sources.EqualTo("i", v: Number) =>
      lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1); true
    case sources.GreaterThan("i", v: Number) =>
      lo = math.max(lo, v.longValue + 1); true
    case sources.GreaterThanOrEqual("i", v: Number) =>
      lo = math.max(lo, v.longValue); true
    case sources.LessThan("i", v: Number) =>
      hi = math.min(hi, v.longValue); true
    case sources.LessThanOrEqual("i", v: Number) =>
      hi = math.min(hi, v.longValue + 1); true
    case _ => false
  }

  override def pushedFilters(): Array[sources.Filter] = accepted

  override def build(): Scan = new GridScan(n, parts, required, lo, hi, aggSpec)
}

/** A pushed-down aggregation: ordered agg tokens (count / min_x /
  * max_x) plus whether the grouping is per grid row (GROUP BY i).
  */
case class GridAggSpec(tokens: Seq[String], groupByI: Boolean) {
  def schema: StructType = {
    val aggFields = tokens.map {
      case "count" => StructField("count", LongType, nullable = false)
      case t @ ("min_v" | "max_v") => StructField(t, DoubleType, nullable = false)
      case t => StructField(t, LongType, nullable = false)
    }
    StructType(
      (if (groupByI) Seq(StructField("i", LongType, nullable = false)) else Nil)
        ++ aggFields)
  }
}

class GridScan(n: Int, parts: Int, required: StructType, lo: Long, hi: Long,
    aggSpec: Option[GridAggSpec] = None)
  extends Scan with Batch with SupportsRuntimeFiltering {
  override def readSchema(): StructType =
    aggSpec.map(_.schema).getOrElse(required)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft.GridScan n=$n rows=[$lo,$hi) cols=[${required.fieldNames.mkString(",")}]" +
      aggSpec.map(a => s" PushedAggregates=[${a.tokens.mkString(",")}]" +
        (if (a.groupByI) " GroupBy=[i]" else "")).getOrElse("")

  /** Runtime filtering (the DSv2 form of dynamic partition pruning,
    * SPARK-35779): when the grid joins a dimension on `i` and the dim
    * carries a selective predicate, Spark hands this scan the dim's `i`
    * values at RUNTIME (a DynamicPruningSubquery off the reused
    * broadcast) and the scan re-plans, dropping row blocks containing
    * none of them. Pruning is best-effort by contract — readers may
    * still emit non-matching rows within a surviving block; the join
    * filters them — so consuming only In() is correct.
    */
  private var allowedI: Option[Set[Long]] = None
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // advertise `i` ONLY when it survives column pruning: Spark resolves
    // every advertised attribute against the scan's ACTUAL output and
    // throws at planning for a pruned one (a select("j","v") join would
    // crash, not merely skip pruning)
    if (readSchema().fieldNames.contains("i"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("i"))
    else Array.empty
  override def filter(filters: Array[sources.Filter]): Unit =
    filters.foreach {
      case sources.In("i", vs) =>
        val s = vs.collect { case v: Number => v.longValue }.toSet
        allowedI = Some(allowedI.fold(s)(_ intersect s))
      case _ => () // unrecognized runtime filters prune nothing
    }

  /** The reference's block-row split: first `n % parts` blocks get one
    * extra row (laplace-par.c:245-251). Blocks outside the pushed
    * [lo, hi) i-range are pruned here — they never become tasks — and
    * surviving blocks are clamped to the range so readers emit exactly
    * the matching rows. Blocks holding none of a runtime filter's `i`
    * values are pruned the same way, just later (at execution).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val base = n / parts
    val rem = n % parts
    var from = 0L
    (0 until math.min(parts, n)).flatMap { p =>
      val width = base + (if (p < rem) 1 else 0)
      val (bFrom, bTo) = (from, from + width)
      from += width
      val (cFrom, cTo) = (math.max(bFrom, lo), math.min(bTo, hi))
      if (cFrom < cTo && allowedI.forall(_.exists(v => v >= cFrom && v < cTo)))
        Some(GridInputPartition(cFrom, cTo))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    aggSpec match {
      case Some(a) => new GridAggReaderFactory(n, a)
      case None => new GridReaderFactory(n, required.fieldNames)
    }
}

case class GridInputPartition(rowFrom: Long, rowTo: Long) extends InputPartition

class GridReaderFactory(n: Int, columns: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GridInputPartition]
    new GridPartitionReader(n, p.rowFrom, p.rowTo, columns)
  }
}

/** Row-major scan of one row block; emits only the pruned columns. */
class GridPartitionReader(n: Int, rowFrom: Long, rowTo: Long, columns: Array[String])
  extends PartitionReader[InternalRow] {

  private var i = rowFrom
  private var j = -1L

  // boundary constants of laplace-common-impl.h:4-8 (studied, not copied)
  private def value(i: Long, j: Long): Double =
    if (i == 0) 4.56
    else if (i == n - 1) 9.85
    else if (j == 0) 7.32
    else if (j == n - 1) 6.88
    else 0.0

  override def next(): Boolean = {
    j += 1
    if (j == n) { j = 0; i += 1 }
    i < rowTo
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(columns.toSeq.map {
      case "i" => i
      case "j" => j
      case "v" => value(i, j)
    })

  override def close(): Unit = ()
}

class GridAggReaderFactory(n: Int, spec: GridAggSpec)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GridInputPartition]
    new GridAggPartitionReader(n, p.rowFrom, p.rowTo, spec)
  }
}

/** Closed-form partial aggregates for one row block [rowFrom, rowTo):
  * no cell is ever generated. Ungrouped: ONE row per partition (Spark's
  * final agg merges the partials). GROUP BY i: one row per grid row —
  * valid as a partial because each i lives entirely inside one block.
  *
  * v-statistics come from the boundary structure (the reader's `value`
  * if-chain): row 0 is all 4.56, row n-1 all 9.85, and an interior row
  * holds {7.32 at j=0, 0.0 between, 6.88 at j=n-1} (an interior row
  * implies n >= 3, so the 0.0 cells exist whenever such a row does).
  */
class GridAggPartitionReader(n: Int, rowFrom: Long, rowTo: Long, spec: GridAggSpec)
  extends PartitionReader[InternalRow] {

  private def vStats(f: Long, t: Long): (Double, Double) = {
    val cand = Seq.newBuilder[Double]
    if (f == 0) cand += 4.56
    if (t == n) cand += 9.85
    if (math.max(f, 1L) < math.min(t, (n - 1).toLong)) cand ++= Seq(7.32, 0.0, 6.88)
    val vs = cand.result()
    (vs.min, vs.max)
  }

  private def row(f: Long, t: Long, withKey: Boolean): InternalRow = {
    lazy val (minV, maxV) = vStats(f, t)
    val aggs: Seq[Any] = spec.tokens.map {
      case "count" => (t - f) * n
      case "min_i" => f
      case "max_i" => t - 1
      case "min_j" => 0L
      case "max_j" => (n - 1).toLong
      case "min_v" => minV
      case "max_v" => maxV
    }
    InternalRow.fromSeq(if (withKey) f +: aggs else aggs)
  }

  private var emitted = 0L
  private val total = if (spec.groupByI) rowTo - rowFrom else 1L
  override def next(): Boolean = { emitted += 1; emitted <= total }
  override def get(): InternalRow =
    if (spec.groupByI) row(rowFrom + emitted - 1, rowFrom + emitted, withKey = true)
    else row(rowFrom, rowTo, withKey = false)
  override def close(): Unit = ()
}
