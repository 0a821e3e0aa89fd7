package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = GridSourceProvider.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GridScan(n, parts, required)
}

class GridScan(n: Int, parts: Int, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** The reference's block-row split: first `n % parts` blocks get one
    * extra row (laplace-par.c:245-251).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val base = n / parts
    val rem = n % parts
    var from = 0L
    (0 until math.min(parts, n)).map { p =>
      val width = base + (if (p < rem) 1 else 0)
      val ip = GridInputPartition(from, from + width)
      from += width
      ip
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory(n, required.fieldNames)
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
