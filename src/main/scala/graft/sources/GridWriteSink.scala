package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE path for grid cell rows (i, j, v) — the sink twin
  * of [[GridSourceProvider]], completing the connector API surface with
  * the two-phase commit protocol a distributed sink needs (reference
  * analogue: the rank-0 gather + ordered write of `laplace-par.c:546-574`,
  * re-expressed as parallel task writes + a driver-side atomic commit):
  *
  *  - each task streams its rows to a STAGING file
  *    (`_staging/part-<partitionId>-<taskId>`), so concurrent speculative
  *    attempts of the same partition never collide (the task id is
  *    attempt-unique);
  *  - `commit(task)` returns the staged path + row count as the task's
  *    [[WriterCommitMessage]]; nothing is visible to readers yet;
  *  - the DRIVER's `BatchWrite.commit` — called once, only when every
  *    partition committed — atomically publishes exactly one staged file
  *    per partition (last committed attempt wins) by renaming into the
  *    target directory and writing a `_SUCCESS` manifest listing the
  *    published files + total rows;
  *  - `BatchWrite.abort` (any task failed for good) deletes ALL staged
  *    files, leaving the target untouched — a failed job is invisible.
  *
  * Readers treat the directory as committed iff `_SUCCESS` exists — the
  * same contract Hadoop output committers give parquet sinks, here
  * implemented explicitly against the V2 `BatchWrite` hooks so the
  * exactly-once shape is testable (GridSinkWriteSpec proves: commit
  * publishes exactly the task-committed rows; a failing job publishes
  * nothing and leaves no staging residue).
  *
  * Format: one CSV line `i,j,v` per cell with `%.10f` values — the byte
  * format of the reference's verbose dump (O14), so a published file set
  * concatenates to the same output the C gather prints.
  */
class GridSinkProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridSourceProvider.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("grid sink needs a path option"))
    new GridSinkTable(path)
  }
}

class GridSinkTable(path: String) extends Table with SupportsWrite {
  override def name(): String = s"laplace_grid_sink($path)"
  override def schema(): StructType = GridSourceProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fieldNames.sameElements(Array("i", "j", "v")),
      s"grid sink expects (i, j, v), got ${info.schema().fieldNames.mkString(",")}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GridBatchWrite(path)
      }
    }
  }
}

final case class GridCommitMessage(partitionId: Int, stagedPath: String,
    rows: Long) extends WriterCommitMessage

class GridBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GridWriterFactory(path)

  /** Driver-side atomic publish: one staged file per partition (the last
    * committed attempt wins — attempts are staged under distinct names,
    * so the losers are simply cleaned up), renamed into the target, plus
    * a _SUCCESS manifest. Rename within one directory tree is atomic on
    * POSIX; on an object store this step would be a manifest-only commit
    * (the staged names are already final-content immutable).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val winners = messages.collect { case m: GridCommitMessage => m }
      .groupBy(_.partitionId).map { case (_, ms) => ms.last }
      .toSeq.sortBy(_.partitionId)
    val published = winners.map { m =>
      val src = new java.io.File(m.stagedPath)
      val dst = new java.io.File(dir, s"part-${m.partitionId}.csv")
      if (!src.renameTo(dst))
        throw new java.io.IOException(s"commit rename failed: $src -> $dst")
      (dst.getName, m.rows)
    }
    cleanStaging()
    val manifest = published.map { case (f, r) => s"$f,$r" }.mkString("\n")
    val total = published.map(_._2).sum
    java.nio.file.Files.writeString(
      new java.io.File(dir, "_SUCCESS").toPath, s"total,$total\n$manifest\n")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanStaging()

  private def cleanStaging(): Unit = {
    val staging = new java.io.File(path, "_staging")
    Option(staging.listFiles()).foreach(_.foreach(_.delete()))
    staging.delete()
  }
}

class GridWriterFactory(path: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GridDataWriter(path, partitionId, taskId)
}

class GridDataWriter(path: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val staged = {
    val staging = new java.io.File(path, "_staging")
    staging.mkdirs()
    new java.io.File(staging, s"part-$partitionId-$taskId")
  }
  private val out = new java.io.BufferedWriter(new java.io.FileWriter(staged))
  private var rows = 0L

  override def write(record: InternalRow): Unit = {
    // %.10f — the reference dump format (laplace-seq.c:115, O14)
    out.write(s"${record.getLong(0)},${record.getLong(1)},")
    out.write("%.10f".formatLocal(java.util.Locale.ROOT, record.getDouble(2)))
    out.write("\n")
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    GridCommitMessage(partitionId, staged.getAbsolutePath, rows)
  }

  override def abort(): Unit = {
    out.close()
    staged.delete()
  }

  override def close(): Unit = ()
}
