package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE path — the sink symmetry to [[GraftGenSource]]'s
  * read surface, demonstrating exactly-once batch-sink semantics at
  * the connector layer (the reference's only executed write is the
  * per-row Postgres INSERT loop, dags/ETL.py:131-140; this is what
  * that sink becomes as a planned, task-parallel, transactional V2
  * write):
  *
  *  - **task writes are invisible until job commit.** Each
  *    `DataWriter` streams its partition to a uniquely-named data file
  *    and returns the file name + row count in its commit MESSAGE;
  *    readers never list the directory — they read ONLY files named by
  *    the commit MANIFEST, so an orphan file from a zombie/speculative
  *    task can never leak rows (the exactly-once visibility rule every
  *    table format — Iceberg/Delta — builds on).
  *  - **job commit is one atomic manifest publish.** `BatchWrite
  *    .commit` writes the manifest (schema DDL + committed file list)
  *    to a temp name and RENAMEs it over the live one — readers see
  *    the old committed state or the new one, never a partial write.
  *    Append mode carries the previous manifest's files forward;
  *    truncate (overwrite) starts the list fresh.
  *  - **abort undoes everything.** A failed task's own
  *    `DataWriter.abort` deletes its file; `BatchWrite.abort` deletes
  *    every succeeded task's file; the manifest is untouched, so the
  *    visible table state is exactly the pre-job commit.
  *
  * Data files are a trivial line format (URL-encoded strings, \t
  * separators — deterministic round-trip for the atomic types the
  * spec exercises) on the shared local filesystem; production swaps
  * the file IO for an object store and keeps the IDENTICAL manifest
  * protocol. `option("failAtId", k)` injects a mid-write task failure
  * (the writer throws on row id = k) so the abort path is EXECUTED by
  * the spec, not just implemented.
  */
class GraftSinkSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftsink"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "graftsink requires option(\"path\", ...)")
    GraftSink.readManifest(path)
      .map(m => StructType.fromDDL(m.ddl))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed graftsink manifest under $path"))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null, "graftsink requires option(\"path\", ...)")
    new GraftSinkTable(path, schema,
      Option(properties.get("failAtId")).map(_.toLong))
  }
}

object GraftSink {
  val ManifestName = "_graftsink_manifest"

  case class Manifest(ddl: String, files: Seq[String])

  def readManifest(path: String): Option[Manifest] = {
    val f = new java.io.File(path, ManifestName)
    if (!f.exists()) None
    else {
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      Some(Manifest(lines.get(0),
        (1 until lines.size()).map(lines.get(_)).toSeq))
    }
  }

  /** Atomic publish: write to a temp name, rename over the live one. */
  def writeManifest(path: String, m: Manifest): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val tmp = java.nio.file.Files.createTempFile(dir.toPath, "_manifest", ".tmp")
    java.nio.file.Files.write(tmp,
      (m.ddl +: m.files).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, new java.io.File(dir, ManifestName).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private[sources] def encode(row: InternalRow, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (row.isNullAt(i)) "\\N"
      else f.dataType match {
        case LongType => row.getLong(i).toString
        case IntegerType => row.getInt(i).toString
        case DoubleType => row.getDouble(i).toString
        case BooleanType => row.getBoolean(i).toString
        case StringType =>
          java.net.URLEncoder.encode(row.getString(i), "UTF-8")
        case DateType => row.getInt(i).toString
        case dt => throw new IllegalArgumentException(
          s"graftsink demo supports atomic types only, got $dt")
      }
    }.mkString("\t")

  private[sources] def decode(line: String, schema: StructType): InternalRow = {
    val parts = line.split("\t", -1)
    val vals = schema.fields.zipWithIndex.map { case (f, i) =>
      val s = parts(i)
      if (s == "\\N") null
      else f.dataType match {
        case LongType => java.lang.Long.valueOf(s)
        case IntegerType => java.lang.Integer.valueOf(s)
        case DoubleType => java.lang.Double.valueOf(s)
        case BooleanType => java.lang.Boolean.valueOf(s)
        case StringType =>
          UTF8String.fromString(java.net.URLDecoder.decode(s, "UTF-8"))
        case DateType => java.lang.Integer.valueOf(s)
        case dt => throw new IllegalArgumentException(s"unsupported $dt")
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }
}

class GraftSinkTable(path: String, tableSchema: StructType,
    failAtId: Option[Long]) extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graftsink($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.BATCH_READ,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftSinkWriteBuilder(path, info.schema(), failAtId,
      truncate = false)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftSinkScan(path, tableSchema)
    }
}

class GraftSinkWriteBuilder(path: String, schema: StructType,
    failAtId: Option[Long], truncate: Boolean)
  extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new GraftSinkWriteBuilder(path, schema, failAtId, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftSinkBatchWrite(path, schema, failAtId, truncate)
  }
}

case class GraftSinkCommit(file: String, rows: Long) extends WriterCommitMessage

class GraftSinkBatchWrite(path: String, schema: StructType,
    failAtId: Option[Long], truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    GraftSinkWriterFactory(path, schema.toDDL, failAtId)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.map(_.asInstanceOf[GraftSinkCommit].file).toSeq
    val prevManifest = GraftSink.readManifest(path)
    // append must not silently re-type the carried-forward generation:
    // decode is positional, so a different column order/type in the
    // appended frame would parse OLD files under the NEW DDL
    if (!truncate)
      prevManifest.foreach { m =>
        require(m.ddl == schema.toDDL,
          s"graftsink append schema mismatch: table has [${m.ddl}], " +
            s"write has [${schema.toDDL}]")
      }
    val prev =
      if (truncate) Seq.empty
      else prevManifest.map(_.files).getOrElse(Seq.empty)
    // truncate drops the superseded generation's files AFTER the new
    // manifest is live (publish first, clean second — a crash between
    // the two leaks garbage files, never wrong rows)
    GraftSink.writeManifest(path,
      GraftSink.Manifest(schema.toDDL, prev ++ committed))
    if (truncate) {
      val keep = committed.toSet
      Option(new java.io.File(path).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.endsWith(".gsink") && !keep(f.getName))
        .foreach(_.delete())
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftSinkCommit(file, _) =>
        new java.io.File(path, file).delete(); ()
      case _ => ()
    }
}

case class GraftSinkWriterFactory(path: String, ddl: String,
    failAtId: Option[Long]) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new GraftSinkWriter(path, StructType.fromDDL(ddl), failAtId,
      partitionId, taskId)
}

class GraftSinkWriter(path: String, schema: StructType,
    failAtId: Option[Long], partitionId: Int, taskId: Long)
  extends DataWriter[InternalRow] {

  private val fileName =
    s"part-$partitionId-$taskId-${java.util.UUID.randomUUID()}.gsink"
  private val file = { new java.io.File(path).mkdirs()
    new java.io.File(path, fileName) }
  // BufferedWriter, NOT PrintWriter: PrintWriter swallows IOExceptions
  // (checkError polling), so a disk-full mid-task would let commit()
  // publish a silently truncated file into the manifest — the write
  // path must THROW so the task aborts and the file never commits
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(file), "UTF-8"))
  private var rows = 0L
  private val idIdx = schema.fieldNames.indexOf("id")

  override def write(record: InternalRow): Unit = {
    // injected mid-write task failure (spec-only): EXECUTES the abort
    // path — the writer dies with its file already partially on disk,
    // which is exactly what the manifest protocol must tolerate
    failAtId.foreach { k =>
      if (idIdx >= 0 && !record.isNullAt(idIdx) && record.getLong(idIdx) == k)
        throw new RuntimeException(s"graftsink: injected failure at id=$k")
    }
    out.write(GraftSink.encode(record, schema))
    out.newLine()
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    // flush + close throw on failure — a file that cannot be fully
    // persisted must fail the task, not enter the manifest
    out.close()
    GraftSinkCommit(fileName, rows)
  }

  override def abort(): Unit = {
    out.close()
    file.delete()
    ()
  }

  override def close(): Unit = out.close()
}

class GraftSinkScan(path: String, schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graftsink manifest scan $path"

  override def planInputPartitions(): Array[InputPartition] = {
    // manifest-gated visibility: one partition per COMMITTED file —
    // orphan .gsink files in the directory are never read
    val files = GraftSink.readManifest(path).map(_.files).getOrElse(Seq.empty)
    files.map(f => GraftSinkInputPartition(new java.io.File(path, f).getPath)
      .asInstanceOf[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftSinkReaderFactory(schema.toDDL)
}

case class GraftSinkInputPartition(file: String) extends InputPartition

case class GraftSinkReaderFactory(ddl: String) extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val schema = StructType.fromDDL(ddl)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(
        partition.asInstanceOf[GraftSinkInputPartition].file))
    val it = lines.iterator()
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        val n = it.hasNext
        if (n) cur = GraftSink.decode(it.next(), schema)
        n
      }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}
