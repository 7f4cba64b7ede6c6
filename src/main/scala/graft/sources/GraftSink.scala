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
  *    .commit` writes this commit's file list as one immutable SEGMENT
  *    file, then writes the manifest (generation + checksum + schema
  *    DDL + segment references) to a temp name and RENAMEs it over the
  *    live one — readers see the old committed state or the new one,
  *    never a partial write. Append mode carries the previous
  *    manifest's segments forward (O(1) new bytes per commit, not the
  *    cumulative file list); truncate (overwrite) starts fresh;
  *    [[GraftSink.compact]] folds accumulated segments back into one.
  *  - **single writer per path.** Commits are optimistic, not
  *    serialized: the generation is re-read just before the publish
  *    rename and a concurrent bump fails the commit loudly, but the
  *    read→rename window is not atomic on a plain filesystem — run
  *    one writing job per table path (the Spark batch-sink norm);
  *    a multi-writer deployment swaps the rename for the object
  *    store's conditional-put on the generation.
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

  /** The committed table state. `files` is the flattened data-file
    * list (read back from the manifest's SEGMENTS — an append-heavy
    * table re-writes only one small segment per commit, never the
    * cumulative list; the Iceberg manifest-list shape); `gen` is the
    * monotonically increasing commit generation the optimistic
    * concurrency check compares; `segments` are the immutable
    * segment-file names the manifest references.
    */
  case class Manifest(ddl: String, files: Seq[String], gen: Long = 0L,
      segments: Seq[String] = Seq.empty)

  private val Header = "graftsink.v2"

  private def checksum(gen: Long, ddl: String, segments: Seq[String]): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest((s"$gen\n$ddl" +: segments).mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Read the live manifest and flatten its segments into the
    * committed file list. The checksum line covers generation + DDL +
    * segment list, so a torn or hand-edited manifest fails LOUDLY
    * instead of serving a partial table.
    *
    * A headerless first line is the LEGACY (pre-segment) format — one
    * DDL line followed by the cumulative data-file list. Those tables
    * stay readable: the legacy list parses as generation 0 with no
    * segment references, and the first commit on top materializes it
    * into a migration segment (see [[GraftSinkBatchWrite.commit]]),
    * upgrading the table in place.
    */
  def readManifest(path: String): Option[Manifest] = {
    val f = new java.io.File(path, ManifestName)
    if (!f.exists()) None
    else {
      val lines = java.nio.file.Files.readAllLines(f.toPath)
      require(lines.size() >= 1, s"$f is empty — manifest is corrupt")
      if (lines.get(0) != Header) {
        val ddl = lines.get(0)
        require(scala.util.Try(StructType.fromDDL(ddl)).isSuccess,
          s"$f is neither a $Header manifest nor a legacy (ddl + files) one")
        val files = (1 until lines.size()).map(lines.get(_))
          .filter(_.nonEmpty).toSeq
        return Some(Manifest(ddl, files, 0L, Seq.empty))
      }
      require(lines.size() >= 4,
        s"$f is not a complete $Header manifest")
      val gen = lines.get(1).stripPrefix("gen=").toLong
      val ck = lines.get(2).stripPrefix("checksum=")
      val ddl = lines.get(3)
      val segments = (4 until lines.size()).map(lines.get(_)).toSeq
      require(ck == checksum(gen, ddl, segments),
        s"$f checksum mismatch — manifest is corrupt")
      val files = segments.flatMap { sg =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files
          .readAllLines(new java.io.File(path, sg).toPath).asScala
          .filter(_.nonEmpty)
      }
      Some(Manifest(ddl, files, gen, segments))
    }
  }

  /** Write one immutable segment file listing this commit's data files
    * (temp name + atomic rename; the name embeds the generation for
    * operator legibility and a UUID for uniqueness). Returns the
    * segment name for the manifest to reference.
    */
  private[sources] def writeSegment(path: String, gen: Long,
      files: Seq[String]): String = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val name = s"_graftsink_seg_g${gen}_${java.util.UUID.randomUUID()}"
    val tmp = java.nio.file.Files.createTempFile(dir.toPath, "_seg", ".tmp")
    java.nio.file.Files.write(tmp, files.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, new java.io.File(dir, name).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    name
  }

  /** Atomic publish: write to a temp name, rename over the live one.
    * `m.files` is ignored — the manifest persists only the segment
    * references; readers flatten them.
    */
  def writeManifest(path: String, m: Manifest): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val tmp = java.nio.file.Files.createTempFile(dir.toPath, "_manifest", ".tmp")
    java.nio.file.Files.write(tmp,
      (Seq(Header, s"gen=${m.gen}",
        s"checksum=${checksum(m.gen, m.ddl, m.segments)}", m.ddl) ++
        m.segments).mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, new java.io.File(dir, ManifestName).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Merge every segment the live manifest references into ONE and
    * publish it as the next generation (the [[Layout.compact]] swap
    * discipline: build aside, publish atomically, clean superseded
    * files second) — the maintenance op that keeps an append-heavy
    * table's manifest-read cost O(1) instead of O(commits). Data files
    * are untouched, so reads are identical before/after; a crash
    * between publish and cleanup leaks orphan segment files, never
    * wrong rows. Single-writer, like every mutation here.
    *
    * READER RACE, stated: because segment flattening split the
    * manifest from its file lists, a reader that loaded the prior
    * manifest can crash on a segment this cleanup (or truncate's)
    * just deleted — the old self-contained manifest had no such
    * window. The exposure is one manifest-read-to-segment-read gap;
    * readers retry from the live manifest on a missing segment, or a
    * production deployment defers the delete by a grace period (the
    * Iceberg/Delta "vacuum after N hours" discipline). Not fixed
    * here: the demo's single-writer contract already serializes the
    * spec's readers with its maintenance ops.
    */
  def compact(path: String): Unit =
    readManifest(path).filter(_.segments.size > 1).foreach { m =>
      val merged = writeSegment(path, m.gen + 1, m.files)
      writeManifest(path, Manifest(m.ddl, Seq.empty, m.gen + 1, Seq(merged)))
      m.segments.foreach { sg => new java.io.File(path, sg).delete(); () }
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
        case TimestampType => row.getLong(i).toString // epoch micros
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
        case TimestampType => java.lang.Long.valueOf(s) // epoch micros
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
    val prevGen = prevManifest.map(_.gen).getOrElse(0L)
    val prevSegs =
      if (truncate) Seq.empty
      else prevManifest.map { m =>
        // legacy (pre-segment) table: its cumulative file list has no
        // segment to carry forward — materialize it as a migration
        // segment once, so this commit's manifest references the old
        // data like any other generation (a failed commit leaks the
        // migration segment as a garbage file, never wrong rows)
        if (m.segments.isEmpty && m.files.nonEmpty)
          Seq(GraftSink.writeSegment(path, prevGen + 1, m.files))
        else m.segments
      }.getOrElse(Seq.empty)
    // this commit's files go into ONE new immutable segment; the
    // manifest carries segment REFERENCES, so an append re-writes a
    // commit-sized file plus a segments-count-sized manifest — never
    // the cumulative data-file list
    val seg = GraftSink.writeSegment(path, prevGen + 1, committed)
    try {
      // OPTIMISTIC CONCURRENCY (single-writer-per-path is still the
      // supported mode — see class doc): re-read the generation just
      // before publishing; a bump since this commit started means a
      // concurrent writer won, and publishing over it would silently
      // drop that commit's segment. A true CAS needs the storage
      // layer's conditional-put (rename cannot compare) — this check
      // narrows the race to the read→rename window and turns the
      // common conflict into a loud failure instead of lost data.
      val liveGen = GraftSink.readManifest(path).map(_.gen).getOrElse(0L)
      if (liveGen != prevGen)
        throw new java.util.ConcurrentModificationException(
          s"graftsink commit conflict on $path: generation moved " +
            s"$prevGen -> $liveGen while this job was writing")
      GraftSink.writeManifest(path,
        GraftSink.Manifest(schema.toDDL, Seq.empty, prevGen + 1,
          prevSegs :+ seg))
    } catch {
      case t: Throwable =>
        new java.io.File(path, seg).delete()
        throw t
    }
    if (truncate) {
      // truncate drops the superseded generation's data AND segment
      // files AFTER the new manifest is live (publish first, clean
      // second — a crash between the two leaks garbage files, never
      // wrong rows)
      val keep = committed.toSet + seg
      Option(new java.io.File(path).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => (f.getName.endsWith(".gsink") ||
          f.getName.startsWith("_graftsink_seg_")) && !keep(f.getName))
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
    // close may THROW (the disk-full flush case the BufferedWriter
    // comment above anticipates) — the delete must still run, or the
    // abort path leaves the partial file as a permanent orphan
    try out.close() catch { case _: java.io.IOException => () }
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
