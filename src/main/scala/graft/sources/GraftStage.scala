package graft.sources

import java.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 MICRO-BATCH READ — the OBJECT-STORE-SAFE staged
  * replay source (`format("graftstage")`).
  *
  * The file-source staging protocol ([[graft.streaming.Streams]])
  * leans on three POSIX primitives a 100 TB deployment's shared root
  * — an object store — does not have: settable MTIMES (micro-batch
  * order), per-file atomic RENAME (shard promotion) and SYMLINKS (the
  * shared staged-shard cache). This source re-expresses the same
  * replay contract with none of them load-bearing:
  *
  *  - **Order from the manifest, not mtimes.** The table directory
  *    holds shard data files plus a [[GraftSink]] manifest whose FILE
  *    ORDER is the micro-batch order: batch i replays file i. The
  *    stream's offset is the shard index; admission is one shard per
  *    trigger (the `maxFilesPerTrigger=1` contract), checkpointed and
  *    resumable like any DSv2 offset.
  *  - **Visibility from the manifest, not rename atomicity.**
  *    Executors write uniquely-named shard files that are INVISIBLE
  *    until the driver publishes the manifest naming them (generation
  *    + checksum + ddl — GraftSink's exact protocol, so a torn
  *    manifest fails loudly and a prefix publish gates exactly the
  *    shards it lists). Publishing a longer manifest at a higher
  *    generation APPENDS batches: a stream resuming from its
  *    checkpoint replays only the newly manifested shards.
  *  - **Sharing by path, not symlinks.** Consumers point at the
  *    shared directory itself; per-query state stays in each query's
  *    own checkpoint.
  *
  * Data files use GraftSink's line codec; like the sink, the file IO
  * here is java.nio against a shared filesystem and a production
  * deployment swaps it for the object-store client while keeping the
  * IDENTICAL manifest protocol (conditional-put on the generation
  * replaces the publish rename — the one rename left, on the manifest
  * itself, never on data).
  */
class GraftStageSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftstage"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    require(path != null, "graftstage requires a path")
    val m = GraftSink.readManifest(path).getOrElse(
      throw new IllegalArgumentException(
        s"no manifest at $path — nothing staged (publish one with " +
          "GraftStage.stage)"))
    StructType.fromDDL(m.ddl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStageTable(properties.get("path"), schema)
}

class GraftStageTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graftstage($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftStageScan(path, tableSchema)
    }
}

/** Batch form reuses [[GraftSinkScan]] verbatim (same manifest, same
  * codec) — the batch/stream parity every twin's oracle leans on.
  */
class GraftStageScan(path: String, schema: StructType) extends Scan {
  override def readSchema(): StructType = schema
  override def description(): String = s"graftstage manifest replay $path"
  override def toBatch: Batch = new GraftSinkScan(path, schema)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftStageStream(path, schema)
}

case class GraftStageOffset(i: Long) extends Offset {
  override def json: String = i.toString
}

class GraftStageStream(path: String, schema: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def files: Seq[String] =
    GraftSink.readManifest(path).map(_.files).getOrElse(Seq.empty)

  // AvailableNow pins the end at prepare time so a manifest published
  // mid-drain cannot extend THIS run (the next run picks it up)
  @volatile private var pinnedEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    pinnedEnd = Some(files.size.toLong)

  private def end: Long = pinnedEnd.getOrElse(files.size.toLong)

  override def initialOffset(): Offset = GraftStageOffset(0L)

  // ONE shard per trigger regardless of the engine's read limit — the
  // staged-replay contract is n genuine micro-batches in manifest
  // order, exactly what maxFilesPerTrigger=1 gave the file source
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(1)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    GraftStageOffset(math.min(start.asInstanceOf[GraftStageOffset].i + 1, end))
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "graftstage is admission-controlled; the engine calls " +
        "latestOffset(start, limit)")
  override def reportLatestOffset(): Offset = GraftStageOffset(end)

  override def planInputPartitions(start: Offset, stop: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStageOffset].i.toInt
    val e = stop.asInstanceOf[GraftStageOffset].i.toInt
    val fs = files
    require(e <= fs.size,
      s"offset $e beyond the ${fs.size}-shard manifest at $path — the " +
        "manifest regressed under a live checkpoint")
    (s until e).map(i => GraftSinkInputPartition(
      new java.io.File(path, fs(i)).getPath): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftSinkReaderFactory(schema.toDDL)

  override def deserializeOffset(json: String): Offset =
    GraftStageOffset(json.trim.toLong)
  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()
}

object GraftStage {
  /** Write `df` as `n` ordered shard data files (shard = keyCol % n)
    * under `dir` WITHOUT publishing a manifest — one source pass:
    * rows repartition by the shard value so each shard lands in
    * exactly one task, each task streams its shards to uniquely-named
    * files (invisible: nothing reads unmanifested files), empty
    * shards get an empty file so the stream still sees exactly n
    * batches. Returns the n file names in shard order, for [[publish]]
    * to gate — the caller chooses full or prefix visibility.
    */
  def stageFiles(df: DataFrame, dir: String, n: Int,
      keyCol: String = "event_id"): Seq[String] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val schema = df.schema
    val ddl = schema.toDDL
    val si = schema.length // __shard appended LAST: encode never reads it
    val written = df
      .withColumn("__shard", (col(keyCol) % n).cast("int"))
      .repartition(n, col("__shard"))
      .queryExecution.toRdd.mapPartitions { it =>
        val sch = StructType.fromDDL(ddl)
        // BufferedWriter, NOT PrintWriter: PrintWriter swallows
        // IOExceptions (sets a flag), so a disk-full mid-task would
        // let publish() manifest a silently truncated shard — the
        // same loud-failure rule GraftSinkWriter states
        val out = scala.collection.mutable.Map.empty[Int, (String, java.io.BufferedWriter)]
        it.foreach { row =>
          val sh = row.getInt(si)
          val (_, w) = out.getOrElseUpdate(sh, {
            val name = s"shard_${sh}_${java.util.UUID.randomUUID()}.gstage"
            (name, new java.io.BufferedWriter(new java.io.OutputStreamWriter(
              new java.io.FileOutputStream(new java.io.File(dir, name)),
              java.nio.charset.StandardCharsets.UTF_8)))
          })
          w.write(GraftSink.encode(row, sch)); w.newLine()
        }
        out.foreach(_._2._2.close()) // close() throws on buffered IO failure
        out.iterator.map { case (sh, (name, _)) => (sh, name) }
      }.collect().toMap
    (0 until n).map { i =>
      written.getOrElse(i, {
        val name = s"shard_${i}_${java.util.UUID.randomUUID()}.gstage"
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, name), Array.empty[Byte])
        name
      })
    }
  }

  /** Publish a manifest making exactly `files` (in order) visible at
    * generation `gen` — GraftSink's manifest protocol verbatim, so
    * the publish is the ONLY rename and a production root swaps it
    * for a conditional put. A prefix publish + a later full publish
    * at gen+1 is the append story: a checkpointed stream resumes with
    * only the newly visible shards.
    */
  def publish(dir: String, ddl: String, files: Seq[String],
      gen: Long): Unit = {
    val seg = GraftSink.writeSegment(dir, gen, files)
    GraftSink.writeManifest(dir,
      GraftSink.Manifest(ddl, files, gen, Seq(seg)))
  }

  /** stageFiles + full publish — the one-call form for callers that
    * stage a complete corpus. A staged replay dir is IMMUTABLE by
    * contract (the memo key encodes corpus + n + schema): an existing
    * n-shard manifest short-circuits, and an existing manifest with a
    * DIFFERENT shard count refuses loudly — re-publishing at gen 1
    * under a live higher-generation manifest would regress the
    * generation and replay different data under a checkpointed
    * stream's committed offsets.
    */
  def stage(df: DataFrame, dir: String, n: Int,
      keyCol: String = "event_id"): String =
    GraftSink.readManifest(dir) match {
      case Some(m) if m.files.size == n => dir
      case Some(m) => throw new IllegalStateException(
        s"$dir already holds a ${m.files.size}-shard manifest at " +
          s"gen ${m.gen} — staged replay dirs are immutable; use a " +
          s"fresh dir for an $n-shard stage (or publish() explicitly " +
          "for the append workflow)")
      case None =>
        publish(dir, df.schema.toDDL, stageFiles(df, dir, n, keyCol), 1L)
        dir
    }
}
