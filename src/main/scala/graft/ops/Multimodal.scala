package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A media payload: opaque binary column + typed metadata. At 100 TB
  * the binary column rides in parquet alongside its metadata so
  * predicate/metadata queries never touch the bytes (column pruning),
  * and decode work partitions by row groups.
  */
case class MediaRecord(doc_id: Long, bytes: Array[Byte], mime: String)

/** Features produced by the (stubbed) decode stage. */
case class MediaFeatures(doc_id: Long, n_bytes: Int, header: Int,
    checksum: Long, width: Int, height: Int)

/** Multimodal-column operators: opaque binary payloads with typed
  * metadata, a batched decode/feature-extract stage, and the
  * documents⋈embeddings "text + vector" join.
  *
  * The decode step is a STUB (no image/audio codecs in this
  * container): [[Multimodal.decodeStub]] fabricates deterministic
  * dimensions from the bytes. Everything around it — the binary
  * schema, the typed Dataset encoders, the mapPartitions batching
  * shape (fixed-size batches, as a vectorized decoder would demand),
  * partition behavior — is real and exercised by MultimodalSpec.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  val BatchSize = 64

  /** Documents as binary media payloads (text bytes stand in for
    * image/audio blobs; schema and plumbing are payload-agnostic).
    */
  def asMedia(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"),
        lit("application/octet-stream").as("mime"))

  /** STUB decode: a real implementation would hand each fixed-size
    * batch of byte arrays to a native codec. Deterministic fake so the
    * pipeline is testable end-to-end.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val n = bytes.length
    (n % 640 + 16, n % 480 + 16)
  }

  /** Batched per-partition feature extraction over the binary column —
    * the Scala/Tungsten analog of a pandas_udf/mapInPandas stage:
    * fixed-size batches inside each partition, no shuffle, output is a
    * typed Dataset.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val crc = new java.util.zip.CRC32()
          crc.update(m.bytes)
          val (w, h) = decodeStub(m.bytes)
          MediaFeatures(m.doc_id, m.bytes.length,
            if (m.bytes.nonEmpty) m.bytes(0) & 0xff else -1,
            crc.getValue, w, h)
        }
      }
    }
  }

  val queries: Map[String, Q] = Map(
    // Text ⋈ embedding vector by id: the canonical multimodal row.
    "q_multimodal_join" -> ((s, dir) =>
      Tables(s, dir, "documents")
        .join(Tables(s, dir, "embeddings"), col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("label"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).as("e0"))
        .orderBy(col("doc_id"))),

    // Byte-level metadata of the binary payload column.
    "q_multimodal_bytes" -> ((s, dir) =>
      asMedia(s, dir)
        .select(col("doc_id"), length(col("bytes")).as("n_bytes"))
        .orderBy(col("doc_id"))),

    // Full binary → batched-decode → features pipeline (stub decode;
    // no SQL oracle — rows-only check + MultimodalSpec assertions).
    "q_multimodal_features" -> ((s, dir) =>
      extractFeatures(asMedia(s, dir)).toDF().orderBy(col("doc_id"))),

    // Content-hash dedup of binary payloads — identical media dedupe
    // WITHOUT decoding: one hash aggregate on md5(bytes), keeping the
    // smallest doc_id and the replica count. The corpus is doubled
    // (ids shifted) so every payload genuinely has a duplicate to
    // elect against. At 100 TB this is the first pass of any media
    // pipeline: the hash rides the parquet scan (bytes never shuffle
    // — only the 16-byte digest and the id), and survivors alone
    // reach the decode stage.
    "q_multimodal_dedup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val doubled = docs.unionByName(
        docs.withColumn("doc_id", col("doc_id") + lit(100000L)))
      doubled
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .groupBy(md5(col("bytes")).as("content_md5"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
          min(length(col("bytes"))).as("n_bytes"))
        .orderBy(col("content_md5"))
    }),

    // Decode-batch packing: group media into fixed byte-budget
    // batches (8 KB) per source so downstream decode workers get
    // even-sized units of work — the scheduling pass that runs BEFORE
    // extractFeatures at scale (decode cost tracks bytes, not rows,
    // so row-count batches starve or blow up workers). Same exact
    // running-cumsum shape as q_pack_sequences: one window per
    // source partition over byte lengths — the payload itself never
    // moves, only (id, length).
    "q_multimodal_pack" -> ((s, dir) => {
      val budget = 8192L
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          length(col("text")).cast("long").as("n_bytes"))
        .withColumn("batch",
          floor((sum(col("n_bytes")).over(w) - col("n_bytes")) / budget))
        .groupBy(col("source"), col("batch"))
        .agg(count(lit(1)).as("n_items"), sum(col("n_bytes")).as("batch_bytes"))
        .orderBy(col("source"), col("batch"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_join" ->
      """SELECT doc_id, lang, n_chars, label,
        |  CAST(len(embedding) AS INT) AS dim, embedding[1] AS e0
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
    "q_multimodal_bytes" ->
      """SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_dedup" ->
      """WITH m AS (SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents)
        |SELECT md5(text) AS content_md5, min(doc_id) AS keep_id,
        |  count(*) AS n_copies, CAST(min(strlen(text)) AS INT) AS n_bytes
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_multimodal_pack" ->
      """WITH t AS (SELECT doc_id, source,
        |    CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents),
        |b AS (SELECT source, doc_id, n_bytes,
        |    CAST(floor((sum(n_bytes) OVER (PARTITION BY source
        |      ORDER BY doc_id) - n_bytes) / 8192) AS BIGINT) AS batch
        |  FROM t)
        |SELECT source, batch, count(*) AS n_items,
        |  CAST(sum(n_bytes) AS BIGINT) AS batch_bytes
        |FROM b GROUP BY source, batch
        |ORDER BY source, batch""".stripMargin
  )
}
