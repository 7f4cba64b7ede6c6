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

/** Features produced by the real image-decode stage. */
case class MediaFeatures(doc_id: Long, width: Int, height: Int,
    n_pixels: Long, sum_lum: Long, mean_lum: Double)

/** Features produced by the real audio-decode stage: sample rate and
  * frame count come from the decoded WAV header, the amplitude
  * aggregates from the decoded PCM frames.
  */
case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Long,
    sum_abs: Long, peak: Int, mean_abs: Double)

/** Features produced by the video frame-sampling stage: container
  * metadata from the parsed header, luminance aggregates from the REAL
  * PNG decode of only the SAMPLED frames.
  */
case class VideoFeatures(doc_id: Long, n_frames: Int, fps: Int,
    n_sampled: Int, width: Int, height: Int, sum_lum: Long, mean_lum: Double)

/** 64-bit perceptual average-hash of a decoded image, split in two
  * non-negative 32-bit halves so BIGINT arithmetic never touches the
  * sign bit in either engine.
  */
case class PhashRecord(doc_id: Long, phash_hi: Long, phash_lo: Long)

/** Multimodal-column operators: opaque binary payloads with typed
  * metadata, a batched decode/feature-extract stage, and the
  * documents⋈embeddings "text + vector" join.
  *
  * The decode stage is REAL: each document carries a deterministic
  * tiny PNG (dimensions and pixel values are closed-form functions of
  * doc_id), encoded and decoded with the JDK's `javax.imageio` —
  * no native codecs needed. PNG is lossless, so the decoded pixel
  * aggregates equal the closed form and the DuckDB oracle can verify
  * the whole encode→decode→aggregate pipeline hash-exactly. The
  * surrounding plumbing — binary schema, typed Dataset encoders, the
  * fixed-size mapPartitions batching a vectorized decoder would
  * demand, partition behavior — is the same shape a JPEG/WebP/audio
  * decoder would ride; only the codec call changes.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  // ImageIO defaults to a DISK-backed stream cache: every encode and
  // decode spills through its own temp file, so a media stage doing
  // tens of thousands of codec calls serializes on file creation (the
  // q_video_frames bench entry measured 25 s at sf0.1 — ~35k codec
  // calls — almost all of it cache-file churn). The payloads here are
  // small in-memory byte arrays; cache in memory. Runs once per JVM at
  // object init, which happens on every executor that touches a codec
  // path through this object.
  javax.imageio.ImageIO.setUseCache(false)

  val BatchSize = 64

  /** Documents as binary media payloads (text bytes stand in for
    * image/audio blobs; schema and plumbing are payload-agnostic).
    */
  def asMedia(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"),
        lit("application/octet-stream").as("mime"))

  /** Deterministic tiny grayscale PNG for a document: width/height and
    * every pixel value are closed-form in doc_id (so an oracle can
    * recompute the decoded aggregates without any codec), encoded for
    * real through `javax.imageio.ImageIO`. Assumes doc_id ≥ 0 (true of
    * every table here): a negative id would make the % expressions
    * negative, which the two engines agree on arithmetically but which
    * would corrupt the packed RGB channels.
    */
  def pngFor(docId: Long): Array[Byte] = {
    val w = (docId % 24 + 8).toInt
    val h = (docId % 16 + 8).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((docId * 31 + x * 7 + y) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Documents as real PNG payloads, generated per partition on the
    * executors (the ingest stand-in for reading media files; the
    * binaryFile front door is exercised in SourcesSpec).
    */
  def asPngMedia(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    // the id list comes from ONE small parquet file (1-2 scan splits);
    // repartition it so the embarrassingly-parallel codec work uses
    // every core — the shuffle moves only 8-byte ids
    asPngMediaOf(Tables(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism))
  }

  /** [[asPngMedia]] for an arbitrary id frame — the streaming ingest
    * (Streams.crossmodalIngest) synthesizes each micro-batch's
    * payloads with the SAME generator the batch path uses, so the two
    * sides cannot drift on the image bytes.
    */
  def asPngMediaOf(ids: Dataset[Long]): Dataset[MediaRecord] = {
    import ids.sparkSession.implicits._
    ids.mapPartitions(_.map(id => MediaRecord(id, pngFor(id), "image/png")))
  }

  /** Real decode: ImageIO PNG read → dimensions + luminance sum (the
    * blue channel — all three channels carry the same value).
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    // ImageIO.read returns null (no exception) when no registered
    // reader handles the bytes — fail with the payload size instead of
    // an anonymous NPE deep in an executor stage
    require(img != null,
      s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
      y += 1
    }
    (w, h, sum)
  }

  /** Deterministic mono 16-bit PCM WAV for a document: sample count,
    * sample rate, and every sample value are closed-form in doc_id
    * (sawtooth-ish `(doc_id·131 + i·17) mod 4096 − 2048`), written
    * through the JDK's `javax.sound.sampled` WAVE writer — the audio
    * analog of [[pngFor]]. PCM WAV is lossless, so the decoded
    * amplitude aggregates equal the closed form and the oracle can
    * verify the container round-trip hash-exactly. Assumes doc_id ≥ 0
    * (negative ids would flip the % sign and corrupt the sample range).
    */
  def wavFor(docId: Long): Array[Byte] = {
    val n = (docId % 256 + 64).toInt
    val rate = (8000 + (docId % 4) * 4000).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((docId * 131 + i * 17) % 4096 - 2048).toInt
      pcm(2 * i) = (v & 0xff).toByte         // little-endian s16
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Documents as real WAV payloads, generated per partition on the
    * executors (the audio analog of [[asPngMedia]]).
    */
  def asWavMedia(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism) // see asPngMedia
      .mapPartitions(_.map(id => MediaRecord(id, wavFor(id), "audio/wav")))
  }

  /** Real audio decode: `javax.sound.sampled` WAV read → (sample rate,
    * frame count, Σ|sample|, max |sample|). Header fields come from
    * the decoded [[javax.sound.sampled.AudioFormat]], amplitudes from
    * the decoded little-endian PCM frames.
    */
  def decodeAudio(bytes: Array[Byte]): (Int, Long, Long, Int) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      !fmt.isBigEndian && fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"unexpected PCM layout: $fmt (${bytes.length} bytes)")
    val n = ais.getFrameLength
    val pcm = ais.readAllBytes()
    require(pcm.length == n * 2,
      s"short read: ${pcm.length} bytes for $n frames")
    var sum = 0L
    var peak = 0
    var i = 0
    while (i < pcm.length) {
      // Byte → Int promotion sign-extends, so the high byte shifted
      // left 8 ORed with the unsigned low byte IS the signed sample.
      val v = (pcm(i + 1) << 8) | (pcm(i) & 0xff)
      val a = math.abs(v)
      sum += a
      if (a > peak) peak = a
      i += 2
    }
    (fmt.getSampleRate.round, n, sum, peak)
  }

  /** Batched audio decode stage — same shape as [[extractFeatures]]:
    * fixed-size batches inside each partition, no shuffle, real codec
    * call per payload, only (id, features) leave the stage.
    */
  def extractAudioFeatures(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val (rate, n, sum, peak) = try decodeAudio(m.bytes) catch {
            case e: Exception => throw new IllegalArgumentException(
              s"doc_id=${m.doc_id}: undecodable audio (${e.getMessage})", e)
          }
          AudioFeatures(m.doc_id, rate, n, sum, peak,
            BigDecimal(sum.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
    }
  }

  /** Frame-sample stride for the video stage: decode every k-th frame,
    * skip the rest by seeking their length fields — decode cost is
    * O(sampled frames), container parse is O(header), exactly the
    * economics of real video feature extraction (where decoding every
    * frame of a 100 TB crawl is the budget-killer).
    */
  val FrameStride = 2

  /** Deterministic multi-frame "video" for a document — the third
    * modality: a length-prefixed container (magic `GVID`, frame count,
    * fps, then [len][PNG] per frame) whose frames are REAL PNGs with
    * closed-form pixels (frame i pixel (x,y) =
    * (doc_id·31 + i·13 + x·7 + y) mod 256, dimensions shared with
    * [[pngFor]]). Container parsing, frame seeking, and the per-frame
    * codec call are all real; only the codec is PNG instead of H.264 —
    * which is what keeps the sampled-frame aggregates closed-form so
    * the oracle can verify the parse→seek→decode pipeline hash-exactly.
    */
  def videoFor(docId: Long): Array[Byte] = {
    val w = (docId % 24 + 8).toInt
    val h = (docId % 16 + 8).toInt
    val m = (docId % 6 + 4).toInt
    val fps = ((docId % 3 + 1) * 5).toInt
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBytes("GVID"); out.writeInt(m); out.writeInt(fps)
    var i = 0
    while (i < m) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((docId * 31 + i * 13 + x * 7 + y) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val fb = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", fb)
      val png = fb.toByteArray
      out.writeInt(png.length); out.write(png)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Documents as video payloads (the video analog of [[asPngMedia]]). */
  def asVideoMedia(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism) // see asPngMedia
      .mapPartitions(_.map(id => MediaRecord(id, videoFor(id), "video/x-gvid")))
  }

  /** Parse the container header, SEEK past unsampled frames (skipBytes
    * on the length field — never decoded), decode every
    * [[FrameStride]]-th frame for real through ImageIO, and aggregate
    * luminance over the sampled frames only.
    */
  def decodeVideoSampled(bytes: Array[Byte]): (Int, Int, Int, Int, Int, Long) = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GVID",
      s"not a GVID container (${bytes.length} bytes)")
    val m = in.readInt()
    val fps = in.readInt()
    var sampled = 0
    var sum = 0L
    var w = 0
    var h = 0
    var i = 0
    while (i < m) {
      val len = in.readInt()
      if (i % FrameStride == 0) {
        val png = new Array[Byte](len)
        in.readFully(png)
        val (fw, fh, s) = decodeImage(png)
        w = fw; h = fh; sum += s; sampled += 1
      } else {
        var toSkip = len
        while (toSkip > 0) toSkip -= in.skipBytes(toSkip)
      }
      i += 1
    }
    (m, fps, sampled, w, h, sum)
  }

  /** Batched video frame-sampling stage — the same fixed-batch
    * per-partition shape as [[extractFeatures]]; only sampled frames
    * pay the codec.
    */
  def extractVideoFeatures(media: Dataset[MediaRecord]): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { rec =>
          val (m, fps, sampled, w, h, sum) = try decodeVideoSampled(rec.bytes)
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"doc_id=${rec.doc_id}: undecodable video (${e.getMessage})", e)
          }
          val px = sampled.toLong * w * h
          VideoFeatures(rec.doc_id, m, fps, sampled, w, h, sum,
            BigDecimal(sum.toDouble / px)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
    }
  }

  /** How many differing phash bits still count as "perceptually
    * near-duplicate". With the hash split into 4 16-bit bands, any
    * pair at hamming ≤ 3 shares at least one whole band (pigeonhole),
    * so band-bucket candidate generation is EXACT for this threshold —
    * the q_dedup_simhash discipline applied to pixels.
    */
  val PhashHammingMax = 3

  /** q_crossmodal_dedup's image bit budget. Looser than
    * [[PhashHammingMax]] because the text pair list already vouches
    * for the pair (two independent weak signals compose into a strong
    * one — the LAION-dedup calibration), and because the pair-list
    * probe is exact: no banding, so no pigeonhole bound ties the
    * budget to band count.
    */
  val CrossmodalHammingMax = 8

  /** Stop-band damping cap: band buckets holding more than this many
    * images are SKIPPED during candidate generation. On a corpus
    * whose perceptual-hash space saturates (the closed-form gradients
    * here: ~200 distinct band values at every SF, so Σ\|bucket\|² grows
    * quadratically — measured 22× for 10× rows uncapped), a band value
    * shared by a large fraction of the corpus carries no
    * discriminative information; dropping it bounds the candidate
    * product while pairs keep every chance via their other 3 bands.
    * This is the stop-shingle / cooccur-DfCap discipline applied to
    * pixels; only pairs whose EVERY shared band is saturated are
    * missed, which on a non-degenerate corpus is the noise floor. The
    * cap is mirrored verbatim in the oracle, so the contract stays
    * hash-exact.
    */
  val PhashBucketCap = 64

  /** 64-bit average-hash over the REAL decoded image: the 8×8 block
    * grid's mean luminance vs the global mean, bit i set when block i
    * is strictly brighter. The comparison is the integer cross-product
    * `block_sum · total_pixels > total_sum · block_pixels` — no
    * division, so the bits are exactly replayable from the closed-form
    * pixels by the oracle. aHash is shift-invariant in the useful
    * sense: adding a constant to every pixel leaves every bit
    * unchanged, which is exactly what makes it a perceptual (not
    * cryptographic) fingerprint.
    */
  def decodePhash(bytes: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null,
      s"undecodable image payload (${bytes.length} bytes)")
    val w = img.getWidth
    val h = img.getHeight
    val s = new Array[Long](64)
    val n = new Array[Long](64)
    var ts = 0L
    var y = 0
    while (y < h) {
      val rowBase = y * 8 / h * 8
      var x = 0
      while (x < w) {
        val v = (img.getRGB(x, y) & 0xff).toLong
        val idx = rowBase + x * 8 / w
        s(idx) += v; n(idx) += 1; ts += v
        x += 1
      }
      y += 1
    }
    val tn = w.toLong * h
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 64) {
      if (s(i) * tn > ts * n(i)) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** The per-doc 64-bit aHash table (doc_id, phash_hi, phash_lo),
    * decoded from the real PNGs ONCE per session and parked in
    * [[Scratch]] — every consumer (q_image_phash's three subtrees,
    * q_crossmodal_dedup) scans the 16-byte-per-doc parquet instead of
    * re-decoding or pinning executor storage.
    */
  private[graft] def sharedPhash(s: SparkSession, dir: String): DataFrame =
    Scratch.materialize(s, s"phash_$dir")(
      extractPhash(asPngMedia(s, dir)).toDF())

  /** SYMMETRIC image near-dup pairs (doc_id, nb): band the 64-bit
    * aHash into 4×16 bits, candidates only from shared NON-SATURATED
    * band buckets (stop-band damping via [[PhashBucketCap]] drops
    * saturated buckets from BOTH join sides before the candidate
    * product — never the n² image-pair space), verified by exact
    * hamming ≤ [[PhashHammingMax]] on the two 32-bit halves. Shared by
    * q_image_phash's census and q_crossmodal_dedup's intersection; the
    * hash table itself comes from [[sharedPhash]], so the corpus
    * decodes once per session however many consumers run.
    */
  private[ops] def phashPairs(s: SparkSession, dir: String): DataFrame = {
    val ph = sharedPhash(s, dir)
    val bands = ph.select(col("doc_id"),
      col("phash_hi").as("h1x"), col("phash_lo").as("l1x"),
      posexplode(array(
        col("phash_lo").bitwiseAND(65535),
        shiftright(col("phash_lo"), 16).bitwiseAND(65535),
        col("phash_hi").bitwiseAND(65535),
        shiftright(col("phash_hi"), 16).bitwiseAND(65535)))
        .as(Seq("band", "bv")))
    val keep = bands.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("c"))
      .where(col("c") <= PhashBucketCap)
      .select(col("band"), col("bv"))
    val live = bands.join(keep, Seq("band", "bv"))
    live
      .select(col("band"), col("bv"), col("doc_id").as("doc1"),
        col("h1x").as("h1"), col("l1x").as("l1"))
      .join(live.select(col("band"), col("bv"), col("doc_id").as("doc2"),
        col("h1x").as("h2"), col("l1x").as("l2")), Seq("band", "bv"))
      .where(col("doc1") =!= col("doc2") &&
        expr("bit_count(h1 ^ h2) + bit_count(l1 ^ l2)") <= PhashHammingMax)
      .select(col("doc1").as("doc_id"), col("doc2").as("nb"))
      .distinct()
  }

  /** Batched perceptual-hash stage — same per-partition batch shape as
    * [[extractFeatures]]; one real decode per payload, 16 bytes out.
    */
  def extractPhash(media: Dataset[MediaRecord]): Dataset[PhashRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val (hi, lo) = try decodePhash(m.bytes) catch {
            case e: IllegalArgumentException => throw new IllegalArgumentException(
              s"doc_id=${m.doc_id}: ${e.getMessage}", e)
          }
          PhashRecord(m.doc_id, hi, lo)
        }
      }
    }
  }

  /** Batched per-partition feature extraction over the binary column —
    * the Scala/Tungsten analog of a pandas_udf/mapInPandas stage:
    * fixed-size batches inside each partition, no shuffle, output is a
    * typed Dataset. The decode is a real ImageIO call per payload.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { m =>
          val (w, h, sum) = try decodeImage(m.bytes) catch {
            case e: IllegalArgumentException => throw new IllegalArgumentException(
              s"doc_id=${m.doc_id}: ${e.getMessage}", e)
          }
          val n = w.toLong * h
          MediaFeatures(m.doc_id, w, h, n, sum,
            BigDecimal(sum.toDouble / n)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
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

    // Full binary → batched-decode → features pipeline, decoding REAL
    // PNGs through javax.imageio. The oracle recomputes the decoded
    // aggregates from the closed-form pixel function (PNG is
    // lossless), so the codec round-trip itself is oracle-verified.
    "q_multimodal_features" -> ((s, dir) =>
      extractFeatures(asPngMedia(s, dir)).toDF().orderBy(col("doc_id"))),

    // Second real modality: binary → batched-decode → features over
    // WAV audio through javax.sound.sampled. Lossless PCM container,
    // so the oracle recomputes the decoded amplitude aggregates from
    // the closed-form sample function.
    "q_audio_features" -> ((s, dir) =>
      extractAudioFeatures(asWavMedia(s, dir)).toDF().orderBy(col("doc_id"))),

    // Third modality: frame-SAMPLED video features — parse the
    // container header, seek past unsampled frames, real PNG decode of
    // every FrameStride-th frame only. The decode economics (cost ∝
    // sampled frames, not stream length) are the whole point of frame
    // sampling at 100 TB; lossless frames keep the sampled aggregates
    // closed-form, so the parse→seek→decode pipeline is oracle-exact.
    "q_video_frames" -> ((s, dir) =>
      extractVideoFeatures(asVideoMedia(s, dir)).toDF().orderBy(col("doc_id"))),

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

    // Perceptual image near-dup: aHash every REAL decoded PNG, band
    // the 64-bit hash into 4×16 bits, candidates ONLY from shared
    // NON-SATURATED band buckets (pigeonhole gives hamming ≤
    // PhashHammingMax pairs at least one shared band; stop-band
    // damping — PhashBucketCap — then bounds the candidate product,
    // never the n² image-pair space), verify by exact hamming
    // distance on the two 32-bit halves. The per-doc hash is
    // 16 bytes, so at 100 TB of images the pair search shuffles a
    // hash table, never pixels; the decode is the map-only stage.
    // OUTPUT is the per-doc census (neighbor count + canonical = the
    // smallest near-dup id), NOT the pair list: the closed-form
    // gradient corpus is pathologically self-similar (aHash bits are
    // shift-invariant, and the generator shifts pixels by constants
    // between docs), so the verified pair SET is quadratic in this
    // data — the per-doc aggregate keeps the output linear while the
    // banded join still does the real work (same lesson as the
    // shingle-saturation note in BENCH_SCALING.md: a data property,
    // not a plan property).
    "q_image_phash" -> ((s, dir) => {
      val census = phashPairs(s, dir).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_near"), min(col("nb")).as("mn"))
      sharedPhash(s, dir).select(col("doc_id"))
        .join(census, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_near"), lit(0L)).as("n_near"),
          least(col("doc_id"), coalesce(col("mn"), col("doc_id")))
            .as("canon"))
        .orderBy(col("doc_id"))
    }),

    // Cross-modal (caption, image) pair dedup — the LAION-style pass:
    // a record pair is a crossmodal duplicate only when BOTH
    // modalities collide — captions n-gram-Jaccard ≥ 0.6 (the shared
    // text pair list) AND images within CrossmodalHammingMax aHash
    // bits, verified by EXACT hamming against the shared 16-byte hash
    // table. Text-only matches (same boilerplate caption, different
    // product photos) and image-only matches (same stock photo,
    // different captions) survive; only genuine repeated
    // (caption, image) records drop — keep = the smallest doc_id of
    // each crossmodal neighborhood. The text pair list is the bounded
    // CANDIDATE GENERATOR, so the image leg needs neither banding nor
    // stop-band damping and misses nothing up to the bit budget (the
    // banded q_image_phash path must forfeit saturated buckets; a
    // pair-list probe doesn't). At 100 TB the plan joins a near-dup
    // pair table (≪ corpus) twice against a 16-byte-per-doc hash
    // table — media bytes and shingles never move.
    "q_crossmodal_dedup" -> ((s, dir) => {
      val txt = Dedup.sharedJaccardPairs(s, dir, 0.6)
        .select(col("doc1"), col("doc2"))
      val ph = sharedPhash(s, dir)
      val cross = txt
        .join(ph.select(col("doc_id").as("doc1"),
          col("phash_hi").as("h1"), col("phash_lo").as("l1")), Seq("doc1"))
        .join(ph.select(col("doc_id").as("doc2"),
          col("phash_hi").as("h2"), col("phash_lo").as("l2")), Seq("doc2"))
        .where(expr("bit_count(h1 ^ h2) + bit_count(l1 ^ l2)")
          <= CrossmodalHammingMax)
        .select(col("doc1"), col("doc2"))
      val sym = cross.select(col("doc1").as("doc_id"), col("doc2").as("nb"))
        .unionByName(cross.select(col("doc2").as("doc_id"), col("doc1").as("nb")))
      val census = sym.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_cross"), min(col("nb")).as("mn"))
      ph.select(col("doc_id"))
        .join(census, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_cross"), lit(0L)).as("n_cross"),
          least(col("doc_id"), coalesce(col("mn"), col("doc_id")))
            .as("canon"))
        .withColumn("drop_doc", (col("canon") < col("doc_id")).cast("int"))
        .orderBy(col("doc_id"))
    }),

    // EXECUTES on the streaming engine: the crossmodal guard as an
    // ingest-time pass — arriving micro-batches compute their own
    // shingle postings + image hashes with the SAME shared projections
    // the batch path uses, probe the accumulated feature stores for
    // pairs colliding in BOTH modalities, and the drained symmetric
    // census equals the batch query exactly (an unordered pair is
    // found when its later member arrives). Shares q_crossmodal_dedup's
    // oracle verbatim ⇒ streaming ≡ batch is hash-checked. See
    // Streams.crossmodalIngest for the state story.
    "q_stream_crossmodal" -> ((s, dir) => {
      val work = graft.util.WorkDirs.temp("graft_stream_xm")
      graft.streaming.Streams.crossmodalIngest(s, dir, work)
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

  /** Shared SQL replay of [[sharedPhash]] + [[phashPairs]]: CTE chain
    * ending in `ph(doc_id, hi, lo)` and symmetric `pairs(doc_id, nb)`
    * — prefix for the q_image_phash / q_crossmodal_dedup oracles.
    */
  private def sqlPhashCtes: String =
    s"""d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
       |  FROM documents),
       |px AS (SELECT doc_id, w, h, x, y,
       |    (doc_id * 31 + x * 7 + y) % 256 AS v
       |  FROM d,
       |    LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
       |    LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys),
       |bl AS (SELECT doc_id, (y * 8) // h * 8 + (x * 8) // w AS idx,
       |    sum(v) AS s, count(*) AS n
       |  FROM px GROUP BY 1, 2),
       |tt AS (SELECT doc_id, sum(s) AS ts, sum(n) AS tn FROM bl GROUP BY 1),
       |bits AS (SELECT bl.doc_id, idx,
       |    CASE WHEN s * tn > ts * n THEN 1 ELSE 0 END AS b
       |  FROM bl JOIN tt ON bl.doc_id = tt.doc_id),
       |ph AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN idx >= 32
       |      THEN b * (CAST(1 AS BIGINT) << (idx - 32)) ELSE 0 END) AS BIGINT)
       |      AS hi,
       |    CAST(sum(CASE WHEN idx < 32
       |      THEN b * (CAST(1 AS BIGINT) << idx) ELSE 0 END) AS BIGINT) AS lo
       |  FROM bits GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, lo & 65535 AS bv FROM ph
       |  UNION ALL SELECT doc_id, 1, (lo >> 16) & 65535 FROM ph
       |  UNION ALL SELECT doc_id, 2, hi & 65535 FROM ph
       |  UNION ALL SELECT doc_id, 3, (hi >> 16) & 65535 FROM ph),
       |keep AS (SELECT band, bv FROM bands GROUP BY band, bv
       |  HAVING count(*) <= $PhashBucketCap),
       |live AS (SELECT bands.* FROM bands JOIN keep USING (band, bv)),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS nb
       |  FROM live a JOIN live b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id <> b.doc_id
       |  JOIN ph x ON a.doc_id = x.doc_id
       |  JOIN ph y ON b.doc_id = y.doc_id
       |  WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
       |    <= $PhashHammingMax)""".stripMargin

  private def crossmodalOracle: String =
    s"""WITH $sqlPhashCtes,
         |${graft.ops.TextFns.sqlShingleCtes("documents")},
         |shh AS (SELECT DISTINCT doc_id, ${graft.ops.TextFns.sqlH60("s")} AS h
         |  FROM sh),
         |sz AS (SELECT doc_id, count(*) AS sz FROM shh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS i
         |  FROM shh a JOIN shh b USING (h) WHERE a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |tp AS (SELECT doc1, doc2
         |  FROM inter JOIN sz x ON doc1 = x.doc_id JOIN sz y ON doc2 = y.doc_id
         |  WHERE CAST(i AS DOUBLE) / (x.sz + y.sz - i) >= 0.6),
         |cp AS (SELECT tp.doc1, tp.doc2 FROM tp
         |  JOIN ph x ON tp.doc1 = x.doc_id
         |  JOIN ph y ON tp.doc2 = y.doc_id
         |  WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
         |    <= $CrossmodalHammingMax),
         |sym AS (SELECT doc1 AS doc_id, doc2 AS nb FROM cp
         |  UNION ALL SELECT doc2, doc1 FROM cp),
         |census AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cross,
         |    min(nb) AS mn
         |  FROM sym GROUP BY doc_id)
         |SELECT ph.doc_id, COALESCE(n_cross, 0) AS n_cross,
         |  least(ph.doc_id, COALESCE(mn, ph.doc_id)) AS canon,
         |  CAST(least(ph.doc_id, COALESCE(mn, ph.doc_id)) < ph.doc_id AS INT)
         |    AS drop_doc
         |FROM ph LEFT JOIN census ON ph.doc_id = census.doc_id
         |ORDER BY ph.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_multimodal_join" ->
      """SELECT doc_id, lang, n_chars, label,
        |  CAST(len(embedding) AS INT) AS dim, embedding[1] AS e0
        |FROM documents JOIN embeddings ON doc_id = vec_id
        |ORDER BY doc_id""".stripMargin,
    "q_multimodal_bytes" ->
      """SELECT doc_id, CAST(strlen(text) AS INT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Recomputes the decoded-pixel aggregates from the closed form the
    // PNGs were generated with — lossless codec ⇒ equality is exact.
    "q_multimodal_features" ->
      """WITH d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h
        |  FROM documents),
        |px AS (SELECT doc_id, w, h,
        |    (doc_id * 31 + x * 7 + y) % 256 AS v
        |  FROM d,
        |    LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
        |    LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys)
        |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels,
        |  CAST(sum(v) AS BIGINT) AS sum_lum,
        |  round(CAST(sum(v) AS DOUBLE) / (w * h), 6) AS mean_lum
        |FROM px GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin,
    // Replays the aHash from the closed-form pixels: same integer
    // block indices ((x·8)//w), same cross-product bit rule, same
    // hi/lo split (bits 0–31 / 32–63 — never the sign bit), same
    // 4×16-bit banding and hamming verify. PNG is lossless, so the
    // real-decode bits equal the closed-form bits exactly.
    "q_image_phash" ->
      s"""WITH $sqlPhashCtes,
         |census AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_near,
         |    min(nb) AS mn
         |  FROM pairs GROUP BY doc_id)
         |SELECT ph.doc_id, COALESCE(n_near, 0) AS n_near,
         |  least(ph.doc_id, COALESCE(mn, ph.doc_id)) AS canon
         |FROM ph LEFT JOIN census ON ph.doc_id = census.doc_id
         |ORDER BY ph.doc_id""".stripMargin,
    // The exact text near-dup pair list (the q_ngram_jaccard CTEs)
    // probed against the closed-form phash table with exact hamming —
    // both modalities replayed from first principles, then the same
    // census/keep rule as Spark. (Only the `ph` CTE of the phash
    // prefix is referenced; DuckDB inlines CTEs, so the unused banded
    // chain is never evaluated.)
    "q_crossmodal_dedup" -> crossmodalOracle,
    // Streaming ≡ batch by the arrival-order argument on
    // Streams.crossmodalIngest — the SAME oracle, verbatim.
    "q_stream_crossmodal" -> crossmodalOracle,
    // Closed-form replay of the decoded WAV: sample i of doc d is
    // (d·131 + i·17) mod 4096 − 2048 at rate 8000 + (d mod 4)·4000 —
    // lossless PCM ⇒ equality with the real decode is exact.
    "q_audio_features" ->
      """WITH d AS (SELECT doc_id, doc_id % 256 + 64 AS n,
        |    8000 + (doc_id % 4) * 4000 AS rate FROM documents),
        |sm AS (SELECT doc_id, n, rate,
        |    abs((doc_id * 131 + i * 17) % 4096 - 2048) AS a
        |  FROM d,
        |    LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) xs)
        |SELECT doc_id, CAST(rate AS INT) AS sample_rate,
        |  CAST(n AS BIGINT) AS n_samples,
        |  CAST(sum(a) AS BIGINT) AS sum_abs, CAST(max(a) AS INT) AS peak,
        |  round(CAST(sum(a) AS DOUBLE) / n, 6) AS mean_abs
        |FROM sm GROUP BY doc_id, n, rate ORDER BY doc_id""".stripMargin,
    // Closed-form replay of the SAMPLED frames only (i = 0, 2, …):
    // frame i pixel (x,y) of doc d is (d·31 + i·13 + x·7 + y) mod 256.
    "q_video_frames" ->
      """WITH d AS (SELECT doc_id, doc_id % 24 + 8 AS w, doc_id % 16 + 8 AS h,
        |    doc_id % 6 + 4 AS m, (doc_id % 3 + 1) * 5 AS fps FROM documents),
        |px AS (SELECT doc_id, w, h, m, fps,
        |    (doc_id * 31 + i * 13 + x * 7 + y) % 256 AS v
        |  FROM d,
        |    LATERAL (SELECT unnest(generate_series(0, m - 1, 2)) AS i) fs,
        |    LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) xs,
        |    LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) ys)
        |SELECT doc_id, CAST(m AS INT) AS n_frames, CAST(fps AS INT) AS fps,
        |  CAST((m + 1) // 2 AS INT) AS n_sampled,
        |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        |  CAST(sum(v) AS BIGINT) AS sum_lum,
        |  round(CAST(sum(v) AS DOUBLE) / (((m + 1) // 2) * w * h), 6) AS mean_lum
        |FROM px GROUP BY doc_id, w, h, m, fps ORDER BY doc_id""".stripMargin,
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
