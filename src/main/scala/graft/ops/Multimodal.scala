package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` + typed metadata.
  *
  * The Spark-side machinery is real — schema, partition-friendly batch
  * iteration, deterministic outputs. All three modalities have REAL
  * JDK-only decode round-trips: IMAGE (ImageIO PNG, `imageFeatures`),
  * AUDIO (javax.sound.sampled WAVE, `audioFeatures`), VIDEO (RIFF/AVI
  * container walk + per-frame ImageIO decode, `videoFrameFeatures`).
  * `decodeStub` remains only as the labeled generic plumbing seam where a
  * cluster with external codecs (JPEG-XL, H.264, ...) plugs in a decoder
  * with the same signature; nothing else changes.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates (and deletes) a temp file. All payloads here are in-memory
  // byte arrays, so the cache is pure per-row I/O overhead — identical
  // bytes/pixels without it. Runs once per JVM at object load (the
  // executor tasks all go through this object's methods).
  javax.imageio.ImageIO.setUseCache(false)

  final case class MediaMeta(media_id: Long, kind: String, width: Int,
      height: Int, n_frames: Int, bytes: Long)

  /** Deterministic fake "media store": derive a binary payload + metadata
    * from the documents table (text bytes stand in for encoded media). */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image"))
        .when(col("doc_id") % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("kind"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"))

  /** STUB decode: a real implementation would call the image/audio codec
    * here (e.g. via JNI or a vendored pure-JVM decoder). The stub derives
    * deterministic pseudo-pixels from the payload so every downstream
    * stage (feature extraction, resize, frame sampling) is exercised with
    * stable expected values. Accumulation is INTEGER (byte sums per slot)
    * so any engine can recompute it exactly (the DuckDB q17 oracle does);
    * the float feature vector is a single exact division away. */
  def decodeStubSums(payload: Array[Byte]): Array[Long] = {
    // ??? <- real codec goes here; deterministic fake below
    val n = 16
    val out = new Array[Long](n)
    var i = 0
    while (i < payload.length) {
      out(i % n) += (payload(i) & 0xff).toLong
      i += 1
    }
    out
  }

  def decodeStub(payload: Array[Byte], kind: String): Array[Float] =
    decodeStubSums(payload).map(_ / 255.0f)

  // ---- REAL kind-dispatched media (round-4 VERDICT item 7) -------------
  //
  // q17/q18 originally ran the stub decoder while real PNG/WAVE/AVI paths
  // existed for q23/q29/q30; the unified path below synthesizes ACTUAL
  // encoded media per kind and extracts features through the REAL codecs.
  // decodeStub stays only as the labeled plug-in seam for external codecs.

  /** Deterministic REAL media store derived from the documents table:
    * image rows carry an encoded PNG, audio rows a WAVE container, video
    * rows a RIFF/AVI container — every payload decodes through a real
    * parser below. */
  def synthesizeMedia(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { it =>
      it.map { case (id, text) =>
        (id % 3) match {
          case 0 => (id, "image", encodePngRow(id, text))
          case 1 => (id, "audio", encodeWavRow(id, text))
          case _ => (id, "video", encodeAviRow(id, text, 4))
        }
      }
    }.toDF("media_id", "kind", "payload")
  }

  /** REAL decode + feature extraction, dispatched on kind: integer
    * accumulator layouts per kind (engine-exact, DuckDB-recomputable):
    *   image → [width, height, Σr, Σg, Σb]
    *   audio → [sample_rate, n_samples, Σv, Σ|v|]
    *   video → [n_frames, Σr, Σg, Σb]  (totals across all frames)
    * mapPartitions so a real external decoder could amortize per-batch
    * setup, like a Pandas-UDF batch. */
  def extractFeaturesReal(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, kind, payload) =>
          val sums: Array[Long] = kind match {
            case "image" =>
              val (w, h, r, g, b) = decodePngSums(payload)
              Array(w.toLong, h.toLong, r, g, b)
            case "audio" =>
              val (rate, n, s, sa) = decodeWavSums(payload)
              Array(rate.toLong, n, s, sa)
            case "video" =>
              val fs = riffVideoChunks(payload).map(decodePngSums)
              Array(fs.length.toLong, fs.map(_._3).sum, fs.map(_._4).sum, fs.map(_._5).sum)
            case other => sys.error(s"unknown media kind: $other")
          }
          (id, kind, payload.length.toLong, sums)
        }
      }
      .toDF("media_id", "kind", "n_bytes", "feature_sums")
      .orderBy($"media_id")
  }

  /** Frame SAMPLING over real AVI containers: walk the RIFF chunk index
    * and decode ONLY every `stride`-th frame (≤ maxFrames) — the shape a
    * frame-subsampling training pipeline runs, where skipped frames are
    * never handed to the codec. Emits the original frame index plus the
    * decoded per-frame channel means (integer sums / 256 — engine-exact). */
  def sampleFramesReal(
      spark: SparkSession,
      videos: DataFrame, // (media_id, avi)
      stride: Int = 2,
      maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    videos.select("media_id", "avi").as[(Long, Array[Byte])]
      .flatMap { case (mid, avi) =>
        riffVideoChunks(avi).iterator.zipWithIndex
          .filter { case (_, f) => f % stride == 0 }
          .take(maxFrames)
          .map { case (png, f) =>
            val (w, h, r, g, b) = decodePngSums(png)
            val n = (w * h).toDouble
            (mid, f, w, h, r / n, g / n, b / n)
          }
      }
      .toDF("media_id", "frame_idx", "width", "height", "mean_r", "mean_g", "mean_b")
      .orderBy($"media_id", $"frame_idx")
  }

  /** ImageIO decode → (width, height, Σr, Σg, Σb) integer sums.
    * The decode is the REAL codec (ImageIO); the channel accumulation
    * reads the decoded raster's byte buffer directly when the image is
    * the standard PNG-decode layout (TYPE_3BYTE_BGR: one byte per
    * channel, the exact values per-pixel `getRGB` would repack), and
    * falls back to a bulk `getRGB` row fetch otherwise — identical sums,
    * without a color-model conversion call per pixel. */
  // One PNG ImageReader per thread, reused across rows: `ImageIO.read`
  // re-runs the service-registry lookup and constructs a fresh reader per
  // call. `setInput` fully resets reader state, and `read(0)` with the
  // default param is exactly what `ImageIO.read` executes — same decoded
  // raster. ignoreMetadata additionally skips ancillary-chunk parsing
  // (pixel data is unaffected).
  private val pngReaderLocal = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader =
      javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
  }

  /** REAL ImageIO PNG decode with a thread-reused reader. */
  private def readPng(png: Array[Byte]): java.awt.image.BufferedImage = {
    val reader = pngReaderLocal.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(png))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally iis.close()
  }

  private def decodePngSums(png: Array[Byte]): (Int, Int, Long, Long, Long) = {
    val img = readPng(png)
    val (r, g, b) = sumChannels(img)
    (img.getWidth, img.getHeight, r, g, b)
  }

  /** (Σr, Σg, Σb) of a decoded image — raster-buffer fast path for the
    * standard PNG-decode layout, bulk-getRGB fallback; same per-pixel
    * channel bytes either way. */
  private def sumChannels(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
    val (w, h) = (img.getWidth, img.getHeight)
    var r = 0L; var g = 0L; var b = 0L
    if (img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR &&
      img.getRaster.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte]) {
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      var i = 0
      val n = w * h * 3
      while (i < n) {
        b += data(i) & 0xff; g += data(i + 1) & 0xff; r += data(i + 2) & 0xff
        i += 3
      }
    } else {
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          x += 1
        }
        y += 1
      }
    }
    (r, g, b)
  }

  /** WAVE decode → (sample_rate, n_samples, Σv, Σ|v|) integer sums. */
  private def decodeWavSums(wav: Array[Byte]): (Int, Long, Long, Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"unexpected decoded format: $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    var sum = 0L; var sumAbs = 0L
    var i = 0
    while (i < n) {
      val v = (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      sum += v; sumAbs += math.abs(v)
      i += 1
    }
    (fmt.getSampleRate.toInt, n.toLong, sum, sumAbs)
  }

  /** Feature extraction over media batches: binary → fixed-width feature
    * vector + metadata. `mapPartitions` so a real decoder can amortize
    * per-batch setup (model load, codec contexts) exactly like a Pandas
    * UDF batch would. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select("media_id", "kind", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition decoder setup would happen here
        batch.map { case (id, kind, payload) =>
          val sums = decodeStubSums(payload)
          val feat = sums.map(_ / 255.0f)
          val norm = math.sqrt(feat.map(x => x.toDouble * x).sum)
          (id, kind, payload.length.toLong, sums, feat, norm)
        }
      }
      .toDF("media_id", "kind", "n_bytes", "feature_sums", "features", "feature_norm")
      .orderBy($"media_id")
  }

  // ---- REAL image path (JDK ImageIO — no external codecs needed) -------

  /** Deterministic 16×16 RGB PNG derived from the doc text: an actual
    * encoded image, so the decode below is a REAL codec round-trip, not a
    * stub (audio/video remain stubbed — their codecs aren't in the JVM). */
  def synthesizeImages(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { it =>
      it.map { case (id, text) => (id, encodePngRow(id, text)) }
    }.toDF("media_id", "png")
  }

  /** Spec-conformant minimal PNG encoder: 8-bit truecolor, filter-0
    * scanlines, one zlib-deflated IDAT. PNG is lossless, so ImageIO (the
    * REAL decode path every feature op runs) recovers the exact input
    * pixels — the decoded feature sums are unchanged by construction.
    * This replaces `ImageIO.write` in the SYNTHESIS step only, which was
    * the dominant per-row cost of q17/q18 (writer plumbing + default-level
    * deflate per 16×16 tile). */
  private def encodePng(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    // raw scanline stream: filter byte 0 + w*3 RGB bytes per row
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      System.arraycopy(rgb, y * stride, raw, y * (1 + stride) + 1, stride)
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 128)
    def be32(v: Int): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      bos.write(be32(data.length))
      val tb = typ.getBytes("US-ASCII")
      bos.write(tb)
      bos.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      bos.write(be32(crc.getValue.toInt))
    }
    bos.write(Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    val defl = deflaterLocal.get()
    defl.reset() // thread-reused native zlib state (init per call is hot)
    val cbos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val dos = new java.util.zip.DeflaterOutputStream(cbos, defl)
    dos.write(raw); dos.finish()
    chunk("IDAT", cbos.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  private val deflaterLocal = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
  }

  /** One deterministic 16×16 RGB PNG from (text, id) — shared by the
    * image-only synthesis (q23) and the kind-dispatched media store (q17).
    * Pixel values are the round-5 formula unchanged; only the container
    * writer moved to the fast lossless encoder above. */
  private def encodePngRow(id: Long, text: String): Array[Byte] = {
    val bytes = (text + id).getBytes("UTF-8")
    val rgb = new Array[Byte](256 * 3)
    var i = 0
    while (i < 256) {
      val r = if (bytes.nonEmpty) bytes(i % bytes.length) & 0xff else 0
      val g = if (bytes.nonEmpty) bytes((i * 7 + 3) % bytes.length) & 0xff else 0
      val b = (id + i).toInt & 0xff
      rgb(3 * i) = r.toByte; rgb(3 * i + 1) = g.toByte; rgb(3 * i + 2) = b.toByte
      i += 1
    }
    encodePng(16, 16, rgb)
  }

  /** REAL decode + feature extraction + resize: ImageIO parses the PNG,
    * features = per-channel means, thumbnail = 4×4 grayscale via a real
    * Graphics2D rescale. Batched in mapPartitions like a Pandas-UDF batch. */
  def imageFeatures(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.select("media_id", "png").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, png) =>
          val img = readPng(png)
          val (w, h) = (img.getWidth, img.getHeight)
          val (r, g, b) = sumChannels(img)
          val n = (w * h).toDouble
          val thumb = new java.awt.image.BufferedImage(4, 4,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val g2 = thumb.createGraphics()
          g2.drawImage(img, 0, 0, 4, 4, null); g2.dispose()
          val gray = (for (y <- 0 until 4; x <- 0 until 4)
            yield (thumb.getRGB(x, y) & 0xff).toFloat).toArray
          (id, w, h, r / n, g / n, b / n, gray)
        }
      }
      .toDF("media_id", "width", "height", "mean_r", "mean_g", "mean_b", "thumb_gray")
      .orderBy($"media_id")
  }

  // ---- REAL audio path (javax.sound.sampled — JDK-native WAVE) ---------

  /** Deterministic 16-bit PCM mono WAV derived from the doc text — an
    * actual WAVE container written by the JDK's AudioSystem, so
    * `audioFeatures` below is a REAL codec round-trip like the PNG path
    * (q23). Sample i = (byte(i mod L) − 128)·256 + ((id + i) mod 256) over
    * the UTF-8 bytes of text||id — integer-exact, so an independent engine
    * recomputes the decoded features from the text alone (the q29 oracle).
    * With this, video alone remains stubbed (no JVM-native container
    * parser ships with the JDK). */
  def synthesizeAudio(docs: DataFrame, nSamples: Int = 256): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { it =>
      it.map { case (id, text) => (id, encodeWavRow(id, text, nSamples)) }
    }.toDF("media_id", "wav")
  }

  /** One deterministic PCM16 mono WAVE from (text, id) — shared by the
    * audio-only synthesis (q29) and the kind-dispatched media store (q17). */
  private def encodeWavRow(id: Long, text: String, nSamples: Int = 256): Array[Byte] = {
    val s = (text + id).getBytes("UTF-8")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (((s(i % s.length) & 0xff) - 128) * 256 + ((id + i) % 256).toInt).toShort
      pcm(2 * i) = (v & 0xff).toByte // little-endian PCM16
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    // canonical RIFF/WAVE container written directly (PCM16 mono 8 kHz):
    // the exact sample bytes the AudioSystem WAVE writer emitted, without
    // the per-row AudioInputStream/SPI plumbing — the REAL decode path
    // (audioFeatures / decodeWavSums via javax.sound.sampled) parses it
    // identically, which is what the q17/q29 oracles pin
    val dataLen = pcm.length
    val out = new Array[Byte](44 + dataLen)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def tag(off: Int, t: String): Unit = {
      val b = t.getBytes("US-ASCII"); System.arraycopy(b, 0, out, off, 4)
    }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    out(20) = 1; out(21) = 0 // PCM
    out(22) = 1; out(23) = 0 // mono
    le32(24, 8000) // sample rate
    le32(28, 16000) // byte rate
    out(32) = 2; out(33) = 0 // block align
    out(34) = 16; out(35) = 0 // bits/sample
    tag(36, "data"); le32(40, dataLen)
    System.arraycopy(pcm, 0, out, 44, dataLen)
    out
  }

  /** REAL decode: AudioSystem parses the WAVE container, the PCM16 frames
    * are accumulated with INTEGER sums (PCM is lossless, so the decoded
    * means equal means recomputed straight from the synthesis formula). */
  def audioFeatures(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio.select("media_id", "wav").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, wav) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(wav))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
            s"unexpected decoded format: $fmt")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var sum = 0L; var sumAbs = 0L
          var i = 0
          while (i < n) {
            val v = (((bytes(2 * i + 1).toInt) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
            sum += v; sumAbs += math.abs(v)
            i += 1
          }
          (id, fmt.getSampleRate.toInt, n.toLong,
            sum.toDouble / n, sumAbs.toDouble / n)
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "mean_sample", "mean_abs")
      .orderBy($"media_id")
  }

  // ---- REAL video path (RIFF/AVI container + PNG frame codec) ----------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if ((body.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
    id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
  }

  private def riffList(form: String, bodies: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", form.getBytes("US-ASCII") ++ bodies.flatten)

  /** Minimal spec-correct AVI: RIFF('AVI ') → LIST(hdrl){avih} +
    * LIST(movi){'00dc' × frames}. Frames are PNG-encoded — the MJPEG
    * layout with a LOSSLESS codec, so the decode is a real container
    * parse + real image-codec round-trip whose features an independent
    * engine recomputes exactly from the synthesis formula (q30). */
  def synthesizeVideos(docs: DataFrame, nFrames: Int = 4): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { it =>
      it.map { case (id, text) => (id, encodeAviRow(id, text, nFrames)) }
    }.toDF("media_id", "avi")
  }

  /** One deterministic PNG-frame AVI from (text, id) — shared by the
    * video-only synthesis (q30) and the kind-dispatched media store (q17). */
  private def encodeAviRow(id: Long, text: String, nFrames: Int): Array[Byte] = {
    val bytes = (text + id).getBytes("UTF-8")
    val l = bytes.length
    val frames = (0 until nFrames).map { f =>
      // same per-pixel formula as round 5; container via the fast
      // lossless PNG encoder (see encodePng)
      val rgb = new Array[Byte](256 * 3)
      var i = 0
      while (i < 256) {
        rgb(3 * i) = bytes((i + 3 * f) % l)
        rgb(3 * i + 1) = bytes((i * 7 + 3 + f) % l)
        rgb(3 * i + 2) = ((id + i + f) & 0xff).toByte
        i += 1
      }
      encodePng(16, 16, rgb)
    }
    val avih = riffChunk("avih", le32(40000) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(16) ++ le32(16) ++ new Array[Byte](16))
    val movi = riffList("movi", frames.map(riffChunk("00dc", _)): _*)
    val body = "AVI ".getBytes("US-ASCII") ++ riffList("hdrl", avih) ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Generic RIFF walker: collects the video-data ('00dc'/'00db') chunk
    * payloads of ANY AVI by recursing through RIFF/LIST forms with proper
    * word alignment — a real container parser, not a byte-offset stub. */
  def riffVideoChunks(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    def u32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def id(off: Int) = new String(bytes, off, 4, "US-ASCII")
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val cid = id(off); val sz = u32(off + 4); val body = off + 8
        if (cid == "RIFF" || cid == "LIST") walk(body + 4, math.min(body + sz, end))
        else if (cid == "00dc" || cid == "00db")
          out += java.util.Arrays.copyOfRange(bytes, body, math.min(body + sz, bytes.length))
        off = body + sz + (sz & 1)
      }
    }
    walk(0, bytes.length)
    out.toSeq
  }

  /** REAL video decode: parse the AVI container, ImageIO-decode each frame,
    * emit per-frame channel means (integer sums / 256 — engine-exact). */
  def videoFrameFeatures(spark: SparkSession, videos: DataFrame): DataFrame = {
    import spark.implicits._
    videos.select("media_id", "avi").as[(Long, Array[Byte])]
      .flatMap { case (mid, avi) =>
        riffVideoChunks(avi).iterator.zipWithIndex.map { case (png, f) =>
          val (w, h, r, g, b) = decodePngSums(png)
          val n = (w * h).toDouble
          (mid, f, w, h, r / n, g / n, b / n)
        }
      }
      .toDF("media_id", "frame_idx", "width", "height", "mean_r", "mean_g", "mean_b")
      .orderBy($"media_id", $"frame_idx")
  }

  /** Frame sampling for video rows: every `stride`-th 4-byte window of the
    * payload is a "frame"; real decoders substitute frame extraction with
    * the same (media_id, frame_idx, frame_bytes) output shape. */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 64, maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        (0 until maxFrames).iterator
          .map(f => (id, f, payload.slice(f * stride, f * stride + 4)))
          .filter(_._3.nonEmpty)
      }
      .toDF("media_id", "frame_idx", "frame_bytes")
      .orderBy($"media_id", $"frame_idx")
  }
}
