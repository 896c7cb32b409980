package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, and decode / feature-extract operators.
  *
  * IMAGE and AUDIO decode are REAL: [[decodeImage]] runs
  * `javax.imageio` (in the JDK — no external codec library needed)
  * over actual PNG bytes and reads width/height/format/pixels out of
  * the decoded raster; [[decodeAudio]] runs `javax.sound.sampled`
  * over actual WAV bytes and reads format/sample stats out of the
  * decoded PCM stream. [[withPngPayload]]/[[withWavPayload]] render
  * genuine payloads so both encode→binary-column→decode round trips
  * execute distributed. VIDEO framing ([[frameSample]]) and the md5
  * stand-in ([[decodeImageMeta]], kept for payloads with no JDK
  * codec) remain deterministic stubs, labeled as such — the JDK ships
  * no video codec. The Spark shape either way:
  *
  *  - Decode runs via `mapPartitions` over a typed Dataset, the Scala
  *    analog of `mapInPandas`: one iterator per partition, so decoder
  *    setup (ImageIO reader lookup, ffmpeg handles) amortizes across
  *    the whole partition instead of paying it per row.
  *  - Binary payloads stay in the executors end-to-end; nothing is ever
  *    collected. Row-group sized partitions (`maxPartitionBytes`) keep a
  *    100 TB media corpus within executor memory.
  *  - Downstream ops (resize plan, frame sampling) are metadata-only
  *    column expressions until a sink forces the pixel work.
  *
  * SCOPE — video codecs, precisely: INTRA-frame compressed video IS
  * real here — the GVJM path ([[withMjpegPayload]]/
  * [[decodeMjpegFrames]]) packetizes genuine lossy JPEG frames
  * (MJPEG's exact structure) and selectively decodes them with the
  * JDK's `javax.imageio` codec, so lossy encode, packet walking, and
  * skip-without-decode economics are all exercised end-to-end with
  * zero external dependencies. INTER-frame compression is real too —
  * the GVDF path ([[withInterframePayload]]/
  * [[decodeInterframeFrames]]) has GOP keyframes, temporal delta
  * prediction, Deflate entropy coding, and the decode-chain
  * constraint, all JDK (and lossless, so the whole chain decode is
  * oracle-exact). What stays out of scope BY DECISION, not omission,
  * is decoding third-party formats (H.264/VP9/AV1 in MP4/WebM): the
  * JDK ships none of those codecs and this build resolves no
  * external dependency; javacv/ffmpeg bindings would be the
  * production choice, dropped in behind exactly the
  * [[decodeVideoFrames]]/[[decodeMjpegFrames]]/
  * [[decodeInterframeFrames]] signatures — a per-partition iterator
  * over binary payloads emitting typed frame rows. Large-scale
  * pipelines transcode ONCE at ingest and move raw/lightly-packed
  * frames between stages — the GVID raw-container path IS that
  * post-ingest shape. Swapping any parser for an ffmpeg-backed one
  * changes no plan shape, no partitioning, and no schema.
  */
object MultimodalOps {

  /** One media row: id + opaque payload. */
  final case class MediaRow(doc_id: Long, content: Array[Byte])

  // ---------------------------------------------------------- codec aid
  // Per-partition ImageIO plumbing (opt r19, guide §1.2 step 2 "per-task
  // work"): the convenience entry points pay three hidden per-CALL costs
  // that dominate the pixel work at our payload sizes —
  //   * ImageIO.read/write re-resolve the codec through the service
  //     registry on every call;
  //   * ImageIO.createImageInput/OutputStream honors useCache=true (the
  //     default) and backs every call with a DISK temp cache file;
  //   * per-pixel get/setRGB round-trips the color model one sample at
  //     a time.
  // The helpers below resolve the codec once per partition, use
  // memory-cached streams, and touch rasters in bulk. The codec and its
  // default params are unchanged, so encoded bytes and decoded rasters
  // are identical to the ImageIO.read/write defaults.

  private val PngMagic = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47,
    0x0d, 0x0a, 0x1a, 0x0a)

  private def hasPngMagic(b: Array[Byte]): Boolean =
    b.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(b, 0, 8), PngMagic)

  /** One reader/writer set per partition. Construct via
    * [[PartitionImageCodec.open]], which registers dispose() with the
    * task completion listener; the iterator-exhaustion tail dispose is
    * a harmless (idempotent) second line of defense.
    */
  private final class PartitionImageCodec {
    private var pngReader: javax.imageio.ImageReader = _
    private var jpgReader: javax.imageio.ImageReader = _
    private var jpgWriter: javax.imageio.ImageWriter = _
    private var pngWriter: javax.imageio.ImageWriter = _

    private def memIn(b: Array[Byte], off: Int, len: Int) =
      new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(b, off, len))

    /** Decode with a reused reader (no registry walk, no disk cache). */
    private def readWith(r: javax.imageio.ImageReader, b: Array[Byte],
        off: Int, len: Int): java.awt.image.BufferedImage = {
      val iis = memIn(b, off, len)
      try { r.setInput(iis); r.read(0) } finally iis.close()
    }

    /** PNG fast path by magic; anything else falls back to the registry
      * lookup (fresh reader per call, as ImageIO.read does) so the path
      * stays format-generic. Returns (image, lowercase format name).
      */
    def readAny(b: Array[Byte]): (java.awt.image.BufferedImage, String) =
      if (hasPngMagic(b)) {
        if (pngReader == null) pngReader = javax.imageio.ImageIO
          .getImageReadersByFormatName("png").next()
        (readWith(pngReader, b, 0, b.length), "png")
      } else {
        val iis = memIn(b, 0, b.length)
        val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
        try {
          reader.setInput(iis)
          (reader.read(0),
            reader.getFormatName.toLowerCase(java.util.Locale.ROOT))
        } finally { reader.dispose(); iis.close() }
      }

    def readJpeg(b: Array[Byte], off: Int,
        len: Int): java.awt.image.BufferedImage = {
      if (jpgReader == null) jpgReader = javax.imageio.ImageIO
        .getImageReadersByFormatName("jpeg").next()
      readWith(jpgReader, b, off, len)
    }

    private def writeWith(w: javax.imageio.ImageWriter,
        img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      w.setOutput(ios)
      w.write(img) // default params — same bytes as ImageIO.write
      ios.close()
      bos.toByteArray
    }

    def writeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      if (jpgWriter == null) jpgWriter = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      writeWith(jpgWriter, img)
    }

    def writePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      if (pngWriter == null) pngWriter = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      writeWith(pngWriter, img)
    }

    private var disposed = false

    def dispose(): Unit = if (!disposed) {
      disposed = true
      if (pngReader != null) pngReader.dispose()
      if (jpgReader != null) jpgReader.dispose()
      if (jpgWriter != null) jpgWriter.dispose()
      if (pngWriter != null) pngWriter.dispose()
    }
  }

  private object PartitionImageCodec {
    /** One codec per task, disposed at TASK COMPLETION (ADVICE r19):
      * the iterator-tail `++ {{ codec.dispose(); ... }}` only runs if a
      * downstream consumer exhausts the partition iterator, so an
      * early-terminating consumer (limit/take, an exception
      * mid-partition) would leak reader/writer instances per task. The
      * listener fires on success, failure, and cancellation alike;
      * dispose() is idempotent, so the exhaustion-path call staying in
      * place is harmless (and covers non-task driver use in unit
      * tests, where TaskContext is null).
      */
    def open(): PartitionImageCodec = {
      val c = new PartitionImageCodec
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) tc.addTaskCompletionListener[Unit](_ => c.dispose())
      c
    }
  }

  /** Fill a TYPE_INT_RGB image with one color in bulk — stores exactly
    * the ints the per-pixel setRGB loop stored.
    */
  private def fillSolid(img: java.awt.image.BufferedImage,
      rgb: Int): Unit =
    java.util.Arrays.fill(img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferInt].getData, rgb)

  /** Typed decode output: id + image metadata. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
      n_bytes: Long, format: String)

  /** Attach a binary payload column (here: the utf-8 bytes of `text`,
    * standing in for real image bytes arriving from parquet `binary`).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("content"))

  /** STUB decoder: in production this calls the image codec on
    * `r.content`; here metadata is md5-derived so it is deterministic
    * and oracle-checkable. Decode batches per partition (codec init
    * would sit before the iterator map).
    */
  def decodeImageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = ImageCodec.open() — once per partition
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val d = md.digest(r.content)
        ImageMeta(r.doc_id,
          width = 16 + (d(0) & 0x7f),
          height = 16 + (d(1) & 0x7f),
          n_bytes = r.content.length.toLong,
          format = if ((d(2) & 1) == 0) "jpeg" else "png")
      }
    }
  }

  /** Image metadata table for the documents corpus (stub decode). */
  def imageMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeImageMeta(withPayload(docs).as[MediaRow]).toDF()
  }

  /** Decoded-image stats: real pixels out of a real codec. */
  final case class ImagePixels(doc_id: Long, width: Int, height: Int,
      format: String, avg_r: Int)

  /** REAL PNG payloads: render one deterministic solid-gray image per
    * document (width from doc_id, height from n_chars, gray level
    * doc_id % 256) and encode it with the JDK's PNG writer — genuine
    * image bytes in a `binary` column, produced distributed in the
    * same mapPartitions shape a real ingest decoder uses. PNG is
    * lossless, so every derived quantity is exactly reproducible from
    * (doc_id, n_chars) — which is what makes [[decodeImage]]
    * oracle-checkable in SQL.
    */
  def withPngPayload(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val codec = PartitionImageCodec.open()
        it.map { case (id, nChars) =>
          val w = 8 + (id % 40).toInt
          val h = 8 + (nChars % 40).toInt
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = (id % 256).toInt
          fillSolid(img, (g << 16) | (g << 8) | g)
          (id, codec.writePng(img))
        } ++ { codec.dispose(); Iterator.empty }
      }
      .toDF("doc_id", "content")
  }

  /** REAL image decode via `javax.imageio`: format name from the
    * registry's reader lookup, dimensions and red-channel mean from
    * the decoded raster. Per-partition iterator so the (cheap here,
    * expensive for ffmpeg-class codecs) reader resolution amortizes;
    * payload bytes never leave the executor.
    */
  def decodeImage(media: Dataset[MediaRow]): Dataset[ImagePixels] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = PartitionImageCodec.open()
      it.map { r =>
        val (img, fmt) = codec.readAny(r.content)
        ImagePixels(r.doc_id, img.getWidth, img.getHeight, fmt,
          meanRed(img))
      } ++ { codec.dispose(); Iterator.empty }
    }
  }

  /** Decoded stats for the documents corpus: PNG encode → binary
    * column → javax.imageio decode, end to end on executors.
    */
  def decodedImageStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeImage(withPngPayload(docs).as[MediaRow]).toDF()
  }

  /** One executed resize: output geometry + the resampled raster's
    * mean red channel.
    */
  final case class ResizedImage(doc_id: Long, out_w: Int, out_h: Int,
      avg_r: Int)

  /** Mean of the red channel over a raster — the ONE pixel-stat loop
    * both the decode and the executed-resize paths reduce with.
    */
  private def meanRed(img: java.awt.image.BufferedImage): Int = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    val t = img.getType
    if (t == java.awt.image.BufferedImage.TYPE_INT_RGB ||
        t == java.awt.image.BufferedImage.TYPE_3BYTE_BGR) {
      // 8-bit sRGB layouts: band 0 IS the red channel getRGB returns
      // ((rgb >> 16) & 0xff) — bulk row reads skip the per-pixel color
      // model round trip
      val raster = img.getRaster
      val row = new Array[Int](w)
      var y = 0
      while (y < h) {
        raster.getSamples(0, y, w, 1, 0, row)
        var x = 0
        while (x < w) { sum += row(x); x += 1 }
        y += 1
      }
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
        y += 1
      }
    }
    (sum / (w.toLong * h)).toInt
  }

  /** Box-fit output geometry — the ONE copy of the floor/least math
    * [[resizePlan]] expresses as columns, with a 1-pixel floor on the
    * EXECUTED path's dimensions: an extreme-aspect input (w ≫ h) can
    * floor the short side to 0, which is a fine plan row but not a
    * constructible raster.
    */
  private def fitBox(box: Int, w: Int, h: Int): (Int, Int) = {
    val scale = math.min(math.min(box.toDouble / w, box.toDouble / h),
      1.0)
    (math.max(1, math.floor(w * scale).toInt),
      math.max(1, math.floor(h * scale).toInt))
  }

  /** EXECUTE the resize (not just plan it): decode the PNG payload,
    * box-fit with the same floor/least math as [[resizePlan]] (plus
    * the 1-pixel raster floor), and resample through Graphics2D
    * bilinear — real pixel work on executors. The fixture rasters are
    * solid gray, so interpolation cannot change the mean: avg_r is
    * exactly the source gray and the whole decode→resize→stat chain
    * stays oracle-checkable.
    */
  def resizedImageStats(spark: SparkSession, docs: DataFrame,
      box: Int): DataFrame = {
    import spark.implicits._
    require(box > 0, s"box $box must be positive")
    withPngPayload(docs).as[MediaRow].mapPartitions { it =>
      val codec = PartitionImageCodec.open()
      it.map { r =>
        val (img, _) = codec.readAny(r.content)
        val (ow, oh) = fitBox(box, img.getWidth, img.getHeight)
        val out = new java.awt.image.BufferedImage(ow, oh,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, ow, oh, null)
        g.dispose()
        ResizedImage(r.doc_id, ow, oh, meanRed(out))
      } ++ { codec.dispose(); Iterator.empty }
    }.toDF()
  }

  /** Decoded-audio stats row: real samples out of the JDK's WAV codec. */
  final case class AudioStats(doc_id: Long, sample_rate: Int,
      channels: Int, bits: Int, n_samples: Long, mean_abs: Long)

  /** REAL WAV payloads: synthesize a deterministic 16-bit mono PCM
    * square wave per document (length from n_chars, amplitude from
    * doc_id) and wrap it with the JDK's WAVE writer — genuine audio
    * container bytes in a `binary` column, produced distributed in the
    * same mapPartitions shape as [[withPngPayload]]. The sample count
    * is a multiple of the square-wave period, so mean |sample| equals
    * the amplitude EXACTLY — every decoded quantity is reproducible
    * from (doc_id, n_chars), which is what makes [[decodeAudio]]
    * oracle-checkable in SQL.
    */
  def withWavPayload(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val n = 400 + (nChars % 50).toInt * 16 // multiple of 16
          val amp = (1000 + id % 20000).toInt    // < 2^15: no clipping
          val pcm = new Array[Byte](n * 2)       // little-endian s16
          var i = 0
          while (i < n) {
            val s = if ((i / 8) % 2 == 0) amp else -amp
            pcm(2 * i) = (s & 0xff).toByte
            pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(
            8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF("doc_id", "content")
  }

  /** REAL audio decode via `javax.sound.sampled`: container parsing
    * and format metadata from the JDK's WAV reader, sample stats from
    * the decoded PCM stream. Same per-partition iterator shape as
    * [[decodeImage]]; payload bytes never leave the executor.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        try {
          val f = ais.getFormat
          val bytes = ais.readAllBytes()
          val bits = f.getSampleSizeInBits
          val ch = f.getChannels
          // WAV PCM conventions: 8-bit is UNSIGNED (bias 128), 16-bit
          // signed with container-declared endianness. Other depths
          // (24/32-bit) fail loudly rather than decode garbage.
          require(bits == 8 || bits == 16,
            s"decodeAudio supports 8/16-bit PCM, got $bits-bit")
          val bps = bits / 8
          val frames = bytes.length / (bps * ch)
          val total = frames * ch // samples across all channels
          var sum = 0L
          var i = 0
          if (bits == 8) {
            while (i < total) { sum += math.abs((bytes(i) & 0xff) - 128); i += 1 }
          } else if (f.isBigEndian) {
            while (i < total) {
              sum += math.abs((bytes(2 * i).toInt << 8) | (bytes(2 * i + 1) & 0xff))
              i += 1
            }
          } else {
            while (i < total) {
              sum += math.abs((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff))
              i += 1
            }
          }
          AudioStats(r.doc_id, f.getSampleRate.toInt, ch, bits,
            frames.toLong, if (total == 0) 0L else sum / total)
        } finally ais.close()
      }
    }
  }

  /** Decoded stats for the documents corpus: WAV encode → binary
    * column → javax.sound decode, end to end on executors.
    */
  def decodedAudioStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodeAudio(withWavPayload(docs).as[MediaRow]).toDF()
  }

  /** Resize planning: pure metadata math (target box fit, preserve
    * aspect), no pixel work until a sink materializes it.
    */
  def resizePlan(meta: DataFrame, box: Int): DataFrame =
    meta.withColumn("scale",
        least(lit(box) / col("width"), lit(box) / col("height"), lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling plan for video-ish payloads: every `stride`-th frame
    * index of n_frames = n_bytes / bytesPerFrame (stub framing).
    */
  def frameSample(meta: DataFrame, bytesPerFrame: Int,
      stride: Int): DataFrame =
    // a payload with zero whole frames samples NOTHING — the previous
    // greatest(n-1, 0) lower clamp emitted frame 0 for frameless
    // payloads, a plan row pointing past the payload end
    meta.select(col("doc_id"),
      expr(s"""CASE WHEN cast(n_bytes / $bytesPerFrame as int) <= 0
        THEN cast(array() as array<int>)
        ELSE sequence(0, cast(n_bytes / $bytesPerFrame as int) - 1, $stride)
        END""").as("frame_idx"))

  // ------------------------------------------------------------ video

  /** One decoded, sampled video frame: container geometry + the
    * frame's mean pixel value.
    */
  final case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, n_frames: Int, avg_pixel: Int)

  /** The raw-video container magic ("GVID" + 3 big-endian ints:
    * width, height, n_frames; then n_frames × w·h gray bytes). The
    * JDK ships no video CODEC, so compressed formats stay out of
    * scope — but a raw uncompressed container is how decoded frames
    * move through real pipelines anyway (decode once at ingest, store
    * raw/NPY-ish, sample downstream), and every byte of the parse →
    * frame-slice → stat path below is genuine executor-side work in
    * the same mapPartitions shape as the PNG/WAV codecs.
    */
  val VideoMagic: Array[Byte] = "GVID".getBytes("US-ASCII")

  /** REAL raw-video payloads: one deterministic container per document
    * (geometry from doc_id/n_chars, frame f's pixels all
    * (doc_id + f) % 256) — genuine multi-frame binary payloads built
    * distributed. Lossless by construction, so every frame stat is
    * exactly reproducible from (doc_id, n_chars) in SQL.
    */
  def withRawVideoPayload(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val w = 4 + (id % 8).toInt
          val h = 4 + (nChars % 8).toInt
          val n = 3 + (id % 6).toInt
          val buf = java.nio.ByteBuffer.allocate(16 + n * w * h)
          buf.put(VideoMagic).putInt(w).putInt(h).putInt(n)
          var f = 0
          while (f < n) {
            val px = ((id + f) % 256).toByte
            var i = 0
            while (i < w * h) { buf.put(px); i += 1 }
            f += 1
          }
          (id, buf.array())
        }
      }
      .toDF("doc_id", "content")
  }

  /** Decode + frame-sample raw-video payloads: parse the header,
    * slice every `stride`-th frame out of the byte stream, and reduce
    * it to its mean pixel — per-partition iterators, payloads never
    * leave the executors, sampled frames never copy (index arithmetic
    * over the one payload array).
    */
  def decodeVideoFrames(media: Dataset[MediaRow],
      stride: Int): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    require(stride > 0, s"stride $stride must be positive")
    media.flatMap { r =>
      val buf = java.nio.ByteBuffer.wrap(r.content)
      val magic = new Array[Byte](4)
      buf.get(magic)
      require(java.util.Arrays.equals(magic, VideoMagic),
        s"doc ${r.doc_id}: not a GVID payload")
      val (w, h, n) = (buf.getInt, buf.getInt, buf.getInt)
      // header fields are untrusted container bytes: a corrupt or
      // truncated payload must die with the same doc-labeled error the
      // magic check gives, not an opaque ArrayIndexOutOfBounds (or a
      // silent empty sequence from a negative frame count). Dimensions
      // are bounded FIRST so the byte-count product cannot overflow
      // Long (w,h ≤ 2^15 and n ≤ 2^31 keep it under 2^62) and the
      // per-frame offsets stay within Int.
      require(w > 0 && h > 0 && n >= 0 &&
        w <= 32768 && h <= 32768 &&
        16L + n.toLong * w * h <= r.content.length,
        s"doc ${r.doc_id}: corrupt GVID header (w=$w h=$h n=$n, " +
          s"payload ${r.content.length} bytes)")
      (0 until n by stride).iterator.map { f =>
        val off = 16 + f * w * h
        var sum = 0L
        var i = 0
        while (i < w * h) { sum += r.content(off + i) & 0xff; i += 1 }
        VideoFrame(r.doc_id, f, w, h, n, (sum / (w * h)).toInt)
      }
    }
  }

  /** Sampled-frame stats for the documents corpus: raw-video encode →
    * binary column → parse/slice/stat decode, end to end on executors.
    */
  def decodedVideoStats(spark: SparkSession, docs: DataFrame,
      stride: Int = 2): DataFrame = {
    import spark.implicits._
    decodeVideoFrames(withRawVideoPayload(docs).as[MediaRow], stride)
      .toDF()
  }

  /** "GVJM" — MJPEG-style COMPRESSED video: header (magic, w, h, n)
    * followed by n length-prefixed JPEG packets. MJPEG is exactly
    * per-frame JPEG packetization, and the JDK ships a real lossy
    * JPEG codec (`javax.imageio`), so this path exercises genuine
    * compressed-video work — lossy encode, packet walking, selective
    * decode — with zero external dependencies. Inter-frame codecs
    * (H.264-class) remain the documented ffmpeg/javacv drop-in behind
    * the same signatures.
    */
  val MjpegMagic: Array[Byte] = "GVJM".getBytes("US-ASCII")

  /** One decoded MJPEG frame: geometry and frame count are container
    * facts (exact, oracle-checkable); `jpeg_bytes` and `mean_px` come
    * from the real lossy codec (deterministic per JVM, but not
    * SQL-reproducible — spec-pinned instead: the mean of a decoded
    * solid-shade frame must sit within JPEG's DC-quantization error
    * of the source shade).
    */
  final case class MjpegFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, n_frames: Int, jpeg_bytes: Int, mean_px: Int)

  /** REAL MJPEG-style payloads: per document, n solid-shade frames
    * (geometry from doc metadata, shade varying per frame) each
    * ENCODED through the JDK's lossy JPEG writer and packetized with
    * a length prefix. All pixel and codec work happens inside the
    * executor-side iterator with ONE reusable writer per partition
    * ([[PartitionImageCodec]]) — the amortization the mapPartitions
    * shape exists for.
    */
  def withMjpegPayload(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val codec = PartitionImageCodec.open()
        it.map { case (id, nChars) =>
          val w = 16 + (id % 8).toInt * 4
          val h = 16 + (nChars % 8).toInt * 4
          val n = 2 + (id % 4).toInt
          val packets = (0 until n).map { f =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val shade = ((id + 17 * f) % 256).toInt
            fillSolid(img, (shade << 16) | (shade << 8) | shade)
            codec.writeJpeg(img)
          }
          val buf = java.nio.ByteBuffer.allocate(
            16 + packets.map(4 + _.length).sum)
          buf.put(MjpegMagic).putInt(w).putInt(h).putInt(n)
          packets.foreach(p => buf.putInt(p.length).put(p))
          (id, buf.array())
        } ++ { codec.dispose(); Iterator.empty }
      }
      .toDF("doc_id", "content")
  }

  /** Decode + frame-sample MJPEG payloads: validate the header, WALK
    * the length-prefixed packets — a skipped frame costs one length
    * read, never a decode; that selective-decode economics is why
    * packetized containers exist — and run the real JPEG decoder on
    * every `stride`-th frame, cross-checking the decoded raster's
    * geometry against the container header. Corrupt headers, lying
    * lengths, and undecodable packets all die with doc-labeled
    * errors.
    */
  def decodeMjpegFrames(media: Dataset[MediaRow],
      stride: Int): Dataset[MjpegFrame] = {
    import media.sparkSession.implicits._
    require(stride > 0, s"stride $stride must be positive")
    media.mapPartitions { it =>
      val codec = PartitionImageCodec.open()
      it.flatMap { r =>
        val buf = java.nio.ByteBuffer.wrap(r.content)
        val magic = new Array[Byte](4)
        buf.get(magic)
        require(java.util.Arrays.equals(magic, MjpegMagic),
          s"doc ${r.doc_id}: not a GVJM payload")
        val (w, h, n) = (buf.getInt, buf.getInt, buf.getInt)
        require(w > 0 && h > 0 && n >= 0 && w <= 32768 && h <= 32768,
          s"doc ${r.doc_id}: corrupt GVJM header (w=$w h=$h n=$n)")
        val out = Vector.newBuilder[MjpegFrame]
        var f = 0
        while (f < n) {
          require(buf.remaining() >= 4,
            s"doc ${r.doc_id}: GVJM truncated at frame $f length prefix")
          val len = buf.getInt
          require(len > 0 && len <= buf.remaining(),
            s"doc ${r.doc_id}: GVJM frame $f claims $len bytes, " +
              s"${buf.remaining()} remain")
          if (f % stride == 0) {
            val img =
              try codec.readJpeg(r.content, buf.position(), len)
              catch {
                case e: java.io.IOException => throw new
                    IllegalArgumentException(
                      s"doc ${r.doc_id}: frame $f is not decodable " +
                        s"JPEG (${e.getMessage})")
              }
            require(img.getWidth == w && img.getHeight == h,
              s"doc ${r.doc_id}: frame $f decodes ${img.getWidth}x" +
                s"${img.getHeight}, header says ${w}x$h")
            out += MjpegFrame(r.doc_id, f, w, h, n, len, meanRed(img))
          }
          buf.position(buf.position() + len)
          f += 1
        }
        out.result()
      } ++ { codec.dispose(); Iterator.empty }
    }
  }

  /** Sampled compressed-frame table for the documents corpus: MJPEG
    * encode → binary column → packet-walk + selective JPEG decode.
    */
  def decodedMjpegStats(spark: SparkSession, docs: DataFrame,
      stride: Int = 2): DataFrame = {
    import spark.implicits._
    decodeMjpegFrames(withMjpegPayload(docs).as[MediaRow], stride)
      .toDF()
  }

  /** "GVDF" — INTER-frame compressed video: GOP structure (every
    * `Gop`-th frame is an I-frame), temporal prediction (P-frames
    * store modular byte deltas against the previous frame), and real
    * entropy coding (`java.util.zip` Deflate — in the JDK). This is
    * the genuine anatomy of inter-frame compression — keyframes,
    * prediction residuals, an entropy coder, and the decode-chain
    * constraint that a P-frame is unreadable without its
    * predecessors — in an honest custom container (it does not decode
    * H.264 files; ffmpeg/javacv remains that drop-in). Because
    * Deflate is LOSSLESS, every decoded pixel is exactly
    * reproducible, so unlike the lossy MJPEG path the WHOLE decode —
    * pixel sums included — is DuckDB-oracle-checkable in closed form.
    */
  val InterMagic: Array[Byte] = "GVDF".getBytes("US-ASCII")

  /** GOP length of the GVDF fixtures (I-frame every 3rd frame). */
  val Gop = 3

  /** One decoded GVDF frame: geometry, keyframe flag, and the EXACT
    * pixel sum of the reconstructed raster.
    */
  final case class InterFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, n_frames: Int, is_key: Boolean, px_sum: Long)

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflateBytes(packed: Array[Byte], off: Int, len: Int,
      expect: Int, what: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(packed, off, len)
    val out = new Array[Byte](expect)
    val got = inf.inflate(out)
    val leftover = !inf.finished()
    inf.end()
    require(got == expect && !leftover,
      s"$what: inflated $got bytes, expected $expect")
    out
  }

  /** The GVDF fixture raster for (doc, frame): HIGH-ENTROPY base
    * noise — pixel i is `(id + f + i·37) % 256`, which cycles through
    * all residues with no runs, so an I-frame is genuinely
    * incompressible — plus a moving 16-byte block. Consecutive frames
    * differ by a constant +1 everywhere (the f term) and the block,
    * so the P-frame residual deflates to almost nothing while the
    * I-frame cannot (spec-asserted): the compression comes from the
    * PREDICTION, exactly the inter-frame point. Every term has a
    * closed form, so pixel sums stay SQL-oracle-exact.
    */
  private def renderInterFrame(id: Long, f: Int, w: Int,
      h: Int): Array[Byte] = {
    val block = ((id * 3 + f * 11) % 256).toByte
    val raw = new Array[Byte](w * h)
    var i = 0
    while (i < raw.length) {
      raw(i) = ((id + f + i.toLong * 37) % 256).toByte; i += 1
    }
    val p0 = (f * 97) % (w * h - 16)
    var j = 0
    while (j < 16) { raw(p0 + j) = block; j += 1 }
    raw
  }

  /** REAL inter-frame payloads: per document, n rasters run through
    * GOP-keyed Deflate — I-frames compress the raw raster, P-frames
    * the modular byte delta against the previous frame. Layout:
    * magic, w, h, n, then per frame [type byte 0=I/1=P][len][packet].
    */
  def withInterframePayload(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("n_chars").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val w = 16 + (id % 8).toInt * 4
          val h = 16 + (nChars % 8).toInt * 4
          val n = 4 + (id % 4).toInt
          var prev: Array[Byte] = null
          val packets = (0 until n).map { f =>
            val raw = renderInterFrame(id, f, w, h)
            val (tpe, payload) =
              if (f % Gop == 0) (0: Byte, deflateBytes(raw))
              else {
                val delta = new Array[Byte](raw.length)
                var i = 0
                while (i < raw.length) {
                  delta(i) = (raw(i) - prev(i)).toByte; i += 1
                }
                (1: Byte, deflateBytes(delta))
              }
            prev = raw
            (tpe, payload)
          }
          val buf = java.nio.ByteBuffer.allocate(
            16 + packets.map(5 + _._2.length).sum)
          buf.put(InterMagic).putInt(w).putInt(h).putInt(n)
          packets.foreach { case (t, p) =>
            buf.put(t).putInt(p.length).put(p)
          }
          (id, buf.array())
        }
      }
      .toDF("doc_id", "content")
  }

  /** Decode GVDF payloads: walk the GOP chain reconstructing every
    * frame (a P-frame is its predecessor plus the inflated residual —
    * the decode-chain cost inter-frame codecs impose; selective decode
    * would seek to the previous I-frame, which the GOP structure
    * exists for), emitting every `stride`-th frame's exact pixel sum.
    * Corrupt headers, unknown packet types, a leading P-frame, and
    * size-lying packets all die with doc-labeled errors.
    */
  def decodeInterframeFrames(media: Dataset[MediaRow],
      stride: Int): Dataset[InterFrame] = {
    import media.sparkSession.implicits._
    require(stride > 0, s"stride $stride must be positive")
    media.flatMap { r =>
      val buf = java.nio.ByteBuffer.wrap(r.content)
      val magic = new Array[Byte](4)
      buf.get(magic)
      require(java.util.Arrays.equals(magic, InterMagic),
        s"doc ${r.doc_id}: not a GVDF payload")
      val (w, h, n) = (buf.getInt, buf.getInt, buf.getInt)
      require(w > 4 && h > 4 && n >= 0 && w <= 32768 && h <= 32768,
        s"doc ${r.doc_id}: corrupt GVDF header (w=$w h=$h n=$n)")
      var prev: Array[Byte] = null
      val out = Vector.newBuilder[InterFrame]
      var f = 0
      while (f < n) {
        require(buf.remaining() >= 5,
          s"doc ${r.doc_id}: GVDF truncated at frame $f header")
        val tpe = buf.get()
        val len = buf.getInt
        require(len > 0 && len <= buf.remaining(),
          s"doc ${r.doc_id}: GVDF frame $f claims $len bytes, " +
            s"${buf.remaining()} remain")
        val raw = tpe match {
          case 0 =>
            inflateBytes(r.content, buf.position(), len, w * h,
              s"doc ${r.doc_id} I-frame $f")
          case 1 =>
            require(prev != null,
              s"doc ${r.doc_id}: GVDF starts with a P-frame")
            val delta = inflateBytes(r.content, buf.position(), len,
              w * h, s"doc ${r.doc_id} P-frame $f")
            var i = 0
            while (i < delta.length) {
              delta(i) = (delta(i) + prev(i)).toByte; i += 1
            }
            delta
          case t => throw new IllegalArgumentException(
            s"doc ${r.doc_id}: GVDF frame $f has unknown type $t")
        }
        prev = raw
        if (f % stride == 0) {
          var sum = 0L
          var i = 0
          while (i < raw.length) { sum += raw(i) & 0xff; i += 1 }
          // is_key reports the PACKET TYPE actually read, not the
          // fixture's GOP grid: the decoder accepts an I-frame at any
          // position (real encoders insert scene-cut keyframes), and
          // the flag must be truthful for any writer
          out += InterFrame(r.doc_id, f, w, h, n, tpe == 0, sum)
        }
        buf.position(buf.position() + len)
        f += 1
      }
      out.result()
    }
  }

  /** Sampled inter-frame stats for the documents corpus: GOP encode →
    * binary column → chain decode, fully oracle-exact (Deflate is
    * lossless).
    */
  def decodedInterframeStats(spark: SparkSession, docs: DataFrame,
      stride: Int = 2): DataFrame = {
    import spark.implicits._
    decodeInterframeFrames(withInterframePayload(docs).as[MediaRow],
      stride).toDF()
  }

  /** Write each document's PNG payload as an individual FILE under
    * `dir` (sharded into 16 subdirectories so no single listing
    * explodes) — the on-disk shape a crawled media corpus actually
    * arrives in before anyone parquet-packs it. The writes run from
    * executors through the Hadoop FS API (per-partition connection,
    * exactly how a distributed ingest job lands files on shared
    * storage); nothing is collected.
    */
  def writeMediaFiles(docs: DataFrame, dir: String): Unit = {
    import docs.sparkSession.implicits._
    import scala.jdk.CollectionConverters._
    // ship the SESSION's Hadoop conf to the executors (as a plain
    // key/value vector — Configuration itself is not serializable): a
    // bare new Configuration() would drop every spark.hadoop.* setting
    // and break exactly the shared-storage (s3a/abfs credentials,
    // endpoints) case this writer exists for
    val hadoopKv = docs.sparkSession.sessionState.newHadoopConf()
      .iterator().asScala.map(e => e.getKey -> e.getValue).toVector
    withPngPayload(docs).as[MediaRow].foreachPartition {
      (it: Iterator[MediaRow]) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        hadoopKv.foreach { case (k, v) => conf.set(k, v) }
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
        it.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(
            s"$dir/shard=${r.doc_id % 16}/${r.doc_id}.png")
          val out = fs.create(p, true)
          try out.write(r.content) finally out.close()
        }
    }
  }

  /** Ingest media FILES through Spark's `binaryFile` source — the
    * built-in reader for exactly this corpus shape: one row per file
    * with (path, modificationTime, length, content), glob filtering
    * applied AT LISTING time (non-matching files are never opened,
    * the pushdown that matters when a crawl directory mixes
    * sidecar .json/.txt with the media), recursive lookup over the
    * shard tree, and `maxPartitionBytes`-sized splits. The doc id is
    * recovered from the file name; the result feeds the SAME
    * [[decodeImage]]/[[decodeMjpegFrames]] decoders the
    * parquet-column path uses — source format and codec plumbing
    * compose orthogonally.
    */
  def readMediaFiles(spark: SparkSession, dir: String,
      glob: String = "*.png"): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)\\.[a-z]+$", 1)
          .cast("long").as("doc_id"),
        col("content"))
      .as[MediaRow]
  }
}
