package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextUtil

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode/feature steps run as
  * batched per-partition transforms (the Scala analogue of `mapInPandas`).
  *
  * Image decoding is REAL: PNG/GIF/BMP/JPEG payloads go through
  * `javax.imageio` (ships with the JDK — zero extra deps) for dimensions
  * and pixel statistics. Audio decoding is REAL too: WAV payloads go
  * through `javax.sound.sampled` for rate/channels/frames/duration.
  * VIDEO frame extraction is real for MJPEG (concatenated JFIF — a
  * container that exists in the wild) and the length-prefixed PNG
  * container; only foreign codecs (H.264 etc. — no JDK codec) fall back
  * to the stub behind the same typed contract.
  */
object Multimodal {

  // image decode runs on executors with no display attached
  System.setProperty("java.awt.headless", "true")

  case class Asset(asset_id: Long, payload: Array[Byte], media_type: String)
  case class AudioMeta(
      asset_id: Long,
      sample_rate: Int,
      channels: Int,
      n_samples: Long,
      duration_ms: Double)
  case class AssetMeta(
      asset_id: Long,
      n_bytes: Int,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int)
  case class AssetFeature(asset_id: Long, feature: Array[Float])

  /** STUB decoder for video payloads (and anything else without a JDK
    * codec): deterministic fake dimensions from the payload hash. A real
    * deployment swaps this for a codec; the signature (bytes in, typed
    * metadata out, executed per partition in batches) is the contract
    * that stays. */
  private[operators] def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = TextUtil.hash64(payload)
    val width = 64 + (math.abs(h % 1024)).toInt
    val height = 64 + (math.abs((h >> 10) % 1024)).toInt
    val frames = 1 + (math.abs((h >> 20) % 32)).toInt
    (width, height, frames)
  }

  /** True iff the payload carries a magic number `javax.imageio` decodes
    * here: PNG, GIF, BMP, or JPEG. */
  private[operators] def isDecodableImage(p: Array[Byte]): Boolean =
    p != null && p.length >= 8 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte))

  /** REAL image decode via `javax.imageio` (JDK-shipped): dimensions for
    * metadata, full pixel raster for feature extraction. Returns None for
    * undecodable/corrupt payloads (callers fall back to the stub). */
  private[operators] def decodeImage(p: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!isDecodableImage(p)) None
    else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p)))

  /** Encode a solid-color RGB PNG via `javax.imageio` — the write half of
    * the real codec path, used to build image columns from typed data. */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Wrap a text table as fake binary assets (payload = UTF-8 bytes). */
  def asAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      col(textCol).cast(BinaryType).as("payload"),
      concat(lit("image/fake-"), pmod(col(idCol), lit(3)).cast(StringType))
        .as("media_type"))

  /** Encode PCM16 WAV via `javax.sound.sampled` (JDK-shipped) — the write
    * half of the real audio codec path. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode via `javax.sound.sampled`: WAV payloads yield
    * sample rate, channels, frame count, duration. None when the payload
    * is not decodable audio. */
  private[operators] def decodeWav(p: Array[Byte]): Option[AudioMeta] =
    if (p == null || p.length < 12 ||
      p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F') None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val fmt = ais.getFormat
        val frames = ais.getFrameLength
        Some(AudioMeta(
          -1L, fmt.getSampleRate.toInt, fmt.getChannels, frames,
          frames * 1000.0 / fmt.getSampleRate))
      } finally ais.close()
    } catch { case _: Exception => None }

  /** REAL full-PCM decode via `javax.sound.sampled`: WAV payload ->
    * (rate, channels, interleaved 16-bit LE samples). None when the
    * payload is not decodable PCM16 audio. */
  private[operators] def decodeWavSamples(
      p: Array[Byte]): Option[(Int, Int, Array[Short])] =
    if (p == null || p.length < 12 ||
      p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F') None
    else try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else {
          val bytes = ais.readAllBytes()
          val samples = new Array[Short](bytes.length / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) =
              (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
            i += 1
          }
          Some((fmt.getSampleRate.toInt, fmt.getChannels, samples))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  case class AudioWindowFeat(
      asset_id: Long,
      channel: Int,
      window_index: Int,
      n_samples: Int,
      mean_amp: Double,
      rms: Double,
      peak: Int)

  /** Windowed audio feature extraction over REAL decoded PCM — the
    * energy/level pass a speech/audio curation pipeline runs before VAD
    * or loudness filtering: per (channel, fixed frame window) mean
    * amplitude, RMS energy, and peak. Map-only (an asset's samples never
    * leave its task); sums accumulate in exact longs before one double
    * division, and rounding is half-away-from-zero — the per-window
    * numbers are bit-identical across engines. */
  def audioFeatures(assets: DataFrame, windowFrames: Int = 100)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(windowFrames > 0, "windowFrames must be positive")
    // half away from zero — SQL round() semantics, sign-safe
    def r6(v: Double): Double =
      (if (v >= 0) math.floor(v * 1e6 + 0.5) else math.ceil(v * 1e6 - 0.5)) / 1e6
    assets.as[Asset].mapPartitions { it =>
      it.flatMap { a =>
        decodeWavSamples(a.payload).iterator.flatMap { case (_, ch, samples) =>
          val frames = samples.length / ch
          val nW = (frames + windowFrames - 1) / windowFrames
          (0 until ch).iterator.flatMap { c =>
            (0 until nW).iterator.map { w =>
              val end = math.min((w + 1) * windowFrames, frames)
              var f = w * windowFrames
              var sum = 0L; var sumSq = 0L; var peak = Int.MinValue; var n = 0
              while (f < end) {
                val s = samples(f * ch + c).toInt
                sum += s; sumSq += s.toLong * s
                if (s > peak) peak = s
                n += 1; f += 1
              }
              AudioWindowFeat(a.asset_id, c, w, n,
                r6(sum.toDouble / n), r6(math.sqrt(sumSq.toDouble / n)), peak)
            }
          }
        }
      }
    }.toDF()
  }

  /** Deterministic real-WAV asset per id: rate/channels/length derived
    * from the id by integer formulas (an oracle predicts the DECODED
    * metadata without seeing the bytes); samples are a deterministic
    * sawtooth. Encoding runs batched per partition. */
  def syntheticAudio(df: DataFrame, idCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("asset_id"))
      .as[Long].mapPartitions { it =>
        it.map { id =>
          val rate = (8000 * (1 + id % 3)).toInt
          val channels = (1 + id % 2).toInt
          val frames = (400 + (id % 100) * 4).toInt
          val samples = Array.tabulate(frames * channels)(i => ((id * 31 + i * 7) % 8192).toShort)
          Asset(id, encodeWav(rate, channels, samples), "audio/wav")
        }
      }.toDF()
  }

  /** Batched per-partition audio decode: binary payload -> typed audio
    * metadata through the real JDK codec. */
  def decodeAudioMeta(assets: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.flatMap { a => decodeWav(a.payload).map(_.copy(asset_id = a.asset_id)) }
    }.toDF()
  }

  /** Deterministic real-PNG asset per id: size and solid color derived
    * from the id by simple integer formulas (so an oracle can predict the
    * DECODED dimensions and channel means without seeing the bytes).
    * Encoding runs batched per partition — the distributed shape a real
    * media-ingest pipeline has. */
  def syntheticImages(df: DataFrame, idCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("asset_id"))
      .as[Long].mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 57).toInt
          val h = (8 + (id / 7) % 57).toInt
          val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) | ((id * 13) % 256)).toInt
          Asset(id, encodePng(w, h, rgb), "image/png")
        }
      }.toDF()
  }

  /** Batched per-partition decode: binary payload -> typed metadata.
    * Real `javax.imageio` decode for image payloads (PNG/GIF/BMP/JPEG);
    * the deterministic stub covers audio/video. Runs as `mapPartitions`
    * over the typed Dataset — one JVM-side batch loop per partition, no
    * per-row task overhead, no shuffle. */
  def decodeMetadata(assets: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val (w, h, f) = decodeImage(a.payload) match {
          case Some(img) => (img.getWidth, img.getHeight, 1)
          case None => decodeStub(a.payload)
        }
        AssetMeta(a.asset_id, a.payload.length, a.media_type, w, h, f)
      }
    }.toDF()
  }

  case class ResizedAsset(
      asset_id: Long,
      payload: Array[Byte],
      media_type: String,
      width: Int,
      height: Int,
      orig_width: Int,
      orig_height: Int)

  /** REAL image resize (bilinear, `java.awt.Graphics2D` — JDK-only,
    * headless-safe): decodable payloads re-encode as PNG at the target
    * size; non-decodable payloads pass through untouched with -1 original
    * dims. Batched per-partition like every decode step — the training
    * preprocessing shape (normalize resolution before feature/VLM
    * stages). */
  /** Deterministic real-PNG textured asset per id: every pixel's gray
    * level follows `(id*7 + 3x² + 5y² + xy) % 256` (written as R=G=B), so
    * a downstream perceptual hash is oracle-predictable pixel by pixel.
    * The NONLINEAR terms matter: a pure linear gradient makes every
    * dHash comparison point the same way (near-all-ones hashes — a
    * degenerate hash space); solid colors ([[syntheticImages]]) are
    * worse still (all zeros). Ids that differ by a multiple of 256
    * produce IDENTICAL pixels (id enters as id·7 mod 256) — the planted
    * exact-duplicate mechanism image-dedup queries lean on. */
  def syntheticGradientImages(df: DataFrame, idCol: String, w: Int, h: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("asset_id"))
      .as[Long].mapPartitions { it =>
        it.map { id =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((id * 7 + 3L * x * x + 5L * y * y + x.toLong * y) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Asset(id, bos.toByteArray, "image/png")
        }
      }.toDF()
  }

  /** Difference-hash (dHash) perceptual fingerprint over REAL decoded
    * pixels — the image near-duplicate primitive (re-encodes, light
    * crops, and recompression keep a small Hamming distance; unrelated
    * images land ~32/64 apart). Pipeline: decode → integer grayscale
    * (floor((r+g+b)/3)) → area-average downscale to (hashW+1)×hashH
    * (exact integer block mean when dimensions divide, the deterministic
    * path an oracle can replay) → bit (x,y) = gray(x+1,y) > gray(x,y),
    * emitted as a '01' string MSB-first by (y,x) so the 64-bit value
    * never meets BIGINT sign issues in any engine. Map-only; feed the
    * bits to [[Dedup.simhashPairs]]-style pigeonhole bucketing for pair
    * generation at corpus scale. */
  def dHash(assets: DataFrame, hashW: Int = 8, hashH: Int = 8)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (gw, gh) = (hashW + 1, hashH)
    assets.as[Asset].mapPartitions { it =>
      it.flatMap { a =>
        decodeImage(a.payload).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          // area-average to gw x gh: exact integer block mean on exact
          // multiples; otherwise pixel-dropping nearest sampling of
          // block corners (still deterministic, documented)
          val grid = Array.ofDim[Int](gh, gw)
          var gy = 0
          while (gy < gh) {
            var gx = 0
            while (gx < gw) {
              val x0 = gx * w / gw; val x1 = math.max((gx + 1) * w / gw, x0 + 1)
              val y0 = gy * h / gh; val y1 = math.max((gy + 1) * h / gh, y0 + 1)
              var sum = 0L; var n = 0
              var y = y0
              while (y < y1) {
                var x = x0
                while (x < x1) {
                  val rgb = img.getRGB(x, y)
                  sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  n += 1; x += 1
                }
                y += 1
              }
              grid(gy)(gx) = (sum / (3L * n)).toInt
              gx += 1
            }
            gy += 1
          }
          val bits = new StringBuilder(hashW * hashH)
          var y = 0
          while (y < gh) {
            var x = 0
            while (x < hashW) {
              bits.append(if (grid(y)(x + 1) > grid(y)(x)) '1' else '0')
              x += 1
            }
            y += 1
          }
          (a.asset_id, w, h, bits.toString)
        }
      }
    }.toDF("asset_id", "width", "height", "dhash_bits")
  }

  def resizeImages(assets: DataFrame, width: Int, height: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        decodeImage(a.payload) match {
          case Some(img) =>
            val out = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, width, height, null)
            } finally g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            ResizedAsset(a.asset_id, bos.toByteArray, "image/png",
              width, height, img.getWidth, img.getHeight)
          case None =>
            ResizedAsset(a.asset_id, a.payload, a.media_type, -1, -1, -1, -1)
        }
      }
    }.toDF()
  }

  /** Feature extraction over DECODED pixels for image payloads: [width,
    * height, mean R, mean G, mean B] from the real raster (solid or not —
    * means accumulate over every pixel). Non-image payloads keep the
    * hash-seeded stub vector (a model call in a real deployment); both
    * run in the same batched per-partition shape. */
  def extractFeatures(assets: DataFrame, dim: Int = 16)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val feat = decodeImage(a.payload) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb) = (0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            Array(w.toFloat, h.toFloat,
              (sr.toDouble / n).toFloat, (sg.toDouble / n).toFloat, (sb.toDouble / n).toFloat)
          case None =>
            val h = TextUtil.hash64(a.payload)
            Array.tabulate(dim) { i =>
              val x = TextUtil.hash64(s"feat-$h-$i")
              (x.toDouble / Long.MaxValue.toDouble).toFloat
            }
        }
        AssetFeature(a.asset_id, feat)
      }
    }.toDF()
  }

  /** Frame sampling stub for video-like payloads: emits every k-th "frame"
    * index with a per-frame payload slice — demonstrates the 1-to-N typed
    * flatMap shape used for real frame extraction. */
  def sampleFrames(assets: DataFrame, everyK: Int = 8)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      val (_, _, frames) = decodeStub(a.payload)
      (0 until frames by everyK).map { fi =>
        (a.asset_id, fi, TextUtil.hash64(s"frame-${a.asset_id}-$fi"))
      }
    }.toDF("asset_id", "frame_index", "frame_hash")
  }

  // ---- video: length-prefixed PNG-frame container ("GFRM") ----
  // There is no video codec in the JDK, so the REAL path covers a simple
  // container of independently-encoded frames (the motion-JPEG idea):
  // parse the container, decode each frame with imageio. The hash stub
  // above remains only for real-world codecs (H.264 etc.).

  private val FrameMagic = Array[Byte]('G', 'F', 'R', 'M')

  /** container = magic, frame count (int32 BE), then [len][png] per frame */
  def encodeFrameContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(FrameMagic)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  private[operators] def decodeFrameContainer(p: Array[Byte]): Option[Seq[Array[Byte]]] =
    if (p == null || p.length < 8 || !p.take(4).sameElements(FrameMagic)) None
    else try {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(p, 4, p.length - 4))
      val n = in.readInt()
      Some((0 until n).map { _ =>
        val len = in.readInt()
        val f = new Array[Byte](len)
        in.readFully(f)
        f
      })
    } catch { case _: Exception => None }

  // ---- video: MJPEG (concatenated JFIF) — a container that exists in
  // the wild. Frames are independent JPEGs back to back; FF-byte stuffing
  // inside entropy-coded data guarantees the EOI marker (FF D9) only
  // appears at true frame ends, so splitting on SOI..EOI spans is exact.

  /** encode a solid-color RGB JPEG via `javax.imageio` (JDK-shipped) */
  def encodeJpeg(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** MJPEG stream = frames concatenated raw */
  def encodeMjpeg(frames: Seq[Array[Byte]]): Array[Byte] = frames.flatten.toArray

  /** Split an MJPEG stream into its frames (SOI FF D8 .. EOI FF D9) by
    * walking the JPEG marker-segment structure: APPn/COM/DQT/... segments
    * are skipped via their length fields (an FF D9 inside an EXIF
    * thumbnail payload must NOT end the frame), and inside entropy-coded
    * scan data FF is only ever stuffed (FF 00) or an RST marker, so the
    * real EOI is unambiguous. A desynced tail (truncated capture) keeps
    * the frames already found. */
  private[graft] def splitMjpeg(p: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (p == null || p.length < 4 ||
      p(0) != 0xff.toByte || p(1) != 0xd8.toByte) return None
    def u(b: Byte): Int = b & 0xff
    val frames = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var start = 0
    var i = 2 // just past this frame's SOI
    var ok = true
    while (ok && start < p.length - 1) {
      var end = -1
      while (end < 0 && ok) {
        if (i + 1 >= p.length || u(p(i)) != 0xff) ok = false
        else u(p(i + 1)) match {
          case 0xd9 => end = i + 2 // EOI
          case 0xff => i += 1 // fill byte before a marker
          case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) => i += 2 // standalone
          case 0xd8 => ok = false // nested SOI: desync
          case 0xda => // SOS: header by length, then entropy-coded data
            if (i + 3 >= p.length) ok = false
            else {
              var j = i + 2 + (((u(p(i + 2)) << 8) | u(p(i + 3))) max 2)
              var found = false
              while (!found && j + 1 < p.length) {
                if (u(p(j)) != 0xff) j += 1
                else {
                  val n = u(p(j + 1))
                  if (n == 0x00 || (n >= 0xd0 && n <= 0xd7)) j += 2 // stuffed/RST
                  else found = true
                }
              }
              if (found) i = j else ok = false
            }
          case _ => // APPn/COM/DQT/DHT/SOFn/...: 2-byte length includes itself
            if (i + 3 >= p.length) ok = false
            else i = i + 2 + (((u(p(i + 2)) << 8) | u(p(i + 3))) max 2)
        }
      }
      if (ok && end > 0) {
        frames += java.util.Arrays.copyOfRange(p, start, end)
        // tolerate padding between frames: scan to the next SOI
        start = end
        while (start < p.length - 1 &&
          !(p(start) == 0xff.toByte && p(start + 1) == 0xd8.toByte)) start += 1
        i = start + 2
      }
    }
    if (frames.isEmpty) None else Some(frames.toSeq)
  }

  /** frames of either supported container: length-prefixed PNG (GFRM) or
    * MJPEG; None for foreign codecs (H.264 etc. — the stub's territory) */
  private[operators] def containerFrames(p: Array[Byte]): Option[Seq[Array[Byte]]] =
    decodeFrameContainer(p).orElse(splitMjpeg(p))

  /** Deterministic MJPEG asset per id: 2 + id%5 solid-color JPEG frames
    * sized by id formulas. JPEG is lossy, so only STRUCTURAL stats
    * (frame count, index, dimensions) are oracle-exact — pixel-exact
    * oracles ride the PNG container instead. */
  def syntheticMjpegVideos(df: DataFrame, idCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("asset_id"))
      .as[Long].mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + id % 8).toInt
          val frames = (2 + id % 5).toInt
          val jpgs = (0 until frames).map { f =>
            val rgb = ((((id + f) % 256) << 16) |
              (((id * 3 + f) % 256) << 8) | ((id * 5 + f) % 256)).toInt
            encodeJpeg(w, h, rgb)
          }
          Asset(id, encodeMjpeg(jpgs), "video/x-motion-jpeg")
        }
      }.toDF()
  }

  /** Deterministic container-video asset per id: 2 + id%7 solid-color PNG
    * frames whose size and per-frame color follow id formulas (an oracle
    * predicts every DECODED frame stat without seeing the bytes). */
  def syntheticVideos(df: DataFrame, idCol: String)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast(LongType).as("asset_id"))
      .as[Long].mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + id % 8).toInt
          val frames = (2 + id % 7).toInt
          val pngs = (0 until frames).map { f =>
            val rgb = ((((id + f) % 256) << 16) |
              (((id * 3 + f) % 256) << 8) | ((id * 5 + f) % 256)).toInt
            encodePng(w, h, rgb)
          }
          Asset(id, encodeFrameContainer(pngs), "video/x-graft-frames")
        }
      }.toDF()
  }

  /** Scene-cut keyframe selection: decode EVERY frame, compute its mean
    * RGB, and measure the L1 color delta against the previous frame —
    * frame 0 and any frame whose delta exceeds `threshold` is a
    * keyframe (the shot-boundary heuristic a video curation pipeline
    * runs before captioning/dedup: keep one frame per scene, not one
    * per tick). Map-only: an asset's frames never leave its task, so
    * the operator scales with assets × frames like the samplers. Mean
    * colors of solid synthetic frames are exact integers, so deltas are
    * oracle-exact (rounded 6dp against real-image float means). */
  def keyframes(assets: DataFrame, threshold: Double = 8.0)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      containerFrames(a.payload).toSeq.flatMap { frames =>
        var prev: (Double, Double, Double) = null
        frames.zipWithIndex.map { case (bytes, fi) =>
          val img = decodeImage(bytes).getOrElse(
            sys.error(s"undecodable frame $fi of asset ${a.asset_id}"))
          val (w, h) = (img.getWidth, img.getHeight)
          var r = 0L; var g = 0L; var b = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          val (mr, mg, mb) = (r / n, g / n, b / n)
          val delta =
            if (prev == null) 0.0
            else (math.abs(mr - prev._1) + math.abs(mg - prev._2) +
              math.abs(mb - prev._3)) / 3.0
          val isKey = fi == 0 || delta > threshold
          prev = (mr, mg, mb)
          (a.asset_id, fi.toLong, math.rint(delta * 1e6) / 1e6, isKey)
        }
      }
    }.toDF("asset_id", "frame_index", "color_delta", "is_keyframe")
  }

  /** REAL frame extraction: parse the container, decode every `everyK`-th
    * frame with imageio, emit typed per-frame stats — the 1-to-N batched
    * flatMap shape of a production frame sampler, with a real decoder. */
  def sampleVideoFrames(assets: DataFrame, everyK: Int = 2)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      containerFrames(a.payload).toSeq.flatMap { frames =>
        frames.zipWithIndex.collect {
          case (png, fi) if fi % everyK == 0 =>
            val img = decodeImage(png).getOrElse(
              sys.error(s"undecodable frame $fi of asset ${a.asset_id}"))
            val p = img.getRGB(0, 0)
            (a.asset_id, fi, img.getWidth, img.getHeight,
              (p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)
        }
      }
    }.toDF("asset_id", "frame_index", "width", "height", "red", "green", "blue")
  }
}
