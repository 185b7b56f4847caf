package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.MediaKernel

/** Pixel-level contracts for the real `javax.imageio` media kernels (the
  * queries themselves are additionally DuckDB-oracled end-to-end).
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("PNG roundtrip is pixel-exact (raster-level gray, no sRGB gamma drift)") {
    val k = new MediaKernel
    val pix = (x: Int, y: Int) => (x * 31 + y * 7) % 256
    val png = k.encodePng(40, 25, pix)
    // real PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val (fmt, g) = k.decodeImage(png)
    assert(fmt == "png" && g.width == 40 && g.height == 25)
    for (y <- 0 until 25; x <- 0 until 40)
      assert(g.pix(y * 40 + x) == pix(x, y), s"pixel ($x,$y)")
  }

  test("multi-frame GIF roundtrip: frame count and per-frame pixels exact") {
    val k = new MediaKernel
    val pix = (f: Int, x: Int, y: Int) => (f * 50 + x * 3 + y * 11) % 256
    val gif = k.encodeGif(20, 13, 3, pix)
    assert(gif(0) == 'G' && gif(1) == 'I' && gif(2) == 'F')
    val frames = k.decodeGifFrames(gif)
    assert(frames.length == 3)
    for (f <- 0 until 3; y <- 0 until 13; x <- 0 until 20)
      assert(frames(f).pix(y * 20 + x) == pix(f, x, y), s"frame $f pixel ($x,$y)")
  }

  test("area-average resize: exact integer box-filter means; no upscale") {
    val k = new MediaKernel
    // 4×4 → 2×2: each thumb cell is the floor-mean of its 2×2 block
    val src = MediaKernel.Gray(4, 4, Array(
      10, 20, 30, 40,
      50, 60, 70, 80,
      1, 2, 3, 4,
      5, 6, 7, 8))
    val t = k.resizeAreaAvg(src, 2)
    assert((t.width, t.height) == ((2, 2)))
    assert(t.pix.toSeq == Seq((10 + 20 + 50 + 60) / 4, (30 + 40 + 70 + 80) / 4,
      (1 + 2 + 5 + 6) / 4, (3 + 4 + 7 + 8) / 4))
    // ≤ maxSide input is returned untouched
    val small = MediaKernel.Gray(4, 4, src.pix)
    assert(k.resizeAreaAvg(small, 32) eq small)
  }

  test("thumbDims: aspect preserved, long side capped, never 0, never upscaled") {
    assert(MediaKernel.thumbDims(640, 480, 32) == ((32, 24)))
    assert(MediaKernel.thumbDims(480, 640, 32) == ((24, 32)))
    assert(MediaKernel.thumbDims(4000, 10, 32) == ((32, 1))) // never 0
    assert(MediaKernel.thumbDims(20, 30, 32) == ((20, 30))) // no upscale
  }

  test("binaryFile ingest → real decode: file-borne PNG bytes recover exact features") {
    val k = new MediaKernel
    val dir = graft.util.TempDirs.create("graft_png_")
    val specs = (0L until 8L).map { i =>
      val (w, h) = ((10 + i).toInt, (7 + i).toInt)
      val pix = (x: Int, y: Int) => ((i * 13 + x + 5 * y) % 256).toInt
      val bytes = k.encodePng(w, h, pix)
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, f"img_$i%03d.png"), bytes)
      val want = (0 until h).flatMap(y => (0 until w).map(x => pix(x, y).toLong)).sum
      i -> ((w.toLong, h.toLong, want))
    }.toMap
    import spark.implicits._
    val got = spark.read.format("binaryFile").option("pathGlobFilter", "*.png").load(dir)
      .select(regexp_extract(col("path"), "img_(\\d+)\\.png$", 1).cast("long").as("id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new MediaKernel
        it.map { case (id, bytes) =>
          val (_, g) = dec.decodeImage(bytes)
          (id, g.width.toLong, g.height.toLong, dec.lumaSum(g))
        }
      }.collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == specs)
  }

  test("q66 features equal the closed-form generator contract") {
    val rows = Registry.queries("q66_media_decode")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((16 + id % 37).toInt, (16 + id % 23).toInt)
      val want = (0 until h).flatMap(y => (0 until w).map(x => (id * 7 + x + 2 * y) % 256)).sum
      assert(r.getString(1) == "png")
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((w.toLong, h.toLong, want)), s"doc $id")
    }
  }

  test("WAV roundtrip is sample-exact (real javax.sound.sampled codec)") {
    val k = new MediaKernel
    val src = Array.tabulate(777)(i => ((i * 131 - 40000) % 32768).toShort)
    val wav = k.encodeWav(8000, src)
    // RIFF/WAVE magic — a real container, not a raw byte dump
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' && wav(3) == 'F')
    assert(wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' && wav(11) == 'E')
    val pcm = k.decodeWav(wav)
    assert(pcm.rate == 8000)
    assert(pcm.samples.length == 777)
    assert(pcm.samples.sameElements(src))
  }

  test("q189 audio features equal the closed-form generator contract") {
    val rows = Registry.queries("q189_media_audio")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (256 + id % 241).toInt
      val vs = Array.tabulate(n)(i => ((id * 31 + i * 7) % 2048) - 1024)
      assert(r.getString(1) == "wave" && r.getLong(2) == 8000L)
      assert(r.getLong(3) == n.toLong, s"doc $id n_samples")
      assert(r.getLong(4) == vs.map(math.abs).sum, s"doc $id sum_abs")
      assert(r.getLong(5) == vs.map(v => v * v).sum, s"doc $id energy")
      val zc = (1 until n).count(i => (vs(i) < 0) != (vs(i - 1) < 0)).toLong
      assert(r.getLong(6) == zc, s"doc $id zero crossings")
      assert(r.getLong(7) == vs.map(math.abs).max, s"doc $id peak")
    }
  }

  test("JPEG: deterministic encode, bounded decode error, bounded generation drift") {
    val k = new MediaKernel
    // the q187 fixture: continuous triangle wave (no mod-256 cliffs)
    def f(id: Long)(x: Int, y: Int): Int =
      (((id * 7 + x + 2 * y) % 510) - 255).toInt.abs
    var worstErr = 0
    var worstDrift = 0
    for (id <- 0L until 64L) {
      val (w, h) = ((16 + id % 37).toInt, (16 + id % 23).toInt)
      val jpg = k.encodeJpeg(w, h, 0.90f, f(id))
      // JFIF magic + determinism: a second, independent kernel instance
      // produces byte-identical output (what makes the re-encode hash a
      // meaningful spec pin)
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
      assert(java.util.Arrays.equals(jpg, new MediaKernel().encodeJpeg(w, h, 0.90f, f(id))))
      val (fmt, g) = k.decodeImage(jpg)
      assert(fmt == "jpeg" && g.width == w && g.height == h, s"doc $id dims")
      val err = g.pix.indices.map(i => (g.pix(i) - f(id)(i % w, i / w)).abs).max
      val g2 = k.decodeImage(k.encodeJpeg(g, 0.90f))._2
      val drift = g.pix.indices.map(i => (g.pix(i) - g2.pix(i)).abs).max
      worstErr = math.max(worstErr, err)
      worstDrift = math.max(worstDrift, drift)
    }
    // quantitative pins behind q187's boolean verdicts (tolerances 16 / 8)
    assert(worstErr <= 16, s"q0.9 decode error $worstErr exceeds tolerance")
    assert(worstDrift <= 8, s"generation drift $worstDrift exceeds tolerance")
    info(s"measured: worst decode err = $worstErr, worst generation drift = $worstDrift")
  }

  test("q187 verdicts are all-true at sf0.001 (matches the constant oracle)") {
    val rows = Registry.queries("q187_media_jpeg")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "jpeg")
      assert(r.getLong(2) == 16 + id % 37 && r.getLong(3) == 16 + id % 23)
      assert(r.getBoolean(4) && r.getBoolean(5), s"doc $id out of tolerance")
    }
  }

  test("MJPEG container roundtrip: frame-exact walk, independently decodable frames") {
    val k = new MediaKernel
    def pix(id: Long)(f: Int, x: Int, y: Int): Int =
      (((id * 7 + f * 13 + x + 2 * y) % 510) - 255).toInt.abs
    var worstErr = 0
    for (id <- 0L until 48L) {
      val (w, h) = ((16 + id % 37).toInt, (16 + id % 23).toInt)
      val nf = (2 + id % 5).toInt
      val mjpg = k.encodeMjpeg(w, h, nf, 0.90f, pix(id))
      val frames = k.decodeMjpegFrames(mjpg)
      assert(frames.length == nf, s"doc $id frame count")
      // each frame is a complete standalone JFIF stream (|SOI …| per frame)
      frames.zipWithIndex.foreach { case (fr, fi) =>
        assert((fr(0) & 0xff) == 0xff && (fr(1) & 0xff) == 0xd8, s"doc $id frame $fi magic")
        val (fmt, g) = k.decodeImage(fr)
        assert(fmt == "jpeg" && g.width == w && g.height == h)
        val err = g.pix.indices.map(i => (g.pix(i) - pix(id)(fi, i % w, i / w)).abs).max
        worstErr = math.max(worstErr, err)
      }
      // truncation fails loudly — both a cut prefix and a cut payload
      intercept[IllegalArgumentException] {
        k.decodeMjpegFrames(java.util.Arrays.copyOf(mjpg, mjpg.length - 3))
      }
      intercept[IllegalArgumentException] {
        k.decodeMjpegFrames(java.util.Arrays.copyOf(mjpg, 2))
      }
    }
    // quantitative pin behind q193's within_tol verdict (tolerance 16)
    assert(worstErr <= 16, s"MJPEG decode error $worstErr exceeds tolerance")
    info(s"measured: worst per-frame decode err = $worstErr")
  }

  test("q193 video: sampled-frame rows match the generator contract, verdicts all true") {
    val rows = Registry.queries("q193_media_video")(spark, sf).collect()
      .groupBy(_.getLong(0))
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.keySet == ids)
    rows.foreach { case (id, rs) =>
      val nf = (2 + id % 5).toInt
      val idxs = rs.map(_.getLong(2)).sorted
      assert(idxs.sameElements(0L until nf.toLong by 2L), s"doc $id sampled $idxs")
      rs.foreach { r =>
        assert(r.getLong(1) == nf.toLong)
        assert(r.getString(3) == "jpeg")
        assert(r.getLong(4) == 16 + id % 37 && r.getLong(5) == 16 + id % 23)
        assert(r.getBoolean(6), s"doc $id frame ${r.getLong(2)} out of tolerance")
      }
    }
  }

  test("q197 dispatch: magic-sniffed format matches the generator, features exact for lossless") {
    val rows = Registry.queries("q197_media_dispatch")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val expectFmt = (id % 4) match {
        case 0 => "png"; case 1 => "gif"; case 2 => "jpeg"; case _ => "wav"
      }
      assert(r.getString(1) == expectFmt, s"doc $id dispatched wrong")
      assert(r.getBoolean(4), s"doc $id verdict")
      val (w, h) = ((16 + id % 37).toInt, (16 + id % 23).toInt)
      (id % 4) match {
        case 0 | 1 =>
          val luma = (for (y <- 0 until h; x <- 0 until w)
            yield (id * 7 + x + 2 * y) % 256).sum
          assert(r.getLong(2) == (w * h).toLong && r.getLong(3) == luma, s"doc $id")
        case 2 =>
          assert(r.getLong(2) == (w * h).toLong && r.getLong(3) == -1L, s"doc $id")
        case _ =>
          val n = (256 + id % 241).toInt
          val sumAbs = (0 until n).map(i => math.abs(((id * 31 + i * 7) % 2048) - 1024)).sum
          assert(r.getLong(2) == n.toLong && r.getLong(3) == sumAbs, s"doc $id")
      }
    }
  }

  test("q67 frame sampling: ceil(nFrames/2) rows per doc, frame 0 present, thumbs ≤ 32") {
    val frames = Registry.queries("q67_media_frames")(spark, sf).collect()
      .groupBy(_.getLong(0))
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(frames.keySet == ids)
    frames.foreach { case (id, rows) =>
      val nf = (1 + id % 4).toInt
      val idxs = rows.map(_.getLong(1)).sorted
      assert(idxs.head == 0L, s"doc $id missing frame 0")
      assert(idxs.sameElements((0L until nf.toLong by 2)), s"doc $id")
      val (w, h) = ((16 + id % 37).toInt, (16 + id % 23).toInt)
      val (tw, th) = MediaKernel.thumbDims(w, h, 32)
      assert(rows.forall(r => r.getLong(2) == tw && r.getLong(3) == th))
    }
  }

  test("dHash64: invariant under global brightness shift, sensitive to content") {
    val k = new MediaKernel
    def hash(px: (Int, Int) => Int): Long =
      k.dHash64(k.decodeImage(k.encodePng(40, 24, px))._2)
    def base(x: Int, y: Int): Int =
      ((x * 40503L + y * 65027L) % 1000003 % 200).toInt
    val h0 = hash(base)
    // +40 gray everywhere: every comparison sign unchanged → same hash
    assert(hash((x, y) => base(x, y) + 40) == h0)
    // different content (transposed frequencies) → far in Hamming space
    val h1 = hash((x, y) => ((x * 65027L + y * 40503L) % 1000003 % 200).toInt)
    assert(java.lang.Long.bitCount(h0 ^ h1) > 10)
  }

  test("q204: same-group perturbations stay in the Hamming ball, groups separate") {
    val k = new MediaKernel
    def fixtureHash(gid: Long, r: Int): Long = {
      val w = (16 + gid % 37).toInt
      val h = (16 + gid % 23).toInt
      k.dHash64(k.decodeImage(k.encodePng(w, h, (x, y) =>
        (((gid * 2654435761L + x * 40503L + y * 65027L) % 1000003 % 200)
          + r * 3 + (if (x == 7) r * 4 else 0)).toInt))._2)
    }
    val gids = 0L until 40L
    // within-group: the r-perturbation (brightness + one pixel column) must
    // usually stay inside the distance-3 ball the query uses
    val withinOk = gids.count { g =>
      val hs = (0 to 2).map(fixtureHash(g, _))
      hs.combinations(2).forall { case Seq(a, b) =>
        java.lang.Long.bitCount(a ^ b) <= 3
      }
    }
    assert(withinOk >= 30, s"only $withinOk/40 groups stayed near-dup")
    // across groups: the hash-mixed base patterns must be far apart
    val h0 = gids.map(fixtureHash(_, 0))
    val crossClose = h0.combinations(2).count { case Seq(a, b) =>
      java.lang.Long.bitCount(a ^ b) <= 3
    }
    assert(crossClose <= 2, s"$crossClose cross-group pairs inside the ball")
  }

  test("augment kernels: hand-computed 3x2 vectors for hflip/rot90/crop/posSum") {
    import graft.multimodal.MediaKernel.Gray
    val k = new MediaKernel
    // | 1 2 3 |
    // | 4 5 6 |
    val g = Gray(3, 2, Array(1, 2, 3, 4, 5, 6))
    assert(k.hflip(g).pix.toSeq == Seq(3, 2, 1, 6, 5, 4))
    // clockwise: first output row = first input column bottom-up
    val r = k.rot90cw(g)
    assert((r.width, r.height) == ((2, 3)))
    assert(r.pix.toSeq == Seq(4, 1, 5, 2, 6, 3))
    assert(k.crop(g, 1, 0, 2, 2).pix.toSeq == Seq(2, 3, 5, 6))
    // posSum: sum g*(x+7y) = 1*0+2*1+3*2 + 4*7+5*8+6*9 = 130
    assert(k.posSum(g) == 130L)
    // rotation preserves mass, not position
    assert(k.lumaSum(r) == k.lumaSum(g) && k.posSum(r) != k.posSum(g))
  }

  test("q204: every distance<=3 pair shares an intact 16-bit band (exact recall)") {
    // pigeonhole sanity over adversarial bit placements: 3 flipped bits
    // can corrupt at most 3 of the 4 bands
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val a = rnd.nextLong()
      val flips = Seq.fill(rnd.nextInt(4))(rnd.nextInt(64))
      val b = flips.foldLeft(a)((v, i) => v ^ (1L << i))
      val shared = (0 until 4).exists { band =>
        ((a >>> (band * 16)) & 0xffffL) == ((b >>> (band * 16)) & 0xffffL)
      }
      assert(shared, s"no shared band for a=$a flips=$flips")
    }
  }

  test("q238 scene cuts: MAD margins separate cuts from drift by 4x either side") {
    val k = new MediaKernel
    var maxWithin = 0L
    var minCut = Long.MaxValue
    (0L until 120L).foreach { id =>
      val (w, h) = ((16 + id % 37).toInt, (16 + id % 23).toInt)
      val nf = (3 + id % 4).toInt
      val cut = (1 + id % (nf - 1)).toInt
      def pix(f: Int, x: Int, y: Int): Int = {
        val t = (((id * 7 + f + x + 2 * y) % 510) - 255).toInt.abs / 2
        if (f < cut) t else 128 + t
      }
      val grays = k.decodeMjpegFrames(k.encodeMjpeg(w, h, nf, 0.90f, pix))
        .map(fb => k.decodeImage(fb)._2)
      (1 until grays.length).foreach { f =>
        val (a, b) = (grays(f - 1).pix, grays(f).pix)
        val mad = a.indices.foldLeft(0L)((s, i) => s + (a(i) - b(i)).abs) / a.length
        if (f == cut) minCut = math.min(minCut, mad)
        else maxWithin = math.max(maxWithin, mad)
      }
    }
    // threshold 64: drift stays below a quarter of it, cuts above 1.5x
    assert(maxWithin <= 16, s"within-shot MAD too high: $maxWithin")
    assert(minCut >= 96, s"cut MAD too low: $minCut")
  }

  test("q238 two-pass scene cuts ≡ exhaustive pass, with fewer decodes (r9 task 6)") {
    import graft.multimodal.MultimodalQueries
    val k = new MediaKernel
    var exhaustiveDecodes = 0L
    var twoPassDecodes = 0L
    (0L until 200L).foreach { id =>
      val (w, h) = ((16 + id % 37).toInt, (16 + id % 23).toInt)
      val nf = (3 + id % 4).toInt
      val cut = (1 + id % (nf - 1)).toInt
      def pix(f: Int, x: Int, y: Int): Int = {
        val t = (((id * 7 + f + x + 2 * y) % 510) - 255).toInt.abs / 2
        if (f < cut) t else 128 + t
      }
      val frames = k.decodeMjpegFrames(k.encodeMjpeg(w, h, nf, 0.90f, pix))
      val (full, dFull) = MultimodalQueries.detectCuts(k, frames, exhaustive = true)
      val (two, dTwo) = MultimodalQueries.detectCuts(k, frames, exhaustive = false)
      assert(two == full, s"id=$id: two-pass $two != exhaustive $full")
      exhaustiveDecodes += dFull; twoPassDecodes += dTwo
    }
    assert(twoPassDecodes < exhaustiveDecodes,
      s"two-pass must decode fewer frames: $twoPassDecodes vs $exhaustiveDecodes")
  }

  test("q238 two-pass on a production-length clip: decode count approaches n/stride + window") {
    // The fixture's 3-6-frame clips are cut-dense (savings capped); the
    // production regime is a long clip with ONE cut — the two-pass decode
    // count must approach n/k + (k-1), not n.
    import graft.multimodal.MultimodalQueries
    val k = new MediaKernel
    val (w, h, n, cut) = (24, 18, 25, 17)
    def pix(f: Int, x: Int, y: Int): Int = {
      val t = (((7 + f + x + 2 * y) % 510) - 255).abs / 2
      if (f < cut) t else 128 + t
    }
    val frames = k.decodeMjpegFrames(k.encodeMjpeg(w, h, n, 0.90f, pix))
    val (full, dFull) = MultimodalQueries.detectCuts(k, frames, exhaustive = true)
    val (two, dTwo) = MultimodalQueries.detectCuts(k, frames, exhaustive = false)
    assert(two == full)
    assert(full.count(identity) == 1 && full(cut - 1), s"planted cut missed: $full")
    assert(dFull == n)
    // stride 2 over 25 frames: 13 anchors + the cut window's interior
    assert(dTwo <= n / MultimodalQueries.CutCoarseStride + MultimodalQueries.CutCoarseStride + 1,
      s"two-pass decoded $dTwo of $n frames")
  }
}
