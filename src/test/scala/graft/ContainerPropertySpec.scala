package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Property-based round-trip invariants of the container codecs over
  * RANDOM geometries — the closed-form corpus only exercises dims
  * 8-15 × 8-12, so these drive the row-padding and chunk-alignment
  * paths (odd widths pad AVI rows to 4 bytes; odd sample counts keep
  * WAV chunks even) across the whole small-geometry space. Same
  * fixed-seed sampling driver as NamingPropertySpec (the
  * scalatest-scalacheck bridge is not in the offline cache). */
class ContainerPropertySpec extends AnyFunSuite {

  private def forAll[T](gen: Gen[T], samples: Int = 120)(f: T => Unit): Unit = {
    var seed = Seed(7L)
    var n = 0
    while (n < samples) {
      gen.apply(Gen.Parameters.default, seed).foreach { v => f(v); n += 1 }
      seed = seed.next
    }
  }

  private val geomGen: Gen[(Int, Int, Int, Long)] = for {
    w <- Gen.chooseNum(1, 37) // odd widths exercise DIB row padding
    h <- Gen.chooseNum(1, 23)
    n <- Gen.chooseNum(1, 6)
    pix <- Gen.chooseNum(0L, 0xFFFFFFL)
  } yield (w, h, n, pix)

  private def frame(w: Int, h: Int, seedPix: Long, f: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((seedPix + f * 7919 + y * 131 + x) * 2654435761L) & 0xFFFFFF).toInt)
    img
  }

  test("AVI round trip holds for arbitrary dims / frame counts / pixels") {
    forAll(geomGen) { case (w, h, n, pix) =>
      val frames = (0 until n).map(f => frame(w, h, pix, f))
      val bytes = Multimodal.encodeAvi(frames)
      val idx = Multimodal.parseAvi(bytes)
      assert(idx.width == w && idx.height == h && idx.nFrames == n,
        s"header mismatch for ($w x $h x $n)")
      for (f <- 0 until n) {
        var expected = 0L
        for (y <- 0 until h; x <- 0 until w) {
          val p = frames(f).getRGB(x, y)
          expected += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
        }
        assert(Multimodal.aviFramePixelSum(bytes, idx, f) == expected,
          s"frame $f sum mismatch for ($w x $h x $n), width padding ${(4 - w * 3 % 4) % 4}")
      }
    }
  }

  test("corrupt RIFF chunk sizes throw (quarantinable) instead of hanging the walk") {
    // sz = -8 makes pos += 8 + sz + pad stop advancing: without the
    // guard the chunk walk spins forever — a hang the Safe variants'
    // try/catch cannot contain. The guard turns it into a require throw.
    val bytes = Multimodal.encodeAvi(Seq(frame(8, 6, 42L, 0)))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, -8) // first top-level chunk's size field
    intercept[IllegalArgumentException] { Multimodal.parseAvi(bytes) }
  }

  test("MJPEG AVI round trip: header + per-frame JPEG decode across geometries") {
    // JPEG needs non-degenerate dims; sums are lossy so the pin is
    // dims-exact plus per-pixel closeness on a smooth (low-frequency)
    // raster — the honest compressed-codec contract
    val mjGen = for {
      w <- Gen.chooseNum(8, 40)
      h <- Gen.chooseNum(8, 24)
      n <- Gen.chooseNum(1, 5)
      base <- Gen.chooseNum(0, 160)
    } yield (w, h, n, base)
    forAll(mjGen, samples = 40) { case (w, h, n, base) =>
      val frames = (0 until n).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val v = base + f * 3 + (x + y) / 4 // smooth gradient, JPEG-friendly
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        img
      }
      val bytes = Multimodal.encodeAviMjpeg(frames)
      val idx = Multimodal.parseAvi(bytes)
      assert(idx.width == w && idx.height == h && idx.nFrames == n,
        s"MJPEG header mismatch for ($w x $h x $n)")
      for (f <- 0 until n) {
        val (dw, dh) = Multimodal.aviFrameJpegDims(bytes, idx, f)
        assert(dw == w && dh == h, s"decoded frame $f dims ($dw x $dh) != ($w x $h)")
      }
    }
  }

  test("GIF indexed-color round trip is LOSSLESS (exact pixels), unlike JPEG") {
    for (id <- 0L until 40L) {
      val img = Multimodal.synthIndexedImage(id)
      val bytes = Multimodal.encodeImage(img, "gif")
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(back != null && back.getWidth == img.getWidth &&
        back.getHeight == img.getHeight, s"GIF dims lost for id=$id")
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val i = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val expected = (i << 16) | (((i * 7) % 256) << 8) | ((i * 13) % 256)
        assert((back.getRGB(x, y) & 0xFFFFFF) == expected,
          s"GIF pixel ($x,$y) of id=$id decoded ${back.getRGB(x, y) & 0xFFFFFF}, wanted $expected")
      }
    }
  }

  test("animated GIF sequence round trip: frame count + exact pixels") {
    for (id <- 0L until 25L) {
      val n = (1 + id % 5).toInt
      val frames = (0 until n).map(f => Multimodal.synthIndexedFrame(id, f))
      val bytes = Multimodal.encodeGifAnimated(frames)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        assert(reader.getNumImages(true) == n, s"frame count lost for id=$id")
        for (f <- 0 until n) {
          val img = reader.read(f)
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
            val i = ((id * 31 + f * 41 + x * 7 + y * 13) % 256).toInt
            val expected = (i << 16) | (((i * 7) % 256) << 8) | ((i * 13) % 256)
            assert((img.getRGB(x, y) & 0xFFFFFF) == expected,
              s"frame $f pixel ($x,$y) of id=$id decoded ${img.getRGB(x, y) & 0xFFFFFF}, wanted $expected")
          }
        }
      } finally { reader.dispose(); iis.close() }
    }
  }

  test("WAV round trip holds for arbitrary sample counts and values") {
    val wavGen = for {
      n <- Gen.chooseNum(1, 500)
      seed <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (n, seed)
    forAll(wavGen) { case (n, seed) =>
      val samples = Array.tabulate(n)(i => ((seed + i * 0x9E3779B9L) % 65536 - 32768).toShort)
      val (rate, decoded) = Multimodal.decodeWav(Multimodal.encodeWav(samples))
      assert(rate == 8000f)
      assert(decoded.length == n, s"sample count mismatch at n=$n")
      assert(decoded.sameElements(samples), s"PCM mismatch at n=$n")
    }
  }
}
