package graft.ops

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** The PNG encode→decode round-trip vs the closed-form generator for
  * arbitrary doc ids — the lossless-codec invariant the
  * q_multimodal_features oracle rests on, checked without Spark.
  */
object MultimodalProperties extends Properties("ops.multimodal") {

  private val genId: Gen[Long] = Gen.chooseNum(0L, 1000000L)

  property("ImageIO round-trip recovers closed-form dims and pixel sum") =
    forAll(genId) { id =>
      val (w, h, sum) = Multimodal.decodeImage(Multimodal.pngFor(id))
      val ew = (id % 24 + 8).toInt
      val eh = (id % 16 + 8).toInt
      val expSum = (for (y <- 0 until eh; x <- 0 until ew)
        yield (id * 31 + x * 7 + y) % 256).sum
      w == ew && h == eh && sum == expSum
    }

  property("WAV round-trip recovers closed-form rate, count, amplitudes") =
    forAll(genId) { id =>
      val (rate, n, sum, peak) = Multimodal.decodeAudio(Multimodal.wavFor(id))
      val en = id % 256 + 64
      val samples = (0L until en).map(i => math.abs((id * 131 + i * 17) % 4096 - 2048))
      rate == 8000 + (id % 4) * 4000 && n == en &&
        sum == samples.sum && peak == samples.max
    }

  property("GVID parse+seek+decode recovers SAMPLED-frame closed form only") =
    forAll(genId) { id =>
      val (m, fps, sampled, w, h, sum) =
        Multimodal.decodeVideoSampled(Multimodal.videoFor(id))
      val em = (id % 6 + 4).toInt
      val ew = (id % 24 + 8).toInt
      val eh = (id % 16 + 8).toInt
      val frames = 0 until em by Multimodal.FrameStride
      val expSum = (for (i <- frames; y <- 0 until eh; x <- 0 until ew)
        yield (id * 31 + i * 13 + x * 7 + y) % 256).sum
      m == em && fps == (id % 3 + 1) * 5 && sampled == frames.size &&
        w == ew && h == eh && sum == expSum
    }

  /** Encode an explicit pixel grid as a PNG (for phash invariants). */
  private def pngOf(px: Array[Array[Int]]): Array[Byte] = {
    val h = px.length; val w = px(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y)(x) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val genGrid: Gen[Array[Array[Int]]] = for {
    w <- Gen.chooseNum(8, 32)
    h <- Gen.chooseNum(8, 24)
    rows <- Gen.listOfN(h, Gen.listOfN(w, Gen.chooseNum(0, 255)))
  } yield rows.map(_.toArray).toArray

  property("aHash is invariant under a uniform brightness shift (no wrap)") =
    forAll(genGrid, Gen.chooseNum(1, 40)) { (px, shift) =>
      // clamp so the shift cannot wrap mod 256 — aHash compares each
      // block to the global mean, so adding a constant moves both
      // sides equally and no bit may flip
      val base = px.map(_.map(v => v / 2))            // 0..127
      val shifted = base.map(_.map(_ + shift))        // ≤ 167
      Multimodal.decodePhash(pngOf(base)) ==
        Multimodal.decodePhash(pngOf(shifted))
    }

  property("aHash separates a bright-half image from its inverse") =
    forAll(Gen.chooseNum(8, 24)) { n =>
      val a = Array.tabulate(n, n)((_, x) => if (x < n / 2) 200 else 20)
      val b = Array.tabulate(n, n)((_, x) => if (x < n / 2) 20 else 200)
      val (ha, la) = Multimodal.decodePhash(pngOf(a))
      val (hb, lb) = Multimodal.decodePhash(pngOf(b))
      val hamming = java.lang.Long.bitCount(ha ^ hb) +
        java.lang.Long.bitCount(la ^ lb)
      hamming > Multimodal.PhashHammingMax
    }
}
