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
}
