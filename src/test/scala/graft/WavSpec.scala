package graft

import graft.ext.Wav
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM WAV codec ([[Wav]]): roundtrip, RIFF chunk walking over
  * foreign chunks (with odd-size padding), and loud refusals.
  */
class WavSpec extends AnyFunSuite {

  private def tone(n: Int): Array[Short] =
    Array.tabulate(n)(i => ((i * 101) % 4001 - 2000).toShort)

  test("roundtrip: header + little-endian samples exact") {
    for (n <- Seq(1, 16, 31, 1000)) {
      val in = Wav.Audio(16000, tone(n))
      val bytes = Wav.encode(in)
      assert(bytes.length === 44 + n * 2)
      val out = Wav.decode(bytes)
      assert(out.sampleRate === 16000)
      assert(out.samples.toSeq === in.samples.toSeq)
    }
  }

  test("chunk walk: foreign odd-sized chunk between fmt and data") {
    val base = Wav.encode(Wav.Audio(8000, tone(10)))
    // splice a 7-byte LIST chunk (odd → 1 pad byte) before `data`
    val b = java.nio.ByteBuffer
      .allocate(base.length + 8 + 7 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(base, 0, 36) // RIFF..WAVE + fmt chunk
    b.put("LIST".getBytes("US-ASCII")).putInt(7)
      .put(Array.fill[Byte](7)(42)).put(0.toByte)
    b.put(base, 36, base.length - 36) // data chunk
    val spliced = b.array()
    // fix the RIFF size field
    java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val out = Wav.decode(spliced)
    assert(out.sampleRate === 8000)
    assert(out.samples.toSeq === tone(10).toSeq)
  }

  test("refusals: magic, compression, stereo, bit depth, truncation") {
    val good = Wav.encode(Wav.Audio(8000, tone(10)))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Wav.decode(badMagic))
    val comp = good.clone(); comp(20) = 3 // IEEE float
    intercept[IllegalArgumentException](Wav.decode(comp))
    val stereo = good.clone(); stereo(22) = 2
    intercept[IllegalArgumentException](Wav.decode(stereo))
    val bits8 = good.clone(); bits8(34) = 8
    intercept[IllegalArgumentException](Wav.decode(bits8))
    intercept[IllegalArgumentException](Wav.decode(good.take(30)))
    // data chunk whose declared size overruns the buffer
    val overrun = good.clone()
    java.nio.ByteBuffer.wrap(overrun)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 100000)
    intercept[IllegalArgumentException](Wav.decode(overrun))
    // a declared size near Int.MaxValue must hit the overrun guard,
    // not wrap negative past it into a multi-GB allocation
    val wrap = good.clone()
    java.nio.ByteBuffer.wrap(wrap)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, 0x7FFFFFF0)
    intercept[IllegalArgumentException](Wav.decode(wrap))
  }
}
