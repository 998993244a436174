package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM WAV (RIFF/WAVE, PCM16) codec — the audio sibling
  * of [[Bmp]]: the multimodal family's real decode for one audio
  * format, zero dependencies. Encode emits the canonical 44-byte
  * header + little-endian int16 samples; decode WALKS the RIFF chunk
  * list (tolerating extra chunks like `LIST`/`fact`, as real encoders
  * emit) and refuses anything but uncompressed PCM16. The driver query
  * oracles integer sample aggregates recomputed from a closed-form
  * generator, so endianness and chunk walking sit inside the checked
  * path.
  */
object Wav {

  final case class Audio(sampleRate: Int, samples: Array[Short])

  def encode(a: Audio): Array[Byte] = {
    require(a.sampleRate > 0 && a.samples.nonEmpty, "empty audio")
    val dataSize = a.samples.length * 2
    val b = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(a.sampleRate)
      .putInt(a.sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    a.samples.foreach(b.putShort)
    b.array()
  }

  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44, s"truncated WAV (${bytes.length} bytes)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    require(tag(0) == "RIFF" && tag(8) == "WAVE",
      "not a WAV (bad RIFF/WAVE magic)")
    // walk the chunk list: fmt and data may be separated by foreign
    // chunks; chunk sizes pad to even offsets per RIFF
    var off = 12
    var rate = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(off)
      val size = b.getInt(off + 4)
      // long arithmetic: a crafted size near Int.MaxValue must hit
      // this require, not wrap negative past it into a giant alloc
      require(size >= 0 && off.toLong + 8L + size <= bytes.length,
        s"WAV chunk '$id' overruns the file")
      if (id == "fmt ") {
        require(size >= 16, "fmt chunk too small")
        require(b.getShort(off + 8) == 1, "compressed WAV unsupported")
        require(b.getShort(off + 10) == 1, "only mono supported")
        rate = b.getInt(off + 12)
        require(b.getShort(off + 22) == 16,
          s"only PCM16 supported, got ${b.getShort(off + 22)} bits")
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = size
      }
      off += 8 + size + (size & 1)
    }
    require(rate > 0, "WAV has no fmt chunk")
    require(dataOff >= 0, "WAV has no data chunk")
    val n = dataLen / 2
    val samples = new Array[Short](n)
    var i = 0
    while (i < n) { samples(i) = b.getShort(dataOff + i * 2); i += 1 }
    Audio(rate, samples)
  }
}
