package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM BMP codec — the REAL media decode behind the
  * multimodal family's physical queries (`multimodal_bmp_stats`,
  * `multimodal_bmp_resize`), replacing the documented stub for one
  * actual format with zero new dependencies (<150 LoC).
  *
  * Supported surface: uncompressed (BI_RGB) 24- and 32-bit-per-pixel
  * BITMAPINFOHEADER files — what every baseline encoder emits —
  * including 4-byte row padding, bottom-up AND top-down (negative
  * height) row order. Anything else fails loud, never garbage pixels.
  *
  * Decode correctness is what the DuckDB oracle exercises end-to-end:
  * the driver queries synthesize real BMP bytes per document, decode
  * them back, and emit position-WEIGHTED integer pixel sums — a parser
  * that mishandles padding, BGR order, or bottom-up rows cannot
  * reproduce them.
  */
object Bmp {

  /** Decoded image: packed 0xRRGGBB pixels, row-major top-down. */
  final case class Image(width: Int, height: Int, rgb: Array[Int]) {
    def apply(x: Int, y: Int): Int = rgb(y * width + x)
  }

  /** Encode as 24-bit BI_RGB (bottom-up, padded rows) — the baseline
    * writer, used to synthesize real on-disk bytes in tests/queries.
    */
  def encode(img: Image): Array[Byte] = {
    val Image(w, h, rgb) = img
    require(w > 0 && h > 0 && rgb.length == w * h,
      s"bad image: ${w}x$h with ${rgb.length} pixels")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val b = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) { // bottom-up, BGR
      var x = 0
      while (x < w) {
        val p = rgb(y * w + x)
        b.put((p & 0xff).toByte)
          .put(((p >> 8) & 0xff).toByte)
          .put(((p >> 16) & 0xff).toByte)
        x += 1
      }
      var i = 0
      while (i < pad) { b.put(0.toByte); i += 1 }
      y -= 1
    }
    b.array()
  }

  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54, s"truncated BMP (${bytes.length} bytes)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.get(0) == 'B'.toByte && b.get(1) == 'M'.toByte,
      "not a BMP (bad magic)")
    val dataOff = b.getInt(10)
    val hdrSize = b.getInt(14)
    require(hdrSize >= 40, "unsupported BMP header (pre-v3)")
    // pixel data must start past the headers — a corrupt offset into
    // (or before) the header would decode header bytes as pixels
    require(dataOff >= 14 + hdrSize,
      s"BMP pixel offset $dataOff lies inside the header")
    val w = b.getInt(18)
    val rawH = b.getInt(22)
    val topDown = rawH < 0
    val h = math.abs(rawH)
    val bpp = b.getShort(28).toInt
    require(b.getInt(30) == 0, "compressed BMP unsupported")
    require(bpp == 24 || bpp == 32, s"unsupported bit depth $bpp")
    require(w > 0 && h > 0 && w.toLong * h <= (1 << 26),
      s"unreasonable dimensions ${w}x$h")
    val bytesPerPx = bpp / 8
    val rowBytes = w * bytesPerPx
    val stride = (rowBytes + 3) / 4 * 4
    require(dataOff.toLong + stride.toLong * h <= bytes.length,
      "BMP pixel data truncated")
    val rgb = new Array[Int](w * h)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      val base = dataOff + srcRow * stride
      var x = 0
      while (x < w) {
        val o = base + x * bytesPerPx
        rgb(row * w + x) =
          ((bytes(o + 2) & 0xff) << 16) |
          ((bytes(o + 1) & 0xff) << 8) |
          (bytes(o) & 0xff)
        x += 1
      }
      row += 1
    }
    Image(w, h, rgb)
  }

  /** Aspect-preserving nearest-neighbor resize in pure integer
    * arithmetic: out dims = floor(dim · maxSide / max(w, h)) (min 1),
    * source pixel of out (x, y) = in (x·w / outW, y·h / outH) — the
    * exact formulas the DuckDB oracle recomputes. No-op when the image
    * already fits.
    */
  def resizeNearest(img: Image, maxSide: Int): Image = {
    require(maxSide > 0)
    val m = math.max(img.width, img.height)
    if (m <= maxSide) return img
    val ow = math.max(1, img.width * maxSide / m)
    val oh = math.max(1, img.height * maxSide / m)
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = y * img.height / oh
      var x = 0
      while (x < ow) {
        out(y * ow + x) = img(x * img.width / ow, sy)
        x += 1
      }
      y += 1
    }
    Image(ow, oh, out)
  }
}
