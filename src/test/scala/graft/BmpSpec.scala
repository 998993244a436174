package graft

import graft.ext.Bmp
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM BMP codec ([[Bmp]]): encode/decode roundtrip including row
  * padding, 32-bpp and top-down variants, loud refusals, and the
  * integer nearest-neighbor resize.
  */
class BmpSpec extends AnyFunSuite {

  private def img(w: Int, h: Int)(f: (Int, Int) => Int) =
    Bmp.Image(w, h, Array.tabulate(w * h)(i => f(i % w, i / w)))

  private def px(x: Int, y: Int): Int = {
    val r = (x * 7 + y * 13) % 256
    val g = (x * 3 + y * 5 + 85) % 256
    val b = (x + y + 170) % 256
    (r << 16) | (g << 8) | b
  }

  test("roundtrip: pad-free and padded row widths, every pixel exact") {
    for (w <- 1 to 8; h <- Seq(1, 3, 5)) {
      val in = img(w, h)(px)
      val out = Bmp.decode(Bmp.encode(in))
      assert(out.width === w && out.height === h)
      assert(out.rgb.toSeq === in.rgb.toSeq, s"mismatch at ${w}x$h")
    }
  }

  test("container arithmetic: padded rows land on the documented size") {
    val bytes = Bmp.encode(img(5, 3)(px)) // 15-byte rows pad to 16
    assert(bytes.length === 54 + 16 * 3)
  }

  test("decode: 32-bpp and top-down (negative height) layouts") {
    val (w, h) = (3, 2)
    val in = img(w, h)(px)
    // hand-build: BITMAPINFOHEADER, 32 bpp (no padding), TOP-DOWN rows
    val b = java.nio.ByteBuffer.allocate(54 + w * h * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + w * h * 4)
      .putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(-h).putShort(1).putShort(32)
      .putInt(0).putInt(w * h * 4).putInt(0).putInt(0).putInt(0).putInt(0)
    for (y <- 0 until h; x <- 0 until w) {
      val p = in(x, y)
      b.put((p & 0xff).toByte).put(((p >> 8) & 0xff).toByte)
        .put(((p >> 16) & 0xff).toByte).put(0xff.toByte)
    }
    val out = Bmp.decode(b.array())
    assert(out.width === w && out.height === h)
    assert(out.rgb.toSeq === in.rgb.toSeq)
  }

  test("refusals: bad magic, compression, truncation fail loud") {
    val good = Bmp.encode(img(4, 3)(px))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Bmp.decode(badMagic))
    val compressed = good.clone(); compressed(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Bmp.decode(compressed))
    intercept[IllegalArgumentException](Bmp.decode(good.take(40)))
    intercept[IllegalArgumentException](Bmp.decode(good.take(60)))
    // pixel offset pointing INTO the header must refuse, not decode
    // header bytes as pixels (and a negative offset likewise)
    for (off <- Seq(2, -4)) {
      val inHdr = good.clone()
      java.nio.ByteBuffer.wrap(inHdr)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(10, off)
      intercept[IllegalArgumentException](Bmp.decode(inHdr))
    }
  }

  test("resizeNearest: integer NN formulas; no-op when already fits") {
    val in = img(6, 4)(px)
    val out = Bmp.resizeNearest(in, 3)
    assert(out.width === 3 && out.height === 2) // floor(dim*3/6)
    for (y <- 0 until out.height; x <- 0 until out.width)
      assert(out(x, y) === in(x * 6 / 3, y * 4 / 2),
        s"wrong source pixel at ($x,$y)")
    assert(Bmp.resizeNearest(in, 6) eq in)
    // extreme aspect never collapses to zero
    val thin = img(8, 1)(px)
    val t2 = Bmp.resizeNearest(thin, 2)
    assert(t2.width === 2 && t2.height === 1)
  }
}
