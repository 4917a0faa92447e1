package graft.multimodal

import graft.multimodal.Multimodal.RasterImage

/**
 * Pure-Scala BMP decoder — the public Windows bitmap format
 * (BITMAPFILEHEADER + BITMAPINFOHEADER), the uncompressed workhorse a
 * crawl still surfaces constantly:
 *
 *  - `BM` file header with pixel-data offset;
 *  - BITMAPINFOHEADER (or any longer V4/V5 header — extra fields are
 *    skipped via the header-size field): width, height (negative =
 *    top-down), bits-per-pixel 8 (palette) or 24/32 (BGR/BGRx),
 *    BI_RGB (uncompressed) only;
 *  - palette (BGRx quads), 4-byte-aligned rows, default bottom-up row
 *    order;
 *  - luminance with the same integer BT.601 weights as every other
 *    decoder here (gray palettes are exact → lossless round trips);
 *  - None on malformed/truncated/compressed input — never throws.
 *
 * Validated against the JDK's independent ImageIO BMP codec in
 * BmpDecoderSpec (bit-identical: the format is uncompressed).
 */
object BmpDecoder {

  private val MaxPixels = 64 * 1024 * 1024

  private object Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw Malformed

  def decodeBmp(payload: Array[Byte]): Option[RasterImage] = {
    if (payload == null || payload.length < 54) return None
    try Some(run(payload))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def run(b: Array[Byte]): RasterImage = {
    def u8(p: Int): Int = { if (p < 0 || p >= b.length) fail(); b(p) & 0xff }
    def u16(p: Int): Int = u8(p) | (u8(p + 1) << 8)
    def u32(p: Int): Long =
      (u8(p) | (u8(p + 1) << 8) | (u8(p + 2) << 16)).toLong | (u8(p + 3).toLong << 24)
    def i32(p: Int): Int = u32(p).toInt

    if (u8(0) != 'B' || u8(1) != 'M') fail()
    val dataOffset = u32(10)
    val headerSize = u32(14)
    if (headerSize < 40) fail() // BITMAPCOREHEADER not supported
    val width = i32(18)
    val rawHeight = i32(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    if (width <= 0 || height <= 0 || width.toLong * height > MaxPixels) fail()
    if (u16(26) != 1) fail() // planes
    val bpp = u16(28)
    if (u32(30) != 0) fail() // BI_RGB (uncompressed) only
    if (bpp != 8 && bpp != 24 && bpp != 32) fail()

    val palette: Array[Int] =
      if (bpp == 8) {
        val declared = u32(46)
        val n = if (declared == 0) 256 else {
          if (declared > 256) fail()
          declared.toInt
        }
        val base = 14 + headerSize.toInt
        Array.tabulate(n) { i =>
          val p = base + i * 4 // BGRx quads
          (u8(p + 2) << 16) | (u8(p + 1) << 8) | u8(p)
        }
      } else null

    val bytesPerPixel = bpp / 8
    val rowSize = ((width.toLong * bpp + 31) / 32 * 4).toInt
    val start = dataOffset
    if (start < 0 || start + rowSize.toLong * height > b.length) fail()

    def luma(r: Int, g: Int, bl: Int): Int = (r * 299 + g * 587 + bl * 114) / 1000

    val gray = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val destRow = if (topDown) row else height - 1 - row
      val rowStart = start.toInt + row * rowSize
      var x = 0
      while (x < width) {
        val p = rowStart + x * bytesPerPixel
        gray(destRow * width + x) =
          if (bpp == 8) {
            val idx = u8(p)
            if (idx >= palette.length) fail()
            val rgb = palette(idx)
            luma((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
          } else {
            luma(u8(p + 2), u8(p + 1), u8(p)) // BGR(x) byte order
          }
        x += 1
      }
      row += 1
    }
    RasterImage(width, height, gray)
  }
}
