package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class ExifParserSpec extends AnyFunSuite {

  test("parseExif: both byte orders round-trip orientation, make, datetime") {
    for (be <- Seq(false, true); orient <- Seq(1, 3, 6, 8)) {
      val jpeg = ExifParser.buildJpegExif(
        orient, "CAM42", "2021:07:04 09:15:30", bigEndian = be)
      val m = ExifParser.parseExif(jpeg).get
      assert(m.big_endian === be)
      assert(m.orientation === orient)
      assert(m.make === "CAM42")
      assert(m.dt_original === "2021:07:04 09:15:30")
    }
  }

  test("parseExif: the JFIF APP0 ahead of APP1 is skipped, not parsed") {
    val jpeg = ExifParser.buildJpegExif(
      2, "X", "2020:01:01 00:00:00", bigEndian = false)
    // sanity: APP0 really is first
    assert((jpeg(2) & 0xff) === 0xff && (jpeg(3) & 0xff) === 0xe0)
    assert(ExifParser.parseExif(jpeg).isDefined)
  }

  test("parseExif: in-field (<=4 byte) and offset-stored ASCII both parse") {
    // "AB" + NUL = 3 bytes → rides IN the value field; "CAM42" + NUL
    // = 6 bytes → offset-stored. Both taken through both endians.
    for (be <- Seq(false, true)) {
      val short = ExifParser.buildJpegExif(
        1, "AB", "2020:01:01 00:00:00", bigEndian = be)
      assert(ExifParser.parseExif(short).get.make === "AB")
      val long = ExifParser.buildJpegExif(
        1, "LONGMAKER", "2020:01:01 00:00:00", bigEndian = be)
      assert(ExifParser.parseExif(long).get.make === "LONGMAKER")
    }
  }

  test("parseExif: malformed inputs -> None, never a throw") {
    assert(ExifParser.parseExif(null).isEmpty)
    assert(ExifParser.parseExif(Array[Byte](0, 1, 2)).isEmpty)
    // JPEG with no APP1 at all
    val noExif = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)
    assert(ExifParser.parseExif(noExif).isEmpty)
    // truncated APP1 and corrupted TIFF magic
    val good = ExifParser.buildJpegExif(
      1, "CAM", "2020:01:01 00:00:00", bigEndian = false)
    assert(ExifParser.parseExif(good.take(good.length / 2)).isEmpty)
    val badMagic = good.clone()
    badMagic(12) = 'Q' // inside "Exif\0\0" / TIFF BOM region
    ExifParser.parseExif(badMagic) // totality only
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 300) {
      val buf = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt(256).toByte)
      ExifParser.parseExif(buf) // totality: no throw
    }
    for (cut <- 0 until good.length by 7)
      ExifParser.parseExif(good.take(cut)) // every truncation is safe
  }
}
