package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** AVIF census: round trips, the meta FULL-box offset, property
  * counting, dimension boundaries, wrong-brand rejection, totality. */
class AvifParserSpec extends AnyFunSuite {
  import AvifParser._

  test("round trip: brand, dims, property count with and without pixi") {
    assert(parseAvif(buildAvif(1920, 1080, withPixi = false)) ===
      Some(AvifMeta("avif", 1920L, 1080L, 1)))
    assert(parseAvif(buildAvif(1, 1, withPixi = true)) ===
      Some(AvifMeta("avif", 1L, 1L, 2)))
  }

  test("32-bit dimension boundary") {
    val m = parseAvif(buildAvif(0xffffffffL, 2L, withPixi = false)).get
    assert(m.width === 0xffffffffL && m.height === 2L)
  }

  test("meta full-box offset: a plain-container walk would desync") {
    // the builder writes version/flags inside meta; corrupting them to
    // look like a box size would break a naive walker — ours skips them
    val ok = buildAvif(100, 50, withPixi = true)
    assert(parseAvif(ok).isDefined)
  }

  test("wrong brand rejected; heif brand with same structure → None") {
    val ok = buildAvif(10, 10, withPixi = false)
    val heic = ok.clone()
    // ftyp header is 8 bytes; the brand is the body's first 4 bytes
    heic(8) = 'h'; heic(9) = 'e'; heic(10) = 'i'; heic(11) = 'c'
    assert(parseAvif(heic) === None)
  }

  test("totality: garbage, truncation, undersized boxes") {
    val ok = buildAvif(640, 480, withPixi = true)
    assert(parseAvif(null) === None)
    assert(parseAvif(Array.fill[Byte](15)(3)) === None)
    for (n <- Seq(16, 24, ok.length - 1))
      assert(parseAvif(java.util.Arrays.copyOf(ok, n)) === None)
    val rnd = new scala.util.Random(13)
    for (n <- Seq(0, 16, 80, 600))
      parseAvif(Array.fill[Byte](n)(rnd.nextInt().toByte)) // must not throw
  }
}
