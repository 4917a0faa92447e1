package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Pure kernel math — no Spark session. Hand-computed expectations. */
class VectorKernelsSpec extends AnyFunSuite {

  private def arr(xs: Float*): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(xs.toArray)

  test("inner product: hand-computed") {
    // (1,2,3)·(4,5,6) = 4+10+18 = 32
    assert(VectorKernels.innerProduct(arr(1, 2, 3), arr(4, 5, 6)) === 32.0)
  }

  test("cosine similarity: identical vectors = 1, orthogonal = 0") {
    assert(math.abs(VectorKernels.cosineSimilarity(arr(3, 4), arr(3, 4)) - 1.0) < 1e-12)
    assert(math.abs(VectorKernels.cosineSimilarity(arr(1, 0), arr(0, 1))) < 1e-12)
    // (1,2)·(2,1)=4; |a|=|b|=√5 → 4/5
    assert(math.abs(VectorKernels.cosineSimilarity(arr(1, 2), arr(2, 1)) - 0.8) < 1e-12)
  }

  test("cosine distance = 1 - cosine similarity") {
    assert(math.abs(VectorKernels.cosineDistance(arr(1, 2), arr(2, 1)) - 0.2) < 1e-12)
  }

  test("euclidean: 3-4-5 triangle") {
    assert(VectorKernels.euclideanDistance(arr(0, 0), arr(3, 4)) === 5.0)
  }

  test("manhattan: hand-computed") {
    assert(VectorKernels.manhattanDistance(arr(1, -2), arr(-2, 3)) === 8.0)
  }

  test("dimension mismatch -> null for all metrics") {
    val a = arr(1, 2, 3)
    val b = arr(1, 2)
    assert(VectorKernels.innerProduct(a, b) == null)
    assert(VectorKernels.cosineSimilarity(a, b) == null)
    assert(VectorKernels.cosineDistance(a, b) == null)
    assert(VectorKernels.euclideanDistance(a, b) == null)
    assert(VectorKernels.manhattanDistance(a, b) == null)
  }

  test("zero-norm cosine -> null (engine-defined, SURVEY §7)") {
    assert(VectorKernels.cosineSimilarity(arr(0, 0), arr(1, 2)) == null)
    assert(VectorKernels.cosineSimilarity(arr(1, 2), arr(0, 0)) == null)
    assert(VectorKernels.cosineDistance(arr(0, 0), arr(1, 2)) == null)
  }

  test("negative components and asymmetric-magnitude vectors") {
    // (-1,1)·(1,-1) = -2, norms √2·√2=2 → cos = -1
    assert(math.abs(VectorKernels.cosineSimilarity(arr(-1, 1), arr(1, -1)) + 1.0) < 1e-12)
  }

  // ------------------------------------------------------------- codec

  test("encode: exact byte layout of the reference wire format") {
    // struct.pack('<ff', 1.0, -2.5) + b'\x01' (reference app.py:160-161):
    // 1.0f = 0x3F800000 LE -> 00 00 80 3F; -2.5f = 0xC0200000 LE -> 00 00 20 C0
    val expected = Array[Byte](0x00, 0x00, 0x80.toByte, 0x3F,
      0x00, 0x00, 0x20, 0xC0.toByte, 0x01)
    val got = VectorKernels.encodeFloatVector(arr(1.0f, -2.5f))
    assert(got.toSeq === expected.toSeq)
  }

  test("decode: round-trips encode exactly") {
    val v = Array(0.1f, -0.2f, 3.5e-4f, Float.MinPositiveValue, 1e30f)
    val encoded = VectorKernels.encodeFloatVector(UnsafeArrayData.fromPrimitiveArray(v))
    val decoded = VectorKernels.decodeFloatVector(encoded)
    assert(decoded.toFloatArray().toSeq === v.toSeq)
  }

  test("decode: malformed payloads -> null") {
    assert(VectorKernels.decodeFloatVector(null) == null)
    assert(VectorKernels.decodeFloatVector(Array.empty[Byte]) == null)
    // wrong tag
    assert(VectorKernels.decodeFloatVector(Array[Byte](0, 0, 0, 0, 0x02)) == null)
    // body not a multiple of 4
    assert(VectorKernels.decodeFloatVector(Array[Byte](0, 0, 0, 0x01)) == null)
  }

  test("empty vector encodes to just the tag byte and round-trips") {
    val enc = VectorKernels.encodeFloatVector(arr())
    assert(enc.toSeq === Seq(0x01.toByte))
    assert(VectorKernels.decodeFloatVector(enc).numElements() === 0)
  }
}
