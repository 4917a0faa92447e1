package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants over the kernels (SURVEY §5 layer 2).
  * Raw ScalaCheck (no scalatestplus bridge in the offline cache). */
class VectorPropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val finiteFloat: Gen[Float] = Gen.chooseNum(-1e6f, 1e6f)

  private val vecPair: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.chooseNum(1, 64)
    a <- Gen.listOfN(n, finiteFloat)
    b <- Gen.listOfN(n, finiteFloat)
  } yield (a.toArray, b.toArray)

  private def ad(a: Array[Float]): ArrayData = UnsafeArrayData.fromPrimitiveArray(a)

  test("cosine_distance == 1 - cosine_similarity (same code path)") {
    check("cosDist", Prop.forAll(vecPair) { case (a, b) =>
      val s = VectorKernels.cosineSimilarity(ad(a), ad(b))
      val d = VectorKernels.cosineDistance(ad(a), ad(b))
      if (s == null) d == null else d.doubleValue() == 1.0 - s.doubleValue()
    })
  }

  test("symmetry: all metrics are symmetric") {
    check("symmetry", Prop.forAll(vecPair) { case (a, b) =>
      def sym(f: (ArrayData, ArrayData) => java.lang.Double): Boolean = {
        val xy = f(ad(a), ad(b)); val yx = f(ad(b), ad(a))
        if (xy == null) yx == null else xy.doubleValue() == yx.doubleValue()
      }
      sym(VectorKernels.innerProduct) && sym(VectorKernels.cosineSimilarity) &&
        sym(VectorKernels.euclideanDistance) && sym(VectorKernels.manhattanDistance)
    })
  }

  test("identity: d(a,a) == 0; cos(a,a) == 1 within ulps") {
    check("identity", Prop.forAll(vecPair) { case (a, _) =>
      val cos = VectorKernels.cosineSimilarity(ad(a), ad(a))
      VectorKernels.euclideanDistance(ad(a), ad(a)).doubleValue() == 0.0 &&
        VectorKernels.manhattanDistance(ad(a), ad(a)).doubleValue() == 0.0 &&
        (cos == null || math.abs(cos.doubleValue() - 1.0) < 1e-9)
    })
  }

  test("non-negativity of distances; |cos| <= 1 + ulp slack") {
    check("bounds", Prop.forAll(vecPair) { case (a, b) =>
      val cos = VectorKernels.cosineSimilarity(ad(a), ad(b))
      VectorKernels.euclideanDistance(ad(a), ad(b)).doubleValue() >= 0.0 &&
        VectorKernels.manhattanDistance(ad(a), ad(b)).doubleValue() >= 0.0 &&
        (cos == null || math.abs(cos.doubleValue()) <= 1.0 + 1e-9)
    })
  }

  test("codec: decode(encode(v)) == v bit-for-bit, layout = 4n+1 LE + tag") {
    check("codec", Prop.forAll(Gen.listOf(finiteFloat)) { v =>
      val enc = VectorKernels.encodeFloatVector(ad(v.toArray))
      val dec = VectorKernels.decodeFloatVector(enc)
      dec.toFloatArray().toSeq == v &&
        enc.length == v.length * 4 + 1 &&
        enc.last == VectorKernels.FloatVectorTag
    })
  }

  test("decode never throws on arbitrary bytes: null or a NaN-stable round-trip") {
    check("decodeTotal", Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bs =>
      val bytes = bs.toArray
      val dec = VectorKernels.decodeFloatVector(bytes)
      dec == null || {
        // byte-fidelity modulo NaN: the JVM may collapse NaN payloads
        // when a float passes through registers, so compare values
        // NaN-aware rather than raw bytes
        val re = VectorKernels.decodeFloatVector(VectorKernels.encodeFloatVector(dec))
        val (a, b) = (dec.toFloatArray(), re.toFloatArray())
        a.length == b.length &&
          a.indices.forall(i => a(i) == b(i) || (a(i).isNaN && b(i).isNaN))
      }
    })
  }

  test("minhash signatures are deterministic and order-independent across calls") {
    val text = org.apache.spark.unsafe.types.UTF8String.fromString(
      "alpha beta gamma delta epsilon zeta eta theta")
    val s1 = TextHashKernels.minhashSignature(text, 16).toLongArray().toSeq
    val s2 = TextHashKernels.minhashSignature(text, 16).toLongArray().toSeq
    assert(s1 === s2)
    assert(s1.length === 16)
  }
}
