package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkFunSuite

/** Unicode canonicalization kernels: composed/decomposed convergence,
  * NFC singletons, accent stripping, identity fast path, idempotence
  * fuzz, and null safety through the registered SQL functions. */
class UnicodeExpressionsSpec extends SparkFunSuite {
  import spark.implicits._

  private def nfc(s: String): String =
    UnicodeKernels.nfcNormalize(UTF8String.fromString(s)).toString
  private def strip(s: String): String =
    UnicodeKernels.stripAccents(UTF8String.fromString(s)).toString

  test("NFC: composed and decomposed forms converge; singletons map") {
    assert(nfc("caf\u00e9") === "caf\u00e9")          // composed unchanged
    assert(nfc("cafe\u0301") === "caf\u00e9")          // decomposed composes
    assert(nfc("n\u0303o") === "\u00f1o")
    assert(nfc("\u212b") === "\u00c5")                 // ANGSTROM SIGN singleton
    assert(nfc("\u2126") === "\u03a9")                 // OHM SIGN singleton
    assert(nfc("plain ascii 123") === "plain ascii 123")
  }

  test("strip_accents: marks removed from composed AND decomposed input") {
    assert(strip("caf\u00e9 cafe\u0301") === "cafe cafe")
    assert(strip("\u00c5 \u212b \u00f1 n\u0303") === "A A n n")
    assert(strip("plain") === "plain")
    // \u00f8 is not an accented composition (no canonical decomposition)
    assert(strip("\u00f8") === "\u00f8")
  }

  test("identity fast path returns the SAME UTF8String reference") {
    val s = UTF8String.fromString("already normalized ascii")
    assert(UnicodeKernels.nfcNormalize(s) eq s)
    assert(UnicodeKernels.stripAccents(s) eq s)
  }

  test("idempotence and totality fuzz across the BMP and astral planes") {
    val rnd = new scala.util.Random(13)
    for (_ <- 0 until 200) {
      val sb = new StringBuilder
      for (_ <- 0 until rnd.nextInt(40)) {
        rnd.nextInt(4) match {
          case 0 => sb.append((0x20 + rnd.nextInt(0x60)).toChar)   // ascii
          case 1 => sb.append((0xc0 + rnd.nextInt(0x250)).toChar)  // latin ext
          case 2 => sb.append((0x300 + rnd.nextInt(0x70)).toChar)  // combining
          case 3 => sb.appendAll(Character.toChars(0x1f600 + rnd.nextInt(0x50)))
        }
      }
      val s = sb.toString
      assert(nfc(nfc(s)) === nfc(s))
      assert(strip(strip(s)) === strip(s))
    }
  }

  test("registered SQL functions: codegen path and null propagation") {
    GraftFunctions.register(spark)
    val df = Seq(Some("cafe\u0301"), Some("x"), None).toDF("t")
      .select(expr("nfc_normalize(t)").as("n"), expr("strip_accents(t)").as("p"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("caf\u00e9", "cafe"), ("x", "x"), (null, null)))
  }
}
