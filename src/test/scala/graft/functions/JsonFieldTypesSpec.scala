package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkFunSuite

/** json_field_types: pinned grammar (valid ⇔ exactly one object,
  * whitespace tolerated), all six type tags, malformed catalogue,
  * nested keys never leak, duplicate keys emit per occurrence,
  * DuckDB-parity cases, and interpreted ≡ codegen. */
class JsonFieldTypesSpec extends SparkFunSuite {

  GraftFunctions.register(spark)

  private def kernel(s: String): Option[Seq[(String, String)]] =
    Option(JsonKernels.jsonFieldTypes(
      if (s == null) null else UTF8String.fromString(s)))
      .map { a =>
        (0 until a.numElements()).map { i =>
          val r = a.getStruct(i, 2)
          (r.getUTF8String(0).toString, r.getUTF8String(1).toString)
        }
      }

  test("all six value types tagged from one line; key order preserved") {
    val line = """ {"s": "x", "n1": -1.5e3, "n2": 0, "b": true, "b2":false,
                  | "z": null, "o": {"inner": 1}, "a": [1, {"deep": 2}]} """
      .stripMargin.replace("\n", "")
    assert(kernel(line) === Some(Seq(
      "s" -> "string", "n1" -> "number", "n2" -> "number",
      "b" -> "boolean", "b2" -> "boolean", "z" -> "null",
      "o" -> "object", "a" -> "array")))
  }

  test("nested object/array keys never leak into the census") {
    assert(kernel("""{"top": {"hidden": 1, "also": [{"deeper": 2}]}}""")
      === Some(Seq("top" -> "object")))
  }

  test("duplicate keys emit one row per occurrence") {
    assert(kernel("""{"k": 1, "k": "two"}""")
      === Some(Seq("k" -> "number", "k" -> "string")))
  }

  test("empty object is valid and empty; escaped quotes stay inside strings") {
    assert(kernel("{}") === Some(Seq.empty))
    assert(kernel("""{"k": "a\"b", "m": "\\"}""")
      === Some(Seq("k" -> "string", "m" -> "string")))
  }

  test("malformed catalogue → null") {
    val bad = Seq(
      null,                         // null input
      "",                           // empty
      "   ",                        // whitespace only
      """[1, 2]""",                 // top-level array
      """"scalar"""",               // top-level string
      """{"k": 1""",                // truncated
      """{"k": 1} trailing""",      // trailing garbage
      """{"k": 1}{"j": 2}""",       // two objects
      """{k: 1}""",                 // unquoted key
      """{"k": 01}""",              // bad number grammar
      """{"k": .5}""",              // bad number grammar
      """{"k": 1.}""",              // bad number grammar
      """{"k": tru}""",             // bad literal
      """{"k": "unclosed}""",       // unclosed string
      """{"k": 1,}""",              // trailing comma
      """{"k"  1}""")               // missing colon
    bad.foreach(s => assert(kernel(s).isEmpty, s"should be malformed: $s"))
  }

  test("string escape grammar: RFC 8259 escapes only, no raw control bytes") {
    // scalac decodes \uXXXX even inside triple-quoted literals (and
    // rejects malformed ones), so JSON backslashes are built from
    // this val and never written as source-level escapes.
    val bs = "\\"
    // legal: the eight named escapes and 4-hex-digit \u (either case)
    assert(kernel(s"""{"k": "a${bs}n${bs}t${bs}b${bs}f${bs}r${bs}/${bs}${bs}${bs}" z"}""")
      === Some(Seq("k" -> "string")))
    assert(kernel(s"""{"k": "A${bs}u0041 ${bs}uBEEF ${bs}ubeef"}""")
      === Some(Seq("k" -> "string")))
    assert(kernel(s"""{"${bs}u0041key": 1}""")
      === Some(Seq(s"${bs}u0041key" -> "number"))) // raw key bytes, undecoded
    // illegal escapes and raw control characters: line is malformed
    val bad = Seq(
      s"""{"k": "${bs}q"}""",           // unknown escape
      s"""{"k": "${bs}uZZZZ"}""",       // non-hex \u payload
      s"""{"k": "${bs}u12x4"}""",       // non-hex mid-payload
      s"""{"k": "${bs}u12"}""",         // truncated \u (in-line)
      s"""{"k": "${bs}u123""",          // truncated \u at end of input
      s"""{"k": "a$bs""",               // escape then EOF
      "{\"k\": \"a\nb\"}",             // raw newline inside string
      "{\"k\": \"a\tb\"}",             // raw tab inside string
      "{\"k\": \"a\u0000b\"}",         // raw NUL inside string
      "{\"k\u0001\": 1}")               // control byte inside a KEY
    bad.foreach(s => assert(kernel(s).isEmpty, s"should be malformed: $s"))
    // multi-byte UTF-8 is NOT control-checked (continuation bytes >= 0x80)
    assert(kernel("{\"k\": \"h\u00e9llo \ud83d\udc4d\"}")
      === Some(Seq("k" -> "string")))
  }

  test("\\u surrogates must pair (RFC 8259 \u00a78.2, DuckDB/yyjson parity)") {
    val bs = "\\"
    // legal: escaped high+low pair (either hex case)
    assert(kernel(s"""{"k": "${bs}ud800${bs}udc00"}""")
      === Some(Seq("k" -> "string")))
    assert(kernel(s"""{"k": "x${bs}uD83D${bs}uDC4Dy"}""")
      === Some(Seq("k" -> "string")))
    // illegal: lone high, lone low, high+high, high + non-escape,
    // high + named escape, lone surrogate inside a KEY \u2014 each
    // verified json_valid = false in DuckDB (yyjson)
    val bad = Seq(
      s"""{"k": "${bs}ud800"}""",
      s"""{"k": "${bs}udc00"}""",
      s"""{"k": "${bs}ud800${bs}ud800"}""",
      s"""{"k": "a${bs}ud800z"}""",
      s"""{"k": "${bs}ud800${bs}n"}""",
      s"""{"k": "${bs}ud800${bs}u0041"}""",
      s"""{"${bs}ud800": 1}""")
    bad.foreach(s => assert(kernel(s).isEmpty, s"should be malformed: $s"))
  }

  test("whitespace around and inside structure is tolerated") {
    assert(kernel("\t {\n\"k\" :\r 1 \n} ") === Some(Seq("k" -> "number")))
  }

  test("multi-byte string content does not confuse the byte scanner") {
    assert(kernel("""{"k": "héllo 👍 \" quote", "j": 1}""")
      === Some(Seq("k" -> "string", "j" -> "number")))
  }

  test("kernel agrees with DuckDB-style classification on number forms") {
    for (num <- Seq("0", "-0", "12", "-3.25", "1e9", "2E-4", "0.5e+2"))
      assert(kernel(s"""{"k": $num}""") === Some(Seq("k" -> "number")), num)
  }

  test("codegen path through a DataFrame matches interpreted eval") {
    val rows = Seq(
      """{"a": 1, "b": "x"}""", """{"a": [1], "c": null}""",
      "{}", "not json", """{"a":""", null, """ {"z": {"n": {}}} """)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row(_))),
      StructType(Seq(StructField("l", StringType))))
    val viaDf = df.select(GraftFunctions.jsonFieldTypes(col("l")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getSeq[Row](0))
    rows.zip(viaDf).foreach { case (s, got) =>
      val interp = JsonFieldTypesExpr(Literal(
        if (s == null) null else UTF8String.fromString(s), StringType))
        .eval(InternalRow.empty)
      if (got == null) assert(interp == null, s"line=$s")
      else {
        val ia = interp.asInstanceOf[ArrayData]
        val pairs = (0 until ia.numElements()).map { i =>
          val r = ia.getStruct(i, 2)
          Row(r.getUTF8String(0).toString, r.getUTF8String(1).toString)
        }
        assert(got === pairs, s"line=$s")
      }
    }
  }

  test("property: kernel is TOTAL — arbitrary strings never throw, valid ⇒ well-formed rows") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // three generators: pure noise, JSON-ish fragment soup (the
    // adversarial case for a skip-parser), and mutated valid objects
    val noise = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('{', '}', '[', ']', '"', ':', ',', '\\',
        '.', '-', ' ', '\n', '\t', 'é', '\ud83d'))).map(_.mkString)
    val fragments = Gen.listOf(Gen.oneOf(
      "{", "}", "[", "]", "\"k\"", ":", ",", "null", "true", "1e5", "-0.5",
      "\"a\\\"b\"", " ", "{\"x\":", "[1,", "\\u00", "\"")).map(_.mkString)
    val mutated = for {
      keys <- Gen.listOf(Gen.identifier.map(_.take(5)))
      cut <- Gen.chooseNum(0, 5)
    } yield {
      val full = keys.zipWithIndex
        .map { case (k, i) => s""""$k": $i""" }.mkString("{", ", ", "}")
      full.dropRight(cut)
    }
    val gen = Gen.oneOf(noise, fragments, mutated)
    val prop = Prop.forAll(gen) { s =>
      val out = JsonKernels.jsonFieldTypes(UTF8String.fromString(s)) // must not throw
      out == null || (0 until out.numElements()).forall { i =>
        val r = out.getStruct(i, 2)
        r.getUTF8String(0) != null && Set("object", "array", "string",
          "number", "boolean", "null")(r.getUTF8String(1).toString)
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("plan stays in whole-stage codegen (no CodegenFallback)") {
    val df = spark.range(4).select(
      GraftFunctions.jsonFieldTypes(
        concat(lit("{\"k\": "), col("id"), lit("}"))).as("f"))
    // the "*(n)" stage prefix marks WholeStageCodegen in the compact
    // plan string; a CodegenFallback expression would strip it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
    assert(df.collect().forall(!_.isNullAt(0)))
  }
}
