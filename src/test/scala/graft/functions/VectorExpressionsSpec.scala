package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Expression behavior through the DataFrame API (codegen path) compared
  * against the kernels (interpreted ground truth — nullSafeEval calls the
  * same statics, so this also pins eval ≡ codegen). */
class VectorExpressionsSpec extends SparkFunSuite {

  private lazy val _ = GraftFunctions.register(spark)

  private def df(rows: Seq[(Seq[Float], Seq[Float])]) = {
    GraftFunctions.register(spark)
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = false)),
      StructField("b", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2))), schema)
  }

  test("codegen path matches kernel for deterministic random vectors") {
    val rng = new scala.util.Random(42)
    val rows = Seq.fill(64)((Seq.fill(16)(rng.nextFloat() * 2 - 1),
      Seq.fill(16)(rng.nextFloat() * 2 - 1)))
    val got = df(rows).select(
      GraftFunctions.knnCosineSimilarity(col("a"), col("b")),
      GraftFunctions.knnInnerProductSimilarity(col("a"), col("b")),
      GraftFunctions.knnCosineDistance(col("a"), col("b")),
      GraftFunctions.knnEuclideanDistance(col("a"), col("b")),
      GraftFunctions.knnManhattanDistance(col("a"), col("b"))).collect()
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    rows.zip(got).foreach { case ((a, b), r) =>
      val (ad, bd) = (UnsafeArrayData.fromPrimitiveArray(a.toArray),
        UnsafeArrayData.fromPrimitiveArray(b.toArray))
      assert(r.getDouble(0) === VectorKernels.cosineSimilarity(ad, bd).doubleValue())
      assert(r.getDouble(1) === VectorKernels.innerProduct(ad, bd).doubleValue())
      assert(r.getDouble(2) === VectorKernels.cosineDistance(ad, bd).doubleValue())
      assert(r.getDouble(3) === VectorKernels.euclideanDistance(ad, bd).doubleValue())
      assert(r.getDouble(4) === VectorKernels.manhattanDistance(ad, bd).doubleValue())
    }
  }

  test("dimension mismatch and zero-norm produce NULL through the plan") {
    val rows = Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f)), // dim mismatch
      (Seq(0f, 0f), Seq(1f, 2f)))     // zero norm
    val got = df(rows).select(
      GraftFunctions.knnCosineSimilarity(col("a"), col("b"))).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("binary arguments: same result as array arguments (mixed too)") {
    val rows = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)))
    val base = df(rows)
    val viaArrays = base.select(
      GraftFunctions.knnCosineSimilarity(col("a"), col("b"))).head.getDouble(0)
    val viaBinary = base.select(GraftFunctions.knnCosineSimilarity(
      GraftFunctions.toBinaryVector(col("a")),
      GraftFunctions.toBinaryVector(col("b")))).head.getDouble(0)
    val mixed = base.select(GraftFunctions.knnCosineSimilarity(
      GraftFunctions.toBinaryVector(col("a")), col("b"))).head.getDouble(0)
    assert(viaArrays === viaBinary)
    assert(viaArrays === mixed)
  }

  test("array<double> arguments: exact promotion semantics, mixed sides too") {
    // double vectors (PCA projections, centroid tables) score without a
    // lossy float cast: a float32 side promotes exactly, so
    // metric(float_vec, double_vec) == metric(promoted_float, double).
    val a = Seq(0.25f, -1.5f, 3.0f)          // exact in both widths
    val bD = Seq(0.1, 0.2, 0.3)              // NOT float-representable
    val schema = StructType(Seq(
      StructField("af", ArrayType(FloatType, containsNull = false)),
      StructField("ad", ArrayType(DoubleType, containsNull = false)),
      StructField("bd", ArrayType(DoubleType, containsNull = false))))
    val d = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(a, a.map(_.toDouble), bD))), schema)
    val got = d.select(
      GraftFunctions.knnInnerProductSimilarity(col("ad"), col("bd")),
      GraftFunctions.knnInnerProductSimilarity(col("af"), col("bd")),
      GraftFunctions.knnEuclideanDistance(col("ad"), col("bd")),
      GraftFunctions.knnCosineSimilarity(col("ad"), col("bd")),
      GraftFunctions.knnManhattanDistance(col("af"), col("bd"))).head
    val expDot = a.map(_.toDouble).zip(bD).map { case (x, y) => x * y }.sum
    assert(got.getDouble(0) === expDot)
    assert(got.getDouble(1) === expDot) // mixed float×double = promoted float
    val expEuc = math.sqrt(a.map(_.toDouble).zip(bD).map { case (x, y) => (x - y) * (x - y) }.sum)
    assert(got.getDouble(2) === expEuc)
    val expCos = expDot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
      math.sqrt(bD.map(y => y * y).sum))
    assert(got.getDouble(3) === expCos)
    assert(got.getDouble(4) === a.map(_.toDouble).zip(bD).map { case (x, y) => math.abs(x - y) }.sum)
    // double side preserves what float32 cannot: 0.1 as a double differs
    // from 0.1f promoted, so the double-side result must differ from the
    // all-float result.
    val floatB = d.select(GraftFunctions.knnInnerProductSimilarity(
      col("af"), col("bd").cast(ArrayType(FloatType)))).head.getDouble(0)
    assert(floatB !== expDot)
  }

  test("SQL registration: functions callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT knn_inner_product_similarity(array(1.0F, 2.0F), array(3.0F, 4.0F))")
      .head.getDouble(0)
    assert(r === 11.0)
  }

  test("codec round-trip through the plan is exact") {
    val rows = Seq((Seq(0.25f, -1.5f, 3e-7f), Seq(0f)))
    val got = df(rows).select(GraftFunctions.fromBinaryVector(
      GraftFunctions.toBinaryVector(col("a")))).head.getSeq[Float](0)
    assert(got === Seq(0.25f, -1.5f, 3e-7f))
  }

  test("simhash64: identical texts collide, different texts differ") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val d = Seq("a b c d e", "a b c d e", "x y z w v").toDF("t")
    val hashes = d.select(GraftFunctions.simhash64(col("t"))).collect().map(_.getLong(0))
    assert(hashes(0) === hashes(1))
    assert(hashes(0) !== hashes(2))
  }

  test("minhash signature: length, determinism, and similarity behavior") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val near = "the quick brown fox jumps over the lazy dog today"
    val nearVariant = "the quick brown fox jumps over the lazy dog tonight"
    val far = "completely different words in this one entirely unrelated text"
    val d = Seq(near, near, nearVariant, far).toDF("t")
    val sigs = d.select(GraftFunctions.minhashSignature(col("t"), 32))
      .collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length === 32))
    assert(sigs(0) === sigs(1)) // deterministic
    def overlap(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(overlap(sigs(0), sigs(2)) > overlap(sigs(0), sigs(3)))
  }

  test("winnow fingerprints: subset of gram hashes, density cut, match guarantee") {
    GraftFunctions.register(spark)
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val text = "a b c d e f g h i j k l m n o p q r s t"
    def fps(t: String, n: Int, w: Int): Seq[Long] =
      graft.functions.TextHashKernels
        .winnowFingerprints(UTF8String.fromString(t), n, w).toLongArray().toSeq
    // all gram hashes = winnow at w = 1
    val allGrams = fps(text, 3, 1)
    assert(allGrams.length === 18) // 20 tokens → 18 3-grams, distinct here
    val selected = fps(text, 3, 4)
    assert(selected.toSet.subsetOf(allGrams.toSet))
    // expected density 2/(w+1): selection must actually thin the set
    assert(selected.length < allGrams.length && selected.nonEmpty)
    // guarantee: a shared run of >= n + w - 1 = 6 tokens yields a
    // shared fingerprint between unrelated documents
    val shared = "q w e r t y"
    val d1 = fps(s"one two three $shared four five six", 3, 4).toSet
    val d2 = fps(s"alpha beta $shared gamma delta", 3, 4).toSet
    assert(d1.intersect(d2).nonEmpty)
    // determinism via the expression path (eval ≡ codegen ≡ kernel)
    val viaExpr = Seq(text).toDF("t")
      .select(GraftFunctions.winnowFingerprints(col("t"), 3, 4))
      .head().getSeq[Long](0)
    assert(viaExpr === selected)
    // short docs: < n tokens → empty, < w grams → one window
    assert(fps("a b", 3, 4).isEmpty)
    assert(fps("a b c d", 3, 4).length === 1) // 2 grams, one window min
  }
}
