package graft.operators

import graft.SparkFunSuite
import graft.functions.ZOrderKernels
import org.apache.spark.sql.functions._

class ZOrderLayoutSpec extends SparkFunSuite {

  import spark.implicits._

  test("kernel: hand-interleaved bits") {
    // x = 0b101 (bits 0,2), y = 0b011 (bits 0,1):
    // z bits: x0→0, y0→1, x1→2(0), y1→3, x2→4, y2→5(0) = 0b011011? —
    // positions: x gives 1 at 0 and 16 (2·2), y gives 2 (2·0+1) and 8
    assert(ZOrderKernels.zOrderKey(5L, 3L, 3) === (1L | 2L | 8L | 16L))
    assert(ZOrderKernels.zOrderKey(0L, 0L, 10) === 0L)
    // single-column monotonicity on the even lattice
    assert(ZOrderKernels.zOrderKey(7L, 0L, 3) === (1L | 4L | 16L))
    assert(ZOrderKernels.zOrderKey(0L, 7L, 3) === (2L | 8L | 32L))
    // bits mask: high bits beyond `bits` are ignored
    assert(ZOrderKernels.zOrderKey(1024L + 5L, 3L, 3) ===
      ZOrderKernels.zOrderKey(5L, 3L, 3))
  }

  test("interpreted ≡ codegen for z_order_key") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((5L, 3L), (0L, 0L), (1023L, 1L), (511L, 512L))
      .toDF("x", "y")
    val viaSql = df.selectExpr("z_order_key(x, y, 10) AS z")
      .collect().map(_.getLong(0)).toSeq
    val direct = Seq((5L, 3L), (0L, 0L), (1023L, 1L), (511L, 512L))
      .map { case (x, y) => ZOrderKernels.zOrderKey(x, y, 10) }
    assert(viaSql === direct)
  }

  test("z-order layout prunes a 2-D box strictly better than an x-sort") {
    // uniform 2-D grid: 64×64 points, one row each
    val pts = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong * 64 + y, x.toLong, y.toLong)).toDF("id", "x", "y")
    val files = 16
    val zDir = java.nio.file.Files
      .createTempDirectory("graft_zorder_spec").toString
    ZOrderLayout.write(pts, "x", "y", bits = 6, zDir, files)
    val xDir = java.nio.file.Files
      .createTempDirectory("graft_xsort_spec").toString
    pts.repartitionByRange(files, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)
    // a y-selective box: all x, y in [0, 7] — an x-sorted layout can
    // never prune it (every file spans all y); z-order can
    val (zTotal, zTouched) = ZOrderLayout.filePruningStats(
      spark, zDir, "x", "y", 0L, 63L, 0L, 7L)
    val (xTotal, xTouched) = ZOrderLayout.filePruningStats(
      spark, xDir, "x", "y", 0L, 63L, 0L, 7L)
    assert(xTouched === xTotal) // the x-sort reads everything
    assert(zTouched < zTotal, s"z-order touched $zTouched of $zTotal")
    assert(zTouched.toDouble / zTotal < 0.8,
      s"z-order should prune materially: $zTouched/$zTotal")
    // and a SQUARE box is tight under z-order too
    val (_, zBox) = ZOrderLayout.filePruningStats(
      spark, zDir, "x", "y", 0L, 15L, 0L, 15L)
    assert(zBox < zTotal / 2, s"square box touched $zBox of $zTotal")
    // layout never changes results: the box rows round-trip exactly
    val want = pts.filter(col("y") <= 7).count()
    val got = spark.read.parquet(zDir).filter(col("y") <= 7).count()
    assert(got === want)
  }

  test("tokenEntropy: hand-computed uniform and skewed corpora") {
    // uniform 4 tokens → H = 2 bits exactly; V = 4 → max = 2 bits
    val uni = Seq("a b", "c d").toDF("text")
    val r = TextAnalysis.tokenEntropy(uni, "text").collect().head
    assert((r.getLong(0), r.getLong(1)) === (4L, 4L))
    assert(r.getLong(2) === 2000000L)
    assert(r.getLong(3) === 2000000L)
    // all-same token → H = 0
    val same = Seq("x x x x").toDF("text")
    val r2 = TextAnalysis.tokenEntropy(same, "text").collect().head
    assert(r2.getLong(2) === 0L)
    assert(r2.getLong(1) === 1L)
  }
}
