package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class DataLayoutSpec extends SparkFunSuite {

  test("zorderKey: hand-computed Morton interleave") {
    import spark.implicits._
    // u=0b0011, t=0b0101 at 4 bits; bit b of col i → position 2b+i:
    // u sets positions 0,2; t sets positions 1,5 → 0b100111 = 39
    val df = Seq((3L, 5L)).toDF("u", "t")
      .select(DataLayout.zorderKey(Seq(col("u"), col("t")), bits = 4).as("z"))
    assert(df.head.getLong(0) === 39L)
  }

  test("zorderKey rejects impossible widths") {
    intercept[IllegalArgumentException] {
      DataLayout.zorderKey(Seq(lit(1L), lit(2L)), bits = 40)
    }
  }

  test("z-ordered layout bounds per-file min/max coverage on BOTH dimensions") {
    val ev = graft.streaming.EventPipeline.normalizeTs(
      spark.read.parquet(s"$Sf0001/events.parquet"))
      .select(col("event_id"),
        least(floor(col("value")), lit(255.0)).cast("long").as("v"),
        floor((hour(col("ts")) * 60 + minute(col("ts"))) / 6).cast("long").as("t"))

    // avg per-file fraction of a dimension's range covered by the
    // file's min/max stats — exactly what parquet row-group skipping
    // prunes on: a range predicate on dim d skips files whose stats
    // exclude it, so expected files touched ∝ coverage(d)
    def coverage(dir: String, dim: String, span: Double): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      val fracs = files.map { f =>
        val r = spark.read.parquet(f).agg(min(dim), max(dim)).head
        (r.getLong(1) - r.getLong(0) + 1) / span
      }
      fracs.sum / fracs.length
    }

    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    DataLayout.writeZOrdered(ev, zDir,
      DataLayout.zorderKey(Seq(col("v"), col("t")), bits = 8), numFiles = 16)
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin").toString
    // the single-column alternative: sorted by v only — v is tight,
    // t spans its full range in every file
    ev.repartitionByRange(16, col("v")).sortWithinPartitions("v")
      .write.mode("overwrite").parquet(linDir)

    // single-column sort: the unsorted dimension is useless for skipping
    assert(coverage(linDir, "t", 240.0) > 0.9)
    // z-order: BOTH dimensions are partially clustered — a range
    // predicate on either one prunes most files
    val zV = coverage(zDir, "v", 256.0)
    val zT = coverage(zDir, "t", 240.0)
    assert(zV < 0.6, s"v coverage $zV")
    assert(zT < 0.6, s"t coverage $zT")
    // and the z-ordered write preserved the data
    assert(spark.read.parquet(zDir).count() === ev.count())
  }
}
