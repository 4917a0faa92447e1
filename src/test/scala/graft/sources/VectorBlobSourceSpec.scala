package graft.sources

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class VectorBlobSourceSpec extends SparkFunSuite {

  private def writeStore(rows: Seq[(Long, Array[Float])], files: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_blobs").toString
    rows.grouped(math.max(1, rows.size / files)).zipWithIndex.foreach {
      case (chunk, i) =>
        VectorBlobSource.writeFile(f"$dir/part-$i%05d.vecblob", chunk.iterator)
    }
    dir
  }

  private val rows: Seq[(Long, Array[Float])] =
    (0L until 100L).map(i => i -> Array.tabulate(8)(t => (i + t).toFloat))

  test("round trip: write blob files, read back as a table") {
    val dir = writeStore(rows, files = 4)
    val df = spark.read.format("graft-vectors").load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("vec_id", "embedding"))
    val got = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(got.size === 100)
    rows.foreach { case (id, vec) => assert(got(id).toSeq === vec.toSeq) }
  }

  test("writeDistributed: executor-side dump, one file per partition, lossless") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_blobs_dist").toString
    val df = rows.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "embedding").repartition(4, col("vec_id"))
    VectorBlobSource.writeDistributed(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".vecblob"))
    assert(files.length === 4) // one per non-empty partition
    val got = spark.read.format("graft-vectors").load(dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    assert(got.size === 100)
    rows.foreach { case (id, vec) => assert(got(id).toSeq === vec.toSeq) }
    // idempotent on rewrite (the task-retry story): same files, same rows
    VectorBlobSource.writeDistributed(df, dir)
    assert(spark.read.format("graft-vectors").load(dir).count() === 100)
  }

  test("one input partition per file — file-level parallelism") {
    val dir = writeStore(rows, files = 4)
    val df = spark.read.format("graft-vectors").load(dir)
    assert(df.rdd.getNumPartitions === 4)
  }

  test("column pruning reaches the scan: id-only query skips payload decode") {
    val dir = writeStore(rows, files = 2)
    val df = spark.read.format("graft-vectors").load(dir).select("vec_id")
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(scans.exists(_.contains("columns=vec_id")), scans.mkString("\n"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (0L until 100L))
  }

  test("malformed payload decodes to NULL embedding, not an exception") {
    val dir = java.nio.file.Files.createTempDirectory("graft_blobs_bad").toString
    val out = new java.io.DataOutputStream(
      new java.io.FileOutputStream(s"$dir/bad.vecblob"))
    out.writeLong(7L)
    out.writeInt(3)
    out.write(Array[Byte](1, 2, 3)) // not a valid wire payload
    out.close()
    val r = spark.read.format("graft-vectors").load(dir).collect()
    assert(r.length === 1)
    assert(r.head.getLong(0) === 7L)
    assert(r.head.isNullAt(1))
  }

  test("the wire format in the files IS the reference codec byte layout") {
    val dir = writeStore(Seq(1L -> Array(1.5f, -2.0f)), files = 1)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir).resolve("part-00000.vecblob"))
    // 8 (id BE) + 4 (len BE) + 2*4 + 1 (payload) = 21
    assert(bytes.length === 21)
    assert(bytes(11) === 9) // record length 9 = 2 floats + tag
    assert(bytes.last === graft.functions.VectorKernels.FloatVectorTag)
  }
}
