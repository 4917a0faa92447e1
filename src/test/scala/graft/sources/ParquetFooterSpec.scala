package graft.sources

import graft.SparkFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class ParquetFooterSpec extends SparkFunSuite {

  private def firstParquet(dir: String): Array[Byte] = {
    val p = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString).head
    Files.readAllBytes(p)
  }

  /** parquet-mr's own footer reader — the independent implementation
    * this parser is graded against. */
  private def mrFooter(dir: String) = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val p = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString).head
    val in = HadoopInputFile.fromPath(new Path(p.toString),
      spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try r.getFooter finally r.close()
  }

  test("parse matches parquet-mr on a Spark-written flat file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqf").toString
    (1L to 1000L).map(i => (i, s"row_$i", i * 0.5))
      .toDF("id", "name", "score")
      .repartition(1).write.mode("overwrite").parquet(dir)
    val got = ParquetFooter.parse(firstParquet(dir)).get
    val want = mrFooter(dir)
    assert(got.num_rows === want.getBlocks.asScala.map(_.getRowCount).sum)
    assert(got.row_groups.length === want.getBlocks.size)
    assert(got.schema_leaves ===
      want.getFileMetaData.getSchema.getPaths.size)
    assert(got.created_by === (want.getFileMetaData.getCreatedBy != null))
    got.row_groups.zip(want.getBlocks.asScala).foreach { case (g, w) =>
      assert(g.num_rows === w.getRowCount)
      assert(g.total_byte_size === w.getTotalByteSize)
      assert(g.n_columns === w.getColumns.size)
    }
    // leaf names and physical types, in schema order
    val wantCols = want.getFileMetaData.getSchema.getColumns.asScala
    assert(got.leaves.map(_.name) ===
      wantCols.map(_.getPrimitiveType.getName).toSeq)
    // parquet-mr spells the thrift BYTE_ARRAY enum "BINARY"
    assert(got.leaves.map(_.typeName) ===
      wantCols.map(_.getPrimitiveType.getPrimitiveTypeName.name)
        .map { case "BINARY" => "BYTE_ARRAY"; case x => x }.toSeq)
  }

  test("multi-row-group files: every row group parsed in order") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqf_rg").toString
    (1L to 20000L).map(i => (i, ("x" * 64) + i))
      .toDF("id", "pad")
      .repartition(1).write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .parquet(dir)
    val got = ParquetFooter.parse(firstParquet(dir)).get
    val want = mrFooter(dir)
    assert(want.getBlocks.size > 1, "fixture must split row groups")
    assert(got.row_groups.length === want.getBlocks.size)
    assert(got.row_groups.map(_.num_rows) ===
      want.getBlocks.asScala.map(_.getRowCount).toSeq)
    assert(got.num_rows === 20000L)
  }

  test("nested schema (array column): leaf counting matches parquet-mr") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pqf_nested").toString
    Seq((1L, Seq(1.0f, 2.0f), "a"), (2L, Seq(3.0f), "b"))
      .toDF("id", "vec", "tag")
      .repartition(1).write.mode("overwrite").parquet(dir)
    val got = ParquetFooter.parse(firstParquet(dir)).get
    val want = mrFooter(dir)
    assert(got.schema_leaves === want.getFileMetaData.getSchema.getPaths.size)
    assert(got.schema_leaves === 3) // id, vec.list.element, tag
    assert(got.leaves.map(l => (l.name, l.typeName)) ===
      Seq(("id", "INT64"), ("element", "FLOAT"), ("tag", "BYTE_ARRAY")))
  }

  test("the real testdata files parse and agree with parquet-mr") {
    for (t <- Seq("documents", "embeddings", "lineitem")) {
      val dir = s"/root/testdata/sf0.001"
      val bytes = Files.readAllBytes(Paths.get(s"$dir/$t.parquet"))
      val got = ParquetFooter.parse(bytes).get
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val r = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(s"$dir/$t.parquet"), spark.sparkContext.hadoopConfiguration))
      val want = try r.getFooter finally r.close()
      assert(got.num_rows === want.getBlocks.asScala.map(_.getRowCount).sum, t)
      assert(got.row_groups.length === want.getBlocks.size, t)
      assert(got.schema_leaves ===
        want.getFileMetaData.getSchema.getPaths.size, t)
    }
  }

  test("malformed inputs -> None, never a throw") {
    assert(ParquetFooter.parse(null).isEmpty)
    assert(ParquetFooter.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(ParquetFooter.parse("PAR1nonsensePAR1".getBytes).isEmpty)
    val dir = Files.createTempDirectory("graft_pqf_trunc").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "x")
      .repartition(1).write.mode("overwrite").parquet(dir)
    val good = firstParquet(dir)
    assert(ParquetFooter.parse(good).isDefined)
    for (cut <- 0 until good.length by 13)
      ParquetFooter.parse(good.take(cut)) // totality
    // corrupt every footer byte one at a time — still total
    val n = good.length
    for (i <- math.max(0, n - 200) until n) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      ParquetFooter.parse(bad)
    }
  }
}
