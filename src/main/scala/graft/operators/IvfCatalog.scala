package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Generation catalog for the IVF partitioned store — the operational
 * piece that closes the [[IvfIndex.compact]] lifecycle: compaction
 * writes a FRESH generation directory (so readers of the old path stay
 * consistent), and this catalog is the swap-and-vacuum that then (a)
 * atomically repoints readers at the new generation and (b) reclaims
 * superseded generations' storage.
 *
 * Layout (all under one `catalogDir`):
 * {{{
 *   catalogDir/
 *     CURRENT          ← single small file: the active generation name
 *     gen-0/           ← partitioned parquet store (a generation)
 *     gen-1/
 * }}}
 *
 * The pointer is ONE tiny file holding a generation NAME (relative, so
 * the catalog can be relocated/replicated as a unit). The swap is a
 * single create-overwrite of that file — the cheapest primitive every
 * filesystem offers; a production deployment would wrap the same
 * pointer flip in its metastore transaction, and nothing else here
 * changes. Readers that resolved the OLD generation keep reading its
 * directory unaffected (generations are immutable once written);
 * [[vacuum]] is what finally deletes them, and it never touches the
 * generation CURRENT names — so the unsafe window is operator-chosen:
 * swap when the new generation is fully written, vacuum when no
 * long-running reader can still hold the old path (retention policy,
 * SCALING.md).
 *
 * 100 TB shape: every method here does driver-side file-metadata work
 * only (one pointer file, one directory listing); the data itself
 * moves exclusively through [[IvfIndex.compact]]'s distributed write.
 */
object IvfCatalog {

  private val Pointer = "CURRENT"
  private val GenPrefix = "gen-"

  private def fileSystem(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Generation names present in the catalog (sorted by number). */
  def generations(spark: SparkSession, catalogDir: String): Seq[String] = {
    val fs = fileSystem(spark, catalogDir)
    val root = new Path(catalogDir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(GenPrefix) &&
        st.getPath.getName.drop(GenPrefix.length).forall(_.isDigit))
      .map(_.getPath.getName)
      .sortBy(_.drop(GenPrefix.length).toLong)
  }

  /** Next unused generation name — pass `catalogDir/<name>` to
    * [[IvfIndex.compact]] (or [[IvfIndex.writePartitioned]] for gen 0). */
  def nextGenerationName(spark: SparkSession, catalogDir: String): String = {
    val next = generations(spark, catalogDir)
      .map(_.drop(GenPrefix.length).toLong)
      .maxOption.fold(0L)(_ + 1L)
    s"$GenPrefix$next"
  }

  /** The active generation name, if a swap has ever happened. */
  def current(spark: SparkSession, catalogDir: String): Option[String] = {
    val fs = fileSystem(spark, catalogDir)
    val p = new Path(catalogDir, Pointer)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8").trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }

  /**
   * Point readers at `genName` (must exist under the catalog). One
   * create-overwrite of the pointer file; returns the superseded
   * generation name. Old-generation directories are untouched — a
   * reader holding the old path is unaffected until [[vacuum]].
   */
  def swapGeneration(
      spark: SparkSession, catalogDir: String, genName: String): Option[String] = {
    val fs = fileSystem(spark, catalogDir)
    require(fs.exists(new Path(new Path(catalogDir), genName)),
      s"cannot swap to missing generation '$genName' under $catalogDir")
    val prev = current(spark, catalogDir)
    val out = fs.create(new Path(catalogDir, Pointer), true)
    try out.write(genName.getBytes("UTF-8")) finally out.close()
    prev
  }

  /**
   * Delete every generation directory EXCEPT the current one.
   * Refuses to run before any swap (no pointer ⇒ nothing is provably
   * superseded). Returns the deleted generation names.
   */
  def vacuum(spark: SparkSession, catalogDir: String): Seq[String] = {
    val cur = current(spark, catalogDir).getOrElse(
      throw new IllegalStateException(
        s"vacuum requires a CURRENT pointer under $catalogDir — swap first"))
    val fs = fileSystem(spark, catalogDir)
    val doomed = generations(spark, catalogDir).filterNot(_ == cur)
    doomed.foreach(g => fs.delete(new Path(new Path(catalogDir), g), true))
    doomed
  }

  /** Read the active generation's partitioned store. */
  def readCurrent(spark: SparkSession, catalogDir: String): DataFrame = {
    val cur = current(spark, catalogDir).getOrElse(
      throw new IllegalStateException(
        s"no CURRENT pointer under $catalogDir — swap a generation in first"))
    spark.read.parquet(s"$catalogDir/$cur")
  }
}
