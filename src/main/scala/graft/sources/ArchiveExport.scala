package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Distributed archive export — the write half of the archive census
 * driver rows, sharing [[WarcCodec.exportWarcShards]]'s shape: ONE
 * exchange hash-partitions rows on the shard key,
 * `sortWithinPartitions` orders (shard, id) so each task's iterator
 * is a concatenation of complete shard RUNS, and each run feeds the
 * builder member by member. A member is `doc_<id>.txt` with the
 * document text as its UTF-8 payload; the archive image is the only
 * per-shard allocation (it is the product).
 *
 * At the WARC-standard ~1 GB shard sizing this bounds task memory the
 * same way the streaming WARC writer does; the builders take
 * iterators precisely so an OutputStream-backed variant can slot in
 * without touching this exchange shape.
 */
object ArchiveExport {

  private def sharded(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    docs.select((col(idCol).cast("long") % nShards).cast("int").as("shard"),
        col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "id")
  }

  private def runs(df: DataFrame)(
      build: Iterator[(String, Array[Byte])] => Array[Byte]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[(Int, Long, String)].mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(Int, Array[Byte])] {
        def hasNext: Boolean = buf.hasNext
        def next(): (Int, Array[Byte]) = {
          val shard = buf.head._1
          val run = new Iterator[(String, Array[Byte])] {
            def hasNext: Boolean = buf.hasNext && buf.head._1 == shard
            def next(): (String, Array[Byte]) = {
              val (_, id, text) = buf.next()
              (s"doc_$id.txt", (if (text == null) "" else text).getBytes(UTF_8))
            }
          }
          (shard, build(run))
        }
      }
    }.toDF("shard", "archive")
  }

  /** documents → one tar image per shard: (shard, archive). */
  def exportTarShards(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame =
    runs(sharded(docs, idCol, textCol, nShards))(ArchiveCodec.buildTar(_))

  /** documents → one zip image per shard (STORED): (shard, archive).
    * `forceZip64` emits the 64-bit structures a >4 GiB shard would
    * (saturated EOCD + locator/record + per-entry 0x0001 extras). */
  def exportZipShards(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, forceZip64: Boolean = false): DataFrame =
    runs(sharded(docs, idCol, textCol, nShards))(
      ArchiveCodec.buildZip(_, forceZip64))
}
