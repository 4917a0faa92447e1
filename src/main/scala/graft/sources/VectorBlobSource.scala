package graft.sources

import graft.functions.VectorKernels
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.io.{DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.util.OptionalLong
import scala.jdk.CollectionConverters._

/**
 * DataSource V2 connector for the reference's NATIVE vector wire
 * format: files of `[id: int64 BE][nbytes: int32 BE][payload bytes]`
 * records where each payload is the Knn binary string — little-endian
 * float32 values + the 0x01 tag (reference:
 * /root/reference/app.py:157-162). A store dumped in the reference's
 * own representation reads directly as a Spark table:
 *
 * {{{
 *   spark.read.format("graft-vectors").load(dir)
 *     // schema: vec_id BIGINT, embedding ARRAY<FLOAT>
 * }}}
 *
 * Scale shape: one `InputPartition` per file — 100 TB of blobs across
 * many files parallelizes exactly like Parquet file splits — and the
 * scan implements COLUMN PRUNING (`SupportsPushDownRequiredColumns`):
 * an id-only query never decodes a single float. Malformed payloads
 * decode to NULL (the engine-wide codec contract), never throw.
 */
class VectorBlobSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-vectors"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VectorBlobSource.Schema

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new VectorBlobTable(properties.get("path"))
}

object VectorBlobSource {
  val Schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Record stream in the wire format — shared by the local and the
    * distributed writer. */
  private def writeRecords(
      out: DataOutputStream, rows: Iterator[(Long, Array[Float])]): Unit =
    rows.foreach { case (id, vec) =>
      val payload = VectorKernels.encodeFloatVector(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vec))
      out.writeLong(id)
      out.writeInt(payload.length)
      out.write(payload)
    }

  /** Writer for the blob format — one local file per call. */
  def writeFile(path: String, rows: Iterator[(Long, Array[Float])]): Unit = {
    val out = new DataOutputStream(new FileOutputStream(path))
    try writeRecords(out, rows) finally out.close()
  }

  /**
   * Distributed "dump the store" step: every partition of `df`
   * (`vec_id BIGINT, embedding ARRAY<FLOAT>`) writes its own
   * `part-NNNNN.vecblob` through the Hadoop filesystem of `dir` — local
   * disk under `file:`, HDFS/object stores on a cluster. No row ever
   * moves to the driver; the dump scales with the number of partitions
   * exactly like a parquet write. A retried task rewrites (overwrites)
   * only its own deterministic per-partition file, so the dump is
   * idempotent; concurrent dumps into one directory are the caller's
   * responsibility (this is an offline fixture/export step, not a
   * committed sink — a transactional variant would go through
   * FileCommitProtocol like the built-in file sinks).
   */
  def writeDistributed(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    dirPath.getFileSystem(conf.value).mkdirs(dirPath)
    df.select("vec_id", "embedding").foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val file = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.vecblob")
          val out = new DataOutputStream(
            file.getFileSystem(conf.value).create(file, true))
          try writeRecords(out, rows.map(r =>
            r.getLong(0) -> r.getSeq[Float](1).toArray))
          finally out.close()
        }
    }
  }
}

class VectorBlobTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-vectors `$path`"
  override def schema(): StructType = VectorBlobSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VectorBlobScanBuilder(path)
}

class VectorBlobScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = VectorBlobSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new VectorBlobScan(path, required)
}

class VectorBlobScan(path: String, required: StructType)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"VectorBlobScan(path=$path, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files =
      if (dir.isDirectory) dir.listFiles().filter(_.getName.endsWith(".vecblob"))
      else Array(dir)
    files.sortBy(_.getName).map(f =>
      VectorBlobPartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VectorBlobReaderFactory(required)

  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = planInputPartitions().map {
      case VectorBlobPartition(p) => new java.io.File(p).length()
    }.sum
    override def sizeInBytes(): OptionalLong = OptionalLong.of(bytes)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

case class VectorBlobPartition(file: String) extends InputPartition

class VectorBlobReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new VectorBlobReader(
      partition.asInstanceOf[VectorBlobPartition].file, required)
}

/** Streams one blob file; decodes the payload ONLY if the embedding
  * column survived pruning (an id-only scan just skips the bytes). */
class VectorBlobReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val in = new DataInputStream(new FileInputStream(file))
  private val wantsId = required.fieldNames.contains("vec_id")
  private val wantsVec = required.fieldNames.contains("embedding")
  private var current: InternalRow = _

  override def next(): Boolean = {
    try {
      val id = in.readLong()
      val n = in.readInt()
      if (n < 0) throw new java.io.IOException(s"negative record length $n in $file")
      val vec = if (wantsVec) {
        val payload = new Array[Byte](n)
        in.readFully(payload)
        VectorKernels.decodeFloatVector(payload) // null on malformed
      } else {
        in.skipBytes(n)
        null
      }
      val values = required.fieldNames.map {
        case "vec_id"    => id: Any
        case "embedding" => vec: Any
      }
      current = InternalRow.fromSeq(values.toIndexedSeq)
      true
    } catch {
      case _: EOFException => false
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
