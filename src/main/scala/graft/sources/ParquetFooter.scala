package graft.sources

/**
 * Parquet footer census — a from-scratch reader for the file format
 * this whole engine runs on: the footer is a Thrift COMPACT-protocol
 * `FileMetaData` struct (parquet-format's parquet.thrift; thrift
 * compact spec: varint/zigzag scalars, nibble-packed field headers,
 * size-prefixed containers) sitting before the trailing
 * `<footer_len:4 LE> "PAR1"` magic.
 *
 * Why it matters at 100 TB: EVERY scan-planning decision — row-group
 * pruning, split sizing, column projection — is made from this
 * structure alone. A census pass over a petabyte lake reads a few KB
 * per file (footer only, payload never touched — the same contract as
 * the media censuses) and yields the row-group/byte-size/column map
 * that drives compaction planning (small-file and skinny-row-group
 * detection feeding [[graft.operators.DataLayout.compactionPlan]]).
 *
 * The walk extracts version, num_rows, schema leaf count, created_by
 * presence and one record per row group (rows, total byte size,
 * column-chunk count), SKIPPING every other field generically — so
 * footers written by any compliant writer (different optional fields,
 * future additions) parse. TOTAL: malformed/truncated input → None,
 * never a throw. Cross-validated in the spec against parquet-mr's own
 * footer reader over files Spark wrote, including multi-row-group and
 * nested-schema (array) layouts.
 */
object ParquetFooter {

  /** Per-column-chunk statistics from ColumnMetaData: the dotted
    * path, physical type, value count (INCLUDING nulls), and the
    * OPTIONAL Statistics fields — `min_value`/`max_value` raw bytes
    * (plain-encoded LE for fixed-width types) and `null_count`. The
    * deprecated min/max (fields 1/2) are ignored. */
  final case class ColumnStats(
      path: String, typeCode: Int, numValues: Long,
      nullCount: Option[Long], minValue: Option[Array[Byte]],
      maxValue: Option[Array[Byte]])

  final case class RowGroupMeta(
      idx: Int, num_rows: Long, total_byte_size: Long, n_columns: Int,
      columns: Seq[ColumnStats] = Nil)
  /** One leaf (physical) column: its SchemaElement name and the
    * parquet-format Type enum (0 BOOLEAN, 1 INT32, 2 INT64, 3 INT96,
    * 4 FLOAT, 5 DOUBLE, 6 BYTE_ARRAY, 7 FIXED_LEN_BYTE_ARRAY). */
  final case class LeafField(name: String, typeCode: Int,
      convertedType: Int = -1) {
    def typeName: String = typeCode match {
      case 0 => "BOOLEAN"; case 1 => "INT32"; case 2 => "INT64"
      case 3 => "INT96"; case 4 => "FLOAT"; case 5 => "DOUBLE"
      case 6 => "BYTE_ARRAY"; case 7 => "FIXED_LEN_BYTE_ARRAY"
      case _ => s"UNKNOWN($typeCode)"
    }
  }
  final case class FooterMeta(
      version: Int, num_rows: Long, schema_leaves: Int,
      created_by: Boolean, row_groups: Seq[RowGroupMeta],
      leaves: Seq[LeafField])

  // thrift compact type codes
  private val TBoolTrue = 1
  private val TBoolFalse = 2
  private val TByte = 3
  private val TI16 = 4
  private val TI32 = 5
  private val TI64 = 6
  private val TDouble = 7
  private val TBinary = 8
  private val TList = 9
  private val TSet = 10
  private val TMap = 11
  private val TStruct = 12

  private final class Reader(b: Array[Byte], var p: Int, val end: Int) {
    def u8(): Int = {
      if (p >= end) throw new IllegalStateException("eof")
      val v = b(p) & 0xff; p += 1; v
    }
    def varint(): Long = {
      var shift = 0; var v = 0L; var more = true
      while (more) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        more = (x & 0x80) != 0
        shift += 7
        if (shift > 70) throw new IllegalStateException("varint overlong")
      }
      v
    }
    def zigzag(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1) }
    def skip(n: Long): Unit = {
      if (n < 0 || p + n > end) throw new IllegalStateException("skip oob")
      p += n.toInt
    }
    def str(len: Int): String = {
      if (len < 0 || p + len > end) throw new IllegalStateException("str oob")
      val s = new String(b, p, len, "UTF-8"); p += len; s
    }
    def bin(len: Int): Array[Byte] = {
      if (len < 0 || p + len > end) throw new IllegalStateException("bin oob")
      val out = java.util.Arrays.copyOfRange(b, p, p + len); p += len; out
    }
  }

  /** (size, elemType) from a compact list/set header. */
  private def listHeader(r: Reader): (Int, Int) = {
    val h = r.u8()
    val nib = (h >> 4) & 0xf
    val size = if (nib == 15) r.varint().toInt else nib
    if (size < 0) throw new IllegalStateException("bad list size")
    (size, h & 0xf)
  }

  /** Skip one value of compact type `tpe` (bools carry their value in
    * the FIELD header, so nothing follows them). */
  private def skipValue(r: Reader, tpe: Int): Unit = tpe match {
    case TBoolTrue | TBoolFalse => ()
    case TByte => r.skip(1)
    case TI16 | TI32 | TI64 => { r.varint(); () }
    case TDouble => r.skip(8)
    case TBinary => r.skip(r.varint())
    case TList | TSet =>
      val (n, et) = listHeader(r)
      var i = 0; while (i < n) { skipValue(r, et); i += 1 }
    case TMap =>
      val n = r.varint().toInt
      if (n > 0) {
        val kv = r.u8()
        var i = 0
        while (i < n) { skipValue(r, (kv >> 4) & 0xf); skipValue(r, kv & 0xf); i += 1 }
      }
    case TStruct => skipStruct(r)
    case _ => throw new IllegalStateException(s"bad compact type $tpe")
  }

  private def skipStruct(r: Reader): Unit =
    walkStruct(r)((_, _, _) => false)

  /** Iterate a struct's fields; `f(id, tpe, reader)` returns true when
    * it consumed the value itself, false to have it skipped. */
  private def walkStruct(r: Reader)(f: (Int, Int, Reader) => Boolean): Unit = {
    var last = 0
    var done = false
    while (!done) {
      val h = r.u8()
      if (h == 0) done = true
      else {
        val tpe = h & 0xf
        val delta = (h >> 4) & 0xf
        val id = if (delta == 0) r.zigzag().toInt else last + delta
        last = id
        if (!f(id, tpe, r)) skipValue(r, tpe)
      }
    }
  }

  /** One SchemaElement: Some(leaf) iff it has no num_children. The
    * converted_type (field 6; TIMESTAMP_MILLIS=9, TIMESTAMP_MICROS=10,
    * DATE=6, ...) rides along so stats consumers can verify UNITS
    * instead of assuming them. */
  private def schemaElementLeaf(r: Reader): Option[LeafField] = {
    var children = 0L
    var typeCode = -1
    var converted = -1
    var name = ""
    walkStruct(r) { (id, tpe, rr) =>
      (id, tpe) match {
        case (1, TI32) => typeCode = rr.zigzag().toInt; true
        case (4, TBinary) =>
          name = rr.str(rr.varint().toInt)
          true
        case (5, TI32) => children = rr.zigzag(); true
        case (6, TI32) => converted = rr.zigzag().toInt; true
        case _ => false
      }
    }
    if (children == 0) Some(LeafField(name, typeCode, converted)) else None
  }

  /** Statistics struct (field 12 of ColumnMetaData): null_count (3),
    * max_value (5), min_value (6). */
  private def parseStatistics(r: Reader): (Option[Long],
      Option[Array[Byte]], Option[Array[Byte]]) = {
    var nullCount: Option[Long] = None
    var minV: Option[Array[Byte]] = None
    var maxV: Option[Array[Byte]] = None
    walkStruct(r) { (id, tpe, rr) =>
      (id, tpe) match {
        case (3, TI64) => nullCount = Some(rr.zigzag()); true
        case (5, TBinary) => maxV = Some(rr.bin(rr.varint().toInt)); true
        case (6, TBinary) => minV = Some(rr.bin(rr.varint().toInt)); true
        case _ => false
      }
    }
    (nullCount, minV, maxV)
  }

  /** ColumnMetaData: type (1), path_in_schema (3, joined with '.'),
    * num_values (5), statistics (12). */
  private def parseColumnMetaData(r: Reader): Option[ColumnStats] = {
    var typeCode = -1
    val path = Seq.newBuilder[String]
    var numValues = -1L
    var stats: (Option[Long], Option[Array[Byte]], Option[Array[Byte]]) =
      (None, None, None)
    walkStruct(r) { (id, tpe, rr) =>
      (id, tpe) match {
        case (1, TI32) => typeCode = rr.zigzag().toInt; true
        case (3, TList) =>
          val (n, et) = listHeader(rr)
          var i = 0
          while (i < n) {
            if (et == TBinary) path += rr.str(rr.varint().toInt)
            else skipValue(rr, et)
            i += 1
          }
          true
        case (5, TI64) => numValues = rr.zigzag(); true
        case (12, TStruct) => stats = parseStatistics(rr); true
        case _ => false
      }
    }
    val p = path.result()
    if (typeCode >= 0 && p.nonEmpty)
      Some(ColumnStats(p.mkString("."), typeCode, numValues,
        stats._1, stats._2, stats._3))
    else None
  }

  /** ColumnChunk: meta_data (field 3). */
  private def parseColumnChunk(r: Reader): Option[ColumnStats] = {
    var out: Option[ColumnStats] = None
    walkStruct(r) { (id, tpe, rr) =>
      (id, tpe) match {
        case (3, TStruct) => out = parseColumnMetaData(rr); true
        case _ => false
      }
    }
    out
  }

  private def parseRowGroup(r: Reader, idx: Int): RowGroupMeta = {
    var nCols = 0
    var bytes = -1L
    var rows = -1L
    val cols = Seq.newBuilder[ColumnStats]
    walkStruct(r) { (id, tpe, rr) =>
      (id, tpe) match {
        case (1, TList) =>
          val (n, et) = listHeader(rr)
          nCols = n
          var i = 0
          while (i < n) {
            if (et == TStruct) parseColumnChunk(rr).foreach(cols += _)
            else skipValue(rr, et)
            i += 1
          }
          true
        case (2, TI64) => bytes = rr.zigzag(); true
        case (3, TI64) => rows = rr.zigzag(); true
        case _ => false
      }
    }
    RowGroupMeta(idx, rows, bytes, nCols, cols.result())
  }

  /** Parse a bare FileMetaData thrift blob (already sliced). */
  private def parseFileMetaData(r: Reader): FooterMeta = {
    var version = -1
    var numRows = -1L
    val leafFields = Seq.newBuilder[LeafField]
    var leaves = 0
    var createdBy = false
    val rgs = Seq.newBuilder[RowGroupMeta]
    var rgIdx = 0
    walkStruct(r) { (id, tpe, rr) =>
      (id, tpe) match {
        case (1, TI32) => version = rr.zigzag().toInt; true
        case (2, TList) =>
          val (n, _) = listHeader(rr)
          var i = 0
          while (i < n) {
            schemaElementLeaf(rr).foreach { lf =>
              leaves += 1; leafFields += lf
            }
            i += 1
          }
          true
        case (3, TI64) => numRows = rr.zigzag(); true
        case (4, TList) =>
          val (n, _) = listHeader(rr)
          var i = 0
          while (i < n) { rgs += parseRowGroup(rr, rgIdx); rgIdx += 1; i += 1 }
          true
        case (6, TBinary) => createdBy = true; false // skip normally
        case _ => false
      }
    }
    FooterMeta(version, numRows, leaves, createdBy, rgs.result(),
      leafFields.result())
  }

  /**
   * Census a Parquet file from its raw bytes: locate the trailing
   * magic, slice the footer, parse FileMetaData. None on anything
   * that is not a well-formed Parquet footer.
   */
  def parse(bytes: Array[Byte]): Option[FooterMeta] = {
    if (bytes == null || bytes.length < 12) return None
    val n = bytes.length
    if (bytes(n - 4) != 'P' || bytes(n - 3) != 'A' || bytes(n - 2) != 'R' ||
        bytes(n - 1) != '1') return None
    val len = (bytes(n - 8) & 0xff) | ((bytes(n - 7) & 0xff) << 8) |
      ((bytes(n - 6) & 0xff) << 16) | ((bytes(n - 5) & 0xff) << 24)
    if (len <= 0 || len > n - 12) return None
    try {
      val r = new Reader(bytes, n - 8 - len, n - 8)
      val m = parseFileMetaData(r)
      if (m.version < 0 || m.num_rows < 0) None else Some(m)
    } catch { case scala.util.control.NonFatal(_) => None }
  }
}
