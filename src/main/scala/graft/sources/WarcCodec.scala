package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/**
 * Pure-Scala WARC (Web ARChive, ISO 28500) codec — the wire format web
 * crawls actually arrive in (Common Crawl ships `.warc.gz`): a file is
 * a sequence of records, each `WARC/1.0\r\n` + header lines +
 * `Content-Length: N` + blank line + N payload bytes + `\r\n\r\n`;
 * `response` records carry a full HTTP response (status line, headers,
 * blank line, body) as their payload. The standard `.warc.gz` layout
 * gzips each record as its OWN member and concatenates the members —
 * readers that decompress the stream see the records back to back
 * (JDK `GZIPInputStream` walks concatenated members natively).
 *
 * Read side ([[parseWarc]] / [[readWarcFiles]]): header-driven
 * framing — records are located by `Content-Length`, never by
 * scanning payload bytes, so binary payloads (images inside a crawl)
 * frame exactly; non-`response` records (warcinfo, request, metadata)
 * are skipped; a malformed or truncated tail yields the records
 * before it and drops the tail — total, never throws.
 *
 * Shape at scale: a WARC corpus is files ⇒ `binaryFile` scan ⇒ one
 * [[parseWarc]] call per file inside `flatMap` — partition-parallel,
 * shuffle-free, the same opaque-binary `mapPartitions` discipline as
 * the media decoders. Per-record gzip members mean a file need not be
 * decompressed to split; this reader takes whole files (Common
 * Crawl's ~1 GB shards are sized for exactly that).
 *
 * The write side exists to round-trip-prove the reader on real corpus
 * data (the `warc_roundtrip` driver row: documents → sharded
 * `.warc.gz` blobs → parse → byte-identical fields, oracle = the
 * documents table itself, zero pinned constants) and to export
 * corpora in the ecosystem's interchange format.
 */
object WarcCodec {

  /** One parsed crawl document: target URI, HTTP status, the raw
    * `Content-Type` header value ("" when absent — it carries the
    * transport-layer charset parameter the decode step needs), and
    * the HTTP body (the page BYTES; decoding them to text is a
    * separate, charset-aware step — see
    * [[graft.operators.CharsetSniff]]). */
  final case class WarcDoc(
      url: String, http_status: Int, content_type: String, body: Array[Byte])

  private val CrLf = "\r\n"

  private[sources] val DefaultContentType = "text/plain; charset=utf-8"

  /** Encode one `response` record (uncompressed bytes). */
  private[sources] def responseRecord(
      url: String, body: Array[Byte],
      contentType: String = DefaultContentType): Array[Byte] = {
    val http =
      (s"HTTP/1.1 200 OK${CrLf}Content-Type: $contentType$CrLf" +
        s"Content-Length: ${body.length}$CrLf$CrLf").getBytes(UTF_8) ++ body
    val header =
      (s"WARC/1.0${CrLf}WARC-Type: response${CrLf}WARC-Target-URI: $url$CrLf" +
        s"Content-Type: application/http; msgtype=response$CrLf" +
        s"Content-Length: ${http.length}$CrLf$CrLf").getBytes(UTF_8)
    header ++ http ++ s"$CrLf$CrLf".getBytes(UTF_8)
  }

  /** Encode a `warcinfo` lead record — real files start with one; the
    * round trip proves the reader skips non-response records. */
  private[sources] def warcinfoRecord(info: String): Array[Byte] = {
    val payload = info.getBytes(UTF_8)
    (s"WARC/1.0${CrLf}WARC-Type: warcinfo${CrLf}" +
      s"Content-Length: ${payload.length}$CrLf$CrLf").getBytes(UTF_8) ++
      payload ++ s"$CrLf$CrLf".getBytes(UTF_8)
  }

  private def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(record)
    gz.close()
    bos.toByteArray
  }

  /**
   * STREAMING shard writer — the export primitive: warcinfo lead, then
   * one gzip member per `(url, body, contentType)` record, written to
   * `out` as the iterator is consumed. Heap holds ONE record at a
   * time, never the shard: a mis-sized `numShards` against a 100 TB
   * corpus degrades to a big FILE, not an executor OOM. Everything
   * else ([[buildWarcGz]], [[exportWarcShards]]) layers on this.
   */
  def writeWarcGz(
      out: java.io.OutputStream,
      docs: Iterator[(String, Array[Byte], String)],
      info: String = "graft-export"): Unit = {
    out.write(gzipMember(warcinfoRecord(info)))
    docs.foreach { case (url, body, ct) =>
      out.write(gzipMember(responseRecord(url, body, ct)))
    }
  }

  /** Build one `.warc.gz` file image in memory (fixture-sized inputs;
    * the scale path streams via [[writeWarcGz]]). */
  def buildWarcGz(docs: Seq[(String, Array[Byte])], info: String = "graft-export"): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    writeWarcGz(bos,
      docs.iterator.map { case (u, b) => (u, b, DefaultContentType) }, info)
    bos.toByteArray
  }

  /** Decompress concatenated gzip members (JDK GZIPInputStream walks
    * them natively); pass-through if the payload is not gzip. */
  private def gunzipAll(payload: Array[Byte]): Array[Byte] = {
    if (payload.length < 2 ||
      (payload(0) & 0xff) != 0x1f || (payload(1) & 0xff) != 0x8b) return payload
    val out = new ByteArrayOutputStream()
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(payload))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case scala.util.control.NonFatal(_) => () } // truncated tail: keep prefix
    out.toByteArray
  }

  /**
   * Parse a WARC file image (gzipped or plain) into its `response`
   * documents. Total: malformed headers or a truncated record end the
   * parse, returning everything before the damage.
   */
  def parseWarc(payload: Array[Byte]): Seq[WarcDoc] = {
    if (payload == null) return Seq.empty
    val bytes = gunzipAll(payload)
    val out = Seq.newBuilder[WarcDoc]
    var pos = 0

    // read one CRLF- (or LF-) terminated header line; None at EOF/overrun
    def line(): Option[String] = {
      var end = pos
      while (end < bytes.length && bytes(end) != '\n') end += 1
      if (end >= bytes.length) return None
      val cut = if (end > pos && bytes(end - 1) == '\r') end - 1 else end
      val s = new String(bytes, pos, cut - pos, UTF_8)
      pos = end + 1
      Some(s)
    }

    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record blank lines
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) ok = false
      else {
        line() match {
          case Some(v) if v.startsWith("WARC/") =>
            var warcType = ""
            var uri = ""
            var contentLength = -1L
            var headersOk = true
            var done = false
            while (!done && headersOk) {
              line() match {
                case Some("") => done = true
                case Some(h) =>
                  val i = h.indexOf(':')
                  if (i > 0) {
                    val k = h.substring(0, i).trim.toLowerCase
                    val value = h.substring(i + 1).trim
                    k match {
                      case "warc-type" => warcType = value
                      case "warc-target-uri" => uri = value
                      case "content-length" =>
                        contentLength = try value.toLong catch { case _: NumberFormatException => -1L }
                      case _ => ()
                    }
                  }
                case None => headersOk = false
              }
            }
            if (!headersOk || contentLength < 0 ||
              pos + contentLength > bytes.length) ok = false // truncated
            else {
              val payloadStart = pos
              pos += contentLength.toInt
              if (warcType == "response") {
                // HTTP framing: status line, headers, blank line, body
                val save = pos
                pos = payloadStart
                val status = line() match {
                  case Some(s) if s.startsWith("HTTP/") =>
                    s.split(" ", 3) match {
                      case parts if parts.length >= 2 =>
                        try parts(1).toInt catch { case _: NumberFormatException => -1 }
                      case _ => -1
                    }
                  case _ => -1
                }
                if (status > 0) {
                  var blank = false
                  var hOk = true
                  var contentType = ""
                  while (!blank && hOk) line() match {
                    case Some("") => blank = true
                    case Some(h) =>
                      val ci = h.indexOf(':')
                      if (ci > 0 &&
                          h.substring(0, ci).trim.equalsIgnoreCase("content-type"))
                        contentType = h.substring(ci + 1).trim
                    case None => hOk = false
                  }
                  if (hOk && pos <= save) {
                    val body = java.util.Arrays.copyOfRange(bytes, pos, save)
                    out += WarcDoc(uri, status, contentType, body)
                  }
                }
                pos = save
              }
            }
          case _ => ok = false // not a WARC record boundary
        }
      }
    }
    out.result()
  }

  /**
   * The 100 TB read path: WARC shards on disk → `binaryFile` scan (one
   * task per file, like Parquet splits) → per-file parse in the scan
   * stage. No shuffle, no driver involvement.
   */
  def readWarcFiles(spark: SparkSession, path: String): Dataset[WarcDoc] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(parseWarc(_))
  }

  /**
   * Export a corpus as sharded `.warc.gz` images (one blob per shard,
   * records ordered by id within the shard — deterministic). The blobs
   * land in a DataFrame so the caller picks the sink (files via
   * binary write, a table, or the round-trip check).
   *
   * Write-side shape: the one exchange hash-partitions on the shard
   * key; `sortWithinPartitions` then orders rows (shard, id) so each
   * task's iterator is a concatenation of complete shard RUNS — the
   * run iterator feeds [[writeWarcGz]] record by record. Nothing
   * materializes per shard except the compressed output image itself
   * (the product); the uncompressed rows stream straight through,
   * exactly like a sort-based aggregate.
   */
  def exportWarcShards(
      docs: DataFrame, idCol: String, textCol: String, nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(nShards > 0, s"nShards must be positive: $nShards")
    docs.select((col(idCol).cast("long") % nShards).cast("int").as("shard"),
        col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "id")
      .as[(Int, Long, String)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(Int, Array[Byte])] {
          def hasNext: Boolean = buf.hasNext
          def next(): (Int, Array[Byte]) = {
            val shard = buf.head._1
            val run = new Iterator[(String, Array[Byte], String)] {
              def hasNext: Boolean = buf.hasNext && buf.head._1 == shard
              def next(): (String, Array[Byte], String) = {
                val (_, id, text) = buf.next()
                (s"https://graft.example/doc/$id",
                  (if (text == null) "" else text).getBytes(UTF_8),
                  DefaultContentType)
              }
            }
            val bos = new ByteArrayOutputStream()
            writeWarcGz(bos, run)
            (shard, bos.toByteArray)
          }
        }
      }
      .toDF("shard", "warc_gz")
  }
}
