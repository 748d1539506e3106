package graft.io

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0) web-archive source and sink — the
  * entry format of every large-scale pretraining corpus pipeline
  * (Common Crawl ships ~1 GB `.warc` shards; WET is the pre-extracted
  * text variant of the same record framing). Reference has no archive
  * ingestion at all (app.py's sources are CSV/Excel only); this is
  * part of the mandated LLM-data-pipeline extension surface.
  *
  * Record framing (public spec, ISO 28500 §4): a version line
  * `WARC/1.0`, CRLF-terminated `Name: value` header lines, a blank
  * CRLF line, exactly `Content-Length` payload octets, then two CRLFs
  * before the next record. Parsing is length-delimited — payload
  * bytes are NEVER scanned for record markers, so HTML containing
  * literal "WARC/1.0" or CRLFCRLF cannot desynchronize the reader.
  *
  * Scale shape: the reader is a `binaryFile` scan (one narrow file
  * frame — bytes live in executor tasks, the driver never touches
  * content) followed by a per-file streaming iterator parse. Memory
  * per task is bounded by the shard size, exactly the contract of
  * production WARC readers (FastWARC/warcio stream per shard; Common
  * Crawl's 1 GB sharding convention exists for this reason). At
  * 100 TB the unit of parallelism is the shard file — ~100k shards
  * fan out across executors with no shuffle at all; everything
  * downstream (stripHtml -> quality -> dedup) starts from the narrow
  * (uri, payload) frame this reader emits.
  *
  * Determinism: the writer emits records in partition order with
  * fixed header fields and UTF-8 octet-exact Content-Length; the
  * reader's output is a plain DataFrame whose content is independent
  * of file split order (per-record rows, no positional state).
  */
object Warc {

  /** One parsed WARC record: the header fields a curation pipeline
    * keys on, plus the payload decoded as UTF-8 text. */
  case class WarcRecord(warc_type: String, target_uri: String,
      warc_date: String, content_length: Long, payload: String)

  private val CRLF = "\r\n"

  /** Distributed WARC sink: `nFiles` shards, one per partition,
    * written executor-side (java.io against the task-local filesystem
    * — on a cluster deployment swap the stream for
    * `FileSystem.create`; the record rendering is identical). Each
    * shard opens with a `warcinfo` record (the spec's shard header —
    * readers must recognize and skip it) followed by one `response`
    * record per row. Content-Length is the UTF-8 OCTET length of the
    * payload, never the char count. */
  def write(df: DataFrame, uriCol: String, payloadCol: String,
      dir: String, nFiles: Int): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(uriCol).cast("string"), col(payloadCol).cast("string"))
      .as[(String, String)]
      .repartition(nFiles, col(uriCol))
      .foreachPartition { (it: Iterator[(String, String)]) =>
        val pid = TaskContext.getPartitionId()
        val path = java.nio.file.Paths.get(dir, f"part-$pid%05d.warc")
        val out = new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(path))
        try {
          val info = "software: graft-warc/1.0" + CRLF
          out.write(record("warcinfo", None, info))
          it.foreach { case (uri, payload) =>
            out.write(record("response", Some(uri),
              if (payload == null) "" else payload))
          }
        } finally out.close()
      }
  }

  private def record(warcType: String, uri: Option[String],
      payload: String): Array[Byte] = {
    val body = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val hdr = new StringBuilder()
      .append("WARC/1.0").append(CRLF)
      .append("WARC-Type: ").append(warcType).append(CRLF)
    uri.foreach { u =>
      hdr.append("WARC-Record-ID: <urn:graft:")
        .append(Integer.toHexString(u.hashCode)).append(">").append(CRLF)
      hdr.append("WARC-Target-URI: ").append(u).append(CRLF)
    }
    hdr.append("WARC-Date: 2026-01-01T00:00:00Z").append(CRLF)
      .append("Content-Type: ")
      .append(if (warcType == "warcinfo") "application/warc-fields"
        else "text/html; charset=utf-8").append(CRLF)
      .append("Content-Length: ").append(body.length).append(CRLF)
      .append(CRLF)
    val head = hdr.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tail = (CRLF + CRLF)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val outBytes = new Array[Byte](head.length + body.length + tail.length)
    System.arraycopy(head, 0, outBytes, 0, head.length)
    System.arraycopy(body, 0, outBytes, head.length, body.length)
    System.arraycopy(tail, 0, outBytes, head.length + body.length,
      tail.length)
    outBytes
  }

  /** Streaming per-shard record parse: scans header octets only,
    * jumps payloads by Content-Length. Malformed trailing bytes end
    * the shard (records parsed so far are kept) — the tolerant-reader
    * stance of production WARC tooling. */
  private[graft] def parseRecords(bytes: Array[Byte])
      : Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var pos = 0
    private var nextRec: WarcRecord = null
    private def indexOfHeaderEnd(from: Int): Int = {
      var i = from
      while (i + 3 < bytes.length) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
            bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    private def advance(): Unit = {
      nextRec = null
      // skip inter-record CRLFs
      while (pos < bytes.length &&
          (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) return
      val hdrEnd = indexOfHeaderEnd(pos)
      if (hdrEnd < 0) { pos = bytes.length; return }
      val head = new String(bytes, pos, hdrEnd - pos,
        java.nio.charset.StandardCharsets.UTF_8)
      val lines = head.split("\r\n")
      if (lines.isEmpty || !lines(0).startsWith("WARC/")) {
        pos = bytes.length; return
      }
      val fields = lines.drop(1).flatMap { l =>
        val i = l.indexOf(':')
        if (i < 0) None
        else Some(l.substring(0, i).trim.toLowerCase ->
          l.substring(i + 1).trim)
      }.toMap
      val len =
        try fields.getOrElse("content-length", "-1").toLong
        catch { case _: NumberFormatException => -1L }
      val bodyStart = hdrEnd + 4
      if (len < 0 || bodyStart + len > bytes.length) {
        pos = bytes.length; return
      }
      val payload = new String(bytes, bodyStart, len.toInt,
        java.nio.charset.StandardCharsets.UTF_8)
      pos = bodyStart + len.toInt
      nextRec = WarcRecord(
        fields.getOrElse("warc-type", ""),
        fields.getOrElse("warc-target-uri", ""),
        fields.getOrElse("warc-date", ""),
        len, payload)
    }
    advance()
    override def hasNext: Boolean = nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; advance(); r
    }
  }

  /** WARC source: one `binaryFile` scan over the shard directory, one
    * task per shard, records parsed executor-side. Output frame:
    * (warc_type, target_uri, warc_date, content_length, payload). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(parseRecords _)
      .toDF()
  }
}
