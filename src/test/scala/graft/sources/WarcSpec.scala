package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC writer/reader roundtrip + malformed-record quarantine. */
class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"warc_$tag").toFile
    d.deleteOnExit(); d.getAbsolutePath
  }

  test("roundtrip: every doc comes back byte-identical with headers") {
    import spark.implicits._
    val docs = Seq(
      (0L, "src0", "hello warc world"),
      (1L, "src1", ""), // empty payload
      (2L, "src0", "second doc\nwith a newline and \r carriage"),
      (3L, "src2", "third " * 100)) // multi-hundred-byte payload
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("rt")
    Warc.writeCorpus(docs, dir, nFiles = 2)
    val back = Warc.read(spark, dir).collect()
    assert(back.length == 4 && back.forall(_.getBoolean(10)))
    val byId = back.map { r =>
      val id = r.getString(4).split("/").last.toLong
      id -> r
    }.toMap
    for ((id, src, text) <- Seq((0L, "src0", "hello warc world"),
      (1L, "src1", ""), (2L, "src0", "second doc\nwith a newline and \r carriage"),
      (3L, "src2", "third " * 100))) {
      val r = byId(id)
      assert(r.getString(2) == "response")
      assert(r.getString(3) == s"<urn:graft:doc-$id>")
      assert(r.getString(6) == src)
      assert(r.getString(7) == "text/plain")
      assert(r.getLong(8) == text.getBytes(UTF_8).length)
      assert(new String(r.getAs[Array[Byte]](9), UTF_8) == text)
    }
    // idempotent: marker prevents rewrite, second read identical
    Warc.writeCorpus(docs, dir, nFiles = 2)
    assert(Warc.read(spark, dir).count() == 4)
  }

  test("fixture marker: identical input skips the rewrite, changed input regenerates") {
    import spark.implicits._
    val dir = tmpDir("marker")
    val a = Seq((0L, "s", "first corpus")).toDF("doc_id", "source", "text")
    Warc.writeCorpus(a, dir, nFiles = 1)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc")).head
    val mtime = f.lastModified()
    // identical input: no rewrite (bytes untouched)
    Warc.writeCorpus(a, dir, nFiles = 1)
    assert(f.lastModified() == mtime, "identical input must not rewrite")
    // changed input: the old existence-only marker silently kept the
    // stale fixture here — the content-keyed marker must regenerate
    val b = Seq((0L, "s", "second corpus")).toDF("doc_id", "source", "text")
    Warc.writeCorpus(b, dir, nFiles = 1)
    val texts = Warc.read(spark, dir).filter(col("parse_ok"))
      .select(col("payload").cast("string")).collect().map(_.getString(0))
    assert(texts.toSeq == Seq("second corpus"), texts.toSeq.toString)
  }

  test("quarantine: bad version line and overrunning Content-Length") {
    val dir = tmpDir("bad")
    // file 1: valid record then garbage framing
    val good = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://x/doc/7\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    Files.write(java.nio.file.Paths.get(dir, "a.warc"),
      (good + "NOT-A-WARC-HEADER\r\n\r\n").getBytes(UTF_8))
    // file 2: Content-Length overruns the file
    Files.write(java.nio.file.Paths.get(dir, "b.warc"),
      "WARC/1.0\r\nContent-Length: 99999\r\n\r\nshort".getBytes(UTF_8))
    val rows = Warc.read(spark, dir).collect()
    val (ok, bad) = rows.partition(_.getBoolean(10))
    assert(ok.length == 1 && ok.head.getString(4) == "http://x/doc/7")
    assert(new String(ok.head.getAs[Array[Byte]](9), UTF_8) == "hi")
    assert(bad.length == 2, s"want 2 quarantine rows: ${rows.mkString(";")}")
    assert(bad.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("WET/WAT sidecars: conversion+metadata record types, glob separation") {
    import spark.implicits._
    val docs = Seq((0L, "extracted text zero"), (1L, "extracted text one"))
      .toDF("doc_id", "payload")
    val dir = tmpDir("wet")
    // all three families in ONE directory — the CC segment layout
    Warc.writeCorpus(docs.select(col("doc_id"), lit("s").as("source"),
      col("payload").as("text")), dir, nFiles = 1)
    Warc.writeWet(docs, dir, nFiles = 1)
    Warc.writeWat(docs.select(col("doc_id"),
      lit("""{"k":1}""").as("payload")), dir, nFiles = 1)
    val wet = Warc.readWet(spark, dir).collect()
    assert(wet.length == 2 && wet.forall(r =>
      r.getAs[Boolean]("parse_ok") &&
        r.getAs[String]("warc_type") == "conversion" &&
        r.getAs[String]("content_type") == "text/plain"))
    val byId = wet.map(r =>
      r.getAs[String]("refers_to") ->
        new String(r.getAs[Array[Byte]]("payload"), UTF_8)).toMap
    assert(byId == Map("<urn:graft:doc-0>" -> "extracted text zero",
      "<urn:graft:doc-1>" -> "extracted text one"))
    val wat = Warc.readWat(spark, dir).collect()
    assert(wat.length == 2 && wat.forall(r =>
      r.getAs[String]("warc_type") == "metadata" &&
        r.getAs[String]("content_type") == "application/json"))
    // glob separation: the raw-WARC read must not pick up sidecars
    assert(Warc.read(spark, dir).count() == 2)
  }

  test("WET writer conformance: CC-required header set on written records") {
    // r12 verdict ask #9: the foreign fixture proves the READER; this
    // proves the WRITER — the engine's own WET output must carry every
    // header Common Crawl's WET records carry (WARC/1.0 mandatory set
    // + the CC conventions), verified on the RAW bytes and then
    // consumed through the same parser path the foreign fixture uses.
    import spark.implicits._
    val docs = Seq(
      (0L, "extracted text zero — ünïcode 🙂"),
      (1L, ""), // empty extraction still gets a conformant record
      (2L, "body two\nwith lines"))
      .toDF("doc_id", "payload")
    val dir = tmpDir("conf")
    Warc.writeWet(docs, dir, nFiles = 2)
    val required = Seq("WARC-Type", "WARC-Record-ID", "WARC-Refers-To",
      "WARC-Target-URI", "WARC-Date", "WARC-Block-Digest",
      "Content-Type", "Content-Length")
    // raw-bytes check: walk each record's header block per the
    // WARC/1.0 grammar (version line, headers, blank, Content-Length
    // octets) — independent of the engine's parser
    val recHeaders = scala.collection.mutable.ArrayBuffer[Map[String, String]]()
    new java.io.File(dir).listFiles.filter(_.getName.endsWith(".warc.wet"))
      .foreach { f =>
        // walk BYTES — Content-Length counts octets, and the unicode
        // payload makes char offsets diverge from byte offsets
        val b = Files.readAllBytes(f.toPath)
        def indexOfCrlfCrlf(from: Int): Int = {
          var i = from
          while (i + 3 < b.length &&
            !(b(i) == '\r' && b(i + 1) == '\n' &&
              b(i + 2) == '\r' && b(i + 3) == '\n')) i += 1
          if (i + 3 < b.length) i else -1
        }
        var off = 0
        while (off < b.length) {
          while (off < b.length && (b(off) == '\r' || b(off) == '\n')) off += 1
          if (off < b.length) {
            val hdrEnd = indexOfCrlfCrlf(off)
            assert(hdrEnd > off, "record must have a CRLF CRLF header end")
            val lines =
              new String(b, off, hdrEnd - off, UTF_8).split("\r\n")
            assert(lines.head == "WARC/1.0")
            val hs = lines.tail.map { l =>
              val i = l.indexOf(':'); l.take(i) -> l.drop(i + 1).trim
            }.toMap
            recHeaders += hs
            off = hdrEnd + 4 + hs("Content-Length").toInt
          }
        }
      }
    assert(recHeaders.size == 3)
    recHeaders.foreach { hs =>
      val missing = required.filterNot(hs.contains)
      assert(missing.isEmpty, s"missing CC-required headers: $missing")
      assert(hs("WARC-Type") == "conversion")
      assert(hs("Content-Type") == "text/plain")
      assert(hs("WARC-Date")
        .matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z"""))
      assert(hs("WARC-Block-Digest").matches("sha1:[A-Z2-7]{32}"))
    }
    assert(recHeaders.map(_("WARC-Record-ID")).distinct.size == 3,
      "record ids must be unique")
    // parser-path check (the foreign-fixture path): parse_ok, payload
    // byte-exact, and the block digest recomputes from the payload
    val back = Warc.readWet(spark, dir).collect()
    assert(back.length == 3 && back.forall(_.getBoolean(10)))
    val digestByRid = recHeaders
      .map(h => h("WARC-Record-ID") -> h("WARC-Block-Digest")).toMap
    back.foreach { r =>
      val payload = r.getAs[Array[Byte]](9)
      assert(digestByRid(r.getString(3)) ==
        s"sha1:${Warc.sha1Base32(payload)}",
        "WARC-Block-Digest must be the sha1-base32 of the block bytes")
    }
    // and a known-answer digest pin (RFC 3174 'abc' test vector:
    // sha1(abc) = a9993e364706816aba3e25717850c26c9cd0d89d)
    assert(Warc.sha1Base32("abc".getBytes(UTF_8)) ==
      "VGMT4NSHA2AWVOR6EVYXQUGCNSONBWE5")
  }

  test("foreign-producer WET/WAT: Common-Crawl-style bytes the engine never wrote") {
    // r11 verdict ask #8: the roundtrip tests prove self-consistency;
    // this fixture is hand-authored per the WARC/1.0 spec in the shape
    // Common Crawl actually publishes (the TfRecordSpec foreign-
    // producer discipline) with framing our writer NEVER emits: a
    // leading warcinfo record, WARC-Date/digest/language headers,
    // lower-case header names, a different record-id scheme, UTF-8
    // multibyte payloads, and payload text containing "WARC/1.0" —
    // which only a Content-Length-driven parser survives.
    def rec(headers: Seq[(String, String)], payload: Array[Byte]): Array[Byte] = {
      val head = new StringBuilder().append("WARC/1.0\r\n")
      headers.foreach { case (k, v) => head.append(s"$k: $v\r\n") }
      head.append(s"Content-Length: ${payload.length}\r\n\r\n")
      head.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
    }
    val info = rec(Seq("WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:uuid:aaaa-0000>",
      "content-type" -> "application/warc-fields"),
      "software: cc/2.0\r\nformat: WARC File Format 1.0\r\n".getBytes(UTF_8))
    val text1 = "Le texte extrait — ünïcode 🙂 body.\nWARC/1.0 looks like framing but is payload.\n"
    val wet1 = rec(Seq("WARC-Type" -> "conversion",
      "WARC-Record-ID" -> "<urn:uuid:bbbb-1111>",
      "WARC-Refers-To" -> "<urn:uuid:cccc-2222>",
      "warc-target-uri" -> "https://example.org/page?a=1",
      "WARC-Date" -> "2024-03-01T00:00:00Z",
      "WARC-Block-Digest" -> "sha1:FAKEDIGESTAAA",
      "WARC-Identified-Content-Language" -> "fra",
      "Content-Type" -> "text/plain"), text1.getBytes(UTF_8))
    val wet2 = rec(Seq("WARC-Type" -> "conversion",
      "WARC-Record-ID" -> "<urn:uuid:dddd-3333>",
      "WARC-Refers-To" -> "<urn:uuid:eeee-4444>",
      "WARC-Target-URI" -> "https://example.org/other",
      "Content-Type" -> "text/plain"), "plain ascii body".getBytes(UTF_8))
    val dir = tmpDir("foreign")
    Files.write(new java.io.File(dir, "CC-MAIN-0000.warc.wet").toPath,
      info ++ wet1 ++ wet2)
    val watJson = """{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"https://example.org/page?a=1"},"Payload-Metadata":{"HTTP-Response-Metadata":{"HTML-Metadata":{"Links":[{"url":"https://example.org/linked"}]}}}}}"""
    val wat = rec(Seq("WARC-Type" -> "metadata",
      "WARC-Record-ID" -> "<urn:uuid:ffff-5555>",
      "WARC-Refers-To" -> "<urn:uuid:cccc-2222>",
      "WARC-Target-URI" -> "https://example.org/page?a=1",
      "Content-Type" -> "application/json"), watJson.getBytes(UTF_8))
    Files.write(new java.io.File(dir, "CC-MAIN-0000.warc.wat").toPath,
      info ++ wat)

    val wets = Warc.readWet(spark, dir).collect()
    // the warcinfo record is filtered by type; both conversions parse
    assert(wets.length == 2 && wets.forall(_.getBoolean(10)))
    val byUri = wets.map(r => r.getString(4) -> r).toMap
    val r1 = byUri("https://example.org/page?a=1")
    assert(r1.getString(2) == "conversion")
    assert(r1.getString(5) == "<urn:uuid:cccc-2222>") // refers_to
    assert(new String(r1.getAs[Array[Byte]](9), UTF_8) == text1,
      "multibyte payload must come back byte-exact by Content-Length")
    assert(byUri.contains("https://example.org/other"))
    val wats = Warc.readWat(spark, dir).collect()
    assert(wats.length == 1 && wats.head.getBoolean(10))
    assert(new String(wats.head.getAs[Array[Byte]](9), UTF_8) == watJson)
    assert(wats.head.getString(7) == "application/json")

    // quarantine on foreign malformation: a spec-violating record
    // (garbage Content-Length) stops that FILE with a parse_ok=false
    // row; the healthy sidecar files above are unaffected
    val badBytes = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: NOT_A_NUMBER\r\n\r\nbody").getBytes(UTF_8)
    Files.write(new java.io.File(dir, "CC-MAIN-bad.warc.wet").toPath,
      wet2 ++ badBytes)
    val withBad = Warc.readWet(spark, dir)
    assert(withBad.filter(!col("parse_ok")).count() == 1)
    assert(withBad.filter(col("parse_ok")).count() == 3,
      "records before the malformed one (and other files) must survive")
  }

  test("column pruning: a payload-free projection reads and aggregates") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"s${i % 3}", s"doc number $i body"))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("agg")
    Warc.writeCorpus(docs, dir, nFiles = 4)
    val agg = Warc.read(spark, dir)
      .groupBy("source").agg(count(lit(1)).as("n"),
        sum("content_length").as("bytes"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("s0" -> 17L, "s1" -> 17L, "s2" -> 16L))
  }
}
