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
