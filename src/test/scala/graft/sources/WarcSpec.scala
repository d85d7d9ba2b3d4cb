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
    assert(back.length == 4 && back.forall(_.getBoolean(9)))
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
      assert(r.getString(5) == src)
      assert(r.getString(6) == "text/plain")
      assert(r.getLong(7) == text.getBytes(UTF_8).length)
      assert(new String(r.getAs[Array[Byte]](8), UTF_8) == text)
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
    val (ok, bad) = rows.partition(_.getBoolean(9))
    assert(ok.length == 1 && ok.head.getString(4) == "http://x/doc/7")
    assert(new String(ok.head.getAs[Array[Byte]](8), UTF_8) == "hi")
    assert(bad.length == 2, s"want 2 quarantine rows: ${rows.mkString(";")}")
    assert(bad.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
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
