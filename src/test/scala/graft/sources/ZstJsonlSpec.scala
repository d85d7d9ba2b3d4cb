package graft.sources

import graft.slope.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ZstJsonlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_zst_$tag").toString

  test("zst roundtrip: escapes survive, corrupt lines quarantine, equals the plain-JSONL reader") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src0", "plain text"),
      (2L, "src1", "with \"quotes\" and \\backslash\\"),
      (3L, "src0", "control\tchars\nnewline"),
      (50L, "src1", "this one gets truncated"), // corruptEvery = 50
      (7L, "src2", "")).toDF("doc_id", "source", "text")
    val zdir = tmpDir("rt")
    ZstJsonl.writeCorpus(docs, zdir, nFiles = 2, corruptEvery = 50)
    val files = new java.io.File(zdir).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst"))
    assert(files.length == 2 && files.forall(_.length > 0))
    val got = ZstJsonl.read(spark, zdir).collect()
    val ok = got.filter(_.getAs[Boolean]("parse_ok"))
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(ok == Map(
      1L -> (("src0", "plain text")),
      2L -> (("src1", "with \"quotes\" and \\backslash\\")),
      3L -> (("src0", "control\tchars\nnewline")),
      7L -> (("src2", ""))))
    val bad = got.filter(!_.getAs[Boolean]("parse_ok"))
    assert(bad.length == 1)
    assert(bad.head.isNullAt(0) && bad.head.isNullAt(2),
      "quarantine row data columns must be null")
    assert(bad.head.getAs[String]("corrupt_raw").startsWith("{\"doc_id\":50"),
      "raw line preserved for forensics")
    // differential vs the plain-JSONL reader on the same docs: the
    // compressed source must be a pure transport change
    val jdir = tmpDir("plain")
    Jsonl.writeCorpus(docs, jdir, nFiles = 2, corruptEvery = 50)
    val plain = Jsonl.read(spark, jdir).collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
        r.getBoolean(3))).sortBy(_.toString)
    val zst = got
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)),
        r.getBoolean(3))).sortBy(_.toString)
    assert(zst.toSeq == plain.toSeq)
  }

  test("zst frame damage quarantines the shard instead of throwing") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"s${i % 3}", s"doc $i body text"))
      .toDF("doc_id", "source", "text")
    // dry-run fixture: find a shard that actually HOLDS docs (the
    // hash-distributed pmod buckets can leave a shard empty) and learn
    // its membership — the expected loss set
    def shardDocs(f: java.io.File): Set[Long] = {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        new com.github.luben.zstd.ZstdInputStream(
          new java.io.FileInputStream(f)), java.nio.charset.StandardCharsets.UTF_8))
      try Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map(l => l.split(",")(0).split(":")(1).toLong).toSet
      finally in.close()
    }
    val dry = tmpDir("frame_dry")
    ZstJsonl.writeCorpus(docs, dry, nFiles = 4)
    val byShard = new java.io.File(dry).listFiles()
      .filter(_.getName.endsWith(".jsonl.zst")).sortBy(_.getName)
      .map(f => f.getName -> shardDocs(f))
    val (victimName, expectedLost) = byShard.filter(_._2.nonEmpty).head
    val victimPid = victimName.stripPrefix("part-")
      .stripSuffix(".jsonl.zst").toInt
    val dir = tmpDir("frame")
    ZstJsonl.writeCorpus(docs, dir, nFiles = 4, truncateShard = victimPid)
    val got = ZstJsonl.read(spark, dir).collect()
    val frameRows = got.filter(r => !r.getAs[Boolean]("parse_ok") &&
      Option(r.getAs[String]("corrupt_raw")).exists(_.startsWith("_ZSTD_FRAME_ERROR")))
    assert(frameRows.length == 1, s"want one frame quarantine row, got ${frameRows.length}")
    assert(frameRows.head.getAs[String]("corrupt_raw").contains(victimName))
    // every doc NOT in the damaged shard round-trips; the damaged
    // shard's docs are lost but accounted for by the quarantine row
    val okIds = got.filter(_.getAs[Boolean]("parse_ok")).map(_.getLong(0)).toSet
    val lost = (0L until 40L).toSet -- okIds
    assert(lost == expectedLost && lost.nonEmpty,
      s"lost $lost, expected $expectedLost")
  }
}
