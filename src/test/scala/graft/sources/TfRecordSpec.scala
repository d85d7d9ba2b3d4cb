package graft.sources

import graft.slope.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TfRecordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_tfrec_$tag").toString

  test("tfrecord roundtrip: ids, bytes, and float bits survive exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src0", "plain text", Seq(0.5f, -1.25f, 3.0e-8f)),
      (2L, "src1", "unicode é中文 😀", Seq(1f)),
      (3L, "src0", "", Seq.empty[Float]),
      (7L, "src2", "x" * 10000, Seq(Float.MinPositiveValue, -0.0f)))
      .toDF("doc_id", "source", "text", "embedding")
    val dir = tmpDir("rt")
    TfRecord.writeCorpus(docs, dir, nFiles = 2)
    val got = TfRecord.read(spark, dir).collect()
    assert(got.forall(_.getAs[Boolean]("parse_ok")), got.mkString("\n"))
    val byId = got.map { r =>
      val i64 = r.getAs[collection.Map[String, collection.Seq[Long]]](
        "int64_feats")
      val f32 = r.getAs[collection.Map[String, collection.Seq[Float]]](
        "float_feats")
      val bin = r.getAs[collection.Map[String, collection.Seq[Array[Byte]]]](
        "bytes_feats")
      i64("doc_id").head -> ((
        new String(bin("source").head.toArray, "UTF-8"),
        new String(bin("text").head.toArray, "UTF-8"),
        f32.getOrElse("embedding", collection.Seq.empty[Float]).toList))
    }.toMap
    docs.collect().foreach { r =>
      val (src, txt, emb) = byId(r.getLong(0))
      assert(src == r.getString(1) && txt == r.getString(2))
      // float equality must be BIT equality (roundtrip through the
      // packed wire encoding) — compare raw bits, not values, so -0.0
      // and denormals count
      val want = r.getSeq[Float](3).toList
      assert(emb.size == want.size)
      emb.zip(want).foreach { case (a, b) =>
        assert(java.lang.Float.floatToRawIntBits(a) ==
          java.lang.Float.floatToRawIntBits(b), s"$a vs $b")
      }
    }
  }

  test("data-CRC flip quarantines ONE record; the rest of the shard survives") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"src${i % 3}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("crc")
    // corruptEvery = 10 flips a payload byte of docs 0, 10, 20, 30
    TfRecord.writeCorpus(docs, dir, nFiles = 2, corruptEvery = 10)
    val got = TfRecord.read(spark, dir).collect()
    val bad = got.filter(!_.getAs[Boolean]("parse_ok"))
    assert(bad.length == 4, s"expected 4 quarantines, got ${bad.length}")
    assert(bad.forall(_.getAs[String]("error").startsWith("DATA_CRC")))
    assert(bad.forall(_.isNullAt(3)), "quarantine rows carry no features")
    val ok = got.filter(_.getAs[Boolean]("parse_ok"))
      .map(_.getAs[Map[String, Seq[Long]]]("int64_feats")("doc_id").head)
    assert(ok.sorted.toSeq == (0L until 40L).filter(_ % 10 != 0),
      "every non-flipped record must survive the shard")
  }

  test("truncation and framing loss stop the file with a quarantine row") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, "s", s"text $i"))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("trunc")
    TfRecord.writeCorpus(docs, dir, nFiles = 1)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    // chop mid-record: framing fails at the cut, earlier records keep
    val full = java.nio.file.Files.readAllBytes(f.toPath)
    java.nio.file.Files.write(f.toPath,
      java.util.Arrays.copyOfRange(full, 0, full.length - 10))
    val got = TfRecord.read(spark, dir).collect().sortBy(_.getLong(1))
    val bad = got.filter(!_.getAs[Boolean]("parse_ok"))
    assert(bad.length == 1 &&
      bad.head.getAs[String]("error").startsWith("TRUNCATED"))
    assert(got.count(_.getAs[Boolean]("parse_ok")) == 19,
      "records before the cut must survive")
    assert(bad.head.getLong(1) > 0, "offset pinpoints the damage")

    // length-CRC damage = framing lost: nothing after it is trusted
    val dir2 = tmpDir("lencrc")
    TfRecord.writeCorpus(docs, dir2, nFiles = 1)
    val f2 = new java.io.File(dir2).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(f2.toPath)
    bytes(8) = (bytes(8) ^ 0x01).toByte // first record's length CRC
    java.nio.file.Files.write(f2.toPath, bytes)
    val got2 = TfRecord.read(spark, dir2).collect()
    assert(got2.length == 1 &&
      got2.head.getAs[String]("error").startsWith("LENGTH_CRC"))
  }

  test("decoder is a real proto parser: unknown fields and unpacked lists") {
    // an Example-shaped message written by a different producer:
    // unpacked int64 element, unpacked float element, an unknown
    // Feature kind field, and an unknown Example-level field
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def bytesOf(build: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); build(b); b.toByteArray
    }
    def lenDelimTo(b: java.io.ByteArrayOutputStream, field: Int,
                   payload: Array[Byte]): Unit = {
      var v = ((field << 3) | 2).toLong
      while ((v & ~0x7fL) != 0) { b.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      b.write(v.toInt)
      var n = payload.length.toLong
      while ((n & ~0x7fL) != 0) { b.write(((n & 0x7f) | 0x80).toInt); n >>>= 7 }
      b.write(n.toInt)
      b.write(payload)
    }
    val int64List = bytesOf { b => b.write((1 << 3) | 0); b.write(42) } // unpacked
    val floatList = bytesOf { b =>
      b.write((1 << 3) | 5)
      b.write(java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putFloat(1.5f).array())
    }
    val featA = bytesOf { b => lenDelimTo(b, 3, int64List) }
    val featB = bytesOf { b =>
      lenDelimTo(b, 2, floatList)
      b.write((9 << 3) | 0); b.write(7) // unknown varint field in Feature
    }
    val entryA = bytesOf { b =>
      lenDelimTo(b, 1, "a".getBytes("UTF-8")); lenDelimTo(b, 2, featA)
    }
    val entryB = bytesOf { b =>
      lenDelimTo(b, 1, "b".getBytes("UTF-8")); lenDelimTo(b, 2, featB)
    }
    val features = bytesOf { b =>
      lenDelimTo(b, 1, entryA); lenDelimTo(b, 1, entryB)
    }
    val example = bytesOf { b =>
      lenDelimTo(b, 1, features)
      b.write((5 << 3) | 0); b.write(0) // unknown Example-level field
    }
    val got = TfRecord.decodeExample(example, 0, example.length)
    assert(got.isRight, got)
    val (i64, f32, bin) = got.toOption.get
    assert(i64 == Map("a" -> Seq(42L)))
    assert(f32 == Map("b" -> Seq(1.5f)))
    assert(bin.isEmpty)

    // junk payload must be a Left, never a throw
    assert(TfRecord.decodeExample(Array[Byte](0x7f, 0x00, -1), 0, 3).isLeft)
  }

  test("writeExamples: schema-driven features, null omission, type rejection") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Some(7), Some(1.5f), Some("x"), Some(Seq(1L, 2L))),
      (2L, None, None, None, None))
      .toDF("k", "i", "f", "s", "arr")
    val dir = tmpDir("gen")
    TfRecord.writeExamples(df, dir, nFiles = 1, shardKey = "k")
    val got = TfRecord.read(spark, dir).collect()
      .map { r =>
        val i64 = r.getAs[collection.Map[String, collection.Seq[Long]]](
          "int64_feats")
        i64("k").head -> r
      }.toMap
    val r1i64 = got(1L)
      .getAs[collection.Map[String, collection.Seq[Long]]]("int64_feats")
    assert(r1i64("i") == Seq(7L), "int column maps to Int64List")
    assert(r1i64("arr") == Seq(1L, 2L), "long array maps to Int64List")
    assert(got(1L).getAs[collection.Map[String, collection.Seq[Float]]](
      "float_feats")("f") == Seq(1.5f))
    // row 2: every nullable feature absent — the proto idiom for null
    val r2i64 = got(2L)
      .getAs[collection.Map[String, collection.Seq[Long]]]("int64_feats")
    assert(r2i64.keySet == Set("k"), s"nulls must omit features: $r2i64")
    assert(got(2L).getAs[collection.Map[String, collection.Seq[Float]]](
      "float_feats").isEmpty)
    // unmappable type fails loud, not silently coerced
    val bad = intercept[IllegalArgumentException] {
      TfRecord.writeExamples(df.withColumn("d", lit(1.0)), tmpDir("bad"),
        nFiles = 1, shardKey = "k")
    }
    assert(bad.getMessage.contains("no tf.train.Feature mapping"))
  }

  test("decoder fuzz: random and mutated bytes return Left, never throw or hang") {
    val rng = new scala.util.Random(43)
    // pure noise
    (0 until 2000).foreach { _ =>
      val b = new Array[Byte](rng.nextInt(200))
      rng.nextBytes(b)
      TfRecord.decodeExample(b, 0, b.length) // Left or Right, never throws
    }
    // structured mutation: take a VALID Example and flip/truncate —
    // the decoder must stay total on near-valid inputs too
    val valid = TfRecord.encodeExample(
      Seq("id" -> Seq(7L, -1L, Long.MaxValue)),
      Seq("emb" -> Seq(1.5f, -0.25f)),
      Seq("txt" -> Seq("hello".getBytes("UTF-8"))))
    assert(TfRecord.decodeExample(valid, 0, valid.length).isRight)
    (0 until 2000).foreach { _ =>
      val b = valid.clone()
      b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      TfRecord.decodeExample(b, 0, b.length)
    }
    (1 until valid.length).foreach { n =>
      TfRecord.decodeExample(valid, 0, n)
    }
    // negative-length varint in a length-delimited field: the most
    // direct overrun vector — must be a clean Left
    val hostile = Array[Byte](0x0a, -1, -1, -1, -1, -1, -1, -1, -1, 0x7f)
    assert(TfRecord.decodeExample(hostile, 0, hostile.length).isLeft)
  }

  test("fixture marker: a regenerated corpus rewrites, an identical one reuses") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, "s", s"t$i"))
      .toDF("doc_id", "source", "text")
    val dir = tmpDir("marker")
    TfRecord.writeCorpus(docs, dir, nFiles = 1)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val t0 = f.lastModified()
    Thread.sleep(5)
    TfRecord.writeCorpus(docs, dir, nFiles = 1)
    assert(f.lastModified() == t0, "identical input must skip the rewrite")
    val docs2 = (0L until 10L).map(i => (i, "s", s"CHANGED $i"))
      .toDF("doc_id", "source", "text")
    TfRecord.writeCorpus(docs2, dir, nFiles = 1)
    val got = TfRecord.read(spark, dir).collect()
      .map(r => new String(r.getAs[Map[String, Seq[Array[Byte]]]](
        "bytes_feats")("text").head, "UTF-8"))
    assert(got.forall(_.startsWith("CHANGED")),
      "changed input must re-export, not reuse stale bytes")
  }
}
