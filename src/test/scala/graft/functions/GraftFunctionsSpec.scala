package graft.functions

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-registered kernels must agree exactly with the Column API. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sql functions: registered kernels match the column API bit-for-bit") {
    GraftFunctions.register(spark)
    // deflate_size
    val dz = spark.sql("SELECT graft_deflate_size('spam spam spam spam')")
      .collect().head.getInt(0)
    assert(dz == DeflateHelper.size("spam spam spam spam".getBytes("UTF-8")))
    // dot product
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .collect().head.getDouble(0)
    assert(dot == 32.0)
    // minhash + simhash over the same pre-hashed shingles as the
    // column path — results must be identical arrays/longs
    import spark.implicits._
    val df = Seq("the quick brown fox jumps over it", "other text here")
      .toDF("text")
      .withColumn("h", transform(
        TextFunctions.shinglesFromWords(TextFunctions.normalizedWords(col("text")), 3),
        s => xxhash64(s)))
    df.createOrReplaceTempView("gf_docs")
    val viaSql = spark.sql(
      "SELECT graft_minhash(h, 8) AS mh, graft_simhash(h) AS sh FROM gf_docs")
      .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
    val viaCol = df.select(
      graft.operators.Dedup.minhashFromHashes(col("h"), 8).as("mh"),
      org.apache.spark.sql.graft.ColumnShim.column(SimhashFp(
        org.apache.spark.sql.graft.ColumnShim.expression(col("h")))).as("sh"))
      .collect().map(r => (r.getSeq[Long](0), r.getLong(1)))
    assert(viaSql.toSeq == viaCol.toSeq)
    // gpt2 + subword token counts: SQL == Column API
    val tok = spark.sql(
      "SELECT graft_gpt2_token_count(text) AS g FROM gf_docs")
      .collect().map(_.getLong(0))
    val tokCol = df.select(ByteBpe.gpt2TokenCount(col("text")))
      .collect().map(_.getLong(0))
    assert(tok.toSeq == tokCol.toSeq)
    val sub = spark.sql(
      "SELECT graft_subword_token_count(graft_words, false) AS s FROM " +
        "(SELECT split(lower(text), ' ') AS graft_words FROM gf_docs)")
      .collect().map(_.getLong(0))
    assert(sub.forall(_ > 0))
    // wordpiece count: SQL == Column API
    val wp = spark.sql(
      "SELECT graft_wordpiece_token_count(split(lower(text), ' ')) FROM gf_docs")
      .collect().map(_.getLong(0))
    val wpCol = df.select(WordPiece.wordPieceTokenCount(col("text")))
      .collect().map(_.getLong(0))
    assert(wp.toSeq == wpCol.toSeq && wp.forall(_ > 0))
    // char trigrams: SQL == kernel, and the padded form matches the
    // LangId feature pass
    val tri = spark.sql(
      "SELECT graft_char_trigrams(' ' || lower(text) || ' ') FROM gf_docs")
      .collect().map(_.getSeq[String](0))
    val triCol = df.select(graft.operators.LangId.charTrigrams(col("text")))
      .collect().map(_.getSeq[String](0))
    assert(tri.toSeq == triCol.toSeq)
    // arity/literal validation is loud, not silent
    val e = intercept[Exception](
      spark.sql("SELECT graft_deflate_size('a', 'b')").collect())
    assert(e.getMessage.contains("graft_deflate_size") ||
      e.getCause != null)
  }

  test("extensions class injects the same builders") {
    // the builder path used by spark.sql.extensions: applying the
    // extensions object must succeed and cover every registered name
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
    assert(GraftFunctions.all.map(_._1).distinct.size ==
      GraftFunctions.all.size)
  }

  test("ApproxPqCosine equality is CONTENT equality over the codebooks (r13 hygiene #3)") {
    // two expressions built from DISTINCT but equal-content codebook
    // arrays must semanticEquals (the PackState array-field lesson at
    // the expression layer); a one-ULP change must break it
    def mkBooks(): Array[Array[Array[Double]]] =
      Array(Array(Array(1.0, 2.0), Array(3.0, 4.0)),
        Array(Array(5.0, 6.0), Array(7.0, 8.0)))
    val ch1 = org.apache.spark.sql.catalyst.expressions.BoundReference(
      0, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType), nullable = true)
    val ch2 = org.apache.spark.sql.catalyst.expressions.BoundReference(
      1, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType), nullable = true)
    val ch3 = org.apache.spark.sql.catalyst.expressions.BoundReference(
      2, org.apache.spark.sql.types.DoubleType, nullable = true)
    val e1 = ApproxPqCosine(ch1, ch2, ch3, new PqCodebooks(mkBooks()), 2)
    val e2 = ApproxPqCosine(ch1, ch2, ch3, new PqCodebooks(mkBooks()), 2)
    assert(e1.semanticEquals(e2),
      "equal-content codebooks must compare equal")
    assert(e1.hashCode == e2.hashCode)
    val tweaked = mkBooks()
    tweaked(1)(0)(1) = java.lang.Double.longBitsToDouble(
      java.lang.Double.doubleToRawLongBits(6.0) + 1L)
    val e3 = ApproxPqCosine(ch1, ch2, ch3, new PqCodebooks(tweaked), 2)
    assert(!e1.semanticEquals(e3),
      "a one-ULP codebook change must compare unequal")
    // the digest is over raw bits + dimensions, not flattened values:
    // same multiset of doubles, different sub-quantizer shape
    val reshaped = Array(Array(Array(1.0, 2.0), Array(3.0, 4.0),
      Array(5.0, 6.0), Array(7.0, 8.0)))
    val e4 = ApproxPqCosine(ch1, ch2, ch3, new PqCodebooks(reshaped), 2)
    assert(!e1.semanticEquals(e4), "shape must participate in equality")
  }

  test("PqCodebooks digest computes once per instance and survives serialization (r14 ask #6)") {
    // the digest backs equals/hashCode, which Catalyst calls on the
    // PLANNING path (canonicalization / semanticEquals) — never per
    // row: eval and doGenCode reference `books` directly
    // (ctx.addReferenceObj), so the only digest cost an executor can
    // ever pay is one lazy computation per deserialized instance
    val books = Array(Array(Array(1.0, 2.0), Array(3.0, 4.0)))
    val pq = new PqCodebooks(books)
    // lazy val: the SAME String instance on every access — computed
    // at most once per instance, by construction
    assert(pq.digest eq pq.digest)
    // broadcast-serialization round trip: the deserialized copy
    // agrees on content identity and still memoizes
    def roundTrip(p: PqCodebooks): PqCodebooks = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(p); oos.close()
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      ois.readObject().asInstanceOf[PqCodebooks]
    }
    val fresh = roundTrip(new PqCodebooks(books)) // digest never forced
    assert(fresh.digest eq fresh.digest)
    assert(fresh == pq && fresh.hashCode == pq.hashCode)
    val forced = { val p = new PqCodebooks(books); p.digest; roundTrip(p) }
    assert(forced == pq, "pre-forced digest must survive the round trip")
  }
}
