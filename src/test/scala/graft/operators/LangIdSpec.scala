package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangIdSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("charTrigrams: padded positions, empty-safe") {
    import spark.implicits._
    val got = Seq(("ab c"), (""), ("x")).toDF("text")
      .select(LangId.charTrigrams(col("text")).as("t"))
      .collect().map(_.getSeq[String](0))
    // " ab c " -> positions 1..4
    assert(got(0) == Seq(" ab", "ab ", "b c", " c "))
    assert(got(1).isEmpty)      // "" normalizes to "", pad "  ": none
    assert(got(2) == Seq(" x ")) // single char still yields one
  }

  test("NB classifier: separable toy corpus classifies exactly, ties are deterministic") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaa aaa aaa", "aa"), (2L, "aaa aaa", "aa"),
      (3L, "zzz zzz zzz", "zz"), (4L, "zzz zzz", "zz"),
      (5L, "aaa zzz", "aa") // mixed doc, still labeled aa
    ).toDF("doc_id", "text", "lang")
    val pred = LangId.langIdNb(docs, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(pred.take(4).toSeq ==
      Seq(1L -> "aa", 2L -> "aa", 3L -> "zz", 4L -> "zz"))
    // the mixed doc: 'aa' has the larger prior (3 vs 2 docs), and the
    // exact-tie trigram sums break alphabetically — either way "aa",
    // and repeat runs agree bit-for-bit
    val again = LangId.langIdNb(docs, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1))
    assert(pred.toSeq == again.toSeq)
    graft.CacheRegistry.releaseAll()
  }

  test("NB beats the marker-word heuristic on the fixture ground truth") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count().toDouble
    val nbPred = LangId.langIdNb(docs, "doc_id", "text", "lang")
    val nbAcc = docs.select(col("doc_id"), col("lang"))
      .join(nbPred, "doc_id")
      .filter(col("lang") === col("lang_pred")).count() / total
    val hAcc = docs.select(col("lang"),
      graft.functions.TextFunctions.langId(col("text")).as("p"))
      .filter(col("lang") === col("p")).count() / total
    graft.CacheRegistry.releaseAll()
    // the model-based default must not regress below the anchor
    assert(nbAcc >= hAcc, s"NB $nbAcc < heuristic $hAcc")
  }
}
