package graft.sources

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("export snapshot: one file per partition, pruned reads, manifest audits") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"s${i % 4}", s"body of ${i}"))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    Export.writeSnapshot(docs, dir, "source")
    // layout: exactly one data file under each source= directory
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("source=")).sortBy(_.getName)
    assert(parts.map(_.getName).toSeq ==
      Seq("source=s0", "source=s1", "source=s2", "source=s3"))
    parts.foreach { p =>
      val files = p.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${p.getName}: ${files.length} files")
    }
    // a per-source read is partition-PRUNED: the filter lands in
    // PartitionFilters and only one directory's rows are scanned
    val one = spark.read.parquet(dir).filter(col("source") === "s2")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("source#"),
      s"expected partition filters in:\n$plan")
    assert(one.count() == 10)
    // manifest matches the source-of-truth aggregate
    val m = Export.manifest(spark, dir, "source", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val truth = docs.groupBy("source")
      .agg(count(lit(1)), sum(length(col("text")))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    truth.foreach { case (s, (n, chars)) =>
      assert(m(s) == ((1L, n, chars)), s"$s: ${m(s)} vs ($n, $chars)")
    }
    // marker: a rewrite with IDENTICAL input is a no-op (fingerprint
    // matches — the data files are untouched) ...
    val mtimes = parts.flatMap(_.listFiles()).map(f => f.getPath ->
      f.lastModified()).toMap
    Export.writeSnapshot(docs, dir, "source")
    parts.flatMap(_.listFiles()).foreach { f =>
      assert(f.lastModified() == mtimes(f.getPath),
        s"identical input must not rewrite ${f.getPath}")
    }
    // ... but CHANGED input re-exports instead of silently reusing the
    // stale snapshot (r9 ADVICE: the marker now embeds the input
    // fingerprint)
    Export.writeSnapshot(docs.limit(1), dir, "source")
    assert(spark.read.parquet(dir).count() == 1,
      "changed input must invalidate the export marker")
    // and writing the original back restores it (fingerprint differs
    // from the 1-row marker)
    Export.writeSnapshot(docs, dir, "source")
    assert(spark.read.parquet(dir).count() == 40)
  }

  test("export marker: even-multiplicity content change cannot collide (xor would cancel)") {
    import spark.implicits._
    // {X, X} and {Y, Y}: same count, and any per-row-hash XOR cancels
    // both to 0 — the sum-based fingerprint must still tell them apart
    val xs = Seq((1L, "s0", "xxx"), (1L, "s0", "xxx"))
      .toDF("doc_id", "source", "text")
    val ys = Seq((1L, "s0", "yyy"), (1L, "s0", "yyy"))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_export_xor").toString
    Export.writeSnapshot(xs, dir, "source")
    assert(spark.read.parquet(dir).select("text").collect()
      .forall(_.getString(0) == "xxx"))
    Export.writeSnapshot(ys, dir, "source")
    assert(spark.read.parquet(dir).select("text").collect()
      .forall(_.getString(0) == "yyy"),
      "duplicate-row content change must invalidate the export marker")
  }

  test("bucketed layout: co-located join runs with zero shuffle exchanges") {
    import spark.implicits._
    val left = (0L until 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val right = (0L until 200L).map(i => (i, i % 7)).toDF("doc_id", "grp")
    def save(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.mode("overwrite").format("parquet")
        .bucketBy(4, "doc_id").sortBy("doc_id").saveAsTable(name)
    }
    save(left, "graft_bkt_left")
    save(right, "graft_bkt_right")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_left")
        .join(spark.table("graft_bkt_right"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      // both sides arrive hash-clustered from the files: the sort-merge
      // join needs NO exchange — the write amortized the shuffle
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("SortMerge"),
        s"expected a sort-merge join:\n$plan")
      assert(joined.count() == 200)
      // and it is the same result as the plain join
      val plain = left.join(right, "doc_id")
      assert(joined.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
        plain.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_left")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_right")
    }
  }
}
