package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VersionedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("versioned corpus: readSnapshot(v_k) == folding k change batches") {
    import spark.implicits._
    val base = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // three deterministic batches: deletes, revisions, inserts — incl.
    // a delete-then-reinsert (id 6: deleted in b1, upserted in b3) and
    // a double-revision (id 9 revised in b1 and b2)
    val b1 = Seq((6L, "x", "delete"), (9L, "doc 9 r1", "upsert"),
      (41L, "new 41", "upsert")).toDF("doc_id", "text", "op")
    val b2 = Seq((9L, "doc 9 r2", "upsert"), (10L, "x", "delete"),
      (41L, "new 41 r1", "upsert")).toDF("doc_id", "text", "op")
    val b3 = Seq((6L, "doc 6 back", "upsert"), (42L, "new 42", "upsert"),
      (41L, "x", "delete")).toDF("doc_id", "text", "op")
    val batches = Seq(b1, b2, b3)

    val dir = java.nio.file.Files.createTempDirectory("graft-versioned")
      .toString
    Export.writeVersionedBase(base, dir)
    batches.foreach { b =>
      Export.appendChangeBatch(b, dir)
    }
    assert(Export.versions(dir) == Seq(0, 1, 2, 3))

    // every prefix: disk read-back == sequential applyChanges fold ==
    // in-memory snapshotAt
    var folded = base
    assert(rows(Export.readSnapshot(spark, dir, 0)) == rows(base))
    for (k <- 1 to 3) {
      folded = graft.operators.Checks.applyChanges(
        folded, batches(k - 1), "doc_id", "op")
      assert(rows(Export.readSnapshot(spark, dir, k)) == rows(folded),
        s"disk snapshot v$k != fold")
      assert(rows(graft.operators.Checks.snapshotAt(
        base, batches.take(k), "doc_id", "op")) == rows(folded),
        s"compaction v$k != fold")
    }
    // default version = latest; the reinsert and the tombstone landed
    val latest = rows(Export.readSnapshot(spark, dir))
    assert(latest == rows(folded))
    assert(latest.exists(_ == (6L, "doc 6 back")), "reinsert lost")
    assert(!latest.exists(_._1 == 41L), "final delete ignored")

    // the compaction read stays ONE exchange however many versions:
    // no more aggregates than the single max_by groupBy
    val plan = graft.operators.Checks.snapshotAt(
      base, batches, "doc_id", "op").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"compaction must be join-free:\n$plan")
  }
}
