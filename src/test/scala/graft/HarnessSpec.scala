package graft

import graft.slope.TestSpark
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}

/** The harness itself is part of the correctness surface: round 7
  * showed a broken query can vanish from the driver's correctness file
  * (Verify swallowed the exception and wrote nothing) and show up in
  * the bench as a plausible time-to-throw. These tests pin the loud
  * failure contract. */
class HarnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(): Path =
    Files.createTempDirectory("graft-harness")

  test("Verify.dump: every registered name yields a parquet result or an error sentinel") {
    val out = tmpDir()
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q_ok" -> ((s, _) => { import s.implicits._
        Seq((1, "a"), (2, "b")).toDF("id", "v") }),
      "q_boom" -> ((s, _) => { import s.implicits._
        // analysis-time failure, the q_events_window failure mode
        Seq(1).toDF("id").select(org.apache.spark.sql.functions.col("nope")) }))
    val failed = Verify.dump(spark, qs, "/unused", out.toString)
    assert(failed == List("q_boom"))
    // q_ok: readable parquet
    assert(spark.read.parquet(out.resolve("q_ok").toString).count() == 2)
    // q_boom: the dir EXISTS (never absent) and carries the sentinel,
    // so the driver's parquet read errors instead of skipping the row
    val boom = out.resolve("q_boom")
    assert(Files.isDirectory(boom))
    assert(Files.exists(boom.resolve("_GRAFT_ERROR")))
    assert(Files.readString(boom.resolve("_GRAFT_ERROR")).contains("q_boom failed"))
    intercept[Throwable] { spark.read.parquet(boom.toString).collect() }
    // no registered name is missing from the output listing
    val dirs = Files.list(out).iterator()
    val names = scala.collection.mutable.Set.empty[String]
    while (dirs.hasNext) names += dirs.next().getFileName.toString
    assert(qs.keySet.subsetOf(names.toSet))
  }

  test("Verify.dump: a failing query overwrites stale parquet from a prior green run") {
    val out = tmpDir()
    val ok: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q_x" -> ((s, _) => { import s.implicits._; Seq(1).toDF("id") }))
    assert(Verify.dump(spark, ok, "/unused", out.toString).isEmpty)
    assert(spark.read.parquet(out.resolve("q_x").toString).count() == 1)
    val bad: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q_x" -> ((_, _) => throw new RuntimeException("broken now")))
    assert(Verify.dump(spark, bad, "/unused", out.toString) == List("q_x"))
    // the stale green parquet must NOT survive next to the sentinel
    intercept[Throwable] {
      spark.read.parquet(out.resolve("q_x").toString).collect() }
  }

  test("every SparkEntry query name has oracle SQL or a documented rows-only check") {
    // names without oracleSql get only the driver's weaker rows>0 check;
    // keep that set explicit so additions are a conscious choice
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without an oracle: ${noOracle.toSeq.sorted.mkString(", ")}")
  }
}
