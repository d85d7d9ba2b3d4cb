package graft.functions

import graft.slope.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PrefixSum must equal the naive single-window cumulative sum AND keep
  * every exchange/sort partitioned (the naive form's
  * `Exchange SinglePartition` is the 100-TB single-reducer trap it
  * exists to remove). */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(n: Int, groups: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    // distinct order values per group (callers pre-aggregate per
    // distinct value; ties would make any running sum order-ambiguous)
    (0 until n).flatMap { i =>
      (0 until groups).map(g => (g, i * 1.0 + rng.nextDouble() * 0.5,
        (rng.nextInt(20) + 1).toLong))
    }.toDF("g", "x", "v")
  }

  test("ungrouped prefix sum equals naive global-window cumsum") {
    val df = fixture(500, 1).drop("g")
    val naiveW = Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("cs", sum("v").over(naiveW))
      .orderBy("x").select("x", "cs").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val got = PrefixSum.inclusive(df, Nil, "x", "v", "cs", buckets = 16)
      .orderBy("x").select("x", "cs").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.length == naive.length)
    got.zip(naive).foreach { case ((xa, ca), (xb, cb)) =>
      assert(xa == xb && ca == cb, s"mismatch at $xa: $ca vs $cb")
    }
  }

  test("grouped prefix sum equals per-group window cumsum") {
    val df = fixture(300, 4)
    val naiveW = Window.partitionBy("g").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("cs", sum("v").over(naiveW))
      .orderBy("g", "x").select("g", "x", "cs").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val got = PrefixSum.inclusive(df, Seq("g"), "x", "v", "cs", buckets = 8)
      .orderBy("g", "x").select("g", "x", "cs").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == naive.length)
    got.zip(naive).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("plan has no SinglePartition exchange (and the naive plan does)") {
    val df = fixture(200, 1).drop("g")
    val ps = PrefixSum.inclusive(df, Nil, "x", "v", "cs", buckets = 8)
    ps.collect() // finalize the (adaptive) physical plan
    val plan = ps.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"prefix-sum plan must stay partitioned:\n$plan")
    // sensitivity check: the naive global window DOES show the trap
    val naive = df.withColumn("cs", sum("v").over(Window.orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    naive.collect()
    assert(naive.queryExecution.executedPlan.toString
      .contains("SinglePartition"),
      "sensitivity: naive global window should single-partition")
  }

  test("degenerate inputs: empty frame and single bucket") {
    import spark.implicits._
    val empty = Seq.empty[(Double, Long)].toDF("x", "v")
    assert(PrefixSum.inclusive(empty, Nil, "x", "v", "cs").count() == 0)
    val one = Seq((1.0, 5L), (2.0, 7L)).toDF("x", "v")
    val got = PrefixSum.inclusive(one, Nil, "x", "v", "cs", buckets = 1)
      .orderBy("x").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(5L, 12L))
  }

  test("integral inputs accumulate exactly beyond double precision") {
    import spark.implicits._
    // values near 2^53: a double accumulator would collapse the +1s
    // (2^53 + 1 == 2^53 in double); the long path must keep them —
    // this is the token-offset regime of a fully packed 100-TB corpus
    val big = 1L << 53
    val df = Seq((1.0, big), (2.0, 1L), (3.0, 1L), (4.0, 1L))
      .toDF("x", "v")
    val got = PrefixSum.inclusive(df, Nil, "x", "v", "cs", buckets = 2)
      .orderBy("x").collect().map(_.getLong(2))
    assert(got.toSeq == Seq(big, big + 1, big + 2, big + 3),
      s"long accumulation must be exact at 2^53: ${got.toSeq}")
    // fractional inputs keep the double path (schema check)
    val fr = Seq((1.0, 0.5), (2.0, 0.25)).toDF("x", "v")
    val out = PrefixSum.inclusive(fr, Nil, "x", "v", "cs", buckets = 2)
    assert(out.schema("cs").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(out.orderBy("x").collect().map(_.getDouble(2)).toSeq ==
      Seq(0.5, 0.75))
  }
}
