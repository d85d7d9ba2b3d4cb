package graft.operators

import graft.slope.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("asof backward: equals a brute-force driver reference (ties, dups, unmatched, nulls)") {
    import spark.implicits._
    val rng = new scala.util.Random(19)
    // left: (id, key, t) with some null times; right: (key, t, v) with
    // duplicate (key, t) pairs and null times
    val lefts = (0 until 300).map { i =>
      (i.toLong, s"k${rng.nextInt(12)}",
        if (i % 37 == 0) null else ts(rng.nextInt(1000).toLong))
    }
    val rights = (0 until 200).map { j =>
      (s"k${rng.nextInt(15)}", // keys 12..14 never appear on the left
        if (j % 41 == 0) null else ts(rng.nextInt(1000).toLong),
        j.toLong)
    }
    val got = TemporalJoin.asofJoin(
      lefts.toDF("id", "key", "t"), rights.toDF("key", "rt", "v"),
      keys = Seq("key"), leftTime = "t", rightTime = "rt",
      rightPayload = Seq("v"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    // driver reference: latest rt <= t; ties on (key, rt) resolve to
    // the max payload struct = max (rt, v) = max v at equal rt
    val want = lefts.map { case (id, k, t) =>
      id -> (if (t == null) None else {
        val cands = rights.filter(r =>
          r._1 == k && r._2 != null && !r._2.after(t))
        if (cands.isEmpty) None
        else {
          val best = cands.maxBy(r => (r._2.getTime, r._3))
          Some(best._3)
        }
      })
    }.toMap
    assert(got.size == lefts.size, "left-join row preservation")
    assert(got == want)
    assert(want.values.exists(_.isEmpty) && want.values.exists(_.nonEmpty),
      "fixture must exercise both matched and unmatched rows")
  }

  test("asof forward + tolerance: reference parity; tolerance voids far matches") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val lefts = (0 until 200).map(i =>
      (i.toLong, s"k${rng.nextInt(8)}", ts(rng.nextInt(1000).toLong)))
    val rights = (0 until 120).map(j =>
      (s"k${rng.nextInt(8)}", ts(rng.nextInt(1000).toLong), j.toLong))
    val got = TemporalJoin.asofJoin(
      lefts.toDF("id", "key", "t"), rights.toDF("key", "rt", "v"),
      keys = Seq("key"), leftTime = "t", rightTime = "rt",
      rightPayload = Seq("v"), direction = "forward",
      tolerance = Some(expr("INTERVAL 100 SECONDS")))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    val want = lefts.map { case (id, k, t) =>
      val cands = rights.filter(r => r._1 == k && !r._2.before(t) &&
        r._2.getTime - t.getTime <= 100000L)
      id -> (if (cands.isEmpty) None
      else Some(cands.minBy(r => (r._2.getTime, -r._3))._3))
    }.toMap
    assert(got == want)
    assert(want.values.exists(_.isEmpty) && want.values.exists(_.nonEmpty))
  }

  test("range join: equals the inequality join at any band width; edge intervals") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val points = (0 until 400).map(i =>
      (i.toLong, ts(rng.nextInt(5000).toLong))).toDF("pid", "pt")
    val intervals = ((0 until 60).map { i =>
      val lo = rng.nextInt(5000).toLong
      (i.toLong, ts(lo), ts(lo + 1 + rng.nextInt(400)))
    } ++ Seq(
      (60L, ts(100), ts(100)),   // empty: lo == hi, drops
      (61L, ts(200), ts(150)),   // inverted, drops
      (62L, ts(0), ts(3600)))    // ends exactly on a 3600s band edge
      ).toDF("iid", "lo", "hi")
    val want = intervals.as("i").join(points.as("p"),
        col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    for (band <- Seq(1L, 7L, 3600L, 100000L)) {
      val got = TemporalJoin.rangeJoin(intervals, points,
        "lo", "hi", "pt", bandSeconds = band)
        .select("iid", "pid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"band=$band: duplicate pairs")
      assert(got.toSet == want, s"band=$band")
    }
    assert(want.nonEmpty)
    // the edge interval must not claim a point AT its exclusive hi
    val atEdge = points.filter(col("pt") === ts(3600)).count()
    assert(atEdge == 0 || !want.exists(p => p._1 == 62L &&
      points.filter(col("pid") === p._2 && col("pt") === ts(3600))
        .count() > 0))
  }
}
