package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-aware joins Spark's built-in operators don't express directly:
  * the as-of join (each left row matched to the temporally closest
  * right row on the same key — the point-in-time lookup behind feature
  * stores, slowly-changing dimensions, and market-data enrichment) and
  * the banded range join (points matched to enclosing intervals
  * without the cross-product Spark's planner falls back to for pure
  * inequality predicates).
  *
  * Reference charter: jolars/golem has no join operators at all — this
  * extends the engine for the LLM-data-pipeline surface (attribute
  * events to the model/config snapshot active at event time, slice
  * corpora by crawl windows).
  */
object TemporalJoin {

  /** As-of join: for each left row, the single right row with the same
    * key and the LATEST `rightTime <= leftTime` (direction "backward",
    * the default) or the EARLIEST `rightTime >= leftTime` ("forward").
    * Left-join semantics — unmatched left rows keep nulls. `tolerance`
    * (an interval Column, e.g. `expr("INTERVAL 30 MINUTES")`) voids
    * matches farther than that from the left time.
    *
    * Plan (the union trick — one shuffle, never a per-row subquery):
    * tag right rows 0 and left rows 1, union, ONE exchange keyed on
    * the join keys, sort each key group by (time, tag) so a right row
    * sorts before the left rows at the same instant (ties included —
    * `<=` semantics), then a running `last(payload, ignoreNulls)`
    * carries the most recent right payload onto every left row.
    * Right rows with equal (key, time) fold to their lexicographic-max
    * payload struct FIRST (map-side-combined groupBy), so the carry is
    * deterministic. Forward direction reverses the sort, carrying the
    * next payload instead.
    *
    * 100-TB shape: cost is one sort-shuffle of |left| + |right| on the
    * key — the minimum any per-key temporal match must pay; no
    * broadcast, no range explosion, no driver state. Window partitions
    * are per KEY (user, instrument, config id), so partition size is
    * bounded by a key's own history; a single key holding a large
    * fraction of all rows would need the same salt-split treatment as
    * the dedup family (not done here — keys are entity-sized by
    * contract).
    *
    * Output: every left column, then `rightPayload` columns (all null
    * when unmatched or out of tolerance). Caller renames collisions. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String],
               direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(!(left.columns ++ right.columns).exists(_.startsWith("_asof_")),
      "column names starting with _asof_ collide with the join's " +
        "internals — rename them first")
    val payloadFields = (rightTime +: rightPayload).distinct
    // deterministic tie fold: one payload struct per (key, rightTime);
    // a right row with no time can never be "most recent" — drop it
    val rightFolded = right
      .filter(col(rightTime).isNotNull)
      .groupBy((keys :+ rightTime).map(col): _*)
      .agg(max(struct(payloadFields.map(col): _*)).as("_asof_payload"))
    val keyCols = keys.map(col)
    val lTagged = left.select(
      keyCols :+ col(leftTime).as("_asof_t") :+ lit(1).as("_asof_tag") :+
        lit(null).cast(rightFolded.schema("_asof_payload").dataType)
          .as("_asof_payload") :+
        struct(left.columns.map(col): _*).as("_asof_left"): _*)
    val rTagged = rightFolded.select(
      keyCols :+ col(rightTime).as("_asof_t") :+ lit(0).as("_asof_tag") :+
        col("_asof_payload") :+
        lit(null).cast(lTagged.schema("_asof_left").dataType)
          .as("_asof_left"): _*)
    val ordering =
      if (direction == "backward")
        Seq(col("_asof_t").asc, col("_asof_tag").asc)
      else Seq(col("_asof_t").desc, col("_asof_tag").asc)
    val w = Window.partitionBy(keyCols: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .withColumn("_asof_match", last("_asof_payload", ignoreNulls = true)
        .over(w))
      .filter(col("_asof_tag") === 1)
    val withinTol = tolerance.fold(lit(true)) { tol =>
      if (direction == "backward")
        col("_asof_match").getField(rightTime) >= col("_asof_t") - tol
      else col("_asof_match").getField(rightTime) <= col("_asof_t") + tol
    }
    // a left row with no time never matches (under desc ordering nulls
    // would otherwise sort last and pick up the oldest payload)
    val matched = when(col("_asof_t").isNotNull &&
      col("_asof_match").isNotNull && withinTol, col("_asof_match"))
    carried.select(
      left.columns.map(c => col("_asof_left").getField(c).as(c)) ++
        rightPayload.map(c => matched.getField(c).as(c)): _*)
  }

  /** Banded range join: points matched to every [lo, hi) interval that
    * contains them, without a cross product. Both sides bucketize the
    * range dimension into bands of `bandSeconds`: a point lands in
    * exactly ONE band, an interval explodes to every band it touches,
    * and the match becomes an equi-join on the band plus the exact
    * containment filter. Each qualifying (interval, point) pair meets
    * in exactly one band — the point's — so no distinct pass is
    * needed.
    *
    * 100-TB shape: shuffle volume is |points| + Σ interval spans /
    * band — linear, never |points| × |intervals| (Spark's fallback
    * plan for a bare inequality join is BroadcastNestedLoopJoin or a
    * cartesian product; this is the standard fix). Pick `bandSeconds`
    * near the median interval length: wider bands cut the interval
    * replication factor, narrower bands cut the per-band verify work.
    * A band holding a large share of points (a flash-crowd hour) is
    * the skew case; its verify is a hash join within the band, not a
    * sort, so AQE's skew splitting applies.
    *
    * Output: every interval column, then every point column (caller
    * renames collisions before the call). Inner-join semantics. */
  def rangeJoin(intervals: DataFrame, points: DataFrame,
                loCol: String, hiCol: String, pointCol: String,
                bandSeconds: Long): DataFrame = {
    require(bandSeconds > 0, s"bandSeconds must be > 0, got $bandSeconds")
    val bandOf = (c: Column) =>
      floor(unix_micros(c) / lit(bandSeconds * 1000000L))
    val pts = points.withColumn("_rj_band", bandOf(col(pointCol)))
    val ivs = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn("_rj_band",
        explode(sequence(bandOf(col(loCol)),
          // hi is exclusive: an interval ending exactly on a band edge
          // does not touch that band
          bandOf(col(hiCol) - expr("INTERVAL 1 MICROSECOND")))))
    ivs.join(pts, Seq("_rj_band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_rj_band")
  }
}
