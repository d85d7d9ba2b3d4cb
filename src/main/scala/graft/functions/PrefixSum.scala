package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType, StructField, StructType}

/** Scale-safe ordered prefix sum.
  *
  * `Window.orderBy(x)` with no partition key funnels the WHOLE frame
  * through one task — the classic cumulative-sum scaling trap (fine at
  * sf0.1, a single-reducer wall at 100 TB). This helper computes the
  * identical inclusive running sum as a range-bucketed two-pass plan:
  *
  *  1. bucket every row by deterministic order-value quantile boundaries
  *     (an approx-quantile pass; boundaries become plan LITERALS, so
  *     bucketing is a pure function of the order value and correctness
  *     never depends on where the cuts landed — only load balance does);
  *  2. per-(group, bucket) local cumulative sums — an ordinary
  *     partitioned window, hash-sharded across the cluster;
  *  3. per-bucket subtotals, collected to the driver (≤ groups×buckets
  *     rows), turned into exclusive bucket offsets, and broadcast-joined
  *     back: prefix = bucket offset + local cumsum.
  *
  * INTEGRAL value columns accumulate as LongType end to end (bucket
  * subtotals, driver offsets, output), so the prefix sum is exact at
  * ANY magnitude — a double accumulator would lose token-offset
  * boundaries above ~2^53 cumulative tokens, exactly the scale a
  * 100-TB packed corpus reaches. Fractional value columns keep the
  * double path; for those the arithmetic is identical to the
  * single-window form whenever the summed values are exact in double
  * (the engine's fractional call sites are AUC weights at corpus-
  * bounded magnitudes), so results are bit-equal to the naive plan.
  */
object PrefixSum {

  /** Adds `outCol` = inclusive running sum of `valueCol` over rows
    * ordered by `orderCol` (ascending) within each `partCols` group.
    * `orderCol` must be numeric — or a lowercase-HEX string (an md5
    * rank, the seeded-shuffle pack order): a string order column is
    * bucketed by the numeric value of its first 15 hex chars (a
    * MONOTONE non-strict function of the full string's binary order,
    * so equal prefixes share a bucket and bucketing stays consistent
    * with the exact full-string window order) and ORDERED by the full
    * string. Either way it must be distinct per (group, row) — the
    * engine's call sites all pre-aggregate per distinct order value,
    * which any caller of a cumulative sum should do anyway (ties in a
    * running sum are order-ambiguous; for md5 ranks distinctness is
    * the 2^-128 collision bound).
    *
    * PRECONDITION: `partCols` and `orderCol` values must be non-null.
    * The naive window would keep a null partition and sort nulls first;
    * here a null partition value is dropped by the final inner join and
    * a null order value buckets to 0 — so the bit-equality claim only
    * covers non-null keys (every engine call site groups by non-null
    * aggregation keys, which guarantees this).
    *
    * Execution cost: the input plan is executed three times (the
    * quantile action, the subtotal collect, and the caller's execution
    * of the returned frame). `inclusive` persists the input at
    * MEMORY_AND_DISK for the two internal actions, so an expensive
    * upstream (a model-scored corpus, say) is computed once, not three
    * times; the cache is released after the internal actions, so the
    * caller's final execution recomputes upstream once more — callers
    * with a very expensive input can persist it themselves before
    * calling and keep the cache through their own action.
    */
  def inclusive(df: DataFrame, partCols: Seq[String], orderCol: String,
                valueCol: String, outCol: String,
                buckets: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val bCol = "__ps_b"
    val lcCol = "__ps_lc"
    val offCol = "__ps_off"
    val totCol = "__ps_tot"

    // cache the input across the two internal driver actions (quantile
    // pass + subtotal collect) — without this an expensive upstream
    // plan runs once per action. Respect a caller-managed cache.
    val callerCached =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val in = if (callerCached) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // a STRING order column (md5 rank) buckets by the numeric value of
    // its 15-char '0'-padded hex prefix — right-padding with '0' (the
    // smallest hex char) preserves lexicographic order for ANY-length
    // lowercase hex (x ≤ y ⟹ pad(x) ≤ pad(y): a proper prefix pads
    // below its extension's real characters), so every bucket is an
    // order-contiguous range at any rank length; the window below
    // still orders by the exact full string. The hex precondition is
    // ENFORCED, not assumed: conv() on a non-hex string parses only
    // the leading valid digits ('apple' -> 10, 'zebra' -> 0 — bucket
    // values that DECREASE while string order increases), which would
    // silently misassign offsets; a non-hex rank raises instead. The
    // check is a translate-empty test (no per-row regex).
    val stringOrder =
      df.schema(orderCol).dataType == org.apache.spark.sql.types.StringType
    val onCol = "__ps_on"
    val withOn =
      if (stringOrder)
        in.withColumn(onCol,
          conv(substring(rpad(
            when(length(translate(col(orderCol), "0123456789abcdef", ""))
                   === 0 && length(col(orderCol)) > 0, col(orderCol))
              .otherwise(raise_error(concat(
                lit("PrefixSum string-order column must be a non-empty " +
                  "lowercase-hex rank (md5-style), got: "),
                col(orderCol)))),
            15, "0"), 1, 15), 16, 10).cast(LongType))
      else in
    val quantCol = if (stringOrder) onCol else orderCol

    // deterministic global boundaries; duplicates collapse (skewed
    // order values simply yield fewer, fatter buckets)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bounds =
      if (buckets <= 1) Array.empty[Double]
      else withOn.stat.approxQuantile(quantCol, probs, 0.001).distinct.sorted
    val bucketExpr: Column =
      if (bounds.isEmpty) lit(0)
      else size(filter(lit(bounds), b => col(quantCol) > b))

    val withB = withOn.withColumn(bCol, bucketExpr)
    val keyCols = partCols :+ bCol

    // integral inputs accumulate exactly as longs; fractional as double
    val integral = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val accType = if (integral) LongType else DoubleType

    // pass 1: per-bucket subtotals -> driver -> exclusive offsets.
    // Row count is ≤ |groups| * buckets — driver-tiny by construction.
    val totRows = withB.groupBy(keyCols.map(col): _*)
      .agg(sum(col(valueCol)).cast(accType).as(totCol))
      .collect()
    val offRows: Seq[Row] = totRows
      .groupBy(r => partCols.map(c => r.getAs[Any](c)))
      .valuesIterator.flatMap { rs =>
        if (integral) {
          var acc = 0L
          rs.sortBy(_.getAs[Int](bCol)).map { r =>
            val out = Row.fromSeq(r.toSeq.dropRight(1) :+ acc)
            acc += r.getAs[Long](totCol)
            out
          }
        } else {
          var acc = 0.0
          rs.sortBy(_.getAs[Int](bCol)).map { r =>
            val out = Row.fromSeq(r.toSeq.dropRight(1) :+ acc)
            acc += r.getAs[Double](totCol)
            out
          }
        }
      }.toSeq
    val offSchema = StructType(
      withB.select(keyCols.map(col): _*).schema.fields.toSeq :+
        StructField(offCol, accType))
    val offDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(offRows).asJava), offSchema)

    // pass 2: local cumsum within each (group, bucket) — partitioned
    // window, sharded by hash(keyCols); plus the broadcast offset
    val localW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = withB
      .withColumn(lcCol, sum(col(valueCol)).over(localW))
      .join(broadcast(offDf), keyCols)
      .withColumn(outCol, col(offCol) + col(lcCol))
      .drop(bCol, lcCol, offCol, onCol)
    // internal actions are done; release the cache (non-blocking).
    // The caller's execution of `out` re-scans upstream once — see the
    // scaladoc for the pre-persist escape hatch.
    if (!callerCached) in.unpersist(false)
    out
  }
}
