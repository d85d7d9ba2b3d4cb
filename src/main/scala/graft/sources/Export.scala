package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Publishing side of the corpus pipeline: partitioned snapshot export
  * with a verifiable manifest, and bucketed table layout for
  * shuffle-free downstream joins.
  *
  * At 100 TB the WRITE layout is a query-plan decision made once for
  * every future reader:
  *  - `partitionBy(source)` turns per-source readers into partition-
  *    PRUNED scans (the `PartitionFilters` line in explain — directory
  *    pruning, zero IO for excluded sources);
  *  - one `repartition(partitionCol)` before the write gives each
  *    partition exactly one file per write (no small-file explosion —
  *    the classic sin of partitioned writes is tasks × partitions
  *    files);
  *  - `bucketBy(k, id)` + `sortBy(id)` persists a hash-clustered,
  *    sorted layout so future equi-joins and aggregations on the
  *    bucket key run WITHOUT an exchange (co-located join — the
  *    pre-shuffle is amortized into the write).
  */
object Export {

  /** Write `df` as a `partitionCol`-partitioned parquet snapshot, one
    * file per partition value. Skipped when the `_GRAFT_EXPORT_DONE`
    * marker exists AND its recorded input fingerprint (row count +
    * order-independent content hash, one cheap aggregate over `df`)
    * matches — so a CHANGED source dataset re-exports instead of
    * silently reusing a stale snapshot (r9 ADVICE). The marker
    * mechanism is driver-local `java.nio` and is scoped to local-
    * filesystem fixture reuse across verify/bench runs; a cluster
    * deployment would key the check on a catalog/_SUCCESS commit
    * protocol instead. */
  def writeSnapshot(df: DataFrame, dir: String,
                    partitionCol: String): Unit = {
    // order-independent content hash = SUM of per-row hashes (wide
    // decimal, no overflow). NOT bit_xor: xor cancels even-multiplicity
    // rows ({X,X} -> 0 = {Y,Y} -> 0), so a changed source could still
    // match a stale marker — the exact failure this fingerprint exists
    // to prevent. Sum is duplicate-sensitive and commutative.
    val fp = df
      .agg(count(lit(1)).cast("long"),
        coalesce(expr("sum(cast(xxhash64(struct(*)) as decimal(38,0)))"),
          lit(java.math.BigDecimal.ZERO)))
      .head()
    val want = s"${fp.getLong(0)}:${fp.getDecimal(1).toPlainString}"
    val marker = java.nio.file.Paths.get(dir, "_GRAFT_EXPORT_DONE")
    if (java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker),
          java.nio.charset.StandardCharsets.UTF_8) == want) return
    df.repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(dir)
    java.nio.file.Files.write(marker,
      want.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Manifest of a partitioned snapshot: one row per partition value
    * with its file count (via `input_file_name`), row count, and total
    * text length — the publish-time audit a consumer checks against
    * the source-of-truth aggregate before trusting a snapshot. One
    * scan of the exported data, one map-side-combined aggregate. */
  def manifest(spark: SparkSession, dir: String, partitionCol: String,
               textCol: String): DataFrame =
    spark.read.parquet(dir)
      .select(col(partitionCol), input_file_name().as("__f"),
        length(col(textCol)).as("__len"))
      .groupBy(partitionCol)
      .agg(countDistinct(col("__f")).as("n_files"),
        count(lit(1)).as("n_rows"),
        sum(col("__len")).as("total_chars"))
}
