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

  // ---- Versioned corpus (time travel) ----
  //
  // Layout: dir/v0/ = the base snapshot; dir/changes/v{k}/ = change
  // batch k (rows carrying the snapshot columns + an op column);
  // dir/_graft_versions.json = the version-stamped manifest, one JSON
  // line per version {"version","kind","path","rows"} appended at
  // write time. readSnapshot(dir, k) reconstructs ANY release with ONE
  // corpus-sized exchange (Checks.snapshotAt log-compaction), not k
  // sequential merges. Manifest IO is driver-local java.nio, same
  // scope note as writeSnapshot's marker: a cluster deployment keys
  // this on a transactional catalog instead.

  private def versionsManifest(dir: String) =
    java.nio.file.Paths.get(dir, "_graft_versions.json")

  /** Write the version-0 base snapshot; truncates the manifest AND
    * clears any prior change batches — a re-based corpus must not
    * leave stale changes/v{k} dirs that would wedge the next
    * appendChangeBatch (errorifexists on an orphaned path). */
  def writeVersionedBase(df: DataFrame, dir: String): Unit = {
    val n = df.count()
    df.write.mode("overwrite").parquet(s"$dir/v0")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val changes = java.nio.file.Paths.get(dir, "changes")
    if (java.nio.file.Files.exists(changes)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(changes).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    java.nio.file.Files.write(versionsManifest(dir),
      (s"""{"version":0,"kind":"base","path":"v0","rows":$n}""" + "\n")
        .getBytes("UTF-8"))
  }

  /** Append the next change batch (snapshot columns + `opCol`);
    * returns its version number. */
  def appendChangeBatch(changes: DataFrame, dir: String): Int = {
    val v = versions(dir).max + 1
    val n = changes.count()
    changes.write.mode("errorifexists").parquet(s"$dir/changes/v$v")
    java.nio.file.Files.write(versionsManifest(dir),
      (s"""{"version":$v,"kind":"changes","path":"changes/v$v","rows":$n}""" +
        "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    v
  }

  /** Versions recorded in the manifest, ascending (0 = base). */
  def versions(dir: String): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    val p = versionsManifest(dir)
    require(java.nio.file.Files.exists(p), s"no versioned corpus at $dir")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    java.nio.file.Files.readAllLines(p).asScala
      .filter(_.trim.nonEmpty)
      .map(l => mapper.readTree(l).get("version").asInt()).toSeq.sorted
  }

  /** Reconstruct the snapshot AT `version` (default: latest): base +
    * change batches 1..version via the single-exchange compaction. */
  def readSnapshot(spark: SparkSession, dir: String,
                   version: Int = Int.MaxValue,
                   idCol: String = "doc_id",
                   opCol: String = "op"): DataFrame = {
    val vs = versions(dir)
    val target = if (version == Int.MaxValue) vs.max else version
    require(vs.contains(target), s"version $target not in $vs")
    val base = spark.read.parquet(s"$dir/v0")
    val batches = (1 to target)
      .map(k => spark.read.parquet(s"$dir/changes/v$k"))
    graft.operators.Checks.snapshotAt(base, batches, idCol, opCol)
  }
}
