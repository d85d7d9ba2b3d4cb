package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-keyed skip markers for the deterministic fixture writers
  * (WARC/JSONL/zst-JSONL test corpora). The original markers were
  * bare existence checks, so a REGENERATED source dataset silently
  * reused stale fixture bytes and verify compared old data against a
  * fresh oracle — the failure mode the r9 ADVICE flagged on
  * Export.writeSnapshot. Same remedy here: the marker records an
  * input fingerprint (row count + order-independent SUM of per-row
  * xxhash64 — sum, not xor, so even-multiplicity changes cannot
  * cancel) plus the writer parameters that shape the output; any
  * mismatch clears the directory and rewrites. Driver-local java.nio,
  * scoped to local-filesystem fixture reuse like the writers
  * themselves. */
private[sources] object FixtureMarker {

  /** Order-independent input fingerprint + writer-parameter suffix. */
  def stamp(df: DataFrame, params: String): String = {
    val fp = df
      .agg(count(lit(1)).cast("long"),
        coalesce(expr("sum(cast(xxhash64(struct(*)) as decimal(38,0)))"),
          lit(java.math.BigDecimal.ZERO)))
      .head()
    s"${fp.getLong(0)}:${fp.getDecimal(1).toPlainString}:$params"
  }

  /** True when `dir/markerName` exists and records exactly `want`. */
  def upToDate(dir: String, markerName: String, want: String): Boolean = {
    val m = Paths.get(dir, markerName)
    Files.exists(m) &&
      new String(Files.readAllBytes(m), UTF_8) == want
  }

  /** Clear any stale fixture (the writers append one file per
    * partition, so leftovers from a different nFiles would survive a
    * plain rewrite) and ensure the directory exists. */
  def reset(dir: String): Unit = {
    val d = Paths.get(dir)
    if (Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      Files.walk(d).iterator().asScala.toSeq.reverse
        .filterNot(_ == d).foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(d)
  }

  /** [[reset]] scoped to one writer's own outputs: deletes only files
    * whose name ends with `suffix` (plus `markerName`), so sidecar
    * families sharing a directory — the Common Crawl layout puts
    * *.warc, *.warc.wet and *.warc.wat side by side — never clobber
    * each other's fixtures. */
  def resetMatching(dir: String, suffix: String,
                    markerName: String): Unit = {
    val d = Paths.get(dir)
    if (Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      Files.list(d).iterator().asScala.toSeq
        .filter(p => Files.isRegularFile(p) &&
          (p.getFileName.toString.endsWith(suffix) ||
            p.getFileName.toString == markerName))
        .foreach(Files.deleteIfExists(_))
    }
    Files.createDirectories(d)
    ()
  }

  def commit(dir: String, markerName: String, want: String): Unit =
    Files.write(Paths.get(dir, markerName), want.getBytes(UTF_8))
}
