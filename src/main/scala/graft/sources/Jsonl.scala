package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines corpus source (the other canonical training-data
  * interchange format besides WARC — The Pile, RedPajama, Dolma and
  * most HF datasets ship as JSONL).
  *
  * Unlike [[Warc]], Spark already HAS a production JSONL reader, so
  * `read` is a thin contract over `spark.read.json`: explicit schema
  * (never infer — inference is a full extra pass over 100 TB and a
  * schema drift hazard), PERMISSIVE mode with a corrupt-record column,
  * and a `parse_ok` flag so malformed lines are quarantine rows to
  * route, not exceptions — the same convention as every other source
  * here. File-level parallelism, predicate/column pruning, and
  * splittable-by-line parallel reads all come from the built-in
  * source; writing a custom parser would only lose those.
  */
object Jsonl {

  /** Fields the corpus fixture carries; `_corrupt_record` is appended
    * by [[read]]. */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("text", StringType, nullable = true)))

  /** Read a directory of `*.jsonl` files. Malformed lines yield
    * `parse_ok = false` rows whose `corrupt_raw` carries the raw line
    * for forensics; well-formed rows have `corrupt_raw` NULL. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val withCorrupt = DocSchema
      .add(StructField("_corrupt_record", StringType, nullable = true))
    spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir + "/*.jsonl")
      .select(col("doc_id"), col("source"), col("text"),
        col("_corrupt_record").isNull.as("parse_ok"),
        col("_corrupt_record").as("corrupt_raw"))
  }

  private[sources] def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** Write a documents DataFrame (`doc_id`, `source`, `text`) as a
    * deterministic JSONL fixture: `nFiles` files, docs DETERMINISTICALLY
    * HASH-DISTRIBUTED across them (the repartition hash-partitions the
    * `doc_id % nFiles` value, so key groups land in stable but
    * arbitrary files — not modulo-keyed file assignment), ascending
    * `doc_id` within each. Executor-local `FileOutputStream` writes
    * assume local mode / a shared filesystem — this is a test-fixture
    * writer, not a cluster sink (that is what `df.write.json` is
    * for). Every
    * `corruptEvery`-th doc (doc_id % corruptEvery == 0, when > 0) is
    * deliberately TRUNCATED mid-string — the quarantine-path probe.
    * Skipped when the `_GRAFT_JSONL_DONE` marker records the current
    * input fingerprint + parameters — a regenerated corpus rewrites
    * the fixture instead of silently reusing stale bytes. */
  def writeCorpus(docs: DataFrame, dir: String, nFiles: Int,
                  corruptEvery: Int = 0): Unit = {
    val want = FixtureMarker.stamp(
      docs.select(col("doc_id").cast("long"), col("source"), col("text")),
      s"n=$nFiles:ce=$corruptEvery")
    if (FixtureMarker.upToDate(dir, "_GRAFT_JSONL_DONE", want)) return
    FixtureMarker.reset(dir)
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .repartition(nFiles, pmod(col("doc_id"), lit(nFiles)))
      .sortWithinPartitions("doc_id")
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val f = new java.io.File(dir, f"part-$pid%05d.jsonl")
        val os = new BufferedOutputStream(new FileOutputStream(f))
        try rows.foreach { r =>
          val id = r.getLong(0)
          val line = s"""{"doc_id":$id,"source":"${escape(r.getString(1))}",""" +
            s""""text":"${escape(r.getString(2))}"}"""
          val out =
            if (corruptEvery > 0 && id % corruptEvery == 0)
              line.substring(0, math.max(1, line.length - 20))
            else line
          os.write(out.getBytes(UTF_8))
          os.write('\n')
        } finally os.close()
      }
    FixtureMarker.commit(dir, "_GRAFT_JSONL_DONE", want)
  }
}
