package graft.sources

import java.io.{BufferedOutputStream, BufferedReader, ByteArrayInputStream, FileOutputStream, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Zstandard-compressed JSONL corpus source (`*.jsonl.zst`) — the
  * format modern crawl dumps actually ship in (RedPajama, Dolma, and
  * most post-2022 HF corpus releases are zstd shards; The Pile is
  * `.jsonl.zst` end to end).
  *
  * Spark's text/json readers delegate decompression to Hadoop's
  * `ZStandardCodec`, which requires the NATIVE Hadoop library — absent
  * in plain-JVM deployments (this container included: NativeCodeLoader
  * falls back to builtin-java classes, which have no zstd). The JVM
  * `zstd-jni` library ships with Spark itself (it backs parquet/shuffle
  * zstd), so this source decodes shards through `ZstdInputStream`
  * directly:
  *
  *  - **File-parallel**: one task per shard via the `binaryFile`
  *    source — zstd is not line-splittable, and crawl dumps are
  *    sharded by construction (thousands of ~100-500 MB files), so
  *    the shard IS the natural parallelism unit, exactly like [[Warc]].
  *    The task holds only the COMPRESSED bytes (binaryFile's 2 GB/file
  *    ceiling bounds them); the decompressed stream is consumed line
  *    by line, never materialized.
  *  - **Same parse contract as [[Jsonl]]**: explicit schema (no
  *    inference pass), malformed lines become `parse_ok = false`
  *    quarantine rows carrying the raw line.
  *  - **Framing loss is quarantined, not thrown**: a truncated or
  *    corrupt zstd frame surfaces as one `parse_ok = false` row whose
  *    `corrupt_raw` is `_ZSTD_FRAME_ERROR <path>: <message>`; lines
  *    decoded before the damage are kept — the [[Warc]] convention.
  */
object ZstJsonl {

  /** Read a directory of `*.jsonl.zst` shards into the [[Jsonl]]
    * output shape: (doc_id, source, text, parse_ok, corrupt_raw). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jsonl.zst").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { files =>
        files.flatMap { case (path, bytes) =>
          // LAZY line iterator: the task holds the compressed bytes
          // (binaryFile already materialized those) plus ONE decoded
          // line at a time — never the whole decompressed shard, which
          // at crawl-dump ratios (3-6x over 100-500 MB files) would be
          // gigabytes of Strings. A frame error surfaces as one final
          // quarantine element; lines decoded before the damage were
          // already emitted.
          val in = new BufferedReader(new InputStreamReader(
            new com.github.luben.zstd.ZstdInputStream(
              new ByteArrayInputStream(bytes)), UTF_8))
          new Iterator[(String, Boolean)] {
            private var pending: (String, Boolean) = _
            private var closed = false
            private def advance(): Unit = {
              if (closed) { pending = null; return }
              pending =
                try {
                  val line = in.readLine()
                  if (line == null) { in.close(); closed = true; null }
                  else (line, false)
                } catch {
                  case e: java.io.IOException =>
                    in.close(); closed = true
                    (s"_ZSTD_FRAME_ERROR $path: ${e.getMessage}", true)
                }
            }
            advance()
            override def hasNext: Boolean = pending != null
            override def next(): (String, Boolean) = {
              val r = pending; advance(); r
            }
          }
        }
      }.toDF("line", "frame_error")
    // the corrupt-record channel makes malformed-line detection exact:
    // from_json in PERMISSIVE mode may PARTIALLY fill fields parsed
    // before the damage, so j-is-null alone under-reports corruption
    val withCorrupt = Jsonl.DocSchema
      .add(org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType, nullable = true))
    val parsed = from_json(col("line"), withCorrupt,
      Map("mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt_record"))
    val ok = !col("frame_error") && col("j").isNotNull &&
      col("j._corrupt_record").isNull
    lines.select(parsed.as("j"), col("line"), col("frame_error"))
      .select(
        when(ok, col("j.doc_id")).as("doc_id"),
        when(ok, col("j.source")).as("source"),
        when(ok, col("j.text")).as("text"),
        ok.as("parse_ok"),
        when(!ok, col("line")).as("corrupt_raw"))
  }

  /** Write a documents DataFrame as a deterministic `.jsonl.zst`
    * fixture — [[Jsonl.writeCorpus]]'s contract (hash-distributed
    * shards, ascending doc_id within each, every `corruptEvery`-th doc
    * truncated mid-string INSIDE a valid frame), compressed through
    * `ZstdOutputStream`. `truncateShard >= 0` additionally chops that
    * shard's FILE to 8 bytes after writing — the frame-damage probe
    * (its lines are lost; [[read]] must quarantine, not throw).
    * Local-mode test-fixture writer, like the JSONL one. */
  def writeCorpus(docs: DataFrame, dir: String, nFiles: Int,
                  corruptEvery: Int = 0, truncateShard: Int = -1): Unit = {
    val want = FixtureMarker.stamp(
      docs.select(col("doc_id").cast("long"), col("source"), col("text")),
      s"n=$nFiles:ce=$corruptEvery:tr=$truncateShard")
    if (FixtureMarker.upToDate(dir, "_GRAFT_ZSTJSONL_DONE", want)) return
    FixtureMarker.reset(dir)
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .repartition(nFiles, pmod(col("doc_id"), lit(nFiles)))
      .sortWithinPartitions("doc_id")
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val f = new java.io.File(dir, f"part-$pid%05d.jsonl.zst")
        val os = new com.github.luben.zstd.ZstdOutputStream(
          new BufferedOutputStream(new FileOutputStream(f)))
        try rows.foreach { r =>
          val id = r.getLong(0)
          val line =
            s"""{"doc_id":$id,"source":"${Jsonl.escape(r.getString(1))}",""" +
              s""""text":"${Jsonl.escape(r.getString(2))}"}"""
          val out =
            if (corruptEvery > 0 && id % corruptEvery == 0)
              line.substring(0, math.max(1, line.length - 20))
            else line
          os.write(out.getBytes(UTF_8))
          os.write('\n')
        } finally os.close()
        if (pid == truncateShard) {
          val ch = java.nio.channels.FileChannel.open(f.toPath,
            java.nio.file.StandardOpenOption.WRITE)
          try ch.truncate(8L) finally ch.close()
        }
        ()
      }
    FixtureMarker.commit(dir, "_GRAFT_ZSTJSONL_DONE", want)
  }
}
