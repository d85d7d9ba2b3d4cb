package graft.sources

import java.io.{BufferedOutputStream, ByteArrayOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord source/sink with `tf.train.Example` payloads — the
  * training-data interchange format `tf.data` pipelines consume, and
  * the export target a corpus engine needs to feed TensorFlow/JAX
  * trainers without a conversion hop.
  *
  * Both layers are implemented from the PUBLIC specs, pure JVM:
  *
  *  - **Record framing** (tensorflow/core/lib/io/record_writer.h):
  *    `uint64le length, uint32le masked_crc32c(length_bytes),
  *    data[length], uint32le masked_crc32c(data)` where
  *    `mask(c) = rotr15(c) + 0xa282ead8` over uint32 and the CRC is
  *    Castagnoli CRC-32C (JDK `java.util.zip.CRC32C`).
  *  - **Payload** (tensorflow/core/example/{example,feature}.proto):
  *    `Example{ features: Features{ feature: map<string, Feature> } }`
  *    with `Feature` a oneof of `BytesList`/`FloatList`/`Int64List`,
  *    hand-encoded on the protobuf wire format (varint tags,
  *    length-delimited messages, packed scalar lists). The decoder is
  *    a real proto parser for this message shape: it accepts packed
  *    AND unpacked list encodings and skips unknown fields by wire
  *    type, so Examples written by other producers (extra features,
  *    future fields) still decode.
  *
  * Scale shape, same as [[Warc]]/[[ZstJsonl]]: TFRecord is not
  * splittable (framing is sequential), and production corpora are
  * sharded by construction (`train-00000-of-01024.tfrecord`), so the
  * FILE is the parallelism unit — `binaryFile` maps shards to tasks
  * and the parser walks each shard's bytes locally, no shuffle.
  *
  * The two CRCs split failure routing: the LENGTH crc guards framing
  * (a mismatch means record boundaries can't be trusted — one
  * quarantine row, parsing stops, same as a WARC framing loss), while
  * the DATA crc guards one record's payload (framing is still valid,
  * so THAT record quarantines and parsing continues — the flipped-bit
  * case bit-rot scrubbing exists for). A payload that fails proto
  * decoding quarantines the same way. At corpus scale bad records are
  * data to route, not exceptions to throw.
  */
object TfRecord {

  val ReadSchema: StructType = StructType(Seq(
    StructField("tfrecord_file", StringType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = true),
    StructField("int64_feats",
      MapType(StringType, ArrayType(LongType, containsNull = false)),
      nullable = true),
    StructField("float_feats",
      MapType(StringType, ArrayType(FloatType, containsNull = false)),
      nullable = true),
    StructField("bytes_feats",
      MapType(StringType, ArrayType(BinaryType, containsNull = false)),
      nullable = true),
    StructField("parse_ok", BooleanType, nullable = false),
    StructField("error", StringType, nullable = true)))

  // ---------------------------------------------------------------
  // framing
  // ---------------------------------------------------------------

  /** Masked Castagnoli CRC over `bytes[off, off+len)` — int arithmetic
    * is mod 2^32, exactly the uint32 the spec wants. */
  private[sources] def maskedCrc(bytes: Array[Byte], off: Int,
                                 len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def readIntLe(b: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(b, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt

  private def readLongLe(b: Array[Byte], off: Int): Long =
    ByteBuffer.wrap(b, off, 8).order(ByteOrder.LITTLE_ENDIAN).getLong

  /** Frame one record: length, masked length-CRC, data, masked
    * data-CRC. */
  private[sources] def frame(data: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(16 + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(data.length.toLong).array()
    out.put(lenBytes)
    out.putInt(maskedCrc(lenBytes, 0, 8))
    out.put(data)
    out.putInt(maskedCrc(data, 0, data.length))
    out.array()
  }

  /** Walk one shard's bytes; quarantine rows carry the byte offset.
    * A length-CRC failure or truncation stops the file (framing lost);
    * a data-CRC or proto failure quarantines that record and
    * continues. */
  private[sources] def parseFile(name: String,
                                 bytes: Array[Byte]): Iterator[Row] = {
    val out = scala.collection.mutable.ArrayBuffer[Row]()
    var off = 0
    var framingLost = false
    def quarantine(o: Long, len: java.lang.Long, err: String): Unit =
      out += Row(name, o, len, null, null, null, false, err)
    while (!framingLost && off < bytes.length) {
      if (off + 12 > bytes.length) {
        quarantine(off.toLong, null, "TRUNCATED header")
        framingLost = true
      } else {
        val len = readLongLe(bytes, off)
        if (readIntLe(bytes, off + 8) != maskedCrc(bytes, off, 8)) {
          quarantine(off.toLong, null, "LENGTH_CRC mismatch")
          framingLost = true
        } else if (len < 0 || len > Int.MaxValue - 16 ||
          off + 12 + len + 4 > bytes.length) {
          quarantine(off.toLong, len, "TRUNCATED record")
          framingLost = true
        } else {
          val n = len.toInt
          val dataOff = off + 12
          if (readIntLe(bytes, dataOff + n) !=
            maskedCrc(bytes, dataOff, n)) {
            quarantine(off.toLong, len, "DATA_CRC mismatch")
          } else {
            decodeExample(bytes, dataOff, n) match {
              case Right((i64, f32, bin)) =>
                out += Row(name, off.toLong, len, i64, f32, bin, true, null)
              case Left(err) =>
                quarantine(off.toLong, len, s"PROTO $err")
            }
          }
          off = dataOff + n + 4
        }
      }
    }
    out.iterator
  }

  /** Read a directory of `*.tfrecord` shards as one DataFrame.
    * File-level parallelism, no shuffle. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord").load(dir)
      .select(col("path"), col("content"))
    spark.createDataFrame(
      files.rdd.flatMap(r =>
        parseFile(r.getString(0), r.getAs[Array[Byte]](1))),
      ReadSchema)
  }

  // ---------------------------------------------------------------
  // tf.train.Example wire codec
  // ---------------------------------------------------------------
  // Field numbers from the public protos:
  //   Example.features = 1        Features.feature = 1 (map entry)
  //   map entry: key = 1, value = 2
  //   Feature.bytes_list = 1, float_list = 2, int64_list = 3
  //   BytesList.value = 1 (repeated bytes)
  //   FloatList.value = 1 (repeated float, packed)
  //   Int64List.value = 1 (repeated int64, packed)

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
                            payload: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
  }

  private def featureMsg(kindField: Int, list: Array[Byte]): Array[Byte] = {
    val f = new ByteArrayOutputStream()
    writeLenDelim(f, kindField, list)
    f.toByteArray
  }

  private def mapEntry(key: String, feature: Array[Byte]): Array[Byte] = {
    val e = new ByteArrayOutputStream()
    writeLenDelim(e, 1, key.getBytes(UTF_8))
    writeLenDelim(e, 2, feature)
    e.toByteArray
  }

  /** Encode one Example from typed feature maps. Map iteration order
    * determines wire order; pass ordered maps for deterministic
    * fixtures. */
  private[sources] def encodeExample(
      int64Feats: Seq[(String, Seq[Long])],
      floatFeats: Seq[(String, Seq[Float])],
      bytesFeats: Seq[(String, Seq[Array[Byte]])]): Array[Byte] = {
    val features = new ByteArrayOutputStream()
    bytesFeats.foreach { case (k, vs) =>
      val bl = new ByteArrayOutputStream()
      vs.foreach(v => writeLenDelim(bl, 1, v))
      writeLenDelim(features, 1, mapEntry(k, featureMsg(1, bl.toByteArray)))
    }
    floatFeats.foreach { case (k, vs) =>
      val packed = ByteBuffer.allocate(4 * vs.length)
        .order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(packed.putFloat)
      val fl = new ByteArrayOutputStream()
      writeLenDelim(fl, 1, packed.array())
      writeLenDelim(features, 1, mapEntry(k, featureMsg(2, fl.toByteArray)))
    }
    int64Feats.foreach { case (k, vs) =>
      val packed = new ByteArrayOutputStream()
      vs.foreach(writeVarint(packed, _))
      val il = new ByteArrayOutputStream()
      writeLenDelim(il, 1, packed.toByteArray)
      writeLenDelim(features, 1, mapEntry(k, featureMsg(3, il.toByteArray)))
    }
    // map entries are Features.feature (field 1); Features is
    // Example.features (field 1)
    val ex = new ByteArrayOutputStream()
    writeLenDelim(ex, 1, features.toByteArray)
    ex.toByteArray
  }

  /** Minimal real proto parser for the Example shape. Returns the
    * three typed maps or a parse error. Unknown fields skip by wire
    * type; packed and unpacked list encodings both decode. */
  private[sources] def decodeExample(bytes: Array[Byte], start: Int,
      len: Int): Either[String, (Map[String, Seq[Long]],
        Map[String, Seq[Float]], Map[String, Seq[Array[Byte]]])] = try {
    val end = start + len
    var pos = start

    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        if (pos >= end || shift > 63) throw Malformed("varint overrun")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    def lenDelim(): (Int, Int) = {
      val n = varint()
      if (n < 0 || pos + n > end) throw Malformed("length overrun")
      val r = (pos, n.toInt); pos += n.toInt; r
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => pos += 8; if (pos > end) throw Malformed("fixed64 overrun")
      case 2 => lenDelim(); ()
      case 5 => pos += 4; if (pos > end) throw Malformed("fixed32 overrun")
      case t => throw Malformed(s"unsupported wire type $t")
    }
    // parse a message span, dispatching each (field, wireType)
    def message(from: Int, n: Int)(
        handle: (Int, Int) => Boolean): Unit = {
      val savedPos = pos
      pos = from
      val stop = from + n
      while (pos < stop) {
        val tag = varint()
        val field = (tag >>> 3).toInt
        val wt = (tag & 7).toInt
        if (!handle(field, wt)) skip(wt)
      }
      if (pos != stop) throw Malformed("message overrun")
      pos = savedPos
    }

    val i64 = scala.collection.mutable.LinkedHashMap[String, Seq[Long]]()
    val f32 = scala.collection.mutable.LinkedHashMap[String, Seq[Float]]()
    val bin =
      scala.collection.mutable.LinkedHashMap[String, Seq[Array[Byte]]]()

    def parseFeature(key: String, from: Int, n: Int): Unit =
      message(from, n) {
        case (1, 2) => // BytesList
          val (o, m) = lenDelim()
          val vs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
          message(o, m) {
            case (1, 2) =>
              val (vo, vn) = lenDelim()
              vs += java.util.Arrays.copyOfRange(bytes, vo, vo + vn)
              true
            case _ => false
          }
          bin(key) = bin.getOrElse(key, Seq.empty) ++ vs
          true
        case (2, 2) => // FloatList (packed or a nested parse of unpacked)
          val (o, m) = lenDelim()
          val vs = scala.collection.mutable.ArrayBuffer[Float]()
          message(o, m) {
            case (1, 2) => // packed payload
              val (po, pn) = lenDelim()
              if (pn % 4 != 0) throw Malformed("packed float size")
              val bb = ByteBuffer.wrap(bytes, po, pn)
                .order(ByteOrder.LITTLE_ENDIAN)
              while (bb.remaining() >= 4) vs += bb.getFloat
              true
            case (1, 5) => // unpacked element
              if (pos + 4 > end) throw Malformed("float overrun")
              vs += ByteBuffer.wrap(bytes, pos, 4)
                .order(ByteOrder.LITTLE_ENDIAN).getFloat
              pos += 4
              true
            case _ => false
          }
          f32(key) = f32.getOrElse(key, Seq.empty) ++ vs
          true
        case (3, 2) => // Int64List
          val (o, m) = lenDelim()
          val vs = scala.collection.mutable.ArrayBuffer[Long]()
          message(o, m) {
            case (1, 2) => // packed payload: raw varints, no tags
              val (po, pn) = lenDelim()
              val saved = pos; pos = po
              while (pos < po + pn) vs += varint()
              if (pos != po + pn) throw Malformed("packed int64 overrun")
              pos = saved
              true
            case (1, 0) => vs += varint(); true
            case _ => false
          }
          i64(key) = i64.getOrElse(key, Seq.empty) ++ vs
          true
        case _ => false
      }

    def parseMapEntry(from: Int, n: Int): Unit = {
      var key: String = null
      var featSpan: (Int, Int) = null
      message(from, n) {
        case (1, 2) =>
          val (o, m) = lenDelim()
          key = new String(bytes, o, m, UTF_8)
          true
        case (2, 2) =>
          featSpan = lenDelim()
          true
        case _ => false
      }
      if (key != null && featSpan != null)
        parseFeature(key, featSpan._1, featSpan._2)
    }

    message(start, len) { // Example
      case (1, 2) => // Features
        val (fo, fn) = lenDelim()
        message(fo, fn) {
          case (1, 2) => // one map entry
            val (eo, en) = lenDelim()
            parseMapEntry(eo, en)
            true
          case _ => false
        }
        true
      case _ => false
    }
    Right((i64.toMap, f32.toMap, bin.toMap))
  } catch {
    case Malformed(m) => Left(m)
    // any other defect in hostile bytes quarantines the record — at
    // corpus scale bad records are data to route, never a task failure
    case scala.util.control.NonFatal(e) =>
      Left(e.getClass.getSimpleName)
  }

  private case class Malformed(msg: String) extends RuntimeException(msg)

  // ---------------------------------------------------------------
  // writers
  // ---------------------------------------------------------------

  /** Write ANY DataFrame as deterministic `.tfrecord` Example shards —
    * the real sink, schema-driven: integral columns (and long arrays)
    * become Int64List features, float columns (and float arrays)
    * FloatList, string/binary columns BytesList; a NULL value simply
    * omits the feature (reading back, `element_at` then yields null —
    * the proto-idiomatic representation of absence). Shards are
    * hash-distributed by `shardKey % nFiles` with ascending key order
    * within each (the `Warc.writeCorpus` contract). Every
    * `corruptEvery`-th key gets one payload byte flipped AFTER the
    * CRCs are computed — the bit-rot probe; [[read]] must quarantine
    * exactly those records and keep the rest of the shard. Executor-
    * local file writes: local-mode fixture/export writer like the
    * WARC/JSONL ones. */
  def writeExamples(df: DataFrame, dir: String, nFiles: Int,
                    shardKey: String, corruptEvery: Int = 0): Unit = {
    val fields = df.schema.fields
    fields.foreach { f =>
      f.dataType match {
        case LongType | IntegerType | FloatType | StringType |
             BinaryType => ()
        case ArrayType(FloatType, _) | ArrayType(LongType, _) => ()
        case t => throw new IllegalArgumentException(
          s"column ${f.name}: $t has no tf.train.Feature mapping " +
            "(cast doubles to float and decimals to long explicitly)")
      }
    }
    val keyIdx = df.schema.fieldIndex(shardKey)
    require(Seq(LongType, IntegerType).contains(fields(keyIdx).dataType),
      s"shardKey $shardKey must be integral")
    val schemaTag = fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    val want =
      FixtureMarker.stamp(df, s"n=$nFiles:ce=$corruptEvery:$schemaTag")
    if (FixtureMarker.upToDate(dir, "_GRAFT_TFRECORD_DONE", want)) return
    FixtureMarker.reset(dir)
    df.repartition(nFiles, pmod(col(shardKey).cast("long"), lit(nFiles)))
      .sortWithinPartitions(shardKey)
      .foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        val f = new java.io.File(dir, f"part-$pid%05d.tfrecord")
        val os = new BufferedOutputStream(new FileOutputStream(f))
        try rows.foreach { r =>
          val i64 = scala.collection.mutable.ArrayBuffer[(String, Seq[Long])]()
          val f32 = scala.collection.mutable.ArrayBuffer[(String, Seq[Float])]()
          val bin =
            scala.collection.mutable.ArrayBuffer[(String, Seq[Array[Byte]])]()
          var i = 0
          while (i < fields.length) {
            if (!r.isNullAt(i)) fields(i).dataType match {
              case LongType => i64 += fields(i).name -> Seq(r.getLong(i))
              case IntegerType =>
                i64 += fields(i).name -> Seq(r.getInt(i).toLong)
              case ArrayType(LongType, _) =>
                i64 += fields(i).name -> r.getSeq[Long](i).toSeq
              case FloatType => f32 += fields(i).name -> Seq(r.getFloat(i))
              case ArrayType(FloatType, _) =>
                f32 += fields(i).name -> r.getSeq[Float](i).toSeq
              case StringType =>
                bin += fields(i).name -> Seq(r.getString(i).getBytes(UTF_8))
              case _ =>
                bin += fields(i).name -> Seq(r.getAs[Array[Byte]](i))
            }
            i += 1
          }
          val rec = frame(encodeExample(i64.toSeq, f32.toSeq, bin.toSeq))
          val key =
            if (fields(keyIdx).dataType == LongType) r.getLong(keyIdx)
            else r.getInt(keyIdx).toLong
          if (corruptEvery > 0 && key % corruptEvery == 0) {
            // flip a bit in the payload region (after the 12 framing
            // bytes, before the trailing data CRC)
            rec(12 + (rec.length - 16) / 2) =
              (rec(12 + (rec.length - 16) / 2) ^ 0x40).toByte
          }
          os.write(rec)
        } finally os.close()
        ()
      }
    FixtureMarker.commit(dir, "_GRAFT_TFRECORD_DONE", want)
  }

  /** The documents-table convenience face of [[writeExamples]]:
    * (doc_id, source, text[, embedding]) with canonical casts. */
  def writeCorpus(docs: DataFrame, dir: String, nFiles: Int,
                  corruptEvery: Int = 0): Unit = {
    val hasEmb = docs.columns.contains("embedding")
    val base = docs.select(
      (col("doc_id").cast("long").as("doc_id") +:
        col("source").cast("string").as("source") +:
        col("text").cast("string").as("text") +:
        (if (hasEmb)
          Seq(col("embedding").cast(ArrayType(FloatType)).as("embedding"))
        else Seq.empty)): _*)
    writeExamples(base, dir, nFiles, shardKey = "doc_id",
      corruptEvery = corruptEvery)
  }
}
