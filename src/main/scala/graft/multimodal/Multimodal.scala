package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Convention: media travel as opaque `binary` columns with a typed
  * metadata struct (`media_meta`): modality, mime, width/height/
  * duration, source URI. Decode / feature-extraction runs as a
  * partition-parallel pass over the binary payloads (the Scala
  * equivalent of `mapInPandas`: one iterator per partition, batch-shaped
  * work inside) so adding a real codec later only swaps the kernel.
  *
  * Images decode for REAL through `javax.imageio` (PNG/JPEG/BMP/GIF —
  * [[decodeImageStats]]), audio decodes for REAL through
  * `javax.sound.sampled` (WAV/PCM — [[decodeWavStats]]), and video
  * decodes for REAL for the animated-GIF container
  * ([[decodeGifFrameStats]] / [[withVideoFrameStats]]: multi-frame
  * decode + stride frame-sampling through `javax.imageio`'s GIF
  * reader). MP4 and WebM container METADATA are real too
  * ([[parseMp4Meta]]: ISO-BMFF box walk; [[parseWebmMeta]]: EBML
  * element walk; [[withVideoMeta]] sniffs and routes — brand,
  * duration, track dims from pure struct reads, no codec needed);
  * only MP4/WebM frame/sample decode still goes through [[DecodeStub]]
  * (this container carries no ffmpeg). The schema, partitioning and
  * batch plumbing are identical across real and stubbed kernels, so a
  * deployment swaps only the kernel. Undecodable payloads route to a
  * quarantine side ([[routeUndecodable]]) instead of failing the job.
  */
object Multimodal {

  /** Typed metadata carried next to every binary media column. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("modality", StringType),   // image | audio | video
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("source_uri", StringType)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("media_meta", MediaMetaType)))

  /** STUB decode kernel: deterministic pseudo-features from payload
    * bytes. A real deployment replaces ONLY this function with a codec
    * call (JNI/ffmpeg/ImageIO); everything around it stays. */
  object DecodeStub {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      // xorshift over a byte-derived seed -> deterministic fake embedding
      var s: Long = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < payload.length) { s = (s ^ payload(i)) * 0x100000001B3L; i += 1 }
      val out = new Array[Float](dim)
      var j = 0
      var x = if (s == 0) 1L else s
      while (j < dim) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        out(j) = (x.toDouble / Long.MaxValue).toFloat
        j += 1
      }
      out
    }

    /** Stub "resize": deterministic byte subsample to maxBytes. */
    def resize(payload: Array[Byte], maxBytes: Int): Array[Byte] =
      if (payload.length <= maxBytes) payload
      else {
        val stride = payload.length.toDouble / maxBytes
        Array.tabulate(maxBytes)(i => payload((i * stride).toInt))
      }

    /** Stub "frame sample": split payload into `frames` equal chunks
      * and take the first `bytesPerFrame` of each. */
    def frameSample(payload: Array[Byte], frames: Int,
                    bytesPerFrame: Int): Array[Array[Byte]] = {
      val chunk = math.max(1, payload.length / math.max(1, frames))
      Array.tabulate(math.min(frames, math.max(1, payload.length / chunk))) { f =>
        payload.slice(f * chunk, f * chunk + math.min(bytesPerFrame, chunk))
      }
    }
  }

  /** REAL image codec: decode a PNG/BMP/GIF payload via `javax.imageio`
    * and return (width, height, per-channel means). Deterministic —
    * PNG truecolor is lossless and ImageIO's decode is exact, so the
    * stats are oracle-checkable. Returns None for null/undecodable
    * payloads (a real pipeline would route those to a quarantine sink). */
  def decodeImageStats(payload: Array[Byte])
    : Option[(Int, Int, Double, Double, Double)] = {
    if (payload == null) return None
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
  }

  /** Partition-parallel REAL decode: adds width/height/channel-mean
    * columns from the binary payload (javax.imageio). Same mapPartitions
    * batch shape as the stub path — swapping in the real codec replaces
    * ONLY the kernel, which was the point of the plumbing design.
    * Undecodable rows get null stats. */
  def withImageStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("mean_r", DoubleType), StructField("mean_g", DoubleType),
      StructField("mean_b", DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        decodeImageStats(r.getAs[Array[Byte]](idx)) match {
          case Some((w, h, mr, mg, mb)) =>
            // Seq[Any], NOT Seq(...): Scala numeric widening would unify
            // the mixed Int/Double elements to Seq[Double] and silently
            // box the widths as Doubles, breaking the Row encoder
            Row.fromSeq(r.toSeq ++ Seq[Any](w, h, mr, mg, mb))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** Quarantine routing: annotate with decode results, then split into
    * (decoded, quarantined). A corrupt or truncated payload — inevitable
    * at 100 TB — must never fail the job OR silently poison downstream
    * stats; it routes to the quarantine side for reprocessing/audit.
    * The split is two filters over ONE decode plan: persist the
    * annotated frame (or write it once and filter the table) on a real
    * cluster so the codec pass runs once, not twice. */
  def routeUndecodable(df: DataFrame, payloadCol: String)
    : (DataFrame, DataFrame) = {
    val annotated = withImageStats(df, payloadCol)
    (annotated.filter(col("width").isNotNull),
      annotated.filter(col("width").isNull)
        .select(df.columns.map(col): _*))
  }

  /** REAL audio codec: decode a WAV payload via `javax.sound.sampled`
    * and return (channels, sampleRate, frames, per-channel mean |s|
    * over the raw signed-16-bit samples). Integer sums, so the stats
    * are exact rationals — oracle-checkable the same way the PNG pixel
    * means are. Returns None for null / undecodable / non-16-bit-PCM
    * payloads (quarantine-routed by callers, never a job failure). */
  def decodeWavStats(payload: Array[Byte])
    : Option[(Int, Int, Long, Array[Double])] = {
    if (payload == null) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val channels = fmt.getChannels
        val bytes = ais.readAllBytes()
        val frames = bytes.length / (2 * channels)
        if (frames == 0) return None
        val sums = new Array[Long](channels)
        var t = 0; var i = 0
        while (t < frames) {
          var c = 0
          while (c < channels) {
            val v: Short =
              if (fmt.isBigEndian)
                (((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)).toShort
              else (((bytes(i + 1) & 0xFF) << 8) | (bytes(i) & 0xFF)).toShort
            sums(c) += math.abs(v.toLong)
            i += 2; c += 1
          }
          t += 1
        }
        Some((channels, math.round(fmt.getSampleRate), frames.toLong,
          sums.map(_.toDouble / frames)))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Partition-parallel REAL audio decode: one output row per channel
    * (channels / sample_rate / n_frames / channel / mean_abs) from the
    * binary WAV payload. Same mapPartitions batch shape as the image
    * path; undecodable rows emit a single all-null stats row so
    * quarantine routing works identically. */
  def withAudioStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", LongType),
      StructField("channel", IntegerType),
      StructField("mean_abs", DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWavStats(r.getAs[Array[Byte]](idx)) match {
          case Some((ch, sr, nf, means)) =>
            means.iterator.zipWithIndex.map { case (m, c) =>
              Row.fromSeq(r.toSeq ++ Seq[Any](ch, sr, nf, c, m))
            }
          case None =>
            Iterator.single(
              Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null)))
        }
      }
    }(enc)
  }

  /** Deterministic synthetic WAV for id: PCM signed 16-bit
    * little-endian, 8 kHz, `1 + id % 2` channels,
    * `400 + (id % 5) * 40` frames; sample (t, c) =
    * `((31t + 17c + 7 id) % 4001) - 2000`. The integer formula is
    * reproducible in closed-form SQL, so decoded per-channel mean
    * amplitudes check end-to-end through the REAL codec — the audio
    * analogue of [[syntheticPng]]. */
  def syntheticWav(id: Long): Array[Byte] = {
    val channels = (1 + id % 2).toInt
    val frames = (400 + (id % 5) * 40).toInt
    val data = new Array[Byte](frames * channels * 2)
    var t = 0; var i = 0
    while (t < frames) {
      var c = 0
      while (c < channels) {
        val v = ((31L * t + 17L * c + 7L * id) % 4001L - 2000L).toShort
        data(i) = (v & 0xFF).toByte
        data(i + 1) = ((v >> 8) & 0xFF).toByte
        i += 2; c += 1
      }
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, channels,
      true, false) // signed, little-endian
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Shared scaffold for every synthetic media builder: one
    * deterministic payload per id, encoded partition-parallel (no
    * driver-side generation), (media_id, payload) schema. */
  private def mediaOf(ids: DataFrame, idCol: String)(
      build: Long => Array[Byte]): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("payload", BinaryType)))
    val idx = ids.schema.fieldIndex(idCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    ids.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idx)
        Row(id, build(id))
      }
    }(enc)
  }

  /** Shared scaffold for the perceptual-fingerprint passes: adds a
    * nullable `dhash` long column (null = undecodable, for quarantine
    * routing), partition-parallel, no shuffle. */
  private def withFingerprint(df: DataFrame, payloadCol: String)(
      f: Array[Byte] => Option[Long]): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("dhash", LongType))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        f(r.getAs[Array[Byte]](idx)) match {
          case Some(v) => Row.fromSeq(r.toSeq :+ (v: Any))
          case None    => Row.fromSeq(r.toSeq :+ null)
        }
      }
    }(enc)
  }

  /** Ingest-shaped synthetic audio table: one deterministic WAV per id,
    * encoded partition-parallel (no driver-side generation) — the audio
    * analogue of [[syntheticPngMedia]]. */
  def syntheticWavMedia(ids: DataFrame, idCol: String): DataFrame =
    mediaOf(ids, idCol)(syntheticWav)

  /** 64-bit perceptual audio fingerprint — the audio analogue of
    * [[dHash64]], in the spirit of Haitsma-Kalker sub-fingerprints:
    * decode to mono (channel SUM — scale-free under the sign
    * comparisons below), split into 9 equal time slices, measure
    * energy in 8 fixed frequency bands per slice (Goertzel probes at
    * ABSOLUTE frequencies 400·(j+1) Hz — the coefficient is computed
    * from the payload's own sample rate, so the same audio stored at
    * 8 kHz and resampled to 16 kHz lands on the same bands), and emit
    * one bit per temporally-adjacent energy pair per band (set when
    * the later slice is louder in that band). A volume change scales
    * every energy by g^2 and flips nothing; a re-encode, container
    * change, or resample preserves the band energies — exactly the
    * copies byte-level dedup misses. Rates below 6.4 kHz put the top
    * bands past Nyquist (they alias, deterministically — same-rate
    * copies still match; cross-rate matching needs fs >= 6.4 kHz).
    *
    * Deterministic across platforms: band coefficients come from
    * `StrictMath.cos` (JVM `Math.cos` may use platform intrinsics),
    * and the Goertzel recurrence is plain IEEE double arithmetic.
    * Returns None for null / undecodable / non-16-bit-PCM payloads
    * and for clips shorter than 9 frames (quarantine routing decides
    * those rows). */
  def audioDHash64(payload: Array[Byte]): Option[Long] = {
    if (payload == null) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          return None
        val channels = fmt.getChannels
        val fs = fmt.getSampleRate.toDouble
        if (!(fs > 0.0) || fs.isNaN) return None
        val bytes = ais.readAllBytes()
        val frames = bytes.length / (2 * channels)
        if (frames < 9) return None
        val mono = new Array[Double](frames)
        var t = 0; var i = 0
        while (t < frames) {
          var s = 0L
          var c = 0
          while (c < channels) {
            val v: Short =
              if (fmt.isBigEndian)
                (((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)).toShort
              else (((bytes(i + 1) & 0xFF) << 8) | (bytes(i) & 0xFF)).toShort
            s += v.toLong
            i += 2; c += 1
          }
          mono(t) = s.toDouble
          t += 1
        }
        // absolute 400·(j+1) Hz probes: at the 8 kHz fixture rate this
        // is exactly the normalized (j+1)/20 grid, so existing
        // fingerprints are bit-identical; other rates now land the
        // SAME frequencies instead of rate-relative ones
        val coeffs = Array.tabulate(8) { j =>
          2.0 * StrictMath.cos(2.0 * StrictMath.PI * 400.0 * (j + 1) / fs)
        }
        val power = Array.ofDim[Double](9, 8)
        var sl = 0
        while (sl < 9) {
          val t0 = sl * frames / 9
          val t1 = math.max(t0 + 1, (sl + 1) * frames / 9)
          var j = 0
          while (j < 8) {
            val k = coeffs(j)
            var s1 = 0.0; var s2 = 0.0
            var u = t0
            while (u < t1) {
              val s0 = mono(u) + k * s1 - s2
              s2 = s1; s1 = s0
              u += 1
            }
            power(sl)(j) = s1 * s1 + s2 * s2 - k * s1 * s2
            j += 1
          }
          sl += 1
        }
        var hash = 0L
        var b = 0
        var j = 0
        while (j < 8) {
          var s = 0
          while (s < 8) {
            if (power(s + 1)(j) > power(s)(j)) hash |= 1L << b
            b += 1
            s += 1
          }
          j += 1
        }
        Some(hash)
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Partition-parallel audio-fingerprint pass: adds a nullable
    * `dhash` long column (same contract as [[withDHash]]). */
  def withAudioDHash(df: DataFrame, payloadCol: String): DataFrame =
    withFingerprint(df, payloadCol)(audioDHash64)

  /** Perceptual audio near-duplicate pairs: [[audioDHash64]] each
    * payload, then the shared banded Hamming LSH
    * ([[graft.operators.Dedup.hamming64DupPairs]]). Catches
    * volume-shifted / re-encoded copies. Same 100-TB shape as
    * [[imageDupPairs]]: decode never shuffles, only (id, 8-byte
    * fingerprint) rows move. */
  def audioDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                    maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val hashed = withAudioDHash(df.select(col(idCol), col(payloadCol)),
      payloadCol)
      .filter(col("dhash").isNotNull)
      .select(col(idCol), col("dhash"))
    graft.operators.Dedup.hamming64DupPairs(
      hashed, idCol, "dhash", maxHamming, maxBucket)
  }

  /** Deterministic synthetic WAV with id-dependent SPECTRUM — the
    * fingerprint fixture ([[syntheticWav]]'s sawtooth differs across
    * ids only by phase, so every clip has the same band energies and
    * perceptual hashes would collapse into one cluster): three
    * `StrictMath.sin` partials at id-selected band frequencies
    * (multiples of 400 Hz — centered on the Goertzel probe bands),
    * each with its own id-dependent cosine amplitude envelope so the
    * temporal bits discriminate too. Mono, 8 kHz, 1800 frames.
    * `gain` scales every sample (the planted volume-shift variant:
    * different bytes, near-identical fingerprint). */
  def syntheticWavId(id: Long, gain: Double = 1.0,
                     sampleRate: Int = 8000): Array[Byte] = {
    // the signal is a continuous-time function sampled at `sampleRate`
    // (frame count scales to keep the 0.225 s duration), so two rates
    // are true resampled copies of the SAME audio — the cross-rate
    // fingerprint fixture
    val frames = 1800 * sampleRate / 8000
    val f = Array(400.0 * (1 + id % 8), 400.0 * (1 + (id / 8) % 8),
      400.0 * (1 + (id / 64) % 8))
    val amp = Array(6000.0, 4000.0, 2500.0)
    val data = new Array[Byte](frames * 2)
    var t = 0
    while (t < frames) {
      var s = 0.0
      var k = 0
      while (k < 3) {
        val env = 0.5 * (1.0 + StrictMath.cos(
          2.0 * StrictMath.PI * t * ((id + k) % 3 + 1) / frames +
            0.7 * ((id + 2 * k) % 5)))
        s += amp(k) * env *
          StrictMath.sin(2.0 * StrictMath.PI * f(k) * t / sampleRate)
        k += 1
      }
      val v = math.max(-32768.0, math.min(32767.0,
        StrictMath.rint(gain * s))).toInt.toShort
      data(2 * t) = (v & 0xFF).toByte
      data(2 * t + 1) = ((v >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** (media_id, payload) frame of id-spectrum WAVs; `gain` applies to
    * every clip (the volume-shift variant generator). */
  def syntheticWavIdMedia(ids: DataFrame, idCol: String,
                          gain: Double = 1.0): DataFrame =
    mediaOf(ids, idCol)(syntheticWavId(_, gain))

  /** One decoded GIF frame: dims, mean gray level, and the frame's
    * display delay from its GraphicControlExtension (real metadata,
    * not a fabricated duration). */
  final case class GifFrame(width: Int, height: Int, meanGray: Double,
                            delayMs: Int)

  /** REAL video codec (animated-GIF container): decode every frame via
    * `javax.imageio`'s multi-frame GIF reader and return per-frame
    * (width, height, mean gray level, delay). GIF is palette-indexed
    * and lossless, so for grayscale frames the mean is an exact
    * rational — oracle-checkable like the PNG/WAV paths. Returns None
    * for null / undecodable payloads (quarantine-routed by callers).
    *
    * `read(f)` returns the RAW per-frame patch, not a composite: a GIF
    * using sub-rectangle/disposal optimization would yield patch-sized
    * dims and a wrong mean. Such frames are DETECTED (ImageDescriptor
    * offset != 0, or dims below the logical screen) and the whole
    * payload routes to quarantine rather than returning silently wrong
    * stats — stats here are exact or absent, never approximate. */
  def decodeGifFrameStats(payload: Array[Byte])
    : Option[Array[GifFrame]] = {
    if (payload == null) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); return None }
      val reader = readers.next()
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        // logical screen size from the stream metadata: the reference
        // frame geometry every frame must fill for read(f) to be exact
        var screenW = -1
        var screenH = -1
        val smeta = reader.getStreamMetadata
        if (smeta != null) {
          val sroot = smeta.getAsTree(smeta.getNativeMetadataFormatName)
          val skids = sroot.getChildNodes
          var sk = 0
          while (sk < skids.getLength) {
            val node = skids.item(sk)
            if (node.getNodeName == "LogicalScreenDescriptor") {
              val at = node.getAttributes
              screenW = at.getNamedItem("logicalScreenWidth")
                .getNodeValue.toInt
              screenH = at.getNamedItem("logicalScreenHeight")
                .getNodeValue.toInt
            }
            sk += 1
          }
        }
        val out = new Array[GifFrame](n)
        var f = 0
        while (f < n) {
          val img = reader.read(f)
          val w = img.getWidth
          val h = img.getHeight
          var s = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              s += img.getRGB(x, y) & 0xFF // gray: any channel
              x += 1
            }
            y += 1
          }
          // frame delay (centiseconds) from the GraphicControlExtension,
          // and the ImageDescriptor placement for the sub-rectangle check
          val meta = reader.getImageMetadata(f)
          val root = meta.getAsTree(meta.getNativeMetadataFormatName)
          var delayCs = 0
          var left = 0
          var top = 0
          val kids = root.getChildNodes
          var k = 0
          while (k < kids.getLength) {
            val node = kids.item(k)
            if (node.getNodeName == "GraphicControlExtension")
              delayCs = node.getAttributes.getNamedItem("delayTime")
                .getNodeValue.toInt
            if (node.getNodeName == "ImageDescriptor") {
              val at = node.getAttributes
              left = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
              top = at.getNamedItem("imageTopPosition").getNodeValue.toInt
            }
            k += 1
          }
          // sub-rectangle-optimized frame: read(f) is a patch, not the
          // frame — quarantine the payload instead of reporting patch
          // stats as frame stats
          if (left != 0 || top != 0 ||
            (screenW > 0 && (w != screenW || h != screenH))) return None
          out(f) = GifFrame(w, h, s.toDouble / (w.toLong * h), delayCs * 10)
          f += 1
        }
        Some(out)
      } finally { reader.dispose(); iis.close() }
    } catch { case _: Exception => None }
  }

  /** Partition-parallel REAL video decode + FRAME SAMPLING: one output
    * row per sampled frame (`frame_idx % stride == 0`) with
    * n_frames / duration_ms (sum of real per-frame delays) /
    * frame_idx / width / height / mean_luma. The sampling happens
    * inside the decode kernel — at 100 TB you never materialize the
    * frames you are about to drop. Same mapPartitions batch shape as
    * the image/audio paths; undecodable rows emit one all-null stats
    * row so quarantine routing works identically. */
  def withVideoFrameStats(df: DataFrame, payloadCol: String,
                          stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("n_frames", IntegerType),
      StructField("duration_ms", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeGifFrameStats(r.getAs[Array[Byte]](idx)) match {
          case Some(frames) =>
            val duration = frames.map(_.delayMs.toLong).sum
            frames.iterator.zipWithIndex.collect {
              case (fr, f) if f % stride == 0 =>
                Row.fromSeq(r.toSeq ++ Seq[Any](frames.length, duration, f,
                  fr.width, fr.height, fr.meanGray))
            }
          case None =>
            Iterator.single(Row.fromSeq(
              r.toSeq ++ Seq(null, null, null, null, null, null)))
        }
      }
    }(enc)
  }

  /** 256-entry grayscale palette: index i -> rgb(i,i,i). A GIF local
    * color table holds exactly this, so indexed-gray frames round-trip
    * the GIF encode/decode losslessly. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Deterministic synthetic animated GIF for id: `2 + id % 3` frames
    * of size (8 + id%5) x (6 + id%4), gray level at (x, y, frame f) =
    * `(7x + 13y + 29f) % 256`, 40 ms/frame. Indexed-gray frames make
    * the GIF encode lossless, so the formula is reproducible in
    * closed-form SQL and the decoded per-frame means check end-to-end
    * through the REAL multi-frame codec — the video analogue of
    * [[syntheticPng]] / [[syntheticWav]]. */
  def syntheticGif(id: Long): Array[Byte] = {
    val w = (8 + id % 5).toInt
    val h = (6 + id % 4).toInt
    val nFrames = (2 + id % 3).toInt
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, (7 * x + 13 * y + 29 * f) % 256)
            x += 1
          }
          y += 1
        }
        val params = writer.getDefaultWriteParam
        val meta = writer.getDefaultImageMetadata(
          new javax.imageio.ImageTypeSpecifier(img), params)
        val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
        val root = meta.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        val gce = new javax.imageio.metadata.IIOMetadataNode(
          "GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("transparentColorIndex", "0")
        gce.setAttribute("delayTime", "4") // centiseconds -> 40 ms/frame
        root.appendChild(gce)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, meta), params)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Ingest-shaped synthetic video table: one deterministic animated
    * GIF per id, encoded partition-parallel — the video analogue of
    * [[syntheticPngMedia]] / [[syntheticWavMedia]]. */
  def syntheticGifMedia(ids: DataFrame, idCol: String): DataFrame =
    mediaOf(ids, idCol)(syntheticGif)

  /** Deterministic synthetic JPEG for id: same pixel formula as
    * [[syntheticPng]] but JPEG-encoded. Lossy — decoded stats are
    * near, not equal to, the closed-form means (dims stay exact), so
    * JPEG is test-anchored with a tolerance rather than oracle-hashed. */
  def syntheticJpeg(id: Long): Array[Byte] = {
    val png = syntheticPng(id)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    baos.toByteArray
  }

  /** Deterministic synthetic PNG for id: size (8 + id%5) x (6 + id%4),
    * pixel (x, y) = ((7x+13y)%256, (11x+3y+50)%256, (5x+y+100)%256).
    * The formula is reproducible in closed-form SQL, so decoded channel
    * means can be checked end-to-end through the REAL codec. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (8 + id % 5).toInt
    val h = (6 + id % 4).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (7 * x + 13 * y) % 256
        val g = (11 * x + 3 * y + 50) % 256
        val b = (5 * x + y + 100) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Ingest-shaped synthetic media table: one deterministic PNG per id,
    * encoded partition-parallel (the encode is itself the mapPartitions
    * kernel — no driver-side generation). */
  def syntheticPngMedia(ids: DataFrame, idCol: String): DataFrame =
    mediaOf(ids, idCol)(syntheticPng)

  /** Attach decoded features: partition-parallel map over the binary
    * payload column (mapInPandas-shaped: per-partition iterator, row
    * batches inside; no driver collect, no shuffle). */
  def withDecodedFeatures(df: DataFrame, payloadCol: String,
                          dim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val feats = if (payload == null) new Array[Float](dim)
          else DecodeStub.features(payload, dim)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Parsed MP4 container metadata (no codec touched). */
  final case class Mp4Meta(brand: String, durationMs: Long,
                           width: Int, height: Int)

  /** REAL MP4 metadata decode: walk the ISO-BMFF box tree (pure
    * big-endian struct reads per the public ISO/IEC 14496-12 layout —
    * no codec, no ffmpeg) and return the container's major brand
    * (`ftyp`), presentation duration (`moov/mvhd` duration/timescale),
    * and the first visual track's pixel dimensions (`moov/trak/tkhd`
    * 16.16 fixed-point width/height). This makes `media_meta` REAL for
    * mp4 payloads; only frame/sample decode remains stubbed (that
    * genuinely needs a codec). Returns None — quarantine — only for
    * payloads that are not a parseable BMFF box tree with ftyp+mvhd. */
  def parseMp4Meta(payload: Array[Byte]): Option[Mp4Meta] = {
    if (payload == null || payload.length < 16) return None
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    // returns (boxType, payloadStart, payloadEnd) or null past `end`
    def box(at: Int, end: Int): (String, Int, Int) = {
      if (at + 8 > end) return null
      var size = buf.getInt(at).toLong & 0xFFFFFFFFL
      val tpe = new String(payload, at + 4, 4, "ISO-8859-1")
      var hdr = 8
      if (size == 1) { // 64-bit largesize
        if (at + 16 > end) return null
        size = buf.getLong(at + 8)
        hdr = 16
      } else if (size == 0) size = (end - at).toLong // box runs to end
      if (size < hdr || at + size > end) return null
      (tpe, at + hdr, at + size.toInt)
    }
    try {
      var brand: String = null
      var durationMs = -1L
      var width = -1
      var height = -1
      var at = 0
      val end = payload.length
      while (at < end) {
        val b = box(at, end)
        if (b == null) return None
        val (tpe, ps, pe) = b
        tpe match {
          case "ftyp" =>
            if (pe - ps < 8) return None
            brand = new String(payload, ps, 4, "ISO-8859-1")
          case "moov" =>
            var ct = ps
            while (ct < pe) {
              val c = box(ct, pe)
              if (c == null) return None
              c._1 match {
                case "mvhd" =>
                  val v = buf.get(c._2) & 0xFF
                  // v0: ver/flags(4) creation(4) mod(4) timescale(4)
                  //     duration(4); v1 widens times to 8 bytes
                  val (ts, dur) =
                    if (v == 1) (buf.getInt(c._2 + 20).toLong & 0xFFFFFFFFL,
                      buf.getLong(c._2 + 24))
                    else (buf.getInt(c._2 + 12).toLong & 0xFFFFFFFFL,
                      buf.getInt(c._2 + 16).toLong & 0xFFFFFFFFL)
                  if (ts <= 0) return None
                  durationMs = dur * 1000L / ts
                case "trak" =>
                  var tt = c._2
                  while (tt < c._3) {
                    val t = box(tt, c._3)
                    if (t == null) return None
                    if (t._1 == "tkhd" && width < 0) {
                      val v = buf.get(t._2) & 0xFF
                      // width/height: last 8 payload bytes, 16.16 fixed
                      // (v0: 4 verflags + 20 times/ids + 8 + 8 + 36
                      // matrix = 76; v1 widens the two times by 8)
                      val wOff = t._2 + (if (v == 1) 88 else 76)
                      val w = buf.getInt(wOff) >>> 16
                      val h = buf.getInt(wOff + 4) >>> 16
                      if (w > 0 && h > 0) { width = w; height = h }
                    }
                    tt = t._3
                  }
                case _ => ()
              }
              ct = c._3
            }
          case _ => () // mdat/free/skip/...: opaque, skip
        }
        at = pe
      }
      if (brand == null || durationMs < 0) None
      else Some(Mp4Meta(brand, durationMs, math.max(width, 0),
        math.max(height, 0)))
    } catch { case _: Exception => None }
  }

  /** Deterministic minimal MP4 for id (ftyp + moov{mvhd, trak{tkhd}}):
    * brand isom, timescale 1000, duration_ms = 1000 + 37·(id%97),
    * width 16+id%8, height 9+id%5 — closed-form values the oracle
    * recomputes from the id. The trak also carries a full
    * mdia/mdhd + minf/stbl subtree (stts/stsz/stco with closed-form
    * sample sizes and decode deltas) so [[parseMp4SampleStats]] walks
    * real tables. Box layout follows the public ISO BMFF spec
    * byte-for-byte, so [[parseMp4Meta]] exercises the same reads a
    * real mp4 needs. */
  def syntheticMp4(id: Long): Array[Byte] = {
    val w = (16 + id % 8).toInt
    val h = (9 + id % 5).toInt
    val durMs = 1000 + 37 * (id % 97)
    // sample tables (closed-form from id, mirrored by the
    // q_video_samples oracle): n samples with individual sizes and
    // per-sample stts deltas, one chunk per sample
    val n = (5 + id % 4).toInt
    val sizes = Array.tabulate(n)(i => (100 + (id + i) % 50).toInt)
    val deltas = Array.tabulate(n)(i => 10 + (i % 3) * 5)
    val sttsSz = 16 + 8 * n
    val stszSz = 20 + 4 * n
    val stcoSz = 16 + 4 * n
    val stblSz = 8 + sttsSz + stszSz + stcoSz
    val minfSz = 8 + stblSz
    val mdiaSz = 8 + 32 + minfSz // header + mdhd(32) + minf
    val trakSz = 8 + 92 + mdiaSz // header + tkhd(92) + mdia
    val moovSz = 8 + 108 + trakSz // header + mvhd(108) + trak
    val out = java.nio.ByteBuffer.allocate(20 + moovSz)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    // ftyp (20): major isom, minor 0x200, compatible mp42
    out.putInt(20).put("ftyp".getBytes("ISO-8859-1"))
      .put("isom".getBytes("ISO-8859-1")).putInt(0x200)
      .put("mp42".getBytes("ISO-8859-1"))
    out.putInt(moovSz).put("moov".getBytes("ISO-8859-1"))
    // mvhd v0 (108)
    out.putInt(108).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0)              // version 0 + flags
      .putInt(0).putInt(0)    // creation / modification
      .putInt(1000)           // timescale
      .putInt(durMs.toInt)    // duration (in timescale units = ms)
      .putInt(0x00010000)     // rate 1.0
      .putShort(0x0100.toShort).putShort(0)  // volume, reserved
      .putLong(0)             // reserved
    putIdentityMatrix(out)
    var i = 0
    while (i < 6) { out.putInt(0); i += 1 } // pre_defined
    out.putInt(2)             // next_track_ID
    out.putInt(trakSz).put("trak".getBytes("ISO-8859-1"))
    out.putInt(92).put("tkhd".getBytes("ISO-8859-1"))
      .putInt(7)              // version 0, flags: enabled|in_movie|in_preview
      .putInt(0).putInt(0)    // creation / modification
      .putInt(1)              // track_ID
      .putInt(0)              // reserved
      .putInt(durMs.toInt)    // duration
      .putLong(0)             // reserved
      .putShort(0).putShort(0)// layer, alternate_group
      .putShort(0).putShort(0)// volume (visual track: 0), reserved
    putIdentityMatrix(out)
    out.putInt(w << 16).putInt(h << 16) // 16.16 fixed-point dims
    // mdia = mdhd + minf/stbl — the sample tables a real demuxer
    // walks (ISO/IEC 14496-12 §8.5-8.7) without touching a codec
    out.putInt(mdiaSz).put("mdia".getBytes("ISO-8859-1"))
    out.putInt(32).put("mdhd".getBytes("ISO-8859-1"))
      .putInt(0)              // version 0 + flags
      .putInt(0).putInt(0)    // creation / modification
      .putInt(600)            // media timescale (differs from mvhd's)
      .putInt(deltas.sum)     // duration in media-timescale units
      .putShort(0x55C4.toShort).putShort(0) // language "und", pre_defined
    out.putInt(minfSz).put("minf".getBytes("ISO-8859-1"))
    out.putInt(stblSz).put("stbl".getBytes("ISO-8859-1"))
    // stts: n runs of (sample_count=1, sample_delta)
    out.putInt(sttsSz).put("stts".getBytes("ISO-8859-1"))
      .putInt(0).putInt(n)
    deltas.foreach(d => out.putInt(1).putInt(d))
    // stsz: sample_size=0 -> per-sample entry table
    out.putInt(stszSz).put("stsz".getBytes("ISO-8859-1"))
      .putInt(0).putInt(0).putInt(n)
    sizes.foreach(out.putInt)
    // stco: one chunk per sample, contiguous from offset 1000
    out.putInt(stcoSz).put("stco".getBytes("ISO-8859-1"))
      .putInt(0).putInt(n)
    var off = 1000
    sizes.foreach { s => out.putInt(off); off += s }
    out.array()
  }

  private def putIdentityMatrix(b: java.nio.ByteBuffer): Unit = {
    b.putInt(0x00010000).putInt(0).putInt(0)
    b.putInt(0).putInt(0x00010000).putInt(0)
    b.putInt(0).putInt(0).putInt(0x40000000)
  }

  /** JPEG-encode a grayscale image at an explicit quality. At quality
    * 1.0 the IJG-style quantization tables are all ones, so an image
    * that is CONSTANT WITHIN EVERY 8x8 BLOCK survives the DCT round
    * trip bit-exactly (DC-only blocks, zero AC, unit quantizer) —
    * the property that makes a lossy codec closed-form-oracle-able. */
  private def jpegEncodeGray(img: java.awt.image.BufferedImage): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    baos.toByteArray
  }

  /** The MJPEG frame-pixel formula: frame `f` of media `id` is gray,
    * constant per 8x8 block, block (bx, by) = (17bx + 23by + 29f + id)
    * mod 256. Shared by the builder, the spec, and (in SQL form) the
    * q_mjpeg_frames oracle. */
  def mjpegBlockValue(id: Long, f: Int, bx: Int, by: Int): Int =
    ((17 * bx + 23 * by + 29 * f + id) % 256).toInt

  /** Frame geometry/count for the synthetic MJPEG fixture: dims are
    * MULTIPLES OF 8 so every JPEG block is full (and the quality-1.0
    * round trip exact); n = 2 + id%3 frames, w = 16, h = 8*(1+id%2). */
  def mjpegDims(id: Long): (Int, Int, Int) =
    (16, 8 * (1 + (id % 2).toInt), 2 + (id % 3).toInt)

  /** Deterministic synthetic MJPEG-in-MP4: a REAL codec-bearing ISO-BMFF
    * container whose mdat holds one REAL JPEG image per video sample —
    * the one codec-bearing container stock JVM codecs can fully decode
    * ('jpeg' sample entries + ImageIO, no ffmpeg). Layout: ftyp, mdat
    * (concatenated JPEG sample data), moov with a complete stbl — stsd
    * carrying a 'jpeg' VisualSampleEntry, stts (one run, delta 40 @
    * timescale 600), stsc (one run: 1 sample/chunk), stsz per-sample
    * sizes, stco chunk offsets into the mdat. Frames follow
    * [[mjpegBlockValue]] at quality 1.0, so decoded pixels equal the
    * closed form EXACTLY (see [[jpegEncodeGray]]). */
  def syntheticMjpegMp4(id: Long): Array[Byte] = {
    val (w, h, n) = mjpegDims(id)
    buildMjpegMp4(id, w, h, n)
  }

  /** Geometry for the frame-DEDUP fixture: 64x32 (8x4 blocks), so the
    * per-row 17-step block ramp wraps at id/frame-dependent positions
    * and the dHash actually discriminates frames — the 16-wide
    * [[mjpegDims]] fixture has only two blocks per row, which
    * collapses every frame's dHash to near-identical bit patterns. */
  def mjpegWideDims(id: Long): (Int, Int, Int) = (64, 32, 2 + (id % 3).toInt)

  /** Block formula for the wide fixture: x-step 67 (not 17 — the
    * 17-step ramp spans only 17*7 = 119 < 256, so rows starting below
    * 137 never wrap and their dHash row is all-ascending; 67*8 = 536
    * guarantees 1-2 wraps per row at id/frame-dependent positions,
    * which is what makes frame hashes discriminate). Keeps the
    * additive (29f + id) phase, so frame f of id and frame f-2 of
    * id+58 remain pixel-identical — the cross-video match the dedup
    * fixture relies on. */
  def mjpegWideBlockValue(id: Long, f: Int, bx: Int, by: Int): Int = {
    // the phase p = 29f + id carries ALL id/frame dependence, so
    // frames with equal phase (mod 256) stay pixel-identical — the
    // cross-video match the fixture plants by construction. The p*bx
    // cross-term makes the x-GRADIENT phase-dependent (step 67 + 7p),
    // so frames with different phase get genuinely different wrap
    // patterns instead of a shifted copy of the same ramp (which
    // collided for every near-phase video pair)
    val p = ((29L * f + id) % 256 + 256) % 256
    ((67 * bx + 23 * by + 41 * bx * by + 13 * p + 7 * p * bx) % 256).toInt
  }

  /** [[syntheticMjpegMp4]] at [[mjpegWideDims]] geometry with the
    * [[mjpegWideBlockValue]] closed form — same container layout. */
  def syntheticMjpegMp4Wide(id: Long): Array[Byte] = {
    val (w, h, n) = mjpegWideDims(id)
    buildMjpegMp4(id, w, h, n, mjpegWideBlockValue)
  }

  /** (media_id, payload) frame of wide-geometry MJPEG MP4s. */
  def syntheticMjpegWideMedia(ids: DataFrame, idCol: String): DataFrame =
    mediaOf(ids, idCol)(syntheticMjpegMp4Wide)

  private def buildMjpegMp4(id: Long, w: Int, h: Int, n: Int,
                            blockValue: (Long, Int, Int, Int) => Int =
                              mjpegBlockValue): Array[Byte] = {
    val frames: Array[Array[Byte]] = Array.tabulate(n) { f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.getRaster.setSample(x, y, 0, blockValue(id, f, x / 8, y / 8))
          x += 1
        }
        y += 1
      }
      jpegEncodeGray(img)
    }
    val sizes = frames.map(_.length)
    val mdatSz = 8 + sizes.sum
    val stsdSz = 16 + 86           // fullbox hdr + entry_count + VisualSampleEntry
    val sttsSz = 16 + 8            // one (count, delta) run
    val stscSz = 16 + 12           // one (first_chunk, per_chunk, desc) run
    val stszSz = 20 + 4 * n
    val stcoSz = 16 + 4 * n
    val stblSz = 8 + stsdSz + sttsSz + stscSz + stszSz + stcoSz
    val minfSz = 8 + stblSz
    val mdiaSz = 8 + 32 + minfSz
    val trakSz = 8 + 92 + mdiaSz
    val moovSz = 8 + 108 + trakSz
    val out = java.nio.ByteBuffer.allocate(20 + mdatSz + moovSz)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    out.putInt(20).put("ftyp".getBytes("ISO-8859-1"))
      .put("isom".getBytes("ISO-8859-1")).putInt(0x200)
      .put("mp42".getBytes("ISO-8859-1"))
    out.putInt(mdatSz).put("mdat".getBytes("ISO-8859-1"))
    val dataStart = 28 // 20 (ftyp) + 8 (mdat header)
    frames.foreach(out.put)
    val durMedia = 40 * n
    out.putInt(moovSz).put("moov".getBytes("ISO-8859-1"))
    out.putInt(108).put("mvhd".getBytes("ISO-8859-1"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1000).putInt(durMedia * 1000 / 600)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0).putLong(0)
    putIdentityMatrix(out)
    var i = 0
    while (i < 6) { out.putInt(0); i += 1 }
    out.putInt(2)
    out.putInt(trakSz).put("trak".getBytes("ISO-8859-1"))
    out.putInt(92).put("tkhd".getBytes("ISO-8859-1"))
      .putInt(7).putInt(0).putInt(0)
      .putInt(1).putInt(0).putInt(durMedia * 1000 / 600).putLong(0)
      .putShort(0).putShort(0).putShort(0).putShort(0)
    putIdentityMatrix(out)
    out.putInt(w << 16).putInt(h << 16)
    out.putInt(mdiaSz).put("mdia".getBytes("ISO-8859-1"))
    out.putInt(32).put("mdhd".getBytes("ISO-8859-1"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(600).putInt(durMedia)
      .putShort(0x55C4.toShort).putShort(0)
    out.putInt(minfSz).put("minf".getBytes("ISO-8859-1"))
    out.putInt(stblSz).put("stbl".getBytes("ISO-8859-1"))
    // stsd: one 'jpeg' VisualSampleEntry (ISO 14496-12 §8.5.2 + §12.1.3)
    out.putInt(stsdSz).put("stsd".getBytes("ISO-8859-1"))
      .putInt(0).putInt(1)
    out.putInt(86).put("jpeg".getBytes("ISO-8859-1"))
      .putInt(0).putShort(0)        // 6 reserved bytes
      .putShort(1)                  // data_reference_index
      .putShort(0).putShort(0)      // pre_defined, reserved
      .putInt(0).putInt(0).putInt(0) // pre_defined[3]
      .putShort(w.toShort).putShort(h.toShort)
      .putInt(0x00480000).putInt(0x00480000) // 72 dpi h/v
      .putInt(0)                    // reserved
      .putShort(1)                  // frame_count
    i = 0
    while (i < 32) { out.put(0.toByte); i += 1 } // compressorname
    out.putShort(24).putShort(0xFFFF.toShort)    // depth, pre_defined
    out.putInt(sttsSz).put("stts".getBytes("ISO-8859-1"))
      .putInt(0).putInt(1).putInt(n).putInt(40)
    out.putInt(stscSz).put("stsc".getBytes("ISO-8859-1"))
      .putInt(0).putInt(1).putInt(1).putInt(1).putInt(1)
    out.putInt(stszSz).put("stsz".getBytes("ISO-8859-1"))
      .putInt(0).putInt(0).putInt(n)
    sizes.foreach(out.putInt)
    out.putInt(stcoSz).put("stco".getBytes("ISO-8859-1"))
      .putInt(0).putInt(n)
    var off = dataStart
    sizes.foreach { s => out.putInt(off); off += s }
    out.array()
  }

  /** (media_id, payload) frame of deterministic synthetic MJPEG MP4s. */
  def syntheticMjpegMedia(ids: DataFrame, idCol: String): DataFrame =
    mediaOf(ids, idCol)(syntheticMjpegMp4)

  /** One decoded MJPEG sample: geometry + exact mean gray level; `ok`
    * is false for a truncated/undecodable sample (quarantine row). */
  final case class MjpegFrame(frameIdx: Int, width: Int, height: Int,
                              meanGray: Double, ok: Boolean,
                              dhash: Option[Long] = None)

  /** REAL frame decode for a codec-bearing MP4 — no ffmpeg: walk the
    * sample tables (stsd/stsz/stsc/stco per ISO 14496-12), check the
    * sample-entry fourcc is 'jpeg' (the MJPEG case a stock JVM CAN
    * decode), slice each sample's byte range out of the mdat, and feed
    * it to the same javax.imageio kernel the image path uses. Chunk
    * offsets follow the standard stsc expansion (sample-to-chunk runs,
    * sizes accumulated within a chunk), not an assumed 1:1 layout.
    * Samples whose byte range falls outside the payload, or whose
    * bytes ImageIO rejects, become quarantine rows (`ok = false`)
    * instead of failing the task. Returns Nil when the container has
    * no 'jpeg' track (those routes stay with [[DecodeStub]]). */
  def parseMjpegFrames(payload: Array[Byte], stride: Int = 1): Seq[MjpegFrame] = {
    if (payload == null || payload.length < 16) return Nil
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def box(at: Int, end: Int): (String, Int, Int) = {
      if (at + 8 > end) return null
      var size = buf.getInt(at).toLong & 0xFFFFFFFFL
      val tpe = new String(payload, at + 4, 4, "ISO-8859-1")
      var hdr = 8
      if (size == 1) {
        if (at + 16 > end) return null
        size = buf.getLong(at + 8)
        hdr = 16
      } else if (size == 0) size = (end - at).toLong
      if (size < hdr || at + size > end) return null
      (tpe, at + hdr, at + size.toInt)
    }
    def find(ps: Int, pe: Int, want: String): (String, Int, Int) = {
      var at = ps
      while (at < pe) {
        val b = box(at, pe)
        if (b == null) return null
        if (b._1 == want) return b
        at = b._3
      }
      null
    }
    try {
      val frames = scala.collection.mutable.ArrayBuffer.empty[MjpegFrame]
      var at = 0
      val end = payload.length
      while (at < end) {
        val b = box(at, end)
        if (b == null) return frames.toSeq
        if (b._1 == "moov") {
          var ct = b._2
          while (ct < b._3) {
            val c = box(ct, b._3)
            if (c == null) return frames.toSeq
            if (c._1 == "trak") {
              val mdia = find(c._2, c._3, "mdia")
              val minf = if (mdia == null) null else find(mdia._2, mdia._3, "minf")
              val stbl = if (minf == null) null else find(minf._2, minf._3, "stbl")
              if (stbl != null) {
                val stsd = find(stbl._2, stbl._3, "stsd")
                val isJpeg = stsd != null && stsd._3 - stsd._2 >= 16 &&
                  buf.getInt(stsd._2 + 4) >= 1 &&
                  new String(payload, stsd._2 + 12, 4, "ISO-8859-1") == "jpeg"
                val stsz = find(stbl._2, stbl._3, "stsz")
                val stsc = find(stbl._2, stbl._3, "stsc")
                val stco = find(stbl._2, stbl._3, "stco")
                if (isJpeg && stsz != null && stsc != null && stco != null) {
                  val uniform = buf.getInt(stsz._2 + 4)
                  val nSamples = buf.getInt(stsz._2 + 8)
                  if (nSamples < 0 || (uniform == 0 &&
                      12L + 4L * nSamples > (stsz._3 - stsz._2).toLong))
                    return frames.toSeq
                  def sizeOf(k: Int): Int =
                    if (uniform != 0) uniform
                    else buf.getInt(stsz._2 + 12 + 4 * k)
                  val nChunks = buf.getInt(stco._2 + 4)
                  if (nChunks < 0 ||
                      8L + 4L * nChunks > (stco._3 - stco._2).toLong)
                    return frames.toSeq
                  val nScRuns = buf.getInt(stsc._2 + 4)
                  if (nScRuns <= 0 ||
                      8L + 12L * nScRuns > (stsc._3 - stsc._2).toLong)
                    return frames.toSeq
                  // standard stsc expansion: run r covers chunks
                  // [first_chunk_r, first_chunk_{r+1}) at samples_per_chunk_r
                  var sample = 0
                  var run = 0
                  var chunk = 1 // 1-based per spec
                  while (chunk <= nChunks && sample < nSamples) {
                    while (run + 1 < nScRuns &&
                           chunk >= buf.getInt(stsc._2 + 8 + 12 * (run + 1)))
                      run += 1
                    val perChunk = buf.getInt(stsc._2 + 8 + 12 * run + 4)
                    var offL = buf.getInt(stco._2 + 8 + 4 * (chunk - 1)).toLong & 0xFFFFFFFFL
                    var s = 0
                    while (s < perChunk && sample < nSamples) {
                      val sz = sizeOf(sample)
                      if (sample % stride == 0) {
                        val okRange = sz > 0 && offL >= 0 &&
                          offL + sz <= payload.length
                        val decoded: Option[(Int, Int, Double, Long)] =
                          if (!okRange) None
                          else {
                            val bytes = new Array[Byte](sz)
                            System.arraycopy(payload, offL.toInt, bytes, 0, sz)
                            val img = javax.imageio.ImageIO.read(
                              new java.io.ByteArrayInputStream(bytes))
                            if (img == null) None
                            else {
                              val w = img.getWidth
                              val h = img.getHeight
                              var sum = 0L
                              var y = 0
                              while (y < h) {
                                var x = 0
                                while (x < w) {
                                  sum += img.getRaster.getSample(x, y, 0)
                                  x += 1
                                }
                                y += 1
                              }
                              // perceptual fingerprint from the image
                              // already in hand — no second decode
                              Some((w, h, sum.toDouble / (w.toLong * h),
                                dHashOfImage(img)))
                            }
                          }
                        frames += (decoded match {
                          case Some((w, h, mg, dh)) =>
                            MjpegFrame(sample, w, h, mg, ok = true, Some(dh))
                          case None => MjpegFrame(sample, -1, -1, Double.NaN, ok = false)
                        })
                      }
                      offL += sz
                      sample += 1
                      s += 1
                    }
                    chunk += 1
                  }
                }
              }
            }
            ct = c._3
          }
        }
        at = b._3
      }
      frames.toSeq
    } catch { case _: Exception => Nil }
  }

  /** Explode each payload into one row per (strided) decoded MJPEG
    * sample. Quarantine contract: payloads with no 'jpeg' track yield
    * one all-null row; truncated/undecodable samples yield their row
    * with null stats and `decode_ok` false. Narrow partition-parallel
    * map — no shuffle, same plumbing as every decode kernel here. */
  def withMjpegFrames(df: DataFrame, payloadCol: String,
                      stride: Int = 1): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_gray", DoubleType),
      StructField("decode_ok", BooleanType),
      StructField("dhash", LongType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val fs = parseMjpegFrames(r.getAs[Array[Byte]](idx), stride)
        if (fs.isEmpty)
          Iterator(Row.fromSeq(r.toSeq ++
            Seq(null, null, null, null, null, null)))
        else fs.iterator.map { f =>
          if (f.ok)
            Row.fromSeq(r.toSeq ++ Seq[Any](f.frameIdx, f.width, f.height,
              f.meanGray, true, f.dhash.map(java.lang.Long.valueOf).orNull))
          else
            Row.fromSeq(r.toSeq ++
              Seq[Any](f.frameIdx, null, null, null, false, null))
        }
      }
    }(enc)
  }

  /** Cross-VIDEO frame-level near-duplicate pairs — the re-used-footage
    * detector (re-uploads, clips, intros spliced into other videos):
    * dHash every (strided) decoded frame, then banded Hamming LSH over
    * the fingerprints; pairs within the same video are dropped (intra-
    * video stills are repetition, not reuse — excluded inside the
    * candidate join, so they never cost join output). Output:
    * (video_a, frame_a, video_b, frame_b, hamming), video_a < video_b.
    *
    * 100-TB shape: frames decode in the narrow per-partition pass;
    * only (composite id, 8-byte fingerprint) rows ever shuffle — the
    * video payloads never move. Frame index is packed into the pair
    * key's low 16 bits (ids must be < 2^46; a 100-TB corpus at 1 MB a
    * video is ~2^27 ids), so one LSH exchange serves every frame of
    * every video. */
  def videoFrameDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                         stride: Int = 1, maxHamming: Int = 3,
                         maxBucket: Int = 1000): DataFrame = {
    val frames = withMjpegFrames(
      df.select(col(idCol), col(payloadCol)), payloadCol, stride)
      .filter(col("dhash").isNotNull)
      // key-packing contract enforced LOUDLY (assert_true raises on
      // the first violating row) — silently dropping an out-of-range
      // video or a frame past 2^16 would fake a clean dedup result.
      // Quarantine rows (null dhash/frame_idx) must pass the assert
      // unconditionally: the isNotNull filter above drops them, but
      // predicate ORDER across combined filters is the optimizer's
      // choice, so the asserted condition cannot be null on them
      .filter(assert_true(
        col("dhash").isNull ||
          (col(idCol) >= 0 && col(idCol) < (1L << 46) &&
            col("frame_idx") < (1 << 16)),
        lit("videoFrameDupPairs: media id must be in [0, 2^46) and " +
          "frame_idx < 65536 for composite-key packing")).isNull)
      .select((col(idCol) * 65536L + col("frame_idx")).as("id"),
        col("dhash"))
    // shift/mask decomposition, not floor(x / 65536): double division
    // would misround composite keys above 2^53. The cross-video
    // predicate rides INSIDE the candidate join: a static still
    // repeated across a video's own frames would otherwise flood the
    // verify + distinct stages with intra-video pairs only to be
    // dropped here
    graft.operators.Dedup
      .hamming64DupPairs(frames, "id", "dhash", maxHamming, maxBucket,
        pairPredicate = Some((a, b) =>
          shiftrightunsigned(a, 16) =!= shiftrightunsigned(b, 16)))
      .select(shiftrightunsigned(col("id_a"), 16).as("video_a"),
        col("id_a").bitwiseAND(0xFFFFL).cast("int").as("frame_a"),
        shiftrightunsigned(col("id_b"), 16).as("video_b"),
        col("id_b").bitwiseAND(0xFFFFL).cast("int").as("frame_b"),
        col("hamming"))
  }

  /** Video-pair reuse ranking over [[videoFrameDupPairs]]: per
    * (video_a, video_b), how many frame pairs matched and the closest
    * match — a full re-upload of an n-frame video scores n shared
    * frames at hamming 0. One tiny groupBy over the pair list. */
  def videoDupCandidates(df: DataFrame, idCol: String, payloadCol: String,
                         stride: Int = 1, maxHamming: Int = 3,
                         maxBucket: Int = 1000): DataFrame =
    videoFrameDupPairs(df, idCol, payloadCol, stride, maxHamming, maxBucket)
      .groupBy("video_a", "video_b")
      .agg(count(lit(1)).as("n_shared_frames"),
        min("hamming").as("min_hamming"))

  /** REAL WebM/Matroska metadata decode: walk the EBML element tree
    * (public Matroska/EBML spec — variable-length-integer IDs/sizes,
    * big-endian payloads, no codec) and return the DocType ("webm" /
    * "matroska", reported in `brand`), the Segment/Info presentation
    * duration (Duration float × TimestampScale, default scale 1 ms),
    * and the first video track's PixelWidth/PixelHeight. The WebM
    * sibling of [[parseMp4Meta]]; together they close the container-
    * metadata gap for both stubbed video formats. Returns None for
    * anything that is not a parseable EBML tree with DocType+Info. */
  def parseWebmMeta(payload: Array[Byte]): Option[Mp4Meta] = {
    if (payload == null || payload.length < 8) return None
    // EBML variable-length integer at `at`: (value, bytesUsed);
    // keepMarker for element IDs (IDs compare with the marker bit in)
    def vint(at: Int, keepMarker: Boolean): (Long, Int) = {
      if (at >= payload.length) return null
      val first = payload(at) & 0xFF
      if (first == 0) return null
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
      if (at + len > payload.length) return null
      var v = if (keepMarker) first.toLong
        else first.toLong & ((1L << (8 - len)) - 1)
      var i = 1
      while (i < len) { v = (v << 8) | (payload(at + i) & 0xFF); i += 1 }
      (v, len)
    }
    def uintAt(ps: Int, pe: Int): Long = {
      var v = 0L
      var i = ps
      while (i < pe) { v = (v << 8) | (payload(i) & 0xFF); i += 1 }
      v
    }
    def floatAt(ps: Int, pe: Int): Double = {
      val buf = java.nio.ByteBuffer.wrap(payload, ps, pe - ps)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      if (pe - ps == 4) buf.getFloat.toDouble
      else if (pe - ps == 8) buf.getDouble
      else Double.NaN
    }
    // walk children of [from, to): f(elementId, payloadStart, payloadEnd)
    def walk(from: Int, to: Int)(f: (Long, Int, Int) => Unit): Boolean = {
      var at = from
      while (at < to) {
        val id = vint(at, keepMarker = true)
        if (id == null) return false
        val sz = vint(at + id._2, keepMarker = false)
        if (sz == null) return false
        val ps = at + id._2 + sz._2
        // Long-domain bound check BEFORE narrowing: a hostile 64-bit
        // element size must not wrap toInt past the buffer guard
        if (sz._1 < 0 || sz._1 > (to - ps).toLong) return false
        val pe = ps + sz._1.toInt
        f(id._1, ps, pe)
        at = pe
      }
      true
    }
    try {
      var docType: String = null
      var timestampScale = 1000000L // EBML default: 1 ms
      var duration = Double.NaN
      var width = -1
      var height = -1
      val ok = walk(0, payload.length) { (id, ps, pe) =>
        id match {
          case 0x1A45DFA3L => // EBML header
            walk(ps, pe) { (hid, hs, he) =>
              if (hid == 0x4282L) // DocType
                docType = new String(payload, hs, he - hs, "ISO-8859-1")
            }
          case 0x18538067L => // Segment
            walk(ps, pe) { (sid, ss, se) =>
              sid match {
                case 0x1549A966L => // Info
                  walk(ss, se) { (iid, is, ie) =>
                    if (iid == 0x2AD7B1L) timestampScale = uintAt(is, ie)
                    if (iid == 0x4489L) duration = floatAt(is, ie)
                  }
                case 0x1654AE6BL => // Tracks
                  walk(ss, se) { (tid, ts, te) =>
                    if (tid == 0xAEL) // TrackEntry
                      walk(ts, te) { (eid, es, ee) =>
                        if (eid == 0xE0L && width < 0) // Video
                          walk(es, ee) { (vid, vs, ve) =>
                            if (vid == 0xB0L) width = uintAt(vs, ve).toInt
                            if (vid == 0xBAL) height = uintAt(vs, ve).toInt
                          }
                      }
                  }
                case _ => ()
              }
            }
          case _ => ()
        }
      }
      if (!ok || docType == null || duration.isNaN || timestampScale <= 0)
        None
      else Some(Mp4Meta(docType,
        math.round(duration * timestampScale / 1e6),
        math.max(width, 0), math.max(height, 0)))
    } catch { case _: Exception => None }
  }

  /** Deterministic minimal WebM for id (EBML header{DocType webm} +
    * Segment{Info{TimestampScale 1e6, Duration}, Tracks{TrackEntry{
    * Video{PixelWidth, PixelHeight}}}}): duration_ms = 1500 +
    * 53·(id%89), width 32+id%16, height 18+id%9 — closed-form values
    * for the oracle, distinct from the mp4 formulas so a mixed corpus
    * can't pass by accident. Duration is a 4-byte float (exact for
    * these magnitudes); scale is the 1 ms default written explicitly. */
  def syntheticWebm(id: Long): Array[Byte] = {
    val w = (32 + id % 16).toInt
    val h = (18 + id % 9).toInt
    val durMs = 1500 + 53 * (id % 89)
    def el(idBytes: Array[Int], body: Array[Byte]): Array[Byte] = {
      require(body.length < 0x4000)
      val size = // 2-byte VINT: 0x40xx
        Array((0x40 | (body.length >> 8)).toByte, (body.length & 0xFF).toByte)
      idBytes.map(_.toByte) ++ size ++ body
    }
    def uint(v: Long): Array[Byte] = {
      var n = 1
      while (n < 8 && (v >>> (8 * n)) != 0) n += 1
      Array.tabulate(n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    val f = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.BIG_ENDIAN).putFloat(durMs.toFloat).array()
    val ebml = el(Array(0x1A, 0x45, 0xDF, 0xA3),
      el(Array(0x42, 0x82), "webm".getBytes("ISO-8859-1")))
    val info = el(Array(0x15, 0x49, 0xA9, 0x66),
      el(Array(0x2A, 0xD7, 0xB1), uint(1000000L)) ++
        el(Array(0x44, 0x89), f))
    val video = el(Array(0xE0),
      el(Array(0xB0), uint(w)) ++ el(Array(0xBA), uint(h)))
    val tracks = el(Array(0x16, 0x54, 0xAE, 0x6B), el(Array(0xAE), video))
    // Clusters with closed-form block tables (mirrored by the
    // q_webm_blocks oracle): nc clusters at 500 ms spacing, each with
    // nb blocks at 10 ms relative spacing on track 1; frame sizes
    // 50 + (id+c+j)%40. Block 0 of each cluster is a BlockGroup-wrapped
    // Block, the rest SimpleBlocks — both grammars, same closed form.
    val nc = (2 + id % 3).toInt
    val clusters = (0 until nc).map { c =>
      val nb = (3 + (id + c) % 3).toInt
      val blocks = (0 until nb).map { j =>
        val fb = (50 + (id + c + j) % 40).toInt
        // block payload: track vint (0x81 = 1), int16 relative ts,
        // flags 0x00, then fb frame bytes
        val body = Array[Byte](0x81.toByte,
          ((j * 10) >> 8).toByte, ((j * 10) & 0xFF).toByte, 0x00) ++
          Array.tabulate(fb)(i => ((id + c + j + i) & 0x7F).toByte)
        if (j == 0) el(Array(0xA0), el(Array(0xA1), body)) // BlockGroup
        else el(Array(0xA3), body) // SimpleBlock
      }.reduce(_ ++ _)
      el(Array(0x1F, 0x43, 0xB6, 0x75),
        el(Array(0xE7), uint(c * 500L)) ++ blocks)
    }.reduce(_ ++ _)
    val segment = el(Array(0x18, 0x53, 0x80, 0x67), info ++ tracks ++ clusters)
    ebml ++ segment
  }

  /** (media_id, payload) frame of deterministic synthetic WebMs. */
  def syntheticWebmMedia(ids: DataFrame, idCol: String): DataFrame =
    mediaOf(ids, idCol)(syntheticWebm)

  /** (media_id, payload) frame of deterministic synthetic MP4s. */
  def syntheticMp4Media(ids: DataFrame, idCol: String): DataFrame =
    mediaOf(ids, idCol)(syntheticMp4)

  /** Partition-parallel video-container metadata extraction: sniffs
    * the container (ISO-BMFF 'ftyp' at offset 4 → [[parseMp4Meta]];
    * EBML magic 0x1A45DFA3 at offset 0 → [[parseWebmMeta]]) and adds
    * brand / duration_ms / width / height; unparseable payloads yield
    * all-null columns (quarantine routing, same contract as every
    * decode kernel here). */
  def parseVideoMeta(payload: Array[Byte]): Option[Mp4Meta] = {
    if (payload == null || payload.length < 8) None
    else if (payload(0) == 0x1A.toByte && payload(1) == 0x45.toByte &&
      payload(2) == 0xDF.toByte && payload(3) == 0xA3.toByte)
      parseWebmMeta(payload)
    else parseMp4Meta(payload)
  }

  def withVideoMeta(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("brand", StringType),
      StructField("duration_ms", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        parseVideoMeta(r.getAs[Array[Byte]](idx)) match {
          case Some(m) =>
            Row.fromSeq(r.toSeq ++ Seq[Any](m.brand, m.durationMs,
              m.width, m.height))
          case None =>
            Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        }
      }
    }(enc)
  }

  /** Per-track block statistics from a Matroska/WebM Cluster walk. */
  final case class WebmTrackStats(trackId: Long, nClusters: Int,
    nBlocks: Int, totalBytes: Long, firstTsMs: Long, lastTsMs: Long)

  /** CODEC-FREE per-block statistics for WebM/Matroska: walk the
    * Segment's Cluster elements (public Matroska spec — Cluster
    * Timestamp, SimpleBlock, and BlockGroup/Block; block header =
    * track vint + int16 relative timestamp + flags) and emit, per
    * track: block count, cluster count, total frame bytes (block
    * payload minus header), and first/last absolute block timestamps
    * (cluster timestamp + block relative, in TimestampScale units —
    * ms at the default scale). The WebM sibling of
    * [[parseMp4SampleStats]]: everything a demuxer knows about the
    * media stream without touching a codec. Returns Nil for payloads
    * that are not a parseable EBML tree with at least one block. */
  def parseWebmBlockStats(payload: Array[Byte]): Seq[WebmTrackStats] = {
    if (payload == null || payload.length < 8) return Nil
    def vint(at: Int, keepMarker: Boolean): (Long, Int) = {
      if (at >= payload.length) return null
      val first = payload(at) & 0xFF
      if (first == 0) return null
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
      if (at + len > payload.length) return null
      var v = if (keepMarker) first.toLong
        else first.toLong & ((1L << (8 - len)) - 1)
      var i = 1
      while (i < len) { v = (v << 8) | (payload(at + i) & 0xFF); i += 1 }
      (v, len)
    }
    def uintAt(ps: Int, pe: Int): Long = {
      var v = 0L
      var i = ps
      while (i < pe) { v = (v << 8) | (payload(i) & 0xFF); i += 1 }
      v
    }
    def walk(from: Int, to: Int)(f: (Long, Int, Int) => Unit): Boolean = {
      var at = from
      while (at < to) {
        val id = vint(at, keepMarker = true)
        if (id == null) return false
        val sz = vint(at + id._2, keepMarker = false)
        if (sz == null) return false
        val ps = at + id._2 + sz._2
        // Long-domain bound check BEFORE narrowing (same hostile-size
        // guard as parseWebmMeta)
        if (sz._1 < 0 || sz._1 > (to - ps).toLong) return false
        val pe = ps + sz._1.toInt
        f(id._1, ps, pe)
        at = pe
      }
      true
    }
    final class Acc {
      var nBlocks = 0
      val clusters = scala.collection.mutable.HashSet.empty[Int]
      var totalBytes = 0L
      var firstTs = Long.MaxValue
      var lastTs = Long.MinValue
    }
    try {
      val byTrack = scala.collection.mutable.LinkedHashMap.empty[Long, Acc]
      var bad = false
      // block element at [ps,pe): header = track vint, int16 rel ts,
      // flags byte; the rest is frame data
      def block(ps: Int, pe: Int, clusterIdx: Int, clusterTs: Long): Unit = {
        val tv = vint(ps, keepMarker = false)
        if (tv == null || ps + tv._2 + 3 > pe) { bad = true; return }
        val rel = ((payload(ps + tv._2) & 0xFF) << 8 |
          (payload(ps + tv._2 + 1) & 0xFF)).toShort.toLong
        val acc = byTrack.getOrElseUpdate(tv._1, new Acc)
        acc.nBlocks += 1
        acc.clusters += clusterIdx
        acc.totalBytes += pe - (ps + tv._2 + 3)
        val ts = clusterTs + rel
        if (ts < acc.firstTs) acc.firstTs = ts
        if (ts > acc.lastTs) acc.lastTs = ts
      }
      var clusterIdx = -1
      val ok = walk(0, payload.length) { (id, ps, pe) =>
        if (id == 0x18538067L) { // Segment
          walk(ps, pe) { (sid, ss, se) =>
            if (sid == 0x1F43B675L) { // Cluster
              clusterIdx += 1
              var clusterTs = 0L
              walk(ss, se) { (cid, cs, ce) =>
                cid match {
                  case 0xE7L => clusterTs = uintAt(cs, ce) // Timestamp
                  case 0xA3L => block(cs, ce, clusterIdx, clusterTs)
                  case 0xA0L => // BlockGroup: contains a Block
                    walk(cs, ce) { (bid, bs, be) =>
                      if (bid == 0xA1L) block(bs, be, clusterIdx, clusterTs)
                    }
                  case _ => ()
                }
              }
            }
          }
        }
      }
      if (!ok || bad) Nil
      else byTrack.toSeq.map { case (tid, a) =>
        WebmTrackStats(tid, a.clusters.size, a.nBlocks, a.totalBytes,
          a.firstTs, a.lastTs)
      }
    } catch { case _: Exception => Nil }
  }

  /** Explode each payload into one row per track's block stats (WebM
    * analogue of [[withVideoSampleStats]]; all-null quarantine row for
    * payloads with no parseable blocks). Narrow partition-parallel
    * map — no shuffle. */
  def withWebmBlockStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("track_id", LongType),
      StructField("n_clusters", IntegerType),
      StructField("n_blocks", IntegerType),
      StructField("total_bytes", LongType),
      StructField("first_ts_ms", LongType),
      StructField("last_ts_ms", LongType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val stats = parseWebmBlockStats(r.getAs[Array[Byte]](idx))
        if (stats.isEmpty)
          Iterator(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null,
            null, null)))
        else stats.iterator.map(t =>
          Row.fromSeq(r.toSeq ++ Seq[Any](t.trackId, t.nClusters,
            t.nBlocks, t.totalBytes, t.firstTsMs, t.lastTsMs)))
      }
    }(enc)
  }

  /** Per-track sample-table statistics from an MP4 stbl walk. */
  final case class Mp4TrackStats(trackId: Int, timescale: Int,
    nSamples: Int, nChunks: Int, totalBytes: Long, durationUnits: Long,
    wmeanSize: Double)

  /** CODEC-FREE per-sample statistics for MP4: walk each track's
    * sample tables (ISO/IEC 14496-12 — `stsz` sizes, `stts` decode
    * deltas, `stco` chunk offsets, `mdhd` media timescale) and emit
    * sample count, total sample bytes, chunk count, total duration in
    * media-timescale units, and the duration-weighted mean sample size
    * Σ(size·Δt)/ΣΔt. This is everything a demuxer knows about the
    * media payload without decoding a single frame — the real 100-TB
    * profiling shape for codec-bearing containers the sandbox can't
    * decode. Returns one entry per track carrying a complete stbl;
    * Nil for non-BMFF payloads. */
  def parseMp4SampleStats(payload: Array[Byte]): Seq[Mp4TrackStats] = {
    if (payload == null || payload.length < 16) return Nil
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def box(at: Int, end: Int): (String, Int, Int) = {
      if (at + 8 > end) return null
      var size = buf.getInt(at).toLong & 0xFFFFFFFFL
      val tpe = new String(payload, at + 4, 4, "ISO-8859-1")
      var hdr = 8
      if (size == 1) {
        if (at + 16 > end) return null
        size = buf.getLong(at + 8)
        hdr = 16
      } else if (size == 0) size = (end - at).toLong
      if (size < hdr || at + size > end) return null
      (tpe, at + hdr, at + size.toInt)
    }
    // walk children of [ps,pe), returning the first box of `want`
    def find(ps: Int, pe: Int, want: String): (String, Int, Int) = {
      var at = ps
      while (at < pe) {
        val b = box(at, pe)
        if (b == null) return null
        if (b._1 == want) return b
        at = b._3
      }
      null
    }
    try {
      val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4TrackStats]
      var at = 0
      val end = payload.length
      while (at < end) {
        val b = box(at, end)
        if (b == null) return Nil
        if (b._1 == "moov") {
          var ct = b._2
          while (ct < b._3) {
            val c = box(ct, b._3)
            if (c == null) return Nil
            if (c._1 == "trak") {
              val tkhd = find(c._2, c._3, "tkhd")
              val trackId = if (tkhd == null) -1 else {
                val v = buf.get(tkhd._2) & 0xFF
                buf.getInt(tkhd._2 + (if (v == 1) 20 else 12))
              }
              val mdia = find(c._2, c._3, "mdia")
              if (mdia != null) {
                val mdhd = find(mdia._2, mdia._3, "mdhd")
                val timescale = if (mdhd == null) -1 else {
                  val v = buf.get(mdhd._2) & 0xFF
                  buf.getInt(mdhd._2 + (if (v == 1) 20 else 12))
                }
                val minf = find(mdia._2, mdia._3, "minf")
                val stbl = if (minf == null) null
                  else find(minf._2, minf._3, "stbl")
                if (stbl != null) {
                  val stsz = find(stbl._2, stbl._3, "stsz")
                  val stts = find(stbl._2, stbl._3, "stts")
                  val stco = find(stbl._2, stbl._3, "stco")
                  if (stsz != null && stts != null) {
                    // stsz: verflags, sample_size (0 = per-sample
                    // table), sample_count[, size per sample]
                    val uniform = buf.getInt(stsz._2 + 4)
                    val nSamples = buf.getInt(stsz._2 + 8)
                    // A declared count exceeding its box extent is a
                    // malformed table: reading on would interpret the
                    // NEXT box's bytes as sizes/deltas and emit garbage
                    // stats instead of quarantining. Bound both tables
                    // to their boxes and skip the track on mismatch.
                    if (nSamples < 0 ||
                        (uniform == 0 &&
                          12L + 4L * nSamples > (stsz._3 - stsz._2).toLong))
                      return Nil
                    def sizeOf(k: Int): Long =
                      if (uniform != 0) uniform.toLong
                      else buf.getInt(stsz._2 + 12 + 4 * k).toLong & 0xFFFFFFFFL
                    var totalBytes = 0L
                    var k = 0
                    while (k < nSamples) { totalBytes += sizeOf(k); k += 1 }
                    // stts: (sample_count, sample_delta) runs — expand
                    // to pair each sample's size with its decode delta
                    val nRuns = buf.getInt(stts._2 + 4)
                    if (nRuns < 0 ||
                        8L + 8L * nRuns > (stts._3 - stts._2).toLong)
                      return Nil
                    var durUnits = 0L
                    var wsum = 0.0
                    k = 0
                    var run = 0
                    while (run < nRuns && k < nSamples) {
                      val cnt = buf.getInt(stts._2 + 8 + 8 * run)
                      val dlt = buf.getInt(stts._2 + 12 + 8 * run).toLong
                      var j = 0
                      while (j < cnt && k < nSamples) {
                        durUnits += dlt
                        wsum += sizeOf(k).toDouble * dlt
                        k += 1; j += 1
                      }
                      run += 1
                    }
                    val nChunks =
                      if (stco == null) 0 else buf.getInt(stco._2 + 4)
                    val wmean = if (durUnits > 0) wsum / durUnits
                      else if (nSamples > 0) totalBytes.toDouble / nSamples
                      else 0.0
                    tracks += Mp4TrackStats(trackId, timescale, nSamples,
                      nChunks, totalBytes, durUnits, wmean)
                  }
                }
              }
            }
            ct = c._3
          }
        }
        at = b._3
      }
      tracks.toSeq
    } catch { case _: Exception => Nil }
  }

  /** Explode each payload into one row per track's sample-table stats
    * (quarantine: payloads with no parseable stbl yield one all-null
    * row, same contract as the other decode kernels). Narrow
    * partition-parallel map — no shuffle. */
  def withVideoSampleStats(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("track_id", IntegerType),
      StructField("timescale", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("n_chunks", IntegerType),
      StructField("total_bytes", LongType),
      StructField("duration_units", LongType),
      StructField("wmean_size", DoubleType)))
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val stats = parseMp4SampleStats(r.getAs[Array[Byte]](idx))
        if (stats.isEmpty)
          Iterator(Row.fromSeq(r.toSeq ++ Seq(null, null, null, null,
            null, null, null)))
        else stats.iterator.map(t =>
          Row.fromSeq(r.toSeq ++ Seq[Any](t.trackId, t.timescale,
            t.nSamples, t.nChunks, t.totalBytes, t.durationUnits,
            t.wmeanSize)))
      }
    }(enc)
  }

  /** 64-bit difference hash (dHash) of an image payload — the
    * perceptual fingerprint for image-level near-dup detection
    * (Krawetz's dHash, the standard cheap perceptual hash): decode,
    * reduce to a 9x8 grid of box-mean luma values, emit one bit per
    * horizontally-adjacent pair (set when the right box is brighter).
    * Survives re-encoding, format conversion, and affine
    * brightness/contrast maps — exactly the transforms that defeat
    * byte-level exact dedup on crawled images.
    *
    * Fully deterministic across platforms: integer luma
    * (299r + 587g + 114b — no float), floor box boundaries
    * (`i*w/9`, empty boxes widened to one pixel), and box-mean
    * comparison via cross-multiplication (sumA*nB > sumB*nA) so no
    * division ever rounds — compared in 128 bits (`Math.multiplyHigh`),
    * so the result is exact at ANY image size (a 64-bit product
    * would wrap at ~0.4 gigapixels on a near-white image).
    * Undecodable/null payloads return None (quarantine
    * routing decides those rows, same contract as
    * [[decodeImageStats]]). */
  def dHash64(payload: Array[Byte]): Option[Long] = {
    if (payload == null) return None
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) return None
    Some(dHashOfImage(img))
  }

  /** The grid/compare stage of [[dHash64]] over an already-decoded
    * image — shared with the MJPEG frame path, which has the decoded
    * `BufferedImage` in hand and must not pay a second decode. */
  private[graft] def dHashOfImage(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = Array.ofDim[Long](8, 9)
    val counts = Array.ofDim[Long](8, 9)
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8
      val y1 = math.max(y0 + 1, (j + 1) * h / 8)
      var i = 0
      while (i < 9) {
        val x0 = i * w / 9
        val x1 = math.max(x0 + 1, (i + 1) * w / 9)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += 299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        sums(j)(i) = s
        counts(j)(i) = (y1 - y0).toLong * (x1 - x0)
        i += 1
      }
      j += 1
    }
    var hash = 0L
    var k = 0
    j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (prodGreater(sums(j)(i + 1), counts(j)(i),
          sums(j)(i), counts(j)(i + 1)))
          hash |= 1L << k
        k += 1
        i += 1
      }
      j += 1
    }
    hash
  }

  /** a*b > c*d for non-negative longs, exact via a 128-bit product
    * compare — the sum*count cross-multiplications above would wrap a
    * 64-bit product on gigapixel images. */
  private[graft] def prodGreater(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  /** Partition-parallel dHash pass: adds a nullable `dhash` long
    * column (null = undecodable, for quarantine routing). Same
    * mapPartitions batch shape as [[withImageStats]]. */
  def withDHash(df: DataFrame, payloadCol: String): DataFrame =
    withFingerprint(df, payloadCol)(dHash64)

  /** Perceptual image near-duplicate pairs: dHash each payload
    * (partition-parallel decode, no shuffle), then banded Hamming LSH
    * over the 64-bit fingerprints ([[graft.operators.Dedup.hamming64DupPairs]]
    * — 4x16-bit bands, pigeonhole-exact recall for `maxHamming <= 3`,
    * hot buckets pruned before the self-join). Catches re-encoded /
    * contrast-shifted / format-converted copies that byte-level exact
    * dedup misses. Undecodable payloads drop out (null fingerprint);
    * route them via [[routeUndecodable]] separately.
    *
    * 100-TB shape: the decode is a narrow per-partition pass over the
    * payload column; only (id, 8-byte fingerprint) ever shuffles —
    * the image bytes never move. */
  def imageDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                    maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val hashed = withDHash(df.select(col(idCol), col(payloadCol)), payloadCol)
      .filter(col("dhash").isNotNull)
      .select(col(idCol), col("dhash"))
    graft.operators.Dedup.hamming64DupPairs(
      hashed, idCol, "dhash", maxHamming, maxBucket)
  }

  /** Deterministic synthetic PNG whose CONTENT depends on the id (the
    * [[syntheticPng]] pixel formula is id-independent — every id with
    * the same dims encodes the same image, which would make a
    * perceptual-dedup fixture one giant clique): per-channel offsets
    * derived from id residues mod coprime bases shift the mod-256
    * wrap positions, so different ids yield different gradient
    * patterns. Size (8 + id%7) x (6 + id%5). */
  def syntheticPngId(id: Long): Array[Byte] =
    encodeIdPng(id, v => v)

  /** Contrast-halved re-encode of [[syntheticPngId]]: every channel
    * value v maps to v/2 + 96 (affine, no clipping: range [96, 223]).
    * Different bytes AND different pixels than the base image — exact
    * dedup is blind to it — but luma gradient signs survive, so its
    * dHash lands within a few bits of the base image's. */
  def syntheticPngContrast(id: Long): Array[Byte] =
    encodeIdPng(id, v => v / 2 + 96)

  private def encodeIdPng(id: Long, tone: Int => Int): Array[Byte] = {
    val w = (8 + id % 7).toInt
    val h = (6 + id % 5).toInt
    val or = (53 * (id % 101)).toInt
    val og = (31 * (id % 89)).toInt
    val ob = (17 * (id % 71)).toInt
    // steep per-pixel gradients (67/97/41 per x-step), so the mod-256
    // wrap pattern — what dHash actually fingerprints — is dense and
    // offset-sensitive; the shallow 7/11/5 ramps of [[syntheticPng]]
    // rarely wrap inside a 8-14px image and every same-size image
    // would hash near-identically
    val cross = (id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = tone((67 * x + 53 * y + cross * x * y + or) % 256)
        val g = tone((97 * x + 31 * y + 50 + og) % 256)
        val b = tone((41 * x + 29 * y + 100 + ob) % 256)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Ingest-shaped media table of id-content PNGs (encode is the
    * mapPartitions kernel, same as [[syntheticPngMedia]]); `contrast`
    * selects the [[syntheticPngContrast]] tone map. */
  def syntheticPngIdMedia(ids: DataFrame, idCol: String,
                          contrast: Boolean = false): DataFrame =
    mediaOf(ids, idCol)(id =>
      if (contrast) syntheticPngContrast(id) else syntheticPngId(id))

  /** Demo media table derived from the documents corpus: text bytes as
    * payload with fabricated image metadata (this is the ingest shape a
    * real pipeline would produce from tar/parquet shards). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("image").as("modality"),
        lit("image/fake").as("mime"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        lit(0L).as("duration_ms"),
        concat(lit("mem://doc/"), col("doc_id")).as("source_uri"))
        .as("media_meta"))
}
