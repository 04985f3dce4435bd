package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batches per partition
  * (builder-prompt scale extension; the Scala analog of a Pandas-UDF /
  * `mapInPandas` stage is typed `mapPartitions` — one iterator per
  * partition, so a real decoder would amortize model/codec init across
  * the batch exactly like a Pandas UDF does).
  *
  * Decode is REAL at both levels (no stub seam since r17):
  * [[MediaCodec]] parses the actual header layouts of all three fixture
  * formats (PNG IHDR, JPEG SOF marker scan, WAV RIFF/fmt chunks) in
  * pure JVM byte reads — q66's oracle-gated path, with q23 the
  * narrower feature projection of the same decode — and [[pcmStats]]
  * decodes the WAV `data` payload's actual PCM samples at the declared
  * bit depth (8-bit unsigned-offset, 16/24/32-bit signed little-endian
  * per the format spec) into the audio statistics a curation pipeline
  * filters on (DC offset, peak, RMS) — q75. What a codec LIBRARY would
  * add here is only compressed formats (e.g. MP3/FLAC frames); every
  * byte layout in the fixture is decoded for real.
  *
  * Scale notes: media rows are wide (MBs per row at 100 TB); the
  * pipeline keeps them in one narrow pass (no shuffle), and metadata-only
  * queries prune the binary column at the parquet scan (columnar layout
  * means the bytes are never read — verified via ReadSchema in explain).
  */
object Multimodal {

  case class MediaRow(media_id: Long, media: Array[Byte], format: String)

  /** Make an opaque-binary media table from the documents fixture (UTF-8
    * bytes stand in for encoded media; format cycles deterministically). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))

  /** "Frame sampling" plumbing for video-like payloads: split the byte
    * stream into fixed-size chunks and emit every `stride`-th chunk with
    * its index — the shape of a real frame sampler (explode + index),
    * without a codec. */
  def sampleFrames(media: DataFrame, chunkSize: Int = 64, stride: Int = 4): DataFrame =
    media
      .select(col("media_id"), posexplode(expr(
        // the x.idx >= 0 AND idx*chunk < length guard kills the phantom
        // frames a descending sequence(0,-1) would emit for empty media
        s"""filter(transform(sequence(0, int(floor((length(media) - 1) / $chunkSize))),
           |  i -> struct(i as idx, substring(media, i * $chunkSize + 1, $chunkSize) as chunk)),
           |  x -> x.idx >= 0 AND x.idx * $chunkSize < length(media) AND x.idx % $stride = 0)""".stripMargin)))
      .select(col("media_id"), col("col.idx").cast("long").as("frame_idx"),
        md5(col("col.chunk")).as("frame_hash"),
        length(col("col.chunk")).cast("long").as("frame_bytes"))

  // ---- real header-level decode (q66) ------------------------------------

  /** Pure-JVM header parsers for the three fixture formats, whose
    * typed metadata lives in fixed, public byte layouts — PNG (IHDR),
    * JPEG (SOF) and WAV (RIFF/fmt) — a REAL decoder for media
    * metadata without any codec library (it replaced the early rounds'
    * stub seam, deleted in r17).
    *
    * Malformed input returns (-1, -1, 0) instead of throwing: at fleet
    * scale one corrupt object must not kill a 100 TB scan — the sentinel
    * row is filterable downstream (spec-pinned). */
  object MediaCodec {

    private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

    /** PNG: 8-byte signature, then the IHDR chunk (4-byte length = 13,
      * "IHDR", width u32be, height u32be, 5 spec bytes, CRC32) — width
      * and height at fixed offsets 16 and 20; header ends at byte 33.
      * [[pngIssue]] is the reason-bearing core (None = parseable); the
      * tuple wrapper keeps the original sentinel contract. */
    def pngIssue(b: Array[Byte]): Option[String] =
      if (b.length < 33) Some("truncated_header")
      else if (!PngSig.indices.forall(i => b(i) == PngSig(i)))
        Some("bad_signature")
      else if (be32(b, 8) != 13L ||
          !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
        Some("bad_ihdr")
      else None

    def parsePng(b: Array[Byte]): (Long, Long, Int) =
      if (pngIssue(b).isEmpty) (be32(b, 16), be32(b, 20), 33)
      else (-1L, -1L, 0)

    /** JPEG: SOI (FFD8), then marker segments (FF xx, u16be length
      * including itself); dimensions live in the first SOF frame header
      * (FFC0–FFCF except the non-frame C4/C8/CC): precision u8, height
      * u16be, width u16be. Returns the offset AFTER the SOF segment —
      * where this generator's payload starts. */
    def parseJpeg(b: Array[Byte]): (Long, Long, Int) =
      jpegCore(b).getOrElse((-1L, -1L, 0))

    def jpegIssue(b: Array[Byte]): Option[String] = jpegCore(b).left.toOption

    private def jpegCore(b: Array[Byte]): Either[String, (Long, Long, Int)] = {
      if (b.length < 4 || b(0) != 0xff.toByte || b(1) != 0xd8.toByte)
        return Left("bad_signature")
      var o = 2
      while (o + 4 <= b.length && b(o) == 0xff.toByte) {
        val marker = b(o + 1) & 0xff
        val segLen = be16(b, o + 2)
        if (segLen < 2 || o + 2 + segLen > b.length) return Left("bad_segment")
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (segLen < 7) return Left("bad_sof")
          val h = be16(b, o + 5).toLong
          val w = be16(b, o + 7).toLong
          return Right((w, h, o + 2 + segLen))
        }
        o += 2 + segLen
      }
      Left("no_sof")
    }

    /** A real, CRC-valid PNG signature+IHDR for the given dimensions —
      * the fixture generator's image "encoder". */
    def pngHeader(width: Long, height: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(33)
      out.put(PngSig)
      out.putInt(13)
      val tagAndData = java.nio.ByteBuffer.allocate(17)
      tagAndData.put("IHDR".getBytes("US-ASCII"))
      tagAndData.putInt(width.toInt).putInt(height.toInt)
      // bit depth 8, truecolor, deflate, adaptive filter, no interlace
      tagAndData.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      out.put(tagAndData.array())
      val crc = new java.util.zip.CRC32
      crc.update(tagAndData.array())
      out.putInt(crc.getValue.toInt)
      out.array()
    }

    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    private def tag(b: Array[Byte], o: Int, t: String): Boolean =
      t.indices.forall(i => b(o + i) == t.charAt(i).toByte)

    /** WAV: RIFF container ("RIFF", u32le riff size, "WAVE"), then
      * chunks of (4-byte id, u32le size, data, padded to even). Audio
      * parameters live in the "fmt " chunk (format u16le, channels
      * u16le, sample rate u32le, byte rate u32le, block align u16le,
      * bits per sample u16le); the payload starts after the "data"
      * chunk header. Walks the chunk list (robust to extra chunks like
      * LIST/JUNK before fmt), returns (sample_rate, channels,
      * bits_per_sample, payload offset); malformed/truncated input
      * returns the same filterable sentinel as the image parsers. */
    def parseWav(b: Array[Byte]): (Long, Long, Long, Int) =
      wavCore(b).getOrElse((-1L, -1L, -1L, 0))

    def wavIssue(b: Array[Byte]): Option[String] = wavCore(b).left.toOption

    private def wavCore(
        b: Array[Byte]): Either[String, (Long, Long, Long, Int)] = {
      if (b.length < 44 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
        return Left("bad_container")
      var o = 12
      var rate = -1L; var ch = -1L; var bits = -1L
      while (o + 8 <= b.length) {
        val size = le32(b, o + 4)
        if (size < 0 || o + 8 + size > b.length) return Left("bad_chunk")
        if (tag(b, o, "fmt ")) {
          if (size < 16) return Left("bad_fmt")
          ch = le16(b, o + 10).toLong
          rate = le32(b, o + 12)
          bits = le16(b, o + 22).toLong
        } else if (tag(b, o, "data")) {
          // payload starts here; fmt must already have been seen
          // (the canonical layout; a data-before-fmt file is malformed)
          return if (rate < 0) Left("missing_fmt")
          else Right((rate, ch, bits, o + 8))
        }
        o += 8 + size.toInt + (size.toInt & 1) // chunks pad to even
      }
      Left("no_data")
    }

    /** Canonical 44-byte PCM WAV header (RIFF + 16-byte fmt + data
      * chunk header) for the given parameters — the fixture generator's
      * audio "encoder". */
    def wavHeader(sampleRate: Long, channels: Long, bitsPerSample: Long,
        dataLen: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val blockAlign = (channels * bitsPerSample / 8).toInt
      out.put("RIFF".getBytes("US-ASCII")).putInt((36 + dataLen).toInt)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1.toShort).putShort(channels.toShort)
      out.putInt(sampleRate.toInt)
      out.putInt((sampleRate * blockAlign).toInt)
      out.putShort(blockAlign.toShort).putShort(bitsPerSample.toShort)
      out.put("data".getBytes("US-ASCII")).putInt(dataLen.toInt)
      out.array()
    }

    /** SOI + APP0/JFIF + SOF0 (baseline, 3 components) — 39 bytes. */
    def jpegHeader(width: Long, height: Long): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(39)
      out.put(Array[Byte](0xff.toByte, 0xd8.toByte))                  // SOI
      out.put(Array[Byte](0xff.toByte, 0xe0.toByte, 0x00, 0x10))      // APP0, len 16
      out.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      out.put(Array[Byte](0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00))
      out.put(Array[Byte](0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08)) // SOF0, len 17, prec 8
      out.putShort(height.toShort).putShort(width.toShort)
      out.put(3.toByte)                                               // 3 components
      out.put(Array[Byte](0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01))
      out.array()
    }
  }

  /** One decoded media row across modalities: image rows carry parsed
    * width/height and -1 audio fields, wav rows the reverse — a fleet
    * media-metadata table keeps one schema and filters by format. */
  case class DecodedMedia(media_id: Long, n_bytes: Long, format: String,
      width: Long, height: Long, sample_rate: Long, channels: Long,
      bits_per_sample: Long, brightness: Double, content_hash: String)

  /** Deterministic decodable dimensions — the generator writes them into
    * the headers; the ORACLE recomputes them from media_id alone, so the
    * byte-level parse in [[decodeFeatures]] is verified against an
    * independent derivation (construction and parse share no offsets). */
  private def dimsOf(mediaId: Long): (Long, Long) =
    (16L + mediaId % 624, 16L + mediaId % 464)

  /** Deterministic decodable audio parameters for wav rows — same
    * independent-derivation contract as [[dimsOf]]. */
  private def audioOf(mediaId: Long): (Long, Long, Long) =
    (Seq(8000L, 16000L, 22050L, 44100L, 48000L)((mediaId % 5).toInt),
      1L + mediaId % 2,
      Seq(8L, 16L, 24L, 32L)((mediaId % 4).toInt))

  /** Media table with REAL format headers: png/jpeg rows carry a valid
    * signature+dimension header, wav rows a valid RIFF/fmt/data header,
    * in front of the payload (the document's UTF-8 bytes). A narrow
    * typed map — the generator is the test fixture's "encoder". */
  def decodableMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val fmt = Seq("png", "jpeg", "wav")((id % 3).toInt)
        val (w, h) = dimsOf(id)
        val bytes = fmt match {
          case "png"  => MediaCodec.pngHeader(w, h) ++ payload
          case "jpeg" => MediaCodec.jpegHeader(w, h) ++ payload
          case _ =>
            val (rate, ch, bits) = audioOf(id)
            MediaCodec.wavHeader(rate, ch, bits, payload.length.toLong) ++ payload
        }
        MediaRow(id, bytes, fmt)
    }
  }

  /** The q23 shape with the stub seam REPLACED by real header parses
    * for ALL THREE formats (PNG IHDR, JPEG SOF, WAV RIFF/fmt): the
    * typed fields come from the bytes, brightness/hash from the payload
    * after the parsed header offset. Same typed mapPartitions batch
    * shape. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, rate, ch, bits, off) = r.format match {
          case "png" =>
            val (pw, ph, o) = MediaCodec.parsePng(r.media)
            (pw, ph, -1L, -1L, -1L, o)
          case "jpeg" =>
            val (jw, jh, o) = MediaCodec.parseJpeg(r.media)
            (jw, jh, -1L, -1L, -1L, o)
          case _ =>
            val (wr, wc, wb, o) = MediaCodec.parseWav(r.media)
            (-1L, -1L, wr, wc, wb, o)
        }
        val payload = java.util.Arrays.copyOfRange(r.media, off, r.media.length)
        var sum = 0L
        var i = 0
        while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
        val brightness =
          if (payload.length == 0) 0.0 else sum.toDouble / payload.length
        md.reset()
        val hash = md.digest(payload).map("%02x".format(_)).mkString
        DecodedMedia(r.media_id, r.media.length.toLong, r.format,
          w, h, rate, ch, bits, brightness, hash)
      }
    }
  }

  /** Real PCM sample statistics over a WAV payload — the audio-side
    * "pixel decode": [[MediaCodec.parseWav]] locates the `data` chunk
    * and declares the bit depth; the samples are then decoded per the
    * PCM spec (8-bit = unsigned with a 128 midpoint, 16/24/32-bit =
    * signed little-endian two's complement; a trailing partial sample
    * is ignored) and reduced to the statistics an audio-curation gate
    * filters on: sample count, mean amplitude (DC offset), peak
    * |amplitude|, and RMS at the declared depth. Stats pool all
    * channels (a stereo frame contributes each channel's sample).
    *
    * Cross-engine exactness: the mean rides on an exact int64 sum; the
    * RMS on an exact int128 sum of squares (primitive hi/lo carry
    * accumulation per sample — a 32-bit square is up to 2^62, so the
    * SUM overflows int64 on real payloads; one correctly-rounded
    * BigInteger→double conversion per ROW). NOTE the oracle must NOT
    * use DuckDB's direct HUGEINT→DOUBLE cast for these sums — it
    * rounds twice (hi·2⁶⁴ + lo as floats; measured as a 1-ulp rms hash
    * mismatch at sf0.1) — so [[qPcmStatsSql]] routes both sums through
    * the exact decimal string (`::VARCHAR::DOUBLE`, correctly-rounded
    * strtod); with that, every float op after the exact integer sums
    * is a single correctly-rounded IEEE op on both sides. A malformed
    * wav yields the usual filterable sentinel (n_samples = -1, zero
    * stats). */
  case class PcmStats(media_id: Long, sample_rate: Long, channels: Long,
      bits_per_sample: Long, n_samples: Long, mean_amp: Double,
      peak_abs: Long, rms: Double)

  def pcmStats(media: Dataset[MediaRow]): Dataset[PcmStats] = {
    import media.sparkSession.implicits._
    media.filter(col("format") === "wav").mapPartitions { rows =>
      rows.map { r =>
        val (rate, ch, bits, off) = MediaCodec.parseWav(r.media)
        // a structurally valid RIFF whose fmt declares a width we can't
        // decode (bits not a whole small byte count) is malformed FOR
        // THIS DECODER: same filterable sentinel, never a thrown task
        // (bits=0 would divide by zero below; bits>64 would wrap the
        // little-endian shift into garbage)
        if (rate < 0 || !DecodableDepths.contains(bits))
          PcmStats(r.media_id, -1L, -1L, -1L, -1L, 0.0, 0L, 0.0)
        else {
          val w = (bits / 8).toInt
          val n = (r.media.length - off) / w
          var sum = 0L; var peak = 0L
          var sqHi = 0L; var sqLo = 0L // int128 accumulator for Σ s²
          var k = 0
          while (k < n) {
            val base = off + k * w
            var raw = 0L
            var j = 0
            while (j < w) {
              raw |= (r.media(base + j) & 0xffL) << (8 * j); j += 1
            }
            val s =
              if (w == 1) raw - 128L
              else {
                val half = 1L << (8 * w - 1)
                if (raw >= half) raw - (half << 1) else raw
              }
            sum += s
            val a = math.abs(s)
            if (a > peak) peak = a
            val sq = s * s // ≤ 2^62: each square fits, only the sum can't
            val nlo = sqLo + sq
            if (java.lang.Long.compareUnsigned(nlo, sqLo) < 0) sqHi += 1
            sqLo = nlo
            k += 1
          }
          val (mean, rms) =
            if (n == 0L) (0.0, 0.0)
            else {
              val sumSq = java.math.BigInteger.valueOf(sqHi).shiftLeft(64)
                .add(new java.math.BigInteger(
                  java.lang.Long.toUnsignedString(sqLo)))
              (sum.toDouble / n, math.sqrt(sumSq.doubleValue / n))
            }
          PcmStats(r.media_id, rate, ch, bits, n, mean, peak, rms)
        }
      }
    }
  }

  /** PCM widths [[pcmStats]] can decode; a parseable wav declaring any
    * other depth is quarantine class `undecodable_depth`. */
  val DecodableDepths: Set[Long] = Set(8L, 16L, 24L, 32L)

  /** Failure class of one media row — "ok" when the row's declared
    * format parses (and, for wav, declares a decodable PCM depth).
    * One cheap header walk; payload bytes are never touched. */
  def mediaIssue(format: String, b: Array[Byte]): String = format match {
    case "png"  => MediaCodec.pngIssue(b).getOrElse("ok")
    case "jpeg" => MediaCodec.jpegIssue(b).getOrElse("ok")
    case _ => MediaCodec.wavIssue(b).getOrElse {
      val (_, _, bits, _) = MediaCodec.parseWav(b)
      if (DecodableDepths.contains(bits)) "ok" else "undecodable_depth"
    }
  }

  case class QuarantinedMedia(media_id: Long, format: String,
      reason: String, n_bytes: Long)

  /** The dead-letter variant of [[decodeFeatures]]: route every row to
    * (good, quarantined) instead of mixing sentinel rows into the good
    * relation. At 100-TB curation scale the quarantine relation is what
    * an operator actually wants from decode failures — a typed
    * parse-failure REASON per object, routed to its own sink, not a
    * -1 sentinel every downstream filter must know about. The split is
    * two narrow passes over the same scan (the classifier walks only
    * header bytes, so the repeated walk costs ~nothing next to the
    * payload decode); rows are PARTITIONED exactly (spec-pinned:
    * good ∪ quarantine = input, good ∩ quarantine = ∅). */
  def decodeRouted(media: Dataset[MediaRow])
      : (Dataset[DecodedMedia], Dataset[QuarantinedMedia]) = {
    import media.sparkSession.implicits._
    val good = decodeFeatures(
      media.filter(r => mediaIssue(r.format, r.media) == "ok"))
    val quarantined = media
      .map(r => QuarantinedMedia(r.media_id, r.format,
        mediaIssue(r.format, r.media), r.media.length.toLong))
      .filter(_.reason != "ok")
    (good, quarantined)
  }

  // ---- SparkEntry wiring -------------------------------------------------

  /** Malformed-media fixture for q79 (ids disjoint from the corpus):
    * every quarantine class of every format, each blob a real header
    * surgically corrupted ONE way, plus one good row per format. The
    * third element is the DECLARED failure class — the engine derives
    * its own from the bytes, the oracle replays the declaration, so a
    * classifier drift hash-fails. */
  val QuarantineFixture: Seq[(Long, String, String, Array[Byte])] = {
    val payload = "quarantine fixture payload bytes 0123456789abc"
      .getBytes("US-ASCII") // 46 bytes, even: the no_data walk's chunk
                            // padding then lands exactly at end-of-file
    def png = MediaCodec.pngHeader(20, 10) ++ payload
    def jpg = MediaCodec.jpegHeader(20, 10) ++ payload
    def wav(bits: Long) =
      MediaCodec.wavHeader(16000, 1, bits, payload.length.toLong) ++ payload
    def mut(b: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone(); f(c); c
    }
    Seq(
      (5000000L, "png", "ok", png),
      (5000001L, "png", "truncated_header", png.take(20)),
      (5000002L, "png", "bad_signature", mut(png)(_(0) = 'X'.toByte)),
      (5000003L, "png", "bad_ihdr", mut(png)(_(12) = 'J'.toByte)),
      (5000010L, "jpeg", "ok", jpg),
      (5000011L, "jpeg", "bad_signature", jpg.drop(1)),
      // APP0 length bytes (offset 4-5) -> 0xffff: segment overruns
      (5000012L, "jpeg", "bad_segment",
        mut(jpg) { c => c(4) = 0xff.toByte; c(5) = 0xff.toByte }),
      // SOI + APP0 then a non-marker payload byte: the walk stops with
      // no SOF frame header seen
      (5000013L, "jpeg", "no_sof", jpg.take(20) ++ payload),
      (5000020L, "wav", "ok", wav(16)),
      (5000021L, "wav", "bad_container",
        mut(wav(16))(_(11) = 'X'.toByte)), // WAVE -> WAVX
      // data chunk size (offset 40-43 le32) claims more than the file
      (5000022L, "wav", "bad_chunk", mut(wav(16))(_(40) = 0xff.toByte)),
      // fmt chunk size (offset 16-19 le32) -> 8: shorter than a fmt
      (5000023L, "wav", "bad_fmt", mut(wav(16))(_(16) = 8.toByte)),
      // RIFF/WAVE then data with no fmt chunk before it
      (5000024L, "wav", "missing_fmt",
        "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
          "WAVE".getBytes("US-ASCII") ++ {
            val hdr = java.nio.ByteBuffer.allocate(8)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            hdr.put("data".getBytes("US-ASCII")).putInt(payload.length)
            hdr.array()
          } ++ payload),
      // the data tag renamed: the walk runs off the end of the file
      (5000025L, "wav", "no_data",
        mut(wav(16)) { c => c(36) = 'l'.toByte; c(37) = 'a'.toByte
          c(38) = 't'.toByte; c(39) = 'e'.toByte }),
      // structurally valid, but fmt declares 12-bit PCM
      (5000026L, "wav", "undecodable_depth", wav(12)))
  }

  /** q79: the quarantine audit over corpus media ∪ the malformed
    * fixture — per (format, failure class) row and byte totals, the
    * relation a curation run's dead-letter dashboard reads. Organic
    * generator media all decode ("ok" rows, data-dependent counts);
    * the fixture populates every failure class. */
  def qMediaQuarantine(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = decodableMediaTable(Tables.documents(s, d))
      .union(QuarantineFixture
        .map { case (id, fmt, _, bytes) => MediaRow(id, bytes, fmt) }
        .toDS())
    media
      .map(r => (r.format, mediaIssue(r.format, r.media),
        r.media.length.toLong))
      .toDF("format", "reason", "n_bytes")
      .groupBy("format", "reason")
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("sum_bytes"))
      .orderBy("format", "reason")
  }

  /** The oracle: organic rows are 'ok' by construction (generator
    * header size + payload bytes), fixture rows replay their DECLARED
    * class and real blob length — agreement pins the classifier's
    * decision AND the byte accounting for every failure class. */
  val qMediaQuarantineSql: String = {
    val fxRows = QuarantineFixture.map { case (_, fmt, reason, bytes) =>
      s"('$fmt', '$reason', ${bytes.length})"
    }.mkString(", ")
    s"""WITH organic AS (
       |  SELECT ['png', 'jpeg', 'wav'][(doc_id % 3 + 1)::INT] AS format,
       |         'ok' AS reason,
       |         octet_length(encode(text))
       |           + CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 39 ELSE 44 END
       |           AS n_bytes
       |  FROM documents),
       |fx(format, reason, n_bytes) AS (VALUES $fxRows),
       |allrows AS (SELECT * FROM organic UNION ALL SELECT * FROM fx)
       |SELECT format, reason, COUNT(*)::BIGINT AS n_media,
       |       SUM(n_bytes)::BIGINT AS sum_bytes
       |FROM allrows GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** q23: the media-feature projection every modality shares (id, size,
    * format, image dims, payload brightness, payload hash) — since r17
    * a straight projection of the REAL decode ([[decodeFeatures]]; wav
    * rows read the image sentinel -1×-1), not a stub path. */
  def qMediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeFeatures(decodableMediaTable(Tables.documents(s, d)))
      .toDF()
      .select(col("media_id"), col("n_bytes"), col("format"),
        col("width"), col("height"), col("brightness"), col("content_hash"))
      .orderBy("media_id")
  }

  /** Projection of [[qMediaDecodeSql]]'s independent re-derivation
    * (dims from media_id, brightness over the UTF-8 payload BYTES —
    * `bytes(i) & 0xff` ≡ hex-pair parse; a per-character
    * `unicode(text[i])` formulation would only agree on ASCII). */
  val qMediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(encode(text))
      |            + CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 39 ELSE 44 END
      |            AS BIGINT) AS n_bytes,
      |       ['png', 'jpeg', 'wav'][(doc_id % 3 + 1)::INT] AS format,
      |       CAST(CASE WHEN doc_id % 3 = 2 THEN -1
      |                 ELSE 16 + doc_id % 624 END AS BIGINT) AS width,
      |       CAST(CASE WHEN doc_id % 3 = 2 THEN -1
      |                 ELSE 16 + doc_id % 464 END AS BIGINT) AS height,
      |       list_sum(list_transform(range(0, octet_length(encode(text))),
      |                               i -> ('0x' || substr(hex(encode(text)), (i*2+1)::INT, 2))::INT))::DOUBLE
      |         / octet_length(encode(text)) AS brightness,
      |       md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin

  def qMediaDecode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    decodeFeatures(decodableMediaTable(Tables.documents(s, d)))
      .toDF().orderBy("media_id")
  }

  /** The oracle never parses bytes: it re-derives width/height (images)
    * and sample_rate/channels/bits (wav) from media_id — the generator's
    * independent formulas — and payload brightness/hash from the text,
    * so a parser reading the wrong offset, endianness, or chunk fails
    * the hash even though the generator and parser live in the same
    * file. Header sizes (33-byte PNG, 39-byte JPEG, 44-byte WAV) are
    * the generator's fixed layouts. */
  val qMediaDecodeSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(encode(text))
      |            + CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 39 ELSE 44 END
      |            AS BIGINT) AS n_bytes,
      |       ['png', 'jpeg', 'wav'][(doc_id % 3 + 1)::INT] AS format,
      |       CAST(CASE WHEN doc_id % 3 = 2 THEN -1
      |                 ELSE 16 + doc_id % 624 END AS BIGINT) AS width,
      |       CAST(CASE WHEN doc_id % 3 = 2 THEN -1
      |                 ELSE 16 + doc_id % 464 END AS BIGINT) AS height,
      |       CAST(CASE WHEN doc_id % 3 = 2
      |                 THEN [8000, 16000, 22050, 44100, 48000][(doc_id % 5 + 1)::INT]
      |                 ELSE -1 END AS BIGINT) AS sample_rate,
      |       CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 2
      |                 ELSE -1 END AS BIGINT) AS channels,
      |       CAST(CASE WHEN doc_id % 3 = 2
      |                 THEN [8, 16, 24, 32][(doc_id % 4 + 1)::INT]
      |                 ELSE -1 END AS BIGINT) AS bits_per_sample,
      |       list_sum(list_transform(range(0, octet_length(encode(text))),
      |                               i -> ('0x' || substr(hex(encode(text)), (i*2+1)::INT, 2))::INT))::DOUBLE
      |         / octet_length(encode(text)) AS brightness,
      |       md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin

  def qFrameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(mediaTable(Tables.documents(s, d))).orderBy("media_id", "frame_idx")

  /** q75: real PCM sample statistics over every wav row's payload. */
  def qPcmStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    pcmStats(decodableMediaTable(Tables.documents(s, d)))
      .toDF().orderBy("media_id")
  }

  /** The oracle re-derives the STATISTICS FROM THE PAYLOAD BYTES
    * independently of the engine's chunk walk: wav rows are
    * doc_id % 3 = 2, the declared depth replays the generator's
    * media_id formula, the payload is the document's UTF-8 bytes
    * (44-byte canonical header skipped by construction, not by
    * parsing), and each sample is reassembled from its little-endian
    * hex pairs with the same 8-bit-unsigned / two's-complement rule.
    * DuckDB's SUM over BIGINT promotes to HUGEINT, so the sum of
    * squares is exact like the engine's int128 accumulator; both sides
    * then perform the identical correctly-rounded double ops. The ONE
    * subtlety (found by a 1-ulp hash mismatch at sf0.1): DuckDB's
    * direct HUGEINT→DOUBLE cast rounds twice (hi·2⁶⁴ + lo as floats),
    * while the engine's BigInteger conversion rounds once — so the
    * oracle routes the conversion through the exact decimal string
    * (`::VARCHAR::DOUBLE`, correctly-rounded strtod), restoring
    * single-rounding on both sides. */
  val qPcmStatsSql: String = {
    // byte j of the payload as a BIGINT (hex pairs, 1-based substr),
    // TOTAL: out-of-range reads 0 so the unused high-byte terms of
    // narrow widths never parse '0x' + empty (eager CASE evaluation in
    // a vectorized engine must not be able to error on them)
    def b(j: String) =
      s"(CASE WHEN ($j) < nb THEN ('0x' || substr(hx, (($j)*2+1)::INT, 2))::BIGINT ELSE 0 END)"
    // little-endian raw value of sample k at width w (exact BIGINT)
    val raw = s"${b("k*w")} + CASE WHEN w >= 2 THEN 256 * ${b("k*w+1")} ELSE 0 END" +
      s" + CASE WHEN w >= 3 THEN 65536 * ${b("k*w+2")} ELSE 0 END" +
      s" + CASE WHEN w >= 4 THEN 16777216 * ${b("k*w+3")} ELSE 0 END"
    val half = "CASE w WHEN 2 THEN 32768 WHEN 3 THEN 8388608 ELSE 2147483648 END"
    val full = "CASE w WHEN 2 THEN 65536 WHEN 3 THEN 16777216 ELSE 4294967296 END"
    s"""WITH wavs AS (
       |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text)) AS nb,
       |         [1, 2, 3, 4][(doc_id % 4 + 1)::INT] AS w,
       |         [8000, 16000, 22050, 44100, 48000][(doc_id % 5 + 1)::INT] AS rate,
       |         1 + doc_id % 2 AS ch,
       |         [8, 16, 24, 32][(doc_id % 4 + 1)::INT] AS bits
       |  FROM documents WHERE doc_id % 3 = 2),
       |smp AS (
       |  SELECT media_id, rate, ch, bits, nb // w AS n_samples,
       |         list_transform(range(0, nb // w), k ->
       |           CASE WHEN w = 1 THEN ${b("k*w")} - 128
       |                WHEN ($raw) >= $half THEN ($raw) - $full
       |                ELSE ($raw) END) AS samples
       |  FROM wavs)
       |SELECT media_id,
       |       CAST(rate AS BIGINT) AS sample_rate,
       |       CAST(ch AS BIGINT) AS channels,
       |       CAST(bits AS BIGINT) AS bits_per_sample,
       |       CAST(n_samples AS BIGINT) AS n_samples,
       |       CASE WHEN n_samples = 0 THEN 0.0
       |            ELSE (list_sum(samples)::VARCHAR)::DOUBLE / n_samples
       |            END AS mean_amp,
       |       CAST(CASE WHEN n_samples = 0 THEN 0
       |                 ELSE list_max(list_transform(samples, s -> abs(s)))
       |            END AS BIGINT) AS peak_abs,
       |       CASE WHEN n_samples = 0 THEN 0.0
       |            ELSE sqrt((list_sum(list_transform(samples, s -> s * s))
       |                       ::VARCHAR)::DOUBLE
       |                      / n_samples) END AS rms
       |FROM smp ORDER BY media_id""".stripMargin
  }

  /** Chunking here is CHAR-indexed (`substr`/`len`) while Spark chunks
    * the binary BYTE-wise; DuckDB cannot md5 a blob slice, so the oracle
    * relies on the fixture contract that document text is pure ASCII
    * (TESTDATA.md — one byte per char makes the two identical). The
    * byte-exact q23 brightness above has no such dependency. */
  val qFrameSampleSql: String =
    """WITH idx AS (
      |  SELECT doc_id AS media_id, text,
      |         unnest(range(0, ((len(text) - 1) // 64) + 1)) AS i
      |  FROM documents),
      |f AS (
      |  SELECT media_id, i AS frame_idx,
      |         substr(text, (i * 64 + 1)::INT, 64) AS chunk
      |  FROM idx WHERE i % 4 = 0)
      |SELECT media_id, frame_idx, md5(chunk) AS frame_hash,
      |       CAST(len(chunk) AS BIGINT) AS frame_bytes
      |FROM f ORDER BY media_id, frame_idx""".stripMargin
}
