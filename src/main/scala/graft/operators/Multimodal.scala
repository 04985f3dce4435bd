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
  * The actual byte decode is STUBBED — no image/audio codecs exist in
  * this environment — with a deterministic fake (`fakeDecode`) whose
  * outputs are reproducible in SQL, so the Spark-side plumbing (schema,
  * binary handling, partition batching, UDF signature) is real and
  * oracle-checked end to end while the codec call is an explicit seam.
  *
  * Scale notes: media rows are wide (MBs per row at 100 TB); the
  * pipeline keeps them in one narrow pass (no shuffle), and metadata-only
  * queries prune the binary column at the parquet scan (columnar layout
  * means the bytes are never read — verified via ReadSchema in explain).
  */
object Multimodal {

  case class MediaRow(media_id: Long, media: Array[Byte], format: String)
  case class MediaFeatures(media_id: Long, n_bytes: Long, format: String,
      width: Long, height: Long, brightness: Double, content_hash: String)

  /** Make an opaque-binary media table from the documents fixture (UTF-8
    * bytes stand in for encoded media; format cycles deterministically). */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))

  /** STUB decoder — deterministic fake standing in for a real codec
    * (`javax.imageio` / ffmpeg / soundfile are not in this container).
    * Derives pseudo-dimensions and a brightness proxy from the bytes;
    * replace the body with a real decode to productionize. The formulas
    * are intentionally SQL-expressible so the oracle can verify the
    * surrounding plumbing. */
  def fakeDecode(bytes: Array[Byte]): (Long, Long, Double) = {
    val n = bytes.length.toLong
    val width = n % 640
    val height = n % 480
    // mean byte value (unsigned) in [0, 255] — "brightness". Exact integer
    // sum / integer length: bit-identical across engines, no rounding.
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val brightness = if (n == 0) 0.0 else sum.toDouble / n
    (width, height, brightness)
  }

  /** Batch feature extraction over binary media: typed mapPartitions —
    * the per-partition iterator is where a real implementation opens the
    * codec once and streams the batch through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: open decoder/model ONCE here, reuse across the batch
      rows.map { r =>
        val (w, h, bright) = fakeDecode(r.media)
        val hash = java.security.MessageDigest.getInstance("MD5")
          .digest(r.media).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.media.length.toLong, r.format,
          w, h, bright, hash)
      }
    }
  }

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

  // ---- SparkEntry wiring -------------------------------------------------

  def qMediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(Tables.documents(s, d)).as[MediaRow]
    extractFeatures(media).toDF().orderBy("media_id")
  }

  /** Brightness sums the UTF-8 BYTES (hex(encode(text)) two chars per
    * byte), exactly like the Spark side's `bytes(i) & 0xff` loop — a
    * per-character `unicode(text[i])` formulation would only agree on
    * ASCII input. */
  val qMediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       ['png', 'jpeg', 'wav'][(doc_id % 3 + 1)::INT] AS format,
      |       octet_length(encode(text)) % 640 AS width,
      |       octet_length(encode(text)) % 480 AS height,
      |       list_sum(list_transform(range(0, octet_length(encode(text))),
      |                               i -> ('0x' || substr(hex(encode(text)), (i*2+1)::INT, 2))::INT))::DOUBLE
      |         / octet_length(encode(text)) AS brightness,
      |       md5(text) AS content_hash
      |FROM documents ORDER BY media_id""".stripMargin

  def qFrameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(mediaTable(Tables.documents(s, d))).orderBy("media_id", "frame_idx")

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
