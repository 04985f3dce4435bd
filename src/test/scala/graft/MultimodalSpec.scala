package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaCodec

/** The header-level media decoder (q66): real PNG IHDR / JPEG SOF byte
  * parsing, pinned on hand-crafted headers — including layouts the
  * fixture generator never produces (extra segments, progressive SOF2,
  * truncation, corrupt signatures), so the parser is verified as a
  * decoder, not as the generator's mirror image. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("PNG IHDR parse: round-trip, hand-built header, and malformed sentinels") {
    assert(MediaCodec.parsePng(MediaCodec.pngHeader(640, 480)) == (640L, 480L, 33))
    // hand-built (not via pngHeader): signature + IHDR with w=1, h=16777216+2
    // exercising all four width/height bytes big-endian
    val b = java.nio.ByteBuffer.allocate(33)
    b.put(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(1).putInt(0x01000002)
    b.put(Array[Byte](8, 2, 0, 0, 0)).putInt(0) // CRC not validated
    assert(MediaCodec.parsePng(b.array()) == (1L, 0x01000002L, 33))
    // corrupt signature, wrong chunk tag, truncation → sentinel, no throw
    val badSig = b.array().clone(); badSig(0) = 0x88.toByte
    assert(MediaCodec.parsePng(badSig) == (-1L, -1L, 0))
    val badTag = b.array().clone(); badTag(12) = 'X'
    assert(MediaCodec.parsePng(badTag) == (-1L, -1L, 0))
    assert(MediaCodec.parsePng(b.array().take(20)) == (-1L, -1L, 0))
    assert(MediaCodec.parsePng(Array.empty[Byte]) == (-1L, -1L, 0))
  }

  test("JPEG SOF parse: marker scan across segments, SOF2, and malformed sentinels") {
    assert(MediaCodec.parseJpeg(MediaCodec.jpegHeader(800, 600)) == (800L, 600L, 39))
    // a layout the generator never emits: SOI + COM segment + DHT (C4,
    // which must be SKIPPED, not read as a frame) + progressive SOF2
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        (((payload.length + 2) >> 8) & 0xff).toByte,
        ((payload.length + 2) & 0xff).toByte) ++ payload
    val sof2 = Array[Byte](8, 0x02, 0x00, 0x01, 0x00, 1, 0x01, 0x11, 0x00)
    val jpeg = Array(0xff.toByte, 0xd8.toByte) ++
      seg(0xfe, "a comment".getBytes("US-ASCII")) ++
      seg(0xc4, Array.fill[Byte](5)(0x11)) ++
      seg(0xc2, sof2) ++ Array[Byte](1, 2, 3)
    // height 0x0200 = 512, width 0x0100 = 256; offset = end of SOF2 seg
    assert(MediaCodec.parseJpeg(jpeg) == (256L, 512L, jpeg.length - 3))
    // malformed: no SOI, truncated segment length, zero-length segment
    assert(MediaCodec.parseJpeg(Array[Byte](0x12, 0x34)) == (-1L, -1L, 0))
    val truncated = MediaCodec.jpegHeader(8, 8).take(10)
    assert(MediaCodec.parseJpeg(truncated) == (-1L, -1L, 0))
    val badLen = Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xfe.toByte, 0x00.toByte, 0x01.toByte)
    assert(MediaCodec.parseJpeg(badLen) == (-1L, -1L, 0))
  }

  test("decodeFeatures parses generator headers back and isolates the payload") {
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Multimodal.decodeFeatures(Multimodal.decodableMediaTable(docs))
      .toDF().collect()
    assert(out.nonEmpty)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    docs.select(col("doc_id"), col("text")).collect().foreach { d =>
      val (id, text) = (d.getLong(0), d.getString(1))
      val r = byId(id)
      val (w, h, fmt) = (r.getLong(3), r.getLong(4), r.getString(2))
      if (fmt == "wav") {
        assert(w == text.getBytes("UTF-8").length % 640)
      } else {
        assert(w == 16L + id % 624 && h == 16L + id % 464, s"dims wrong for $id/$fmt")
      }
      // payload hash excludes the header: equals md5 of the raw text bytes
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(6) == md5, s"payload not isolated for $id/$fmt")
    }
  }
}
