package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.media.Media

/** HeaderCodec on REAL format bytes (hand-assembled minimal headers per
  * the public specs: PNG ISO 15948, JPEG ITU T.81, GIF89a, RIFF/WAVE) and
  * the stub fallback for unrecognised payloads. */
class MediaCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  val png: Array[Byte] = bytes(
    0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, // signature
    0x00, 0x00, 0x00, 0x0d) ++ "IHDR".getBytes ++ bytes(
    0x00, 0x00, 0x02, 0x80, // width 640
    0x00, 0x00, 0x01, 0xe0) // height 480

  val jpeg: Array[Byte] = bytes(
    0xff, 0xd8, // SOI
    0xff, 0xe0, 0x00, 0x04, 0x00, 0x00, // APP0, length 4
    0xff, 0xc0, 0x00, 0x11, 0x08, // SOF0, length 17, precision 8
    0x01, 0x00, // height 256
    0x02, 0x00, // width 512
    0x03)

  val gif: Array[Byte] = "GIF89a".getBytes ++ bytes(
    0x40, 0x01, // width 320 (LE)
    0xc8, 0x00) // height 200 (LE)

  val wav: Array[Byte] = "RIFF".getBytes ++ bytes(0x24, 0x00, 0x00, 0x00) ++
    "WAVE".getBytes ++ "fmt ".getBytes ++ bytes(
    0x10, 0x00, 0x00, 0x00, // fmt chunk size 16
    0x01, 0x00, // PCM
    0x02, 0x00, // 2 channels
    0x44, 0xac, 0x00, 0x00, // 44100 Hz (LE)
    0x10, 0xb1, 0x02, 0x00, // byte rate
    0x04, 0x00, // block align 4
    0x10, 0x00) ++ // 16 bits
    "data".getBytes ++ bytes(0x08, 0x00, 0x00, 0x00) ++ // data size 8
    Array.fill[Byte](8)(0)

  test("PNG IHDR width/height parse from real bytes") {
    assert(Media.HeaderCodec.decode("image", png) == ((640, 480, 0, 1)))
  }

  test("JPEG SOF0 frame header parses through a preceding APP segment") {
    assert(Media.HeaderCodec.decode("image", jpeg) == ((512, 256, 0, 1)))
  }

  test("JPEG 0xFF fill bytes before a marker are skipped, not length-decoded (ITU T.81 B.1.1.2)") {
    // ff d8 ff ff ff c0 ...: the old scan read the fill byte as a segment
    // marker and jumped 2+u16be(garbage) bytes past the real SOF
    val padded = bytes(0xff, 0xd8, 0xff, 0xff) ++ jpeg.drop(8)
    assert(Media.HeaderCodec.decode("image", padded) == ((512, 256, 0, 1)))
  }

  test("WAV frame count caps at Int.MaxValue instead of wrapping negative") {
    // data size 0xFFFFFFF0 with block align 1 -> frames would be ~2^32
    val big = "RIFF".getBytes ++ bytes(0x24, 0x00, 0x00, 0x00) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++ bytes(
      0x10, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00,
      0x44, 0xac, 0x00, 0x00, 0x44, 0xac, 0x00, 0x00,
      0x01, 0x00, // block align 1
      0x08, 0x00) ++
      "data".getBytes ++ bytes(0xf0, 0xff, 0xff, 0xff)
    val (_, _, rate, frames) = Media.HeaderCodec.decode("audio", big)
    assert(rate == 44100 && frames == Int.MaxValue)
  }

  test("sampleFrames rejects non-positive stride on the driver") {
    import spark.implicits._
    val feats = spark.emptyDataset[Media.MediaFeatures]
    intercept[IllegalArgumentException] { Media.sampleFrames(feats, 0, 10) }
    intercept[IllegalArgumentException] { Media.sampleFrames(feats, 4, 0) }
  }

  test("GIF89a logical screen descriptor parses") {
    assert(Media.HeaderCodec.decode("image", gif) == ((320, 200, 0, 1)))
  }

  test("WAV fmt chunk sample rate + data frames parse") {
    // 8 data bytes / block align 4 = 2 frames
    assert(Media.HeaderCodec.decode("audio", wav) == ((0, 0, 44100, 2)))
  }

  test("malformed WAV with a near-2^32 chunk size terminates (no executor spin)") {
    // chunk size 0xFFFFFFF8: the old Int advance truncated it to a zero
    // step and parse() never returned; the Long walk runs off the end and
    // the fmt data already read still yields a result
    val evil = "RIFF".getBytes ++ bytes(0x24, 0x00, 0x00, 0x00) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++ bytes(
      0xf8, 0xff, 0xff, 0xff, // chunk size 4294967288 (u32 LE)
      0x01, 0x00, 0x02, 0x00,
      0x44, 0xac, 0x00, 0x00, // 44100 Hz
      0x10, 0xb1, 0x02, 0x00, 0x04, 0x00, 0x10, 0x00)
    assert(Media.HeaderCodec.decode("audio", evil) == ((0, 0, 44100, 0)))
    // and a size that overflows past the buffer mid-walk stops cleanly too
    val evil2 = wav.clone()
    evil2(40) = 0xff.toByte; evil2(41) = 0xff.toByte // data size -> huge
    evil2(42) = 0xff.toByte; evil2(43) = 0x7f.toByte
    val r2 = Media.HeaderCodec.decode("audio", evil2)
    assert(r2._3 == 44100)
  }

  test("unrecognised payloads fall back to the deterministic stub") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 5).toByte)
    assert(Media.HeaderCodec.decode("image", junk) == Media.StubCodec.decode("image", junk))
    assert(Media.HeaderCodec.decode("audio", junk) == Media.StubCodec.decode("audio", junk))
  }

  test("craftedMedia rows decode to exactly the oracle's literal expectations") {
    // these tuples are duplicated as VALUES literals in the m_media_features
    // oracle SQL (Queries2) — this spec pins the Scala side to them
    val got = Media.extractFeatures(Media.craftedMedia(spark), Media.HeaderCodec).collect()
      .map(f => (f.media_id, f.kind, f.n_bytes, f.width, f.height, f.sample_rate, f.n_frames))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1000L, "image", 24L, 640, 480, 0, 1),
      (1001L, "image", 18L, 512, 256, 0, 1),
      (1002L, "image", 10L, 320, 200, 0, 1),
      (1003L, "audio", 52L, 0, 0, 44100, 2)))
  }

  test("extractFeatures with HeaderCodec carries real header metadata through the batch path") {
    import spark.implicits._
    val media = Seq((1L, "image", png), (2L, "audio", wav))
      .toDF("media_id", "kind", "payload")
    val rows = Media.extractFeatures(media, Media.HeaderCodec).collect()
      .map(f => f.media_id -> f).toMap
    assert(rows(1L).width == 640 && rows(1L).height == 480)
    assert(rows(2L).sample_rate == 44100 && rows(2L).n_frames == 2)
  }

  // a real 3-frame animated GIF: LSD 320x200, a graphic control extension
  // before frame 2, minimal LZW sub-blocks per frame, 0x3B trailer
  val gif3: Array[Byte] = {
    def frame(left: Int, top: Int): Array[Byte] =
      bytes(0x2c, left, 0x00, top, 0x00, 0x10, 0x00, 0x10, 0x00, // 16x16 at (left,top)
        0x00, // no local colour table
        0x02, // LZW min code size
        0x01, 0x44, // one 1-byte data sub-block
        0x00) // sub-block terminator
    val gce = bytes(0x21, 0xf9, 0x04, 0x00, 0x0a, 0x00, 0x00, 0x00)
    "GIF89a".getBytes ++ bytes(0x40, 0x01, 0xc8, 0x00, 0x00, 0x00, 0x00) ++
      frame(0, 0) ++ gce ++ frame(16, 0) ++ frame(32, 0) ++ bytes(0x3b)
  }

  test("multi-frame GIF: real block walk counts frames; sample + resize plans run on them") {
    import spark.implicits._
    assert(Media.HeaderCodec.parse(gif3).contains((320, 200, 0, 3)))
    // truncated-header GIF keeps the 1-frame default (oracle row 1002 pinned)
    assert(Media.HeaderCodec.parse(gif).contains((320, 200, 0, 1)))

    val media = Seq((7L, "video", gif3)).toDF("media_id", "kind", "payload")
    val feats = Media.extractFeatures(media, Media.HeaderCodec)
    assert(feats.collect().head.n_frames == 3)
    // frame sampling: stride 2 over 3 frames -> indices 0, 2
    val sampled = Media.sampleFrames(feats, stride = 2, maxFrames = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(sampled.toSeq == Seq((7L, 0), (7L, 2)))
    // resize: 320x200 into a 100x100 box, aspect preserved
    val rp = Media.resizePlan(feats, maxW = 100, maxH = 100).collect().head
    assert(rp.getAs[Int]("target_width") == 100 && rp.getAs[Int]("target_height") == 63)
  }
}
