package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** Multimodal plumbing contracts: binary round-trip, batch decode,
  * resize/frame-sample math. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(payloads: (Long, String)*): org.apache.spark.sql.Dataset[MediaRow] =
    payloads.map { case (id, s) =>
      MediaRow(id, Seq("image", "audio", "video")((id % 3).toInt),
        s.getBytes("UTF-8"), 32, 24, 10)
    }.toDS()

  test("decodeStub widens bytes unsigned-deterministically") {
    assert(Multimodal.decodeStub(Array(0.toByte, 127.toByte, 255.toByte))
      .sameElements(Array(0, 127, 255)))
  }

  test("extractFeatures: batch iterator yields histogram features summing to 1") {
    val out = Multimodal.extractFeatures(media((0L, "abcabc"), (1L, ""))).collect()
      .sortBy(_.media_id)
    assert(out(0).n_bytes == 6L)
    assert(math.abs(out(0).features.sum - 1.0) < 1e-9)
    assert(out(0).mean_sample == "abcabc".getBytes.map(_.toLong).sum.toDouble / 6)
    assert(out(1).n_bytes == 0L && out(1).mean_sample == 0.0)
  }

  test("resize subsamples payload and scales metadata with floor-1 guard") {
    val out = Multimodal.resize(media((0L, "abcdefghij")), 4).collect()(0)
    assert(new String(out.payload, "UTF-8") == "aei") // indices 0,4,8
    assert(out.width == 8 && out.height == 6)
    val tiny = Multimodal.resize(media((0L, "ab")), 100).collect()(0)
    assert(tiny.width == 1 && tiny.height == 1)
  }

  test("frameSample keeps every stride-th frame and updates n_frames") {
    // 10 bytes, 3-byte frames -> 4 frames (last is 1 byte); stride 2 keeps frames 0,2
    val out = Multimodal.frameSample(media((0L, "abcdefghij")), 3, 2).collect()(0)
    assert(new String(out.payload, "UTF-8") == "abcghi")
    assert(out.n_frames == 2)
  }

  test("mediaFromDocuments: payload round-trips text bytes through binary") {
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val m = Multimodal.mediaFromDocuments(docs).collect()(0)
    assert(m.media_id == 7L && m.kind == "audio") // 7 % 3 = 1
    assert(new String(m.payload, "UTF-8") == "hello world")
  }
}
