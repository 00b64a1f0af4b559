package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def payloads = Seq(
    (1L, ("a" * 16 + "b" * 16).getBytes("UTF-8")), // 2 full frames
    (2L, "abc".getBytes("UTF-8")),                 // 1 partial frame
    (3L, Array.empty[Byte]),                       // no frames
  ).toDF("doc_id", "payload")

  test("frame count is ceil(bytes/16), empty payload yields none") {
    val byDoc = MultimodalDecode.decodeFrames(payloads)
      .groupByKey(_.doc_id).count().collect().toMap
    assert(byDoc == Map(1L -> 2L, 2L -> 1L))
  }

  test("null payload decodes to zero frames, not an NPE") {
    val withNull = Seq((1L, Some("abc".getBytes("UTF-8"))), (2L, None))
      .toDF("doc_id", "payload")
    val byDoc = MultimodalDecode.decodeFrames(withNull)
      .groupByKey(_.doc_id).count().collect().toMap
    assert(byDoc == Map(1L -> 1L)) // the null row contributes nothing
  }

  test("decoded features are deterministic and exact") {
    val frames = MultimodalDecode.decodeFrames(payloads)
      .filter(_.doc_id == 1L).collect().sortBy(_.frame_idx)
    assert(frames.map(_.luma).toSeq == Seq(97.0, 98.0)) // 'a'=97, 'b'=98
  }

  // a 2x2 24-bit BMP built by hand: stride 8 (2*3 rounded to 4-byte
  // boundary), rows bottom-up; image row 0 = pixels (1,2,3)(4,5,6),
  // image row 1 = (7,8,9)(10,11,12)
  private def tinyBmp: Array[Byte] = {
    def le(v: Int, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val bottomRow = Array[Byte](7, 8, 9, 10, 11, 12, 0, 0)
    val topRow = Array[Byte](1, 2, 3, 4, 5, 6, 0, 0)
    "BM".getBytes ++ le(54 + 16, 4) ++ le(0, 4) ++ le(54, 4) ++
      le(40, 4) ++ le(2, 4) ++ le(2, 4) ++ le(1, 2) ++ le(24, 2) ++
      le(0, 4) ++ le(16, 4) ++ le(2835, 4) ++ le(2835, 4) ++
      le(0, 4) ++ le(0, 4) ++ topRow ++ bottomRow
  }

  test("ImageIO decodes a real BMP: dims and exact channel mean") {
    val img = MultimodalDecode.decodeImages(
      Seq((7L, tinyBmp)).toDF("doc_id", "payload")).collect()
    assert(img.length == 1)
    assert(img.head.width == 2 && img.head.height == 2)
    // mean over all 12 channel bytes 1..12 = 6.5 exactly
    assert(img.head.mean_pixel == 6.5)
  }

  test("undecodable and null image payloads are skipped, not fatal") {
    val rows = MultimodalDecode.decodeImages(Seq(
      (1L, Some(tinyBmp)),
      (2L, Some("not an image at all".getBytes("UTF-8"))),
      (3L, None),
      (4L, Some(tinyBmp.take(20))), // truncated header
    ).toDF("doc_id", "payload")).collect()
    assert(rows.map(_.doc_id).toSeq == Seq(1L))
  }

  test("resize samples exact nearest-neighbor source pixels") {
    // BMP stores rows bottom-up: the first stored row (1..6) is the
    // image's BOTTOM row, so decoded y=0 holds (7,8,9)(10,11,12)
    val df = Seq((7L, tinyBmp)).toDF("doc_id", "payload")
    val identity = MultimodalDecode.resizeImages(df, 2, 2).collect()
      .map(r => (r.ty, r.tx) -> r.px_mean).toMap
    assert(identity == Map((0, 0) -> 8.0, (0, 1) -> 11.0,
      (1, 0) -> 2.0, (1, 1) -> 5.0))
    val one = MultimodalDecode.resizeImages(df, 1, 1).collect()
    assert(one.map(r => ((r.ty, r.tx), r.px_mean)).toSeq ==
      Seq(((0, 0), 8.0))) // top-left pixel is the single sample
  }

  test("resize skips undecodable payloads and rejects bad dims") {
    val rows = MultimodalDecode.resizeImages(Seq(
      (1L, Some(tinyBmp)),
      (2L, Some("not an image".getBytes("UTF-8"))),
      (3L, None),
    ).toDF("doc_id", "payload"), 2, 2).collect()
    assert(rows.map(_.doc_id).distinct.toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      MultimodalDecode.resizeImages(Seq((1L, tinyBmp))
        .toDF("doc_id", "payload"), 0, 2)
    }
  }

  // an 8-bit mono PCM WAV with samples 10, 20, 30 at 8000 Hz
  private def tinyWav: Array[Byte] = {
    def le(v: Int, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    "RIFF".getBytes ++ le(3 + 36, 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le(16, 4) ++ le(1, 2) ++ le(1, 2) ++
      le(8000, 4) ++ le(8000, 4) ++ le(1, 2) ++ le(8, 2) ++
      "data".getBytes ++ le(3, 4) ++ Array[Byte](10, 20, 30)
  }

  test("AudioSystem decodes a real WAV: format fields and exact mean") {
    val a = MultimodalDecode.decodeAudio(
      Seq((9L, tinyWav)).toDF("doc_id", "payload")).collect()
    assert(a.length == 1)
    assert(a.head.sample_rate == 8000 && a.head.channels == 1 &&
      a.head.bits == 8 && a.head.n_samples == 3L)
    assert(a.head.mean_sample.contains(20.0))
  }

  test("undecodable audio payloads are skipped, not fatal") {
    val rows = MultimodalDecode.decodeAudio(Seq(
      (1L, Some(tinyWav)),
      (2L, Some("definitely not audio".getBytes("UTF-8"))),
      (3L, None),
    ).toDF("doc_id", "payload")).collect()
    assert(rows.map(_.doc_id).toSeq == Seq(1L))
  }

  test("decode runs partition-parallel and adds no shuffle of its own") {
    val many = (1 to 64).map(i => (i.toLong, s"payload-$i".getBytes("UTF-8")))
      .toDF("doc_id", "payload").repartition(8)
    val ds = MultimodalDecode.decodeFrames(many)
    assert(ds.count() == 64)
    assert(ds.rdd.getNumPartitions == 8) // input partitioning preserved
    val plan = MultimodalDecode.decodeFrames(payloads)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange")) // pure map over unshuffled input
  }
}
