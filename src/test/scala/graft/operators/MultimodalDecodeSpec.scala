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
