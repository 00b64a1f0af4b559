package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Batch media-decode plumbing for opaque binary payload columns.
  *
  * Sibling of the expression-based frame pipeline (Pipeline.p14): that
  * path is pure Catalyst and preferred when features are expressible as
  * expressions. A REAL decoder, though, is an external native library
  * (image/audio codec) invoked per batch of bytes — the shape
  * `mapInPandas`/`mapPartitions` exists for, and the one place the
  * custom-operator ladder bottoms out at (d) mapPartitions. The decode
  * itself is STUBBED with a deterministic fake (this container ships no
  * codecs); everything around it is the real, scale-relevant plumbing:
  * binary column in, typed frame rows out, per-partition handle
  * amortization, partition-parallel with no shuffle.
  */
object MultimodalDecode {

  /** One decoded fixed-size frame of a payload. width/height/luma stand
    * in for real decoded features. */
  case class DecodedFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, luma: Double)

  val FrameBytes = 16

  /** Decode `(doc_id: long, payload: binary)` rows into frame features.
    * Deterministic: luma is the mean byte value of the frame, so tests
    * and reruns agree exactly. Rows scale with payload bytes, never with
    * row pairs; each partition decodes independently. */
  def decodeFrames(df: DataFrame): Dataset[DecodedFrame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast(LongType),
        // a null payload decodes to zero frames, matching the p14
        // expression path's when() null-skip (no NPE in the task)
        coalesce(col("payload").cast(BinaryType), lit(Array.empty[Byte]))
          .as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // A real decoder opens its (expensive) native codec context here,
        // once per partition, and closes it when the iterator drains.
        val codec = new FakeCodec
        rows.flatMap { case (id, payload) =>
          val n = (payload.length + FrameBytes - 1) / FrameBytes
          (0 until n).iterator.map { k =>
            val from = k * FrameBytes
            val frame = payload.slice(from,
              math.min(from + FrameBytes, payload.length))
            codec.decode(id, k, frame)
          }
        }
      }
  }

  /** Deterministic stand-in for a native codec handle. */
  private class FakeCodec {
    def decode(id: Long, idx: Int, frame: Array[Byte]): DecodedFrame =
      DecodedFrame(id, idx, 4, 4,
        frame.map(b => (b & 0xff).toDouble).sum / frame.length)
  }
}
