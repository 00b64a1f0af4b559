package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Batch media-decode plumbing for opaque binary payload columns.
  *
  * Sibling of the expression-based frame pipeline (Pipeline.p14): that
  * path is pure Catalyst and preferred when features are expressible as
  * expressions. A REAL decoder, though, is a codec library invoked per
  * batch of bytes — the shape `mapInPandas`/`mapPartitions` exists for,
  * and the one place the custom-operator ladder bottoms out at
  * (d) mapPartitions. Two real JDK-built-in codecs run here with zero
  * extra dependencies: [[decodeImages]] (javax.imageio, BMP/PNG/…)
  * and [[decodeAudio]] (javax.sound.sampled, WAV/PCM). [[decodeFrames]]
  * is the codec-free sibling for payloads with no container format — a
  * fixed-stride frame slicer whose per-frame mean is computed directly
  * from the bytes. All three share the scale-relevant plumbing: binary
  * column in, typed rows out, per-partition reader amortization,
  * partition-parallel with no shuffle.
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

  /** One decoded image: dimensions plus the mean over every channel
    * byte of every pixel — decoded by a REAL codec, not recomputed from
    * the container bytes. */
  case class DecodedImage(doc_id: Long, width: Int, height: Int,
      mean_pixel: Double)

  /** Decode `(doc_id: long, payload: binary)` images with the JDK's
    * `javax.imageio.ImageIO` (BMP, PNG, JPEG, GIF — whatever readers the
    * JVM registers). Lossless formats decode bit-exactly, so the mean is
    * deterministic: channel-byte sums are exact integers, divided once.
    * Payloads ImageIO cannot decode (null, truncated, unknown format)
    * yield no row — a real corpus carries undecodable blobs and a decode
    * job must skip, not die. One partition = one reader context; rows
    * scale with pixels, never with row pairs; no shuffle. */
  def decodeImages(df: DataFrame): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast(LongType),
        col("payload").cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // ImageIO scans for a registered reader per stream; the registry
        // lookup is JVM-wide and warm after the first image of the task
        rows.flatMap { case (id, payload) =>
          Option(payload).flatMap { bytes =>
            // no registered reader → null; a reader that chokes on
            // truncated/corrupt bytes → IOException: both mean "skip"
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case _: java.io.IOException => None }
          }.map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            DecodedImage(id, w, h, sum.toDouble / (w.toLong * h * 3))
          }
        }
      }
  }

  /** One pixel of a nearest-neighbor-resized image: target grid
    * coordinates plus the channel mean of the sampled source pixel. */
  case class ResizedPixel(doc_id: Long, ty: Int, tx: Int, px_mean: Double)

  /** Resize decoded images to a fixed `tw`×`th` grid by nearest-neighbor
    * sampling — the thumbnail/normalization step an image training
    * pipeline runs after decode. Sampling is explicit index arithmetic
    * over the decoded raster (source pixel (⌊tx·W/tw⌋, ⌊ty·H/th⌋)), not
    * an AWT scaling filter, so the result is bit-deterministic and
    * oracle-computable; the emitted feature per target cell is the mean
    * of the sampled pixel's three channel bytes (an exact integer sum,
    * one division). Output rows scale with docs×tw×th, never with
    * source pixels; same per-partition codec amortization and
    * undecodable-skip contract as [[decodeImages]]; no shuffle. */
  def resizeImages(df: DataFrame, tw: Int, th: Int): Dataset[ResizedPixel] = {
    require(tw > 0 && th > 0, s"target dims must be positive: ${tw}x$th")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast(LongType),
        col("payload").cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          Option(payload).flatMap { bytes =>
            try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes)))
            catch { case _: java.io.IOException => None }
          }.toSeq.flatMap { img =>
            for (ty <- 0 until th; tx <- 0 until tw) yield {
              val sy = ty * img.getHeight / th
              val sx = tx * img.getWidth / tw
              val rgb = img.getRGB(sx, sy)
              val sum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)
              ResizedPixel(id, ty, tx, sum.toDouble / 3)
            }
          }
        }
      }
  }

  /** One decoded audio clip: format fields read from the REAL decoder's
    * `AudioFormat` plus the sample count and mean sample value (unsigned
    * 8-bit PCM; None for a zero-length clip). */
  case class DecodedAudio(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_samples: Long, mean_sample: Option[Double])

  /** Decode `(doc_id: long, payload: binary)` audio with the JDK's
    * `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU containers, PCM
    * payloads). The header fields come from the decoder's AudioFormat —
    * not re-parsed from the bytes — and the samples from draining the
    * AudioInputStream. PCM is lossless: integer sums, one division,
    * deterministic. Undecodable payloads yield no row. */
  def decodeAudio(df: DataFrame): Dataset[DecodedAudio] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast(LongType),
        col("payload").cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          Option(payload).flatMap { bytes =>
            try {
              val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                val fmt = in.getFormat
                var sum = 0L
                var n = 0L
                val buf = new Array[Byte](8192)
                var read = in.read(buf)
                while (read > 0) {
                  var i = 0
                  while (i < read) { sum += buf(i) & 0xff; i += 1 }
                  n += read
                  read = in.read(buf)
                }
                Some(DecodedAudio(id, fmt.getSampleRate.toInt,
                  fmt.getChannels, fmt.getSampleSizeInBits, n,
                  if (n > 0) Some(sum.toDouble / n) else None))
              } finally in.close()
            } catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException |
                   _: java.io.IOException => None
            }
          }
        }
      }
  }
}
