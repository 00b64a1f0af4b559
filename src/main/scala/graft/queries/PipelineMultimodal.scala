package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Exact._
import graft.Stage.StageOps
import graft.Tables
import graft.functions.Portable._
import graft.functions.VectorDot.vdot
import graft.functions.VectorDotLong.vdotl

/** Multimodal binary columns: typed-metadata stubs, frame sampling,
  * and the real WAV/BMP byte-level codecs (decode, resize, spectral).
  *
  * Implementation module of [[Pipeline]] (mixed into the one public
  * object; members are package-private to graft.queries). Split from
  * the former monolith in round 12 with zero behavior change. */
trait PipelineMultimodal extends PipelineDedup {


  // ---- multimodal columns ------------------------------------------------

  /** Multimodal binary-column plumbing with a deterministic fake "decode":
    * payload = utf-8 bytes of the text stand in for an opaque media blob
    * (the real image/audio decoder is environment-dependent; the Spark
    * plumbing — binary column, byte slicing, digesting, fixed-size frame
    * math — is the part that must be real and scale). Pure map.
    * NOTE (here and p14): Spark slices BYTES of the payload; DuckDB 1.0
    * has no blob substr, so the oracle slices CHARACTERS of the text —
    * equivalent only while the corpus is ASCII (it is; a multibyte
    * corpus would need a byte-precise oracle). */
  private[queries] def p08MultimodalStub: Q = (s, d) => {
    val payload = encode(col("text"), "UTF-8")
    Tables.documents(s, d).select(
      col("doc_id"),
      length(payload).cast(LongType).as("byte_len"),
      lower(hex(substring(payload, 1, 4))).as("magic"),
      md5(payload).as("digest"),
      ceil(length(payload) / lit(16.0)).as("n_frames"))
  }


  /** Frame sampling over the opaque payload: slice the binary into fixed
    * 16-byte frames and feature-extract each (digest + length stand in
    * for the environment-dependent decoder). The explode is a pure map —
    * rows scale with payload bytes, never with doc pairs — which is the
    * shape a video/audio frame pipeline needs at 100 TB. */
  private[queries] def p14FrameSample: Q = (s, d) => {
    val payload = encode(col("text"), "UTF-8")
    // Empty-payload guard: sequence(0, -1) would count DOWN in Spark
    // (unlike DuckDB's empty generate_series) and emit phantom frames.
    val frames = when(length(payload) > 0,
      transform(
        sequence(lit(0), ceil(length(payload) / lit(16.0)).cast(IntegerType) - 1),
        k => payload.substr(k * 16 + 1, lit(16))))
      .otherwise(array().cast("array<binary>"))
    docsBalanced(s, d)
      .select(col("doc_id"), posexplode(frames))
      .select(col("doc_id"), col("pos").cast(IntegerType).as("frame_idx"),
        md5(col("col")).as("frame_md5"),
        length(col("col")).cast(IntegerType).as("frame_len"))
  }


  /** REAL bytes through the multimodal path: each document's payload is
    * a VALID 8-bit-PCM WAV — "RIFF" magic, little-endian chunk sizes, a
    * 16-byte fmt block whose sample rate varies per doc, a "data" chunk
    * of the text's utf-8 bytes — built and then PARSED BACK entirely
    * with binary expressions (byte slicing + hex + base-16 conv for the
    * LE integers; nothing text-typed touches the payload between build
    * and parse). The PCM section then rides the mapPartitions decode
    * plumbing ([[graft.operators.MultimodalDecode]]), whose per-frame
    * mean-sample output the oracle reproduces from hex pairs. This is
    * the upgrade of p08/p14's utf-8 stand-in to actual non-text bytes:
    * LE header fields round-trip through the byte encoding, so a
    * byte-order or off-by-one bug anywhere in the binary path flips the
    * hash. Build and parse are one map; the only shuffle is the keyed
    * header↔frames join. */
  // ---- binary-format helpers shared by p58 (WAV) and p61 (BMP) ----------

  /** Little-endian n-byte encoding of a non-negative int column. */
  private[queries] def le(v: Column, nBytes: Int): Column = {
    val h = lpad(hex(v), nBytes * 2, "0")
    unhex(concat((0 until nBytes).map(i =>
      substring(h, (nBytes - 1 - i) * 2 + 1, 2)): _*))
  }


  private[queries] def tag(t: String): Column = encode(lit(t), "UTF-8")


  /** Parse a little-endian int from `payload` at a 1-based byte offset:
    * hex pairs reassembled most-significant first. */
  private[queries] def leInt(payload: Column, startByte: Int, nBytes: Int): Column = {
    val h = hex(substring(payload, startByte, nBytes))
    conv(concat((0 until nBytes).reverse.map(i =>
      substring(h, i * 2 + 1, 2)): _*), 16, 10).cast(IntegerType)
  }


  /** doc_id + a VALID mono 8-bit PCM WAV payload per document: RIFF/fmt/
    * data chunks with little-endian fields, samples = the text's UTF-8
    * bytes, sample rate varying per doc. Shared by p58 (expression-level
    * header parse-back) and p69 (real decode via javax.sound.sampled). */
  private[queries] def wavPayloads(s: SparkSession, d: String): DataFrame = {
    val data = encode(col("text"), "UTF-8")
    val len = length(data)
    val rate = (lit(8000) + pmod(col("doc_id"), lit(3)) * 4000)
      .cast(IntegerType)
    docsBalanced(s, d).select(col("doc_id"),
      concat(tag("RIFF"), le(len + 36, 4), tag("WAVE"),
        tag("fmt "), le(lit(16), 4), le(lit(1), 2), le(lit(1), 2),
        le(rate, 4), le(rate, 4), le(lit(1), 2), le(lit(8), 2),
        tag("data"), le(len, 4), data).as("payload"))
  }


  private[queries] def p58WavRealBytes: Q = (s, d) => {
    val wav = wavPayloads(s, d)
    // parse the header back from the opaque bytes
    val parsed = wav.select(col("doc_id"), col("payload"),
      lower(hex(substring(col("payload"), 1, 4))).as("riff_hex"),
      lower(hex(substring(col("payload"), 9, 4))).as("wave_hex"),
      leInt(col("payload"), 25, 4).as("sample_rate"),
      leInt(col("payload"), 41, 4).as("data_len"))
    val frames = graft.operators.MultimodalDecode.decodeFrames(
      parsed.select(col("doc_id"),
        col("payload").substr(lit(45), col("data_len")).as("payload")))
      .toDF()
    parsed.select("doc_id", "riff_hex", "wave_hex", "sample_rate", "data_len")
      .join(frames.select(col("doc_id"), col("frame_idx"), col("luma")),
        "doc_id")
      .select(col("doc_id"), col("frame_idx").cast(IntegerType).as("frame_idx"),
        col("riff_hex"), col("wave_hex"), col("sample_rate"), col("data_len"),
        least(lit(16), col("data_len") - col("frame_idx") * 16)
          .cast(IntegerType).as("frame_len"),
        round(col("luma"), 6).as("mean_sample"))
  }


  /** REAL bytes, 2D edition: each document's payload is a VALID 24-bit
    * uncompressed BMP — "BM" magic, 54-byte header with LE32 dims,
    * pixel rows stored BOTTOM-UP and padded to 4-byte stride — built
    * and parsed back entirely with binary expressions. Where p58's WAV
    * exercised 1D little-endian header fields, this exercises the 2D
    * plumbing a real image pipeline needs: computed row offsets off the
    * parsed data-offset, stride = rowBytes rounded up to 4, the
    * bottom-up row flip, and per-row means that must EXCLUDE the
    * padding bytes. Width/height vary per doc so no constant folding
    * can fake the parse. Build + parse + row explode are one map; no
    * shuffle at all. */
  /** doc_id + a VALID 24-bit uncompressed BMP payload per document —
    * "BM" magic, 54-byte header with LE32 dims, pixel rows bottom-up and
    * stride-padded; pixel bytes from the text's UTF-8 hex. Dimensions
    * vary per doc so no constant folding can fake a parse. Shared by p61
    * (expression-level parse-back) and p68 (real decode via ImageIO). */
  private[queries] def bmpPayloads(s: SparkSession, d: String): DataFrame = {
    val w = (lit(4) + pmod(col("doc_id"), lit(3))).cast(IntegerType)
    val h = (lit(2) + pmod(col("doc_id"), lit(2))).cast(IntegerType)
    val rowBytes = w * 3
    val stride = ((rowBytes + 3) / 4).cast(IntegerType) * 4
    def repeatCol(s: Column, n: Column) = call_function("repeat", s, n)
    val padHex = repeatCol(lit("00"), stride - rowBytes)
    // pixel bytes: the text's utf-8 hex, truncated/zero-padded to
    // exactly height*rowBytes bytes (deterministic, oracle-computable)
    val needHex = (h * rowBytes) * 2
    val hx = lower(hex(encode(col("text"), "UTF-8")))
    val pixHex = concat(hx.substr(lit(1), needHex),
      repeatCol(lit("0"), greatest(lit(0), needHex - length(hx))))
    // file rows bottom-up: file row r holds image row h-1-r, plus stride
    // padding; binary-concat-folded into the pixel array
    val fileRows = transform(sequence(lit(0), h - 1), r =>
      unhex(concat(
        pixHex.substr((h - 1 - r) * rowBytes * 2 + 1, rowBytes * 2),
        padHex)))
    val pixData = aggregate(fileRows,
      lit(Array.emptyByteArray), (acc, x) => concat(acc, x))
    docsBalanced(s, d).select(col("doc_id"),
      concat(tag("BM"), le(lit(54) + h * stride, 4), le(lit(0), 4),
        le(lit(54), 4),
        le(lit(40), 4), le(w, 4), le(h, 4), le(lit(1), 2), le(lit(24), 2),
        le(lit(0), 4), le(h * stride, 4), le(lit(2835), 4), le(lit(2835), 4),
        le(lit(0), 4), le(lit(0), 4), pixData).as("payload"))
  }


  private[queries] def p61BmpRealBytes: Q = (s, d) => {
    val bmp = bmpPayloads(s, d)
    // parse back from the opaque bytes only
    val p = col("payload")
    val parsed = bmp.select(col("doc_id"), p,
      lower(hex(substring(p, 1, 2))).as("magic"),
      leInt(p, 11, 4).as("data_off"),
      leInt(p, 19, 4).as("width"),
      leInt(p, 23, 4).as("height"),
      leInt(p, 29, 2).as("bpp"))
    val rb = col("width") * 3
    val st = ((rb + 3) / 4).cast(IntegerType) * 4
    val rows = parsed
      .select(col("doc_id"), p, col("magic"), col("data_off"),
        col("width"), col("height"), col("bpp"),
        explode(sequence(lit(0), col("height") - 1)).as("file_row"))
      .withColumn("img_row", col("height") - 1 - col("file_row"))
      .withColumn("rowhex", lower(hex(
        p.substr(col("data_off") + col("file_row") * st + 1, rb))))
    val byteVals = transform(sequence(lit(0), rb - 1), j =>
      conv(col("rowhex").substr(j * 2 + 1, lit(2)), 16, 10)
        .cast(LongType))
    rows.select(col("doc_id"), col("img_row"), col("magic"),
      col("width"), col("height"), col("bpp"),
      round(aggregate(byteVals, lit(0L), (a, v) => a + v)
        .cast(DoubleType) / rb, 6).as("row_mean"))
  }


  /** REAL image decode: the valid BMPs of [[bmpPayloads]] go through the
    * JDK's `javax.imageio.ImageIO` ([[graft.operators.MultimodalDecode
    * .decodeImages]]) — an actual registered codec walks the header,
    * stride and bottom-up row order, and the decoded channel bytes are
    * averaged. The oracle recomputes width/height/mean straight from the
    * text's hex, so a decoder-plumbing bug (stride, row flip, channel
    * order, padding leaking into the mean) flips the hash. One map-side
    * decode per partition; no shuffle. */
  private[queries] def p68BmpImageioDecode: Q = (s, d) =>
    graft.operators.MultimodalDecode.decodeImages(bmpPayloads(s, d))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        round(col("mean_pixel"), 6).as("mean_pixel"))


  /** REAL decode + resize: the valid BMPs of [[bmpPayloads]] decode
    * through ImageIO and then resample to a fixed 2×2 grid by
    * nearest-neighbor index arithmetic ([[graft.operators
    * .MultimodalDecode.resizeImages]]) — the thumbnail/normalization
    * stage of an image pipeline, exercised through a REAL codec. The
    * oracle recomputes each sampled source pixel straight from the
    * text's hex, so an off-by-one in the resample index math, a
    * stride/row-flip bug, or padding leaking into a sampled pixel flips
    * the hash. Map-side decode, rows = docs×4; no shuffle. */
  private[queries] def p86ImageResize: Q = (s, d) =>
    graft.operators.MultimodalDecode.resizeImages(bmpPayloads(s, d), 2, 2)
      .toDF()
      .select(col("doc_id"), col("ty"), col("tx"),
        round(col("px_mean"), 6).as("px_mean"))


  /** REAL audio decode: the valid WAVs of [[wavPayloads]] go through the
    * JDK's `javax.sound.sampled.AudioSystem` ([[graft.operators
    * .MultimodalDecode.decodeAudio]]); sample rate / channels / bit
    * depth come from the decoder's AudioFormat — not re-parsed from the
    * bytes — and the mean over the drained PCM samples must equal the
    * mean the oracle computes from the text's bytes directly. */
  private[queries] def p69WavAudioDecode: Q = (s, d) =>
    graft.operators.MultimodalDecode.decodeAudio(wavPayloads(s, d))
      .toDF()
      .select(col("doc_id"), col("sample_rate"), col("channels"),
        col("bits"), col("n_samples"),
        round(col("mean_sample"), 6).as("mean_sample"))
}
