package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.{ByteBuffer, ByteOrder}

/** Multimodal column plumbing (SURVEY.md §2 tier C): media payloads are
  * opaque `binary` columns with typed metadata extracted by a codec that
  * runs per-partition (`mapPartitions`) — the standard Spark pattern for
  * batch decode/feature-extract where the codec has per-task init cost
  * (native lib handles, model weights) that must be amortized across a
  * partition, not paid per row.
  *
  * The decode path is REAL: payloads are genuine multi-frame 24-bpp BMP
  * containers (naive MJPEG shape — complete BMP files back to back) built
  * by [[BmpFile.build]], and [[BmpCodec]] recovers width/height/frame
  * count by parsing the container bytes — magic check, little-endian
  * header fields, fileSize-chained frame walk — never from side-channel
  * metadata. The container ships no image libraries, so BMP (a pure-JVM
  * 54-byte header format) stands in for JPEG/H.264; a production
  * deployment swaps [[BmpCodec]] for a JNI/JavaCV decoder behind the same
  * [[MediaCodec]] seam without touching the plumbing.
  *
  * `mapPartitions` here is the JVM analog of `mapInPandas` for a Python
  * decoder fleet: same batch shape (iterator-in/iterator-out per
  * partition), same per-task init amortization. pyspark is not available
  * to this library in the build container, so the Python variant is a
  * deploy-time swap at the same seam, not a code-path this repo can
  * exercise.
  */
object Multimodal {

  /** Opaque media payload + id (what a real pipeline reads from parquet
    * `binary` columns).
    */
  case class MediaIn(doc_id: Long, media: Array[Byte])

  /** Typed metadata produced by decode: dimensions, frame count, and the
    * sampled frame indexes (first / middle / last) a downstream
    * feature-extractor would pull.
    */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Int, height: Int,
      n_frames: Int, frame_samples: Seq[Int])

  /** Typed metadata for an audio payload: container size, PCM format
    * fields, and the derived sample count / integer-ms duration a
    * downstream resampler or frame-window featurizer consumes.
    */
  case class AudioMeta(doc_id: Long, n_bytes: Long, sample_rate: Int,
      channels: Int, n_samples: Long, duration_ms: Long)

  /** Decoder seam, generic in the metadata it yields. `decode` is
    * invoked once per record on an executor; implementations are
    * constructed once per partition (that is where a production decoder
    * amortizes native-lib / model-weight init). [[MediaCodec]] is the
    * image/video instance, [[WavCodec]] the audio one — two formats
    * through ONE seam is the point: the plumbing (schema, partitioning,
    * batch shape) never changes when the codec does.
    */
  trait MediaDecoder[M] extends Serializable {
    def decode(in: MediaIn): M
  }

  /** Image/video decoder seam (the original name, kept for the BMP
    * instance and its spec surface).
    */
  trait MediaCodec extends MediaDecoder[MediaMeta]

  /** Minimal real BMP writer: one complete 24-bpp bottom-up BMP file
    * (14-byte file header + 40-byte BITMAPINFOHEADER + 4-byte-padded
    * pixel rows). The reader ([[BmpCodec]]) never sees the arguments —
    * only these bytes.
    */
  object BmpFile {
    def rowBytes(width: Int): Int = (width * 3 + 3) / 4 * 4

    def size(width: Int, height: Int): Int = 54 + rowBytes(width) * height

    def build(width: Int, height: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0)
      val rb = rowBytes(width)
      val total = size(width, height)
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(54)
      b.putInt(40).putInt(width).putInt(height)
        .putShort(1).putShort(24)
        .putInt(0).putInt(rb * height)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < rb) { b.put(((x + y * 31 + seed) & 0xFF).toByte); x += 1 }
        y += 1
      }
      b.array()
    }

    /** Same image under a BITMAPV5 (124-byte DIB) header, bfOffBits =
      * 138: byte-for-byte identical pixel stream at a different offset.
      * The first 40 DIB bytes share BITMAPINFOHEADER's field layout
      * (width 18, height 22, bpp 28), so every header-field guard reads
      * the same values — only a codec that honors bfOffBits decodes the
      * same pixels. Zero-filled V5 extension fields are valid BI_RGB.
      */
    def buildV5(width: Int, height: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0)
      val rb = rowBytes(width)
      val off = 14 + 124
      val total = off + rb * height
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(total).putInt(0).putInt(off)
      b.putInt(124).putInt(width).putInt(height)
        .putShort(1).putShort(24)
        .putInt(0).putInt(rb * height)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      b.position(off) // allocate() zero-fills the V4/V5 extension fields
      var y = 0
      while (y < height) {
        var x = 0
        while (x < rb) { b.put(((x + y * 31 + seed) & 0xFF).toByte); x += 1 }
        y += 1
      }
      b.array()
    }
  }

  /** Real pure-JVM BMP-container decoder: validates each frame's magic,
    * reads dimensions and bit depth from the little-endian header, and
    * counts frames by walking the fileSize chain. Malformed bytes throw —
    * a decode stage must fail loudly, not fabricate metadata.
    */
  final class BmpCodec extends MediaCodec {
    override def decode(in: MediaIn): MediaMeta = {
      val bytes = in.media
      require(bytes.length >= 54, s"doc ${in.doc_id}: truncated payload (${bytes.length} B)")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      var off = 0
      var frames = 0
      var width = -1
      var height = -1
      while (off < bytes.length) {
        require(off + 54 <= bytes.length &&
          bytes(off) == 'B'.toByte && bytes(off + 1) == 'M'.toByte,
          s"doc ${in.doc_id}: bad BMP magic at offset $off")
        val fileSize = bb.getInt(off + 2)
        require(fileSize > 54 && off + fileSize <= bytes.length,
          s"doc ${in.doc_id}: bad frame size $fileSize at offset $off")
        val w = bb.getInt(off + 18)
        val h = bb.getInt(off + 22)
        val bpp = bb.getShort(off + 28)
        require(w > 0 && h > 0 && bpp == 24,
          s"doc ${in.doc_id}: unsupported BMP ${w}x$h bpp=$bpp")
        if (frames == 0) { width = w; height = h }
        frames += 1
        off += fileSize
      }
      MediaMeta(in.doc_id, bytes.length.toLong, width, height, frames,
        Seq(0, frames / 2, frames - 1))
    }
  }

  /** Minimal real RIFF/WAVE writer: "RIFF" size "WAVE", a 16-byte PCM
    * "fmt " subchunk, an arbitrary skippable "LIST" subchunk (planted so
    * the reader must WALK chunks, not assume a fixed layout), then the
    * "data" subchunk with 16-bit PCM samples. All sizes kept even, so no
    * RIFF pad bytes arise. The reader ([[WavCodec]]) never sees these
    * arguments — only the bytes.
    */
  object WavFile {
    def size(channels: Int, nSamples: Long, listBytes: Int): Long =
      12L + 24L + (8L + listBytes) + 8L + nSamples * channels * 2

    def build(sampleRate: Int, channels: Int, nSamples: Int, listBytes: Int,
        seed: Long): Array[Byte] = {
      require(sampleRate > 0 && channels > 0 && nSamples >= 0 && listBytes % 2 == 0)
      val dataSize = nSamples * channels * 2
      val total = size(channels, nSamples.toLong, listBytes).toInt
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
        .put("WAVE".getBytes("US-ASCII"))
      b.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2) // byte rate
        .putShort((channels * 2).toShort)  // block align
        .putShort(16)                      // bits per sample
      b.put("LIST".getBytes("US-ASCII")).putInt(listBytes)
      var i = 0
      while (i < listBytes) { b.put(((seed + i) & 0xFF).toByte); i += 1 }
      b.put("data".getBytes("US-ASCII")).putInt(dataSize)
      var s = 0
      while (s < nSamples * channels) {
        b.putShort(((seed * 31 + s * 7) & 0x7FFF).toShort); s += 1
      }
      b.array()
    }
  }

  /** Real pure-JVM RIFF/WAVE decoder: validates the RIFF/WAVE magic and
    * declared size, then walks subchunks — reading "fmt " (PCM only) and
    * "data", skipping anything else by its declared length — and derives
    * sample count and integer-ms duration. Malformed bytes throw, same
    * contract as [[BmpCodec]]: a decode stage fails loudly, never
    * fabricates metadata.
    */
  final class WavCodec extends MediaDecoder[AudioMeta] {
    override def decode(in: MediaIn): AudioMeta = {
      val bytes = in.media
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      require(bytes.length >= 44, s"doc ${in.doc_id}: truncated payload (${bytes.length} B)")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
        s"doc ${in.doc_id}: bad RIFF/WAVE magic")
      require(bb.getInt(4) == bytes.length - 8,
        s"doc ${in.doc_id}: RIFF size ${bb.getInt(4)} != payload ${bytes.length - 8}")
      var off = 12
      var sampleRate = -1; var channels = -1; var bits = -1
      var dataSize = -1L
      while (off + 8 <= bytes.length) {
        val id = ascii(off, 4)
        val sz = bb.getInt(off + 4)
        require(sz >= 0 && off + 8 + sz <= bytes.length,
          s"doc ${in.doc_id}: chunk '$id' size $sz overruns payload at offset $off")
        id match {
          case "fmt " =>
            require(sz >= 16 && bb.getShort(off + 8) == 1,
              s"doc ${in.doc_id}: not integer PCM")
            channels = bb.getShort(off + 10)
            sampleRate = bb.getInt(off + 12)
            bits = bb.getShort(off + 22)
          case "data" => dataSize = sz.toLong
          case _ => () // unknown chunk: skip by declared length
        }
        off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
      }
      require(sampleRate > 0 && channels > 0 && bits == 16,
        s"doc ${in.doc_id}: missing/unsupported fmt chunk ($sampleRate Hz, $channels ch, $bits bit)")
      require(dataSize >= 0, s"doc ${in.doc_id}: missing data chunk")
      val nSamples = dataSize / (channels * (bits / 8))
      AudioMeta(in.doc_id, bytes.length.toLong, sampleRate, channels,
        nSamples, Math.floorDiv(nSamples * 1000L, sampleRate))
    }
  }

  /** Deterministic media table derived from documents — the testdata
    * ships no true media column, so each doc gets a planted multi-frame
    * BMP container whose geometry is a fixed function of the text's byte
    * length (width 4-15, height 4-14, 1-5 frames; small on purpose — the
    * point is the byte-level decode path, not pixel volume). The builder
    * writes real headers; the codec reads them back: two independent
    * code paths meeting only through the bytes.
    */
  def payloads(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id"), octet_length(col("text")).as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        // Long math: the oracle computes these in BIGINT, and n*31
        // overflows Int at ~66 MiB of text (h would go negative)
        val nl = n.toLong
        val w = 4 + (nl % 12).toInt
        val h = 4 + ((nl * 31) % 11).toInt
        val f = 1 + (nl % 5).toInt
        val frame = BmpFile.size(w, h)
        val out = new Array[Byte](frame * f)
        var i = 0
        while (i < f) {
          System.arraycopy(BmpFile.build(w, h, id * 31 + i), 0, out, i * frame, frame)
          i += 1
        }
        MediaIn(id, out)
      }
  }

  /** Decode metadata for every payload; codec constructed once per
    * partition (per-task amortized init), rows streamed through it.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads(spark, docs).mapPartitions { it =>
      val codec: MediaCodec = new BmpCodec // real: heavy init amortized here
      it.map(codec.decode)
    }
  }

  /** Deterministic audio table: each doc gets a real PCM WAV whose
    * format fields are a fixed function of the text's byte length
    * (8/16/44.1 kHz, mono/stereo, 100-499 samples, plus a 0-18-byte
    * skippable LIST chunk so the reader must chunk-walk). Same
    * builder/reader independence as [[payloads]]: the codec recovers
    * everything from the bytes alone.
    */
  def audioPayloads(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id"), octet_length(col("text")).as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        val nl = n.toLong
        val sr = (nl % 3) match { case 0 => 8000; case 1 => 16000; case _ => 44100 }
        val ch = 1 + (nl % 2).toInt
        val ns = 100 + ((nl * 7) % 400).toInt
        val lb = ((nl % 10) * 2).toInt
        MediaIn(id, WavFile.build(sr, ch, ns, lb, id * 17 + nl))
      }
  }

  /** Audio metadata for every payload — same partition-amortized decode
    * shape as [[decodeMeta]], different codec behind the same seam.
    */
  def decodeAudio(spark: SparkSession, docs: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    audioPayloads(spark, docs).mapPartitions { it =>
      val codec: MediaDecoder[AudioMeta] = new WavCodec
      it.map(codec.decode)
    }
  }

  /** One thumbnail pixel: 4×4 grid position plus the sampled BGR bytes
    * (unsigned 0-255) — the output row of the resize stage.
    */
  case class ThumbPixel(doc_id: Long, px: Int, py: Int, b: Int, g: Int, r: Int)

  /** Real pixel-level BMP transform: nearest-neighbor resample of frame 0
    * to a fixed 4×4 RGB thumbnail. This is the RESIZE stage of a media
    * pipeline (decodeMeta stops at metadata): the codec parses the frame-0
    * header for (w, h), derives the 4-byte-padded stride, and samples the
    * pixel ARRAY at floor-scaled source coordinates — the bytes are read
    * from the payload, never recomputed from the builder's arithmetic.
    * Rows follow the BMP's stored (bottom-up) row order; the thumbnail
    * grid indexes storage rows directly, which is deterministic and what
    * the oracle mirrors.
    */
  final class BmpThumbCodec {
    def thumb(in: MediaIn): Seq[ThumbPixel] = {
      val bytes = in.media
      require(bytes.length >= 54, s"doc ${in.doc_id}: truncated payload (${bytes.length} B)")
      require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
        s"doc ${in.doc_id}: bad BMP magic")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      // Dimension cap before deriving the stride: a corrupt header can
      // declare w ~ 7e8, where w*3 and rb*h overflow Int and a naive
      // bound check passes — 32768² at 24bpp already exceeds a 2 GiB
      // byte array, so the cap rejects nothing a valid payload could
      // hold (the WavFrameCodec per-chunk-overrun posture).
      require(w > 0 && h > 0 && w <= 32768 && h <= 32768 && bb.getShort(28) == 24,
        s"doc ${in.doc_id}: unsupported BMP ${w}x$h")
      // Pixel base comes from bfOffBits (bytes 10-13), NOT a hardcoded
      // 54: a 24-bit BMP with a BITMAPV4/V5 header passes every guard
      // above but stores pixels past the longer header — hardcoding 54
      // would silently hash header bytes as pixels. Cross-check against
      // the declared DIB header size (bytes 14-17): a file declaring a
      // 124-byte V5 header but lying with bfOffBits=60 would otherwise
      // pass and hash header-extension bytes as pixels. The cross-check
      // runs in LONG arithmetic with a dib cap and an explicit 54 floor:
      // `14 + dib` in Int overflows negative for dib near Int.MaxValue,
      // letting any bfOffBits (even 0) pass the very check meant to stop
      // it. No real DIB header exceeds 124 bytes (V5); 1024 is a roomy
      // cap. The truncation require below bounds the upper extent.
      val off = bb.getInt(10)
      val dib = bb.getInt(14)
      require(dib >= 40 && dib <= 1024 && off >= 54 && off >= 14L + dib,
        s"doc ${in.doc_id}: bad BMP pixel offset $off (DIB $dib)")
      val rb = (w * 3 + 3) / 4 * 4
      require(bytes.length >= off.toLong + rb.toLong * h,
        s"doc ${in.doc_id}: truncated pixel data")
      for (py <- 0 until 4; px <- 0 until 4) yield {
        val sy = py * h / 4
        val sx = px * w / 4
        val base = off + sy * rb + sx * 3
        ThumbPixel(in.doc_id, px, py,
          bytes(base) & 0xFF, bytes(base + 1) & 0xFF, bytes(base + 2) & 0xFF)
      }
    }
  }

  /** 4×4 thumbnails for every payload — 16 rows per doc, produced by the
    * same partition-amortized decode shape as [[decodeMeta]]. At 100 TB
    * this is the canonical map-only media stage: no shuffle, output 48
    * bytes per input image regardless of source size.
    */
  def thumbnails(spark: SparkSession, docs: DataFrame): Dataset[ThumbPixel] = {
    import spark.implicits._
    payloads(spark, docs).mapPartitions { it =>
      val codec = new BmpThumbCodec
      it.flatMap(codec.thumb)
    }
  }

  /** 64-bit perceptual average-hash of frame 0 plus the decoded
    * geometry — the per-image fingerprint row an image-dedup sweep
    * keys on.
    */
  case class ImageHash(doc_id: Long, w: Int, h: Int, gray_mean: Long,
    hash_lo: Long, hash_hi: Long)

  /** Perceptual average-hash (aHash) over the REAL decoded pixels: an
    * 8×8 grid of gray values (b+g+r, floor-scaled source coordinates —
    * the thumbnail sampler at 8×8), one bit per cell set iff its gray
    * exceeds the floor-mean, packed into two 32-bit halves (the binary-
    * quantization convention — neither engine shifts into the sign
    * bit). This is the image analog of the text MinHash/SimHash family:
    * near-identical images land within a few Hamming bits and the
    * 8-byte codes feed the same XOR/popcount probe bq_topk ships. Bytes
    * are read from the payload, never recomputed from the builder's
    * arithmetic (the thumbnail independence contract).
    */
  final class BmpAHashCodec {
    def ahash(in: MediaIn): ImageHash = {
      val bytes = in.media
      require(bytes.length >= 54, s"doc ${in.doc_id}: truncated payload")
      require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
        s"doc ${in.doc_id}: bad BMP magic")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val w = bb.getInt(18)
      val h = bb.getInt(22)
      require(w > 0 && h > 0 && w <= 32768 && h <= 32768 && bb.getShort(28) == 24,
        s"doc ${in.doc_id}: unsupported BMP ${w}x$h")
      // bfOffBits-derived pixel base cross-checked against the declared
      // DIB header size, same rationale (and same long-arithmetic /
      // dib-cap / 54-floor posture) as BmpThumbCodec: BITMAPV4/V5
      // headers put pixels past byte 54, a lying bfOffBits below
      // 14 + DIB would hash header-extension bytes as pixels, and an
      // Int `14 + dib` overflows negative for hostile dib values.
      val off = bb.getInt(10)
      val dib = bb.getInt(14)
      require(dib >= 40 && dib <= 1024 && off >= 54 && off >= 14L + dib,
        s"doc ${in.doc_id}: bad BMP pixel offset $off (DIB $dib)")
      val rb = (w * 3 + 3) / 4 * 4
      require(bytes.length >= off.toLong + rb.toLong * h,
        s"doc ${in.doc_id}: truncated pixel data")
      val gray = new Array[Long](64)
      var sum = 0L
      var i = 0
      while (i < 64) {
        val py = i / 8; val px = i % 8
        val base = off + (py * h / 8) * rb + (px * w / 8) * 3
        val g = (bytes(base) & 0xFF).toLong + (bytes(base + 1) & 0xFF) +
          (bytes(base + 2) & 0xFF)
        gray(i) = g; sum += g; i += 1
      }
      val mean = sum / 64
      var lo = 0L; var hi = 0L
      i = 0
      while (i < 64) {
        if (gray(i) > mean) {
          if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
        }
        i += 1
      }
      ImageHash(in.doc_id, w, h, mean, lo, hi)
    }
  }

  /** aHash rows for every payload — the same partition-amortized
    * map-only decode shape as [[thumbnails]]: no shuffle, 8 hash bytes
    * + geometry per input image regardless of source size.
    */
  def imageHashes(spark: SparkSession, docs: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    payloads(spark, docs).mapPartitions { it =>
      val codec = new BmpAHashCodec
      it.map(codec.ahash)
    }
  }

  /** One fixed-width audio analysis frame: 64 interleaved PCM samples
    * (the last frame may be partial) with the exact integer energy
    * Σ sample² — the feature a VAD / loudness / resampling stage
    * consumes.
    */
  case class AudioFrame(doc_id: Long, frame_idx: Int, n_sam: Long, energy: Long)

  /** Real sample-level WAV transform: chunk-walk to the data subchunk,
    * read the little-endian 16-bit PCM stream, window it into 64-sample
    * frames and report each frame's exact integer energy. This is the
    * FRAME-SAMPLE stage of an audio pipeline ([[decodeAudio]] stops at
    * metadata); the samples are decoded from the payload bytes, never
    * recomputed from the builder's arithmetic.
    */
  final class WavFrameCodec {
    val FrameLen = 64

    def frames(in: MediaIn): Seq[AudioFrame] = framesStrided(in, 1)

    /** [[frames]] over the stream decimated by `stride` (keep sample
      * 0, stride, 2·stride, … of the flat interleaved stream) — the
      * naive sample-rate reducer (no anti-alias filter; the exact
      * integer arithmetic contract is the point, like the
      * nearest-neighbor thumbnail on the image path).
      */
    def framesStrided(in: MediaIn, stride: Int): Seq[AudioFrame] = {
      require(stride >= 1)
      val bytes = in.media
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      require(bytes.length >= 44, s"doc ${in.doc_id}: truncated payload (${bytes.length} B)")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
        s"doc ${in.doc_id}: bad RIFF/WAVE magic")
      var off = 12
      var bits = -1
      var dataOff = -1
      var dataSize = -1
      while (off + 8 <= bytes.length) {
        val id = ascii(off, 4)
        val sz = bb.getInt(off + 4)
        require(sz >= 0 && off + 8 + sz <= bytes.length,
          s"doc ${in.doc_id}: chunk '$id' size $sz overruns payload at offset $off")
        id match {
          case "fmt " =>
            require(sz >= 16 && bb.getShort(off + 8) == 1,
              s"doc ${in.doc_id}: not integer PCM")
            bits = bb.getShort(off + 22)
          case "data" => dataOff = off + 8; dataSize = sz
          case _ => () // unknown chunk: skip by declared length
        }
        off += 8 + sz + (sz & 1)
      }
      require(bits == 16, s"doc ${in.doc_id}: unsupported bit depth $bits")
      require(dataOff >= 0, s"doc ${in.doc_id}: missing data chunk")
      val total0 = dataSize / 2 // interleaved 16-bit samples
      val total = (total0 + stride - 1) / stride // kept after decimation
      val nFrames = (total + FrameLen - 1) / FrameLen
      (0 until nFrames).map { fi =>
        val lo = fi * FrameLen
        val hi = math.min(total, lo + FrameLen)
        var s = lo
        var energy = 0L
        while (s < hi) {
          val v = bb.getShort(dataOff + 2 * (s * stride)).toLong
          energy += v * v
          s += 1
        }
        AudioFrame(in.doc_id, fi, (hi - lo).toLong, energy)
      }
    }
  }

  /** Frame-windowed energies for every audio payload — the map-only
    * audio featurization stage (same 100 TB posture as [[thumbnails]]:
    * no shuffle, bounded output per input second of audio).
    */
  def audioFrames(spark: SparkSession, docs: DataFrame): Dataset[AudioFrame] = {
    import spark.implicits._
    audioPayloads(spark, docs).mapPartitions { it =>
      val codec = new WavFrameCodec
      it.flatMap(codec.frames)
    }
  }

  /** [[audioFrames]] over the decimate-by-2 stream — the sample-rate
    * reduction stage (the audio analog of the image thumbnail resize):
    * same map-only posture, half the data read per payload.
    */
  def audioFramesDownsampled(spark: SparkSession, docs: DataFrame): Dataset[AudioFrame] = {
    import spark.implicits._
    audioPayloads(spark, docs).mapPartitions { it =>
      val codec = new WavFrameCodec
      it.flatMap(codec.framesStrided(_, 2))
    }
  }

  // --------------------------------------------------------------------
  // JPEG/PNG via the JDK's javax.imageio — the formats a real image
  // corpus actually ships. The pure-JVM BMP path above stays as the
  // byte-independence contract (its reader shares zero code with its
  // builder); this path swaps the decoder behind the same seam, which
  // is exactly the production move the MediaCodec scaladoc promises.
  // --------------------------------------------------------------------

  /** Deterministic-pixel image builder for the ImageIO path: the SAME
    * planted arithmetic as [[BmpFile.build]]'s frame 0 — pixel (x, y)
    * carries b = (3x + 31y + seed) mod 256, g = +1, r = +2 with y the
    * decoder's top-down row — so the existing `image_thumb` /
    * `image_phash` oracle SQL applies verbatim to the PNG payloads
    * (PNG is lossless; every decoder returns the planted bytes
    * exactly). JPEG is lossy, so JPEG payloads back only the metadata
    * query and the near-tolerance specs, never an exact pixel oracle.
    */
  object ImageIoFile {
    private def plant(width: Int, height: Int, seed: Long): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val base = x * 3 + y * 31 + seed
          val b = (base & 0xFF).toInt
          val g = ((base + 1) & 0xFF).toInt
          val r = ((base + 2) & 0xFF).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
        y += 1
      }
      img
    }

    def buildPng(width: Int, height: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(plant(width, height, seed), "png", baos)
      baos.toByteArray
    }

    /** Max-quality, no-chroma-subsampling JPEG of the planted image —
      * still lossy (DCT rounding), which is why JPEG payloads never sit
      * behind an exact pixel oracle.
      */
    def buildJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(1.0f)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(plant(width, height, seed), null, null), params)
      } finally { ios.close(); writer.dispose() }
      baos.toByteArray
    }
  }

  /** Decoded geometry + container format of an ImageIO payload. */
  case class ImageMeta(doc_id: Long, format: String, w: Int, h: Int)

  /** JPEG/PNG decoder behind the MediaCodec seam, built on the JDK's
    * javax.imageio (present in every JRE — zero added dependencies,
    * works offline and headless). Format is sniffed from the payload
    * MAGIC (PNG `89 50 4E 47`, JPEG `FF D8 FF`), never from
    * side-channel metadata; anything else — including truncated or
    * bit-flipped streams ImageIO refuses — throws, because a decode
    * stage must fail loudly, not fabricate pixels. Decode is per-record
    * on the executor inside `mapPartitions` (codec constructed once per
    * partition; `ImageIO.setUseCache(false)` keeps the JDK from
    * spilling every decode through a temp FILE — the default disk
    * cache would serialize executor threads on tmpdir I/O).
    */
  final class ImageIoCodec extends Serializable {
    javax.imageio.ImageIO.setUseCache(false)

    def sniff(bytes: Array[Byte]): String =
      if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P'
        && bytes(2) == 'N' && bytes(3) == 'G') "png"
      else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF
        && (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF) "jpeg"
      else throw new IllegalArgumentException(
        s"unrecognized image magic (${bytes.take(4).map(b => f"$b%02x").mkString(" ")})")

    def decode(in: MediaIn): (String, java.awt.image.BufferedImage) = {
      val fmt = sniff(in.media)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(in.media))
        catch { // ImageIO throws IIOException/IndexOOB on torn streams
          case e: Exception => throw new IllegalArgumentException(
            s"doc ${in.doc_id}: corrupt $fmt payload", e)
        }
      require(img != null, s"doc ${in.doc_id}: undecodable $fmt payload")
      (fmt, img)
    }

    def meta(in: MediaIn): ImageMeta = {
      val (fmt, img) = decode(in)
      ImageMeta(in.doc_id, fmt, img.getWidth, img.getHeight)
    }

    /** 4×4 nearest-neighbor thumbnail — the [[BmpThumbCodec]] sampler
      * (floor-scaled source coordinates) over the decoded raster.
      */
    def thumb(in: MediaIn): Seq[ThumbPixel] = {
      val (_, img) = decode(in)
      val w = img.getWidth; val h = img.getHeight
      for (py <- 0 until 4; px <- 0 until 4) yield {
        val rgb = img.getRGB(px * w / 4, py * h / 4)
        ThumbPixel(in.doc_id, px, py, rgb & 0xFF, (rgb >> 8) & 0xFF, (rgb >> 16) & 0xFF)
      }
    }

    /** 64-bit perceptual average-hash — the [[BmpAHashCodec]] grid and
      * bit-packing over the decoded raster.
      */
    def ahash(in: MediaIn): ImageHash = {
      val (_, img) = decode(in)
      val w = img.getWidth; val h = img.getHeight
      val gray = new Array[Long](64)
      var sum = 0L
      var i = 0
      while (i < 64) {
        val rgb = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
        val g = ((rgb & 0xFF) + ((rgb >> 8) & 0xFF) + ((rgb >> 16) & 0xFF)).toLong
        gray(i) = g; sum += g; i += 1
      }
      val mean = sum / 64
      var lo = 0L; var hi = 0L
      i = 0
      while (i < 64) {
        if (gray(i) > mean) {
          if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
        }
        i += 1
      }
      ImageHash(in.doc_id, w, h, mean, lo, hi)
    }
  }

  /** PNG payload per doc — the [[payloads]] geometry (w 4-15, h 4-14,
    * seed doc_id*31: frame 0's planted arithmetic) through the JDK PNG
    * encoder. Single-frame on purpose: PNG has no container framing.
    */
  def pngPayloads(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id"), octet_length(col("text")).as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        val nl = n.toLong
        MediaIn(id, ImageIoFile.buildPng(
          4 + (nl % 12).toInt, 4 + ((nl * 31) % 11).toInt, id * 31))
      }
  }

  /** Mixed-format payload table: even doc_ids get PNG, odd get JPEG —
    * the corpus shape a real image pipeline ingests (format sniffed
    * per record, one codec seam).
    */
  def mixedImagePayloads(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id"), octet_length(col("text")).as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        val nl = n.toLong
        val w = 4 + (nl % 12).toInt
        val h = 4 + ((nl * 31) % 11).toInt
        MediaIn(id, if (id % 2 == 0) ImageIoFile.buildPng(w, h, id * 31)
        else ImageIoFile.buildJpeg(w, h, id * 31))
      }
  }

  /** Thumbnails over the PNG payloads — the [[thumbnails]] stage with
    * the JDK decoder swapped in behind the seam. Same 100 TB posture:
    * map-only, no shuffle, 48 B out per image.
    */
  def pngThumbnails(spark: SparkSession, docs: DataFrame): Dataset[ThumbPixel] = {
    import spark.implicits._
    pngPayloads(spark, docs).mapPartitions { it =>
      val codec = new ImageIoCodec
      it.flatMap(codec.thumb)
    }
  }

  /** aHash over the PNG payloads — [[imageHashes]] with the JDK decoder. */
  def pngImageHashes(spark: SparkSession, docs: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    pngPayloads(spark, docs).mapPartitions { it =>
      val codec = new ImageIoCodec
      it.map(codec.ahash)
    }
  }

  /** Format + geometry for the mixed PNG/JPEG corpus — the triage scan
    * an ingest pipeline runs before routing payloads to per-format
    * stages. Map-only; geometry is exact for BOTH formats (JPEG's loss
    * is in pixels, never dimensions), which is what makes this the
    * oracle-gated JPEG query.
    */
  def imageCodecMeta(spark: SparkSession, docs: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    mixedImagePayloads(spark, docs).mapPartitions { it =>
      val codec = new ImageIoCodec
      it.map(codec.meta)
    }
  }

  // --------------------------------------------------------------------
  // VIDEO via animated GIF — the third media modality, through the same
  // javax.imageio seam as the PNG/JPEG path (pure JDK, zero new deps).
  // GIF is palette-indexed, so grayscale frames (<= 256 distinct
  // colors) round-trip LOSSLESSLY — which is what puts real multi-frame
  // decode behind EXACT planted-pixel oracles, the same property PNG
  // gives the still-image path. A production deployment swaps the GIF
  // reader for an H.264 frame grabber behind the same seam.
  // --------------------------------------------------------------------

  /** Animated-GIF builder: `nFrames` full-size grayscale frames written
    * through the JDK GIF sequence writer. Frame `f` plants pixel
    * gray(x, y) = (3x + 31y + 7f + seed) mod 256 — the still-image
    * arithmetic plus a per-frame term, so per-frame decode is
    * distinguishable from decoding frame 0 n times. The reader
    * ([[GifCodec]]) never sees these arguments — only the bytes.
    */
  object GifFile {
    def build(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0 && nFrames > 0)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      // Interlace OFF, explicitly: the JDK writer interlaces by default
      // and its interlace round-trip PERMUTES ROWS at h=4 (pass 2 of the
      // 8/8-4/8-2/4-1/2 schedule starts at row 4, which doesn't exist) —
      // found empirically; h>=5 round-trips either way. Non-progressive
      // streams round-trip exactly at every geometry this builder emits.
      val params = writer.getDefaultWriteParam
      params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      val baos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < height) {
            var x = 0
            while (x < width) {
              img.getRaster.setSample(x, y, 0,
                ((3L * x + 31L * y + 7L * f + seed) & 0xFF).toInt)
              x += 1
            }
            y += 1
          }
          writer.writeToSequence(
            new javax.imageio.IIOImage(img, null, null), params)
          f += 1
        }
        writer.endWriteSequence()
      } finally { ios.close(); writer.dispose() }
      baos.toByteArray
    }
  }

  /** One sampled video frame (first / middle / last — the
    * [[MediaMeta.frame_samples]] convention over a REAL container) with
    * a decoded pixel witness: `p00` is the frame's gray value at (0,0),
    * which only per-frame decode can produce.
    */
  case class VideoFrameSample(doc_id: Long, sample_ord: Int, frame_idx: Int,
      n_frames: Int, p00: Int)

  /** One decoded frame's 8×8-grid brightness mean — the per-frame
    * feature stream the shot-boundary census consumes (a real video
    * curation pass samples frames AT cuts, not uniformly; the cut
    * census is the first read of that pipeline). `p00` is the frame's
    * decoded (0,0) gray — the per-frame pixel witness the cut-aware
    * sampler carries (only true per-frame decode matches it).
    */
  case class VideoFrameMean(doc_id: Long, frame_idx: Int, n_frames: Int,
      fmean: Long, p00: Int)

  /** Per-video dedup fingerprint: frame count, frame-0 aHash (the
    * [[ImageHash]] grid and bit-packing over the single gray channel),
    * and the brightness CONTOUR — bit f set iff frame f+1's grid mean
    * exceeds frame f's (the [[graft.queries.Pipeline]] audio
    * energy-contour trick in the image domain: robust to uniform
    * brightness shifts, sensitive to temporal structure).
    */
  case class VideoHash(doc_id: Long, n_frames: Int, hash_lo: Long,
      hash_hi: Long, contour_fp: Long)

  /** Animated-GIF decoder behind the ImageIO seam. The magic check is
    * OURS ("GIF87a"/"GIF89a"), not the JDK's: the format-named reader
    * demonstrably decodes a stream whose magic was corrupted (it trusts
    * the caller's format choice), so a codec that skipped the sniff
    * would fabricate frames from non-GIF bytes. Truncated or torn
    * streams make the reader throw IIOException mid-walk; both paths
    * surface as IllegalArgumentException — decode fails loudly, never
    * fabricates. Frames are written full-size by [[GifFile]], so
    * `read(f)` yields each frame's complete raster without disposal
    * compositing.
    */
  final class GifCodec extends Serializable {
    javax.imageio.ImageIO.setUseCache(false)

    def sniff(bytes: Array[Byte]): Unit = {
      val ok = bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8' &&
        (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'
      if (!ok) throw new IllegalArgumentException(
        s"bad GIF magic (${bytes.take(6).map(b => f"$b%02x").mkString(" ")})")
    }

    private def withFrames[T](in: MediaIn)(
        body: (Int, Int => java.awt.image.BufferedImage) => T): T = {
      sniff(in.media)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        reader.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(in.media)), false)
        val n =
          try reader.getNumImages(true)
          catch { case e: Exception => throw new IllegalArgumentException(
            s"doc ${in.doc_id}: corrupt GIF container", e) }
        require(n > 0, s"doc ${in.doc_id}: GIF with zero frames")
        body(n, f =>
          try reader.read(f)
          catch { case e: Exception => throw new IllegalArgumentException(
            s"doc ${in.doc_id}: corrupt GIF frame $f", e) })
      } finally reader.dispose()
    }

    /** First/middle/last frame samples with the decoded (0,0) gray. */
    def frameSamples(in: MediaIn): Seq[VideoFrameSample] =
      withFrames(in) { (n, read) =>
        Seq(1 -> 0, 2 -> (n / 2), 3 -> (n - 1)).map { case (ord, fi) =>
          VideoFrameSample(in.doc_id, ord, fi, n, read(fi).getRGB(0, 0) & 0xFF)
        }
      }

    /** Per-frame 8×8-grid means — the [[videoHash]] mean arithmetic
      * exposed as a frame stream (shot-boundary detection needs the
      * mean SEQUENCE, not just the contour signs).
      */
    def frameMeans(in: MediaIn): Seq[VideoFrameMean] =
      withFrames(in) { (n, read) =>
        (0 until n).map { f =>
          val img = read(f)
          val w = img.getWidth; val h = img.getHeight
          var sum = 0L
          var i = 0
          while (i < 64) {
            sum += (img.getRGB((i % 8) * w / 8, (i / 8) * h / 8) & 0xFF).toLong
            i += 1
          }
          VideoFrameMean(in.doc_id, f, n, sum / 64, img.getRGB(0, 0) & 0xFF)
        }
      }

    /** Frame-0 aHash + whole-video brightness contour. */
    def videoHash(in: MediaIn): VideoHash =
      withFrames(in) { (n, read) =>
        val means = new Array[Long](n)
        var lo = 0L; var hi = 0L
        var f = 0
        while (f < n) {
          val img = read(f)
          val w = img.getWidth; val h = img.getHeight
          val gray = new Array[Long](64)
          var sum = 0L
          var i = 0
          while (i < 64) {
            gray(i) = (img.getRGB((i % 8) * w / 8, (i / 8) * h / 8) & 0xFF).toLong
            sum += gray(i); i += 1
          }
          means(f) = sum / 64
          if (f == 0) { // frame-0 aHash, the ImageHash bit convention
            i = 0
            while (i < 64) {
              if (gray(i) > means(0)) {
                if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
              }
              i += 1
            }
          }
          f += 1
        }
        var cfp = 0L
        f = 0
        while (f < n - 1) {
          if (means(f + 1) > means(f)) cfp |= (1L << f)
          f += 1
        }
        VideoHash(in.doc_id, n, lo, hi, cfp)
      }
  }

  /** Animated-GIF payload per doc: the image-path geometry (w 4-15,
    * h 4-14, seed doc_id*31) with 2-5 frames — a real multi-frame
    * container per document, built by the JDK encoder.
    */
  def videoPayloads(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id"), octet_length(col("text")).as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        val nl = n.toLong
        MediaIn(id, GifFile.build(
          4 + (nl % 12).toInt, 4 + ((nl * 31) % 11).toInt,
          2 + (nl % 4).toInt, id * 31))
      }
  }

  /** Frame-sample fan-out over real video containers — the
    * `multimodal_frames` shape with actual per-frame decode behind it.
    * Map-only, bounded output (3 rows per video at any frame count).
    */
  def videoFrameSamples(spark: SparkSession, docs: DataFrame): Dataset[VideoFrameSample] = {
    import spark.implicits._
    videoPayloads(spark, docs).mapPartitions { it =>
      val codec = new GifCodec
      it.flatMap(codec.frameSamples)
    }
  }

  /** Per-frame grid-mean stream over real video containers — map-only
    * decode, ≤5 rows per video (the builder's frame-count geometry);
    * the shot-boundary census groups it per doc with a bounded window.
    */
  def videoFrameMeans(spark: SparkSession, docs: DataFrame): Dataset[VideoFrameMean] = {
    import spark.implicits._
    videoPayloads(spark, docs).mapPartitions { it =>
      val codec = new GifCodec
      it.flatMap(codec.frameMeans)
    }
  }

  /** Per-video fingerprints — the map-only decode stream the video
    * dedup census aggregates. Same 100 TB posture as [[imageHashes]]:
    * no shuffle, ~20 fingerprint bytes out per video of any length.
    */
  def videoHashes(spark: SparkSession, docs: DataFrame): Dataset[VideoHash] = {
    import spark.implicits._
    videoPayloads(spark, docs).mapPartitions { it =>
      val codec = new GifCodec
      it.map(codec.videoHash)
    }
  }

  // --- RIFF/AVI video (the second container behind the video seam) ----
  // The WAV chunk grammar (RIFF lists walked by declared length, never a
  // fixed layout) carrying uncompressed 8-bit DIB frames: proves the
  // video seam is format-agnostic the way RIFF/WAVE proved the audio
  // seam was not BMP-shaped. Grayscale palette DIBs are lossless, so AVI
  // carries the same exact planted-pixel oracles as the GIF path — and
  // the same logical content through BOTH containers must decode to the
  // same frame samples (spec-pinned).
  // --------------------------------------------------------------------

  /** Uncompressed 8-bit grayscale RIFF/AVI builder: LIST hdrl (avih +
    * one 'vids'/'DIB ' stream with a BITMAPINFOHEADER + 256-gray
    * palette) then LIST movi with one '00db' DIB frame chunk per frame
    * (bottom-up rows, 4-byte padded — biBitCount=8 keeps the gray value
    * the stored byte, lossless). Frame `f` plants gray(x, y) =
    * (3x + 31y + 7f + seed) mod 256 — the [[GifFile]] arithmetic, so
    * the two containers carry identical logical content. The reader
    * ([[AviCodec]]) never sees these arguments — only the bytes.
    */
  object AviFile {
    def rowBytes(width: Int): Int = (width + 3) / 4 * 4

    def build(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
      require(width > 0 && height > 0 && nFrames > 0)
      val rb = rowBytes(width)
      val frameBytes = rb * height
      val strfSize = 40 + 256 * 4            // BITMAPINFOHEADER + palette
      val strlSize = 4 + (8 + 56) + (8 + strfSize)
      val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
      val moviSize = 4 + nFrames * (8 + frameBytes)
      val total = 12 + (8 + hdrlSize) + (8 + moviSize)
      val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes("US-ASCII")).putInt(total - 8)
        .put("AVI ".getBytes("US-ASCII"))
      b.put("LIST".getBytes("US-ASCII")).putInt(hdrlSize)
        .put("hdrl".getBytes("US-ASCII"))
      b.put("avih".getBytes("US-ASCII")).putInt(56)
        .putInt(100000)                      // dwMicroSecPerFrame (10 fps)
        .putInt(frameBytes * 10)             // dwMaxBytesPerSec
        .putInt(0).putInt(0)                 // padding granularity, flags
        .putInt(nFrames)                     // dwTotalFrames
        .putInt(0).putInt(1)                 // initial frames, dwStreams
        .putInt(frameBytes)                  // suggested buffer
        .putInt(width).putInt(height)
        .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
      b.put("LIST".getBytes("US-ASCII")).putInt(strlSize)
        .put("strl".getBytes("US-ASCII"))
      b.put("strh".getBytes("US-ASCII")).putInt(56)
        .put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
        .putInt(0).putShort(0).putShort(0)   // flags, priority, language
        .putInt(0)                           // initial frames
        .putInt(1).putInt(10)                // dwScale / dwRate = 10 fps
        .putInt(0).putInt(nFrames)           // start, dwLength
        .putInt(frameBytes)                  // suggested buffer
        .putInt(-1).putInt(0)                // quality, sample size
        .putShort(0).putShort(0)             // rcFrame left, top
        .putShort(width.toShort).putShort(height.toShort)
      b.put("strf".getBytes("US-ASCII")).putInt(strfSize)
        .putInt(40)                          // biSize
        .putInt(width).putInt(height)
        .putShort(1).putShort(8)             // planes, 8-bit
        .putInt(0)                           // BI_RGB (uncompressed)
        .putInt(frameBytes)
        .putInt(0).putInt(0)                 // ppm x/y
        .putInt(256).putInt(0)               // biClrUsed, biClrImportant
      var g = 0
      while (g < 256) {                      // grayscale palette (B,G,R,0)
        b.put(g.toByte).put(g.toByte).put(g.toByte).put(0.toByte); g += 1
      }
      b.put("LIST".getBytes("US-ASCII")).putInt(moviSize)
        .put("movi".getBytes("US-ASCII"))
      var f = 0
      while (f < nFrames) {
        b.put("00db".getBytes("US-ASCII")).putInt(frameBytes)
        var y = height - 1                   // DIB rows store bottom-up
        while (y >= 0) {
          var x = 0
          while (x < rb) {
            b.put(if (x < width)
              ((3L * x + 31L * y + 7L * f + seed) & 0xFF).toByte
            else 0.toByte)                   // row pad
            x += 1
          }
          y -= 1
        }
        f += 1
      }
      b.array()
    }
  }

  /** Pure-JVM RIFF/AVI decoder: validates the RIFF/'AVI ' magic and the
    * declared size, walks LIST chunks by declared length (the WavCodec
    * grammar — hdrl for geometry/frame count and the 8-bit uncompressed
    * strf contract, movi for '00db' DIB frames), and checks every frame
    * chunk against the header geometry. Malformed, truncated, or
    * non-8-bit streams throw — a decode stage fails loudly, never
    * fabricates frames (the GifCodec sniff contract).
    */
  final class AviCodec extends Serializable {
    def sniff(bytes: Array[Byte]): Unit = {
      val ok = bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "AVI "
      if (!ok) throw new IllegalArgumentException(
        s"bad RIFF/AVI magic (${bytes.take(12).map(b => f"$b%02x").mkString(" ")})")
    }

    /** (width, height, nFrames, frame-data offsets). */
    private def parse(in: MediaIn): (Int, Int, Int, Array[Int]) = {
      val bytes = in.media
      sniff(bytes)
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(bb.getInt(4) == bytes.length - 8,
        s"doc ${in.doc_id}: RIFF size ${bb.getInt(4)} != payload ${bytes.length - 8}")
      var w = -1; var h = -1; var n = -1
      var bits = -1; var compression = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Int]
      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = ascii(off, 4)
          val sz = bb.getInt(off + 4)
          require(sz >= 0 && off + 8 + sz <= to,
            s"doc ${in.doc_id}: chunk '$id' size $sz overruns payload at offset $off")
          id match {
            case "LIST" =>
              require(sz >= 4, s"doc ${in.doc_id}: LIST too short at $off")
              val kind = ascii(off + 8, 4)
              walk(off + 12, off + 8 + sz, inMovi = kind == "movi")
            case "avih" =>
              require(sz >= 56, s"doc ${in.doc_id}: avih too short")
              n = bb.getInt(off + 8 + 16)
              w = bb.getInt(off + 8 + 32)
              h = bb.getInt(off + 8 + 36)
            case "strf" =>
              require(sz >= 40, s"doc ${in.doc_id}: strf too short")
              bits = bb.getShort(off + 8 + 14)
              compression = bb.getInt(off + 8 + 16)
            case "00db" if inMovi => frames += off + 8
            case _ => () // unknown chunk: skip by declared length
          }
          off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, bytes.length, inMovi = false)
      require(w > 0 && h > 0 && n > 0,
        s"doc ${in.doc_id}: missing/empty avih header ($w x $h, $n frames)")
      require(bits == 8 && compression == 0,
        s"doc ${in.doc_id}: unsupported DIB ($bits-bit, compression $compression)")
      require(frames.length == n,
        s"doc ${in.doc_id}: header declares $n frames, movi carries ${frames.length}")
      val fb = AviFile.rowBytes(w) * h
      frames.foreach { fo =>
        require(bb.getInt(fo - 4) == fb,
          s"doc ${in.doc_id}: frame chunk size ${bb.getInt(fo - 4)} != $fb")
      }
      (w, h, n, frames.toArray)
    }

    /** Gray value at (x, y) of frame data starting at `off` (bottom-up
      * DIB rows, 4-byte row padding).
      */
    private def gray(bytes: Array[Byte], off: Int, w: Int, h: Int,
        x: Int, y: Int): Int =
      bytes(off + (h - 1 - y) * AviFile.rowBytes(w) + x) & 0xFF

    /** First/middle/last frame samples with the decoded (0,0) gray —
      * the [[GifCodec.frameSamples]] contract over the AVI container.
      */
    def frameSamples(in: MediaIn): Seq[VideoFrameSample] = {
      val (w, h, n, offs) = parse(in)
      Seq(1 -> 0, 2 -> (n / 2), 3 -> (n - 1)).map { case (ord, fi) =>
        VideoFrameSample(in.doc_id, ord, fi, n, gray(in.media, offs(fi), w, h, 0, 0))
      }
    }

    /** Frame-0 aHash + brightness contour — the [[GifCodec.videoHash]]
      * arithmetic over the AVI container: same grid, same bit packing,
      * so the same logical content fingerprints identically through
      * either container (the dedup key survives a container migration —
      * spec-pinned).
      */
    def videoHash(in: MediaIn): VideoHash = {
      val (w, h, n, offs) = parse(in)
      val means = new Array[Long](n)
      var lo = 0L; var hi = 0L
      var f = 0
      while (f < n) {
        val g = new Array[Long](64)
        var sum = 0L
        var i = 0
        while (i < 64) {
          g(i) = gray(in.media, offs(f), w, h, (i % 8) * w / 8, (i / 8) * h / 8).toLong
          sum += g(i); i += 1
        }
        means(f) = sum / 64
        if (f == 0) {
          i = 0
          while (i < 64) {
            if (g(i) > means(0)) {
              if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
            }
            i += 1
          }
        }
        f += 1
      }
      var cfp = 0L
      f = 0
      while (f < n - 1) {
        if (means(f + 1) > means(f)) cfp |= (1L << f)
        f += 1
      }
      VideoHash(in.doc_id, n, lo, hi, cfp)
    }
  }

  /** AVI payload per doc — the SAME geometry and planted seed as
    * [[videoPayloads]] (w 4-15, h 4-14, 2-5 frames, seed doc_id*31), so
    * the GIF and AVI containers carry identical logical content per doc
    * and their decoded frame samples must be row-identical.
    */
  def aviPayloads(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id"), octet_length(col("text")).as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        val nl = n.toLong
        MediaIn(id, AviFile.build(
          4 + (nl % 12).toInt, 4 + ((nl * 31) % 11).toInt,
          2 + (nl % 4).toInt, id * 31))
      }
  }

  /** Frame-sample fan-out over AVI containers — map-only, 3 rows per
    * video, same 100 TB posture as [[videoFrameSamples]].
    */
  def aviFrameSamples(spark: SparkSession, docs: DataFrame): Dataset[VideoFrameSample] = {
    import spark.implicits._
    aviPayloads(spark, docs).mapPartitions { it =>
      val codec = new AviCodec
      it.flatMap(codec.frameSamples)
    }
  }
}
