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

  /** Decoder seam. `decode` is invoked once per record on an executor;
    * implementations are constructed once per partition.
    */
  trait MediaCodec extends Serializable {
    def decode(in: MediaIn): MediaMeta
  }

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
}
