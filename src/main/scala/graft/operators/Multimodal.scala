package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 tier C): media payloads are
  * opaque `binary` columns with typed metadata extracted by a codec that
  * runs per-partition (`mapPartitions`) — the standard Spark pattern for
  * batch decode/feature-extract where the codec has per-task init cost
  * (native lib handles, model weights) that must be amortized across a
  * partition, not paid per row.
  *
  * The container ships no image/audio libraries, so the actual byte
  * decoding is STUBBED behind [[MediaCodec]] with a deterministic fake
  * ([[FakeCodec]]); everything Spark-side — binary schema, partition-wise
  * batching, codec lifecycle, metadata struct shape — is real and tested.
  * A production deployment swaps `FakeCodec` for a JNI/JavaCV decoder
  * without touching the plumbing.
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

  /** Deterministic fake standing in for the real byte decoder (no media
    * libs in this container). Derives plausible metadata purely from the
    * payload length so results are stable and SQL-oracle-checkable.
    */
  final class FakeCodec extends MediaCodec {
    override def decode(in: MediaIn): MediaMeta = {
      val n = in.media.length.toLong
      // real decoder would parse the container header here:
      // val header = realDecoderParse(in.media)   // ??? — stubbed
      val width = 64 + (n % 577L).toInt
      val height = 64 + ((n * 31L) % 509L).toInt
      val frames = 1 + (n % 30L).toInt
      MediaMeta(in.doc_id, n, width, height, frames,
        Seq(0, frames / 2, frames - 1))
    }
  }

  /** documents.text re-encoded as a binary media payload — the testdata
    * ships no true media table, so the bytes are derived (deterministically)
    * from the documents table to exercise the binary-column path.
    */
  def payloads(spark: SparkSession, docs: DataFrame): Dataset[MediaIn] = {
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaIn]
  }

  /** Decode metadata for every payload; codec constructed once per
    * partition (per-task amortized init), rows streamed through it.
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    payloads(spark, docs).mapPartitions { it =>
      val codec: MediaCodec = new FakeCodec // real: heavy init amortized here
      it.map(codec.decode)
    }
  }
}
