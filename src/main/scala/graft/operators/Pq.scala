package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-compression half of a
  * production ANN index (IVF-PQ): each 64-dim vector is encoded as M=4
  * one-byte codes, one per 16-dim subspace, by assigning every subvector
  * to its nearest centroid in a per-subspace codebook trained with the
  * same exact-integer Lloyd's k-means as the IVF coarse quantizer
  * ([[Kmeans]] — PQ is literally M independent k-means runs on sliced
  * vectors, so the trainer is reused verbatim).
  *
  * Query-time scoring is asymmetric distance computation (ADC): the
  * query's M×k table of exact squared-L2 distances to every codebook
  * centroid is precomputed once (32 longs — a broadcast scalar), and
  * each corpus vector's distance is approximated by M table lookups on
  * its codes. At 100 TB the scan therefore reads the 4-byte code column,
  * not the 256-byte raw vectors — a 64× I/O reduction, and the reason
  * PQ exists (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011). Everything stays on the integer-micro lattice:
  * training, codes and ADC scores are bit-reproducible and DuckDB-
  * recomputable (micro components ≤ ~2e6, so a 16-dim squared distance
  * is ≤ ~6.4e13 and an M-sum ≤ ~2.6e14 — far inside BIGINT).
  *
  * The reference engine has no similarity-search trace (SURVEY.md §2
  * tier C); this is north-star scope.
  */
object Pq {

  val M = 4       // subspaces
  val SubDim = 16 // dims per subspace (64-dim embeddings)
  val K = 8       // centroids per codebook
  val Iters = 2   // Lloyd rounds, matching the IVF quantizer

  /** Train the M per-subspace codebooks: model(m)(cid)(dim) in integer
    * micros. Each subspace is an independent [[Kmeans.train]] over the
    * sliced vectors (same init / tie-break / empty-cluster contract).
    */
  def train(emb: DataFrame): Array[Array[Array[Long]]] =
    Array.tabulate(M) { m =>
      Kmeans.train(
        emb.select(col("vec_id"),
          slice(col("embedding"), m * SubDim + 1, SubDim).as("embedding")),
        k = K, iters = Iters)
    }

  /** The nearest-codebook-centroid code for subspace `m` of the full
    * quantized vector column `v` — one codegen'd k×SubDim argmin loop.
    */
  private def codeOf(v: Column, model: Array[Array[Array[Long]]], m: Int): Column =
    graft.functions.SketchExprs
      .nearestCentroid(slice(v, m * SubDim + 1, SubDim), model(m))
      .getField("cid")

  /** Encode the corpus: (vec_id, codes array<int> of length M) — the
    * compact artifact the ADC scan reads. Map-only; at 100 TB this table
    * IS the index payload (4 bytes/vector + id).
    */
  def codesWide(emb: DataFrame, model: Array[Array[Array[Long]]]): DataFrame =
    Kmeans.quantized(emb).select(col("vec_id"),
      array((0 until M).map(m => codeOf(col("v"), model, m)): _*).as("codes"))

  /** The M=4 one-byte codes bit-packed into ONE int (code m in byte m,
    * little-endian) — the physically-4-bytes-per-vector storage form of
    * the materialized index. K ≤ 256 by construction (codes are bytes);
    * the pack/unpack is two shifts in codegen, so the ADC scan pays
    * nothing for the 4× storage reduction over `array<int>` (which
    * additionally carries per-row array headers in parquet).
    */
  def packCodes(codes: Column): Column =
    (0 until M).map(m => shiftleft(codes.getItem(m).cast("int"), 8 * m))
      .reduce(_ bitwiseOR _)

  /** ADC score over a packed `code32` column: Σ_m dt(m)((code32 >> 8m)
    * & 0xFF) — same flattened-literal lookups as [[adcScore]], reading
    * the 4-byte form directly.
    */
  def adcScorePacked(code32: Column, dt: Array[Array[Long]]): Column = {
    val flat = typedLit(dt.flatten.toSeq)
    (0 until M).map { m =>
      element_at(flat,
        (lit(m * K) + shiftright(code32, 8 * m).bitwiseAND(lit(0xFF))).cast("int") + 1)
    }.reduce(_ + _)
  }

  /** Encode-on-ingest — the streaming face of the index build: vectors
    * arriving in a monitored directory are encoded against the SHIPPED
    * trained codebooks (broadcast-literal model, the exact batch
    * [[codesWide]] transform) in a STATELESS map-only stream — no
    * watermark, no state, because PQ encode is per-row. This is how the
    * index keeps up with 100 TB/day of new vectors: each micro-batch is
    * embarrassingly parallel, and the sink appends into the
    * cell-partitioned layout ([[graft.queries.Pipeline.pqIndexPath]])
    * so probes see new data without a rebuild. `sfDir` supplies the
    * schema (streaming reads require one up front).
    */
  def encodeStream(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      streamDir: String, model: Array[Array[Array[Long]]]): DataFrame = {
    val schema = graft.sources.Tables.embeddings(spark, sfDir).schema
    codesWide(spark.readStream.schema(schema).parquet(streamDir), model)
  }

  /** The query's ADC lookup table: dt(m)(cid) = exact squared L2 between
    * the query's subvector m and codebook centroid cid, in micro².
    * M×K = 32 longs — computed on the driver, shipped as a literal.
    */
  def distTables(model: Array[Array[Array[Long]]], qv: Array[Long]): Array[Array[Long]] =
    Array.tabulate(M) { m =>
      model(m).map { c =>
        var s = 0L
        var i = 0
        while (i < SubDim) {
          val d = qv(m * SubDim + i) - c(i)
          s += d * d
          i += 1
        }
        s
      }
    }

  /** ADC score column over a `codes` array column: Σ_m dt(m)(codes(m)).
    * One flattened M×K literal + M element_at lookups — stays inside
    * whole-stage codegen, no join, no shuffle.
    */
  def adcScore(codes: Column, dt: Array[Array[Long]]): Column = {
    val flat = typedLit(dt.flatten.toSeq)
    (0 until M).map { m =>
      element_at(flat, (lit(m * K) + codes.getItem(m)).cast("int") + 1)
    }.reduce(_ + _)
  }
}
