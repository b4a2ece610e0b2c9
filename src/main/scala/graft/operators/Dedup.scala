package graft.operators

import graft.functions.{Djb2, TextFns, VectorFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale deduplication operators for the LLM-data-pipeline tier
  * (SURVEY.md §2 tier C). All are pure DataFrame programs — every stage is
  * a shuffle-bounded groupBy/join, no driver-side loops, no cartesian
  * products — so the shapes hold at 100 TB:
  *
  *   - exact:   one hash-groupBy (map-side partial agg).
  *   - MinHash: shingle -> 64-perm signature -> 16x4 LSH bands ->
  *              bucket-join candidates -> exact-Jaccard verify. Work is
  *              O(candidates), not O(n^2).
  *   - SimHash: shingle djb2 -> 64-bit sign-aggregate -> 4x16-bit block
  *              join (pigeonhole-exact for hamming <= 3) -> bit_count
  *              verify.
  *   - embedding: random-hyperplane LSH tables -> bucket-join -> exact
  *              cosine verify.
  *
  * Known scale caveat (standard LSH behavior): a bucket holding k near-
  * identical members yields O(k^2) candidate pairs. That is inherent to
  * the semantics ("return the duplicate pairs"); pipelines that only need
  * a representative per cluster should aggregate buckets instead
  * (see [[Dedup.exact]]'s keep-min pattern).
  */
object Dedup {

  /** Non-empty tokens of a text column. */
  def tokensNE(text: Column): Column =
    filter(TextFns.tokens(text), t => t =!= "")

  /** Distinct 3-word shingles; null when fewer than 3 tokens. */
  def shingles(text: Column): Column = {
    val ts = tokensNE(text)
    val n = size(ts)
    val sh = transform(sequence(lit(1), n - lit(2)), i =>
      concat_ws(" ", element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2)))
    when(n >= 3, array_distinct(sh)).otherwise(lit(null).cast("array<string>"))
  }

  /** Exact dedup: sha256 of the raw text, keep the smallest doc_id per
    * hash group (single hash-groupBy; partial aggregation map-side).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(sha2(col("text"), 256).as("text_sha"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("text_sha"))

  // --- MinHash + LSH --------------------------------------------------------

  private val MinhashPerms = 64
  private val Bands = 16 // 16 bands x 4 rows
  private val P31 = 2147483647L // 2^31 - 1 (prime); a*h stays < 2^62

  /** Deterministic permutation constants (seeded — stable across runs). */
  private lazy val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(MinhashPerms)((rnd.nextInt(Int.MaxValue - 1).toLong + 1,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** doc_id -> distinct shingle array (docs with >= 3 tokens only). */
  def shingleSets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(col("sh").isNotNull)

  /** doc_id -> MinHash signature columns m0..m63.
    * One explode + one groupBy with 64 min-aggregates (all codegen'd).
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val exploded = shingleSets(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      // 31-bit base hash: xxhash64 masked (keeps a*h within int64)
      .withColumn("h", xxhash64(col("shingle")).bitwiseAND(lit(0x7FFFFFFFL)))
    val aggs = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(P31))).as(s"m$i")
    }
    exploded.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate pairs from 16-band LSH over the signatures. */
  def minhashCandidates(docs: DataFrame): DataFrame = {
    val sigs = minhashSignatures(docs)
    val bands = (0 until Bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * 4 until b * 4 + 4).map(i => col(s"m$i")): _*).as("bh"))
    }
    sigs
      .select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .groupBy(col("bk.band"), col("bk.bh"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.id1"), col("p.id2"))
      .distinct()
  }

  /** All (id1 < id2) pairs from a sorted id array, as structs. */
  private def pairsOf(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids)), y =>
        struct(x.as("id1"), y.as("id2")))))

  /** Near-dup pairs: LSH candidates verified with exact Jaccard >= minJac
    * over the shingle sets (two hash joins on doc_id — no n^2 stage).
    */
  def minhash(docs: DataFrame, minJac: Double = 0.5): DataFrame = {
    val sets = shingleSets(docs)
    minhashCandidates(docs)
      .join(sets.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))), 6))
      .filter(col("jaccard") >= minJac)
      .select(col("id1"), col("id2"), col("jaccard"))
      .orderBy(col("id1"), col("id2"))
  }

  // --- SimHash --------------------------------------------------------------

  /** doc_id -> 64-bit SimHash over djb2 shingle hashes (the reference's
    * own hash function as a native codegen'd expression, Djb2.scala).
    */
  def simhashes(docs: DataFrame): DataFrame = {
    val exploded = shingleSets(docs)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), Djb2.djb2(col("shingle")).as("h"))
    val sums = (0 until 64).map { i =>
      sum(when(shiftrightunsigned(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"s$i")
    }
    exploded.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs with hamming distance <= maxHamming (default 3).
    * Block-join is exact for <= 3: 4 disjoint 16-bit blocks, so any pair
    * within hamming 3 shares at least one block (pigeonhole).
    */
  def simhash(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhashes(docs)
    val blocks = (0 until 4).map { b =>
      struct(lit(b).as("blk"),
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
    }
    sh.select(struct(col("doc_id"), col("simhash")).as("rec"),
        explode(array(blocks: _*)).as("bk"))
      .groupBy(col("bk.blk"), col("bk.v"))
      .agg(sort_array(collect_set(col("rec"))).as("recs"))
      .filter(size(col("recs")) > 1)
      .select(explode(pairsOf(col("recs"))).as("p"))
      .select(col("p.id1.doc_id").as("id1"), col("p.id2.doc_id").as("id2"),
        bit_count(col("p.id1.simhash").bitwiseXOR(col("p.id2.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("id1"), col("id2"))
  }

  // --- Embedding near-dup (random hyperplane LSH) --------------------------

  private val Tables = 8
  private val PlanesPerTable = 4

  /** Deterministic Gaussian hyperplanes: Tables x PlanesPerTable x dim. */
  private def hyperplanes(dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(12345)
    Array.fill(Tables, PlanesPerTable, dim)(rnd.nextGaussian())
  }

  /** Candidate pairs whose exact cosine >= minCos. LSH tables bound the
    * candidate set (approximate recall, exact precision — standard ANN
    * trade; brute-force cross-join would be O(n^2) and is refused here).
    */
  def embeddingNearDup(emb: DataFrame, dim: Int, minCos: Double = 0.35): DataFrame = {
    val planes = hyperplanes(dim)
    val tableKeys = (0 until Tables).map { t =>
      struct(lit(t).as("tbl"),
        VectorFns.lshSignature(col("embedding"), planes(t)).as("sig"))
    }
    val candidates = emb
      .select(col("vec_id"), explode(array(tableKeys: _*)).as("tk"))
      .groupBy(col("tk.tbl"), col("tk.sig"))
      .agg(sort_array(collect_set(col("vec_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairsOf(col("ids"))).as("p"))
      .select(col("p.id1"), col("p.id2"))
      .distinct()
    candidates
      .join(emb.select(col("vec_id").as("id1"), col("embedding").as("e1")), "id1")
      .join(emb.select(col("vec_id").as("id2"), col("embedding").as("e2")), "id2")
      .withColumn("cos_sim", round(VectorFns.cosine(col("e1"), col("e2")), 6))
      .filter(col("cos_sim") >= minCos)
      .select(col("id1"), col("id2"), col("cos_sim"))
      .orderBy(col("id1"), col("id2"))
  }
}
