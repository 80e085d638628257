package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column-API surface for graft's custom Catalyst expressions — the
  * registry-shaped extension point the reference declared but never filled
  * (`ScalarFunction{name, args, return_type}` with no registry,
  * /root/reference/src/planner/logicalplan.rs:64-71).
  */
package object functions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def e(col: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    ColumnBridge.expression(col)

  /** Cosine similarity of two array<float|double> vectors (codegen'd). */
  def cosine_sim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))

  /** Dot product of two array<float|double> vectors (codegen'd). */
  def dot_product(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))

  /** Euclidean (L2) distance of two array<float|double> vectors (codegen'd). */
  def euclidean_dist(a: Column, b: Column): Column = c(EuclideanDistance(e(a), e(b)))

  /** k-slot MinHash signature over array<string> tokens. */
  def minhash_sig(tokens: Column, k: Int, seed: Long = 42L): Column =
    c(MinHashSignature(e(tokens), k, seed))

  /** 64-bit SimHash over array<string> tokens. */
  def simhash64(tokens: Column, seed: Long = 42L): Column =
    c(SimHash64(e(tokens), seed))

  /** Hamming distance between two 64-bit hashes (codegen'd). */
  def hamming64(a: Column, b: Column): Column = c(HammingDistance64(e(a), e(b)))

  /** Intersection size of two sorted array<long> columns (codegen'd merge). */
  def sorted_intersect_size(a: Column, b: Column): Column =
    c(SortedIntersectSize(e(a), e(b)))

  /** PPJoin prefix filter: false proves Jaccard(a, b) < threshold for
    * sorted array<long> inputs (codegen'd; never drops a true pair).
    */
  def prefix_overlap(a: Column, b: Column, threshold: Double): Column =
    c(PrefixOverlap(e(a), e(b), threshold))

  /** Fused thresholded Jaccard over sorted array<long>: exact jac when
    * >= threshold is still reachable, -1 on early-exit (codegen'd single
    * merge pass).
    */
  def bounded_jaccard(a: Column, b: Column, threshold: Double): Column =
    c(BoundedJaccard(e(a), e(b), threshold))

  /** Accent folding: NFD + strip combining marks (codegen'd). */
  def unaccent(s: Column): Column = c(Unaccent(e(s)))

  /** Shannon entropy in bits over the string's code-point distribution. */
  def char_entropy(s: Column): Column = c(CharEntropy(e(s)))

  /** Whole-string 64-bit fingerprint (codegen'd). */
  def fingerprint64(s: Column, seed: Long = 42L): Column = c(Fingerprint64(e(s), seed))

  /** All sign-LSH table buckets of a vector in one fused pass. */
  def sign_lsh_buckets(vec: Column, nPlanes: Int, nTables: Int, dim: Int,
      seed: Long = 42L, tableSeedStride: Long = 7919L): Column =
    c(SignLshBuckets(e(vec), nPlanes, nTables, dim, seed, tableSeedStride))

  /** Hashed lowercased whitespace tokens, in order (allocation-free). */
  def hashed_words(s: Column, seed: Long = 42L): Column =
    c(HashedWords(e(s), seed))

  /** Rolling-hash every n-window of pre-hashed tokens (O(tokens) total). */
  def ngram_poly_hashes(hashes: Column, n: Int): Column =
    c(NgramPolyHashes(e(hashes), n))

  /** Sorted distinct k-byte-window hashes (allocation-free shingling). */
  def hashed_shingles(s: Column, k: Int, seed: Long = 42L): Column =
    c(HashedShingles(e(s), k, seed))

  /** Lazy char-k-gram shingle UDTF: one (pos, shingle) row per position. */
  def explode_shingles(s: Column, k: Int): Column = c(ExplodeShingles(e(s), k))

  /** Winnowing k-gram fingerprints (array<long>, sorted distinct). */
  def winnow_fingerprints(s: Column, k: Int = 5, w: Int = 4, seed: Long = 42L): Column =
    c(WinnowFingerprints(e(s), k, w, seed))

  /** Morton/Z-order interleave of two int columns' low 16 bits (codegen'd). */
  def zorder2(x: Column, y: Column): Column = c(ZOrder2(e(x), e(y)))

  /** Codegen'd Bloom-filter membership test of a bigint key (semi-join
    * reduction predicate; false positives at the filter's fpp — follow
    * with an exact join).
    */
  def bloom_might_contain(key: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    c(BloomMightContainLong(e(key), out.toByteArray))
  }
}
