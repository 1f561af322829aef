package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-level vector math built on the codegen'd [[DotProduct]]
  * kernel. All results are double; accumulation is sequential in index
  * order (deterministic, partitioning-independent).
  */
object VectorFunctions {

  /** Dot product of two numeric array columns (double result). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Euclidean (L2) norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity computed directly; prefer pre-computing norms
    * (or pre-normalizing) on each side of a pair join so the O(N²)
    * stage only pays one dot per pair.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Distinct word n-gram shingle hashes (single-pass; see
    * [[ShingleHashes]]).
    */
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))

  /** Intersection cardinality of two sorted distinct `array<long>`
    * columns (linear merge; see [[SortedIntersectSize]]).
    */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Early-exit [[sortedIntersectSize]]: exact count when ≥ `minInter`,
    * -1 as soon as the remaining elements cannot reach it (see
    * [[SortedIntersectAtLeast]]).
    */
  def sortedIntersectAtLeast(a: Column, b: Column, minInter: Column): Column =
    ColumnBridge.column(
      SortedIntersectAtLeast(ColumnBridge.expression(a),
        ColumnBridge.expression(b), ColumnBridge.expression(minInter)))

  /** Min + second-min MinHash values per seeded hash function over a
    * shingle-hash array (one-pass kernel; see [[MinHashMins]]).
    */
  def minhashMins(hs: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashMins(ColumnBridge.expression(hs), numHashes))

  /** PQ codes of an embedding column (one-pass codebook sweep; see
    * [[PqEncodeCodes]]).
    */
  def pqEncode(emb: Column, books: Seq[Seq[Seq[Double]]],
               normalize: Boolean = true): Column =
    ColumnBridge.column(PqEncodeCodes(ColumnBridge.expression(emb), books, normalize))

  /** Per-query ADC distance tables (see [[PqDistTables]]). */
  def pqDistTables(emb: Column, books: Seq[Seq[Seq[Double]]],
                   normalize: Boolean = true): Column =
    ColumnBridge.column(PqDistTables(ColumnBridge.expression(emb), books, normalize))
}
