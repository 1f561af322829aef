package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted text index — term → posting list over the document corpus,
  * with the same build / extend / ledger lifecycle as every other
  * index family here (near-dup, span, ANN, vocab, components).
  *
  * The curation loops all need "which documents contain these terms"
  * (contamination probes, blocklist audits, targeted sampling). Grep
  * over 100 TB per question is a full scan; the inverted index pays
  * one tokenize pass and thereafter answers from posting lists whose
  * size tracks the QUERY's selectivity, not the corpus.
  *
  * Physical layout is where the scale story lives: postings
  * `(term, doc_id)` are RANGE-partitioned by term and sorted within
  * partitions, so every parquet file covers a narrow lexicographic
  * slice of the vocabulary and its footer min/max on `term` is tight.
  * A term lookup (`term IN (...)` — pushed to the scan as an `In`
  * filter) then prunes to the few files whose range covers the probed
  * terms: the read is posting-list-sized. No per-term directory
  * (vocabulary cardinality would explode the file count) and no
  * driver-side dictionary — the "index" is just a well-laid-out table,
  * which is exactly what makes it mergeable by plain appends.
  *
  * Token definition matches [[TextOps.tokens]] (single-space split),
  * so a SQL oracle reproduces membership with `string_split`.
  */
object TextIndex {

  private def dataPath(path: String) = s"$path/data"

  /** Distinct `(term, doc_id)` postings of a corpus tranche. Distinct
    * BEFORE the exchange (map-side combine on the explode output):
    * a term repeated in one doc contributes one posting.
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()

  /** Initialize the index: postings range-laid-out by term. `nFiles`
    * bounds the vocabulary slices; at corpus scale set it so one
    * slice's postings fit a ~128 MB file.
    */
  def buildTextIndex(docs: DataFrame, path: String, nFiles: Int = 8): Unit = {
    postings(docs)
      .repartitionByRange(nFiles, col("term"), col("doc_id"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode(SaveMode.Overwrite).parquet(dataPath(path))
    graft.util.Lake.buildFileStats(docs.sparkSession, dataPath(path), Seq("term"))
  }

  /** Fold a shard's postings in (parquet append — existing slices are
    * never rewritten; term ranges of shard files overlap older ones
    * until a [[graft.util.Lake.compactClustered]] maintenance pass
    * re-narrows them, same as any LSM-ish accretion). The ledger makes
    * re-delivered shards a no-op: doubled postings would not change
    * search ANSWERS (searches are distinct/semi joins) but would
    * double their read size.
    */
  def extendTextIndex(newDocs: DataFrame, path: String,
                      shardId: Option[String] = None,
                      nFiles: Int = 2): Unit = {
    val spark = newDocs.sparkSession
    if (shardId.exists(graft.util.Lake.appliedShards(spark, path))) return
    postings(newDocs)
      .repartitionByRange(nFiles, col("term"), col("doc_id"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode(SaveMode.Append).parquet(dataPath(path))
    // refresh the file-stats manifest: one postings-table scan, the
    // price of keeping term lookups file-pruned after the append
    graft.util.Lake.buildFileStats(spark, dataPath(path), Seq("term"))
    shardId.foreach(graft.util.Lake.recordApplied(spark, path, _))
  }

  /** The stored postings restricted to `terms` — the only corpus-side
    * data a search touches. Two pruning levels: WHOLE FILES via the
    * `_filestats` term-range manifest ([[graft.util.Lake
    * .readSkippingIn]] — parquet's own stats pruning skips row groups
    * but still opens every footer; the manifest skips the opens), then
    * row groups within survivors via the pushed `In` filter on the
    * sort column. The read is bounded by the probed terms' posting
    * sizes, not the index.
    */
  private def matched(spark: SparkSession, path: String,
                      terms: Seq[String]): DataFrame =
    graft.util.Lake.readSkippingIn(spark, dataPath(path), "term",
      terms.distinct)

  /** Documents containing ALL of `terms`: count distinct matched terms
    * per doc, keep docs matching the full query width. Output:
    * `(doc_id)`, one row per qualifying document.
    */
  def searchAll(spark: SparkSession, path: String,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAll: no terms")
    matched(spark, path, terms)
      .distinct() // appends may duplicate a posting across shards
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("m"))
      .filter(col("m") === terms.distinct.length)
      .select("doc_id")
  }

  /** Documents containing ANY of `terms`. */
  def searchAny(spark: SparkSession, path: String,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAny: no terms")
    matched(spark, path, terms).select("doc_id").distinct()
  }
}
