package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval over the corpus: BM25 scoring of a query
  * workload against the documents table — the retrieval half of a
  * RAG / decontamination / eval-matching pipeline (the dense half is
  * [[SimilarityOps]]).
  *
  * Scale shape: one tokenize+explode pass builds the (doc, term) tf
  * postings with map-side combine (shuffle carries per-distinct-pair
  * partials, not token occurrences); the query workload and its
  * per-term document frequencies are broadcast (a query set is KBs —
  * never a corpus-sized side); scoring is therefore one map-side fan-out
  * over matching postings plus a (query, doc) combining aggregation.
  * Nothing corpus-sized is ever collected, broadcast, or windowed
  * globally.
  */
object RetrievalOps {

  /** BM25 top-`topK` documents per query. `queryTerms` is the query
    * workload as (query_id, terms) — already-tokenized bags, matching
    * the corpus' whitespace-lowercase tokenization.
    *
    * idf uses log2 (a constant 1/ln 2 scale of the classic ln form —
    * identical ranking) because log2 is the one log the engine's whole
    * numeric surface already proved bit-portable against the DuckDB
    * oracle; per-term contributions are decimal-cast so the per-doc sum
    * is order-independent at any parallelism. Ranking rounds the score
    * to 9 decimals with a doc_id tie-break, so the top-k cut is
    * deterministic and engine-portable (a raw float key can flip
    * near-ties in the last ulp).
    *
    * The per-query top-k runs as a rank-predicate window
    * (WindowGroupLimit: map tasks keep `topK` rows per query before the
    * exchange); candidate rows per query are bounded by the postings of
    * its terms, not the corpus.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[(Int, Seq[String])],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // (doc_id, dl, term) -> tf: dl rides the explode so the corpus is
    // tokenized ONCE (first() is exact — dl is constant per doc)
    val tf = docs.select(col("doc_id"), expr(TextOps.TOKENS).as("t"))
      .select(col("doc_id"), size(col("t")).as("dl"),
        explode(col("t")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // corpus scalars: N and the exact token total (long sum), so
    // avgdl is the same IEEE division both engines perform
    val totals = docs.select(size(expr(TextOps.TOKENS)).as("dl"))
      .agg(count(lit(1)), sum(col("dl").cast("long"))).head()
    val nDocs = totals.getLong(0)
    val avgdl = totals.getLong(1).toDouble / nDocs
    val terms = queryTerms.flatMap { case (q, ts) => ts.map((q, _)) }
      .toDF("query_id", "term")
    // postings restricted to query terms (broadcast semi-shape), then
    // per-term df from the distinct (doc, term) postings themselves
    val tfq = tf.join(broadcast(terms.select("term").distinct()), "term")
    val dfT = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tfq
      .join(broadcast(dfT), "term")
      .join(broadcast(terms), "term")
      .withColumn("contrib", expr(
        s"""cast(
           |  log2(1.0D + ($nDocs - df + 0.5D) / (df + 0.5D)) *
           |  (tf * ${k1 + 1}) /
           |  (tf + $k1 * (${1 - b} + $b * dl / ${avgdl}D))
           |  as decimal(38, 18))""".stripMargin))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).cast("double").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(round(col("score"), 9).desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("query_id", "rank", "doc_id", "score")
  }
}
