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
    // ONE tokenize pass pinned: the tf postings and the N/avgdl
    // scalars both read it (a second regexp-split scan of the corpus
    // for two driver scalars would double the dominant map cost)
    val base = DedupOps.pin(
      docs.select(col("doc_id"), expr(TextOps.TOKENS).as("t")).persist())
    // corpus scalars: N and the exact token total (long sum), so
    // avgdl is the same IEEE division both engines perform
    val totals = base.select(size(col("t")).as("dl"))
      .agg(count(lit(1)), sum(col("dl").cast("long"))).head()
    val nDocs = totals.getLong(0)
    val avgdl = totals.getLong(1).toDouble / nDocs
    val terms = queryTerms.flatMap { case (q, ts) => ts.map((q, _)) }
      .toDF("query_id", "term")
    // postings restricted to query terms BEFORE the tf aggregation
    // (opt r19, guide §2.3 "filter before the exchange"): the former
    // shape grouped the FULL corpus postings by (doc, term) and only
    // then broadcast-semi-joined the query terms, so the tf exchange
    // carried every posting in the corpus; the map-side broadcast
    // filter drops non-query terms first, and the exchange carries
    // only matching postings. tf/df/dl per surviving (doc, term) are
    // unchanged (dl rides the explode; first() is exact — dl is
    // constant per doc).
    val tfq = base
      .select(col("doc_id"), size(col("t")).as("dl"),
        explode(col("t")).as("term"))
      .join(broadcast(terms.select("term").distinct()), "term")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
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

  /** ColBERT-style LATE-INTERACTION retrieval (MaxSim): a query is a
    * SET of chunk vectors, a document is a SET of chunk vectors, and
    * score(q, d) = Σ over query chunks of the max cosine against any
    * doc chunk — the token-level interaction single-vector retrieval
    * (brute cosine, IVF-PQ) cannot express. Lowering: unit-normalize
    * once per side, broadcast the query chunks over the corpus chunk
    * scan (one map-side codegen'd `dot_f64` per pair — never an
    * interpreted fold), then two aggregates: max per
    * (query, query-chunk, doc) and a DECIMAL sum of the maxes per
    * (query, doc) — the sum must be order-independent because shuffle
    * arrival order isn't deterministic, and the rank cut ties on
    * doc_id so it is engine-portable. Emits (query_id, doc_id, rank).
    *
    * Scale: the corpus side streams map-only into the first
    * aggregate; candidate volume is |corpus chunks| × |query chunks|,
    * so a large query workload would route through an ANN index
    * (IVF-PQ) for candidate docs first and MaxSim-rescore the
    * shortlist — the standard two-stage deployment.
    */
  def maxSimTopK(docChunks: DataFrame, queryChunks: DataFrame,
      k: Int, dim: Int = SimilarityOps.Dim): DataFrame = {
    val cu = DedupOps
      .unitArr(docChunks.select(col("vec_id"), col("embedding")), dim)
      .join(docChunks.select(col("vec_id"), col("doc_id")), "vec_id")
    val qu = DedupOps
      .unitArr(queryChunks.select(col("vec_id"), col("embedding")), dim)
      .join(queryChunks.select(col("vec_id"), col("query_id")), "vec_id")
    val perChunk = cu.as("c")
      .crossJoin(broadcast(qu.as("q")))
      .select(col("q.query_id"), col("q.vec_id").as("q_chunk"),
        col("c.doc_id"), expr("dot_f64(q.u, c.u)").as("cos"))
      .groupBy("query_id", "q_chunk", "doc_id")
      .agg(max(col("cos")).as("mx"))
    val scored = perChunk.groupBy("query_id", "doc_id")
      .agg(sum(expr("cast(mx as decimal(38,12))")).as("s"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("s").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("int").as("rank"))
  }

  /** HARD-NEGATIVE TRIPLET MINING — the contrastive-training data
    * prep for retriever/embedding training: per anchor, pair each of
    * its `posK` nearest neighbors (the positives) with neighbors from
    * the `[negFrom, negTo]` rank band (the HARD negatives — similar
    * enough to be informative, far enough to be wrong; sampling
    * uniform negatives instead is the classic way to train a retriever
    * that can't rank). One brute/ANN top-k pass feeds both roles; the
    * pairing is a per-anchor self-join of two rank slices of that one
    * ranked frame — broadcast-sized, since ranked rows are
    * O(anchors × negTo). Emits (probe_id, positive_id, negative_id,
    * neg_rank).
    */
  def mineTriplets(corpus: DataFrame, probes: DataFrame, posK: Int,
      negFrom: Int, negTo: Int,
      dim: Int = SimilarityOps.Dim): DataFrame = {
    require(posK < negFrom && negFrom <= negTo,
      s"rank bands must not overlap: posK=$posK negFrom=$negFrom " +
        s"negTo=$negTo")
    val ranked = DedupOps.pin(
      SimilarityOps.bruteForceTopK(corpus, probes, negTo, dim)
        .persist())
    ranked.filter(col("rank") <= posK)
      .select(col("probe_id"), col("neighbor_id").as("positive_id"))
      .join(ranked.filter(col("rank") >= negFrom)
          .select(col("probe_id"), col("neighbor_id").as("negative_id"),
            col("rank").as("neg_rank")),
        "probe_id")
  }

  /** The trained BM25 statistics for a query workload: corpus size,
    * average document length, and per-term document frequencies — the
    * handful of scalars a deployed scorer ships with (the "index" side
    * of BM25 for a FIXED query set is just this table; it is KBs).
    */
  final case class Bm25Stats(nDocs: Long, avgdl: Double,
      df: Map[String, Long])

  /** Train [[Bm25Stats]] on a corpus: one tokenize pass for N/avgdl,
    * one postings-restricted aggregate for the per-term dfs (only the
    * |workload terms| counts reach the driver).
    */
  def bm25Train(docs: DataFrame,
      queryTerms: Seq[(Int, Seq[String])]): Bm25Stats = {
    val spark = docs.sparkSession
    import spark.implicits._
    // one pinned tokenize pass feeds both the scalars and the dfs
    val base = DedupOps.pin(
      docs.select(col("doc_id"), expr(TextOps.TOKENS).as("t")).persist())
    val totals = base.select(size(col("t")).as("dl"))
      .agg(count(lit(1)), sum(col("dl").cast("long"))).head()
    val n = totals.getLong(0)
    val terms = queryTerms.flatMap(_._2).distinct.toDF("term")
    val dfRows = base
      .select(col("doc_id"), explode(col("t")).as("term"))
      .join(broadcast(terms), "term")
      .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Bm25Stats(n, totals.getLong(1).toDouble / n, dfRows)
  }

  /** Score documents against `stats` MAP-ONLY: per arriving document,
    * every workload query's score is a fold over its token array with
    * the trained df/N/avgdl embedded as literals (the PQ-gate pattern —
    * the model rides the expression tree, so the same projection runs
    * unchanged over a batch frame or a stream with zero state). Emits
    * (query_id, doc_id, score) for documents matching ≥ 1 query term.
    *
    * Per-term contributions are decimal-cast before the fold, so the
    * map-side sum is exactly the shuffled [[bm25]] aggregation's sum —
    * batch and stream agree bit-for-bit. The terms are cast to
    * decimal(20,18), NOT (38,18): Spark's binary decimal `+` at
    * (38,18) hits the precision cap and rounds the running sum to
    * scale 17 (the Sum aggregate doesn't), which shifted 15% of scores
    * by one ulp; at (20,18) each add just widens precision and stays
    * exact. 20 digits bounds a contribution below 100 — safe while
    * idf·(k1+1) < 100, i.e. for corpora under ~2^44 docs. The idf
    * arithmetic stays INSIDE the expression (constant-folded by
    * Catalyst) rather than being computed driver-side, so both paths
    * use the identical log2.
    */
  def bm25ScoreWith(docs: DataFrame, queryTerms: Seq[(Int, Seq[String])],
      stats: Bm25Stats, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // enforce the decimal(20,18) headroom loudly: past it the
    // non-ANSI cast yields NULL, the score folds to NULL, and the
    // score_dec > 0 filter would silently DROP the document. The
    // worst-case per-term contribution is idf_max·(k1+1) with
    // idf_max = log2(1 + (N+0.5)/0.5) (df = 0 term), and the
    // tf factor is < k1+1 · 1 by construction.
    val idfMax = math.log(1.0 + 2.0 * stats.nDocs + 1.0) / math.log(2.0)
    require(idfMax * (k1 + 1) < 100.0,
      s"bm25ScoreWith decimal(20,18) bound exceeded: nDocs=" +
        s"${stats.nDocs}, k1=$k1 give a worst-case per-term " +
        f"contribution of ${idfMax * (k1 + 1)}%.1f >= 100 — widen the " +
        "contribution decimal before scoring corpora this large")
    val perQuery = queryTerms.map { case (q, ts) =>
      val termSum = ts.map { t =>
        val df = stats.df.getOrElse(t, 0L)
        // backslashes first, then quotes — a term ending in a
        // backslash would otherwise escape the closing quote
        val esc = t.replace("\\", "\\\\").replace("'", "\\'")
        s"""cast(
           |  log2(1.0D + (${stats.nDocs}L - ${df}L + 0.5D) /
           |    (${df}L + 0.5D)) *
           |  (size(filter(t, x -> x = '$esc')) * ${k1 + 1}) /
           |  (size(filter(t, x -> x = '$esc')) +
           |   $k1 * (${1 - b} + $b * dl / ${stats.avgdl}D))
           |  as decimal(20, 18))""".stripMargin
      }.mkString(" + ")
      s"struct(${q} as query_id, ($termSum) as score_dec)"
    }.mkString(", ")
    docs.select(col("doc_id"), expr(TextOps.TOKENS).as("t"))
      .withColumn("dl", size(col("t")))
      .select(col("doc_id"),
        explode(expr(s"array($perQuery)")).as("s"))
      .filter(col("s.score_dec") > 0)
      .select(col("s.query_id").as("query_id"), col("doc_id"),
        col("s.score_dec").cast("double").as("score"))
  }
}
