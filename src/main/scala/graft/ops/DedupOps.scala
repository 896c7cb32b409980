package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines:
  * exact hashing, n-gram Jaccard, MinHash+LSH banding, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB corpus):
  *  - Every signature (md5 / minhash / simhash) is a pure column
  *    expression — whole-stage codegen, no UDFs, no shuffle: signatures
  *    stream map-side over the corpus.
  *  - Candidate pairing NEVER does an O(n^2) crossJoin. Pairs come from a
  *    postings-list shuffle: explode (doc, key) where key is a shingle or
  *    an LSH band signature, shuffle on key, pair within key groups. Work
  *    is sum over keys of |bucket|^2 — the LSH band parameters (b, r)
  *    bound bucket sizes, which is exactly why MinHash-LSH is the scale
  *    path and raw shingle-joins are only for the exact verify step over
  *    already-filtered candidates.
  *  - Hash functions are deterministic and engine-portable (md5-derived
  *    60-bit ints), so the DuckDB oracle reproduces them bit-for-bit.
  */
object DedupOps {

  /** Whitespace tokens of the lowercased, trimmed text. */
  val TOKENS = "split(lower(trim(text)), '\\\\s+')"

  /** Distinct word n-gram shingles (n=3). */
  val SHINGLES =
    s"""array_distinct(transform(
       |  sequence(0, greatest(size($TOKENS) - 3, -1)),
       |  i -> concat(element_at($TOKENS, i + 1), ' ',
       |              element_at($TOKENS, i + 2), ' ',
       |              element_at($TOKENS, i + 3))))""".stripMargin

  /** Portable 60-bit hash: md5 hex prefix → bigint. The same value is
    * computable in any engine with md5 (DuckDB: ('0x'||substr(md5(x),1,15))::bigint).
    */
  def h60(sqlExpr: String): String =
    s"cast(conv(substr(md5($sqlExpr), 1, 15), 16, 10) as bigint)"

  /** Exact dedup survivors: min doc_id per content hash. The classic
    * hash-groupBy — one shuffle on the 128-bit digest, no skew (hashes
    * are uniform).
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(expr("md5(text)").as("fp"), col("doc_id"))
      .groupBy("fp").agg(min("doc_id").as("doc_id"))

  /** (doc_id, shingles) with empty-shingle docs dropped. */
  def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(SHINGLES).as("shingles"))
      .filter(size(col("shingles")) > 0)

  /** Near-dup pairs by exact n-gram Jaccard >= threshold, via the
    * postings-list pattern: explode shingles, shuffle on shingle, count
    * common shingles per candidate pair, then Jaccard from the set sizes.
    * Only pairs sharing >= 1 shingle are ever materialized.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingled(docs)
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    val posts = sh.select(col("doc_id"),
      explode(col("shingles")).as("shingle"))
    val common = posts.as("a")
      .join(posts.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** MinHash signature array: k independent hash functions, each the min
    * over the shingle set of a seeded portable hash. Pure column
    * expression (nested higher-order functions), codegen'd per row.
    */
  def minhashExpr(k: Int): String =
    s"""transform(sequence(0, ${k - 1}), i ->
       |  array_min(transform(shingles, s ->
       |    ${h60("concat('mh', cast(i as string), ':', s)")})))""".stripMargin

  /** LSH candidate pairs verified by exact Jaccard.
    *
    * Pipeline: minhash signatures (k = bands*rows hashes) → per-band
    * signature string → explode (doc, band_idx, band_sig) → shuffle on
    * band key → pair docs sharing any band → distinct pairs → exact
    * Jaccard verify of the candidates only.
    *
    * At corpus scale the band buckets bound the pair work; the exact
    * verify runs on the (tiny) candidate set rather than all pairs.
    */
  def minhashLsh(docs: DataFrame, bands: Int, rows: Int,
      threshold: Double): DataFrame = {
    val k = bands * rows
    val sh = shingled(docs)
    val sigs = sh.withColumn("sig", expr(minhashExpr(k)))
    val banded = sigs.select(col("doc_id"),
      posexplode(expr(
        s"""transform(sequence(0, ${bands - 1}), b ->
           |  concat_ws('_', transform(sequence(0, ${rows - 1}),
           |    r -> cast(element_at(sig, b * $rows + r + 1) as string))))"""
          .stripMargin)).as(Seq("band_idx", "band_sig")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verify over candidates only
    val withSets = cand
      .join(sh.select(col("doc_id").as("doc_a"),
        col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"),
        col("shingles").as("sh_b")), "doc_b")
    withSets
      .withColumn("n_common",
        size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 60-bit SimHash over the token multiset: per bit position, tokens
    * vote +1/-1 by their hash bit; the signature sets bits with positive
    * vote. One pass, pure expression, no shuffle.
    */
  val SIMHASH =
    s"""aggregate(
       |  transform(sequence(0, 59), p ->
       |    if(aggregate($TOKENS, 0L, (acc, t) ->
       |         acc + shiftright(${h60("t")}, p) % 2 * 2 - 1) > 0,
       |       shiftleft(1L, p), 0L)),
       |  0L, (acc, v) -> acc + v)""".stripMargin

  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(SIMHASH).as("simhash"))

  /** SimHash near-dup pairs: hamming distance <= maxDist. Candidate
    * generation via 4-way band partitioning of the 60-bit signature
    * (docs within hamming 3 share at least one identical 15-bit band —
    * pigeonhole), then exact hamming verify. Same postings-shuffle shape
    * as MinHash-LSH: no O(n^2) crossJoin.
    */
  def simhashPairs(docs: DataFrame, maxDist: Int): DataFrame = {
    val sigs = simhash(docs)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        """transform(sequence(0, 3), b ->
          |  shiftright(simhash, b * 15) % 32768)""".stripMargin))
        .as(Seq("band_idx", "band_val")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
      .distinct()
      .withColumn("hamming", expr(
        "cast(bit_count(sig_a ^ sig_b) as int)"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Cosine of two float-vector columns, accumulated in double so the
    * result is engine-portable.
    */
  def cosineExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) ->
       |    cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)
       |/ (sqrt(aggregate($a, 0D, (acc, x) ->
       |     acc + cast(x as double) * cast(x as double)))
       |   * sqrt(aggregate($b, 0D, (acc, x) ->
       |     acc + cast(x as double) * cast(x as double))))""".stripMargin

  /** Embedding near-dup pairs: cosine >= threshold.
    *
    * This is the brute-force baseline (all-pairs over a broadcast of the
    * right side); the scale path is `SimilarityOps.ivfTopK`-style coarse
    * quantization or random-hyperplane LSH, which cut the candidate set
    * the same way MinHash bands do for text.
    */
  def embeddingPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"))
    e.as("a").join(broadcast(e.as("b")),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr(cosineExpr("a.embedding", "b.embedding")).as("cos"))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b")
  }
}
