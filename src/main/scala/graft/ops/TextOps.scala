package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, document fingerprinting.
  *
  * All operators are pure column expressions (no UDFs), embarrassingly
  * parallel over the documents table — no shuffle at all until a
  * downstream groupBy. Tokenization is materialized in its own
  * projection first: interpreted higher-order expressions re-evaluate
  * inline subexpressions on every reference, so referencing the split
  * inline would re-run the regex per element access (measured 18×
  * slower on the shingle path).
  */
object TextOps {

  /** Whitespace tokens of the lowercased text. */
  val TOKENS = "split(lower(trim(text)), '\\\\s+')"

  /** Code-point split of a word column `w` — the initial BPE symbol
    * table. `split(w, '')` would split on UTF-16 code units, turning
    * supplementary characters (emoji, non-BMP CJK) into unpaired
    * surrogates in the learned vocab; Java regex `.` consumes a full
    * code point, matching the char-level convention of the BPE papers
    * (and DuckDB's code-point regexes on the oracle side).
    */
  private[graft] val CHARS = "regexp_extract_all(w, '(?s).', 0)"

  /** Stopword-ratio expression over a materialized token column — the
    * ONE definition [[profile]] and [[qualityFilter]] share, so the
    * map-side gate and the profile feature bit-match.
    */
  private def stopRatioOver(tc: String): String =
    s"""size(filter($tc, x -> array_contains(
       |  array('the', 'a', 'of', 'and', 'to', 'in'), x)))
       |  / CAST(size($tc) AS DOUBLE)""".stripMargin

  private val STOP_RATIO = stopRatioOver("t")

  /** (doc_id, text, t) with the token array materialized. */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), expr(TOKENS).as("t"))

  /** The corpus rows passing the quality gate, with all input columns
    * preserved — a PURE map-side filter (tokenize → predicate → drop
    * the token column). [[CleanPipeline]] used to express this as
    * profile → filter → id-project → self-join back onto the corpus,
    * which at scale is two corpus-sized exchanges for what is
    * semantically a WHERE clause. Values bit-match profile's
    * n_tokens/stop_ratio (same expression text).
    */
  def qualityFilter(docs: DataFrame, minTokens: Int,
      minStopRatio: Double): DataFrame = {
    // reserved scratch name: withColumn("t", ...) would silently
    // clobber-and-drop a caller column named t
    val tc = "__graft_q_tokens"
    docs.withColumn(tc, expr(TOKENS))
      .filter(size(col(tc)) >= minTokens &&
        expr(stopRatioOver(tc)) >= minStopRatio)
      .drop(tc)
  }

  /** LEARNED BPE merge training (Sennrich et al. 2016) — the real
    * tokenizer-training loop, not the regex approximation
    * [[bpeishTokens]] keeps for counting: ONE corpus pass builds the
    * (word, freq) table, and every subsequent round runs on that
    * compact frame, never the corpus again — the property that makes
    * corpus-scale BPE tractable (100 TB of text is tens of millions
    * of DISTINCT words). Each round: adjacent symbol pairs explode
    * with the word's freq (map-side-combining sum — one aggregate
    * job), the driver takes the argmax pair (count desc, then
    * lexicographic pair — fully deterministic, the k-means-style O(1)
    * driver model read), and the winning merge applies as a
    * distributed left-to-right greedy fold over each word's symbol
    * list. Rounds are lineage-cut ([[graft.olap.Pins.rawCut]]) so the
    * interpreted fold chain never stacks. Returns the ordered merge
    * table (rank, left, right, pair_count).
    */
  /** The ONE greedy left-to-right merge-application fold, shared by
    * [[bpeTrain]] and [[bpeEncode]] — a semantics or escaping fix here
    * reaches both, so encoding can never disagree with training.
    */
  private def mergeFoldSql(a: String, b: String): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    s"""aggregate(s, cast(array() as array<string>),
       |  (acc, x) -> CASE
       |    WHEN size(acc) > 0
       |      AND element_at(acc, size(acc)) = '${esc(a)}'
       |      AND x = '${esc(b)}'
       |    THEN concat(slice(acc, 1, size(acc) - 1),
       |      array('${esc(a + b)}'))
       |    ELSE concat(acc, array(x)) END)""".stripMargin
  }

  /** Apply a merge sequence to a (s: array<string>, …) symbol frame
    * with a lineage cut every 8 merges: the folds are interpreted
    * higher-order expressions, and an unbounded nested chain blows up
    * Catalyst analysis long before any row is processed (the same
    * stacking discipline [[bpeTrain]]'s per-round cuts enforce).
    */
  private def applyMerges(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    var lastCut: DataFrame = null
    var df = words
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      df = df.withColumn("s", expr(mergeFoldSql(a, b)))
      if ((i + 1) % 8 == 0) {
        val cut = graft.olap.Pins.rawCut(df)
        if (lastCut != null) graft.olap.Pins.freeCut(lastCut)
        lastCut = cut
        df = cut
      }
    }
    if (lastCut != null) graft.olap.Pins.adopt(lastCut)
    df
  }

  def bpeTrain(docs: DataFrame, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = graft.olap.Pins.rawCut(
      docs.select(explode(expr(TOKENS)).as("w"))
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .select(expr(CHARS).as("s"), col("freq")))
    var lastCut = words
    var sinceCut = 0
    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      // fully-merged (single-symbol) words have no pairs — and
      // sequence(0, -1) would generate a DESCENDING index pair that
      // ANSI array subscripting throws on
      val top = words.filter(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(s) - 2), " +
            "i -> struct(s[i] AS a, s[i + 1] AS b))")).as("p"))
        .groupBy("p").agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("p.a").asc, col("p.b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val p = row.getStruct(row.fieldIndex("p"))
        val (a, b) = (p.getString(0), p.getString(1))
        merges += ((r, a, b, row.getAs[Long]("n")))
        // lineage cut every third fold, not every fold (opt r19): a
        // rawCut is a localCheckpoint — one materialization job per
        // round — while the fold itself is a cheap map transform over
        // the distinct-word table, so re-evaluating up to two pending
        // folds inside the next round's pair count is cheaper than
        // checkpointing each one. Depth stays bounded (≤3 nested
        // transforms) so planning/codegen never sees the full chain.
        val folded = words
          .select(expr(mergeFoldSql(a, b)).as("s"), col("freq"))
        sinceCut += 1
        if (sinceCut >= 3) {
          val next = graft.olap.Pins.rawCut(folded)
          graft.olap.Pins.freeCut(lastCut)
          lastCut = next
          sinceCut = 0
          words = next
        } else words = folded
        r += 1
      }
    }
    graft.olap.Pins.freeCut(lastCut)
    merges.result()
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Apply a learned merge table ([[bpeTrain]]'s output): segment
    * every corpus word with the merges IN RANK ORDER and emit per-doc
    * learned-vocab token counts — the numbers a budget packer or
    * context-window planner actually needs once a real tokenizer
    * exists. Same compactness trick as training: the merge folds run
    * over the DISTINCT word table only, and the corpus joins
    * word → n_subtokens afterwards (shuffle_hash on the Zipf-skewed
    * word key); the document text never re-tokenizes per merge.
    * Emits (doc_id, n_words, n_bpe_tokens).
    */
  def bpeEncode(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val segmented = applyMerges(
      docs.select(explode(expr(TOKENS)).as("w")).distinct()
        .withColumn("s", expr(CHARS)), merges)
    val pieces = segmented.select(col("w"),
      size(col("s")).as("n_sub"))
    docs.select(col("doc_id"), explode(expr(TOKENS)).as("w"))
      .join(pieces.hint("shuffle_hash"), "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_bpe_tokens"))
  }

  /** Token count per document (whitespace tokenization). */
  def tokenCounts(docs: DataFrame): DataFrame =
    tokenized(docs).select(col("doc_id"), size(col("t")).as("n_tokens"))

  /** Quality-scoring features: length, token stats, punctuation /
    * stopword / digit ratios. The usual pre-training heuristics
    * (length + punctuation + stopword density).
    */
  def quality(docs: DataFrame): DataFrame = {
    val stop = "array('the', 'a', 'of', 'and', 'to', 'in')"
    tokenized(docs).select(
      col("doc_id"),
      expr("length(text)").as("len_chars"),
      size(col("t")).as("n_tokens"),
      expr("length(replace(text, ' ', '')) / CAST(size(t) AS DOUBLE)")
        .as("avg_token_len"),
      expr("length(text) - length(regexp_replace(text, '[.,;:!?]', ''))")
        .as("n_punct"),
      expr(s"""size(filter(t, x -> array_contains($stop, x)))
               / CAST(size(t) AS DOUBLE)""").as("stop_ratio"))
  }

  /** Language ID via stopword-hit heuristic (n-gram/stopword counting —
    * the classic fasttext-free fallback). Deterministic tie-break order:
    * en, de, es, fr, else 'unknown'.
    */
  def langId(docs: DataFrame): DataFrame = {
    def hits(words: String) =
      s"size(filter(t, x -> array_contains(array($words), x)))"
    val en = hits("'the', 'a', 'of', 'and', 'to', 'in'")
    val de = hits("'der', 'die', 'das', 'und', 'ist'")
    val es = hits("'el', 'la', 'de', 'y', 'es'")
    val fr = hits("'le', 'la', 'de', 'et', 'est'")
    tokenized(docs).select(col("doc_id"),
      expr(en).as("en_hits"), expr(de).as("de_hits"),
      expr(es).as("es_hits"), expr(fr).as("fr_hits"))
      .withColumn("pred_lang",
        expr("""CASE
                  WHEN en_hits >= de_hits AND en_hits >= es_hits
                    AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
                  WHEN de_hits >= es_hits AND de_hits >= fr_hits
                    AND de_hits > 0 THEN 'de'
                  WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
                  WHEN fr_hits > 0 THEN 'fr'
                  ELSE 'unknown'
                END"""))
  }

  /** One-pass text profile: token count, stopword ratio, and language
    * in a single tokenized projection — the fused pass
    * [[CleanPipeline]] consumes so a cleaning run tokenizes the corpus
    * ONCE per stage instead of once per feature (three regex passes
    * over 100 TB → one). Column expressions are textually identical to
    * [[quality]]/[[langId]]/[[tokenCounts]], so values bit-match the
    * individual operators (and their oracles).
    */
  def profile(docs: DataFrame): DataFrame = {
    def hits(words: String) =
      s"size(filter(t, x -> array_contains(array($words), x)))"
    tokenized(docs).select(col("doc_id"),
      size(col("t")).as("n_tokens"),
      expr(STOP_RATIO).as("stop_ratio"),
      expr(hits("'the', 'a', 'of', 'and', 'to', 'in'")).as("en_hits"),
      expr(hits("'der', 'die', 'das', 'und', 'ist'")).as("de_hits"),
      expr(hits("'el', 'la', 'de', 'y', 'es'")).as("es_hits"),
      expr(hits("'le', 'la', 'de', 'et', 'est'")).as("fr_hits"))
      .withColumn("pred_lang",
        expr("""CASE
                  WHEN en_hits >= de_hits AND en_hits >= es_hits
                    AND en_hits >= fr_hits AND en_hits > 0 THEN 'en'
                  WHEN de_hits >= es_hits AND de_hits >= fr_hits
                    AND de_hits > 0 THEN 'de'
                  WHEN es_hits >= fr_hits AND es_hits > 0 THEN 'es'
                  WHEN fr_hits > 0 THEN 'fr'
                  ELSE 'unknown'
                END"""))
      .select("doc_id", "n_tokens", "stop_ratio", "pred_lang")
  }

  /** Document fingerprint: md5 of the whitespace-normalized lowercased
    * text — the cheap exact-after-normalization dedup key.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr("md5(lower(regexp_replace(text, '\\\\s+', ' ')))").as("fp"))

  /** BPE-ish sub-word token counting: a GPT-2-style pre-tokenizer regex
    * (word pieces, digit runs, punctuation runs, leading-space bound),
    * the standard cheap proxy for "how many tokens will the tokenizer
    * emit" when budgeting a corpus — still a pure codegen'd expression.
    */
  val BPE_RE = "( ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\\\s]+|\\\\s+)"

  def bpeTokenCounts(docs: DataFrame): DataFrame =
    tokenized(docs).select(col("doc_id"),
      expr(s"size(regexp_extract_all(text, '$BPE_RE', 0))")
        .as("n_bpe_tokens"),
      size(col("t")).as("n_ws_tokens"))

  /** Repetition quality signals (the Gopher/C4 boilerplate detectors):
    * duplicate-token fraction (1 − distinct/total) and the fraction of
    * tokens covered by the most frequent word 2-gram. The dup fraction
    * is a pure projection; the top-bigram count goes through an
    * explode + two map-side-combinable groupBys on (doc_id, bigram) —
    * the shuffle rows are per-DISTINCT-bigram counts, and both
    * aggregations partition by doc_id, so the shape holds at corpus
    * scale (a boilerplate-heavy doc produces FEWER distinct bigrams,
    * not more shuffle).
    */
  def repetition(docs: DataFrame): DataFrame =
    // ONE tokenization pass: the per-doc scalars ride the explode into
    // the bigram aggregation (explode_outer keeps bigram-less docs), so
    // there is no second scan and no join — first() is exact because
    // the scalars are constant within a doc_id group
    tokenized(docs).select(col("doc_id"),
        size(col("t")).as("n_tokens"),
        (lit(1.0) - size(array_distinct(col("t"))).cast("double") /
          size(col("t"))).as("dup_token_frac"),
        col("t"))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        explode_outer(expr(
          """CASE WHEN n_tokens >= 2 THEN
            |  transform(sequence(1, n_tokens - 1),
            |    i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
            |END""".stripMargin)).as("bg"))
      .groupBy("doc_id", "bg")
      .agg(count(lit(1)).as("c"),
        first(col("n_tokens")).as("n_tokens"),
        first(col("dup_token_frac")).as("dup_token_frac"))
      .groupBy("doc_id")
      .agg(max(when(col("bg").isNotNull, col("c"))).as("tc"),
        first(col("n_tokens")).as("n_tokens"),
        first(col("dup_token_frac")).as("dup_token_frac"))
      .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        (coalesce(col("tc"), lit(0L)) * 2 /
          col("n_tokens")).as("top_bigram_frac"))

  /** fasttext-style hashed linear quality classifier: each token hashes
    * into one of `buckets` feature slots, each slot carries a fixed
    * weight in [-1, 1], and the document score is the sum of its
    * tokens' weights — exactly the inference shape of a trained
    * bag-of-words linear model (the standard pre-training quality
    * gate), with the weight table derived from the portable md5 hash
    * instead of a training run (no model files ship with the engine;
    * a real deployment swaps in trained weights as a literal array).
    *
    * Map-only: the score is a per-document fold over the token array —
    * no shuffle, pushes nothing, scales like any projection. The fold
    * runs in index order from 0, so the double is bit-identical to the
    * DuckDB oracle's list_sum.
    */
  def qualityClassifier(docs: DataFrame,
      buckets: Int = 4096): DataFrame = {
    import DedupOps.h60
    val slot = s"${h60("tok")} % $buckets"
    val w = s"(${h60(s"concat('w', cast($slot as string))")} % 2001" +
      " - 1000) / 1000.0D"
    tokenized(docs).select(col("doc_id"),
        expr(s"aggregate(t, 0D, (acc, tok) -> acc + $w)").as("score"))
      .withColumn("keep", col("score") > 0)
  }

  /** Corpus vocabulary induction: the `topK` most frequent tokens with
    * their counts — the seed statistic for tokenizer training and OOV
    * analysis. One map-side-combinable groupBy on the token (shuffle
    * carries per-distinct-token partials, not the corpus), then a
    * TakeOrdered top-k — no single-partition window at any vocabulary
    * size. Ties break lexicographically so the cut is deterministic.
    */
  def vocabTopK(docs: DataFrame, topK: Int): DataFrame =
    tokenized(docs).select(explode(col("t")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topK)

  /** Overlapping fixed-size token chunks — the RAG/embedding-pipeline
    * segmentation primitive: (doc_id, chunk_idx, chunk_text) windows
    * of `chunkTokens` tokens advancing by `chunkTokens - overlap`.
    * Map-only (one tokenize + one bounded explode per doc); every doc
    * yields at least one chunk (short docs emit themselves). The chunk
    * count is ceil((len - overlap) / stride) — computed identically in
    * the oracle, and the final short chunk is the clamped tail slice
    * in both engines.
    */
  def chunkText(docs: DataFrame, chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap $overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    tokenized(docs).select(col("doc_id"), posexplode(expr(
      s"""transform(
         |  sequence(0, greatest(0,
         |    cast(ceil((size(t) - $overlap) / ${stride}.0D) as int) - 1)),
         |  i -> concat_ws(' ', slice(t, i * $stride + 1, $chunkTokens)))"""
        .stripMargin)).as(Seq("chunk_idx", "chunk_text")))
  }

  /** Per-document top terms ranked by (term frequency DESC, corpus
    * document frequency ASC, token ASC). NOTE: this is frequency-first
    * with rarity as the tie-break — NOT the tf·idf product, where a
    * rare term can outrank a more frequent common one (a float
    * tf·ln(N/df) score is also not engine-portable: ln() can differ in
    * the last ulp and flip near-ties at the top-k cut; rank keys here
    * stay integer-exact). Callers wanting true tf-idf should compute
    * the float score from the returned (tf, df) columns and accept
    * engine-specific tie behavior. Two map-side-combining aggregations
    * (doc×token, then token df); the per-doc top-k runs under
    * WindowGroupLimit, so map tasks keep k rows per doc before the
    * exchange.
    */
  def keywords(docs: DataFrame, topK: Int = 3): DataFrame = {
    val tf = tokenized(docs)
      .select(col("doc_id"), explode(col("t")).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id")
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    // shuffle_hash: the df table is the corpus vocabulary — unbounded
    // (tens of millions of types at corpus scale), so it partitions on
    // the token key rather than trusting local stats to broadcast it
    tf.join(df.hint("shuffle_hash"), "token")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("doc_id", "rank", "token", "tf", "df")
  }

  /** Per-document character-level Shannon entropy (bits/char) — the
    * cheap perplexity proxy quality filters use to catch binary
    * spillage, repeated-character padding, and base64-ish blobs
    * (natural text sits ~4 bits/char; degenerate content collapses
    * toward 0 or saturates near log2(alphabet)). Lowered as explode →
    * per-(doc, char) counts → one combining per-doc fold; the log2
    * arithmetic is plain double math, equal to the oracle within the
    * 12-significant-digit float normalization the compare applies.
    */
  def charEntropy(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), length(col("text")).as("n"),
        explode(expr("split(text, '')")).as("c"))
      .groupBy("doc_id", "c")
      .agg(count(lit(1)).as("cnt"), min(col("n")).as("n"))
      .groupBy("doc_id")
      // per-term decimal cast makes the sum order-independent at any
      // parallelism (a raw double sum reorders partials per run)
      .agg(sum(expr(
        """cast(-(cnt / cast(n as double)) * log2(cnt / cast(n as double))
          |  as decimal(38, 18))""".stripMargin))
        .cast("double").as("entropy_bits"))

  /** CCNet-style unigram LM quality score: train token probabilities
    * on the corpus itself (add-one smoothing over the observed vocab)
    * and score each document by its per-token cross-entropy in bits —
    * fluent/typical text scores low, rare-token soup and boilerplate
    * mixes score high. The production form trains on a trusted corpus
    * (CCNet: Wikipedia KenLM) and filters the crawl by score; the
    * self-trained form here is the same dataflow with the train corpus
    * = the score corpus.
    *
    * Scale design: the vocab is a token-keyed count aggregate (never
    * collected — only its two scalar totals reach the driver); scoring
    * joins tokens to counts, where the Zipf head would put one hot
    * token's postings on one reducer, so the top-`hotK` tokens by
    * count join MAP-SIDE from a broadcast and only the long tail
    * takes the shuffle join. Per-term decimal(38,18) casts make the
    * per-doc sum order-independent at any parallelism; log2 is plain
    * double math, equal to the oracle within the 12-significant-digit
    * float normalization the compare applies.
    */
  def lmScore(docs: DataFrame, hotK: Int = 1000): DataFrame = {
    val toks = DedupOps.pin(docs
      .select(col("doc_id"), explode(expr(TOKENS)).as("tok"))
      .persist())
    val (vocab, denom) = lmModel(toks)
    lmScoreTokens(toks, vocab, denom, hotK)
  }

  /** The unigram LM "model" of [[lmScore]]: the token-count frame plus
    * the add-one-smoothing denominator (total tokens + |vocab| — the
    * only two scalars that reach the driver). `toks` is an exploded
    * (…, tok) frame of the training corpus.
    */
  def lmModel(toks: DataFrame): (DataFrame, Long) = {
    val vocab = DedupOps.pin(
      toks.groupBy("tok").agg(count(lit(1)).as("cnt")).persist())
    val totals = vocab.agg(sum(col("cnt")), count(lit(1))).head()
    (vocab, totals.getLong(0) + totals.getLong(1))
  }

  /** Score an exploded (doc_id, tok) frame against a trained vocab —
    * shared by the batch [[lmScore]] and the streaming gate (where
    * `toks` is a streaming frame and the vocab/hot joins are
    * stream-static). See [[lmScore]] for the hot/cold and decimal-sum
    * design.
    */
  def lmScoreTokens(toks: DataFrame, vocab: DataFrame, denom: Long,
      hotK: Int = 1000): DataFrame = {
    // hot head via TakeOrdered (orderBy+limit): broadcast-sized by
    // construction, ties broken on the token for determinism
    val hot = broadcast(
      vocab.orderBy(col("cnt").desc, col("tok").asc).limit(hotK))
    val scoredHot = toks.join(hot, "tok")
    // the cold tail joins LEFT so out-of-vocabulary tokens score as
    // cnt = 0 (add-one smoothing already defines p(unseen) = 1/denom);
    // an inner join would silently drop unseen tokens — biasing
    // exactly the rare-token documents an LM gate exists to catch LOW,
    // and emitting NO row at all for an all-OOV document
    val scoredCold = toks.join(hot.select("tok"), Seq("tok"), "left_anti")
      .join(vocab.hint("shuffle_hash"), Seq("tok"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    scoredHot.union(scoredCold)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(expr(
          s"""cast(-log2(cast(cnt + 1 as double) / ${denom}L)
             |  as decimal(38, 18))""".stripMargin)).as("s"))
      .select(col("doc_id"),
        expr("cast(s as double) / n").as("lm_bits"))
  }

  /** Bigram LM quality score — the second-order upgrade of [[lmScore]]:
    * train add-one-smoothed bigram probabilities on the corpus and
    * score each document (≥ 2 tokens) by its mean per-bigram
    * cross-entropy in bits, p(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V)
    * with V = the distinct successor vocabulary. A bigram model
    * separates "rare words" from "rare word ORDER", catching shuffled /
    * templated boilerplate a unigram score can't.
    *
    * Scale shape mirrors [[lmScore]]: bigram counts are one
    * map-side-combining aggregate over the exploded pairs (shuffle
    * carries distinct-bigram partials); the first-token totals attach
    * to the model frame with a vocab-keyed join (model-sized, never
    * corpus-sized); scoring joins doc bigrams to the model with the
    * Zipf head broadcast and only the long tail on the shuffle join.
    * Per-term decimal casts keep the per-doc sum order-independent.
    */
  /** (doc_id, w1, w2) adjacent-token pairs — the shared bigram
    * lowering under [[lmScoreBigram]] and [[collocations]] (one
    * tokenize pass, map-only explode).
    */
  def bigramFrame(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), expr(TOKENS).as("t"))
    .filter(size(col("t")) >= 2)
    .select(col("doc_id"), explode(expr(
      """transform(sequence(1, size(t) - 1),
        |  i -> struct(element_at(t, i) as w1,
        |              element_at(t, i + 1) as w2))""".stripMargin))
      .as("b"))
    .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  def lmScoreBigram(docs: DataFrame, hotK: Int = 1000): DataFrame = {
    val bg = DedupOps.pin(bigramFrame(docs).persist())
    // model frame: per-bigram count + its first-token total. Opt r19
    // (guide §2.4 "two operations keyed the same way share one
    // exchange"): the total is a window sum over the counts frame
    // partitioned by w1 — one exchange of the model-sized frame —
    // instead of the former groupBy(w1) + shuffle_hash join back,
    // which exchanged counts twice and built a per-partition hash
    // table. Identical integer totals; partitions are per-w1 successor
    // sets, model-sized by construction.
    // Opt r20 (VERDICT r19 item 7): the persist moved from the raw
    // counts to the model AFTER the window, so the w1 exchange + window
    // run ONCE — previously each of the model's three consumers (vocab
    // distinct, hot head, cold join) re-ran the window from the cached
    // counts.
    val model = DedupOps.pin(
      bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .withColumn("c1",
          sum(col("c12")).over(org.apache.spark.sql.expressions.Window
            .partitionBy("w1")))
        .persist())
    val vocabOut = model.select("w2").distinct().count()
    val hot = broadcast(model
      .orderBy(col("c12").desc, col("w1").asc, col("w2").asc).limit(hotK))
    val scoredHot = bg.join(hot, Seq("w1", "w2"))
    val scoredCold = bg
      .join(hot.select("w1", "w2"), Seq("w1", "w2"), "left_anti")
      .join(model.hint("shuffle_hash"), Seq("w1", "w2"), "left")
      .select(col("doc_id"),
        coalesce(col("c12"), lit(0L)).as("c12"),
        coalesce(col("c1"), lit(0L)).as("c1"))
    scoredHot.select("doc_id", "c12", "c1").union(scoredCold)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        sum(expr(
          s"""cast(-log2(cast(c12 + 1 as double) / (c1 + ${vocabOut}L))
             |  as decimal(38, 18))""".stripMargin)).as("s"))
      .select(col("doc_id"), expr("cast(s as double) / n").as("lm2_bits"))
  }

  /** Collocation mining: the `topK` adjacent word pairs by pointwise
    * mutual information, PMI = log2(p(w1,w2) / (p(w1)·p(w2))), with a
    * `minCount` support floor (rare pairs have unboundedly noisy PMI —
    * the standard Church–Hanks guard). Multiword-expression discovery
    * for tokenizer vocab seeding and boilerplate fingerprinting.
    *
    * ONE map-side-combining count aggregate over (token, next-token)
    * pairs — bigram counts and unigram marginals both fold out of it
    * (r19; the old shape tokenized the corpus twice). The w1 marginal
    * attaches as a window sum over the pair frame (r20, §2.4 — one
    * exchange instead of a groupBy + join back); the w2 marginal keeps
    * its vocab-keyed `shuffle_hash` join (model-sized — the corpus
    * never re-shuffles). A TakeOrdered top-k on the 9-dp-rounded PMI
    * closes (float rank keys can flip near-ties in the last ulp across
    * engines; counts and the support floor are integer-exact).
    */
  def collocations(docs: DataFrame, minCount: Long = 5,
      topK: Int = 50): DataFrame = {
    // ONE corpus tokenize pass (opt r19, guide §1.2 step 1): every
    // token position emits (w1 = t[i], w2 = next token or NULL at the
    // doc end), so the bigram table (w2 non-null rows) AND the unigram
    // counts (each occurrence appears exactly once as w1, so
    // c(tok) = Σ c12 over (tok, *)) both derive from one explode + one
    // aggregation. The former shape tokenized and exploded the corpus
    // twice — once per count table. Counts are integer-identical:
    // single-token (and empty-split) docs contribute only their
    // (token, NULL) unigram row, exactly the docs bigramFrame's
    // size >= 2 filter excluded from pairs.
    val bgc = DedupOps.pin(docs.select(expr(TOKENS).as("t"))
      .select(explode(expr(
        """transform(sequence(1, size(t)),
          |  i -> struct(element_at(t, i) as w1,
          |              if(i < size(t), element_at(t, i + 1),
          |                 cast(null as string)) as w2))""".stripMargin))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .persist())
    // Opt r20 (VERDICT r19 item 5, guide §2.4): the w1 marginal rides a
    // window sum over the pair frame — c(w1) = Σ c12 over (w1, *)
    // including the (w1, NULL) doc-end row, exactly the former
    // groupBy(w1) table — so the w1-keyed shuffle_hash join (two
    // exchanges + a per-partition hash build) collapses into ONE
    // exchange of the model-sized counts frame. The w2 marginal keys on
    // a different column and keeps its model-sized join. Both corpus
    // totals fold into ONE driver job (previously two): nTok counts
    // every token occurrence (all rows), nBg only true pairs
    // (w2-non-null rows).
    val totals = bgc.agg(
      sum(col("c12")).as("nTok"),
      sum(when(col("w2").isNotNull, col("c12"))).as("nBg")).head()
    val (nTok, nBg) = (totals.getLong(0), totals.getLong(1))
    val withC1 = bgc.withColumn("c1",
      sum(col("c12")).over(org.apache.spark.sql.expressions.Window
        .partitionBy("w1")))
    val uni = bgc.groupBy("w1").agg(sum(col("c12")).as("c"))
    withC1.filter(col("w2").isNotNull && col("c12") >= minCount)
      .join(uni.withColumnRenamed("w1", "w2")
        .withColumnRenamed("c", "c2").hint("shuffle_hash"), "w2")
      .withColumn("pmi", expr(
        s"log2((c12 / ${nBg}D) / ((c1 / ${nTok}D) * (c2 / ${nTok}D)))"))
      .orderBy(round(col("pmi"), 9).desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select("w1", "w2", "c12", "pmi")
  }

  /** Per-source corpus statistics — the curation dashboard numbers
    * (doc counts, token budget, length distribution) a mixture design
    * starts from. One tokenized projection, one map-side-combining
    * groupBy on the (few-valued) source key; both quantiles ride a
    * single fused exact `percentile(n_tokens, array(...))` aggregate.
    * At petabyte scale the exact percentile's per-group value map is
    * the cost center — swap in `approx_percentile` (t-digest, mergeable
    * constant-size sketch) when tail precision can tolerate it.
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(col("source"), expr(TOKENS).as("t"),
        length(col("text")).as("len"))
      .select(col("source"), size(col("t")).as("n_tokens"), col("len"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        avg(col("len")).as("avg_chars"),
        expr("percentile(n_tokens, array(0.5D, 0.9D))").as("__p"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("avg_chars"),
        element_at(col("__p"), 1).as("p50_tokens"),
        element_at(col("__p"), 2).as("p90_tokens"))

  /** PII scrubbing patterns — ASCII-only so Java regex (Spark) and RE2
    * (the DuckDB oracle) match identically; `\b` is an ASCII word
    * boundary in both.
    */
  val EMAIL_RE = "[A-Za-z0-9+._%-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IP_RE =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** Redact emails / IPv4 addresses / phone-shaped digit runs in
    * `column` into `out` — the standard pre-release scrub pass. Three
    * chained codegen'd regexp_replace calls (global by default), one
    * projection, no shuffle; email first so its dotted host is consumed
    * before the IP pattern sees it.
    */
  def redactPii(df: DataFrame, column: String, out: String): DataFrame =
    df.withColumn(out,
      regexp_replace(
        regexp_replace(
          regexp_replace(col(column), lit(EMAIL_RE), lit("<EMAIL>")),
          lit(IP_RE), lit("<IP>")),
        lit(PHONE_RE), lit("<PHONE>")))
}
