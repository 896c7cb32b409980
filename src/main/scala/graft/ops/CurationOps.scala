package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.olap.Ords

/** Corpus-curation operators for training-data pipelines: per-source
  * document caps (the CommonCrawl-style per-domain cap) and
  * token-budget shard packing.
  *
  * Both are deliberately window-shaped: the cap is a bounded top-N per
  * key, the packing a global prefix sum — the two curation primitives a
  * 100 TB pipeline runs after cleaning and before tokenization.
  */
object CurationOps {

  /** Keep at most `maxDocs` documents per source, preferring longer
    * documents (`n_chars` DESC, `doc_id` ASC tie-break — fully
    * deterministic).
    *
    * Scale: the rank predicate is recognized by Spark 3.5+ as a
    * WindowGroupLimit, so each map task keeps only `maxDocs` rows per
    * source BEFORE the exchange — the shuffle carries
    * O(sources × maxDocs) rows, not the corpus. A pathologically hot
    * source therefore costs its map-side winners, not its row count.
    */
  def capPerSource(docs: DataFrame, maxDocs: Int): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxDocs)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  /** Write the packed corpus as one parquet directory per shard
    * (`shard=N/` hive layout): the standard training-data delivery
    * shape — a trainer reads shard directories independently, and
    * partition pruning serves "give me shard 17" without touching the
    * rest. `packed` is the [[packShards]] output joined back to the
    * payload columns.
    *
    * Rows are range-clustered by (shard, doc_id) before the write:
    * without it every task holds rows of nearly every shard and
    * partitionBy opens one file per (task × shard) — millions of tiny
    * files at corpus scale. Clustered, each task holds one shard run
    * (large shards split across a few tasks by doc_id), so file count
    * ≈ max(tasks, shards).
    */
  def writeShards(packed: DataFrame, path: String): Unit =
    packed.repartitionByRange(col("shard"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Sequence packing: lay the corpus token stream (documents in
    * `doc_id` order) into fixed-length training sequences of `seqLen`
    * tokens, documents spanning boundaries contributing one segment per
    * overlapped sequence — the layout step between shard packing and
    * the tokenizer. Output per segment: (doc_id, seq_id, tok_start,
    * tok_end), offsets WITHIN the document (start inclusive, end
    * exclusive), so a trainer slices each doc's tokens without global
    * coordination.
    *
    * Everything after the [[Ords.runningSum]] prefix is a map-side
    * projection + explode over per-doc segment counts (a doc emits
    * ⌈n/seqLen⌉+1 rows at most), so the shape scales with the corpus,
    * not the sequence count.
    */
  def packSequences(docs: DataFrame, seqLen: Int,
      hint: Ords.SizeHint = Ords.Auto): DataFrame = {
    val cum = Ords.runningSum(TextOps.tokenCounts(docs),
        Seq(col("doc_id").asc), col("n_tokens"), "cum_tokens", hint)
      .withColumn("gstart", col("cum_tokens") - col("n_tokens"))
    cum.filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("gstart"),
        explode(expr(
          s"sequence(gstart div $seqLen, (cum_tokens - 1) div $seqLen)"))
          .as("seq_id"))
      .select(col("doc_id"), col("seq_id"),
        greatest(col("seq_id") * seqLen - col("gstart"), lit(0L))
          .as("tok_start"),
        least((col("seq_id") + 1) * seqLen - col("gstart"),
          col("n_tokens").cast("long")).as("tok_end"))
  }

  /** Deterministic source-weighted subsampling — training mixture
    * weights: keep a document when its md5-derived uniform in [0, 1)
    * falls below its source's rate; sources absent from `rates` keep
    * everything. Pure map-side filter (pushes to the scan), seedless
    * and engine-portable (the same md5 arithmetic reproduces in any
    * engine), and stable under corpus growth: a document's keep/drop
    * never changes as other documents arrive.
    */
  /** The seedless per-document uniform in [0, 1): md5 of a purpose
    * prefix + doc_id. ONE definition shared by every sampling op (and
    * mirrored in their oracles) — the coin's modulus/prefix scheme is
    * a cross-engine determinism contract, not a per-op detail.
    */
  private def md5Coin(prefix: String) =
    expr(DedupOps.h60(s"concat('$prefix', cast(doc_id as string))"))
      .mod(lit(1000000L)).cast("double") / lit(1e6)

  def mixtureSample(docs: DataFrame,
      rates: Map[String, Double]): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(1.0)) { case (acc, (src, r)) =>
        when(col("source") === src, lit(r)).otherwise(acc) }
    docs.filter(md5Coin("mix") < rate)
  }

  /** Temperature-scaled source sampling — the multilingual-training
    * alpha-mixing rule (p_s ∝ n_s^alpha): flatten the source
    * distribution toward uniform as `alpha` falls below 1, so head
    * domains stop drowning the tail. Each source keeps
    * rate_s = min(1, targetFrac · N · p_s / n_s) of its documents via
    * the shared seedless [[md5Coin]], so the realized mixture follows
    * the tempered distribution while every keep/drop stays
    * deterministic and stable under corpus growth.
    *
    * The rate table is computed ENTIRELY in-engine (per-source counts +
    * two windowed sums over the counts frame — sources are domains, a
    * bounded set, so the single-partition window holds rows numbering
    * in the thousands at worst); the tempered weights are decimal-cast
    * before summing so the normalizer is order-independent. Docs then
    * broadcast-join their source's rate: one shuffle on nothing — the
    * filter is map-side.
    */
  def temperatureSample(docs: DataFrame, alpha: Double,
      targetFrac: Double): DataFrame = {
    // alpha > 1 (anti-tempering) can push n_s^alpha past the
    // decimal(38,18) integral capacity on a large source, where the
    // non-ANSI cast yields NULL and silently drops the whole source
    require(alpha >= 0 && alpha <= 1,
      s"alpha $alpha outside the tempering regime [0, 1]")
    require(targetFrac >= 0 && targetFrac <= 1,
      s"targetFrac $targetFrac outside [0, 1]")
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      .withColumn("pw",
        pow(col("n_s").cast("double"), lit(alpha))
          .cast("decimal(38,18)"))
      .withColumn("p_s", col("pw").cast("double") /
        sum(col("pw")).over(all).cast("double"))
      .withColumn("rate", least(lit(1.0),
        lit(targetFrac) * sum(col("n_s")).over(all).cast("double") *
          col("p_s") / col("n_s")))
      .select("source", "rate")
    docs.join(broadcast(rates), "source")
      .filter(md5Coin("temp") < col("rate"))
      .select("doc_id", "source")
  }

  /** Assign documents (in `doc_id` order) to contiguous training
    * shards of ≈`budget` whitespace tokens each: shard = the exclusive
    * token prefix divided by the budget, so a document straddling a
    * boundary lands in the shard its first token falls in.
    *
    * The global prefix sum goes through [[Ords.runningSum]] — the
    * scale-guarded two-phase form — over the narrow (doc_id, n_tokens)
    * frame, never the document text.
    */
  def packShards(docs: DataFrame, budget: Long,
      hint: Ords.SizeHint = Ords.Auto): DataFrame =
    packShardsFromCounts(TextOps.tokenCounts(docs), budget, hint)

  /** Quality-weighted importance sampling: keep each document with
    * probability proportional to its classifier score — the standard
    * soft alternative to a hard quality cutoff (low-quality docs are
    * downweighted, not eliminated, preserving distributional
    * coverage). The keep probability is a clamped LINEAR ramp of the
    * score rather than a sigmoid: piecewise-linear arithmetic is
    * bit-identical across engines, where exp() can differ in the last
    * ulp and flip a boundary row. The coin is the same seedless
    * md5-uniform as [[mixtureSample]], so a doc's fate is stable under
    * corpus growth and re-runs never resample history.
    *
    * Map-only end to end: score fold, ramp, hash compare — one
    * projection + filter, no shuffle, pushes to the scan.
    */
  def qualitySample(docs: DataFrame, buckets: Int = 4096,
      floor: Double = 0.05, ceil: Double = 0.95): DataFrame =
    TextOps.qualityClassifier(docs, buckets)
      .withColumn("w",
        least(lit(ceil), greatest(lit(floor),
          lit(0.5) + col("score") / 4)))
      .filter(md5Coin("qs") < col("w"))
      .select("doc_id", "score")

  /** Calibrated hard quality gate: keep exactly the top
    * ⌈targetFrac · N⌉ documents by classifier score (ties broken by
    * doc_id) — the budgeted alternative to a fixed score cutoff, and
    * the rank-based alternative to a PERCENTILE threshold: an
    * interpolated quantile is float arithmetic two engines can disagree
    * on at the last ulp exactly where it matters (the comparison
    * boundary), while a rank cut is integer-exact everywhere.
    *
    * The global rank runs through [[graft.olap.Ords.rowNumber]] — the
    * scale-guarded range-partitioned numbering — over the narrow
    * (doc_id, score) frame, so a corpus-sized calibration never
    * funnels through one partition; N is the only driver scalar.
    */
  def qualityGateTopFraction(docs: DataFrame, targetFrac: Double,
      buckets: Int = 4096,
      hint: Ords.SizeHint = Ords.Auto): DataFrame = {
    // pinned: the driver-side count() and the ranking job would each
    // re-run the full tokenize+hash classifier pass otherwise
    val scored = DedupOps.pin(TextOps.qualityClassifier(docs, buckets)
      .select("doc_id", "score").persist())
    val k = math.ceil(targetFrac * scored.count()).toLong
    // rank on the 9-dp-rounded score (raw score still returned): two
    // engines computing a mathematically equal score can differ in the
    // last ulp, and the rank cut is exactly where that flips a row
    Ords.rowNumber(scored,
        Seq(round(col("score"), 9).desc, col("doc_id").asc), "rk", hint)
      .filter(col("rk") <= k)
      .select("doc_id", "score")
  }

  /** Deterministic seeded GLOBAL shuffle for training order: `pos` =
    * rank of md5(seed ++ doc_id) — the same permutation on any cluster
    * at any parallelism, with no RNG state to checkpoint; a new seed
    * gives an independent epoch order. The rank comes from the
    * range-partitioned distributed numbering ([[Ords.rowNumber]],
    * hint Large by default), so a 100 TB corpus never funnels through
    * a single-partition window.
    */
  def shuffleOrder(docs: DataFrame, seed: String,
      hint: Ords.SizeHint = Ords.Large): DataFrame =
    Ords.rowNumber(
      docs.select(col("doc_id"),
        expr(DedupOps.h60(s"concat('$seed', cast(doc_id as string))"))
          .as("__h")),
      Seq(col("__h").asc, col("doc_id").asc), "pos", hint)
      .select(col("doc_id"), col("pos"))

  /** Compact a fragmented parquet dataset into ≈`targetBytes` files —
    * the small-files housekeeping every long-running ingest needs
    * (streaming sinks and per-batch appends accumulate KB-scale files;
    * a 100 TB table fragmented into millions of them spends more time
    * in listing/open than in IO). The target file count derives from
    * the ACTUAL on-disk byte size (filesystem listing, not plan
    * stats), rows are round-robin repartitioned for even output sizes,
    * and the rewrite lands in `outPath` — compaction must never
    * rewrite in place (a failed job would have destroyed the input).
    * Returns the output file count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes $targetBytes must be positive")
    val conf = spark.sessionState.newHadoopConf()
    val pIn = new org.apache.hadoop.fs.Path(inPath)
    val fs = pIn.getFileSystem(conf)
    // guard on QUALIFIED paths: raw string inequality is defeated by
    // trailing slashes / dot segments / scheme aliases, and an
    // overwrite of the input deletes it before the lazy read runs
    val qIn = fs.makeQualified(pIn).toUri.getPath.stripSuffix("/")
    val qOut = fs.makeQualified(
      new org.apache.hadoop.fs.Path(outPath)).toUri.getPath
      .stripSuffix("/")
    require(qIn != qOut && !qOut.startsWith(qIn + "/") &&
      !qIn.startsWith(qOut + "/"),
      s"compaction must not rewrite in place or nest: $qIn -> $qOut")
    val bytes = fs.getContentSummary(pIn).getLength
    val nFiles = math.min(Int.MaxValue.toLong,
      math.max(1L, (bytes + targetBytes - 1) / targetBytes)).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Corpus snapshot diff — the incremental-ingest primitive: compare
    * two corpus versions by doc_id + content fingerprint and emit the
    * delta rows as (doc_id, status ∈ added|removed|changed), dropping
    * the unchanged majority. Downstream, `added ∪ changed` is the
    * re-process set and `removed` drives tombstones — so a daily crawl
    * refresh costs the delta, not the corpus.
    *
    * Scale design: fingerprints are computed map-side (one md5 per
    * doc, narrow (id, fp) rows through the join — never the text), and
    * the full-outer join shuffles on doc_id; at 100 TB both snapshots
    * are written bucketed by doc_id so the join is co-located, and the
    * unchanged-row filter discards the bulk before anything wide
    * materializes. Presence is tracked with per-side markers — never
    * inferred from the fingerprint, whose null also means a null text —
    * and the changed test is null-safe, so null-text docs diff
    * correctly.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame =
    v1.select(col("doc_id"), md5(col("text")).as("fp1"),
        lit(true).as("in1"))
      .join(v2.select(col("doc_id"), md5(col("text")).as("fp2"),
        lit(true).as("in2")),
        Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("in1").isNull, "added")
          .when(col("in2").isNull, "removed")
          .when(!(col("fp1") <=> col("fp2")), "changed"))
      .filter(col("status").isNotNull)
      .select("doc_id", "status")

  /** [[packShards]] over an already-computed (doc_id, n_tokens) frame —
    * for pipelines that tokenize once and carry the narrow counts.
    */
  def packShardsFromCounts(counts: DataFrame, budget: Long,
      hint: Ords.SizeHint = Ords.Auto): DataFrame =
    Ords.runningSum(counts.select("doc_id", "n_tokens"),
        Seq(col("doc_id").asc), col("n_tokens"), "cum_tokens", hint)
      .withColumn("shard",
        floor((col("cum_tokens") - col("n_tokens")) / lit(budget.toDouble))
          .cast("int"))
}
