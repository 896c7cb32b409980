package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning pipeline — the composition the
  * individual operators exist for: quality filter → exact dedup →
  * near-dup removal → per-language corpus stats. Every stage is a
  * deterministic DataFrame transform, so the whole pipeline is one
  * lazy plan (Catalyst fuses the projections; the only shuffles are
  * the dedup groupBys and the near-dup postings join).
  *
  * Scale shape: filters are map-side; exact dedup shuffles on the
  * 128-bit digest; near-dup uses the two-phase hash-candidate join
  * (work ∝ shared-shingle pairs); the final stats aggregate is
  * language-cardinality sized.
  */
object CleanPipeline {

  /** Surviving doc ids + text after the three cleaning stages.
    *
    * Near-dup policy (VERDICT r6 #2): connected components over the
    * >= `jaccard` pair graph, keep the MINIMUM doc_id per component.
    * Component-aware keep-one is what a production pipeline wants —
    * the old pairwise drop-the-larger-id rule kept B in {B~C, A~C}
    * even though B is transitively a duplicate of the kept A. The CC
    * runs only over pair PARTICIPANTS (distinct endpoints), so the
    * iterative star rounds touch a pair-graph-sized frame, never the
    * corpus; docs in no pair survive without entering the iteration.
    */
  def clean(docs: DataFrame, minTokens: Int = 30,
      minStopRatio: Double = 0.04,
      jaccard: Double = 0.5): DataFrame = {
    val (_, kept2, dropNear) = stages(docs, minTokens, minStopRatio,
      jaccard)
    kept2.join(dropNear, Seq("doc_id"), "left_anti")
  }

  /** The ONE wiring of the cleaning stages, shared by [[clean]] and
    * [[cleanAudit]] so the audit can structurally never drift from
    * the pipeline it explains: (quality survivors, exact survivors,
    * near-dup drop ids).
    */
  private def stages(docs: DataFrame, minTokens: Int,
      minStopRatio: Double,
      jaccard: Double): (DataFrame, DataFrame, DataFrame) = {
    // quality gate as a PURE map-side filter (one tokenize, no join):
    // the former profile → id-project → self-join shape spent two
    // corpus-sized exchanges on what is semantically a WHERE clause
    val kept1 = TextOps.qualityFilter(docs, minTokens, minStopRatio)
    // exact dedup stays the agg-ids + join-back shape on purpose: a
    // one-exchange min_by(struct(*), doc_id) variant wins in isolation
    // (0.63→0.38s warm at sf0.1 — ScaleProbe "exact dedup min_by") but
    // LOSES composed (clean 4.6→5.1s): the join-back leaves kept2
    // hash-partitioned on doc_id, which the final near-dup anti-join
    // and the callers' doc_id joins reuse, so the "saved" exchange
    // reappears downstream and the SortAggregate (struct buffers
    // aren't hash-aggregable) is pure overhead
    val keepE = DedupOps.exactDedup(kept1).select("doc_id")
    // kept2 feeds the near-dup join, the anti-join, and the callers'
    // stats joins — persist so the quality/dedup stages run once
    val kept2 = DedupOps.pin(kept1.join(keepE, "doc_id").persist())
    // pairs feeds the node frame (both endpoints) and the CC edges
    val pairs = DedupOps.pin(DedupOps.jaccardPairs(kept2, jaccard)
      .select("doc_a", "doc_b").persist())
    val nodes = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val dropNear = DedupOps.componentsAuto(pairs, nodes)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    (kept1, kept2, dropNear)
  }

  /** Per-document FATE audit of [[clean]] — the observability surface
    * ("why did my document disappear?"): every INPUT doc labeled with
    * the first stage that dropped it — `quality`, `exact_dup`,
    * `near_dup` — or `kept`. Built from the SAME stage operators as
    * [[clean]] (the audit cannot disagree with the pipeline), lowered
    * as narrow id-set left joins over the input ids; at 100 TB this
    * frame feeds the data-quality dashboard and per-source drop-rate
    * alarms, and its cost is the pipeline's own stages plus three
    * doc_id-keyed joins of id-width frames.
    */
  def cleanAudit(docs: DataFrame, minTokens: Int = 30,
      minStopRatio: Double = 0.04,
      jaccard: Double = 0.5): DataFrame = {
    val (kept1, kept2, dropNear) = stages(docs, minTokens, minStopRatio,
      jaccard)
    docs.select(col("doc_id"))
      .join(kept1.select(col("doc_id"), lit(true).as("__q")),
        Seq("doc_id"), "left")
      .join(kept2.select(col("doc_id"), lit(true).as("__e")),
        Seq("doc_id"), "left")
      .join(dropNear.select(col("doc_id"), lit(true).as("__nd")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("__q").isNull, "quality")
          .when(col("__e").isNull, "exact_dup")
          .when(col("__nd").isNotNull, "near_dup")
          .otherwise("kept").as("fate"))
  }

  /** Full curation flow: clean → per-source cap → token-budget shard
    * packing. The survivors collapse to a NARROW per-doc feature frame
    * (doc_id, source, n_chars, n_tokens — one tokenization pass, ~24
    * bytes/doc) that is persisted once and feeds both the cap window
    * and the packing prefix sum; the document text is never read again
    * after that single pass, and the near-dup anti-join runs once.
    */
  def curate(docs: DataFrame, maxDocs: Int = 30,
      budget: Long = 2000L): DataFrame =
    curateOver(clean(docs), maxDocs, budget)

  /** [[curate]] over an already-cleaned survivors frame — what a
    * pipeline consuming the persisted [[writeCleanIndex]] artifact
    * runs, skipping the quality/dedup/CC stages entirely.
    */
  def curateOver(cleaned: DataFrame, maxDocs: Int = 30,
      budget: Long = 2000L): DataFrame = {
    val feats = DedupOps.pin(cleaned
      .select(col("doc_id"), col("source"), col("n_chars"),
        expr(s"size(${TextOps.TOKENS})").as("n_tokens"))
      .persist())
    val capIds = CurationOps.capPerSource(feats, maxDocs).select("doc_id")
    CurationOps.packShardsFromCounts(feats.join(capIds, "doc_id"), budget)
  }

  /** Cleaned-corpus statistics per predicted language: surviving doc
    * count and total token count.
    */
  def cleanStats(docs: DataFrame): DataFrame = cleanStatsOver(clean(docs))

  /** [[cleanStats]] over an already-cleaned survivors frame (the
    * persisted-artifact read path).
    */
  def cleanStatsOver(cleaned: DataFrame): DataFrame =
    // one fused profile pass over the survivors: language + token
    // count come from a single tokenization, no self-joins
    TextOps.profile(cleaned)
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))

  // --------------------------------------- persisted clean artifact

  val CleanMarker = "_graft_clean.json"

  private def cleanMarkerJson(minTokens: Int, minStopRatio: Double,
      jaccard: Double): String =
    s"""{"kind":"clean_index","min_tokens":$minTokens,""" +
      s""""min_stop_ratio":$minStopRatio,"jaccard":$jaccard}"""

  /** Handle to a persisted clean index (per-doc fate labels). */
  final case class CleanIndex(path: String, minTokens: Int,
      minStopRatio: Double, jaccard: Double)

  /** Persist the pipeline's per-doc FATE table — quality / exact_dup /
    * near_dup / kept for every input doc — so the quality+dedup+CC
    * stages run ONCE per corpus and every downstream consumer (the
    * curation flow, the audit dashboard, per-source drop-rate alarms,
    * the corpus-stats report) reads a two-column frame instead of
    * re-running the stages. Same production medicine as
    * [[DedupOps.writeClusterIndex]]: marker-guarded wipe
    * ([[Artifacts.claimIndexDir]]), generation-snapshotted layout.
    * Built from the SAME one [[stages]] wiring as [[clean]], so the
    * artifact structurally cannot drift from the pipeline.
    */
  def writeCleanIndex(docs: DataFrame, path: String, minTokens: Int = 30,
      minStopRatio: Double = 0.04,
      jaccard: Double = 0.5): CleanIndex = {
    val spark = docs.sparkSession
    Artifacts.claimIndexDir(spark, path, CleanMarker,
      cleanMarkerJson(minTokens, minStopRatio, jaccard))
    // guarded write: an empty corpus can plan to zero output
    // partitions, and a file-less fates/gen=0 would crash every
    // readCleanFates with "unable to infer schema"
    DedupOps.writeIngestPartition(
      cleanAudit(docs, minTokens, minStopRatio, jaccard)
        .repartitionByRange(col("doc_id")),
      s"$path/fates/gen=0")
    spark.catalog.refreshByPath(path)
    CleanIndex(path, minTokens, minStopRatio, jaccard)
  }

  /** The current (doc_id, fate) table of a persisted clean index —
    * the latest generation snapshot (two narrow columns).
    */
  def readCleanFates(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    Artifacts.readMarker(spark, path, CleanMarker)
    val all = spark.read.parquet(s"$path/fates")
    val latest = all.agg(max(col("gen"))).head().get(0)
    all.filter(col("gen") === lit(latest))
      .select("doc_id", "fate")
  }

  /** The cleaning survivors reconstructed from a persisted fate table:
    * a narrow id semi-join against the corpus — identical rows to
    * [[clean]] (spec-pinned), at the cost of one id-keyed join instead
    * of the three stages.
    */
  def cleanFrom(docs: DataFrame, fates: DataFrame): DataFrame =
    docs.join(fates.filter(col("fate") === "kept").select("doc_id"),
      Seq("doc_id"), "left_semi")
}
