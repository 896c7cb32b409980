package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Scale design (billions of vectors):
  *  - The probe set is always the small side → broadcast; the corpus
  *    never shuffles for brute-force scoring, and the per-probe top-k is
  *    a partial top-k under a window (rank <= k filters map-side via
  *    WindowGroupLimit before the final per-probe merge).
  *  - The IVF variant is the scale path: a coarse quantizer (centroid
  *    per cell) built once, probes routed to their nearest cell, and
  *    scoring confined to that cell's partition — the classic
  *    IVF-Flat layout; at 100 TB the corpus would be written
  *    partitioned-by-cell so a probe touches one partition (partition
  *    pruning on the cell key).
  *  - All distance math is codegen'd column expressions (zip_with +
  *    aggregate), double-accumulated for engine portability; no UDFs.
  */
object SimilarityOps {

  import DedupOps.{cosineExpr, unitArr}

  /** Default embedding dimensionality of the testdata corpus. */
  val Dim = 64

  /** Brute-force cosine top-k: vectors L2-normalized once per side into
    * flat scalar columns, then every probe scored against every corpus
    * vector with a codegen'd dot product (no interpreted higher-order
    * math and no array access in the per-pair path); per-probe rank
    * window keeps rank <= k (Spark inserts WindowGroupLimit, so the
    * top-k prunes map-side before the per-probe merge).
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame,
      k: Int, dim: Int = Dim): DataFrame = {
    val c = unitArr(corpus.select(col("vec_id"), col("embedding")), dim)
    val p = unitArr(probes.select(col("vec_id"), col("embedding")), dim)
    val scored = c.as("c").join(
        broadcast(p.as("p")), col("c.vec_id") =!= col("p.vec_id"))
      .select(col("p.vec_id").as("probe_id"),
        col("c.vec_id").as("neighbor_id"),
        expr("dot_f64(p.u, c.u)").as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }

  /** Exact squared-L2 brute-force top-k — the ground truth an ANN
    * index is measured against. Per-pair work is ONE codegen'd dot
    * product via the identity ||x-y||² = ||x||² + ||y||² − 2·x·y
    * (per-side norms precompute once as index-order folds; a per-pair
    * higher-order fold would run interpreted). Deterministic for the
    * oracle: norms fold in component order, the combination is
    * (nx + ny) − 2d in that exact shape, ties break on neighbor_id.
    */
  def l2TopK(corpus: DataFrame, probes: DataFrame, k: Int,
      dim: Int = Dim): DataFrame = {
    graft.functions.VectorExprs.register(corpus.sparkSession)
    val c = flatFrame(corpus, dim).withColumn("nn", expr("dot_f64(e, e)"))
    val p = flatFrame(probes, dim).withColumn("nn", expr("dot_f64(e, e)"))
    val scored = c.as("c")
      .join(broadcast(p.as("p")), col("c.vec_id") =!= col("p.vec_id"))
      .select(col("p.vec_id").as("probe_id"),
        col("c.vec_id").as("neighbor_id"),
        expr("(p.nn + c.nn) - 2D * dot_f64(p.e, c.e)").as("d2"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("d2").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }

  /** Recall@k of the IVF-PQ index against exact L2 ground truth — the
    * evaluation-harness metric a deployed ANN pipeline tracks per
    * index build (coarse cells + codebooks + nprobe are all recall
    * knobs; this measures them). Returns (probe_id, recall).
    */
  def ivfPqRecall(corpus: DataFrame, probes: DataFrame, kCoarse: Int,
      cIters: Int, m: Int, kSub: Int, iters: Int, k: Int, nprobe: Int,
      dim: Int = Dim): DataFrame = {
    val approx = ivfPqTopK(corpus, probes, kCoarse, cIters, m, kSub,
      iters, k, nprobe, dim)
    val exact = l2TopK(corpus, probes, k, dim)
    // left join from the exact side: probes whose routed cells miss
    // every true neighbor still report (as recall 0), never vanish
    exact.select(col("probe_id"), col("neighbor_id"))
      .join(approx.select(col("probe_id"), col("neighbor_id"),
        lit(1).as("hit")), Seq("probe_id", "neighbor_id"), "left")
      .groupBy("probe_id")
      .agg((sum(coalesce(col("hit"), lit(0))) /
        count(lit(1)).cast("double")).as("recall"))
  }

  /** Elementwise mean of the embedding vectors per cell — the coarse
    * quantizer codebook. posexplode → avg per (cell, dim) → re-assemble
    * ordered array. One shuffle of n_vectors * dim skinny rows.
    */
  def centroids(corpus: DataFrame, cellCol: String): DataFrame =
    corpus.select(col(cellCol).as("cell"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("cell", "dim")
      .agg(avg(col("v").cast("double")).as("mv"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("dim"), col("mv"))))
        .as("pairs"))
      .select(col("cell"),
        expr("transform(pairs, p -> p.mv)").as("centroid"))

  /** IVF top-k: route each probe to its `nprobe` nearest centroid
    * cells, then brute-force only within those cells. The corpus side
    * is pre-bucketed by `cellCol` (here: the label column as a stand-in
    * for a trained k-means codebook); the probe-to-cell routing is a
    * broadcast join against the (tiny) codebook. `nprobe` is the
    * classic IVF recall knob — scored work grows linearly in probed
    * cells while the corpus-side plan is unchanged (each extra cell is
    * one more pruned partition at 100 TB, not a wider scan).
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, cellCol: String,
      k: Int, dim: Int = Dim, nprobe: Int = 1): DataFrame = {
    val code = centroids(corpus, cellCol)
    // routing: few probes × few cells — the interpreted cosine is fine
    val routed = probes.select(col("vec_id").as("probe_id"),
        col("embedding").as("probe_emb"))
      .crossJoin(broadcast(code))
      .select(col("probe_id"), col("probe_emb"), col("cell"),
        expr(cosineExpr("probe_emb", "centroid")).as("ccos"))
    val wRoute = Window.partitionBy("probe_id")
      .orderBy(col("ccos").desc, col("cell").asc)
    val probeCells = routed.withColumn("r", row_number().over(wRoute))
      .filter(col("r") <= nprobe)
      .select(col("probe_id"), col("cell"))
    // unit-normalize each probe ONCE, then fan out to its probed cells
    // (cells are disjoint per corpus vector, so no dedup is needed)
    val pUnit = unitArr(probes.select(col("vec_id"), col("embedding")),
        dim)
      .join(probeCells.withColumnRenamed("probe_id", "vec_id"), "vec_id")
    val cUnit = unitArr(corpus.select(col("vec_id"), col("embedding")),
        dim)
      .join(corpus.select(col("vec_id"), col(cellCol).as("__cell")),
        "vec_id")
    val scored = cUnit.as("c")
      .join(broadcast(pUnit.as("p")),
        col("c.__cell") === col("p.cell") &&
          col("c.vec_id") =!= col("p.vec_id"))
      .select(col("p.vec_id").as("probe_id"),
        col("c.vec_id").as("neighbor_id"),
        expr("dot_f64(p.u, c.u)").as("cos"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }

  /** Deterministic seeded Lloyd's k-means over the embedding column —
    * the trained coarse quantizer for IVF (replaces the label stand-in).
    * Returns (vec_id, cell).
    *
    * Engine-portability design (the assignment must be bit-reproducible
    * against a DuckDB oracle):
    *  - seeds = the k vectors with the smallest md5-derived hash of
    *    vec_id (portable, no RNG);
    *  - centroid components accumulate as DECIMAL(38,12) sums + count —
    *    exact and order-independent at any parallelism (a double sum
    *    would vary with partial-aggregation order); the mean is the
    *    correctly-rounded double of the exact sum divided by the count;
    *  - distances fold (v_d - m_d)² in index order on both engines, so
    *    the doubles compare bit-identically; ties break on cell id.
    *
    * The model (k × dim doubles) is collected to the driver each round
    * and re-embedded as literals — it is a MODEL, not data; the per-row
    * assignment stays a single codegen'd projection over the corpus
    * with no join and no shuffle (at 100 TB: one map-only pass per
    * Lloyd iteration plus one grid aggregation).
    */
  def kmeansCells(corpus: DataFrame, k: Int, iters: Int,
      dim: Int = Dim): DataFrame =
    kmeansWithModel(corpus, k, iters, dim)._1

  /** The trained model alone — no assignment pass; callers embed it
    * as literals ([[ivfPqTopK]] assigns cells map-side and routes
    * probes against it). The model is the oracle's `clist<iters>`.
    */
  def kmeansModel(corpus: DataFrame, k: Int, iters: Int,
      dim: Int = Dim): Seq[(Int, Array[Double])] = {
    val flat = flatFrame(corpus, dim).persist()
    val model = trainCells(flat, k, iters)
    flat.unpersist(blocking = false)
    model
  }

  /** [[kmeansCells]] plus the trained model itself — for callers that
    * must ROUTE queries against the centroids afterwards (IVF-PQ): the
    * model returned is exactly the one the assignment used (the
    * oracle's `clist<iters>`), not a post-hoc re-average.
    */
  def kmeansWithModel(corpus: DataFrame, k: Int, iters: Int,
      dim: Int = Dim): (DataFrame, Seq[(Int, Array[Double])]) = {
    // slice to `dim`: centroids, distances, and the oracle all fold
    // over exactly dim components even when the stored embedding is
    // wider (the flat-column formulation projected v1..v<dim>)
    val flat = flatFrame(corpus, dim).persist()
    val model = trainCells(flat, k, iters)
    // Pins.cut, not a bare localCheckpoint: checkpoint blocks bypass
    // the CacheManager, so an unmanaged one leaks a resident RDD per
    // call — cut registers it for release at the query boundary
    val out = graft.olap.Pins.cut(
      flat.withColumn("cell", expr(assignSql(model, "e")))
        .select(col("vec_id"), col("cell")))
    flat.unpersist(blocking = false)
    (out, model)
  }

  /** (codebook, cell-ids) literal SQL arrays of a trained model, in
    * cell-id order — the form [[assignSql]] and the PQ distance tables
    * embed into generated code.
    */
  private def modelLits(model: Seq[(Int, Array[Double])]): (String, String) = {
    val sorted = model.sortBy(_._1)
    val cb = sorted.map { case (_, m) =>
      m.map(v => s"${v}D").mkString("array(", ", ", ")")
    }.mkString("array(", ", ", ")")
    val cids = sorted.map(_._1).mkString("array(", ", ", ")")
    (cb, cids)
  }

  /** Nearest-cell assignment over a vector column, as a SQL expression:
    * native codegen'd argmin (argmin_sq): the collected model rides
    * into generated code as a double[][] reference object and the
    * distance scan is a short nested loop — constant generated-code
    * size at any k × dim (the k-unrolled distance columns + chained
    * CASE this replaces overflowed Janino at realistic k). Distances
    * fold in index order with tie-break on the lower index = the
    * ORDER BY dist, cell the oracle uses; element_at maps the argmin
    * index back to the (possibly non-contiguous) surviving cell ids.
    */
  private def assignSql(model: Seq[(Int, Array[Double])],
      vecSql: String): String = {
    val (cb, cids) = modelLits(model)
    s"element_at($cids, argmin_sq($vecSql, $cb) + 1)"
  }

  /** The deterministic seeded Lloyd loop over a persisted flat
    * (vec_id, e: Array[Double]) frame; returns the trained model as
    * (surviving cell id, centroid) pairs. See [[kmeansCells]] for the
    * engine-portability contract the arithmetic satisfies.
    */
  /** Seed centroids pass through the same decimal(38,12) rounding the
    * update step applies, so iteration 1 is bit-identical to an oracle
    * that derives them via the shared centroid CTE. This rounding is
    * the ONE definition both the k-means and PQ training share — the
    * oracle-parity contract lives here.
    */
  private def snap12(v: Double): Double =
    new java.math.BigDecimal(v)
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The k seed vectors of a flat (vec_id, e) frame: smallest
    * md5-derived hash of vec_id, ties on vec_id, components snapped —
    * k smallest via TakeOrdered (orderBy+limit), so no
    * single-partition window even on a billion-vector corpus.
    */
  private def seedVectors(flat: DataFrame, k: Int): Array[Array[Double]] =
    flat
      .withColumn("__h", expr(DedupOps.h60("cast(vec_id as string)")))
      .orderBy(col("__h").asc, col("vec_id").asc)
      .limit(k)
      .collect()
      .map(r => r.getSeq[Double](r.fieldIndex("e")).map(snap12).toArray)

  private def trainCells(flat: DataFrame, k: Int,
      iters: Int): Seq[(Int, Array[Double])] = {
    var centroids: Seq[(Int, Array[Double])] =
      seedVectors(flat, k).toSeq.zipWithIndex.map(_.swap)
    for (_ <- 1 until iters) {
      // update step on skinny (cell, dim, v) rows: ONE decimal sum
      // instead of a 64-wide decimal aggregate (which defeats codegen
      // and hashes a huge row), and k×dim grouped partials combine
      // map-side — the shape that holds at any corpus size
      val grid = flat
        .withColumn("cell", expr(assignSql(centroids, "e")))
        .select(col("cell"), posexplode(col("e")).as(Seq("d", "v")))
        .groupBy("cell", "d")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(v as decimal(38,12))")).as("s"))
        .collect()
      // empty cells drop out (identically on the oracle side)
      centroids = grid.groupBy(_.getAs[Int]("cell")).toSeq.map {
        case (cell, rows) =>
          (cell, rows.sortBy(_.getAs[Int]("d")).map(r =>
            r.getAs[java.math.BigDecimal]("s").doubleValue() /
              r.getAs[Long]("n")).toArray)
      }
    }
    centroids
  }

  /** The DuckDB-equivalent SQL of kmeansCells (unrolled Lloyd
    * iterations), for the oracle compare. Mirrors the exact arithmetic:
    * decimal component sums, via-varchar double cast, index-order
    * distance folds, (dist, cell) tie-break.
    */
  def kmeansOracleSql(k: Int, iters: Int, dim: Int = Dim): String =
    s"""${kmeansOracleCtes(k, iters, dim)}
       |SELECT vec_id, cell FROM assign${iters}""".stripMargin

  /** The WITH-clause prefix of [[kmeansOracleSql]] (everything up to
    * and including the final `assign<iters>` CTE, whose columns are
    * (vec_id, e, cell)) — for oracles that COMPOSE on top of the
    * k-means assignment, e.g. semantic dedup.
    */
  def kmeansOracleCtes(k: Int, iters: Int, dim: Int = Dim): String =
    "WITH " + kmeansCtesBody(k, iters, dim, off = 0, prefix = "")

  /** One seeded-Lloyd CTE chain (no leading WITH): `<prefix>v` slices
    * the stored embedding to components [off+1, off+dim] — the identity
    * slice when off = 0 and dim is the stored width — and the chain
    * ends at `<prefix>assign<iters>` (vec_id, e, cell). A non-empty
    * prefix namespaces every CTE so several chains (one per PQ
    * subspace) can share a single WITH clause.
    */
  private def kmeansCtesBody(k: Int, iters: Int, dim: Int, off: Int,
      prefix: String): String = {
    def cent(i: Int, from: String) =
      s"""${prefix}cent$i AS (
         |  SELECT cell, d,
         |    CAST(CAST(sum(CAST(val AS DECIMAL(38,12))) AS VARCHAR)
         |      AS DOUBLE) / count(*) AS m
         |  FROM (SELECT cell, unnest(e) AS val,
         |          generate_subscripts(e, 1) AS d FROM $from) ${prefix}ex$i
         |  GROUP BY cell, d),
         |${prefix}clist$i AS (
         |  SELECT cell, list(m ORDER BY d) AS c FROM ${prefix}cent$i
         |  GROUP BY cell)"""
        .stripMargin
    def assign(i: Int) =
      s"""${prefix}assign$i AS (
         |  SELECT vec_id, e, cell FROM (
         |    SELECT v.vec_id, v.e, c.cell,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        list_sum(list_transform(range(1, ${dim + 1}),
         |          i -> (v.e[i] - c.c[i]) * (v.e[i] - c.c[i]))),
         |        c.cell) AS rn
         |    FROM ${prefix}v v CROSS JOIN ${prefix}clist$i c)
         |  WHERE rn = 1)""".stripMargin
    val steps = (1 to iters).map(i =>
      cent(i, s"${prefix}assign${i - 1}") + ",\n" + assign(i)).mkString(",\n")
    s"""${prefix}v AS (
       |  SELECT vec_id, list_transform(embedding[${off + 1}:${off + dim}],
       |    x -> CAST(x AS DOUBLE)) AS e
       |  FROM embeddings),
       |${prefix}assign0 AS (
       |  SELECT vec_id, e,
       |    CAST(row_number() OVER (ORDER BY
       |      ('0x'||substr(md5(CAST(vec_id AS VARCHAR)),1,15))::BIGINT,
       |      vec_id) - 1 AS INT) AS cell
       |  FROM ${prefix}v
       |  QUALIFY cell < $k),
       |${steps}""".stripMargin
  }

  // -- product quantization (the memory-bound 100 TB ANN layout) -------

  /** PQ codebooks: the embedding splits into `m` contiguous subspaces
    * of dim/m components and each subspace trains an independent seeded
    * Lloyd codebook of `kSub` centroids (the classic Jégou et al. 2011
    * layout faiss calls PQ<m>). The model is m × kSub × (dim/m) doubles
    * — driver-resident by design, like the IVF coarse quantizer.
    *
    * Scale: training is m independent [[trainCells]] loops over a
    * dim/m-wide slice (each iteration one map-only assignment pass +
    * one skinny grid aggregation); nothing corpus-sized ever reaches
    * the driver.
    */
  def pqTrain(corpus: DataFrame, m: Int, kSub: Int, iters: Int,
      dim: Int = Dim): Seq[Seq[(Int, Array[Double])]] = {
    val flat = flatFrame(corpus, dim).persist()
    val models = pqTrainOn(flat, m, kSub, iters, dim)
    flat.unpersist(blocking = false)
    models
  }

  /** Element-wise MEAN POOLING of embeddings per group — the standard
    * doc-vector-from-chunk-vectors reduction (sentence/passage
    * vectors averaged into a document vector), which is also the
    * centroid-update arithmetic of [[kmeansCells]] exposed as a
    * first-class op. Lowered as skinny (group, d, component) rows
    * through ONE decimal(38,12)-sum aggregate: order-independent at
    * any parallelism (float summation order is the classic
    * engine-divergence trap), map-side combining, never a wide array
    * aggregate. Emits exploded scalar rows (group_id, d, pooled, n) —
    * the join-ready shape whose comparison is engine-portable;
    * reassemble with collect_list over d when an array is wanted.
    */
  def meanPool(emb: DataFrame, groupExpr: String,
      dim: Int = Dim): DataFrame =
    flatFrame(emb, dim)
      .select(expr(groupExpr).as("group_id"),
        posexplode(col("e")).as(Seq("d", "v")))
      .groupBy("group_id", "d")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(v as decimal(38,12))")).as("s"))
      .select(col("group_id"), col("d"),
        (col("s").cast("double") / col("n")).as("pooled"), col("n"))

  /** (vec_id, e: Array[Double]) projection of the embedding column,
    * sliced to `dim` — the shared input frame of every trainer/encoder.
    */
  private def flatFrame(corpus: DataFrame, dim: Int): DataFrame = {
    graft.functions.VectorExprs.register(corpus.sparkSession)
    corpus.select(col("vec_id"),
      expr(s"slice(transform(embedding, x -> cast(x as double)), 1, $dim)")
        .as("e"))
  }

  /** [[pqTrain]] over a caller-persisted [[flatFrame]] — lets IVF-PQ
    * train the coarse quantizer and the codebooks off ONE cached
    * corpus projection.
    */
  private def pqTrainOn(flat: DataFrame, m: Int, kSub: Int, iters: Int,
      dim: Int): Seq[Seq[(Int, Array[Double])]] = {
    val subDim = dim / m
    require(m * subDim == dim, s"m=$m must divide dim=$dim")
    // ALL subspaces train off the one frame in one pass per step — m
    // independent trainCells loops would re-read the corpus m times
    // per iteration for arithmetic that is per-subspace independent
    // anyway: the kSub seed VECTORS are the same rows for every
    // subspace (smallest md5 of vec_id), components disjoint
    var models: IndexedSeq[Seq[(Int, Array[Double])]] = {
      val seedRows = seedVectors(flat, kSub)
      (0 until m).map(s => seedRows.toSeq.zipWithIndex.map {
        case (e, cid) => (cid, e.slice(s * subDim, (s + 1) * subDim))
      })
    }
    // one projection computing every subspace's assignment at once
    def codesSql(): String = models.zipWithIndex.map { case (model, s) =>
      assignSql(model, s"slice(e, ${s * subDim + 1}, $subDim)")
    }.mkString("array(", ", ", ")")
    for (_ <- 1 until iters) {
      // ONE skinny grid pass for all m subspaces: explode the full
      // vector, key each component by (its subspace, that subspace's
      // assigned cell, the local dim) — identical decimal sums to the
      // per-subspace loops, grouped in one aggregation
      val grid = flat
        .withColumn("codes", expr(codesSql()))
        .select(posexplode(col("e")).as(Seq("d", "v")), col("codes"))
        .select(expr(s"cast(d / $subDim as int)").as("sub"),
          expr(s"element_at(codes, cast(d / $subDim as int) + 1)")
            .as("cell"),
          expr(s"d % $subDim").as("ld"), col("v"))
        .groupBy("sub", "cell", "ld")
        .agg(count(lit(1)).as("n"),
          sum(expr("cast(v as decimal(38,12))")).as("s"))
        .collect()
      models = (0 until m).map { s =>
        grid.filter(_.getAs[Int]("sub") == s)
          .groupBy(_.getAs[Int]("cell")).toSeq.map { case (cell, rows) =>
            (cell, rows.sortBy(_.getAs[Int]("ld")).map(r =>
              r.getAs[java.math.BigDecimal]("s").doubleValue() /
                r.getAs[Long]("n")).toArray)
          }
      }
    }
    models
  }

  /** PQ encoding: (vec_id, sub, code) — each vector compresses to m
    * small codes (m bytes/vector at kSub <= 256 vs 4·dim for float32,
    * a 256× reduction at the default geometry; THE layout that keeps a
    * 100 TB corpus's ANN index in cluster memory). Encoding is one
    * fused map-only projection running m native argmin_sq loops per
    * row; no shuffle, no join.
    */
  def pqEncode(corpus: DataFrame, m: Int, kSub: Int, iters: Int,
      dim: Int = Dim): DataFrame =
    pqEncodeWith(corpus, pqTrain(corpus, m, kSub, iters, dim), dim)

  /** Encode against already-trained codebooks — the index-INGEST form
    * ([[pqEncode]] with training split off): stateless map-only, so it
    * runs unchanged over a streaming frame (the streaming gate trains
    * on the static corpus and encodes vectors as they arrive).
    */
  def pqEncodeWith(corpus: DataFrame,
      models: Seq[Seq[(Int, Array[Double])]], dim: Int = Dim): DataFrame = {
    val subDim = dim / models.length
    val codes = models.zipWithIndex.map { case (model, s) =>
      assignSql(model, s"slice(e, ${s * subDim + 1}, $subDim)")
    }.mkString("array(", ", ", ")")
    flatFrame(corpus, dim)
      .select(col("vec_id"), posexplode(expr(codes)).as(Seq("sub", "code")))
  }

  /** PQ top-k by asymmetric distance computation (ADC): each probe
    * precomputes a per-subspace table of squared distances to every
    * codebook centroid, and a corpus vector's approximate distance is
    * the sum of m table lookups on its codes — the scan never touches
    * the float vectors.
    *
    * Scale: the corpus side is the m-codes frame ([[pqEncode]]'s
    * map-only projection); the probe side (codes tables included, m ×
    * kSub doubles per probe) broadcasts; per-probe top-k prunes
    * map-side under the rank window (WindowGroupLimit). Distance math
    * is deterministic for the oracle: per-subspace tables fold in
    * component order, the m lookups add left-to-right.
    */
  def pqTopK(corpus: DataFrame, probes: DataFrame, m: Int, kSub: Int,
      iters: Int, k: Int, dim: Int = Dim): DataFrame = {
    val models = pqTrain(corpus, m, kSub, iters, dim)
    val subDim = dim / m
    val coded = flatFrame(corpus, dim)
      .select(col("vec_id") +: pqCodeCols(models, subDim): _*)
    val pt = flatFrame(probes, dim)
      .select(col("vec_id") +: adcTableCols(models, subDim): _*)
    adcRankTopK(coded, pt, m, k,
      col("c.vec_id") =!= col("p.vec_id"))
  }

  /** Per-subspace code columns `code_<s>` over a flat `e` vector —
    * the literal-model assignment projection shared by PQ and IVF-PQ.
    */
  private def pqCodeCols(models: Seq[Seq[(Int, Array[Double])]],
      subDim: Int): Seq[org.apache.spark.sql.Column] =
    models.zipWithIndex.map { case (model, s) =>
      expr(assignSql(model, s"slice(e, ${s * subDim + 1}, $subDim)"))
        .as(s"code_$s")
    }

  /** Probe-side ADC tables `dt_<s>`: map(cell id -> squared distance
    * of the probe subvector to that cell's centroid); the codebook
    * rides in as literals, the fold is index-order (zip_with +
    * aggregate) — the ONE definition of the ADC distance arithmetic,
    * shared by PQ and IVF-PQ so the oracle-parity contract cannot
    * diverge between them.
    */
  private def adcTableCols(models: Seq[Seq[(Int, Array[Double])]],
      subDim: Int): Seq[org.apache.spark.sql.Column] =
    models.zipWithIndex.map { case (model, s) =>
      val sorted = model.sortBy(_._1)
      val keys = sorted.map(_._1).mkString("array(", ", ", ")")
      val vals = sorted.map { case (_, c) =>
        val lits = c.map(v => s"${v}D").mkString("array(", ", ", ")")
        s"""aggregate(zip_with(slice(e, ${s * subDim + 1}, $subDim),
           |  $lits, (x, y) -> (x - y) * (x - y)),
           |  0D, (a, x) -> a + x)""".stripMargin
      }.mkString("array(", ", ", ")")
      expr(s"map_from_arrays($keys, $vals)").as(s"dt_$s")
    }

  /** The shared ADC scoring tail: broadcast the probe tables `pt`
    * into the coded corpus under `joinCond` (aliases `c` = corpus,
    * `p` = probes), sum the m lookups left-to-right, rank per probe
    * ascending with ties on neighbor_id, keep rank <= k.
    */
  private def adcRankTopK(coded: DataFrame, pt: DataFrame, m: Int,
      k: Int, joinCond: org.apache.spark.sql.Column): DataFrame = {
    val approx = (0 until m).map(s => s"element_at(p.dt_$s, c.code_$s)")
      .reduceLeft((a, b) => s"($a + $b)")
    val scored = coded.as("c")
      .join(broadcast(pt.as("p")), joinCond)
      .select(col("p.vec_id").as("probe_id"),
        col("c.vec_id").as("neighbor_id"),
        expr(approx).as("approx"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("approx").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank")
  }

  /** The WITH body for PQ oracles: one [[kmeansCtesBody]] chain per
    * subspace, prefixed `s<sub>` — `s<sub>assign<iters>` holds that
    * subspace's (vec_id, e, cell) and `s<sub>clist<iters>` its final
    * codebook.
    */
  def pqOracleCtes(m: Int, kSub: Int, iters: Int, dim: Int = Dim): String = {
    val subDim = dim / m
    "WITH " + (0 until m).map(s =>
      kmeansCtesBody(kSub, iters, subDim, off = s * subDim,
        prefix = s"s$s")).mkString(",\n")
  }

  /** [[pqOracleCtes]] plus the coarse-quantizer chain (prefix `g`):
    * `gassign<cIters>` is every vector's coarse cell, `gclist<cIters>`
    * the coarse codebook probes route against.
    */
  def ivfPqOracleCtes(kCoarse: Int, cIters: Int, m: Int, kSub: Int,
      iters: Int, dim: Int = Dim): String = {
    val subDim = dim / m
    "WITH " + (kmeansCtesBody(kCoarse, cIters, dim, off = 0,
      prefix = "g") +: (0 until m).map(s =>
      kmeansCtesBody(kSub, iters, subDim, off = s * subDim,
        prefix = s"s$s"))).mkString(",\n")
  }

  /** IVF-PQ top-k — the canonical billion-vector layout (coarse
    * routing bounds WHICH vectors are scored, PQ codes bound WHAT the
    * scan reads): probes route to their `nprobe` nearest coarse cells
    * and ADC scoring runs only inside those cells, over codes.
    * (Codes quantize the raw vectors, not coarse residuals — faiss's
    * `by_residual=false` layout — which keeps the probe's distance
    * tables cell-independent: one table set per probe, not per
    * (probe, cell).)
    *
    * Scale: the scored join is an EQUI-join on the coarse cell with
    * the routed probe side broadcast — at 100 TB the coded corpus is
    * written partitioned by coarse cell, so a probe touches nprobe
    * partitions (partition pruning) and the scan reads m bytes per
    * vector. Routing distances and ADC tables are index-order folds
    * over literal models (bit-reproducible vs the oracle).
    */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, kCoarse: Int,
      cIters: Int, m: Int, kSub: Int, iters: Int, k: Int, nprobe: Int,
      dim: Int = Dim): DataFrame = {
    // ONE cached corpus projection feeds coarse training, codebook
    // training AND the coded index (pin: released at the query
    // boundary) — separate kmeansModel/pqTrain calls would each
    // re-read and re-convert the corpus
    val flat = DedupOps.pin(flatFrame(corpus, dim).persist())
    val coarseModel = trainCells(flat, kCoarse, cIters)
    val models = pqTrainOn(flat, m, kSub, iters, dim)
    val subDim = dim / m
    // cell + codes in ONE map-only projection (the literal coarse
    // model assigns the cell — no join against an assignment frame;
    // this is the shape of the on-disk index: (cell, codes) per row)
    val coded = flat.select(col("vec_id") +:
      expr(assignSql(coarseModel, "e")).as("cell") +:
      pqCodeCols(models, subDim): _*)
    val pt = routedProbes(probes, coarseModel, models, nprobe, dim)
    adcRankTopK(coded, pt, m, k,
      col("c.cell") === col("p.cell") &&
        col("c.vec_id") =!= col("p.vec_id"))
  }

  /** Probe routing + ADC tables: squared distance to every coarse
    * centroid as a (d, cell) struct array; array_sort orders by
    * (d, cell) — the same tie-break as the oracle's row_number — and
    * the first nprobe entries explode into one probe row per probed
    * cell, each carrying the probe's per-subspace distance tables.
    */
  private def routedProbes(probes: DataFrame,
      coarseModel: Seq[(Int, Array[Double])],
      models: Seq[Seq[(Int, Array[Double])]], nprobe: Int,
      dim: Int): DataFrame = {
    val subDim = dim / models.length
    val entries = coarseModel.sortBy(_._1).map { case (cid, c) =>
      val lits = c.map(v => s"${v}D").mkString("array(", ", ", ")")
      s"""named_struct('d',
         |  aggregate(zip_with(e, $lits, (x, y) -> (x - y) * (x - y)),
         |    0D, (a, x) -> a + x),
         |  'cell', $cid)""".stripMargin
    }.mkString("array(", ", ", ")")
    val routeExpr =
      s"transform(slice(array_sort($entries), 1, $nprobe), s -> s.cell)"
    flatFrame(probes, dim)
      .select(Seq(col("vec_id"), explode(expr(routeExpr)).as("cell")) ++
        adcTableCols(models, subDim): _*)
  }

  /** A persisted IVF-PQ index: the on-disk parquet path (partitioned
    * by coarse cell) plus the trained models probes must be routed /
    * ADC'd against — the codebooks ARE the index metadata a real
    * deployment versions alongside the data files.
    */
  final case class IvfPqIndex(path: String,
      coarse: Seq[(Int, Array[Double])],
      books: Seq[Seq[(Int, Array[Double])]], dim: Int)

  /** Marker file guarding [[writeIvfPqIndex]]'s rebuild wipe. */
  val IvfPqMarker = "_graft_ivfpq.json"

  /** Train and WRITE the IVF-PQ index: one cached corpus projection
    * feeds coarse + codebook training and the (vec_id, cell, codes)
    * encode, and the coded rows land as parquet PARTITIONED BY the
    * coarse cell — the billion-vector deployment layout: a probe
    * routed to `nprobe` cells reads `nprobe` directories (partition
    * pruning, asserted in PipelineOpsSpec) at m bytes per vector,
    * never the corpus. Rows are range-clustered by (cell, vec_id)
    * before the write so file count ≈ max(tasks, cells), not
    * tasks × cells.
    */
  def writeIvfPqIndex(corpus: DataFrame, path: String, kCoarse: Int,
      cIters: Int, m: Int, kSub: Int, iters: Int,
      dim: Int = Dim): IvfPqIndex = {
    val flat = DedupOps.pin(flatFrame(corpus, dim).persist())
    val coarseModel = trainCells(flat, kCoarse, cIters)
    val models = pqTrainOn(flat, m, kSub, iters, dim)
    val index = IvfPqIndex(path, coarseModel, models, dim)
    // a REBUILD (retrain) must wipe every prior ingest generation:
    // overwriting only ingest=0 would leave ingest>0 files encoded
    // with the OLD codebooks resident — exactly the generation mixing
    // that silently corrupts ADC distances. The wipe is marker-guarded
    // ([[Artifacts.claimIndexDir]]): only a prior graft index (or an
    // empty dir) may be destroyed — a typo'd path fails loudly.
    Artifacts.claimIndexDir(corpus.sparkSession, path, IvfPqMarker,
      s"""{"kind":"ivfpq","kCoarse":$kCoarse,"m":$m,"kSub":$kSub,""" +
        s""""dim":$dim}""")
    writeCoded(flat, index, ingestId = 0L)
    index
  }

  /** The ONE definition of the on-disk index row layout — encode a
    * flat (vec_id, e) frame with the index's models and land it under
    * `ingest=<id>/cell=<n>/`. Each ingest generation owns its
    * directory and is written with OVERWRITE, so replaying an ingest
    * id rewrites rather than duplicates (the same idempotence contract
    * as [[graft.streaming.StreamingCube.idempotentBatchSink]]); `cell`
    * remains a partition column, so probes still prune to their routed
    * cells across every generation. Rows are range-clustered by
    * (cell, vec_id) so file count ≈ max(tasks, cells).
    */
  private def writeCoded(flat: DataFrame, index: IvfPqIndex,
      ingestId: Long): Unit = {
    val subDim = index.dim / index.books.length
    flat.select(col("vec_id") +:
        expr(assignSql(index.coarse, "e")).as("cell") +:
        pqCodeCols(index.books, subDim): _*)
      .repartitionByRange(col("cell"), col("vec_id"))
      .write.mode("overwrite").partitionBy("cell")
      // force the _SUCCESS marker (same rationale as DedupOps
      // .writeIngestPartition): compactIvfPqIndex gates committed
      // ingests on it, and a cluster-wide marksuccessfuljobs=false
      // would otherwise make compaction a permanent silent no-op —
      // or, under mixed configs, fold a subset beside an unmarked
      // base it then renames onto
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
      .parquet(s"${index.path}/ingest=$ingestId")
    // an overwrite invalidates any file listing a same-session reader
    // cached — honor the idempotence contract here, not in callers
    flat.sparkSession.catalog.refreshByPath(index.path)
  }

  /** Append new vectors to a persisted [[IvfPqIndex]] — the ingest
    * half of index maintenance: arriving vectors are encoded map-only
    * against the PERSISTED codebooks (training is an offline job;
    * ingest must not retrain — the [[StreamingCube]] PQ gate makes the
    * same contract) and land under their own `ingest=<ingestId>/`
    * generation at O(new vectors) cost; reads keep pruning on `cell`.
    * Replaying the same ingestId (a retried job) OVERWRITES that
    * generation instead of duplicating its rows — callers key the id
    * to their upstream batch (e.g. the streaming batchId).
    * Re-training (centroid drift) is a rebuild, not an append — by
    * design: mixing codebook generations in one index silently
    * corrupts every ADC distance.
    */
  def appendToIvfPqIndex(index: IvfPqIndex, vectors: DataFrame,
      ingestId: Long): Unit = {
    require(ingestId > 0, "ingest id 0 is the base build")
    Artifacts.requireNoCompactInFlight(vectors.sparkSession, index.path,
      "compactIvfPqIndex")
    writeCoded(flatFrame(vectors, index.dim), index, ingestId)
  }

  /** Fold every committed ingest generation of a persisted IVF-PQ
    * index into the base `ingest=0` — the same small-files
    * housekeeping as [[DedupOps.compactClusterIndex]]: a continuous
    * ingest accumulates one generation dir (× cells) per batch, and
    * listing/open overhead grows with history while every row stays
    * perfectly merge-compatible (all generations are encoded against
    * the SAME persisted codebooks — retraining is a rebuild by
    * contract). Probes prune on `cell` exactly as before; rows are
    * preserved verbatim.
    *
    * Crash-safe stage-and-swap, resumable by re-running: the merged
    * copy lands under the underscore-invisible `_compact/` staging dir
    * with a `_DONE` plan marker; the swap deletes the folded
    * generations and renames the staged copy to `ingest=0`. A crash
    * mid-stage restages from the untouched originals; a crash mid-swap
    * resumes from the plan. Single-writer maintenance; compact only
    * past ingests that can no longer be replayed (a replayed old
    * ingestId would re-add its vectors beside the folded copy).
    *
    * Returns the number of generations folded (0 = already compact).
    */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      index: IvfPqIndex): Int = {
    Artifacts.readMarker(spark, index.path, IvfPqMarker)
    val root = new org.apache.hadoop.fs.Path(index.path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val executed = Artifacts.stageAndSwap(spark, index.path,
      planOf = () => {
        val ingests = fs.listStatus(root).iterator
          .filter(st => st.getPath.getName.startsWith("ingest=") &&
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          .map(_.getPath.getName.stripPrefix("ingest=").toLong)
          .toSeq.sorted
        if (ingests.size <= 1) None else Some(ingests.mkString(","))
      },
      stage = (pl, tmp) => {
        val ingests = pl.split(",").map(_.toLong).toSeq
        spark.read.parquet(index.path)
          .filter(col("ingest").cast("long").isin(ingests: _*))
          .drop("ingest")
          .repartitionByRange(col("cell"), col("vec_id"))
          .write.mode("overwrite").partitionBy("cell")
          // the staged dir becomes ingest=0 by rename — its _SUCCESS
          // must exist for the next compaction's committed-ingest gate
          .option(
            "mapreduce.fileoutputcommitter.marksuccessfuljobs", "true")
          .parquet(new org.apache.hadoop.fs.Path(tmp, "data").toString)
      },
      swaps = pl => Seq(("data",
        pl.split(",").toSeq.map(i => s"${index.path}/ingest=$i"),
        s"${index.path}/ingest=0")))
    spark.catalog.refreshByPath(index.path)
    executed.map(_.split(",").count(_.nonEmpty)).getOrElse(0)
  }

  /** Query a [[writeIvfPqIndex]] index from disk: routing and ADC use
    * the PERSISTED codebooks (no retraining, no corpus scan), and the
    * cell equi-join against the partitioned files lets Spark prune to
    * the probed cells. Equal row-for-row to the in-memory
    * [[ivfPqTopK]] at the same training parameters (specced).
    */
  def queryIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      index: IvfPqIndex, probes: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    // mid-SWAP part of the index lives only under the invisible
    // staging dir — a plain read would silently rank over a fraction
    // of the corpus (mid-STAGE is fine: originals untouched)
    Artifacts.requireNoSwapInFlight(spark, index.path,
      "compactIvfPqIndex")
    val coded = spark.read.parquet(index.path)
    val pt = routedProbes(probes, index.coarse, index.books, nprobe,
      index.dim)
    adcRankTopK(coded, pt, index.books.length, k,
      col("c.cell") === col("p.cell") &&
        col("c.vec_id") =!= col("p.vec_id"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    * the embeddings with the trained coarse quantizer, then drop the
    * higher vec_id of every within-cluster pair whose cosine is >= tau.
    * Returns the surviving (vec_id, cell) rows.
    *
    * Scale design: the clustering bounds the quadratic pair work to
    * Σ |cell|² instead of the corpus crossJoin — the same candidate-
    * bounding role LSH bands play for text near-dup, but with the
    * cluster granularity as an explicit knob: at 100 TB, k grows until
    * each cell's unit-vector block fits an executor (SemDeDup used
    * k = 11k for 1.3B embeddings), and the corpus would be written
    * partitioned-by-cell so the self-join is partition-local. Scoring
    * is the native codegen'd dot over once-normalized unit vectors —
    * never the interpreted higher-order cosine in the per-pair path.
    */
  def semanticDedup(corpus: DataFrame, k: Int, iters: Int,
      tau: Double, dim: Int = Dim): DataFrame = {
    val cells = kmeansCells(corpus, k, iters, dim)
    val u = DedupOps
      .unitArr(corpus.select(col("vec_id"), col("embedding")), dim)
      .join(cells, "vec_id")
    // shuffle_hash on both sides: the within-cell self-join partitions
    // on the cell key — broadcasting would put the whole unit-vector
    // corpus on one executor, regardless of what local stats suggest
    val dropped = u.as("a").hint("shuffle_hash")
      .join(u.as("b").hint("shuffle_hash"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(expr("dot_f64(a.u, b.u)") >= tau)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    cells.join(dropped, Seq("vec_id"), "left_anti")
      .select("vec_id", "cell")
  }

  /** Symmetric per-vector int8 scalar quantization — the ANN storage
    * path: at corpus scale the float32 vectors dominate the footprint,
    * and IVF-style search degrades gracefully on int8 codes at 4× less
    * IO (the standard faiss SQ8 layout). Each vector carries one
    * `scale` = max|x|/127 and its components round to
    * floor(x/scale + 0.5) clamped to [-127, 127] — floor(+0.5) instead
    * of round() because round()'s half-case rule differs between
    * engines while the floor form is pure IEEE arithmetic, identical
    * everywhere. Rows come back exploded as (vec_id, scale, d, q):
    * map-only, no shuffle, and dequantization error is ≤ scale/2 per
    * component (specced).
    */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("e"))
      .withColumn("scale",
        expr("aggregate(e, 0D, (a, x) -> greatest(a, abs(x))) / 127.0D"))
      .select(col("vec_id"), col("scale"), posexplode(expr(
        """transform(e, x -> cast(if(scale = 0D, 0D,
          |  greatest(-127D, least(127D, floor(x / scale + 0.5D))))
          |  as int))""".stripMargin)).as(Seq("d", "q")))

  /** plane(b, d) ∈ [-0.5, 0.5): md5-derived uniform — deterministic.
    * Computed ONCE on the driver (the planes depend only on the bit and
    * dimension indices, never on data); inlining them as literals keeps
    * the per-row bucket computation pure codegen'd arithmetic instead
    * of nBits × dim interpreted md5 calls per vector. The derivation is
    * bit-identical to the SQL `h60('pl<b>_<d>') % 1000000 / 1e6 - 0.5`
    * the DuckDB oracle computes.
    */
  def planeConst(b: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"pl${b}_$d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) % 1000000L) / 1000000.0 - 0.5
  }

  /** Random-hyperplane LSH bucketing: nBits sign bits from deterministic
    * md5-derived hyperplanes → integer bucket key. Vectors in the same
    * bucket are ANN candidates; at scale the corpus is partitioned by
    * bucket. Deterministic (seeded), so oracle-reproducible.
    *
    * Per-bit sign: a left-folded literal sum over the embedding
    * components, same accumulation order as the oracle's list_sum fold,
    * so the doubles (and therefore the sign tests) compare
    * bit-identically.
    */
  def lshBuckets(corpus: DataFrame, nBits: Int, dim: Int = Dim): DataFrame = {
    // the bucket packs into ONE Long; past 63 bits the `1L << p` /
    // band-shift arithmetic would WRAP (Java masks shifts mod 64) and
    // silently alias bands — refuse instead (callers with more key
    // space need fewer/wider bands, see embeddingPairsLshAuto)
    require(nBits >= 1 && nBits <= 63,
      s"lsh bucket is a packed Long: nBits must be in 1..63, got $nBits")
    graft.functions.VectorExprs.register(corpus.sparkSession)
    // native lsh_bits loop: the planes ride in as a literal matrix and
    // the generated method stays a few lines at any nBits × dim — the
    // single ~nBits×dim-term expression this replaces was a Janino
    // 64 KB / deep-recursion hazard. Fold order per plane matches the
    // oracle's list_sum, so the buckets are bit-identical.
    val planes = (0 until nBits).map { b =>
      (0 until dim).map(d => s"${planeConst(b, d)}D")
        .mkString("array(", ", ", ")")
    }.mkString("array(", ", ", ")")
    corpus.select(col("vec_id"), col("embedding"),
      expr(s"lsh_bits(embedding, $planes)").as("bucket"))
  }
}
