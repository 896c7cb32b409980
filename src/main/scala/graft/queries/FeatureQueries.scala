package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{CurationOps, DedupOps, RetrievalOps, TextOps, TimeOps}

/** Temporal-join / retrieval / LM-scoring battery: the as-of join and
  * rolling event features over the events table, BM25 retrieval, the
  * bigram LM gate, and temperature-scaled source sampling — each paired
  * with a DuckDB oracle (the as-of oracle is DuckDB's native ASOF JOIN,
  * an independent algorithm for the same semantics).
  */
object FeatureQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** The BM25 fixture workload: three queries over the corpus vocab. */
  val BM25_QUERIES: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("spark", "join"),
    1 -> Seq("window", "agg"),
    2 -> Seq("customer", "vector", "stream"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // point-in-time join: each purchase enriched with the user's most
    // recent click at purchase time (one exchange, no range blowup)
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      TimeOps.asOfJoin(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "click"),
        key = "user_id", tsCol = "ts", tieCol = "event_id",
        payload = Seq("value"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("asof_ts_us"),
          col("asof_value"))
    }),

    // as-of with bounded staleness: matches older than 1h are nulled
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = events(s, dir)
      TimeOps.asOfJoinTolerance(
        ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "click"),
        key = "user_id", tsCol = "ts", tieCol = "event_id",
        payload = Seq("value"), toleranceUs = 3600000000L)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("asof_ts")).as("asof_ts_us"),
          col("asof_value"))
    }),

    // interval containment via bucketized equi-join: clicks landing in
    // the 30-minute window after each error event of the same user
    "q_range_join" -> ((s, dir) => {
      val ev = events(s, dir)
      TimeOps.rangeJoin(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "error")
          .select(col("event_id").as("win_id"), col("user_id"),
            col("ts").as("t_start"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).as("t_end")),
        key = "user_id", tsCol = "ts", startCol = "t_start",
        endCol = "t_end", bucketUs = 1800000000L)
        .select("event_id", "win_id")
    }),

    // per-eval-doc n-gram overlap fraction vs the train split
    "q_eval_overlap" -> ((s, dir) => {
      val d = docs(s, dir)
      DedupOps.evalNgramOverlap(
        d.filter(col("doc_id") >= 250), d.filter(col("doc_id") < 250))
    }),

    // calibrated quality gate: top half of the corpus by score
    "q_quality_gate" -> ((s, dir) =>
      CurationOps.qualityGateTopFraction(docs(s, dir),
        targetFrac = 0.5)),

    // trailing-window behavioural features per user
    "q_rolling_features" -> ((s, dir) =>
      TimeOps.rollingFeatures(events(s, dir), key = "user_id",
        tsCol = "ts", tieCol = "event_id", valCol = "value",
        lookback = 5)),

    // BM25 top-10 per query over the documents corpus
    "q_bm25" -> ((s, dir) =>
      RetrievalOps.bm25(docs(s, dir), BM25_QUERIES)),

    // second-order LM gate: mean bigram cross-entropy per document
    "q_lm_bigram" -> ((s, dir) =>
      TextOps.lmScoreBigram(docs(s, dir), hotK = 500)),

    // top-50 collocations by PMI with a support floor
    "q_collocations" -> ((s, dir) =>
      TextOps.collocations(docs(s, dir), minCount = 5, topK = 50)),

    // alpha = 0.5 tempered mixture at a 50% corpus budget
    "q_temperature_sample" -> ((s, dir) =>
      CurationOps.temperatureSample(docs(s, dir), alpha = 0.5,
        targetFrac = 0.5))
  )

  private def H60(x: String) = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** The BM25 scoring CTEs (ending in `scored`: query_id, doc_id,
    * score) — shared by the batch top-k oracle and the streaming gate's
    * rank-free oracle, so the two stay one definition.
    */
  val BM25_SCORED_CTES: String =
    """toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
      |    AS t
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, len(t) AS dl, term, count(*) AS tf
      |  FROM (SELECT doc_id, t, unnest(t) AS term FROM toks)
      |  GROUP BY 1, 2, 3),
      |tot AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(len(t)) AS DOUBLE) / count(*) AS avgdl
      |  FROM toks),
      |q(query_id, term) AS (VALUES
      |  (0, 'spark'), (0, 'join'), (1, 'window'), (1, 'agg'),
      |  (2, 'customer'), (2, 'vector'), (2, 'stream')),
      |dft AS (
      |  SELECT term, count(*) AS df FROM tf
      |  WHERE term IN (SELECT term FROM q) GROUP BY 1),
      |scored AS (
      |  SELECT q.query_id, tf.doc_id,
      |    CAST(sum(CAST(
      |      log2(1.0 + (tot.n - dft.df + 0.5) / (dft.df + 0.5)) *
      |      (tf.tf * 2.2) /
      |      (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / tot.avgdl))
      |      AS DECIMAL(38,18))) AS DOUBLE) AS score
      |  FROM tf JOIN dft USING (term) JOIN q USING (term)
      |  CROSS JOIN tot
      |  GROUP BY 1, 2)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |r0 AS (
        |  SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, ts
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, value FROM r0 WHERE rn = 1)
        |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
        |  epoch_us(r.ts) AS asof_ts_us, r.value AS asof_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    "q_asof_tolerance" ->
      """WITH l AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |r0 AS (
        |  SELECT user_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, ts
        |                       ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT user_id, ts, value FROM r0 WHERE rn = 1),
        |j AS (
        |  SELECT l.event_id, l.user_id, l.ts, r.ts AS rts,
        |    r.value AS rv
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts >= r.ts)
        |SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  CASE WHEN epoch_us(ts) - epoch_us(rts) > 3600000000
        |    THEN NULL ELSE epoch_us(rts) END AS asof_ts_us,
        |  CASE WHEN epoch_us(ts) - epoch_us(rts) > 3600000000
        |    THEN NULL ELSE rv END AS asof_value
        |FROM j""".stripMargin,

    "q_range_join" ->
      """WITH wins AS (
        |  SELECT event_id AS win_id, user_id, ts AS t_start,
        |    ts + INTERVAL 30 MINUTE AS t_end
        |  FROM events WHERE event_type = 'error'),
        |probe AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click')
        |SELECT p.event_id, w.win_id
        |FROM probe p JOIN wins w ON p.user_id = w.user_id
        |  AND p.ts >= w.t_start AND p.ts < w.t_end""".stripMargin,

    "q_eval_overlap" ->
      s"""WITH ${PipelineQueries.SPAN_CTES},
         |ev AS (
         |  SELECT DISTINCT doc_id, sh FROM spans WHERE doc_id < 250),
         |tr AS (SELECT DISTINCT sh FROM spans WHERE doc_id >= 250),
         |aggd AS (
         |  SELECT ev.doc_id, count(*) AS n_grams,
         |    CAST(sum(CASE WHEN tr.sh IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_hit
         |  FROM ev LEFT JOIN tr USING (sh)
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(a.n_hit, 0) AS BIGINT) AS n_hit,
         |  CASE WHEN coalesce(a.n_grams, 0) > 0
         |    THEN CAST(a.n_hit AS DOUBLE) / a.n_grams END
         |    AS overlap_frac
         |FROM (SELECT doc_id FROM documents WHERE doc_id < 250) d
         |LEFT JOIN aggd a USING (doc_id)""".stripMargin,

    "q_quality_gate" ->
      s"""WITH ${PipelineQueries.QUALITY_SCORE_CTES}
         |SELECT doc_id, score FROM (
         |  SELECT doc_id, score,
         |    row_number() OVER (ORDER BY round(score, 9) DESC, doc_id)
         |      AS rk,
         |    count(*) OVER () AS n
         |  FROM s)
         |WHERE rk <= ceil(0.5 * n)""".stripMargin,

    "q_rolling_features" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
        |  count(value) OVER w5 AS roll_n,
        |  CAST(sum(CAST(value AS DECIMAL(38,10))) OVER w5 AS DOUBLE)
        |    AS roll_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |  w5 AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)""".stripMargin,

    "q_bm25" ->
      s"""WITH $BM25_SCORED_CTES
         |SELECT query_id, rank, doc_id, score FROM (
         |  SELECT query_id, doc_id, score,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(score, 9) DESC, doc_id) AS rank
         |  FROM scored)
         |WHERE rank <= 10""".stripMargin,

    "q_lm_bigram" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
        |    AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT doc_id,
        |      unnest([{'w1': t[i], 'w2': t[i+1]}
        |              for i in range(1, len(t))]) AS b
        |    FROM toks WHERE len(t) >= 2)),
        |counts AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |c1s AS (SELECT w1, sum(c12) AS c1 FROM counts GROUP BY 1),
        |v AS (SELECT count(DISTINCT w2) AS vocab FROM counts)
        |SELECT doc_id,
        |  CAST(sum(CAST(-log2(CAST(c12 + 1 AS DOUBLE) / (c1 + v.vocab))
        |    AS DECIMAL(38,18))) AS DOUBLE) / count(*) AS lm2_bits
        |FROM bg JOIN counts USING (w1, w2) JOIN c1s USING (w1)
        |CROSS JOIN v
        |GROUP BY doc_id""".stripMargin,

    "q_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
        |    AS t
        |  FROM documents),
        |bg0 AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM (
        |    SELECT doc_id,
        |      unnest([{'w1': t[i], 'w2': t[i+1]}
        |              for i in range(1, len(t))]) AS b
        |    FROM toks WHERE len(t) >= 2)),
        |bg AS (SELECT w1, w2, count(*) AS c12 FROM bg0 GROUP BY 1, 2),
        |uni AS (
        |  SELECT tok, count(*) AS c
        |  FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
        |tot AS (SELECT (SELECT sum(c) FROM uni) AS n,
        |               (SELECT sum(c12) FROM bg) AS nb)
        |SELECT w1, w2, c12,
        |  log2((c12 / CAST(t.nb AS DOUBLE)) /
        |    ((u1.c / CAST(t.n AS DOUBLE)) *
        |     (u2.c / CAST(t.n AS DOUBLE)))) AS pmi
        |FROM bg JOIN uni u1 ON bg.w1 = u1.tok
        |  JOIN uni u2 ON bg.w2 = u2.tok
        |CROSS JOIN tot t
        |WHERE c12 >= 5
        |ORDER BY round(pmi, 9) DESC, w1, w2 LIMIT 50""".stripMargin,

    "q_temperature_sample" ->
      s"""WITH counts AS (
         |  SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
         |rates AS (
         |  SELECT source,
         |    least(1.0, 0.5 * CAST(sum(n_s) OVER () AS DOUBLE) *
         |      (CAST(pw AS DOUBLE) / CAST(sum(pw) OVER () AS DOUBLE))
         |      / n_s) AS rate
         |  FROM (SELECT source, n_s,
         |          CAST(pow(CAST(n_s AS DOUBLE), 0.5)
         |            AS DECIMAL(38,18)) AS pw
         |        FROM counts) c)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN rates USING (source)
         |WHERE (${H60("'temp' || CAST(doc_id AS VARCHAR)")} % 1000000)
         |    / 1000000.0 < rate""".stripMargin
  )
}
