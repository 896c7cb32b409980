package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.StreamingCube

/** Structured-Streaming battery: the stream path must reproduce the
  * batch backfill bit-for-bit (decimal partials), so both queries are
  * oracle-checked against plain SQL over the same events table.
  */
object StreamingQueries {

  private val runId = new AtomicInteger(0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // readStream → watermark → windowed agg → AvailableNow drain
    "q_stream_window" -> ((s, dir) =>
      StreamingCube.runDailyAgg(s, dir,
        s"stream_daily_${runId.incrementAndGet()}")),

    // streaming exact dedup: incremental min-doc_id-per-content-hash
    // (the stream form of q_dedup_exact; AvailableNow == batch parity)
    "q_stream_dedup" -> ((s, dir) =>
      StreamingCube.runStreamDedup(s, dir,
        s"stream_dedup_${runId.incrementAndGet()}")),

    // flatMapGroupsWithState sessionization (batch-mode execution of
    // the same stateful function; the streaming path is spec-tested
    // with MemoryStream batches)
    "q_stream_sessionize" -> ((s, dir) => {
      import s.implicits._
      val evts = Tables.load(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("tsMicros"))
        .as[StreamingCube.Evt]
      StreamingCube.sessionize(evts, gapMinutes = 30).toDF()
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_stream_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS doc_id
        |FROM documents GROUP BY 1""".stripMargin,

    "q_stream_window" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS d_date, event_type,
        |  count(*) AS n_events,
        |  sum(CAST(value AS DECIMAL(38,10))) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_stream_sessionize" ->
      """WITH w AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(CASE WHEN prev_ts IS NULL
        |    OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END) AS INT) AS n_sessions
        |FROM w GROUP BY 1""".stripMargin
  )
}
