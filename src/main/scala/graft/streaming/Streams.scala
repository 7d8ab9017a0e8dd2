package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY §2.B streaming row; the
  * reference's Spark engine has none — its only streaming-flavored
  * surface is the Flink engine's unbounded fetch iterator,
  * IncrementalResultFetchIterator.scala:42 — so this is beyond-parity
  * surface, built Spark-first):
  *
  *  - watermarked tumbling-window aggregation (the batch twin is
  *    q20_events_hourly);
  *  - gap-based sessionization with explicit state via
  *    flatMapGroupsWithState + event-time timeout (batch twin:
  *    q25_sessionize).
  *
  * At scale these run with state partitioned by key across executors;
  * the watermark bounds state size — sessions/windows older than the
  * lateness budget are emitted and evicted.
  */
object Streams {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionAgg(start: Timestamp, end: Timestamp, n: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Tumbling event-time windows per key with a lateness watermark.
    * Append mode: a window row is emitted once, when the watermark
    * passes its end — exactly-once aggregates downstream.
    */
  def windowedCounts(
      events: DataFrame, tsCol: String, keyCol: String,
      windowLength: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Streaming exact dedup: emit each key's FIRST arrival and drop
    * re-arrivals within the watermark horizon — the streaming twin of
    * Dedup.exactKeep for a continuously-ingested corpus. State holds
    * one entry per distinct key seen inside the horizon and is evicted
    * when the watermark passes, so state size is bounded by (arrival
    * rate × lateness), not by stream history — the property that keeps
    * this viable on an unbounded 100 TB/day feed.
    */
  def dedupStream(rows: DataFrame, tsCol: String, keyCols: Seq[String],
      lateness: String): DataFrame =
    rows
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Gap-based sessions: a session closes when `gapSeconds` pass with
    * no event (enforced by event-time timeout, so sessions also close
    * when the KEY goes silent — the case windowed aggregation can't
    * express).
    */
  def sessionize(events: Dataset[Event], gapSeconds: Int, lateness: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAgg, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[Event], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.end, s.n))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            val closed = ListBuffer.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts.getTime - s.end.getTime <= gapSeconds * 1000L =>
                  cur = Some(SessionAgg(s.start, e.ts, s.n + 1))
                case Some(s) =>
                  closed += SessionOut(user, s.start, s.end, s.n)
                  cur = Some(SessionAgg(e.ts, e.ts, 1))
                case None =>
                  cur = Some(SessionAgg(e.ts, e.ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end.getTime + gapSeconds * 1000L)
            }
            closed.iterator
          }
      }
  }
}
