package graft.plans

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.core.Events

/** Per-query lineage dispatch — the reference's
  * SparkOperationLineageQueryExecutionListener.scala:27-41 pattern:
  * a QueryExecutionListener that, on every completed execution,
  * parses the ANALYZED plan into column lineage and posts it to the
  * event bus (where the reference fans out to Spark-event / event-bus
  * / Atlas dispatchers, our bus fans out to registered handlers —
  * the JSONL logger, metrics, tests).
  *
  * The lineage walk only runs when a handler is actually registered
  * ([[Events.hasHandlers]]) — with an idle bus the per-query cost is
  * one boolean check, so registering the listener unconditionally on
  * every engine session is free until someone listens. Failures post
  * an event with the error and no columns (reference onFailure
  * dispatch); a throwing walk is swallowed — lineage must never break
  * the query path.
  */
class LineageQueryExecutionListener extends QueryExecutionListener {

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    if (Events.hasHandlers) {
      try {
        val lineage = ColumnLineage.of(qe.analyzed)
        if (lineage.nonEmpty)
          Events.post(Events.LineageEvent(
            qe.id, lineage, None, System.currentTimeMillis()))
      } catch { case _: Throwable => }
    }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    if (Events.hasHandlers) {
      try Events.post(Events.LineageEvent(
        qe.id, Map.empty, Some(String.valueOf(exception.getMessage).take(200)),
        System.currentTimeMillis()))
      catch { case _: Throwable => }
    }
}
