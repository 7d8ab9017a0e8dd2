package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.core.Events

/** Pluggable lineage dispatch target — the reference's dispatcher seam
  * (kyuubi-spark-lineage/.../dispatcher/LineageDispatcher.scala: the
  * listener parses lineage ONCE, then fans out to the dispatchers the
  * conf names — KyuubiEventDispatcher, SparkEventDispatcher,
  * AtlasLineageDispatcher). Ours are selected by the session conf
  * `graft.lineage.dispatchers` (comma-separated):
  *
  *   - `EVENT_BUS`   (default) → the graft [[Events]] bus, where the
  *                   JSONL logger / REST feed / metrics listen
  *   - `SPARK_EVENT` → the Spark listener bus as a
  *                   [[org.apache.spark.sql.graft.GraftLineageSparkEvent]]
  *                   (the reference SparkEventDispatcher.scala shape) —
  *                   visible to any SparkListener, incl. the event log
  *   - anything else → treated as a fully-qualified class name and
  *                   loaded reflectively (zero-arg constructor), the
  *                   deployment seam for an Atlas-style sink
  *
  * Dispatcher failures are swallowed per dispatcher: lineage delivery
  * must never break the query path, and one sink's outage must not
  * starve the others.
  */
trait LineageDispatcher {
  /** Deliver the column lineage of a completed execution. */
  def send(qe: QueryExecution, columns: Map[String, Set[String]]): Unit

  /** Deliver an execution failure (no lineage available). */
  def onFailure(qe: QueryExecution, error: Exception): Unit = ()

  /** Cheap pre-flight: when false the listener skips the (plan-walk)
    * lineage computation for this dispatcher — the idle-bus guard.
    */
  def active: Boolean = true
}

/** Default: post to the graft event bus (the reference
  * KyuubiEventDispatcher posting OperationLineageKyuubiEvent).
  */
object EventBusLineageDispatcher extends LineageDispatcher {
  override def active: Boolean = Events.hasHandlers
  override def send(qe: QueryExecution, columns: Map[String, Set[String]]): Unit =
    Events.post(Events.LineageEvent(qe.id, columns, None, System.currentTimeMillis()))
  override def onFailure(qe: QueryExecution, error: Exception): Unit =
    Events.post(Events.LineageEvent(
      qe.id, Map.empty, Some(String.valueOf(error.getMessage).take(200)),
      System.currentTimeMillis()))
}

/** Post to the SPARK listener bus (the reference SparkEventDispatcher:
  * lineage as a SparkListenerEvent any registered SparkListener — or
  * the JSON event log — can consume).
  */
object SparkEventLineageDispatcher extends LineageDispatcher {
  override def send(qe: QueryExecution, columns: Map[String, Set[String]]): Unit =
    org.apache.spark.sql.graft.SparkEventLineage.post(
      qe.sparkSession, qe.id, columns, None)
  override def onFailure(qe: QueryExecution, error: Exception): Unit =
    org.apache.spark.sql.graft.SparkEventLineage.post(
      qe.sparkSession, qe.id, Map.empty,
      Some(String.valueOf(error.getMessage).take(200)))
}

object LineageDispatcher {
  val ConfKey = "graft.lineage.dispatchers"

  // reflective dispatchers are stateless by contract — one instance
  // per class name, shared across sessions
  private val custom =
    new java.util.concurrent.ConcurrentHashMap[String, LineageDispatcher]()

  def forSession(spark: SparkSession): Seq[LineageDispatcher] =
    spark.conf.getOption(ConfKey)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("EVENT_BUS"))
      .flatMap {
        case "EVENT_BUS" => Some(EventBusLineageDispatcher)
        case "SPARK_EVENT" => Some(SparkEventLineageDispatcher)
        case cls =>
          try Some(custom.computeIfAbsent(cls, c =>
            Class.forName(c).getDeclaredConstructor().newInstance()
              .asInstanceOf[LineageDispatcher]))
          catch { case _: Throwable => None } // a bad class must not break queries
      }
}

/** Per-query lineage dispatch — the reference's
  * SparkOperationLineageQueryExecutionListener.scala:27-41 pattern:
  * a QueryExecutionListener that, on every completed execution,
  * parses the ANALYZED plan into column lineage once and fans it out
  * to the conf-selected [[LineageDispatcher]]s.
  *
  * The lineage walk only runs when some dispatcher is [[LineageDispatcher.active]]
  * — with the default EVENT_BUS dispatcher and an idle bus the
  * per-query cost is one boolean check, so registering the listener
  * unconditionally on every engine session is free until someone
  * listens. Failures dispatch with the error and no columns
  * (reference onFailure dispatch); a throwing walk is swallowed —
  * lineage must never break the query path.
  */
class LineageQueryExecutionListener extends QueryExecutionListener {

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val ds = LineageDispatcher.forSession(qe.sparkSession).filter(_.active)
    if (ds.nonEmpty) {
      try {
        val lineage = ColumnLineage.of(qe.analyzed)
        if (lineage.nonEmpty)
          ds.foreach(d => try d.send(qe, lineage) catch { case _: Throwable => })
      } catch { case _: Throwable => }
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = {
    val ds = LineageDispatcher.forSession(qe.sparkSession).filter(_.active)
    ds.foreach(d => try d.onFailure(qe, exception) catch { case _: Throwable => })
  }
}
