package graft.core

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import scala.jdk.CollectionConverters._

/** Gateway metrics — the reference's kyuubi-metrics surface (session /
  * operation counters exported over HTTP for scraping). Implemented as
  * an [[Events.Handler]], so the counters derive from the same
  * lifecycle stream the JSONL logger sees, and a frontend exposes the
  * snapshot (REST `GET /api/v1/metrics`).
  */
object Metrics {

  final class Collector extends Events.Handler {
    private val startedAtMs = System.currentTimeMillis()
    private val counters = new ConcurrentHashMap[String, LongAdder]()

    private def inc(name: String): Unit =
      counters.computeIfAbsent(name, _ => new LongAdder).increment()

    // pull-style gauges sampled at snapshot time (ring-buffer drop
    // counts, queue depths — state owned elsewhere)
    private val gaugeFns = new ConcurrentHashMap[String, () => Long]()
    def registerGauge(name: String, f: () => Long): Unit = gaugeFns.put(name, f)

    override def onEvent(e: Events.Event): Unit = e match {
      case Events.SessionEvent(_, _, "OPENED", _) => inc("sessions_opened")
      case Events.SessionEvent(_, _, "CLOSED", _) => inc("sessions_closed")
      case Events.OperationEvent(_, _, state, _, _) => state match {
        case "RUNNING" => inc("operations_started")
        case "FINISHED" => inc("operations_finished")
        case "ERROR" => inc("operations_failed")
        case "CANCELED" => inc("operations_canceled")
        case "TIMEOUT" => inc("operations_timed_out")
        case "CLOSED" => inc("operations_closed")
        case _ => ()
      }
      case _ => ()
    }

    def snapshot: Map[String, Long] = {
      val rt = Runtime.getRuntime
      counters.asScala.map { case (k, v) => k -> v.sum() }.toMap ++
        gaugeFns.asScala.map { case (k, f) => k -> f() }.toMap ++ Map(
        "uptime_ms" -> (System.currentTimeMillis() - startedAtMs),
        "heap_used_bytes" -> (rt.totalMemory() - rt.freeMemory()),
        "heap_max_bytes" -> rt.maxMemory())
    }

    def asJson: String =
      snapshot.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ", ", "}")

    /** Prometheus text exposition format (the reference ships a
      * PrometheusReporter in kyuubi-metrics; counters vs gauges follow
      * the same split: lifecycle totals are counters, process state is
      * a gauge).
      */
    def asPrometheus: String = {
      val gauges = Set("uptime_ms", "heap_used_bytes", "heap_max_bytes") ++
        gaugeFns.keySet.asScala
      snapshot.toSeq.sortBy(_._1).map { case (k, v) =>
        val typ = if (gauges(k)) "gauge" else "counter"
        s"# TYPE graft_$k $typ\ngraft_$k $v"
      }.mkString("", "\n", "\n")
    }
  }

  /** Periodic JSON file reporter (reference kyuubi-metrics
    * JsonReporter: `kyuubi.metrics.reporters=JSON` dumps
    * `metrics.json` into `kyuubi.metrics.json.location` every
    * interval). Writes are atomic — temp file + move — so a scraper
    * tailing the path never reads a torn snapshot. Daemon-scheduled;
    * `close()` stops it, `reportNow()` is the deterministic test hook.
    */
  final class JsonFileReporter(
      collector: Collector,
      path: java.nio.file.Path,
      intervalMs: Long = 5000L) extends AutoCloseable {

    private val scheduler = java.util.concurrent.Executors
      .newSingleThreadScheduledExecutor { r =>
        val t = new Thread(r, "graft-metrics-json")
        t.setDaemon(true)
        t
      }
    scheduler.scheduleWithFixedDelay(
      () => try reportNow() catch { case _: Exception => () },
      intervalMs, intervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)

    def reportNow(): Unit = {
      val parent = path.toAbsolutePath.getParent
      java.nio.file.Files.createDirectories(parent)
      val tmp = java.nio.file.Files.createTempFile(parent, ".metrics-", ".tmp")
      java.nio.file.Files.write(tmp,
        collector.asJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, path,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }

    override def close(): Unit = scheduler.shutdownNow()
  }
}
