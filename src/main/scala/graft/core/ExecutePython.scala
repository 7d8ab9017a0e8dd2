package graft.core

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame

/** Python execution escape hatch: a managed `python3` worker process
  * speaking JSON-lines over stdio (the reference's ExecutePython
  * worker/bootstrap pattern, engine/spark/operation/ExecutePython.scala:49,
  * 188-368 — protocol re-designed: instead of embedding pyspark, the
  * worker's `sql(query)` calls BACK into the engine over the same pipe
  * and receives JSON rows, so Python gets full SQL access with zero
  * Python-side Spark dependency).
  *
  * Protocol, one JSON object per line:
  *   JVM → worker:  {"id": n, "code": "..."}            run a cell
  *   worker → JVM:  {"type": "sql", "sql": "..."}       mid-cell callback
  *   JVM → worker:  {"rows": [...]}                     callback reply
  *   worker → JVM:  {"id": n, "status": "ok"|"error", "output": "..."}
  */
class PythonWorker(session: EngineSession) {

  private val script: Path = {
    val code =
      """import sys, json, io, contextlib, traceback
        |
        |def _send(obj):
        |    sys.__stdout__.write(json.dumps(obj) + "\n")
        |    sys.__stdout__.flush()
        |
        |def sql(query):
        |    _send({"type": "sql", "sql": query})
        |    reply = json.loads(sys.stdin.readline())
        |    if "error" in reply:
        |        raise RuntimeError(reply["error"])
        |    return reply["rows"]
        |
        |ctx = {"sql": sql}
        |for line in sys.stdin:
        |    req = json.loads(line)
        |    buf = io.StringIO()
        |    try:
        |        with contextlib.redirect_stdout(buf):
        |            try:
        |                value = eval(compile(req["code"], "<cell>", "eval"), ctx)
        |                if value is not None:
        |                    print(repr(value))
        |            except SyntaxError:
        |                exec(compile(req["code"], "<cell>", "exec"), ctx)
        |        _send({"id": req["id"], "status": "ok", "output": buf.getvalue()})
        |    except Exception:
        |        _send({"id": req["id"], "status": "error",
        |               "output": buf.getvalue() + traceback.format_exc()})
        |""".stripMargin
    val p = Files.createTempFile("graft_pyworker", ".py")
    Files.write(p, code.getBytes(StandardCharsets.UTF_8))
    p
  }

  private lazy val process: Process =
    new ProcessBuilder("python3", script.toString).redirectErrorStream(false).start()
  private lazy val toWorker = new PrintWriter(process.getOutputStream, true)
  private lazy val fromWorker =
    new BufferedReader(new InputStreamReader(process.getInputStream, StandardCharsets.UTF_8))

  private var nextId = 0

  /** Run a Python cell; returns its printed output. `sql("...")` inside
    * the cell round-trips through the session's SparkSession.
    */
  def run(code: String): String = synchronized {
    nextId += 1
    val id = nextId
    toWorker.println(jsonObj(Seq("id" -> id.toString, "code" -> quote(code))))
    var line = fromWorker.readLine()
    while (line != null) {
      if (line.contains("\"type\": \"sql\"") || line.contains("\"type\":\"sql\"")) {
        val sqlText = extractString(line, "sql")
        val reply = try {
          val rows = session.spark.sql(sqlText).toJSON.collect()
          s"""{"rows": [${rows.mkString(",")}]}"""
        } catch {
          case e: Throwable => jsonObj(Seq("error" -> quote(String.valueOf(e.getMessage))))
        }
        toWorker.println(reply)
      } else {
        val status = extractString(line, "status")
        val output = extractString(line, "output")
        if (status == "error") throw new RuntimeException(s"python execution failed:\n$output")
        return output
      }
      line = fromWorker.readLine()
    }
    throw new IllegalStateException("python worker terminated unexpectedly")
  }

  def close(): Unit = {
    try process.destroy() catch { case _: Throwable => }
    try Files.deleteIfExists(script) catch { case _: Throwable => }
  }

  // -- minimal JSON helpers (protocol is flat string fields) --
  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  private def jsonObj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
  private def extractString(json: String, key: String): String = {
    val m = java.util.regex.Pattern
      .compile("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").matcher(json)
    if (!m.find()) return ""
    m.group(1)
      .replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")
      .replace("\\\"", "\"").replace("\\\\", "\\")
  }
}

object PythonWorker {
  def available(): Boolean =
    try new ProcessBuilder("python3", "--version").start().waitFor() == 0
    catch { case _: Throwable => false }
}
