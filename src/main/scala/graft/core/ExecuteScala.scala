package graft.core

import java.io.{PrintWriter, StringWriter}

import scala.tools.nsc.Settings
import scala.tools.nsc.interpreter.IMain
import scala.tools.nsc.interpreter.shell.ReplReporterImpl

import org.apache.spark.sql.DataFrame

/** Interactive Scala execution against a session's SparkSession — the
  * reference's ExecuteScala / KyuubiSparkILoop escape hatch
  * (engine/spark/operation/ExecuteScala.scala:50): an embedded
  * compiler (IMain) with `spark` pre-bound; a snippet whose last
  * expression is a DataFrame yields that DataFrame as the operation
  * result, anything else yields the REPL transcript.
  *
  * One interpreter per session (classes/vals persist across
  * statements, like a notebook); construction is lazy and costs ~1s.
  */
class ScalaInterpreter(session: EngineSession) {

  private val out = new StringWriter()
  private val imain: IMain = {
    val settings = new Settings
    settings.usejavacp.value = true
    val i = new IMain(settings, new ReplReporterImpl(settings, new PrintWriter(out)))
    i.initializeCompiler()
    i.bind("spark", "org.apache.spark.sql.SparkSession", session.spark)
    i.quietRun("import org.apache.spark.sql.functions._")
    i
  }

  /** Interpret a snippet; Right(df) if it evaluates to a DataFrame,
    * Left(transcript) otherwise. Throws on compile/runtime error with
    * the reporter output as the message.
    */
  def interpret(code: String): Either[String, DataFrame] = synchronized {
    out.getBuffer.setLength(0)
    val result = imain.interpret(code)
    result match {
      case scala.tools.nsc.interpreter.Results.Success =>
        val lastVar = imain.mostRecentVar
        val value = if (lastVar.nonEmpty) imain.valueOfTerm(lastVar) else None
        value match {
          case Some(df: DataFrame) => Right(df)
          case _ => Left(out.toString)
        }
      case scala.tools.nsc.interpreter.Results.Incomplete =>
        throw new IllegalArgumentException(s"incomplete Scala snippet:\n$code")
      case scala.tools.nsc.interpreter.Results.Error =>
        throw new RuntimeException(s"scala execution failed:\n${out.toString}")
    }
  }

  def close(): Unit = imain.close()
}
