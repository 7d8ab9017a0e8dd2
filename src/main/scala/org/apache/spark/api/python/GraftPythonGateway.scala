package org.apache.spark.api.python

import java.io.{DataOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.SparkConf

/** In-process py4j gateway for JVM-first PySpark attachment: a python
  * worker connects to THIS JVM (instead of launching its own) and
  * wraps the engine's existing SparkContext/SparkSession with the
  * public pyspark classes.
  *
  * Lives in this package to reach Spark's `private[spark]` Py4JServer
  * — the same placement the reference uses
  * (externals/kyuubi-spark-sql-engine/src/main/scala/org/apache/spark/api/python/KyuubiPythonGatewayServer.scala).
  * The connection-info file format (int port + length-prefixed UTF-8
  * secret) is pyspark's own `read_int` + `UTF8Deserializer` handshake,
  * the format Spark's PythonGatewayServer writes.
  */
object GraftPythonGateway {

  private var server: Py4JServer = _
  private var infoFile: File = _

  /** Start the gateway once per JVM; returns the connection-info file
    * path to hand to workers via env.
    */
  def ensureStarted(): String = synchronized {
    if (server == null) {
      val s = new Py4JServer(new SparkConf())
      s.start()
      require(s.getListeningPort != -1, "py4j gateway failed to bind")
      val dir = Files.createTempDirectory("graft-pygw").toFile
      val tmp = File.createTempFile("connection", ".info", dir)
      val dos = new DataOutputStream(new FileOutputStream(tmp))
      try {
        dos.writeInt(s.getListeningPort)
        val secret = s.secret.getBytes(StandardCharsets.UTF_8)
        dos.writeInt(secret.length)
        dos.write(secret)
      } finally dos.close()
      val target = new File(dir, "connection.info")
      if (!tmp.renameTo(target))
        throw new IllegalStateException(s"cannot write $target")
      server = s
      infoFile = target
    }
    infoFile.getAbsolutePath
  }
}
