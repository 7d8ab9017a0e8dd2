package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Session lookup for python workers: the worker resolves its OWN
  * gateway session's SparkSession clone by uuid over py4j
  * (`jvm.graft.core.PySparkSessions.get(uuid)`), so python sees the
  * session's temp views and conf — the reference's
  * SparkSQLEngine.getSparkSession(uuid) contract used by
  * kyuubi_util.get_spark_session.
  */
object PySparkSessions {
  private val sessions = new ConcurrentHashMap[String, SparkSession]()
  def put(id: String, spark: SparkSession): Unit = sessions.put(id, spark)
  def get(id: String): SparkSession = sessions.get(id)
  def remove(id: String): Unit = sessions.remove(id)
}
