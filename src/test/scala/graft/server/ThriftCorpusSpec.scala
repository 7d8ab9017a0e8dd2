package graft.server

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.core.Engine
import graft.queries.{TpcdsCorpusSql, TpchCorpusSql}
import graft.sources.CorpusGoldens

/** The full benchmark corpora replayed OVER THE WIRE — hive-jdbc
  * through the Thrift frontend against the generator catalogs — with
  * two checked-in goldens per query (the reference's
  * OutputSchemaTPCDSSuite.scala:111-126 pattern, plus the value
  * goldens CorpusGoldenSpec pins in-process):
  *
  *   - output schema: `DESCRIBE QUERY <sql>` (analysis only) must
  *     match the `corpus_schema_goldens.txt` resource column-by-column
  *   - values: `SELECT sum(hash(*)), count(*) FROM (<sql>)` must match
  *     the shared golden table — the engine computes the digest, the
  *     wire carries two values, so the whole 125-query corpus replays
  *     in one connection without shipping result sets
  *
  * Failures collect per query and the assertion names every offender.
  */
class ThriftCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("TPC-DS 103 + TPC-H 22 replay over hive-jdbc with pinned schemas and value goldens") {
    val engine = new Engine(spark)
    val frontend = new ThriftFrontend(engine).start()
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      val conn = DriverManager.getConnection(
        s"jdbc:hive2://localhost:${frontend.boundPort}/;auth=noSasl", "corpus", "")
      try {
        val st = conn.createStatement()
        // catalog plugins resolve lazily from the session conf — a
        // runtime SET binds them for THIS wire session only
        st.execute("SET spark.sql.catalog.tpch=" +
          classOf[graft.sources.tpch.TpchCatalog].getName)
        st.execute("SET spark.sql.catalog.tpcds=" +
          classOf[graft.sources.tpcds.TpcdsCatalog].getName)

        val corpus =
          TpchCorpusSql.queries("tpch.tiny").map { case (n, q) => (s"tpch_$n", q) } ++
            TpcdsCorpusSql.queries("tpcds.tiny").map { case (n, q) => (s"tpcds_$n", q) }
        assert(corpus.count(_._1.startsWith("tpcds_")) == 103,
          "the full 103-query TPC-DS corpus must be on the wire")

        val failures = scala.collection.mutable.ArrayBuffer.empty[String]
        corpus.foreach { case (name, sql) =>
          try {
            // 1) schema golden via DESCRIBE QUERY (no execution)
            val rs = st.executeQuery(s"DESCRIBE QUERY $sql")
            val got = scala.collection.mutable.ArrayBuffer.empty[String]
            while (rs.next()) got += s"${rs.getString(1)}:${rs.getString(2)}"
            rs.close()
            val want = CorpusGoldens.schemaGoldens(name)
            if (got.toSeq != want)
              failures += s"$name schema: got ${got.mkString(";")} want ${want.mkString(";")}"
            // 2) value golden computed engine-side, asserted on the wire
            val vr = st.executeQuery(
              s"SELECT sum(hash(*)) AS h, count(*) AS n FROM ($sql) graft_wire")
            assert(vr.next())
            val h = { val v = vr.getLong(1); if (vr.wasNull()) 0L else v }
            val n = vr.getLong(2)
            vr.close()
            val goldenV = CorpusGoldens.valueGoldens(name)
            if ((h, n) != goldenV)
              failures += s"$name values: got ($h, $n) want $goldenV"
          } catch {
            case e: Throwable =>
              failures += s"$name errored: ${String.valueOf(e.getMessage).linesIterator.take(2).mkString(" | ")}"
          }
        }
        assert(failures.isEmpty,
          s"${failures.size} corpus queries diverged over the wire:\n${failures.mkString("\n")}")
      } finally conn.close()
    } finally {
      frontend.stop()
      engine.close()
    }
  }
}
