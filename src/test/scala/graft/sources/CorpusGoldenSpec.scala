package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.queries.{TpcdsCorpusSql, TpchCorpusSql}

/** Golden-hash corpus checks, the reference's TPCDSQuerySuite pattern
  * (TPCDSQuerySuite.scala:44-80: run every corpus query on the tiny
  * generated catalog and assert `sum(hash(*))` + row count against
  * checked-in goldens). Pins BOTH the generators and the query
  * semantics across rounds — any accidental change to row generation,
  * schema, or plan semantics breaks a golden.
  *
  * Goldens regenerate by running the suite with
  * GRAFT_REGEN_GOLDENS=1 (prints the new table on mismatch).
  */
class CorpusGoldenSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkFixture.spark
    s.conf.set("spark.sql.catalog.tpch", classOf[graft.sources.tpch.TpchCatalog].getName)
    s.conf.set("spark.sql.catalog.tpcds", classOf[graft.sources.tpcds.TpcdsCatalog].getName)
    s
  }

  private def goldens = CorpusGoldens.valueGoldens

  private def check(name: String, sql: String): Unit = {
    val h = spark.sql(sql).selectExpr("sum(hash(*)) AS h", "count(*) AS n").head()
    val got = (if (h.isNullAt(0)) 0L else h.getLong(0), h.getLong(1))
    assert(got == goldens(name),
      s"$name: got $got, golden ${goldens(name)} — generator or semantics changed")
  }

  test("TPC-H corpus matches checked-in goldens at tiny") {
    TpchCorpusSql.queries("tpch.tiny").foreach { case (n, sql) => check(s"tpch_$n", sql) }
  }

  test("TPC-DS corpus matches checked-in goldens at tiny") {
    TpcdsCorpusSql.queries("tpcds.tiny").foreach { case (n, sql) => check(s"tpcds_$n", sql) }
  }
}

/** The checked-in corpus goldens, shared by the in-process run above
  * and the over-the-wire replay (ThriftCorpusSpec).
  */
object CorpusGoldens {
  val valueGoldens: Map[String, (Long, Long)] = Map(
    "tpch_q1" -> ((1041469010L, 4L)),
    "tpch_q2" -> ((-1950694986L, 5L)),
    "tpch_q3" -> ((2124624481L, 10L)),
    "tpch_q4" -> ((3271768924L, 5L)),
    "tpch_q5" -> ((-439164708L, 5L)),
    "tpch_q6" -> ((-1823347536L, 1L)),
    "tpch_q7" -> ((-2448649297L, 4L)),
    "tpch_q8" -> ((2852953924L, 2L)),
    "tpch_q9" -> ((13188266148L, 140L)),
    "tpch_q10" -> ((-6278072471L, 20L)),
    "tpch_q11" -> ((-759019493L, 100L)),
    "tpch_q12" -> ((-364128163L, 2L)),
    "tpch_q13" -> ((2898385391L, 35L)),
    "tpch_q14" -> ((891408141L, 1L)),
    "tpch_q15" -> ((-269536071L, 1L)),
    "tpch_q16" -> ((3918751526L, 100L)),
    "tpch_q17" -> ((216353606L, 1L)),
    "tpch_q18" -> ((0L, 0L)),
    "tpch_q19" -> ((42L, 1L)),
    "tpch_q20" -> ((0L, 0L)),
    "tpch_q21" -> ((5327804731L, 7L)),
    "tpch_q22" -> ((436550858L, 7L)),
    "tpcds_q1" -> ((0L, 0L)),
    "tpcds_q2" -> ((-10905643021L, 2513L)),
    "tpcds_q3" -> ((0L, 0L)),
    "tpcds_q5" -> ((-1473785625L, 100L)),
    "tpcds_q6" -> ((-406667221L, 10L)),
    "tpcds_q99" -> ((-6637072429L, 30L)),
    "tpcds_q15" -> ((-4444947545L, 100L)),
    "tpcds_q19" -> ((1042825787L, 2L)),
    "tpcds_q32" -> ((42L, 1L)),
    "tpcds_q42" -> ((4721031941L, 4L)),
    "tpcds_q45" -> ((-2530376521L, 6L)),
    "tpcds_q52" -> ((1954955943L, 4L)),
    "tpcds_q55" -> ((-1848472167L, 2L)),
    "tpcds_q59" -> ((18053377373L, 100L)),
    "tpcds_q62" -> ((-39750983724L, 100L)),
    "tpcds_q65" -> ((-2653433748L, 7L)),
    "tpcds_q92" -> ((42L, 1L)),
    "tpcds_q97" -> ((1066272465L, 1L)),
    "tpcds_q98" -> ((-20370270597L, 115L)),
    "tpcds_q7" -> ((-1509484125L, 43L)),
    "tpcds_q26" -> ((4370902038L, 29L)),
    "tpcds_q34" -> ((-26038675127L, 1000L)),
    "tpcds_q48" -> ((1016272549L, 1L)),
    "tpcds_q73" -> ((254438209L, 304L)),
    "tpcds_q88" -> ((-1653987626L, 1L)),
    "tpcds_q90" -> ((314705662L, 1L)),
    "tpcds_q96" -> ((-477923172L, 1L)),
    "tpcds_q13" -> ((-416780422L, 1L)),
    "tpcds_q27" -> ((-9085389191L, 100L)),
    "tpcds_q36" -> ((2419402869L, 100L)),
    "tpcds_q43" -> ((296242283L, 2L)),
    "tpcds_q53" -> ((24425737112L, 100L)),
    "tpcds_q89" -> ((5699338990L, 100L)),
    "tpcds_q21" -> ((-7227885815L, 100L)),
    "tpcds_q22" -> ((20481647841L, 100L)),
    "tpcds_q37" -> ((158900913L, 1L)),
    "tpcds_q82" -> ((1858056585L, 1L)),
    "tpcds_q33" -> ((8938769906L, 29L)),
    "tpcds_q60" -> ((-11178994614L, 19L)),
    "tpcds_q12" -> ((44609390L, 38L)),
    "tpcds_q20" -> ((3351570228L, 57L)),
    "tpcds_q44" -> ((2511287601L, 10L)),
    "tpcds_q47" -> ((-21047221149L, 100L)),
    "tpcds_q63" -> ((-5818126470L, 100L)),
    "tpcds_q74" -> ((-7635514590L, 100L)),
    "tpcds_q9" -> ((-681555545L, 1L)),
    "tpcds_q28" -> ((2113909099L, 1L)),
    "tpcds_q70" -> ((-1664788455L, 5L)),
    "tpcds_q71" -> ((1494558268L, 2L)),
    "tpcds_q77" -> ((8464487556L, 18L)),
    "tpcds_q4" -> ((-4717444571L, 23L)),
    "tpcds_q8" -> ((44815633L, 2L)),
    "tpcds_q10" -> ((-12769482624L, 100L)),
    "tpcds_q11" -> ((13687094068L, 100L)),
    "tpcds_q30" -> ((-1514243721L, 9L)),
    "tpcds_q35" -> ((-10527779575L, 100L)),
    "tpcds_q38" -> ((1293116811L, 1L)),
    "tpcds_q69" -> ((-4907274260L, 100L)),
    "tpcds_q81" -> ((4278474745L, 11L)),
    "tpcds_q87" -> ((2024063747L, 1L)),
    "tpcds_q18" -> ((-16519324181L, 100L)),
    "tpcds_q46" -> ((2348400727L, 100L)),
    "tpcds_q68" -> ((6151489018L, 100L)),
    "tpcds_q79" -> ((3236983833L, 100L)),
    "tpcds_q84" -> ((-25129950607L, 53L)),
    "tpcds_q85" -> ((-1498963174L, 1L)),
    "tpcds_q91" -> ((-257856323L, 2L)),
    "tpcds_q93" -> ((-2960897594L, 100L)),
    "tpcds_q94" -> ((1446774066L, 1L)),
    "tpcds_q14" -> ((2732449876L, 100L)),
    "tpcds_q17" -> ((7350625068L, 100L)),
    "tpcds_q23" -> ((892788213L, 1L)),
    "tpcds_q25" -> ((5381628373L, 15L)),
    "tpcds_q29" -> ((-5041599959L, 46L)),
    "tpcds_q39" -> ((9932955778L, 100L)),
    "tpcds_q40" -> ((13182233876L, 87L)),
    "tpcds_q41" -> ((-4086892924L, 18L)),
    "tpcds_q49" -> ((6977815519L, 11L)),
    "tpcds_q50" -> ((-1381579830L, 2L)),
    "tpcds_q51" -> ((35400288801L, 100L)),
    "tpcds_q16" -> ((-1423259066L, 1L)),
    "tpcds_q24" -> ((7805790522L, 100L)),
    "tpcds_q31" -> ((-1080933055L, 1L)),
    "tpcds_q54" -> ((881672793L, 1L)),
    "tpcds_q56" -> ((-6504224102L, 29L)),
    "tpcds_q57" -> ((-3409098842L, 100L)),
    "tpcds_q58" -> ((-6250637512L, 18L)),
    "tpcds_q61" -> ((354196235L, 1L)),
    "tpcds_q64" -> ((-9189837170L, 25L)),
    "tpcds_q66" -> ((-1261399221L, 3L)),
    "tpcds_q67" -> ((7229407379L, 100L)),
    "tpcds_q72" -> ((-7589572880L, 15L)),
    "tpcds_q75" -> ((-2891769047L, 25L)),
    "tpcds_q76" -> ((13002152304L, 100L)),
    "tpcds_q78" -> ((2148276172L, 10L)),
    "tpcds_q80" -> ((3606407579L, 84L)),
    "tpcds_q83" -> ((-4686579791L, 28L)),
    "tpcds_q86" -> ((-22764819393L, 100L)),
    "tpcds_q14b" -> ((-3520539631L, 4L)),
    "tpcds_q23b" -> ((8546308887L, 100L)),
    "tpcds_q24b" -> ((1581184840L, 100L)),
    "tpcds_q39b" -> ((481673434L, 100L)),
    "tpcds_q95" -> ((-14215183L, 1L)))

  /** `name -> Seq("col:type")` from the checked-in resource
    * (regenerate with `runMain graft.tools.GoldenDump --schema`).
    */
  lazy val schemaGoldens: Map[String, Seq[String]] = {
    val in = getClass.getResourceAsStream("/corpus_schema_goldens.txt")
    require(in != null, "corpus_schema_goldens.txt missing from test resources")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { line =>
      val Array(name, cols) = line.split("\\|", 2)
      name -> cols.split(";").toSeq
    }.toMap
    finally in.close()
  }
}
