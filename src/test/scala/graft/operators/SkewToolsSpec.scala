package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class SkewToolsSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  import spark.implicits._

  // 10k rows where key 0 holds 50% of the data + a 100-row dimension
  private def skewed = spark.range(0, 10000)
    .select(when(col("id") < 5000, 0L).otherwise(col("id") % 100).as("k"),
      col("id").as("payload"))
  private def dim = spark.range(0, 100).select(col("id").as("k"),
    concat(lit("dim"), col("id")).as("label"))

  test("salted join matches the plain join exactly") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = skewed.join(dim, Seq("k")).select("k", "payload", "label")
      val salted = SkewTools.saltedJoin(skewed, dim, "k",
        identityCols = Seq("payload"), saltFactor = 8)
        .select("k", "payload", "label")
      assert(salted.count() == plain.count())
      assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salting spreads the hot key across reducer partitions") {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(col("payload")), lit(8)).cast("int"))
    val saltsOfHotKey = salted.filter(col("k") === 0)
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(saltsOfHotKey == 8, "hot key must hit every salt bucket")
  }

  test("keySkewReport surfaces the heavy hitter with its share") {
    val top = SkewTools.keySkewReport(skewed, "k", topK = 3).collect()
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getAs[Double]("share") - 0.5) < 0.01)
  }
}
