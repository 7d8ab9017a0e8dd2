package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("matching bucketed tables join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    try {
      Bucketing.writeBucketed(
        spark.range(0, 10000).select(col("id").as("k"), (col("id") * 2).as("v")),
        "graft_bkt_fact", "k", buckets = 8)
      Bucketing.writeBucketed(
        spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("w")),
        "graft_bkt_dim", "k", buckets = 8)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "graft_bkt_fact", "graft_bkt_dim", "k")
      assert(joined.count() == 1000)
      assert(Bucketing.shuffleCount(joined) == 0,
        s"bucketed join must not shuffle:\n${joined.queryExecution.executedPlan.toString.take(800)}")

      // the same join over unbucketed data DOES shuffle (control)
      val unbucketed = spark.range(0, 10000).select(col("id").as("k"))
        .join(spark.range(0, 1000).select(col("id").as("k")), Seq("k"))
      unbucketed.count()
      assert(Bucketing.shuffleCount(unbucketed) > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    }
  }
}
