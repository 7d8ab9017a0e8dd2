package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Degenerate-input semantics for the relational time-series queries —
  * edge cases the sf fixtures don't exercise but a real corpus will.
  */
class RelationalEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  test("q36: a single-timestamp type has span 0 and a NULL twa (not NaN/inf)") {
    // Spark's non-ANSI divide nulls a zero denominator where DuckDB's
    // IEEE divide NaNs — the d57 divergence class; the nullif guard
    // keeps BOTH engines at NULL for the degenerate type.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-edge-").toString
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2024-01-01 01:00:00")
    Seq(
      (1L, t0, 10L, "solo", 5.0, "{}"),
      (2L, t0, 11L, "solo", 7.0, "{}"), // same instant: span 0
      (3L, t0, 12L, "pair", 1.0, "{}"),
      (4L, t1, 13L, "pair", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = RelationalQueries.queries("q36_time_weighted_avg")(spark, dir)
      .orderBy("event_type").collect()
    assert(rows.length == 2)
    val pair = rows(0)
    assert(pair.getString(0) == "pair" && !pair.isNullAt(2), pair)
    assert(!pair.getDouble(2).isNaN && !pair.getDouble(2).isInfinite, pair)
    val solo = rows(1)
    assert(solo.getString(0) == "solo" && solo.getLong(1) == 2L, solo)
    assert(solo.isNullAt(2), s"span-0 twa must be NULL, got $solo")
  }
}
