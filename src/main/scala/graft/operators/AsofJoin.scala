package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the latest right
  * row whose time is at-or-before the left row's time, within the same
  * key — the lakehouse staple for attribution, slowly-changing lookups
  * and market-data alignment.
  *
  * Implementation is the union-and-window form, NOT a range join: a
  * `l.ts >= r.ts` theta join explodes to O(|L|·|R|) per key before its
  * per-row max, while this plan is one shuffle on the key and one
  * ordered window walk — at 100 TB the difference between a cross
  * product and a sort-merge pass. Ties (right time == left time) count
  * as "before" (inclusive), so a right row lands on a simultaneous left
  * row; right rows must be unique per (key, time) — pre-aggregate
  * otherwise (the window takes the LAST right row seen, which for
  * duplicate times is partition-order-dependent).
  */
object AsofJoin {

  /** Left rows with `prefix`-named copies of `rightCols` from the
    * as-of-matched right row (null where no right row precedes).
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t")) ++
        rightCols.map(c => col(c).as(prefix + c)): _*)
      .withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // Right rows sort before left rows at equal time → inclusive match.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE last() over a struct of all right columns, so every attached
    // column comes from the SAME matched right row: a per-column
    // last(ignoreNulls) would skip a legitimately-NULL value in the
    // matched row and backfill it from an older row, silently mixing
    // rows (and making a null right value look like "no match").
    val rowStruct = when(col("__side") === 0,
      struct(rightCols.map(c => col(prefix + c)): _*))
    val attached = u.withColumn("__m", last(rowStruct, ignoreNulls = true).over(w))
    val projected = rightCols.foldLeft(attached) { (df, c) =>
      df.withColumn(prefix + c, col("__m").getField(prefix + c))
    }
    projected.filter(col("__side") === 1).drop("__t", "__side", "__m")
  }

  /** FORWARD as-of join with an optional tolerance: attach to each left
    * row the EARLIEST right row whose time is at-or-after the left
    * row's time within the same key — the "next event" lookup (next
    * fill after an order, next purchase after an impression) — and
    * nothing when that earliest match is farther out than
    * `toleranceUs` microseconds (the kdb/polars `asof ... tolerance`
    * contract: the bound applies to the nearest match, it does not
    * search past it). Same union-and-window shape as [[asof]] — one
    * shuffle on the key, one ordered walk, never a theta join. Left
    * rows sort BEFORE right rows at equal time, so a simultaneous
    * right row matches (inclusive). The matched row's time is emitted
    * as `prefix + rightTime` beside the requested columns (null where
    * nothing matched). Time columns must be timestamps when a
    * tolerance is given (the bound compares `unix_micros`).
    */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String],
      toleranceUs: Option[Long] = None, prefix: String = "asof_"): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t")) ++
        rightCols.map(c => col(c).as(prefix + c)): _*)
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // One first() over a struct carrying the match's time and all its
    // columns — the same single-matched-row discipline as [[asof]].
    val rowStruct = when(col("__side") === 1,
      struct(rightCols.map(c => col(prefix + c)) :+ col("__t").as("__mt"): _*))
    val attached = u.withColumn("__m", first(rowStruct, ignoreNulls = true).over(w))
    val ok = toleranceUs match {
      case Some(tol) => col("__m").isNotNull &&
        unix_micros(col("__m").getField("__mt")) <= unix_micros(col("__t")) + tol
      case None => col("__m").isNotNull
    }
    val withTime = attached.withColumn(prefix + rightTime,
      when(ok, col("__m").getField("__mt")))
    val projected = rightCols.foldLeft(withTime) { (df, c) =>
      df.withColumn(prefix + c, when(ok, col("__m").getField(prefix + c)))
    }
    projected.filter(col("__side") === 0).drop("__t", "__side", "__m")
  }
}
