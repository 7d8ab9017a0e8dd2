package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}

/** One scored candidate row flowing into the top-k aggregation. */
case class Scored(neighbor_id: Long, sim: Double)

/** Map-side top-k: a typed `Aggregator` whose partial buffers never
  * exceed `2k` elements, so the shuffle for `groupBy(query_id)` carries
  * at most `2k` candidates per map partition per query instead of the
  * full |corpus|×|queries| scored set.
  *
  * This replaces ranking via `row_number() over (partition by
  * query_id)`, which shuffles EVERY scored row into |queries|
  * partitions — an extreme-skew bomb at cluster scale (each query's
  * full corpus-worth of rows lands on one reducer). With partial
  * aggregation (`reduce` map-side, `merge` on the reducer) the
  * per-query reducer sees O(partitions·k) rows.
  *
  * Ordering: sim descending, neighbor_id ascending (deterministic
  * tie-break). `finish` returns the sorted top-k, so callers can derive
  * rank from array position.
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.neighbor_id < b.neighbor_id)

  private def prune(b: Seq[Scored]): Seq[Scored] =
    b.sortWith(better).take(k)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = {
    val appended = b :+ a
    if (appended.length >= 2 * k) prune(appended) else appended
  }

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    prune(x ++ y)

  override def finish(b: Seq[Scored]): Seq[Scored] = prune(b)

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregator {
  /** Untyped-DataFrame handle: `agg(udf(col("neighbor_id"), col("sim")))`. */
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[Scored])
}

/** String-keyed candidate — the any-orderable-id twin of [[Scored]]
  * (UUID/string document ids; ties break on the string's binary
  * order, matching Spark's own string sort order).
  */
case class ScoredStr(neighbor_id: String, sim: Double)

/** [[TopKAggregator]] over string ids — same ≤2k partial-buffer
  * contract, same (sim desc, id asc) ordering, so samplers over
  * non-numeric ids get the identical skew-safe shape.
  */
class TopKStringAggregator(k: Int)
  extends Aggregator[ScoredStr, Seq[ScoredStr], Seq[ScoredStr]] {

  // Spark orders strings by UTF8String BINARY (UTF-8 byte) order, not
  // Java's UTF-16 code-unit '<': for ids containing supplementary
  // characters (surrogate pairs sort ABOVE U+E000..U+FFFF in UTF-16 but
  // their UTF-8 bytes 0xF0.. sort above everything 3-byte), the two
  // orders disagree — and this aggregator's tie-break must match the
  // window-twin's orderBy exactly. Compare UTF-8 bytes.
  private def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  private def better(a: ScoredStr, b: ScoredStr): Boolean =
    a.sim > b.sim || (a.sim == b.sim && utf8Lt(a.neighbor_id, b.neighbor_id))

  private def prune(b: Seq[ScoredStr]): Seq[ScoredStr] =
    b.sortWith(better).take(k)

  override def zero: Seq[ScoredStr] = Vector.empty

  override def reduce(b: Seq[ScoredStr], a: ScoredStr): Seq[ScoredStr] = {
    val appended = b :+ a
    if (appended.length >= 2 * k) prune(appended) else appended
  }

  override def merge(x: Seq[ScoredStr], y: Seq[ScoredStr]): Seq[ScoredStr] =
    prune(x ++ y)

  override def finish(b: Seq[ScoredStr]): Seq[ScoredStr] = prune(b)

  override def bufferEncoder: Encoder[Seq[ScoredStr]] = ExpressionEncoder[Seq[ScoredStr]]()
  override def outputEncoder: Encoder[Seq[ScoredStr]] = ExpressionEncoder[Seq[ScoredStr]]()
}

object TopKStringAggregator {
  def udaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKStringAggregator(k), Encoders.product[ScoredStr])
}
