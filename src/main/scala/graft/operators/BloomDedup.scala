package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Incremental dedup against an already-ingested corpus via a Bloom
  * filter sketch — the shape a continuously-fed 100 TB pipeline needs:
  * the "seen" corpus is summarized ONCE into a few-hundred-MB sketch,
  * and each incoming batch is filtered map-side against it, with no join
  * against (and no re-scan of) the historical data.
  *
  * Built on Spark's own Bloom machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the pair that powers AQE runtime filter
  * pushdown), so build and probe are both codegen'd aggregate/scalar
  * expressions — no UDFs. Guarantees: NO false negatives (a truly-seen
  * key never passes the filter), and a false-positive rate set by
  * `numBits` vs distinct keys (some truly-new docs are conservatively
  * re-checked / dropped — the standard trade for not joining 100 TB).
  */
object BloomDedup {

  /** Build the sketch over xxhash64 of `key` (driver-collected: the
    * sketch is MBs; this mirrors how Spark's InjectRuntimeFilter ships
    * bloom sketches to executors via a scalar subquery result).
    */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    Option(df.select(Bridge.column(agg).as("bf")).head().getAs[Array[Byte]](0))
      .getOrElse {
        // Zero input rows yield a null sketch; without this fallback the
        // probe would read null and report NOTHING as definitely-new —
        // the inverted semantics for an empty seen-corpus. An empty
        // filter (same impl the aggregate serializes) matches no key.
        val out = new java.io.ByteArrayOutputStream()
        org.apache.spark.util.sketch.BloomFilter
          .create(math.max(expectedItems, 1L), math.max(numBits, 8L))
          .writeTo(out)
        out.toByteArray
      }
  }

  /** Probe column: true iff `key` is possibly in the sketched set. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), Bridge.expression(xxhash64(key))))

  /** Rows of `incoming` that are DEFINITELY not in the sketched corpus
    * (bloom-negative). Map-side only.
    */
  def definitelyNew(incoming: DataFrame, bloom: Array[Byte], key: Column): DataFrame =
    incoming.filter(!mightContain(bloom, key))
}
