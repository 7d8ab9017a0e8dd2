package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.BinaryFunctions._

/** Multimodal column operators: treat image/audio/video as opaque
  * `binary` with typed metadata. The pipeline stages a production lake
  * needs — metadata extraction, content addressing, frame chunking,
  * batched decode → feature vectors — with the decode STUBBED as a
  * deterministic fake (this container has no codec/model libraries);
  * everything Spark-side (schemas, per-partition batch shape,
  * partitioning) is real and tested.
  */
object Multimodal {

  /** Metadata pass: format, size, sha256 — pure map-side expressions. */
  def withMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("format", detectFormat(col(binCol)))
      .withColumn("byte_size", byteSize(col(binCol)))
      .withColumn("sha256", contentSha256(col(binCol)))

  /** Frame sampling: explode fixed-size frames with their index —
    * the audio/video "frame-sample" stage as a relational transform
    * (offsets computed declaratively, frames sliced with substring).
    */
  def frameSample(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, everyNth: Int = 1): DataFrame =
    df.select(col(idCol), col(binCol),
        posexplode(frameOffsets(col(binCol), frameBytes)).as(Seq("frame_idx", "offset")))
      .filter(col("frame_idx") % everyNth === 0)
      .select(col(idCol), col("frame_idx"),
        substring(col(binCol), col("offset"), lit(frameBytes)).as("frame"))

  private val FEATURE_DIM = 16

  /** ======== DECODE STUB ========
    * Stand-in for the real decoder+encoder (image decode → vision
    * model, audio decode → fbank, ...): a deterministic fake embedding
    * from content hashes. The mapPartitions shape — one decoder init
    * per PARTITION (not per row), rows streamed through in batches —
    * is exactly how a real codec/model binding runs on executors (the
    * Scala twin of mapInPandas batching).
    */
  def decodeToFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.queryExecution.toRdd.mapPartitions { rows =>
      // real pipeline: decoder = Codec.open(); model = Session.load()
      // — once per partition, reused for every row below
      rows.map { r =>
        val id = r.get(idIdx, LongType)
        val bytes = r.getBinary(binIdx)
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(Seq(
          id, new org.apache.spark.sql.catalyst.util.GenericArrayData(fakeEmbed(bytes))))
      }
    }
    internalCreate(spark, rdd, outSchema)
  }

  /** Deterministic fake "embedding": k doubles in [-1, 1] derived from
    * content hashes (splitmix64 over (seed, bytes-hash)).
    */
  def fakeEmbed(bytes: Array[Byte]): Array[Double] = {
    val base = java.util.Arrays.hashCode(bytes).toLong
    Array.tabulate(FEATURE_DIM) { i =>
      val h = org.apache.spark.sql.graft.MinHashSignatureExpr.splitmix64(base * 31 + i)
      (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  private def internalCreate(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: StructType): DataFrame =
    org.apache.spark.sql.graft.Bridge.internalCreateDataFrame(spark, rdd, schema)
}
