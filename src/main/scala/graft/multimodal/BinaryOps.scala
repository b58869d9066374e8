package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.6): media as opaque
  * `binary` payloads + typed metadata structs, with batch feature
  * extraction over `mapPartitions` (the Scala analogue of
  * mapInPandas-style batched UDF execution).
  *
  * The decode step is a STUB — no image/audio codecs ship in this
  * sandbox — replaced by a deterministic md5-seeded fake, so the
  * Spark-side contract (schema, batching, partition parallelism) is
  * real and tested while the codec is pluggable.
  */
object BinaryOps {

  final case class MediaFeatures(doc_id: Long, n_bytes: Long, features: Array[Double])

  /** Pack a text corpus into the binary-media shape: payload bytes +
    * metadata struct. At 100 TB the payloads would come straight from
    * parquet/avro binary columns; the downstream contract is the same.
    */
  def pack(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        col("source"),
        col("n_chars")).as("meta"))

  /** STUB decoder: deterministic 8-dim feature vector seeded from the
    * content md5. A real build swaps `fakeDecode` for a codec call —
    * the batching/partitioning stays identical.
    */
  private[graft] def fakeDecode(bytes: Array[Byte]): Array[Double] = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    h.take(8).map(b => (b & 0xff) / 255.0)
  }

  /** Batched feature extraction: executors process fixed-size batches
    * inside each partition (amortizes per-batch codec setup exactly
    * like mapInPandas batches do).
    */
  def featurize(packed: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would open the codec once here
          batch.iterator.map { case (id, bytes) =>
            MediaFeatures(id, bytes.length.toLong, fakeDecode(bytes))
          }
        }
      }
  }
}
