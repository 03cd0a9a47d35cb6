package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column processing: typed, partition-wise decode of
  * opaque media payloads (M7 extension).
  *
  * Container reality: no image/audio codecs are installed, so `decode` is a
  * DETERMINISTIC STUB (md5-derived metadata — clearly marked). What's real
  * and load-bearing is the Spark-side contract a 100 TB media pipeline
  * needs:
  *  - payloads travel as `binary` columns with typed metadata structs;
  *  - decode runs per PARTITION (`mapPartitions`), so an expensive codec
  *    would amortize per-partition init (model load, JNI context) exactly
  *    like a Pandas-UDF `mapInPandas` batch — one init per batch, not per
  *    row;
  *  - frame sampling explodes bounded (≤3) frames per asset, keeping the
  *    row amplification constant.
  */
object Multimodal {

  case class Asset(doc_id: Long, payload: Array[Byte])
  case class Decoded(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                     frames: Int, frame_idx: Int, frame_fp: String)

  /** STUBBED codec: metadata derived from md5 of the payload. A real
    * implementation would swap `decodeOne` for the codec call; nothing
    * else changes. */
  private def decodeOne(a: Asset, md: java.security.MessageDigest): Seq[Decoded] = {
    md.reset()
    val hex = md.digest(a.payload).map("%02x".format(_)).mkString
    val width = (java.lang.Long.parseLong(hex.substring(0, 4), 16) % 320 + 16).toInt
    val height = (java.lang.Long.parseLong(hex.substring(4, 8), 16) % 240 + 16).toInt
    val frames = (java.lang.Long.parseLong(hex.substring(8, 10), 16) % 8 + 1).toInt
    (0 until math.min(frames, 3)).map { k =>
      val fmd = java.security.MessageDigest.getInstance("MD5")
      val ffp = fmd.digest(s"${hex}_$k".getBytes("UTF-8")).map("%02x".format(_)).mkString
      Decoded(a.doc_id, a.payload.length, width, height, frames, k, ffp)
    }
  }

  /** Partition-wise decode: one MessageDigest ("codec context") per
    * partition, streamed over the partition's assets. */
  def decodeFrames(spark: SparkSession, assets: DataFrame): Dataset[Decoded] = {
    import spark.implicits._
    assets.select(col("doc_id").cast("long").as("doc_id"), col("payload")).as[Asset]
      .mapPartitions { it =>
        val codec = java.security.MessageDigest.getInstance("MD5") // per-partition init
        // a null payload decodes to nothing (mirrors the SQL path, where
        // md5(NULL) yields NULL metadata that the frame filter drops)
        it.filter(_.payload != null).flatMap(a => decodeOne(a, codec))
      }
  }
}
