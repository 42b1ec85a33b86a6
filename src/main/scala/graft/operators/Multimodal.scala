package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextUtil

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode/feature steps run as
  * batched per-partition transforms (the Scala analogue of `mapInPandas`).
  *
  * The actual media decoding is STUBBED — no image/audio codecs ship in
  * this environment — with a deterministic fake derived from the payload
  * hash. The Spark-side plumbing (schema, batching, partitioning, typed
  * boundaries) is real and is what the operator exercises.
  */
object Multimodal {

  case class Asset(asset_id: Long, payload: Array[Byte], media_type: String)
  case class AssetMeta(
      asset_id: Long,
      n_bytes: Int,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int)
  case class AssetFeature(asset_id: Long, feature: Array[Float])

  /** STUB decoder: deterministic fake dimensions from the payload hash.
    * A real deployment swaps this for an image/audio codec; the signature
    * (bytes in, typed metadata out, executed per partition in batches) is
    * the contract that stays. */
  private[operators] def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val h = TextUtil.hash64(payload)
    val width = 64 + (math.abs(h % 1024)).toInt
    val height = 64 + (math.abs((h >> 10) % 1024)).toInt
    val frames = 1 + (math.abs((h >> 20) % 32)).toInt
    (width, height, frames)
  }

  /** Wrap a text table as fake binary assets (payload = UTF-8 bytes). */
  def asAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("asset_id"),
      col(textCol).cast(BinaryType).as("payload"),
      concat(lit("image/fake-"), pmod(col(idCol), lit(3)).cast(StringType))
        .as("media_type"))

  /** Batched per-partition decode: binary payload -> typed metadata.
    * Runs as `mapPartitions` over the typed Dataset — one JVM-side batch
    * loop per partition, no per-row task overhead, no shuffle. */
  def decodeMetadata(assets: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val (w, h, f) = decodeStub(a.payload)
        AssetMeta(a.asset_id, a.payload.length, a.media_type, w, h, f)
      }
    }.toDF()
  }

  /** STUB feature extraction: fixed-width float feature from payload bytes
    * (hash-seeded). Real deployments replace the body with a model call;
    * batch shape (partition iterator -> fixed-dim vectors) is the contract. */
  def extractFeatures(assets: DataFrame, dim: Int = 16)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val h = TextUtil.hash64(a.payload)
        val feat = Array.tabulate(dim) { i =>
          val x = TextUtil.hash64(s"feat-$h-$i")
          (x.toDouble / Long.MaxValue.toDouble).toFloat
        }
        AssetFeature(a.asset_id, feat)
      }
    }.toDF()
  }

  /** Frame sampling stub for video-like payloads: emits every k-th "frame"
    * index with a per-frame payload slice — demonstrates the 1-to-N typed
    * flatMap shape used for real frame extraction. */
  def sampleFrames(assets: DataFrame, everyK: Int = 8)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.as[Asset].flatMap { a =>
      val (_, _, frames) = decodeStub(a.payload)
      (0 until frames by everyK).map { fi =>
        (a.asset_id, fi, TextUtil.hash64(s"frame-${a.asset_id}-$fi"))
      }
    }.toDF("asset_id", "frame_index", "frame_hash")
  }
}
