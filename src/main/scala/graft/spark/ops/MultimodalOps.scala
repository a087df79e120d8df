package graft.spark.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video assets ride as opaque
  * `binary` columns with typed metadata, processed in batches inside
  * `mapPartitions` (the Scala analog of a vectorized decode UDF).
  *
  * The actual codec step is a STUB — this container has no image/audio
  * libraries — but everything Spark-side is real and tested: the binary
  * column, the header layout, batch iteration, partition-preserving
  * decode, and the metadata schema. A production deployment swaps
  * [[decodeStub]] for a real decoder with the same signature.
  */
object MultimodalOps {

  val Magic = 0x494d4730 // "IMG0"

  final case class AssetMeta(vec_id: Long, width: Int, height: Int,
                             channels: Int, payload_bytes: Int, ok: Boolean)

  /** Deterministic fake asset: 16-byte header (magic, vec_id, w, h) +
    * payload derived from the embedding (4 bytes per component).
    */
  def encodeAsset(vecId: Long, label: Int, emb: Array[Float]): Array[Byte] = {
    val w = 32 + (vecId % 7).toInt * 16
    val h = 24 + (label % 5) * 12
    val bb = java.nio.ByteBuffer.allocate(20 + emb.length * 4)
    bb.putInt(Magic); bb.putLong(vecId); bb.putInt(w); bb.putInt(h)
    emb.foreach(f => bb.putFloat(f))
    bb.array()
  }

  /** STUB decoder: parses the deterministic header; a real build would
    * hand `payload` to an image library here (???-equivalent, see file
    * doc).
    */
  def decodeStub(bytes: Array[Byte]): AssetMeta = {
    if (bytes == null || bytes.length < 20) return AssetMeta(-1, 0, 0, 0, 0, ok = false)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val magic = bb.getInt()
    if (magic != Magic) return AssetMeta(-1, 0, 0, 0, 0, ok = false)
    val id = bb.getLong()
    val w = bb.getInt()
    val h = bb.getInt()
    AssetMeta(id, w, h, 3, bytes.length - 20, ok = true)
  }

  /** The synthetic assets table: (vec_id, label, asset binary). */
  def assets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[(Long, Int, Array[Float])]
      .map { case (id, label, emb) => (id, label, encodeAsset(id, label, emb)) }
      .toDF("vec_id", "label", "asset")
  }

  /** Batch decode over the binary column: partition-preserving
    * mapPartitions, one decoder instance per batch — the shape a real
    * vectorized decode would take.
    */
  def decodeMeta(assetsDf: DataFrame): DataFrame = {
    val spark = assetsDf.sparkSession
    import spark.implicits._
    assetsDf.select(col("vec_id").as("in_id"), col("asset"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (_, bytes) => decodeStub(bytes) } }
      .toDF()
  }
}
