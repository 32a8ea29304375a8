package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: payloads (image/audio/video) travel as
  * `binary` columns with typed metadata, and decode/feature-extract
  * runs as a *batched* per-partition stage — the Scala analogue of
  * mapInPandas: one iterator in, one iterator out, no per-row
  * interpreter round trips, schema declared up front.
  *
  * The codecs themselves are STUBBED (no image/audio libraries in
  * this container): [[StubDecoder.decode]] derives deterministic
  * features from the raw bytes. A real deployment swaps only that
  * function; the Spark plumbing — binary column, batch iterator,
  * output schema, partition-preserving shape — is exactly what ships.
  */
object Binary {

  /** One decoded record: byte length and leading byte (the shape a
    * real decoder would extend with width/height/duration/...). */
  final case class Decoded(doc_id: Long, n_bytes: Int, first_byte: Int)

  object StubDecoder {
    /** Deterministic stand-in for an image/audio decode. */
    def decode(docId: Long, payload: Array[Byte]): Decoded =
      Decoded(docId, payload.length,
        if (payload.isEmpty) -1 else payload(0) & 0xFF)
  }

  /** Batched decode over (doc_id, payload) — the mapInPandas shape. */
  def decodeBatch(s: SparkSession, payloads: DataFrame): Dataset[Decoded] = {
    import s.implicits._
    payloads.select(col("doc_id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition init happens here (codec handles, model load)
        batch.map { case (id, bytes) => StubDecoder.decode(id, bytes) }
      }
  }
}
