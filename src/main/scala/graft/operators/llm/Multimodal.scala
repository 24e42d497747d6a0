package graft.operators.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the
  * pipeline as opaque `binary` payloads with a typed metadata struct;
  * decode/feature-extraction runs per-partition so a real decoder would
  * amortize its init cost (model load, codec setup) across a partition.
  *
  * The actual byte->pixels/samples decode is STUBBED with a deterministic
  * fake (this container has no image/audio libraries): `FakeDecoder`
  * derives a fixed-length feature vector from the bytes alone. Everything
  * around it — schema, encoders, partition mapping, batch shape — is the
  * real Spark plumbing a production decoder would drop into.
  *
  * Scale notes: payload bytes never shuffle in the feature path (features
  * are computed in the scan stage / map partition that read them);
  * metadata-only queries prune the binary column at the parquet reader.
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String, // "image" | "audio" | "video" | "text"
      payload: Array[Byte],
      width: Int,
      height: Int,
      durationMs: Long)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Array[Float])

  /** Deterministic fake decoder: stands in for an image/audio decode +
    * feature extraction. Produces `dims` floats from a rolling byte
    * hash — stable across runs/JVMs, so tests can assert exact values.
    * A real implementation replaces ONLY this object.
    */
  object FakeDecoder {
    def features(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      var h = 1125899906842597L // large prime seed
      var i = 0
      while (i < payload.length) {
        h = 31L * h + (payload(i) & 0xff)
        out(i % dims) += ((h % 1000L) / 1000.0f)
        i += 1
      }
      out
    }
  }

  /** Wrap a text table as media records (payload = UTF-8 bytes) — the
    * fixture path for exercising the plumbing without binary fixtures.
    */
  def fromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        lit("text").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(0L).as("durationMs"))
      .as[MediaRecord]
  }

  /** Per-partition decode + featurize. `mapPartitions` (not `map`) is
    * deliberate: a real decoder initializes once per partition here.
    */
  def featurize(media: Dataset[MediaRecord], dims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real decoder init would go here, once per partition
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          FakeDecoder.features(m.payload, dims))
      }
    }
  }

  /** Resize/downsample stub: keeps every `factor`-th payload byte
    * (stand-in for image resize / audio resample). Same shape as
    * [[featurize]]: a real codec initializes once per partition and
    * replaces the byte-decimation loop. O(n) bytes per row, no per-byte
    * object churn; the resize happens in the map partition that read the
    * bytes, so only the REDUCED payload flows downstream — the property
    * that matters when the operator feeds a shuffle.
    */
  def resize(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    require(factor >= 1, "factor must be >= 1")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real codec init would go here, once per partition
      it.map { m =>
        val out = new Array[Byte]((m.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = m.payload(i * factor); i += 1 }
        m.copy(payload = out)
      }
    }
  }

  /** Frame/segment sampling stub: slices the payload into `k` evenly
    * spaced windows (stand-in for video frame extraction). Pure
    * expression — no UDF, no shuffle.
    */
  def sampleSegments(payload: org.apache.spark.sql.Column, k: Int, segLen: Int) =
    transform(
      sequence(lit(0), lit(k - 1)),
      i =>
        // SQL substring: the Scala helper only takes Int offsets
        call_function(
          "substring",
          payload,
          (i * greatest((length(payload) - segLen) / lit(math.max(k - 1, 1)), lit(1)) + 1)
            .cast("int"),
          lit(segLen)))
}
