package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.util.Det

/** Multimodal-column operator family: image/audio/video payloads as opaque
  * `binary` columns with typed metadata structs, plus per-partition batch
  * "decode"/feature-extraction plumbing.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB (see [[MediaStub]]); everything
  * Spark-side — binary column handling, metadata schema, partition-batched
  * UDF shape, feature schema — is real and tested. Swapping the stub for a
  * JNI/codec call changes one function.
  *
  * Scale: media payloads dominate row size, so the rule at 100 TB is:
  * never shuffle the binary column. Metadata-only projections run first
  * (column pruning keeps bytes out of the scan when unused), and
  * feature-extraction is mapPartitions — per-partition batching, no
  * driver involvement, no shuffle.
  */
object MultimodalQueries {

  /** Media metadata extraction over binary payloads (documents.text encoded
    * as UTF-8 bytes stands in for image bytes): byte length, magic-prefix
    * hex, content checksum, and a metadata struct. All deterministic
    * expressions → fully oracled.
    *
    * CONTRACT: ASCII input only (like [[graft.util.Det.polyHash]]). The
    * magic-prefix mirror takes 8 BYTES here (substring over binary) but 8
    * CHARS in the DuckDB SQL (substring over VARCHAR, then cast) — byte ==
    * char only on single-byte text. The driver testdata is pure ASCII; for
    * multi-byte payloads, mirror by slicing the BLOB on the SQL side too.
    */
  private def q65(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        struct(col("source").as("origin"), col("lang").as("tag")).as("meta"))
      .select(col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        lower(hex(substring(col("payload"), 1, 8))).as("magic_hex"),
        Det.polyHash(col("payload").cast("string")).as("checksum"),
        col("meta.origin").as("origin"))
      .orderBy("doc_id")

  private val q65Sql =
    s"""SELECT doc_id,
       |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       |  lower(hex(CAST(substring(text, 1, 8) AS BLOB))) AS magic_hex,
       |  ${Det.polyHashSql("text")} AS checksum,
       |  source AS origin
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Partition-batched media decode + feature extraction: the
    * `mapInPandas`-shaped path (iterator of batches in, iterator of
    * batches out) as Scala `mapPartitions` over a typed Dataset. The
    * decode kernel is [[MediaStub.decode]] — STUB. Deterministic, but the
    * decode semantics aren't SQL — rows-only check + MultimodalSpec.
    */
  private def q66(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // per-partition batch processing: one decoder instance per
        // partition (the expensive-init shape real codecs need)
        val decoder = new MediaStub
        batch.map { case (id, bytes) =>
          val f = decoder.decode(bytes)
          (id, f.width, f.height, f.nFrames, f.meanLuma)
        }
      }
      .toDF("doc_id", "width", "height", "n_frames", "mean_luma")
      .orderBy("doc_id")
  }

  /** Resize + frame-sampling plumbing (the remaining two kernels of the
    * multimodal mandate): decode → resize to a 32×32 thumbnail → sample
    * every-k-th frame, all inside ONE mapPartitions pass so payload bytes
    * never cross an operator boundary (at 100 TB the binary column is the
    * row; one pass per partition is the only affordable shape). Frame rows
    * are emitted with flatMap — one output row per sampled frame, the
    * UDTF-shaped batch contract `mapInPandas` uses. Kernels are STUBS
    * ([[MediaStub.resize]]/[[MediaStub.sampleFrames]]); schema, batching,
    * and flatten plumbing are real. Deterministic → rows + MultimodalSpec.
    */
  private def q67(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val decoder = new MediaStub
        batch.flatMap { case (id, bytes) =>
          val f = decoder.decode(bytes)
          val (tw, th) = decoder.resize(f.width, f.height, 32)
          decoder.sampleFrames(f.nFrames, every = 2).map { frameIdx =>
            (id, frameIdx, tw, th, decoder.frameChecksum(bytes, frameIdx))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "thumb_w", "thumb_h", "frame_checksum")
      .orderBy("doc_id", "frame_idx")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q65_media_meta", q65, Some(q65Sql), "binary payload + metadata projection"),
    QueryDef("q66_media_decode", q66, None, "mapPartitions batched decode (STUB kernel)"),
    QueryDef("q67_media_frames", q67, None, "one-pass resize + frame-sample flatMap (STUB kernels)"))
}

/** STUB media decoder — the container ships no image/audio libraries
  * (builder prompt), so this produces deterministic fake features derived
  * from the payload bytes. The partition-batched call shape, schemas, and
  * typed Dataset plumbing around it are the real engineering surface; a
  * production build replaces `decode` with an actual codec.
  */
object MediaStub {
  final case class Features(width: Int, height: Int, nFrames: Int, meanLuma: Double)
}

final class MediaStub {
  import MediaStub.Features

  def decode(payload: Array[Byte]): Features = {
    val n = payload.length
    // ??? real codec goes here — deterministic fake derived from bytes:
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    Features(
      width = 64 + (n % 577),
      height = 64 + (n % 433),
      nFrames = 1 + (n % 7),
      meanLuma = (sum % 25600L).toDouble / 100.0)
  }

  /** Aspect-preserving thumbnail dimensions (integer math; a real build
    * would also produce the resampled pixels — ??? stub).
    */
  def resize(w: Int, h: Int, maxSide: Int): (Int, Int) =
    if (w >= h) (maxSide, math.max(1, h * maxSide / w))
    else (math.max(1, w * maxSide / h), maxSide)

  /** Every-k-th frame indices (0-based), always including frame 0. */
  def sampleFrames(nFrames: Int, every: Int): Seq[Int] =
    (0 until nFrames by every)

  /** Deterministic per-frame checksum stand-in for "decode frame i and
    * hash it" (??? real frame extraction goes here).
    */
  def frameChecksum(payload: Array[Byte], frameIdx: Int): Long =
    payload.foldLeft(7L + frameIdx)((a, b) => (a * 31 + (b & 0xff)) % 1000000007L)
}
