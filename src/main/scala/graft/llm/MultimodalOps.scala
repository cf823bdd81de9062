package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (builder brief): image/audio/video payloads are
  * opaque `binary` columns with typed metadata travelling beside them.
  *
  * The decode step itself (JPEG/audio codecs) is STUBBED — the
  * container ships no media libraries — behind [[decodeStub]], a
  * deterministic fake that derives plausible metadata from the byte
  * stream. Everything AROUND the stub is real and tested: the asset
  * schema, the binary column plumbing, the partition-parallel batch
  * decode via `mapPartitions` (the Scala analog of `mapInPandas` — one
  * decoder instantiation per partition, streamed row batches, no
  * driver collect), and the frame-sampling slice.
  */
object MultimodalOps {

  /** An opaque media asset: bytes + typed metadata. */
  final case class Asset(doc_id: Long, bytes: Array[Byte], mime: String)

  /** Decoded metadata a real codec would produce. */
  final case class DecodedMeta(
      doc_id: Long, byte_size: Long, width: Int, height: Int, n_frames: Int)

  /** STUB decoder — deterministic fake standing in for a real codec
    * (e.g. javax.imageio / ffmpeg): metadata is derived from byte
    * length so tests are reproducible. Swap this body for the real
    * decode when media libraries are available. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    ((n % 64) * 16 + 16, (n % 48) * 16 + 16, n % 30 + 1)
  }

  /** Resize stub: deterministic byte-level downsample standing in for
    * an image resize — keeps every stride-th byte so output size
    * scales like a real (w/s × h/s) resize. Swap for a real scaler
    * when image libs are available. */
  def resizeStub(bytes: Array[Byte], stride: Int): Array[Byte] = {
    require(stride >= 1)
    bytes.zipWithIndex.collect { case (b, i) if i % stride == 0 => b }
  }

  /** Frame sampling stub: every k-th byte-block stands in for every
    * k-th video frame. */
  def frameSample(bytes: Array[Byte], every: Int, blockSize: Int): Array[Array[Byte]] =
    bytes.grouped(blockSize).zipWithIndex
      .collect { case (b, i) if i % every == 0 => b }.toArray

  /** Partition-parallel decode: one decoder per partition, rows
    * streamed through it — the mapInPandas-shaped seam. Never collects
    * to the driver; scales with executor count. */
  def decodeAssets(assets: Dataset[Asset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      // A real implementation would initialize the codec ONCE here
      // (per partition), then stream rows through it.
      rows.map { a =>
        val (w, h, f) = decodeStub(a.bytes)
        DecodedMeta(a.doc_id, a.bytes.length.toLong, w, h, f)
      }
    }
  }

  /** Documents rendered as binary assets (text bytes stand in for
    * media payloads — the plumbing is payload-agnostic). */
  def assetsFromDocuments(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("bytes"),
        lit("application/octet-stream").as("mime"))
      .as[Asset]
  }

  /** Oracle-checked metadata extraction over the binary column: byte
    * length, content digest, stub-decoded dimensions. The decode
    * arithmetic is mirrored in the oracle so the stub itself is
    * verified, not just the plumbing.
    *
    * The stub dimension math is pure byte-length arithmetic, so the
    * declared query uses built-in `octet_length` expressions (fully
    * codegen'd, no UDF in the plan — same formulas as [[decodeStub]],
    * which remains the body of the `mapPartitions` batch-decode seam
    * where a real codec genuinely needs opaque-bytes access). */
  private val multimodalMeta = QueryDef(
    "llm_multimodal_meta",
    (s, d) => {
      val blen = octet_length(col("text"))
      Tables.documents(s, d)
        .withColumn("asset", col("text").cast("binary"))
        .select(
          col("doc_id"),
          blen.cast("long").as("byte_size"),
          md5(col("asset")).as("content_md5"),
          lit("application/octet-stream").as("mime"),
          upper(substring(md5(col("asset")), 1, 8)).as("frame_sig"),
          ((blen % 64) * 16 + 16).cast("int").as("width"),
          ((blen % 48) * 16 + 16).cast("int").as("height"),
          (blen % 30 + 1).cast("int").as("n_frames"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_size,
              md5(text) AS content_md5,
              'application/octet-stream' AS mime,
              upper(substr(md5(text), 1, 8)) AS frame_sig,
              CAST((strlen(text) % 64) * 16 + 16 AS INTEGER) AS width,
              CAST((strlen(text) % 48) * 16 + 16 AS INTEGER) AS height,
              CAST(strlen(text) % 30 + 1 AS INTEGER) AS n_frames
            FROM documents ORDER BY doc_id"""))

  val defs: Seq[QueryDef] = Seq(multimodalMeta)
}
