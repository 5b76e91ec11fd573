package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing: media as opaque BinaryType payloads with a
  * typed metadata struct, and a batched per-partition decode/feature
  * pipeline.
  *
  * The corpus has no real media files, so payloads are derived
  * deterministically from document text (UTF-8 bytes) and the decoder is
  * a clearly-marked STUB — but every piece of Spark plumbing is real and
  * is the part that matters at 100 TB:
  *   - schema: (id, payload BINARY, meta STRUCT<format,width,height>)
  *   - `mapPartitions` batch iteration (the Scala analogue of
  *     `mapInPandas`: the decoder amortizes model/codec init once per
  *     partition, then streams rows — the exact shape a real
  *     image/audio decoder needs)
  *   - feature output as ArrayType(FloatType), ready for the
  *     [[Similarity]] operators downstream
  */
object Multimodal {

  /** Typed media row (payload + metadata) and its feature output. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte],
      format: String, width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      format: String, feature: Array[Float], checksum: Long)

  /** STUB decoder — stands in for an image/audio codec (not available in
    * this environment). Deterministic: "features" are a 16-bin byte
    * histogram normalized by length; checksum is a polynomial byte hash.
    * A real deployment swaps only this function body (signature and
    * batching stay). */
  private def stubDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // per-partition init would happen here (codec handles, model weights…)
    rows.map { r =>
      val hist = new Array[Float](16)
      var check = 1125899906842597L
      var i = 0
      while (i < r.payload.length) {
        val b = r.payload(i) & 0xFF
        hist(b % 16) += 1f
        check = check * 31 + b
        i += 1
      }
      val n = math.max(r.payload.length, 1).toFloat
      MediaFeatures(r.doc_id, r.payload.length, r.format,
        hist.map(_ / n), check)
    }
  }

  /** Build the media table: binary payload + metadata struct. The
    * payload/meta derivation is oracle-checkable SQL (octet lengths). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          lit("text/plain").as("format"),
          (col("n_chars") % 640).cast(IntegerType).as("width"),
          (col("n_chars") % 480).cast(IntegerType).as("height")).as("meta"))

  /** Oracle-checked plumbing: payload byte accounting. */
  def m01_multimodal_bytes(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"))
      .orderBy(col("doc_id"))

  /** The decode/feature-extract pipeline. FULL DuckDB oracle since r20
    * (was rows-only r3–r19, VERDICT r19 next #7): the stub decoder is
    * deterministic byte arithmetic, so the oracle recomputes it from
    * first principles — the byte-histogram bin as a codepoint filter
    * (payloads are UTF-8 of ASCII text, LENGTH = OCTET_LENGTH corpus-
    * wide, so ORD(char) IS the byte), the f0 bin share as a true
    * float32 division (DuckDB FLOAT/FLOAT is binary32 — verified
    * 1f/3f = 0.3333333432674408), and the ×31 polynomial checksum as
    * the HUGEINT mod-2^64 fold (the u02/d02 precedent). A REAL codec
    * swapped into stubDecode's body would of course not be
    * SQL-expressible — what the oracle pins is the mapPartitions
    * plumbing: batching, schema, row alignment, and that the decode
    * ran exactly once per row. MultimodalSpec asserts feature shape +
    * determinism. */
  def m02_multimodal_features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"))
      .as[MediaRow]
    media.mapPartitions(stubDecode)
      .toDF()
      .select(col("doc_id"), col("n_bytes"), col("format"),
        size(col("feature")).as("feature_dim"),
        element_at(col("feature"), 1).cast(DoubleType).as("f0"),
        col("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Frame sampling — the video-shaped access pattern: treat the payload
    * as fixed-size 256-byte frames, keep every 4th, slice the frame
    * bytes out of the BLOB. Pure per-row arithmetic + binary substring
    * (both fully oracle-checkable, down to the sliced bytes): at 100 TB
    * the explode multiplies rows INSIDE the scan stage and the sliced
    * frames are the only bytes that survive projection — no shuffle, and
    * column pruning drops the full payload right after the slice. */
  def m03_frame_sample(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .withColumn("n_frames",
        ceil(octet_length(col("payload")) / lit(256.0)).cast(IntegerType))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("payload").substr(col("frame_idx") * 256 + 1, lit(256)).as("frame"))
      // frame content exported as hex: DuckDB can neither SUBSTRING nor
      // slice a BLOB, but hex strings compare byte-for-byte at 2× offset
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        hex(col("frame")).as("frame_hex"),
        octet_length(col("frame")).as("frame_bytes"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Content-addressable dedup of binary payloads — d01's exact dedup
    * re-expressed over the media column: group by payload digest, keep
    * the first doc, count copies. This is the storage layout every
    * multimodal corpus converges on (payloads stored once under their
    * hash; documents reference digests) — the groupBy ships 32-byte
    * digests, never payload bytes. */
  def m04_binary_dedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .groupBy(sha2(col("payload"), 256).as("payload_sha"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        min(octet_length(col("payload"))).as("n_bytes"))
      .orderBy(col("keep_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m04_binary_dedup" -> (m04_binary_dedup _),
    "m01_multimodal_bytes" -> (m01_multimodal_bytes _),
    "m02_multimodal_features" -> (m02_multimodal_features _),
    "m03_frame_sample" -> (m03_frame_sample _))

  val oracle: Map[String, String] = Map(
    "m02_multimodal_features" ->
      """WITH f AS (
        |  SELECT doc_id, LENGTH(text) AS n_bytes,
        |    GREATEST(LENGTH(text), 1) AS n,
        |    LEN(LIST_FILTER(RANGE(1, LENGTH(text) + 1),
        |      i -> ORD(SUBSTRING(text, CAST(i AS INT), 1)) % 16 = 0)) AS h0,
        |    LIST_REDUCE(LIST_PREPEND(1125899906842597::HUGEINT,
        |      LIST_TRANSFORM(RANGE(1, LENGTH(text) + 1),
        |        i -> CAST(ORD(SUBSTRING(text, CAST(i AS INT), 1)) AS HUGEINT))),
        |      (x, b) -> (x * 31 + b) % 18446744073709551616::HUGEINT) AS ck
        |  FROM documents)
        |SELECT doc_id, n_bytes, 'text/plain' AS format, 16 AS feature_dim,
        |  CAST(CAST(h0 AS FLOAT) / CAST(n AS FLOAT) AS DOUBLE) AS f0,
        |  CAST(CASE WHEN ck >= 9223372036854775808::HUGEINT
        |    THEN ck - 18446744073709551616::HUGEINT ELSE ck END AS BIGINT) AS checksum
        |FROM f ORDER BY doc_id""".stripMargin,
    "m04_binary_dedup" ->
      """SELECT SHA256(text) AS payload_sha,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
        |  CAST(MIN(OCTET_LENGTH(ENCODE(text))) AS INT) AS n_bytes
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "m03_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, ENCODE(text) AS payload,
        |    CAST(CEIL(OCTET_LENGTH(ENCODE(text)) / 256.0) AS INT) AS n_frames
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, payload, n_frames, CAST(i AS INT) AS frame_idx
        |  FROM m, UNNEST(RANGE(0, n_frames)) t(i)
        |  WHERE n_frames > 0 AND i % 4 = 0)
        |SELECT doc_id, frame_idx, n_frames,
        |  SUBSTRING(HEX(payload), frame_idx * 512 + 1, 512) AS frame_hex,
        |  CAST(LENGTH(SUBSTRING(HEX(payload), frame_idx * 512 + 1, 512)) // 2 AS INT) AS frame_bytes
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "m01_multimodal_bytes" ->
      """SELECT doc_id,
        |  OCTET_LENGTH(ENCODE(text)) AS n_bytes,
        |  'text/plain' AS format,
        |  CAST(n_chars % 640 AS INT) AS width,
        |  CAST(n_chars % 480 AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin)
}
