package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — SURVEY.md §2 item 32.
  *
  * Images/audio/video ride through the pipeline as opaque `binary`
  * columns plus a typed metadata struct; decode/feature-extraction is a
  * per-partition batch operation. The media codecs aren't available in
  * this environment, so the decode step is a clearly-marked
  * deterministic stub ([[FakeDecoder]]); the Spark-side plumbing —
  * binary schema, metadata derivation, format sniffing, partition-wise
  * typed decode — is real and tested.
  *
  * Scale notes: payloads stay opaque until the decode stage (no
  * driver materialization; parquet stores binary natively and column
  * pruning skips payload bytes when only metadata is read). The typed
  * decode uses mapPartitions so a real codec would amortize per-batch
  * init (model load, JNI handles) exactly like a Pandas-UDF batch.
  */
object Multimodal {

  /** Magic-byte format sniff on the first 4 bytes (hex-prefix match). */
  def sniffFormat(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(hex(substring(bin, 1, 3)) === "FFD8FF", "jpeg")
      .when(hex(substring(bin, 1, 4)) === "89504E47", "png")
      .when(hex(substring(bin, 1, 4)) === "52494646", "riff-wav")
      .otherwise("raw-text")

  /** Attach a binary payload column + typed metadata to documents.
    * (The corpus has no media files; payloads are the utf-8 text bytes,
    * which exercises the identical plumbing.) */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        octet_length(encode(col("text"), "utf-8")).as("n_bytes"),
        sniffFormat(encode(col("text"), "utf-8")).as("format"),
        graft.text.TextFunctions.hash64(md5(encode(col("text"), "utf-8"))).as("checksum"))
        .as("meta"))

  /** Row type crossing the typed decode boundary. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      n_alpha: Long, n_digit: Long, n_space: Long, n_other: Long,
      mean_byte: Double)

  /** Deterministic stand-in for a real media decoder: byte-class
    * histogram + mean byte value. A production build swaps decode()
    * for an actual codec; the mapPartitions batch shape is unchanged.
    * The byte loop is [[graft.functions.ByteClassStats.stats]] — the
    * SAME compiled code the Column path's kernel runs, so the typed
    * and Column paths cannot drift. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Long, Long, Long, Long, Double) = {
      val s = graft.functions.ByteClassStats.stats(payload)
      val mean = if (payload.length == 0) 0.0 else s(4).toDouble / payload.length
      (s(0), s(1), s(2), s(3), mean)
    }
  }

  /** Partition-wise typed decode (the Scala analogue of mapInPandas:
    * one iterator per partition, per-batch codec reuse). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would init once per partition here
      rows.map { r =>
        val (a, d, s, o, m) = FakeDecoder.decode(r.payload)
        MediaFeatures(r.doc_id, r.payload.length, a, d, s, o, m)
      }
    }
  }

  /** §2.32 oracle-able feature query: identical semantics to the typed
    * decode path — in fact the same compiled byte loop, lifted into the
    * Column world as the [[graft.functions.ByteClassStats]] kernel (one
    * virtual call per row; whole-stage codegen CSE evaluates the struct
    * once for all four field reads). The earlier per-character
    * aggregate(transform(split(txt, ''))) fold was interpreted. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val withBytes = withPayload(graft.Tables.documents(spark, dir))
      .withColumn("bs", graft.functions.native.byte_class_stats(col("payload")))
    withBytes.select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.format").as("format"),
      col("meta.checksum").as("checksum"),
      col("bs.n_alpha").as("n_alpha"),
      col("bs.n_digit").as("n_digit"),
      col("bs.n_space").as("n_space"),
      round(col("bs.byte_sum").cast("double") / col("meta.n_bytes"), 6).as("mean_byte"))
      .orderBy("doc_id")
  }

  // ---- frame sampling ----
  val NFrames = 4
  val FrameBytes = 16

  /** §2.79 frame sampling: evenly-spaced fixed-size byte windows from
    * each payload (the video/audio "sample N frames" access pattern),
    * with per-frame features. All byte addressing happens on the hex
    * rendering of the payload — one portable representation that both
    * engines slice identically (DuckDB 1.0 has no BLOB substring) —
    * and offsets are exact integer arithmetic. A real pipeline swaps
    * the feature projection for a codec call per frame; the
    * explode-shape (doc × frame_idx), offset math, and partition
    * parallelism are the production plumbing. */
  def mmFrames(spark: SparkSession, dir: String): DataFrame = {
    val withBytes = withPayload(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), hex(col("payload")).as("phex"),
        col("meta.n_bytes").as("n_bytes"))
    withBytes
      .withColumn("frame_idx",
        explode(sequence(lit(0), lit(NFrames - 1))))
      // 0-based byte offset of frame i, evenly spaced over the payload;
      // short payloads degenerate to offset 0 (whole-payload frames)
      .withColumn("off_b", when(col("n_bytes") <= FrameBytes, lit(0L))
        .otherwise(expr(s"(frame_idx * (n_bytes - $FrameBytes)) div ${NFrames - 1}")))
      .withColumn("fhex",
        expr(s"substr(phex, CAST(off_b * 2 + 1 AS INT), ${FrameBytes * 2})"))
      .select(col("doc_id"), col("frame_idx"), col("off_b"),
        (length(col("fhex")) / 2).cast("long").as("frame_bytes"),
        graft.text.TextFunctions.hash64(col("fhex")).as("frame_checksum"),
        round(graft.functions.native.hex_byte_sum(col("fhex"))
          .cast("double") / (length(col("fhex")) / 2), 6).as("mean_byte"))
      .orderBy("doc_id", "frame_idx")
  }

  val mmFramesSql: String =
    s"""WITH p AS (SELECT doc_id, hex(encode(text)) AS phex,
       |    octet_length(encode(text)) AS n_bytes FROM documents),
       |f AS (SELECT doc_id, phex, n_bytes, unnest(generate_series(0, ${NFrames - 1})) AS frame_idx
       |  FROM p),
       |w AS (SELECT doc_id, frame_idx,
       |    CASE WHEN n_bytes <= $FrameBytes THEN 0
       |         ELSE (frame_idx * (n_bytes - $FrameBytes)) // ${NFrames - 1} END AS off_b,
       |    phex FROM f),
       |fr AS (SELECT doc_id, frame_idx, off_b,
       |    substr(phex, CAST(off_b * 2 + 1 AS INT), ${FrameBytes * 2}) AS fhex FROM w)
       |SELECT doc_id, frame_idx, CAST(off_b AS BIGINT) AS off_b,
       |  CAST(length(fhex) / 2 AS BIGINT) AS frame_bytes,
       |  ('0x' || substr(md5(fhex), 1, 15))::BIGINT AS frame_checksum,
       |  round(list_sum(list_transform(regexp_extract_all(fhex, '..'),
       |      p -> ('0x' || p)::INT))
       |    / CAST(length(fhex) / 2 AS DOUBLE), 6) AS mean_byte
       |FROM fr ORDER BY doc_id, frame_idx""".stripMargin

  // ---- resize ----
  val ResizeTo = 32

  /** §2.83 payload resize: nearest-neighbor downsample of the byte
    * stream to a fixed target length (the 1-D stand-in for image
    * resize — same sampling index math `src_i = floor(j·n/target)`,
    * same fixed-output-shape contract a vision preprocessor needs;
    * a real build swaps the byte gather for a codec resize). Output
    * keeps provenance (original + resized checksums) so a dedup pass
    * can run on resized artifacts. Per-row Column work on the hex
    * rendering — embarrassingly parallel, one codegen'd scan. */
  def mmResize(spark: SparkSession, dir: String): DataFrame = {
    val withBytes = withPayload(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), hex(col("payload")).as("phex"),
        col("meta.n_bytes").as("n_bytes"))
    withBytes
      // gather byte j from source index floor(j*n/target), j=0..target-1;
      // payloads shorter than the target repeat bytes (upsample), same
      // rule — one compiled gather per row (native HexResize kernel)
      .withColumn("rhex", graft.functions.native.hex_resize(col("phex"), ResizeTo))
      .select(col("doc_id"), col("n_bytes"),
        lit(ResizeTo).as("resized_bytes"),
        graft.text.TextFunctions.hash64(col("phex")).as("orig_checksum"),
        graft.text.TextFunctions.hash64(col("rhex")).as("resized_checksum"),
        round(graft.functions.native.hex_byte_sum(col("rhex"))
          .cast("double") / ResizeTo, 6).as("resized_mean_byte"))
      .orderBy("doc_id")
  }

  val mmResizeSql: String =
    s"""WITH p AS (SELECT doc_id, hex(encode(text)) AS phex,
       |    octet_length(encode(text)) AS n_bytes FROM documents),
       |r AS (SELECT doc_id, n_bytes,
       |    list_aggregate(list_transform(generate_series(0, ${ResizeTo - 1}),
       |      j -> substr(phex, CAST((j * n_bytes // $ResizeTo) * 2 + 1 AS INT), 2)),
       |      'string_agg', '') AS rhex,
       |    phex FROM p)
       |SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes,
       |  $ResizeTo AS resized_bytes,
       |  ('0x' || substr(md5(phex), 1, 15))::BIGINT AS orig_checksum,
       |  ('0x' || substr(md5(rhex), 1, 15))::BIGINT AS resized_checksum,
       |  round(list_sum(list_transform(regexp_extract_all(rhex, '..'),
       |      p -> ('0x' || p)::INT)) / CAST($ResizeTo AS DOUBLE), 6) AS resized_mean_byte
       |FROM r ORDER BY doc_id""".stripMargin

  // ---- perceptual-hash dedup ----
  /** pHash signature width = its own thumbnail size (48 bytes → 48
    * bits; decoupled from mm_resize's 32 — signature width must scale
    * ~2·log₂(n) to keep unrelated-pair collisions flat, same analysis
    * as dedup_simhash's SimBits) and chunk layout for blocking:
    * 4 chunks × 12 bits. Pigeonhole: two signatures within Hamming
    * distance [[MaxHamming]] (< 4) share at least one exact chunk, so
    * the chunk equi-join finds EVERY qualifying pair — no all-pairs
    * comparison. 12-bit chunks (4096 values) keep bucket populations
    * ~16× smaller than byte chunks on these low-entropy thumbnails. */
  val PHashBits = 48
  val PHashChunks = 4
  val PHashChunkBits = 12
  val MaxHamming = 3
  // The pigeonhole guarantee is only sound while (a) the chunk layout
  // covers every bit HexPHash can set (min(PHashBits, 63) signature
  // bits) and (b) MaxHamming < PHashChunks. If PHashBits is ever
  // raised past chunk coverage, bits above it would contribute Hamming
  // distance but not blocking — silently missed pairs.
  require(PHashChunks * PHashChunkBits >= math.min(PHashBits, 63) &&
      MaxHamming < PHashChunks,
    s"mm_dedup blocking unsound: $PHashChunks chunks x $PHashChunkBits bits must " +
      s"cover min(PHashBits=$PHashBits, 63) signature bits and MaxHamming=$MaxHamming < chunks")

  /** §2.102 multimodal near-dup detection: payload → fixed-size
    * nearest-neighbor resize → perceptual fingerprint (bit j = byte j
    * above the mean) → chunk-blocked Hamming join. This is the image
    * dedup shape (aHash over a downsampled thumbnail) running on the
    * opaque binary column; a real build swaps the resize for a codec
    * thumbnail and keeps the fingerprint/blocking unchanged. All
    * per-row work is compiled kernels (HexResize, HexPHash); the only
    * shuffle is the chunk equi-join. */
  def mmDedup(spark: SparkSession, dir: String): DataFrame = {
    val sigs = withPayload(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), hex(col("payload")).as("phex"))
      .withColumn("rhex", graft.functions.native.hex_resize(col("phex"), PHashBits))
      .withColumn("ph", graft.functions.native.hex_phash(col("rhex")))
      .select(col("doc_id"), col("ph").as("sig"))
    // shared blocking engine (graft.dedup.ChunkBlocking): round-13
    // distinct-signature collapse (aHash values are low-entropy and
    // heavily repeated — bytes straddle the mean — so the join runs on
    // signature entropy, not corpus size) + recursive hot-bucket
    // splitting on the bits outside the agreed prefix
    graft.dedup.ChunkBlocking.pairs(sigs, PHashBits, PHashChunkBits,
        PHashChunks, MaxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  val mmDedupSql: String =
    s"""WITH p AS (SELECT doc_id, hex(encode(text)) AS phex,
       |    octet_length(encode(text)) AS n_bytes FROM documents),
       |r AS (SELECT doc_id,
       |    list_transform(regexp_extract_all(
       |      list_aggregate(list_transform(generate_series(0, ${PHashBits - 1}),
       |        j -> substr(phex, CAST((j * n_bytes // $PHashBits) * 2 + 1 AS INT), 2)),
       |        'string_agg', ''), '..'),
       |      b -> ('0x' || b)::INT) AS bytes
       |  FROM p),
       |s AS (SELECT doc_id,
       |    CAST(coalesce(list_sum(list_transform(generate_series(1, $PHashBits),
       |      j -> CASE WHEN bytes[j] > list_sum(bytes) / ${PHashBits}.0
       |           THEN (CAST(1 AS BIGINT) << (j - 1)) ELSE 0 END)), 0) AS BIGINT) AS ph
       |  FROM r),
       |ch AS (SELECT doc_id, ph, c, (ph >> ($PHashChunkBits * c)) % ${1 << PHashChunkBits} AS chunk
       |  FROM s, unnest(generate_series(0, ${PHashChunks - 1})) AS u(c)),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
       |  FROM ch a JOIN ch b ON a.c = b.c AND a.chunk = b.chunk
       |    AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b, hamming FROM pairs
       |WHERE hamming <= $MaxHamming ORDER BY id_a, id_b""".stripMargin

  val mmFeaturesSql: String = {
    val payload = "encode(text)" // DuckDB: VARCHAR -> BLOB (utf-8)
    // byte semantics (not characters) to mirror the ByteClassStats
    // kernel exactly; byte values come from the hex rendering (DuckDB
    // 1.0 has no BLOB subscript)
    s"""WITH b AS (SELECT doc_id, text,
       |    list_transform(regexp_extract_all(hex($payload), '..'),
       |      p -> ('0x' || p)::INT) AS bytes
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(bytes) AS INT) AS n_bytes,
       |  CASE WHEN substr(hex(encode(text)), 1, 6) = 'FFD8FF' THEN 'jpeg'
       |       WHEN substr(hex(encode(text)), 1, 8) = '89504E47' THEN 'png'
       |       WHEN substr(hex(encode(text)), 1, 8) = '52494646' THEN 'riff-wav'
       |       ELSE 'raw-text' END AS format,
       |  ('0x' || substr(md5(md5(text)), 1, 15))::BIGINT AS checksum,
       |  CAST(len(list_filter(bytes, x -> (x >= 65 AND x <= 90) OR (x >= 97 AND x <= 122))) AS BIGINT) AS n_alpha,
       |  CAST(len(list_filter(bytes, x -> x >= 48 AND x <= 57)) AS BIGINT) AS n_digit,
       |  CAST(len(list_filter(bytes, x -> x = 32)) AS BIGINT) AS n_space,
       |  round(list_sum(bytes) / CAST(len(bytes) AS DOUBLE), 6) AS mean_byte
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** Target tar-archive bytes per shard for [[mmShardPlan]]. A knob:
    * WebDataset deployments use 100 MB–1 GB; the test corpus uses a
    * value that yields several shards per source. */
  val MmShardTargetBytes = 8192L

  /** §2.299 `mm_shard_plan`: WebDataset-style tar-shard packing plan
    * for the multimodal payloads — per source, members in doc_id
    * order packed greedily into ~[[MmShardTargetBytes]] archives by
    * CUMULATIVE TAR SIZE, where each member costs its real tar
    * footprint (one 512-byte header + payload padded up to a 512
    * multiple) and each archive ends with the mandatory two zero
    * blocks. §2.275 plans text shards by characters; training on
    * binary media ships tar shards (sequential reads, no per-sample
    * open cost), and THIS is the byte-exact plan the packer executes
    * at 100 TB — file counts and boundaries decided before a byte
    * moves.
    *
    * Scale shape: payload bytes come from the metadata struct ONLY
    * (parquet column pruning skips the binary payloads — the §3 note;
    * the plan pass never reads media). One hash exchange on source,
    * per-source sequential window, shard-grain output.
    *
    * Determinism: all-integer — the tar footprint is
    * 512 + 512·((n_bytes + 511) div 512). */
  def mmShardPlan(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    graft.Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"),
        octet_length(encode(col("text"), "utf-8")).cast("long")
          .as("n_bytes"))
      .withColumn("tar_bytes",
        expr("512 + 512 * ((n_bytes + 511) div 512)"))
      .withColumn("cum", sum("tar_bytes").over(w))
      .withColumn("shard_id", expr(s"(cum - 1) div $MmShardTargetBytes"))
      .groupBy("source", "shard_id")
      .agg(count(lit(1)).as("n_members"),
        sum("n_bytes").as("payload_bytes"),
        (sum("tar_bytes") + 1024L).as("archive_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "shard_id")
  }

  val mmShardPlanSql: String =
    s"""WITH m AS (SELECT source, doc_id,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |    512 + 512 * ((CAST(octet_length(encode(text)) AS BIGINT) + 511)
       |      // 512) AS tar_bytes
       |  FROM documents),
       |cum AS (SELECT source, doc_id, n_bytes, tar_bytes,
       |    CAST(sum(tar_bytes) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum
       |  FROM m)
       |SELECT source, (cum - 1) // $MmShardTargetBytes AS shard_id,
       |  count(*) AS n_members,
       |  CAST(sum(n_bytes) AS BIGINT) AS payload_bytes,
       |  CAST(sum(tar_bytes) + 1024 AS BIGINT) AS archive_bytes,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM cum GROUP BY 1, 2
       |ORDER BY source, shard_id""".stripMargin
}
