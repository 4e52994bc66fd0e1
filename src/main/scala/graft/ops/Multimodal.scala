package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Multimodal column plumbing (SURVEY §2.13): media as opaque `binary`
  * columns with typed metadata, batch-shaped decode / feature-extract.
  *
  * The fixtures carry no real media, and this container has no image/audio
  * codecs, so — per the build contract — the DECODE step is a
  * clearly-marked deterministic fake, while everything Spark-side is real
  * and tested: the binary column, the metadata struct schema, the
  * per-partition batched UDF shape (Scala `mapPartitions`, the JVM analog
  * of `mapInPandas`: one iterator per partition, amortized per-batch
  * setup), and the partitioning.
  *
  * At 100 TB: binary payloads dominate row size, so operators project the
  * binary column away as early as possible (metadata-only plans never read
  * the blob pages in Parquet thanks to column pruning), and decode
  * parallelism = partition count, tuned with `maxPartitionBytes`.
  */
object Multimodal {

  /** Decoded-feature record produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      // STUB: a real implementation decodes the blob (image/audio) here and
      // emits model features; the container has no codecs, so features are
      // a deterministic fold of the raw bytes — the Spark plumbing (schema,
      // batching, partitioning) is identical either way.
      checksum: Long,
      width: Int,
      height: Int,
  )

  /** Attach a fake binary "media" column + metadata struct to documents —
    * the multimodal table shape (text + binary + typed metadata in one
    * row).
    */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs
      .withColumn("media", col("text").cast("binary"))
      .withColumn("media_meta", struct(
        length(col("text").cast("binary")).cast("long").as("n_bytes"),
        lit("fake/raw").as("mime"),
        (col("doc_id") % 4).cast("int").as("channel")))

  /** Batched per-partition decode: the `mapPartitions` shape a real codec
    * would use (iterator in, iterator out, per-partition init). The decode
    * itself is STUBBED deterministically from the bytes.
    */
  def decodeFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    withMediaColumns(docs)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens here (a real decoder opens its codec once)
        it.map { case (id, bytes) =>
          var acc = 0L
          var i = 0
          while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
          // STUB dimensions derived from content, stand-ins for decoded w×h
          MediaFeatures(id, bytes.length.toLong, acc, (acc % 640).toInt, (acc % 480).toInt)
        }
      }
  }

  /** Oracle-checkable metadata projection: byte length and first byte of
    * the binary column (ASCII fixture text ⇒ octet_length == length).
    */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    withMediaColumns(Sources.documents(s, d))
      .select(
        col("doc_id"),
        length(col("media")).cast("long").as("n_bytes"),
        ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"),
        col("media_meta.channel").cast("long").as("channel"),
      )
      .orderBy("doc_id")

  /** The decode pipeline as a query (fingerprint checksum is the same
    * rolling hash the oracle can compute over characters — ASCII text ⇒
    * bytes == codepoints).
    */
  def mediaDecodeStub(s: SparkSession, d: String): DataFrame = {
    val ds = decodeFeatures(s, Sources.documents(s, d))
    ds.toDF()
      .select(col("doc_id"), col("n_bytes"), col("checksum"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"))
      .orderBy("doc_id")
  }

  /** Frame sampling over a media blob: treat the payload as fixed-width
    * 16-byte "frames", keep every 4th, fingerprint each kept frame — the
    * plan shape of video frame-sampling (explode positions → slice bytes →
    * per-frame feature). A real decoder swaps the substring for codec
    * frame extraction; the distribution story is identical: one generator
    * per row, output rows ∝ sampled frames, no driver involvement. ASCII
    * fixture text ⇒ bytes == characters, which keeps it oracle-checkable.
    */
  def frameSample(s: SparkSession, d: String): DataFrame =
    Sources.documents(s, d)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(0L, (length(text) - 1) div 16)")).as("frame_id"))
      .filter(col("frame_id") % 4 === 0)
      .withColumn("frame", expr("substring(text, cast(frame_id * 16 + 1 as int), 16)"))
      .select(col("doc_id"), col("frame_id"),
        length(col("frame")).cast("long").as("frame_bytes"),
        aggregate(split(col("frame"), ""), lit(0L),
          (acc, c) => (acc * 31 + ascii(c)) % 1000000007L).as("frame_fp"))
      .orderBy("doc_id", "frame_id")

  /** Media near-dup via sampled-frame fingerprint overlap — the video/
    * audio dedup shape: two assets are candidate duplicates when a large
    * fraction of their sampled frames fingerprint identically (tolerant
    * of local edits, since only the touched frames change). Candidates
    * come from an INVERTED-INDEX equi-join on the frame fingerprint —
    * never an asset×asset comparison; fingerprints shared by more than
    * `dfCap` assets are boilerplate (intros, silence, black frames) and
    * are dropped from the index, exactly like the df cap in text
    * decontamination. Overlap = shared / min(frames), on exact integers.
    */
  def frameOverlapPairs(s: SparkSession, d: String): DataFrame = {
    val dfCap = 50
    // (doc_id, frame_id) is unique by construction; matching keys on
    // (frame_id, frame_fp) makes the overlap POSITION-ALIGNED, the
    // standard temporal-alignment assumption of video dedup
    val frames = frameSample(s, d)
      .select(col("doc_id"), col("frame_id"), col("frame_fp"))
    val counts = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"))
    val rare = frames.join(
      frames.groupBy("frame_id", "frame_fp").agg(count(lit(1)).as("df"))
        .filter(col("df") <= dfCap),
      Seq("frame_id", "frame_fp"))
    val shared = rare.select(col("doc_id").as("id_a"), col("frame_id"), col("frame_fp"))
      .join(rare.select(col("doc_id").as("id_b"), col("frame_id"), col("frame_fp")),
        Seq("frame_id", "frame_fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
    shared
      .join(counts.select(col("doc_id").as("id_a"), col("n_frames").as("nf_a")), "id_a")
      .join(counts.select(col("doc_id").as("id_b"), col("n_frames").as("nf_b")), "id_b")
      .withColumn("overlap", round(col("n_shared").cast("double") /
        least(col("nf_a"), col("nf_b")).cast("double"), 4))
      .filter(col("overlap") >= 0.5)
      .select("id_a", "id_b", "n_shared", "overlap")
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_shard_plan" -> (shardPlan _),
    "mm_media_meta" -> (mediaMeta _),
    "mm_decode_stub" -> (mediaDecodeStub _),
    "mm_frame_sample" -> (frameSample _),
    "mm_frame_overlap" -> (frameOverlapPairs _),
  )

  /** Inference shard planning (`mm_shard_plan`): within each modality
    * channel, media rows pack in doc-id order into ≤4 KiB shards by
    * exclusive running byte count — the size-balanced batch layout a
    * GPU decode/embed stage consumes (too-big batches OOM the
    * accelerator, too-small ones waste it). The running sum is a
    * PARTITIONED window (per channel), so the plan scales with channel
    * cardinality; shard id = exclusive-prefix-bytes div budget, exact
    * integers; one keyed rollup emits the per-shard manifest.
    */
  def shardPlan(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("channel").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    withMediaColumns(Sources.documents(s, d))
      .select(col("doc_id"), col("media_meta.channel").cast("long").as("channel"),
        length(col("media")).cast("long").as("n_bytes"))
      .withColumn("prev_bytes", coalesce(sum("n_bytes").over(w), lit(0L)))
      .withColumn("shard", expr("prev_bytes div 4096"))
      .groupBy("channel", "shard")
      .agg(count(lit(1)).as("n_items"), sum("n_bytes").as("bytes"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("channel", "shard")
  }

  val oracles: Map[String, String] = Map(
    "mm_shard_plan" ->
      """WITH m AS (SELECT doc_id, doc_id % 4 AS channel,
        |   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents),
        | p AS (SELECT *, coalesce(sum(n_bytes) OVER
        |   (PARTITION BY channel ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_bytes
        |  FROM m),
        | sh AS (SELECT channel, prev_bytes // 4096 AS shard, doc_id, n_bytes FROM p)
        |SELECT channel, CAST(shard AS BIGINT) AS shard, count(*) AS n_items,
        | CAST(sum(n_bytes) AS BIGINT) AS bytes,
        | CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc
        |FROM sh GROUP BY channel, shard ORDER BY channel, shard""".stripMargin,
    "mm_media_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        | CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte,
        | doc_id % 4 AS channel
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_decode_stub" ->
      """WITH f AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |  (a, b) -> (a * 31 + b) % 1000000007) AS checksum
        | FROM documents)
        |SELECT doc_id, n_bytes, checksum, checksum % 640 AS width, checksum % 480 AS height
        |FROM f ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, unnest(range(0, (length(text) - 1) // 16 + 1)) AS frame_id, text
        |  FROM documents)
        |SELECT doc_id, frame_id,
        | CAST(length(substring(text, CAST(frame_id * 16 + 1 AS INT), 16)) AS BIGINT) AS frame_bytes,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(string_split(substring(text, CAST(frame_id * 16 + 1 AS INT), 16), ''),
        |     c -> CAST(ascii(c) AS BIGINT))),
        |   (a, b) -> (a * 31 + b) % 1000000007) AS frame_fp
        |FROM f WHERE frame_id % 4 = 0 ORDER BY doc_id, frame_id""".stripMargin,
    "mm_frame_overlap" ->
      """WITH f AS (
        |  SELECT doc_id, unnest(range(0, (length(text) - 1) // 16 + 1)) AS frame_id, text
        |  FROM documents),
        | fp AS (SELECT doc_id, frame_id,
        |   list_reduce(list_prepend(CAST(0 AS BIGINT),
        |     list_transform(string_split(substring(text, CAST(frame_id * 16 + 1 AS INT), 16), ''),
        |       c -> CAST(ascii(c) AS BIGINT))),
        |     (a, b) -> (a * 31 + b) % 1000000007) AS frame_fp
        |   FROM f WHERE frame_id % 4 = 0),
        | cnt AS (SELECT doc_id, count(*) AS n_frames FROM fp GROUP BY doc_id),
        | rare AS (SELECT fp.doc_id, fp.frame_id, fp.frame_fp FROM fp JOIN (
        |   SELECT frame_id, frame_fp, count(*) AS df FROM fp
        |   GROUP BY frame_id, frame_fp) d
        |  ON fp.frame_id = d.frame_id AND fp.frame_fp = d.frame_fp AND d.df <= 50),
        | sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |   FROM rare a JOIN rare b ON a.frame_id = b.frame_id
        |    AND a.frame_fp = b.frame_fp AND a.doc_id < b.doc_id
        |   GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b, n_shared,
        | round(n_shared::DOUBLE / least(ca.n_frames, cb.n_frames), 4) AS overlap
        |FROM sh JOIN cnt ca ON sh.id_a = ca.doc_id
        | JOIN cnt cb ON sh.id_b = cb.doc_id
        |WHERE round(n_shared::DOUBLE / least(ca.n_frames, cb.n_frames), 4) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
