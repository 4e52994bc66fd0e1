package graft.io

import java.io.File
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted model tables — the production lifecycle for trained
  * artifacts (PQ codebooks, IVF centroids, near-dup group assignments):
  * TRAIN ONCE, WRITE a versioned parquet model table, and SERVE every
  * later query — in this session or a completely fresh one — by READING
  * the table back. Process-lifetime memoization ([[Materialized]],
  * `Similarity.pqModels`) still avoids re-reading within a session, but
  * the source of truth is the table on disk, exactly as a 100 TB
  * deployment versions its model artifacts next to the data.
  *
  * Layout: `<root>/<kind>/<key>` where key hashes (source path, shape,
  * format version). Every table carries `model_version` (the shape
  * descriptor) and `source` (the snapshot it was trained from) columns,
  * so a table found on disk is self-describing. `formatVersion` is part
  * of the key: bump it when training semantics change so stale tables
  * from older code can never serve.
  *
  * Writes are two-phase (unique temp dir, then a verified rename) so a
  * concurrent writer race resolves to one winner and a reader never sees
  * a partial table — the same swap discipline as [[Sinks.compact]].
  */
object ModelStore {

  /** Format version baked into every table key — bump on any change to
    * training/grouping semantics.
    */
  private val formatVersion = "mv1"

  def root: String = sys.env.getOrElse("GRAFT_MODEL_DIR",
    sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/") + "/graft-models")

  /** Snapshot fingerprint of the source data: (path, size, mtime) of every
    * file under it. A model table keyed on the fingerprint can never serve
    * a source whose data changed in place — the key changes with the data,
    * so the store retrains instead of serving stale artifacts. One
    * recursive listing, no data read.
    */
  private def fingerprint(source: String): String = {
    def walk(f: File): Seq[String] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(s"${f.getPath}:${f.length}:${f.lastModified}")
    val f = new File(source)
    if (f.exists()) walk(f).mkString(",") else ""
  }

  private def keyOf(source: String, shape: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$formatVersion|$source|${fingerprint(source)}|$shape".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

  private[graft] def dirFor(kind: String, source: String, shape: String): File =
    new File(s"$root/$kind/${keyOf(source, shape)}")

  /** A table is complete iff its committed `_SUCCESS` marker exists
    * (the rename publishes marker and data together).
    */
  private def complete(dir: File): Boolean = new File(dir, "_SUCCESS").exists()

  private def deleteRec(f: File): Unit = {
    Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
    f.delete(): Unit
  }

  private def writeAtomic(df: DataFrame, dir: File): Unit = {
    val tmp = new File(dir.getParentFile, dir.getName + ".tmp-" + UUID.randomUUID())
    df.write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    dir.getParentFile.mkdirs()
    if (!tmp.renameTo(dir)) {
      // lost a concurrent-writer race (or dir appeared): models are
      // deterministic per key, so the winner's table is equivalent —
      // discard ours, but insist a complete table is now there
      deleteRec(tmp)
      require(complete(dir), s"model table $dir neither writable nor complete")
    }
  }

  /** PQ codebook table: (sub, cell, cent: array<double>) + provenance. */
  def ensurePq(s: SparkSession, source: String, shape: String)
      (train: => Seq[((Int, Int), Array[Double])]): Seq[((Int, Int), Array[Double])] = {
    val dir = dirFor("pq", source, shape)
    if (!complete(dir)) {
      import s.implicits._
      val df = train.map { case ((sub, cell), c) => (sub, cell, c.toSeq) }
        .toDF("sub", "cell", "cent")
        .withColumn("model_version", lit(shape)).withColumn("source", lit(source))
      writeAtomic(df.coalesce(1), dir)
    }
    // ALWAYS serve from the table — the read a fresh session would do
    s.read.parquet(dir.getPath)
      .select("sub", "cell", "cent").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray)
      .sortBy(_._1).toSeq
  }

  /** Coarse-quantizer centroid table: (cell, cent: array<float>). */
  def ensureCentroids(s: SparkSession, source: String, shape: String)
      (train: => Seq[(Int, Array[Float])]): Seq[(Int, Array[Float])] = {
    val dir = dirFor("centroids", source, shape)
    if (!complete(dir)) {
      import s.implicits._
      val df = train.map { case (cell, c) => (cell, c.toSeq) }
        .toDF("cell", "cent")
        .withColumn("model_version", lit(shape)).withColumn("source", lit(source))
      writeAtomic(df.coalesce(1), dir)
    }
    s.read.parquet(dir.getPath)
      .select("cell", "cent").collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1).toSeq
  }

  /** Row-table artifacts (near-dup groups, candidate pairs): persist the
    * computed frame as a versioned table and return the READ-BACK frame.
    * The returned plan is a plain parquet scan — a fresh session serving
    * the same key never recomputes the (expensive) lineage.
    */
  def ensureDf(s: SparkSession, kind: String, source: String, shape: String = "v1")
      (compute: => DataFrame): DataFrame = {
    val dir = dirFor(kind, source, shape)
    if (!complete(dir)) {
      val df = compute
        .withColumn("model_version", lit(shape)).withColumn("source", lit(source))
      writeAtomic(df, dir)
    }
    s.read.parquet(dir.getPath).drop("model_version", "source")
  }

  /** Visible for tests: drop every persisted model table. */
  private[graft] def clear(): Unit = deleteRec(new File(root))
}
