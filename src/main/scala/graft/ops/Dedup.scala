package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic, reusable deduplication operators (DataFrame in → DataFrame
  * out). The `SparkEntry` queries are thin fixture-bound wrappers over
  * these; library users call them directly on arbitrary tables.
  *
  * Every operator here is a single hash-aggregate or window pass — one
  * shuffle on the dedup key — which is the only shape that survives a
  * 100 TB corpus.
  */
object Dedup {

  /** Exact dedup, deterministic representative: keeps the row with the
    * MINIMUM `tieBreak` value per key group (unlike `dropDuplicates`,
    * whose survivor is partition-order-dependent).
    */
  def exactKeepMin(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep-latest dedup: one row per key, the maximum of `orderCol`
    * (ties broken by it being unique, e.g. an event id).
    */
  def keepLatest(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate-group report: keys + surviving id + copy count, only for
    * groups with more than one row.
    */
  def duplicateGroups(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** MinHash signatures + LSH band hashes for a text column: `nHashes`
    * minhashes over 3-word shingles, grouped into `nHashes/bandSize` band
    * hashes. Strings are hashed ONCE; the per-seed signatures re-hash the
    * resulting 8-byte longs.
    */
  def minHashBands(df: DataFrame, idCol: String, textCol: String,
      nHashes: Int = 12, bandSize: Int = 4): DataFrame = {
    require(nHashes % bandSize == 0, "nHashes must be a multiple of bandSize")
    val shingles = expr(
      s"transform(sequence(1, greatest(size(__w) - 2, 1))," +
        s" i -> concat_ws(' ', slice(__w, i, 3)))")
    val minhashes = (0 until nHashes).map { seed =>
      array_min(transform(col("__shash"), h => xxhash64(h, lit(seed)))).as(s"mh_$seed")
    }
    val bands = (0 until nHashes / bandSize).map { bnd =>
      xxhash64(lit(bnd) +: (bnd * bandSize until (bnd + 1) * bandSize).map(i => col(s"mh_$i")): _*)
        .as(s"band_$bnd")
    }
    df.withColumn("__w", split(col(textCol), " "))
      .withColumn("__shingles", shingles)
      .withColumn("__shash", transform(col("__shingles"), sh => xxhash64(sh)))
      .select(col(idCol) +: minhashes: _*)
      .select(col(idCol) +: bands: _*)
  }

  /** Candidate near-dup pairs from banded signatures: ids sharing any
    * (band index, band hash) bucket. One shuffle on the bucket key; no
    * all-pairs comparison ever happens.
    *
    * Buckets larger than `cliqueCap` — boilerplate/empty-document
    * signatures, the classic 100 TB failure where one bucket of m docs
    * would emit m²/2 pairs — fall back to **star-linking**: every member
    * pairs with the bucket's minimum id only. That is O(m) pairs and
    * keeps the bucket connected, which is all dedup-grouping (connected
    * components → keep one survivor) needs; pairwise completeness inside
    * a mega-bucket is irrelevant because its members are near-identical
    * by construction. (Contrast with ANN top-k, where an oversized
    * bucket is an *uninformative* signature region and is dropped —
    * `Similarity.annLshCandidates`.)
    */
  def lshCandidatePairs(bands: DataFrame, idCol: String,
      cliqueCap: Int = 4096): DataFrame = {
    val bandCols = bands.columns.filter(_.startsWith("band_"))
    val exploded = bands.select(col(idCol),
      posexplode(array(bandCols.map(col): _*)).as(Seq("band_idx", "band_hash")))
    val stats = exploded.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("__bsz"), min(col(idCol)).as("__hub"))
    val tagged = exploded.join(stats, Seq("band_idx", "band_hash"))
    val small = tagged.filter(col("__bsz") <= cliqueCap)
      .select(col(idCol), col("band_idx"), col("band_hash"))
    val cliquePairs = small.as("x").join(small.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
    val starPairs = tagged
      .filter(col("__bsz") > cliqueCap && col(idCol) =!= col("__hub"))
      .select(col("__hub").as("id_a"), col(idCol).as("id_b"))
    cliquePairs.union(starPairs).distinct()
  }

  /** Jaccard similarity of two array columns (distinct-element sets). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Collapse candidate pairs into duplicate GROUPS: connected components
    * by iterative min-label propagation. Every node starts labeled with
    * its own id; each round a node takes the minimum label among itself
    * and its neighbors; at the fixpoint each component carries its
    * minimum member id as `group_id` — the deterministic survivor key
    * that completes the dedup pipeline (pairs → groups → keep one).
    *
    * Each round is one equi-join + groupBy-min — all shuffles on the id
    * key. Rounds needed = component diameter; near-dup clusters are
    * shallow (pairs come from shared buckets), so a handful of rounds
    * converges and the loop exits on the first round with zero label
    * changes. At petabyte scale the same loop runs with a per-round
    * checkpoint to truncate lineage (or the large-star/small-star
    * variant for log-round convergence on adversarial graphs); the
    * operator shape — join, min, repeat — is unchanged.
    */
  def connectedGroups(pairs: DataFrame, nodes: DataFrame, idCol: String,
      maxIter: Int = 15): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("lbl"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels, col("dst") === col("id"))
        .groupBy("src").agg(min("lbl").as("nlbl"))
      val next = labels.join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val changed = next.as("n")
        .join(labels.as("p"), col("n.id") === col("p.id"))
        .filter(col("n.lbl") =!= col("p.lbl"))
        .limit(1).count() > 0
      labels = next
      converged = !changed
      i += 1
    }
    labels.select(col("id"), col("lbl").as("group_id"))
  }
}
