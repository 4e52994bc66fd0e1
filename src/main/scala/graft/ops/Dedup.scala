package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Checkpoints.PinOps

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

  /** CDC apply: collapse a change stream (upserts + deletes) to current
    * state — the batch form of applying a Debezium/binlog feed to a
    * snapshot. Latest change per key wins (`orderCols`, descending, must
    * be a total order — e.g. ts + a unique sequence id); a key whose
    * latest change is `deleteOp` disappears. One keyed window shuffle —
    * the same shape as keep-latest, plus the tombstone filter.
    */
  def cdcApply(changes: DataFrame, keys: Seq[String], orderCols: Seq[String],
      opCol: String, deleteOp: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn")
  }

  /** Duplicate-group report: keys + surviving id + copy count, only for
    * groups with more than one row.
    */
  def duplicateGroups(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** `n`-word shingles of a pre-split word array column (short arrays
    * yield one truncated shingle, so no document is shingle-less). Shared
    * by signature building and the exact re-rank so both sides of an
    * LSH-propose / exact-verify pipeline agree on the set definition.
    */
  def wordShingles(wordsCol: Column, n: Int = 3): Column =
    transform(sequence(lit(1), greatest(size(wordsCol) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(wordsCol, i, lit(n))))

  /** MinHash signatures + LSH band hashes for a text column: `nHashes`
    * minhashes over 3-word shingles, grouped into `nHashes/bandSize` band
    * hashes. Strings are hashed ONCE; the per-seed signatures re-hash the
    * resulting 8-byte longs. `carry` columns (expressions over the input
    * row, e.g. the distinct shingle set an exact verifier needs) ride
    * through to the output unchanged — the streaming ingestion-dedup
    * twin uses this to keep signature and verification payload in one
    * row.
    *
    * This is the STREAM-SAFE from-text form (pure per-row projection, no
    * checkpoint barrier — so Catalyst may collapse the split into the
    * interpreted shingle lambdas). Batch pipelines with a materialized
    * hashed-shingle table should band via [[minHashBandsFromSets]]
    * instead: bit-identical output, one shingling pass per corpus.
    */
  def minHashBands(df: DataFrame, idCol: String, textCol: String,
      nHashes: Int = 12, bandSize: Int = 4,
      carry: Seq[(String, Column)] = Nil): DataFrame = {
    require(nHashes % bandSize == 0, "nHashes must be a multiple of bandSize")
    val shingles = wordShingles(col("__w"))
    val minhashes = (0 until nHashes).map { seed =>
      array_min(transform(col("__shash"), h => xxhash64(h, lit(seed)))).as(s"mh_$seed")
    }
    val bands = (0 until nHashes / bandSize).map { bnd =>
      xxhash64(lit(bnd) +: (bnd * bandSize until (bnd + 1) * bandSize).map(i => col(s"mh_$i")): _*)
        .as(s"band_$bnd")
    }
    val carried = carry.map { case (n, c) => c.as(n) }
    val carriedRefs = carry.map { case (n, _) => col(n) }
    df.withColumn("__w", split(col(textCol), " "))
      .withColumn("__shingles", shingles)
      .withColumn("__shash", transform(col("__shingles"), sh => xxhash64(sh)))
      .select((col(idCol) +: carried) ++ minhashes: _*)
      .select((col(idCol) +: carriedRefs) ++ bands: _*)
  }

  /** MinHash band hashes derived from a PRE-HASHED shingle column
    * (`array<long>` of xxhash64(shingle)): the per-seed signature
    * re-hashes the same 8-byte longs as [[minHashBands]], and a minimum
    * over a multiset equals the minimum over its distinct support — so
    * the output is BIT-IDENTICAL to [[minHashBands]] on the same text,
    * while skipping the re-shingle + first-level hash of the raw text
    * entirely. Point it at the materialized shingle-set table the exact
    * re-rank already shares and the whole propose/verify pipeline costs
    * ONE shingling pass per corpus instead of one per stage.
    */
  def minHashBandsFromSets(sets: DataFrame, idCol: String, ssetCol: String,
      nHashes: Int = 12, bandSize: Int = 4): DataFrame = {
    require(nHashes % bandSize == 0, "nHashes must be a multiple of bandSize")
    val minhashes = (0 until nHashes).map { seed =>
      array_min(transform(col(ssetCol), h => xxhash64(h, lit(seed)))).as(s"mh_$seed")
    }
    val bands = (0 until nHashes / bandSize).map { bnd =>
      xxhash64(lit(bnd) +: (bnd * bandSize until (bnd + 1) * bandSize).map(i => col(s"mh_$i")): _*)
        .as(s"band_$bnd")
    }
    sets.select(col(idCol) +: minhashes: _*).select(col(idCol) +: bands: _*)
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

  /** Cross-set candidate pairs: ids from `bandsNew` sharing any (band,
    * bucket) with ids from `bandsCorpus` — the incremental-dedup shape
    * (new batch probed against the existing corpus) as opposed to the
    * self-join of [[lshCandidatePairs]]. Oversized corpus buckets
    * (> `bucketCap` postings) are dropped like ANN's uninformative
    * regions: at 100 TB a busy band bucket is boilerplate signature
    * space, and the batch member will match it through its other bands
    * if it is a genuine near-dup.
    */
  def lshCandidatePairsAcross(bandsNew: DataFrame, bandsCorpus: DataFrame,
      idCol: String, bucketCap: Long = 4096L): DataFrame = {
    def explodeBands(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        posexplode(array(df.columns.filter(_.startsWith("band_")).map(col): _*))
          .as(Seq("band_idx", "band_hash")))
    val corpus = explodeBands(bandsCorpus, "id_b")
    val okBuckets = corpus.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("__bsz")).filter(col("__bsz") <= bucketCap)
      .select("band_idx", "band_hash")
    explodeBands(bandsNew, "id_a")
      .join(corpus.join(okBuckets, Seq("band_idx", "band_hash")),
        Seq("band_idx", "band_hash"))
      .select(col("id_a"), col("id_b"))
      // re-probing ids already merged into the corpus must not propose
      // them as their own near-dup
      .filter(col("id_a") =!= col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** Jaccard similarity of two array columns (distinct-element sets). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Collapse candidate pairs into duplicate GROUPS: connected components
    * by alternating **large-star / small-star** contraction (the
    * MapReduce-CC scheme of Kiveris et al.) — each component converges to
    * a star rooted at its minimum member id, which becomes `group_id`,
    * the deterministic survivor key completing the dedup pipeline
    * (pairs → groups → keep one).
    *
    * Per round, large-star points every node's larger neighbors at the
    * minimum of its neighborhood and small-star does the same for the
    * smaller neighbors; both are a groupBy-min plus an equi-join on the
    * *shrinking* edge set, and the alternation converges in O(log²)
    * rounds regardless of component diameter — naive label propagation
    * needs diameter rounds, and banded blocking chains real corpora into
    * components hundreds of hops deep (measured diameter ≈180 on the
    * sf0.1 fixture). Fixpoint = edge count and endpoint sum both stable.
    * Once the shrinking edge set drops below [[localFinishMaxEdges]] the
    * remaining rounds are replaced by one bounded collect + union-find
    * (the standard hybrid; see the threshold's scaladoc).
    *
    * Iterative lineage MUST be truncated: [[graft.io.Checkpoints.pin]]
    * (localCheckpoint by default, a reliable dir on clusters) materializes
    * each round's edges; superseded checkpoint blocks become unreachable
    * a round later and the ContextCleaner frees them (the GraphX
    * lifecycle), so nothing stays pinned once the result is released.
    * At toy scale wall-time is round-count × scheduler overhead; at
    * cluster scale the same ~O(log) rounds amortize over real data.
    */
  def connectedGroups(pairs: DataFrame, nodes: DataFrame, idCol: String,
      maxIter: Int = 30): DataFrame =
    connectedGroupsWithStats(pairs, nodes, idCol, maxIter)._1

  /** Edge-count threshold below which the contraction finishes with a
    * single collect + driver union-find instead of more distributed
    * rounds. 1M (long, long) edges ≈ 16 MB — trivially driver-sized —
    * while each avoided round is 3-4 shuffles plus a scheduling barrier.
    * This is the hybrid the MapReduce-CC literature itself prescribes
    * (Kiveris et al. §6.2 finish small graphs in memory): contraction
    * shrinks the edge set monotonically, so at 100 TB the loop runs its
    * O(log²) distributed rounds only while the graph genuinely exceeds
    * one machine, then stops scheduling cluster rounds for a kilobyte of
    * survivors. NOT a driver-side loop over big data: the collect is
    * bounded by this constant, checked against the measured edge count.
    */
  private[graft] val localFinishMaxEdges = 1000000L

  /** [[connectedGroups]] plus the number of contraction rounds it took to
    * converge — the observable the scale design cares about (each round
    * is a fixed number of shuffles, so rounds × shuffle cost is the whole
    * bill; exposed for probes/specs rather than logged).
    */
  def connectedGroupsWithStats(pairs: DataFrame, nodes: DataFrame, idCol: String,
      maxIter: Int = 30,
      localFinishEdges: Long = localFinishMaxEdges): (DataFrame, Int) = {
    def bothDirs(e: DataFrame): DataFrame =
      e.select(col("a"), col("b"))
        .union(e.select(col("b").as("a"), col("a").as("b")))
    // m(u) = min(N(u) ∪ {u}) attached per row via an unordered window —
    // ONE shuffle on u, where the groupBy-min + rejoin form this replaced
    // paid two (agg exchange + join exchange) and re-derived the
    // neighbor set per consumer. Round cost at toy scale is pure
    // shuffle/stage overhead, so fewer exchanges per star cut the bill
    // (bench: text/sim dedup-groups 7.3/6.7 s → 5.5/6.3 s at sf0.1).
    def withMin(dir: DataFrame): DataFrame =
      dir.withColumn("m",
        least(col("a"), min("b").over(Window.partitionBy("a"))))
    def largeStar(e: DataFrame): DataFrame =
      withMin(bothDirs(e))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    // smallStar emits (b → m) per directed edge PLUS (u → m) per node;
    // explode of a 2-struct array yields both from the single windowed
    // pass (the duplicate (u, m) copies collapse in the distinct) — the
    // union form re-computed the windowed subtree once per arm.
    def smallStar(e: DataFrame): DataFrame =
      withMin(bothDirs(e).filter(col("b") <= col("a")))
        .select(explode(array(
          struct(col("b"), col("m")),
          struct(col("a").as("b"), col("m")))).as("p"))
        .select(col("p.b").as("a"), col("p.m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    def stats(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum((col("a") + col("b")).cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0), r.getDecimal(1))
    }
    // lazy checkpoint: the stats action both materializes the round's
    // edges (cached for the next round) and computes the convergence
    // aggregate — ONE job per round where eager + separate stats paid two
    var edges = pairs
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .pinned(eager = false)
    var (prevN, prevSum) = stats(edges)
    var converged = prevN == 0
    var i = 0
    // distributed contraction ONLY while the edge set genuinely exceeds
    // one machine (see localFinishMaxEdges); each round shrinks it
    while (!converged && prevN > localFinishEdges && i < maxIter) {
      edges = smallStar(largeStar(edges)).pinned(eager = false)
      val (n, s) = stats(edges)
      converged = n == prevN && (s == null || s.compareTo(prevSum) == 0)
      prevN = n
      prevSum = s
      i += 1
    }
    require(converged || prevN <= localFinishEdges,
      s"connectedGroups did not converge in $maxIter rounds")
    val members =
      if (converged) {
        // at the fixpoint edges are (member, root) stars; roots map to
        // themselves, edge-free nodes are their own singleton group
        bothDirs(edges).groupBy("a").agg(min("b").as("mn"))
          .select(col("a").as("id"), least(col("a"), col("mn")).as("group_id"))
      } else {
        // bounded local finish: union-find with min-id roots over the
        // collected (still partially contracted) edge list — exact, and
        // union-by-min keeps every root the component's minimum member
        val es = edges.collect().map(r =>
          (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
        val parent = scala.collection.mutable.HashMap.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        val s2 = pairs.sparkSession
        import s2.implicits._
        val idType = nodes.schema(idCol).dataType
        es.flatMap(e => Seq(e._1, e._2)).distinct.toSeq
          .map(id => (id, find(id)))
          .toDF("id", "group_id")
          .select(col("id").cast(idType).as("id"),
            col("group_id").cast(idType).as("group_id"))
      }
    val singletons = nodes.select(col(idCol).as("id"))
      .join(members.select(col("id").as("mid")), col("id") === col("mid"), "left_anti")
      .select(col("id"), col("id").as("group_id"))
    (members.union(singletons), i)
  }

  /** Incremental connected-components maintenance — the operational
    * shape of dedup grouping at 100 TB: yesterday's `(id, group_id)`
    * table stands, a DELTA batch of new documents arrives with its new
    * candidate pairs, and only the TOUCHED components are re-labeled.
    *
    * The trick is star-contraction over the CONTRACTED graph: each
    * delta-adjacent pair maps its base endpoint to that component's
    * existing root (one equi-join against the groups table — at scale,
    * a shuffle on the delta-pair side only), so the CC rerun sees a
    * graph whose nodes are `{delta ids} ∪ {touched roots}` — delta-
    * sized, never corpus-sized. Because every root IS its component's
    * minimum member id, the min-label CC over the contracted graph
    * yields exactly the full-recompute labels: min over a merged
    * component of (roots ∪ delta ids) = the global minimum id.
    * Untouched components keep their labels without being read.
    *
    * Output per node: `(id, group_id, is_delta, relabeled)` —
    * `relabeled` marks base docs whose label CHANGED, i.e. the exact
    * write-back set an incremental materialization updates (deltas are
    * inserts, not relabels, and carry `false`). Oracle: the full
    * recursive-CTE recompute over ALL pairs must equal this result
    * row-for-row (`text_dedup_incremental`).
    */
  def incrementalMerge(baseGroups: DataFrame, deltaPairs: DataFrame,
      deltaNodes: DataFrame, idCol: String): DataFrame = {
    val ga = baseGroups.select(col("id").as("id_a"), col("group_id").as("ga"))
    val gb = baseGroups.select(col("id").as("id_b"), col("group_id").as("gb"))
    val contracted = deltaPairs.select("id_a", "id_b")
      .join(ga, Seq("id_a"), "left")
      .join(gb, Seq("id_b"), "left")
      .select(coalesce(col("ga"), col("id_a")).as("id_a"),
        coalesce(col("gb"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val touched = contracted.select(col("id_a").as("id"))
      .union(contracted.select(col("id_b").as("id")))
      .union(deltaNodes.select(col(idCol).as("id")))
      .distinct()
    val merged = connectedGroups(contracted, touched, "id")
      .select(col("id").as("node"), col("group_id").as("new_gid"))
    val deltaOut = deltaNodes.select(col(idCol).as("id"))
      .join(merged, col("id") === col("node"), "left")
      .select(col("id"), coalesce(col("new_gid"), col("id")).as("group_id"),
        lit(true).as("is_delta"), lit(false).as("relabeled"))
    val baseOut = baseGroups
      .join(merged, col("group_id") === col("node"), "left")
      .select(col("id"),
        coalesce(col("new_gid"), col("group_id")).as("group_id"),
        lit(false).as("is_delta"),
        coalesce(col("new_gid") =!= col("group_id"), lit(false)).as("relabeled"))
    deltaOut.unionAll(baseOut)
  }
}
