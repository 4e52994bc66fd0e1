package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Sources

/** Similarity search over the `embeddings` table (SURVEY §2.13):
  * brute-force cosine top-k as the exact baseline, random-hyperplane LSH
  * bucketing as the approximate scale path, and per-label centroids.
  *
  * Vector math uses only codegen'd higher-order functions (`zip_with`,
  * `aggregate`, `transform`) — no UDFs, no serialization off the Tungsten
  * row format.
  *
  * Scale story (100 TB of vectors):
  *  - the exact path broadcasts the (small) query set and streams the
  *    corpus once — cost O(|corpus| × |queries| × dim), shuffle-free except
  *    the final per-query top-k window over |queries| × k rows;
  *  - the LSH path computes a signature per vector in one linear pass,
  *    shuffles once on (band, bucket), and only compares within buckets —
  *    the standard IVF/LSH trade of recall for a ~1000× candidate cut.
  */
object Similarity {

  /** dot(a, b) with double accumulation (inputs are float arrays). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact cosine top-k: for each query vector (vec_id < 8), the 5 nearest
    * corpus vectors. Ranking uses the cosine rounded to 4 decimals with
    * vec_id tie-break, so ordering is engine-stable at float precision.
    */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Sources.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = emb.filter(col("vec_id") >= 8)
    val scored = corpus.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("rn"), col("vec_id"), col("cos"))
      .orderBy("q_id", "rn")
  }

  /** Deterministic pseudo-random hyperplane component for (plane j, dim i):
    * a fixed-seed hash folded to [-0.5, 0.5). Engine-only (no oracle).
    */
  private def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Random-hyperplane LSH ANN: 12-bit signature per vector; vectors
    * sharing a signature bucket are candidate neighbors; exact cosine
    * re-ranks within buckets and keeps the top neighbor per vector.
    * No oracle (LSH is approximate); rows-only check.
    */
  def annLshTopNeighbor(s: SparkSession, d: String): DataFrame = {
    val emb = Sources.embeddings(s, d)
    val dim = 64
    val planes = hyperplanes(12, dim)
    val sigBits = planes.zipWithIndex.map { case (p, j) =>
      val planeCol = array(p.map(v => lit(v)): _*)
      when(dot(col("embedding"), planeCol) > 0, lit(1L << j)).otherwise(lit(0L))
    }
    val sig = sigBits.reduce(_ + _)
    val signed = emb.withColumn("bucket", sig)
    val a = signed.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
    val b = signed.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket").as("bucket_b"))
    val pairs = a.join(b, col("bucket") === col("bucket_b") && col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("emb_a"), col("emb_b")), 4).as("cos"))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id_a"), col("id_b").as("nn_id"), col("cos"))
      .orderBy("id_a")
  }

  /** Per-label centroid by vector position (custom typed aggregation
    * surface, SURVEY §2.5) — posexplode + avg keeps it oracle-checkable;
    * first 8 dims reported.
    */
  def centroidByLabel(s: SparkSession, d: String): DataFrame =
    Sources.embeddings(s, d)
      // slice BEFORE exploding: 8 rows per vector instead of 64 then filter
      .select(col("label"), posexplode(slice(col("embedding"), 1, 8)).as(Seq("pos", "v")))
      .groupBy("label", "pos")
      .agg(round(avg(col("v").cast("double")), 4).as("avg_v"), count(lit(1)).as("n_vecs"))
      .select(col("label"), col("pos").cast("long").as("pos"), col("avg_v"), col("n_vecs"))
      .orderBy("label", "pos")

  /** Embedding-cosine near-dup (SURVEY §2.13): all vector pairs with
    * cosine ≥ 0.4 via the native `cosine_sim` expression. The exact
    * pairwise form is the oracle baseline; the 100 TB path replaces the
    * self-join with LSH bucketing ([[annLshTopNeighbor]]) so only
    * bucket-mates are compared.
    */
  def dedupEmbeddingCosine(s: SparkSession, d: String): DataFrame = {
    val emb = Sources.embeddings(s, d)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(expr("cosine_sim(emb_a, emb_b)"), 4).as("cos"))
      .filter(col("cos") >= 0.4)
      .orderBy("id_a", "id_b")
  }

  /** Embedding L2-norm distribution per label — exercises the vector HOFs
    * in an aggregation (norms are engine-stable to 4 decimals).
    */
  def normStats(s: SparkSession, d: String): DataFrame =
    Sources.embeddings(s, d)
      .select(col("label"), round(l2norm(col("embedding")), 4).as("nrm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), round(min("nrm"), 4).as("min_norm"),
        round(max("nrm"), 4).as("max_norm"))
      .orderBy("label")

  /** Same top-k as [[cosineTopK]] but through the native codegen'd
    * [[graft.functions.CosineSimilarity]] expression (`cosine_sim` SQL
    * function injected by GraftExtensions) — one fused loop, no
    * intermediate arrays. Shares cosineTopK's oracle.
    */
  def cosineTopKNative(s: SparkSession, d: String): DataFrame = {
    val emb = Sources.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = emb.filter(col("vec_id") >= 8).crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id"),
        round(expr("cosine_sim(embedding, q_emb)"), 4).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("rn"), col("vec_id"), col("cos"))
      .orderBy("q_id", "rn")
  }

  /** Per-label centroid through the custom typed Aggregator
    * ([[graft.functions.CentroidAggregator]]) — fixed-size buffers with
    * map-side partial aggregation instead of a posexplode row blow-up.
    */
  def centroidUdaf(s: SparkSession, d: String): DataFrame = {
    val cent = graft.functions.CentroidAggregator.centroid(8)
    Sources.embeddings(s, d)
      .groupBy("label")
      .agg(cent(col("embedding")).as("raw"), count(lit(1)).as("n_vecs"))
      .select(col("label"),
        // CSV, not a raw array: the oracle harness hashes scalar columns
        // only; `+ 0.0` collapses -0.0 so both engines format identically
        concat_ws(",", transform(col("raw"),
          x => format_string("%.4f", round(x, 4) + lit(0.0)))).as("centroid_csv"),
        col("n_vecs"))
      .orderBy("label")
  }

  /** IVF-style ANN (the other standard scale path next to LSH). Coarse
    * centroids are *trained* from the data — the per-label element-wise
    * mean via the typed [[graft.functions.CentroidAggregator]] (one
    * distributed pass; the stand-in for offline k-means). Each corpus
    * vector is indexed in its nearest cell; each query probes its
    * `nprobe=2` nearest cells; exact cosine runs only on (probe, index)
    * cell matches. Cost drops from O(n²) to O(n·k + nprobe·Σ|cell|²),
    * and the cell match is an **equi-join** — at 100 TB one shuffle on
    * `cell`, never a cross product. Approximate ⇒ rows-only check;
    * recall vs the exact neighbor is asserted in OpsSpec.
    */
  def ivfTopNeighbor(s: SparkSession, d: String): DataFrame = {
    val emb = Sources.embeddings(s, d)
    // one cell-ranking pass feeds both sides; persisting it is the batch
    // analog of building the IVF index once offline (without it, the
    // centroid training and scoring run again per DAG branch)
    val cells = nearestCells(emb, 2).persist()
    val idx = cells.filter(col("rn") === 1)
      .select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
        col("cent_id").as("cell"))
    val probes = cells
      .select(col("vec_id"), col("embedding").as("q_emb"),
        col("cent_id").as("probe_cell"))
    val pairs = probes.join(idx,
        col("probe_cell") === col("cell") && col("vec_id") =!= col("id_b"))
      .select(col("vec_id").as("id_a"), col("id_b"),
        round(expr("cosine_sim(q_emb, emb_b)"), 4).as("cos"))
      // a neighbor can match via both probed cells — keep one copy
      .dropDuplicates("id_a", "id_b")
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id_a"), col("id_b").as("nn_id"), col("cos"))
      .orderBy("id_a")
  }

  /** Trained coarse quantizer: per-label centroid over all 64 dims. */
  private def ivfCentroids(emb: DataFrame): DataFrame = {
    val cent = graft.functions.CentroidAggregator.centroid(64)
    emb.groupBy("label").agg(cent(col("embedding")).as("cent_emb"))
      .select(col("label").as("cent_id"),
        transform(col("cent_emb"), x => x.cast("float")).as("cent_emb"))
  }

  /** Rank a vector's cells by centroid cosine, keep the top `n`. */
  private def nearestCells(emb: DataFrame, n: Int): DataFrame = {
    val scored = emb.crossJoin(broadcast(ivfCentroids(emb)))
      .select(col("vec_id"), col("embedding"), col("cent_id"),
        expr("cosine_sim(embedding, cent_emb)").as("cs"))
    val w = Window.partitionBy("vec_id").orderBy(col("cs").desc, col("cent_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Index-side assignment (top-1 cell); factored out so the spec can
    * check it partitions the corpus.
    */
  private[ops] def ivfAssign(emb: DataFrame): DataFrame =
    nearestCells(emb, 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_topk" -> (cosineTopK _),
    "sim_cosine_topk_native" -> (cosineTopKNative _),
    "sim_centroid_udaf" -> (centroidUdaf _),
    "dedup_embedding_cosine" -> (dedupEmbeddingCosine _),
    "sim_ann_lsh" -> (annLshTopNeighbor _),
    "sim_ann_ivf" -> (ivfTopNeighbor _),
    "sim_centroid_by_label" -> (centroidByLabel _),
    "sim_norm_stats" -> (normStats _),
  )

  val oracles: Map[String, String] = Map(
    "dedup_embedding_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        | round(list_cosine_similarity(a.v, b.v), 4) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "sim_cosine_topk_native" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
        | c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
        | s AS (SELECT q_id, vec_id,
        |   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q_emb AS DOUBLE[])), 4) AS cos FROM c, q),
        | r AS (SELECT q_id, vec_id, cos, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn FROM s)
        |SELECT q_id, rn, vec_id, cos FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "sim_centroid_udaf" ->
      """SELECT label,
        | array_to_string(list_transform(
        |  [round(avg(CAST(embedding[1] AS DOUBLE)), 4), round(avg(CAST(embedding[2] AS DOUBLE)), 4),
        |   round(avg(CAST(embedding[3] AS DOUBLE)), 4), round(avg(CAST(embedding[4] AS DOUBLE)), 4),
        |   round(avg(CAST(embedding[5] AS DOUBLE)), 4), round(avg(CAST(embedding[6] AS DOUBLE)), 4),
        |   round(avg(CAST(embedding[7] AS DOUBLE)), 4), round(avg(CAST(embedding[8] AS DOUBLE)), 4)],
        |  x -> printf('%.4f', x + 0.0)), ',') AS centroid_csv,
        | count(*) AS n_vecs
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,
    "sim_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
        | c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 8),
        | s AS (SELECT q_id, vec_id,
        |   round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), CAST(q_emb AS DOUBLE[])), 4) AS cos FROM c, q),
        | r AS (SELECT q_id, vec_id, cos, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn FROM s)
        |SELECT q_id, rn, vec_id, cos FROM r WHERE rn <= 5 ORDER BY q_id, rn""".stripMargin,
    "sim_centroid_by_label" ->
      """SELECT label, i - 1 AS pos, round(avg(CAST(v AS DOUBLE)), 4) AS avg_v, count(*) AS n_vecs
        |FROM (SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS i FROM embeddings)
        |WHERE i <= 8 GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    "sim_norm_stats" ->
      """WITH n AS (SELECT label,
        |  round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a,b) -> a + b)), 4) AS nrm
        | FROM embeddings)
        |SELECT label, count(*) AS n_vecs, round(min(nrm), 4) AS min_norm, round(max(nrm), 4) AS max_norm
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
  )
}
