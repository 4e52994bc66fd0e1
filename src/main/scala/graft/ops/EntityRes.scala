package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Num.roundNorm
import graft.io.Sources

/** Entity resolution / record linkage on fuzzy string identity
  * (SURVEY §2.13 extension family; complements `audit_fuzzy_match`'s
  * edit-distance screen with the Jaro-Winkler score every commercial
  * MDM/linkage stack uses for short name fields).
  *
  * Both queries run the classic two-stage shape: a BLOCKING equi-join
  * (candidates = Σ block², never corpus² — at 100 TB the block key gets
  * finer, e.g. brand×container or an LSH prefix, but the plan shape is
  * unchanged: one shuffle on the block key, then a codegen'd per-pair
  * score), then the native [[graft.functions.JaroWinklerSim]] expression
  * evaluated inside the join's generated loop — no UDF ser/de per
  * candidate pair. Ranking quantizes the score to a 1e-6 integer lattice
  * before ordering so the best-match tie-break (smaller key wins) is
  * engine-independent; the DuckDB oracle replays the identical canonical
  * Jaro-Winkler (scale 0.1, prefix ≤ 4, boost threshold 0.7) via its
  * built-in `jaro_winkler_similarity`.
  */
object EntityRes {

  /** Session-materialized ≥ 0.9 scored pair table — the expensive
    * stage (block-join + 8M-pair codegen'd Jaro-Winkler at sf0.1) that
    * BOTH `er_jaro_pairs` and `er_cluster_canonical` reduce, and that
    * the CC contraction would otherwise RE-EXECUTE on every
    * large-star/small-star round (each round is its own action over the
    * pair lineage — the graph_hits lesson, here at ~3 s per replay).
    * The survivor set is tiny (≪ corpus), so the stored table is cheap.
    */
  private[graft] def pairs09Raw(s: SparkSession, d: String): DataFrame =
    graft.io.Materialized.of(s, s"erPairs09|$d") {
      val p = Sources.part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_name"))
      val a = p.select(col("p_brand"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
      val b = p.select(col("p_brand"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
      a.join(b, Seq("p_brand"))
        .filter(col("key_a") < col("key_b"))
        .withColumn("jw", call_function("jaro_winkler", col("name_a"), col("name_b")))
        .filter(col("jw") >= 0.9)
        .select(col("p_brand"), col("key_a"), col("key_b"),
          col("name_a"), col("name_b"), col("jw"))
        .repartition(math.max(2, s.sparkContext.defaultParallelism),
          col("key_a"), col("key_b"))
    }

  /** Near-identical part-name pairs within a brand block at
    * Jaro-Winkler ≥ 0.9 (`er_jaro_pairs`).
    */
  def jaroPairs(s: SparkSession, d: String): DataFrame =
    pairs09Raw(s, d)
      .select(col("p_brand"), col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        roundNorm(col("jw"), 6).as("jw_sim"))
      .orderBy("p_brand", "key_a", "key_b")

  /** Best-match record linkage between two catalogs (`er_best_link`):
    * even-key parts are catalog A, odd-key parts catalog B (a
    * deterministic stand-in for two source systems); each A record
    * links to its highest-Jaro-Winkler B record inside the brand
    * block. Rank key = score on the 1e-6 integer lattice, ties to the
    * smallest B key — fully deterministic across engines. The top-1
    * window is per-A-record (partitioned by `key_a`), so it scales
    * with the blocking fan-out, not the corpus.
    */
  def bestLink(s: SparkSession, d: String): DataFrame = {
    val p = Sources.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_name"))
    val a = p.filter(col("p_partkey") % 2 === 0)
      .select(col("p_brand"), col("p_partkey").as("key_a"), col("p_name").as("name_a"))
    val b = p.filter(col("p_partkey") % 2 === 1)
      .select(col("p_brand"), col("p_partkey").as("key_b"), col("p_name").as("name_b"))
    val scored = a.join(b, Seq("p_brand"))
      .withColumn("jw_e6",
        round(call_function("jaro_winkler", col("name_a"), col("name_b")) * 1e6)
          .cast("long"))
    val w = Window.partitionBy("key_a").orderBy(col("jw_e6").desc, col("key_b").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_brand"), col("key_a"), col("name_a"), col("key_b"), col("name_b"),
        roundNorm(col("jw_e6").cast("double") / 1e6, 6).as("jw_sim"))
      .orderBy("key_a")
  }

  /** End-to-end entity consolidation (`er_cluster_canonical`): the
    * ≥ 0.9 pair set closes into duplicate CLUSTERS via the
    * [[Dedup.connectedGroups]] large-star/small-star contraction (the
    * same O(log²)-round machinery the text/embedding dedup families
    * run), then each cluster elects a canonical record — most frequent
    * name (ties to the lexicographically smallest), surviving key = the
    * smallest key carrying that name. This is the survivorship step of
    * every MDM pipeline; all tie-breaks are total orders, so the
    * recursive-CTE oracle replays it exactly. Per-cluster election is
    * a group-partitioned window over the (cluster, name) aggregate —
    * cardinality ≤ cluster count, never corpus².
    */
  def clusterCanonical(s: SparkSession, d: String): DataFrame = {
    val p = Sources.part(s, d)
      .select(col("p_brand"), col("p_partkey"), col("p_name"))
    val pairs = pairs09Raw(s, d)
      .select(col("key_a").as("id_a"), col("key_b").as("id_b"))
    val groups = Dedup.connectedGroups(pairs, p.select(col("p_partkey")), "p_partkey")
    val members = groups.join(
      p.select(col("p_partkey").as("id"), col("p_name")), Seq("id"))
    val groupN = members.groupBy("group_id").agg(count(lit(1)).as("group_n"))
    val nameCnt = members.groupBy("group_id", "p_name")
      .agg(count(lit(1)).as("name_n"))
    val wName = Window.partitionBy("group_id")
      .orderBy(col("name_n").desc, col("p_name").asc)
    val canonName = nameCnt.withColumn("rn", row_number().over(wName))
      .filter(col("rn") === 1)
      .select(col("group_id"), col("p_name").as("canon_name"))
    val canonKey = members.join(canonName, Seq("group_id"))
      .filter(col("p_name") === col("canon_name"))
      .groupBy("group_id").agg(min(col("id")).as("canon_key"))
    members.join(groupN, Seq("group_id"))
      .join(canonName, Seq("group_id"))
      .join(canonKey, Seq("group_id"))
      .select(col("id").as("p_partkey"), col("group_id"), col("group_n"),
        col("canon_key"), col("canon_name"),
        (col("id") === col("canon_key")).as("is_canonical"))
      .orderBy("p_partkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_jaro_pairs" -> (jaroPairs _),
    "er_best_link" -> (bestLink _),
    "er_cluster_canonical" -> (clusterCanonical _),
  )

  val oracles: Map[String, String] = Map(
    "er_jaro_pairs" ->
      """SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
        | a.p_name AS name_a, b.p_name AS name_b,
        | round(jaro_winkler_similarity(a.p_name, b.p_name), 6) + 0.0 AS jw_sim
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9
        |ORDER BY a.p_brand, key_a, key_b""".stripMargin,
    "er_best_link" ->
      """WITH a AS (SELECT p_brand, p_partkey AS key_a, p_name AS name_a
        |           FROM part WHERE p_partkey % 2 = 0),
        | b AS (SELECT p_brand, p_partkey AS key_b, p_name AS name_b
        |       FROM part WHERE p_partkey % 2 = 1),
        | scored AS (
        |   SELECT a.p_brand, key_a, name_a, key_b, name_b,
        |     CAST(round(jaro_winkler_similarity(name_a, name_b) * 1e6) AS BIGINT)
        |       AS jw_e6
        |   FROM a JOIN b ON a.p_brand = b.p_brand),
        | ranked AS (
        |   SELECT *, row_number() OVER (PARTITION BY key_a
        |     ORDER BY jw_e6 DESC, key_b ASC) AS rn
        |   FROM scored)
        |SELECT p_brand, key_a, name_a, key_b, name_b,
        |  round(jw_e6::DOUBLE / 1e6, 6) + 0.0 AS jw_sim
        |FROM ranked WHERE rn = 1 ORDER BY key_a""".stripMargin,
    "er_cluster_canonical" ->
      """WITH RECURSIVE pr AS (
        |  SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
        |  FROM part a JOIN part b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.9),
        | e AS (SELECT id_a AS src, id_b AS dst FROM pr
        |       UNION ALL SELECT id_b, id_a FROM pr),
        | reach(src, dst) AS (
        |  SELECT p_partkey, p_partkey FROM part
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
        | g AS (SELECT src AS id, min(dst) AS group_id FROM reach GROUP BY src),
        | m AS (SELECT g.id, g.group_id, p.p_name
        |       FROM g JOIN part p ON p.p_partkey = g.id),
        | gn AS (SELECT group_id, CAST(count(*) AS BIGINT) AS group_n
        |        FROM m GROUP BY 1),
        | nc AS (SELECT group_id, p_name, count(*) AS name_n FROM m GROUP BY 1, 2),
        | cn AS (SELECT group_id, p_name AS canon_name FROM (
        |    SELECT *, row_number() OVER (PARTITION BY group_id
        |      ORDER BY name_n DESC, p_name ASC) AS rn FROM nc)
        |    WHERE rn = 1),
        | ck AS (SELECT m.group_id, min(m.id) AS canon_key
        |        FROM m JOIN cn ON m.group_id = cn.group_id
        |         AND m.p_name = cn.canon_name
        |        GROUP BY 1)
        |SELECT m.id AS p_partkey, m.group_id, gn.group_n, ck.canon_key,
        |  cn.canon_name, m.id = ck.canon_key AS is_canonical
        |FROM m JOIN gn USING (group_id) JOIN cn USING (group_id)
        |  JOIN ck USING (group_id)
        |ORDER BY p_partkey""".stripMargin,
  )
}
