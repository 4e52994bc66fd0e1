package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 scale receipts for the two open r12 verdict items:
  *
  * 1. (task 3) Frozen-bucket occupancy for the SemDeDup/multiprobe
  *    families: embeddings replicated ×1/×4/×16/×64, bucketed at the
  *    FIXED published 6 bits vs the corpus-scaled
  *    [[graft.ops.Similarity.scaledSignBits]] width. Receipts per
  *    scale: bucket count, max/mean occupancy, and the wall time of
  *    the full SemDeDup election ([[graft.ops.Similarity.semDedupOn]])
  *    at each width. The claim that matters at 100 TB: fixed-width max
  *    occupancy grows ~k× (the per-bucket election window becomes a
  *    64-task ceiling), scaled-width occupancy stays ~flat and the
  *    election wall tracks the corpus, not the bucket.
  *
  * 2. (task 6) Banded-ER survivorship at ×64 — one octave past the r12
  *    probe, where candidates reach ~10⁸ under the retired brand-only
  *    key: parts replicated with replica-disjoint name tokens (corpus
  *    growth = MORE ENTITIES, the honest ER scale model), receipts =
  *    exact candidate counts of the shipped 3-band blocking vs the
  *    retired brand-only key (block-histogram arithmetic, no giant
  *    join), the ≥0.9 pair-derivation wall, and the CC contraction
  *    with the bounded local finish DISABLED so distributed round
  *    count is visible (must stay flat — components are per-replica).
  *
  * Usage: `runMain graft.OccupancyProbe [bucket|er] [scale...]`
  * (default: both, scales 1 4 16 64). Prints one JSON line per
  * (probe, scale); results are recorded in PLANS.md.
  */
object OccupancyProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val out = "/tmp/graft_scale"
    val which = args.headOption.filter(Set("bucket", "er")).getOrElse("both")
    val scales = {
      val rest = if (args.headOption.exists(Set("bucket", "er"))) args.drop(1) else args
      if (rest.nonEmpty) rest.toSeq.map(_.toInt) else Seq(1, 4, 16, 64)
    }

    def time(thunk: => Long): Double = {
      thunk // warm (footer/codegen caches)
      val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
    }

    if (which != "er") scales.foreach { k =>
      // key-offset replication (the ScaleProbe discipline); quantized
      // the same way quantEmb does, pinned so both widths scan equally
      val q = spark.read.parquet(s"$base/embeddings.parquet")
        .crossJoin(spark.range(k).toDF("__rep"))
        .withColumn("vec_id", col("vec_id") + col("__rep") * 100000000L)
        .drop("__rep")
        .repartition(32)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x.cast("double") * 10000).cast("long")).as("qv"))
        .localCheckpoint(true)
      val n = q.count()
      val scaledBits = graft.ops.Similarity.scaledSignBits(n)
      def occ(bits: Int): (Long, Long, Double) = {
        val h = q.withColumn("bucket", graft.ops.Similarity.signBucketCol(bits))
          .groupBy("bucket").agg(count(lit(1)).as("nb"))
          .agg(count(lit(1)).as("used"), max("nb").as("mx"), avg("nb").as("mean"))
          .head()
        (h.getLong(0), h.getLong(1), h.getDouble(2))
      }
      val (used6, max6, mean6) = occ(6)
      val (usedS, maxS, meanS) = occ(scaledBits)
      val tFixed = time(graft.ops.Similarity.semDedupOn(q, 6).count())
      val tScaled = time(graft.ops.Similarity.semDedupOn(q, scaledBits).count())
      println(f"""{"probe":"bucket_occupancy","scale":$k,"rows":$n,""" +
        f""""fixed_bits":6,"fixed_buckets_used":$used6,"fixed_max_occ":$max6,""" +
        f""""fixed_mean_occ":$mean6%.1f,"fixed_election_sec":$tFixed%.3f,""" +
        f""""scaled_bits":$scaledBits,"scaled_buckets_used":$usedS,""" +
        f""""scaled_max_occ":$maxS,"scaled_mean_occ":$meanS%.1f,""" +
        f""""scaled_election_sec":$tScaled%.3f}""")
    }

    if (which != "bucket") scales.foreach { k =>
      val dir = s"$out/x$k"
      if (!new java.io.File(s"$dir/part_er.parquet").exists()) {
        spark.read.parquet(s"$base/part.parquet")
          .crossJoin(spark.range(k).toDF("__rep"))
          .withColumn("p_partkey", col("p_partkey") + col("__rep") * 100000000L)
          .withColumn("p_name", array_join(
            transform(split(col("p_name"), " "),
              t => concat(t, lit("~"), col("__rep"))), " "))
          .drop("__rep")
          .repartition(32).write.mode("overwrite").parquet(s"$dir/part_er.parquet")
      }
      val partEr = spark.read.parquet(s"$dir/part_er.parquet")
        .select(col("p_brand"), col("p_partkey"), col("p_name"))
      val erParts = partEr.count()
      def sumPairs(counts: DataFrame): Long = counts
        .agg(sum(col("n") * (col("n") - 1))).head().getLong(0) / 2
      val erBrandCand = sumPairs(
        partEr.groupBy("p_brand").agg(count(lit(1)).as("n")))
      val erBanded = graft.ops.EntityRes.banded(partEr)
      val erBandedCand = sumPairs(
        erBanded.groupBy("p_brand", "blk").agg(count(lit(1)).as("n")))
      var erPairs09 = 0L
      val tErPairs = time {
        val a = erBanded.select(col("blk"), col("p_brand"),
          col("p_partkey").as("key_a"), col("p_name").as("name_a"))
          .repartition(32, col("p_brand"), col("blk"))
        val b = erBanded.select(col("blk").as("blk_b"), col("p_brand").as("brand_b"),
          col("p_partkey").as("key_b"), col("p_name").as("name_b"))
          .repartition(32, col("brand_b"), col("blk_b"))
        erPairs09 = a.join(b,
            col("p_brand") === col("brand_b") && col("blk") === col("blk_b"))
          .filter(col("key_a") < col("key_b"))
          .filter(round(call_function("jaro_winkler",
            col("name_a"), col("name_b")) * 1e6).cast("long") >= 900000L)
          .select(col("key_a"), col("key_b")).distinct().count()
        erPairs09
      }
      val erPairTbl = {
        val a = erBanded.select(col("blk"), col("p_brand"),
          col("p_partkey").as("key_a"), col("p_name").as("name_a"))
        val b = erBanded.select(col("blk").as("blk_b"), col("p_brand").as("brand_b"),
          col("p_partkey").as("key_b"), col("p_name").as("name_b"))
        a.join(b, col("p_brand") === col("brand_b") && col("blk") === col("blk_b"))
          .filter(col("key_a") < col("key_b"))
          .filter(round(call_function("jaro_winkler",
            col("name_a"), col("name_b")) * 1e6).cast("long") >= 900000L)
          .select(col("key_a").as("id_a"), col("key_b").as("id_b")).distinct()
          .localCheckpoint(true)
      }
      var erCcRounds = 0
      var erGroups = 0L
      val tErCc = time {
        val (g, rounds) = graft.ops.Dedup.connectedGroupsWithStats(
          erPairTbl, partEr.select(col("p_partkey")), "p_partkey",
          localFinishEdges = 0L)
        erCcRounds = rounds
        erGroups = g.select("group_id").distinct().count()
        erGroups
      }
      println(s"""{"probe":"er_banded","scale":$k,"er_parts":$erParts,""" +
        s""""er_banded_cand":$erBandedCand,"er_brand_cand":$erBrandCand,""" +
        s""""er_pairs09":$erPairs09,"er_pairs_sec":$tErPairs,""" +
        s""""er_cc_rounds":$erCcRounds,"er_cc_groups":$erGroups,"er_cc_sec":$tErCc}""")
    }
    spark.stop()
  }
}
