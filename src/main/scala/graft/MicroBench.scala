package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Micro-benchmark: composable HOF cosine (`zip_with`+`aggregate`) vs the
  * native codegen'd `cosine_sim` expression, on a replicated corpus so the
  * per-row constant dominates. Prints one JSON line.
  * Usage: `runMain graft.MicroBench [replicas]` (default 50).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 4)
      .select(col("embedding").as("q_emb"), col("vec_id").as("q_id"))
    // replicate the corpus to make the scalar cost dominate scheduling
    val corpus = spark.range(replicas).crossJoin(emb).select(col("vec_id"), col("embedding"))
    val pairs = corpus.crossJoin(broadcast(q))
    pairs.persist(); pairs.count() // materialize once, excluded from timings

    def time(label: String)(thunk: => Long): (String, Double, Long) = {
      thunk // warm
      val t0 = System.nanoTime(); val n = thunk
      (label, (System.nanoTime() - t0) / 1e9, n)
    }

    val hof = time("hof") {
      pairs.select(Similarity.cosine(col("embedding"), col("q_emb")).as("c"))
        .filter(col("c") > 2.0).count() // impossible filter: forces full eval
    }
    val native = time("native") {
      pairs.select(expr("cosine_sim(embedding, q_emb)").as("c"))
        .filter(col("c") > 2.0).count()
    }
    val nRows = pairs.count()
    println(s"""{"rows":$nRows,"hof_sec":${hof._2},"native_sec":${native._2},""" +
      s""""speedup":${hof._2 / native._2}}""")
    spark.stop()
  }
}
