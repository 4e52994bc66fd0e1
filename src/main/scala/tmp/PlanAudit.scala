import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      try {
        val p = fn(spark, d).queryExecution.explainString(SimpleMode)
        val sortAggs = "SortAggregate\\(key=\\[[^\\]]".r.findAllIn(p).size  // non-empty key
        if (sortAggs > 0) println(s"AUDIT $n keyed-SortAggregate=$sortAggs")
      } catch { case e: Throwable => println(s"AUDIT $n ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
