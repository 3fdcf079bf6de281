package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted physical plans for the headline queries so
  * pushdown/broadcast/codegen can be audited per round.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("incremental_scan", "q1_pricing_summary",
        "q3_shipping_priority", "q5_local_suppliers", "merge_upsert",
        "dedup_ngram_jaccard", "ann_cosine_topk")
    names.foreach { n =>
      println(s"\n===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
