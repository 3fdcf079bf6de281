package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale stress for Dedup.connectedComponents: a ~1.3M-edge
  * graph mixing the three shapes a 100 TB near-dup graph produces —
  * millions of tiny clusters (chains of 5), one viral mega-cluster (a
  * 100k-leaf star, the "same boilerplate page everywhere" case, which
  * also exercises the skewed pointer-jump join key), and one
  * 10k-node path (worst-case diameter for the pointer-jumping bound:
  * must converge in O(log 10k) ~ 14 rounds, not 10k).
  */
object StressCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // chains of 5 over ids [0, 1.5M): edges i->i+1 except every 5th
    val chains = spark.range(1500000L)
      .filter(col("id") % 5 =!= 4)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    // star: hub 10_000_000 with 100k leaves
    val star = spark.range(100000L)
      .select(lit(10000000L).as("id_a"),
        (col("id") + 10000001L).as("id_b"))
    // path: 10k consecutive nodes at 20_000_000
    val path = spark.range(9999L)
      .select((col("id") + 20000000L).as("id_a"),
        (col("id") + 20000001L).as("id_b"))
    val edges = chains.union(star).union(path)
    val n = edges.count()
    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup
      .connectedComponents(edges.toDF(), "id_a", "id_b")
      .cache()
    val nodes = labels.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val comps = labels.select(countDistinct(col("component_id"))).head().getLong(0)
    val starOk = labels.filter(col("id") >= 10000000L &&
      col("id") <= 10100000L && col("component_id") =!= 10000000L).count()
    val pathOk = labels.filter(col("id") >= 20000000L &&
      col("id") <= 20009999L && col("component_id") =!= 20000000L).count()
    println(f"[stress-cc] edges=$n nodes=$nodes components=$comps " +
      f"time=$secs%.1fs star_mislabels=$starOk path_mislabels=$pathOk")
    assert(starOk == 0 && pathOk == 0, "component labels wrong")
    spark.stop()
  }
}
