package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only scale stress for Dedup.mergeComponents: the daily-batch
  * shape at corpus scale. Base graph = StressCC's ~1.3M-edge mix
  * (chains / viral star / long path); the "overnight batch" lands 10k
  * new edges that (a) bridge existing chain-components, (b) attach new
  * nodes to the star, and (c) open brand-new components. Measures the
  * incremental merge against the full rebuild over old ∪ new and
  * asserts the two label tables are identical — the soak-scale version
  * of IncrementalComponentsSpec's equivalence property.
  */
object StressCCMerge {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // --- base graph (the StressCC mix) -------------------------------
    val chains = spark.range(1500000L)
      .filter(col("id") % 5 =!= 4)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val star = spark.range(100000L)
      .select(lit(10000000L).as("id_a"), (col("id") + 10000001L).as("id_b"))
    val path = spark.range(9999L)
      .select((col("id") + 20000000L).as("id_a"),
        (col("id") + 20000001L).as("id_b"))
    val oldEdges = chains.union(star).union(path).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    oldEdges.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (labels, tBase) = timed {
      val l = graft.operators.Dedup
        .connectedComponents(oldEdges, "id_a", "id_b").cache()
      l.count(); l
    }

    // --- the overnight batch: 10k edges, three flavors ---------------
    // 4k chain bridges (merge pairs of 5-chains), 3k new star leaves,
    // 3k brand-new 2-node components
    val bridges = spark.range(4000L)
      .select((col("id") * 250L).as("id_a"), (col("id") * 250L + 5L).as("id_b"))
    val newLeaves = spark.range(3000L)
      .select(lit(10000000L).as("id_a"), (col("id") + 30000000L).as("id_b"))
    val fresh = spark.range(3000L)
      .select((col("id") * 2L + 40000000L).as("id_a"),
        (col("id") * 2L + 40000001L).as("id_b"))
    val newEdges = bridges.union(newLeaves).union(fresh).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    newEdges.count()

    val (merged, tMerge) = timed {
      val m = graft.operators.Dedup
        .mergeComponents(labels, newEdges, "id_a", "id_b").cache()
      m.count(); m
    }
    val (rebuilt, tRebuild) = timed {
      val r = graft.operators.Dedup
        .connectedComponents(oldEdges.union(newEdges), "id_a", "id_b")
        .cache()
      r.count(); r
    }

    def diff(a: DataFrame, b: DataFrame): Long =
      a.join(b, Seq("id", "component_id"), "left_anti").count() +
        b.join(a, Seq("id", "component_id"), "left_anti").count()
    val mismatches = diff(merged, rebuilt)
    println(f"[stress-cc-merge] base_cc=$tBase%.1fs merge=$tMerge%.1fs " +
      f"rebuild=$tRebuild%.1fs speedup=${tRebuild / tMerge}%.1fx " +
      f"mismatches=$mismatches")
    assert(mismatches == 0, "incremental merge diverged from rebuild")
    spark.stop()
  }
}
