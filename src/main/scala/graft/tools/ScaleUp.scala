package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Key-shifted replication of the driver's TPC-H-ish fixture to a
  * larger scale factor, for spot-benching the heavy registry queries
  * beyond sf0.1 (the driver ships sf0.001/0.01/0.1 only). Each
  * replica shifts every join key by a per-table stride, so join
  * fan-outs and selectivities scale EXACTLY linearly: q5/q7/q18 at
  * factor 10 over sf0.1 see sf1.0-shaped cardinalities (6M-row
  * lineitem). `documents` replicas append a per-replica suffix to the
  * text, so near-dup structure replicates instead of every doc
  * gaining `factor` exact copies (which would change the workload's
  * character, not its scale). Fixed dims (region, nation) copy as-is,
  * like TPC-H itself.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> <factor>
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleUp <srcSfDir> <dstDir> <factor>")
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$dst/$name.parquet")

    // per-table key strides: one above the source max, so replica i's
    // keys are disjoint and a key's replica is recoverable as key/stride
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1

    val (cust, supp, ord, li, docs) = (read("customer"),
      read("supplier"), read("orders"), read("lineitem"),
      read("documents"))
    val (part, events, emb) = (read("part"), read("events"),
      read("embeddings"))
    // the part-key stride must clear BOTH tables' key spaces: a part
    // key above max(l_partkey) (a part no lineitem references) would
    // otherwise collide with the next replica's shifted keys,
    // duplicating p_partkey and fanning out every lineitem-part join
    val ps = math.max(stride(li, "l_partkey"),
      stride(part, "p_partkey"))
    val (cs, ss, os, ds) = (stride(cust, "c_custkey"),
      stride(supp, "s_suppkey"), stride(ord, "o_orderkey"),
      stride(docs, "doc_id"))
    val (es, us, vs) = (stride(events, "event_id"),
      stride(events, "user_id"), stride(emb, "vec_id"))

    def replicate(df: DataFrame)(shift: (DataFrame, Int) => DataFrame)
        : DataFrame =
      (0 until factor).map(i => shift(df, i)).reduce(_ unionByName _)

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(cust) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * cs))
    }, "customer")
    write(replicate(supp) { (d, i) =>
      d.withColumn("s_suppkey", col("s_suppkey") + lit(i * ss))
    }, "supplier")
    write(replicate(ord) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * os))
        .withColumn("o_custkey", col("o_custkey") + lit(i * cs))
    }, "orders")
    write(replicate(li) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * os))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * ss))
        .withColumn("l_partkey", col("l_partkey") + lit(i * ps))
    }, "lineitem")
    write(replicate(docs) { (d, i) =>
      val shifted = d.withColumn("doc_id", col("doc_id") + lit(i * ds))
      if (i == 0) shifted
      else shifted.withColumn("text",
        concat(col("text"), lit(s" rep $i")))
    }, "documents")
    // r16 additions so the FULL headline set runs at scaled factors:
    // part shares lineitem's l_partkey stride (per-replica join keys
    // align exactly); events shift both ids (user-windowed shapes gain
    // users, not longer per-user histories — the scale direction real
    // traffic has); embeddings shift vec_id only (replica vectors are
    // exact duplicates — near-dup/ANN structure replicates, the
    // documents trade).
    write(replicate(part) { (d, i) =>
      d.withColumn("p_partkey", col("p_partkey") + lit(i * ps))
    }, "part")
    write(replicate(events) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * es))
        .withColumn("user_id", col("user_id") + lit(i * us))
    }, "events")
    // replica i applies a deterministic per-dimension SIGN PATTERN:
    // cos(s_i∘x, s_i∘y) = cos(x, y), so every replica carries the
    // source's exact near-dup/ANN structure, while cross-replica
    // similarities decorrelate — without this, replica vectors are
    // exact duplicates and every near-dup cluster's pair output grows
    // quadratically in the factor (a fixture artifact, not a workload:
    // the r16 factor-10 run measured dedup_incremental_embedding
    // x15.7 on duplicated replicas). Replica 0 is untouched.
    write(replicate(emb) { (d, i) =>
      val shifted = d.withColumn("vec_id", col("vec_id") + lit(i * vs))
      if (i == 0) shifted
      else shifted.withColumn("embedding",
        transform(col("embedding"), (x, dim) =>
          when(pmod(hash(lit(i), dim), lit(2)) === 0, x)
            .otherwise(-x)))
    }, "embeddings")

    println(s"[scaleup] wrote factor-$factor fixture to $dst " +
      s"(lineitem rows: ${spark.read.parquet(s"$dst/lineitem.parquet").count()})")
    spark.stop()
  }
}
