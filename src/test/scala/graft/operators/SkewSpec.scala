package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join returns exactly the plain-join result") {
    // heavily skewed: 90% of rows share key 1
    val large = (1 to 1000).map(i =>
      (if (i <= 900) 1L else i.toLong % 10, i.toLong)).toDF("k", "payload")
    val small = (0L to 9L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val salted = Skew.saltedJoin(large, small, "k", "payload", 8)
      .select("k", "payload", "name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    // and the hot key really is spread over multiple salt partitions
    val spread = large.withColumn("__salt",
      pmod(hash(col("payload")), lit(8)))
      .filter(col("k") === 1L).select("__salt").distinct().count()
    assert(spread > 1)
  }
}
