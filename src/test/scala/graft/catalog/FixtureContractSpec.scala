package graft.catalog

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Guards against driver-side fixture drift (the events.ts encoding
  * change between rounds 10 and 11 cost two rounds before anyone
  * noticed). Green = every table in every sf dir reads with a type the
  * engine handles; a drifted fixture fails HERE, in seconds, with the
  * file named. */
class FixtureContractSpec extends SparkSpecBase {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"all fixture tables in $sf match the engine's type contract") {
      val violations = FixtureContract.check(spark, s"/root/testdata/$sf")
      assert(violations.isEmpty,
        s"fixture drift detected:\n${violations.mkString("\n")}")
    }
  }

  test("a drifted fixture fails with a message naming the file") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift")
    val dir = tmp.toString
    // copy the real sf0.001 fixtures, then rewrite events.ts to string —
    // an encoding the engine does NOT handle
    for (t <- FixtureContract.contract.keys) {
      val src = spark.read.parquet(s"$sfDir/$t.parquet")
      val out = if (t == "events") src.withColumn("ts", lit("not-a-ts"))
        else src
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val violations = FixtureContract.check(spark, dir)
    assert(violations.size == 1, violations.mkString("\n"))
    assert(violations.head.contains(s"$dir/events.parquet"),
      s"violation must name the drifted file: ${violations.head}")
    assert(violations.head.contains("`ts`"),
      s"violation must name the drifted column: ${violations.head}")
  }

  test("a missing column fails with the file and column named") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-drift2")
    val dir = tmp.toString
    for (t <- FixtureContract.contract.keys) {
      val src = spark.read.parquet(s"$sfDir/$t.parquet")
      val out = if (t == "documents") src.drop("lang") else src
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val violations = FixtureContract.check(spark, dir)
    assert(violations.size == 1, violations.mkString("\n"))
    assert(violations.head.contains("documents.parquet") &&
      violations.head.contains("`lang` missing"), violations.head)
  }
}
