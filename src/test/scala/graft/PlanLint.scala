package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec,
  SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Registry-wide physical-plan lint: the anti-pattern set that turns a
  * correct query into a 100 TB job-killer. Used by QueriesSpec against
  * every registered query's executed plan, so any future regression is
  * a 2-second red spec rather than a cluster post-mortem.
  *
  * Checks:
  *  1. `CartesianProduct` — unconstrained cartesian (the original lint).
  *  2. `WindowExec` with an empty partition spec — Spark moves the
  *     ENTIRE input to one partition to evaluate the frame ("moving all
  *     data to a single partition" in WindowExec's own warning). Global
  *     rankings must plan as TakeOrderedAndProject (orderBy+limit) or a
  *     distributed two-pass rank instead.
  *  3. Shuffle joins (SortMergeJoin / ShuffledHashJoin) whose build side
  *     is a `LocalTableScan` — a driver-local bounded artifact (model
  *     state, centroid set, manifest) that should ride a broadcast, not
  *     drag the big side through an exchange.
  *
  * Traversal penetrates AQE wrappers (AdaptiveSparkPlanExec is a leaf
  * node — `collect` alone would see nothing inside it) and subqueries.
  */
object PlanLint {

  /** Every node of the physical plan, descending into AQE-wrapped
    * subtrees and subquery plans.
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val here = p match {
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case other => other +: other.children.flatMap(allNodes)
    }
    here ++ p.subqueries.flatMap(allNodes)
  }

  /** Human-readable violations for `df`'s executed plan; empty = clean. */
  def violations(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val nodes = allNodes(plan)

    val cartesian =
      if (plan.toString.contains("CartesianProduct"))
        Seq("CartesianProduct: unconstrained cartesian join")
      else Nil

    val globalWindows = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        s"partition-less WindowExec (single-partition global window): " +
          w.windowExpression.map(_.sql).mkString(", ")
    }

    val localScanShuffleJoins = nodes.collect {
      case j: SortMergeJoinExec if hasLocalScanSide(j.left, j.right) =>
        "SortMergeJoin with a LocalTableScan side (bounded artifact " +
          "should be broadcast)"
      case j: ShuffledHashJoinExec if hasLocalScanSide(j.left, j.right) =>
        "ShuffledHashJoin with a LocalTableScan side (bounded artifact " +
          "should be broadcast)"
    }

    cartesian ++ globalWindows ++ localScanShuffleJoins
  }

  private def hasLocalScanSide(sides: SparkPlan*): Boolean =
    sides.exists(s => allNodes(s).exists(_.isInstanceOf[LocalTableScanExec]))

  def assertClean(name: String, df: DataFrame): Unit = {
    val v = violations(df)
    assert(v.isEmpty,
      s"$name fails the plan lint:\n  ${v.mkString("\n  ")}")
  }

  /** Violations collected from PRE-checkpoint frames — the lineage-cut
    * blind spot: operators that end in `Dedup.releaseAfterAll` hand the
    * caller a checkpointed frame whose executed plan is a bare
    * `Scan ExistingRDD`, so [[violations]] on the result cannot see the
    * internal stages. [[installPreCheckpointHook]] wires the main-tree
    * seam (`graft.operators.PreCheckpointLint`) to lint every frame
    * right before its lineage is cut; suites clear the buffer, run a
    * query, then assert it stayed empty.
    */
  val preCheckpointViolations =
    new scala.collection.mutable.ArrayBuffer[String]

  def installPreCheckpointHook(): Unit =
    graft.operators.PreCheckpointLint.installed = df =>
      preCheckpointViolations.synchronized {
        preCheckpointViolations ++= violations(df)
      }

  def assertPreCheckpointClean(name: String): Unit =
    preCheckpointViolations.synchronized {
      assert(preCheckpointViolations.isEmpty,
        s"$name fails the plan lint inside a released " +
          s"(pre-checkpoint) frame:\n  " +
          preCheckpointViolations.mkString("\n  "))
    }
}
