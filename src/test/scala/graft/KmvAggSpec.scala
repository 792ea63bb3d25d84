package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KmvSketchAgg (graft_kmv): the native k-minimum-values aggregate —
  * known answers, in-tree dedup, cross-partition merge, null inputs,
  * and the ObjectHashAggregate plan shape.
  */
class KmvAggSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  test("keeps the k smallest distinct values across partitions") {
    val s = spark
    // 0..999 shuffled over 8 partitions, every value TWICE (dedup law),
    // hashed to a deterministic permutation
    val df = s.range(0, 2000, 1, 8)
      .selectExpr("id % 1000 AS v")
      .selectExpr("(v * 2654435761) % 1000003 AS h")
    val got = df.selectExpr("graft_kmv(h, 16) AS ks")
      .head().getSeq[Long](0)
    val expect = (0L until 1000L).map(v => (v * 2654435761L) % 1000003L)
      .distinct.sorted.take(16)
    assert(got == expect, s"got $got")
  }

  test("unfilled sketch returns every distinct value, sorted") {
    val got = spark.range(0, 5)
      .selectExpr("cast(4 - id as long) AS h")
      .union(spark.range(0, 5).selectExpr("cast(4 - id as long) AS h"))
      .selectExpr("graft_kmv(h, 64) AS ks").head().getSeq[Long](0)
    assert(got == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("null inputs are skipped; empty input yields an empty sketch") {
    val got = spark.sql(
      "SELECT graft_kmv(h, 8) FROM VALUES (1L), (CAST(NULL AS BIGINT)), " +
        "(2L) AS t(h)").head().getSeq[Long](0)
    assert(got == Seq(1L, 2L))
    val empty = spark.sql(
      "SELECT graft_kmv(h, 8) FROM (SELECT 1L AS h) WHERE h < 0")
      .head().getSeq[Long](0)
    assert(empty.isEmpty)
  }

  test("plans as ObjectHashAggregate with a partial stage (no distinct shuffle)") {
    val df = spark.range(0, 100, 1, 4).selectExpr("id AS h")
      .selectExpr("graft_kmv(h, 8) AS ks")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_graft_kmv") || plan.contains("partial"),
      s"partial aggregation stage missing:\n$plan")
    // the pre-shuffle stage must NOT be a distinct/sort of the input
    assert(!plan.contains("TakeOrdered"), plan)
  }
}
