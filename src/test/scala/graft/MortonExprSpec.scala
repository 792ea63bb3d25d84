package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Morton, Vec3}

/** Native Catalyst morton expression: codegen + null handling. */
class MortonExprSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-morton-expr")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("graft_morton matches the core encoder inside codegen") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    val df = s.range(64).select(
      (col("id") % 4).as("gx"), ((col("id") / 4).cast("long") % 4).as("gy"),
      (col("id") / 16).cast("long").as("gz"))
      .selectExpr("gx", "gy", "gz", "graft_morton(gx, gy, gz, 4L, 4L, 4L) AS m")
    // the expression stays inside whole-stage codegen (no UDF barrier):
    // the projection carrying it renders with the codegen marker "*("
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("mortoncodeexpr") && l.trim.startsWith("*(")), plan)
    df.collect().foreach { r =>
      val expected = Morton.encode(
        Vec3(r.getLong(0), r.getLong(1), r.getLong(2)), Vec3(4, 4, 4))
      assert(r.getLong(3) === expected)
    }
  }

  test("graft_mmh3 / graft_shard_of match the core implementations") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    import graft.core.ShardingSpec
    val spec = ShardingSpec(preshiftBits = 2, minishardBits = 3,
      shardBits = 3, hashName = "murmurhash3_x86_128")
    val rows = s.sql(
      """SELECT id, graft_mmh3(id) AS h,
        |  graft_shard_of(id, 2, 3, 3, 1) AS sh,
        |  graft_minishard_of(id, 2, 3, 1) AS msn
        |FROM range(0, 100)""".stripMargin).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === graft.core.MurmurHash3_128.hashUint64LE(id))
      val (sh, msn) = spec.shardLocation(id)
      assert(r.getLong(2) === sh)
      assert(r.getLong(3) === msn)
    }
  }

  test("graft_morton accepts int literals (interpreted constant folding)") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    // all-literal call is constant-folded through interpreted eval,
    // which must widen Integer args like codegen does
    val r = s.sql("SELECT graft_morton(1, 2, 3, 4, 4, 4) AS m").collect()
    assert(r.head.getLong(0) ===
      Morton.encode(Vec3(1, 2, 3), Vec3(4, 4, 4)))
  }

  test("graft_morton propagates nulls") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    val rows = s.sql(
      "SELECT graft_morton(CAST(NULL AS BIGINT), 0L, 0L, 4L, 4L, 4L) AS m")
      .collect()
    assert(rows.head.isNullAt(0))
  }

  test("graft_dot/norm2/dist2 match scala loops inside codegen; null-safe") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    val df = s.sql(
      """SELECT a, b, graft_dot(a, b) AS d, graft_norm2(a) AS n2,
        |  graft_dist2(a, b) AS l2
        |FROM (SELECT array(id, id * 2 - 5, 7 - id) AS a,
        |             array(3 - id, id, id * id) AS b
        |      FROM range(0, 32))""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("dotexpr") && l.trim.startsWith("*(")), plan)
    df.collect().foreach { r =>
      val a = r.getSeq[Long](0); val b = r.getSeq[Long](1)
      assert(r.getLong(2) === a.zip(b).map { case (x, y) => x * y }.sum)
      assert(r.getLong(3) === a.map(x => x * x).sum)
      assert(r.getLong(4) ===
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    }
    val n = s.sql(
      "SELECT graft_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d")
      .collect()
    assert(n.head.isNullAt(0))
  }

  test("graft_dot rejects non-bigint arrays at analysis, not as garbage") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    // array(1, 2) binds array<int>; before ExpectsInputTypes this
    // passed analysis and ArrayData.getLong over 4-byte elements
    // returned silent garbage under codegen
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      s.sql("SELECT graft_dot(array(1, 2), array(3, 4)) AS d").collect()
    }
    assert(e.getMessage.toLowerCase.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("dotexpr") ||
      e.getMessage.toLowerCase.contains("data type mismatch"), e.getMessage)
    assertThrows[org.apache.spark.sql.AnalysisException] {
      s.sql("SELECT graft_norm2(array(1.5D, 2.5D)) AS n").collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      s.sql("SELECT graft_dist2(array(1, 2), array(3L, 4L)) AS l").collect()
    }
  }

  test("graft_dot/dist2 reject mismatched vector lengths") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    val thrown = intercept[Throwable] {
      s.sql("SELECT graft_dot(array(1L, 2L), array(3L)) AS d").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(thrown).exists(_.contains("vector lengths differ")),
      msgs(thrown).mkString(" | "))
  }
}
