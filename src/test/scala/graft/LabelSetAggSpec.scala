package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** LabelSetAgg (graft_label_set): the native exact distinct-label
  * aggregate — agreement with explode+distinct, unsigned output
  * order over full-uint64 labels, array vs scalar inputs, partition
  * independence, and the primitive LongHashSet's grow/dedup laws.
  */
class LabelSetAggSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  test("array input: union of per-row label arrays == explode+distinct") {
    val s = spark
    // 200 rows over 8 partitions, each an overlapping 5-label window
    val df = s.range(0, 200, 1, 8)
      .selectExpr("transform(sequence(id, id + 4), x -> x % 97) AS labels")
    val got = df.selectExpr("graft_label_set(labels) AS ls")
      .head().getSeq[Long](0)
    assert(got == (0L until 97L))
  }

  test("scalar input and duplicate collapse across partitions") {
    val got = spark.range(0, 3000, 1, 16)
      .selectExpr("id % 300 AS label")
      .selectExpr("graft_label_set(label) AS ls")
      .head().getSeq[Long](0)
    assert(got == (0L until 300L))
  }

  test("unsigned order across the uint64 domain (incl. MinValue, -1)") {
    val got = spark.sql(
      "SELECT graft_label_set(l) FROM VALUES (0L), (-1L), " +
        s"(${Long.MinValue}L), (5L), (${Long.MaxValue}L) AS t(l)")
      .head().getSeq[Long](0)
    // uint64 ascending: 0, 5, 2^63-1, 2^63 (=MinValue), 2^64-1 (=-1)
    assert(got == Seq(0L, 5L, Long.MaxValue, Long.MinValue, -1L))
  }

  test("null ARRAY ELEMENTS are skipped, not read as label 0") {
    val got = spark.sql(
      "SELECT graft_label_set(labels) FROM VALUES " +
        "(array(1L, CAST(NULL AS BIGINT), 2L)) AS t(labels)")
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 2L)) // a getLong on the null slot would add 0
  }

  test("nulls skipped; grouped aggregation keeps per-group sets") {
    val got = spark.sql(
      """SELECT g, graft_label_set(labels) AS ls FROM VALUES
        |  (0, array(1L, 2L)), (0, array(2L, 3L)),
        |  (1, array(9L)), (0, CAST(NULL AS array<bigint>))
        |AS t(g, labels) GROUP BY g ORDER BY g""".stripMargin)
      .collect()
    assert(got(0).getSeq[Long](1) == Seq(1L, 2L, 3L))
    assert(got(1).getSeq[Long](1) == Seq(9L))
  }

  test("set algebra over sets straddling 2^63 (the t3b path, u64 domain)") {
    // two conditional sets from one pass, then intersect/except/union —
    // membership is value-based so top-bit labels must behave exactly
    // like small ones (r15 verdict item 7)
    val big = Long.MinValue + 3 // 2^63 + 3 unsigned
    val row = spark.sql(
      s"""SELECT
         |  graft_label_set(CASE WHEN part = 0 THEN l END) AS sa,
         |  graft_label_set(CASE WHEN part = 1 THEN l END) AS sb
         |FROM VALUES
         |  (0, 1L), (0, -1L), (0, ${big}L), (0, ${Long.MaxValue}L),
         |  (1, 1L), (1, ${big}L), (1, 7L)
         |AS t(part, l)""".stripMargin)
      .selectExpr(
        "array_intersect(sa, sb) AS inter",
        "array_except(sa, sb) AS only_a",
        "array_except(sb, sa) AS only_b",
        "cast(size(array_union(sa, sb)) as bigint) AS n_union")
      .head()
    assert(row.getSeq[Long](0).sorted == Seq(big, 1L).sorted)
    assert(row.getSeq[Long](1).toSet == Set(-1L, Long.MaxValue))
    assert(row.getSeq[Long](2) == Seq(7L))
    assert(row.getLong(3) == 5L)
  }

  test("mistyped argument fails analysis, not construction") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_label_set(s) FROM VALUES ('x') AS t(s)")
        .collect()
    }
    assert(e.getMessage.contains("graft_label_set"), e.getMessage)
  }

  test("LongLongMap: put/get/contains over the full key domain, growth") {
    val m = new graft.functions.LongLongMap(16)
    val rnd = new scala.util.Random(11)
    val keys = Array.fill(20000)(rnd.nextLong()) :+ 0L :+ -1L :+
      Long.MinValue :+ Long.MaxValue
    keys.zipWithIndex.foreach { case (k, i) => m.put(k, i.toLong) }
    val last = keys.zipWithIndex.groupBy(_._1)
      .map { case (k, kv) => k -> kv.last._2.toLong }
    assert(m.size == last.size)
    last.foreach { case (k, v) =>
      assert(m.contains(k))
      assert(m.getOrElse(k, -999L) == v)
    }
    assert(!m.contains(123456789012345L) ||
      last.contains(123456789012345L))
    assert(m.getOrElse(42L, -7L) == last.getOrElse(42L, -7L))
  }

  test("LongHashSet grows past initial capacity without losing keys") {
    val hs = new graft.functions.LongHashSet(16)
    val rnd = new scala.util.Random(7)
    val vals = Array.fill(50000)(rnd.nextLong())
    vals.foreach(hs.add); vals.foreach(hs.add) // idempotent re-add
    assert(hs.size == vals.distinct.length)
    assert(hs.toArray.sorted.toSeq == vals.distinct.sorted.toSeq)
  }

  test("plans as ObjectHashAggregate (buffer object, not sort-based)") {
    val df = spark.range(0, 100, 1, 4)
      .selectExpr("transform(sequence(id, id + 2), x -> x) AS labels")
      .selectExpr("graft_label_set(labels) AS ls")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
