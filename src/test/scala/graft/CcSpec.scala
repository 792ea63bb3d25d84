package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.ConnectedComponents

/** Known-answer tests for the distributed 6-connected-components
  * operator (cc_components has no SQL oracle; this spec pins its
  * semantics).
  */
class CcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private val SX = 10L; private val SY = 10L

  private def run(voxels: Seq[(Long, Long, Long)]): Map[(Long, Long, Long), Long] = {
    val s = spark
    import s.implicits._
    ConnectedComponents.label6(s, voxels.toDF("x", "y", "z"), SX, SY)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
  }

  test("two separate blobs get two components; diagonal contact does not merge") {
    // blob A: L-shape at z=0; blob B touches A only diagonally (6-conn
    // must NOT merge); blob C far away
    val a = Seq((0L, 0L, 0L), (1L, 0L, 0L), (1L, 1L, 0L))
    val b = Seq((2L, 2L, 0L), (3L, 2L, 0L)) // (2,2) is diagonal to (1,1)
    val c = Seq((7L, 7L, 5L))
    val comp = run(a ++ b ++ c)
    assert(comp.size == 6)
    // component id = min vid of the component
    val vidOf = (p: (Long, Long, Long)) => p._1 + SX * (p._2 + SY * p._3)
    assert(a.map(comp).toSet == Set(a.map(vidOf).min))
    assert(b.map(comp).toSet == Set(b.map(vidOf).min))
    assert(c.map(comp).toSet == Set(c.map(vidOf).min))
    assert(comp(a.head) != comp(b.head))
  }

  test("a long snake converges to one component (stresses pointer jumping)") {
    // a 1-voxel-wide serpentine path across a z-plane: worst-case
    // diameter for naive propagation; pointer jumping needs ~log2(n)
    // rounds
    val snake = (0L until 10L).flatMap { y =>
      val xs = if (y % 2 == 0) 0L until 10L else Seq(9L)
      val row = xs.map(x => (x, y, 0L))
      // connect rows via the edge column alternating 9 and 0
      if (y % 2 == 0) row else Seq((if ((y / 2) % 2 == 0) 9L else 0L, y, 0L))
    }.distinct
    val comp = run(snake)
    assert(comp.values.toSet.size == 1, s"expected 1 component, got ${comp.values.toSet}")
  }

  test("z-axis adjacency connects and component id is the min vid") {
    val col0 = Seq((4L, 4L, 0L), (4L, 4L, 1L), (4L, 4L, 2L))
    val comp = run(col0)
    assert(comp.values.toSet == Set(4L + SX * 4L))
  }

  test("random volumes match an in-memory union-find reference") {
    // seeded random foreground over a 40x40x3 volume (spans 2x2 of
    // the 32^3 local blocks) checked against a sequential union-find
    // over the same 6-adjacency — pins the full two-level pipeline,
    // not hand-picked shapes
    val s = spark
    import s.implicits._
    val bigSX = 40L; val bigSY = 40L
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2) {
      val pts = (for {
        z <- 0L until 3L; y <- 0L until 40L; x <- 0L until 40L
        if rnd.nextDouble() < 0.45
      } yield (x, y, z)).toVector
      val vidOf = (p: (Long, Long, Long)) => p._1 + bigSX * (p._2 + bigSY * p._3)
      // sequential reference: union-find keeping min vid as root
      val parent = scala.collection.mutable.Map(
        pts.map(p => vidOf(p) -> vidOf(p)): _*)
      def find(v: Long): Long = {
        var r = v
        while (parent(r) != r) r = parent(r)
        var c = v
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      for (p <- pts; d <- Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L))) {
        val q = (p._1 + d._1, p._2 + d._2, p._3 + d._3)
        // bounds check BEFORE the vid lookup: vidOf(40, y, z) aliases
        // vidOf(0, y+1, z) — without it the reference phantom-merges
        // across the volume edge
        if (q._1 < bigSX && q._2 < bigSY && parent.contains(vidOf(q))) {
          val (ra, rb) = (find(vidOf(p)), find(vidOf(q)))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
      }
      val expected = pts.map(p => p -> find(vidOf(p))).toMap
      val got = ConnectedComponents
        .label6(s, pts.toDF("x", "y", "z"), bigSX, bigSY)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
        .toMap
      val onlyGot = got.toSet.diff(expected.toSet).take(12)
      val onlyExp = expected.toSet.diff(got.toSet).take(12)
      assert(got == expected,
        s"\nsizes got=${got.size} exp=${expected.size}" +
          s"\nonly in got: $onlyGot\nonly in expected: $onlyExp")
    }
  }

  test("components spanning block boundaries merge across blocks") {
    // the local pass runs per 32^3 block; these shapes force the
    // boundary-root merge: a line crossing x=31/32, 63/64, 95/96, an
    // L crossing both an x and a y block boundary, and a separate
    // line one voxel away from the first (must NOT merge)
    val s = spark
    import s.implicits._
    val bigSX = 100L; val bigSY = 100L
    val lineA = (0L until 100L).map(x => (x, 0L, 0L))
    val lineB = (0L until 100L).map(x => (x, 2L, 0L)) // gap at y=1
    val ell = (20L to 40L).map(x => (x, 30L, 1L)) ++
      (30L to 34L).map(y => (30L, y, 1L))
    val all = (lineA ++ lineB ++ ell).distinct
    val comp = ConnectedComponents
      .label6(s, all.toDF("x", "y", "z"), bigSX, bigSY)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    assert(comp.size == all.size)
    val vidOf = (p: (Long, Long, Long)) => p._1 + bigSX * (p._2 + bigSY * p._3)
    assert(lineA.map(comp).toSet == Set(lineA.map(vidOf).min))
    assert(lineB.map(comp).toSet == Set(lineB.map(vidOf).min))
    assert(ell.map(comp).toSet == Set(ell.map(vidOf).min))
    assert(Set(comp(lineA.head), comp(lineB.head), comp(ell.head)).size == 3)
  }

  test("full fixture volume: adjacency and min-id invariants hold; crop refines") {
    // the full-volume cc_components entry is rows-only in the oracle
    // gate (DuckDB's recursive CTE is quadratic), so pin its
    // correctness with structural invariants over the whole fixture:
    // 1. every 6-adjacent foreground pair shares a component id,
    // 2. each component's id is the min vid of its members (and so a
    //    member), and
    // 3. the oracle-checked small-crop run refines the full run: all
    //    voxels of one crop component land in one full component.
    import org.apache.spark.sql.functions._
    import graft.ops.RealLayerQueries
    val s = spark
    RealLayerQueries.ensure(s, "/root/testdata/sf0.001")
    val SX = RealLayerQueries.SX; val SY = RealLayerQueries.SY
    val fg = s.read.parquet(RealLayerQueries.VoxelsDir)
      .filter(col("label") =!= 0).select("x", "y", "z")
    val comp = ConnectedComponents.label6(s, fg, SX, SY).cache()
    try {
      // 1. adjacency: three shifted equi-joins, zero mismatches
      def shifted(dx: Long, dy: Long, dz: Long) = comp.select(
        (col("x") - dx).as("x"), (col("y") - dy).as("y"),
        (col("z") - dz).as("z"), col("comp").as("comp2"))
      val mismatches = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L))
        .map { case (dx, dy, dz) =>
          comp.join(shifted(dx, dy, dz), Seq("x", "y", "z"))
            .filter(col("comp") =!= col("comp2")).count()
        }.sum
      assert(mismatches == 0, s"$mismatches adjacent pairs split")
      // 2. component id = min member vid
      val vid = col("x") + lit(SX) * (col("y") + lit(SY) * col("z"))
      val badId = comp.groupBy("comp").agg(min(vid).as("mn"))
        .filter(col("comp") =!= col("mn")).count()
      assert(badId == 0)
      // 3. crop partition refines the full partition
      val inCrop = col("x") < 48 && col("y") < 16 && col("z") < 8
      val small = ConnectedComponents
        .label6(s, fg.filter(inCrop), SX, SY)
        .withColumnRenamed("comp", "scomp")
      val coarsened = small.join(comp, Seq("x", "y", "z"))
      assert(coarsened.count() == small.count()) // same voxel set
      val split = coarsened.groupBy("scomp")
        .agg(countDistinct(col("comp")).as("nfull"))
        .filter(col("nfull") > 1).count()
      assert(split == 0, s"$split crop components split across full components")
    } finally comp.unpersist()
  }
}
