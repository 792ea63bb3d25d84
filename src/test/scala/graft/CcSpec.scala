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
}
