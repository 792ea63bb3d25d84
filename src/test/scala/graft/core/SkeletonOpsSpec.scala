package graft.core

import org.scalatest.funsuite.AnyFunSuite
import SkeletonCodec.Skeleton

/** Skeleton graph operations against the reference's own test vectors
  * (test/test_skeletons.py — downsample :350-456, components :561-585,
  * consolidate :171-238; all delegated by the reference to its public
  * osteoid dependency, skeleton.py:1).
  */
class SkeletonOpsSpec extends AnyFunSuite {
  private def mk(vs: Seq[(Float, Float, Float)], es: Seq[(Int, Int)],
      radii: Seq[Float] = Nil, types: Seq[Int] = Nil): Skeleton =
    Skeleton(
      vs.flatMap(v => Seq(v._1, v._2, v._3)).toArray,
      es.flatMap(e => Seq(e._1, e._2)).toArray,
      (if (radii.nonEmpty) radii else vs.map(_ => 1f)).toArray,
      (if (types.nonEmpty) types.map(_.toByte)
       else vs.map(_ => 0.toByte)).toArray)

  private def edgeSet(s: Skeleton): Set[(Int, Int)] =
    s.edges.grouped(2).map(e => (e(0) min e(1), e(0) max e(1))).toSet

  val chain: Skeleton = mk(
    Seq((0, 0, 0), (1, 0, 0), (1, 1, 0), (1, 1, 3), (2, 1, 3), (2, 2, 3)),
    Seq((1, 0), (1, 2), (2, 3), (3, 4), (5, 4)),
    radii = Seq(1, 2, 3, 4, 5, 6), types = Seq(1, 2, 3, 4, 5, 6))

  test("downsample chain (reference test_downsample)") {
    val d1 = SkeletonCodec.downsample(chain, 1)
    assert(d1.nv == 6 && d1.ne == 5)

    val d2 = SkeletonCodec.downsample(chain, 2)
    assert(d2.radii.toSeq == Seq(1f, 3f, 5f, 6f))
    assert(d2.vertexTypes.toSeq.map(_.toInt) == Seq(1, 3, 5, 6))
    assert(edgeSet(d2) == Set((0, 1), (1, 2), (2, 3)))

    val d3 = SkeletonCodec.downsample(chain, 3)
    assert(d3.radii.toSeq == Seq(1f, 4f, 6f))
    assert(edgeSet(d3) == Set((0, 1), (1, 2)))

    intercept[IllegalArgumentException](SkeletonCodec.downsample(chain, 0))
    intercept[IllegalArgumentException](SkeletonCodec.downsample(chain, -1))
  }

  test("downsample two components (reference test_downsample pt 2)") {
    val two = mk(
      Seq((0, 0, 0), (1, 0, 0), (1, 1, 0), (1, 1, 3), (2, 1, 3), (2, 2, 3)),
      Seq((1, 0), (1, 2), (3, 4), (5, 4)),
      radii = Seq(1, 2, 3, 4, 5, 6), types = Seq(1, 2, 3, 4, 5, 6))
    val d2 = SkeletonCodec.downsample(two, 2)
    assert(d2.radii.toSeq == Seq(1f, 3f, 4f, 6f))
    assert(edgeSet(d2) == Set((0, 1), (2, 3)))
  }

  test("downsample preserves joints (reference test_downsample_joints)") {
    val cross = mk(
      Seq((2, 3, 0), (2, 2, 0), (2, 1, 0),
        (0, 0, 0), (1, 0, 0), (2, 0, 0), (3, 0, 0), (4, 0, 0),
        (2, -1, 0), (2, -2, 0), (2, -3, 0)),
      Seq((0, 1), (1, 2), (2, 5), (3, 4), (4, 5), (5, 6), (6, 7),
        (5, 8), (8, 9), (9, 10)),
      radii = (0 to 10).map(_.toFloat), types = 0 to 10)
    val ds = SkeletonCodec.downsample(cross, 2)
    assert(ds.radii.toSeq == Seq(0f, 2f, 3f, 5f, 7f, 9f, 10f))
    assert(ds.vertexTypes.toSeq.map(_.toInt) == Seq(0, 2, 3, 5, 7, 9, 10))
    assert(edgeSet(ds) ==
      Set((0, 1), (1, 3), (2, 3), (3, 4), (3, 5), (5, 6)))
  }

  test("components (reference test_components)") {
    val skel = mk(
      Seq((0, 0, 0), (1, 0, 0), (2, 0, 0), (0, 1, 0), (0, 2, 0), (0, 3, 0)),
      Seq((0, 1), (1, 2), (3, 4), (4, 5), (3, 5)))
    val cs = SkeletonCodec.components(skel)
    assert(cs.length == 2)
    assert(cs(0).nv == 3 && cs(0).ne == 2)
    assert(cs(1).nv == 3 && cs(1).ne == 3)
    assert(cs(0).vertices.toSeq == Seq(0f, 0, 0, 1, 0, 0, 2, 0, 0))
    assert(cs(1).vertices.toSeq == Seq(0f, 1, 0, 0, 2, 0, 0, 3, 0))
    assert(edgeSet(cs(1)) == Set((0, 1), (0, 2), (1, 2)))
  }

  test("consolidate merges duplicate vertices (reference test_consolidate)") {
    val skel = mk(
      Seq((0, 0, 0), (1, 0, 0), (2, 0, 0), (0, 0, 0),
        (2, 1, 0), (2, 2, 0), (2, 2, 1), (2, 2, 2)),
      Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7)),
      radii = (0 to 7).map(_.toFloat), types = 0 to 7)
    val c = SkeletonCodec.consolidate(skel)
    assert(c.nv == 7)
    assert(c.radii.toSeq == Seq(0f, 1, 2, 4, 5, 6, 7))
    assert(c.vertexTypes.toSeq.map(_.toInt) == Seq(0, 1, 2, 4, 5, 6, 7))
    // reference's correct_skel edge list, lexicographically sorted
    assert(c.edges.grouped(2).map(e => (e(0), e(1))).toSeq ==
      Seq((0, 1), (0, 2), (0, 3), (1, 2), (3, 4), (4, 5), (5, 6)))
  }

  test("downsample preserves joints (test_skeletons.py:408)") {
    // cross-shaped skeleton: vertex 5 is a degree-4 joint; the
    // reference ground truth keeps radii {0,2,3,5,7,9,10}
    val skel = mk(
      Seq((2, 3, 0), (2, 2, 0), (2, 1, 0), (0, 0, 0), (1, 0, 0),
        (2, 0, 0), (3, 0, 0), (4, 0, 0), (2, -1, 0), (2, -2, 0),
        (2, -3, 0)),
      Seq((0, 1), (1, 2), (2, 5), (3, 4), (4, 5), (5, 6), (6, 7),
        (5, 8), (8, 9), (9, 10)),
      radii = (0 to 10).map(_.toFloat), types = 0 to 10)
    val d = SkeletonCodec.downsample(skel, 2)
    assert(d.radii.toSet == Set(0f, 2, 3, 5, 7, 9, 10),
      s"kept radii ${d.radii.toSeq.sorted}")
    def v(i: Int) = (d.vertices(3 * i), d.vertices(3 * i + 1))
    val edges = (0 until d.ne).map { i =>
      val a = v(d.edges(2 * i)); val b = v(d.edges(2 * i + 1))
      Set(a, b)
    }.toSet
    val gt = Set(
      Set((2f, 3f), (2f, 1f)), Set((2f, 1f), (2f, 0f)),
      Set((0f, 0f), (2f, 0f)), Set((2f, 0f), (4f, 0f)),
      Set((2f, 0f), (2f, -2f)), Set((2f, -2f), (2f, -3f)))
    assert(edges == gt, s"edges $edges")
  }

  test("remove_disconnected_vertices (test_skeletons.py:240)") {
    // 7 vertices, vertex 6 isolated; two components among 0..5
    val skel = mk(
      Seq((0, 0, 0), (1, 0, 0), (2, 0, 0), (0, 1, 0), (0, 2, 0),
        (0, 3, 0), (-1, -1, -1)),
      Seq((0, 1), (1, 2), (3, 4), (4, 5), (3, 5)),
      radii = (0 to 6).map(_.toFloat), types = 0 to 6)
    val r = SkeletonCodec.removeDisconnected(skel)
    assert(r.nv == 6 && r.ne == 5)
    assert(r.radii.length == 6 && r.vertexTypes.length == 6)
    assert(r.edges.toSeq == skel.edges.toSeq) // 6 was last: indices keep
    // isolated vertex mid-array: later indices shift down by one
    val skel2 = mk(
      Seq((0, 0, 0), (9, 9, 9), (1, 0, 0), (2, 0, 0)),
      Seq((0, 2), (2, 3)))
    val r2 = SkeletonCodec.removeDisconnected(skel2)
    assert(r2.nv == 3)
    assert(r2.edges.toSeq == Seq(0, 1, 1, 2))
    // no edges -> nothing kept
    assert(SkeletonCodec.removeDisconnected(
      mk(Seq((0, 0, 0)), Nil)).nv == 0)
  }

  test("paths: isolated vertex and cycle shapes") {
    val iso = mk(Seq((0, 0, 0)), Nil)
    assert(SkeletonCodec.paths(iso).map(_.toSeq) == Seq(Seq(0)))
    val cyc = mk(Seq((0, 0, 0), (1, 0, 0), (0, 1, 0)),
      Seq((0, 1), (1, 2), (2, 0)))
    val ps = SkeletonCodec.paths(cyc)
    assert(ps.length == 1 && ps.head.length == 4)
    assert(ps.head.head == ps.head.last) // closes on the root
  }
}
