package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** SWC text codec against the public NeuronStudio example from the
  * format's reference page (cnic/swc.html) — the same vector the
  * reference's own suite parses (test/test_skeletons.py:461-527).
  */
class SwcSpec extends AnyFunSuite {
  val NeuronStudio: String =
    """# ORIGINAL_SOURCE NeuronStudio 0.8.80
      |# VERSION_NUMBER 1.0
      |# SCALE 1.0 1.0 1.0
      |1 1 14.566132 34.873772 7.857000 0.717830 -1
      |2 0 16.022520 33.760513 7.047000 0.463378 1
      |3 5 17.542000 32.604973 6.885001 0.638007 2
      |4 0 19.163984 32.022469 5.913000 0.602284 3
      |5 0 20.448090 30.822802 4.860000 0.436025 4
      |6 6 21.897903 28.881084 3.402000 0.471886 5
      |7 0 18.461960 30.289471 8.586000 0.447463 3
      |8 6 19.420759 28.730757 9.558000 0.496217 7""".stripMargin

  test("fromSwc parses the NeuronStudio vector") {
    val sk = SkeletonCodec.fromSwc(NeuronStudio)
    assert(sk.nv == 8)
    assert(sk.ne == 7)
    assert(sk.vertices.take(3).toSeq == Seq(14.566132f, 34.873772f, 7.857f))
    assert(sk.radii(7) == 0.496217f)
    assert(sk.vertexTypes.toSeq.map(_.toInt) == Seq(1, 0, 5, 0, 0, 6, 0, 6))
    // edges as (parent, child) vertex indices
    assert(sk.edges.grouped(2).map(e => (e(0), e(1))).toSeq ==
      Seq((0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (2, 6), (6, 7)))
  }

  test("to_swc/from_swc roundtrip is stable (reference's 10x loop)") {
    var sk = SkeletonCodec.fromSwc(NeuronStudio)
    val (nv, ne) = (sk.nv, sk.ne)
    (1 to 10).foreach { _ =>
      sk = SkeletonCodec.fromSwc(SkeletonCodec.toSwc(sk))
      assert(sk.nv == nv && sk.ne == ne)
    }
    val ref = SkeletonCodec.fromSwc(NeuronStudio)
    assert(sk.vertices.toSeq == ref.vertices.toSeq)
    assert(sk.radii.toSeq == ref.radii.toSeq)
    assert(sk.vertexTypes.toSeq == ref.vertexTypes.toSeq)
    // undirected edge set preserved (orientation may re-root)
    def undirected(s: SkeletonCodec.Skeleton) =
      s.edges.grouped(2).map(e => (e(0) min e(1), e(0) max e(1))).toSet
    assert(undirected(sk) == undirected(ref))
  }

  test("non-contiguous ids, forward parent references, forests") {
    val text =
      """10 3 1.0 2.0 3.0 0.5 40
        |40 3 4.0 5.0 6.0 0.25 -1
        |7 2 7.0 8.0 9.0 1.0 -1""".stripMargin
    val sk = SkeletonCodec.fromSwc(text)
    assert(sk.nv == 3 && sk.ne == 1)
    // vertex index = line order; parent 40 resolves forward to index 1
    assert(sk.edges.toSeq == Seq(1, 0))
    val back = SkeletonCodec.fromSwc(SkeletonCodec.toSwc(sk))
    assert(back.nv == 3 && back.ne == 1)
  }

  test("malformed input fails the require contract") {
    intercept[IllegalArgumentException] {
      SkeletonCodec.fromSwc("1 1 0.0 0.0 0.0 1.0 99") // undefined parent
    }
    intercept[IllegalArgumentException] {
      SkeletonCodec.fromSwc("1 1 0.0 0.0\n") // wrong field count
    }
    intercept[IllegalArgumentException] {
      SkeletonCodec.fromSwc( // duplicate id
        "1 1 0.0 0.0 0.0 1.0 -1\n1 1 1.0 1.0 1.0 1.0 -1")
    }
  }

  test("cycle edges drop on export (single-parent format contract)") {
    val tri = SkeletonCodec.Skeleton(
      vertices = Array(0f, 0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f),
      edges = Array(0, 1, 1, 2, 2, 0),
      radii = Array(1f, 1f, 1f),
      vertexTypes = Array[Byte](0, 0, 0))
    val back = SkeletonCodec.fromSwc(SkeletonCodec.toSwc(tri))
    assert(back.nv == 3 && back.ne == 2) // spanning tree of the cycle
  }
}
