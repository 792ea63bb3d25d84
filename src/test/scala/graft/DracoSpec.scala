package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Draco

/** Golden parity for the draco decoder against the reference's own
  * committed fixtures (test/test_cv/mesh_mip_2_draco_sv16): every
  * fragment must decode with exact counts and exhausted buffers, and
  * replaying the reference's chunk-boundary dedup (mesh.py:379-419)
  * must yield exactly the 3 connected components its own test asserts
  * (test/test_graphene.py:490-501, ccs==3). */
class DracoSpec extends AnyFunSuite {

  private val dir = Paths.get("/root/reference/test/test_cv/mesh_mip_2_draco_sv16")

  private def fragments: Seq[java.nio.file.Path] = {
    val st = Files.list(dir)
    try {
      val it = st.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[java.nio.file.Path]()
      while (it.hasNext) {
        val p = it.next()
        if (p.getFileName.toString.count(_ == ':') == 2) buf += p
      }
      buf.sortBy(_.getFileName.toString).toSeq
    } finally st.close()
  }

  test("valence-traversal streams are rejected loudly (documented scope)") {
    // flip the committed fragment's traversal byte to 1 (valence): the
    // scope note in core/Draco.scala promises a loud, actionable
    // rejection rather than a garbage decode. The byte offset is found
    // by walking the header exactly as the decoder does: DRACO(5)
    // maj min enc method flags(2), then the flagged metadata section
    // (varint 0, n entries of len-prefixed key/value, varint 0).
    val bytes = Files.readAllBytes(fragments.head).clone()
    var p = 9
    val flags = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2
    def varint(): Long = {
      var out = 0L; var shift = 0; var more = true
      while (more) {
        val b = bytes(p) & 0xff; p += 1
        out |= (b & 0x7fL) << shift; shift += 7; more = (b & 0x80) != 0
      }
      out
    }
    assert((flags & 0x8000) != 0, "committed fragments carry metadata")
    assert(varint() == 0)
    val n = varint()
    (0L until n).foreach { _ =>
      p += 1 + (bytes(p) & 0xff) // key
      p += 1 + (bytes(p) & 0xff) // value
    }
    assert(varint() == 0)
    assert(bytes(p) == 0, "pristine fragment is standard traversal")
    Draco.decode(Files.readAllBytes(fragments.head)) // pristine decodes
    bytes(p) = 1
    val e = intercept[IllegalArgumentException](Draco.decode(bytes))
    assert(e.getMessage.contains("traversal"), e.getMessage)
  }

  test("all 21 committed fragments decode with consistent counts") {
    val frs = fragments
    assert(frs.size == 21)
    var totalV = 0; var totalF = 0
    frs.foreach { p =>
      val m = Draco.decode(Files.readAllBytes(p))
      assert(m.positions.length == m.numVertices * 3)
      assert(m.faces.length % 3 == 0)
      // faces index decoded vertices
      assert(m.faces.forall(v => v >= 0 && v < m.numVertices))
      // dequantized positions stay inside the quantization box
      var i = 0
      while (i < m.numVertices) {
        var c = 0
        while (c < 3) {
          val x = m.positions(i * 3 + c)
          assert(x >= m.qMin(c) - 1e-6 && x <= m.qMin(c) + m.qRange + 1e-6)
          c += 1
        }
        i += 1
      }
      totalV += m.numVertices
      totalF += m.faces.length / 3
    }
    assert(totalV == 6289, s"total vertices $totalV")
    assert(totalF == 10370, s"total faces $totalF")
  }

  test("mutation/truncation fuzz: every failure is the declared error type, bounded") {
    // the decoder sits on the mesh read path: hostile bytes must
    // terminate as IllegalArgumentException (never a hang, an escaped
    // JVM bounds check, or a multi-GB decode-bomb allocation — the
    // count varints are capped at 256 elements per input byte)
    val rnd = new scala.util.Random(20260816)
    val frs = fragments
    val samples = Seq(frs.head, frs(frs.size / 2), frs.last)
    for (p <- samples) {
      val base = Files.readAllBytes(p)
      for (_ <- 1 to 250) {
        val mutated = base.clone()
        rnd.nextInt(3) match {
          case 0 =>
            val i = rnd.nextInt(mutated.length)
            mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
          case _ => ()
        }
        val input = if (rnd.nextBoolean()) mutated
          else java.util.Arrays.copyOf(mutated, 1 + rnd.nextInt(mutated.length))
        try {
          val m = Draco.decode(input)
          // a survivor must still be self-consistent
          assert(m.positions.length == m.numVertices * 3)
          assert(m.faces.forall(v => v >= 0 && v < m.numVertices))
        } catch {
          case _: IllegalArgumentException => // the declared error type
        }
      }
    }
    // the decode-bomb rail specifically: a tiny stream claiming 2^28
    // vertices must be rejected by the ceiling, not allocated
    val bomb = Files.readAllBytes(samples.head).take(30)
    intercept[IllegalArgumentException](Draco.decode(bomb))
  }

  test("tiny fragment decodes to the known 9-vertex fan") {
    val p = fragments.find(_.getFileName.toString.startsWith("186578533298995658")).get
    val m = Draco.decode(Files.readAllBytes(p))
    assert(m.numVertices == 9 && m.faces.length == 24)
    val got = (0 until 9).map(i =>
      (m.positions(i * 3), m.positions(i * 3 + 1), m.positions(i * 3 + 2))).toSet
    val expected = Set( // independently decoded by tools/draco_decode.py
      (452529.0, 345261.0, 35763.0), (452550.0, 345219.0, 35847.0),
      (452550.0, 345198.0, 35847.0), (452508.0, 345198.0, 35847.0),
      (452487.0, 345219.0, 35847.0), (452487.0, 345240.0, 35847.0),
      (452508.0, 345261.0, 35847.0), (452550.0, 345261.0, 35847.0),
      (452550.0, 345240.0, 35847.0))
    assert(got == expected)
  }

  test("chunk-boundary dedup reproduces the reference's 3 connected components") {
    // reference semantics: graphene mesh.get at level 2 runs
    // deduplicate_chunk_boundaries(mesh_chunk_size * resolution, offset=0,
    // draco_grid_size=21): merge vertices that appear EXACTLY twice and
    // sit within grid/2 of a chunk border (mesh.py:379-419), then the
    // test counts face-edge graph components (test_graphene.py:490-501).
    val chunk = Array(4096.0, 4096.0, 5120.0) // [512,512,128] vox * [8,8,40] nm
    val grid = 21.0
    val allV = scala.collection.mutable.ArrayBuffer[(Double, Double, Double)]()
    val allF = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
    fragments.foreach { p =>
      val m = Draco.decode(Files.readAllBytes(p))
      val base = allV.length
      (0 until m.numVertices).foreach { i =>
        allV += ((m.positions(i * 3), m.positions(i * 3 + 1), m.positions(i * 3 + 2)))
      }
      (0 until m.faces.length / 3).foreach { f =>
        allF += ((m.faces(f * 3) + base, m.faces(f * 3 + 1) + base, m.faces(f * 3 + 2) + base))
      }
    }
    val counts = allV.groupBy(identity).map { case (k, v) => k -> v.size }
    def aligned(v: (Double, Double, Double)): Boolean = {
      val a = Array(v._1, v._2, v._3)
      (0 until 3).exists { k =>
        val m = ((a(k) % chunk(k)) + chunk(k)) % chunk(k)
        m < grid / 2 || chunk(k) - m <= grid / 2
      }
    }
    val nodeOf = scala.collection.mutable.Map[Any, Int]()
    val gid = allV.zipWithIndex.map { case (v, i) =>
      val key: Any = if (counts(v) == 2 && aligned(v)) v else i
      nodeOf.getOrElseUpdate(key, nodeOf.size)
    }
    val parent = Array.tabulate(nodeOf.size)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    allF.foreach { case (a, b, c) =>
      Seq((a, b), (b, c), (c, a)).foreach { case (u, w) =>
        val ru = find(gid(u)); val rw = find(gid(w))
        if (ru != rw) parent(ru) = rw
      }
    }
    val comps = (0 until nodeOf.size).groupBy(find).values.map(_.size).toSeq.sorted
    assert(comps == Seq(16, 1533, 3987), s"components $comps")
  }
}
