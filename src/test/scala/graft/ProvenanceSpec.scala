package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Provenance

/** F15 provenance: json5-tolerant parse + canonical commit. */
class ProvenanceSpec extends AnyFunSuite {

  test("tolerant parse: comments, single quotes, trailing commas") {
    val p = Provenance.fromJson("""{
      // audit header
      'description': "em layer",
      'sources': ['file:///data/raw',],
      'processing': [{'method': 'downsample', 'by': 'graft'}],
      'owners': ['a@example.org', 'b@example.org'],
    }""")
    assert(p.description === "em layer")
    assert(p.sources === Seq("file:///data/raw"))
    assert(p.owners.length === 2)
    assert(p.processing.head.contains("downsample"))
  }

  test("commit round-trip is stable") {
    val p = Provenance(
      description = "seg layer",
      sources = Seq("file:///data/em"),
      processing = Seq("""{"method":"remap"}"""),
      owners = Seq("x@example.org"))
    val j = Provenance.toJson(p)
    val back = Provenance.fromJson(j)
    assert(back.description === p.description)
    assert(back.sources === p.sources)
    assert(back.owners === p.owners)
    assert(Provenance.toJson(back) === j)
  }

  test("missing fields parse to empty (tolerant like the reference)") {
    val p = Provenance.fromJson("{}")
    assert(p.description === "")
    assert(p.sources.isEmpty && p.owners.isEmpty && p.processing.isEmpty)
  }
}
