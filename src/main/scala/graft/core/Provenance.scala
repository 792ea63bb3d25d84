package graft.core

import com.fasterxml.jackson.core.JsonParser
import com.fasterxml.jackson.databind.ObjectMapper

/** Layer provenance (F15; provenance.py layer_provenance_schema +
  * metadata.py:374-411 fetch/commit): `description`, `sources[]`,
  * `processing[]` (audit log entries), `owners[]`. The reference reads
  * provenance with json5 tolerance — comments, trailing commas,
  * single quotes — which Jackson's relaxed features cover.
  */
final case class Provenance(
    description: String,
    sources: Seq[String],
    processing: Seq[String], // each entry re-serialized canonical JSON
    owners: Seq[String])

object Provenance {
  private val om: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(JsonParser.Feature.ALLOW_COMMENTS, true)
    m.configure(JsonParser.Feature.ALLOW_SINGLE_QUOTES, true)
    m.configure(JsonParser.Feature.ALLOW_TRAILING_COMMA, true)
    m.configure(JsonParser.Feature.ALLOW_UNQUOTED_FIELD_NAMES, true)
    m
  }

  def fromJson(json: String): Provenance = {
    val root = om.readTree(json)
    def strings(field: String): Seq[String] =
      Option(root.get(field)).map { a =>
        (0 until a.size).map { i =>
          val n = a.get(i)
          if (n.isTextual) n.asText else om.writeValueAsString(n)
        }
      }.getOrElse(Seq.empty)
    Provenance(
      description = Option(root.get("description")).map(_.asText).getOrElse(""),
      sources = strings("sources"),
      processing = strings("processing"),
      owners = strings("owners"))
  }

  /** Canonical commit form (metadata.py commit_provenance). */
  def toJson(p: Provenance): String = {
    val root = om.createObjectNode()
    root.put("description", p.description)
    val so = root.putArray("sources"); p.sources.foreach(so.add)
    val pr = root.putArray("processing")
    p.processing.foreach { e =>
      val t = e.trim
      // re-embed any canonical-JSON entry (object OR array) so the
      // commit round-trip preserves the original JSON type
      if (t.startsWith("{") || t.startsWith("[")) pr.add(om.readTree(e))
      else pr.add(e)
    }
    val ow = root.putArray("owners"); p.owners.foreach(ow.add)
    om.writerWithDefaultPrettyPrinter.writeValueAsString(root)
  }
}
