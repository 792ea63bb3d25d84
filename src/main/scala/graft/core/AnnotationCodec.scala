package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Neuroglancer precomputed annotation binary codec (pure Scala).
  *
  * Multi-annotation (spatial/by-relationship) encoding per
  * annotation/reader.py:151-181 `_decode_annotations`:
  *
  *   u64le count
  *   count x record:
  *     geometry: ndim f32 (POINT), 2*ndim f32 (LINE / AABB /
  *               ELLIPSOID center+radii), or u32le num_points +
  *               num_points*ndim f32 (POLYLINE,
  *               annotation/metadata.py:436-447)
  *     properties: declared order, dtype sizes per
  *                 annotation/metadata.py:27-39 (_PROPERTY_DTYPES)
  *     padding:  property block padded to 4-byte alignment
  *               (annotation/metadata.py:41-60)
  *   count x u64le annotation ids
  *
  * Property values are carried as Double in memory (exact for the
  * integer-valued fixtures and for f32-representable values); rgb/rgba
  * occupy 3/4 doubles.
  */
object AnnotationCodec {

  /** One typed property: id + dtype name, optionally carrying an enum
    * dictionary (annotation/metadata.py:355-409: `enum_values` are the
    * stored numeric values, `enum_labels` the display strings; the
    * binary record still stores the numeric dtype — the dictionary
    * lives only in the info JSON).
    */
  final case class PropSpec(id: String, dtype: String,
      enumValues: Seq[Long] = Seq.empty,
      enumLabels: Seq[String] = Seq.empty) {
    require(enumValues.size == enumLabels.size,
      s"enum_values/enum_labels size mismatch on property $id")
    def byteSize: Int = dtype match {
      case "uint8" | "int8" => 1
      case "uint16" | "int16" => 2
      case "uint32" | "int32" | "float32" => 4
      case "rgb" => 3
      case "rgba" => 4
      case d => throw new IllegalArgumentException(s"property dtype $d")
    }
    /** Number of Double slots this property occupies in a record. */
    def slots: Int = dtype match {
      case "rgb" => 3
      case "rgba" => 4
      case _ => 1
    }
  }

  /** Layer-level codec spec: geometry type + property schema. */
  final case class AnnotationSpec(
      annotationType: String, // POINT | LINE | AXIS_ALIGNED_BOUNDING_BOX | ELLIPSOID | POLYLINE
      ndim: Int,
      properties: Seq[PropSpec]) {

    /** POLYLINE records carry a u32 vertex count + that many points —
      * variable length (annotation/metadata.py:436-447), so the fixed
      * [[geometryFloats]]/[[recordBytes]] accessors don't apply.
      */
    def isPolyline: Boolean = annotationType == "POLYLINE"

    def geometryFloats: Int = annotationType match {
      case "POINT" => ndim
      case "LINE" | "AXIS_ALIGNED_BOUNDING_BOX" | "ELLIPSOID" => 2 * ndim
      case "POLYLINE" => throw new IllegalArgumentException(
        "POLYLINE geometry is variable-length (per-record u32 count)")
      case t => throw new IllegalArgumentException(s"annotation type $t")
    }

    def propBytesUnpadded: Int = properties.map(_.byteSize).sum

    /** Property-block padding to 4-byte record alignment
      * (annotation/metadata.py:41-60).
      */
    def propPad: Int =
      if (propBytesUnpadded % 4 == 0) 0 else 4 - propBytesUnpadded % 4

    /** Bytes of one record with `geomFloats` geometry floats. */
    def recordBytesFor(geomFloats: Int): Int = {
      val lenPrefix = if (isPolyline) 4 else 0
      lenPrefix + 4 * geomFloats + propBytesUnpadded + propPad
    }

    /** Bytes of one record: geometry + properties + pad-to-4
      * (fixed-geometry types only).
      */
    def recordBytes: Int = recordBytesFor(geometryFloats)
  }

  /** One annotation: id, geometry floats, property values (flattened
    * Double slots in property order). For POLYLINE the geometry is
    * the flattened vertex list (length = num_points * ndim).
    */
  final case class Annotation(id: Long, geometry: Array[Float], props: Array[Double])

  private def writeProps(buf: ByteBuffer, spec: AnnotationSpec,
      props: Array[Double]): Unit = {
    var slot = 0
    spec.properties.foreach { p =>
      p.dtype match {
        case "uint8" | "int8" => buf.put(props(slot).toInt.toByte)
        case "uint16" | "int16" => buf.putShort(props(slot).toInt.toShort)
        case "uint32" | "int32" => buf.putInt(props(slot).toLong.toInt)
        case "float32" => buf.putFloat(props(slot).toFloat)
        case "rgb" =>
          (0 until 3).foreach(i => buf.put(props(slot + i).toInt.toByte))
        case "rgba" =>
          (0 until 4).foreach(i => buf.put(props(slot + i).toInt.toByte))
      }
      slot += p.slots
    }
    (0 until spec.propPad).foreach(_ => buf.put(0.toByte))
  }

  private def readProps(buf: ByteBuffer, spec: AnnotationSpec): Array[Double] = {
    val pv = new Array[Double](spec.properties.map(_.slots).sum)
    var slot = 0
    spec.properties.foreach { p =>
      p.dtype match {
        case "uint8" => pv(slot) = (buf.get() & 0xff).toDouble
        case "int8" => pv(slot) = buf.get().toDouble
        case "uint16" => pv(slot) = (buf.getShort() & 0xffff).toDouble
        case "int16" => pv(slot) = buf.getShort().toDouble
        case "uint32" => pv(slot) = (buf.getInt() & 0xffffffffL).toDouble
        case "int32" => pv(slot) = buf.getInt().toDouble
        case "float32" => pv(slot) = buf.getFloat().toDouble
        case "rgb" =>
          (0 until 3).foreach(i => pv(slot + i) = (buf.get() & 0xff).toDouble)
        case "rgba" =>
          (0 until 4).foreach(i => pv(slot + i) = (buf.get() & 0xff).toDouble)
      }
      slot += p.slots
    }
    (0 until spec.propPad).foreach(_ => buf.get())
    pv
  }

  /** Write one record's geometry: POLYLINE prefixes a u32le vertex
    * count (annotation/metadata.py:436-447); fixed types write the
    * floats verbatim.
    */
  private def writeGeometry(buf: ByteBuffer, spec: AnnotationSpec,
      g: Array[Float]): Unit = {
    if (spec.isPolyline) {
      require(g.length % spec.ndim == 0,
        s"polyline geometry ${g.length} not a multiple of ndim ${spec.ndim}")
      buf.putInt(g.length / spec.ndim)
    } else require(g.length == spec.geometryFloats,
      s"geometry ${g.length} != ${spec.geometryFloats}")
    g.foreach(buf.putFloat)
  }

  private def readGeometry(buf: ByteBuffer, spec: AnnotationSpec): Array[Float] = {
    val nFloats =
      if (spec.isPolyline) {
        val npts = buf.getInt()
        require(npts >= 0 && npts.toLong * spec.ndim <= buf.remaining / 4,
          s"polyline vertex count $npts exceeds buffer")
        npts * spec.ndim
      } else spec.geometryFloats
    val g = new Array[Float](nFloats)
    g.indices.foreach(j => g(j) = buf.getFloat())
    g
  }

  def encode(spec: AnnotationSpec, anns: Seq[Annotation]): Array[Byte] = {
    val total = 8 +
      anns.map(a => spec.recordBytesFor(a.geometry.length) + 8).sum
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(anns.length.toLong)
    anns.foreach { a =>
      writeGeometry(buf, spec, a.geometry)
      writeProps(buf, spec, a.props)
    }
    anns.foreach(a => buf.putLong(a.id))
    buf.array()
  }

  def decode(spec: AnnotationSpec, binary: Array[Byte]): Seq[Annotation] = {
    val buf = ByteBuffer.wrap(binary).order(ByteOrder.LITTLE_ENDIAN)
    val n = buf.getLong()
    require(n >= 0 && n <= Int.MaxValue, s"bad count $n")
    // fixed-geometry records let the length be validated up front;
    // POLYLINE records are variable, checked by the trailing require
    if (!spec.isPolyline)
      require(binary.length == 8 + n * (spec.recordBytes + 8),
        s"length ${binary.length} != expected ${8 + n * (spec.recordBytes + 8)}")
    else
      // polyline records are variable-length but each still costs >= 4
      // bytes (its vertex count) — bound n BEFORE the two n-sized
      // allocations so a corrupt header can't demand 2^31 slots from a
      // tiny buffer (decode-bomb rail, as in the chunk codecs)
      require(n <= binary.length / 4,
        s"annotation count $n impossible for ${binary.length} bytes")
    val geoms = new Array[Array[Float]](n.toInt)
    val props = new Array[Array[Double]](n.toInt)
    (0 until n.toInt).foreach { i =>
      // variable-length (POLYLINE) records skip the up-front length
      // check; validate each record + the trailing id block fit so a
      // truncated buffer fails the codec's IllegalArgumentException
      // contract, not with a raw BufferUnderflowException
      if (spec.isPolyline)
        require(buf.remaining >= 4, s"record $i truncated")
      geoms(i) = readGeometry(buf, spec)
      require(buf.remaining >= spec.propBytesUnpadded + spec.propPad,
        s"record $i property block truncated")
      props(i) = readProps(buf, spec)
    }
    require(buf.remaining == 8L * n,
      s"id block truncated: ${buf.remaining} bytes for $n ids")
    val ids = Array.fill(n.toInt)(buf.getLong())
    require(!buf.hasRemaining)
    (0 until n.toInt).map(i => Annotation(ids(i), geoms(i), props(i)))
  }

  /** Single-annotation by-id encoding (annotation/reader.py:103-137
    * _decode_single_annotation): ONE record (geometry + properties,
    * property block padded to 4 bytes like the multi format), then
    * for each declared relationship a u32le object count followed by
    * count x u64le object ids. The annotation id itself is carried by
    * the object NAME (by_id/<id>), not the payload.
    *
    * @param rels one id list per declared relationship, declaration
    *             order
    */
  def encodeSingle(spec: AnnotationSpec, ann: Annotation,
      rels: Seq[Seq[Long]]): Array[Byte] = {
    val relBytes = rels.map(r => 4 + 8 * r.length).sum
    val buf = ByteBuffer
      .allocate(spec.recordBytesFor(ann.geometry.length) + relBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    writeGeometry(buf, spec, ann.geometry)
    writeProps(buf, spec, ann.props)
    rels.foreach { ids =>
      buf.putInt(ids.length)
      ids.foreach(buf.putLong)
    }
    buf.array()
  }

  /** Inverse of [[encodeSingle]]; `id` comes from the object name.
    * Mirrors the reference's trailing `assert offset == len(binary)`
    * (annotation/reader.py:135).
    */
  def decodeSingle(spec: AnnotationSpec, nRels: Int, id: Long,
      binary: Array[Byte]): (Annotation, Seq[Seq[Long]]) = {
    val buf = ByteBuffer.wrap(binary).order(ByteOrder.LITTLE_ENDIAN)
    val g = readGeometry(buf, spec)
    val pv = readProps(buf, spec)
    val rels = (0 until nRels).map { _ =>
      val n = buf.getInt()
      (0 until n).map(_ => buf.getLong()).toSeq
    }
    require(!buf.hasRemaining,
      s"trailing ${buf.remaining} bytes after relationship sections")
    (Annotation(id, g, pv), rels)
  }

  // ---- layer info JSON (annotation/metadata.py:355-409) ----

  private lazy val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Write the layer's `info` JSON: the neuroglancer_annotations_v1
    * header carrying the property schema incl. any enum dictionaries
    * (annotation/metadata.py:355-372 example block). `byId` optionally
    * declares the id index: key subdirectory plus, when the index is
    * sharded, the uint64-sharded spec — the reference's
    * `is_id_index_sharded()` routing bit (annotation/reader.py:183-205
    * reads `by_id["sharding"]` to pick the ShardReader path).
    */
  /** One spatial-index level of the precomputed annotation layout:
    * `key` subdir of per-cell multi-annotation files over a grid of
    * `gridShape` cells of `chunkSize` voxels, holding at most `limit`
    * annotations per cell (the coarse-level display sample; spill
    * goes to the next finer level).
    */
  final case class SpatialLevel(key: String, gridShape: Seq[Long],
    chunkSize: Seq[Long], limit: Long,
    sharding: Option[ShardingSpec] = None)

  def writeInfo(dir: String, spec: AnnotationSpec,
      byId: Option[(String, Option[ShardingSpec])] = None,
      relationships: Seq[(String, String)] = Seq.empty,
      spatial: Seq[SpatialLevel] = Seq.empty,
      relSharding: Map[String, ShardingSpec] = Map.empty): Unit = {
    val root = om.createObjectNode()
    root.put("@type", "neuroglancer_annotations_v1")
    root.put("annotation_type", spec.annotationType)
    if (spatial.nonEmpty) {
      val sp = root.putArray("spatial")
      spatial.foreach { lvl =>
        val ln = sp.addObject()
        ln.put("key", lvl.key)
        val gs = ln.putArray("grid_shape"); lvl.gridShape.foreach(gs.add)
        val cs = ln.putArray("chunk_size"); lvl.chunkSize.foreach(cs.add)
        ln.put("limit", lvl.limit)
        // sharded spatial level: cells keyed by compressed morton code
        // (annotation/reader.py:253-257)
        lvl.sharding.foreach(sp2 =>
          ShardingSpec.putJson(ln.putObject("sharding"), sp2))
      }
    }
    byId.foreach { case (key, sh) =>
      val b = root.putObject("by_id")
      b.put("key", key)
      sh.foreach(s => ShardingSpec.putJson(b.putObject("sharding"), s))
    }
    // declared relationships, (id, key) pairs in declaration order —
    // the order the by-id binary's relationship sections are read in
    // (annotation/metadata.py:27-39, reader.py:127-133)
    if (relationships.nonEmpty) {
      val rels = root.putArray("relationships")
      relationships.foreach { case (id, key) =>
        val rn = rels.addObject(); rn.put("id", id); rn.put("key", key)
        // per-relation sharded index (annotation/reader.py:321-327
        // reads rel["sharding"] and routes through a ShardReader)
        relSharding.get(id).foreach(sp =>
          ShardingSpec.putJson(rn.putObject("sharding"), sp))
      }
    }
    val dims = root.putObject("dimensions")
    Seq("x", "y", "z").take(spec.ndim).foreach { ax =>
      val d = dims.putArray(ax); d.add(1); d.add("nm")
    }
    val props = root.putArray("properties")
    spec.properties.foreach { p =>
      val pn = props.addObject()
      pn.put("id", p.id)
      pn.put("type", p.dtype)
      if (p.enumValues.nonEmpty) {
        val ev = pn.putArray("enum_values")
        p.enumValues.foreach(ev.add)
        val el = pn.putArray("enum_labels")
        p.enumLabels.foreach(el.add)
      }
    }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "info"),
      om.writerWithDefaultPrettyPrinter.writeValueAsString(root))
  }

  /** The layer's declared spatial-index levels in declaration order
    * (coarsest first) — empty when the info has no spatial block.
    */
  def readSpatial(dir: String): Seq[SpatialLevel] = {
    val root = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "info")))
    Option(root.get("spatial")).map { sn =>
      (0 until sn.size).map { i =>
        val ln = sn.get(i)
        def longs(field: String): Seq[Long] = {
          val a = ln.get(field)
          (0 until a.size).map(a.get(_).asLong)
        }
        SpatialLevel(ln.get("key").asText, longs("grid_shape"),
          longs("chunk_size"), ln.get("limit").asLong,
          Option(ln.get("sharding")).map(ShardingSpec.fromJson))
      }
    }.getOrElse(Seq.empty)
  }

  /** Declared relationships as (id, key) pairs in declaration order —
    * the count and order decodeSingle's relationship sections follow
    * (annotation/reader.py:127-133).
    */
  def readRelationships(dir: String): Seq[(String, String)] = {
    val root = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "info")))
    Option(root.get("relationships")).map { rn =>
      (0 until rn.size).map(i =>
        (rn.get(i).get("id").asText, rn.get(i).get("key").asText))
    }.getOrElse(Seq.empty)
  }

  /** One declared relationship's index: (key, sharding if sharded) —
    * None when the relationship id is not declared. Mirrors the
    * reference's per-relation `'sharding' in rel` routing
    * (annotation/reader.py:319-339).
    */
  def readRelationshipIndex(dir: String, id: String)
      : Option[(String, Option[ShardingSpec])] = {
    val root = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "info")))
    Option(root.get("relationships")).flatMap { rn =>
      (0 until rn.size).map(rn.get)
        .find(_.get("id").asText == id)
        .map(r => (r.get("key").asText,
          Option(r.get("sharding")).map(ShardingSpec.fromJson)))
    }
  }

  /** The layer's declared id index: (key, sharding if sharded) —
    * None when the info has no by_id block. Mirrors
    * `is_id_index_sharded()` (annotation/reader.py:183-205).
    */
  def readByIdIndex(dir: String): Option[(String, Option[ShardingSpec])] = {
    val root = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "info")))
    Option(root.get("by_id")).map { b =>
      (b.get("key").asText,
        Option(b.get("sharding")).map(ShardingSpec.fromJson))
    }
  }

  /** Parse the layer `info` back to the codec spec (the enum
    * dictionary rides along on its property).
    */
  def readInfo(dir: String): AnnotationSpec = {
    val root = om.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "info")))
    require(root.get("@type").asText == "neuroglancer_annotations_v1",
      "not an annotation layer info")
    val props = Option(root.get("properties")).map { pn =>
      (0 until pn.size).map { i =>
        val p = pn.get(i)
        val ev = Option(p.get("enum_values")).map(n =>
          (0 until n.size).map(n.get(_).asLong)).getOrElse(Seq.empty)
        val el = Option(p.get("enum_labels")).map(n =>
          (0 until n.size).map(n.get(_).asText)).getOrElse(Seq.empty)
        PropSpec(p.get("id").asText, p.get("type").asText, ev, el)
      }
    }.getOrElse(Seq.empty)
    AnnotationSpec(root.get("annotation_type").asText,
      root.get("dimensions").size, props)
  }
}
