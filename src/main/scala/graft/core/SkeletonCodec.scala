package graft.core

import java.nio.{ByteBuffer, ByteOrder}

/** Precomputed skeleton binary codec (pure Scala).
  *
  * The reference delegates decode to the external `osteoid` package
  * (skeleton.py:1-2; callsite datasource/precomputed/skeleton/
  * unsharded.py:93-95); the wire format is the public Neuroglancer
  * skeleton spec the fixtures in test/test_skeletons.py exercise:
  *
  *   u32 num_vertices | u32 num_edges
  *   num_vertices * 3 * f32 positions
  *   num_edges * 2 * u32 edges
  *   then each declared vertex attribute, nv * components * dtype
  *   (here the reference's default_info pair — f32 "radius" and u8
  *   "vertex_types"; skeleton/metadata.py:117-140)
  */
object SkeletonCodec {

  final case class Skeleton(
      vertices: Array[Float], // 3*nv
      edges: Array[Int], // 2*ne
      radii: Array[Float], // nv
      vertexTypes: Array[Byte]) { // nv
    def nv: Int = vertices.length / 3
    def ne: Int = edges.length / 2
  }

  def encode(s: Skeleton): Array[Byte] = {
    require(s.vertices.length % 3 == 0 && s.edges.length % 2 == 0)
    require(s.radii.length == s.nv, s"radii ${s.radii.length} != nv ${s.nv}")
    require(s.vertexTypes.length == s.nv,
      s"vertex_types ${s.vertexTypes.length} != nv ${s.nv}")
    val buf = ByteBuffer.allocate(
      8 + 4 * s.vertices.length + 4 * s.edges.length + 4 * s.radii.length +
        s.vertexTypes.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(s.nv)
    buf.putInt(s.ne)
    s.vertices.foreach(buf.putFloat)
    s.edges.foreach(buf.putInt)
    s.radii.foreach(buf.putFloat)
    buf.put(s.vertexTypes)
    buf.array()
  }

  def decode(binary: Array[Byte]): Skeleton = {
    require(binary.length >= 8,
      s"skeleton binary ${binary.length}B shorter than the 8-byte header")
    val buf = ByteBuffer.wrap(binary).order(ByteOrder.LITTLE_ENDIAN)
    val nv = buf.getInt()
    val ne = buf.getInt()
    // counts are UNTRUSTED: negative or huge values must fail here, not
    // as a NegativeArraySizeException/OOM in Array.fill — and the
    // expected-length check must run in Long arithmetic, or a crafted
    // nv can wrap 32-bit math back onto the actual payload length
    require(nv >= 0 && ne >= 0,
      s"corrupt skeleton binary: negative counts nv=$nv ne=$ne")
    val expected = 8L + 12L * nv + 8L * ne + 4L * nv + nv.toLong
    require(binary.length.toLong == expected,
      s"skeleton binary ${binary.length}B != expected $expected for nv=$nv ne=$ne")
    val vertices = Array.fill(3 * nv)(buf.getFloat())
    val edges = Array.fill(2 * ne)(buf.getInt())
    // edge endpoints feed array indexing in every downstream op
    // (adjacency/paths/components); validate once at the trust boundary
    var i = 0
    while (i < edges.length) {
      require(edges(i) >= 0 && edges(i) < nv,
        s"corrupt skeleton binary: edge endpoint ${edges(i)} outside [0, $nv)")
      i += 1
    }
    val radii = Array.fill(nv)(buf.getFloat())
    val vtypes = new Array[Byte](nv)
    buf.get(vtypes)
    Skeleton(vertices, edges, radii, vtypes)
  }

  /** SWC text export (public format: Cannon et al. 1998, the
    * cnic/swc.html layout the reference's own test vector uses —
    * test/test_skeletons.py:461-527; the reference surfaces
    * to_swc/from_swc through its osteoid dependency, skeleton.py:1).
    *
    * One line per vertex: `id type x y z radius parent`, 1-based ids,
    * parent -1 for roots. The undirected edge list is re-rooted as a
    * forest: each connected component walks depth-first from its
    * lowest-index vertex with ascending-index neighbor order, so a
    * chain skeleton (vid -> vid+1) exports in its original vertex
    * order and from_swc(to_swc(s)) preserves vertex indexing. Cycle
    * edges (back edges to a visited vertex) cannot be represented in
    * SWC's single-parent lines and are dropped, matching the
    * tree-structure contract of the format.
    */
  def toSwc(s: Skeleton): String = {
    val nv = s.nv
    // adjacency (CSR): degree count then fill
    val deg = new Array[Int](nv)
    var i = 0
    while (i < s.edges.length) { deg(s.edges(i)) += 1; i += 1 }
    val start = new Array[Int](nv + 1)
    i = 0
    while (i < nv) { start(i + 1) = start(i) + deg(i); i += 1 }
    val adj = new Array[Int](s.edges.length)
    val fill = start.clone()
    i = 0
    while (i < s.edges.length) {
      val a = s.edges(i); val b = s.edges(i + 1)
      adj(fill(a)) = b; fill(a) += 1
      adj(fill(b)) = a; fill(b) += 1
      i += 2
    }
    i = 0
    while (i < nv) {
      java.util.Arrays.sort(adj, start(i), start(i + 1)); i += 1
    }
    val swcId = new Array[Int](nv) // 0 = unvisited, else 1-based id
    val parent = new Array[Int](nv)
    val order = new Array[Int](nv) // visit order -> vertex index
    var next = 0
    val stack = new java.util.ArrayDeque[Int]()
    var root = 0
    while (root < nv) {
      if (swcId(root) == 0) {
        parent(root) = -1
        stack.push(root)
        while (!stack.isEmpty) {
          val v = stack.pop()
          if (swcId(v) == 0) {
            next += 1; swcId(v) = next; order(next - 1) = v
            // push descending so ascending-index neighbors pop first
            var j = start(v + 1) - 1
            while (j >= start(v)) {
              val w = adj(j)
              if (swcId(w) == 0) { parent(w) = v; stack.push(w) }
              j -= 1
            }
          }
        }
      }
      root += 1
    }
    val sb = new StringBuilder
    i = 0
    while (i < nv) {
      val v = order(i)
      val pid = if (parent(v) < 0) -1 else swcId(parent(v))
      sb.append(swcId(v)).append(' ')
        .append(s.vertexTypes(v) & 0xff).append(' ')
        .append(s.vertices(3 * v)).append(' ')
        .append(s.vertices(3 * v + 1)).append(' ')
        .append(s.vertices(3 * v + 2)).append(' ')
        .append(s.radii(v)).append(' ')
        .append(pid).append('\n')
      i += 1
    }
    sb.toString
  }

  /** Undirected adjacency in CSR form: (start offsets, neighbor
    * array), neighbors ascending per vertex.
    */
  private def adjacency(s: Skeleton): (Array[Int], Array[Int]) = {
    val nv = s.nv
    val deg = new Array[Int](nv)
    var i = 0
    while (i < s.edges.length) { deg(s.edges(i)) += 1; i += 1 }
    val start = new Array[Int](nv + 1)
    i = 0
    while (i < nv) { start(i + 1) = start(i) + deg(i); i += 1 }
    val adj = new Array[Int](s.edges.length)
    val fill = start.clone()
    i = 0
    while (i < s.edges.length) {
      val a = s.edges(i); val b = s.edges(i + 1)
      adj(fill(a)) = b; fill(a) += 1
      adj(fill(b)) = a; fill(b) += 1
      i += 2
    }
    i = 0
    while (i < nv) {
      java.util.Arrays.sort(adj, start(i), start(i + 1)); i += 1
    }
    (start, adj)
  }

  /** Decompose the undirected edge list into branch-free paths: each
    * path runs between "interesting" vertices (degree != 2 — branch
    * points and terminals), traversed outward from each component's
    * lowest-index terminal (lowest-index vertex on a pure cycle).
    * Matches the traversal the reference's downsample vectors encode
    * (test/test_skeletons.py:350-456). Isolated vertices emit
    * singleton paths.
    */
  def paths(s: Skeleton): Seq[Array[Int]] = {
    val nv = s.nv
    val (start, adj) = adjacency(s)
    def deg(v: Int) = start(v + 1) - start(v)
    val edgeUsed = new java.util.HashSet[Long]()
    def ekey(a: Int, b: Int): Long =
      (math.min(a, b).toLong << 32) | math.max(a, b).toLong
    val out = Seq.newBuilder[Array[Int]]
    // component roots: first terminal in BFS order from the
    // component's lowest vertex; lowest vertex itself on a pure cycle
    val comp = new Array[Int](nv)
    java.util.Arrays.fill(comp, -1)
    var nc = 0
    var v = 0
    while (v < nv) {
      if (comp(v) < 0) {
        // BFS to label the component and find its root
        var rootTerm = -1; var rootAny = v
        val q = new java.util.ArrayDeque[Int]()
        q.add(v); comp(v) = nc
        while (!q.isEmpty) {
          val u = q.poll()
          if (deg(u) == 1 && rootTerm < 0) rootTerm = u
          var j = start(u)
          while (j < start(u + 1)) {
            if (comp(adj(j)) < 0) { comp(adj(j)) = nc; q.add(adj(j)) }
            j += 1
          }
        }
        val root = if (rootTerm >= 0) rootTerm else rootAny
        if (deg(root) == 0) { out += Array(root) }
        else {
          // walk branch-free segments outward from interesting seeds
          val seeds = new java.util.ArrayDeque[Int]()
          seeds.add(root)
          while (!seeds.isEmpty) {
            val s0 = seeds.poll()
            var j = start(s0)
            while (j < start(s0 + 1)) {
              val first = adj(j)
              if (!edgeUsed.contains(ekey(s0, first))) {
                val path = Array.newBuilder[Int]
                path += s0
                edgeUsed.add(ekey(s0, first))
                var prev = s0; var cur = first
                path += cur
                while (deg(cur) == 2 && cur != s0) {
                  val nxt = if (adj(start(cur)) == prev) adj(start(cur) + 1)
                    else adj(start(cur))
                  edgeUsed.add(ekey(cur, nxt))
                  prev = cur; cur = nxt
                  path += cur
                }
                if (cur != s0 && (deg(cur) != 2)) seeds.add(cur)
                out += path.result()
              }
              j += 1
            }
          }
        }
        nc += 1
      }
      v += 1
    }
    out.result()
  }

  /** Downsample by `factor` (reference Skeleton.downsample via
    * osteoid; vectors test/test_skeletons.py:350-456): every path
    * keeps its vertices at stride `factor` from the path start plus
    * the path's last vertex, so branch points and terminals always
    * survive; edges rejoin consecutive kept vertices along each path.
    * Kept vertices reindex in ascending original order.
    */
  def downsample(s: Skeleton, factor: Int): Skeleton = {
    require(factor >= 1, s"downsample factor $factor must be >= 1")
    if (factor == 1) return s
    val keep = new Array[Boolean](s.nv)
    val newEdges = Array.newBuilder[Int]
    paths(s).foreach { p =>
      var i = 0
      var lastKept = -1
      while (i < p.length) {
        val k = i % factor == 0 || i == p.length - 1
        if (k) {
          keep(p(i)) = true
          if (lastKept >= 0 && lastKept != p(i)) {
            newEdges += lastKept += p(i)
          }
          lastKept = p(i)
        }
        i += 1
      }
    }
    val remap = new Array[Int](s.nv)
    var n = 0
    var i = 0
    while (i < s.nv) {
      if (keep(i)) { remap(i) = n; n += 1 } else remap(i) = -1
      i += 1
    }
    val verts = new Array[Float](3 * n)
    val radii = new Array[Float](n)
    val vtypes = new Array[Byte](n)
    i = 0
    while (i < s.nv) {
      if (keep(i)) {
        val m = remap(i)
        verts(3 * m) = s.vertices(3 * i)
        verts(3 * m + 1) = s.vertices(3 * i + 1)
        verts(3 * m + 2) = s.vertices(3 * i + 2)
        radii(m) = s.radii(i); vtypes(m) = s.vertexTypes(i)
      }
      i += 1
    }
    // dedup + canonicalize edges (a cycle path can re-emit its seam)
    val es = newEdges.result()
    val eset = new java.util.TreeSet[Long]()
    i = 0
    while (i < es.length) {
      val a = remap(es(i)); val b = remap(es(i + 1))
      if (a != b)
        eset.add((math.min(a, b).toLong << 32) | math.max(a, b).toLong)
      i += 2
    }
    val edges = new Array[Int](2 * eset.size)
    val it = eset.iterator()
    i = 0
    while (it.hasNext) {
      val k = it.next()
      edges(i) = (k >> 32).toInt; edges(i + 1) = k.toInt; i += 2
    }
    Skeleton(verts, edges, radii, vtypes)
  }

  /** Connected components (reference Skeleton.components,
    * test/test_skeletons.py:561-585): split into one skeleton per
    * component, ordered by each component's lowest vertex index;
    * vertices keep their relative order within a component.
    */
  /** skeleton.py remove_disconnected_vertices (test_skeletons.py:240):
    * drop vertices referenced by NO edge; survivors keep their order
    * and edges renumber through the order-preserving map. A skeleton
    * with no edges prunes to empty (the reference keeps nothing).
    */
  def removeDisconnected(s: Skeleton): Skeleton = {
    val nv = s.nv
    val keep = new Array[Boolean](nv)
    s.edges.foreach(e => keep(e) = true)
    val remap = new Array[Int](nv)
    var next = 0
    var v = 0
    while (v < nv) {
      if (keep(v)) { remap(v) = next; next += 1 } else remap(v) = -1
      v += 1
    }
    val ids = (0 until nv).filter(keep)
    Skeleton(
      ids.flatMap(i => Seq(s.vertices(3 * i), s.vertices(3 * i + 1),
        s.vertices(3 * i + 2))).toArray,
      s.edges.map(remap),
      ids.map(s.radii).toArray,
      ids.map(s.vertexTypes).toArray)
  }

  def components(s: Skeleton): Seq[Skeleton] = {
    val nv = s.nv
    val (start, adj) = adjacency(s)
    val comp = new Array[Int](nv)
    java.util.Arrays.fill(comp, -1)
    var nc = 0
    var v = 0
    while (v < nv) {
      if (comp(v) < 0) {
        val q = new java.util.ArrayDeque[Int]()
        q.add(v); comp(v) = nc
        while (!q.isEmpty) {
          val u = q.poll()
          var j = start(u)
          while (j < start(u + 1)) {
            if (comp(adj(j)) < 0) { comp(adj(j)) = nc; q.add(adj(j)) }
            j += 1
          }
        }
        nc += 1
      }
      v += 1
    }
    (0 until nc).map { c =>
      val ids = (0 until nv).filter(comp(_) == c).toArray
      val remap = new java.util.HashMap[Int, Int]()
      ids.zipWithIndex.foreach { case (old, n2) => remap.put(old, n2) }
      val verts = new Array[Float](3 * ids.length)
      val radii = new Array[Float](ids.length)
      val vtypes = new Array[Byte](ids.length)
      ids.zipWithIndex.foreach { case (old, n2) =>
        verts(3 * n2) = s.vertices(3 * old)
        verts(3 * n2 + 1) = s.vertices(3 * old + 1)
        verts(3 * n2 + 2) = s.vertices(3 * old + 2)
        radii(n2) = s.radii(old); vtypes(n2) = s.vertexTypes(old)
      }
      val edges = Array.newBuilder[Int]
      var i = 0
      while (i < s.edges.length) {
        if (comp(s.edges(i)) == c) {
          edges += remap.get(s.edges(i)) += remap.get(s.edges(i + 1))
        }
        i += 2
      }
      Skeleton(verts, edges.result(), radii, vtypes)
    }
  }

  /** Consolidate (reference Skeleton.consolidate,
    * test/test_skeletons.py:171-238): vertices with identical
    * coordinates merge (first occurrence wins the attributes), edges
    * remap with self-loops and duplicates dropped, edge endpoints
    * canonicalized ascending.
    */
  def consolidate(s: Skeleton): Skeleton = {
    val firstAt = new java.util.HashMap[(Float, Float, Float), Int]()
    val remap = new Array[Int](s.nv)
    val keptOld = Array.newBuilder[Int]
    var n = 0
    var i = 0
    while (i < s.nv) {
      val key = (s.vertices(3 * i), s.vertices(3 * i + 1),
        s.vertices(3 * i + 2))
      if (firstAt.containsKey(key)) remap(i) = firstAt.get(key)
      else { firstAt.put(key, n); remap(i) = n; keptOld += i; n += 1 }
      i += 1
    }
    val old = keptOld.result()
    val verts = new Array[Float](3 * n)
    val radii = new Array[Float](n)
    val vtypes = new Array[Byte](n)
    old.zipWithIndex.foreach { case (o, m) =>
      verts(3 * m) = s.vertices(3 * o)
      verts(3 * m + 1) = s.vertices(3 * o + 1)
      verts(3 * m + 2) = s.vertices(3 * o + 2)
      radii(m) = s.radii(o); vtypes(m) = s.vertexTypes(o)
    }
    val eset = new java.util.TreeSet[Long]()
    i = 0
    while (i < s.edges.length) {
      val a = remap(s.edges(i)); val b = remap(s.edges(i + 1))
      if (a != b)
        eset.add((math.min(a, b).toLong << 32) | math.max(a, b).toLong)
      i += 2
    }
    val edges = new Array[Int](2 * eset.size)
    val it = eset.iterator()
    i = 0
    while (it.hasNext) {
      val k = it.next()
      edges(i) = (k >> 32).toInt; edges(i + 1) = k.toInt; i += 2
    }
    Skeleton(verts, edges, radii, vtypes)
  }

  /** SWC text import. Ids may be arbitrary (non-contiguous, any
    * order); vertices index in line order, parents resolve in a
    * second pass so forward references parse. `#` comment lines and
    * blank lines skip; a parent id that never appears is a format
    * error (IllegalArgumentException, matching the binary codec's
    * validation contract).
    */
  def fromSwc(text: String): Skeleton = {
    val rows = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val f = l.split("\\s+")
        require(f.length == 7, s"SWC row has ${f.length} fields (need 7): $l")
        (f(0).toLong, f(1).toInt.toByte, f(2).toFloat, f(3).toFloat,
          f(4).toFloat, f(5).toFloat, f(6).toLong)
      }.toArray
    val nv = rows.length
    val idx = new java.util.HashMap[Long, Int](nv * 2)
    var i = 0
    while (i < nv) {
      require(!idx.containsKey(rows(i)._1),
        s"SWC duplicate vertex id ${rows(i)._1}")
      idx.put(rows(i)._1, i)
      i += 1
    }
    val vertices = new Array[Float](3 * nv)
    val radii = new Array[Float](nv)
    val vtypes = new Array[Byte](nv)
    val edges = Array.newBuilder[Int]
    i = 0
    while (i < nv) {
      val (_, t, x, y, z, r, p) = rows(i)
      vertices(3 * i) = x; vertices(3 * i + 1) = y; vertices(3 * i + 2) = z
      radii(i) = r; vtypes(i) = t
      if (p != -1L) {
        require(idx.containsKey(p), s"SWC parent id $p not defined")
        edges += idx.get(p) += i
      }
      i += 1
    }
    Skeleton(vertices, edges.result(), radii, vtypes)
  }
}
