package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.sources.PrecomputedIO

/** Graphene agglomeration as data (J6/J7): the reference's graph
  * server calls become joins over an edge table (SURVEY §1.1).
  *
  * J6 leaves-of-root (frontends/graphene.py:918-963): descend the
  * hierarchy from root labels to nodes at stop_layer, constrained to a
  * bbox via the spatial bits packed in each label (the server does the
  * same chunk-position filtering).
  *
  * J7 agglomerate cutout (frontends/graphene.py:648-682): cutout ->
  * distinct labels -> resolve roots -> remap the cutout in place. The
  * cutout reads REAL chunk files; root resolution joins are broadcast
  * (label sets are small relative to voxels at any scale — they are
  * the distinct set).
  *
  * Labels are bit-packed per GrapheneLabelSpec (layer 8 bits, 10
  * spatial bits per axis — datasource/graphene/metadata.py:183-250).
  */
object GrapheneQueries {
  import Derived.{table, grapheneSpec, idiv}

  // bit-shift constants mirrored in the oracle SQL
  // layer << 56 | x << 46 | y << 36 | z << 26 | segid
  private val L = 72057594037927936L // 1 << 56
  private val X = 70368744177664L // 1 << 46
  private val Y = 68719476736L // 1 << 36
  private val Z = 67108864L // 1 << 26

  /** 3-level hierarchy from supplier: leaf (layer 1, spatial bits from
    * the supplier key) -> layer-2 parent -> layer-3 root — except
    * every 7th leaf, which SKIP-CONNECTS directly to its layer-3 root
    * (frontends/graphene.py:525-531: "Between chunk interconnections
    * (skip connections possible)" — a parent may sit more than one
    * layer above its child, so descent must key on each node's
    * decoded layer bits, never on a uniform depth).
    */
  private def edges(s: SparkSession, dir: String,
      materialize: Boolean = true): (DataFrame, DataFrame) = {
    // Column-level codec: keeps the derive inside whole-stage codegen
    // (the kernel-UDF twin is pinned against this arithmetic by f9)
    val enc = Derived.grapheneEncodeCol _
    val derived = table(s, dir, "supplier").select(
      col("s_suppkey").cast("long").as("sk"))
      .select(col("sk"),
        enc(lit(1), col("sk") % 20, (col("sk") * 3) % 20, col("sk") % 10,
          col("sk")).as("leaf"),
        idiv(col("sk"), 10).as("p2"),
        idiv(col("sk"), 100).as("p3"),
        (col("sk") % 7 === 0).as("skip"))
      .withColumn("parent", enc(lit(2), col("p2") % 10, (col("p2") * 3) % 10,
        col("p2") % 5, col("p2")))
      .withColumn("root", enc(lit(3), col("p3") % 5, (col("p3") * 3) % 5,
        col("p3") % 3, col("p3")))
    // materialize = true: checkpoint the node table AND the edge union
    // once per invocation, so iterative consumers (j5c/j6/j6b) join
    // against blocks instead of re-deriving the scan + distinct in
    // every frontier union branch — r14's j6b plan scanned the edge
    // source 48x because this subtree was rebuilt per branch. Single-
    // pass consumers with a pushable predicate (j5e) pass false and
    // keep the filter on the parquet scan.
    val leaves = if (materialize) derived.localCheckpoint() else derived
    val e1 = leaves.select(col("leaf").as("child"),
      when(col("skip"), col("root")).otherwise(col("parent")).as("parent"))
    // layer-2 nodes exist only where some non-skip leaf attaches
    val e2 = leaves.filter(!col("skip"))
      .select(col("parent").as("child"), col("root").as("parent"))
      .distinct()
    val es = e1.unionAll(e2)
    (leaves, if (materialize) es.localCheckpoint() else es)
  }

  val queries: Map[String, Q] = Map(

    // J6: leaves of every root within bbox x<10, y<10, z<5 at
    // stop_layer 1 — iterative downward frontier join with the
    // spatial-bit filter applied at the leaf layer. Skip connections
    // (graphene.py:525-531) mean a node can reach stop_layer in fewer
    // hops than the hierarchy depth, so each round EMITS the frontier
    // nodes whose decoded layer bits hit stop_layer and descends only
    // the rest — a fixed-depth unroll would descend past skip-
    // connected leaves and silently drop them.
    "j6_leaves_of_root" -> Q(
      (s, dir) => {
        val (_, es) = edges(s, dir)
        val down = es.select(col("parent").as("node"), col("child"))
        val roots = es.select(col("parent")).filter(
          shiftrightunsigned(col("parent"), 56) === 3)
          .distinct().select(col("parent").as("root"), col("parent").as("node"))
        val stopLayer = 1
        val layer = shiftrightunsigned(col("node"), 56)
        // bounded by the hierarchy depth from the graphene meta
        // (graphene/metadata.py:116-123): root layer 3 -> stop layer 1
        // is at most 2 descents; nodes AT stop_layer peel off early
        val (done, frontier) = Frontier.iterate(roots, maxRounds = 2)(
          (f, _) => f.filter(layer > stopLayer)
            .join(down, Seq("node"))
            .select(col("root"), col("child").as("node")))(
          (f, stepped, _) => (Seq(f.filter(layer === stopLayer)), stepped))
        val all = Frontier.unionAll(done, frontier)
          .filter(shiftrightunsigned(col("node"), 56) === stopLayer)
        val dec = Derived.grapheneDecodeCol _
        all
          .withColumn("d", dec(col("node")))
          .filter(col("d._2") < 10 && col("d._3") < 10 && col("d._4") < 5)
          .select(col("root"), col("node").as("leaf"))
      },
      Some(s"""WITH lf AS (
        |  SELECT s_suppkey AS sk, s_suppkey % 20 AS lx,
        |         (s_suppkey * 3) % 20 AS ly, s_suppkey % 10 AS lz,
        |         s_suppkey // 100 AS r
        |  FROM supplier)
        |SELECT 3 * $L + (r % 5) * $X + ((r * 3) % 5) * $Y + (r % 3) * $Z + r
        |         AS root,
        |       1 * $L + lx * $X + ly * $Y + lz * $Z + sk AS leaf
        |FROM lf WHERE lx < 10 AND ly < 10 AND lz < 5""".stripMargin)),

    // J6 stop_layer variant (graphene.py:918-930 get_leaves stop_layer,
    // :525-531 "lowest parent at or above that layer"): descend to
    // layer 2. Non-skip leaves resolve to their layer-2 parent; a
    // skip-connected leaf has NO layer-2 ancestor, so the branch's
    // answer is the node the descent would jump FROM (here the root) —
    // the edge's parent is emitted whenever the child's decoded layer
    // bits land BELOW stop_layer.
    "j6b_leaves_stop_layer" -> Q(
      (s, dir) => {
        val (_, es) = edges(s, dir)
        val down = es.select(col("parent").as("node"), col("child"))
        val roots = es.select(col("parent")).filter(
          shiftrightunsigned(col("parent"), 56) === 3)
          .distinct().select(col("parent").as("root"), col("parent").as("node"))
        val stopLayer = 2
        val layer = shiftrightunsigned(col("node"), 56)
        val (emitted, frontier) = Frontier.iterate(roots, maxRounds = 2)(
          (f, _) => f.filter(layer > stopLayer)
            .join(down, Seq("node"))
            .select(col("root"), col("node"), col("child"),
              shiftrightunsigned(col("child"), 56).as("clyr")))(
          (f, stepped, _) => (Seq(
            f.filter(layer === stopLayer),
            // skip connection jumping past stop_layer: the parent IS
            // the lowest ancestor at-or-above it for this branch
            stepped.filter(col("clyr") < stopLayer)
              .select(col("root"), col("node"))),
            stepped.filter(col("clyr") >= stopLayer)
              .select(col("root"), col("child").as("node"))))
        val out = Frontier.unionAll(emitted,
          frontier.filter(shiftrightunsigned(col("node"), 56) === stopLayer))
        val dec = Derived.grapheneDecodeCol _
        out.distinct()
          .withColumn("d", dec(col("node")))
          .filter(col("d._2") < 8 && col("d._3") < 8 && col("d._4") < 4)
          .select(col("root"), col("node"))
      },
      Some(s"""WITH lf AS (
        |  SELECT s_suppkey AS sk, s_suppkey // 10 AS p2,
        |         s_suppkey // 100 AS r
        |  FROM supplier),
        |n AS (
        |  SELECT DISTINCT
        |    3 * $L + (r % 5) * $X + ((r * 3) % 5) * $Y + (r % 3) * $Z + r
        |      AS root,
        |    CASE WHEN sk % 7 = 0
        |      THEN 3 * $L + (r % 5) * $X + ((r * 3) % 5) * $Y
        |           + (r % 3) * $Z + r
        |      ELSE 2 * $L + (p2 % 10) * $X + ((p2 * 3) % 10) * $Y
        |           + (p2 % 5) * $Z + p2 END AS node,
        |    CASE WHEN sk % 7 = 0 THEN r % 5 ELSE p2 % 10 END AS nx,
        |    CASE WHEN sk % 7 = 0 THEN (r * 3) % 5
        |         ELSE (p2 * 3) % 10 END AS ny,
        |    CASE WHEN sk % 7 = 0 THEN r % 3 ELSE p2 % 5 END AS nz
        |  FROM lf)
        |SELECT root, node FROM n
        |WHERE nx < 8 AND ny < 8 AND nz < 4""".stripMargin)),

    // J5 stop_layer variant (frontends/graphene.py:721-784 get_roots
    // stop_layer: "return the lowest parent at or above that layer"):
    // UPWARD resolution that stops early — inputs already at or above
    // stop_layer map to themselves (the reference's base_remap
    // self-mapping for layer in {stop_layer, n_layers}), everything
    // else climbs parent edges until its decoded layer bits reach
    // stop_layer. A skip-connected leaf's parent is the layer-3 root,
    // which lands ABOVE stop_layer 2 — the reference returns that
    // parent, not an (absent) layer-2 ancestor. The input set mixes
    // layer-1 leaves with their distinct layer-2 parents so both the
    // climb and the self-mapping paths execute.
    "j5c_roots_stop_layer" -> Q(
      (s, dir) => {
        val (lv, es) = edges(s, dir)
        val stopLayer = 2
        val up = es.select(col("child").as("node"), col("parent"))
        val inputs = lv.select(col("leaf").as("segid")).unionAll(
          lv.filter(!col("skip")).select(col("parent").as("segid"))
            .distinct())
        val start = inputs.select(col("segid"), col("segid").as("node"))
        val layer = shiftrightunsigned(col("node"), 56)
        // root layer 3 -> at most 2 climbs reach stop_layer from any
        // input; nodes at-or-above stop_layer peel off each round
        val (settled, frontier) = Frontier.iterate(start, maxRounds = 2)(
          (f, _) => f.filter(layer < stopLayer)
            .join(up, Seq("node"))
            .select(col("segid"), col("parent").as("node")))(
          (f, stepped, _) => (Seq(f.filter(layer >= stopLayer)), stepped))
        Frontier.unionAll(settled, frontier)
          .select(col("segid"), col("node").as("resolved"))
      },
      Some(s"""WITH lf AS (
        |  SELECT s_suppkey AS sk, s_suppkey // 10 AS p2,
        |         s_suppkey // 100 AS r
        |  FROM supplier),
        |ans AS (
        |  SELECT 1 * $L + (sk % 20) * $X + ((sk * 3) % 20) * $Y
        |           + (sk % 10) * $Z + sk AS segid,
        |         CASE WHEN sk % 7 = 0
        |           THEN 3 * $L + (r % 5) * $X + ((r * 3) % 5) * $Y
        |                + (r % 3) * $Z + r
        |           ELSE 2 * $L + (p2 % 10) * $X + ((p2 * 3) % 10) * $Y
        |                + (p2 % 5) * $Z + p2 END AS resolved
        |  FROM lf
        |  UNION ALL
        |  SELECT DISTINCT
        |    2 * $L + (p2 % 10) * $X + ((p2 * 3) % 10) * $Y
        |      + (p2 % 5) * $Z + p2 AS segid,
        |    2 * $L + (p2 % 10) * $X + ((p2 * 3) % 10) * $Y
        |      + (p2 % 5) * $Z + p2 AS resolved
        |  FROM lf WHERE sk % 7 <> 0)
        |SELECT segid, resolved FROM ans""".stripMargin)),

    // J5 as-of variant: proofreading-timestamp root resolution
    // (frontends/graphene.py:37-54,721-746 — "query the state of the
    // graph as of T"). Edges carry [valid_from, valid_to) validity; a
    // leaf's parent flips from the v1 to the v2 agglomeration at its
    // edit time. The as-of join is a plain validity filter before the
    // resolution join — the temporal predicate Spark pushes into the
    // edge scan.
    "j5b_roots_asof" -> Q(
      (s, dir) => {
        val T = 50L
        val leaves = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long").as("leaf"),
            (col("s_suppkey") % 100).cast("long").as("tedit"))
        val v1 = leaves.select(col("leaf").as("child"),
          (lit(100000L) + idiv(col("leaf"), 10)).as("parent"),
          lit(0L).as("valid_from"), col("tedit").as("valid_to"))
        val v2 = leaves.select(col("leaf").as("child"),
          (lit(150000L) + idiv(col("leaf"), 20)).as("parent"),
          col("tedit").as("valid_from"), lit(9999L).as("valid_to"))
        val edges = v1.unionAll(v2)
          .filter(col("valid_from") <= T && col("valid_to") > T)
        leaves.select(col("leaf"))
          .join(edges, col("leaf") === col("child"))
          .select(col("leaf"), col("parent").as("root_asof"))
      },
      Some("""SELECT s_suppkey AS leaf,
        |  CASE WHEN s_suppkey % 100 <= 50
        |       THEN 150000 + s_suppkey // 20
        |       ELSE 100000 + s_suppkey // 10 END AS root_asof
        |FROM supplier""".stripMargin)),

    // J5 chunk mappings (frontends/graphene.py:786-840
    // get_chunk_mappings): for one L2 chunk, the mapping of every
    // layer-2 segment in that chunk to its L1 watershed children. The
    // function accepts ANY graphene label and zeroes its segid
    // component to form the chunk id (graphene.py:796-797,819-820);
    // here the caller passes a label with segid 99 and the query
    // masks the low 26 segid bits before matching. The chunk lookup
    // is a constant-prefix filter on the packed-label bits — at scale
    // it prunes the edge scan to one chunk's partition, no join at
    // all (the server's l2_chunk_children range read becomes a
    // predicate-pushdown scan).
    "j5e_chunk_mappings" -> Q(
      (s, dir) => {
        // un-materialized: this is a single constant-prefix filter, and
        // the point is the predicate reaching the source scan
        val (_, es) = edges(s, dir, materialize = false)
        // any label in chunk (layer 2, x=0, y=0, z=0); segid masked off
        val someLabel = 2L * L + 99L
        val segMask = (1L << 26) - 1
        val chunkId = someLabel & ~segMask
        es.filter(shiftrightunsigned(col("parent"), 56) === 2 &&
            col("parent").bitwiseAND(lit(~segMask)) === chunkId)
          .select(col("parent").as("chunk_label"), col("child"))
      },
      Some(s"""WITH lf AS (
        |  SELECT s_suppkey AS sk, s_suppkey // 10 AS p2 FROM supplier
        |  WHERE s_suppkey % 7 <> 0)
        |SELECT 2 * $L + (p2 % 10) * $X + ((p2 * 3) % 10) * $Y
        |         + (p2 % 5) * $Z + p2 AS chunk_label,
        |       1 * $L + (sk % 20) * $X + ((sk * 3) % 20) * $Y
        |         + (sk % 10) * $Z + sk AS child
        |FROM lf
        |WHERE p2 % 10 = 0 AND (p2 * 3) % 10 = 0 AND p2 % 5 = 0""".stripMargin)),

    // J5 lineage graph (frontends/graphene.py lineage endpoints /
    // chunkedgraph get_lineage_graph): every split/merge operation
    // links a CURRENT root to the root(s) it evolved from, and the
    // lineage of a root is the transitive closure over those operation
    // edges. Modeled as data: an operations edge table (merges give a
    // root TWO past parents), traversed backward by the same iterative
    // frontier join as j6 — per-round work bounded by the frontier,
    // rounds bounded by history depth, broadcast edges (the ops log of
    // any root's history is tiny relative to the voxel data).
    "j5d_lineage_graph" -> Q(
      (s, dir) => {
        val sup = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long").as("sk"))
        val cur = sup.select(col("sk"), (lit(500000L) + col("sk")).as("root"))
        // ops log: every root came from pastA; every 3rd was a MERGE
        // (second parent pastB); pastA of even sk has one more ancestor
        val e1 = cur.select(col("root").as("child"),
          (lit(600000L) + col("sk")).as("parent"))
        val e2 = cur.filter(col("sk") % 3 === 0)
          .select(col("root").as("child"),
            (lit(700000L) + col("sk")).as("parent"))
        val e3 = cur.filter(col("sk") % 2 === 0)
          .select((lit(600000L) + col("sk")).as("child"),
            (lit(800000L) + col("sk")).as("parent"))
        val edges = broadcast(e1.unionAll(e2).unionAll(e3))
        val roots = cur.filter(col("sk") % 5 === 0)
          .select(col("root").as("q"), col("root").as("node"))
        val (hops, _) = Frontier.iterate(roots, maxRounds = 8,
          probeEmpty = true)(
          (f, _) => f.join(edges, f("node") === edges("child"))
            .select(col("q"), col("parent").as("node")))(
          (_, stepped, round) => (Seq(stepped.select(col("q").as("root"),
            col("node").as("ancestor"),
            lit(round.toLong + 1L).as("depth"))), stepped))
        hops.reduce(_ unionAll _)
      },
      Some("""WITH q AS (SELECT 500000 + s_suppkey AS root, s_suppkey AS sk
        |           FROM supplier WHERE s_suppkey % 5 = 0)
        |SELECT root, 600000 + sk AS ancestor, CAST(1 AS BIGINT) AS depth
        |FROM q
        |UNION ALL
        |SELECT root, 700000 + sk AS ancestor, CAST(1 AS BIGINT) AS depth
        |FROM q WHERE sk % 3 = 0
        |UNION ALL
        |SELECT root, 800000 + sk AS ancestor, CAST(2 AS BIGINT) AS depth
        |FROM q WHERE sk % 2 = 0""".stripMargin)),

    // J5 lineage over a TIME WINDOW (frontends/graphene.py get_roots
    // timestamp semantics + the chunkedgraph lineage-graph endpoint's
    // timestamp_past/timestamp_future bounds): all ids a segid maps to
    // within [t0, t1] — the op-log closure reached by walking merges/
    // splits BACKWARD only through operations at ts >= t0 and FORWARD
    // only through operations at ts <= t1. Modeled as a validity-
    // windowed operation-edge table (old id -> new id at ts) built
    // arithmetically from supplier: each segid has three generations
    // (500k/600k/700k + sk) handed off at ts a = sk%50+20 and
    // b = a+30, and every 3rd sk's generation-3 id was a MERGE with a
    // sibling 650k+sk. Bounded bidirectional frontier join: per round,
    // the frontier joins the broadcast op log once in each direction,
    // new nodes dedup against the known set via left-anti (never a
    // re-scan of history), rounds bounded by op-log depth — the shape
    // that holds when the op log is millions of edits but any one
    // id's history is shallow.
    "j5f_lineage_window" -> Q(
      (s, dir) => {
        val t0 = 25L; val t1 = 60L
        val g = table(s, dir, "supplier")
          .select(col("s_suppkey").cast("long").as("sk"))
          .withColumn("a", col("sk") % 50 + 20)
          .withColumn("b", col("sk") % 50 + 50)
        val e1 = g.select((lit(500000L) + col("sk")).as("old"),
          (lit(600000L) + col("sk")).as("new"), col("a").as("ts"))
        val e2 = g.select((lit(600000L) + col("sk")).as("old"),
          (lit(700000L) + col("sk")).as("new"), col("b").as("ts"))
        val e3 = g.filter(col("sk") % 3 === 0)
          .select((lit(650000L) + col("sk")).as("old"),
            (lit(700000L) + col("sk")).as("new"), col("b").as("ts"))
        val ops = broadcast(e1.unionAll(e2).unionAll(e3))
        var known = g.filter(col("sk") % 5 === 2)
          .select((lit(600000L) + col("sk")).as("q"))
          .select(col("q"), col("q").as("id"))
        // 3 generations -> closure fixed-points in <= 3 rounds; an
        // empty frontier short-circuits (one cheap probe on the
        // checkpointed rows beats a full dead round of join jobs)
        Frontier.iterate(known, maxRounds = 3, probeEmpty = true)(
          (f, _) => {
            val back = f
              .join(ops, f("id") === ops("new") && ops("ts") >= t0)
              .select(col("q"), col("old").as("id"))
            val fwd = f
              .join(ops, f("id") === ops("old") && ops("ts") <= t1)
              .select(col("q"), col("new").as("id"))
            back.unionAll(fwd).distinct()
              .join(known, Seq("q", "id"), "left_anti")
          })(
          (_, stepped, _) => { known = known.unionAll(stepped)
            (Seq.empty, stepped) })
        known
      },
      Some("""WITH q AS (SELECT s_suppkey AS sk FROM supplier
        |           WHERE s_suppkey % 5 = 2)
        |SELECT 600000 + sk AS q, 600000 + sk AS id FROM q
        |UNION ALL
        |SELECT 600000 + sk, 500000 + sk FROM q WHERE sk % 50 >= 5
        |UNION ALL
        |SELECT 600000 + sk, 700000 + sk FROM q WHERE sk % 50 <= 10
        |UNION ALL
        |SELECT 600000 + sk, 650000 + sk FROM q
        |WHERE sk % 50 <= 10 AND sk % 3 = 0""".stripMargin)),

    // J7: agglomerate cutout — real-layer cutout, distinct labels
    // resolve through a 2-level mapping, voxels remapped in place
    "j7_agglomerate_cutout" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        val cut = PrecomputedIO.cutoutVoxels(s, RealLayerQueries.LayerDir,
          Bbox(Vec3(6, 10, 4), Vec3(50, 42, 20)))
        // distinct labels of the cutout (A1) -> arithmetic edge tables
        // (the graph-server state as data) -> root per label
        val labels = cut.select(col("label")).distinct()
        val l2 = labels.select(col("label"),
          (lit(1000000L) + idiv(col("label"), 10)).as("parent"))
        val mapping = l2.select(col("label"),
          (lit(2000000L) + idiv(col("parent") - 1000000L, 10)).as("root"))
        cut.join(broadcast(mapping), Seq("label"))
          .select(col("x"), col("y"), col("z"), col("root"))
      },
      Some(s"""SELECT x, y, z,
        |  2000000 + (label // 100) AS root
        |FROM read_parquet('${RealLayerQueries.VoxelsDir}/*.parquet')
        |WHERE x BETWEEN 6 AND 49 AND y BETWEEN 10 AND 41
        |  AND z BETWEEN 4 AND 19""".stripMargin)),

    // J7 scattered points (frontends/graphene.py:93-170
    // scattered_points): resolve the agglomerated root under each of a
    // SCATTERED set of coordinates — the graphene sibling of the
    // precomputed download_points. Points group by owning chunk (one
    // random-access cseg read per chunk, no full decode), the distinct
    // supervoxels under them resolve roots ONCE (the reference dedups
    // before its get_roots call, :150-160), and the root map joins
    // back broadcast. At scale: chunk-grouped point reads touch only
    // the chunks points land in; the root-resolution join is sized by
    // the distinct supervoxel set, not the point count.
    "j7b_scattered_points" -> Q(
      (s, dir) => {
        RealLayerQueries.ensure(s, dir)
        val SX = RealLayerQueries.SX; val SY = RealLayerQueries.SY
        val SZ = RealLayerQueries.SZ
        val CXl = RealLayerQueries.CX; val CYl = RealLayerQueries.CY
        val CZl = RealLayerQueries.CZ
        val pts = table(s, dir, "orders")
          .filter(col("o_orderkey") % 5 === 1)
          .select(col("o_orderkey").cast("long").as("pid"),
            (col("o_orderkey") % SX).cast("long").as("x"),
            ((col("o_custkey") * 7) % SY).cast("long").as("y"),
            (col("o_orderkey") % SZ).cast("long").as("z"))
        import s.implicits._
        val csegDir = RealLayerQueries.LayerCsegDir
        val scale = RealLayerQueries.metaCseg.scale(0)
        val bs = RealLayerQueries.CsegBlock
        val looked = pts.as[(Long, Long, Long, Long)]
          .groupByKey(t => (t._2 / CXl, t._3 / CYl, t._4 / CZl))
          .flatMapGroups { (key: (Long, Long, Long),
              it: Iterator[(Long, Long, Long, Long)]) =>
            val g = Vec3(key._1, key._2, key._3)
            val payload =
              PrecomputedIO.readChunkBytes(csegDir, scale, g).get
            val cb = Geom.chunkBbox(g, scale.bounds, scale.chunkSize)
            it.map { case (pid, x, y, z) =>
              (pid, x, y, z, Cseg.readVoxel(payload, cb.size, bs, 4,
                x - cb.minpt.x, y - cb.minpt.y, z - cb.minpt.z))
            }
          }.toDF("pid", "x", "y", "z", "label")
        val mapping = looked.select(col("label")).distinct()
          .select(col("label"),
            (lit(2000000L) + idiv(col("label"), 100)).as("root"))
        looked.join(broadcast(mapping), Seq("label"))
          .select("pid", "x", "y", "z", "root")
      },
      Some(s"""WITH pts AS (
        |  SELECT o_orderkey AS pid, o_orderkey % 60 AS x,
        |         (o_custkey * 7) % 60 AS y, o_orderkey % 28 AS z
        |  FROM orders WHERE o_orderkey % 5 = 1)
        |SELECT p.pid, p.x, p.y, p.z, 2000000 + (v.label // 100) AS root
        |FROM pts p
        |JOIN read_parquet('${RealLayerQueries.VoxelsDir}/*.parquet') v
        |  ON v.x = p.x AND v.y = p.y AND v.z = p.z""".stripMargin)),
  )
}
