package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed 6-connected components over foreground voxels — the
  * volumetric labeling pass the reference ecosystem runs downstream of
  * cutouts (connected-components relabeling of a segmentation mask).
  * The reference itself delegates to an in-memory library; a 100 TB
  * volume needs the distributed formulation.
  *
  * Two-level design (the classic block-local + boundary-merge CC):
  *
  * 1. LOCAL: voxels are grouped by B³ block (one shuffle) and each
  *    block runs an in-memory union-find over its intra-block
  *    face-adjacencies. This collapses almost all structure for free:
  *    a 100 TB volume has ~voxels/B³ blocks, each independent, and the
  *    surviving graph has one node per block-local component instead
  *    of one per voxel.
  * 2. GLOBAL: only block-boundary adjacencies (the 2/B face fraction
  *    of voxels) are joined across blocks, yielding edges between
  *    local roots. Iterative min-label propagation with POINTER
  *    JUMPING (comp := comp(comp) each round) over that small root
  *    graph converges in O(log diameter-in-blocks) rounds; each round
  *    is localCheckpoint()ed so lineage stays flat (the j5 graphene
  *    fixpoint lesson), and convergence is detected with a cheap
  *    monotone aggregate (labels only ever decrease, so the comp sum
  *    strictly decreases until fixpoint) instead of a compare join.
  * 3. RELABEL: one join maps each voxel's local root to its global
  *    component.
  *
  * The final component id of a voxel is the minimum voxel id of its
  * component — deterministic, so results are comparable across runs
  * and engines. (The component's minimum vid is always a local root
  * in its own block, so propagating min over the root graph returns
  * exactly it.)
  */
object ConnectedComponents {

  /** Block edge length of the local union-find pass. 32³ = 32k voxels
    * max per group — far below executor memory at any real chunk size.
    */
  private val B = 32L

  /** Min-label connected components over an arbitrary undirected
    * graph. Shared by volumetric CC and the corpus dedup-cluster
    * operator.
    *
    * Level 0 is a PARTITION-LOCAL union-find — the map-side combine of
    * connected components: each task collapses every component wholly
    * resident in its edge partition in memory, so the iterative
    * shuffle loop only ever sees the cross-partition stitch graph
    * (vids whose local roots differ between partitions). On a pair
    * graph whose components are small (near-dup clusters), level 0
    * resolves almost everything in one narrow pass and the loop
    * converges in a round or two regardless of total edge count.
    *
    * Correctness: a component's minimum vid is a local root wherever
    * it appears (union keeps the smaller vid), consecutive path edges
    * in different partitions share a vid and thus a stitch edge, so
    * the contracted root graph stays connected and min propagation
    * over it returns exactly the component minimum.
    *
    * @param edges0 directed edge rows (vid, nvid) — callers emit both
    *               directions
    * @param nodes node rows (vid); isolated nodes keep comp = vid
    * @return (vid, comp) with comp = min vid reachable from vid
    */
  def propagateMin(s: SparkSession, edges0: DataFrame, nodes: DataFrame): DataFrame = {
    import s.implicits._
    // observe: the row count rides the checkpoint job's accumulators,
    // so the empty-graph branch below costs no separate isEmpty job
    val localPre = edges0
      .select(col("vid").cast("long"), col("nvid").cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(a: Long): Long = {
          var r = a
          while (parent.getOrDefault(r, r) != r) r = parent.get(r)
          var c = a
          while (parent.getOrDefault(c, c) != r) {
            val nx = parent.get(c); parent.put(c, r); c = nx
          }
          r
        }
        it.foreach { case (a, b) =>
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
          }
        }
        import scala.jdk.CollectionConverters._
        parent.keySet.asScala.iterator.map(v => (v.toLong, find(v)))
      }.toDF("vid", "lroot")
      .observe("graft_localmap", count(lit(1)).as("n"))
    val localMap = localPre.localCheckpoint()
    val localN =
      localPre.queryExecution.observedMetrics("graft_localmap").getLong(0)
    // stitch edges: a vid split across partitions carries one lroot
    // row per partition; star them onto the smallest
    val multi = localMap.groupBy("vid")
      .agg(collect_set(col("lroot")).as("rs"))
      .filter(size(col("rs")) > 1)
      .select(explode(col("rs")).as("a"), array_min(col("rs")).as("b"))
      .filter(col("a") =!= col("b"))
    val stitch = multi.select(col("a").as("vid"), col("b").as("nvid"))
      .unionAll(multi.select(col("b").as("vid"), col("a").as("nvid")))
    val rootNodes = localMap.select(col("lroot").as("vid")).distinct()
    val rootComp =
      if (localN == 0L)
        localMap.select(col("vid"), col("vid").as("comp"))
      else iterateSized(s, stitch, rootNodes, localN)
    val mapped = localMap
      .join(rootComp.withColumnRenamed("vid", "lroot"), Seq("lroot"))
      .groupBy("vid").agg(min("comp").as("comp"))
    nodes.select(col("vid")).join(mapped, Seq("vid"), "left")
      .select(col("vid"), coalesce(col("comp"), col("vid")).as("comp"))
  }

  /** Size the iterative loop's execution to the OBSERVED state
    * (localN (vid, lroot) rows × ~24 B, already measured by the
    * checkpoint job's accumulator): the stitch/root graph is the
    * contracted remainder of the partition-local union-find, and at
    * bench scale every AQE exchange materialization inside a round is
    * a whole job submission (~6 jobs/round of 1-task stages measured
    * on a6c). When the sized width collapses below the core count the
    * loop is pinned — AQE off + state-sized static shuffle width — so
    * each round runs as ONE checkpoint job. At real scale the sizing
    * rule returns the parallelism cap, the pin never engages, and AQE
    * keeps its skew-split/coalesce protections for the big-graph
    * rounds (the conf knobs are ScanSizing's, already parameterised).
    */
  private def iterateSized(s: SparkSession, edges0: DataFrame,
      nodes: DataFrame, localN: Long): DataFrame = {
    val width = graft.sources.ScanSizing.rowWidth(s, localN, 24L)
    val pin = width < math.max(1, s.sparkContext.defaultParallelism)
    if (!pin) iterateMin(edges0, nodes)
    else {
      val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.shuffle.partitions", width.toString)
      try iterateMin(edges0, nodes)
      finally {
        s.conf.set("spark.sql.adaptive.enabled", prevAqe)
        s.conf.set("spark.sql.shuffle.partitions", prevParts)
      }
    }
  }

  /** The iterative core: min propagation + pointer jumping via the
    * shared Frontier.fixpoint loop (one checkpointed action per
    * round), monotone-sum convergence probe.
    */
  private def iterateMin(edges0: DataFrame, nodes: DataFrame): DataFrame = {
    // pre-partition the (fixed) edge table by the join key it is
    // probed on every round: localCheckpoint preserves the output
    // partitioning, so the per-round neighborhood join re-shuffles
    // only the (shrinking-entropy) comp table, never the edges
    val edges = edges0.repartition(col("nvid")).localCheckpoint()
    // convergence probe: per-node labels are non-increasing (least()
    // then jump to comp(comp) <= comp), so the global sum strictly
    // decreases every non-converged round. decimal(38,0) keeps the
    // sum exact at any node count / id range. The sum is observed
    // DURING the round's checkpoint job (Frontier.fixpointObserved) —
    // no separate aggregate job per round.
    var prev: java.math.BigDecimal = null
    Frontier.fixpointObserved(
      nodes.select(col("vid"), col("vid").as("comp")),
      sum(col("comp").cast("decimal(38,0)")).as("comp_sum")) {
      (comp, _) =>
        // round part 1: take the min comp over the neighborhood
        val nbrMin = edges.as("e")
          .join(comp.as("c"), col("e.nvid") === col("c.vid"))
          .groupBy(col("e.vid").as("vid")).agg(min(col("c.comp")).as("ncomp"))
        val stepped = comp.join(nbrMin, Seq("vid"), "left")
          .select(col("vid"),
            least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        // round part 2: pointer jump comp := comp(comp) (path halving)
        val ptr = stepped.select(col("vid").as("cvid"), col("comp").as("ccomp"))
        stepped.as("s")
          .join(ptr.as("p"), col("s.comp") === col("p.cvid"), "left")
          .select(col("s.vid").as("vid"),
            coalesce(col("p.ccomp"), col("s.comp")).as("comp"))
    } { (row, _) =>
      val cur = Option(row.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)
      val done = prev != null && cur.compareTo(prev) == 0
      prev = cur
      done
    }
  }

  /** @param fg foreground voxel rows (x, y, z) — caller pre-filters
    *           background
    * @return (x, y, z, comp) with comp = min voxel id of its 6-connected
    *         component, vid = x + sx*(y + sy*z)
    */
  def label6(s: SparkSession, fg: DataFrame, sx: Long, sy: Long): DataFrame = {
    import s.implicits._
    val b = B
    val pts0 = fg.select(col("x").cast("long"), col("y").cast("long"),
      col("z").cast("long")).as[(Long, Long, Long)]

    // stage 1: block-local union-find; emit (vid, root) with root =
    // min vid of the block-local component
    val local = pts0
      .groupByKey(t => (t._1 / b, t._2 / b, t._3 / b))
      .flatMapGroups { (_: (Long, Long, Long), it: Iterator[(Long, Long, Long)]) =>
        val pts = it.toArray
        val n = pts.length
        val vids = new Array[Long](n)
        val idx = new java.util.HashMap[java.lang.Long, Integer](n * 2)
        var i = 0
        while (i < n) {
          val (x, y, z) = pts(i)
          val vid = x + sx * (y + sy * z)
          vids(i) = vid; idx.put(vid, i); i += 1
        }
        val parent = Array.tabulate(n)(identity)
        def find(a: Int): Int = {
          var r = a
          while (parent(r) != r) r = parent(r)
          var c = a
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        // union keeps the smaller VID as root, so local roots are
        // component-minimum vids by construction
        def union(a: Int, bb: Int): Unit = {
          val ra = find(a); val rb = find(bb)
          if (ra != rb) {
            if (vids(ra) < vids(rb)) parent(rb) = ra else parent(ra) = rb
          }
        }
        i = 0
        while (i < n) {
          val (x, y, z) = pts(i)
          if ((x + 1) % b != 0) {
            val j = idx.get(x + 1 + sx * (y + sy * z))
            if (j != null) union(i, j)
          }
          if ((y + 1) % b != 0) {
            val j = idx.get(x + sx * (y + 1 + sy * z))
            if (j != null) union(i, j)
          }
          if ((z + 1) % b != 0) {
            val j = idx.get(x + sx * (y + sy * (z + 1)))
            if (j != null) union(i, j)
          }
          i += 1
        }
        (0 until n).iterator.map(k => (vids(k), vids(find(k))))
      }.toDF("vid", "root")
      .localCheckpoint()

    // stage 2: cross-block adjacencies — only block-face voxels join
    // (a 2/B fraction per axis), emitting edges between local roots
    val withXyz = local.select(col("vid"), col("root"),
      pmod(col("vid"), lit(sx)).as("x"),
      pmod(expr(s"vid div $sx"), lit(sy)).as("y"),
      expr(s"vid div ${sx * sy}").as("z"))
    val half = Seq(
      (1L, 0L, 0L, "x"), (0L, 1L, 0L, "y"), (0L, 0L, 1L, "z")).map {
      case (dx, dy, dz, axis) =>
        val hi = withXyz.filter(pmod(col(axis), lit(b)) === b - 1)
          .select(col("x"), col("y"), col("z"), col("root"))
        val lo = withXyz.filter(pmod(col(axis), lit(b)) === 0)
          .select((col("x") - dx).as("x"), (col("y") - dy).as("y"),
            (col("z") - dz).as("z"), col("root").as("nroot"))
        hi.join(lo, Seq("x", "y", "z"))
          .select(col("root").as("vid"), col("nroot").as("nvid"))
    }.reduce(_ unionAll _).filter(col("vid") =!= col("nvid"))
    val edges = half.unionAll(
      half.select(col("nvid").as("vid"), col("vid").as("nvid"))).distinct()

    // stage 3: min propagation over the (small) root graph
    val nodes = local.select(col("root").as("vid")).distinct()
    val rootComp = propagateMin(s, edges, nodes)

    // stage 4: relabel voxels; vid -> coordinates is pure arithmetic
    // (`div` keeps the division integral — long `/` is double-backed,
    // exact only below 2^53)
    local.join(rootComp.withColumnRenamed("vid", "root"), Seq("root"))
      .select(pmod(col("vid"), lit(sx)).as("x"),
        pmod(expr(s"vid div $sx"), lit(sy)).as("y"),
        expr(s"vid div ${sx * sy}").as("z"),
        col("comp"))
  }
}
