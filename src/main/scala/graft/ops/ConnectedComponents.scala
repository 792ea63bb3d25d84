package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed 6-connected components over foreground voxels — the
  * volumetric labeling pass the reference ecosystem runs downstream of
  * cutouts (connected-components relabeling of a segmentation mask).
  * The reference itself delegates to an in-memory library; a 100 TB
  * volume needs the distributed formulation:
  *
  * - nodes: foreground voxels, id = x + sx*(y + sy*z)
  * - edges: face-adjacency (+x, +y, +z shifts), built with three
  *   equi-joins on coordinates — no broadcast of the voxel set
  * - labels: iterative min-label propagation with POINTER JUMPING
  *   (comp := comp(comp) each round), so convergence is O(log
  *   diameter) rounds rather than O(diameter) — the standard
  *   MapReduce-CC trick, each round two shuffle joins
  * - every round is localCheckpoint()ed: lineage stays flat, the next
  *   round's joins read shuffle output, not a growing DAG (the j5
  *   graphene fixpoint lesson)
  *
  * The final component id of a voxel is the minimum voxel id of its
  * component — deterministic, so results are comparable across runs
  * and engines.
  */
object ConnectedComponents {

  /** @param fg foreground voxel rows (x, y, z) — caller pre-filters
    *           background
    * @return (x, y, z, comp) with comp = min voxel id in the 6-connected
    *         component
    */
  def label6(s: SparkSession, fg: DataFrame, sx: Long, sy: Long): DataFrame = {
    val v = fg.select(col("x"), col("y"), col("z"),
      (col("x") + lit(sx) * (col("y") + lit(sy) * col("z"))).as("vid"))
      .localCheckpoint()

    // face-adjacent neighbor pairs, emitted in both directions
    val half = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L)).map {
      case (dx, dy, dz) =>
        val a = v.select(col("x"), col("y"), col("z"), col("vid"))
        val b = v.select((col("x") - dx).as("x"), (col("y") - dy).as("y"),
          (col("z") - dz).as("z"), col("vid").as("nvid"))
        a.join(b, Seq("x", "y", "z")).select(col("vid"), col("nvid"))
    }.reduce(_ unionAll _)
    val edges = half.unionAll(
      half.select(col("nvid").as("vid"), col("vid").as("nvid")))
      .localCheckpoint()

    var comp = v.select(col("vid"), col("vid").as("comp"))
      .localCheckpoint()
    var changed = true
    while (changed) {
      // round part 1: take the min comp over the neighborhood
      val nbrMin = edges.as("e")
        .join(comp.as("c"), col("e.nvid") === col("c.vid"))
        .groupBy(col("e.vid").as("vid")).agg(min(col("c.comp")).as("ncomp"))
      val stepped = comp.join(nbrMin, Seq("vid"), "left")
        .select(col("vid"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // round part 2: pointer jump comp := comp(comp) (path halving)
      val ptr = stepped.select(col("vid").as("cvid"), col("comp").as("ccomp"))
      val jumped = stepped.as("s")
        .join(ptr.as("p"), col("s.comp") === col("p.cvid"), "left")
        .select(col("s.vid").as("vid"),
          coalesce(col("p.ccomp"), col("s.comp")).as("comp"))
        .localCheckpoint()
      // convergence probe: one short-circuit action per O(log d) round
      changed = jumped.as("n")
        .join(comp.as("o"), col("n.vid") === col("o.vid"))
        .filter(col("n.comp") =!= col("o.comp")).limit(1).count() > 0
      comp = jumped
    }
    // vid -> coordinates is pure arithmetic; no join back to the
    // input. `div` keeps the division integral (long `/` is
    // double-backed, exact only below 2^53)
    comp.select(pmod(col("vid"), lit(sx)).as("x"),
      pmod(expr(s"vid div $sx"), lit(sy)).as("y"),
      expr(s"vid div ${sx * sy}").as("z"),
      col("comp"))
  }
}
