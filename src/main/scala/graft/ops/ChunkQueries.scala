package graft.ops

import org.apache.spark.sql.functions._
import graft.core.{Bbox, Vec3}

/** Queries that exercise the real chunk-table pipeline end to end:
  * voxel rows -> encoded binary chunk payloads -> codec-level reads.
  * The DuckDB oracle replays the same semantics on the raw voxel
  * derivation (max label per coordinate, background 0 for unwritten
  * voxels inside existing chunks).
  */
object ChunkQueries {
  import Derived._

  /** Per-voxel resolved volume + background, as a CTE. Background 0 is
    * always present at verify scale: 60k lineitem rows cannot fill the
    * 64x64x32 = 131072 voxel grid.
    */
  private val ResolvedCte: String = VoxelsCte +
    """,
      |resolved AS (
      |  SELECT x, y, z, max(label) AS label FROM voxels GROUP BY x, y, z)""".stripMargin

  val queries: Map[String, Q] = Map(

    // A1 over the encoded chunk table: write-then-unique round trip
    // (frontends/precomputed.py:590-628; chunks.labels:362-393)
    "a1_unique_chunked" -> Q(
      (s, dir) => ChunkEngine.uniqueLabels(
        ChunkEngine.fromVoxels(voxels(s, dir))),
      Some(s"""WITH $ResolvedCte
        |SELECT DISTINCT label FROM resolved
        |UNION SELECT 0 AS label""".stripMargin)),

    // S4: cutout read — prune chunks by bbox, decode, clip to request;
    // background voxels inside stored chunks surface as 0
    // (image/rx.py:239-379)
    "s4_cutout" -> Q(
      (s, dir) => ChunkEngine.cutoutVoxels(
        ChunkEngine.fromVoxels(voxels(s, dir)),
        Bbox(Vec3(12, 8, 6), Vec3(44, 40, 22))),
      Some(s"""WITH $ResolvedCte,
        |cx AS (SELECT unnest(range(12, 44)) AS x),
        |cxy AS (SELECT x, unnest(range(8, 40)) AS y FROM cx),
        |grid AS (SELECT x, y, unnest(range(6, 22)) AS z FROM cxy)
        |SELECT g.x, g.y, g.z, coalesce(r.label, 0) AS label
        |FROM grid g LEFT JOIN resolved r
        |  ON g.x = r.x AND g.y = r.y AND g.z = r.z""".stripMargin)),

    // J4 at the codec level: remap labels inside encoded payloads,
    // preserving missing, then unique (chunks.remap:395-421)
    "j4_remap_chunked" -> Q(
      (s, dir) => {
        val mapping = (0L until 100L).map(l => l -> (l + 10000L)).toMap
        ChunkEngine.uniqueLabels(
          ChunkEngine.remapPayloads(
            ChunkEngine.fromVoxels(voxels(s, dir)),
            mapping, preserveMissing = true))
      },
      Some(s"""WITH $ResolvedCte,
        |alllab AS (SELECT label FROM resolved UNION SELECT 0 AS label)
        |SELECT DISTINCT CASE WHEN label < 100 THEN label + 10000 ELSE label END
        |  AS label
        |FROM alllab""".stripMargin)),
  )
}
