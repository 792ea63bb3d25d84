package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in graft.ops registries (operator pipeline + DuckDB
  * oracle side by side); this object just flattens them.
  */
object SparkEntry {
  def allQueries: Map[String, Q] =
    VolumeQueries.queries ++ ChunkQueries.queries ++
      TextQueries.queries ++ SimilarityQueries.queries ++
      MultimodalOps.queries ++ RealLayerQueries.queries ++ AnnotationQueries.queries ++
      WriteQueries.queries ++ MeshQueries.queries ++ XferQueries.queries ++
      MetaQueries.queries ++ GrapheneQueries.queries ++
      Zarr3Queries.queries ++ StreamQueries.queries ++ FormatQueries.queries ++
      SkeletonQueries.queries ++ SpatialIndexQueries.queries ++
      GraphQueries.queries ++ CompressoQueries.queries ++ DracoQueries.queries

  /** Flagship: write sf0.001 voxels into encoded chunk payloads, read
    * back the distinct labels through the codec path (A1 `unique`).
    */
  def entry(spark: SparkSession): DataFrame =
    ChunkEngine.uniqueLabels(
      ChunkEngine.fromVoxels(Derived.voxels(spark, "/root/testdata/sf0.001")))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case (k, Q(_, Some(o))) => k -> o }
}
