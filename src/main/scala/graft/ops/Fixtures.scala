package graft.ops

import org.apache.spark.sql.SparkSession

/** Pre-build every fixture family (bench setup): fixture construction
  * is test scaffolding, not operator work, so the bench hoists it out
  * of the per-query timings for ALL families, not just the real layer.
  */
/** Stderr breadcrumb on every fixture rebuild. Fixtures are built once
  * in bench setup (Fixtures.ensureAll); a rebuild INSIDE a timed bench
  * pass means some entry invalidated a sibling's fixture (marker
  * cross-talk) and is charging the rebuild to whichever query touched
  * it first — this line is how that gets caught.
  */
object FixtureLog {
  private val events =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()

  def rebuild(marker: java.nio.file.Path): Unit = {
    events.add((System.nanoTime(), marker.toString))
    System.err.println(s"[fixture-rebuild] ${java.time.Instant.now()} $marker")
  }

  /** Rebuilds recorded after `sinceNanos` (System.nanoTime basis) —
    * the bench reports any that land inside the timed loop, where a
    * rebuild means fixture cross-talk distorting a query's number.
    */
  def rebuildsSince(sinceNanos: Long): Seq[String] = {
    import scala.jdk.CollectionConverters._
    events.iterator.asScala.filter(_._1 > sinceNanos).map(_._2).toSeq
  }
}

object Fixtures {
  /** Identity of the testdata drop at `sfDir`: the path plus the max
    * mtime across its parquet files. Fixture markers embed this so a
    * driver-side REGENERATION of the same sfDir (same path, new
    * content — it happened between rounds) invalidates every derived
    * fixture instead of serving encodes of the previous drop.
    */
  def srcStamp(sfDir: String): String = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(sfDir)
    val maxM =
      if (!java.nio.file.Files.isDirectory(dir)) 0L
      else {
        val st = java.nio.file.Files.list(dir)
        try st.iterator.asScala
          .filter(_.toString.endsWith(".parquet"))
          .map(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
          .foldLeft(0L)(math.max)
        finally st.close()
      }
    s"$sfDir@$maxM"
  }

  def ensureAll(s: SparkSession, sfDir: String): Unit = {
    RealLayerQueries.ensure(s, sfDir)
    MeshQueries.ensureMultiresSharded(s, sfDir) // also builds the base mesh set
    AnnotationQueries.ensureSharded(s, sfDir) // also builds the unsharded set
    AnnotationQueries.ensurePolyline(s, sfDir)
    SkeletonQueries.ensureSharded(s, sfDir) // also builds the unsharded set
    SpatialIndexQueries.ensure(s, sfDir)
    Zarr3Queries.ensureZarr2(s, sfDir) // also builds the zarr3 array
    Zarr3Queries.ensureZarr2F(s, sfDir)
    Zarr3Queries.ensureZstd(s, sfDir)
    Zarr3Queries.ensureT(s, sfDir)
    Zarr3Queries.ensureTC(s, sfDir)
    Zarr3Queries.ensureOme(s, sfDir)
    Zarr3Queries.ensureSharded(s, sfDir)
    Zarr3Queries.ensureN5(s, sfDir)
    Zarr3Queries.ensureN5Lz4(s, sfDir)
    Zarr3Queries.ensureN5Xz(s, sfDir)
    Zarr3Queries.ensureZarr2Blosc(s, sfDir)
    Zarr3Queries.ensureZarr2Zstd(s, sfDir)
    Zarr3Queries.ensureZarr2Ome(s, sfDir)
    Zarr3Queries.ensureZarr2Group(s, sfDir)
    Zarr3Queries.ensureZarr3Group(s, sfDir)
    Zarr3Queries.ensureZarr2Cons(s, sfDir)
    Zarr3Queries.ensureZarr3Cons(s, sfDir)
    Zarr3Queries.ensureN5Group(s, sfDir)
    Zarr3Queries.ensureZarr3Blosc(s, sfDir)
    Zarr3Queries.ensureN5Blosc(s, sfDir)
    StreamQueries.prepare(s, sfDir)
  }
}
