package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Bbox, Vec3}
import graft.ops.RealLayerQueries
import graft.sources.PrecomputedIO

/** ROI coarse-pruning: out-of-ROI cutouts never touch the scan. */
class RoiSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-roi")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("out-of-ROI request plans NO neuroglancer scan, in-ROI does") {
    RealLayerQueries.ensure(spark, "/root/testdata/sf0.001")
    val outside = PrecomputedIO.cutoutVoxels(spark, RealLayerQueries.LayerDir,
      Bbox(Vec3(0, 0, 27), Vec3(60, 60, 28)))
    val planOut = outside.queryExecution.executedPlan.toString
    assert(!planOut.contains("neuroglancer"), planOut)
    // and it still returns the right background buffer
    assert(outside.count() === 60L * 60)
    assert(outside.filter("label != 0").count() === 0)

    val inside = PrecomputedIO.cutoutVoxels(spark, RealLayerQueries.LayerDir,
      Bbox(Vec3(4, 4, 4), Vec3(12, 12, 10)))
    val planIn = inside.queryExecution.executedPlan.toString
    assert(planIn.contains("neuroglancer"), planIn)
  }
}
