package graft.sources

import org.apache.spark.sql.SparkSession
import graft.core.Geom

/** Session-conf wrapper around [[Geom.scanPartitions]] — the shared
  * scan-task sizing rule for every chunk/block/object reader (DSv2
  * neuroglancer, zarr2/zarr3/n5 cutouts, by-id annotation objects).
  *
  * Both knobs are scale-dependent and therefore parameterised
  * (builder rules: local defaults must keep the driver's bench
  * comparable; production values go in the conf):
  *  - `spark.graft.scan.minBytesPerTask` (default 1 MiB): below this
  *    much estimated work per task, task-launch overhead dominates on
  *    local disk. A cluster reading a 100 TB layer never hits it —
  *    the parallelism/64-chunks-per-task cap rules there.
  *  - `spark.graft.scan.openCostBytes` (default 64 KiB): per-object
  *    open charge. Local fs opens cost ~tens of µs (~64 KiB at local
  *    NVMe bandwidth); object storage wants several MiB here, exactly
  *    like Spark's own `files.openCostInBytes` (4 MiB default).
  */
object ScanSizing {
  val MinBytesPerTaskKey = "spark.graft.scan.minBytesPerTask"
  val OpenCostBytesKey = "spark.graft.scan.openCostBytes"

  def partitions(spark: SparkSession, nChunks: Long, estBytes: Long): Int = {
    val minB = spark.conf.get(MinBytesPerTaskKey, (1L << 20).toString).toLong
    val openC = spark.conf.get(OpenCostBytesKey, (64L << 10).toString).toLong
    Geom.scanPartitions(nChunks, estBytes,
      math.max(spark.sparkContext.defaultParallelism, 1), minB, openC)
  }
}
