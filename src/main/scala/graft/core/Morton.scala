package graft.core

/** Compressed Morton codes as used by the Neuroglancer sharded format.
  *
  * Re-specifies `datasource/precomputed/common.py:55-86`
  * (compressed_morton_code) and its inverse `:100-124`. Unlike textbook
  * Morton interleaving, the "compressed" variant interleaves only while
  * an axis still has unexhausted bits: at each bit position i, a bit is
  * emitted for axis a only if `2^i < gridSize[a]` — so small axes stop
  * contributing and large axes pack densely. Total bits must be <= 64.
  */
object Morton {

  /** Number of bits needed for axis of grid size n (ceil log2). */
  def bitsFor(n: Long): Int = {
    require(n > 0, s"grid size must be positive: $n")
    if (n == 1) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
  }

  /** compressed_morton_code(gpt, grid_size) for one grid point. */
  def encode(g: Vec3, grid: Vec3): Long = {
    require(g.x < grid.x && g.y < grid.y && g.z < grid.z && g.x >= 0
      && g.y >= 0 && g.z >= 0, s"grid point $g outside grid $grid")
    val bits = Array(bitsFor(grid.x), bitsFor(grid.y), bitsFor(grid.z))
    val maxBits = bits.max
    require(bits.sum <= 64, s"morton code needs ${bits.sum} bits > 64")
    val coords = Array(g.x, g.y, g.z)
    var code = 0L
    var out = 0
    var i = 0
    while (i < maxBits) {
      var a = 0
      while (a < 3) {
        if (i < bits(a)) {
          code |= ((coords(a) >> i) & 1L) << out
          out += 1
        }
        a += 1
      }
      i += 1
    }
    code
  }

  /** Flat-arg variant for codegen callsites (Janino resolves Scala
    * object methods through the static forwarder on `graft.core.Morton`).
    */
  def encodeRaw(gx: Long, gy: Long, gz: Long,
      nx: Long, ny: Long, nz: Long): Long =
    encode(Vec3(gx, gy, gz), Vec3(nx, ny, nz))

  /** Inverse of [[encode]] (common.py:100-124 morton_code_to_gridpt). */
  def decode(code: Long, grid: Vec3): Vec3 = {
    val bits = Array(bitsFor(grid.x), bitsFor(grid.y), bitsFor(grid.z))
    val maxBits = bits.max
    val coords = Array(0L, 0L, 0L)
    var in = 0
    var i = 0
    while (i < maxBits) {
      var a = 0
      while (a < 3) {
        if (i < bits(a)) {
          coords(a) |= ((code >> in) & 1L) << i
          in += 1
        }
        a += 1
      }
      i += 1
    }
    Vec3(coords(0), coords(1), coords(2))
  }
}
