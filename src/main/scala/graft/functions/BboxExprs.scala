package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL-surface bbox / graphene-label expressions (F4, F5, F9), the
  * remainder of the §2.10 expression family beyond morton/mmh3/shard
  * (`MortonCode.scala`). All codegen'd static calls over primitive
  * longs — the marquee spatial query
  * `SELECT DISTINCT label ... WHERE graft_bbox_overlaps(...)` runs
  * fully inside whole-stage codegen with these registered via
  * `GraftExtensions`.
  */
object BboxOps {
  /** Half-open interval overlap on each axis (a ∩ b non-empty for
    * boxes [x0, x1) × [y0, y1) × [z0, z1)) — the spatial-index
    * tile-assignment predicate (reference spatial_index.py:248-307;
    * same predicate as SpatialIndexQueries' a3 filters). NOTE:
    * deliberately NOT Bbox.overlapsBbox's closed-boundary test —
    * touching boxes share no voxel.
    */
  def overlaps(ax0: Long, ay0: Long, az0: Long, ax1: Long, ay1: Long,
      az1: Long, bx0: Long, by0: Long, bz0: Long, bx1: Long, by1: Long,
      bz1: Long): Boolean =
    ax0 < bx1 && ax1 > bx0 && ay0 < by1 && ay1 > by0 &&
      az0 < bz1 && az1 > bz0

  /** Voxel count of [x0,x1) x [y0,y1) x [z0,z1), degenerate axes
    * clamped to 0 (Bbox.volume semantics).
    */
  def volume(x0: Long, y0: Long, z0: Long, x1: Long, y1: Long,
      z1: Long): Long =
    math.max(x1 - x0, 0) * math.max(y1 - y0, 0) * math.max(z1 - z0, 0)

  /** F5: the precomputed chunk-object filename for a bbox
    * ("x0-x1_y0-y1_z0-z1", Bbox.toFilename / Geom's codec).
    */
  def filename(x0: Long, y0: Long, z0: Long, x1: Long, y1: Long,
      z1: Long): UTF8String =
    UTF8String.fromString(s"$x0-${x1}_$y0-${y1}_$z0-$z1")

  /** F9: graphene label's layer (top `layerBits` bits, unsigned;
    * GrapheneLabelSpec.decodeLayer, metadata.py:183-250).
    */
  def grapheneLayer(label: Long, layerBits: Long): Long = {
    require(layerBits >= 1 && layerBits <= 32,
      s"graft_graphene_layer: layer_bits $layerBits outside [1, 32]")
    label >>> (64 - layerBits.toInt)
  }

  /** F9: graphene label's segid given the layer's spatial bit count
    * (GrapheneLabelSpec.decode's low segidBits = 64 - layerBits -
    * 3*ct bits).
    */
  def grapheneSegid(label: Long, layerBits: Long, ct: Long): Long = {
    // bound ct directly before computing sb: a hostile ct near 2^62
    // overflows 3*ct, so sb could wrap positive, pass a `sb >= 1`
    // check, and then (1L << sb) would use only the low 6 shift bits
    require(layerBits >= 1 && layerBits <= 32 && ct >= 0 && ct <= 21,
      s"graft_graphene_segid: layer_bits $layerBits / spatial bits $ct " +
        "outside [1,32] x [0,21]")
    val sb = 64 - layerBits - 3 * ct
    require(sb >= 1,
      s"graft_graphene_segid: layer_bits $layerBits / spatial bits $ct " +
        "leave no segid bits")
    label & ((1L << sb.toInt) - 1L)
  }
}

/** Boolean twin of StaticLongCallExpr: long children, one static call,
  * boolean result — kept separate because the codegen prologue types
  * the result slot.
  */
abstract class StaticBoolCallExpr extends Expression {
  def staticCall: String
  def evalStatic(args: Seq[Long]): Boolean

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)

  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"$prettyName expects integral arguments, got ${other.getClass}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else evalStatic(vs.map(toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code).reduce(_ + _)
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val args = evals.map(_.value).mkString(", ")
    ev.copy(code = childCode + code"""
      |boolean ${ev.isNull} = $anyNull;
      |boolean ${ev.value} = false;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $staticCall($args);
      |}""".stripMargin)
  }
}

/** String twin (filename codec). */
abstract class StaticStringCallExpr extends Expression {
  def staticCall: String
  def evalStatic(args: Seq[Long]): UTF8String

  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)

  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
    case other => throw new IllegalArgumentException(
      s"$prettyName expects integral arguments, got ${other.getClass}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else evalStatic(vs.map(toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code).reduce(_ + _)
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val args = evals.map(_.value).mkString(", ")
    ev.copy(code = childCode + code"""
      |boolean ${ev.isNull} = $anyNull;
      |UTF8String ${ev.value} = null;
      |if (!${ev.isNull}) {
      |  ${ev.value} = $staticCall($args);
      |}""".stripMargin)
  }
}

/** graft_bbox_overlaps(ax0,ay0,az0,ax1,ay1,az1, bx0,by0,bz0,bx1,by1,bz1) */
case class BboxOverlapsExpr(children: Seq[Expression]) extends StaticBoolCallExpr {
  require(children.length == 12,
    "graft_bbox_overlaps takes 12 arguments (two x0,y0,z0,x1,y1,z1 boxes)")
  override def staticCall: String = "graft.functions.BboxOps.overlaps"
  override def evalStatic(args: Seq[Long]): Boolean =
    BboxOps.overlaps(args(0), args(1), args(2), args(3), args(4), args(5),
      args(6), args(7), args(8), args(9), args(10), args(11))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** graft_bbox_volume(x0,y0,z0,x1,y1,z1) */
case class BboxVolumeExpr(children: Seq[Expression]) extends StaticLongCallExpr {
  require(children.length == 6, "graft_bbox_volume takes 6 arguments")
  override def staticCall: String = "graft.functions.BboxOps.volume"
  override def evalStatic(args: Seq[Long]): Long =
    BboxOps.volume(args(0), args(1), args(2), args(3), args(4), args(5))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** graft_bbox_filename(x0,y0,z0,x1,y1,z1) */
case class BboxFilenameExpr(children: Seq[Expression]) extends StaticStringCallExpr {
  require(children.length == 6, "graft_bbox_filename takes 6 arguments")
  override def staticCall: String = "graft.functions.BboxOps.filename"
  override def evalStatic(args: Seq[Long]): UTF8String =
    BboxOps.filename(args(0), args(1), args(2), args(3), args(4), args(5))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** graft_parse_u64(s): decimal uint64 string -> two's-complement long.
  * Spark's CAST(s AS BIGINT) returns NULL for values >= 2^63, which
  * silently DROPS high labels parsed out of spatial-index JSON keys —
  * the exact uint64 fight the reference has in
  * spatial_index.py:876-879. Invalid input raises
  * NumberFormatException (an IllegalArgumentException, the decoder
  * contract) rather than nulling.
  */
case class ParseU64Expr(children: Seq[Expression]) extends Expression {
  require(children.length == 1, "graft_parse_u64(s) takes 1 argument")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) null
    else ParseU64Expr.call(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = children.head.genCode(ctx)
    ev.copy(code = c.code + code"""
      |boolean ${ev.isNull} = ${c.isNull};
      |long ${ev.value} = -1L;
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.functions.ParseU64Expr.call(${c.value});
      |}""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

object ParseU64Expr {
  def call(s: UTF8String): Long = java.lang.Long.parseUnsignedLong(s.toString)
}

/** graft_graphene_layer(label, layer_bits) */
case class GrapheneLayerExpr(children: Seq[Expression]) extends StaticLongCallExpr {
  require(children.length == 2,
    "graft_graphene_layer(label, layer_bits) takes 2 arguments")
  override def staticCall: String = "graft.functions.BboxOps.grapheneLayer"
  override def evalStatic(args: Seq[Long]): Long =
    BboxOps.grapheneLayer(args(0), args(1))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** graft_graphene_segid(label, layer_bits, spatial_bits) */
case class GrapheneSegidExpr(children: Seq[Expression]) extends StaticLongCallExpr {
  require(children.length == 3,
    "graft_graphene_segid(label, layer_bits, spatial_bits) takes 3 arguments")
  override def staticCall: String = "graft.functions.BboxOps.grapheneSegid"
  override def evalStatic(args: Seq[Long]): Long =
    BboxOps.grapheneSegid(args(0), args(1), args(2))
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}
