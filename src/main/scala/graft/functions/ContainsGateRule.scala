package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, LongType}
import graft.core.{Codec, Compresso, Cseg, Vec3}

/** Catalyst optimizer rule: push a voxel-level `label = K` filter down
  * to a payload-level codec `contains()` gate BELOW the decode stage.
  *
  * The reference does this inside its read path (chunks.contains:
  * 459-484 gates rx.decode_binary_image:756-806): chunks whose encoded
  * payload provably lacks the label are never fully decoded. Here the
  * same optimization is expressed where a Spark engine should express
  * it — as a `Rule[LogicalPlan]` (the builder-preference (c) shape) so
  * ANY query that filters a cutout on label equality benefits without
  * opting in at the call site.
  *
  * Matched shape (what the built-in optimizer leaves after pushing the
  * user's filter through the x/y/z/label projection):
  *
  *   Filter (vx#N._4 = K [AND ...])
  *   +- Generate explode(graft_decode_voxels:<enc>:<dtb>:<bs>(x0..z1, payload))
  *      +- <chunk relation>
  *
  * rewritten to
  *
  *   Filter (vx#N._4 = K [AND ...])
  *   +- Generate explode(...)
  *      +- Filter graft_contains_gate(x0..z1, payload)
  *         +- <chunk relation>
  *
  * Soundness: the upper filter keeps only rows with label = K; any
  * chunk producing such a row contains K and passes the gate, so the
  * rewrite never changes results (the gate only drops chunks whose
  * every decoded row the upper filter would discard). A null payload
  * (fill_missing) decodes to zeros, so the gate passes it iff K = 0.
  * The decode UDF's name carries the codec parameters (encoding, dtype
  * bytes, cseg block size) that the gate needs; for cseg the gate
  * reads only the palette blocks (Cseg.labels), for raw it scans
  * words without materializing voxel rows. Encodings with no cheap
  * membership probe (png/jpeg) are left untouched.
  */
object ContainsGateRule extends Rule[LogicalPlan] with PredicateHelper {

  val DecodePrefix = "graft_decode_voxels:"
  val GateName = "graft_contains_gate"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        gen @ Generate(Explode(u: ScalaUDF), _, _, _, genOut, gchild))
        if u.udfName.exists(_.startsWith(DecodePrefix)) &&
          !alreadyGated(gchild) =>
      labelSet(cond, genOut) match {
        case Some(ks) =>
          mkGate(u, ks)
            .map(g => f.copy(child = gen.copy(child = Filter(g, gchild))))
            .getOrElse(f)
        case None => f
      }
  }

  private def alreadyGated(p: LogicalPlan): Boolean = p match {
    case Filter(g: ScalaUDF, _) => g.udfName.contains(GateName)
    case _ => false
  }

  /** Extract the label set from a membership conjunct over this
    * Generate's output struct (ordinal 3 = label): `vx._4 = K`
    * (either literal order), `vx._4 IN (...)`, or its InSet form.
    */
  private def labelSet(cond: Expression,
      genOut: Seq[Attribute]): Option[Seq[Long]] = {
    val vx = genOut.headOption.map(_.exprId)
    def isLabel(e: Expression): Boolean = e match {
      case GetStructField(a: AttributeReference, 3, _) => vx.contains(a.exprId)
      case _ => false
    }
    splitConjunctivePredicates(cond).collectFirst {
      case EqualTo(g, Literal(k: Long, LongType)) if isLabel(g) => Seq(k)
      case EqualTo(Literal(k: Long, LongType), g) if isLabel(g) => Seq(k)
      case In(g, vs) if isLabel(g) &&
          vs.forall { case Literal(_: Long, LongType) => true; case _ => false } =>
        vs.map { case Literal(k: Long, LongType) => k }
      case InSet(g, hset) if isLabel(g) &&
          hset.forall(_.isInstanceOf[Long]) =>
        hset.toSeq.map(_.asInstanceOf[Long])
    }
  }

  /** Build the gate ScalaUDF over the SAME children as the decode UDF
    * (x0, y0, z0, x1, y1, z1, payload): pass iff the payload contains
    * ANY of the sought labels.
    */
  private def mkGate(u: ScalaUDF, ks: Seq[Long]): Option[Expression] = {
    val parts = u.udfName.get.stripPrefix(DecodePrefix).split(":")
    val enc = parts(0)
    val dtb = parts(1).toInt
    val bs = parts(2).split("_").map(_.toLong) match {
      case Array(a, b, c) => Vec3(a, b, c)
      case _ => return None
    }
    if (enc != "raw" && enc != "compressed_segmentation" && enc != "compresso")
      return None
    if (ks.isEmpty) return None
    // a missing (null-payload) chunk reads back as all-background —
    // the decode name's trailing field (absent on older names = 0)
    val bg = if (parts.length > 3) parts(3).toLong else 0L
    val karr = ks.toArray
    val fn = (x0: Long, y0: Long, z0: Long, x1: Long, y1: Long, z1: Long,
        p: Array[Byte]) =>
      if (p == null) karr.contains(bg)
      else if (enc == "compressed_segmentation") {
        val ls = Cseg.labels(p, Vec3(x1 - x0, y1 - y0, z1 - z0), bs, dtb)
        karr.exists(ls.contains)
      } else if (enc == "compresso")
        karr.exists(k => Compresso.contains(p, k))
      else karr.exists(k => Codec.rawContains(p, dtb, k))
    Some(ScalaUDF(fn, BooleanType, u.children, Nil, None, Some(GateName),
      false, true))
  }

  /** Idempotently install this rule on a session's experimental
    * optimizations (runs after the built-in optimizer batches, i.e.
    * after predicate pushdown has produced the matched shape).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(ContainsGateRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ContainsGateRule
}
