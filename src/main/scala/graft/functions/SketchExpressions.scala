package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sketch.SeenFilter

/**
 * Static probe helper the generated code calls (top-level object ⇒ Scala
 * emits static forwarders ⇒ plain Java static call in codegen). Hashing is
 * bit-identical to `xxhash64(col)` / `pmod(xxhash64(col), p)` — the same
 * KeyHash contract the sketch build side uses (SURVEY §7.5.4).
 */
object SketchProbe {
  def probe(b: Broadcast[Map[Int, SeenFilter]], u: UTF8String, p: Int): Boolean = {
    val sketches = b.value
    if (sketches.isEmpty) true // no sketch state yet: everything must be verified
    else {
      val key = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, graft.sketch.KeyHash.SparkSeed)
      val pid = java.lang.Math.floorMod(key, p.toLong).toInt
      sketches.get(pid) match {
        case Some(f) => f.mightContain(key)
        case None => true // absent partition sketch ⇒ cannot rule the key out
      }
    }
  }
}

/**
 * `sketch_might_contain(canon_url)` as a NATIVE codegen'd expression
 * (SURVEY op 24's stated plan): the URL-seen negative test runs inside
 * whole-stage codegen — no UDF serialization boundary per discovered link,
 * and filters above/below it keep their pushdown freedom. The broadcast
 * handle rides the expression via `ctx.addReferenceObj`, so executors read
 * their local broadcast block exactly like the UDF closure did.
 */
case class SketchMightContain(
    child: Expression,
    sketches: Broadcast[Map[Int, SeenFilter]],
    numPartitions: Int) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sketch_might_contain"

  override def nullSafeEval(v: Any): Any =
    SketchProbe.probe(sketches, v.asInstanceOf[UTF8String], numPartitions)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // declared type must be the PUBLIC Broadcast class — the runtime class
    // (TorrentBroadcast) is private[spark] and would not compile in codegen
    val bRef = ctx.addReferenceObj("seenSketches", sketches,
      classOf[Broadcast[Map[Int, SeenFilter]]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SketchProbe.probe($bRef, $c, $numPartitions)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExpressions {
  def sketch_might_contain(
      c: Column,
      sketches: Broadcast[Map[Int, SeenFilter]],
      numPartitions: Int): Column =
    GraftBridge.column(SketchMightContain(GraftBridge.expression(c), sketches, numPartitions))
}
