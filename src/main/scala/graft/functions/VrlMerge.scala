package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types._

/** VRL `merge(to, from[, deep: true])` over OBJECT values (vrl stdlib
  * merge; the reference executes it via the embedded VRL runtime's
  * Value::Object arms, processor/vrl.rs:152-420). An event object may
  * reach the column program as either representation:
  *
  *   - a MAP column (objects decoded off the wire with uniform value
  *     types) — merged by the [[VrlMapMerge]] kernel, last-wins on key
  *     collision (`from` overwrites, like VRL), left's key order kept;
  *   - a STRUCT column (parse_* results, object literals) — merged as a
  *     pure CreateNamedStruct/GetStructField COMPOSITION, so the output
  *     schema is the field union (left's order, right's new fields
  *     appended) and everything stays in whole-stage codegen;
  *   - mixed map/struct — the struct side converts to a map of the
  *     other side's value type (field values cast), then map-merges.
  *
  * `deep: true` recurses into SHARED fields when both sides hold a
  * struct (VRL's deep merge); shallow otherwise. Non-object operands
  * fail analysis loudly — VRL's merge is fallible on non-objects.
  */
case class VrlMerge(left: Expression, right: Expression, deep: Boolean)
    extends Expression with RuntimeReplaceable {
  override lazy val replacement: Expression = VrlMerge.merged(left, right, deep)
  override def children: Seq[Expression] = Seq(left, right)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object VrlMerge {
  def merged(l: Expression, r: Expression, deep: Boolean): Expression =
    (l.dataType, r.dataType) match {
      case (ls: StructType, rs: StructType) => mergeStructs(l, ls, r, rs, deep)
      case (lm: MapType, rm: MapType) =>
        require(lm.keyType == rm.keyType && lm.valueType == rm.valueType,
          s"merge: map operands must share a type, got ${lm.simpleString} " +
            s"vs ${rm.simpleString}")
        VrlMapMerge(l, r)
      case (ls: StructType, rm: MapType) =>
        VrlMapMerge(structAsMap(l, ls, rm), r)
      case (lm: MapType, rs: StructType) =>
        VrlMapMerge(l, structAsMap(r, rs, lm))
      case (lt, rt) => throw new IllegalArgumentException(
        s"merge: both operands must be objects (map or struct columns), " +
          s"got ${lt.simpleString} and ${rt.simpleString}")
    }

  /** Field union: left's fields in order (value from the right where the
    * name collides — `from` wins), then right-only fields in right's
    * order. A collision where BOTH sides hold a struct recurses under
    * `deep`; same-typed collisions keep the left value when the right
    * OBJECT itself is null (an absent `from` merges nothing), and a
    * type-changing collision takes the right side outright. */
  private def mergeStructs(l: Expression, ls: StructType, r: Expression,
      rs: StructType, deep: Boolean): Expression = {
    def lf(i: Int) = GetStructField(l, i, Some(ls(i).name))
    def rf(j: Int) = GetStructField(r, j, Some(rs(j).name))
    val lNames = ls.fieldNames.toSet
    val rIndex = rs.fieldNames.zipWithIndex.toMap
    val entries = ls.fields.zipWithIndex.map { case (f, i) =>
      rIndex.get(f.name) match {
        case None => f.name -> (lf(i): Expression)
        case Some(j) =>
          val v = (f.dataType, rs(j).dataType) match {
            case (_: StructType, _: StructType) if deep =>
              merged(lf(i), rf(j), deep = true)
            case (lt, rt) if lt == rt => If(IsNull(r), lf(i), rf(j))
            case _ => rf(j)
          }
          f.name -> v
      }
    } ++ rs.fields.zipWithIndex.collect {
      case (f, j) if !lNames.contains(f.name) => f.name -> (rf(j): Expression)
    }
    CreateNamedStruct(entries.toSeq.flatMap { case (n, e) => Seq(Literal(n), e) })
  }

  /** Struct side of a mixed merge → a map in the other side's type:
    * string keys, field values cast to the map's value type (an
    * uncastable field fails analysis — loud, like the rest). */
  private def structAsMap(e: Expression, st: StructType, to: MapType): Expression = {
    require(to.keyType == StringType,
      s"merge: mixing a struct with a ${to.simpleString} needs string keys")
    CreateMap(st.fields.zipWithIndex.toSeq.flatMap { case (f, i) =>
      Seq(Literal(f.name),
        Cast(GetStructField(e, i, Some(f.name)), to.valueType))
    })
  }
}

/** Last-wins map merge — `map_concat` under the default
  * `spark.sql.mapKeyDedupPolicy=EXCEPTION` THROWS on a shared key, which
  * is the common VRL merge case, so this is a kernel, not an alias.
  * Right's value wins on collision; the key keeps the LEFT operand's
  * position (insertion-ordered overwrite), new right keys append.
  * Codegen'd via a static kernel call like [[VrlParseKeyValue]]. */
case class VrlMapMerge(left: Expression, right: Expression)
    extends BinaryExpression {
  // union nullability: either side's null-bearing values can land in
  // the result, so a false-containsNull left must not mask them
  override def dataType: DataType = (left.dataType, right.dataType) match {
    case (l: MapType, r: MapType) =>
      l.copy(valueContainsNull = l.valueContainsNull || r.valueContainsNull)
    case _ => left.dataType
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (l: MapType, r: MapType) if l.keyType == r.keyType &&
          l.valueType == r.valueType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"merge expects two maps of one type, got ${l.simpleString} " +
            s"and ${r.simpleString}")
    }

  private def mapType = left.dataType.asInstanceOf[MapType]

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VrlMapMerge.merge(l.asInstanceOf[MapData], r.asInstanceOf[MapData],
      mapType.keyType, mapType.valueType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kt = ctx.addReferenceObj("kt", mapType.keyType,
      "org.apache.spark.sql.types.DataType")
    val vt = ctx.addReferenceObj("vt", mapType.valueType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.VrlMapMerge.merge($l, $r, $kt, $vt);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VrlMapMerge = copy(left = newLeft, right = newRight)
}

object VrlMapMerge {
  def merge(l: MapData, r: MapData, kt: DataType, vt: DataType): MapData = {
    val m = new java.util.LinkedHashMap[Any, Any](l.numElements() + r.numElements())
    def put(d: MapData): Unit = {
      val ks = d.keyArray.toObjectArray(kt)
      val vs = d.valueArray.toObjectArray(vt)
      var i = 0
      while (i < ks.length) { m.put(ks(i), vs(i)); i += 1 }
    }
    put(l); put(r)
    val keys = new Array[Any](m.size)
    val values = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next(); keys(i) = e.getKey; values(i) = e.getValue; i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }
}
