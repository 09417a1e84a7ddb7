package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
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
  * `deep: true` recurses into SHARED fields when both sides hold an
  * object — struct/struct (schema-level recursion), map/map (the kernel
  * recurses into colliding values that are themselves maps or structs),
  * and MIXED struct/map inner fields (struct side converts, then
  * map-merges); shallow otherwise. Non-object operands fail analysis
  * loudly — VRL's merge is fallible on non-objects.
  *
  * Documented divergence (shared with the VRL divergence list in
  * Processors.scala): a null `from` OPERAND no-ops (keeps `to`) instead
  * of erroring the way Vector's fallible `merge!` would on a non-object
  * — the engine's columnar nulls model "absent", and an absent `from`
  * merges nothing.
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
        VrlMapMerge(l, r, deep)
      case (ls: StructType, rm: MapType) =>
        VrlMapMerge(structAsMap(l, ls, rm), r, deep)
      case (lm: MapType, rs: StructType) =>
        VrlMapMerge(l, structAsMap(r, rs, lm), deep)
      case (lt, rt) => throw new IllegalArgumentException(
        s"merge: both operands must be objects (map or struct columns), " +
          s"got ${lt.simpleString} and ${rt.simpleString}")
    }

  /** Field union: left's fields in order (value from the right where the
    * name collides — `from` wins), then right-only fields in right's
    * order. A collision where BOTH sides hold an object recurses under
    * `deep` (struct/struct at the schema level, map/map and mixed via
    * the kernel — a null field on either side falls back to the shallow
    * from-wins rule, there is nothing to recurse into); same-typed
    * collisions keep the left value when the right OBJECT itself is null
    * (an absent `from` merges nothing), and a type-changing collision
    * takes the right side outright. */
  private def mergeStructs(l: Expression, ls: StructType, r: Expression,
      rs: StructType, deep: Boolean): Expression = {
    def lf(i: Int) = GetStructField(l, i, Some(ls(i).name))
    def rf(j: Int) = GetStructField(r, j, Some(rs(j).name))
    val lNames = ls.fieldNames.toSet
    val rIndex = rs.fieldNames.zipWithIndex.toMap
    // deep recursion needs BOTH inner objects present: either side null
    // → from-wins like the shallow arm (right's value, even when null —
    // the from object carries the key)
    def deepInner(lv: Expression, rv: Expression, rec: => Expression) =
      If(IsNull(r), lv, If(Or(IsNull(lv), IsNull(rv)), rv, rec))
    val entries = ls.fields.zipWithIndex.map { case (f, i) =>
      rIndex.get(f.name) match {
        case None => f.name -> (lf(i): Expression)
        case Some(j) =>
          val v = (f.dataType, rs(j).dataType) match {
            case (_: StructType, _: StructType) if deep =>
              merged(lf(i), rf(j), deep = true)
            case (lm: MapType, rm: MapType) if deep &&
                lm.keyType == rm.keyType && lm.valueType == rm.valueType =>
              deepInner(lf(i), rf(j), VrlMapMerge(lf(i), rf(j), deep = true))
            // MIXED object representations on a shared inner field under
            // deep: the struct side converts to the map side's type, then
            // map-merges (from wins) — same rule as top-level mixed. The
            // output field is the MAP type, so every branch converts.
            case (lm: MapType, rs2: StructType) if deep =>
              val lv = lf(i); val rv = rf(j)
              If(IsNull(r), lv,
                If(IsNull(rv), Literal.create(null, lm),
                  If(IsNull(lv), convOrNull(rv, rs2, lm),
                    VrlMapMerge(lv, structAsMap(rv, rs2, lm), deep = true))))
            case (ls2: StructType, rm: MapType) if deep =>
              val lv = lf(i); val rv = rf(j)
              If(IsNull(r), convOrNull(lv, ls2, rm),
                If(IsNull(rv), Literal.create(null, rm),
                  If(IsNull(lv), rv,
                    VrlMapMerge(structAsMap(lv, ls2, rm), rv, deep = true))))
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
  /** [[structAsMap]] guarded for a nullable struct: CreateMap over a
    * null struct's fields would yield a map of nulls, not null. */
  private def convOrNull(e: Expression, st: StructType, to: MapType): Expression =
    If(IsNull(e), Literal.create(null, to), structAsMap(e, st, to))

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
  * Under `deep`, a collision where BOTH values are themselves objects
  * (maps, or structs — the map's uniform value type decides which)
  * recurses instead of replacing — VRL's recursive object merge; a null
  * on either side of a collision falls back to last-wins (nothing to
  * recurse into). Codegen'd via a static kernel call like
  * [[VrlParseKeyValue]]. */
case class VrlMapMerge(left: Expression, right: Expression, deep: Boolean)
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
      mapType.keyType, mapType.valueType, deep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kt = ctx.addReferenceObj("kt", mapType.keyType,
      "org.apache.spark.sql.types.DataType")
    val vt = ctx.addReferenceObj("vt", mapType.valueType,
      "org.apache.spark.sql.types.DataType")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.VrlMapMerge.merge($l, $r, $kt, $vt, $deep);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VrlMapMerge = copy(left = newLeft, right = newRight)
}

object VrlMapMerge {
  def merge(l: MapData, r: MapData, kt: DataType, vt: DataType,
      deep: Boolean): MapData = {
    val m = new java.util.LinkedHashMap[Any, Any](l.numElements() + r.numElements())
    val lks = l.keyArray().toObjectArray(kt)
    val lvs = l.valueArray().toObjectArray(vt)
    var i = 0
    while (i < lks.length) { m.put(lks(i), lvs(i)); i += 1 }
    val rks = r.keyArray().toObjectArray(kt)
    val rvs = r.valueArray().toObjectArray(vt)
    i = 0
    while (i < rks.length) {
      val k = rks(i)
      val nv =
        if (deep && rvs(i) != null) (m.get(k), vt) match {
          case (old: MapData, mt: MapType) =>
            merge(old, rvs(i).asInstanceOf[MapData],
              mt.keyType, mt.valueType, deep = true)
          case (old: InternalRow, st: StructType) =>
            mergeRows(old, rvs(i).asInstanceOf[InternalRow], st)
          case _ => rvs(i)
        }
        else rvs(i)
      m.put(k, nv)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val values = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next(); keys(i) = e.getKey; values(i) = e.getValue; i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }

  /** Deep merge of two SAME-SCHEMA rows (a map's struct values share the
    * map's value type): every field is present on both sides, so `from`
    * wins per field except where both sides hold a non-null object —
    * then recurse, mirroring VRL's per-key rule. */
  private def mergeRows(l: InternalRow, r: InternalRow, st: StructType): InternalRow = {
    val out = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      out(i) = st(i).dataType match {
        case mt: MapType if !l.isNullAt(i) && !r.isNullAt(i) =>
          merge(l.getMap(i), r.getMap(i), mt.keyType, mt.valueType, deep = true)
        case ist: StructType if !l.isNullAt(i) && !r.isNullAt(i) =>
          mergeRows(l.getStruct(i, ist.size), r.getStruct(i, ist.size), ist)
        case dt => if (r.isNullAt(i)) null else r.get(i, dt)
      }
      i += 1
    }
    new GenericInternalRow(out)
  }
}
