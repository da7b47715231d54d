package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native exact Jaccard similarity of two shingle-set arrays
  * (SURVEY.md §2.3 R18, §2.5). Two input forms, dispatched on type:
  *
  *   - `(array<string>, array<string>)` — distinct-element arrays
  *     (shingles / array_distinct output). One pass: hash-set the smaller
  *     side, count hits from the larger, derive intersection and union
  *     from the single count. Replaces the SQL `array_intersect` form
  *     that evaluated the intersection twice and materialized it both
  *     times.
  *   - `(array<bigint>, array<bigint>)` — SORTED hashed-shingle arrays
  *     (`array_sort(transform(shingles, s -> xxhash64(s)))`). A linear
  *     merge intersect with inline dedup: no per-pair HashSet, no string
  *     hashing, and the shuffled candidate arrays are ~3x smaller than
  *     their string twins — the verify path's whole cost at high
  *     candidate volume. Duplicates (two of a doc's shingles colliding
  *     into one hash) are deduped during the merge, so distinct counts
  *     stay set-correct; a CROSS-doc collision could only inflate the
  *     intersection, with probability ~(distinct shingles)²/2⁶⁴ — the
  *     string-exact DuckDB oracles would fail loudly on any actual
  *     collision in the test corpora.
  *
  * Both-empty returns 0.0, like the SQL form's `union = 0` guard.
  * doGenCode keeps both loops inside whole-stage codegen (the
  * CodegenFallback form paid a virtual call + boxing per candidate pair).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  private def sortedLongForm: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  // Analysis-time type check keeps the SQL-registered form safe: anything
  // but matching ARRAY<STRING> or ARRAY<BIGINT> inputs is an analysis
  // error, never a cast surprise.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaccard expects (array<string>, array<string>) or sorted " +
          s"(array<bigint>, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0.0 // empty side: intersection 0; 0/u or the 0-union guard
    if (sortedLongForm) {
      // merge intersect over sorted arrays with inline dedup
      var ia = 0; var ib = 0
      var da = 0; var db = 0; var inter = 0
      while (ia < na && ib < nb) {
        val va = a.getLong(ia); val vb = b.getLong(ib)
        if (va == vb) {
          inter += 1; da += 1; db += 1
          while (ia < na && a.getLong(ia) == va) ia += 1
          while (ib < nb && b.getLong(ib) == vb) ib += 1
        } else if (va < vb) {
          da += 1
          while (ia < na && a.getLong(ia) == va) ia += 1
        } else {
          db += 1
          while (ib < nb && b.getLong(ib) == vb) ib += 1
        }
      }
      while (ia < na) {
        val va = a.getLong(ia); da += 1
        while (ia < na && a.getLong(ia) == va) ia += 1
      }
      while (ib < nb) {
        val vb = b.getLong(ib); db += 1
        while (ib < nb && b.getLong(ib) == vb) ib += 1
      }
      java.lang.Double.valueOf(inter.toDouble / (da + db - inter))
    } else {
      val (small, big, ns, nbig) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
      val set = new java.util.HashSet[UTF8String](ns * 2)
      var i = 0
      while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
      var inter = 0
      i = 0
      while (i < nbig) {
        if (set.contains(big.getUTF8String(i))) inter += 1
        i += 1
      }
      java.lang.Double.valueOf(inter.toDouble / (na + nb - inter))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      if (sortedLongForm) {
        val ia = ctx.freshName("ia")
        val ib = ctx.freshName("ib")
        val da = ctx.freshName("da")
        val db = ctx.freshName("db")
        val inter = ctx.freshName("inter")
        val va = ctx.freshName("va")
        val vb = ctx.freshName("vb")
        s"""
           |final int $na = $a.numElements();
           |final int $nb = $b.numElements();
           |if ($na == 0 || $nb == 0) {
           |  ${ev.value} = 0.0;
           |} else {
           |  int $ia = 0, $ib = 0, $da = 0, $db = 0, $inter = 0;
           |  while ($ia < $na && $ib < $nb) {
           |    final long $va = $a.getLong($ia);
           |    final long $vb = $b.getLong($ib);
           |    if ($va == $vb) {
           |      $inter++; $da++; $db++;
           |      while ($ia < $na && $a.getLong($ia) == $va) { $ia++; }
           |      while ($ib < $nb && $b.getLong($ib) == $vb) { $ib++; }
           |    } else if ($va < $vb) {
           |      $da++;
           |      while ($ia < $na && $a.getLong($ia) == $va) { $ia++; }
           |    } else {
           |      $db++;
           |      while ($ib < $nb && $b.getLong($ib) == $vb) { $ib++; }
           |    }
           |  }
           |  while ($ia < $na) {
           |    final long $va = $a.getLong($ia); $da++;
           |    while ($ia < $na && $a.getLong($ia) == $va) { $ia++; }
           |  }
           |  while ($ib < $nb) {
           |    final long $vb = $b.getLong($ib); $db++;
           |    while ($ib < $nb && $b.getLong($ib) == $vb) { $ib++; }
           |  }
           |  ${ev.value} = (double) $inter / ($da + $db - $inter);
           |}
         """.stripMargin
      } else {
        val small = ctx.freshName("small")
        val big = ctx.freshName("big")
        val ns = ctx.freshName("ns")
        val nbig = ctx.freshName("nbig")
        val set = ctx.freshName("set")
        val inter = ctx.freshName("inter")
        val i = ctx.freshName("i")
        val arrayData = classOf[ArrayData].getName
        s"""
           |final int $na = $a.numElements();
           |final int $nb = $b.numElements();
           |if ($na == 0 || $nb == 0) {
           |  ${ev.value} = 0.0;
           |} else {
           |  final $arrayData $small = ($na <= $nb) ? $a : $b;
           |  final $arrayData $big = ($na <= $nb) ? $b : $a;
           |  final int $ns = $small.numElements();
           |  final int $nbig = $big.numElements();
           |  final java.util.HashSet $set = new java.util.HashSet($ns * 2);
           |  for (int $i = 0; $i < $ns; $i++) { $set.add($small.getUTF8String($i)); }
           |  int $inter = 0;
           |  for (int $i = 0; $i < $nbig; $i++) {
           |    if ($set.contains($big.getUTF8String($i))) { $inter++; }
           |  }
           |  ${ev.value} = (double) $inter / ($na + $nb - $inter);
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Native distinct-intersection count of two SORTED long arrays (the
  * hashed-shingle layout [[JaccardSim]]'s sorted form consumes) — for the
  * exact-τ-join verifiers (ppjoin) that need the raw intersection COUNT
  * to run integer threshold arithmetic (8i ≥ 3(na+nb)) rather than a
  * float similarity. Same linear merge with inline dedup; returns LONG.
  * Either side empty → 0.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_count expects sorted (array<bigint>, array<bigint>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var ia = 0; var ib = 0; var inter = 0L
    while (ia < na && ib < nb) {
      val va = a.getLong(ia); val vb = b.getLong(ib)
      if (va == vb) {
        inter += 1L
        while (ia < na && a.getLong(ia) == va) ia += 1
        while (ib < nb && b.getLong(ib) == vb) ib += 1
      } else if (va < vb) ia += 1
      else ib += 1
    }
    java.lang.Long.valueOf(inter)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val ia = ctx.freshName("ia")
      val ib = ctx.freshName("ib")
      val inter = ctx.freshName("inter")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |int $ia = 0, $ib = 0;
         |long $inter = 0L;
         |while ($ia < $na && $ib < $nb) {
         |  final long $va = $a.getLong($ia);
         |  final long $vb = $b.getLong($ib);
         |  if ($va == $vb) {
         |    $inter++;
         |    while ($ia < $na && $a.getLong($ia) == $va) { $ia++; }
         |    while ($ib < $nb && $b.getLong($ib) == $vb) { $ib++; }
         |  } else if ($va < $vb) { $ia++; } else { $ib++; }
         |}
         |${ev.value} = $inter;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCount =
    copy(left = l, right = r)
}
