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
  *     stay set-correct over the HASH domain; the 64-bit trade cuts both
  *     ways (review r20): a CROSS-doc collision inflates the
  *     intersection by one, and a WITHIN-doc collision deflates it (one
  *     hash where the string sets had two distinct members) — either
  *     direction with probability ~(distinct shingles)²/2⁶⁴ — and the
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

  // may yield null on null ELEMENTS even when both array columns are
  // themselves non-null — nullable must say so or codegen mis-assumes
  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElements

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

  // plan-time nullability: when the input schema promises no null
  // elements (Shingles output, containsNull=false) the per-element null
  // scan is elided entirely — the hot verify paths pay nothing for it
  private lazy val mayHaveNullElements: Boolean =
    ArrayNulls.mayHaveNullElements(left.dataType, right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0.0 // empty side: intersection 0; 0/u or the 0-union guard
    // a null ELEMENT nulls the result (the DotProduct fail-safe rule):
    // the sorted merge would read it as 0 — a phantom shared element
    // between any two null-carrying arrays — and the string form would
    // match null against null as a value (code-review r17)
    if (mayHaveNullElements && ArrayNulls.anyNullElement(a, b)) return null
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
      // set semantics on BOTH sides (code-review r17): the one-set form
      // deduped only the hashed side while the denominator used raw
      // sizes, so non-distinct input (a caller skipping array_distinct)
      // got a silently deflated similarity — and disagreed with the
      // sorted-long form's inline dedup on the same data. Distinct
      // inputs (every production path: Shingles dedups) are unchanged.
      val sa = new java.util.HashSet[UTF8String](na * 2)
      var i = 0
      while (i < na) { sa.add(a.getUTF8String(i)); i += 1 }
      val sb = new java.util.HashSet[UTF8String](nb * 2)
      i = 0
      while (i < nb) { sb.add(b.getUTF8String(i)); i += 1 }
      val (small, big) = if (sa.size <= sb.size) (sa, sb) else (sb, sa)
      var inter = 0
      val it = small.iterator()
      while (it.hasNext) { if (big.contains(it.next())) inter += 1 }
      java.lang.Double.valueOf(inter.toDouble / (sa.size + sb.size - inter))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val hasNull = ctx.freshName("hasNull")
      val ni = ctx.freshName("ni")
      // emitted only when the schema admits null elements — see
      // mayHaveNullElements (hot paths carry containsNull=false)
      def nullScan(cont: String): String =
        if (!mayHaveNullElements) cont
        else
          s"""
             |boolean $hasNull = false;
             |for (int $ni = 0; $ni < $na && !$hasNull; $ni++) { $hasNull = $a.isNullAt($ni); }
             |for (int $ni = 0; $ni < $nb && !$hasNull; $ni++) { $hasNull = $b.isNullAt($ni); }
             |if ($hasNull) {
             |  ${ev.isNull} = true;
             |} else {
             |$cont
             |}
           """.stripMargin
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
           |${nullScan(s"""
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
           |  ${ev.value} = (double) $inter / ($da + $db - $inter);""")}
           |}
         """.stripMargin
      } else {
        val sa = ctx.freshName("sa")
        val sb = ctx.freshName("sb")
        val smallS = ctx.freshName("smallS")
        val bigS = ctx.freshName("bigS")
        val inter = ctx.freshName("inter")
        val i = ctx.freshName("i")
        val it = ctx.freshName("it")
        s"""
           |final int $na = $a.numElements();
           |final int $nb = $b.numElements();
           |if ($na == 0 || $nb == 0) {
           |  ${ev.value} = 0.0;
           |} else {
           |${nullScan(s"""
           |  final java.util.HashSet $sa = new java.util.HashSet($na * 2);
           |  for (int $i = 0; $i < $na; $i++) { $sa.add($a.getUTF8String($i)); }
           |  final java.util.HashSet $sb = new java.util.HashSet($nb * 2);
           |  for (int $i = 0; $i < $nb; $i++) { $sb.add($b.getUTF8String($i)); }
           |  final java.util.HashSet $smallS = ($sa.size() <= $sb.size()) ? $sa : $sb;
           |  final java.util.HashSet $bigS = ($sa.size() <= $sb.size()) ? $sb : $sa;
           |  int $inter = 0;
           |  for (java.util.Iterator $it = $smallS.iterator(); $it.hasNext(); ) {
           |    if ($bigS.contains($it.next())) { $inter++; }
           |  }
           |  ${ev.value} = (double) $inter / ($sa.size() + $sb.size() - $inter);""")}
           |}
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** Shared null-element plumbing for the pairwise array expressions
  * (code-review r17): a null element must null the RESULT — the merge
  * loops would read it as 0 (a phantom shared element) — but the scan is
  * elided at plan time when the schema promises containsNull=false.
  */
private[plans] object ArrayNulls {
  def mayHaveNullElements(l: DataType, r: DataType): Boolean = (l, r) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  def anyNullElement(a: ArrayData, b: ArrayData): Boolean = {
    var i = 0
    val na = a.numElements()
    while (i < na) { if (a.isNullAt(i)) return true; i += 1 }
    i = 0
    val nb = b.numElements()
    while (i < nb) { if (b.isNullAt(i)) return true; i += 1 }
    false
  }
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

  // may yield null on null ELEMENTS (see JaccardSim.nullable)
  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElements

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_count expects sorted (array<bigint>, array<bigint>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  private lazy val mayHaveNullElements: Boolean =
    ArrayNulls.mayHaveNullElements(left.dataType, right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // null element ⇒ null count (see ArrayNulls) — elided on
    // containsNull=false schemas
    if (mayHaveNullElements && ArrayNulls.anyNullElement(a, b)) return null
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
      val hasNull = ctx.freshName("hasNull")
      val ni = ctx.freshName("ni")
      val body =
        s"""
           |  int $ia = 0, $ib = 0;
           |  long $inter = 0L;
           |  while ($ia < $na && $ib < $nb) {
           |    final long $va = $a.getLong($ia);
           |    final long $vb = $b.getLong($ib);
           |    if ($va == $vb) {
           |      $inter++;
           |      while ($ia < $na && $a.getLong($ia) == $va) { $ia++; }
           |      while ($ib < $nb && $b.getLong($ib) == $vb) { $ib++; }
           |    } else if ($va < $vb) { $ia++; } else { $ib++; }
           |  }
           |  ${ev.value} = $inter;""".stripMargin
      val guarded =
        if (!mayHaveNullElements) body
        else
          s"""
             |boolean $hasNull = false;
             |for (int $ni = 0; $ni < $na && !$hasNull; $ni++) { $hasNull = $a.isNullAt($ni); }
             |for (int $ni = 0; $ni < $nb && !$hasNull; $ni++) { $hasNull = $b.isNullAt($ni); }
             |if ($hasNull) {
             |  ${ev.isNull} = true;
             |} else {
             |$body
             |}
           """.stripMargin
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |$guarded
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCount =
    copy(left = l, right = r)
}
