package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native probe into a Count-Min sketch built by Spark's `count_min_sketch`
  * aggregate (SURVEY.md §2.3 R9/R20): Spark ships the BUILD side of CMS but
  * no SQL surface to QUERY the resulting binary — without this, reading an
  * estimate means collecting the sketch to the driver, exactly the
  * anti-pattern the sketch exists to avoid. `graft_cms_est(sketch, item)`
  * returns the sketch's count estimate for a string item, matching the
  * aggregate's update path byte-for-byte (CountMinSketchAgg adds the
  * UTF8String's bytes, so the probe estimates over the same binary key).
  *
  * CodegenFallback is deliberate: the probe runs AFTER a top-k or filter
  * has cut the stream to a handful of rows (the sketch is a broadcast
  * scalar), so per-row deserialization is the simple correct choice —
  * unlike the five hot-path natives (JaccardSim etc.), nothing here sits
  * inside a per-candidate loop. CMS guarantees: estimate ≥ true count
  * always; estimate ≤ true + eps·N with the sketch's confidence.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_est"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_est expects (binary, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val cms = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]]))
    java.lang.Long.valueOf(
      cms.estimateCount(item.asInstanceOf[UTF8String].getBytes))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}
