package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd Catalyst expression.
  *
  * Entity canonicalization (the reference's merge-key model, e.g.
  * `/root/reference/graphio/bulk/nodeset.py` merge_keys) needs a
  * typo-tolerant name comparator for blocking-stage candidate pairs;
  * Spark ships `levenshtein` but not Jaro-Winkler, which is the standard
  * record-linkage scorer (prefix-weighted, length-normalized, O(n·m)
  * bounded by the match window rather than the full DP table).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity` (the gate
  * oracle), verified empirically:
  *   - operates on BYTES of the UTF-8 encoding (not codepoints);
  *   - either input empty → 0.0 (including both empty);
  *   - match window = max(len)/2 - 1 (floor, clamped at 0);
  *   - Winkler boost applied only when jaro > 0.7, prefix capped at 4,
  *     scaling factor 0.1.
  *
  * The kernel lives in a static method so interpreted eval and generated
  * code share one implementation (the pattern Spark's own string
  * expressions use via UTF8String helpers).
  */
object JaroWinkler {
  /** Static kernel, called from both nullSafeEval and generated code. */
  def similarity(l: UTF8String, r: UTF8String): Double = {
    val a = l.getBytes
    val b = r.getBytes
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a(i) == b(j)) {
          ma(i) = true; mb(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk the matched bytes of both sides in order,
    // count positions where they differ (halved in the jaro formula)
    var trans = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a(i) != b(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / la + m / lb + (m - trans / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler requires (string, string), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = JaroWinkler.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (l, r) => s"${ev.value} = $kernel.similarity($l, $r);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
