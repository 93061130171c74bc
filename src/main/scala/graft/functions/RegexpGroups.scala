package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All capture groups of every non-overlapping match, in ONE regex
  * execution per row: `graft_regexp_groups(text, pattern)` returns
  * `array<struct<g1, …, gN>>` where N is the pattern's group count.
  *
  * The built-in route to the same result is a two-pass chain —
  * `regexp_extract_all(text, R, 0)` to find the match spans, then a
  * per-match `regexp_replace(m, R, "$1$2...")` + `split` to break
  * out the groups — which executes the pattern twice per match and
  * materializes two intermediate strings. In this engine's extraction
  * stage (the per-row CPU stage that dominates at 10^12-turn scale,
  * see kg.Extract) that doubling is the hot path, so this is the
  * sanctioned native-Expression escalation: same Java regex engine, same
  * non-overlapping `Matcher.find` semantics, half the executions.
  *
  * Non-participating optional groups yield "" (empty string), matching
  * what the `regexp_replace` group substitution produced — so results are
  * bit-identical to the retired two-pass form (asserted in
  * RegexpGroupsSpec).
  */
case class RegexpGroups(child: Expression, pattern: String) extends UnaryExpression {

  @transient private lazy val compiled: Pattern = Pattern.compile(pattern)

  // one Cursor (reused Matcher + zero-copy CharSequence) per task thread;
  // ThreadLocal because a deserialized plan fragment can be shared by
  // concurrent tasks in local mode (transient: rebuilt after serialization)
  @transient private lazy val cursors: ThreadLocal[RegexpGroups.Cursor] =
    ThreadLocal.withInitial(() => new RegexpGroups.Cursor(compiled))

  /** Codegen entry: the per-thread cursor (the expression itself is the
    * serializable reference object; the ThreadLocal is not serializable).
    */
  def cursor(): RegexpGroups.Cursor = cursors.get()

  private val numGroups: Int = Pattern.compile(pattern).matcher("").groupCount()
  require(numGroups >= 1, s"pattern has no capture groups: $pattern")

  override def dataType: DataType = ArrayType(
    StructType((1 to numGroups).map(i =>
      StructField(s"g$i", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_regexp_groups"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_regexp_groups requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RegexpGroups.extract(cursors.get(), numGroups, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the per-thread Cursor holder from the generated class (the
    // Matcher + CharSequence view are allocated once per task thread, not
    // per row); the match loop lives in the static helper so the generated
    // method stays under JIT size limits
    val self = ctx.addReferenceObj("graftRegexpGroups", this, classOf[RegexpGroups].getName)
    val helper = RegexpGroups.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = $helper.extract($self.cursor(), $numGroups, $input);")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexpGroups =
    copy(child = newChild)
}

object RegexpGroups {

  private val Empty = UTF8String.fromString("")

  /** Zero-copy CharSequence view over an all-ASCII UTF8String: lets the
    * regex engine read the Spark-managed bytes directly, so the hot path
    * allocates no String and copies no characters. (For ASCII, byte
    * offsets == char offsets, so match positions map straight back to
    * `UTF8String.substring`.) Reused across rows via [[Cursor]].
    */
  private final class AsciiSeq extends CharSequence {
    var s: UTF8String = _
    var len: Int = 0
    def reset(next: UTF8String): Unit = { s = next; len = next.numBytes() }
    override def length(): Int = len
    override def charAt(i: Int): Char = (s.getByte(i) & 0x7F).toChar
    override def subSequence(a: Int, b: Int): CharSequence =
      s.substring(a, b).toString // cold path: only hit by regex error text
    override def toString: String = s.toString
  }

  /** Per-task mutable state: ONE Matcher + ONE CharSequence view reused for
    * every row (Matcher.reset re-targets it without reallocating its
    * internal group arrays). A Cursor is owned by a single task thread —
    * the Expression hands each task its own via a ThreadLocal.
    */
  final class Cursor(p: Pattern) {
    private val ascii = new AsciiSeq
    private val asciiMatcher = p.matcher(ascii)

    def matcherFor(s: UTF8String): (java.util.regex.Matcher, Boolean) = {
      val bytes = s.numBytes()
      // all-ASCII iff byte count == code-point count (no high bit set);
      // numChars counts UTF-8 sequence starts, so equality is exactly that
      if (s.numChars() == bytes) {
        ascii.reset(s)
        asciiMatcher.reset(ascii)
        (asciiMatcher, true)
      } else (p.matcher(s.toString), false) // non-ASCII fallback: correctness first
    }
  }

  /** Shared by interpreted eval and codegen. `ascii` tells us whether the
    * matcher's offsets are byte offsets into `s` (zero-copy group slicing)
    * or char offsets into a decoded String.
    */
  def extract(cursor: Cursor, numGroups: Int, s: UTF8String): ArrayData = {
    val (m, ascii) = cursor.matcherFor(s)
    var rows: scala.collection.mutable.ArrayBuffer[Any] = null
    while (m.find()) {
      val fields = new Array[Any](numGroups)
      var g = 0
      while (g < numGroups) {
        val start = m.start(g + 1)
        fields(g) =
          if (start < 0) Empty // non-participating optional group
          else if (ascii) s.substring(start, m.end(g + 1))
          else UTF8String.fromString(m.group(g + 1))
        g += 1
      }
      if (rows == null) rows = new scala.collection.mutable.ArrayBuffer[Any](2)
      rows += new GenericInternalRow(fields)
    }
    if (rows == null) EmptyArray else new GenericArrayData(rows.toArray)
  }

  private val EmptyArray = new GenericArrayData(Array.empty[Any])
}
