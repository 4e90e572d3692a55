package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

object LshKernels {

  val Dim = 64

  /** SplitMix64 finalizer — the ONE deterministic scramble behind every
    * derived constant (LSH planes, minhash coefficients). Keep single:
    * all uses must stay bit-identical across engines and rounds.
    */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def planes(numPlanes: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, Dim)((j, k) =>
      (mix(j.toLong * Dim + k) >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0)

  /** Hyperplane sign code: bit j set iff dot(planes[j], vec) > 0. Each dot
    * is a sequential ascending-index fold in double — the same order and
    * widening as DuckDB's `list_dot_product(vec::DOUBLE[], [plane])`, so
    * bucket assignments are bit-identical to the SQL oracle's.
    */
  def signCode(vec: ArrayData, planes: Array[Array[Double]]): Int = {
    var code = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      // a ragged embedding is data corruption: fail loudly (as the SQL
      // oracle would) instead of bucketing on a silent prefix
      if (vec.numElements() != p.length)
        throw new IllegalArgumentException(
          s"sign_code: embedding dim ${vec.numElements()} != plane dim ${p.length}")
      val n = p.length
      var dot = 0.0
      var i = 0
      while (i < n) { dot += vec.getFloat(i).toDouble * p(i); i += 1 }
      if (dot > 0) code |= 1 << j
      j += 1
    }
    code
  }

  /** Jaccard similarity of the DISTINCT code-point sets of two strings —
    * matches `len(list_intersect(a,b)) / len(list_distinct(a||b))` over
    * DuckDB's `string_split_regex(text,'')` (and Spark's `split(text,'')`),
    * both of which split into unicode code points.
    */
  def charJaccard(a: UTF8String, b: UTF8String): Double =
    // single implementation: the registered char_jaccard SQL function and
    // the codepoint_set + sorted_jaccard operator path must stay
    // bit-consistent (the d04 oracle depends on it)
    sortedJaccard(codepointSet(a), codepointSet(b))

  /** Distinct code points of a string, ascending, as longs — the per-doc
    * precompute for pairwise set Jaccard (compute once per document, not
    * once per candidate pair).
    */
  def codepointSet(s: UTF8String): ArrayData = {
    val set = new java.util.TreeSet[Integer]()
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      set.add(cp)
      i += Character.charCount(cp)
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().toLong; k += 1 }
    ArrayData.toArrayData(out)
  }

  /** Jaccard of two SORTED-distinct long arrays via a single merge scan —
    * O(|a|+|b|), zero allocation per pair (vs hash-set building, which
    * dominates blocked near-dup joins at millions of candidate pairs).
    */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return Double.NaN // 0/0, as in SQL
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}

/** Codegen'd hyperplane sign code over an `array<float>` embedding; the
  * plane matrix rides along as a referenced object in generated code.
  */
case class SignCode(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sign_code"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.floatArrays(prettyName, child)

  override def nullSafeEval(input: Any): Any =
    LshKernels.signCode(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LshKernels.signCode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignCode =
    copy(child = newChild)
}

/** Codegen'd sorted-distinct code points of a string (array<long>). */
case class CodepointSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false)
  override def prettyName: String = "codepoint_set"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.strings(prettyName, child)

  override def nullSafeEval(input: Any): Any =
    LshKernels.codepointSet(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.LshKernels.codepointSet($c)")

  override protected def withNewChildInternal(newChild: Expression): CodepointSet =
    copy(child = newChild)
}

/** Codegen'd merge-scan Jaccard over two sorted-distinct long arrays. */
case class SortedSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sorted_jaccard"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any =
    LshKernels.sortedJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.LshKernels.sortedJaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedSetJaccard =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd distinct-code-point Jaccard between two strings. */
case class CharSetJaccard(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_jaccard"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.strings(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any =
    LshKernels.charJaccard(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.LshKernels.charJaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharSetJaccard =
    copy(left = newLeft, right = newRight)
}
