package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Java-callable vector kernels (invoked from generated code). */
object VecMath {
  /** Cosine similarity of two float vectors, accumulated in double in
    * index order — the same element order and widening DuckDB's
    * `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])` uses, so results
    * are bit-comparable with the oracle.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }
}

/** Native Catalyst expression for cosine similarity over `array<float>`
  * embeddings. A codegen'd tight loop over the unsafe array data — no UDF
  * boxing, no per-row allocation — so brute-force scoring stays inside
  * whole-stage codegen on the 100-TB path.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<float>; callers are internal to graft, so type
  // enforcement stays with the call sites (AbstractDataType is private in
  // Spark 4, ruling out ExpectsInputTypes here).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VecMath.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Register graft's native expressions with a session's function registry
    * so plans can use them via `expr("cosine_sim(a, b)")`.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "shingle3_hashes", exprs => ShingleHashes(exprs(0), 3), "built-in")
    reg.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "char_jaccard", exprs => CharSetJaccard(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "codepoint_set", exprs => CodepointSet(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_jaccard", exprs => SortedSetJaccard(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "topk_by", exprs => TopKBy(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int]).toAggregateExpression(), "built-in")
  }

  /** Register a hyperplane sign-code function bound to a plane matrix. */
  def registerSignCode(spark: SparkSession, name: String,
      planes: Array[Array[Double]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => SignCode(exprs(0), planes), "built-in")
}
