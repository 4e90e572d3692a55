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
    val n = checkedDim(a, b)
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
    // 0/0 is NaN, matching DuckDB's list_cosine_similarity on a zero vector
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkedDim(a, b)
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Ragged vectors are data corruption — fail loudly, as the SQL oracle
    * does, instead of scoring a silent common prefix.
    */
  private def checkedDim(a: ArrayData, b: ArrayData): Int = {
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"cosine_sim: vector dims differ: ${a.numElements()} vs ${b.numElements()}")
    a.numElements()
  }
}

/** Native Catalyst expression for cosine similarity over `array<float>`
  * embeddings. A codegen'd tight loop over the unsafe array data — no UDF
  * boxing, no per-row allocation — so brute-force scoring stays inside
  * whole-stage codegen on the 100-TB path.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // Inputs must be array<float>: ArrayData.getFloat on any other element
  // width would read garbage bytes silently, so reject at analysis time.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    GraftTypeChecks.floatArrays(prettyName, left, right)

  override def nullSafeEval(a: Any, b: Any): Any =
    VecMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VecMath.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Analysis-time input checks shared by graft's native expressions
  * (`ExpectsInputTypes` is unusable here — `AbstractDataType` is
  * `private[sql]` in Spark 4 — so expressions override
  * `checkInputDataTypes` directly).
  */
object GraftTypeChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types._

  private def check(name: String, ok: Boolean, exprs: Seq[Expression]): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name: unexpected input types ${exprs.map(_.dataType.simpleString).mkString(", ")}")

  def floatArrays(name: String, exprs: Expression*): TypeCheckResult =
    check(name, exprs.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }), exprs)

  def longArrays(name: String, exprs: Expression*): TypeCheckResult =
    check(name, exprs.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }), exprs)

  def strings(name: String, exprs: Expression*): TypeCheckResult =
    check(name, exprs.forall(_.dataType == StringType), exprs)
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
      "md5_shingle3_hashes", exprs => Md5ShingleHashes(exprs(0), 3), "built-in")
    reg.createOrReplaceTempFunction(
      "md5_shingle8_hashes", exprs => Md5ShingleHashes(exprs(0), 8), "built-in")
    reg.createOrReplaceTempFunction(
      "md5_span8_hashes", exprs => Md5SpanHashes(exprs(0), 8), "built-in")
    reg.createOrReplaceTempFunction(
      "md5_span3_hashes", exprs => Md5SpanHashes(exprs(0), 3), "built-in")
    reg.createOrReplaceTempFunction(
      "winnow4_positions", exprs => WinnowPositions(exprs(0), 4), "built-in")
    reg.createOrReplaceTempFunction(
      "poly_hash", exprs => PolyHash(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash60_md5", exprs => SimHash60Md5(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "char_jaccard", exprs => CharSetJaccard(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "codepoint_set", exprs => CodepointSet(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_jaccard", exprs => SortedSetJaccard(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "lsh_band_keys", exprs => LshBandKeys(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "topk_by", exprs => TopKBy(exprs(0), exprs(1),
        exprs(2).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"topk_by: k must be an integer literal, got $other")
        }).toAggregateExpression(), "built-in")
  }

  /** Register a sorted-long-set membership function (binary search over
    * an array riding the closure — see [[InSortedLongs]]).
    */
  def registerInSortedLongs(spark: SparkSession, name: String,
      values: Array[Long]): Unit = {
    val sorted = values.clone().sorted
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => InSortedLongs(exprs(0), sorted), "built-in")
  }

  /** Register a fused count-of-members function bound to a sorted long
    * list (sorted defensively): `name(array<long>)` -> BIGINT count of
    * elements present in the list — see [[CountInSortedLongs]].
    */
  def registerCountInSortedLongs(spark: SparkSession, name: String,
      values: Array[Long]): Unit = {
    val sorted = values.clone().sorted
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => CountInSortedLongs(exprs(0), sorted), "built-in")
  }

  /** Register a Bloom-filter membership probe bound to a built filter:
    * `name(BIGINT)` -> BOOLEAN might-contain — see [[BloomContainsLong]].
    */
  /** Register a single-round BPE merge bound to one (a, b) symbol pair —
    * `name(array<string>) -> array<string>`. Bound like
    * [[registerInSortedLongs]] so corpus-derived symbols never pass
    * through SQL-string quoting; resolution binds the pair at analysis
    * time, so re-registering for the next round cannot disturb an
    * already-analyzed plan.
    */
  def registerBpeMergeOnce(spark: SparkSession, name: String,
      a: String, b: String): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BpeMergeOnce(exprs(0),
        org.apache.spark.unsafe.types.UTF8String.fromString(a),
        org.apache.spark.unsafe.types.UTF8String.fromString(b)), "built-in")

  /** Register the full K-merge BPE fold bound to a trained merge list
    * (rank order) — `name(array<string>) -> array<string>`, one codegen
    * kernel call per word instead of K chained interpreted aggregates.
    */
  def registerBpeFold(spark: SparkSession, name: String,
      merges: Seq[(String, String)]): Unit = {
    val as = merges.map(m =>
      org.apache.spark.unsafe.types.UTF8String.fromString(m._1)).toArray
    val bs = merges.map(m =>
      org.apache.spark.unsafe.types.UTF8String.fromString(m._2)).toArray
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BpeFold(exprs(0), as, bs), "built-in")
  }

  def registerBloomContainsLong(spark: SparkSession, name: String,
      bloom: org.apache.spark.util.sketch.BloomFilter): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => BloomContainsLong(exprs(0), bloom), "built-in")

  /** Register the fused boiler-span probe bound to a span-hash list
    * (sorted defensively, like [[registerInSortedLongs]]):
    * `name(text)` -> array<int> of hit span starts.
    */
  def registerSpanHitStarts(spark: SparkSession, name: String,
      values: Array[Long], n: Int = 8): Unit = {
    val sorted = values.clone().sorted
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => SpanHitStarts(exprs(0), n, sorted), "built-in")
  }

  /** Register d43/s24's LM scorer bound to a trained model's arrays:
    * `name(text)` -> BIGINT exact NLL sum in integer micros — see
    * [[LmNllMicros]]. Caller passes PRE-SORTED parallel key/value
    * arrays (sorting here would break key↔value alignment).
    */
  def registerLmNllMicros(spark: SparkSession, name: String,
      bigramKeys: Array[Long], bigramMicros: Array[Long],
      ctxKeys: Array[Long], ctxMicros: Array[Long],
      dfltMicros: Long): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => LmNllMicros(exprs(0), bigramKeys, bigramMicros,
        ctxKeys, ctxMicros, dfltMicros), "built-in")

  /** Register a hyperplane sign-code function bound to a plane matrix. */
  def registerSignCode(spark: SparkSession, name: String,
      planes: Array[Array[Double]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => SignCode(exprs(0), planes), "built-in")

  /** Register a nearest-anchor assignment function bound to a FLOAT
    * anchor matrix: `name(embedding, ncells)` — e04/e04_large's cell
    * quantizer (see [[LshKernels.nearestAnchor]]).
    */
  def registerNearestAnchor(spark: SparkSession, name: String,
      planes: Array[Array[Float]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => NearestAnchor(exprs(0), exprs(1), planes), "built-in")
}
