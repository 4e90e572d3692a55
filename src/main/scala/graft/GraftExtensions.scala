package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions._

/** Session-extensions entry point: installs graft's native functions at
  * session build time, the standard way a Spark library ships —
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * after which `cosine_sim`, `shingle3_hashes`, `poly_hash`,
  * `char_jaccard`, and `sign_code_{4,8,16}` are available in SQL and
  * `expr(...)` on every session of the context.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // the custom whole-operator plans are available session-wide too
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float vectors"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("shingle3_hashes"),
      info("shingle3_hashes", "shingle3_hashes(text) - distinct xxhash64 of 3-word shingles"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0), 3)))
    ext.injectFunction((FunctionIdentifier("md5_shingle3_hashes"),
      info("md5_shingle3_hashes",
        "md5_shingle3_hashes(text) - sorted distinct md5-60-bit hashes of 3-word shingles"),
      (exprs: Seq[Expression]) => Md5ShingleHashes(exprs(0), 3)))
    ext.injectFunction((FunctionIdentifier("md5_shingle8_hashes"),
      info("md5_shingle8_hashes",
        "md5_shingle8_hashes(text) - sorted distinct md5-60-bit hashes of 8-word spans (d27's family)"),
      (exprs: Seq[Expression]) => Md5ShingleHashes(exprs(0), 8)))
    ext.injectFunction((FunctionIdentifier("poly_hash"),
      info("poly_hash", "poly_hash(arr) - rolling polynomial hash of a long array"),
      (exprs: Seq[Expression]) => PolyHash(exprs(0))))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash of the word multiset"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    ext.injectFunction((FunctionIdentifier("simhash60_md5"),
      info("simhash60_md5",
        "simhash60_md5(text) - 60-bit SimHash over md5-prefix word hashes (DuckDB-reproducible)"),
      (exprs: Seq[Expression]) => SimHash60Md5(exprs(0))))
    ext.injectFunction((FunctionIdentifier("char_jaccard"),
      info("char_jaccard", "char_jaccard(a, b) - distinct-code-point Jaccard of two strings"),
      (exprs: Seq[Expression]) => CharSetJaccard(exprs(0), exprs(1))))
    for (n <- Seq(4, 8, 16)) {
      val ps = LshKernels.planes(n)
      ext.injectFunction((FunctionIdentifier(s"sign_code_$n"),
        info(s"sign_code_$n", s"sign_code_$n(vec) - $n-bit hyperplane LSH bucket code"),
        (exprs: Seq[Expression]) => SignCode(exprs(0), ps)))
    }
  }
}
