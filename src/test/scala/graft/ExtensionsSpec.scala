package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point installs graft functions on a
  * fresh session (sharing the test SparkContext).
  */
class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("GraftExtensions injects functions usable from plain SQL") {
    spark // force the shared context up first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // spark.sql.extensions is a static conf read at context creation; on
      // a shared test context, withExtensions drives the same injection path
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s2.sql(
        """SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
          |       size(shingle3_hashes('a b c d')) AS ns,
          |       poly_hash(array(1L, 2L, 3L)) AS ph,
          |       char_jaccard('abc', 'abd') AS cj,
          |       sign_code_4(array_repeat(1.0F, 64)) AS sc""".stripMargin).head
      assert(r.getDouble(0) == 1.0)
      assert(r.getInt(1) == 2)
      assert(r.getLong(2) == (((1 * 31 + 2) * 31) + 3))
      assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
      assert(r.getInt(4) >= 0 && r.getInt(4) < 16)

      // the injected planner strategy plans the custom AsOfJoin node
      // WITHOUT AsOf.join's extraStrategies fallback
      import s2.implicits._
      val lp = org.apache.spark.sql.GraftSqlBridge.logicalPlan(
        Seq((1L, 10L, 100L)).toDF("p_id", "user", "p_ts"))
      val rp = org.apache.spark.sql.GraftSqlBridge.logicalPlan(
        Seq((2L, 10L, 50L)).toDF("s_id", "s_user", "s_ts"))
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
               n: String) = p.output.find(_.name == n).get
      val joined = org.apache.spark.sql.GraftSqlBridge.ofRows(s2,
        graft.plans.AsOfJoin(lp, rp,
          attr(lp, "user"), attr(rp, "s_user"),
          attr(lp, "p_ts"), attr(rp, "s_ts"), None))
      assert(joined.select("p_id", "s_id").collect().map(_.toSeq).toSeq ==
        Seq(Seq(1L, 2L)))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
