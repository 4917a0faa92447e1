package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.SparkSession

/** The cluster deployment path: a session created with
  * `spark.sql.extensions=graft.functions.GraftExtensions` gets every
  * function and the ANN rewrite rule with no imperative registration. */
class GraftExtensionsSpec extends SparkFunSuite {

  test("extensions-configured session registers functions and the rewrite rule") {
    val base = spark // ensure shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a static conf, inert once a
      // SparkContext exists (as in this shared-context suite), so use
      // the equivalent public builder seam — the same GraftExtensions
      // instance a real cluster gets from the conf at first startup.
      val ext = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(ext ne base)
      // functions resolve without GraftFunctions.register
      val r = ext.sql(
        "SELECT knn_cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F))")
        .head.getDouble(0)
      assert(math.abs(r - 1.0) < 1e-12)
      val agg = ext.sql(
        "SELECT vector_avg(v) FROM VALUES (array(2.0F)), (array(4.0F)) AS t(v)")
        .head.getSeq[Double](0)
      assert(agg === Seq(3.0))
      // EVERY registered function resolves (completeness as GraftFunctions.all grows)
      GraftFunctions.all.foreach { case (name, _, _) =>
        assert(ext.sessionState.functionRegistry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
      }
      // the injected optimizer rule is present
      val ruleNames = ext.sessionState.optimizer.extendedOperatorOptimizationRules
        .map(_.getClass.getName) ++
        ext.sessionState.optimizer.batches.flatMap(_.rules).map(_.getClass.getName)
      assert(ruleNames.exists(_.contains("IvfRewriteRule")), ruleNames.mkString("\n"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
