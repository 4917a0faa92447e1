package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}

/**
 * Catalyst rule: an aggregate over a registered base table re-plans
 * against a MATERIALIZED ROLLUP (pre-aggregated summary) — the fourth
 * member of the auto-rewrite family ([[IvfRewriteRule]] top-k ANN,
 * [[SimJoinRewriteRule]] cosine joins, [[FuzzyJoinRewriteRule]] edit
 * distance). At 100 TB this is the difference between a datacard
 * refresh that rescans the corpus and one that reads a few thousand
 * summary rows: `SELECT lang, count(*), sum(n_chars) FROM docs GROUP
 * BY lang` re-plans as a merge-aggregate over the (lang, source)
 * summary, because count/sum/min/max are MERGE-CLOSED — re-aggregating
 * partial states with (sum, sum, min, max) is exactly the final state.
 *
 * EXACTNESS contract: the rewrite fires only when every aggregate in
 * the query is merge-closed over a registered partial —
 *   count(*)        → sum(summary.cnt)
 *   sum(c)          → sum(summary.sum_c)   (integral/decimal c only —
 *                     float sums are order-dependent, so the rule
 *                     REFUSES them rather than silently re-associating)
 *   min(c) / max(c) → min/max of the stored partial
 * — the query's GROUP BY columns are a subset of the summary's
 * grouping (coarser rollups re-aggregate), and any WHERE predicate
 * references summary grouping columns only (such a filter commutes
 * with the aggregate, so it is applied to the summary rows). Anything
 * else — count(col), avg, count(DISTINCT), a predicate on a
 * non-grouping column — leaves the plan untouched and the query falls
 * back to the base scan. DISTINCT aggregates can never be served:
 * distinctness is not merge-closed over a rollup.
 *
 * The summary itself is the user's assertion (built by
 * [[RollupCatalog.buildSummary]] from the same base relation); the
 * rule asserts only the merge algebra, exactly as the fuzzy-join rule
 * asserts the pigeonhole bound but not the store's name lengths.
 */
object RollupCatalog {
  /**
   * @param summaryPath parquet dir of the pre-aggregate
   * @param groupCols   summary grouping columns (finest grain served)
   * @param cntCol      summary column holding count(*) partials
   * @param sums        base column -> summary column with sum partials
   * @param mins        base column -> summary column with min partials
   * @param maxs        base column -> summary column with max partials
   */
  final case class Params(
      summaryPath: String,
      groupCols: Seq[String],
      cntCol: String,
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Params]()

  def register(basePath: String, params: Params): Unit =
    entries.put(normalize(basePath), params)
  def unregister(basePath: String): Unit = entries.remove(normalize(basePath))
  def lookup(basePath: String): Option[Params] =
    Option(entries.get(normalize(basePath)))

  private def normalize(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:", "")

  /** Build (and write) the summary the catalog serves: one row per
    * groupCols combination with count/sum/min/max partial states. The
    * build is one map-side-partial hash aggregate over the base — the
    * single full scan that all later rollup queries amortize. */
  def buildSummary(spark: SparkSession, basePath: String,
      summaryPath: String, groupCols: Seq[String],
      statCols: Seq[String]): Params = {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(basePath)
    val aggs =
      count(lit(1)).as("cnt") +:
      statCols.flatMap(c => Seq(
        sum(col(c)).as(s"sum_$c"),
        min(col(c)).as(s"min_$c"),
        max(col(c)).as(s"max_$c")))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      .write.mode("overwrite").parquet(summaryPath)
    Params(summaryPath, groupCols, "cnt",
      sums = statCols.map(c => c -> s"sum_$c").toMap,
      mins = statCols.map(c => c -> s"min_$c").toMap,
      maxs = statCols.map(c => c -> s"max_$c").toMap)
  }
}

class RollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val rewritten = TreeNodeTag[Boolean]("graft.rollup.rewritten")

  /** Peel Project/Filter down to a single parquet LogicalRelation,
    * collecting filter conditions on the way. Any other node refuses. */
  private def strip(plan: LogicalPlan)
      : Option[(Seq[Expression], LogicalRelation, String)] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      strip(child)
    case Filter(cond, child) =>
      strip(child).map { case (cs, lr, p) => (cond +: cs, lr, p) }
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(p => (Nil, lr, p.toString))
        case _ => None
      }
    case _ => None
  }

  /** Float/double sums are order-dependent; re-associating them over a
    * rollup could change the result, so the rule refuses. */
  private def sumMergeSafe(e: Expression): Boolean = e.dataType match {
    case FloatType | DoubleType => false
    case _: DecimalType => true
    case _ => true // integral types
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(groupExprs, resultExprs, child, _)
        if agg.getTagValue(rewritten).isEmpty =>
      val replaced = for {
        (conds, _, path) <- strip(child)
        params <- RollupCatalog.lookup(path)
        // query grouping: plain columns, subset of the summary grain
        gAttrs <- Some(groupExprs).collect {
          case ge if ge.forall(_.isInstanceOf[AttributeReference]) =>
            ge.map(_.asInstanceOf[AttributeReference])
        }
        if gAttrs.forall(a => params.groupCols.contains(a.name))
        // predicates must commute with the aggregate: summary-grain cols only
        if conds.forall(_.references.forall(a => params.groupCols.contains(a.name)))
        // every output is a grouping column or a merge-closed aggregate
        if resultExprs.forall {
          case _: AttributeReference => true
          case Alias(_: AttributeReference, _) => true
          case Alias(AggregateExpression(f, Complete, false, None, _), _) =>
            f match {
              case Count(Seq(Literal(_, _))) => true
              case Sum(a: AttributeReference, _) =>
                params.sums.contains(a.name) && sumMergeSafe(a)
              case Min(a: AttributeReference) => params.mins.contains(a.name)
              case Max(a: AttributeReference) => params.maxs.contains(a.name)
              case _ => false
            }
          case _ => false
        }
      } yield {
        val summary = spark.read.parquet(params.summaryPath)
          .queryExecution.analyzed
        val byName = summary.output.map(a => a.name -> a).toMap
        def sAttr(n: String): Attribute = byName(n)

        // WHERE on grouping cols commutes with GROUP BY: apply to the
        // summary rows before the merge aggregate.
        val rebased = conds.map(_.transform {
          case a: AttributeReference => sAttr(a.name)
        })
        val filtered = rebased.foldLeft(summary: LogicalPlan)(
          (p, c) => Filter(c, p))

        val newGroup = gAttrs.map(a => sAttr(a.name))
        // one merged output per original result expression, in order
        val merged: Seq[NamedExpression] = resultExprs.map { ne =>
            def realias(e: Expression): NamedExpression = {
              val cast =
                if (e.dataType == ne.dataType) e
                else Cast(e, ne.dataType)
              Alias(cast, ne.name)(exprId = ne.exprId)
            }
            ne match {
              case a: AttributeReference => realias(sAttr(a.name))
              case Alias(a: AttributeReference, _) => realias(sAttr(a.name))
              case Alias(AggregateExpression(f, _, _, _, _), _) =>
                val mf: AggregateFunction = f match {
                  case Count(_) => Sum(sAttr(params.cntCol))
                  case Sum(a: AttributeReference, _) => Sum(sAttr(params.sums(a.name)))
                  case Min(a: AttributeReference) => Min(sAttr(params.mins(a.name)))
                  case Max(a: AttributeReference) => Max(sAttr(params.maxs(a.name)))
                  case other =>
                    throw new IllegalStateException(s"unreachable: $other")
                }
                realias(mf.toAggregateExpression())
              case other =>
                throw new IllegalStateException(s"unreachable: $other")
            }
        }
        val out = Aggregate(newGroup, merged, filtered, None)
        out.setTagValue(rewritten, true)
        out
      }
      replaced.getOrElse(agg)
  }
}

object RollupRewrite {
  /** Install the rewrite rule into a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[RollupRewriteRule])) {
      spark.experimental.extraOptimizations =
        existing :+ new RollupRewriteRule(spark)
    }
  }
}
