package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import scala.collection.concurrent.TrieMap

/**
 * Declared-constraint catalog: UNIQUE keys for registered base
 * tables. Spark's optimizer cannot know a parquet column is unique
 * (no constraint metadata survives into HadoopFsRelation), so the two
 * classic constraint-driven rewrites every warehouse performs —
 * DISTINCT elimination and redundant-join elimination — never fire.
 * This catalog carries the user's assertion, exactly as
 * [[RollupCatalog]] carries the summary-correctness assertion: the
 * rule asserts the ALGEBRA (a superset of a unique key cannot have
 * duplicates; a left join to a unique key cannot change multiplicity)
 * and the catalog asserts the DATA property.
 */
object ConstraintCatalog {
  private val keys = TrieMap.empty[String, Seq[Seq[String]]]

  private def normalize(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:", "")

  /** Declare `cols` a unique key of the table at `path`. */
  def registerUnique(path: String, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "a unique key needs at least one column")
    val n = normalize(path)
    keys.updateWith(n)(old => Some(old.getOrElse(Nil) :+ cols))
  }

  def uniqueKeysFor(path: String): Seq[Seq[String]] =
    keys.getOrElse(normalize(path), Nil)

  def clear(): Unit = keys.clear()
}

/**
 * Catalyst rule — the SEVENTH and EIGHTH auto-rewrites, both driven
 * by [[ConstraintCatalog]] unique keys:
 *
 *  1. **DISTINCT elimination**: `SELECT DISTINCT ...` lowers to an
 *     Aggregate whose grouping IS its output; when the grouped
 *     attribute set contains a registered unique key of the (single)
 *     underlying scan — reached through Filters and attribute-only
 *     Projects, both of which preserve per-row uniqueness — the rows
 *     are already distinct and the whole Aggregate (a full shuffle of
 *     every distinct row at 100 TB) is deleted.
 *
 *  2. **Left-join elimination**: `fact LEFT JOIN dim ON fact.fk =
 *     dim.pk` where NOTHING from `dim` is referenced above the join
 *     and `pk` is a registered single-column unique key — each fact
 *     row emits exactly one output row whether or not it matches
 *     (unique key ⇒ at most one match; LEFT ⇒ at least one row), so
 *     the join is a no-op and is deleted. This requires NO
 *     foreign-key integrity, only the right side's uniqueness, and it
 *     holds through right-side Filters/Projects (they can only shrink
 *     the at-most-one match to zero, which LEFT OUTER null-extends —
 *     still one row). Star-schema queries that project only fact
 *     columns stop scanning the dimension entirely.
 *
 * Both rewrites replace a plan node with a strictly smaller one over
 * the SAME output attributes (exprIds preserved), so they compose
 * with everything downstream. Plans with zero registered tables are
 * untouched.
 */
class ConstraintRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val rewritten = TreeNodeTag[Boolean]("graft.constraint.checked")

  /** Walk Filters and attribute-only Projects down to a single
    * HadoopFsRelation scan; returns the scan path and the name in the
    * SCAN of each attribute that survives the chain (exprIds are
    * stable through Project-of-attributes, so names are too). */
  private def scanThrough(plan: LogicalPlan): Option[String] = plan match {
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      scanThrough(child)
    case Filter(_, child) => scanThrough(child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.headOption.map(_.toString)
        case _ => None
      }
    case _ => None
  }

  private def distinctElim(agg: Aggregate): Option[LogicalPlan] = {
    val groupAttrs = agg.groupingExpressions.flatMap {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    if (groupAttrs.length != agg.groupingExpressions.length) return None
    // DISTINCT shape: output == grouping, attribute-for-attribute
    val outAttrs = agg.aggregateExpressions.flatMap {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    if (outAttrs.length != agg.aggregateExpressions.length) return None
    if (outAttrs.map(_.exprId).toSet != groupAttrs.map(_.exprId).toSet) return None
    for {
      path <- scanThrough(agg.child)
      names = groupAttrs.map(_.name).toSet
      _ <- ConstraintCatalog.uniqueKeysFor(path)
        .find(key => key.toSet.subsetOf(names))
    } yield Project(outAttrs, agg.child)
  }

  /** The left-join no-op test shared by the Project- and
    * Aggregate-parent shapes (CollapseProject can leave either). */
  private def joinIsNoOp(
      parentRefs: AttributeSet, join: Join): Boolean = {
    val Join(left, right, _, cond, _) = join
    val keyAttr = cond.flatMap {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        // identify which side is the dimension key
        if (right.outputSet.contains(b) && left.outputSet.contains(a)) Some(b)
        else if (right.outputSet.contains(a) && left.outputSet.contains(b)) Some(a)
        else None
      case _ => None
    }
    (for {
      rk <- keyAttr
      // nothing from the right side referenced above the join
      if parentRefs.subsetOf(left.outputSet)
      path <- scanThrough(right)
      if ConstraintCatalog.uniqueKeysFor(path).contains(Seq(rk.name))
    } yield true).getOrElse(false)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, j @ Join(left, _, LeftOuter, Some(_), _))
        if p.getTagValue(rewritten).isEmpty =>
      p.setTagValue(rewritten, true)
      if (joinIsNoOp(p.references, j)) Project(p.projectList, left) else p
    case agg @ Aggregate(_, _, j @ Join(left, _, LeftOuter, Some(_), _), _)
        if agg.getTagValue(rewritten).isEmpty =>
      agg.setTagValue(rewritten, true)
      if (joinIsNoOp(agg.references, j)) agg.copy(child = left)
      else distinctElim(agg).getOrElse(agg)
    case agg: Aggregate if agg.getTagValue(rewritten).isEmpty =>
      agg.setTagValue(rewritten, true)
      distinctElim(agg).getOrElse(agg)
  }
}

object ConstraintRewriteRule {
  /** Idempotently append the rule to the session's extra optimizer
    * rules (the [[IvfRewriteRule.ensureRegistered]] convention). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[ConstraintRewriteRule]))
      spark.experimental.extraOptimizations =
        existing :+ new ConstraintRewriteRule(spark)
  }
}
