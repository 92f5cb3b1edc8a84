package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.constraints.{Constraint, ForeignKey, PrimaryKey, Unique}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** RELY-constraint JOIN ELIMINATION — the optimization informational
  * constraints exist for (`sql_rely_constraints` stores them; this
  * rule spends them): an INNER equi-join from a FOREIGN KEY side to
  * its PRIMARY KEY side is a no-op when nothing above uses the PK
  * side's columns — under `FOREIGN KEY ... RELY` every non-null FK
  * value matches a row, and under `PRIMARY KEY/UNIQUE ... RELY` it
  * matches EXACTLY ONE — so the join neither drops nor duplicates FK
  * rows and can be replaced by `Filter(IsNotNull(fk), left)`. At
  * 100 TB that is an entire shuffle + build of the dimension table
  * gone from every query that joins "just in case".
  *
  * Deliberately conservative — eliminates only when ALL of:
  *  - single-column equi-condition between attributes of either side;
  *  - the PK side is a BARE relation of this catalog (any filter on it
  *    could drop matches — no elimination);
  *  - the PK side carries a single-column PRIMARY KEY or UNIQUE
  *    constraint WITH RELY on exactly the join key;
  *  - the FK side's source relation carries a single-column FOREIGN
  *    KEY WITH RELY on the join key referencing that table and column
  *    (attribute identity traced by exprId, so aliases break the
  *    match rather than mis-apply it);
  *  - the parent Project references only FK-side columns.
  * RELY means the USER vouches for integrity — Spark's contract (and
  * every warehouse's) is that a false RELY yields wrong results; the
  * NOT-ENFORCED-without-RELY form is stored but never used here. */
case class EliminateRelyJoins(spark: SparkSession)
    extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  /** the PK side must be the bare relation — EXCEPT for
    * `IsNotNull(joinKey)` filters (InferFiltersFromConstraints adds
    * one under every inner join): a NULL key row can never match a
    * non-null FK value, so dropping it never changes the join, and
    * seeing through that filter is sound. Anything else on the PK
    * side (a real predicate could drop MATCHING rows) refuses. */
  private def pkSideRel(p: LogicalPlan,
      rk: AttributeReference): Option[LogicalPlan] = p match {
    case rel if asRel(rel).isDefined => asRel(rel)
    case Filter(cond, child)
        if splitConjunctivePredicates(cond).forall {
          case IsNotNull(a: AttributeReference) => a.semanticEquals(rk)
          case _ => false
        } => pkSideRel(child, rk)
    // column pruning wraps the side in an attribute-only Project
    // before relation-level pruning — row-preserving, safe to strip
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      pkSideRel(child, rk)
    case _ => None
  }

  /** the relation node, pre- or post-pushdown: the injected rule runs
    * in the operator-optimization batch (DataSourceV2Relation), but
    * AQE re-optimization and manual application see the pushed form
    * (DataSourceV2ScanRelation) — both carry the same Table. */
  private def asRel(p: LogicalPlan): Option[LogicalPlan] = p match {
    case r: DataSourceV2Relation => Some(r)
    case sr: DataSourceV2ScanRelation => Some(sr)
    case _ => None
  }

  private def tableOf(p: LogicalPlan)
      : Option[graft.sources.GraftMergeTable] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: graft.sources.GraftMergeTable => Some(t)
      case _ => None
    }
    case sr: DataSourceV2ScanRelation => sr.relation.table match {
      case t: graft.sources.GraftMergeTable => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def graftConstraints(p: LogicalPlan): Array[Constraint] =
    tableOf(p).map(_.constraints()).getOrElse(Array.empty)

  private def singleCol(refs: Array[
      org.apache.spark.sql.connector.expressions.NamedReference],
      name: String): Boolean =
    refs.length == 1 && refs(0).fieldNames().sameElements(Array(name))

  private def uniqueRely(rel: LogicalPlan,
      col: String): Boolean =
    graftConstraints(rel).exists {
      case pk: PrimaryKey => pk.rely() && singleCol(pk.columns(), col)
      case u: Unique => u.rely() && singleCol(u.columns(), col)
      case _ => false
    }

  private def fkRely(left: LogicalPlan, lk: AttributeReference,
      rightTable: String, rightCol: String): Boolean =
    left.collect {
      case fr if asRel(fr).isDefined && fr.outputSet.contains(lk) => fr
    }.exists(fr => graftConstraints(fr).exists {
      case fk: ForeignKey => fk.rely() &&
        singleCol(fk.columns(), lk.name) &&
        singleCol(fk.referencedColumns(), rightCol) && {
          // compare the FULL identifier, not just the trailing
          // segment: ns1.dim and ns2.dim are different tables, and
          // eliminating a join against the wrong one silently keeps
          // rows the real join would drop. The constraint stores the
          // identifier AS WRITTEN (`REFERENCES graft.ns.dim` keeps
          // the catalog; `REFERENCES ns.dim` is catalog-relative),
          // so accept either form against the PK table's
          // catalog-qualified name().
          val refParts = fk.referencedTable().namespace() :+
            fk.referencedTable().name()
          val allParts = rightTable.split('.')
          refParts.sameElements(allParts) ||
            refParts.sameElements(allParts.drop(1))
        }
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case p @ Project(_, Join(left, right, Inner,
          Some(EqualTo(a: AttributeReference,
            b: AttributeReference)), _)) =>
        val keys =
          if (left.outputSet.contains(a) && right.outputSet.contains(b))
            Some((a, b))
          else if (left.outputSet.contains(b) &&
            right.outputSet.contains(a)) Some((b, a))
          else None
        keys.flatMap { case (lk, rk) =>
          pkSideRel(right, rk).map(rel => (lk, rk, rel))
        } match {
          case Some((lk, rk, rel))
              if p.references.subsetOf(left.outputSet) &&
                uniqueRely(rel, rk.name) &&
                tableOf(rel).exists(t =>
                  fkRely(left, lk, t.name(), rk.name)) =>
            EliminateRelyJoins.lastEliminated.set(
              s"${tableOf(rel).get.name()} on ${rk.name}")
            Project(p.projectList, Filter(IsNotNull(lk), left))
          case _ => p
        }
    }
}

object EliminateRelyJoins {
  /** last elimination this JVM performed — test observability. */
  private[graft] val lastEliminated =
    new java.util.concurrent.atomic.AtomicReference[String]("")
}
