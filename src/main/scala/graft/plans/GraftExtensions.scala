package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst-level extensions (SURVEY §7.3 tier (c)): a
  * `Rule[LogicalPlan]` + function registration, installable either via
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  * or `GraftExtensions.install(spark)` on a live session.
  *
  * The rule generalizes the engine's fact-join pruner
  * (`Cubes.salesFactPruner`) to RAW spark.sql queries: an INNER join
  * over a DECLARED foreign key (FK values non-null ⇒ match exactly one
  * PK row) is row-preserving, so when no column of the PK side is
  * referenced above the join, the join is replaced by
  * `Filter(IsNotNull(fk))` — exactly the rows the join would keep.
  * Catalyst cannot do this itself because it has no referential-
  * integrity knowledge; the constraint is declared, as in the
  * reference's schema (unique_key_level_name, schema.rb:152-156, which
  * exists for the same GROUP-BY/join elimination purpose). At 100 TB
  * this removes the biggest shuffle of the plan for queries that
  * touch only fact columns.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => GraftExtensions.EliminateDeclaredFkJoin)
  }
}

object GraftExtensions {

  /** Declared guaranteed FKs as (fkColumn, pkColumn) name pairs. */
  private val fkConstraints =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  def declareFk(fkCol: String, pkCol: String): Unit =
    fkConstraints.add((fkCol, pkCol))

  def clearFks(): Unit = fkConstraints.clear()

  object EliminateDeclaredFkJoin extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case p @ Project(_, Join(left, right, Inner, Some(
          EqualTo(a: AttributeReference, b: AttributeReference)), _))
          if eliminable(p, left, right, a, b) =>
        val fk = if (left.outputSet.contains(a)) a else b
        p.copy(child = Filter(IsNotNull(fk), left))
      case p @ Project(_, Join(left, right, Inner, Some(
          EqualTo(a: AttributeReference, b: AttributeReference)), _))
          if eliminable(p, right, left, b, a) =>
        val fk = if (right.outputSet.contains(a)) a else b
        p.copy(child = Filter(IsNotNull(fk), right))
    }

    /** The join disappears when: the equi-key pair is a declared FK
      * with the FK on the kept side, and the project references only
      * kept-side columns.
      */
    private def eliminable(p: Project, keep: LogicalPlan,
        drop: LogicalPlan,
        x: AttributeReference, y: AttributeReference): Boolean = {
      val (fk, pk) =
        if (keep.outputSet.contains(x) && drop.outputSet.contains(y))
          (x, y)
        else if (keep.outputSet.contains(y) && drop.outputSet.contains(x))
          (y, x)
        else return false
      fkConstraints.contains((fk.name, pk.name)) &&
        p.references.subsetOf(keep.outputSet)
    }
  }

  /** Install on a live session: optimizer rule via
    * experimental.extraOptimizations plus the native vector functions.
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations
        .contains(EliminateDeclaredFkJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ EliminateDeclaredFkJoin
    graft.functions.VectorExprs.register(spark)
  }
}
