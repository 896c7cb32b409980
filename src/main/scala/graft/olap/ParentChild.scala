package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parent-child (recursive) hierarchies — reference `parent_column` /
  * `null_parent_value` levels (schema.rb:191-197; closure tables
  * schema_definition_test.rb:777-818). A parent-child dimension is one
  * table with (id, parent_id); a member's total aggregates its entire
  * descendant subtree.
  *
  * Spark-native shape: materialize the ancestor-descendant closure once
  * by iterated self-join (fixpoint with a depth cap — hierarchies are
  * shallow; the reference ships closure *tables* for exactly this
  * reason), then subtree totals are one broadcast join of the closure
  * against the fact + one groupBy. The closure is tiny relative to the
  * fact (dimension-sized × depth), so at 100 TB the fact still only
  * streams through one aggregation.
  */
object ParentChild {

  /** (ancestor, descendant, depth) closure rows, including the
    * reflexive (m, m, 0) pair. `maxDepth` caps runaway cycles.
    * `nullParentValue` is the reference's sentinel root marker
    * (schema.rb:196: `null_parent_value` — e.g. 0 instead of NULL);
    * rows whose parent equals it are roots, not children of a phantom
    * member.
    */
  def closure(members: DataFrame, idCol: String, parentCol: String,
      maxDepth: Int = 32, nullParentValue: Option[Any] = None): DataFrame = {
    val isRoot = nullParentValue match {
      case Some(v) => col("anc").isNull || col("anc") === lit(v)
      case None    => col("anc").isNull
    }
    val edges = members.select(col(parentCol).as("anc"),
      col(idCol).as("desc")).filter(!isRoot)
    var acc = members.select(col(idCol).as("anc"), col(idCol).as("desc"),
      lit(0).as("depth"))
    var frontier = edges.withColumn("depth", lit(1))
    var d = 1
    var done = frontier.isEmpty
    while (!done && d < maxDepth) {
      acc = acc.unionByName(frontier)
      // extend: ancestor of my parent is my ancestor
      val next = frontier.alias("f")
        .join(edges.alias("e"), col("f.anc") === col("e.desc"))
        .select(col("e.anc").as("anc"), col("f.desc").as("desc"),
          (col("f.depth") + 1).as("depth"))
      d += 1
      frontier = next
      done = next.isEmpty
    }
    acc
  }

  /** Subtree totals: for every member, aggregate the measure over the
    * member's whole descendant subtree (the parent-child rollup).
    * `facts` must carry `factKeyCol` joining to member ids.
    */
  def subtreeTotals(members: DataFrame, idCol: String, parentCol: String,
      facts: DataFrame, factKeyCol: String,
      aggCol: org.apache.spark.sql.Column,
      nullParentValue: Option[Any] = None): DataFrame = {
    val cl = closure(members, idCol, parentCol,
      nullParentValue = nullParentValue)
    facts
      .join(broadcast(cl), facts(factKeyCol) === cl("desc"))
      .groupBy(col("anc").as(idCol))
      .agg(aggCol.as("subtree_total"))
  }
}
