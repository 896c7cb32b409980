package graft

import org.apache.spark.sql.functions._
import graft.olap.ParentChild

/** Parent-child closure semantics beyond the 2-level q_parentchild
  * oracle: deep chains, branching, and the reference's
  * `null_parent_value` sentinel roots (schema.rb:191-197).
  */
class ParentChildSpec extends SparkSpec {

  import spark.implicits._

  // A(1) -> B(2) -> C(3) -> D(4), plus sibling E(5) under B
  private def chain = Seq(
    (1L, Option.empty[Long]), (2L, Some(1L)), (3L, Some(2L)),
    (4L, Some(3L)), (5L, Some(2L))).toDF("id", "parent")

  test("closure covers a 4-deep chain with correct depths") {
    val cl = ParentChild.closure(chain, "id", "parent").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reflexive rows
    assert((1L to 5L).forall(m => cl.contains((m, m, 0))))
    // the deep chain
    assert(cl.contains((1L, 4L, 3)))
    assert(cl.contains((2L, 4L, 2)))
    assert(cl.contains((1L, 5L, 2)))
    // no inverted or sibling pairs
    assert(!cl.exists { case (a, d, _) => a == 4L && d != 4L })
    assert(!cl.exists { case (a, d, _) => (a, d) == ((3L, 5L)) })
    // exactly n + sum(ancestors per member) rows: 5 + (0+1+2+3+2)
    assert(cl.size === 13)
  }

  test("subtree totals aggregate the whole descendant subtree") {
    val facts = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40), (5L, 50))
      .toDF("member_id", "v")
    val totals = ParentChild.subtreeTotals(chain, "id", "parent",
        facts, "member_id", sum(col("v")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(totals(1L) === 150) // whole tree
    assert(totals(2L) === 140) // B + C + D + E
    assert(totals(3L) === 70)  // C + D
    assert(totals(4L) === 40)
    assert(totals(5L) === 50)
  }

  test("null_parent_value sentinel roots create no phantom ancestor") {
    // roots marked with parent = 0 (the reference's null_parent_value)
    val m = Seq((1L, 0L), (2L, 1L), (3L, 1L)).toDF("id", "parent")
    val cl = ParentChild.closure(m, "id", "parent",
        nullParentValue = Some(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!cl.exists(_._1 == 0L), "sentinel must not become a member")
    assert(cl === Set((1L, 1L), (2L, 2L), (3L, 3L), (1L, 2L), (1L, 3L)))
    // without the sentinel declared, 0 WOULD leak in as an ancestor —
    // the behavior the option exists to prevent
    val leaked = ParentChild.closure(m, "id", "parent")
      .collect().map(r => r.getLong(0)).toSet
    assert(leaked.contains(0L))
  }

  test("closure is a true fixpoint: a 200-deep chain closes fully") {
    // depth far beyond the old 32 cap (VERDICT r6 #3) — the doubling
    // loop converges in ~8 rounds and must not truncate
    val n = 200
    val deep = (1 to n)
      .map(i => (i.toLong, if (i == 1) Option.empty[Long] else Some(i - 1L)))
      .toDF("id", "parent")
    val cl = ParentChild.closure(deep, "id", "parent")
    // root reaches the leaf at exactly depth n-1
    val leafRow = cl.filter(col("anc") === 1L && col("desc") === n.toLong)
      .collect()
    assert(leafRow.map(_.getInt(2)).toSeq === Seq(n - 1))
    // full closure size: n reflexive + sum of ancestor counts 0..n-1
    assert(cl.count() === n + n.toLong * (n - 1) / 2)
  }

  test("a parent cycle throws instead of silently truncating") {
    val cyc = Seq((1L, 3L), (2L, 1L), (3L, 2L)).toDF("id", "parent")
    val e = intercept[IllegalStateException] {
      ParentChild.closure(cyc, "id", "parent", maxDepth = 64).collect()
    }
    assert(e.getMessage.contains("cycle"))
  }
}
