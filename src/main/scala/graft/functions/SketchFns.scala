package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's internal Bloom-filter sketch
  * expressions (SURVEY §2.12 custom-Expression tier).
  *
  * Spark ships `BloomFilterAggregate` / `BloomFilterMightContain` for
  * its runtime-filter join optimization but does not expose them in the
  * SQL function registry; registering them makes the sketch available
  * to the decontamination operators as first-class, codegen'd
  * expressions:
  *
  *  - `bloom_agg(xxhash64(x), estItems, numBits)` — distributed build:
  *    partial filters are OR-merged, so the binary is deterministic at
  *    any parallelism.
  *  - `bloom_contains(filter, xxhash64(x))` — membership probe; the
  *    filter argument must be foldable (a collected-model literal) or a
  *    scalar subquery, which matches the engine's collect-the-model
  *    pattern (k-means codebooks, LSH planes).
  */
object SketchFns {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "bloom_agg"),
      (exprs: Seq[Expression]) =>
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)))
    reg.registerFunction(
      FunctionIdentifier("bloom_contains"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "bloom_contains"),
      (exprs: Seq[Expression]) =>
        BloomFilterMightContain(exprs(0), exprs(1)))
  }
}
