package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst vector expressions (SURVEY §2.12 custom-Expression
  * tier). Spark's higher-order functions (`aggregate`/`zip_with`) are
  * CodegenFallback — interpreted per element — which measured ~25×
  * slower than generated code on 64-dim float embeddings. These
  * expressions generate a tight primitive loop inside whole-stage
  * codegen instead: no per-element virtual calls, no boxing, and they
  * stay fused with the surrounding operators.
  *
  * Determinism: each accumulator (dot, |a|², |b|²) folds in index
  * order, so results are bit-identical to a sequential fold in any
  * engine (the DuckDB oracle's list_sum) — same contract as the
  * flat-column formulation they replace.
  */
object VectorExprs {

  /** cosine_f32(a, b): cosine similarity of two float32 vectors. */
  final case class CosineF32(left: Expression, right: Expression)
      extends BinaryExpression {

    private def floatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (floatArray(left.dataType) && floatArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_f32"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / math.sqrt(na * nb)
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // fresh names: two instances of this expression can be fused
        // into one codegen stage, where fixed locals would collide
        val (n, dot, na, nb, i) = (ctx.freshName("n"), ctx.freshName("dot"),
          ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double xi$i = $a.getFloat($i);
           |  double yi$i = $b.getFloat($i);
           |  $dot += xi$i * yi$i; $na += xi$i * xi$i; $nb += yi$i * yi$i;
           |}
           |${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** dot_f32(a, b): plain dot product of two float32 vectors. */
  final case class DotF32(left: Expression, right: Expression)
      extends BinaryExpression {

    private def floatArray(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (floatArray(left.dataType) && floatArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> arguments, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_f32"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, dot, i) =
          (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** A foldable array<array<double>> child materialized once as a
    * primitive matrix — the shared shape of the model-carrying
    * expressions below (k-means codebook, LSH hyperplanes). The matrix
    * rides into generated code as a referenced object (one field, no
    * per-row construction), so the generated method is a short nested
    * loop whatever k × dim is — replacing the unrolled k×dim-term
    * expression trees that drove Janino into deep recursion (the
    * BENCH_r05 whole-stage-codegen compile failure).
    */
  trait MatrixArg { self: BinaryExpression =>
    protected def matrixOf(e: Expression): Array[Array[Double]] = {
      require(e.foldable, s"$prettyName: matrix argument must be foldable")
      val arr = e.eval().asInstanceOf[ArrayData]
      (0 until arr.numElements()).map { r =>
        val row = arr.getArray(r)
        (0 until row.numElements()).map(row.getDouble).toArray
      }.toArray
    }
    protected def matrixTypeOk(dt: DataType): Boolean = dt match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
  }

  /** argmin_sq(v, codebook): index (0-based) of the codebook row with
    * the smallest squared L2 distance to `v`; ties break on the lower
    * index. Distances fold (v_d - m_d)² in index order — bit-identical
    * to the left-assoc unrolled sum it replaces and to the DuckDB
    * oracle's list_sum fold — so the k-means assignment stays
    * oracle-reproducible. `v` is array<double>; codebook a foldable
    * array<array<double>> (the collected model re-embedded as a
    * literal).
    */
  final case class ArgminSq(left: Expression, right: Expression)
      extends BinaryExpression with MatrixArg {

    override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
      case ArrayType(DoubleType, _)
          if matrixTypeOk(right.dataType) && right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, foldable array<array<double>>)," +
          s" got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
    override def dataType: DataType = IntegerType
    override def prettyName: String = "argmin_sq"

    @transient private lazy val codebook: Array[Array[Double]] =
      matrixOf(right)
    @transient private lazy val minDim: Int =
      if (codebook.isEmpty) 0 else codebook.map(_.length).max

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      if (v.numElements() < minDim) throw new IllegalArgumentException(
        s"argmin_sq: vector has ${v.numElements()} components, " +
          s"codebook expects $minDim")
      var best = -1; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < codebook.length) {
        val m = codebook(c)
        var acc = 0.0; var d = 0
        while (d < m.length) {
          val diff = v.getDouble(d) - m(d); acc += diff * diff; d += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, _) => {
        val mat = ctx.addReferenceObj("codebook", codebook, "double[][]")
        val (best, bestD, c, m, acc, d, diff) = (ctx.freshName("best"),
          ctx.freshName("bestD"), ctx.freshName("c"), ctx.freshName("m"),
          ctx.freshName("acc"), ctx.freshName("d"), ctx.freshName("diff"))
        s"""
           |if ($a.numElements() < $minDim)
           |  throw new IllegalArgumentException(
           |    "argmin_sq: vector has " + $a.numElements() +
           |    " components, codebook expects $minDim");
           |int $best = -1;
           |double $bestD = Double.POSITIVE_INFINITY;
           |for (int $c = 0; $c < $mat.length; $c++) {
           |  double[] $m = $mat[$c];
           |  double $acc = 0.0;
           |  for (int $d = 0; $d < $m.length; $d++) {
           |    double $diff = $a.getDouble($d) - $m[$d];
           |    $acc += $diff * $diff;
           |  }
           |  if ($acc < $bestD) { $bestD = $acc; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** lsh_bits(v, planes): random-hyperplane sign-bit bucket of a float32
    * vector — bit b set iff v · planes[b] > 0. Each per-plane dot folds
    * (double)v_d * p_d in index order, matching both the unrolled
    * left-assoc sum it replaces and the oracle's list_sum fold, so the
    * sign tests (and buckets) are bit-identical.
    */
  final case class LshBits(left: Expression, right: Expression)
      extends BinaryExpression with MatrixArg {

    override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
      case ArrayType(FloatType, _)
          if matrixTypeOk(right.dataType) && right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, foldable array<array<double>>)," +
          s" got ${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "lsh_bits"

    @transient private lazy val planes: Array[Array[Double]] =
      matrixOf(right)
    @transient private lazy val minDim: Int =
      if (planes.isEmpty) 0 else planes.map(_.length).max

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      if (v.numElements() < minDim) throw new IllegalArgumentException(
        s"lsh_bits: vector has ${v.numElements()} components, " +
          s"planes expect $minDim")
      var bucket = 0L
      var p = 0
      while (p < planes.length) {
        val pl = planes(p)
        var acc = 0.0; var d = 0
        while (d < pl.length) {
          acc += v.getFloat(d).toDouble * pl(d); d += 1
        }
        if (acc > 0) bucket += (1L << p)
        p += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, _) => {
        val mat = ctx.addReferenceObj("planes", planes, "double[][]")
        val (bucket, p, pl, acc, d) = (ctx.freshName("bucket"),
          ctx.freshName("p"), ctx.freshName("pl"), ctx.freshName("acc"),
          ctx.freshName("d"))
        s"""
           |if ($a.numElements() < $minDim)
           |  throw new IllegalArgumentException(
           |    "lsh_bits: vector has " + $a.numElements() +
           |    " components, planes expect $minDim");
           |long $bucket = 0L;
           |for (int $p = 0; $p < $mat.length; $p++) {
           |  double[] $pl = $mat[$p];
           |  double $acc = 0.0;
           |  for (int $d = 0; $d < $pl.length; $d++) {
           |    $acc += (double) $a.getFloat($d) * $pl[$d];
           |  }
           |  if ($acc > 0) $bucket += (1L << $p);
           |}
           |${ev.value} = $bucket;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** dot_f64(a, b): dot product of two float64 vectors, folding in index
    * order (bit-identical to the flat-column left-assoc sum and the
    * oracle's list_sum). For pre-normalized double arrays where the
    * per-pair hot path must stay a tiny generated loop.
    */
  final case class DotF64(left: Expression, right: Expression)
      extends BinaryExpression {

    private def dblArray(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      if (dblArray(left.dataType) && dblArray(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_f64"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, dot, i) =
          (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Register cosine_f32 / dot_f32 / dot_f64 / argmin_sq / lsh_bits with
    * the session's function registry so SQL text and expr(...) can call
    * them. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(classOf[CosineF32].getName, "cosine_f32"),
      (exprs: Seq[Expression]) => CosineF32(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
      (exprs: Seq[Expression]) => DotF32(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "dot_f64"),
      (exprs: Seq[Expression]) => DotF64(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("argmin_sq"),
      new ExpressionInfo(classOf[ArgminSq].getName, "argmin_sq"),
      (exprs: Seq[Expression]) => ArgminSq(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("lsh_bits"),
      new ExpressionInfo(classOf[LshBits].getName, "lsh_bits"),
      (exprs: Seq[Expression]) => LshBits(exprs(0), exprs(1)))
  }
}
