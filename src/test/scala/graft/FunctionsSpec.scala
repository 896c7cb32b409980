package graft

import org.apache.spark.sql.functions._
import graft.functions.{FormatString, Vba, VectorExprs}

/** Specs for the VBA scalar pack + format-string engine. */
class FunctionsSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).collect().head.get(0)
  }

  test("financial closed forms match known values") {
    // textbook: pmt on 1000 at 1%/period over 12 periods = -88.8488
    val pmt = one(Vba.pmt(lit(0.01), lit(12.0), lit(1000.0)))
      .asInstanceOf[Double]
    assert(math.abs(pmt - (-88.84878867834167)) < 1e-9)
    val fv = one(Vba.fV(lit(0.01), lit(12.0), lit(-88.84878867834167),
      lit(1000.0))).asInstanceOf[Double]
    assert(math.abs(fv) < 1e-9, "paying the exact pmt amortizes to 0")
    val nper = one(Vba.nPer(lit(0.01), lit(-88.84878867834167),
      lit(1000.0))).asInstanceOf[Double]
    assert(math.abs(nper - 12.0) < 1e-9)
    // ipmt period 1 = full balance interest
    val ip = one(Vba.iPmt(lit(0.01), lit(1.0), lit(12.0), lit(1000.0)))
      .asInstanceOf[Double]
    assert(math.abs(ip - (-10.0)) < 1e-9)
  }

  test("irr and rate Newton solvers converge") {
    val irr = one(Vba.irrUdf(array(lit(-1000.0), lit(500.0), lit(500.0),
      lit(500.0)))).asInstanceOf[Double]
    // npv at solved rate must be ~0
    val npv = (1 to 3).map(i => 500.0 / math.pow(1 + irr, i)).sum - 1000.0
    assert(math.abs(npv) < 1e-6)
    val rate = one(Vba.rateUdf(lit(12.0), lit(-88.84878867834167),
      lit(1000.0))).asInstanceOf[Double]
    assert(math.abs(rate - 0.01) < 1e-9)
  }

  test("MIRR closed form matches the textbook value") {
    // classic example: flows [-120000, 39000, 30000, 21000, 37000,
    // 46000], finance 10%, reinvest 12% => MIRR ~ 12.61%
    val mirr = one(Vba.mIRR(
      array(lit(-120000.0), lit(39000.0), lit(30000.0), lit(21000.0),
        lit(37000.0), lit(46000.0)),
      lit(0.10), lit(0.12))).asInstanceOf[Double]
    assert(math.abs(mirr - 0.126094) < 1e-6, s"got $mirr")
  }

  test("VBA casts use banker's rounding; type names map to VB names") {
    assert(one(Vba.cInt(lit(2.5))) === 2)   // half to even
    assert(one(Vba.cInt(lit(3.5))) === 4)
    assert(one(Vba.cLng(lit(-2.5))) === -2L)
    assert(one(Vba.cStr(lit(42))) === "42")
    assert(one(Vba.cBool(lit(1))) === true)
    assert(String.valueOf(one(Vba.cCur(lit(1.23456)))) === "1.2346")
    import org.apache.spark.sql.types._
    assert(one(Vba.typeName(DoubleType)) === "Double")
    assert(one(Vba.typeName(StringType)) === "String")
    assert(one(Vba.typeName(IntegerType)) === "Integer")
    assert(one(Vba.typeName(DecimalType(19, 4))) === "Currency")
    assert(one(Vba.typeName(DateType)) === "Date")
  }

  test("time functions and IsDate behave like their VBA namesakes") {
    assert(one(Vba.timeSerial(lit(5), lit(7), lit(9))) === "05:07:09")
    assert(one(Vba.timeValue(lit("2010-03-04 13:14:15")
      .cast("timestamp"))) === "13:14:15")
    assert(one(Vba.timer(lit("2010-03-04 01:01:01").cast("timestamp")))
      === 3661)
    assert(one(Vba.isDate(lit("1995-01-05"))) === true)
    assert(one(Vba.isDate(lit("not a date"))) === false)
  }

  test("Format* family renders grouped, currency, percent, and date modes") {
    assert(one(Vba.formatNumber(lit(1234567.5), 2)) === "1,234,567.50")
    assert(one(Vba.formatCurrency(lit(1234.5), 2)) === "$1,234.50")
    assert(one(Vba.formatPercent(lit(0.125), 2)) === "12.50%")
    val ts = lit("2010-03-04 13:14:15").cast("timestamp")
    assert(one(Vba.formatDateTime(ts, 2)) === "3/4/2010")
    assert(one(Vba.formatDateTime(ts, 3)) === "1:14:15 PM")
    assert(one(Vba.formatDateTime(ts, 4)) === "13:14")
  }

  test("DateAdd/DateDiff cover the full VBA interval set") {
    val d = lit("2010-01-31").cast("date")
    assert(String.valueOf(one(Vba.dateAdd("q", 1, d))) === "2010-04-30")
    assert(String.valueOf(one(Vba.dateAdd("ww", 2, d))) === "2010-02-14")
    val ts = lit("2010-01-31 23:00:00").cast("timestamp")
    assert(String.valueOf(one(Vba.dateAdd("h", 5, ts)))
      .startsWith("2010-02-01 04:00"))
    assert(String.valueOf(one(Vba.dateAdd("n", 90, ts)))
      .startsWith("2010-02-01 00:30"))
    // VBA counts calendar boundaries crossed, not elapsed periods
    val a = lit("2010-12-31").cast("date")
    val b = lit("2011-01-01").cast("date")
    assert(one(Vba.dateDiff("yyyy", a, b)) === 1)
    assert(one(Vba.dateDiff("m", a, b)) === 1)
    assert(one(Vba.dateDiff("q", a, b)) === 1)
    assert(one(Vba.dateDiff("d", a, b)) === 1)
    val t0 = lit("2010-01-01 00:00:00").cast("timestamp")
    val t1 = lit("2010-01-01 00:01:30").cast("timestamp")
    assert(one(Vba.dateDiff("s", t0, t1)) === 90)
    assert(one(Vba.dateDiff("n", t0, t1)) === 1)
  }

  test("InStrRev finds the last occurrence (1-based)") {
    import spark.implicits._
    val df = Seq("abcabc", "xyz", "aaa").toDF("s")
    val got = df.select(Vba.inStrRev(col("s"), "a").as("p"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(4, 0, 3))
  }

  test("driver-side format matches the column formatter") {
    val v = BigDecimal("1234567.5")
    assert(FormatString.format(v, "#,##0.00") === "1,234,567.50")
    assert(FormatString.format(v, "$#,##0.00") === "$1,234,567.50")
    assert(FormatString.format(0.1234, "0.00%") === "12.34%")
    assert(FormatString.format(null, "#,##0.00") === "")
    assert(FormatString.format(java.sql.Date.valueOf("2010-03-04"),
      "dd.mm.yyyy") === "04.03.2010")
    import spark.implicits._
    val colV = Seq(1234567.5).toDF("x")
      .select(FormatString.toColumn(col("x").cast("decimal(12,2)"),
        "#,##0.00"))
      .collect().head.getString(0)
    assert(colV === "1,234,567.50")
  }

  test("Val / Str / Fix / Int VBA edge semantics") {
    import spark.implicits._
    val df = Seq("  12.5abc").toDF("s")
    assert(df.select(Vba.valOf(col("s"))).collect().head.getDouble(0)
      === 12.5)
    assert(one(Vba.fix(lit(-7.8))) === -7.0)
    assert(one(Vba.int(lit(-7.8))) === -8.0)
    assert(one(Vba.str(lit(5))).toString === " 5")
  }

  test("sign-section format strings pick the section by sign") {
    val fmt = "#,##0.00;(#,##0.00);-"
    assert(FormatString.format(1234.5, fmt) === "1,234.50")
    assert(FormatString.format(-1234.5, fmt) === "(1,234.50)")
    assert(FormatString.format(0, fmt) === "-")
    // two-section form: negatives use section 2, zero falls to positive
    assert(FormatString.format(-7.1, "0.0;0.0 CR") === "7.1 CR")
    assert(FormatString.format(0, "0.0;0.0 CR") === "0.0")
  }

  test("locale-aware formatting renders locale separators") {
    assert(FormatString.format(1234567.5, "#,##0.00") === "1,234,567.50")
    assert(FormatString.format(1234567.5, "#,##0.00",
      java.util.Locale.GERMANY) === "1.234.567,50")
    assert(FormatString.format(12.345, "0.00",
      java.util.Locale.GERMANY) === "12,34")
    assert(FormatString.format(12.345, "0.00") === "12.34")
  }

  test("cosine_f32 codegen expression matches the interpreted formula") {
    VectorExprs.register(spark)
    val emb = Tables.load(spark, Sf, "embeddings").limit(50)
    val pairs = emb.as("a").join(emb.as("b"),
      col("a.vec_id") < col("b.vec_id"))
    val both = pairs.select(
      expr("cosine_f32(a.embedding, b.embedding)").as("fast"),
      expr(graft.ops.DedupOps.cosineExpr("a.embedding", "b.embedding"))
        .as("slow"))
    both.collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
    }
    // the custom expression stays inside whole-stage codegen (the
    // interpreted HOF comparison column above would force its project
    // out of codegen, so check a fast-only plan)
    val fastOnly = pairs.select(
      expr("cosine_f32(a.embedding, b.embedding)").as("fast"))
    fastOnly.collect()
    val plan = fastOnly.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[cosine_f32".r.findFirstIn(plan)
      .isDefined, s"expected codegen'd cosine_f32 project in:\n$plan")
    // type misuse is an analysis error, not a runtime crash
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      emb.select(expr("cosine_f32(vec_id, embedding)")).collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("collect_capped gathers under the cap and nulls hot groups " +
      "across partial/merge boundaries") {
    graft.functions.CollectCapped.register(spark)
    // 8 input partitions force map-side partials + reducer merges —
    // both update() and merge() paths run
    val df = spark.range(0, 700)
      .select((col("id") % 7).as("g"), col("id")).repartition(8)
    // cap far above the 100-element groups: content must equal
    // collect_list's (order-insensitive)
    val got = df.groupBy("g")
      .agg(expr("collect_capped(id, 1000)").as("xs"),
        collect_list(col("id")).as("ref"))
      .collect()
    assert(got.length === 7)
    got.foreach { r =>
      assert(r.getSeq[Long](1).sorted === r.getSeq[Long](2).sorted)
    }
    // cap below every group size: all groups overflow to NULL (dropped
    // for heat ≠ empty)
    val hot = df.groupBy("g")
      .agg(expr("collect_capped(id, 99)").as("xs")).collect()
    assert(hot.forall(_.isNullAt(1)))
    // cap exactly at group size: survives intact
    val atCap = df.groupBy("g")
      .agg(expr("collect_capped(id, 100)").as("xs")).collect()
    assert(atCap.forall(_.getSeq[Long](1).length === 100))
    // struct payloads round-trip the serializer (the jaccard use)
    val structs = df.groupBy("g")
      .agg(expr("collect_capped(struct(id, g), 1000)").as("ps"))
      .collect()
    structs.foreach { r =>
      val rows = r.getSeq[org.apache.spark.sql.Row](1)
      assert(rows.length === 100)
      assert(rows.forall(_.getLong(1) === r.getLong(0)))
    }
    // a non-foldable or absurd cap is an analysis error
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("g").agg(expr("collect_capped(id, 0)")).collect()
    }
    assert(bad.getMessage.contains("cap"))
  }
}
