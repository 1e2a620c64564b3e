package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The VecFusion optimizer rule: declarative HOF dot products are rewritten
  * to the native expression, with identical results.
  */
class VecFusionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val extSession: SparkSession = {
    val _ = spark
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder()
      .master("local[2]")
      .appName("graft-vecfusion-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
    lit(0.0), (acc, v) => acc + v)

  test("rule rewrites aggregate(zip_with(*)) over float arrays to vec_dot") {
    // parquet-backed input so constant folding can't evaluate the whole
    // expression away before we inspect the optimized plan
    val e = Tables.embeddings(extSession, SparkTestSession.sf)
    val df = e.as("p").join(e.as("q"), col("p.vec_id") < col("q.vec_id"))
      .select(col("p.embedding").as("a"), col("q.embedding").as("b"))
      .select(hofDot.as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val fused = optimized.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.FloatVecDot]))
    assert(fused, s"expected FloatVecDot in:\n$optimized")
    // spot value: dot of a vector with itself = |v|^2 > 0
    import extSession.implicits._
    val self = Seq(0).toDF("z").crossJoin(e.limit(1))
      .select(col("embedding").as("a"), col("embedding").as("b"))
      .select(hofDot.as("d")).collect()(0).getDouble(0)
    assert(self > 0.0)
  }

  test("rule rewrites sqrt(aggregate(transform(x*x))) to vec_norm") {
    val hofNorm = sqrt(aggregate(
      transform(col("embedding"), x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val df = Tables.embeddings(extSession, SparkTestSession.sf)
      .select(hofNorm.as("n"))
    val fused = df.queryExecution.optimizedPlan.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.FloatVecNorm]))
    assert(fused, s"expected FloatVecNorm in:\n${df.queryExecution.optimizedPlan}")
    assert(df.collect().forall(_.getDouble(0) > 0.0))
  }

  test("rule leaves non-matching shapes alone (double arrays, different fold)") {
    import extSession.implicits._
    // double arrays: not the float fast-path shape — must stay a HOF plan
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v).as("d"))
    val fused = df.queryExecution.optimizedPlan.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.FloatVecDot]))
    assert(!fused)
    assert(df.collect()(0).getDouble(0) == 11.0)
  }

  test("fused dot preserves HOF null semantics (length mismatch, null element)") {
    // Non-foldable arrays (derived from a column) so the rule rewrites and
    // the codegen'd null paths execute, instead of constant folding.
    def vals(s: SparkSession): Seq[Any] = {
      import s.implicits._
      Seq("ab").toDF("s").select(
        expr("array(cast(length(s) as float), cast(2 as float))").as("a"),
        expr("array(cast(length(s) as float))").as("b"),
        expr("array(cast(length(s) as float), cast(if(length(s) > 0, null, 1) as float))").as("c"))
        .select(
          aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (acc, v) => acc + v).as("len_mismatch"),
          aggregate(zip_with(col("a"), col("c"), (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (acc, v) => acc + v).as("null_elem"),
          sqrt(aggregate(transform(col("c"), x => x.cast("double") * x.cast("double")),
            lit(0.0), (acc, v) => acc + v)).as("null_norm"),
          aggregate(zip_with(col("a"), col("a"), (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (acc, v) => acc + v).as("wellformed"))
        .collect()(0).toSeq
    }
    val fused = vals(extSession) // rewritten to FloatVecDot / FloatVecNorm
    val plain = vals(spark)      // stock HOF evaluation
    assert(fused == plain, s"fused $fused != plain $plain")
    assert(fused.take(3).forall(_ == null), s"malformed inputs must be NULL: $fused")
    assert(fused(3) == 8.0) // 2*2 + 2*2
  }

  test("vec_dot/vec_norm SQL functions return NULL on malformed input") {
    val r = extSession.sql(
      """SELECT
        |  vec_dot(array(cast(1 as float)), array(cast(1 as float), cast(2 as float))) AS d,
        |  vec_norm(array(cast(null as float))) AS n,
        |  vec_dot(array(cast(2 as float)), array(cast(3 as float))) AS ok
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) == 6.0)
  }

  test("simhash rejects unsupported argument shapes with AnalysisException") {
    import org.apache.spark.sql.AnalysisException
    val e1 = intercept[AnalysisException] {
      extSession.sql("SELECT simhash(array('a'), 'not-an-int')").collect()
    }
    assert(e1.getMessage.contains("simhash expects"), e1.getMessage)
    val e2 = intercept[AnalysisException] {
      extSession.sql("SELECT simhash(array('a'), 4, 5)").collect()
    }
    assert(e2.getMessage.contains("simhash expects"), e2.getMessage)
    // INT literal outside [1,28]: AnalysisException, not the require() blowup
    val e3 = intercept[AnalysisException] {
      extSession.sql("SELECT simhash(array('a'), 29)").collect()
    }
    assert(e3.getMessage.contains("simhash expects"), e3.getMessage)
    // valid literal widths still work
    assert(extSession.sql("SELECT simhash(array('a'), 12)").collect()(0).getLong(0) >= 0L)
  }

  test("fused and unfused agree on fixture embeddings") {
    val e = Tables.embeddings(extSession, SparkTestSession.sf).limit(50)
    val pairs = e.as("p").join(e.as("q"),
      col("p.vec_id") === col("q.vec_id") - 1)
      .select(col("p.embedding").as("a"), col("q.embedding").as("b"))
    val fused = pairs.select(round(hofDot, 9).as("d")) // rule rewrites this
      .collect().map(_.getDouble(0)).toSeq
    // reference: same arithmetic on the no-extensions session
    val pairsRef = {
      val er = Tables.embeddings(spark, SparkTestSession.sf).limit(50)
      er.as("p").join(er.as("q"), col("p.vec_id") === col("q.vec_id") - 1)
        .select(col("p.embedding").as("a"), col("q.embedding").as("b"))
        .select(round(hofDot, 9).as("d")).collect().map(_.getDouble(0)).toSeq
    }
    assert(fused == pairsRef)
  }
}
