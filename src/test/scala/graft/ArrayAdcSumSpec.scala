package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ArrayAdcSum.array_adc_sum

/** Bit-parity proof for the codegen'd ADC kernel
  * ([[graft.functions.ArrayAdcSum]]) against the HOF reference form
  * it replaced in `sim/Pq.scala` — over the FULL sf0.001 embeddings
  * corpus on both LUT shapes (double production / bigint pinned
  * twin), plus the null-semantics contract. */
class ArrayAdcSumSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** The HOF form the kernel replaces (verbatim from Pq.adcSumExpr). */
  private def hof(zero: String): String =
    s"""aggregate(zip_with(codes, lut, (c, l) ->
          element_at(l, cast(c AS int) + 1)),
        cast($zero), (acc, x) -> acc + x)"""

  /** Full corpus with in-contract codes (m=8, values in [0,16)) and a
    * deterministic per-row LUT — every (row, j, c) cell distinct. */
  private lazy val fixture = Tables.embeddings(spark, sf0001)
    .withColumn("q8", graft.sim.Quantize.q8Codes(col("embedding"), 64))
    .withColumn("codes",
      expr("transform(slice(q8, 1, 8), x -> cast(pmod(x, 16) AS tinyint))"))
    .withColumn("lut_l", expr(
      """transform(sequence(0, 7), j ->
           transform(sequence(0, 15), c ->
             (vec_id * 31 + j * 17 + c * 7) % 1000 - 500))"""))
    .withColumn("lut_d", expr(
      """transform(lut_l, r -> transform(r, x ->
           cast(x AS double) / 16.0))"""))

  test("double kernel matches the HOF fold bit-for-bit on the full corpus") {
    val both = fixture
      .withColumn("lut", col("lut_d"))
      .select(array_adc_sum(col("codes"), col("lut")).as("fast"),
        expr(hof("0.0 AS double")).as("ref"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    assert(both.forall { case (f, r) => f == r })   // exact, not approx
  }

  test("bigint kernel matches the HOF fold on the full corpus") {
    val both = fixture
      .withColumn("lut", col("lut_l"))
      .select(array_adc_sum(col("codes"), col("lut")).as("fast"),
        expr(hof("0 AS bigint")).as("ref"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    assert(both.forall { case (f, r) => f == r })
  }

  test("flat row-major LUT (the hot-path shape) matches the nested " +
      "kernel and the HOF fold bit-for-bit, double and bigint") {
    val withFlat = fixture
      .withColumn("lut_fd", flatten(col("lut_d")))
      .withColumn("lut_fl", flatten(col("lut_l")))
    val d = withFlat
      .select(array_adc_sum(col("codes"), col("lut_fd")).as("flat"),
        array_adc_sum(col("codes"), col("lut_d")).as("nested"),
        expr(hof("0.0 AS double").replace("lut", "lut_d")).as("ref"))
      .as[(Double, Double, Double)].collect()
    assert(d.nonEmpty && d.forall { case (f, n, r) => f == n && n == r })
    val l = withFlat
      .select(array_adc_sum(col("codes"), col("lut_fl")).as("flat"),
        array_adc_sum(col("codes"), col("lut_l")).as("nested"))
      .as[(Long, Long)].collect()
    assert(l.forall { case (f, n) => f == n })
  }

  test("flat null semantics: length not a multiple of m, out-of-range " +
      "code, null cell all yield null") {
    val rows = Seq(
      (Some(Seq[Byte](0, 1)), Some(Seq(1.0, 2.0, 3.0))),     // 3 % 2 != 0
      (Some(Seq[Byte](0, 2)), Some(Seq(1.0, 2.0, 3.0, 4.0))), // c >= ksub
      (Some(Seq[Byte](1, 0)), Some(Seq(10.0, 20.0, 30.0, 40.0)))) // valid
      .toDF("codes", "lut")
      .select(array_adc_sum(col("codes"), col("lut"))).collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 20.0 + 30.0)
  }

  test("smallint codes accepted; hand-computed lookup") {
    val df = Seq((Seq[Short](1, 0), Seq(Seq(10.0, 20.0), Seq(30.0, 40.0))))
      .toDF("codes", "lut")
    assert(df.select(array_adc_sum(col("codes"), col("lut")))
      .as[Double].head() == 20.0 + 30.0)
  }

  test("null semantics: null input, length mismatch, null element, " +
      "out-of-range code all yield null") {
    val lut = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0))
    val rows = Seq(
      (None: Option[Seq[Byte]], Some(lut)),               // null codes
      (Some(Seq[Byte](0)), None: Option[Seq[Seq[Double]]]), // null lut
      (Some(Seq[Byte](0)), Some(lut)),                    // len mismatch
      (Some(Seq[Byte](0, 5)), Some(lut)),                 // code >= ksub
      (Some(Seq[Byte](0, -1)), Some(lut)),                // negative code
      (Some(Seq[Byte](1, 1)), Some(lut)))                 // valid control
      .toDF("codes", "lut")
      .select(array_adc_sum(col("codes"), col("lut"))).collect()
    assert(rows.take(5).forall(_.isNullAt(0)))
    assert(rows(5).getDouble(0) == 2.0 + 4.0)
  }

  test("SQL registration (session + extensions class)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT array_adc_sum(
           array(CAST(1 AS TINYINT), CAST(0 AS TINYINT)),
           array(array(1L, 2L), array(3L, 4L))) AS s""")
      .as[Long].head()
    assert(r == 2L + 3L)
    new graft.functions.GraftExtensions()
  }
}
