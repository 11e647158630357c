package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("quantized_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT quantized_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect()(0).getLong(0)
    assert(r == 32L)
  }

  test("quantized_dot rejects non-bigint arrays with a typed error") {
    GraftExtensions.register(spark)
    val typeErr = intercept[Exception] {
      spark.sql("SELECT quantized_dot(array(1.5), array(2.5))").collect()
    }
    assert(typeErr.getMessage.contains("array<bigint>"))
  }
}
