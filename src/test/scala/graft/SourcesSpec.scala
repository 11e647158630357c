package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink round-trips (SURVEY §2.1): every interchange format the
  * engine reads or writes preserves schema and values. */
class SourcesSpec extends AnyFunSuite with SparkSpec {

  private lazy val sample = spark.read
    .parquet("/root/testdata/sf0.001/orders.parquet")
    .withColumn("o_orderdate", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
    .limit(100).cache()

  test("csv round-trip preserves rows (header + explicit schema read-back)") {
    val dir = Files.createTempDirectory("io").toString + "/csv"
    sample.coalesce(1).write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(sample.schema).csv(dir)
    assert(back.count() == 100)
    assert(back.exceptAll(sample).count() == 0)
  }

  test("json lines round-trip preserves rows") {
    val dir = Files.createTempDirectory("io").toString + "/json"
    sample.write.json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.exceptAll(sample).count() == 0)
  }

  test("parquet round-trip preserves schema exactly") {
    val dir = Files.createTempDirectory("io").toString + "/pq"
    sample.write.parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema == sample.schema)
    assert(back.exceptAll(sample).count() == 0)
  }

  test("binaryFile source reads blobs with path metadata") {
    val dir = Files.createTempDirectory("bin")
    Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    val df = spark.read.format("binaryFile").load(dir.toString)
    val row = df.select("path", "length").collect()(0)
    assert(row.getAs[String]("path").endsWith("a.bin"))
    assert(row.getAs[Long]("length") == 3L)
  }
}
