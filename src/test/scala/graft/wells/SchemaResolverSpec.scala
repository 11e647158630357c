package graft.wells

import org.scalatest.funsuite.AnyFunSuite

/** F18/F19 schema resolution on adversarial headers (the shapes the
  * reference's alias/hint lists exist for). */
class SchemaResolverSpec extends AnyFunSuite {
  import SchemaResolver._

  test("keys normalize: BOM, case, spaces") {
    assert(normalizeKey("﻿Pdf Name ") == "pdf_name")
    assert(normalizeKey("  Well Name") == "well_name")
    assert(normalizeKey("API") == "api")
  }

  test("pdf aliases promote to pdf_name (first alias wins)") {
    assert(resolve(Seq("pdf", "operator")).map(_._2) == Seq("pdf_name", "operator"))
    assert(resolve(Seq("FileName", "x")).map(_._2) == Seq("pdf_name", "x"))
    assert(resolve(Seq("PDFName", "x")).map(_._2) == Seq("pdf_name", "x"))
    // existing pdf_name is never displaced
    assert(resolve(Seq("pdf_name", "pdf")).map(_._2) == Seq("pdf_name", "pdf"))
  }

  test("lat/lon resolution: exact name beats hint, hints catch variants") {
    assert(findColName(Seq("Lat (DEC)", "Latitude"), "lat").contains("Latitude"))
    assert(findColName(Seq("Y (Lat)", "other"), "lat").contains("Y (Lat)"))
    assert(findColName(Seq("X (Lon)", "LNG"), "lon").contains("X (Lon)"))
    assert(findColName(Seq("Long", "a"), "lon").contains("Long"))
    assert(findColName(Seq("nothing", "here"), "lat").isEmpty)
  }

  test("hint resolution works through a full loadHeader with odd names") {
    val spark = graft.SparkSpec.session
    val dir = java.nio.file.Files.createTempDirectory("odd")
    java.nio.file.Files.writeString(dir.resolve("h.csv"),
      "PDF,Operator,Y (Lat),X (Lon)\nW1.pdf,ACME,48.1,−103.5\n")
    val load = Loader.loadHeader(spark, dir.resolve("h.csv").toString)
    assert(load.stats == Loader.HeaderStats(1, 0, 0, 0, 0))
    val row = load.cleaned.selectExpr("pdf_name",
      "CAST(latitude AS DOUBLE)", "CAST(longitude AS DOUBLE)").collect()(0)
    assert(row.getString(0) == "W1.pdf")
    assert(row.getDouble(1) == 48.1)
    assert(row.getDouble(2) == -103.5) // unicode minus handled
    load.release()
  }
}
