package graft.wells

import org.scalatest.funsuite.AnyFunSuite

/** S7 stitcher semantics (FIXTURES.md §2a). */
class CsvRepairSpec extends AnyFunSuite {
  import CsvRepair._

  test("commasOutsideQuotes ignores quoted commas") {
    assert(commasOutsideQuotes("a,b,c") == 2)
    assert(commasOutsideQuotes("a,\"b,c\",d") == 2)
    assert(commasOutsideQuotes("\"a,b\"") == 0)
  }

  test("continuation lines stitch with literal backslash-n") {
    val lines = Vector(
      "pdf_name,date,details",
      "W99901.pdf,01/01/2015,first line of details",
      "this is a continuation line without commas",
      "W99902.pdf,02/02/2015,normal row")
    val out = repairLines(lines)
    // W99901's row already has enough commas → flushed immediately; the
    // continuation line then precedes no open row and is dropped — exactly
    // the reference's behavior for complete rows.
    assert(out == Vector(
      "pdf_name,date,details",
      "W99901.pdf,01/01/2015,first line of details",
      "W99902.pdf,02/02/2015,normal row"))
  }

  test("incomplete row absorbs continuation until comma count reached") {
    val lines = Vector(
      "pdf_name,date,details",
      "W99901.pdf,01/01/2015", // one comma short
      "spilled detail line,end",
      "W99902.pdf,02/02/2015,ok")
    val out = repairLines(lines)
    assert(out == Vector(
      "pdf_name,date,details",
      "W99901.pdf,01/01/2015\\nspilled detail line,end",
      "W99902.pdf,02/02/2015,ok"))
  }

  test("stray lines before any row start are dropped") {
    val lines = Vector(
      "pdf_name,date,details",
      "stray line that precedes any valid row start",
      "W99902.pdf,02/02/2015,normal row")
    assert(repairLines(lines) ==
      Vector("pdf_name,date,details", "W99902.pdf,02/02/2015,normal row"))
  }

  test("shipped golden stim CSV passes through unchanged (already clean)") {
    val src = scala.io.Source.fromFile("/root/reference/well_stimulation.csv", "UTF-8")
    val text = try src.mkString finally src.close()
    val repaired = repairText(text)
    val origLines = text.split("\r?\n", -1).toIndexedSeq.filter(_.nonEmpty)
    assert(repaired.split("\n", -1).length == origLines.length)
  }
}
