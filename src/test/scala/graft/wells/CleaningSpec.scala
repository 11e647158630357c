package graft.wells

import org.scalatest.funsuite.AnyFunSuite

/** F-bank unit + property tests. Fixture values are harvested from the
  * reference's shipped CSVs (FIXTURES.md §1-2) — every dirty shape the
  * golden corpus actually contains. (Randomized properties live in
  * [[CleaningProps]] — the scalatest/scalacheck bridge artifact is not in
  * the offline cache, so properties use ScalaCheck's own runner.) */
class CleaningSpec extends AnyFunSuite {
  import Cleaning._

  // ----------------------------------------------------------------- F1
  test("normStr maps unicode punctuation and collapses spaces") {
    assert(normStr("48º  4’ \t29.5”") == "48° 4' 29.5\"")
    assert(normStr("a — b – c · d") == "a - b - c . d")
    assert(normStr("  leading and   trailing  ") == "leading and trailing")
    assert(normStr("") == "")
    assert(normStr(null) == "")
  }

  test("normStr preserves newlines (only space/tab collapse)") {
    assert(normStr("a\nb") == "a\nb")
  }

  // ----------------------------------------------------------------- F3
  test("cleanNumStr strips everything but digits and dot") {
    assert(cleanNumStr("90,354") == "90354")
    assert(cleanNumStr("$1,234.56 kg") == "1234.56")
    assert(cleanNumStr("-42") == "42") // effective clean_num strips '-' too
    assert(cleanNumStr("Barrels") == null)
    assert(cleanNumStr("") == null)
    assert(cleanNumStr(null) == null)
  }

  test("cleanNumStr output is empty-or-numeric-chars (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val s = rnd.nextString(rnd.nextInt(30))
      val r = cleanNumStr(s)
      assert(r == null || r.matches("[\\d.]+"), s"for ${s.toList}")
    }
  }

  // ----------------------------------------------------------------- F4
  test("dmsToDecimal parses DMS with hemisphere") {
    val lat = dmsToDecimal("48° 4' 29.5\" N").get
    assert(math.abs(lat - (48 + 4 / 60.0 + 29.5 / 3600.0)) < 1e-9)
    val lon = dmsToDecimal("103° 36' 11.4\" W").get
    assert(lon < 0 && math.abs(lon + (103 + 36 / 60.0 + 11.4 / 3600.0)) < 1e-9)
  }

  test("dmsToDecimal parses plain decimal with hemisphere suffix") {
    assert(dmsToDecimal("103.73 W").contains(-103.73))
    assert(dmsToDecimal("48.0744").contains(48.0744))
    assert(dmsToDecimal("S 10.5").contains(-10.5))
    assert(dmsToDecimal("-12.25").contains(-12.25))
  }

  test("dmsToDecimal rejects garbage") {
    assert(dmsToDecimal("no coords here").isEmpty)
    assert(dmsToDecimal("").isEmpty)
    assert(dmsToDecimal(null).isEmpty)
  }

  test("dmsToDecimal round-trips synthesized DMS within epsilon (seeded sweep)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val deg = rnd.nextInt(90); val min = rnd.nextInt(60); val sec = rnd.nextInt(60)
      val s = s"""$deg° $min' $sec" W"""
      val expected = -(deg + min / 60.0 + sec / 3600.0)
      val got = dmsToDecimal(s)
      assert(got.isDefined && math.abs(got.get - expected) < 1e-9, s"for $s")
    }
  }

  // ----------------------------------------------------------------- F5
  test("normalizeApi reformats all separator variants") {
    assert(normalizeApi("3305306057") == "33-053-06057")
    assert(normalizeApi("33-053-06057") == "33-053-06057")
    assert(normalizeApi("33 - 053 - 06057") == "33-053-06057")
    assert(normalizeApi("API weird") == "APIweird") // passthrough stripped
    assert(normalizeApi("") == null)
    assert(normalizeApi(null) == null)
  }

  // ----------------------------------------------------------------- F6/F7
  test("valueInline captures same-line value after label") {
    assert(valueInline("Operator", "Operator: NANCE PETROLEUM") == "NANCE PETROLEUM")
    assert(valueInline("Volume", "Volume Units\nBarrels") == "Units")
    assert(valueInline("Missing", "nothing here") == null)
  }

  test("valueNextLine takes first non-empty following line") {
    assert(valueNextLine("Lbs\\s*Proppant", "Lbs Proppant\n3765029") == "3765029")
    assert(valueNextLine("Volume\\s*Units", "Volume Units\n\n  Barrels ") == "Barrels")
    assert(valueNextLine("Label", "Label trailing text\nvalue") == null) // label must end the line
  }

  // ----------------------------------------------------------------- F8
  test("valueAfter numlike finds the first numeric token same-or-next line") {
    assert(valueAfter("Pressure", "Pressure (PSI)  9679 psi", numlike = true) == "9679")
    assert(valueAfter("Pressure", "Pressure\n8403", numlike = true) == "8403")
    assert(valueAfter("Pressure", "Pressure\nno digits", numlike = true) == null)
  }

  // ----------------------------------------------------------------- F17
  test("toDecimal12_9 null tokens and blanks") {
    for (s <- Seq(null, "", "  ", "na", "N/A", "NULL", "none"))
      assert(toDecimal12_9(s) == null, s"for '$s'")
  }

  test("toDecimal12_9 unicode minus and separators") {
    assert(toDecimal12_9("−103.602808").doubleValue() == -103.602808)
    assert(toDecimal12_9("48.1").doubleValue() == 48.1)
    assert(toDecimal12_9("1,234.5") == null) // > DECIMAL(12,9) bound → null
    assert(toDecimal12_9("\"48.02492\"").doubleValue() == 48.02492)
  }

  test("toDecimal12_9 DMS branch signs from degrees only") {
    val v = toDecimal12_9("-103° 36' 11.4\"")
    assert(math.abs(v.doubleValue() + (103 + 36 / 60.0 + 11.4 / 3600.0)) < 1e-6)
    // F4-vs-F17 non-interchangeability: hemisphere letters are NOT handled here
    assert(toDecimal12_9("103.73 W") == null)
    assert(dmsToDecimal("103.73 W").contains(-103.73))
  }

  test("toDecimal12_9 scale is 9") {
    assert(toDecimal12_9("48.1").scale() == 9)
  }

  // ----------------------------------------------------------------- F9
  test("firstBlockAfter stops at blank line or rule") {
    val t = "Details\nline one\nline two\n\nafter blank"
    assert(firstBlockAfter("Details", t) == "line one\nline two")
    val t2 = "Details\nkept\n----\ndropped"
    assert(firstBlockAfter("Details", t2) == "kept")
  }

  test("toDecimal12_9 strips repeated edge quotes like Python strip") {
    assert(toDecimal12_9("\"\"-102.5\"\"").doubleValue() == -102.5)
    assert(toDecimal12_9("''48.1''").doubleValue() == 48.1)
    // strip('"') runs BEFORE strip("'"), so quotes nested inside single
    // quotes survive, fail the parse, and null out — same as the reference
    assert(toDecimal12_9("'\"48.1\"'") == null)
  }
}
