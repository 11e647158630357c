package graft.wells

import org.scalatest.funsuite.AnyFunSuite

/** Extraction-stage fixtures (FIXTURES.md §3): one per parse branch of the
  * reference extractor. */
class ExtractionSpec extends AnyFunSuite {
  import Extraction._

  private val hdrLabeled = Seq(
    """Well Operator: NANCE PETROLEUM CORPORATION
      |Well Name: THORVALD 1-30H
      |API # 33-053-06057
      |Enseco Job# S15072-02
      |Job Type: Frac Support
      |County, State: McKenzie, ND
      |Well Surface Hole Location (SHL): Lot 3, Sec. 30
      |Latitude: 48° 4' 29.5" N
      |Longitude: 103° 36' 11.4" W
      |Datum: NAD83""".stripMargin,
    "page two filler")

  test("hdr-labeled: full labeled header parses") {
    val h = parseHeader(hdrLabeled, "W1.pdf")
    assert(h.operator.contains("NANCE PETROLEUM CORPORATION"))
    assert(h.well_name.contains("THORVALD 1-30H"))
    assert(h.api.contains("33-053-06057"))
    assert(h.enseco_job.contains("S15072-02"))
    assert(h.job_type.contains("Frac Support"))
    assert(h.county_state.contains("McKenzie, ND"))
    assert(h.shl.contains("Lot 3, Sec. 30"))
    assert(h.latitude.exists(v => math.abs(v - (48 + 4 / 60.0 + 29.5 / 3600.0)) < 1e-9))
    assert(h.longitude.exists(v => math.abs(v + (103 + 36 / 60.0 + 11.4 / 3600.0)) < 1e-9))
    assert(h.datum.contains("NAD83"))
  }

  test("hdr-decimal-hemisphere: plain decimals with hemisphere") {
    val h = parseHeader(Seq("Latitude: 48.0744\nLongitude: 103.73 W"), "W2.pdf")
    assert(h.latitude.contains(48.0744))
    assert(h.longitude.contains(-103.73))
  }

  test("hdr-api-variants normalize") {
    for (v <- Seq("API No. 3305306057", "Well File No: 33-053-06057", "API # 33 - 053 - 06057")) {
      val h = parseHeader(Seq(v), "W3.pdf")
      assert(h.api.contains("33-053-06057"), s"for '$v'")
    }
  }

  test("header reads only pages 1-2") {
    val h = parseHeader(Seq("page one", "page two", "Operator: HIDDEN ON PAGE 3"), "W4.pdf")
    assert(h.operator.isEmpty)
  }

  private val stimTable = Seq("p1", "p2",
    """Treatment Summary
      |Date Stimulated  Stimulated Formation  Top (Ft)  Bottom (Ft)  Stimulation Stages  Volume  Volume Units
      |9/7/2013  Bakken  11117  21122  36  90,354  Barrels
      |""".stripMargin)

  test("stim-table-row: 7-column fast path with clean_num") {
    val s = parseStimulation(stimTable, "W5.pdf")
    assert(s.date_simulated.contains("9/7/2013"))
    assert(s.stimulated_formation.contains("Bakken"))
    assert(s.top_ft.contains("11117"))
    assert(s.bottom_ft.contains("21122"))
    assert(s.stimulation_stages.contains("36"))
    assert(s.volume.contains("90354")) // comma stripped
    assert(s.volume_units.contains("Barrels"))
  }

  private val stimLabels = Seq("p1", "p2",
    """Date Stimulated
      |9/7/2013
      |Stimulated Formation
      |Middle Bakken
      |Lbs Proppant
      |3765029
      |Maximum Treatment Pressure (PSI)
      |9679
      |Maximum Treatment Rate (BBLS/Min)
      |39.7
      |Volume
      |90354
      |Volume Units
      |Barrels""".stripMargin)

  test("stim-label-nextline: label/value pairs via fallback chains") {
    val s = parseStimulation(stimLabels, "W6.pdf")
    assert(s.date_simulated.contains("9/7/2013"))
    assert(s.stimulated_formation.contains("Middle Bakken"))
    assert(s.lbs_proppant.contains("3765029"))
    assert(s.max_pressure_psi.contains("9679"))
    assert(s.max_treatment_rate_bbls_min.contains("39.7"))
    assert(s.volume.contains("90354"))
    assert(s.volume_units.contains("Barrels"))
  }

  test("stim-top-bot-stage-combined: 3-group rescue fills missing") {
    val s = parseStimulation(Seq("p1", "p2",
      "Top (Ft) Bottom (Ft) Stimulation Stages\n11117 21122 36"), "W7.pdf")
    assert(s.top_ft.contains("11117"))
    assert(s.bottom_ft.contains("21122"))
    // Faithful reference quirk: value_inline's \s* crosses the newline, so
    // the "Stimulation Stages" label captures the whole numbers line and
    // clean_num concatenates it; the 3-group rescue only fills top/bottom
    // (their inline captures cleaned to ""). Preserve verbatim, do NOT fix.
    assert(s.stimulation_stages.contains("111172112236"))
  }

  test("stim-details: next-line capture with <400-char guard") {
    val s = parseStimulation(Seq("p1", "p2", "Details\nSand frac with X\nsecond line"), "W8.pdf")
    assert(s.details.contains("Sand frac with X"))
    val long = "x" * 400
    val s2 = parseStimulation(Seq("p1", "p2", s"Details\n$long"), "W9.pdf")
    assert(s2.details.isEmpty)
  }

  test("short-doc: stimulation falls back to full text; header uses all pages") {
    val s = parseStimulation(Seq("Lbs Proppant\n12345"), "W10.pdf")
    assert(s.lbs_proppant.contains("12345"))
    val h = parseHeader(Seq("Operator: SOLO"), "W10.pdf")
    assert(h.operator.contains("SOLO"))
  }

  test("blank-doc detection") {
    assert(isBlankDoc(Seq("", "   ", "\t\n")))
    assert(!isBlankDoc(Seq("", "x")))
  }

  test("unicode-noise: norm applied inside DMS parse") {
    val h = parseHeader(Seq("Latitude: 48º 4’ 29.5” N"), "W11.pdf")
    assert(h.latitude.exists(v => math.abs(v - (48 + 4 / 60.0 + 29.5 / 3600.0)) < 1e-9))
  }

  test("stim page-slicing: pages 3+ win over pages 1-2") {
    val s = parseStimulation(Seq("Lbs Proppant\n111", "p2", "Lbs Proppant\n999"), "W12.pdf")
    assert(s.lbs_proppant.contains("999"))
  }
}
