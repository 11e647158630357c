package graft.wells

/** Typed records of the oil-wells domain (reference: dataclasses at
  * pdf_extraction.py:241-272, DDL at pdf_to_db.py:163-198).
  *
  * Everything is string-typed at the extract boundary — the reference keeps
  * numeric-looking stimulation fields as VARCHAR, and golden parity demands
  * we do too. The load stage adds the one typed pair: DECIMAL(12,9) lat/lon.
  */
final case class HeaderRow(
    pdf_name: String,
    operator: Option[String] = None,
    well_name: Option[String] = None,
    api: Option[String] = None,
    enseco_job: Option[String] = None,
    job_type: Option[String] = None,
    county_state: Option[String] = None,
    shl: Option[String] = None,
    latitude: Option[Double] = None,
    longitude: Option[Double] = None,
    datum: Option[String] = None)

final case class StimRow(
    pdf_name: String,
    date_simulated: Option[String] = None,
    stimulated_formation: Option[String] = None,
    type_treatment: Option[String] = None,
    acid_pct: Option[String] = None,
    lbs_proppant: Option[String] = None,
    top_ft: Option[String] = None,
    bottom_ft: Option[String] = None,
    stimulation_stages: Option[String] = None,
    volume: Option[String] = None,
    volume_units: Option[String] = None,
    max_pressure_psi: Option[String] = None,
    max_treatment_rate_bbls_min: Option[String] = None,
    stimulated_in: Option[String] = None,
    details: Option[String] = None)

object Model {
  /** CSV column order of the extract sink (dataclass field order,
    * pdf_extraction.py:241-253; S5 fixed-order DictWriter). */
  val headerCols: Seq[String] = Seq("pdf_name", "operator", "well_name", "api",
    "enseco_job", "job_type", "county_state", "shl", "latitude", "longitude", "datum")

  val stimCols: Seq[String] = Seq("pdf_name", "date_simulated",
    "stimulated_formation", "type_treatment", "acid_pct", "lbs_proppant",
    "top_ft", "bottom_ft", "stimulation_stages", "volume", "volume_units",
    "max_pressure_psi", "max_treatment_rate_bbls_min", "stimulated_in", "details")

  /** DB-side stim columns: `stimulated_in` exists in the CSV/dataclass but
    * not in the DDL (pdf_to_db.py:179-197) — dropped at load. */
  val stimDbCols: Seq[String] = stimCols.filterNot(_ == "stimulated_in")

  /** Scraped attribute columns (web_scraping.py:65 OUT_COLS minus keys). */
  val scrapeCols: Seq[String] =
    Seq("well_status", "well_type", "closest_city", "oil_badge", "gas_badge")
}
