package graft.wells

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The serving query behind `/wells` (reference: app.py:15-31; SURVEY.md
  * §3.3, J1/P2/P4) plus the map client's coordinate-rescue view (P8/F24).
  *
  * `SELECT wi.*, ws.*` in the reference passes through a dict cursor that
  * collapses the duplicate pdf_name key — last one (ws) wins. Since for
  * matched rows wi.pdf_name == ws.pdf_name and for unmatched rows ws is all
  * NULL (including its pdf_name!), the collapse makes pdf_name NULL for
  * wells with no stimulation row. That quirk is pinned here deliberately.
  */
object WellsQuery {

  /** /wells: well_info ⟕ well_stimulation ON pdf_name, coords-present
    * filter, deterministic pdf_name order (the reference rides MySQL's PK
    * scan order; Spark must pin it explicitly). Both inputs are ≤ dim-table
    * sized per well-set → stimulation broadcasts; at 100 TB both bucket on
    * pdf_name making the join shuffle-free. */
  def wells(wellInfo: DataFrame, stim: DataFrame): DataFrame = {
    val wi = wellInfo.alias("wi")
    val ws = stim.alias("ws")
    val wiCols = wellInfo.columns.filterNot(_ == "pdf_name").map(c => col(s"wi.$c"))
    val wsCols = stim.columns.map(c => col(s"ws.$c")) // ws.pdf_name survives (P2)
    wi.join(broadcast(ws), col("wi.pdf_name") === col("ws.pdf_name"), "left")
      .filter(col("wi.latitude").isNotNull && col("wi.longitude").isNotNull)
      // unique tiebreaker BEFORE projecting wi.pdf_name away: well_name
      // alone is not unique, and ties would make /wells order flip between
      // runs (the projection preserves the sort order)
      .orderBy(col("wi.well_name"), col("wi.pdf_name"))
      .select((wiCols ++ wsCols): _*)
  }

  /** Same, ordered by the surviving (ws) pdf_name with the original wi key
    * kept under a distinct name — the golden-test-friendly shape. */
  def wellsKeyed(wellInfo: DataFrame, stim: DataFrame): DataFrame = {
    val wi = wellInfo.alias("wi")
    val ws = stim.alias("ws")
    wi.join(broadcast(ws), col("wi.pdf_name") === col("ws.pdf_name"), "left")
      .filter(col("wi.latitude").isNotNull && col("wi.longitude").isNotNull)
      .select(Seq(col("wi.pdf_name").as("header_pdf_name")) ++
        wellInfo.columns.filterNot(_ == "pdf_name").map(c => col(s"wi.$c")) ++
        stim.columns.map(c => col(s"ws.$c")): _*)
      .orderBy(col("header_pdf_name"))
  }

  /** JSON rows for the HTTP shell: the engine owns the query, the web layer
    * just streams these strings. */
  def wellsJson(wellInfo: DataFrame, stim: DataFrame): Seq[String] =
    wells(wellInfo, stim).toJSON.collect().toSeq

  /** valid_coords view (P8, static/map.html:40-53): drop non-numeric, swap
    * lat/lon when |lat|>90 ∧ |lon|≤90, then range-filter — server-side so
    * the map client stays dumb. */
  def validCoords(df: DataFrame): DataFrame = {
    val lat0 = col("latitude").cast("double")
    val lon0 = col("longitude").cast("double")
    val swap = abs(lat0) > 90.0 && abs(lon0) <= 90.0
    df.filter(lat0.isNotNull && lon0.isNotNull)
      .withColumn("lat", when(swap, lon0).otherwise(lat0))
      .withColumn("lon", when(swap, lat0).otherwise(lon0))
      .filter(abs(col("lat")) <= 90.0 && abs(col("lon")) <= 180.0)
  }
}
