package graft.wells

import org.apache.spark.sql.DataFrame

/** CSV-boundary schema resolution (reference: normalize_keys_and_alias at
  * pdf_to_db.py:75-92, find_col_name at pdf_to_db.py:94-107; SURVEY.md
  * §1.3/F18/F19). Driver-side plain Scala: it only inspects header names,
  * never data, so it adds zero distributed work.
  */
object SchemaResolver {

  val latHints: Seq[String] = Seq("lat", "latitude", "lat (dec)", "y (lat)")
  val lonHints: Seq[String] = Seq("lon", "long", "longitude", "lng", "x (lon)")

  private val pdfAliases = Seq("pdf", "filename", "file_name", "pdfname")

  /** Key cleanup: strip BOM, trim, lowercase, spaces → underscores. */
  def normalizeKey(k: String): String = {
    val noBom = if (k == null) "" else k.replaceAll("^\\uFEFF+", "")
    noBom.trim.toLowerCase.replace(" ", "_")
  }

  /** Rename map over a raw CSV header: normalized names, with the first
    * non-empty pdf alias promoted to pdf_name when pdf_name is absent.
    * Returns (rawName → resolvedName) in original column order. */
  def resolve(rawHeader: Seq[String]): Seq[(String, String)] = {
    val normed = rawHeader.map(k => k -> normalizeKey(k))
    val names = normed.map(_._2).toSet
    if (names.contains("pdf_name")) normed
    else {
      pdfAliases.find(names.contains) match {
        case Some(alias) =>
          normed.map { case (raw, n) => (raw, if (n == alias) "pdf_name" else n) }
        case None => normed
      }
    }
  }

  /** Fuzzy lat/lon column resolution over RAW header names: exact
    * latitude/longitude match first, then substring hints. */
  def findColName(rawHeader: Seq[String], kind: String): Option[String] = {
    val lowered = rawHeader.map(k => k -> (if (k == null) "" else k).trim.toLowerCase)
    val preferred = if (kind == "lat") "latitude" else "longitude"
    lowered.collectFirst { case (k, low) if low == preferred => k }
      .orElse {
        val hints = if (kind == "lat") latHints else lonHints
        lowered.collectFirst { case (k, low) if hints.exists(low.contains) => k }
      }
  }

  /** Apply the resolved rename map to a DataFrame read with raw headers. */
  def applyTo(df: DataFrame): DataFrame = {
    val renames = resolve(df.columns.toSeq)
    df.toDF(renames.map(_._2): _*)
  }
}
