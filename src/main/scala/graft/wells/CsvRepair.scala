package graft.wells

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Malformed-CSV repair pre-pass (reference: clean_stim_csv,
  * pdf_to_db.py:24-73; SURVEY.md S7): re-stitch data rows whose free-text
  * `details` column spilled across physical lines.
  *
  * Reference semantics, preserved exactly:
  *  - line 0 is the header; its comma count is the expected field-separator
  *    count for a complete row;
  *  - a data row starts iff it matches `^[^,"]+\.pdf,`;
  *  - lines before the first row start are dropped;
  *  - a continuation line is appended to the open row with a LITERAL
  *    backslash-n two-character sequence (the reference writes "\\n");
  *  - the open row is flushed as soon as its comma count OUTSIDE quotes
  *    reaches the header's count; a trailing unflushed row is kept.
  *
  * The stitch is order-sensitive, so it must never be split mid-record
  * across partitions: the Spark entry point reads each file as a whole
  * (`wholetext`) and stitches per file — file-parallel, record-safe.
  */
object CsvRepair {

  private val RowStart = "^[^,\"]+\\.pdf,.*".r.pattern

  /** Commas outside double-quoted regions (pdf_to_db.py:24-31). */
  def commasOutsideQuotes(s: String): Int = {
    var cnt = 0
    var inq = false
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch == '"') inq = !inq
      else if (ch == ',' && !inq) cnt += 1
      i += 1
    }
    cnt
  }

  /** Pure stitcher over the physical lines of one file. */
  def repairLines(lines: IndexedSeq[String]): IndexedSeq[String] = {
    if (lines.isEmpty) return lines
    val header = lines.head
    val expected = header.count(_ == ',')
    val out = ArrayBuffer(header)
    var buf = ""
    for (line <- lines.drop(1)) {
      if (buf.isEmpty) {
        if (RowStart.matcher(line).matches()) buf = line
        // else: stray line before any row start — dropped
      } else {
        if (RowStart.matcher(line).matches() && commasOutsideQuotes(buf) >= expected) {
          out += buf
          buf = line
        } else {
          buf = buf + "\\n" + line // literal backslash-n, as the reference writes
        }
      }
      if (buf.nonEmpty && commasOutsideQuotes(buf) >= expected) {
        out += buf
        buf = ""
      }
    }
    if (buf.nonEmpty) out += buf
    out.toIndexedSeq
  }

  /** Python splitlines semantics: a trailing newline terminates the last
    * line without creating an empty one, but interior blank lines (e.g.
    * from a double newline) ARE lines — they become `\n` continuation
    * marks when a row is open, so only the split artifact may be dropped. */
  private def physicalLines(text: String): IndexedSeq[String] = {
    val arr = text.split("\r?\n", -1).toIndexedSeq
    if (text.endsWith("\n") && arr.nonEmpty && arr.last.isEmpty) arr.dropRight(1)
    else arr
  }

  def repairText(text: String): String =
    repairLines(physicalLines(text)).mkString("\n")

  /** Read path → repaired single-column DataFrame of logical CSV lines.
    * Whole-file read keeps the stitch record-safe; multiple input files
    * repair in parallel (one task per file). */
  def repairedLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .as[String]
      .flatMap(t => repairLines(physicalLines(t)))
      .toDF("line")
  }

  /** Repair then parse as CSV (header row preserved by the stitcher). */
  def readRepairedCsv(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = repairedLines(spark, path).as[String]
    spark.read.option("header", "true")
      .option("escape", "\"") // RFC4180 doubled quotes, like Python's csv
      .csv(lines)
  }
}
