package graft.wells

import org.apache.spark.sql.SparkSession

/** CLI entry points mirroring the reference's three scripts (SURVEY.md §7.1):
  *
  *   runMain graft.wells.Main extract <docDir> <outDir>
  *   runMain graft.wells.Main load <headerCsv> <stimCsv> <tableRoot> [--dry-run]
  *   runMain graft.wells.Main enrich <tableRoot>
  *   runMain graft.wells.Main wells <tableRoot>       # prints /wells JSON
  *   runMain graft.wells.Main serve <tableRoot> [--port N] [--static DIR]
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList) finally spark.stop()
  }

  private def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "extract" :: docDir :: outDir :: Nil =>
      // magic-byte dispatch: real PDFs through the text-layer codec
      // (PdfText, S2), text fixtures through the passthrough — one scan
      // serves both. A deployment with a recognizer wraps this in
      // Extraction.withFallback(PdfText.AutoDetect,
      //   new Extraction.OcrExtractor(engine), preferFallback = <--prefer-ocr>)
      // — the S3/S4 ladder OcrLadderSpec drives; no engine ships here
      val docs = Extraction.scanDocuments(spark, docDir,
        PdfText.AutoDetect).cache()
      val (header, stim) = Extraction.extractAll(docs)
      header.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/well_header")
      stim.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/well_stimulation")
      println(s"[OK] extracted ${docs.count()} documents -> $outDir")
    case "load" :: headerCsv :: stimCsv :: tableRoot :: rest =>
      // reference semantics: `if limit and ...` — 0 is falsy, so
      // --limit 0 means NO limit, not zero rows
      val limit = rest.sliding(2).collectFirst {
        case Seq("--limit", n) => n.toInt }.filter(_ > 0)
      Loader.run(spark, headerCsv, stimCsv, tableRoot,
        dryRun = rest.contains("--dry-run"), limit = limit)
      if (!rest.contains("--dry-run")) println(s"[OK] DB import done -> $tableRoot")
    case "enrich" :: tableRoot :: Nil =>
      val info = Enrichment.run(spark, tableRoot)
      println(s"[OK] well_info rows=${info.count()}")
    case "wells" :: tableRoot :: Nil =>
      val info = spark.read.parquet(s"$tableRoot/well_info")
      val stim = spark.read.parquet(s"$tableRoot/well_stimulation")
      WellsQuery.wellsJson(info, stim).foreach(println)
    case "serve" :: tableRoot :: rest =>
      val port = rest.sliding(2).collectFirst {
        case Seq("--port", p) => p.toInt }.getOrElse(8080)
      val staticDir = rest.sliding(2).collectFirst {
        case Seq("--static", d) => d }
      val server = Serve.start(spark, tableRoot, port, staticDir)
      println(s"[OK] serving /wells on port ${server.getAddress.getPort}")
      Thread.currentThread().join() // until killed, like flask run
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      sys.exit(2)
  }
}
