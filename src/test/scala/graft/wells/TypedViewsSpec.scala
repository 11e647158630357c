package graft.wells

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TypedViewsSpec extends AnyFunSuite with SparkSpec {

  test("typed stimulation casts numerics and nulls garbage dates") {
    val stim = Loader.loadStim(spark, "/root/reference/well_stimulation.csv")
    val typed = TypedViews.typedStimulation(stim)
    assert(typed.schema("lbs_proppant").dataType.typeName == "long")
    assert(typed.schema("max_treatment_rate_bbls_min").dataType.typeName == "double")
    assert(typed.schema("date_simulated").dataType.typeName == "date")
    // raw strings preserved
    assert(typed.columns.contains("lbs_proppant_raw"))
    // the two dirty dates null out in the typed column, survive in raw
    val dirty = typed.filter(col("date_simulated_raw").isin("11/E/2013", "07/1212015"))
    assert(dirty.count() == 2)
    assert(dirty.filter(col("date_simulated").isNotNull).count() == 0)
    // a clean value round-trips
    assert(typed.filter(col("date_simulated_raw") === "09/07/2013" &&
      col("date_simulated") === to_date(lit("2013-09-07"))).count() >= 1)
  }

  test("extractor fallback: blank primary falls through, prefer flag flips") {
    import Extraction._
    val text = new DocumentTextExtractor {
      def extract(c: Array[Byte]) = Seq("text layer")
    }
    val blank = new DocumentTextExtractor {
      def extract(c: Array[Byte]) = Seq("  ", "")
    }
    val ocr = new DocumentTextExtractor {
      def extract(c: Array[Byte]) = Seq("ocr result")
    }
    assert(withFallback(text, ocr).extract(Array(1)) == Seq("text layer"))
    assert(withFallback(blank, ocr).extract(Array(1)) == Seq("ocr result"))
    assert(withFallback(text, ocr, preferFallback = true).extract(Array(1)) == Seq("ocr result"))
    assert(withFallback(blank, blank).extract(Array(1)) == Seq("  ", ""))
  }

  test("scrape rejects surface the error side-channel (S15)") {
    import spark.implicits._
    val keys = Seq(("GOOD", "1"), ("BAD", "2")).toDF("well_name", "api")
    val client = new Enrichment.EnrichmentClient {
      def fetch(n: String, a: String) =
        if (n == "BAD") throw new RuntimeException("nav timeout 18s")
        else Enrichment.WebRecord(n, a, "Active", "Oil & Gas", "Williston", "1k", "2k")
    }
    val scraped = Enrichment.scrape(keys, client)
    val rej = Enrichment.rejects(scraped).collect()
    assert(rej.length == 1)
    assert(rej(0).getAs[String]("well_name") == "BAD")
    assert(rej(0).getAs[String]("error").contains("nav timeout"))
    // web_table drops the side-channel column
    assert(!Enrichment.webTable(scraped).columns.contains("__error"))
  }
}
