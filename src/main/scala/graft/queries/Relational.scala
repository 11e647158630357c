package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables._
import graft.queries.QueryUtils._
import graft.wells.Cleaning

/** Relational operator coverage (SURVEY.md §2.2–§2.8) exercised over the
  * driver's synthetic TPC-H-ish tables, one catalog entry per operator class.
  * Scale notes are inline: every join states its expected physical strategy
  * at 100 TB (broadcast vs sort-merge + bucketing) and every agg is
  * partial-aggregate friendly.
  */
object Relational {

  /** q01 — grouped aggregation (SURVEY A1/A2; TPC-H Q1 shape).
    * Partial+final hash agg; 6 groups → no skew; scan prunes to 6 columns. */
  private def q01(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — projection + predicate pushdown (SURVEY P1/P4/P7 family).
    * Filter and 4-column projection reach the parquet scan (PushedFilters). */
  private def q02(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        $"l_shipdate" < to_timestamp(lit("1996-06-01 00:00:00")) &&
        $"l_discount" > 0.05)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice",
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_day"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }
  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00'
      |  AND l_discount > 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q03 — left outer equi-join (SURVEY J1). customer is the small dim →
    * broadcast hash join; at 100 TB orders stays shuffle-free. */
  private def q03(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
    val c = customer(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .select($"o_orderkey", $"o_custkey", $"c_name", $"c_mktsegment", $"o_totalprice")
      .orderBy($"o_orderkey")
  }
  private val q03Sql =
    """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
      |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_orderkey""".stripMargin

  /** q04 — composite-key join of two aggregates (SURVEY J2: (well_name, api)
    * composite equi-join analog). Both sides pre-aggregated on the same key →
    * at scale, bucketing on (user_id, day) makes the join co-located. */
  private def q04(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d).withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    val clicks = e.filter($"event_type" === "click")
      .groupBy($"user_id", $"day").agg(count(lit(1)).as("clicks"))
    val buys = e.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"day").agg(dsum($"value").as("spend"))
    clicks.join(buys, Seq("user_id", "day"), "left")
      .orderBy($"user_id", $"day")
  }
  private val q04Sql =
    s"""WITH e AS (SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type, value FROM events),
       |c AS (SELECT user_id, day, COUNT(*) AS clicks FROM e WHERE event_type = 'click' GROUP BY user_id, day),
       |b AS (SELECT user_id, day, ${dsumSql("value")} AS spend FROM e WHERE event_type = 'purchase' GROUP BY user_id, day)
       |SELECT c.user_id, c.day, c.clicks, b.spend
       |FROM c LEFT JOIN b ON c.user_id = b.user_id AND c.day = b.day
       |ORDER BY c.user_id, c.day""".stripMargin

  /** q05 — multi-join star aggregate (TPC-H Q5 shape). Dims broadcast down
    * the chain; only the lineitem↔orders join is size-relevant and AQE picks
    * broadcast at small SF / sort-merge at scale. */
  private def q05(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = lineitem(s, d)
    val o = orders(s, d)
    val c = customer(s, d)
    val n = nation(s, d)
    val r = region(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }
  private val q05Sql =
    s"""SELECT r_name, n_name,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** q06 — anti join (SURVEY S9's FK-integrity check as left_anti). */
  private def q06(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d)
    val o = orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }
  private val q06Sql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** q07 — window dedup, the reference's last-writer-wins upsert kernel
    * (SURVEY §2.8): row_number over (key, recency desc), keep rank 1. */
  private def q07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey".as("latest_orderkey"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("latest_day"),
        $"o_totalprice".as("latest_totalprice"))
      .orderBy($"o_custkey")
  }
  private val q07Sql =
    """SELECT o_custkey, o_orderkey AS latest_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS latest_day,
      |  o_totalprice AS latest_totalprice
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** q08 — running-total window (frame-based agg; DECIMAL keeps the
    * cumulative sum exact regardless of the engine's frame algorithm). */
  private def q08(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running_spend",
        sum($"o_totalprice".cast(DecimalType(18, 4))).over(w).cast("double"))
      .select($"o_custkey", $"o_orderkey", $"running_spend")
      .orderBy($"o_custkey", $"o_orderkey")
  }
  private val q08Sql =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q09 — top-k (TakeOrderedAndProject: per-partition top-k then merge —
    * no global sort shuffle at scale). */
  private def q09(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(10)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }
  private val q09Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** q10 — set op EXCEPT (distinct semantics in both engines). */
  private def q10(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
    o.filter($"o_orderstatus" === "O").select($"o_custkey")
      .except(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
      .orderBy($"o_custkey")
  }
  private val q10Sql =
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY o_custkey""".stripMargin

  /** q11 — set ops INTERSECT + UNION (distinct) combined. */
  private def q11(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
    val both = o.filter($"o_orderstatus" === "O").select($"o_custkey")
      .intersect(o.filter($"o_orderstatus" === "F").select($"o_custkey"))
      .withColumn("tag", lit("both"))
    val hi = o.filter($"o_totalprice" > 400000.0).select($"o_custkey")
      .union(o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey"))
      .distinct()
      .withColumn("tag", lit("hi_or_urgent"))
    both.unionByName(hi).orderBy($"tag", $"o_custkey")
  }
  private val q11Sql =
    """SELECT o_custkey, 'both' AS tag FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |UNION ALL
      |SELECT o_custkey, 'hi_or_urgent' AS tag FROM (
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0
      |  UNION
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY tag, o_custkey""".stripMargin

  /** q12 — DISTINCT projection (SURVEY §2.5). */
  private def q12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d).select($"c_mktsegment", $"c_nationkey").distinct()
      .orderBy($"c_mktsegment", $"c_nationkey")
  }
  private val q12Sql =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** q13 — ROLLUP with grouping() indicator (SURVEY §2.4 “free” agg family). */
  private def q13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"),
        grouping($"l_returnflag").cast("int").as("g_rf"),
        grouping($"l_linestatus").cast("int").as("g_ls"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }
  private val q13Sql =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
       |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** q14 — CUBE over event dimensions. */
  private def q14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .cube($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .orderBy($"event_type".asc_nulls_first, $"day".asc_nulls_first)
  }
  private val q14Sql =
    s"""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
       |  ${dsumSql("value")} AS total_value
       |FROM events GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d'))
       |ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST""".stripMargin

  /** q15 — tumbling-window batch aggregation over the event stream table
    * (SURVEY §2.7 batch analog; streaming twin lives in graft.streaming). */
  private def q15(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .orderBy($"hour", $"event_type")
  }
  private val q15Sql =
    s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       |  event_type, COUNT(*) AS n, ${dsumSql("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** q16 — ordered LIMIT page (SURVEY P7 --limit semantics). */
  private def q16(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d).orderBy($"o_orderkey").limit(100)
      .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
  }
  private val q16Sql =
    """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
      |ORDER BY o_orderkey LIMIT 100""".stripMargin

  /** q17 — conditional coordinate swap/validation (SURVEY P8/F24: the map
    * client's lat/lon rescue re-expressed as a relational view). */
  private def q17(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = orders(s, d)
      .withColumn("lat0", $"o_totalprice" % 200.0 - 100.0)
      .withColumn("lon0", $"o_totalprice" % 360.0 - 180.0)
    base
      .withColumn("lat", when(abs($"lat0") > 90.0 && abs($"lon0") <= 90.0, $"lon0").otherwise($"lat0"))
      .withColumn("lon", when(abs($"lat0") > 90.0 && abs($"lon0") <= 90.0, $"lat0").otherwise($"lon0"))
      .filter(abs($"lat") <= 90.0 && abs($"lon") <= 180.0)
      .select($"o_orderkey", $"lat", $"lon")
      .orderBy($"o_orderkey")
  }
  private val q17Sql =
    """WITH base AS (SELECT o_orderkey,
      |    o_totalprice % 200.0 - 100.0 AS lat0,
      |    o_totalprice % 360.0 - 180.0 AS lon0 FROM orders),
      |sw AS (SELECT o_orderkey,
      |    CASE WHEN abs(lat0) > 90.0 AND abs(lon0) <= 90.0 THEN lon0 ELSE lat0 END AS lat,
      |    CASE WHEN abs(lat0) > 90.0 AND abs(lon0) <= 90.0 THEN lat0 ELSE lon0 END AS lon
      |  FROM base)
      |SELECT o_orderkey, lat, lon FROM sw
      |WHERE abs(lat) <= 90.0 AND abs(lon) <= 180.0
      |ORDER BY o_orderkey""".stripMargin

  /** q18 — regex field extraction (SURVEY F6/F10/F11 labeled-value bank). */
  private def q18(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id",
        nullif(regexp_extract($"text", "filter ([a-z]+)", 1), lit("")).as("after_filter"),
        nullif(regexp_extract($"text", "(spark [a-z]+)", 1), lit("")).as("spark_bigram"))
      .orderBy($"doc_id")
  }
  private val q18Sql =
    """SELECT doc_id,
      |  NULLIF(regexp_extract(text, 'filter ([a-z]+)', 1), '') AS after_filter,
      |  NULLIF(regexp_extract(text, '(spark [a-z]+)', 1), '') AS spark_bigram
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q19 — text normalization (SURVEY F1 `_norm`): punctuation translate +
    * whitespace collapse + trim, over deliberately dirtied strings. */
  private def q19(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .withColumn("dirty", concat(lit("  º "), substring($"text", 1, 40), lit("\t ·end— ")))
      .select($"doc_id", Cleaning.normCol($"dirty").as("clean"))
      .orderBy($"doc_id")
  }
  private val q19Sql =
    """SELECT doc_id,
      |  trim(regexp_replace(translate('  º ' || substr(text, 1, 40) || chr(9) || ' ·end— ',
      |    'º˚’′“”—–·', '°°''''""--.'), '[ \t]+', ' ', 'g')) AS clean
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q20 — numeric-string scrub (SURVEY F3 clean_num): strip non-[0-9.]. */
  private def q20(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    part(s, d)
      .withColumn("dirty",
        concat(lit("$"), $"p_partkey".cast("string"), lit(",00 kg (approx -"),
          $"p_size".cast("string"), lit(")")))
      .select($"p_partkey", Cleaning.cleanNumCol($"dirty").as("num"))
      .orderBy($"p_partkey")
  }
  private val q20Sql =
    """SELECT p_partkey,
      |  NULLIF(regexp_replace('$' || CAST(p_partkey AS VARCHAR) || ',00 kg (approx -'
      |    || CAST(p_size AS VARCHAR) || ')', '[^0-9.]', '', 'g'), '') AS num
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q21 — DMS→decimal-degrees parsing (SURVEY F4): DMS strings are
    * synthesized from integer columns, parsed by the engine's dmsToDecimal
    * UDF, and the oracle recomputes deg+min/60+sec/3600 arithmetically. */
  private def q21(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = part(s, d)
      .withColumn("deg", ($"p_partkey" % 90).cast("int"))
      .withColumn("mnt", ($"p_partkey" % 60).cast("int"))
      .withColumn("sec", (($"p_partkey" * 7) % 60).cast("int"))
      .withColumn("hemi", when($"p_partkey" % 2 === 0, lit("N")).otherwise(lit("W")))
      .withColumn("dms", concat($"deg".cast("string"), lit("° "),
        $"mnt".cast("string"), lit("' "), $"sec".cast("string"), lit("\" "), $"hemi"))
    p.select($"p_partkey", Cleaning.dmsToDecimalUdf($"dms").as("decimal_deg"))
      .orderBy($"p_partkey")
  }
  private val q21Sql =
    """WITH g AS (SELECT p_partkey,
      |    CAST(p_partkey % 90 AS INT) AS deg, CAST(p_partkey % 60 AS INT) AS mnt,
      |    CAST((p_partkey * 7) % 60 AS INT) AS sec,
      |    CASE WHEN p_partkey % 2 = 0 THEN 'N' ELSE 'W' END AS hemi
      |  FROM part)
      |SELECT p_partkey,
      |  CASE WHEN hemi = 'W' THEN -(deg + mnt/60.0 + sec/3600.0)
      |       ELSE deg + mnt/60.0 + sec/3600.0 END AS decimal_deg
      |FROM g ORDER BY p_partkey""".stripMargin

  /** q22 — API-number normalization (SURVEY F5): NN-NNN-NNNNN formatting
    * from messy separators; oracle builds the expected form independently. */
  private def q22(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
      .withColumn("g1", lpad(($"o_orderkey" % 100).cast("string"), 2, "0"))
      .withColumn("g2", lpad(($"o_orderkey" % 1000).cast("string"), 3, "0"))
      .withColumn("g3", lpad(($"o_orderkey" % 100000).cast("string"), 5, "0"))
      .withColumn("sep1", when($"o_orderkey" % 3 === 0, lit("-"))
        .when($"o_orderkey" % 3 === 1, lit("")).otherwise(lit(" - ")))
      .withColumn("raw", concat($"g1", $"sep1", $"g2", lit("-"), $"g3"))
    o.select($"o_orderkey", Cleaning.normalizeApiCol($"raw").as("api"))
      .orderBy($"o_orderkey")
  }
  private val q22Sql =
    """WITH g AS (SELECT o_orderkey,
      |    lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0') AS g1,
      |    lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') AS g2,
      |    lpad(CAST(o_orderkey % 100000 AS VARCHAR), 5, '0') AS g3
      |  FROM orders)
      |SELECT o_orderkey, g1 || '-' || g2 || '-' || g3 AS api
      |FROM g ORDER BY o_orderkey""".stripMargin

  /** q23 — coalesce fallback chain (SURVEY F14, the extractor's signature
    * pattern): first regex hit wins, then fallback, then default. */
  private def q23(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select($"doc_id",
        coalesce(
          nullif(regexp_extract($"text", "table ([a-z]+)", 1), lit("")),
          nullif(regexp_extract($"text", "group ([a-z]+)", 1), lit("")),
          lit("missing")).as("extracted"))
      .orderBy($"doc_id")
  }
  private val q23Sql =
    """SELECT doc_id,
      |  COALESCE(NULLIF(regexp_extract(text, 'table ([a-z]+)', 1), ''),
      |           NULLIF(regexp_extract(text, 'group ([a-z]+)', 1), ''),
      |           'missing') AS extracted
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q24 — null/blank/N-A ladder (SURVEY F20→F21→F22: scrape-norm, N/A→NULL,
    * NULL→'' sink coercion — the reference's three null encodings). */
  private def q24(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = when($"doc_id" % 4 === 0, lit(null).cast("string"))
      .when($"doc_id" % 4 === 1, lit("   "))
      .when($"doc_id" % 4 === 2, lit(" members only "))
      .otherwise($"lang")
    documents(s, d)
      .withColumn("raw", raw)
      .select($"doc_id",
        Cleaning.scrapeNormCol($"raw").as("normed"),
        Cleaning.naToNullCol(Cleaning.scrapeNormCol($"raw")).as("nulled"),
        Cleaning.toStrCol(Cleaning.naToNullCol(Cleaning.scrapeNormCol($"raw"))).as("sink_str"))
      .orderBy($"doc_id")
  }
  private val q24Sql =
    """WITH r AS (SELECT doc_id,
      |    CASE WHEN doc_id % 4 = 0 THEN NULL
      |         WHEN doc_id % 4 = 1 THEN '   '
      |         WHEN doc_id % 4 = 2 THEN ' members only '
      |         ELSE lang END AS raw FROM documents),
      |n AS (SELECT doc_id,
      |    CASE WHEN raw IS NULL OR trim(raw) = ''
      |              OR regexp_matches(trim(raw), '^(?i)Members?\s+Only$')
      |         THEN 'N/A' ELSE trim(raw) END AS normed FROM r)
      |SELECT doc_id, normed,
      |  NULLIF(normed, 'N/A') AS nulled,
      |  COALESCE(NULLIF(normed, 'N/A'), '') AS sink_str
      |FROM n ORDER BY doc_id""".stripMargin

  /** q25 — IN/EXISTS subquery → semi join (SURVEY P-family + J-family). */
  private def q25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
    val c = customer(s, d).filter($"c_mktsegment" === "BUILDING")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_semi")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }
  private val q25Sql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_custkey IN
       |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q26 — data-quality counters (SURVEY A1: rows / nulls / blanks / bad
    * parses in one pass, partial-agg friendly). */
  private def q26(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = when($"event_id" % 5 === 0, lit(null).cast("string"))
      .when($"event_id" % 5 === 1, lit(""))
      .when($"event_id" % 5 === 2, lit("not-a-number"))
      .when($"event_id" % 5 === 3, $"user_id".cast("string"))
      .otherwise(concat($"user_id".cast("string"), lit(".5")))
    events(s, d)
      .withColumn("raw", raw)
      .withColumn("parsed", expr("try_cast(raw AS DOUBLE)"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"raw".isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when($"raw".isNotNull && trim($"raw") === "", 1L).otherwise(0L)).as("n_blank"),
        sum(when($"raw".isNotNull && trim($"raw") =!= "" && $"parsed".isNull, 1L).otherwise(0L)).as("n_bad"),
        sum(when($"parsed".isNotNull, 1L).otherwise(0L)).as("n_ok"))
  }
  private val q26Sql =
    """WITH r AS (SELECT event_id,
      |    CASE WHEN event_id % 5 = 0 THEN NULL
      |         WHEN event_id % 5 = 1 THEN ''
      |         WHEN event_id % 5 = 2 THEN 'not-a-number'
      |         WHEN event_id % 5 = 3 THEN CAST(user_id AS VARCHAR)
      |         ELSE CAST(user_id AS VARCHAR) || '.5' END AS raw
      |  FROM events),
      |p AS (SELECT raw, TRY_CAST(raw AS DOUBLE) AS parsed FROM r)
      |SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN raw IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(SUM(CASE WHEN raw IS NOT NULL AND trim(raw) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
      |  CAST(SUM(CASE WHEN raw IS NOT NULL AND trim(raw) <> '' AND parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
      |  CAST(SUM(CASE WHEN parsed IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ok
      |FROM p""".stripMargin

  /** q27 — last-writer-wins merge over a union of “existing” + “incoming”
    * batches (SURVEY §2.8 upsert semantics, the one non-trivial write path). */
  private def q27(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d)
    val existing = e.filter($"event_id" % 2 === 0)
    val incoming = e.filter($"event_id" % 2 === 1)
    val merged = graft.operators.MergeWriter.lastWriterWins(
      existing.unionByName(incoming),
      keys = Seq("user_id", "event_type"),
      orderCols = Seq($"ts", $"event_id"))
    merged.select($"user_id", $"event_type",
      $"event_id".as("last_event_id"), $"value".as("last_value"))
      .orderBy($"user_id", $"event_type")
  }
  private val q27Sql =
    """SELECT user_id, event_type, event_id AS last_event_id, value AS last_value
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** q28 — exact COUNT(DISTINCT) per group (expand + two-phase agg). */
  private def q28(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("users"), count(lit(1)).as("n"))
      .orderBy($"event_type")
  }
  private val q28Sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q29 — sessionization as batch SQL (SURVEY §2.7 incremental analog):
    * 30-minute-gap sessions via lag + cumulative boundary sum. */
  private def q29(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sessed = events(s, d)
      .withColumn("prev_s", lag(unix_timestamp($"ts"), 1).over(byUser))
      .withColumn("boundary",
        when($"prev_s".isNull || unix_timestamp($"ts") - $"prev_s" > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum($"boundary")
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessed.groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        dsum($"value").as("session_value"))
      .orderBy($"user_id", $"session_id")
  }
  private val q29Sql =
    s"""WITH l AS (SELECT user_id, event_id, ts, value,
       |    LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS prev_s,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS cur_s
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |b AS (SELECT *, CASE WHEN prev_s IS NULL OR cur_s - prev_s > 1800 THEN 1 ELSE 0 END AS boundary FROM l),
       |sess AS (SELECT *, CAST(SUM(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM b)
       |SELECT user_id, session_id, COUNT(*) AS n_events,
       |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       |  ${dsumSql("value")} AS session_value
       |FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin

  /** q30 — grouped collect + ordered string aggregation (listagg class):
    * collect_list is shuffle-order nondeterministic, so the engine sorts
    * before joining — the only way a distributed listagg can hash-match. */
  private def q30(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    customer(s, d)
      .groupBy($"c_nationkey")
      .agg(sort_array(collect_set($"c_mktsegment")).as("segs"))
      .select($"c_nationkey", array_join($"segs", ",").as("segments"),
        size($"segs").as("n_segments"))
      .orderBy($"c_nationkey")
  }
  private val q30Sql =
    """SELECT c_nationkey,
      |  array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
      |  len(list_sort(list(DISTINCT c_mktsegment))) AS n_segments
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** q31 — scalar subquery: orders above the global average price (exact
    * decimal average so both engines agree bit-for-bit). */
  private def q31(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = orders(s, d)
    val avgPrice = o.agg((dsum($"o_totalprice") / count(lit(1))).as("a"))
    o.join(broadcast(avgPrice))
      .filter($"o_totalprice" > $"a")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_above"))
      .orderBy($"o_orderstatus")
  }
  private val q31Sql =
    s"""SELECT o_orderstatus, COUNT(*) AS n_above FROM orders
       |WHERE o_totalprice > (SELECT ${dsumSql("o_totalprice")} / COUNT(*) FROM orders)
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** One weekday list + one wide pivot, shared by q32 (pivot) and q40
    * (unpivot) on both engines — the reshape pair derives from a single
    * definition so a day-handling change cannot silently split them. */
  private val weekdays = Seq("Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun")
  private def dowPivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .withColumn("dow", date_format($"ts", "E"))
      .groupBy($"event_type")
      .pivot("dow", weekdays)
      .agg(count(lit(1)))
      .na.fill(0L)
  }
  private val dowPivotColsSql = weekdays.map(dy =>
    s"CAST(COALESCE(SUM(CASE WHEN strftime(ts, '%a') = '$dy' THEN 1 ELSE 0 END), 0) AS BIGINT) AS \"$dy\"")
    .mkString(", ")

  /** q32 — pivot: event counts per user day-of-week, one column per
    * weekday (fixed column set keeps the shape deterministic). */
  private def q32(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    dowPivot(s, d).orderBy($"event_type")
  }
  private val q32Sql =
    s"""SELECT event_type, $dowPivotColsSql FROM events
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q33 — as-of join (graft.operators.AsofJoin): each purchase event
    * picks up the latest click at-or-before it per user. Right side is
    * deduped to one click per (user, ts) so the as-of choice is total and
    * both engines agree. DuckDB's native ASOF JOIN is the oracle. */
  private def q33(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val clicks = e.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("click_id"))
    graft.operators.AsofJoin.asof(purchases, clicks, Seq("user_id"), "ts")
      .select($"user_id", $"event_id".as("purchase_id"),
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        $"click_id_asof".as("last_click_id"))
      .orderBy($"user_id", $"purchase_id")
  }
  private val q33Sql =
    """WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
      |      WHERE event_type = 'click' GROUP BY user_id, ts)
      |SELECT p.user_id, p.event_id AS purchase_id,
      |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  c.click_id AS last_click_id
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.user_id, purchase_id""".stripMargin

  /** q34 — semi-structured extraction: JSON props column → typed field,
    * grouped rollup. from_json with an explicit schema (codegen'd Jackson
    * parse once per row) rather than repeated get_json_object calls. */
  private def q34(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    events(s, d)
      .withColumn("k", from_json($"props", org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.IntegerType)))).getField("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        countDistinct($"k").as("distinct_k"),
        sum(when($"k".isNull, 1L).otherwise(0L)).as("null_k"))
      .orderBy($"event_type")
  }
  private val q34Sql =
    """WITH x AS (SELECT event_type,
      |    TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
      |SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  COUNT(DISTINCT k) AS distinct_k,
      |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_k
      |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q35 — ranking-window family: rank / dense_rank / ntile / lead / lag
    * in one pass over a single window spec (one shuffle, one sort). */
  private def q35(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
    customer(s, d)
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("next_bal", lead($"c_acctbal", 1).over(w))
      .withColumn("prev_cust", lag($"c_custkey", 1).over(w))
      .filter($"rnk" <= 5)
      .select($"c_nationkey", $"rnk", $"drnk", $"quartile",
        $"c_custkey", $"c_acctbal", $"next_bal", $"prev_cust")
      .orderBy($"c_nationkey", $"rnk", $"c_custkey")
  }
  private val q35Sql =
    """SELECT c_nationkey, rnk, drnk, quartile, c_custkey, c_acctbal, next_bal, prev_cust
      |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
      |    RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk, NTILE(4) OVER w AS quartile,
      |    LEAD(c_acctbal, 1) OVER w AS next_bal, LAG(c_custkey, 1) OVER w AS prev_cust
      |  FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
      |WHERE rnk <= 5 ORDER BY c_nationkey, rnk, c_custkey""".stripMargin

  /** q36 — TPC-H Q3 shape: selective dimension filter, two fact joins,
    * grouped revenue, top-10. The segment filter prunes customers before
    * the broadcast; AQE picks broadcast at small SF / SMJ at scale. */
  private def q36(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = customer(s, d).filter($"c_mktsegment" === "AUTOMOBILE")
    val o = orders(s, d).filter($"o_orderdate" < to_timestamp(lit("1996-06-01 00:00:00")))
    val l = lineitem(s, d).filter($"l_shipdate" > to_timestamp(lit("1996-06-01 00:00:00")))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($"l_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_day"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
  private val q36Sql =
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'AUTOMOBILE'
       |  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
       |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
       |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** q37 — TPC-H Q18 shape: HAVING over a grouped sum, joined back to
    * detail rows (large-quantity customers). */
  private def q37(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = lineitem(s, d)
    val big = l.groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 150.0)
    val o = orders(s, d)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(broadcast(customer(s, d)), o("o_custkey") === col("c_custkey"))
      .select($"c_name", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_day"),
        $"o_totalprice", $"total_qty")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(50)
  }
  private val q37Sql =
    s"""WITH big AS (SELECT l_orderkey, ${dsumSql("l_quantity")} AS total_qty
       |  FROM lineitem GROUP BY l_orderkey HAVING ${dsumSql("l_quantity")} > 150.0)
       |SELECT c_name, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       |  o_totalprice, total_qty
       |FROM orders JOIN big ON o_orderkey = big.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin

  /** q38 — time-RANGE-framed window: per-user rolling 30-minute value sum.
    * A different frame class from q08's ROWS frame — the frame is defined
    * by event-time distance, and equal-timestamp peers share one frame.
    * DECIMAL keeps the rolling sum exact under either engine's frame
    * algorithm (incremental vs recompute). */
  private def q38(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".cast("long"))
      .rangeBetween(-1800L, Window.currentRow)
    events(s, d)
      .withColumn("rolling_value",
        sum($"value".cast(DecimalType(18, 4))).over(w).cast("double"))
      .select($"user_id", $"event_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("event_ts"),
        $"rolling_value")
      .orderBy($"user_id", $"event_id")
  }
  private val q38Sql =
    """SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
      |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** q39 — band join (graft.operators.BandJoin): same-user event pairs
    * within 5 minutes of each other. The operator buckets by
    * floor(t/band) and probes (bucket, bucket+1) — equi-shuffles on
    * (user, bucket), never a per-key cross join; the oracle is the naive
    * θ-join DuckDB can afford at sf. */
  private def q39(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = events(s, d).select($"user_id", $"event_id",
      $"ts".cast("long").as("tsec"))
    graft.operators.BandJoin.selfBand(e, "user_id", "tsec", "event_id", 300L)
      .select($"key".as("user_id"), $"id1".as("e1"), $"v1".as("t1"),
        $"id2".as("e2"), $"v2".as("t2"))
      .orderBy($"user_id", $"e1", $"e2")
  }
  private val q39Sql =
    """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsec FROM events)
      |SELECT a.user_id, a.event_id AS e1, a.tsec AS t1, b.event_id AS e2, b.tsec AS t2
      |FROM e a JOIN e b ON a.user_id = b.user_id
      |  AND (a.tsec < b.tsec OR (a.tsec = b.tsec AND a.event_id < b.event_id))
      |  AND b.tsec - a.tsec <= 300
      |ORDER BY a.user_id, e1, e2""".stripMargin

  /** q40 — unpivot (melt): q32's wide day-of-week counts back to long
    * (event_type, day, n) form via the Dataset.unpivot API — the
    * wide→long reshape that pairs with pivot's long→wide, built from the
    * same [[dowPivot]] definition. */
  private def q40(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    dowPivot(s, d)
      .unpivot(Array($"event_type"), weekdays.map(col).toArray, "day", "n")
      .orderBy($"event_type", $"day")
  }
  private val q40Sql = {
    val arms = weekdays.map(dy => s"SELECT event_type, '$dy' AS day, \"$dy\" AS n FROM p")
      .mkString("\nUNION ALL ")
    s"""WITH p AS (SELECT event_type, $dowPivotColsSql FROM events GROUP BY event_type)
       |$arms
       |ORDER BY event_type, day""".stripMargin
  }

  /** q41 — EXACT percentiles (linear interpolation) per group, computed
    * BOUNDED-MEMORY via the sort-based two-pass: (1) per-group non-null
    * count n; (2) `row_number` over (group, value) — an external
    * (spill-to-disk) sort, never an aggregation buffer — then keep only
    * the rows whose 0-based index is floor/ceil of p·(n−1) and combine
    * with `lower + (upper − lower) * frac`, the same formula DuckDB's
    * `quantile_cont` evaluates, so the doubles agree bit-for-bit (4dp
    * round as a guard). This replaces the round-≤8 `percentile` aggregate,
    * whose buffer holds O(group) values — at fixed group cardinality
    * (3 return flags) that is O(N) doubles per buffer and OOMs at 100×;
    * the window sort spills and survives. Group-count skew (3 sort
    * partitions) is inherent to exact per-group order statistics; the
    * bounded-ERROR alternative at extreme scale is `approx_percentile`
    * (mergeable KLL-style sketch, exercised by ApproxSpec; not a gate —
    * its error bound is engine-specific). */
  private def q41(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, d)
    // Exact interpolated percentiles for one value column, ps = (alias, p).
    def pcts(valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
      val vals = li.where(col(valueCol).isNotNull)
        .select($"l_returnflag", col(valueCol).cast("double").as("v"))
      val counts = vals.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      val ranked = vals
        .withColumn("idx",
          row_number().over(Window.partitionBy($"l_returnflag").orderBy($"v"))
            .cast("long") - lit(1L))
        .join(broadcast(counts), Seq("l_returnflag"))
      def pos(p: Double) = lit(p) * ($"n" - lit(1L)).cast("double")
      val keep = ps.map { case (_, p) =>
        $"idx" === floor(pos(p)).cast("long") || $"idx" === ceil(pos(p)).cast("long")
      }.reduce(_ || _)
      val aggs = ps.flatMap { case (name, p) =>
        Seq(
          max(when($"idx" === floor(pos(p)).cast("long"), $"v")).as(s"${name}_lo"),
          max(when($"idx" === ceil(pos(p)).cast("long"), $"v")).as(s"${name}_hi"),
          max(pos(p) - floor(pos(p))).as(s"${name}_frac"))
      }
      ranked.where(keep)
        .groupBy($"l_returnflag")
        .agg(aggs.head, aggs.tail: _*)
        .select($"l_returnflag" +: ps.map { case (name, _) =>
          round(col(s"${name}_lo") +
            (col(s"${name}_hi") - col(s"${name}_lo")) * col(s"${name}_frac"), 4)
            .as(name)
        }: _*)
    }
    pcts("l_quantity", Seq("p50" -> 0.5, "p90" -> 0.9))
      .join(pcts("l_extendedprice", Seq("price_p25" -> 0.25)), Seq("l_returnflag"))
      .select($"l_returnflag", $"p50", $"p90", $"price_p25")
      .orderBy($"l_returnflag")
  }
  private val q41Sql =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
      |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q47 — the SAME exact interpolated percentiles as q41, by HISTOGRAM
    * SELECTION instead of a corpus sort: q41's documented weakness is
    * the external window sort over every value row, single-reducer per
    * group (3 sort partitions at any scale — the skew is inherent to
    * sort-based order statistics). This plan never sorts the corpus:
    *
    *  1. ONE combinable rollup builds a per-(group, bucket) histogram,
    *     bucket = floor(v) — monotone, bounded by the VALUE DOMAIN
    *     (~10⁵ price buckets), not the row count; the exchange carries
    *     touched buckets per map partition, and the cumulative-rank
    *     window runs over the AGGREGATED histogram (≤ domain rows per
    *     group), never the values.
    *  2. The two target ranks per percentile (floor/ceil of p·(n−1))
    *     locate their buckets by a range probe against that cumulative
    *     table; a broadcast semi-join prunes the second scan to the
    *     selected buckets only, and the within-bucket rank runs over
    *     per-distinct-value counts of those buckets alone.
    *
    * Both passes' shuffles are domain-bounded; the only corpus-sized
    * work is two scans. Interpolation is q41's formula verbatim on the
    * same lo/hi doubles, so the result is bit-identical and the oracle
    * is q41's. (For an unbounded value domain the bucket key becomes a
    * coarser monotone quantization — same plan, wider pass-2 bucket.) */
  private def q47(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, d)
    def pcts(valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
      val vals = li.where(col(valueCol).isNotNull)
        .select($"l_returnflag".as("g"), col(valueCol).cast("double").as("v"))
        .withColumn("b", floor($"v").cast("long"))
      val counts = vals.groupBy($"g").agg(count(lit(1)).as("n"))
      val hist = vals.groupBy($"g", $"b").agg(count(lit(1)).as("c"))
      val wB = Window.partitionBy($"g").orderBy($"b")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist.withColumn("cb", coalesce(sum($"c").over(wB), lit(0L)))
      def pos(p: Double) = lit(p) * ($"n" - lit(1L)).cast("double")
      val targets = counts.select($"g", explode(array(ps.flatMap {
          case (name, p) => Seq(
            struct(lit(name).as("pname"), lit("lo").as("side"),
              floor(pos(p)).cast("long").as("r")),
            struct(lit(name).as("pname"), lit("hi").as("side"),
              ceil(pos(p)).cast("long").as("r")))
        }: _*)).as("t"))
        .select($"g", $"t.pname", $"t.side", $"t.r")
      val sel = targets.join(cum, Seq("g"))
        .where($"r" >= $"cb" && $"r" < $"cb" + $"c")
        .select($"g", $"pname", $"side", $"r", $"b", $"cb")
        .localCheckpoint(true) // ≤ 2·|ps| rows per group
      val selB = sel.select($"g", $"b").distinct()
      val inB = vals.join(broadcast(selB), Seq("g", "b"), "left_semi")
        .groupBy($"g", $"b", $"v").agg(count(lit(1)).as("vc"))
      val wV = Window.partitionBy($"g", $"b").orderBy($"v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = inB.withColumn("vcb", coalesce(sum($"vc").over(wV), lit(0L)))
      val hit = sel.join(ranked, Seq("g", "b"))
        .where($"r" >= $"cb" + $"vcb" && $"r" < $"cb" + $"vcb" + $"vc")
        .select($"g", $"pname", $"side", $"v")
      val frac = counts.select($"g", explode(array(ps.map { case (name, p) =>
          struct(lit(name).as("pname"), (pos(p) - floor(pos(p))).as("fr"))
        }: _*)).as("t"))
        .select($"g", $"t.pname", $"t.fr")
      val perP = hit.groupBy($"g", $"pname")
        .agg(max(when($"side" === "lo", $"v")).as("lo"),
          max(when($"side" === "hi", $"v")).as("hi"))
        .join(frac, Seq("g", "pname"))
        .select($"g", $"pname",
          round($"lo" + ($"hi" - $"lo") * $"fr", 4).as("pv"))
      val pivots = ps.map { case (name, _) =>
        max(when($"pname" === name, $"pv")).as(name)
      }
      perP.groupBy($"g").agg(pivots.head, pivots.tail: _*)
    }
    pcts("l_quantity", Seq("p50" -> 0.5, "p90" -> 0.9))
      .join(pcts("l_extendedprice", Seq("price_p25" -> 0.25)), Seq("g"))
      .select($"g".as("l_returnflag"), $"p50", $"p90", $"price_p25")
      .orderBy($"l_returnflag")
  }

  /** q48 — Z-ORDER (Morton) multi-dimensional layout cells: quantize
    * (l_partkey, l_suppkey) onto a 256×256 grid over their observed
    * domains, interleave the bits into a 16-bit z value
    * ([[graft.operators.ZOrder]] — static shift/mask/add, one codegen'd
    * integer tree), and roll up the 64 coarse curve cells (z >> 10)
    * with counts, z extents, and an exact quantity sum. The gate
    * verifies the interleave arithmetic the LAYOUT path rests on
    * (writeZOrdered range-partitions + sorts on exactly this value so
    * every file covers a small rectangle in BOTH dimensions — the
    * file-skipping contract ZOrderSpec measures on real footers); the
    * domain bounds come from one min/max agg (driver-sized, the same
    * class as every centroid collect), and the oracle recomputes the
    * identical bounds as scalar subqueries, so the gate is
    * sf-independent. Everything else is one partial-aggregatable
    * rollup over 64 groups. */
  private def q48(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.operators.ZOrder
    val li = lineitem(s, d)
    val b = li.agg(
      min($"l_partkey".cast("long")), max($"l_partkey".cast("long")),
      min($"l_suppkey".cast("long")), max($"l_suppkey".cast("long"))).head()
    // empty corpus: the bounds agg yields an all-NULL row — there is no
    // domain to quantize, and the oracle's `FROM lineitem, b` cross join
    // is empty too, so the contract is an empty frame with the output
    // schema (the vs/pp emptyOut convention)
    if (b.isNullAt(0))
      return li.select(lit(0L).as("cell"), lit(0L).as("n"),
        lit(0L).as("min_z"), lit(0L).as("max_z"),
        lit(0d).as("sum_qty")).limit(0)
    val (plo, phi, slo, shi) = (b.getLong(0), b.getLong(1),
      b.getLong(2), b.getLong(3))
    val z = ZOrder.zValue(Seq(
      ZOrder.quantized($"l_partkey", plo, phi, 8),
      ZOrder.quantized($"l_suppkey", slo, shi, 8)), 8)
    li.withColumn("z", z)
      .groupBy(shiftright($"z", 10).as("cell"))
      .agg(count(lit(1)).as("n"),
        min($"z").as("min_z"), max($"z").as("max_z"),
        dsum($"l_quantity").as("sum_qty"))
      .orderBy($"cell")
  }
  private val q48Sql = {
    import graft.operators.ZOrder
    def q(c: String, lo: String, hi: String) =
      s"greatest(0, least(255, ((($c) - ($lo)) * 256) // (($hi) - ($lo) + 1)))"
    s"""WITH b AS (SELECT MIN(l_partkey) AS plo, MAX(l_partkey) AS phi,
       |              MIN(l_suppkey) AS slo, MAX(l_suppkey) AS shi FROM lineitem),
       |qz AS (SELECT ${ZOrder.zValueSql(Seq("qx", "qy"), 8)} AS z, l_quantity
       |       FROM (SELECT ${q("l_partkey", "b.plo", "b.phi")} AS qx,
       |                    ${q("l_suppkey", "b.slo", "b.shi")} AS qy, l_quantity
       |             FROM lineitem, b))
       |SELECT CAST(z >> 10 AS BIGINT) AS cell, COUNT(*) AS n,
       |  CAST(MIN(z) AS BIGINT) AS min_z, CAST(MAX(z) AS BIGINT) AS max_z,
       |  ${dsumSql("l_quantity")} AS sum_qty
       |FROM qz GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q49 — SKEW-MITIGATED aggregation as a gate (SURVEY §4: "skewed
    * keys → salting or AQE skew-join"): [[graft.operators.Salting
    * .saltedAgg]] spreads each group over 8 reducers via a two-phase
    * partial/merge rollup — l_returnflag is the deliberately hot key
    * (3 values over the whole table, the worst per-key fan-in a
    * groupBy can see). The RESULT is the plain rollup's exactly
    * (decimal sums and counts are mergeable, so the salt-phase split
    * is invisible), which is what the gate pins cross-engine: the
    * oracle is the UNSALTED SQL, so the mitigation is proven free to
    * apply wherever skew appears. AsofSaltingSpec pins the same
    * equality in-engine; this gate pins it against a second engine. */
  private def q49(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.operators.Salting.saltedAgg(
      lineitem(s, d).select($"l_returnflag", $"l_quantity"),
      keys = Seq("l_returnflag"), salts = 8,
      partialAggs = Seq(
        sum($"l_quantity".cast(DecimalType(18, 4))).as("pq"),
        count(lit(1)).as("pn")),
      mergeAggs = Seq(
        sum($"pq").cast("double").as("sum_qty"),
        sum($"pn").as("n")))
      .orderBy($"l_returnflag")
  }
  private val q49Sql =
    s"""SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** q50 — SKEW-MITIGATED join as a gate: [[graft.operators.Salting
    * .saltedJoin]] replicates the small side 8× so a hot join key's
    * probe rows spread over 8 reducers instead of one (the explicit
    * tool for hot keys AQE can't split). Join then rollup to brand
    * revenue; the oracle is the plain join's SQL — the salt column
    * exists only inside the plan, never in the result. */
  private def q50(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = lineitem(s, d)
      .select($"l_partkey".as("pk"), $"l_extendedprice", $"l_discount")
    val small = part(s, d).select($"p_partkey".as("pk"), $"p_brand")
    graft.operators.Salting.saltedJoin(big, small, "pk", salts = 8)
      .groupBy($"p_brand")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy($"p_brand")
  }
  private val q50Sql =
    s"""SELECT p_brand,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |  COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q42 — explicit GROUPING SETS (the rollup/cube generalization, §2.4):
    * two independent 1-D groupings plus the grand total in ONE pass —
    * Spark expands to a single Expand + aggregate, not N scans. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    orders(s, d)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
        grouping($"o_orderstatus").cast("int").as("g_st"),
        grouping($"o_orderpriority").cast("int").as("g_pr"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }
  private val q42Sql =
    s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       |  ${dsumSql("o_totalprice")} AS total,
       |  CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
       |  CAST(GROUPING(o_orderpriority) AS INT) AS g_pr
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** q43 — grouped top-k WITHOUT a window: the bounded-buffer typed
    * aggregator (graft.operators.GroupedTopK) combines map-side to ≤ k
    * rows per group before the exchange, where the row_number window
    * shape shuffles and sorts the entire detail table to keep 3 rows per
    * customer. Same rows as the window oracle below, different (scale-
    * correct) plan — TopKSpec pins partial ObjectHashAggregate + no
    * WindowExec. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.operators.GroupedTopK
      .topK(orders(s, d), "o_custkey", "o_totalprice", "o_orderkey", k = 3)
      .select($"o_custkey", $"id".as("o_orderkey"), $"v".as("o_totalprice"), $"rank")
      .orderBy($"o_custkey", $"rank")
  }
  private val q43Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders)
      |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin

  /** q44 — change-interval (SCD2) build: an event log folded into a
    * state-history table — per user, consecutive repeats of the same
    * event_type collapse, and each surviving change opens an interval
    * [valid_from, valid_to) closed by the NEXT change (null = still
    * open). The warehouse move behind every dimension-history table and
    * training-corpus snapshot ledger. Two windows over ONE user_id
    * partitioning (the dedup lag, the interval lead) — a single
    * exchange; `first_event_id` (globally unique) makes the output
    * unambiguous under second-resolution timestamp ties and is the
    * deterministic sort key on both engines. */
  private def q44(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(s, d)
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .withColumn("vt", lead($"ts", 1).over(w))
      .select($"user_id", $"event_id".as("first_event_id"),
        $"event_type".as("state"),
        date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format($"vt", "yyyy-MM-dd HH:mm:ss").as("valid_to"))
      .orderBy($"user_id", $"first_event_id")
  }
  private val q44Sql =
    """WITH m AS (SELECT user_id, event_id, ts, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events),
      |c AS (SELECT user_id, event_id, ts, event_type FROM m
      |  WHERE prev_type IS NULL OR prev_type <> event_type),
      |i AS (SELECT user_id, event_id AS first_event_id, event_type AS state, ts,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt FROM c)
      |SELECT user_id, first_event_id, state,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  strftime(vt, '%Y-%m-%d %H:%M:%S') AS valid_to
      |FROM i ORDER BY user_id, first_event_id""".stripMargin

  /** q45 — KMV distinct-count sketch: per return flag, the bottom-256
    * md5 folds of `l_partkey` and the cardinality estimate they imply
    * ([[graft.operators.KmvSketch]]). The MERGEABLE sketch path beside
    * q28's exact `count_distinct`: exact distinct shuffles every distinct
    * value to its group's reducer — at 100 TB the exchange IS the
    * distinct table — while the sketch's bounded sorted-set buffer
    * combines map-side to ≤ k longs per group, the shuffle carries
    * O(groups × k × maps) buffer rows, and sketches of disjoint shards
    * union. Unlike `approx_count_distinct`'s HLL++ registers, a bottom-k
    * of engine-universal hashes replays in DuckDB bit for bit — the
    * estimate, not just the machinery, is oracle-checked. Accuracy
    * (standard error ≈ 1/√k ≈ 6%) is measured against the exact counts
    * in SketchSpec. */
  private def q45(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 256
    val sk = graft.operators.KmvSketch.sketch(
      lineitem(s, d).select($"l_returnflag",
        hex8($"l_partkey".cast("string")).as("h")),
      "l_returnflag", $"h", k)
    graft.operators.KmvSketch.estimated(sk, k)
      .orderBy($"l_returnflag")
  }
  private val q45Sql = {
    val h = hex8Sql("CAST(l_partkey AS VARCHAR)")
    s"""WITH h AS (SELECT DISTINCT l_returnflag, $h AS h FROM lineitem),
       |r AS (SELECT l_returnflag, h,
       |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn FROM h),
       |s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    CAST(MAX(h) AS BIGINT) AS kth_min
       |  FROM r WHERE rn <= 256 GROUP BY l_returnflag)
       |SELECT l_returnflag, n_kept, kth_min,
       |  CAST(CASE WHEN n_kept < 256 THEN n_kept
       |       ELSE ${255L * 4294967296L} // GREATEST(kth_min, 1) END AS BIGINT)
       |    AS est_distinct
       |FROM s ORDER BY l_returnflag""".stripMargin
  }

  /** pp23 — INCREMENTAL distinct-sketch maintenance, q45's twin: the
    * standing per-group bottom-k sketch is advanced by sketching ONLY
    * the batch and merging row-locally ([[graft.operators.KmvSketch
    * .merged]] — union, dedup, keep k smallest: the aggregator's merge
    * as an array expression). This is WHY a pipeline holds sketches
    * instead of exact distinct state: the merge is exact under
    * overlapping inputs (dedup by hash), needs no rescan, and the
    * standing table is O(groups × k) forever. Advance = one batch-sized
    * aggregation + a groups-sized full-outer merge. Result must equal
    * q45 over the full table — the oracle is q45's, verbatim. */
  private def pp23(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 256
    val li = lineitem(s, d).select($"l_returnflag",
      hex8($"l_partkey".cast("string")).as("h"),
      (hex8(concat_ws(":", lit("skinc"), $"l_orderkey", $"l_linenumber")) % 5 === 0)
        .as("is_new"))
    val standing = graft.operators.KmvSketch
      .sketch(li.filter(!$"is_new"), "l_returnflag", $"h", k)
      .localCheckpoint(true)
    val batchSk = graft.operators.KmvSketch
      .sketch(li.filter($"is_new"), "l_returnflag", $"h", k)
    val empty = array().cast("array<bigint>")
    val merged = standing.select($"l_returnflag", $"hs".as("a"))
      .join(batchSk.select($"l_returnflag", $"hs".as("b")),
        Seq("l_returnflag"), "full_outer")
      .select($"l_returnflag", graft.operators.KmvSketch.merged(
        coalesce($"a", empty), coalesce($"b", empty), k).as("hs"))
    graft.operators.KmvSketch.estimated(merged, k).orderBy($"l_returnflag")
  }

  /** q46 — dense time-grid resampling with LOCF gap-fill: the reporting
    * op q15's sparse hourly rollup cannot express — EVERY 15-minute bin of
    * the fixed window appears for every event type, empty bins carry
    * count 0 and the LAST OBSERVED bin sum forward (null before the
    * first observation). The grid is GENERATED, not scanned: types ×
    * 2880 bins = dimension-sized, built driver-free from `spark.range`;
    * the corpus contributes one combinable groupBy; the grid left-joins
    * the aggregates (broadcast — the grid is tiny and the agg is
    * group-count-sized); the carry-forward window is PARTITIONED BY
    * TYPE over grid rows only — bounded by the GRID, never the data, so
    * the plan survives any corpus size that keeps the reporting window
    * fixed. Bins are epoch-second BIGINTs end to end (timestamp→long is
    * an epoch floor on both engines — no timezone or format surface
    * anywhere). */
  private def q46(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val binSec = 900L // 15 min — fine enough that real gaps exist
    val start = 1704067200L // 2024-01-01T00:00:00Z
    val nBins = 2880L // 30 days
    val ev = events(s, d)
    val agg = ev
      .select($"event_type",
        (($"ts".cast("long") - start).cast("long")).as("off"), $"value")
      .filter($"off" >= 0 && $"off" < nBins * binSec)
      .withColumn("bin_sec", lit(start) + expr(s"off div $binSec") * binSec)
      .groupBy($"event_type", $"bin_sec")
      .agg(count(lit(1)).as("n_events"), dsum($"value").as("bin_sum"))
    val grid = ev.select($"event_type").distinct()
      .crossJoin(s.range(nBins).select((lit(start) + $"id" * binSec).as("bin_sec")))
    val w = Window.partitionBy($"event_type").orderBy($"bin_sec")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(broadcast(agg), Seq("event_type", "bin_sec"), "left")
      .na.fill(0L, Seq("n_events"))
      .withColumn("filled_sum", last($"bin_sum", ignoreNulls = true).over(w))
      .select($"event_type", $"bin_sec", $"n_events", $"bin_sum", $"filled_sum")
      .orderBy($"event_type", $"bin_sec")
  }
  private val q46Sql =
    s"""WITH ev AS (SELECT event_type,
       |    (epoch_us(ts) // 1000000) - 1704067200 AS off, value
       |  FROM events),
       |a AS (SELECT event_type,
       |    1704067200 + (off // 900) * 900 AS bin_sec,
       |    COUNT(*) AS n_events, ${dsumSql("value")} AS bin_sum
       |  FROM ev WHERE off >= 0 AND off < 2880 * 900
       |  GROUP BY 1, 2),
       |types AS (SELECT DISTINCT event_type FROM events),
       |grid AS (SELECT t.event_type, 1704067200 + i.range * 900 AS bin_sec
       |  FROM types t CROSS JOIN range(0, 2880) i),
       |j AS (SELECT g.event_type, g.bin_sec,
       |    CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events, a.bin_sum
       |  FROM grid g LEFT JOIN a USING (event_type, bin_sec))
       |SELECT event_type, CAST(bin_sec AS BIGINT) AS bin_sec, n_events, bin_sum,
       |  last_value(bin_sum IGNORE NULLS) OVER (PARTITION BY event_type
       |    ORDER BY bin_sec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS filled_sum
       |FROM j ORDER BY event_type, bin_sec""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q01_agg_pricing", "grouped agg w/ exact decimal sums (A1/A2)", q01, Some(q01Sql)),
    Q("q02_filter_project", "pushdown filter + pruned projection (P1/P4)", q02, Some(q02Sql)),
    Q("q03_join_left_broadcast", "left outer broadcast join (J1)", q03, Some(q03Sql)),
    Q("q04_join_composite_key", "composite-key join of two aggs (J2)", q04, Some(q04Sql)),
    Q("q05_join_star", "5-table star join + agg (TPC-H Q5 shape)", q05, Some(q05Sql)),
    Q("q06_join_anti", "anti join = FK integrity check (S9)", q06, Some(q06Sql)),
    Q("q07_window_dedup", "row_number dedup = upsert kernel (§2.8)", q07, Some(q07Sql)),
    Q("q08_window_running", "cumulative window sum", q08, Some(q08Sql)),
    Q("q09_topk", "top-k via TakeOrderedAndProject", q09, Some(q09Sql)),
    Q("q10_set_except", "EXCEPT distinct", q10, Some(q10Sql)),
    Q("q11_set_intersect_union", "INTERSECT + UNION distinct", q11, Some(q11Sql)),
    Q("q12_distinct", "DISTINCT projection", q12, Some(q12Sql)),
    Q("q13_rollup", "ROLLUP + grouping()", q13, Some(q13Sql)),
    Q("q14_cube", "CUBE over two dims", q14, Some(q14Sql)),
    Q("q15_events_hourly", "tumbling-window batch agg (§2.7)", q15, Some(q15Sql)),
    Q("q16_limit", "ordered LIMIT (P7)", q16, Some(q16Sql)),
    Q("q17_coord_swap", "conditional coord swap + range filter (P8)", q17, Some(q17Sql)),
    Q("q18_regex_extract", "regexp field extraction (F6/F10/F11)", q18, Some(q18Sql)),
    Q("q19_norm_text", "punctuation/space normalization (F1)", q19, Some(q19Sql)),
    Q("q20_clean_num", "numeric scrub (F3)", q20, Some(q20Sql)),
    Q("q21_dms_to_decimal", "DMS → decimal degrees (F4/F17)", q21, Some(q21Sql)),
    Q("q22_normalize_api", "API reformat NN-NNN-NNNNN (F5)", q22, Some(q22Sql)),
    Q("q23_coalesce_chain", "extractor fallback chain (F14)", q23, Some(q23Sql)),
    Q("q24_null_ladder", "N/A / blank / '' null semantics (F20-F22)", q24, Some(q24Sql)),
    Q("q25_semi_join_subquery", "IN-subquery semi join", q25, Some(q25Sql)),
    Q("q26_quality_stats", "load-quality counters (A1)", q26, Some(q26Sql)),
    Q("q27_merge_upsert", "last-writer-wins merge (§2.8)", q27, Some(q27Sql)),
    Q("q28_count_distinct", "exact grouped count-distinct", q28, Some(q28Sql)),
    Q("q29_sessionize", "gap-based sessionization (§2.7)", q29, Some(q29Sql)),
    Q("q30_collect_listagg", "sorted collect_set + listagg", q30, Some(q30Sql)),
    Q("q31_scalar_subquery", "filter vs global scalar aggregate", q31, Some(q31Sql)),
    Q("q32_pivot", "weekday pivot of event counts", q32, Some(q32Sql)),
    Q("q33_asof_join", "as-of join: latest click before each purchase", q33, Some(q33Sql)),
    Q("q34_json_extract", "JSON props field extraction + rollup", q34, Some(q34Sql)),
    Q("q35_rank_family", "rank/dense_rank/ntile/lead/lag one-pass", q35, Some(q35Sql)),
    Q("q36_tpch_q3", "selective filter + 3-way join + top revenue", q36, Some(q36Sql)),
    Q("q37_having_join_back", "HAVING agg joined back to detail", q37, Some(q37Sql)),
    Q("q38_range_window", "per-user rolling 30-min RANGE-frame sum", q38, Some(q38Sql)),
    Q("q39_band_join", "same-user event pairs within 5 min (bucketed band join)", q39, Some(q39Sql)),
    Q("q40_unpivot", "wide day-of-week counts melted back to long form", q40, Some(q40Sql)),
    Q("q41_percentile", "exact interpolated percentiles per group", q41, Some(q41Sql)),
    Q("q47_percentile_histogram", "the same exact percentiles WITHOUT a corpus sort: domain-bounded histogram rollup + cumulative-rank bucket location + bucket-pruned second pass — the plan that replaces q41's single-reducer-per-group external sort at scale", q47, Some(q41Sql)),
    Q("q48_zorder_cells", "z-order (Morton) layout arithmetic: two dimensions quantized onto a 256x256 grid over observed domains, bits interleaved into one BIGINT curve value, 64 coarse cells rolled up with counts/extents/exact sums — the integer tree writeZOrdered range-partitions files on, all oracle-replayed", q48, Some(q48Sql)),
    Q("q49_salted_agg", "skew-mitigated aggregation: two-phase salted partial/merge rollup over the hottest possible key (3 groups over the whole table) — result pinned identical to the plain groupBy by the unsalted oracle", q49, Some(q49Sql)),
    Q("q50_salted_join", "skew-mitigated join: small side replicated 8x so a hot key's probe rows spread over 8 reducers; brand-revenue rollup pinned identical to the plain join by the unsalted oracle", q50, Some(q50Sql)),
    Q("q42_grouping_sets", "explicit GROUPING SETS: two 1-D groupings + grand total, one pass", q42, Some(q42Sql)),
    Q("q43_grouped_topk", "top-3 orders per customer via bounded-buffer partial aggregation (no window)", q43, Some(q43Sql)),
    Q("q44_change_intervals", "SCD2 state-history build: consecutive-dedup + change intervals from the event log, one partitioning for both windows", q44, Some(q44Sql)),
    Q("q45_kmv_distinct", "KMV bottom-k distinct sketch: mergeable bounded-buffer cardinality estimate per group, integer-exact and oracle-replayed (vs q28's exact shuffle)", q45, Some(q45Sql)),
    Q("pp23_incremental_sketch", "incremental distinct-sketch maintenance: standing bottom-k merged row-locally with the batch sketch (exact under overlap), estimate == q45", pp23, Some(q45Sql)),
    Q("q46_gapfill_locf", "dense time-grid resampling: generated 15-min bins x types, empty bins at count 0 with last-observed sum carried forward (grid-bounded window, never the data)", q46, Some(q46Sql)),
  )
}
