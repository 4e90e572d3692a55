package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.OpDef
import graft.sources.Tables

/** Core relational surface of the reference engine (sotah-inc/server):
  * pricelists, price histories, top-N sellers, item search, unmet demand,
  * rollups — re-expressed as declarative Spark plans over the star schema.
  *
  * Conventions shared with the DuckDB oracles:
  *  - double outputs are rounded with a +1e-6 (resp. 1e-8/1e-10 at 4/6dp)
  *    epsilon applied IDENTICALLY in both engines. The epsilon shifts
  *    exact-half quotients (e.g. sums of cents divided by a count) off the
  *    rounding boundary, where Spark (shortest-decimal-string HALF_UP) and
  *    DuckDB (binary-value rounding) systematically disagree;
  *  - every query has a total deterministic ORDER BY (ties broken by keys);
  *  - counts are BIGINT in both engines (DuckDB integer sums are cast).
  */
object Relational {

  private[operators] def r2e(c: Column): Column = round(c + lit(1e-6), 2)
  private[operators] def r4e(c: Column): Column = round(c + lit(1e-8), 4)
  private[operators] def r6e(c: Column): Column = round(c + lit(1e-10), 6)
  private val revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Runs SQL that needs a DataFrame as input via a per-invocation unique
    * temp view (fixed names would let two concurrent builders in one session
    * race each other). Spark analyzes SQL eagerly, so the view is safe to
    * drop as soon as [[SparkSession.sql]] returns the (lazy) DataFrame.
    */
  private[operators] def sqlOverView(s: SparkSession, base: DataFrame)(
      sql: String => String): DataFrame = {
    val view = "graft_v_" + java.util.UUID.randomUUID().toString.replace("-", "")
    base.createOrReplaceTempView(view)
    try s.sql(sql(view)) finally s.catalog.dropTempView(view)
  }

  /** q42's profile pass; `approx = true` is the 100-TB form — the exact
    * per-column DISTINCT (one Expand: scan rows × #columns map-side)
    * becomes approx_count_distinct at q30's tuned 2.3% rsd, erasing the
    * Expand while every other aggregate, the stack unpivot, and the
    * single-scan shape stay bit-identical.
    */
  private[graft] def profileDf(s: SparkSession, d: String,
      approx: Boolean): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}_n"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
      (if (approx) approx_count_distinct(col(c), 0.023)
       else countDistinct(col(c))).as(s"${c}_nd"),
      round(min(col(c)) + lit(1e-8), 4).as(s"${c}_min"),
      round(max(col(c)) + lit(1e-8), 4).as(s"${c}_max"),
      round(avg(col(c)) + lit(1e-8), 4).as(s"${c}_mean")) }
    Tables.lineitem(s, d)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr("stack(4, " + cols.map(c =>
          s"'$c', ${c}_n, ${c}_nulls, ${c}_nd, " +
          s"${c}_min, ${c}_max, ${c}_mean").mkString(", ") +
        ") AS (col_name, n, n_null, n_distinct, min_v, max_v, mean_v)")
      .orderBy("col_name")
  }

  /** q33's catalog-name normalization: lowercase, accents folded,
    * punctuation runs collapsed to single spaces — ONE definition shared
    * by the scan search (q33), the posting-index build, and the probe
    * (q46), so index and scan can never disagree on what a name "is".
    */
  private[graft] def normName(c: Column): Column = {
    val accents = "àáâäéèêëíìîïóòôöúùûüñç"
    val folded = "aaaaeeeeiiiioooouuuunc"
    trim(regexp_replace(translate(lower(c), accents, folded),
      "[^a-z0-9]+", " "))
  }

  /** q46's persisted posting index: one row per (part, distinct trigram
    * of the normalized name), COVERING (p_name/norm_name ride along so a
    * probe never touches the catalog), laid out partitioned by the
    * gram's first character so a probe's handful of grams directory-
    * prunes to a handful of partitions. Memoized per part-table content
    * stamp (the AnnIndexLake discipline): built once per corpus, then
    * every search is index-only. At a 100M-row catalog the index is
    * ~30x the name bytes (mean norm length ~30) — the classic
    * space-for-latency posting trade — and the build is one scan +
    * one shuffle on g1.
    */
  private[graft] def searchIndexDir(s: SparkSession, d: String): String = {
    // the stamp embeds the source path — hex-digest it into a dir name
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(Tables.stamp(d, "part").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val dir = s"${Lake.scratch("q46", d)}/idx_$key"
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"),
                normName(col("p_name")).as("norm_name"))
        .withColumn("gram", explode(array_distinct(expr(
          // sequence(1, n) is DESCENDING for n < 1, so guard short names
          """CASE WHEN length(norm_name) >= 3
            |THEN transform(sequence(1, length(norm_name) - 2),
            |               i -> substring(norm_name, i, 3))
            |ELSE array() END""".stripMargin))))
        .withColumn("g1", substring(col("gram"), 1, 1))
        .repartition(col("g1"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("g1").parquet(dir)
    }
    dir
  }

  /** q46's probe: trigrams of the (>=3-char, normalized) query term,
    * partition-pruned postings filter, candidates = parts carrying ALL
    * query trigrams (necessary for a substring hit, so no match is ever
    * lost), then the EXACT q33 predicate re-checked on the candidates'
    * covering columns — same rows, same ranking, no catalog scan.
    */
  private[graft] def indexedSearch(s: SparkSession, d: String,
      term: String): DataFrame = {
    val grams = term.sliding(3).toSeq.distinct
    val g1s = grams.map(_.substring(0, 1)).distinct
    s.read.parquet(searchIndexDir(s, d))
      .filter(col("g1").isin(g1s: _*) && col("gram").isin(grams: _*))
      .groupBy("p_partkey")
      .agg(count(lit(1)).as("ng"),
           first("p_name").as("p_name"),
           first("norm_name").as("norm_name"))
      .filter(col("ng") === grams.size)
      .withColumn("pos", instr(col("norm_name"), term))
      .filter(col("pos") > 0)
      .withColumn("prefix_hit",
        when(instr(concat(lit(" "), col("norm_name")), s" $term") > 0, 1)
          .otherwise(0))
      .select("p_partkey", "p_name", "norm_name", "prefix_hit", "pos")
      .orderBy(col("prefix_hit").desc, col("pos"), col("p_partkey"))
  }

  /** q43's body over an arbitrary data dir — shared with SkewJoinSpec
    * (which lowers the AQE skew thresholds to force the split at test
    * scale) and the sf-ladder probe. The remap sends ~30% of lineitem to
    * order key 1; `hint("merge")` pins sort-merge so neither the gate's
    * small orders side nor AQE's runtime size check turns the join into
    * a broadcast that would sidestep the skew machinery.
    */
  /** q45's SCD Type-2 dimension (one row per (customer, priority run)
    * with [valid_from_us, valid_to_us) validity — NULL valid_to = the
    * current version), shared with q50's point-in-time join. ONE window
    * shape for all three passes: partition by customer, order (date ASC,
    * orderkey DESC) — so "first row per date" IS the max-orderkey
    * observation, and the grain dedup needs no second partition key (a
    * (custkey, date) window would cost its own Exchange).
    */
  private[graft] def scd2Dim(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey").desc)
    val obs = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
              col("o_orderpriority").as("prio"))
      .withColumn("pdate", lag(col("o_orderdate"), 1).over(byKey))
      .filter(col("pdate").isNull || col("pdate") =!= col("o_orderdate"))
      .withColumn("prev", lag(col("prio"), 1).over(byKey))
      .filter(col("prev").isNull || col("prev") =!= col("prio"))
    obs
      .withColumn("version", row_number().over(byKey))
      .withColumn("valid_to_us",
        unix_micros(lead(col("o_orderdate"), 1).over(byKey)
          .cast("timestamp")))
      .select(col("o_custkey"), col("version"), col("prio"),
              unix_micros(col("o_orderdate").cast("timestamp"))
                .as("valid_from_us"),
              col("valid_to_us"))
  }

  /** q45/q50's shared oracle CTE chain: `dim` is the SCD2 dimension. */
  private[graft] val duckScd2Cte: String =
    """g AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority AS prio
      |  FROM (SELECT *, lag(o_orderdate) OVER w AS pdate FROM orders
      |        WINDOW w AS (PARTITION BY o_custkey
      |                     ORDER BY o_orderdate, o_orderkey DESC))
      |  WHERE pdate IS NULL OR pdate <> o_orderdate),
      |obs AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, prio,
      |         lag(prio) OVER w AS prev
      |  FROM g
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_orderdate, o_orderkey DESC)),
      |runs AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, prio
      |  FROM obs WHERE prev IS NULL OR prev <> prio),
      |dim AS (
      |  SELECT o_custkey,
      |         CAST(row_number() OVER w AS INT) AS version,
      |         prio,
      |         epoch_us(o_orderdate) AS valid_from_us,
      |         epoch_us(lead(o_orderdate) OVER w) AS valid_to_us
      |  FROM runs
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_orderdate, o_orderkey DESC))""".stripMargin

  private[graft] def skewJoinAgg(s: SparkSession, d: String): DataFrame = {
    val f = Tables.lineitem(s, d)
      .withColumn("k",
        when(col("l_orderkey") % 10 < 3, lit(1L)).otherwise(col("l_orderkey")))
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
    f.join(o.hint("merge"), col("k") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
           r2e(sum(col("l_extendedprice").cast("decimal(18,2)"))
             .cast("double")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  val defs: Map[String, OpDef] = Map(

    // Per-item pricelist: min/max/avg/volume per part (reference: per-item
    // auction pricelists). Pure map-side-combinable aggregation.
    "q01_pricelist" -> OpDef.sql(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(
          count(lit(1)).as("n_auctions"),
          r2e(sum("l_quantity")).as("volume"),
          r2e(min("l_extendedprice")).as("min_price"),
          r2e(max("l_extendedprice")).as("max_price"),
          r2e(avg("l_extendedprice")).as("avg_price"))
        .orderBy("l_partkey"),
      """SELECT l_partkey,
        |       count(*) AS n_auctions,
        |       round(sum(l_quantity) + 1e-6, 2) AS volume,
        |       round(min(l_extendedprice) + 1e-6, 2) AS min_price,
        |       round(max(l_extendedprice) + 1e-6, 2) AS max_price,
        |       round(avg(l_extendedprice) + 1e-6, 2) AS avg_price
        |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin),

    // Filtered scan + single-row agg (TPC-H Q6 shape): filters/projection
    // must reach the parquet scan (PushedFilters).
    "q02_filter_scan" -> OpDef.sql(
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
                col("l_shipdate") <  to_timestamp(lit("1997-01-01")) &&
                col("l_discount").between(0.03, 0.08) &&
                col("l_quantity") < 25)
        .agg(count(lit(1)).as("n"),
             r2e(sum(col("l_extendedprice") * col("l_discount"))).as("revenue")),
      """SELECT count(*) AS n,
        |       round(sum(l_extendedprice * l_discount) + 1e-6, 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.08
        |  AND l_quantity < 25""".stripMargin),

    // Fact x dim broadcast join: revenue per brand (auctions x item catalog).
    "q03_broadcast_join" -> OpDef.sql(
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), r2e(sum(revenue)).as("revenue"))
        .orderBy("p_brand"),
      """SELECT p_brand, count(*) AS n,
        |       round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin),

    // 5-way join rollup (TPC-H Q5 shape): revenue per nation in a region.
    "q04_multi_join" -> OpDef.sql(
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o  = Tables.orders(s, d)
        val c  = Tables.customer(s, d)
        val n  = Tables.nation(s, d)
        val r  = Tables.region(s, d).filter(col("r_name") === "ASIA")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
                  col("o_orderdate") <  to_timestamp(lit("1999-01-01")))
          .groupBy("n_name")
          .agg(r2e(sum(revenue)).as("revenue"))
          .orderBy(desc("revenue"), col("n_name"))
      },
      """SELECT n_name,
        |       round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),

    // Top-N sellers: top 10 customers by order revenue, ties broken by key.
    "q05_topn" -> OpDef.sql(
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(r2e(sum("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(10),
      """SELECT c_custkey, c_name, revenue, n_orders FROM (
        |  SELECT o_custkey, round(sum(o_totalprice) + 1e-6, 2) AS revenue,
        |         count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey) a
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin),

    // Top-k per group via window rank: 3 priciest parts per brand.
    "q06_topk_group" -> OpDef.sql(
      (s, d) => {
        val w = Window.partitionBy("p_brand")
          .orderBy(desc("p_retailprice"), col("p_partkey"))
        Tables.part(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("p_brand", "rk", "p_partkey", "p_name", "p_retailprice")
          .orderBy("p_brand", "rk")
      },
      """SELECT p_brand, rk, p_partkey, p_name, p_retailprice FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey
        |  ) AS INT) AS rk FROM part) t
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin),

    // Daily price history (reference: per-day min/avg/max price + volume).
    "q07_price_history" -> OpDef.sql(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(count(lit(1)).as("n"),
             r2e(min("l_extendedprice")).as("min_price"),
             r2e(avg("l_extendedprice")).as("avg_price"),
             r2e(max("l_extendedprice")).as("max_price"),
             r2e(sum("l_quantity")).as("volume"))
        .orderBy("day"),
      """SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n,
        |       round(min(l_extendedprice) + 1e-6, 2) AS min_price,
        |       round(avg(l_extendedprice) + 1e-6, 2) AS avg_price,
        |       round(max(l_extendedprice) + 1e-6, 2) AS max_price,
        |       round(sum(l_quantity) + 1e-6, 2) AS volume
        |FROM lineitem GROUP BY 1 ORDER BY day""".stripMargin),

    // Exact distinct counts per segment (unique buyers with orders).
    "q08_distinct" -> OpDef.sql(
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(countDistinct(col("o_custkey")).as("n_buyers"),
             count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment"),
      """SELECT c_mktsegment, count(DISTINCT o_custkey) AS n_buyers,
        |       count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // EXISTS / left-semi: customers having at least one finalized order.
    "q09_semi_join" -> OpDef.sql(
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin),

    // NOT EXISTS / left-anti: catalog parts with no auction activity in the
    // recent window (reference: unmet demand — demanded items with no live
    // auctions). The anti-join probe side is filtered BEFORE the join so
    // the pushed predicate shrinks the build at scale.
    "q10_unmet_demand" -> OpDef.sql(
      (s, d) => Tables.part(s, d)
        .join(Tables.lineitem(s, d)
                .filter(col("l_shipdate") >= to_timestamp(lit("2001-01-01"))),
              col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey"),
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey
        |                    AND l_shipdate >= TIMESTAMP '2001-01-01')
        |ORDER BY p_partkey""".stripMargin),

    // Union of heterogeneous sources: entity counts per nation.
    "q11_union" -> OpDef.sql(
      (s, d) => {
        val n = broadcast(Tables.nation(s, d))
        val cust = Tables.customer(s, d)
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(count(lit(1)).as("n_entities"))
          .withColumn("entity_type", lit("customer"))
        val supp = Tables.supplier(s, d)
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(count(lit(1)).as("n_entities"))
          .withColumn("entity_type", lit("supplier"))
        cust.unionByName(supp)
          .select("n_name", "entity_type", "n_entities")
          .orderBy("n_name", "entity_type")
      },
      """SELECT n_name, entity_type, n_entities FROM (
        |  SELECT n_name, 'customer' AS entity_type, count(*) AS n_entities
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name
        |  UNION ALL
        |  SELECT n_name, 'supplier' AS entity_type, count(*) AS n_entities
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name)
        |ORDER BY n_name, entity_type""".stripMargin),

    // Pivoted conditional aggregation: revenue per priority x status grid.
    "q12_pivot" -> OpDef.sql(
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          r2e(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0))).as("f_total"),
          r2e(sum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0))).as("o_total"),
          r2e(sum(when(col("o_orderstatus") === "P", col("o_totalprice")).otherwise(0.0))).as("p_total"))
        .orderBy("o_orderpriority"),
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END) + 1e-6, 2) AS f_total,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END) + 1e-6, 2) AS o_total,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0.0 END) + 1e-6, 2) AS p_total
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),

    // Hierarchical ROLLUP (reference: realm -> region -> global rollups).
    "q13_rollup" -> OpDef.sql(
      (s, d) => {
        // Spark SQL ROLLUP (the DataFrame rollup + post-agg coalesce trips
        // the ambiguous-self-join detector on the Expand node's lineage).
        val base = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .select("r_name", "n_name", "c_acctbal")
        sqlOverView(s, base)(view => s"""SELECT coalesce(r_name, 'ALL') AS region,
          |       coalesce(n_name, 'ALL') AS nation,
          |       count(*) AS n_customers,
          |       round(sum(c_acctbal) + 1e-6, 2) AS total_bal
          |FROM $view
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY region, nation""".stripMargin)
      },
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(n_name, 'ALL') AS nation,
        |       count(*) AS n_customers,
        |       round(sum(c_acctbal) + 1e-6, 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name) ORDER BY region, nation""".stripMargin),

    // Post-aggregation filter (HAVING) on the rounded aggregate.
    "q14_having" -> OpDef.sql(
      (s, d) => Tables.part(s, d)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"), r2e(avg("p_retailprice")).as("avg_price"))
        .filter(col("avg_price") > 950.0)
        .orderBy("p_brand"),
      """SELECT p_brand, count(*) AS n_parts,
        |       round(avg(p_retailprice) + 1e-6, 2) AS avg_price
        |FROM part GROUP BY p_brand
        |HAVING round(avg(p_retailprice) + 1e-6, 2) > 950.0
        |ORDER BY p_brand""".stripMargin),

    // Exact percentiles (reference: median buyout): linear interpolation.
    "q15_percentile" -> OpDef.sql(
      (s, d) => Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(round(expr("percentile(c_acctbal, 0.5)") + lit(1e-8), 4).as("median_bal"),
             round(expr("percentile(c_acctbal, 0.9)") + lit(1e-8), 4).as("p90_bal"),
             count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
      """SELECT c_mktsegment,
        |       round(quantile_cont(c_acctbal, 0.5) + 1e-8, 4) AS median_bal,
        |       round(quantile_cont(c_acctbal, 0.9) + 1e-8, 4) AS p90_bal,
        |       count(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // Conditional bucket counts (price-band histogram shape).
    "q16_case_agg" -> OpDef.sql(
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("n_urgent"),
          sum(when(col("o_orderpriority") === "3-MEDIUM", 1L).otherwise(0L)).as("n_medium"),
          sum(when(col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"), 1L).otherwise(0L)).as("n_low"))
        .orderBy("o_orderstatus"),
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 1 ELSE 0 END) AS BIGINT) AS n_low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin),

    // Aggregate-subquery join-back: customers above their nation's average.
    "q17_sub_avg" -> OpDef.sql(
      (s, d) => {
        val avgs = Tables.customer(s, d)
          .groupBy("c_nationkey")
          .agg(r2e(avg("c_acctbal")).as("nation_avg"))
          .withColumnRenamed("c_nationkey", "nk")
        Tables.customer(s, d)
          .join(broadcast(avgs), col("c_nationkey") === col("nk"))
          .filter(col("c_acctbal") > col("nation_avg"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey", "c_name", "n_name", "c_acctbal", "nation_avg")
          .orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name, n_name, c_acctbal, nation_avg
        |FROM customer
        |JOIN (SELECT c_nationkey AS nk, round(avg(c_acctbal) + 1e-6, 2) AS nation_avg
        |      FROM customer GROUP BY c_nationkey) a ON c_nationkey = nk
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > nation_avg
        |ORDER BY c_custkey""".stripMargin),

    // Share-of-total ratio (reference: per-owner share of realm volume).
    // Deliberately NOT a Window.partitionBy(n_name): 25 distinct nations
    // caps the window exchange at 25 tasks on any cluster size. Instead
    // the per-supplier aggregate (supplier-sized, persisted once) feeds a
    // tiny nation-totals aggregate that broadcast-joins back — full scan
    // parallelism, one lineitem pass, same oracle hash.
    "q18_owner_share" -> OpDef.sql(
      (s, d) => {
        val perSupp = graft.Caching.persistTracked("q18_per_supp",
          Tables.lineitem(s, d)
            .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
            .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
            .groupBy("n_name", "s_suppkey", "s_name")
            .agg(r2e(sum(revenue)).as("supp_revenue")))
        val totals = perSupp.groupBy("n_name")
          .agg(sum("supp_revenue").as("nation_revenue"))
        perSupp.join(broadcast(totals), "n_name")
          .withColumn("share", r6e(col("supp_revenue") / col("nation_revenue")))
          .select("n_name", "s_suppkey", "s_name", "supp_revenue", "share")
          .orderBy("n_name", "s_suppkey")
      },
      """SELECT n_name, s_suppkey, s_name, supp_revenue,
        |       round(supp_revenue / sum(supp_revenue) OVER (PARTITION BY n_name) + 1e-10, 6) AS share
        |FROM (
        |  SELECT n_name, s_suppkey, s_name,
        |         round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS supp_revenue
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name, s_suppkey, s_name)
        |ORDER BY n_name, s_suppkey""".stripMargin),

    // Substring item search (reference: query-items endpoint) with
    // relevance ordering: earlier match position ranks higher, key breaks
    // ties.
    "q19_item_search" -> OpDef.sql(
      (s, d) => Tables.part(s, d)
        .withColumn("pos", instr(lower(col("p_name")), "widget"))
        .filter(col("pos") > 0)
        .select("p_partkey", "p_name", "p_brand", "pos")
        .orderBy("pos", "p_partkey"),
      """SELECT p_partkey, p_name, p_brand,
        |       CAST(strpos(lower(p_name), 'widget') AS INT) AS pos
        |FROM part WHERE strpos(lower(p_name), 'widget') > 0
        |ORDER BY pos, p_partkey""".stripMargin),

    // Normalized-name item search (reference: the query-items endpoint's
    // normalized-name match, complementing q19's raw substring). The name
    // is folded to a canonical form — lowercase, accents stripped,
    // punctuation runs collapsed to single spaces — then searched, with
    // word-prefix hits ranked above mid-word hits. Pure per-row codegen'd
    // string ops: scan-speed at any scale, same plan shape as q19.
    "q33_item_search_norm" -> OpDef.sql(
      (s, d) => {
        Tables.part(s, d)
          .withColumn("norm_name", normName(col("p_name")))
          .withColumn("pos", instr(col("norm_name"), "widget"))
          .filter(col("pos") > 0)
          .withColumn("prefix_hit",
            when(instr(concat(lit(" "), col("norm_name")), " widget") > 0, 1)
              .otherwise(0))
          .select("p_partkey", "p_name", "norm_name", "prefix_hit", "pos")
          .orderBy(col("prefix_hit").desc, col("pos"), col("p_partkey"))
      },
      """WITH n AS (
        |  SELECT p_partkey, p_name,
        |         trim(regexp_replace(
        |           translate(lower(p_name),
        |             'àáâäéèêëíìîïóòôöúùûüñç', 'aaaaeeeeiiiioooouuuunc'),
        |           '[^a-z0-9]+', ' ', 'g')) AS norm_name
        |  FROM part)
        |SELECT p_partkey, p_name, norm_name,
        |       CASE WHEN strpos(' ' || norm_name, ' widget') > 0
        |            THEN 1 ELSE 0 END AS prefix_hit,
        |       CAST(strpos(norm_name, 'widget') AS INT) AS pos
        |FROM n WHERE strpos(norm_name, 'widget') > 0
        |ORDER BY prefix_hit DESC, pos, p_partkey""".stripMargin),

    // q46: q33's INDEXED path — the repeated-search / 100M-row-catalog
    // form of item search. q19/q33 answer one query with a full catalog
    // scan + LIKE; an interactive endpoint answering the same shape
    // thousands of times a day should probe a persisted posting index
    // instead (d32's inverted-index discipline applied to the catalog).
    // See [[searchIndexDir]] (covering trigram postings, partitioned by
    // gram prefix, memoized per catalog content stamp) and
    // [[indexedSearch]] (partition-pruned probe + exact residual
    // re-check). Same oracle as q33 VERBATIM — index and scan must be
    // indistinguishable to a caller; IndexedSearchSpec additionally pins
    // the index-only plan (zero part.parquet files in the probe's scan,
    // only the probed gram partitions read) and build-once reuse.
    "q46_indexed_search" -> OpDef.sql(
      (s, d) => indexedSearch(s, d, "widget"),
      """WITH n AS (
        |  SELECT p_partkey, p_name,
        |         trim(regexp_replace(
        |           translate(lower(p_name),
        |             'àáâäéèêëíìîïóòôöúùûüñç', 'aaaaeeeeiiiioooouuuunc'),
        |           '[^a-z0-9]+', ' ', 'g')) AS norm_name
        |  FROM part)
        |SELECT p_partkey, p_name, norm_name,
        |       CASE WHEN strpos(' ' || norm_name, ' widget') > 0
        |            THEN 1 ELSE 0 END AS prefix_hit,
        |       CAST(strpos(norm_name, 'widget') AS INT) AS pos
        |FROM n WHERE strpos(norm_name, 'widget') > 0
        |ORDER BY prefix_hit DESC, pos, p_partkey""".stripMargin),

    // Calendar breakdown: monthly order counts + revenue.
    "q20_date_parts" -> OpDef.sql(
      (s, d) => Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"), r2e(sum("o_totalprice")).as("revenue"))
        .orderBy("yr", "mo"),
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice) + 1e-6, 2) AS revenue
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin),

    // Cumulative window sum over the daily series (token-history shape).
    //
    // INVARIANT (q21/q22/q23): the global (partition-less) Window.orderBy
    // here is safe ONLY because it runs on the POST-AGGREGATION daily
    // series — one row per distinct l_shipdate, ~2.5k rows for a 7-year
    // calendar — which is calendar-bounded and does NOT grow with the
    // fact table. At 100 TB the lineitem scan + partial agg do the work;
    // the single-partition window sees the same few thousand rows it sees
    // at sf0.01. Never move such a window BELOW an aggregation (onto
    // fact-table-sized input); that is the q18 anti-pattern this file
    // deliberately avoids.
    "q21_running_total" -> OpDef.sql(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(r2e(sum(revenue)).as("day_revenue"))
        val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
        daily.withColumn("cum_revenue", r2e(sum("day_revenue").over(w)))
          .orderBy("day")
      },
      """SELECT day, day_revenue,
        |       round(sum(day_revenue) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1e-6, 2) AS cum_revenue
        |FROM (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS day_revenue
        |  FROM lineitem GROUP BY 1)
        |ORDER BY day""".stripMargin),

    // Lag delta vs previous day (reference: price change vs yesterday).
    "q22_lag_delta" -> OpDef.sql(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(r2e(avg("l_extendedprice")).as("avg_price"))
        val w = Window.orderBy("day")
        daily
          .withColumn("prev_price", lag("avg_price", 1).over(w))
          .withColumn("delta", r2e(col("avg_price") - col("prev_price")))
          .orderBy("day")
      },
      """SELECT day, avg_price, prev_price,
        |       round(avg_price - prev_price + 1e-6, 2) AS delta
        |FROM (
        |  SELECT day, avg_price,
        |         lag(avg_price, 1) OVER (ORDER BY day) AS prev_price
        |  FROM (
        |    SELECT CAST(l_shipdate AS DATE) AS day,
        |           round(avg(l_extendedprice) + 1e-6, 2) AS avg_price
        |    FROM lineitem GROUP BY 1))
        |ORDER BY day""".stripMargin),

    // Trailing 7-row moving average over the daily series.
    "q23_moving_avg" -> OpDef.sql(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .groupBy(to_date(col("l_shipdate")).as("day"))
          .agg(r2e(avg("l_extendedprice")).as("avg_price"))
        val w = Window.orderBy("day").rowsBetween(-6, 0)
        daily.withColumn("ma7", r2e(avg("avg_price").over(w))).orderBy("day")
      },
      """SELECT day, avg_price,
        |       round(avg(avg_price) OVER (ORDER BY day
        |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 1e-6, 2) AS ma7
        |FROM (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         round(avg(l_extendedprice) + 1e-6, 2) AS avg_price
        |  FROM lineitem GROUP BY 1)
        |ORDER BY day""".stripMargin),

    // Semi-structured extraction from the JSON props payload. The
    // per-query get_json_object here is the correct shape for ad-hoc
    // extraction; a RECURRING 100-TB pipeline should pay the JSON parse
    // once at intake instead — Ingest.readEventDumps extracts props into
    // typed columns (withTypedProps) so lake queries like this become
    // plain column scans.
    "q24_json_extract" -> OpDef.sql(
      (s, d) => Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .withColumn("k_bucket", col("k") % 10)
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"), r2e(sum("value")).as("total_value"))
        .orderBy("k_bucket"),
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        |       count(*) AS n, round(sum(value) + 1e-6, 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin),

    // Exact-group collapse (reference: miniauctions — identical auctions
    // collapsed to one row + count).
    "q28_miniauctions" -> OpDef.sql(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_partkey", "l_extendedprice", "l_quantity")
        .agg(count(lit(1)).as("n_listings"))
        .orderBy("l_partkey", "l_extendedprice", "l_quantity"),
      """SELECT l_partkey, l_extendedprice, l_quantity, count(*) AS n_listings
        |FROM lineitem GROUP BY 1, 2, 3
        |ORDER BY l_partkey, l_extendedprice, l_quantity""".stripMargin),

    // Skew-safe two-phase aggregation: pre-aggregate on (key, salt) so a
    // heavy-hitter key spreads across 16 reducers before the final merge —
    // the manual fallback when AQE's skew handling can't kick in (e.g.
    // pre-shuffle skew into a single agg key). Result is identical to the
    // direct group-by, which is exactly what the oracle checks.
    "q29_salted_agg" -> OpDef.sql(
      (s, d) => Tables.lineitem(s, d)
        .withColumn("salt", pmod(hash(col("l_orderkey")), lit(16)))
        .groupBy("l_suppkey", "salt")
        .agg(count(lit(1)).as("pn"), sum("l_quantity").as("pq"),
             sum(revenue).as("pr"))
        .groupBy("l_suppkey")
        .agg(sum("pn").as("n"), r2e(sum("pq")).as("volume"),
             r2e(sum("pr")).as("revenue"))
        .orderBy("l_suppkey"),
      """SELECT l_suppkey, count(*) AS n,
        |       round(sum(l_quantity) + 1e-6, 2) AS volume,
        |       round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2) AS revenue
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin),

    // q29's JOIN-side twin: a fact-fact join on a planted heavy-hitter
    // key, the case where salting is NOT needed because AQE's
    // OptimizeSkewedJoin handles it at runtime — the hot shuffle
    // partition splits into task-sized slices, each joined against a
    // replicated copy of the matching build rows. 30% of lineitem
    // remaps its order key to ONE key, the join is pinned to sort-merge
    // (a broadcast would dodge the demonstration AND the skew), and the
    // post-join aggregate groups on a DIFFERENT key, so the split never
    // has to preserve the join's output partitioning. At gate scale the
    // hot partition sits under the 256 MB threshold and AQE leaves the
    // plan alone — correctness is what the oracle hashes; SkewJoinSpec
    // lowers the thresholds to force the split on THIS query, asserts
    // `skew=true` lands in the final adaptive plan, and proves the
    // split result row-identical to the unsplit one. The sf10 probe
    // (bench/BENCH_skew_probe_*.json) measures the win.
    "q43_skew_join" -> OpDef.sql(
      (s, d) => skewJoinAgg(s, d),
      """WITH f AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 1
        |              ELSE l_orderkey END AS k,
        |         l_extendedprice
        |  FROM lineitem)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |               AS DOUBLE) + 1e-6, 2) AS sum_price
        |FROM f JOIN orders ON o_orderkey = f.k
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // Full CUBE grouping sets (all region x segment combinations plus
    // both margins and the grand total) — the rollup family's other half.
    "q31_cube" -> OpDef.sql(
      (s, d) => {
        val base = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .select("r_name", "c_mktsegment", "c_acctbal")
        sqlOverView(s, base)(view => s"""SELECT coalesce(r_name, 'ALL') AS region,
          |       coalesce(c_mktsegment, 'ALL') AS segment,
          |       count(*) AS n_customers,
          |       round(sum(c_acctbal) + 1e-6, 2) AS total_bal
          |FROM $view
          |GROUP BY CUBE (r_name, c_mktsegment)
          |ORDER BY region, segment""".stripMargin)
      },
      """SELECT coalesce(r_name, 'ALL') AS region,
        |       coalesce(c_mktsegment, 'ALL') AS segment,
        |       count(*) AS n_customers,
        |       round(sum(c_acctbal) + 1e-6, 2) AS total_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, c_mktsegment)
        |ORDER BY region, segment""".stripMargin),

    // Sketch-based percentiles: the 100-TB answer to q15's exact
    // percentile (which buffers per-group value multisets). One pass,
    // bounded memory, mergeable. Approximate -> rows-only; the spec
    // bounds the error against the exact percentile.
    "q32_approx_percentile" -> OpDef.rowsOnly(
      (s, d) => Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(expr("approx_percentile(c_acctbal, 0.5, 1000)").as("median_bal"),
             expr("approx_percentile(c_acctbal, 0.9, 1000)").as("p90_bal"),
             count(lit(1)).as("n"))
        .orderBy("c_mktsegment")),

    // Sketch-based distinct counting (HyperLogLog++): the 100-TB answer to
    // q08's exact countDistinct — one pass, fixed memory, mergeable across
    // partitions. Approximate, so rows-only here; the spec bounds the
    // error against the exact count.
    //
    // rsd is 0.023 (2^12 registers), not 0.01: Spark's HLL++ has no sparse
    // encoding, so every per-row update walks a dense register array; at
    // rsd 0.01 that is 2^14 six-bit registers (~12 KB of aggregation buffer
    // per group) and the update loop is ~4x slower than the whole exact
    // countDistinct at sf0.1 — join-independent, measured 1.4-3.0 s vs
    // 0.55 s at 0.023 and 0.33 s exact. 0.023 keeps ~2x headroom under the
    // spec's 5% error bound while staying within ~2x of the exact twin.
    "q30_approx_distinct" -> OpDef.rowsOnly(
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(approx_count_distinct(col("o_custkey"), 0.023).as("approx_buyers"),
             count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")),

    // Latest-snapshot compaction: the newest listing per part (reference:
    // the CURRENT pricelist, vs q01's all-time stats) — and the general
    // CDC/upsert compaction shape: collapse a change log to its most
    // recent version per key. Recency order is (l_shipdate, l_orderkey,
    // l_linenumber) so the winner is total-ordered even when timestamps
    // collide. row_number partitioned by l_partkey: a HIGH-cardinality
    // partition key (sf·200k parts), so the window parallelizes with the
    // data — one hash shuffle + per-key sort, the same plan at 100 TB
    // (the q18 anti-pattern is only the LOW-cardinality window). A
    // max_by(struct, struct) aggregate would also be map-side combinable,
    // but DuckDB's arg_max/max_by cannot order by a struct, and the gate's
    // value is both engines running the SAME total order.
    "q34_latest_snapshot" -> OpDef.sql(
      (s, d) => {
        val w = Window.partitionBy("l_partkey")
          .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
                   col("l_linenumber").desc)
        Tables.lineitem(s, d)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("l_partkey"), to_date(col("l_shipdate")).as("as_of_day"),
                  col("l_orderkey"), col("l_linenumber"),
                  r2e(col("l_extendedprice")).as("cur_price"),
                  r2e(col("l_quantity")).as("cur_qty"))
          .orderBy("l_partkey")
      },
      """SELECT l_partkey, CAST(l_shipdate AS DATE) AS as_of_day,
        |       l_orderkey, l_linenumber,
        |       round(l_extendedprice + 1e-6, 2) AS cur_price,
        |       round(l_quantity + 1e-6, 2) AS cur_qty
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
        |        ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) AS rk
        |      FROM lineitem)
        |WHERE rk = 1 ORDER BY l_partkey""".stripMargin),

    // RANGE-frame sliding window: the 7-DAY moving average per brand —
    // q23's frame follows the ROWS axis (6 physical predecessor rows);
    // this one follows the VALUE axis (every row whose day falls in the
    // trailing calendar week), which differs exactly where a brand's
    // daily series has gaps — sparse series are the norm once the daily
    // table is per-dimension, so an operator inventory needs both frame
    // kinds. Order key = epoch-day integer so both engines run the same
    // numeric RANGE frame (interval frames desugar to this; the integer
    // form is the one DuckDB and Spark agree on bit-for-bit). The window
    // input is the calendar-bounded (brand x day) aggregate — ~25x2500
    // rows at ANY corpus scale — so the per-brand partition is the
    // q21/q23 post-agg shape, not the q18 low-cardinality anti-pattern:
    // the heavy lifting (the daily aggregate) shuffles on the
    // high-cardinality composite key and map-side combines.
    "q35_range_window" -> OpDef.sql(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
                col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), to_date(col("l_shipdate")).as("day"))
          .agg(r2e(avg("l_extendedprice")).as("avg_price"),
               count(lit(1)).as("n"))
          .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
        val w = Window.partitionBy("p_brand").orderBy("day_num")
          .rangeBetween(-6, 0)
        daily
          .withColumn("ma7_range", r2e(avg("avg_price").over(w)))
          .withColumn("n7", sum("n").over(w))
          .select("p_brand", "day", "avg_price", "ma7_range", "n7")
          .orderBy("p_brand", "day")
      },
      """SELECT p_brand, day, avg_price,
        |       round(avg(avg_price) OVER w + 1e-6, 2) AS ma7_range,
        |       CAST(sum(n) OVER w AS BIGINT) AS n7
        |FROM (
        |  SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
        |         round(avg(l_extendedprice) + 1e-6, 2) AS avg_price,
        |         count(*) AS n,
        |         CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS day_num
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2, 5)
        |WINDOW w AS (PARTITION BY p_brand ORDER BY day_num
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY p_brand, day""".stripMargin),

    // Calendar densification + forward fill: the time-series ETL staple
    // q35's gaps expose — downstream consumers (charting endpoints,
    // models training on daily features) want ONE row per (brand, day)
    // with the last known price carried across quiet days, not a sparse
    // series. Shape: aggregate first (the corpus-sized work, map-side
    // combinable), then per-brand `sequence(min_day, max_day)` exploded
    // into the dense calendar — dense rows are bounded by brands x
    // calendar days at ANY corpus scale — left-join the daily aggregate
    // back and forward-fill with last(ignoreNulls) over an
    // unbounded-preceding frame (the high-water-mark window idiom).
    // Gap days carry n = 0 and the carried price; is_gap marks them.
    "q36_gap_fill" -> OpDef.sql(
      (s, d) => {
        // persisted because BOTH branches below (calendar bounds + the
        // join back) consume it: without the cache Catalyst rewrites the
        // min/max branch to re-aggregate straight off the corpus scan —
        // two full corpus reads for one bounded (brand x day)
        // intermediate, exactly the 2x a 100-TB plan can't afford
        val daily = graft.Caching.persistTracked("q36_daily",
          Tables.lineitem(s, d)
            .join(broadcast(Tables.part(s, d)),
                  col("l_partkey") === col("p_partkey"))
            .groupBy(col("p_brand"), to_date(col("l_shipdate")).as("day"))
            .agg(r2e(avg("l_extendedprice")).as("avg_price"),
                 count(lit(1)).as("n")))
        val calendar = daily.groupBy("p_brand")
          .agg(min("day").as("d0"), max("day").as("d1"))
          .select(col("p_brand"),
                  explode(sequence(col("d0"), col("d1"))).as("day"))
        val w = Window.partitionBy("p_brand").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        calendar.join(daily, Seq("p_brand", "day"), "left")
          .select(col("p_brand"), col("day"),
                  coalesce(col("n"), lit(0L)).as("n"),
                  last("avg_price", ignoreNulls = true).over(w).as("px_ff"),
                  col("avg_price").isNull.as("is_gap"))
          .orderBy("p_brand", "day")
      },
      """WITH daily AS (
        |  SELECT p_brand, CAST(l_shipdate AS DATE) AS day,
        |         round(avg(l_extendedprice) + 1e-6, 2) AS avg_price,
        |         count(*) AS n
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |cal AS (
        |  SELECT p_brand, unnest(generate_series(min(day), max(day),
        |           INTERVAL 1 DAY))::DATE AS day
        |  FROM daily GROUP BY p_brand)
        |SELECT c.p_brand, c.day,
        |       COALESCE(d.n, 0) AS n,
        |       last_value(d.avg_price IGNORE NULLS) OVER (
        |         PARTITION BY c.p_brand ORDER BY c.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS px_ff,
        |       d.avg_price IS NULL AS is_gap
        |FROM cal c LEFT JOIN daily d
        |  ON c.p_brand = d.p_brand AND c.day = d.day
        |ORDER BY c.p_brand, c.day""".stripMargin),

    // Set operators: EXCEPT / INTERSECT (distinct semantics) — the
    // cohort algebra (churned = bought-then-stopped, retained = both
    // years, acquired = new) a retention analysis runs, and the two
    // relational operators the inventory was missing next to q11's
    // UNION and q09/q10's semi/anti joins. Spark plans both as
    // hash-partitioned distinct-aggregate joins on the full row — the
    // shuffle is on the already-distinct key set (one row per customer
    // x year BEFORE the set op, via the distinct), never the raw orders
    // table, so the set algebra costs one orders scan + one bounded
    // shuffle at any corpus scale.
    "q37_set_ops" -> OpDef.sql(
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
        def buyers(y: Int) =
          o.filter(col("yr") === y).select("o_custkey").distinct()
        val (y94, y95) = (buyers(1994), buyers(1995))
        y94.except(y95).withColumn("cohort", lit("churned"))
          .unionByName(y94.intersect(y95).withColumn("cohort", lit("retained")))
          .unionByName(y95.except(y94).withColumn("cohort", lit("acquired")))
          .select("cohort", "o_custkey")
          .orderBy("cohort", "o_custkey")
      },
      """WITH y94 AS (SELECT DISTINCT o_custkey FROM orders
        |            WHERE year(o_orderdate) = 1994),
        |     y95 AS (SELECT DISTINCT o_custkey FROM orders
        |            WHERE year(o_orderdate) = 1995)
        |SELECT 'churned' AS cohort, o_custkey
        |FROM (SELECT o_custkey FROM y94 EXCEPT SELECT o_custkey FROM y95)
        |UNION ALL
        |SELECT 'retained' AS cohort, o_custkey
        |FROM (SELECT o_custkey FROM y94 INTERSECT SELECT o_custkey FROM y95)
        |UNION ALL
        |SELECT 'acquired' AS cohort, o_custkey
        |FROM (SELECT o_custkey FROM y95 EXCEPT SELECT o_custkey FROM y94)
        |ORDER BY cohort, o_custkey""".stripMargin),

    // Pivot + unpivot round trip: q12 builds the wide grid by hand
    // (conditional aggregates); this entry runs Spark's ACTUAL
    // relational pivot operator (values enumerated up front — omitting
    // them costs an extra distinct-scan driver job, the thing to never
    // do at 100 TB) and then melts the grid back with unpivot. Dropping
    // the null cells an absent (priority, status) combination leaves
    // makes unpivot(pivot(X)) == X, which is exactly what the oracle
    // checks: the long form computed directly by group-by. Wide-to-long
    // is how a feature matrix ships to a trainer; long-to-wide is how
    // it comes back — both directions belong in the inventory.
    "q38_unpivot" -> OpDef.sql(
      (s, d) => {
        val wide = Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(r2e(sum("o_totalprice")))
        wide.unpivot(
            Array(col("o_orderpriority")),
            Array(col("F"), col("O"), col("P")),
            "status", "total")
          .filter(col("total").isNotNull)
          .orderBy("o_orderpriority", "status")
      },
      """SELECT o_orderpriority, o_orderstatus AS status,
        |       round(sum(o_totalprice) + 1e-6, 2) AS total
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_orderpriority, status""".stripMargin),

    // GROUPING SETS with a NON-hierarchical set list — the one grouping
    // shape q13's ROLLUP and q31's CUBE cannot express: the two
    // independent one-dimension marginals (per-returnflag and
    // per-linestatus) in ONE pass over the fact table. Spark plans this
    // as a single Expand + one combinable aggregate — one lineitem scan
    // where running the marginals separately would cost two; grouping_id
    // disambiguates which set a row belongs to (the NULLs in grouping
    // columns are markers, not data — same bit-vector semantics in both
    // engines: bit set = column aggregated away).
    "q39_grouping_sets" -> OpDef.sql(
      (s, d) => Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("int").as("gid"),
             sum("l_quantity").cast("long").as("sum_qty"),
             count(lit(1)).as("n"))
        .select("gid", "l_returnflag", "l_linestatus", "sum_qty", "n")
        .orderBy("gid", "l_returnflag", "l_linestatus"),
      """SELECT CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INT) AS gid,
        |       l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin),

    // Cohort retention matrix: customers bucketed by their FIRST order
    // month, then counted per (cohort, months-since-cohort) — q37 gives
    // the two-year churn verdicts, this is the full month-resolution
    // retention grid an analytics team actually charts. All month math
    // is INTEGER (linear month index y*12+m; never months_between or
    // date subtraction, whose fractional conventions differ across
    // engines). Two shuffles, both combinable: min-per-customer for the
    // cohort, then the grid count-distinct riding a shuffle on the
    // (cohort, offset) pair; the cohort join-back shuffles on custkey
    // (bucket the orders lake on custkey and it's exchange-free).
    "q41_retention" -> OpDef.sql(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_custkey"),
          (year(col("o_orderdate")) * lit(12) + month(col("o_orderdate")))
            .as("m"))
        val cohort = o.groupBy("o_custkey").agg(min("m").as("m0"))
        o.join(cohort, "o_custkey")
          .withColumn("m_offset", (col("m") - col("m0")).cast("int"))
          .groupBy("m0", "m_offset")
          .agg(countDistinct("o_custkey").as("n_cust"))
          .select(expr("CAST((m0 - 1) DIV 12 AS INT)").as("cohort_y"),
                  expr("CAST((m0 - 1) % 12 + 1 AS INT)").as("cohort_m"),
                  col("m_offset"), col("n_cust"))
          .orderBy("cohort_y", "cohort_m", "m_offset")
      },
      """WITH o AS (
        |  SELECT o_custkey,
        |         year(o_orderdate) * 12 + month(o_orderdate) AS m
        |  FROM orders),
        |c AS (SELECT o_custkey, min(m) AS m0 FROM o GROUP BY o_custkey)
        |SELECT CAST((m0 - 1) // 12 AS INT) AS cohort_y,
        |       CAST((m0 - 1) % 12 + 1 AS INT) AS cohort_m,
        |       CAST(m - m0 AS INT) AS m_offset,
        |       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_cust
        |FROM o JOIN c USING (o_custkey)
        |GROUP BY m0, m - m0
        |ORDER BY cohort_y, cohort_m, m_offset""".stripMargin),

    // Table profiling (the ANALYZE/data-quality pass an ETL pipeline
    // runs before trusting an intake): per-column non-null count, null
    // count, exact distinct count, min/max/mean — ONE scan for all
    // columns (the aggregates all ride the same pass; the per-column
    // DISTINCTs cost one Expand, multiplying scan rows by #profiled
    // columns map-side, still combinable). The wide one-row result is
    // unpivoted to a row per column with `stack`. The 100-TB form is
    // EXECUTABLE, not documented: profileDf(approx = true) swaps the
    // exact distinct for approx_count_distinct (q30's HLL path) with the
    // IDENTICAL plan otherwise — no Expand, one ordinary combinable
    // aggregate; ProfileApproxSpec asserts the shape swap and bounds the
    // sketch error vs this exact gate entry (q30's discipline). The gate
    // entry is UNCONDITIONALLY exact — the approx form is reached only
    // through the explicit profileDf flag (specs, bench probes), never
    // ambient environment state, so a probe run can't be mistaken for
    // the oracle-checked record or vice versa.
    "q42_profile" -> OpDef.sql(
      (s, d) => profileDf(s, d, approx = false),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map { c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(count($c) AS BIGINT) AS n,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  round(min($c) + 1e-8, 4) AS min_v,
           |  round(max($c) + 1e-8, 4) AS max_v,
           |  round(avg($c) + 1e-8, 4) AS mean_v
           |FROM lineitem""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")),

    // q45: SCD TYPE-2 dimension build — the warehouse's versioned-
    // dimension pattern, and the gaps-and-islands window shape the
    // inventory lacked (q21-q23/q35 slide, q36 fills; this COLLAPSES
    // consecutive repeats into validity intervals). Each customer's
    // order stream is read as an attribute changelog (priority
    // observed at each order date); first the log dedupes to the TIME
    // GRAIN (two observations at the same instant are a conflict, not
    // two versions — the latest orderkey wins, the textbook step real
    // SCD2 builds need, and what makes valid_from STRICTLY increasing
    // by construction), then one row per RUN of equal values:
    // version = run ordinal, valid_from = first observation of the
    // run, valid_to = start of the next run (NULL = current). All
    // three windows ride the SAME (custkey, date...) sort — one
    // Exchange, reused; the partition key is the full customer
    // population, so the build parallelizes with the dimension at any
    // scale. Timestamps hash-compare as epoch micros.
    "q45_scd2" -> OpDef.sql(
      (s, d) => scd2Dim(s, d).orderBy("o_custkey", "version"),
      s"""WITH $duckScd2Cte
         |SELECT o_custkey, version, prio, valid_from_us, valid_to_us
         |FROM dim
         |ORDER BY o_custkey, version""".stripMargin),

    // q50: POINT-IN-TIME (temporal validity) join — the other half of
    // q45: facts joined to the dimension version that was valid WHEN
    // the fact happened ("as the books saw it", the warehouse's
    // time-correct join). The interval-join trap does not apply here:
    // unlike q44's UN-keyed windows, a validity join is KEYED — the
    // equi-join on customer bounds the fan per fact at that customer's
    // version count, so the plan is an ordinary shuffled equi-join with
    // a residual [valid_from, valid_to) range conjunct: linear,
    // skew-safe under AQE, no binning or prefix sums needed. Every
    // order lands in EXACTLY one version by the dimension's
    // construction (half-open intervals partition each customer's
    // timeline from the first observation on) — TemporalJoinSpec pins
    // that cardinality instead of trusting it.
    "q50_temporal_join" -> OpDef.sql(
      (s, d) => {
        val dim = scd2Dim(s, d)
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
                  unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
          .join(dim, Seq("o_custkey"))
          .filter(col("ts_us") >= col("valid_from_us") &&
            (col("valid_to_us").isNull || col("ts_us") < col("valid_to_us")))
          .select(col("o_orderkey"), col("o_custkey"), col("version"),
                  col("prio").as("prio_at_order"))
          .orderBy("o_orderkey")
      },
      s"""WITH $duckScd2Cte
         |SELECT o.o_orderkey, o.o_custkey, d.version,
         |       d.prio AS prio_at_order
         |FROM orders o
         |JOIN dim d ON o.o_custkey = d.o_custkey
         |  AND epoch_us(o.o_orderdate) >= d.valid_from_us
         |  AND (d.valid_to_us IS NULL OR epoch_us(o.o_orderdate) < d.valid_to_us)
         |ORDER BY o_orderkey""".stripMargin),

    // q49: equi-width HISTOGRAM per group — the profiling shape q42's
    // scalar stats don't cover (a distribution, not a number): bucket
    // order totals into 10 fixed-width bins per priority class via
    // width_bucket, one map-side-combinable aggregate over one scan —
    // the bin bounds are data-derived (global min/max — a one-row
    // broadcast), so the histogram needs exactly two passes at any
    // scale and shuffles only (group, bin) cardinality. Empty bins are
    // a VISIBLE zero row (the grid comes from a sequence explode, left
    // join fills counts), not an absent one — a plotting consumer must
    // see the gap.
    "q49_histogram" -> OpDef.sql(
      (s, d) => {
        val o = Tables.orders(s, d)
        val bounds = o.agg(min("o_totalprice").as("lo"),
                           max("o_totalprice").as("hi"))
        // explicit bucket arithmetic (not width_bucket) so the oracle
        // computes bit-identical IEEE divisions: floor((v-lo)/(hi-lo)*10).
        // Degenerate range (every value equal → hi = lo) guards to bin 1
        // in BOTH engines: the raw formula would yield NaN here — Spark
        // silently dropping rows, DuckDB erroring on the INT cast.
        val binned = o.crossJoin(broadcast(bounds))
          .withColumn("bin",
            when(col("hi") === col("lo"), lit(1))
              .otherwise(
                least(floor((col("o_totalprice") - col("lo"))
                              / (col("hi") - col("lo")) * 10).cast("int") + 1,
                      lit(10))))
          .groupBy("o_orderpriority", "bin").agg(count(lit(1)).as("n"))
        val grid = o.select(col("o_orderpriority")).distinct()
          .crossJoin(s.range(1, 11).select(col("id").cast("int").as("bin")))
        grid.join(binned, Seq("o_orderpriority", "bin"), "left")
          .select(col("o_orderpriority"), col("bin"),
                  coalesce(col("n"), lit(0L)).as("n"))
          .orderBy("o_orderpriority", "bin")
      },
      """WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |           FROM orders),
        |binned AS (
        |  SELECT o_orderpriority,
        |         CASE WHEN hi = lo THEN 1
        |              ELSE least(CAST(floor((o_totalprice - lo) / (hi - lo) * 10) AS INT) + 1,
        |                         10) END AS bin,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM orders, b GROUP BY 1, 2),
        |grid AS (
        |  SELECT DISTINCT o_orderpriority, CAST(gs AS INT) AS bin
        |  FROM orders, unnest(range(1, 11)) t(gs))
        |SELECT g.o_orderpriority, g.bin, coalesce(n, 0) AS n
        |FROM grid g LEFT JOIN binned USING (o_orderpriority, bin)
        |ORDER BY o_orderpriority, bin""".stripMargin),

    // q47: DISTINCT COUNT OVER AN ORDERED WINDOW — "how many distinct
    // parts has this supplier ever shipped, as of each ship day" (the
    // reference's per-owner catalog-breadth stat, and a shape Spark's
    // window functions REFUSE outright: `count(DISTINCT) OVER (ORDER
    // BY)` is a hard AnalysisException). The naive fix people reach
    // for — collect_set over an expanding frame — materializes a
    // per-row set that grows with history (quadratic bytes per
    // supplier). The scale-safe identity: a part is new on exactly its
    // FIRST ship day, so cum-distinct(day) = running sum of
    // first-occurrences per day. Three map-side-combinable aggregates
    // (first day per (supp, part); firsts per (supp, day); observed
    // (supp, day) grid) and one windowed sum PARTITIONED BY SUPPLIER —
    // thousands of independent, tiny windows, no global sort, frame
    // state is one long. HASH-PROVEN with an algorithmically
    // INDEPENDENT oracle: DuckDB executes the textbook
    // count(DISTINCT ... ) OVER directly, so the first-occurrence
    // identity itself is what's being checked, not a replay of it.
    // COST NOTE (r14 sf10 ladder): the entry's wall is dominated by the
    // gate's deterministic `orderBy(l_suppkey, day)` — a global sort of
    // the full (supplier x day) OUTPUT required by the oracle's
    // hash-compare, not by the operator. Don't "optimize" the three
    // combinable aggregates chasing that number; the per-supplier
    // windows themselves are already shuffle-minimal.
    "q47_distinct_window" -> OpDef.sql(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_suppkey"), col("l_partkey"),
                  to_date(col("l_shipdate")).as("day"))
        val firsts = li.groupBy("l_suppkey", "l_partkey")
          .agg(min("day").as("day"))
          .groupBy("l_suppkey", "day").agg(count(lit(1)).as("nf"))
        val days = li.select("l_suppkey", "day").distinct()
        days.join(firsts, Seq("l_suppkey", "day"), "left")
          .withColumn("cum_parts",
            sum(coalesce(col("nf"), lit(0L))).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("l_suppkey").orderBy("day")))
          .select(col("l_suppkey"), col("day"),
                  col("cum_parts").cast("long").as("cum_parts"))
          // COST NOTE (r14 ladder): this trailing global sort of the
          // full (supplier x day) output is the entry's dominant wall
          // (20 of 21 s at sf10, ~4x its sf1 time) — it is the GATE's
          // determinism contract, not the operator. The three
          // aggregates are combinable and the window is per-supplier;
          // a consumer that doesn't need a globally sorted dump skips
          // the orderBy and pays none of it. Don't "optimize" the
          // operator for this line.
          .orderBy("l_suppkey", "day")
      },
      """SELECT DISTINCT l_suppkey, CAST(l_shipdate AS DATE) AS day,
        |  CAST(count(DISTINCT l_partkey) OVER (
        |    PARTITION BY l_suppkey ORDER BY CAST(l_shipdate AS DATE)) AS BIGINT)
        |    AS cum_parts
        |FROM lineitem
        |ORDER BY l_suppkey, day""".stripMargin),

    // q48: MODE + EXACT MEDIAN per group — the reference's "typical
    // listing" stats (most common size, median price per brand).
    // Spark's own `mode()` documents nondeterministic tie-breaks, so
    // the mode here is the explicit two-aggregate form: per-(brand,
    // size) counts, then ONE max_by over a (count, -size) struct —
    // lexicographic struct comparison IS the tie policy (highest
    // count, then smallest size), stated in the plan instead of
    // inherited from a hash map's iteration order. Both aggregates are
    // map-side combinable; no window, no sort until the output. Median
    // is exact interpolated percentile(0.5) — Spark and DuckDB share
    // the linear-interpolation definition; r4e on both sides kills the
    // last-ulp risk.
    "q48_mode_median" -> OpDef.sql(
      (s, d) => {
        val part = Tables.part(s, d)
        val cnt = part.groupBy("p_brand", "p_size")
          .agg(count(lit(1)).as("cnt"))
        val mode = cnt.groupBy("p_brand")
          .agg(expr("max_by(p_size, struct(cnt, -p_size))").as("mode_size"))
        val med = part.groupBy("p_brand")
          .agg(r4e(expr("percentile(p_retailprice, 0.5D)")).as("median_price"),
               count(lit(1)).as("n_parts"))
        mode.join(med, "p_brand")
          .select("p_brand", "mode_size", "median_price", "n_parts")
          .orderBy("p_brand")
      },
      """WITH c AS (
        |  SELECT p_brand, p_size, CAST(count(*) AS BIGINT) AS cnt
        |  FROM part GROUP BY 1, 2),
        |m AS (
        |  SELECT p_brand, p_size AS mode_size
        |  FROM c
        |  QUALIFY row_number() OVER (PARTITION BY p_brand
        |                             ORDER BY cnt DESC, p_size) = 1),
        |q AS (
        |  SELECT p_brand,
        |         round(quantile_cont(p_retailprice, 0.5) + 1e-8, 4) AS median_price,
        |         CAST(count(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1)
        |SELECT m.p_brand, mode_size, median_price, n_parts
        |FROM m JOIN q USING (p_brand)
        |ORDER BY p_brand""".stripMargin)
  )
}
