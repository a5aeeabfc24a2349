package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.logs.LogLines
import graft.mine.TemplateMining
import graft.operators.{EventMatrix, Positional}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Conventions shared by every (query, oracle) pair:
  *  - every computed column is aliased IDENTICALLY on both sides;
  *  - every result has a deterministic total ORDER BY;
  *  - any double produced by aggregation arithmetic is `round(_, 2|4)` on
  *    BOTH sides so engine-order float summation noise can't break the
  *    driver's hash compare (raw pass-through doubles stay exact).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * E3 semantics (`stat_calculation.py:1-9`): per-event occurrence counts,
    * positive only, ordered. */
  def entry(spark: SparkSession): DataFrame =
    EventMatrix.failureDistribution(
      Tables.events(spark, "/root/testdata/sf0.001"), "event_type")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- A1/A2 pricing summary (sum/avg/count aggregate, filter pushdown)
    "q01_pricing_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    // ---- P7/P9 filter + project (pushed to parquet scan)
    "q02_filter_project" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    // ---- J: fact-to-dim joins (nation broadcast) + grouped agg
    "q03_join_agg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),
    // ---- W3 top-k (TakeOrderedAndProject)
    "q04_topk" -> ((s, dir) => {
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),
    // ---- A5 distinct + sort
    "q05_distinct_sort" -> ((s, dir) =>
      EventMatrix.distinctEvents(Tables.events(s, dir), "event_type")),
    // ---- A1/A4 count-by-key + positive filter (flagship E3 shape)
    "q06_event_counts" -> ((s, dir) =>
      EventMatrix.failureDistribution(Tables.events(s, dir), "event_type")),
    // ---- W1 row_number window (partitioned, ranked top-3 per user)
    "q07_window_rownum" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
        .orderBy(col("user_id"), col("rn"))
    }),
    // ---- W2 count-based tumbling window (scalable global row index)
    "q08_tumbling_window" -> ((s, dir) => {
      Positional.tumbling(
          Tables.events(s, dir).select(col("event_id"), col("value")),
          Seq(col("event_id")), 5)
        .groupBy(col("window_id"))
        .agg(round(sum(col("value")), 4).as("sum_value"),
             max(col("value")).as("max_value"),
             count(lit(1)).as("n"))
        .orderBy(col("window_id"))
    }),
    // ---- A6 one-hot/count pivot (wide event matrix view)
    "q09_pivot" -> ((s, dir) => {
      EventMatrix.pivotWide(Tables.events(s, dir), "user_id", "event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .orderBy(col("user_id"))
    }),
    // ---- P6/P10/P12 extract + try_cast + label remap
    "q10_extract_cast" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(
          col("event_id"),
          expr("try_cast(regexp_extract(props, '\"k\": (\\\\d+)', 1) as bigint)").as("k"),
          when(col("value") > 50, lit(1)).otherwise(lit(0)).as("big"))
        .orderBy(col("event_id"))
    }),
    // ---- P1-P4 preprocessing chain (regex clean) on the document corpus
    "q11_clean_text" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), LogLines.clean(col("text")).as("clean_text"))
        .orderBy(col("doc_id"))
    }),
    // ---- A8 correlation + dispersion stats per group
    "q12_corr" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),
    // ---- J3 union-all of disjoint slices
    "q13_union" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.filter(col("o_totalprice") > 450000)
        .select(col("o_orderkey"), lit("high").as("bucket"))
        .unionAll(
          o.filter(col("o_totalprice") < 20000)
            .select(col("o_orderkey"), lit("low").as("bucket")))
        .orderBy(col("o_orderkey"))
    }),
    // ---- J anti join: customers with no high-value order
    "q14_anti_join" -> ((s, dir) => {
      val bigOrders = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
      Tables.customer(s, dir)
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    // ---- W4/J multi-join + agg + top-k by computed measure (TPC-H Q3 shape)
    "q15_top_revenue" -> ((s, dir) => {
      Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("o_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),
    // ---- M1 parallel template mining over the document corpus
    //      (order-sensitive custom operator — rows-only check, no SQL oracle)
    "q16_mine_templates" -> ((s, dir) => {
      TemplateMining.mineParallel(Tables.documents(s, dir), "text")
        .toDF("event_id", "size", "template")
        .orderBy(col("size").desc, col("template"))
    }),
    // ---- M1 exact + M4 restore + J1 broadcast match + A1 counts (E2 pipeline)
    "q17_match_counts" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val templates = TemplateMining.mineExact(docs, "text", Seq(col("doc_id"))).collect().toSeq
      val tree = TemplateMining.treeFromTemplates(templates)
      TemplateMining.matchLines(docs.select(col("doc_id"), col("text")), "text", tree)
        .groupBy(col("eventId"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("eventId"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_extendedprice), 4) AS avg_price,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_quantity >= 45 AND l_returnflag = 'R'
         ORDER BY l_orderkey, l_linenumber""",
    "q03_join_agg" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name
         ORDER BY n_name""",
    "q04_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q05_distinct_sort" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    "q06_event_counts" ->
      """SELECT event_type, count(*) AS cnt FROM events
         GROUP BY event_type HAVING count(*) > 0 ORDER BY event_type""",
    "q07_window_rownum" ->
      """SELECT user_id, event_id, rn FROM (
           SELECT user_id, event_id,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events) t
         WHERE rn <= 3
         ORDER BY user_id, rn""",
    "q08_tumbling_window" ->
      """SELECT window_id, round(sum(value), 4) AS sum_value,
                max(value) AS max_value, count(*) AS n
         FROM (SELECT (row_number() OVER (ORDER BY event_id) - 1) // 5 AS window_id, value
               FROM events) t
         GROUP BY window_id
         ORDER BY window_id""",
    "q09_pivot" ->
      """SELECT user_id,
         count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         count(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q10_extract_cast" ->
      """SELECT event_id,
         try_cast(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
         CASE WHEN value > 50 THEN 1 ELSE 0 END AS big
         FROM events ORDER BY event_id""",
    "q11_clean_text" ->
      """SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3}', '', 'g'),
               '\b(INFO|ERROR|WARN|DEBUG|TRACE)\b', '', 'g'),
             '\[\w+\]', '', 'g'),
           '\s+', ' ', 'g')) AS clean_text
         FROM documents ORDER BY doc_id""",
    "q12_corr" ->
      """SELECT l_returnflag,
         round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q13_union" ->
      """SELECT o_orderkey, 'high' AS bucket FROM orders WHERE o_totalprice > 450000
         UNION ALL
         SELECT o_orderkey, 'low' AS bucket FROM orders WHERE o_totalprice < 20000
         ORDER BY o_orderkey""",
    "q14_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (
           SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
         ORDER BY c_custkey""",
    "q15_top_revenue" ->
      """SELECT o_orderkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey
         LIMIT 10""",
  )
}
