package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, TimestampType}

import graft.core.Tables
import graft.functions.GraftFunctions

/** Relational query capability over the harness tables — joins, aggregations,
  * window functions, set ops, rollup, top-k, semi/anti joins, sessionization.
  *
  * The reference (`comparaonline/event-streamer`) has no relational layer at
  * all (SURVEY.md §2.2); these queries realize the "Engine plan" column of
  * that coverage matrix with Spark built-ins only, so Catalyst gets full
  * freedom: predicate pushdown into the parquet scans, partial aggregation,
  * broadcast joins for the dimension tables, AQE at runtime.
  *
  * == Numeric parity with the DuckDB oracle ==
  * Double summation is order-dependent, and Spark/DuckDB aggregate in
  * different orders, so any `SUM(double)` would hash-mismatch. Every
  * aggregated money/quantity column is therefore cast to an exact DECIMAL
  * before arithmetic (the source doubles are 2-decimal values, so the cast is
  * lossless) and back to double only at the very end. Decimal arithmetic is
  * associative — both engines compute the identical exact value, and the
  * final nearest-double is bit-identical. This also mirrors what a production
  * deployment should do: money columns as DECIMAL, not DOUBLE.
  *
  * == Scale notes (100 TB) ==
  * - `lineitem`/`orders`/`events` are the fact tables: never broadcast,
  *   always aggregated with partial (map-side) aggregation before shuffle.
  * - `region`/`nation`/`supplier`/`part`/`customer` are dimensions:
  *   explicitly `broadcast()`ed where joined to facts, so the fact table is
  *   never shuffled for the join.
  * - Window queries partition by a high-cardinality key (custkey/user_id),
  *   so state per partition stays small at any scale.
  * - Top-k is `orderBy(...).limit(k)` → Spark plans TakeOrderedAndProject
  *   (per-partition heap + driver merge, no global sort).
  */
object RelationalQueries {

  // ---- exact-decimal helpers (see scaladoc above) ----
  private val D2 = DecimalType(14, 2)
  private val D4 = DecimalType(8, 4)
  private def dec2(c: Column): Column = c.cast(D2)
  private def dec4(c: Column): Column = c.cast(D4)
  private def one4: Column = lit(1).cast(D4)
  private def ts(s: String): Column = lit(s).cast(TimestampType)

  // SQL-side equivalents for the oracle strings
  private def sDec2(e: String) = s"CAST($e AS DECIMAL(14,2))"
  private def sDec4(e: String) = s"CAST($e AS DECIMAL(8,4))"
  private val sOne4 = "CAST(1 AS DECIMAL(8,4))"
  private def sDSum(e: String) = s"CAST(ROUND(SUM($e), 2) AS DOUBLE)"
  private def sDSum4(e: String) = s"CAST(ROUND(SUM($e), 4) AS DOUBLE)"

  /** DuckDB twin of [[graft.functions.ToUpperCamelCase]] with the
    * reference's EXACT `charAt(0).toUpperCase() + slice(1)
    * .replace(/[-_ ]./g, up)` semantics: a left-to-right fold over the
    * tail's characters. Fold state is a STRUCT `{s: output, p: pending
    * delimiter}` — out-of-band, so inputs containing ANY byte (including
    * control chars) transform correctly; a trailing `{p: 'END'}` element
    * flushes a pending delimiter ('END' can never collide with the
    * single-char `p` states). Fuzz-verified against the JS rule incl.
    * adversarial control-char inputs; the one knowing divergence is
    * DuckDB's `upper()` mapping `ß` to `ẞ` where JS/Java expand to `SS` —
    * unreachable for these event codes. */
  private def sqlUpperCamelFold(col: String): String =
    s"""CASE WHEN $col IS NULL OR $col = '' THEN $col ELSE
       | upper(substr($col, 1, 1)) ||
       | (list_reduce(
       |   list_append(
       |     list_prepend({'s': '', 'p': ''},
       |       list_transform(string_split(substr($col, 2), ''), c -> {'s': c, 'p': ''})),
       |     {'s': '', 'p': 'END'}),
       |   (acc, x) -> CASE
       |     WHEN x.p = 'END' THEN {'s': acc.s || acc.p, 'p': ''}
       |     WHEN acc.p <> '' THEN
       |       CASE WHEN x.s IN (chr(10), chr(13), chr(8232), chr(8233))
       |            THEN {'s': acc.s || acc.p || x.s, 'p': ''}
       |            ELSE {'s': acc.s || upper(x.s), 'p': ''} END
       |     WHEN x.s IN ('-', '_', ' ') THEN {'s': acc.s, 'p': x.s}
       |     ELSE {'s': acc.s || x.s, 'p': ''} END)).s
       |END""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O(n) scan + grouped agg; partial agg map-side, 6 groups → tiny shuffle.
    "q01_pricing_summary" -> { (s, d) =>
      import s.implicits._
      val disc  = dec2($"l_extendedprice") * (one4 - dec4($"l_discount"))
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= ts("2000-12-01"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum(dec2($"l_quantity")), 2).cast("double").as("sum_qty"),
          round(sum(dec2($"l_extendedprice")), 2).cast("double").as("sum_base_price"),
          round(sum(disc), 2).cast("double").as("sum_disc_price"),
          round(sum(disc.cast(DecimalType(18, 6)) * (one4 + dec4($"l_tax"))), 2)
            .cast("double").as("sum_charge"),
          (round(sum(dec2($"l_quantity")), 2).cast("double") / count(lit(1))).as("avg_qty"),
          (round(sum(dec2($"l_extendedprice")), 2).cast("double") / count(lit(1))).as("avg_price"),
          (round(sum(dec4($"l_discount")), 4).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    // Region->nation->customer: both dims broadcast; fact (customer) never shuffles.
    "q02_region_stats" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(
          count(lit(1)).as("n_customers"),
          round(sum(dec2($"c_acctbal")), 2).cast("double").as("total_acctbal"),
          (round(sum(dec2($"c_acctbal")), 2).cast("double") / count(lit(1))).as("avg_acctbal"))
        .orderBy($"r_name")
    },

    // TPC-H Q3 shape: filter-pushdown on all three tables, broadcast customer,
    // top-10 via TakeOrderedAndProject (exact decimal revenue → stable order).
    "q03_shipping_priority" -> { (s, d) =>
      import s.implicits._
      val cut = ts("1997-06-01")
      val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val o = Tables.orders(s, d).filter($"o_orderdate" < cut)
      val l = Tables.lineitem(s, d).filter($"l_shipdate" > cut)
      l.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(round(sum(dec2($"l_extendedprice") * (one4 - dec4($"l_discount"))), 2)
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },

    // EXISTS → left_semi join (no fact-row duplication, no payload shuffle of lineitem cols).
    "q04_order_priority" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1996-07-01"))
      val l = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
        .select($"l_orderkey")
      o.join(l, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy($"o_orderpriority")
    },

    // TPC-H Q5 shape: five-way join; all dims broadcast, lineitem⋈orders is
    // the only shuffle join (on orderkey).
    "q05_region_revenue" -> { (s, d) =>
      import s.implicits._
      val o = Tables.orders(s, d)
        .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1998-01-01"))
      Tables.lineitem(s, d)
        .join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.supplier(s, d)),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .filter($"r_name" === "ASIA")
        .groupBy($"n_name")
        .agg(round(sum(dec2($"l_extendedprice") * (one4 - dec4($"l_discount"))), 2)
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    },

    // TPC-H Q6 shape: pure scan query — every predicate pushes into parquet.
    "q06_revenue_delta" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1997-01-01")
          && $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
        .agg(
          round(sum(dec2($"l_extendedprice") * dec4($"l_discount")), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // NOT EXISTS → left_anti join: customers with no recent orders.
    "q07_customers_without_orders" -> { (s, d) =>
      import s.implicits._
      val recent = Tables.orders(s, d)
        .filter($"o_orderdate" >= ts("2000-01-01")).select($"o_custkey")
      Tables.customer(s, d)
        .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_mktsegment")
    },

    // Global top-k: TakeOrderedAndProject (per-partition heaps, no full sort).
    "q08_topk_orders" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    },

    // Ranking window, one shuffle on the partition key.
    "q09_top_orders_per_customer" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .orderBy($"o_custkey", $"rn")
    },

    // Running aggregate window (frame = unbounded preceding .. current).
    "q10_running_spend" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          sum(dec2($"o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"),
          row_number().over(w).as("order_seq"))
        .orderBy($"o_custkey", $"order_seq")
    },

    // Exact distinct aggregation (expand + two-phase agg under the hood).
    "q11_distinct_counts" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },

    // Hierarchical aggregate: ROLLUP grouping sets.
    "q12_rollup_summary" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          round(sum(dec2($"l_quantity")), 2).cast("double").as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    },

    // Set operations: INTERSECT then EXCEPT on distinct customer-key sets.
    "q13_set_ops" -> { (s, d) =>
      import s.implicits._
      def buyers(y: String, y1: String) = Tables.orders(s, d)
        .filter($"o_orderdate" >= ts(y) && $"o_orderdate" < ts(y1))
        .select($"o_custkey".as("custkey")).distinct()
      buyers("1995-01-01", "1996-01-01")
        .intersect(buyers("1996-01-01", "1997-01-01"))
        .except(buyers("2001-01-01", "2002-01-01"))
        .orderBy($"custkey")
    },

    // Date-part extraction + monthly aggregate.
    "q14_monthly_orders" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(dec2($"o_totalprice")), 2).cast("double").as("total_sales"))
        .orderBy($"o_year", $"o_month")
    },

    // String functions: regexp extraction, length, distinct-count.
    "q15_part_stats" -> { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .groupBy($"p_type")
        .agg(
          count(lit(1)).as("n_parts"),
          (round(sum(dec2($"p_retailprice")), 2).cast("double") / count(lit(1))).as("avg_price"),
          sum($"p_size".cast("long")).as("total_size"),
          max(length($"p_name")).as("max_name_len"),
          countDistinct(regexp_extract($"p_brand", "[0-9]+", 0)).as("n_brands"))
        .orderBy($"p_type")
    },

    // Flagship event pipeline: envelope code normalization (custom Catalyst
    // expression), JSON prop extraction, route predicate, grouped agg —
    // the batch twin of the streaming router (SURVEY.md §7.2).
    "q16_route_count" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("code", GraftFunctions.upper_camel($"event_type"))
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .filter($"k".isNotNull)
        .filter($"code".isin("Click", "Purchase", "Signup"))
        .groupBy($"code")
        .agg(count(lit(1)).as("n_events"),
          round(sum(dec2($"value")), 2).cast("double").as("total_value"),
          sum($"k").as("sum_k"))
        .orderBy($"code")
    },

    // Event-time tumbling window (batch twin of the streaming windowed agg).
    "q17_hourly_events" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(dec2($"value")), 2).cast("double").as("total_value"))
        .select($"window.start".cast("timestamp_ntz").as("window_start"),
          $"event_type", $"n", $"total_value")
        .orderBy($"window_start", $"event_type")
    },

    // Sessionization: 30-min-gap sessions via lag + running flag-sum —
    // the batch twin of streaming session_window.
    "q18_sessionize" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val gapUs = unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))
      val newSess = when(gapUs.isNull || gapUs > 1800000000L, 1).otherwise(0)
      Tables.events(s, d)
        .withColumn("new_sess", newSess)
        .withColumn("session_id",
          sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"ts").cast("timestamp_ntz").as("session_start"),
          max($"ts").cast("timestamp_ntz").as("session_end"))
        .orderBy($"user_id", $"session_id")
    },

    // Sketch aggregation: HyperLogLog++ approximate distinct checked
    // against the exact count. The raw HLL estimate is engine-specific,
    // so the OUTPUT carries only oracle-expressible columns: the exact
    // count plus a boolean `within_5rsd` verdict (HLL++ at rsd 0.02 is
    // deterministic for a fixed input set, and 5·rsd is far beyond its
    // guarantee — the oracle emits literal `true`, so a degraded sketch
    // flips the verdict and hash-mismatches LOUDLY). Q20SketchSpec pins
    // the raw estimate's error envelope; t09 is the deterministic
    // cross-engine sketch twin. At 100 TB the approx variant is the one
    // you run: fixed-size sketch state, no expand, mergeable.
    "q20_approx_distinct" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          approx_count_distinct($"l_partkey", 0.02).as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"))
        .select($"l_returnflag", $"exact_parts",
          (abs($"approx_parts" - $"exact_parts").cast("double")
            / $"exact_parts".cast("double") <= 0.10).as("within_5rsd"))
        .orderBy($"l_returnflag")
    },

    // Analytic window functions: lag/lead + day gaps between orders.
    "q21_order_gaps" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .withColumn("next_price", lead($"o_totalprice", 1).over(w))
        .withColumn("days_since_prev",
          datediff($"o_orderdate", lag($"o_orderdate", 1).over(w)))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    },

    // Full grouping-set lattice: CUBE over status x priority.
    "q22_cube_summary" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum(dec2($"o_totalprice")), 2).cast("double").as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    },

    // Pivot: order counts per status column, by year.
    "q23_pivot_status" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy(year($"o_orderdate").as("o_year"))
        .pivot($"o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_year",
          coalesce($"F", lit(0L)).as("n_f"),
          coalesce($"O", lit(0L)).as("n_o"),
          coalesce($"P", lit(0L)).as("n_p"))
        .orderBy($"o_year")
    },

    // Skew-safe salted aggregation: events has only 5 event types — at
    // 100 TB the plain merge lands on 5 reducers; the salted two-phase
    // produces the identical result with keys x buckets merge tasks.
    "q24_salted_event_stats" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      graft.operators.Salted.countSumByKey(
          ev, $"event_type", dec2($"value"),
          graft.operators.Salted.salt(16, $"event_id"),
          countName = "n_events", sumName = "psum")
        .select($"__key".as("event_type"), $"n_events",
          round($"psum", 2).cast("double").as("total_value"))
        .orderBy($"event_type")
    },

    // Schemaless payload access via Spark 4 VariantType: parse the JSON
    // props column once into a variant, extract typed fields lazily —
    // the engine's fallback for event payloads with no registered schema
    // (SURVEY.md §1.5). Variant parse+get is columnar and shredding-aware,
    // unlike repeated get_json_object string scans.
    "q25_variant_props" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .withColumn("v", parse_json($"props"))
        .select($"event_id", try_variant_get($"v", "$.k", "bigint").as("k"))
        .filter($"k".isNotNull)
        .groupBy(($"k" % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"), min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"k_bucket")
    },

    // Pure-SQL surface: the same engine through spark.sql over temp views,
    // written in the ANSI subset both engines parse identically — a user of
    // the SQL API gets the identical Catalyst plan the DataFrame API builds.
    "q26_sql_surface" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
          |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total
          |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |GROUP BY c_mktsegment, o_orderstatus
          |ORDER BY c_mktsegment, o_orderstatus""".stripMargin)
    },

    // SQL aggregate-surface breadth, pure SQL text (q26's family):
    // FILTER (WHERE ...) on COUNT and on a decimal-exact SUM,
    // BOOL_AND/BOOL_OR, and ANSI LISTAGG ... WITHIN GROUP (new SQL
    // surface in Spark 4) — bounded to each segment's top-3 names by a
    // ranking CTE so the string stays fixed-size at any corpus scale
    // and the WITHIN GROUP order (rn) is a total order. The oracle
    // differs only where dialects must: DuckDB spells the ordered
    // string aggregate string_agg(expr, sep ORDER BY rn). All-integer
    // + one decimal-pattern sum; booleans are engine-identical.
    "q54_filtered_aggregates" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(
        """WITH top3 AS (SELECT c_mktsegment, c_name,
          |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
          |      ORDER BY c_acctbal DESC, c_name) AS rn
          |  FROM customer_v),
          |lg AS (SELECT c_mktsegment,
          |    listagg(c_name, '|') WITHIN GROUP (ORDER BY rn) AS top_names
          |  FROM top3 WHERE rn <= 3 GROUP BY c_mktsegment),
          |agg AS (SELECT c_mktsegment,
          |    COUNT(*) AS n_cust,
          |    COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_debtors,
          |    CAST(ROUND(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(14,2)))
          |      FILTER (WHERE c_nationkey < 10), 0.00), 2) AS DOUBLE)
          |      AS bal_low_nations,
          |    BOOL_AND(c_acctbal >= -1000) AS all_above_floor,
          |    BOOL_OR(c_acctbal > 9000) AS any_rich
          |  FROM customer_v GROUP BY c_mktsegment)
          |SELECT a.c_mktsegment, n_cust, n_debtors, bal_low_nations,
          |  all_above_floor, any_rich, top_names
          |FROM agg a JOIN lg ON a.c_mktsegment = lg.c_mktsegment
          |ORDER BY a.c_mktsegment""".stripMargin)
    },

    // Post-aggregation filter (HAVING): suppliers by shipped revenue.
    "q27_top_suppliers_having" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_suppkey", $"s_name")
        .agg(round(sum(dec2($"l_extendedprice") * (one4 - dec4($"l_discount"))), 2)
          .cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .filter($"n_items" > 100)
        .orderBy($"s_suppkey")
    },

    // List aggregation: per-customer order list as a deterministic CSV
    // (engine list-agg ordering is nondeterministic in both engines, so the
    // portable form sorts before joining).
    "q28_order_lists" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          array_join(sort_array(collect_list($"o_orderkey".cast("string"))), ",")
            .as("orderkeys_csv"))
        .filter($"n_orders" <= 3)
        .orderBy($"o_custkey")
    },

    // Time-range window frame: rolling 90-day spend per customer. RANGE
    // frames aggregate over ORDER-BY peers, so ties are deterministic by
    // construction. Interval range frames are SQL-only in Spark.
    "q29_rolling_spend" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_rs")
      s.sql(
        """SELECT o_custkey, o_orderkey,
          |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
          |    PARTITION BY o_custkey ORDER BY o_orderdate
          |    RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
          |    AS spend_90d
          |FROM orders_rs ORDER BY o_custkey, o_orderkey""".stripMargin)
    },

    // FULL OUTER join: daily order activity vs daily shipping activity —
    // days present on either side survive with null-padded counterparts.
    "q30_full_outer_activity" -> { (s, d) =>
      import s.implicits._
      val ordered = Tables.orders(s, d)
        .groupBy(to_date($"o_orderdate").as("d1")).agg(count(lit(1)).as("n_ordered"))
      val shipped = Tables.lineitem(s, d)
        .groupBy(to_date($"l_shipdate").as("d2")).agg(count(lit(1)).as("n_shipped"))
      ordered.join(shipped, $"d1" === $"d2", "full_outer")
        .select(coalesce($"d1", $"d2").cast("timestamp_ntz").as("day"),
          coalesce($"n_ordered", lit(0L)).as("n_ordered"),
          coalesce($"n_shipped", lit(0L)).as("n_shipped"))
        .orderBy($"day")
    },

    // Multiset (ALL) set operations: duplicates preserved.
    "q31_multiset_ops" -> { (s, d) =>
      import s.implicits._
      def supps(lo: String, hi: String) = Tables.lineitem(s, d)
        .filter($"l_shipdate" >= ts(lo) && $"l_shipdate" < ts(hi))
        .select($"l_suppkey".as("suppkey"))
      val a = supps("1996-01-01", "1997-01-01")
      val b = supps("1997-01-01", "1998-01-01")
      val surplus = a.exceptAll(b)
        .groupBy($"suppkey").agg(count(lit(1)).as("surplus"))
      val overlap = a.intersectAll(b)
        .groupBy($"suppkey").agg(count(lit(1)).as("overlap"))
      surplus.join(overlap, Seq("suppkey"), "full_outer")
        .select($"suppkey",
          coalesce($"surplus", lit(0L)).as("surplus"),
          coalesce($"overlap", lit(0L)).as("overlap"))
        .orderBy($"suppkey")
    },

    // Scalar string-function breadth: identical semantics in both engines.
    "q32_string_kitchen" -> { (s, d) =>
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_partkey" <= 50)
        .select(
          $"p_partkey",
          upper($"p_name").as("up"),
          lower($"p_brand").as("lo"),
          reverse($"p_type").as("rev"),
          lpad($"p_brand", 12, "*").as("pad"),
          substring($"p_name", 3, 5).as("sub"),
          concat_ws("|", $"p_brand", $"p_type").as("joined"),
          length(replace($"p_name", lit(" "), lit(""))).cast("long").as("squeezed_len"),
          locate("a", $"p_name").cast("long").as("first_a"))
        .orderBy($"p_partkey")
    },

    // Temporal scalar-function breadth: interval arithmetic, month-end,
    // quarter extraction, day differencing — engine-agreeing semantics only.
    "q33_temporal_fns" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .filter($"o_orderkey" <= 200)
        .select(
          $"o_orderkey",
          ($"o_orderdate" + expr("INTERVAL 30 DAYS")).as("due"),
          last_day($"o_orderdate".cast("date")).cast("timestamp_ntz").as("eom"),
          quarter($"o_orderdate").as("q"),
          datediff($"o_orderdate", lit("1995-01-01").cast("date")).as("age_days"))
        .orderBy($"o_orderkey")
    },

    // Distribution window functions: quartile bucketing + rank ratios.
    "q34_window_distribution" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
      val wTies = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal")
      Tables.customer(s, d)
        .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        // tie-bearing window (acctbal alone): rank/dense_rank are only
        // distinguishable from row_number when ties exist, and they stay
        // deterministic under ties (unlike ntile, which needs w's total
        // order)
        .withColumn("rnk", rank().over(wTies))
        .withColumn("drnk", dense_rank().over(wTies))
        .orderBy($"c_mktsegment", $"c_custkey")
    },

    // Exact percentiles (linear interpolation — identical formula in both
    // engines over identical doubles). DELIBERATE small-data baseline:
    // `percentile()` buffers every group value (non-mergeable). At 100 TB
    // use approx_percentile (mergeable sketch) — or, for an EXACT median
    // at scale, q48's count-based rank selection over a cents histogram,
    // which is the scale-true exact form (map-side-combinable partials,
    // spillable rank scan, no per-group buffer).
    "q35_percentiles" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          percentile($"o_totalprice", lit(0.5)).as("median_price"),
          percentile($"o_totalprice", lit(0.9)).as("p90_price"))
        .orderBy($"o_orderpriority")
    },

    // Scalar-subquery shape: compare each row against its group aggregate.
    "q19_above_nation_avg" -> { (s, d) =>
      import s.implicits._
      val cust = Tables.customer(s, d)
      val na = cust.groupBy($"c_nationkey".as("nk"))
        .agg((round(sum(dec2($"c_acctbal")), 2).cast("double") / count(lit(1))).as("nation_avg"))
      cust.join(broadcast(na), $"c_nationkey" === $"nk")
        .filter($"c_acctbal" > $"nation_avg")
        .select($"c_custkey", $"c_acctbal", $"nation_avg")
        .orderBy($"c_custkey")
    },

    // As-of join (graft.operators.AsOfJoin.asOfSorted — the fan-out-free
    // union+sweep form; AsOfJoinSpec proves it result-identical to the
    // join+rank form): last-click attribution — each purchase matched to
    // the user's most recent click at-or-before it, within a 7-day
    // window. Oracle = DuckDB's native ASOF LEFT JOIN (the tolerance maps
    // to a post-pick filter: the as-of pick is the LATEST candidate, so
    // nullifying an out-of-window pick equals constraining the join —
    // every other candidate is older still).
    //
    // The right side is first collapsed to one row per (user, ts) —
    // keeping max(click_id) — IN BOTH ENGINES: DuckDB's ASOF pick among
    // equal-timestamp rows is unspecified, so the tie must not exist by
    // the time either engine joins. (AsOfJoin's own rightTieBreak still
    // guards the Spark side independently.)
    "q36_asof_attribution" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id".as("c_user"), $"ts".as("click_ts"))
        .agg(max($"event_id").as("click_id"))
      graft.operators.AsOfJoin.asOfSorted(purchases, clicks,
        key = (purchases("user_id"), clicks("c_user")),
        time = (purchases("ts"), clicks("click_ts")),
        tolerance = Some(expr("INTERVAL 7 DAYS")),
        rightTieBreak = Seq(clicks("click_id")))
        .select($"purchase_id", $"user_id", $"click_id",
          expr("(unix_micros(ts) - unix_micros(click_ts)) DIV 60000000")
            .as("mins_since_click"))
        .orderBy($"purchase_id")
    },

    // Range (band) join: non-equi join of a fact against interval brackets.
    // The brackets side is tiny and broadcast, so the fact table never
    // shuffles — the 100 TB shape for banding/bucketing joins (Spark plans
    // BroadcastNestedLoopJoin; with AQE the scan stays one pass).
    "q37_range_join" -> { (s, d) =>
      import s.implicits._
      val brackets = Seq(
        ("p1_subzero", -100000.0, 0.0),
        ("p2_low", 0.0, 2500.0),
        ("p3_mid", 2500.0, 5000.0),
        ("p4_high", 5000.0, 7500.0),
        ("p5_top", 7500.0, 100000.0)).toDF("bracket", "lo", "hi")
      Tables.customer(s, d)
        .join(broadcast(brackets), $"c_acctbal" >= $"lo" && $"c_acctbal" < $"hi")
        .groupBy($"bracket")
        .agg(count(lit(1)).as("n_customers"),
          round(sum(dec2($"c_acctbal")), 2).cast("double").as("total_bal"))
        .orderBy($"bracket")
    },

    // Sliding event-time windows (1 h width, 15 min slide) — the overlap
    // twin of q17's tumbling window; every event lands in exactly 4
    // windows. Spark's window() expands via a generator before the hash
    // agg, so the shuffle carries partial aggregates, not 4x events.
    "q41_sliding_windows" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(dec2($"value")), 2).cast("double").as("total_value"))
        .select($"window.start".cast("timestamp_ntz").as("window_start"),
          $"event_type", $"n", $"total_value")
        .orderBy($"window_start", $"event_type")
    },

    // The inverse of q23's pivot: UNPIVOT (melt) — wide measure columns
    // to long (measure, value) rows, then a grouped rollup per measure.
    // Dataset.unpivot plans as an Expand (q12/q22's machinery) fused into
    // the scan stage, and the per-(flag, measure) aggregation partial-
    // aggregates map-side — the 3×-expanded long form is never shuffled,
    // only 9 groups are. Decimal-exact sums per the engine parity rules.
    "q42_unpivot_measures" -> { (s, d) =>
      import s.implicits._
      Tables.lineitem(s, d)
        .select($"l_returnflag", $"l_quantity", $"l_extendedprice", $"l_discount")
        .unpivot(Array($"l_returnflag"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount"),
          "measure", "val")
        .groupBy($"l_returnflag", $"measure")
        .agg(count(lit(1)).as("n"),
          round(sum(dec2($"val")), 2).cast("double").as("total"))
        .orderBy($"l_returnflag", $"measure")
    },

    // VALUE-based RANGE frame (q29 is the interval variant): per order,
    // how many of the same customer's orders fall within ±$500 of its
    // price, and their exact total. The frame key is integer CENTS
    // (round(price*100) — identical doubles→long in both engines), so
    // the frame arithmetic is exact and tie order is irrelevant: RANGE
    // frames include ALL peers of a boundary value by definition, which
    // makes this deterministic where a ROWS frame would not be.
    "q43_price_band_frame" -> { (s, d) =>
      import s.implicits._
      val cents = round($"o_totalprice" * 100).cast("long")
      val w = Window.partitionBy($"o_custkey").orderBy($"cents")
        .rangeBetween(-50000L, 50000L)
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", cents.as("cents"))
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          count(lit(1)).over(w).as("n_similar"),
          round(sum(dec2($"o_totalprice")).over(w), 2).cast("double").as("band_total"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // Cohort retention — the classic product-analytics lattice: users
    // bucketed by first-seen week (cohort), counted per weeks-since-first
    // offset. Join-free, two-exchange shape: the distinct (user, week)
    // activity set shuffles once, the per-user cohort comes from a window
    // min over that same set (no self-join back to the fact), and the
    // final (cohort, offset) distinct-user count shuffles only
    // (cohort, offset, user_id) triples. At 100 TB the fact table never
    // exchanges twice and the output is bounded by weeks², not rows.
    // Both week truncations are Monday-start; offsets are exact integer
    // DIV over day differences of week-aligned dates.
    "q44_cohort_retention" -> { (s, d) =>
      import s.implicits._
      val ua = Tables.events(s, d)
        .select($"user_id", date_trunc("week", $"ts").cast("date").as("wk"))
        .distinct()
      val w = Window.partitionBy($"user_id")
      ua.withColumn("cohort_week", min($"wk").over(w))
        .withColumn("week_offset", expr("CAST(datediff(wk, cohort_week) DIV 7 AS INT)"))
        .groupBy($"cohort_week", $"week_offset")
        .agg(countDistinct($"user_id").as("n_users"))
        // date-typed outputs surface as python `object` vs the oracle's
        // datetime64 — emit NTZ timestamps so the schema check is clean
        .select($"cohort_week".cast("timestamp_ntz").as("cohort_week"),
          $"week_offset", $"n_users")
        .orderBy($"cohort_week", $"week_offset")
    },

    // Funnel conversion — the other canonical event-analytics operator:
    // how many users progressed view → click-after-view →
    // purchase-after-click, with exact stage timestamps per user. ONE
    // data exchange: three chained window passes over the same user_id
    // partitioning compute each stage's first-qualifying timestamp (each
    // conditions on the previous stage's materialized column), and the
    // per-user reduce is a groupBy on the SAME key — plan-verified to
    // reuse the window's hash partitioning with no new exchange. The
    // only other exchange is the global census gather, one partial row
    // per partition. Sequence semantics without a single self-join, at
    // any scale.
    "q45_funnel_conversion" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id")
      Tables.events(s, d)
        .select($"user_id", $"event_type", $"ts")
        .withColumn("t1",
          min(when($"event_type" === "view", $"ts")).over(w))
        .withColumn("t2",
          min(when($"event_type" === "click" && $"ts" > $"t1", $"ts")).over(w))
        .withColumn("t3",
          min(when($"event_type" === "purchase" && $"ts" > $"t2", $"ts")).over(w))
        .groupBy($"user_id")
        .agg(max($"t1").as("t1"), max($"t2").as("t2"), max($"t3").as("t3"))
        .agg(count(lit(1)).as("n_users"),
          count($"t1").as("viewed"),
          count($"t2").as("clicked_after_view"),
          count($"t3").as("purchased_after_click"),
          // zero-guard: on a corpus with no views/clicks Spark's x/0 is
          // NaN while DuckDB's differs by version — both emit NULL instead
          when(count($"t1") > 0,
            round(count($"t2").cast("double") / count($"t1").cast("double"), 6))
            .as("view_to_click_rate"),
          when(count($"t2") > 0,
            round(count($"t3").cast("double") / count($"t2").cast("double"), 6))
            .as("click_to_purchase_rate"),
          sum(when($"t3".isNotNull, unix_micros($"t3") - unix_micros($"t1")))
            .as("total_view_to_purchase_us"))
    },

    // Late-data / watermark-drop accounting — the replay-log analysis an
    // event pipeline runs before choosing a watermark delay: under a
    // deterministic adversarial arrival order (md5 shuffle of the ingest
    // sequence — the engine-replayable stand-in for network reordering),
    // how many events would arrive later than the shard's high-watermark
    // by more than 10 min / 1 h? Lateness is tracked PER INGEST SHARD
    // (event_id mod 8 — the Kafka-partition-local form watermark tracking
    // actually takes): the running-max window partitions by shard, so at
    // 100 TB each ingest partition's arrival log is scanned independently
    // — no global ordering, no single-reducer window, and the census agg
    // is map-side partials. The streaming twin plants this same arrival
    // order and proves Spark's watermark machinery admits/drops exactly
    // the trigger-granular subset (StreamingParitySpec).
    "q46_late_data_census" -> { (s, d) =>
      import s.implicits._
      // arrival key as a 60-bit integer (conv of the md5 prefix — the
      // engine's standard replayable-pseudo-hash), not the 32-char hex:
      // the key rides the per-shard exchange on every event, and 8 bytes
      // vs 32 is ~40% of this query's total shuffle at any scale
      val arr = Tables.events(s, d).select($"event_id", $"ts", $"event_type",
        conv(substring(md5(concat(lit("q46:"), $"event_id".cast("string"))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("ak"),
        pmod($"event_id", lit(8)).as("shard"))
      val w = Window.partitionBy($"shard").orderBy($"ak", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      arr.withColumn("hw", max($"ts").over(w))
        .select($"event_type",
          greatest(unix_micros(coalesce($"hw", $"ts")) - unix_micros($"ts"), lit(0L))
            .as("late_us"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(when($"late_us" > 600000000L, 1L).otherwise(0L)).as("n_late_10m"),
          sum(when($"late_us" > 3600000000L, 1L).otherwise(0L)).as("n_dropped_1h"),
          max($"late_us").as("max_late_us"))
        .select($"event_type", $"n_events", $"n_late_10m", $"n_dropped_1h",
          $"max_late_us",
          round($"n_late_10m".cast("double") / $"n_events".cast("double"), 6)
            .as("late_rate"))
        .orderBy($"event_type")
    },

    // Spike-window census — interval DETECTION then a two-sided range
    // join, the non-equi join shape q37's broadcast band join can't
    // cover (there the interval side is 5 literal rows; here it is
    // DERIVED from the fact table and grows with it). Stage 1 finds
    // "hot" minutes (per-minute count above 1.5× the corpus mean — an
    // integer cross-product rule, no engine-specific doubles; 1.5× keeps
    // the rule non-degenerate at every harness SF) and merges
    // hot minutes within a 5-minute gap into maximal spike windows
    // (q18's lag + running flag-sum sessionization, run over the REDUCED
    // hot-minute set — the global-order window scans spikes, not
    // events). Stage 2 joins every event to its containing window via
    // operators.RangeJoin: intervals explode to 60-minute bins, events
    // map to one bin each, and the join is an EQUI-join on the bin with
    // BETWEEN as a residual — no BroadcastNestedLoopJoin anywhere
    // (plan-guarded), so the same plan holds when a year of telemetry
    // yields millions of intervals. Windows are disjoint by
    // construction, so each event lands in ≤ 1 window and the census
    // needs no dedup.
    "q47_spike_census" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).select($"event_id", $"user_id", $"value",
        expr("unix_micros(ts) DIV 60000000").as("mi"))
      val pm = ev.groupBy($"mi").agg(count(lit(1)).as("c"))
      val st = pm.agg(count(lit(1)).as("n_min"), sum($"c").as("n_ev"))
      val hot = pm.crossJoin(broadcast(st))
        .filter($"c" * lit(2) * $"n_min" > lit(3) * $"n_ev").select($"mi")
      val wAll = Window.orderBy($"mi")
      val iv = hot
        .withColumn("nf",
          when($"mi" - lag($"mi", 1).over(wAll) <= 5, 0L).otherwise(1L))
        .withColumn("grp", sum($"nf").over(
          wAll.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"grp")
        .agg(min($"mi").as("s_mi"), max($"mi").as("e_mi"),
          count(lit(1)).as("n_hot"))
        .drop("grp")
      graft.operators.RangeJoin
        .pointInInterval(ev, "mi", iv, "s_mi", "e_mi", binWidth = 60L)
        .groupBy($"s_mi", $"e_mi", $"n_hot")
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"),
          round(sum(dec2($"value")), 2).cast("double").as("total_value"))
        .select(
          timestamp_micros($"s_mi" * 60000000L).cast("timestamp_ntz")
            .as("window_start"),
          timestamp_micros(($"e_mi" + 1L) * 60000000L).cast("timestamp_ntz")
            .as("window_end"),
          ($"e_mi" - $"s_mi" + 1L).as("n_minutes"), $"n_hot",
          $"n_events", $"n_users", $"total_value")
        .orderBy($"window_start")
    },

    // Quantile SKETCH validated by its own rank guarantee — q20's
    // oracle-gating pattern applied to approx_percentile (Greenwald-
    // Khanna): the sketch's estimate is engine-specific, so the OUTPUT
    // carries only oracle-expressible columns (group size, the exact
    // median, and a boolean rank verdict the oracle emits as literal
    // true).
    //
    // p50_exact is computed by COUNT-BASED RANK SELECTION over a cents
    // histogram, not `percentile()`: the exact-percentile aggregate
    // buffers every group value (non-mergeable — the one memory-unbounded
    // shape in the catalog until round 12), whereas groupBy(rf, cents)
    // + count is fully map-side-combinable and the per-group state after
    // the exchange is one row per DISTINCT price — domain-bounded, and
    // the rank scan over it is a spillable sort, not an in-memory buffer.
    // Prices are exact 2-dp decimals, so cents are exact longs; the
    // median's two middle elements v1/v2 (ranks ⌈n/2⌉ and ⌈(n+1)/2⌉) come
    // from a cumulative-count window, and (v1+v2)/200.0 — one double
    // division of identical integers — reproduces interpolated
    // quantile_cont(0.5) bitwise in both engines. q35 keeps the buffered
    // exact form as the small-data baseline; THIS is the scale-true
    // exact median.
    //
    // The verdict re-ranks the estimate against the data using its RANK
    // INTERVAL: the estimate (an element GK returns from the data)
    // occupies ranks (cnt_lt, cnt_le]; the sketch guarantee is that SOME
    // rank of that element is within eps*n of n/2, so the gate checks the
    // interval INTERSECTS the 1%-of-n band (GK at accuracy 10000
    // guarantees 0.01% — two orders of margin). Interval-vs-band — not
    // |cnt_le - n/2| — so a heavy tie run AT the median (which
    // legitimately inflates cnt_le) cannot flip the verdict on valid
    // data, while a degraded sketch still trips it LOUDLY. Integer
    // cross-product comparison — no doubles in the gate.
    "q48_sketch_quantile" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
      // pass 1 (mergeable sketch): group size + GK estimate
      val g = li.groupBy($"l_returnflag".as("rf"))
        .agg(count(lit(1)).as("n"),
          approx_percentile($"l_extendedprice", lit(0.5), lit(10000)).as("est"))
      // pass 2 (mergeable histogram): exact median by rank selection
      val hist = li
        .groupBy($"l_returnflag".as("rf"),
          (dec2($"l_extendedprice") * 100).cast("long").as("cents"))
        .agg(count(lit(1)).as("cnt"))
      val cum = hist.select($"rf", $"cents", $"cnt",
        sum($"cnt").over(Window.partitionBy($"rf").orderBy($"cents")).as("cum"),
        sum($"cnt").over(Window.partitionBy($"rf")).as("nn"))
      val med = cum.groupBy($"rf")
        .agg(min(when($"cum" >= expr("(nn + 1) DIV 2"), $"cents")).as("v1"),
          min(when($"cum" >= expr("(nn + 2) DIV 2"), $"cents")).as("v2"))
      // pass 3: the estimate's rank interval, vs the raw scan (q19's
      // broadcast agg-join shape)
      val verdict = li.join(broadcast(g), $"l_returnflag" === $"rf")
        .groupBy($"rf", $"n")
        .agg(
          sum(when($"l_extendedprice" < $"est", 1L).otherwise(0L)).as("cnt_lt"),
          sum(when($"l_extendedprice" <= $"est", 1L).otherwise(0L)).as("cnt_le"))
      verdict.join(broadcast(med), "rf")
        .select($"rf".as("l_returnflag"), $"n",
          (($"v1" + $"v2").cast("double") / 200.0).as("p50_exact"),
          ((lit(100L) * (($"cnt_lt" + 1L) * 2L - $"n") <= ($"n" + 100L) * 2L)
            && (lit(100L) * ($"n" - $"cnt_le" * 2L) <= ($"n" + 100L) * 2L))
            .as("sketch_ok"))
        .orderBy($"l_returnflag")
    },

    // Three-valued-logic / NULL-semantics parity census. Spark and
    // DuckDB disagree on DEFAULTS here (Spark sorts ASC NULLS FIRST,
    // DuckDB ASC NULLS LAST), so every nullable surface in the engine
    // must be pinned explicitly — this query is the tripwire that the
    // pinning discipline works end-to-end: NULL-producing expression
    // (nullif), NULL groups in GROUP BY (their own group in both),
    // count(*) vs count(col) (the latter skips NULLs), an explicitly
    // UNKNOWN comparison counted via IS NULL on the predicate itself,
    // and an explicit NULLS FIRST output ordering.
    "q49_null_semantics" -> { (s, d) =>
      import s.implicits._
      Tables.customer(s, d)
        .select($"c_mktsegment",
          nullif($"c_nationkey" % 5, lit(0)).as("nv"),
          dec2($"c_acctbal").as("bal"))
        .groupBy($"c_mktsegment", $"nv")
        .agg(count(lit(1)).as("n_rows"),
          count($"nv").as("n_nonnull"),
          sum(when(($"nv" === 2).isNull, 1L).otherwise(0L)).as("n_unknown_cmp"),
          round(sum($"bal"), 2).cast("double").as("total_bal"))
        .orderBy($"c_mktsegment", $"nv".asc_nulls_first)
    },

    // Correlated-subquery surface (Catalyst decorrelation): two
    // correlated scalar subqueries + a correlated EXISTS with an
    // inequality, written as plain SQL. "Strictly above the customer's
    // own average order value" is compared as price·n > Σprice in EXACT
    // decimals — no AVG(double) ever materializes, so the predicate is
    // engine-exact. Catalyst rewrites the correlated scalars into
    // aggregate+join (RewriteCorrelatedScalarSubquery) and the EXISTS
    // into a semi-join — the decorrelated plan is the scalable shape;
    // the oracle runs the identical SQL text directly.
    "q50_correlated_subquery" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_q50")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q50")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n_above,
          |  MIN(o_orderkey) AS min_orderkey
          |FROM orders_q50 o
          |WHERE CAST(o_totalprice AS DECIMAL(14,2))
          |      * (SELECT COUNT(*) FROM orders_q50 o2
          |         WHERE o2.o_custkey = o.o_custkey)
          |    > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(14,2)))
          |       FROM orders_q50 o3 WHERE o3.o_custkey = o.o_custkey)
          |  AND EXISTS (SELECT 1 FROM lineitem_q50 l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_shipdate > o.o_orderdate)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    },

    // Recursive CTE surface (Spark 4's WITH RECURSIVE — the one SQL
    // family q26/q50 didn't touch): transitive closure with depth
    // accumulation over the per-region nation successor chains (a LEAD
    // window builds the edges, so the recursion also composes with
    // window functions). Spark's recursion accepts UNION ALL only
    // (UNION dedup raises UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — probed
    // round 12), so the graph must guarantee termination by SHAPE: edges
    // go strictly upward in nation id, every path is finite and unique,
    // and the final GROUP BY does the dedup work UNION would have.
    // Scale note: each iteration materializes as a joined union step —
    // right for hierarchy/BOM-shaped DIMENSION recursion like this;
    // corpus-sized closures use d09's multi-level contraction instead
    // (that is why d09's union-find never went through this surface).
    // The oracle runs the identical SQL text directly.
    "q51_recursive_cte" -> { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("nation_q51")
      s.sql(
        """WITH RECURSIVE succ AS (
          |  SELECT n_regionkey AS r, n_nationkey AS a,
          |    LEAD(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS b
          |  FROM nation_q51
          |),
          |edges AS (SELECT r, a, b FROM succ WHERE b IS NOT NULL),
          |reach(r, src, dst, depth) AS (
          |  SELECT r, a, b, 1 FROM edges
          |  UNION ALL
          |  SELECT e.r, rch.src, e.b, rch.depth + 1
          |  FROM reach rch JOIN edges e ON e.a = rch.dst AND e.r = rch.r
          |)
          |SELECT CAST(src AS INTEGER) AS src, COUNT(*) AS n_reach,
          |  CAST(MAX(depth) AS BIGINT) AS max_depth,
          |  CAST(MAX(dst) AS BIGINT) AS far_nation
          |FROM reach GROUP BY src ORDER BY src""".stripMargin)
    },

    // LATERAL correlated subquery — the remaining modern-SQL join
    // surface after q50's scalar/EXISTS decorrelation: per outer row, a
    // dependent subquery with its own ORDER BY + LIMIT (per-nation top-2
    // customers by balance — the "top-N per group" idiom ANSI SQL
    // writes as LATERAL). Identical SQL text both engines. Catalyst
    // DECORRELATES the lateral into a ranking join rather than
    // re-executing the inner query per outer row — which is the scale
    // story: per-key top-N over a correlated LATERAL plans exactly like
    // the window form (one exchange on the correlation key), so the
    // friendly SQL surface costs what the hand-written window costs.
    // Balances are raw column values (no float aggregation) — exact
    // cross-engine.
    "q53_lateral_topn" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer_q53")
      Tables.nation(s, d).createOrReplaceTempView("nation_q53")
      s.sql(
        """SELECT n.n_name AS nation, t.c_custkey, t.bal
          |FROM nation_q53 n, LATERAL (
          |  SELECT c_custkey, c_acctbal AS bal FROM customer_q53
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          |ORDER BY nation, bal DESC, c_custkey""".stripMargin)
    },

    // q51's recursion at CORPUS scale — the probe the q51 COVERAGE note
    // promises: bounded-depth (4) reachability over successor-chain
    // edges of the DOCUMENTS table, accumulating character mass along
    // each path. Per round the recursive arm joins the full frontier
    // (corpus-sized, one row per live path) against the corpus-sized
    // edge list — so the per-iteration cost now scales with DATA, not
    // just scheduling, which is what separates this from q51's 25-row
    // surface proof. Termination is doubly guaranteed: strictly
    // ascending chain edges (finite unique paths — the UNION ALL shape
    // Spark 4 requires) AND the explicit depth < 4 cap, the pattern a
    // production hierarchy walk uses against cyclic data. At 100 TB
    // each round is one co-partitionable equi-join on the frontier's
    // dst — bucket edges by `a` and the walk never re-exchanges them;
    // depth stays the driver-side lever.
    "q52_recursive_reachability" -> { (s, d) =>
      Tables.documents(s, d).createOrReplaceTempView("documents_q52")
      s.sql(
        """WITH RECURSIVE succ AS (
          |  SELECT source AS grp, doc_id AS a,
          |    LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS b
          |  FROM documents_q52
          |),
          |edges AS (SELECT grp, a, b FROM succ WHERE b IS NOT NULL),
          |chars AS (SELECT doc_id, n_chars FROM documents_q52),
          |walk(grp, src, dst, depth, chars_acc) AS (
          |  SELECT e.grp, e.a, e.b, 1, c.n_chars
          |  FROM edges e JOIN chars c ON c.doc_id = e.b
          |  UNION ALL
          |  SELECT e.grp, w.src, e.b, w.depth + 1, w.chars_acc + c.n_chars
          |  FROM walk w JOIN edges e ON e.a = w.dst AND e.grp = w.grp
          |  JOIN chars c ON c.doc_id = e.b
          |  WHERE w.depth < 4
          |)
          |SELECT grp AS source, CAST(depth AS INTEGER) AS depth,
          |  COUNT(*) AS n_paths,
          |  CAST(SUM(chars_acc) AS BIGINT) AS chars_reached,
          |  CAST(MAX(chars_acc) AS BIGINT) AS max_path_chars
          |FROM walk GROUP BY 1, 2 ORDER BY source, depth""".stripMargin)
    },

    // Navigation window functions: first/second/last order price per
    // customer over the full partition frame (deterministic ordering).
    "q39_window_navigation" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select($"o_custkey", $"o_orderkey",
          first($"o_totalprice").over(w).as("first_price"),
          nth_value($"o_totalprice", 2).over(w).as("second_price"),
          last($"o_totalprice").over(w).as("last_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // Statistical aggregates with cross-engine determinism: corr/stddev
    // derived from EXACT decimal moments (n, Σx, Σy, Σx², Σy², Σxy — all
    // decimal-exact, then one identical double formula). The built-in
    // corr()/stddev() stream doubles in engine-specific order and can
    // differ in final ulps; moments are associative and exact, so this
    // form is also the right 100 TB shape (map-side partial moment sums).
    "q40_exact_stats" -> { (s, d) =>
      import s.implicits._
      val x = dec2($"l_quantity")
      val y = $"l_discount".cast(DecimalType(8, 4))
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"), sum(x * y).as("sxy"))
        .select($"l_returnflag", $"n",
          round(
            ($"n" * $"sxy".cast("double") - $"sx".cast("double") * $"sy".cast("double")) /
              sqrt(($"n" * $"sxx".cast("double") - $"sx".cast("double") * $"sx".cast("double")) *
                ($"n" * $"syy".cast("double") - $"sy".cast("double") * $"sy".cast("double"))),
            6).as("corr_qty_disc"),
          round(sqrt(($"n" * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx".cast("double")) / ($"n" * ($"n" - 1))), 6)
            .as("stddev_qty"))
        .orderBy($"l_returnflag")
    },

    // GROUPING SETS — the general form behind rollup (q12) and cube (q22):
    // explicit per-dimension subtotals in ONE aggregation pass (Spark
    // expands sets via a single Expand + hash agg, not N scans).
    "q38_grouping_sets" -> { (s, d) =>
      import s.implicits._
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
          $"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(dec2($"o_totalprice")), 2).cast("double").as("total_price"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n_orders", $"total_price")
        .orderBy($"status", $"priority")
    },

    // Time-series SPINE + forward fill — the gap-filling op every
    // warehouse time-series report needs (missing periods materialized,
    // last observation carried forward), absent from the catalog until
    // now. Per customer: monthly spend, then every month from first to
    // last order is materialized; months with no orders carry the last
    // real month's spend. Census per calendar month: active vs filled
    // customers, real vs carried spend.
    //
    // Plan shape: NOT the textbook spine-left-join-then-
    // last_value(IGNORE NULLS) form (which costs a per-(ck,midx) join
    // plus a second ck-partitioned window pass over the exploded spine).
    // Instead each REAL month looks ahead with lead(midx) and explodes
    // sequence(midx, nxt-1) — the row that opens a gap emits the filled
    // rows itself, carrying its spend. One (ck,midx) partial agg, ONE
    // ck window exchange, no join, no null chasing; the explode happens
    // AFTER aggregation so fan-out is bounded by the customer's month
    // span, never by order count. The oracle deliberately keeps the
    // textbook join+IGNORE NULLS form — two independent formulations
    // agreeing row-for-row is a stronger check than a shared one.
    // Decimal discipline: spend stays an exact DECIMAL(14,2) sum until
    // the final round-then-cast (CLAUDE.md parity rule).
    // TPC-H Q21's shape (the benchmark's hardest decorrelation), adapted
    // to the harness schema: suppliers who were the SOLE returned-item
    // supplier on finalized multi-supplier orders. What it adds over
    // q04/q07/q50 is the correlated EXISTS *and* NOT EXISTS against the
    // SAME fact table with a ≠-key residual (l2.suppkey <> l1.suppkey) —
    // the self-join correlation pattern that defeats naive subquery
    // execution. Catalyst decorrelates both arms to LeftSemi/LeftAnti
    // hash joins on l_orderkey with the ≠ residual as a join filter
    // (PlanShapeSpec guards no-nested-loop), so at 100 TB each arm is
    // one co-partitionable equi-join on the fact key — bucket lineitem
    // by orderkey and all three sides co-locate. The SQL text is shared
    // verbatim with the oracle (the q26/q50 discipline); deterministic
    // (numwait DESC, unique s_name) total order.
    "q56_waiting_suppliers" -> { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q56")
      Tables.orders(s, d).createOrReplaceTempView("orders_q56")
      Tables.supplier(s, d).createOrReplaceTempView("supplier_q56")
      s.sql(
        """SELECT s.s_name, COUNT(*) AS numwait,
          |  MIN(l1.l_orderkey) AS min_orderkey
          |FROM lineitem_q56 l1
          |JOIN orders_q56 o
          |  ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
          |JOIN supplier_q56 s ON s.s_suppkey = l1.l_suppkey
          |WHERE l1.l_returnflag = 'R'
          |  AND EXISTS (SELECT 1 FROM lineitem_q56 l2
          |              WHERE l2.l_orderkey = l1.l_orderkey
          |                AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM lineitem_q56 l3
          |                  WHERE l3.l_orderkey = l1.l_orderkey
          |                    AND l3.l_suppkey <> l1.l_suppkey
          |                    AND l3.l_returnflag = 'R')
          |GROUP BY s.s_name
          |ORDER BY numwait DESC, s_name""".stripMargin)
    },

    "q55_gapfill_spine" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val mo = Tables.orders(s, d)
        .groupBy($"o_custkey".as("ck"),
          (year($"o_orderdate") * 12 + month($"o_orderdate") - 1)
            .cast("long").as("midx"))
        .agg(sum(dec2($"o_totalprice")).as("spend"))
      val w = Window.partitionBy($"ck").orderBy($"midx")
      mo.withColumn("nxt", lead($"midx", 1).over(w))
        .select($"ck", $"spend", $"midx",
          explode(sequence($"midx", coalesce($"nxt" - 1, $"midx"))).as("m"))
        .groupBy(expr("CAST(m DIV 12 AS INT)").as("o_year"),
          expr("CAST(m % 12 + 1 AS INT)").as("o_month"))
        .agg(count(lit(1)).as("n_customers"),
          count(when($"m" === $"midx", 1)).as("n_active"),
          count(when($"m" =!= $"midx", 1)).as("n_filled"),
          round(sum(when($"m" === $"midx", $"spend")), 2).cast("double")
            .as("real_spend"),
          round(sum(when($"m" =!= $"midx", $"spend")), 2).cast("double")
            .as("carried_spend"))
        .orderBy($"o_year", $"o_month")
    }
  )

  private val sRevenue =
    s"${sDec2("l_extendedprice")} * ($sOne4 - ${sDec4("l_discount")})"

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sDSum(sDec2("l_quantity"))} AS sum_qty,
         | ${sDSum(sDec2("l_extendedprice"))} AS sum_base_price,
         | ${sDSum(sRevenue)} AS sum_disc_price,
         | ${sDSum(s"CAST($sRevenue AS DECIMAL(18,6)) * ($sOne4 + ${sDec4("l_tax")})")} AS sum_charge,
         | ${sDSum(sDec2("l_quantity"))} / COUNT(*) AS avg_qty,
         | ${sDSum(sDec2("l_extendedprice"))} / COUNT(*) AS avg_price,
         | ${sDSum4(sDec4("l_discount"))} / COUNT(*) AS avg_disc,
         | COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_region_stats" ->
      s"""SELECT r_name, COUNT(*) AS n_customers,
         | ${sDSum(sDec2("c_acctbal"))} AS total_acctbal,
         | ${sDSum(sDec2("c_acctbal"))} / COUNT(*) AS avg_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q03_shipping_priority" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         | ${sDSum(sRevenue)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
         |  AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
         |GROUP BY o_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_region_revenue" ->
      s"""SELECT n_name, ${sDSum(sRevenue)} AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q06_revenue_delta" ->
      s"""SELECT ${sDSum(s"${sDec2("l_extendedprice")} * ${sDec4("l_discount")}")} AS revenue,
         | COUNT(*) AS n_items
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q07_customers_without_orders" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q08_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q09_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q10_running_spend" ->
      s"""SELECT o_custkey, o_orderkey,
         | CAST(SUM(${sDec2("o_totalprice")}) OVER (PARTITION BY o_custkey
         |   ORDER BY o_orderdate, o_orderkey
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
         | CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
         |   ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
         |FROM orders ORDER BY o_custkey, order_seq""".stripMargin,

    "q11_distinct_counts" ->
      """SELECT l_returnflag,
        | CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        | CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        | COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q12_rollup_summary" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         | ${sDSum(sDec2("l_quantity"))} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q13_set_ops" ->
      """(SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
        | INTERSECT
        | SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
        |EXCEPT
        |SELECT DISTINCT o_custkey AS custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '2002-01-01 00:00:00'
        |ORDER BY custkey""".stripMargin,

    "q14_monthly_orders" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         | CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
         | COUNT(*) AS n_orders,
         | ${sDSum(sDec2("o_totalprice"))} AS total_sales
         |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q15_part_stats" ->
      s"""SELECT p_type, COUNT(*) AS n_parts,
         | ${sDSum(sDec2("p_retailprice"))} / COUNT(*) AS avg_price,
         | CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS total_size,
         | CAST(MAX(length(p_name)) AS INTEGER) AS max_name_len,
         | CAST(COUNT(DISTINCT regexp_extract(p_brand, '[0-9]+')) AS BIGINT) AS n_brands
         |FROM part GROUP BY p_type ORDER BY p_type""".stripMargin,

    "q16_route_count" -> {
      val sqlUpperCamel = sqlUpperCamelFold("event_type")
      s"""SELECT $sqlUpperCamel AS code,
         | COUNT(*) AS n_events,
         | ${sDSum(sDec2("value"))} AS total_value,
         | CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_k
         |FROM events
         |WHERE json_extract_string(props, '$$.k') IS NOT NULL
         |  AND $sqlUpperCamel IN ('Click', 'Purchase', 'Signup')
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q17_hourly_events" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
         | COUNT(*) AS n, ${sDSum(sDec2("value"))} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // dialect delta: DuckDB's ordered string aggregate is
    // string_agg(expr, sep ORDER BY ...) — same result as LISTAGG
    // WITHIN GROUP under the same total order
    "q54_filtered_aggregates" ->
      """WITH top3 AS (SELECT c_mktsegment, c_name,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal DESC, c_name) AS rn
        |  FROM customer),
        |lg AS (SELECT c_mktsegment,
        |    string_agg(c_name, '|' ORDER BY rn) AS top_names
        |  FROM top3 WHERE rn <= 3 GROUP BY c_mktsegment),
        |agg AS (SELECT c_mktsegment,
        |    COUNT(*) AS n_cust,
        |    COUNT(*) FILTER (WHERE c_acctbal < 0) AS n_debtors,
        |    CAST(ROUND(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(14,2)))
        |      FILTER (WHERE c_nationkey < 10), 0.00), 2) AS DOUBLE)
        |      AS bal_low_nations,
        |    BOOL_AND(c_acctbal >= -1000) AS all_above_floor,
        |    BOOL_OR(c_acctbal > 9000) AS any_rich
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT a.c_mktsegment, CAST(n_cust AS BIGINT) AS n_cust,
        |  CAST(n_debtors AS BIGINT) AS n_debtors, bal_low_nations,
        |  all_above_floor, any_rich, top_names
        |FROM agg a JOIN lg ON a.c_mktsegment = lg.c_mktsegment
        |ORDER BY a.c_mktsegment""".stripMargin,

    "q18_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), se AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM t)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM se GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q21_order_gaps" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  CAST(date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS INTEGER) AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q22_cube_summary" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         | ${sDSum(sDec2("o_totalprice"))} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q23_pivot_status" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_salted_event_stats" ->
      s"""SELECT event_type, COUNT(*) AS n_events,
         | ${sDSum(sDec2("value"))} AS total_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q25_variant_props" ->
      """WITH k AS (SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL)
        |SELECT k % 10 AS k_bucket, COUNT(*) AS n,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    "q26_sql_surface" ->
      """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY c_mktsegment, o_orderstatus
        |ORDER BY c_mktsegment, o_orderstatus""".stripMargin,

    "q27_top_suppliers_having" ->
      s"""SELECT s_suppkey, s_name, ${sDSum(sRevenue)} AS revenue, COUNT(*) AS n_items
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_suppkey, s_name
         |HAVING COUNT(*) > 100
         |ORDER BY s_suppkey""".stripMargin,

    "q28_order_lists" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR)) AS orderkeys_csv
        |FROM orders GROUP BY o_custkey
        |HAVING COUNT(*) <= 3
        |ORDER BY o_custkey""".stripMargin,

    "q29_rolling_spend" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 90 DAYS PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
        |    AS spend_90d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q30_full_outer_activity" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d1, COUNT(*) AS n_ordered
        |  FROM orders GROUP BY 1),
        |l AS (SELECT CAST(l_shipdate AS DATE) AS d2, COUNT(*) AS n_shipped
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(COALESCE(d1, d2) AS TIMESTAMP) AS day,
        |  COALESCE(n_ordered, 0) AS n_ordered,
        |  COALESCE(n_shipped, 0) AS n_shipped
        |FROM o FULL OUTER JOIN l ON d1 = d2
        |ORDER BY day""".stripMargin,

    "q31_multiset_ops" ->
      """WITH a AS (SELECT l_suppkey AS suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'),
        |b AS (SELECT l_suppkey AS suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'),
        |e AS (SELECT suppkey FROM a EXCEPT ALL SELECT suppkey FROM b),
        |i AS (SELECT suppkey FROM a INTERSECT ALL SELECT suppkey FROM b),
        |se AS (SELECT suppkey, COUNT(*) AS surplus FROM e GROUP BY suppkey),
        |si AS (SELECT suppkey, COUNT(*) AS overlap FROM i GROUP BY suppkey)
        |SELECT COALESCE(se.suppkey, si.suppkey) AS suppkey,
        |  COALESCE(surplus, 0) AS surplus, COALESCE(overlap, 0) AS overlap
        |FROM se FULL OUTER JOIN si ON se.suppkey = si.suppkey
        |ORDER BY suppkey""".stripMargin,

    "q32_string_kitchen" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lower(p_brand) AS lo,
        |  reverse(p_type) AS rev,
        |  lpad(p_brand, 12, '*') AS pad,
        |  substr(p_name, 3, 5) AS sub,
        |  concat_ws('|', p_brand, p_type) AS joined,
        |  CAST(length(replace(p_name, ' ', '')) AS BIGINT) AS squeezed_len,
        |  CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
        |FROM part WHERE p_partkey <= 50 ORDER BY p_partkey""".stripMargin,

    "q33_temporal_fns" ->
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 30 DAY AS due,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS age_days
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin,

    "q34_window_distribution" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(rank() OVER wt AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER wt AS INTEGER) AS drnk
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey),
        |  wt AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q35_percentiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS median_price,
        |  quantile_cont(o_totalprice, 0.9) AS p90_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q19_above_nation_avg" ->
      s"""WITH na AS (
         |  SELECT c_nationkey AS nk,
         |    ${sDSum(sDec2("c_acctbal"))} / COUNT(*) AS nation_avg
         |  FROM customer GROUP BY c_nationkey)
         |SELECT c_custkey, c_acctbal, nation_avg
         |FROM customer JOIN na ON c_nationkey = nk
         |WHERE c_acctbal > nation_avg ORDER BY c_custkey""".stripMargin,

    // The HLL estimate itself is engine-specific, so the oracle emits the
    // exact count and a literal `true` verdict: Spark's side computes the
    // verdict from the sketch, so any sketch degradation hash-mismatches.
    "q20_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  true AS within_5rsd
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q36_asof_attribution" ->
      """SELECT p.event_id AS purchase_id, p.user_id AS user_id,
        |  CASE WHEN c.ts >= p.ts - INTERVAL 7 DAY THEN c.click_id END AS click_id,
        |  CASE WHEN c.ts >= p.ts - INTERVAL 7 DAY
        |       THEN CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 60000000 AS BIGINT)
        |  END AS mins_since_click
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (
        |  SELECT user_id, ts, max(event_id) AS click_id FROM events
        |  WHERE event_type = 'click' GROUP BY user_id, ts) c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY purchase_id""".stripMargin,

    "q37_range_join" ->
      s"""WITH brackets(bracket, lo, hi) AS (VALUES
         |  ('p1_subzero', -100000.0, 0.0), ('p2_low', 0.0, 2500.0),
         |  ('p3_mid', 2500.0, 5000.0), ('p4_high', 5000.0, 7500.0),
         |  ('p5_top', 7500.0, 100000.0))
         |SELECT bracket, COUNT(*) AS n_customers,
         |  ${sDSum(sDec2("c_acctbal"))} AS total_bal
         |FROM customer JOIN brackets ON c_acctbal >= lo AND c_acctbal < hi
         |GROUP BY bracket ORDER BY bracket""".stripMargin,

    "q41_sliding_windows" ->
      s"""WITH w AS (
         |  SELECT time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15 * j) AS window_start,
         |    event_type, value
         |  FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS j))
         |SELECT window_start, event_type, COUNT(*) AS n,
         |  ${sDSum(sDec2("value"))} AS total_value
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q42_unpivot_measures" ->
      s"""WITH u AS (
         |  UNPIVOT (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount
         |           FROM lineitem)
         |  ON l_quantity, l_extendedprice, l_discount INTO NAME measure VALUE val)
         |SELECT l_returnflag, measure, COUNT(*) AS n,
         |  ${sDSum(sDec2("val"))} AS total
         |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q43_price_band_frame" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice,
         |  COUNT(*) OVER w AS n_similar,
         |  CAST(round(SUM(${sDec2("o_totalprice")}) OVER w, 2) AS DOUBLE) AS band_total
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey
         |  ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)
         |  RANGE BETWEEN 50000 PRECEDING AND 50000 FOLLOWING)
         |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // DATE subtraction yields integer days in DuckDB; both engines
    // truncate weeks to Monday, so offsets are exact integer division
    "q44_cohort_retention" ->
      raw"""WITH ua AS (SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk FROM events),
           |f AS (SELECT user_id, wk, min(wk) OVER (PARTITION BY user_id) AS cohort_week FROM ua)
           |SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, CAST((wk - cohort_week) // 7 AS INTEGER) AS week_offset,
           |  COUNT(DISTINCT user_id) AS n_users
           |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // epoch_us over the naive timestamp == Spark's unix_micros under the
    // pinned UTC session; all counts/sums are exact integers
    "q45_funnel_conversion" ->
      raw"""WITH s1 AS (SELECT user_id, event_type, ts,
           |    min(CASE WHEN event_type = 'view' THEN ts END) OVER (PARTITION BY user_id) AS t1
           |  FROM events),
           |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
           |    OVER (PARTITION BY user_id) AS t2 FROM s1),
           |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
           |    OVER (PARTITION BY user_id) AS t3 FROM s2),
           |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
           |  FROM s3 GROUP BY user_id)
           |SELECT COUNT(*) AS n_users, COUNT(t1) AS viewed,
           |  COUNT(t2) AS clicked_after_view, COUNT(t3) AS purchased_after_click,
           |  CASE WHEN COUNT(t1) > 0
           |    THEN round(CAST(COUNT(t2) AS DOUBLE) / COUNT(t1), 6) END AS view_to_click_rate,
           |  CASE WHEN COUNT(t2) > 0
           |    THEN round(CAST(COUNT(t3) AS DOUBLE) / COUNT(t2), 6) END AS click_to_purchase_rate,
           |  CAST(SUM(CASE WHEN t3 IS NOT NULL THEN epoch_us(t3) - epoch_us(t1) END) AS BIGINT)
           |    AS total_view_to_purchase_us
           |FROM u""".stripMargin,

    // same md5 arrival key text both engines; epoch_us over the naive
    // timestamp == Spark's unix_micros under the pinned UTC session
    "q46_late_data_census" ->
      raw"""WITH a AS (SELECT event_id, ts, event_type,
           |    ('0x' || substr(md5('q46:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS ak,
           |    event_id % 8 AS shard
           |  FROM events),
           |t AS (SELECT event_type, ts,
           |    max(ts) OVER (PARTITION BY shard ORDER BY ak, event_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hw
           |  FROM a),
           |l AS (SELECT event_type,
           |    greatest(epoch_us(coalesce(hw, ts)) - epoch_us(ts), 0) AS late_us FROM t)
           |SELECT event_type, COUNT(*) AS n_events,
           |  CAST(COUNT(*) FILTER (late_us > 600000000) AS BIGINT) AS n_late_10m,
           |  CAST(COUNT(*) FILTER (late_us > 3600000000) AS BIGINT) AS n_dropped_1h,
           |  CAST(max(late_us) AS BIGINT) AS max_late_us,
           |  round(CAST(COUNT(*) FILTER (late_us > 600000000) AS DOUBLE) / COUNT(*), 6) AS late_rate
           |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the oracle replays the interval construction and joins with a
    // plain BETWEEN — semantically identical to the binned equi-join
    // (RangeJoinSpec proves the operator == the naive join); windows
    // are whole minutes, so minute-granular containment is exact
    "q47_spike_census" ->
      raw"""WITH e AS (SELECT event_id, user_id, value,
           |    epoch_us(ts) // 60000000 AS mi FROM events),
           |pm AS (SELECT mi, COUNT(*) AS c FROM e GROUP BY mi),
           |st AS (SELECT COUNT(*) AS n_min, CAST(SUM(c) AS BIGINT) AS n_ev FROM pm),
           |hot AS (SELECT mi FROM pm CROSS JOIN st WHERE c * 2 * n_min > 3 * n_ev),
           |fl AS (SELECT mi, CASE WHEN mi - LAG(mi) OVER (ORDER BY mi) <= 5
           |    THEN 0 ELSE 1 END AS nf FROM hot),
           |isl AS (SELECT mi, SUM(nf) OVER (ORDER BY mi
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM fl),
           |iv AS (SELECT MIN(mi) AS s_mi, MAX(mi) AS e_mi, COUNT(*) AS n_hot
           |  FROM isl GROUP BY grp),
           |j AS (SELECT iv.*, e.event_id, e.user_id, e.value
           |  FROM e JOIN iv ON e.mi >= iv.s_mi AND e.mi <= iv.e_mi)
           |SELECT make_timestamp(s_mi * 60000000) AS window_start,
           |  make_timestamp((e_mi + 1) * 60000000) AS window_end,
           |  e_mi - s_mi + 1 AS n_minutes, n_hot,
           |  COUNT(*) AS n_events,
           |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           |  ${sDSum(sDec2("value"))} AS total_value
           |FROM j GROUP BY s_mi, e_mi, n_hot ORDER BY window_start""".stripMargin,

    // the oracle replays the SAME cents-histogram rank selection (exact
    // integers until the one final double division — bitwise parity by
    // construction) and emits literal true for the rank verdict — a
    // degraded sketch flips the boolean and the hash
    "q48_sketch_quantile" ->
      s"""WITH h AS (SELECT l_returnflag AS rf,
         |    CAST(${sDec2("l_extendedprice")} * 100 AS BIGINT) AS cents,
         |    COUNT(*) AS cnt
         |  FROM lineitem GROUP BY 1, 2),
         |c AS (SELECT rf, cents,
         |    SUM(cnt) OVER (PARTITION BY rf ORDER BY cents) AS cum,
         |    SUM(cnt) OVER (PARTITION BY rf) AS nn
         |  FROM h),
         |m AS (SELECT rf,
         |    MIN(CASE WHEN cum >= (nn + 1) // 2 THEN cents END) AS v1,
         |    MIN(CASE WHEN cum >= (nn + 2) // 2 THEN cents END) AS v2,
         |    MIN(nn) AS n
         |  FROM c GROUP BY rf)
         |SELECT rf AS l_returnflag, CAST(n AS BIGINT) AS n,
         |  CAST(v1 + v2 AS DOUBLE) / 200.0 AS p50_exact,
         |  true AS sketch_ok
         |FROM m ORDER BY l_returnflag""".stripMargin,

    // NULLS FIRST pinned explicitly — DuckDB's ASC default is NULLS
    // LAST, Spark's is NULLS FIRST; everything else (NULL groups,
    // count(col) skipping, UNKNOWN comparisons) agrees by the standard
    "q49_null_semantics" ->
      s"""SELECT c_mktsegment, nullif(c_nationkey % 5, 0) AS nv,
         |  COUNT(*) AS n_rows,
         |  CAST(COUNT(nullif(c_nationkey % 5, 0)) AS BIGINT) AS n_nonnull,
         |  CAST(SUM(CASE WHEN (nullif(c_nationkey % 5, 0) = 2) IS NULL
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_unknown_cmp,
         |  ${sDSum(sDec2("c_acctbal"))} AS total_bal
         |FROM customer
         |GROUP BY c_mktsegment, nullif(c_nationkey % 5, 0)
         |ORDER BY c_mktsegment, nv ASC NULLS FIRST""".stripMargin,

    // identical SQL text to the Spark side (run directly by DuckDB —
    // both engines iterate UNION ALL recursion to a fixpoint)
    "q53_lateral_topn" ->
      """SELECT n.n_name AS nation, t.c_custkey, t.bal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal AS bal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY nation, bal DESC, c_custkey""".stripMargin,

    // identical SQL text modulo the temp-view name (the driver's views
    // are named after the parquet tables)
    "q52_recursive_reachability" ->
      """WITH RECURSIVE succ AS (
        |  SELECT source AS grp, doc_id AS a,
        |    LEAD(doc_id) OVER (PARTITION BY source ORDER BY doc_id) AS b
        |  FROM documents
        |),
        |edges AS (SELECT grp, a, b FROM succ WHERE b IS NOT NULL),
        |chars AS (SELECT doc_id, n_chars FROM documents),
        |walk(grp, src, dst, depth, chars_acc) AS (
        |  SELECT e.grp, e.a, e.b, 1, c.n_chars
        |  FROM edges e JOIN chars c ON c.doc_id = e.b
        |  UNION ALL
        |  SELECT e.grp, w.src, e.b, w.depth + 1, w.chars_acc + c.n_chars
        |  FROM walk w JOIN edges e ON e.a = w.dst AND e.grp = w.grp
        |  JOIN chars c ON c.doc_id = e.b
        |  WHERE w.depth < 4
        |)
        |SELECT grp AS source, CAST(depth AS INTEGER) AS depth,
        |  COUNT(*) AS n_paths,
        |  CAST(SUM(chars_acc) AS BIGINT) AS chars_reached,
        |  CAST(MAX(chars_acc) AS BIGINT) AS max_path_chars
        |FROM walk GROUP BY 1, 2 ORDER BY source, depth""".stripMargin,

    "q51_recursive_cte" ->
      """WITH RECURSIVE succ AS (
        |  SELECT n_regionkey AS r, n_nationkey AS a,
        |    LEAD(n_nationkey) OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS b
        |  FROM nation
        |),
        |edges AS (SELECT r, a, b FROM succ WHERE b IS NOT NULL),
        |reach(r, src, dst, depth) AS (
        |  SELECT r, a, b, 1 FROM edges
        |  UNION ALL
        |  SELECT e.r, rch.src, e.b, rch.depth + 1
        |  FROM reach rch JOIN edges e ON e.a = rch.dst AND e.r = rch.r
        |)
        |SELECT CAST(src AS INTEGER) AS src, COUNT(*) AS n_reach,
        |  CAST(MAX(depth) AS BIGINT) AS max_depth,
        |  CAST(MAX(dst) AS BIGINT) AS far_nation
        |FROM reach GROUP BY src ORDER BY src""".stripMargin,

    // identical SQL text to the Spark side (run directly by DuckDB)
    "q50_correlated_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above,
        |  MIN(o_orderkey) AS min_orderkey
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(14,2))
        |      * (SELECT COUNT(*) FROM orders o2
        |         WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(14,2)))
        |       FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q39_window_navigation" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  last_value(o_totalprice) OVER w AS last_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q40_exact_stats" ->
      s"""WITH m AS (SELECT l_returnflag,
         |  COUNT(*) AS n,
         |  SUM(${sDec2("l_quantity")}) AS sx,
         |  SUM(${sDec4("l_discount")}) AS sy,
         |  SUM(${sDec2("l_quantity")} * ${sDec2("l_quantity")}) AS sxx,
         |  SUM(${sDec4("l_discount")} * ${sDec4("l_discount")}) AS syy,
         |  SUM(${sDec2("l_quantity")} * ${sDec4("l_discount")}) AS sxy
         | FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         |  round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
         |         (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         |    AS corr_qty_disc,
         |  round(sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |    / (n * (n - 1))), 6) AS stddev_qty
         |FROM m ORDER BY l_returnflag""".stripMargin,

    "q38_grouping_sets" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n_orders,
         |  ${sDSum(sDec2("o_totalprice"))} AS total_price
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |ORDER BY status, priority""".stripMargin,

    // the identical SQL text (q26/q50 discipline), view suffixes dropped
    "q56_waiting_suppliers" ->
      """SELECT s.s_name, COUNT(*) AS numwait,
        |  MIN(l1.l_orderkey) AS min_orderkey
        |FROM lineitem l1
        |JOIN orders o
        |  ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    // deliberately the TEXTBOOK spine formulation (generate_series +
    // left join + last_value IGNORE NULLS) — an independent derivation
    // of the Spark side's lead+sequence fill, see the query scaladoc
    "q55_gapfill_spine" ->
      s"""WITH mo AS (SELECT o_custkey AS ck,
         |      CAST(EXTRACT(year FROM o_orderdate)*12 + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS midx,
         |      SUM(${sDec2("o_totalprice")}) AS spend
         |    FROM orders GROUP BY 1, 2),
         |sp AS (SELECT ck, MIN(midx) AS lo, MAX(midx) AS hi FROM mo GROUP BY ck),
         |spine AS (SELECT ck, unnest(generate_series(lo, hi)) AS midx FROM sp),
         |j AS (SELECT s.ck, s.midx, m.spend
         |      FROM spine s LEFT JOIN mo m ON s.ck = m.ck AND s.midx = m.midx),
         |f AS (SELECT ck, midx, spend,
         |        last_value(spend IGNORE NULLS) OVER (PARTITION BY ck
         |          ORDER BY midx ROWS UNBOUNDED PRECEDING) AS filled
         |      FROM j)
         |SELECT CAST(midx // 12 AS INTEGER) AS o_year,
         |  CAST(midx % 12 + 1 AS INTEGER) AS o_month,
         |  COUNT(*) AS n_customers, COUNT(spend) AS n_active,
         |  COUNT(*) - COUNT(spend) AS n_filled,
         |  CAST(ROUND(SUM(spend), 2) AS DOUBLE) AS real_spend,
         |  CAST(ROUND(SUM(CASE WHEN spend IS NULL THEN filled END), 2) AS DOUBLE) AS carried_spend
         |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
