package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{Ops, Sinks}
import SparkEntry.{cat, dirFingerprint, scratch}

/** Relational/analytic tier of the driver surface: grouping (rollup/cube/grouping-sets/pivot), window functions, join variants (asof/range/interval/geo/bloom/salted/nullsafe), set ops, subqueries, date/string/array/map functions, sampling, file-format roundtrips, and table-maintenance ops.
  *
  * Extracted verbatim from [[SparkEntry.queriesBase]] — same keys, same
  * closures, zero behavior change; the matching oracle SQL stays in
  * [[OracleSql]]. */
object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---------------------------------------------------- analytics core
    "q_filter_pred" -> ((s, dir) => {
      val c = cat(s, dir)
      c.lineitem
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q_agg_group" -> ((s, dir) => {
      val c = cat(s, dir)
      c.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
          count(lit(1)).as("cnt"),
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_distinct" -> ((s, dir) =>
      cat(s, dir).orders.agg(countDistinct(col("o_custkey")).as("n"))),

    "q_rollup" -> ((s, dir) => {
      val c = cat(s, dir)
      c.orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)
    }),

    "q_grouping_sets" -> ((s, dir) => {
      val c = cat(s, dir)
      c.orders.groupingSets(
          Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq.empty),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)
    }),

    "q_cube" -> ((s, dir) => {
      val c = cat(s, dir)
      c.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)
    }),

    "q_pivot" -> ((s, dir) => {
      // Explicit value list: at scale pivot must not run the implicit
      // distinct-values job over the full corpus.
      val langs = Seq("de", "en", "es", "fr", "zh")
      cat(s, dir).documents
        .groupBy("source").pivot("lang", langs).count()
        .na.fill(0, langs)
        .orderBy("source")
    }),

    "q_date_spine" -> ((s, dir) => {
      // Calendar-spine gap filling: generated month series left-joined to
      // monthly aggregates, missing months zero-filled — the time-series
      // reporting pattern an event-sourced table can't produce by grouping
      // alone (absent months simply don't group).
      val months = s.range(0, 84).select(
        add_months(lit("1995-01-01").cast("date"), col("id").cast("int")).as("month"))
      val o = cat(s, dir).orders
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("r"))
      months.join(o, col("month") === col("m"), "left")
        .select(col("month"), coalesce(col("n"), lit(0L)).as("n_orders"),
          round(coalesce(col("r"), lit(0.0)), 2).as("rev"))
        .orderBy("month")
    }),

    "q_unpivot" -> ((s, dir) => {
      // Wide → long reshape (the inverse of q_pivot): metrics melt into
      // (metric, value) rows.
      cat(s, dir).lineitem
        .filter(col("l_orderkey") < 20)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        // value included: (orderkey, linenumber) repeats in this corpus, so
        // the three-column prefix alone is not a total order
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")
    }),

    "q_percentile" -> ((s, dir) => {
      cat(s, dir).lineitem.agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 2).as("med"),
        round(expr("percentile(l_extendedprice, 0.9)"), 2).as("p90"))
    }),

    "q_approx_percentile" -> ((s, dir) => {
      // Sketch-based tier (KLL-style): the 100 TB default, where the exact
      // percentile's global sort-and-count is not worth its shuffle. Returns
      // a real element of the dataset, so no interpolating oracle — driver
      // records the rows-only check; the spec pins sketch-vs-exact error.
      cat(s, dir).lineitem.agg(
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 2).as("approx_med"))
    }),

    "q_stats_agg" -> ((s, dir) => {
      cat(s, dir).lineitem.groupBy("l_returnflag").agg(
          round(stddev_samp(col("l_extendedprice")), 2).as("sd"),
          round(var_samp(col("l_extendedprice")), 2).as("vr"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("cr"))
        .orderBy("l_returnflag")
    }),

    "q_topk" -> ((s, dir) =>
      Ops.topK(cat(s, dir).orders.select("o_orderkey", "o_totalprice"), 25,
        Seq(col("o_totalprice").desc, col("o_orderkey")))),

    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      cat(s, dir).orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey")
        .orderBy("o_custkey")
    }),

    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cat(s, dir).orders.select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("run_spend"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    "q_left_join_agg" -> ((s, dir) => {
      val c = cat(s, dir)
      c.customer.join(c.orders, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
             round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("spend"))
        .orderBy("c_custkey")
    }),

    "q_asof_join" -> ((s, dir) => {
      // Each event matched to the user's latest order at-or-before the event
      // time. Right side pre-aggregated to one row per (key, time) — the
      // ASOF contract in both engines.
      val c = cat(s, dir)
      val ev = c.events.select("event_id", "user_id", "ts")
      val ord = c.orders.groupBy(col("o_custkey"),
          col("o_orderdate").cast("timestamp").as("o_ts"))
        .agg(max("o_orderkey").as("last_orderkey"))
      Ops.asofJoin(ev, ord, "user_id", "o_custkey", "ts", "o_ts",
          Seq("last_orderkey"))
        .orderBy("event_id")
    }),

    "q_semi_join" -> ((s, dir) => {
      val c = cat(s, dir)
      c.customer.join(c.orders.filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_anti_join" -> ((s, dir) => {
      val c = cat(s, dir)
      c.part.join(c.lineitem, col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),

    "q_full_outer_join" -> ((s, dir) => {
      // Nations with customers but no suppliers (and vice versa) survive
      // with nulls — the reconciliation-report join shape.
      val c = cat(s, dir)
      val cust = c.customer.groupBy(col("c_nationkey").as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = c.supplier.groupBy(col("s_nationkey").as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, col("nk_c") === col("nk_s"), "full_outer")
        .select(coalesce(col("nk_c"), col("nk_s")).as("nk"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy("nk")
    }),

    "q_except_all" -> ((s, dir) => {
      // Multiset difference: duplicates preserved (one removal per match),
      // unlike q_except's set semantics.
      val c = cat(s, dir)
      c.orders.select(col("o_custkey").as("k"))
        .exceptAll(c.customer.select(col("c_custkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .orderBy("k")
    }),

    "q_collect_sorted" -> ((s, dir) => {
      // Array aggregation made deterministic: collect_list order is
      // partition-dependent, so sort before joining to a string.
      val c = cat(s, dir)
      c.supplier.groupBy(col("s_nationkey").as("nk"))
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",").as("names"),
          countDistinct(col("s_name")).as("n"))
        .orderBy("nk")
    }),

    "q_dense_rank" -> ((s, dir) => {
      // Partitioned by customer (cardinality scales with the data), not by
      // o_orderstatus (3 values → ≤3 tasks at any cluster size). rank /
      // dense_rank are value-determined, so priority ties need no tiebreak.
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderpriority"))
      cat(s, dir).orders
        .select(col("o_orderkey"), col("o_custkey"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy("o_orderkey")
    }),

    "q_union" -> ((s, dir) => {
      val c = cat(s, dir)
      c.customer.select(col("c_custkey").as("k"), lit("customer").as("src"))
        .unionAll(c.supplier.select(col("s_suppkey").as("k"), lit("supplier").as("src")))
        .orderBy("k", "src")
    }),

    "q_except" -> ((s, dir) => {
      val c = cat(s, dir)
      c.part.select(col("p_partkey").as("k"))
        .except(c.lineitem.select(col("l_partkey").as("k")))
        .orderBy("k")
    }),

    "q_json_extract" -> ((s, dir) => {
      cat(s, dir).events.select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    }),

    "q_json_schema" -> ((s, dir) => {
      // Schema-full parse: from_json materializes a typed struct once, so
      // multiple field accesses don't re-parse the document (get_json_object
      // re-parses per call) — the scale choice for wide props.
      cat(s, dir).events
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        .orderBy("event_id")
    }),

    "q_window_range" -> ((s, dir) => {
      // Value-based RANGE frame: all orders within 1000.0 of the current
      // price — frame membership is by value, so output is deterministic
      // even under order ties.
      val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, Window.currentRow)
      cat(s, dir).orders
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          count(lit(1)).over(w).as("n_in_band"))
        .orderBy("o_orderkey")
    }),

    "q_bucketed_join" -> ((s, dir) => {
      // Pay the shuffle ONCE at write time: both sides co-bucketed on the
      // join key, so the join itself plans with zero exchanges (SinksSpec
      // pins the no-Exchange SMJ). The 100 TB lever for every repeated join
      // against the same key — and the amortization IS the point, so within
      // a session the bucketed tables build once and every later run pays
      // only the exchange-free probe (a per-run rebuild would re-charge the
      // one-time shuffle to every join). Table names carry the input dir's
      // md5 fingerprint: a different corpus in the same session cannot
      // reuse them (see dirFingerprint for the in-place-rewrite caveat).
      val c = cat(s, dir)
      val sfx = dirFingerprint(dir)
      val (tc, to) = (s"graft_q_bkt_cust_$sfx", s"graft_q_bkt_ord_$sfx")
      if (!s.catalog.tableExists(tc))
        Sinks.rewriteBucketed(s, c.customer.select("c_custkey", "c_acctbal"),
          tc, "c_custkey", 8)
      if (!s.catalog.tableExists(to))
        Sinks.rewriteBucketed(s, c.orders.select("o_custkey", "o_totalprice"),
          to, "o_custkey", 8)
      s.table(tc)
        .join(s.table(to), col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("spend"))
        .orderBy("c_custkey")
    }),

    "q_compact" -> ((s, dir) => {
      // Small-files pathology and remedy: a fragmented write (64 part files
      // — the debris streaming sinks and incremental ingests accrete)
      // compacted into size-targeted files; the compacted table must agree
      // with the source. At 100 TB the file listing + footer reads of an
      // uncompacted table dominate scan startup.
      // The fragmented SOURCE is the fixture, not the operator under test:
      // build it once per (session, corpus) like the bucketed tables above
      // (same precedent: q_bkt_* memoize their rewrite) so repeat passes
      // time compaction + verification, not fixture creation. dir-keyed via
      // dirFingerprint — Verify(sf0.01), Bench(sf0.1), and the sf1 scale
      // probe must not serve each other a stale 64-file table.
      val sfx = dirFingerprint(dir)
      val src = scratch(s, s"compact_q_src_$sfx")
      val dst = scratch(s, s"compact_q_dst_$sfx")
      SparkEntry.withPathLock(src) {
        if (!new java.io.File(s"$src/_SUCCESS").exists())
          cat(s, dir).lineitem.select("l_orderkey", "l_quantity")
            .repartition(64).write.mode("overwrite").parquet(src)
      }
      Sinks.compact(s, src, dst)
      s.read.parquet(dst)
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
    }),

    // ------------------------------------------- relational surface, round 3
    "q_topk_per_group" -> ((s, dir) => {
      // Top-2 orders per customer via the CUSTOM top-k-per-group operator
      // (graft.plans.TopKPerGroup: LogicalPlan + Strategy + bounded-heap
      // SparkPlan). Same single exchange as the row_number window, but
      // O(n log k) per partition with O(groups×k) memory instead of the
      // window's full per-partition sort — no Sort node in the plan at all
      // (TopKPerGroupSpec pins result parity with row_number + the no-sort
      // plan property).
      graft.plans.TopKPerGroup.topKPerGroup(
          cat(s, dir).orders.select("o_custkey", "o_orderkey", "o_totalprice"),
          Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 2)
        .orderBy("o_custkey", "rk")
    }),

    "q_window_time_range" -> ((s, dir) => {
      // Time-based RANGE frame: events per user in the preceding hour —
      // frame membership by timestamp value (3600s back), the rolling-rate
      // shape row-count frames can't express under irregular event spacing.
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      cat(s, dir).events
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_last_hour"))
        .orderBy("event_id")
    }),

    "q_moving_avg" -> ((s, dir) => {
      // 3-row trailing moving average per customer (classic smoothing).
      // Summed as exact DECIMAL then divided: sliding-frame double
      // accumulation differs across engines (segment-tree add/subtract vs
      // rescan) right at round()'s boundaries. Rounded to 3 decimals, which
      // for cents/n with n <= 3 is boundary-free: the quotient ×1000 is an
      // integer (n=1,2 and 3|cents) or sits at .333/.667 — never the .5
      // half-way case where HALF_UP (Spark BigDecimal) and double
      // std::round (DuckDB) diverge.
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey")).rowsBetween(-2, 0)
      cat(s, dir).orders
        .select(col("o_orderkey"), col("o_custkey"),
          round(sum(col("o_totalprice").cast("decimal(12,2)")).over(w)
            .cast("double") / count(lit(1)).over(w), 3).as("ma3"))
        .orderBy("o_orderkey")
    }),

    "q_cond_agg" -> ((s, dir) => {
      // Conditional aggregation: per-flag counts/sums under predicates in
      // one pass (the FILTER clause shape) — no self-joins, no re-scans.
      cat(s, dir).lineitem.groupBy("l_returnflag").agg(
          count_if(col("l_quantity") > 45).as("n_bulk"),
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))
            .otherwise(lit(0.0))), 2).as("discounted_rev"),
          round(avg(when(col("l_linestatus") === "F", col("l_quantity"))), 2)
            .as("avg_qty_f"))
        .orderBy("l_returnflag")
    }),

    "q_nullsafe_join" -> ((s, dir) => {
      // Null-safe equality join (<=>) SEMANTICS without a NULL-keyed join
      // task. A literal `ka <=> kb` self-join hashes every NULL key into ONE
      // bucket and its output is quadratic in the null count — n_nulls²
      // pairs in a single task, a straggler by construction at scale that
      // AQE skew-splitting cannot split (one join key = one bucket). The
      // null-group cardinality is analytic, so: count the NULLs in one
      // aggregate and emit n_nulls² directly; only non-NULL keys enter the
      // plain `=` equality join (where NULLs drop out by definition).
      val c = cat(s, dir)
      val key = when(col("c_custkey") % 100 === 0, lit(null))
        .otherwise(col("c_custkey"))
      val a = c.customer.select(key.as("ka"))
      val b = c.customer.select(key.as("kb"))
      val nonNull = a.where(col("ka").isNotNull)
        .join(b.where(col("kb").isNotNull), col("ka") === col("kb"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(lit(0).as("is_null_key"), col("n_pairs"))
      val nulls = a.where(col("ka").isNull)
        .agg(count(lit(1)).as("n_nulls"))
        .select(lit(1).as("is_null_key"),
          (col("n_nulls") * col("n_nulls")).as("n_pairs"))
      // Degenerate-input parity: the oracle's GROUP BY emits no row for an
      // empty group, while a global agg always emits one — drop zero groups.
      nonNull.unionAll(nulls).where(col("n_pairs") > 0).orderBy("is_null_key")
    }),

    "q_higher_order" -> ((s, dir) => {
      // Array higher-order functions: transform / filter / aggregate over
      // token arrays — the declarative array surface (codegen'd lambdas,
      // no UDFs).
      val toks = split(col("text"), "\\s+")
      cat(s, dir).documents.select(
          col("doc_id"),
          size(filter(toks, t => length(t) > 4)).as("n_long"),
          aggregate(transform(toks, t => length(t)), lit(0),
            (acc, x) => acc + x).as("char_sum"),
          array_join(slice(transform(toks, t => upper(t)), 1, 3), " ").as("up3"))
        .orderBy("doc_id")
    }),

    "q_cross_join" -> ((s, dir) => {
      // Explicit Cartesian product over two tiny dims — the only shape where
      // a cross join is legitimate; anything larger must carry a key.
      val c = cat(s, dir)
      c.region.select(col("r_name")).crossJoin(c.nation.select(col("n_name")))
        .orderBy("r_name", "n_name")
    }),

    "q_decimal_agg" -> ((s, dir) => {
      // Exact money semantics: DECIMAL(12,2) sums are exact and
      // associativity-independent — no floating-point drift, no rounding
      // epsilons, the type a billing pipeline must use instead of double.
      // The OUTPUT column is cast to double AFTER the exact decimal sum:
      // decimal(22,2) stringifies "x.00" while a float64 path renders "x.0",
      // so an emitted decimal column hash-mismatches a numerically equal
      // oracle. Summation stays exact; only the final rendering is unified.
      cat(s, dir).orders
        .select(col("o_totalprice").cast("decimal(12,2)").as("p"),
          col("o_orderstatus"))
        .groupBy("o_orderstatus")
        .agg(round(sum("p").cast("double"), 2).as("exact_total"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    "q_sample_stratified" -> ((s, dir) => {
      // Stratified sampling with per-stratum rates, hash-deterministic (no
      // rand(): reproducible across retries/engines, pushes down as a plain
      // filter): 50% of F-status orders (md5 hex prefix 0-7), 6.25% of O
      // (prefix 0), none of P.
      val h = substring(md5(col("o_orderkey").cast("string")), 1, 1)
      cat(s, dir).orders
        .filter((col("o_orderstatus") === "F" &&
                  h.isin("0", "1", "2", "3", "4", "5", "6", "7")) ||
                (col("o_orderstatus") === "O" && h === "0"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("o_orderstatus")
    }),

    // ------------------------------------------- relational surface, round 2
    "q_intersect" -> ((s, dir) => {
      val c = cat(s, dir)
      c.part.select(col("p_partkey").as("k"))
        .intersect(c.lineitem.select(col("l_partkey").as("k")))
        .orderBy("k")
    }),

    "q_union_by_name" -> ((s, dir) => {
      // unionByName with allowMissingColumns: schema-evolution union, the
      // shape heterogeneous ingest feeds produce (missing columns → null).
      val c = cat(s, dir)
      val a = c.customer.select(col("c_custkey").as("k"),
        col("c_acctbal").as("bal"), lit("customer").as("src"))
      val b = c.supplier.select(col("s_suppkey").as("k"), lit("supplier").as("src"))
      a.unionByName(b, allowMissingColumns = true).orderBy("k", "src")
    }),

    "q_string_funcs" -> ((s, dir) => {
      cat(s, dir).customer.select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("low"),
          substring(col("c_name"), 1, 8).as("pre"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("cat"),
          length(col("c_name")).as("len"),
          regexp_extract(col("c_name"), "#(\\d+)", 1).as("digits"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"))
        .orderBy("c_custkey")
    }),

    "q_date_funcs" -> ((s, dir) => {
      cat(s, dir).orders.select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("mstart"),
          datediff(lit("1998-12-01").cast("date"),
            col("o_orderdate").cast("date")).as("dd"))
        .orderBy("o_orderkey")
    }),

    "q_null_handling" -> ((s, dir) => {
      val c = cat(s, dir)
      c.customer.join(c.supplier, col("c_nationkey") === col("s_nationkey"), "left")
        .select(col("c_custkey"), col("s_suppkey"),
          coalesce(col("s_name"), lit("none")).as("s_nm"),
          when(col("s_suppkey").isNull, 0).otherwise(1).as("has_supp"),
          expr("nullif(c_mktsegment, 'BUILDING')").as("seg"))
        .orderBy(col("c_custkey"), col("s_suppkey").asc_nulls_first)
    }),

    "q_sample_hash" -> ((s, dir) => {
      // Deterministic sampling: hash-prefix predicate instead of rand() —
      // reproducible across retries/engines, pushes down as a plain filter.
      cat(s, dir).orders
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "q_bloom_join" -> ((s, dir) => {
      // Pre-shuffle row pruning: bloom filter built over a selective dim's
      // keys, applied to the fact side BEFORE the join exchange — the manual
      // form of Spark's runtime filter, provably result-identical to the
      // plain join (no false negatives; Ops.bloomPrunedJoin).
      val c = cat(s, dir)
      val dim = c.orders.filter(col("o_totalprice") > 450000)
        .select("o_orderkey", "o_totalprice")
      Ops.bloomPrunedJoin(
          c.lineitem.select("l_orderkey", "l_linenumber", "l_quantity"),
          dim, "l_orderkey", "o_orderkey")
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("o_orderkey")
    }),

    "q_zorder_scan" -> ((s, dir) => {
      // Layout-aware scan: orders rewritten in Morton (Z-order) on
      // (o_custkey, o_totalprice), range-partitioned into multiple files —
      // range predicates on EITHER dimension then skip whole files via
      // parquet min/max stats (SinksSpec pins the 2-D locality + skipping;
      // the reference's MergeTree ORDER BY sort key serves the same role).
      val c = cat(s, dir)
      val out = scratch(s, "zorder_scan")
      val z = c.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("__z", graft.functions.ArrayKernels.zorder(
          col("o_custkey"), col("o_totalprice").cast("bigint")))
      Sinks.writeSorted(z, out, Seq("__z"), numFiles = Some(8))
      s.read.parquet(out)
        .filter(col("o_custkey") < 200 && col("o_totalprice") > 100000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "q_range_join" -> ((s, dir) => {
      // Interval join: line items shipped within 30 days of their order's
      // date. The key equality makes this a hash join with a range residual
      // predicate — never a BNLJ cross product.
      val c = cat(s, dir)
      c.lineitem.join(c.orders,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_fast"))
        .orderBy("o_orderkey")
    }),

    "q_geo_join" -> ((s, dir) => {
      // Grid-bucketed spatial self-join: all point pairs within 25 km.
      // Locations derive deterministically from customer keys via
      // md5-fraction (the portable-hash idiom) into a UK-ish bbox
      // (50–58°N, 6°W–2°E — a nod to the reference's UK-property preset,
      // reference/server/server.js preset schema). The scale shape is the
      // point: each point lands in a grid cell sized ≥ the radius in both
      // dimensions (0.25° lat = 27.8 km; 0.5° lon = 29.4 km at 58°N), one
      // side explodes its 3×3 cell neighborhood, and the join exchange is
      // CELL-LOCAL equality — never the all-pairs cross join the oracle
      // runs; exact haversine is a residual filter. Each qualifying pair
      // matches in exactly one (dx,dy), so no post-dedup. Point panel
      // pinned at custkey ≤ 6000 from sf0.04 up (the q_knn_join probe
      // discipline — pair count is density², not a scan metric).
      def coord(tag: String, lo: Double) =
        lit(lo) + conv(substring(md5(
            concat(lit(tag), col("c_custkey").cast("string"))), 1, 6),
          16, 10).cast("bigint").cast("double") / lit(16777216.0) * lit(8.0)
      val pts = cat(s, dir).customer
        .filter(col("c_custkey") % 4 === 0 && col("c_custkey") <= 6000)
        .select(col("c_custkey").as("id"),
          coord("lat_", 50.0).as("lat"), coord("lon_", -6.0).as("lon"))
        .withColumn("cy", floor(col("lat") / 0.25))
        .withColumn("cx", floor(col("lon") / 0.5))
      val a = pts.select(col("id").as("id_a"), col("lat").as("lat_a"),
          col("lon").as("lon_a"), col("cy"), col("cx"))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("id_a"), col("lat_a"), col("lon_a"),
          (col("cy") + col("dy")).as("cy"), (col("cx") + col("dx")).as("cx"))
      val b = pts.select(col("id").as("id_b"), col("lat").as("lat_b"),
        col("lon").as("lon_b"), col("cy"), col("cx"))
      // sin²+cos·cos·sin² written as explicit products (not pow), the
      // exact term order the oracle SQL uses.
      val sLat = sin(radians((col("lat_b") - col("lat_a")) / 2))
      val sLon = sin(radians((col("lon_b") - col("lon_a")) / 2))
      val hav = sLat * sLat +
        cos(radians(col("lat_a"))) * cos(radians(col("lat_b"))) * sLon * sLon
      val dist = lit(2 * 6371.0) * asin(sqrt(hav))
      a.join(b, Seq("cy", "cx")).filter(col("id_a") < col("id_b"))
        .withColumn("dist_km", dist)
        .filter(col("dist_km") <= 25.0)
        .select(col("id_a"), col("id_b"), round(col("dist_km"), 3).as("dist_km"))
        .orderBy("id_a", "id_b")
    }),

    "q_interval_join" -> ((s, dir) => {
      // Interval-overlap join with NO equality key — the join family's
      // last classic beside equality / range-residual / asof / 2-D grid:
      // 24 deterministic 45-day "promo windows" (one per quarter,
      // 1992–1997) against every order's 14-day fulfillment window. The
      // scale shape mirrors q_geo_join one dimension down: both sides
      // explode the MONTHS their interval covers (≤3 rows each), the join
      // is month-key EQUALITY with the exact overlap residual, and
      // countDistinct collapses pairs matched in two shared months — so
      // the fact side never enters a nested-loop, no matter how many
      // windows. The oracle is deliberately the naive cross-with-residual
      // form, proving the month bucketing loses no pair.
      val promos = s.range(24)
        .select(col("id").cast("int").as("promo_id"),
          add_months(lit("1992-01-01").cast("date"),
            col("id").cast("int") * 3).as("p_start"))
        .withColumn("p_end", date_add(col("p_start"), 45)) // exclusive
      val orders = cat(s, dir).orders
        .select(col("o_orderkey"), col("o_orderdate").as("o_start"))
        .withColumn("o_end", date_add(col("o_start"), 14)) // exclusive
      def ym(c: org.apache.spark.sql.Column) = year(c) * 12 + month(c)
      val pm = promos.withColumn("ym",
        explode(sequence(ym(col("p_start")), ym(date_sub(col("p_end"), 1)))))
      val om = orders.withColumn("ym",
        explode(sequence(ym(col("o_start")), ym(date_sub(col("o_end"), 1)))))
      om.join(broadcast(pm), Seq("ym"))
        .filter(col("o_start") < col("p_end") && col("p_start") < col("o_end"))
        .groupBy("promo_id", "p_start")
        .agg(countDistinct("o_orderkey").as("n_orders"))
        .orderBy("promo_id")
    }),

    "q_exists_subquery" -> ((s, dir) => {
      // Correlated EXISTS, decorrelated DataFrame-natively: a left-semi join
      // on the correlation key is exactly what Catalyst's
      // RewritePredicateSubquery produces for EXISTS — expressed directly,
      // with no session-global temp-view mutation.
      val c = cat(s, dir)
      c.customer.join(c.orders.filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    "q_scalar_subquery" -> ((s, dir) => {
      // Scalar subquery as a broadcast of the 1-row aggregate — the same
      // physical shape Catalyst plans for an uncorrelated scalar subquery
      // (compute once, ship to every task), without temp views.
      val o = cat(s, dir).orders
      val thresh = o.agg((avg("o_totalprice") * 1.8).as("__thresh"))
      o.crossJoin(broadcast(thresh))
        .filter(col("o_totalprice") > col("__thresh"))
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    "q_window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      cat(s, dir).orders.select(
          col("o_orderkey"), col("o_custkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_orderkey", 1).over(w).as("next_key"),
          round(col("o_totalprice") -
            coalesce(lag("o_totalprice", 1).over(w), col("o_totalprice")), 2).as("delta"))
        .orderBy("o_orderkey")
    }),

    "q_window_stats" -> ((s, dir) => {
      // Partitioned by customer — partition count scales with the data, so a
      // 100× corpus spreads over 100× window tasks (o_orderstatus's 3 values
      // would funnel everything through ≤3 tasks).
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      cat(s, dir).orders.select(
          col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_orderkey"), 3).over(w).as("third_key"))
        .orderBy("o_orderkey")
    }),

    "q_variant" -> ((s, dir) => {
      // VariantType path: parse once into the binary-encoded variant, then
      // typed field access — the modern semi-structured layout (shredded
      // storage at scale), vs q_json_extract's per-call string re-parse.
      cat(s, dir).events
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .orderBy("event_id")
    }),

    "q_ntile" -> ((s, dir) => {
      // Exact global quartiles with NO single-partition window: range
      // exchange + per-partition numbering + the ntile formula
      // (Ops.ntileExact). Bit-identical to ntile(4) OVER (ORDER BY …), but
      // every stage stays distributed at 100×.
      Ops.ntileExact(cat(s, dir).orders.select("o_orderkey", "o_totalprice"),
          4, Seq(col("o_totalprice"), col("o_orderkey")), "quartile")
        .select("o_orderkey", "quartile")
        .orderBy("o_orderkey")
    }),

    "q_histogram" -> ((s, dir) => {
      cat(s, dir).orders
        .select(floor(col("o_totalprice") / 50000).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
        .orderBy("bin")
    }),

    "q_mode_group" -> ((s, dir) => {
      // Deterministic per-group mode (argmax with count-desc, value-asc
      // tie-break) — mode()'s tie behavior is engine-defined, this isn't.
      val cnts = cat(s, dir).part
        .groupBy("p_type", "p_brand").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("p_type").orderBy(col("cnt").desc, col("p_brand"))
      cnts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("p_type", "p_brand", "cnt")
        .orderBy("p_type")
    }),

    "q_salted_join" -> ((s, dir) => {
      // Skew-salted join, result provably identical to the plain join: the
      // manual fallback for hot keys AQE can't split (Ops.saltedJoin).
      val c = cat(s, dir)
      Ops.saltedJoin(c.lineitem, c.supplier, "l_suppkey", "s_suppkey", salts = 8)
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
        .orderBy("s_suppkey")
    }),

    "q_array_funcs" -> ((s, dir) => {
      val toks = split(col("text"), "\\s+")
      cat(s, dir).documents.select(
          col("doc_id"),
          size(array_distinct(toks)).as("n_uniq"),
          array_join(slice(array_sort(array_distinct(toks)), 1, 5), " ").as("first5"),
          array_contains(toks, "the").cast("int").as("has_the"))
        .orderBy("doc_id")
    }),

    "q_merge_upsert" -> ((s, dir) => {
      // MERGE/upsert without a transactional format: hash-sampled updates
      // (price doubled) replace their target rows; summary proves the merge.
      val base = cat(s, dir).orders.select("o_orderkey", "o_totalprice")
      val updates = base
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      Ops.mergeUpsert(base, updates, Seq("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
    }),

    // ----------------------------------------------- round-4 widening
    "q_argmax" -> ((s, dir) => {
      // Deterministic argmax/argmin per group via lexicographic struct
      // min/max: one partial-aggregable pass, ties broken by the unique key
      // INSIDE the comparator (max_by/arg_max leave ties unspecified in both
      // engines — a hash-compare killer).
      val pk = struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))
      cat(s, dir).orders.groupBy("o_orderstatus")
        .agg(max(pk).as("mx"), min(pk).as("mn"))
        .select(col("o_orderstatus"),
          round(col("mx.p"), 2).as("max_price"), col("mx.k").as("max_key"),
          round(col("mn.p"), 2).as("min_price"), col("mn.k").as("min_key"))
        .orderBy("o_orderstatus")
    }),

    "q_bit_agg" -> ((s, dir) =>
      // Bitwise aggregates (order-independent, partial-aggregable): the
      // flag-mask rollup shape (feature bitsets, permission masks).
      cat(s, dir).lineitem.groupBy("l_returnflag")
        .agg(expr("bit_and(l_linenumber)").as("b_and"),
          expr("bit_or(l_linenumber)").as("b_or"),
          expr("bit_xor(l_linenumber)").as("b_xor"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    "q_gaps_islands" -> ((s, dir) => {
      // Gaps-and-islands: per-customer order runs where consecutive orders
      // are <= 30 days apart. lag + conditional flag + per-key sum — all
      // keyed windows (shuffle by o_custkey, never a global sort).
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      cat(s, dir).orders
        .withColumn("prev", lag("o_orderdate", 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull ||
            datediff(col("o_orderdate"), col("prev")) > 30, 1L).otherwise(0L))
        .groupBy("o_custkey")
        .agg(sum("brk").as("n_islands"), count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    }),

    "q_key_gaps" -> ((s, dir) =>
      // Key-density profile: missing ids per 1000-key bucket from min/max/
      // count alone — the scalable gap detector (a global lead() window
      // would serialize the table through one task; this is one groupBy).
      cat(s, dir).orders
        .groupBy(floor(col("o_orderkey") / 1000).cast("bigint").as("bucket"))
        .agg((max("o_orderkey") - min("o_orderkey") + 1 - count(lit(1))).as("n_missing"),
          count(lit(1)).as("n_present"))
        .filter(col("n_missing") > 0)
        .orderBy("bucket")),

    "q_orc_roundtrip" -> ((s, dir) => {
      // K1's columnar wire format: ORC export → re-read → aggregate; the
      // oracle runs the same aggregate on the original parquet, so the
      // round-trip must be lossless (types, nulls, encodings). Multi-part
      // write/read — every task its own stripe file.
      val out = scratch(s, "orc_roundtrip")
      Sinks.exportOrc(
        cat(s, dir).lineitem.select("l_orderkey", "l_returnflag", "l_quantity"), out)
      s.read.orc(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("l_quantity").cast("double")), 2).as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    "q_json_roundtrip" -> ((s, dir) => {
      // K1's JSON wire format: JSONL export → schema-on-read re-read (no
      // inference scan) → aggregate; oracle runs against the original
      // parquet, so the round-trip must be lossless.
      val out = scratch(s, "json_roundtrip")
      Sinks.exportJsonl(
        cat(s, dir).documents.select("doc_id", "lang", "n_chars"), out)
      s.read.schema("doc_id BIGINT, lang STRING, n_chars BIGINT").json(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .orderBy("lang")
    }),

    "q_partition_prune" -> ((s, dir) => {
      // Static partition pruning: events written partitionBy(event_date),
      // then a one-day read — the scan touches ONE date directory
      // (PartitionFilters, pinned in PlanQualitySpec), the 100 TB shape for
      // any time-ranged fact query. The write repartitions BY the partition
      // column first: without it every input task holding k dates opens k
      // writers and emits k files (tasks x dates small files at scale);
      // with it each date's rows land in one task → one file per directory,
      // written in parallel across dates.
      val out = scratch(s, "part_events")
      cat(s, dir).events.withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date"))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      s.read.parquet(out)
        .filter(col("event_date") === lit("2024-01-15"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
        .orderBy("event_type")
    }),

    "q_forward_fill" -> ((s, dir) => {
      // Forward fill (last observation carried forward) per user: error
      // events null out their reading; last(ignoreNulls) over a keyed
      // running frame imputes from the most recent good value.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cat(s, dir).events
        .withColumn("v",
          when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .select(col("event_id"),
          round(last("v", ignoreNulls = true).over(w), 2).as("filled"))
        .orderBy("event_id")
    }),

    "q_percent_rank" -> ((s, dir) => {
      // Relative-standing analytics: percent_rank + cume_dist of each order
      // within its CUSTOMER — keyed on the high-cardinality column, so the
      // hash exchange spreads evenly (a 3-value status key would funnel the
      // table into 3 window tasks at scale).
      val w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
      cat(s, dir).orders.select(col("o_orderkey"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("o_orderkey")
    }),

    "q_window_count_distinct" -> ((s, dir) =>
      // COUNT(DISTINCT) OVER: Spark has no distinct window aggregate, so the
      // portable formulation is size(collect_set() OVER) — the set is
      // bounded by the distinct-value count (5 event types), not the
      // partition size, so per-group state stays O(distinct).
      cat(s, dir).events.select(col("event_id"),
          size(collect_set("event_type").over(
            Window.partitionBy("user_id"))).cast("bigint").as("n_types"))
        .orderBy("event_id")),

    "q_listagg" -> ((s, dir) =>
      // Ordered string aggregation (LISTAGG / string_agg): collect_list is
      // order-nondeterministic under parallel merge, so determinism comes
      // from sorting (o_orderkey, status) structs AFTER collection — one
      // hash agg, no window, no global sort.
      cat(s, dir).orders.groupBy("o_custkey")
        .agg(array_join(transform(
            array_sort(collect_list(struct(col("o_orderkey"), col("o_orderstatus")))),
            x => x.getField("o_orderstatus")), ",").as("statuses"))
        .orderBy("o_custkey")),

    "q_try_arith" -> ((s, dir) =>
      // Fault-tolerant arithmetic/casts: try_divide and try_cast turn
      // malformed rows into NULLs instead of failing the job — at 100 TB a
      // single poisoned row must never kill a 1000-executor pass.
      cat(s, dir).orders.select(col("o_orderkey"),
          round(expr("try_divide(o_totalprice, CAST(o_custkey % 3 AS DOUBLE))"), 4).as("ratio"),
          expr("try_cast(o_orderpriority AS INT)").as("pri_raw"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("pri_num"))
        .orderBy("o_orderkey")),

    "q_rolling_median" -> ((s, dir) => {
      // Rolling median over a 4-row frame — the robust moving central
      // tendency (spike-immune, unlike q_moving_avg's mean). Spark rejects
      // percentile-family aggregates over sliding frames, so the frame is
      // materialized as lag columns and the median computed on the sorted
      // ≤4-element array — pure codegen'd expressions, no frame aggregate,
      // and for small fixed frames cheaper than any generic formulation.
      // Keyed per customer: high-cardinality partitions distribute; a
      // 3-value status key would not.
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
      cat(s, dir).orders
        .withColumn("fr", array_sort(filter(array(col("o_totalprice"),
          lag("o_totalprice", 1).over(w), lag("o_totalprice", 2).over(w),
          lag("o_totalprice", 3).over(w)), x => x.isNotNull)))
        .select(col("o_orderkey"), round(expr(
          "CASE WHEN size(fr) % 2 = 1 THEN fr[size(fr) DIV 2] " +
          "ELSE (fr[size(fr) DIV 2 - 1] + fr[size(fr) DIV 2]) / 2 END"), 3)
          .as("roll_med"))
        .orderBy("o_orderkey")
    }),

    "q_sample_per_group" -> ((s, dir) => {
      // Fixed-size per-stratum sample (50 docs per language), deterministic:
      // rank by a salted content-free hash, not rand() — reproducible across
      // retries and engines. Runs on the custom bounded-heap TopKPerGroup
      // operator: each partition keeps ≤50 rows per language, so no
      // per-language sort and no |langs|-task window funnel.
      val d = cat(s, dir).documents.select(col("lang"), col("doc_id"),
        md5(concat(lit("smp"), col("doc_id").cast("string"))).as("hx"))
      graft.plans.TopKPerGroup.topKPerGroup(d, Seq(col("lang")),
          Seq(col("hx").asc, col("doc_id").asc), 50)
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")
    }),

    "q_map_funcs" -> ((s, dir) => {
      // MapType surface: per-doc token-count map built with
      // map_from_entries over a DETERMINISTICALLY sorted entry list (map
      // column equality is order-sensitive), thinned with map_filter, and
      // exploded back to rows for the oracle compare. The map stays inside
      // one row — no per-key shuffle beyond the initial (doc, token) count.
      val tc = cat(s, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      tc.groupBy("doc_id")
        .agg(map_from_entries(array_sort(
          collect_list(struct(col("tok"), col("n"))))).as("m"))
        .select(col("doc_id"), explode(expr("map_filter(m, (k, v) -> v >= 5)")))
        .select(col("doc_id"), col("key").as("tok"), col("value").as("n"))
        .orderBy("doc_id", "tok")
    }),

    "q_xml_roundtrip" -> ((s, dir) => {
      // K1's markup wire format (Spark 4 native XML source): export →
      // re-read with an EXPLICIT schema (XML carries no types — the same
      // schema-on-read discipline as the all-String CSV path, and never an
      // inference scan over the corpus) → aggregate. The oracle runs the
      // same aggregate on the original parquet, so the trip must be
      // lossless. Multi-part write/read: each task its own XML document.
      val out = scratch(s, "xml_roundtrip")
      Sinks.exportXml(
        cat(s, dir).orders.select("o_orderkey", "o_orderstatus", "o_totalprice"),
        out, rowTag = "order")
      s.read.format("xml").option("rowTag", "order")
        .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
        .load(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    "q_interval_merge" -> ((s, dir) => {
      // Overlapping-interval coalescing: each event spans [ts, ts+5min];
      // per user, intervals that touch merge into one — the
      // availability/coverage primitive. A new island starts where the
      // running max of previous interval ends can't reach; integer-µs
      // arithmetic so both engines compare identical values. One hash
      // exchange on user_id.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      cat(s, dir).events
        .select(col("user_id"), col("ts"), col("event_id"),
          (unix_micros(col("ts")) + 300000000L).as("end_us"))
        .withColumn("prev_max_end",
          max("end_us").over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("ni", when(col("prev_max_end").isNull ||
          unix_micros(col("ts")) > col("prev_max_end"), 1L).otherwise(0L))
        .withColumn("island",
          sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "island")
        .agg(min("ts").as("start_ts"),
          timestamp_micros(max("end_us")).as("end_ts"),
          count(lit(1)).as("n_events"))
        .select("user_id", "start_ts", "end_ts", "n_events")
        .orderBy("user_id", "start_ts")
    }),

    "q_weighted_sample" -> ((s, dir) => {
      // Weighted reservoir sampling (Efraimidis-Spirakis A-Res), fully
      // DETERMINISTIC: u comes from a 4-nibble md5 slice — reproducible
      // across retries and engines, unlike rand() — and the per-source
      // top-5 by u^(1/w) (w = doc length, longer docs favored) runs on the
      // bounded-heap TopKPerGroup. The length-biased sampling step of
      // corpus audit/inspection tooling.
      val d = cat(s, dir).documents
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("v",
          expr("conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10)").cast("double"))
        .withColumn("k", pow((col("v") + 0.5) / 65536.0, lit(1.0) / col("n_chars")))
      graft.plans.TopKPerGroup.topKPerGroup(d, Seq(col("source")),
          Seq(col("k").desc, col("doc_id")), 5)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .orderBy("source", "doc_id")
    }),

    "q_csv_malformed" -> ((s, dir) => {
      // Poisoned-ingest robustness: a CSV staged with deterministic corrupt
      // cells (every 10th key) re-read under PERMISSIVE mode — bad cells
      // become NULLs instead of failing the job, and the query quantifies
      // the damage. At 100 TB a single malformed row must never kill a
      // 1000-executor pass; the corruption rule is known, so the oracle
      // derives the exact expected counts from the clean table.
      val out = scratch(s, "csv_malformed")
      cat(s, dir).orders.select(col("o_orderkey").as("k"),
          when(col("o_orderkey") % 10 === 0, lit("oops"))
            .otherwise(col("o_totalprice").cast("string")).as("p"))
        .write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema("k BIGINT, p DOUBLE")
        .option("header", "true").option("mode", "PERMISSIVE").csv(out)
        .agg(count(lit(1)).as("n"),
          sum(when(col("p").isNull, 1L).otherwise(0L)).as("n_bad"),
          round(sum("p"), 2).as("total"))
    }),

    "q_schema_evolution" -> ((s, dir) => {
      // Schema-on-read evolution: two parquet generations (v1 carries a
      // price, v2 a status) scanned together with mergeSchema — absent
      // columns surface as NULLs, the contract that lets a 100 TB lake add
      // columns without rewriting history. Counts per column quantify the
      // generation split.
      val out = scratch(s, "schema_evo")
      val o = cat(s, dir).orders
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
        .write.mode("overwrite").parquet(s"$out/v1")
      o.filter(col("o_orderkey") % 2 =!= 0)
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"))
        .write.mode("overwrite").parquet(s"$out/v2")
      s.read.option("mergeSchema", "true").parquet(s"$out/v1", s"$out/v2")
        .agg(count(lit(1)).as("n"), count(col("p")).as("n_p"),
          count(col("st")).as("n_st"), round(sum("p"), 2).as("total_p"))
    }),

    "q_window_first_last" -> ((s, dir) => {
      // first_value / last_value / nth_value over the full partition frame —
      // the anchoring analytics (entry price, latest price, second order)
      // the rank/lag family doesn't cover. Keyed per customer: the exchange
      // spreads across the high-cardinality key.
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      cat(s, dir).orders.select(col("o_orderkey"),
          first("o_totalprice").over(w).as("fv"),
          last("o_totalprice").over(w).as("lv"),
          nth_value(col("o_totalprice"), 2).over(w).as("nv2"))
        .orderBy("o_orderkey")
    }),

  )
}
