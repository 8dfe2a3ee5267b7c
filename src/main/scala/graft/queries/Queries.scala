package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables

/** The declared oracle query set (SURVEY §2.9, Q01–Q20): every reference
  * operator shape re-expressed as an idiomatic Spark DataFrame plan, plus the
  * exact ANSI SQL the driver runs through DuckDB on the same parquet tables.
  *
  * Contract notes (SURVEY §5.4):
  *  - every computed column is aliased identically in the DataFrame plan and
  *    the oracle SQL (the driver's compare sorts columns by name);
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - float aggregates are ROUNDed in-query on both sides;
  *  - DuckDB returns BIGINT where Spark builtins return INT (length(), year())
  *    — those are cast to long on the Spark side so schemas line up.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** Q01 — scan + filter + project (P2/P3); predicate and both projected
    * columns must push into the parquet scan. Reference shape:
    * row predicates of `/root/reference/sql/saved-queries.sql:15-17`. */
  val q01_scan_filter: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem;
      // l_quantity joins the sort so row order is total (caught at 10×
      // scale where the tie order finally diverged between engines)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** Q02 — the core ETL hour aggregation (A1+A2): date_trunc to hour, min id,
    * mean measure, `_min`/`_mean` suffix contract of
    * `/root/reference/etl/oedi_etl/transform.py:53-120`. */
  val q02_hourly_agg: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).as("timestamp"))
      .agg(
        min(col("event_id")).as("event_id_min"),
        // +1e-9 (q44's guard): averages of 2-decimal data are exact
        // rationals that can land ON a .xxxx5 boundary, where the two
        // engines' summation orders decide the rounded digit (one row
        // did exactly that at the 30× set)
        round(avg(col("value")) + 1e-9, 4).as("value_mean"))
      .orderBy(col("timestamp"))

  /** Q03 — join + COUNT(DISTINCT) (J1+A3), saved-query-1 analog
    * (`/root/reference/sql/saved-queries.sql:10-17`). customer is the small
    * side at any scale ratio lineitem:customer, but here orders is the fact:
    * broadcast the filtered dim. */
  val q03_join_countdistinct: Q = (s, d) => {
    val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, d, "orders")
    broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
      .agg(countDistinct(c("c_custkey")).as("total_customers"))
  }

  /** Q04 — group + distinct count over a join (A4), saved-query-2 analog
    * (`/root/reference/sql/saved-queries.sql:19-26`). */
  val q04_group_distinct: Q = (s, d) => {
    val c = t(s, d, "customer")
    val o = t(s, d, "orders")
    // distinct-elimination: c_custkey is unique in customer, so
    // COUNT(DISTINCT c_custkey) over the join ≡ counting the DISTINCT
    // order custkeys that exist in customer. Deduplicating orders FIRST
    // (map-side partial distinct collapses the fact side before any
    // join) and then broadcast-joining the dim replaces the expand +
    // two-phase distinct aggregation over the multiplied join output;
    // the joined relation shrinks from |orders| to |distinct custkeys|.
    // SHUFFLE_HASH, not broadcast: the distinct side is already hash-
    // partitioned by o_custkey, so co-partitioning customer is one cheap
    // exchange of the dim — vs collecting the whole 1.5 M-row customer
    // table to the driver and rebroadcasting it (measured sf10: 2.66 s
    // broadcast → 0.85 s SHJ; the dim build was the whole difference)
    o.select(col("o_custkey")).distinct()
      .join(c.hint("shuffle_hash"), col("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("num_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q05 — CTE + ROW_NUMBER + per-group top-k (W1+W2+W3), saved-query-3
    * analog (`/root/reference/sql/saved-queries.sql:28-45`). The rn<=k filter
    * is rewritten by Catalyst to WindowGroupLimit (top-k pushdown) — no full
    * per-group sort materialization at scale. */
  val q05_window_topk: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
    t(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  /** Q06 — multi-aggregate hash agg (A2 wide form, TPC-H Q1 shape). */
  val q06_multi_agg: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q07 — chained dimension joins (J1): nation and region are tiny ⇒
    * explicit broadcast hash joins, zero shuffle of the fact side beyond the
    * final group-by. */
  val q07_dim_joins: Q = (s, d) => {
    val c = t(s, d, "customer")
    val n = t(s, d, "nation")
    val r = t(s, d, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("num_customers"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Q08 — anti-join: the discrepancy-ledger "listed but not uploaded"
    * set-diff (M3, `/root/reference/etl/oedi_etl/monitor.py:87-106`). */
  val q08_anti_join: Q = (s, d) => {
    val p = t(s, d, "part")
    val l = t(s, d, "lineitem").filter(col("l_quantity") > 49)
    p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
      .select(col("p_partkey"))
      .orderBy(col("p_partkey"))
  }

  /** Q09 — semi-join (EXISTS). A plain `left_semi` against the filtered
    * fact shuffles every surviving lineitem row by `l_partkey` just to
    * test membership; the probe side only needs the DISTINCT key set.
    * Pre-aggregating collapses the shuffle to ~|distinct keys| (map-side
    * partial distinct does most of the work before any wire traffic) and
    * the resulting key relation is small enough to broadcast, so `part`
    * never shuffles at all. At sf10 this took the query from 3.97 s
    * (7.4× DuckDB) to a broadcast probe. Semantics are identical:
    * semi-join(x, y) ≡ semi-join(x, DISTINCT π_key(y)). */
  val q09_semi_join: Q = (s, d) => {
    val p = t(s, d, "part")
    val keys = t(s, d, "lineitem")
      .filter(col("l_quantity") > 49)
      .select(col("l_partkey"))
      .distinct()
    p.join(broadcast(keys), p("p_partkey") === keys("l_partkey"), "left_semi")
      .select(col("p_partkey"))
      .orderBy(col("p_partkey"))
  }

  /** Q10 — EXCEPT-distinct (the ledger shape as a set op). Both branches
    * read the SAME relation, so the set op is computed as one scan +
    * one partial-aggregated shuffle of (key, 2 bits): group by the key
    * with membership flags and keep `inF && !inO`. Spark's literal
    * `.except` plans aggregate-then-LeftAnti — two scans and two
    * row-sized shuffles of the same table (measured 1.10 s vs 0.43 s at
    * the 100× set); the flag-aggregation is the scale form whenever the
    * branches share a source, and is exactly distinct-set-difference by
    * construction (one group per key incl. NULL, SQL set-op NULL
    * equality). Distinct-source EXCEPT still uses `.except` — see
    * q58_except_all for the multiset face. */
  val q10_except: Q = (s, d) => {
    val o = t(s, d, "orders")
    o.filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderstatus") === "F").as("__f"),
        max(col("o_orderstatus") === "O").as("__o"))
      .filter(col("__f") && !col("__o"))
      .select(col("o_custkey"))
      .orderBy(col("o_custkey"))
  }

  /** Q11 — INTERSECT-distinct: same single-scan flag aggregation as q10
    * (`inF && inO`), replacing the planner's aggregate+LeftSemi double
    * scan of the shared source (1.40 s → one shuffle at the 100× set). */
  val q11_intersect: Q = (s, d) => {
    val o = t(s, d, "orders")
    o.filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderstatus") === "F").as("__f"),
        max(col("o_orderstatus") === "O").as("__o"))
      .filter(col("__f") && col("__o"))
      .select(col("o_custkey"))
      .orderBy(col("o_custkey"))
  }

  /** Q12 — global sort + LIMIT: Spark plans TakeOrderedAndProject (per-
    * partition top-k + merge on driver), no full sort at scale. */
  val q12_topk_global: Q = (s, d) =>
    t(s, d, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("total"))

  /** Q13 — UNION + dedup. */
  val q13_union: Q = (s, d) => {
    val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("x"))
    val c = t(s, d, "customer").filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("x"))
    o.union(c).distinct().orderBy(col("x"))
  }

  /** Q14 — equi-join with extra non-equi conjunct (theta residual). */
  val q14_theta_join: Q = (s, d) => {
    val l = t(s, d, "lineitem")
    val o = t(s, d, "orders")
    // explicit broadcast, gated on the optimizer's size estimate: orders is
    // the dim side of this theta join and stays broadcastable at bench
    // scales (18 MB at 10x) but grows linearly with SF, so an unconditional
    // hint would OOM the broadcast at large scale instead of degrading.
    // The gate reads logical-plan stats (file bytes x pruning ratio — no
    // job runs) and only hints below a memory-safe cap. Removes the
    // fact-side shuffle: measured 2.5 s -> 2.0 s at 10x.
    // Above the gate, hint SHUFFLE_HASH instead of letting the planner
    // default to sort-merge: SMJ would sort BOTH inputs by orderkey only
    // to throw that order away at the final (l_orderkey, l_linenumber)
    // range sort, so the query paid three large sorts. A shuffled hash
    // join builds per-partition maps on orders — the PK side, so no build
    // skew — leaving the output range sort as the only sort in the plan
    // (measured at 100x: 35.3 s SMJ -> 5.3 s SHJ; DuckDB 13.7 s).
    // The build is bounded by orders/numPartitions, and numPartitions must
    // therefore SCALE WITH SF: at the 1000x set the session's 32 shuffle
    // partitions put ~4.7M orders rows in one hash relation and the build
    // FAILED outright ("Can't acquire 268435456 bytes", round-13 spot
    // run). Both sides are repartitioned to ~32 MB of estimated build
    // bytes per partition (floor: the session default), so the hint stays
    // a hint and never turns into a scale ceiling.
    val oBytes = o.queryExecution.optimizedPlan.stats.sizeInBytes
    if (oBytes < (64L << 20)) {
      l.join(broadcast(o), l("l_orderkey") === o("o_orderkey")
          && l("l_shipdate") > o("o_orderdate"))
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    } else {
      val shuf = s.conf.get("spark.sql.shuffle.partitions").toInt
      // clamp BEFORE BigInt→Int: a conservative optimizer estimate (join
      // defaults near Long.MaxValue) would otherwise truncate to garbage
      // low bits — possibly a huge or negative partition count
      val p = math.max(shuf,
        ((oBytes / (32L << 20)) min BigInt(10000)).toInt + 1)
      val lp = l.repartition(p, col("l_orderkey"))
      val op = o.repartition(p, col("o_orderkey")).hint("SHUFFLE_HASH")
      lp.join(op, lp("l_orderkey") === op("o_orderkey")
          && lp("l_shipdate") > op("o_orderdate"))
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }
  }

  /** Q15 — analytic window LAG over a per-user event sequence. */
  val q15_lag_window: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .select(
        col("user_id"), col("event_id"),
        round(col("value") - lag(col("value"), 1).over(w), 4).as("dv"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Q16 — CASE label expression: the upgrade-label function of
    * `/root/reference/etl/oedi_etl/fetch.py:19-37` (F1) on neutral data. */
  val q16_case_label: Q = (s, d) =>
    t(s, d, "lineitem")
      .select(
        when(col("l_linenumber") === 0, lit("baseline"))
          .when(col("l_linenumber") < 10,
            concat(lit("upgrade0"), col("l_linenumber").cast("string")))
          .otherwise(concat(lit("upgrade"), col("l_linenumber").cast("string")))
          .as("upgrade_label"))
      .distinct()
      .orderBy(col("upgrade_label"))

  /** Q17 — ROLLUP grouping sets; NULLS FIRST to match DuckDB's explicit
    * ordering (Spark ASC defaults nulls-first, DuckDB defaults nulls-last —
    * made explicit on both sides). */
  val q17_rollup: Q = (s, d) =>
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first)

  /** Q18 — date part extraction + monthly count (tumbling-window parity on
    * bounded data). year()/month() return INT in Spark, BIGINT in DuckDB —
    * cast long. */
  val q18_date_parts: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("y"), col("m"))

  /** Q19 — exact dedup + text stats over documents (X1/X4). The distinct
    * count runs over xxhash64(text), not the text: the two-phase distinct
    * otherwise shuffles and re-hashes full document bodies where 8 bytes
    * carry the same information (the X1 content-dedup rule). Collision
    * odds are n²/2⁶⁵ — ~10⁻¹⁰ at 100 M distinct docs — the standard trade
    * content-dedup already makes. Measured 0.90 → 0.53 s at the 100× set
    * (KernelProbe, r15); DuckDB's oracle counts the raw text and values
    * agree absent a collision. The `when(isNotNull, …)` guard preserves
    * SQL NULL semantics: Spark's xxhash64(NULL) returns the SEED (a
    * non-null constant), so without it a NULL text would count as one
    * extra distinct value per group while COUNT(DISTINCT text) ignores
    * NULLs (r15 ADVICE). */
  val q19_doc_stats: Q = (s, d) =>
    t(s, d, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        countDistinct(when(col("text").isNotNull, xxhash64(col("text"))))
          .as("distinct_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("lang"))

  /** Q20 — string scalar functions. length() is INT in Spark, BIGINT in
    * DuckDB — cast long. */
  val q20_string_fns: Q = (s, d) =>
    t(s, d, "customer")
      .filter(col("c_custkey") <= 20)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("pre"),
        length(col("c_name")).cast("long").as("len"))
      .orderBy(col("c_custkey"))

  /** Q21 — the ETL hourly-aggregation operator itself (A1+A2 via
    * [[graft.etl.HourlyAggregate]], table-level byId mode) driven as a query,
    * so the driver's oracle checks the production transform, not a re-typed
    * copy. Rounding applied on top for float determinism (§5.4). */
  val q21_etl_hourly_by_user: Q = (s, d) => {
    val out = graft.etl.HourlyAggregate(
      t(s, d, "events"),
      timeCol = "ts", idCol = "user_id",
      measureCols = Seq("value"), byId = true)
    out.select(
        col("ts"), col("user_id_min"), col("ts_min"),
        // same .xxxx5-boundary guard as q02 (identical avg mechanism)
        round(col("value_mean") + 1e-9, 4).as("value_mean"))
      .orderBy(col("user_id_min"), col("ts"))
  }

  /** Q22 — CUBE grouping sets (superset of the reference's rollup shape). */
  val q22_cube: Q = (s, d) =>
    t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Q23 — window frames: running sum over an explicit ROWS frame + LEAD.
    * Frame order is total (ts, event_id), so the cumulative float sum is
    * evaluated in the same sequence by both engines. */
  val q23_window_frames: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, d, "events").select(
        col("user_id"), col("event_id"),
        round(sum(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4).as("running"),
        lead(col("event_id"), 1).over(w).as("next_event"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Q24 — scalar math functions (abs, sqrt, ceil, mod, power). */
  val q24_scalar_math: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_orderkey") <= 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_discount") - 0.05), 4).as("abs_disc"),
        round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
        ceil(col("l_extendedprice") / 1000).as("price_k"),
        (col("l_linenumber") % 3).cast("long").as("ln_mod"),
        round(pow(col("l_tax") + 1.0, 2), 4).as("tax_sq"))
      // total order: (l_orderkey, l_linenumber) ties broken by every
      // output column (see q01 note)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("abs_disc"),
        col("sqrt_qty"), col("price_k"), col("ln_mod"), col("tax_sq"))

  /** Q25 — date arithmetic: quarter extraction, month truncation, last_day. */
  val q25_date_arith: Q = (s, d) =>
    t(s, d, "orders")
      .filter(col("o_orderkey") <= 100)
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate").cast("date")).as("month_end"))
      .orderBy(col("o_orderkey"))

  /** Q26 — conditional aggregation: FILTER clause + CASE-gated sum. */
  val q26_conditional_agg: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(when(col("l_quantity") > 25, 1)).as("big_cnt"),
        round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))
          .otherwise(0.0)), 2).as("disc_price"))
      .orderBy(col("l_returnflag"))

  /** Q27 — as-of join (graft.operators.AsOfJoin): each event picks the
    * user's latest signup event at-or-before its timestamp. Oracle-checked
    * against DuckDB's native ASOF LEFT JOIN. */
  val q27_asof_join: Q = (s, d) => {
    val ev = t(s, d, "events")
    // right side deduped to one row per (user_id, rts) — ties at the same
    // instant break on max(event_id). Without this the as-of match among
    // same-timestamp signups is tie-dependent in BOTH engines (surfaces
    // only at 10x where replicated users collide on identical timestamps).
    val right = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts").as("rts"))
      .agg(max(col("event_id")).as("signup_event"))
    graft.operators.AsOfJoin(
        ev.select(col("user_id"), col("ts"), col("event_id")),
        right, Seq("user_id"), "ts", "rts")
      .select(col("event_id"), col("signup_event"))
      .orderBy(col("event_id"))
  }

  /** Q28 — range join (graft.operators.RangeJoin): orders binned into price
    * bands; the binned equi-join must equal the theta-join the oracle runs. */
  val q28_range_join: Q = (s, d) => {
    import s.implicits._
    val bands = Seq(
      (0.0, 50000.0, "low"), (50000.0, 150000.0, "mid"),
      (150000.0, 1000000.0, "high")).toDF("lo", "hi", "band")
    graft.operators.RangeJoin.binned(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice", bands, "lo", "hi", binWidth = 50000.0)
      .select(col("o_orderkey"), col("band"))
      .orderBy(col("o_orderkey"), col("band"))
  }

  /** Q29 — pivot: one column per l_linestatus value. The value list is
    * declared (not discovered), so the plan is a single pass — no extra
    * distinct-scan job, the shape that matters when the fact table is
    * 100 TB. */
  val q29_pivot: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy(col("l_returnflag"))

  /** Q30 — statistical aggregates: sample stddev/variance + exact median
    * (interpolated percentile, matching DuckDB's MEDIAN on numerics). */
  val q30_stats_agg: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(median(col("l_quantity")), 2).as("med_qty"))
      .orderBy(col("l_returnflag"))

  /** Q31 — full outer join of two pre-aggregated sides with key coalesce. */
  val q31_full_outer: Q = (s, d) => {
    val f = t(s, d, "orders").filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("cnt_f"))
    val c = t(s, d, "customer").filter(col("c_acctbal") < -500)
      .select(col("c_custkey").as("k"), round(col("c_acctbal"), 2).as("bal"))
    f.join(c, f("k") === c("k"), "full_outer")
      .select(coalesce(f("k"), c("k")).as("custkey"), col("cnt_f"), col("bal"))
      .orderBy(col("custkey"))
  }

  /** Q32 — explicit GROUPING SETS with grouping() indicators (beyond the
    * rollup/cube shapes of Q17/Q22), via the Dataset groupingSets API. */
  val q32_grouping_sets: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Q33 — regex functions: capture-group extract, global replace, rlike
    * row filter. */
  val q33_regex: Q = (s, d) =>
    t(s, d, "customer")
      .filter(col("c_custkey") <= 100 && col("c_name").rlike("[0-9]$"))
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "#(\\d+)", 1).cast("long").as("cust_num"),
        regexp_replace(col("c_name"), "0+", "*").as("squeezed"))
      .orderBy(col("c_custkey"))

  /** Q34 — NULL handling scalars: NULLIF, COALESCE, null-safe equality. */
  val q34_null_fns: Q = (s, d) =>
    t(s, d, "orders")
      .filter(col("o_orderkey") <= 200)
      .select(
        col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("ns"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"),
        (col("o_orderstatus") <=> "F").as("is_f"))
      .orderBy(col("o_orderkey"))

  /** Q35 — ordered-argument aggregates max_by/min_by (DuckDB arg_max/arg_min);
    * ordering key is the unique c_custkey so both engines are deterministic. */
  val q35_arg_minmax: Q = (s, d) =>
    t(s, d, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        max_by(col("c_name"), col("c_custkey")).as("last_name"),
        min_by(col("c_name"), col("c_custkey")).as("first_name"))
      .orderBy(col("c_mktsegment"))

  /** Q36 — ordered string aggregation: collect + sort + join gives the
    * deterministic equivalent of DuckDB's string_agg(... ORDER BY ...). */
  val q36_string_agg: Q = (s, d) =>
    t(s, d, "customer")
      .filter(col("c_custkey") <= 100)
      .groupBy(col("c_nationkey"))
      .agg(array_join(array_sort(collect_list(col("c_name"))), "|").as("names"))
      .orderBy(col("c_nationkey"))

  /** Q37 — HAVING (post-aggregation predicate on the aggregate itself). */
  val q37_having: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 5)
      .orderBy(col("o_custkey"))

  /** Q38 — unpivot (wide → long), the melt shape; values stay typed double. */
  val q38_unpivot: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_orderkey") <= 50)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "val")
      .withColumn("val", round(col("val"), 2))
      // (l_orderkey, l_linenumber) is not unique in the synthetic lineitem —
      // val joins the sort to make the row order total
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"), col("val"))

  /** Q39 — TPC-H Q3 shape: selective dim filter → two joins → grouped
    * revenue → global top-k. The customer side is broadcast after its
    * segment filter; the final ORDER BY+LIMIT plans TakeOrderedAndProject. */
  val q39_revenue_topk: Q = (s, d) => {
    val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(s, d, "orders").filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val l = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
    // broadcast the (customer ⋈ orders) DIM-SIDE RESULT into the lineitem
    // join: after the segment + date filters it is a few hundred thousand
    // narrow rows — the star-join shape where the fact table streams and
    // never shuffles. Without the hint the estimator either shuffles both
    // sides or (worse, with a raised threshold) broadcasts the filtered
    // FACT side on a bytes-guess.
    broadcast(broadcast(c).join(o, c("c_custkey") === o("o_custkey")))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
  }

  /** Q40 — correlated scalar subquery (customers above their nation's mean),
    * decorrelated Spark-first into a window average — one shuffle on the
    * correlation key instead of a per-row subquery. */
  val q40_correlated_scalar: Q = (s, d) => {
    val w = Window.partitionBy(col("c_nationkey"))
    t(s, d, "customer")
      .withColumn("__nation_avg", avg(col("c_acctbal")).over(w))
      .filter(col("c_acctbal") > col("__nation_avg"))
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** Q41 — date offset arithmetic: day add, month add, day difference. */
  val q41_date_offsets: Q = (s, d) =>
    t(s, d, "orders")
      .filter(col("o_orderkey") <= 100)
      .select(
        col("o_orderkey"),
        date_add(col("o_orderdate"), 30).as("plus30"),
        add_months(col("o_orderdate"), 2).as("plus2m"),
        datediff(lit("1996-01-01").cast("date"), col("o_orderdate")).cast("long").as("days_to"))
      .orderBy(col("o_orderkey"))

  /** Q42 — JSON extraction from a string column (events.props carries JSON). */
  val q42_json: Q = (s, d) =>
    t(s, d, "events")
      .filter(col("event_id") <= 200)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy(col("event_id"))

  /** Q43 — array functions: split, size, slice, distinct, sort, join,
    * contains. Arrays are compared portably by joining back to strings. */
  val q43_array_fns: Q = (s, d) =>
    t(s, d, "customer")
      .filter(col("c_custkey") <= 50)
      .select(
        col("c_custkey"),
        size(split(col("c_name"), "0")).cast("long").as("n_parts"),
        array_join(slice(split(col("c_name"), "0"), 1, 3), "|").as("first3"),
        array_join(array_sort(array_distinct(split(col("c_name"), "0"))), "|").as("uniq"),
        array_contains(split(col("c_name"), "0"), "1").as("has_one"))
      .orderBy(col("c_custkey"))

  /** Q44 — more scalar functions: least/greatest, sign, ln/exp/log10,
    * floor division. Total ORDER BY over every output column (q01 note). */
  val q44_misc_scalars: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_orderkey") <= 80)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // +1e-9 before ROUND: pushes values off exact .5 boundaries where
        // Spark (half-up) and DuckDB disagree; deterministic on both sides
        round(least(col("l_quantity"), col("l_extendedprice") / 1000) + 1e-9, 4).as("lo"),
        round(greatest(col("l_discount"), col("l_tax")) + 1e-9, 4).as("hi"),
        signum(col("l_discount") - 0.05).cast("long").as("sgn"),
        round(log(col("l_quantity") + 1) + 1e-9, 4).as("ln_q"),
        round(exp(col("l_discount")) + 1e-9, 4).as("exp_d"),
        round(log10(col("l_extendedprice")) + 1e-9, 4).as("log_p"),
        floor(col("l_quantity") / 7).cast("long").as("q7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("lo"), col("hi"),
        col("sgn"), col("ln_q"), col("exp_d"), col("log_p"), col("q7"))

  /** Q45 — bitwise operators: and, xor, shift-left, or. */
  val q45_bit_ops: Q = (s, d) =>
    t(s, d, "lineitem")
      .filter(col("l_orderkey") <= 40)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").bitwiseAND(3).cast("long").as("band"),
        col("l_linenumber").bitwiseXOR(5).cast("long").as("x5"),
        shiftleft(col("l_linenumber"), 2).cast("long").as("shl"),
        col("l_linenumber").bitwiseOR(8).cast("long").as("orr"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("band"),
        col("x5"), col("shl"), col("orr"))

  /** Q46 — time-of-day and day-of-year extraction (DuckDB DOW is Sunday=0,
    * Spark dayofweek is Sunday=1 — aligned with -1). */
  val q46_time_parts: Q = (s, d) =>
    t(s, d, "events")
      .filter(col("event_id") <= 300)
      .select(
        col("event_id"),
        hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        second(col("ts")).cast("long").as("sec"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        dayofyear(col("ts")).cast("long").as("doy"))
      .orderBy(col("event_id"))

  /** Q47 — distribution window functions: ntile, percent_rank, cume_dist,
    * dense_rank (total per-partition order on the unique key). */
  val q47_window_dist: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
    t(s, d, "customer")
      .filter(col("c_custkey") <= 400)
      .select(
        col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        dense_rank().over(w).cast("long").as("dr"))
      .orderBy(col("c_custkey"))
  }

  /** Q48 — string functions, second batch: lpad/rpad, trim, replace,
    * reverse, split_part. */
  val q48_string_fns2: Q = (s, d) =>
    t(s, d, "customer")
      .filter(col("c_custkey") <= 60)
      .select(
        col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        rpad(col("c_mktsegment"), 12, ".").as("rpadded"),
        trim(rpad(col("c_mktsegment"), 12, " ")).as("trimmed"),
        regexp_replace(col("c_name"), "Customer", "C").as("replaced"),
        reverse(col("c_mktsegment")).as("rev"),
        split_part(col("c_name"), lit("#"), lit(2)).as("num_part"))
      .orderBy(col("c_custkey"))

  /** Q49 — MapType: parse JSON into a map, enumerate keys, access values
    * (map surface compared portably via joined key strings). */
  val q49_map_fns: Q = (s, d) => {
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
    t(s, d, "events")
      .filter(col("event_id") <= 150)
      .select(
        col("event_id"),
        array_join(map_keys(m), ",").as("ks"),
        size(map_keys(m)).cast("long").as("nk"),
        (element_at(m, "k") + 1).as("kv1"))
      .orderBy(col("event_id"))
  }

  /** Q50 — correlated LATERAL join: per-region top-2 nations by name via a
    * correlated ordered-limit subquery in FROM (Catalyst plans LateralJoin
    * + DecorrelateInnerQuery; DuckDB plans a dependent join). */
  val q50_lateral: Q = (s, d) => {
    t(s, d, "nation").createOrReplaceTempView("q50_nation")
    t(s, d, "region").createOrReplaceTempView("q50_region")
    s.sql(
      """SELECT r.r_name, l.n_name
        | FROM q50_region r,
        | LATERAL (SELECT n.n_name FROM q50_nation n
        |          WHERE n.n_regionkey = r.r_regionkey
        |          ORDER BY n.n_name LIMIT 2) l
        | ORDER BY r.r_name, l.n_name""".stripMargin)
  }

  /** Q51 — exact interpolated percentiles + median (the stats class beyond
    * q30's moments; Spark `percentile` ≡ DuckDB `quantile_cont`). */
  val q51_percentiles: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    // graft.ext.Quantiles: melt + sort/rank/weighted-sum formulation —
    // Spark's built-in percentile aggregate buffers whole groups in one
    // heap (slow AND a memory hazard at scale); this plan is pure codegen
    // + spillable sort, one shuffle for all requested columns.
    graft.ext.Quantiles.exactQuantiles(
        li, "l_returnflag",
        Seq(
          ("l_quantity", 0.25, "p25"),
          ("l_quantity", 0.5, "p50"),
          ("l_quantity", 0.9, "p90"),
          ("l_extendedprice", 0.5, "med_price")))
      .select(
        col("l_returnflag"),
        round(col("p25"), 4).as("p25"),
        round(col("p50"), 4).as("p50"),
        round(col("p90"), 4).as("p90"),
        round(col("med_price"), 4).as("med_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Q52 — time-based sliding window: RANGE frame over an INTERVAL of event
    * time (the timeseries rolling-aggregate shape; deterministic under
    * duplicate timestamps because RANGE includes all peer rows). */
  val q52_range_frame: Q = (s, d) => {
    t(s, d, "events").createOrReplaceTempView("q52_events")
    s.sql(
      """SELECT event_id,
        |   ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
        |     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4)
        |     AS rolling_1h
        | FROM q52_events WHERE event_id <= 5000
        | ORDER BY event_id""".stripMargin)
  }

  /** Q53 — navigation window functions: first/last/nth value over the full
    * partition frame (total order via the unique event_id tiebreak). */
  val q53_nav_window: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "events")
      .filter(col("event_id") <= 5000)
      .select(
        col("event_id"),
        round(first(col("value")).over(w), 4).as("first_v"),
        round(last(col("value")).over(w), 4).as("last_v"),
        round(nth_value(col("value"), 3).over(w), 4).as("third_v"))
      .orderBy(col("event_id"))
  }

  /** Q54 — correlated EXISTS / NOT EXISTS with a non-equi correlation
    * predicate: Catalyst decorrelates both into semi/anti joins carrying
    * the extra conjunct (no per-row subquery execution). */
  val q54_exists_subquery: Q = (s, d) => {
    t(s, d, "customer").createOrReplaceTempView("q54_customer")
    t(s, d, "orders").createOrReplaceTempView("q54_orders")
    // SHUFFLE_HASH inside EACH subquery block (round 11, Q54Probe2: SMJ
    // 2.3–3.5 s → SHJ 1.9–2.4 s at sf10): the planner's default
    // SortMergeJoin pays two full sorts of the 6M-row orders relation;
    // the semi/anti joins need no order and the per-partition hash
    // builds are a few MB. The hint must sit INSIDE the subquery — an
    // outer-block hint never reaches relations referenced only from
    // subquery expressions (they decorrelate to joins after hint
    // resolution).
    s.sql(
      """SELECT c_custkey, c_acctbal FROM q54_customer c
        | WHERE EXISTS (SELECT /*+ SHUFFLE_HASH(o) */ 1 FROM q54_orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_totalprice > c.c_acctbal * 10)
        |   AND NOT EXISTS (SELECT /*+ SHUFFLE_HASH(o2) */ 1 FROM q54_orders o2
        |   WHERE o2.o_custkey = c.c_custkey
        |     AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 5000)
        | ORDER BY c_custkey""".stripMargin)
  }

  /** Q55 — NOT IN with a nullable probe side: three-valued logic means a
    * NULL probe never qualifies (NULL NOT IN (...) is NULL, filtered) —
    * the null-aware anti-join semantics engines are most often wrong on. */
  val q55_not_in_nulls: Q = (s, d) => {
    t(s, d, "customer").createOrReplaceTempView("q55_customer")
    t(s, d, "orders").createOrReplaceTempView("q55_orders")
    s.sql(
      """SELECT o_orderkey FROM q55_orders
        | WHERE CASE WHEN o_totalprice < 1000 THEN NULL ELSE o_custkey END
        |   NOT IN (SELECT c_custkey FROM q55_customer WHERE c_acctbal < 0)
        | ORDER BY o_orderkey""".stripMargin)
  }

  /** Q56 — linear-regression aggregates (the OLS family): single-pass
    * algebraic moments, partial-aggregated like any SUM. */
  val q56_regr_agg: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("regr_count(l_extendedprice, l_quantity)").cast("long").as("n"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 4).as("icept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"))
      .orderBy(col("l_returnflag"))

  /** Q57 — IGNORE NULLS navigation: last non-null carried forward and the
    * next non-null lookahead, over a value column with injected nulls
    * (the gap-fill shape for sensor/event streams). */
  val q57_ignore_nulls: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, d, "events")
      .filter(col("event_id") <= 3000)
      .withColumn("v",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .select(
        col("event_id"),
        round(last(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("last_nn"),
        round(lead(col("v"), 1, null, ignoreNulls = true).over(w), 4)
          .as("next_nn"))
      .orderBy(col("event_id"))
  }

  /** Q58 — bag-semantics set operations: EXCEPT ALL keeps max(n−m, 0)
    * copies per value, INTERSECT ALL min(n, m) — multiplicity the
    * DISTINCT variants (q10/q11) never exercise. */
  val q58_except_all: Q = (s, d) => {
    val o = t(s, d, "orders").filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("k"))
    val c = t(s, d, "customer").filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("k"))
    o.exceptAll(c).select(lit("except").as("op"), col("k"))
      .unionAll(o.intersectAll(c).select(lit("intersect").as("op"), col("k")))
      .orderBy(col("op"), col("k"))
  }

  /** Q59 — NTILE deciles + per-decile stats (quantile-bucket profiling).
    * NOT the window NTILE — that plans a single-partition global sort.
    * [[graft.ext.Tiling.ntileByValue]] computes the identical tile from
    * an exact global rank assembled out of bit-bucket counts + parallel
    * per-bucket windows, so no stage owns the whole relation.
    *
    * The per-decile median is a RANK SELECTION, not Spark's `median()`
    * aggregate: `median()` is a value-buffering TypedImperativeAggregate
    * (every group value held in the agg buffer — 15M doubles per decile
    * at the 1000× set, where the round-13 spot run measured it as a 70 s
    * spill-churning stage). The tiling already assigns each row its
    * exact global rank, and the NTILE contract makes every decile's rank
    * span closed-form from the total count alone (first N%10 tiles hold
    * ⌈N/10⌉ rows), so the two middle ranks of each decile are column
    * arithmetic and the median is two conditional sums in the SAME
    * single-pass aggregation — nothing is buffered. Ties are safe: a
    * rank's value is well-defined regardless of tie order, and
    * odd-count deciles select the same rank twice (sum/2 = the value). */
  val q59_ntile: Q = (s, d) => {
    val tiled = graft.ext.Tiling.ntileByValue(
      t(s, d, "orders").select(col("o_totalprice"), col("o_orderkey")),
      10, "o_totalprice", "o_orderkey", tileCol = "decile",
      totalCol = Some("__total"))
    val k = col("decile")
    val base = floor(col("__total") / 10).cast("long")
    val rem = col("__total") % 10
    val ck = base + when(k <= rem, lit(1L)).otherwise(lit(0L)) // decile size
    val rk0 = (k - 1) * base + least(k - 1, rem) + 1 // first rank in decile
    val half = floor((ck - 1) / 2).cast("long")
    val posLo = rk0 + half // lower middle rank
    val posHi = rk0 + (ck - 1) - half // upper middle rank (= posLo if odd)
    val v = col("o_totalprice")
    tiled
      .groupBy(col("decile"))
      .agg(
        count(lit(1)).as("n"),
        round(min(v), 2).as("lo"),
        round(max(v), 2).as("hi"),
        // +1e-9: the interpolated median lands exactly on .xx5 ties where
        // Spark (half-up) and DuckDB (half-even) round apart
        round((sum(when(col("__rank") === posLo, v))
          + sum(when(col("__rank") === posHi, v))) / 2 + lit(1e-9), 2)
          .as("med"))
      .orderBy(col("decile"))
  }

  /** Q60 — gap-based sessionization, oracle-checked: the SAME
    * [[graft.streaming.Sessionize.sessions]] operator that runs the
    * streaming path (builtin `session_window`, gap-merged by Spark's
    * session aggregation operator) driven as a batch query. The oracle is
    * the gaps-and-islands SQL analog (LAG gap flag + cumulative sum =
    * session id), so the operator's merge rule — a new session starts
    * when ts ≥ prev + gap — is pinned against an independent
    * formulation, not another session_window. */
  val q60_sessionize: Q = (s, d) =>
    graft.streaming.Sessionize
      .sessions(t(s, d, "events"), "user_id", "ts", "value", gap = "6 hours")
      .orderBy(col("user_id"), col("session_start"))

  /** Q61 — recursive CTE (Spark 4's `UnionLoopExec`): calendar-spine
    * densification — build the month spine by recursion, left-join
    * monthly revenue so order-less months surface as explicit zero rows
    * (the densification shape reporting pipelines need; a GROUP BY alone
    * cannot produce rows for months with no orders).
    *
    * Recursion is BATCHED: each UnionLoop iteration is a full Spark job
    * (scheduling floor ~15 ms), so a month-at-a-time loop pays 86 jobs
    * for 86 rows — measured 1.5 s of pure overhead at any scale. Stepping
    * the recursion a YEAR per iteration and expanding the 12 months
    * vectorized inside the step (explode(sequence(...))) keeps the
    * recursive operator exercised and the result identical while cutting
    * iterations ~11× — the pattern any Spark recursive CTE over a dense
    * domain should use (depth = what genuinely needs sequencing; breadth
    * = vectorized within the iteration).
    *
    * Join order is aggregate-THEN-densify: reduce orders to one row per
    * month first (partial-aggregated single shuffle), then left-join the
    * spine to the 86-row monthly relation. Densify-then-aggregate — the
    * naive LEFT JOIN of spine onto raw orders — made the planner
    * broadcast the whole fact table as the outer join's build side
    * (measured 1.7 s at sf1 vs 0.3 s for this shape, and a broadcast
    * OOM waiting at real scale). */
  val q61_recursive_spine: Q = (s, d) => {
    t(s, d, "orders").createOrReplaceTempView("q61_orders")
    s.sql(
      """WITH RECURSIVE blk(b) AS (
        | SELECT 0
        | UNION ALL
        | SELECT b + 12 FROM blk WHERE b + 12 <= 85),
        | monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS mo,
        |    COUNT(o_orderkey) AS n, SUM(o_totalprice) AS rev
        |  FROM q61_orders GROUP BY date_trunc('month', o_orderdate))
        | SELECT s.mo, COALESCE(m.n, 0) AS n_orders,
        |  ROUND(COALESCE(m.rev, 0), 2) AS revenue
        | FROM (
        |  SELECT CAST(add_months(CAST('1994-10-01' AS DATE), b + i)
        |    AS TIMESTAMP) AS mo
        |  FROM blk LATERAL VIEW explode(sequence(0, 11)) t AS i
        |  WHERE b + i <= 85) s
        | LEFT JOIN monthly m ON m.mo = s.mo
        | ORDER BY s.mo""".stripMargin)
  }

  /** Q62 — MERGE/upsert snapshot roll via [[graft.etl.Upsert]]: matched
    * keys replaced, new keys inserted, base otherwise passed through —
    * anti-join + union, NOT a full-outer join (see the operator's scale
    * note). Change set: every %10=3 order repriced ('U'), every %100=7
    * order re-keyed +1e8 as an insert ('N') — disjoint key classes, so
    * the one-change-per-key contract holds by construction. */
  val q62_upsert: Q = (s, d) => {
    val o = t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    val updates = o.filter(col("o_orderkey") % 10 === 3)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    val inserts = o.filter(col("o_orderkey") % 100 === 7)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
      .withColumn("o_orderstatus", lit("N"))
    graft.etl.Upsert.upsert(o, updates.unionByName(inserts), Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("total"))
      .orderBy(col("o_orderkey"))
  }

  /** Q63 — SCD Type 2 history roll via [[graft.etl.Scd2]]: one snapshot
    * applied to a freshly-seeded history. Change classes exercised:
    * repriced rows (%7=0 → close + reopen), deleted keys (%13=0 → close),
    * new keys (+1e6 → open), everything else passes through. The oracle
    * reproduces the full close/open/pass-through algebra in SQL, so the
    * operator's interval semantics are pinned row-for-row. */
  val q63_scd2: Q = (s, d) => {
    val c = t(s, d, "customer")
    val hist = c.select(
        col("c_custkey").as("k"), col("c_name").as("nm"), col("c_acctbal").as("bal"))
      .withColumn("valid_from", lit("2020-01-01 00:00:00").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
    val snap = c.filter(col("c_custkey") % 13 =!= 0)
      .select(col("c_custkey").as("k"), col("c_name").as("nm"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 1000)
          .otherwise(col("c_acctbal")).as("bal"))
      // new keys are NEGATED, not offset: an additive offset collided
      // with real replica keys at the 100× set, silently violating the
      // one-row-per-key snapshot precondition (caught as a sort-tie
      // divergence); -(k+1) is disjoint from real keys at ANY scale-up
      .unionByName(c.filter(col("c_custkey") % 11 === 0)
        .select((-col("c_custkey") - 1L).as("k"),
          col("c_name").as("nm"), lit(-5.0).as("bal")))
    graft.etl.Scd2(hist, snap, Seq("k"),
        lit("2021-06-01 00:00:00").cast("timestamp"))
      .select(col("k"), col("nm"), round(col("bal"), 2).as("bal"),
        col("valid_from"), col("valid_to"))
      // bal joins the sort so the order stays total even if a future
      // fixture change reintroduces (k, valid_from) ties
      .orderBy(col("k"), col("valid_from"), col("bal"))
  }

  /** Q64 — positional explode (the UDTF/table-function class):
    * posexplode attaches each token's ordinal, pinned against DuckDB's
    * unnest + generate_subscripts. Ordinal fidelity is what separates a
    * table function from a bag-producing flatten — and what x4's n-gram
    * machinery depends on. */
  val q64_posexplode: Q = (s, d) =>
    t(s, d, "documents")
      .filter(col("doc_id") < 50)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("pos", col("pos").cast("long"))
      .orderBy(col("doc_id"), col("pos"))

  /** Q65 — hopping (sliding) event-time windows: the streaming window
    * class `window(ts, size, slide)` driven as a batch query — each event
    * lands in size/slide overlapping windows. The oracle reproduces the
    * epoch-aligned hop grid with generate_series + range join, so the
    * window assignment semantics (half-open [start, start+size)) are
    * pinned exactly. */
  val q65_hopping_window: Q = (s, d) =>
    t(s, d, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("val_sum"))
      .select(col("window.start").as("win_start"), col("n"), col("val_sum"))
      .orderBy(col("win_start"))

  /** Q66 — declarative data-quality constraints via [[graft.ext.Checks]]:
    * one report row per constraint with its exact violation count. The
    * range check is chosen to FAIL on real rows (totalprice caps at
    * ~600k), so the pass/violation split is exercised, not just zeros;
    * the oracle recomputes every count independently in SQL. */
  val q66_quality: Q = (s, d) => {
    import graft.ext.Checks._
    validate(t(s, d, "orders"), Seq(
      NotNull("o_custkey"),
      InRange("o_totalprice", 0.0, 300000.0),
      Satisfies("o_status_domain",
        col("o_orderstatus").isin("O", "F", "P")),
      Unique(Seq("o_orderkey")),
      RefIntegrity(Seq("o_custkey"), t(s, d, "customer"), Seq("c_custkey"))))
  }

  /** Q67 — deterministic MODE per group: most frequent value with ties
    * broken by smallest value (builtin `mode()` leaves tie order
    * engine-defined — unusable against an oracle; the count-then-argmin
    * formulation pins it, and is also the shuffle-by-value plan that
    * scales where a per-group value map does not). */
  val q67_mode: Q = (s, d) => {
    val counts = t(s, d, "lineitem")
      .groupBy(col("l_returnflag").as("g"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("mx", max(col("cnt")).over(Window.partitionBy(col("g"))))
      .groupBy(col("g"), col("mx"))
      .agg(round(min(when(col("cnt") === col("mx"), col("v"))), 2).as("mode_v"))
      .select(col("g"), col("mode_v"), col("mx").cast("long").as("mode_n"))
      .orderBy(col("g"))
  }

  /** Q68 — snapshot diff via [[graft.etl.SnapshotDiff]]: the audit face
    * of the incremental family — q62's upsert result diffed against the
    * original orders must report EXACTLY the change set that was applied
    * (every %10=3 key changed, every insert added, nothing removed).
    * Exact struct comparison here so the oracle is airtight; production
    * runs use the (key, hash) shuffle — see the operator scaladoc. */
  val q68_snapshot_diff: Q = (s, d) => {
    val o = t(s, d, "orders").select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    // the update and insert slices are disjoint (k%100=7 ⇒ k%10=7≠3), so
    // the delta builds in ONE scan with CASE projections instead of a
    // two-scan union
    val isUpd = col("o_orderkey") % 10 === 3
    val delta = o.filter(isUpd || col("o_orderkey") % 100 === 7)
      .select(
        when(isUpd, col("o_orderkey")).otherwise(col("o_orderkey") + 100000000L)
          .as("o_orderkey"),
        col("o_custkey"),
        when(isUpd, lit("U")).otherwise(lit("N")).as("o_orderstatus"),
        when(isUpd, col("o_totalprice") * 2).otherwise(col("o_totalprice"))
          .as("o_totalprice"))
      // in production the applied delta is a MATERIALIZED input; the
      // checkpoint stands in for that so the audit's two uses of it
      // (key broadcast + content compare) don't re-derive the subtree
      .localCheckpoint(true)
    // the delta is IN HAND here (the run built it), so the audit is
    // delta-sized: auditDelta ≡ diff(o, upsert(o, delta)) — the after
    // image is never derived, the wide base never shuffles (broadcast
    // key semi-join), and the exact struct compare touches only the
    // ~11% touched slice. AuditDeltaSpec pins the equivalence; the
    // oracle below still computes the full diff-of-upsert.
    // materializeDelta = false: the delta above is already
    // localCheckpointed (it feeds this audit alone here, but the
    // checkpoint also stands in for the production materialized input)
    graft.etl.SnapshotDiff.auditDelta(o, delta, Seq("o_orderkey"),
        materializeDelta = false)
      .orderBy(col("o_orderkey"))
  }

  /** Q69 — error-safe casting (TRY_CAST three ways: succeeds, always
    * fails, mixed per row): the ingestion-hardening semantics — a
    * malformed value must become NULL, never a thrown task (ANSI mode's
    * throwing CAST is the wrong tool inside a 100 TB pipeline). */
  val q69_try_cast: Q = (s, d) =>
    t(s, d, "events")
      .filter(col("event_id") <= 300)
      .select(
        col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("k_int"),
        expr("try_cast(event_type AS BIGINT)").as("et_int"),
        expr("""try_cast(CASE WHEN event_id % 3 = 0 THEN 'n/a'
                ELSE CAST(event_id AS STRING) END AS BIGINT)""").as("mixed"))
      .orderBy(col("event_id"))

  /** Q70 — time-series gap fill via [[graft.ext.Interpolate]]: per-user
    * hourly means densified onto each user's own hour spine, interior
    * gaps linearly interpolated between the nearest observed neighbors,
    * edges clamped. The oracle reproduces the whole pipeline —
    * generate_series spine, IGNORE NULLS neighbor search, the identical
    * `pv + (nv-pv)*(Δt/Δspan)` arithmetic — so the operator's fill
    * semantics are pinned row-for-row (~35k rows, ~91% synthesized). */
  val q70_interpolate: Q = (s, d) => {
    val hourly = t(s, d, "events")
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(avg(col("value")).as("v"))
    graft.ext.Interpolate.linear(hourly, Seq("user_id"), "h", "v")
      // TRUNCATE to 4 decimals, don't ROUND: interpolation between
      // low-decimal observations lands EXACTLY on .xxxx5 half-boundaries
      // (68 rows at sf0.01), where Spark (decimal-string HALF_UP) and
      // DuckDB (binary-value rounding) legitimately disagree. floor() of
      // the identical double is identical everywhere.
      .select(col("user_id"), col("h"),
        (floor(col("v") * 10000) / 10000).as("val"),
        col("filled").cast("long").as("filled"))
      .orderBy(col("user_id"), col("h"))
  }

  /** Q71 — histogram bucketing with `width_bucket` (the equi-width
    * binning every profiling/monitoring pipeline runs): bucket counts +
    * per-bucket sums over order totals. DuckDB has no width_bucket, so
    * the oracle spells out the exact arithmetic Spark's builtin uses —
    * `floor(n·(x−lo)/(hi−lo))+1` with underflow→0, overflow→n+1 —
    * which also documents the bucket-assignment contract. */
  val q71_width_bucket: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(width_bucket(col("o_totalprice"), lit(0.0), lit(500000.0), lit(10))
        .as("bucket"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("bucket"))

  /** Q72 — boolean aggregates (bool_and/bool_or) + count_if per group:
    * the constraint-summary shape (Checks uses the same algebra). Output
    * booleans are cast to 0/1 so the hash protocol sees integers. */
  val q72_bool_agg: Q = (s, d) =>
    t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        bool_and(col("o_totalprice") > 5000).cast("int").cast("long").as("all_over_5k"),
        bool_or(col("o_orderstatus") === "P").cast("int").cast("long").as("any_pending"),
        count_if(col("o_totalprice") > 300000).as("n_big"))
      .orderBy(col("o_orderpriority"))

  /** Q73 — bivariate statistics: corr, covar_samp, covar_pop per group
    * (the feature-screening face of q30's univariate stats / q56's
    * regression aggregates). All three are one-pass algebraic aggregates
    * in both engines; ROUND absorbs summation-order noise. */
  val q73_corr_covar: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qp_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qp_covs"),
        round(covar_pop(col("l_quantity"), col("l_discount")), 6).as("qd_covp"))
      .orderBy(col("l_returnflag"))

  /** Q74 — exact DECIMAL arithmetic (money semantics: no float drift in
    * the sums): cast to DECIMAL(18,2), aggregate exactly, surface as
    * rounded DOUBLE (decimal *result* types differ between engines —
    * Spark grows precision, DuckDB returns its own widths — so the
    * comparison face is double while the arithmetic face is exact). */
  val q74_decimal: Q = (s, d) => {
    val dec = col("o_totalprice").cast("decimal(18,2)")
    t(s, d, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        sum(dec).cast("double").as("dec_sum"),
        round(avg(dec).cast("double"), 4).as("dec_avg"),
        sum(dec * lit(3).cast("decimal(3,0)")).cast("double").as("dec_sum3x"))
      .orderBy(col("o_orderstatus"))
  }

  /** Q75 — array set algebra (intersect / except / union over token
    * sets): adjacent documents' vocabularies compared element-wise. Both
    * operands are sorted+distinct first, so Spark's order-of-first-arg
    * results ARE sorted and compare string-for-string against the
    * oracle's explicitly sorted lists; union is compared by size (its
    * element order is engine-defined in Spark). */
  val q75_array_setops: Q = (s, d) => {
    val toks = t(s, d, "documents")
      .filter(col("doc_id") < 31)
      .select(col("doc_id"),
        array_sort(array_distinct(split(trim(col("text")), "\\s+"))).as("toks"))
    val a = toks.alias("a")
    val b = toks.select((col("doc_id") - 1).as("doc_id"), col("toks").as("btoks")).alias("b")
    a.join(b, "doc_id")
      .select(
        col("doc_id"),
        array_join(array_intersect(col("toks"), col("btoks")), " ").as("inter_s"),
        array_join(array_except(col("toks"), col("btoks")), " ").as("except_s"),
        size(array_union(col("toks"), col("btoks"))).cast("long").as("union_n"))
      .orderBy(col("doc_id"))
  }

  /** Q76 — LIKE pattern matching with an explicit ESCAPE character plus
    * case-insensitive ILIKE: the wildcard-literal distinction ('_' as
    * data, not as any-char) that ingestion filters over real-world names
    * hit immediately. Names are rewritten to contain '_' so the escape
    * path is actually exercised. */
  val q76_like_escape: Q = (s, d) =>
    t(s, d, "customer")
      .filter(col("c_custkey") < 400)
      .select(col("c_custkey"),
        regexp_replace(col("c_name"), "#", "_").as("uname"),
        col("c_mktsegment"))
      .select(
        col("c_custkey"),
        when(expr("uname LIKE 'Customer#_0000001%' ESCAPE '#'"), 1L).otherwise(0L)
          .as("esc_hit"),
        when(expr("c_mktsegment ILIKE 'bUiLd%'"), 1L).otherwise(0L).as("ilike_hit"),
        when(expr("uname NOT LIKE '%9'"), 1L).otherwise(0L).as("notlike_hit"))
      .orderBy(col("c_custkey"))

  /** Q77 — robust outlier screen via [[graft.ext.Robust]] (median/MAD):
    * per-group anomaly counts over a value stream with planted spikes
    * (every 97th event ×20, so the screen demonstrably fires). MAD-based
    * screens are the telemetry/data-quality standard precisely because
    * mean/stddev are dragged by the outliers they hunt. Exact medians on
    * both sides; the oracle recomputes MAD from scratch. */
  val q77_outliers: Q = (s, d) => {
    val v = t(s, d, "events")
      .select(col("event_type").as("g"),
        (col("value") * when(col("event_id") % 97 === 0, 20.0).otherwise(1.0))
          .as("x"))
    graft.ext.Robust.outlierSummary(v, Seq("g"), "x", k = 5.0)
      .select(col("g"), col("n_outliers"), col("n"),
        round(col("med"), 4).as("med"), round(col("mad"), 4).as("madv"))
      .orderBy(col("g"))
  }

  /** Q78 — semi-structured VARIANT ingestion (Spark 4's open JSON type):
    * parse once with `parse_json`, extract typed paths with
    * `variant_get` — missing paths are NULL, not errors. The oracle runs
    * DuckDB's JSON extraction over the same strings, pinning the
    * extraction semantics across two different storage models (Spark
    * binary variant vs DuckDB JSON strings). */
  val q78_variant: Q = (s, d) =>
    t(s, d, "events")
      .filter(col("event_id") <= 500)
      .select(
        col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "bigint").as("k_big"),
        variant_get(parse_json(col("props")), "$.k", "string").as("k_str"),
        variant_get(parse_json(col("props")), "$.missing", "string").as("gone"))
      .orderBy(col("event_id"))

  /** Q79 — timezone conversion incl. DST transitions: UTC instants
    * spread across half a year (so both EST and EDT appear) converted to
    * New York and Tokyo wall time, plus a wall-clock hour extraction.
    * Only the UTC→wall direction is queried: wall→UTC is ambiguous
    * during DST fall-back and engines legitimately disagree on the
    * ambiguous hour. */
  val q79_timezone: Q = (s, d) => {
    val shifted = expr("timestampadd(DAY, CAST(event_id % 180 AS INT), ts)")
    t(s, d, "events")
      .filter(col("event_id") <= 400)
      .select(
        col("event_id"),
        from_utc_timestamp(shifted, "America/New_York").as("ny_wall"),
        from_utc_timestamp(shifted, "Asia/Tokyo").as("tokyo_wall"),
        hour(from_utc_timestamp(shifted, "America/New_York")).cast("long")
          .as("ny_hour"))
      .orderBy(col("event_id"))
  }

  /** Q80 — recursive CTE with a JOIN inside the loop (graph
    * reachability, bounded depth): the iterate-until-fixpoint class q61's
    * generator recursion does not exercise — each UnionLoop step here
    * joins the frontier against the edge relation. Cycles are handled by
    * the depth bound + final DISTINCT (both engines run UNION ALL
    * recursion, so the dedup-per-step semantics question never arises).
    * Identical SQL text runs on both engines. */
  val q80_graph_reach: Q = (s, d) => {
    // materialize the edge relation ONCE: a CTE referenced inside the
    // recursive member is re-derived by every UnionLoop iteration
    // (scan + DISTINCT shuffle × depth) — the mistake a production
    // iterative job must not make; localCheckpoint pins it so each step
    // joins the frontier against an in-memory relation.
    // Round-9 profile (Q80Probe at sf10): the cost was never the 254
    // recursion rows — it was (a) the DISTINCT shuffle building the FULL
    // 2.1 M-edge relation and (b) 4 UnionLoop job floors. Two structural
    // cures, both semantics-preserving:
    //  1. FRONTIER-RELEVANT SUBGRAPH: every expandable node is a seed
    //     (< 40) or a hop destination (o_orderkey % 1500 ∈ [0, 1500)),
    //     so edges with src ≥ 1500 can never join any frontier — the
    //     iterated relation shrinks ~1000× before the loop (the graph
    //     analog of partition pruning; probe-verified equal output).
    //  2. TWO HOPS PER ITERATION (q61's batching lesson): two chained
    //     edge joins inside the recursive member — still frontier-
    //     restricted, NOT a global 2-hop edge materialization (that
    //     would be the classic |E|²/hub blowup) — visiting only EVEN
    //     depths; the odd strata are reconstructed outside the loop by
    //     one non-recursive 1-hop join. Each path is counted exactly
    //     once (canonical 2+2+…+optional-1 decomposition), so the
    //     aggregate is unchanged; UnionLoop iterations drop 4 → 2.
    // Measured 1.66 → 1.05 s at sf10; the rest is the orders scan + ~3
    // job floors. The oracle runs the same recursion shape with the
    // UNRESTRICTED inline CTE — DuckDB evaluates CTEs once.
    t(s, d, "orders")
      .filter(col("o_orderkey") % 7 === 0 && col("o_custkey") < 1500)
      .select(col("o_custkey").as("src"), (col("o_orderkey") % 1500).as("dst"))
      .distinct()
      .localCheckpoint(true)
      .createOrReplaceTempView("q80_edges")
    // the recursion result feeds BOTH union branches below; Spark inlines
    // CTEs, which would run the whole UnionLoop twice — checkpoint the
    // (254-row) even-depth relation once instead
    s.sql(
      """WITH RECURSIVE reach2(seed, node, depth) AS (
        |  SELECT src, src, 0
        |  FROM (SELECT DISTINCT src FROM q80_edges WHERE src < 40) s
        |  UNION ALL
        |  SELECT r.seed, e2.dst, r.depth + 2
        |  FROM reach2 r
        |  JOIN q80_edges e1 ON e1.src = r.node
        |  JOIN q80_edges e2 ON e2.src = e1.dst
        |  WHERE r.depth + 2 <= 3)
        | SELECT seed, node, depth FROM reach2""".stripMargin)
      .localCheckpoint(true)
      .createOrReplaceTempView("q80_reach2")
    s.sql(
      """WITH reach AS (
        |  SELECT seed, node, depth FROM q80_reach2
        |  UNION ALL
        |  SELECT r.seed, e.dst, r.depth + 1
        |  FROM q80_reach2 r JOIN q80_edges e ON e.src = r.node
        |  WHERE r.depth + 1 <= 3)
        | SELECT seed, COUNT(DISTINCT node) AS n_reach,
        |  CAST(MAX(depth) AS BIGINT) AS max_depth
        | FROM reach GROUP BY seed ORDER BY seed""".stripMargin)
  }

  /** Q81 — incremental rollup maintenance via [[graft.etl.IncrementalAgg]]:
    * the state is bootstrapped from pre-1996 orders and the later orders
    * are folded in as a delta (aggregate-the-delta + algebraic merge —
    * history is never rescanned). The oracle recomputes the rollup from
    * ALL rows directly, so the hash equality IS the proof that
    * incremental maintenance ≡ full recompute. */
  val q81_incremental_agg: Q = (s, d) => {
    val o = t(s, d, "orders").select(
      (col("o_custkey") % 100).as("g"), col("o_totalprice").as("p"),
      col("o_orderdate"))
    val cutoff = lit("1996-01-01").cast("timestamp")
    val state = graft.etl.IncrementalAgg.aggregate(
      o.filter(col("o_orderdate") < cutoff), Seq("g"), Seq("p"))
    val updated = graft.etl.IncrementalAgg.update(
      state, o.filter(col("o_orderdate") >= cutoff), Seq("g"), Seq("p"))
    graft.etl.IncrementalAgg.withDerived(updated, Seq("p"))
      .select(col("g"), col("cnt"),
        round(col("sum_p"), 2).as("sum_p"),
        round(col("min_p"), 2).as("min_p"),
        round(col("max_p"), 2).as("max_p"),
        round(col("mean_p"), 4).as("mean_p"))
      .orderBy(col("g"))
  }

  /** Q82 — IEEE-754 edge semantics pinned across engines: NaN orders
    * ABOVE +Infinity in comparisons and MAX (both engines agree — worth
    * pinning because other engines do not), aggregates over ±Infinity,
    * and division by zero yielding NULL (the non-ANSI contract both
    * engines share — NOT Infinity). Outputs are counts/flags and
    * finite-only extrema so no non-finite value has to survive the hash
    * protocol itself. */
  val q82_float_edges: Q = (s, d) =>
    t(s, d, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_orderkey").as("id"),
        when(col("l_orderkey") % 7 === 0, lit(Double.NaN))
          .when(col("l_orderkey") % 11 === 0, lit(Double.PositiveInfinity))
          .when(col("l_orderkey") % 13 === 0, lit(Double.NegativeInfinity))
          .otherwise(col("l_quantity")).as("v"))
      .groupBy(col("g"))
      .agg(
        count(lit(1)).as("cnt"),
        count_if(isnan(col("v"))).as("n_nan"),
        count_if(col("v") === lit(Double.PositiveInfinity)).as("n_pinf"),
        count_if(col("v") === lit(Double.NegativeInfinity)).as("n_ninf"),
        round(max(when(!isnan(col("v")) &&
          col("v") =!= lit(Double.PositiveInfinity), col("v"))), 2)
          .as("max_finite"),
        count_if(isnan(greatest(col("v"), lit(Double.PositiveInfinity))))
          .as("n_nan_above_inf"),
        // ANSI mode (Spark 4 default) makes bare /0 THROW; try_divide is
        // the error-safe face and returns NULL — matching DuckDB's plain /
        count_if(try_divide(col("v"), lit(0.0)).isNull).as("n_div0_null"))
      .orderBy(col("g"))

  /** Q83 — point-in-time (PIT) lookup against an interval-validity
    * dimension: each fact row picks the dimension version whose
    * [valid_from, valid_to) contains its event time — the feature-store
    * join that prevents temporal leakage (a fact must never see a
    * dimension version from its future). Dimension is two SCD2-style
    * epochs per customer built inline; the join is an equi-join on the
    * key with the interval containment as residual, dimension broadcast
    * (per-key version counts are small by construction in any SCD2
    * history; a giant history would use [[graft.operators.RangeJoin]]'s
    * binning instead). */
  val q83_pit_lookup: Q = (s, d) => {
    val c = t(s, d, "customer")
    val cut = lit("1995-06-01").cast("timestamp")
    // ONE customer scan: both validity epochs inline()d from the same
    // row, instead of a two-scan self-union (r10 probe: 1.31 → 1.14 s
    // at sf10 — the union read the dim twice for no reason)
    val hist = c.select(col("c_custkey").as("k"),
        inline(array(
          struct(lit("1992-01-01").cast("timestamp").as("vfrom"),
            cut.as("vto"), round(col("c_acctbal"), 2).as("bal")),
          struct(cut.as("vfrom"), lit(null).cast("timestamp").as("vto"),
            round(col("c_acctbal") + 1000, 2).as("bal")))))
      .select(col("k"), col("vfrom"), col("vto"), col("bal"))
    val o = t(s, d, "orders")
    // SHUFFLE_HASH, not broadcast (the q04 lesson): the versioned dim is
    // 2·|customer| rows — collecting it to the driver for a broadcast
    // build costs more than co-partitioning both sides by the equi key
    // (measured sf10, isolated: 1.87 s broadcast → 1.49 s SHJ), and a
    // real PIT history table outgrows any broadcast threshold anyway. The
    // validity-interval predicate stays a cheap residual on the hash
    // match — never a cartesian.
    o.join(hist.hint("shuffle_hash"),
        o("o_custkey") === hist("k") && o("o_orderdate") >= hist("vfrom") &&
          (hist("vto").isNull || o("o_orderdate") < hist("vto")))
      .groupBy(year(col("o_orderdate")).cast("long").as("y"))
      .agg(count(lit(1)).as("n"), round(sum(col("bal")), 2).as("bal_sum"))
      .orderBy(col("y"))
  }

  /** Q84 — bitwise AGGREGATES (bit_and / bit_or / bit_xor over groups):
    * the bitmap-accumulation class (feature masks, permission sets)
    * complementing q45's scalar bit ops. */
  val q84_bit_agg: Q = (s, d) =>
    t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        bit_and(col("l_orderkey")).as("and_key"),
        bit_or(col("l_linenumber").cast("long")).as("or_line"),
        bit_xor(col("l_partkey")).as("xor_part"))
      .orderBy(col("l_returnflag"))

  /** Q85 — STRUCT semantics: composite values built in-flight, compared
    * LEXICOGRAPHICALLY by field order (min/max of a struct ≡ arg-min/max
    * over the ordered field tuple — the order-by-composite contract),
    * then projected back to scalars so only primitives hit the hash
    * protocol. Ties in the rounded first field fall through to the key
    * field, making the result total. */
  val q85_struct: Q = (s, d) => {
    val st = struct(round(col("c_acctbal"), 2).as("bal"),
      col("c_custkey").as("key"))
    t(s, d, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(min(st).as("mn"), max(st).as("mx"))
      .select(col("c_mktsegment"),
        col("mn.bal").as("min_bal"), col("mn.key").as("min_key"),
        col("mx.bal").as("max_bal"), col("mx.key").as("max_key"))
      .orderBy(col("c_mktsegment"))
  }

  /** Q86 — AVG under ROLLUP: the face for [[graft.plans.PreAggExpandRewrite]]'s
    * r10 AVG decomposition (Σ partial SUM / Σ partial COUNT below the
    * Expand). AVG is the most common rollup aggregate in dashboards, and
    * an average-of-averages shortcut would be WRONG under unequal group
    * sizes — the oracle hash-checks the exact decomposition. Rounding
    * uses the +1e-9 nudge (q44 contract) so half-at-digit ties agree
    * with DuckDB. */
  val q86_rollup_avg: Q = (s, d) =>
    t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        round(avg(col("l_quantity")) + 1e-9, 2).as("avg_qty"),
        round(avg(col("l_extendedprice")) + 1e-9, 2).as("avg_price"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** name → DataFrame plan. Insertion order preserved for stable reporting. */
  /** ETL_SLICE — the engine's core transform (S5 + A1/A2) as an
    * oracle-checked face (round 11): the exact [[graft.etl.HourlyAggregate]]
    * call Bench times — events 15-min rows → (user_id, hour) groups with
    * the `_min`/`_mean` rename contract of
    * `/root/reference/etl/oedi_etl/transform.py:53-120` — rounded and
    * totally ordered for the hash compare. Bench keeps timing the WRITE
    * (parquet+snappy, tools/duck_bench.py wraps this SQL in a matching
    * COPY); this face pins the VALUES that write contains, closing the one
    * benched item that had no oracle-side check or timing (the reference's
    * only published number is this workload, README.md:341-344). */
  val etl_slice: Q = (s, d) =>
    graft.etl.HourlyAggregate(
        t(s, d, "events"), timeCol = "ts", idCol = "user_id",
        measureCols = Seq("value"), byId = true)
      .withColumn("value_mean", round(col("value_mean") + lit(1e-9), 4))
      .orderBy(col("user_id_min"), col("ts"))

  val queries: Seq[(String, Q)] = Seq(
    "q01_scan_filter" -> q01_scan_filter,
    "q02_hourly_agg" -> q02_hourly_agg,
    "q03_join_countdistinct" -> q03_join_countdistinct,
    "q04_group_distinct" -> q04_group_distinct,
    "q05_window_topk" -> q05_window_topk,
    "q06_multi_agg" -> q06_multi_agg,
    "q07_dim_joins" -> q07_dim_joins,
    "q08_anti_join" -> q08_anti_join,
    "q09_semi_join" -> q09_semi_join,
    "q10_except" -> q10_except,
    "q11_intersect" -> q11_intersect,
    "q12_topk_global" -> q12_topk_global,
    "q13_union" -> q13_union,
    "q14_theta_join" -> q14_theta_join,
    "q15_lag_window" -> q15_lag_window,
    "q16_case_label" -> q16_case_label,
    "q17_rollup" -> q17_rollup,
    "q18_date_parts" -> q18_date_parts,
    "q19_doc_stats" -> q19_doc_stats,
    "q20_string_fns" -> q20_string_fns,
    "q21_etl_hourly_by_user" -> q21_etl_hourly_by_user,
    "q22_cube" -> q22_cube,
    "q23_window_frames" -> q23_window_frames,
    "q24_scalar_math" -> q24_scalar_math,
    "q25_date_arith" -> q25_date_arith,
    "q26_conditional_agg" -> q26_conditional_agg,
    "q27_asof_join" -> q27_asof_join,
    "q28_range_join" -> q28_range_join,
    "q29_pivot" -> q29_pivot,
    "q30_stats_agg" -> q30_stats_agg,
    "q31_full_outer" -> q31_full_outer,
    "q32_grouping_sets" -> q32_grouping_sets,
    "q33_regex" -> q33_regex,
    "q34_null_fns" -> q34_null_fns,
    "q35_arg_minmax" -> q35_arg_minmax,
    "q36_string_agg" -> q36_string_agg,
    "q37_having" -> q37_having,
    "q38_unpivot" -> q38_unpivot,
    "q39_revenue_topk" -> q39_revenue_topk,
    "q40_correlated_scalar" -> q40_correlated_scalar,
    "q41_date_offsets" -> q41_date_offsets,
    "q42_json" -> q42_json,
    "q43_array_fns" -> q43_array_fns,
    "q44_misc_scalars" -> q44_misc_scalars,
    "q45_bit_ops" -> q45_bit_ops,
    "q46_time_parts" -> q46_time_parts,
    "q47_window_dist" -> q47_window_dist,
    "q48_string_fns2" -> q48_string_fns2,
    "q49_map_fns" -> q49_map_fns,
    "q50_lateral" -> q50_lateral,
    "q51_percentiles" -> q51_percentiles,
    "q52_range_frame" -> q52_range_frame,
    "q53_nav_window" -> q53_nav_window,
    "q54_exists_subquery" -> q54_exists_subquery,
    "q55_not_in_nulls" -> q55_not_in_nulls,
    "q56_regr_agg" -> q56_regr_agg,
    "q57_ignore_nulls" -> q57_ignore_nulls,
    "q58_except_all" -> q58_except_all,
    "q59_ntile" -> q59_ntile,
    "q60_sessionize" -> q60_sessionize,
    "q61_recursive_spine" -> q61_recursive_spine,
    "q62_upsert" -> q62_upsert,
    "q63_scd2" -> q63_scd2,
    "q64_posexplode" -> q64_posexplode,
    "q65_hopping_window" -> q65_hopping_window,
    "q66_quality" -> q66_quality,
    "q67_mode" -> q67_mode,
    "q68_snapshot_diff" -> q68_snapshot_diff,
    "q69_try_cast" -> q69_try_cast,
    "q70_interpolate" -> q70_interpolate,
    "q71_width_bucket" -> q71_width_bucket,
    "q72_bool_agg" -> q72_bool_agg,
    "q73_corr_covar" -> q73_corr_covar,
    "q74_decimal" -> q74_decimal,
    "q75_array_setops" -> q75_array_setops,
    "q76_like_escape" -> q76_like_escape,
    "q77_outliers" -> q77_outliers,
    "q78_variant" -> q78_variant,
    "q79_timezone" -> q79_timezone,
    "q80_graph_reach" -> q80_graph_reach,
    "q81_incremental_agg" -> q81_incremental_agg,
    "q82_float_edges" -> q82_float_edges,
    "q83_pit_lookup" -> q83_pit_lookup,
    "q84_bit_agg" -> q84_bit_agg,
    "q85_struct" -> q85_struct,
    "q86_rollup_avg" -> q86_rollup_avg,
    "etl_slice" -> etl_slice)

  /** name → DuckDB oracle SQL (SURVEY §2.9, validated against DuckDB 1.0). */
  val oracleSql: Map[String, String] = Map(
    // the engine's core hourly transform at table level: (user_id, hour)
    // groups, _min/_mean contract; the bench wraps the body in COPY ...
    // (FORMAT PARQUET, COMPRESSION SNAPPY) so both engines time the write
    "etl_slice" ->
      """SELECT date_trunc('hour', ts) AS ts,
        | MIN(user_id) AS user_id_min,
        | MIN(ts) AS ts_min,
        | ROUND(AVG(value) + 1e-9, 4) AS value_mean
        | FROM events GROUP BY user_id, date_trunc('hour', ts)
        | ORDER BY user_id_min, ts""",
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        | WHERE l_quantity > 45
        | ORDER BY l_orderkey, l_linenumber, l_quantity""",
    "q02_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS timestamp,
        | MIN(event_id) AS event_id_min,
        | ROUND(AVG(value) + 1e-9, 4) AS value_mean
        | FROM events GROUP BY date_trunc('hour', ts) ORDER BY timestamp""",
    "q03_join_countdistinct" ->
      """SELECT COUNT(DISTINCT c.c_custkey) AS total_customers
        | FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | WHERE c.c_mktsegment = 'BUILDING'""",
    "q04_group_distinct" ->
      """SELECT c.c_mktsegment, COUNT(DISTINCT c.c_custkey) AS num_customers
        | FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        | GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
    "q05_window_topk" ->
      """WITH ranked AS (
        |  SELECT c_custkey, c_mktsegment,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS rn
        |  FROM customer)
        | SELECT c_custkey, c_mktsegment FROM ranked WHERE rn <= 10
        | ORDER BY c_mktsegment, c_custkey""",
    "q06_multi_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        | ROUND(SUM(l_quantity), 2) AS sum_qty,
        | ROUND(SUM(l_extendedprice), 2) AS sum_price,
        | ROUND(AVG(l_discount), 4) AS avg_disc
        | FROM lineitem GROUP BY l_returnflag, l_linestatus
        | ORDER BY l_returnflag, l_linestatus""",
    "q07_dim_joins" ->
      """SELECT r.r_name, n.n_name, COUNT(*) AS num_customers
        | FROM customer c
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""",
    "q08_anti_join" ->
      """SELECT p.p_partkey FROM part p
        | LEFT JOIN lineitem l
        |   ON p.p_partkey = l.l_partkey AND l.l_quantity > 49
        | WHERE l.l_orderkey IS NULL ORDER BY p.p_partkey""",
    "q09_semi_join" ->
      """SELECT p.p_partkey FROM part p
        | WHERE EXISTS (SELECT 1 FROM lineitem l
        |   WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 49)
        | ORDER BY p.p_partkey""",
    "q10_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        | EXCEPT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        | ORDER BY o_custkey""",
    "q11_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        | ORDER BY o_custkey""",
    "q12_topk_global" ->
      """SELECT o_orderkey, ROUND(o_totalprice, 2) AS total FROM orders
        | ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
    "q13_union" ->
      """SELECT x FROM (
        |  SELECT o_custkey AS x FROM orders WHERE o_orderstatus = 'F'
        |  UNION
        |  SELECT c_custkey AS x FROM customer WHERE c_acctbal < 0) u
        | ORDER BY x""",
    "q14_theta_join" ->
      """SELECT l.l_orderkey, l.l_linenumber FROM lineitem l
        | JOIN orders o
        |   ON l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        | ORDER BY l.l_orderkey, l.l_linenumber""",
    "q15_lag_window" ->
      """SELECT user_id, event_id,
        | ROUND(value - LAG(value) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id), 4) AS dv
        | FROM events ORDER BY user_id, event_id""",
    "q16_case_label" ->
      """SELECT DISTINCT CASE
        |   WHEN l_linenumber = 0 THEN 'baseline'
        |   WHEN l_linenumber < 10
        |     THEN CONCAT('upgrade0', CAST(l_linenumber AS STRING))
        |   ELSE CONCAT('upgrade', CAST(l_linenumber AS STRING))
        | END AS upgrade_label FROM lineitem ORDER BY upgrade_label""",
    "q17_rollup" ->
      """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
        | GROUP BY ROLLUP(l_returnflag) ORDER BY l_returnflag NULLS FIRST""",
    "q18_date_parts" ->
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS y,
        | EXTRACT(MONTH FROM o_orderdate) AS m, COUNT(*) AS cnt
        | FROM orders
        | GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)
        | ORDER BY y, m""",
    "q19_doc_stats" ->
      """SELECT lang, COUNT(*) AS docs, COUNT(DISTINCT text) AS distinct_docs,
        | ROUND(AVG(n_chars), 2) AS avg_chars
        | FROM documents GROUP BY lang ORDER BY lang""",
    "q20_string_fns" ->
      """SELECT c_custkey, UPPER(c_name) AS uname, SUBSTR(c_name, 1, 8) AS pre,
        | LENGTH(c_name) AS len FROM customer
        | WHERE c_custkey <= 20 ORDER BY c_custkey""",
    // make_timestamp(µs) reproduces Spark's ns→µs truncation of the raw
    // MIN(ts); without it DuckDB would keep ns precision and hash-mismatch.
    "q21_etl_hourly_by_user" ->
      """SELECT date_trunc('hour', ts) AS ts, MIN(user_id) AS user_id_min,
        | make_timestamp(epoch_ns(MIN(ts)) // 1000) AS ts_min,
        | ROUND(AVG(value) + 1e-9, 4) AS value_mean
        | FROM events GROUP BY user_id, date_trunc('hour', ts)
        | ORDER BY user_id_min, ts""",
    "q22_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt FROM lineitem
        | GROUP BY CUBE(l_returnflag, l_linestatus)
        | ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q23_window_frames" ->
      """SELECT user_id, event_id,
        | ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running,
        | LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event
        | FROM events ORDER BY user_id, event_id""",
    "q24_scalar_math" ->
      """SELECT l_orderkey, l_linenumber,
        | ROUND(ABS(l_discount - 0.05), 4) AS abs_disc,
        | ROUND(SQRT(l_quantity), 4) AS sqrt_qty,
        | CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k,
        | CAST(MOD(l_linenumber, 3) AS BIGINT) AS ln_mod,
        | ROUND(POWER(l_tax + 1.0, 2), 4) AS tax_sq
        | FROM lineitem WHERE l_orderkey <= 100
        | ORDER BY l_orderkey, l_linenumber, abs_disc, sqrt_qty,
        |   price_k, ln_mod, tax_sq""",
    "q25_date_arith" ->
      """SELECT o_orderkey,
        | CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        | last_day(CAST(o_orderdate AS DATE)) AS month_end
        | FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    "q26_conditional_agg" ->
      """SELECT l_returnflag,
        | COUNT(*) FILTER (WHERE l_quantity > 25) AS big_cnt,
        | ROUND(SUM(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) AS disc_price
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q27_asof_join" ->
      """SELECT e.event_id, l.signup_event
        | FROM (SELECT user_id, ts, event_id FROM events) e
        | ASOF LEFT JOIN (SELECT user_id, ts AS rts, MAX(event_id) AS signup_event
        |   FROM events WHERE event_type = 'signup' GROUP BY user_id, ts) l
        | ON e.user_id = l.user_id AND e.ts >= l.rts
        | ORDER BY e.event_id""",
    "q28_range_join" ->
      """SELECT o.o_orderkey, b.band FROM orders o
        | JOIN (VALUES (0.0, 50000.0, 'low'), (50000.0, 150000.0, 'mid'),
        |   (150000.0, 1000000.0, 'high')) AS b(lo, hi, band)
        | ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
        | ORDER BY o.o_orderkey, b.band""",
    "q29_pivot" ->
      """SELECT l_returnflag,
        | ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus='F'), 2) AS F,
        | ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus='O'), 2) AS O
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q30_stats_agg" ->
      """SELECT l_returnflag, ROUND(STDDEV_SAMP(l_quantity),4) AS sd_qty,
        | ROUND(VAR_SAMP(l_quantity),4) AS var_qty,
        | ROUND(MEDIAN(l_quantity),2) AS med_qty
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q31_full_outer" ->
      """SELECT COALESCE(f.k, c.k) AS custkey, f.cnt_f, c.bal
        | FROM (SELECT o_custkey AS k, COUNT(*) AS cnt_f FROM orders
        |   WHERE o_orderstatus='F' GROUP BY o_custkey) f
        | FULL OUTER JOIN (SELECT c_custkey AS k, ROUND(c_acctbal,2) AS bal
        |   FROM customer WHERE c_acctbal < -500) c
        | ON f.k = c.k ORDER BY custkey""",
    "q32_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        | CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        | CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
        | FROM lineitem GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus),())
        | ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
    "q33_regex" ->
      """SELECT c_custkey,
        | CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) AS cust_num,
        | regexp_replace(c_name, '0+', '*', 'g') AS squeezed
        | FROM customer WHERE c_custkey <= 100 AND regexp_matches(c_name, '[0-9]$')
        | ORDER BY c_custkey""",
    "q34_null_fns" ->
      """SELECT o_orderkey, NULLIF(o_orderstatus,'O') AS ns,
        | COALESCE(NULLIF(o_orderstatus,'O'),'open') AS status2,
        | o_orderstatus IS NOT DISTINCT FROM 'F' AS is_f
        | FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""",
    "q35_arg_minmax" ->
      """SELECT c_mktsegment, arg_max(c_name, c_custkey) AS last_name,
        | arg_min(c_name, c_custkey) AS first_name FROM customer
        | GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q36_string_agg" ->
      """SELECT c_nationkey, string_agg(c_name, '|' ORDER BY c_name) AS names
        | FROM customer WHERE c_custkey <= 100
        | GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q37_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        | GROUP BY o_custkey HAVING COUNT(*) >= 5 ORDER BY o_custkey""",
    "q38_unpivot" ->
      """SELECT l_orderkey, l_linenumber, m.metric, ROUND(m.val, 2) AS val
        | FROM lineitem, LATERAL (VALUES
        |   ('l_quantity', l_quantity), ('l_discount', l_discount),
        |   ('l_tax', l_tax)) AS m(metric, val)
        | WHERE l_orderkey <= 50
        | ORDER BY l_orderkey, l_linenumber, m.metric, ROUND(m.val, 2)""",
    "q39_revenue_topk" ->
      """SELECT l_orderkey, ROUND(SUM(l_extendedprice*(1-l_discount)),2) AS revenue,
        | o_orderdate, o_orderpriority
        | FROM customer JOIN orders ON c_custkey=o_custkey
        | JOIN lineitem ON l_orderkey=o_orderkey
        | WHERE c_mktsegment='BUILDING' AND o_orderdate < TIMESTAMP '1996-01-01'
        |   AND l_shipdate > TIMESTAMP '1996-01-01'
        | GROUP BY l_orderkey, o_orderdate, o_orderpriority
        | ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q40_correlated_scalar" ->
      """SELECT c_custkey FROM customer c
        | WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
        |   WHERE c2.c_nationkey = c.c_nationkey)
        | ORDER BY c_custkey""",
    "q41_date_offsets" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        | date_diff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS days_to
        | FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey""",
    "q42_json" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        | FROM events WHERE event_id <= 200 ORDER BY event_id""",
    "q43_array_fns" ->
      """SELECT c_custkey,
        | CAST(len(string_split(c_name, '0')) AS BIGINT) AS n_parts,
        | array_to_string(list_slice(string_split(c_name, '0'), 1, 3), '|') AS first3,
        | array_to_string(list_sort(list_distinct(string_split(c_name, '0'))), '|') AS uniq,
        | list_contains(string_split(c_name, '0'), '1') AS has_one
        | FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""",
    "q44_misc_scalars" ->
      """SELECT l_orderkey, l_linenumber,
        | ROUND(LEAST(l_quantity, l_extendedprice / 1000) + 1e-9, 4) AS lo,
        | ROUND(GREATEST(l_discount, l_tax) + 1e-9, 4) AS hi,
        | CAST(SIGN(l_discount - 0.05) AS BIGINT) AS sgn,
        | ROUND(LN(l_quantity + 1) + 1e-9, 4) AS ln_q,
        | ROUND(EXP(l_discount) + 1e-9, 4) AS exp_d,
        | ROUND(LOG10(l_extendedprice) + 1e-9, 4) AS log_p,
        | CAST(FLOOR(l_quantity / 7) AS BIGINT) AS q7
        | FROM lineitem WHERE l_orderkey <= 80
        | ORDER BY l_orderkey, l_linenumber, lo, hi, sgn, ln_q, exp_d, log_p, q7""",
    "q45_bit_ops" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(l_linenumber & 3 AS BIGINT) AS band,
        | CAST(xor(l_linenumber, 5) AS BIGINT) AS x5,
        | CAST(l_linenumber << 2 AS BIGINT) AS shl,
        | CAST(l_linenumber | 8 AS BIGINT) AS orr
        | FROM lineitem WHERE l_orderkey <= 40
        | ORDER BY l_orderkey, l_linenumber, band, x5, shl, orr""",
    "q46_time_parts" ->
      """SELECT event_id,
        | CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h,
        | CAST(EXTRACT(MINUTE FROM ts) AS BIGINT) AS mi,
        | CAST(EXTRACT(SECOND FROM ts) AS BIGINT) AS sec,
        | CAST(EXTRACT(DOW FROM ts) AS BIGINT) AS dow,
        | CAST(EXTRACT(DOY FROM ts) AS BIGINT) AS doy
        | FROM events WHERE event_id <= 300 ORDER BY event_id""",
    "q47_window_dist" ->
      """SELECT c_custkey,
        | CAST(ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS BIGINT) AS quartile,
        | ROUND(percent_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey), 6) AS pr,
        | ROUND(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey), 6) AS cd,
        | CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) AS BIGINT) AS dr
        | FROM customer WHERE c_custkey <= 400 ORDER BY c_custkey""",
    "q48_string_fns2" ->
      """SELECT c_custkey,
        | lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        | rpad(c_mktsegment, 12, '.') AS rpadded,
        | trim(rpad(c_mktsegment, 12, ' ')) AS trimmed,
        | replace(c_name, 'Customer', 'C') AS replaced,
        | reverse(c_mktsegment) AS rev,
        | split_part(c_name, '#', 2) AS num_part
        | FROM customer WHERE c_custkey <= 60 ORDER BY c_custkey""",
    "q49_map_fns" ->
      """SELECT event_id,
        | array_to_string(json_keys(props), ',') AS ks,
        | CAST(json_array_length(json_keys(props)) AS BIGINT) AS nk,
        | CAST(props->>'$.k' AS BIGINT) + 1 AS kv1
        | FROM events WHERE event_id <= 150 ORDER BY event_id""",
    "q50_lateral" ->
      """SELECT r.r_name, l.n_name FROM region r,
        | LATERAL (SELECT n.n_name FROM nation n
        |   WHERE n.n_regionkey = r.r_regionkey
        |   ORDER BY n.n_name LIMIT 2) l
        | ORDER BY r.r_name, l.n_name""",
    "q51_percentiles" ->
      """SELECT l_returnflag,
        | ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
        | ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
        | ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90,
        | ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med_price
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q52_range_frame" ->
      """SELECT event_id,
        | ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
        |   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4)
        |   AS rolling_1h
        | FROM events WHERE event_id <= 5000 ORDER BY event_id""",
    "q53_nav_window" ->
      """SELECT event_id,
        | ROUND(FIRST_VALUE(value) OVER w, 4) AS first_v,
        | ROUND(LAST_VALUE(value) OVER w, 4) AS last_v,
        | ROUND(NTH_VALUE(value, 3) OVER w, 4) AS third_v
        | FROM events WHERE event_id <= 5000
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        | ORDER BY event_id""",
    "q54_exists_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer c
        | WHERE EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_custkey = c.c_custkey
        |     AND o.o_totalprice > c.c_acctbal * 10)
        |   AND NOT EXISTS (SELECT 1 FROM orders o2
        |   WHERE o2.o_custkey = c.c_custkey
        |     AND o2.o_orderstatus = 'F' AND o2.o_totalprice < 5000)
        | ORDER BY c_custkey""",
    "q55_not_in_nulls" ->
      """SELECT o_orderkey FROM orders
        | WHERE CASE WHEN o_totalprice < 1000 THEN NULL ELSE o_custkey END
        |   NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        | ORDER BY o_orderkey""",
    "q56_regr_agg" ->
      """SELECT l_returnflag,
        | CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
        | ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        | ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        | ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q57_ignore_nulls" ->
      """WITH e AS (SELECT event_id, user_id, ts,
        |   CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        |  FROM events WHERE event_id <= 3000)
        | SELECT event_id,
        | ROUND(LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS last_nn,
        | ROUND(LEAD(v, 1 IGNORE NULLS) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id), 4) AS next_nn
        | FROM e ORDER BY event_id""",
    "q58_except_all" ->
      """WITH o AS (SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
        |  c AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
        |  ex AS (SELECT k FROM o EXCEPT ALL SELECT k FROM c),
        |  ix AS (SELECT k FROM o INTERSECT ALL SELECT k FROM c)
        | SELECT 'except' AS op, k FROM ex
        | UNION ALL SELECT 'intersect' AS op, k FROM ix
        | ORDER BY op, k""",
    "q59_ntile" ->
      """WITH d AS (SELECT o_totalprice,
        |   NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders)
        | SELECT decile, COUNT(*) AS n,
        | ROUND(MIN(o_totalprice), 2) AS lo,
        | ROUND(MAX(o_totalprice), 2) AS hi,
        | ROUND(MEDIAN(o_totalprice) + 1e-9, 2) AS med
        | FROM d GROUP BY decile ORDER BY decile""",
    "q60_sessionize" ->
      """WITH g AS (SELECT user_id, ts, value,
        |   CASE WHEN lag(ts) OVER w IS NULL
        |     OR ts - lag(ts) OVER w >= INTERVAL 6 HOUR THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        | s AS (SELECT user_id, ts, value,
        |   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
        |     ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        | SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 6 HOUR AS session_end,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 4) AS value_sum
        | FROM s GROUP BY user_id, sid
        | ORDER BY user_id, session_start""",
    "q61_recursive_spine" ->
      """WITH RECURSIVE spine(mo) AS (
        | SELECT CAST('1994-10-01' AS TIMESTAMP)
        | UNION ALL
        | SELECT mo + INTERVAL 1 MONTH FROM spine
        |  WHERE mo < CAST('2001-11-01' AS TIMESTAMP))
        | SELECT s.mo, COUNT(o.o_orderkey) AS n_orders,
        |  ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS revenue
        | FROM spine s LEFT JOIN orders o
        |   ON date_trunc('month', o.o_orderdate) = s.mo
        | GROUP BY s.mo ORDER BY s.mo""",
    "q62_upsert" ->
      """WITH changes AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 7),
        | merged AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
        |  UNION ALL SELECT * FROM changes)
        | SELECT o_orderkey, o_custkey, o_orderstatus,
        |  ROUND(o_totalprice, 2) AS total
        | FROM merged ORDER BY o_orderkey""",
    "q63_scd2" ->
      """WITH hist AS (SELECT c_custkey AS k, c_name AS nm, c_acctbal AS bal,
        |   CAST('2020-01-01' AS TIMESTAMP) AS valid_from,
        |   CAST(NULL AS TIMESTAMP) AS valid_to FROM customer),
        | snap AS (
        |  SELECT c_custkey AS k, c_name AS nm,
        |   CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1000
        |        ELSE c_acctbal END AS bal
        |  FROM customer WHERE c_custkey % 13 <> 0
        |  UNION ALL
        |  SELECT -c_custkey - 1, c_name, -5.0
        |  FROM customer WHERE c_custkey % 11 = 0),
        | j AS (SELECT h.k AS hk, h.nm AS hnm, h.bal AS hbal,
        |   h.valid_from AS hvf, s.k AS sk, s.nm AS snm, s.bal AS sbal,
        |   h.k IS NOT NULL AS ph, s.k IS NOT NULL AS ps
        |  FROM hist h FULL OUTER JOIN snap s ON h.k = s.k),
        | ch AS (SELECT *, ph AND ps AND (hnm IS DISTINCT FROM snm
        |   OR hbal IS DISTINCT FROM sbal) AS changed FROM j)
        | SELECT k, nm, ROUND(bal, 2) AS bal, valid_from, valid_to FROM (
        |  SELECT hk AS k, hnm AS nm, hbal AS bal, hvf AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM ch WHERE ph AND ps AND NOT changed
        |  UNION ALL
        |  SELECT hk, hnm, hbal, hvf, CAST('2021-06-01' AS TIMESTAMP)
        |  FROM ch WHERE ph AND (changed OR NOT ps)
        |  UNION ALL
        |  SELECT sk, snm, sbal, CAST('2021-06-01' AS TIMESTAMP),
        |    CAST(NULL AS TIMESTAMP)
        |  FROM ch WHERE ps AND (changed OR NOT ph))
        | ORDER BY k, valid_from, bal""",
    "q64_posexplode" ->
      """SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, tok FROM (
        |  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos
        |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS l
        |        FROM documents WHERE doc_id < 50))
        | ORDER BY doc_id, pos""",
    "q65_hopping_window" ->
      """SELECT g.s AS win_start, COUNT(*) AS n,
        |  ROUND(SUM(e.value), 2) AS val_sum
        | FROM events e
        | JOIN generate_series(TIMESTAMP '2023-12-31 23:00:00',
        |    TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 HOUR) g(s)
        |  ON e.ts >= g.s AND e.ts < g.s + INTERVAL 2 HOUR
        | GROUP BY g.s ORDER BY g.s""",
    "q66_quality" ->
      """SELECT 'o_custkey_not_null' AS "check",
        |  CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
        |    AS violations FROM orders
        | UNION ALL
        | SELECT 'o_custkey_ref', CAST((SELECT COUNT(*) FROM orders o
        |   LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |   WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) AS BIGINT)
        | UNION ALL
        | SELECT 'o_orderkey_unique',
        |  CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
        |    AS BIGINT)
        | UNION ALL
        | SELECT 'o_status_domain',
        |  CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL
        |    OR o_orderstatus NOT IN ('O','F','P')) AS BIGINT) FROM orders
        | UNION ALL
        | SELECT 'o_totalprice_range',
        |  CAST(COUNT(*) FILTER (WHERE o_totalprice < 0
        |    OR o_totalprice > 300000) AS BIGINT) FROM orders
        | ORDER BY "check"""",
    "q67_mode" ->
      """WITH c AS (SELECT l_returnflag AS g, l_quantity AS v, COUNT(*) AS cnt
        |   FROM lineitem GROUP BY l_returnflag, l_quantity),
        | m AS (SELECT g, v, cnt, MAX(cnt) OVER (PARTITION BY g) AS mx FROM c)
        | SELECT g, ROUND(MIN(CASE WHEN cnt = mx THEN v END), 2) AS mode_v,
        |  CAST(mx AS BIGINT) AS mode_n
        | FROM m GROUP BY g, mx ORDER BY g""",
    "q68_snapshot_diff" ->
      """WITH before AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |   o_totalprice FROM orders),
        | changes AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice
        |  FROM orders WHERE o_orderkey % 100 = 7),
        | after AS (
        |  SELECT * FROM before
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changes)
        |  UNION ALL SELECT * FROM changes)
        | SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'added'
        |       WHEN a.o_orderkey IS NULL THEN 'removed'
        |       WHEN b.o_custkey IS DISTINCT FROM a.o_custkey
        |         OR b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
        |         OR b.o_totalprice IS DISTINCT FROM a.o_totalprice
        |         THEN 'changed' END AS change
        | FROM before b FULL OUTER JOIN after a ON b.o_orderkey = a.o_orderkey
        | WHERE CASE WHEN b.o_orderkey IS NULL THEN 'added'
        |       WHEN a.o_orderkey IS NULL THEN 'removed'
        |       WHEN b.o_custkey IS DISTINCT FROM a.o_custkey
        |         OR b.o_orderstatus IS DISTINCT FROM a.o_orderstatus
        |         OR b.o_totalprice IS DISTINCT FROM a.o_totalprice
        |         THEN 'changed' END IS NOT NULL
        | ORDER BY o_orderkey""",
    "q69_try_cast" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
        |  TRY_CAST(event_type AS BIGINT) AS et_int,
        |  TRY_CAST(CASE WHEN event_id % 3 = 0 THEN 'n/a'
        |    ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS mixed
        | FROM events WHERE event_id <= 300 ORDER BY event_id""",
    "q70_interpolate" ->
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h, AVG(value) AS v
        |  FROM events WHERE user_id < 50 GROUP BY user_id, date_trunc('hour', ts)),
        | spans AS (SELECT user_id, MIN(h) AS hmin, MAX(h) AS hmax
        |   FROM hourly GROUP BY user_id),
        | spine AS (SELECT user_id,
        |   UNNEST(generate_series(hmin, hmax, INTERVAL 1 HOUR)) AS h FROM spans),
        | joined AS (SELECT s.user_id, s.h, o.v FROM spine s
        |   LEFT JOIN hourly o ON s.user_id = o.user_id AND s.h = o.h),
        | marked AS (SELECT user_id, h, v,
        |   LAST_VALUE(v IGNORE NULLS) OVER w AS pv,
        |   LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w AS ph,
        |   FIRST_VALUE(v IGNORE NULLS) OVER w2 AS nv,
        |   FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER w2 AS nh
        |  FROM joined
        |  WINDOW w AS (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |   w2 AS (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        | SELECT user_id, h,
        |  FLOOR((CASE WHEN v IS NOT NULL THEN v
        |   WHEN pv IS NULL THEN nv
        |   WHEN nv IS NULL THEN pv
        |   ELSE pv + (nv - pv) * (CAST(epoch(h) - epoch(ph) AS DOUBLE)
        |     / CAST(epoch(nh) - epoch(ph) AS DOUBLE)) END) * 10000) / 10000 AS val,
        |  CAST(CASE WHEN v IS NOT NULL THEN 0 ELSE 1 END AS BIGINT) AS filled
        | FROM marked ORDER BY user_id, h""",
    "q71_width_bucket" ->
      """SELECT CASE WHEN o_totalprice < 0.0 THEN 0
        |   WHEN o_totalprice >= 500000.0 THEN 11
        |   ELSE CAST(FLOOR(10 * (o_totalprice - 0.0) / (500000.0 - 0.0))
        |     AS BIGINT) + 1 END AS bucket,
        |  COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
        | FROM orders GROUP BY 1 ORDER BY bucket""",
    "q72_bool_agg" ->
      """SELECT o_orderpriority,
        |  CAST(CAST(bool_and(o_totalprice > 5000) AS INT) AS BIGINT) AS all_over_5k,
        |  CAST(CAST(bool_or(o_orderstatus = 'P') AS INT) AS BIGINT) AS any_pending,
        |  CAST(COUNT(*) FILTER (WHERE o_totalprice > 300000) AS BIGINT) AS n_big
        | FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q73_corr_covar" ->
      """SELECT l_returnflag,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS qp_corr,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS qp_covs,
        |  ROUND(covar_pop(l_quantity, l_discount), 6) AS qd_covp
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q74_decimal" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS dec_sum,
        |  ROUND(CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4)
        |    AS dec_avg,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(3 AS DECIMAL(3,0)))
        |    AS DOUBLE) AS dec_sum3x
        | FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q75_array_setops" ->
      """WITH dt AS (
        |  SELECT doc_id,
        |   list_sort(list_distinct(str_split_regex(trim(text), '\s+'))) AS toks
        |  FROM documents WHERE doc_id < 31)
        | SELECT a.doc_id,
        |  COALESCE(array_to_string(list_sort(list_intersect(a.toks, b.toks)), ' '),
        |    '') AS inter_s,
        |  COALESCE(array_to_string(list_sort(
        |    list_filter(a.toks, x -> NOT list_contains(b.toks, x))), ' '),
        |    '') AS except_s,
        |  CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS BIGINT) AS union_n
        | FROM dt a JOIN dt b ON b.doc_id = a.doc_id + 1
        | ORDER BY a.doc_id""",
    "q76_like_escape" ->
      """WITH c AS (SELECT c_custkey, replace(c_name, '#', '_') AS uname,
        |   c_mktsegment FROM customer WHERE c_custkey < 400)
        | SELECT c_custkey,
        |  CAST(CASE WHEN uname LIKE 'Customer#_0000001%' ESCAPE '#'
        |    THEN 1 ELSE 0 END AS BIGINT) AS esc_hit,
        |  CAST(CASE WHEN c_mktsegment ILIKE 'bUiLd%' THEN 1 ELSE 0 END
        |    AS BIGINT) AS ilike_hit,
        |  CAST(CASE WHEN uname NOT LIKE '%9' THEN 1 ELSE 0 END
        |    AS BIGINT) AS notlike_hit
        | FROM c ORDER BY c_custkey""",
    "q77_outliers" ->
      """WITH v AS (
        |  SELECT event_type AS g, event_id,
        |   value * CASE WHEN event_id % 97 = 0 THEN 20.0 ELSE 1.0 END AS x
        |  FROM events),
        | stats AS (SELECT g, median(x) AS med, mad(x) AS madv FROM v GROUP BY g)
        | SELECT v.g,
        |  CAST(COUNT(*) FILTER (WHERE abs(v.x - s.med) > 5 * s.madv) AS BIGINT)
        |    AS n_outliers,
        |  COUNT(*) AS n, ROUND(s.med, 4) AS med, ROUND(s.madv, 4) AS madv
        | FROM v JOIN stats s ON v.g = s.g
        | GROUP BY v.g, s.med, s.madv ORDER BY v.g""",
    "q78_variant" ->
      """SELECT event_id,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_big,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') AS gone
        | FROM events WHERE event_id <= 500 ORDER BY event_id""",
    "q79_timezone" ->
      """WITH sh AS (SELECT event_id,
        |   ts + (event_id % 180) * INTERVAL 1 DAY AS st
        |  FROM events WHERE event_id <= 400)
        | SELECT event_id,
        |  st AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York' AS ny_wall,
        |  st AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo' AS tokyo_wall,
        |  CAST(EXTRACT(HOUR FROM st AT TIME ZONE 'UTC'
        |    AT TIME ZONE 'America/New_York') AS BIGINT) AS ny_hour
        | FROM sh ORDER BY event_id""",
    "q80_graph_reach" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT o_custkey AS src, o_orderkey % 1500 AS dst
        |  FROM orders WHERE o_orderkey % 7 = 0),
        | reach2(seed, node, depth) AS (
        |  SELECT src, src, 0 FROM (SELECT DISTINCT src FROM e WHERE src < 40) s
        |  UNION ALL
        |  SELECT r.seed, e2.dst, r.depth + 2
        |  FROM reach2 r
        |  JOIN e e1 ON e1.src = r.node
        |  JOIN e e2 ON e2.src = e1.dst
        |  WHERE r.depth + 2 <= 3),
        | reach AS (
        |  SELECT seed, node, depth FROM reach2
        |  UNION ALL
        |  SELECT r.seed, e.dst, r.depth + 1
        |  FROM reach2 r JOIN e ON e.src = r.node
        |  WHERE r.depth + 1 <= 3)
        | SELECT seed, COUNT(DISTINCT node) AS n_reach,
        |  CAST(MAX(depth) AS BIGINT) AS max_depth
        | FROM reach GROUP BY seed ORDER BY seed""",
    "q81_incremental_agg" ->
      """SELECT o_custkey % 100 AS g, COUNT(*) AS cnt,
        |  ROUND(SUM(o_totalprice), 2) AS sum_p,
        |  ROUND(MIN(o_totalprice), 2) AS min_p,
        |  ROUND(MAX(o_totalprice), 2) AS max_p,
        |  ROUND(SUM(o_totalprice) / COUNT(*), 4) AS mean_p
        | FROM orders GROUP BY o_custkey % 100 ORDER BY g""",
    "q82_float_edges" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g, l_orderkey AS id,
        |   CASE WHEN l_orderkey % 7 = 0 THEN CAST('NaN' AS DOUBLE)
        |        WHEN l_orderkey % 11 = 0 THEN CAST('Infinity' AS DOUBLE)
        |        WHEN l_orderkey % 13 = 0 THEN CAST('-Infinity' AS DOUBLE)
        |        ELSE l_quantity END AS v
        |  FROM lineitem)
        | SELECT g, COUNT(*) AS cnt,
        |  CAST(COUNT(*) FILTER (WHERE isnan(v)) AS BIGINT) AS n_nan,
        |  CAST(COUNT(*) FILTER (WHERE v = CAST('Infinity' AS DOUBLE)) AS BIGINT)
        |    AS n_pinf,
        |  CAST(COUNT(*) FILTER (WHERE v = CAST('-Infinity' AS DOUBLE)) AS BIGINT)
        |    AS n_ninf,
        |  ROUND(MAX(v) FILTER (WHERE NOT isnan(v)
        |    AND v <> CAST('Infinity' AS DOUBLE)), 2) AS max_finite,
        |  CAST(COUNT(*) FILTER (WHERE isnan(greatest(v, CAST('Infinity' AS DOUBLE))))
        |    AS BIGINT) AS n_nan_above_inf,
        |  CAST(COUNT(*) FILTER (WHERE v / 0.0 IS NULL) AS BIGINT) AS n_div0_null
        | FROM v GROUP BY g ORDER BY g""",
    "q83_pit_lookup" ->
      """WITH hist AS (
        |  SELECT c_custkey AS k, TIMESTAMP '1992-01-01 00:00:00' AS vfrom,
        |    TIMESTAMP '1995-06-01 00:00:00' AS vto, ROUND(c_acctbal, 2) AS bal
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, TIMESTAMP '1995-06-01 00:00:00',
        |    NULL, ROUND(c_acctbal + 1000, 2)
        |  FROM customer)
        | SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS y,
        |  COUNT(*) AS n, ROUND(SUM(h.bal), 2) AS bal_sum
        | FROM orders o JOIN hist h
        |  ON o.o_custkey = h.k AND o.o_orderdate >= h.vfrom
        |   AND (h.vto IS NULL OR o.o_orderdate < h.vto)
        | GROUP BY EXTRACT(YEAR FROM o.o_orderdate) ORDER BY y""",
    "q84_bit_agg" ->
      """SELECT l_returnflag,
        |  CAST(bit_and(l_orderkey) AS BIGINT) AS and_key,
        |  CAST(bit_or(l_linenumber) AS BIGINT) AS or_line,
        |  CAST(bit_xor(l_partkey) AS BIGINT) AS xor_part
        | FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q85_struct" ->
      """SELECT c_mktsegment,
        |  m.bal AS min_bal, CAST(m.key AS BIGINT) AS min_key,
        |  x.bal AS max_bal, CAST(x.key AS BIGINT) AS max_key
        | FROM (
        |  SELECT c_mktsegment,
        |   min({'bal': ROUND(c_acctbal, 2), 'key': c_custkey}) AS m,
        |   max({'bal': ROUND(c_acctbal, 2), 'key': c_custkey}) AS x
        |  FROM customer GROUP BY c_mktsegment)
        | ORDER BY c_mktsegment""",
    "q86_rollup_avg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        |  ROUND(AVG(l_quantity) + 1e-9, 2) AS avg_qty,
        |  ROUND(AVG(l_extendedprice) + 1e-9, 2) AS avg_price,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty
        | FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        | ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
  ).map { case (k, v) => k -> v.stripMargin.replaceAll("\\s+", " ").trim }
}
