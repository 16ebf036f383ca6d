package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.5, R2–R12 + R15).
  *
  * The reference gets these "for free" from its linked Flink SQL planner
  * (reference: pom.xml:135-140, flink-table-planner-loader); we expose the
  * same surface through Catalyst built-ins — every query here is plain
  * DataFrame DSL, so predicate pushdown, column pruning, join selection
  * (broadcast vs sort-merge via CBO/AQE) and partial aggregation come from
  * the optimizer, not hand-scheduling.
  *
  * Determinism conventions (oracle hash-compare):
  *  - every computed column is aliased identically in DSL and oracle SQL;
  *  - money sums go through DECIMAL(18,2) so Spark and DuckDB aggregate
  *    exactly (double summation order would differ), but the FINAL column is
  *    cast to double: decimal output columns surface as decimal.Decimal
  *    objects on one side of the driver's pandas compare and float64 on the
  *    other, which hash-mismatches even when values are identical. The
  *    unscaled sums stay far below 2^53, so the one decimal→double cast is
  *    exact and bit-identical across engines;
  *  - every query ends in an ORDER BY on a unique key (harness requirement,
  *    not part of the operator semantics).
  *
  * Scale notes are per-operator below; the trailing orderBy is the only
  * global exchange in most of them.
  */
object Relational {

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** R2: predicate pushdown scan — BETWEEN + comparison + IN, projected to
    * 5 of 11 lineitem columns. `.explain` must show PushedFilters and a
    * pruned ReadSchema; no shuffle except the determinism sort.
    */
  def filterScan(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate").between("1996-01-01", "1997-12-31")
        && col("l_quantity") > 45
        && col("l_returnflag").isin("R", "A"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")

  /** R10 [EXT]: grouped aggregation, TPC-H Q1 shape — hash partial+final agg
    * on low-cardinality keys. avg is computed as exact-sum / count (quantity
    * is integer-valued) so both engines get the identical double.
    */
  def aggBasic(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        sum(dec("l_extendedprice")).cast("double").as("sum_price"),
        (sum("l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  /** [EXT]: distinct aggregation — Catalyst plans count(distinct) via
    * two-stage expand + partial agg; stays parallel.
    */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** R3: equi inner join orders ⋈ customer. customer is the dimension side —
    * at bench scale Catalyst broadcast-joins it automatically (≤ 10 MB);
    * at 100 TB AQE picks broadcast vs sort-merge from runtime stats, which
    * is exactly the decision we want made per-run, not hardcoded.
    */
  def joinInner(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
      .orderBy("o_orderkey")

  /** R4: left outer join + aggregate — customers with zero orders kept
    * (count of a null fact column → 0, sum → NULL).
    */
  def joinOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy("c_custkey", "c_name")
      .agg(count(col("o_orderkey")).as("n_orders"),
        sum(dec("o_totalprice")).cast("double").as("spend"))
      .orderBy("c_custkey")

  /** R5: semi + anti join — customers having a finished high-value order
    * (left_semi) and customers with no orders at all (left_anti), tagged and
    * unioned. Semi/anti never duplicate the left side — no fact-side blowup.
    */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val customer = Tables.customer(spark, dir)
    val orders   = Tables.orders(spark, dir)
    val semi = customer
      .join(orders.filter(col("o_orderstatus") === "F" && col("o_totalprice") > 200000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), lit("semi").as("how"))
    val anti = customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), lit("anti").as("how"))
    semi.unionAll(anti).orderBy("how", "c_custkey")
  }

  /** R6: multi-way star join — lineitem → orders → customer → nation →
    * region, revenue per region/nation. nation/region are genuinely tiny at
    * ANY scale → explicit broadcast hint; the lineitem⋈orders spine is the
    * one real shuffle. Revenue in exact decimals end-to-end.
    */
  def joinStar(spark: SparkSession, dir: String): DataFrame = {
    val revenue = dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))
    // Pre-aggregate the fact table by its join key BEFORE the join spine:
    // the shuffle then carries one narrow row per order instead of every
    // lineitem (Catalyst does not push aggregates through joins itself).
    // At 100 TB this is the difference between shuffling the whole fact
    // table and shuffling ~|orders| summary rows.
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(revenue).as("o_rev"), count(lit(1)).as("o_items"))
    perOrder
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("o_rev")).cast("double").as("revenue"), sum(col("o_items")).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** R8: top-k — Spark plans orderBy+limit as TakeOrderedAndProject
    * (per-partition heap + driver merge of k rows), never a full global
    * sort. Tie-broken on the key for determinism.
    */
  def topk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(dec("o_totalprice")).cast("double").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(10)

  /** R9: union / intersect / except over two customer-key sets (customers
    * with a finished order vs the BUILDING segment), each branch tagged.
    * Spark set ops plan as aggregates/joins on the key — parallel.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val withF = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("k")).distinct()
    val building = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    def tag(df: DataFrame, t: String) = df.select(col("k"), lit(t).as("op"))
    tag(withF.union(building).distinct(), "union")
      .unionAll(tag(withF.intersect(building), "intersect"))
      .unionAll(tag(withF.except(building), "except"))
      .orderBy("op", "k")
  }

  /** R11: rollup — subtotals per (flag, status), per flag, and grand total.
    * Rollup NULLs are folded to 'ALL' on both sides so NULL-ordering
    * differences between engines can't bite. Catalyst plans rollup as a
    * single Expand + hash agg — one shuffle.
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy("flag", "status")

  /** R11 completion: explicit GROUPING SETS — the general form rollup/cube
    * specialize. Per-flag and per-status subtotals in ONE pass: Catalyst
    * plans the sets as a single Expand (one row copy per set) + hash agg,
    * exactly like rollup, so the shuffle still carries only the expanded
    * group keys. NULLs from non-member columns folded to 'ALL' as in
    * [[rollupAgg]] to dodge engine NULL-ordering differences.
    */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy("flag", "status")

  /** R6 companion: part/supplier analytics — revenue per part brand ×
    * supplier nation (TPC-H Q2/Q5 family), the first join family a TPC-H
    * user reaches for. The p_size predicate pushes to the part scan;
    * nation is genuinely constant-size → explicit broadcast; part and
    * supplier SCALE WITH SF, so their join strategy is left to AQE
    * (broadcast at bench scale, shuffle join at 100 TB) rather than
    * hardcoded — same policy as [[joinInner]].
    */
  def partSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir).filter(col("p_size") <= 25),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy("p_brand", "n_name")
      .agg(sum(revenue).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      .orderBy("p_brand", "n_name")
  }

  /** R11 companion: cube — all 2^k grouping-set combinations (rollup's
    * superset). ADDITIVE aggregates (count/sum) distribute over grouping
    * sets, so the cube runs over a per-(flag,status) PRE-AGGREGATE —
    * Catalyst's Expand then multiplies a handful of summary rows by 2^k
    * instead of the whole fact table (600k × 4 rows → 6 × 4 at sf0.1;
    * measured 1.3 s → ~0.3 s). Non-additive aggregates (distinct counts,
    * percentiles) cannot use this rewrite.
    */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("_n"), sum(dec("l_extendedprice")).as("_sp"))
      .cube("l_returnflag", "l_linestatus")
      .agg(sum(col("_n")).as("n"), sum(col("_sp")).cast("double").as("sum_price"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_price"))
      .orderBy("flag", "status")

  /** R12: analytic window functions — per-customer order ranking
    * (row_number), lag, and a running decimal sum with an explicit ROWS
    * frame; top-3 per customer kept. Shuffle key = o_custkey → parallel.
    */
  def winRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev_price", lag("o_totalprice", 1).over(w))
      .withColumn("run_spend", sum(dec("o_totalprice"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice", "prev_price", "run_spend")
      .orderBy("o_custkey", "rn")
  }

  /** [EXT] pivot — orders count+revenue per year pivoted on order status.
    * Spark's `pivot` with explicit values plans a single hash agg with
    * conditional aggregates (one shuffle, no transpose step); the oracle
    * expresses the same thing with FILTER clauses. Explicit value list
    * matters at scale: without it Spark first runs a distinct scan to
    * discover pivot columns. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(dec("o_totalprice")))
      .select(col("yr"),
        col("F").cast("double").as("F"),
        col("O").cast("double").as("O"),
        col("P").cast("double").as("P"))
      .orderBy("yr")

  /** Macro query (TPC-H Q3 shape): selective dimension filter + 3-way join
    * + aggregation + top-k in ONE plan — the realistic multi-operator
    * pipeline the per-operator keys exercise in isolation. Scale shape:
    * all three predicates push to their scans; the shipped-late fact rows
    * pre-aggregate per order BEFORE the join spine (the [[joinStar]]
    * discipline — the one wide shuffle carries one narrow row per order,
    * not every lineitem), the filtered orders/customer sides join onto the
    * summaries (broadcast at bench scale, AQE's call at 100 TB), and the
    * final top-10 plans as TakeOrderedAndProject (per-partition heaps +
    * driver merge of k rows), never a global sort. After the per-order
    * pre-aggregate each order is a single row, so no second aggregation is
    * needed — the joins are 1:1 enrichment.
    */
  def starTopk(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1995-03-15"
    val revenue = dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))
    val perOrder = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > cutoff)
      .groupBy("l_orderkey")
      .agg(sum(revenue).as("rev"), count(lit(1)).as("n_items"))
    perOrder
      .join(Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("rev").cast("double").as("revenue"),
        col("n_items"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Quantity floor for [[largeOrderTopk]] — interpolated into the oracle
    * SQL (single source of truth). */
  val LargeOrderQty = 200

  /** Macro query (TPC-H Q18 shape): full-fact aggregation + HAVING + join
    * spine + top-k — the complement of [[starTopk]]'s plan discipline.
    * Q3 prunes the fact with filtered DIMS; Q18 inverts it: the fact
    * pre-aggregates per order first (the only corpus-wide shuffle, with
    * map-side partial sums), the HAVING collapses it to the rare
    * large-quantity orders, and THAT small survivor set drives the joins —
    * at 100 TB the filtered aggregate (≈0.006 % of orders at this
    * threshold) is the broadcast build side against the full orders and
    * customer tables, so neither dimension ever shuffles. Quantities sum
    * as DECIMAL (exact, order-independent — safe to hash-compare), and
    * the top-100 plans as TakeOrderedAndProject.
    */
  def largeOrderTopk(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(dec("l_quantity")).as("qty"), count(lit(1)).as("n_items"))
      .filter(col("qty") > LargeOrderQty)
    broadcast(perOrder)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("qty").cast("double").as("total_qty"), col("n_items"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** R15 / E1-exact: deduplication — keep the EARLIEST event per
    * (user_id, event_type), expressed as row_number over a keyed window
    * (deterministic, unlike dropDuplicates which keeps an arbitrary row).
    * Shuffle key = the dedup key → parallel; this is the same shape used
    * for exact document dedup at 100 TB.
    */
  def dedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts")
      .orderBy("user_id", "event_type")
  }
}
