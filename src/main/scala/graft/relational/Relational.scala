package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational analytics over the TPC-H-shaped tables — the engine's
  * general aggregation/join surface beyond the counter pipeline (the
  * training-data side of the house uses the same shapes for metadata
  * joins: document ↔ source manifests ↔ license tables).
  *
  * Money columns arrive as DOUBLE; to make results engine-exact the
  * queries do all arithmetic in scaled-integer space with the IDENTICAL
  * expression on both engines (`floor(x·100)` cents — same IEEE multiply,
  * same floor, then exact integer sums), never summing raw doubles
  * (double-sum results depend on partitioning order).
  *
  * Plan shapes to preserve at scale:
  *  - filters on scan columns (`l_shipdate`, `o_orderdate`,
  *    `c_mktsegment`, `r_name`) sit in WHERE position → Catalyst pushes
  *    them into the parquet scan (`PushedFilters`);
  *  - dimension tables (`region`, `nation`) broadcast explicitly; the
  *    fact-fact joins (`orders` ⋈ `lineitem`) shuffle on the join key and
  *    AQE handles skew/size at runtime;
  *  - aggregations are map-side combinable (integer sums + counts).
  */
object Relational {

  /** Exact cents: floor(x·100) — identical IEEE double op on both engines,
    * then integer arithmetic only.
    */
  private def cents(c: Column): Column = floor(c * 100).cast("long")

  /** TPC-H Q1 shape (pricing summary): per (returnflag, linestatus) over
    * shipped-before-cutoff lines — quantities, base cents, discounted
    * cents·pct, line count. One scan, one small-group aggregate.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-07-01"): DataFrame =
    lineitem
      .where(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("sum_disc_cpct"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3 shape (shipping priority): top-`k` open orders by revenue
    * for one market segment. The segment-filtered customer keys join into
    * orders, orders into lineitem (both equi-joins; AQE sizes them), and
    * the top-k is an `orderBy(...).limit(k)` → `TakeOrderedAndProject`
    * (per-partition heaps, no global sort). Ties break on orderkey so the
    * selected set is deterministic.
    */
  def topOrdersByRevenue(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                         segment: String = "BUILDING", date: String = "1998-01-01",
                         k: Int = 10): DataFrame = {
    val cut = lit(date).cast("timestamp")
    val revenue = sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
    customer.where(col("c_mktsegment") === segment).select(col("c_custkey"))
      .join(orders.where(col("o_orderdate") < cut), col("c_custkey") === col("o_custkey"))
      .join(lineitem.where(col("l_shipdate") > cut), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(revenue.as("revenue_cpct"))
      .select(col("o_orderkey").as("orderkey"),
        // o_orderdate is TIMESTAMP_NTZ in parquet; UTC session makes the
        // cast ≡ DuckDB's epoch_ms of the naive timestamp
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_date_ms"),
        col("revenue_cpct"))
      .orderBy(col("revenue_cpct").desc, col("orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q9-ish shape (profit by supplier nation and brand): lineitem
    * joined to its part (filtered by type) and supplier, profit =
    * revenue − cost-proxy, grouped by (supplier nation, brand). `part`
    * and `supplier` are dimension-sized → explicit broadcast; the fact
    * scan streams through both joins without a shuffle.
    */
  def brandProfit(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                  lineitem: DataFrame, pType: String = "PROMO"): DataFrame = {
    val profit = sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
    val parts = broadcast(part.where(col("p_type") === pType)
      .select(col("p_partkey"), col("p_brand")))
    val supps = broadcast(supplier
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    lineitem
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(supps, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("supp_nation"), col("p_brand"))
      .agg(profit.as("revenue_cpct"), count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q18 shape (large-volume orders): pre-aggregate the fact table
    * by orderkey (map-side combinable sum), filter ON THE AGGREGATE
    * (HAVING), and only then join — the join inputs are bounded by the
    * qualifying orders, not by lineitem size. The aggregate-then-join
    * order is the scale decision; joining first would shuffle the whole
    * fact table twice.
    */
  def largeOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  minQty: Long = 250): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("total_qty"))
      .where(col("total_qty") > minQty)
    orders.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_date_ms"),
        col("total_qty"))
  }

  /** TPC-H Q7 shape (volume shipping): revenue between two nations, by
    * direction and ship year. The supplier-side lookup is dimension-sized
    * → explicit broadcast prunes lineitem to the two nations' suppliers
    * early; the customer side is NOT broadcast (customer is fact-sized at
    * scale even after the 2-nation filter) — orders⋈customer shuffles on
    * custkey and AQE sizes it at runtime.
    */
  def volumeShipping(supplier: DataFrame, customer: DataFrame, nation: DataFrame,
                     orders: DataFrame, lineitem: DataFrame,
                     n1: String = "NATION_3", n2: String = "NATION_8"): DataFrame = {
    val rev = sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
    val nat = nation.select(col("n_nationkey"), col("n_name"))
    val supps = broadcast(supplier
      .join(nat, col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name").isin(n1, n2))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val custs = customer
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .where(col("n_name").isin(n1, n2))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .join(supps, col("l_suppkey") === col("s_suppkey"))
      .join(orders.join(custs, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .where((col("supp_nation") === n1 && col("cust_nation") === n2) ||
             (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(rev.as("revenue_cpct"), count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q14 shape (promo revenue share): one month's lineitem joined to
    * its (broadcast) part type, promo vs total revenue as a conditional
    * aggregate in ONE pass — no second scan, no self-join. The ratio is
    * integer ppm (`promo·10⁶ div total`, both engines' truncating BIGINT
    * division), so the oracle hash-matches exactly.
    */
  def promoRevenueShare(part: DataFrame, lineitem: DataFrame,
                        from: String = "1997-09-01",
                        until: String = "1997-10-01"): DataFrame = {
    val rev = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    // sums in DECIMAL(38,0): a month of cpct revenue can exceed a Long at
    // large SF (each line contributes ~1e9), and the ratio's ×10⁶ would
    // overflow well before that — DuckDB's BIGINT sums promote to HUGEINT,
    // so decimal is the Spark-side equivalent; `div` on decimals is the
    // same truncating integral division as DuckDB's `//`. The final casts
    // fail loudly on a true BIGINT overflow, exactly like DuckDB's
    // ::BIGINT cast.
    lineitem
      .where(col("l_shipdate") >= lit(from).cast("timestamp") &&
             col("l_shipdate") < lit(until).cast("timestamp"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L))
          .cast("decimal(38,0)")).as("promo_d"),
        sum(rev.cast("decimal(38,0)")).as("total_d"))
      .select(
        col("promo_d").cast("long").as("promo_cpct"),
        col("total_d").cast("long").as("total_cpct"),
        expr("(promo_d * 1000000) div total_d").as("promo_share_ppm"))
  }

  /** TPC-H Q4 shape (order priority with EXISTS): count orders per
    * priority that have at least one LATE line (shipped > 60 days after
    * the order date). The EXISTS compiles to a LEFT SEMI join — each
    * order contributes once no matter how many late lines, and the probe
    * side never duplicates rows (the plan property the Q4 rewrite exists
    * for).
    */
  def latePriority(orders: DataFrame, lineitem: DataFrame,
                   from: String = "1997-01-01",
                   until: String = "1997-07-01"): DataFrame =
    orders
      .where(col("o_orderdate") >= lit(from).cast("timestamp") &&
             col("o_orderdate") < lit(until).cast("timestamp"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  /** TPC-H Q5 shape (local revenue by nation): one region's per-nation
    * revenue for a date-bounded order year. `region` and `nation` are
    * genuinely tiny dimensions → explicit broadcast; customer/orders/
    * lineitem chain on their keys.
    */
  def regionRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    orders: DataFrame, lineitem: DataFrame,
                    regionName: String = "ASIA",
                    from: String = "1997-01-01", until: String = "1998-01-01"): DataFrame = {
    val revenue = sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
    val dims = broadcast(
      region.where(col("r_name") === regionName)
        .join(nation, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
    customer.join(dims, col("c_nationkey") === col("n_nationkey"))
      .join(orders.where(col("o_orderdate") >= lit(from).cast("timestamp") &&
        col("o_orderdate") < lit(until).cast("timestamp")),
        col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(revenue.as("revenue_cpct"))
  }

  /** TPC-H Q16 shape (supplier diversity): per (brand, size) the number of
    * DISTINCT suppliers shipping that part, excluding a supplier denylist
    * (negative account balance here; Q16's is a complaint list). The
    * denylist is a broadcast LEFT ANTI join — the NOT IN subquery
    * decorrelated to a join that never duplicates and streams the big
    * side. The distinct count is a real two-phase `count(DISTINCT)`
    * (Expand → partial → final), the scale-correct plan for counting
    * distinct keys inside groups.
    */
  def supplierDiversity(part: DataFrame, supplier: DataFrame,
                        lineitem: DataFrame,
                        excludeType: String = "PROMO"): DataFrame = {
    val denied = supplier.where(col("s_acctbal") < 0).select(col("s_suppkey"))
    lineitem
      .join(broadcast(denied), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part.where(col("p_type") =!= excludeType)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"))
  }

  /** TPC-H Q2 shape (min-cost supplier): for each part of one type, the
    * supplier(s) selling it at the part's minimum observed price. The
    * correlated `= (SELECT min(...) WHERE same part)` subquery is
    * decorrelated into aggregate-then-join: one per-part min aggregate,
    * then an equi-join back on (partkey, price). Both the min side and
    * the detail side shuffle on `l_partkey` only — the same exchange,
    * which AQE/exchange-reuse can share. DISTINCT collapses multiple
    * lineitems of the same (part, supplier) at the min price.
    */
  def minCostSupplier(part: DataFrame, supplier: DataFrame,
                      lineitem: DataFrame,
                      partType: String = "PROMO"): DataFrame = {
    val priced = lineitem
      .join(broadcast(part.where(col("p_type") === partType).select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"),
        cents(col("l_extendedprice")).as("price_cents"))
    val mins = priced.groupBy(col("partkey").as("mk"))
      .agg(min(col("price_cents")).as("min_cents"))
    priced
      .join(mins, col("partkey") === col("mk") && col("price_cents") === col("min_cents"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("suppkey") === col("s_suppkey"))
      .select(col("partkey"), col("suppkey"), col("s_name"), col("min_cents"))
      .distinct()
  }

  /** TPC-H Q22 shape (idle rich customers): customers with above-average
    * balance and no orders at all. Two classic sub-plans in one query:
    * a scalar aggregate ((n, sum) of positive balances) broadcast into
    * the filter — the comparison stays in exact integer space by
    * cross-multiplying `cents·n > sum` instead of dividing — and a LEFT
    * ANTI join against `orders` for the NOT EXISTS. Output is the
    * one-row summary (count + total cents) the Q22 report wants.
    */
  def idleRichCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val c = customer.select(col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
    val stats = c.where(col("bal_cents") > 0)
      .agg(count(lit(1)).as("n_pos"), sum(col("bal_cents")).as("sum_pos"))
    c.crossJoin(broadcast(stats))
      .where(col("bal_cents") * col("n_pos") > col("sum_pos"))
      .join(orders.select(col("o_custkey")), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .agg(count(lit(1)).as("n_customers"), sum(col("bal_cents")).as("total_cents"))
  }

  /** TPC-H Q21 shape (the lone late supplier): per supplier, how many
    * multi-supplier orders they alone shipped late. Q21's EXISTS (another
    * supplier) + NOT EXISTS (another LATE supplier) pair is decorrelated
    * into per-order counters — `n_supp > 1 ∧ n_late = 1 ∧ this one late` —
    * which is both simpler and scale-correct: two stacked aggregates on
    * the same `l_orderkey` grouping (exchange reuse), no correlated
    * re-probe of lineitem per candidate. "Late" = shipped more than
    * `graceDays` after the order date, collapsed per (order, supplier)
    * with a `max` so multi-line suppliers count once.
    */
  def lonelyLateSupplier(orders: DataFrame, lineitem: DataFrame,
                         supplier: DataFrame, graceDays: Int = 60): DataFrame = {
    val pairs = lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $graceDays DAYS"), 1).otherwise(0))
        .as("late"))
    val perOrder = pairs.groupBy(col("ok").as("ok2"))
      .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"))
    pairs.where(col("late") === 1)
      .join(perOrder, col("ok") === col("ok2"))
      .where(col("n_supp") > 1 && col("n_late") === 1)
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("sk") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** TPC-H Q17 shape (small-quantity revenue): total revenue of lines
    * whose quantity is below 20% of their part's average quantity — the
    * classic CORRELATED SCALAR AGGREGATE, decorrelated: per-part
    * (sum, count) aggregate once, join back by partkey, and test
    * `5·qty·C < S` — the integer cross-multiplication of
    * `qty < 0.2·(S/C)`, engine-exact with no division.
    *
    * Scale shape: the part-type filter broadcasts its keys into the fact
    * scan (the fact is pruned before anything else happens); the stats
    * aggregate is map-side combinable on the SAME partkey the join-back
    * shuffles on, so AQE reuses one exchange; the final global aggregate
    * is a single row. A per-row correlated subquery — the naive reading —
    * would re-scan lineitem per part.
    */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame,
                           ptype: String = "PROMO"): DataFrame = {
    val keys = part.where(col("p_type") === ptype).select(col("p_partkey"))
    val li = lineitem
      .join(broadcast(keys), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as("pk"),
        floor(col("l_quantity")).cast("long").as("qty"),
        cents(col("l_extendedprice")).as("price_cents"))
    val stats = li.groupBy(col("pk").as("pk2"))
      .agg(sum(col("qty")).as("s"), count(lit(1)).as("c"))
    li.join(stats, col("pk") === col("pk2"))
      .where(col("qty") * col("c") * lit(5L) < col("s"))
      .agg(sum(col("price_cents")).as("sum_cents"), count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q6 shape (forecast revenue change): one pass, zero joins — the
    * pure predicate-pushdown showcase. All three filters (shipdate range,
    * discount band, quantity cap) are raw-column comparisons, so they
    * reach the parquet scan as `PushedFilters` and row groups outside the
    * date range never leave the file. Revenue switches to cents·pct
    * integer space only AFTER the filter, keeping the scan predicates
    * pushable.
    */
  def revenueChange(lineitem: DataFrame, year: String = "1997"): DataFrame =
    lineitem
      .where(col("l_shipdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("l_shipdate") < lit(s"${year.toInt + 1}-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum(cents(col("l_extendedprice")) * cents(col("l_discount")))
          .as("revenue_cpct"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q8 shape (national market share): per order-year, the ppm share
    * of one supplier nation inside one customer region's order volume —
    * the two-level CONDITIONAL-AGGREGATE RATIO over a 6-table star join.
    * Both dimension chains (customer→nation→region market filter;
    * supplier→nation share tag) broadcast; the only real shuffle is
    * orders ⋈ lineitem on orderkey; numerator and denominator come out of
    * ONE aggregate pass (`sum(when(...))`/`sum`), never two scans, and the
    * share is a truncating integer ppm — engine-exact, no double division.
    */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                  shareNation: String = "NATION_7",
                  marketRegion: String = "ASIA"): DataFrame = {
    val marketNations = nation
      .join(region.where(col("r_name") === marketRegion),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val marketCust = customer
      .join(broadcast(marketNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val volume = cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))
    lineitem
      .join(orders.join(broadcast(marketCust), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      // decimal sums + `div`, like [[promoRevenueShare]]: a year of cpct
      // volume × 10⁶ overflows a Long LONG before sf1, and Spark's `/` on
      // longs is double division (loses exactness past 2^53, where DuckDB's
      // `//` stays exact). The casts fail loudly on true BIGINT overflow.
      .agg(
        sum(when(col("supp_nation") === shareNation, volume).otherwise(lit(0L))
          .cast("decimal(38,0)")).as("nation_d"),
        sum(volume.cast("decimal(38,0)")).as("total_d"))
      .select(
        col("o_year"),
        col("nation_d").cast("long").as("nation_cpct"),
        col("total_d").cast("long").as("total_cpct"),
        expr("(nation_d * 1000000) div total_d").as("share_ppm"))
  }

  /** TPC-H Q15 shape (top supplier): suppliers whose quarter revenue
    * equals the GLOBAL maximum — the scalar-aggregate-subquery
    * decorrelation (`WHERE total = (SELECT max(total) ...)`): one
    * per-supplier aggregate, a single-row max over it, and an equality
    * join against that broadcast scalar. Ties all surface (the reference
    * semantics of Q15's view formulation). The per-supplier aggregate is
    * computed ONCE — Spark reuses the exchange feeding both the max and
    * the equality probe — never re-derived per candidate.
    */
  def topSupplier(supplier: DataFrame, lineitem: DataFrame,
                  from: String = "1997-01-01", to: String = "1997-04-01"): DataFrame = {
    val perSupp = lineitem
      .where(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(to).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("total_cpct"))
    val best = perSupp.agg(max(col("total_cpct")).as("best_cpct"))
    perSupp
      .join(broadcast(best), col("total_cpct") === col("best_cpct"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_cpct"))
  }

  /** TPC-H Q10 shape (returned-item report): top-`k` customers by revenue
    * lost to returns within a date window. The canonical star-join +
    * heap-top-k composite: date-filtered orders ⋈ return-filtered
    * lineitem (both filters PUSHED to the scans), the revenue aggregate
    * collapses to one row per customer BEFORE the customer/nation
    * dimensions join on (so the dims see ≤|customer| rows), nation
    * broadcast, and the top-k is `TakeOrderedAndProject` heaps — no
    * global sort. Ties break on custkey for determinism.
    */
  def returnedItemReport(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, nation: DataFrame,
                         from: String = "1997-01-01", to: String = "1997-07-01",
                         k: Int = 20): DataFrame = {
    val revenue = sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
    val perCust = lineitem.where(col("l_returnflag") === "R")
      .join(orders.where(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(to).cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(revenue.as("revenue_cpct"))
    perCust
      .join(customer.select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        cents(col("c_acctbal")).as("acctbal_cents"), col("revenue_cpct"))
      .orderBy(col("revenue_cpct").desc, col("c_custkey").asc)
      .limit(k)
  }

  /** TPC-H Q13 shape (customer order distribution): how many customers
    * placed exactly k qualifying orders, INCLUDING the zero-order
    * customers — the left-outer-join + double-aggregate shape.
    *
    * Scale-correct plan: aggregate BEFORE the join — orders collapse to
    * one (custkey, count) row each before meeting customer, so the outer
    * join's right side is bounded by the customer count, never the order
    * count; both sides shuffle once on the join key and the histogram
    * re-aggregate is a few dozen groups. (Join-then-count would drag every
    * order row through the join for the same answer.)
    */
  def customerOrderHistogram(customer: DataFrame, orders: DataFrame,
                             excludePriority: String = "1-URGENT"): DataFrame = {
    val perCust = orders
      .where(col("o_orderpriority") =!= excludePriority)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("__n"))
    customer.select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(coalesce(col("__n"), lit(0L)).as("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** One Q19 disjunct: brand equality plus size and quantity bands. */
  final case class RevenueBranch(brand: String, sizeLo: Int, sizeHi: Int,
                                 qtyLo: Int, qtyHi: Int)

  /** TPC-H Q19 shape (disjunctive revenue): total discounted revenue over
    * lines matching ANY of several (brand, size-band, quantity-band)
    * clauses — the OR-of-ANDs pushdown exercise. Adapted to the reduced
    * schema: brand/size carry the part-side bands (no container column),
    * quantity the fact-side band.
    *
    * The scale move is HOISTING the convex hulls of the disjunction:
    * Catalyst will not infer that `(qty∈[1,11]) OR (qty∈[10,20]) OR
    * (qty∈[20,30])` implies `qty∈[1,30]`, so without the redundant range
    * conjunct the fact scan reads every row group. We add the derived
    * hulls explicitly — `l_quantity` hull on the fact scan (PushedFilters
    * prunes row groups at 100 TB), brand-set + size hull on the part scan
    * — and keep the exact OR as a post-join residual. `part` collapses to
    * the matching keys only → broadcast; no shuffle anywhere, one
    * aggregate row out.
    */
  def disjunctiveRevenue(part: DataFrame, lineitem: DataFrame,
                         branches: Seq[RevenueBranch] = Seq(
                           RevenueBranch("Brand#13", 1, 15, 1, 11),
                           RevenueBranch("Brand#19", 10, 30, 10, 20),
                           RevenueBranch("Brand#25", 20, 50, 20, 30))): DataFrame = {
    require(branches.nonEmpty, "disjunctiveRevenue needs at least one branch")
    val qtyHull = (branches.map(_.qtyLo).min, branches.map(_.qtyHi).max)
    val sizeHull = (branches.map(_.sizeLo).min, branches.map(_.sizeHi).max)
    val p = part
      .where(col("p_brand").isin(branches.map(_.brand): _*) &&
        col("p_size").between(sizeHull._1, sizeHull._2))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = lineitem
      .where(col("l_quantity").between(qtyHull._1, qtyHull._2))
      .select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val residual = branches.map { b =>
      col("p_brand") === b.brand &&
        col("p_size").between(b.sizeLo, b.sizeHi) &&
        col("l_quantity").between(b.qtyLo, b.qtyHi)
    }.reduce(_ || _)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .where(residual)
      .agg(
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("revenue_cpct"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q12 shape (late lines by priority class): for each return flag
    * (ship-mode stand-in — the reduced schema has no `l_shipmode`), how
    * many severely-late lines belong to critical-priority orders vs the
    * rest. Unlike Q4's EXISTS (h08: one row per ORDER via left-semi),
    * this is the per-LINE inner join with BOTH conditional counts out of
    * ONE aggregate pass (`sum(when)` twins) — no second scan, no
    * self-join.
    *
    * Scale shape: the shipdate window is a raw-column predicate → pushed
    * to the fact scan; orders projects to (orderkey, orderdate, priority)
    * only; the lateness predicate (`l_shipdate > o_orderdate + lateness`)
    * rides the equi-join as a residual, so the join stays a hash join on
    * orderkey (AQE-sized), never a range join.
    */
  def latenessPriorityMatrix(orders: DataFrame, lineitem: DataFrame,
                             from: String = "1997-01-01",
                             until: String = "1998-01-01",
                             latenessDays: Int = 60): DataFrame = {
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .where(col("l_shipdate") >= lit(from).cast("timestamp") &&
        col("l_shipdate") < lit(until).cast("timestamp"))
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $latenessDays DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
  }

  /** Q20 shape adapted to this star schema (the driver's fixtures have no
    * partsupp, so availqty becomes the part's corpus-wide shipped total):
    * DOMINANT suppliers — suppliers that shipped more than 1/`shareDenom`
    * of some PROMO part's total quantity, with how many parts each
    * dominates (this corpus spreads parts across many suppliers — the
    * max per-part share at sf0.01 is ~0.21, so the default bar is an
    * eighth; the classic Q20 half-bar is `shareDenom = 2`).
    * The correlated nested aggregate (`EXISTS … HAVING 2·S > T(part)`,
    * `/root/reference` has no joins at all — this is a pure engine
    * extension) decorrelates to two STACKED aggregates over ONE
    * part-filtered scan: per-(supplier, part) quantities roll up again to
    * per-part totals, totals join back on the partkey the rollup already
    * partitioned by (aggregate-then-join — the exchange is reused, AQE
    * sizes the join), and the threshold is the exact integer
    * cross-multiplication `shareDenom·S > T`. The part filter broadcasts into the
    * fact scan; the supplier dim joins the per-supplier result, which is
    * aggregate-sized.
    */
  /** Q11 shape (important stock): parts whose revenue share exceeds
    * `num/den` × the AVERAGE part share — the groupwise-HAVING-versus-
    * global-scalar decorrelation: ONE map-side-combinable per-part
    * aggregate, ONE 1-row global (total, n_parts) aggregate broadcast
    * back, and the threshold as the exact integer cross-multiplication
    * `S·n·den > num·T` in DECIMAL(38,0) (the e06 convention — cents × n ×
    * den passes int64 at warehouse scale). The relative threshold makes
    * the predicate scale-free: the same fraction of parts qualifies at
    * any corpus size.
    */
  def importantParts(lineitem: DataFrame,
                     num: Int = 12, den: Int = 10): DataFrame = {
    val per = lineitem.groupBy(col("l_partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("part_cents"))
    val tot = per.agg(sum(col("part_cents")).as("__total"),
      count(lit(1)).as("__n"))
    per.crossJoin(broadcast(tot))
      .where(col("part_cents").cast("decimal(38,0)") *
        col("__n").cast("decimal(38,0)") * lit(den) >
        col("__total").cast("decimal(38,0)") * lit(num))
      .select(col("l_partkey").as("partkey"), col("part_cents"))
  }

  def dominantSuppliers(supplier: DataFrame, part: DataFrame,
                        lineitem: DataFrame,
                        pType: String = "PROMO",
                        shareDenom: Int = 8): DataFrame = {
    val promo = broadcast(
      part.where(col("p_type") === pType).select(col("p_partkey")))
    val sp = lineitem
      .join(promo, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("s_qty"))
    val totals = sp.groupBy(col("l_partkey")).agg(sum(col("s_qty")).as("t_qty"))
    val dom = sp.join(totals, "l_partkey")
      .where(col("s_qty") * shareDenom > col("t_qty"))
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_parts"))
    supplier.join(dom, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts"))
  }

  /** CUBE over the pricing-summary dimensions — the all-subtotals
    * companion to the rollup face ([[graft.textops.TextAnalysis.mixtureRollup]]
    * covers ROLLUP/grouping-sets): detail, each single-dimension margin,
    * and the grand total in ONE Expand+aggregate pass (2^dims group
    * replicas per row, still map-side combinable), `grouping_id`
    * disambiguating the level exactly as both engines number it
    * (2·g(flag)+g(status)). Money stays integer cents.
    */
  def revenueCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("rev_cents"),
        grouping_id().as("grp"))

  /** Skew-salted equi-join — the MANUAL skew-mitigation primitive for the
    * case AQE's skew-join can't fix (a single hot key whose post-split
    * partitions still hash to one reducer because the SAME key value
    * can't be subdivided by re-partitioning alone): the fact side gets a
    * deterministic salt in [0, salts) derived from `saltSource` (any
    * expression that VARIES WITHIN a hot key — a line number, a digest of
    * the full row — so one key's rows spread over `salts` reducers), and
    * the dimension side replicates `salts`× via one generator, so
    * (key, salt) is a proper equi-join key and every salted partition
    * holds 1/salts of the hot key's rows. The join RESULT is exactly the
    * unsalted join — salting must be invisible, which is what the oracle
    * checks. Cost: dim×salts replication — use only when dim is far
    * smaller than the hot key's row count and too big to broadcast
    * (a broadcastable dim needs no salting at all; AQE skew-join handles
    * the moderate cases automatically — this is the heavy-artillery
    * escape hatch, as in every production Spark playbook).
    */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
                     salts: Int, saltSource: Column): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val saltedFact = fact.withColumn("__salt", pmod(saltSource, lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Z-ORDER (Morton-curve) clustering stats + the file-skipping read —
    * the data-LAYOUT primitive behind multi-dimensional pruning at
    * lake scale (Delta/Iceberg `OPTIMIZE ZORDER`): interleaving the bits
    * of two dimension keys makes rows close in (x, y) land in the same
    * z-range, so per-bucket min/max envelopes — exactly the per-FILE
    * column stats a table format keeps — stay TIGHT on BOTH dimensions
    * at once, where sorting by x alone leaves y's envelopes full-width.
    * Per bucket (z >> bucketShift): row count, the (min, max) envelope of
    * each dimension, and `skip_probe` — whether the literal probe box
    * [boxXMin..boxXMax]×[boxYMin..boxYMax] can skip the bucket entirely,
    * the exact pruning decision a reader makes from file stats.
    *
    * Dimensions: x = user_id masked to `bits`; y = the repo's exact
    * integer cents (`floor(value·100)`) coarsened by 2⁶ and masked.
    * Rows with a NULL dimension carry no layout position and are
    * excluded (production sends them to a dedicated null file). The
    * z-value is a PURE PROJECTION — `bits` unrolled shift/AND/OR terms,
    * whole-stage codegen, no join, no UDF — and the stats are ONE
    * map-side-combinable groupBy on the bucket key. All columns are
    * exact integers; the oracle replays the interleave bit-for-bit.
    *
    * Output: (bucket, n_rows, min_x, max_x, min_y, max_y, skip_probe).
    */
  def zOrderPruning(events: DataFrame, bits: Int = 10, bucketShift: Int = 8,
                    boxXMin: Long = 40L, boxXMax: Long = 47L,
                    boxYMin: Long = 100L, boxYMax: Long = 163L): DataFrame =
    zOrderAssign(events, bits, bucketShift)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
      .withColumn("skip_probe",
        (col("min_x") > boxXMax || col("max_x") < boxXMin ||
          col("min_y") > boxYMax || col("max_y") < boxYMin).cast("long"))

  /** [[zOrderPruning]]'s per-row layout projection — (__x, __y, bucket)
    * for every NULL-free row, the frame a writer would actually lay out
    * on disk (one file per bucket ⇒ per-file column stats ARE the
    * per-bucket envelopes). Factored out so the spec can close the loop
    * from the ANALYTIC skip verdicts to REAL parquet footer statistics:
    * write this frame one-file-per-bucket, read the footers' (min, max)
    * back, and the stats-implied skip set must equal the verdict column.
    */
  def zOrderAssign(events: DataFrame, bits: Int = 10,
                   bucketShift: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    require(bucketShift >= 0 && bucketShift < 2 * bits,
      "bucketShift must be inside the z-value width")
    val mask = (1L << bits) - 1L
    val x = col("user_id").bitwiseAND(lit(mask))
    val y = shiftright(floor(col("value") * 100).cast("long"), 6)
      .bitwiseAND(lit(mask))
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(col("__x"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(col("__y"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
    events
      .where(col("user_id").isNotNull && col("value").isNotNull)
      .select(x.as("__x"), y.as("__y"))
      .withColumn("bucket", shiftright(z, bucketShift))
  }
}
