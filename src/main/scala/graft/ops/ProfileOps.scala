package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-driven data profiling — the "what's in this table" pass run
  * before designing a pipeline over an unknown 100 TB input. One
  * aggregation job regardless of column count: every per-column
  * statistic is an aggregate expression over the same scan, emitted as
  * one row per column via an explode of a struct array (no per-column
  * jobs, no driver loops over data).
  */
object ProfileOps {

  /** One row per column: (n_rows, col_name, dtype, n_nulls, n_distinct,
    * min_value, max_value, mean) — min/max rendered as strings so the
    * profile has a fixed schema for any input table; `mean` is null for
    * non-numeric columns.
    *
    * Scale note: EXACT multi-column `countDistinct` makes Catalyst plan
    * an Expand (one replica of every row per distinct aggregate — 7×
    * the scan here) before the shuffle; that is the profiler's cost
    * ceiling at 100 TB. [[profileApprox]] is the scale path: HLL++
    * sketches keep it a single-pass partial+final aggregation with no
    * Expand. This exact form is the oracle-checked baseline. */
  def profile(df: DataFrame): DataFrame = {
    val perCol = df.schema.fields.map { f =>
      val c = col(f.name)
      val isNumeric = f.dataType match {
        case _: NumericType => true
        case _ => false
      }
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(c).as("n_distinct"),
        min(c).cast("string").as("min_value"),
        max(c).cast("string").as("max_value"),
        (if (isNumeric) round(avg(c.cast("double")), 4)
         else lit(null).cast("double")).as("mean")).as(s"p_${f.name}")
    }
    val aggs = count(lit(1)).as("n_rows") +: perCol
    df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      .select(col("n_rows"),
        explode(array(df.schema.fields.map(f =>
          col(s"p_${f.name}")): _*)).as("c"))
      .select(col("n_rows"), col("c.*"))
  }

  /** [[profile]] with `approx_count_distinct` (HLL++, `rsd` relative
    * error) in place of exact distinct counts — no Expand, one
    * partial+final pass over the scan regardless of column count. The
    * 100 TB default; same output schema as the exact form. */
  def profileApprox(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val perCol = df.schema.fields.map { f =>
      val c = col(f.name)
      val isNumeric = f.dataType match {
        case _: NumericType => true
        case _ => false
      }
      struct(
        lit(f.name).as("col_name"),
        lit(f.dataType.simpleString).as("dtype"),
        sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
        approx_count_distinct(c, rsd).as("n_distinct"),
        min(c).cast("string").as("min_value"),
        max(c).cast("string").as("max_value"),
        (if (isNumeric) round(avg(c.cast("double")), 4)
         else lit(null).cast("double")).as("mean")).as(s"p_${f.name}")
    }
    val aggs = count(lit(1)).as("n_rows") +: perCol
    df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      .select(col("n_rows"),
        explode(array(df.schema.fields.map(f =>
          col(s"p_${f.name}")): _*)).as("c"))
      .select(col("n_rows"), col("c.*"))
  }

  /** Declarative data-quality constraint audit (the dbt-test /
    * Deequ-check shape): referential integrity, key uniqueness, value
    * ranges, and null contracts evaluated as one frame — the
    * acceptance gate a pipeline runs before trusting a new drop of
    * input data, with violation COUNTS (not booleans) so a regression
    * is quantified, not just flagged.
    *
    * Scale shape: each FK check is a LEFT ANTI join (broadcast when the
    * referenced key side is small, the same guarded pattern as the star
    * joins) collapsed to one count; uniqueness is `count −
    * countDistinct` on the key column only; range/null checks are
    * single-scan conditional sums. Every branch emits ONE row — the
    * union is |constraints| rows total, so the audit's output is
    * constant-size at any input scale. */
  def constraintAudit(orders: DataFrame, customer: DataFrame,
      lineitem: DataFrame, events: DataFrame,
      documents: DataFrame): DataFrame = {
    def row(name: String, violations: DataFrame): DataFrame =
      violations.select(lit(name).as("check_name"),
        coalesce(col("n_violations").cast("long"), lit(0L))
          .as("n_violations"))
        .withColumn("passed", col("n_violations") === 0L)
    def orphans(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      row(name, child.select(col(childKey))
        .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
          "left_anti")
        .agg(count(lit(1)).as("n_violations")))
    def unique(name: String, df: DataFrame, key: String): DataFrame =
      row(name, df.agg((count(col(key)) - countDistinct(col(key)))
        .as("n_violations")))
    Seq(
      orphans("orders.o_custkey -> customer", orders, "o_custkey",
        customer, "c_custkey"),
      orphans("lineitem.l_orderkey -> orders", lineitem, "l_orderkey",
        orders, "o_orderkey"),
      unique("customer.c_custkey unique", customer, "c_custkey"),
      unique("orders.o_orderkey unique", orders, "o_orderkey"),
      unique("documents.doc_id unique", documents, "doc_id"),
      row("lineitem.l_quantity in (0, 50]", lineitem.agg(
        sum(when(col("l_quantity") <= 0.0 || col("l_quantity") > 50.0, 1L)
          .otherwise(0L)).as("n_violations"))),
      row("events.user_id not null", events.agg(
        sum(when(col("user_id").isNull, 1L).otherwise(0L))
          .as("n_violations")))
    ).reduce(_ unionByName _)
  }

  /** Inclusion-dependency audit — foreign-key DISCOVERY, where
    * [[constraintAudit]] only verifies keys someone already declared:
    * for each candidate (child.col ⊆ parent.col) the DISTINCT-value
    * containment fraction |child ∩ parent| / |child|, flagged as an
    * IND at exactly 1.0 (the Metanome/SPIDER profiling pass run before
    * wiring joins over an unknown lake). The list deliberately mixes
    * true FKs, their partial REVERSES (customer ⊆ orders fails by the
    * never-ordered cohort — the quantified direction signal), and a
    * cross-domain spurious candidate (events.user_id vs c_custkey)
    * that numeric-range containment would naively bless.
    *
    * Determinism: values compare as strings (one engine's join, so
    * cross-engine formatting never matters); counts are exact BIGINTs;
    * one pinned division per candidate. Empty child (all NULL) →
    * NULL containment, false flag, stated.
    *
    * Scale shape: each candidate is a per-side DISTINCT collapse (the
    * heavy side map-side-combines before its shuffle) + one key join
    * collapsed to a single row — |candidates| rows total, constant at
    * any input scale; candidates are schema metadata, never data. */
  def inclusionDependencyAudit(tables: Map[String, DataFrame],
      candidates: Seq[(String, String, String, String)]): DataFrame =
    candidates.map { case (ct, cc, pt, pc) =>
      val child = tables(ct).select(col(cc).cast("string").as("v"))
        .filter(col("v").isNotNull).distinct()
      val parent = tables(pt).select(col(pc).cast("string").as("v"))
        .filter(col("v").isNotNull).distinct()
      child.join(parent.withColumn("hit", lit(1L)), Seq("v"), "left")
        .agg(count(lit(1)).as("nc"),
          coalesce(sum(col("hit")), lit(0L)).as("nh"))
        .select(lit(ct).as("child_table"), lit(cc).as("child_col"),
          lit(pt).as("parent_table"), lit(pc).as("parent_col"),
          col("nc").as("n_child_distinct"), col("nh").as("n_contained"),
          when(col("nc") > 0L,
            round(col("nh").cast("double") / col("nc").cast("double"), 6))
            .as("containment"),
          (col("nc") > 0L && col("nh") === col("nc")).as("is_ind"))
    }.reduce(_ unionByName _)

  /** Functional-dependency audit — does column X determine column Y,
    * and if not, how far off is the table? For each candidate FD the
    * violation measure is the REPAIR DISTANCE: the minimum number of
    * rows to delete so the FD holds (per LHS group, everything except
    * its plurality RHS value — the g3 measure of Kivinen & Mannila
    * '95). The discovery loop is suggest-style like
    * [[constraintSuggestions]]: run candidates, read violation rates,
    * promote exact FDs into [[constraintAudit]].
    *
    * Scale: each candidate is one map-side-combined (lhs, rhs) count
    * collapse, then per-LHS plurality on the collapsed frame — linear
    * scan, shuffle bounded by distinct pair cardinality, never a
    * self-join. */
  def fdAudit(df: DataFrame, candidates: Seq[(String, String)]): DataFrame =
    candidates.map { case (lhs, rhs) =>
      val pair = df.groupBy(col(lhs).as("lv"), col(rhs).as("rv"))
        .agg(count(lit(1)).as("c"))
      pair.groupBy("lv")
        .agg(count(lit(1)).as("n_rhs"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_c"))
        .agg(
          lit(s"$lhs -> $rhs").as("fd"),
          count(lit(1)).as("n_groups"),
          sum(when(col("n_rhs") > 1L, 1L).otherwise(0L)).as("n_violating"),
          sum(col("n_rows") - col("max_c")).as("rows_to_fix"))
        .withColumn("holds", col("n_violating") === 0L)
    }.reduce(_ unionByName _)

  /** Constraint SUGGESTION from the observed profile — the autopilot
    * companion to [[constraintAudit]]'s hand-written rules: columns
    * with zero observed nulls propose `not_null`, null-free columns
    * whose distinct count equals the row count propose `unique`, and
    * numeric columns propose a `range` rule carrying the observed
    * [min, max] envelope. Suggestions are hypotheses mined from one
    * snapshot (support = the row count that exhibited them) — the
    * intended loop is suggest → human review → promote into the
    * audit. Pure projection of [[profile]]'s one-aggregation output,
    * so it inherits that scan's cost and exactness; min/max render
    * through the same string casts the profile gate already proves
    * engine-identical. */
  def constraintSuggestions(df: DataFrame): DataFrame = {
    // three rule branches read the SAME per-column frame — materialize
    // the |columns|-row profile once instead of re-running the exact
    // countDistinct scan per branch
    val p = profile(df).localCheckpoint()
    val noLoHi = Seq(lit(null).cast("string").as("lo"),
      lit(null).cast("string").as("hi"))
    val notNull = p.filter(col("n_nulls") === 0L)
      .select(Seq(col("col_name"), lit("not_null").as("rule")) ++ noLoHi :+
        col("n_rows").as("support_rows"): _*)
    val unique = p
      .filter(col("n_nulls") === 0L && col("n_distinct") === col("n_rows"))
      .select(Seq(col("col_name"), lit("unique").as("rule")) ++ noLoHi :+
        col("n_rows").as("support_rows"): _*)
    val range = p.filter(col("mean").isNotNull)
      .select(col("col_name"), lit("range").as("rule"),
        col("min_value").as("lo"), col("max_value").as("hi"),
        col("n_rows").as("support_rows"))
    notNull.unionByName(unique).unionByName(range)
  }

  /** Benford's-law first-digit profile of a positive amount column —
    * the classic fabricated-/degenerate-data smell test a profiling
    * pass runs over monetary fields: naturally-grown magnitudes put
    * digit d first with probability log10(1+1/d) ≈ 30% for 1 down to
    * 4.6% for 9, while synthetic or truncated data flattens the curve.
    * One row per leading digit with its exact count, observed share,
    * and the Benford expectation.
    *
    * Determinism: the leading digit is extracted TEXTUALLY from
    * floor(amount) (floor of a double and the int64→string render are
    * exact and engine-identical) rather than via log10/power, whose
    * rounding at decade boundaries (10^k itself) differs per engine.
    * share is one pinned integer division; the expectation is
    * ln(1+1/d)/ln(10) on identical doubles (the established ln
    * convention), rounded once. Rows below 1 (no leading digit in
    * this scheme) are excluded and reported via the count.
    *
    * Shape: one 9-group hash agg over the scan; the grand total
    * re-aggregates the 9-row frame (broadcast cross join). */
  def benfordFirstDigit(df: DataFrame, amount: String): DataFrame = {
    val digit = substring(floor(col(amount)).cast("long").cast("string"), 1, 1)
      .cast("int")
    val digits = df.filter(col(amount) >= 1.0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("total"))
    digits.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)), 6).as("benford_expected"))
  }
}
