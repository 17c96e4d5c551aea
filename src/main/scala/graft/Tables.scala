package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every operator in this library is a pure `DataFrame => DataFrame`
  * function; these loaders are the only place that knows about paths.
  * At cluster scale the same functions run over real tables — swap the
  * loader, keep the plan. Parquet gives vectorized scans + pushdown,
  * which the reference (JDBC/JSON row readers, see SURVEY.md §4) never had.
  */
object Tables {

  /** Per-(session, path) relation memo. `spark.read.parquet` builds a
    * fresh InMemoryFileIndex (a filesystem listing) and re-reads the
    * footer schema on EVERY call — a ~40-90 ms fixed tax per query
    * that a catalog table never pays (the metastore caches the
    * relation). The r15 overhead bisect (tools.OverheadBisect)
    * measured this construction cost as the dominant term of the
    * BENCH_FLOOR r14 "fixed-overhead drift" on trivial plans
    * (mixture_sample: 0.075 s construct vs 0.009 s plan + 0.056 s
    * exec) — the injected extensions were exonerated (full-extension
    * sessions plan FASTER than bare ones once the JVM is warm).
    *
    * Safety: these loaders serve the static driver-generated testdata
    * tables only — immutable within a run — and the memo is keyed by
    * the session object, so a new session never sees another
    * session's resolved relations. A path whose files change
    * mid-session must call [[invalidate]] first (no current caller
    * does). DataFrames are immutable plans; sharing one across
    * queries is exactly what `spark.table` does. */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Drop memoized relations (all of them, or one session's) — for
    * callers that rewrite a previously-read path. */
  def invalidate(session: Option[SparkSession] = None): Unit =
    session match {
      case None => memo.clear()
      case Some(s) => memo.keySet.removeIf(_._1 eq s)
    }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      k => k._1.read.parquet(k._2))

  /** `events.ts` normalization — the driver has shipped this column as
    * two different physical types across testdata generations, so the
    * loader adapts to whichever it finds instead of assuming one:
    *
    *  - TIMESTAMP(NANOS): Spark 4 cannot read nanos as a timestamp —
    *    the legacy conf surfaces it as a LONG, truncated to
    *    microseconds (`div 1000`, integer division: doubles would lose
    *    precision at 1e18 ns). DuckDB truncates ns→µs the same way.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads
    *    TIMESTAMP_NTZ; cast to TIMESTAMP so downstream window/trunc
    *    functions and result schemas keep the type every oracle
    *    compares against (session zone is pinned UTC in build.sbt, so
    *    the wall-clock reinterpretation is the identity — exactly the
    *    instants DuckDB's naive read produces).
    *
    * Either path yields the same µs instants, keeping every operator
    * and oracle unchanged across testdata generations. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        // fail fast at the loader: a silent pass-through of e.g. a
        // string or int32-epoch ts would surface as confusing operator
        // errors (or wrong comparisons) far downstream
        throw new IllegalStateException(
          s"events.ts: unexpected physical type $other " +
            "(expected TIMESTAMP, TIMESTAMP_NTZ, or nanos-as-LONG)")
    }
  }

  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
}
