package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned parquet lake layout — the storage posture
  * every query in this engine assumes at 100 TB: facts land
  * partitioned by a coarse time key so that time-sliced scans (the
  * dominant access pattern for `events`-like tables) prune whole
  * directories BEFORE any I/O. The flat single-file test parquet reads
  * everything regardless of the date filter; a `day=`-partitioned
  * layout turns the same filter into a `PartitionFilters` entry that
  * cuts the file listing itself (asserted in PartitionPruneSpec).
  *
  * Sizing note baked into the writer: one output file per (partition,
  * shuffle task) is the classic small-files trap — repartitioning by
  * the partition column first gives each day ONE writer task (append
  * jobs writing a handful of days), keeping file counts proportional
  * to days, not days × tasks. Daily volume beyond one healthy file
  * (~1 GB parquet) should add a second repartition key (e.g. a hash
  * bucket of the primary key).
  */
object Lake {

  /** Write `df` partitioned by the DATE of `tsCol` under `path`
    * (overwrite). The partition column is named `day` and written as a
    * string `yyyy-MM-dd` directory value. NOTE: on read, Spark's
    * partition column type inference (on by default) recognizes the
    * values as dates and surfaces `day` as DATE — filters like
    * `$"day" === "2024-01-01"` still prune via an implicit cast
    * (asserted in PartitionPruneSpec), but code must not assume string
    * semantics (e.g. `substring`) on the read-back column. */
  def writePartitionedByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("day", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("day"))
      .write.mode("overwrite")
      .partitionBy("day")
      .parquet(path)

  /** Read the lake back; `day` is a partition column, so equality and
    * range predicates on it prune directories at planning time. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  // ---------- format breadth (interchange in/out of the lake) ----------

  /** Format-parameterized writer: `parquet` | `orc` | `json` | `csv`.
    *
    * Posture: parquet and ORC are the only formats data should LIVE
    * in at scale — columnar, splittable, self-describing, with filter
    * pushdown and column pruning at the scan (ORC pushdown asserted
    * in FormatRoundTripSpec). JSON-lines and CSV exist for
    * interchange at the edges (ingest from exports, handoff to
    * non-Spark consumers); they scan whole rows, carry no types
    * (CSV) or expensive inference (JSON), and should be converted to
    * parquet on arrival — exactly what the reference's first batch
    * hop does with its JSON feed.
    *
    * CSV nulls: by default Spark WRITES null as an empty field and
    * READS empty fields as null, silently conflating `""` with null —
    * both sides here pin `nullValue` to `\N` (the classic dump
    * convention) so empty strings survive a round trip. */
  def writeAs(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (format match {
      case "csv" => w.option("header", "true").option("nullValue", "\\N")
      case _ => w
    }).save(path)
  }

  /** Format-parameterized reader. Text formats (csv/json) take the
    * caller's schema — NEVER schema inference in production: inference
    * is an extra full scan of the data before the real one, and a
    * sampling-dependent type lottery (a column of "1", "2", "x" flips
    * type on the x). Columnar formats carry their own schema. */
  def readAs(spark: SparkSession, path: String, format: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.map(r.schema).getOrElse(r)
    (format match {
      case "csv" => withSchema.option("header", "true")
        .option("nullValue", "\\N")
      case _ => withSchema
    }).load(path)
  }
}
