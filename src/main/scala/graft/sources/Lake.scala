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
}
