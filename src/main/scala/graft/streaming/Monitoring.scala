package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import scala.collection.mutable

/** Streaming observability — the reference's `query.status` /
  * `query.lastProgress` polling (`5SPAR.ipynb` cell 21, `Test.ipynb`
  * cells 6-7) done properly: a `StreamingQueryListener` records
  * per-batch progress push-style instead of sleeping and polling.
  */
object Monitoring {

  final case class BatchProgress(
      queryName: String,
      batchId: Long,
      numInputRows: Long,
      processedRowsPerSecond: Double)

  /** Listener accumulating per-batch progress (and any `observe()`d
    * metric rows) for inspection. */
  final class ProgressRecorder extends StreamingQueryListener {
    private val buf = mutable.Buffer.empty[BatchProgress]
    private val obs =
      mutable.Buffer.empty[(Long, String, org.apache.spark.sql.Row)]
    def batches: Seq[BatchProgress] = buf.synchronized(buf.toSeq)
    def observed: Seq[(Long, String, org.apache.spark.sql.Row)] =
      obs.synchronized(obs.toSeq)

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      buf.synchronized {
        buf += BatchProgress(
          Option(e.progress.name).getOrElse(""),
          e.progress.batchId,
          e.progress.numInputRows,
          e.progress.processedRowsPerSecond)
        ()
      }
      obs.synchronized {
        e.progress.observedMetrics.forEach { (name, row) =>
          obs += ((e.progress.batchId, name, row))
        }
      }
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  }

  /** Inline data-quality metrics via `observe()` — computed WITH the
    * batch's own job (no second pass over the data, unlike a separate
    * `count()`): row count, null/empty text, distinct-ish user reach.
    * Values surface per batch through [[ProgressRecorder.observed]] in
    * streaming, or a `QueryExecutionListener` in batch. */
  def withQualityMetrics(df: DataFrame,
      name: String = "graft_quality"): DataFrame = {
    import org.apache.spark.sql.functions._
    df.observe(name,
      count(lit(1)).as("rows"),
      sum(when(col("text").isNull || trim(col("text")) === "", 1L)
        .otherwise(0L)).as("blank_text"),
      approx_count_distinct(col("username")).as("approx_users"))
  }

  def attach(spark: SparkSession): ProgressRecorder = {
    val r = new ProgressRecorder
    spark.streams.addListener(r)
    r
  }

  def detach(spark: SparkSession, r: ProgressRecorder): Unit =
    spark.streams.removeListener(r)

  /** The reference's one-shot poll, as a pure snapshot. */
  def statusLine(q: StreamingQuery): String = {
    val p = Option(q.lastProgress)
    s"active=${q.isActive} " +
      p.map(pp => s"batch=${pp.batchId} rows=${pp.numInputRows}")
        .getOrElse("no-progress-yet")
  }
}

/** Bounded/rate-limited replay of a JSON-lines file into a streaming
  * DataFrame — the test stand-in for the reference's Mastodon SSE
  * feeder (SURVEY.md S8): deterministic batches via the
  * `rate-micro-batch` source joined to the indexed lines, so tests
  * control exactly how many records arrive per micro-batch.
  */
object Replay {
  import org.apache.spark.sql.functions._

  /** Stream `path`'s lines as a `value` column, `rowsPerBatch` lines
    * per micro-batch in file order. The static file side is broadcast
    * against the rate stream's monotonically increasing index. */
  def jsonLines(spark: SparkSession, path: String,
      rowsPerBatch: Int): DataFrame = {
    // zipWithIndex preserves file order; window/monotonic-id indexing is
    // rejected by the streaming unsupported-operation checker once the
    // static side joins a stream.
    val indexed = spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (v, i) => (i, v) }
    val lines = spark.createDataFrame(indexed).toDF("idx", "value")
    val ticks = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .load()
      .select(col("value").as("idx"))
    ticks.join(broadcast(lines), Seq("idx"), "inner").select("value")
  }
}
