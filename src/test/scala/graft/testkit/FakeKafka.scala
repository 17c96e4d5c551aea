package graft.testkit

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSourceProvider, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Test-scope CONTRACT DOUBLE for the Kafka connector.
  *
  * This container has no Kafka artifacts (zero egress; neither
  * kafka-server nor spark-sql-kafka exists on any classpath), so the
  * real broker path (`StreamJob.kafkaSource/kafkaBatchSource`) cannot
  * execute against the genuine connector here. This provider registers
  * under the same `kafka` short name with the connector's EXACT output
  * schema (key/value/topic/partition/offset/timestamp/timestampType)
  * and honors `subscribe` + `startingOffsets`, so those code paths run
  * end-to-end — source resolution, option pass-through, binary-value
  * parse chain, engine-managed offset tracking and checkpoint resume —
  * with only the wire protocol faked. On a real cluster the genuine
  * connector takes over unchanged (same name, same schema, same
  * options).
  */
object FakeKafka {

  /** The Kafka connector's fixed output schema. */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  // topic → append-only log of (value bytes, event-time micros)
  private val topics =
    scala.collection.concurrent.TrieMap.empty[String, Vector[(Array[Byte], Long)]]

  /** Options seen by the most recent createSource/createRelation —
    * asserted by the contract spec. */
  @volatile var lastOptions: Map[String, String] = Map.empty

  def produce(topic: String, value: String,
      tsMicros: Long = 1709280000000000L): Unit = synchronized {
    val log = topics.getOrElse(topic, Vector.empty)
    topics.put(topic, log :+ (value.getBytes("UTF-8"), tsMicros))
  }

  def logSize(topic: String): Long =
    topics.getOrElse(topic, Vector.empty).size.toLong

  def reset(): Unit = { topics.clear(); lastOptions = Map.empty }

  private[testkit] def internalRows(topic: String, from: Long,
      until: Long): Seq[InternalRow] = {
    val log = topics.getOrElse(topic, Vector.empty)
    (from until until).map { i =>
      val (bytes, ts) = log(i.toInt)
      InternalRow(null, bytes, UTF8String.fromString(topic), 0, i, ts, 0)
    }
  }

  private[testkit] def externalRows(topic: String): Seq[Row] = {
    val log = topics.getOrElse(topic, Vector.empty)
    log.zipWithIndex.map { case ((bytes, ts), i) =>
      Row(null, bytes, topic, 0, i.toLong,
        new java.sql.Timestamp(ts / 1000L), 0)
    }
  }
}

class FakeKafkaProvider extends StreamSourceProvider with RelationProvider
    with DataSourceRegister {

  override def shortName(): String = "kafka"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("fake-kafka", FakeKafka.kafkaSchema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    FakeKafka.lastOptions = parameters
    new FakeKafkaSource(sqlContext, parameters)
  }

  /** Bounded replay (`spark.read.format("kafka")`): earliest→latest of
    * the subscribed topic, like the real connector's batch mode. */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    FakeKafka.lastOptions = parameters
    val topic = parameters("subscribe")
    val ctx = sqlContext
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = FakeKafka.kafkaSchema
      override def buildScan(): RDD[Row] =
        ctx.sparkContext.parallelize(FakeKafka.externalRows(topic), 1)
    }
  }
}

/** V1 streaming source over the in-memory topic log. Offsets are plain
  * positions; the ENGINE persists them in the checkpoint's offset log,
  * so stop/restart resume semantics are the real ones. */
class FakeKafkaSource(sqlContext: SQLContext,
    parameters: Map[String, String]) extends Source {

  private val topic = parameters("subscribe")
  // "latest" skips the backlog present at source creation; "earliest"
  // replays from offset 0 — the connector's contract.
  private val startFrom: Long =
    if (parameters.getOrElse("startingoffsets", parameters
      .getOrElse("startingOffsets", "latest")).equalsIgnoreCase("earliest")) 0L
    else FakeKafka.logSize(topic)

  override def schema: StructType = FakeKafka.kafkaSchema

  override def getOffset: Option[Offset] = {
    val n = FakeKafka.logSize(topic)
    if (n == 0) None else Some(LongOffset(n))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(o => o.json().toLong).getOrElse(startFrom)
    val until = end.json().toLong
    val rows = FakeKafka.internalRows(topic, math.max(from, startFrom), until)
    ColumnShim.internalCreateDataFrame(
      sqlContext.sparkSession,
      sqlContext.sparkContext.parallelize(rows, 1),
      FakeKafka.kafkaSchema,
      isStreaming = true)
  }

  override def stop(): Unit = ()
}
