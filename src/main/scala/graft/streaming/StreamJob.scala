package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.TootOps

/** The reference's main streaming job re-expressed on Structured
  * Streaming (`/root/reference/src/spark_stream.py` end-to-end):
  * source → parse → normalize → optional filters → `foreachBatch` fan-out
  * to three append sinks, preserving the observable per-batch semantics
  * (SURVEY.md §2.8):
  *
  *  - `mastodon_posts`:  (username, content, ts) projection, appended;
  *  - `streamed_toot_counts`: 1-minute tumbling window counts computed
  *    WITHIN each micro-batch, appended with `batch_id` — the same
  *    event-time window arriving across batches yields multiple partial
  *    rows (the reference's contract; totals are a downstream
  *    SUM GROUP BY);
  *  - `avg_toot_length_by_user`: per-batch per-user average length with
  *    `batch_id`.
  *
  * Sinks are abstracted as a `(table, DataFrame) => Unit` appender so
  * tests drive the job with `MemoryStream` + in-memory sinks and
  * production uses JDBC/parquet appenders — the reference hard-wires
  * JDBC (`spark_stream.py:117,131,144`).
  */
object StreamJob {

  type Appender = (String, DataFrame) => Unit

  /** Kafka source with the reference's options
    * (`src/spark_stream.py:65-72`). */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "latest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("failOnDataLoss", "false")
      .load()

  /** Bounded Kafka replay for backfill
    * (`src/batch_load_raw_fix.py:35-43`). */
  def kafkaBatchSource(spark: SparkSession, bootstrap: String,
      topic: String): DataFrame =
    spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("endingOffsets", "latest")
      .load()

  /** The transform chain applied to parsed toots before sinking
    * (`spark_stream.py:82-104`). */
  def prepare(parsed: DataFrame, language: Option[String] = None,
      keywords: Seq[String] = Nil): DataFrame =
    TootOps.applyFilters(
      TootOps.normalizeTimestamps(parsed), language, keywords)

  /** The three per-batch outputs (`spark_stream.py:107-144`). Exposed
    * for direct testing. */
  def batchOutputs(df: DataFrame, batchId: Long): Map[String, DataFrame] = {
    val valid = df.filter(col("text").isNotNull && col("username").isNotNull)
    val posts = valid.select(
      col("username"),
      col("text").as("content"),
      col("created_at").as("ts"))
    val windowCounts = valid
      .groupBy(window(col("created_at"), "1 minute").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        lit(batchId).as("batch_id"),
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("cnt"))
    val avgLen = valid
      .withColumn("length", length(col("text")))
      .groupBy("username")
      .agg(avg("length").as("avg_length"))
      .select(lit(batchId).as("batch_id"), col("username"), col("avg_length"))
    Map(
      "mastodon_posts" -> posts,
      "streamed_toot_counts" -> windowCounts,
      "avg_toot_length_by_user" -> avgLen)
  }

  /** Start the streaming query: parsed-toot stream → foreachBatch →
    * three appends. `checkpointDir` gives the reference's at-least-once
    * offset tracking (`spark_stream.py:150`). */
  def start(prepared: DataFrame, appender: Appender,
      checkpointDir: String): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Cache FIRST, then probe: the three outputs each trigger a job
        // over this batch, and persisting before the empty-batch guard
        // (P16, `5SPAR.ipynb` cell 24) means the isEmpty take(1) WARMS
        // the cache instead of paying an extra source scan on every
        // non-empty microbatch.
        batch.persist()
        try {
          if (!batch.isEmpty) {
            batchOutputs(batch, batchId).foreach { case (table, out) =>
              appender(table, out)
            }
          }
        } finally batch.unpersist()
        ()
      }
      .start()

  /** Parquet appender — the durable-store stand-in for the reference's
    * JDBC appends. */
  def parquetAppender(baseDir: String): Appender =
    (table, df) => df.write.mode("append").parquet(s"$baseDir/$table")

  // ---------- incremental daily rollup sink ----------
  //
  // EventOps.incrementalDailyStats lifted into the stream: the
  // reference appends per-batch PARTIAL rows and defers the merge to
  // every reader (`streamed_toot_counts`, src/spark_stream.py:119-131
  // — totals need a downstream SUM GROUP BY); the idiomatic end-state
  // maintains the merged rollup itself, one MERGE per micro-batch.

  /** Durable rollup state for [[startIncrementalDaily]]. */
  trait RollupStore {
    /** Current rollup snapshot; None before the first merge. */
    def read(): Option[DataFrame]
    /** Highest batch id already merged; -1 when fresh. */
    def lastBatchId(): Long
    /** Replace the rollup with the merge result for `batchId`.
      * Implementations must fully materialize `rollup` before exposing
      * it as the new current snapshot. */
    def write(rollup: DataFrame, batchId: Long): Unit
  }

  /** Versioned-directory parquet [[RollupStore]]: each merge writes
    * `dir/v<batchId>` and then flips the tiny `latest` pointer file —
    * the previous snapshot is never overwritten mid-scan (the merge
    * READS it while writing the new version), and a crash between
    * write and flip leaves the old snapshot current with the new
    * directory orphaned, to be rewritten idempotently on replay. */
  class ParquetRollupStore(spark: SparkSession, dir: String)
      extends RollupStore {
    private val ptr = java.nio.file.Paths.get(dir, "latest")
    def lastBatchId(): Long =
      if (java.nio.file.Files.exists(ptr))
        new String(java.nio.file.Files.readAllBytes(ptr), "UTF-8").trim.toLong
      else -1L
    def read(): Option[DataFrame] = lastBatchId() match {
      case -1L => None
      case id  => Some(spark.read.parquet(s"$dir/v$id"))
    }
    def write(rollup: DataFrame, batchId: Long): Unit = {
      val prev = lastBatchId()
      rollup.write.mode("overwrite").parquet(s"$dir/v$batchId")
      java.nio.file.Files.write(ptr, s"$batchId\n".getBytes("UTF-8"))
      // retention: keep the snapshot just superseded (crash-recovery
      // margin — a reader may still be mid-scan on it) and drop
      // everything older, so the store holds ≤2 versions instead of
      // one directory per batch forever
      val keep = Set(s"v$batchId", s"v$prev")
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("v") &&
          !keep.contains(f.getName))
        .foreach { f =>
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
            x.delete(); ()
          }
          rm(f)
        }
    }
  }

  /** Daily delta partials of one micro-batch of prepared toots:
    * (day, toots, chars). Counts and Long char sums merge EXACTLY, so
    * incremental maintenance ≡ from-scratch recompute bit-for-bit —
    * the invariant StreamJobSpec asserts across batch boundaries. */
  def dailyDelta(batch: DataFrame): DataFrame = batch
    .filter(col("created_at").isNotNull && col("text").isNotNull)
    .groupBy(to_date(col("created_at")).as("day"))
    .agg(count(lit(1)).as("toots"), sum(length(col("text"))).as("chars"))

  /** Associative partial merge — the same union-then-reaggregate shape
    * as `EventOps.incrementalDailyStats`, over ≤ 2·|days| rows. */
  def mergeDaily(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .groupBy("day")
      .agg(sum("toots").as("toots"), sum("chars").as("chars"))

  /** Streaming maintenance of the daily rollup: each micro-batch
    * computes its delta partials and merges them into the stored
    * rollup. The 100 TB shape: the store is ∝ |days|, the delta
    * touches only the batch — history is NEVER rescanned, exactly the
    * incrementalDailyStats contract driven by a stream.
    *
    * Exactly-once: foreachBatch is at-least-once (a batch REPLAYS
    * after checkpoint recovery); the store records the batch id each
    * snapshot merged, so a replayed id is a no-op instead of a
    * double-count — idempotent because [[ParquetRollupStore]] rewrites
    * `v<batchId>` and flips the pointer only after the write lands. */
  def startIncrementalDaily(prepared: DataFrame, store: RollupStore,
      checkpointDir: String): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > store.lastBatchId()) {
          val merged = store.read() match {
            case Some(base) => mergeDaily(base, dailyDelta(batch))
            case None       => dailyDelta(batch)
          }
          store.write(merged, batchId)
        }
        ()
      }
      .start()

  // ---------- incremental near-dup maintenance sink ----------
  //
  // DedupOps.incrementalNearDups driven by the stream: each
  // micro-batch of documents is paired against the persisted corpus
  // (and itself) WITHOUT ever re-pairing old-vs-old — the
  // continual-ingestion dedup story end-to-end. Same read-modify-write
  // posture as [[startIncrementalDaily]]: versioned snapshots + a
  // batch-id guard make the at-least-once foreachBatch replay a no-op.

  /** Durable state for [[startIncrementalNearDups]]: APPEND-ONLY
    * per-batch delta dirs `dir/b<batchId>/{docs,index,pairs}` — the
    * exact contract [[startDistinctDailySketches]] uses. Each batch
    * writes only its OWN delta (docs genuinely new in the batch, their
    * banded signature index rows, the pairs they introduced), so the
    * per-batch write is O(batch), never O(corpus) — the r12 verdict's
    * one remaining corpus-rewrite plan. Appends of distinct batch ids
    * commute: pairs are disjoint across batches (each touches ≥1 doc
    * new in its batch), docs/index rows are disjoint by the
    * re-delivery anti-join — so readers simply union the deltas.
    *
    * Crash/replay safety: a batch overwrites its own `b<id>` paths
    * (idempotent by path), and the tiny `latest` pointer flips LAST —
    * a crash mid-batch leaves `latest` at the previous id, the
    * half-written delta invisible to readers, and the replay rewrites
    * it in place. A replayed batch id ≤ `latest` is a no-op.
    *
    * [[compact]] folds the accumulated deltas into one `c<id>` base
    * (small-file hygiene after many micro-batches); readers then union
    * base + post-compaction deltas. The INDEX is the production
    * artifact ([[graft.ops.DedupOps.incrementalNearDupsIndexed]]):
    * the per-batch anti-join and the pairing probe it — narrow rows,
    * a key plus two longs — and the stored TEXT is only read through
    * the candidate-id semi-join of the verification pass. */
  /** GENERIC append-only per-batch delta store — the contract
    * [[NearDupStore]] pioneered, factored for every incremental
    * maintenance sink: each batch overwrites only its own
    * `b<batchId>/<sub>` parquet dirs (one per registered sub-frame),
    * the tiny `latest` pointer flips LAST, readers union base +
    * committed deltas, and [[compact]] is the one explicit O(state)
    * fold. A replayed or crashed batch rewrites its own paths —
    * idempotent by construction. */
  class DeltaStore(spark: SparkSession, dir: String, subs: Seq[String]) {
    require(subs.nonEmpty && subs.distinct == subs)
    private val ptr = java.nio.file.Paths.get(dir, "latest")
    private val cptr = java.nio.file.Paths.get(dir, "compacted")
    private def readPtr(p: java.nio.file.Path): Long =
      if (java.nio.file.Files.exists(p))
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8").trim.toLong
      else -1L
    def lastBatchId(): Long = readPtr(ptr)
    def compactedId(): Long = readPtr(cptr)
    /** Committed delta dirs not yet folded into a compacted base —
      * the small-file pressure gauge the auto-compaction policy
      * ([[startIncrementalNearDups]]/[[startIncrementalJoin]]
      * `compactEvery`) triggers on. Driver-side name listing only. */
    def deltaCount(): Int = {
      val last = lastBatchId()
      val comp = compactedId()
      Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .count(f => f.isDirectory && f.getName.matches("b\\d+") && {
          val id = f.getName.drop(1).toLong
          id > comp && id <= last
        })
    }
    /** The every-N-batches policy: fold when the uncompacted delta
      * count reaches `every` (0 disables). Called by the sinks after
      * each committed batch, so a long-running stream's `b<id>` dir
      * count stays bounded by `every` instead of growing without
      * limit; crash safety is [[compact]]'s pointer-flip discipline
      * (a crash mid-fold leaves the old base + deltas intact). */
    def maybeCompact(every: Int): Unit =
      if (every > 0 && deltaCount() >= every) compact()
    /** Committed storage paths for one sub-frame: the compacted base
      * (if any) plus every delta it doesn't cover. Driver-side listing
      * of ≤ #batches dir names — bounded, and compaction keeps it
      * short. */
    private def parts(sub: String): Seq[String] = {
      val last = lastBatchId()
      val comp = compactedId()
      val base = if (comp >= 0L) Seq(s"$dir/c$comp/$sub") else Seq.empty
      val deltas = Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.matches("b\\d+"))
        .map(_.getName.drop(1).toLong)
        .filter(id => id > comp && id <= last)
        .sorted
        .map(id => s"$dir/b$id/$sub")
      base ++ deltas
    }
    def readSub(sub: String): Option[DataFrame] = {
      require(subs.contains(sub), s"unknown sub-frame $sub")
      // keep only paths that exist: a sub-frame ADDED to the layout
      // after a store was first written (the r16 "codes" addition) is
      // absent from older batch dirs — those batches contribute no
      // rows rather than a PATH_NOT_FOUND throw. Driver-side stat of
      // ≤ #batches dirs, same bound as parts() itself.
      val ps = parts(sub)
        .filter(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
      if (ps.isEmpty) None else Some(spark.read.parquet(ps: _*))
    }
    /** Write one batch's deltas (every registered sub, in `subs`
      * order) then flip the pointer. */
    def writeDelta(frames: Seq[DataFrame], batchId: Long): Unit = {
      require(frames.length == subs.length,
        s"expected ${subs.length} frames, got ${frames.length}")
      subs.zip(frames).foreach { case (sub, df) =>
        df.write.mode("overwrite").parquet(s"$dir/b$batchId/$sub")
      }
      java.nio.file.Files.write(ptr, s"$batchId\n".getBytes("UTF-8"))
    }
    /** Fold base + deltas into one `c<lastBatchId>` dir and drop the
      * folded sources. The ONLY O(state) operation in the store, run
      * when the operator chooses (e.g. every N batches), never
      * implicitly per batch. Crash-safe like the deltas: the new base
      * is written fully, the `compacted` pointer flips, THEN the
      * superseded dirs are removed. */
    def compact(): Unit = {
      val last = lastBatchId()
      if (last < 0L || parts(subs.head).size <= 1) return
      val prevComp = compactedId()
      for (sub <- subs)
        readSub(sub).get.write.mode("overwrite")
          .parquet(s"$dir/c$last/$sub")
      java.nio.file.Files.write(cptr, s"$last\n".getBytes("UTF-8"))
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rm)
        x.delete(); ()
      }
      Option(new java.io.File(dir).listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter { f =>
          f.isDirectory && (
            (f.getName.matches("b\\d+") &&
              f.getName.drop(1).toLong <= last) ||
            (f.getName == s"c$prevComp" && prevComp >= 0L))
        }
        .foreach(rm)
    }
  }

  class NearDupStore(spark: SparkSession, dir: String)
      extends DeltaStore(spark, dir,
        Seq("docs", "index", "codes", "pairs")) {
    def readDocs(): Option[DataFrame] = readSub("docs")
    def readIndex(): Option[DataFrame] = readSub("index")
    /** Per-doc 64-bit SimHash codes — the binary pre-filter tier's
      * stored artifact (8 bytes/doc beside the band index). */
    def readCodes(): Option[DataFrame] = readSub("codes")
    def readPairs(): Option[DataFrame] = readSub("pairs")
    def writeDelta(docs: DataFrame, index: DataFrame, codes: DataFrame,
        pairs: DataFrame, batchId: Long): Unit =
      writeDelta(Seq(docs, index, codes, pairs), batchId)
  }

  /** Streaming near-dup maintenance: every micro-batch's genuinely-new
    * docs (re-sent doc_ids are anti-joined away — at-least-once
    * DELIVERY must not make a doc its own near-duplicate) run through
    * [[graft.ops.DedupOps.incrementalNearDups]] against the stored
    * corpus, and the new pairs append to the stored pair set.
    *
    * No distinct() on the pair union: a pair emitted at batch i
    * touches ≥1 doc NEW at i, and later batches only emit pairs
    * touching their own new docs (disjoint by the anti-join), so the
    * same pair cannot be emitted twice — appends commute, exactly the
    * sketch-blob argument. That disjointness is what makes the
    * delta store sound: readers union the per-batch pair deltas and
    * get precisely the accumulated set.
    *
    * 100 TB shape: per-batch WRITE is O(batch) — the batch's new docs,
    * their index rows, their pairs, nothing else rewritten. Per-batch
    * READ is the narrow signature index (anti-join + bucket pairing,
    * Σ (new-in-bucket × bucket)) plus candidate-bounded text via the
    * verification semi-join — the raw corpus text is never scanned
    * into the pairing. Exactly-once: a replayed batch id ≤ the store's
    * `latest` pointer is a no-op, and a crashed batch replays onto its
    * own paths.
    *
    * Binary tier (`maxHamming` < 64, default 26): each doc's 64-bit
    * SimHash is stored beside its band rows, and candidate pairs are
    * pre-filtered by XOR+popcount Hamming distance BEFORE the exact-
    * Jaccard verification touches text — per-batch latency drops
    * because the expensive stage (candidate-bounded shingling + set
    * intersection) sees only code-close pairs, for one long-XOR per
    * candidate against an 8-byte/doc artifact. 64 disables the tier
    * (exact parity with the untiered path — StreamJobSpec gates
    * pair-for-pair equivalence on/off and that the tier strictly
    * prunes the verified candidate set).
    *
    * CONTRACT NOTE (recall): the default `maxHamming = 26` is a
    * recall TRADE, not an optimization — a true Jaccard ≥ threshold
    * pair whose 64-bit SimHashes land > 26 apart (the ~2.5-sigma
    * tail, likelier on short or token-permuted docs) is pruned before
    * verification and never emitted. Callers that need the exact
    * MinHash-band recall of the untiered path must pass
    * `maxHamming = 64` explicitly; the default favors per-batch
    * latency on long-document corpora where the tail is negligible. */
  def startIncrementalNearDups(docs: DataFrame, store: NearDupStore,
      checkpointDir: String, threshold: Double = 0.5,
      numHashes: Int = 32, bands: Int = 8, k: Int = 3,
      compactEvery: Int = 16, maxHamming: Int = 26): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > store.lastBatchId()) {
          val incoming = batch.select(col("doc_id"), col("text"))
            .filter(col("doc_id").isNotNull && col("text").isNotNull)
            .dropDuplicates("doc_id")
          // fresh and its index feed both the pairing and the delta
          // write — checkpoint each once (batch-sized frames)
          val fresh = (store.readIndex() match {
            case Some(oldIdx) => incoming.join(
              oldIdx.select("doc_id"), Seq("doc_id"), "left_anti")
            case None => incoming
          }).localCheckpoint()
          val idx = graft.ops.DedupOps
            .minhashBands(fresh, numHashes, bands, k).localCheckpoint()
          val codes = graft.ops.DedupOps.simhashes(fresh)
            .localCheckpoint()
          val newPairs = store.readIndex() match {
            case Some(oldIdx) =>
              // Pre-tier store layouts (docs/index/pairs, no "codes"
              // sub-frame) resume gracefully: SimHash is a pure
              // per-doc function of text, so missing codes are
              // recomputed from the stored docs instead of throwing.
              // A MIXED store (legacy batches + tiered batches) reads
              // as partial codes — the tier's left-join null-pass
              // (DedupOps.candsOf) sends code-less candidates to
              // exact verification unpruned, so coverage gaps cost
              // pruning, never recall.
              val oldDocs = store.readDocs().get
              val oldCodes = store.readCodes()
                .getOrElse(graft.ops.DedupOps.simhashes(oldDocs))
              graft.ops.DedupOps.incrementalNearDupsHammingTier(
                oldIdx, oldCodes, oldDocs,
                fresh, idx, codes, threshold, maxBucket = 500, k = k,
                maxHamming = maxHamming)
            case None =>
              graft.ops.DedupOps.incrementalNearDupsHammingTier(
                idx.limit(0), codes.limit(0), fresh.limit(0), fresh,
                idx, codes, threshold, maxBucket = 500, k = k,
                maxHamming = maxHamming)
          }
          store.writeDelta(fresh, idx, codes, newPairs, batchId)
          store.maybeCompact(compactEvery)
        }
        ()
      }
      .start()

  /** Incremental equi-JOIN view maintenance — classic IVM (the delta
    * rule every materialized-view engine implements): the view
    * V = A ⋈_k B is kept current under INSERT streams by joining only
    * deltas against snapshots,
    *
    *   ΔV = ΔA ⋈ (B ∪ ΔB)  ∪  A ⋈ ΔB
    *
    * (A, B = pre-batch snapshots). Every V-pair with both sides old
    * existed before the batch; a pair with a new A side lands in the
    * first term (including ΔA⋈ΔB), new-B-only pairs in the second —
    * each new pair exactly once, so V-deltas only ever APPEND, the
    * [[NearDupStore]] pairs argument generalized to arbitrary
    * equi-joins. Changes arrive as ONE tagged CDC stream
    * (tbl ∈ {a, b}, k = join key, id = row id); re-deliveries drop
    * out via id anti-joins against the stored sides.
    *
    * 100 TB shape: per-batch work is two delta-vs-snapshot equi-joins
    * (shuffle ∝ batch + matching snapshot partitions under AQE) and
    * O(batch + ΔV) writes — the view is never recomputed, never
    * rewritten. Stream-stream joins solve the WINDOWED flavor of this
    * ([[streamStreamJoin]]); this sink is the UNWINDOWED one their
    * state store cannot hold (joining today's rows against ALL
    * history). */
  def startIncrementalJoin(changes: DataFrame, store: DeltaStore,
      checkpointDir: String, compactEvery: Int = 16): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > store.lastBatchId()) {
          val in = batch.select(col("tbl"), col("k"), col("id"))
            .filter(col("tbl").isin("a", "b") &&
              col("k").isNotNull && col("id").isNotNull)
            .dropDuplicates("tbl", "id")
          def side(tag: String, idName: String): DataFrame = {
            val d = in.filter(col("tbl") === tag)
              .select(col("k"), col("id").as(idName))
            (store.readSub(tag) match {
              case Some(old) =>
                d.join(old.select(idName), Seq(idName), "left_anti")
              case None => d
            }).localCheckpoint()
          }
          val dA = side("a", "a_id")
          val dB = side("b", "b_id")
          val aOld = store.readSub("a").getOrElse(dA.limit(0))
          val bOld = store.readSub("b").getOrElse(dB.limit(0))
          val dV = dA.join(bOld.unionByName(dB), Seq("k"))
            .unionByName(aOld.join(dB, Seq("k")))
            .select(col("k"), col("a_id"), col("b_id"))
          store.writeDelta(Seq(dA, dB, dV), batchId)
          store.maybeCompact(compactEvery)
        }
        ()
      }
      .start()

  // ---------- distinct-count sketch-blob sink ----------
  //
  // The one aggregate [[startIncrementalDaily]]'s exact partials CANNOT
  // maintain: distinct counts don't merge (|A ∪ B| ≠ |A| + |B|), so an
  // incremental rollup of daily-distinct users would need the full
  // history rescanned every batch. Theta sketch BLOBS close the gap:
  // each micro-batch appends its per-day sketch rows, and any reader
  // answers distinct questions by sketch union over the stored blobs —
  // a mergeable, append-only architecture (no read-modify-write at
  // all), the streaming face of EventOps.thetaOverlapAudit's store.

  /** Per-day Theta sketch of one micro-batch's distinct usernames. */
  def sketchDelta(batch: DataFrame): DataFrame = batch
    .filter(col("created_at").isNotNull && col("username").isNotNull)
    .groupBy(to_date(col("created_at")).as("day"))
    .agg(expr("theta_sketch_agg(username)").as("sk"))

  /** Append-only sketch sink: each micro-batch OVERWRITES its own
    * `b<batchId>` subdirectory, so an at-least-once replay after
    * checkpoint recovery rewrites the same blobs instead of
    * double-appending — idempotence by path, no pointer file needed
    * (unlike the read-modify-write rollup store, appends of distinct
    * batch ids commute). */
  def startDistinctDailySketches(prepared: DataFrame, dir: String,
      checkpointDir: String): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          sketchDelta(batch).write.mode("overwrite").parquet(s"$dir/b$batchId")
        }
        ()
      }
      .start()

  /** Distinct usernames per day answered from the STORED blobs only —
    * no raw-row rescan, any date grain (regroup `day` coarser and the
    * same union still holds: sketches are associative). */
  def distinctDailyFromSketches(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/b*")
      .groupBy("day")
      .agg(expr("CAST(theta_sketch_estimate(theta_union_agg(sk)) AS BIGINT)")
        .as("n_users"))

  /** EXACT-distinct variant of the sketch-blob store: per-batch
    * per-day dense BITMAP blobs ([[graft.functions.BitmapBuild]])
    * under the same idempotent-by-path append contract as
    * [[startDistinctDailySketches]]. Where the Theta store answers
    * any-grain distincts within sketch tolerance, the bitmap store's
    * blob-OR is lossless — the stored partials reproduce
    * `count(DISTINCT)` exactly at any regrouping, which is the
    * warehouse-grade guarantee for billing/compliance counts. Needs
    * the dense-integral-id premise the aggregate enforces (maxId
    * bits per blob); id spaces that can't promise it stay on the
    * sketch path. */
  def bitmapDelta(batch: DataFrame, idCol: String, tsCol: String,
      maxId: Int): DataFrame = batch
    .filter(col(tsCol).isNotNull && col(idCol).isNotNull)
    .groupBy(to_date(col(tsCol)).as("day"))
    .agg(graft.functions.BitmapAgg.bitmapBuild(col(idCol), maxId).as("bm"))

  def startDistinctDailyBitmaps(prepared: DataFrame, dir: String,
      checkpointDir: String, idCol: String, tsCol: String,
      maxId: Int): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          bitmapDelta(batch, idCol, tsCol, maxId)
            .write.mode("overwrite").parquet(s"$dir/b$batchId")
        }
        ()
      }
      .start()

  /** Exact distinct ids per day from the STORED blobs only — no raw
    * rescan; regroup coarser (week, month, all-time) and the same
    * OR-merge still answers exactly. */
  def distinctDailyFromBitmaps(spark: SparkSession, dir: String,
      maxId: Int): DataFrame =
    spark.read.parquet(s"$dir/b*")
      .groupBy("day")
      .agg(graft.functions.BitmapAgg.bitmapCardinality(col("bm"), maxId)
        .as("n_users"))

  /** Per-batch EXACT binned-value histogram blobs — the QUANTILE face
    * of the store-once/union-any-grain family (Theta for distincts,
    * bitmap for exact distincts, Misra–Gries for heavy hitters, this
    * for percentiles): each micro-batch appends its own (day, bin)
    * count frame under the idempotent-by-path `b<batchId>` contract.
    * Integer-width bins make the partials EXACT and trivially
    * mergeable — readers re-collapse the stored blobs at ANY grain
    * (day, week, all-time) and answer binned quantiles with no raw-row
    * rescan and no sketch tolerance, the [[graft.ops.EventOps
    * .ksValueDrift]] bounded-support argument applied to storage.
    * Per-batch cost: one grouped pass + a ≤|bins|·|days| row write. */
  def histogramDelta(batch: DataFrame, valueCol: String,
      tsCol: String): DataFrame = batch
    .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
    .groupBy(to_date(col(tsCol)).as("day"),
      floor(col(valueCol)).cast("long").as("bin"))
    .agg(count(lit(1)).as("cnt"))

  def startValueHistogramBlobs(prepared: DataFrame, dir: String,
      checkpointDir: String, valueCol: String = "value",
      tsCol: String = "created_at"): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          histogramDelta(batch, valueCol, tsCol)
            .write.mode("overwrite").parquet(s"$dir/b$batchId")
        }
        ()
      }
      .start()

  /** Exact binned quantiles from the STORED histogram blobs only —
    * for each requested q, the smallest bin whose cumulative count
    * reaches ⌈q·n⌉, decided by integer cross-multiplication
    * (cum·10⁶ ≥ q_ppm·n — no float rank arithmetic). The one serial
    * window orders the value-range-bounded bin grid. Regroup the
    * blobs by day/week first and the same arithmetic answers
    * per-grain quantiles. */
  def quantilesFromHistogramBlobs(spark: SparkSession, dir: String,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val h = spark.read.parquet(s"$dir/b*")
      .groupBy("bin").agg(sum("cnt").as("cnt"))
    val w = Window.orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h.withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(h.agg(sum("cnt").as("n"))))
    val qdf = qs.map(q => math.round(q * 1e6)).toDF("q_ppm")
    cum.join(broadcast(qdf),
        col("cum") * lit(1000000L) >= col("q_ppm") * col("n"))
      .groupBy("q_ppm")
      .agg(min("bin").as("bin_at_q"), max("n").as("n_total"))
      .select(col("q_ppm"), col("n_total"), col("bin_at_q"))
  }

  /** Mergeable-QUANTILE blob store — the continuous-domain companion
    * of [[histogramDelta]] (whose exact bins need an integer-width
    * grid): each micro-batch appends one per-day KLL sketch blob
    * ([[graft.functions.KllBuild]], see [[graft.functions.KllSketch]]
    * for the worst-case-rank-error contract) under the
    * idempotent-by-path `b<batchId>` contract. Readers merge blobs at
    * ANY grain (day, week, all-time) with [[graft.functions.KllMerge]]
    * — error bounds ADD across merges, so the answer ships with its
    * own validity certificate and no raw row is ever rescanned. */
  def kllDelta(batch: DataFrame, valueCol: String, tsCol: String,
      k: Int = 200): DataFrame = batch
    .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
    .groupBy(to_date(col(tsCol)).as("day"))
    .agg(graft.functions.KllSketch
      .kllBuild(col(valueCol).cast("double"), k).as("kll"))

  def startValueKllBlobs(prepared: DataFrame, dir: String,
      checkpointDir: String, valueCol: String = "value",
      tsCol: String = "created_at", k: Int = 200): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          kllDelta(batch, valueCol, tsCol, k)
            .write.mode("overwrite").parquet(s"$dir/b$batchId")
        }
        ()
      }
      .start()

  /** Quantiles per day from the STORED KLL blobs only — one
    * blob-merge per day plus scalar quantile reads, each row carrying
    * n and the accumulated worst-case rank-error bound. Regroup
    * coarser and the same merge answers any grain. */
  def quantilesDailyFromKllBlobs(spark: SparkSession, dir: String,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99), k: Int = 200): DataFrame = {
    import graft.functions.KllSketch._
    val merged = spark.read.parquet(s"$dir/b*")
      .groupBy("day")
      .agg(kllMerge(col("kll"), k).as("kb"))
    val qCols = qs.map(q =>
      round(kllQuantile(col("kb"), lit(q)), 6).as(s"q_${(q * 100).toInt}"))
    merged.select(Seq(col("day"), kllN(col("kb")).as("n"),
      kllErrBound(col("kb")).as("rank_err_bound")) ++ qCols: _*)
  }

  /** Streaming heavy-hitter maintenance — the MERGEABLE face of
    * [[graft.ops.DocOps.heavyHitterTerms]] (whose exact-recount second
    * pass a stream cannot make): each micro-batch appends its own
    * Misra–Gries summary blob (≤ k narrow rows + a 1-row token total)
    * under the same idempotent-by-path `b<batchId>` contract as
    * [[startDistinctDailySketches]]. Readers merge the stored
    * summaries — per-term sums + one reduction cut — and answer with
    * lower/upper count bounds; the merged under-count stays ≤
    * N/(k+1) (Agarwal et al., mergeable summaries), so every term
    * with true frequency above N/k is guaranteed present no matter
    * how the stream was batched or partitioned. Per-batch cost:
    * one token pass + a ≤ k-row write; no history rescan, ever. */
  def startHeavyHitterSketches(docs: DataFrame, dir: String,
      checkpointDir: String, k: Int = 200): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val toks = batch
            .filter(col("text").isNotNull)
            .select(explode(graft.ops.DedupOps.tokens(col("text")))
              .as("term"))
          graft.ops.DocOps.mgSummary(toks, k)
            .write.mode("overwrite").parquet(s"$dir/b$batchId/summary")
          toks.agg(count(lit(1)).as("n_tokens"))
            .write.mode("overwrite").parquet(s"$dir/b$batchId/meta")
        }
        ()
      }
      .start()

  /** Heavy hitters answered from the STORED summary blobs only: merged
    * lower bounds plus the ceil(N/k) upper-bound cushion. Contains
    * every term with true count > N/k; each reported term's true count
    * lies in [c_lb, c_ub]. */
  def heavyHittersFromSketches(spark: SparkSession, dir: String,
      k: Int = 200): DataFrame = {
    val merged = graft.ops.DocOps.mgReduce(
      spark.read.parquet(s"$dir/b*/summary"), k)
    val n = spark.read.parquet(s"$dir/b*/meta")
      .agg(sum(col("n_tokens")).as("n_total"))
    merged.crossJoin(broadcast(n))
      .select(col("term"), col("c_lb"),
        (col("c_lb") + expr("(n_total + " + k + " - 1) div " + k))
          .as("c_ub"))
  }

  /** Stream-stream inner join with watermarks and a time-range bound —
    * the remaining Structured Streaming category (the reference joins
    * nothing, SURVEY.md §2.3). Both sides carry watermarks so the state
    * store can evict rows once the range condition can no longer match;
    * without the bound the join state would grow forever. */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      watermark: String = "10 minutes",
      within: String = "5 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
        l(key) === r(key) &&
          r(rightTs) >= l(leftTs) &&
          r(rightTs) <= l(leftTs) + org.apache.spark.sql.functions
            .expr(s"INTERVAL $within"),
        joinType)
      .drop(r(key)) // keep one unambiguous copy of the join key
  }

  /** LEFT OUTER stream-stream join: unmatched left rows surface
    * null-padded — but only once the right-side WATERMARK passes the
    * end of their match window (before that, a match could still
    * arrive; the state store must hold the row). The time-range bound
    * is what makes the outer semantics finite: without it an
    * unmatched row could never be declared unmatched and its state
    * never evicted. Emission latency for the null-padded rows is
    * therefore governed by the watermark delay, not the trigger —
    * the contract StreamJobSpec pins with a late watermark-advancing
    * batch. */
  def streamStreamJoinOuter(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      watermark: String = "10 minutes",
      within: String = "5 minutes"): DataFrame =
    streamStreamJoin(left, right, key, leftTs, rightTs, watermark,
      within, "left_outer")

  /** FULL OUTER stream-stream join — [[streamStreamJoinOuter]]'s
    * both-sides completion (supported since Spark 3.1 under the same
    * watermark + time-bound contract): unmatched LEFT rows null-pad
    * once the right watermark passes their window, unmatched RIGHT
    * rows symmetrically. The key must be COALESCED across sides (a
    * right-only row has a null left key — the plain `drop(r(key))`
    * of the inner form would blank its key entirely). */
  def streamStreamJoinFullOuter(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      watermark: String = "10 minutes",
      within: String = "5 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
        l(key) === r(key) &&
          r(rightTs) >= l(leftTs) &&
          r(rightTs) <= l(leftTs) + org.apache.spark.sql.functions
            .expr(s"INTERVAL $within"),
        "full_outer")
      .withColumn("__k", coalesce(l(key), r(key)))
      .drop(l(key)).drop(r(key))
      .withColumnRenamed("__k", key)
  }

  /** The idiomatic Spark-native alternative the reference lacks
    * (SURVEY.md §2.8): true streaming windowed aggregation with a
    * watermark — one row per window in update mode, late data beyond
    * the watermark dropped. */
  def windowedCountsNative(prepared: DataFrame,
      watermark: String = "2 minutes"): DataFrame =
    prepared
      .withWatermark("created_at", watermark)
      .groupBy(window(col("created_at"), "1 minute").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("cnt"))

  /** TRUE streaming gap-sessionization — the native `session_window`
    * aggregate under a watermark, the one Structured Streaming
    * aggregation class the engine didn't yet run streaming (batch twin:
    * [[graft.ops.EventOps.sessionWindowStats]], oracle-gated as
    * `session_window_stats`). State: one open session per (user,
    * window) in the state store; gap-mergeable, so partial sessions
    * combine as events arrive out of order WITHIN the watermark.
    * Append mode emits a session exactly once — when the watermark
    * passes `end` (last event + gap) and no event can extend it — so
    * downstream consumers see only FINAL sessions: the streaming
    * contract batch gaps-and-islands can't give without reprocessing.
    *
    * 100 TB shape: state is keyed by (user_id, session), evicted at
    * watermark — memory ∝ concurrently-OPEN sessions, never history.
    * Input needs (user_id, ts TIMESTAMP, value). */
  def sessionizedStats(events: DataFrame, gapMinutes: Int = 30,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(graft.ops.Num.dec2(col("value"))), 4).cast("double")
          .as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"),
        col("session_value"))

  // ---------- streaming distribution-drift monitor ----------

  /** Per-micro-batch categorical drift monitor —
    * `EventOps.psiTypeDrift` lifted into the stream: every batch's mix
    * over `column` is scored against a FIXED reference distribution
    * (`reference`: one (category, n) row per category) with the
    * population-stability index, and one row per batch lands in the
    * `drift_scores` table: (batch_id, n_rows, psi, n_unseen) — the
    * alert feed a streaming data-quality dashboard tails (rule of
    * thumb: psi > 0.2 = significant drift).
    *
    * PSI terms need BOTH shares > 0. Batch categories the reference
    * never saw have no finite term and are counted in `n_unseen`
    * instead — at real drift severity that count IS the alert.
    * Reference categories absent from the batch contribute nothing
    * (their batch share is 0); wholesale disappearance surfaces as
    * PSI from the remaining mass plus a shrunken n_rows.
    *
    * Scale: the batch collapses to |categories| rows before the
    * broadcast-joined scoring; the reference total is one bounded
    * driver scalar computed at start; the appended row is O(1).
    * Appends carry batch_id, so at-least-once replays dedupe
    * downstream (the same contract as every other append sink
    * here). */
  /** Mean embedding of a vector column as a plain array — ONE per-dim
    * aggregation; the collect is dim-sized (a model constant, e.g. 64
    * floats), the bounded-artifact class the IVF centroid cache
    * established, never data-proportional. */
  def meanVector(df: DataFrame, vecCol: String = "embedding"): Array[Double] = {
    val rows = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("dim").agg(avg(col("v").cast("double")).as("m"))
      .orderBy("dim").collect()
    rows.map(_.getAs[Double]("m"))
  }

  /** Streaming EMBEDDING drift monitor — [[startDriftMonitor]]'s
    * vector-space sibling: each micro-batch's mean embedding is scored
    * against a fixed reference centroid (take it from
    * [[meanVector]] over the training corpus) with cosine similarity
    * and the L2 centroid shift, one (batch_id, n_rows, cosine_to_ref,
    * l2_shift) row per batch. The alert feed for "this week's crawl
    * embeds somewhere else than the corpus we trained on" — semantic
    * drift that categorical PSI over metadata cannot see.
    *
    * Per batch: one per-dim aggregation over the batch (map-side
    * combinable), then dim-sized driver arithmetic — O(batch) work,
    * O(dim) state, nothing replayed. Degenerate all-zero means score
    * cosine 0 rather than NaN (stated). */
  def startEmbeddingDriftMonitor(vecs: DataFrame, reference: Array[Double],
      appender: Appender, checkpointDir: String): StreamingQuery = {
    require(reference.nonEmpty, "reference centroid must be non-empty")
    val refNorm = math.sqrt(reference.map(x => x * x).sum)
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val nRows = batch.count()
        if (nRows > 0L) {
          val m = meanVector(batch)
          require(m.length == reference.length,
            s"dimension mismatch: batch ${m.length} vs reference " +
              s"${reference.length}")
          val dot = m.zip(reference).map { case (a, b) => a * b }.sum
          val mNorm = math.sqrt(m.map(x => x * x).sum)
          val cos =
            if (mNorm == 0.0 || refNorm == 0.0) 0.0 else dot / (mNorm * refNorm)
          val shift = math.sqrt(
            m.zip(reference).map { case (a, b) => (a - b) * (a - b) }.sum)
          appender("embedding_drift",
            Seq((batchId, nRows, cos, shift))
              .toDF("batch_id", "n_rows", "cosine_to_ref", "l2_shift"))
        }
        ()
      }
      .start()
  }

  def startDriftMonitor(prepared: DataFrame, column: String,
      reference: DataFrame, appender: Appender,
      checkpointDir: String): StreamingQuery = {
    val refCounts = reference
      .select(col("category"), col("n").cast("long").as("rn"))
    val refTotal = refCounts.agg(sum("rn")).head.getLong(0)
    require(refTotal > 0L, "drift reference must be non-empty")
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val bc = batch.groupBy(col(column).as("category"))
          .agg(count(lit(1)).as("bn"))
        val nRows = bc.agg(coalesce(sum("bn"), lit(0L))).head.getLong(0)
        if (nRows > 0L) {
          val pb = col("bn").cast("double") / lit(nRows.toDouble)
          val pr = col("rn").cast("double") / lit(refTotal.toDouble)
          val scored = bc.join(broadcast(refCounts), Seq("category"), "left")
            .agg(
              coalesce(sum(when(col("rn").isNotNull,
                (pb - pr) * log((col("bn").cast("double") *
                  lit(refTotal.toDouble)) /
                  (col("rn").cast("double") * lit(nRows.toDouble))))),
                lit(0.0)).as("psi"),
              sum(when(col("rn").isNull, 1L).otherwise(0L)).as("n_unseen"))
            .head
          appender("drift_scores",
            Seq((batchId, nRows, scored.getAs[Double]("psi"),
              scored.getAs[Long]("n_unseen")))
              .toDF("batch_id", "n_rows", "psi", "n_unseen"))
        }
        ()
      }
      .start()
  }

  // ---------- streaming sequential experimentation monitor ----------

  /** Streaming arm of the Wald SPRT — the "peek every BATCH without
    * inflating α" monitor pairing `EventOps.sprtDailyAb`: each
    * micro-batch of trials (rows with a boolean `converted`) appends
    * ONE exact (batch_id, n, x) count row; the sink itself is
    * stateless and idempotent (a replayed batch re-appends the same
    * batch_id row — [[sprtFromCounts]] collapses duplicates), the
    * store-once/derive-any-decision contract of the sketch-blob
    * family. No O(corpus) state, no cumulative mutation in the sink:
    * the DECISION is a pure reader over the log. */
  def startSprtCounts(prepared: DataFrame, appender: Appender,
      checkpointDir: String): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val r = batch.agg(count(lit(1)).as("n"),
          coalesce(sum(when(col("converted"), 1L).otherwise(0L)),
            lit(0L)).as("x")).head
        val n = r.getLong(0)
        if (n > 0L)
          appender("sprt_counts",
            Seq((batchId, n, r.getLong(1))).toDF("batch_id", "n", "x"))
        ()
      }
      .start()

  /** Decision reader over a [[startSprtCounts]] log: duplicates from
    * at-least-once re-delivery collapse by batch_id (a replayed batch
    * carries identical counts, so max ≡ the original), then the shared
    * `EventOps.sprtOverLog` chain emits the cumulative LLR and Wald
    * decision per batch — (batch_id, n, x, cum_n, cum_x, llr,
    * decision). */
  def sprtFromCounts(log: DataFrame, p0: Double = 0.02,
      p1: Double = 0.04, alpha: Double = 0.05,
      beta: Double = 0.05): DataFrame =
    graft.ops.EventOps.sprtOverLog(
      log.groupBy("batch_id")
        .agg(max(col("n")).as("n"), max(col("x")).as("x")),
      "batch_id", p0, p1, alpha, beta)

  // ---------- streaming mean-shift (Page–Hinkley) monitor ----------

  /** Streaming arm of the Page–Hinkley detector pairing
    * `EventOps.pageHinkleyByType`: each micro-batch of valued rows
    * appends ONE exact (batch_id, n, s) count/cent-sum row — the same
    * stateless, idempotent, store-once contract as
    * [[startSprtCounts]] (a replayed batch re-appends an identical
    * batch_id row; [[pageHinkleyFromCounts]] collapses duplicates).
    * No O(corpus) state, no cumulative mutation in the sink: the
    * DETECTION is a pure reader over the log. */
  def startPhCounts(prepared: DataFrame, appender: Appender,
      checkpointDir: String): StreamingQuery =
    prepared.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val r = batch.agg(count(lit(1)).as("n"),
          coalesce(sum((col("value").cast("decimal(12,2)") * lit(100))
            .cast("bigint")), lit(0L)).as("s")).head
        val n = r.getLong(0)
        if (n > 0L)
          appender("ph_counts",
            Seq((batchId, n, r.getLong(1))).toDF("batch_id", "n", "s"))
        ()
      }
      .start()

  /** Detection reader over a [[startPhCounts]] log: duplicates from
    * at-least-once re-delivery collapse by batch_id (identical
    * counts, so max ≡ original), then the micro-pinned Page–Hinkley
    * chain of `EventOps.pageHinkleyByType` runs over the BATCH-MEAN
    * series — each batch's mean value is one pinned division
    * re-pinned to BIGINT micro-cents, so mₜ and both PH statistics
    * are exact integer arithmetic over the ≤ #batches-row frame.
    * Emits (batch_id, n, mean_value, ph_inc, ph_dec) in value
    * units. */
  def pageHinkleyFromCounts(log: DataFrame): DataFrame = {
    val batches = log.groupBy("batch_id")
      .agg(max(col("n")).as("n"), max(col("s")).as("s"))
    val w = Window.orderBy(col("batch_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val xm = round((col("s").cast("double") / col("n").cast("double")) *
      lit(1000000.0), 0).cast("long")
    val run = batches.withColumn("xm", xm)
      .withColumn("cum_x", sum(col("xm")).over(w))
      .withColumn("k", row_number().over(
        Window.orderBy(col("batch_id").asc)).cast("long"))
    val q = round((col("cum_x").cast("double") / col("k").cast("double")),
      0).cast("long")
    val withM = run.withColumn("q", q)
      .withColumn("m", col("cum_x") - sum(col("q")).over(w))
    withM
      .withColumn("ph_inc_m", col("m") - min(col("m")).over(w))
      .withColumn("ph_dec_m", max(col("m")).over(w) - col("m"))
      .select(col("batch_id"), col("n"),
        round(col("s").cast("double") / lit(100.0) /
          col("n").cast("double"), 6).as("mean_value"),
        round(col("ph_inc_m").cast("double") / lit(1000000.0) /
          lit(100.0), 6).as("ph_inc"),
        round(col("ph_dec_m").cast("double") / lit(1000000.0) /
          lit(100.0), 6).as("ph_dec"))
  }
}
