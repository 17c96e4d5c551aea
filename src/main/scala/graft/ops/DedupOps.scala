package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication at corpus scale — the training-data-pipeline operators
  * (exact, MinHash+LSH, SimHash, n-gram Jaccard) built entirely from
  * codegen'd higher-order functions + joins. No UDFs, no driver-side
  * loops: every stage is a scan, an explode, or a hash shuffle, so the
  * same plans run unchanged on a 1000-executor cluster.
  *
  * The exact-dedup shape generalizes the reference's row_number dedup
  * (`/root/reference/src/batch_clean_historical.py:34-37`); the rest is
  * the standard near-dup stack (MinHash banding per Broder '97;
  * SimHash per Charikar '02 — see PAPERS.md).
  */
object DedupOps {

  // ---------- shared text normalization / shingling ----------

  /** Whitespace-tokenized, lowercased tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Distinct word k-shingles ("k-grams of tokens"). Empty array when
    * the doc has fewer than k tokens (sequence() would otherwise count
    * DOWN for a negative span — a real Spark footgun). */
  def shingles(text: Column, k: Int = 3): Column = {
    val t = tokens(text)
    val idx = sequence(lit(0), size(t) - k)
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until k).map(o => element_at(t, i + o + 1)): _*))
    when(size(t) >= k, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }

  // ---------- exact dedup ----------

  /** Exact-duplicate groups by content hash: one hash-shuffle groupBy.
    * At 100 TB this is the cheapest possible dedup — the md5 collapses
    * each doc to 32 bytes before the shuffle. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"))
      .filter(col("n_docs") > 1)

  /** Exact dedup keeping the smallest doc_id per normalized fingerprint
    * (whitespace-collapsed, lowercased — DocOps.fingerprint). */
  def dedupExact(docs: DataFrame): DataFrame =
    docs
      .groupBy(DocOps.fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  // ---------- n-gram Jaccard (exact near-dup baseline) ----------

  /** Exact pairwise Jaccard over word-shingle sets, via the inverted
    * index: explode shingles, self-join on the shingle, count shared,
    * |A∪B| = |A|+|B|-shared. Quadratic in per-shingle document
    * frequency — correct baseline for verification; use
    * [[minhashCandidates]] as the scale path (its banding bounds the
    * join). `maxDf` drops degenerate stopword-shingles that would blow
    * up the self-join (standard inverted-index pruning). */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5,
      k: Int = 3, maxDf: Long = 1000): DataFrame = {
    val sets = docs.select(col("doc_id"), shingles(col("text"), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n"))
    val inv = sets.select(col("doc_id"), explode(col("sh")).as("sh"))
    val pruned = inv
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("df") <= maxDf)
      .drop("df")
    val shared = pruned.as("a")
      .join(pruned.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n", "n_a"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n", "n_b"), "b_id")
      .withColumn("jaccard",
        round(col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ---------- MinHash + LSH banding (scale path) ----------

  /** k deterministic minhash values per doc: h_i = min over shingles of
    * xxhash64(shingle, i). Pure expressions (transform + array_min) —
    * one scan, no shuffle, no UDF. */
  def minhashSignature(text: Column, numHashes: Int = 32, k: Int = 3): Column = {
    val sh = shingles(text, k)
    val sig = (0 until numHashes).map { seed =>
      array_min(transform(sh, s => xxhash64(s, lit(seed))))
    }
    array(sig: _*)
  }

  /** LSH banding: split the signature into `bands` bands of
    * `numHashes/bands` rows, hash each band to a bucket key, explode to
    * (doc_id, band_id, bucket). Similar docs collide in ≥1 band w.h.p.
    * (s-curve threshold ≈ (1/b)^(1/r)). */
  def minhashBands(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
      k: Int = 3): DataFrame = {
    val rows = numHashes / bands
    val sig = minhashSignature(col("text"), numHashes, k)
    val bandKeys = array((0 until bands).map { b =>
      xxhash64(concat_ws(",",
        (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*))
    }: _*)
    docs
      .filter(size(shingles(col("text"), k)) > 0)
      .withColumn("sig", sig)
      .select(col("doc_id"), posexplode(bandKeys).as(Seq("band_id", "bucket")))
  }

  /** Candidate near-dup pairs from band-bucket collisions: shuffle on
    * (band_id, bucket) — only docs sharing a bucket are ever paired, so
    * the join cost is Σ bucket_size², not n². `maxBucket` caps
    * degenerate buckets (all-identical spam) to bound the worst case. */
  def minhashCandidates(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
      k: Int = 3, maxBucket: Long = 500): DataFrame = {
    val b = minhashBands(docs, numHashes, bands, k)
    val capped = b
      .withColumn("bsz", count(lit(1)).over(org.apache.spark.sql.expressions
        .Window.partitionBy("band_id", "bucket")))
      .filter(col("bsz") <= maxBucket)
      .drop("bsz")
    capped.as("a")
      .join(capped.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** Full MinHash near-dup pipeline: LSH candidates, then exact Jaccard
    * verification on just the candidate pairs (join back to the shingle
    * sets — two broadcast-able lookups at candidate cardinality). */
  def minhashNearDups(docs: DataFrame, threshold: Double = 0.5,
      numHashes: Int = 32, bands: Int = 8, k: Int = 3): DataFrame = {
    val cands = minhashCandidates(docs, numHashes, bands, k)
    val sets = docs.select(col("doc_id"), shingles(col("text"), k).as("sh"))
    cands
      .join(sets.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash: per token-hash, each bit votes ±1; the sign of the
    * per-bit sum forms the fingerprint. Nested higher-order functions
    * (aggregate over bits × tokens) — still one scan, codegen'd. */
  def simhash(text: Column): Column = {
    val toks = tokens(text)
    val hashes = transform(toks, t => xxhash64(t))
    // Scala-API shiftright/shiftleft take Int shift amounts; inside a
    // lambda the shift is a Column, so go through the SQL registry.
    def shr(c: Column, n: Column) = call_function("shiftright", c, n)
    def shl(c: Column, n: Column) = call_function("shiftleft", c, n)
    val bits = transform(sequence(lit(0), lit(63)), b => {
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shr(h, b).bitwiseAND(lit(1L)) === 1L,
          lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L)).otherwise(lit(0L))
    })
    aggregate(
      zip_with(bits, sequence(lit(0), lit(63)), (bit, i) => shl(bit, i)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash fingerprints per doc. */
  def simhashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), simhash(col("text")).as("simhash"))

  /** SimHash near-dups: band the 64-bit fingerprint into 4×16-bit
    * chunks (two docs within Hamming distance 3 share ≥1 exact chunk —
    * pigeonhole), bucket-join on the chunks, verify with exact Hamming.
    * Same bucketed-join scale shape as MinHash. */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val fps = simhashes(docs)
    val chunked = fps.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk_id", "chunk")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_id") === col("b.chunk_id") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        hamming(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
