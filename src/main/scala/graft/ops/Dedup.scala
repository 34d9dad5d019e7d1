package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash and n-gram Jaccard. All are driven by Spark
  * built-ins (codegen'd) up to the final per-bucket pair generation, which
  * is bounded by LSH bucket sizes — no O(n²) cross joins at corpus scale.
  */
object Dedup {

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Exact dedup: hash-groupBy on content. (doc_id = representative min,
    * n = group size, text_md5 = content hash.) Scale: one shuffle on the
    * 128-bit digest; skew-free (uniform hash keys).
    */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
      .select("doc_id", "n", "text_md5")

  val exactSql: String =
    "SELECT min(doc_id) AS doc_id, count(*) AS n, md5(text) AS text_md5 " +
      "FROM documents GROUP BY md5(text)"

  /** Word 3-shingles as one column (xxhash64 per shingle → LongType). */
  private def shinglesOf(d: DataFrame): DataFrame = {
    val toks = d.select(
      col("doc_id"),
      filter(split(lower(col("text")), " "), t => t =!= "").as("toks"))
    // sliding 3-grams via transform over indices (codegen-friendly)
    toks
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 3)
      .withColumn("sh",
        transform(sequence(lit(0), col("n") - 3), i =>
          xxhash64(concat_ws(" ",
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3)))))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .distinct()
  }

  /** MinHash signatures: numHashes permutations h_i(x) = (a_i·x + b_i) mod p
    * computed as numHashes aggregate expressions in ONE hash aggregate —
    * map-side partial min, no per-permutation shuffle.
    */
  def minhashSignatures(
      spark: SparkSession,
      sfDir: String,
      numHashes: Int = 32): DataFrame =
    minhashSignaturesOf(docs(spark, sfDir), numHashes)

  def minhashSignaturesOf(d: DataFrame, numHashes: Int = 32): DataFrame = {
    // p = 2^31-1 keeps a·x+b < 2^62: no Long overflow under ANSI mode
    val p = 2147483647L
    val rnd = new scala.util.Random(42)
    val coef = Array.fill(numHashes)(
      (1 + rnd.nextLong(p - 1), rnd.nextLong(p)))
    val sh = shinglesOf(d)
      .withColumn("x", pmod(col("shingle"), lit(p)))
    val aggs = coef.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("x") * a + b, lit(p))).as(s"mh$i")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH near-dup pairs: band the signature (bands × rowsPerBand
    * = numHashes), bucket-join within (band, bandHash), verify with the
    * signature-estimated Jaccard ≥ threshold.
    *
    * Duplicate-cluster hardening: exact duplicates agree on ALL bands, so
    * banding them directly makes every band-bucket hold the whole cluster —
    * O(c²) join rows per cluster per band (web corpora have 10⁴–10⁵-doc
    * clusters). Instead, docs are first collapsed to one REPRESENTATIVE per
    * md5(text) group; only representatives (distinct texts) are banded, and
    * pairs are re-expanded through the groups afterwards. Identical texts
    * have identical signatures, so the output pair set is exactly the same —
    * intra-group pairs all have est_jaccard 1.0, inter-group pairs inherit
    * their representatives' estimate.
    */
  def minhashPairs(
      spark: SparkSession,
      sfDir: String,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.7): DataFrame = LiveResultCache.getOrCompute(
    "minhash", s"$sfDir|${LiveResultCache.fingerprint(spark,
      s"$sfDir/documents.parquet")}|$numHashes|$bands|$threshold") {
    // integer-divided rows would silently exclude the tail hashes from
    // banding while est_jaccard still divides by the full numHashes
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val rows = numHashes / bands
    // banding only ever saw docs with ≥3 tokens (shingle minimum); keep
    // the group universe identical so tiny exact-dups stay excluded
    val d = docs(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .filter(size(filter(split(lower(col("text")), " "),
        t => t =!= "")) >= 3)
    // adaptive plan: the md5-group machinery only pays off when exact-dup
    // clusters exist. One cheap aggregate decides; a dup-free corpus (the
    // common shape after upstream exact dedup) skips three joins and the
    // intra-group expansion entirely. Same output either way.
    val keyed = d.select(col("doc_id"), md5(col("text")).as("k"))
    val grouped = keyed.groupBy("k")
      .agg(min(col("doc_id")).as("gid"), count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hasDups = grouped.filter(col("n") > 1).limit(1).count() > 0
    val membership =
      if (!hasDups) null
      else keyed
        .join(grouped.select(col("k"), col("gid")), "k")
        .select(col("doc_id"), col("gid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps =
      if (!hasDups) d
      else d.join(
        membership.filter(col("doc_id") === col("gid")).select("doc_id"),
        "doc_id")

    val sig = minhashSignaturesOf(reps, numHashes)
    val sigCols = (0 until numHashes).map(i => col(s"mh$i"))
    // the signature pipeline feeds the banding AND two join-backs — persist
    // it once instead of recomputing the shingle aggregation per reference
    val withArr = sig.select(col("doc_id"), array(sigCols: _*).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // band hash = xxhash64 over the signature SLICE (hashes the array
    // values directly — one compact expression instead of 8 casts+concat
    // per band, which kept whole-stage codegen compilation small)
    val banded = withArr.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rows + lit(1), lit(rows))).as("bh"))))
        .as("bb"))
      .select(col("doc_id"),
        col("bb.band").as("band"), col("bb.bh").as("bh"))

    val a = banded.as("a")
    val b = banded.as("b")
    // distinct over the slim (gid, gid) pairs only; signatures joined back
    val cand = a.join(b,
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ga"), col("b.doc_id").as("gb"))
      .distinct()
    val repPairs = cand
      .join(withArr.select(col("doc_id").as("ga"),
        col("sig").as("sig_a")), "ga")
      .join(withArr.select(col("doc_id").as("gb"),
        col("sig").as("sig_b")), "gb")
      .withColumn("est_jaccard",
        aggregate(
          zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("ga"), col("gb"), col("est_jaccard"))

    // expansion back to doc pairs IS the output size — unavoidable for a
    // pair-listing contract; the quadratic work no longer enters any join
    val expanded =
      if (!hasDups)
        repPairs.select(col("ga").as("id_a"), col("gb").as("id_b"),
          col("est_jaccard"))
      else {
        val m = membership
        val intra = m.as("x").join(m.as("y"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
            lit(1.0).as("est_jaccard"))
          .filter(lit(1.0) >= threshold)
        val inter = repPairs
          .join(m.select(col("gid").as("ga"), col("doc_id").as("id_a")), "ga")
          .join(m.select(col("gid").as("gb"), col("doc_id").as("id_b")), "gb")
          .select(
            least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"),
            col("est_jaccard"))
        intra.unionByName(inter)
      }

    (expanded
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 3)
        .as("est_jaccard"))
      .orderBy("id_a", "id_b"),
      Seq(grouped, membership, withArr))
  }

  /** 64-bit SimHash per doc: sign of tf-weighted bit sums of token hashes.
    *
    * r6 shape: the 64 per-bit signed tf sums are 64 DECLARATIVE `sum`
    * aggregates in one hash aggregate — partial-aggregated map-side, so
    * ONE 64-long row per doc per partition reaches the shuffle — and the
    * signature is a narrow 64-term bit recombine above it. Replaces a
    * `groupByKey.mapGroups` that shipped every (doc, token, tf, hash)
    * row through the exchange into a per-group closure outside codegen
    * (guide §2.3 "aggregate before you shuffle" / round rule 4: no
    * Scala closures on the hot path). Same arithmetic — Long sums,
    * bit j set iff its sum > 0 — so signatures are identical.
    */
  def simhash(spark: SparkSession, sfDir: String): DataFrame =
    simhashOf(spark, docs(spark, sfDir))

  def simhashOf(spark: SparkSession, d: DataFrame): DataFrame = {
    val toks = d.select(
      col("doc_id"),
      explode(filter(split(lower(col("text")), " "), t => t =!= ""))
        .as("tok"))
    val tf = toks
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L,
        col("tf")).otherwise(-col("tf"))).as(s"b$j"))
    tf.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(
        col("doc_id"),
        (0 until 64).map(j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, found via
    * 4×16-bit chunk banding (pigeonhole: dist ≤ 3 ⇒ ≥1 identical chunk).
    */
  def simhashPairs(
      spark: SparkSession,
      sfDir: String,
      maxDist: Int = 3): DataFrame = LiveResultCache.getOrCompute(
    "simhash", s"$sfDir|${LiveResultCache.fingerprint(spark,
      s"$sfDir/documents.parquet")}|$maxDist") {
    // pigeonhole over the fixed 4×16-bit chunk banding: ≤3 differing bits
    // guarantee one identical chunk; maxDist ≥ 4 would silently lose
    // qualifying pairs (a pair can differ in every chunk)
    require(maxDist <= 3,
      s"maxDist ($maxDist) must be ≤ 3 for 4-chunk simhash banding")
    // same duplicate-cluster hardening as minhashPairs: identical texts
    // have identical simhashes and agree on all 4 chunks, so chunk-band
    // only one representative per md5(text) group and re-expand after
    // (adaptive: skipped when the corpus has no exact-dup groups)
    val d = docs(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .filter(size(filter(split(lower(col("text")), " "),
        t => t =!= "")) >= 1) // simhash needs ≥1 token
    val keyed = d.select(col("doc_id"), md5(col("text")).as("k"))
    val grouped = keyed.groupBy("k")
      .agg(min(col("doc_id")).as("gid"), count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hasDups = grouped.filter(col("n") > 1).limit(1).count() > 0
    val membership =
      if (!hasDups) null
      else keyed
        .join(grouped.select(col("k"), col("gid")), "k")
        .select(col("doc_id"), col("gid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val reps =
      if (!hasDups) d
      else d.join(
        membership.filter(col("doc_id") === col("gid")).select("doc_id"),
        "doc_id")

    val sig = simhashOf(spark, reps)
    val chunked = sig.select(
      col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16)
            .bitwiseAND(lit(0xffffL)).as("cv"))): _*)).as("cc"))
      .select(col("doc_id"), col("simhash"),
        col("cc.chunk").as("chunk"), col("cc.cv").as("cv"))
    val a = chunked.as("a")
    val b = chunked.as("b")
    val repPairs = a.join(b,
      col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("ga"), col("b.doc_id").as("gb"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)

    val expanded =
      if (!hasDups)
        repPairs.select(col("ga").as("id_a"), col("gb").as("id_b"),
          col("hamming"))
      else {
        val m = membership
        val intra = m.as("x").join(m.as("y"),
          col("x.gid") === col("y.gid") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
            lit(0).as("hamming"))
        val inter = repPairs
          .join(m.select(col("gid").as("ga"), col("doc_id").as("id_a")), "ga")
          .join(m.select(col("gid").as("gb"), col("doc_id").as("id_b")), "gb")
          .select(
            least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"),
            col("hamming"))
        intra.unionByName(inter)
      }

    (expanded.orderBy("id_a", "id_b"), Seq(grouped, membership))
  }

  /** Token-set Jaccard over a bounded doc subset (SQL-parity variant).
    *
    * Plan shape (r6): ONE wide operator total. The per-doc DISTINCT token
    * set is built narrowly (`array_distinct` over the split array), then
    * the ≤maxDocId pair space is enumerated directly with a broadcast
    * `id_a < id_b` join and each pair's intersection is a codegen'd
    * `size(array_intersect(...))` — no explode, no per-token join rows,
    * no pair groupBy, no dimension joins (sizes are `size(toks)` on the
    * row itself). The r5 shape shuffled/grouped one row per SHARED TOKEN
    * per pair plus three broadcast stages; this computes the identical
    * pair rows (`inter >= 1` keeps the join-on-token pair universe:
    * disjoint pairs never existed there) in a single pass over the pair
    * space. Bounded by construction (maxDocId² / 2 pairs); at corpus
    * scale the UNBOUNDED path is minhashPairs, not this parity variant.
    */
  def ngramJaccard(
      spark: SparkSession,
      sfDir: String,
      maxDocId: Long = 100,
      threshold: Double = 0.3): DataFrame = {
    val sets = docs(spark, sfDir)
      .filter(col("doc_id") < maxDocId)
      .select(
        col("doc_id"),
        array_distinct(
          filter(split(lower(col("text")), " "), t => t =!= "")).as("toks"))
    val a = sets.select(col("doc_id").as("id_a"), col("toks").as("toks_a"))
    val b = sets.select(col("doc_id").as("id_b"), col("toks").as("toks_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("inter",
        size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      // pairs sharing no token never appear in the token-join formulation
      // (and this also keeps 0/0 NaN out of the threshold filter)
      .filter(col("inter") >= 1)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("toks_a")).cast("long") +
            size(col("toks_b")).cast("long") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 3)
        .as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  def ngramJaccardSql(maxDocId: Long = 100, threshold: Double = 0.3): String =
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, tok FROM (
       |    SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
       |      x -> x <> '')) AS tok FROM documents WHERE doc_id < $maxDocId) u),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT id_a, id_b,
       |       round(inter::DOUBLE / (sa.sz + sb.sz - inter), 3) AS jaccard
       |FROM inter
       |JOIN sizes sa ON sa.doc_id = id_a
       |JOIN sizes sb ON sb.doc_id = id_b
       |WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
}
