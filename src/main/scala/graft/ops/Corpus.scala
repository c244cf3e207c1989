package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite training-data pipeline: the operators composed the way a
  * real corpus-preparation job chains them — quality gate → exact
  * dedup (deterministic representative) → per-language accounting.
  * One declarative plan end-to-end, so Catalyst pipelines the gate
  * into the dedup shuffle's map side.
  */
object Corpus {

  /** p1 — clean-corpus accounting: per language, how many documents
    * survive the quality gate (≥ 25 tokens), how many survive exact
    * dedup on content (keeping the smallest doc_id per fingerprint),
    * and the kept documents' average length.
    */
  def p1CorpusClean(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(s, dir)
      .withColumn("nt", size(split(col("text"), " ")))

    val totals = docs
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"))

    val quality = docs.filter(col("nt") >= 25)

    val kept = quality
      .groupBy(col("lang"), md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), first(col("nt")).as("nt"))

    val qualityCounts = quality
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_quality"))

    val keptStats = kept
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_kept"),
        round(avg(col("nt")), 2).as("avg_tokens_kept"))

    totals
      .join(qualityCounts, Seq("lang"))
      .join(keptStats, Seq("lang"))
      .orderBy("lang")
  }

  /** p2 — the full pretraining-corpus clean: quality gate → exact
    * dedup (min doc_id per (lang, fingerprint)) → MinHash+LSH near-dup
    * removal (drop the higher doc_id of every exact-verified
    * Jaccard ≥ 0.5 pair among survivors) → per-language token
    * accounting. One declarative plan; the near-dup stage reuses d2's
    * banding machinery over only the exact-dedup survivors, so each
    * stage shrinks the next stage's input — the property that matters
    * when stage 1 discards half of 100 TB.
    */
  def p2CorpusNearDedup(s: SparkSession, dir: String): DataFrame = {
    val quality = Tables
      .spread(Tables.documents(s, dir))
      .withColumn("nt", size(split(col("text"), " ")))
      .filter(col("nt") >= 25)

    val survivors = quality
      .groupBy(col("lang"), md5(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        first(col("text")).as("text"),
        first(col("nt")).as("nt"))

    val removed = Dedup
      .nearDupPairs(
        Dedup.shingled(survivors.select(col("doc_id"), col("lang"), col("text")), 3),
        0.5)
      .select(col("id_b").as("doc_id"))
      .distinct()

    survivors
      .join(removed, Seq("doc_id"), "left_anti")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_final"),
        sum(col("nt")).as("total_tokens"),
        round(avg(col("nt")), 2).as("avg_tokens"))
      .orderBy("lang")
  }

  /** p3 — quota (mixing-weight) sampler: downsample every language to
    * the smallest language's document count, deterministically. Each
    * doc hashes to a bucket in [0, 2^20); a doc survives when
    * `bucket·n_lang < m·2^20` — exact integer cross-multiplication of
    * the acceptance ratio m/n_lang, so there is no float boundary and
    * both engines keep identical rows. The bucket reduces doc_id mod
    * 2^20 BEFORE the multiplicative-hash step (2654435761 ≡ 489905
    * mod 2^20, and a product's residue depends only on its factors'
    * residues, so the bucket is identical to the unreduced form for
    * every doc_id) — the unreduced multiply would silently wrap in
    * Spark but raise a BIGINT-overflow error in the oracle once
    * doc_id exceeds ~3.5e9, well inside 100 TB row counts. The per-lang counts and the
    * scalar minimum are broadcast; the corpus side is one scan plus a
    * final per-lang aggregate, which is how a mixing-weight pass must
    * behave when the corpus is 100 TB and the quota table is 30 rows.
    */
  def p3QuotaMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
    val target = counts.agg(min(col("n_before")).as("m"))
    val kept = docs
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(target))
      .filter(
        (col("doc_id") % 1048576L * 489905L % 1048576L) * col("n_before") <
          col("m") * 1048576L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_after"))
    counts
      .join(kept, Seq("lang"), "left")
      .select(
        col("lang"),
        col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .orderBy("lang")
  }

  /** p4 — stratified train/val/test split: WITHIN each language,
    * documents are ordered by a deterministic content-independent
    * hash (md5 of the id — hex strings order identically in any
    * engine, ties impossible) and cut at 80% / 90% by per-stratum
    * rank. Stratification keeps every language's ratio exact instead
    * of binomially noisy, the hash ordering makes the split stable
    * across reruns and engines, and the whole thing is one window
    * over the (lang)-partitioned corpus plus a tiny count aggregate —
    * no sampling RNG anywhere near the data.
    */
  def p4StratifiedSplit(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(col("h"))
    Tables
      .documents(s, dir)
      .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
      .withColumn(
        "split",
        when(col("rk") * 10 <= col("n") * 8, "train")
          .when(col("rk") * 10 <= col("n") * 9, "val")
          .otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
      .orderBy("lang", "split")
  }

  /** p5 — passage-aware trim audit: the memorization-risk pass a
    * pretraining pipeline runs AFTER document-level dedup, because
    * document dedup cannot see the duplicated PASSAGES (licence
    * blocks, quoted text) that survive inside unique documents
    * (Lee et al. 2022). Quality gate (≥ 25 tokens) → exact dedup
    * (min doc_id per (lang, fingerprint)) → d11's 8-word
    * window-fingerprint audit over the survivors → each survivor
    * classified keep (<20% duplicated windows) / trim (20–80%) /
    * drop (≥80%) → per-(lang, action) document and token accounting:
    * the numbers that decide how much of the token budget passage
    * trimming would claw back.
    *
    * Every stage shrinks the next stage's input (p2's property); the
    * passage audit shuffles only 16-byte (fp, doc) pairs of the
    * SURVIVOR set, never raw text. Thresholds compare exact integer
    * ratios; both engines compute the same nearest-double quotient
    * from identical integers, so the boundary is engine-stable.
    */
  def p5PassageTrim(s: SparkSession, dir: String): DataFrame = {
    val quality = Tables
      .spread(Tables.documents(s, dir))
      .withColumn("nt", size(split(col("text"), " ")))
      .filter(col("nt") >= 25)
    // survivors feed BOTH the passage audit and the final accounting
    // join — localCheckpoint materializes the quality gate + exact
    // dedup once instead of per consumer (same pattern as
    // nearDupPairs / d6)
    val survivors = quality
      .groupBy(col("lang"), md5(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        first(col("text")).as("text"),
        first(col("nt")).as("nt"))
      .localCheckpoint()
    val stats = Dedup.passageWindowStats(survivors.select(col("doc_id"), col("text")), 8)
    survivors
      .join(stats, Seq("doc_id"), "left")
      .withColumn(
        "dupf",
        coalesce(col("n_dup_windows").cast("double") / col("n_windows"), lit(0.0)))
      .withColumn(
        "action",
        when(col("dupf") >= 0.8, "drop")
          .when(col("dupf") >= 0.2, "trim")
          .otherwise("keep"))
      .groupBy(col("lang"), col("action"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nt")).as("total_tokens"),
        round(avg(col("dupf")), 6).as("avg_dup_frac"))
      .orderBy("lang", "action")
  }

  /** p6 — incremental corpus update: admit a NEW SHARD against an
    * existing corpus without re-processing the corpus — the batch twin
    * of the streaming foreachBatch clean
    * ([[graft.streaming.Streams.incrementalCorpusClean]]), in
    * audit-friendly form: one row per shard document with its
    * admission verdict (`accepted` / `low_quality` / `dup_vs_corpus` /
    * `dup_in_shard`), because a production ingest wants the rejection
    * accounting, not just the survivors. The split is sf-invariant
    * (doc_id mod 5: bucket 4 is the arriving shard, the rest is the
    * standing corpus built under the same ≥25-token gate).
    *
    * At 100 TB: the corpus NEVER moves as text — it reduces to its
    * distinct fingerprint set (one hash row per distinct content,
    * built once and incrementally maintainable as this query's own
    * accepted output feeds back in); the shard left-joins that set and
    * its own first-id table on fingerprint. Verdict precedence is
    * fixed (quality → corpus dup → in-shard dup → accepted), so the
    * output is deterministic row by row.
    */
  def p6IncrementalUpdate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(s, dir)
      .withColumn("nt", size(split(col("text"), " ")))
    val corpusFp = docs
      .filter(pmod(col("doc_id"), lit(5)) =!= 4 && col("nt") >= 25)
      .select(md5(col("text")).as("fp"))
      .distinct()
      .withColumn("in_corpus", lit(1))
    val shard = docs
      .filter(pmod(col("doc_id"), lit(5)) === 4)
      .select(col("doc_id"), col("lang"), col("nt"), md5(col("text")).as("fp"))
    val firstIds = shard
      .filter(col("nt") >= 25)
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("first_id"))
    shard
      .join(corpusFp, Seq("fp"), "left")
      .join(firstIds, Seq("fp"), "left")
      .select(
        col("doc_id"),
        col("lang"),
        col("nt").cast("long").as("n_tokens"), // long: the oracle's len() is BIGINT
        when(col("nt") < 25, "low_quality")
          .when(col("in_corpus") === 1, "dup_vs_corpus")
          .when(col("doc_id") =!= col("first_id"), "dup_in_shard")
          .otherwise("accepted")
          .as("verdict"))
      .orderBy("doc_id")
  }

  /** p7 — sequence packing: the concat-and-chunk pass that turns a
    * cleaned corpus into fixed-capacity training sequences (the
    * GPT-pretraining shape: documents are laid end to end in a
    * deterministic order and cut every C tokens; a document may span
    * a chunk boundary). Per document the query reports which packed
    * sequence its first token lands in, its offset there, and how
    * many sequences it spans — the index a packed-dataset writer
    * needs. All integer arithmetic over one windowed cumulative sum.
    *
    * Packing is SHARD-LOCAL ((lang, doc_id div 100) groups) — by
    * design, not convenience: a global cumsum would serialize the
    * corpus through one task (the q70 failure shape) for zero
    * training benefit, since chunk boundaries carry no meaning across
    * shards; production packs within input shards exactly so the pass
    * is embarrassingly parallel. Each window partition is
    * bounded (≤100 docs) regardless of corpus size; the q70 two-phase
    * prefix sum is the escape hatch if a shard ever outgrew a task.
    */
  def p7SequencePacking(s: SparkSession, dir: String): DataFrame = {
    val cap = 512L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("lang"),
        expr("doc_id div 100").as("shard"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .withColumn("cum", sum(col("nt")).over(w))
      .select(
        col("doc_id"),
        col("lang"),
        col("shard"),
        col("nt").as("n_tokens"),
        expr(s"(cum - nt) div $cap").as("start_seq"),
        expr(s"(cum - nt) % $cap").as("start_offset"),
        (expr(s"(cum - 1) div $cap") - expr(s"(cum - nt) div $cap") + 1L)
          .as("seqs_spanned"))
      .orderBy("doc_id")
  }

  /** p8 — near-dup-aware incremental admission: p6 plus the check p6
    * deferred — the arriving shard is ALSO probed against the standing
    * corpus's LSH band table ([[Dedup.crossNearDupPairs]], d2's
    * bandKeys), so a paraphrased or lightly-edited copy of corpus
    * content is rejected, not just byte-identical content. This is the
    * batch twin of the streaming near-dup gate: same signature spec,
    * same band keys, verdict precedence fixed as quality →
    * corpus-exact → corpus-near → in-shard-exact → accepted.
    *
    * At 100 TB the standing corpus participates ONLY as its exact
    * fingerprint set and its band table (both incrementally
    * maintainable from previously-accepted output, one row per
    * distinct content / per band); corpus text is touched once to
    * build representatives, never per-shard. Shard-side cost is the
    * band equi-join (proportional to bucket co-occupancy) plus exact
    * verification on candidates only — the d2 scale story, applied
    * across the corpus boundary.
    */
  def p8NearDupAdmission(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .spread(Tables.documents(s, dir))
      .withColumn("nt", size(split(col("text"), " ")))
      .localCheckpoint() // corpus gate ×2, shard ×3: five consumers replay this scan+split
    val corpusQ = docs.filter(pmod(col("doc_id"), lit(5)) =!= 4 && col("nt") >= 25)
    val corpusFp = corpusQ
      .select(md5(col("text")).as("fp"))
      .distinct()
      .withColumn("in_corpus", lit(1))
    // one representative per distinct corpus content: what the band
    // table indexes (duplicate texts would only duplicate candidates)
    val corpusRep = corpusQ
      .groupBy(md5(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        first(col("lang")).as("lang"),
        first(col("text")).as("text"))
      .select(col("doc_id"), col("lang"), col("text"))
    val shard = docs
      .filter(pmod(col("doc_id"), lit(5)) === 4)
      .select(col("doc_id"), col("lang"), col("nt"), md5(col("text")).as("fp"), col("text"))
    val near = Dedup
      .crossNearDupPairs(
        corpusRep,
        shard.filter(col("nt") >= 25).select(col("doc_id"), col("lang"), col("text")),
        3,
        0.5)
      .select(col("probe_id").as("doc_id"))
      .distinct()
      .withColumn("near_corpus", lit(1))
    val firstIds = shard
      .filter(col("nt") >= 25)
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("first_id"))
    shard
      .join(corpusFp, Seq("fp"), "left")
      .join(near, Seq("doc_id"), "left")
      .join(firstIds, Seq("fp"), "left")
      .select(
        col("doc_id"),
        col("lang"),
        col("nt").cast("long").as("n_tokens"),
        when(col("nt") < 25, "low_quality")
          .when(col("in_corpus") === 1, "dup_vs_corpus")
          .when(col("near_corpus") === 1, "near_dup_vs_corpus")
          .when(col("doc_id") =!= col("first_id"), "dup_in_shard")
          .otherwise("accepted")
          .as("verdict"))
      .orderBy("doc_id")
  }

  /** p9 — temperature-scaled source mixing: the multi-source sampling
    * law LLM training mixes use — source s keeps a share ∝ n_s^α
    * (α = 0.5 here), which upweights small sources relative to
    * proportional sampling without letting any source exceed its own
    * size, under a global budget of half the corpus. Where p3
    * flattens every group to the min count, temperature mixing
    * interpolates between proportional (α=1) and uniform (α=0).
    * Determinism across engines is engineered in two layers: the
    * weight sum is an ASSOCIATIVE integer sum (per-source weights
    * floor-scale sqrt(n)·10⁶ to longs — a float Σ would be
    * summation-order-dependent and could flip a floor boundary), and
    * the one remaining float step (budget·w/wsum) divides integers
    * < 2⁵³ that both engines represent exactly, so the floor is
    * bit-identical. Doc selection inside a source is the p4 rule —
    * rank by md5(doc_id), keep the first n_target — so the sample is
    * stable across reruns and engines. The kept-id sum pins the
    * EXACT selected set, not just its size. At 100 TB the per-source
    * stats table is catalog-sized (broadcast is safe — the p3
    * precedent) and the ranking is one window per source partition
    * over id+hash pairs, never text.
    */
  def p9TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_before"))
    val weighted = counts.withColumn(
      "w",
      floor(sqrt(col("n_before").cast("double")) * 1000000.0).cast("long"))
    val tot = weighted.agg(
      sum(col("w")).as("wsum"),
      expr("sum(n_before) div 2").as("budget"))
    val targets = weighted
      .crossJoin(broadcast(tot))
      .select(
        col("source"),
        col("n_before"),
        least(
          col("n_before"),
          floor(
            col("budget").cast("double") * col("w").cast("double") /
              col("wsum").cast("double")).cast("long")).as("n_target"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("h"))
    docs
      .select(col("doc_id"), col("source"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(win))
      .join(broadcast(targets), "source")
      .filter(col("rk") <= col("n_target"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("kept_id_sum"))
      .join(broadcast(targets), "source")
      .select(
        col("source"),
        col("n_before"),
        col("n_target"),
        col("n_kept"),
        col("kept_id_sum"))
      .orderBy("source")
  }

  /** p10 — weighted sampling without replacement (top-k by priority):
    * longer documents should be likelier to enter a length-weighted
    * eval sample, and the whole draw must be reproducible. This is
    * Duffield et al.'s PRIORITY SAMPLING: each doc gets priority
    * q = w/u with u a per-doc pseudo-uniform, and the sample is the
    * top-k by q. Chosen over the better-known Efraimidis–Spirakis
    * u^(1/w) keys DELIBERATELY: pow routes through libm/JVM
    * transcendentals that differ in the last ulp across engines (the
    * t16 lesson — a rank boundary cannot survive that), while
    * priority's ONE float op is a division of integers both < 2⁵³ —
    * exactly representable, so the ratio and therefore the ENTIRE
    * ranking is bit-identical in any IEEE engine. The pseudo-uniform
    * is a Knuth multiplicative hash of doc_id reduced mod 2³² —
    * integer algebra both engines share (the p3 gate precedent); the
    * weight is n_chars. Top-k plans as TakeOrderedAndProject —
    * per-partition k-heaps + a k-row driver merge, the only sane
    * shape at corpus scale (never a global sort).
    */
  def p10PrioritySample(s: SparkSession, dir: String): DataFrame = {
    val k = 100
    Tables
      .documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
      // Knuth hash computed OVERFLOW-FREE via a split multiply (the p3
      // convention — a raw doc_id*2654435761 wraps silently in Spark
      // past ids ~3.5e9 while DuckDB raises, breaking cross-engine
      // determinism). With a = doc_id mod 2^32 and 2654435761 =
      // 40503*65536 + 31153:  a*c mod 2^32 =
      // ((a mod 2^16)*40503*65536 + a*31153) mod 2^32, and both
      // addends stay < 2^48 — exact in any BIGINT engine, same bucket
      // for EVERY id.
      .withColumn("a32", col("doc_id") % lit(4294967296L))
      .withColumn(
        "v",
        ((col("a32") % lit(65536L)) * lit(2654404608L) +
          col("a32") * lit(31153L)) % lit(4294967296L))
      .withColumn(
        "priority",
        (col("n_chars") * lit(4294967296L)).cast("double") /
          (col("v") + lit(1L)).cast("double"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("priority"))
      .orderBy(col("priority").desc, col("doc_id").asc)
      .limit(k)
  }

  /** p11 — curriculum sharding: order the corpus easy→hard and cut it
    * into 8 equal shards a trainer consumes in sequence (curriculum
    * learning's data-side half). Difficulty is lexical density —
    * distinct/total tokens in BASIS POINTS via integer floor division
    * (`(n_distinct·10000) div n_tokens`), so the sort key is an exact
    * integer and the shard boundary can never sit on a float
    * knife-edge; ties broken by doc_id. Shards replicate the
    * standard-SQL ntile(8) even split (first shards take the
    * remainder), assigned by [[ExactNtile]]'s bounded-histogram
    * boundaries (round-10 fix: the previous unpartitioned ntile
    * window single-task-sorted every document row). Plan: per-doc
    * stats are a scan-local project, the density histogram is
    * domain-bounded (density_bp ∈ [0, 10⁴]), 7 boundary keys
    * broadcast, and assignment is scan-side — at 100 TB no task ever
    * sorts more than one density block of distinct values; text
    * never moves. Fixture cost (sf0.1 warm): 0.35 s → 1.28 s, the
    * distributed shape's fixed overhead.
    */
  def p11CurriculumShards(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("nd"))
      .withColumn("density_bp", expr("(nd * 10000) div nt"))
    ExactNtile
      .withBucket(
        scored,
        8,
        "density_bp",
        "doc_id",
        m => floor(m / lit(512.0)).cast("long"),
        "shard")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("density_bp")).as("min_density_bp"),
        max(col("density_bp")).as("max_density_bp"),
        sum(col("nt")).as("total_tokens"),
        sum(col("doc_id")).as("doc_id_sum"))
      .orderBy("shard")
  }

  /** p12 — epoch shuffle sharding: the training-data "global shuffle"
    * primitive — every document gets a deterministic pseudo-random
    * (shard, within-shard position) so each epoch reads the corpus in
    * a fixed shuffled order WITHOUT a global sort of the data (only
    * (id, key) pairs ever order; text stays put and is read
    * shard-by-shard). Shard = p10's overflow-free Knuth hash mod 64;
    * the within-shard key is the SAME split-multiply applied to the
    * first hash (two LCG rounds decorrelate shard and position, the
    * q112 lesson about composing affine maps). Per shard: doc count,
    * byte volume, first document in shuffle order (row_number over
    * the (key, id) total order), and the exact key sum as the order
    * fingerprint a replay must reproduce. All integer algebra —
    * every intermediate < 2^48, any Long id, both engines exact.
    */
  def p12EpochShuffle(s: SparkSession, dir: String): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("v2").asc, col("doc_id").asc)
    Tables
      .documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("a32", col("doc_id") % lit(4294967296L))
      .withColumn(
        "v1",
        ((col("a32") % lit(65536L)) * lit(2654404608L) +
          col("a32") * lit(31153L)) % lit(4294967296L))
      .withColumn(
        "v2",
        ((col("v1") % lit(65536L)) * lit(2654404608L) +
          col("v1") * lit(31153L)) % lit(4294967296L))
      .withColumn("shard", (col("v1") % lit(64L)).cast("int"))
      .withColumn("rn", row_number().over(win))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        max(when(col("rn") === 1, col("doc_id"))).as("first_doc_id"),
        sum(col("v2")).as("order_key_sum"))
      .orderBy("shard")
  }

  /** p13 — contamination report: d7's eval-overlap detection rolled
    * up to the SOURCE level — contaminated-doc counts, rates in basis
    * points (integer cross-multiplication, no float rate boundary),
    * and the token volume a decontamination pass would remove. This
    * is the report a data owner reads ("which crawl leaked the eval
    * set, how much do we lose by dropping it") before d7's row-level
    * verdicts are acted on. Same scale shape as d7: the eval shingle
    * set broadcasts, the training side never shuffles its text — the
    * rollup adds one source-sized aggregate.
    */
  def p13ContaminationReport(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val toks = split(col("text"), " ")
    val sh = Tables
      .documents(s, dir)
      .select(col("doc_id"), col("source"), explode(array(toks)).as("t"))
      .filter(size(col("t")) >= k)
      .select(
        col("doc_id"),
        graft.functions.WordNgrams.wordNgrams(col("t"), k).as("sh"))
    val evalSh = sh
      .filter(col("doc_id") % 10 === 0)
      .select(col("sh"))
      .distinct()
    val contaminated = sh
      .filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(evalSh), "sh")
      .select(col("doc_id"))
      .distinct()
    val train = Tables
      .documents(s, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .select(
        col("doc_id"),
        col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    train
      .join(contaminated.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_train_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"),
        expr("(sum(coalesce(hit, 0)) * 10000) div count(*)").as("rate_bp"),
        sum(when(col("hit").isNotNull, col("n_tokens")).otherwise(0L))
          .as("tokens_lost"))
      .orderBy("source")
  }

  /** p14 — token-budget waterfilling: allocate a global training-token
    * budget (90% of available tokens here) across sources with
    * docs-proportional target weights, each source CAPPED at what it
    * actually has — the max-min-fair mixture solver a data-mixing
    * pass runs when target weights ask for more tokens than a source
    * owns (the p9 temperature mix assumes availability; this solves
    * the constrained case). Closed form, no iteration: sort sources
    * by avail/weight ascending; the capped set is a PREFIX of that
    * order, found by the cross-multiplied integer test
    * `a_j·Wsuf_j ≤ (B − PA_j)·w_j` (prefix-availability PA, suffix-
    * weight Wsuf — both window prefix sums); uncapped sources get
    * `w_s·(B − PA_K) div Wsuf_K` (non-negative integer div — the
    * module's determinism convention; ordering ties broken by source).
    * Plan: ONE fact-sized (source) aggregate exchange; the waterfill
    * itself is a window + two broadcasts over the SOURCE-COUNT-sized
    * table — at 100 TB the sort the solver needs is over thousands of
    * sources, never rows. The classic iterative solver is O(sources)
    * driver rounds; this is zero.
    */
  def p14TokenWaterfill(s: SparkSession, dir: String): DataFrame = {
    val src = Tables
      .documents(s, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("w"), // docs-proportional target weight
        sum(size(split(col("text"), " ")).cast("long")).as("a"))
    val tot = src.agg(
      sum(col("a")).as("ta"),
      sum(col("w")).as("tw"),
      expr("sum(a) * 9 div 10").as("b"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy((col("a").cast("double") / col("w")).asc, col("source").asc)
    val cum = org.apache.spark.sql.expressions.Window
      .orderBy((col("a").cast("double") / col("w")).asc, col("source").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val ranked = src
      .crossJoin(broadcast(tot))
      .withColumn("rn", row_number().over(ord))
      .withColumn("pa", sum(col("a")).over(cum))
      .withColumn("pw", sum(col("w")).over(cum))
      .withColumn("wsuf", col("tw") - col("pw"))
      // source j capped iff its ratio sits at or under the water level
      // that remains AFTER capping 1..j; (b - pa) < 0 falsifies the
      // inequality on its own (lhs >= 0), so no separate guard needed
      .withColumn("cond", col("a") * col("wsuf") <= (col("b") - col("pa")) * col("w"))
    val kInfo = ranked
      .agg(max(when(col("cond"), col("rn")).otherwise(0)).as("k"))
      .join(
        ranked.select(col("rn").as("k"), col("pa").as("pa_k"), col("wsuf").as("wsuf_k")),
        Seq("k"),
        "left")
      .select(
        col("k"),
        coalesce(col("pa_k"), lit(0L)).as("pa_k"),
        col("wsuf_k")) // null only when k=0; coalesced to tw below
    ranked
      .crossJoin(broadcast(kInfo))
      .withColumn("wsuf_k", coalesce(col("wsuf_k"), col("tw")))
      .withColumn("capped", (col("rn") <= col("k")).cast("int"))
      .withColumn(
        "alloc_tokens",
        when(col("capped") === 1, col("a"))
          .otherwise(expr("w * (b - pa_k) div wsuf_k")))
      .select(
        col("source"),
        col("w").as("n_docs"),
        col("a").as("avail_tokens"),
        col("capped"),
        col("alloc_tokens"),
        expr("alloc_tokens * 10000 div b").as("alloc_share_bp"))
      .orderBy("source")
  }

  /** p15 — reproducible dataset MANIFEST per source: the content
    * identity a training run records so "which data did we train on"
    * has a checkable answer. Per source: doc/distinct-fingerprint
    * counts, char mass, the lexicographic fingerprint range, and an
    * ORDER-INSENSITIVE content checksum — each doc contributes a
    * polynomial hash of its md5's first 8 hex chars reduced mod
    * 1e9+7, and the shard checksum is the plain sum, so any
    * permutation (or re-partitioning) of the same docs produces the
    * same manifest while any content change moves it. All integer
    * arithmetic: ascii·131^i ≤ 7e16 per doc, reduced before summing
    * (the q79 overflow rule; a 1e12-doc shard would lift the sum to
    * the module's decimal convention). One scan, one
    * combiner-friendly source exchange.
    */
  def p15ShardManifest(s: SparkSession, dir: String): DataFrame = {
    val M = 1000000007L
    Tables
      .documents(s, dir)
      .select(col("source"), col("n_chars"), md5(col("text")).as("fp"))
      .withColumn(
        "h",
        expr(s"""aggregate(
               |  transform(split(substring(fp, 1, 8), ''),
               |            (c, i) -> ascii(c) * CAST(pow(131, i) AS BIGINT)),
               |  0L, (a, x) -> a + x) % ${M}L""".stripMargin))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct_fp"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("h")).as("content_checksum"),
        min(col("fp")).as("min_fp"),
        max(col("fp")).as("max_fp"))
      .orderBy("source")
  }

  /** p16 — effective-sample-size report: when documents weight by
    * length (token-proportional sampling, loss weighting), how many
    * EFFECTIVE documents does each source really contribute? Kish's
    * ESS = (Σw)²/Σw² — a source of 1 000 docs dominated by a few
    * giants may carry the effective mass of 100 — and the ess/n
    * ratio is the heavy-tail warning the mixture designer (p9/p14)
    * reads before trusting per-doc counts. Weights are the exact
    * integer `n_chars`; both moment sums are exact longs (a 1e12-doc
    * source lifts Σw² to the module's decimal convention), and the
    * two published ratios are single double divisions of exact
    * operands. One combiner-friendly source aggregate; nothing else
    * moves.
    */
  def p16EssReport(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(col("source"), col("n_chars").cast("long").as("w"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("sw2"))
      .select(
        col("source"),
        col("n_docs"),
        col("sw").as("total_chars"),
        round(
          expr("CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE)"),
          3).as("ess"),
        round(
          expr("""CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE)
                 | / CAST(n_docs AS DOUBLE)""".stripMargin),
          4).as("ess_ratio"))
      .orderBy("source")

  /** p17 — pipeline stage waterfall: the one-page accounting table a
    * data lead reads after a corpus build — per stage (raw → quality
    * gate → exact dedup → near-dup removal), surviving docs and
    * tokens, what the stage removed, and the removal rate in basis
    * points. p1/p2 run the chain and report per-language FINALS; this
    * reports the CHAIN ITSELF, which is where "the quality gate ate
    * 40% of tokens before dedup saw them" becomes visible. Stage sets
    * are p2's exact constructions (same md5 representative, same
    * unblocked θ=0.5 near-dup removal), each collapsed to a 1-row
    * aggregate; the waterfall columns are a lag window over the 4-row
    * stage table. Exact integers; removal bp by nonneg div.
    */
  def p17StageWaterfall(s: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .spread(Tables.documents(s, dir))
      .withColumn("nt", size(split(col("text"), " ")).cast("long"))
      .localCheckpoint() // stage-1 rollup, the gate and the dedup chain all replay this
    val quality = d.filter(col("nt") >= 25)
    val surv = quality
      .groupBy(col("lang"), md5(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        first(col("text")).as("text"),
        first(col("nt")).as("nt"))
      .localCheckpoint() // stage-3 rollup, the near-dup pass and the final anti-join replay this
    val removed = Dedup
      .nearDupPairs(
        Dedup.shingled(surv.select(col("doc_id"), col("lang"), col("text")), 3),
        0.5)
      .select(col("id_b").as("doc_id"))
      .distinct()
    val fin = surv.join(removed, Seq("doc_id"), "left_anti")
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("nt")), lit(0L)).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
    val stages = stage("1_raw", d)
      .unionAll(stage("2_quality_gate", quality))
      .unionAll(stage("3_exact_dedup", surv))
      .unionAll(stage("4_near_dedup", fin))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("stage"))
    stages
      .withColumn("prev_docs", lag(col("n_docs"), 1).over(w))
      .withColumn("prev_tokens", lag(col("n_tokens"), 1).over(w))
      .select(
        col("stage"),
        col("n_docs"),
        col("n_tokens"),
        coalesce(col("prev_docs") - col("n_docs"), lit(0L)).as("docs_removed"),
        coalesce(col("prev_tokens") - col("n_tokens"), lit(0L)).as("tokens_removed"),
        when(col("prev_docs").isNull || col("prev_docs") === 0, lit(0L))
          .otherwise(expr("(prev_docs - n_docs) * 10000L div prev_docs"))
          .as("removed_bp"))
      .orderBy("stage")
  }

  /** p18 — DSIR-style importance SELECTION (the hashed-n-gram
    * importance-resampling estimator of Xie et al., "Data Selection
    * for Language Models via Importance Resampling", NeurIPS 2023):
    * score every raw document by how target-like its token
    * distribution is — Σ_tokens ln(p_target(bucket)/p_raw(bucket)) —
    * and keep the top-k. The target here is the corpus's English
    * slice (standing in for "curated high-quality data"); features
    * are unigrams hashed into 256 buckets via the first two md5 hex
    * chars (md5 is bit-identical across engines — d1's convention —
    * so the bucketing needs no portable-hash machinery).
    *
    * Determinism: the ONLY float math is one ln() per DISTINCT bucket
    * (256 of them), quantized once to integer micro-nats (t33's
    * posture); per-document scores are exact integer sums and the
    * top-k order is (weight, doc_id) — total. The published method
    * Gumbel-resamples; the deterministic top-k variant is the
    * scheduled-pipeline face (and the paper's Table 4 ablation).
    *
    * Scale posture: two bucket aggregates (≤ 256 rows each) feed a
    * broadcast log-ratio table; the document score is one map-side
    * combine over the token stream + one key exchange; the top-k is
    * TakeOrdered. Nothing vocabulary- or corpus-sized crosses to the
    * driver.
    */
  def p18DsirSelection(s: SparkSession, dir: String): DataFrame = {
    val b = Tables
      .spread(Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), col("lang"), substring(md5(col("w")), 1, 2).as("bkt"))
    val tgt = b.filter(col("lang") === "en").groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
    val raw = b.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
    val tt = tgt.agg(sum(col("ct")).as("t"))
    val rt = raw.agg(sum(col("cr")).as("r"))
    val lr = raw
      .join(tgt, Seq("bkt"), "left")
      .crossJoin(broadcast(tt))
      .crossJoin(broadcast(rt))
      .select(
        col("bkt"),
        expr("""CAST(round(ln(
               |  (CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(t + 256 AS DOUBLE))
               |  / (CAST(cr + 1 AS DOUBLE) / CAST(r + 256 AS DOUBLE))) * 1e6)
               |AS BIGINT)""".stripMargin).as("lr_micro"))
    b.join(broadcast(lr), "bkt")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr_micro")).as("weight_micro"))
      .orderBy(col("weight_micro").desc, col("doc_id").asc)
      .limit(100)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("weight_micro"))
  }

  /** p19 — the per-source DATA CARD: the one-page per-source table a
    * model release attaches (Datasheets-for-Datasets distilled to the
    * signals this engine already gates individually) — volume (docs,
    * tokens, languages), exact-duplicate rate (d1/t12's md5-keep
    * construction), quality-gate pass rate (p1's ≥ 25-token gate),
    * eval-contamination rate over the training split (d7/p13's
    * 8-shingle broadcast join), and the Kish effective-sample-size
    * ratio (p16's heavy-tail warning) — one row per source, every
    * rate in basis points by non-negative integer division. The point
    * of shipping it as ONE query: a release pipeline wants these
    * signals computed on the SAME snapshot atomically, not stitched
    * from five reports that may straddle an ingest.
    *
    * Plan: one documents scan fans into four source-keyed aggregates
    * (Catalyst shares the scan); the contamination arm reuses the
    * broadcast eval-shingle set, so the train side never shuffles;
    * the final assembly joins source-count-sized tables.
    */
  def p19DataCard(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val d = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("source"),
        col("lang"),
        col("text"),
        size(split(col("text"), " ")).cast("long").as("nt"),
        col("n_chars").cast("long").as("nc"))
    val keep = d.groupBy(md5(col("text")).as("fp")).agg(min(col("doc_id")).as("keep_id"))
    val base = d
      .join(keep, md5(col("text")) === col("fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("nt")).as("n_tokens"),
        round(avg(col("nt")), 2).as("avg_tokens"),
        sum((col("doc_id") =!= col("keep_id")).cast("long")).as("n_copies"),
        sum((col("nt") >= 25).cast("long")).as("n_quality"),
        sum(col("nc")).as("sw"),
        sum(col("nc") * col("nc")).as("sw2"))
    val sh = d
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(
        col("doc_id"),
        col("source"),
        graft.functions.WordNgrams.wordNgrams(col("t"), k).as("sh"))
    val evalSh = sh.filter(col("doc_id") % 10 === 0).select(col("sh")).distinct()
    val contaminated = sh
      .filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(evalSh), "sh")
      .select(col("doc_id"), col("source"))
      .distinct()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_contam"))
    val train = d
      .filter(col("doc_id") % 10 =!= 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train"))
    base
      .join(train, Seq("source"), "left")
      .join(contaminated, Seq("source"), "left")
      .select(
        col("source"),
        col("n_docs"),
        col("n_langs"),
        col("n_tokens"),
        col("avg_tokens"),
        expr("n_copies * 10000L div n_docs").as("dup_bp"),
        expr("n_quality * 10000L div n_docs").as("quality_bp"),
        expr("""CASE WHEN coalesce(n_train, 0L) = 0L THEN 0L
               |ELSE coalesce(n_contam, 0L) * 10000L div n_train END"""
          .stripMargin).as("contam_bp"),
        expr("""round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
               | / CAST(sw2 AS DOUBLE) / CAST(n_docs AS DOUBLE), 4)"""
          .stripMargin).as("ess_ratio"))
      .orderBy("source")
  }

  /** p20 — dedup HOLDOUT carve-out: keep a fixed ~5% hash slice of
    * exact-duplicate clusters UNdeduplicated — the controlled
    * experiment the dedup literature runs to measure what duplication
    * does to memorization/loss downstream (you cannot measure the
    * effect of dedup if you dedup everything). The slice is keyed on
    * the cluster fingerprint's first md5 hex byte (≤ '0c' → 13/256 ≈
    * 5.1%), so membership is a pure function of CONTENT — stable
    * across reruns, ingests, and engines, never a row sample. Per
    * language: total docs, docs kept under full dedup, docs kept with
    * the holdout carved out, holdout cluster count, and the extra
    * copies deliberately retained (the treatment mass).
    *
    * Exact integers end to end. Plan: one fingerprint aggregate (d1's
    * shape) feeds both arms; the per-language rollup is
    * catalog-sized; nothing beyond the one fp exchange moves.
    */
  def p20DedupHoldout(s: SparkSession, dir: String): DataFrame = {
    val d = Tables
      .documents(s, dir)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"))
    val clusters = d
      .groupBy(col("lang"), col("fp"))
      .agg(count(lit(1)).as("sz"))
      .withColumn("held", (substring(col("fp"), 1, 2) <= "0c").cast("long"))
    clusters
      .groupBy(col("lang"))
      .agg(
        sum(col("sz")).as("n_docs"),
        count(lit(1)).as("n_kept_dedup"),
        sum(when(col("held") === 1L, col("sz")).otherwise(lit(1L))).as("n_kept_holdout"),
        sum(col("held")).as("n_holdout_clusters"),
        sum(when(col("held") === 1L, col("sz") - 1).otherwise(lit(0L)))
          .as("extra_copies_retained"))
      .orderBy("lang")
  }

  /** p21 — EPOCH-REPETITION mixing plan for the data-constrained
    * regime (Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models": when the token budget EXCEEDS the unique
    * corpus, repeating good data up to ~4 epochs retains most of its
    * value, decaying steeply after). p14's waterfill solves budget <
    * corpus; this solves budget > corpus: each source offers up to 4
    * epoch units, unit (s, e) is worth q_s · decay_e (decay =
    * 10000/7000/4900/3430 bp — the ~0.7 per-epoch retention ladder)
    * and costs the source's token count; the greedy fill by value is
    * OPTIMAL for this separable concave objective (each source's
    * units enter in epoch order by construction — decay is strictly
    * decreasing — so greedy = exact LP solution with one fractional
    * boundary unit). Quality q_s here is the source's type-token
    * ratio in basis points — a deterministic lexical-diversity proxy
    * standing in for whatever model-based scorer a production
    * pipeline plugs into the same slot. All-integer arithmetic:
    * values are bp × bp products, the budget line is one cumulative
    * sum, and the single boundary unit gets an exact floor-division
    * partial share.
    *
    * Scale: one (source, token) aggregate exchange over the corpus;
    * the greedy fill's unpartitioned window runs over the
    * SOURCE-COUNT × 4 unit table — Aggregate-bounded (thousands of
    * sources, never rows), the standing PlanSpec gate's explicit
    * allowance. Budget = 2× corpus tokens, a literal both engines
    * share.
    */
  def p21EpochMix(s: SparkSession, dir: String): DataFrame = {
    val tok = Tables
      .documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("t"))
    val src = tok
      .groupBy(col("source"))
      .agg(count(lit(1)).as("tok"), countDistinct(col("t")).as("types"))
      .withColumn("q_bp", expr("types * 10000 div tok"))
    val tot = src.agg((sum(col("tok")) * 2).as("b"))
    val units = src
      .select(
        col("source"),
        col("tok"),
        col("q_bp"),
        explode(sequence(lit(1), lit(4))).as("e"))
      .withColumn(
        "value",
        col("q_bp") * expr(
          "CASE e WHEN 1 THEN 10000 WHEN 2 THEN 7000 WHEN 3 THEN 4900 ELSE 3430 END"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("value").desc, col("source").asc, col("e").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    units
      .withColumn("cum", sum(col("tok")).over(ord))
      .crossJoin(broadcast(tot))
      .withColumn("prev_cum", col("cum") - col("tok"))
      .withColumn("full_u", when(col("cum") <= col("b"), 1L).otherwise(0L))
      .withColumn(
        "part_bp",
        when(
          col("cum") > col("b") && col("prev_cum") < col("b"),
          expr("(b - prev_cum) * 10000 div tok")).otherwise(0L))
      .groupBy(col("source"))
      .agg(
        max(col("tok")).as("tok_total"),
        max(col("q_bp")).as("quality_bp"),
        sum(col("full_u")).as("full_epochs"),
        sum(col("part_bp")).as("partial_bp"))
      .select(
        col("source"),
        col("tok_total"),
        col("quality_bp"),
        col("full_epochs"),
        col("partial_bp"),
        expr("full_epochs * tok_total + partial_bp * tok_total div 10000")
          .as("tokens_alloc"))
      .orderBy("source")
  }

  /** p22 — sequence-packing EFFICIENCY SWEEP over the context-length
    * ladder {256, 512, 1024, 2048}: for each candidate capacity, the
    * padding waste (in tokens and basis points of the packed volume)
    * and how many documents straddle a sequence boundary — the two
    * costs a context-length decision trades (shorter sequences waste
    * less tail padding but split more documents; longer ones the
    * reverse). p7 WRITES the packing index for one chosen capacity;
    * this is the measurement that chooses it — the d21/d27/s24
    * operating-curve doctrine applied to the packing stage.
    *
    * The shard-local cumulative sum (p7's (lang, doc_id div 100)
    * partitioning — bounded window partitions by construction) is
    * computed ONCE, capacity-independent; the 4-way capacity fan-out
    * explodes AFTER it, so the sweep costs one window pass plus a
    * 4×-rows aggregate, not 4 packings. Boundary arithmetic is pure
    * integer div on the cumsum: a doc straddles iff its first and last
    * token land in different cap-blocks. At 100 TB: same plan — one
    * bounded-partition window over narrow (id, count) rows, then
    * shard-sized aggregates; nothing data-sized crosses an
    * unpartitioned boundary.
    */
  def p22PackingSweep(s: SparkSession, dir: String): DataFrame = {
    val caps = Seq(256L, 512L, 1024L, 2048L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
    val packed = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("lang"),
        expr("doc_id div 100").as("shard"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .withColumn("cum", sum(col("nt")).over(w))
    val perCap = packed
      .select(
        col("lang"),
        col("shard"),
        col("nt"),
        col("cum"),
        explode(array(caps.map(lit): _*)).as("cap"))
      .withColumn(
        "sp",
        when(expr("(cum - 1) div cap > (cum - nt) div cap"), 1L).otherwise(0L))
    perCap
      .groupBy(col("cap"), col("lang"), col("shard"))
      .agg(
        max(col("cum")).as("t"),
        sum(col("sp")).as("n_spanning"),
        count(lit(1)).as("n_docs"))
      .withColumn("seqs", expr("(t + cap - 1) div cap"))
      .groupBy(col("cap"))
      .agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("t")).as("total_tokens"),
        sum(col("seqs")).as("n_seqs"),
        sum(col("seqs") * col("cap") - col("t")).as("waste_tokens"),
        sum(col("n_spanning")).as("n_spanning_docs"))
      .withColumn("waste_bp", expr("waste_tokens * 10000 div (n_seqs * cap)"))
      .orderBy("cap")
  }

  /** p23 — quality-filter frontier: the tokens-retained vs
    * threshold operating curve for a lexical-diversity admission
    * gate. Every corpus build ultimately picks ONE cut on a quality
    * signal; this is the table that pick is read off — for each
    * type-token-ratio threshold τ in a fixed ladder, how many docs
    * and tokens survive "keep docs with ttr_bp ≥ τ", as counts and
    * basis-point shares. Completes the operating-curve family
    * (d21/d27/s22/s24/p22) for the ADMISSION decision p1/p8 apply at
    * a single hard-coded point. All integer: ttr_bp = n_distinct·10⁴
    * div n_tokens per doc, shares in bp over exact token sums.
    *
    * Plan: one scan computes per-doc (ttr_bp, n_tokens); ONE
    * data-sized hash exchange aggregates onto the ttr_bp domain —
    * BOUNDED by construction at ≤ 10001 values — and every
    * ladder×domain comparison after it is a broadcast join on that
    * bounded histogram (the q70 doctrine: cumulate on the domain,
    * never window the data). The ladder is 6 literal rows. At 100 TB
    * the same plan holds; the frontier never re-scans per threshold.
    */
  def p23FilterFrontier(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables
      .documents(s, dir)
      .select(split(col("text"), " ").as("t"))
      .select(
        size(col("t")).cast("long").as("n_tokens"),
        size(array_distinct(col("t"))).cast("long").as("n_distinct"))
      .select(
        col("n_tokens"),
        expr("n_distinct * 10000 div n_tokens").as("ttr_bp"))
    val hist = perDoc
      .groupBy(col("ttr_bp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_toks"))
    val totals = hist.agg(
      sum(col("n_docs")).as("tot_docs"),
      sum(col("n_toks")).as("tot_toks"))
    val ladder = s.range(0, 6).select((col("id") * 1500 + 2500).as("tau"))
    ladder
      .join(broadcast(hist), col("ttr_bp") >= col("tau"), "left")
      .groupBy(col("tau"))
      .agg(
        coalesce(sum(col("n_docs")), lit(0L)).as("docs_kept"),
        coalesce(sum(col("n_toks")), lit(0L)).as("tokens_kept"))
      .crossJoin(broadcast(totals))
      .select(
        col("tau"),
        col("docs_kept"),
        col("tokens_kept"),
        expr("docs_kept * 10000 div tot_docs").as("docs_share_bp"),
        expr("tokens_kept * 10000 div tot_toks").as("tokens_share_bp"))
      .orderBy("tau")
  }

  /** p24 — ANNEALED mixture schedule: per-epoch source weights that
    * interpolate linearly from UNIFORM (epoch 0 — maximize early
    * diversity) to SIZE-PROPORTIONAL (epoch E — match the natural
    * distribution late), with exact integer token allocations per
    * (epoch, source) — the curriculum-over-sources complement to p9's
    * static temperature (one exponent, all epochs) and p11's
    * within-source difficulty ladder. w_e = ((E−e)·u + e·p) div E in
    * basis points with u = 10⁴ div S and p = tokens·10⁴ div total;
    * the epoch's 1M-token budget splits by largest-remainder-free
    * floor allocation (budget·w div Σw — Σw re-derived per epoch so
    * truncation in the weights can't misallocate the budget).
    *
    * Plan: ONE data-sized exchange (per-source token aggregate, rows
    * ∝ the source alphabet), then a 5-epoch literal grid cross join
    * on the broadcast source table — (E+1)·S bounded rows out. At
    * 100 TB nothing changes; the schedule is metadata.
    */
  def p24MixAnneal(s: SparkSession, dir: String): DataFrame = {
    val perSrc = Tables
      .documents(s, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(sum(col("nt")).as("toks"))
    val tot = perSrc.agg(
      sum(col("toks")).as("total"),
      count(lit(1)).as("n_sources"))
    val weighted = perSrc
      .crossJoin(broadcast(tot))
      .select(
        col("source"),
        col("toks"),
        expr("10000 div n_sources").as("u_bp"),
        expr("toks * 10000 div total").as("p_bp"))
      .crossJoin(s.range(0, 5).select(col("id").as("epoch")))
      .withColumn("w_bp", expr("((4 - epoch) * u_bp + epoch * p_bp) div 4"))
    val epochTot = weighted
      .groupBy(col("epoch"))
      .agg(sum(col("w_bp")).as("sw"))
    weighted
      .join(broadcast(epochTot), Seq("epoch"))
      .select(
        col("epoch"),
        col("source"),
        col("w_bp"),
        expr("1000000 * w_bp div sw").as("alloc_tokens"))
      .orderBy("epoch", "source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p24_mix_anneal" -> p24MixAnneal,
    "p23_filter_frontier" -> p23FilterFrontier,
    "p22_packing_sweep" -> p22PackingSweep,
    "p21_epoch_mix" -> p21EpochMix,
    "p20_dedup_holdout" -> p20DedupHoldout,
    "p19_data_card" -> p19DataCard,
    "p18_dsir_selection" -> p18DsirSelection,
    "p17_stage_waterfall" -> p17StageWaterfall,
    "p16_ess_report" -> p16EssReport,
    "p15_shard_manifest" -> p15ShardManifest,
    "p14_token_waterfill" -> p14TokenWaterfill,
    "p13_contamination_report" -> p13ContaminationReport,
    "p12_epoch_shuffle" -> p12EpochShuffle,
    "p11_curriculum_shards" -> p11CurriculumShards,
    "p10_priority_sample" -> p10PrioritySample,
    "p9_temperature_mix" -> p9TemperatureMix,
    "p8_neardup_admission" -> p8NearDupAdmission,
    "p7_sequence_packing" -> p7SequencePacking,
    "p6_incremental_update" -> p6IncrementalUpdate,
    "p5_passage_trim" -> p5PassageTrim,
    "p4_stratified_split" -> p4StratifiedSplit,
    "p3_quota_mix" -> p3QuotaMix,
    "p1_corpus_clean" -> p1CorpusClean,
    "p2_corpus_neardedup" -> p2CorpusNearDedup
  )

  val oracles: Map[String, String] = Map(
    // the same uniform→proportional integer interpolation and
    // per-epoch floor allocation over the re-derived weight sum
    "p24_mix_anneal" ->
      """WITH ps AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(toks) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_sources
        |  FROM ps),
        |wgt AS (
        |  SELECT e.epoch, ps.source, ps.toks,
        |    ((4 - e.epoch) * (10000 // tot.n_sources) +
        |     e.epoch * (ps.toks * 10000 // tot.total)) // 4 AS w_bp
        |  FROM ps, tot,
        |    (SELECT CAST(i AS BIGINT) AS epoch FROM range(0, 5) t(i)) e),
        |et AS (SELECT epoch, CAST(sum(w_bp) AS BIGINT) AS sw
        |       FROM wgt GROUP BY 1)
        |SELECT wgt.epoch, wgt.source, CAST(w_bp AS BIGINT) AS w_bp,
        |  CAST(1000000 * w_bp // sw AS BIGINT) AS alloc_tokens
        |FROM wgt JOIN et USING (epoch)
        |ORDER BY epoch, source""".stripMargin,
    // identical per-doc ttr_bp, the same 6-step ladder and integer
    // bp shares over exact totals
    "p23_filter_frontier" ->
      """WITH pd AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS n_distinct
        |  FROM documents),
        |pd2 AS (
        |  SELECT n_tokens, n_distinct * 10000 // n_tokens AS ttr_bp FROM pd),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS tot_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS tot_toks
        |  FROM pd2),
        |ladder AS (
        |  SELECT CAST(i * 1500 + 2500 AS BIGINT) AS tau
        |  FROM range(0, 6) t(i)),
        |kept AS (
        |  SELECT tau,
        |    CAST(coalesce(sum(CASE WHEN ttr_bp >= tau THEN 1 END), 0)
        |      AS BIGINT) AS docs_kept,
        |    CAST(coalesce(sum(CASE WHEN ttr_bp >= tau THEN n_tokens END), 0)
        |      AS BIGINT) AS tokens_kept
        |  FROM ladder LEFT JOIN pd2 ON TRUE
        |  GROUP BY 1)
        |SELECT tau, docs_kept, tokens_kept,
        |  docs_kept * 10000 // tot_docs AS docs_share_bp,
        |  tokens_kept * 10000 // tot_toks AS tokens_share_bp
        |FROM kept, tot
        |ORDER BY tau""".stripMargin,
    // the same shard-local ROWS cumsum, cap-block straddle test and
    // ceil-division sequence count, fanned over the capacity ladder
    "p22_packing_sweep" ->
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id // 100 AS shard,
        |    len(string_split(text, ' '))::BIGINT AS nt
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(nt) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM d),
        |caps(cap) AS (VALUES (256::BIGINT), (512), (1024), (2048)),
        |pc AS (
        |  SELECT cap, lang, shard, nt, cum,
        |    CASE WHEN (cum - 1) // cap > (cum - nt) // cap
        |         THEN 1 ELSE 0 END AS sp
        |  FROM c, caps),
        |ss AS (
        |  SELECT cap, lang, shard, max(cum) AS t, sum(sp) AS n_spanning,
        |    count(*) AS n_docs
        |  FROM pc GROUP BY 1, 2, 3),
        |sq AS (
        |  SELECT cap, n_docs, t, (t + cap - 1) // cap AS seqs, n_spanning
        |  FROM ss)
        |SELECT cap, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(t) AS BIGINT) AS total_tokens,
        |  CAST(sum(seqs) AS BIGINT) AS n_seqs,
        |  CAST(sum(seqs * cap - t) AS BIGINT) AS waste_tokens,
        |  CAST(sum(n_spanning) AS BIGINT) AS n_spanning_docs,
        |  CAST(sum(seqs * cap - t) * 10000 // (sum(seqs) * cap) AS BIGINT)
        |    AS waste_bp
        |FROM sq GROUP BY cap ORDER BY cap""".stripMargin,
    // same type-token quality, same decay ladder, same greedy line
    // (value desc, source, epoch) and the same fractional boundary
    "p21_epoch_mix" ->
      """WITH tokens AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS t FROM documents),
        |src AS (
        |  SELECT source, count(*) AS tok, count(DISTINCT t) AS types
        |  FROM tokens GROUP BY 1),
        |q AS (SELECT source, tok, types * 10000 // tok AS q_bp FROM src),
        |tot AS (SELECT 2 * sum(tok) AS b FROM src),
        |units AS (
        |  SELECT source, tok, q_bp, e,
        |    q_bp * (CASE e WHEN 1 THEN 10000 WHEN 2 THEN 7000
        |                   WHEN 3 THEN 4900 ELSE 3430 END) AS val
        |  FROM q, (SELECT unnest(range(1, 5)) AS e)),
        |g AS (
        |  SELECT *, sum(tok) OVER (ORDER BY val DESC, source ASC, e ASC
        |                           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM units),
        |per AS (
        |  SELECT source, tok, q_bp,
        |    CASE WHEN cum <= b THEN 1 ELSE 0 END AS full_u,
        |    CASE WHEN cum > b AND cum - tok < b
        |         THEN (b - (cum - tok)) * 10000 // tok ELSE 0 END AS part_bp
        |  FROM g, tot)
        |SELECT source,
        |  CAST(max(tok) AS BIGINT) AS tok_total,
        |  CAST(max(q_bp) AS BIGINT) AS quality_bp,
        |  CAST(sum(full_u) AS BIGINT) AS full_epochs,
        |  CAST(sum(part_bp) AS BIGINT) AS partial_bp,
        |  CAST(sum(full_u) * max(tok)
        |    + sum(part_bp) * max(tok) // 10000 AS BIGINT) AS tokens_alloc
        |FROM per GROUP BY source ORDER BY source""".stripMargin,
    // same content-keyed holdout slice and per-language accounting
    "p20_dedup_holdout" ->
      """WITH cl AS (
        |  SELECT lang, md5(text) AS fp, count(*) AS sz,
        |    CASE WHEN substring(md5(text), 1, 2) <= '0c' THEN 1 ELSE 0 END
        |      AS held
        |  FROM documents
        |  GROUP BY lang, md5(text))
        |SELECT lang,
        |  CAST(sum(sz) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_kept_dedup,
        |  CAST(sum(CASE WHEN held = 1 THEN sz ELSE 1 END) AS BIGINT)
        |    AS n_kept_holdout,
        |  CAST(sum(held) AS BIGINT) AS n_holdout_clusters,
        |  CAST(sum(CASE WHEN held = 1 THEN sz - 1 ELSE 0 END) AS BIGINT)
        |    AS extra_copies_retained
        |FROM cl
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // every signal recomputed on the same snapshot: md5-keep dup rate,
    // 25-token quality gate, 8-shingle contamination over the train
    // split, Kish ESS ratio — rates in basis points by nonneg div
    "p19_data_card" ->
      """WITH d AS (
        |  SELECT doc_id, source, lang, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    CAST(n_chars AS BIGINT) AS nc
        |  FROM documents),
        |keep AS (
        |  SELECT md5(text) AS fp, min(doc_id) AS keep_id
        |  FROM d GROUP BY md5(text)),
        |base AS (
        |  SELECT source, count(*) AS n_docs,
        |    count(DISTINCT lang) AS n_langs,
        |    sum(nt) AS n_tokens,
        |    round(avg(nt), 2) AS avg_tokens,
        |    sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS n_copies,
        |    sum(CASE WHEN nt >= 25 THEN 1 ELSE 0 END) AS n_quality,
        |    sum(nc) AS sw, sum(nc * nc) AS sw2
        |  FROM d JOIN keep ON md5(d.text) = keep.fp
        |  GROUP BY source),
        |tok AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS t FROM d
        |  WHERE len(string_split(text, ' ')) >= 8),
        |sh AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' '))) AS sh
        |  FROM tok),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
        |contam AS (
        |  SELECT source, count(DISTINCT doc_id) AS n_contam
        |  FROM sh JOIN ev USING (sh) WHERE doc_id % 10 <> 0
        |  GROUP BY source),
        |train AS (
        |  SELECT source, count(*) AS n_train FROM d
        |  WHERE doc_id % 10 <> 0 GROUP BY source)
        |SELECT b.source, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_langs AS BIGINT) AS n_langs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens, avg_tokens,
        |  CAST(n_copies * 10000 // n_docs AS BIGINT) AS dup_bp,
        |  CAST(n_quality * 10000 // n_docs AS BIGINT) AS quality_bp,
        |  CAST(CASE WHEN coalesce(n_train, 0) = 0 THEN 0
        |    ELSE coalesce(n_contam, 0) * 10000 // n_train END AS BIGINT)
        |    AS contam_bp,
        |  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
        |   / CAST(sw2 AS DOUBLE) / CAST(n_docs AS DOUBLE), 4) AS ess_ratio
        |FROM base b
        |LEFT JOIN train USING (source)
        |LEFT JOIN contam USING (source)
        |ORDER BY source""".stripMargin,
    // identical formula text on both engines: one ln per bucket,
    // micro-nat quantized, exact integer doc sums, total top-k order
    "p18_dsir_selection" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, lang, substring(md5(w), 1, 2) AS bkt FROM tok),
        |tgt AS (
        |  SELECT bkt, count(*) AS ct FROM b WHERE lang = 'en' GROUP BY bkt),
        |raw AS (SELECT bkt, count(*) AS cr FROM b GROUP BY bkt),
        |tt AS (SELECT sum(ct) AS t FROM tgt),
        |rt AS (SELECT sum(cr) AS r FROM raw),
        |lr AS (
        |  SELECT raw.bkt,
        |    CAST(round(ln(
        |      (CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(t + 256 AS DOUBLE))
        |      / (CAST(cr + 1 AS DOUBLE) / CAST(r + 256 AS DOUBLE))) * 1e6)
        |    AS BIGINT) AS lr_micro
        |  FROM raw LEFT JOIN tgt USING (bkt), tt, rt)
        |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(lr_micro) AS BIGINT) AS weight_micro
        |FROM b JOIN lr USING (bkt)
        |GROUP BY doc_id, lang
        |ORDER BY weight_micro DESC, doc_id
        |LIMIT 100""".stripMargin,
    // p2's stage constructions collapsed to the 4-row waterfall
    "p17_stage_waterfall" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |  FROM documents),
        |q AS (SELECT * FROM d WHERE nt >= 25),
        |surv AS (
        |  SELECT lang, md5(text) AS fp, min(doc_id) AS doc_id,
        |    min(text) AS text, min(nt) AS nt
        |  FROM q GROUP BY lang, md5(text)),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM surv),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS shingles
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |rm AS (
        |  SELECT DISTINCT id_b AS doc_id
        |  FROM pairs JOIN sizes sa ON id_a = sa.doc_id
        |             JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
        |fin AS (
        |  SELECT * FROM surv
        |  WHERE doc_id NOT IN (SELECT doc_id FROM rm)),
        |st AS (
        |  SELECT '1_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(nt) AS BIGINT) AS n_tokens FROM d
        |  UNION ALL
        |  SELECT '2_quality_gate', CAST(count(*) AS BIGINT),
        |    CAST(sum(nt) AS BIGINT) FROM q
        |  UNION ALL
        |  SELECT '3_exact_dedup', CAST(count(*) AS BIGINT),
        |    CAST(sum(nt) AS BIGINT) FROM surv
        |  UNION ALL
        |  SELECT '4_near_dedup', CAST(count(*) AS BIGINT),
        |    CAST(sum(nt) AS BIGINT) FROM fin),
        |l AS (
        |  SELECT stage, n_docs, n_tokens,
        |    lag(n_docs) OVER (ORDER BY stage) AS prev_docs,
        |    lag(n_tokens) OVER (ORDER BY stage) AS prev_tokens
        |  FROM st)
        |SELECT stage, n_docs, n_tokens,
        |  CAST(COALESCE(prev_docs - n_docs, 0) AS BIGINT) AS docs_removed,
        |  CAST(COALESCE(prev_tokens - n_tokens, 0) AS BIGINT)
        |    AS tokens_removed,
        |  CAST(CASE WHEN prev_docs IS NULL OR prev_docs = 0 THEN 0
        |            ELSE (prev_docs - n_docs) * 10000 // prev_docs END
        |    AS BIGINT) AS removed_bp
        |FROM l ORDER BY stage""".stripMargin,
    // same exact integer moments; ratios as single double divisions
    "p16_ess_report" ->
      """WITH m AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sw,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sw2
        |  FROM documents GROUP BY 1)
        |SELECT source, n_docs, sw AS total_chars,
        |  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
        |        / CAST(sw2 AS DOUBLE), 3) AS ess,
        |  round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE) / CAST(sw2 AS DOUBLE)
        |    / CAST(n_docs AS DOUBLE), 4) AS ess_ratio
        |FROM m ORDER BY source""".stripMargin,
    // same per-doc polynomial over the md5 prefix (1-based comprehension
    // index shifted to match Spark's 0-based transform), plain sums
    "p15_shard_manifest" ->
      """WITH d AS (
        |  SELECT source, n_chars, md5(text) AS fp,
        |    string_split(substr(md5(text), 1, 8), '') AS cs
        |  FROM documents),
        |h AS (
        |  SELECT source, n_chars, fp,
        |    list_sum([ascii(cs[i]) * CAST(pow(131, i - 1) AS BIGINT)
        |              FOR i IN range(1, 9)]) % 1000000007 AS h
        |  FROM d)
        |SELECT source, count(*) AS n_docs,
        |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(h) AS BIGINT) AS content_checksum,
        |  min(fp) AS min_fp, max(fp) AS max_fp
        |FROM h GROUP BY 1 ORDER BY source""".stripMargin,
    // d7's 8-gram overlap construction rolled up per source; rates in
    // integer basis points
    // identical closed-form waterfill: ratio-ascending window, integer
    // cross-multiplied cut test, div allocations
    "p14_token_waterfill" ->
      """WITH src AS (
        |  SELECT source, count(*) AS w,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS a
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(w) AS BIGINT) AS tw,
        |    CAST(sum(a) * 9 // 10 AS BIGINT) AS b
        |  FROM src),
        |ranked AS (
        |  SELECT src.*, tot.tw, tot.b,
        |    row_number() OVER (ORDER BY a * 1.0 / w ASC, source ASC) AS rn,
        |    CAST(sum(a) OVER (ORDER BY a * 1.0 / w ASC, source ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pa,
        |    CAST(sum(w) OVER (ORDER BY a * 1.0 / w ASC, source ASC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pw
        |  FROM src, tot),
        |cnd AS (
        |  SELECT *, tw - pw AS wsuf,
        |    a * (tw - pw) <= (b - pa) * w AS cond
        |  FROM ranked),
        |ki AS (
        |  SELECT coalesce(max(CASE WHEN cond THEN rn END), 0) AS k FROM cnd),
        |kv AS (
        |  SELECT ki.k,
        |    coalesce(max(cnd.pa), 0) AS pa_k,
        |    coalesce(max(cnd.wsuf), (SELECT max(tw) FROM cnd)) AS wsuf_k
        |  FROM ki LEFT JOIN cnd ON cnd.rn = ki.k GROUP BY ki.k)
        |SELECT cnd.source, cnd.w AS n_docs, cnd.a AS avail_tokens,
        |  CAST(CASE WHEN cnd.rn <= kv.k THEN 1 ELSE 0 END AS INT) AS capped,
        |  CAST(CASE WHEN cnd.rn <= kv.k THEN cnd.a
        |       ELSE cnd.w * (cnd.b - kv.pa_k) // kv.wsuf_k END AS BIGINT)
        |    AS alloc_tokens,
        |  CAST((CASE WHEN cnd.rn <= kv.k THEN cnd.a
        |        ELSE cnd.w * (cnd.b - kv.pa_k) // kv.wsuf_k END) * 10000 // cnd.b
        |       AS BIGINT) AS alloc_share_bp
        |FROM cnd, kv ORDER BY source""".stripMargin,
    "p13_contamination_report" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' '))) AS sh
        |  FROM d),
        |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
        |hit AS (
        |  SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (sh)
        |  WHERE sh.doc_id % 10 <> 0),
        |tr AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE doc_id % 10 <> 0)
        |SELECT tr.source, count(*) AS n_train_docs,
        |  CAST(sum(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_contaminated,
        |  (CAST(sum(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |        AS BIGINT) * 10000) // count(*) AS rate_bp,
        |  CAST(sum(CASE WHEN hit.doc_id IS NOT NULL THEN tr.n_tokens
        |                ELSE 0 END) AS BIGINT) AS tokens_lost
        |FROM tr LEFT JOIN hit ON tr.doc_id = hit.doc_id
        |GROUP BY 1 ORDER BY tr.source""".stripMargin,
    // same two Knuth rounds, same (v2, id) shuffle order; all exact
    // integer algebra
    "p12_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars, doc_id % 4294967296 AS a32
        |  FROM documents),
        |v1t AS (
        |  SELECT doc_id, n_chars,
        |    ((a32 % 65536) * 2654404608 + a32 * 31153) % 4294967296 AS v1
        |  FROM h),
        |v2t AS (
        |  SELECT doc_id, n_chars, CAST(v1 % 64 AS INT) AS shard,
        |    ((v1 % 65536) * 2654404608 + v1 * 31153) % 4294967296 AS v2
        |  FROM v1t),
        |rn AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY shard
        |                       ORDER BY v2 ASC, doc_id ASC) AS rn
        |  FROM v2t)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  max(CASE WHEN rn = 1 THEN doc_id END) AS first_doc_id,
        |  CAST(sum(v2) AS BIGINT) AS order_key_sum
        |FROM rn GROUP BY 1 ORDER BY shard""".stripMargin,
    // integer basis-point sort key + doc_id tie-break = total order;
    // ntile's standard even-split semantics match across engines
    "p11_curriculum_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS nd
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, nt, (nd * 10000) // nt AS density_bp FROM t),
        |sh AS (
        |  SELECT doc_id, nt, density_bp,
        |    ntile(8) OVER (ORDER BY density_bp ASC, doc_id ASC) AS shard
        |  FROM sc)
        |SELECT CAST(shard AS INT) AS shard, count(*) AS n_docs,
        |  min(density_bp) AS min_density_bp,
        |  max(density_bp) AS max_density_bp,
        |  CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
        |FROM sh GROUP BY 1 ORDER BY shard""".stripMargin,
    // Priority = integer-exact division; the double is bit-identical
    // in both engines, so ORDER BY priority is stable cross-engine.
    "p10_priority_sample" ->
      """WITH a AS (
        |  SELECT doc_id, source, n_chars,
        |    doc_id % 4294967296 AS a32
        |  FROM documents),
        |pr AS (
        |  SELECT doc_id, source, n_chars,
        |    ((a32 % 65536) * 2654404608 + a32 * 31153) % 4294967296 AS v
        |  FROM a)
        |SELECT doc_id, source, n_chars,
        |  CAST(n_chars * 4294967296 AS DOUBLE) / CAST(v + 1 AS DOUBLE) AS priority
        |FROM pr
        |ORDER BY priority DESC, doc_id ASC
        |LIMIT 100""".stripMargin,
    // Same two-layer determinism: integer weight sum, one exact-<2^53
    // float ratio, md5-ranked selection.
    "p9_temperature_mix" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_before FROM documents GROUP BY 1),
        |weighted AS (
        |  SELECT source, n_before,
        |    CAST(floor(sqrt(CAST(n_before AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
        |  FROM counts),
        |tot AS (
        |  SELECT CAST(sum(w) AS BIGINT) AS wsum,
        |    CAST(sum(n_before) AS BIGINT) // 2 AS budget
        |  FROM weighted),
        |targets AS (
        |  SELECT source, n_before,
        |    least(n_before,
        |      CAST(floor(CAST(budget AS DOUBLE) * CAST(w AS DOUBLE) /
        |                 CAST(wsum AS DOUBLE)) AS BIGINT)) AS n_target
        |  FROM weighted, tot),
        |ranked AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
        |  FROM documents),
        |kept AS (
        |  SELECT r.source, count(*) AS n_kept, sum(r.doc_id) AS kept_id_sum
        |  FROM ranked r JOIN targets t USING (source)
        |  WHERE r.rk <= t.n_target
        |  GROUP BY 1)
        |SELECT t.source, CAST(t.n_before AS BIGINT) AS n_before,
        |  CAST(t.n_target AS BIGINT) AS n_target,
        |  CAST(k.n_kept AS BIGINT) AS n_kept,
        |  CAST(k.kept_id_sum AS BIGINT) AS kept_id_sum
        |FROM targets t JOIN kept k USING (source)
        |ORDER BY source""".stripMargin,
    // p6's CTEs plus the exact cross-Jaccard ground truth (the d2
    // oracle bet: LSH misses at the theta=0.5 boundary are ~1e-4, so
    // the exact all-pairs truth equals the banded+verified output).
    "p8_neardup_admission" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t,
        |         len(string_split(text, ' ')) AS nt, md5(text) AS fp, text
        |  FROM documents),
        |corpus_fp AS (
        |  SELECT DISTINCT fp FROM docs WHERE doc_id % 5 <> 4 AND nt >= 25),
        |corpus_sh AS (
        |  SELECT md5(text) AS cid,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |      FOR i IN range(1, len(t) - 1)]) AS shingles
        |  FROM (SELECT DISTINCT ON (md5(text)) md5(text), t, text FROM docs
        |        WHERE doc_id % 5 <> 4 AND nt >= 25)),
        |shard AS (
        |  SELECT doc_id, lang, nt, fp, t FROM docs WHERE doc_id % 5 = 4),
        |shard_sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |      FOR i IN range(1, len(t) - 1)]) AS shingles
        |  FROM shard WHERE nt >= 25),
        |cx AS (SELECT cid, unnest(shingles) AS s FROM corpus_sh),
        |sx AS (SELECT doc_id, unnest(shingles) AS s FROM shard_sh),
        |near AS (
        |  SELECT DISTINCT p.doc_id FROM (
        |    SELECT sx.doc_id, cx.cid, count(*) AS shared
        |    FROM sx JOIN cx ON sx.s = cx.s GROUP BY 1, 2) p
        |  JOIN (SELECT doc_id, len(shingles) AS na FROM shard_sh) a ON p.doc_id = a.doc_id
        |  JOIN (SELECT cid, len(shingles) AS nb FROM corpus_sh) b ON p.cid = b.cid
        |  WHERE CAST(p.shared AS DOUBLE) / (a.na + b.nb - p.shared) >= 0.5),
        |first_ids AS (
        |  SELECT fp, min(doc_id) AS first_id FROM shard WHERE nt >= 25 GROUP BY fp)
        |SELECT s.doc_id, s.lang, s.nt AS n_tokens,
        |  CASE
        |    WHEN s.nt < 25 THEN 'low_quality'
        |    WHEN c.fp IS NOT NULL THEN 'dup_vs_corpus'
        |    WHEN n.doc_id IS NOT NULL THEN 'near_dup_vs_corpus'
        |    WHEN s.doc_id <> f.first_id THEN 'dup_in_shard'
        |    ELSE 'accepted'
        |  END AS verdict
        |FROM shard s
        |  LEFT JOIN corpus_fp c ON s.fp = c.fp
        |  LEFT JOIN near n ON s.doc_id = n.doc_id
        |  LEFT JOIN first_ids f ON s.fp = f.fp
        |ORDER BY s.doc_id""".stripMargin,
    "p7_sequence_packing" ->
      """WITH d AS (
        |  SELECT doc_id, lang, doc_id // 100 AS shard,
        |         len(string_split(text, ' ')) AS nt
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, shard, nt,
        |    sum(nt) OVER (PARTITION BY lang, shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT doc_id, lang, shard, nt AS n_tokens,
        |  CAST((cum - nt) // 512 AS BIGINT) AS start_seq,
        |  CAST((cum - nt) % 512 AS BIGINT) AS start_offset,
        |  CAST((cum - 1) // 512 - (cum - nt) // 512 + 1 AS BIGINT)
        |    AS seqs_spanned
        |FROM c
        |ORDER BY doc_id""".stripMargin,
    "p6_incremental_update" ->
      """WITH docs AS (
        |  SELECT doc_id, lang, len(string_split(text, ' ')) AS nt,
        |         md5(text) AS fp
        |  FROM documents),
        |corpus_fp AS (
        |  SELECT DISTINCT fp FROM docs
        |  WHERE doc_id % 5 <> 4 AND nt >= 25),
        |shard AS (
        |  SELECT doc_id, lang, nt, fp FROM docs WHERE doc_id % 5 = 4),
        |first_ids AS (
        |  SELECT fp, min(doc_id) AS first_id FROM shard
        |  WHERE nt >= 25 GROUP BY fp)
        |SELECT s.doc_id, s.lang, s.nt AS n_tokens,
        |  CASE
        |    WHEN s.nt < 25 THEN 'low_quality'
        |    WHEN c.fp IS NOT NULL THEN 'dup_vs_corpus'
        |    WHEN s.doc_id <> f.first_id THEN 'dup_in_shard'
        |    ELSE 'accepted'
        |  END AS verdict
        |FROM shard s
        |  LEFT JOIN corpus_fp c ON s.fp = c.fp
        |  LEFT JOIN first_ids f ON s.fp = f.fp
        |ORDER BY s.doc_id""".stripMargin,
    // p2's survivor CTEs + d11's window-fingerprint folds, then the
    // keep/trim/drop classification; n_windows = nt - 7 for every
    // survivor (all have nt >= 25 >= 8).
    "p5_passage_trim" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text,
        |    len(string_split(text, ' ')) AS nt
        |  FROM documents),
        |q AS (SELECT * FROM d WHERE nt >= 25),
        |s AS (
        |  SELECT lang, md5(text) AS cfp, min(doc_id) AS doc_id,
        |    min(text) AS text, min(nt) AS nt
        |  FROM q GROUP BY 1, 2),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM s),
        |w AS (
        |  SELECT doc_id, list_transform(t, w -> list_reduce(
        |      list_prepend(0::BIGINT,
        |        list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
        |      (h, c) -> (h * 131 + c) % 1000000007)) AS whs
        |  FROM tok WHERE len(t) >= 8),
        |v AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(whs) - 6),
        |      i -> list_reduce(list_prepend(0::BIGINT, whs[i:i+7]),
        |             (h, x) -> (h * 1000003 + x) % 1000000007))) AS fp
        |  FROM w),
        |pdf AS (SELECT fp, doc_id, count(*) AS occ FROM v GROUP BY 1, 2),
        |dup AS (SELECT fp FROM pdf GROUP BY fp HAVING count(*) >= 2),
        |ds AS (
        |  SELECT p.doc_id, sum(p.occ) AS n_dup
        |  FROM pdf p JOIN dup USING (fp) GROUP BY 1),
        |cls AS (
        |  SELECT s.lang, s.nt,
        |    coalesce(ds.n_dup::DOUBLE / (s.nt - 7), 0.0) AS dupf
        |  FROM s LEFT JOIN ds ON s.doc_id = ds.doc_id)
        |SELECT lang,
        |  CASE WHEN dupf >= 0.8 THEN 'drop'
        |       WHEN dupf >= 0.2 THEN 'trim'
        |       ELSE 'keep' END AS action,
        |  count(*) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  round(avg(dupf), 6) AS avg_dup_frac
        |FROM cls GROUP BY 1, 2
        |ORDER BY lang, action""".stripMargin,
    "p4_stratified_split" ->
      """WITH d AS (
        |  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM d),
        |sp AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN rk * 10 <= n * 8 THEN 'train'
        |         WHEN rk * 10 <= n * 9 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM r)
        |SELECT lang, split, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM sp GROUP BY 1, 2
        |ORDER BY lang, split""".stripMargin,
    "p3_quota_mix" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_before FROM documents GROUP BY 1),
        |t AS (SELECT min(n_before) AS m FROM c),
        |k AS (
        |  SELECT d.lang, count(*) AS n_after
        |  FROM documents d JOIN c ON d.lang = c.lang, t
        |  WHERE (d.doc_id % 1048576 * 489905) % 1048576 * c.n_before
        |        < t.m * 1048576
        |  GROUP BY d.lang)
        |SELECT c.lang, c.n_before, coalesce(k.n_after, 0) AS n_after
        |FROM c LEFT JOIN k ON c.lang = k.lang
        |ORDER BY c.lang""".stripMargin,
    "p1_corpus_clean" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text,
        |    len(string_split(text, ' ')) AS nt
        |  FROM documents),
        |q AS (SELECT * FROM d WHERE nt >= 25),
        |kept AS (
        |  SELECT lang, md5(text) AS fp, min(doc_id) AS keep_id,
        |    min(nt) AS nt
        |  FROM q GROUP BY lang, md5(text)),
        |t AS (SELECT lang, count(*) AS n_total FROM d GROUP BY lang),
        |qc AS (SELECT lang, count(*) AS n_quality FROM q GROUP BY lang),
        |ks AS (
        |  SELECT lang, count(*) AS n_kept,
        |    round(avg(nt), 2) AS avg_tokens_kept
        |  FROM kept GROUP BY lang)
        |SELECT t.lang, n_total, n_quality, n_kept, avg_tokens_kept
        |FROM t JOIN qc ON t.lang = qc.lang JOIN ks ON t.lang = ks.lang
        |ORDER BY t.lang""".stripMargin,
    // Ground-truth near-dup removal (exact Jaccard over 3-gram
    // shingles) — equals the LSH path's output at this threshold for
    // the same recall argument as d2's oracle.
    "p2_corpus_neardedup" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text,
        |    len(string_split(text, ' ')) AS nt
        |  FROM documents),
        |q AS (SELECT * FROM d WHERE nt >= 25),
        |surv AS (
        |  SELECT lang, md5(text) AS fp, min(doc_id) AS doc_id,
        |    min(text) AS text, min(nt) AS nt
        |  FROM q GROUP BY lang, md5(text)),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM surv),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS shingles
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |rm AS (
        |  SELECT DISTINCT id_b AS doc_id
        |  FROM pairs JOIN sizes sa ON id_a = sa.doc_id
        |             JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
        |fin AS (
        |  SELECT * FROM surv
        |  WHERE doc_id NOT IN (SELECT doc_id FROM rm))
        |SELECT lang, count(*) AS n_final,
        |  CAST(sum(nt) AS BIGINT) AS total_tokens,
        |  round(avg(nt), 2) AS avg_tokens
        |FROM fin GROUP BY lang
        |ORDER BY lang""".stripMargin
  )
}
