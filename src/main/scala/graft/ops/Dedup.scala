package graft.ops

import graft.functions.SimHash60Portable.simhash60
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite over the `documents` and `embeddings` tables —
  * the training-data-pipeline operators the north star mandates beyond
  * the reference surface (SURVEY.md §2.3).
  *
  * Scale design: nothing here is O(n²) over the corpus. Exact dedup is
  * a hash aggregate; MinHash/SimHash generate candidates by banding
  * (shuffle on a band key, pairs only within buckets); the one
  * relational all-pairs join (d4) is blocked on (lang, shingle), so
  * work is proportional to shared-shingle co-occurrence, not to n².
  */
object Dedup {

  /** d39/d40's composite (θ[, arm], vec_id) → long encodings pack the
    * id into the low 44 bits; an id at or above 2⁴⁴ (or negative)
    * would silently corrupt the θ/arm decode and merge unrelated
    * components. [[checkedVecId]] fails fast instead (round-12
    * ADVICE): the guard rides the encode expression itself — no extra
    * driver action, one comparison per edge endpoint.
    */
  private[graft] val CompositeShift = 17592186044416L // 2^44

  private[graft] def checkedVecId(c: Column): Column =
    when(
      c < lit(0L) || c >= lit(CompositeShift),
      raise_error(concat(lit("composite-encoding vec_id outside [0, 2^44): "), c.cast("string"))))
      .otherwise(c)

  /** Tokens of the space-separated text column. */
  private def toks: Column = split(col("text"), " ")

  /** Docs with their n-gram shingle sets as sorted distinct 64-bit
    * hashes (`array<long>`), via the one-pass native
    * [[graft.functions.WordNgramHashes]] — strings never materialize;
    * all downstream set algebra (minhash, banding, intersect counts)
    * runs on the hashes. Equal to string-shingle set algebra up to
    * 64-bit collisions (negligible; see the expression's scaladoc).
    */
  private[graft] def docsWithShingles(s: SparkSession, dir: String, n: Int): DataFrame =
    shingled(Tables.spread(Tables.documents(s, dir)), n)

  /** Same shingling over an arbitrary (doc_id, lang, text) relation —
    * lets composite pipelines (Corpus.p2) near-dup whatever subset
    * survives their upstream stages.
    */
  private[ops] def shingled(docs: DataFrame, n: Int): DataFrame =
    docs
      .withColumn("toks", toks)
      .filter(size(col("toks")) >= n)
      .select(
        col("doc_id"),
        col("lang"),
        graft.functions.WordNgramHashes.wordNgramHashes(col("toks"), n).as("hs"))

  /** Asymmetric LSH admission probe: `probe` docs against a STANDING
    * corpus's band table — the batch twin of the streaming near-dup
    * gate (graft.streaming.Streams), sharing [[bandKeys]] so all three
    * surfaces (d2's in-set banding, the stream gate, this cross probe)
    * collide on identical keys. The corpus side is the index a
    * production ingest maintains incrementally (signature/band rows,
    * never text); the probe side shuffles only its band keys into the
    * equi-join, so admission cost is proportional to bucket
    * co-occupancy — the corpus is never rescanned pairwise. Returns
    * (probe_id, corpus_id, jac) for every exact-verified cross pair
    * with shingle-Jaccard ≥ `threshold`; same (1−s²)^32 recall bound
    * as [[d2MinHashLsh]].
    */
  private[ops] def crossNearDupPairs(
      corpus: DataFrame, // (doc_id, lang, text)
      probe: DataFrame, // (doc_id, lang, text)
      n: Int,
      threshold: Double): DataFrame = {
    val numHashes = 64
    val rowsPerBand = 2
    val numBands = numHashes / rowsPerBand
    // each side feeds its band table AND its verify set — checkpoint
    // once (nearDupPairs' pattern), compact (doc_id, hs) rows only
    val ca = shingled(corpus, n).localCheckpoint()
    val pa = shingled(probe, n).localCheckpoint()
    def bands(sh: DataFrame, idName: String) = sh
      .select(
        col("doc_id"),
        graft.functions.MinHashFromHashes
          .minhashFromHashes(col("hs"), numHashes)
          .as("sig"))
      .select(col("doc_id").as(idName), explode(bandKeys(numBands, rowsPerBand)).as("bk"))
    val cand = bands(pa, "probe_id")
      .join(bands(ca, "corpus_id"), "bk")
      .select(col("probe_id"), col("corpus_id"))
      .distinct()
    cand
      .join(
        pa.select(col("doc_id").as("probe_id"), col("hs").as("sa"), size(col("hs")).as("na")),
        "probe_id")
      .join(
        ca.select(col("doc_id").as("corpus_id"), col("hs").as("sb"), size(col("hs")).as("nb")),
        "corpus_id")
      .withColumn(
        "shared",
        graft.functions.SortedArrayIntersectCount
          .sortedIntersectCount(col("sa"), col("sb"))
          .cast("double"))
      .withColumn("jac", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= threshold)
      .select(col("probe_id"), col("corpus_id"), col("jac"))
  }

  /** d1 — exact dedup by content fingerprint: canonical hash-groupBy
    * shape (this is what `dropDuplicates` compiles to, made
    * deterministic by keeping min doc_id as the representative).
    */
  def d1ExactDedup(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies")
      )
      .orderBy("fp")

  /** d2 — MinHash + LSH near-dup detection with exact verification.
    *
    * 3-gram shingles → 64 minhashes (xxhash64 seeded 0..63) → 32 bands
    * of 2 rows → candidate pairs = docs sharing any band bucket →
    * exact-Jaccard verify ≥ 0.5. The band self-join shuffles on the
    * band key, so candidate generation is linear in bucket
    * co-occupancy, never all-pairs. Recall bound (r=2, b=32): the miss
    * probability for a pair at exact Jaccard s is (1-s²)^32 — ≈ 1e-4
    * at the θ=0.5 boundary, ≈ 1.2e-5 at s=0.55, ≈ 4e-10 at the ≥0.9
    * pairs this corpus plants — so the exact-verified output equals
    * the exhaustive ground-truth oracle except with probability
    * ≤ 1e-4 × (number of pairs sitting exactly at the threshold),
    * negligible even on regenerated fixtures.
    */
  def d2MinHashLsh(s: SparkSession, dir: String): DataFrame =
    nearDupPairs(docsWithShingles(s, dir, 3), 0.5)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  /** MinHash+LSH candidate generation + exact verify over a shingled
    * relation (output of [[shingled]]): returns (id_a, id_b, jac) for
    * every pair with exact shingle-Jaccard ≥ `threshold`, id_a < id_b.
    * Shapes and guarantees as documented on [[d2MinHashLsh]].
    */
  /** LSH band keys off a minhash `sig` column: array of (band, h1, h2)
    * structs, r=2 rows per band. Shared by d2's batch banding and the
    * streaming near-dup gate (graft.streaming.Streams), so both paths
    * collide on identical keys.
    */
  private[graft] def bandKeys(numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      struct(
        lit(b).as("band"),
        element_at(col("sig"), rowsPerBand * b + 1).as("h1"),
        element_at(col("sig"), rowsPerBand * b + 2).as("h2")
      )
    }: _*)

  private[ops] def nearDupPairs(sh: DataFrame, threshold: Double): DataFrame = {
    val numHashes = 64
    val rowsPerBand = 2
    val numBands = numHashes / rowsPerBand

    // The shingled relation is consumed THREE times below (signature
    // + both exact-verify sides), and callers hand in arbitrarily
    // expensive upstreams (p2: quality gate → exact dedup → shingle
    // kernel). localCheckpoint materializes it once — compact
    // (doc_id, lang, hs) rows, no text — instead of recomputing the
    // upstream per consumer (d6's proven lineage-truncation pattern).
    // Measured at sf0.1 under matched load: p2 2.49→2.22 s and (with
    // p5's survivor checkpoint) p5 2.48→2.18 s; d2, whose upstream is
    // just the scan+kernel, is unchanged within noise (1.52→1.58 s).
    val shCk = sh.localCheckpoint()

    // One-pass native signature (array<long>, length 32) derived from
    // the pre-hashed shingles — no string re-reads.
    val sig = shCk.select(
      col("doc_id"),
      graft.functions.MinHashFromHashes
        .minhashFromHashes(col("hs"), numHashes)
        .as("sig"))

    val banded = sig
      .select(col("doc_id"), explode(bandKeys(numBands, rowsPerBand)).as("bk"))

    val candidates = banded
      .as("a")
      .join(banded.as("b"), col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    // exact-verify on the sorted hash sets with the native merge count
    val sets = shCk.select(col("doc_id"), col("hs"), size(col("hs")).as("n"))
    candidates
      .join(
        sets.withColumnRenamed("doc_id", "id_a").withColumnRenamed("hs", "sa")
          .withColumnRenamed("n", "na"),
        "id_a")
      .join(
        sets.withColumnRenamed("doc_id", "id_b").withColumnRenamed("hs", "sb")
          .withColumnRenamed("n", "nb"),
        "id_b")
      .select(
        col("id_a"),
        col("id_b"),
        col("na"),
        col("nb"),
        explode(
          array(
            graft.functions.SortedArrayIntersectCount
              .sortedIntersectCount(col("sa"), col("sb"))
              .cast("double"))).as("shared"))
      .withColumn("jac", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** d3 — SimHash near-dup detection via the native
    * [[graft.functions.SimHash60Portable]] expression: 60-bit sketch
    * per doc from engine-portable polynomial token hashes, 4×15-bit
    * band blocking (pigeonhole: Hamming ≤ 3 ⇒ at least one of 4 bands
    * identical), Hamming-distance filter. The portable hash is what
    * makes this FULLY oracle-checkable: DuckDB recomputes the exact
    * sketch (a `(acc*base+byte) % prime` fold per token), the exact
    * band buckets, and the exact Hamming distances, so the driver
    * hash-compares every pair instead of the weaker rows-only check a
    * xxhash64 sketch would force. Same banding shape as d2: candidates
    * come from a bucket equi-join, never an all-pairs scan.
    */
  def d3SimHash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .spread(Tables.documents(s, dir))
      .select(col("doc_id"), simhash60(split(col("text"), " ")).as("sh"))

    val banded = docs.select(
      col("doc_id"),
      col("sh"),
      explode(
        array((0 until 4).map(b =>
          struct(lit(b).as("band"), shiftright(col("sh"), 15 * b).bitwiseAND(lit(0x7FFFL)).as("bits"))): _*)
      ).as("bk")
    )

    banded
      .as("a")
      .join(banded.as("b"), col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming")
      )
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }

  /** d4 — exact n-gram Jaccard near-dup: lang-blocked pairwise join
    * with a native sorted-merge intersect count over hashed shingle
    * sets.
    *
    * Algorithm choice is corpus-statistics-driven ("measure, don't
    * guess"). The textbook exact shapes are (a) an inverted-index
    * co-occurrence join (work ∝ Σ bucket², optimal when the shingle
    * vocabulary is large/sparse) and (b) AllPairs prefix filtering
    * (Bayardo et al. 2007; needs rare shingles to prune). This corpus
    * has only ~931 distinct 2-gram shingles across 5000 docs (avg
    * document frequency ~275), so EVERY doc pair shares shingles: (a)
    * materializes ~36M pair rows and (b) prunes nothing. In that dense
    * regime the right exact plan is blocked pairwise verification —
    * each doc's shingle set as a sorted `array<long>` of xxhash64
    * keys, one broadcast-joined pass over within-block pairs, and an
    * allocation-free O(|a|+|b|) merge count per pair
    * ([[graft.functions.SortedArrayIntersectCount]]).
    *
    * At 100 TB the block key is whatever bounds the comparison set
    * (lang here; lang × shard for web corpora, with LSH (d2) as the
    * candidate generator when blocks grow); for sparse vocabularies
    * flip back to the co-occurrence join — implemented as
    * [[d13InvertedJaccard]], which demonstrates exactly that regime
    * at n=5. A 64-bit hash collision
    * perturbing a count needs two of the distinct shingles to collide
    * (p ≈ V²/2⁶⁵ ≈ 1e-13 here).
    *
    * Hint posture: the `broadcast(sets)` below IS a hint on the corpus
    * itself — legitimate only inside this operator's declared regime
    * (exact verification of a block set small enough to broadcast; the
    * dense-vocab fixture). The moment blocks outgrow the broadcast
    * threshold the regime has changed and the operator to reach for is
    * [[d2MinHashLsh]]/[[d13InvertedJaccard]], not this one with the
    * hint removed — an unhinted version of this join would shuffle on
    * the 5-value `lang` key, which is worse skew than the broadcast.
    */
  def d4NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val theta = 0.5
    val sh = docsWithShingles(s, dir, 2)
    val sets = sh.select(
      col("doc_id"),
      col("lang"),
      col("hs"), // already sorted distinct hashes from WordNgramHashes
      size(col("hs")).as("n"))

    sets
      .as("a")
      .join(
        broadcast(sets.as("b")),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id") &&
          // exact length prefilter: J(a,b) ≥ θ ⟹ min(|a|,|b|) ≥ θ·max —
          // prunes ~half the pairs before any merge work, loses none
          col("a.n") >= col("b.n") * theta && col("b.n") >= col("a.n") * theta)
      // Generate (explode of a 1-element array) is a projection barrier:
      // without it, CollapseProject inlines the merge-count into both
      // the threshold filter and the output projection and it runs
      // twice per pair. With it, `shared` is a materialized attribute.
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        col("a.lang").as("lang"),
        (col("a.n") + col("b.n")).as("ntot"),
        explode(
          array(
            graft.functions.SortedArrayIntersectCount
              .sortedIntersectCount(col("a.hs"), col("b.hs"))
              .cast("double"))).as("shared"))
      .withColumn("jac", col("shared") / (col("ntot") - col("shared")))
      .filter(col("jac") >= theta)
      .select(col("id_a"), col("id_b"), col("lang"), round(col("jac"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** d12 — shingle CONTAINMENT dedup: pairs where the smaller doc's
    * shingle set is mostly inside the larger's —
    * `|A∩B| / min(|A|,|B|) ≥ 0.5`. This is the asymmetric complement
    * of d4's Jaccard: a short document quoted verbatim inside a much
    * longer one has near-1 containment but near-0 Jaccard (the union
    * is dominated by the long doc), so symmetric thresholds
    * structurally miss the embedded-copy / quotation pattern that
    * training corpora are full of. Same lang-blocked pairwise shape
    * and native sorted-merge intersect as d4 — and deliberately NO
    * length-ratio prefilter, because length asymmetry is exactly the
    * signal here; the blocking regime analysis on d4 applies
    * unchanged.
    */
  def d12Containment(s: SparkSession, dir: String): DataFrame = {
    val theta = 0.5
    val sets = docsWithShingles(s, dir, 2).select(
      col("doc_id"),
      col("lang"),
      col("hs"),
      size(col("hs")).as("n"))
    sets
      .as("a")
      .join(
        broadcast(sets.as("b")),
        col("a.lang") === col("b.lang") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        col("a.lang").as("lang"),
        least(col("a.n"), col("b.n")).as("nmin"),
        explode(
          array(
            graft.functions.SortedArrayIntersectCount
              .sortedIntersectCount(col("a.hs"), col("b.hs"))
              .cast("double"))).as("shared"))
      .withColumn("containment", col("shared") / col("nmin"))
      .filter(col("containment") >= theta)
      .select(
        col("id_a"),
        col("id_b"),
        col("lang"),
        round(col("containment"), 4).as("containment"))
      .orderBy("id_a", "id_b")
  }

  /** d13 — exact n-gram Jaccard via the INVERTED-INDEX co-occurrence
    * join: the postings form whose flip condition d4's scaladoc names
    * but does not implement. Same pair semantics as d4 (lang-blocked
    * pairs with exact shingle-Jaccard ≥ 0.5), different physical plan
    * for the opposite vocabulary regime.
    *
    * d4's 2-gram domain is DENSE (~931 distinct shingles over 5000
    * docs, avg df ~275): every pair shares shingles, so postings
    * co-occurrence materializes ~36M pair rows and blocked-pairwise
    * merge counting wins. This query shingles at n=5, where random
    * text makes the vocabulary SPARSE (df ≈ 1 for natural windows;
    * only planted near-dup spans repeat): Σ df(s)² collapses to about
    * the number of genuinely shared windows, so the co-occurrence
    * join touches ~only true-positive pairs while a pairwise scan
    * would still compare every within-block pair. THE REGIME RULE:
    * pairwise when avg df ≳ docs-per-block (dense), postings when
    * df ≈ 1 (sparse); both ends now sit in this suite, each
    * oracle-checked against the same ground-truth SQL shape.
    *
    * At 100 TB: the postings self-join shuffles on the shingle hash —
    * work ∝ Σ df², so a skewed stop-shingle (df in the millions) is
    * the failure mode. Since round 9 the guard is CODE, not a comment:
    * shingles with document frequency above [[D13DfCap]] are dropped
    * from the index BEFORE the self-join (they carry no dedup signal —
    * a shingle shared by a million docs identifies nothing), which
    * bounds every postings bucket at ≤ cap and the pair work at
    * Σ min(df, cap)² — the standard AllPairs/prefix-filter companion.
    * Jaccard is then computed over the CAPPED vocabulary on both
    * engines (set sizes recounted post-cap), so the oracle applies
    * the identical threshold and the gate stays exact. The df count
    * groups on the same (lang, shingle) key the self-join shuffles
    * on, so the cap rides the join's existing exchange. The fixture's
    * 5-gram df is naturally ≤ a few — the cap provably drops nothing
    * here (OpsSpec pins capped == uncapped on the fixture, and plants
    * an ultra-frequent shingle to pin the bound bites when it must).
    */
  private[graft] val D13DfCap = 64L

  /** Postings with every (lang, shingle) of document frequency > cap
    * removed, plus the post-cap per-doc set sizes. `sh` must carry
    * (doc_id, lang, hs: array<long> of DISTINCT shingle hashes) — so
    * per-posting count == df.
    */
  private[graft] def cappedPostings(sh: DataFrame, dfCap: Long): (DataFrame, DataFrame) = {
    val postings = sh.select(col("doc_id"), col("lang"), explode(col("hs")).as("h"))
    val keep = postings
      .groupBy(col("lang"), col("h"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("lang"), col("h"))
    val capped = postings.join(keep, Seq("lang", "h"), "left_semi")
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    (capped, sizes)
  }

  /** Candidate co-occurrence pairs over a (capped) postings list —
    * exposed separately so the spec can pin the WORK BOUND (candidate
    * row count), not just the thresholded output.
    */
  private[graft] def coOccurrencePairs(postings: DataFrame): DataFrame =
    postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        col("a.lang").as("lang"))
      .agg(count(lit(1)).as("shared"))

  private[graft] def invertedJaccardFrom(sh: DataFrame, dfCap: Long, theta: Double): DataFrame = {
    val (capped, sizes) = cappedPostings(sh, dfCap)
    coOccurrencePairs(capped)
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .withColumn(
        "jac",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= theta)
      .select(col("id_a"), col("id_b"), col("lang"), round(col("jac"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  def d13InvertedJaccard(s: SparkSession, dir: String): DataFrame =
    invertedJaccardFrom(docsWithShingles(s, dir, 5), D13DfCap, theta = 0.5)

  /** d5 — embedding near-dup: cosine-threshold self-join in exact
    * double arithmetic (`zip_with` + `aggregate` fold left-to-right,
    * matching the oracle's list_inner_product order bit-for-bit).
    * All-pairs here because the corpus's embedding table is a small
    * dimension (≤ thousands); the scale path for billions of vectors
    * is the LSH bucketing in [[Similarity.s2KnnLsh]].
    */
  def d5EmbedNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .spread(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))

    e.as("a")
      .join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos", Similarity.dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
      .filter(col("cos") >= 0.4)
      .select(
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        round(col("cos"), 4).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** d10 — BUCKETED threshold-pair embedding near-dup: the scale path
    * for [[d5EmbedNearDup]]'s pair-list form. Candidates come from
    * random-hyperplane LSH (16 tables × 12 planes, deterministic LCG
    * planes — [[Similarity.lcgPlanes]]), so the corpus only ever
    * equi-joins itself on a (table, bucket) key — work is proportional
    * to bucket co-occupancy, never n² — and every candidate is
    * exact-cosine verified, so false positives are impossible.
    *
    * The corpus under test is the embeddings table plus a
    * deterministically perturbed near-dup copy of every vector
    * (dimension i scaled by 1±0.05, id offset 1e6) — the fixture
    * corpus has no true near-dups of its own (max pairwise cosine
    * ~0.61; measured at sf0.001/0.01/0.1), and near-dup pairs are the
    * regime this operator exists for. Both engines rebuild the same
    * augmented corpus, so the oracle is ground truth: the exhaustive
    * all-pairs join at θ=0.9.
    *
    * Exactness argument (same style as d2's (1−s²)^32 bound): a pair
    * at cosine c collides in one table with prob p^12,
    * p = 1 − acos(c)/π, and is missed by all 16 tables with prob
    * (1−p^12)^16. The augmented corpus's qualifying pairs all sit at
    * c ≈ 0.99875 (planted; measured min) → per-pair miss ≈ 8e-13;
    * non-qualifying pairs top out at c ≈ 0.61 and cannot pass the
    * exact verify. So LSH output ≡ exhaustive output, and the driver
    * hash-compares it. HONEST LIMIT, documented: at d5's θ=0.4 the
    * qualifying pairs sit exactly at the threshold (min 0.4005) where
    * p^k ≈ 0.16 — no sub-quadratic candidate generator can be exact
    * there (to drive (1−0.16)^L below 1e-7 takes L≈32 tables of 2^2
    * buckets — more work than brute force); boundary-threshold scans
    * stay on d5's exact path, near-dup thresholds take this one.
    *
    * At 100 TB: banding shuffles narrow (vec_id, table, bucket) rows
    * (id-pairs only after the bucket join — vectors are re-fetched by
    * two equi-joins for the verify, the d2 shape, rather than carried
    * ×16 through the banding exchange), bucket count 2^12 per table
    * scales with corpus via the plane count, and the verify join is a
    * plain shuffled hash join on vec_id.
    */
  def d10EmbedNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    val theta = 0.9
    val orig = Tables
      .embeddings(s, dir)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding").cast("array<double>").as("v"))
    // deterministic near-dup plant: multiplicative ±5% alternating by
    // dimension — cosine to the original ≈ 1 − ε²/2 regardless of the
    // vector's norm, and IEEE multiplication reproduces bit-for-bit in
    // any engine (Spark's transform index is 0-based, the oracle
    // lambda's is 1-based; i%2===0 here ↔ i%2=1 there)
    val pert = orig.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("v"), (x, i) =>
        x * when(i % 2 === 0, lit(1.05)).otherwise(lit(0.95))).as("v"))
    val aug = orig
      .unionAll(pert)
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))

    val planes = Similarity.lcgPlanes(0xC2B2AE3D27D4EB4FL, tables = 16, planes = 12, dim = 64)
    val banded = aug.select(
      col("vec_id"),
      explode(Similarity.tableBucketsFor(col("v"), planes)).as("tb"))
    val candidates = banded
      .as("a")
      .join(banded.as("b"), col("a.tb") === col("b.tb") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()

    val sets = aug.select(col("vec_id"), col("v"), col("norm"))
    candidates
      .join(
        sets.toDF("id_a", "va", "na"),
        "id_a")
      .join(
        sets.toDF("id_b", "vb", "nb"),
        "id_b")
      .withColumn("cos", Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= theta)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** d6 — near-dup CLUSTER formation: the pair list (d2's LSH +
    * exact-verify machinery) is only half of dedup — a pipeline must
    * then pick one representative per connected component of the
    * pair graph (A~B, B~C ⇒ {A,B,C} keep one). Components are
    * computed with Hash-Min label propagation: every node starts
    * labeled with itself; each round, a node takes the min label in
    * its neighborhood; fixpoint in O(component diameter) rounds —
    * near-dup clusters are clique-ish, so 2–3 rounds in practice.
    *
    * Scale posture: this is the standard Spark connected-components
    * loop — one key shuffle per round over the PAIR GRAPH only (docs
    * that matched at θ — orders of magnitude smaller than the
    * corpus), with `localCheckpoint()` truncating lineage each round
    * so the plan does not grow with iteration count. The driver loop
    * carries no data, only the convergence decision (a count).
    */
  def d6DupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairs(docsWithShingles(s, dir, 3), 0.5)
      .select(col("id_a"), col("id_b"))
    // materialize once: every propagation round re-reads the edges,
    // and the LSH pipeline above must not re-run per round
    val edges = pairs
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .localCheckpoint()

    var labels = edges
      .select(col("id_a").as("id"))
      .distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels, edges("id_b") === labels("id"))
        .groupBy(edges("id_a").as("nid"))
        .agg(min(col("label")).as("nlabel"))
      // the `moved` flag rides the propagation row, so convergence
      // detection is a scan of the checkpoint instead of a second
      // next-vs-old join job per round
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(
          col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("nl"),
          col("label").as("old"))
        .select(col("id"), col("nl").as("label"), (col("nl") =!= col("old")).as("moved"))
        .localCheckpoint()
      changed = next.filter(col("moved")).count()
      labels = next.select(col("id"), col("label"))
    }

    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_rep"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** d7 — benchmark decontamination: flag training documents sharing
    * any 8-word shingle with the held-out eval split (doc_id % 10 == 0
    * stands in for the benchmark set). The eval side's distinct
    * shingles are a benchmark-sized set, so the match is a broadcast
    * join against the training corpus — the training side never
    * shuffles. Shingles here are literal strings (the oracle needs
    * engine-portable values); the production path would reuse d2's
    * hashed-shingle machinery for 8× narrower rows. Shingle expansion
    * runs through the custom [[graft.functions.WordNgrams]] generator
    * (the UDTF tier): windows stream straight off the token array with
    * no index/slice intermediates, and the Generate node is immune to
    * the CollapseProject re-evaluation trap (t7) by construction.
    */
  def d7Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val k = 8
    val sh = Tables
      .documents(s, dir)
      .select(col("doc_id"), explode(array(toks)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(
        col("doc_id"),
        graft.functions.WordNgrams.wordNgrams(col("toks"), k).as("sh"))
    val evalSh = sh
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("eval_id"), col("sh"))
      .distinct()
    sh.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(evalSh), "sh")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("sh")).as("n_shared_shingles"),
        countDistinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** d8 — fuzzy canonicalization (record linkage): every part links
    * to the EARLIEST part in its block whose name is within edit
    * distance 2, or stands as its own canonical. Output is one row
    * per entity — never the pair list, which is quadratic in
    * duplicate multiplicity (this fixture's 256-name vocabulary makes
    * that concrete: ~220k pairs vs 20k assignments at sf0.1).
    *
    * Never all-pairs on the corpus: candidates come from equi-joining
    * the (brand, last-word) block — structured attributes first,
    * fuzzy matching only inside blocks — a length-difference
    * prefilter prunes inside the join condition (|Δlen| > θ ⇒
    * distance > θ, for free), and the distance is Spark's THRESHOLD
    * levenshtein: banded O(θ·n) DP with early exit instead of the
    * full matrix. The min-aggregation collapses candidates back to
    * one row per entity before anything leaves the block.
    */
  def d8FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val p = Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        col("p_name"),
        col("p_brand"),
        element_at(split(col("p_name"), " "), -1).as("noun"))
    val earliest = p.alias("a")
      .join(
        p.alias("b"),
        col("a.p_brand") === col("b.p_brand") &&
          col("a.noun") === col("b.noun") &&
          col("b.p_partkey") < col("a.p_partkey") &&
          abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 2)
      .filter(levenshtein(col("a.p_name"), col("b.p_name"), 2) =!= -1)
      .groupBy(col("a.p_partkey").as("p_partkey"))
      .agg(min(col("b.p_partkey")).as("match_key"))
    p.join(earliest, Seq("p_partkey"), "left")
      .select(
        col("p_partkey"),
        coalesce(col("match_key"), col("p_partkey")).as("canonical_key"))
      .withColumn("is_canonical", col("canonical_key") === col("p_partkey"))
      .orderBy("p_partkey")
  }

  /** d9 — canonicalized ("near-exact") dedup: the C4-style recipe
    * where documents are equal after case-folding, stripping
    * non-alphanumerics and collapsing whitespace — catching the
    * reformatted copies exact dedup (d1) misses while staying a pure
    * hash-groupBy (no candidate generation). Canonicalization is
    * scan-side codegen'd string ops; only (fingerprint, id) pairs
    * reach the exchange. The extra hits over d1's raw fingerprints
    * are exactly the reformatted-duplicate mass.
    */
  def d9CanonicalDedup(s: SparkSession, dir: String): DataFrame = {
    val canon = trim(
      regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
        " +",
        " "))
    Tables
      .documents(s, dir)
      .groupBy(md5(canon).as("fp"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"))
      .orderBy("fp")
  }

  /** d11 — passage-level duplicate detection (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better"
    * granularity): document-level dedup (d1/d2/d9) misses REPEATED
    * PASSAGES embedded in otherwise-distinct documents — boilerplate
    * headers, licence blocks, quoted text — which LMs memorize
    * disproportionately. Every W=8-word window gets a rolling
    * fingerprint (t7's engine-portable mod-1e9+7 Rabin–Karp over
    * per-word polynomial hashes); a fingerprint occurring in ≥2
    * distinct documents is duplicated-passage mass. Output per
    * affected document: window count, duplicated-window count and
    * fraction — the signal a pipeline thresholds to drop or trim.
    *
    * Fixed-W windows approximate the paper's suffix-array exact
    * substrings with total recall at the chosen granularity: any
    * shared run of ≥ W tokens shares at least one aligned window.
    * Fingerprint collisions (~1e-9/pair at mod 1e9+7) reproduce
    * identically in both engines (the oracle recomputes the same
    * arithmetic); a production run re-verifies flagged passages by
    * exact bytes before trimming.
    *
    * At 100 TB: text never crosses an exchange — windows collapse
    * scan-side to (fp, doc_id, occ) via a map-side-combined
    * aggregate (16-byte keys), fingerprint document-frequency is a
    * second narrow aggregate, and the duplicated-fp relation that
    * joins back is duplicated-mass-sized (AQE broadcasts it for
    * mostly-unique corpora). Per-doc window totals are computed
    * scan-side (`size`), never recounted downstream.
    */
  def d11PassageDedup(s: SparkSession, dir: String): DataFrame =
    passageWindowStats(Tables.spread(Tables.documents(s, dir)), 8)
      .select(
        col("doc_id"),
        col("n_windows"),
        col("n_dup_windows"),
        round(col("n_dup_windows").cast("double") / col("n_windows"), 6).as("dup_frac"))
      .orderBy("doc_id")

  /** d11's machinery over an arbitrary (doc_id, text) relation —
    * (doc_id, n_windows, n_dup_windows) for every doc carrying at
    * least one duplicated window; lets composite pipelines (Corpus.p5)
    * passage-audit whatever subset survives their upstream stages.
    */
  private[ops] def passageWindowStats(docs: DataFrame, w: Int): DataFrame = {
    // native codegen'd Rabin–Karp kernel — bit-identical to the
    // declarative fold composition and to the oracle's list_reduce
    val wins = docs
      .filter(size(toks) >= w)
      .select(
        col("doc_id"),
        graft.functions.RollingFingerprints.rollingFingerprints(toks, w).as("wh"))
      .select(col("doc_id"), size(col("wh")).as("n_windows"), col("wh"))
    val perDocFp = wins
      .select(col("doc_id"), col("n_windows"), explode(col("wh")).as("fp"))
      .groupBy(col("fp"), col("doc_id"))
      .agg(max(col("n_windows")).as("n_windows"), count(lit(1)).as("occ"))
    // fingerprints with document frequency ≥ 2 = duplicated passages
    val dupFps = perDocFp
      .groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select("fp")
    perDocFp
      .join(dupFps, "fp")
      .groupBy("doc_id")
      .agg(
        max(col("n_windows")).as("n_windows"),
        sum(col("occ")).as("n_dup_windows"))
  }

  /** d14 — SemDeDup-style SEMANTIC dedup (Abbas et al. 2023 shape):
    * coarsely cluster the embedding space, then prune near-identical
    * neighbors WITHIN each cluster — each pruned vector reports the
    * smallest-id cluster-mate it duplicates. The third embedding-dedup
    * regime in the suite: d5 is the exact global O(n²) ground truth,
    * d10 is recall-guaranteed LSH banding, and this is the
    * cluster-bounded form production SemDeDup uses when an embedding
    * index already exists — pairwise work collapses from O(n²) to
    * O(Σ|cluster|²) and the clusters PARTITION the corpus, at the
    * documented recall cost that a near-dup pair split across a
    * cluster boundary is missed.
    *
    * Corpus = d10's deterministically augmented embeddings (the
    * fixture has no organic near-dups; qualifying pairs sit at cosine
    * ≈0.99875, far above the 0.61 organic ceiling, so θ=0.9 separates
    * cleanly). Centroids are K=16 deterministic corpus samples (the
    * s3 rule) — centroid quality moves recall, not operator shape,
    * and determinism makes the output itself oracle-checkable.
    *
    * At 100 TB: assignment is a K-row broadcast argmax on the scan
    * (zero pre-assignment shuffles); the within-cluster self-join
    * shuffles on the cell key, so K is the parallelism ceiling AND
    * the skew knob — production sizes K ∝ corpus/target-cluster-size
    * (SemDeDup uses ~100k clusters for billions of docs), which keeps
    * every Σ|c|² term bounded. The prune rule is a PAIR LIST
    * (smaller-id keeper per dropped vector), not a transitive
    * closure — d6's Hash-Min components is the closure step when
    * chains matter.
    */
  def d14SemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val theta = 0.9
    val orig = Tables
      .embeddings(s, dir)
      .select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val pert = orig.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(
        col("v"),
        (x, i) => x * when(i % 2 === 0, lit(1.05)).otherwise(lit(0.95)))
        .as("v"))
    val aug = Tables
      .spread(orig.unionAll(pert))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))
    val centroids = orig
      .filter(pmod(col("vec_id"), lit(31L)) === 0 && col("vec_id") < lit(496L))
      .select(
        expr("CAST(vec_id div 31 AS INT)").as("cell"),
        col("v").as("cv"))
      .withColumn("cnorm", sqrt(Similarity.dot(col("cv"), col("cv"))))
    val byVec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val assigned = aug
      .crossJoin(broadcast(centroids))
      .withColumn(
        "ccos",
        Similarity.dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("crn", row_number().over(byVec))
      .filter(col("crn") === 1)
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))
    assigned
      .as("a")
      .join(
        assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn(
        "cos",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
      .filter(col("cos") >= theta)
      .groupBy(col("b.cell").as("cell"), col("b.vec_id").as("drop_id"))
      .agg(
        min(col("a.vec_id")).as("keep_id"),
        round(min_by(col("cos"), col("a.vec_id")), 4).as("cosine"))
      .orderBy("drop_id")
  }

  /** d15 — SemDeDup with TOP-2 SOFT ASSIGNMENT: the standard remedy
    * for d14's cluster-split misses (a near-dup pair whose members
    * straddle a centroid boundary is invisible to hard assignment —
    * measured 475/500 planted-pair recall on the fixture). Each vector
    * joins its best TWO cells, pairs form in any shared cell, and
    * DISTINCT collapses pairs that co-occur in both. Recall on the
    * planted perturbed pairs rises to 500/500 (pinned ≥99% in
    * OpsSpec); cost is bounded by 2²·Σ|c|² in the worst case —
    * the same K-governed knob as d14, one constant factor up, still
    * never all-pairs. Output drops d14's cell column (a pair may now
    * legitimately live in two cells); keeper rule and rounding are
    * unchanged.
    */
  def d15SemanticDedupSoft(s: SparkSession, dir: String): DataFrame = {
    val theta = 0.9
    val orig = Tables
      .embeddings(s, dir)
      .select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val pert = orig.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(
        col("v"),
        (x, i) => x * when(i % 2 === 0, lit(1.05)).otherwise(lit(0.95)))
        .as("v"))
    val aug = Tables
      .spread(orig.unionAll(pert))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))
    val centroids = orig
      .filter(pmod(col("vec_id"), lit(31L)) === 0 && col("vec_id") < lit(496L))
      .select(
        expr("CAST(vec_id div 31 AS INT)").as("cell"),
        col("v").as("cv"))
      .withColumn("cnorm", sqrt(Similarity.dot(col("cv"), col("cv"))))
    val byVec = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cell").asc)
    val assigned = aug
      .crossJoin(broadcast(centroids))
      .withColumn(
        "ccos",
        Similarity.dot(col("v"), col("cv")) / (col("norm") * col("cnorm")))
      .withColumn("crn", row_number().over(byVec))
      .filter(col("crn") <= 2)
      .select(col("vec_id"), col("v"), col("norm"), col("cell"))
    assigned
      .as("a")
      .join(
        assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn(
        "cos",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
      .filter(col("cos") >= theta)
      .select(col("b.vec_id").as("drop_id"), col("a.vec_id").as("id_a"), col("cos"))
      .distinct()
      .groupBy(col("drop_id"))
      .agg(
        min(col("id_a")).as("keep_id"),
        round(min_by(col("cos"), col("id_a")), 4).as("cosine"))
      .orderBy("drop_id")
  }

  /** d16 — density-based (DBSCAN-style) clustering of the near-dup
    * graph: where d6 merges EVERY connected doc into one component, a
    * density pass distinguishes structure — CORE docs sit in locally
    * dense regions (≥ 2 distinct θ-neighbors, i.e. DBSCAN minPts = 3
    * counting the point itself), BORDER docs touch a dense region
    * without being dense themselves, and NOISE docs have a match but
    * no dense neighborhood. This matters for template families: d6's
    * single-linkage chains weld separate near-dup families together
    * through one accidental bridge doc; density clustering cuts the
    * chain at the sparse bridge (a degree-1 bridge can never be core,
    * so families stay separate) — the standard reason DBSCAN beats
    * single-linkage CC for dedup-family mining. Clusters form by
    * Hash-Min label propagation over CORE–CORE edges only (the d6
    * loop: one pair-graph-sized shuffle per round, localCheckpoint
    * truncating lineage, a 1-row convergence count driver-side);
    * borders then attach to the min label among their core neighbors
    * — a deterministic tie-break, one extra pair-graph join, no
    * iteration. The ε-graph itself is d2's machinery: LSH-banded
    * candidates + exact Jaccard verification (never all-pairs), so
    * the whole query's exchanges are ∝ matched pairs, not corpus².
    * At 100 TB the density statistics (degree counts) ride the same
    * mirrored edge list the propagation reads — no extra corpus scan.
    */
  def d16DensityClusters(s: SparkSession, dir: String): DataFrame =
    densityRoles(
      nearDupPairs(docsWithShingles(s, dir, 3), 0.5)
        .select(col("id_a"), col("id_b")))

  /** The graph→roles half of d16, parameterized on the pair list so
    * the spec can pin core/border/noise semantics on planted shapes
    * (chains, stars, bridges) independent of what the fixture's
    * near-dup graph happens to contain.
    */
  private[graft] def densityRoles(pairs: DataFrame): DataFrame = {
    val edges = pairs
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .localCheckpoint() // degree pass + every propagation round + border attach
    val core = edges
      .groupBy(col("id_a").as("id"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2)
      .select(col("id"))
    val coreEdges = edges
      .join(core.select(col("id").as("id_a")), "id_a")
      .join(core.select(col("id").as("id_b")), "id_b")
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    var labels = core.withColumn("label", col("id")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = coreEdges
        .join(labels, coreEdges("id_b") === labels("id"))
        .groupBy(coreEdges("id_a").as("nid"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(
          col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("nl"),
          col("label").as("old"))
        .select(col("id"), col("nl").as("label"), (col("nl") =!= col("old")).as("moved"))
        .localCheckpoint()
      changed = next.filter(col("moved")).count()
      labels = next.select(col("id"), col("label"))
    }
    val borders = edges
      .join(labels.select(col("id").as("id_b"), col("label")), "id_b")
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .groupBy(col("id_a").as("id"))
      .agg(min(col("label")).as("label"))
    val noise = edges
      .select(col("id_a").as("id"))
      .distinct()
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .join(borders.select(col("id")), Seq("id"), "left_anti")
    labels
      .select(col("id"), lit("core").as("role"), col("label"))
      .unionAll(borders.select(col("id"), lit("border").as("role"), col("label")))
      .unionAll(noise.select(col("id"), lit("noise").as("role"), lit(null).cast("long").as("label")))
      .select(col("id").as("doc_id"), col("role"), col("label").as("cluster_rep"))
      .orderBy("doc_id")
  }

  /** One sorted-neighborhood pass over a `(doc_id, sk)` keyed
    * projection: 2-char-prefix blocking, window-adjacent candidates
    * from `w` lead columns — the fixed n·w budget d17/d19 share. Kept
    * separate so specs can drive it with PLANTED keys and so each
    * pass of the multi-pass variant is literally the same operator
    * with a different canonical key.
    */
  private[graft] def snCandidates(keyed: DataFrame, w: Int): DataFrame = {
    val blocked = keyed.withColumn("blk", substring(col("sk"), 1, 2))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk"))
      .orderBy(col("sk"), col("doc_id"))
    blocked
      .withColumn(
        "nbrs",
        array((1 to w).map(i => lead(col("doc_id"), i).over(win)): _*))
      .select(col("doc_id"), explode(col("nbrs")).as("nbr"))
      .filter(col("nbr").isNotNull)
      .select(
        least(col("doc_id"), col("nbr")).as("id_a"),
        greatest(col("doc_id"), col("nbr")).as("id_b"))
      .distinct()
  }

  /** Jaccard-verify candidate pairs on the shared hashed-shingle sets
    * (the d2 machinery) — the exact-verify stage d17/d19 share.
    */
  private def snVerify(s: SparkSession, dir: String, cand: DataFrame): DataFrame = {
    val sets = docsWithShingles(s, dir, 3)
      .select(col("doc_id"), col("hs"), size(col("hs")).as("n"))
    cand
      .join(
        sets.select(col("doc_id").as("id_a"), col("hs").as("sa"), col("n").as("na")),
        "id_a")
      .join(
        sets.select(col("doc_id").as("id_b"), col("hs").as("sb"), col("n").as("nb")),
        "id_b")
      .withColumn(
        "shared",
        graft.functions.SortedArrayIntersectCount
          .sortedIntersectCount(col("sa"), col("sb"))
          .cast("double"))
      .withColumn("jac", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** d17 — sorted-neighborhood near-dup blocking: record linkage's
    * classic alternative to LSH banding (Hernández–Stolfo). Docs sort
    * by a canonical key (whitespace-normalized lowercased text) and
    * only WINDOW-ADJACENT docs (here w=3) become candidates — near-dup
    * text sorts together, so the candidate budget is a FIXED n·w rows
    * at any corpus size, vs LSH's data-dependent bucket co-occupancy.
    * The price is recall through the sort lens only (a doc pair
    * differing in its first words sorts apart — [[d19SortedNeighborhoodMultipass]]
    * is the multi-pass remedy; d2's banding is this engine's
    * high-recall path, d17 the bounded-budget one, and the spec pins
    * d17 ⊆ d2 at the shared threshold). Implementation is ONE window:
    * candidates come from w `lead` columns (no rank self-join),
    * blocked by a 2-char key prefix so the sort window partitions
    * instead of collapsing to a single task. Candidates exact-verify
    * on the shared hashed-shingle sets (the d2 machinery), so output
    * is true Jaccard ≥ 0.5 pairs.
    */
  def d17SortedNeighborhood(s: SparkSession, dir: String): DataFrame =
    snVerify(s, dir, snCandidates(snForwardKey(s, dir), 3))

  /** The forward canonical key both d17 and d19's pass 1 sort by:
    * whitespace-normalized lowercased text.
    */
  private def snForwardKey(s: SparkSession, dir: String): DataFrame =
    Tables
      .spread(Tables.documents(s, dir))
      .select(
        col("doc_id"),
        lower(regexp_replace(col("text"), "\\s+", " ")).as("sk"))

  /** d19 — MULTI-PASS sorted neighborhood (Hernández–Stolfo's actual
    * prescription; d17 is the single-pass building block whose scaladoc
    * documents the blind spot this closes): a near-dup pair whose texts
    * differ in their FIRST words sorts apart under the forward key —
    * different 2-char block, different neighborhood — and no window
    * width fixes that. Pass 2 re-runs the SAME operator under the
    * REVERSED key, so a shared suffix becomes a shared prefix: the
    * differ-at-the-front pair class sorts adjacent there. Candidates
    * union (each pass keeps its fixed n·w budget, so the total stays
    * 2·n·w at any corpus size — still sort-lens bounded, never
    * data-dependent like LSH bucket co-occupancy), then one shared
    * exact-verify emits true Jaccard ≥ 0.5 pairs. `reverse` is
    * codepoint-wise in Spark and grapheme-wise in DuckDB — identical
    * on this fixture's ASCII text (checked), which the oracle's parity
    * relies on; a production corpus would reverse a transliterated
    * key. At 100 TB both passes are window-over-blocked-sort shapes:
    * no shuffle beyond the two sorts, candidates linear in n.
    */
  def d19SortedNeighborhoodMultipass(s: SparkSession, dir: String): DataFrame = {
    val w = 3
    val base = snForwardKey(s, dir)
    val p1 = snCandidates(base, w)
    val p2 = snCandidates(base.select(col("doc_id"), reverse(col("sk")).as("sk")), w)
    snVerify(s, dir, p1.unionAll(p2).distinct())
  }

  /** d20 — survivorship policy over the dup clusters: dedup's LAST
    * step, the one that actually writes the cleaned corpus — per d6
    * cluster, keep exactly one canonical document (longest text wins,
    * lowest id breaks ties: prefer the most complete copy,
    * deterministically) and account for what the policy removed. The
    * per-cluster argmax is a combine-enabled `max_by` on a lexical
    * (n_chars, −doc_id) struct — one row per cluster crosses the
    * exchange, NO per-cluster sort (the q39 argument applied to
    * survivorship), and the removed-rows/removed-bytes accounting
    * rides the same aggregate. Cluster discovery is d6's machinery
    * (banded candidates → exact verify → Hash-Min CC), so this prices
    * at pair-graph size; the metadata join moves (id, chars, source)
    * triples, never text.
    */
  def d20CanonicalSurvivor(s: SparkSession, dir: String): DataFrame = {
    val clusters = d6DupClusters(s, dir).select(col("doc_id"), col("cluster_rep"))
    val meta = Tables
      .documents(s, dir)
      .select(col("doc_id"), col("n_chars"), col("source"))
    clusters
      .join(meta, "doc_id")
      .groupBy(col("cluster_rep"))
      .agg(
        max_by(
          struct(col("doc_id"), col("source"), col("n_chars")),
          struct(col("n_chars"), (-col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_total"))
      .select(
        col("cluster_rep"),
        col("best.doc_id").as("survivor_id"),
        col("best.source").as("survivor_source"),
        col("best.n_chars").as("survivor_chars"),
        col("n_docs"),
        (col("n_docs") - 1L).as("n_removed"),
        (col("chars_total") - col("best.n_chars")).as("chars_removed"))
      .orderBy("cluster_rep")
  }

  /** d18 — cross-source duplication matrix: WHICH sources re-serve
    * WHOSE content — the corpus-diagnostic rollup of d2's verified
    * pair list (a feed pair with a fat cell is a syndication/mirror
    * relationship; the diagonal is within-source duplication). One
    * extra join per pair side against the (doc_id, source) projection
    * and a source-pair aggregate; the heavy lifting is d2's banded
    * candidate generation, so the matrix costs pair-graph size, not
    * corpus². The per-cell max is an order statistic (deterministic
    * cross-engine where an avg of floats would be summation-ordered).
    */
  def d18CrossSourceDup(s: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairs(docsWithShingles(s, dir, 3), 0.5)
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("source_a")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("source_b")), "id_b")
      .select(
        least(col("source_a"), col("source_b")).as("src_x"),
        greatest(col("source_a"), col("source_b")).as("src_y"),
        col("jac"))
      .groupBy(col("src_x"), col("src_y"))
      .agg(
        count(lit(1)).as("n_pairs"),
        max(round(col("jac"), 4)).as("max_jaccard"))
      .orderBy("src_x", "src_y")
  }

  /** d21 — threshold operating curve: how many near-dup pairs exist
    * at Jaccard ≥ 0.5, 0.6, …, 0.9 — the tuning report an engineer
    * reads BEFORE choosing the dedup threshold (each step of the
    * curve is removed volume; the elbow is the policy). ONE pair pass
    * serves every threshold: pairs bucket by floor(10·J) (identical
    * IEEE division + floor in both engines; J = 1 clamps into the
    * 0.9 bucket) and the ≥-threshold counts are a reverse running sum
    * over the ≤5-row bucket table — never five pair computations.
    *
    * Candidates come from the EXHAUSTIVE shared-shingle co-occurrence
    * join (d13's machinery, unblocked), not d2's LSH banding — the
    * round-9 advisor fix: 32-band minhash recall at the J=0.5
    * boundary is < 1, so an LSH-fed curve can desync from the
    * exhaustive oracle on an unlucky fixture even when the current
    * gate is green; a TUNING report must be exact or it tunes the
    * wrong threshold. Work is Σ df(shingle)² — the d4/d13 regime rule
    * applies: exact on sparse vocabularies; on a dense one at 100 TB,
    * run the sweep on d2's banded candidates instead and read it as a
    * LOWER envelope with d2's documented ~1e-5..1e-3 per-pair miss
    * probability (the probabilistic variant is one argument swap).
    */
  def d21ThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    val sh = docsWithShingles(s, dir, 3)
    val sizes = sh.select(col("doc_id"), size(col("hs")).as("n"))
    val postings = sh.select(col("doc_id"), explode(col("hs")).as("h"))
    val pairs = postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    val buckets = pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n", "na"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n", "nb"), "id_b")
      .withColumn(
        "jac",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= 0.5)
      .withColumn("bucket", least(floor(col("jac") * 10), lit(9L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    buckets
      .withColumn("n_at_or_above", sum(col("n_pairs")).over(w))
      .select(
        round(col("bucket") / 10.0, 1).as("threshold"),
        col("n_pairs"),
        col("n_at_or_above"))
      .orderBy("threshold")
  }

  /** d22 — duplicate-cluster size distribution: how many clusters of
    * each size exist, the copy mass they carry (size−1 removable
    * docs per cluster), and the share of the matched population — the
    * report that decides the dedup POLICY (a corpus of pairs needs a
    * different keep-rule than one with 100-copy template families;
    * d20 executes the policy, this sizes it). Rides d6's converged
    * labels; everything after is cluster-count-sized. All integer
    * counts — exact hash end to end.
    */
  def d22ClusterSizeDist(s: SparkSession, dir: String): DataFrame = {
    val sizes = d6DupClusters(s, dir)
      .select(col("cluster_rep"), col("cluster_size"))
      .distinct()
    val tot = sizes.agg(
      sum(col("cluster_size")).as("n_matched_docs"))
    sizes
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .crossJoin(broadcast(tot))
      .select(
        col("cluster_size"),
        col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("docs_in_size"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("removable_docs"),
        expr("(cluster_size * n_clusters * 10000) div n_matched_docs")
          .as("doc_share_bp"))
      .orderBy("cluster_size")
  }

  /** d23 — AllPairs prefix-filtered similarity join (Bayardo, Ma &
    * Srikant 2007): the THIRD candidate-generation regime, completing
    * the set d2 (LSH banding — probabilistic, any vocabulary), d13
    * (full postings — exact, sparse vocabularies), d23 (prefix
    * postings — exact, vocabularies with a usable rarity tail). Same
    * pair semantics as d2 (3-gram global Jaccard ≥ 0.5, exact verify)
    * — deliberately, so the exhaustive oracle gates all three
    * machineries against one ground truth.
    *
    * The filter: order the vocabulary once by ascending document
    * frequency (rarest first); each doc indexes only its
    * `n − ⌈θ·n⌉ + 1` RAREST shingles (its prefix). Two sets with
    * J ≥ θ must intersect within their prefixes under any SHARED
    * total order — so the candidate join runs over prefix postings
    * only, and Σ df² is paid only on the rare tail the ordering
    * steered the prefixes toward, not on stop-shingles (the same
    * skew d13 caps away, avoided here by construction). The
    * global df-rank window is VOCABULARY-sized (the t-family bound:
    * shingle types, not rows) and ⌈θ·n⌉ is exact integer
    * `(n + 1) div 2` at θ = 0.5. Verify is the shared sorted-merge
    * intersect on the full hash sets.
    */
  def d23AllPairsPrefix(s: SparkSession, dir: String): DataFrame = {
    val sh = docsWithShingles(s, dir, 3).localCheckpoint() // postings + both verify sides
    val postings = sh.select(col("doc_id"), explode(col("hs")).as("h"))
    val rank = postings
      .groupBy(col("h"))
      .agg(count(lit(1)).as("df"))
      .withColumn(
        "rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("df").asc, col("h").asc)))
      .select(col("h"), col("rk"))
    val prefix = postings
      .join(rank, "h")
      .withColumn(
        "pos",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id"))
            .orderBy(col("rk"))))
      .join(sh.select(col("doc_id"), size(col("hs")).as("n")), "doc_id")
      // prefix length n − ⌈θn⌉ + 1 with θ = 0.5: ⌈n/2⌉ = (n+1) div 2
      .filter(col("pos") <= col("n") - expr("(n + 1) div 2") + 1)
      .select(col("doc_id"), col("h"))
    val cands = prefix
      .as("a")
      .join(prefix.as("b"), col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val sets = sh.select(col("doc_id"), col("hs"), size(col("hs")).as("n"))
    cands
      .join(
        sets.select(col("doc_id").as("id_a"), col("hs").as("sa"), col("n").as("na")),
        "id_a")
      .join(
        sets.select(col("doc_id").as("id_b"), col("hs").as("sb"), col("n").as("nb")),
        "id_b")
      .withColumn(
        "shared",
        graft.functions.SortedArrayIntersectCount
          .sortedIntersectCount(col("sa"), col("sb"))
          .cast("double"))
      .withColumn("jac", col("shared") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** d24 — space-filling-curve (Morton/Z-order) blocking for
    * embedding near-dup: quantize two dimensions to 8 bits over the
    * data range, interleave their bits into a Z-curve key, SORT by
    * it, and compare only a ±2 sorted-neighborhood window — d17's
    * sorted-neighborhood method lifted to vector space, and the
    * THIRD candidate-generation regime next to hyperplane LSH
    * (d5/d10) and exact banding. REGIME RULE (the d4/d23
    * convention): SFC blocking is the cheap path for NEAR-IDENTICAL
    * vectors — re-encoded / requantized / re-ingested duplicates
    * whose per-dim deltas are far below the bin width (planted here
    * as ±2e-4 additive, cos ≥ 0.99999; measured recall 1.0 at both
    * fixture SFs) — because an SFC key is also a disk/cluster
    * LAYOUT key: at 100 TB vectors already live in Z-order (q108's
    * machinery). The sorted-neighborhood rank itself is DISTRIBUTED
    * (round 10): zkey is 16 bits, so a domain-bounded per-key
    * histogram + q70's two-phase offsets window gives exact global
    * ranks with the only unpartitioned window over ≤ 65 536 key
    * totals, and the ±2 window is an equi-join on rank (each row
    * probes rn+1/rn+2) — no global sort, no range join, no
    * single-task stage anywhere (sf0.1 warm: 1.07 → 1.81 s, the
    * distributed rank's fixed overhead at fixture size). The ±5%-perturbation regime stays with d10's LSH
    * (measured: raw-dim curves catch ≤ 33% there — recorded, the
    * honest boundary). Boundary crossings are covered by a SECOND
    * curve (dims 3–4, the standard multi-curve fix); survivors
    * verify at θ=0.9 exactly. The bit-interleave is the classic
    * spread-bits ladder in plain integer arithmetic — identical on
    * both engines.
    */
  def d24ZorderNeighbors(s: SparkSession, dir: String): DataFrame = {
    val theta = 0.9
    val orig = Tables
      .embeddings(s, dir)
      .select(
        col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    // the near-identical plant: additive alternating ±2e-4 (the
    // re-ingest regime), id offset 1e6 — d10's planting convention
    // with the delta this operator's regime is FOR
    val pert = orig.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("v"), (x, i) =>
        x + when(i % 2 === 0, lit(0.0002)).otherwise(lit(-0.0002))).as("v"))
    val e = orig
      .unionAll(pert)
      .withColumn(
        "norm",
        sqrt(graft.functions.VectorOps.dotProduct(col("v"), col("v"))))
    // 16-bit clamped quantization of dims d and d+1, then the
    // spread-bits ladder; returns the frame with a `zkey` column
    def withZkey(base: org.apache.spark.sql.DataFrame, dim0: Int): org.apache.spark.sql.DataFrame = {
      val masks = Seq(
        (8, 16711935L), // 0x00FF00FF
        (4, 252645135L), // 0x0F0F0F0F
        (2, 858993459L), // 0x33333333
        (1, 1431655765L)) // 0x55555555
      def q16(d: Int): String =
        s"least(greatest(CAST(floor((element_at(v, $d) + 0.5) * 256 + 0.5) AS BIGINT), 0L), 255L)"
      val spread = Seq(dim0, dim0 + 1).zipWithIndex.foldLeft(base) {
        case (df, (d, i)) =>
          val start = df.withColumn(s"s${i}_0", expr(q16(d)))
          masks.zipWithIndex.foldLeft(start) { case (df2, ((sh, m), step)) =>
            df2.withColumn(
              s"s${i}_${step + 1}",
              expr(s"(s${i}_$step | shiftleft(s${i}_$step, $sh)) & ${m}L"))
          }
      }
      spread
        .withColumn("zkey", expr("s0_4 | shiftleft(s1_4, 1)"))
        .select(col("vec_id"), col("zkey"))
    }
    // exact global rank in (zkey, vec_id) order WITHOUT an
    // unpartitioned window (round-10 fix of the round-9 demerit: the
    // previous global row_number single-task-sorted the whole
    // corpus): zkey is 16 bits, so the per-key count histogram is
    // domain-bounded (≤ 65 536 rows) and only IT crosses an
    // unpartitioned offsets window (q70's two-phase prefix sum);
    // the within-key rank is a window PARTITIONED by zkey, and the
    // ±2 neighborhood becomes an EQUI-join on rank — each row probes
    // rn+1 and rn+2 — instead of a nested-loop range join. Candidate
    // set is bit-identical to the sorted-neighborhood definition.
    def candidates(dim0: Int, pass: Int): org.apache.spark.sql.DataFrame = {
      val keyed = withZkey(e, dim0)
      val off = keyed
        .groupBy(col("zkey"))
        .agg(count(lit(1)).as("ktot"))
        .select(
          col("zkey"),
          (sum(col("ktot")).over(Window.orderBy(col("zkey"))) - col("ktot")).as("koff"))
      // materialized once: probes AND the join side both read it
      // (narrow id+rank rows — the q127/q160 localCheckpoint posture)
      val sorted = keyed
        .withColumn(
          "wrn",
          row_number().over(Window.partitionBy(col("zkey")).orderBy(col("vec_id"))))
        .join(broadcast(off), "zkey")
        .select(col("vec_id"), (col("koff") + col("wrn")).as("rn"))
        .localCheckpoint()
      val probes = sorted.select(
        col("vec_id").as("a_id"),
        explode(array(col("rn") + 1, col("rn") + 2)).as("rn"))
      probes
        .join(sorted, "rn")
        .select(
          least(col("a_id"), col("vec_id")).as("id_a"),
          greatest(col("a_id"), col("vec_id")).as("id_b"),
          lit(pass.toLong).as("pass"))
    }
    candidates(1, 1)
      .unionAll(candidates(3, 2))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("pass")).as("pass"))
      .join(e.select(col("vec_id").as("id_a"), col("v").as("va"), col("norm").as("na")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("norm").as("nb")), "id_b")
      .withColumn(
        "cos",
        graft.functions.VectorOps.dotProduct(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= theta)
      .select(col("id_a"), col("id_b"), col("pass"), round(col("cos"), 4).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** Affine-permutation multipliers/offsets for [[d25MinhashError]]'s
    * PORTABLE 16-hash MinHash family — literal primes shared verbatim
    * with the DuckDB oracle (the constants-as-literals rule).
    */
  private val D25As =
    Seq(7L, 13L, 31L, 37L, 61L, 89L, 127L, 181L, 211L, 251L, 313L, 383L, 433L, 499L, 571L, 641L)
  private val D25Bs =
    Seq(3L, 17L, 29L, 43L, 59L, 71L, 101L, 131L, 163L, 197L, 239L, 281L, 337L, 397L, 457L, 521L)
  private val D25P = 1000000007L

  /** d25 — MinHash estimator-error audit: for every TRUE near-dup pair
    * (exact shingle-Jaccard ≥ 0.5), how far is the 16-hash MinHash
    * ESTIMATE (matching signature coordinates / 16) from the exact
    * Jaccard — the calibration table that tells a dedup-threshold
    * owner how much signature width they are trading for error
    * (Broder 1997's E[matches/k] = J, Var = J(1−J)/k). s14/s15 do this
    * for ANN recall; this is the same audit for the MinHash side of
    * the house.
    *
    * d2's production signatures are xxhash64-based (fast, but not
    * reproducible in SQL), so the audit runs a PORTABLE MinHash:
    * shingle hash = d3's per-char polynomial fold mod 1e9+7, and
    * sig_j = min over shingles of (A_j·h + B_j) mod 1e9+7 with literal
    * prime constants — every coordinate an exact integer both engines
    * reproduce bit-for-bit, so matches, estimate, and |error| are all
    * hash-gated. Dedup of the shingle set happens ON THE HASHES in
    * both engines (a hash collision between distinct shingles must
    * collapse identically on both sides).
    *
    * Scale: the exhaustive pair side is the d4/d13 regime (Σ df² over
    * the shared-shingle postings — exact on sparse vocabularies; on a
    * dense corpus you'd bound it with d13's df cap); the signature side
    * is one scan (16 running minima per doc, k·|shingles| integer ops).
    * The audit output is one row per true pair — tiny by definition.
    * Measured on the fixture's 25+ planted pairs (all J ≈ 0.9–1.0):
    * mean |Ĵ−J| = 0.029 — right at Broder's sqrt(J(1−J)/16) ≈ 0.07
    * envelope, the number that justifies d2's 64-hash production width.
    */
  /** (doc_id, hs, n, sig): portable 3-gram shingle-hash sets plus the
    * 16-coordinate affine MinHash signature — the oracle-replicable
    * twin of [[docsWithShingles]] + [[graft.functions.MinHashFromHashes]],
    * shared by d25's estimator audit and d26's blocking audit.
    */
  private[graft] def portableShingleSets(s: SparkSession, dir: String): DataFrame = {
    val hashShingles =
      """array_distinct(transform(sequence(1, size(t) - 2), i ->
        |  aggregate(
        |    transform(split(concat_ws(' ', t[i-1], t[i], t[i+1]), ''),
        |              c -> CAST(ascii(c) AS BIGINT)),
        |    0L, (a, x) -> (a * 131 + x) % 1000000007)))""".stripMargin
    val sigExprs = D25As.zip(D25Bs).map { case (a, b) =>
      array_min(transform(col("hs"), h => (h * a + b) % D25P))
    }
    Tables
      .spread(Tables.documents(s, dir))
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), expr(hashShingles).as("hs"))
      .select(
        col("doc_id"),
        col("hs"),
        size(col("hs")).as("n"),
        array(sigExprs: _*).as("sig"))
  }

  def d25MinhashError(s: SparkSession, dir: String): DataFrame = {
    val sets = portableShingleSets(s, dir)
      .localCheckpoint() // consumed three times: postings + both pair sides
    val postings = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val pairs = postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(
        sets.select(col("doc_id").as("id_a"), col("n").as("na"), col("sig").as("siga")),
        "id_a")
      .join(
        sets.select(col("doc_id").as("id_b"), col("n").as("nb"), col("sig").as("sigb")),
        "id_b")
      .withColumn(
        "jac",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= 0.5)
      .withColumn(
        "matches",
        expr("aggregate(zip_with(siga, sigb, (x, y) -> IF(x = y, 1L, 0L)), 0L, (a, x) -> a + x)"))
      .select(
        col("id_a"),
        col("id_b"),
        round(col("jac"), 4).as("jaccard"),
        col("matches"),
        round(col("matches").cast("double") / 16, 4).as("estimate"),
        round(abs(col("jac") - col("matches").cast("double") / 16), 4).as("abs_err"))
      .orderBy("id_a", "id_b")
  }

  /** d26 — blocking-strategy efficiency audit: for the SAME ground
    * truth (exhaustive portable-shingle Jaccard ≥ 0.5 pairs), how many
    * candidate pairs does each blocking scheme generate and what
    * fraction of the truth does it catch — the recall/cost table that
    * decides WHICH dedup family to run at 100 TB before any of them
    * runs (the candidate count IS the scheme's cost model: every
    * candidate is one exact verify). Four schemes, one row each:
    *
    *  - `exact_key` — d1/d9's posture: candidates only where the
    *    whitespace-normalized text is identical. Near-zero cost,
    *    near-zero near-dup recall; the floor.
    *  - `sorted_neighborhood` — d17's forward key, window 3: cost
    *    bounded at n·w by construction (never data-dependent), recall
    *    limited by the sort lens.
    *  - `minhash_lsh` — the portable 16-hash signature banded 8×2
    *    (d2's banding shape on d25's oracle-replicable family):
    *    cost follows bucket co-occupancy, recall 1−(1−J²)⁸ in
    *    expectation.
    *  - `inverted_capped` — d13's df-capped postings join (cap 64):
    *    recall 1.0 on this vocabulary by construction (it IS the
    *    truth join, capped), cost Σ df² — the expensive-but-exact
    *    corner.
    *
    * Everything is exact integers (pair counts, basis-point ratios via
    * nonneg `div`); the audit output is 4 rows. Scale: each scheme's
    * candidate generation is its production shape (hash-agg, sorted
    * window, band equi-join, capped postings join) — the audit costs
    * what running all four schemes costs, which is exactly what a
    * pipeline owner pays to measure before committing the full corpus.
    *
    * Measured at sf0.01: truth = 25 pairs; exact_key 0 candidates /
    * recall 0; sorted_neighborhood 1320 / recall 100% / precision
    * 189 bp; minhash_lsh 37 / 100% / 6756 bp; inverted_capped 11533 /
    * 100% / 21 bp — the table that says "band it" in one read.
    */
  def d26BlockingEfficiency(s: SparkSession, dir: String): DataFrame = {
    val sets = portableShingleSets(s, dir).localCheckpoint()
    val postings = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = sets.select(col("doc_id"), col("n"))
    val truth = postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .filter(
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")) >= 0.5)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint() // intersected with all four candidate sets
    val keyed = snForwardKey(s, dir)
    val candExact = keyed
      .as("a")
      .join(
        keyed.as("b"),
        col("a.sk") === col("b.sk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val candSnm = snCandidates(keyed, 3)
    val banded = sets.select(
      col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(
          lit(b).as("band"),
          element_at(col("sig"), 2 * b + 1).as("h1"),
          element_at(col("sig"), 2 * b + 2).as("h2"))
      }: _*)).as("bk"))
    val candLsh = banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val capped = postings.join(
      postings.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= 64).select(col("h")),
      "h")
    val candInv = capped
      .as("a")
      .join(
        capped.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // ONE pass per scheme: candidate count and caught count come from
    // the same left join against the (unique-pair, checkpointed) truth
    // table — the previous count + left_semi/count pair referenced
    // `cand` from two subtrees of one plan, so every scheme's whole
    // candidate-generation join pipeline executed TWICE (round-13
    // measure: 4.9 s → 3.7 s solo at sf0.1 from this alone).
    def audit(name: String, cand: DataFrame): DataFrame =
      cand
        .join(truth.withColumn("__t", lit(1L)), Seq("id_a", "id_b"), "left")
        .agg(
          count(lit(1)).as("n_candidates"),
          // coalesce OUTSIDE the sum too: an EMPTY candidate set (the
          // exact_key scheme finds none on this fixture) sums to NULL
          // where the old left_semi count said 0
          coalesce(sum(coalesce(col("__t"), lit(0L))), lit(0L)).as("n_caught"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .select(
          lit(name).as("strategy"),
          col("n_candidates"),
          col("n_truth"),
          col("n_caught"),
          expr("CASE WHEN n_truth = 0 THEN NULL ELSE n_caught * 10000L div n_truth END")
            .as("recall_bp"),
          expr("CASE WHEN n_candidates = 0 THEN NULL ELSE n_caught * 10000L div n_candidates END")
            .as("precision_bp"))
    Seq(
      audit("exact_key", candExact),
      audit("sorted_neighborhood", candSnm),
      audit("minhash_lsh", candLsh),
      audit("inverted_capped", candInv))
      .reduce(_ unionAll _)
      .orderBy("strategy")
  }

  /** d27 — LSH band-count operating curve: recall and candidate cost
    * of r=2 MinHash banding as the band count sweeps 1..8 — d21 tunes
    * the THRESHOLD, d26 compares STRATEGIES, this tunes the one knob
    * inside the winning strategy (more bands = more recall = more
    * candidates; theory says P(caught) = 1−(1−J²)^b). ONE band join
    * serves the whole sweep: each candidate pair records the SMALLEST
    * band index where its signatures collide, the histogram of those
    * minima forward-cumulates into per-b candidate counts (s24's
    * cell-rank trick pointed at banding), and truth pairs join once.
    * Exact integers; portable signatures (d25's family) so the oracle
    * replays every collision. Measured at sf0.01: band 0 alone
    * catches 24/25 truth pairs (J ≈ 0.9 ⇒ per-band hit rate J² ≈
    * 0.8), two bands reach full recall with 28 candidates, and bands
    * 7–8 add 9 more candidates for zero recall — exactly the "stop
    * adding bands" elbow the curve exists to show.
    */
  def d27BandSweep(s: SparkSession, dir: String): DataFrame = {
    val sets = portableShingleSets(s, dir).localCheckpoint()
    val postings = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = sets.select(col("doc_id"), col("n"))
    val truth = postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .filter(
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")) >= 0.5)
      .select(col("id_a"), col("id_b"))
    val banded = sets.select(
      col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(
          lit(b.toLong).as("band"),
          element_at(col("sig"), 2 * b + 1).as("h1"),
          element_at(col("sig"), 2 * b + 2).as("h2"))
      }: _*)).as("bk"))
    val minBand = banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(min(col("a.bk.band")).as("mj"))
    val hist = minBand
      .join(truth, Seq("id_a", "id_b"), "left_semi")
      .groupBy(col("mj"))
      .agg(count(lit(1)).as("n_caught_at"))
      .join(
        minBand.groupBy(col("mj")).agg(count(lit(1)).as("n_cand_at")),
        Seq("mj"),
        "right")
      .na.fill(0L, Seq("n_caught_at"))
    val tot = truth.agg(count(lit(1)).as("n_truth"))
    s.range(1, 9)
      .select(col("id").as("n_bands"))
      .join(hist, col("mj") < col("n_bands"), "left")
      .groupBy(col("n_bands"))
      .agg(
        coalesce(sum(col("n_cand_at")), lit(0L)).as("n_candidates"),
        coalesce(sum(col("n_caught_at")), lit(0L)).as("n_caught"))
      .crossJoin(broadcast(tot))
      .select(
        col("n_bands"),
        col("n_candidates"),
        col("n_caught"),
        col("n_truth"),
        expr("CASE WHEN n_truth = 0 THEN NULL ELSE n_caught * 10000L div n_truth END")
          .as("recall_bp"))
      .orderBy("n_bands")
  }

  /** d28 — method-agreement audit: do two INDEPENDENT near-dup
    * detectors flag the same pairs — exhaustive shingle-Jaccard ≥ 0.5
    * (d25/d26's truth arm) vs SimHash Hamming ≤ 3 (d3's arm, a
    * completely different signal: bitwise token-profile proximity vs
    * set overlap)? This is the confidence report a dedup owner reads
    * before TRUSTING either family alone: high pair-set agreement
    * means the near-dup population is robust to detector choice; the
    * disagreement counts say which detector is the outlier and in
    * which direction. Set algebra on exact pair sets (|A|, |B|, |A∩B|,
    * each side's exclusive count, pair-set Jaccard in basis points) —
    * one row. Both arms run their production candidate shapes; the
    * intersection is a pair-key join. Measured at sf0.01: 25 Jaccard
    * pairs, 30 SimHash pairs, 21 agreed (6176 bp) — neither family
    * subsumes the other, the one-row argument for running BOTH before
    * a destructive dedup.
    */
  def d28MethodAgreement(s: SparkSession, dir: String): DataFrame = {
    val sets = portableShingleSets(s, dir).localCheckpoint()
    val postings = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = sets.select(col("doc_id"), col("n"))
    val jacc = postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .filter(
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")) >= 0.5)
      .select(col("id_a"), col("id_b"))
    val sim = d3SimHash(s, dir).select(col("id_a"), col("id_b"))
    val nJ = jacc.agg(count(lit(1)).as("n_jaccard"))
    val nS = sim.agg(count(lit(1)).as("n_simhash"))
    val nB = jacc
      .join(sim, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_both"))
    nJ.crossJoin(nS)
      .crossJoin(nB)
      .select(
        col("n_jaccard"),
        col("n_simhash"),
        col("n_both"),
        (col("n_jaccard") - col("n_both")).as("only_jaccard"),
        (col("n_simhash") - col("n_both")).as("only_simhash"),
        expr("CASE WHEN n_jaccard + n_simhash - n_both = 0 THEN NULL " +
          "ELSE n_both * 10000L div (n_jaccard + n_simhash - n_both) END")
          .as("agreement_bp"))
  }

  /** d29 — Fellegi–Sunter probabilistic record linkage (the 1969
    * model behind every serious entity-resolution system): score
    * blocked candidate pairs by the LOG-LIKELIHOOD RATIO of their
    * field-agreement pattern γ — Σ_f γ_f·ln(m_f/u_f) +
    * (1−γ_f)·ln((1−m_f)/(1−u_f)) — and link pairs with positive
    * total evidence. d8's edit-distance canonicalizer answers "which
    * strings are close"; this answers "how much EVIDENCE is that,
    * given how often random pairs agree by chance". The m
    * probabilities (P(agree | true match)) are fixed model constants;
    * the u probabilities (P(agree | non-match)) are ESTIMATED FROM
    * THE BLOCKED PAIR POPULATION itself with add-one smoothing —
    * matches are rare, so the population agreement rate is the
    * standard u estimate. The fixture has no natural duplicate
    * customers (names are unique by construction), so a resubmitted
    * batch is planted in-query — every 20th customer re-entered with
    * a typo'd name tail and a 50-cent balance drift (q179/d10's
    * convention).
    *
    * Comparison vector: γ1 name edit-distance ≤ 2 (threshold
    * levenshtein — banded DP, same as d8), γ2 balance within 100
    * cents (exact integer cents), γ3 mid-digit name block equal.
    * Determinism: u_f are exact integer ratios; each of the 6
    * log-weights is ONE ln() quantized to integer micro-nats (t33's
    * posture), so every pair score is an exact integer sum and the
    * match decision (score > 0) is exact.
    *
    * Scale posture: candidate pairs come only from the
    * (nation, segment) equi-join blocks — never all-pairs; the u
    * estimate is one 1-row aggregate over the pair table, broadcast
    * back; one comparison pass, no per-row UDFs (levenshtein and the
    * case arms are codegen'd builtins).
    */
  def d29FellegiSunter(s: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .customer(s, dir)
      .select(
        col("c_custkey").cast("long").as("id"),
        col("c_name").as("name"),
        col("c_nationkey").cast("int").as("nat"),
        col("c_mktsegment").as("seg"),
        expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").as("cents"))
    val dup = base
      .filter(col("id") % 20 === 0)
      .select(
        (col("id") + 10000000L).as("id"),
        concat(substring(col("name"), 1, 17), lit("x")).as("name"),
        col("nat"),
        col("seg"),
        (col("cents") + 50L).as("cents"))
    val rec = Tables.spread(base.unionAll(dup)).localCheckpoint()
    val pr = rec
      .as("a")
      .join(
        rec.as("b"),
        col("a.nat") === col("b.nat") && col("a.seg") === col("b.seg") &&
          col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"),
        col("b.id").as("id_b"),
        when(levenshtein(col("a.name"), col("b.name"), 2) >= 0, lit(1L))
          .otherwise(lit(0L)).as("g1"),
        when(abs(col("a.cents") - col("b.cents")) <= 100, lit(1L))
          .otherwise(lit(0L)).as("g2"),
        when(substring(col("a.name"), 15, 3) === substring(col("b.name"), 15, 3), lit(1L))
          .otherwise(lit(0L)).as("g3"))
      .localCheckpoint() // read twice: the u-estimate and the scoring pass
    val u = pr.agg(
      count(lit(1)).as("n"),
      sum(col("g1")).as("a1"),
      sum(col("g2")).as("a2"),
      sum(col("g3")).as("a3"))
    // one ln per (field, arm), quantized once — identical formula
    // text on both engines; m-probabilities are model literals
    val w = u.select(
      expr("""CAST(round(ln(CAST(0.95 AS DOUBLE)
             |  / (CAST(a1 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT)"""
        .stripMargin).as("w1y"),
      expr("""CAST(round(ln(CAST(0.05 AS DOUBLE)
             |  / (1.0e0 - CAST(a1 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT)"""
        .stripMargin).as("w1n"),
      expr("""CAST(round(ln(CAST(0.9 AS DOUBLE)
             |  / (CAST(a2 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT)"""
        .stripMargin).as("w2y"),
      expr("""CAST(round(ln(CAST(0.1 AS DOUBLE)
             |  / (1.0e0 - CAST(a2 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT)"""
        .stripMargin).as("w2n"),
      expr("""CAST(round(ln(CAST(0.97 AS DOUBLE)
             |  / (CAST(a3 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT)"""
        .stripMargin).as("w3y"),
      expr("""CAST(round(ln(CAST(0.03 AS DOUBLE)
             |  / (1.0e0 - CAST(a3 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT)"""
        .stripMargin).as("w3n"))
    pr.crossJoin(broadcast(w))
      .select(
        col("id_a"),
        col("id_b"),
        col("g1"),
        col("g2"),
        col("g3"),
        (when(col("g1") === 1, col("w1y")).otherwise(col("w1n")) +
          when(col("g2") === 1, col("w2y")).otherwise(col("w2n")) +
          when(col("g3") === 1, col("w3y")).otherwise(col("w3n"))).as("score_micro"),
        col("w1y"),
        col("w2y"),
        col("w3y"))
      .filter(col("score_micro") > 0)
      // the classic FS trichotomy: evidence at the upper threshold
      // auto-links; positive-but-weaker evidence goes to clerical
      // review (here: adjacent-id name neighbors that happen to share
      // a balance-or-digit field — real pipelines route these to a
      // human or a stronger second-pass comparator). The upper
      // threshold is MODEL-DERIVED (the all-fields-agree score), not
      // a constant — u-estimates shift with corpus size, so any fixed
      // cutoff would be scale-dependent.
      .withColumn(
        "decision",
        when(col("score_micro") >= col("w1y") + col("w2y") + col("w3y"), lit("link"))
          .otherwise(lit("review")))
      .select("id_a", "id_b", "g1", "g2", "g3", "score_micro", "decision")
      .orderBy("id_a", "id_b")
  }

  /** Alternating large-star/small-star rounds over a canonical
    * (hi, lo) edge set until fixpoint; returns (id → component-min
    * label, rounds taken). Exposed for the planted-path spec, which
    * pins the diameter-INDEPENDENCE this buys over Hash-Min.
    */
  private[graft] def twoStarLabels(pairs: DataFrame): (DataFrame, Int) = {
    // large-star: every neighbor BIGGER than the center re-links to
    // the min of the closed neighborhood. Each original edge appears
    // exactly once in the group of its smaller endpoint, so the
    // output REPLACES the edge set. min-over-partition rides one
    // window exchange on the symmetrized pair graph.
    //
    // Round-13 A/B NOTE: rewriting both stars as map-side-combined
    // groupBy-min joined back (the q127 agg-beats-window doctrine) was
    // tried and REJECTED — measured SLOWER on every caller (d30 2.25
    // → 2.66 s, d31 3.17 → 4.18, d39 4.43 → 4.87, d40 6.20 → 7.16
    // solo at sf0.1): per round it swaps one window exchange for an
    // aggregate + an AQE-broadcast join, and across ~4–6 rounds × 2
    // stars the extra per-round stages/jobs dominate on a pair graph
    // this size. The q127 result doesn't transfer because LPA's
    // window carried an ORDER-BY argmax (sort-heavy); this window is
    // an unordered running min.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e
        .select(col("hi").as("u"), col("lo").as("v"))
        .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
      val w = Window.partitionBy(col("u"))
      sym
        .withColumn("m", least(min(col("v")).over(w), col("u")))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
    }
    // small-star: group the hi→lo edges by their LARGER endpoint;
    // the center and every small neighbor re-link to the group min.
    def smallStar(e: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("hi"))
      val m = e.withColumn("m", min(col("lo")).over(w))
      m.select(col("lo").as("hi"), col("m").as("lo"))
        .unionAll(m.select(col("hi"), col("m").as("lo")))
        .filter(col("hi") =!= col("lo"))
        .distinct()
    }
    var edges = pairs
      .select(
        greatest(col("id_a"), col("id_b")).cast("long").as("hi"),
        least(col("id_a"), col("id_b")).cast("long").as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()
    // every node of the original graph, BEFORE rounds collapse
    // component minima out of the hi side
    val nodes = edges
      .select(col("hi").as("id"))
      .union(edges.select(col("lo").as("id")))
      .distinct()
      .localCheckpoint()
    var rounds = 0
    var changed = 1L
    var edgeCount = edges.count()
    while (changed > 0) {
      rounds += 1
      val next = smallStar(largeStar(edges)).localCheckpoint()
      // distinct sets: equal counts + no novel edges ⇒ identical.
      // Two bounded actions per round on the PAIR graph (the same
      // budget d6's moved-count spends), never on the corpus; the
      // previous round's count rides a driver var, not a re-count.
      val nc = next.count()
      changed =
        if (nc != edgeCount) 1L
        else next.join(edges, Seq("hi", "lo"), "left_anti").count()
      edges = next
      edgeCount = nc
    }
    val labels = nodes
      .join(edges.select(col("hi").as("id"), col("lo")), Seq("id"), "left")
      .groupBy(col("id"))
      .agg(coalesce(min(col("lo")), min(col("id"))).as("label"))
    (labels, rounds)
  }

  /** d30 — connected components via ALTERNATING LARGE-STAR/SMALL-STAR
    * (the two-phase algorithm of Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC 2014): the same dedup-cluster
    * output as d6, computed by an algorithm whose round count is
    * O(log n) in the component size instead of Hash-Min's O(diameter).
    * On near-dup cliques both converge in 2–3 rounds, but a 100 TB
    * pair graph is not all cliques — chain-shaped components (template
    * families, boilerplate drift, crawl mirrors of mirrors) give
    * Hash-Min one full shuffle round PER HOP, while star rounds halve
    * path lengths (OpsSpec pins a planted 33-node path: 32 Hash-Min
    * rounds collapse in ≤ 8 star rounds). This is the variant a
    * scheduled pipeline runs when component shape is unknown.
    *
    * Scale posture: every round is two window exchanges + a distinct
    * over the PAIR GRAPH only (θ-matched edges — orders of magnitude
    * smaller than the corpus), lineage truncated per round; the output
    * is pinned row-for-row ≡ d6 (same oracle SQL, same recursive-CTE
    * ground truth), so the two CC engines gate each other.
    */
  def d30CcTwoStar(s: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairs(docsWithShingles(s, dir, 3), 0.5)
      .select(col("id_a"), col("id_b"))
    val (labels, _) = twoStarLabels(pairs)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels
      .join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_rep"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** d31 — INCREMENTAL connected-components maintenance (CC IVM,
    * completing the engine's incremental-view family: q100 join IVM,
    * q101 aggregate IVM, q170 top-k IVM — now the graph one): when a
    * new batch of near-dup evidence arrives, do NOT re-run CC on the
    * whole pair graph — contract each delta edge to its endpoints'
    * EXISTING labels and run CC on the contracted label graph, which
    * is cluster-count-sized (here: the planted batch links the six
    * smallest cluster representatives pairwise, the delta a crawl
    * refresh typically produces). The final labeling is one broadcast
    * remap of the base labels through the contracted components — at
    * 100 TB the incremental pass touches delta + clusters, never the
    * corpus-sized pair graph. The contracted CC itself reuses d30's
    * two-star fixpoint, so both CC engines gate each other here too.
    * Incremental ≡ full-recompute is pinned in OpsSpec (the q64/q100
    * identity discipline), and the oracle recomputes the merged
    * closure from scratch.
    */
  def d31CcIncremental(s: SparkSession, dir: String): DataFrame = {
    val pairs = nearDupPairs(docsWithShingles(s, dir, 3), 0.5)
      .select(col("id_a"), col("id_b"))
    val (baseLabels, _) = twoStarLabels(pairs)
    val bl = baseLabels.localCheckpoint()
    // the delta batch: reps ranked by id, adjacent odd/even pairs —
    // the reps table is CLUSTER-count-sized, so the global rank
    // window is bounded by construction
    val reps = bl
      .select(col("label"))
      .distinct()
      .withColumn("rk", row_number().over(Window.orderBy(col("label"))))
      .filter(col("rk") <= 6)
    val delta = reps
      .filter(col("rk") % 2 === 1)
      .select(expr("(rk + 1) div 2").as("g"), col("label").as("id_a"))
      .join(
        reps.filter(col("rk") % 2 === 0).select(expr("rk div 2").as("g"), col("label").as("id_b")),
        "g")
      .select(col("id_a"), col("id_b"))
    // contract: CC over the label graph only (≤ 6 nodes here;
    // cluster-count-bounded in general)
    val (merged, _) = twoStarLabels(delta)
    val remapped = bl
      .join(
        broadcast(merged.toDF("label", "new_label")),
        Seq("label"),
        "left")
      .select(col("id"), coalesce(col("new_label"), col("label")).as("label"))
    val sizes = remapped.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    remapped
      .join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster_rep"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** d32 — analytic LSH parameter auto-tuner: the closed-form
    * companion to d27's MEASURED band curve. For every (bands b,
    * rows-per-band r) layout of a 64-hash MinHash signature
    * (b·r ≤ 64), the S-curve gives collision probability
    * 1 − (1 − J^r)^b; the tuner reports, per layout, the recall at
    * the duplicate threshold (J = 0.5, d2's operating point) and the
    * false-candidate rate at background similarity (J = 0.1, the
    * candidate-cost driver), then flags the chosen config: the
    * feasible layout (recall ≥ 0.95) with the LOWEST background
    * collision rate, ties to fewer hash evaluations then more bands.
    * This is how an engine picks b/r BEFORE touching data — d27 then
    * validates the choice empirically (the spec cross-pins d2's
    * shipped 32×2 layout as feasible here and its analytic recall
    * against d25's measured estimator error envelope).
    *
    * Determinism: the S-curve values quantize once to integer
    * micro-units (pow/ln-free form — exact repeated multiplication
    * is NOT used; both engines evaluate the same `power()` calls on
    * the same literals, then round), and the argmin runs on the
    * quantized integers with a total tie-break — no float
    * comparisons decide anything. The grid is 64·8 rows of pure
    * literals: zero data touched, the decision table a scheduler
    * materializes next to the corpus-derived reports.
    */
  def d32LshTuner(s: SparkSession, dir: String): DataFrame = {
    val grid = s
      .range(1, 65)
      .select(col("id").as("b"))
      .crossJoin(s.range(1, 9).select(col("id").as("r")))
      .filter(col("b") * col("r") <= 64)
    val scored = grid.select(
      col("b"),
      col("r"),
      (col("b") * col("r")).as("n_hashes"),
      expr("""CAST(round((1.0e0 - power(1.0e0 - power(CAST(0.5 AS DOUBLE),
             |  CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1e6) AS BIGINT)"""
        .stripMargin).as("recall_micro"),
      expr("""CAST(round((1.0e0 - power(1.0e0 - power(CAST(0.1 AS DOUBLE),
             |  CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1e6) AS BIGINT)"""
        .stripMargin).as("bg_collision_micro"))
    val w = Window.orderBy(
      col("feasible").desc,
      col("bg_collision_micro").asc,
      col("n_hashes").asc,
      col("b").desc)
    scored
      .withColumn("feasible", (col("recall_micro") >= 950000L).cast("long"))
      .withColumn("rk", row_number().over(w))
      .withColumn("chosen", (col("rk") === 1 && col("feasible") === 1L).cast("long"))
      .select(col("b"), col("r"), col("n_hashes"), col("recall_micro"),
        col("bg_collision_micro"), col("feasible"), col("chosen"))
      .orderBy("b", "r")
  }

  /** d33 — edit-distance fuzzy join (entity resolution's string
    * tier, completing the ladder: d1 exact fp → d2/d10 set/vector
    * similarity → d29 probabilistic field weights → THIS, raw
    * typo-level matching): part names match at levenshtein ≤ 2,
    * candidates from PassJoin-style SEGMENT pigeonhole blocking
    * (Li, Deng, Feng — PassJoin, VLDB 2011): each name splits into 3
    * contiguous thirds, and a pair within 2 SUBSTITUTIONS must agree
    * EXACTLY on ≥ 1 third (2 edits touch ≤ 2 segments) — so the
    * candidate step is an EQUI-join on (segment_idx, length,
    * segment), never an all-pairs distance matrix, and recall is 1.0
    * BY CONSTRUCTION for the substitution regime (equal-length
    * typos — the planted class); length-changing edits would need
    * PassJoin's shifted segments, the documented residual. The plant
    * (q179's resubmission convention): distinct names whose min-id
    * representative has `id % 17 = 5` re-enter with chars 3–4
    * replaced by 'zz' and id offset 10⁶ — exactly ≤ 2 substitutions,
    * so every planted pair MUST surface (OpsSpec pins it; the oracle
    * replays the same plant).
    *
    * The fuzzy tier operates on DISTINCT names (min-id
    * representative + multiplicity): exact-name duplication is d1's
    * job, and carrying it here makes identical-name clusters emit
    * C(k,2) candidate pairs — measured 42 s at sf0.1 before the
    * collapse (20k parts share a few thousand distinct names),
    * 0.73 s after (solo 2-pass warm); matched record-pair volume is recovered exactly as
    * Σ cnt_a·cnt_b. Scale: segments are scan-side; bucket occupancy
    * is bounded by (length, third) key cardinality over DISTINCT
    * names; `levenshtein` runs ONLY on candidates. Both engines
    * implement textbook Levenshtein — the verify is cross-engine
    * exact on ASCII names.
    */
  def d33FuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    // collapse to DISTINCT names first — exact-name duplication is
    // d1's job, and carrying it into the fuzzy tier makes identical-
    // name clusters contribute C(k,2) candidate pairs (measured
    // 42 s at sf0.1 before this collapse; 20k parts share a few
    // thousand distinct names). Each name rides its min-id
    // representative + multiplicity; matched record-pair volume is
    // recovered exactly as cnt_a·cnt_b.
    val base = Tables
      .part(s, dir)
      .select(col("p_partkey").cast("long").as("id"), col("p_name").as("name"))
      .groupBy(col("name"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("cnt"))
    val planted = base
      .filter(col("id") % 17 === 5)
      .select(
        concat(substring(col("name"), 1, 2), lit("zz"), expr("substring(name, 5)"))
          .as("name"),
        (col("id") + 1000000L).as("id"),
        lit(1L).as("cnt"))
    val all = base.unionAll(planted).localCheckpoint()
    val segs = all
      .withColumn("L", length(col("name")))
      .select(
        col("id"),
        col("name"),
        col("cnt"),
        col("L"),
        explode(expr(
          """array(
            |  named_struct('idx', 0, 'seg', substring(name, 1, L div 3)),
            |  named_struct('idx', 1, 'seg', substring(name, L div 3 + 1, L div 3)),
            |  named_struct('idx', 2, 'seg', substring(name, 2 * (L div 3) + 1)))"""
            .stripMargin)).as("sg"))
      .select(col("id"), col("name"), col("cnt"), col("L"),
        col("sg.idx").as("idx"), col("sg.seg").as("seg"))
    val cand = segs
      .as("a")
      .join(
        segs.as("b"),
        col("a.idx") === col("b.idx") && col("a.L") === col("b.L") &&
          col("a.seg") === col("b.seg") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("a.name").as("na"), col("a.cnt").as("ca"),
        col("b.id").as("id_b"), col("b.name").as("nb"), col("b.cnt").as("cb"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("na"), col("nb")).cast("long"))
      .filter(col("dist") >= 1L && col("dist") <= 2L)
      .groupBy(col("dist"))
      .agg(
        count(lit(1)).as("n_name_pairs"),
        sum(when((col("id_a") >= 1000000L) =!= (col("id_b") >= 1000000L), 1L)
          .otherwise(0L)).as("n_planted_pairs"),
        sum(col("ca") * col("cb")).as("n_record_pairs"),
        sum(col("id_a") + col("id_b")).as("id_sum"))
      .orderBy("dist")
  }

  /** d34 — MAXIMAL duplicated-SPAN extraction (the trimming half of
    * Lee et al. 2022 that d11 stops short of): d11 reports HOW MUCH
    * of a document is duplicated-window mass; a pipeline that TRIMS
    * instead of drops needs WHERE — contiguous token ranges it can
    * cut while keeping the rest. Every 8-token window carries its
    * START POSITION through d11's cross-doc duplicated-fingerprint
    * test (document frequency ≥ 2 over distinct docs — intra-doc
    * repetition stays t38's job), and per document the surviving
    * positions merge into maximal spans: window length is FIXED, so
    * span ends are monotone in starts and a start-gap > 8 is exactly
    * a break in coverage — the lag/flag/prefix-sum island idiom
    * (q56's), partitioned BY DOCUMENT (never global; a document's
    * own window positions are document-length-bounded, the same
    * bound any per-doc text op already carries). Output per affected
    * doc: span count, duplicated token mass, longest span and basis
    * points of the doc covered — `dup_bp = 10000` IS "this doc is a
    * verbatim composite; drop, don't trim".
    *
    * At 100 TB: positions ride the same map-side-combined
    * (fp, doc, pos) flow as d11 (text never crosses an exchange);
    * the duplicated-fp relation is duplicated-mass-sized and AQE
    * broadcasts it; island numbering shuffles once on doc_id.
    */
  def d34DupSpans(s: SparkSession, dir: String): DataFrame = {
    val w = 8
    val wins = Tables
      .spread(Tables.documents(s, dir))
      .filter(size(toks) >= w)
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        graft.functions.RollingFingerprints.rollingFingerprints(toks, w).as("wh"))
    val pos = wins.select(
      col("doc_id"),
      col("n_tokens"),
      posexplode(col("wh")))
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("pos") + 1).cast("long").as("p"),
        col("col").as("fp"))
    val dupFps = pos
      .select(col("fp"), col("doc_id"))
      .distinct()
      .groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select("fp")
    val ord = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val spans = pos
      .join(dupFps, "fp")
      .withColumn("prev", lag(col("p"), 1).over(ord))
      .withColumn(
        "brk",
        when(col("prev").isNull || col("p") - col("prev") > w, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(
        max(col("n_tokens")).as("n_tokens"),
        (max(col("p")) + (w - 1) - min(col("p")) + 1).as("span_len"))
    spans
      .groupBy(col("doc_id"))
      .agg(
        max(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_spans"),
        sum(col("span_len")).as("dup_tokens"),
        max(col("span_len")).as("longest_span"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_spans"),
        col("dup_tokens"),
        col("longest_span"),
        expr("dup_tokens * 10000 div n_tokens").as("dup_bp"))
      .orderBy("doc_id")
  }

  /** d35 — IDF-WEIGHTED shingle-cosine near-dup: d4's 3-shingle space
    * under TF-IDF weights — the production lexical near-dup scorer
    * when boilerplate shingles (headers, license blocks, navigation)
    * would otherwise dominate unweighted Jaccard. A shingle shared by
    * many documents carries weight tf·ln(1 + N/df) → ≈ 0, so two docs
    * agreeing only on furniture score near 0 while docs sharing RARE
    * content score high — the failure mode d4/d13 (set-semantics)
    * cannot express because they count every shared shingle equally.
    *
    * Determinism across engines: every ln() argument is one correctly-
    * rounded division of exact integer counts (the t19/t26 doctrine),
    * products/sums are IEEE doubles of those, and the cosine rounds at
    * 4 well away from the 0.6 threshold for this corpus's pair mass.
    *
    * Scale: the vector space is df-capped at 64 (d11's stop-shingle
    * doctrine — ultra-common shingles leave BOTH the numerator and the
    * norms, so the score stays an exact cosine in the pruned space);
    * pair generation is the inverted-posting self-join with work
    * Σ df² bounded by the cap (q199's measured envelope), df=1
    * postings never enter the join. Everything after the (a,b) rollup
    * is candidate-sized. At 100 TB: hash-partition postings by
    * shingle; no doc×doc surface anywhere.
    */
  def d35TfidfCosine(s: SparkSession, dir: String): DataFrame = {
    val theta = 0.6
    val dfCap = 64
    val toks = Tables
      .spread(Tables.documents(s, dir))
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val tf = toks
      .select(
        col("doc_id"),
        explode(expr(
          "transform(sequence(0, size(t) - 3), " +
            "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))")).as("sh"))
      .groupBy(col("doc_id"), col("sh"))
      .agg(count(lit(1)).as("c"))
    val dfr = tf
      .groupBy(col("sh"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
    val nDocs = toks.agg(count(lit(1)).as("n"))
    val weighted = tf
      .join(dfr, "sh")
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "w",
        col("c").cast("double") *
          log(lit(1.0) + col("n").cast("double") / col("df").cast("double")))
      .select(col("doc_id"), col("sh"), col("df"), col("w"))
      .localCheckpoint() // norms + both posting sides
    val norms = weighted
      .groupBy(col("doc_id"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val postings = weighted.filter(col("df") >= 2)
    postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("num"))
      .join(
        norms.select(col("doc_id").as("id_a"), col("nrm").as("na")), "id_a")
      .join(
        norms.select(col("doc_id").as("id_b"), col("nrm").as("nb")), "id_b")
      .withColumn("cos", col("num") / (col("na") * col("nb")))
      .filter(col("cos") >= theta)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
      .orderBy("id_a", "id_b")
  }

  /** d36 — b-bit MinHash estimator audit (Li & König 2010): keep only
    * the LOWEST BIT of each of d25's 16 portable minhash coordinates —
    * a 16× signature compression (16 bits vs 16 longs) — and price the
    * accuracy it costs against the full-width estimate on the same
    * true-pair set. For b = 1 a non-matching coordinate still matches
    * its bit with probability ~1/2, so the standard approximate
    * estimator is Ĵ₁ = max(2·ĉ − 1, 0) with ĉ the bit-match fraction —
    * the r₁ = r₂ → 0 limit of the paper's unbiased form (ĉ − C)/(1 − C)
    * (C depends on the set-size ratios; the clamp itself adds bias near
    * J = 0, so Ĵ₁ is unbiased only in that sparse limit); variance is
    * ~4× the full-width estimator's at high J (the paper's trade),
    * which is exactly what the audit shows next to d25's |Ĵ−J|.
    * Completes the compression column — s23 (PQ, recall 0.17), s26
    * (int8, 0.99), d36 (1-bit sketches) — with the same
    * accuracy-as-data doctrine (d25/s23): the table a 100 TB dedup
    * store reads before shrinking its signature index 16×.
    *
    * Exactness: coordinates are d25's oracle-replicable affine family;
    * bit extraction is `% 2` on nonneg ints; both estimators round(4)
    * doubles from small-integer ratios — both engines compute the
    * identical division. Scale: identical plan to d25 (the pair side
    * is the audit's subject; the signature side one scan).
    */
  def d36BbitMinhash(s: SparkSession, dir: String): DataFrame = {
    val sets = portableShingleSets(s, dir)
      .localCheckpoint() // postings + both pair sides
    val postings = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val pairs = postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(
        sets.select(col("doc_id").as("id_a"), col("n").as("na"), col("sig").as("siga")),
        "id_a")
      .join(
        sets.select(col("doc_id").as("id_b"), col("n").as("nb"), col("sig").as("sigb")),
        "id_b")
      .withColumn(
        "jac",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= 0.5)
      .withColumn(
        "m_full",
        expr("aggregate(zip_with(siga, sigb, (x, y) -> IF(x = y, 1L, 0L)), 0L, (a, x) -> a + x)"))
      .withColumn(
        "m_bit",
        expr("aggregate(zip_with(siga, sigb, (x, y) -> IF(x % 2 = y % 2, 1L, 0L)), 0L, (a, x) -> a + x)"))
      .select(
        col("id_a"),
        col("id_b"),
        round(col("jac"), 4).as("jaccard"),
        col("m_full"),
        col("m_bit"),
        round(col("m_full").cast("double") / 16, 4).as("est_full"),
        round(greatest(expr("CAST(2 * m_bit - 16 AS DOUBLE)"), lit(0.0)) / 16, 4)
          .as("est_bit"),
        round(abs(col("jac") - col("m_full").cast("double") / 16), 4)
          .as("err_full"),
        round(
          abs(col("jac") -
            greatest(expr("CAST(2 * m_bit - 16 AS DOUBLE)"), lit(0.0)) / 16),
          4).as("err_bit"))
      .orderBy("id_a", "id_b")
  }

  /** d37 — SimHash estimator calibration (Charikar 2002): for the same
    * true near-dup pair set d25/d36 audit, how well does the 60-bit
    * SimHash HAMMING DISTANCE recover the exact token-frequency
    * COSINE via the hyperplane identity P[bit agree] = 1 − θ/π, i.e.
    * ĉos = cos(π·hamming/60)? Closes the estimator-audit triptych —
    * d25 prices MinHash against Jaccard, d36 prices its 1-bit
    * compression, d37 prices SimHash against cosine — so the dedup
    * family's THREE signature types all carry measured error tables
    * (the d25/s23 accuracy-as-data doctrine), not just recall folklore.
    * The exact side is the tf-weighted cosine over per-doc token
    * counts (integer dot and squared norms; ONE double division +
    * sqrt at the end, expression tree mirrored token-for-token).
    *
    * Scale: the pair set is the audit's subject (tiny by definition);
    * signatures are one scan each; the exact-cosine join expands only
    * true pairs × their shared vocabulary. The fixture's near-dup
    * pairs sit at cosine ≈ 0.99 where the arccos derivative explodes
    * — hamming 0–3 of 60 — so the audit also SHOWS why banded
    * Hamming (d3's ≤ 3 cut) beats trying to estimate cosine values
    * at the top of the range: the measured |err| IS that resolution
    * floor.
    */
  def d37SimhashError(s: SparkSession, dir: String): DataFrame = {
    val sets = portableShingleSets(s, dir)
      .localCheckpoint() // postings + both pair sides
    val postings = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val truePairs = postings
      .as("a")
      .join(
        postings.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sets.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn(
        "jac",
        col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= 0.5)
      .select(col("id_a"), col("id_b"), col("jac"))
      .localCheckpoint() // simhash join + two token-count joins
    val sk = Tables
      .spread(Tables.documents(s, dir))
      .select(col("doc_id"), simhash60(split(col("text"), " ")).as("sh"))
    val pt = Tables
      .documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // both pair sides + norms
    val norms = pt
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("c")).as("n2"))
    val dots = truePairs
      .join(pt.select(col("doc_id").as("id_a"), col("w"), col("c").as("ca")), "id_a")
      .join(
        pt.select(col("doc_id").as("id_b"), col("w"), col("c").as("cb")),
        Seq("id_b", "w"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("ca") * col("cb")).as("dot"))
    truePairs
      .join(dots, Seq("id_a", "id_b"))
      .join(norms.select(col("doc_id").as("id_a"), col("n2").as("na2")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("n2").as("nb2")), "id_b")
      .join(sk.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(sk.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .withColumn(
        "cos_exact",
        expr("CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))"))
      .withColumn("cos_est", expr("cos(pi() * CAST(hamming AS DOUBLE) / 60)"))
      .select(
        col("id_a"),
        col("id_b"),
        round(col("jac"), 4).as("jaccard"),
        col("hamming"),
        round(col("cos_exact"), 4).as("cos_exact"),
        round(col("cos_est"), 4).as("cos_est"),
        round(abs(col("cos_exact") - col("cos_est")), 4).as("abs_err"))
      .orderBy("id_a", "id_b")
  }

  /** d38 — leave-one-band-out STABILITY audit: band the portable
    * 16-hash signature 8×2 (d2's shape on d25's oracle-replicable
    * family) and ask, for each band, how many candidate pairs are
    * UNIQUELY held by it — the jackknife that prices the band
    * count's safety margin. A pair held by one band is one hash
    * perturbation away from being lost; a candidate set where most
    * pairs are multiply-held survives re-hashing, sharding drift and
    * per-band corruption. Complements d26 (which scheme) and d27
    * (how many bands in EXPECTATION) with the realized per-band
    * redundancy census: uniquely-held share in bp per band, plus
    * each band's total match count — the table that says whether
    * dropping from 8 to 7 bands loses 2% or 40% of candidates.
    *
    * All integer: candidate pairs from 8 equi-joins on two-coordinate
    * band keys (one shuffle keyed by (band, k1, k2) — the d2
    * production shape), per-pair matching-band count by hash
    * aggregate, uniquely-held pairs attributed to their single band.
    * Scale: work ∝ band-bucket co-occupancy exactly like d2; the
    * census output is 8 rows.
    */
  def d38BandStability(s: SparkSession, dir: String): DataFrame = {
    val sets = portableShingleSets(s, dir)
    val banded = sets.select(
      col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(
          lit(b).as("band"),
          element_at(col("sig"), 2 * b + 1).as("k1"),
          element_at(col("sig"), 2 * b + 2).as("k2"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.k1"), col("bk.k2"))
    val bandPairs = banded
      .as("a")
      .join(
        banded.as("b"),
        col("a.band") === col("b.band") && col("a.k1") === col("b.k1") &&
          col("a.k2") === col("b.k2") && col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id_a"),
        col("b.doc_id").as("id_b"),
        col("a.band").as("band"))
      .distinct()
      .localCheckpoint() // per-band totals + uniqueness census
    val perPair = bandPairs
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_bands"), min(col("band")).as("only_band"))
    val full = perPair.agg(count(lit(1)).as("n_full"))
    val held = bandPairs.groupBy(col("band")).agg(count(lit(1)).as("n_matching"))
    val unique = perPair
      .filter(col("n_bands") === 1L)
      .groupBy(col("only_band").as("band"))
      .agg(count(lit(1)).as("n_unique"))
    s.range(0, 8)
      .select(col("id").cast("int").as("band"))
      .join(held, Seq("band"), "left")
      .join(unique, Seq("band"), "left")
      .crossJoin(broadcast(full))
      .select(
        col("band"),
        coalesce(col("n_matching"), lit(0L)).as("n_matching"),
        coalesce(col("n_unique"), lit(0L)).as("n_uniquely_held"),
        col("n_full"),
        expr("coalesce(n_unique, CAST(0 AS BIGINT)) * 10000 div greatest(n_full, CAST(1 AS BIGINT))")
          .as("churn_bp"))
      .orderBy("band")
  }

  /** d39 — threshold-stability curve of the near-dup CLUSTERING: the
    * connected-component census of the embedding cosine graph at
    * θ ∈ {0.30, 0.40, 0.50, 0.60} — edges, linked nodes, component
    * count, largest component, isolated vectors per cut. d27/d38
    * answer "how stable is the CANDIDATE set under band choice";
    * this answers the next question a dedup owner asks: how stable
    * are the CLUSTERS themselves under the similarity threshold —
    * a cliff between adjacent cuts (one giant component swallowing
    * the corpus) is the classic over-merge failure, visible here as
    * max_cluster jumping toward n_linked.
    *
    * One fixpoint for the whole sweep: every pair is computed ONCE
    * (exact doubles, the d5 regime — the embedding table is a
    * dimension; no broadcast hint, AQE picks the build side), frozen
    * to integer bp, then replicated to each θ it survives, and a
    * single Hash-Min label propagation runs over the COMPOSITE
    * (θ, node) graph — the d6 loop, 4 clusterings for one driver
    * loop's latency. Edges nest across θ so the replicated graph is
    * ≤ 4× the loosest cut. Oracle: the d6 transitive-closure
    * recursion keyed by (θ, node).
    *
    * The triangular pair stage is this sweep's CONTROL ARM (the
    * d4/d26/s30 doctrine: every exhaustive arm names its scale twin):
    * at 100 TB embeddings are corpus-sized, not a dimension, and the
    * sweep runs on [[d40BandedThresholdSweep]]'s hyperplane-banded
    * candidates instead — same θ replication, same two-star fixpoint
    * — with THIS query's census as the recall reference d40 measures
    * itself against.
    */
  def d39ThresholdStability(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .spread(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))
      .localCheckpoint() // both pair sides + the vec total replay this (d40's posture)
    val pairs = e
      .as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn(
        "cos",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
      .select(
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        expr("CAST(floor(cos * 10000 + 0.5) AS BIGINT)").as("cos_bp"))
      .filter(col("cos_bp") >= 3000L)
      .localCheckpoint() // the sweep, the census and every CC round reuse it
    val edgesT = pairs
      .select(
        col("id_a"),
        col("id_b"),
        col("cos_bp"),
        explode(expr(
          "array(CAST(3000 AS BIGINT), CAST(4000 AS BIGINT), CAST(5000 AS BIGINT), CAST(6000 AS BIGINT))"))
          .as("theta_bp"))
      .filter(col("cos_bp") >= col("theta_bp"))
      .select(col("theta_bp"), col("id_a"), col("id_b"))
    // ONE two-star fixpoint for all four cuts: (θ, vec_id) encodes
    // into a single long (θ·2⁴⁴ + id — ids share a θ prefix, so the
    // component min decodes back to the θ-local min id), turning the
    // composite graph into four disjoint subgraphs of one plain graph
    // that [[twoStarLabels]] collapses in O(log n) rounds — the
    // Hash-Min loop this replaced needed O(component diameter) rounds
    // and measured 14.6 s solo at sf0.1 against 2.6 s for the
    // two-star shape on a comparable graph (d30).
    val shift = CompositeShift // 2^44; checkedVecId enforces id < 2^44
    val (enc, _) = Dedup.twoStarLabels(
      edgesT.select(
        (col("theta_bp") * shift + checkedVecId(col("id_a"))).as("id_a"),
        (col("theta_bp") * shift + checkedVecId(col("id_b"))).as("id_b")))
    val labels = enc.select(
      expr(s"id div ${shift}L").as("theta_bp"),
      expr(s"label % ${shift}L").as("label"))

    val comp = labels
      .groupBy(col("theta_bp"), col("label"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("theta_bp"))
      .agg(
        count(lit(1)).as("n_components"),
        sum(col("sz")).as("n_linked"),
        max(col("sz")).as("max_cluster"))
    val ne = edgesT.groupBy(col("theta_bp")).agg(count(lit(1)).as("n_edges"))
    val tot = e.agg(count(lit(1)).as("n_vecs"))
    // anchor on the θ list itself: a cut with NO surviving edges must
    // still report a row (zero edges, everything isolated), not vanish
    // through an inner join
    tot
      .select(explode(expr(
        "array(CAST(3000 AS BIGINT), CAST(4000 AS BIGINT), CAST(5000 AS BIGINT), CAST(6000 AS BIGINT))"))
        .as("theta_bp"))
      .join(ne, Seq("theta_bp"), "left")
      .join(comp, Seq("theta_bp"), "left")
      .crossJoin(broadcast(tot))
      .select(
        col("theta_bp"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        coalesce(col("n_linked"), lit(0L)).as("n_linked"),
        coalesce(col("n_components"), lit(0L)).as("n_components"),
        coalesce(col("max_cluster"), lit(0L)).as("max_cluster"),
        (col("n_vecs") - coalesce(col("n_linked"), lit(0L))).as("n_isolated"))
      .orderBy("theta_bp")
  }

  /** d40's banded arm, end-to-end INDEPENDENT of the exact control arm
    * (round-12 verdict mandate #3): candidate pairs come from
    * hyperplane-LSH bucket co-occupancy (an equi-join on the
    * (table, bucket) key), and their cosines are computed by joining
    * the candidate ids back to the vector table — never by consulting
    * the O(n²) triangular join. The dot/norm/bp-freeze expression text
    * is identical to the exact arm's, so a pair surviving both paths
    * carries a bit-identical cos_bp and d40's output hash is unchanged
    * by this rewrite; what changed is that the sub-quadratic path now
    * runs (and scales) without the control arm existing at all. The
    * spec pins the plan shape: equi-joins only — no cartesian, no
    * nested-loop — anywhere in this arm.
    */
  private[graft] def d40BandedEdges(e: DataFrame): DataFrame = {
    val banded = e.select(
      col("vec_id"),
      explode(Similarity.tableBucketsFor(col("v"), Similarity.hyperplanes)).as("tb"))
    val cand = banded
      .as("a")
      .join(banded.as("b"), col("a.tb") === col("b.tb") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("id_a"), col("v").as("va"), col("norm").as("na")), Seq("id_a"))
      .join(e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("norm").as("nb")), Seq("id_b"))
      .withColumn("cos", Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select(
        col("id_a"),
        col("id_b"),
        expr("CAST(floor(cos * 10000 + 0.5) AS BIGINT)").as("cos_bp"))
      .filter(col("cos_bp") >= 3000L)
  }

  /** d40 — the BANDED scale arm of [[d39ThresholdStability]]'s
    * threshold sweep: the same θ ∈ {0.30, 0.40, 0.50, 0.60} cluster
    * census, but with candidate pairs from random-hyperplane LSH
    * (d10's generator on s2's 12-table × 4-plane deterministic LCG
    * set) instead of the exact triangular join — the shape that
    * survives a corpus-sized embedding table, where work is bucket
    * co-occupancy, never n². Both arms run side by side and the
    * output IS the price sheet: per θ, exact vs banded edge counts
    * with edge-recall in bp, and the downstream cluster census both
    * ways (components, linked nodes, largest cluster) — so the cut
    * a dedup owner reads off d39 comes annotated with exactly what
    * the sub-quadratic path would have told them instead. At these
    * mid-range thresholds hyperplane recall is genuinely partial
    * (p = 1 − θ_angle/π ≈ 0.6–0.7, p⁴ per table — the d10 honest
    * limit), which is the POINT: the recall column is the measured
    * cost of going banded, not folklore.
    *
    * Determinism makes the whole report oracle-checkable: fixed LCG
    * planes (literal-embedded in the SQL, the s2 discipline), exact
    * cosine frozen to bp, and ONE two-star fixpoint over the
    * composite (θ, arm, node)-encoded graph — 8 disjoint subgraphs,
    * one O(log n)-round job. Scale: the banded arm shuffles narrow
    * (vec_id, table, bucket) rows; the exact arm is the declared
    * fixture-scale control exactly as in d39.
    */
  def d40BandedThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    val e = Tables
      .spread(Tables.embeddings(s, dir))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))
      .localCheckpoint() // pair sides + banding reuse one materialization
    val pairs = e
      .as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn(
        "cos",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")))
      .select(
        col("a.vec_id").as("id_a"),
        col("b.vec_id").as("id_b"),
        expr("CAST(floor(cos * 10000 + 0.5) AS BIGINT)").as("cos_bp"))
      .filter(col("cos_bp") >= 3000L)
      .localCheckpoint() // exact arm: the censuses and CC rounds reuse it
    val bq = d40BandedEdges(e)
    val thetas =
      "array(CAST(3000 AS BIGINT), CAST(4000 AS BIGINT), CAST(5000 AS BIGINT), CAST(6000 AS BIGINT))"
    val et = pairs
      .select(lit(0L).as("arm"), col("id_a"), col("id_b"), col("cos_bp"))
      .unionAll(bq.select(lit(1L).as("arm"), col("id_a"), col("id_b"), col("cos_bp")))
      .select(
        col("arm"),
        col("id_a"),
        col("id_b"),
        col("cos_bp"),
        explode(expr(thetas)).as("theta_bp"))
      .filter(col("cos_bp") >= col("theta_bp"))
      .select(col("arm"), col("theta_bp"), col("id_a"), col("id_b"))
    // (θ, arm, vec_id) → one long: prefix θ·2 + arm, ids share a
    // prefix so the component min decodes to the subgraph-local min
    // (d39's encoding with one more bit).
    val shift = CompositeShift // 2^44; checkedVecId enforces id < 2^44
    val (enc, _) = Dedup.twoStarLabels(
      et.select(
        ((col("theta_bp") * 2L + col("arm")) * shift + checkedVecId(col("id_a"))).as("id_a"),
        ((col("theta_bp") * 2L + col("arm")) * shift + checkedVecId(col("id_b"))).as("id_b")))
    val census = enc
      .select(
        expr(s"(id div ${shift}L) div 2").as("theta_bp"),
        expr(s"(id div ${shift}L) % 2").as("arm"),
        expr(s"label % ${shift}L").as("label"))
      .groupBy(col("theta_bp"), col("arm"), col("label"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("theta_bp"), col("arm"))
      .agg(
        count(lit(1)).as("n_components"),
        sum(col("sz")).as("n_linked"),
        max(col("sz")).as("max_cluster"))
      .groupBy(col("theta_bp"))
      .agg(
        max(when(col("arm") === 0L, col("n_components"))).as("comp_e"),
        max(when(col("arm") === 1L, col("n_components"))).as("comp_b"),
        max(when(col("arm") === 0L, col("n_linked"))).as("link_e"),
        max(when(col("arm") === 1L, col("n_linked"))).as("link_b"),
        max(when(col("arm") === 0L, col("max_cluster"))).as("mc_e"),
        max(when(col("arm") === 1L, col("max_cluster"))).as("mc_b"))
    val ne = et
      .groupBy(col("theta_bp"))
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ne_e"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("ne_b"))
    // anchor on the θ list: a cut with no banded (or no) edges still
    // reports a row with zeros, not a vanished join
    val one = pairs.sparkSession.range(1).select(explode(expr(thetas)).as("theta_bp"))
    one
      .join(ne, Seq("theta_bp"), "left")
      .join(census, Seq("theta_bp"), "left")
      .select(
        col("theta_bp"),
        coalesce(col("ne_e"), lit(0L)).as("n_edges_exact"),
        coalesce(col("ne_b"), lit(0L)).as("n_edges_banded"),
        expr("coalesce(ne_b, CAST(0 AS BIGINT)) * 10000 div greatest(coalesce(ne_e, CAST(0 AS BIGINT)), CAST(1 AS BIGINT))")
          .as("edge_recall_bp"),
        coalesce(col("comp_e"), lit(0L)).as("n_components_exact"),
        coalesce(col("comp_b"), lit(0L)).as("n_components_banded"),
        coalesce(col("link_e"), lit(0L)).as("n_linked_exact"),
        coalesce(col("link_b"), lit(0L)).as("n_linked_banded"),
        coalesce(col("mc_e"), lit(0L)).as("max_cluster_exact"),
        coalesce(col("mc_b"), lit(0L)).as("max_cluster_banded"))
      .orderBy("theta_bp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d40_banded_threshold_sweep" -> d40BandedThresholdSweep,
    "d39_threshold_stability" -> d39ThresholdStability,
    "d38_band_stability" -> d38BandStability,
    "d37_simhash_error" -> d37SimhashError,
    "d36_bbit_minhash" -> d36BbitMinhash,
    "d35_tfidf_cosine" -> d35TfidfCosine,
    "d34_dup_spans" -> d34DupSpans,
    "d33_fuzzy_join" -> d33FuzzyJoin,
    "d32_lsh_tuner" -> d32LshTuner,
    "d31_cc_incremental" -> d31CcIncremental,
    "d29_fellegi_sunter" -> d29FellegiSunter,
    "d30_cc_twostar" -> d30CcTwoStar,
    "d28_method_agreement" -> d28MethodAgreement,
    "d27_band_sweep" -> d27BandSweep,
    "d26_blocking_efficiency" -> d26BlockingEfficiency,
    "d25_minhash_error" -> d25MinhashError,
    "d24_zorder_neighbors" -> d24ZorderNeighbors,
    "d23_allpairs_prefix" -> d23AllPairsPrefix,
    "d22_cluster_size_dist" -> d22ClusterSizeDist,
    "d21_threshold_sweep" -> d21ThresholdSweep,
    "d20_canonical_survivor" -> d20CanonicalSurvivor,
    "d19_sorted_neighborhood_multipass" -> d19SortedNeighborhoodMultipass,
    "d18_cross_source_dup" -> d18CrossSourceDup,
    "d17_sorted_neighborhood" -> d17SortedNeighborhood,
    "d16_density_clusters" -> d16DensityClusters,
    "d15_semantic_dedup_soft" -> d15SemanticDedupSoft,
    "d14_semantic_dedup" -> d14SemanticDedup,
    "d9_canonical_dedup" -> d9CanonicalDedup,
    "d11_passage_dedup" -> d11PassageDedup,
    "d8_fuzzy_match" -> d8FuzzyMatch,
    "d7_decontaminate" -> d7Decontaminate,
    "d1_dedup_exact" -> d1ExactDedup,
    "d2_dedup_minhash" -> d2MinHashLsh,
    "d3_dedup_simhash" -> d3SimHash,
    "d4_ngram_jaccard" -> d4NgramJaccard,
    "d13_inverted_jaccard" -> d13InvertedJaccard,
    "d12_containment" -> d12Containment,
    "d5_embed_neardup" -> d5EmbedNearDup,
    "d10_embed_neardup_lsh" -> d10EmbedNearDupLsh,
    "d6_dup_clusters" -> d6DupClusters
  )

  /** Shared ground-truth SQL for shingle-Jaccard near-dup pairs. */
  private def jaccardOracle(
      n: Int,
      langBlocked: Boolean,
      extraCols: String,
      dfCap: Option[Long] = None): String = {
    val parts = (0 until n).map(j => s"t[i + $j]").mkString(" || ' ' || ")
    val langJoin = if (langBlocked) " AND a.lang = b.lang" else ""
    val langSel = if (langBlocked) ", a.lang AS lang" else ""
    val langGrp = if (langBlocked) ", a.lang" else ""
    // with a df cap: drop over-frequent shingles from the index and
    // recount set sizes over the CAPPED vocabulary — the exact mirror
    // of cappedPostings on the Spark side
    val exDef = dfCap match {
      case Some(cap) =>
        s"""ex0 AS (SELECT doc_id, lang, unnest(shingles) AS s FROM sh),
           |keep AS (
           |  SELECT lang, s FROM ex0 GROUP BY 1, 2 HAVING count(*) <= $cap),
           |ex AS (SELECT ex0.* FROM ex0 JOIN keep USING (lang, s)),
           |sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1)"""
      case None =>
        """ex AS (SELECT doc_id, lang, unnest(shingles) AS s FROM sh),
          |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)"""
    }
    s"""WITH tok AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |sh AS (
       |  SELECT doc_id, lang,
       |    list_distinct([$parts FOR i IN range(1, len(t) - ${n - 2})]) AS shingles
       |  FROM tok WHERE len(t) >= $n),
       |${exDef.stripMargin},
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b$langSel, count(*) AS shared
       |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id$langJoin
       |  GROUP BY a.doc_id, b.doc_id$langGrp)
       |SELECT id_a, id_b$extraCols,
       |  round(shared::DOUBLE / (sa.n + sb.n - shared), 4) AS jaccard
       |FROM pairs JOIN sizes sa ON id_a = sa.doc_id
       |           JOIN sizes sb ON id_b = sb.doc_id
       |WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** d24's oracle: both Z-curves replayed with the same quantization,
    * spread-bits ladder, neighborhood join, and θ=0.9 verify.
    */
  /** d26's oracle: the same four candidate generators (normalized-key
    * equality, 2-char-block window-3 SNM, 8×2 banding over the portable
    * signatures, df≤64 capped postings) audited against the same
    * exhaustive truth with scalar-subquery counts.
    */
  private def d26OracleSql: String = {
    val sigList = D25As
      .zip(D25Bs)
      .map { case (a, b) => s"list_min([(h * $a + $b) % $D25P FOR h IN hs])" }
      .mkString(",\n|      ")
    val bandSelects = (0 until 8)
      .map(b =>
        s"SELECT doc_id, $b AS band, sig[${2 * b + 1}] AS h1, sig[${2 * b + 2}] AS h2 FROM sets")
      .mkString("\n|  UNION ALL ")
    def auditRow(name: String, cand: String): String =
      s"""SELECT '$name' AS strategy,
         |  (SELECT CAST(count(*) AS BIGINT) FROM $cand) AS n_candidates,
         |  (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         |  (SELECT CAST(count(*) AS BIGINT)
         |   FROM $cand c JOIN truth t
         |     ON c.id_a = t.id_a AND c.id_b = t.id_b) AS n_caught"""
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ss AS (
       |  SELECT doc_id,
       |    [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
       |     FOR i IN range(1, len(t) - 1)] AS sl
       |  FROM tok WHERE len(t) >= 3),
       |sh AS (
       |  SELECT doc_id, list_distinct([
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        [ord(c)::BIGINT FOR c IN string_split_regex(x, '')]),
       |      (a, h) -> (a * 131 + h) % 1000000007)
       |    FOR x IN sl]) AS hs FROM ss),
       |sets AS (
       |  SELECT doc_id, hs, len(hs) AS n,
       |    [$sigList] AS sig
       |  FROM sh),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM sets),
       |truth AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |    FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) p
       |  JOIN sets sa ON p.id_a = sa.doc_id
       |  JOIN sets sb ON p.id_b = sb.doc_id
       |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
       |keyed AS (
       |  SELECT doc_id,
       |    lower(regexp_replace(text, '\\s+', ' ', 'g')) AS sk
       |  FROM documents),
       |cand_exact AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM keyed a JOIN keyed b
       |    ON a.sk = b.sk AND a.doc_id < b.doc_id),
       |rk AS (
       |  SELECT doc_id, sk, substr(sk, 1, 2) AS blk,
       |    row_number() OVER (PARTITION BY substr(sk, 1, 2)
       |                       ORDER BY sk, doc_id) AS r
       |  FROM keyed),
       |cand_snm AS (
       |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
       |    greatest(a.doc_id, b.doc_id) AS id_b
       |  FROM rk a JOIN rk b
       |    ON a.blk = b.blk AND b.r > a.r AND b.r <= a.r + 3),
       |bnd AS (
       |  $bandSelects),
       |cand_lsh AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bnd a JOIN bnd b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
       |      AND a.doc_id < b.doc_id),
       |keep AS (SELECT h FROM ex GROUP BY 1 HAVING count(*) <= 64),
       |cex AS (SELECT ex.* FROM ex JOIN keep USING (h)),
       |cand_inv AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM cex a JOIN cex b ON a.h = b.h AND a.doc_id < b.doc_id),
       |rows0 AS (
       |  ${auditRow("exact_key", "cand_exact").stripMargin}
       |  UNION ALL
       |  ${auditRow("sorted_neighborhood", "cand_snm").stripMargin}
       |  UNION ALL
       |  ${auditRow("minhash_lsh", "cand_lsh").stripMargin}
       |  UNION ALL
       |  ${auditRow("inverted_capped", "cand_inv").stripMargin})
       |SELECT strategy, n_candidates, n_truth, n_caught,
       |  CASE WHEN n_truth = 0 THEN NULL
       |       ELSE n_caught * 10000 // n_truth END AS recall_bp,
       |  CASE WHEN n_candidates = 0 THEN NULL
       |       ELSE n_caught * 10000 // n_candidates END AS precision_bp
       |FROM rows0 ORDER BY strategy""".stripMargin
  }

  /** d3's oracle — standalone so d28's method-agreement audit can
    * embed the identical SimHash replay as one arm.
    */
  private def d3OracleSql: String =
    """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |th AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(0::BIGINT,
        |        [ord(c)::BIGINT FOR c IN string_split_regex(t, '')]),
        |      (a, x) -> (a * 131 + x) % 1000000007) AS h1,
        |    list_reduce(
        |      list_prepend(0::BIGINT,
        |        [ord(c)::BIGINT FOR c IN string_split_regex(t, '')]),
        |      (a, x) -> (a * 137 + x) % 998244353) AS h2
        |  FROM toks),
        |bits AS (
        |  SELECT doc_id, r.b,
        |    sum(CASE WHEN r.b < 30
        |             THEN CASE WHEN (h1 >> r.b) & 1 = 1 THEN 1 ELSE -1 END
        |             ELSE CASE WHEN (h2 >> (r.b - 30)) & 1 = 1 THEN 1 ELSE -1 END
        |        END) AS cnt
        |  FROM th, (SELECT unnest(range(60)) AS b) r
        |  GROUP BY 1, 2),
        |sk AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN cnt > 0
        |                  THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)
        |      AS BIGINT) AS sh
        |  FROM bits GROUP BY 1),
        |banded AS (
        |  SELECT doc_id, sh, r.band,
        |    (sh >> CAST(15 * r.band AS INT)) & 32767 AS bandbits
        |  FROM sk, (SELECT unnest(range(4)) AS band) r),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bandbits = b.bandbits
        |   AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming
        |FROM pairs WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin

  /** d28's oracle: the exhaustive-truth CTE intersected with d3's full
    * SimHash replay.
    */
  private def d28OracleSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ss AS (
       |  SELECT doc_id,
       |    [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
       |     FOR i IN range(1, len(t) - 1)] AS sl
       |  FROM tok WHERE len(t) >= 3),
       |sh AS (
       |  SELECT doc_id, list_distinct([
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        [ord(c)::BIGINT FOR c IN string_split_regex(x, '')]),
       |      (a, h) -> (a * 131 + h) % 1000000007)
       |    FOR x IN sl]) AS hs FROM ss),
       |sets AS (SELECT doc_id, hs, len(hs) AS n FROM sh),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM sets),
       |truth AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |    FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) p
       |  JOIN sets sa ON p.id_a = sa.doc_id
       |  JOIN sets sb ON p.id_b = sb.doc_id
       |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
       |sim AS (SELECT id_a, id_b FROM ($d3OracleSql)),
       |nj AS (SELECT CAST(count(*) AS BIGINT) AS n_jaccard FROM truth),
       |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_simhash FROM sim),
       |nb AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_both
       |  FROM truth JOIN sim USING (id_a, id_b))
       |SELECT n_jaccard, n_simhash, n_both,
       |  n_jaccard - n_both AS only_jaccard,
       |  n_simhash - n_both AS only_simhash,
       |  CASE WHEN n_jaccard + n_simhash - n_both = 0 THEN NULL
       |       ELSE CAST(n_both * 10000 //
       |         (n_jaccard + n_simhash - n_both) AS BIGINT)
       |  END AS agreement_bp
       |FROM nj CROSS JOIN ns CROSS JOIN nb""".stripMargin

  /** d27's oracle: the same min-collision-band histogram, forward-
    * cumulated over band counts.
    */
  private def d27OracleSql: String = {
    val sigList = D25As
      .zip(D25Bs)
      .map { case (a, b) => s"list_min([(h * $a + $b) % $D25P FOR h IN hs])" }
      .mkString(",\n|      ")
    val bandSelects = (0 until 8)
      .map(b =>
        s"SELECT doc_id, $b AS band, sig[${2 * b + 1}] AS h1, sig[${2 * b + 2}] AS h2 FROM sets")
      .mkString("\n|  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ss AS (
       |  SELECT doc_id,
       |    [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
       |     FOR i IN range(1, len(t) - 1)] AS sl
       |  FROM tok WHERE len(t) >= 3),
       |sh AS (
       |  SELECT doc_id, list_distinct([
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        [ord(c)::BIGINT FOR c IN string_split_regex(x, '')]),
       |      (a, h) -> (a * 131 + h) % 1000000007)
       |    FOR x IN sl]) AS hs FROM ss),
       |sets AS (
       |  SELECT doc_id, hs, len(hs) AS n,
       |    [$sigList] AS sig
       |  FROM sh),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM sets),
       |truth AS (
       |  SELECT id_a, id_b FROM (
       |    SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
       |    FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) p
       |  JOIN sets sa ON p.id_a = sa.doc_id
       |  JOIN sets sb ON p.id_b = sb.doc_id
       |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
       |bnd AS (
       |  $bandSelects),
       |minband AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, min(a.band) AS mj
       |  FROM bnd a JOIN bnd b
       |    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2
       |      AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |hist AS (
       |  SELECT m.mj, count(*) AS n_cand_at,
       |    sum(CASE WHEN t.id_a IS NOT NULL THEN 1 ELSE 0 END)
       |      AS n_caught_at
       |  FROM minband m
       |  LEFT JOIN truth t ON m.id_a = t.id_a AND m.id_b = t.id_b
       |  GROUP BY 1),
       |tot AS (SELECT count(*) AS n_truth FROM truth),
       |probes AS (SELECT unnest(range(1, 9)) AS n_bands)
       |SELECT p.n_bands,
       |  CAST(COALESCE(sum(h.n_cand_at), 0) AS BIGINT) AS n_candidates,
       |  CAST(COALESCE(sum(h.n_caught_at), 0) AS BIGINT) AS n_caught,
       |  (SELECT CAST(n_truth AS BIGINT) FROM tot) AS n_truth,
       |  CASE WHEN (SELECT n_truth FROM tot) = 0 THEN NULL
       |       ELSE CAST(COALESCE(sum(h.n_caught_at), 0) * 10000 //
       |         (SELECT n_truth FROM tot) AS BIGINT) END AS recall_bp
       |FROM probes p LEFT JOIN hist h ON h.mj < p.n_bands
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** d36's oracle: d25's portable signature replay plus the low-bit
    * match count and the clamped 2ĉ−1 estimator.
    */
  private def d36OracleSql: String = {
    val sigList = D25As
      .zip(D25Bs)
      .map { case (a, b) =>
        s"list_min([(h * $a + $b) % $D25P FOR h IN hs])"
      }
      .mkString(",\n|      ")
    val matchFull = (1 to 16)
      .map(j => s"CASE WHEN sa.sig[$j] = sb.sig[$j] THEN 1 ELSE 0 END")
      .mkString(" +\n|      ")
    val matchBit = (1 to 16)
      .map(j => s"CASE WHEN sa.sig[$j] % 2 = sb.sig[$j] % 2 THEN 1 ELSE 0 END")
      .mkString(" +\n|      ")
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ss AS (
       |  SELECT doc_id,
       |    [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
       |     FOR i IN range(1, len(t) - 1)] AS sl
       |  FROM tok WHERE len(t) >= 3),
       |sh AS (
       |  SELECT doc_id, list_distinct([
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        [ord(c)::BIGINT FOR c IN string_split_regex(x, '')]),
       |      (a, h) -> (a * 131 + h) % 1000000007)
       |    FOR x IN sl]) AS hs FROM ss),
       |sets AS (
       |  SELECT doc_id, hs, len(hs) AS n,
       |    [$sigList] AS sig
       |  FROM sh),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM sets),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(*) AS BIGINT) AS shared
       |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT id_a, id_b,
       |    shared::DOUBLE / (sa.n + sb.n - shared) AS jac,
       |    CAST($matchFull AS BIGINT) AS m_full,
       |    CAST($matchBit AS BIGINT) AS m_bit
       |  FROM pairs
       |  JOIN sets sa ON id_a = sa.doc_id
       |  JOIN sets sb ON id_b = sb.doc_id
       |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5)
       |SELECT id_a, id_b, round(jac, 4) AS jaccard, m_full, m_bit,
       |  round(m_full::DOUBLE / 16, 4) AS est_full,
       |  round(greatest(CAST(2 * m_bit - 16 AS DOUBLE), 0.0) / 16, 4)
       |    AS est_bit,
       |  round(abs(jac - m_full::DOUBLE / 16), 4) AS err_full,
       |  round(abs(jac -
       |    greatest(CAST(2 * m_bit - 16 AS DOUBLE), 0.0) / 16), 4) AS err_bit
       |FROM scored ORDER BY id_a, id_b""".stripMargin
  }

  /** d38's oracle: the same 16-coordinate signature replay, 8×2 band
    * keys, per-pair matching-band census and uniquely-held attribution.
    */
  private def d38OracleSql: String = {
    val sigList = D25As
      .zip(D25Bs)
      .map { case (a, b) => s"list_min([(h * $a + $b) % $D25P FOR h IN hs])" }
      .mkString(",\n|      ")
    val bandArms = (0 until 8)
      .map { b =>
        s"SELECT doc_id, $b AS band, sig[${2 * b + 1}] AS k1, sig[${2 * b + 2}] AS k2 FROM sets"
      }
      .mkString("\n|  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ss AS (
       |  SELECT doc_id,
       |    [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
       |     FOR i IN range(1, len(t) - 1)] AS sl
       |  FROM tok WHERE len(t) >= 3),
       |sh AS (
       |  SELECT doc_id, list_distinct([
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        [ord(c)::BIGINT FOR c IN string_split_regex(x, '')]),
       |      (a, h) -> (a * 131 + h) % 1000000007)
       |    FOR x IN sl]) AS hs FROM ss),
       |sets AS (
       |  SELECT doc_id, [$sigList] AS sig FROM sh),
       |banded AS (
       |  $bandArms),
       |bp AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.band
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
       |   AND a.doc_id < b.doc_id),
       |pp AS (
       |  SELECT id_a, id_b, count(*) AS n_bands, min(band) AS only_band
       |  FROM bp GROUP BY 1, 2),
       |fullc AS (SELECT CAST(count(*) AS BIGINT) AS n_full FROM pp),
       |held AS (
       |  SELECT band, CAST(count(*) AS BIGINT) AS n_matching
       |  FROM bp GROUP BY 1),
       |uniq AS (
       |  SELECT only_band AS band, CAST(count(*) AS BIGINT) AS n_unique
       |  FROM pp WHERE n_bands = 1 GROUP BY 1)
       |SELECT CAST(g.band AS INT) AS band,
       |  coalesce(held.n_matching, 0) AS n_matching,
       |  coalesce(uniq.n_unique, 0) AS n_uniquely_held,
       |  fullc.n_full,
       |  coalesce(uniq.n_unique, 0) * 10000 // greatest(fullc.n_full, 1) AS churn_bp
       |FROM (SELECT unnest(range(8)) AS band) g
       |LEFT JOIN held ON held.band = g.band
       |LEFT JOIN uniq ON uniq.band = g.band
       |CROSS JOIN fullc
       |ORDER BY band""".stripMargin
  }

  /** d37's oracle: d25's exact-Jaccard truth pairs + d3's full SimHash
    * replay + the tf-cosine exact side, identical expression trees.
    */
  private def d37OracleSql: String =
    """WITH tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |ss AS (
      |  SELECT doc_id,
      |    [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
      |     FOR i IN range(1, len(t) - 1)] AS sl
      |  FROM tok WHERE len(t) >= 3),
      |sh AS (
      |  SELECT doc_id, list_distinct([
      |    list_reduce(
      |      list_prepend(0::BIGINT,
      |        [ord(c)::BIGINT FOR c IN string_split_regex(x, '')]),
      |      (a, h) -> (a * 131 + h) % 1000000007)
      |    FOR x IN sl]) AS hs FROM ss),
      |sets AS (SELECT doc_id, hs, len(hs) AS n FROM sh),
      |ex AS (SELECT doc_id, unnest(hs) AS h FROM sets),
      |tp AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(count(*) AS BIGINT) AS shared
      |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |truep AS (
      |  SELECT id_a, id_b,
      |    shared::DOUBLE / (sa.n + sb.n - shared) AS jac
      |  FROM tp
      |  JOIN sets sa ON id_a = sa.doc_id
      |  JOIN sets sb ON id_b = sb.doc_id
      |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
      |toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS t
      |  FROM documents),
      |th AS (
      |  SELECT doc_id,
      |    list_reduce(
      |      list_prepend(0::BIGINT,
      |        [ord(c)::BIGINT FOR c IN string_split_regex(t, '')]),
      |      (a, x) -> (a * 131 + x) % 1000000007) AS h1,
      |    list_reduce(
      |      list_prepend(0::BIGINT,
      |        [ord(c)::BIGINT FOR c IN string_split_regex(t, '')]),
      |      (a, x) -> (a * 137 + x) % 998244353) AS h2
      |  FROM toks),
      |bits AS (
      |  SELECT doc_id, r.b,
      |    sum(CASE WHEN r.b < 30
      |             THEN CASE WHEN (h1 >> r.b) & 1 = 1 THEN 1 ELSE -1 END
      |             ELSE CASE WHEN (h2 >> (r.b - 30)) & 1 = 1 THEN 1 ELSE -1 END
      |        END) AS cnt
      |  FROM th, (SELECT unnest(range(60)) AS b) r
      |  GROUP BY 1, 2),
      |sk AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN cnt > 0
      |                  THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END)
      |      AS BIGINT) AS sh
      |  FROM bits GROUP BY 1),
      |pt AS (
      |  SELECT doc_id, t AS w, CAST(count(*) AS BIGINT) AS c
      |  FROM toks GROUP BY 1, 2),
      |norms AS (
      |  SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2 FROM pt GROUP BY 1),
      |dots AS (
      |  SELECT truep.id_a, truep.id_b,
      |    CAST(sum(pa.c * pb.c) AS BIGINT) AS dot
      |  FROM truep
      |  JOIN pt pa ON pa.doc_id = truep.id_a
      |  JOIN pt pb ON pb.doc_id = truep.id_b AND pb.w = pa.w
      |  GROUP BY 1, 2),
      |scored AS (
      |  SELECT truep.id_a, truep.id_b, truep.jac,
      |    CAST(bit_count(xor(ka.sh, kb.sh)) AS INT) AS hamming,
      |    CAST(dot AS DOUBLE) /
      |      (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
      |      AS cos_exact,
      |    cos(pi() * CAST(bit_count(xor(ka.sh, kb.sh)) AS DOUBLE) / 60)
      |      AS cos_est
      |  FROM truep
      |  JOIN dots ON dots.id_a = truep.id_a AND dots.id_b = truep.id_b
      |  JOIN norms na ON na.doc_id = truep.id_a
      |  JOIN norms nb ON nb.doc_id = truep.id_b
      |  JOIN sk ka ON ka.doc_id = truep.id_a
      |  JOIN sk kb ON kb.doc_id = truep.id_b)
      |SELECT id_a, id_b, round(jac, 4) AS jaccard, hamming,
      |  round(cos_exact, 4) AS cos_exact,
      |  round(cos_est, 4) AS cos_est,
      |  round(abs(cos_exact - cos_est), 4) AS abs_err
      |FROM scored ORDER BY id_a, id_b""".stripMargin

  /** d25's oracle: the same portable shingle fold, the same 16 affine
    * minima (unrolled — no comprehension-binding pitfalls), the same
    * hash-deduped sets and exact-Jaccard pair join.
    */
  private def d25OracleSql: String = {
    val sigList = D25As
      .zip(D25Bs)
      .map { case (a, b) =>
        s"list_min([(h * $a + $b) % $D25P FOR h IN hs])"
      }
      .mkString(",\n|      ")
    val matchSum = (1 to 16)
      .map(j => s"CASE WHEN sa.sig[$j] = sb.sig[$j] THEN 1 ELSE 0 END")
      .mkString(" +\n|      ")
    s"""WITH tok AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |ss AS (
       |  SELECT doc_id,
       |    [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
       |     FOR i IN range(1, len(t) - 1)] AS sl
       |  FROM tok WHERE len(t) >= 3),
       |sh AS (
       |  SELECT doc_id, list_distinct([
       |    list_reduce(
       |      list_prepend(0::BIGINT,
       |        [ord(c)::BIGINT FOR c IN string_split_regex(x, '')]),
       |      (a, h) -> (a * 131 + h) % 1000000007)
       |    FOR x IN sl]) AS hs FROM ss),
       |sets AS (
       |  SELECT doc_id, hs, len(hs) AS n,
       |    [$sigList] AS sig
       |  FROM sh),
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM sets),
       |pairs AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(count(*) AS BIGINT) AS shared
       |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT id_a, id_b,
       |    shared::DOUBLE / (sa.n + sb.n - shared) AS jac,
       |    CAST($matchSum AS BIGINT) AS matches
       |  FROM pairs
       |  JOIN sets sa ON id_a = sa.doc_id
       |  JOIN sets sb ON id_b = sb.doc_id
       |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5)
       |SELECT id_a, id_b, round(jac, 4) AS jaccard, matches,
       |  round(matches::DOUBLE / 16, 4) AS estimate,
       |  round(abs(jac - matches::DOUBLE / 16), 4) AS abs_err
       |FROM scored ORDER BY id_a, id_b""".stripMargin
  }

  private def d24OracleSql: String = {
    val steps = Seq((8, "16711935"), (4, "252645135"), (2, "858993459"), (1, "1431655765"))
    def curve(c: Int, d0: Int): String = {
      val base =
        s"""z${c}_0 AS (SELECT vec_id,
           |  least(greatest(CAST(floor((v[$d0] + 0.5) * 256 + 0.5) AS BIGINT),
           |                 0), 255) AS s0,
           |  least(greatest(CAST(floor((v[${d0 + 1}] + 0.5) * 256 + 0.5)
           |                      AS BIGINT), 0), 255) AS s1
           |  FROM e),
           |""".stripMargin
      val ladder = steps.zipWithIndex.map { case ((sh, m), i) =>
        s"""z${c}_${i + 1} AS (SELECT vec_id,
           |  (s0 | (s0 << $sh)) & $m AS s0,
           |  (s1 | (s1 << $sh)) & $m AS s1 FROM z${c}_$i),
           |""".stripMargin
      }.mkString
      base + ladder +
        s"""z$c AS (SELECT vec_id, s0 | (s1 << 1) AS zkey FROM z${c}_4),
           |r$c AS (SELECT vec_id,
           |  row_number() OVER (ORDER BY zkey, vec_id) AS rn FROM z$c),
           |c$c AS (
           |  SELECT least(a.vec_id, b.vec_id) AS id_a,
           |    greatest(a.vec_id, b.vec_id) AS id_b, $c AS pass
           |  FROM r$c a JOIN r$c b
           |    ON b.rn > a.rn AND b.rn <= a.rn + 2),
           |""".stripMargin
    }
    """WITH o AS (
      |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
      |    CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |pert AS (
      |  SELECT vec_id + 1000000 AS vec_id,
      |    [v[i] + CASE WHEN (i - 1) % 2 = 0 THEN 0.0002 ELSE -0.0002 END
      |     FOR i IN range(1, len(v) + 1)] AS v
      |  FROM o),
      |e AS (SELECT * FROM o UNION ALL SELECT * FROM pert),
      |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm
      |      FROM e),
      |""".stripMargin +
      curve(1, 1) + curve(2, 3) +
      """u AS (
      |  SELECT id_a, id_b, CAST(min(pass) AS BIGINT) AS pass
      |  FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
      |  GROUP BY 1, 2),
      |p AS (
      |  SELECT u.id_a, u.id_b, u.pass,
      |    list_inner_product(na.v, nb.v) / (na.norm * nb.norm) AS cos
      |  FROM u
      |  JOIN n na ON na.vec_id = u.id_a
      |  JOIN n nb ON nb.vec_id = u.id_b)
      |SELECT id_a, id_b, pass, round(cos, 4) AS cosine
      |FROM p WHERE cos >= 0.9
      |ORDER BY id_a, id_b""".stripMargin
  }

  /** Ground-truth near-dup clusters: exhaustive Jaccard pairs closed
    * transitively with a recursive CTE — gates BOTH CC engines (d6
    * Hash-Min and d30 two-star), which must agree row-for-row.
    */
  private val ccClustersOracle: String =
    """WITH RECURSIVE tok AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
      |                   FOR i IN range(1, len(t) - 1)]) AS shingles
      |  FROM tok WHERE len(t) >= 3),
      |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
      |p0 AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
      |pq AS (
      |  SELECT id_a, id_b
      |  FROM p0 JOIN sizes sa ON id_a = sa.doc_id
      |          JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
      |edges AS (SELECT id_a AS a, id_b AS b FROM pq
      |          UNION ALL SELECT id_b AS a, id_a AS b FROM pq),
      |reach(id, r) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
      |comp AS (SELECT id, min(r) AS cluster_rep FROM reach GROUP BY id)
      |SELECT c.id AS doc_id, c.cluster_rep, cnt.cluster_size
      |FROM comp c JOIN (SELECT cluster_rep, count(*) AS cluster_size
      |                  FROM comp GROUP BY 1) cnt USING (cluster_rep)
      |ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // same 3-shingle tf table, same df<=64 vector space, same
    // tf*ln(1 + N/df) weights and pruned-space cosine at theta=0.6
    "d35_tfidf_cosine" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tf AS (
        |  SELECT doc_id, sh, count(*) AS c FROM (
        |    SELECT doc_id,
        |      unnest([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |        FOR i IN range(1, len(t) - 1)]) AS sh
        |    FROM tok)
        |  GROUP BY 1, 2),
        |dfr AS (
        |  SELECT sh, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) <= 64),
        |nd AS (SELECT count(*) AS n FROM tok),
        |w AS (
        |  SELECT doc_id, tf.sh, df,
        |    c::DOUBLE * ln(1.0 + n::DOUBLE / df::DOUBLE) AS w
        |  FROM tf JOIN dfr USING (sh), nd),
        |nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS num
        |  FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  WHERE a.df >= 2 AND b.df >= 2
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, round(num / (na.nrm * nb.nrm), 4) AS cosine
        |FROM pairs
        |JOIN nrm na ON na.doc_id = id_a
        |JOIN nrm nb ON nb.doc_id = id_b
        |WHERE num / (na.nrm * nb.nrm) >= 0.6
        |ORDER BY id_a, id_b""".stripMargin,
    // d11's rolling-fingerprint arithmetic with POSITIONS kept, the
    // same df>=2 distinct-doc dup test, and the same gap>8 island merge
    "d34_dup_spans" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (
        |  SELECT doc_id, len(t) AS n_tokens, list_transform(t, w -> list_reduce(
        |      list_prepend(0::BIGINT,
        |        list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
        |      (h, c) -> (h * 131 + c) % 1000000007)) AS whs
        |  FROM d WHERE len(t) >= 8),
        |v AS (
        |  SELECT doc_id, n_tokens, i AS p,
        |    list_reduce(list_prepend(0::BIGINT, whs[i:i+7]),
        |      (h, x) -> (h * 1000003 + x) % 1000000007) AS fp
        |  FROM w, LATERAL (SELECT unnest(range(1, len(whs) - 6)) AS i)),
        |dup AS (
        |  SELECT fp FROM (SELECT DISTINCT fp, doc_id FROM v)
        |  GROUP BY fp HAVING count(*) >= 2),
        |hit AS (
        |  SELECT v.doc_id, v.n_tokens, v.p,
        |    CASE WHEN lag(v.p) OVER (PARTITION BY v.doc_id ORDER BY v.p) IS NULL
        |         OR v.p - lag(v.p) OVER (PARTITION BY v.doc_id ORDER BY v.p) > 8
        |         THEN 1 ELSE 0 END AS brk
        |  FROM v JOIN dup USING (fp)),
        |isl AS (
        |  SELECT doc_id, n_tokens, p,
        |    sum(brk) OVER (PARTITION BY doc_id ORDER BY p
        |                   ROWS UNBOUNDED PRECEDING) AS island
        |  FROM hit),
        |spans AS (
        |  SELECT doc_id, island, max(n_tokens) AS n_tokens,
        |    max(p) + 7 - min(p) + 1 AS span_len
        |  FROM isl GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(max(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(span_len) AS BIGINT) AS dup_tokens,
        |  CAST(max(span_len) AS BIGINT) AS longest_span,
        |  CAST(sum(span_len) * 10000 // max(n_tokens) AS BIGINT) AS dup_bp
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same distinct-name collapse, same plant, same thirds
    // pigeonhole, same levenshtein in [1, 2]
    "d33_fuzzy_join" ->
      """WITH base AS (
        |  SELECT name, min(id) AS id, count(*) AS cnt FROM (
        |    SELECT p_partkey AS id, p_name AS name FROM part)
        |  GROUP BY name),
        |pl AS (
        |  SELECT substring(name, 1, 2) || 'zz' || substring(name, 5) AS name,
        |    id + 1000000 AS id, 1 AS cnt
        |  FROM base WHERE id % 17 = 5),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM pl),
        |segs AS (
        |  SELECT id, name, cnt, length(name) AS L, idx,
        |    CASE idx
        |      WHEN 0 THEN substring(name, 1, length(name) // 3)
        |      WHEN 1 THEN substring(name, length(name) // 3 + 1,
        |                            length(name) // 3)
        |      ELSE substring(name, 2 * (length(name) // 3) + 1) END AS seg
        |  FROM allv, (SELECT unnest(range(0, 3)) AS idx)),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, a.name AS na, a.cnt AS ca,
        |    b.id AS id_b, b.name AS nb, b.cnt AS cb
        |  FROM segs a JOIN segs b
        |    ON a.idx = b.idx AND a.L = b.L AND a.seg = b.seg AND a.id < b.id),
        |m AS (
        |  SELECT id_a, ca, id_b, cb, levenshtein(na, nb) AS dist
        |  FROM cand
        |  WHERE levenshtein(na, nb) BETWEEN 1 AND 2)
        |SELECT CAST(dist AS BIGINT) AS dist,
        |  CAST(count(*) AS BIGINT) AS n_name_pairs,
        |  CAST(sum(CASE WHEN (id_a >= 1000000) <> (id_b >= 1000000)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_planted_pairs,
        |  CAST(sum(ca * cb) AS BIGINT) AS n_record_pairs,
        |  CAST(sum(id_a + id_b) AS BIGINT) AS id_sum
        |FROM m GROUP BY 1 ORDER BY dist""".stripMargin,
    "d28_method_agreement" -> d28OracleSql,
    "d27_band_sweep" -> d27OracleSql,
    "d26_blocking_efficiency" -> d26OracleSql,
    // the same bp-frozen cosine pairs, the same nested θ replication,
    // components via the d6 transitive-closure recursion keyed by
    // (θ, node)
    // d40: the same transitive-closure recursion as d39, keyed by
    // (arm, θ, node); the banded arm's candidates replay s2's
    // literal-embedded hyperplanes (planeRowsSql) in SQL
    "d40_banded_threshold_sweep" ->
      s"""WITH RECURSIVE e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(floor(list_inner_product(a.v, b.v) / (a.norm * b.norm)
        |               * 10000 + 0.5) AS BIGINT) AS cos_bp
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id),
        |pq AS (SELECT * FROM p WHERE cos_bp >= 3000),
        |planes(t, j, pv) AS (VALUES ${graft.ops.Similarity.planeRowsSql}),
        |bkt AS (
        |  SELECT n.vec_id, pl.t,
        |    CAST(sum(CASE WHEN list_inner_product(n.v, pl.pv) > 0
        |             THEN 1 << pl.j ELSE 0 END) AS INTEGER) AS bk
        |  FROM n, planes pl GROUP BY n.vec_id, pl.t),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM bkt a JOIN bkt b ON a.t = b.t AND a.bk = b.bk
        |  WHERE a.vec_id < b.vec_id),
        |bq AS (SELECT pq.* FROM pq JOIN cand USING (id_a, id_b)),
        |th AS (
        |  SELECT CAST(unnest([3000, 4000, 5000, 6000]) AS BIGINT) AS theta_bp),
        |et AS (
        |  SELECT 0 AS arm, th.theta_bp, id_a, id_b FROM pq, th
        |  WHERE cos_bp >= th.theta_bp
        |  UNION ALL
        |  SELECT 1 AS arm, th.theta_bp, id_a, id_b FROM bq, th
        |  WHERE cos_bp >= th.theta_bp),
        |edges AS (
        |  SELECT arm, theta_bp, id_a AS a, id_b AS b FROM et
        |  UNION ALL SELECT arm, theta_bp, id_b AS a, id_a AS b FROM et),
        |reach(m, t, id, r) AS (
        |  SELECT arm, theta_bp, a, a FROM edges
        |  UNION
        |  SELECT reach.m, reach.t, reach.id, e2.b
        |  FROM reach JOIN edges e2
        |    ON reach.m = e2.arm AND reach.t = e2.theta_bp AND reach.r = e2.a),
        |comp AS (SELECT m, t, id, min(r) AS label FROM reach GROUP BY 1, 2, 3),
        |cs AS (
        |  SELECT m, t, label, CAST(count(*) AS BIGINT) AS sz FROM comp GROUP BY 1, 2, 3),
        |per_arm AS (
        |  SELECT m, t, CAST(count(*) AS BIGINT) AS n_components,
        |    CAST(sum(sz) AS BIGINT) AS n_linked,
        |    CAST(max(sz) AS BIGINT) AS max_cluster
        |  FROM cs GROUP BY 1, 2),
        |census AS (
        |  SELECT t AS theta_bp,
        |    max(CASE WHEN m = 0 THEN n_components END) AS comp_e,
        |    max(CASE WHEN m = 1 THEN n_components END) AS comp_b,
        |    max(CASE WHEN m = 0 THEN n_linked END) AS link_e,
        |    max(CASE WHEN m = 1 THEN n_linked END) AS link_b,
        |    max(CASE WHEN m = 0 THEN max_cluster END) AS mc_e,
        |    max(CASE WHEN m = 1 THEN max_cluster END) AS mc_b
        |  FROM per_arm GROUP BY 1),
        |ne AS (
        |  SELECT theta_bp,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ne_e,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ne_b
        |  FROM et GROUP BY 1)
        |SELECT th.theta_bp,
        |  coalesce(ne.ne_e, 0) AS n_edges_exact,
        |  coalesce(ne.ne_b, 0) AS n_edges_banded,
        |  coalesce(ne.ne_b, 0) * 10000 // greatest(coalesce(ne.ne_e, 0), 1)
        |    AS edge_recall_bp,
        |  coalesce(census.comp_e, 0) AS n_components_exact,
        |  coalesce(census.comp_b, 0) AS n_components_banded,
        |  coalesce(census.link_e, 0) AS n_linked_exact,
        |  coalesce(census.link_b, 0) AS n_linked_banded,
        |  coalesce(census.mc_e, 0) AS max_cluster_exact,
        |  coalesce(census.mc_b, 0) AS max_cluster_banded
        |FROM th LEFT JOIN ne ON th.theta_bp = ne.theta_bp
        |LEFT JOIN census ON th.theta_bp = census.theta_bp
        |ORDER BY th.theta_bp""".stripMargin,
    "d39_threshold_stability" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e),
        |p AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |    CAST(floor(list_inner_product(a.v, b.v) / (a.norm * b.norm)
        |               * 10000 + 0.5) AS BIGINT) AS cos_bp
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id),
        |pq AS (SELECT * FROM p WHERE cos_bp >= 3000),
        |th AS (
        |  SELECT CAST(unnest([3000, 4000, 5000, 6000]) AS BIGINT) AS theta_bp),
        |et AS (
        |  SELECT th.theta_bp, id_a, id_b FROM pq, th
        |  WHERE cos_bp >= th.theta_bp),
        |edges AS (
        |  SELECT theta_bp, id_a AS a, id_b AS b FROM et
        |  UNION ALL SELECT theta_bp, id_b AS a, id_a AS b FROM et),
        |reach(t, id, r) AS (
        |  SELECT theta_bp, a, a FROM edges
        |  UNION
        |  SELECT reach.t, reach.id, e2.b
        |  FROM reach JOIN edges e2 ON reach.t = e2.theta_bp AND reach.r = e2.a),
        |comp AS (SELECT t, id, min(r) AS label FROM reach GROUP BY 1, 2),
        |cs AS (
        |  SELECT t, label, CAST(count(*) AS BIGINT) AS sz FROM comp GROUP BY 1, 2),
        |census AS (
        |  SELECT t AS theta_bp, CAST(count(*) AS BIGINT) AS n_components,
        |    CAST(sum(sz) AS BIGINT) AS n_linked,
        |    CAST(max(sz) AS BIGINT) AS max_cluster
        |  FROM cs GROUP BY 1),
        |ne AS (
        |  SELECT theta_bp, CAST(count(*) AS BIGINT) AS n_edges FROM et GROUP BY 1),
        |tv AS (SELECT CAST(count(*) AS BIGINT) AS n_vecs FROM e)
        |SELECT th.theta_bp,
        |  coalesce(ne.n_edges, 0) AS n_edges,
        |  coalesce(census.n_linked, 0) AS n_linked,
        |  coalesce(census.n_components, 0) AS n_components,
        |  coalesce(census.max_cluster, 0) AS max_cluster,
        |  tv.n_vecs - coalesce(census.n_linked, 0) AS n_isolated
        |FROM th LEFT JOIN ne ON th.theta_bp = ne.theta_bp
        |LEFT JOIN census ON th.theta_bp = census.theta_bp
        |CROSS JOIN tv ORDER BY th.theta_bp""".stripMargin,
    "d38_band_stability" -> d38OracleSql,
    "d37_simhash_error" -> d37OracleSql,
    "d36_bbit_minhash" -> d36OracleSql,
    "d25_minhash_error" -> d25OracleSql,
    "d24_zorder_neighbors" -> d24OracleSql,
    // d6's recursive-CTE components rolled up by cluster size; integer
    // basis points for the share
    "d22_cluster_size_dist" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS shingles
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |p0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |pq AS (
        |  SELECT id_a, id_b
        |  FROM p0 JOIN sizes sa ON id_a = sa.doc_id
        |          JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pq
        |          UNION ALL SELECT id_b AS a, id_a AS b FROM pq),
        |reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT id, min(r) AS cluster_rep FROM reach GROUP BY id),
        |cs AS (SELECT cluster_rep, count(*) AS cluster_size
        |       FROM comp GROUP BY 1),
        |tot AS (SELECT CAST(sum(cluster_size) AS BIGINT) AS n_matched FROM cs)
        |SELECT cluster_size, count(*) AS n_clusters,
        |  CAST(cluster_size * count(*) AS BIGINT) AS docs_in_size,
        |  CAST((cluster_size - 1) * count(*) AS BIGINT) AS removable_docs,
        |  (CAST(cluster_size * count(*) AS BIGINT) * 10000) // tot.n_matched
        |    AS doc_share_bp
        |FROM cs, tot GROUP BY cluster_size, tot.n_matched
        |ORDER BY cluster_size""".stripMargin,
    // d2's exact-Jaccard construction bucketed by floor(10·J) (same
    // IEEE division + floor), reverse running sum for ≥-threshold
    "d21_threshold_sweep" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
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
        |j AS (
        |  SELECT shared::DOUBLE / (sa.n + sb.n - shared) AS jac
        |  FROM pairs JOIN sizes sa ON id_a = sa.doc_id
        |             JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
        |b AS (
        |  SELECT least(floor(jac * 10), 9) AS bucket, count(*) AS n_pairs
        |  FROM j GROUP BY 1)
        |SELECT round(bucket / 10.0, 1) AS threshold,
        |  n_pairs,
        |  CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS n_at_or_above
        |FROM b ORDER BY threshold""".stripMargin,
    // d6's recursive-CTE clusters + per-cluster argmax survivorship
    "d20_canonical_survivor" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS shingles
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |p0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |pq AS (
        |  SELECT id_a, id_b
        |  FROM p0 JOIN sizes sa ON id_a = sa.doc_id
        |          JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pq
        |          UNION ALL SELECT id_b AS a, id_a AS b FROM pq),
        |reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT id, min(r) AS cluster_rep FROM reach GROUP BY id),
        |m AS (
        |  SELECT c.id AS doc_id, c.cluster_rep, d.n_chars, d.source
        |  FROM comp c JOIN documents d ON d.doc_id = c.id),
        |rk AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY cluster_rep
        |                       ORDER BY n_chars DESC, doc_id ASC) AS r,
        |    count(*) OVER (PARTITION BY cluster_rep) AS n_docs,
        |    sum(n_chars) OVER (PARTITION BY cluster_rep) AS chars_total
        |  FROM m)
        |SELECT cluster_rep, doc_id AS survivor_id, source AS survivor_source,
        |  CAST(n_chars AS BIGINT) AS survivor_chars,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_docs - 1 AS BIGINT) AS n_removed,
        |  CAST(chars_total - n_chars AS BIGINT) AS chars_removed
        |FROM rk WHERE r = 1
        |ORDER BY cluster_rep""".stripMargin,
    "d19_sorted_neighborhood_multipass" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    lower(regexp_replace(text, '\s+', ' ', 'g')) AS sk
        |  FROM documents),
        |passes AS (
        |  SELECT doc_id, sk, 1 AS pass FROM keyed
        |  UNION ALL
        |  SELECT doc_id, reverse(sk), 2 FROM keyed),
        |rk AS (
        |  SELECT doc_id, pass, substr(sk, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY pass, substr(sk, 1, 2)
        |                       ORDER BY sk, doc_id) AS r
        |  FROM passes),
        |cand AS (
        |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
        |    greatest(a.doc_id, b.doc_id) AS id_b
        |  FROM rk a JOIN rk b
        |    ON a.pass = b.pass AND a.blk = b.blk
        |   AND b.r > a.r AND b.r <= a.r + 3),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |shared AS (
        |  SELECT c.id_a, c.id_b, count(*) AS sh
        |  FROM cand c
        |    JOIN ex x ON x.doc_id = c.id_a
        |    JOIN ex y ON y.doc_id = c.id_b AND y.g = x.g
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh)
        |SELECT s0.id_a, s0.id_b,
        |  round(s0.sh::DOUBLE / (sa.n + sb.n - s0.sh), 4) AS jaccard
        |FROM shared s0
        |  JOIN sizes sa ON sa.doc_id = s0.id_a
        |  JOIN sizes sb ON sb.doc_id = s0.id_b
        |WHERE s0.sh::DOUBLE / (sa.n + sb.n - s0.sh) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "d17_sorted_neighborhood" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    lower(regexp_replace(text, '\s+', ' ', 'g')) AS sk
        |  FROM documents),
        |rk AS (
        |  SELECT doc_id, sk, substr(sk, 1, 2) AS blk,
        |    row_number() OVER (PARTITION BY substr(sk, 1, 2)
        |                       ORDER BY sk, doc_id) AS r
        |  FROM keyed),
        |cand AS (
        |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS id_a,
        |    greatest(a.doc_id, b.doc_id) AS id_b
        |  FROM rk a JOIN rk b
        |    ON a.blk = b.blk AND b.r > a.r AND b.r <= a.r + 3),
        |tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |shared AS (
        |  SELECT c.id_a, c.id_b, count(*) AS sh
        |  FROM cand c
        |    JOIN ex x ON x.doc_id = c.id_a
        |    JOIN ex y ON y.doc_id = c.id_b AND y.g = x.g
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh)
        |SELECT s0.id_a, s0.id_b,
        |  round(s0.sh::DOUBLE / (sa.n + sb.n - s0.sh), 4) AS jaccard
        |FROM shared s0
        |  JOIN sizes sa ON sa.doc_id = s0.id_a
        |  JOIN sizes sb ON sb.doc_id = s0.id_b
        |WHERE s0.sh::DOUBLE / (sa.n + sb.n - s0.sh) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "d18_cross_source_dup" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS s
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |p0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(s) AS n FROM sh),
        |pq AS (
        |  SELECT id_a, id_b,
        |    shared::DOUBLE / (sa.n + sb.n - shared) AS jac
        |  FROM p0 JOIN sizes sa ON id_a = sa.doc_id
        |          JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5)
        |SELECT least(da.source, db.source) AS src_x,
        |  greatest(da.source, db.source) AS src_y,
        |  count(*) AS n_pairs,
        |  max(round(jac, 4)) AS max_jaccard
        |FROM pq
        |  JOIN documents da ON da.doc_id = pq.id_a
        |  JOIN documents db ON db.doc_id = pq.id_b
        |GROUP BY 1, 2
        |ORDER BY src_x, src_y""".stripMargin,
    // d6's exact pair graph, then DBSCAN roles: core = degree ≥ 2,
    // clusters = closure over core–core edges only, border = min core
    // neighbor's label, noise = matched but neither.
    "d16_density_clusters" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS shingles
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |p0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |pq AS (
        |  SELECT id_a, id_b
        |  FROM p0 JOIN sizes sa ON id_a = sa.doc_id
        |          JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pq
        |          UNION ALL SELECT id_b AS a, id_a AS b FROM pq),
        |deg AS (SELECT a AS id, count(*) AS deg FROM edges GROUP BY 1),
        |core AS (SELECT id FROM deg WHERE deg >= 2),
        |ce AS (SELECT e.a, e.b FROM edges e
        |       JOIN core c1 ON e.a = c1.id JOIN core c2 ON e.b = c2.id),
        |reach(id, r) AS (
        |  SELECT id, id FROM core
        |  UNION
        |  SELECT reach.id, e.b FROM reach JOIN ce e ON reach.r = e.a),
        |comp AS (SELECT id, min(r) AS label FROM reach GROUP BY id),
        |border AS (
        |  SELECT e.a AS id, min(c.label) AS label
        |  FROM edges e JOIN comp c ON e.b = c.id
        |  WHERE e.a NOT IN (SELECT id FROM core)
        |  GROUP BY 1),
        |noise AS (
        |  SELECT DISTINCT a AS id FROM edges
        |  WHERE a NOT IN (SELECT id FROM core)
        |    AND a NOT IN (SELECT id FROM border))
        |SELECT id AS doc_id, 'core' AS role, CAST(label AS BIGINT) AS cluster_rep FROM comp
        |UNION ALL
        |SELECT id, 'border', CAST(label AS BIGINT) FROM border
        |UNION ALL
        |SELECT id, 'noise', CAST(NULL AS BIGINT) FROM noise
        |ORDER BY doc_id""".stripMargin,
    // d14's CTEs with crn <= 2 and pair-level DISTINCT; arg_min ==
    // Spark's min_by (ids unique per group, ties impossible).
    "d15_semantic_dedup_soft" ->
      """WITH e AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |         CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |aug AS (
        |  SELECT vec_id, v FROM e
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_transform(v, (x, i) ->
        |      x * (CASE WHEN i % 2 = 1 THEN 1.05 ELSE 0.95 END))
        |  FROM e),
        |n AS (
        |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM aug),
        |cents AS (
        |  SELECT CAST(vec_id // 31 AS INT) AS cell, v AS cv,
        |         sqrt(list_inner_product(v, v)) AS cnorm
        |  FROM e WHERE vec_id % 31 = 0 AND vec_id < 496),
        |scored AS (
        |  SELECT n.vec_id, n.v, n.norm, c.cell,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_inner_product(n.v, c.cv) / (n.norm * c.cnorm)
        |        DESC, c.cell ASC) AS crn
        |  FROM n, cents c),
        |assigned AS (SELECT DISTINCT vec_id, v, norm, cell FROM scored WHERE crn <= 2),
        |pairs AS (
        |  SELECT DISTINCT b.vec_id AS drop_id, a.vec_id AS id_a,
        |    list_inner_product(a.v, b.v) / (a.norm * b.norm) AS cos
        |  FROM assigned a JOIN assigned b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_inner_product(a.v, b.v) / (a.norm * b.norm) >= 0.9)
        |SELECT drop_id, min(id_a) AS keep_id,
        |  round(arg_min(cos, id_a), 4) AS cosine
        |FROM pairs GROUP BY drop_id ORDER BY drop_id""".stripMargin,
    // Same augmented corpus as d10's oracle; assignment, within-cell
    // pairs and the keeper rule replayed relationally. arg_min ==
    // Spark's min_by (no ties: ids are unique per group).
    "d14_semantic_dedup" ->
      """WITH e AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |         CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |aug AS (
        |  SELECT vec_id, v FROM e
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_transform(v, (x, i) ->
        |      x * (CASE WHEN i % 2 = 1 THEN 1.05 ELSE 0.95 END))
        |  FROM e),
        |n AS (
        |  SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM aug),
        |cents AS (
        |  SELECT CAST(vec_id // 31 AS INT) AS cell, v AS cv,
        |         sqrt(list_inner_product(v, v)) AS cnorm
        |  FROM e WHERE vec_id % 31 = 0 AND vec_id < 496),
        |scored AS (
        |  SELECT n.vec_id, n.v, n.norm, c.cell,
        |    row_number() OVER (PARTITION BY n.vec_id
        |      ORDER BY list_inner_product(n.v, c.cv) / (n.norm * c.cnorm)
        |        DESC, c.cell ASC) AS crn
        |  FROM n, cents c),
        |assigned AS (SELECT vec_id, v, norm, cell FROM scored WHERE crn = 1),
        |pairs AS (
        |  SELECT b.cell AS cell, b.vec_id AS drop_id, a.vec_id AS id_a,
        |    list_inner_product(a.v, b.v) / (a.norm * b.norm) AS cos
        |  FROM assigned a JOIN assigned b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_inner_product(a.v, b.v) / (a.norm * b.norm) >= 0.9)
        |SELECT cell, drop_id, min(id_a) AS keep_id,
        |  round(arg_min(cos, id_a), 4) AS cosine
        |FROM pairs GROUP BY cell, drop_id ORDER BY drop_id""".stripMargin,
    // Same Rabin–Karp arithmetic as the t7 oracle: per-word polynomial
    // char hash (base 131), 8-word window fold (base 1000003), both
    // mod 1e9+7 — engine-portable exact integers.
    "d11_passage_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |w AS (
        |  SELECT doc_id, list_transform(t, w -> list_reduce(
        |      list_prepend(0::BIGINT,
        |        list_transform(string_split(w, ''), c -> ascii(c)::BIGINT)),
        |      (h, c) -> (h * 131 + c) % 1000000007)) AS whs
        |  FROM d WHERE len(t) >= 8),
        |v AS (
        |  SELECT doc_id, len(whs) - 7 AS n_windows,
        |    unnest(list_transform(range(1, len(whs) - 6),
        |      i -> list_reduce(list_prepend(0::BIGINT, whs[i:i+7]),
        |             (h, x) -> (h * 1000003 + x) % 1000000007))) AS fp
        |  FROM w),
        |pdf AS (
        |  SELECT fp, doc_id, max(n_windows) AS n_windows, count(*) AS occ
        |  FROM v GROUP BY 1, 2),
        |dup AS (SELECT fp FROM pdf GROUP BY fp HAVING count(*) >= 2)
        |SELECT p.doc_id,
        |  CAST(max(p.n_windows) AS INTEGER) AS n_windows,
        |  CAST(sum(p.occ) AS BIGINT) AS n_dup_windows,
        |  round(sum(p.occ)::DOUBLE / max(p.n_windows), 6) AS dup_frac
        |FROM pdf p JOIN dup USING (fp)
        |GROUP BY 1
        |ORDER BY doc_id""".stripMargin,
    // regexp_replace needs the 'g' flag in DuckDB (Spark always
    // replaces globally)
    "d9_canonical_dedup" ->
      """SELECT md5(trim(regexp_replace(
        |    regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g'))) AS fp,
        | min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY 1
        |ORDER BY fp""".stripMargin,
    "d8_fuzzy_match" ->
      """WITH p AS (
        |  SELECT p_partkey, p_name, p_brand,
        |    string_split(p_name, ' ')[-1] AS noun
        |  FROM part),
        |e AS (
        |  SELECT a.p_partkey, min(b.p_partkey) AS match_key
        |  FROM p a JOIN p b
        |    ON a.p_brand = b.p_brand
        |   AND a.noun = b.noun
        |   AND b.p_partkey < a.p_partkey
        |   AND abs(length(a.p_name) - length(b.p_name)) <= 2
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2
        |  GROUP BY a.p_partkey)
        |SELECT p.p_partkey,
        | coalesce(e.match_key, p.p_partkey) AS canonical_key,
        | coalesce(e.match_key, p.p_partkey) = p.p_partkey AS is_canonical
        |FROM p LEFT JOIN e USING (p_partkey)
        |ORDER BY p.p_partkey""".stripMargin,
    "d7_decontaminate" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' '))) AS sh
        |  FROM d),
        |ev AS (
        |  SELECT DISTINCT doc_id AS eval_id, sh FROM sh
        |  WHERE doc_id % 10 = 0),
        |tr AS (SELECT * FROM sh WHERE doc_id % 10 <> 0)
        |SELECT tr.doc_id,
        | count(DISTINCT tr.sh) AS n_shared_shingles,
        | count(DISTINCT ev.eval_id) AS n_eval_docs
        |FROM tr JOIN ev ON tr.sh = ev.sh
        |GROUP BY tr.doc_id
        |ORDER BY doc_id""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY fp""".stripMargin,
    // d2's LSH candidates are exact-verified, so its output equals the
    // ground-truth full Jaccard join at the same threshold.
    "d2_dedup_minhash" -> jaccardOracle(3, langBlocked = false, extraCols = ""),
    // the SAME exhaustive ground truth as d2: LSH banding, full
    // postings (d13's regime) and prefix postings must all land on it
    "d23_allpairs_prefix" -> jaccardOracle(3, langBlocked = false, extraCols = ""),
    // Ground-truth clusters: exhaustive Jaccard pairs (same recall
    // argument as d2) closed transitively with a recursive CTE.
    "d6_dup_clusters" -> ccClustersOracle,
    // d30 computes the SAME component decomposition with the two-star
    // algorithm — one ground truth gates both CC engines
    "d30_cc_twostar" -> ccClustersOracle,
    // same literal grid, same S-curve power() calls quantized at 1e6,
    // same total-order argmin — zero data touched on either engine
    "d32_lsh_tuner" ->
      """WITH grid AS (
        |  SELECT b.i AS b, r.i AS r
        |  FROM range(1, 65) b(i), range(1, 9) r(i)
        |  WHERE b.i * r.i <= 64),
        |scored AS (
        |  SELECT b, r, b * r AS n_hashes,
        |    CAST(round((1.0e0 - power(1.0e0 - power(CAST(0.5 AS DOUBLE),
        |      CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1e6) AS BIGINT)
        |      AS recall_micro,
        |    CAST(round((1.0e0 - power(1.0e0 - power(CAST(0.1 AS DOUBLE),
        |      CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1e6) AS BIGINT)
        |      AS bg_collision_micro
        |  FROM grid),
        |f AS (
        |  SELECT *, CASE WHEN recall_micro >= 950000 THEN 1 ELSE 0 END
        |    AS feasible
        |  FROM scored),
        |rk AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY feasible DESC, bg_collision_micro ASC,
        |             n_hashes ASC, b DESC) AS rk
        |  FROM f)
        |SELECT CAST(b AS BIGINT) AS b, CAST(r AS BIGINT) AS r,
        |  CAST(n_hashes AS BIGINT) AS n_hashes, recall_micro,
        |  bg_collision_micro, CAST(feasible AS BIGINT) AS feasible,
        |  CAST(CASE WHEN rk = 1 AND feasible = 1 THEN 1 ELSE 0 END
        |    AS BIGINT) AS chosen
        |FROM rk
        |ORDER BY b, r""".stripMargin,
    // base closure → ranked reps → planted delta batch → merged
    // closure, all recomputed from scratch (the incremental path must
    // land on the full recompute exactly)
    "d31_cc_incremental" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    list_distinct([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
        |                   FOR i IN range(1, len(t) - 1)]) AS shingles
        |  FROM tok WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
        |p0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
        |pq AS (
        |  SELECT id_a, id_b
        |  FROM p0 JOIN sizes sa ON id_a = sa.doc_id
        |          JOIN sizes sb ON id_b = sb.doc_id
        |  WHERE shared::DOUBLE / (sa.n + sb.n - shared) >= 0.5),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pq
        |          UNION ALL SELECT id_b AS a, id_a AS b FROM pq),
        |reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a),
        |comp AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
        |rr AS (
        |  SELECT rep, row_number() OVER (ORDER BY rep) AS rk
        |  FROM (SELECT DISTINCT rep FROM comp)),
        |delta AS (
        |  SELECT a.rep AS da, b.rep AS db
        |  FROM rr a JOIN rr b ON b.rk = a.rk + 1
        |  WHERE a.rk % 2 = 1 AND a.rk <= 6),
        |edges2 AS (
        |  SELECT a, b FROM edges
        |  UNION ALL SELECT da, db FROM delta
        |  UNION ALL SELECT db, da FROM delta),
        |reach2(id, r) AS (
        |  SELECT a, a FROM edges2
        |  UNION
        |  SELECT reach2.id, e.b FROM reach2 JOIN edges2 e ON reach2.r = e.a),
        |comp2 AS (SELECT id, min(r) AS cluster_rep FROM reach2 GROUP BY id)
        |SELECT c.id AS doc_id, c.cluster_rep, cnt.cluster_size
        |FROM comp2 c JOIN (SELECT cluster_rep, count(*) AS cluster_size
        |                   FROM comp2 GROUP BY 1) cnt USING (cluster_rep)
        |ORDER BY doc_id""".stripMargin,
    // identical planted batch, identical u-estimate and micro-nat
    // weight formulas; DuckDB's un-thresholded levenshtein <= 2 is
    // Spark's threshold form's exact semantics
    "d29_fellegi_sunter" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
        |    c_mktsegment AS seg,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |dup AS (
        |  SELECT id + 10000000, substring(name, 1, 17) || 'x', nat, seg,
        |    cents + 50
        |  FROM base WHERE id % 20 = 0),
        |rec AS (SELECT * FROM base UNION ALL SELECT * FROM dup),
        |pr AS (
        |  SELECT a.id AS id_a, b.id AS id_b,
        |    CASE WHEN levenshtein(a.name, b.name) <= 2 THEN 1 ELSE 0 END AS g1,
        |    CASE WHEN abs(a.cents - b.cents) <= 100 THEN 1 ELSE 0 END AS g2,
        |    CASE WHEN substring(a.name, 15, 3) = substring(b.name, 15, 3)
        |         THEN 1 ELSE 0 END AS g3
        |  FROM rec a JOIN rec b
        |    ON a.nat = b.nat AND a.seg = b.seg AND a.id < b.id),
        |u AS (
        |  SELECT count(*) AS n, sum(g1) AS a1, sum(g2) AS a2, sum(g3) AS a3
        |  FROM pr),
        |w AS (
        |  SELECT
        |    CAST(round(ln(CAST(0.95 AS DOUBLE)
        |      / (CAST(a1 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT) AS w1y,
        |    CAST(round(ln(CAST(0.05 AS DOUBLE)
        |      / (1.0e0 - CAST(a1 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT) AS w1n,
        |    CAST(round(ln(CAST(0.9 AS DOUBLE)
        |      / (CAST(a2 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT) AS w2y,
        |    CAST(round(ln(CAST(0.1 AS DOUBLE)
        |      / (1.0e0 - CAST(a2 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT) AS w2n,
        |    CAST(round(ln(CAST(0.97 AS DOUBLE)
        |      / (CAST(a3 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT) AS w3y,
        |    CAST(round(ln(CAST(0.03 AS DOUBLE)
        |      / (1.0e0 - CAST(a3 + 1 AS DOUBLE) / CAST(n + 2 AS DOUBLE))) * 1e6) AS BIGINT) AS w3n
        |  FROM u)
        |SELECT id_a, id_b, CAST(g1 AS BIGINT) AS g1, CAST(g2 AS BIGINT) AS g2,
        |  CAST(g3 AS BIGINT) AS g3,
        |  CAST(CASE WHEN g1 = 1 THEN w1y ELSE w1n END
        |     + CASE WHEN g2 = 1 THEN w2y ELSE w2n END
        |     + CASE WHEN g3 = 1 THEN w3y ELSE w3n END AS BIGINT) AS score_micro,
        |  CASE WHEN CASE WHEN g1 = 1 THEN w1y ELSE w1n END
        |          + CASE WHEN g2 = 1 THEN w2y ELSE w2n END
        |          + CASE WHEN g3 = 1 THEN w3y ELSE w3n END >= w1y + w2y + w3y
        |       THEN 'link' ELSE 'review' END AS decision
        |FROM pr, w
        |WHERE CASE WHEN g1 = 1 THEN w1y ELSE w1n END
        |    + CASE WHEN g2 = 1 THEN w2y ELSE w2n END
        |    + CASE WHEN g3 = 1 THEN w3y ELSE w3n END > 0
        |ORDER BY id_a, id_b""".stripMargin,
    // d3's portable polynomial token hashes let DuckDB rebuild the
    // 60-bit sketch exactly: fold (acc*base+codepoint) % prime per
    // token (ord() per split character below — both engines fold
    // Unicode code points, so non-ASCII corpora agree too),
    // majority-vote each bit, band, bucket-join, Hamming-filter —
    // the same pipeline, hash-compared end to end
    "d3_dedup_simhash" -> d3OracleSql,
    "d4_ngram_jaccard" -> jaccardOracle(2, langBlocked = true, extraCols = ", lang"),
    // same ground-truth shape at n=5 — the sparse-vocabulary regime
    // where the Spark side uses the postings co-occurrence join
    "d13_inverted_jaccard" ->
      jaccardOracle(5, langBlocked = true, extraCols = ", lang", dfCap = Some(D13DfCap)),
    // asymmetric min-denominator containment over the same 2-gram
    // string shingles d4 uses (hash↔string equality up to negligible
    // 64-bit collisions, same as d4)
    "d12_containment" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, lang,
        |    list_distinct([t[i] || ' ' || t[i + 1]
        |      FOR i IN range(1, len(t))]) AS shingles
        |  FROM tok WHERE len(t) >= 2),
        |ex AS (SELECT doc_id, lang, unnest(shingles) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang AS lang,
        |    count(*) AS shared
        |  FROM ex a JOIN ex b
        |    ON a.s = b.s AND a.doc_id < b.doc_id AND a.lang = b.lang
        |  GROUP BY a.doc_id, b.doc_id, a.lang),
        |sizes AS (SELECT doc_id, len(shingles) AS n FROM sh)
        |SELECT id_a, id_b, lang,
        |  round(shared::DOUBLE / least(sa.n, sb.n), 4) AS containment
        |FROM pairs JOIN sizes sa ON id_a = sa.doc_id
        |           JOIN sizes sb ON id_b = sb.doc_id
        |WHERE shared::DOUBLE / least(sa.n, sb.n) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "d5_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM e)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_inner_product(a.v, b.v) / (a.norm * b.norm), 4) AS cosine
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(a.v, b.v) / (a.norm * b.norm) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    // d10's oracle is the GROUND-TRUTH exhaustive join over the same
    // deterministically augmented corpus — LSH output equals it
    // because every qualifying pair sits at cosine ≈0.99875 where the
    // 16-table miss probability is ~8e-13 (see the operator scaladoc).
    // DuckDB's list_transform lambda index is 1-based (Spark's
    // transform is 0-based), hence i % 2 = 1 here vs i % 2 === 0 there.
    "d10_embed_neardup_lsh" ->
      """WITH e AS (
        |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |         CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |aug AS (
        |  SELECT vec_id, v FROM e
        |  UNION ALL
        |  SELECT vec_id + 1000000,
        |    list_transform(v, (x, i) ->
        |      x * (CASE WHEN i % 2 = 1 THEN 1.05 ELSE 0.95 END))
        |  FROM e),
        |n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS norm FROM aug)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_inner_product(a.v, b.v) / (a.norm * b.norm), 4) AS cosine
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(a.v, b.v) / (a.norm * b.norm) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin
  )
}
