import java.nio.file.{Files, Paths}
val sf = "/root/testdata/sf0.001"
val targets: Seq[(String, String, org.apache.spark.sql.DataFrame)] = Seq(
  ("q02_filter_project", "predicates + 6-column pruning reach the parquet scan (PushedFilters / ReadSchema)",
    graft.ops.Relational.q02FilterProject(spark, sf)),
  ("q03_revenue_by_nation", "star join: lineitem pre-aggregated BELOW the join; dims broadcast",
    graft.ops.Relational.q03RevenueByNation(spark, sf)),
  ("q27_supplier_volume", "six-table TPC-H Q5 star: one fact shuffle, everything else broadcast",
    graft.ops.Relational.q27SupplierVolume(spark, sf)),
  ("q44_custom_topk", "custom TopKPerKeyExec: ClusteredDistribution -> ONE exchange, NO sort",
    graft.ops.Relational.q44CustomTopK(spark, sf)),
  ("q63_asof_custom", "custom AsOfJoinExec: co-partitioned sorted merge, one buffered row",
    graft.ops.Relational.q63AsofCustom(spark, sf)),
  ("q70_equidepth_bins", "bounded-state deciles: ONE lineitem scan reused by all three consumers (ReusedExchange)",
    graft.ops.Relational.q70EquidepthBins(spark, sf)),
  ("q77_merge_upsert", "MERGE shape: per-side dedup windows ride the full outer join's own key partitioning",
    graft.ops.Relational.q77MergeUpsert(spark, sf)),
  ("q84_returned_item_ranking", "TopN after aggregation: TakeOrderedAndProject, no global sort",
    graft.ops.Relational.q84ReturnedItemRanking(spark, sf)),
  ("d2_dedup_minhash", "MinHash LSH: native one-pass signatures, band-key equi-join candidates, exact verify",
    graft.ops.Dedup.d2MinHashLsh(spark, sf)),
  ("s2_knn_lsh", "LSH kNN: fused native bucket kernel, scoring BEFORE the narrow q_id exchange",
    graft.ops.Similarity.s2KnnLsh(spark, sf)),
  ("q90_pagerank_trade", "iterative fixed-point PageRank: per-round edge shuffle over two checkpointed inputs, node side broadcast",
    graft.ops.Relational.q90PagerankTrade(spark, sf)),
  ("d14_semantic_dedup", "SemDeDup: K-row broadcast argmax assignment, within-cell self-join bounded by cluster sizes",
    graft.ops.Dedup.d14SemanticDedup(spark, sf)),
  ("p7_sequence_packing", "shard-local packing windows: no global sort, one window exchange on (lang, shard)",
    graft.ops.Corpus.p7SequencePacking(spark, sf)),
  ("q93_co_occurrence", "basket-blocked pair join, UNHINTED part-count joins (AQE decides), 1-row basket total broadcast",
    graft.ops.Relational.q93CoOccurrence(spark, sf)),
  ("q94_min_cost_supplier", "TPC-H Q2 shape: correlated scalar MIN decorrelated to one aggregate-join + TakeOrderedAndProject",
    graft.ops.Relational.q94MinCostSupplier(spark, sf)),
  ("q95_dominant_supplier", "TPC-H Q20 shape: nested IN chain as LeftSemi pair, correlated threshold as aggregate-join",
    graft.ops.Relational.q95DominantSupplier(spark, sf)),
  ("q97_pagerank_adaptive", "convergence-detected PageRank: per-round delta rides the checkpointed row (d6 pattern)",
    graft.ops.Relational.q97PagerankAdaptive(spark, sf)),
  ("s10_kmeans_train", "Lloyd's k-means: K-row broadcast E-step, map-side-combined VectorMean M-step, per-round checkpoint",
    graft.ops.Similarity.s10KmeansTrain(spark, sf)),
  ("p8_neardup_admission", "incremental admission: corpus reduces to fingerprint set + band table; shard probes both",
    graft.ops.Corpus.p8NearDupAdmission(spark, sf)),
  ("d15_semantic_dedup_soft", "SemDeDup top-2 soft assignment: crn <= 2 cells per vector, DISTINCT pair collapse",
    graft.ops.Dedup.d15SemanticDedupSoft(spark, sf)),
  ("q98_sole_fault_supplier", "TPC-H Q21 shape: EXISTS + NOT EXISTS on one fact as LeftSemi + LeftAnti, orderkey co-partitioned",
    graft.ops.Relational.q98SoleFaultSupplier(spark, sf)),
  ("q99_supplier_variety_distinct", "TPC-H Q16 shape: two-phase DISTINCT count + null-aware anti join for NOT IN",
    graft.ops.Relational.q99SupplierVariety(spark, sf)),
  ("s11_ivf_trained_search", "trained-IVF search: s10 codebook broadcast into assignment + probe, cell equi-join candidates",
    graft.ops.Similarity.s11IvfTrainedSearch(spark, sf)),
  ("t16_pmi_collocations", "PMI collocations: one bigram exchange, unigram joins unhinted (AQE), 1-row N broadcast",
    graft.ops.TextAnalysis.t16PmiCollocations(spark, sf)),
  ("q100_join_ivm", "incremental join maintenance: four orderkey-keyed delta joins + one-shot, identity checked in-plan",
    graft.ops.Relational.q100JoinIvm(spark, sf)),
  ("q101_agg_ivm", "incremental aggregate maintenance: signed (count,sum) partials merged on the group key, zero-count groups dropped",
    graft.ops.Relational.q101AggIvm(spark, sf)),
  ("q102_cdc_apply", "CDC log compaction: ONE combine-enabled max_by per key (no window), anti-join base, survivors union in",
    graft.ops.Relational.q102CdcApply(spark, sf)),
  ("q103_knn_triangles", "kNN-sparsified triangle census: top-k window over the pair aggregate, oriented 2-path + closing-edge join",
    graft.ops.Relational.q103KnnTriangles(spark, sf)),
  ("t17_trigram_backoff_lm", "stupid backoff: ONE per-doc trigram exchange (checkpoint), vocabulary-sized model joins unhinted",
    graft.ops.TextAnalysis.t17TrigramBackoffLm(spark, sf)),
  ("d16_density_clusters", "DBSCAN roles over the near-dup graph: degree stats ride the mirrored edge checkpoint, CC over core-core edges only",
    graft.ops.Dedup.d16DensityClusters(spark, sf)),
  ("p9_temperature_mix", "temperature mixing: catalog-sized stats broadcast, md5-ranked per-source selection window",
    graft.ops.Corpus.p9TemperatureMix(spark, sf)),
  ("q104_skyline", "skyline: ONE windowed sort-scan over the deduped point set (oracle runs the quadratic dominance join)",
    graft.ops.Relational.q104Skyline(spark, sf)),
  ("p10_priority_sample", "priority sampling: scan-side integer-exact priorities, top-k as TakeOrderedAndProject",
    graft.ops.Corpus.p10PrioritySample(spark, sf)),
  ("q105_session_paths", "session paths: ONE user shuffle — the path aggregate rides the window's partitioning (subset clustering)",
    graft.ops.Relational.q105SessionPaths(spark, sf)),
  ("q106_kmv_set_algebra", "sketch set algebra: 5·k-row sketches merge by array union; only the EXACT columns touch pair data",
    graft.ops.Relational.q106KmvSetAlgebra(spark, sf)),
  ("d17_sorted_neighborhood", "sorted-neighborhood: lead-column candidates in one prefix-blocked window, no rank self-join",
    graft.ops.Dedup.d17SortedNeighborhood(spark, sf)),
  ("m9_chunk_dedup_ratio", "chunk dedup pricing: (source, fp) rollup of 16-byte keys, payloads read once",
    graft.ops.Multimodal.m9ChunkDedupRatio(spark, sf)),
  ("q107_knn_hub_trim", "hub-trimmed kNN census: mutual-cap incidence window bounds max degree at 2k BEFORE the triangle join",
    graft.ops.Relational.q107KnnHubTrim(spark, sf)),
  ("d19_sorted_neighborhood_multipass", "two-pass sorted neighborhood: forward + reversed-key windows union candidates, one shared verify",
    graft.ops.Dedup.d19SortedNeighborhoodMultipass(spark, sf)),
  ("q108_zorder_scan", "z-order rewrite + 2-D range read: one curve-sorted exchange at write, row-group stats prune the scan",
    graft.ops.Layout.q108ZorderScan(spark, sf)),
  ("q112_hll_distinct", "HLL sketch: distinct pairs then register-max partial+final aggregates -- exchange bounded at groups x 128 rows at ANY cardinality",
    graft.ops.Relational.q112HllDistinct(spark, sf)),
  ("q113_ewma_recency", "dyadic EWMA: one (user,day) aggregate, 1-row max-day broadcast, 16-row-bounded per-user window",
    graft.ops.Relational.q113EwmaRecency(spark, sf)),
  ("q115_changepoint", "changepoint argmax: ONE ordered window pass builds all prefix sums; |types|-row totals broadcast",
    graft.ops.Relational.q115Changepoint(spark, sf)),
  ("q116_clustering_coeff", "clustering coefficient: checkpointed kNN edges reused by 3 triangle sides AND the degree rollup",
    graft.ops.Relational.q116ClusteringCoeff(spark, sf)),
  ("s12_knn_classify", "kNN classify: bounded query set broadcast, per-partition top-k heaps, node-sized vote aggregate",
    graft.ops.Similarity.s12KnnClassify(spark, sf)),
  ("t19_kl_divergence", "KL vs corpus: ONE (doc,term) exchange shared by rollup and per-doc join; vocab table AQE-broadcast",
    graft.ops.TextAnalysis.t19KlDivergence(spark, sf)),
  ("t20_zipf_slope", "Zipf OLS: vocabulary-sized term table, WindowGroupLimit-pruned top-100, |langs|-row aggregate",
    graft.ops.TextAnalysis.t20ZipfSlope(spark, sf))
)
val sb = new StringBuilder
sb.append("# PLANS -- executed physical plans of headline queries\n\n")
sb.append("Each query is executed (collect on its own QueryExecution) before the\n")
sb.append("dump, so AdaptiveSparkPlan reflects runtime decisions where Spark\n")
sb.append("finalizes the printed tree (isFinalPlan=true on simple plans); complex\n")
sb.append("plans print their static form, in which exchange-reuse nodes\n")
sb.append("(ReusedExchange) are already visible. Dumped at sf0.001 -- plan SHAPE\n")
sb.append("is scale-independent.\n")
sb.append("What to look for is noted per query. Regenerate with tools/dump_plans.sh.\n")
for ((name, note, df) <- targets) {
  sb.append(s"\n## $name\n\n_${note}_\n\n```\n")
  df.collect() // execute THIS df's own QueryExecution so AQE finalizes it
  val out = new java.io.ByteArrayOutputStream()
  Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
  sb.append(out.toString.trim.take(12000))
  sb.append("\n```\n")
}
Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
println("WROTE " + sb.length)
