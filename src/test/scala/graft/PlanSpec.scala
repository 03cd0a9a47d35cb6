package graft

/** Physical-plan assertions — the scale contract (SURVEY §4 / the 100 TB
  * design rules): filters and column pruning reach the parquet scan, small
  * dims broadcast, sort+limit plans TakeOrdered, rank-filter plans the
  * window-group-limit pushdown, aggregation is two-phase. Golden-plan
  * analog of the reference's 183 plan-XML tests, scoped to what we rely on. */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
  }

  test("q1: aggregation is two-phase (partial + final HashAggregate)") {
    val p = plan("q1_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("q_calc: unused columns pruned from the scan") {
    val p = plan("q_calc")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("l_partkey") && !readSchema.contains("l_tax"))
  }

  test("q_join_inner_bcast: small dims are broadcast, not shuffled") {
    val p = plan("q_join_inner_bcast")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q_sort_limit: plans TakeOrderedAndProject (per-partition top-K)") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q_topn_per_group: rank filter pushes a group limit below the shuffle") {
    // Spark's WindowGroupLimit: only the per-partition top-N rows reach the
    // window sort — the difference between shuffling N rows and the world.
    assert(plan("q_topn_per_group").contains("WindowGroupLimit"))
  }

  test("q_join_theta: equi+residual join does NOT plan a nested-loop cartesian") {
    val p = plan("q_join_theta")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_pipe_ann_brute: query side broadcast against corpus scan") {
    assert(plan("q_pipe_ann_brute").contains("BroadcastNestedLoopJoin") ||
      plan("q_pipe_ann_brute").contains("BroadcastHashJoin"))
  }

  test("q_pipe_simhash: banded join — NO all-pairs cartesian in the plan") {
    // the round-1 scale hole: pair generation must go through the
    // (band, band-value) bucket join, never an all-pairs product
    Seq("q_pipe_simhash", "q_pipe_simhash_k3").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q plans an all-pairs join")
    }
  }

  test("q_pipe_jaccard: no InMemoryTableScan (cache) in the query path") {
    val p = plan("q_pipe_jaccard")
    assert(!p.contains("InMemoryTableScan"), "jaccard re-grew a cache dependency")
  }

  test("q_ds_multijoin: dims broadcast; selective filters pushed to scans") {
    val p = plan("q_ds_multijoin")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("PushedFilters") && p.contains("p_size"))
  }

  test("q_tpch_q6: every predicate reaches the lineitem scan") {
    val p = plan("q_tpch_q6")
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_shipdate") && pushed.contains("l_discount") &&
      pushed.contains("l_quantity"))
  }

  test("q_pipe_ann_ivf: centroid table broadcast; probed-list join is hash, not cartesian") {
    val p = plan("q_pipe_ann_ivf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid assignment should broadcast the 8-row centroid table")
    // the probe→list lookup is an equi-join on the centroid id
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      "BroadcastHashJoin".r.findAllIn(p).size >= 1)
    assert(!p.contains("CartesianProduct"), "IVF probe must never scan the whole corpus")
  }

  test("q_pipe_dedup_cosine: bucket join only — no all-pairs product") {
    val p = plan("q_pipe_dedup_cosine")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cosine dedup must pair via LSH buckets, not all-pairs")
  }

  test("q_pipe_sample: single-pass — one scan, no joins") {
    val p = plan("q_pipe_sample")
    assert(!p.contains("Join"), "sampling must not join")
    assert("FileScan|Scan parquet".r.findAllIn(p).size <= 2)
  }

  test("q_ds_exists_chain: correlated EXISTS/NOT EXISTS become semi and anti joins") {
    val p = plan("q_ds_exists_chain")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
  }

  test("q_pipe_mix: per-source rate table broadcasts back onto the corpus") {
    val p = plan("q_pipe_mix")
    assert(p.contains("BroadcastHashJoin"), "the tiny rates frame must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_pipe_pack and q_pipe_quantize: map-side only — no joins") {
    // packing = one window per shard stripe; quantization = pure projection
    assert(!plan("q_pipe_pack").contains("Join"), "packing must not join")
    assert(!plan("q_pipe_quantize").contains("Join"), "quantization must not join")
  }

  test("q_pipe_tfidf: doc-count is a 1-row broadcast, never a shuffled cartesian") {
    val p = plan("q_pipe_tfidf")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q_ds_lateral_topn: LATERAL LIMIT decorrelates — no per-row re-execution") {
    val p = plan("q_ds_lateral_topn")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      "expected the decorrelated rank/limit shape")
  }

  test("q_ds_multi_distinct: multiple COUNT(DISTINCT) plan one Expand, not re-scans") {
    val p = plan("q_ds_multi_distinct")
    assert(p.contains("Expand"))
    assert("Scan parquet|FileScan".r.findAllIn(p).size <= 3, "each table scanned once")
  }

  test("q_ds_multi_supplier_wait: correlated EXISTS chain plans semi+anti joins, no cartesian") {
    val p = plan("q_ds_multi_supplier_wait")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), "expected decorrelated semi+anti")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_ds_ship_lag: date-offset residual keeps a hash/merge equi-join") {
    val p = plan("q_ds_ship_lag")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_pipe_contain_dedup: containment candidates come from the prefix-bucket equi-join") {
    val p = plan("q_pipe_contain_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "containment check must never scan all pairs")
  }

  test("q_pipe_normalize and q_pipe_url_dedup: map-side except the keep-first window") {
    assert(!plan("q_pipe_normalize").contains("Join"), "normalization is map-side only")
    val u = plan("q_pipe_url_dedup")
    assert(!u.contains("Join") && u.contains("Window"), "url dedup = one window, no joins")
  }

  test("q_tpch_q19: OR-of-ANDs keeps the partkey equi-join — no cartesian") {
    val p = plan("q_tpch_q19")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_tpch_q21: EXISTS/NOT EXISTS chain plans semi + anti joins") {
    val p = plan("q_tpch_q21")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
  }

  test("q_tpch_q17: correlated-average filter decorrelates to one grouped join, no per-row subquery") {
    val p = plan("q_tpch_q17")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_sql_temporal_join: FOR SYSTEM_TIME AS OF rewrite keeps the keyed top-1 + broadcast shape") {
    // the rewrite's documented contract (EngineEnv.rewriteTemporalJoin):
    // latest-version lookup = rank-filtered (WindowGroupLimit) domain join,
    // equi-joined back — never a decorrelated nested-loop domain join
    val p = plan("q_sql_temporal_join")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), "rank-filtered version lookup missing")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "temporal join must stay keyed — nested-loop domain join is the 100x-slower shape")
  }

  test("q_ds_time_bands_cross: eight 1-row aggregates — cross joins only on single-row sides") {
    val p = plan("q_ds_time_bands_cross")
    // every band aggregates to one row; the 1x1 combination is nested-loop by
    // construction and that is the CORRECT plan (never a row-level cartesian)
    assert("HashAggregate".r.findAllIn(p).size >= 8)
  }

  test("inventory family: dims broadcast onto the derived stock relation, no cartesian") {
    Seq("q_ds_inv_before_after", "q_ds_inv_daterange_in", "q_ds_inv_date_offset").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: part/supplier dims must broadcast")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: the date-band/offset residual must ride the keyed equi-join")
    }
  }

  test("CDC parsing is one generator over a map-only stage — no join, no shuffle before it") {
    val p = plan("q_cdc_debezium")
    assert(p.contains("Generate"), "explode of the variant array must be a Generate")
    assert(!p.contains("CartesianProduct") && !"SortMergeJoin".r.findFirstIn(p).isDefined,
      "wire-format parsing must stay map-side")
  }

  test("q_ds_lineage_chain: aggregate-first lineage — partial aggs, broadcast dims, no cartesian") {
    val p = plan("q_ds_lineage_chain")
    // each lineage step pre-aggregates before the pair join: partial+final
    // HashAggregates (map-side combine) on every fact scan
    assert("HashAggregate".r.findAllIn(p).size >= 6,
      "three lineage steps must each plan two-phase aggregation")
    // supplier/nation dims broadcast; the (ck, sk) pair joins are equi
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the date-ordering residuals must ride the equi joins, never a loop join")
  }

  test("q_pipe_semdedup: cluster-keyed pair join — no corpus-wide cartesian") {
    // SemDeDup's candidate set must be bounded by the cluster assignment:
    // the only cross product allowed is the broadcast×centroids assignment
    // (8 rows); the PAIR join must ride the cid equi-key
    val p = plan("q_pipe_semdedup")
    assert(!p.contains("CartesianProduct"), "semdedup pair join degenerated to all-pairs")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "cluster-keyed pair join missing")
  }

  test("q_pipe_gopher_gate: map-side only — no join, no aggregate exchange") {
    val p = plan("q_pipe_gopher_gate")
    assert(!"Join".r.findFirstIn(p).isDefined, "the rule gate must not join")
    assert(!p.contains("HashAggregate"), "the rule gate must not aggregate")
  }

  test("temporal table function plans the KEYED as-of join — no loop join, rank-limited") {
    // the temporal-fn correlate must land on the same keyed plan as
    // FOR SYSTEM_TIME AS OF: equi joins + a windowed top-1 version pick;
    // a decorrelated LATERAL would plan a nested-loop domain join
    // (measured 100× slower at sf0.1 — EngineEnv.rewriteTemporalJoin doc)
    val p = plan("q_sql_temporal_fn")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "temporal table function decorrelated into a loop join")
    assert(p.contains("Window"), "latest-version pick must be a windowed rank filter")
  }

  test("q_pipe_dsir: the 64-bucket weight table broadcasts onto the feature stream") {
    // the corpus-side scoring join must be a broadcast of the bounded
    // model table — a shuffle join here would re-shuffle the full corpus
    // per scoring pass at 100 TB
    val p = plan("q_pipe_dsir")
    assert(p.contains("BroadcastHashJoin"), "feature-weight join must broadcast the 64-row table")
    assert(!p.contains("CartesianProduct"), "no cartesian in the scoring pass")
  }

  test("q_pipe_ccnet_bucket: the reference-vocab LM broadcasts onto the token stream") {
    val p = plan("q_pipe_ccnet_bucket")
    assert(p.contains("BroadcastHashJoin"), "LM scoring join must broadcast the vocab table")
    assert(!p.contains("CartesianProduct"), "no cartesian in the scoring pass")
  }

  test("q_pipe_e2e_c4: the composite pipeline never degenerates to all-pairs") {
    // the fuzzy stage's candidate join must ride the (band, bkey) equi key
    // and the funnel audit must be ONE aggregation pass (single explode),
    // not a re-aggregation per stage
    val p = plan("q_pipe_e2e_c4")
    assert(!p.contains("CartesianProduct"), "LSH band join degenerated to all-pairs")
    assert(!p.contains("Union"), "funnel audit must be one pass, not unioned re-aggregations")
  }

  test("q_pipe_span_dedup: inverted-index join on the shingle hash — never pairwise") {
    // the suffix-array analog must stay linear: shingle-hash agg + equi
    // join + per-doc window; a cartesian or loop join here is |corpus|²
    val p = plan("q_pipe_span_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span-dedup must join on the shingle hash, not compare documents pairwise")
    assert(p.contains("Window"), "interval merge must be the per-doc window pass")
  }

  test("q_pipe_bloom_dedup: bloom gate filters BEFORE the exact-confirm join") {
    // the scalar bloom probe must sit under the join so only might-contain
    // candidates are shuffled; the exact join keeps the output fpp-free
    val p = plan("q_pipe_bloom_dedup")
    assert(p.contains("UDF"), "bloom might-contain gate missing from the candidate filter")
    assert(!p.contains("CartesianProduct"), "no cartesian in the confirm join")
  }

  test("q_pipe_bpe_train: merge rounds are vocab-table passes — no joins at all") {
    val p = plan("q_pipe_bpe_train")
    assert(!p.contains("Join"), "BPE training must reduce to word-dict aggregates, never a join")
  }

  test("q_pipe_ann_pq: codebook and query distance tables broadcast; ADC scan is hash, not cartesian") {
    // after encoding, the corpus side carries only (sub, code) — the ADC
    // join must ride the broadcast distance table; a cartesian or
    // shuffle of full vectors would undo PQ's compression win
    val p = plan("q_pipe_ann_pq")
    assert(p.contains("BroadcastHashJoin"), "ADC join must broadcast the query distance table")
    assert(!p.contains("CartesianProduct"), "no all-pairs product in the ADC scan")
  }

  test("q_pipe_ppjoin: prefix-filtered candidates — hash joins only, never all-pairs") {
    // the PPJoin shape: prefix window + equi joins; a cartesian or
    // loop join would mean the prefix filter stopped gating candidates
    val p = plan("q_pipe_ppjoin")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must ride the prefix-token equi key")
    assert(p.contains("Window"), "rarest-first prefix selection is the window pass")
  }

  test("q_pipe_kmeans: centroids broadcast; assignment is map-side over one corpus scan") {
    val p = plan("q_pipe_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "k×corpus assignment must broadcast the k-row centroid table")
    assert(!p.contains("CartesianProduct"), "no shuffled cartesian in assignment")
    assert(!p.contains("SortMergeJoin"), "nothing in the loop may shuffle-join the corpus")
  }

  test("q_pipe_bm25: query terms broadcast onto the postings; never query×corpus") {
    val p = plan("q_pipe_bm25")
    assert(!p.contains("CartesianProduct"), "BM25 scoring degenerated to all-pairs")
    assert(p.contains("BroadcastHashJoin"), "query-term/df/stat tables must broadcast")
  }

  test("q_pipe_bm25: ONE corpus-text scan — df/dl/tot all derive from the tf exchange") {
    // r15 scan census: dl/st re-read text and dfq re-ran the corpus
    // explode+aggregate until every statistic was derived from tf with
    // byte-identical consumer subtrees (see the query's scaladoc).
    // Two scans exactly: the text explode pass + the dedicated n_docs
    // count (zero data columns — NULL-text docs must count toward N but
    // never appear in postings; the hostile leg caught the sum(tf)
    // shortcut that merged the two).
    val df = SparkEntry.queries("q_pipe_bm25")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(fin).length
    assert(scans == 2, s"expected text-explode scan + n_docs count scan, got $scans:\n$fin")
    assert(fin.contains("ReusedExchange"), s"tf's shuffle must be reused:\n$fin")
  }

  test("q_pipe_hll_rollup: the register aggregate (the stored sketch) computes once") {
    // per-source estimate and merged-ALL estimate read the same
    // (source, bin) -> max(rho) exchange; only the two exact-baseline
    // countDistinct passes scan lineitem again (the deliberate contrast)
    val df = SparkEntry.queries("q_pipe_hll_rollup")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(fin).length
    assert(scans <= 3, s"expected <=3 lineitem scans (sketch + 2 exact baselines), got $scans:\n$fin")
    assert(fin.contains("ReusedExchange"), s"the register exchange must be reused:\n$fin")
  }

  test("q_pipe_rag_e2e: query embeddings broadcast; chunk embedding is scan-shaped") {
    val p = plan("q_pipe_rag_e2e")
    assert(!p.contains("CartesianProduct"), "RAG scoring degenerated to all-pairs")
    assert(p.contains("BroadcastHashJoin"), "query-embedding side must broadcast")
    assert(!p.contains("SortMergeJoin"), "no corpus-sized shuffle join in the scoring path")
  }

  test("q_pipe_winnow / q_pipe_chunk: map-side passes — chunking never joins") {
    val pw = plan("q_pipe_winnow")
    assert(!"Join".r.findFirstIn(pw).isDefined, "winnowing must not join")
    val pc = plan("q_pipe_chunk")
    assert(!"Join".r.findFirstIn(pc).isDefined && !pc.contains("HashAggregate"),
      "chunk generation must stay a map-only pass")
  }

  test("ZOrder.zorderBy: range-partitioned on the z-value, sorted inside partitions") {
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sfDir, "orders")
      .withColumn("x", (col("o_custkey") % 1024).cast("long"))
      .withColumn("y", (col("o_orderkey") % 1024).cast("long"))
    val p = graft.operators.ZOrder.zorderBy(df, col("x"), col("y"), 10, 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
      s"zorderBy must range-partition on the z-value so files cover disjoint z-ranges:\n$p")
    assert(p.contains("Sort"), "zorderBy must sort within partitions for tight row groups")
    assert(!"Join".r.findFirstIn(p).isDefined && !p.contains("Exchange hashpartitioning"),
      "layout pass is one range exchange — no joins, no extra hash shuffle")
  }

  test("q_pipe_zorder_layout: layout audit is one hash agg over a scan — no global sort") {
    val p = plan("q_pipe_zorder_layout")
    assert(!"Join".r.findFirstIn(p).isDefined, "bucket audit must not join")
    assert(!p.contains("Window"),
      "bucket = z >> 14 is computed per-row; the audit needs no global row-numbering window")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "two-phase agg expected")
  }

  test("q_join_band_keyless: binned band join is a hash equi join — never nested-loop") {
    val p = plan("q_join_band_keyless")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"keyless band must bin into an equi join, not O(n*m) nested loop:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "expected an equi join on the bin id")
  }

  test("q_pipe_quantile_2pass: no full-relation sort — window is bin-partitioned") {
    val p = plan("q_pipe_quantile_2pass")
    assert(p.contains("Window") && p.contains("partitionBy" ) || p.contains("windowspecdefinition"),
      "expected the in-bin row_number window")
    // the only rangepartitioning allowed is the final 3-row orderBy; the
    // candidate path must be hash-partitioned by bin
    assert("rangepartitioning".r.findAllIn(p).size <= 1,
      s"two-pass quantile must not globally sort the relation:\n$p")
    assert(p.contains("BroadcastHashJoin"), "3-row target table must broadcast")
  }

  test("q_datastream_sliding: window expansion is one keyed exchange, no join") {
    val p = plan("q_datastream_sliding")
    assert(!"Join".r.findFirstIn(p).isDefined, "sliding assigner is a flatMap, not a join")
  }

  test("q_pipe_dedup_edit: candidate pairs via LSH band equi join, never all-pairs") {
    val p = plan("q_pipe_dedup_edit")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edit-distance verify must run on LSH-bucketed candidates only:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      "expected an equi join on the MinHash (band, bkey) signature")
  }

  test("q_pipe_incremental_dedup: delta dedups against the corpus band INDEX, never all-pairs") {
    val p = plan("q_pipe_incremental_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"delta×corpus must be a (band, bkey) equi join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"))
  }

  test("q_pipe_minhash_calibration: exact-Jaccard side is candidate-bounded equi joins only") {
    val p = plan("q_pipe_minhash_calibration")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"calibration must never scan all doc pairs:\n$p")
  }

  test("q_pipe_weighted_sample: unit explode + hash agg + TakeOrdered — no global sort, no join") {
    val p = plan("q_pipe_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "top-25 must plan per-partition top-K, not a full orderBy")
    assert(p.contains("Generate"), "unit replication must be an in-plan explode")
    assert(!"Join".r.findFirstIn(p).isDefined, "weighted sampling needs no join")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "per-doc max unit key must have a map-side partial")
  }

  test("q_pipe_gap_fill: day spine generated in-plan, joined on equi keys") {
    val p = plan("q_pipe_gap_fill")
    assert(p.contains("Generate"), "spine must come from sequence+explode inside the plan")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "spine join must be an equi join on (event_type, day)")
  }

  test("q_pipe_cohort: two hash aggs + user_id equi join — no cartesian, no window") {
    val p = plan("q_pipe_cohort")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "cohort min + cell agg both two-phase")
  }

  test("q_window_session_capped: pure window chain + hash agg — no join anywhere") {
    val p = plan("q_window_session_capped")
    assert(!"Join".r.findFirstIn(p).isDefined,
      "gap+cap sessionization is windows over one keyed exchange, not a self-join")
  }

  test("graph family: no cartesian products in any new round-7 plan") {
    // BNLJ appears only as the 1-row scalar-broadcast crossJoin idiom in
    // these plans (summary rows), never a data-sized product — the hard
    // no-go is CartesianProduct
    Seq("q_graph_transforms", "q_graph_bipartite", "q_graph_dir_lcc",
        "q_graph_dir_census", "q_graph_edge_metrics", "q_graph_generators")
      .foreach { q =>
        assert(!plan(q).contains("CartesianProduct"),
          s"$q must never plan a data-sized cartesian")
      }
  }

  test("q_graph_bipartite: projections are shared-vertex equi-joins") {
    val p = plan("q_graph_bipartite")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_tpcds_v77: scalar crosses EXECUTE as broadcasts; only the dimension cross remains") {
    // q77's official text carries four no-condition joins: three
    // `cross join (select sum(..))` scalar (1-row keyless aggregate)
    // crosses, and the cs×cr cross of two PER-CALL-CENTER aggregates.
    // Without ScalarCrossBroadcast all four planned CartesianProduct and
    // AQE never revisited them (AQE re-plans only exchange-backed joins).
    // The rule converts every provably-1-row side to the scalar-broadcast
    // BNLJ idiom; the one remaining cartesian is the agg×agg dimension
    // cross, bounded by the call-center dimension on BOTH sides (~tens of
    // rows at any scale factor) — assert on the EXECUTED plan.
    val df = SparkEntry.queries("q_tpcds_v77")(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    val cartesians = "CartesianProduct".r.findAllIn(fin).length
    assert(cartesians <= 1, s"only the bounded agg×agg cross may remain, saw $cartesians")
    assert("BroadcastNestedLoopJoin".r.findAllIn(fin).length >= 3,
      "the three scalar crosses must broadcast their single-row aggregate sides")
  }
}
