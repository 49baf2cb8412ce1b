package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Plan-shape regression gate: the physical plans of representative
  * catalog queries must keep their shuffle/broadcast/pushdown structure.
  * A future edit that silently turns a broadcast join into a shuffle
  * join, drops a filter below a scan, or adds an exchange fails HERE,
  * not in a 100 TB deployment. Counts are from the pre-AQE physical
  * plan (the static contract; AQE may only improve on it at runtime).
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private case class Shape(hash: Int, bcast: Int, pushed: Int)

  private def shape(q: String): Shape = {
    val plan = SparkEntry.queries(q)(spark, sf)
      .queryExecution.executedPlan.toString
    Shape(
      "Exchange hashpartitioning".r.findAllIn(plan).size,
      "BroadcastExchange".r.findAllIn(plan).size,
      "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size)
  }

  test("q1_agg: one hash exchange (partial+final aggregate)") {
    val s = shape("q1_agg")
    assert(s.hash == 1 && s.bcast == 0, s)
  }

  test("q2_filter_project: zero shuffles, filter pushed to the scan") {
    val s = shape("q2_filter_project")
    assert(s.hash == 0 && s.pushed >= 1, s)
  }

  test("q3_lookup_enrich: lookup joins broadcast (no shuffled join sides)") {
    val s = shape("q3_lookup_enrich")
    // the first-win dedup window shuffles the (small) lookup side; the
    // enrichment joins themselves must broadcast
    assert(s.bcast == 2 && s.hash <= 2, s)
  }

  test("q4_join_inner_agg: both dims broadcast, one agg exchange") {
    val s = shape("q4_join_inner_agg")
    assert(s.bcast == 2 && s.hash == 1 && s.pushed >= 2, s)
  }

  test("q7_semi_join: broadcast semi join, zero hash exchanges") {
    val s = shape("q7_semi_join")
    assert(s.hash == 0 && s.bcast == 1, s)
  }

  test("q15_topk_per_group: single shuffle feeds the ranking window") {
    val s = shape("q15_topk_per_group")
    assert(s.hash == 1, s)
  }

  test("q53_scd2_build: two exchanges total (tiebreak + shared key window)") {
    val s = shape("q53_scd2_build")
    assert(s.hash == 2, s)
  }

  test("q57_hash_sample: one exchange (partial+final stratified counts)") {
    val s = shape("q57_hash_sample")
    assert(s.hash == 1 && s.bcast == 0, s)
  }

  test("q60_tpch3: dims broadcast; wide shuffle only on the fact join + agg") {
    val s = shape("q60_tpch3")
    // customer segment broadcasts into orders (at sf0.001 the filtered
    // orders side is small enough that Catalyst broadcasts it into
    // lineitem too — more broadcast than the contract, never less);
    // hash exchanges only for the aggregation
    assert(s.bcast >= 1 && s.hash <= 2 && s.pushed >= 2, s)
  }

  test("q61_tpch5: all dimension chains broadcast, single fact shuffle + agg") {
    val s = shape("q61_tpch5")
    // region→nation, nation→supplier, customer→orders, supplier→fact
    // all broadcast (small-scale estimates may broadcast the fact join
    // too — more broadcast, never less); hash exchanges at most
    // lineitem⨝orders + the final aggregation
    assert(s.bcast >= 4 && s.hash <= 3, s)
  }

  test("q59_heavy_hitters: candidate set broadcasts back for exact verify") {
    val s = shape("q59_heavy_hitters")
    assert(s.bcast >= 2, s) // MG candidates + threshold scalar
  }

  test("q67_repetition / q75_blocklist / q81_compression: zero shuffles " +
    "(map-side scan contract)") {
    Seq("q67_repetition", "q75_blocklist", "q81_compression_ratio")
      .foreach { q =>
        val s = shape(q)
        assert(s.hash == 0 && s.bcast == 0, s"$q: $s")
      }
  }

  test("q74_unigram_logprob: corpus-sized data crosses the wire once " +
    "(tf partial agg), model joins broadcast") {
    val s = shape("q74_unigram_logprob")
    // exchanges: tf by (doc, word), vocab df by word, tf⨝logp re-key,
    // final by doc — all on REDUCED frames; the raw token stream only
    // feeds partial aggregates. Broadcasts: the 1-row total + pinned
    // repartition don't broadcast, the logp join must.
    assert(s.hash <= 4 && s.bcast >= 1, s)
  }

  test("q76_mixture_rates: one strata agg exchange, config broadcast") {
    val s = shape("q76_mixture_rates")
    assert(s.hash == 1 && s.bcast == 1, s)
  }

  test("q77_cross_neardup: the new shard's banded signatures broadcast") {
    val s = shape("q77_cross_neardup")
    assert(s.bcast >= 1, s)
  }

  test("q78_chunk_tokens / q79_pack_sequences: explode stays shuffle-" +
    "free; the distributed prefix sum pays exactly its contract") {
    val c = shape("q78_chunk_tokens")
    assert(c.hash == 0 && c.bcast == 0, s"q78: $c")
    // q79's two-pass prefix sum: subtotal agg by (stratum, block), an
    // offsets window over the BLOCK-COUNT-sized subtotal frame, and
    // the block-local cumsum window — three hash exchanges, only the
    // last carrying corpus-sized rows. Broadcasts: the literal bounds
    // table into BOTH passes (subtotal branch + output branch) and the
    // offsets table — all strata/block-count-sized. One more exchange
    // or a dropped broadcast = the serialization (or a corpus-sized
    // offsets join) coming back.
    val p = shape("q79_pack_sequences")
    assert(p.hash == 3 && p.bcast == 3, s"q79: $p")
  }

  test("q94_bloom_decontaminate: position set broadcasts; corpus " +
    "crosses the wire only for the hit aggregations") {
    val s = shape("q94_bloom_decontaminate")
    // broadcasts: the bits set onto the probe stream + the per-doc
    // verdict back onto the id spine. Hash exchanges: bench distinct +
    // bits distinct (benchmark-sized), (doc,h) hit agg + doc agg
    // (corpus-sized but partial-aggregated) — a corpus-sized join
    // replacing a broadcast fails here.
    assert(s.bcast >= 2 && s.hash <= 6, s)
  }

  test("q72_semdedup: centroid joins broadcast; no shuffled join of the " +
    "corpus against itself except the pinned cell repartition") {
    val s = shape("q72_semdedup")
    // broadcasts: centroid frame into assignment (reused), dup-verdict
    // join stays on the pinned cell partitioning
    assert(s.bcast >= 1, s)
  }

  test("q82_pq_codes: centroid table broadcasts, corpus shuffles only " +
    "for the per-(id, j) min_by and the code pack") {
    val s = shape("q82_pq_codes")
    assert(s.bcast >= 1 && s.hash <= 3, s)
  }

  test("q100_bigram_logprob: the bigram explode + (doc,w1,w2) " +
    "aggregation runs ONCE — tf is materialized, so the scoring plan " +
    "contains NO Generate and reads the checkpointed frame") {
    val plan = SparkEntry.queries("q100_bigram_logprob")(spark, sf)
      .queryExecution.executedPlan.toString
    // before the fix cb/cw/scoring each replayed tokenize+explode+agg:
    // three Generate nodes (plus a fourth corpus scan for vocabulary);
    // with tf localCheckpointed the final plan must derive everything
    // from Scan ExistingRDD nodes and contain zero Generates
    assert(!plan.contains("Generate"), plan.linesIterator.take(40).mkString("\n"))
    assert(plan.contains("Scan ExistingRDD"), plan.linesIterator.take(40).mkString("\n"))
  }

  test("q88_ivfpq_residual: every model-sized side broadcasts (cells, " +
    "codebook, probes, distance table); corpus shuffles only for " +
    "assignment, code min_by, and the ADC aggregation") {
    val s = shape("q88_ivfpq_residual")
    // a dropped broadcast here means a corpus-sized shuffle join crept
    // into the FAISS pipeline; extra hash exchanges mean the codes
    // re-joined the corpus against itself (the shape this operator
    // explicitly avoids by carrying `cell` through the min_by keys).
    // Counted on the static plan TEXT: the codebook/probe broadcast
    // subtrees duplicate their child exchanges, so the ceiling is 7
    // (5 real: assign agg, code min_by, probe window, ADC agg, rank
    // window + duplicated-subtree copies), not 5.
    assert(s.bcast >= 4 && s.hash <= 7, s)
  }

  test("q131_bpe_tokens: vocab-encode table broadcasts; corpus crosses " +
      "the wire once (word rebalance + per-doc agg)") {
    val s = shape("q131_bpe_tokens")
    // the learned-vocab serving join must NOT shuffle the corpus
    // against the vocab: vocab broadcasts, exchanges are the word
    // rebalance round-robin + the per-doc count agg (plus the tiny
    // vocab-side aggs). No corpus-sized join exchange.
    assert(s.bcast >= 1, s)
  }

  test("q133_skyline: no cartesian/theta join — per-value agg + " +
      "distinct-frame window + one equi-join back") {
    val plan = SparkEntry.queries("q133_skyline")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("q135_seqmatch / q140_markov: one entity-key exchange each, " +
      "zero joins") {
    val s1 = shape("q135_seqmatch")
    assert(s1.hash <= 2 && s1.bcast == 0, s1)
    val s2 = shape("q140_markov")
    // entity window shuffle + type² agg shuffle (+ the type²-frame
    // row-normalize window)
    assert(s2.bcast == 0, s2)
  }

  test("q138_pmi: marginals join on vocab-sized keys; one-row N " +
      "broadcasts; no corpus re-scan (tf checkpointed)") {
    val plan = SparkEntry.queries("q138_pmi")(spark, sf)
      .queryExecution.executedPlan.toString
    // the tf localCheckpoint means the final plan reads NO parquet scan
    assert(!plan.contains("FileScan parquet"), plan.take(400))
    assert("BroadcastExchange".r.findAllIn(plan).size >= 1, plan.take(400))
  }

  test("q143_tpch10: customer/nation dims broadcast; shuffles only for " +
      "the fact join + final agg") {
    val s = shape("q143_tpch10")
    assert(s.bcast >= 2 && s.pushed >= 2, s)
    assert(s.hash <= 3, s)
  }

  test("q156_tpch19: disjunctive branches stay a broadcast EQUI-join " +
      "(no nested-loop) with a post-join filter") {
    val plan = SparkEntry.queries("q156_tpch19")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("q186_range_join_binned: the pure interval predicate compiles " +
      "to an EQUI join on the bin key — no nested-loop, no cartesian") {
    val plan = SparkEntry.queries("q186_range_join_binned")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(plan.contains("Join") || plan.contains("join"),
      plan.take(600))
  }

  test("q162_tpch21: exists/not-exists compile to equi semi/anti joins " +
      "on the fact key — no nested-loop, no cartesian, dims broadcast") {
    val plan = SparkEntry.queries("q162_tpch21")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(plan.contains("LeftSemi"), plan.take(600))
    assert(plan.contains("LeftAnti"), plan.take(600))
    val s = shape("q162_tpch21")
    // supplier⨝nation prune broadcasts into the probe; exchanges only
    // for the orderkey-keyed fact joins + the final per-supplier agg
    // (at larger SFs the l2/l3 sides shuffle on the SAME key, so the
    // partitioning is reused — the static bound stays ≤ 6)
    assert(s.bcast >= 1 && s.hash <= 6, s)
  }

  test("q247_tpch15: one fact exchange for the revenue view; the " +
      "one-row max and the supplier dim broadcast back — no " +
      "re-aggregation, no cartesian") {
    val plan = SparkEntry.queries("q247_tpch15")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    val s = shape("q247_tpch15")
    // hash exchanges: the per-supplier revenue agg on each consumer
    // branch of the view (max branch + probe branch — the view is not
    // materialized in the static plan) — ≤ 2; supplier broadcasts
    assert(s.hash <= 2 && s.bcast >= 1 && s.pushed >= 1, s)
  }

  test("q248_tpch17: the correlated scalar agg decorrelates to ONE " +
      "per-part aggregation joined back BROADCAST — no cartesian, " +
      "no nested-loop, no per-row re-aggregation") {
    val plan = SparkEntry.queries("q248_tpch17")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    val s = shape("q248_tpch17")
    // exchanges: the per-part stats agg (partial+final); the part
    // filter and the stats frame broadcast onto the fact scan
    assert(s.hash <= 2 && s.bcast >= 2 && s.pushed >= 1, s)
  }

  test("q249_tpch20: nested EXISTS chain compiles to broadcast " +
      "semi-joins + one conditional aggregation — no second fact " +
      "pass, no cartesian, no nested-loop") {
    val plan = SparkEntry.queries("q249_tpch20")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(plan.contains("LeftSemi"), plan.take(600))
    // exactly ONE lineitem scan: the window-vs-total compare folds
    // into one conditional aggregation instead of two fact passes
    assert("Scan parquet .*lineitem|FileScan parquet.*lineitem".r
      .findAllIn(plan).size == 1, "lineitem must be scanned once")
    val s = shape("q249_tpch20")
    // exchanges: the (suppkey, partkey) agg + the distinct suppkey
    // frame; part/nation/qualifying sides broadcast
    assert(s.hash <= 3 && s.bcast >= 2, s)
  }

  test("q250/q256/q257/q258 (TPC-H Q4/Q16/Q18/Q2 shapes): EXISTS → " +
      "semi, NOT IN → anti, HAVING-IN → agg+join, correlated MIN → " +
      "argmin agg — no cartesian/nested-loop anywhere") {
    Seq("q250_tpch4", "q256_tpch16", "q257_tpch18", "q258_tpch2")
      .foreach { q =>
        val plan = SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct"), s"$q cartesian")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$q nested-loop")
      }
    val q4 = SparkEntry.queries("q250_tpch4")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q4.contains("LeftSemi"), "Q4 EXISTS must be a semi join")
    val q16 = SparkEntry.queries("q256_tpch16")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q16.contains("LeftAnti"), "Q16 NOT IN must be an anti join")
    // Q2's correlated MIN decorrelates to a map-side argmin, never a
    // rank window: no unpartitioned Window in the plan
    val q2 = SparkEntry.queries("q258_tpch2")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!q2.contains("Window"), "Q2 must use min_by, not a window")
  }

  test("q245_mutual_nn_ivf: bounded arm — centroids/probes broadcast, " +
      "no cartesian; the only nested-loop is the model-sized centroid " +
      "cross (the q42 assignment shape), never corpus × corpus") {
    val plan = SparkEntry.queries("q245_mutual_nn_ivf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    // every BroadcastNestedLoopJoin in this plan must be the
    // centroid-frame cross (assignCells / probe scoring): its build
    // side is the nCentroids-row frame, which the static plan shows
    // as a broadcast of the LIMIT-8 subtree — corpus×corpus would
    // appear as a BNLJ over two scans without the limit
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    val limits = "(?i)limit".r.findAllIn(plan).size
    assert(bnlj == 0 || limits >= 1, s"$bnlj BNLJ without a " +
      "model-sized limit side — corpus-scale nested loop crept in")
  }

  private def full(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q267: per-key sweep — no single-partition exchange anywhere") {
    val plan = full("q267_peak_concurrency")
    assert(!plan.contains("Exchange SinglePartition"), "sweep must stay key-partitioned")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2, plan.take(200))
  }

  test("q269: two-phase global sweep — exactly one single-partition stage, fed by a day-hash aggregation") {
    val plan = full("q269_daily_in_transit")
    // the one SinglePartition exchange carries the calendar-span frame
    // (the N-sized data is reduced by the hashpartitioned day agg first)
    assert("Exchange SinglePartition".r.findAllIn(plan).size == 1, plan.take(200))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 1)
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1)
  }

  test("q270: line dedup is argmin + joins — zero windows, zero single-partition stages") {
    val plan = full("q270_line_dedup")
    assert(!plan.contains("Exchange SinglePartition"))
    assert("\\bWindow\\b".r.findAllIn(plan).size == 0, "keep-first must not use a window")
  }

  test("q282: link prediction reuses the checkpointed edge frame — bounded exchanges") {
    val plan = full("q282_link_prediction")
    // before the edge-frame checkpoint this plan re-derived the
    // co-occurrence self-join per consumer (32 hash exchanges)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 8, "edge frame must be checkpointed, not re-derived")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q300: bounded margin mining — candidate equi-joins only, " +
      "never a corpus×corpus product") {
    val plan = full("q300_margin_candidates")
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("q301: pruned BM25 — no cartesian; the contribs frame is " +
      "materialized (localCheckpoint — read back, not recomputed per " +
      "prune pass)") {
    val plan = full("q301_bm25_pruned")
    assert(!plan.contains("CartesianProduct"), plan.take(400))
    assert(plan.contains("ExistingRDD"),
      "contribs must be localCheckpoint'd for the multi-pass prune")
  }

  test("q303: rendezvous stability is pure map-side — zero joins, " +
      "zero hash exchanges (global aggs only)") {
    val s = shape("q303_rendezvous_stability")
    assert(s.hash == 0 && s.bcast == 0, s)
    assert(!full("q303_rendezvous_stability").contains("Join"))
  }

  test("q306/q307: PCM kernels are map-side scans — zero exchanges, " +
      "zero joins; q308 adds exactly the per-blob island window") {
    Seq("q306_wav_pcm_stats", "q307_audio_frames").foreach { q =>
      val s = shape(q)
      assert(s.hash == 0 && s.bcast == 0, s"$q: $s")
      assert(!full(q).contains("Join"), s"$q joins")
    }
    val s8 = shape("q308_audio_segments")
    assert(s8.hash <= 2 && s8.bcast == 0, s8)
    assert(!full("q308_audio_segments")
      .contains("Exchange SinglePartition"),
      "islands must stay blob-partitioned")
  }

  test("q309/q305: group-bounded audits — one group aggregation, " +
      "model-sized broadcasts, no corpus-sized join") {
    val s9 = shape("q309_fairness_audit")
    // 2 static exchanges: the group agg, PLUS the broadcast max's
    // subtree re-stating it (the q88 duplicated-subtree counting note)
    assert(s9.hash <= 2 && s9.bcast >= 1, s9)
    val s5 = shape("q305_budget_allocation")
    assert(s5.bcast >= 2, s5) // total + base_total one-row frames
    assert(!full("q305_budget_allocation").contains("CartesianProduct"))
  }

  test("q310: change-point — the unpartitioned prefix window sees only " +
      "the calendar-span frame (one SinglePartition stage, fed by the " +
      "hash-partitioned day aggregation)") {
    val plan = full("q310_changepoint")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 1,
      plan.take(300))
    assert("\\bWindow\\b".r.findAllIn(plan).size == 1, plan.take(300))
  }

  test("q317: embedding QA is one map-side scan — zero hash " +
      "exchanges, zero joins (the blob column never leaves the scan)") {
    val s = shape("q317_embedding_qa")
    // countDistinct(n_dims) expands to a two-phase distinct aggregate
    // over the 1-3 distinct dim values — one bounded exchange
    assert(s.hash <= 1 && s.bcast == 0, s)
    assert(!full("q317_embedding_qa").contains("Join"))
  }

  test("q319: PNG encode→decode→stats is ONE map-side scan — zero " +
      "exchanges, zero joins (pixels never leave the task)") {
    val s = shape("q319_png_roundtrip")
    assert(s.hash == 0 && s.bcast == 0, s)
    assert(!full("q319_png_roundtrip").contains("Join"))
  }

  test("q320: PNG dHash near-dup — band equi-joins only, never a " +
      "cartesian; one candidate-stream distinct") {
    val plan = full("q320_png_dhash_neardup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("q322: windowed per-group heavy hitters — the MG sketch pass " +
      "and the exact verify are group-keyed (no single-partition " +
      "stage, no cartesian)") {
    val plan = full("q322_stream_heavy_hitters_twin")
    assert(!plan.contains("Exchange SinglePartition") ||
      plan.contains("Window"), plan.take(300))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q323/q324: unigram EM — every stage is vocabulary-keyed; the " +
      "Viterbi E-step is a piece join + per-word fold + kernel (no " +
      "cartesian, no data-sized single-partition stage beyond the " +
      "model-sized prune window)") {
    Seq("q323_unigram_train", "q324_unigram_segment").foreach { q =>
      val plan = full(q)
      // BroadcastNestedLoopJoin appears only as the one-row total
      // broadcast under pieceLogProbs — the established crossJoin
      // (broadcast(tot)) idiom; a SHUFFLED cartesian is the defect
      assert(!plan.contains("CartesianProduct"), s"$q cartesian")
    }
  }

  test("q325: calibration — the only cross product is the SAMPLE-" +
      "sized brute-force truth, and it broadcasts (never a shuffled " +
      "cartesian); candidate generation is bucket equi-joins") {
    val plan = full("q325_lsh_calibration")
    assert(!plan.contains("CartesianProduct"), plan.take(400))
  }

  test("q326: KLL audit — sketch pass is one group aggregation; " +
      "windows stay group-partitioned") {
    val s = shape("q326_kll_quantiles")
    assert(s.bcast >= 1, s) // the ng one-row-per-group broadcast
    assert(!full("q326_kll_quantiles").contains("CartesianProduct"))
  }

  test("q331: incremental dedup — prefix equi-joins only (never a " +
      "cartesian); the increment side is a broadcast semi-join " +
      "filter of the ranked frame") {
    val plan = full("q331_jaccard_incremental")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
    assert(plan.contains("LeftSemi"), "increment semi-join missing")
  }

  test("q332: tombstoned read — postings scan keeps its wbucket " +
      "partition filters AND applies the generation kill floor") {
    val plan = full("q332_bm25_delete")
    assert(plan.contains("below_gen"),
      "generation tombstone filter missing")
    assert(plan.contains("wbucket"), "bucket partition filter missing")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q333: compacted index read keeps the partition-pruned shape " +
      "(compaction rewrites files, never the layout)") {
    val plan = full("q333_bm25_compaction")
    assert(plan.contains("wbucket"), "bucket partition filter missing")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q334/q335/q340/q346: JPEG (incl. 4:2:0+DRI) and mixed-media " +
      "QA are ONE map-side scan — zero exchanges, zero joins (pixels " +
      "never leave the task; the q340 decode dispatch is a CASE, not " +
      "a join)") {
    Seq("q334_jpeg_roundtrip", "q335_jpeg_dct_exact",
        "q340_mixed_media_qa", "q346_jpeg_420_roundtrip",
        "q350_jpeg_422_roundtrip", "q351_jpeg_salvage",
        "q352_jpeg_progressive",
        "q354_jpeg_progressive_salvage",
        "q356_jpeg_progressive_420").foreach { q =>
      val s = shape(q)
      assert(s.hash == 0 && s.bcast == 0, s"$q: $s")
      assert(!full(q).contains("Join"), q)
    }
  }

  test("q353: streaming upsert read keeps wbucket pruning AND the " +
      "generation kill floor (the crash-healed index is served " +
      "through the same partition-pruned plan)") {
    val p = full("q353_tf_stream_upsert")
    assert(p.contains("below_gen"),
      "q353 generation tombstone filter missing")
    assert(p.contains("wbucket"), "q353 bucket pruning missing")
    assert(!p.contains("CartesianProduct"))
  }

  test("q357: retrain-then-serve — model-sized sides broadcast " +
      "(cells, codebook, probes, distance table), never a cartesian " +
      "or a vector-side shuffle join") {
    val st = shape("q357_ann_retrain")
    assert(st.bcast >= 2 && !full("q357_ann_retrain")
      .contains("CartesianProduct"), st)
  }

  test("q355: streaming shingle ingest — the kill floor lands before " +
      "ranking; prefix equi-joins only (never a cartesian)") {
    val p = full("q355_shingle_stream_ingest")
    assert(p.contains("below_gen"),
      "q355 generation tombstone filter missing")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(400))
  }

  test("q358: pinned read serves through the SAME partition-pruned " +
      "shape as a live read — bucket pruning, the visibility " +
      "watermark as a pushed gen filter, no cartesian (time travel " +
      "costs a manifest file read, not a plan change)") {
    val p = full("q358_bm25_pinned_read")
    assert(p.contains("wbucket"), "q358 bucket pruning missing")
    assert(p.contains("gen"), "q358 visibility watermark filter missing")
    assert(!p.contains("CartesianProduct"))
  }

  test("q359: streamed ANN re-embed serves like q349 — model-sized " +
      "sides broadcast, kill floor applied, never a cartesian or a " +
      "code-stream shuffle join") {
    val p = full("q359_ann_stream_upsert")
    assert(p.contains("below_gen"),
      "q359 generation tombstone filter missing")
    val st = shape("q359_ann_stream_upsert")
    assert(st.bcast >= 2 && !p.contains("CartesianProduct"), st)
  }

  test("q360: streamed fingerprint ingest — kill floor before " +
      "pairing; fbucket-partitioned scan; no cartesian") {
    val p = full("q360_fingerprint_stream_ingest")
    assert(p.contains("below_gen"),
      "q360 generation tombstone filter missing")
    assert(p.contains("fbucket"), "q360 bucket layout missing")
    assert(!p.contains("CartesianProduct"))
  }

  test("q361: composed multi-family recovery serves through the " +
      "SAME plan as a single-family ingest — pushed visibility " +
      "watermark, fbucket-partitioned scan, no cartesian (the " +
      "composition changes epochs, not plans; no below_gen because " +
      "a kill BETWEEN families heals by clean append — the replay " +
      "skips the committed family, so no tombstone is ever written)") {
    val p = full("q361_composed_stream_recovery")
    assert(p.contains("LessThanOrEqual(gen,"),
      "q361 pushed visibility watermark missing")
    assert(p.contains("fbucket"), "q361 bucket layout missing")
    assert(!p.contains("CartesianProduct"))
  }

  test("q362: snapshot CDC — both live-state scans carry the pushed " +
      "visibility watermark and the kill floor; the diff is a keyed " +
      "full-outer join, never a cartesian; the postings tree is " +
      "never scanned (doc-catalog side table only)") {
    val p = full("q362_index_cdc")
    assert(p.contains("LessThanOrEqual(gen,"),
      "q362 pushed visibility watermark missing")
    assert(p.contains("below_gen"), "q362 kill floor missing")
    assert(p.contains("FullOuter"), "q362 full-outer diff missing")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("postings"),
      "q362 must not touch the postings body")
  }

  test("q339: dedup delete — the generation kill floor lands BEFORE " +
      "ranking; still no cartesian") {
    val plan = full("q339_jaccard_delete")
    assert(plan.contains("below_gen"),
      "generation tombstone filter missing")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("q344/q345: upsert reads keep wbucket pruning (q344) and the " +
      "generation kill floor; no cartesian") {
    val p344 = full("q344_bm25_upsert")
    assert(p344.contains("below_gen"),
      "q344 generation tombstone filter missing")
    assert(p344.contains("wbucket"), "q344 bucket pruning missing")
    assert(!p344.contains("CartesianProduct"))
    val p345 = full("q345_jaccard_upsert")
    assert(p345.contains("below_gen"),
      "q345 generation tombstone filter missing")
    assert(!p345.contains("CartesianProduct") &&
      !p345.contains("BroadcastNestedLoopJoin"), p345.take(400))
  }

  test("q347/q348: the drift stat broadcasts the codebook (never a " +
      "shuffled join of the increment against it); the streamed index " +
      "read keeps wbucket pruning; no cartesian") {
    val p347 = full("q347_ann_drift_trigger")
    assert(p347.contains("BroadcastHashJoin"),
      "codebook join must broadcast")
    // the only nested-loop join allowed is the one-row baseline ×
    // one-row appended-stats cross combine
    assert(!p347.contains("CartesianProduct"), p347.take(400))
    val p348 = full("q348_tf_stream_ingest")
    assert(p348.contains("wbucket"), "q348 bucket pruning missing")
    assert(!p348.contains("CartesianProduct"))
  }

  test("q341/q349: ANN delete/upsert — the code stream applies the " +
      "generation kill floor; probes/distance tables still " +
      "broadcast; no shuffled cartesian") {
    Seq("q341_ann_delete", "q349_ann_upsert").foreach { q =>
      val plan = full(q)
      assert(plan.contains("below_gen"),
        s"$q generation tombstone filter missing")
      assert(!plan.contains("CartesianProduct"), s"$q: ${plan.take(400)}")
    }
  }

  test("q343: incremental substring dedup — fingerprint equi-joins " +
      "only, increment side a broadcast semi-join; no cartesian") {
    val plan = full("q343_substring_incremental")
    assert(plan.contains("LeftSemi"), "increment semi-join missing")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(400))
  }

  test("q336: windowed KLL twin — sketch pass is day-keyed; the only " +
      "broadcast is the one-row-per-day ng frame; no cartesian") {
    val plan = full("q336_stream_kll_twin")
    assert(!plan.contains("CartesianProduct"), plan.take(300))
  }

  test("q337: unigram ladder — every rung stays vocabulary-keyed " +
      "(no cartesian; the only nested-loop is the one-row total " +
      "broadcast under pieceLogProbs)") {
    assert(!full("q337_unigram_ladder").contains("CartesianProduct"))
  }

  test("q338: raw-text serving — the per-word piece frame joins " +
      "BROADCAST onto the token stream; no cartesian") {
    val plan = full("q338_segment_text_serving")
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    assert(!plan.contains("CartesianProduct"))
  }
}
