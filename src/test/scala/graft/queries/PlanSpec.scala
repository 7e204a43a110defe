package graft.queries

import graft.SparkSpec

/** Physical-plan hygiene (the 100 TB checklist): filters reach the parquet
  * scan, projections prune columns, small join sides broadcast. These are
  * the properties that decide whether a plan survives a 1000× scale-up,
  * asserted so a regression fails CI rather than a production run. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntryPlans.formatted(spark, name)

  private object SparkEntryPlans {
    def formatted(s: org.apache.spark.sql.SparkSession, name: String): String = {
      val df = graft.SparkEntry.queries(name)(s, sf())
      df.collect() // AQE finalizes (and codegen appears) only after execution
      df.queryExecution.executedPlan.toString()
    }
  }

  test("q02: both predicates are pushed to the parquet scan") {
    val p = plan("q02_filter")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("IsNotNull(lang)") || p.contains("EqualTo(lang,es)"), p.take(2000))
    assert(p.contains("GreaterThan(n_chars,200)"), p.take(2000))
  }

  test("q01: column pruning — text is not read for a 3-column projection") {
    val p = plan("q01_scan_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), readSchema)
    assert(readSchema.contains("doc_id") && readSchema.contains("lang") && readSchema.contains("source"))
  }

  test("q10: dictionary join executes as a broadcast hash join") {
    val p = plan("q10_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q20: nation (tiny dim) joins via broadcast; shipdate filter pushed in q25") {
    assert(plan("q20_multijoin_revenue").contains("BroadcastHashJoin"))
    val p25 = plan("q25_scan_agg")
    assert(p25.contains("LessThanOrEqual(l_shipdate"), p25.take(2000))
  }

  test("q25: whole-stage codegen covers the scan+filter+partial-agg pipeline") {
    val p = plan("q25_scan_agg")
    // codegen'd stages render as "*(n) Operator" in the executed plan
    assert(p.contains("*(1)"), p.take(2000))
    assert("\\*\\(\\d+\\) HashAggregate".r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("q05: aggregation is partial+final (map-side combine before shuffle)") {
    val p = plan("q05_wordcount")
    // two HashAggregate nodes around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("asof join is merge-scan: no non-equi join operator, no cross product") {
    val p = plan("ext_asof_join")
    // union + key-partitioned window, never BroadcastNestedLoop/Cartesian
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("Window"), p.take(3000))
  }

  test("sessionize shuffles once on the session key") {
    val p = plan("ext_sessionize")
    // one Exchange for the (user_id) window; the final orderBy adds a
    // range exchange — no other shuffles (the rollup reuses the window's
    // partitioning)
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx >= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("tfidf: df-side and N-side join via broadcast (no fact re-shuffle)") {
    val p = plan("ext_tfidf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("hash_split is a pure map: no exchange before the final sort") {
    val df = graft.SparkEntry.queries("ext_hash_split")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    // only the ORDER BY's range exchange may appear
    assert(!p.contains("hashpartitioning"), p.take(3000))
  }

  test("bloom semi-join: filter applies BEFORE the exchange feeding the join") {
    val p = plan("ext_bloom_semi_join")
    // the UDF pre-filter must sit below the shuffle/broadcast that feeds
    // the semi-join, so at scale the exchange carries only candidates
    val filterIdx = p.indexOf("Filter")
    val joinIdx = p.indexOf("Join")
    assert(filterIdx >= 0 && joinIdx >= 0 && joinIdx < filterIdx,
      s"pre-filter not below the join:\n${p.take(3000)}")
    assert(p.contains("LeftSemi"), p.take(3000))
  }

  test("partial-agg merge: both levels use partial+final hash aggregation") {
    val p = plan("ext_partial_agg_merge")
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("zorder key computation stays inside whole-stage codegen (no UDF)") {
    val p = plan("ext_zorder")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p.take(3000))
    assert(p.contains("*(1)"), p.take(2000)) // codegen'd first stage
  }

  test("chunk_windows and winnow are exchange-free up to the final sort") {
    for (q <- Seq("ext_chunk_windows", "ext_winnow")) {
      val df = graft.SparkEntry.queries(q)(spark, sf())
      df.collect()
      val p = df.queryExecution.executedPlan.toString()
      // in-row chunking/fingerprinting: the ORDER BY's range exchange is
      // the ONLY shuffle; the spreadForCompute round-robin is not hash
      assert(!p.contains("hashpartitioning"), s"$q:\n${p.take(3000)}")
    }
  }

  test("edit-distance blocking joins on the block key, never cross-product") {
    val p = plan("ext_edit_distance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(p.contains("Join"), p.take(3000))
  }

  test("q32/q39: all window functions share ONE WindowExec pass") {
    for (q <- Seq("q32_window_nav", "q39_rank_family")) {
      // AQE's toString renders final + initial plans; inspect the final only
      val p = plan(q).split("== Initial Plan ==").head
      // one Window node evaluating all four functions — not one per function
      assert("\\bWindow\\b".r.findAllIn(p).size == 1, s"$q:\n${p.take(3000)}")
      // and exactly one hash exchange (the user_id partitioning)
      assert("hashpartitioning".r.findAllIn(p).size >= 1, s"$q:\n${p.take(3000)}")
    }
  }

  test("q33: higher-order array functions stay in-row (no explode, no UDF)") {
    val p = plan("q33_array_hof")
    assert(!p.contains("Generate") && !p.contains("ScalaUDF"), p.take(3000))
  }

  test("q37: EXCEPT ALL plans as aggregate+generate, not a sort-based diff") {
    val p = plan("q37_except_all")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("importance weights: the V-row weight dictionary joins via broadcast") {
    val p = plan("ext_importance_weights")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("ewma: one hash exchange (the key repartition), then a pure scan") {
    val df = graft.SparkEntry.queries("ext_ewma")(spark, sf())
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    // the mapPartitions scan consumes the keyed repartition; only the
    // final ORDER BY adds a range exchange on top
    assert("hashpartitioning".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"))
  }

  test("negative sampling is join-free: one bucket aggregation, in-row pairing") {
    val p = plan("ext_negative_sample")
    assert(!p.contains("Join"), p.take(3000))
    assert(p.contains("Generate"), p.take(3000)) // the in-row ring explode
  }

  test("resample grid expansion is in-row; no cartesian against a calendar") {
    val p = plan("ext_resample_ffill")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(p.contains("Generate"), p.take(3000)) // sequence() explode per key
  }

  test("q04/q26: default vocab builds contain no single-partition WindowExec") {
    // the dense rank comes from distributed sortBy+zipWithIndex
    // (Corpus.sortedVocab / firstSeenVocab) — a global row_number window
    // here would funnel the whole distinct-token set through one task
    for (q <- Seq("q04_vocab", "q26_vocab_first_seen")) {
      val p = plan(q).split("== Initial Plan ==").head
      assert(!"\\bWindow\\b".r.findFirstIn(p).isDefined, s"$q:\n${p.take(3000)}")
    }
  }

  test("length deciles and zorder: two-pass rank, no global ntile window") {
    for (q <- Seq("ext_length_deciles", "ext_zorder")) {
      val p = plan(q).split("== Initial Plan ==").head
      assert(!"\\bWindow\\b".r.findFirstIn(p).isDefined, s"$q:\n${p.take(3000)}")
    }
  }

  test("semdedup: cluster-keyed equi-joins only, assignment is a pure map") {
    val p = plan("ext_semdedup")
    // the pair join is keyed on cluster id (SemDeDup's point) and the
    // kept-flag join on vec_id — never a cross product; centroid
    // assignment is broadcast-literal arithmetic, not a join
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("gopher filter is a pure map: no exchange before the final sort") {
    val p = plan("ext_gopher_filter").split("== Initial Plan ==").head
    assert(!p.contains("hashpartitioning"), p.take(3000))
  }

  test("repeated spans: keyed window only, gram joins are equi, no cartesian") {
    val p = plan("ext_repeated_spans").split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // every window must be keyed — the dup filter on gram, the span
    // merge on doc_id; a single-partition window here would funnel every
    // position through one task. Asserted positively so a format drift
    // can't make it vacuous.
    val specs = "windowspecdefinition\\(([^,)]*)".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(specs.nonEmpty, p.take(3000))
    specs.foreach(s => assert(s.startsWith("doc_id") || s.startsWith("gram"),
      s"window keyed on '$s':\n${p.take(3000)}"))
  }

  test("setsim join: frequency dictionary broadcasts; no cartesian product") {
    val p = plan("ext_setsim_join")
    // the V-row (shingle, df) table joins via broadcast into the in-row
    // prefix computation; candidates come from the prefix-token equi-join
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("pq_topk / ivfpq_topk scoring is a pure codegen'd map: no join, no exchange, no UDF") {
    for (q <- Seq("ext_pq_topk", "ext_ivfpq_topk")) {
      val df = graft.SparkEntry.queries(q)(spark, sf())
      df.collect()
      val p = df.queryExecution.executedPlan.toString()
      // codebooks/ADC tables/probe set fold in as literals; encode (+
      // probe filter) + score is one map stage into TakeOrdered —
      // nothing shuffles, nothing joins
      assert(!p.contains("Join"), s"$q:\n${p.take(3000)}")
      assert(!p.contains("hashpartitioning"), s"$q:\n${p.take(3000)}")
      assert(!p.contains("ScalaUDF") && !p.contains("BatchEvalPython"), s"$q:\n${p.take(3000)}")
      assert(p.contains("TakeOrdered"), s"$q:\n${p.take(3000)}")
    }
  }

  test("inverted index: join-free — two partial+final aggregations, in-row encode") {
    val p = plan("ext_inverted_index")
    assert(!p.contains("Join"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
    assert(p.contains("Generate"), p.take(3000)) // tokenize + posting explode
  }

  test("rrf fusion: candidate windows sit above limits; no cartesian blow-up") {
    val p = plan("ext_rrf_fusion")
    // the only nested-loop is the 1-row broadcast query vector; candidate
    // ranking windows run over TakeOrdered'd constant-size lists
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("TakeOrdered") || p.contains("GlobalLimit"), p.take(3000))
  }

  test("domain KL / mixture alloc: stratum tables broadcast; no cartesian product") {
    for (q <- Seq("ext_domain_kl", "ext_mixture_alloc")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q:\n${p.take(3000)}")
      assert(p.contains("Broadcast"), s"$q:\n${p.take(3000)}")
    }
  }

  test("nb classify: model-side joins broadcast, doc argmax keyed, no cartesian") {
    val p = plan("ext_nb_classify")
    // classes/class-totals/V/priors all broadcast (model « corpus); the
    // only hash exchanges are the (tok,class) counts and the per-doc
    // aggregation/argmax — never a CartesianProduct (the docs×C and
    // vocab×C grids ride broadcast nested loops over one-row/C-row sides)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // per-doc argmax is a keyed window (partitioned by doc_id, so no
    // timeline funnels through one task)
    val winLine = p.linesIterator.find(_.contains("Window")).getOrElse("")
    assert(winLine.contains("doc_id"), winLine + "\n" + p.take(3000))
  }

  test("first-wins dedup: bucket-keyed equi-joins only, no pair blow-up operator") {
    val p = plan("ext_neardup_first_wins")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // the signature build + (band,key) aggregates are hash-keyed; the doc
    // self-join of the pairwise path never appears
    assert(p.contains("hashpartitioning"), p.take(3000))
  }

  test("vocab coverage: scalar/threshold joins broadcast; no global token rank") {
    val p = plan("ext_vocab_coverage")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the total and the 4-row threshold table ride broadcast joins
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      p.take(3000))
    // the only Window is the histogram cumulation — count the occurrences:
    // a global rank over V tokens would add a second unpartitioned window
    assert("Window".r.findAllIn(p).size <= 2, p.take(3000))
  }

  test("containment join: equi-joins only; freq table broadcasts into the prefix") {
    val p = plan("ext_containment_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    // the global-frequency dictionary folds in via broadcast, like setsim
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("source overlap: exact form gram-equi-joins; KMV scores S-row pairs broadcast") {
    val pe = plan("ext_source_overlap")
    assert(!pe.contains("CartesianProduct") && !pe.contains("BroadcastNestedLoopJoin"),
      pe.take(3000))
    // KMV's pair scoring is the S×S signature cross — a deliberate
    // broadcast nested loop over S rows, with NO gram-level join at all
    val pk = plan("ext_source_overlap_kmv")
    assert(pk.contains("BroadcastNestedLoopJoin"), pk.take(3000))
    val kmvJoins = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(pk).size
    assert(kmvJoins == 0, s"gram-level shuffle join leaked in: ${pk.take(3000)}")
  }

  test("normalized dedup: one aggregation over a pure-map canonical form") {
    val p = plan("ext_dedup_normalized")
    assert(!p.contains("Join"), p.take(3000))
    // partial+final hash agg around the single md5-keyed exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("random projection is a pure map: the literal sign matrix adds no exchange") {
    val p = plan("ext_random_projection")
    assert(!p.contains("Join"), p.take(3000))
    // spreadForCompute's round-robin + the final orderBy are the ONLY
    // exchanges; the projection itself must not shuffle or aggregate.
    // (AQE's toString appends the Initial Plan — count the final only.)
    assert(!p.contains("HashAggregate"), p.take(3000))
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Exchange".r.findAllIn(finalPlan).size <= 2, finalPlan.take(3000))
  }

  test("scd2: every window reuses ONE key shuffle (plus only the output sort)") {
    val p = plan("ext_scd2")
    val finalPlan = p.split("== Initial Plan ==").head
    // run detection + per-key count + post-filter lead/row_number all
    // partition by o_custkey: exactly one hash exchange; the orderBy adds
    // one range exchange. A second hash exchange would mean the islands
    // pass re-shuffled — the shape that dies at 100 TB.
    assert("hashpartitioning".r.findAllIn(finalPlan).size <= 1, finalPlan.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("blocklist match stage is a pure projection over the scan") {
    // filterReport with literal phrases: matching must fuse into the scan's
    // codegen span — no join, no aggregate, no exchange beyond the orderBy
    // (the phrase list rides inside the expression, not as a join side).
    val docs = graft.Tables.documents(spark, sf())
    val df = graft.ext.Blocklist.filterReport(docs, Seq("the cat", "a b"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p.take(3000))
    assert(!p.contains("Exchange"), p.take(3000))
    assert(p.contains("*(1)"), p.take(2000)) // whole-stage codegen
  }

  test("bucketed join: merge join AND per-order agg run with zero shuffles") {
    val p = plan("ext_bucketed_join")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("SortMergeJoin"), finalPlan.take(3000))
    // both scans expose the bucket partitioning: no hash exchange anywhere —
    // not for the join, not for the groupBy (the orderBy's range exchange
    // is the only one). Bucket scan shows "SelectedBucketsCount".
    assert(!finalPlan.contains("hashpartitioning"), finalPlan.take(4000))
    assert(finalPlan.contains("SelectedBucketsCount"), finalPlan.take(3000))
  }

  test("kmv signature: bounded-state aggregate, no per-source rank window") {
    val p = plan("ext_source_overlap_kmv")
    val finalPlan = p.split("== Initial Plan ==").head
    // the k-min runs as a typed partial+final aggregate (ObjectHashAggregate:
    // O(k) state per source crosses the wire) — never the r12 row_number
    // form that sorted every distinct hash per source to keep 256
    assert(finalPlan.contains("ObjectHashAggregate"), finalPlan.take(3000))
    assert(!finalPlan.contains("Window"), finalPlan.take(3000))
    assert(!finalPlan.contains("row_number"), finalPlan.take(3000))
  }

  test("hll registers: one exchange, partial+final max (no distinct, no value shuffle)") {
    val docs = graft.Tables.documents(spark, sf())
    val occ = docs.select(org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.explode(graft.ext.Dedup.shingles(
        graft.ext.Dedup.tokens(org.apache.spark.sql.functions.col("text")), 3)).as("sh"))
    val df = graft.ext.Sketches.hllRegisters(occ, "source", org.apache.spark.sql.functions.col("sh"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    val finalPlan = p.split("== Initial Plan ==").head
    // partial max before the shuffle: only (source,bucket,max-rho) rows —
    // O(groups·256) — cross the wire, never the shingle stream
    assert("HashAggregate".r.findAllIn(finalPlan).size >= 2, finalPlan.take(3000))
    assert("hashpartitioning".r.findAllIn(finalPlan).size <= 1, finalPlan.take(3000))
  }

  test("psi drift: no window exec, no cartesian (two-pass ntile + grid joins)") {
    val p = plan("ext_psi_drift")
    // deciles come from exactNtile's offset scan — a global NTILE window
    // here would be the q18 single-task anti-pattern
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("table diff: one full-outer sort-merge join, fingerprints pre-join") {
    val p = plan("ext_table_diff")
    val finalPlan = p.split("== Initial Plan ==").head
    assert(finalPlan.contains("SortMergeJoin") && finalPlan.contains("FullOuter"),
      finalPlan.take(3000))
    assert(!finalPlan.contains("CartesianProduct")
      && !finalPlan.contains("BroadcastNestedLoopJoin"))
  }

  test("jaro-winkler pairs: block-key equi-join + TakeOrdered, codegen'd kernel") {
    val p = plan("ext_jaro_winkler")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
    assert(p.contains("graft_jaro_winkler"), p.take(3000)) // native expression planned
  }

  test("cohort retention: aggregation pipeline, no window, no cross product") {
    val p = plan("ext_cohort_retention")
    assert(!p.contains("Window"), p.take(3000)) // aggs only — nothing single-partition
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("transitions: per-user window + broadcast totals join") {
    val p = plan("ext_transitions")
    assert(p.contains("BroadcastHashJoin"), p.take(3000)) // |types|²-row totals
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("mad outliers: both median tables join broadcast") {
    val p = plan("ext_mad_outliers")
    assert(p.split("BroadcastHashJoin").length >= 3, p.take(3000)) // meds + mads
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("nearest join: both direction candidates from ONE window, no range join") {
    val p = plan("ext_nearest_join")
    // backward last() and forward first() share the (key, ts, side) sort:
    // every printed Window node (AQE shows final + initial) carries BOTH
    val nodes = p.split("Window \\[").drop(1)
    assert(nodes.nonEmpty, p.take(3000))
    assert(nodes.forall(s => s.take(300).contains("last(_pay")
      && s.take(300).contains("first(_pay")), p.take(3000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000))
  }

  test("rfm / welch: thresholds and totals ride ONE broadcast scalar row") {
    for (q <- Seq("ext_rfm", "ext_welch")) {
      val p = plan(q)
      assert(p.contains("Broadcast"), s"$q: ${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(2000)}")
      assert(!p.contains("Window"), s"$q: ${p.take(2000)}") // no ntile/global rank
    }
  }

  test("histogram + transition entropy: broadcast stats joins, no cross product") {
    for (q <- Seq("ext_histogram", "ext_transition_entropy")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: ${p.take(2000)}")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: ${p.take(2000)}")
    }
  }

  test("zipf: ranking is the RDD two-job scheme, no window in the plan") {
    val p = plan("ext_zipf")
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("sorted neighborhood: bucket equi-join, no window, no range join") {
    val p = plan("ext_sorted_neighborhood")
    assert(!p.contains("Window"), p.take(3000)) // rank is sortBy+zipWithIndex
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(3000)) // the window became an equi-join, not a range join
    assert(p.contains("graft_jaro_winkler"), p.take(3000))
  }

  test("priority sample is TakeOrdered: top-k without a global sort") {
    val p = plan("ext_priority_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    // a global Sort exchange would be the O(n log n) anti-pattern
    assert(!p.contains("rangepartitioning"), p.take(3000))
  }

  test("write plan and skew report are single-aggregation passes") {
    val pw = plan("ext_write_plan")
    assert(!pw.contains("Join"), pw.take(3000))
    assert("HashAggregate".r.findAllIn(pw).size >= 2, pw.take(3000)) // partial+final
    val ps = plan("ext_skew_report")
    // the totals row rides a 1-row broadcast cross, not a second shuffle
    assert(ps.contains("BroadcastNestedLoopJoin"), ps.take(3000))
    assert(ps.contains("TakeOrderedAndProject"), ps.take(3000))
  }

  test("standardize: the per-dimension stats table joins via broadcast") {
    val p = plan("ext_standardize")
    // the (mu, sd) side is dimension-bounded — a shuffle join here would
    // shuffle the full posexploded corpus against 64 rows
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("keywords: ranking reuses tfIdf's doc-keyed shuffle (one window pass)") {
    val p = plan("ext_keywords")
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("span corruption is a pure projection: no join, no window, no extra shuffle") {
    val p = plan("ext_span_corrupt")
    assert(!p.contains("Join"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).isEmpty, p.take(3000))
  }

  test("TWA and interval merge are one key-shuffle window pipelines") {
    for (q <- Seq("ext_twa", "ext_interval_merge")) {
      val p = plan(q)
      assert(p.contains("Window"), s"$q:\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q:\n${p.take(2000)}")
    }
  }

  test("partitioned read prunes directories: lang filter lands in PartitionFilters") {
    val p = plan("ext_partition_prune")
    // FileScan renders both filter lists on one line — slice each bracket
    def bracketAfter(marker: String): String = {
      val i = p.indexOf(marker)
      if (i < 0) "" else p.substring(i, p.indexOf("]", i) + 1)
    }
    assert(bracketAfter("PartitionFilters: [").contains("lang"),
      s"no partition filter on lang:\n${p.take(3000)}")
    // and NOT as a pushed data filter — the column only exists as a directory
    assert(!bracketAfter("PushedFilters: [").contains("lang"), p.take(3000))
  }
}
