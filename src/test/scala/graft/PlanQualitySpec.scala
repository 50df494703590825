package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality assertions: column pruning, pushed filters, and broadcast
  * join selection are part of the contract, not an accident — a regression
  * that reads all columns for a 2-column projection should fail CI, not
  * wait for a 100 TB bill (builder brief: ".explain shows PushedFilters /
  * ReadSchema; a scan that reads all columns for a 2-column projection is
  * wrong").
  */
class PlanQualitySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  private def readSchemas(plan: String): Seq[String] =
    "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan).map(_.group(1)).toSeq

  test("q_norm_email prunes the customer scan to the single needed column") {
    val schemas = readSchemas(planOf("q_norm_email"))
    assert(schemas.nonEmpty)
    // email derives from c_custkey only; c_mktsegment must NOT be read.
    assert(schemas.forall(s => !s.contains("c_mktsegment")), schemas.mkString("; "))
    assert(schemas.forall(s => s.split(",").length <= 1), schemas.mkString("; "))
  }

  test("q_classify reads only the two derivation columns from customer") {
    val schemas = readSchemas(planOf("q_classify"))
    assert(schemas.forall(s => s.split(",").length <= 2), schemas.mkString("; "))
    assert(schemas.forall(s => !s.contains("c_acctbal") && !s.contains("c_name")))
  }

  test("q_tpch_pricing pushes the shipdate filter into the parquet scan") {
    val plan = planOf("q_tpch_pricing")
    assert(plan.contains("PushedFilters:"), "no pushed filters section")
    assert("PushedFilters: \\[[^\\]]*l_shipdate".r.findFirstIn(plan).isDefined,
      "l_shipdate predicate not pushed to the scan")
  }

  test("q_tpch_revenue broadcasts the small dimension side") {
    val plan = planOf("q_tpch_revenue")
    assert(plan.contains("BroadcastHashJoin"), "expected a broadcast hash join")
  }

  test("q_dup_emails aggregates with partial (map-side) combine") {
    val plan = planOf("q_dup_emails")
    // two HashAggregates around one Exchange = partial+final (skew-resistant
    // counting; one hot email never concentrates raw rows on one reducer)
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(400))
  }

  test("q_events_topk_users plans as TakeOrderedAndProject, not a global window") {
    // Global-window top-k moves every distinct user to one partition; the
    // sort+limit shape is per-partition top-k + a k-row merge.
    val plan = planOf("q_events_topk_users")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }

  test("q_dedup_lsh_pairs evaluates the minhash subtree once") {
    // One-pass banding (explode) + bucket-local pair expansion: the plan must
    // contain at most 2 scans of `documents` (shingles + short-doc fallback),
    // not the 8+ of a per-band-union self-join.
    val plan = planOf("q_dedup_lsh_pairs")
    val scans = "ReadSchema:".r.findAllIn(plan).length
    assert(scans <= 2, s"documents scanned $scans times:\n${plan.take(600)}")
  }

  test("alpha-sampling mixers: quota side broadcasts, corpus scans bounded") {
    // The quota/offset frames are (key x bucket)-cardinality-bounded and
    // explicitly broadcast; the corpus appears once for the histogram
    // aggregate (which doubles as the mass pass) and once for the main
    // pass — the weight mixer needs one more, because its eligibility
    // filter depends on the quota, which depends on the full mass
    // aggregate, so its offset histogram cannot reuse the mass pass.
    for ((q, maxScans) <- Seq("q_temperature_mix" -> 2,
        "q_temperature_mix_tokens" -> 3, "q_epoch_mix_expand" -> 2)) {
      val plan = planOf(q)
      assert(plan.contains("BroadcastHashJoin"),
        s"$q quota join is not broadcast:\n${plan.take(600)}")
      // The weight mixer's quota frame is persist()ed (lazy, lineage-
      // backed — no corpus job at operator construction); the textual
      // plan prints the cached build plan once PER InMemoryTableScan
      // reference, each containing the quota side's single corpus scan.
      // Runtime cost = the live scans + ONE cache materialization, so
      // count: ReadSchema − cache reprints + 1 if anything is cached.
      val cached = "InMemoryRelation".r.findAllIn(plan).length
      val scans = "ReadSchema:".r.findAllIn(plan).length - cached +
        (if (cached > 0) 1 else 0)
      assert(scans <= maxScans,
        s"$q scans the corpus $scans times (max $maxScans):\n${plan.take(600)}")
    }
  }

  test("alpha-sampling mixers: no full-key window sort (two-phase rank)") {
    // The mixing key is a corpus SOURCE (a handful of values, one often
    // dominant), so a Window partitioned by the key alone funnels that
    // key's every row into ONE reducer's sort. The two-phase selection
    // must rank within (key, samp_u-bucket) partitions; the only
    // single-attribute-partition windows allowed are the histogram-side
    // offsets (ordered by the bucket id over <= |keys| x 2^16 rows),
    // never a corpus-row window ordered by samp_u.
    // String-matched (windowspecdefinition args: partition columns, then
    // `col ASC/DESC ...` order columns, then the frame) because AQE wraps
    // the unexecuted plan and hides the WindowExec nodes from collect.
    for (q <- Seq("q_temperature_mix", "q_temperature_mix_tokens",
        "q_epoch_mix_expand")) {
      val plan = planOf(q)
      val specs = "windowspecdefinition\\(([^)]*)".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      val corpusRank = specs.filter(_.contains("samp_u"))
      assert(corpusRank.nonEmpty, s"$q lost its rank window")
      corpusRank.foreach { s =>
        val partCols = s.split(",").map(_.trim)
          .takeWhile(a => !a.contains(" ASC") && !a.contains(" DESC"))
        assert(partCols.length >= 2,
          s"$q ranks corpus rows in a single-key window partition ($s) — " +
            "the dominant-source reducer the two-phase selection exists to avoid")
      }
    }
  }

  test("q_temperature_mix_manykeys: keyed metadata — no whole-frame window, " +
      "no broadcast of the quota/offset frames, scans bounded") {
    // The domain-cardinality variant exists because the window form's
    // quota side holds the key space in ONE task (windowspecdefinition
    // partitioned by lit(1)) and broadcasts the bucket offsets. Its plan
    // must contain NEITHER: every window partitioned by real columns
    // (the samp_u rank window by (key, bucket) like the default form),
    // quota/offset joins UNHINTED (the only broadcast HINT is the 1-row
    // weight-sum scalar — Spark/AQE may still auto-broadcast from
    // MEASURED size when the key space is genuinely small, which is the
    // joinVocab posture and exactly right), and ≤ 3 corpus scans
    // (masses + histogram + main pass). Hints are proven absent by
    // planning under autoBroadcastJoinThreshold = -1: only hinted
    // broadcasts survive static planning there.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = SparkEntry.queries("q_temperature_mix_manykeys")(s2, dir)
      .queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, "lost the rank window")
    specs.foreach { s =>
      val partCols = s.split(",").map(_.trim)
        .takeWhile(a => !a.contains(" ASC") && !a.contains(" DESC"))
      assert(partCols.nonEmpty && !partCols.exists(_ == "1"),
        s"whole-frame (single-task) window in the keyed variant: $s")
      if (s.contains("samp_u"))
        assert(partCols.length >= 2,
          s"rank window lost its bucket refinement: $s")
    }
    // With auto-broadcast off, any surviving BroadcastExchange is HINTED:
    // only the one-row Σw6 scalar may be — a hinted broadcast carrying
    // quota or offsets would ship a |keys|-row frame to every executor.
    val bcasts = "BroadcastExchange[^\\n]*\\n([^\\n]*)".r
      .findAllMatchIn(plan).map(_.group(0)).toSeq
    bcasts.foreach { b =>
      assert(!b.contains("quota") && !b.contains("__off"),
        s"quota/offset frame is hint-broadcast in the keyed variant:\n$b")
    }
    // Scans: live plan + one materialization of the persist()ed masses
    // frame (the cached build plan reprints per reference — same
    // accounting as the weight-mixer gate above).
    val cached = "InMemoryRelation".r.findAllIn(plan).length
    val scans = "ReadSchema:".r.findAllIn(plan).length - cached +
      (if (cached > 0) 1 else 0)
    assert(scans <= 3, s"keyed variant scans the corpus $scans times:\n${plan.take(600)}")
  }

  test("q_pipeline_manifest: two live corpus scans, two-phase mixer rank, pack window per shard") {
    // The north-star composition (curate → dedup → mix → shard → pack)
    // must not re-derive anything per stage: the dup-loser side reads the
    // CACHED guardedPairs frame (exactly 2 InMemoryTableScan references —
    // one per mixer pass through the survivor filter), the mixer's
    // two-phase rank survives the composition (samp_u window partitioned
    // by (key, bucket), never key alone), and packing windows per SHARD.
    // Scan budget: 2 live survivor scans + the 2 cache references each
    // printing the pairs build plan's 7 scans = 16 textual ReadSchema;
    // a third live scan breaks the bound.
    val plan = planOf("q_pipeline_manifest")
    val inMem = "InMemoryTableScan".r.findAllIn(plan).length
    assert(inMem === 2, s"pairs cache referenced $inMem times (want 2)")
    val reads = "ReadSchema:".r.findAllIn(plan).length
    assert(reads <= 16, s"composition gained a corpus scan ($reads ReadSchema)")
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val rank = specs.filter(_.contains("samp_u"))
    assert(rank.nonEmpty, "lost the mixer rank window")
    rank.foreach { s =>
      val partCols = s.split(",").map(_.trim)
        .takeWhile(a => !a.contains(" ASC") && !a.contains(" DESC"))
      assert(partCols.length >= 2,
        s"mixer ranks corpus rows in a single-key window partition: $s")
    }
    val pack = specs.filter(_.contains("order_key"))
    assert(pack.nonEmpty, "lost the packing window")
    pack.foreach(s => assert(s.split(",").head.contains("shard"),
      s"packing window not partitioned by shard: $s"))
  }

  test("q_pipeline_manifest_v2: trained gate keeps the two-scan composition; " +
      "GD training never leaks into the serve plan") {
    // v1's contract with the TRAINED filter in the gate slot: training
    // (scaler pass + 20 GD aggregations) runs eagerly at construction
    // against the cached standardized split, so the RETURNED plan must
    // still be: 2 live survivor scans (mixer histogram + main pass, each
    // through the broadcast-model score gate) + the 2 cached-pairs
    // references (7 ReadSchema each) — a third live scan means the
    // training subtree leaked into the serve plan.
    val plan = planOf("q_pipeline_manifest_v2")
    val inMem = "InMemoryTableScan".r.findAllIn(plan).length
    assert(inMem === 2, s"pairs cache referenced $inMem times (want 2)")
    val reads = "ReadSchema:".r.findAllIn(plan).length
    assert(reads <= 16, s"composition gained a corpus scan ($reads ReadSchema)")
    // The model row rides a broadcast into the gate (checkpointed 1-row
    // scan), and the mixer's two-phase rank survives the composition.
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "model row must ride a broadcast")
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val rank = specs.filter(_.contains("samp_u"))
    assert(rank.nonEmpty, "lost the mixer rank window")
    rank.foreach { s =>
      val partCols = s.split(",").map(_.trim)
        .takeWhile(a => !a.contains(" ASC") && !a.contains(" DESC"))
      assert(partCols.length >= 2,
        s"mixer ranks corpus rows in a single-key window partition: $s")
    }
    val pack = specs.filter(_.contains("order_key"))
    assert(pack.nonEmpty, "lost the packing window")
    pack.foreach(s => assert(s.split(",").head.contains("shard"),
      s"packing window not partitioned by shard: $s"))
  }

  test("q_lr_filter: inference is one live corpus scan + a broadcast model row") {
    // Training (stats pass + 20 GD aggregations) runs eagerly against the
    // CACHED standardized frame at construction; the returned plan is the
    // inference pass only: exactly one live documents scan, the 1-row
    // model riding a broadcast, and no shuffle besides the presentation
    // sort — classifier scoring over 100 TB must never leave the scan
    // stage.
    val plan = planOf("q_lr_filter")
    val reads = "ReadSchema:".r.findAllIn(plan).length
    assert(reads === 1, s"inference pass scans the corpus $reads times:\n${plan.take(600)}")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "model row must ride a broadcast")
    assert(!plan.contains("Window"), "no window belongs in the scoring pass")
    assert("HashAggregate".r.findAllIn(plan).isEmpty,
      "no aggregation belongs in the scoring pass")
  }

  test("q_domain_reweight: one corpus token pass feeding keyed aggregation; " +
    "whole-frame windows only over the domain metadata frame") {
    // unigram NLL proxy: documents feeds the vocab aggregate, the token
    // total (freq referenced twice — unigramLogProb's documented shape),
    // the scoring join and the source attach — 4 scans; the
    // groupBy(source) is partial+final; the OVER () windows normalize the
    // ≤|domains|-row aggregate, so their input must arrive through an
    // Exchange fed by a HashAggregate, never a raw corpus scan.
    val plan = planOf("q_domain_reweight")
    val reads = "ReadSchema:".r.findAllIn(plan).length
    assert(reads <= 4, s"documents scanned $reads times:\n${plan.take(600)}")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "per-domain aggregation lost its partial (map-side) combine")
    // the single-partition window exists, but its producer is the keyed
    // aggregate (domain cardinality), not corpus rows
    assert(plan.contains("Window"), "lost the normalization windows")
  }

  test("literal-cap per-key windows plan as WindowGroupLimit (partial top-k)") {
    // capPerKey / weightedSampleTopK rank with a LITERAL limit, which
    // Spark 4.1 rewrites to WindowGroupLimit: each map task keeps only
    // its partition's top `cap` rows per key BEFORE the shuffle, so a
    // dominant key ships ~cap×tasks rows instead of its whole population
    // (measured flat at ×100 under a 94%-one-key corpus — BASELINE.md
    // round-13 skew table). The mixers' quota is a COLUMN, which this
    // rewrite cannot see — that is why they carry the two-phase rank.
    for (q <- Seq("q_source_cap", "q_weighted_sample")) {
      val plan = planOf(q)
      val n = "WindowGroupLimit".r.findAllIn(plan).length
      assert(n >= 2, s"$q lost its partial+final WindowGroupLimit (found $n):" +
        s"\n${plan.take(600)}")
    }
  }

  test("q_mix_shards: no extra corpus scan in the composition; pack window per shard") {
    // The mix→shard→pack manifest must not re-derive the corpus per
    // stage: the final plan holds exactly the mixer's own two scans
    // (histogram + main pass — both lazy since the window-form quota
    // metadata landed); shard assignment and token packing are narrow
    // expressions plus one hash-even shuffle by shard — never a global
    // (empty-partition) window and never a third scan.
    val plan = planOf("q_mix_shards")
    val scans = "ReadSchema:".r.findAllIn(plan).length
    assert(scans <= 2, s"composition scans the corpus $scans times:\n${plan.take(600)}")
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val packSpecs = specs.filter(_.contains("order_key"))
    assert(packSpecs.nonEmpty, "lost the packing window")
    packSpecs.foreach { s =>
      assert(s.split(",").head.contains("shard"),
        s"packing window not partitioned by shard: $s")
    }
  }

  test("q_dedup_clusters final frame is lineage-truncated (constant plan size per round)") {
    // Each label-propagation round localCheckpoints: the returned frame's
    // plan is a scan of materialized rows + sort — NOT five rounds of joins
    // over the re-expanded jaccard subtree.
    val plan = planOf("q_dedup_clusters")
    assert(!plan.contains("Join"), plan.take(600))
  }

  test("q_bm25_topk probes postings via broadcast and reuses the postings exchange") {
    // The corpus postings aggregate feeds the probe, the df and the per-doc
    // lengths: the executed plan must broadcast the query-side tables
    // (query terms, query-restricted df, 1-row stats) and REUSE the
    // postings exchange across its consumers (AQE stage reuse) instead of
    // recomputing the corpus tokenization per consumer.
    val df = SparkEntry.queries("q_bm25_topk")(spark, dir)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(bhj >= 2, s"expected >=2 broadcast joins, got $bhj:\n${plan.take(800)}")
    val reused = "ReusedExchange".r.findAllIn(plan).length
    assert(reused >= 1, s"postings exchange not reused:\n${plan.take(800)}")
  }

  test("q_bm25_persisted never re-derives term statistics from the corpus") {
    // Build happens inside the query closure; the RETURNED plan is the
    // serve path. The only legitimate documents.parquet scan is the 3-row
    // QUERY batch itself — the postings/doclens/stats derivations
    // must all read from the persisted index tables, and the postings scan
    // must carry the collected query-term pushdown (the term-sorted layout's
    // row-group skipping lever).
    val df = SparkEntry.queries("q_bm25_persisted")(spark, dir)
    val plan = df.queryExecution.executedPlan
    val corpusScans = PlanTestUtils.scansOf(plan, "documents.parquet").size
    assert(corpusScans <= 1,
      s"serve plan reads the raw corpus $corpusScans times:\n${plan.toString.take(800)}")
    assert(PlanTestUtils.scansOf(plan, "graft_lex_").nonEmpty,
      "serve plan lost its index-table scans")
    val postingsScans = PlanTestUtils.scansOf(plan, "lex_postings")
    assert(postingsScans.nonEmpty, "no lex_postings scan in the serve plan")
    // Must be the collected IN-list itself — a bare isnotnull(term) that
    // any join pushes down would also stringify with "term", so match the
    // actual In/InSet expression node.
    import org.apache.spark.sql.catalyst.expressions.{In, InSet}
    postingsScans.foreach { f =>
      val hasIn = f.dataFilters.exists(_.exists {
        case i: In => i.value.toString.contains("term")
        case i: InSet => i.child.toString.contains("term")
        case _ => false
      })
      assert(hasIn,
        s"postings scan lost the collected term IN pushdown: ${f.dataFilters}")
    }
  }

  test("kmeansTrain centroids are lineage-truncated (constant plan size per round)") {
    // Each Lloyd's round references the previous centroids TWICE (broadcast
    // assignment side + empty-cluster repair join), so without the per-round
    // localCheckpoint the logical plan DOUBLES every iteration — ~2^iters
    // copies of the seed subtree and an effectively-hung 10-iteration
    // AnnIndex.buildIvf. The returned frame must be a scan of materialized
    // rows, not a tower of joins.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = graft.functions.Similarity.kmeansTrain(
      emb, "vec_id", "embedding", k = 4, iters = 6)
    val plan = cents.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), plan.take(600))
  }

  test("q_unigram_logprob ends up broadcasting the small vocab (AQE runtime sizing)") {
    // The default vocab join carries NO sizing count: AQE converts the
    // statically-planned keyed join into a broadcast join from the
    // MEASURED vocab shuffle bytes. At this scale the vocab is small, so
    // the FINAL (post-execution) plan must show the broadcast — a
    // sort-merge survivor would mean the runtime sizing path is dead.
    val df = SparkEntry.queries("q_unigram_logprob")(spark, dir)
    df.queryExecution.toRdd.foreach(_ => ())
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("BroadcastHashJoin"), finalPlan.take(800))
  }

  test("vocab joins construct lazily: no sizing job beyond the shared read path") {
    // The round-8 auto-switch paid an EAGER vocab.count() (a full extra
    // aggregation over the token stream) at plan-construction time just to
    // pick broadcast-vs-keyed. Plan construction may legitimately fire
    // read-path jobs (parquet footer/schema reads), so the gate is a
    // DELTA: building the vocab queries must fire exactly as many jobs as
    // building a control query over the same table that never had a
    // sizing pass.
    def constructionJobs(f: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      // Drain the bus instead of sleeping: waits exactly until every
      // queued job-start event has reached the listener — deterministic
      // on a loaded host where a fixed sleep can undercount.
      try {
        f
        org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val control = constructionJobs {
      SparkEntry.queries("q_quality_score")(spark, dir); ()
    }
    val unigram = constructionJobs {
      SparkEntry.queries("q_unigram_logprob")(spark, dir); ()
    }
    val tfidf = constructionJobs {
      SparkEntry.queries("q_tfidf_top")(spark, dir); ()
    }
    assert(unigram <= control,
      s"q_unigram_logprob construction fired $unigram job(s) vs control $control")
    assert(tfidf <= control,
      s"q_tfidf_top construction fired $tfidf job(s) vs control $control")
  }

  test("vocab joins with a known row count auto-switch to keyed above the ceiling") {
    // The explicit path: a caller-supplied vocabRows above the session
    // ceiling must force the keyed strategy (merge hint), never a
    // vocabulary-sized broadcast (the 100 TB OOM class); under the
    // ceiling it must broadcast without AQE's help.
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    spark.conf.set("graft.vocab.broadcastMaxTerms", "1")
    try {
      val keyed = graft.functions.TextAnalysis
        .unigramLogProb(docs, "doc_id", "text", vocabRows = 100)
        .queryExecution.executedPlan.toString
      assert(!keyed.contains("BroadcastHashJoin"),
        s"vocabRows above the ceiling still broadcasts:\n${keyed.take(800)}")
      assert(keyed.contains("SortMergeJoin") || keyed.contains("ShuffledHashJoin"),
        s"lost the keyed vocab join:\n${keyed.take(800)}")
    } finally spark.conf.unset("graft.vocab.broadcastMaxTerms")
    val bcast = graft.functions.TextAnalysis
      .unigramLogProb(docs, "doc_id", "text", vocabRows = 100)
      .queryExecution.executedPlan.toString
    assert(bcast.contains("BroadcastHashJoin"), bcast.take(800))
  }

  test("unknown-size vocab joins stay keyed when the byte thresholds forbid broadcast") {
    // The 100 TB safety story for the default (uncounted) path: Spark's
    // byte thresholds govern, and they act on MEASURED sizes. With both
    // thresholds at -1 (the "vocab too big" regime), the final plan must
    // keep the keyed join — no hidden static broadcast of an
    // aggregate-estimated side.
    val prevStatic = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevAqe = spark.conf.getAll.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q_unigram_logprob")(spark, dir)
      df.queryExecution.toRdd.foreach(_ => ())
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(!finalPlan.contains("BroadcastHashJoin"),
        s"byte thresholds at -1 but the vocab still broadcast:\n${finalPlan.take(800)}")
      assert(finalPlan.contains("SortMergeJoin") || finalPlan.contains("ShuffledHashJoin"),
        finalPlan.take(800))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevStatic)
      prevAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("persisted ANN queries never rescan the embeddings corpus as index") {
    // Build happens inside the query closure; the RETURNED plan is the
    // serve path. The only legitimate embeddings.parquet scan is the
    // 5-row QUERY batch itself — the inline paths scan the corpus 2-3
    // more times (centroids + lists / codebook + codes), and exactly
    // those scans must have moved into the persisted index tables.
    for (q <- Seq("q_knn_ivf_persisted", "q_pq_adc_persisted")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan
      // Node count, not string count: the DPP subquery on the partitioned
      // lists scan PRINTS a copy of the probe subtree but reuses its
      // broadcast at runtime — only main-plan scans are real reads.
      val corpusScans = PlanTestUtils.scansOf(plan, "embeddings.parquet").size
      assert(corpusScans <= 1,
        s"$q reads the raw corpus $corpusScans times at query time:\n${plan.toString.take(800)}")
      assert(PlanTestUtils.scansOf(plan, "graft_ann_").nonEmpty,
        s"$q lost its index-table scans")
    }
  }

  test("q_knn_ivf_persisted: the partitioned lists scan is probe-pruned") {
    // The lists table is hive-partitioned by cent_id (AnnIndex
    // .partitionSpec); the probe routing lands as a static PartitionFilter
    // on the scan, so a serve reads nprobe-per-query partitions of the
    // index, never all of it. (Physical partition-count bounds are pinned
    // in AnnIndexSpec with a single query; here the driver query's plan
    // itself must carry the filter.)
    val df = SparkEntry.queries("q_knn_ivf_persisted")(spark, dir)
    val scans = PlanTestUtils.scansOf(df.queryExecution.executedPlan, "ivf_lists")
    assert(scans.nonEmpty, "no ivf_lists scan in the serve plan")
    scans.foreach { f =>
      assert(f.partitionFilters.exists(_.toString.toLowerCase.contains("in")),
        s"lists scan has no probe partition filter: ${f.partitionFilters}")
    }
  }

  test("q_span_trim_text: every join is keyed — no cartesian, no nested loop") {
    // Repeated-set membership is a shingle-keyed semi-join, coverage is a
    // bounded explode, token removal a (doc,pos) anti-join; a cross
    // product anywhere here is the O(N²) regression this gate watches.
    val plan = planOf("q_span_trim_text")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan.take(800))
  }

  test("q_phash_checksum_pairs: banded equi-group candidates, never an all-pairs join") {
    val plan = planOf("q_phash_checksum_pairs")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan.take(600))
    assert(!plan.contains("SortMergeJoin"), "pairs degraded to a corpus self-join")
  }

  test("q_dedup_simhash_pairs: banded equi-join, no cross product, simhash computed once") {
    val plan = planOf("q_dedup_simhash_pairs")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan.take(600))
    // one simhash aggregation feeds banding + verify (bucket-local
    // expansion, no self-join): the 32-vote aggregate appears once
    assert("v_31".r.findAllIn(plan).length <= 2, "simhash subtree duplicated")
  }

  test("q_dedup_survivor is one hash shuffle + window (no join)") {
    val plan = planOf("q_dedup_survivor")
    assert(!plan.contains("Join"), plan.take(600))
    assert(plan.contains("Window"), "expected the survivor-selection window")
  }

  test("q_dedup_incremental never shuffles (or distincts) the history side") {
    // The incremental-dedup contract at 100 TB: the corpus is streamed, not
    // shuffled. The exact verify must be a broadcast semi join whose
    // streamed (history) subtree contains no shuffle exchange.
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    // sparkPlan (pre-AQE) is a traversable tree; broadcast() hints fix join
    // selection statically, so the shape is already decided here.
    val plan = SparkEntry.queries("q_dedup_incremental")(spark, dir)
      .queryExecution.sparkPlan
    val semis = plan.collect {
      case j: BroadcastHashJoinExec if j.joinType == LeftSemi => j
    }
    assert(semis.nonEmpty, s"exact verify is not a broadcast semi join:\n$plan")
    semis.foreach { j =>
      val shuffles = j.left.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty, s"history side shuffled:\n${j.left}")
    }
  }

  test("production pair generator is LSH-banded; q_dedup_jaccard stays the exact witness") {
    // The production path (guardedPairs -> q_corpus_prep/q_dedup_clusters)
    // generates candidates from LSH band buckets (collect_set expansion) +
    // the content-hash floor — NEVER the full inverted-index self-join. The
    // witness must keep the exact inverted-index shape (no banding).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val gen = graft.functions.Dedup
      .nearDupPairsLsh(docs, "doc_id", "text", n = 4, threshold = 0.8)
      .queryExecution.executedPlan.toString
    assert(gen.contains("collect_set"), "LSH bucket expansion missing from pair generator")
    assert(!planOf("q_dedup_jaccard").contains("collect_set"),
      "exactness witness q_dedup_jaccard unexpectedly banded")
  }

  test("q_hard_negatives mines from the DF-capped index — no uncapped shingle self-join") {
    // At lo = 0.01 nearly every shingle qualifies as a candidate key, so an
    // uncapped inverted-index self-join expands quadratically on
    // stop-shingle buckets at scale. The production plan must carry the
    // document-frequency window + the df <= dfCap filter BEFORE the
    // candidate self-join; the exact witness (q_dedup_jaccard) must stay
    // uncapped so it keeps pinning exactness.
    // The df-annotated shingle frame is localCheckpointed (r18 C11 — the
    // five consumers read materialized blocks instead of re-running the
    // window), so the df window itself sits INSIDE the checkpoint and the
    // plan-visible discriminator is the cap filter over the checkpoint
    // scan's df column (the r15 discipline: gate checkpointed subtrees
    // via Scan ExistingRDD, not the operators the checkpoint swallowed).
    val plan = planOf("q_hard_negatives")
    assert("Scan ExistingRDD\\[[^\\]]*df#".r.findFirstIn(plan).isDefined,
      "df-annotated checkpointed index missing — candidates come from " +
        "the raw inverted index")
    assert(plan.contains("<= 1000"),
      "df <= dfCap filter missing from the candidate index")
    val witness = planOf("q_dedup_jaccard")
    assert(!witness.contains("windowspecdefinition(shingle") &&
      !"Scan ExistingRDD\\[[^\\]]*df#".r.findFirstIn(witness).isDefined,
      "exactness witness q_dedup_jaccard unexpectedly capped")
  }

  test("q_dedup_embedding_leader: bucket equi-join only — no cartesian, no pair self-join") {
    // Leader clustering's linear bound rests on its plan shape: members
    // meet ONLY their bucket leader (two bucket equi-joins), never each
    // other. A cross product or an extra vector-vector self-join here
    // silently reintroduces the quadratic all-pairs regime the operator
    // exists to avoid.
    val plan = planOf("q_dedup_embedding_leader")
    assert(!plan.contains("CartesianProduct"), "cartesian in leader dedup")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in leader dedup")
    val joins = "(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllIn(plan).size
    assert(joins <= 2, s"leader dedup grew to $joins joins:\n$plan")
  }

  test("q_tpch_shipping broadcasts the filtered dimension and pushes date filters") {
    val plan = planOf("q_tpch_shipping")
    assert(plan.contains("BroadcastHashJoin"), "customer side not broadcast")
    assert("PushedFilters: \\[[^\\]]*(o_orderdate|l_shipdate)".r.findFirstIn(plan).isDefined,
      "date predicates not pushed to the scans")
    assert(plan.contains("TakeOrderedAndProject"), "top-10 not planned as TakeOrdered")
  }

  test("q_brand_stats broadcasts the part dimension with partial aggregation") {
    val plan = planOf("q_brand_stats")
    assert(plan.contains("BroadcastHashJoin"), "part side not broadcast")
    assert("HashAggregate".r.findAllIn(plan).length >= 2, "no partial+final aggregate")
  }

  test("q_asof_join plans as one window over a union — no join operator at all") {
    // The as-of join's whole point: an inequality join would plan as a
    // per-key cross product (BroadcastNestedLoopJoin / CartesianProduct).
    val plan = planOf("q_asof_join")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan.take(600))
    assert(plan.contains("Window"), "expected the running-last window")
    assert(plan.contains("Union"), "expected the tagged union")
  }

  test("q_range_join is an equi-join on the bucket grid, not a cross product") {
    val plan = planOf("q_range_join")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan.take(600))
    assert(plan.contains("Join"), "expected a real equi-join on __bucket")
  }

  test("q_stream_attribution keys the interval join on user_id — no cross product") {
    // The stream-stream attribution join must hash-partition on the equi
    // key (user_id) with the time bounds as residual condition; a planner
    // regression to NestedLoop/Cartesian would buffer every view against
    // every click at scale.
    val plan = planOf("q_stream_attribution")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan.take(600))
    assert(plan.contains("Join"), "expected a keyed join")
  }

  test("q_stratified_sample is a narrow map stage (no exchange before the sort)") {
    // The deterministic sampler must not shuffle: one scan, one filter, and
    // only the final presentation ORDER BY's exchange.
    val plan = planOf("q_stratified_sample")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"sampler introduced extra shuffles:\n${plan.take(600)}")
  }

  test("q_doc_chunks is fully narrow — no exchange except the presentation sort") {
    // Chunking must be a map-side explode: any extra Exchange means the
    // operator would reshuffle the whole corpus at 100 TB for no reason.
    val plan = planOf("q_doc_chunks")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"chunker introduced shuffles:\n${plan.take(600)}")
    assert(!plan.contains("Join"), "chunker must not join")
  }

  test("q_heavy_hitters pass 2 joins candidates via broadcast, never sort-merge") {
    // The exact recount must semi-join the (<= capacity)-sized candidate set
    // by broadcast: a sort-merge join would shuffle every token of the corpus
    // by value — exactly the full-vocabulary aggregation the sketch avoids.
    val plan = planOf("q_heavy_hitters")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("q_semantic_dedup assigns clusters via broadcast argmax, pairs via equi-join") {
    // Centroids broadcast; the pair stage is an equi-join on cent_id — a
    // NestedLoop/Cartesian would mean the O(N²) semantic join came back.
    val plan = planOf("q_semantic_dedup")
    // Assignment: corpus x 16 broadcast centroids (BroadcastNestedLoopJoin
    // is the correct operator for a broadcast cross join).
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(800))
    // Never an unbroadcast cross product anywhere.
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    // The pair stage must be KEYED: at most the one cent_id equi-join may
    // sort-merge (legitimate for big-big keyed joins); a second SMJ or any
    // growth here means the O(N²) pair join came back unkeyed.
    assert("SortMergeJoin".r.findAllIn(plan).length <= 1, plan.take(800))
  }

  test("q_weighted_sample shuffles once (stratum window) plus presentation sort") {
    val plan = planOf("q_weighted_sample")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"weighted sampler extra shuffles:\n${plan.take(600)}")
    assert(!plan.contains("Join"), "weighted sampler must not join")
  }

  test("q_length_outliers broadcasts the per-language stats back to the corpus") {
    val plan = planOf("q_length_outliers")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("q_topk_per_key aggregates with partial (map-side) combine, no window sort") {
    // The whole point of TopKAggregator: two ObjectHashAggregate stages
    // (partial + final) and NO Window operator.
    val plan = planOf("q_topk_per_key")
    assert("ObjectHashAggregate|SortAggregate".r.findAllIn(plan).length >= 2, plan.take(800))
    assert(!plan.contains("Window"), "top-k must not fall back to a window sort")
  }

  test("q_repeated_ngrams joins on shingle keys — never a cross product") {
    val plan = planOf("q_repeated_ngrams")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(800))
  }

  test("q_pq_encode broadcasts codebooks; the corpus never sort-merge-joins") {
    val plan = planOf("q_pq_encode")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }

  test("q_pq_adc looks distances up via broadcast table, corpus side stays keyed") {
    val plan = planOf("q_pq_adc")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("CartesianProduct"), plan.take(800))
  }

  test("q_bloom_prune_join probes the big side below any exchange (scan-stage pruning)") {
    // The whole point of the semi-join reduction: the Bloom probe filter
    // must sit in the lineitem SCAN stage, so pruned rows never cross an
    // exchange — a probe above the shuffle would move the full table first.
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val plan = SparkEntry.queries("q_bloom_prune_join")(spark, dir)
      .queryExecution.sparkPlan
    val probes = plan.collect {
      case f: FilterExec if f.condition.exists(
        _.isInstanceOf[graft.functions.BloomMightContain]) => f
    }
    assert(probes.nonEmpty, s"no Bloom probe filter in the plan:\n$plan")
    probes.foreach { f =>
      val below = f.collect { case e: Exchange => e }
      assert(below.isEmpty, s"exchange below the probe (probe ran post-shuffle):\n$f")
    }
  }

  test("q_zorder_layout is fully narrow — the clustering key costs zero shuffles") {
    // Z-value + bucket are pure projection arithmetic; only the
    // presentation ORDER BY may exchange.
    val plan = planOf("q_zorder_layout")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"zorder introduced shuffles:\n${plan.take(600)}")
    assert(!plan.contains("Join"), "zorder must not join")
  }

  test("q_quality_score shuffles once for the per-source rank (scoring is map-side)") {
    val plan = planOf("q_quality_score")
    // window partition exchange + presentation sort; scoring adds none
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"scorer introduced extra shuffles:\n${plan.take(600)}")
    assert(!plan.contains("Join"), "inference must not join")
  }

  test("q_snapshot_delta: both snapshot sides hash below their exchanges") {
    // The full-outer join may shuffle (two sides, narrow hash projections) —
    // but the document text must never cross an exchange.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val plan = SparkEntry.queries("q_snapshot_delta")(spark, dir)
      .queryExecution.sparkPlan
    val leaky = plan.collect {
      case e: ShuffleExchangeLike if e.output.exists(_.name == "text") => e
    }
    assert(leaky.isEmpty, s"document text crosses an exchange:\n$plan")
  }

  test("q_vocab_coverage takes top-k by sort+limit; the cumulative window sees k rows") {
    // The vocabulary must never be globally windowed: top-k is
    // TakeOrderedAndProject (per-partition top-k + k-row merge), and the
    // single-partition cumulative window runs AFTER the limit.
    val plan = planOf("q_vocab_coverage")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    val windowIdx = plan.indexOf("Window")
    val takeIdx = plan.indexOf("TakeOrderedAndProject")
    assert(windowIdx >= 0 && takeIdx > windowIdx,
      "cumulative window does not sit above the top-k limit")
  }

  test("q_dedup_prefix_pairs joins on shingle keys — never a cross product") {
    val plan = planOf("q_dedup_prefix_pairs")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      plan.take(800))
  }

  test("q_incremental_agg: state and delta stay partial-aggregated before the merge") {
    // Both legs aggregate (partial+final) BEFORE the union; the merge then
    // re-aggregates narrow state rows. Raw event rows must never reach the
    // final aggregation — that would be the history rescan the operator
    // exists to avoid.
    val plan = planOf("q_incremental_agg")
    assert("HashAggregate".r.findAllIn(plan).length >= 4, plan.take(800))
    assert(!plan.contains("Join"), "merge must be a union, not a join")
  }

  test("q_events_anomaly broadcasts the per-key moments back onto the rollup") {
    // The stats frame is |keys| rows; joining it sort-merge would shuffle
    // the rollup a second time for nothing.
    val plan = planOf("q_events_anomaly")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("q_events_rolling windows the daily rollup, partitioned by key") {
    // Exactly one Window, running over the aggregated daily frame (two
    // HashAggregate halves below it), partitioned — not a global window.
    val plan = planOf("q_events_rolling")
    assert("Window".r.findAllIn(plan).length >= 1, plan.take(800))
    val winIdx = plan.indexOf("Window")
    assert(plan.indexOf("HashAggregate", winIdx) > winIdx,
      "window must sit above the daily aggregation, not above raw events")
  }

  test("q_fuzzy_nn joins on the block key — never a cross product") {
    val plan = planOf("q_fuzzy_nn")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      plan.take(800))
  }

  test("q_seq_len_curve: cumulative window runs over the bucket rollup only") {
    // The single-partition window is safe BECAUSE it sees <= max_len/8
    // bucket rows: it must sit above the bucket aggregation.
    val plan = planOf("q_seq_len_curve")
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, plan.take(600))
    assert(plan.indexOf("HashAggregate", winIdx) > winIdx,
      "cumulative window does not sit above the bucket aggregation")
  }

  test("q_html_extract is a narrow map — no join, one pruned documents scan") {
    val plan = planOf("q_html_extract")
    assert(!plan.contains("Join"), plan.take(600))
    val schemas = readSchemas(plan)
    // needs doc_id, source, text — must not read lang/n_chars
    assert(schemas.forall(s => !s.contains("lang") && !s.contains("n_chars")),
      schemas.mkString("; "))
  }

  test("q_url_dedup aggregates the canonical key with partial combine") {
    val plan = planOf("q_url_dedup")
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("q_bpe_pairs: both aggregations partial+final; top-k via sort+limit") {
    val plan = planOf("q_bpe_pairs")
    // vocab count and pair count each plan partial+final = 4 HashAggregates
    assert("HashAggregate".r.findAllIn(plan).length >= 4, plan.take(600))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }

  test("q_paragraph_dup joins on the paragraph hash — never a cross product") {
    val plan = planOf("q_paragraph_dup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("q_ngram_novelty joins on shingle keys — never a cross product") {
    val plan = planOf("q_ngram_novelty")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("q_holdout_split: pruned scan + partial-aggregated source rollup") {
    val plan = planOf("q_holdout_split")
    val schemas = readSchemas(plan)
    assert(schemas.forall(s => s.split(",").length <= 2), schemas.mkString("; "))
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan.take(600))
  }

  test("q_dedup_triangles: wedge and closing joins are keyed (no cross product)") {
    val plan = planOf("q_dedup_triangles")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("q_source_rank: no cartesian product; the only nested-loop is the 1-row dangling broadcast") {
    val plan = planOf("q_source_rank")
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    // the dangling-mass scalar joins via broadcast; edge/rank joins must not
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 1, s"$bnlj nested-loop joins\n${plan.take(600)}")
  }

  test("curation funnel's own gates read the text column exactly once") {
    import spark.implicits._
    // Empty pair frame isolates the funnel-owned scans from the shared
    // (cached) LSH pair subtree: the three text-derived gates must share
    // ONE text-bearing scan — at 100 TB the text column dominates IO.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val plan = pipeline.Curation
      .funnel(docs, "doc_id", "text", "lang", "n_chars", pairs, 0.6)
      .queryExecution.executedPlan.toString
    val textScans = readSchemas(plan).count(_.contains("text"))
    assert(textScans === 1, s"$textScans text scans\n${plan.take(800)}")
  }

  test("q_paragraph_dedup_text reuses one text scan via the shared ph exchange") {
    val plan = planOf("q_paragraph_dedup_text")
    val textScans = readSchemas(plan).count(_.contains("text"))
    assert(textScans === 1, s"$textScans text scans\n${plan.take(800)}")
  }

  test("keyed wave: join/aggregate/exchange operator count is CONSTANT in job count") {
    // The whole point of the single-plan wave: N jobs compile ONE
    // classify/issues/consolidate subtree (job_id-keyed), so the number of
    // join/aggregate/shuffle operators must not grow with wave size — only
    // the union's leaf count may. A regression back to per-job plan
    // branches would multiply every operator by N.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    def csv(n: Int) = (1 to 3).map(r => (r.toLong, s"u$n-$r@b.co", "F", "L", "C"))
      .toDF("row_number", "email", "first_name", "last_name", "company")
    val staging0 = Seq.empty[(Long, Int, String, String, String, String, String, String)]
      .toDF("staging_id", "staging_job_id", "staging_email", "staging_first_name",
        "staging_last_name", "staging_company", "staging_status", "staging_row_hash")
    val issues0 = Seq.empty[(Int, String, String, String, Boolean)]
      .toDF("issues_job_id", "issue_type", "issue_key", "issue_description", "issue_resolved")
    val items0 = Seq.empty[(Int, String, String, Long)]
      .toDF("issues_job_id", "issue_type", "issue_key", "item_staging_id")
    val contacts0 = Seq((9L, "u1", "x@b.co", "P", "Q", "R"))
      .toDF("staging_id", "contacts_user_id", "contact_email",
        "contact_first_name", "contact_last_name", "contact_company")
    def keyedPlan(nJobs: Int): String = {
      val input = (1 to nJobs).map(j => csv(j).withColumn("job_id", lit(j)))
        .reduce(_.unionByName(_))
      val jobUsers = (1 to nJobs).map(j => (j, s"u$j")).toDF("job_id", "job_user_id")
      val k = graft.pipeline.Lifecycle.initialProcessKeyed(
        input, jobUsers, staging0, issues0, items0, contacts0)
      val plan = k.counters.queryExecution.executedPlan.toString
      k.unpersist()
      plan
    }
    val p2 = keyedPlan(2)
    val p8 = keyedPlan(8)
    def ops(plan: String, op: String) = op.r.findAllIn(plan).size
    Seq("Join", "Aggregate", "Exchange").foreach { op =>
      assert(ops(p8, op) === ops(p2, op),
        s"$op operator count grew with job count (${ops(p2, op)} -> ${ops(p8, op)})")
    }
    assert(!p8.contains("CartesianProduct"), "keyed wave plan contains a cross product")
    assert(p8.contains("BroadcastHashJoin") || p8.contains("BroadcastNestedLoopJoin"),
      "jobUsers/contacts joins should broadcast the small side")
  }

  test("q_dsir_weights: the ratio join broadcasts; the corpus never cross-joins") {
    // The per-bucket log-ratio table is bounded by the bucket count BY
    // CONSTRUCTION (groupBy on a pmod key), so serving it is an explicit
    // broadcast join — if it ever degrades to a shuffled join, the fit
    // table is being treated as data-sized and the contract broke.
    val plan = planOf("q_dsir_weights")
    assert(plan.contains("BroadcastHashJoin"), "ratio join is not broadcast")
    assert(!plan.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("q_dsir_sample: global top-k via TakeOrdered, never a full sort") {
    val plan = planOf("q_dsir_sample")
    assert(plan.contains("TakeOrderedAndProject"),
      "resample selection lost the TakeOrdered top-k")
  }

  test("q_corpus_shuffle: two 2-column corpus scans, rank windows per (key, bucket)") {
    // The global shuffle's accounting claim: histogram + rank pass only
    // (the hash sort key's static domain skips the min/max probe), each
    // reading just (doc_id, source), and the global rank partitioned by
    // (constant key, hash bucket) — never a whole-frame corpus window.
    val plan = planOf("q_corpus_shuffle")
    val scans = readSchemas(plan)
    assert(scans.nonEmpty && scans.length <= 2,
      s"expected <= 2 corpus scans, got ${scans.length}: $scans")
    assert(scans.forall(_.split(",").length <= 2), scans.mkString("; "))
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val rank = specs.filter(_.contains("__fp"))
    assert(rank.nonEmpty, "lost the global rank window")
    rank.foreach { s =>
      val partCols = s.split(",").map(_.trim)
        .takeWhile(a => !a.contains(" ASC") && !a.contains(" DESC"))
      // Catalyst folds the constant key out of the partition spec,
      // leaving the bucket alone — the 2^16-way spread IS the contract;
      // an empty partition list (whole-frame window) is the regression.
      assert(partCols.nonEmpty && partCols.exists(_.contains("__b")),
        s"global shuffle ranks corpus rows without the bucket refinement: $s")
    }
  }

  test("q_curriculum_order: stage table cached once, offsets broadcast, bucketed rank") {
    // The stage column is the whole KN chain: the wiring localCheckpoints
    // it (not persist() — queries() frames outlive the call, and an
    // unreleasable cache entry per invocation is the round-14 ADVICE
    // leak), so the expensive subtree materializes ONCE at construction
    // and the three references (stage masses + histogram + rank) read
    // checkpoint blocks: the SERVE plan must carry ZERO corpus scans and
    // no InMemoryRelation; the stage-offset join is an explicit
    // broadcast.
    val plan = planOf("q_curriculum_order")
    assert(plan.contains("Scan ExistingRDD"),
      "stage table lost its checkpoint — the KN chain re-runs per reference")
    assert(!plan.contains("InMemoryRelation"),
      "a persist() crept back into the curriculum wiring (session cache leak)")
    assert(!plan.contains("ReadSchema:"),
      "the serve plan re-scans the corpus — the checkpointed stage table " +
        "should be its only input")
    assert(plan.contains("BroadcastHashJoin"), "stage-offset join not broadcast")
    val specs = "windowspecdefinition\\(([^)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    val rank = specs.filter(_.contains("__fp"))
    assert(rank.nonEmpty, "lost the per-stage rank window")
    rank.foreach { s =>
      val partCols = s.split(",").map(_.trim)
        .takeWhile(a => !a.contains(" ASC") && !a.contains(" DESC"))
      assert(partCols.length >= 2,
        s"curriculum ranks corpus rows in a single-key window: $s")
    }
  }

  test("no query plan falls back out of whole-stage codegen") {
    // A failed codegen compile logs and silently degrades; spot-check the
    // expression-heavy queries still contain codegen stages.
    Seq("q_row_hash", "q_knn_brute", "q_dedup_simhash", "q_dedup_incremental").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      // collect() executes THIS frame's QueryExecution (count() would build a
      // new one, leaving this AQE plan initial and codegen-unwrapped); the
      // finalized plan marks codegened stages "*(n)" in simple mode
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"$q plan not finalized")
      assert(plan.contains("*("), s"$q lost whole-stage codegen")
    }
  }
}
