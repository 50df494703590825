package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the web-corpus preparation operators: HTML main-content
  * extraction, URL canonicalization, BPE pair counting, and
  * paragraph-level cross-document dedup (SURVEY.md §7.6).
  */
class WebTextSpec extends SparkSpec {
  import spark.implicits._

  // ---- stripHtml ---------------------------------------------------------

  private def strip(html: String): String =
    Seq(html).toDF("h")
      .select(TextAnalysis.stripHtml(col("h")).as("c"))
      .as[String].head()

  test("stripHtml drops script/style subtrees, tags, and decodes entities") {
    val html =
      """<html><head><title>T</title><style>p { color: red }</style></head>
        |<body><script>var x = 1 &amp;&amp; 2;</script>
        |<p>Hello &amp; <b>world</b> &lt;ok&gt;</p></body></html>""".stripMargin
    assert(strip(html) === "T Hello & world <ok>")
  }

  test("stripHtml is case-insensitive on block tags and survives attributes") {
    val html = """<SCRIPT type="text/javascript">bad()</SCRIPT><P>keep</P>"""
    assert(strip(html) === "keep")
  }

  test("stripHtml decodes quot and apostrophe entities") {
    assert(strip("<p>&quot;a&#39;b&quot;</p>") === "\"a'b\"")
  }

  test("htmlRetainedFrac is low for markup-heavy pages") {
    val frac = Seq("<div><div><div>x</div></div></div>").toDF("h")
      .select(TextAnalysis.htmlRetainedFrac(col("h")).as("f"))
      .as[Double].head()
    assert(frac > 0.0 && frac < 0.2)
  }

  // ---- canonicalizeUrl ---------------------------------------------------

  private def canon(url: String): String =
    Seq(url).toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u")).as("c"))
      .as[String].head()

  test("canonicalizeUrl collapses the classic variant noise to one key") {
    val variants = Seq(
      "HTTPS://WWW.Example.COM:443/Docs/7?utm_source=feed&page=2#frag",
      "https://www.example.com/Docs/7?page=2&utm_campaign=x",
      "https://www.example.com/Docs/7/?page=2",
      "https://www.example.com/Docs/7?gclid=abc&page=2")
    val keys = variants.map(canon).distinct
    assert(keys === Seq("https://www.example.com/Docs/7?page=2"))
  }

  test("canonicalizeUrl keeps path case, drops only default ports") {
    assert(canon("http://Host.Com:80/A/B") === "http://host.com/A/B")
    assert(canon("https://host.com:8443/x") === "https://host.com:8443/x")
  }

  test("canonicalizeUrl drops an all-tracking query entirely") {
    assert(canon("https://h.com/p?utm_source=a&utm_medium=b") === "https://h.com/p")
  }

  test("canonicalizeUrl keeps the root slash") {
    assert(canon("https://h.com/?ref=x") === "https://h.com/")
  }

  test("canonicalizeUrl never rewrites a literal '&' in the path") {
    // '&' is a legal RFC 3986 path sub-delim: /a&b and /a?b are DIFFERENT
    // fetch targets and must not collide
    assert(canon("https://h.com/a&b") === "https://h.com/a&b")
    assert(canon("https://h.com/a&b?x=1") === "https://h.com/a&b?x=1")
    assert(canon("https://h.com/a&b?utm_source=f&x=1") === "https://h.com/a&b?x=1")
  }

  // ---- bpePairCounts -----------------------------------------------------

  test("bpePairCounts weights pairs by word frequency") {
    val df = Seq("aab aab ab", "xy").toDF("text")
    val got = TextAnalysis.bpePairCounts(df, "text", topK = 10)
      .as[(String, Long)].collect().toMap
    // "aab" freq 2 contributes aa:2, ab:2; "ab" freq 1 contributes ab:1
    assert(got("ab") === 3L)
    assert(got("aa") === 2L)
    assert(got("xy") === 1L)
  }

  test("bpePairCounts ignores single-char words and respects topK") {
    val df = Seq("a b c dd").toDF("text")
    val rows = TextAnalysis.bpePairCounts(df, "text", topK = 1)
      .as[(String, Long)].collect()
    assert(rows.toSeq === Seq(("dd", 1L)))
  }

  // ---- paragraphDupStats -------------------------------------------------

  test("paragraphDupStats flags shared paragraphs across documents") {
    val para = (1 to 32).map(i => s"w$i").mkString(" ")   // exactly one chunk
    val uniqueA = (100 to 131).map(i => s"a$i").mkString(" ")
    val uniqueB = (200 to 231).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$para $uniqueA"),  // chunk1 shared, chunk2 unique
      (2L, s"$para $uniqueB"),  // chunk1 shared, chunk2 unique
      (3L, uniqueB)             // copies doc 2's second chunk
    ).toDF("doc_id", "text")
    val got = TextAnalysis.paragraphDupStats(df, "doc_id", "text", 32)
      .select("doc_id", "n_paras", "dup_paras", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 2L, 1.0))) // both its chunks appear elsewhere
    assert(got(3L) === ((1L, 1L, 1.0)))
  }

  test("paragraphDupStats: fully unique corpus has zero dup fraction") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.paragraphDupStats(df, "doc_id", "text", 32)
      .agg(sum("dup_paras")).as[Long].head()
    assert(got === 0L)
  }

  // ---- bpeTrainMerges / bpeTokenCounts -----------------------------------

  test("bpeTrainMerges learns the hand-computed merge sequence") {
    // vocab: aaab x3, ab x2
    val df = Seq("aaab aaab", "aaab ab ab").toDF("text")
    val got = TextAnalysis.bpeTrainMerges(df, "text", numMerges = 10)
      .as[(Long, String, String, Long)].collect().toSeq
    // iter0: (a,a)=6 beats (a,b)=5; iter1: (a,b)=3+2; iter2: (aa,ab)=3
    assert(got === Seq(
      (0L, "a", "a", 6L), (1L, "a", "b", 5L), (2L, "aa", "ab", 3L)))
  }

  test("bpeTrainMerges: argmax ties break to the smallest pair; numMerges caps") {
    val df = Seq("ab ab cd cd").toDF("text")
    val got = TextAnalysis.bpeTrainMerges(df, "text", numMerges = 1)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq((0L, "a", "b", 2L)))
    val full = TextAnalysis.bpeTrainMerges(df, "text", numMerges = 10)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(full === Seq((0L, "a", "b", 2L), (1L, "c", "d", 2L)))
  }

  test("bpeTrainMerges first merge agrees with bpePairCounts top-1") {
    val df = Seq("spark spark sparse park", "par par").toDF("text")
    val top = TextAnalysis.bpePairCounts(df, "text", topK = 1)
      .as[(String, Long)].head()
    val first = TextAnalysis.bpeTrainMerges(df, "text", numMerges = 1)
      .as[(Long, String, String, Long)].head()
    assert(first._2 + first._3 === top._1 && first._4 === top._2)
  }

  test("bpeTokenCounts segments with learned merges, unknown chars stay split") {
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val df = Seq((1L, "aaab ab xyz"), (2L, "q"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenCounts(df, "doc_id", "text", merges)
      .as[(Long, Long)].collect().toMap
    // aaab -> [aaab] (1), ab -> [ab] (1), xyz -> x y z (3); q -> 1;
    // null text -> 0 tokens (not a task-aborting NPE)
    assert(got === Map(1L -> 5L, 2L -> 1L, 3L -> 0L))
  }

  // ---- dedupParagraphs ---------------------------------------------------

  test("dedupParagraphs: first occurrence survives, docs reassemble in order") {
    val para = (1 to 32).map(i => s"w$i").mkString(" ")
    val uniqA = (100 to 131).map(i => s"a$i").mkString(" ")
    val uniqB = (200 to 231).map(i => s"b$i").mkString(" ")
    val uniqC = (300 to 331).map(i => s"c$i").mkString(" ")
    val df = Seq(
      (1L, s"$para $uniqA"),   // first occurrence of para -> keeps both
      (2L, s"$para $uniqB"),   // loses para (doc 1 owns it), keeps uniqB
      (3L, uniqB),             // its only chunk first appeared in doc 2
      (4L, s"$uniqC $uniqC")   // within-doc repeat: keeps the FIRST copy
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dedupParagraphs(df, "doc_id", "text", 32)
      .select("doc_id", "n_paras", "kept_paras", "clean_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 2L, s"$para $uniqA")))
    assert(got(2L) === ((2L, 1L, uniqB)))
    assert(got(3L) === ((1L, 0L, "")))    // fully-duplicated doc -> empty
    assert(got(4L) === ((2L, 1L, uniqC)))
  }

  test("trimRepeatedSpans: cross-doc spans excised everywhere, unique text intact") {
    val boiler = (1 to 6).map(i => s"s$i").mkString(" ") // 6-token shared span
    val uniqA = (100 to 109).map(i => s"a$i").mkString(" ")
    val uniqB = (200 to 209).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$boiler $uniqA"),  // shares the span -> loses exactly it
      (2L, s"$uniqB $boiler"),  // span at the END is excised too
      (3L, uniqA.replace("a10", "c10")), // no shared 4-gram -> untouched
      (4L, s"$boiler")          // pure boilerplate -> empty survivor
    ).toDF("doc_id", "text")
    val got = Dedup.trimRepeatedSpans(df, "doc_id", "text", n = 4, minDocs = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((16L, 6L, uniqA)))
    assert(got(2L) === ((16L, 6L, uniqB)))
    assert(got(3L)._2 === 0L) // nothing removed
    assert(got(4L) === ((6L, 6L, "")))
  }

  test("trimRepeatedSpans: within-doc repetition alone never triggers removal") {
    val phrase = (1 to 4).map(i => s"p$i").mkString(" ")
    val filler = (50 to 57).map(i => s"f$i").mkString(" ")
    val df = Seq(
      (1L, s"$phrase $phrase $filler"), // repeats only within itself
      (2L, (300 to 315).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.trimRepeatedSpans(df, "doc_id", "text", n = 4, minDocs = 2)
      .as[(Long, Long, Long, String)].collect()
    assert(got.forall(_._3 == 0L), got.mkString("; "))
  }

  test("trimRepeatedSpans: overlapping repeated shingles cover a contiguous span once") {
    // 6 shared tokens with n=4 -> 3 overlapping repeated shingles whose
    // coverage union is exactly the 6 tokens, not 12.
    val span = (1 to 6).map(i => s"o$i").mkString(" ")
    val df = Seq(
      (1L, s"$span " + (100 to 105).map(i => s"x$i").mkString(" ")),
      (2L, s"$span " + (200 to 205).map(i => s"y$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.trimRepeatedSpans(df, "doc_id", "text", n = 4, minDocs = 2)
      .as[(Long, Long, Long, String)].collect()
    assert(got.forall(_._3 == 6L), got.mkString("; "))
  }

  // ---- splitLeakage ------------------------------------------------------

  test("splitLeakage: valid docs with train near-dups are flagged") {
    // md5 prefixes: "doc one"=e4 "doc two"=86 "doc three"=fa "alpha"=2c
    // "beta"=98 "delta"=63; threshold "90" -> valid = {2, 4, 6}
    val docs = Seq(
      (1L, "doc one"), (2L, "doc two"), (3L, "doc three"),
      (4L, "alpha"), (5L, "beta"), (6L, "delta")
    ).toDF("doc_id", "text")
    val pairs = Seq(
      (1L, 2L), (2L, 3L),  // valid doc 2 has TWO train neighbors
      (4L, 6L),            // valid-valid pair: NOT leakage
      (3L, 5L)             // train-train pair: ignored
    ).toDF("id_a", "id_b")
    val got = Dedup.splitLeakage(docs, "doc_id", "text", pairs, "90")
      .select("doc_id", "n_train_neighbors", "is_leaked")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      2L -> ((2L, true)), 4L -> ((0L, false)), 6L -> ((0L, false))))
  }

  // ---- langMismatch ------------------------------------------------------

  test("langMismatch flags labeled-vs-detected disagreement") {
    val df = Seq(
      (1L, "the cat of the hat", "en"),        // detected en == labeled
      (2L, "der hund und die katze ist", "en"), // detected de -> mismatch
      (3L, "xyzzy plugh", "en")  // zero hits: priority tie-break -> en
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.langMismatch(df, "doc_id", "text", "lang")
      .select("doc_id", "predicted_lang", "is_mismatch")
      .as[(Long, String, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === (("en", false)))
    assert(got(2L) === (("de", true)))
    assert(got(3L) === (("en", false)))
  }

  // ---- ngramNovelty ------------------------------------------------------

  test("ngramNovelty credits an n-gram to its first (min-id) document") {
    val df = Seq(
      (1L, "a b c d e"),          // bigrams ab bc cd de — all first here
      (2L, "a b c x y"),          // ab bc repeat doc 1; cx xy novel
      (3L, "a b")                 // ab repeats — zero novelty
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(df, "doc_id", "text", n = 2)
      .select("doc_id", "n_ngrams", "novel_ngrams", "novelty_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((4L, 4L, 1.0)))
    assert(got(2L) === ((4L, 2L, 0.5)))
    assert(got(3L) === ((1L, 0L, 0.0)))
  }

  test("ngramNovelty omits docs shorter than one n-gram") {
    val df = Seq((1L, "one two three"), (2L, "solo")).toDF("doc_id", "text")
    val ids = TextAnalysis.ngramNovelty(df, "doc_id", "text", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  // ---- holdoutSplitCounts ------------------------------------------------

  test("holdoutSplitCounts: assignment is by content hash prefix and stable") {
    val df = Seq(
      ("s1", "doc one"), ("s1", "doc two"), ("s2", "doc three")
    ).toDF("source", "text")
    val got = TextAnalysis.holdoutSplitCounts(df, "source", "text", "90")
      .select("source", "n_docs", "n_valid", "n_train")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // md5 prefixes: "doc one"=e4.., "doc two"=86.., "doc three"=fa..
    assert(got("s1") === ((2L, 1L, 1L)))
    assert(got("s2") === ((1L, 0L, 1L)))
    // growth-stability: adding docs never changes an existing assignment
    val grown = df.union(Seq(("s2", "doc four")).toDF("source", "text"))
    val g2 = TextAnalysis.holdoutSplitCounts(grown, "source", "text", "90")
      .select("source", "n_valid").as[(String, Long)].collect().toMap
    assert(g2("s1") === 1L)
  }

  // ---- containmentPairs --------------------------------------------------

  test("containmentPairs finds a small doc embedded in a large one that jaccard misses") {
    val embedded = (1 to 10).map(i => s"e$i").mkString(" ")   // 7 4-gram shingles
    val filler = (1 to 60).map(i => s"f$i").mkString(" ")
    val df = Seq(
      (1L, embedded),                    // fully contained in doc 2
      (2L, s"$filler $embedded"),        // large container
      (3L, "totally unrelated words here repeated unrelated words again")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 4, threshold = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq === Seq((1L, 2L, 1.0)))
    // sanity: symmetric jaccard at 0.8 would never pair them
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", n = 4, threshold = 0.8)
      .count()
    assert(jac === 0L)
  }

  test("containmentPairs: partial overlap below threshold is dropped") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, s"$shared unique tail words here"),   // only ~half its shingles shared
      (2L, s"$shared other completely different continuation text")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 4, threshold = 0.9)
    assert(got.count() === 0L)
  }

  // ---- simHistogram ------------------------------------------------------

  test("simHistogram: buckets cover sampled pairs exactly; sampling is deterministic") {
    val data = (0L until 40L).map { i =>
      i -> Array.tabulate(4)(j => (((i * 7 + j * 3) % 11).toFloat - 5f) / 3f)
    }
    val df = data.toDF("vec_id", "embedding")
    val got = Similarity.simHistogram(df, "vec_id", "embedding",
      rateA = 0.5, rateB = 0.5)
      .as[(Long, Long, Double)].collect()
    // brute-force replication of the hash sampling + bucketing
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val thr = f"${(0.5 * 4294967296.0).toLong}%08x"
    val sa = data.filter { case (i, _) => md5hex(s"simA:$i").take(8) < thr }
    val sb = data.filter { case (i, _) => md5hex(s"simB:$i").take(8) < thr }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = (for {
      (ia, va) <- sa; (ib, vb) <- sb if ia < ib
      dot = (0 until 4).map(k => va(k).toDouble * vb(k).toDouble).sum
      na = math.sqrt((0 until 4).map(k => va(k).toDouble * va(k).toDouble).sum)
      nb = math.sqrt((0 until 4).map(k => vb(k).toDouble * vb(k).toDouble).sum)
    } yield math.floor(r6(dot / (na * nb)) * 20).toLong)
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    assert(got.map(r => r._1 -> r._2).toMap === expected)
    got.foreach { case (b, _, lo) => assert(lo === b / 20.0) }
  }

  test("simHistogram: rate contract is enforced — oversized sample sides fail fast") {
    val df = (0L until 40L).map { i =>
      i -> Array.tabulate(4)(j => (((i * 7 + j * 3) % 11).toFloat - 5f) / 3f)
    }.toDF("vec_id", "embedding")
    // ~20 x ~20 sampled rows: pair product > 100 trips the maxPairs guard
    val ePairs = intercept[IllegalArgumentException] {
      Similarity.simHistogram(df, "vec_id", "embedding",
        rateA = 0.5, rateB = 0.5, maxPairs = 100L)
    }
    assert(ePairs.getMessage.contains("maxPairs"))
    // broadcast side alone over its bound trips the broadcast guard
    val eBcast = intercept[IllegalArgumentException] {
      Similarity.simHistogram(df, "vec_id", "embedding",
        rateA = 0.5, rateB = 0.5, maxBroadcastRows = 5L)
    }
    assert(eBcast.getMessage.contains("broadcast"))
    // inside the bounds the histogram is unchanged by the guard parameters
    val n = Similarity.simHistogram(df, "vec_id", "embedding",
      rateA = 0.5, rateB = 0.5).count()
    assert(n > 0)
  }

  // ---- clusterBalancedSample ---------------------------------------------

  test("clusterBalancedSample caps every cell and reports pre-cap sizes") {
    // 30 vectors in 2 tight clusters around two axis directions
    val data = (0L until 30L).map { i =>
      val base = if (i % 2 == 0) Array(10f, 0f, 0f, 0f) else Array(0f, 10f, 0f, 0f)
      i -> base.zipWithIndex.map { case (x, j) => x + ((i * 3 + j) % 5) * 0.01f }
    }
    val df = data.toDF("vec_id", "embedding")
    val got = Similarity.clusterBalancedSample(df, "vec_id", "embedding",
      nlist = 2, capPerCell = 5)
      .as[(Long, Long, Long)].collect()
    // two cells (centroids = vec 0 and vec 1), 15 members each, capped at 5
    assert(got.length === 10)
    val byCell = got.groupBy(_._2)
    assert(byCell.keySet === Set(0L, 1L))
    byCell.values.foreach { rows =>
      assert(rows.length === 5)
      assert(rows.forall(_._3 === 15L))   // pre-cap population preserved
    }
    // determinism: same input, different partitioning, same kept set
    val again = Similarity.clusterBalancedSample(df.repartition(7), "vec_id",
      "embedding", nlist = 2, capPerCell = 5)
      .as[(Long, Long, Long)].collect()
    assert(again.toSet === got.toSet)
  }

  // ---- clusterWeights ----------------------------------------------------

  test("bestRepresentative: highest quality survives, ties break to lowest id") {
    val nodes = Seq((1L, 5L), (2L, 9L), (3L, 9L), (4L, 1L))
      .toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b") // {1,2,3} + {4}
    val got = Dedup.bestRepresentative(nodes, "doc_id", "quality", pairs)
      .select("doc_id", "survivor_id", "is_kept")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // quality 9 tie between 2 and 3 -> lowest id 2 wins; min-id 1 does NOT
    assert(got(1L) === ((2L, false)))
    assert(got(2L) === ((2L, true)))
    assert(got(3L) === ((2L, false)))
    assert(got(4L) === ((4L, true)))  // singleton keeps itself
  }

  test("clusterWeights: each duplicate family carries unit total mass") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b") // {1,2,3} + {4} + {5}
    val got = Dedup.clusterWeights(nodes, "doc_id", pairs)
      .select("doc_id", "cluster_id", "cluster_size", "sample_weight")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((1L, 3L, 0.333333)))
    assert(got(3L) === ((1L, 3L, 0.333333)))
    assert(got(4L) === ((4L, 1L, 1.0)))
    assert(got(5L) === ((5L, 1L, 1.0)))
  }

  // ---- tokenizer trainer vocabulary envelope ------------------------------

  test("tokenizer trainers refuse a vocabulary past graft.tokenizer.maxTypes " +
      "with pruning guidance") {
    // 5 distinct trainable words (>= 2 chars) against a ceiling of 3.
    val df = Seq((1L, "alpha beta gamma delta epsilon alpha"))
      .toDF("doc_id", "text")
    spark.conf.set("graft.tokenizer.maxTypes", "3")
    try {
      val e1 = intercept[IllegalArgumentException] {
        TextAnalysis.bpeTrainMerges(df, "text", numMerges = 2)
      }
      assert(e1.getMessage.contains("graft.tokenizer.maxTypes") &&
        e1.getMessage.contains("maxTypes (top-K by frequency"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        TextAnalysis.wordpieceTrainMerges(df, "text", numMerges = 2)
      }
      assert(e2.getMessage.contains("graft.tokenizer.maxTypes"), e2.getMessage)
      // The SentencePiece posture: pruning to the ceiling makes the same
      // corpus trainable (the guard observes the PRUNED table).
      assert(TextAnalysis.bpeTrainMerges(df, "text", numMerges = 2,
        maxTypes = Some(3)).count() >= 0L)
    } finally spark.conf.unset("graft.tokenizer.maxTypes")
  }

  test("maxTypes pre-prune == training on the corpus restricted to the " +
      "kept words; ties break to the smaller word") {
    // Frequencies: pp=4, qq=3, rr=2, ss=2, tt=1. Top-3 by (freq DESC,
    // word ASC) = {pp, qq, rr} (rr beats ss on the tie).
    val words = Seq.fill(4)("pp") ++ Seq.fill(3)("qq") ++
      Seq.fill(2)("rr") ++ Seq.fill(2)("ss") ++ Seq("tt")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val kept = Seq("pp", "qq", "rr")
    val restricted = Seq((1L, words.filter(kept.contains).mkString(" ")))
      .toDF("doc_id", "text")
    for (trainer <- Seq("bpe", "wordpiece")) {
      def run(d: org.apache.spark.sql.DataFrame, mt: Option[Int]) =
        (if (trainer == "bpe")
          TextAnalysis.bpeTrainMerges(d, "text", numMerges = 6, maxTypes = mt)
            .select("rank", "left", "right", "pair_count")
        else
          TextAnalysis.wordpieceTrainMerges(d, "text", numMerges = 6,
              minPairCount = 1L, maxTypes = mt)
            .select("rank", "left", "right", "pair_count"))
          .as[(Long, String, String, Long)].collect().toSeq
      assert(run(df, Some(3)) === run(restricted, None),
        s"$trainer: pruned training diverged from the restricted corpus")
      // maxTypes >= vocabulary is the identity.
      assert(run(df, Some(100)) === run(df, None),
        s"$trainer: an over-wide prune changed the merges")
    }
  }
}
