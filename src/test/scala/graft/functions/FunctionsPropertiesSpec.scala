package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the session's new operators: each scale-shaped
  * formulation must agree with its brute-force definition on arbitrary
  * inputs. */
class FunctionsPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val docsGen: Gen[List[(Long, String)]] = for {
    nd <- Gen.choose(1, 6)
    docs <- Gen.listOfN(nd, for {
      nt <- Gen.choose(1, 40)
      ws <- Gen.listOfN(nt, Gen.choose(0, 8).map(i => s"w$i"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("property: chunkDocs tiles exactly — dropping each later chunk's overlap reconstructs the doc") {
    samples(docsGen, 8).foreach { docs =>
      val chunkTokens = 7
      val overlap = 2
      val out = TextAnalysis.chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text",
        chunkTokens, overlap)
        .select("doc_id", "chunk_id", "chunk_text")
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3) }
      docs.foreach { case (id, text) =>
        val chunks = out(id)
        val rebuilt = chunks.head.split(" ").toSeq ++
          chunks.tail.flatMap(_.split(" ").toSeq.drop(overlap))
        assert(rebuilt === text.split("\\s+").toSeq, s"doc=$id chunks=${chunks.toSeq}")
      }
    }
  }

  private val groupedGen: Gen[List[(String, Long, Double)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, 2).map(i => s"g$i")
      v <- Gen.choose(0, 20).map(_.toDouble) // narrow range -> many ties
    } yield (g, v))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }

  test("property: TopKAggregator equals sorted-take brute force under heavy ties") {
    samples(groupedGen, 8).foreach { rows =>
      val topk = udaf(new TopKAggregator(4))
      val got = rows.toDF("g", "id", "v").repartition(5)
        .groupBy("g").agg(topk(col("v"), col("id")).as("t"))
        .select(col("g"), explode(col("t.items")).as("item"))
        .select(col("g"), col("item.ord"), col("item.id"))
        .as[(String, Double, Long)].collect().toSet
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        rs.map(r => (r._3, r._2)).sortBy { case (v, id) => (-v, id) }.take(4)
          .map { case (v, id) => (g, v, id) }
      }.toSet
      assert(got === expected, s"rows=$rows")
    }
  }

  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(20, 120)
    ws <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.const("hot"), 3 -> Gen.const("warm"),
      3 -> Gen.oneOf("c1", "c2", "c3"), 4 -> Gen.choose(0, 500).map(i => s"r$i")))
  } yield ws

  test("property: heavyHitters equals brute-force threshold aggregation") {
    samples(streamGen, 8).foreach { ws =>
      val minFraction = 0.1
      val capacity = 16 // 0.1 * 17 > 1 — strict recall bound holds
      val got = FreqItems.heavyHitters(ws.toDF("w").repartition(4), "w", capacity, minFraction)
        .select("w", "cnt").as[(String, Long)].collect().toSet
      val n = ws.size
      val expected = ws.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c.toDouble >= minFraction * n }.toSet
      assert(got === expected, s"n=$n ws=${ws.take(20)}...")
    }
  }

  test("property: weightedSampleTopK is exactly replicable from its published formula") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def u(stratum: String, id: Long): Double = {
      val hex = md.digest(s"graft:$stratum:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rowsGen = for {
      n <- Gen.choose(5, 50)
      rows <- Gen.listOfN(n, for {
        s <- Gen.oneOf("a", "b"); w <- Gen.choose(1, 500)
      } yield (s, w.toDouble))
    } yield rows.zipWithIndex.map { case ((s, w), i) => (i.toLong, s, w) }
    samples(rowsGen, 8).foreach { rows =>
      val k = 5
      val got = Sampling.weightedSampleTopK(rows.toDF("id", "stratum", "w").repartition(3),
        "id", "stratum", "w", k)
        .select("id").as[Long].collect().toSet
      val expected = rows.groupBy(_._2).flatMap { case (s, rs) =>
        rs.map { case (id, _, w) => (id, r6(math.log(u(s, id)) / math.max(w, 1e-9))) }
          .sortBy { case (id, key) => (-key, id) }.take(k).map(_._1)
      }.toSet
      assert(got === expected, s"rows=$rows")
    }
  }

  test("property: prefix-filtered jaccard pairs equal the inverted-index exact pairs") {
    // Prefix filtering is an EXACT algorithm: on any corpus, any shingle
    // width and any threshold it must reproduce jaccardPairs verbatim —
    // including corpora dense with near-identical docs where the prefix
    // index does its real work.
    val nearDupGen: Gen[List[(Long, String)]] = for {
      nd <- Gen.choose(2, 8)
      base <- Gen.listOfN(12, Gen.choose(0, 5).map(i => s"w$i"))
      docs <- Gen.listOfN(nd, for {
        mutate <- Gen.choose(0, 3)
        extra <- Gen.listOfN(mutate, Gen.choose(0, 9).map(i => s"x$i"))
      } yield (base ++ extra).mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    Seq(0.5, 0.8).foreach { t =>
      samples(nearDupGen, 6).foreach { docs =>
        val df = docs.toDF("doc_id", "text").repartition(3)
        val exact = Dedup.jaccardPairs(df, "doc_id", "text", n = 3, threshold = t)
          .select("id_a", "id_b", "jaccard")
          .as[(Long, Long, Double)].collect().toSet
        val prefix = Dedup.jaccardPrefixFilterPairs(df, "doc_id", "text", n = 3, threshold = t)
          .select("id_a", "id_b", "jaccard")
          .as[(Long, Long, Double)].collect().toSet
        assert(prefix === exact, s"threshold=$t docs=$docs")
      }
    }
  }

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTPS", "Http")
    host <- Gen.oneOf("Example.COM", "a.b.org", "WWW.Site.net")
    port <- Gen.oneOf("", ":443", ":80", ":8080")
    path <- Gen.oneOf("", "/", "/Docs/7", "/a/B/c/", "/x/", "/a&b", "/p&q=1/r")
    query <- Gen.oneOf("", "?utm_source=f", "?page=2", "?utm_a=1&page=2&gclid=g",
      "?page=2&ref=r", "?utm_x=1&utm_y=2")
    frag <- Gen.oneOf("", "#frag", "#s-2")
  } yield s"$scheme://$host$port$path$query$frag"

  test("property: canonicalizeUrl is idempotent (canon(canon(u)) == canon(u))") {
    val urls = samples(urlGen, 60).distinct
    val df = urls.toDF("u")
    val got = df.select(
      TextAnalysis.canonicalizeUrl(col("u")).as("c1"),
      TextAnalysis.canonicalizeUrl(
        TextAnalysis.canonicalizeUrl(col("u"))).as("c2"))
      .as[(String, String)].collect()
    got.foreach { case (c1, c2) => assert(c1 === c2, s"not idempotent: $c1") }
  }

  test("property: paragraphDupStats equals brute-force chunk counting") {
    samples(docsGen, 8).foreach { docs =>
      val ct = 5
      val out = TextAnalysis.paragraphDupStats(
        docs.toDF("doc_id", "text"), "doc_id", "text", chunkTokens = ct)
        .select("doc_id", "n_paras", "dup_paras")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // brute force: same tiling, paragraph -> set of docs containing it
      val paras = docs.map { case (id, text) =>
        id -> text.split("\\s+").toSeq.grouped(ct).map(_.mkString(" ")).toSeq
      }
      val docsPerPara = paras.flatMap { case (id, ps) => ps.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).distinct.size }
      paras.foreach { case (id, ps) =>
        val dup = ps.count(p => docsPerPara(p) >= 2)
        assert(out(id) === ((ps.size.toLong, dup.toLong)), s"doc=$id")
      }
    }
  }

  test("property: ngramNovelty fractions sum to the distinct n-gram count") {
    // sum over docs of novel_ngrams == number of distinct shingles corpus-wide
    samples(docsGen, 8).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = TextAnalysis.ngramNovelty(df, "doc_id", "text", n = 2)
        .agg(sum("novel_ngrams")).as[Long].collect().head
      val distinctShingles = docs.flatMap { case (_, t) =>
        t.split("\\s+").toSeq.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      }.distinct.size
      val anyLongEnough = docs.exists(_._2.split("\\s+").length >= 2)
      if (anyLongEnough) assert(out === distinctShingles.toLong)
    }
  }

  test("property: dedupParagraphs equals brute-force keep-first reconstruction") {
    val chunkTokens = 7
    samples(docsGen, 8).foreach { docs =>
      val got = TextAnalysis.dedupParagraphs(
        docs.toDF("doc_id", "text"), "doc_id", "text", chunkTokens)
        .select("doc_id", "n_paras", "kept_paras", "clean_text")
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      // brute force: chunk in id order, keep each paragraph's first
      // (doc_id, chunk_id) occurrence, rebuild text from survivors
      val seen = scala.collection.mutable.Set.empty[String]
      docs.sortBy(_._1).foreach { case (id, text) =>
        val ws = text.split("\\s+").toSeq
        val chunks = (0 until math.max(1, (ws.size + chunkTokens - 1) / chunkTokens))
          .map(i => ws.slice(i * chunkTokens, i * chunkTokens + chunkTokens).mkString(" "))
        val kept = chunks.filter(c => seen.add(c))
        assert(got(id) === ((chunks.size.toLong, kept.size.toLong,
          kept.mkString(" "))), s"doc=$id")
      }
      // global invariant: every distinct paragraph survives exactly once
      assert(got.values.map(_._2).sum ===
        docs.sortBy(_._1).flatMap { case (_, t) =>
          val ws = t.split("\\s+").toSeq
          (0 until math.max(1, (ws.size + chunkTokens - 1) / chunkTokens))
            .map(i => ws.slice(i * chunkTokens, i * chunkTokens + chunkTokens).mkString(" "))
        }.distinct.size.toLong)
    }
  }

  test("property: cmsEstimate never undercounts; wide sketch is exact") {
    val keysGen: Gen[List[Long]] = for {
      n <- Gen.choose(1, 80)
      ks <- Gen.listOfN(n, Gen.choose(0L, 11L)) // narrow range -> collisions
    } yield ks
    samples(keysGen, 6).foreach { ks =>
      val df = ks.toDF("k")
      val exact = ks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // tight sketch: overestimates allowed, undercounts never
      val tight = Sketches.cmsEstimate(
        Sketches.cmsBuild(df, "k", 4, 4), df, "k", 4, 4)
        .as[(Long, Long)].collect().toMap
      exact.foreach { case (k, c) => assert(tight(k) >= c, s"key $k") }
      // wide sketch: 12 possible keys in width 4096 -> exact w.h.p., and
      // deterministic hashing makes this a fixed (regression) assertion
      val wide = Sketches.cmsEstimate(
        Sketches.cmsBuild(df, "k", 4, 4096), df, "k", 4, 4096)
        .as[(Long, Long)].collect().toMap
      assert(wide === exact)
    }
  }

  test("property: bestRepresentative survivor equals brute-force union-find argmax") {
    val caseGen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
      n <- Gen.choose(1, 12)
      quals <- Gen.listOfN(n, Gen.choose(0L, 5L)) // ties likely
      np <- Gen.choose(0, 10)
      pairs <- Gen.listOfN(np, for {
        a <- Gen.choose(0L, (n - 1).toLong)
        b <- Gen.choose(0L, (n - 1).toLong)
      } yield (a, b))
    } yield (quals.zipWithIndex.map { case (q, i) => (i.toLong, q) },
      pairs.filter(p => p._1 != p._2).map(p => (math.min(p._1, p._2), math.max(p._1, p._2))))
    samples(caseGen, 8).foreach { case (nodes, pairs) =>
      val got = Dedup.bestRepresentative(
        nodes.toDF("doc_id", "q"), "doc_id", "q",
        pairs.toDF("id_a", "id_b"), iterations = 12)
        .select("doc_id", "survivor_id")
        .as[(Long, Long)].collect().toMap
      // brute-force union-find
      val parent = scala.collection.mutable.Map(nodes.map(n => n._1 -> n._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
      val qual = nodes.toMap
      nodes.groupBy(n => find(n._1)).values.foreach { members =>
        val best = members.map(_._1).minBy(id => (-qual(id), id))
        members.foreach { case (id, _) =>
          assert(got(id) === best, s"node $id cluster ${members.map(_._1)}")
        }
      }
    }
  }

  test("property: distributionDrift bounds, identity, duplication-invariance, symmetry") {
    samples(Gen.zip(docsGen, docsGen), 4).foreach { case (a0, b0) =>
      val a = a0.toDF("doc_id", "text")
      val b = b0.toDF("doc_id", "text")
      def drift(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
        Sampling.distributionDrift(x, "text", y, "text", buckets = 256)
          .as[(Double, Double, Long, Long, Long)].head()
      val ab = drift(a, b)
      // JS in [0, ln 2]; L1 in [0, 2] (fixed-point slack one grain per bucket).
      assert(ab._1 >= 0.0 && ab._1 <= math.log(2.0) + 1e-6, s"js ${ab._1}")
      assert(ab._2 >= 0.0 && ab._2 <= 2.0 + 1e-6, s"l1 ${ab._2}")
      // Identity, and invariance under corpus duplication (doubling every
      // count scales by an exact power of two, so probabilities are
      // bit-identical and the drift is exactly zero).
      val aa = drift(a, a)
      assert(aa._1 === 0.0 && aa._2 === 0.0)
      val dup = a0.map { case (i, t) => (i + 1000L, t) }.toDF("doc_id", "text")
      val adup = drift(a, a.unionByName(dup))
      assert(adup._1 === 0.0 && adup._2 === 0.0, s"duplication drifted: $adup")
      // Symmetric in js/l1; bucket counts swap.
      val ba = drift(b, a)
      assert(ab._1 === ba._1 && ab._2 === ba._2)
      assert(ab._3 === ba._4 && ab._4 === ba._3 && ab._5 === ba._5)
    }
  }

  test("property: dsirWeights — equal texts get equal weights; layout-independent") {
    samples(Gen.zip(docsGen, docsGen), 4).foreach { case (raw0, tgt0) =>
      // Plant an exact-duplicate pair in the raw corpus.
      val dupBase = raw0.head._2
      val raw = raw0 ++ Seq((500L, dupBase), (501L, dupBase))
      val rawDf = raw.toDF("doc_id", "text")
      val tgtDf = tgt0.toDF("doc_id", "text")
      val w = Sampling.dsirWeights(rawDf, "doc_id", "text", tgtDf, "text", buckets = 256)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(w(500L) === w(501L), "identical texts scored differently")
      assert(w(500L) === w(raw0.head._1), "copy scored differently from original")
      val w2 = Sampling.dsirWeights(rawDf.repartition(5), "doc_id", "text",
        tgtDf.repartition(3), "text", buckets = 256)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(w === w2, "weights changed under repartitioning")
    }
  }
}
