package graft

import graft.operators.ReferenceQueries
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.3 property tests: the two invariants that pin our Spark
  * plans to the reference's two-phase MapReduce semantics. Driven by
  * ScalaCheck generators with deterministic seeds (no scalatestplus
  * bridge in the offline cache — samples are drawn directly).
  */
class PropertySpec extends AnyFunSuite with SparkSpec {

  private val actorPool = ('a' to 'j').map(_.toString)

  private val moviesGen: Gen[List[(Long, String, Seq[String])]] =
    Gen.chooseNum(2, 12).flatMap { n =>
      Gen.listOfN(n, Gen.someOf(actorPool).map(_.toSeq))
        .map(_.zipWithIndex.map { case (cast, i) =>
          ((i + 1).toLong, s"t$i", if (cast.isEmpty) Seq("a") else cast)
        })
    }

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).flatMap { _ =>
      val s = g.apply(Gen.Parameters.default, seed)
      seed = seed.next
      s
    }
  }

  test("title query: level == min(cnt, 4) and each title appears exactly once") {
    import spark.implicits._
    samples(moviesGen, 8, 42L).foreach { ms =>
      val df = ms.toDF("id", "title", "actors")
      val rows = ReferenceQueries.titleLevelsOn(df, "t0").collect()
      rows.foreach { r =>
        val (cnt, level) = (r.getLong(1), r.getLong(2))
        assert(cnt >= 1 && level == math.min(cnt, 4L))
      }
      // levels partition the qualifying titles: no title twice, never
      // the searched title itself
      val names = rows.map(_.getString(0))
      assert(names.distinct.length == names.length)
      assert(!names.contains("t0"))
    }
  }

  test("actor query: result is invariant under any repartitioning") {
    import spark.implicits._
    val partsGen = Gen.chooseNum(1, 7)
    samples(moviesGen.flatMap(ms => partsGen.map(ms -> _)), 8, 7L)
      .foreach { case (ms, parts) =>
        val df = ms.toDF("id", "title", "actors")
        val base = ReferenceQueries.actorCoactorsOn(df, "a")
          .collect().map(_.toSeq).toSeq
        val re = ReferenceQueries.actorCoactorsOn(df.repartition(parts), "a")
          .collect().map(_.toSeq).toSeq
        // Spark's partial+final aggregate must equal the reference's
        // master-side two-phase merge (master.erl:282-329) regardless
        // of how rows are distributed.
        assert(base == re)
      }
  }

  test("hash-driven dedup pipeline is invariant under repartitioning") {
    import spark.implicits._
    // the dedup/sampling operators derive EVERYTHING from content
    // hashes, so any partition layout must give byte-identical answers
    // — the distributed-correctness property that lets a 1000-executor
    // cluster and local[4] agree
    val base = "the quick brown fox jumps over the lazy dog and then runs far away home tonight"
    val docs = (1L to 40L).map { i =>
      if (i % 5 == 0) (i, base + s" variant") // clusters of near-dups
      else (i, base.split(" ").map(w => s"$w$i").mkString(" "))
    }.toDF("doc_id", "text")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.minHashNearDupsOf(d, threshold = 0.8)
        .collect().map(_.toSeq).toSeq
    def ngrams(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.ngramJaccardPairsOf(d, threshold = 0.8, dfCap = 1000)
        .collect().map(_.toSeq).toSeq
    val (p1, p13) = (pairs(docs.repartition(1)), pairs(docs.repartition(13)))
    assert(p1 == p13 && p1.nonEmpty)
    val (g1, g13) = (ngrams(docs.repartition(1)), ngrams(docs.repartition(13)))
    assert(g1 == g13 && g1.nonEmpty)
  }

  test("range join == naive theta join on random intervals and probes") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val hour = 3600L * 1000
    val ivGen = Gen.listOfN(6, for {
      s <- Gen.chooseNum(0, 400); len <- Gen.chooseNum(1, 120)
    } yield (s, s + len))
    val probeGen = Gen.listOfN(60, Gen.chooseNum(-24, 560))
    samples(ivGen.flatMap(iv => probeGen.map((iv, _))), 6, 7L)
      .foreach { case (ivs, ps) =>
        val iv = ivs.zipWithIndex.map { case ((s, e), i) =>
          (i.toLong, new java.sql.Timestamp(base + s * hour),
            new java.sql.Timestamp(base + e * hour))
        }.toDF("iv", "s", "e")
        val probe = ps.zipWithIndex.map { case (h, i) =>
          (i.toLong, new java.sql.Timestamp(base + h * hour))
        }.toDF("p", "t")
        for (bucketDays <- Seq(1, 3)) {
          val fast = graft.operators.TimeSeries
            .rangeJoinOf(probe, "t", iv, "s", "e", bucketDays)
            .select($"iv", $"p").as[(Long, Long)].collect().toSeq.sorted
          val naive = iv.crossJoin(probe).filter($"t" >= $"s" && $"t" < $"e")
            .select($"iv", $"p").as[(Long, Long)].collect().toSeq.sorted
          assert(fast == naive, s"bucketDays=$bucketDays")
          assert(fast.distinct == fast)
        }
      }
  }

  test("winnowing guarantee: docs sharing a long passage share a fingerprint") {
    import spark.implicits._
    val wordGen = Gen.oneOf(('a' to 'z').map(c => s"w$c"))
    val gen = for {
      a <- Gen.listOfN(20, wordGen)
      b <- Gen.listOfN(20, wordGen)
      shared <- Gen.listOfN(12, wordGen) // >= w + 2 = 6 words shared
    } yield (a, b, shared)
    samples(gen, 5, 99L).foreach { case (a, b, shared) =>
      val docs = Seq(
        (1L, (a ++ shared).mkString(" ")),
        (2L, (shared ++ b).mkString(" "))).toDF("doc_id", "text")
      // fingerprints are distinct window-min hashes; a shared run of
      // >= w+2 words yields >= 3 shared 3-gram shingles = one full
      // window, whose min is selected in both documents
      val perDoc = graft.operators.TextAnalytics.winnowFingerprintOf(docs, w = 4)
      // recompute the selected fingerprint SETS per doc for overlap
      val fps = docs
        .select($"doc_id", org.apache.spark.sql.functions.posexplode(
          graft.functions.TextAnalysis.shingles(
            graft.functions.TextAnalysis.tokens($"text"), 3)).as(Seq("pos", "sg")))
        .select($"doc_id", $"pos", graft.functions.Hashing.md5i32($"sg", 7).as("h"))
      val byDoc = fps.as[(Long, Int, Long)].collect().groupBy(_._1)
      val sets = byDoc.map { case (d, rows) =>
        val hs = rows.sortBy(_._2).map(_._3)
        d -> hs.sliding(4).filter(_.length == 4).map(_.min).toSet
      }
      assert((sets(1L) intersect sets(2L)).nonEmpty,
        "shared passage produced no shared fingerprint")
      // and the operator's counts agree with the reference computation
      val got = perDoc.select($"doc_id", $"n_fp").as[(Long, Long)].collect().toMap
      sets.foreach { case (d, s) => assert(got(d) == s.size.toLong) }
    }
  }

  test("applyChanges: empty batch is identity, delete-all empties, I==union") {
    import spark.implicits._
    val baseGen = Gen.listOfN(12, Gen.chooseNum(1, 30)).map(_.distinct)
    samples(baseGen, 6, 123L).foreach { keys =>
      val base = keys.map(k => (k.toLong, s"v$k")).toDF("k", "v")
      val none = Seq.empty[(Long, String, String)].toDF("k", "op", "v")
      val same = graft.operators.Relational.applyChanges(base, none, "k")
        .as[(Long, String)].collect().toSet
      assert(same == keys.map(k => (k.toLong, s"v$k")).toSet)
      val delAll = keys.map(k => (k.toLong, "D", s"v$k")).toDF("k", "op", "v")
      assert(graft.operators.Relational.applyChanges(base, delAll, "k").count() == 0)
      val ins = keys.map(k => (k.toLong + 1000, "I", s"n$k")).toDF("k", "op", "v")
      assert(graft.operators.Relational.applyChanges(base, ins, "k").count() ==
        2L * keys.size)
    }
  }

  test("round-5 batch-3 operators are invariant under repartitioning") {
    import spark.implicits._
    // every one of these derives its answer from values alone (window
    // orders end in unique keys, aggregates are partial+final, BPE
    // merges from deterministic argmax), so any partition layout must
    // give byte-identical results — local[4] == a 1000-executor plan
    val docs = (1L to 30L).map { i =>
      (i, (1L to (i % 7) + 2).map(j => s"w${(i + j) % 9}").mkString(" "),
        if (i % 3 == 0) "de" else "en")
    }.toDF("doc_id", "text", "lang")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSeq
    for (parts <- Seq(1, 13)) {
      val dp = docs.repartition(parts)
      assert(rows(graft.operators.TextAnalytics.seqPackOf(dp, ctx = 8)) ==
        rows(graft.operators.TextAnalytics.seqPackOf(docs, ctx = 8)))
      assert(rows(graft.operators.TextAnalytics.docChunkOf(
        dp.select($"doc_id", $"text"), chunk = 4, stride = 3)) ==
        rows(graft.operators.TextAnalytics.docChunkOf(
          docs.select($"doc_id", $"text"), chunk = 4, stride = 3)))
      assert(rows(graft.operators.TextAnalytics.bpeTrainOf(dp, steps = 2)) ==
        rows(graft.operators.TextAnalytics.bpeTrainOf(docs, steps = 2)))
      assert(rows(graft.operators.Relational.columnProfileOf(
        dp, Seq("doc_id"), Seq("lang"))) ==
        rows(graft.operators.Relational.columnProfileOf(
          docs, Seq("doc_id"), Seq("lang"))))
    }
    import java.sql.Timestamp
    val changes = (1L to 40L).map { i =>
      (i % 6, new Timestamp(86400000L * (i / 6 + 1)), i, s"a${i % 4}")
    }.toDF("key", "ts", "seq", "attr")
    val h1 = rows(graft.operators.TimeSeries.scd2Of(changes.repartition(1)))
    val h13 = rows(graft.operators.TimeSeries.scd2Of(changes.repartition(13)))
    assert(h1 == h13 && h1.nonEmpty)
  }

  private val wordPool =
    Seq("the", "cat", "sat", "mat", "und", "der", "big", "42", "x1", "zz")

  private val docsGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 10).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(0, 40).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(wordPool)).map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) })
    }

  test("gopher rules: integer thresholds == the float formulation they encode") {
    import spark.implicits._
    import graft.functions.TextAnalysis._
    import org.apache.spark.sql.functions._
    samples(docsGen, 6, 77L).foreach { ds =>
      val df = ds.toDF("doc_id", "text")
      val got = graft.operators.CorpusQuality.gopherRulesOf(df)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // independent float-ratio recomputation per doc
      val feats = df.select(
        size(tokens($"text")).cast("long").as("w"),
        length(regexp_replace(lower($"text"), "[^\\p{L}\\p{N}_]+", ""))
          .cast("long").as("c"),
        size(filter(tokens($"text"), t => t.rlike("\\p{L}"))).cast("long").as("a"),
        size(filter(tokens($"text"), t => t.rlike("^\\p{N}+$"))).cast("long").as("d"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // driver-side recompute in exact rational arithmetic (cross-
      // multiplied) — the float-ratio form would itself flip at
      // representation boundaries like 0.8*5, which is exactly why
      // the operator compares integers
      def cnt(p: ((Long, Long, Long, Long)) => Boolean) = feats.count(p).toLong
      assert(got("word_count") === cnt { case (w, _, _, _) => w < 50 || w > 100000 })
      assert(got("mean_word_length") === cnt { case (w, c, _, _) =>
        c < 3 * w || c > 10 * w
      })
      assert(got("alpha_ratio") === cnt { case (w, _, a, _) => a * 5 < w * 4 })
      assert(got("digit_ratio") === cnt { case (w, _, _, d) => d * 10 > w * 3 })
    }
  }

  test("soft dedup: k identical docs collapse to effective size 1") {
    import spark.implicits._
    Seq(2, 5, 9).foreach { k =>
      val df = (1 to k).map(i =>
        (i.toLong, "alpha beta gamma delta epsilon", "s")).toDF("doc_id", "text", "source")
      val row = graft.operators.CorpusQuality.softDedupWeightsOf(df).collect().head
      assert(row.getLong(1) === k.toLong)
      assert(math.abs(row.getDouble(3) - 1.0) < 1e-9,
        s"$k identical docs must down-weight to ~1 effective doc")
      assert(row.getDouble(5) === k.toDouble) // avg dup factor = k
    }
  }

  test("char entropy: 0 <= H <= ln(distinct chars) on random corpora") {
    import spark.implicits._
    samples(docsGen, 6, 99L).foreach { ds =>
      val df = ds.filter(_._2.nonEmpty).toDF("doc_id", "text")
      if (ds.exists(_._2.nonEmpty)) {
        graft.operators.CorpusQuality.charEntropyOf(df).collect().foreach { r =>
          val (uniq, h) = (r.getLong(2), r.getDouble(3))
          assert(h >= 0.0 && h <= math.log(uniq.toDouble) + 1e-4,
            s"entropy $h outside [0, ln($uniq)]")
        }
      }
    }
  }

  private val fullDocsGen: Gen[List[(Long, String, String, String)]] =
    Gen.chooseNum(1, 10).flatMap { n =>
      Gen.listOfN(n, for {
        words <- Gen.chooseNum(0, 30)
        src <- Gen.oneOf("s1", "s2", "s3")
        toks <- Gen.listOfN(words, Gen.oneOf("the", "cat", "sat", "x9", "on"))
      } yield (src, toks.mkString(" ")))
        .map(_.zipWithIndex.map { case ((s, t), i) =>
          ((i + 1).toLong, t, "en", s)
        })
    }

  test("context fit conservation: kept + truncated == total, any corpus") {
    import spark.implicits._
    samples(fullDocsGen, 6, 97L).foreach { ds =>
      val df = ds.toDF("doc_id", "text", "lang", "source")
      val total = ds.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
      graft.operators.CorpusQuality.contextLenFitOf(df).collect().foreach { r =>
        val (ctx, nFit, trunc, kept) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
        assert(nFit >= 0 && nFit <= ds.size)
        assert(trunc >= 0 && trunc <= total)
        // kept_frac * total + trunc == total (conservation)
        if (total > 0)
          assert(math.abs(kept * total + trunc - total) < 1e-6 * total + 1e-6,
            s"ctx=$ctx kept=$kept trunc=$trunc total=$total")
      }
    }
  }

  test("mixture temperature: weights a probability simplex at every tau, any corpus") {
    import spark.implicits._
    samples(fullDocsGen, 6, 131L).foreach { ds =>
      val nonEmpty = ds.exists(_._2.trim.nonEmpty)
      val df = ds.toDF("doc_id", "text", "lang", "source")
      val rows = graft.operators.CorpusQuality.mixtureTemperatureOf(df).collect()
        .map(r => (r.getDouble(0), r.getDouble(3)))
      if (nonEmpty) {
        rows.groupBy(_._1).values.foreach { g =>
          val s = g.map(_._2).sum
          assert(math.abs(s - 1.0) < 1e-4, s"weights sum $s")
          g.foreach { case (_, w) => assert(w >= 0.0 && w <= 1.0 + 1e-9) }
        }
      }
    }
  }

  test("rolling chunks: chunk mass conserves tokens, any corpus") {
    import spark.implicits._
    samples(fullDocsGen, 6, 167L).foreach { ds =>
      val df = ds.toDF("doc_id", "text", "lang", "source")
      val rows = graft.operators.CorpusQuality.rollingHashChunksOf(df).collect()
      val nDocsWithTokens = ds.count(_._2.split("\\s+").exists(_.nonEmpty))
      val totChunks = rows.map(_.getLong(1)).sum
      // every tokenizable doc produces >= 1 chunk; chunk count never
      // exceeds token count
      assert(totChunks >= nDocsWithTokens)
      val totToks = ds.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
      assert(totChunks <= math.max(totToks, 0L) + 0L || totToks == 0)
      rows.foreach { r =>
        assert(r.getLong(2) <= r.getLong(1), "distinct <= total chunks")
        assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0 + 1e-9)
      }
    }
  }

  test("AUC: negation antisymmetry and label-flip complement on random scores") {
    import spark.implicits._
    val gen = Gen.chooseNum(4, 40).flatMap { n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(-50, 50).map(_ / 10.0),
        Gen.oneOf(true, false)))
    }
    samples(gen, 8, 271L).foreach { rows =>
      val (pos, neg) = rows.partition(_._2)
      if (pos.nonEmpty && neg.nonEmpty) {
        def auc(xs: Seq[(Double, Boolean)]): Double =
          graft.operators.CorpusQuality.aucOf(xs.toDF("score", "label"))
            .collect().head.getDouble(3)
        val a = auc(rows)
        // negating every score reverses every pairwise comparison:
        // AUC(-s, l) == 1 - AUC(s, l) (ties stay ties at half credit)
        assert(math.abs(auc(rows.map(r => (-r._1, r._2))) - (1.0 - a)) < 1e-12)
        // flipping every label swaps the two classes: same identity
        assert(math.abs(auc(rows.map(r => (r._1, !r._2))) - (1.0 - a)) < 1e-12)
        assert(a >= 0.0 && a <= 1.0)
      }
    }
  }

  test("clustering coeff: complete graphs are exactly 1/1, stars exactly 0/0") {
    import spark.implicits._
    (3 to 6).foreach { n =>
      val und = for { a <- 1 to n; b <- 1 to n if a < b } yield (a.toLong, b.toLong)
      val arcs = (und ++ und.map(_.swap)).toDF("src", "dst")
      val (w, t, trans, avg) = graft.operators.Graph.clusteringCoeffOf(arcs)
        .as[(Long, Long, Double, Double)].head()
      // K_n: C(n,2) edges, n*C(n-1,2) wedges, C(n,3) triangles,
      // every coefficient exactly 1
      assert(w == n.toLong * (n - 1) * (n - 2) / 2, s"K$n wedges $w")
      assert(t == n.toLong * (n - 1) * (n - 2) / 6, s"K$n triangles $t")
      assert(trans == 1.0 && avg == 1.0, s"K$n coefficients $trans/$avg")
      val star = ((2 to n).map(i => (1L, i.toLong)) ++
        (2 to n).map(i => (i.toLong, 1L))).toDF("src", "dst")
      val s = graft.operators.Graph.clusteringCoeffOf(star)
        .as[(Long, Long, Double, Double)].head()
      assert(s._2 == 0L && s._3 == 0.0 && s._4 == 0.0, s"star K1,${n - 1}: $s")
    }
  }

  test("ACF: Cauchy-Schwarz bound holds on random integer revenue series") {
    import spark.implicits._
    val gen = Gen.chooseNum(6, 30).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(1, 1000))
    }
    samples(gen, 6, 389L).foreach { ys =>
      val daily = ys.zipWithIndex.map { case (y, i) =>
        (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
          BigDecimal(y))
      }.toDF("day", "rev")
        .select($"day", $"rev".cast("decimal(18,2)").as("rev"))
      graft.operators.TimeSeries.acfOf(daily, maxLag = 5)
        .as[(Long, Long, Double)].collect().foreach { case (lag, np, r) =>
          // full-series denominator: |r(k)| <= 1 by Cauchy-Schwarz
          // (NaN only on a constant series, which flooring can create)
          assert(np >= 1)
          assert(r.isNaN || math.abs(r) <= 1.0 + 1e-12, s"acf($lag) = $r")
        }
    }
  }
}
