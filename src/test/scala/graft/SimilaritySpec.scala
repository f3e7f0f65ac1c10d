package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite with SparkSpec {

  test("cosine matches a hand-computed value and is 1.0 on itself") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 1.0, 2.0))).toDF("a", "b")
    val Array(cos, self) = df.select(
      Similarity.cosine($"a", $"b"),
      Similarity.cosine($"a", $"a")).head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(math.abs(cos - 8.0 / 9.0) < 1e-12) // (2+2+4)/(3*3)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("16 distinct DotProducts in ONE projection compile under codegen") {
    import spark.implicits._
    // regression: fixed local names ('n'/'sum') in doGenCode collide
    // when several DotProducts land unbraced in one generated scope
    // (withLshBuckets emits 16) — janino rejects the stage and Spark
    // silently interprets. fallback=false turns that silence into a
    // test failure.
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = Seq((Seq(1.0, 2.0), 1L)).toDF("a", "id")
      // distinct right-hand sides so subexpression elimination can't
      // collapse the 16 expressions into one
      val cols = (0 until 16).map { i =>
        graft.functions.VectorExpressions
          .dot_product($"a", array(lit(i.toDouble), lit(i + 1.0))).as(s"d$i")
      }
      val row = df.select(cols: _*).head()
      (0 until 16).foreach { i =>
        assert(row.getDouble(i) == 1.0 * i + 2.0 * (i + 1))
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("codegen'd DotProduct is bit-identical to the higher-order fold") {
    import spark.implicits._
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    val probe = e.limit(1).select($"v".as("pv"))
    val diff = e.crossJoin(probe)
      .select(
        graft.functions.VectorExpressions.dot_product($"v", $"pv").as("fast"),
        graft.operators.Similarity.foldDot($"v", $"pv").as("ref"))
      .filter($"fast" =!= $"ref") // exact double equality, not approximate
      .count()
    assert(diff == 0)
  }

  test("plane weights are md5-derived and bounded") {
    val w = for (p <- 0 until Similarity.NumPlanes; d <- 0 until Similarity.Dims)
      yield Similarity.planeWeight(p, d)
    assert(w.forall(x => x >= -1000 && x <= 1000))
    assert(w.distinct.size > 100) // not degenerate
  }

  test("LSH top-k achieves reasonable recall vs exact top-k") {
    import spark.implicits._
    val k = 5
    val exact = Similarity.knnExact(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.knnLsh(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    // Random 64-dim data is the adversarial case for LSH; the banded
    // buckets must still recover a meaningful fraction of true
    // neighbors while comparing far fewer candidates than brute force.
    assert(recall >= 0.2, s"LSH recall $recall vs exact top-$k")
  }

  test("IVF top-k achieves reasonable recall vs exact top-k") {
    import spark.implicits._
    val k = 5
    val exact = Similarity.knnExact(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvf(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    // nprobe=2 of 16 hash-sampled cells on random data — the floor is
    // deliberately loose; the structure (bounded cells) is the point
    assert(recall >= 0.1, s"IVF recall $recall vs exact top-$k")
    assert(ivf.size == exact.size) // both return full k per probe
  }

  test("LSH candidate set is bucket-bounded (far below corpus x probes)") {
    import spark.implicits._
    val e = Similarity.withLshBuckets(
      graft.sources.Tables.embeddings(spark, sf)
        .select($"vec_id", transform($"embedding", _.cast("double")).as("v")))
    val n = e.count()
    val banded = (0 until Similarity.PlaneBands).map { b =>
      e.select($"vec_id", lit(b).as("band"), col(s"bucket$b").as("bucket"))
    }.reduce(_ union _)
    val probes = banded.filter($"vec_id" < 20)
      .select($"vec_id".as("probe_id"), $"band", $"bucket")
    val nCand = banded.join(probes, Seq("band", "bucket"))
      .filter($"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id").distinct().count()
    assert(nCand * 2 < n * 20, s"candidates $nCand not bounded vs ${n * 20} brute")
  }

  test("PQ top-k: code-only scoring, bounded codebooks, reasonable recall") {
    import spark.implicits._
    val k = 5
    val pq = Similarity.knnPq(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.knnExact(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full k per probe even though scoring never touches vectors
    assert(pq.size == exact.size)
    val recall = pq.intersect(exact).size.toDouble / exact.size
    // 8 subspaces x 16 codes (32-bit codes for 512-byte vectors) on
    // random 64-dim data — PQ's adversarial case; the loose floor
    // documents "far above the 0.01 chance rate", the structure
    // (ADC over a coded corpus) is the point
    assert(recall >= 0.12, s"PQ recall $recall vs exact top-$k")
  }

  test("IVFPQ: every neighbor lies in a routed cell; recall above chance") {
    import spark.implicits._
    val k = 5
    val got = Similarity.knnIvfPq(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    // rebuild the same coarse routing the operator used (cached model)
    val model = graft.operators.Clustering.kmeansModel(spark, sf)
    val centroids = model.map(c => (c.cell, c.cv)).toDF("cell", "cv")
    val e = Similarity.normalizeOf(graft.sources.Tables.embeddings(spark, sf))
    val assign = e.join(broadcast(centroids))
      .withColumn("cos_c", round(
        graft.functions.VectorExpressions.dot_product($"v", $"cv"), 6))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id").orderBy($"cos_c".desc, $"cell")))
      .filter($"rn" === 1).select($"vec_id", $"cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val routed = e.filter($"vec_id" < 20)
      .select($"vec_id".as("probe_id"), $"v".as("pv"))
      .join(broadcast(centroids))
      .withColumn("cos_c", round(
        graft.functions.VectorExpressions.dot_product($"pv", $"cv"), 6))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"probe_id").orderBy($"cos_c".desc, $"cell")))
      .filter($"rn" <= Similarity.IvfNProbe)
      .select($"probe_id", $"cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // the IVF pruning contract: a neighbor outside the probe's routed
    // cells can never be returned
    got.foreach { case (p, n) =>
      assert(routed((p, assign(n))), s"neighbor $n of probe $p from unrouted cell")
    }
    val exact = Similarity.knnExact(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.toSet.intersect(exact).size.toDouble / exact.size
    // double approximation (cell pruning x code scoring) on random
    // data — the loosest floor of the ladder, far above 0.01 chance
    assert(recall >= 0.05, s"IVFPQ recall $recall vs exact top-$k")
  }

  test("PQ reconstruction error: one row per subspace, beats the trivial quantizer") {
    import spark.implicits._
    val got = Similarity.pqError(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(got.map(_._1) == (0L until Similarity.PqSubspaces.toLong))
    got.foreach { case (m, nv, mse) =>
      assert(nv == n, s"subspace $m covered $nv of $n vectors")
      assert(mse >= 0.0, s"subspace $m negative mse $mse")
    }
    // unit vectors: Σ_m E‖v_m‖² = 1, so a codebook that beats the
    // zero-vector quantizer must keep the summed mse below 1
    assert(got.map(_._3).sum < 1.0, s"summed mse ${got.map(_._3).sum}")
  }

  test("PQ+refine: results come from the ADC shortlist, scored exactly, recall >= plain PQ") {
    import spark.implicits._
    val k = 5
    val ref = Similarity.knnPqRefine(spark, sf, numProbes = 20, k = k, refine = 4)
      .select($"probe_id", $"neighbor_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.knnExact(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ref.size == exact.size)
    // stage 2 scores with FULL vectors: any pair both routes return
    // carries the identical exact cosine
    ref.keySet.intersect(exact.keySet).foreach { p =>
      assert(ref(p) == exact(p), s"pair $p: ${ref(p)} vs ${exact(p)}")
    }
    // the re-ranked shortlist can only improve on raw ADC ranking
    val plain = Similarity.knnPq(spark, sf, numProbes = 20, k = k)
      .select($"probe_id", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rRef = ref.keySet.intersect(exact.keySet).size.toDouble / exact.size
    val rPlain = plain.intersect(exact.keySet).size.toDouble / exact.size
    assert(rRef >= rPlain, s"refine recall $rRef < plain PQ recall $rPlain")
  }

  test("hard negatives are exactly the exact-knn band below the skipped top") {
    import spark.implicits._
    val neg = Similarity.knnNegatives(spark, sf, numProbes = 20, skipTop = 5, numNeg = 10)
      .select($"probe_id", $"neg_rank", $"negative_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the band IS ranks 6..15 of the exact ranking, re-based to 1..10
    val exact = Similarity.knnExact(spark, sf, numProbes = 20, k = 15)
      .select($"probe_id", $"rank", $"neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = exact.filter(_._2 > 5).map { case (p, r, n) => (p, r - 5, n) }.toSet
    assert(neg == want)
    // and never contains a presumed positive (top-5) pair
    val top = exact.filter(_._2 <= 5).map(t => (t._1, t._3)).toSet
    assert(neg.forall { case (p, _, n) => !top((p, n)) })
  }

  test("SQ top-k: int8-exact codes, high recall, exact re-rank scores") {
    import spark.implicits._
    val k = 10
    val sq = Similarity.knnSq(spark, sf, k = k)
      .select($"probe_id", $"neighbor_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.knnExact(spark, sf, k = k)
      .select($"probe_id", $"neighbor_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // 127-level codes on 64 dims + 4x re-rank headroom: near-exact
    val recall = sq.keySet.intersect(exact.keySet).size.toDouble / exact.size
    assert(recall >= 0.9, s"SQ recall $recall vs exact top-$k")
    // any pair both return carries the IDENTICAL exact cosine — the
    // re-rank stage scores with full vectors, not codes
    sq.keySet.intersect(exact.keySet).foreach { p =>
      assert(sq(p) == exact(p), s"pair $p: ${sq(p)} vs ${exact(p)}")
    }
    // every code is an exact int8: integral and within [-127, 127]
    val codes = graft.operators.Similarity.normalizeOf(
      graft.sources.Tables.embeddings(spark, sf))
      .select(explode(transform($"v", x => round(x * 127))).as("c"))
      .agg(max(abs($"c")).as("mx"),
        sum(when($"c" =!= floor($"c"), 1).otherwise(0)).as("frac"))
      .head()
    assert(codes.getDouble(0) <= 127.0 && codes.getLong(1) == 0L)
  }

  test("knn label eval agrees with a vote over knnExact's own neighbor lists") {
    import spark.implicits._
    val got = Similarity.knnLabelEval(spark, sf, numProbes = 8, k = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // independent replay: take the ALREADY-SPEC'D exact kNN output,
    // join labels, majority-vote driver-side
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)]
      .collect().toMap
    val nbrs = Similarity.knnExact(spark, sf, numProbes = 8, k = 10)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
    val pred = nbrs.groupBy(_._1).map { case (p, rows) =>
      val vote = rows.map(r => labels(r._2))
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy { case (lb, n) => (-n, lb) }.head._1
      p -> vote
    }
    val want = pred.toSeq.groupBy { case (p, _) => labels(p) }
      .map { case (own, ps) =>
        val correct = ps.count { case (p, v) => v == labels(p) }
        (own, ps.size.toLong, correct.toLong,
          math.rint(correct.toDouble / ps.size * 1e6) / 1e6)
      }.toSeq.sortBy(_._1)
    assert(got == want)
    got.foreach { case (_, n, c, acc) =>
      assert(c <= n && acc >= 0.0 && acc <= 1.0)
    }
  }

  test("persisted IVF index: same results as in-session, NO retrain on serve") {
    import graft.operators.{Clustering, Similarity}
    val want = Similarity.knnIvfKmeans(spark, sf).collect().toSeq
    // first call trains (or reuses the session model) and writes the
    // parquet index layout
    val first = Similarity.knnIvfPersisted(spark, sf).collect().toSeq
    assert(first == want, "persisted route diverged from in-session IVF")
    // the no-retrain contract: clear the in-memory model cache, serve
    // straight off the mounted index, and witness that Lloyd's never
    // ran again — the read path only touches the index parquet
    Clustering.clearModelCache()
    val runsBefore = Clustering.trainRuns.get()
    val served = Similarity.knnIvfServe(
      spark, Similarity.ivfIndexDir(sf)).collect().toSeq
    assert(Clustering.trainRuns.get() == runsBefore,
      "serving from the persisted index retrained the model")
    assert(served == want)
    // the inverted layout is cell-partitioned on disk — the pruning
    // unit a probe batch reads
    val cells = new java.io.File(s"${Similarity.ivfIndexDir(sf)}/cells")
      .listFiles().filter(_.getName.startsWith("cell="))
    assert(cells.nonEmpty, "cells layout is not partitioned by cell")
  }

  test("persisted IVF index is versioned by corpus CONTENT, not path") {
    import graft.operators.Similarity
    // round-12 sf1 lesson: the index at a path must die with the
    // corpus at that path — a regenerated table previously kept
    // serving the old layout because only _SUCCESS-exists was checked
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_tok").toString
    val table = new java.io.File(s"$dir/embeddings.parquet")
    assert(table.mkdirs())
    val part = new java.io.File(table, "part-00000.parquet")
    java.nio.file.Files.write(part.toPath, Array[Byte](1, 2, 3))
    val t1 = Similarity.corpusToken(dir)
    val d1 = Similarity.ivfIndexDir(dir)
    // same path, regenerated content (different size ⇒ different
    // census even at coarse mtime granularity)
    java.nio.file.Files.write(part.toPath, Array[Byte](1, 2, 3, 4))
    val t2 = Similarity.corpusToken(dir)
    assert(t1 != t2, "corpus token blind to a regenerated data file")
    assert(d1 != Similarity.ivfIndexDir(dir))
    assert(Similarity.ivfIndexDir(dir).endsWith(t2))
    // adding a new part file also re-versions (compaction, append)
    java.nio.file.Files.write(
      new java.io.File(table, "part-00001.parquet").toPath, Array[Byte](9))
    assert(Similarity.corpusToken(dir) != t2)
  }

  test("embed QA: catches ragged dims and zero vectors on a crafted table") {
    import spark.implicits._
    val e = Seq(
      (1L, Array(3.0f, 4.0f), 0),       // norm 5
      (2L, Array(0.0f, 0.0f), 0),       // zero vector
      (3L, Array(1.0f, 0.0f, 0.0f), 1)) // ragged dim
      .toDF("vec_id", "embedding", "label")
    val qa = Similarity.embedQaOf(e)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(6), r.getDouble(7))).toMap
    assert(qa(0) === ((2L, 2L, 2L, 1L, 0.0, 5.0))) // one zero vec, norms 0..5
    assert(qa(1) === ((1L, 3L, 3L, 0L, 1.0, 1.0)))
  }

  test("embed PCA: unit loading, eigenvalue equals the projected variance") {
    import spark.implicits._
    val rows = Similarity.embedPca(spark, sf).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val v = rows.map(_._1)
    val (eig, expl) = (rows.head._2, rows.head._3)
    assert(math.abs(math.sqrt(v.map(a => a * a).sum) - 1.0) < 1e-4,
      "loadings form a unit vector")
    assert(eig > 0.0 && expl > 0.0 && expl <= 1.0)
    // independent check: eigenvalue == variance of the data projected
    // on v (power iteration's fixed point), computed driver-side
    val xs = graft.sources.Tables.embeddings(spark, sf)
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = xs.head.length
    val mu = (0 until d).map(k => xs.map(_(k)).sum / xs.length).toArray
    val proj = xs.map(x => (0 until d).map(k => (x(k) - mu(k)) * v(k)).sum)
    val projVar = proj.map(p => p * p).sum / xs.length
    assert(math.abs(eig - projVar) < 0.01 * math.max(projVar, 1e-9),
      s"operator eigenvalue $eig vs driver-side projected variance $projVar")
    // and the top direction beats any coordinate axis
    val axisVar = (0 until d).map(k =>
      xs.map(x => math.pow(x(k) - mu(k), 2)).sum / xs.length).max
    assert(eig >= axisVar * 0.99,
      s"top component variance $eig below best axis variance $axisVar")
  }

  test("embed spectrum: isotropy read on flat cloud, ordering on a real gap") {
    import spark.implicits._
    val rows = Similarity.embedSpectrum(spark, sf).collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val ((l1, e1, iso1), (l2, e2, iso2)) = (rows(0), rows(1))
    assert(l1 > 0.0 && l2 > 0.0 && iso1 == iso2)
    assert(e1 + e2 <= 1.0 + 1e-9,
      "two components cannot explain more than all variance")
    // the synthetic cloud is near-isotropic: the ratio must read ~1
    // (order between near-degenerate eigenvalues is not meaningful)
    assert(iso1 > 0.8 && iso1 < 1.25, s"flat spectrum misread: $iso1")
    // λ1 agrees with the standalone PCA solve (same fixed point)
    val pcaEig = Similarity.embedPca(spark, sf).collect().head.getDouble(2)
    assert(l1 == pcaEig, s"spectrum λ1 $l1 != PCA eigenvalue $pcaEig")
    // a genuinely anisotropic cloud: stretch one axis 5x — now the
    // split must order cleanly and the ratio must read far below 1
    val stretched = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding",
        (x, i) => when(i === 0, x * 5.0f).otherwise(x)).as("embedding"))
    val st = Similarity.embedSpectrumOf(stretched).collect()
      .sortBy(_.getLong(0)).map(r => (r.getDouble(1), r.getDouble(3)))
    assert(st(0)._1 > 3.0 * st(1)._1,
      s"5x-stretched axis must dominate: ${st.toSeq}")
    assert(st(0)._2 < 0.4, s"anisotropy not detected: ${st(0)._2}")
  }

  test("vec_axpy aggregate ≡ column-wise weighted sums; null rows skipped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{element_at, sum => ssum}
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), 2.0, -1.0),
      (Seq(0.5, -1.0, 4.0), 0.0, 3.0),
      (Seq(2.0, 2.0, 2.0), 1.5, 0.5)
    ).toDF("x", "s1", "s2").repartition(3) // exercise partial+final merge
    val got = df.agg(graft.functions.VectorExpressions
      .vec_axpy($"x", $"s1", $"s2")).head().getSeq[Double](0)
    val aggCols = (1 to 3).map(k => ssum($"s1" * element_at($"x", k))) ++
      (1 to 3).map(k => ssum($"s2" * element_at($"x", k)))
    val cols = df.agg(aggCols.head, aggCols.tail: _*)
      .head().toSeq.map(_.asInstanceOf[Double])
    assert(got.size == 6)
    got.zip(cols).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"vec_axpy $got vs columnar $cols")
    }
    // a null vector row contributes nothing (and doesn't crash)
    val withNull = df.union(Seq((null.asInstanceOf[Seq[Double]], 9.0, 9.0))
      .toDF("x", "s1", "s2"))
    val got2 = withNull.agg(graft.functions.VectorExpressions
      .vec_axpy($"x", $"s1", $"s2")).head().getSeq[Double](0)
    got.zip(got2).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    // all-null input yields a null aggregate, not a zero vector
    val allNull = Seq((null.asInstanceOf[Seq[Double]], 1.0, 1.0))
      .toDF("x", "s1", "s2")
    assert(allNull.agg(graft.functions.VectorExpressions
      .vec_axpy($"x", $"s1", $"s2")).head().isNullAt(0))
  }

  test("block spectrum ≈ deflated spectrum (independent route agreement)") {
    import spark.implicits._
    def card(df: org.apache.spark.sql.DataFrame) = df.collect()
      .sortBy(_.getLong(0)).map(r => (r.getDouble(1), r.getDouble(2)))
    // catalog cloud: λ1 must agree EXACTLY (the block's first column
    // replays the power-iterate chain bit-for-bit); λ2 estimates come
    // from different iterates, so near-degenerate directions agree
    // only to iteration tolerance
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val b = card(Similarity.embedSpectrumOf(emb))
    val f = card(Similarity.embedSpectrumDeflatedOf(emb))
    assert(b(0)._1 == f(0)._1, s"λ1 block ${b(0)._1} != deflated ${f(0)._1}")
    assert(math.abs(b(1)._1 - f(1)._1) <= 0.15 * math.max(f(1)._1, 1e-9),
      s"λ2 block ${b(1)._1} vs deflated ${f(1)._1}")
    // clean-gap cloud (5x stretch): both routes converge — tight
    // agreement on both eigenvalues
    val stretched = emb.select($"vec_id", transform($"embedding",
      (x, i) => when(i === 0, x * 5.0f).otherwise(x)).as("embedding"))
    val bs = card(Similarity.embedSpectrumOf(stretched))
    val fs = card(Similarity.embedSpectrumDeflatedOf(stretched))
    assert(bs(0)._1 == fs(0)._1)
    assert(math.abs(bs(1)._1 - fs(1)._1) <= 0.02 * math.max(fs(1)._1, 1e-9),
      s"clean-gap λ2 block ${bs(1)._1} vs deflated ${fs(1)._1}")
  }

  test("knn recall: hits replay from the two rankings, recall well-formed") {
    import spark.implicits._
    val rows = Similarity.knnRecallAtK(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.size == 20)
    val exact = Similarity.knnExact(spark, sf, numProbes = 20, k = 5)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.knnIvf(spark, sf, numProbes = 20, k = 5)
      .select($"probe_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (p, (h, rec)) =>
      val want = exact(p).intersect(ivf.getOrElse(p, Set.empty)).size.toLong
      assert(h == want, s"probe $p: hits $h vs replay $want")
      assert(rec == h.toDouble / 5 && rec >= 0.0 && rec <= 1.0)
    }
    // the nprobe=4-of-8-cells index must beat random on average
    val mean = rows.values.map(_._2).sum / rows.size
    assert(mean > 0.2, s"IVF mean recall $mean implausibly low")
  }

  test("near-dup band width grows one bit per corpus doubling, clamped") {
    import Similarity.nearDupBitsFor
    assert(nearDupBitsFor(0) == 1)     // empty corpus: still a valid key
    assert(nearDupBitsFor(64) == 1)    // <= target: one bucket split only
    assert(nearDupBitsFor(65) == 1)    // 64*2^0 < 65 -> 1 bit
    assert(nearDupBitsFor(129) == 2)
    assert(nearDupBitsFor(500) == 3)   // sf0.001/sf0.01 corpus
    assert(nearDupBitsFor(2000) == 5)  // sf0.1
    assert(nearDupBitsFor(20000) == 9) // sf1 (10x)
    assert(nearDupBitsFor(Long.MaxValue / 2) == Similarity.NearDupMaxBits)
    // monotone: capacity never shrinks as the corpus grows
    val seq = (1L to 21L).map(i => nearDupBitsFor(i * 1000))
    assert(seq == seq.sorted)
  }

  test("near-dup recall envelope: documented values, decay, and the contract floor") {
    import Similarity.nearDupRecallEnvelope
    // the scaladoc's quoted numbers are the function's actual values
    val atSf1LowT = nearDupRecallEnvelope(20000L, 0.4)
    assert(atSf1LowT > 0.05 && atSf1LowT < 0.08,
      s"documented ~6% at sf1/t=0.4, got $atSf1LowT")
    // true near-dup territory keeps a usable floor THROUGH the 16-bit
    // cap (the largest corpus only ever sees 16-bit bands)
    assert(nearDupRecallEnvelope(Long.MaxValue / 2, 0.95) >= 0.55)
    // decay is monotone in n (one p(t)x step per corpus doubling
    // until the cap) and monotone-increasing in t at fixed n
    val byN = Seq(500L, 2000L, 20000L, 200000L).map(nearDupRecallEnvelope(_, 0.4))
    assert(byN == byN.sorted.reverse, s"recall must decay with n: $byN")
    val byT = Seq(0.2, 0.4, 0.6, 0.8, 0.95).map(nearDupRecallEnvelope(20000L, _))
    assert(byT == byT.sorted, s"recall must grow with t: $byT")
    // the per-doubling shrink factor past the cap region is p(t)
    val p = 1.0 - math.acos(0.4) / math.Pi
    assert(math.abs(p - 0.631) < 0.001)
  }

  test("adaptive near-dup: sound (every pair verified) with usable recall") {
    import spark.implicits._
    val got = Similarity.embedNearDups(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // soundness: each reported pair really clears the cosine threshold
    assert(got.forall(_._3 >= 0.4))
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
    // exhaustive truth at test scale (500 vecs -> 125k pairs)
    val e = Similarity.normalizeOf(graft.sources.Tables.embeddings(spark, sf))
    val exact = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(Similarity.cosine(col("a.v"), col("b.v")), 6).as("c"))
      .filter($"c" >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = got.map(p => (p._1, p._2)).toSet
    assert(found.subsetOf(exact), "banded result must be a subset of truth")
    // random 64-dim data is the adversarial recall case (threshold
    // pairs sit at ~3 sigma, not at near-dup cosines where the bands
    // concentrate); 3-bit bands x 4 bands should still recover ~2/3
    val recall = found.size.toDouble / math.max(exact.size, 1)
    assert(recall >= 0.3, s"near-dup recall $recall over ${exact.size} true pairs")
  }
}
