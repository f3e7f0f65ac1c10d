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
}
