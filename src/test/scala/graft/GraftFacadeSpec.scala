package graft

import org.scalatest.funsuite.AnyFunSuite

/** The facade must work on arbitrary caller frames — nothing here
  * touches the harness testdata layout. */
class GraftFacadeSpec extends AnyFunSuite with SparkSpec {

  test("reference queries + DOT run on a caller-provided movies frame") {
    import spark.implicits._
    val movies = Seq(
      (1L, "alpha", Seq("x", "y", "z")),
      (2L, "beta", Seq("x", "y")),
      (3L, "gamma", Seq("x"))
    ).toDF("id", "title", "actors")
    val levels = Graft.titleLevels(movies, "alpha")
    assert(levels.collect().map(_.getString(0)).toSeq == Seq("gamma", "beta"))
    val dot = Graft.dotGraph(levels, "alpha")
    assert(dot.startsWith("digraph MovieGraph {"))
    assert(Graft.actorCoactors(movies, "x").count() == 2) // y, z
  }

  test("near-dedup pipeline runs on a caller-provided docs frame") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val docs = Seq(
      (1L, base),
      (2L, base + " tonight"),           // near-dup of 1
      (3L, "completely different words entirely unrelated to anything else here now")
    ).toDF("doc_id", "text")
    val pairs = Graft.nearDupPairs(docs, threshold = 0.5)
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    val clusters = Graft.dedupClusters(pairs)
    assert(clusters.collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      Map(1L -> 1L, 2L -> 1L))
  }

  test("knn runs on a caller-provided embeddings frame") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val nn = Graft.knn(emb, numProbes = 1, k = 2).collect()
    // probe 0: nearest is 1 (same direction), then 2 (orthogonal)
    assert(nn.map(_.getLong(2)).toSeq == Seq(1L, 2L))
  }

  test("k-means + semantic dedup run on a caller-provided embeddings frame") {
    import spark.implicits._
    // two tight direction clusters in 2-D
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.95f, 0.05f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    val model = Graft.trainKmeans(emb, k = 2, iters = 3)
    assert(model.nonEmpty && model.forall(_.cv.length == 2))
    val obj = Graft.kmeansObjective(emb, model)
    assert(obj >= -1e-9 && obj < 0.5, s"objective $obj not tight")
    val pairs = Graft.semanticDedupPairs(emb, model, threshold = 0.9)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // within-direction pairs survive; cross-direction cosines ~0
    assert(pairs == Set((0L, 1L), (2L, 3L)), s"pairs $pairs")
  }

  test("attribution pairs run on caller-provided event frames") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = Seq((1L, 10L, t("2024-01-01 10:00:00"), 0.0))
      .toDF("user_id", "event_id", "ts", "value")
    val purchases = Seq(
      (1L, 20L, t("2024-01-01 10:10:00"), 5.0),  // within 30 min
      (1L, 21L, t("2024-01-01 11:10:00"), 7.0),  // outside
      (2L, 22L, t("2024-01-01 10:10:00"), 9.0))  // other user
      .toDF("user_id", "event_id", "ts", "value")
    val got = Graft.attributionPairs(clicks, purchases).collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((10L, 20L)))
  }
}
