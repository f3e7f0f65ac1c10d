package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** In-place corpus regeneration must invalidate every driver-side
  * memo (round-12 verdict items 2/5: the sf1 differential caught a
  * persisted ANN index serving stale neighbors after the corpus at
  * the same path was re-derived, and the committed sf1 artifact
  * recorded `llm_dsir_select` reading a corpus-sized frame that did
  * not match the files on disk). Every cache key now carries a
  * [[graft.util.ContentToken]] of its file inputs; these tests
  * regenerate a corpus AT THE SAME PATH mid-session and assert the
  * second read reflects the new bytes, not the memo.
  */
class CacheInvalidationSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_regen_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def writeEmbeddings(dir: String, n: Int, seed: Int): Unit = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f), i % 2)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def writeDocuments(dir: String, n: Int): Unit = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, if (i % 3 == 0) "en" else "de",
        s"alpha beta gamma delta token$i content row", 40L)
    }.toDF("doc_id", "lang", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("normalized-embeddings memo re-reads a corpus regenerated in place") {
    val dir = freshDir()
    writeEmbeddings(dir, 10, seed = 1)
    val before = graft.operators.Similarity
      .knnExact(spark, dir, numProbes = 2, k = 3)
    assert(before.agg(max("neighbor_id")).head().getLong(0) <= 9L)
    // regenerate AT THE SAME PATH: 3x the vectors, different values
    writeEmbeddings(dir, 30, seed = 2)
    val after = graft.operators.Similarity
      .knnExact(spark, dir, numProbes = 2, k = 29)
    // 29 neighbors per probe only exist in the 30-vector corpus; a
    // stale normalized-frame memo would cap the join at 9 candidates
    assert(after.groupBy("probe_id").count().agg(min("count")).head().getLong(0) == 29L)
    assert(after.agg(max("neighbor_id")).head().getLong(0) >= 10L)
  }

  test("dsir_select row count tracks an in-place documents regeneration") {
    val dir = freshDir()
    writeEmbeddings(dir, 4, seed = 3) // unrelated table, present for realism
    writeDocuments(dir, 10)
    val n1 = graft.operators.TextAnalytics.dsirSelect(spark, dir, selectN = 5).count()
    assert(n1 == 10L, s"dsir returns one row per doc, got $n1")
    writeDocuments(dir, 25)
    // the flagged failure mode: a stale cached term frame (or stale
    // file listing) makes the output row count disagree with the
    // corpus on disk
    val n2 = graft.operators.TextAnalytics.dsirSelect(spark, dir, selectN = 5).count()
    assert(n2 == 25L, s"dsir must re-read the regenerated corpus, got $n2")
  }

  test("movies view memo re-reads a regenerated lineitem") {
    import spark.implicits._
    val dir = freshDir()
    def writeLineitem(orders: Int): Unit =
      (0 until orders).flatMap(o => Seq((o.toLong, o.toLong * 2), (o.toLong, o.toLong * 2 + 1)))
        .toDF("l_orderkey", "l_partkey")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    writeLineitem(5)
    assert(graft.sources.Tables.movies(spark, dir).count() == 5L)
    writeLineitem(12)
    assert(graft.sources.Tables.movies(spark, dir).count() == 12L)
  }

  test("kmeans model cache retrains on an in-place embeddings regeneration") {
    val dir = freshDir()
    writeEmbeddings(dir, 40, seed = 4)
    val runs0 = graft.operators.Clustering.trainRuns.get()
    graft.operators.Clustering.kmeans(spark, dir).count()
    val runs1 = graft.operators.Clustering.trainRuns.get()
    assert(runs1 == runs0 + 1)
    // same path, same bytes: the memo must HIT (no retrain) …
    graft.operators.Clustering.kmeans(spark, dir).count()
    assert(graft.operators.Clustering.trainRuns.get() == runs1)
    // … and a regeneration must MISS (retrain over the new bytes)
    writeEmbeddings(dir, 40, seed = 5)
    graft.operators.Clustering.kmeans(spark, dir).count()
    assert(graft.operators.Clustering.trainRuns.get() == runs1 + 1)
  }
}
