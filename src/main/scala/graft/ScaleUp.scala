package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive an sf1-equivalent (10×) dataset from the driver's
  * sf0.1 parquet for the SCALE-LINEARITY sweep — `graft.Bench` run
  * against the output proves every catalog query's wall time grows
  * ≤~linearly at a real 10× step, which sf0.1 alone cannot (the
  * round-10 verdict's #1 ask). The output is bench-only input: the
  * correctness gate stays exclusively on the driver's own testdata.
  *
  * Scaling semantics (TPC-H-style):
  *  - `region`/`nation` are fixed dimensions — copied verbatim;
  *  - every scaling table is replicated `factor`× with COPY-OFFSET
  *    keys, applied consistently to primary keys and every foreign
  *    key that references a scaled table, so join cardinalities and
  *    fan-outs grow exactly linearly (copy 0 is the identity);
  *  - timestamps keep their calendar span (more activity in the same
  *    period — the realistic growth axis; windows-per-day row counts
  *    scale, the day count does not);
  *  - `documents.text` in copies > 0 gets ~25% of its tokens
  *    replaced with copy-salted novel tokens. Verbatim copies would
  *    make every doc a 10-way exact/near duplicate and inflate
  *    candidate-pair counts ~45× (quadratic in the replication, an
  *    artifact of the scaler, not the engine); the replacement pushes
  *    cross-copy 3-gram Jaccard well under the MinHash band
  *    threshold while keeping per-copy duplicate structure intact,
  *    so dedup work scales like a real 10× corpus;
  *  - `embeddings.embedding` in copies > 0 is perturbed with a
  *    deterministic pseudo-random direction and re-normalized
  *    (cross-copy cosine ≈ 0.6, below every near-dup threshold) for
  *    the same reason; `label` balance is preserved.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("testdata-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // stage-then-rename: Spark's overwrite deletes the live directory
    // before the new files land, so a reader that lists mid-write sees
    // a torn table (old+new or partial — the suspected source of the
    // round-12 pre-fix sf1 artifact's doubled dsir corpus). Writing to
    // a process-unique sibling and promoting with two quick renames
    // shrinks the torn window from the whole job to microseconds. A
    // crash can still leave NO live table (between the live→.old and
    // .stage→live renames) — but never a HALF table, and the .old
    // sibling preserves the prior version for manual recovery; the
    // debris sweep below reclaims .stage-*/.old-* leftovers from any
    // crashed prior run before this one stages.
    def write(df: DataFrame, t: String): Unit = {
      val live = java.nio.file.Paths.get(s"$dst/$t.parquet")
      // sweep crashed-run debris for THIS table so repeated crashes
      // don't accumulate directories (the live table, if present, is
      // the canonical survivor — any parked .old/.stage is stale)
      Option(live.getParent.toFile.listFiles()).foreach(_.foreach { f =>
        val n = f.getName
        if ((n.startsWith(".stage-") || n.startsWith(".old-")) &&
            n.endsWith(s"-$t.parquet") && java.nio.file.Files.exists(live)) {
          def rmAll(g: java.io.File): Unit = {
            Option(g.listFiles()).foreach(_.foreach(rmAll)); g.delete(); ()
          }
          rmAll(f)
        }
      })
      val stage = java.nio.file.Paths.get(
        s"$dst/.stage-${java.util.UUID.randomUUID().toString.take(8)}-$t.parquet")
      df.write.mode("overwrite").parquet(stage.toString)
      val old = stage.resolveSibling(s".old-${stage.getFileName}")
      if (java.nio.file.Files.exists(live))
        java.nio.file.Files.move(live, old,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      java.nio.file.Files.move(stage, live,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      if (java.nio.file.Files.exists(old)) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(old.toFile)
      }
    }

    // fixed dimensions: copied verbatim
    Seq("region", "nation").foreach(t => write(read(t), t))

    // key spans measured from the source so offsets never collide
    def span(t: String, key: String): Long =
      read(t).agg(max(col(key))).head().getLong(0) + 1L
    val kCust = span("customer", "c_custkey")
    val kSupp = span("supplier", "s_suppkey")
    val kPart = span("part", "p_partkey")
    val kOrd = span("orders", "o_orderkey")
    val kEvt = span("events", "event_id")
    val kUser = span("events", "user_id")
    val kDoc = span("documents", "doc_id")
    val kVec = span("embeddings", "vec_id")

    val copies = spark.range(factor.toLong).select($"id".cast("int").as("cp"))
    def rep(df: DataFrame): DataFrame = df.crossJoin(broadcast(copies))
    def off(key: String, k: Long): Column = col(key) + $"cp" * lit(k)

    // key-derived entity names are REGENERATED from the offset key
    // (TPC-H style 'Customer#000000042') — replicating them verbatim
    // would hand every name 10 exact twins and quadratically inflate
    // any name-blocked join (the fuzzy join read 75× linear on the
    // first sweep from exactly this scaler artifact)
    def keyName(prefix: String, key: Column): Column =
      concat(lit(prefix), lpad(key.cast("string"), 9, "0"))
    write(rep(read("customer")).select(off("c_custkey", kCust).as("c_custkey"),
      keyName("Customer#", off("c_custkey", kCust)).as("c_name"),
      $"c_nationkey", $"c_acctbal", $"c_mktsegment"), "customer")
    write(rep(read("supplier")).select(off("s_suppkey", kSupp).as("s_suppkey"),
      keyName("Supplier#", off("s_suppkey", kSupp)).as("s_name"),
      $"s_nationkey", $"s_acctbal"), "supplier")
    write(rep(read("part")).select(off("p_partkey", kPart).as("p_partkey"),
      $"p_name", $"p_brand", $"p_type", $"p_size", $"p_retailprice"), "part")
    write(rep(read("orders")).select(off("o_orderkey", kOrd).as("o_orderkey"),
      off("o_custkey", kCust).as("o_custkey"), $"o_orderstatus",
      $"o_totalprice", $"o_orderdate", $"o_orderpriority"), "orders")
    write(rep(read("lineitem")).select(off("l_orderkey", kOrd).as("l_orderkey"),
      off("l_partkey", kPart).as("l_partkey"),
      off("l_suppkey", kSupp).as("l_suppkey"),
      $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount",
      $"l_tax", $"l_returnflag", $"l_linestatus", $"l_shipdate"), "lineitem")
    write(rep(read("events")).select(off("event_id", kEvt).as("event_id"),
      $"ts", off("user_id", kUser).as("user_id"), $"event_type", $"value",
      $"props"), "events")

    // documents: ~25% token replacement per copy (hash-chosen
    // positions, copy-salted novel tokens) — see the scaladoc
    val saltedText = when($"cp" === 0, $"text").otherwise(array_join(
      transform(split($"text", " "), (w, j) =>
        when(pmod(hash($"doc_id", $"cp", j), lit(4)) === 0,
          concat(w, lit("x"), $"cp".cast("string"))).otherwise(w)),
      " "))
    write(rep(read("documents"))
      .select(off("doc_id", kDoc).as("doc_id"), saltedText.as("text"),
        $"lang", $"source")
      .withColumn("n_chars", length($"text").cast("long")), "documents")

    // embeddings: each copy applies a per-copy SIGNED PERMUTATION of
    // the dimensions — an exact orthogonal transform, so every
    // within-copy inner product (and the unit norm) is preserved
    // bit-structure-for-bit-structure and the corpus's near-dup /
    // cluster geometry replicates exactly 10×, while cross-copy dots
    // collapse to ~0 (additive perturbations tried first were either
    // too gentle — cosine-0.6 echoes colliding in LSH bands — or,
    // with sin-sequence noise, mutually CORRELATED, which fabricated
    // 45M phantom near-dup pairs at sf1). Permutation k → (a·k + b)
    // mod d with odd a is bijective for d a power of two; signs come
    // from a murmur3 hash of (cp, k).
    // dimension comes from the DATA, not a constant: a hardcoded d
    // that drifted from the corpus width would make element_at read
    // past the array and silently fill scaled copies with nulls. The
    // odd-multiplier permutation is only bijective mod a power of
    // two, so assert that too instead of corrupting the output.
    // one aggregate probes dim AND raggedness (min==max) in a single
    // scan; headOption so an empty corpus fails with a message, not a
    // bare NoSuchElementException
    val dimProbe = read("embeddings")
      .agg(min(size($"embedding")), max(size($"embedding"))).collect().headOption
    val (dMin, dMax) = dimProbe match {
      case Some(r) if !r.isNullAt(0) => (r.getInt(0), r.getInt(1))
      case _ => sys.error(s"$src/embeddings.parquet is empty — nothing to scale")
    }
    require(dMin == dMax,
      s"embeddings corpus is ragged: vector dims span [$dMin, $dMax]")
    val d = dMin
    require(d > 0 && (d & (d - 1)) == 0,
      s"embedding dim $d must be a power of two for the signed-permutation scaler")
    val perm = transform(sequence(lit(0), lit(d - 1)), j => {
      val a = $"cp" * 2 + 1 // odd ⇒ bijective mod d (d a power of two)
      val idx = pmod(a * j + $"cp" * 17, lit(d))
      val sgn = (lit(1) - lit(2) * pmod(hash($"cp" * 1000 + j), lit(2)))
        .cast("float")
      element_at($"embedding", (idx + 1).cast("int")) * sgn
    })
    write(rep(read("embeddings"))
      .select(off("vec_id", kVec).as("vec_id"),
        when($"cp" === 0, $"embedding").otherwise(perm).as("embedding"),
        $"label"), "embeddings")

    // census so the run log shows the achieved scale step
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      println(s"[scaleup] $t: ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
