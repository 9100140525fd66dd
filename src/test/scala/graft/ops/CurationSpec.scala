package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/** Crawl-curation primitives (SURVEY §2.2): URL canonicalization,
  * registered-domain heuristic, per-domain caps. */
class CurationSpec extends SparkTestBase {

  private def norm(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u")
      .select(Curation.normalizedUrl(F.col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
  }

  private def dom(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u")
      .select(Curation.registeredDomain(F.col("u")).as("d"))
      .collect().map(_.getString(0)).toSeq
  }

  test("url normalization strips scheme, www, query, fragment, slashes") {
    assert(norm(
      "HTTPS://WWW.Example.COM/A/B/?q=1#frag",
      "http://example.com/path///",
      "example.com/path?x=1",
      "ftp://files.example.org/f.txt",
      "https://www.example.com",
      "localhost:8080/x/"
    ) == Seq(
      "example.com/a/b",
      "example.com/path",
      "example.com/path",
      "files.example.org/f.txt",
      "example.com",
      "localhost:8080/x"))
  }

  test("registered domain takes the last two labels; dot-free hosts stand") {
    assert(dom(
      "https://a.b.Example.com/x",
      "https://www.example.co/x", // www is stripped BEFORE the heuristic
      "http://example.com",
      "http://localhost/x"
    ) == Seq("example.com", "example.co", "example.com", "localhost"))
  }

  test("registered domain honors multi-label public suffixes (r6)") {
    assert(dom(
      "https://shop.Example.co.uk/x",
      "https://news.bbc.co.uk",
      "http://example.com.au/y",
      "https://www.example.com.au", // www stripped before the lookup
      "https://a.b.example.co.jp/z",
      "https://example.gob.mx",
      // the bare suffix itself falls back to the suffix (no
      // registrable label below it)
      "https://co.uk/",
      // ordinary TLDs keep the last-two heuristic
      "https://a.b.example.com/x"
    ) == Seq("example.co.uk", "bbc.co.uk", "example.com.au",
      "example.com.au", "example.co.jp", "example.gob.mx",
      "co.uk", "example.com"))
  }

  test("registered domain accepts a caller-supplied suffix set incl. 3-label") {
    import spark.implicits._
    val d = Seq("https://x.city.kawasaki.jp/a", "https://x.co.uk/b")
      .toDF("u")
      .select(Curation.registeredDomain(F.col("u"),
        suffixes = Seq("city.kawasaki.jp")).as("d"))
      .collect().map(_.getString(0)).toSeq
    // 3-label suffix extends to four labels; co.uk NOT in the custom
    // set falls back to last-two
    assert(d == Seq("x.city.kawasaki.jp", "co.uk"))
  }

  test("pageRank restores the caller's prior checkpoint dir (r6)") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = java.nio.file.Files
      .createTempDirectory("graft_prior_ckpt").toString
    sc.setCheckpointDir(before)
    val prDir = java.nio.file.Files
      .createTempDirectory("graft_pr_ckpt2").toString
    Curation.pageRank(Seq((1L, 2L)).toDF("src", "dst"),
      iterations = 1, checkpointDir = Some(prDir)).collect()
    // the session-global dir is back to the caller's (URI-normalized)
    assert(sc.getCheckpointDir.exists(_.contains(
      new java.io.File(before).getName)))
  }

  test("per-domain cap keeps the best n deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a.x.com/1", 100L),
      (2L, "https://b.x.com/2", 300L),
      (3L, "https://www.x.com/3", 200L),
      (4L, "https://x.com/4", 200L), // ties with 3 -> id breaks it
      (5L, "https://y.org/5", 10L)
    ).toDF("doc_id", "url", "n_chars")
    val kept = Curation.capPerDomain(docs, F.col("url"), 2,
        Seq(F.col("n_chars").desc, F.col("doc_id")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // x.com group = {1,2,3,4}: best two are 2 (300) then 3 (200, id<4)
    assert(kept == Set(2L, 3L, 5L))
  }

  test("quantile filter keeps exactly the top fraction") {
    import spark.implicits._
    val df = (1 to 100).map(_.toLong).toDF("s")
    // 75th percentile of 1..100 interpolates to 75.25 -> keep 76..100
    val kept = Curation.keepTopQuantile(df, F.col("s"), 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(kept == (76 to 100).map(_.toLong).toSet)
    // keepFrac 1.0 keeps everything (threshold = the minimum)
    assert(Curation.keepTopQuantile(df, F.col("s"), 1.0).count() == 100)
    // the approx path lands within sketch tolerance on this range
    val approxN = Curation.keepTopQuantile(df, F.col("s"), 0.25,
      exact = false).count()
    assert(approxN >= 20 && approxN <= 30)
  }

  test("cap output drops helper columns and keeps the input schema") {
    import spark.implicits._
    val docs = Seq((1L, "https://x.com/1", 5L)).toDF("doc_id", "url", "n_chars")
    val out = Curation.capPerDomain(docs, F.col("url"), 1, Seq(F.col("doc_id")))
    assert(out.columns.toSeq == Seq("doc_id", "url", "n_chars"))
  }

  // ---- pageRank (r5c) -------------------------------------------------

  test("pageRank handles dangling nodes with exact hand-computed values") {
    import spark.implicits._
    // a -> b, b dangles. N=2, r0 = (0.5, 0.5).
    // iter1: dangling mass = 0.5 (b); contrib(b) = 0.5/1
    //   a: 0.15/2 + 0.85*(0 + 0.25)   = 0.2875
    //   b: 0.15/2 + 0.85*(0.5 + 0.25) = 0.7125
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r = Curation.pageRank(edges, iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.2875) < 1e-12)
    assert(math.abs(r(2L) - 0.7125) < 1e-12)
  }

  test("pageRank conserves total mass and ranks the hub highest") {
    import spark.implicits._
    // star: 1..5 all point at 6; 6 points back at 1
    val edges = ((1L to 5L).map(i => (i, 6L)) :+ ((6L, 1L))).toDF("src", "dst")
    val r = Curation.pageRank(edges, iterations = 8)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // dangling-safe mass
    // 1 receives ALL of the hub's concentrated mass (0.85·r(6)) and
    // dominates; the hub collects the five base-rate leaves; the
    // symmetric leaves tie at the bottom
    assert(r(1L) == r.values.max)
    assert(r(6L) > r(2L))
    assert((2L to 5L).map(r).distinct.size == 1)
  }

  test("pageRank lazy tiny tier equals the eager checkpointed tier (r9)") {
    import spark.implicits._
    // asymmetric graph with a dangling node (4) so the invariant-based
    // dangling mass (1 − Σ in) is load-bearing in every round
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val lazyT = Curation.pageRank(edges, iterations = 5)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    val dial = "spark.graft.pagerank.lazyUnrollRows"
    spark.conf.set(dial, "0") // force the eager tier
    try {
      val eager = Curation.pageRank(edges, iterations = 5)
        .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
      assert(lazyT.map(_._1).toSeq == eager.map(_._1).toSeq)
      lazyT.zip(eager).foreach { case ((n1, a), (_, b)) =>
        assert(math.abs(a - b) < 1e-12, s"node $n1: $a vs $b")
      }
      assert(math.abs(lazyT.map(_._2).sum - 1.0) < 1e-9)
    } finally spark.conf.unset(dial)
  }

  test("pageRank reliable-checkpoint path equals the local path") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val local = Curation.pageRank(edges, iterations = 4)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pr_ckpt").toString
    val reliable = Curation.pageRank(edges, iterations = 4,
        checkpointDir = Some(dir))
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1)
    assert(local.toSeq == reliable.toSeq)
  }
}
