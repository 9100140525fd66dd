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
}
