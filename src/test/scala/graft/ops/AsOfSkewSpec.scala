package graft.ops

import graft.SparkTestBase

class AsOfSkewSpec extends SparkTestBase {

  test("asof join picks most recent right row at or before left time") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("id", "user", "t")
    val right = Seq(("u1", 90L, 900L), ("u1", 200L, 901L), ("u2", 60L, 902L))
      .toDF("user", "rt", "rid")
    val out = AsOf.join(left, right, "user", "t", "rt", "rid")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[Any]("asof_time")), Option(r.getAs[Any]("asof_value"))))
      .toMap
    assert(out(1L) == (Some(90L), Some(900L)))   // 90 <= 100 < 200
    assert(out(2L) == (Some(200L), Some(901L)))  // most recent
    assert(out(3L) == (None, None))              // 60 > 50: no match
  }

  test("asof join inclusive at equal timestamps") {
    import spark.implicits._
    val left = Seq((1L, "u", 100L)).toDF("id", "user", "t")
    val right = Seq(("u", 100L, 7L)).toDF("user", "rt", "rid")
    val out = AsOf.join(left, right, "user", "t", "rt", "rid").collect()
    assert(out.head.getAs[Long]("asof_value") == 7L)
  }

  test("forward asof picks earliest right row at or after left time") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("id", "user", "t")
    val right = Seq(("u1", 90L, 900L), ("u1", 200L, 901L), ("u2", 40L, 902L))
      .toDF("user", "rt", "rid")
    val out = AsOf.joinForward(left, right, "user", "t", "rt", "rid")
      .collect().map(r => r.getAs[Long]("id") ->
        (Option(r.getAs[Any]("asof_time")), Option(r.getAs[Any]("asof_value"))))
      .toMap
    assert(out(1L) == (Some(200L), Some(901L)))  // next at/after 100
    assert(out(2L) == (None, None))              // nothing after 250
    assert(out(3L) == (None, None))              // 40 < 50: no match
    // inclusive at equal time
    val eq = AsOf.joinForward(
      Seq((1L, "u", 100L)).toDF("id", "user", "t"),
      Seq(("u", 100L, 7L)).toDF("user", "rt", "rid"),
      "user", "t", "rt", "rid").collect()
    assert(eq.head.getAs[Long]("asof_value") == 7L)
  }

  test("asof match keeps time and value from the SAME right row") {
    import spark.implicits._
    // right value NULL on the nearest row: independent ignoreNulls
    // scans would pair rt=200 with rv=5 from the OLDER row
    val left = Seq((1L, "u", 250L)).toDF("id", "user", "t")
    val right = Seq(("u", 100L, Some(5L)), ("u", 200L, None))
      .toDF("user", "rt", "rid")
    val out = AsOf.join(left, right, "user", "t", "rt", "rid").collect().head
    assert(out.getAs[Long]("asof_time") == 200L)
    assert(out.isNullAt(out.fieldIndex("asof_value")),
      "value must come from the matched rt=200 row, which is NULL")
    // a right row with NULL time is never a match
    val rightNullT = Seq(("u", Option.empty[Long], 99L)).toDF("user", "rt", "rid")
    val out2 = AsOf.join(left, rightNullT, "user", "t", "rt", "rid").collect().head
    assert(out2.isNullAt(out2.fieldIndex("asof_time")))
    assert(out2.isNullAt(out2.fieldIndex("asof_value")))
    // a LEFT row with NULL time never matches — in BOTH directions
    // (nulls sort first: the forward frame would otherwise pair it
    // with the earliest right row)
    val leftNullT = Seq((1L, "u", Option.empty[Long])).toDF("id", "user", "t")
    Seq(AsOf.join(leftNullT, right, "user", "t", "rt", "rid"),
        AsOf.joinForward(leftNullT, right, "user", "t", "rt", "rid"))
      .foreach { df =>
        val r = df.collect().head
        assert(r.isNullAt(r.fieldIndex("asof_time")))
        assert(r.isNullAt(r.fieldIndex("asof_value")))
      }
  }

  test("asof tolerance nulls matches beyond the bound") {
    import spark.implicits._
    val left = Seq((1L, "u", 100L), (2L, "u", 500L)).toDF("id", "user", "t")
    val right = Seq(("u", 90L, 900L)).toDF("user", "rt", "rid")
    val out = AsOf.join(left, right, "user", "t", "rt", "rid",
        tolerance = Some(50L))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("asof_value"))).toMap
    assert(out(1L) == Some(900L))  // 100 - 90 = 10 <= 50
    assert(out(2L) == None)        // 500 - 90 = 410 > 50: out of reach
  }

  test("consistent sample is deterministic and near the target fraction") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val s1 = Sampling.consistentSample(docs, "doc_id", 0.25)
    val s2 = Sampling.consistentSample(docs.repartition(7), "doc_id", 0.25)
    assertSameRows(s1, s2) // stable under repartitioning
    val frac = s1.count().toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"fraction $frac")
    // fraction 1.0 keeps everything (9-hex-char threshold regression)
    assert(Sampling.consistentSample(docs, "doc_id", 1.0).count() == docs.count())
  }

  test("weighted sample group keys with quotes and backslashes are safe") {
    import spark.implicits._
    val df = Seq((1L, "a'b"), (2L, "c\\"), (3L, "plain"))
      .toDF("id", "grp")
    // keys go through lit(), not SQL-text splicing — no parse error,
    // and the per-group fraction applies to the exact key
    val kept = Sampling.weightedSample(df, "grp", "id",
      Map("a'b" -> 1.0, "c\\" -> 1.0), default = 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("stratified sample takes exactly perGroup rows per stratum") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
    val out = Sampling.stratifiedSample(docs, "lang", "doc_id", 3)
    val counts = out.groupBy("lang").count().collect()
    assert(counts.nonEmpty)
    counts.foreach(r => assert(r.getLong(1) == 3))
  }

  test("weighted sample keeps per-group fractions, monotone in weight") {
    val docs = spark.read.parquet(s"${graft.TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "source")
    val langs = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val g0 = langs.head
    // fraction 1.0 keeps EVERY row of its group (9-hex-char threshold
    // regression: 2^32 formats to 9 chars and breaks the compare)
    val full = Sampling.weightedSample(docs, "source", "doc_id",
      Map(g0 -> 1.0), default = 0.0)
    assert(full.count() == docs.filter(s"source = '$g0'").count())
    // monotone: the kept set at 0.2 is a subset of the kept set at 0.6
    def ids(f: Double): Set[Long] =
      Sampling.weightedSample(docs, "source", "doc_id", Map.empty, f)
        .collect().map(_.getLong(0)).toSet
    val (lo, hi) = (ids(0.2), ids(0.6))
    assert(lo.subsetOf(hi))
    assert(lo.nonEmpty && hi.size < docs.count())
  }

  test("interval join pairs each point with every containing interval") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("id", "user", "t")
    val right = Seq(("u1", 90L, 120L, 900L),   // contains t=100
                    ("u1", 95L, 300L, 901L),   // contains 100 AND 250
                    ("u2", 60L, 80L, 902L))    // misses t=50
      .toDF("user", "lo", "hi", "rid")
    val out = AsOf.intervalJoin(left, right, "user", "t", "lo", "hi", 50L)
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 900L), (1L, 901L), (2L, 901L)))
  }

  test("interval join: one row per pair even when the interval spans buckets") {
    import spark.implicits._
    // interval [0, 1000] spans 21 buckets at bucket=50; the point's
    // single bucket keeps the pair from duplicating
    val left = Seq((1L, "u", 500L)).toDF("id", "user", "t")
    val right = Seq(("u", 0L, 1000L, 9L)).toDF("user", "lo", "hi", "rid")
    val out = AsOf.intervalJoin(left, right, "user", "t", "lo", "hi", 50L)
    assert(out.count() == 1)
    // inclusive at both ends; NULL bounds / reversed intervals drop
    val edges = Seq(("u", 500L, 500L, 1L),
                    ("u", 400L, 500L, 2L), ("u", 500L, 600L, 3L))
      .toDF("user", "lo", "hi", "rid")
    val eo = AsOf.intervalJoin(left, edges, "user", "t", "lo", "hi", 50L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(eo == Set(1L, 2L, 3L))
    val bad = Seq(("u", Option.empty[Long], Option(1000L), 1L),
                  ("u", Option(600L), Option(400L), 2L))
      .toDF("user", "lo", "hi", "rid")
    assert(AsOf.intervalJoin(left, bad, "user", "t", "lo", "hi", 50L)
      .count() == 0)
  }

  test("interval join equals the naive key-join + range filter") {
    import spark.implicits._
    // deterministic pseudo-random layout, several bucket widths
    val left = (0 until 300).map { i =>
      (i.toLong, s"u${i % 7}", (i * 37 % 211).toLong) }.toDF("id", "user", "t")
    val right = (0 until 120).map { i =>
      val lo = (i * 53 % 190).toLong
      (s"u${i % 7}", lo, lo + (i * 13 % 45).toLong, i.toLong)
    }.toDF("user", "lo", "hi", "rid")
    val naive = left.join(right, Seq("user"))
      .filter($"t" >= $"lo" && $"t" <= $"hi").select("id", "rid")
    for (bucket <- Seq(1L, 7L, 64L, 1000L)) {
      val out = AsOf.intervalJoin(left, right, "user", "t", "lo", "hi", bucket)
        .select("id", "rid")
      assertSameRows(out, naive)
    }
  }

  test("salted aggregation equals plain groupBy") {
    val events = spark.read.parquet(s"${graft.TestSpark.sfDir}/events.parquet")
    val salted = Skew.saltedSumCount(events, "event_type", "value", "event_id")
    val plain = events.groupBy("event_type")
      .agg(org.apache.spark.sql.functions.round(
             org.apache.spark.sql.functions.sum("value"), 2).as("sum_value"),
           org.apache.spark.sql.functions.count(
             org.apache.spark.sql.functions.lit(1)).as("n"))
    assertSameRows(salted, plain)
  }
}
