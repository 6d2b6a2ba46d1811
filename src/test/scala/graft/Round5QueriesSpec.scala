package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-5 analytics queries that the DuckDB
  * oracle can't express directly — each checks the MATH of the declared
  * query shape against an independent small-scale reference. */
class Round5QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("rolling median matches a brute-force per-row frame median") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey").cast("string"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val expected = rows.flatMap { case (_, g) =>
      g.indices.map { i =>
        val fr = g.slice(math.max(0, i - 3), i + 1).map(_._3).sorted
        val m = if (fr.length % 2 == 1) fr(fr.length / 2)
                else (fr(fr.length / 2 - 1) + fr(fr.length / 2)) / 2
        g(i)._2 -> BigDecimal(m).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      }
    }.toMap
    val got = SparkEntry.queries("q_rolling_median")(spark, sf)
      .as[(Long, Double)].collect().toMap
    assert(got.size == expected.size)
    got.foreach { case (k, v) =>
      assert((BigDecimal(v) - expected(k)).abs <= BigDecimal("0.001"),
        s"orderkey $k: got $v expected ${expected(k)}")
    }
  }

  test("funnel stages are monotonically non-increasing and bounded by users") {
    val r = SparkEntry.queries("q_funnel")(spark, sf).collect().head
    val (n, s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n >= s1 && s1 >= s2 && s2 >= s3 && s3 >= 0)
  }

  test("char_ngrams: exactly 5 ranked trigrams per lang, counts non-increasing") {
    val out = SparkEntry.queries("q_char_ngrams")(spark, sf)
      .as[(String, Long, String, Long)].collect().groupBy(_._1)
    assert(out.nonEmpty)
    out.foreach { case (lang, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 5L), s"ranks for $lang")
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"counts not sorted for $lang")
      assert(rows.forall(_._3.length == 3))
    }
  }

  test("vocab_truncate: every surviving token >= floor, <unk> absorbs the tail") {
    val out = SparkEntry.queries("q_vocab_truncate")(spark, sf)
      .as[(String, Long)].collect().toMap
    val kept = out.filter(_._1 != "<unk>")
    assert(kept.values.forall(_ >= 50), "a sub-floor token escaped truncation")
    // total token count is conserved by the rewrite
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).count()
    assert(out.values.sum == total)
  }

  test("pii_redact leaves no email-shaped span behind") {
    val re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
    val remaining = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("aug", concat(col("text"), lit(" contact: user"),
        col("doc_id"), lit("@example.com")))
      .withColumn("redacted", regexp_replace(col("aug"), re, "<EMAIL>"))
      .filter(col("redacted").rlike(re)).count()
    assert(remaining == 0)
    // and the audit found exactly one injected email per doc
    val n = SparkEntry.queries("q_pii_redact")(spark, sf)
      .agg(sum("n_emails"), sum("n_docs")).as[(Long, Long)].collect().head
    assert(n._1 == n._2)
  }

  test("zscore outlier rate is sane (between 0 and 10% per group)") {
    SparkEntry.queries("q_zscore_outliers")(spark, sf)
      .as[(String, Long, Long, Double)].collect().foreach {
        case (st, n, out, maxZ) =>
          assert(out >= 0 && out <= n / 10, s"$st: $out outliers of $n")
          assert(maxZ > 2 || out == 0)
      }
  }

  test("contamination flags exactly the docs sharing a verbatim 8-token run") {
    // brute-force reference: token-window set intersection per (eval, train)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 8) Set.empty
      else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" ")).toSet
    }
    val ev = docs.filter(_._2 == "src0").map(d => (d._1, shingles(d._3)))
    val tr = docs.filter(_._2 != "src0").map(d => (d._1, shingles(d._3)))
    val expected = ev.flatMap { case (eid, es) =>
      val n = tr.count { case (_, ts) => es.exists(ts) }
      if (n > 0) Some(eid -> n.toLong) else None
    }.toMap
    val got = SparkEntry.queries("q_contamination")(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("mix_sample keeps a per-source fraction near its configured rate") {
    SparkEntry.queries("q_mix_sample")(spark, sf)
      .as[(String, Long, Long)].collect().foreach { case (src, total, kept) =>
        val rate = src match { case "src0" => 8 case "src1" => 4 case _ => 2 }
        assert(kept <= total)
        // md5 nibbles are uniform: expect ~total*rate/16, allow wide slack
        // at 25-doc-per-source scale (binomial sd ≈ 2.2)
        val exp = total * rate / 16.0
        assert(math.abs(kept - exp) <= 9, s"$src: kept $kept vs expected $exp")
      }
  }

  test("skew/kurt of a symmetric two-point distribution are 0 and -2") {
    // independent check of the central-moment formula shape on known data
    val df = Seq.tabulate(100)(i => ("g", if (i % 2 == 0) -1.0 else 1.0))
      .toDF("g", "x")
    val mu = df.groupBy("g").agg(avg("x").as("mu"))
    val r = df.join(broadcast(mu), "g").groupBy("g")
      .agg(avg(pow(col("x") - col("mu"), 2)).as("m2"),
        avg(pow(col("x") - col("mu"), 3)).as("m3"),
        avg(pow(col("x") - col("mu"), 4)).as("m4"))
      .select((col("m3") / pow(col("m2"), 1.5)).as("skew"),
        (col("m4") / pow(col("m2"), 2) - 3).as("kurt"))
      .as[(Double, Double)].collect().head
    assert(math.abs(r._1) < 1e-12 && math.abs(r._2 + 2) < 1e-12)
  }
}
