package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic checks for the round-12 changes: the Merkle block fold must be
  * root-invariant, and the widened perplexity-bucket order key must rank
  * correctly past the old doc_id < 2³³ ceiling.
  */
class Round12QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("numberedLeaves with a struct order key + leading-component image " +
      "ranks exactly, at ids past 2^34") {
    import spark.implicits._
    // ids straddle 2^34 (the old composite long key overflowed past 2^33);
    // xent keys collide across ids, so the rank must come from the full
    // (xk, id) struct order, while bucketing on xk alone stays exact
    // because it is monotone (non-injective is fine).
    val big = 1L << 34
    val rows = Seq(
      (5L, big + 3), (5L, 17L), (2L, big + 9), (9L, 1L),
      (2L, 4L), (9L, big), (5L, big + 1), (2L, big + 2))
    val df = rows.toDF("xk", "doc_id")
      .withColumn("k", lit(0))
      .withColumn("ok", struct(col("xk"), col("doc_id")))
    val got = graft.engine.Merkle.numberedLeaves(
        df, "k", "ok", "doc_id", buckets = 4,
        imageCol = Some(col("ok").getField("xk")))
      .select(col("h").cast("long").as("doc_id"), col("pos"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = rows.sorted.zipWithIndex
      .map { case ((_, id), i) => id -> i.toLong }.toMap
    assert(got === expected)
  }

  test("rootPerKey block fold == per-level reduction == reference fold") {
    import spark.implicits._
    // 13 leaves per key: exercises odd tails at several levels AND a
    // partial trailing block under blockBits = 2 (blocks of 4: 4+4+4+1)
    val leaves = (0 until 13).flatMap(p => Seq(("a", p, f"h$p%02d"), ("b", p, f"g$p%02d")))
      .toDF("k", "pos", "h")
    val depth = graft.engine.Merkle.depthFor(13)
    val blocked = graft.engine.Merkle.rootPerKey(
        leaves, "k", "pos", "h", depth, blockBits = 2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val unblocked = graft.engine.Merkle.rootPerKey(
        leaves, "k", "pos", "h", depth, blockBits = 0)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val ref = Map(
      "a" -> graft.engine.Merkle.referenceRoot((0 until 13).map(p => f"h$p%02d")),
      "b" -> graft.engine.Merkle.referenceRoot((0 until 13).map(p => f"g$p%02d")))
    assert(blocked === ref)
    assert(unblocked === ref)
  }

  test("simhashOfHashes over md5-60 hashes: sign-sum rule, in-memory mirror") {
    import spark.implicits._
    val texts = Seq("the quick brown fox", "the quick brown fox",
      "a completely different document body here", "one")
    val got = texts.toDF("text")
      .select(graft.llm.Dedup.simhashPortable(col("text")).as("sig"))
      .collect().map(_.getLong(0))
    // independent mirror: md5-60 per token, per-bit +1/-1 sign sum
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    def sim(t: String): Long = {
      val hs = t.split("\\s+").map(h60)
      (0 until 64).foldLeft(0L) { (acc, j) =>
        val c = hs.map(h => if (((h >>> j) & 1L) == 1L) 1 else -1).sum
        if (c > 0) acc | (1L << j) else acc
      }
    }
    assert(got.toSeq === texts.map(sim))
    assert(got(0) === got(1)) // identical text, identical signature
    // 60-bit hashes: bits 60..63 can never be set
    got.foreach(s => assert((s >>> 60) === 0L))
  }

  test("minhashNearDupsPortable finds the planted near-dup and exact-dup pairs") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (0L, base),
      (1L, base), // exact duplicate of 0
      (2L, base + " phi"), // near-dup of 0/1
      (3L, "totally unrelated words about spark catalyst tungsten codegen " +
        "planning shuffles exchanges partitions")
    ).toDF("doc_id", "text")
    val pairs = graft.llm.Dedup
      .minhashNearDupsPortable(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair.get((0L, 1L)).contains(1.0)) // exact dup: jaccard 1
    assert(byPair.contains((0L, 2L)) && byPair((0L, 2L)) >= 0.5)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated stays out
  }
}
