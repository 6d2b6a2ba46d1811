package graft.engine

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Entity-resolution tier: sorted-neighborhood blocking semantics against a
  * brute-force reference, Fellegi–Sunter band arithmetic, and end-to-end
  * planted-duplicate recall on the sf0.001 roster. */
class LinkageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("sortedNeighborhoodPairs matches the brute-force sliding window") {
    val recs = Seq(
      // (id, name, block)
      (1L, "alice", "X"), (2L, "alicia", "X"), (3L, "bob", "X"),
      (4L, "bobby", "X"), (5L, "carol", "X"),
      (6L, "alice", "Y"), (7L, "dan", "Y"),
      (8L, "erin", "Z")).toDF("id", "name", "segment")
    val got = Linkage
      .sortedNeighborhoodPairs(recs, "segment", "name", "id",
        carry = Seq("name"), window = 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // Reference: per block, sort by (name, id), pair with the next 1..2.
    val ref = Seq(("X", Seq(1L, 2L, 3L, 4L, 5L)), ("Y", Seq(6L, 7L)),
        ("Z", Seq(8L)))
      .flatMap { case (_, sorted) =>
        for {
          i <- sorted.indices
          d <- 1 until 3
          if i + d < sorted.length
        } yield (sorted(i), sorted(i + d), d)
      }.toSet
    assert(got == ref)
    // Cross-block pairs never appear — blocking's defining property.
    assert(!got.exists { case (a, b, _) => Set(a, b).subsetOf(Set(5L, 6L)) })
  }

  test("fellegiSunterScore bands follow the pinned integer weights") {
    val pairs = Seq(
      // agree on everything: 20+15+10 = 45 → match
      (1L, 2L, "Customer#000000010", "Customer#00000001", 7, 7, 3L, 3L),
      // name only (typo twin, different nation/band): 20-10-8 = 2 → non_match
      (3L, 4L, "Customer#000000010", "Customer#00000001", 1, 2, 3L, 4L),
      // fields only (one-digit name substitution): -15+15+10 = 10 → possible
      (5L, 6L, "Customer#000000011", "Customer#000000012", 7, 7, 3L, 3L),
      // nothing agrees: -15-10-8 = -33 → non_match
      (7L, 8L, "Customer#000000011", "Customer#000000099", 1, 2, 3L, 4L))
      .toDF("id_a", "id_b", "name_a", "name_b", "nation_a", "nation_b",
        "bal_band_a", "bal_band_b")
    val got = Linkage.fellegiSunterScore(pairs)
      .select("id_a", "score", "band").as[(Long, Double, String)]
      .collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == Seq(
      (1L, 4.5, "match"), (3L, 0.2, "non_match"),
      (5L, 1.0, "possible"), (7L, -3.3, "non_match")))
    // The name threshold really separates the two JW regimes it pins.
    val jwTypo = graft.functions.JaroWinkler.compute(
      "Customer#000000010", "Customer#00000001", winkler = true)
    val jwSub = graft.functions.JaroWinkler.compute(
      "Customer#000000011", "Customer#000000012", winkler = true)
    assert(jwTypo >= Linkage.NameAgreeThreshold)
    assert(jwSub < Linkage.NameAgreeThreshold)
  }

  test("planted duplicates resolve to their originals with full recall") {
    val customer = new Catalog(spark, sf).customer
    val d = Linkage.dirtyCustomers(customer)
    val pairs = Linkage.sortedNeighborhoodPairs(d, "segment", "name", "id",
      carry = Seq("name", "nation", "bal_band"), window = 3)
    val matches = Linkage.fellegiSunterScore(pairs)
      .filter(col("band") === "match")
      .select(least(col("id_a"), col("id_b")).as("src"),
        greatest(col("id_a"), col("id_b")).as("dst"))
      .as[(Long, Long)].collect().toSet
    val planted = customer.select(col("c_custkey").cast("long"))
      .filter(col("c_custkey") % 10 === 0).as[Long].collect().toSet
    // Every planted duplicate must match its original (recall floor = 1.0):
    // the typo keeps the twin inside the sort window and all FS fields agree.
    planted.foreach { k =>
      assert(matches.contains((k, k + 1000000L)),
        s"planted duplicate of $k not recovered")
    }
    // And matches must never link two distinct ORIGINALS: a match needs
    // name-JW ≥ 0.985, which two distinct 18-char roster names (≥1 digit
    // substitution, JW ≤ 0.97778) cannot reach without a transposition
    // coincidence — assert the corpus really has none, so entity ids stay
    // 2-element {orig, dup} sets.
    matches.foreach { case (a, b) =>
      assert(b == a + 1000000L, s"unexpected cross-entity match ($a, $b)")
    }
  }

  // ---- Phonetic-blocking tier (round 9) ---------------------------------

  test("Soundex kernel: classic vectors, including the H/W-transparency " +
       "and head-collapse rules") {
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // s,c merge across h
      "Tymczak" -> "T522", "Pfister" -> "P236",   // head code collapses f
      "Jackson" -> "J250", "Honeyman" -> "H555",
      "Smith" -> "S530", "Smyth" -> "S530",
      "Johnson" -> "J525", "Jonson" -> "J525",
      "O'Brien" -> "O165",                        // non-letter = separator
      "smith" -> "S530",                          // case-insensitive
      "" -> "")
    cases.foreach { case (in, want) =>
      assert(graft.functions.Soundex.compute(in) == want, in)
    }
  }

  test("every LastsVariant differs from its base last name in soundex — " +
       "the family-2 'phonetic blocker provably misses' precondition") {
    Linkage.Lasts.zip(Linkage.LastsVariant).foreach { case (base, variant) =>
      assert(base.head == variant.head,
        s"$base/$variant: variants must keep the first letter (sort locality)")
      val (sb, sv) = (graft.functions.Soundex.compute(base),
        graft.functions.Soundex.compute(variant))
      assert(sb != sv, s"$base → $sb == $variant → $sv")
    }
  }

  test("blocker union strictly dominates either pass alone on the planted " +
       "families, and each family lands where designed") {
    val rows = graft.SparkEntry.queries("q_er_eval_blockers")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (snF, phF, unF) = (rows("sorted_neighborhood")._3,
      rows("phonetic")._3, rows("union")._3)
    assert(unF > snF, "union must strictly dominate sorted-neighborhood " +
      "(family 0's shifted segment is invisible to it)")
    assert(unF > phF, "union must strictly dominate phonetic " +
      "(family 2's variant soundex is invisible to it)")
    // Family 0 (segment shift, 5 planted at sf0.001) is caught by phonetic
    // ALWAYS (identical unique name → adjacent in its soundex block), so
    // phonetic completeness covers families 0+1 exactly at this scale.
    assert(rows("phonetic")._3 == 10L)
    assert(rows("union")._3 == rows("union")._4, "union should reach full " +
      "completeness on the sf0.001 roster")
    // Phonetic blocks are tighter than segment blocks: fewer candidates.
    assert(rows("phonetic")._2 < rows("sorted_neighborhood")._2)
  }
}
