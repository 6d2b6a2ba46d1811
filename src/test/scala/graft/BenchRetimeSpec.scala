package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-15 bench-measurement changes (r14 verdict punch #2/#3):
  * the adaptive end-of-chunk retime selection (replacing the fixed head-8
  * constant) and the per-chunk trusted stamps (one contended chunk must no
  * longer untrusted-stamp a whole suite's run values). Both are pure
  * functions — no SparkSession, no timing. */
class BenchRetimeSpec extends AnyFunSuite {

  // ------------------------------------------------------- pickRetimes

  test("pickRetimes selects only queries over ratio× their committed floor") {
    val floors = Map("q_a" -> 1.0, "q_b" -> 1.0, "q_c" -> 1.0)
    val runs = Vector("q_a" -> 1.4, "q_b" -> 1.6, "q_c" -> 3.0)
    // 1.4 ≤ 1.5× floor → not picked; 1.6 and 3.0 are
    assert(Bench.pickRetimes(runs, floors) === Vector("q_c", "q_b"))
  }

  test("pickRetimes orders worst ratio first (name-tiebroken) and skips no-floor / failed queries") {
    val floors = Map("q_slow" -> 0.5, "q_slower" -> 0.5, "q_crashed" -> 1.0)
    val runs = Vector(
      "q_new" -> 9.9,      // no committed floor → adaptive-min already double-passed it
      "q_crashed" -> -1.0, // failed → a retime can't resurrect it
      "q_slow" -> 1.0,     // 2.0× floor
      "q_slower" -> 2.0)   // 4.0× floor — worst, first
    assert(Bench.pickRetimes(runs, floors) === Vector("q_slower", "q_slow"))
  }

  test("pickRetimes ties on ratio break deterministically by name") {
    val floors = Map("q_b" -> 1.0, "q_a" -> 1.0)
    val runs = Vector("q_b" -> 2.0, "q_a" -> 2.0)
    assert(Bench.pickRetimes(runs, floors) === Vector("q_a", "q_b"))
  }

  test("pickRetimes is budget-bounded by the sum of chosen floors (charge-before-admit)") {
    // 10 queries, each 2× its 4s floor: 15s budget admits the first 3
    // (charges run 11, 7, 3; the 4th pick's charge would take the running
    // total to 16 > 15, so it is refused — the chosen floors can never sum
    // past the budget; advisor, round 15).
    val floors = (1 to 10).map(i => f"q_$i%02d" -> 4.0).toMap
    val runs = (1 to 10).map(i => f"q_$i%02d" -> 8.0).toVector
    val picked = Bench.pickRetimes(runs, floors, budgetSec = 15.0)
    assert(picked.size === 3)
    assert(picked.map(floors).sum <= 15.0)
  }

  test("pickRetimes floors tiny committed floors at 0.05s and hard-caps the pick count") {
    // 1000 queries with 1ms floors, all "slow": nominal floor sum is 1s,
    // the 0.05 per-pick charge admits budget/0.05 = 300 — but a retime
    // on a hot box runs at contended speed, not floor speed, so the
    // maxPicks cap (default 24) is what bounds real wall time.
    val floors = (1 to 1000).map(i => f"q_$i%04d" -> 0.001).toMap
    val runs = (1 to 1000).map(i => f"q_$i%04d" -> 1.0).toVector
    assert(Bench.pickRetimes(runs, floors, budgetSec = 15.0).size === 24)
    // with the count cap lifted, the 0.05 charge still bounds it at
    // ~budget/0.05 = 300 (the exact boundary is FP-sensitive: 15.0 − 300
    // binary 0.05s lands a hair below zero, refusing the 300th pick) and
    // charge-before-admit guarantees the charged sum never exceeds budget
    val uncapped = Bench.pickRetimes(runs, floors, budgetSec = 15.0,
      maxPicks = Int.MaxValue)
    assert(uncapped.size >= 299 && uncapped.size <= 300)
    assert(uncapped.size * 0.05 <= 15.0 + 1e-9)
  }

  test("pickRetimes returns empty when everything is within ratio of its floor") {
    val floors = Map("q_a" -> 1.0)
    assert(Bench.pickRetimes(Vector("q_a" -> 1.1), floors) === Vector.empty)
  }

  // --------------------------------------- runRetimes wall-clock cap

  test("runRetimes min-folds a successful retime into run AND floor; a failed retime leaves both") {
    val results = Vector("q_a" -> (2.0, 1.8), "q_b" -> (3.0, 2.5), "q_c" -> (1.0, 1.0))
    val times = Map("q_a" -> 1.5, "q_b" -> -1.0)
    val (out, skipped) = Bench.runRetimes(results, Vector("q_b", "q_a"),
      times, wallCapSec = 100.0, clock = () => 0.0)
    assert(skipped === 0)
    assert(out === Vector(
      "q_a" -> (1.5, 1.5),  // retime 1.5 < both run and floor
      "q_b" -> (3.0, 2.5),  // failed retime — untouched
      "q_c" -> (1.0, 1.0))) // never picked — untouched
  }

  test("runRetimes never loosens: a retime slower than the current values is ignored by min-fold") {
    val (out, _) = Bench.runRetimes(Vector("q_a" -> (1.0, 0.8)), Vector("q_a"),
      _ => 5.0, wallCapSec = 100.0, clock = () => 0.0)
    assert(out === Vector("q_a" -> (1.0, 0.8)))
  }

  test("runRetimes is HARD wall-capped: picks past the cap are skipped, worst-first order preserved") {
    // Fake clock: each executed retime "costs" 10s of wall. Cap 25s admits
    // the clock checks at t=0, 10, 20 and refuses at t=30 — so exactly 3 of
    // 5 worst-first picks execute; the 2 skipped keep adaptive-min values.
    var elapsed = 0.0
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = (1 to 5).map(i => s"q_$i" -> (4.0, 2.0)).toVector
    val picks = Vector("q_5", "q_4", "q_3", "q_2", "q_1") // worst ratio first
    val (out, skipped) = Bench.runRetimes(results, picks,
      time = { n => executed += n; elapsed += 10.0; 1.0 },
      wallCapSec = 25.0, clock = () => elapsed)
    assert(skipped === 2)
    assert(executed.toVector === Vector("q_5", "q_4", "q_3")) // worst first
    assert(out.toMap === Map(
      "q_5" -> (1.0, 1.0), "q_4" -> (1.0, 1.0), "q_3" -> (1.0, 1.0),
      "q_2" -> (4.0, 2.0), "q_1" -> (4.0, 2.0)))
  }

  test("runRetimes with a zero cap skips every pick and changes nothing") {
    val results = Vector("q_a" -> (2.0, 1.8))
    val (out, skipped) = Bench.runRetimes(results, Vector("q_a"),
      _ => fail("no retime may execute past the cap"), wallCapSec = 0.0,
      clock = () => 0.1)
    assert(skipped === 1 && out === results)
  }

  // -------------------------------------------------- renderChunkStamps

  test("renderChunkStamps emits one object per chunk with the shared trust threshold applied") {
    val json = Bench.renderChunkStamps(Seq(
      (0.1, Seq("q_a", "q_b")),   // quiet → trusted
      (0.9, Seq("q_c")),          // contended → untrusted
      (-1.0, Seq("q_d"))))        // unmeasured sentinel → NOT quiet
    assert(json ===
      """"chunks":[{"noise":0.100,"trusted":true,"queries":["q_a","q_b"]},""" +
      """{"noise":0.900,"trusted":false,"queries":["q_c"]},""" +
      """{"noise":-1.000,"trusted":false,"queries":["q_d"]}],""")
    // boundary: exactly at the threshold is still quiet
    assert(Bench.renderChunkStamps(Seq((Bench.NoiseTrustThreshold, Seq("q"))))
      .contains("\"trusted\":true"))
  }

  test("renderChunkStamps is empty for single-JVM runs (no chunk stamps)") {
    assert(Bench.renderChunkStamps(Nil) === "")
  }

  test("chunk stamps cannot shadow the run-value map for the object-matching regexes") {
    // Every "queries" inside a stamp is an ARRAY; the artifact parsers
    // match "queries"\s*:\s*\{ specifically. A stamp that rendered an
    // OBJECT here would silently truncate next round's floor load.
    val json = Bench.renderChunkStamps(Seq((0.1, Seq("q_a"))))
    assert("\"queries\"\\s*:\\s*\\{".r.findFirstIn(json).isEmpty)
    assert(json.contains("\"queries\":[\"q_a\"]"))
  }

  // ------------------------------------------ per-query quiet bits (r16)

  test("quietQueryBits stamps only queries with >=2 agreeing passes") {
    val bits = Bench.quietQueryBits(Map(
      "q_two_agree" -> Seq(1.00, 1.10),   // spread 0.10 <= 0.25 → quiet
      "q_two_spread" -> Seq(1.00, 1.40),  // spread 0.40 → not quiet
      "q_single" -> Seq(0.50),            // one pass — no bit, inherits chunk
      "q_three" -> Seq(2.0, 2.1, 2.2),    // spread 0.10 → quiet
      "q_none" -> Seq.empty))
    assert(bits === Set("q_two_agree", "q_three"))
  }

  test("quietQueryBits boundary: spread exactly at the threshold is quiet") {
    val bits = Bench.quietQueryBits(Map("q" -> Seq(1.0, 1.0 + Bench.NoiseTrustThreshold)))
    assert(bits === Set("q"))
    assert(Bench.quietQueryBits(
      Map("q" -> Seq(1.0, 1.0 + Bench.NoiseTrustThreshold + 0.01))) === Set.empty)
  }

  test("shortLine carries quiet_n additively; every pre-existing field is intact") {
    val line = Bench.shortLine(total = 12.345, failed = 0, noise = 0.1,
      trusted = true, quietN = 283, mode = "adaptive-min-retime-chunked-4",
      sfDir = "/root/testdata/sf0.1")
    // The driver's tail parser reads these by key — all present, unchanged.
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"value\":12.345"))
    assert(line.contains("\"failed\":0"))
    assert(line.contains("\"noise\":0.100"))
    assert(line.contains("\"trusted\":true"))
    assert(line.contains("\"mode\":\"adaptive-min-retime-chunked-4\""))
    assert(line.contains("\"sf\":\"/root/testdata/sf0.1\""))
    // The r17 addition: quiet-bit coverage, readable off the short line.
    assert(line.contains("\"quiet_n\":283"))
  }

  // ------------------------------------ trusted-window hunter ranking

  test("passRank prefers fewer contended chunks, then lower sentinel spread; unmeasured noise ranks last") {
    def pass(noise: Double, chunkNoises: Double*) = Bench.ChunkPass(
      Vector.empty, Vector.empty, noise,
      chunkNoises.map(cn => (cn, Seq("q"))), Nil)
    val quiet = pass(0.2, 0.1, 0.2)          // 0 contended
    val half = pass(0.9, 0.1, 0.9)           // 1 contended
    val hot = pass(1.2, 1.1, 1.2)            // 2 contended
    val unmeasured = pass(-1.0, -1.0, -1.0)  // sentinel never measured
    assert(quiet.untrustedChunks === 0)
    assert(half.untrustedChunks === 1)
    assert(unmeasured.untrustedChunks === 2) // unmeasured ≠ quiet
    val ranked = Seq(hot, unmeasured, quiet, half).sortBy(Bench.passRank)
    assert(ranked.head === quiet && ranked(1) === half)
    // both have 2 contended chunks; the measured-but-hot one still beats
    // the never-measured sentinel
    assert(ranked(2) === hot && ranked(3) === unmeasured)
  }

  test("passRank ranks a quiet pass WITH failed queries below a quiet clean pass (advisor r15)") {
    def pass(runs: Vector[(String, Double)], noise: Double) = Bench.ChunkPass(
      runs, Vector.empty, noise, Seq((noise, runs.map(_._1))), Nil)
    val clean = pass(Vector("q_a" -> 1.0, "q_b" -> 2.0), noise = 0.2)
    val failedQuiet = pass(Vector("q_a" -> 1.0, "q_b" -> -1.0), noise = 0.1)
    assert(clean.failedCount === 0 && failedQuiet.failedCount === 1)
    // failedQuiet has LOWER noise, but a -1.0 run value would be published
    assert(Ordering[(Int, Int, Double)].lt(
      Bench.passRank(clean), Bench.passRank(failedQuiet)))
  }

  // ------------------------------------- chunk layout (r14 verdict #7)

  test("no memoized prefix family straddles a chunk boundary at the default n=4") {
    // The chunked parent sorts the declared keys and cuts them into 4
    // contiguous chunks (Bench.runChunked). Build-once memos (the IVF
    // index behind q_ann_*, the BPE/unigram trained models, the dup-span
    // frames) are per-JVM: a family split across chunks re-pays its build
    // in two child JVMs. The sorted layout keeps each prefix family
    // adjacent; this pins that a future rename doesn't silently split one.
    val names = SparkEntry.queries.keys.toVector.sorted
    val per = math.max(1, math.ceil(names.size.toDouble / 4).toInt)
    val chunkOf = names.grouped(per).toVector.zipWithIndex
      .flatMap { case (c, i) => c.map(_ -> i) }.toMap
    val families = Seq("q_ann_", "q_bpe_", "q_unigram_", "q_minhash_", "q_dup_")
    families.foreach { p =>
      val owners = names.filter(_.startsWith(p)).map(chunkOf).distinct
      assert(owners.nonEmpty, s"memo family $p has no queries — rename?")
      assert(owners.size === 1,
        s"memo family $p straddles chunks $owners — its build-once memo " +
          "would be paid once per child JVM")
    }
  }
}
