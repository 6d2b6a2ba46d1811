package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: sorted-neighborhood candidate
  * generation and Fellegi–Sunter match scoring.
  *
  * The reference tool's dedup story stops at exact row identity (ClickHouse
  * `DISTINCT` over staged CSV — reference/server/server.js:560-610 relies on
  * the target table's ORDER BY to collapse repeats). A training-data pipeline
  * ingesting the same flat files needs the messier version: the SAME entity
  * arriving twice with a typo'd name. This module supplies the two classic
  * scalable stages on top of the existing [[graft.functions.StringKernels]]
  * Jaro–Winkler kernel and [[graft.llm.Dedup.connectedComponents]] closure:
  *
  *  - '''Sorted-neighborhood blocking''' (Hernández & Stolfo, SIGMOD '95):
  *    sort each block on a linkage key and only compare records within a
  *    sliding window of w. Candidates are O(n·w) instead of the O(n²)
  *    all-pairs join — the difference between feasible and not at 100 TB.
  *    Formulated declaratively as ONE window exchange on the block key plus
  *    w−1 `lead()` columns: no self-join, no global sort. Block keys must
  *    have cardinality that grows with the data (here: market segment for
  *    the demo corpus; a real deployment blocks on zip/phone-prefix/etc.).
  *    Records in different blocks are never compared — the standard
  *    recall/cost trade every blocking scheme makes explicit.
  *
  *  - '''Fellegi–Sunter scoring''' (JASA '69): per-field agreement tests
  *    combine into a log-likelihood-style match weight; thresholds cut the
  *    score into match / possible / non-match bands. Weights here are
  *    pinned integer deci-units (e.g. name agreement = +20 = 2.0) so the
  *    sum is exact integer arithmetic — bit-identical across engines and
  *    accumulation orders, the same determinism discipline as the EMA and
  *    centroid queries. Scoring is a per-row projection over the candidate
  *    pairs: embarrassingly parallel, no exchange at all.
  *
  * Closure of the match edges into entity ids reuses
  * [[graft.llm.Dedup.connectedComponents]] (union–find under 1M edges,
  * pointer-jumping above), so the whole pipeline is: one window exchange →
  * codegen'd JW scoring → bounded closure.
  */
object Linkage {

  /** Synthetic "dirty" customer roster: the clean TPC-H customers plus a
    * planted duplicate for every 10th key — same entity, name with the last
    * character dropped (a trailing-char typo keeps the duplicate adjacent
    * to its original in name order, the property sorted-neighborhood
    * blocking exploits). Duplicate ids live at +1,000,000 so originals and
    * dups are distinguishable. Balance band and nation carry over
    * unchanged: the duplicate is the same person re-keyed, which is what
    * gives Fellegi–Sunter its multi-field agreement signal. Expressed with
    * engine-portable functions only (substring/length/floor) so the DuckDB
    * oracle states the identical roster.
    */
  def dirtyCustomers(customer: DataFrame): DataFrame = {
    val base = customer.select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("bigint").as("bal_band"))
    val dups = customer
      .filter(col("c_custkey") % 10 === 0)
      .select(
        (col("c_custkey") + 1000000L).as("id"),
        substring(col("c_name"), 1, 17).as("name"), // names are 18 chars; drop the tail
        col("c_nationkey").as("nation"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000).cast("bigint").as("bal_band"))
    base.unionAll(dups)
  }

  /** Sorted-neighborhood candidate pairs: within each block, sort by
    * (sortCol, idCol) and pair every record with its next `window − 1`
    * neighbors. Output columns: every requested carry column suffixed
    * `_a` / `_b` for the two sides, plus `dist` (neighbor offset, 1-based).
    *
    * One hash exchange on the block key; `lead(k)` over the block window
    * materializes the neighbors without a self-join; `posexplode` flattens
    * the w−1 leads; null leads (block tails) drop. The plan is
    * Exchange → Sort → Window → Project — candidate count is exactly
    * Σ_blocks max(0, |block|·(w−1) − (w−1)·w/2).
    */
  def sortedNeighborhoodPairs(records: DataFrame, blockCol: String,
                              sortCol: String, idCol: String,
                              carry: Seq[String], window: Int): DataFrame = {
    require(window >= 2, s"window must pair at least adjacent records: $window")
    val cols = (idCol +: carry).distinct
    val w = Window.partitionBy(blockCol).orderBy(col(sortCol), col(idCol))
    val rec = struct(cols.map(col): _*)
    val leads = array((1 until window).map(k => lead(rec, k).over(w)): _*)
    records
      .select(cols.map(c => col(c).as(s"${c}_a")) :+ leads.as("nbrs"): _*)
      .select(cols.map(c => col(s"${c}_a")) :+
        posexplode(col("nbrs")).as(Seq("pos", "nbr")): _*)
      .filter(col("nbr").isNotNull)
      .select(cols.map(c => col(s"${c}_a")) ++
        cols.map(c => col(s"nbr.$c").as(s"${c}_b")) :+
        (col("pos") + 1).cast("int").as("dist"): _*)
  }

  /** Fellegi–Sunter deci-weights for the dirty-customer demo. Agreement on
    * a field adds the first element, disagreement adds the second (both in
    * tenths, so the score stays integral until the final /10). Name
    * agreement = Jaro–Winkler ≥ 0.985 — strictly between a trailing-char
    * typo of an 18-char name (0.98889) and a single mid-digit substitution
    * (0.97778), so "same name modulo typo" and "different but adjacent key"
    * land on opposite sides by construction. */
  val NameWeights: (Int, Int) = (20, -15)
  val NationWeights: (Int, Int) = (15, -10)
  val BandWeights: (Int, Int) = (10, -8)
  val NameAgreeThreshold = 0.985
  val MatchCut = 30 // score_x10 ≥ 30 → match (needs name + nation agreement)
  val PossibleCut = 5 // score_x10 in [5, 30) → possible

  // ---- Phonetic-blocking tier (round 9) ---------------------------------

  /** Name pools for the phonetic-blocking roster. `LastsVariant(i)` is a
    * same-first-letter near-variant of `Lasts(i)` whose SOUNDEX DIFFERS
    * (one coded consonant substituted for a different code class) —
    * LinkageSpec property-locks `soundex(Lasts(i)) != soundex(LastsVariant(i))`
    * for every i, the precondition for the family-c "phonetic blocker
    * provably misses, sorted-neighborhood catches" planting below. */
  val Firsts: Seq[String] = Seq(
    "Alice", "Bruno", "Clara", "David", "Elena", "Felix", "Grace", "Henry",
    "Irene", "James", "Karen", "Louis", "Maria", "Nadia", "Oscar", "Paula",
    "Quinn", "Rosa", "Simon", "Tara")
  val Lasts: Seq[String] = Seq(
    "Smith", "Johnson", "Meyer", "Peterson", "Schmidt", "Garcia", "Mueller",
    "Thompson", "Martinez", "Anderson", "Taylor", "Thomas", "Moore",
    "Martin", "Jackson", "White", "Harris", "Clark", "Lewis", "Walker",
    "Hall", "Young", "Allen", "King", "Wright")
  val LastsVariant: Seq[String] = Seq(
    "Smitz", "Johnsor", "Meyek", "Pererson", "Schmirt", "Garlia", "Muecker",
    "Thomgson", "Marlinez", "Anberson", "Tayxor", "Thogas", "Moose",
    "Marvin", "Jackton", "Whipe", "Haggis", "Clamk", "Lewit", "Wasker",
    "Habb", "Yousg", "Abben", "Kirg", "Wrilht")

  /** Synthetic NAMED roster for the phonetic-blocking tier: every customer
    * gets a unique person-style name `First Last ######` (pools above, tag
    * = zero-padded custkey — uniqueness keeps the pair-adjacency analysis
    * deterministic), and every 10th key plants a duplicate at +1,000,000 in
    * one of THREE corruption families chosen by `(key div 10) % 3`:
    *
    *  - family 0 — SEGMENT SHIFT: name identical, `segment` reversed (an
    *    entity re-arriving with a changed blocking attribute). Lands in a
    *    block no real record occupies, so segment-blocked
    *    sorted-neighborhood can NEVER pair it; the phonetic key ignores
    *    segment and pairs it deterministically (identical name → adjacent
    *    in its soundex block).
    *  - family 1 — TAG TYPO: last character of the name dropped (the
    *    dirtyCustomers corruption). Sort-adjacent to its original AND
    *    phonetically identical — both blockers catch it.
    *  - family 2 — SOUNDEX-BREAKING LAST NAME: `LastsVariant` swap. The
    *    phonetic key moves to a different block (different soundex by
    *    construction), so the phonetic blocker provably misses it;
    *    sorted-neighborhood still sees it a handful of name-sort positions
    *    from its original.
    *
    * Union-blocker evaluation (q_er_eval_blockers) therefore has a
    * ground-truth structure where the union STRICTLY dominates either
    * blocker alone — family 0 is invisible to sorted-neighborhood, family
    * 2 invisible to phonetic — which is the textbook argument for running
    * multiple blocking passes. Everything is engine-portable (array
    * literals, div/mod, lpad, reverse, substring) so the DuckDB oracle
    * states the identical roster. */
  def namedRoster(customer: DataFrame): DataFrame = {
    val f = array(Firsts.map(lit): _*)
    val l = array(Lasts.map(lit): _*)
    val v = array(LastsVariant.map(lit): _*)
    def nameOf(lastPool: Column): Column = concat(
      element_at(f, pmod(col("c_custkey"), lit(20)).cast("int") + 1), lit(" "),
      element_at(lastPool,
        pmod(expr("c_custkey div 20"), lit(25)).cast("int") + 1), lit(" "),
      lpad(col("c_custkey").cast("string"), 6, "0"))
    def shaped(id: Column, name: Column, segment: Column): DataFrame =
      customer.select(id.as("id"), name.as("name"),
        col("c_nationkey").as("nation"), segment.as("segment"),
        floor(col("c_acctbal") / 1000).cast("bigint").as("bal_band"))
    val dupId = (col("c_custkey") + 1000000L).as("id")
    def fam(n: Int) = col("c_custkey") % 10 === 0 &&
      pmod(expr("c_custkey div 10"), lit(3)) === n
    val base = shaped(col("c_custkey"), nameOf(l), col("c_mktsegment"))
    val dup0 = shaped(dupId, nameOf(l), reverse(col("c_mktsegment")))
      .where(fam(0))
    val dup1 = shaped(dupId,
      nameOf(l).substr(lit(1), length(nameOf(l)) - 1),
      col("c_mktsegment")).where(fam(1))
    val dup2 = shaped(dupId, nameOf(v), col("c_mktsegment")).where(fam(2))
    base.unionAll(dup0).unionAll(dup1).unionAll(dup2)
  }

  /** Phonetic block key: `first-name|soundex(last-name)` — the soundex runs
    * on the LAST name only (a full-name soundex saturates on the first
    * name's consonants and would lump every "Alice S…" together), while the
    * first name rides along verbatim to keep block sizes bounded. */
  def phoneticKey(name: Column): Column = concat(
    element_at(split(name, " "), 1), lit("|"),
    graft.functions.StringKernels.soundex(element_at(split(name, " "), 2)))

  /** Score sorted-neighborhood candidates: integer deci-unit field weights
    * summed into `score`, banded into match / possible / non_match. Expects
    * the `_a`/`_b` columns [[sortedNeighborhoodPairs]] emits for
    * name/nation/bal_band. Pure per-row projection — the JW kernel is
    * codegen'd, the weight sum is integer CASE arithmetic. */
  def fellegiSunterScore(pairs: DataFrame): DataFrame = {
    val jw = round(
      graft.functions.StringKernels.jaroWinkler(col("name_a"), col("name_b")), 5)
    def w(agree: Column, weights: (Int, Int)): Column =
      when(agree, lit(weights._1)).otherwise(lit(weights._2))
    val score10 =
      w(jw >= NameAgreeThreshold, NameWeights) +
        w(col("nation_a") === col("nation_b"), NationWeights) +
        w(col("bal_band_a") === col("bal_band_b"), BandWeights)
    pairs.select(
      col("id_a"), col("id_b"), jw.as("jw"),
      (score10.cast("double") / 10.0).as("score"),
      when(score10 >= MatchCut, lit("match"))
        .when(score10 >= PossibleCut, lit("possible"))
        .otherwise(lit("non_match")).as("band"))
  }
}
