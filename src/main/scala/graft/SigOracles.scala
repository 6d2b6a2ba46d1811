package graft

/** DuckDB oracle SQL for the signature-sketch queries (q_simhash_sig /
  * q_simhash_pairs / q_minhash_pairs), expressible since the declared
  * queries moved to engine-portable md5-60 hashes (Dedup.md5Hash60 — the
  * md5ShingleHashes discipline applied to signatures):
  *  - a MinHash signature is 128 affine-permutation minima mod P = 2³¹−1
  *    over the gram hashes (`list_min` over `list_transform`, exact in
  *    64-bit arithmetic — a·x+b < 2⁶²); the a/b coefficients come from
  *    [[functions.MinHashSignature.coefficients]], the SAME seed-derived
  *    constants the Spark kernel uses;
  *  - a SimHash signature is a per-bit sign-sum over the same hashes;
  *  - banding/chunk-blocking are plain equality joins on signature slices.
  * Nothing data-dependent is inlined — DuckDB re-derives every hash,
  * signature, candidate pair, and verdict from the parquet text. */
object SigOracles {
  private val P = functions.MinHashSignature.P

  /** md5-60 hash of a string expression — mirrors Dedup.md5Hash60. */
  private def h60(s: String): String =
    s"CAST(concat('0x', substr(md5($s), 1, 15)) AS BIGINT)"

  /** q_simhash_sig: per doc, the 64-bit sign-sum signature over md5-60
    * token hashes. Bits 60..63 of a 60-bit hash are always 0, so their
    * sign-sums are −n and the signature needs only bits 0..59. */
  def simhashSig: String = {
    val bits = (0 until 60).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    "WITH d AS (SELECT doc_id, list_transform(string_split_regex(text, '\\s+'), t -> " +
      h60("t") + ") AS hs FROM documents) " +
      s"SELECT doc_id, $bits AS sig FROM d ORDER BY doc_id"
  }

  /** Shared signature CTE for the pair query: (id, sig). */
  private def simhashSigCte: String = {
    val bits = (0 until 60).map { j =>
      s"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0 " +
        s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
    "sg AS MATERIALIZED (SELECT id, " + bits + " AS sig FROM " +
      "(SELECT doc_id AS id, list_transform(string_split_regex(text, '\\s+'), t -> " +
      h60("t") + ") AS hs FROM documents) d)"
  }

  /** q_simhash_pairs: chunk-blocked Hamming pairs (4×16-bit chunks) over
    * the portable signatures — a pair surfaces iff some chunk matches
    * exactly (the hamming64Pairs rule; DISTINCT replaces its per-row
    * first-collision filter), top-20 by (dist, id_a, id_b). */
  def simhashPairs: String =
    "WITH " + simhashSigCte + ", " +
      "ch AS (SELECT id, sig, u.ci AS ci, (sig >> (CAST(u.ci AS INT) * 16)) & 65535 AS chunk " +
      "FROM sg, unnest(range(0, 4)) u(ci)), " +
      "pp AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, " +
      "CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS dist " +
      "FROM ch a JOIN ch b ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id) " +
      "SELECT id_a, id_b, dist FROM pp ORDER BY dist, id_a, id_b LIMIT 20"

  /** q_minhash_pairs: the full portable MinHash/LSH path — distinct
    * 3-token grams (wordGrams' short-text clamp), md5-60 hashes, the
    * 128-permutation signature, 32 bands of 4 keyed by the raw slice,
    * exact-Jaccard verify at the threshold. */
  def minhashPairs(threshold: Double, numHashes: Int = 128,
                   bands: Int = 32): String = {
    val rows = numHashes / bands
    val (as, bs) = functions.MinHashSignature.coefficients(numHashes, 42L)
    val mins = (0 until numHashes).map { j =>
      s"list_min(list_transform(hx, x -> (${as(j)} * x + ${bs(j)}) % $P))"
    }.mkString("[", ", ", "]")
    "WITH d AS (SELECT doc_id AS id, string_split_regex(text, '\\s+') AS toks FROM documents), " +
      "g AS (SELECT id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')] " +
      "ELSE list_distinct(list_transform(range(1, len(toks) - 1), i -> array_to_string(list_slice(toks, i, i + 2), ' '))) END AS grams FROM d), " +
      s"sh AS MATERIALIZED (SELECT id, list_transform(grams, gg -> ${h60("gg")}) AS sh FROM g WHERE len(grams) > 0), " +
      // hashes are 60-bit non-negative, so x = h % P needs no sign fix
      s"hx AS MATERIALIZED (SELECT id, list_transform(sh, h -> h % $P) AS hx FROM sh), " +
      s"sig AS MATERIALIZED (SELECT id, $mins AS sig FROM hx), " +
      s"bnd AS (SELECT id, u.b AS band, list_slice(sig, CAST(u.b AS INT) * $rows + 1, CAST(u.b AS INT) * $rows + $rows) AS key " +
      s"FROM sig, unnest(range(0, $bands)) u(b)), " +
      "cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bnd a " +
      "JOIN bnd b ON a.band = b.band AND a.key = b.key AND a.id < b.id) " +
      "SELECT id_a, id_b, jaccard FROM (SELECT c.id_a, c.id_b, " +
      "round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard " +
      "FROM cand c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id) t " +
      s"WHERE jaccard >= $threshold ORDER BY id_a, id_b"
  }
}
