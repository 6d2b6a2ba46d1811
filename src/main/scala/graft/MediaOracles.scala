package graft

/** DuckDB oracle SQL for the multimodal byte-kernel queries
  * (q_image_phash / q_image_neardup / q_scene_cuts / q_multimodal_audio).
  *
  * The declared media tables attach the document TEXT as the binary
  * payload (Multimodal.attachMedia), so every payload rides the
  * deterministic byte-sample tier of the kernels — plain byte arithmetic,
  * which SQL can restate by hex-encoding the UTF-8 payload
  * (`hex(encode(text))`) and parsing 2-char slices back to byte values:
  *  - dHash byte-sample: 72 evenly spaced byte offsets o_i = i·(n−1)/71,
  *    bit b set iff sample[gy·9+gx] > sample[gy·9+gx+1];
  *  - frame/window slicing is substring arithmetic on the hex image;
  *  - audio RMS: per 256-byte window, sqrt(mean((byte−128)²)) rounded 4.
  * The real-decoder tiers (BMP/WAV) never trigger on these corpora — no
  * document text carries the magic headers — and if one ever did, the
  * Spark side would fork from the oracle and the verify gate would fail
  * loudly rather than silently. */
object MediaOracles {
  /** (media_id, hx = hex of the UTF-8 payload, n = payload bytes). */
  private val payCte =
    "pay AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS media_id, " +
      "hex(encode(text)) AS hx, CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents)"

  /** Byte value at 0-based offset `o` of hex image `hx`. */
  private def byteAt(hx: String, o: String): String =
    s"CAST(concat('0x', substr($hx, 2 * ($o) + 1, 2)) AS INT)"

  /** The 72 dHash byte samples of payload (hx, n): o_i = i·(n−1)/71. */
  private def sampleArr(hx: String, n: String): String =
    s"list_transform(range(0, 72), i -> CASE WHEN $n <= 0 THEN 0 ELSE " +
      byteAt(hx, s"CAST((i * ($n - 1)) // 71 AS INT)") + " END)"

  /** 64-bit dHash from a 72-sample array column: bit b (gy = b/8, gx = b%8)
    * set iff s[gy·9+gx] > s[gy·9+gx+1] (1-indexed in SQL). */
  private def sigExpr(s: String): String =
    (0 until 64).map { b =>
      val i1 = (b / 8) * 9 + (b % 8) + 1
      s"(CASE WHEN $s[$i1] > $s[${i1 + 1}] THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("(", " + ", ")")

  /** q_image_phash: per-payload dHash + decode-mode tag. */
  def imagePhash: String =
    s"WITH $payCte, " +
      s"smp AS (SELECT media_id, ${sampleArr("hx", "n")} AS s FROM pay) " +
      s"SELECT media_id, ${sigExpr("s")} AS phash, 'byte-sample' AS decode_mode " +
      "FROM smp ORDER BY media_id"

  /** q_image_neardup: base corpus + the 50-payload 1-byte-perturbed panel
    * (first byte := 'x' = 0x78, ids +10M), chunk-blocked Hamming pairs
    * (8×8-bit chunks, radius ≤ 7 — the hamming64Pairs rule; DISTINCT
    * replaces its per-row first-collision filter). */
  def imageNearDup: String =
    s"WITH $payCte, " +
      "pan AS (SELECT media_id + 10000000 AS media_id, '78' || substr(hx, 3) AS hx, n " +
      "FROM pay WHERE media_id < 50), " +
      "allp AS (SELECT * FROM pay UNION ALL SELECT * FROM pan), " +
      s"smp AS (SELECT media_id, ${sampleArr("hx", "n")} AS s FROM allp), " +
      s"sg AS MATERIALIZED (SELECT media_id AS id, ${sigExpr("s")} AS sig FROM smp), " +
      "ch AS (SELECT id, sig, u.ci AS ci, (sig >> (CAST(u.ci AS INT) * 8)) & 255 AS chunk " +
      "FROM sg, unnest(range(0, 8)) u(ci)), " +
      "pp AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b, " +
      "CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS dist " +
      "FROM ch a JOIN ch b ON a.ci = b.ci AND a.chunk = b.chunk AND a.id < b.id) " +
      "SELECT id_a, id_b, dist FROM pp WHERE dist <= 7 ORDER BY id_a, id_b"

  /** q_scene_cuts: 48-byte frames, per-frame dHash, a cut = Hamming > 20
    * between consecutive frames of a media id. */
  def sceneCuts: String =
    s"WITH $payCte, " +
      "fr AS (SELECT media_id, CAST(u.fi AS INT) AS frame_idx, " +
      "substr(hx, CAST(u.fi AS INT) * 96 + 1, 96) AS fhx, " +
      "CAST(least(n - u.fi * 48, 48) AS BIGINT) AS fn " +
      "FROM pay, unnest(range(0, greatest(CAST(ceil(CAST(n AS DOUBLE) / 48) AS BIGINT), 1))) u(fi)), " +
      s"smp AS (SELECT media_id, frame_idx, ${sampleArr("fhx", "fn")} AS s FROM fr), " +
      s"hs AS (SELECT media_id, frame_idx, ${sigExpr("s")} AS h FROM smp), " +
      "dd AS (SELECT media_id, frame_idx, " +
      "bit_count(xor(h, lag(h) OVER (PARTITION BY media_id ORDER BY frame_idx))) AS dist FROM hs) " +
      "SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames, " +
      "CAST(sum(CASE WHEN dist > 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts, " +
      "CAST(min(CASE WHEN dist > 20 THEN frame_idx END) AS BIGINT) AS first_cut " +
      "FROM dd GROUP BY media_id ORDER BY media_id"

  /** q_multimodal_audio: 256-byte windows (u8 PCM stub path), RMS of the
    * centered samples, round-4. */
  def multimodalAudio: String =
    s"WITH $payCte, " +
      "w AS (SELECT media_id, hx, CAST(u.wi AS INT) AS window_idx, " +
      "CAST(u.wi AS INT) * 256 AS off, CAST(least(n - u.wi * 256, 256) AS INT) AS wn " +
      "FROM pay, unnest(range(0, CAST(ceil(CAST(n AS DOUBLE) / 256) AS BIGINT))) u(wi)), " +
      "b AS (SELECT media_id, window_idx, wn, " +
      "list_sum(list_transform(range(0, wn), j -> " +
      s"(${byteAt("hx", "off + CAST(j AS INT)")} - 128.0) * (${byteAt("hx", "off + CAST(j AS INT)")} - 128.0))) AS s " +
      "FROM w) " +
      "SELECT media_id, window_idx, round(sqrt(s / greatest(wn, 1)), 4) AS rms " +
      "FROM b ORDER BY media_id, window_idx LIMIT 500"
}
