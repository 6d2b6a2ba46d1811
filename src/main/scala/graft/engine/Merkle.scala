package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Merkle-tree reduction — the snapshot-equality primitive:
  * two copies of a 100 TB shard compare by exchanging ONE hash per key,
  * and a mismatch bisects down the tree in O(log n) round trips instead of
  * re-reading either copy (the reference's whole-table ingest verification
  * at server.js:530-735 re-reads; this doesn't).
  *
  * Reduction rule: positions (2i, 2i+1) pair to md5(left ∥ right); an odd
  * tail node carries up unchanged; levels above a completed root are
  * identity carries, so any depth ≥ ceil(log2(max group size)) yields the
  * identical root — depth is CAPACITY, not data-dependence, which is what
  * lets a fixed-depth SQL unroll (the q_merkle_root oracle) restate the
  * derived-depth Spark computation exactly.
  *
  * Scale shape: each level is one partial-aggregated groupBy over a frame
  * HALF the size of the last (total work ~2n regardless of depth), with a
  * localCheckpoint per level so the log-deep lineage never reaches the
  * planner — the connectedComponents economics. */
object Merkle {

  /** ceil(log2(n)) with a floor of 1 — the level count that guarantees a
    * single root for groups of up to n leaves. */
  def depthFor(maxGroupSize: Long): Int =
    math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxGroupSize - 1)))

  /** Merkle root per key over `leaves(keyCol, posCol, hashCol)` where pos
    * is the 0-based leaf index within its key and hash is a hex string.
    * Returns (keyCol, root).
    *
    * PRECONDITION — positions must be DENSE and UNIQUE per key (0..n−1
    * exactly once): a duplicate position is silently absorbed by the
    * pairing agg (max picks one hash), and a gap null-propagates through
    * concat/md5 into a null root. Neither failure raises on its own, so
    * corrupt leaf frames would produce a WRONG root, not an error. Leaves
    * built by [[leavesOf]] satisfy this by construction; hand-built frames
    * should pass `validate = true` (one extra count-vs-max aggregation
    * over the leaf frame — cheap relative to the reduction, but not free,
    * hence opt-in) to fail loudly instead. */
  def rootPerKey(leaves: DataFrame, keyCol: String, posCol: String,
                 hashCol: String, depth: Int,
                 validate: Boolean = false,
                 checkpointEvery: Int = 12,
                 blockBits: Int = 12): DataFrame = {
    if (validate) {
      val bad = leaves.groupBy(col(keyCol))
        .agg(count(lit(1)).as("n"), countDistinct(col(posCol)).as("nd"),
          max(col(posCol)).cast("long").as("mx"), min(col(posCol)).cast("long").as("mn"))
        .filter(col("nd") =!= col("n") || col("mx") =!= col("n") - 1 ||
          col("mn") =!= 0)
        .limit(1).collect()
      require(bad.isEmpty,
        s"Merkle.rootPerKey: leaf positions not dense-unique for key ${bad.headOption.map(_.get(0))} " +
          "(expected exactly 0..n-1 per key)")
    }
    // BLOCK FOLD for the first min(depth, blockBits) levels: the level-k
    // node at position p is a pure function of the leaves in
    // [p·2^k, (p+1)·2^k) — block-local — so one grouped collect+fold
    // (functions.MerkleFold, the identical pairing rule) replaces k
    // per-level exchange STAGES with one, bit-identical roots. Each level
    // is a whole shuffle stage of fixed latency, so at depth 13 this cuts
    // the reduction from 13 sequential stages to 2. Block arrays are
    // ≤ 2^blockBits entries (~130 KB at the default 12) — bounded
    // regardless of group size; the collect_list aggregate partial-
    // combines, so the shuffle carries the same leaf volume as a
    // per-level groupBy would.
    val bb = math.max(0, math.min(depth, blockBits))
    var lvl =
      if (bb == 0)
        leaves.select(col(keyCol), col(posCol).cast("long").as("pos"),
          col(hashCol).as("h"))
      else
        leaves.groupBy(col(keyCol),
            expr(s"CAST(`$posCol` AS BIGINT) DIV ${1L << bb}").as("pos"))
          .agg(collect_list(struct(col(posCol).cast("long").as("p"),
            col(hashCol).as("h"))).as("ph"))
          .select(col(keyCol), col("pos"),
            graft.functions.MerkleFold.blockRoot(col("ph")).as("h"))
    // Checkpoint every `checkpointEvery` levels, not every level: each
    // level is consumed exactly once (by the next), so the plan grows
    // LINEARLY with depth and intermediate checkpoints exist ONLY to keep
    // lineage depth bounded — and each eager checkpoint is a whole Spark
    // job of fixed latency. No forced checkpoint after the last level
    // either: the caller's own action computes the ≤checkpointEvery
    // trailing levels. Depth 15 with the default block width therefore
    // costs ZERO internal jobs (block stage + 3 levels, all in the
    // caller's action) — identical ~2n total work.
    for (i <- bb + 1 to depth) {
      lvl = lvl.groupBy(col(keyCol), expr("pos DIV 2").as("pos2"))
        .agg(max(when(col("pos") % 2 === 0, col("h"))).as("hl"),
          max(when(col("pos") % 2 === 1, col("h"))).as("hr"))
        .select(col(keyCol), col("pos2").as("pos"),
          when(col("hr").isNull, col("hl"))
            .otherwise(md5(concat(col("hl"), col("hr")))).as("h"))
      if ((i - bb) % math.max(1, checkpointEvery) == 0 && i < depth)
        lvl = lvl.localCheckpoint(eager = true)
    }
    lvl.select(col(keyCol), col("h").as("root"))
  }

  /** Scale-safe dense leaf numbering — pos = 0-based global rank of
    * `orderCol` within `keyCol`, WITHOUT the per-key single-partition
    * Window that would serialize a 100 TB stage through one reducer:
    * (1) one narrow per-key min/max aggregate over the order column's
    * long image pins deterministic, ORDER-PRESERVING integer range
    * buckets (width = ceil(span/buckets) by integer DIV — no sampling,
    * no multiply-overflow); (2) row_number runs under a hash exchange on
    * (key, bucket) — `buckets`-way parallel per key, the only
    * corpus-wide shuffle; (3) per-key bucket offsets are a running sum
    * over ≤`buckets` count rows, broadcast back. off + rn − 1 == the
    * global rank because the bucket is a monotone function of the order
    * key, so every value in bucket b sorts before every value in b+1 —
    * the q_surrogate_keys shape, promoted here so snapshot integrity
    * holds at any stage size. Positions are identical to the old
    * window formulation, so existing roots are unchanged.
    *
    * PRECONDITIONS: `orderCol` must be unique per key for deterministic
    * positions and either have a non-null long image (cast to long —
    * monotone for every numeric type) or come with an explicit `imageCol`;
    * key cardinality is snapshot-group scale (sources / stages / shards),
    * so the per-key (bucket, count) frames broadcast. Returns
    * (keyCol, pos, h).
    *
    * `materialize = false` skips the internal eager checkpoint — for
    * callers whose `df` is ALREADY materialized (a localCheckpointed
    * staged frame): the checkpoint exists only to keep expensive upstream
    * leaf hashing from re-running per consumer, and re-checkpointing an
    * already-narrow materialized frame just adds one whole Spark job of
    * fixed latency (the round-11 q_curation_pipeline regression).
    *
    * `imageCol`, when given, replaces `orderCol`'s cast-to-long as the
    * BUCKETING image. It must be non-null and monotone NON-DECREASING in
    * `orderCol`'s order but need NOT be injective — ranks come from
    * `orderCol` itself inside the (key, bucket) window, and a shared image
    * value lands its rows in one bucket, which shifts bucket SIZES, never
    * positions. This is what lets a composite order (a struct, or a key
    * wider than 64 bits) ride the bucketed rank: bucket on the leading
    * component, order by the full key. */
  def numberedLeaves(df: DataFrame, keyCol: String, orderCol: String,
                     hashCol: String, buckets: Int = 64,
                     materialize: Boolean = true,
                     imageCol: Option[Column] = None): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    // Materialized once (unless the caller already did): the narrow
    // (key, ord, hash) frame feeds THREE consumers (the range aggregate,
    // the bucket counts, and the final rank) — un-checkpointed, upstream
    // leaf hashing (md5 over text for leavesOf callers) would re-run per
    // consumer.
    val narrow = df.select(col(keyCol), col(orderCol).as("__ord"),
      imageCol.getOrElse(col(orderCol).cast("long")).as("__ok"),
      col(hashCol).as("h"))
    val base = if (materialize) narrow.localCheckpoint(eager = true) else narrow
    val rng = base.groupBy(col(keyCol))
      .agg(min("__ok").as("__mn"), max("__ok").as("__mx"))
    val kb = base.join(broadcast(rng), keyCol)
      .withColumn("__b", expr(
        s"CAST((__ok - __mn) DIV ((__mx - __mn + $buckets) DIV $buckets) AS INT)"))
    val offs = kb.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum("__cnt").over(
        W.partitionBy(keyCol).orderBy("__b")
          .rowsBetween(W.unboundedPreceding, -1)), lit(0L)))
      .select(col(keyCol), col("__b"), col("__off"))
    val wb = W.partitionBy(col(keyCol), col("__b")).orderBy("__ord")
    kb.withColumn("__rn", row_number().over(wb))
      .join(broadcast(offs), Seq(keyCol, "__b"))
      .select(col(keyCol), (col("__off") + col("__rn") - 1).as("pos"),
        col("h"))
  }

  /** Convenience: leaves from an ordered content column — position by the
    * bucketed global rank of `orderCol` within `keyCol` ([[numberedLeaves]]),
    * leaf hash = md5(content). */
  def leavesOf(df: DataFrame, keyCol: String, orderCol: String,
               contentCol: String): DataFrame =
    numberedLeaves(
      df.select(col(keyCol), col(orderCol),
        md5(col(contentCol).cast("string")).as("__mh")),
      keyCol, orderCol, "__mh")

  /** In-memory reference of the same reduction (spec/property mirror). */
  private[graft] def referenceRoot(leafHashes: Seq[String]): String = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    var lvl = leafHashes
    while (lvl.length > 1)
      lvl = lvl.grouped(2).map {
        case Seq(a, b) => md5hex(a + b)
        case Seq(a) => a
      }.toSeq
    lvl.head
  }
}
