package graft.tools

/** Point `java.io.tmpdir` at a RAM-backed tmpfs when one exists.
  *
  * Everything the engine parks under the tmp dir is rebuild-on-miss
  * scratch — streaming checkpoints/WALs, stream-source staging, the
  * build-once IVF index, localCheckpoint spill — and the streaming
  * queries are LATENCY-bound by per-micro-batch fsyncs of tiny state
  * files: on a disk-backed /tmp each batch pays real storage round-trips
  * for data whose loss costs nothing (the drills rebuild from source).
  * /dev/shm is the standard Linux tmpfs mount; when present and writable
  * the whole scratch tier moves to RAM. Must run BEFORE the SparkSession
  * is created (Spark snapshots java.io.tmpdir for its local dirs).
  * No-op — and harmless — anywhere without a writable /dev/shm.
  *
  * Two containment rules (round-13, after the advisor flagged the naive
  * free-space check):
  *  - tmpfs pages count against the CGROUP memory limit, not just the
  *    mount size, so the headroom check is bounded by
  *    min(mount free, cgroup limit − cgroup usage − unallocated heap):
  *    a container with a roomy /dev/shm but a tight memory.max must NOT
  *    switch, or a large-SF spill ENOSPC/OOMs mid-run with no fallback.
  *  - Shuffle spill / block-manager local dirs STAY ON DISK
  *    (`spark.local.dir` is pinned to the original tmpdir): spill volume
  *    scales with the data, while the latency-sensitive scratch that
  *    earns the tmpfs (checkpoint WALs, staging, the IVF index) is
  *    small and bounded. */
object FastTmp {

  private def readLong(p: String): Option[Long] =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8").trim
      if (s == "max") None else s.toLongOption
    } catch { case _: Throwable => None }

  /** Bytes of memory the cgroup can still grow by before hitting its
    * limit, minus the heap the JVM may still claim (-Xmx not yet
    * resident). Long.MaxValue when unlimited / not a cgroup. Reads v2
    * (`memory.max`) first, then v1; v1 reports "unlimited" as a huge
    * number rather than "max", hence the 2^60 cut. */
  private def cgroupHeadroom(): Long = {
    val limit = readLong("/sys/fs/cgroup/memory.max")
      .orElse(readLong("/sys/fs/cgroup/memory/memory.limit_in_bytes")
        .filter(_ < (1L << 60)))
    limit match {
      case None => Long.MaxValue
      case Some(l) =>
        val used = readLong("/sys/fs/cgroup/memory.current")
          .orElse(readLong("/sys/fs/cgroup/memory/memory.usage_in_bytes"))
          .getOrElse(0L)
        val rt = Runtime.getRuntime
        val unallocatedHeap = math.max(0L, rt.maxMemory - rt.totalMemory)
        l - used - unallocatedHeap
    }
  }

  def prefer(): Unit = {
    if (sys.env.contains("GRAFT_NO_FASTTMP")) return // operational escape hatch
    val shm = new java.io.File("/dev/shm")
    if (!shm.isDirectory || !shm.canWrite) return
    // Containers often mount a 64 MB /dev/shm — checkpoints + staging would
    // ENOSPC there; only switch when the tmpfs has real headroom BOTH on
    // the mount and inside the cgroup memory budget.
    val minBytes = 8L << 30
    if (math.min(shm.getUsableSpace, cgroupHeadroom()) < minBytes) return
    val origTmp = sys.props("java.io.tmpdir")
    val d = new java.io.File(shm, "graft_tmp")
    if (d.isDirectory || d.mkdirs()) {
      System.setProperty("java.io.tmpdir", d.getAbsolutePath)
      // Spill stays on disk: Spark reads spark.local.dir (falling back to
      // java.io.tmpdir) for shuffle/block-manager scratch, and that's the
      // piece whose volume scales with data size. Respect an explicit
      // operator setting if one exists.
      if (!sys.props.contains("spark.local.dir"))
        System.setProperty("spark.local.dir", origTmp)
    }
  }
}
