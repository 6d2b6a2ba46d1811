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
  * No-op — and harmless — anywhere without a writable /dev/shm. */
object FastTmp {
  def prefer(): Unit = {
    if (sys.env.contains("GRAFT_NO_FASTTMP")) return // operational escape hatch
    val shm = new java.io.File("/dev/shm")
    // Containers often mount a 64 MB /dev/shm — checkpoints + spill would
    // ENOSPC there; only switch when the tmpfs has real headroom.
    val minBytes = 8L << 30
    if (shm.isDirectory && shm.canWrite && shm.getUsableSpace >= minBytes) {
      val d = new java.io.File(shm, "graft_tmp")
      if (d.isDirectory || d.mkdirs())
        System.setProperty("java.io.tmpdir", d.getAbsolutePath)
    }
  }
}
