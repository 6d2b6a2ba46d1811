package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-14 floor-ratchet fixes (advisor, round 13): the -1.0
  * failure sentinel must never poison the committed floors — not on LOAD
  * (a poisoned artifact's -1.0 entries are dropped, restoring the
  * "no floor → double-pass" behavior) and not on MERGE (a query that
  * failed THIS run keeps its committed floor instead of erasing it; a
  * crashed chunk child used to overwrite ~95 floors with -1.0 in one
  * write). */
class BenchFloorsSpec extends AnyFunSuite {

  private def writeTmp(json: String): String = {
    val p = java.nio.file.Files.createTempFile("graft_floors_spec_", ".json")
    java.nio.file.Files.write(p, json.getBytes("UTF-8"))
    p.toFile.deleteOnExit()
    p.toString
  }

  test("loadFloors drops -1.0 failure sentinels but keeps real floors") {
    val path = writeTmp(
      """{"metric":"total","mode":"adaptive-min","queries_min":{"q_ok":1.250,"q_crashed":-1.0,"q_also_ok":0.031},"sf":"/root/testdata/sf0.1"}""")
    val (floors, mode) = Bench.loadFloors(path, "/root/testdata/sf0.1")
    assert(floors === Map("q_ok" -> 1.25, "q_also_ok" -> 0.031))
    assert(mode === "adaptive-min")
  }

  test("loadFloors rejects an artifact whose sf differs from this run's") {
    val path = writeTmp(
      """{"mode":"adaptive-min","queries_min":{"q_ok":1.0},"sf":"/root/testdata/sf1"}""")
    val (floors, _) = Bench.loadFloors(path, "/root/testdata/sf0.1")
    assert(floors.isEmpty)
  }

  test("loadFloors parses a round-15 chunks-bearing parent artifact") {
    // The per-chunk trusted stamps render "queries":[…] ARRAYS before the
    // run-value map; the object-matching floor parser must not trip on
    // them (next round's floor load reads exactly this shape).
    val path = writeTmp(
      """{"metric":"total","mode":"adaptive-min-retime-chunked-2","chunks":[{"noise":0.100,"trusted":true,"queries":["q_ok"]},{"noise":0.900,"trusted":false,"queries":["q_also_ok"]}],"queries":{"q_ok":1.400,"q_also_ok":0.050},"queries_min":{"q_ok":1.250,"q_also_ok":0.031},"sf":"/root/testdata/sf0.1"}""")
    val (floors, mode) = Bench.loadFloors(path, "/root/testdata/sf0.1")
    assert(floors === Map("q_ok" -> 1.25, "q_also_ok" -> 0.031))
    assert(mode === "adaptive-min-retime-chunked-2")
  }

  test("mergeFloors ratchets down, keeps committed floor on failure, passes new queries through") {
    val ref = Map("q_a" -> 1.0, "q_b" -> 0.5)
    val measured = Vector(
      "q_a" -> 2.0,   // slower this run → keep committed 1.0
      "q_b" -> -1.0,  // FAILED this run → keep committed 0.5, not -1.0
      "q_c" -> 0.7,   // new query, no floor → its own measurement
      "q_d" -> -1.0)  // new query that failed → sentinel stays visible
    val merged = Bench.mergeFloors(measured, ref).toMap
    assert(merged === Map("q_a" -> 1.0, "q_b" -> 0.5, "q_c" -> 0.7, "q_d" -> -1.0))
    // and a faster measurement tightens the floor
    val tightened = Bench.mergeFloors(Vector("q_a" -> 0.8), ref).toMap
    assert(tightened === Map("q_a" -> 0.8))
  }
}
