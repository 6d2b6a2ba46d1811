package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-8o tier (incremental IVF index append).
  * Pins the freshness contract: appended vectors are findable through the
  * same partition-pruned probe path as the head, every reported similarity
  * matches a plain-Scala cosine, the centroid table is untouched by the
  * append, and the `_APPENDED` marker makes the build+append idempotent
  * across repeated query invocations.
  */
class Round8oQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private lazy val vecs: Map[Long, Array[Double]] =
    new graft.engine.Catalog(spark, sf).embeddings
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(x => x.getLong(0) -> x.getSeq[Double](1).toArray).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q_ann_ivf_incremental: appended vectors findable; sims exact; idempotent") {
    val run1 = SparkEntry.queries("q_ann_ivf_incremental")(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getBoolean(3)))
    // idempotency: the marker must keep a second invocation from re-appending
    val run2 = SparkEntry.queries("q_ann_ivf_incremental")(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getBoolean(3)))
    assert(run1.toSeq === run2.toSeq)

    val byQ = run1.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 400L, 440L))
    byQ.foreach { case (qid, hits) =>
      assert(hits.length === 5, s"qid $qid")
      // self is always in its own probed cluster → sim 1.0 present
      assert(hits.exists(h => h._2 == qid && h._3 == 1.0), s"qid $qid self")
      // every reported similarity is the true cosine (4-decimal snap)
      hits.foreach { case (_, nid, sim, flag) =>
        val expect = math.rint(cos(vecs(qid), vecs(nid)) * 1e4) / 1e4
        assert(math.abs(sim - expect) < 1e-9, s"$qid->$nid")
        assert(flag === (nid >= 400L), s"$qid->$nid flag")
      }
    }
    // the appended queries DID come back through the appended partition rows
    assert(byQ(400L).exists(_._4) && byQ(440L).exists(_._4))

    // index layout: centroid table still the original 8 rows; appended ids
    // landed inside existing cluster partitions (no new cluster appeared)
    val path = run1.headOption.map(_ => // same scratch rule as the query
      s"${sys.props("java.io.tmpdir")}/graft_ivf_inc_" +
        java.security.MessageDigest.getInstance("MD5")
          .digest(sf.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString +
        s"_${spark.sparkContext.applicationId}").get
    val cents = spark.read.parquet(s"$path/centroids")
    assert(cents.count() === 8L)
    val idx = spark.read.parquet(s"$path/vectors")
    import org.apache.spark.sql.functions._
    val clusters = idx.select("ivf_cluster").distinct().collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf((0 until 8).toSet))
    val appended = idx.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    assert(appended.count() === 50L)
  }
}
