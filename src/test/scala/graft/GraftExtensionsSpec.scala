package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the native kernels: registered functions must agree
  * with their Column-API counterparts. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = { GraftFunctions.register(TestSpark.spark); TestSpark.spark }
  import spark.implicits._

  test("jaro_winkler / jaro / deflate_ratio via SQL match the Column/driver API") {
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX")).toDF("a", "b")
    df.createOrReplaceTempView("ge_jw")
    val got = spark.sql(
      "SELECT jaro_winkler(a, b), jaro(a, b), deflate_ratio(a) FROM ge_jw ORDER BY a")
      .as[(Double, Double, Double)].collect()
    val want = Seq("DIXON" -> "DICKSONX", "MARTHA" -> "MARHTA").map { case (a, b) =>
      (graft.functions.JaroWinkler.compute(a, b, winkler = true),
        graft.functions.JaroWinkler.compute(a, b, winkler = false),
        graft.functions.DeflateRatio.compute(
          org.apache.spark.unsafe.types.UTF8String.fromString(a)))
    }
    assert(got.toSeq == want)
  }

  test("dot_product via SQL == ArrayKernels.dot") {
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    df.createOrReplaceTempView("ge_v")
    assert(spark.sql("SELECT dot_product(a, b) FROM ge_v").as[Double].head() == 11.0)
  }

  test("shingle_hashes + minhash_signature + simhash via SQL match Column API") {
    val df = Seq(Tuple1("the quick brown fox jumps over the lazy dog")).toDF("text")
    df.createOrReplaceTempView("ge_docs")
    val sql = spark.sql(
      """SELECT minhash_signature(shingle_hashes(split(text, '\\s+'), 3), 16, 42) AS mh,
        |       simhash(split(text, '\\s+')) AS sh,
        |       lsh_band_hashes(minhash_signature(shingle_hashes(split(text, '\\s+'), 3), 16, 42), 4, 4) AS bands
        |FROM ge_docs""".stripMargin).collect()(0)
    val api = df.select(
      graft.functions.ArrayKernels.minhash(
        graft.functions.ArrayKernels.shingleHashes(split(col("text"), "\\s+"), 3), 16, 42L).as("mh"),
      graft.functions.ArrayKernels.simhash(split(col("text"), "\\s+")).as("sh"),
      graft.functions.ArrayKernels.lshBandHashes(
        graft.functions.ArrayKernels.minhash(
          graft.functions.ArrayKernels.shingleHashes(split(col("text"), "\\s+"), 3), 16, 42L),
        4, 4).as("bands")).collect()(0)
    assert(sql.getSeq[Long](0) == api.getSeq[Long](0))
    assert(sql.getLong(1) == api.getLong(1))
    assert(sql.getSeq[Long](2) == api.getSeq[Long](2))
  }

  test("default arguments: shingle_hashes(toks) == k=3 distinct, minhash defaults 128/42") {
    val df = Seq(Tuple1("a b c d e f")).toDF("text")
    df.createOrReplaceTempView("ge_defaults")
    val r = spark.sql(
      """SELECT shingle_hashes(split(text, '\\s+')) AS s3,
        |       size(minhash_signature(shingle_hashes(split(text, '\\s+')))) AS n
        |FROM ge_defaults""".stripMargin).collect()(0)
    val expected = df.select(
      graft.functions.ArrayKernels.shingleHashes(split(col("text"), "\\s+"), 3))
      .collect()(0).getSeq[Long](0)
    assert(r.getSeq[Long](0) == expected)
    assert(r.getInt(1) == 128)
  }

  test("GraftExtensions.apply registers every descriptor into a FunctionRegistry") {
    // getOrCreate would hand back the shared session (where register()
    // already ran), making an end-to-end assertion vacuous — so exercise the
    // injection mechanism directly: apply the extension, then check each
    // function builder works against a fresh registry-driven lookup.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    // And every descriptor's builder constructs a working expression:
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
    val arr = Literal.create(Array(1.0, 2.0), ArrayType(DoubleType))
    val dot = GraftFunctions.descriptors.find(_._1 == "dot_product").get._3(Seq(arr, arr))
    assert(dot.eval(null) == 5.0)
    val hashes = Literal.create(Array(1L, 2L), ArrayType(LongType))
    val mh = GraftFunctions.descriptors.find(_._1 == "minhash_signature").get._3(Seq(hashes))
    assert(mh.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() == 128)
  }

  test("sign_bands via SQL matches the Column API kernel") {
    val df = Seq(Tuple1(Array(0.5, -1.2, 3.3, 0.07))).toDF("v")
    df.createOrReplaceTempView("ge_vec")
    val sql = spark.sql("SELECT sign_bands(v, 4, 3, 4) AS s FROM ge_vec")
      .collect()(0).getSeq[Long](0)
    val api = df.select(
        graft.functions.ArrayKernels.signBands(col("v"), 4, 3, 4).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(sql == api && sql.length == 4)
  }

  test("hashed_tf via SQL matches the Column API kernel") {
    val df = Seq(Tuple1("spark rows spark fast fast fast")).toDF("text")
    df.createOrReplaceTempView("ge_tf")
    val sql = spark.sql("SELECT hashed_tf(text, 16) AS v FROM ge_tf")
      .collect()(0).getSeq[Double](0)
    val api = df.select(
        graft.functions.ArrayKernels.hashedTf(col("text"), 16).as("v"))
      .collect()(0).getSeq[Double](0)
    assert(sql == api && sql.length == 16 && sql.sum == 6.0)
  }

  test("dhash64 / dhash_mode via SQL match the Column API kernels") {
    val df = Seq(Tuple1("some opaque payload bytes")).toDF("text")
      .select(col("text").cast("binary").as("media"))
    df.createOrReplaceTempView("ge_media")
    val sql = spark.sql("SELECT dhash64(media) AS h, dhash_mode(media) AS m FROM ge_media")
      .collect()(0)
    val api = df.select(
      graft.functions.ImageKernels.dhash64(col("media")).as("h"),
      graft.functions.ImageKernels.dhashMode(col("media")).as("m")).collect()(0)
    assert(sql.getLong(0) == api.getLong(0))
    assert(sql.getString(1) == "byte-sample" && api.getString(1) == "byte-sample")
  }

  test("lang_id / stopword_hits / winnow_mins via SQL match the Column API") {
    val df = Seq(Tuple1("the cat sat on the mat and the dog")).toDF("text")
    df.createOrReplaceTempView("ge_text")
    val sql = spark.sql(
      """SELECT lang_id(split(text, '\\s+')) AS lid,
        |       stopword_hits(split(text, '\\s+')) AS hits,
        |       winnow_mins(shingle_hashes(split(text, '\\s+'), 3, false), 4) AS fp
        |FROM ge_text""".stripMargin).collect()(0)
    val api = df.select(
      graft.llm.TextStats.langId(col("text")).as("lid"),
      graft.llm.TextStats.stopwordCount(col("text")).as("hits"),
      graft.llm.TextStats.fingerprint(col("text")).as("fp")).collect()(0)
    assert(sql.getString(0) == api.getString(0))
    assert(sql.getInt(1) == api.getInt(1))
    assert(sql.getSeq[Long](2) == api.getSeq[Long](2))
  }
}
