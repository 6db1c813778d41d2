package graft

import org.apache.spark.sql.SparkSession

/** GraftExtensions needs its own session (extensions bind at build time). */
class ExtensionsSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("custom expressions usable from SQL via SparkSessionExtensions") {
    // clear actives so the builder creates a FRESH session (over whatever
    // SparkContext exists) and actually applies the extensions — getOrCreate
    // would otherwise return the shared TestSpark session and ignore them
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val jw = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw")
        .head().getDouble(0)
      assert(math.abs(jw - 0.9611111111111111) < 1e-9)
      val dot = spark.sql(
        "SELECT sorted_vec_dot(array(1L, 5L), array(0.6D, 0.8D), array(1L, 5L), array(0.6D, 0.8D)) AS d")
        .head().getDouble(0)
      assert(math.abs(dot - 1.0) < 1e-12)
      val sh = spark.sql("SELECT simhash64(array(xxhash64('a'), xxhash64('b'))) AS s")
        .head().getLong(0)
      assert(sh != 0L)
      val mb = spark.sql("SELECT size(minhash_bands(array(1L,2L,3L), 32, 16, 42L)) AS n")
        .head().getInt(0)
      assert(mb == 16)
      val hp = spark.sql("SELECT hyperplane_sig(array(0.1D, -0.2D, 0.3D), 8, 42L) AS h")
        .head().getLong(0)
      assert(hp >= 0L && hp < 256L)
    } finally {
      // do NOT stop(): that would kill the JVM-wide SparkContext shared with
      // the other suites; just detach this session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
