package graft

class ExtensionsSpec extends GraftSuite {
  import spark.implicits._

  test("graft functions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT vec_dot(a, b) FROM vecs").as[Double].head() == 11.0)

    val grams = spark.sql(
      "SELECT word_ngrams(array('a','b','c'), 2)").as[Seq[String]].head()
    assert(grams == Seq("a b", "b c"))

    assert(spark.sql(
      "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d'))")
      .as[Long].head() == 2L)

    val sig = spark.sql(
      "SELECT minhash_sig(t, 16) FROM (SELECT explode(array('x','y')) AS t)")
      .as[Seq[Long]].head()
    assert(sig.length == 16 && sig.forall(_ != Long.MaxValue))

    // integer-literal weight: ImplicitCastInputTypes inserts the cast
    val sh = spark.sql(
      "SELECT simhash64(t, 1) FROM (SELECT explode(array('x','y')) AS t)")
      .as[Long].head()
    assert(sh != 0L)

    val bands = spark.sql(
      "SELECT hyperplane_bands(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 4, 8) ")
      .as[Seq[Long]].head()
    assert(bands.length == 4 && bands.forall(b => b >= 0 && b < 256))
  }

  test("extensions class wires into a fresh session builder") {
    // construct-only smoke: the class must be instantiable the way
    // spark.sql.extensions does it (no-arg constructor)
    val ext = classOf[GraftExtensions].getDeclaredConstructor().newInstance()
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
