package graft

import graft.functions.{HyperplaneBands, RollingHash, SketchAggs, SortedIntersectSize, VecDot, WordNgrams}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions registration (SURVEY.md §2.8): exposes the
  * native graft expressions to the SQL surface, so `spark.sql` users
  * get the same codegen'd operators as the DataFrame API:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or: spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions.intArg

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.GroupTopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteTopK)

    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => WordNgrams(args(0), intArg(args(1), "n"))))

    ext.injectFunction((
      new FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))))

    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (args: Seq[Expression]) => RollingHash(args(0))))

    ext.injectFunction((
      new FunctionIdentifier("hyperplane_bands"),
      new ExpressionInfo(classOf[HyperplaneBands].getName, "hyperplane_bands"),
      (args: Seq[Expression]) => HyperplaneBands(args(0),
        intArg(args(1), "bands"), intArg(args(2), "rowsPerBand"))))

    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[SketchAggs.MinHashAgg].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        SketchAggs.MinHashAgg(args(0), intArg(args(1), "perms")).toAggregateExpression()))

    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SketchAggs.SimHashAgg].getName, "simhash64"),
      (args: Seq[Expression]) =>
        SketchAggs.SimHashAgg(args(0), args(1)).toAggregateExpression()))
  }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Imperative registration for an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg: FunctionRegistry = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      args => VecDot(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("word_ngrams",
      args => WordNgrams(args(0), intArg(args(1), "n")), "built-in")
    reg.createOrReplaceTempFunction("sorted_intersect_size",
      args => SortedIntersectSize(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("rolling_hash",
      args => RollingHash(args(0)), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_bands",
      args => HyperplaneBands(args(0),
        intArg(args(1), "bands"), intArg(args(2), "rowsPerBand")), "built-in")
    reg.createOrReplaceTempFunction("minhash_sig",
      args => SketchAggs.MinHashAgg(args(0), intArg(args(1), "perms"))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      args => SketchAggs.SimHashAgg(args(0), args(1)).toAggregateExpression(), "built-in")
  }
}
