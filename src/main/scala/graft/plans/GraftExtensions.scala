package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the library's native expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) …")` works anywhere the DataFrame
  * wrappers do.
  *
  * Two entry points, same registrations:
  *   - `GraftExtensions` for `spark.sql.extensions` / `withExtensions`
  *     (session-build-time injection — the library-deployment path),
  *   - `GraftFunctions.register(spark)` for an already-running session
  *     (tests, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(getClass.getName, null, name, usage, "")

  /** (name, info, builder) triples shared by both registration paths. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine expects 2 arguments")
        CosineSimilarity(args(0), args(1))
      }),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(tokens, n) - distinct hashed word n-grams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "shingle_hashes expects 2 arguments")
        ShingleHashes(args(0), intLiteral(args(1), "shingle_hashes n"))
      }),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(hashes, k) - aggregate: k-family minhash signature"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig expects 2 arguments")
        MinHashAgg(args(0), intLiteral(args(1), "minhash_sig k")).toAggregateExpression()
      }),
    ("kmin_set",
      info("kmin_set", "kmin_set(hashes, k) - aggregate: k smallest distinct int64 values, ascending"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmin_set expects 2 arguments")
        KMinSetAgg(args(0), intLiteral(args(1), "kmin_set k")).toAggregateExpression()
      }),
    ("simhash_sig",
      info("simhash_sig", "simhash_sig(hashes) - aggregate: 64-bit simhash of token hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash_sig expects 1 argument")
        SimHashAgg(args(0)).toAggregateExpression()
      }),
  )

  private def intLiteral(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  /** Register on a live session (idempotent — re-registration overwrites). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
