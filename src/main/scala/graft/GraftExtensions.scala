package graft

import graft.functions.{HtmlStrip, Keccak256Expr, NfcNormalize, NgramHashes, NgramShingles, PgArrayParse, SimhashExpr, VecDot, WinnowFingerprints, ZOrderKey}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SparkSessionExtensions installer: registers graft's custom Catalyst
 * expressions in the SQL function registry so `spark.sql` users can call
 * them directly:
 *
 *   spark.sql("SELECT keccak256(payload), pg_array_parse(tags) FROM t")
 *
 * Enable with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")` or inject
 * into an existing session via [[GraftExtensions.register]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {
  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private val keccakDesc: FunctionDescription = (
    FunctionIdentifier("keccak256"),
    new ExpressionInfo(classOf[Keccak256Expr].getName, "keccak256"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "keccak256 expects 1 argument")
      Keccak256Expr(args.head)
    })

  private val pgArrayDesc: FunctionDescription = (
    FunctionIdentifier("pg_array_parse"),
    new ExpressionInfo(classOf[PgArrayParse].getName, "pg_array_parse"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "pg_array_parse expects 1 argument")
      PgArrayParse(args.head)
    })

  private val vecDotDesc: FunctionDescription = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "vec_dot expects 2 arguments")
      VecDot(args(0), args(1))
    })

  private val winnowDesc: FunctionDescription = (
    FunctionIdentifier("winnow_fingerprints"),
    new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "winnow_fingerprints expects 1 argument (text)")
      WinnowFingerprints(args.head, k = 8, w = 8)
    })

  /** One-arg expression helper. */
  private def unary(name: String, cls: Class[_],
                    build: Expression => Expression): FunctionDescription = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 1, s"$name expects 1 argument")
      build(args.head)
    })

  /** (expr, literal-int) expression helper (e.g. `ngram_hashes(text, 8)`). */
  private def unaryWithInt(name: String, cls: Class[_],
                           build: (Expression, Int) => Expression): FunctionDescription = (
    FunctionIdentifier(name),
    new ExpressionInfo(cls.getName, name),
    (args: Seq[Expression]) => {
      require(args.length == 2, s"$name expects 2 arguments (expr, INT literal)")
      val n = args(1) match {
        case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"$name: second argument must be an INT literal, got $other")
      }
      build(args.head, n)
    })

  private def all: Seq[FunctionDescription] = Seq(
    keccakDesc, pgArrayDesc, vecDotDesc, winnowDesc,
    unary("html_strip", classOf[HtmlStrip], HtmlStrip(_)),
    unary("nfc_normalize", classOf[NfcNormalize], NfcNormalize(_)),
    unary("simhash64", classOf[SimhashExpr], SimhashExpr(_)),
    unaryWithInt("ngram_hashes", classOf[NgramHashes], NgramHashes(_, _)),
    unaryWithInt("ngram_shingles", classOf[NgramShingles], NgramShingles(_, _)),
    (FunctionIdentifier("zorder_key"),
      new ExpressionInfo(classOf[ZOrderKey].getName, "zorder_key"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "zorder_key expects 2 arguments")
        ZOrderKey(args(0), args(1))
      }))

  /** Register into an already-running session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    for ((id, info, builder) <- all)
      registry.registerFunction(id, info, builder)
  }
}
