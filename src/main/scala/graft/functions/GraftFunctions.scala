package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration of graft's native Catalyst expressions (SURVEY §2.9
  * tier c wiring): `simhash64`, `minhash_signature`, `cosine_sim`, and
  * `shingle_jaccard` become callable from plain `spark.sql(...)` — the
  * DataFrame `Column` entry points and the SQL surface share the SAME
  * expression classes, so plans, codegen, and results are identical on
  * both paths.
  *
  * Production wiring: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) at session build. For an
  * already-running session, `GraftFunctions.register(spark)` injects the
  * same builders through the extension mechanism
  * ([[org.apache.spark.sql.graftshim.Shim.applyExtensions]]).
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal, got $other")
  }

  private def info(cls: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(cls.getName, null, name)

  /** The injectable (identifier, info, builder) triples. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info(classOf[SimHash], "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"simhash64 takes 1 argument, got ${args.length}")
        SimHash(args.head)
      }),
    (FunctionIdentifier("minhash_signature"),
      info(classOf[MinHashSignature], "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"minhash_signature takes 3 arguments, got ${args.length}")
        MinHashSignature(args.head,
          intArg(args(1), "minhash_signature", 1), intArg(args(2), "minhash_signature", 2))
      }),
    (FunctionIdentifier("cosine_sim"),
      info(classOf[CosineSimilarity], "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim takes 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args(1))
      }),
    (FunctionIdentifier("shingle_jaccard"),
      info(classOf[ShingleJaccard], "shingle_jaccard"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"shingle_jaccard takes 3 arguments, got ${args.length}")
        ShingleJaccard(args.head, args(1), intArg(args(2), "shingle_jaccard", 2))
      }),
    (FunctionIdentifier("shingle_array"),
      info(classOf[ShingleArray], "shingle_array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"shingle_array takes 2 arguments, got ${args.length}")
        ShingleArray(args.head, intArg(args(1), "shingle_array", 1))
      }),
    (FunctionIdentifier("shingle_overlap"),
      info(classOf[ShingleOverlap], "shingle_overlap"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"shingle_overlap takes 3 arguments, got ${args.length}")
        ShingleOverlap(args.head, args(1), intArg(args(2), "shingle_overlap", 2))
      }),
    (FunctionIdentifier("image_dims"),
      info(classOf[ImageDims], "image_dims"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"image_dims takes 1 argument, got ${args.length}")
        ImageDims(args.head)
      }),
    (FunctionIdentifier("audio_meta"),
      info(classOf[AudioMeta], "audio_meta"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"audio_meta takes 1 argument, got ${args.length}")
        AudioMeta(args.head)
      }),
    (FunctionIdentifier("video_meta"),
      info(classOf[VideoMeta], "video_meta"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"video_meta takes 1 argument, got ${args.length}")
        VideoMeta(args.head)
      }),
    (FunctionIdentifier("repetition_stats"),
      info(classOf[RepetitionStats], "repetition_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"repetition_stats takes 2 arguments, got ${args.length}")
        RepetitionStats(args.head, intArg(args(1), "repetition_stats", 1))
      }),
    (FunctionIdentifier("jwt_sign"),
      info(classOf[JwtSign], "jwt_sign"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"jwt_sign takes 2 arguments, got ${args.length}")
        JwtSign(args.head, args(1))
      }),
    (FunctionIdentifier("jwt_verify"),
      info(classOf[JwtVerify], "jwt_verify"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"jwt_verify takes 2 arguments, got ${args.length}")
        JwtVerify(args.head, args(1))
      }),
    (FunctionIdentifier("bpe_encode"),
      info(classOf[BpeEncode], "bpe_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"bpe_encode takes 2 arguments, got ${args.length}")
        BpeEncode(args.head, args(1))
      }),
    (FunctionIdentifier("pq_encode"),
      info(classOf[PqEncode], "pq_encode"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"pq_encode takes 3 arguments, got ${args.length}")
        PqEncode(args.head, args(1), intArg(args(2), "pq_encode", 2))
      }),
    (FunctionIdentifier("pq_adc"),
      info(classOf[PqAdc], "pq_adc"),
      (args: Seq[Expression]) => {
        require(args.length == 4, s"pq_adc takes 4 arguments, got ${args.length}")
        PqAdc(args.head, args(1), args(2), intArg(args(3), "pq_adc", 3))
      }))

  /** Register all functions into a LIVE session through the same
    * extension mechanism production uses at session build.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftshim.Shim.applyExtensions(spark, new GraftExtensions)
}

/** The `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
