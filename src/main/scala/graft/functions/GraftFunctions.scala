package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT graft_deflate_size(text) ...")` works exactly
  * like the Column API — the kernels become first-class SQL functions
  * (codegen'd, analyzable, pushdown-safe), usable from any SQL-only
  * surface (thrift server, notebooks, saved views).
  *
  * Two entry points, same builders:
  *  - [[GraftFunctions.register]] — attach to an existing session's
  *    function registry (temp functions, session-scoped);
  *  - [[GraftSparkExtensions]] — the `spark.sql.extensions` /
  *    `Builder.withExtensions` path for cluster-wide installation at
  *    session build time (the SparkSessionExtensions contract).
  */
object GraftFunctions {

  private def requireArity(name: String, es: Seq[Expression],
                           n: Int): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${es.length}")

  private def intLit(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name: expected an INTEGER literal, got $other")
  }

  /** (name, usage, builder) for every exposed kernel. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_deflate_size",
      "graft_deflate_size(str_or_bin) - DEFLATE-compressed byte count " +
        "(the compression-ratio quality signal's numerator)",
      es => { requireArity("graft_deflate_size", es, 1); DeflateSize(es.head) }),
    ("graft_dot",
      "graft_dot(array<double>, array<double>) - dense dot product " +
        "(bit-identical to the HOF fold)",
      es => { requireArity("graft_dot", es, 2); DotProduct(es(0), es(1)) }),
    ("graft_minhash",
      "graft_minhash(array<long> hashes, int numHashes) - one-pass " +
        "rotate-XOR MinHash signature over pre-hashed shingles",
      es => {
        requireArity("graft_minhash", es, 2)
        MinhashSig(es.head, intLit("graft_minhash", es(1)))
      }),
    ("graft_simhash",
      "graft_simhash(array<long> hashes) - one-pass 64-bit SimHash " +
        "fingerprint over pre-hashed features",
      es => { requireArity("graft_simhash", es, 1); SimhashFp(es.head) }),
    ("graft_gpt2_token_count",
      "graft_gpt2_token_count(str) - byte-level merge-rank BPE token " +
        "count (GPT-2 discipline) against the loaded merges fixture",
      es => {
        requireArity("graft_gpt2_token_count", es, 1); Gpt2TokenCount(es.head)
      }),
    ("graft_subword_token_count",
      "graft_subword_token_count(array<string> words, bool pretrained) " +
        "- greedy longest-match subword count over normalized words",
      es => {
        requireArity("graft_subword_token_count", es, 2)
        SubwordCount(es.head, es(1) match {
          case Literal(b: Boolean, _) => b
          case other => throw new IllegalArgumentException(
            s"graft_subword_token_count: expected a BOOLEAN literal, got $other")
        })
      }),
    ("graft_wordpiece_token_count",
      "graft_wordpiece_token_count(array<string> words) - WordPiece " +
        "count (## continuations, whole-word [UNK]) over normalized words",
      es => {
        requireArity("graft_wordpiece_token_count", es, 1)
        WordPieceCount(es.head)
      }),
    ("graft_unigram_token_count",
      "graft_unigram_token_count(array<string> words) - Viterbi " +
        "unigram-LM count (integer costs, fewest-token ties) over " +
        "normalized words",
      es => {
        requireArity("graft_unigram_token_count", es, 1)
        UnigramTokenCount(es.head)
      }),
    ("graft_char_trigrams",
      "graft_char_trigrams(str) - sliding 3-code-point windows (the " +
        "language-ID feature pass), one O(len) native scan",
      es => {
        requireArity("graft_char_trigrams", es, 1); CharTrigrams(es.head)
      }))

  /** Register every kernel on an existing session (temp functions). */
  def register(spark: SparkSession): Unit = all.foreach {
    case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
  }
}

/** `spark.sql.extensions=graft.functions.GraftSparkExtensions` (or
  * `Builder.withExtensions(new GraftSparkExtensions)`) installs the
  * kernel functions at session build time. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, _, builder) =>
      // 2-arg ExpressionInfo(className, name) — the 3-arg form's middle
      // argument is the DATABASE, not the usage string
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
}
