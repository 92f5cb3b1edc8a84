package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword (WordPiece-style) tokenization kernel —
  * the round-7 capability VERDICT r6 ranked first: every
  * token-denominated curation operator (pipeline_pack, text_tokens,
  * text_slice_chunks) counts WHITESPACE tokens, while a real LLM data
  * pipeline budgets packing, mixture and context windows in SUBWORD
  * tokens (Wu et al. 2016's WordPiece; Devlin et al. 2019's ## prefix
  * convention).
  *
  * Algorithm (the standard WordPiece inference rule): per word, repeat
  * { take the LONGEST vocab piece that prefixes the remaining suffix —
  * word-initial pieces from [[WordPieceUtil.InitPieces]], continuation
  * pieces (emitted with a "##" prefix) from
  * [[WordPieceUtil.ContPieces]] }; if no piece matches, the WHOLE word
  * becomes the single token [UNK]. The vocab is a fixed deterministic
  * literal (single-letter + digit fallback pieces guarantee progress on
  * any lowercase-alnum word, so [UNK] fires only on genuinely
  * out-of-alphabet input) — a production deployment swaps in a learned
  * vocab file; the ALGORITHM is identical.
  *
  * Oracle expressibility: greedy longest-match is pure position
  * arithmetic over a shared literal list — DuckDB replays it verbatim
  * as a recursive CTE with `list_filter(vocab, p -> starts_with(rem,
  * p))[1]` over the SAME longest-first list (TextOps.duckSubword*), so
  * text_subword / pipeline_pack_subword are full hash-compare entries.
  *
  * Kernel form for the same reason as ShingleUtil: the declarative
  * fold (`aggregate(sequence(...), struct-state, vocab-filter lambda)`)
  * runs on Catalyst's interpreted HOF path — ~60 lambda invocations per
  * character; this is one tight JVM loop behind a single static call,
  * inside whole-stage codegen.
  */
object WordPieceUtil {

  /** Word-initial pieces: frequent whole words + common onsets.
    * MUST stay sorted longest-first (ties lexicographic) — the scan
    * takes the first prefix match and the DuckDB oracle replays the
    * same list in the same order. */
  val InitPieces: Seq[String] = (Seq(
    "the", "data", "join", "hash", "scan", "sort", "line", "part",
    "fast", "slow", "agg", "key", "big", "row", "dup", "cust", "col",
    "fil", "bat", "str", "win", "vec", "mer", "val", "tab", "or",
    "gr", "qu", "sp", "sm") ++
    ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString))
    .sortBy(p => (-p.length, p))

  /** Continuation pieces (matched against the remaining suffix WITHOUT
    * the "##", emitted WITH it). Same ordering contract. */
  val ContPieces: Seq[String] = (Seq(
    "omer", "umn", "ter", "ch", "eam", "dow", "tor", "ge", "der",
    "ue", "le", "oup", "ery", "ark", "all") ++
    ('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString))
    .sortBy(p => (-p.length, p))

  val Unk = "[UNK]"

  private val initU = InitPieces.map(UTF8String.fromString).toArray
  private val contU = ContPieces.map(UTF8String.fromString).toArray
  private val contEmit =
    ContPieces.map(p => UTF8String.fromString("##" + p)).toArray
  private val unkU = UTF8String.fromString(Unk)

  /** Reference implementation on plain strings — the brute-force model
    * PropertySpec compares the kernel against. */
  def tokenizeRef(word: String): Seq[String] = {
    var rem = word
    var first = true
    val out = Seq.newBuilder[String]
    while (rem.nonEmpty) {
      val vocab = if (first) InitPieces else ContPieces
      vocab.find(rem.startsWith) match {
        case None => return Seq(Unk)
        case Some(p) =>
          out += (if (first) p else "##" + p)
          rem = rem.substring(p.length)
      }
      first = false
    }
    out.result()
  }

  def tokenize(word: UTF8String): ArrayData = {
    var rem = word
    var first = true
    val out = new java.util.ArrayList[AnyRef](4)
    while (rem.numChars() > 0) {
      val vocab = if (first) initU else contU
      var i = 0
      var found = -1
      while (found < 0 && i < vocab.length) {
        if (rem.startsWith(vocab(i))) found = i
        i += 1
      }
      if (found < 0)
        return new GenericArrayData(Array[Any](unkU))
      out.add(if (first) initU(found) else contEmit(found))
      rem = rem.substring(vocab(found).numChars(), rem.numChars())
      first = false
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** Codegen'd wrapper: word_piece(word) → array<string> of subword
  * pieces (single [UNK] when the word is untokenizable). */
case class WordPieceTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_piece requires string, got $t")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_piece"

  override protected def nullSafeEval(input: Any): Any =
    WordPieceUtil.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordPieceUtil.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): WordPieceTokens =
    copy(child = newChild)
}

object SubwordExprs {
  /** word_piece(word): greedy longest-match WordPiece tokenization over
    * the fixed [[WordPieceUtil]] vocab (see its scaladoc). */
  def wordPiece(c: Column): Column =
    GraftBridge.column(WordPieceTokens(GraftBridge.expression(c)))
}
