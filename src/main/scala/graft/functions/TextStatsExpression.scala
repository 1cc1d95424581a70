package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document text statistics in ONE scan of the string.
  *
  * The composed formulation ([[graft.operators.TextAnalysis]]) builds the
  * token arrays once but still runs ~8 higher-order `filter`/`size` columns
  * over them — array HOFs are CodegenFallback, so each is an interpreted
  * per-row pass with boxed lambdas, and the BPE-ish count re-splits with a
  * lookaround regex that backtracks at every character. This kernel
  * computes every count in two tight char loops (one over the original
  * text for the fingerprint, one over the lowered text for everything
  * else), with marker-word lookup through one interned token→lang-bitmask
  * map. Children are `(text, lower(text))` — the lowering stays Spark's
  * own `Lower` expression, so case mapping is bit-identical to the
  * composed column and the DuckDB oracle.
  *
  * Counting semantics (pinned bit-for-bit by TextAnalysisSpec):
  *  - tokens: java-regex `\s+` split semantics, empties dropped — a token
  *    is a maximal run of chars outside [ \t\n\x0B\f\r];
  *  - punct: occurrences of [.,;:!?] (case-unaffected, counted on lowered);
  *  - marker counts: tokens of the lowered text found in each language's
  *    marker list, multiplicity kept; `stop` counts membership in the
  *    union ONCE per occurrence;
  *  - bpe: pieces of `split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])")`
  *    that are neither "" nor " " — equivalently every maximal alnum run
  *    plus every non-alnum char other than a space;
  *  - fp: [[PolyHash]] of the ORIGINAL (case-sensitive) text.
  */
case class TextStatsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = TextStatsExpr.schema
  override def nullSafeEval(orig: Any, low: Any): Any =
    TextStatsExpr.compute(orig.asInstanceOf[UTF8String], low.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (o, l) => s"graft.functions.TextStatsExpr.compute($o, $l)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TextStatsExpr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "text_stats"
}

object TextStatsExpr {
  /** Marker stopwords per language — the single source of truth for the
    * language-ID heuristic (TextAnalysis.langMarkers aliases this).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "que", "y", "es"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  private val nLangs = langMarkers.size

  /** token → bitmask of the languages whose marker list contains it. */
  private val markerBits: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langMarkers.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        m.merge(w, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }

  val schema: StructType = StructType(
    StructField("n_tokens", IntegerType, nullable = false) +:
    StructField("punct", IntegerType, nullable = false) +:
    StructField("stop", IntegerType, nullable = false) +:
    langMarkers.map { case (lang, _) =>
      StructField(s"c_$lang", IntegerType, nullable = false)
    } :+
    StructField("bpe", IntegerType, nullable = false) :+
    StructField("fp", LongType, nullable = false))

  private def isWs(c: Char): Boolean = // java-regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  def compute(orig: UTF8String, low: UTF8String): InternalRow = {
    // pass 1 — ORIGINAL text (what the composed columns measure counts
    // on): fingerprint, token count, punct count, bpe piece count
    val os = orig.toString
    val olen = os.length
    var fp = 0L
    var nTok, punct, bpe = 0
    var inAlnum = false
    var inTok = false
    var i = 0
    while (i < olen) {
      val c = os.charAt(i)
      fp = (fp * 31 + c) % PolyHash.P
      c match {
        case '.' | ',' | ';' | ':' | '!' | '?' => punct += 1
        case _ => ()
      }
      if (isAlnum(c)) { if (!inAlnum) bpe += 1; inAlnum = true }
      else { inAlnum = false; if (c != ' ') bpe += 1 }
      if (isWs(c)) inTok = false
      else { if (!inTok) nTok += 1; inTok = true }
      i += 1
    }

    // pass 2 — LOWERED text (Spark's own Lower child): marker counts
    val s = low.toString
    val len = s.length
    var stop = 0
    val langCounts = new Array[Int](nLangs)
    var tokStart = -1
    i = 0
    while (i <= len) {
      if (i == len || isWs(s.charAt(i))) {
        if (tokStart >= 0) {
          val bits = markerBits.get(s.substring(tokStart, i))
          if (bits != null) {
            stop += 1
            var b = 0
            while (b < nLangs) {
              if ((bits.intValue() & (1 << b)) != 0) langCounts(b) += 1
              b += 1
            }
          }
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }

    val out = new Array[Any](3 + nLangs + 2)
    out(0) = nTok
    out(1) = punct
    out(2) = stop
    var b = 0
    while (b < nLangs) { out(3 + b) = langCounts(b); b += 1 }
    out(3 + nLangs) = bpe
    out(4 + nLangs) = fp
    new GenericInternalRow(out)
  }
}
