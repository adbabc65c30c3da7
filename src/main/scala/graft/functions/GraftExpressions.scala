package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static, codegen-callable implementations. Keeping these as plain static
 * methods lets the expressions below participate in whole-stage codegen
 * (a single virtual-free call per row) instead of falling back to
 * interpreted eval — the parse stage sits in the crawl hot path
 * (SURVEY.md §2.8 U1).
 */
object ExprImpl {
  def extractText(html: UTF8String): UTF8String =
    if (html == null) null else UTF8String.fromString(TextExtract.extractText(html.toString))

  /** single-pass (text, outlinks) — the crawl hot path; byte-level scan, no
    * full-page String decode (see FastParse.parseBytes). */
  def extractParsedBin(html: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    if (html == null) return null
    val r = FastParse.parseBytes(html)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      if (r.text == null) null else UTF8String.fromString(r.text),
      new GenericArrayData(r.outlinks.map(UTF8String.fromString): Array[Any])))
  }

  def extractTextBin(html: Array[Byte]): UTF8String =
    if (html == null) null
    else UTF8String.fromString(TextExtract.extractText(new String(html, java.nio.charset.StandardCharsets.UTF_8)))

  private def toArr(xs: Seq[String]): ArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  def extractOutlinksBin(html: Array[Byte]): ArrayData =
    if (html == null) null
    else toArr(TextExtract.extractOutlinks(new String(html, java.nio.charset.StandardCharsets.UTF_8)))

  def extractTopics(html: UTF8String): ArrayData =
    if (html == null) null else toArr(TextExtract.extractTopics(html.toString))

  def extractAtUsers(html: UTF8String): ArrayData =
    if (html == null) null else toArr(TextExtract.extractAtUsers(html.toString))

  def stringToInt(s: UTF8String): Long =
    if (s == null) 0L else TextExtract.stringToInt(s.toString)

  def extractArticleUrl(html: UTF8String): UTF8String =
    if (html == null) null else UTF8String.fromString(TextExtract.extractArticleUrl(html.toString))

  def extractLocation(html: UTF8String): UTF8String =
    if (html == null) null else UTF8String.fromString(TextExtract.extractLocation(html.toString))

  def truncationHint(text: UTF8String): Boolean =
    text != null && TextExtract.hasTruncationHint(text.toString)

  def cleanRepostText(raw: UTF8String): UTF8String =
    UTF8String.fromString(TextExtract.cleanRepostText(if (raw == null) null else raw.toString))

  def safeFilename(s: UTF8String): UTF8String =
    if (s == null) null else UTF8String.fromString(TextExtract.safeFilename(s.toString))

  def canonicalizeUrl(u: UTF8String): UTF8String =
    if (u == null) null else UTF8String.fromString(graft.crawl.Canonical.canonicalize(u.toString))

  def hostOf(u: UTF8String): UTF8String =
    if (u == null) null else UTF8String.fromString(graft.crawl.Canonical.host(u.toString))
}

/** html (string) → extracted text; the engine's per-row invariant expression.
  * Deterministic and null-intolerant; see TextExtract.extractText. */
case class ExtractText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = ExprImpl.extractText(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.extractText($c)")
  override protected def withNewChildInternal(c: Expression): ExtractText = copy(c)
  override def prettyName: String = "extract_text"
}

/** html (binary, utf-8 bytes per input_hint `html: binary`) → extracted text. */
case class ExtractTextBin(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = ExprImpl.extractTextBin(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.extractTextBin($c)")
  override protected def withNewChildInternal(c: Expression): ExtractTextBin = copy(c)
  override def prettyName: String = "extract_text_bin"
}

/** html (binary) → array of absolute outlink urls (frontier expansion, U5). */
case class ExtractOutlinks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = ExprImpl.extractOutlinksBin(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.extractOutlinksBin($c)")
  override protected def withNewChildInternal(c: Expression): ExtractOutlinks = copy(c)
  override def prettyName: String = "extract_outlinks"
}

/** html (binary) → struct(text, outlinks) in ONE scan — the fused crawl
  * hot-path expression (one parse per page instead of two; allocation-lean). */
case class ExtractParsed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("text", StringType, nullable = true),
    StructField("outlinks", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullSafeEval(v: Any): Any = ExprImpl.extractParsedBin(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.extractParsedBin($c)")
  override protected def withNewChildInternal(c: Expression): ExtractParsed = copy(c)
  override def prettyName: String = "extract_parsed"
}

/** html (string) → topics array (weibo.py:1210-1221). */
case class ExtractTopics(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = ExprImpl.extractTopics(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.extractTopics($c)")
  override protected def withNewChildInternal(c: Expression): ExtractTopics = copy(c)
  override def prettyName: String = "extract_topics"
}

/** html (string) → at-user names (weibo.py:1223-1233). */
case class ExtractAtUsers(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = ExprImpl.extractAtUsers(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.extractAtUsers($c)")
  override protected def withNewChildInternal(c: Expression): ExtractAtUsers = copy(c)
  override def prettyName: String = "extract_at_users"
}

/** CJK-magnitude count coercion as a native expression (weibo.py:1235-1245). */
case class StringToIntExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = ExprImpl.stringToInt(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.stringToInt($c)")
  override protected def withNewChildInternal(c: Expression): StringToIntExpr = copy(c)
  override def prettyName: String = "string_to_int_cjk"
}

/** html (string) → headline-article url or '' (weibo.py:1200-1208, X5). */
case class ExtractArticleUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = ExprImpl.extractArticleUrl(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.extractArticleUrl($c)")
  override protected def withNewChildInternal(c: Expression): ExtractArticleUrl = copy(c)
  override def prettyName: String = "extract_article_url"
}

/** html (string) → location text after the location-icon span (weibo.py:1188-1198, X6). */
case class ExtractLocation(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = ExprImpl.extractLocation(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.extractLocation($c)")
  override protected def withNewChildInternal(c: Expression): ExtractLocation = copy(c)
  override def prettyName: String = "extract_location"
}

/** text → is-truncated hint (weibo.py:1286-1297, X11). */
case class TruncationHint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def nullSafeEval(v: Any): Any = ExprImpl.truncationHint(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.truncationHint($c)")
  override protected def withNewChildInternal(c: Expression): TruncationHint = copy(c)
  override def prettyName: String = "truncation_hint"
}

/** repost text cleanup (weibo.py:2457-2462, X17): head before '//';
  * empty/"Repost" → 转发微博. */
case class CleanRepostText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = ExprImpl.cleanRepostText(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.cleanRepostText($c)")
  override protected def withNewChildInternal(c: Expression): CleanRepostText = copy(c)
  override def prettyName: String = "clean_repost_text"
}

/** safe filename (weibo.py:2291, X14): windows-invalid chars → '_'. */
case class SafeFilename(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = ExprImpl.safeFilename(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.safeFilename($c)")
  override protected def withNewChildInternal(c: Expression): SafeFilename = copy(c)
  override def prettyName: String = "safe_filename"
}

/** URL canonicalization (north rule: seen-set keyed by canonicalized+xxhash64 urls). */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = ExprImpl.canonicalizeUrl(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.canonicalizeUrl($c)")
  override protected def withNewChildInternal(c: Expression): CanonicalizeUrl = copy(c)
  override def prettyName: String = "canonicalize_url"
}

/** url → lowercase host (politeness partitioning key). */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = ExprImpl.hostOf(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprImpl.hostOf($c)")
  override protected def withNewChildInternal(c: Expression): UrlHost = copy(c)
  override def prettyName: String = "url_host"
}

/** Column-level API for the engine's custom expressions. */
object gf {
  def extract_text(c: Column): Column = column(ExtractText(expression(c)))
  def extract_text_bin(c: Column): Column = column(ExtractTextBin(expression(c)))
  def extract_outlinks(c: Column): Column = column(ExtractOutlinks(expression(c)))
  def extract_parsed(c: Column): Column = column(ExtractParsed(expression(c)))
  def extract_topics(c: Column): Column = column(ExtractTopics(expression(c)))
  def extract_at_users(c: Column): Column = column(ExtractAtUsers(expression(c)))
  def string_to_int_cjk(c: Column): Column = column(StringToIntExpr(expression(c)))
  def extract_article_url(c: Column): Column = column(ExtractArticleUrl(expression(c)))
  def extract_location(c: Column): Column = column(ExtractLocation(expression(c)))
  def truncation_hint(c: Column): Column = column(TruncationHint(expression(c)))
  def clean_repost_text(c: Column): Column = column(CleanRepostText(expression(c)))
  def safe_filename(c: Column): Column = column(SafeFilename(expression(c)))
  def canonicalize_url(c: Column): Column = column(CanonicalizeUrl(expression(c)))
  def url_host(c: Column): Column = column(UrlHost(expression(c)))
}
