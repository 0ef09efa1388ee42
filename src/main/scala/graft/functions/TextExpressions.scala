package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word n-gram extraction: lowercase → split on ' ' (empties
  * dropped) → n-grams joined with ' ', optionally distinct
  * (first-occurrence order, matching `array_distinct`).
  *
  * Native expression rather than the equivalent
  * `transform(sequence(...), i -> concat_ws(' ', element_at(toks, i+1), ...))`
  * HOF pipeline because higher-order functions are interpreted
  * (CodegenFallback) and re-evaluate their child per element — the HOF
  * formulation re-splits the whole document at every n-gram position,
  * making shingling O(tokens²) per row. This is O(tokens), once. At 100 TB
  * the shingling pass reads every document exactly once, so this is the
  * scan-speed primitive the whole dedup family sits on.
  */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n > 0)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (distinct) "word_shingles" else "word_ngrams"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  /** Also invoked from generated code (public on purpose). */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    val len = str.length
    var i = 0
    var start = 0
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        if (i > start) toks.add(str.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    val m = toks.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](m)
    val seen = if (distinct) new java.util.HashSet[String]() else null
    var j = 0
    while (j < m) {
      val sb = new java.lang.StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      val g = sb.toString
      if (seen == null || seen.add(g)) out.add(UTF8String.fromString(g))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("wordNgrams", this, classOf[WordNgrams].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-width character histogram: counts of UTF-16 code units bucketed
  * by `codeUnit % bins`. One O(chars) pass per row.
  *
  * Used as the bag-of-characters edit-distance prefilter (t17): one edit
  * operation moves the histogram by at most 2 units of L1 distance, so
  * L1/2 is a true lower bound on Levenshtein for ANY fixed char→bin
  * mapping — collisions only weaken the bound, never break it. Native
  * expression because the HOF spelling (`transform(sequence(0, bins-1),
  * b -> size(filter(split(s, ''), ...)))`) is interpreted
  * (CodegenFallback) and re-splits the string per bin — measured as the
  * dominant cost of the whole t17 pair scan at sf0.1.
  */
case class CharHistogram(child: Expression, bins: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bins > 0)

  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_histogram"

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])

  /** Also invoked from generated code (public on purpose). */
  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val h = new Array[Int](bins)
    var i = 0
    while (i < str.length) {
      h(str.charAt(i) % bins) += 1
      i += 1
    }
    new GenericArrayData(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("charHistogram", this, classOf[CharHistogram].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
