package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{Bridge => ExpressionUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two `array<float>` embedding columns.
  *
  * A native Catalyst expression (with `doGenCode`) rather than a UDF so the
  * hot loop stays inside whole-stage codegen — no boxing, no Row
  * materialization, no codegen-fence. At 100 TB this expression sits inside
  * an O(candidates) inner loop of every ANN/near-dup job, so it is the one
  * scalar that must be cheap.
  *
  * Accumulation is sequential double (left→right), matching the DuckDB
  * oracle formulation `list_sum([a[i]::DOUBLE * b[i]::DOUBLE ...])
  * / sqrt(..) / sqrt(..)` bit-for-bit (verified: DuckDB's own
  * `list_cosine_similarity` computes in float32 and does NOT match).
  *
  * Zero-norm or empty input yields 0.0 (embeddings in this engine are
  * never zero vectors; a sentinel beats a nullable hot-path column).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / math.sqrt(nx) / math.sqrt(ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.getFloat($i);
         |  double $yv = (double) $b.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / java.lang.Math.sqrt($nx) / java.lang.Math.sqrt($ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd cosine similarity (the production primitive). */
  def cosine_similarity(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Built-in-only formulation (zip_with + sequential aggregate). Used to
    * cross-check the custom expression and as the fallback documented in
    * SURVEY.md §4.2. Same sequential-double semantics.
    */
  def cosine_similarity_hof(a: Column, b: Column): Column = {
    def dot(u: Column, v: Column): Column =
      aggregate(zip_with(u, v, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Deterministic random-hyperplane LSH signature: `bits` sign bits packed
    * into a long. Hyperplane components are pseudo-random in [-1,1), derived
    * from splitmix64(seed, bitIdx, dim) — no RNG state, so executors and
    * retries always agree (crucial for distributed determinism).
    */
  def hyperplane_lsh(vec: Column, bits: Int, dim: Int, seed: Long): Column = {
    require(bits <= 64, "signature packs into one long")
    // component(j, d) as a literal array-of-arrays, built driver-side once:
    // bits × dim doubles is tiny (<= 64*4096); shipped to executors as one
    // literal, evaluated inside codegen.
    val planes: Array[Array[Double]] = Array.tabulate(bits, dim) { (j, d) =>
      val z = splitmix64(seed + j.toLong * 0x9E3779B97F4A7C15L + d.toLong)
      // map top 53 bits to [-1, 1)
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    val bitCols = (0 until bits).map { j =>
      val plane = lit(planes(j))
      val proj = aggregate(
        zip_with(vec, plane, (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Multi-table hyperplane LSH signatures as one codegen'd pass: returns
    * `array<long>` of `tables` bucket ids (each `bits` sign bits). The
    * production ANN path: bucket ids are computed at scan speed, the join
    * key is (table, bucket), and only same-bucket candidates pay the full
    * cosine — turning an O(N·Q) brute-force scan into O(bucket volume).
    */
  def hyperplane_lsh_multi(vec: Column, bits: Int, tables: Int, dim: Int, seed: Long): Column =
    ExpressionUtils.column(
      HyperplaneLsh(ExpressionUtils.expression(vec), bits, tables, dim, seed))

  private[graft] def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** See [[VectorFunctions.hyperplane_lsh_multi]]. Hyperplanes are derived
  * deterministically from (seed, table, bit, dim) via splitmix64 — no RNG
  * state, so every executor and every task retry agrees on the planes.
  */
case class HyperplaneLsh(child: Expression, bits: Int, tables: Int, dim: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits <= 63 && tables > 0 && tables <= 64)

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_lsh"

  /** planes(t*bits + j)(d) in [-1, 1). */
  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(tables * bits, dim) { (tj, d) =>
      val z = VectorFunctions.splitmix64(
        seed + tj.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL)
      (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        val p = planes(t * bits + j)
        val n = math.min(arr.numElements(), p.length)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += arr.getFloat(d).toDouble * p(d); d += 1 }
        if (dot >= 0.0) sig |= (1L << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ps = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    double[] $p = $ps[$t * $bits + $j];
         |    int $n = java.lang.Math.min($a.numElements(), $p.length);
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) { $dot += (double) $a.getFloat($d) * $p[$d]; }
         |    if ($dot >= 0.0) $sig |= (1L << $j);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
