package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the vector hot paths (SURVEY.md
  * §7.3: "custom Expression (codegen) as an optimization, never for
  * correctness").
  *
  * The built-in composition (`aggregate(zip_with(...))`) is
  * semantically identical but runs interpreted — per 2M-pair
  * similarity join that is ~40s of lambda dispatch at sf0.1. These
  * expressions generate a tight primitive loop inside whole-stage
  * codegen. Accumulation order is left-to-right, matching the
  * higher-order-function evaluation exactly, so swapping them in
  * changes nothing about results.
  */
object VectorExpressions {

  private[functions] def elementGetter(
      dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"$arr.getFloat($i)"
    case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
    case other => throw new IllegalArgumentException(
      s"dot product needs array<float|double>, got $other")
  }

  private[functions] def elementAt(dt: DataType, arr: ArrayData, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"dot product needs array<float|double>, got $other")
    }

  /** Σ a_i·b_i in double, left-to-right. Codegen'd primitive loop.
    *
    * Edge semantics match the HOF twin `aggregate(zip_with(a, b,
    * (x,y) -> x*y), 0D, (acc,v) -> acc+v)` EXACTLY: mismatched array
    * lengths → NULL (zip_with null-pads, null poisons the sum), any
    * null element → NULL. The per-element null check is emitted only
    * when the child types admit nulls (VectorExpressionsSpec pins all
    * three cases against the twin).
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    // result can be null even for non-null inputs (length mismatch)
    override def nullable: Boolean = true

    private def containsNull(dt: DataType): Boolean = dt match {
      case ArrayType(_, n) => n
      case _ => true
    }
    private def needElementNullCheck: Boolean =
      containsNull(left.dataType) || containsNull(right.dataType)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(dt: DataType) = dt match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs array<float|double> args, got " +
            s"${left.dataType} and ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) return null
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += elementAt(left.dataType, x, i) * elementAt(right.dataType, y, i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val elemNullCheck =
          if (needElementNullCheck)
            s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
          else ""
        s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $elemNullCheck
            $acc += (double)${elementGetter(left.dataType, a, i)} *
                    (double)${elementGetter(right.dataType, b, i)};
          }
          ${ev.value} = $acc;
        }
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Multi-table hyperplane-LSH code: bit p of the result is
    * sign(v · plane_{p+planeOffset}), planes derived deterministically
    * from a splitmix64 scramble of (plane, dim) — no RNG state,
    * identical on every executor. One pass over the vector computes all
    * planes (vs. numPlanes·dim `element_at` expression nodes).
    * Interpreted eval is fine here: it runs once per corpus row, not
    * per candidate pair. `planeOffset` selects a disjoint plane family,
    * so a 128-plane code is two calls (offset 0 and 64) — a Long holds
    * at most 64 sign bits.
    */
  case class HyperplaneBucket(child: Expression, numPlanes: Int,
      planeOffset: Int = 0)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = LongType

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"lsh_bucket needs array<float|double>, got $other")
      }

    // null element → null code (not raw slot bytes)
    override def nullable: Boolean = true

    // plane matrix for the observed dim, filled once per (task, dim):
    // md5 per (plane, i) is far too slow inside the row loop
    @transient private lazy val planeCache =
      new java.util.concurrent.atomic.AtomicReference[(Int, Array[Double])]()

    private def planes(dim: Int): Array[Double] = {
      val cur = planeCache.get()
      if (cur != null && cur._1 == dim) cur._2
      else {
        val arr = new Array[Double](numPlanes * dim)
        var p = 0
        while (p < numPlanes) {
          var i = 0
          while (i < dim) {
            arr(p * dim + i) = HyperplaneBucket.component(p + planeOffset, i)
            i += 1
          }
          p += 1
        }
        planeCache.set((dim, arr))
        arr
      }
    }

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val dim = arr.numElements()
      val pl = planes(dim)
      val sums = new Array[Double](numPlanes)
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) return null
        val x = elementAt(child.dataType, arr, i)
        var p = 0
        while (p < numPlanes) {
          sums(p) += x * pl(p * dim + i)
          p += 1
        }
        i += 1
      }
      var bucket = 0L
      var p = 0
      while (p < numPlanes) {
        if (sums(p) >= 0.0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }

    override protected def withNewChildInternal(c: Expression): HyperplaneBucket =
      copy(child = c)
  }

  object HyperplaneBucket {
    /** Deterministic pseudo-random plane component in [-0.5, 0.5):
      * the first 15 hex chars of md5("p_i") as a 60-bit integer,
      * scaled by 2^-60. Chosen to be ORACLE-PORTABLE: DuckDB computes
      * the bit-identical value as
      * `('0x'||substr(md5(p||'_'||i),1,15))::BIGINT / 2^60 - 0.5`,
      * so LSH bucketing (and thus q31) is reproducible in SQL and runs
      * under the hard hash-compare. Both sides divide and subtract in
      * IEEE double → identical planes everywhere.
      */
    def component(p: Int, i: Int): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${p}_${i}".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val v = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      v.toDouble / 1152921504606846976.0 - 0.5 // 2^60
    }
  }

  def dot_product(a: Column, b: Column): Column =
    exprToColumn(DotProduct(columnToExpr(a), columnToExpr(b)))

  def lsh_bucket(v: Column, numPlanes: Int, planeOffset: Int = 0): Column =
    exprToColumn(HyperplaneBucket(columnToExpr(v), numPlanes, planeOffset))
}
