package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{columnToExpr, exprToColumn}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom text expressions for the dedup hot path.
  *
  * Building word n-gram shingles as STRINGS
  * (`transform(sequence(...), i -> array_join(slice(words, i, n)))`)
  * allocates one UTF8String per position through three interpreted
  * higher-order functions — the dominant cost of the shingle scan.
  * Downstream only ever consumes xxhash64(shingle), so this
  * expression emits the 64-bit hashes directly: one pass over the
  * text bytes, zero string allocation. Runs once per document row
  * (CodegenFallback boxing is irrelevant at that frequency; the loop
  * itself is JIT-compiled).
  */
object TextExpressions {

  /** FNV-1a 64-bit over a byte range — stable, seed-free. */
  @inline private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xCBF29CE484222325L
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xFFL)) * 0x100000001B3L
      i += 1
    }
    h
  }

  /** Hashes of all word n-gram shingles of `child` (a whitespace-
    * normalized string). Shingle hash = order-dependent mix of the n
    * word hashes (polynomial in a large odd constant), so distinct
    * word sequences get independent 64-bit codes.
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {

    require(n >= 1, "shingle width must be >= 1")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"shingle_hashes needs a string column, got $other")
      }

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      // word boundaries: single spaces (input is normalized)
      var wordCount = 0
      var i = 0
      val len = bytes.length
      // first pass: count words
      var inWord = false
      while (i < len) {
        if (bytes(i) != ' ') { if (!inWord) { wordCount += 1; inWord = true } }
        else inWord = false
        i += 1
      }
      if (wordCount < n) return new GenericArrayData(Array.empty[Long])
      // second pass: per-word hashes
      val wordHash = new Array[Long](wordCount)
      var w = 0
      i = 0
      while (i < len) {
        if (bytes(i) != ' ') {
          var j = i
          while (j < len && bytes(j) != ' ') j += 1
          wordHash(w) = fnv1a(bytes, i, j)
          w += 1
          i = j
        } else i += 1
      }
      // rolling window: polynomial combination of n word hashes
      val out = new Array[Long](wordCount - n + 1)
      var s = 0
      while (s <= wordCount - n) {
        var h = 0x9E3779B97F4A7C15L
        var k = 0
        while (k < n) {
          h = h * 0xBF58476D1CE4E5B9L ^ wordHash(s + k)
          k += 1
        }
        // final avalanche so nearby windows decorrelate
        h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
        h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
        out(s) = h ^ (h >>> 31)
        s += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): ShingleHashes =
      copy(child = c)
  }

  def shingle_hashes(text: Column, n: Int): Column =
    exprToColumn(ShingleHashes(columnToExpr(text), n))
}
