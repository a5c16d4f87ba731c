package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels shared by interpreted eval and generated code.
  * Whole-stage codegen calls these directly (`TextHashKernels.simhash64(...)`),
  * so the expressions stay inside the codegen'd pipeline instead of falling
  * back to interpreted eval — the preferred form for custom scalar functions
  * (a Scala UDF would break the codegen span and add serialization).
  */
object TextHashKernels {

  /** FNV-1a 64-bit over UTF-8 bytes — the rolling document fingerprint.
    * Deterministic, cheap, and stable across JVMs (no Object.hashCode). */
  def fingerprint64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens: each token's FNV-1a hash votes
    * +1/-1 per bit position; the sign of each accumulated vote is the output
    * bit. Near-duplicate documents land at small Hamming distance. */
  def simhash64(s: UTF8String): Long = {
    val votes = new Array[Int](64)
    val str = s.toString
    var start = 0
    val n = str.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(str.charAt(i))) {
        if (i > start) {
          val tok = UTF8String.fromString(str.substring(start, i))
          val h = fingerprint64(tok)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `fingerprint64(text)` as a native Catalyst expression with codegen. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextHashKernels.fingerprint64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.fingerprint64($c)")
  override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(c)
}

/** `simhash64(text)` as a native Catalyst expression with codegen. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs STRING, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TextHashKernels.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Column builders + SQL registration. */
object TextHash {
  def fingerprint64(c: Column): Column =
    ColumnShim.column(Fingerprint64(ColumnShim.expression(c)))
  def simhash64(c: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint64", exprs => Fingerprint64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
  }
}
