package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the LLM-pipeline operators Spark
  * lacks as built-ins. Scalar single-pass algorithms belong in an
  * Expression (per-row, no shuffle, no UDF serialization); the
  * bucketing/joining around them stays declarative (Catalyst plans the
  * distribution). `cosine_sim` carries doGenCode so the kNN hot loop
  * stays inside whole-stage codegen; the hash expressions are
  * interpreted (they're not the scan bottleneck) with codegen a
  * documented follow-up.
  *
  * Lives under org.apache.spark.sql because ExpectsInputTypes /
  * AbstractDataType / ExpressionUtils are private[sql] in Spark 4 —
  * the standard pattern for Catalyst extension libraries. User-facing
  * wrappers are in `graft.functions`.
  */
object GraftShim {
  import org.apache.spark.sql.classic.ExpressionUtils
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_fingerprint64",
      es => PolyFingerprint64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      es => CosineSimF(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es.head, 64), "scala_udf")
  }
}

/** 64-bit FNV-1a polynomial rolling fingerprint of a string — a
  * cheap, engine-portable document fingerprint (order-sensitive,
  * unlike the md5-of-normalized-text content hash).
  */
case class PolyFingerprint64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  h ^= ($bytes[$i] & 0xffL);
         |  h *= 0x100000001b3L;
         |}
         |${ev.value} = h;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature: k minima of k universal-hash permutations
  * applied to an array of element hashes (shingle hashes). One pass
  * over the array per row; k·|arr| multiply-adds.
  * Permutation family: h_i(x) = (a_i·x + b_i) mod p with fixed seeds —
  * deterministic across runs and engines.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      // splitmix64-derived odd multipliers/offsets per permutation
      val a = MinHashSignature.mix(2 * i + 1) | 1L
      val b = MinHashSignature.mix(2 * i + 2)
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = a * arr.getLong(j) + b
        if (h < min) min = h
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** splitmix64 finalizer — stable seed→constant derivation. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** 64-bit SimHash over an array of element hashes: per bit, sum ±1
  * across elements, take the sign. Near-duplicate docs land within a
  * small hamming distance (checked with bit_count(a^b)).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Cosine similarity of two float-array embeddings, accumulated in
  * double, single fused pass (dot + both norms), whole-stage-codegen.
  * Returns NULL on length mismatch or zero norm rather than failing
  * the whole 100-TB scan.
  */
case class CosineSimF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val na = ctx.freshName("na")
    val nb = ctx.freshName("nb")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |double ${ev.value} = 0.0;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  int $n = ${leftGen.value}.numElements();
        |  if ($n == ${rightGen.value}.numElements()) {
        |    double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      double $x = (double) ${leftGen.value}.getFloat($i);
        |      double $y = (double) ${rightGen.value}.getFloat($i);
        |      $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |    }
        |    if ($na != 0.0 && $nb != 0.0) {
        |      ${ev.isNull} = false;
        |      ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |    }
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
