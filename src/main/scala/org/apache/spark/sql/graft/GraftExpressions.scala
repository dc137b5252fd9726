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
  * distribution). Every expression here carries a real doGenCode —
  * `cosine_sim` so the kNN hot loop stays inside whole-stage codegen,
  * and the hash/sketch expressions so the dedup scan stage does too
  * (CodegenSpec locks the no-CodegenFallback property).
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
  /** Arity check for SQL builders: extra/missing args fail at parse
    * time with the function name, not silently ignored.
    */
  def arity(name: String, n: Int, es: Seq[Expression]): Seq[Expression] = {
    require(es.length == n,
      s"$name expects $n argument(s), got ${es.length}")
    es
  }

  /** Distributed bloom-filter build over a LongType key column: one
    * partial-merged aggregate whose result is the serialized filter
    * bits. The driver ever holds only the bit array (numBits/8 bytes),
    * never the key set — the membership structure for key sets too
    * large to broadcast as a hash map. Same machinery Spark's own
    * runtime-filter injection uses (BloomFilterAggregate).
    */
  def bloomAgg(keys: Column, expectedItems: Long, numBits: Long): Column =
    toColumn(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(toExpression(keys),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Membership probe of a LongType key against serialized bloom bits
    * (codegen'd; false positives at the filter's fpp, no false
    * negatives).
    */
  def bloomMightContain(bits: Column, key: Column): Column =
    toColumn(org.apache.spark.sql.catalyst.expressions
      .BloomFilterMightContain(toExpression(bits), toExpression(key)))
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_fingerprint64",
      es => PolyFingerprint64(arity("poly_fingerprint64", 1, es).head), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(arity("simhash64", 1, es).head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      es => { arity("cosine_sim", 2, es); CosineSimF(es.head, es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(arity("minhash_signature", 1, es).head, 64), "scala_udf")
    reg.createOrReplaceTempFunction("text_profile",
      es => TextProfile(arity("text_profile", 1, es).head), "scala_udf")
    reg.createOrReplaceTempFunction("quantize_i8",
      es => { arity("quantize_i8", 2, es); QuantizeI8(es.head, es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("int8_dot",
      es => { arity("int8_dot", 2, es); Int8Dot(es.head, es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("l2sq_long",
      es => { arity("l2sq_long", 2, es); L2SqLong(es.head, es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("sign_bits",
      es => SignBits(arity("sign_bits", 1, es).head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming_words",
      es => { arity("hamming_words", 2, es); HammingWords(es.head, es(1)) }, "scala_udf")
    reg.createOrReplaceTempFunction("sign_dot",
      es => { arity("sign_dot", 2, es); SignDot(es.head, es(1)) }, "scala_udf")
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
    extends UnaryExpression with ExpectsInputTypes {
  // plan-time guard: the permutation tables are precomputed up to
  // maxK; past it the failure would otherwise be an
  // ArrayIndexOutOfBounds inside codegen'd executor code
  require(k > 0 && k <= MinHashSignature.maxK,
    s"k=$k out of range (1..${MinHashSignature.maxK})")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSignature.signature(input.asInstanceOf[ArrayData], k))
  // real codegen matters here: a CodegenFallback would interpret not
  // just this node but the whole collapsed child projection
  // (tokenize→hash→shingle) per row — ~6× observed on the dedup bench
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = org.apache.spark.sql.graft.MinHashSignature.signature($c, $k);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
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

  val maxK = 256
  // permutation constants precomputed once (h_i(x) = a_i·x + b_i)
  private val as: Array[Long] = Array.tabulate(maxK)(i => mix(2 * i + 1) | 1L)
  private val bs: Array[Long] = Array.tabulate(maxK)(i => mix(2 * i + 2))

  /** Shared by interpreted eval and generated code. */
  def signature(arr: ArrayData, k: Int): Array[Long] = {
    val n = arr.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = as(i); val b = bs(i)
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
    out
  }
}

/** Distinct rolling word-n-gram shingle hashes from an array of token
  * hashes — single native pass, no intermediate shingle strings or
  * arrays. Keeping this (and the band computation below) one
  * Expression matters structurally: the physical planner collapses
  * projections by substitution, so a multi-reference columnar
  * formulation re-evaluates the whole upstream chain per reference
  * (observed 17× on the dedup bench).
  */
case class ShingleHashes(child: Expression, n: Int, dedup: Boolean = true)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.shingles(input.asInstanceOf[ArrayData], n, dedup))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = org.apache.spark.sql.graft.ShingleHashes.shingles($c, $n, $dedup);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Rolling combine of n consecutive token hashes (order-sensitive),
    * deduplicated (dedup=true, the LSH form) or positional
    * (dedup=false, one hash per shingle start — what winnowing's
    * sliding window needs). Shared by interpreted eval and codegen.
    */
  def shingles(arr: ArrayData, n: Int, dedup: Boolean): Array[Long] = {
    val m = arr.numElements()
    if (m < n) return Array.emptyLongArray
    val seen = if (dedup) new java.util.HashSet[java.lang.Long]() else null
    val out = new Array[Long](m - n + 1)
    var cnt = 0
    var i = 0
    while (i <= m - n) {
      var h = 0x9e3779b97f4a7c15L
      var j = 0
      while (j < n) {
        h = (h ^ arr.getLong(i + j)) * 0x100000001b3L
        j += 1
      }
      h = MinHashSignature.mix(h)
      if (seen == null || seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, cnt)
  }

  def shingles(arr: ArrayData, n: Int): Array[Long] = shingles(arr, n, dedup = true)
}

/** Hashed-bucket histogram of an array<long> in one native pass:
  * array of struct(b, n) rows, b = pmod(hash, buckets) ascending,
  * n = occurrences — exactly the per-row result of
  * explode(hashes) → groupBy(pmod(h, buckets)) → count, without the
  * per-element explode or the aggregation exchange (DSIR's
  * ingest-time pass; requires `buckets` > 0). Codegen'd like the
  * other sketch kernels so the tokenize→histogram scan stage stays
  * one whole-stage-codegen span.
  */
case class BucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(buckets > 0, s"buckets must be positive: $buckets")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("b", LongType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BucketCounts.counts(input.asInstanceOf[ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.BucketCounts.counts($c, $buckets);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketCounts {
  /** Shared by interpreted eval and codegen. floorMod matches
    * Spark's pmod for a positive divisor, so the bucket of every
    * hash is bit-identical to the pre-r16 explode+pmod+groupBy form.
    */
  def counts(arr: ArrayData, buckets: Int): ArrayData = {
    val cnt = new Array[Long](buckets)
    val m = arr.numElements()
    var i = 0
    while (i < m) {
      cnt(java.lang.Math.floorMod(arr.getLong(i), buckets.toLong).toInt) += 1L
      i += 1
    }
    var nz = 0
    var b = 0
    while (b < buckets) { if (cnt(b) != 0L) nz += 1; b += 1 }
    val rows = new Array[Any](nz)
    var k = 0
    b = 0
    while (b < buckets) {
      if (cnt(b) != 0L) {
        rows(k) = org.apache.spark.sql.catalyst.InternalRow(b.toLong, cnt(b))
        k += 1
      }
      b += 1
    }
    new GenericArrayData(rows)
  }
}

/** Fused MinHash-signature + LSH band hashes: array of `bands` hashes,
  * band b covering signature slots [b·r, (b+1)·r), r = k/bands. One
  * native pass over the shingle array (see ShingleHashes scaladoc for
  * why fusion, not composition, is required here).
  */
case class MinHashBandHashes(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && k <= MinHashSignature.maxK,
    s"k=$k out of range (1..${MinHashSignature.maxK})")
  require(bands > 0 && k % bands == 0, s"bands=$bands must divide k=$k")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashBandHashes.bandHashes(input.asInstanceOf[ArrayData], k, bands))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = org.apache.spark.sql.graft.MinHashBandHashes.bandHashes($c, $k, $bands);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashBandHashes {
  def bandHashes(arr: ArrayData, k: Int, bands: Int): Array[Long] = {
    val sig = MinHashSignature.signature(arr, k)
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L ^ b
      var j = 0
      while (j < r) {
        h = (h ^ sig(b * r + j)) * 0x100000001b3L
        j += 1
      }
      out(b) = MinHashSignature.mix(h)
      b += 1
    }
    out
  }
}

/** 64-bit SimHash over an array of element hashes: per bit, sum ±1
  * across elements, take the sign. Near-duplicate docs land within a
  * small hamming distance (checked with bit_count(a^b)).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SimHash64.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHash64.simhash($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Shared by interpreted eval and generated code. */
  def simhash(arr: ArrayData): Long = {
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
}

/** One pigeonhole re-bucketing step of the capped SimHash miner
  * (graft.operators.LshDedup.simhashCandidatesCapped): deal the
  * signature bits NOT yet fixed by `mask` round-robin in the given
  * entropy `order` into `chunks` disjoint groups, and emit one
  * struct per group — sub_val = the signature's bit projection onto
  * that group (bit j of sub_val = the j-th group bit in order),
  * sub_mask = mask ∪ the group's bits. Pigeonhole guarantee: two
  * signatures agreeing on every `mask` bit with ≤ chunks−1
  * mismatches among the free bits agree on at least one emitted
  * (group, sub_val) — mismatched bits touch at most chunks−1 of the
  * `chunks` groups (groups left empty when free bits < chunks agree
  * trivially, preserving the guarantee at deep recursion levels).
  *
  * A native expression rather than higher-order-function composition
  * because the recursion's split level runs once per OVERSIZED
  * bucket member — the skew hot path — and the HOF form
  * (filter + per-chunk aggregate over a 64-element array) is ~500
  * interpreted array ops per row.
  */
case class PigeonholeSplit(left: Expression, right: Expression,
                           chunks: Int, order: Seq[Int])
    extends BinaryExpression with ExpectsInputTypes {
  require(chunks >= 1 && chunks <= 64, s"chunks=$chunks out of range")
  require(order.sorted == (0 until 64), "order must be a permutation of 0..63")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub_val", LongType, nullable = false),
    StructField("sub_mask", LongType, nullable = false))),
    containsNull = false)
  private lazy val orderArr: Array[Int] = order.toArray
  override def nullSafeEval(sig: Any, mask: Any): Any =
    PigeonholeSplit.split(sig.asInstanceOf[Long], mask.asInstanceOf[Long],
      chunks, orderArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val orderRef = ctx.addReferenceObj("phOrder", orderArr, "int[]")
    nullSafeCodeGen(ctx, ev, (sig, mask) =>
      s"""${ev.value} = org.apache.spark.sql.graft.PigeonholeSplit
         |  .split($sig, $mask, $chunks, $orderRef);""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PigeonholeSplit {
  /** Shared by interpreted eval and generated code. */
  def split(sig: Long, mask: Long, chunks: Int, order: Array[Int]): ArrayData = {
    val vals = new Array[Long](chunks)
    val masks = new Array[Long](chunks)
    val cnt = new Array[Int](chunks)
    var i = 0
    var f = 0
    while (i < 64) {
      val b = order(i)
      if (((mask >>> b) & 1L) == 0L) {
        val c = f % chunks
        vals(c) |= ((sig >>> b) & 1L) << cnt(c)
        masks(c) |= 1L << b
        cnt(c) += 1
        f += 1
      }
      i += 1
    }
    val rows = new Array[Any](chunks)
    var c = 0
    while (c < chunks) {
      rows(c) = org.apache.spark.sql.catalyst.InternalRow(vals(c), mask | masks(c))
      c += 1
    }
    new GenericArrayData(rows)
  }
}

/** Random-hyperplane LSH signature of a float-array embedding: bit j
  * = sign(dot(v, h_j)), hyperplane components ±1 derived from a
  * deterministic hash of (j, i) — no stored model, identical on any
  * plan side. One native pass computes all `nBits` dots (the columnar
  * formulation would scan the array once per bit).
  */
case class HyperplaneSig(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nBits > 0 && nBits <= 63, s"nBits=$nBits out of range")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.signature(input.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.HyperplaneSig.signature($c, $nBits);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {
  def signature(arr: ArrayData, nBits: Int): Long = {
    val n = arr.numElements()
    val dots = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val v = arr.getFloat(i).toDouble
      var j = 0
      while (j < nBits) {
        // ±1 component from parity of a mixed (j, i) hash
        if ((MinHashSignature.mix(j.toLong * 1000003L + i) & 1L) == 0L) dots(j) += v
        else dots(j) -= v
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) {
      if (dots(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
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

/** One-pass text profile: every scalar the text-analysis operators
  * need, from a single scan over the UTF-8 bytes — token count,
  * BPE-ish piece count, non-space/punctuation/CJK code-point counts
  * and the stopword-set hit counts behind quality scoring and
  * language ID. The columnar formulation of these metrics costs one
  * regex split plus several interpreted higher-order list functions
  * per metric (HigherOrderFunction is CodegenFallback in Spark), so a
  * corpus scan leaves whole-stage codegen exactly where throughput
  * matters; this expression keeps the scan in generated code with one
  * byte pass and no intermediate token arrays.
  *
  * Semantics notes (kept bit-compatible with the columnar formulas
  * and the DuckDB oracles):
  *  - tokens are maximal runs of non-[ \t\n\x0B\f\r] bytes (Java
  *    regex \s), counted when non-empty;
  *  - stopword matching byte-lowercases A-Z only — ASCII stopword
  *    sets cannot be hit by non-ASCII tokens under either Unicode or
  *    ASCII lowering;
  *  - counts are per code point (RE2/DuckDB semantics); Java regex's
  *    double-counting of supplementary characters as two surrogate
  *    matches is deliberately not replicated;
  *  - CJK detection covers U+4E00..U+9FFF (3-byte UTF-8).
  */
case class TextProfile(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = TextProfile.schema
  override def nullSafeEval(input: Any): Any =
    TextProfile.profile(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TextProfile.profile($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextProfile {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_bpeish", IntegerType, nullable = false),
    StructField("n_nonspace", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_zh", IntegerType, nullable = false),
    StructField("sw_q", IntegerType, nullable = false),
    StructField("sw_en", IntegerType, nullable = false),
    StructField("sw_es", IntegerType, nullable = false),
    StructField("sw_de", IntegerType, nullable = false),
    StructField("sw_fr", IntegerType, nullable = false)))

  // stopword-set membership flags
  private final val Q = 1   // the,a,an,and,of,to,in,is,it,that (quality)
  private final val EN = 2  // the,and,of,is,that
  private final val ES = 4  // el,los,las,es,y
  private final val DE = 8  // der,die,das,und,ist
  private final val FR = 16 // le,les,est,et,dans

  /** Flags of a byte-lowercased token of length ≤ 4 (0 otherwise). */
  private def tokenFlags(b: Array[Byte], start: Int, end: Int): Int = {
    val len = end - start
    if (len > 4) return 0
    def lc(j: Int): Int = {
      val c = b(start + j) & 0xff
      if (c >= 'A' && c <= 'Z') c + 32 else c
    }
    len match {
      case 1 => lc(0) match {
        case 'a' => Q
        case 'y' => ES
        case _ => 0
      }
      case 2 => (lc(0): @annotation.switch) match {
        case 'a' => if (lc(1) == 'n') Q else 0
        case 'o' => if (lc(1) == 'f') Q | EN else 0
        case 't' => if (lc(1) == 'o') Q else 0
        case 'i' => lc(1) match {
          case 'n' => Q; case 's' => Q | EN; case 't' => Q; case _ => 0
        }
        case 'e' => lc(1) match {
          case 'l' => ES; case 's' => ES; case 't' => FR; case _ => 0
        }
        case 'l' => if (lc(1) == 'e') FR else 0
        case _ => 0
      }
      case 3 =>
        val k = (lc(0) << 16) | (lc(1) << 8) | lc(2)
        k match {
          case 0x746865 /* the */ => Q | EN
          case 0x616e64 /* and */ => Q | EN
          case 0x6c6f73 /* los */ => ES
          case 0x6c6173 /* las */ => ES
          case 0x646572 /* der */ => DE
          case 0x646965 /* die */ => DE
          case 0x646173 /* das */ => DE
          case 0x756e64 /* und */ => DE
          case 0x697374 /* ist */ => DE
          case 0x6c6573 /* les */ => FR
          case 0x657374 /* est */ => FR
          case _ => 0
        }
      case 4 =>
        val k = (lc(0) << 24) | (lc(1) << 16) | (lc(2) << 8) | lc(3)
        k match {
          case 0x74686174 /* that */ => Q | EN
          case 0x64616e73 /* dans */ => FR
          case _ => 0
        }
      case _ => 0
    }
  }

  /** Shared by interpreted eval and generated code. */
  def profile(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    var nChars = 0; var nTokens = 0; var nBpe = 0; var nNonspace = 0
    var nPunct = 0; var nZh = 0
    var swQ = 0; var en = 0; var es = 0; var de = 0; var fr = 0
    var tokStart = -1
    var wordRun = false
    def closeToken(end: Int): Unit = {
      nTokens += 1
      val f = tokenFlags(b, tokStart, end)
      if ((f & Q) != 0) swQ += 1
      if ((f & EN) != 0) en += 1
      if ((f & ES) != 0) es += 1
      if ((f & DE) != 0) de += 1
      if ((f & FR) != 0) fr += 1
      tokStart = -1
    }
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) {
        nChars += 1
        val ws = c == 0x20 || (c >= 0x09 && c <= 0x0D)
        if (ws) {
          if (tokStart >= 0) closeToken(i)
          wordRun = false
        } else {
          nNonspace += 1
          if (tokStart < 0) tokStart = i
          if (c == '.' || c == ',' || c == ';' || c == ':' ||
              c == '!' || c == '?' || c == 0x27 || c == '"') nPunct += 1
          val word = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '_'
          if (word) {
            if (!wordRun) { nBpe += 1; wordRun = true }
          } else {
            wordRun = false
            nBpe += 1
          }
        }
        i += 1
      } else {
        if ((c & 0xc0) != 0x80) { // leading byte of a multi-byte code point
          nChars += 1; nNonspace += 1; nBpe += 1
          wordRun = false
          if (tokStart < 0) tokStart = i
          if (c >= 0xe4 && c <= 0xe9 && i + 2 < n) {
            val cp = ((c & 0x0f) << 12) | ((b(i + 1) & 0x3f) << 6) | (b(i + 2) & 0x3f)
            if (cp >= 0x4e00 && cp <= 0x9fff) nZh += 1
          }
        }
        i += 1
      }
    }
    if (tokStart >= 0) closeToken(n)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nTokens, nBpe, nNonspace, nPunct, nZh,
        swQ, en, es, de, fr))
  }
}

/** FNV-1a hash per whitespace token of a string — the tokenize+hash
  * front of the dedup/shingling family as ONE codegen'd expression.
  * The columnar equivalent, `transform(filter(split(...)), t =>
  * poly_fingerprint64(t))`, carries lambda higher-order functions
  * (CodegenFallback), so every reference re-evaluates the whole chain
  * interpreted — and Spark's InferFiltersFromGenerate adds
  * size(...)>0 / isNotNull guards that reference it twice more. With
  * a native expression the chain stays in whole-stage codegen, where
  * subexpression elimination evaluates it once per row.
  *
  * Tokens are maximal runs of non-[ \t\n\x0B\f\r] bytes (Java regex
  * \s — byte-safe in UTF-8: ASCII bytes never occur inside multi-byte
  * sequences). Callers pass pre-lowercased text (lower(trim(text)),
  * both codegen'd built-ins) so hashes stay bit-identical to the
  * previous per-token poly_fingerprint64 over Unicode-lowered tokens.
  */
case class TokenFnvHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokenFnvHashes.hashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenFnvHashes.hashes($c);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenFnvHashes {
  /** Shared by interpreted eval and generated code. */
  def hashes(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    // count tokens first (exact-size output, no builder)
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      val ws = c == 0x20 || (c >= 0x09 && c <= 0x0d)
      if (ws) inTok = false
      else if (!inTok) { count += 1; inTok = true }
      i += 1
    }
    val out = new Array[Long](count)
    var k = 0
    var h = 0xcbf29ce484222325L
    inTok = false
    i = 0
    while (i < n) {
      val c = b(i) & 0xff
      val ws = c == 0x20 || (c >= 0x09 && c <= 0x0d)
      if (ws) {
        if (inTok) { out(k) = h; k += 1; inTok = false }
      } else {
        if (!inTok) { h = 0xcbf29ce484222325L; inTok = true }
        h = (h ^ c) * 0x100000001b3L
      }
      i += 1
    }
    if (inTok) { out(k) = h; k += 1 }
    new GenericArrayData(out)
  }
}

/** Symmetric int8 scalar quantization of a float vector against
  * per-dimension scales: q_d = clamp(floor(v_d · s_d), -127, 127) as
  * a byte. The codebook (`scales` = 127 / max|v_d| over the corpus)
  * is an index artifact computed once and broadcast; quantization
  * itself is a pure scan-speed projection that shrinks each vector
  * 4× before it travels anywhere. floor (not round) on purpose:
  * floor's semantics are identical across engines, so the quantized
  * vectors — and everything ranked from them — reproduce bit-exactly
  * in the DuckDB oracle.
  */
case class QuantizeI8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val out = QuantizeI8.quantize(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (out == null) null else new GenericArrayData(out)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val out = ctx.freshName("out")
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  byte[] $out = org.apache.spark.sql.graft.QuantizeI8.quantize(
        |    ${leftGen.value}, ${rightGen.value});
        |  if ($out != null) {
        |    ${ev.isNull} = false;
        |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object QuantizeI8 {
  /** Shared by interpreted eval and generated code. Returns null on a
    * vector/scales length mismatch (defensive, mirrors CosineSimF).
    */
  def quantize(vec: ArrayData, scales: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    if (n != scales.numElements()) return null
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = math.floor(vec.getFloat(i).toDouble * scales.getDouble(i))
      out(i) = math.max(-127.0, math.min(127.0, q)).toByte
      i += 1
    }
    out
  }
}

/** Integer dot product of two int8-quantized vectors — the coarse
  * scoring kernel of quantized ANN. Pure integer arithmetic inside
  * whole-stage codegen; a 64-dim product is at most 64·127² ≈ 2^20,
  * so the long accumulator is exact at any realistic dimension.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += a.getByte(i).toLong * b.getByte(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(dot)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val dot = ctx.freshName("dot")
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = 0L;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  int $n = ${leftGen.value}.numElements();
        |  if ($n == ${rightGen.value}.numElements()) {
        |    long $dot = 0L;
        |    for (int $i = 0; $i < $n; $i++) {
        |      $dot += (long) ${leftGen.value}.getByte($i)
        |            * (long) ${rightGen.value}.getByte($i);
        |    }
        |    ${ev.isNull} = false;
        |    ${ev.value} = $dot;
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance between two fixed-point (array<long>) vectors —
  * the scoring kernel of quantized k-means (graft.operators.KMeans).
  * Pure integer arithmetic inside whole-stage codegen, so the result
  * is exact and engine-portable: a DuckDB oracle doing the same
  * quantized subtract-square-sum reproduces it bit-for-bit, which a
  * float distance never guarantees. Range: with components ≤ 2^21
  * (|x| ≲ 2 at 2^20 fixed point), a 64-dim distance is < 2^49 —
  * far inside the long.
  */
case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val d = ctx.freshName("d")
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = 0L;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  int $n = ${leftGen.value}.numElements();
        |  if ($n == ${rightGen.value}.numElements()) {
        |    long $acc = 0L;
        |    for (int $i = 0; $i < $n; $i++) {
        |      long $d = ${leftGen.value}.getLong($i)
        |              - ${rightGen.value}.getLong($i);
        |      $acc += $d * $d;
        |    }
        |    ${ev.isNull} = false;
        |    ${ev.value} = $acc;
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-bit binarization of an array<float> embedding: bit d (of
  * word d/64) is set iff v[d] > 0 — 1-bit scalar quantization, the
  * most compressed member of the quantized-ANN family (32× smaller
  * than float in flight; similarity becomes a popcount). The sign
  * test is engine-portable: a DuckDB oracle's per-dimension `v > 0`
  * reproduces the bits exactly, so the hamming coarse stage is
  * integer-exact across engines. Shared pack routine between
  * interpreted eval and generated code, like MinHashSignature above.
  */
case class SignBits(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(SignBits.pack(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = org.apache.spark.sql.graft.SignBits.pack($c);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBits {
  /** Shared by interpreted eval and generated code. */
  def pack(arr: ArrayData): Array[Long] = {
    val n = arr.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (arr.getFloat(i) > 0f) words(i >>> 6) |= 1L << (i & 63)
      i += 1
    }
    words
  }
}

/** Hamming distance between two packed sign-bit vectors
  * (array<long> of words): Σ Long.bitCount(a[i] ^ b[i]) — the coarse
  * scoring kernel of binary ANN. Integer-exact, whole-stage codegen
  * (bitCount is an intrinsic popcount on every JVM that matters).
  * NULL on length mismatch, same contract as Int8Dot/L2SqLong.
  */
case class HammingWords(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |int ${ev.value} = 0;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  int $n = ${leftGen.value}.numElements();
        |  if ($n == ${rightGen.value}.numElements()) {
        |    int $acc = 0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      $acc += java.lang.Long.bitCount(
        |        ${leftGen.value}.getLong($i) ^ ${rightGen.value}.getLong($i));
        |    }
        |    ${ev.isNull} = false;
        |    ${ev.value} = $acc;
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Asymmetric binary score: the query (array<float>) scored against
  * a packed sign-bit corpus vector (array<long> words) —
  * Σ_d (bit d set ? +m_d : -m_d) with m_d = floor(q_d·1e6), i.e.
  * dot(micro-quantized q, sign(c)). Every corpus sign vector has the
  * same norm (√dims), so ranking by this raw dot equals ranking by
  * cosine against the binarized corpus — no normalization term.
  * Keeps (micro-precision of) the query's magnitudes at ZERO extra
  * index memory, which is why asymmetric scoring is the standard
  * recall upgrade over symmetric hamming in binary ANN (same trick
  * as PQ's asymmetric distance computation). The micro quantization
  * makes the score a LONG — exact, order-independent, engine-portable
  * (the repo's integer-coarse-stage posture: Int8Dot/HammingWords/
  * L2SqLong) — at a recall cost that is zero in practice (1e-6 of
  * unit-scale components).
  */
case class SignDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]
    val w = r.asInstanceOf[ArrayData]
    val n = q.numElements()
    if (w.numElements() != (n + 63) >>> 6) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      val m = math.floor(q.getFloat(i).toDouble * 1e6).toLong
      acc += (if (((w.getLong(i >>> 6) >>> (i & 63)) & 1L) != 0L) m else -m)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val m = ctx.freshName("m")
    val code =
      code"""
        |${leftGen.code}
        |${rightGen.code}
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = 0L;
        |if (!${leftGen.isNull} && !${rightGen.isNull}) {
        |  int $n = ${leftGen.value}.numElements();
        |  if (${rightGen.value}.numElements() == (($n + 63) >>> 6)) {
        |    long $acc = 0L;
        |    for (int $i = 0; $i < $n; $i++) {
        |      long $m = (long) java.lang.Math.floor(
        |        (double) ${leftGen.value}.getFloat($i) * 1.0E6);
        |      $acc += ((${rightGen.value}.getLong($i >>> 6) >>> ($i & 63)) & 1L) != 0L
        |              ? $m : -$m;
        |    }
        |    ${ev.isNull} = false;
        |    ${ev.value} = $acc;
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
