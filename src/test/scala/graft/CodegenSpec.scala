package graft

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft._
import org.apache.spark.sql.types._

/** Locks the no-CodegenFallback property of every native graft
  * expression: each one must carry a real doGenCode so the scan stages
  * that host them (dedup shingling, kNN scoring, text profiling) stay
  * inside whole-stage codegen. A regression to CodegenFallback would
  * still be CORRECT — these tests exist to keep the plan quality, not
  * the answers.
  */
class CodegenSpec extends SparkSpec {

  private val longArr = Literal.create(Seq(1L, 2L, 3L), ArrayType(LongType))
  private val floatArr = Literal.create(Seq(1.0f, 2.0f), ArrayType(FloatType))
  private val doubleArr = Literal.create(Seq(0.5, 0.5), ArrayType(DoubleType))
  private val byteArr = Literal.create(Seq(1.toByte, 2.toByte), ArrayType(ByteType))
  private val str = Literal.create("hello world", StringType)

  private val all: Seq[(String, Expression)] = Seq(
    "PolyFingerprint64" -> PolyFingerprint64(str),
    "MinHashSignature" -> MinHashSignature(longArr, 8),
    "ShingleHashes" -> ShingleHashes(longArr, 3),
    "ShingleHashesPos" -> ShingleHashes(longArr, 3, dedup = false),
    "MinHashBandHashes" -> MinHashBandHashes(longArr, 8, 4),
    "SimHash64" -> SimHash64(longArr),
    "PigeonholeSplit" -> PigeonholeSplit(Literal.create(7L, LongType),
      Literal.create(0L, LongType), 7, 0 until 64),
    "HyperplaneSig" -> HyperplaneSig(floatArr, 16),
    "CosineSimF" -> CosineSimF(floatArr, floatArr),
    "TextProfile" -> TextProfile(str),
    "TokenFnvHashes" -> TokenFnvHashes(str),
    "QuantizeI8" -> QuantizeI8(floatArr, doubleArr),
    "Int8Dot" -> Int8Dot(byteArr, byteArr),
    "L2SqLong" -> L2SqLong(longArr, longArr),
    "SignBits" -> SignBits(floatArr),
    "HammingWords" -> HammingWords(longArr, longArr),
    "SignDot" -> SignDot(floatArr, longArr),
    "BucketCounts" -> BucketCounts(longArr, 16)
  )

  test("no graft expression is a CodegenFallback") {
    val fallbacks = all.collect { case (n, e) if e.isInstanceOf[CodegenFallback] => n }
    assert(fallbacks.isEmpty,
      s"expressions regressed to interpreted-only: ${fallbacks.mkString(", ")}")
  }

  test("a scan projecting the hash chain executes inside WholeStageCodegen") {
    import graft.functions._
    // spark.range (not a local Seq): ConvertToLocalRelation would
    // constant-fold a LocalRelation source away before execution
    val df = spark.range(2)
      .select(concat(lit("the quick brown fox "), col("id")).as("text"))
      .select(
        poly_fingerprint64(lower(col("text"))).as("fp"),
        simhash64(token_fnv_hashes(lower(col("text")))).as("sh"),
        minhash_band_hashes(
          shingle_hashes(token_fnv_hashes(lower(col("text"))), 2), 16, 4).as("bands"),
        text_profile(col("text")).as("prof"))
    val executed = df.queryExecution.executedPlan
    val wsc = executed.collect { case w: WholeStageCodegenExec => w }
    assert(wsc.nonEmpty, s"no WholeStageCodegen span in:\n$executed")
    // the projection carrying the graft expressions must be INSIDE a
    // codegen span, not hoisted out of one
    val hostsGraft = wsc.exists(_.collect {
      case p: org.apache.spark.sql.execution.ProjectExec => p
    }.exists(_.projectList.exists(_.exists {
      case _: PolyFingerprint64 => true
      case _ => false
    })))
    assert(hostsGraft, s"hash-chain projection not inside a codegen span:\n$executed")
    // and the whole thing still evaluates
    assert(df.count() == 2)
  }
}
