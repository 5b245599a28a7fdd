package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType}

/** Column builders for graft's native Catalyst expressions.
  *
  * Built on `StaticInvoke` (the codegen-capable object-invocation expression
  * Spark itself uses for e.g. DateTimeUtils calls): the generated code is a
  * direct static call into the helper object, so projections using these
  * columns stay inside whole-stage codegen — no UDF serialization, no
  * row-boxing.
  */
object Native {

  /** `array(mh0..mh{nSeeds-1})` of per-seed min-MD5 MinHash signatures over
    * character 8-gram windows of `textCol`; exact drop-in for the
    * array_min/transform/sequence SQL form (see [[GraftHash.minhashSigs]]).
    * Null text propagates to a null array (matching md5(null) → array_min of
    * nulls → null per component in the SQL form).
    */
  def minhashSigs(textCol: String, nSeeds: Int): Column =
    GraftColumn(StaticInvoke(
      GraftHash.getClass,
      ArrayType(StringType, containsNull = false),
      "minhashSigs",
      Seq(UnresolvedAttribute(textCol), Literal(nSeeds)),
      Seq(StringType, IntegerType),
      propagateNull = true,
      returnNullable = false))

  /** 16-bit SimHash over the token multiset of `textCol` in one pass — the
    * d03 explode → vote-groupBy → bit-sum pipeline without any shuffle
    * (see [[GraftHash.simhash16]]).
    */
  def simhash16(textCol: String): Column =
    GraftColumn(StaticInvoke(
      GraftHash.getClass,
      LongType,
      "simhash16",
      Seq(UnresolvedAttribute(textCol)),
      Seq(StringType),
      propagateNull = true,
      returnNullable = false))

  /** Dense hashing-trick token-count vector (dim slots) of `textCol` in one
    * pass — d06's token explode → (doc, slot) groupBy → densify pipeline
    * without any shuffle (see [[GraftHash.tokenCountVec]]).
    */
  def tokenCountVec(textCol: String, dim: Int): Column =
    GraftColumn(StaticInvoke(
      GraftHash.getClass,
      ArrayType(LongType, containsNull = false),
      "tokenCountVec",
      Seq(UnresolvedAttribute(textCol), Literal(dim)),
      Seq(StringType, IntegerType),
      propagateNull = true,
      returnNullable = false))

  /** Per-band signed-hyperplane LSH buckets over a dense count-vector column
    * — d06's broadcast planes join + two groupBys collapsed into one in-row
    * integer computation (see [[GraftHash.embBuckets]]).
    */
  def embBuckets(vecCol: String, nBands: Int, nPlanes: Int): Column =
    GraftColumn(StaticInvoke(
      GraftHash.getClass,
      ArrayType(LongType, containsNull = false),
      "embBuckets",
      Seq(UnresolvedAttribute(vecCol), Literal(nBands), Literal(nPlanes)),
      Seq(ArrayType(LongType), IntegerType, IntegerType),
      propagateNull = true,
      returnNullable = false))
}
