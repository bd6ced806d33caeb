package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bloom bitset membership probe: true iff EVERY position in `left`
  * (array<int>, the key's pre-computed probe positions) has its bit
  * set in `right` (array<bigint>, the bitset as 64-bit words —
  * position p lives at bit p%64 of word p/64).
  *
  * Semantically identical to the conjunction
  * `element_at(words, p/64 + 1) & shiftleft(1L, p%64) <> 0` over all
  * probes, but with the words literal appearing ONCE in the plan
  * instead of once per probe: at the sizing cap (2^27 bits = 16 MiB)
  * the per-probe form serialized nHash copies of the bitset into the
  * task binary (measured 104 MiB broadcasts at 7 probes in the sf10
  * rehearsal), where this kernel carries one. The probe loop is also
  * a single codegen'd short-circuit loop instead of nHash chained
  * element_at/shiftleft expression evaluations.
  *
  * NULL in, NULL out (callers guard key NULLs explicitly —
  * [[graft.operators.BloomFilterJoin.BloomBits.mightContain]]).
  * Out-of-range positions are a caller bug (positions are pmod'ed by
  * mBits); the interpreter would throw, matching element_at's
  * strict-indexing behavior.
  */
case class BloomTest(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_test expects (array<int> positions, array<bigint> words), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_bloom_test"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val pos = l.asInstanceOf[ArrayData]
    val words = r.asInstanceOf[ArrayData]
    val n = pos.numElements()
    var i = 0
    while (i < n) {
      val p = pos.getInt(i)
      if ((words.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pos, words) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |int $n = $pos.numElements();
         |${ev.value} = true;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $p = $pos.getInt($i);
         |  if (($words.getLong($p >>> 6) & (1L << ($p & 63))) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomTest {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomTest].getCanonicalName, null, "graft_bloom_test",
    "graft_bloom_test(positions, words) - true iff every probe position's bit is set in the bitset words", "")

  val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => BloomTest(a, b)
    case args => throw new IllegalArgumentException(
      s"graft_bloom_test expects 2 arguments, got ${args.length}")
  }
}
