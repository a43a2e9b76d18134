package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass language-profile scoring kernel (SURVEY D4 lang-ID).
  *
  * The Column-level formulation — `transform` over a profile-table
  * literal with a nested `filter`/`array_contains` per profile — does
  * not participate in codegen (higher-order functions are interpreted)
  * and re-walks the unit array once per profile: ~10 ms/row on
  * trigram arrays of ~1500 entries. This kernel walks the text ONCE
  * and probes each unit against every profile's hash set: O(len × P)
  * native hash lookups, ~1000× less interpreter overhead.
  */
object ProfileOps {

  /** Parsed profile sets, cached per spec string: the spec is a query
    * literal, so the parse runs once per executor, not per row.
    * Format: profiles joined by '|', units within a profile by ','.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[java.util.HashSet[String]]]()

  private def sets(spec: String): Array[java.util.HashSet[String]] =
    cache.computeIfAbsent(spec, s =>
      s.split('|').map { p =>
        val set = new java.util.HashSet[String]()
        p.split(',').foreach(u => if (u.nonEmpty) set.add(u))
        set
      })

  /** Hit count per profile in one pass. `mode` 0: lowercase
    * whitespace words; 1: lowercase character trigrams (with spaces —
    * word-boundary signal, matching profile entries like " th").
    */
  def profileScores(text: UTF8String, spec: UTF8String, mode: Int): ArrayData = {
    val ps = sets(spec.toString)
    val counts = new Array[Int](ps.length)
    if (mode == 0) {
      val words = HashOps.tokenize(text.toString)
      var i = 0
      while (i < words.length) {
        var p = 0
        while (p < ps.length) {
          if (ps(p).contains(words(i))) counts(p) += 1
          p += 1
        }
        i += 1
      }
    } else {
      val s = text.toString.toLowerCase(java.util.Locale.ROOT)
      var i = 0
      while (i + 3 <= s.length) {
        val g = s.substring(i, i + 3)
        var p = 0
        while (p < ps.length) {
          if (ps(p).contains(g)) counts(p) += 1
          p += 1
        }
        i += 1
      }
    }
    new GenericArrayData(counts)
  }
}

/** `profile_scores(text, spec, mode)` → ARRAY<INT>: per-profile hit
  * counts (spec = "u1,u2,...|u1,u2,..."; mode 0 = words,
  * 1 = character trigrams). The argmax over the resulting (small,
  * fixed-size) score array stays in Column land, where tie semantics
  * are explicit.
  */
case class ProfileScores(
    first: Expression,
    second: Expression,
    third: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def prettyName: String = "profile_scores"
  override def inputTypes = Seq(StringType, StringType, IntegerType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, s: Any, m: Any): Any =
    ProfileOps.profileScores(t.asInstanceOf[UTF8String],
      s.asInstanceOf[UTF8String], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = ProfileOps.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev,
      (t, s, m) => s"${ev.value} = $ops.profileScores($t, $s, $m);")
  }

  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
}
