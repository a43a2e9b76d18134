package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed as-of join (SURVEY C10's general form): for every left row,
  * the payload of the LATEST right row with `right.ts <= left.ts`
  * (or `<` when strict), equi-matched on `keys` first.
  *
  * Scale shape — the classic union + carry-forward window: both sides
  * union into one frame tagged by side, ONE shuffle partitions it by
  * the join keys, and a single ordered window carries the last seen
  * right-side payload forward onto each left row. No range predicate,
  * no nested loop, no per-row probing; cost is a sort within each key
  * partition. (The keyless day-grain variant used by the c10
  * conformance query instead densifies a calendar dimension —
  * appropriate when there is no key to partition by.)
  */
object AsOfJoin {

  /** Left rows plus `payload` columns from the as-of-latest right row
    * (null when no right row precedes). Column names of `left` and
    * the selected right columns must be disjoint apart from `keys`.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asOf requires at least one equi-key")
    val reserved = Seq("__ts", "__side", "__tb", "__p")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"${reserved.mkString("/")} are reserved by asOf")
    val clash = (left.columns.toSet -- keys) intersect payload.toSet
    require(clash.isEmpty,
      s"left columns ${clash.mkString(", ")} collide with payload columns " +
        "— rename one side before the as-of join")

    // at equal ts the right row is visible to the left row unless
    // strict: encode visibility in the side sort order
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)

    val rightSchema = right.schema
    val l2 = payload.foldLeft(
      left.withColumn("__ts", col(leftTs))
        .withColumn("__side", lit(leftSide))) { (df, p) =>
      df.withColumn(p, lit(null).cast(rightSchema(p).dataType))
    }
    val leftOnly = left.columns.filterNot(c => keys.contains(c))
    val r2 = leftOnly.foldLeft(
      right.select((keys ++ payload).map(col) :+ col(rightTs).as("__ts"): _*)
        .withColumn("__side", lit(rightSide))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    // Deterministic tie resolution: with several right rows at the same
    // (key, ts) the window order alone would pick an arbitrary one
    // (varies across runs/partitionings). A payload-hash tiebreak makes
    // the winner a pure function of the data: the row whose payload
    // hash sorts last. Left rows sort as 0 — their relative order never
    // matters (each carries its own output row).
    val withTb = (df: DataFrame, isRight: Boolean) =>
      if (isRight) df.withColumn("__tb", xxhash64(payload.map(col): _*))
      else df.withColumn("__tb", lit(0L))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the whole payload as ONE struct (null on left rows) so all
    // columns come from the same right row even if some payload values
    // are null
    val carried = withTb(l2, false).unionByName(withTb(r2, true))
      .withColumn("__p",
        last(when(col("__side") === rightSide,
            struct(payload.map(col): _*)),
          ignoreNulls = true).over(w))
    carried
      .filter(col("__side") === leftSide)
      .select(left.columns.map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }
}
