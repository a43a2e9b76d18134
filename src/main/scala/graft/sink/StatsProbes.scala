package graft.sink

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.types._

import graft.sink.ManifestTableFormat.{ExactCmp, ExactNull, ExactProbe, NullTest, NumRange, StatsProbe, StrRange, UrlIn}

/** Catalyst expression → [[ManifestTableFormat.StatsProbe]]
  * extraction, shared by the SQL scan path
  * (`ManifestStatsScanBuilder`, resolved `Attribute` leaves) and the
  * DML pre-scan path (`update`/`deleteWhere` conditions, which may
  * carry single-part `UnresolvedAttribute` leaves).
  *
  * Soundness contract: a probe is emitted ONLY for a bare column
  * leaf compared to a literal OF THE COLUMN'S EXACT TYPE (resolved
  * through `typeOf`, which also canonicalizes the column name to the
  * schema's spelling — the stats arrays are keyed by it). The
  * literal renders through the SAME canonical-string mapping the
  * stats write side uses, so the later shared-grid comparison is
  * monotone. Anything unextractable simply yields no probe — the
  * caller's pruning is fail-open by construction.
  */
object StatsProbes {

  /** Cap on [[ManifestTableFormat.ValuesIn]] emission: beyond this
    * many IN-values only the min/max envelope survives (bounds the
    * per-file bloom-test expression a huge runtime key set would
    * otherwise build).
    */
  val maxValuesInProbe = 256


  /** `typeOf(name)` resolves a column reference to its canonical
    * schema name + type, or None when unknown.
    */
  def extract(
      conjuncts: Seq[Expression],
      typeOf: String => Option[(String, DataType)]): Seq[StatsProbe] =
    conjuncts.flatMap(split).flatMap(probe(_, typeOf))

  /** EXACT extraction for the metadata-only DELETE lane — the
    * FAIL-CLOSED mirror of [[extract]]: returns `Some(probes)` only
    * when EVERY conjunct converts losslessly to an
    * [[ManifestTableFormat.ExactProbe]] (numeric-kind column vs
    * same-type literal comparison, or IS [NOT] NULL), so "every row
    * of this file satisfies the predicate" is provable from per-file
    * stats alone. Any other shape — string comparisons (truncated
    * stats), IN lists, ORs, expressions over columns — yields `None`
    * and the caller reads the file.
    */
  def extractExact(
      conjuncts: Seq[Expression],
      typeOf: String => Option[(String, DataType)])
      : Option[Seq[ExactProbe]] = {
    val parts = conjuncts.flatMap(split)
    val probes = parts.map(exactProbe(_, typeOf))
    if (probes.exists(_.isEmpty)) None else Some(probes.flatten)
  }

  /** Kinds whose canonical-string stats grid is INJECTIVE (distinct
    * values render to distinct grid points), so non-strict bounds and
    * equality are provable; float kinds prove only strict grid
    * inequalities (two doubles can collide on the DECIMAL(38,18)
    * grid).
    */
  private def exactGridKind(t: DataType): Boolean = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: DateType | _: TimestampType | _: BooleanType => true
    case _ => false
  }

  private def exactProbe(e: Expression,
      typeOf: String => Option[(String, DataType)]): Option[ExactProbe] = {
    def side(l: Expression, r: Expression, op: String, flipped: String)
        : Option[ExactProbe] =
      cmp(l, r, typeOf).collect {
        case (n, t, v) if isNumKind(t) && !t.isInstanceOf[DecimalType] =>
          ExactCmp(n, op, v, exactGridKind(t))
      }.orElse(cmp(r, l, typeOf).collect {
        case (n, t, v) if isNumKind(t) && !t.isInstanceOf[DecimalType] =>
          ExactCmp(n, flipped, v, exactGridKind(t))
      })
    e match {
      case GreaterThan(l, r) => side(l, r, "gt", "lt")
      case GreaterThanOrEqual(l, r) => side(l, r, "ge", "le")
      case LessThan(l, r) => side(l, r, "lt", "gt")
      case LessThanOrEqual(l, r) => side(l, r, "le", "ge")
      case EqualTo(l, r) => side(l, r, "eq", "eq")
      case EqualNullSafe(l, r) => side(l, r, "eq", "eq")
      case IsNull(lf) =>
        leafName(lf).flatMap(typeOf).map { case (n, _) =>
          ExactNull(n, isNull = true) }
      case IsNotNull(lf) =>
        leafName(lf).flatMap(typeOf).map { case (n, _) =>
          ExactNull(n, isNull = false) }
      case _ => None
    }
  }

  private def split(e: Expression): Seq[Expression] = normalize(e) match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  /** The Spark 4 Column API builds comparisons as
    * `UnresolvedFunction(">", …)` nodes, not the catalyst comparison
    * classes — rewrite the handful of shapes the probes understand
    * (one level deep; arguments normalize recursively so nested
    * `and`s flatten). Unknown functions pass through untouched and
    * simply yield no probe.
    */
  private[sink] def normalize(e: Expression): Expression = e match {
    case f: UnresolvedFunction if f.nameParts.length == 1 =>
      val as = f.arguments.map(normalize)
      (f.nameParts.head.toLowerCase, as) match {
        case (">", Seq(l, r)) => GreaterThan(l, r)
        case (">=", Seq(l, r)) => GreaterThanOrEqual(l, r)
        case ("<", Seq(l, r)) => LessThan(l, r)
        case ("<=", Seq(l, r)) => LessThanOrEqual(l, r)
        case ("=" | "==", Seq(l, r)) => EqualTo(l, r)
        case ("<=>", Seq(l, r)) => EqualNullSafe(l, r)
        case ("and", Seq(l, r)) => And(l, r)
        case ("isnull", Seq(l)) => IsNull(l)
        case ("isnotnull", Seq(l)) => IsNotNull(l)
        case ("in", l +: rest) if rest.nonEmpty => In(l, rest)
        case _ => e
      }
    case _ => e
  }

  /** A bare column leaf: resolved attribute or single-part
    * unresolved reference.
    */
  private def leafName(e: Expression): Option[String] = e match {
    case a: Attribute => Some(a.name)
    case u: UnresolvedAttribute if u.nameParts.length == 1 => Some(u.name)
    case _ => None
  }

  private def isUrl(canonical: String): Boolean =
    canonical.equalsIgnoreCase("document_url")

  /** The literal rendered EXACTLY as the stats write side renders the
    * column's values (`ManifestTableFormat.renderLo`/`statEncode`).
    */
  private def render(v: Any, t: DataType): Option[String] = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: DateType | _: TimestampType =>
      Some(String.valueOf(v)) // Date = epoch days Int, Ts = micros Long
    case _: BooleanType =>
      Some(if (v.asInstanceOf[Boolean]) "1" else "0")
    case _: FloatType | _: DoubleType => Some(String.valueOf(v))
    case _: DecimalType =>
      Some(v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toPlainString)
    case _: StringType => Some(v.toString)
    case _ => None
  }

  /** Types whose values order on the canonical-string stats grid —
    * i.e. columns min/max skipping (static or runtime) can prune on.
    */
  def statsOrderedKind(t: DataType): Boolean = isNumKind(t)

  private def isNumKind(t: DataType): Boolean = t match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType |
         _: DateType | _: TimestampType | _: BooleanType |
         _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }

  private def range(name: String, t: DataType,
      lo: Option[String], hi: Option[String]): Option[StatsProbe] =
    if (isNumKind(t)) Some(NumRange(name, lo, hi))
    else if (t.isInstanceOf[StringType]) Some(StrRange(name, lo, hi))
    else None

  /** A typed (canonical name, type, rendered literal) triple: the
    * leaf bare and the literal's type EXACTLY the column's.
    */
  private def cmp(l: Expression, r: Expression,
      typeOf: String => Option[(String, DataType)])
      : Option[(String, DataType, String)] = (l, r) match {
    case (lf, lit: Literal) if lit.value != null =>
      for {
        n <- leafName(lf)
        (canonical, t) <- typeOf(n)
        if t == lit.dataType
        s <- render(lit.value, t)
      } yield (canonical, t, s)
    case _ => None
  }

  private def probe(e: Expression,
      typeOf: String => Option[(String, DataType)]): Seq[StatsProbe] = {
    def c(l: Expression, r: Expression) = cmp(l, r, typeOf)
    e match {
      case EqualTo(l, r) => eqProbes(l, r, typeOf) ++ eqProbes(r, l, typeOf)
      case EqualNullSafe(l, r) =>
        eqProbes(l, r, typeOf) ++ eqProbes(r, l, typeOf)
      case GreaterThan(l, r) =>
        c(l, r).toSeq.flatMap { case (n, t, v) => range(n, t, Some(v), None) } ++
          c(r, l).toSeq.flatMap { case (n, t, v) => range(n, t, None, Some(v)) }
      case GreaterThanOrEqual(l, r) =>
        c(l, r).toSeq.flatMap { case (n, t, v) => range(n, t, Some(v), None) } ++
          c(r, l).toSeq.flatMap { case (n, t, v) => range(n, t, None, Some(v)) }
      case LessThan(l, r) =>
        c(l, r).toSeq.flatMap { case (n, t, v) => range(n, t, None, Some(v)) } ++
          c(r, l).toSeq.flatMap { case (n, t, v) => range(n, t, Some(v), None) }
      case LessThanOrEqual(l, r) =>
        c(l, r).toSeq.flatMap { case (n, t, v) => range(n, t, None, Some(v)) } ++
          c(r, l).toSeq.flatMap { case (n, t, v) => range(n, t, Some(v), None) }
      case IsNull(lf) =>
        leafName(lf).flatMap(typeOf).map { case (n, _) =>
          NullTest(n, isNull = true) }.toSeq
      case IsNotNull(lf) =>
        leafName(lf).flatMap(typeOf).map { case (n, _) =>
          NullTest(n, isNull = false) }.toSeq
      case In(lf, vs) =>
        (for {
          n <- leafName(lf)
          (canonical, t) <- typeOf(n)
        } yield inProbes(canonical, t, vs)).getOrElse(Nil)
      case InSet(lf, hset) if hset.nonEmpty && !hset.contains(null) =>
        (for {
          n <- leafName(lf)
          (canonical, t) <- typeOf(n)
          if isUrl(canonical) && t.isInstanceOf[StringType]
        } yield Seq(UrlIn(hset.toSeq.map(String.valueOf)): StatsProbe))
          .getOrElse(Nil)
      case _ => Seq.empty
    }
  }

  /** Both sides of an equality, orientation-normalized: a degenerate
    * range probe, and for `document_url` additionally a bloom probe.
    */
  private def eqProbes(l: Expression, r: Expression,
      typeOf: String => Option[(String, DataType)]): Seq[StatsProbe] =
    cmp(l, r, typeOf).toSeq.flatMap { case (n, t, v) =>
      range(n, t, Some(v), Some(v)).toSeq ++
        (if (isUrl(n)) Seq(UrlIn(Seq(v))) else Nil)
    }

  /** IN probes: a url bloom probe for string url IN-lists; a sound
    * [min,max] superset range for integral IN-lists (integral
    * ordering matches the canonical-string-decimal grid).
    */
  private def inProbes(canonical: String, t: DataType,
      vs: Seq[Expression]): Seq[StatsProbe] = {
    val lits = vs.collect { case l: Literal if l.value != null &&
      l.dataType == t => l.value }
    if (lits.size != vs.size || lits.isEmpty) Nil
    else if (isUrl(canonical) && t.isInstanceOf[StringType])
      Seq(UrlIn(lits.map(_.toString)))
    else {
      // point-SET probe for the v9 per-column blooms, capped so a
      // runtime DPP key set cannot blow up the pruning expression
      def pointSet(rendered: Seq[String]): Seq[StatsProbe] =
        if (rendered.size <= maxValuesInProbe)
          Seq(ManifestTableFormat.ValuesIn(canonical, rendered))
        else Nil
      t match {
        case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
          val nums = lits.map(_.asInstanceOf[Number].longValue)
          Seq(NumRange(canonical,
            Some(nums.min.toString), Some(nums.max.toString))) ++
            pointSet(nums.map(_.toString))
        case _: StringType =>
          // non-url strings had no IN probe at all before v9: the
          // envelope stays absent (truncated stat bounds make string
          // ranges a separate lane), the point set stands alone
          pointSet(lits.map(_.toString))
        case _ => Nil
      }
    }
  }
}
