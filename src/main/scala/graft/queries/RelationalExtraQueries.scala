package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.SkewJoin

/** Tier C widening — the rest of the function families SURVEY §2.3
  * enumerates inside C11/C16/C17/C26-C28 (rank family, lead/first/
  * last, min/max + stddev + percentile aggregates, more string/date
  * functions, decimal arithmetic, conditional pivot). Same oracle
  * discipline as [[RelationalQueries]].
  */
object RelationalExtraQueries {

  def defs: Map[String, QueryDef] = Map(

    // C11b: min/max + stddev + exact interpolated median.
    "c11b_agg_stats" -> QueryDef(
      """SELECT l_returnflag,
        |       ROUND(MIN(l_extendedprice), 4) AS mn,
        |       ROUND(MAX(l_extendedprice), 4) AS mx,
        |       ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd,
        |       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS med
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(min("l_extendedprice"), 4).as("mn"),
          round(max("l_extendedprice"), 4).as("mx"),
          round(stddev_samp(col("l_extendedprice")), 4).as("sd"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("med"))
        .orderBy("l_returnflag")
    },

    // C11c: correlation/covariance, boolean aggregates, and ordered
    // distinct string aggregation.
    "c11c_agg_misc" -> QueryDef(
      """SELECT l_returnflag,
        |       ROUND(CORR(l_quantity, l_extendedprice), 6) AS cr,
        |       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS cv,
        |       BOOL_AND(l_quantity > 0) AS all_pos,
        |       BOOL_OR(l_discount > 0.09) AS any_hi,
        |       array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS sts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("cr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cv"),
          every(col("l_quantity") > 0).as("all_pos"),
          some(col("l_discount") > 0.09).as("any_hi"),
          array_join(array_sort(array_distinct(collect_list(col("l_linestatus")))),
            ",").as("sts"))
        .orderBy("l_returnflag")
    },

    // C16b: rank / dense_rank / ntile (BIGINT to match DuckDB).
    "c16b_rank_family" -> QueryDef(
      """SELECT o_orderkey,
        |       RANK() OVER w AS rk,
        |       DENSE_RANK() OVER w AS drk,
        |       NTILE(4) OVER w AS nt
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          rank().over(w).cast("long").as("rk"),
          dense_rank().over(w).cast("long").as("drk"),
          ntile(4).over(w).cast("long").as("nt"))
        .orderBy("o_orderkey")
    },

    // C16c: fractional ranks (percent_rank / cume_dist) — +0.0 after
    // ROUND on both sides normalizes the rank-1 row's zero sign.
    "c16c_fractional_ranks" -> QueryDef(
      """SELECT o_orderkey,
        |       ROUND(PERCENT_RANK() OVER w, 6) + 0.0 AS pr,
        |       ROUND(CUME_DIST() OVER w, 6) + 0.0 AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          (round(percent_rank().over(w), 6) + lit(0.0)).as("pr"),
          (round(cume_dist().over(w), 6) + lit(0.0)).as("cd"))
        .orderBy("o_orderkey")
    },

    // C17b: lead / first_value / last_value with an explicit frame.
    "c17b_lead_first_last" -> QueryDef(
      """SELECT event_id,
        |       LEAD(event_type) OVER w AS nxt,
        |       FIRST_VALUE(event_type) OVER w AS fst,
        |       LAST_VALUE(event_type) OVER
        |         (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lst
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "events")
        .select(col("event_id"),
          lead(col("event_type"), 1).over(w).as("nxt"),
          first(col("event_type")).over(w).as("fst"),
          last(col("event_type")).over(wAll).as("lst"))
        .orderBy("event_id")
    },

    // C26b: more string functions.
    "c26b_string_fns2" -> QueryDef(
      """SELECT doc_id,
        |       LPAD(SUBSTR(text, 1, 5), 8, '*') AS lp,
        |       REVERSE(SUBSTR(text, 1, 8)) AS rv,
        |       CAST(STRPOS(text, 'a') AS BIGINT) AS ps,
        |       LEFT(text, 6) AS lf,
        |       SPLIT_PART(text, ' ', 2) AS sp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          lpad(substring(col("text"), 1, 5), 8, "*").as("lp"),
          reverse(substring(col("text"), 1, 8)).as("rv"),
          instr(col("text"), "a").cast("long").as("ps"),
          substring(col("text"), 1, 6).as("lf"),
          element_at(split(col("text"), " "), 2).as("sp"))
        .orderBy("doc_id")
    },

    // C26c: regexp functions.
    "c26c_regexp_fns" -> QueryDef(
      """SELECT doc_id,
        |       regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |       CAST(LENGTH(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS vg,
        |       regexp_replace(text, '[aeiou]', '_', 'g') LIKE '%__%' AS dbl
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          size(expr("regexp_extract_all(text, '[aeiou]+', 0)")).cast("long")
            .as("vg"),
          regexp_replace(col("text"), "[aeiou]", "_").like("%__%").as("dbl"))
        .orderBy("doc_id")
    },

    // C29b: the rest of the array family — sort, slice, contains,
    // flatten, zip-style transform (1-based slicing in both engines).
    "c29b_array_fns2" -> QueryDef(
      """SELECT vec_id,
        |       ROUND(CAST(list_sort(embedding)[1] AS DOUBLE), 6) AS smallest,
        |       ROUND(CAST(embedding[2:4][1] AS DOUBLE), 6) AS s1,
        |       list_contains(embedding, embedding[1]) AS has_first,
        |       CAST(LENGTH(flatten([embedding, embedding])) AS BIGINT) AS fl,
        |       ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)), 6) AS dbl
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          round(element_at(sort_array(col("embedding")), 1).cast("double"), 6)
            .as("smallest"),
          round(element_at(slice(col("embedding"), 2, 3), 1).cast("double"), 6)
            .as("s1"),
          array_contains(col("embedding"), element_at(col("embedding"), 1))
            .as("has_first"),
          size(flatten(array(col("embedding"), col("embedding")))).cast("long")
            .as("fl"),
          round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * 2), 6).as("dbl"))
        .orderBy("vec_id")
    },

    // C27b: date arithmetic (dow normalized to DuckDB's Sunday=0).
    "c27b_date_arith" -> QueryDef(
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) + 30 AS plus30,
        |       last_day(CAST(o_orderdate AS DATE)) AS eom,
        |       CAST(EXTRACT(DOW FROM o_orderdate) AS INTEGER) AS dw,
        |       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          last_day(col("o_orderdate").cast("date")).as("eom"),
          (dayofweek(col("o_orderdate")) - 1).as("dw"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .cast("long").as("dd"))
        .orderBy("o_orderkey")
    },

    // C28b: power / mod / ceil / exp / sign.
    "c28b_math_fns2" -> QueryDef(
      """SELECT l_orderkey, l_linenumber,
        |       ROUND(POWER(l_discount + 1.0, 3), 6) AS pw,
        |       CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS md,
        |       CAST(CEIL(l_quantity) AS BIGINT) AS cl,
        |       ROUND(EXP(l_discount), 6) AS ex,
        |       CAST(SIGN(l_quantity - 25) AS DOUBLE) AS sg
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(pow(col("l_discount") + 1.0, 3), 6).as("pw"),
          (col("l_quantity").cast("long") % 7).as("md"),
          ceil(col("l_quantity")).cast("long").as("cl"),
          round(exp(col("l_discount")), 6).as("ex"),
          signum(col("l_quantity") - 25).cast("double").as("sg"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // C32b: decimal arithmetic (SURVEY §1.2 — both target stores are
    // decimal-capable). The aggregation stays fixed-point (exact); the
    // OUTPUT is cast to double on both sides because the oracle harness
    // hashes DuckDB float64 against Spark decimal128 and the
    // stringification differs even when values are equal.
    "c32b_decimal" -> QueryDef(
      """SELECT o_orderstatus,
        |       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS tot,
        |       ROUND(CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS mn
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("tot"),
          round(min(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double"), 2).as("mn"))
        .orderBy("o_orderstatus")
    },

    // C38: salted skew join — the result must be ROW-IDENTICAL to the
    // plain inner join (the oracle runs the plain join; the Spark side
    // runs the salted physical shape with salt=8). PlanSpec pins the
    // physical contract (a shuffled join keyed on (key, __salt), no
    // broadcast).
    "c38_skew_join_salted" -> QueryDef(
      """SELECT l_orderkey, l_linenumber, l_partkey, p_name,
        |       ROUND(p_retailprice, 2) AS rp
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, p_name, rp""".stripMargin) { (s, dir) =>
      SkewJoin.salted(
          Tables(s, dir, "lineitem"), "l_partkey",
          Tables(s, dir, "part").select("p_partkey", "p_name", "p_retailprice"),
          "p_partkey", salt = 8)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("p_name"), round(col("p_retailprice"), 2).as("rp"))
        // (orderkey, linenumber) is NOT unique in the synthetic data —
        // order by every output column so the order is total
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "p_name", "rp")
    },

    // C14c: conditional aggregation pivot (orderstatus → columns).
    "c14c_pivot" -> QueryDef(
      """SELECT o_orderpriority,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o,
        |       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f"),
          coalesce(col("O"), lit(0L)).as("o"),
          coalesce(col("P"), lit(0L)).as("p"))
        .orderBy("o_orderpriority")
    }
  )
}
