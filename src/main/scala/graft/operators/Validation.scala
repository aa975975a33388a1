package graft.operators

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality validation operators, re-expressed Spark-first.
  *
  * Reference semantics: validate.py:87-172 — empty-input guard, per-field
  * null checks driven by schema nullability, referential-integrity left-anti
  * joins, and group-count duplicate detection. SURVEY.md §2.1-§2.3 keys
  * S4, P1-P3, P6, J1-J2, A1-A2, A8.
  *
  * Scale notes (100 TB):
  *  - The reference runs ONE Spark job per null-checked field
  *    (validate.py:108-129, ~20 scans). Here all per-field null counts fold
  *    into a single aggregate over one scan (`q_filter_isnull`) — one pass,
  *    map-side partial aggregation, no shuffle beyond the 1-row final agg.
  *  - Anti-joins declare plain `left_anti`; Catalyst broadcasts the dim side
  *    when small and AQE converts SMJ->BHJ at runtime otherwise. The distinct
  *    on the violating key is pushed below collect so only keys shuffle.
  *  - Emptiness guard uses a count aggregate (metadata-only on parquet via
  *    row-group counts) instead of materializing rows.
  */
object Validation {

  /** Columns of `orders` null-checked (the reference derives the list from
    * StructField.nullable, validate.py:108-129; all testdata columns are
    * non-nullable by generation so the expected counts are 0). */
  private val orderCols =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  def emptyGuard(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .agg(count(lit(1)).as("cnt"), (count(lit(1)) === 0).as("is_empty"))

  def countAction(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(count(lit(1)).as("lineitem_rows"))
      .crossJoin(Tables.orders(spark, dir).agg(count(lit(1)).as("orders_rows")))
      .crossJoin(Tables.part(spark, dir).agg(count(lit(1)).as("part_rows")))

  /** Single-pass null audit: one aggregate row, one column per checked field. */
  def nullAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).agg(
      count(when(col(orderCols.head).isNull, 1)).as(s"nulls_${orderCols.head}"),
      orderCols.tail.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c")): _*)

  /** SQL-string predicate on an aggregated frame (reference validate.py:160). */
  def filterExpr(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      .filter("cnt > 1")

  def projectDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(col("l_returnflag").as("returnflag")).distinct()

  /** Equality-to-literal filter (reference notebook cell 11). */
  def filterEqLit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_extendedprice"))

  /** FK check: fact keys with no matching dimension row (validate.py:135-144). */
  def antiFkProduct(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(p, li("l_partkey") === p("p_partkey"), "left_anti")
      .select(col("l_partkey").as("violating_partkey")).distinct()
  }

  /** FK check: items whose order header is missing (validate.py:147-156). */
  def antiFkOrder(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
      .select(col("l_orderkey").as("violating_orderkey")).distinct()
  }

  /** Duplicate primary keys in the header table (validate.py:160-164). */
  def dupOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Duplicate composite keys in the fact table (validate.py:168-172). */
  def dupItems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"), col("l_linenumber")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Declarative rule-table validation — the Deequ-style generalization of
    * the reference's validator. validate.py:104-175 runs ONE SPARK JOB PER
    * RULE (a count action each for nulls, RI, dups — ~12 scans of the
    * inputs); here the rule set is DATA, every rule compiles to a
    * conditional count in a single aggregate, and the whole contract
    * checks in ONE scan regardless of rule count. `stack` unpivots the
    * 1-row aggregate into the per-rule report. Adding a rule is a list
    * entry, not a new job. */
  final case class DqRule(rule: String, column: String,
      violation: Column, violationSql: String)

  private def lineitemRules: Seq[DqRule] = Seq(
    DqRule("not_null", "l_orderkey",
      col("l_orderkey").isNull, "l_orderkey IS NULL"),
    DqRule("non_negative", "l_extendedprice",
      col("l_extendedprice") < 0, "l_extendedprice < 0"),
    DqRule("in_range", "l_discount",
      col("l_discount") < 0 || col("l_discount") > 0.1,
      "l_discount < 0 OR l_discount > 0.1"),
    DqRule("in_set", "l_returnflag",
      !col("l_returnflag").isin("A", "N", "R"),
      "l_returnflag NOT IN ('A', 'N', 'R')"),
    DqRule("positive", "l_quantity",
      col("l_quantity") <= 0, "l_quantity <= 0"),
    DqRule("in_set", "l_linestatus",
      !col("l_linestatus").isin("O", "F"),
      "l_linestatus NOT IN ('O', 'F')"))

  def validateRules(spark: SparkSession, dir: String): DataFrame = {
    val rules = lineitemRules
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      count(when(r.violation, 1)).as(s"v$i")
    } :+ count(lit(1)).as("n")
    val one = Tables.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.rule}', '${r.column}', v$i"
    }.mkString(", ")
    one.select(expr(
        s"stack(${rules.length}, $stackArgs) AS (rule, column_name, violations)"),
        col("n").as("n_rows"))
      .withColumn("pass", col("violations") === 0)
      .orderBy(col("rule"), col("column_name"))
  }

  private val validateRulesSql = {
    val rules = lineitemRules
    val aggCols = rules.zipWithIndex.map { case (r, i) =>
      s"count(CASE WHEN ${r.violationSql} THEN 1 END) AS v$i"
    }.mkString(", ")
    val branches = rules.zipWithIndex.map { case (r, i) =>
      s"SELECT '${r.rule}' AS rule, '${r.column}' AS column_name, v$i AS violations, n AS n_rows, v$i = 0 AS pass FROM agg"
    }.mkString("\nUNION ALL\n")
    s"""WITH agg AS (SELECT $aggCols, count(*) AS n FROM lineitem)
       |$branches
       |ORDER BY rule, column_name""".stripMargin
  }

  /** k-anonymity audit — the governance twin of the PII scan: any
    * quasi-identifier combination shared by FEWER than k individuals can
    * re-identify them, so a release gate lists (and usually suppresses)
    * those combos. One hash aggregate on the quasi-identifier tuple, a
    * HAVING, and a top-level rollup — the same group-count shape as the
    * reference's duplicate check (validate.py:160-172), pointed at
    * privacy. */
  val KAnon = 8

  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < KAnon)
      .orderBy(col("nationkey"), col("mktsegment"))

  private val kAnonymitySql =
    s"""SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
       |  count(*) AS group_size
       |FROM customer
       |GROUP BY 1, 2
       |HAVING count(*) < $KAnon
       |ORDER BY 1, 2""".stripMargin

  /** l-diversity audit — k-anonymity's sharper sibling: a
    * quasi-identifier group can be large (k-anonymous) yet still leak a
    * sensitive attribute if every member SHARES the value (the
    * "homogeneity attack", Machanavajjhala et al. 2007). Sensitive
    * attribute here: account standing (delinquent = negative balance).
    * Lists every QI group whose distinct sensitive-value count is below
    * l = 2, with the value it leaks. Same one-hash-aggregate shape as
    * the k-anonymity gate — scan-speed at any SF. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val sens = when(col("c_acctbal") < 0, "delinquent").otherwise("good")
    Tables.customer(spark, dir)
      .select(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"), sens.as("sens"))
      .groupBy(col("nationkey"), col("mktsegment"))
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col("sens")).as("n_sensitive"),
        min(col("sens")).as("leaked_value"))
      .filter(col("n_sensitive") < 2)
      .orderBy(col("nationkey"), col("mktsegment"))
  }

  private val lDiversitySql =
    """WITH s AS (SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
      |    CASE WHEN c_acctbal < 0 THEN 'delinquent' ELSE 'good' END AS sens
      |  FROM customer)
      |SELECT nationkey, mktsegment, count(*) AS group_size,
      |  count(DISTINCT sens) AS n_sensitive, min(sens) AS leaked_value
      |FROM s GROUP BY 1, 2
      |HAVING count(DISTINCT sens) < 2
      |ORDER BY 1, 2""".stripMargin

  /** Right-to-be-forgotten propagation audit — the GDPR/CCPA delete job:
    * a deletion-request set (here the engine's standard md5-byte gate on
    * user_id standing in for the request table; a real run broadcast-joins
    * the actual request list) is anti-joined out of the event log, and the
    * audit reports, per event type, how many rows the purge removes and
    * keeps plus the distinct users purged. One conditional aggregate over
    * one scan — the delete itself is the same predicate applied as a
    * filter before rewrite, and at 100 TB both passes are scan-speed with
    * the request set broadcast. Pairs with q_privacy_kanon/ldiversity as
    * the act-on-it half of the privacy surface. */
  def forgetAudit(spark: SparkSession, dir: String): DataFrame = {
    val requested = conv(substring(md5(col("user_id").cast("string")), 1, 2), 16, 10)
      .cast("int") < 8 // ~3% of users have filed deletion requests
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), requested.as("req"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("req"), 1L).otherwise(0L)).as("n_purged"),
        sum(when(col("req"), 0L).otherwise(1L)).as("n_remaining"),
        countDistinct(when(col("req"), col("user_id"))).as("n_users_purged"))
      .orderBy(col("event_type"))
  }

  private val forgetAuditSql =
    """WITH e AS (SELECT event_type, user_id,
      |  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))::INT < 8 AS req
      |  FROM events)
      |SELECT event_type, count(*) AS n_total,
      |  CAST(sum(CASE WHEN req THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
      |  CAST(sum(CASE WHEN req THEN 0 ELSE 1 END) AS BIGINT) AS n_remaining,
      |  count(DISTINCT CASE WHEN req THEN user_id END) AS n_users_purged
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  /** t-closeness audit (Li et al. 2007) — the third rung of the
    * k-anonymity ladder: a QI group can be large AND diverse yet still
    * leak if its SENSITIVE-VALUE DISTRIBUTION differs sharply from the
    * table's (skewness attack). Reports, per QI group, the ordered-domain
    * earth-mover's distance between the group's account-balance
    * distribution and the global one: EMD = Σ|cumulative p−q| / (m−1)
    * over the m distinct values.
    *
    * Exactness: with p_j = g_j/n_g and q_j = c_j/N, each cumulative
    * difference clears denominators to the BIGINT numerator
    * N·cumG_j − n_g·cum_j; the Σ|·| is an exact integer and ONE final
    * division by n_g·N·(m−1) yields t. Overflow budget:
    * N·n_g·m < 2^63 — at N = 1e8 customers, n_g = 1e5, m = 1e6 distinct
    * cents it would overflow; lift to DECIMAL beyond, documented here.
    *
    * Scale shape: the domain grid is (QI groups × distinct cent values) —
    * group-count-bounded × money-bounded, never row-count-bounded; the
    * cumulative windows partition by group over that grid. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = graft.functions.Rounding.roundN(col("c_acctbal") * 100, 0).cast("long")
    val base = Tables.customer(spark, dir)
      .select(col("c_nationkey").as("nationkey"),
        col("c_mktsegment").as("mktsegment"), cents.as("v"))
    val domain = base.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val m = domain.agg(count(lit(1)).as("m"), sum(col("c")).as("nn"))
    val groups = base.groupBy(col("nationkey"), col("mktsegment"), col("v"))
      .agg(count(lit(1)).as("g"))
    // full grid: every group × every domain value (zero-filled); the QI
    // side is schema-bounded (≤ nations × segments rows) and broadcast —
    // the one whitelisted multi-row BNLJ build in the registry
    val grid = domain
      .crossJoin(broadcast(base.select(col("nationkey"), col("mktsegment")).distinct()))
      .join(groups, Seq("nationkey", "mktsegment", "v"), "left_outer")
      .na.fill(0L, Seq("g"))
    val byG = Window.partitionBy(col("nationkey"), col("mktsegment"))
    val cum = grid
      .withColumn("cum_g", sum(col("g")).over(byG.orderBy(col("v"))))
      .withColumn("cum_c", sum(col("c")).over(byG.orderBy(col("v"))))
      .withColumn("n_g", sum(col("g")).over(byG))
      .crossJoin(broadcast(m))
    cum.groupBy(col("nationkey"), col("mktsegment"))
      .agg(max(col("n_g")).as("group_size"),
        (sum(abs(col("nn") * col("cum_g") - col("n_g") * col("cum_c"))).cast("double") /
          (max(col("n_g")) * max(col("nn")) * (max(col("m")) - lit(1)))).as("t0"))
      .select(col("nationkey"), col("mktsegment"), col("group_size"),
        graft.functions.Rounding.roundN(col("t0"), 6).as("t"))
      .orderBy(col("nationkey"), col("mktsegment"))
  }

  private val tClosenessSql = {
    val cents = s"CAST(${graft.functions.Rounding.roundNSql("c_acctbal * 100", 0)} AS BIGINT)"
    s"""WITH base AS (SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
       |                $cents AS v FROM customer),
       |domain AS (SELECT v, count(*) AS c FROM base GROUP BY 1),
       |mm AS (SELECT count(*) AS m, CAST(sum(c) AS BIGINT) AS nn FROM domain),
       |groups AS (SELECT nationkey, mktsegment, v, count(*) AS g
       |           FROM base GROUP BY 1, 2, 3),
       |grid AS (SELECT q.nationkey, q.mktsegment, d.v, d.c, coalesce(groups.g, 0) AS g
       |         FROM (SELECT DISTINCT nationkey, mktsegment FROM base) q
       |         CROSS JOIN domain d
       |         LEFT JOIN groups ON groups.nationkey = q.nationkey
       |           AND groups.mktsegment = q.mktsegment AND groups.v = d.v),
       |cum AS (SELECT nationkey, mktsegment,
       |          sum(g) OVER (PARTITION BY nationkey, mktsegment ORDER BY v) AS cum_g,
       |          sum(c) OVER (PARTITION BY nationkey, mktsegment ORDER BY v) AS cum_c,
       |          sum(g) OVER (PARTITION BY nationkey, mktsegment) AS n_g
       |        FROM grid)
       |SELECT nationkey, mktsegment, CAST(max(n_g) AS BIGINT) AS group_size,
       |  ${graft.functions.Rounding.roundNSql(
        "CAST(sum(abs(nn * cum_g - n_g * cum_c)) AS DOUBLE) / (max(n_g) * max(nn) * (max(m) - 1))",
        6)} AS t
       |FROM cum CROSS JOIN mm
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  /** Minimal-generalization pick over a fixed QI ladder — the release
    * policy on top of the `q_privacy_kanon` audit: walk
    * L0 (nation, segment) → L1 (region, segment) → L2 (region, *) →
    * L3 (*, *) and choose the first level whose SMALLEST QI group
    * reaches k = [[KAnon]]. All four levels compute in ONE Expand pass
    * (the q_grouping_sets operator class — a single scan regardless of
    * corpus size); the level summary is ladder-sized (4 rows) and the
    * chosen marker joins a 1-row grand aggregate. The oracle recomputes
    * each level as a plain UNION (correctness-only role). */
  def kAnonLevels(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_nationkey").as("nationkey"),
        col("n_regionkey").as("region"), col("c_mktsegment").as("mktsegment"))
    val sized = cust
      .groupingSets(
        Seq(Seq(col("nationkey"), col("region"), col("mktsegment")),
          Seq(col("region"), col("mktsegment")), Seq(col("region")), Seq()),
        col("nationkey"), col("region"), col("mktsegment"))
      .agg(count(lit(1)).as("sz"), grouping_id().as("gid"))
      .select(
        when(col("gid") === 0, 0).when(col("gid") === 4, 1)
          .when(col("gid") === 5, 2).otherwise(3).as("level"),
        col("sz"))
    val levels = sized.groupBy(col("level"))
      .agg(count(lit(1)).as("n_groups"), min(col("sz")).as("min_group_size"))
      .withColumn("meets_k", col("min_group_size") >= KAnon)
    val minLevel = broadcast(levels.filter(col("meets_k"))
      .agg(min(col("level")).as("min_level")))
    levels.crossJoin(minLevel)
      .select(col("level"), col("n_groups"), col("min_group_size"), col("meets_k"),
        coalesce(col("level") === col("min_level"), lit(false)).as("chosen"))
      .orderBy(col("level"))
  }

  private val kAnonLevelsSql =
    s"""WITH c AS (SELECT c_nationkey AS nationkey, n_regionkey AS region,
       |             c_mktsegment AS mktsegment
       |           FROM customer JOIN nation ON c_nationkey = n_nationkey),
       |sz AS (
       |  SELECT 0 AS level, count(*) AS sz FROM c GROUP BY nationkey, region, mktsegment
       |  UNION ALL SELECT 1, count(*) FROM c GROUP BY region, mktsegment
       |  UNION ALL SELECT 2, count(*) FROM c GROUP BY region
       |  UNION ALL SELECT 3, count(*) FROM c),
       |lv AS (SELECT level, count(*) AS n_groups,
       |         CAST(min(sz) AS BIGINT) AS min_group_size,
       |         min(sz) >= $KAnon AS meets_k
       |       FROM sz GROUP BY 1),
       |ml AS (SELECT min(level) AS min_level FROM lv WHERE meets_k)
       |SELECT level, n_groups, min_group_size, meets_k,
       |  coalesce(level = ml.min_level, false) AS chosen
       |FROM lv CROSS JOIN ml
       |ORDER BY level""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("q_privacy_kanon", kAnonymity, Some(kAnonymitySql)),
    Q("q_privacy_kanon_level", kAnonLevels, Some(kAnonLevelsSql)),
    Q("q_privacy_tcloseness", tCloseness, Some(tClosenessSql)),
    Q("q_privacy_forget", forgetAudit, Some(forgetAuditSql)),
    Q("q_privacy_ldiversity", lDiversity, Some(lDiversitySql)),
    Q("q_validate_rules", validateRules, Some(validateRulesSql)),
    Q("q_empty_guard", emptyGuard, Some(
      "SELECT count(*) AS cnt, count(*) = 0 AS is_empty FROM lineitem")),
    Q("q_count_action", countAction, Some(
      """SELECT (SELECT count(*) FROM lineitem) AS lineitem_rows,
        |       (SELECT count(*) FROM orders)   AS orders_rows,
        |       (SELECT count(*) FROM part)     AS part_rows""".stripMargin)),
    Q("q_filter_isnull", nullAudit, Some(
      orderCols.map(c => s"count(CASE WHEN $c IS NULL THEN 1 END) AS nulls_$c")
        .mkString("SELECT ", ", ", " FROM orders"))),
    Q("q_filter_expr", filterExpr, Some(
      "SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey HAVING count(*) > 1")),
    Q("q_project_distinct", projectDistinct, Some(
      "SELECT DISTINCT l_returnflag AS returnflag FROM lineitem")),
    Q("q_filter_eq_lit", filterEqLit, Some(
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin)),
    Q("q_join_anti_fk_product", antiFkProduct, Some(
      """SELECT DISTINCT l_partkey AS violating_partkey FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)""".stripMargin)),
    Q("q_join_anti_fk_order", antiFkOrder, Some(
      """SELECT DISTINCT l_orderkey AS violating_orderkey FROM lineitem l
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)""".stripMargin)),
    Q("q_agg_dup_orders", dupOrders, Some(
      "SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY o_orderkey HAVING count(*) > 1")),
    Q("q_agg_dup_items", dupItems, Some(
      """SELECT l_orderkey, l_linenumber, count(*) AS cnt FROM lineitem
        |GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1""".stripMargin)),
  )
}
