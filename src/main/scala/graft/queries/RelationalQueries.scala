package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Generic relational operator coverage over the driver's TPC-H-ish tables.
  *
  * Conventions shared with the DuckDB oracles (driver hashes values after
  * sorting columns by name, so types and names must line up):
  *   - money/quantity sums go through DECIMAL so both engines do exact math;
  *   - integer outputs are cast to BIGINT on both sides;
  *   - every window/limit has a total order (unique tiebreak columns).
  *
  * These exercise the same operator classes the statement engine uses
  * (SURVEY.md §2.3-2.7): equi/semi/anti joins, group-by aggregation, pivot,
  * window top-N, sort+limit, set ops.
  */
object RelationalQueries extends QueryPack {

  private def dec(c: Column, p: Int = 18, s: Int = 2): Column =
    c.cast(DecimalType(p, s))

  /** DuckDB twin of Layout.interleave: unrolled Morton bit-interleave of
    * two `bits`-bit BIGINT expressions (a's bit i at 2i+1, b's at 2i). */
  private def duckInterleave(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i + 1}) + ((($b >> $i) & 1) << ${2 * i})"
    }.mkString(" + ")

  /** DuckDB rolling hash identical to TextAnalysis.rollingHash. */
  private def duckHash(expr: String) =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 1000000007)"""

  /** DuckDB twin of Dedup.namePrefixCandidates over the perturbed-part
    * linkage fixture (variants = p_name || 's'): CTE chain pa/pb/pan/pbn
    * -> sa/sb (name-keyed shingle hashes) -> cand(a_id, b_id), with the
    * prefix cut at block threshold `t`. */
  private def duckNameCands(t: String) = s"""pa AS (
          SELECT p_partkey + 1000000 AS id, p_name || 's' AS nm FROM part),
        pb AS (SELECT p_partkey AS id, p_name AS nm FROM part),
        pan AS (SELECT DISTINCT nm FROM pa),
        pbn AS (SELECT nm, CAST(min(id) AS BIGINT) AS b_row
          FROM pb GROUP BY 1),
        sa0 AS (SELECT nm, unnest(list_transform(
            range(1, greatest(len(nm) - 2, 1) + 1),
            i -> substr(nm, CAST(i AS INTEGER), 3))) AS shingle FROM pan),
        sa1 AS (SELECT DISTINCT nm AS a_id, shingle FROM sa0),
        sa AS (SELECT a_id, ${duckHash("shingle")} AS sh_hash FROM sa1),
        sb0 AS (SELECT nm, unnest(list_transform(
            range(1, greatest(len(nm) - 2, 1) + 1),
            i -> substr(nm, CAST(i AS INTEGER), 3))) AS shingle FROM pbn),
        sb1 AS (SELECT DISTINCT nm AS b_id, shingle FROM sb0),
        sb AS (SELECT b_id, ${duckHash("shingle")} AS sh_hash FROM sb1),
        dft AS (SELECT sh_hash, count(*) AS df FROM (
            SELECT sh_hash FROM sa UNION ALL SELECT sh_hash FROM sb)
          GROUP BY 1),
        caA AS (SELECT a_id, sh_hash FROM (
            SELECT sa.a_id, sa.sh_hash,
              count(*) OVER (PARTITION BY sa.a_id) AS sz,
              row_number() OVER (PARTITION BY sa.a_id
                ORDER BY dft.df ASC, sa.sh_hash ASC) AS rnk
            FROM sa JOIN dft USING (sh_hash))
          WHERE rnk <= sz - CAST(ceil($t * sz) AS BIGINT) + 1),
        caB AS (SELECT b_id, sh_hash FROM (
            SELECT sb.b_id, sb.sh_hash,
              count(*) OVER (PARTITION BY sb.b_id) AS sz,
              row_number() OVER (PARTITION BY sb.b_id
                ORDER BY dft.df ASC, sb.sh_hash ASC) AS rnk
            FROM sb JOIN dft USING (sh_hash))
          WHERE rnk <= sz - CAST(ceil($t * sz) AS BIGINT) + 1),
        cand AS (SELECT DISTINCT a_id, b_id FROM caA JOIN caB USING (sh_hash))"""

  def defs: Map[String, QueryDef] = Map(

    // fuzzy name matching (record linkage): perturbed part names (a
    // trailing 's' typo) linked back to the catalog by char-trigram Jaccard,
    // candidates from PPJoin-style prefix filtering (rarest-trigram
    // prefixes under a global df order — recall exact by construction)
    "q_match_names" -> QueryDef(
      (s, dir) => {
        val p = Tables.table(s, dir, "part").select("p_partkey", "p_name")
        val variants = p.select(
          (col("p_partkey") + 1000000L).as("v_key"),
          concat(col("p_name"), lit("s")).as("v_name"))
        graft.operators.Dedup.nameMatch(
          variants, "v_key", "v_name", p, "p_partkey", "p_name")
      },
      Some(s"""WITH ${duckNameCands("0.3")},
        inter AS (SELECT c.a_id, c.b_id, count(*) AS i FROM cand c
          JOIN sa ON sa.a_id = c.a_id
          JOIN sb ON sb.b_id = c.b_id AND sb.sh_hash = sa.sh_hash
          GROUP BY 1, 2),
        szA AS (SELECT a_id, count(*) AS sz_a FROM sa GROUP BY 1),
        szB AS (SELECT b_id, count(*) AS sz_b FROM sb GROUP BY 1),
        sc AS (SELECT i.a_id, i.b_id,
            CAST(i.i AS DOUBLE) / CAST(szA.sz_a + szB.sz_b - i.i AS DOUBLE)
              AS jaccard
          FROM inter i JOIN szA USING (a_id) JOIN szB USING (b_id)),
        rk AS (SELECT s.a_id, n.b_row, s.jaccard,
            row_number() OVER (PARTITION BY s.a_id
              ORDER BY s.jaccard DESC, n.b_row ASC) AS rn
          FROM sc s JOIN pbn n ON n.nm = s.b_id WHERE s.jaccard >= 0.3)
        SELECT CAST(pa.id AS BIGINT) AS a_id, rk.b_row AS b_id, rk.jaccard
        FROM rk JOIN pa ON pa.nm = rk.a_id WHERE rk.rn = 1"""),
    ),

    // linkage verified by normalized edit similarity (typo-shaped
    // variants): same prefix blocking at 0.2, Spark's codegen'd
    // levenshtein as the verifier
    "q_match_names_edit" -> QueryDef(
      (s, dir) => {
        val p = Tables.table(s, dir, "part").select("p_partkey", "p_name")
        val variants = p.select(
          (col("p_partkey") + 1000000L).as("v_key"),
          concat(col("p_name"), lit("s")).as("v_name"))
        graft.operators.Dedup.nameMatchEdit(
          variants, "v_key", "v_name", p, "p_partkey", "p_name")
      },
      Some(s"""WITH ${duckNameCands("0.2")},
        ed AS (SELECT c.a_id, n.b_row,
            1.0 - CAST(levenshtein(c.a_id, c.b_id) AS DOUBLE) /
              CAST(greatest(len(c.a_id), len(c.b_id)) AS DOUBLE) AS sim
          FROM cand c JOIN pbn n ON n.nm = c.b_id),
        rk AS (SELECT a_id, b_row, sim,
            row_number() OVER (PARTITION BY a_id
              ORDER BY sim DESC, b_row ASC) AS rn
          FROM ed WHERE sim >= 0.7)
        SELECT CAST(pa.id AS BIGINT) AS a_id, rk.b_row AS b_id, rk.sim
        FROM rk JOIN pa ON pa.nm = rk.a_id WHERE rk.rn = 1"""),
    ),

    // --- aggregation -----------------------------------------------------
    "q_agg_pricing" -> QueryDef(
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02"))
        li.groupBy("l_returnflag", "l_linestatus").agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base"),
          sum((dec(col("l_extendedprice")) *
            (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast(DecimalType(28, 4))).cast("double").as("sum_disc"),
          count(lit(1)).as("cnt"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
              CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc,
              COUNT(*) AS cnt
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY l_returnflag, l_linestatus"""),
    ),

    "q_agg_distinct" -> QueryDef(
      (s, dir) => {
        Tables.table(s, dir, "orders").groupBy("o_orderpriority").agg(
          countDistinct(col("o_custkey")).as("n_cust"),
          count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      },
      Some("""SELECT o_orderpriority,
              CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
              COUNT(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
              FROM orders GROUP BY o_orderpriority"""),
    ),

    // --- joins -----------------------------------------------------------
    "q_join_broadcast" -> QueryDef(
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        val part = Tables.table(s, dir, "part").filter(col("p_type") === "PROMO")
        li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand").agg(
            sum((dec(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
              .cast(DecimalType(28, 4))).cast("double").as("revenue"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT p_brand,
              CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
              COUNT(*) AS n
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_type = 'PROMO' GROUP BY p_brand"""),
    ),

    "q_join_pipeline" -> QueryDef(
      (s, dir) => {
        val cust = Tables.table(s, dir, "customer")
        val ord = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1997-01-01"))
        val li = Tables.table(s, dir, "lineitem")
        val nat = Tables.table(s, dir, "nation")
        val reg = Tables.table(s, dir, "region").filter(col("r_name") === "ASIA")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name").agg(
            sum((dec(col("l_extendedprice")) *
              (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
              .cast(DecimalType(28, 4))).cast("double").as("revenue"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT n_name,
              CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
              COUNT(*) AS n
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY n_name"""),
    ),

    "q_join_semi" -> QueryDef(
      (s, dir) => {
        val cust = Tables.table(s, dir, "customer")
        val ord = Tables.table(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust"))
      },
      Some("""SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1997-01-01'
                AND o_orderdate < TIMESTAMP '1998-01-01')
              GROUP BY c_mktsegment"""),
    ),

    "q_join_anti" -> QueryDef(
      (s, dir) => {
        val cust = Tables.table(s, dir, "customer")
        val ord = Tables.table(s, dir, "orders")
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(Tables.table(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name").agg(count(lit(1)).as("n_cust"))
      },
      Some("""SELECT n_name, COUNT(*) AS n_cust FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              GROUP BY n_name"""),
    ),

    // --- windows ---------------------------------------------------------
    "q_window_topn" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("l_orderkey")
          .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
        Tables.table(s, dir, "lineitem")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_extendedprice").as("price"), col("rn").cast("long").as("rn"))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
              l_extendedprice AS price, CAST(rn AS BIGINT) AS rn
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
                ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn FROM lineitem)
              WHERE rn <= 2"""),
    ),

    "q_window_running" -> QueryDef(
      (s, dir) => {
        // (shipdate, orderkey, linenumber) is NOT unique in this data; the
        // running sum needs a total order or tie placement is
        // nondeterministic run to run
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
            col("l_linenumber").asc, col("l_partkey").asc,
            col("l_extendedprice").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.table(s, dir, "lineitem")
          .withColumn("running_qty", sum(dec(col("l_quantity"))).over(w).cast("double"))
          .select(col("l_suppkey"), col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"), col("running_qty"))
      },
      Some("""SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (PARTITION BY l_suppkey
                ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
                         l_partkey ASC, l_extendedprice ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
              FROM lineitem"""),
    ),

    // --- sort / top-k ----------------------------------------------------
    "q_topk_global" -> QueryDef(
      (s, dir) => {
        Tables.table(s, dir, "lineitem")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc)
          .limit(100)
          .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_extendedprice").as("price"))
      },
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
              l_extendedprice AS price
              FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
              LIMIT 100"""),
    ),

    // --- set operations --------------------------------------------------
    "q_set_union" -> QueryDef(
      (s, dir) => {
        val ord = Tables.table(s, dir, "orders")
        def keys(y: Int) = ord
          .filter(col("o_orderdate") >= lit(f"$y-01-01") &&
            col("o_orderdate") < lit(f"${y + 1}-01-01"))
          .select("o_custkey").distinct()
        keys(1996).union(keys(1997)).distinct()
      },
      Some("""SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
              UNION
              SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'"""),
    ),

    "q_set_intersect" -> QueryDef(
      (s, dir) => {
        val ord = Tables.table(s, dir, "orders")
        def keys(y: Int) = ord
          .filter(col("o_orderdate") >= lit(f"$y-01-01") &&
            col("o_orderdate") < lit(f"${y + 1}-01-01"))
          .select("o_custkey")
        keys(1996).intersect(keys(1997))
      },
      Some("""SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
              INTERSECT
              SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'"""),
    ),

    "q_set_except" -> QueryDef(
      (s, dir) => {
        val ord = Tables.table(s, dir, "orders")
        def keys(y: Int) = ord
          .filter(col("o_orderdate") >= lit(f"$y-01-01") &&
            col("o_orderdate") < lit(f"${y + 1}-01-01"))
          .select("o_custkey")
        keys(1996).except(keys(1997))
      },
      Some("""SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
              EXCEPT
              SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'"""),
    ),

    // --- pivot -----------------------------------------------------------
    "q_pivot_status" -> QueryDef(
      (s, dir) => {
        Tables.table(s, dir, "orders")
          .withColumn("yr", year(col("o_orderdate")).cast("long"))
          .groupBy("yr").pivot("o_orderstatus", Seq("F", "O", "P")).count()
          .na.fill(0L, Seq("F", "O", "P"))
      },
      Some("""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
              COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
              COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
              COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
              FROM orders GROUP BY 1"""),
    ),

    // --- filters / expressions -------------------------------------------
    "q_filter_pred" -> QueryDef(
      (s, dir) => {
        Tables.table(s, dir, "part")
          .filter(col("p_size").between(10, 30) &&
            col("p_type").isin("PROMO", "ECONOMY") &&
            col("p_name").like("%a%") &&
            dec(col("p_retailprice")) > lit(900))
          .select(col("p_partkey"), col("p_brand"), col("p_size").cast("long").as("p_size"))
      },
      Some("""SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size FROM part
              WHERE p_size BETWEEN 10 AND 30 AND p_type IN ('PROMO','ECONOMY')
                AND p_name LIKE '%a%' AND CAST(p_retailprice AS DECIMAL(18,2)) > 900"""),
    ),

    "q_string_funcs" -> QueryDef(
      (s, dir) => {
        Tables.table(s, dir, "customer")
          .select(col("c_custkey"),
            lower(col("c_name")).as("lname"),
            substring(col("c_name"), 1, 8).as("prefix"),
            length(col("c_name")).cast("long").as("len"),
            concat_ws("-", col("c_mktsegment"), col("c_nationkey").cast("string")).as("seg_nat"))
      },
      Some("""SELECT c_custkey, LOWER(c_name) AS lname, SUBSTRING(c_name, 1, 8) AS prefix,
              CAST(LENGTH(c_name) AS BIGINT) AS len,
              c_mktsegment || '-' || CAST(c_nationkey AS VARCHAR) AS seg_nat
              FROM customer"""),
    ),

    "q_case_bucket" -> QueryDef(
      (s, dir) => {
        Tables.table(s, dir, "orders")
          .withColumn("bucket",
            when(col("o_totalprice") < 50000, "low")
              .when(col("o_totalprice") < 150000, "mid")
              .otherwise("high"))
          .groupBy("bucket").agg(count(lit(1)).as("n"),
            sum(dec(col("o_totalprice"))).cast("double").as("total"))
      },
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                          WHEN o_totalprice < 150000 THEN 'mid'
                          ELSE 'high' END AS bucket,
              COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY 1"""),
    ),

    "q_distinct_proj" -> QueryDef(
      (s, dir) =>
        Tables.table(s, dir, "lineitem")
          .select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"),
    ),

    "q_scalar_subquery" -> QueryDef(
      (s, dir) => {
        val part = Tables.table(s, dir, "part")
        val avgPrice = part.agg(avg(col("p_retailprice")).as("ap"))
        part.join(broadcast(avgPrice))
          .filter(col("p_retailprice") > col("ap"))
          .groupBy("p_type").agg(count(lit(1)).as("n"))
      },
      Some("""SELECT p_type, COUNT(*) AS n FROM part
              WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
              GROUP BY p_type"""),
    ),

    // --- correlated / outer-join shapes ----------------------------------
    "q_having_groups" -> QueryDef(
      (s, dir) => {
        Tables.table(s, dir, "lineitem")
          .groupBy("l_partkey").agg(
            count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast("double").as("qty"))
          .filter(col("n") >= 40)
      },
      Some("""SELECT l_partkey, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
              FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 40"""),
    ),

    // Q13-ish: customer order-count distribution via left outer join
    "q_outer_histogram" -> QueryDef(
      (s, dir) => {
        val cust = Tables.table(s, dir, "customer")
        val ord = Tables.table(s, dir, "orders")
          .filter(!col("o_orderpriority").startsWith("1"))
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
                SELECT c_custkey, COUNT(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
                GROUP BY c_custkey)
              GROUP BY c_count"""),
    ),

    // Q17-ish: correlated per-group mean as the filter bound. The
    // "qty < avg/2" predicate is cross-multiplied to exact decimal math
    // (2*n*qty < sum) so both engines decide boundary rows identically.
    "q_correlated_avg" -> QueryDef(
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        val perPart = li.groupBy(col("l_partkey").as("ap_partkey"))
          .agg(sum(dec(col("l_quantity"))).as("s"), count(lit(1)).as("cnt"))
        li.join(perPart, col("l_partkey") === col("ap_partkey"))
          .filter(dec(col("l_quantity")) * 2 * col("cnt") < col("s"))
          .agg(
            sum(dec(col("l_extendedprice"))).cast("double").as("total"),
            count(lit(1)).as("n"))
      },
      Some("""WITH pa AS (SELECT l_partkey AS pk,
                SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s, COUNT(*) AS cnt
              FROM lineitem GROUP BY 1)
              SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                     COUNT(*) AS n
              FROM lineitem JOIN pa ON l_partkey = pk
              WHERE CAST(l_quantity AS DECIMAL(18,2)) * 2 * cnt < s"""),
    ),

    // hot-key aggregation via two-stage salting (Skew.saltedAggregate);
    // result must equal the direct group-by
    "q_skew_salted_agg" -> QueryDef(
      (s, dir) => {
        graft.operators.Skew.saltedAggregate(
          Tables.table(s, dir, "lineitem"), "l_returnflag", salts = 16,
          Map(
            "n" -> (count(lit(1)), (c: Column) => sum(c)),
            "qty" -> (sum(dec(col("l_quantity"))), (c: Column) => sum(c)),
            "max_price" -> (max(col("l_extendedprice")), (c: Column) => max(c))))
          .select(col("l_returnflag"), col("n"),
            col("qty").cast("double").as("qty"), col("max_price"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
              MAX(l_extendedprice) AS max_price
              FROM lineitem GROUP BY 1"""),
    ),

    // salted equi-join: a planted hot key (every 3rd order collapses to
    // key 0) joins a non-broadcastable-in-spirit dim; the salt is internal
    // so the joined result is salt-invariant and the oracle is the plain
    // join. Decimal-cast sum keeps the float aggregate order-independent.
    "q_skew_salted_join" -> QueryDef(
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
          .select(
            when(col("l_orderkey") % 3 === 0, lit(0L))
              .otherwise(col("l_orderkey") % 1000).as("k"),
            col("l_quantity"))
        val dim = Tables.table(s, dir, "part")
          .groupBy((col("p_partkey") % 1000).as("k"))
          .agg(max(col("p_retailprice")).as("max_price"))
        graft.operators.Skew.saltedJoin(li, dim, "k", salts = 8)
          .groupBy((col("k") % 10).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast("double").as("qty"),
            max(col("max_price")).as("max_price"))
      },
      Some("""WITH li AS (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 0
                ELSE l_orderkey % 1000 END AS k, l_quantity FROM lineitem),
        dim AS (SELECT p_partkey % 1000 AS k, max(p_retailprice) AS max_price
                FROM part GROUP BY 1)
        SELECT li.k % 10 AS bucket, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
          MAX(max_price) AS max_price
        FROM li JOIN dim ON li.k = dim.k
        GROUP BY 1"""),
    ),

    // exact interpolated percentiles (both engines use linear
    // interpolation between order statistics - no float-sum ordering risk)
    "q_percentiles" -> QueryDef(
      (s, dir) => Tables.table(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("median"),
          expr("percentile(o_totalprice, 0.9)").as("p90")),
      Some("""SELECT o_orderpriority,
              quantile_cont(o_totalprice, 0.5) AS median,
              quantile_cont(o_totalprice, 0.9) AS p90
              FROM orders GROUP BY 1"""),
    ),

    // multi-level aggregation: ROLLUP with grouping_id
    "q_rollup" -> QueryDef(
      (s, dir) => Tables.table(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("qty"),
          grouping_id().cast("long").as("gid")),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
              CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
              FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""),
    ),

    // sketch: HyperLogLog distinct estimate (implementation-specific, so
    // no cross-engine oracle - the driver records a rows-only check; the
    // spec asserts accuracy against the exact count)
    // HLL sketch gated by an ERROR-BOUND oracle: DuckDB's approx_distinct
    // can never hash-match Spark's HLL++ registers, so the gate asserts
    // the estimate lands within 3x the configured rsd of the exact
    // distinct count (the HLL++ accuracy guarantee; deterministic for
    // fixed input) and emits that verdict alongside the exact count,
    // which DuckDB reproduces exactly — rows+schema+hash all check.
    "q_approx_distinct" -> QueryDef(
      // parallelized: the single-row-group fixture otherwise runs the
      // partial distinct aggregation in ONE scan task.
      // The sketch and the exact count aggregate SEPARATELY and join on
      // the 3-row group key: fused in one agg, the distinct rewrite
      // groups by (flag, partkey) and allocates the rsd-0.02 HLL++ buffer
      // (4 KB of registers) PER fine group — ~200k groups of pure buffer
      // churn for a 3-group answer. Split, the HLL keeps 3 buffers and
      // the exact side shuffles bare longs; the join is a broadcast over
      // 3 rows and the results are value-identical.
      (s, dir) => {
        val li = Tables.parallelized(Tables.table(s, dir, "lineitem"))
        val approx = li.groupBy("l_returnflag")
          .agg(approx_count_distinct(col("l_partkey"), 0.02)
            .as("approx_parts"))
        val exact = li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("exact_parts"))
        // null-safe group-key equality (round-12 advice): a plain equi-join
        // would silently drop a NULL l_returnflag group that the fused
        // aggregate (and the oracle's GROUP BY) keeps; <=> is still a
        // hash-join key, so the plan stays a 3-row broadcast join (the
        // rename disambiguates the self-join's key columns)
        approx.join(exact.withColumnRenamed("l_returnflag", "rf"),
            col("l_returnflag") <=> col("rf"))
          .select(col("l_returnflag"), col("exact_parts"),
            (abs(col("approx_parts") - col("exact_parts")) <=
              col("exact_parts") * lit(0.06)).as("within_rsd"))
      },
      Some("""SELECT l_returnflag,
              CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
              TRUE AS within_rsd
              FROM lineitem GROUP BY 1"""),
    ),

    // mergeable distinct sketches (Sketches.hllMergeEstimate): per-flag
    // HLL sketches unioned into the global estimate — the persisted-
    // sketch re-aggregation path — bounds-gated like q_approx_distinct
    // (lgK=12 rsd ~1.6%, bound 3x); n_groups pins the pre-merge fan-in
    "q_approx_distinct_merge" -> QueryDef(
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        val merged = graft.operators.Sketches.hllMergeEstimate(
          li, "l_returnflag", "l_partkey")
        // GATE-ONLY leg: the full-corpus exact countDistinct exists to
        // band-check the estimate (crossJoin of two 1-row aggregates);
        // the OPERATOR is the mergeable sketch alone — production never
        // computes the exact side
        val exact = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
        merged.crossJoin(exact).select(
          col("exact_parts"), col("n_groups"),
          (abs(col("estimate") - col("exact_parts")) <=
            col("exact_parts") * lit(0.05)).as("within_rsd"))
      },
      Some("""SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
              AS exact_parts,
              CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS n_groups,
              TRUE AS within_rsd FROM lineitem"""),
    ),

    // approx quantiles sketch (KLL/GK-style approx_percentile), gated like
    // q_approx_distinct: Spark checks the sketch's answer against its own
    // exact interpolated percentiles at the rank-error bounds (accuracy
    // 1000 -> eps 1/1000, widened 2x) and emits the verdict alongside the
    // exact median, which DuckDB reproduces exactly
    "q_approx_quantiles" -> QueryDef(
      // parallelized: percentile partial aggregation is scan-stage work
      (s, dir) => Tables.parallelized(Tables.table(s, dir, "orders"))
        .groupBy("o_orderpriority")
        .agg(
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap50"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("ap90"),
          // band width ±0.01 rank, not the sketch's ±0.001 guarantee: at
          // sf0.001 a group holds ~300 rows, where a ±0.002 band is
          // narrower than one data point and the CONTINUOUS-interpolated
          // bounds can exclude every actual value approx_percentile may
          // return. ±0.01 keeps >= 2 order statistics inside the band at
          // every SF while still asserting a 10x-tighter-than-nothing
          // error envelope.
          expr("percentile(o_totalprice, 0.49)").as("lo50"),
          expr("percentile(o_totalprice, 0.51)").as("hi50"),
          expr("percentile(o_totalprice, 0.89)").as("lo90"),
          expr("percentile(o_totalprice, 0.91)").as("hi90"),
          expr("percentile(o_totalprice, 0.5)").as("median"))
        .select(col("o_orderpriority"), col("median"),
          (col("ap50") >= col("lo50") && col("ap50") <= col("hi50"))
            .as("p50_in_bounds"),
          (col("ap90") >= col("lo90") && col("ap90") <= col("hi90"))
            .as("p90_in_bounds")),
      Some("""SELECT o_orderpriority,
              quantile_cont(o_totalprice, 0.5) AS median,
              TRUE AS p50_in_bounds, TRUE AS p90_in_bounds
              FROM orders GROUP BY 1"""),
    ),

    // backward as-of join (Temporal.asofJoin, union-trick single shuffle):
    // each purchase matched to the user's latest strictly-prior-or-equal
    // non-purchase event; ts ties broken toward the larger event_id; the
    // oracle replays the tagged union + IGNORE NULLS window verbatim
    "q_join_asof" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val touches = ev.where(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("touch_event_id"),
            col("event_type").as("touch_type"))
        graft.operators.Temporal.asofJoin(
            purchases, "user_id", "ts",
            touches, "user_id", "ts",
            payload = Seq("touch_event_id", "touch_type"),
            rightTieBreak = "touch_event_id")
          .select(col("user_id"), col("event_id"),
            coalesce(col("touch_event_id"), lit(-1L)).as("touch_event_id"),
            coalesce(col("touch_type"), lit("none")).as("touch_type"),
            coalesce(unix_micros(col("ts")) - unix_micros(col("asof_ts")),
              lit(-1L)).as("age_us"))
      },
      Some("""WITH u AS (
          SELECT user_id, ts, 1 AS is_left, event_id,
                 CAST(NULL AS BIGINT) AS tb,
                 CAST(NULL AS STRUCT(e BIGINT, t VARCHAR, rts TIMESTAMP)) AS m
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 0, NULL, event_id,
                 struct_pack(e := event_id, t := event_type, rts := ts)
          FROM events WHERE event_type <> 'purchase'),
        w AS (
          SELECT user_id, ts, is_left, event_id,
            last_value(m IGNORE NULLS) OVER (
              PARTITION BY user_id
              ORDER BY ts ASC, is_left ASC, tb ASC NULLS FIRST
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
          FROM u)
        SELECT user_id, event_id,
          coalesce(m.e, -1) AS touch_event_id,
          coalesce(m.t, 'none') AS touch_type,
          coalesce(epoch_us(ts) - epoch_us(m.rts), -1) AS age_us
        FROM w WHERE is_left = 1"""),
    ),

    // broadcast as-of join (Temporal.asofJoinBroadcast): identical
    // semantics to q_join_asof — same oracle — but the dimension packs
    // into per-key sorted arrays and broadcasts, so the fact side keeps
    // its scan partitioning (no Exchange at all; TemporalSpec pins it)
    "q_join_asof_bcast" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val touches = ev.where(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("touch_event_id"),
            col("event_type").as("touch_type"))
        graft.operators.Temporal.asofJoinBroadcast(
            purchases, "user_id", "ts",
            touches, "user_id", "ts",
            payload = Seq("touch_event_id", "touch_type"),
            rightTieBreak = "touch_event_id")
          .select(col("user_id"), col("event_id"),
            coalesce(col("touch_event_id"), lit(-1L)).as("touch_event_id"),
            coalesce(col("touch_type"), lit("none")).as("touch_type"),
            coalesce(unix_micros(col("ts")) - unix_micros(col("asof_ts")),
              lit(-1L)).as("age_us"))
      },
      Some("""WITH u AS (
          SELECT user_id, ts, 1 AS is_left, event_id,
                 CAST(NULL AS BIGINT) AS tb,
                 CAST(NULL AS STRUCT(e BIGINT, t VARCHAR, rts TIMESTAMP)) AS m
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 0, NULL, event_id,
                 struct_pack(e := event_id, t := event_type, rts := ts)
          FROM events WHERE event_type <> 'purchase'),
        w AS (
          SELECT user_id, ts, is_left, event_id,
            last_value(m IGNORE NULLS) OVER (
              PARTITION BY user_id
              ORDER BY ts ASC, is_left ASC, tb ASC NULLS FIRST
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
          FROM u)
        SELECT user_id, event_id,
          coalesce(m.e, -1) AS touch_event_id,
          coalesce(m.t, 'none') AS touch_type,
          coalesce(epoch_us(ts) - epoch_us(m.rts), -1) AS age_us
        FROM w WHERE is_left = 1"""),
    ),

    // the DECLARATIVE surface of the same operator: compiled from raw SQL
    // through the asof_join table-valued function (GraftExtensions
    // injectTableFunction), identical semantics and oracle to q_join_asof
    // — proof the HTTP/SQL layer reaches the temporal joins without Scala
    "q_join_asof_sql" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        ev.where(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
          .createOrReplaceTempView("graft_asof_facts")
        ev.where(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("touch_event_id"),
            col("event_type").as("touch_type"))
          .createOrReplaceTempView("graft_asof_dims")
        s.sql("""SELECT user_id, event_id,
            coalesce(touch_event_id, -1L) AS touch_event_id,
            coalesce(touch_type, 'none') AS touch_type,
            coalesce(unix_micros(ts) - unix_micros(asof_ts), -1L) AS age_us
          FROM asof_join('graft_asof_facts', 'user_id', 'ts',
            'graft_asof_dims', 'user_id', 'ts',
            'touch_event_id', 'touch_event_id', 'touch_type')""")
      },
      Some("""WITH u AS (
          SELECT user_id, ts, 1 AS is_left, event_id,
                 CAST(NULL AS BIGINT) AS tb,
                 CAST(NULL AS STRUCT(e BIGINT, t VARCHAR, rts TIMESTAMP)) AS m
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 0, NULL, event_id,
                 struct_pack(e := event_id, t := event_type, rts := ts)
          FROM events WHERE event_type <> 'purchase'),
        w AS (
          SELECT user_id, ts, is_left, event_id,
            last_value(m IGNORE NULLS) OVER (
              PARTITION BY user_id
              ORDER BY ts ASC, is_left ASC, tb ASC NULLS FIRST
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
          FROM u)
        SELECT user_id, event_id,
          coalesce(m.e, -1) AS touch_event_id,
          coalesce(m.t, 'none') AS touch_type,
          coalesce(epoch_us(ts) - epoch_us(m.rts), -1) AS age_us
        FROM w WHERE is_left = 1"""),
    ),

    // forward as-of join (Temporal.asofJoinForward): each purchase
    // matched to the user's EARLIEST later-or-equal non-purchase event —
    // the "next touch after conversion" mirror of q_join_asof, same
    // union-trick plan with the time axis reversed
    "q_join_asof_fwd" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.where(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val touches = ev.where(col("event_type") =!= "purchase")
          .select(col("user_id"), col("ts"),
            col("event_id").as("touch_event_id"),
            col("event_type").as("touch_type"))
        graft.operators.Temporal.asofJoinForward(
            purchases, "user_id", "ts",
            touches, "user_id", "ts",
            payload = Seq("touch_event_id", "touch_type"),
            rightTieBreak = "touch_event_id")
          .select(col("user_id"), col("event_id"),
            coalesce(col("touch_event_id"), lit(-1L)).as("touch_event_id"),
            coalesce(col("touch_type"), lit("none")).as("touch_type"),
            coalesce(unix_micros(col("asof_ts")) - unix_micros(col("ts")),
              lit(-1L)).as("lead_us"))
      },
      Some("""WITH u AS (
          SELECT user_id, ts, 1 AS is_left, event_id,
                 CAST(NULL AS BIGINT) AS tb,
                 CAST(NULL AS STRUCT(e BIGINT, t VARCHAR, rts TIMESTAMP)) AS m
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 0, NULL, event_id,
                 struct_pack(e := event_id, t := event_type, rts := ts)
          FROM events WHERE event_type <> 'purchase'),
        w AS (
          SELECT user_id, ts, is_left, event_id,
            last_value(m IGNORE NULLS) OVER (
              PARTITION BY user_id
              ORDER BY ts DESC, is_left ASC, tb ASC NULLS FIRST
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
          FROM u)
        SELECT user_id, event_id,
          coalesce(m.e, -1) AS touch_event_id,
          coalesce(m.t, 'none') AS touch_type,
          coalesce(epoch_us(m.rts) - epoch_us(ts), -1) AS lead_us
        FROM w WHERE is_left = 1"""),
    ),

    // point-in-interval range join (Temporal.rangeJoin, binned equi-join
    // instead of the nested-loop a raw inequality join compiles to):
    // per order, how many heavy (l_quantity > 49) shipments were in their
    // 3-day post-shipdate window on the order date
    "q_join_range" -> QueryDef(
      (s, dir) => {
        val orders = Tables.table(s, dir, "orders")
          .select("o_orderkey", "o_orderdate")
        val intervals = Tables.table(s, dir, "lineitem")
          .where(col("l_quantity") > 49)
          .select(col("l_shipdate").as("ship_start"),
            (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("ship_end"))
        val matched = graft.operators.Temporal.rangeJoin(
            orders, "o_orderdate",
            intervals, "ship_start", "ship_end",
            binUs = 4L * 86400L * 1000000L)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_open"))
        orders.select("o_orderkey").join(matched, Seq("o_orderkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("n_open"), lit(0L)).as("n_open"))
      },
      Some("""WITH iv AS (
          SELECT l_shipdate AS s, l_shipdate + INTERVAL 3 DAY AS e
          FROM lineitem WHERE l_quantity > 49),
        m AS (
          SELECT o.o_orderkey, count(*) AS n
          FROM orders o JOIN iv ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e
          GROUP BY 1)
        SELECT o.o_orderkey, CAST(coalesce(m.n, 0) AS BIGINT) AS n_open
        FROM orders o LEFT JOIN m USING (o_orderkey)"""),
    ),

    // same semantics through the range_join table-valued function — the
    // declarative surface of Temporal.rangeJoin, same oracle
    "q_join_range_sql" -> QueryDef(
      (s, dir) => {
        Tables.table(s, dir, "orders")
          .select("o_orderkey", "o_orderdate")
          .createOrReplaceTempView("graft_range_points")
        Tables.table(s, dir, "lineitem")
          .where(col("l_quantity") > 49)
          .select(col("l_shipdate").as("ship_start"),
            (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("ship_end"))
          .createOrReplaceTempView("graft_range_iv")
        s.sql("""WITH m AS (
            SELECT o_orderkey, count(*) AS n
            FROM range_join('graft_range_points', 'o_orderdate',
              'graft_range_iv', 'ship_start', 'ship_end', 345600000000)
            GROUP BY 1)
          SELECT p.o_orderkey,
            coalesce(m.n, 0L) AS n_open
          FROM graft_range_points p LEFT JOIN m USING (o_orderkey)""")
      },
      Some("""WITH iv AS (
          SELECT l_shipdate AS s, l_shipdate + INTERVAL 3 DAY AS e
          FROM lineitem WHERE l_quantity > 49),
        m AS (
          SELECT o.o_orderkey, count(*) AS n
          FROM orders o JOIN iv ON o.o_orderdate >= iv.s AND o.o_orderdate <= iv.e
          GROUP BY 1)
        SELECT o.o_orderkey, CAST(coalesce(m.n, 0) AS BIGINT) AS n_open
        FROM orders o LEFT JOIN m USING (o_orderkey)"""),
    ),

    // interval-overlap join (Temporal.intervalJoin, both sides
    // bin-exploded, pair emitted only in the first shared bin — exact
    // dedup without a distinct): per order, how many heavy shipments'
    // 3-day windows overlap the order's first week
    "q_join_interval" -> QueryDef(
      (s, dir) => {
        val orders = Tables.table(s, dir, "orders")
        val oiv = orders.select(col("o_orderkey"),
          col("o_orderdate").as("os"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("oe"))
        val siv = Tables.table(s, dir, "lineitem")
          .where(col("l_quantity") > 49)
          .select(col("l_shipdate").as("ss"),
            (col("l_shipdate") + expr("INTERVAL 3 DAYS")).as("se"))
        val m = graft.operators.Temporal.intervalJoin(
            oiv, "os", "oe", siv, "ss", "se",
            binUs = 4L * 86400L * 1000000L)
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n_overlap"))
        orders.select("o_orderkey").join(m, Seq("o_orderkey"), "left")
          .select(col("o_orderkey"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      },
      Some("""WITH oiv AS (SELECT o_orderkey, o_orderdate AS os,
            o_orderdate + INTERVAL 7 DAY AS oe FROM orders),
        siv AS (SELECT l_shipdate AS ss,
            l_shipdate + INTERVAL 3 DAY AS se
          FROM lineitem WHERE l_quantity > 49),
        m AS (SELECT o_orderkey, count(*) AS n
          FROM oiv JOIN siv ON oiv.os <= siv.se AND siv.ss <= oiv.oe
          GROUP BY 1)
        SELECT o.o_orderkey, CAST(coalesce(m.n, 0) AS BIGINT) AS n_overlap
        FROM orders o LEFT JOIN m USING (o_orderkey)"""),
    ),

    // Z-order (Morton) clustering key for 2-D scan pruning
    // (Layout.zorderBy): o_custkey x order epoch normalized to 16 bits and
    // bit-interleaved; the oracle replays the ratio-first normalization
    // and the unrolled interleave literally. LayoutSpec measures the
    // actual file-level pruning the layout buys.
    "q_layout_zorder" -> QueryDef(
      (s, dir) => {
        val o = Tables.table(s, dir, "orders")
          .withColumn("ts_sec", unix_timestamp(col("o_orderdate")))
        graft.operators.Layout.zorderBy(o, "o_custkey", "ts_sec",
            partitions = 8)
          .select("o_orderkey", "z_value")
      },
      Some(s"""WITH b AS (SELECT
          min(o_custkey) AS amn, max(o_custkey) AS amx,
          min(CAST(epoch(o_orderdate) AS BIGINT)) AS bmn,
          max(CAST(epoch(o_orderdate) AS BIGINT)) AS bmx FROM orders),
        n AS (SELECT o_orderkey,
            CAST(floor((o_custkey - amn) / (amx - amn) * 65535)
              AS BIGINT) AS na,
            CAST(floor((CAST(epoch(o_orderdate) AS BIGINT) - bmn)
              / (bmx - bmn) * 65535) AS BIGINT) AS nb
          FROM orders, b)
        SELECT o_orderkey,
          CAST(${duckInterleave("na", "nb", 16)} AS BIGINT) AS z_value
        FROM n"""),
    ),

    // --- events (temporal + json-ish props) ------------------------------
    "q_events_hourly" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sum(dec(col("value"), 18, 4)).cast("double").as("sum_value"))
      },
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
              event_type, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
              FROM events GROUP BY 1, 2"""),
    ),

    // time-RANGE window frame (vs q_window_running's ROWS frame): per
    // user, events and value seen in the trailing hour — the sliding
    // rate-limit / velocity feature. RANGE frames need no unique tie
    // order for aggregates (all peers share the frame), so the count is
    // deterministic on the epoch-micros axis both engines share
    "q_window_range_frame" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us"))
          .rangeBetween(-3600L * 1000000L, 0L)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            dec(col("value"), 18, 4).as("v"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            count(lit(1)).over(w).as("n_last_hour"),
            sum(col("v")).over(w).cast("double").as("sum_last_hour"))
      },
      Some("""SELECT user_id, event_id,
          CAST(epoch_us(ts) AS BIGINT) AS ts_us,
          CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
          CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
            AS sum_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""),
    ),

    // user-journey transition table (Streams.transitionCounts): counts of
    // (prev event type -> event type) edges per user timeline, stream
    // starts as '^start' — the lag window replayed verbatim
    "q_events_transitions" -> QueryDef(
      (s, dir) => graft.streaming.Streams.transitionCounts(
        Tables.events(s, dir)),
      Some("""WITH t AS (SELECT
            coalesce(lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts ASC, event_id ASC), '^start') AS prev_type,
            event_type AS next_type
          FROM events)
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM t GROUP BY 1, 2"""),
    ),

    // robust outlier screen (Streams.robustAnomalies): per event type,
    // |value - median| > 3 * MAD — median/MAD so the outliers can't drag
    // the threshold; the oracle replays the exact interpolated quantiles
    // (percentile == quantile_cont) and the same IEEE comparison
    "q_events_anomaly" -> QueryDef(
      (s, dir) => graft.streaming.Streams.robustAnomalies(
        Tables.events(s, dir), "event_id", "event_type", "value", k = 3.0),
      Some("""WITH med AS (SELECT event_type,
            quantile_cont(value, 0.5) AS med
          FROM events GROUP BY 1),
        d AS (SELECT e.event_id, e.event_type, e.value, med.med,
            abs(e.value - med.med) AS absdev
          FROM events e JOIN med USING (event_type)),
        mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
          FROM d GROUP BY 1)
        SELECT d.event_id, d.event_type, d.value, d.med, mad.mad
        FROM d JOIN mad USING (event_type)
        WHERE d.absdev > 3.0 * mad.mad"""),
    ),

    "q_events_props" -> QueryDef(
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
          .groupBy("event_type").agg(
            count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
      },
      Some("""SELECT event_type, COUNT(*) AS n,
              CAST(SUM(k) AS BIGINT) AS sum_k,
              CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
              FROM (SELECT event_type,
                CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k FROM events)
              GROUP BY event_type"""),
    ),
  )
}
