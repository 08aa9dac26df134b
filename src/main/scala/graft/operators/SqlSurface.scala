package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 SQL-surface widening: ranking/frame window analytics, set
  * operators (INTERSECT/EXCEPT), GROUPING SETS, correlated subqueries,
  * positional explode (LATERAL), ordered array collection, and calendar
  * gap-filling. The reference's pandas layer reaches each of these shapes
  * (rank/shift columns, set-membership screens, multi-level dashboard
  * rollups, per-row lookups, list-column manipulation, dense date spines
  * for its daily cadence) — here each is the idiomatic Catalyst form with
  * a DuckDB oracle.
  *
  * Scale posture notes live on each query; the common theme: window
  * functions partition by a real key (never an unpartitioned ORDER BY over
  * fact data), set ops and subqueries stay as joins/aggregates Catalyst
  * can reorder, and the date spine is dimension-sized by construction.
  */
object SqlSurface {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Ranking + frame window pack: row_number / ntile / percent_rank /
    // cume_dist / first / last / lag over a per-customer order timeline.
    // One shuffle (hash by o_custkey); within-partition sort only — no
    // global sort, no single-task window (the r03 percentile lesson).
    // Ties are broken by o_orderkey so the rank family is deterministic
    // and percent_rank/cume_dist see no peer groups on either engine.
    "q_window_analytics" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("day_no"), col("o_orderkey"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        // integer day number (epoch days) — timestamp-vs-date datediff
        // semantics differ across engines, integer subtraction doesn't
        .withColumn("day_no",
          datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01"))).cast("long"))
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).cast("long").as("seq"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"),
          first(col("o_orderkey")).over(w).as("first_ok"),
          last(col("o_orderkey")).over(wAll).as("last_ok"),
          (col("day_no") - lag(col("day_no"), 1).over(w)).as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Set operators: INTERSECT / EXCEPT over per-status customer sets.
    // Both compile to aggregate + join (Catalyst rewrites INTERSECT to a
    // left-semi over distincts, EXCEPT to left-anti) — shuffle on the set
    // key only, dimension-sized exchanges at any fact scale.
    "q_set_ops" -> { (s, d) =>
      val o = Tables.orders(s, d)
      def custs(status: String) =
        o.filter(col("o_orderstatus") === status).select("o_custkey").distinct()
      val f = custs("F"); val open = custs("O")
      f.intersect(open).withColumn("op", lit("both"))
        .unionByName(f.except(open).withColumn("op", lit("f_only")))
        .orderBy("op", "o_custkey")
    },

    // GROUPING SETS with grouping_id: the dashboard lattice shapes CUBE/
    // ROLLUP can't express (two independent single-column slices + grand
    // total, nothing else). One pass — Spark expands the sets inside a
    // single Expand+Aggregate, so the fact is scanned once regardless of
    // how many sets are requested.
    "q_grouping_sets" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |  coalesce(o_orderpriority, 'ALL') AS priority,
          |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
          |  count(*) AS n,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          |FROM v_orders
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY gid, status, priority""".stripMargin)
    },

    // Correlated subqueries: EXISTS (decorrelated by Catalyst to a
    // left-semi join), a correlated scalar COUNT (left outer + aggregate),
    // and an uncorrelated scalar threshold. The money comparison runs in
    // exact DECIMAL on both engines (price·N > Σprice) — a float average
    // would let boundary rows flip on summation order.
    "q_subqueries" -> { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("v_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("v_lineitem")
      s.sql(
        """SELECT o_orderkey, o_totalprice,
          |  (SELECT count(*) FROM v_lineitem l
          |    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 25) AS n_heavy
          |FROM v_orders o
          |WHERE EXISTS (SELECT 1 FROM v_lineitem l
          |        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.5)
          |  AND CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM v_orders)
          |      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM v_orders)
          |ORDER BY o_orderkey""".stripMargin)
    },

    // RECURSIVE CTE (Spark 4's WITH RECURSIVE / UnionLoop): a compounded
    // quarterly revenue index — index_q = index_{q−1} · rev_q div
    // rev_{q−1} in integer ppm, re-based at quarter 1. Genuinely
    // recursive: the per-step integer floor makes the index
    // path-dependent, so no window/exp-sum-log rewrite reproduces it —
    // this is the SQL-surface recursion gate, not a gap-fill in
    // disguise. The recursion frame is QUARTER-cardinality (~27 rows;
    // recursion limit 100 default), built from one fact aggregate — the
    // 100 TB scan happens once, the loop never touches the fact again.
    // UnionLoop pays one driver-loop step per row (~0.15 s each), so
    // the spine unit IS the latency knob: monthly (80 steps) measured
    // 12 s steady at sf0.1, quarterly ~1/3 of that. The spine is
    // densified by row_number (bounded window) so a missing quarter
    // can't silently stop the loop on one engine only.
    "q_recursive_cte" -> { (s, d) =>
      import graft.CacheScope.TrackedDataset
      // the fact aggregate runs ONCE, outside the loop: UnionLoop
      // re-evaluates every plan it references per iteration, so an
      // inline `monthly` CTE would re-scan orders ~84 times (measured
      // 35 s at sf0.1; cached month frame: the loop joins 84 rows)
      val quarterly = Tables.orders(s, d)
        .groupBy((year(col("o_orderdate")) * 10 +
          quarter(col("o_orderdate"))).as("quarter_key"))
        .agg(sum((col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long")).as("sc"))
        .select(col("quarter_key").cast("long").as("quarter_key"),
          expr("sc div 100").as("rev"))
        .withColumn("m", row_number().over(
          Window.orderBy("quarter_key")).cast("long")) // quarter-cardinality
        .persistTracked()
      quarterly.createOrReplaceTempView("v_quarterly")
      // pre-join consecutive quarters OUTSIDE the loop: the recursive step
      // referenced v_quarterly twice, so UnionLoop built TWO broadcasts per
      // iteration (~7 jobs/step, 197 jobs total measured); one cached pair
      // frame halves the per-step work. (rev2, rev1) come off the same
      // pre-joined row the two joins produced — arithmetic identical.
      val qPairs = quarterly.as("a")
        .join(quarterly.as("b"), col("b.m") === col("a.m") + 1)
        .select(col("a.m").as("m"), col("a.rev").as("rev1"),
          col("b.rev").as("rev2"))
        .coalesce(1).persistTracked()
      qPairs.createOrReplaceTempView("v_qpairs")
      s.sql(
        """WITH RECURSIVE idx AS (
          | SELECT CAST(1 AS BIGINT) AS m, CAST(1000000 AS BIGINT) AS index_ppm
          | UNION ALL
          | SELECT i.m + CAST(1 AS BIGINT) AS m,
          |  (i.index_ppm * p.rev2) div p.rev1 AS index_ppm
          | FROM idx i
          | JOIN v_qpairs p ON p.m = i.m)
          |SELECT mo.quarter_key, mo.rev AS rev_dollars, i.index_ppm
          |FROM idx i JOIN v_quarterly mo ON mo.m = i.m
          |ORDER BY mo.quarter_key""".stripMargin)
    },

    // LATERAL-style positional explode: token + position per document.
    // posexplode is a generator, not a join — map-side, zero shuffle; the
    // downstream ORDER BY is the driver-gate determinism requirement, not
    // part of the operator.
    "q_lateral_explode" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "token")))
        .withColumn("pos", col("pos").cast("long"))
        .orderBy("doc_id", "pos")
    },

    // Ordered array collection: sort_array(collect_list) for a stable
    // cross-engine rendering (collect_list order is partition-dependent;
    // the sort makes it canonical), emitted as a joined string so the
    // hash compare is representation-independent. One shuffle on the
    // group key; arrays are bounded by per-order line count (≤7).
    "q_collect_ops" -> { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(
          array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("lines"),
          array_join(array_sort(collect_set(col("l_returnflag"))), ",").as("flags"))
        .orderBy("l_orderkey")
    },

    // DYNAMIC pivot — no fixed value list: Spark runs the distinct-
    // collection job first (the discovery cost q_a2_pivot's fixed list
    // avoids; both belong in the API). At scale the discovery is one
    // bounded-output aggregate; keep fixed lists when the schema is
    // contractual (the reference's 21-column bbox contract) and dynamic
    // when it's exploratory.
    "q_pivot_dynamic" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus")
        .agg(count(lit(1)))
        .na.fill(0)
        .orderBy("priority")
    },

    // UNPIVOT / melt — wide measures to long (id, measure, val) rows:
    // the inverse surface (Spark's Expand node, map-side ×3, no shuffle;
    // describeAll uses the same melt trick internally).
    "q_unpivot" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // Semi-structured column handling: from_json with an explicit schema
    // (the lake-table JSON-props shape — the reference's Kafka envelope
    // decode applied to a batch column). The parse is a codegen'd
    // expression, map-side; only the bounded per-type aggregate shuffles.
    // The oracle extracts the same field with regexp (engine-neutral).
    "q_json_extract" -> { (s, d) =>
      import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
      Tables.events(s, d)
        .withColumn("k",
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          countDistinct(col("k")).as("dk"))
        .orderBy("event_type")
    },

    // VARIANT (Spark 4's semi-structured type): parse_json once into a
    // binary variant column, then variant_get per access — schema-on-read
    // without declaring a struct up front, and the decoded binary form is
    // cheaper to re-access than re-parsing JSON text per field (the
    // shredded-variant storage path at scale). Same aggregate contract as
    // q_json_extract, so the two extraction surfaces gate against the
    // same ground truth.
    "q_variant_extract" -> { (s, d) =>
      Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", try_variant_get(col("v"), "$.k", "long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          countDistinct(col("k")).as("dk"))
        .orderBy("event_type")
    },

    // Functional-dependency profiling — does a → b hold? The key-
    // discovery / dimension-design audit (the reference hand-picked its
    // 8 natural keys; this op is how you find them on new data). One
    // pass per dependency: groupBy(a) + countDistinct(b), violations =
    // groups where b isn't unique. Shuffle keys = distinct a values,
    // map-side combined; output is one audit row per dependency.
    "q_fd_profile" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      def audit(df: DataFrame, a: String, b: String, dep: String) =
        df.groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
          .agg(lit(dep).as("dependency"),
            count(lit(1)).as("n_lhs_values"),
            sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violations"))
      audit(li.join(o, col("l_orderkey") === col("o_orderkey")),
          "l_orderkey", "o_custkey", "l_orderkey->o_custkey")
        .unionByName(audit(li, "l_partkey", "l_suppkey", "l_partkey->l_suppkey"))
        .unionByName(audit(o, "o_orderkey", "o_orderstatus", "o_orderkey->o_orderstatus"))
        .orderBy("dependency")
    },

    // Typed cogroup — KeyValueGroupedDataset.cogroup over case-class-
    // encoded rows: the per-key escape hatch when relational operators
    // can't express group logic (here a header-vs-lines reconciliation in
    // exact integer cents; real uses: order matching, session stitching,
    // custom merge rules). ONE co-partitioned shuffle on the key, per-key
    // iterator streams, state bounded by lines-per-order — never a
    // collect, never a cartesian. Money flows through DECIMAL→cents
    // Longs so the Scala-side sum is exact and engine-neutral.
    "q_cogroup_audit" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val o = Tables.orders(s, d).select(col("o_orderkey"),
          (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("order_cents")).as[(Long, Long)]
      val l = Tables.lineitem(s, d).select(col("l_orderkey"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long")
            .as("cents")).as[(Long, Long)]
      o.groupByKey(_._1).cogroup(l.groupByKey(_._1)) { (k, os, ls) =>
          val header = os.toSeq
          if (header.isEmpty) Iterator.empty // orphan lines: none by FK
          else {
            var n = 0L; var sum = 0L
            ls.foreach { case (_, c) => n += 1; sum += c }
            Iterator((k, header.head._2, n, sum))
          }
        }
        .toDF("o_orderkey", "order_cents", "n_lines", "line_cents")
        .orderBy("o_orderkey")
    },

    // Calendar gap-fill: dense date spine (min..max order day) left-joined
    // to daily counts, absent days as 0 — the daily-cadence dashboard
    // shape (the reference's Airflow runs daily; gaps mean missed runs).
    // The spine derives from a 1-row aggregate and explodes to ~2.5k rows
    // — broadcast side of the join; the daily aggregate is the only
    // fact-sized work (one shuffle, map-side combined, date-bounded keys).
    "q_gap_fill" -> { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val spine = daily.agg(min("day").as("lo"), max("day").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .na.fill(0, Seq("n"))
        .orderBy("day")
    }
  )

  def oracles: Map[String, String] = Map(
    "q_window_analytics" ->
      """WITH o AS (SELECT *, CAST(datediff('day', DATE '1970-01-01',
        |                     CAST(o_orderdate AS DATE)) AS BIGINT) AS day_no
        |           FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS seq,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |    ORDER BY day_no, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
        |  day_no - lag(day_no) OVER w AS days_since_prev
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_set_ops" ->
      """WITH fc AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |oc AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_custkey, 'both' AS op
        |  FROM (SELECT * FROM fc INTERSECT SELECT * FROM oc)
        |UNION ALL
        |SELECT o_custkey, 'f_only' AS op
        |  FROM (SELECT * FROM fc EXCEPT SELECT * FROM oc)
        |ORDER BY op, o_custkey""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, priority""".stripMargin,
    "q_subqueries" ->
      """SELECT o_orderkey, o_totalprice,
        |  (SELECT count(*) FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 25) AS n_heavy
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49.5)
        |  AND CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT count(*) FROM orders)
        |      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "q_fd_profile" ->
      """WITH d1 AS (
        | SELECT 'l_orderkey->o_custkey' AS dependency,
        |  count(*) AS n_lhs_values,
        |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        | FROM (SELECT l_orderkey, count(DISTINCT o_custkey) AS nb
        |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |       GROUP BY l_orderkey)),
        |d2 AS (
        | SELECT 'l_partkey->l_suppkey', count(*),
        |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
        | FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nb
        |       FROM lineitem GROUP BY l_partkey)),
        |d3 AS (
        | SELECT 'o_orderkey->o_orderstatus', count(*),
        |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
        | FROM (SELECT o_orderkey, count(DISTINCT o_orderstatus) AS nb
        |       FROM orders GROUP BY o_orderkey))
        |SELECT * FROM d1 UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3
        |ORDER BY dependency""".stripMargin,
    "q_cogroup_audit" ->
      """SELECT o_orderkey,
        | CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS order_cents,
        | count(l_orderkey) AS n_lines,
        | CAST(coalesce(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)), 0) AS BIGINT) AS line_cents
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q_pivot_dynamic" ->
      """SELECT o_orderpriority AS priority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, m AS measure,
        | CASE m WHEN 'l_quantity' THEN l_quantity
        |        WHEN 'l_extendedprice' THEN l_extendedprice
        |        ELSE l_discount END AS val
        |FROM lineitem
        |CROSS JOIN (SELECT unnest(['l_quantity', 'l_extendedprice', 'l_discount']) AS m)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    "q_json_extract" ->
      """WITH p AS (SELECT event_type,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        | FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        | min(k) AS min_k, max(k) AS max_k, count(DISTINCT k) AS dk
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_variant_extract" ->
      """WITH p AS (SELECT event_type,
        |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        | FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        | min(k) AS min_k, max(k) AS max_k, count(DISTINCT k) AS dk
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_recursive_cte" ->
      """WITH RECURSIVE monthly AS (
        | SELECT quarter_key, rev,
        |  CAST(row_number() OVER (ORDER BY quarter_key) AS BIGINT) AS m
        | FROM (SELECT (year(o_orderdate) * 10 + quarter(o_orderdate)) AS quarter_key,
        |        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) // 100 AS rev
        |       FROM orders GROUP BY 1)),
        |idx(m, index_ppm) AS (
        | SELECT CAST(1 AS BIGINT), CAST(1000000 AS BIGINT)
        | UNION ALL
        | SELECT i.m + 1, (i.index_ppm * m2.rev) // m1.rev
        | FROM idx i
        | JOIN monthly m1 ON m1.m = i.m
        | JOIN monthly m2 ON m2.m = i.m + 1)
        |SELECT CAST(mo.quarter_key AS BIGINT) AS quarter_key,
        | mo.rev AS rev_dollars, i.index_ppm
        |FROM idx i JOIN monthly mo ON mo.m = i.m
        |ORDER BY mo.quarter_key""".stripMargin,
    // DuckDB zips same-SELECT unnests, reproducing posexplode
    "q_lateral_explode" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 97 = 0)
        |SELECT doc_id,
        |  CAST(unnest(range(0, len(toks))) AS BIGINT) AS pos,
        |  unnest(toks) AS token
        |FROM t
        |ORDER BY doc_id, pos""".stripMargin,
    "q_collect_ops" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
        |  array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_gap_fill" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
        |               FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b)
        |SELECT s.day, coalesce(n, 0) AS n
        |FROM spine s LEFT JOIN daily USING (day)
        |ORDER BY day""".stripMargin
  )
}
