package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity relational operators (SURVEY.md §2), each expressed as
  * an idiomatic lazy Catalyst plan over the driver testdata. Spark does the
  * optimizing: filters/projections reach the parquet scan, small dimensions
  * are broadcast, aggregates get map-side partial combine.
  *
  * Reference provenance is cited per query (file:line under
  * /root/reference).
  */
object RelationalQueries {

  import Tables.tbl

  def defs: Seq[QueryDef] = Seq(

    // ----- scans / filters (SURVEY §2.1, §2.3) -----

    // S2: filtered scan + projection pushdown
    // (ref: upload_data/Submissions/round3/make_round3_prediction_files.R:58-63)
    QueryDef(
      "s2_pushdown_scan",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")
            && col("l_quantity") > 45)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00' AND l_quantity > 45""".stripMargin)),

    // P5/P6/P7: equality + null + set-membership predicates
    // (ref: make_round3_prediction_files.R:70,236-237; upload_round1_patients.R:23)
    QueryDef(
      "p5_in_set_filter",
      (s, dir) =>
        tbl(s, dir, "orders")
          .filter(col("o_orderstatus") === "O"
            && col("o_totalprice").isNotNull
            && col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
          .select("o_orderkey", "o_totalprice", "o_orderpriority"),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority
             |FROM orders
             |WHERE o_orderstatus = 'O' AND o_totalprice IS NOT NULL
             |  AND o_orderpriority IN ('1-URGENT','2-HIGH')""".stripMargin)),

    // P8: regex predicate (ref: upload_round1_variants.R:92-93)
    QueryDef(
      "p8_regex_filter",
      (s, dir) =>
        tbl(s, dir, "customer")
          .filter(col("c_name").rlike("00$"))
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE regexp_matches(c_name, '00$')""".stripMargin)),

    // P9: timestamp-range predicate (ref: round_12_setup/annotate_r1_files.R:8,17)
    QueryDef(
      "p9_ts_range",
      (s, dir) =>
        tbl(s, dir, "events")
          .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp")
            && col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
          .select("event_id", "user_id", "ts"),
      Some("""SELECT event_id, user_id, ts FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND ts <  TIMESTAMP '2024-01-20 00:00:00'""".stripMargin)),

    // ----- joins (SURVEY §2.4) -----

    // J1: inner equi-join, dims broadcast (ref: upload_round1_submissions.R:50-51)
    QueryDef(
      "j1_inner_join",
      (s, dir) => {
        val orders = tbl(s, dir, "orders")
        val customer = tbl(s, dir, "customer")
        val nation = tbl(s, dir, "nation")
        orders
          .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"))
          .agg(round(sum("o_totalprice"), 2).as("revenue"),
            count(lit(1)).as("n_orders"))
      },
      Some("""SELECT n_name AS nation, round(sum(o_totalprice),2) AS revenue,
             |       count(*) AS n_orders
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // J2: left outer join (ref: upload_round1_submissions.R:52)
    QueryDef(
      "j2_left_join",
      (s, dir) =>
        tbl(s, dir, "customer")
          .join(tbl(s, dir, "orders"), col("o_custkey") === col("c_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count("o_orderkey").as("n_orders"),
            round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_price")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
             |       round(coalesce(sum(o_totalprice),0),2) AS total_price
             |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |GROUP BY c_custkey""".stripMargin)),

    // J3: right outer join (ref: upload_round1_variants.R:150-152)
    QueryDef(
      "j3_right_join",
      (s, dir) =>
        tbl(s, dir, "orders")
          .join(tbl(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "right")
          .groupBy("c_nationkey")
          .agg(count("o_orderkey").as("n_orders"),
            countDistinct("c_custkey").as("n_customers")),
      Some("""SELECT c_nationkey, count(o_orderkey) AS n_orders,
             |       count(DISTINCT c_custkey) AS n_customers
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_nationkey""".stripMargin)),

    // J4: full outer join of two aggregates (ref: Teams/upload_team_tables.R:25-26)
    QueryDef(
      "j4_full_outer_join",
      (s, dir) => {
        val ev = tbl(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id").as("cu")).agg(count(lit(1)).as("n_clicks"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("pu")).agg(count(lit(1)).as("n_purchases"))
        clicks.join(purchases, col("cu") === col("pu"), "full")
          .select(coalesce(col("cu"), col("pu")).as("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      },
      Some("""SELECT coalesce(a.user_id, b.user_id) AS user_id,
             |       coalesce(n_clicks, 0) AS n_clicks,
             |       coalesce(n_purchases, 0) AS n_purchases
             |FROM (SELECT user_id, count(*) AS n_clicks FROM events
             |      WHERE event_type = 'click' GROUP BY user_id) a
             |FULL JOIN (SELECT user_id, count(*) AS n_purchases FROM events
             |      WHERE event_type = 'purchase' GROUP BY user_id) b
             |  ON a.user_id = b.user_id""".stripMargin)),

    // J5: left-anti join — the idempotency gate
    // (ref: project_setup/late_setup/extract_submission_files.R:109)
    // Right side filtered to URGENT orders: every customer has SOME order
    // in the driver testdata, so the unfiltered anti-join was a vacuous
    // 0-row oracle (round-1 verdict); 18/203/1986 customers lack an
    // URGENT order at sf0.001/0.01/0.1.
    QueryDef(
      "j5_anti_join",
      (s, dir) =>
        tbl(s, dir, "customer")
          .join(
            tbl(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |    AND o.o_orderpriority = '1-URGENT')""".stripMargin)),

    // J6: left-semi join (ref: late_round12/upload_submissions.R:43)
    QueryDef(
      "j6_semi_join",
      (s, dir) =>
        tbl(s, dir, "part")
          .join(tbl(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_semi")
          .select("p_partkey", "p_name"),
      Some("""SELECT p_partkey, p_name FROM part p
             |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)""".stripMargin)),

    // ----- aggregations (SURVEY §2.5) -----

    // flagship: grouped multi-aggregate (TPC-H Q1 shape; ref pattern A1/A4)
    QueryDef(
      "q1_agg",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum("l_quantity"), 2).as("sum_qty"),
            round(sum("l_extendedprice"), 2).as("sum_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            count(lit(1)).as("n_rows")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity),2) AS sum_qty,
             |  round(sum(l_extendedprice),2) AS sum_price,
             |  round(sum(l_extendedprice * (1 - l_discount)),2) AS sum_disc_price,
             |  round(avg(l_quantity),4) AS avg_qty,
             |  count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // A1+A2: group count + HAVING (ref: make_round3_prediction_files.R:230-232)
    // threshold 75 sits just under the per-user p90 at every driver SF
    // (max 86-99, p90 ≈74-78), so the HAVING keeps a real non-empty slice —
    // round-1's 150 exceeded every count and the oracle hashed nothing.
    QueryDef(
      "a2_having",
      (s, dir) =>
        tbl(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_events"))
          .filter(col("n_events") >= 75),
      Some("""SELECT user_id, count(*) AS n_events FROM events
             |GROUP BY user_id HAVING count(*) >= 75""".stripMargin)),

    // A3: group argmax / majority vote (ref: upload_round1_variants.R:123-126)
    QueryDef(
      "a3_group_argmax",
      (s, dir) => {
        val counts = tbl(s, dir, "events")
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("n").desc, col("event_type"))
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("top_type"), col("n"))
      },
      Some("""SELECT user_id, event_type AS top_type, n FROM (
             |  SELECT user_id, event_type, count(*) AS n,
             |         row_number() OVER (PARTITION BY user_id
             |                            ORDER BY count(*) DESC, event_type) AS rn
             |  FROM events GROUP BY user_id, event_type)
             |WHERE rn = 1""".stripMargin)),

    // A3b: majority-vote offset reconciliation — the reference's most
    // intricate multi-operator composition after entry point B
    // (ref: upload_round1_variants.R:113-152): compute diff = VAR_ID -
    // VAR_N where both ids are present, majority-vote the diff per
    // submission, re-key EVERY row with the voted offset, right-join back
    // onto the observation set. Here: per-user offset = user_id % 7,
    // rows with event_id % 5 = 0 lost their var_n (the repair target) and
    // rows with event_id % 11 = 0 carry a WRONG offset (the minority the
    // vote must outvote). Ties break on min(diff) — deterministic, where
    // the reference's filter(count == max(count)) keeps all tied rows.
    QueryDef(
      "a3b_offset_reconcile",
      (s, dir) => {
        val obs = tbl(s, dir, "events")
          .select(col("user_id"), col("event_id"))
          .withColumn("var_n",
            when(col("event_id") % 5 === 0, lit(null).cast("long"))
              .when(col("event_id") % 11 === 0,
                col("event_id") - (col("user_id") % 7) - 3)
              .otherwise(col("event_id") - (col("user_id") % 7)))
        val diffs = obs.filter(col("var_n").isNotNull)
          .groupBy(col("user_id"), (col("event_id") - col("var_n")).as("diff"))
          .agg(count(lit(1)).as("n"))
        val wVote = Window.partitionBy("user_id")
          .orderBy(col("n").desc, col("diff"))
        val voted = diffs.withColumn("rn", row_number().over(wVote))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("diff"))
        voted.join(obs, Seq("user_id"), "right")
          .select(col("user_id"), col("event_id"),
            (col("event_id") - col("diff")).as("source_row_n"))
      },
      Some("""WITH obs AS (
             |  SELECT user_id, event_id,
             |         CASE WHEN event_id % 5 = 0 THEN NULL
             |              WHEN event_id % 11 = 0 THEN event_id - (user_id % 7) - 3
             |              ELSE event_id - (user_id % 7) END AS var_n
             |  FROM events),
             |diffs AS (
             |  SELECT user_id, event_id - var_n AS diff, count(*) AS n
             |  FROM obs WHERE var_n IS NOT NULL GROUP BY 1, 2),
             |voted AS (
             |  SELECT user_id, diff FROM (
             |    SELECT user_id, diff,
             |           row_number() OVER (PARTITION BY user_id
             |                              ORDER BY n DESC, diff) AS rn
             |    FROM diffs) WHERE rn = 1)
             |SELECT o.user_id, o.event_id, o.event_id - v.diff AS source_row_n
             |FROM voted v RIGHT JOIN obs o ON o.user_id = v.user_id""".stripMargin)),

    // A4: group-and-gather collect_set → delimited string
    // (ref: make_round3_prediction_files.R:167-173; sorted for determinism)
    QueryDef(
      "a4_collect_gather",
      (s, dir) =>
        tbl(s, dir, "events")
          .groupBy("user_id")
          .agg(array_join(array_sort(collect_set("event_type")), ";").as("types"),
            countDistinct("event_type").as("n_types")),
      Some("""SELECT user_id,
             |       string_agg(DISTINCT event_type, ';' ORDER BY event_type) AS types,
             |       count(DISTINCT event_type) AS n_types
             |FROM events GROUP BY user_id""".stripMargin)),

    // A5: distinct (ref: upload_round1_variants.R:101-102)
    QueryDef(
      "a5_distinct",
      (s, dir) =>
        tbl(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // ----- windows (SURVEY §2.6 — the CDC dedup core) -----

    // W1: latest-per-key, ties broken by id — THE north-star dedup
    // (ref: project_setup/round3_setup/extract_submission_files.R:96-99)
    QueryDef(
      "w1_latest_per_key",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        tbl(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("ts").as("last_ts"), col("event_type").as("last_type"),
            col("value").as("last_value"))
      },
      Some("""SELECT user_id, event_id AS last_event_id, ts AS last_ts,
             |       event_type AS last_type, value AS last_value
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
             |WHERE rn = 1""".stripMargin)),

    // W1b: the same latest-per-key dedup through the salted two-phase
    // physical strategy (north star: salted repartitioning for hot keys).
    // Same oracle as w1 — different plan, identical result.
    QueryDef(
      "w1b_salted_dedup",
      (s, dir) =>
        graft.cdc.Dedup.latestPerKeySalted(
          tbl(s, dir, "events")
            .select(col("event_id").as("lsn"), col("user_id").as("url"),
              col("ts").as("warc_ts"), col("event_type"), col("value")),
          key = "url", orderCols = Seq("warc_ts", "lsn"), numSalts = 8)
          .select(col("url").as("user_id"), col("lsn").as("last_event_id"),
            col("warc_ts").as("last_ts"), col("event_type").as("last_type"),
            col("value").as("last_value")),
      Some("""SELECT user_id, event_id AS last_event_id, ts AS last_ts,
             |       event_type AS last_type, value AS last_value
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
             |WHERE rn = 1""".stripMargin)),

    // W2: best-per-key winners + loser (conflict) routing
    // (ref: make_round3_prediction_files.R:92-103 → Bad_Predictions)
    QueryDef(
      "w2_conflict_losers",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        tbl(s, dir, "events")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") > 1)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_conflicts"),
            min("event_id").as("first_loser"))
      },
      Some("""SELECT user_id, count(*) AS n_conflicts, min(event_id) AS first_loser
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
             |WHERE rn > 1 GROUP BY user_id""".stripMargin)),

    // W3: row-number within group (ref: round_x_setup/extract_submission_files.R:103-106)
    QueryDef(
      "w3_rownum_in_group",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        tbl(s, dir, "events")
          .select(col("event_id"), col("user_id"), row_number().over(w).as("rn"))
      },
      Some("""SELECT event_id, user_id,
             |       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |FROM events""".stripMargin)),

    // W4: global stable row-number over a total order
    // (ref: make_round3_prediction_files.R:144 SOURCE_ROW_N). The 100-TB
    // plan — never a single-partition Window.orderBy, never
    // monotonically_increasing_id (SURVEY §7.4): split the key space at
    // EXPLICIT boundary literals (one driver-collected percentile job),
    // rank within each range, add broadcast cumulative offsets. Because
    // the range id is a pure function of the row's own key against plan
    // literals, the offsets job and the rank job agree by construction —
    // correctness depends on no checkpoint/cache surviving (the round-2
    // localCheckpoint pinned blocks to executors: one lost executor made
    // the query unrecoverable on a cluster, and a silent recompute could
    // shift RangePartitioner boundaries — round-2 verdict #1).
    QueryDef(
      "w4_global_rownum",
      (s, dir) => {
        val parts = s.sessionState.conf.numShufflePartitions
        val keyed = tbl(s, dir, "events")
          .select(col("event_id"), col("ts"),
            unix_micros(col("ts").cast("timestamp")).as("_k"))
        // balanced split points of the sort key — approximate is fine
        // (imbalance costs time, never correctness) and the sketch agg is
        // one narrow map-combined pass
        val probs = (1 until parts).map(_.toDouble / parts)
        val cuts = keyed
          .agg(percentile_approx(col("_k"), typedLit(probs), lit(10000)).as("c"))
          .head().getSeq[Long](0).distinct.sorted
        // range id = #cuts below the row's key: equal keys always land in
        // the same range, so per-range (ts, event_id) order concatenates
        // to exactly the global (ts, event_id) order
        val rid = cuts.foldLeft(lit(0)) { (acc, c) =>
          acc + when(col("_k") >= lit(c), 1).otherwise(0)
        }
        val ranged = keyed.withColumn("_rid", rid)
        // per-range counts → cumulative offsets: O(parts) rows of range
        // METADATA on the driver, not data
        val offsets = ranged.groupBy("_rid").count()
          .collect().map(r => (r.getInt(0), r.getLong(1)))
          .sortBy(_._1)
          .scanLeft((0, 0L, 0L)) { case ((_, _, cum), (pid, n)) =>
            (pid, cum, cum + n)
          }.drop(1).map { case (pid, off, _) => (pid, off) }
        val offDf = broadcast(s.createDataFrame(offsets.toSeq).toDF("_rid", "_off"))
        val wLocal = Window.partitionBy("_rid").orderBy(col("ts"), col("event_id"))
        ranged
          .withColumn("_rn", row_number().over(wLocal))
          .join(offDf, "_rid")
          .select(col("event_id"),
            (col("_off") + col("_rn")).cast("int").as("source_row_n"))
      },
      Some("""SELECT event_id,
             |       CAST(row_number() OVER (ORDER BY ts, event_id) AS INTEGER) AS source_row_n
             |FROM events""".stripMargin)),

    // W6: gap-based sessionization — the canonical event-stream op a
    // web-analytics pipeline needs at scale. Both windows partition by
    // user_id (shuffle once on the key, sort within partition; no global
    // window), so the plan scales with users. 30-min inactivity gap.
    QueryDef(
      "w6_sessionize",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val ms = unix_millis(col("ts").cast("timestamp"))
        val gap = ms - lag(ms, 1).over(w)
        tbl(s, dir, "events")
          .withColumn("brk", when(gap > 30L * 60000L, 1L).otherwise(0L))
          .withColumn("session_n", sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_n")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            round(sum("value"), 2).as("session_value"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id, value,
             |         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER
             |                (PARTITION BY user_id ORDER BY ts, event_id))
             |              > 30 * 60000 THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |x AS (
             |  SELECT user_id, ts, value,
             |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS session_n
             |  FROM g)
             |SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
             |       count(*) AS n_events, min(ts) AS session_start,
             |       round(sum(value), 2) AS session_value
             |FROM x GROUP BY user_id, session_n""".stripMargin)),

    // ----- sort / top-k (SURVEY §2.7) -----

    QueryDef(
      "o1_topk",
      (s, dir) =>
        tbl(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select("o_orderkey", "o_totalprice")
          .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ----- set ops (SURVEY §2.8) -----

    // U1: schema-merging union (bind_rows semantics: missing cols → null)
    // (ref: make_round3_prediction_files.R:79; allowMissingColumns is load-bearing)
    QueryDef(
      "u1_union_by_name",
      (s, dir) => {
        val a = tbl(s, dir, "events")
          .select(col("event_id").as("id"), col("event_type").as("kind"))
        val b = tbl(s, dir, "orders")
          .select(col("o_orderkey").as("id"), col("o_totalprice").as("amount"))
        a.unionByName(b, allowMissingColumns = true)
      },
      Some("""SELECT event_id AS id, event_type AS kind, CAST(NULL AS DOUBLE) AS amount
             |FROM events
             |UNION ALL
             |SELECT o_orderkey AS id, CAST(NULL AS VARCHAR) AS kind, o_totalprice AS amount
             |FROM orders""".stripMargin)),

    // ----- explode / reshape (SURVEY §2.9) -----

    // R1: explode delimited string (ref: make_round3_prediction_files.R:132-138)
    QueryDef(
      "r1_explode_split",
      (s, dir) =>
        tbl(s, dir, "part")
          .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word")),
      Some("""SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
             |FROM part""".stripMargin)),

    // R2: explode array column (ref: make_round3_prediction_files.R:82-90 unnest)
    QueryDef(
      "r2_explode_array",
      (s, dir) =>
        tbl(s, dir, "embeddings")
          .select(col("vec_id"), explode(col("embedding")).as("component")),
      Some("SELECT vec_id, unnest(embedding) AS component FROM embeddings")),

    // R3: pivot long→wide (ref: make_round3_prediction_files.R:71 spread)
    QueryDef(
      "r3_pivot",
      (s, dir) => {
        val kinds = Seq("click", "error", "purchase", "signup", "view")
        val p = tbl(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", kinds)
          .agg(count(lit(1)))
        p.select(col("user_id") +: kinds.map(k => coalesce(col(k), lit(0L)).as(k)): _*)
      },
      Some("""SELECT user_id,
             |  count(*) FILTER (WHERE event_type='click')    AS click,
             |  count(*) FILTER (WHERE event_type='error')    AS error,
             |  count(*) FILTER (WHERE event_type='purchase') AS purchase,
             |  count(*) FILTER (WHERE event_type='signup')   AS signup,
             |  count(*) FILTER (WHERE event_type='view')     AS view
             |FROM events GROUP BY user_id""".stripMargin)),

    // R4: unpivot wide→long (ref: Teams/upload_team_tables.R:30-33 gather)
    QueryDef(
      "r4_unpivot",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
          .unpivot(
            Array(col("l_orderkey"), col("l_linenumber")),
            Array(col("l_quantity"), col("l_discount"), col("l_tax")),
            "metric", "val"),
      Some("""SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_discount' AS metric, l_discount AS val FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, l_linenumber, 'l_tax' AS metric, l_tax AS val FROM lineitem""".stripMargin)),

    // R5: split column into columns (ref: make_round3_prediction_files.R:229 separate)
    QueryDef(
      "r5_split_col",
      (s, dir) =>
        tbl(s, dir, "orders")
          .select(col("o_orderkey"),
            split(col("o_orderpriority"), "-").getItem(0).as("pri_num"),
            split(col("o_orderpriority"), "-").getItem(1).as("pri_name")),
      Some("""SELECT o_orderkey, split_part(o_orderpriority, '-', 1) AS pri_num,
             |       split_part(o_orderpriority, '-', 2) AS pri_name
             |FROM orders""".stripMargin)),

    // R7: transpose (ref: utils.R:55-74 transpose_df via matrix t()).
    // Small-data-only BY CONTRACT, as in the reference: the output grows
    // one COLUMN per input row, so it is only ever run on driver-sized
    // frames (the reference applies it to per-submission summaries).
    // melt-to-(col,key,val) + pivot keeps it declarative; the pivot's
    // distinct-values job is the documented small-data cost.
    QueryDef(
      "r7_transpose",
      (s, dir) => {
        val src = tbl(s, dir, "region")
          .select(col("r_regionkey").cast("string").as("_k"),
            col("r_name"),
            length(col("r_name")).cast("string").as("name_len"))
        val cols = Seq("r_name", "name_len")
        val melted = src.select(col("_k"),
          explode(array(cols.map(c =>
            struct(lit(c).as("col"), col(c).as("v"))): _*)).as("e"))
          .select(col("_k"), col("e.col").as("col"), col("e.v").as("v"))
        val pivoted = melted.groupBy("col").pivot("_k").agg(first("v"))
        pivoted.select(col("col") +:
          pivoted.columns.filterNot(_ == "col").sorted
            .map(c => col(c).as(s"k$c")): _*)
      },
      Some("""SELECT 'r_name' AS col,
             |  max(CASE WHEN r_regionkey = 0 THEN r_name END) AS k0,
             |  max(CASE WHEN r_regionkey = 1 THEN r_name END) AS k1,
             |  max(CASE WHEN r_regionkey = 2 THEN r_name END) AS k2,
             |  max(CASE WHEN r_regionkey = 3 THEN r_name END) AS k3,
             |  max(CASE WHEN r_regionkey = 4 THEN r_name END) AS k4
             |FROM region
             |UNION ALL
             |SELECT 'name_len',
             |  max(CASE WHEN r_regionkey = 0 THEN CAST(length(r_name) AS VARCHAR) END),
             |  max(CASE WHEN r_regionkey = 1 THEN CAST(length(r_name) AS VARCHAR) END),
             |  max(CASE WHEN r_regionkey = 2 THEN CAST(length(r_name) AS VARCHAR) END),
             |  max(CASE WHEN r_regionkey = 3 THEN CAST(length(r_name) AS VARCHAR) END),
             |  max(CASE WHEN r_regionkey = 4 THEN CAST(length(r_name) AS VARCHAR) END)
             |FROM region""".stripMargin)),

    // ----- scalar functions (SURVEY §2.10) -----

    // F1: regex extract (ref: upload_round1_submissions.R:18)
    QueryDef(
      "f1_regexp_extract",
      (s, dir) =>
        tbl(s, dir, "customer")
          .select(col("c_custkey"),
            regexp_extract(col("c_name"), "([0-9]+)$", 1).as("cust_num")),
      Some("""SELECT c_custkey, regexp_extract(c_name, '([0-9]+)$', 1) AS cust_num
             |FROM customer""".stripMargin)),

    // F2+F5: regex replace-all + case conversion (ref: upload_round1_variants.R:40-41)
    QueryDef(
      "f2_string_clean",
      (s, dir) =>
        tbl(s, dir, "part")
          .select(col("p_partkey"),
            upper(regexp_replace(col("p_name"), "[aeiou]", "")).as("cleaned")),
      Some("""SELECT p_partkey, upper(regexp_replace(p_name, '[aeiou]', '', 'g')) AS cleaned
             |FROM part""".stripMargin)),

    // F4: deterministic surrogate key (ref: make_round3_prediction_files.R:176-181)
    QueryDef(
      "f4_surrogate_key",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .select(
            concat_ws("_", col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
              .as("line_id"),
            col("l_quantity")),
      Some("""SELECT concat_ws('_', l_orderkey, l_linenumber, l_partkey) AS line_id,
             |       l_quantity
             |FROM lineitem""".stripMargin)),

    // F6: conditional (ref: Validations/upload_round1_patients.R:38-39)
    QueryDef(
      "f6_case_when",
      (s, dir) =>
        tbl(s, dir, "orders")
          .select(col("o_orderkey"),
            when(col("o_totalprice") >= 300000, "high")
              .when(col("o_totalprice") >= 100000, "mid")
              .otherwise("low").as("bucket")),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_totalprice >= 300000 THEN 'high'
             |       WHEN o_totalprice >= 100000 THEN 'mid'
             |       ELSE 'low' END AS bucket
             |FROM orders""".stripMargin)),

    // F7: epoch-ms ↔ timestamp (ref: upload_round1_submissions.R:34)
    QueryDef(
      "f7_epoch_millis",
      (s, dir) =>
        tbl(s, dir, "events")
          // parquet ts is TIMESTAMP_NTZ; unix_millis needs LTZ (UTC session)
          .select(col("event_id"),
            unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
            timestamp_millis(unix_millis(col("ts").cast("timestamp")))
              .cast("timestamp_ntz").as("ts_rounded")),
      Some("""SELECT event_id, epoch_ms(ts) AS ts_ms,
             |       make_timestamp(epoch_ms(ts) * 1000) AS ts_rounded
             |FROM events""".stripMargin)),

    // F9: cast registry (ref: make_round3_prediction_files.R:29-46; floor to
    // avoid engine-specific double→int rounding)
    QueryDef(
      "f9_cast_registry",
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .select(col("l_orderkey").cast("string").as("key_str"),
            floor(col("l_quantity")).cast("int").as("qty_int"),
            col("l_linenumber").cast("long").as("line_long")),
      Some("""SELECT CAST(l_orderkey AS VARCHAR) AS key_str,
             |       CAST(floor(l_quantity) AS INTEGER) AS qty_int,
             |       CAST(l_linenumber AS BIGINT) AS line_long
             |FROM lineitem""".stripMargin))
  )
}
