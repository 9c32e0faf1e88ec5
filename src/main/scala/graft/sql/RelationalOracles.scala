package graft.sql

/** DuckDB oracle SQL for the relational, aggregate and multimodal entries —
  * split out of SparkEntry by operator family (round 12) and
  * assembled by [[Oracles.all]]. Statement semantics, aliases and
  * rounding are the driver-compare contract; shared fragments live
  * in [[OracleFragments]].
  */
private[graft] object RelationalOracles {
  import OracleFragments._

  val entries: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
        |    AS sum_charge,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_join" ->
      """SELECT l.l_orderkey, o.o_orderdate,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l.l_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin,
    "q5_join_chain" ->
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""".stripMargin,
    "rollup_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY g, l_returnflag, l_linestatus""".stripMargin,
    "cube_sales" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY g, l_returnflag, l_linestatus""".stripMargin,
    "grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS g
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g, l_returnflag, l_linestatus""".stripMargin,
    "semi_anti_join" ->
      """WITH big AS (SELECT DISTINCT o_custkey FROM orders
        |             WHERE o_totalprice > 250000)
        |SELECT c_mktsegment, 'has_big_order' AS kind, count(*) AS cnt
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM big)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, 'no_big_order' AS kind, count(*) AS cnt
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM big)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment, kind""".stripMargin,
    "set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT 'union' AS op, count(*) AS cnt
        |  FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT 'intersect' AS op, count(*) AS cnt
        |  FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        |UNION ALL
        |SELECT 'except' AS op, count(*) AS cnt
        |  FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        |ORDER BY op""".stripMargin,
    "set_ops_all" ->
      """WITH a AS (SELECT o_custkey, o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT o_custkey, o_orderpriority FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01')
        |SELECT 'union_all' AS op, count(*) AS cnt
        |  FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'intersect_all' AS op, count(*) AS cnt
        |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'except_all' AS op, count(*) AS cnt
        |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |ORDER BY op""".stripMargin,
    "salted_join" ->
      """SELECT s.s_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY s.s_name ORDER BY s.s_name""".stripMargin,
    "big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING round(sum(l_quantity), 2) > 150.0
        |)
        |SELECT c.c_name, o.o_orderkey, o.o_orderdate,
        |  round(o.o_totalprice, 2) AS totalprice, b.total_qty
        |FROM big b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY b.total_qty DESC, o.o_orderkey LIMIT 20""".stripMargin,
    "nation_volume" ->
      """SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE n.n_name IN ('NATION_1', 'NATION_2')
        |GROUP BY n.n_name, year(l.l_shipdate)
        |ORDER BY n_name, l_year""".stripMargin,
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        |FROM orders ORDER BY totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "agg_stats" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  count(DISTINCT c_nationkey) AS n_nations,
        |  round(min(c_acctbal), 2) AS min_bal,
        |  round(max(c_acctbal), 2) AS max_bal,
        |  round(avg(c_acctbal), 4) AS avg_bal,
        |  round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "corr_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_extendedprice), 2)
        |    AS covar_qty_price,
        |  round(stddev_samp(l_extendedprice), 4) AS std_price,
        |  round(var_samp(l_quantity), 6) AS var_qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "collect_sorted" ->
      """WITH tc AS (
        |  SELECT user_id, event_type || ':' || count(*) AS pair
        |  FROM events GROUP BY user_id, event_type
        |)
        |SELECT user_id,
        |  string_agg(pair, ',' ORDER BY pair) AS type_counts
        |FROM tc GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the fixture PNG geometry/pixels are pure doc_id arithmetic
    // (Multimodal.imgWidth/frameHeight/nFrames/pixel); the oracle
    // recomputes the dimensions and 4x4 sampled-grid checksums ImageIO
    // must recover from the DECODED pixels
    "multimodal_decode" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + (doc_id * 7) % 49 AS w,
        |    16 + (doc_id * 13) % 49 AS fh, 1 + doc_id % 4 AS nf
        |  FROM documents
        |),
        |g AS (
        |  SELECT doc_id, f.f AS f, (i.i * (w - 1)) // 3 AS x,
        |    f.f * fh + (j.j * (fh - 1)) // 3 AS y
        |  FROM d, UNNEST(range(0, nf)) f(f), UNNEST(range(0, 4)) i(i),
        |    UNNEST(range(0, 4)) j(j)
        |),
        |chk AS (
        |  SELECT doc_id, f, CAST(sum(
        |      ((x * 31 + y * 17 + doc_id * 11) % 256) * 65536
        |    + ((x * 13 + y * 29 + doc_id * 7) % 256) * 256
        |    + ((x * 7 + y * 11 + doc_id * 3) % 256)) AS BIGINT) AS chk
        |  FROM g GROUP BY 1, 2
        |),
        |agg AS (
        |  SELECT doc_id, string_agg(chk::VARCHAR, ',' ORDER BY f)
        |    AS frame_checksums
        |  FROM chk GROUP BY doc_id
        |)
        |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
        |  CAST(d.fh * d.nf AS BIGINT) AS height,
        |  CAST(d.nf AS BIGINT) AS n_frames, a.frame_checksums
        |FROM d JOIN agg a ON a.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // features = per-grid-column pixel sums over the FULL decoded image
    // (height = fh*nf); out_w/out_h = integer aspect-fit into 256
    "multimodal_featurize" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + (doc_id * 7) % 49 AS w,
        |    (16 + (doc_id * 13) % 49) * (1 + doc_id % 4) AS h
        |  FROM documents
        |),
        |g AS (
        |  SELECT doc_id, i.i AS i, (i.i * (w - 1)) // 3 AS x,
        |    (j.j * (h - 1)) // 3 AS y
        |  FROM d, UNNEST(range(0, 4)) i(i), UNNEST(range(0, 4)) j(j)
        |),
        |s AS (
        |  SELECT doc_id, i, CAST(sum(
        |      ((x * 31 + y * 17 + doc_id * 11) % 256) * 65536
        |    + ((x * 13 + y * 29 + doc_id * 7) % 256) * 256
        |    + ((x * 7 + y * 11 + doc_id * 3) % 256)) AS BIGINT) AS v
        |  FROM g GROUP BY 1, 2
        |),
        |feats AS (
        |  SELECT doc_id, string_agg(v::VARCHAR, ',' ORDER BY i) AS features
        |  FROM s GROUP BY doc_id
        |)
        |SELECT d.doc_id, CAST(d.w AS BIGINT) AS width,
        |  CAST(d.h AS BIGINT) AS height,
        |  CAST(d.w * 256 // greatest(d.w, d.h) AS BIGINT) AS out_w,
        |  CAST(d.h * 256 // greatest(d.w, d.h) AS BIGINT) AS out_h,
        |  f.features
        |FROM d JOIN feats f ON f.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "sql_subqueries" ->
      """SELECT c.c_mktsegment, count(*) AS n_rich_with_big_order
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0)
        |  AND c.c_acctbal > (SELECT floor(avg(c_acctbal)) FROM customer)
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin,
    // every 2nd frame strip (0-indexed) of the decoded filmstrip, reduced
    // to min/max of the per-frame grid checksums (same chk CTE as
    // multimodal_decode)
    "multimodal_frames" ->
      """WITH d AS (
        |  SELECT doc_id, 16 + (doc_id * 7) % 49 AS w,
        |    16 + (doc_id * 13) % 49 AS fh, 1 + doc_id % 4 AS nf
        |  FROM documents
        |),
        |g AS (
        |  SELECT doc_id, f.f AS f, (i.i * (w - 1)) // 3 AS x,
        |    f.f * fh + (j.j * (fh - 1)) // 3 AS y
        |  FROM d, UNNEST(range(0, nf)) f(f), UNNEST(range(0, 4)) i(i),
        |    UNNEST(range(0, 4)) j(j)
        |),
        |chk AS (
        |  SELECT doc_id, f, CAST(sum(
        |      ((x * 31 + y * 17 + doc_id * 11) % 256) * 65536
        |    + ((x * 13 + y * 29 + doc_id * 7) % 256) * 256
        |    + ((x * 7 + y * 11 + doc_id * 3) % 256)) AS BIGINT) AS chk
        |  FROM g GROUP BY 1, 2
        |)
        |SELECT doc_id, count(*) AS n_sampled, min(chk) AS min_hash,
        |  max(chk) AS max_hash
        |FROM chk WHERE f % 2 = 0
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the audio modality's windows recomputed from the same (doc_id, t)
    // arithmetic the PCM fixture encodes — the features only match if
    // the engine genuinely parsed the little-endian int16 payload.
    // Shared by the batch entry and its decode-at-ingest streaming twin
    // (row-identical by construction — same fused parse, per micro-batch)
    "multimodal_audio" -> DuckAudioOracle,
    "filter_like" ->
      """SELECT p_brand, count(*) AS n,
        |  round(avg(p_retailprice), 4) AS avg_price
        |FROM (SELECT *, CASE WHEN p_size > 25 THEN p_size % 3 ELSE NULL END
        |        AS size_bucket FROM part)
        |WHERE p_name LIKE '%e%' AND p_type NOT LIKE 'E%'
        |  AND (size_bucket IS NOT DISTINCT FROM 1 OR size_bucket IS NULL)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "salted_top_terms" ->
      s"""WITH $DuckToks
         |SELECT tok, count(*) AS cnt FROM toks
         |GROUP BY tok ORDER BY cnt DESC, tok LIMIT 50""".stripMargin,
  )
}
