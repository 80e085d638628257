package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Additional scalar/array/regex/window-analytic function coverage —
  * deepening the registry surface the reference left empty
  * (/root/reference/src/planner/logicalplan.rs:64-71). Array-typed results
  * are projected to scalars (joined strings, sizes, elements) so the
  * oracle hash-compare stays on plain columns.
  */
object FunctionQueries {

  val all: Seq[Q] = Seq(

    Q("q_array_fns",
      Some("""SELECT doc_id,
             |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
             |  array_to_string(list_slice(list_sort(list_distinct(string_split(text, ' '))), 1, 5), ',') AS first5,
             |  list_sort(list_distinct(string_split(text, ' ')))[1] AS min_tok,
             |  list_contains(string_split(text, ' '), 'data') AS has_data
             |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val toks = split(col("text"), " ")
        t(s, d, "documents").filter(col("doc_id") < 100)
          .select(col("doc_id"),
            size(toks).cast("long").as("n"),
            array_join(slice(sort_array(array_distinct(toks)), 1, 5), ",").as("first5"),
            element_at(sort_array(array_distinct(toks)), 1).as("min_tok"),
            array_contains(toks, "data").as("has_data"))
          .orderBy("doc_id")
      }),

    Q("q_regex_fns",
      Some("""SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits,
             |  regexp_matches(c_name, '^Customer#0+[0-9]+$') AS well_formed,
             |  regexp_replace(c_name, '0+', '0', 'g') AS squeezed
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) =>
        t(s, d, "customer")
          .select(col("c_custkey"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
            col("c_name").rlike("^Customer#0+[0-9]+$").as("well_formed"),
            regexp_replace(col("c_name"), "0+", "0").as("squeezed"))
          .orderBy("c_custkey")),

    // ntile / percent_rank / cume_dist over a GLOBAL order — computed via
    // the two-phase GlobalRank operator (range-chunked local row_number +
    // broadcast chunk offsets) instead of an unpartitioned window that
    // would serialize the table through one task at scale. The sort key
    // (c_acctbal, c_custkey) is a total order, so rank == row_number and
    // the analytics reduce to exact rank arithmetic: ntile by the SQL
    // bucket-size rule, percent_rank = (rn-1)/(n-1), cume_dist = rn/n —
    // the same rational divisions both engines compute, bit-identical.
    Q("q_window_analytics",
      Some("""SELECT c_custkey,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd
             |FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) =>
        graft.operators.GlobalRank.withNtile(
            t(s, d, "customer").select("c_custkey", "c_acctbal"),
            col("c_acctbal"), Seq(col("c_acctbal"), col("c_custkey")),
            k = 4, bucketCol = "quartile", chunks = 32)
          .select(col("c_custkey"),
            col("quartile"),
            // n = 1 would make (rn-1)/(n-1) NaN; percent_rank defines it 0
            when(col("n_total") > 1,
              (col("rn") - 1).cast("double") /
                (col("n_total") - 1).cast("double"))
              .otherwise(lit(0.0)).as("pr"),
            (col("rn").cast("double") / col("n_total").cast("double")).as("cd"))
          .orderBy("c_custkey")),

    // Exact interpolated percentile (both engines: lower + frac*(upper-lower)
    // at rank p*(n-1)) over integral doubles.
    Q("q_percentile",
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS p50,
             |  quantile_cont(l_quantity, 0.9) AS p90
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.9)").as("p90"))
          .orderBy("l_returnflag")),

    // Word-bigram generation (n-gram shingling at the word level) —
    // projected to scalars for the hash compare.
    Q("q_ngrams",
      Some("""WITH b AS (
             |  SELECT doc_id,
             |    [t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))] AS bg
             |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
             |SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
             |  CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
             |  bg[1] AS first_bg, bg[len(bg)] AS last_bg
             |FROM b WHERE doc_id < 100 ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val bg = expr(
          "CASE WHEN size(split(text, ' ')) < 2 THEN array() " +
          "ELSE transform(sequence(1, size(split(text, ' ')) - 1), " +
          "i -> concat(element_at(split(text, ' '), i), ' ', element_at(split(text, ' '), i + 1))) END")
        t(s, d, "documents").filter(col("doc_id") < 100)
          .withColumn("bg", bg)
          .select(col("doc_id"),
            size(col("bg")).cast("long").as("n_bigrams"),
            size(array_distinct(col("bg"))).cast("long").as("n_distinct"),
            element_at(col("bg"), 1).as("first_bg"),
            element_at(col("bg"), size(col("bg"))).as("last_bg"))
          .orderBy("doc_id")
      }),

    Q("q_window_values",
      Some("""SELECT user_id, event_id,
             |  first_value(event_id) OVER w AS first_id,
             |  last_value(event_id)  OVER w AS last_id,
             |  nth_value(event_id, 2) OVER w AS second_id
             |FROM events WHERE user_id < 5
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "events").filter(col("user_id") < 5)
          .select(col("user_id"), col("event_id"),
            first(col("event_id")).over(w).as("first_id"),
            last(col("event_id")).over(w).as("last_id"),
            nth_value(col("event_id"), 2).over(w).as("second_id"))
          .orderBy("user_id", "event_id")
      }),

    Q("q_str_fns2",
      Some("""SELECT p_partkey, lpad(p_brand, 10, '*') AS padded,
             |  split_part(p_brand, '#', 2) AS brand_num,
             |  translate(p_type, 'AEIOU', 'aeiou') AS vowelized,
             |  repeat('-', p_size % 5) AS dashes,
             |  reverse(p_name) AS rev,
             |  CAST(strpos(p_name, ' ') AS BIGINT) AS space_at
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) =>
        t(s, d, "part")
          .select(col("p_partkey"),
            lpad(col("p_brand"), 10, "*").as("padded"),
            expr("split_part(p_brand, '#', 2)").as("brand_num"),
            translate(col("p_type"), "AEIOU", "aeiou").as("vowelized"),
            expr("repeat('-', CAST(p_size % 5 AS INT))").as("dashes"),
            reverse(col("p_name")).as("rev"),
            expr("instr(p_name, ' ')").cast("long").as("space_at"))
          .orderBy("p_partkey")),

    // Mergeable histogram-quantile sketch (HistQuantile) — the
    // DETERMINISTIC quantile summary beside the engine-internal GK
    // sketch below: exact integer bucket counts over a declared range,
    // merge-by-sum lifecycle (the CMS pattern), upper-edge estimates a
    // pure integer function of the data — DuckDB re-derives sketch,
    // cumulative ranks and estimates bit-for-bit. This is
    // q_approx_quantile's oracled sibling (SURVEY §2.3.1).
    Q("q_hist_quantile",
      Some("""WITH v AS (SELECT l_returnflag AS g,
             |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS c FROM lineitem),
             |s AS (SELECT g, (LEAST(12799999, GREATEST(0, c)) * 64) // 12800000 AS b,
             |    count(*) AS cnt FROM v GROUP BY 1, 2),
             |c2 AS (SELECT g, b, SUM(cnt) OVER (PARTITION BY g ORDER BY b) AS cum,
             |    SUM(cnt) OVER (PARTITION BY g) AS n FROM s),
             |q AS (SELECT g, phi, MIN(b) AS qb FROM c2
             |  CROSS JOIN (VALUES (500000), (990000)) p(phi)
             |  WHERE cum * 1000000 >= n * phi GROUP BY g, phi)
             |SELECT g AS l_returnflag, CAST(phi AS BIGINT) AS phi_ppm,
             |  CAST((qb + 1) * 200000 AS BIGINT) AS est
             |FROM q ORDER BY l_returnflag, phi_ppm, est""".stripMargin),
      (s, d) => {
        import graft.operators.HistQuantile
        val sk = HistQuantile.sketchBy(t(s, d, "lineitem"),
          Seq("l_returnflag"), Money.cents(col("l_extendedprice")),
          lo = 0L, hi = 12800000L, buckets = 64)
        HistQuantile.quantiles(sk, Seq("l_returnflag"),
            lo = 0L, hi = 12800000L, buckets = 64,
            phisPpm = Seq(500000L, 990000L))
          .orderBy("l_returnflag", "phi_ppm", "est")
      }),

    // Approximate quantile sketch — rows-only (sketch-specific results;
    // terminal rows-only set: SURVEY.md §2.3.1).
    // Output is reshaped to scalar (flag, quantile, value) rows so the
    // driver's row-count/pandas check can consume it (array cells are
    // unhashable there).
    Q("q_approx_quantile", None,
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(expr("percentile_approx(l_extendedprice, array(0.5, 0.99), 1000)").as("approx"))
          .select(col("l_returnflag"),
            posexplode(col("approx")).as(Seq("q_idx", "q_value")))
          .select(col("l_returnflag"),
            when(col("q_idx") === 0, lit(0.5)).otherwise(lit(0.99)).as("quantile"),
            col("q_value"))
          .orderBy("l_returnflag", "quantile")),

    // Nested types: struct construction + field access, map construction +
    // key lookup + cardinality (the Struct type the reference declared but
    // panics on, /root/reference/src/planner/logicalplan.rs:181,200).
    Q("q_struct_map",
      Some("""SELECT c_custkey,
             |  struct_pack(name := c_name, seg := c_mktsegment).name AS sname,
             |  struct_pack(name := c_name, seg := c_mktsegment).seg AS sseg,
             |  map(['bal'], [c_acctbal])['bal'][1] AS mbal,
             |  CAST(cardinality(map(['a','b'], [1, 2])) AS BIGINT) AS msize
             |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val st = struct(col("c_name").as("name"), col("c_mktsegment").as("seg"))
        t(s, d, "customer").filter(col("c_custkey") < 300)
          .select(col("c_custkey"),
            st.getField("name").as("sname"),
            st.getField("seg").as("sseg"),
            element_at(map_from_arrays(array(lit("bal")), array(col("c_acctbal"))), "bal")
              .as("mbal"),
            size(map_from_arrays(array(lit("a"), lit("b")), array(lit(1), lit(2))))
              .cast("long").as("msize"))
          .orderBy("c_custkey")
      }),

    // Relational melt: wide -> long via Dataset.unpivot (ANSI UNPIVOT).
    Q("q_unpivot",
      Some("""SELECT c_custkey, k, v FROM (
             |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
             |         CAST(c_nationkey AS DOUBLE) AS nationkey
             |  FROM customer WHERE c_custkey < 100)
             |UNPIVOT (v FOR k IN (acctbal, nationkey))
             |ORDER BY c_custkey, k""".stripMargin),
      (s, d) =>
        t(s, d, "customer").filter(col("c_custkey") < 100)
          .select(col("c_custkey"),
            col("c_acctbal").cast("double").as("acctbal"),
            col("c_nationkey").cast("double").as("nationkey"))
          .unpivot(Array(col("c_custkey")),
            Array(col("acctbal"), col("nationkey")), "k", "v")
          .orderBy("c_custkey", "k")),

    // Higher-order array functions: transform / filter / aggregate lambdas
    // (codegen'd, no UDF) — per-token computation without exploding rows.
    Q("q_hof",
      Some("""SELECT doc_id,
             |  CAST(list_aggregate(list_transform(string_split(text, ' '), x -> length(x)), 'sum') AS BIGINT) AS tot_len,
             |  CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 4)) AS BIGINT) AS n_long
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) =>
        t(s, d, "documents")
          .select(col("doc_id"),
            expr("aggregate(transform(split(text, ' '), x -> length(x)), 0L, (acc, x) -> acc + x)")
              .as("tot_len"),
            expr("size(filter(split(text, ' '), x -> length(x) > 4))")
              .cast("long").as("n_long"))
          .orderBy("doc_id")),

    // Spark 4 VariantType: semi-structured payloads in a binary-encoded
    // open type; typed path extraction without declaring a schema up front.
    // Round-trips row data through to_json -> parse_json -> variant_get so
    // the DuckDB oracle can check the extracted values against JSON ops.
    Q("q_variant",
      Some("""SELECT c_custkey,
             |  CAST(json_extract(v, '$.id') AS BIGINT) AS id,
             |  json_extract_string(v, '$.name') AS name,
             |  json_extract_string(v, '$.seg') AS seg,
             |  CAST(round(CAST(json_extract(v, '$.bal') AS DOUBLE) * 100, 0) AS BIGINT) AS bal_cents,
             |  CAST(NULL AS VARCHAR) AS missing
             |FROM (SELECT c_custkey,
             |        to_json(struct_pack(id := c_custkey, name := c_name,
             |                            bal := c_acctbal, seg := c_mktsegment)) AS v
             |      FROM customer WHERE c_custkey <= 300)
             |ORDER BY c_custkey""".stripMargin),
      (s, d) => {
        val payload = to_json(struct(
          col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("bal"), col("c_mktsegment").as("seg")))
        t(s, d, "customer").filter(col("c_custkey") <= 300)
          .select(col("c_custkey"), parse_json(payload).as("v"))
          .select(col("c_custkey"),
            variant_get(col("v"), "$.id", "bigint").as("id"),
            variant_get(col("v"), "$.name", "string").as("name"),
            variant_get(col("v"), "$.seg", "string").as("seg"),
            round(variant_get(col("v"), "$.bal", "double") * 100, 0)
              .cast("long").as("bal_cents"),
            try_variant_get(col("v"), "$.missing", "string").as("missing"))
          .orderBy("c_custkey")
      })
  )
}
