"""Relational + grammar + events queries (reference parity SURVEY.md §2.1,
§2.2, §2.4, §2.6 and documented Spark supersets §2.5/§2.6).

Grammar queries run through the engine's PostgREST parser
(:mod:`xcube_geodb_spark.filters`); pg-path queries through the same
clause-ordered SQL builder the client uses (``scan.build_pg_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xcube_geodb_spark.filters import apply_postgrest_query
from xcube_geodb_spark.functions.porter import porter_py, porter_sql
from xcube_geodb_spark.functions.stopwords import stopword_sql_list

# english-dictionary document pipeline as one DuckDB expression: tokenize,
# elide Snowball stopwords, Porter-stem — the oracle twin of the
# fts(english) Column tree (filters._fts)
_ENGLISH_TOKS_SQL = f"""list_transform(
                       list_filter(
                           list_filter(
                               string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t != ''),
                           t -> NOT list_contains({stopword_sql_list()}, t)),
                       t -> {porter_sql("t")})"""
from xcube_geodb_spark.operators.scan import build_pg_sql
from xcube_geodb_spark.suite.util import load, register_views

# ---------------------------------------------------------------------------
# PostgREST grammar scans (engine parser -> Column trees -> pushdown)
# ---------------------------------------------------------------------------


def scan_filter_eq_gt(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "orders")
    return apply_postgrest_query(
        df,
        "o_orderstatus=eq.F&o_totalprice=gt.150000&select=o_orderkey,o_custkey,o_totalprice",
    )


def scan_filter_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "lineitem")
    return apply_postgrest_query(
        df,
        "and=(or(l_returnflag.eq.A,l_returnflag.eq.R),l_quantity.gt.45)"
        "&select=l_orderkey,l_linenumber,l_returnflag,l_quantity",
    )


def scan_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "part")
    return apply_postgrest_query(
        df,
        "p_type=like.*BRASS*&p_size=in.(5,10,15)"
        "&select=p_partkey,p_brand,p_type,p_size",
    )


def scan_filter_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "orders")
    return apply_postgrest_query(
        df,
        "o_orderpriority=not.in.(1-URGENT,2-HIGH)&o_totalprice=lt.5000"
        "&select=o_orderkey,o_orderpriority,o_totalprice",
    )


def scan_filter_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "customer")
    return apply_postgrest_query(
        df, "c_name=ilike.customer*1&select=c_custkey,c_name"
    )


def scan_fts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fts-family tsquery over the documents corpus, tagged union of two
    dictionaries: ``plain`` — exact token match with &-conjunction, a
    |-alternative and a ! negation (filters._fts); ``stemmed`` — the
    ``fts(english)`` tag runs the built-in Porter stemmer (pure Column
    tree, functions/porter.py) over document tokens AND query terms, so
    ``querying``/``tables``/``merges`` (none a literal corpus token —
    the plain matcher returns zero rows for them) match ``query``/
    ``table``/``merge`` documents; ``stopworded`` — stopword elision:
    ``the``/``once`` in the query drop exactly as PG's english
    dictionary drops them, leaving ``querying&tables``. The oracle
    replays the identical stopword+stemmer pipeline as one generated
    DuckDB scalar expression."""
    df = load(spark, sf_dir, "documents")
    plain = apply_postgrest_query(
        df, "text=fts.data%26spark|window%26!hash&select=doc_id"
    )
    stemmed = apply_postgrest_query(
        df,
        "text=fts(english).querying%26tables|merges%26!windows"
        "&select=doc_id",
    )
    stopworded = apply_postgrest_query(
        df,
        "text=fts(english).the%26querying%26once%26tables&select=doc_id",
    )
    # phrase with an ELIDED stopword: PG's phraseto_tsquery('english',
    # 'table the data') = 'table <2> data' — data exactly two original
    # positions after table, ANY token in the gap. The oracle replays
    # the gap as a regex over the stemmed-with-stopword-fillers stream.
    gapped = apply_postgrest_query(
        df, "text=phfts(english).table the data&select=doc_id"
    )
    return (
        plain.select(F.lit("plain").alias("variant"), "doc_id")
        .unionAll(stemmed.select(F.lit("stemmed").alias("variant"), "doc_id"))
        .unionAll(
            stopworded.select(F.lit("stopworded").alias("variant"), "doc_id")
        )
        .unionAll(gapped.select(F.lit("gapped").alias("variant"), "doc_id"))
    )


def scan_fts_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stemmed fts query through the WAREHOUSE path with an ``fts``
    token-bloom index declared: commit builds per-file blooms over the
    Porter-stemmed vocabulary, and get_collection prunes files through
    them before the scan (operators/pruning.fts_term_groups). Logical
    result must equal the direct stemmed scan, so the same oracle
    applies — this gate proves bloom pruning never changes results."""
    import tempfile

    from xcube_geodb_spark.client import GeoDBSparkClient

    c = GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_fts_"), user="driver"
    )
    c.create_collection("docs", {"doc_id": "int", "text": "text"})
    c.create_index("docs", "text", kind="fts", options={"dictionary": "english"})
    c.insert_into_collection(
        "docs", load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    from xcube_geodb_spark.operators.scan import get_collection

    return get_collection(
        c.catalog,
        "docs",
        "text=fts(english).querying%26tables|merges%26!windows"
        "&select=doc_id",
        database="driver",
    )


def scan_cs_cd_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array containment (cs = ⊇, cd = ⊆) over token-array columns derived
    from the documents table (the engine's array property type)."""
    toks = F.array_remove(F.split(F.lower("text"), "[^a-z0-9]+"), "")
    df = (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.slice("toks", 1, 2).alias("toks_head"))
    )
    return apply_postgrest_query(
        df,
        "toks=cs.{data,slow}"
        "&toks_head=cd.{key,agg,row,scan,slow,fast,table,value,part,hash}"
        "&select=doc_id",
    )


def scan_json_arrow_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostgREST json arrows + select shapes end-to-end: filter on a
    ``->>`` path (text compare), project ``alias:path::cast``
    (filters._col_ref / _select_expr)."""
    df = load(spark, sf_dir, "events")
    return apply_postgrest_query(
        df, "props->>k=eq.7&select=event_id,k:props->>k::bigint"
    )


def scan_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load(spark, sf_dir, "customer")
    return apply_postgrest_query(
        df,
        "select=c_custkey,c_name,c_mktsegment&order=c_custkey.asc&limit=50&offset=25",
    )


def head_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # head_collection semantics: first N ordered by key (scan.head_collection)
    return load(spark, sf_dir, "nation").orderBy("n_nationkey").limit(10)


def scan_filter_grammar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One driver gate covering four PostgREST grammar shapes at once —
    nested and()/or(), like+in, ilike, not.in — as a tagged key union, so
    each shape's exact row membership stays driver-verified while the
    individual variants live outside the driver's 50-entry window."""
    nested = scan_filter_nested(spark, sf_dir).select(
        F.lit("nested").alias("variant"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long")
        .alias("key"),
    )
    in_like = scan_filter_in_like(spark, sf_dir).select(
        F.lit("in_like").alias("variant"), F.col("p_partkey").cast("long").alias("key")
    )
    ilike = scan_filter_ilike(spark, sf_dir).select(
        F.lit("ilike").alias("variant"), F.col("c_custkey").cast("long").alias("key")
    )
    not_in = scan_filter_not_in(spark, sf_dir).select(
        F.lit("not_in").alias("variant"), F.col("o_orderkey").cast("long").alias("key")
    )
    return nested.unionByName(in_like).unionByName(ilike).unionByName(not_in)


CORE_ORACLES_GRAMMAR = {
    "scan_filter_eq_gt": """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 150000
    """,
    "scan_filter_nested": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
        WHERE (l_returnflag = 'A' OR l_returnflag = 'R') AND l_quantity > 45
    """,
    "scan_filter_in_like": """
        SELECT p_partkey, p_brand, p_type, p_size FROM part
        WHERE p_type LIKE '%BRASS%' AND p_size IN (5, 10, 15)
    """,
    "scan_filter_not_in": """
        SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH') AND o_totalprice < 5000
    """,
    "scan_filter_ilike": """
        SELECT c_custkey, c_name FROM customer WHERE c_name ILIKE 'customer%1'
    """,
    "scan_paging": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        ORDER BY c_custkey ASC LIMIT 50 OFFSET 25
    """,
    "head_nation": "SELECT * FROM nation ORDER BY n_nationkey LIMIT 10",
    "scan_json_arrow_select": """
        SELECT event_id,
               CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
        FROM events
        WHERE regexp_extract(props, '"k":\\s*(\\d+)', 1) = '7'
    """,
    # the stemmed leg embeds the SAME Porter pipeline twice: document
    # tokens through the generated DuckDB scalar expression
    # (porter.porter_sql — bit-identical to the Spark Column tree by
    # construction), query terms through porter_py at import time.
    "scan_fts_documents": f"""
        SELECT 'plain' AS variant, doc_id FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t != '') AS toks
            FROM documents
        )
        WHERE (list_contains(toks, 'data') AND list_contains(toks, 'spark'))
           OR (list_contains(toks, 'window') AND NOT list_contains(toks, 'hash'))
        UNION ALL
        SELECT 'stemmed' AS variant, doc_id FROM (
            SELECT doc_id,
                   {_ENGLISH_TOKS_SQL} AS toks
            FROM documents
        )
        WHERE (list_contains(toks, '{porter_py("querying")}')
               AND list_contains(toks, '{porter_py("tables")}'))
           OR (list_contains(toks, '{porter_py("merges")}')
               AND NOT list_contains(toks, '{porter_py("windows")}'))
        UNION ALL
        SELECT 'stopworded' AS variant, doc_id FROM (
            SELECT doc_id,
                   {_ENGLISH_TOKS_SQL} AS toks
            FROM documents
        )
        WHERE list_contains(toks, '{porter_py("querying")}')
          AND list_contains(toks, '{porter_py("tables")}')
        UNION ALL
        SELECT 'gapped' AS variant, doc_id FROM (
            SELECT doc_id,
                   ' ' || array_to_string(list_transform(
                       list_filter(
                           string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> t != ''),
                       t -> CASE WHEN list_contains({stopword_sql_list()}, t)
                                 THEN t || chr(1) ELSE {porter_sql("t")} END),
                       ' ') || ' ' AS stream
            FROM documents
        )
        WHERE regexp_matches(stream,
            ' {porter_py("table")}(?: [^ ]+){{1}} {porter_py("data")} ')
    """,
    "pg_fts_tsvector": f"""
        SELECT doc_id FROM (
            SELECT doc_id,
                   {_ENGLISH_TOKS_SQL} AS toks
            FROM documents
        )
        WHERE list_contains(toks, '{porter_py("querying")}')
          AND list_contains(toks, '{porter_py("tables")}')
        ORDER BY doc_id
    """,
    "scan_fts_indexed": f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id FROM (
            SELECT doc_id,
                   {_ENGLISH_TOKS_SQL} AS toks
            FROM documents
        )
        WHERE (list_contains(toks, '{porter_py("querying")}')
               AND list_contains(toks, '{porter_py("tables")}'))
           OR (list_contains(toks, '{porter_py("merges")}')
               AND NOT list_contains(toks, '{porter_py("windows")}'))
    """,
    "scan_cs_cd_tokens": """
        SELECT doc_id FROM (
            SELECT doc_id, toks, toks[1:2] AS toks_head FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                   t -> t != '') AS toks
                FROM documents
            )
        )
        WHERE list_has_all(toks, ['data', 'slow'])
          AND list_has_all(['key','agg','row','scan','slow','fast',
                            'table','value','part','hash'], toks_head)
    """,
}

CORE_ORACLES_GRAMMAR["scan_filter_grammar"] = f"""
    SELECT 'nested' AS variant, CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS key
    FROM ({CORE_ORACLES_GRAMMAR["scan_filter_nested"]})
    UNION ALL
    SELECT 'in_like' AS variant, CAST(p_partkey AS BIGINT) AS key
    FROM ({CORE_ORACLES_GRAMMAR["scan_filter_in_like"]})
    UNION ALL
    SELECT 'ilike' AS variant, CAST(c_custkey AS BIGINT) AS key
    FROM ({CORE_ORACLES_GRAMMAR["scan_filter_ilike"]})
    UNION ALL
    SELECT 'not_in' AS variant, CAST(o_orderkey AS BIGINT) AS key
    FROM ({CORE_ORACLES_GRAMMAR["scan_filter_not_in"]})
"""

# ---------------------------------------------------------------------------
# raw-SQL (pg) path — same clause builder as the client facade
# ---------------------------------------------------------------------------

# Large-magnitude double sums diverge between engines by ~1e-5 (partition-
# order-dependent accumulation); compare them as rounded integers so the
# bucket (0.5) dwarfs the divergence. Small-magnitude aggregates keep finer
# rounding.
_Q1_SELECT = (
    "l_returnflag, l_linestatus, "
    "round(sum(l_quantity), 2) AS sum_qty, "
    "CAST(round(sum(l_extendedprice), 0) AS BIGINT) AS sum_base_price, "
    "CAST(round(sum(l_extendedprice * (1 - l_discount)), 0) AS BIGINT) AS sum_disc_price, "
    "round(avg(l_quantity), 6) AS avg_qty, "
    "round(avg(l_discount), 6) AS avg_disc, "
    "count(*) AS count_order"
)


def pg_groupby_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    sql = build_pg_sql(
        "lineitem",
        select=_Q1_SELECT,
        where="l_shipdate <= timestamp '1998-09-02 00:00:00'",
        group="l_returnflag, l_linestatus",
        order="l_returnflag, l_linestatus",
    )
    return spark.sql(sql)


def pg_fts_tsvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG text-search family on the raw-SQL path (functions/textsql):
    ``to_tsvector('english', text) @@ plainto_tsquery('english', ...)``
    — the TRUE PG operator spelling since r10 (the shim rewrites ``@@``
    to ts_match_all; plainto ANDs its words, exactly that function).
    The query words ('querying tables') are no literal corpus tokens; only
    stemming matches them. The oracle replays the generated Porter SQL."""
    from xcube_geodb_spark.functions.textsql import register_text_sql_functions

    register_text_sql_functions(spark)
    register_views(spark, sf_dir, "documents")
    sql = build_pg_sql(
        "documents",
        select="doc_id",
        where=(
            "to_tsvector('english', text) "
            "@@ plainto_tsquery('english', 'querying tables')"
        ),
        order="doc_id",
    )
    return spark.sql(sql)


def pg_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select="o_orderkey, o_totalprice",
        where="o_orderstatus = 'F'",
        order="o_totalprice DESC, o_orderkey",
        limit=10,
    )
    return spark.sql(sql)


def pg_count_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select="count(o_orderpriority) AS ct, o_orderpriority",
        group="o_orderpriority",
        order="o_orderpriority",
    )
    return spark.sql(sql)


def pg_similar_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``SIMILAR TO`` through the dialect shim: translated to an
    anchored RLIKE (% -> .*, _ -> .; period stays literal — PG treats it
    so). DuckDB supports SIMILAR TO natively, making the oracle a
    verbatim replay."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select="o_orderkey, o_orderpriority",
        where="o_orderpriority SIMILAR TO '(1|2)-%' "
        "AND o_orderpriority NOT SIMILAR TO '%URGENT'",
        order="o_orderkey",
        limit=200,
    )
    return spark.sql(sql)


def pg_array_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``@>`` / ``<@`` array containment through the dialect shim
    (set semantics: every needle element appears in the hay), with an
    ``ARRAY[...]`` literal rewritten to ``array(...)``. Oracle replays
    with DuckDB's list_has_all."""
    register_views(spark, sf_dir, "documents")
    sql = build_pg_sql(
        "documents",
        select="doc_id",
        where="split(text, ' ') @> ARRAY['data','spark'] "
        "AND ARRAY['window'] <@ split(text, ' ')",
        order="doc_id",
    )
    return spark.sql(sql)


def pg_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``DISTINCT ON`` through the dialect shim (the most common PG
    idiom Spark's parser rejects — r6 verdict order 6): latest order per
    customer, deterministic via the o_orderkey tiebreak. The shim rewrites
    to a row_number window partitioned on the key (one hash shuffle, no
    global sort); DuckDB runs the identical DISTINCT ON natively."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select="DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice",
        order="o_custkey, o_orderdate DESC, o_orderkey",
    )
    return spark.sql(sql)


def pg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``string_agg(x, sep ORDER BY k)`` through the dialect shim —
    the most common PG aggregate Spark's parser rejects in that
    spelling (r7 verdict order 2). The shim moves the in-args ORDER BY
    to standard ``WITHIN GROUP``, which Spark 4 runs natively (one
    map-side-combining aggregate, no window). DuckDB runs the original
    PG spelling verbatim."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select="o_orderpriority, "
        "string_agg(o_orderkey::text, ',' ORDER BY o_orderkey) AS keys",
        where="o_orderkey % 97 = 0",
        group="o_orderpriority",
        order="o_orderpriority",
    )
    return spark.sql(sql)


def pg_array_agg_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``array_agg(x ORDER BY k...)`` through the dialect shim:
    rewritten to ``transform(sort_array(collect_list(struct(k, x))),
    s -> s.__v)`` — one aggregate with partial (map-side) combine and a
    per-group sort, no global window. Joined to a string so the driver
    hash compares engine-independent text."""
    register_views(spark, sf_dir, "customer")
    sql = build_pg_sql(
        "customer",
        select="c_nationkey, concat_ws('|', array_agg(c_name "
        "ORDER BY c_acctbal DESC, c_custkey DESC)) AS names",
        where="c_custkey % 53 = 0",
        group="c_nationkey",
        order="c_nationkey",
    )
    return spark.sql(sql)


def pg_array_agg_order_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``array_agg(x ORDER BY a ASC NULLS FIRST, b DESC)`` — MIXED
    directions and an explicit NULLS placement (r8 verdict order 5; the
    r8 shim refused both). The shim now builds an ``array_sort``
    comparator lambda with exact per-key direction and null placement;
    a CASE injects NULL keys so the placement is actually exercised.
    DuckDB runs the PG spelling natively."""
    register_views(spark, sf_dir, "customer")
    sql = build_pg_sql(
        "customer",
        select="c_nationkey, concat_ws('|', array_agg(c_name ORDER BY "
        "CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END "
        "ASC NULLS FIRST, c_custkey DESC)) AS names",
        where="c_custkey % 11 = 0",
        group="c_nationkey",
        order="c_nationkey",
    )
    return spark.sql(sql)


def pg_json_arrows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG json operators ``->``/``->>``/``#>``/``#>>`` through the raw-SQL
    shim (r9 verdict order 1; the reference's own PL/pgSQL uses them —
    geodb.sql:114-116, :1901 — and its passthrough admits them,
    geodb.sql:1147-1167). Chains fold into ONE ``get_json_object`` path
    (JVM-side Jackson walk, whole-stage-codegen friendly — no UDF, no
    shuffle beyond the scan); the json-returning terminal ``->`` rides
    Spark 4 VARIANT. Legs: text terminal, typed ``(x->>k)::int`` cast
    (the paren-cast shim), json terminal on a scalar, a chained
    ``->'u'->>'ids'``, a ``#>>`` path with an array index, an integer
    array-index arrow, and a missing-key NULL. DuckDB runs the PG arrows
    natively (its ``#>>`` gap replayed via json_extract_string)."""
    register_views(spark, sf_dir, "events")
    nested = "concat('{\"u\":{\"ids\":[', props ->> 'k', ',9]}}')"
    sql = build_pg_sql(
        "events",
        select=(
            "event_id, "
            "props ->> 'k' AS k_text, "
            "(props ->> 'k')::int + 1 AS k_plus, "
            "props -> 'k' AS k_json, "
            f"{nested} -> 'u' ->> 'ids' AS ids_text, "
            f"{nested} #>> '{{u,ids,0}}' AS id0, "
            "concat('[{\"v\":', props ->> 'k', '}]') -> 0 ->> 'v' AS v0, "
            "props ->> 'missing' AS gone, "
            # r12: json_typeof over object / array / scalar shapes
            "json_typeof(props) AS t_obj, "
            f"jsonb_typeof({nested} -> 'u') AS t_nested, "
            "json_typeof(props -> 'k') AS t_num"
        ),
        where="(props ->> 'k')::int >= 50",
        order="event_id",
        limit=500,
    )
    return spark.sql(sql)


def pg_array_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``array_agg(DISTINCT x ORDER BY x)`` — the one DISTINCT+ORDER
    shape PG admits (the ORDER BY expression must appear in the argument
    list), r9 verdict order 5. The shim rewrites to a map-side-combining
    ``array_distinct(collect_list(struct))`` + per-group sort — one
    shuffle, no re-aggregation. ASC and DESC legs, plus an expression
    argument exercising the textual key==argument check."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select=(
            "o_orderstatus, "
            "concat_ws('|', array_agg(DISTINCT o_orderpriority "
            "ORDER BY o_orderpriority)) AS prios, "
            "concat_ws('|', array_agg(DISTINCT (o_custkey % 5) "
            "ORDER BY (o_custkey % 5) DESC)) AS buckets"
        ),
        group="o_orderstatus",
        order="o_orderstatus",
    )
    return spark.sql(sql)


def pg_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``json_agg(x ORDER BY k)`` / ``jsonb_agg`` through the raw-SQL
    shim (r10): the array_agg ordered-collect machinery wrapped in
    ``to_json`` — one map-side-combining aggregate per group, rendered
    as a json array exactly like PG's jsonb_agg (compact separators;
    PG's json_agg pretty-prints with ', ' — documented deviation).
    DuckDB oracle spells it ``to_json(list(x ORDER BY x))``."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select=(
            "o_orderstatus, "
            "json_agg(o_orderkey ORDER BY o_orderkey) AS keys_json, "
            "jsonb_agg(o_orderpriority ORDER BY o_orderkey) AS prio_json, "
            "concat_ws('|', array_agg(o_orderkey ORDER BY o_orderkey) "
            "FILTER (WHERE o_orderkey % 2 = 0)) AS even_keys"
        ),
        where="o_orderkey % 37 = 0",
        group="o_orderstatus",
        order="o_orderstatus",
    )
    return spark.sql(sql)


def pg_scalar_shims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG scalar spellings through the shim (r10): ``to_char(ts,
    template)`` -> date_format with the template translated token by
    token, and ``string_to_array(s, sep)`` -> split with the separator
    regex-escaped (PG splits on the LITERAL delimiter);
    ``extract(epoch from ts)`` -> the timestamp->double cast (epoch
    seconds + fractional micros, PG-exact); ``json_build_object`` ->
    ``to_json(named_struct(...))``. r11 legs (verdict orders 4/6):
    ``date_part('epoch', ts)`` routed through the same epoch rewrite,
    ``ts AT TIME ZONE 'zone'`` -> to_utc_timestamp (naive-timestamp PG
    semantics; epoch-extracted so the tz-typed oracle compares), NUMERIC
    to_char (FM / padded / zero-filled / trailing-strip forms ->
    format_string + lpad), and ``to_jsonb(row)`` -> to_json(struct(*))
    with a field extracted. The oracle replays strftime / string_split /
    epoch / json_object / printf / AT TIME ZONE / to_json."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select=(
            "o_orderkey, "
            "to_char(o_orderdate, 'YYYY-MM-DD') AS d_ymd, "
            "to_char(o_orderdate, 'HH24:MI:SS') AS d_hms, "
            # r11: PG name-token casing — 'MON' renders 'JAN'
            "to_char(o_orderdate, 'DD MON YYYY') AS d_mon, "
            "CAST(cardinality(string_to_array(o_orderpriority, '-')) "
            "AS INT) AS n_parts, "
            "element_at(string_to_array(o_orderpriority, '-'), 1) "
            "AS part1, "
            "round(extract(epoch from o_orderdate), 6) AS epoch_s, "
            "json_build_object('k', o_orderkey, 'p', o_orderpriority) "
            "AS obj_json, "
            # r11: date_part epoch spelling + AT TIME ZONE + numeric
            # to_char + to_jsonb row packaging
            "round(date_part('epoch', o_orderdate), 6) AS epoch_dp, "
            # r11: PG weekday numbering (dow Sunday=0, isodow Monday=1)
            "CAST(extract(dow from o_orderdate) AS INT) AS dow, "
            "CAST(date_part('isodow', o_orderdate) AS INT) AS isodow, "
            # r12: the year-bucket extract fields Spark lacks
            "CAST(extract(isoyear from o_orderdate) AS INT) AS isoyr, "
            "CAST(extract(century from o_orderdate) AS INT) AS cent, "
            "CAST(date_part('decade', o_orderdate) AS INT) AS dec, "
            # r12: ms/us extract (PG: the seconds field incl. fraction,
            # scaled) over a synthesized sub-second timestamp
            "CAST(extract(milliseconds from (o_orderdate::timestamp "
            "+ (o_orderkey % 7) * interval '250 milliseconds')) "
            "AS BIGINT) AS msec, "
            # r12: PG blank-pads full Day/Month names to 9; FM strips
            "to_char(o_orderdate, 'Day') AS dayname, "
            "to_char(o_orderdate, 'FMMonth') AS monthname, "
            "extract(microseconds from (o_orderdate::timestamp "
            "+ (o_orderkey % 7) * interval '250 milliseconds')) "
            "AS usec, "
            "round(extract(epoch from "
            "(o_orderdate AT TIME ZONE 'America/New_York')), 6) "
            "AS epoch_nyc, "
            # r12: the canonical PG duration idiom — epoch of a
            # timestamp difference (INTERVAL operand)
            "round(extract(epoch from o_orderdate::timestamp "
            "- timestamp '1995-01-01 12:30:00'), 6) AS epoch_diff, "
            # r12: PG-template parse direction (to_timestamp/to_date
            # through the shared token table) — render + parse back
            "to_char(to_timestamp(to_char(o_orderdate, 'YYYY-MM-DD'), "
            "'YYYY-MM-DD'), 'YYYY-MM-DD HH24:MI:SS') AS ts_rt, "
            "to_char(to_date(to_char(o_orderdate, 'DD Mon YYYY'), "
            "'DD Mon YYYY'), 'YYYY-MM-DD') AS d_rt, "
            # r12: PG date - date = integer days (provable-date rule)
            "CAST(o_orderdate::date - date '1995-01-01' AS INT) "
            "AS days_since, "
            # r12: ::timestamp(p) rounds micros to p digits like PG
            "round(extract(epoch from (o_orderdate "
            "+ INTERVAL '0.123456' SECOND)::timestamp(3)), 6) "
            "AS ts_prec3, "
            "to_char(o_totalprice, 'FM9999999.00') AS price_fm, "
            "to_char(o_totalprice, '9999999.00') AS price_pad, "
            "to_char(o_orderkey, 'FM0000000000') AS key_zero, "
            # r12: zero-padded NEGATIVES (PG pads the magnitude, the sign
            # column is extra) — literal legs so the oracle is a literal
            # expected string, not a formula replay
            "to_char(-5, 'FM00') AS neg_fm00, "
            "to_char(-5, '00') AS neg_00, "
            "to_char(-5.25, 'FM00.0') AS neg_fm_dec, "
            "to_char(0 - o_totalprice, 'FM0000000.00') AS neg_price_zero, "
            "to_jsonb(orders) ->> 'o_orderpriority' AS rj_prio, "
            # r11: SQL-standard OVERLAPS + PG's starts_with spelling
            "(o_orderdate, o_orderdate + INTERVAL '7' DAY) OVERLAPS "
            "(timestamp '1996-01-01 00:00:00', "
            "timestamp '1996-02-01 00:00:00') AS in_jan96, "
            "starts_with(o_orderpriority, '1') AS is_urgent, "
            # r11: numeric trunc + hex encode
            "trunc(o_totalprice) AS price_t0, "
            "trunc(o_totalprice, 1) AS price_t1, "
            "encode(CAST(o_orderpriority AS BINARY), 'hex') AS prio_hex, "
            # r11: PG ^ is POWER (Spark's ^ is bitwise XOR — silent);
            # r12: unary minus binds tighter than ^ (power of the
            # NEGATED base, not negated power)
            "CAST(o_orderkey ^ 2 AS BIGINT) AS key_sq, "
            "CAST(-o_orderkey ^ 2 AS BIGINT) AS key_sq_neg, "
            # r11: parameterized casts with PG truncation semantics
            "CAST(o_totalprice::numeric(14,2) AS DOUBLE) AS price_dec, "
            "o_orderpriority::varchar(3) AS prio3, "
            "o_orderpriority::char(10) AS prio_pad, "
            # r12: multi-word PG type spellings + round(float8) half-even
            "o_totalprice::double precision AS dp, "
            "o_orderpriority::character varying(3) AS cv3, "
            "round(2.5::float8) AS rnd_tie, "
            "round(-2.5::float8) AS rnd_tie_neg, "
            "round((o_totalprice + 0.201)::float8) AS rnd_col, "
            # r12: to_number — the parse direction of numeric to_char
            "to_number(to_char(o_totalprice, '9,999,999.99'), "
            "'9G999G999D99') AS price_back"
        ),
        where="o_orderkey % 101 = 0",
        order="o_orderkey",
    )
    return spark.sql(sql)


def pg_everyday_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 probe round — the everyday-PG semantics Spark silently gets
    wrong through a passthrough, each caught by running the PG idiom
    through a bare Spark session: integer division (``7 / 2`` is 3 in
    PG, 3.5 in Spark — provable-int operands -> ``DIV``), 1-based
    NULL-safe array subscripts (``arr[1]`` is the FIRST element in PG,
    the SECOND in Spark; 0/negative/out-of-range -> NULL), PG slice
    clamping, NULL-ignoring ``concat`` (-> ``concat_ws('')``), and the
    negative/zero string-window arguments of left/right/substring.
    DuckDB shares PG's semantics natively (1-based lists, ``//``,
    skip-NULL concat), so the oracle is an independent engine, not a
    formula replay. Exception: default NULL ordering — PG sorts NULLS
    LAST asc / FIRST desc, Spark the opposite, and DuckDB uses
    nulls_last on BOTH directions — so the rn_asc/rn_desc legs use the
    BARE PG spelling on the engine side (the r12 default rewrite) and
    spell PG's documented default explicitly in the oracle."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select=(
            "o_orderkey, "
            # provable-int division: literal/literal and cast/literal
            "CAST(7 / 2 AS INT) AS lit_div, "
            "CAST(-7 / 2 AS INT) AS lit_div_neg, "
            "CAST(o_orderkey::int8 / 7 AS BIGINT) AS key_div, "
            # 1-based subscripts + NULL out-of-range + clamped slice
            "string_to_array(o_orderpriority, '-')[1] AS sub_first, "
            "string_to_array(o_orderpriority, '-')[9] AS sub_oob, "
            "string_to_array(o_orderpriority, '-')[0] AS sub_zero, "
            "array_join(string_to_array(o_orderpriority, '-')[1:2], '+') "
            "AS sub_slice, "
            # concat ignores NULLs like PG
            "concat(o_orderpriority, NULL, '!') AS cc, "
            # PG string windows: negative/zero counts
            "left(o_orderpriority, -3) AS l_neg, "
            "right(o_orderpriority, -3) AS r_neg, "
            "substring(o_orderpriority, 0, 4) AS sub0, "
            # PG regex substring (group-1 when capturing; NULL no-match)
            "substring(o_orderpriority from '[A-Z]+') AS rx_word, "
            "substring(o_orderpriority from 'zz+') AS rx_none, "
            # PG NULL placement both directions, LIMIT-visible via the
            # row_number windows (nulls last asc / first desc)
            "CAST(row_number() OVER (ORDER BY nullif(o_orderkey % 183, "
            "0), o_orderkey) AS BIGINT) AS rn_asc, "
            "CAST(row_number() OVER (ORDER BY nullif(o_orderkey % 183, "
            "0) DESC, o_orderkey) AS BIGINT) AS rn_desc, "
            # r12: BETWEEN SYMMETRIC (bounds in either order)
            "o_orderkey BETWEEN SYMMETRIC 5000 AND 1000 AS in_band, "
            # r12: PG log() is base 10 (Spark's is ln); 2-arg trims
            # (Spark reverses the args); to_hex (PG lowercases)
            "round(log(o_orderkey + 1), 6) AS log10_key, "
            "ltrim(o_orderpriority, '-12345') AS lt, "
            "rtrim(o_orderpriority, 'TWHNE') AS rt, "
            "to_hex(o_orderkey) AS hex_key, "
            # r12: PG array scalars (position NULL-on-absent, prepend
            # arg order, replace-all)
            "array_position(string_to_array(o_orderpriority, '-'), "
            "'URGENT') AS ap_hit, "
            "array_join(array_prepend(o_orderstatus, "
            "string_to_array(o_orderpriority, '-')), '.') AS ap_cat, "
            "array_join(array_replace(string_to_array(o_orderpriority, "
            "'-'), 'LOW', 'L0W'), '.') AS ar_rep, "
            # r12: PG initcap capitalizes after ANY non-alphanumeric
            "initcap(lower(o_orderpriority)) AS icap"
        ),
        where="o_orderkey % 61 = 0",
        order="o_orderkey",
    )
    return spark.sql(sql)


def pg_regexp_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 probe round, regex family: PG ``regexp_replace`` without
    ``'g'`` replaces only the FIRST match (Spark's builtin is global ->
    regexp_instr/regexp_extract splice), literal backrefs ``\\1``/
    ``\\&`` translate per path (``$N`` on the global path, per-group
    regexp_extract pieces on the first-match path), and backslash
    character classes inside string literals survive Spark's parser
    (the shim doubles them on output — ``'\\d'`` would otherwise
    silently become ``'d'``). Oracle: DuckDB's PG-faithful
    regexp_replace / regexp_extract / regexp_matches."""
    register_views(spark, sf_dir, "customer")
    sql = build_pg_sql(
        "customer",
        select=(
            "c_custkey, "
            r"regexp_replace(c_mktsegment, '\w', 'X') AS first_sub, "
            r"regexp_replace(c_mktsegment, '[A-Z]', 'x', 'g') "
            "AS all_sub, "
            r"regexp_replace(c_name, '(\d+)', '[\1]', 'g') "
            "AS backref_g, "
            r"regexp_replace(c_name, 'customer#', '', 'i') AS ci_first, "
            r"regexp_replace(c_name, '([A-Za-z]+)#', '<\1>') "
            "AS backref_first, "
            r"substring(c_name FROM '[1-9][0-9]*') AS num_part, "
            r"c_name ~ '\d{2}[13579]$' AS ends_odd, "
            # r12: regexp_match -> NULL-or-array of group extracts
            # (projected through PG 1-based subscripts: a NULL array
            # yields NULL elements, and arrays hash poorly in pandas)
            r"(regexp_match(c_name, '#(0*)([1-9][0-9]*)'))[1] AS m_zeros, "
            r"(regexp_match(c_name, '#(0*)([1-9][0-9]*)'))[2] AS m_num, "
            # r12: comma-spelling regex substring + PG format()
            r"substring(c_name, '[0-9]+$') AS tail_num, "
            "format('%s#%s', c_mktsegment, c_custkey) AS fmt, "
            "format('%2$s/%1$s', c_mktsegment, "
            "nullif(c_custkey % 3, 2)) AS fmt_pos"
        ),
        where="c_custkey % 17 = 0",
        order="c_custkey",
    )
    return spark.sql(sql)


def pg_like_operators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG's LIKE-operator spellings through the shim (r10): ``~~`` =
    LIKE, ``~~*`` = ILIKE, ``!~~`` = NOT LIKE, ``!~~*`` = NOT ILIKE —
    Spark runs LIKE/ILIKE natively, the pattern stays byte-exact. (The
    r9 shim HALF-matched ``~~`` as the regex ``~`` and emitted broken
    SQL — this gate pins the repaired precedence.) DuckDB runs the PG
    operator spellings natively."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select="o_orderkey, o_orderpriority",
        where=(
            "o_orderpriority ~~ '%-%' AND o_orderpriority ~~* '%urgent%' "
            "AND o_orderpriority !~~ '9%' "
            "AND o_orderpriority !~~* '%low%'"
        ),
        order="o_orderkey",
        limit=300,
    )
    return spark.sql(sql)


def pg_jsonb_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG jsonb key-existence operators through the shim (r10): ``?``
    (key present — true even for null VALUES, via json_object_keys),
    ``?|`` (any key), ``?&`` (all keys), plus the ``jsonb_*`` name
    aliases of Spark's json_* functions. A CASE-varied json document
    makes the predicates row-dependent."""
    register_views(spark, sf_dir, "events")
    j = (
        "(CASE WHEN event_id % 2 = 0 THEN '{\"a\":null,\"b\":2}' "
        "ELSE '{\"b\":2}' END)"
    )
    sql = build_pg_sql(
        "events",
        select=(
            f"event_id, {j} ? 'a' AS has_a, "
            f"{j} ?| ARRAY['a','zz'] AS any_a, "
            f"{j} ?& ARRAY['a','b'] AS all_ab, "
            "CAST(jsonb_array_length(concat('[', props ->> 'k', ',1]')) "
            "AS INT) AS arr_len"
        ),
        where="event_id % 13 = 0",
        order="event_id",
    )
    return spark.sql(sql)


def pg_json_elements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``json_array_elements_text(j)`` in SELECT position through the
    shim (r10): one row per array element as text via
    ``explode(from_json(j, 'array<string>'))`` — the set-returning
    sibling of the unnest rewrite, same one-generator restriction.
    DuckDB oracle: ``unnest(from_json(j, '[\"VARCHAR\"]'))``."""
    register_views(spark, sf_dir, "events")
    sql = build_pg_sql(
        "events",
        select=(
            "event_id, json_array_elements_text("
            "concat('[', props ->> 'k', ',7,', props ->> 'k', ']')) "
            "AS elem"
        ),
        where="event_id % 29 = 0",
        order="event_id, elem",
    )
    return spark.sql(sql)


def pg_date_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG 14 ``date_bin(stride, ts, origin)`` through the shim (r10):
    closed-form epoch arithmetic folded at rewrite time (stays in
    whole-stage codegen, no UDF). 15-minute bins over the events table,
    count per bin; DuckDB's time_bucket is the same -infinity-directed
    binning."""
    register_views(spark, sf_dir, "events")
    sql = build_pg_sql(
        "events",
        select=(
            "to_char(date_bin(INTERVAL '15 minutes', ts, "
            "TIMESTAMP '2024-01-01 00:00:00'), 'YYYY-MM-DD HH24:MI:SS') "
            "AS bucket, count(*) AS n"
        ),
        group=(
            "date_bin(INTERVAL '15 minutes', ts, "
            "TIMESTAMP '2024-01-01 00:00:00')"
        ),
        order="bucket",
    )
    return spark.sql(sql)


def pg_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG array/string scalars through the shim (r10):
    ``array_length(a, 1)`` -> ``nullif(size(a), 0)`` (PG returns NULL
    for empty arrays, not 0), ``array_cat`` -> ``concat``, ``strpos`` ->
    ``locate`` with swapped arguments (1-based, 0 = miss in both)."""
    register_views(spark, sf_dir, "documents")
    sql = build_pg_sql(
        "documents",
        select=(
            "doc_id, "
            "CAST(array_length(string_to_array(text, ' '), 1) AS INT) "
            "AS n_toks, "
            "CAST(strpos(text, 'data') AS INT) AS p_data, "
            "concat_ws('|', array_cat(string_to_array(source, '-'), "
            "string_to_array(lang, '-'))) AS cat_parts"
        ),
        where="doc_id % 17 = 0",
        order="doc_id",
    )
    return spark.sql(sql)


def count_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count from parquet footers only — the engine's estimate/count
    fast path (no full scan)."""
    import os

    from xcube_geodb_spark.operators.stats import footer_row_count

    n = footer_row_count([os.path.join(sf_dir, "lineitem.parquet")])
    return spark.createDataFrame([(n,)], "n_rows long")


def pg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG's ordered-set aggregates — ``percentile_cont(p) WITHIN GROUP
    (ORDER BY x)``, ``percentile_disc(p)``, ``mode()`` — pass through
    the raw-SQL path verbatim: Spark 4 parses and runs the ANSI WITHIN
    GROUP forms natively (map-side-combining aggregates; no shim, which
    this gate pins so a future shim regression can't silently eat the
    syntax). DuckDB runs the identical statement. mode() is keyed on
    l_linenumber, whose frequency ordering is strictly decreasing —
    the unique-mode fixture that sidesteps PG/Spark tie-break
    differences."""
    register_views(spark, sf_dir, "lineitem")
    sql = build_pg_sql(
        "lineitem",
        select=(
            "l_returnflag, "
            "round(CAST(percentile_cont(0.5) WITHIN GROUP "
            "(ORDER BY l_quantity) AS DOUBLE), 6) AS med_qty, "
            "round(CAST(percentile_disc(0.25) WITHIN GROUP "
            "(ORDER BY l_extendedprice) AS DOUBLE), 6) AS q1_price, "
            "CAST(mode() WITHIN GROUP (ORDER BY l_linenumber) AS INT) "
            "AS mode_line"
        ),
        group="l_returnflag",
        order="l_returnflag",
    )
    return spark.sql(sql)


_RECURSIVE_SQL = """
    WITH RECURSIVE walk(k, depth) AS (
        SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
        UNION ALL
        SELECT c.c_custkey, w.depth + 1
        FROM customer c JOIN walk w
          ON CAST(floor(c.c_custkey / 2.0) AS BIGINT) = w.k
        WHERE w.depth < 20
    )
    SELECT depth, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum
    FROM walk
    GROUP BY depth
    ORDER BY depth
"""


def pg_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``WITH RECURSIVE`` — native Spark 4 passthrough on the raw-SQL
    surface (the engine's run_sql superset admits full statements): the
    customer keys form an implicit binary tree (parent = floor(k / 2)),
    walked from the root; per-depth counts and key sums land exactly on
    the closed form (depth of k IS floor(log2 k)) — and the oracle runs
    the IDENTICAL recursive statement natively in DuckDB, so both
    engines' fixpoint semantics are compared directly. Spark executes
    each recursive step as a join against the previous frontier — a
    bounded iterative plan, the same shape a 100-TB hierarchy walk
    needs (no driver-side loop)."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(_RECURSIVE_SQL)


_LATERAL_SQL = """
    SELECT n.n_name, top.c_custkey, round(top.c_acctbal, 2) AS bal
    FROM nation n,
    LATERAL (
        SELECT c.c_custkey, c.c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c.c_acctbal DESC, c.c_custkey
        LIMIT 2
    ) top
    ORDER BY n.n_name, bal DESC, top.c_custkey
"""


def pg_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``LATERAL`` correlated subquery — native Spark 4 passthrough:
    the canonical top-N-per-group lateral (top-2 customers by balance
    per nation). DuckDB runs the identical statement. Spark plans the
    correlation as a rank-window under the hood — no per-row re-scan."""
    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(_LATERAL_SQL)


_WINDOW_FRAMES_SQL = """
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               RANGE BETWEEN 100 PRECEDING AND CURRENT ROW), 2)
               AS range_sum,
           max(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING)
               AS rows_max,
           CAST(count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS running_n
    FROM orders
    WHERE o_orderkey % 31 = 0
"""


def pg_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI window frames — RANGE BETWEEN <n> PRECEDING on a numeric
    ORDER BY, bounded ROWS BETWEEN frames, and the running-count frame —
    native passthrough on both engines (one hash shuffle per partition
    key, frames evaluated in the sorted partition stream)."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(_WINDOW_FRAMES_SQL)


_GROUPING_SETS_SQL = """
    SELECT coalesce(l_returnflag, '<all>') AS rf,
           coalesce(l_linestatus, '<all>') AS ls,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           count(*) AS n,
           CAST(sum(l_quantity) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY rf, ls
"""


def pg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY GROUPING SETS`` with the ``grouping()`` marker — the
    general form behind the gated ROLLUP/CUBE family; sets expand
    map-side into one aggregate (a single shuffle), no union of
    scans. Native on both engines."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_GROUPING_SETS_SQL)


def pg_unnest_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG ``unnest(arr)`` in select position (shim: Spark ``explode`` —
    the same one-generator-per-select restriction both dialects share)
    and the 4-argument ``regexp_replace(src, pat, rep, flags)`` ('g'
    drops — Spark replaces globally; 'i' folds into a (?i) prefix).
    DuckDB runs the PG spellings natively."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select=(
            "o_orderkey, unnest(split(o_orderpriority, '-')) AS tok, "
            "regexp_replace(o_orderpriority, '[aeiou]', '', 'gi') "
            "AS consonants, "
            "regexp_replace(o_orderstatus, 'o', 'X', 'g') AS status_x"
        ),
        where="o_orderkey % 101 = 0",
    )
    return spark.sql(sql)


def pg_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG's aggregate ``FILTER (WHERE ...)`` clause — native Spark 4
    passthrough on the raw-SQL path (conditional aggregation without
    CASE rewrites; one map-side-combining aggregate per group, the
    filter evaluated pre-combine). DuckDB runs the identical ANSI
    statement."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select=(
            "o_orderpriority, count(*) AS n_all, "
            "count(*) FILTER (WHERE o_totalprice > 150000) AS n_big, "
            "round(CAST(sum(o_totalprice) FILTER "
            "(WHERE o_orderstatus = 'F') AS DOUBLE), 2) AS sum_f, "
            "CAST(max(o_orderkey) FILTER (WHERE o_custkey % 2 = 0) "
            "AS BIGINT) AS max_key"
        ),
        group="o_orderpriority",
        order="o_orderpriority",
    )
    return spark.sql(sql)


def pg_generate_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG's ``FROM generate_series(a, b[, step]) t(i)`` (the
    series/gapfill idiom) through the dialect shim
    (operators/scan._rewrite_generate_series): rewritten to
    ``explode(sequence(...))`` — Spark's sequence is inclusive on both
    ends exactly like PG. Two arms: the unit-step closed form and a
    step-7 sum; DuckDB runs the PG spelling natively."""
    sql1 = build_pg_sql(
        "generate_series(1, 1000) AS t(i)",
        select="'unit' AS arm, count(*) AS n, "
        "CAST(sum(i) AS BIGINT) AS s, CAST(min(i) AS BIGINT) AS lo, "
        "CAST(max(i) AS BIGINT) AS hi",
    )
    sql2 = build_pg_sql(
        "generate_series(3, 994, 7) t(i)",
        select="'step7' AS arm, count(*) AS n, "
        "CAST(sum(i) AS BIGINT) AS s, CAST(min(i) AS BIGINT) AS lo, "
        "CAST(max(i) AS BIGINT) AS hi",
    )
    return spark.sql(sql1).unionByName(spark.sql(sql2))


def pg_from_srf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM-position set-returning functions through the dialect shim
    (r10 verdict order 1 — the reference's own PL/pgSQL iterates
    ``FROM json_each_text(...)`` geodb.sql:224, ``FROM json_each(...)``
    :342-345, ``FROM json_array_elements(...)`` :246,:364 and ``FROM
    unnest(...)`` :1797): rewritten to LATERAL VIEW explode /
    lateral-subquery forms (operators/scan._rewrite_from_srfs). Four
    arms — the implicit-lateral comma form over json_each_text (key +
    text value), json_each (json-typed value: strings KEEP their
    quotes), unnest of a split array, and the standalone
    json_array_elements_text subquery form. The oracle replays each arm
    with DuckDB's native lateral unnest + json_keys/json_extract."""
    register_views(spark, sf_dir, "events")
    each_text = build_pg_sql(
        "events, json_each_text(props) AS e(k, v)",
        select="'each_text' AS arm, event_id, e.k AS key, e.v AS value",
        where="event_id % 37 = 0",
    )
    each_json = build_pg_sql(
        "events, json_each(json_build_object('t', event_type)) e",
        select="'each_json' AS arm, event_id, e.key, e.value",
        where="event_id % 37 = 0",
    )
    unnest_arm = build_pg_sql(
        "events, unnest(string_to_array(event_type, 'n')) u(tok)",
        select="'unnest' AS arm, event_id, CAST(NULL AS STRING) AS key, "
        "u.tok AS value",
        where="event_id % 37 = 0",
    )
    elements = build_pg_sql(
        """json_array_elements_text('["alpha", "beta", "2"]') AS el(value)""",
        select="'elements' AS arm, CAST(NULL AS BIGINT) AS event_id, "
        "CAST(NULL AS STRING) AS key, el.value",
    )
    keys_arm = build_pg_sql(
        "events, json_object_keys(props) AS ko(k)",
        select="'keys' AS arm, event_id, CAST(NULL AS STRING) AS key, "
        "ko.k AS value",
        where="event_id % 37 = 0",
    )
    rsplit = build_pg_sql(
        "events, regexp_split_to_table(event_type, '[aeiou]') AS rs(tok)",
        select="'rsplit' AS arm, event_id, CAST(NULL AS STRING) AS key, "
        "rs.tok AS value",
        where="event_id % 37 = 0",
    )
    stable = build_pg_sql(
        "events, string_to_table(event_type, 'n') AS st(part)",
        select="'stable' AS arm, event_id, CAST(NULL AS STRING) AS key, "
        "st.part AS value",
        where="event_id % 37 = 0",
    )
    out = None
    for sql in (each_text, each_json, unnest_arm, elements, keys_arm,
                rsplit, stable):
        df = spark.sql(sql)
        out = df if out is None else out.unionByName(df)
    return out


def pg_jsonb_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG's ``jsonb || jsonb`` via the registered ``jsonb_merge``
    function (r10 verdict What's-wrong #1: the raw ``||`` spelling now
    REFUSES loudly in the shim — Spark's || would silently
    string-concatenate json texts — and points here). The merged text
    renders in PG's jsonb order (keys by length then bytes), pinned via
    the extracted fields + the key list; DuckDB replays with
    json_merge_patch (equal on null-free object merges — the null /
    array divergences are pinned PG-exact in pytest)."""
    from xcube_geodb_spark.functions.jsonsql import register_json_sql_functions

    register_json_sql_functions(spark)
    register_views(spark, sf_dir, "events")
    merged = "jsonb_merge(props, json_build_object('t', event_type))"
    sql = build_pg_sql(
        "events",
        select=(
            f"event_id, {merged} ->> 'k' AS k_val, "
            f"{merged} ->> 't' AS t_val, "
            f"array_join(json_object_keys({merged}), ',') AS key_list"
        ),
        where="event_id % 41 = 0",
        order="event_id",
    )
    return spark.sql(sql)


def pg_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG quantified comparisons over arrays (r11): ``v op ANY(arr)`` /
    ``v op ALL(arr)`` -> Spark's exists/forall higher-order predicates
    (same three-valued NULL semantics). DuckDB runs the PG spellings
    natively over lists."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select="o_orderkey, o_orderpriority",
        where=(
            "'URGENT' = ANY(string_to_array(o_orderpriority, '-')) "
            "AND o_orderkey <> ALL(ARRAY[7, 11]) "
            "AND o_orderpriority LIKE ANY(ARRAY['1%', '2%', '3%']) "
            "AND o_orderkey % 7 = 0"
        ),
        order="o_orderkey",
    )
    return spark.sql(sql)


def pg_jsonb_mutation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The jsonb mutation surface (r11 — r10 What's-missing #2):
    ``jsonb_set`` (registered function, 3- and 4-arg forms incl.
    create_missing=false), the ``-`` delete operator (rewritten to
    jsonb_delete when the left operand is provably json-typed), and the
    ``#-`` path-delete operator. Values compared via extracted fields +
    sorted key lists — NOT whole jsonb text, whose spacing is renderer-
    specific (engine PG-style ': ', DuckDB minified; r11 ADVICE: raw
    text equality only passed because the fixture is single-key);
    DuckDB replays set/delete with json_merge_patch (patch-null deletes
    keys, RFC 7386)."""
    from xcube_geodb_spark.functions.jsonsql import register_json_sql_functions

    register_json_sql_functions(spark)
    register_views(spark, sf_dir, "events")
    sql = build_pg_sql(
        "events",
        select=(
            "event_id, "
            "jsonb_set(props, '{t}', '\"x\"') ->> 't' AS t_new, "
            "jsonb_set(props, '{t}', '\"x\"') ->> 'k' AS k_kept, "
            "jsonb_set(props, '{k}', '99') ->> 'k' AS k_rep, "
            "jsonb_set(props, '{z}', '1', false) ->> 'z' AS z_missing, "
            # delete from a TWO-key object so the sibling must survive
            "jsonb_merge(props, json_build_object('t', event_type)) "
            "- 'k' ->> 't' AS del_t, "
            "array_join(json_object_keys(jsonb_merge(props, "
            "json_build_object('t', event_type)) - 'k'), ',') "
            "AS del_keys, "
            "jsonb_merge(props, json_build_object('t', event_type)) "
            "#- '{k}' ->> 't' AS delpath_t, "
            "array_join(json_object_keys(jsonb_merge(props, "
            "json_build_object('t', event_type)) #- '{k}'), ',') "
            "AS delpath_keys, "
            # the single-key shapes still pin delete-to-empty
            "props::jsonb - 'k' ->> 'k' AS del_gone, "
            "coalesce(array_join(json_object_keys(props #- '{k}'), ','), "
            "'') AS empty_keys"
        ),
        where="event_id % 43 = 0",
        order="event_id",
    )
    return spark.sql(sql)


CORE_ORACLES_PG = {
    "pg_any_all": """
        SELECT o_orderkey, o_orderpriority
        FROM orders
        WHERE 'URGENT' = ANY(string_split(o_orderpriority, '-'))
          AND o_orderkey <> ALL([7, 11])
          AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
               OR o_orderpriority LIKE '3%')
          AND o_orderkey % 7 = 0
        ORDER BY o_orderkey
    """,
    "pg_jsonb_mutation": """
        SELECT event_id,
               json_merge_patch(props, '{"t": "x"}') ->> 't' AS t_new,
               json_merge_patch(props, '{"t": "x"}') ->> 'k' AS k_kept,
               json_merge_patch(props, '{"k": 99}') ->> 'k' AS k_rep,
               props ->> 'z' AS z_missing,
               json_merge_patch(json_merge_patch(props,
                   json_object('t', event_type)), '{"k": null}') ->> 't'
                   AS del_t,
               array_to_string(json_keys(json_merge_patch(
                   json_merge_patch(props, json_object('t', event_type)),
                   '{"k": null}')), ',') AS del_keys,
               json_merge_patch(json_merge_patch(props,
                   json_object('t', event_type)), '{"k": null}') ->> 't'
                   AS delpath_t,
               array_to_string(json_keys(json_merge_patch(
                   json_merge_patch(props, json_object('t', event_type)),
                   '{"k": null}')), ',') AS delpath_keys,
               json_merge_patch(props, '{"k": null}') ->> 'k' AS del_gone,
               coalesce(array_to_string(json_keys(
                   json_merge_patch(props, '{"k": null}')), ','), '')
                   AS empty_keys
        FROM events
        WHERE event_id % 43 = 0
        ORDER BY event_id
    """,
    "pg_jsonb_merge": """
        SELECT event_id,
               json_merge_patch(props, json_object('t', event_type))
                   ->> 'k' AS k_val,
               json_merge_patch(props, json_object('t', event_type))
                   ->> 't' AS t_val,
               array_to_string(json_keys(
                   json_merge_patch(props, json_object('t', event_type))
               ), ',') AS key_list
        FROM events
        WHERE event_id % 41 = 0
        ORDER BY event_id
    """,
    "pg_within_group": """
        SELECT l_returnflag,
               round(CAST(percentile_cont(0.5) WITHIN GROUP
                     (ORDER BY l_quantity) AS DOUBLE), 6) AS med_qty,
               round(CAST(percentile_disc(0.25) WITHIN GROUP
                     (ORDER BY l_extendedprice) AS DOUBLE), 6) AS q1_price,
               CAST(mode() WITHIN GROUP (ORDER BY l_linenumber) AS INT)
                   AS mode_line
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "pg_recursive_cte": _RECURSIVE_SQL,
    "pg_lateral_topn": _LATERAL_SQL,
    "pg_window_frames": _WINDOW_FRAMES_SQL,
    "pg_grouping_sets": _GROUPING_SETS_SQL,
    "pg_unnest_regexp": """
        SELECT o_orderkey, unnest(split(o_orderpriority, '-')) AS tok,
               regexp_replace(o_orderpriority, '[aeiou]', '', 'gi')
                   AS consonants,
               regexp_replace(o_orderstatus, 'o', 'X', 'g') AS status_x
        FROM orders
        WHERE o_orderkey % 101 = 0
    """,
    "pg_agg_filter": """
        SELECT o_orderpriority, count(*) AS n_all,
               count(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
               round(CAST(sum(o_totalprice) FILTER
                     (WHERE o_orderstatus = 'F') AS DOUBLE), 2) AS sum_f,
               CAST(max(o_orderkey) FILTER (WHERE o_custkey % 2 = 0)
                    AS BIGINT) AS max_key
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "pg_from_srf": """
        SELECT 'each_text' AS arm, event_id, k AS key, props ->> k AS value
        FROM events, unnest(json_keys(props)) AS u(k)
        WHERE event_id % 37 = 0
        UNION ALL
        SELECT 'each_json' AS arm, event_id, 't' AS key,
               CAST(to_json(event_type) AS VARCHAR) AS value
        FROM events
        WHERE event_id % 37 = 0
        UNION ALL
        SELECT 'unnest' AS arm, event_id, CAST(NULL AS VARCHAR) AS key,
               u.tok AS value
        FROM events, unnest(string_to_array(event_type, 'n')) AS u(tok)
        WHERE event_id % 37 = 0
        UNION ALL
        SELECT 'elements' AS arm, CAST(NULL AS BIGINT) AS event_id,
               CAST(NULL AS VARCHAR) AS key, v AS value
        FROM unnest(['alpha', 'beta', '2']) AS t(v)
        UNION ALL
        SELECT 'keys' AS arm, event_id, CAST(NULL AS VARCHAR) AS key,
               k AS value
        FROM events, unnest(json_keys(props)) AS u(k)
        WHERE event_id % 37 = 0
        UNION ALL
        SELECT 'rsplit' AS arm, event_id, CAST(NULL AS VARCHAR) AS key,
               tok AS value
        FROM events,
             unnest(string_split_regex(event_type, '[aeiou]')) AS u(tok)
        WHERE event_id % 37 = 0
        UNION ALL
        SELECT 'stable' AS arm, event_id, CAST(NULL AS VARCHAR) AS key,
               part AS value
        FROM events, unnest(string_split(event_type, 'n')) AS u(part)
        WHERE event_id % 37 = 0
    """,
    "pg_generate_series": """
        SELECT 'unit' AS arm, count(*) AS n,
               CAST(sum(i) AS BIGINT) AS s, CAST(min(i) AS BIGINT) AS lo,
               CAST(max(i) AS BIGINT) AS hi
        FROM generate_series(1, 1000) AS t(i)
        UNION ALL
        SELECT 'step7' AS arm, count(*) AS n,
               CAST(sum(i) AS BIGINT) AS s, CAST(min(i) AS BIGINT) AS lo,
               CAST(max(i) AS BIGINT) AS hi
        FROM generate_series(3, 994, 7) t(i)
    """,
    "pg_groupby_q1": f"""
        SELECT {_Q1_SELECT} FROM lineitem
        WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "pg_topk_orders": """
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F'
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "pg_count_by_priority": """
        SELECT count(o_orderpriority) AS ct, o_orderpriority FROM orders
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "pg_distinct_on": """
        SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_custkey, o_orderdate DESC, o_orderkey
    """,
    # DuckDB's SIMILAR TO is plain POSIX regex (no %/_ wildcards — a
    # documented DuckDB deviation from PG), so the oracle replays the
    # shim's own translation as an anchored regexp_matches
    "pg_similar_to": """
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE regexp_matches(o_orderpriority, '^(?:(1|2)-.*)$')
          AND NOT regexp_matches(o_orderpriority, '^(?:.*URGENT)$')
        ORDER BY o_orderkey LIMIT 200
    """,
    "pg_array_containment": """
        SELECT doc_id FROM documents
        WHERE list_has_all(string_split(text, ' '), ['data', 'spark'])
          AND list_has_all(string_split(text, ' '), ['window'])
        ORDER BY doc_id
    """,
    "pg_string_agg": """
        SELECT o_orderpriority,
               string_agg(CAST(o_orderkey AS VARCHAR), ','
                          ORDER BY o_orderkey) AS keys
        FROM orders WHERE o_orderkey % 97 = 0
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "pg_array_agg_order": """
        SELECT c_nationkey,
               array_to_string(array_agg(c_name ORDER BY c_acctbal DESC,
                                         c_custkey DESC), '|') AS names
        FROM customer WHERE c_custkey % 53 = 0
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "pg_array_agg_order_mixed": """
        SELECT c_nationkey,
               array_to_string(array_agg(c_name ORDER BY
                   CASE WHEN c_custkey % 7 = 0 THEN NULL
                        ELSE c_acctbal END ASC NULLS FIRST,
                   c_custkey DESC), '|') AS names
        FROM customer WHERE c_custkey % 11 = 0
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "pg_json_arrows": """
        SELECT event_id,
               props ->> 'k' AS k_text,
               CAST(props ->> 'k' AS INT) + 1 AS k_plus,
               CAST(props -> 'k' AS VARCHAR) AS k_json,
               concat('{"u":{"ids":[', props ->> 'k', ',9]}}')
                   -> 'u' ->> 'ids' AS ids_text,
               json_extract_string(
                   concat('{"u":{"ids":[', props ->> 'k', ',9]}}'),
                   '$.u.ids[0]') AS id0,
               concat('[{"v":', props ->> 'k', '}]') -> 0 ->> 'v' AS v0,
               props ->> 'missing' AS gone,
               CASE json_type(props) WHEN 'OBJECT' THEN 'object'
                   WHEN 'ARRAY' THEN 'array' WHEN 'VARCHAR' THEN 'string'
                   WHEN 'BOOLEAN' THEN 'boolean' WHEN 'NULL' THEN 'null'
                   ELSE 'number' END AS t_obj,
               CASE json_type(concat('{"u":{"ids":[', props ->> 'k',
                       ',9]}}') -> 'u')
                   WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array'
                   WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN'
                   THEN 'boolean' WHEN 'NULL' THEN 'null'
                   ELSE 'number' END AS t_nested,
               CASE json_type(props -> 'k') WHEN 'OBJECT' THEN 'object'
                   WHEN 'ARRAY' THEN 'array' WHEN 'VARCHAR' THEN 'string'
                   WHEN 'BOOLEAN' THEN 'boolean' WHEN 'NULL' THEN 'null'
                   ELSE 'number' END AS t_num
        FROM events
        WHERE CAST(props ->> 'k' AS INT) >= 50
        ORDER BY event_id LIMIT 500
    """,
    "pg_array_agg_distinct": """
        SELECT o_orderstatus,
               array_to_string(array_agg(DISTINCT o_orderpriority
                   ORDER BY o_orderpriority), '|') AS prios,
               array_to_string(array_agg(DISTINCT (o_custkey % 5)
                   ORDER BY (o_custkey % 5) DESC), '|') AS buckets
        FROM orders
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "pg_json_agg": """
        SELECT o_orderstatus,
               CAST(to_json(list(o_orderkey ORDER BY o_orderkey))
                    AS VARCHAR) AS keys_json,
               CAST(to_json(list(o_orderpriority ORDER BY o_orderkey))
                    AS VARCHAR) AS prio_json,
               array_to_string(array_agg(o_orderkey ORDER BY o_orderkey)
                   FILTER (WHERE o_orderkey % 2 = 0), '|') AS even_keys
        FROM orders WHERE o_orderkey % 37 = 0
        GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "pg_scalar_shims": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS d_ymd,
               strftime(o_orderdate, '%H:%M:%S') AS d_hms,
               upper(strftime(o_orderdate, '%d %b %Y')) AS d_mon,
               CAST(len(string_split(o_orderpriority, '-')) AS INT)
                   AS n_parts,
               string_split(o_orderpriority, '-')[1] AS part1,
               round(extract(epoch from o_orderdate), 6) AS epoch_s,
               CAST(json_object('k', o_orderkey, 'p', o_orderpriority)
                    AS VARCHAR) AS obj_json,
               round(date_part('epoch', o_orderdate), 6) AS epoch_dp,
               CAST(extract(dow from o_orderdate) AS INT) AS dow,
               CAST(date_part('isodow', o_orderdate) AS INT) AS isodow,
               CAST(extract(isoyear from o_orderdate) AS INT) AS isoyr,
               CAST(extract(century from o_orderdate) AS INT) AS cent,
               CAST(date_part('decade', o_orderdate) AS INT) AS dec,
               CAST(extract(milliseconds from (CAST(o_orderdate AS
                   TIMESTAMP) + (o_orderkey % 7) *
                   (INTERVAL 250 MILLISECOND))) AS BIGINT) AS msec,
               rpad(strftime(o_orderdate, '%A'), 9, ' ') AS dayname,
               strftime(o_orderdate, '%B') AS monthname,
               CAST(extract(microseconds from (CAST(o_orderdate AS
                   TIMESTAMP) + (o_orderkey % 7) *
                   (INTERVAL 250 MILLISECOND))) AS BIGINT) AS usec,
               round(CAST(epoch(o_orderdate AT TIME ZONE
                     'America/New_York') AS DOUBLE), 6) AS epoch_nyc,
               round(epoch(CAST(o_orderdate AS TIMESTAMP)
                     - TIMESTAMP '1995-01-01 12:30:00'), 6) AS epoch_diff,
               strftime(strptime(strftime(o_orderdate, '%Y-%m-%d'),
                   '%Y-%m-%d'), '%Y-%m-%d %H:%M:%S') AS ts_rt,
               strftime(strptime(strftime(o_orderdate, '%d %b %Y'),
                   '%d %b %Y'), '%Y-%m-%d') AS d_rt,
               CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INT)
                   AS days_since,
               round(round(epoch(o_orderdate
                   + INTERVAL '0.123456' SECOND) * 1000) / 1000.0, 6)
                   AS ts_prec3,
               printf('%.2f', o_totalprice) AS price_fm,
               lpad(printf('%.2f', o_totalprice), 11, ' ') AS price_pad,
               printf('%010.0f', CAST(o_orderkey AS DOUBLE)) AS key_zero,
               '-05' AS neg_fm00,
               '-05' AS neg_00,
               '-05.3' AS neg_fm_dec,
               '-' || printf('%010.2f', CAST(o_totalprice AS DOUBLE))
                   AS neg_price_zero,
               to_json(orders) ->> 'o_orderpriority' AS rj_prio,
               ((least(o_orderdate, o_orderdate + INTERVAL 7 DAY)
                 < greatest(timestamp '1996-01-01 00:00:00',
                            timestamp '1996-02-01 00:00:00')
                 AND least(timestamp '1996-01-01 00:00:00',
                           timestamp '1996-02-01 00:00:00')
                 < greatest(o_orderdate,
                            o_orderdate + INTERVAL 7 DAY))
                OR least(o_orderdate, o_orderdate + INTERVAL 7 DAY)
                 = least(timestamp '1996-01-01 00:00:00',
                         timestamp '1996-02-01 00:00:00')) AS in_jan96,
               starts_with(o_orderpriority, '1') AS is_urgent,
               trunc(CAST(o_totalprice AS DOUBLE)) AS price_t0,
               CAST(trunc(CAST(o_totalprice AS DECIMAL(18, 4)) * 10)
                    AS DOUBLE) / 10 AS price_t1,
               lower(hex(CAST(o_orderpriority AS BLOB))) AS prio_hex,
               CAST(o_orderkey ^ 2 AS BIGINT) AS key_sq,
               CAST(-o_orderkey ^ 2 AS BIGINT) AS key_sq_neg,
               CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE)
                   AS price_dec,
               substring(o_orderpriority, 1, 3) AS prio3,
               rpad(substring(o_orderpriority, 1, 10), 10, ' ')
                   AS prio_pad,
               CAST(o_totalprice AS DOUBLE) AS dp,
               substring(o_orderpriority, 1, 3) AS cv3,
               2.0 AS rnd_tie,
               -2.0 AS rnd_tie_neg,
               round(CAST(o_totalprice + 0.201 AS DOUBLE)) AS rnd_col,
               CAST(printf('%.2f', o_totalprice) AS DOUBLE) AS price_back
        FROM orders WHERE o_orderkey % 101 = 0
        ORDER BY o_orderkey
    """,
    "pg_everyday_semantics": """
        SELECT o_orderkey,
               CAST(7 // 2 AS INT) AS lit_div,
               CAST(-7 // 2 AS INT) AS lit_div_neg,
               CAST(CAST(o_orderkey AS BIGINT) // 7 AS BIGINT) AS key_div,
               string_split(o_orderpriority, '-')[1] AS sub_first,
               string_split(o_orderpriority, '-')[9] AS sub_oob,
               string_split(o_orderpriority, '-')[0] AS sub_zero,
               array_to_string(string_split(o_orderpriority, '-')[1:2],
                   '+') AS sub_slice,
               concat(o_orderpriority, NULL, '!') AS cc,
               left(o_orderpriority, -3) AS l_neg,
               right(o_orderpriority, -3) AS r_neg,
               substring(o_orderpriority, 0, 4) AS sub0,
               regexp_extract(o_orderpriority, '[A-Z]+', 0) AS rx_word,
               CAST(NULL AS VARCHAR) AS rx_none,
               row_number() OVER (ORDER BY nullif(o_orderkey % 183, 0)
                   NULLS LAST, o_orderkey) AS rn_asc,
               row_number() OVER (ORDER BY nullif(o_orderkey % 183, 0)
                   DESC NULLS FIRST, o_orderkey) AS rn_desc,
               o_orderkey BETWEEN 1000 AND 5000 AS in_band,
               round(log(o_orderkey + 1), 6) AS log10_key,
               ltrim(o_orderpriority, '-12345') AS lt,
               rtrim(o_orderpriority, 'TWHNE') AS rt,
               lower(to_hex(o_orderkey)) AS hex_key,
               nullif(list_position(string_split(o_orderpriority, '-'),
                   'URGENT'), 0) AS ap_hit,
               array_to_string(array_prepend(o_orderstatus,
                   string_split(o_orderpriority, '-')), '.') AS ap_cat,
               array_to_string(list_transform(
                   string_split(o_orderpriority, '-'),
                   x_ -> CASE WHEN x_ = 'LOW' THEN 'L0W' ELSE x_ END),
                   '.') AS ar_rep,
               array_to_string(list_transform(
                   string_split(lower(o_orderpriority), '-'),
                   seg_ -> array_to_string(list_transform(
                       string_split(seg_, ' '),
                       w_ -> concat(upper(w_[1]), w_[2:])), ' ')),
                   '-') AS icap
        FROM orders WHERE o_orderkey % 61 = 0
        ORDER BY o_orderkey
    """,
    "pg_regexp_semantics": r"""
        SELECT c_custkey,
               regexp_replace(c_mktsegment, '\w', 'X') AS first_sub,
               regexp_replace(c_mktsegment, '[A-Z]', 'x', 'g')
                   AS all_sub,
               regexp_replace(c_name, '(\d+)', '[\1]', 'g') AS backref_g,
               regexp_replace(c_name, 'customer#', '', 'i') AS ci_first,
               regexp_replace(c_name, '([A-Za-z]+)#', '<\1>')
                   AS backref_first,
               nullif(regexp_extract(c_name, '[1-9][0-9]*'), '')
                   AS num_part,
               regexp_matches(c_name, '\d{2}[13579]$') AS ends_odd,
               CASE WHEN regexp_matches(c_name, '#(0*)([1-9][0-9]*)')
                    THEN nullif(regexp_extract(c_name,
                             '#(0*)([1-9][0-9]*)', 1), '') END AS m_zeros,
               CASE WHEN regexp_matches(c_name, '#(0*)([1-9][0-9]*)')
                    THEN nullif(regexp_extract(c_name,
                             '#(0*)([1-9][0-9]*)', 2), '') END AS m_num,
               CASE WHEN regexp_matches(c_name, '[0-9]+$')
                    THEN regexp_extract(c_name, '[0-9]+$') END
                   AS tail_num,
               concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR))
                   AS fmt,
               concat(coalesce(CAST(nullif(c_custkey % 3, 2)
                       AS VARCHAR), ''), '/', c_mktsegment) AS fmt_pos
        FROM customer WHERE c_custkey % 17 = 0
        ORDER BY c_custkey
    """,
    "pg_like_operators": """
        SELECT o_orderkey, o_orderpriority FROM orders
        WHERE o_orderpriority ~~ '%-%' AND o_orderpriority ~~* '%urgent%'
          AND o_orderpriority !~~ '9%' AND o_orderpriority !~~* '%low%'
        ORDER BY o_orderkey LIMIT 300
    """,
    "pg_jsonb_exists": """
        SELECT event_id,
               list_contains(json_keys(CASE WHEN event_id % 2 = 0
                   THEN '{"a":null,"b":2}' ELSE '{"b":2}' END), 'a')
                   AS has_a,
               list_has_any(json_keys(CASE WHEN event_id % 2 = 0
                   THEN '{"a":null,"b":2}' ELSE '{"b":2}' END),
                   ['a','zz']) AS any_a,
               list_has_all(json_keys(CASE WHEN event_id % 2 = 0
                   THEN '{"a":null,"b":2}' ELSE '{"b":2}' END),
                   ['a','b']) AS all_ab,
               CAST(json_array_length(concat('[', props ->> 'k', ',1]'))
                   AS INT) AS arr_len
        FROM events WHERE event_id % 13 = 0
        ORDER BY event_id
    """,
    "pg_json_elements": """
        SELECT event_id,
               unnest(from_json(concat('[', props ->> 'k', ',7,',
                   props ->> 'k', ']'), '["VARCHAR"]')) AS elem
        FROM events WHERE event_id % 29 = 0
        ORDER BY event_id, elem
    """,
    "pg_date_bin": """
        SELECT strftime(time_bucket(INTERVAL '15 minutes', ts,
                   TIMESTAMP '2024-01-01 00:00:00'),
                   '%Y-%m-%d %H:%M:%S') AS bucket,
               count(*) AS n
        FROM events
        GROUP BY bucket ORDER BY bucket
    """,
    "pg_array_funcs": """
        SELECT doc_id,
               CAST(nullif(len(string_split(text, ' ')), 0) AS INT)
                   AS n_toks,
               CAST(strpos(text, 'data') AS INT) AS p_data,
               array_to_string(list_concat(string_split(source, '-'),
                   string_split(lang, '-')), '|') AS cat_parts
        FROM documents WHERE doc_id % 17 = 0
        ORDER BY doc_id
    """,
    "count_lineitem": "SELECT count(*) AS n_rows FROM lineitem",
}

# ---------------------------------------------------------------------------
# relational supersets: joins / windows / rollup (SURVEY.md §2.5-2.6 —
# available through the pg passthrough; first-class here)
# ---------------------------------------------------------------------------


def pg_dialect_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-SQL path with PG-isms Spark's parser rejects: ``::`` casts
    (identifier + string-literal operands) and ``~`` regex match — the
    textual shim in scan._pg_clause_to_spark rewrites them; everything
    else is native Spark SQL."""
    register_views(spark, sf_dir, "orders")
    sql = build_pg_sql(
        "orders",
        select="o_orderkey, o_totalprice::int8 AS price_int",
        where="o_orderpriority ~ '^1' "
        "AND o_orderdate >= '1995-01-01'::timestamp",
        order="o_orderkey",
        limit=100,
    )
    return spark.sql(sql)


def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    # broadcast hint ONLY on the fixed-size dim (nation, 25 rows):
    # customer scales with SF, so a forced broadcast would OOM the build
    # side at large SF — AQE picks the orders⋈customer strategy from
    # runtime sizes (broadcast at small SF, shuffle-hash beyond threshold)
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 0).cast("long").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def join_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): selective filters on both fact
    tables pushed to their scans, AQE-chosen customer join, top-10 by
    revenue -> TakeOrderedAndProject."""
    cutoff = "1995-03-15"
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    # no forced broadcast of cust: the BUILDING-segment projection is 1/5
    # of customer and still SF-scaled — AQE picks the strategy at runtime
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
            )
            .cast("long")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
        )
    )


def skew_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """salted_join (plans/skew.py) is a result-invariant rewrite for hot
    keys AQE can't split: 8-way salted lineitem⋈supplier, revenue per
    supplier nation. The oracle is the PLAIN join — salting must not change
    a single row."""
    from xcube_geodb_spark.plans import salted_join

    li = (
        load(spark, sf_dir, "lineitem")
        .withColumn("revenue", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .select(F.col("l_suppkey").alias("s_suppkey"), "revenue")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        salted_join(li, sup, ["s_suppkey"], salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.round(F.sum("revenue"), 0).cast("long").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def join_q5_asia(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    # broadcast hints ONLY on the fixed-size dims (nation 25 rows, region
    # 5): customer scales with SF, so a forced broadcast of the derived
    # dims side would OOM the build side at large SF — AQE picks the
    # customer-join strategy from runtime sizes instead (broadcast at
    # small SF, shuffle-hash beyond the threshold)
    dims = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
            .cast("long")
            .alias("revenue")
        )
    )


def window_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("top_price"))
    )


def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window family union in one gate: ntile quartiles, lag/lead
    neighbors, percent_rank, and a running sum over customers per market
    segment (deterministic order: (acctbal desc, custkey))."""
    from pyspark.sql import Window as W

    customer = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    run = w.rowsBetween(W.unboundedPreceding, 0)
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lag("c_custkey").over(w).alias("richer_cust"),
        F.lead("c_custkey").over(w).alias("poorer_cust"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.sum("c_acctbal").over(run), 2).alias("running_acctbal"),
    )


def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
        )
    )


def agg_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (operators/stats.histogram_column): 20
    buckets of l_extendedprice over explicit bounds — the pg_stats
    histogram analogue, closed-form bucket math any engine replays."""
    from xcube_geodb_spark.operators.stats import histogram_column

    lineitem = load(spark, sf_dir, "lineitem")
    return histogram_column(
        lineitem, "l_extendedprice", bins=20, bounds=(0.0, 110000.0)
    )


def agg_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic histogram-interpolated quantiles
    (operators/stats.quantiles_column): unlike approx_percentile's
    merge-order-dependent sketch, exact integer bucket counts + a fixed
    interpolation expression replay identically on any engine. Dyadic
    width (110000/256 = 429.6875) keeps the float math exact."""
    from xcube_geodb_spark.operators.stats import quantiles_column

    lineitem = load(spark, sf_dir, "lineitem")
    return quantiles_column(
        lineitem,
        "l_extendedprice",
        qs=(0.1, 0.25, 0.5, 0.75, 0.95),
        bins=256,
        bounds=(0.0, 110000.0),
    )


def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group deterministic quantiles (p50/p95 of event value per
    event_type): the grouped form of quantiles_column — shared dyadic
    grid (500/1000 = 0.5), cumulative windows over <= bins aggregated
    rows per group."""
    from xcube_geodb_spark.operators.stats import quantiles_column

    ev = load(spark, sf_dir, "events")
    return quantiles_column(
        ev,
        "value",
        qs=(0.5, 0.95),
        bins=1000,
        bounds=(0.0, 500.0),
        group_cols=["event_type"],
    )


def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE through the raw-SQL passthrough (§2.4 documented
    superset, like rollup): all four grouping combinations of
    (returnflag, linestatus) in one pass — Spark expands the grouping
    sets map-side, so it remains a single shuffle."""
    lineitem = load(spark, sf_dir, "lineitem")
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


def distinct_mktsegment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select("c_mktsegment").distinct()


def agg_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag
        """
    )


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function coverage (SURVEY §2.7): identical expressions in
    both dialects."""
    register_views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey,
               upper(substr(p_type, 1, 5)) AS type_head,
               length(p_name) AS name_len,
               replace(p_brand, 'Brand#', 'B') AS brand_short,
               regexp_extract(p_type, '([A-Z]+)', 1) AS first_word
        FROM part WHERE p_size <= 10
        """
    )


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mth,
               count(*) AS n_orders
        FROM orders GROUP BY 1, 2
        """
    )


def agg_median_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median (Spark percentile == DuckDB quantile_cont)."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               round(percentile(o_totalprice, 0.5), 2) AS median_price
        FROM orders GROUP BY o_orderpriority
        """
    )


def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation pivot (same CASE formulation both engines)."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority
        """
    )


def agg_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(min(l_discount), 4) AS min_disc,
               round(max(l_tax), 4) AS max_tax
        FROM lineitem GROUP BY l_returnflag
        """
    )


CORE_ORACLES_RELATIONAL = {
    "pg_dialect_shim": """
        -- trunc(): Spark's double->bigint cast truncates, DuckDB's rounds
        SELECT o_orderkey, CAST(trunc(o_totalprice) AS BIGINT) AS price_int
        FROM orders
        WHERE regexp_matches(o_orderpriority, '^1')
          AND o_orderdate >= TIMESTAMP '1995-01-01'
        ORDER BY o_orderkey LIMIT 100
    """,
    "join_revenue_by_nation": """
        SELECT n_name, CAST(round(sum(o_totalprice), 0) AS BIGINT) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "join_q3_shipping": """
        SELECT l_orderkey,
               CAST(round(sum(l_extendedprice * (1 - l_discount)), 0) AS BIGINT)
                   AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS o_date
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
    """,
    "skew_salted_join_revenue": """
        SELECT s_nationkey,
               CAST(round(sum(l_extendedprice * (1 - l_discount)), 0) AS BIGINT)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey
    """,
    "join_q5_asia": """
        SELECT n_name,
               CAST(round(sum(l_extendedprice * (1 - l_discount)), 0) AS BIGINT)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "window_rank_family": """
        SELECT c_custkey, c_mktsegment,
               ntile(4) OVER w AS quartile,
               lag(c_custkey) OVER w AS richer_cust,
               lead(c_custkey) OVER w AS poorer_cust,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(sum(c_acctbal) OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_acctbal
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
    "window_top_order_per_customer": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_price
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey ASC
                   ) AS rn
            FROM orders
        ) t WHERE rn = 1
    """,
    "rollup_lineitem": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_histogram_price": """
        SELECT g.bucket,
               round(0.0 + g.bucket * 5500.0, 9) AS lo,
               round(0.0 + (g.bucket + 1) * 5500.0, 9) AS hi,
               coalesce(c.n, 0) AS n
        FROM (SELECT unnest(range(0, 20)) AS bucket) g
        LEFT JOIN (
            SELECT least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - 0.0)
                                    / 5500.0) AS BIGINT), 19) AS bucket,
                   count(*) AS n
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
              AND l_extendedprice >= 0.0 AND l_extendedprice <= 110000.0
            GROUP BY 1
        ) c USING (bucket)
        ORDER BY g.bucket
    """,
    "agg_quantiles_price": """
        WITH c AS (
            SELECT least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - 0.0)
                                    / 429.6875) AS BIGINT), 255) AS bucket,
                   count(*) AS n
            FROM lineitem
            WHERE l_extendedprice IS NOT NULL
              AND l_extendedprice >= 0.0 AND l_extendedprice <= 110000.0
            GROUP BY 1
        ),
        cum AS (
            SELECT bucket, n, sum(n) OVER (ORDER BY bucket) AS cum,
                   sum(n) OVER () AS total
            FROM c
        ),
        qv(qd) AS (VALUES (0.1), (0.25), (0.5), (0.75), (0.95)),
        q AS (SELECT CAST(qd AS DOUBLE) AS q FROM qv),
        hit AS (
            SELECT q.q, cum.bucket, cum.n, cum.cum,
                   greatest(CAST(ceil(q.q * cum.total) AS BIGINT), 1) AS t
            FROM q JOIN cum
              ON cum.cum >= greatest(CAST(ceil(q.q * cum.total) AS BIGINT), 1)
             AND (cum.cum - cum.n) <
                 greatest(CAST(ceil(q.q * cum.total) AS BIGINT), 1)
        )
        SELECT q, round(0.0 + bucket * 429.6875 +
                        429.6875 * ((t - (cum - n)) / n), 6) AS est
        FROM hit ORDER BY q
    """,
    "events_value_quantiles": """
        WITH c AS (
            SELECT event_type,
                   least(CAST(floor((CAST(value AS DOUBLE) - 0.0) / 0.5)
                              AS BIGINT), 999) AS bucket,
                   count(*) AS n
            FROM events
            WHERE value IS NOT NULL AND value >= 0.0 AND value <= 500.0
            GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, bucket, n,
                   sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
                   sum(n) OVER (PARTITION BY event_type) AS total
            FROM c
        ),
        qv(qd) AS (VALUES (0.5), (0.95)),
        q AS (SELECT CAST(qd AS DOUBLE) AS q FROM qv),
        hit AS (
            SELECT cum.event_type, q.q, cum.bucket, cum.n, cum.cum,
                   greatest(CAST(ceil(q.q * cum.total) AS BIGINT), 1) AS t
            FROM q JOIN cum
              ON cum.cum >= greatest(CAST(ceil(q.q * cum.total) AS BIGINT), 1)
             AND (cum.cum - cum.n) <
                 greatest(CAST(ceil(q.q * cum.total) AS BIGINT), 1)
        )
        SELECT event_type, q,
               round(0.0 + bucket * 0.5 + 0.5 * ((t - (cum - n)) / n), 6) AS est
        FROM hit ORDER BY event_type, q
    """,
    "cube_lineitem": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "distinct_mktsegment": "SELECT DISTINCT c_mktsegment FROM customer",
    "agg_distinct_parts": """
        SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag
    """,
    "scalar_string_funcs": """
        SELECT p_partkey,
               upper(substr(p_type, 1, 5)) AS type_head,
               CAST(length(p_name) AS INTEGER) AS name_len,
               replace(p_brand, 'Brand#', 'B') AS brand_short,
               regexp_extract(p_type, '([A-Z]+)', 1) AS first_word
        FROM part WHERE p_size <= 10
    """,
    "scalar_date_funcs": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mth,
               count(*) AS n_orders
        FROM orders GROUP BY 1, 2
    """,
    "agg_median_by_priority": """
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 2) AS median_price
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_pivot_status": """
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_stats_lineitem": """
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
               round(min(l_discount), 4) AS min_disc,
               round(max(l_tax), 4) AS max_tax
        FROM lineitem GROUP BY l_returnflag
    """,
}

# ---------------------------------------------------------------------------
# events: windowed aggregations + sessionization (streaming-shaped analytics
# in batch form; true Structured Streaming variants live in streaming/)
# ---------------------------------------------------------------------------

# CAST: DuckDB sums of integers widen to HUGEINT (-> float64 in pandas)
_SESSION_SQL = """
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM (
        SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) t GROUP BY user_id
"""


def events_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the window boundary is emitted as a formatted string: the source file
    # is TIMESTAMP(NANOS) parquet, and ns-vs-us timestamp dtypes would be a
    # spurious schema mismatch between engines
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "events")
    return spark.sql(_SESSION_SQL)


def events_asof_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (engine operator Spark lacks natively): for every event,
    the user's most recent strictly-earlier event. DuckDB's native ASOF
    JOIN is the oracle."""
    from xcube_geodb_spark.functions.temporal import asof_join

    events = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    out = asof_join(
        events,
        events.select("user_id", "ts", F.col("event_id").alias("prev_event")),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["prev_event"],
        strict=True,
        suffix="",
    )
    return out.select("event_id", "user_id", "prev_event")


def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment join (functions/temporal.range_join_events):
    every event joined to the SAME user's anchor windows
    [ts, ts + 30 min] (anchors = events with event_id % 7 == 0).
    Physically an equi-join keyed on user_id with the interval bounds as
    join-level filters — one hash shuffle per side, never a cartesian
    range explosion; at 100 TB, keys with very long interval lists add
    a time bucket to the equi-key (documented in the operator)."""
    from xcube_geodb_spark.functions.temporal import range_join_events

    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    anchors = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 0)
        .select(
            "user_id",
            F.col("event_id").alias("anchor_id"),
            F.col("ts").alias("win_start"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
        )
    )
    out = range_join_events(
        ev, anchors, on=["user_id"], left_ts="ts",
        right_start="win_start", right_end="win_end",
    )
    return out.select(ev["event_id"], ev["user_id"], F.col("anchor_id"))


def events_asof_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (direction='forward'): for every event, the
    user's next strictly-later event. (user_id, ts) pairs are unique in
    the fixture, so a lead() window is an exact oracle."""
    from xcube_geodb_spark.functions.temporal import asof_join

    events = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    out = asof_join(
        events,
        events.select("user_id", "ts", F.col("event_id").alias("next_event")),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["next_event"],
        strict=True,
        suffix="",
        direction="forward",
    )
    return out.select("event_id", "user_id", "next_event")


def events_ohlc_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (the financial/monitoring rollup): per (hour, event_type),
    the value of the earliest event (open), max (high), min (low), and the
    value of the latest event (close) — min_by/max_by on the timestamp, a
    single map-side-combinable aggregation. (event_type, ts) pairs are
    unique in every fixture SF (verified), so the timestamp alone is a
    deterministic open/close key."""
    events = load(spark, sf_dir, "events")
    key = F.col("ts")
    return (
        events.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed funnel (functions/temporal.funnel_levels): deepest
    view->click->purchase chain per user within 24h, one shuffle + JVM
    array fold. The oracle states the same exists-a-chain semantics
    relationally (self-joins with the window bound) — the fold's
    latest-feasible-chain-start invariant makes them provably equal."""
    from xcube_geodb_spark.functions.temporal import funnel_levels

    events = load(spark, sf_dir, "events")
    return funnel_levels(
        events, ["view", "click", "purchase"], within=86400.0
    )


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval attribution join (functions/temporal.attribution_join):
    every purchase paired with the same-user clicks it trails by <= 30
    minutes. One hash shuffle per side with the interval predicate as a
    join filter; the identical builder powers the stream-stream join
    (streaming/windows.stream_attribution_join), so this batch gate is
    that operator's oracle-checked twin."""
    from xcube_geodb_spark.functions.temporal import attribution_join

    events = load(spark, sf_dir, "events")
    return attribution_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
        max_lag="30 minutes",
    ).select("click_id", "conversion_id", "user_id", "lag_us")


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume anomaly detection (functions/temporal.rolling_zscore):
    6-hour buckets per event type scored against the trailing 8 observed
    buckets. Mean/variance come from integer sums (exact in doubles), so
    the oracle replays z bit-for-bit."""
    from xcube_geodb_spark.functions.temporal import rolling_zscore

    events = load(spark, sf_dir, "events")
    return rolling_zscore(
        events, bucket_seconds=21600, group_cols=["event_type"],
        window_buckets=8,
    )


def events_gapfill_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time_bucket_gapfill (functions/temporal): continuous hourly series
    per event type with empty buckets zero-filled — the TimescaleDB
    charting idiom. Oracle: generate_series grid + left join."""
    from xcube_geodb_spark.functions.temporal import time_bucket_gapfill

    events = load(spark, sf_dir, "events")
    return time_bucket_gapfill(events, 3600, ["event_type"], fill="zero")


def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward (window
    last-ignore-nulls on the dense grid)."""
    from xcube_geodb_spark.functions.temporal import time_bucket_gapfill

    events = load(spark, sf_dir, "events")
    return time_bucket_gapfill(events, 3600, ["event_type"], fill="locf")


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (functions/temporal.cohort_retention),
    daily periods: users cohorted by first-event day, cells count distinct
    active users per (cohort, offset). Epoch-day integer buckets keep both
    engines calendar-convention-free."""
    from xcube_geodb_spark.functions.temporal import cohort_retention

    events = load(spark, sf_dir, "events")
    return cohort_retention(events, period_days=1)


def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h length, 30min slide) in batch form: each event
    lands in two windows; window ids are epoch seconds so both engines
    agree without timezone-dependent timestamp rendering."""
    events = load(spark, sf_dir, "events")
    base = (F.floor(F.unix_timestamp("ts") / 1800) * 1800).cast("long")
    return (
        events.select(
            F.explode(F.array(base, base - 1800)).alias("w_start_epoch"),
            "event_type",
        )
        .groupBy("w_start_epoch", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def stream_ingest_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming ingest end-to-end: events flow through a real
    readStream file source -> foreachBatch -> exactly-once collection
    commits (streaming/sink.py), then the collection is scanned back. The
    oracle is the plain source table — streaming must lose and duplicate
    nothing."""
    import tempfile

    from xcube_geodb_spark.client import GeoDBSparkClient
    from xcube_geodb_spark.streaming import (
        streaming_events_source,
        write_stream_to_collection,
    )

    c = GeoDBSparkClient(
        spark, warehouse=tempfile.mkdtemp(prefix="geodb_sink_"), user="driver"
    )
    c.create_collection(
        "ev",
        {
            "event_id": "bigint",
            "ts": "timestamp",
            "user_id": "bigint",
            "event_type": "text",
            "value": "double",
            "props": "json",
        },
    )
    # re-write the source as micros-timestamp parquet (the raw testdata file
    # is TIMESTAMP(NANOS), which Spark's streaming reader rejects), split
    # into several files so availableNow runs multiple micro-batches
    src = tempfile.mkdtemp(prefix="geodb_stream_src_")
    load(spark, sf_dir, "events").repartition(8).write.mode(
        "overwrite"
    ).parquet(src)
    q = write_stream_to_collection(
        streaming_events_source(spark, src),
        c.catalog,
        "ev",
        "driver",
        checkpoint_dir=tempfile.mkdtemp(prefix="geodb_ckpt_"),
        query_name="ingest",
        trigger={"availableNow": True},
    )
    q.awaitTermination(300)
    # ts as epoch-micros: cross-engine timestamp dtypes differ (ns vs us)
    # while the instant is identical
    return c.catalog.load_df("ev", "driver").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props is a JSON string column; extract $.k with a regexp so the
    oracle does not depend on a JSON extension."""
    events = load(spark, sf_dir, "events")
    return (
        events.select(
            F.regexp_extract(F.col("props"), '"k":\\s*(\\d+)', 1)
            .cast("long")
            .alias("k"),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


CORE_ORACLES_EVENTS = {
    "events_tumbling_hour": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sessionization": _SESSION_SQL,
    "events_sliding_30m": """
        SELECT w_start_epoch, event_type, count(*) AS n_events FROM (
            SELECT unnest([CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT),
                           CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)])
                       AS w_start_epoch,
                   event_type
            FROM events
        ) GROUP BY 1, 2
    """,
    "events_asof_prev": """
        SELECT a.event_id, a.user_id, b.event_id AS prev_event
        FROM events a
        ASOF LEFT JOIN events b ON a.user_id = b.user_id AND b.ts < a.ts
    """,
    "events_interval_join": """
        SELECT e.event_id, e.user_id, a.anchor_id
        FROM events e
        JOIN (
            SELECT user_id, event_id AS anchor_id, ts AS s,
                   ts + INTERVAL 30 MINUTE AS en
            FROM events WHERE event_id % 7 = 0
        ) a ON a.user_id = e.user_id AND e.ts >= a.s AND e.ts <= a.en
    """,
    "events_ohlc_hour": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type,
               round(arg_min(value, ts), 4) AS open,
               round(max(value), 4) AS high,
               round(min(value), 4) AS low,
               round(arg_max(value, ts), 4) AS close,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
    "events_asof_next": """
        SELECT event_id, user_id,
               lead(event_id) OVER (PARTITION BY user_id ORDER BY ts)
                   AS next_event
        FROM events
    """,
    "events_json_extract": """
        SELECT CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k,
               count(*) AS n
        FROM events GROUP BY 1
    """,
    "events_attribution": """
        SELECT c.event_id AS click_id, p.event_id AS conversion_id,
               c.user_id,
               epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
    "events_anomaly_zscore": """
        WITH agg AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600
                       AS bucket_start,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        ),
        w AS (
            SELECT event_type, bucket_start, n_events,
                   sum(n_events) OVER win AS s1,
                   sum(n_events * n_events) OVER win AS s2,
                   count(n_events) OVER win AS cnt
            FROM agg
            WINDOW win AS (PARTITION BY event_type ORDER BY bucket_start
                           ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
        ),
        v AS (
            SELECT event_type, bucket_start, n_events, cnt,
                   s1 / cnt AS mean,
                   (s2 - (s1 * s1) / cnt) / (cnt - 1) AS var
            FROM w
        )
        SELECT event_type, bucket_start, n_events,
               CASE WHEN cnt >= 8 AND var > 0
                    THEN round((n_events - mean) / sqrt(var), 6) END AS z
        FROM v
    """,
    "events_gapfill_zero": """
        WITH agg AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                       AS bucket_start,
                   count(*) AS n_events, round(sum(value), 4) AS agg_value
            FROM events GROUP BY 1, 2
        ),
        rng AS (SELECT min(bucket_start) lo, max(bucket_start) hi FROM agg),
        grid AS (
            SELECT t.event_type, gs.g AS bucket_start
            FROM (SELECT DISTINCT event_type FROM events) t,
                 (SELECT unnest(generate_series(lo, hi, 3600)) AS g
                  FROM rng) gs
        )
        SELECT g.event_type, g.bucket_start,
               coalesce(a.n_events, 0) AS n_events,
               coalesce(a.agg_value, 0.0) AS agg_value
        FROM grid g LEFT JOIN agg a USING (event_type, bucket_start)
    """,
    "events_gapfill_locf": """
        WITH agg AS (
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600
                       AS bucket_start,
                   count(*) AS n_events, round(sum(value), 4) AS agg_value
            FROM events GROUP BY 1, 2
        ),
        rng AS (SELECT min(bucket_start) lo, max(bucket_start) hi FROM agg),
        grid AS (
            SELECT t.event_type, gs.g AS bucket_start
            FROM (SELECT DISTINCT event_type FROM events) t,
                 (SELECT unnest(generate_series(lo, hi, 3600)) AS g
                  FROM rng) gs
        )
        SELECT event_type, bucket_start,
               coalesce(n_events, 0) AS n_events,
               last_value(agg_value IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS agg_value
        FROM grid LEFT JOIN agg USING (event_type, bucket_start)
    """,
    "events_cohort_retention": """
        WITH active AS (
            SELECT DISTINCT user_id,
                   CAST(floor(date_diff('day', DATE '1970-01-01',
                                        CAST(ts AS DATE)) / 1) AS BIGINT)
                       AS p
            FROM events
        ),
        first AS (SELECT user_id, min(p) AS cohort FROM active GROUP BY 1)
        SELECT cohort AS cohort_period, p - cohort AS period_offset,
               count(DISTINCT a.user_id) AS n_users
        FROM active a JOIN first f ON f.user_id = a.user_id
        GROUP BY 1, 2
    """,
    # exists-a-chain funnel semantics stated relationally: level j iff an
    # ordered event chain for the first j steps fits the 24h window
    "events_funnel": """
        WITH lv AS (
            SELECT DISTINCT user_id, 1 AS l FROM events
            WHERE event_type = 'view'
            UNION ALL
            SELECT DISTINCT a.user_id, 2
            FROM events a JOIN events b ON b.user_id = a.user_id
            WHERE a.event_type = 'view' AND b.event_type = 'click'
              AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 24 HOUR
            UNION ALL
            SELECT DISTINCT a.user_id, 3
            FROM events a
            JOIN events b ON b.user_id = a.user_id
            JOIN events c ON c.user_id = a.user_id
            WHERE a.event_type = 'view' AND b.event_type = 'click'
              AND c.event_type = 'purchase'
              AND b.ts > a.ts AND c.ts > b.ts
              AND c.ts <= a.ts + INTERVAL 24 HOUR
        )
        SELECT user_id, CAST(max(l) AS INT) AS funnel_level
        FROM lv GROUP BY user_id
    """,
    "stream_ingest_collection": """
        SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
               value, props
        FROM events
    """,
}


CORE_QUERIES = {
    "scan_filter_eq_gt": scan_filter_eq_gt,
    "scan_filter_nested": scan_filter_nested,
    "scan_filter_in_like": scan_filter_in_like,
    "scan_filter_ilike": scan_filter_ilike,
    "scan_filter_not_in": scan_filter_not_in,
    "scan_paging": scan_paging,
    "scan_fts_documents": scan_fts_documents,
    "scan_json_arrow_select": scan_json_arrow_select,
    "scan_cs_cd_tokens": scan_cs_cd_tokens,
    "scan_fts_indexed": scan_fts_indexed,
    "pg_fts_tsvector": pg_fts_tsvector,
    "scan_filter_grammar": scan_filter_grammar,
    "head_nation": head_nation,
    "pg_groupby_q1": pg_groupby_q1,
    "pg_topk_orders": pg_topk_orders,
    "pg_count_by_priority": pg_count_by_priority,
    "pg_distinct_on": pg_distinct_on,
    "pg_similar_to": pg_similar_to,
    "pg_array_containment": pg_array_containment,
    "pg_string_agg": pg_string_agg,
    "pg_within_group": pg_within_group,
    "pg_agg_filter": pg_agg_filter,
    "pg_unnest_regexp": pg_unnest_regexp,
    "pg_window_frames": pg_window_frames,
    "pg_grouping_sets": pg_grouping_sets,
    "pg_recursive_cte": pg_recursive_cte,
    "pg_lateral_topn": pg_lateral_topn,
    "pg_generate_series": pg_generate_series,
    "pg_from_srf": pg_from_srf,
    "pg_jsonb_merge": pg_jsonb_merge,
    "pg_jsonb_mutation": pg_jsonb_mutation,
    "pg_any_all": pg_any_all,
    "pg_regexp_semantics": pg_regexp_semantics,
    "pg_array_agg_order": pg_array_agg_order,
    "pg_array_agg_order_mixed": pg_array_agg_order_mixed,
    "pg_json_arrows": pg_json_arrows,
    "pg_array_agg_distinct": pg_array_agg_distinct,
    "pg_json_agg": pg_json_agg,
    "pg_scalar_shims": pg_scalar_shims,
    "pg_everyday_semantics": pg_everyday_semantics,
    "pg_like_operators": pg_like_operators,
    "pg_jsonb_exists": pg_jsonb_exists,
    "pg_json_elements": pg_json_elements,
    "pg_date_bin": pg_date_bin,
    "pg_array_funcs": pg_array_funcs,
    "pg_dialect_shim": pg_dialect_shim,
    "count_lineitem": count_lineitem,
    "join_revenue_by_nation": join_revenue_by_nation,
    "join_q5_asia": join_q5_asia,
    "skew_salted_join_revenue": skew_salted_join_revenue,
    "join_q3_shipping": join_q3_shipping,
    "window_top_order_per_customer": window_top_order_per_customer,
    "window_rank_family": window_rank_family,
    "rollup_lineitem": rollup_lineitem,
    "cube_lineitem": cube_lineitem,
    "agg_histogram_price": agg_histogram_price,
    "agg_quantiles_price": agg_quantiles_price,
    "events_value_quantiles": events_value_quantiles,
    "distinct_mktsegment": distinct_mktsegment,
    "agg_distinct_parts": agg_distinct_parts,
    "scalar_string_funcs": scalar_string_funcs,
    "scalar_date_funcs": scalar_date_funcs,
    "agg_median_by_priority": agg_median_by_priority,
    "agg_pivot_status": agg_pivot_status,
    "agg_stats_lineitem": agg_stats_lineitem,
    "events_tumbling_hour": events_tumbling_hour,
    "events_sessionization": events_sessionization,
    "events_sliding_30m": events_sliding_30m,
    "events_asof_prev": events_asof_prev,
    "events_interval_join": events_interval_join,
    "events_asof_next": events_asof_next,
    "events_ohlc_hour": events_ohlc_hour,
    "events_funnel": events_funnel,
    "events_attribution": events_attribution,
    "events_anomaly_zscore": events_anomaly_zscore,
    "events_cohort_retention": events_cohort_retention,
    "events_gapfill_zero": events_gapfill_zero,
    "events_gapfill_locf": events_gapfill_locf,
    "events_json_extract": events_json_extract,
    "stream_ingest_collection": stream_ingest_collection,
}

CORE_ORACLES = {
    **CORE_ORACLES_GRAMMAR,
    **CORE_ORACLES_PG,
    **CORE_ORACLES_RELATIONAL,
    **CORE_ORACLES_EVENTS,
}
