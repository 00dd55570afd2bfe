"""Relational operator queries (SURVEY.md §2.2–2.9, Layer R).

Every query takes ``sf_dir``, runs a Ray Data pipeline, and has a DuckDB
oracle twin. Naming and numeric determinism rules:

- Every computed/aggregate column carries the SAME name in Ray and SQL.
- Money/float sums are converted to integer cents PER ROW before
  summing (``CAST(ROUND(x*100) AS BIGINT)``): the per-row double op is
  bit-deterministic, and integer sums are order-independent — so the
  driver's value-hash matches regardless of summation order. Raw double
  SUM/AVG would drift with aggregation order at scale.
- Sorted/limited queries carry explicit tiebreak columns so the selected
  row SET is deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.io.sources import read_table, table
from engine.ops import scalar as F
from engine.ops.agg import (
    distinct,
    global_agg,
    grouped_agg,
    partial_grouped_sum,
    topk_per_group,
)
from engine.ops.join import asof_join, broadcast_join, semi_join, shuffle_join
from engine.ops.map import explode, filter_expr, rename as rename_ds, select, with_columns
from engine.ops.order import sample_sql, seeded_sample, top_k
from engine.pipelines.sqlmirror import approx_percentile_sql, hll_grouped_sql, hll_sql
from engine.ops.setops import (
    except_all,
    except_distinct,
    intersect_all,
    intersect_distinct,
    union_all,
)
from engine.ops.sketch import approx_count_distinct
from engine.ops.window import session, sliding, tumbling
from engine.registry import register_query


def _round_away(a):
    # DuckDB ROUND() is half-away-from-zero; Arrow defaults to half-to-even.
    return pc.round(a, round_mode="half_towards_infinity")


def _cents(col):
    """Integer cents from a double column (exact, order-independent sums)."""
    return lambda t: pc.cast(_round_away(pc.multiply(t.column(col), 100.0)), pa.int64())


# ---- maps / projections / filters -----------------------------------------


@register_query(
    "q_select_filter",
    oracle="""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
              FROM lineitem WHERE l_quantity > 45""",
)
def q_select_filter(sf_dir):
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
    )
    return filter_expr(ds, lambda t: pc.greater(t.column("l_quantity"), 45))


@register_query(
    "q_with_column_revenue",
    oracle="""SELECT l_orderkey, l_linenumber,
                     CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS revenue_cents
              FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'""",
)
def q_with_column_revenue(sf_dir):
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    ds = filter_expr(
        ds, lambda t: pc.less(t.column("l_shipdate"), pa.scalar(np.datetime64("1998-01-01", "us")))
    )
    ds = with_columns(
        ds,
        {
            "revenue_cents": lambda t: pc.cast(
                _round_away(
                    pc.multiply(
                        pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))),
                        100.0,
                    )
                ),
                pa.int64(),
            )
        },
    )
    return select(ds, ["l_orderkey", "l_linenumber", "revenue_cents"])


@register_query(
    "q_string_funcs",
    oracle="""SELECT p_partkey, lower(p_name) AS name_lower,
                     CAST(length(p_name) AS BIGINT) AS name_len,
                     p_name LIKE '%green%' AS has_green,
                     upper(p_brand) AS brand_upper,
                     substr(p_type, 1, 5) AS type_prefix
              FROM part""",
)
def q_string_funcs(sf_dir):
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"])
    ds = with_columns(
        ds,
        {
            "name_lower": lambda t: F.lower(t.column("p_name")),
            "name_len": lambda t: pc.cast(F.length(t.column("p_name")), pa.int64()),
            "has_green": lambda t: F.contains(t.column("p_name"), "green"),
            "brand_upper": lambda t: F.upper(t.column("p_brand")),
            "type_prefix": lambda t: F.substr(t.column("p_type"), 1, 5),
        },
    )
    return select(ds, ["p_partkey", "name_lower", "name_len", "has_green", "brand_upper", "type_prefix"])


@register_query(
    "q_regex_funcs",
    oracle="""SELECT p_partkey,
                     regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                     regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                     lpad(p_brand, 12, '*') AS brand_pad,
                     trim(p_type) AS type_trim
              FROM part""",
)
def q_regex_funcs(sf_dir):
    """Regex + padding scalar functions (Arrow compute kernels, RE2 on
    both sides)."""
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_name", "p_brand", "p_type"])
    ds = with_columns(
        ds,
        {
            "first_word": lambda t: F.regexp_extract(t.column("p_name"), "([a-z]+)"),
            "devoweled": lambda t: F.regexp_replace(t.column("p_name"), "[aeiou]", "_"),
            "brand_pad": lambda t: F.lpad(t.column("p_brand"), 12, "*"),
            "type_trim": lambda t: F.trim(t.column("p_type")),
        },
    )
    return select(ds, ["p_partkey", "first_word", "devoweled", "brand_pad", "type_trim"])


@register_query(
    "q_date_funcs",
    oracle="""SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     CAST(month(o_orderdate) AS BIGINT) AS o_month,
                     CAST(day(o_orderdate) AS BIGINT) AS o_day,
                     CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                     CAST(epoch_us(o_orderdate) / 1000000 AS BIGINT) AS epoch_s
              FROM orders""",
)
def q_date_funcs(sf_dir):
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    ds = with_columns(
        ds,
        {
            "o_year": lambda t: pc.cast(F.year(t.column("o_orderdate")), pa.int64()),
            "o_month": lambda t: pc.cast(F.month(t.column("o_orderdate")), pa.int64()),
            "o_day": lambda t: pc.cast(F.day(t.column("o_orderdate")), pa.int64()),
            "month_start": lambda t: F.date_trunc(t.column("o_orderdate"), "month"),
            "epoch_s": lambda t: F.epoch_seconds(t.column("o_orderdate")),
        },
    )
    return select(ds, ["o_orderkey", "o_year", "o_month", "o_day", "month_start", "epoch_s"])


@register_query(
    "q_math_funcs",
    oracle="""SELECT l_orderkey, l_linenumber,
                     round(abs(l_discount - 0.05), 6) AS disc_dev,
                     round(sqrt(l_quantity), 6) AS qty_sqrt,
                     round(ln(l_extendedprice), 6) AS price_ln,
                     CAST(floor(l_quantity) AS BIGINT) AS qty_floor
              FROM lineitem WHERE l_orderkey < 1000""",
)
def q_math_funcs(sf_dir):
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_discount", "l_quantity", "l_extendedprice"],
    )
    ds = filter_expr(ds, lambda t: pc.less(t.column("l_orderkey"), 1000))
    ds = with_columns(
        ds,
        {
            "disc_dev": lambda t: F.round_(F.abs_(pc.subtract(t.column("l_discount"), 0.05)), 6),
            "qty_sqrt": lambda t: F.round_(F.sqrt(t.column("l_quantity")), 6),
            "price_ln": lambda t: F.round_(F.ln(t.column("l_extendedprice")), 6),
            "qty_floor": lambda t: pc.cast(F.floor(t.column("l_quantity")), pa.int64()),
        },
    )
    return select(ds, ["l_orderkey", "l_linenumber", "disc_dev", "qty_sqrt", "price_ln", "qty_floor"])


@register_query(
    "q_json_get",
    oracle="""SELECT event_id, CAST(props->>'k' AS BIGINT) AS k
              FROM events""",
)
def q_json_get(sf_dir):
    ds = read_table(sf_dir, "events", columns=["event_id", "props"])
    ds = with_columns(ds, {"k": lambda t: F.json_get(t.column("props"), "k")})
    return select(ds, ["event_id", "k"])


@register_query(
    "q_explode_embeddings",
    oracle="""SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
                     unnest(embedding) AS value
              FROM embeddings WHERE vec_id < 100""",
)
def q_explode_embeddings(sf_dir):
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ds = filter_expr(ds, lambda t: pc.less(t.column("vec_id"), 100))
    return explode(ds, "embedding", value_name="value", pos_name="pos")


@register_query(
    "q_sha256_documents",
    oracle="SELECT doc_id, sha256(text) AS text_sha FROM documents",
)
def q_sha256_documents(sf_dir):
    from engine.util.hashing import sha256_hex_column

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = with_columns(
        ds, {"text_sha": lambda t: pa.array(sha256_hex_column(t.column("text")), pa.string())}
    )
    return select(ds, ["doc_id", "text_sha"])


# ---- aggregations ----------------------------------------------------------


@register_query(
    "q_global_agg",
    oracle="""SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                     MIN(l_extendedprice) AS min_price,
                     MAX(l_extendedprice) AS max_price,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem""",
)
def q_global_agg(sf_dir):
    ds = read_table(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"])
    ds = with_columns(ds, {"qty_int": lambda t: pc.cast(t.column("l_quantity"), pa.int64())})
    return global_agg(
        ds,
        {
            "sum_qty": ("sum", "qty_int"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
            "n": ("count", None),
        },
    )


@register_query(
    "q_groupby_lineitem",
    oracle="""SELECT l_returnflag, l_linestatus,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                     CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_rev_cents,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
              GROUP BY l_returnflag, l_linestatus""",
)
def q_groupby_lineitem(sf_dir):
    """TPC-H Q1 shape with the partial-aggregation combiner (G3): the
    shuffle moves one row per (flag,status) per batch."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    ds = filter_expr(
        ds, lambda t: pc.less_equal(t.column("l_shipdate"), pa.scalar(np.datetime64("1998-09-01", "us")))
    )
    ds = with_columns(
        ds,
        {
            "sum_qty": lambda t: pc.cast(t.column("l_quantity"), pa.int64()),
            "sum_price_cents": _cents("l_extendedprice"),
            "sum_rev_cents": lambda t: pc.cast(
                _round_away(
                    pc.multiply(
                        pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))),
                        100.0,
                    )
                ),
                pa.int64(),
            ),
        },
    )
    return partial_grouped_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_price_cents", "sum_rev_cents"],
        count_alias="n",
    )


@register_query(
    "q_tpch_q1",
    oracle="""WITH g AS (
                SELECT l_returnflag, l_linestatus,
                       SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
                       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
                       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS sum_disc_cents,
                       SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) AS BIGINT)) AS sum_charge_cents,
                       SUM(CAST(ROUND(l_discount * 10000) AS BIGINT)) AS sum_disc_bp,
                       COUNT(*) AS n
                FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
                GROUP BY l_returnflag, l_linestatus)
              SELECT l_returnflag, l_linestatus,
                     CAST(sum_qty AS BIGINT) AS sum_qty,
                     CAST(sum_base_cents AS BIGINT) AS sum_base_cents,
                     CAST(sum_disc_cents AS BIGINT) AS sum_disc_cents,
                     CAST(sum_charge_cents AS BIGINT) AS sum_charge_cents,
                     CAST((2 * 1000000 * sum_qty + n) // (2 * n) AS BIGINT) AS avg_qty_micro,
                     CAST((2 * 10000 * sum_base_cents + n) // (2 * n) AS BIGINT) AS avg_price_micro,
                     CAST((2 * 100 * sum_disc_bp + n) // (2 * n) AS BIGINT) AS avg_disc_micro,
                     CAST(n AS BIGINT) AS count_order
              FROM g""",
)
def q_tpch_q1(sf_dir):
    """TPC-H Q1 proper (pricing summary report) — all eight measures.
    Monetary sums are per-row integer cents (order-independent); the
    three averages are exact integer micro-units derived from the sums
    with round-half-up rational arithmetic, so the result is
    bit-identical to the oracle at any parallelism. One combiner
    exchange moves 4 rows per batch."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )
    ds = filter_expr(
        ds, lambda t: pc.less_equal(t.column("l_shipdate"), pa.scalar(np.datetime64("1998-09-02", "us")))
    )

    def _disc(t):
        return pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount")))

    ds = with_columns(
        ds,
        {
            "sum_qty": lambda t: pc.cast(t.column("l_quantity"), pa.int64()),
            "sum_base_cents": _cents("l_extendedprice"),
            "sum_disc_cents": lambda t: pc.cast(
                _round_away(pc.multiply(_disc(t), 100.0)), pa.int64()
            ),
            "sum_charge_cents": lambda t: pc.cast(
                _round_away(
                    pc.multiply(pc.multiply(_disc(t), pc.add(1.0, t.column("l_tax"))), 100.0)
                ),
                pa.int64(),
            ),
            "sum_disc_bp": lambda t: pc.cast(
                _round_away(pc.multiply(t.column("l_discount"), 10000.0)), pa.int64()
            ),
        },
    )
    g = partial_grouped_sum(
        ds,
        ["l_returnflag", "l_linestatus"],
        ["sum_qty", "sum_base_cents", "sum_disc_cents", "sum_charge_cents", "sum_disc_bp"],
        count_alias="count_order",
    )

    def _avgs(t: pa.Table) -> pa.Table:
        # round-half-up rational: round(a/b) = (2a + b) // (2b), all >= 0;
        # Arrow integer divide truncates toward zero == floor for positives.
        n, two_n = t.column("count_order"), pc.multiply(t.column("count_order"), 2)

        def r(numer_scale, col):
            return pc.divide(
                pc.add(pc.multiply(t.column(col), 2 * numer_scale), n), two_n
            )

        t = t.append_column("avg_qty_micro", r(1_000_000, "sum_qty"))
        t = t.append_column("avg_price_micro", r(10_000, "sum_base_cents"))
        t = t.append_column("avg_disc_micro", r(100, "sum_disc_bp"))
        return t.drop_columns(["sum_disc_bp"])

    return g.map_batches(_avgs, batch_format="pyarrow")


@register_query(
    "q_grouped_orders",
    oracle="""SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_total_cents,
                     MAX(o_totalprice) AS max_total
              FROM orders GROUP BY o_custkey""",
)
def q_grouped_orders(sf_dir):
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    ds = with_columns(ds, {"sum_total_cents": _cents("o_totalprice")})
    return grouped_agg(
        ds,
        ["o_custkey"],
        {
            "n_orders": ("count", None),
            "sum_total_cents": ("sum", "sum_total_cents"),
            "max_total": ("max", "o_totalprice"),
        },
    )


@register_query(
    "q_grouped_mean_std",
    oracle="""WITH p AS (SELECT o_orderpriority,
                                CAST(ROUND(o_totalprice) AS BIGINT) AS q FROM orders),
              a AS (SELECT o_orderpriority, CAST(SUM(q) AS BIGINT) AS s,
                           CAST(SUM(q*q) AS BIGINT) AS qq,
                           CAST(COUNT(*) AS BIGINT) AS n
                    FROM p GROUP BY o_orderpriority)
              SELECT o_orderpriority,
                     round(CAST(s AS DOUBLE) / n, 6) AS mean_total,
                     round(sqrt((CAST(qq AS DOUBLE)
                                 - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                / (n - 1)), 6) AS std_total
              FROM a""",
)
def q_grouped_mean_std(sf_dir):
    """Decomposable mean/std through the bucketed combiner — partials
    carry (sum, sumsq, count), so the shuffle moves one row per key per
    batch instead of hitting Ray's native multi-aggregate (measured 23x
    slower over many keys). Values are whole-dollar quantized per row so
    the integer partial sums are exact and order-independent."""
    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    ds = with_columns(
        ds, {"q": lambda t: pc.cast(_round_away(t.column("o_totalprice")), pa.int64())}
    )
    out = grouped_agg(
        ds, ["o_orderpriority"], {"mean_total": ("mean", "q"), "std_total": ("std", "q")}
    )

    def _round6(df):
        df = df.copy()
        df["mean_total"] = df["mean_total"].round(6)
        df["std_total"] = df["std_total"].round(6)
        return df

    return out.map_batches(_round6, batch_format="pandas")


@register_query(
    "q_join_composite",
    oracle="""SELECT e.event_id, e.user_id, e.event_type, a.n_type
              FROM events e
              JOIN (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_type
                    FROM events GROUP BY user_id, event_type) a
              ON e.user_id = a.user_id AND e.event_type = a.event_type""",
)
def q_join_composite(sf_dir):
    """Composite-key join: every event enriched with the count of its
    (user_id, event_type) pair. Routed through auto_join's size gate:
    the aggregated side is bounded by distinct-pair cardinality, so it
    broadcasts and the fact side never shuffles (15.3s -> ~8s at sf0.1;
    a fact-sized right side falls back to the bucketed shuffle join,
    whose composite-key exchange is unit-tested directly)."""
    from engine.ops.join import auto_join

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    agg = grouped_agg(
        read_table(sf_dir, "events", columns=["user_id", "event_type"]),
        ["user_id", "event_type"],
        {"n_type": ("count", None)},
    )
    out = auto_join(ev, agg, key=["user_id", "event_type"], join_type="inner")
    return select(out, ["event_id", "user_id", "event_type", "n_type"])


@register_query(
    "q_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct(sf_dir):
    return distinct(read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"]),
                    ["l_returnflag", "l_linestatus"])


@register_query(
    "q_count_distinct",
    oracle="SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n FROM orders",
)
def q_count_distinct(sf_dir):
    from engine.ops.agg import count_distinct

    return count_distinct(read_table(sf_dir, "orders", columns=["o_custkey"]), "o_custkey", out="n")


@register_query(
    "q_heavy_hitters",
    oracle="""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
              GROUP BY user_id HAVING COUNT(*) >= 15""",
)
def q_heavy_hitters(sf_dir):
    """Exact heavy hitters via sketch-then-verify: per-batch Misra-Gries
    candidate survivors → broadcast candidate set → exact bucketed
    recount of candidates only. The sketch prunes, never decides, so the
    output is exact and oracle-checked. k is sized so the completeness
    bound n_total/(k+1) < min_count holds through sf1 (the sketch's
    soundness gate falls back to a full recount beyond that)."""
    from engine.ops.sketch import heavy_hitters

    ds = read_table(sf_dir, "events", columns=["user_id"])
    return heavy_hitters(ds, "user_id", min_count=15, k=1 << 19)


@register_query("q_hll_count_distinct", oracle=hll_sql("orders", "o_custkey"))
def q_hll_count_distinct(sf_dir):
    """Approximate COUNT DISTINCT via mergeable HLL (G5; p=12 → ~1.6%).
    Oracle-checked: the hash is splitmix64 (SQL-mirrored bit-exact) and
    the estimate consumes only exact integer register sums, so DuckDB
    recomputes the ENTIRE sketch — registers and estimate — and the
    value hashes match (engine/pipelines/sqlmirror.py)."""
    return approx_count_distinct(read_table(sf_dir, "orders", columns=["o_custkey"]), "o_custkey")


@register_query("q_hll_grouped", oracle=hll_grouped_sql("events", ["event_type"], "user_id"))
def q_hll_grouped(sf_dir):
    """Per-group approximate COUNT(DISTINCT user_id): grouped mergeable
    registers — the shuffle moves one 2^p-byte register row per group
    per batch, never user ids. Oracle recomputes the grouped sketch in
    SQL (registers depend only on each group's distinct values)."""
    from engine.ops.sketch import approx_count_distinct_grouped

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_count_distinct_grouped(ds, ["event_type"], "user_id")


@register_query(
    "q_topk_per_group",
    oracle="""SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders WHERE o_custkey < 200) WHERE rn <= 2""",
)
def q_topk_per_group(sf_dir):
    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    ds = filter_expr(ds, lambda t: pc.less(t.column("o_custkey"), 200))
    return topk_per_group(ds, ["o_custkey"], "o_totalprice", 2, descending=True, tiebreak=["o_orderkey"])


@register_query(
    "q_rollup",
    oracle="""SELECT l_returnflag, l_linestatus,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
)
def q_rollup(sf_dir):
    """GROUP BY ROLLUP: one full-data pass at the finest level, coarser
    levels re-aggregated from that small result (sum-of-sums)."""
    from engine.ops.agg import rollup

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    ds = with_columns(ds, {"sum_qty": lambda t: pc.cast(t.column("l_quantity"), pa.int64())})
    return rollup(
        ds, ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("sum", "sum_qty"), "n": ("count", None)},
    )


@register_query(
    "q_string_agg",
    oracle="""SELECT o_custkey,
                     STRING_AGG(o_orderstatus, ',' ORDER BY o_orderkey) AS statuses
              FROM orders WHERE o_custkey < 100 GROUP BY o_custkey""",
)
def q_string_agg(sf_dir):
    """Ordered STRING_AGG per group through the bucketed exchange."""
    from engine.ops.agg import string_agg_by_group

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderstatus"])
    ds = filter_expr(ds, lambda t: pc.less(t.column("o_custkey"), 100))
    return string_agg_by_group(
        ds, ["o_custkey"], "o_orderstatus", sep=",", order_by=["o_orderkey"], out="statuses"
    )


@register_query(
    "q_join_range",
    oracle="""SELECT e1.event_id, e1.user_id, e2.event_id AS r_event_id
              FROM events e1 JOIN events e2
              ON e1.user_id = e2.user_id
                 AND e2.ts BETWEEN e1.ts - INTERVAL 1 HOUR AND e1.ts
                 AND e1.event_id <> e2.event_id""",
)
def q_join_range(sf_dir):
    """Banded range join (self): for each event, the same user's other
    events in the preceding hour — co-partitioned on the user key with
    the band filtered per block."""
    from engine.ops.join import range_join

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    other = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    other = rename_ds(other, {"event_id": "r_event_id", "ts": "r_ts"})
    out = range_join(
        ev, other, by="user_id", on="ts", right_on="r_ts",
        lower_us=3_600_000_000, upper_us=0,
    )
    out = filter_expr(
        out, lambda t: pc.not_equal(t.column("event_id"), t.column("r_event_id"))
    )
    return select(out, ["event_id", "user_id", "r_event_id"])


@register_query(
    "q_join_range_global",
    oracle="""SELECT l.event_id AS l_event, r.event_id AS r_event
              FROM events l JOIN events r
              ON r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts
              WHERE l.event_type = 'purchase' AND r.event_type = 'click'""",
)
def q_join_range_global(sf_dir):
    """KEYLESS banded range join: every (purchase, click-in-the-prior-
    hour) pair regardless of user. Time-bin co-partitioned
    (range_join_global): right rows replicate to at most 2 one-hour
    bins, the exchange joins on the bin id — no key, no broadcast, no
    all-pairs."""
    import pyarrow.dataset as pads

    from engine.ops.join import range_join_global

    l = read_table(
        sf_dir, "events", columns=["event_id", "ts", "event_type"],
        filter_expr=pads.field("event_type") == "purchase",
    )
    l = rename_ds(select(l, ["event_id", "ts"]), {"event_id": "l_event"})
    r = read_table(
        sf_dir, "events", columns=["event_id", "ts", "event_type"],
        filter_expr=pads.field("event_type") == "click",
    )
    r = rename_ds(select(r, ["event_id", "ts"]), {"event_id": "r_event", "ts": "r_ts"})
    out = range_join_global(
        l, r, on="ts", right_on="r_ts", lower_us=3_600_000_000, upper_us=0
    )
    return select(out, ["l_event", "r_event"])


# ---- sort / limit / sample / set ops --------------------------------------


@register_query(
    "q_sort_limit",
    oracle="""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
)
def q_sort_limit(sf_dir):
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    return top_k(
        ds, ["l_extendedprice", "l_orderkey", "l_linenumber"], 10,
        descending=[True, False, False],
    )


@register_query(
    "q_seeded_sample",
    oracle=f"""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
               WHERE {sample_sql('l_orderkey', 10)}""",
)
def q_seeded_sample(sf_dir):
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])
    return seeded_sample(ds, "l_orderkey", 10)


@register_query(
    "q_union_all",
    oracle="""SELECT l_orderkey, CAST(year(l_shipdate) AS BIGINT) AS ship_year FROM lineitem
              WHERE year(l_shipdate) = 1994
              UNION ALL
              SELECT l_orderkey, CAST(year(l_shipdate) AS BIGINT) AS ship_year FROM lineitem
              WHERE year(l_shipdate) = 1995""",
)
def q_union_all(sf_dir):
    def year_slice(y):
        ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        ds = with_columns(ds, {"ship_year": lambda t: pc.cast(F.year(t.column("l_shipdate")), pa.int64())})
        ds = filter_expr(ds, lambda t: pc.equal(t.column("ship_year"), y))
        return select(ds, ["l_orderkey", "ship_year"])

    return union_all(year_slice(1994), year_slice(1995))


@register_query(
    "q_union_distinct",
    oracle="""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 350000
              UNION
              SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0""",
)
def q_union_distinct(sf_dir):
    """UNION (distinct): union-all of the two sides through the exact
    bucketed distinct — rows dedup per batch before the exchange."""
    from engine.ops.agg import distinct

    a = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    a = filter_expr(a, lambda t: pc.greater(t.column("o_totalprice"), 350000.0))
    a = select(a, ["o_custkey"]).rename_columns({"o_custkey": "custkey"})
    b = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    b = filter_expr(b, lambda t: pc.less(t.column("c_acctbal"), 0.0))
    b = select(b, ["c_custkey"]).rename_columns({"c_custkey": "custkey"})
    return distinct(union_all(a, b), ["custkey"])


@register_query(
    "q_intersect",
    oracle="""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
              INTERSECT
              SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0""",
)
def q_intersect(sf_dir):
    a = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    a = filter_expr(a, lambda t: pc.greater(t.column("o_totalprice"), 150000.0))
    a = select(a, ["o_custkey"]).rename_columns({"o_custkey": "custkey"})
    b = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    b = filter_expr(b, lambda t: pc.greater(t.column("c_acctbal"), 0.0))
    b = select(b, ["c_custkey"]).rename_columns({"c_custkey": "custkey"})
    return intersect_distinct(a, b, ["custkey"])


@register_query(
    "q_except",
    oracle="""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
              EXCEPT
              SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000""",
)
def q_except(sf_dir):
    def side(cut):
        ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        ds = filter_expr(ds, lambda t: pc.greater(t.column("o_totalprice"), float(cut)))
        return select(ds, ["o_custkey"]).rename_columns({"o_custkey": "custkey"})

    return except_distinct(side(300000), side(400000), ["custkey"])


@register_query(
    "q_intersect_all",
    oracle="""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
              INTERSECT ALL
              SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'""",
)
def q_intersect_all(sf_dir):
    """Bag-semantics INTERSECT ALL: multiplicity = min(count_a, count_b)
    per row value — duplicates on both sides matter, unlike q_intersect."""
    a = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    a = filter_expr(a, lambda t: pc.greater(t.column("o_totalprice"), 150000.0))
    a = select(a, ["o_custkey"]).rename_columns({"o_custkey": "custkey"})
    b = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    b = filter_expr(b, lambda t: pc.equal(t.column("o_orderstatus"), "F"))
    b = select(b, ["o_custkey"]).rename_columns({"o_custkey": "custkey"})
    return intersect_all(a, b, ["custkey"])


@register_query(
    "q_except_all",
    oracle="""SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
              EXCEPT ALL
              SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000""",
)
def q_except_all(sf_dir):
    """Bag-semantics EXCEPT ALL: multiplicity = max(count_a - count_b, 0)
    per row value."""
    def side(cut):
        ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        ds = filter_expr(ds, lambda t: pc.greater(t.column("o_totalprice"), float(cut)))
        return select(ds, ["o_custkey"]).rename_columns({"o_custkey": "custkey"})

    return except_all(side(150000), side(300000), ["custkey"])


# ---- joins -----------------------------------------------------------------


@register_query(
    "q_join_broadcast",
    oracle="""SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
                     CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_bal_cents
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name""",
)
def q_join_broadcast(sf_dir):
    """J1: dims joined driver-side (tiny), broadcast once via ray.put,
    per-batch Arrow hash join — no shuffle until the final small agg."""
    dims = table(sf_dir, "nation").join(table(sf_dir, "region"), keys=["n_regionkey"], right_keys=["r_regionkey"])
    dims = dims.select(["n_nationkey", "r_name"])
    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    ds = broadcast_join(ds, dims, keys=["c_nationkey"], right_keys=["n_nationkey"])
    ds = with_columns(ds, {"sum_bal_cents": _cents("c_acctbal")})
    return grouped_agg(
        ds, ["r_name"], {"n_cust": ("count", None), "sum_bal_cents": ("sum", "sum_bal_cents")}
    )


@register_query(
    "q_join_shuffle",
    oracle="""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderstatus = 'F'
              GROUP BY o_orderpriority""",
)
def q_join_shuffle(sf_dir):
    """J2: large × large partitioned hash join on the order key."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_orderpriority"])
    orders = filter_expr(orders, lambda t: pc.equal(t.column("o_orderstatus"), "F"))
    orders = select(orders, ["o_orderkey", "o_orderpriority"]).rename_columns({"o_orderkey": "l_orderkey"})
    joined = shuffle_join(li, orders, key="l_orderkey", join_type="inner")
    joined = with_columns(joined, {"sum_qty": lambda t: pc.cast(t.column("l_quantity"), pa.int64())})
    return partial_grouped_sum(joined, ["o_orderpriority"], ["sum_qty"], count_alias="n")


@register_query(
    "q_join_semi",
    oracle="""SELECT c_custkey, c_acctbal FROM customer
              WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)""",
)
def q_join_semi(sf_dir):
    """Size-gated semi join: distributed distinct over the filtered
    orders keys; the distinct COUNT picks driver-broadcast vs the fully
    distributed bucketed membership shuffle (auto_semi_join)."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_semi_join

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
        filter_expr=pads.field("o_totalprice") > 150000.0,
    )
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    return auto_semi_join(ds, orders, "c_custkey", right_key="o_custkey")


@register_query(
    "q_join_anti",
    oracle="""SELECT c_custkey, c_acctbal FROM customer
              WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)""",
)
def q_join_anti(sf_dir):
    import pyarrow.dataset as pads

    from engine.ops.join import auto_semi_join

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
        filter_expr=pads.field("o_totalprice") > 400000.0,
    )
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    return auto_semi_join(ds, orders, "c_custkey", right_key="o_custkey", anti=True)


@register_query(
    "q_join_asof",
    oracle="""WITH o AS (SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
                         FROM orders GROUP BY o_custkey, o_orderdate)
              SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
              FROM events e ASOF LEFT JOIN o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""",
)
def q_join_asof(sf_dir):
    """J4: per user, the latest order at-or-before each event. The right
    side is pre-reduced to one row per (custkey, date) so the as-of
    winner is deterministic."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey"])
    orders = grouped_agg(orders, ["o_custkey", "o_orderdate"], {"o_orderkey": ("max", "o_orderkey")})
    out = asof_join(ev, orders, on="ts", by="user_id", right_on="o_orderdate", right_by="o_custkey")
    return select(out, ["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"])


@register_query(
    "q_join_salted",
    oracle="""SELECT e.event_id, e.user_id, a.n_type
              FROM events e
              JOIN (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_type
                    FROM events GROUP BY user_id) a
              ON e.user_id = a.user_id""",
)
def q_join_salted(sf_dir):
    """Skew-resistant salted join on the hot user keys (the events table
    has ~1% of users carrying ~90 events each): left rows scatter over 8
    salts, the right side replicates per salt, result identical to the
    plain join (same SQL oracle shape as q_join_composite)."""
    from engine.ops.join import salted_join

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    agg = grouped_agg(
        read_table(sf_dir, "events", columns=["user_id"]),
        ["user_id"],
        {"n_type": ("count", None)},
    )
    out = salted_join(ev, agg, key="user_id", num_salts=8)
    return select(out, ["event_id", "user_id", "n_type"])


@register_query(
    "q_join_salted_outer",
    oracle="""WITH e AS (SELECT event_id, user_id FROM events WHERE user_id <= 500),
                   a AS (SELECT o_custkey AS user_id, CAST(COUNT(*) AS BIGINT) AS n_ord
                         FROM orders WHERE o_totalprice > 150000 GROUP BY 1)
              SELECT e.event_id, COALESCE(e.user_id, a.user_id) AS user_id, a.n_ord
              FROM e FULL JOIN a ON e.user_id = a.user_id""",
)
def q_join_salted_outer(sf_dir):
    """Salted FULL OUTER join: the salted left core plus the
    unmatched-right union leg (users with qualifying orders but no
    events appear with a null event_id; users with events but no
    qualifying orders appear with a null n_ord)."""
    import pyarrow.dataset as pads

    from engine.ops.join import salted_join

    ev = read_table(
        sf_dir, "events", columns=["event_id", "user_id"],
        filter_expr=pads.field("user_id") <= 500,
    )
    agg = grouped_agg(
        read_table(
            sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
            filter_expr=pads.field("o_totalprice") > 150000.0,
        ),
        ["o_custkey"],
        {"n_ord": ("count", None)},
    )
    agg = rename_ds(agg, {"o_custkey": "user_id"})
    out = salted_join(ev, agg, key="user_id", join_type="outer", num_salts=8)
    return select(out, ["event_id", "user_id", "n_ord"])


@register_query(
    "q_tpch_q3",
    oracle="""SELECT l_orderkey,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                     o_orderdate
              FROM customer, orders, lineitem
              WHERE c_mktsegment = 'BUILDING'
                AND c_custkey = o_custkey
                AND l_orderkey = o_orderkey
                AND o_orderdate < TIMESTAMP '1995-03-15'
                AND l_shipdate > TIMESTAMP '1995-03-15'
              GROUP BY l_orderkey, o_orderdate
              ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
              LIMIT 10""",
)
def q_tpch_q3(sf_dir):
    """TPC-H Q3 shape end-to-end: semi-join the customer segment into
    orders (size-gated: broadcast key set at test scale, distributed
    bucketed membership at a 100x customer segment — no customer columns
    survive, so no data join needed), size-gated lineitem x orders join
    on the order key, combiner group-sum on integer cents, partial top-k
    with tiebreaks."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_join, auto_semi_join

    cust_ds = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"],
        filter_expr=pads.field("c_mktsegment") == "BUILDING",
    )

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = filter_expr(
        orders,
        lambda t: pc.less(t.column("o_orderdate"), pa.scalar(np.datetime64("1995-03-15", "us"))),
    )
    orders = auto_semi_join(orders, cust_ds, "o_custkey", right_key="c_custkey")
    orders = select(orders, ["o_orderkey", "o_orderdate"]).rename_columns(
        {"o_orderkey": "l_orderkey"}
    )

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    li = filter_expr(
        li, lambda t: pc.greater(t.column("l_shipdate"), pa.scalar(np.datetime64("1995-03-15", "us")))
    )
    li = with_columns(
        li,
        {
            "revenue_cents": lambda t: pc.cast(
                _round_away(
                    pc.multiply(
                        pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))),
                        100.0,
                    )
                ),
                pa.int64(),
            )
        },
    )
    li = select(li, ["l_orderkey", "revenue_cents"])

    # The date+segment-filtered orders side is a small fraction of the
    # table — let the size gate broadcast it at test scale and fall back
    # to the bucketed shuffle at 100x (unconditional shuffle_join here
    # measured 2x the whole query's wall time at sf0.1).
    j = auto_join(li, orders, key="l_orderkey", join_type="inner")
    agg = partial_grouped_sum(j, ["l_orderkey", "o_orderdate"], ["revenue_cents"])
    return top_k(
        agg, ["revenue_cents", "o_orderdate", "l_orderkey"], 10,
        descending=[True, False, False],
    )


@register_query(
    "q_filter_pushdown",
    oracle="""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE l_quantity > 49""",
)
def q_filter_pushdown(sf_dir):
    """Row-predicate pushdown at the parquet scan (S1): the filter is
    evaluated by the reader (row-group stats + scan-level filtering), not
    a downstream operator."""
    import pyarrow.dataset as pads

    return read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity"],
        filter_expr=pads.field("l_quantity") > 49,
    )


@register_query(
    "q_join_asof_forward",
    oracle="""WITH e AS (SELECT user_id, ts, MIN(event_id) AS event_id
                         FROM events GROUP BY user_id, ts)
              SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
                     COALESCE(e.event_id, -1) AS event_id,
                     COALESCE(e.ts, TIMESTAMP '1970-01-01') AS ts
              FROM orders o ASOF LEFT JOIN e
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts""",
)
def q_join_asof_forward(sf_dir):
    """Forward as-of join (direction='forward'): per customer, the
    EARLIEST event at-or-after each order date; events pre-reduced to one
    row per (user, ts) for a deterministic winner, unmatched customers
    coalesced for the oracle compare."""
    import pandas as pd

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    ev = grouped_agg(ev, ["user_id", "ts"], {"event_id": ("min", "event_id")})
    out = asof_join(
        orders, ev, on="o_orderdate", by="o_custkey", right_on="ts", right_by="user_id",
        direction="forward",
    )

    def _fill(df):
        df = df.copy()
        df["event_id"] = df["event_id"].fillna(-1).astype("int64")
        df["ts"] = df["ts"].fillna(pd.Timestamp("1970-01-01")).astype("datetime64[us]")
        return df

    out = out.map_batches(_fill, batch_format="pandas")
    return select(out, ["o_orderkey", "o_custkey", "o_orderdate", "event_id", "ts"])


# ---- windows ---------------------------------------------------------------


@register_query(
    "q_window_tumbling",
    oracle="""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win, event_type,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
              FROM events GROUP BY 1, 2""",
)
def q_window_tumbling(sf_dir):
    ds = read_table(sf_dir, "events", columns=["ts", "event_type", "value"])
    ds = with_columns(ds, {"sum_value_cents": _cents("value")})
    return tumbling(
        ds, "ts", "day", ["event_type"],
        {"n": ("count", None), "sum_value_cents": ("sum", "sum_value_cents")},
    )


@register_query(
    "q_window_sliding",
    oracle="""SELECT make_timestamp((CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) - o.off) * 86400000000) AS win_start,
                     event_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM events, (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS o(off)
              WHERE make_timestamp((CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) - o.off) * 86400000000)
                    > ts - INTERVAL 2 DAYS
              GROUP BY 1, 2""",
)
def q_window_sliding(sf_dir):
    day_us = 86_400_000_000
    ds = read_table(sf_dir, "events", columns=["ts", "event_type"])
    return sliding(ds, "ts", size_us=2 * day_us, slide_us=day_us, keys=["event_type"], specs={"n": ("count", None)})


@register_query(
    "q_window_session",
    oracle="""WITH x AS (
                SELECT user_id, ts, event_id, CAST(ROUND(value * 100) AS BIGINT) AS value_cents,
                       CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTES
                                 OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS brk
                FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ), y AS (
                SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
                FROM x)
              SELECT user_id, MIN(ts) AS session_start, CAST(COUNT(*) AS BIGINT) AS n_events,
                     CAST(SUM(value_cents) AS BIGINT) AS sum_value
              FROM y GROUP BY user_id, sid""",
)
def q_window_session(sf_dir):
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])
    ds = with_columns(ds, {"value_cents": _cents("value")})
    return session(ds, "ts", "user_id", gap_us=30 * 60 * 1_000_000, agg_col="value_cents")


@register_query(
    "q_window_rank",
    oracle="""SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey DESC) AS BIGINT) AS rn,
                     CAST(RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS BIGINT) AS rnk
              FROM orders""",
)
def q_window_rank(sf_dir):
    """SQL analytic functions (row_number, rank) over a hash-bucketed
    partition exchange — one Ray group per bucket, vectorized pandas
    transforms per partition inside."""
    from engine.ops.window import analytic

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return analytic(
        ds,
        partition_by=["o_custkey"],
        order_by=["o_totalprice", "o_orderkey"],
        specs={"rn": ("row_number",), "rnk": ("rank", "o_totalprice")},
        descending=True,
    )


@register_query(
    "q_window_frames",
    oracle="""SELECT o_custkey, o_orderkey, o_totalprice,
                     CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS BIGINT) AS drnk,
                     CAST(NTILE(4) OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey DESC) AS BIGINT) AS tile,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                          PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey DESC
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
              FROM orders""",
)
def q_window_frames(sf_dir):
    """DENSE_RANK / NTILE / running SUM over the bucketed partition
    exchange (running sum on per-row integer cents → order-exact)."""
    from engine.ops.window import analytic

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    ds = with_columns(ds, {"cents": _cents("o_totalprice")})
    out = analytic(
        ds,
        partition_by=["o_custkey"],
        order_by=["o_totalprice", "o_orderkey"],
        specs={
            "drnk": ("dense_rank", "o_totalprice"),
            "tile": ("ntile", 4),
            "run_cents": ("cumsum", "cents"),
        },
        descending=True,
    )
    return select(out, ["o_custkey", "o_orderkey", "o_totalprice", "drnk", "tile", "run_cents"])


@register_query(
    "q_window_lag_lead",
    oracle="""SELECT event_id, user_id, ts, value,
                     COALESCE(LAG(value)  OVER w, -1.0) AS prev_value,
                     COALESCE(LEAD(value) OVER w, -1.0) AS next_value
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def q_window_lag_lead(sf_dir):
    """LAG/LEAD per user over event time (deterministic tiebreak on
    event_id)."""
    from engine.ops.map import with_columns
    from engine.ops.window import analytic

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = analytic(
        ds,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        specs={"prev_value": ("lag", "value", 1), "next_value": ("lead", "value", 1)},
    )

    def _fill(df):
        df = df.copy()
        df["prev_value"] = df["prev_value"].fillna(-1.0)
        df["next_value"] = df["next_value"].fillna(-1.0)
        return df

    return out.map_batches(_fill, batch_format="pandas")


@register_query(
    "q_window_range",
    oracle="""SELECT event_id, user_id, ts,
                     CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                          PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS hour_cents
              FROM events""",
)
def q_window_range(sf_dir):
    """SQL RANGE frame (time-valued window): per-user trailing-1-hour
    value sum. Peers (equal ts) on both sides are in-frame per ANSI.
    The engine computes every partition's windows in ONE vectorized
    pass per bucket (disjoint int64 banding + two global searchsorted
    against a prefix-sum) — no per-group Python. Integer cents keep the
    sums exact."""
    from engine.ops.window import analytic

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = with_columns(ds, {"cents": _cents("value")})
    out = analytic(
        ds,
        partition_by=["user_id"],
        order_by=["ts"],
        specs={"hour_cents": ("range_sum", "cents", 3_600_000_000)},
    )
    return select(out, ["event_id", "user_id", "ts", "hour_cents"])


@register_query(
    "q_window_moving",
    oracle="""SELECT event_id, user_id, ts,
                     CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                          PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS moving_cents
              FROM events""",
)
def q_window_moving(sf_dir):
    """3-row moving sum per user over event time (rolling frame on
    integer cents — order-exact)."""
    from engine.ops.window import analytic

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    ds = with_columns(ds, {"cents": _cents("value")})
    out = analytic(
        ds,
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        specs={"moving_cents": ("rolling_sum", "cents", 3)},
    )

    def _int(df):
        df = df.copy()
        df["moving_cents"] = df["moving_cents"].astype("int64")
        return df

    out = out.map_batches(_int, batch_format="pandas")
    return select(out, ["event_id", "user_id", "ts", "moving_cents"])


@register_query(
    "q_unpivot",
    oracle="""SELECT l_orderkey, l_linenumber, 'l_quantity' AS name, l_quantity AS value
              FROM lineitem WHERE l_orderkey < 500
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
              FROM lineitem WHERE l_orderkey < 500
              UNION ALL
              SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
              FROM lineitem WHERE l_orderkey < 500""",
)
def q_unpivot(sf_dir):
    """Wide→long melt (pure per-batch Arrow, no shuffle)."""
    from engine.ops.reshape import unpivot

    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"],
    )
    ds = filter_expr(ds, lambda t: pc.less(t.column("l_orderkey"), 500))
    return unpivot(ds, ["l_orderkey", "l_linenumber"], ["l_quantity", "l_discount", "l_tax"])


@register_query(
    "q_pivot",
    oracle="""SELECT o_custkey,
                     CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
                     CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
                     CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
              FROM orders GROUP BY o_custkey""",
)
def q_pivot(sf_dir):
    """Long→wide pivot: per-batch crosstab combiner → groupby sum."""
    from engine.ops.reshape import pivot_count

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    return pivot_count(ds, "o_custkey", "o_orderstatus", ["O", "F", "P"], prefix="n_")


@register_query(
    "q_pivot_sum",
    oracle="""SELECT l_returnflag,
                     CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_O,
                     CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_F
              FROM lineitem GROUP BY l_returnflag""",
)
def q_pivot_sum(sf_dir):
    """Long→wide conditional SUM pivot (per-batch pivot_table combiner)."""
    from engine.ops.reshape import pivot_sum

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    ds = with_columns(ds, {"qty": lambda t: pc.cast(t.column("l_quantity"), pa.int64())})
    return pivot_sum(ds, "l_returnflag", "l_linestatus", "qty", ["O", "F"], prefix="qty_")


@register_query(
    "q_upsert_snapshot",
    oracle="""SELECT c_custkey, acctbal_cents FROM (
                SELECT c_custkey,
                       CAST(ROUND(c_acctbal * 100) AS BIGINT) + 500 AS acctbal_cents
                FROM customer WHERE c_mktsegment = 'BUILDING'
                UNION ALL
                SELECT c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
                FROM customer
                WHERE c_custkey NOT IN (SELECT c_custkey FROM customer
                                        WHERE c_mktsegment = 'BUILDING'))""",
)
def q_upsert_snapshot(sf_dir):
    """Snapshot MERGE/upsert outside the CDC path: source rows replace
    matching target rows by key, unmatched target rows survive — an
    anti semi join (size-gated) plus a union; no full-table driver pull."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_semi_join

    target = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])
    target = with_columns(target, {"acctbal_cents": _cents("c_acctbal")})
    target = select(target, ["c_custkey", "acctbal_cents"])
    source = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_acctbal", "c_mktsegment"],
        filter_expr=pads.field("c_mktsegment") == "BUILDING",
    )
    source = with_columns(source, {
        "acctbal_cents": lambda t: pc.add(_cents("c_acctbal")(t), 500)
    })
    source = select(source, ["c_custkey", "acctbal_cents"])
    keep = auto_semi_join(target, source, "c_custkey", anti=True)
    return union_all(source, keep)


@register_query(
    "q_percentile",
    oracle="""SELECT l_returnflag,
                     PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS median_price
              FROM lineitem GROUP BY l_returnflag""",
)
def q_percentile(sf_dir):
    """Exact per-group PERCENTILE_DISC(0.5) (ANSI semantics)."""
    from engine.ops.reshape import percentile_disc_by_group

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    return percentile_disc_by_group(ds, ["l_returnflag"], "l_extendedprice", 0.5, out="median_price")


@register_query(
    "q_approx_percentile",
    oracle=approx_percentile_sql("lineitem", "l_extendedprice", [0.5, 0.9, 0.99]),
)
def q_approx_percentile(sf_dir):
    """Mergeable histogram-sketch percentiles of l_extendedprice (p50/
    p90/p99); accuracy asserted vs exact in tests/test_ops_relational.py.
    Oracle-checked: the grid arithmetic, cumulative counts and
    bin-upper-edge readout are mirrored token-for-token in DuckDB
    (engine/pipelines/sqlmirror.py) — identical doubles, identical hash."""
    from engine.ops.sketch import approx_percentile

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    return approx_percentile(ds, "l_extendedprice", [0.5, 0.9, 0.99])


@register_query(
    "q_winsorize",
    oracle="""WITH b AS (SELECT l_orderkey, l_linenumber,
                                CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
                         FROM lineitem),
               q AS (SELECT PERCENTILE_DISC(0.05) WITHIN GROUP (ORDER BY cents) AS lo,
                            PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY cents) AS hi
                     FROM b)
              SELECT l_orderkey, l_linenumber,
                     CAST(LEAST(GREATEST(cents, q.lo), q.hi) AS BIGINT) AS cents_w
              FROM b, q""",
)
def q_winsorize(sf_dir):
    """Winsorization (clip at the exact global p05/p95): the thresholds
    come from the value-histogram percentile (integer cents → bounded
    distinct values at any scale), broadcast into a pure-Arrow clamp —
    the standard outlier-capping cleanup before training/statistics."""
    from engine.ops.reshape import global_percentiles_disc

    ds = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    ds = with_columns(ds, {"cents": _cents("l_extendedprice")})
    ds = select(ds, ["l_orderkey", "l_linenumber", "cents"]).materialize()
    lo, hi = (int(v) for v in global_percentiles_disc(ds, "cents", [0.05, 0.95]))
    out = with_columns(ds, {
        "cents_w": lambda t: pc.min_element_wise(
            pc.max_element_wise(t.column("cents"), lo), hi)
    })
    return select(out, ["l_orderkey", "l_linenumber", "cents_w"])


@register_query(
    "q_join_left",
    oracle="""SELECT c.c_custkey, COALESCE(o.o_orderkey, -1) AS o_orderkey,
                     COALESCE(CAST(ROUND(o.o_totalprice * 100) AS BIGINT), -1) AS total_cents
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey""",
)
def q_join_left(sf_dir):
    """Left outer shuffle join — unmatched customers keep one row with
    typed-null right side (coalesced for the oracle compare)."""
    left = read_table(sf_dir, "customer", columns=["c_custkey"])
    right = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    right = with_columns(right, {"total_cents": _cents("o_totalprice")})
    right = select(right, ["o_custkey", "o_orderkey", "total_cents"])
    right = rename_ds(right, {"o_custkey": "c_custkey"})
    out = shuffle_join(left, right, key="c_custkey", join_type="left")

    def _fill(df):
        df = df.copy()
        df["o_orderkey"] = df["o_orderkey"].fillna(-1).astype("int64")
        df["total_cents"] = df["total_cents"].fillna(-1).astype("int64")
        return df

    return out.map_batches(_fill, batch_format="pandas")


@register_query(
    "q_window_first_last",
    oracle="""SELECT event_id, user_id,
                     FIRST_VALUE(event_id) OVER w AS first_ev,
                     LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ev
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
)
def q_window_first_last(sf_dir):
    """FIRST_VALUE / LAST_VALUE per user ordered by (ts, event_id) —
    whole-partition frame for last (the SQL default frame would echo the
    row); event_id tiebreak makes ties deterministic."""
    from engine.ops.window import analytic

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = analytic(
        ds, ["user_id"], ["ts", "event_id"],
        {"first_ev": ("first_value", "event_id"), "last_ev": ("last_value", "event_id")},
    )
    return select(out, ["event_id", "user_id", "first_ev", "last_ev"])


@register_query(
    "q_cube",
    oracle="""SELECT COALESCE(l_returnflag, '∅') AS l_returnflag,
                     COALESCE(l_linestatus, '∅') AS l_linestatus,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def q_cube(sf_dir):
    """GROUP BY CUBE: 2^k aggregation levels from ONE raw-data pass (the
    finest level re-aggregated per subset); null level keys coalesced to
    a sentinel for the hash compare."""
    from engine.ops.agg import cube

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])
    ds = with_columns(ds, {"sum_qty": lambda t: pc.cast(t.column("l_quantity"), pa.int64())})
    out = cube(ds, ["l_returnflag", "l_linestatus"],
               {"sum_qty": ("sum", "sum_qty"), "n": ("count", None)})

    def _coalesce(t: pa.Table) -> pa.Table:
        for c in ("l_returnflag", "l_linestatus"):
            i = t.column_names.index(c)
            t = t.set_column(i, c, pc.fill_null(t.column(c), "∅"))
        return t

    return out.map_batches(_coalesce, batch_format="pyarrow")


@register_query(
    "q_grouping_sets",
    oracle="""SELECT COALESCE(o_orderpriority, '∅') AS o_orderpriority,
                     COALESCE(o_orderstatus, '∅') AS o_orderstatus,
                     CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
              FROM orders
              GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderstatus), ())""",
)
def q_grouping_sets(sf_dir):
    """GROUP BY GROUPING SETS — arbitrary subsets re-aggregated from the
    finest pass (the general form of rollup/cube)."""
    from engine.ops.agg import grouping_sets

    ds = read_table(sf_dir, "orders", columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    ds = with_columns(ds, {"cents": _cents("o_totalprice")})
    out = grouping_sets(
        ds, ["o_orderpriority", "o_orderstatus"],
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        {"n": ("count", None), "cents": ("sum", "cents")},
    )

    def _coalesce(t: pa.Table) -> pa.Table:
        for c in ("o_orderpriority", "o_orderstatus"):
            i = t.column_names.index(c)
            t = t.set_column(i, c, pc.fill_null(t.column(c), "∅"))
        return t

    return out.map_batches(_coalesce, batch_format="pyarrow")


@register_query(
    "q_grouped_median",
    oracle="""SELECT l_returnflag, round(median(l_extendedprice), 6) AS med
              FROM lineitem GROUP BY l_returnflag""",
)
def q_grouped_median(sf_dir):
    """Exact per-group median (quantile_cont interpolation) — values
    co-located through the bucketed exchange, one vectorized pandas
    quantile per bucket."""
    from engine.ops.agg import grouped_quantile

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    return grouped_quantile(ds, ["l_returnflag"], "l_extendedprice", q=0.5, out="med")


@register_query(
    "q_tpch_q5",
    oracle="""SELECT n_name,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
              FROM customer, orders, lineitem, supplier, nation, region
              WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
                AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
                AND r_name = 'ASIA'
                AND o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY n_name""",
)
def q_tpch_q5(sf_dir):
    """TPC-H Q5 shape: local-supplier revenue by nation. Only the tiny
    nation ⋈ region dim is driver-side; customer and supplier are
    DATASETS — semi-filtered to ASIA nations by a broadcast key set,
    then joined through auto_join's size gate (broadcast at test sizes,
    bucketed shuffle at scale — never a driver-side dict of a scaling
    table). The one unconditional large exchange is lineitem ⋈ orders
    on the order key; integer-cents group-sum via the partial
    combiner."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_join

    dims = table(sf_dir, "nation").join(
        table(sf_dir, "region"), keys=["n_regionkey"], right_keys=["r_regionkey"]
    )
    dims = dims.filter(pc.equal(dims.column("r_name"), "ASIA")).select(
        ["n_nationkey", "n_name"]
    )
    asia = dims.select(["n_nationkey"])

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = semi_join(cust, asia.rename_columns(["c_nationkey"]), "c_nationkey")
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter_expr=(pads.field("o_orderdate") >= pa.scalar(np.datetime64("1996-01-01", "us")))
        & (pads.field("o_orderdate") < pa.scalar(np.datetime64("1997-01-01", "us"))),
    )
    orders = select(orders, ["o_orderkey", "o_custkey"])
    orders = auto_join(
        orders, rename_ds(cust, {"c_custkey": "o_custkey"}), key="o_custkey"
    )
    orders = rename_ds(
        select(orders, ["o_orderkey", "c_nationkey"]), {"o_orderkey": "l_orderkey"}
    )

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    # The date-windowed, nation-filtered orders side is a small fraction
    # of the table — size-gate it (broadcast at test scale, bucketed
    # shuffle at 100x) instead of an unconditional exchange.
    joined = auto_join(li, orders, key="l_orderkey")

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = semi_join(supp, asia.rename_columns(["s_nationkey"]), "s_nationkey")
    joined = auto_join(
        joined, rename_ds(supp, {"s_suppkey": "l_suppkey"}), key="l_suppkey"
    )
    joined = filter_expr(
        joined, lambda t: pc.equal(t.column("s_nationkey"), t.column("c_nationkey"))
    )
    joined = broadcast_join(joined, dims, keys=["s_nationkey"], right_keys=["n_nationkey"])

    def _rev(t: pa.Table) -> pa.Table:
        rev = pc.cast(
            _round_away(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(1.0, pc.cast(t.column("l_discount"), pa.float64())),
                    ),
                    100.0,
                )
            ),
            pa.int64(),
        )
        return t.append_column("revenue_cents", rev).select(["n_name", "revenue_cents"])

    out = joined.map_batches(_rev, batch_format="pyarrow")
    return partial_grouped_sum(out, ["n_name"], ["revenue_cents"])


@register_query(
    "q_tpch_q6",
    oracle="""SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
                AND l_discount BETWEEN 0.05 AND 0.07
                AND l_quantity < 24""",
)
def q_tpch_q6(sf_dir):
    """TPC-H Q6 (forecast revenue change): every predicate pushed to the
    parquet scan (row-group stats prune whole groups), then per-row
    integer-cents discount revenue summed in one tree-reduce pass —
    the minimal scan-dominated aggregate, no shuffle at all."""
    import datetime

    import pyarrow.dataset as pads

    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_extendedprice", "l_discount"],
        filter_expr=(
            (pads.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
            & (pads.field("l_shipdate") < datetime.datetime(1997, 1, 1))
            & (pads.field("l_discount") >= 0.05)
            & (pads.field("l_discount") <= 0.07)
            & (pads.field("l_quantity") < 24)
        ),
    )

    def _rev(t: pa.Table) -> pa.Table:
        cents = pc.cast(
            _round_away(pc.multiply(pc.multiply(t.column("l_extendedprice"), t.column("l_discount")), 100.0)),
            pa.int64(),
        )
        return pa.table({"c": cents})

    return global_agg(ds.map_batches(_rev, batch_format="pyarrow"),
                      {"revenue_cents": ("sum", "c"), "n": ("count", None)})


@register_query(
    "q_profile",
    oracle="""SELECT 'o_custkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS n_null,
                     CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct
              FROM orders
              UNION ALL
              SELECT 'o_orderkey', CAST(COUNT(*) AS BIGINT),
                     CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT),
                     CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
              UNION ALL
              SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
                     CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
                     CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders""",
)
def q_profile(sf_dir):
    """Ingest-validation data profile: rows / nulls / exact distincts per
    column. One streaming pass for rows+nulls (len(cols) partial rows per
    batch), one column-pruned bucketed-distinct pass per column."""
    from engine.ops.agg import profile_table

    ds = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderpriority"]
    )
    return profile_table(ds, ["o_orderkey", "o_custkey", "o_orderpriority"])


@register_query(
    "q_outlier_zscore",
    oracle="""WITH p AS (SELECT o_orderkey, o_orderpriority,
                                CAST(ROUND(o_totalprice) AS BIGINT) AS q FROM orders),
              a AS (SELECT o_orderpriority, CAST(SUM(q) AS BIGINT) AS s,
                           CAST(SUM(q*q) AS BIGINT) AS qq,
                           CAST(COUNT(*) AS BIGINT) AS n
                    FROM p GROUP BY o_orderpriority),
              st AS (SELECT o_orderpriority,
                            round(CAST(s AS DOUBLE) / n, 6) AS mean_q,
                            round(sqrt((CAST(qq AS DOUBLE)
                                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                                       / (n - 1)), 6) AS std_q
                     FROM a)
              SELECT p.o_orderkey, p.o_orderpriority, p.q
              FROM p JOIN st USING (o_orderpriority)
              WHERE abs(p.q - st.mean_q) > 1.5 * st.std_q""",
)
def q_outlier_zscore(sf_dir):
    """Per-group z-score outlier detection (aggregate-then-join-back):
    decomposed mean/std over integer-quantized values, the tiny per-group
    stats broadcast back over the fact rows, |x-mean| > 1.5*std filter
    (the synthetic prices are near-uniform, so 2-sigma would select
    nothing — uniform data never exceeds ~1.73 sigma).
    Stats are rounded half-away to 6dp in BOTH engines before comparing,
    so the boundary predicate evaluates on identical doubles."""
    from engine.ops.agg import grouped_agg

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"])
    ds = with_columns(
        ds, {"q": lambda t: pc.cast(_round_away(t.column("o_totalprice")), pa.int64())}
    ).select_columns(["o_orderkey", "o_orderpriority", "q"])
    stats = grouped_agg(
        ds, ["o_orderpriority"], {"mean_q": ("mean", "q"), "std_q": ("std", "q")}
    )

    def _r6(df):
        df = df.copy()
        for c in ("mean_q", "std_q"):
            v = df[c].to_numpy()
            df[c] = np.sign(v) * np.floor(np.abs(v) * 1e6 + 0.5) / 1e6
        return df

    small = pa.concat_tables(
        [pa.Table.from_pandas(_r6(b)) for b in stats.iter_batches(batch_format="pandas")]
    )
    joined = broadcast_join(ds, small, ["o_orderpriority"])

    def _flag(t: pa.Table) -> pa.Table:
        q = pc.cast(t.column("q"), pa.float64())
        dev = pc.abs(pc.subtract(q, t.column("mean_q")))
        keep = pc.greater(dev, pc.multiply(t.column("std_q"), 1.5))
        return t.filter(pc.fill_null(keep, False)).select(
            ["o_orderkey", "o_orderpriority", "q"]
        )

    return joined.map_batches(_flag, batch_format="pyarrow")


@register_query(
    "q_table_diff",
    oracle="""WITH old AS (SELECT o_orderkey,
                                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
                           FROM orders WHERE o_orderkey % 3 != 0),
              new AS (SELECT o_orderkey,
                             CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             + CASE WHEN o_orderkey % 5 = 0 THEN 1000 ELSE 0 END AS c
                      FROM orders WHERE o_orderkey % 4 != 0)
              SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
                     CASE WHEN o.o_orderkey IS NULL THEN 'added'
                          WHEN n.o_orderkey IS NULL THEN 'removed'
                          ELSE 'changed' END AS status
              FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
              WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.c != n.c""",
)
def q_table_diff(sf_dir):
    """Snapshot diff (the reconciliation step of any CDC backfill):
    FULL OUTER join of two table versions on the key, rows classified
    added / removed / changed by comparing integer-cent value hashes.
    Both versions derive deterministically from the same base table."""
    base = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def _ver(bump: bool):
        mod = 4 if bump else 3

        def fn(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey")
            t = t.filter(
                pc.not_equal(pc.subtract(k, pc.multiply(pc.divide(k, mod), mod)), 0)
            )
            k = t.column("o_orderkey")
            c = pc.cast(_round_away(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64())
            if bump:
                five = pc.equal(pc.subtract(k, pc.multiply(pc.divide(k, 5), 5)), 0)
                c = pc.add(c, pc.if_else(five, 1000, 0))
            name = "c_new" if bump else "c"
            return pa.table({"o_orderkey": k, name: c})

        return base.map_batches(fn, batch_format="pyarrow")

    old, new = _ver(False), _ver(True)
    j = shuffle_join(old, new, "o_orderkey", join_type="outer")

    def _classify(t: pa.Table) -> pa.Table:
        c, cn = t.column("c"), t.column("c_new")
        status = pc.if_else(
            pc.is_null(c), "added", pc.if_else(pc.is_null(cn), "removed", "changed")
        )
        keep = pc.or_(
            pc.or_(pc.is_null(c), pc.is_null(cn)),
            pc.fill_null(pc.not_equal(c, cn), False),
        )
        return pa.table(
            {"o_orderkey": t.column("o_orderkey"), "status": status}
        ).filter(keep)

    return j.map_batches(_classify, batch_format="pyarrow")


@register_query(
    "q_tpch_q18",
    oracle="""WITH big AS (SELECT l_orderkey,
                                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
                           FROM lineitem GROUP BY l_orderkey
                           HAVING SUM(CAST(l_quantity AS BIGINT)) > 150)
              SELECT o.o_orderkey, o.o_custkey, c.c_name, b.sum_qty
              FROM big b JOIN orders o ON o.o_orderkey = b.l_orderkey
              JOIN customer c ON c.c_custkey = o.o_custkey""",
)
def q_tpch_q18(sf_dir):
    """TPC-H Q18 (large-volume customers): bucketed combiner sum over
    lineitem → HAVING filter (the group list shrinks before any join) →
    size-gated joins back to orders and customer. The wide table is
    aggregated before anything is joined — no fact-to-fact shuffle."""
    from engine.ops.join import auto_join

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    li = with_columns(li, {"q": lambda t: pc.cast(t.column("l_quantity"), pa.int64())})
    big = grouped_agg(li, ["l_orderkey"], {"sum_qty": ("sum", "q")})
    big = filter_expr(big, lambda t: pc.greater(t.column("sum_qty"), 150))
    big = rename_ds(big, {"l_orderkey": "o_orderkey"})

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    j = auto_join(orders, big, "o_orderkey")

    cust = rename_ds(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]),
        {"c_custkey": "o_custkey"},
    )
    out = auto_join(j, cust, "o_custkey")
    return select(out, ["o_orderkey", "o_custkey", "c_name", "sum_qty"])


@register_query(
    "q_join_bloom",
    oracle="""SELECT o_orderkey, o_custkey FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM customer
                                  WHERE c_acctbal > 9000)""",
)
def q_join_bloom(sf_dir):
    """Bloom-pruned semi join: a 1M-bit Bloom filter of the qualifying
    customer keys is built distributed (bitmap partials OR-folded, keys
    never leave their tasks), broadcast once, and drops non-matching
    orders BEFORE the exact semi join — the classic pre-shuffle
    reduction. The exact key-set pass removes Bloom false positives, so
    the result is identical to the plain semi join."""
    import pyarrow.dataset as pads

    from engine.ops.join import bloom_filter_keys, bloom_prune, distributed_keyset

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey"],
        filter_expr=pads.field("c_acctbal") > 9000,
    )
    bloom = bloom_filter_keys(cust, "c_custkey")
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    pruned = bloom_prune(orders, "o_custkey", bloom)
    from engine.ops.join import auto_semi_join

    return auto_semi_join(pruned, cust, "o_custkey", right_key="c_custkey")


@register_query(
    "q_corr_regr",
    oracle="""WITH p AS (SELECT l_returnflag,
                                CAST(l_quantity AS BIGINT) AS x,
                                CAST(ROUND(l_discount * 100) AS BIGINT) AS y
                         FROM lineitem),
              a AS (SELECT l_returnflag,
                           CAST(SUM(x) AS DOUBLE) AS sx,
                           CAST(SUM(y) AS DOUBLE) AS sy,
                           CAST(SUM(x * x) AS DOUBLE) AS xx,
                           CAST(SUM(y * y) AS DOUBLE) AS yy,
                           CAST(SUM(x * y) AS DOUBLE) AS xy,
                           CAST(COUNT(*) AS DOUBLE) AS n
                    FROM p GROUP BY l_returnflag)
              SELECT l_returnflag,
                     round((xy - sx * sy / n) / (n - 1.0), 6) AS covar_qd,
                     round((xy - sx * sy / n)
                           / sqrt((xx - sx * sx / n) * (yy - sy * sy / n)), 6)
                       AS corr_qd,
                     round((xy - sx * sy / n) / (xx - sx * sx / n), 6)
                       AS slope_qd,
                     round(sy / n - ((xy - sx * sy / n) / (xx - sx * sx / n))
                                    * (sx / n), 6) AS icpt_qd
              FROM a""",
)
def q_corr_regr(sf_dir):
    """Two-column decomposable aggregates (COVAR_SAMP / CORR / REGR_SLOPE
    / REGR_INTERCEPT of discount-cents on quantity) through the bucketed
    combiner: partials carry (Σx, Σy, Σx², Σy², Σxy, n) per key — the
    shuffle moves one 7-ints row per key per batch, never events. Both
    columns are integer-quantized per row so partial sums are exact and
    order-independent; the oracle SQL mirrors the identical float64
    final-formula parenthesization, so round(6) hashes bit-equal."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_discount"])
    ds = with_columns(
        ds,
        {
            "x": lambda t: pc.cast(t.column("l_quantity"), pa.int64()),
            "y": lambda t: pc.cast(
                _round_away(pc.multiply(t.column("l_discount"), 100.0)), pa.int64()
            ),
        },
    )
    out = grouped_agg(
        ds,
        ["l_returnflag"],
        {
            "covar_qd": ("covar", ("x", "y")),
            "corr_qd": ("corr", ("x", "y")),
            "slope_qd": ("regr_slope", ("x", "y")),
            "icpt_qd": ("regr_intercept", ("x", "y")),
        },
    )

    def _round6(df):
        for c in ("covar_qd", "corr_qd", "slope_qd", "icpt_qd"):
            df[c] = df[c].round(6)
        return df

    return out.map_batches(_round6, batch_format="pandas")


@register_query(
    "q_tpch_q14",
    oracle="""WITH j AS (SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                                     AS BIGINT) AS rev_cents,
                                p_type
                         FROM lineitem JOIN part ON l_partkey = p_partkey
                         WHERE l_shipdate >= TIMESTAMP '1996-09-01'
                           AND l_shipdate < TIMESTAMP '1996-10-01')
              SELECT round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                                               THEN rev_cents ELSE 0 END) AS DOUBLE)
                           / CAST(SUM(rev_cents) AS DOUBLE), 6) AS promo_pct
              FROM j""",
)
def q_tpch_q14(sf_dir):
    """TPC-H Q14 (promotion effect): month predicate pushed to the scan,
    the small part side (p_partkey, p_type only) broadcast once — the
    fact table never shuffles — then per-row integer-cents revenue and
    one global tree-reduce pass. The final ratio divides two exact
    integer sums cast to double, mirrored exactly in the oracle."""
    import datetime

    import pyarrow.dataset as pads

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter_expr=(
            (pads.field("l_shipdate") >= datetime.datetime(1996, 9, 1))
            & (pads.field("l_shipdate") < datetime.datetime(1996, 10, 1))
        ),
    )
    part = table(sf_dir, "part", columns=["p_partkey", "p_type"])
    j = broadcast_join(li, part, keys=["l_partkey"], right_keys=["p_partkey"])

    def _cents_promo(t: pa.Table) -> pa.Table:
        rev = pc.cast(
            _round_away(
                pc.multiply(
                    pc.multiply(
                        t.column("l_extendedprice"),
                        pc.subtract(1.0, t.column("l_discount")),
                    ),
                    100.0,
                )
            ),
            pa.int64(),
        )
        promo = pc.if_else(
            pc.equal(t.column("p_type"), "PROMO"), rev, pa.scalar(0, pa.int64())
        )
        return pa.table({"rev_cents": rev, "promo_cents": promo})

    sums = global_agg(
        j.map_batches(_cents_promo, batch_format="pyarrow"),
        {"p": ("sum", "promo_cents"), "r": ("sum", "rev_cents")},
    )
    pct = round(100.0 * float(sums.column("p")[0].as_py()) / float(sums.column("r")[0].as_py()), 6)
    return pa.table({"promo_pct": [pct]})


@register_query(
    "q_scd2",
    oracle="""WITH o AS (
                SELECT user_id, event_id, ts, event_type,
                       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM events),
              ch AS (
                SELECT user_id, event_id, ts AS valid_from, event_type
                FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
              SELECT user_id, event_id, valid_from,
                     lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
                     event_type,
                     CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL
                          THEN 1 ELSE 0 END AS BIGINT) AS is_current
              FROM ch""",
)
def q_scd2(sf_dir):
    """SCD type-2 dimension history from a change stream: per user_id the
    event sequence is compacted to state-change versions with
    [valid_from, valid_to) intervals and an is_current flag — the
    standard CDC->warehouse dimension build. One bucketed exchange; the
    interval assignment is vectorized pandas per hash bucket."""
    from engine.ops.window import scd2_history

    ds = read_table(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    out = scd2_history(
        ds, key=["user_id"], order_by=["ts", "event_id"],
        state_cols=["event_type"], valid_from_col="ts",
    )
    return select(out, ["user_id", "event_id", "valid_from", "valid_to", "event_type", "is_current"])


@register_query(
    "q_tpch_q4",
    oracle="""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
              FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1996-07-01'
                AND EXISTS (SELECT 1 FROM lineitem
                            WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
              GROUP BY o_orderpriority""",
)
def q_tpch_q4(sf_dir):
    """TPC-H Q4 shape (order-priority checking), adapted to the testdata
    columns (EXISTS predicate = a returned line item). The EXISTS is a
    fully distributed semi join: bucketed distinct over the filtered
    lineitem keys (no broadcast — the fact-side key set is unbounded at
    scale), then a shuffle join against the date-windowed orders."""
    import datetime

    import pyarrow.dataset as pads

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey"],
        filter_expr=pads.field("l_returnflag") == "R",
    )
    keys = rename_ds(distinct(li, ["l_orderkey"]), {"l_orderkey": "o_orderkey"})
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"],
        filter_expr=(
            (pads.field("o_orderdate") >= datetime.datetime(1996, 1, 1))
            & (pads.field("o_orderdate") < datetime.datetime(1996, 7, 1))
        ),
    )
    j = shuffle_join(orders, keys, key="o_orderkey", join_type="inner")
    return grouped_agg(
        select(j, ["o_orderpriority"]), ["o_orderpriority"], {"order_count": ("count", None)}
    )


@register_query(
    "q_tpch_q10",
    oracle="""SELECT c_custkey, c_name, c_acctbal, n_name, revenue_cents FROM (
                SELECT c_custkey, c_name, c_acctbal, n_name,
                       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                         AS revenue_cents
                FROM customer, orders, lineitem, nation
                WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
                  AND o_orderdate >= TIMESTAMP '1995-10-01'
                  AND o_orderdate < TIMESTAMP '1996-01-01'
                  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
                GROUP BY c_custkey, c_name, c_acctbal, n_name)
              ORDER BY revenue_cents DESC, c_custkey LIMIT 20""",
)
def q_tpch_q10(sf_dir):
    """TPC-H Q10 (returned-item reporting): pruned/filtered fact reads,
    integer-cents per-row revenue, combiner group-sum per customer key
    BEFORE the customer join (the join input is one row per customer,
    not per line item), dimension nation broadcast, top-20 with key
    tiebreak."""
    import datetime

    import pyarrow.dataset as pads

    from engine.ops.join import auto_join

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter_expr=pads.field("l_returnflag") == "R",
    )
    li = with_columns(
        li,
        {
            "revenue_cents": lambda t: pc.cast(
                _round_away(
                    pc.multiply(
                        pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount"))),
                        100.0,
                    )
                ),
                pa.int64(),
            )
        },
    )
    li = select(li, ["l_orderkey", "revenue_cents"])
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
        filter_expr=(
            (pads.field("o_orderdate") >= datetime.datetime(1995, 10, 1))
            & (pads.field("o_orderdate") < datetime.datetime(1996, 1, 1))
        ),
    )
    orders = rename_ds(orders, {"o_orderkey": "l_orderkey"})
    # The 3-month order window is a small fraction of the orders table —
    # let the size gate pick broadcast (measured: the blind shuffle pair
    # cost 2 x 10-14 s exchanges at sf0.1; auto_join drops both).
    j = auto_join(li, orders, key="l_orderkey", join_type="inner")
    per_cust = partial_grouped_sum(
        select(j, ["o_custkey", "revenue_cents"]), ["o_custkey"], ["revenue_cents"]
    )
    cust = rename_ds(
        read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]),
        {"c_custkey": "o_custkey"},
    )
    j2 = auto_join(per_cust, cust, key="o_custkey", join_type="inner")
    nat = table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    j3 = broadcast_join(j2, nat, keys=["c_nationkey"], right_keys=["n_nationkey"])
    out = rename_ds(
        select(j3, ["o_custkey", "c_name", "c_acctbal", "n_name", "revenue_cents"]),
        {"o_custkey": "c_custkey"},
    )
    return top_k(out, ["revenue_cents", "c_custkey"], 20, descending=[True, False])


@register_query(
    "q_tpch_q12",
    oracle="""SELECT l_linestatus,
                     CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                     CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
              FROM orders, lineitem
              WHERE o_orderkey = l_orderkey
                AND l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY l_linestatus""",
)
def q_tpch_q12(sf_dir):
    """TPC-H Q12 shape (shipping-mode priority split; l_linestatus stands
    in for the testdata's missing l_shipmode): windowed fact read, one
    shuffle join, per-row 0/1 projection, combiner group-sum."""
    import datetime

    import pyarrow.dataset as pads

    li = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_linestatus"],
        filter_expr=(
            (pads.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
            & (pads.field("l_shipdate") < datetime.datetime(1997, 1, 1))
        ),
    )
    orders = rename_ds(
        read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]),
        {"o_orderkey": "l_orderkey"},
    )
    j = shuffle_join(li, orders, key="l_orderkey", join_type="inner")

    def _hl(t: pa.Table) -> pa.Table:
        hi = pc.cast(
            pc.is_in(t.column("o_orderpriority"), value_set=pa.array(["1-URGENT", "2-HIGH"])),
            pa.int64(),
        )
        return pa.table(
            {
                "l_linestatus": t.column("l_linestatus"),
                "high_line_count": hi,
                "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), hi),
            }
        )

    return partial_grouped_sum(
        j.map_batches(_hl, batch_format="pyarrow"),
        ["l_linestatus"], ["high_line_count", "low_line_count"],
    )


@register_query(
    "q_date_spine",
    oracle="""WITH spine AS (
                SELECT (TIMESTAMP '1995-01-01' + INTERVAL (CAST(range AS INT)) MONTH) AS month_start
                FROM range(0, 80)),
              cnt AS (SELECT date_trunc('month', o_orderdate) AS month_start,
                             CAST(COUNT(*) AS BIGINT) AS n_orders
                      FROM orders GROUP BY 1)
              SELECT s.month_start, COALESCE(c.n_orders, 0) AS n_orders
              FROM spine s LEFT JOIN cnt c USING (month_start)""",
)
def q_date_spine(sf_dir):
    """Calendar-spine densification (the ETL staple behind every
    gap-free time series): a GENERATED month spine (ray.data.range — a
    source with no backing file) left-joined against per-month order
    counts, missing months zero-filled."""
    import ray.data as rd

    from engine.ops.join import auto_join

    def _months(t: pa.Table) -> pa.Table:
        i = t.column("id").to_numpy()
        vals = (np.datetime64("1995-01", "M") + i).astype("datetime64[us]")
        return pa.table({"month_start": pa.array(vals, pa.timestamp("us"))})

    spine = rd.range(80).map_batches(_months, batch_format="pyarrow")

    def _trunc(t: pa.Table) -> pa.Table:
        return pa.table(
            {"month_start": pc.floor_temporal(t.column("o_orderdate"), unit="month")}
        )

    cnt = grouped_agg(
        read_table(sf_dir, "orders", columns=["o_orderdate"]).map_batches(
            _trunc, batch_format="pyarrow"
        ),
        ["month_start"],
        {"n_orders": ("count", None)},
    )
    j = auto_join(spine, cnt, key="month_start", join_type="left")

    def _fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "month_start": t.column("month_start"),
                "n_orders": pc.coalesce(t.column("n_orders"), pa.scalar(0, pa.int64())),
            }
        )

    return j.map_batches(_fill, batch_format="pyarrow")


@register_query(
    "q_funnel",
    oracle="""WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
                         WHERE event_type = 'view' GROUP BY user_id),
              c AS (SELECT e.user_id, MIN(e.ts) AS t_click
                    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
                    WHERE e.event_type = 'click' GROUP BY e.user_id),
              p AS (SELECT e.user_id FROM events e
                    JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
                    WHERE e.event_type = 'purchase' GROUP BY e.user_id)
              SELECT * FROM (
                SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
                UNION ALL SELECT 'view_click', CAST(COUNT(*) AS BIGINT) FROM c
                UNION ALL SELECT 'view_click_purchase', CAST(COUNT(*) AS BIGINT) FROM p)""",
)
def q_funnel(sf_dir):
    """Event-funnel analysis (view -> click-after-view ->
    purchase-after-click): each user's events are co-located by the
    bucketed exchange, the per-bucket stage counts are vectorized pandas
    (min-timestamp chaining, no per-user loops), and a tiny 3-row
    grouped sum folds the bucket partials."""
    import pandas as pd

    from engine.ops.bucket import bucketed_map_groups

    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def _fun(df: pd.DataFrame) -> pd.DataFrame:
        v = df.loc[df["event_type"] == "view"].groupby("user_id")["ts"].min()
        d2 = df.loc[df["event_type"] == "click"].merge(
            v.rename("t_view"), left_on="user_id", right_index=True
        )
        c = d2.loc[d2["ts"] > d2["t_view"]].groupby("user_id")["ts"].min()
        d3 = df.loc[df["event_type"] == "purchase"].merge(
            c.rename("t_click"), left_on="user_id", right_index=True
        )
        n_p = int(d3.loc[d3["ts"] > d3["t_click"], "user_id"].nunique())
        return pd.DataFrame(
            {
                "stage": ["view", "view_click", "view_click_purchase"],
                "n_users": np.array([len(v), len(c), n_p], dtype=np.int64),
            }
        )

    partials = bucketed_map_groups(ds, ["user_id"], _fun, seed="funnel")
    return grouped_agg(partials, ["stage"], {"n_users": ("sum", "n_users")})


@register_query(
    "q_retention",
    oracle="""WITH f AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort
                         FROM events GROUP BY user_id),
              act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
                      FROM events),
              r AS (SELECT f.cohort,
                           CAST(date_diff('day', f.cohort, a.week) // 7 AS BIGINT) AS weeks_since
                    FROM f JOIN act a USING (user_id))
              SELECT cohort, weeks_since, CAST(COUNT(*) AS BIGINT) AS n_users
              FROM r GROUP BY cohort, weeks_since""",
)
def q_retention(sf_dir):
    """Cohort retention matrix (weekly): cohort = Monday-start week of a
    user's first event; n_users = distinct users of that cohort active
    weeks_since weeks later. Users are co-located by the bucketed
    exchange, so first-week/active-week/distinct are vectorized pandas
    per bucket; a tiny grouped sum folds the bucket partials."""
    import pandas as pd

    from engine.ops.bucket import bucketed_map_groups

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def _ret(df: pd.DataFrame) -> pd.DataFrame:
        # Monday-start weeks, matching DuckDB's ISO date_trunc('week').
        d = df.assign(week=df["ts"].dt.to_period("W-SUN").dt.start_time)
        cohort = d.groupby("user_id")["week"].min().rename("cohort")
        act = d[["user_id", "week"]].drop_duplicates()
        r = act.merge(cohort, left_on="user_id", right_index=True)
        r["weeks_since"] = ((r["week"] - r["cohort"]).dt.days // 7).astype("int64")
        out = (
            r.groupby(["cohort", "weeks_since"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out[["cohort", "weeks_since", "n_users"]]

    partials = bucketed_map_groups(ds, ["user_id"], _ret, seed="retention")
    return grouped_agg(
        partials, ["cohort", "weeks_since"], {"n_users": ("sum", "n_users")}
    )


@register_query(
    "q_window_late",
    oracle="""WITH p AS (
                SELECT ts,
                       make_timestamp(CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000)
                         AS window_start,
                       max(ts) OVER (ORDER BY (event_id * 2654435761) % 4294967296, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
                FROM events)
              SELECT window_start,
                     CAST(SUM(CASE WHEN wm IS NOT NULL
                                    AND wm >= window_start + INTERVAL 7 HOUR
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
                     CAST(SUM(CASE WHEN wm IS NULL
                                    OR wm < window_start + INTERVAL 7 HOUR
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime
              FROM p GROUP BY window_start""",
)
def q_window_late(sf_dir):
    """Event-time watermark / late-data split: each event carries the
    watermark at its ARRIVAL (exclusive running max of event time over
    arrival order — a deterministic Knuth-hash permutation of event_id,
    since the testdata is event-time-sorted); an event is LATE when its
    1-hour window plus 6 hours allowed lateness already closed under
    that watermark. The running max is the distributed two-phase
    prefix scan (engine.ops.order.prefix_scan_max); per-window
    late/on-time counts fold through the bucketed combiner."""
    import pandas as pd

    from engine.ops.order import SAMPLE_MOD, SAMPLE_MULT, prefix_scan_max

    ds = read_table(sf_dir, "events", columns=["event_id", "ts"])

    def _arrival(t: pa.Table) -> pa.Table:
        eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        arr = ((eid * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MOD)).astype(np.int64)
        return t.append_column("arrival", pa.array(arr, pa.int64()))

    ds = ds.map_batches(_arrival, batch_format="pyarrow")
    ds = prefix_scan_max(ds, ["arrival", "event_id"], "ts", out="wm")

    HOUR_US = 3_600_000_000

    def _classify(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].astype("int64")
        win = (ts_us // HOUR_US) * HOUR_US
        close = win + 7 * HOUR_US  # window size 1h + lateness 6h
        # NaT's int64 sentinel is INT64_MIN (< close), so notna() is the
        # only guard needed.
        late = df["wm"].notna().to_numpy() & (
            df["wm"].to_numpy().astype("int64") >= close.to_numpy()
        )
        return pd.DataFrame(
            {
                "window_start": win.astype("datetime64[us]"),
                "n_late": late.astype(np.int64),
                "n_ontime": (~late).astype(np.int64),
            }
        )

    rows = ds.map_batches(_classify, batch_format="pandas")
    return grouped_agg(
        rows, ["window_start"],
        {"n_late": ("sum", "n_late"), "n_ontime": ("sum", "n_ontime")},
    )


@register_query(
    "q_running_total",
    oracle="""SELECT o_orderkey,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          OVER (ORDER BY o_orderdate, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                       AS run_cents
              FROM orders""",
)
def q_running_total(sf_dir):
    """GLOBAL running revenue in order-date order (not partitioned — the
    analytic cumsum covers per-partition frames; this is the total-order
    scan): integer-cents values through the distributed two-phase prefix
    sum, so the result is order-exact against the SQL window."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_totalprice"])
    ds = with_columns(
        ds,
        {
            "cents": _cents("o_totalprice"),
            "date_us": lambda t: pc.cast(t.column("o_orderdate"), pa.int64()),
        },
    )
    from engine.ops.order import prefix_scan_sum

    out = prefix_scan_sum(ds, ["date_us", "o_orderkey"], "cents", out="run_cents")
    return select(out, ["o_orderkey", "run_cents"])


@register_query(
    "q_grouped_mode",
    oracle="""WITH c AS (SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS n
                         FROM lineitem GROUP BY 1, 2)
              SELECT l_returnflag, l_quantity AS mode_qty, n FROM (
                SELECT *, row_number() OVER (PARTITION BY l_returnflag
                                             ORDER BY n DESC, l_quantity) AS rk
                FROM c) WHERE rk = 1""",
)
def q_grouped_mode(sf_dir):
    """Per-group MODE with a deterministic tiebreak (smallest value wins):
    bucketed (group, value) count combiner, then the top-1 per group —
    two small exchanges, values never leave their buckets uncounted."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    counts = grouped_agg(ds, ["l_returnflag", "l_quantity"], {"n": ("count", None)})
    top = topk_per_group(
        counts, ["l_returnflag"], "n", 1, descending=True, tiebreak=["l_quantity"]
    )
    return rename_ds(top, {"l_quantity": "mode_qty"})


@register_query(
    "q_cross_join",
    oracle="""SELECT r.r_name, n.n_name, CAST(n.n_nationkey AS BIGINT) AS n_nationkey
              FROM region r CROSS JOIN nation n""",
)
def q_cross_join(sf_dir):
    """Cartesian product against a broadcast dimension (parameter-grid /
    enumeration shape): the small side ships once, each batch tiles
    itself with Arrow take index math — no shuffle."""
    from engine.ops.join import cross_join

    nat = table(sf_dir, "nation", columns=["n_name", "n_nationkey"])
    reg = read_table(sf_dir, "region", columns=["r_name"])
    out = cross_join(reg, nat)
    return with_columns(
        out, {"n_nationkey": lambda t: pc.cast(t.column("n_nationkey"), pa.int64())}
    )


@register_query(
    "q_grouped_mad",
    oracle="""WITH m AS (SELECT l_returnflag, median(l_extendedprice) AS med
                         FROM lineitem GROUP BY 1)
              SELECT l.l_returnflag,
                     round(median(abs(l.l_extendedprice - m.med)), 6) AS mad
              FROM lineitem l JOIN m USING (l_returnflag) GROUP BY 1""",
)
def q_grouped_mad(sf_dir):
    """Median absolute deviation per group (the robust spread statistic):
    grouped exact median → broadcast the tiny per-group medians back over
    the fact table → grouped median of |x - med|. The classic
    aggregate → join-back → re-aggregate composite; the fact table
    streams twice, never materializes."""
    from engine.ops.agg import grouped_quantile
    from engine.ops.join import auto_join

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    med = grouped_quantile(ds, ["l_returnflag"], "l_extendedprice", 0.5, out="med")
    j = auto_join(ds, med, key="l_returnflag", join_type="inner")
    dev = with_columns(
        j,
        {
            "adev": lambda t: pc.abs(
                pc.subtract(t.column("l_extendedprice"), t.column("med"))
            )
        },
    )
    mad = grouped_quantile(
        select(dev, ["l_returnflag", "adev"]), ["l_returnflag"], "adev", 0.5, out="mad_raw"
    )
    return with_columns(
        select(
            rename_ds(mad, {"mad_raw": "mad"}), ["l_returnflag", "mad"]
        ),
        {"mad": lambda t: pc.round(t.column("mad"), ndigits=6, round_mode="half_towards_infinity")},
    )


# ---- declarative job spec (SURVEY.md §2.10) --------------------------------

# Data, not code: this JSON-serializable dict is what a config-driven
# deployment would ship; engine.spec.lower() validates and compiles it
# onto the Pipeline/Step API, wide steps landing on the engine's
# bucketed-combiner operators.
SPEC_REVENUE_BY_FLAG = {
    "source": {
        "table": "lineitem",
        "columns": ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
    },
    "steps": [
        {"op": "filter", "column": "l_quantity", "cmp": ">", "value": 10},
        {
            "op": "with_column",
            "name": "revenue_cents",
            "expr": {
                "cents": {
                    "mul": [
                        {"col": "l_extendedprice"},
                        {"sub": [{"lit": 1.0}, {"col": "l_discount"}]},
                    ]
                }
            },
        },
        {"op": "select", "columns": ["l_returnflag", "revenue_cents"]},
        {"op": "grouped_sum", "keys": ["l_returnflag"], "cols": ["revenue_cents"]},
    ],
}


@register_query(
    "q_spec_pipeline",
    oracle="""SELECT l_returnflag,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
              FROM lineitem WHERE l_quantity > 10
              GROUP BY l_returnflag""",
)
def q_spec_pipeline(sf_dir):
    """A query expressed entirely as a DECLARATIVE spec (no hand-written
    pipeline code): engine.spec.run_spec lowers the dict above onto
    Pipeline/Step and runs it — filter and projection are pure-Arrow
    batch steps, the group-sum is the partial combiner."""
    from engine.spec import run_spec

    return run_spec(SPEC_REVENUE_BY_FLAG, sf_dir)


SPEC_CUSTOMER_ORDER_RANK = {
    "source": {"table": "orders",
               "columns": ["o_custkey", "o_orderkey", "o_totalprice"]},
    "steps": [
        {"op": "with_column", "name": "cents",
         "expr": {"cents": {"col": "o_totalprice"}}},
        {"op": "select", "columns": ["o_custkey", "o_orderkey", "cents"]},
        {"op": "window", "partition_by": ["o_custkey"],
         "order_by": ["cents", "o_orderkey"], "descending": True,
         "functions": {"rnk": ["row_number"],
                       "run_cents": ["cumsum", "cents"]}},
        {"op": "filter", "column": "rnk", "cmp": "<=", "value": 3},
    ],
}


@register_query(
    "q_spec_window",
    oracle="""SELECT o_custkey, o_orderkey, cents, rnk, run_cents FROM (
                SELECT o_custkey, o_orderkey,
                       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
                       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                            PARTITION BY o_custkey
                            ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                                     o_orderkey DESC
                            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey
                             ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
                                      o_orderkey DESC))
              WHERE rnk <= 3""",
)
def q_spec_window(sf_dir):
    """Analytic windows from a DECLARATIVE spec: the 'window' step lowers
    onto the bucketed window exchange (top-3 orders per customer with a
    running total, then a spec-level filter on the rank)."""
    from engine.spec import run_spec

    return run_spec(SPEC_CUSTOMER_ORDER_RANK, sf_dir)


# ---- round-4 TPC-H widening -------------------------------------------------


@register_query(
    "q_tpch_q7",
    oracle="""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
              FROM supplier, lineitem, orders, customer, nation n1, nation n2
              WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
                AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
                AND c_nationkey = n2.n_nationkey
                AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
                     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
                AND l_shipdate >= TIMESTAMP '1995-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
              GROUP BY supp_nation, cust_nation, l_year""",
)
def q_tpch_q7(sf_dir):
    """TPC-H Q7 shape (volume shipping between a nation pair, by year).
    Both sides pre-prune to the pair's nation keys via broadcast semi
    filters; customer/supplier go through auto_join's size gate; the one
    unconditional large exchange is lineitem ⋈ orders. With both nation
    keys restricted to the pair, the cross-nation disjunction reduces to
    s_nationkey != c_nationkey — filtered per batch."""
    import datetime

    import pyarrow.dataset as pads

    from engine.ops.join import auto_join

    nat = table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    pair = nat.filter(
        pc.is_in(nat.column("n_name"), value_set=pa.array(["NATION_3", "NATION_7"]))
    )
    pair_keys = pair.select(["n_nationkey"])

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    supp = semi_join(supp, pair_keys.rename_columns(["s_nationkey"]), "s_nationkey")
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    cust = semi_join(cust, pair_keys.rename_columns(["c_nationkey"]), "c_nationkey")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    orders = auto_join(orders, rename_ds(cust, {"c_custkey": "o_custkey"}), key="o_custkey")
    orders = rename_ds(
        select(orders, ["o_orderkey", "c_nationkey"]), {"o_orderkey": "l_orderkey"}
    )

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter_expr=(pads.field("l_shipdate") >= datetime.datetime(1995, 1, 1))
        & (pads.field("l_shipdate") < datetime.datetime(1997, 1, 1)),
    )
    j = auto_join(li, orders, key="l_orderkey")
    j = auto_join(j, rename_ds(supp, {"s_suppkey": "l_suppkey"}), key="l_suppkey")
    j = filter_expr(
        j, lambda t: pc.not_equal(t.column("s_nationkey"), t.column("c_nationkey"))
    )
    j = broadcast_join(
        j, pair.rename_columns(["n_nationkey", "supp_nation"]),
        keys=["s_nationkey"], right_keys=["n_nationkey"],
    )
    j = broadcast_join(
        j, pair.rename_columns(["n_nationkey", "cust_nation"]),
        keys=["c_nationkey"], right_keys=["n_nationkey"],
    )

    def _proj(t: pa.Table) -> pa.Table:
        rev = pc.cast(
            _round_away(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(1.0, pc.cast(t.column("l_discount"), pa.float64())),
                    ),
                    100.0,
                )
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "supp_nation": t.column("supp_nation"),
                "cust_nation": t.column("cust_nation"),
                "l_year": pc.cast(pc.year(t.column("l_shipdate")), pa.int64()),
                "revenue_cents": rev,
            }
        )

    out = j.map_batches(_proj, batch_format="pyarrow")
    return partial_grouped_sum(
        out, ["supp_nation", "cust_nation", "l_year"], ["revenue_cents"]
    )


@register_query(
    "q_tpch_q16",
    oracle="""SELECT p_brand, p_type, p_size,
                     CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
              FROM part, lineitem
              WHERE p_partkey = l_partkey
                AND p_brand <> 'Brand#12'
                AND p_size IN (1, 2, 3, 4, 5)
                AND l_suppkey NOT IN
                    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
              GROUP BY p_brand, p_type, p_size""",
)
def q_tpch_q16(sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): NOT IN through the
    size-gated anti join, pushed-down part predicate, gated part join,
    then grouped COUNT DISTINCT as distinct-over-(keys+suppkey) →
    bucketed grouped count — no per-key groups anywhere."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_join, auto_semi_join

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    bad_supp = read_table(
        sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"],
        filter_expr=pads.field("s_acctbal") < 0.0,
    )
    li = auto_semi_join(li, bad_supp, "l_suppkey", right_key="s_suppkey", anti=True)

    part = read_table(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter_expr=(pads.field("p_brand") != "Brand#12")
        & (pads.field("p_size").isin([1, 2, 3, 4, 5])),
    )
    j = auto_join(li, rename_ds(part, {"p_partkey": "l_partkey"}), key="l_partkey")
    uniq = distinct(
        select(j, ["p_brand", "p_type", "p_size", "l_suppkey"]),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
    )
    return grouped_agg(
        uniq, ["p_brand", "p_type", "p_size"], {"supplier_cnt": ("count", None)}
    )


@register_query(
    "q_tpch_q19",
    oracle="""SELECT CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem, part
              WHERE p_partkey = l_partkey AND
                    ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                      AND l_quantity BETWEEN 1 AND 11)
                  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                      AND l_quantity BETWEEN 10 AND 20)
                  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                      AND l_quantity BETWEEN 20 AND 30))""",
)
def q_tpch_q19(sf_dir):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    part side pre-filters to the UNION of the three brand/size arms at
    the read (row groups outside every arm never leave storage), joins
    through the size gate, and the full disjunction — which needs both
    sides' columns — filters per batch with Arrow kernels; one-pass
    global sum+count."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_join

    arms = [
        ("Brand#12", 5, 1.0, 11.0),
        ("Brand#23", 10, 10.0, 20.0),
        ("Brand#34", 15, 20.0, 30.0),
    ]
    part_pred = None
    for brand, max_size, _, _ in arms:
        p = (pads.field("p_brand") == brand) & (pads.field("p_size") >= 1) & (
            pads.field("p_size") <= max_size
        )
        part_pred = p if part_pred is None else (part_pred | p)
    part = read_table(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"],
        filter_expr=part_pred,
    )
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    j = auto_join(li, rename_ds(part, {"p_partkey": "l_partkey"}), key="l_partkey")

    def _arm_filter(t: pa.Table) -> pa.Table:
        mask = None
        for brand, max_size, qlo, qhi in arms:
            m = pc.and_(
                pc.and_(
                    pc.equal(t.column("p_brand"), brand),
                    pc.and_(
                        pc.greater_equal(t.column("p_size"), 1),
                        pc.less_equal(t.column("p_size"), max_size),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(t.column("l_quantity"), qlo),
                    pc.less_equal(t.column("l_quantity"), qhi),
                ),
            )
            mask = m if mask is None else pc.or_(mask, m)
        t = t.filter(mask)
        rev = pc.cast(
            _round_away(
                pc.multiply(
                    pc.multiply(
                        pc.cast(t.column("l_extendedprice"), pa.float64()),
                        pc.subtract(1.0, pc.cast(t.column("l_discount"), pa.float64())),
                    ),
                    100.0,
                )
            ),
            pa.int64(),
        )
        return pa.table({"revenue_cents": rev})

    out = j.map_batches(_arm_filter, batch_format="pyarrow")
    return global_agg(
        out, {"revenue_cents": ("sum", "revenue_cents"), "n": ("count", None)}
    )


SPEC_REVENUE_BY_PRIORITY = {
    "source": {
        "table": "lineitem",
        "columns": ["l_orderkey", "l_extendedprice", "l_discount"],
    },
    "steps": [
        {
            "op": "with_column",
            "name": "revenue_cents",
            "expr": {
                "cents": {
                    "mul": [
                        {"col": "l_extendedprice"},
                        {"sub": [{"lit": 1.0}, {"col": "l_discount"}]},
                    ]
                }
            },
        },
        {"op": "select", "columns": ["l_orderkey", "revenue_cents"]},
        {
            "op": "join",
            "table": "orders",
            "columns": ["o_orderkey", "o_orderpriority"],
            "key": "l_orderkey",
            "right_key": "o_orderkey",
        },
        {"op": "select", "columns": ["o_orderpriority", "revenue_cents"]},
        {"op": "grouped_sum", "keys": ["o_orderpriority"], "cols": ["revenue_cents"]},
    ],
}


@register_query(
    "q_spec_join",
    oracle="""SELECT o_orderpriority,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderpriority""",
)
def q_spec_join(sf_dir):
    """A two-table pipeline expressed entirely as a declarative spec: the
    'join' step reads its right side pruned and routes through
    auto_join's size gate (broadcast here, bucketed shuffle at scale)."""
    from engine.spec import run_spec

    return run_spec(SPEC_REVENUE_BY_PRIORITY, sf_dir)


@register_query(
    "q_tpch_q13",
    oracle="""SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
                SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
                FROM customer LEFT JOIN orders
                  ON c_custkey = o_custkey AND o_orderstatus <> 'F'
                GROUP BY c_custkey)
              GROUP BY c_count""",
)
def q_tpch_q13(sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): count orders
    per customer with the partial combiner FIRST (the join input is one
    row per customer, never per order), LEFT-join through the size gate
    so no-order customers survive as count 0, then a second tiny grouped
    count over the distribution."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_join

    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderstatus"],
        filter_expr=pads.field("o_orderstatus") != "F",
    )
    counts = grouped_agg(
        select(orders, ["o_custkey"]), ["o_custkey"], {"c_count": ("count", None)}
    )
    cust = rename_ds(
        read_table(sf_dir, "customer", columns=["c_custkey"]),
        {"c_custkey": "o_custkey"},
    )
    j = auto_join(cust, counts, key="o_custkey", join_type="left")

    def _fill(t: pa.Table) -> pa.Table:
        c = pc.fill_null(pc.cast(t.column("c_count"), pa.int64()), 0)
        return pa.table({"c_count": c})

    dist = j.map_batches(_fill, batch_format="pyarrow")
    return grouped_agg(dist, ["c_count"], {"custdist": ("count", None)})


@register_query(
    "q_tpch_q15",
    oracle="""WITH rev AS (SELECT l_suppkey,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS total_rev
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                     AND l_shipdate < TIMESTAMP '1996-04-01'
                   GROUP BY l_suppkey)
              SELECT s_suppkey, s_name, total_rev
              FROM supplier JOIN rev ON s_suppkey = l_suppkey
              WHERE total_rev = (SELECT MAX(total_rev) FROM rev)""",
)
def q_tpch_q15(sf_dir):
    """TPC-H Q15 shape (top supplier): quarter-windowed integer-cents
    revenue per supplier via the partial combiner, global MAX over the
    (supplier-sized) revenue set, equality filter against the broadcast
    scalar, names joined broadcast. Ties are kept, like the SQL."""
    import datetime

    import pyarrow.dataset as pads

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter_expr=(pads.field("l_shipdate") >= datetime.datetime(1996, 1, 1))
        & (pads.field("l_shipdate") < datetime.datetime(1996, 4, 1)),
    )
    li = with_columns(
        li,
        {
            "total_rev": lambda t: pc.cast(
                _round_away(
                    pc.multiply(
                        pc.multiply(
                            pc.cast(t.column("l_extendedprice"), pa.float64()),
                            pc.subtract(1.0, pc.cast(t.column("l_discount"), pa.float64())),
                        ),
                        100.0,
                    )
                ),
                pa.int64(),
            )
        },
    )
    rev = partial_grouped_sum(
        select(li, ["l_suppkey", "total_rev"]), ["l_suppkey"], ["total_rev"]
    ).materialize()
    best = global_agg(rev, {"mx": ("max", "total_rev")}).column("mx")[0].as_py()
    top = filter_expr(rev, lambda t: pc.equal(t.column("total_rev"), best))
    supp = table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    out = broadcast_join(top, supp, keys=["l_suppkey"], right_keys=["s_suppkey"])
    return rename_ds(
        select(out, ["l_suppkey", "s_name", "total_rev"]), {"l_suppkey": "s_suppkey"}
    )


@register_query(
    "q_tpch_q17",
    oracle="""WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
                   li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
                                 l_extendedprice
                          FROM lineitem JOIN pk ON p_partkey = l_partkey),
                   s AS (SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS qty_sum,
                                CAST(COUNT(*) AS BIGINT) AS cnt
                         FROM li GROUP BY l_partkey)
              SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                       AS revenue_cents,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM li JOIN s USING (l_partkey)
              WHERE 2 * q * cnt < qty_sum""",
)
def q_tpch_q17(sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    'below half the part's average quantity' predicate, made
    integer-exact on BOTH sides — q < 0.5 * (sum/cnt) is evaluated as
    2*q*cnt < sum over int64, so no float-average tie can diverge from
    the oracle. Aggregate → join-back → filter (the MAD pattern): the
    brand's lineitems stream twice, never materialize."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_join, auto_semi_join

    part = read_table(
        sf_dir, "part", columns=["p_partkey", "p_brand"],
        filter_expr=pads.field("p_brand") == "Brand#23",
    )
    li = read_table(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )
    li = auto_semi_join(li, part, "l_partkey", right_key="p_partkey")
    li = with_columns(
        li, {"q": lambda t: pc.cast(t.column("l_quantity"), pa.int64())}
    )
    li = select(li, ["l_partkey", "q", "l_extendedprice"])
    stats = grouped_agg(
        select(li, ["l_partkey", "q"]), ["l_partkey"],
        {"qty_sum": ("sum", "q"), "cnt": ("count", None)},
    )
    j = auto_join(li, stats, key="l_partkey", join_type="inner")
    j = filter_expr(
        j,
        lambda t: pc.less(
            pc.multiply(pc.multiply(t.column("q"), 2), pc.cast(t.column("cnt"), pa.int64())),
            pc.cast(t.column("qty_sum"), pa.int64()),
        ),
    )
    j = with_columns(
        j,
        {
            "revenue_cents": lambda t: pc.cast(
                _round_away(pc.multiply(pc.cast(t.column("l_extendedprice"), pa.float64()), 100.0)),
                pa.int64(),
            )
        },
    )
    return global_agg(
        j, {"revenue_cents": ("sum", "revenue_cents"), "n": ("count", None)}
    )


@register_query(
    "q_tpch_q22",
    oracle="""WITH pos AS (SELECT c_custkey,
                                  CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
                           FROM customer WHERE c_acctbal > 0.0),
                   s AS (SELECT CAST(SUM(bal_cents) AS BIGINT) AS tot,
                                CAST(COUNT(*) AS BIGINT) AS n FROM pos)
              SELECT CAST(COUNT(*) AS BIGINT) AS numcust,
                     CAST(COALESCE(SUM(bal_cents), 0) AS BIGINT) AS totacctbal_cents
              FROM pos, s
              WHERE bal_cents * n > tot
                AND c_custkey NOT IN
                    (SELECT o_custkey FROM orders WHERE o_totalprice > 350000)""",
)
def q_tpch_q22(sf_dir):
    """TPC-H Q22 shape (global sales opportunity): customers with an
    above-average positive balance and no HIGH-VALUE orders. The 'above average'
    comparison is integer-exact on both sides (bal*n > sum over int64
    cents — no float-average tie risk); the NOT EXISTS is the size-gated
    anti join."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_semi_join

    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_acctbal"],
        filter_expr=pads.field("c_acctbal") > 0.0,
    )
    cust = with_columns(
        cust,
        {
            "bal_cents": lambda t: pc.cast(
                _round_away(pc.multiply(pc.cast(t.column("c_acctbal"), pa.float64()), 100.0)),
                pa.int64(),
            )
        },
    )
    cust = select(cust, ["c_custkey", "bal_cents"]).materialize()
    s = global_agg(cust, {"tot": ("sum", "bal_cents"), "n": ("count", None)})
    tot, n = s.column("tot")[0].as_py(), s.column("n")[0].as_py()
    rich = filter_expr(
        cust, lambda t: pc.greater(pc.multiply(t.column("bal_cents"), n), tot)
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
        filter_expr=pads.field("o_totalprice") > 350000.0,
    )
    lonely = auto_semi_join(rich, orders, "c_custkey", right_key="o_custkey", anti=True)
    out = global_agg(
        lonely, {"numcust": ("count", None), "totacctbal_cents": ("sum", "bal_cents")}
    )
    # SUM over zero rows is NULL in SQL; mirror COALESCE(...,0) so the
    # value hash stays stable even if a scale factor empties the result.
    return pa.table(
        {
            "numcust": out.column("numcust"),
            "totacctbal_cents": pc.fill_null(
                pc.cast(out.column("totacctbal_cents"), pa.int64()), 0
            ),
        }
    )


@register_query(
    "q_join_interval",
    oracle="""WITH l AS (SELECT event_id AS l_id, ts AS l_s,
                                ts + (event_id % 120) * INTERVAL 1 MINUTE AS l_e
                         FROM events WHERE event_type = 'purchase'),
                   r AS (SELECT event_id AS r_id, ts AS r_s,
                                ts + (event_id % 120) * INTERVAL 1 MINUTE AS r_e
                         FROM events WHERE event_type = 'click')
              SELECT l_id, r_id FROM l, r
              WHERE l_s <= r_e AND r_s <= l_e""",
)
def q_join_interval(sf_dir):
    """KEYLESS interval OVERLAP join: purchase and click activity windows
    (variable per-event length up to 2 h) that intersect. Time-bin
    co-partitioned with exactly-once pair emission in the overlap-start
    bin — no equi-key, no all-pairs, bounded replication."""
    import pyarrow.dataset as pads

    from engine.ops.join import interval_join

    def _side(ev_type, id_name, s_name, e_name):
        ds = read_table(
            sf_dir, "events", columns=["event_id", "ts", "event_type"],
            filter_expr=pads.field("event_type") == ev_type,
        )

        def _win(t: pa.Table) -> pa.Table:
            ts = t.column("ts").cast(pa.int64())
            length = pc.multiply(
                pc.cast(pc.subtract(t.column("event_id"), pc.multiply(pc.divide(t.column("event_id"), 120), 120)), pa.int64()),
                60_000_000,
            )
            return pa.table(
                {
                    id_name: t.column("event_id"),
                    s_name: ts,
                    e_name: pc.add(ts, length),
                }
            )

        return ds.map_batches(_win, batch_format="pyarrow")

    l = _side("purchase", "l_id", "l_s", "l_e")
    r = _side("click", "r_id", "r_s", "r_e")
    out = interval_join(
        l, r, "l_s", "l_e", "r_s", "r_e", max_len_us=120 * 60_000_000
    )
    return select(out, ["l_id", "r_id"])


@register_query(
    "q_validate",
    oracle="""SELECT 'not_null:l_orderkey' AS rule,
                     CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                       AS violations FROM lineitem
              UNION ALL
              SELECT 'in_range:l_discount',
                     CAST(SUM(CASE WHEN l_discount IS NOT NULL
                              AND NOT (l_discount >= 0.0 AND l_discount <= 0.05)
                              THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
              UNION ALL
              SELECT 'accepted_values:l_returnflag',
                     CAST(SUM(CASE WHEN l_returnflag IS NOT NULL
                              AND l_returnflag NOT IN ('A', 'N')
                              THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
              UNION ALL
              SELECT 'matches:l_linestatus',
                     CAST(SUM(CASE WHEN l_linestatus IS NOT NULL
                              AND NOT regexp_matches(l_linestatus, '^O')
                              THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
              UNION ALL
              SELECT 'unique:l_orderkey',
                     CAST(COUNT(*) - COUNT(DISTINCT l_orderkey) AS BIGINT)
              FROM lineitem""",
)
def q_validate(sf_dir):
    """Declarative data-quality gate (engine/ops/validate.py): five rule
    kinds evaluated in one streaming pass (plus a distinct pass for the
    set-level uniqueness rule), violation counts mirrored rule-by-rule
    in SQL."""
    from engine.ops.validate import validate

    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_discount", "l_returnflag", "l_linestatus"],
    )
    rules = [
        {"rule": "not_null", "column": "l_orderkey"},
        {"rule": "in_range", "column": "l_discount", "min": 0.0, "max": 0.05},
        {"rule": "accepted_values", "column": "l_returnflag", "values": ["A", "N"]},
        {"rule": "matches", "column": "l_linestatus", "pattern": "^O"},
        {"rule": "unique", "column": "l_orderkey"},
    ]
    return validate(ds, rules)


# ---- TPC-H shapes round 4 (Q2/Q8/Q9/Q11/Q20/Q21 adapted to the testdata
# columns: no partsupp table and no commit/receipt dates, so each query keeps
# its canonical PLAN SHAPE — correlated argmin, market share, profit rollup,
# global-fraction HAVING, semi-join chain, double-correlated EXISTS — over the
# columns that exist) -------------------------------------------------------


def _region_nation_keys(sf_dir: str, region_name: str) -> list[int]:
    """Nation keys of one region, from the two tiny dimension tables
    (25 + 5 rows — driver-side by design; pushed into scans as isin)."""
    nat = table(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    reg = table(sf_dir, "region", columns=["r_regionkey", "r_name"])
    rk = reg.filter(pc.equal(reg.column("r_name"), region_name)).column("r_regionkey")[0].as_py()
    return nat.filter(pc.equal(nat.column("n_regionkey"), rk)).column("n_nationkey").to_pylist()


def _revenue_cents(t: pa.Table) -> pa.Array:
    return pc.cast(
        _round_away(
            pc.multiply(
                pc.multiply(
                    pc.cast(t.column("l_extendedprice"), pa.float64()),
                    pc.subtract(1.0, pc.cast(t.column("l_discount"), pa.float64())),
                ),
                100.0,
            )
        ),
        pa.int64(),
    )


@register_query(
    "q_tpch_q8",
    oracle="""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     CAST(SUM(CASE WHEN s_nationkey = 3
                              THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                              ELSE 0 END) AS BIGINT) AS nation_cents,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents
              FROM part, lineitem, orders, customer, nation, region, supplier
              WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
                AND o_custkey = c_custkey AND c_nationkey = n_nationkey
                AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
                AND s_suppkey = l_suppkey AND p_type = 'PROMO'
                AND o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY o_year""",
)
def q_tpch_q8(sf_dir):
    """TPC-H Q8 shape (national market share): PROMO parts semi-filter
    lineitem; orders pre-pruned by the pushed date window and semi-joined
    to EUROPE customers before the one fact exchange; supplier nationkey
    arrives through the size gate; numerator/denominator are integer
    cents summed in one combiner pass (the share itself is
    numerator/denominator — a driver-side division the oracle avoids by
    checking both sums)."""
    import datetime

    import pyarrow.dataset as pads

    from engine.ops.join import auto_join, auto_semi_join

    part_promo = read_table(
        sf_dir, "part", columns=["p_partkey"], filter_expr=pads.field("p_type") == "PROMO"
    )
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = auto_semi_join(li, part_promo, "l_partkey", right_key="p_partkey")

    eur_keys = _region_nation_keys(sf_dir, "EUROPE")
    cust = read_table(
        sf_dir, "customer", columns=["c_custkey"],
        filter_expr=pads.field("c_nationkey").isin(eur_keys),
    )
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter_expr=(pads.field("o_orderdate") >= datetime.datetime(1995, 1, 1))
        & (pads.field("o_orderdate") < datetime.datetime(1997, 1, 1)),
    )
    orders = auto_semi_join(orders, cust, "o_custkey", right_key="c_custkey")

    def _oproj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        )

    orders = orders.map_batches(_oproj, batch_format="pyarrow")
    j = auto_join(li, orders, key="l_orderkey")

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    j = auto_join(j, rename_ds(supp, {"s_suppkey": "l_suppkey"}), key="l_suppkey")

    def _proj(t: pa.Table) -> pa.Table:
        rev = _revenue_cents(t)
        is_nat = pc.cast(pc.equal(t.column("s_nationkey"), 3), pa.int64())
        return pa.table(
            {
                "o_year": t.column("o_year"),
                "nation_cents": pc.multiply(rev, is_nat),
                "total_cents": rev,
            }
        )

    out = j.map_batches(_proj, batch_format="pyarrow")
    return partial_grouped_sum(out, ["o_year"], ["nation_cents", "total_cents"])


@register_query(
    "q_tpch_q9",
    oracle="""SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                     CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
                       AS sum_profit_cents
              FROM part, supplier, lineitem, orders, nation
              WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
                AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
                AND p_name LIKE 'red %'
              GROUP BY n_name, o_year""",
)
def q_tpch_q9(sf_dir):
    """TPC-H Q9 shape (product-type profit by supplier nation and year;
    the testdata has no partsupp/supplycost, so profit = discounted
    revenue — same plan: name-filtered parts semi-prune the fact, the
    unfiltered orders join is the one big exchange behind the size gate,
    nation names broadcast last)."""
    from engine.ops.join import auto_join, auto_semi_join

    part_red = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    part_red = select(
        filter_expr(part_red, lambda t: pc.starts_with(t.column("p_name"), "red ")),
        ["p_partkey"],
    )
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = auto_semi_join(li, part_red, "l_partkey", right_key="p_partkey")

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    li = auto_join(li, rename_ds(supp, {"s_suppkey": "l_suppkey"}), key="l_suppkey")

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def _oproj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t.column("o_orderkey"),
                "o_year": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        )

    orders = orders.map_batches(_oproj, batch_format="pyarrow")
    j = auto_join(li, orders, key="l_orderkey")

    nat = table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    j = broadcast_join(
        j, nat.rename_columns(["s_nationkey", "n_name"]), keys=["s_nationkey"]
    )

    def _proj(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_name": t.column("n_name"),
                "o_year": t.column("o_year"),
                "sum_profit_cents": _revenue_cents(t),
            }
        )

    out = j.map_batches(_proj, batch_format="pyarrow")
    return partial_grouped_sum(out, ["n_name", "o_year"], ["sum_profit_cents"])


@register_query(
    "q_tpch_q2",
    oracle="""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
                   s AS (SELECT s_suppkey, s_name,
                                CAST(ROUND(s_acctbal * 100) AS BIGINT) AS s_acctbal_cents,
                                n_name
                         FROM supplier, nation, region
                         WHERE s_nationkey = n_nationkey
                           AND n_regionkey = r_regionkey AND r_name = 'ASIA')
              SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal_cents, n_name
              FROM part, ps, s
              WHERE p_partkey = ps.l_partkey AND ps.l_suppkey = s.s_suppkey
                AND p_size = 15
              QUALIFY ROW_NUMBER() OVER (PARTITION BY p_partkey
                                         ORDER BY s_acctbal_cents, s_suppkey) = 1""",
)
def q_tpch_q2(sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part; no partsupp table, so
    the part↔supplier relation is the DISTINCT (l_partkey, l_suppkey)
    pairs and "cost" is the supplier's account balance): the correlated
    MIN subquery lowers onto topk_per_group(k=1, ascending) with an
    explicit suppkey tiebreak — one bucketed exchange, never per-key
    groups; region-filtered supplier info and the size-15 part names ride
    the size gate."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_join, auto_semi_join

    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    pairs = distinct(li, ["l_partkey", "l_suppkey"])

    part15 = read_table(
        sf_dir, "part", columns=["p_partkey", "p_name"],
        filter_expr=pads.field("p_size") == 15,
    )
    pairs = auto_semi_join(pairs, part15, "l_partkey", right_key="p_partkey")

    asia_keys = _region_nation_keys(sf_dir, "ASIA")
    supp = read_table(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
        filter_expr=pads.field("s_nationkey").isin(asia_keys),
    )
    supp = with_columns(supp, {"s_acctbal_cents": _cents("s_acctbal")})
    nat = table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    supp = broadcast_join(
        supp, nat.rename_columns(["s_nationkey", "n_name"]), keys=["s_nationkey"]
    )
    supp = select(supp, ["s_suppkey", "s_name", "s_acctbal_cents", "n_name"])

    j = auto_join(pairs, rename_ds(supp, {"s_suppkey": "l_suppkey"}), key="l_suppkey")
    best = topk_per_group(
        j, ["l_partkey"], "s_acctbal_cents", k=1, descending=False, tiebreak=["l_suppkey"]
    )
    best = auto_join(best, rename_ds(part15, {"p_partkey": "l_partkey"}), key="l_partkey")
    best = rename_ds(best, {"l_partkey": "p_partkey", "l_suppkey": "s_suppkey"})
    return select(
        best, ["p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal_cents", "n_name"]
    )


@register_query(
    "q_tpch_q11",
    oracle="""WITH v AS (SELECT l_partkey,
                                CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                                  AS value_cents
                         FROM lineitem, supplier, nation, region
                         WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
                           AND n_regionkey = r_regionkey AND r_name = 'ASIA'
                         GROUP BY l_partkey)
              SELECT l_partkey, value_cents FROM v
              WHERE value_cents * 1000 > (SELECT SUM(value_cents) FROM v)""",
)
def q_tpch_q11(sf_dir):
    """TPC-H Q11 shape (important stock: parts whose value exceeds a
    fraction of the GLOBAL total): per-part combiner sum, one tree-reduce
    for the total, then an integer-exact correlated HAVING
    (value*1000 > total — no float fraction, so no fp-tie divergence
    from the oracle). The per-part table is materialized once and
    consumed twice (total + filter) without a driver pull."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_semi_join

    asia_keys = _region_nation_keys(sf_dir, "ASIA")
    supp = read_table(
        sf_dir, "supplier", columns=["s_suppkey"],
        filter_expr=pads.field("s_nationkey").isin(asia_keys),
    )
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    li = auto_semi_join(li, supp, "l_suppkey", right_key="s_suppkey")
    li = with_columns(li, {"value_cents": _cents("l_extendedprice")})
    v = partial_grouped_sum(
        select(li, ["l_partkey", "value_cents"]), ["l_partkey"], ["value_cents"]
    ).materialize()
    total = global_agg(v, {"total_cents": ("sum", "value_cents")}).column("total_cents")[0].as_py()
    out = filter_expr(
        v, lambda t: pc.greater(pc.multiply(t.column("value_cents"), 1000), total)
    )
    # The >0.1%-share filter can legitimately match NOTHING (it does at
    # sf0.1), and an empty Ray Dataset loses its schema through
    # to_pandas — return a typed Arrow table (bounded: it's the
    # important-parts report) so the empty result keeps its columns.
    from engine.util.collect import pull_arrow

    tbl = pull_arrow(out)
    if tbl is None:
        return pa.table(
            {"l_partkey": pa.array([], pa.int64()), "value_cents": pa.array([], pa.int64())}
        )
    return tbl.select(["l_partkey", "value_cents"])


@register_query(
    "q_tpch_q20",
    oracle="""SELECT s_suppkey, s_name
              FROM supplier, nation, region
              WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
                AND r_name = 'AFRICA'
                AND s_suppkey IN
                    (SELECT l_suppkey FROM lineitem
                     WHERE l_partkey IN
                           (SELECT p_partkey FROM part WHERE p_name LIKE 'red %')
                     GROUP BY l_suppkey
                     HAVING SUM(CAST(l_quantity AS BIGINT)) > 2000)""",
)
def q_tpch_q20(sf_dir):
    """TPC-H Q20 shape (suppliers with excess stock of a named part
    family, region-scoped): a pure semi-join CHAIN — name-filtered parts
    semi-prune lineitem, a per-supplier combiner sum applies the HAVING,
    and the surviving key set semi-joins the region-filtered supplier
    table. No wide rows ever cross an exchange."""
    import pyarrow.dataset as pads

    from engine.ops.join import auto_semi_join

    part_red = read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    part_red = select(
        filter_expr(part_red, lambda t: pc.starts_with(t.column("p_name"), "red ")),
        ["p_partkey"],
    )
    li = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_quantity"])
    li = auto_semi_join(li, part_red, "l_partkey", right_key="p_partkey")
    li = with_columns(li, {"qty": lambda t: pc.cast(t.column("l_quantity"), pa.int64())})
    q = partial_grouped_sum(select(li, ["l_suppkey", "qty"]), ["l_suppkey"], ["qty"])
    q = filter_expr(q, lambda t: pc.greater(t.column("qty"), 2000))

    afr_keys = _region_nation_keys(sf_dir, "AFRICA")
    supp = read_table(
        sf_dir, "supplier", columns=["s_suppkey", "s_name"],
        filter_expr=pads.field("s_nationkey").isin(afr_keys),
    )
    return auto_semi_join(supp, q, "s_suppkey", right_key="l_suppkey")


@register_query(
    "q_tpch_q21",
    oracle="""WITH per AS (SELECT l_orderkey, l_suppkey,
                                  MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
                           FROM lineitem GROUP BY l_orderkey, l_suppkey),
                   ord AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(failed) AS n_failed
                           FROM per GROUP BY l_orderkey)
              SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
              FROM per
              JOIN ord USING (l_orderkey)
              JOIN orders ON o_orderkey = per.l_orderkey AND o_orderstatus = 'F'
              JOIN supplier ON s_suppkey = per.l_suppkey
              WHERE per.failed = 1 AND ord.n_supp > 1 AND ord.n_failed = 1
              GROUP BY s_name
              ORDER BY numwait DESC, s_name
              LIMIT 20""",
)
def q_tpch_q21(sf_dir):
    """TPC-H Q21 shape (suppliers who alone held up multi-supplier
    orders; no receipt/commit dates in the testdata, so "late" is the
    R return flag): the double-correlated EXISTS / NOT EXISTS lowers onto
    ONE order-keyed bucketed exchange — the F-status semi filter runs
    BEFORE it (per-order predicate, so it commutes; cuts the exchange
    volume ~3x), a per-batch combiner pre-reduces to distinct
    (order, supplier, flag) rows, and inside the bucket the
    per-(order,supplier) max, the per-order supplier/failed counts, the
    sole-failer filter and the culprit emission all happen in one
    vectorized pandas pass (the naive two-aggregations-plus-join-back
    plan measured 3-4x slower at sf0.1)."""
    import pandas as pd
    import pyarrow.dataset as pads

    from engine.ops.bucket import bucketed_map_groups
    from engine.ops.join import auto_join, auto_semi_join

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_returnflag"])
    f_orders = read_table(
        sf_dir, "orders", columns=["o_orderkey"],
        filter_expr=pads.field("o_orderstatus") == "F",
    )
    li = auto_semi_join(li, f_orders, "l_orderkey", right_key="o_orderkey")
    li = with_columns(
        li,
        {"failed": lambda t: pc.cast(pc.equal(t.column("l_returnflag"), "R"), pa.int64())},
    )
    li = select(li, ["l_orderkey", "l_suppkey", "failed"])

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["l_orderkey", "l_suppkey"], sort=False)["failed"]
            .max()
            .reset_index()
        )

    def _culprits(df: pd.DataFrame) -> pd.DataFrame:
        per = (
            df.groupby(["l_orderkey", "l_suppkey"], sort=False)["failed"]
            .max()
            .reset_index()
        )
        stats = per.groupby("l_orderkey", sort=False)["failed"].agg(["size", "sum"])
        ok = stats.index[(stats["size"] > 1) & (stats["sum"] == 1)]
        out = per[(per["failed"] == 1) & per["l_orderkey"].isin(ok)]
        return out[["l_suppkey"]]

    pre = li.map_batches(_pre, batch_format="pandas")
    culprits = bucketed_map_groups(pre, ["l_orderkey"], _culprits, seed="q21")

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    j = auto_join(culprits, rename_ds(supp, {"s_suppkey": "l_suppkey"}), key="l_suppkey")
    counts = grouped_agg(j, ["s_name"], {"numwait": ("count", None)})
    return top_k(counts, ["numwait", "s_name"], 20, descending=[True, False])
