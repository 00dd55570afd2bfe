"""Unit tests: windows, sketches, text analysis, ANN, model, multimodal,
pipeline API, scalar functions."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from engine.ops import scalar as F
from engine.ops.ann import build_centroids, knn_brute, quantize
from engine.ops.model import DeterministicEmbedder, score_documents
from engine.ops.multimodal import DecodePayload, attach_fake_payload, decode_payloads, payload_features
from engine.ops.text import lang_id, quality_score, text_stats
from engine.ops.window import session, sliding, tumbling
from engine.pipeline import Pipeline, Step


def test_scalar_string_and_math():
    a = pa.array(["Hello World", "abc"])
    assert F.lower(a).to_pylist() == ["hello world", "abc"]
    assert F.length(a).to_pylist() == [11, 3]
    assert F.substr(a, 1, 5).to_pylist() == ["Hello", "abc"]
    assert F.contains(a, "World").to_pylist() == [True, False]
    assert F.regexp_extract(pa.array(["x=42", "x=7"]), r"x=(\d+)").to_pylist() == ["42", "7"]
    assert F.round_(pa.array([1.2345678]), 3).to_pylist() == [1.235]


def test_scalar_dates_and_json():
    ts = pa.array([np.datetime64("1995-03-15T10:30:00", "us")])
    assert F.year(ts).to_pylist() == [1995]
    assert F.month(ts).to_pylist() == [3]
    assert F.date_trunc(ts, "day").to_pylist() == [pd.Timestamp("1995-03-15")]
    assert F.json_get(pa.array(['{"k": 5}', None, "bad"]), "k").to_pylist() == [5, None, None]
    assert F.list_sum(pa.array([[1.0, 2.0], []], type=pa.list_(pa.float64()))).to_pylist() == [3.0, 0.0]


def test_windows_tumbling_sliding_session():
    ts = pd.to_datetime(
        ["2024-01-01 00:10", "2024-01-01 10:00", "2024-01-02 00:10", "2024-01-02 00:20"]
    ).astype("datetime64[us]")
    df = pd.DataFrame({"ts": ts, "g": ["x", "x", "x", "y"], "v": [1, 2, 3, 4]})
    ds = rd.from_pandas(df)
    t = tumbling(ds, "ts", "day", ["g"], {"n": ("count", None)}).to_pandas()
    assert set(zip(t["g"], t["n"])) == {("x", 2), ("x", 1), ("y", 1)}

    day = 86_400_000_000
    s = sliding(ds, "ts", 2 * day, day, ["g"], {"n": ("count", None)}).to_pandas()
    # each row lands in exactly 2 windows
    assert s["n"].sum() == 2 * len(df)

    sess = session(ds, "ts", "g", gap_us=3_600_000_000, agg_col="v").to_pandas()
    x = sess[sess["g"] == "x"]
    assert len(x) == 3  # gaps > 1h split all three x events
    assert set(sess[sess["g"] == "y"]["sum_value"]) == {4}


def test_knn_brute_exact():
    vecs = np.eye(4, dtype=np.float64)
    t = pa.table({"vec_id": list(range(4)), "embedding": [list(v) for v in vecs]})
    out = knn_brute(rd.from_arrow(t), "embedding", "vec_id", vecs[:1], [0], k=2).to_pandas()
    assert list(out.sort_values("score", ascending=False)["id"])[:1] == [0]
    assert out["score"].max() == quantize(vecs[:1])[0] @ quantize(vecs[:1])[0]


def test_build_centroids_deterministic():
    rng = np.random.RandomState(1)
    pts = rng.standard_normal((100, 4))
    a = build_centroids(pts, 4, seed=7)
    b = build_centroids(pts, 4, seed=7)
    assert np.array_equal(a, b)


def test_text_ops(sf_dir):
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["the quick fox. and a dog!", "der die das und ist"]})
    ds = rd.from_pandas(df)
    stats = text_stats(ds).to_pandas().sort_values("doc_id")
    assert stats["n_tokens"].tolist() == [6, 5]
    q = quality_score(ds).to_pandas()
    assert ((0 <= q["quality"]) & (q["quality"] <= 1)).all()
    l = lang_id(ds).to_pandas().sort_values("doc_id")
    assert l["lang_pred"].tolist() == ["en", "de"]


def test_model_scoring_deterministic():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", "gamma delta"]})
    a = score_documents(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    b = score_documents(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert a["model_score"].tolist() == b["model_score"].tolist()
    e = DeterministicEmbedder()
    emb = e(df)
    assert len(emb["model_embedding"].iloc[0]) == 32
    n = np.linalg.norm(emb["model_embedding"].iloc[0])
    assert abs(n - 1.0) < 1e-5


def test_multimodal_plumbing():
    df = pd.DataFrame({"doc_id": [1], "text": ["hello"]})
    ds = attach_fake_payload(rd.from_pandas(df))
    out = decode_payloads(ds, fake=True)
    out = payload_features(out).to_pandas()
    assert out["n_bytes"].iloc[0] == 5
    assert 64 <= out["width"].iloc[0] < 256
    assert len(out["payload_features"].iloc[0]) == 8
    # fake=False is a REAL decode now: non-image bytes are a parse error,
    # real BMP bytes parse to true dims.
    with pytest.raises(ValueError, match="unknown image container"):
        DecodePayload(fake=False)(pd.DataFrame({"payload": [b"not an image"]}))
    from engine.ops.codec import encode_bmp

    px = np.zeros((4, 6, 3), np.uint8)
    real = DecodePayload(fake=False)(pd.DataFrame({"payload": [encode_bmp(px)]}))
    assert (real["width"].iloc[0], real["height"].iloc[0]) == (6, 4)


def test_pipeline_api():
    df = pd.DataFrame({"x": [1, 2, 3, 4]})
    p = Pipeline(
        [
            Step("double", lambda t: t.set_column(0, "x", pc.multiply(t.column("x"), 2))),
            Step("keep_big", lambda t: pc.greater(t.column("x"), 4), kind="filter"),
        ]
    )
    out = p.run(rd.from_pandas(df)).to_pandas()
    assert sorted(out["x"]) == [6, 8]


def test_minhash_lsh_recall(sf_dir):
    """The bucketed LSH shuffle must not lose candidate pairs: every
    true near-dup (exact Jaccard >= 0.5) is captured."""
    import pyarrow.parquet as pq

    from engine.ops.dedup import minhash_candidate_pairs

    from engine.ops.dedup import shingle_hashes

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cand = minhash_candidate_pairs(ds, "text", "doc_id").to_pandas()
    got = set(map(tuple, cand[["a", "b"]].values))
    ids = docs.column("doc_id").to_pylist()
    txt = docs.column("text").to_pylist()
    sh = [set(shingle_hashes(t or "", 5).tolist()) for t in txt]  # precompute once
    truth = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            inter = len(sh[i] & sh[j])
            union = len(sh[i]) + len(sh[j]) - inter
            if union and inter / union >= 0.5:
                truth.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert truth, "fixture should contain at least one near-dup pair"
    assert not (truth - got), f"LSH missed {len(truth - got)} true pairs"


def test_cosine_ivf_pairs_recall(sf_dir):
    """IVF-cell co-partitioned pairing vs brute-force cosine: precision
    must be exact (every emitted pair really is >= threshold, with the
    true cosine) and recall high (multi-probe cells capture the planted
    near-dups)."""
    import pyarrow.parquet as pq

    from engine.ops.ann import cosine_near_dup_pairs

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    cos = m @ m.T
    ii, jj = np.nonzero(np.triu(cos >= 0.4, k=1))
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))): round(float(cos[i, j]), 6)
        for i, j in zip(ii, jj)
    }
    assert truth, "fixture should contain at least one high-cosine pair"

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    got = cosine_near_dup_pairs(ds, "embedding", "vec_id", threshold=0.4).to_pandas()
    got_pairs = {(int(a), int(b)): c for a, b, c in zip(got["a"], got["b"], got["cos"])}
    # precision: every emitted pair is a true pair with the exact cosine
    for p, c in got_pairs.items():
        assert p in truth and abs(c - truth[p]) < 2e-6, p
    # recall: multi-probe IVF captures at least 80% of the true pairs
    recall = len(set(got_pairs) & set(truth)) / len(truth)
    assert recall >= 0.8, f"recall {recall:.2f} over {len(truth)} true pairs"


def test_connected_components_vs_union_find():
    """Distributed min-label + pointer-jumping CC vs a sequential
    union-find on a random graph including a long chain (exercises the
    O(log d) doubling path)."""
    from engine.ops.dedup import connected_components

    rng = np.random.RandomState(5)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 120, (80, 2)) if a != b]
    edges += [(i, i + 1) for i in range(200, 260)]  # 61-node chain
    df = pd.DataFrame(edges, columns=["a", "b"])

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    for a, b in edges:
        union(a, b)
    truth = {n: find(n) for n in parent}
    # canonicalize to min member per component
    comp_min = {}
    for n, r in truth.items():
        comp_min.setdefault(find(r), []).append(n)
    truth = {n: min(m) for r, m in comp_min.items() for n in m}

    # distributed message-passing path (threshold 0 forces it) and the
    # size-gated local union-find path must both match the reference
    for thresh in (0, 500_000):
        got = connected_components(
            rd.from_pandas(df), local_threshold=thresh
        ).to_pandas()
        got_map = dict(zip(got["node"].astype(int), got["component"].astype(int)))
        assert got_map == truth, f"local_threshold={thresh}"


def test_tfidf_fused_and_distributed_paths_agree(monkeypatch):
    """The vocabulary-broadcast fused path and the two-exchange fallback
    must produce the identical top-3 row set."""
    import engine.pipelines.content as content
    from engine.registry import QUERIES, load_catalog

    load_catalog()
    sf = "/root/testdata/sf0.001"

    def _run():
        return (
            QUERIES["q_tfidf"](sf)
            .to_pandas()
            .sort_values(["doc_id", "word"])
            .reset_index(drop=True)
        )

    fused = _run()
    monkeypatch.setattr(content, "TFIDF_BCAST_VOCAB_MAX", 0)
    fallback = _run()
    pd.testing.assert_frame_equal(fused, fallback, check_dtype=False)


def test_codec_byte_exact_roundtrips():
    """BMP and PNG (every filter type, RGB + RGBA, odd widths) decode
    back to the exact pixels they encoded; corrupt magic raises."""
    import numpy as np
    import pytest

    from engine.ops.codec import (
        decode_bmp,
        decode_image,
        decode_png,
        encode_bmp,
        encode_png,
    )

    rng = np.random.default_rng(5)
    for (h, w) in [(1, 1), (8, 24), (13, 17)]:
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px)
        for ft in range(5):
            assert np.array_equal(decode_png(encode_png(px, ft)), px)
    px4 = rng.integers(0, 256, (5, 7, 4)).astype(np.uint8)
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(px4, ft)), px4)
    assert decode_image(encode_bmp(px)).shape == (13, 17, 3)
    with pytest.raises(ValueError, match="unknown image container"):
        decode_image(b"GIF89a notsupported")
    with pytest.raises(ValueError, match="bad magic"):
        decode_bmp(b"XX" + encode_bmp(px)[2:])


def test_multimodal_real_decode_stage():
    """The actor-pool decode stage with fake=False parses real BMP/PNG
    payloads: recovered dims and pixel sums match the generation
    formula."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from engine.ops.multimodal import attach_image_payload, decode_payloads

    ids = np.arange(12, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = (
        decode_payloads(attach_image_payload(ds), fake=False, concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        i = int(row["doc_id"])
        w, h = 16 + (i % 2) * 8, 8 + (i % 3) * 2
        y, x, c = np.ogrid[0:h, 0:w, 0:3]
        want = int(((i + 3 * y + 5 * x + 11 * c) % 256).sum())
        assert (row["width"], row["height"], row["channels"]) == (w, h, 3)
        assert int(row["pixel_sum"]) == want


def test_wav_codec_and_audio_stage():
    """WAV round trip is byte-exact (mono + stereo, odd lengths incl. the
    RIFF word-alignment path) and the actor-pool audio stage recovers the
    generation formula's sample sums."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from engine.ops.codec import decode_wav, encode_wav
    from engine.ops.multimodal import attach_audio_payload, decode_audio_payloads

    rng = np.random.default_rng(13)
    for shape in [(100,), (64, 2), (1, 1), (257,)]:
        s = rng.integers(-32768, 32767, shape).astype(np.int16)
        out, rate = decode_wav(encode_wav(s, 8000))
        want = s[:, None] if s.ndim == 1 else s
        assert rate == 8000 and np.array_equal(out, want)
    with pytest.raises(ValueError, match="bad RIFF"):
        decode_wav(b"OggS not a wav")

    ids = np.arange(7, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = (
        decode_audio_payloads(attach_audio_payload(ds), concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        i = int(row["doc_id"])
        n = 800 + (i % 5) * 40
        idx = np.arange(n, dtype=np.int64)
        want = int(((i * 13 + 7 * idx) % 65536 - 32768).sum())
        assert (row["n_samples"], row["sample_rate"]) == (n, 16000)
        assert int(row["sample_sum"]) == want


def test_avi_codec_and_frame_sampling_stage():
    """AVI round trip is byte-exact, stride sampling picks every Nth
    frame, and the actor-pool stage recovers the generation formula's
    sampled-pixel sums."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from engine.ops.codec import decode_avi, encode_avi
    from engine.ops.multimodal import attach_video_payload, sample_video_frames

    rng = np.random.default_rng(17)
    fr = rng.integers(0, 256, (5, 6, 9, 3)).astype(np.uint8)
    out, meta = decode_avi(encode_avi(fr, fps=4))
    assert np.array_equal(out, fr)
    assert (meta["n_frames"], meta["width"], meta["height"]) == (5, 9, 6)
    s2, _ = decode_avi(encode_avi(fr), frame_stride=2)
    assert np.array_equal(s2, fr[::2])
    with pytest.raises(ValueError, match="bad RIFF/AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")

    ids = np.arange(6, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
    got = (
        sample_video_frames(attach_video_payload(ds), stride=2, concurrency=1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        i = int(row["doc_id"])
        n = 4 + i % 3
        f, y, x, c = np.ogrid[0:n, 0:6, 0:8, 0:3]
        frames = (i + 2 * f + 3 * y + 5 * x + 11 * c) % 256
        want = int(frames[::2].sum())
        assert (row["n_frames"], row["frames_sampled"]) == (n, (n + 1) // 2)
        assert int(row["sampled_pixel_sum"]) == want


def test_sequence_chunk_pack_mix():
    from engine.ops.sequence import chunk_documents, mix_domains, pack_sequences

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "lang": ["en", "en", "en", "fr", "fr", "fr"],
            "text": [
                "a b c d e",          # 5 tokens
                "f g",                # 2
                " ".join(["w"] * 11),  # 11 -> chunks of 4: 4,4,3
                "x",                  # 1
                "y z q",              # 3
                " ".join(["v"] * 9),   # 9
            ],
        }
    )
    ds = rd.from_pandas(docs)

    # chunking: token counts reassemble to the doc totals; text roundtrips
    ch = chunk_documents(ds, "text", "doc_id", max_tokens=4).to_pandas()
    got = ch.groupby("doc_id")["n_tokens"].sum().to_dict()
    assert got == {1: 5, 2: 2, 3: 11, 4: 1, 5: 3, 6: 9}
    rejoined = (
        ch.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id")["chunk_text"]
        .apply(" ".join)
    )
    assert (rejoined.to_numpy() == docs.set_index("doc_id")["text"].to_numpy()).all()

    # packing: greedy reset at budget 8, per lang in doc_id order.
    # en: 5 | 2 -> bin0 (7), 11 -> bin1 alone (oversized kept whole)
    # fr: 1 | 3 -> bin0 (4), 9 -> bin1
    toks = pd.DataFrame(
        {
            "lang": docs["lang"],
            "doc_id": docs["doc_id"],
            "n_tokens": [5, 2, 11, 1, 3, 9],
        }
    )
    packed = (
        pack_sequences(rd.from_pandas(toks), budget=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert packed["bin_idx"].tolist() == [0, 0, 1, 0, 0, 1]
    assert packed["bin_tokens"].tolist() == [7, 7, 11, 4, 4, 9]

    # parallelism invariance: 1 block vs 6 blocks, same assignment
    packed6 = (
        pack_sequences(rd.from_pandas(toks).repartition(6), budget=8)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert packed6["bin_idx"].tolist() == packed["bin_idx"].tolist()

    # mixing: hash-threshold filter matches a direct recomputation
    kept = mix_domains(ds, {"en": 0.5, "fr": 1.0}).to_pandas()
    expect = {
        int(i)
        for i, g in zip(docs["doc_id"], docs["lang"])
        if (i * 2654435761) % 4294967296 < int({"en": 0.5, "fr": 1.0}[g] * 4294967296)
    }
    assert set(kept["doc_id"]) == expect and 4 in expect  # fr rate 1.0 keeps all fr


def test_pq_adc_recall_vs_brute(sf_dir):
    """PQ/ADC top-k must overlap the exact brute-force top-k: ADC is
    approximate, but on the 64-dim synthetic embeddings an 8x8 codebook
    should place most true neighbors in the approximate top-20
    (near-orthogonal random vectors are PQ's hardest case — 8x256
    measured 1.0 here, 8x64 only 0.6)."""
    import pyarrow.parquet as pq

    from engine.ops.ann import (
        build_pq_codebook, knn_brute, knn_pq, pq_encode,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    queries, qids = m[:3], ids[:3].tolist()

    ds = rd.from_arrow(t)
    exact = knn_brute(ds, "embedding", "vec_id", queries, qids, k=5).to_pandas()

    cb = build_pq_codebook(m[:1024], n_sub=8, n_centroids=256, seed=42)
    codes = pq_encode(rd.from_arrow(t), "embedding", "vec_id", cb)
    approx = knn_pq(codes, "vec_id", queries, qids, k=20, codebook=cb).to_pandas()

    hits = total = 0
    for q in qids:
        want = set(exact[exact["query_id"] == q]["id"].tolist())
        got = set(approx[approx["query_id"] == q]["id"].tolist())
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.8, f"PQ recall@20-of-5 {recall:.2f}"
    # determinism: a second run returns the identical frame
    approx2 = knn_pq(codes, "vec_id", queries, qids, k=20, codebook=cb).to_pandas()
    a = sorted(map(tuple, approx[["query_id", "id", "score"]].to_numpy().tolist()))
    b = sorted(map(tuple, approx2[["query_id", "id", "score"]].to_numpy().tolist()))
    assert a == b


def test_kmeans_distributed_matches_single_process(sf_dir):
    """Distributed Lloyd == single-process reference, bit-for-bit:
    exact-int64 centroid accumulation makes the result independent of
    batch boundaries and parallelism, so the same init must yield
    IDENTICAL centroids and assignments."""
    import pyarrow.parquet as pq

    from engine.io.sources import read_table
    from engine.ops.ann import (
        _kmeans_partials, bottomk_sample_rows, build_centroids_int, kmeans, quantize,
    )

    k, iters = 5, 3
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent, assign_ds = kmeans(ds, "embedding", "vec_id", k=k, iters=iters)
    got = assign_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)

    # Single-process reference: same init, whole table as ONE batch.
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = np.stack([np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()])
    ids = np.asarray(tbl["vec_id"].to_pylist())
    order = np.argsort(ids)
    vecs, ids = vecs[order], ids[order]
    sample = np.stack([
        np.asarray(r["embedding"], dtype=np.float64)
        for r in bottomk_sample_rows(ds, "vec_id", 4096, seed="kmeans-42")
    ])
    cq = build_centroids_int(quantize(sample), k)
    vq = quantize(vecs)
    for _ in range(iters):
        assign, part = _kmeans_partials(vq, cq)
        new = cq.copy()
        for c, grp in part.groupby("cluster"):
            n = int(grp["n"].sum())
            total = np.sum(np.stack(grp["s"].to_numpy()).astype(np.int64), axis=0)
            new[int(c)] = np.floor(total / n + 0.5).astype(np.int64)
        if np.array_equal(new, cq):
            break
        cq = new
    ref_assign, _ = _kmeans_partials(vq, cq)

    assert np.array_equal(quantize(cent), cq)
    assert got["vec_id"].to_numpy().tolist() == ids.tolist()
    assert got["cluster"].to_numpy().tolist() == ref_assign.tolist()
    # every cluster is non-trivial on the synthetic corpus
    assert got["cluster"].nunique() == k


def test_lm_score_matches_reference():
    """Distributed two-pass char-bigram LM score == single-process
    reference (same smoothing, same per-doc order), incl. empty docs,
    unicode, and a one-char doc (zero bigrams -> score 0, n 0)."""
    from engine.ops.text import lm_score, train_bigram_counts

    docs = ["the cat sat", "the the the", "", "z", "éclair déjà vu", "aaaa"]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    ds = rd.from_pandas(df)
    counts = train_bigram_counts(ds)
    got = lm_score(ds, counts, id_cols=["doc_id"]).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)

    # reference
    ref_counts = np.zeros(65536, dtype=np.int64)
    encs = [t.encode("utf-8", "replace") for t in docs]
    for b in encs:
        a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        if len(a) >= 2:
            np.add.at(ref_counts, a[:-1] * 256 + a[1:], 1)
    assert (counts == ref_counts).all()
    prefix = ref_counts.reshape(256, 256).sum(axis=1).astype(np.float64)
    logp = np.log(ref_counts + 1.0) - np.log(np.repeat(prefix, 256) + 256.0)
    logp = np.floor(logp * 1e6 + 0.5)  # engine's micro-nat quantization
    for i, b in enumerate(encs):
        a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
        if len(a) < 2:
            assert got.loc[i, "lm_logprob"] == 0.0
            assert got.loc[i, "lm_logprob_n"] == 0
        else:
            pairs = a[:-1] * 256 + a[1:]
            assert np.isclose(got.loc[i, "lm_logprob"], logp[pairs].mean())
            assert got.loc[i, "lm_logprob_n"] == len(pairs)
    # the degenerate repeated-char doc is the most predictable string in
    # this corpus — its self-trained logprob beats natural text
    assert got.loc[5, "lm_logprob"] > got.loc[0, "lm_logprob"]


def test_cluster_balanced_sample_deterministic(sf_dir):
    """The kept row set equals the exact hash-threshold recomputation
    from the (deterministic) k-means assignment, and every cluster's
    kept count is <= its target-rate expectation bound."""
    from engine.pipelines.content import q_cluster_balanced_sample
    from engine.ops.sequence import _KNUTH, _MOD

    kept = q_cluster_balanced_sample(sf_dir).to_pandas()
    kept2 = q_cluster_balanced_sample(sf_dir).to_pandas()
    a = sorted(kept["vec_id"].tolist())
    assert a == sorted(kept2["vec_id"].tolist())  # fully deterministic

    # recompute expected from the assignment + median-target rule
    from engine.io.sources import read_table
    from engine.ops.ann import kmeans

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    _, assign = kmeans(ds, "embedding", "vec_id", k=8, iters=4)
    adf = assign.to_pandas()
    counts = adf.groupby("cluster").size()
    target = int(counts.median())
    expect = []
    for _, row in adf.iterrows():
        thr = int(min(1.0, target / counts[row["cluster"]]) * _MOD)
        if (int(row["vec_id"]) * _KNUTH) % _MOD < thr:
            expect.append(int(row["vec_id"]))
    assert a == sorted(expect)


def test_json_get_property_random_documents():
    """Fuzz the json_get fast-path/fallback boundary: random JSON docs
    (nested objects repeating the key, escaped quotes embedding fake
    '"k": 9' fragments in string values, bools/nulls/arrays, unicode,
    missing keys, malformed rows) vs json.loads ground truth."""
    import json

    from hypothesis import given, settings, strategies as st

    from engine.ops.scalar import json_get

    values = st.one_of(
        st.integers(min_value=-10**6, max_value=10**6),
        st.sampled_from(['"k": 9,', 'a"b\\c', "éclair", "", "plain"]),
        st.booleans(), st.none(), st.lists(st.integers(0, 3), max_size=2),
        st.fixed_dictionaries({"k": st.integers(0, 99)}),  # nested repeat of the key
    )
    docs = st.lists(
        st.one_of(
            st.none(),
            st.just("not json at all"),
            st.dictionaries(st.sampled_from(["k", "x", "y"]), values, max_size=3),
        ),
        min_size=1, max_size=20,
    )

    @settings(max_examples=10, deadline=None)
    @given(ds=docs)
    def _check(ds):
        raw, want = [], []
        for d in ds:
            if d is None or isinstance(d, str):
                raw.append(d)
                want.append(None)
            else:
                raw.append(json.dumps(d))
                v = d.get("k")
                want.append(v if isinstance(v, int) and not isinstance(v, bool) else None)
        got = json_get(pa.array(raw, pa.string()), "k").to_pylist()
        assert got == want

    _check()


def test_ivfpq_recall_vs_brute(sf_dir):
    """IVF-PQ (coarse cells + residual codes + ADC) top-k must overlap
    the exact brute-force top-k, and a second run must be identical —
    everything is int64-exact, so determinism is bitwise."""
    import pyarrow.parquet as pq

    from engine.ops.ann import (
        build_centroids_int, knn_brute, knn_ivfpq, quantize,
        residual_pq_codebook,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist())
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t.column("embedding").to_pylist()])
    queries, qids = m[:3], ids[:3].tolist()

    ds = rd.from_arrow(t)
    exact = knn_brute(ds, "embedding", "vec_id", queries, qids, k=5).to_pandas()

    # near-orthogonal random vectors are the hardest case for cell
    # routing (inner-product neighbors correlate weakly with Euclidean
    # cells), so the sanity bar probes ALL cells and uses the 8x256
    # codebook — isolating the residual-PQ quantization quality; the
    # registered query's exactness is the oracle's job, not this test's.
    sq = quantize(m[:1024])
    coarse = build_centroids_int(sq, 16)
    cb = residual_pq_codebook(sq, coarse, n_sub=8, n_centroids=256)
    approx = knn_ivfpq(rd.from_arrow(t), "embedding", "vec_id", queries, qids,
                       k=20, coarse=coarse, codebook=cb, n_probe=16).to_pandas()

    hits = total = 0
    for q in qids:
        want = set(exact[exact["query_id"] == q]["id"].tolist())
        got = set(approx[approx["query_id"] == q]["id"].tolist())
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    assert recall >= 0.6, f"IVFPQ recall@20-of-5 {recall:.2f}"
    approx2 = knn_ivfpq(rd.from_arrow(t), "embedding", "vec_id", queries, qids,
                        k=20, coarse=coarse, codebook=cb, n_probe=16).to_pandas()
    a = sorted(map(tuple, approx[["query_id", "id", "score"]].to_numpy().tolist()))
    b = sorted(map(tuple, approx2[["query_id", "id", "score"]].to_numpy().tolist()))
    assert a == b
