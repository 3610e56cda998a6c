"""Training-data operators: text analysis, dedup families, ANN, scalers,
similarity functions, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from graph_data_science_ray.functions import ann, dedup, multimodal, scalers
from graph_data_science_ray.functions import similarity as simf
from graph_data_science_ray.functions import text as textf


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    texts = [
        "The quick brown fox jumps over the lazy dog and the cat",
        "The quick brown fox jumps over the lazy dog and the cat",   # dup of 0
        "The quick brown fox jumps over the lazy dog and a cat",     # near-dup
        "Der Hund ist nicht auf der Strasse und das ist gut",
        "Le chat est dans la maison pour le moment",
        "completely different content about spacecraft engineering 12345",
        "short",
        "El perro es un animal y la casa es grande por que si",
    ]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_language_id(docs_ds):
    out = textf.language_id(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[3, "lang_pred"] == "de"
    assert out.loc[4, "lang_pred"] == "fr"
    assert out.loc[7, "lang_pred"] == "es"


def test_token_counts(docs_ds):
    out = textf.token_counts(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[6, "n_tokens_ws"] == 1
    assert out.loc[0, "n_tokens_ws"] == 12
    assert (out["n_tokens_bpe"] >= out["n_tokens_ws"]).all()


def test_quality_scores(docs_ds):
    out = textf.quality_scores(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "quality_score"] > out.loc[6, "quality_score"]
    assert (out["punct_ratio"] >= 0).all() and (out["punct_ratio"] <= 1).all()


def test_fingerprints_deterministic(docs_ds):
    a = textf.fingerprints(docs_ds).to_pandas().set_index("doc_id")
    b = textf.fingerprints(docs_ds).to_pandas().set_index("doc_id")
    assert (a["fingerprint"] == b["fingerprint"]).all()
    assert a.loc[0, "fingerprint"] == a.loc[1, "fingerprint"]  # identical docs
    assert a.loc[0, "fingerprint"] != a.loc[5, "fingerprint"]


def test_exact_dedup(docs_ds):
    out = dedup.exact_dedup(docs_ds).to_pandas()
    row = out[out["dup_count"] == 2]
    assert len(row) == 1 and row.iloc[0]["doc_id"] == 0
    assert len(out) == 7  # 8 docs, one exact pair


def test_minhash_dedup(docs_ds):
    clustered = dedup.minhash_dedup(docs_ds, threshold=0.7).to_pandas()
    by_id = clustered.set_index("doc_id")["cluster_id"]
    assert by_id[0] == by_id[1] == by_id[2]  # exact + near dup clustered
    assert by_id[5] == 5                      # unique doc keeps itself
    keep = clustered.set_index("doc_id")["keep"]
    assert keep[0] and not keep[1] and not keep[2]


def test_simhash_dedup(docs_ds):
    clustered = dedup.simhash_dedup(docs_ds, max_distance=3).to_pandas()
    by_id = clustered.set_index("doc_id")["cluster_id"]
    assert by_id[0] == by_id[1]  # identical docs share a cluster
    assert by_id[5] == 5


def test_near_dedup_exact_is_shingle_set_equality(ray_session):
    """threshold=1.0 clusters docs whose DISTINCT shingle sets are
    equal — strictly coarser than text equality: trailing repetition
    adds no new k-grams (the live sf0.001 doc-12/360 case; the SQL
    oracle groups by the sorted shingle list for the same reason)."""
    texts = [
        "alpha beta gamma delta dup dup dup",   # extra 'dup ' repeats
        "alpha beta gamma delta dup dup",       # same 5-gram SET as 0
        "alpha beta gamma delta",               # genuinely different
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    }))
    out = dedup.minhash_dedup(ds, threshold=1.0).to_pandas()
    by_id = out.set_index("doc_id")["cluster_id"]
    assert by_id[0] == by_id[1] == 0   # set-equal despite text differing
    assert by_id[2] == 2


def test_dedup_pair_stream_engine_path(ray_session, monkeypatch):
    """All-duplicate corpus with the WCC-engine gate forced to 1: the
    verified-pair stream takes the no-driver-transit route
    (cluster_assignments_ds → compact-encode map_batches →
    build_int_graph → superstep WCC) and still produces one cluster.
    Proves the pairs Dataset path end-to-end; driver state is the
    O(labels) map only."""
    n = 40
    texts = [f"the same long duplicated document body everywhere {i % 2}"
             .replace(str(i % 2), "") for i in range(n)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64) * 7 + 3),
        "text": pa.array(texts, type=pa.string()),
    }))
    monkeypatch.setattr(dedup, "_WCC_ENGINE_PAIRS", 1)
    out = dedup.minhash_dedup(ds, threshold=0.9).to_pandas()
    assert (out["cluster_id"] == 3).all()        # min sparse id wins
    assert out["keep"].sum() == 1
    out2 = dedup.simhash_dedup(ds, max_distance=3).to_pandas()
    assert (out2["cluster_id"] == 3).all()
    assert out2["keep"].sum() == 1


def test_cluster_assignments_ds_matches_array_path(ray_session):
    """Dataset-pair clustering == array-pair clustering on the same
    pair set (sparse ids, multiple components)."""
    ids = np.array([3, 10, 24, 31, 57, 900], dtype=np.int64)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(["x"] * len(ids), type=pa.string())}))
    a = np.array([10, 24, 900], dtype=np.int64)
    b = np.array([57, 10, 31], dtype=np.int64)
    via_arrays = dedup.cluster_assignments(docs, a, b).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pairs = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    via_ds = dedup.cluster_assignments_ds(docs, pairs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(via_arrays, via_ds)


def test_ngram_dedup(docs_ds):
    clustered = dedup.ngram_dedup(docs_ds, threshold=0.7).to_pandas()
    by_id = clustered.set_index("doc_id")["cluster_id"]
    assert by_id[0] == by_id[1] == by_id[2]  # exact + near dup clustered
    assert by_id[5] == 5                      # unique doc keeps itself
    keep = clustered.set_index("doc_id")["keep"]
    assert keep[0] and not keep[1] and not keep[2]


def test_ngram_jaccard():
    sims = dedup.ngram_jaccard(["abcdefg", "abcdefg", "abcdefg"],
                               ["abcdefg", "abcdefx", "zzzzzzz"], n=3)
    assert sims[0] == 1.0
    assert 0 < sims[1] < 1
    assert sims[2] == 0.0


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((200, 16))
    vecs[5] = vecs[3] + 1e-6            # near-duplicate pair
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(200, dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float64())),
    })), vecs


def test_brute_force_topk(emb_ds):
    ds, vecs = emb_ds
    queries = vecs[:3]
    out = ann.brute_force_topk(ds, queries, k=5)
    assert len(out) == 15
    top1 = out[out["rank"] == 1].set_index("query_id")
    for q in range(3):
        assert top1.loc[q, "vec_id"] == q  # each query's best match: itself
        assert abs(top1.loc[q, "score"] - 1.0) < 1e-9
    # exactness vs numpy oracle
    sims = simf.cosine_matrix(vecs, queries)
    for q in range(3):
        expected = np.argsort(-sims[q], kind="stable")[:5]
        got = out[out["query_id"] == q].sort_values("rank")["vec_id"].to_numpy()
        assert set(got) == set(expected)


def test_lsh_topk_overlaps_exact(emb_ds):
    ds, vecs = emb_ds
    queries = vecs[:2]
    exact = ann.brute_force_topk(ds, queries, k=5)
    approx = ann.lsh_topk(ds, queries, k=5, num_bits=6)
    # LSH must at least find the identical vector for each query
    for q in range(2):
        got = approx[approx["query_id"] == q]["vec_id"].tolist()
        assert q in got


def test_ivf_topk_exhaustive_is_exact(emb_ds):
    """nprobe == num_lists probes every cell → identical to brute force
    (the configuration the SQL oracle checks)."""
    ds, vecs = emb_ds
    queries = vecs[:3]
    exact = ann.brute_force_topk(ds, queries, k=5)
    ivf = ann.ivf_topk(ds, queries, k=5, num_lists=8, nprobe=8)
    a = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = ivf.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy())


def test_ivf_topk_pruned_recall(ray_session):
    """Clustered corpus: probing 1 of 8 cells still recovers most of the
    true top-k (queries sit inside clusters)."""
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16)) * 5
    vecs = np.concatenate([c + rng.standard_normal((50, 16)) * 0.3
                           for c in centers])
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float64())),
    }))
    queries = vecs[[10, 60, 110]]
    exact = ann.brute_force_topk(ds, queries, k=10)
    ivf = ann.ivf_topk(ds, queries, k=10, num_lists=8, nprobe=1,
                       train_sample=400)
    hits = 0
    for q in range(3):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(ivf[ivf["query_id"] == q]["vec_id"])
        hits += len(e & a)
    assert hits / 30 >= 0.6, hits


def test_embedding_neardup(emb_ds):
    ds, _ = emb_ds
    pairs = ann.embedding_neardup(ds, threshold=0.999, num_bits=6).to_pandas()
    assert ((pairs["a"] == 3) & (pairs["b"] == 5)).any()


def test_scalers(ray_session):
    vals = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float64)
    ds = rd.from_arrow(pa.table({"v": vals}))
    got = scalers.scale(ds, "v", "minmax").to_pandas()["v_scaled"].to_numpy()
    assert np.allclose(sorted(got), [0, 1 / 3, 2 / 3, 1.0])
    got = scalers.scale(ds, "v", "stdscore").to_pandas()["v_scaled"].to_numpy()
    assert abs(np.mean(got)) < 1e-12
    got = scalers.scale(ds, "v", "l2").to_pandas()["v_scaled"].to_numpy()
    assert np.allclose(np.linalg.norm(got), 1.0)
    got = scalers.scale(ds, "v", "l1").to_pandas()["v_scaled"].to_numpy()
    assert np.allclose(np.sum(np.abs(got)), 1.0)


def test_one_hot():
    assert scalers.one_hot_encode(["b", "z"], ["a", "b", "c"]) == [
        [0, 1, 0], [0, 0, 0]]


def test_similarity_functions():
    a = np.array([1, 2, 3], dtype=np.int64)
    b = np.array([2, 3, 4], dtype=np.int64)
    assert abs(simf.jaccard(a, b) - 0.5) < 1e-12
    assert abs(simf.overlap(a, b) - 2 / 3) < 1e-12
    x = np.array([1.0, 0.0])
    y = np.array([0.0, 1.0])
    assert abs(simf.cosine(x, y)) < 1e-12
    assert abs(simf.euclidean_similarity(x, x) - 1.0) < 1e-12


def test_multimodal_plumbing(ray_session):
    items = rd.from_arrow(multimodal.synthesize_binary_items(20))
    feats = multimodal.extract_image_features(items, dim=32).to_pandas()
    assert len(feats) == 20
    assert all(len(f) == 32 for f in feats["feature"])
    # deterministic across runs
    feats2 = multimodal.extract_image_features(
        rd.from_arrow(multimodal.synthesize_binary_items(20)),
        dim=32).to_pandas()
    f1 = feats.sort_values("item_id")["feature"].tolist()
    f2 = feats2.sort_values("item_id")["feature"].tolist()
    assert all(np.array_equal(x, y) for x, y in zip(f1, f2))
    frames = multimodal.sample_audio_frames(items, frames_per_item=3).to_pandas()
    assert len(frames) == 60
    assert set(frames["frame_idx"]) == {0, 1, 2}


def test_multimodal_binary_stats(ray_session):
    tbl = multimodal.synthesize_binary_items(12)
    out = (multimodal.binary_stats(rd.from_arrow(tbl))
           .to_pandas().sort_values("item_id").reset_index(drop=True))
    assert len(out) == 12
    payloads = tbl["payload"].to_pylist()
    for i, p in enumerate(payloads):
        a = np.frombuffer(p, dtype=np.uint8)
        assert out.loc[i, "n_bytes"] == len(a)
        assert abs(out.loc[i, "mean_byte"] - round(a.sum() / len(a), 6)) < 1e-9
        assert out.loc[i, "n_distinct_bytes"] == len(np.unique(a))


def test_stage_cpus_env_override(monkeypatch):
    from graph_data_science_ray.stages import resources
    monkeypatch.delenv("GRAFT_STAGE_CPUS", raising=False)
    assert resources.stage_cpus("ann") == 1.0
    monkeypatch.setenv("GRAFT_STAGE_CPUS", "ann=2, text=0.5,bad")
    assert resources.stage_cpus("ann") == 2.0
    assert resources.stage_cpus("text") == 0.5
    assert resources.stage_cpus("minhash") == 1.0  # untouched default


def test_bmp_codec_round_trip():
    # every row-padding class (w*3 mod 4) + the closed-form fixture
    for w in (8, 9, 10, 11):
        px = np.arange(w * 6 * 3, dtype=np.uint8).reshape(6, w, 3)
        assert np.array_equal(px, multimodal.decode_bmp(
            multimodal.encode_bmp(px)))
    for i in (0, 7, 63, 1000):
        px = multimodal.synthetic_image_pixels(i)
        assert np.array_equal(px, multimodal.decode_bmp(
            multimodal.encode_bmp(px)))
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"nonsense payload")


def test_png_codec_round_trip():
    rng = np.random.default_rng(7)
    # every filter type × gray/RGB/RGBA × edge sizes (1-wide rows have
    # no left neighbor; 1-tall images have no up neighbor)
    for c in (1, 3, 4):
        for h, w in [(1, 1), (1, 7), (6, 1), (9, 13)]:
            shape = (h, w, c) if c > 1 else (h, w)
            px = rng.integers(0, 256, shape, dtype=np.uint8)
            ref = px if px.ndim == 3 else px[:, :, None]
            for f in range(5):
                got = multimodal.decode_png(
                    multimodal.encode_png(px, filters=[f] * h))
                assert np.array_equal(got, ref), (c, h, w, f)
            got = multimodal.decode_png(multimodal.encode_png(px))
            assert np.array_equal(got, ref)
    # RGBA fixture + default cycling filters
    for i in (0, 7, 63, 1000):
        px = multimodal.synthetic_image_pixels_rgba(i)
        assert np.array_equal(
            px, multimodal.decode_png(multimodal.encode_png(px)))
    # corrupted chunk bytes fail the CRC walk; non-PNG fails the magic
    good = bytearray(multimodal.encode_png(
        multimodal.synthetic_image_pixels_rgba(3)))
    good[40] ^= 0xFF
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(good))
    with pytest.raises(ValueError):
        multimodal.decode_png(b"nonsense payload")


def test_png_stats_stage(ray_session):
    """image_stats takes the PNG decode branch end-to-end: RGB means
    of the decoded RGBA fixture match the pixel formula."""
    ids = np.arange(12, dtype=np.int64)
    png = rd.from_arrow(multimodal.synthesize_media_batch(ids, "png"))
    out = (multimodal.image_stats(png).to_pandas()
           .sort_values("item_id").reset_index(drop=True))
    for i in ids:
        px = multimodal.synthetic_image_pixels_rgba(i).astype(np.float64)
        assert out.loc[i, "width"] == px.shape[1]
        assert out.loc[i, "height"] == px.shape[0]
        for ch, col in enumerate(["mean_r", "mean_g", "mean_b"]):
            assert abs(out.loc[i, col]
                       - round(px[:, :, ch].mean(), 6)) < 1e-9
    # the feature extractor's strict path accepts PNG as real decode
    flat = np.full((10, 12, 3), 100, dtype=np.uint8)
    ex = multimodal.ImageFeatureExtractor(dim=16, strict=True)
    t = ex(pa.table({"item_id": pa.array([0], type=pa.int64()),
                     "payload": pa.array([multimodal.encode_png(flat)],
                                         type=pa.binary())}))
    f = np.asarray(t["feature"][0].as_py())
    assert np.allclose(f[:16], f[0]) and -1.0 < f[0] < 0.0


def test_wav_codec_round_trip():
    for i in (0, 7, 40, 999):
        s = multimodal.synthetic_wav_samples(i)
        s2, rate, nch = multimodal.decode_wav(
            multimodal.encode_wav(s, sample_rate=8000))
        assert rate == 8000 and nch == 1
        assert np.array_equal(s, s2)
    # stereo interleave survives
    st = np.array([1, -1, 2, -2, 3, -3], dtype=np.int16)
    s2, rate, nch = multimodal.decode_wav(
        multimodal.encode_wav(st, sample_rate=16000, n_channels=2))
    assert nch == 2 and rate == 16000 and np.array_equal(st, s2)


def test_multimodal_real_decode_stages(ray_session):
    ids = np.arange(15, dtype=np.int64)
    bmp = rd.from_arrow(multimodal.synthesize_media_batch(ids, "bmp"))
    out = (multimodal.image_stats(bmp).to_pandas()
           .sort_values("item_id").reset_index(drop=True))
    for i in ids:
        px = multimodal.synthetic_image_pixels(i).astype(np.float64)
        assert out.loc[i, "width"] == px.shape[1]
        assert out.loc[i, "height"] == px.shape[0]
        assert abs(out.loc[i, "mean_r"] - round(px[:, :, 0].mean(), 6)) < 1e-9
    wav = rd.from_arrow(multimodal.synthesize_media_batch(ids, "wav"))
    aout = (multimodal.audio_stats(wav).to_pandas()
            .sort_values("item_id").reset_index(drop=True))
    for i in ids:
        s = multimodal.synthetic_wav_samples(i).astype(np.int64)
        assert aout.loc[i, "sample_rate"] == 8000
        assert aout.loc[i, "n_samples"] == len(s)
        assert aout.loc[i, "peak"] == int(np.abs(s).max())
        assert abs(aout.loc[i, "rms"]
                   - round(float(np.sqrt((s * s).mean())), 6)) < 1e-9
    # feature extractor takes the REAL decode branch on BMP payloads:
    # a constant-color image pools to a constant luma grid
    flat = np.full((10, 12, 3), 100, dtype=np.uint8)
    ex = multimodal.ImageFeatureExtractor(dim=16, strict=True)
    t = ex(pa.table({"item_id": pa.array([0], type=pa.int64()),
                     "payload": pa.array([multimodal.encode_bmp(flat)],
                                         type=pa.binary())}))
    f = np.asarray(t["feature"][0].as_py())
    assert np.allclose(f[:16], f[0]) and -1.0 < f[0] < 0.0
    # frame sampler decodes WAV: per-frame rms over the actual samples
    fr = multimodal.AudioFrameSampler(frames_per_item=2, strict=True)
    s = multimodal.synthetic_wav_samples(3)
    ft = fr(pa.table({"item_id": pa.array([3], type=pa.int64()),
                      "payload": pa.array([multimodal.encode_wav(s)],
                                          type=pa.binary())}))
    half = s[: len(s) // 2].astype(np.int64)
    assert abs(ft["rms"][0].as_py()
               - float(np.sqrt((half * half).mean()))) < 1e-9


def test_multimodal_strict_raises(ray_session):
    ex = multimodal.ImageFeatureExtractor(strict=True)
    if ex.decoder is None:
        with pytest.raises(NotImplementedError):
            ex(multimodal.synthesize_binary_items(2))


def test_cluster_assignments_sparse_ids(ray_session):
    """Arbitrary (sparse / 64-bit) doc ids: the label map is O(#paired
    ids), never O(max id) — huge ids must not allocate huge arrays."""
    import ray.data as rd

    from graph_data_science_ray.functions.dedup import cluster_assignments
    big = 10**15
    ids = np.array([5, 42, big, big + 7, big + 9], dtype=np.int64)
    docs = rd.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = cluster_assignments(
        docs,
        np.array([5, big + 7], dtype=np.int64),
        np.array([big, big + 9], dtype=np.int64)).to_pandas()
    out = out.set_index("doc_id")
    assert out.loc[5, "cluster_id"] == 5 and bool(out.loc[5, "keep"])
    assert out.loc[big, "cluster_id"] == 5 and not bool(out.loc[big, "keep"])
    assert out.loc[big + 9, "cluster_id"] == big + 7
    assert out.loc[42, "cluster_id"] == 42 and bool(out.loc[42, "keep"])
