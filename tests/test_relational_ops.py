"""functions/relational.py: grouped top-k, exact quantiles, hash
sampling, KMV distinct sketch, band join, text normalization — each
checked against a DuckDB replay on small inputs (the same contract the
sf0.01 oracles enforce), plus partitioning edge cases (many tiny
blocks, groups split across blocks, fewer rows than k)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graph_data_science_ray.functions.relational import (
    band_join_count, grouped_topk, group_quantiles, hash_sample,
    kmv_distinct, normalize_text)


def _ds(df: pd.DataFrame, blocks: int = 5) -> rd.Dataset:
    # many tiny blocks so every partial/combiner path is exercised
    return rd.from_pandas([d for _, d in
                           df.groupby(np.arange(len(df)) % blocks)])


@pytest.fixture(scope="module")
def money_df():
    rng = np.random.default_rng(11)
    n = 400
    return pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "grp": rng.integers(0, 7, n).astype(np.int64),
        "val": np.round(rng.uniform(-50, 50, n), 2),
    })


def test_grouped_topk_matches_row_number(money_df):
    out = (grouped_topk(_ds(money_df), ["grp"], "val", 3, ["id"])
           .to_pandas().sort_values(["grp", "rk"]).reset_index(drop=True))
    ref = duckdb.sql("""
        WITH r AS (SELECT grp, id, val,
                          ROW_NUMBER() OVER (PARTITION BY grp
                              ORDER BY val DESC, id) AS rk
                   FROM money_df)
        SELECT grp, rk, id, val FROM r WHERE rk <= 3
        ORDER BY grp, rk""").df()
    assert np.array_equal(out["id"].to_numpy(), ref["id"].to_numpy())
    assert np.array_equal(out["val"].to_numpy(), ref["val"].to_numpy())
    assert np.array_equal(out["rk"].to_numpy(np.int64),
                          ref["rk"].to_numpy(np.int64))


def test_grouped_topk_group_smaller_than_k():
    df = pd.DataFrame({"grp": [0, 0, 1], "id": [1, 2, 3],
                       "val": [5.0, 5.0, 1.0]})
    out = (grouped_topk(_ds(df, 2), ["grp"], "val", 10, ["id"])
           .to_pandas().sort_values(["grp", "rk"]).reset_index(drop=True))
    # ties on val resolve to ascending id
    assert out["id"].tolist() == [1, 2, 3]
    assert out["rk"].tolist() == [1, 2, 1]


def test_group_quantiles_percentile_disc(money_df):
    qs = [0.25, 0.5, 0.75, 0.9]
    out = (group_quantiles(_ds(money_df), ["grp"], "val", qs)
           .to_pandas().sort_values("grp").reset_index(drop=True))
    ref = duckdb.sql("""
        WITH c AS (SELECT grp, CAST(ROUND(val * 100) AS BIGINT) AS v
                   FROM money_df)
        SELECT grp,
               CAST(quantile_disc(v, 0.25) AS DOUBLE) / 100 AS q25,
               CAST(quantile_disc(v, 0.5)  AS DOUBLE) / 100 AS q50,
               CAST(quantile_disc(v, 0.75) AS DOUBLE) / 100 AS q75,
               CAST(quantile_disc(v, 0.9)  AS DOUBLE) / 100 AS q90
        FROM c GROUP BY grp ORDER BY grp""").df()
    for c in ("q25", "q50", "q75", "q90"):
        assert np.array_equal(out[c].to_numpy(), ref[c].to_numpy()), c


def test_group_quantiles_singleton_group():
    df = pd.DataFrame({"grp": [0, 1, 1], "val": [7.25, 1.0, 2.0]})
    out = (group_quantiles(_ds(df, 2), ["grp"], "val", [0.0, 0.5, 1.0])
           .to_pandas().sort_values("grp").reset_index(drop=True))
    assert out.loc[0, ["q00", "q50", "q100"]].tolist() == [7.25] * 3
    assert out.loc[1, ["q00", "q50", "q100"]].tolist() == [1.0, 1.0, 2.0]


def test_hash_sample_deterministic_and_unbiased(money_df):
    ds = _ds(money_df)
    a = hash_sample(ds, ("id", "grp"), 0.3, seed=5).to_pandas()
    b = hash_sample(ds, ("id", "grp"), 0.3, seed=5).to_pandas()
    assert sorted(a["id"]) == sorted(b["id"])          # deterministic
    assert 0.15 < len(a) / len(money_df) < 0.45        # ~fraction
    c = hash_sample(ds, ("id", "grp"), 0.3, seed=6).to_pandas()
    assert sorted(a["id"]) != sorted(c["id"])          # seed matters
    # subset property: smaller fraction is a subset of the larger
    d = hash_sample(ds, ("id", "grp"), 0.1, seed=5).to_pandas()
    assert set(d["id"]) <= set(a["id"])


def test_kmv_exact_below_k_and_estimate_above():
    n = 3000
    df = pd.DataFrame({
        "grp": np.r_[np.zeros(n, np.int64), np.ones(40, np.int64)],
        "val": np.r_[np.arange(n) % 1000, np.arange(40) % 7],
    }).astype(np.int64)
    out = (kmv_distinct(_ds(df, 7), "grp", "val", k=128, seed=3)
           .to_pandas().sort_values("grp").reset_index(drop=True))
    # group 1: 7 distinct values < k -> exact count, sentinel hash
    assert out.loc[1, "n_hashes"] == 7
    assert out.loc[1, "kth_hash"] == -1
    assert out.loc[1, "distinct_est"] == 7.0
    # group 0: 1000 distinct, estimate within 25% (k=128)
    assert out.loc[0, "n_hashes"] == 128
    assert out.loc[0, "kth_hash"] > 0
    assert 750 < out.loc[0, "distinct_est"] < 1250


def test_kmv_partition_invariance():
    df = pd.DataFrame({"grp": np.zeros(500, np.int64),
                       "val": np.arange(500, dtype=np.int64)})
    a = kmv_distinct(_ds(df, 2), "grp", "val", k=64).to_pandas()
    b = kmv_distinct(_ds(df, 13), "grp", "val", k=64).to_pandas()
    assert a["kth_hash"].tolist() == b["kth_hash"].tolist()
    assert a["distinct_est"].tolist() == b["distinct_est"].tolist()


def test_band_join_matches_between_self_join(money_df):
    out = (band_join_count(_ds(money_df), "id", "val", band_cents=150)
           .to_pandas().sort_values("id").reset_index(drop=True))
    ref = duckdb.sql("""
        WITH c AS (SELECT id, CAST(ROUND(val * 100) AS BIGINT) AS v
                   FROM money_df)
        SELECT a.id, CAST(COUNT(b.id) AS BIGINT) AS n_within
        FROM c a LEFT JOIN c b
          ON b.id <> a.id AND b.v BETWEEN a.v - 150 AND a.v + 150
        GROUP BY a.id ORDER BY a.id""").df()
    assert len(out) == len(money_df)
    assert np.array_equal(out["n_within"].to_numpy(),
                          ref["n_within"].to_numpy())


def test_band_join_window_boundary():
    # partners exactly band apart and exactly band+1 apart, straddling
    # a floor(v/band) window edge
    df = pd.DataFrame({"id": [1, 2, 3],
                       "val": [0.99, 1.99, 3.00]})
    out = (band_join_count(_ds(df, 3), "id", "val", band_cents=100)
           .to_pandas().sort_values("id").reset_index(drop=True))
    # |99-199|=100 <= 100 pairs (1,2); |199-300|=101 > 100
    assert out["n_within"].tolist() == [1, 1, 0]


def test_normalize_text_matches_duckdb():
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["  Hello\t\tWORLD \n", "a  b   c", "", "MiXeD case"],
    })
    out = (normalize_text(_ds(df, 2)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    ref = duckdb.sql(r"""
        WITH n AS (SELECT doc_id,
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g'),
                        ' ') AS norm_text
                   FROM df)
        SELECT doc_id, norm_text,
               CAST(length(norm_text) AS BIGINT) AS n_chars_norm
        FROM n ORDER BY doc_id""").df()
    assert out["norm_text"].tolist() == ref["norm_text"].tolist()
    assert out["n_chars_norm"].tolist() == ref["n_chars_norm"].tolist()


def test_inverted_index_matches_duckdb():
    import duckdb
    from graph_data_science_ray.functions.text import inverted_index
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the cat sat", "THE the dog", "bird", "cat CAT cat",
                 "", "dog bird the"],
    })
    out = (inverted_index(_ds(df, 3)).to_pandas()
           .sort_values("token").reset_index(drop=True))
    ref = duckdb.sql("""
        WITH raw AS (SELECT doc_id,
                     UNNEST(regexp_extract_all(lower(text),
                            '[a-z0-9_'']+')) AS token FROM df),
        t AS (SELECT DISTINCT doc_id, token FROM raw)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
                   AS postings
        FROM t GROUP BY token ORDER BY token""").df()
    assert out["token"].tolist() == ref["token"].tolist()
    assert out["df"].tolist() == ref["df"].tolist()
    assert out["postings"].tolist() == ref["postings"].tolist()
    # spot-check: 'the' appears in docs 0,1,5 once each regardless of
    # per-doc multiplicity
    the = out[out["token"] == "the"].iloc[0]
    assert the["postings"] == "0,1,5" and the["df"] == 3


def test_stratified_sample_fixed_size_per_group():
    from graph_data_science_ray.functions.relational import (
        _value_hash63, grouped_topk)
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "grp": rng.integers(0, 4, 200).astype(np.int64),
        "key": np.arange(200, dtype=np.int64),
    })
    df["h"] = _value_hash63(df["key"].to_numpy(), 99)
    out = (grouped_topk(_ds(df, 5), ["grp"], "h", 7, ["key"],
                        ascending=True).to_pandas())
    sizes = out.groupby("grp").size()
    assert (sizes == 7).all()
    # per group: exactly the 7 smallest hashes, partition-invariant
    for g, sub in out.groupby("grp"):
        want = np.sort(df.loc[df["grp"] == g, "h"].to_numpy())[:7]
        assert np.array_equal(np.sort(sub["h"].to_numpy()), want)


def test_int_field_extracts_and_sentinels():
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.text import int_field
    df = pd.DataFrame({
        "id": [1, 2, 3],
        "props": ['{"k": 42}', '{"k": 0}', 'no match here'],
    })
    out = (int_field(rd.from_pandas(df), "props", '"k": (?P<v>\\d+)')
           .to_pandas().sort_values("id"))
    assert out["k"].tolist() == [42, 0, -1]
    assert "props" not in out.columns and "id" in out.columns


def test_profile_columns_with_nulls():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.relational import \
        profile_columns
    df = pd.DataFrame({
        "a": [1.0, None, 3.0, -2.0, None, 8.5],
        "b": [None] * 6,
    })
    parts = [df.iloc[:3], df.iloc[3:]]
    out = profile_columns(rd.from_pandas(parts), ["a", "b"])
    row_a = out[out["column"] == "a"].iloc[0]
    assert row_a["n"] == 6 and row_a["n_null"] == 2
    assert row_a["min_v"] == -2.0 and row_a["max_v"] == 8.5
    row_b = out[out["column"] == "b"].iloc[0]
    assert row_b["n"] == 6 and row_b["n_null"] == 6
    assert np.isnan(row_b["min_v"])


def test_degree_assortativity_star_is_negative():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.graph_stats import \
        degree_assortativity
    # star: hub 0 - leaves 1..10; perfect disassortativity = -1
    edges = pd.DataFrame({"s": np.zeros(10, dtype=np.int64),
                          "p": np.arange(1, 11, dtype=np.int64)})
    r = degree_assortativity(rd.from_pandas(edges), "s", "p")
    assert r["m2"] == 20
    assert abs(r["assortativity"] - (-1.0)) < 1e-12


def test_k_core_bipartite_cascade():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.graph_stats import \
        k_core_bipartite
    # K(2,2) between s{0,1} x p{0,1} survives k=2; s2/p2 pendant
    # chain peels in a cascade: p2 (deg 1) drops first, then s2
    # (deg 2 -> 1 after losing p2)
    edges = pd.DataFrame({
        "s": [0, 0, 1, 1, 2, 2],
        "p": [0, 1, 0, 1, 0, 2],
    })
    surv = (k_core_bipartite(rd.from_pandas(edges), "s", "p", k=2)
            .to_pandas().sort_values(["s", "p"]).reset_index(drop=True))
    assert sorted(surv["s"].unique()) == [0, 1]
    assert sorted(surv["p"].unique()) == [0, 1]
    assert len(surv) == 4


def test_k_core_bipartite_all_peeled():
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.graph_stats import \
        k_core_bipartite
    edges = pd.DataFrame({"s": [0, 1, 2], "p": [0, 1, 2]})
    surv = k_core_bipartite(rd.from_pandas(edges), "s", "p", k=2)
    assert surv.count() == 0


def test_integer_islands_merges_bucket_boundaries():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.relational import \
        integer_islands
    # one giant island 0..999 plus two singletons; many buckets force
    # the giant island to span every bucket edge (driver merge path)
    vals = np.concatenate([np.arange(1000), [2000], [3000],
                           np.arange(500)])  # dupes must not matter
    df = pd.DataFrame({"k": vals.astype(np.int64)})
    parts = [d for _, d in df.groupby(np.arange(len(df)) % 6)]
    out = integer_islands(rd.from_pandas(parts), "k", num_buckets=16)
    assert out["island_start"].tolist() == [0, 2000, 3000]
    assert out["island_end"].tolist() == [999, 2000, 3000]
    assert out["n"].tolist() == [1000, 1, 1]


def test_integer_islands_gaps():
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from graph_data_science_ray.functions.relational import \
        integer_islands
    rng = np.random.default_rng(2)
    vals = np.unique(rng.integers(0, 300, 150)).astype(np.int64)
    df = pd.DataFrame({"k": rng.permutation(vals)})
    parts = [d for _, d in df.groupby(np.arange(len(df)) % 4)]
    out = integer_islands(rd.from_pandas(parts), "k", num_buckets=8)
    # reference islands
    s = np.r_[True, np.diff(vals) > 1]
    starts = vals[s]
    ends = vals[np.r_[s[1:], True]]
    assert out["island_start"].tolist() == starts.tolist()
    assert out["island_end"].tolist() == ends.tolist()
