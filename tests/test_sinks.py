"""sources/sinks.py: resumable hive-partitioned parquet writes —
full write, crash-partial cleanup, resume-skip of finished
partitions."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from graph_data_science_ray.sources.sinks import (finished_partitions,
                                                  write_partitioned)


def _df(n=90):
    return pd.DataFrame({
        "day": np.arange(n) % 3,       # partitions 0,1,2
        "x": np.arange(n, dtype=np.int64),
    })


def _read_all(path):
    return (pq.read_table(path).to_pandas()
            .sort_values("x").reset_index(drop=True))


def test_write_partitioned_full(tmp_path):
    out = str(tmp_path / "t1")
    res = write_partitioned(rd.from_pandas(_df()), out, "day")
    assert res["written"] == ["0", "1", "2"] and res["skipped"] == []
    assert finished_partitions(out, "day") == {"0", "1", "2"}
    got = _read_all(out)
    assert len(got) == 90
    assert sorted(got["x"]) == list(range(90))


def test_resume_skips_done_and_cleans_partial(tmp_path):
    out = str(tmp_path / "t2")
    write_partitioned(rd.from_pandas(_df()), out, "day")

    # simulate a crashed later run: partition 1 lost its marker and
    # holds partial garbage; partition 2 is gone entirely
    os.remove(os.path.join(out, "day=1", "_DONE"))
    extra = pd.DataFrame({"x": np.array([9999], dtype=np.int64)})
    extra.to_parquet(os.path.join(out, "day=1", "garbage.parquet"))
    shutil.rmtree(os.path.join(out, "day=2"))

    res = write_partitioned(rd.from_pandas(_df()), out, "day")
    assert res["skipped"] == ["0"]
    assert sorted(res["written"]) == ["1", "2"]
    got = _read_all(out)
    # no duplicated rows, no garbage survivor
    assert len(got) == 90
    assert 9999 not in set(got["x"])
    assert finished_partitions(out, "day") == {"0", "1", "2"}


def test_resume_false_overwrites(tmp_path):
    out = str(tmp_path / "t3")
    write_partitioned(rd.from_pandas(_df()), out, "day")
    res = write_partitioned(rd.from_pandas(_df(30)), out, "day",
                            resume=False)
    assert sorted(res["written"]) == ["0", "1", "2"]
    assert len(_read_all(out)) == 30


def test_training_data_prep_end_to_end(tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd
    from graph_data_science_ray.pipelines.prep import training_data_prep

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    out = str(tmp_path / "prep")
    r = training_data_prep(docs, out_dir=out, sample_fraction=0.8)
    c = r["counts"]
    assert c["input"] >= c["dedup"] >= c["quality"] >= c["lang"] \
        >= c["sample"] > 0
    written = pq.read_table(out)
    assert written.num_rows == c["sample"]
    assert set(written.column_names) >= {"doc_id", "text", "lang"}
    # resume: second run writes nothing
    r2 = training_data_prep(docs, out_dir=out, sample_fraction=0.8)
    assert r2["sink"]["written"] == []
    assert pq.read_table(out).num_rows == c["sample"]


def test_resume_with_uri_encoded_partition_values(tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd
    out = str(tmp_path / "enc")
    df = pd.DataFrame({"lang": ["a b", "a b", "plain"],
                       "x": np.arange(3, dtype=np.int64)})
    write_partitioned(rd.from_pandas(df), out, "lang")
    assert finished_partitions(out, "lang") == {"a b", "plain"}
    # resume must be a true no-op — the hive dir is 'lang=a%20b'
    res = write_partitioned(rd.from_pandas(df), out, "lang")
    assert res["written"] == [] and sorted(res["skipped"]) == \
        ["a b", "plain"]
    assert pq.read_table(out).num_rows == 3
