"""Generic event-stream operators (stages/events.py) vs brute-force
pandas references on seeded random frames — including key/timestamp
regimes the testdata never hits (huge key ids, dense ts ties)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _rand_events(rng, n, n_keys, span_us, key_base=0):
    return pd.DataFrame({
        "k": rng.integers(key_base, key_base + n_keys, n).astype(np.int64),
        "ts": rng.integers(0, span_us, n).astype(np.int64),
        "rid": np.arange(n, dtype=np.int64) * 7 + 3,
    })


def _brute_asof(left, right):
    out = []
    for _, row in left.iterrows():
        cand = right[(right["k"] == row["k"]) & (right["ts"] <= row["ts"])]
        if len(cand):
            best_ts = cand["ts"].max()
            out.append(cand[cand["ts"] == best_ts]["rid"].max())
        else:
            out.append(None)
    return out


def _brute_window_pairs(df, window_us):
    rows = []
    recs = df.to_dict("records")
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            a, b = recs[i], recs[j]
            if a["k"] != b["k"]:
                continue
            if abs(a["ts"] - b["ts"]) <= window_us:
                lo, hi = sorted((a["rid"], b["rid"]))
                rows.append((lo, hi, abs(a["ts"] - b["ts"]) // 1_000_000))
    return sorted(rows)


@pytest.mark.parametrize("seed,key_base", [(1, 0), (2, 10 ** 17), (3, 0)])
def test_asof_join_vs_brute(seed, key_base, ray_session):
    import ray.data

    from mhray.stages.events import asof_join

    rng = np.random.default_rng(seed)
    left = _rand_events(rng, 200, 9, 10 ** 9, key_base)
    right = _rand_events(rng, 60, 9, 10 ** 9, key_base)
    got = asof_join(
        ray.data.from_pandas(left.rename(columns={"rid": "lid"})),
        ray.data.from_pandas(right),
        "k", "ts", "ts", "rid", carry_cols=("lid",), out_col="m",
        num_parts=4,
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    expect = _brute_asof(left, right)
    got_map = dict(zip(got["lid"], got["m"]))
    for lid, exp in zip(left["rid"], expect):
        g = got_map[lid]
        if exp is None:
            assert pd.isna(g), lid
        else:
            assert g == exp, (lid, g, exp)


@pytest.mark.parametrize("seed,n_keys,span", [
    (4, 5, 10 ** 8),            # dense ts ties
    (5, 50, 10 ** 13),          # wide span -> chunked banding regime
    (6, 3, 100),                # everything within every window
])
def test_window_self_join_vs_brute(seed, n_keys, span, ray_session):
    import ray.data

    from mhray.stages.events import window_self_join

    rng = np.random.default_rng(seed)
    df = _rand_events(rng, 150, n_keys, span)
    window_us = max(span // 4, 1)
    got = window_self_join(ray.data.from_pandas(df), "k", "ts", "rid",
                           window_us, num_parts=4).to_pandas()
    got_rows = sorted(map(tuple, got[["lo", "hi", "gap_s"]].to_numpy()))
    assert got_rows == _brute_window_pairs(df, window_us)


def test_window_self_join_partition_invariant(ray_session):
    """The pair set must not depend on how keys land in partitions (or
    how partitions split into chunk bands)."""
    import ray.data

    from mhray.stages.events import window_self_join

    rng = np.random.default_rng(7)
    df = _rand_events(rng, 300, 40, 10 ** 10)
    key = ["lo", "hi", "gap_s"]
    base = window_self_join(ray.data.from_pandas(df), "k", "ts", "rid",
                            10 ** 9, num_parts=2).to_pandas()
    alt = window_self_join(ray.data.from_pandas(df), "k", "ts", "rid",
                           10 ** 9, num_parts=7).to_pandas()
    assert sorted(map(tuple, base[key].to_numpy())) == \
        sorted(map(tuple, alt[key].to_numpy()))


def test_gap_stats_vs_brute(ray_session):
    import ray.data

    from mhray.stages.events import gap_stats

    rng = np.random.default_rng(8)
    df = _rand_events(rng, 400, 12, 10 ** 12)
    got = gap_stats(ray.data.from_pandas(df), "k", "ts",
                    num_parts=4).to_pandas().set_index("k")
    for k, grp in df.groupby("k"):
        ts = np.sort(grp["ts"].to_numpy())
        assert got.loc[k, "n_gaps"] == len(ts) - 1
        assert got.loc[k, "total_gap_us"] == int(ts[-1] - ts[0])


def _brute_range_count(df, window_us):
    out = {}
    for _, row in df.iterrows():
        n = ((df["k"] == row["k"]) & (df["ts"] <= row["ts"])
             & (df["ts"] >= row["ts"] - window_us)).sum()
        out[int(row["rid"])] = int(n)
    return out


@pytest.mark.parametrize("seed,n_keys,span", [
    (8, 5, 10 ** 8),            # dense ts ties (peer rows)
    (9, 40, 10 ** 13),          # wide span -> chunked banding regime
    (10, 2, 50),                # everything inside every window
])
def test_range_window_count_vs_brute(seed, n_keys, span, ray_session):
    import ray.data

    from mhray.stages.events import range_window_count

    rng = np.random.default_rng(seed)
    df = _rand_events(rng, 180, n_keys, span)
    window_us = max(span // 4, 1)
    got = range_window_count(ray.data.from_pandas(df), "k", "ts", "rid",
                             window_us, num_parts=4).to_pandas()
    assert len(got) == len(df)
    expect = _brute_range_count(df, window_us)
    for rid, cnt in zip(got["rid"], got["w_cnt"]):
        assert int(cnt) == expect[int(rid)], rid


def test_funnel_counts_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.events import funnel_counts

    rng = np.random.default_rng(23)
    types = np.array(["a", "b", "c", "x"])
    n = 600
    users = rng.integers(0, 40, size=n).astype(np.int64)
    ts = rng.integers(0, 10_000, size=n).astype(np.int64)
    typ = types[rng.integers(0, 4, size=n)]
    steps = ("a", "b", "a")  # repeated step type exercises strict >

    def brute():
        counts = [0] * len(steps)
        for u in set(users.tolist()):
            m = users == u
            evs = sorted(zip(ts[m].tolist(), typ[m].tolist()))
            thr = -1
            for si, s in enumerate(steps):
                nxt = [t for t, e in evs if e == s and t > thr]
                if not nxt:
                    break
                thr = min(nxt)
                counts[si] += 1
        return counts

    want = brute()
    assert want[0] > want[-1] > 0  # the funnel actually narrows

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
        "event_type": pa.array(typ.tolist(), pa.string()),
    })).repartition(6)
    got_rows = funnel_counts(ds, "user_id", "ts", "event_type",
                             steps, num_parts=4).take_all()
    got = [r["n_keys"] for r in sorted(got_rows, key=lambda r: r["step"])]
    assert got == want


def test_ts_motif_search_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.events import ts_motif_search

    rng = np.random.default_rng(41)
    n = 500
    users = rng.integers(0, 12, size=n).astype(np.int64)
    ts = np.arange(n, dtype=np.int64)  # unique times
    vals = rng.normal(size=n)
    q = np.array([0.0, 2.0, 4.0, 2.0, 0.0])
    m = len(q)
    qz = (q - q.mean()) / q.std()

    def brute():
        out = []
        for u in set(users.tolist()):
            sel = users == u
            t_u, v_u = ts[sel], vals[sel]
            o = np.argsort(t_u)
            t_u, v_u = t_u[o], v_u[o]
            for i in range(len(v_u) - m + 1):
                w = v_u[i:i + m]
                sd = w.std()
                if sd > 0:
                    wz = (w - w.mean()) / sd
                    d = float(np.sqrt(((wz - qz) ** 2).sum()))
                else:
                    d = float(np.sqrt(2.0 * m))
                out.append((round(d, 9), int(u), int(t_u[i])))
        out.sort()
        return [(u, t, d) for d, u, t in out[:7]]

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })).repartition(5)
    got = [(r["key"], r["start_ts"], r["dist"])
           for r in ts_motif_search(ds, "user_id", "ts", "value", q,
                                    top_k=7, num_parts=3).take_all()]
    want = brute()
    assert [(u, t) for u, t, _ in got] == [(u, t) for u, t, _ in want]
    assert np.allclose([d for *_, d in got], [d for *_, d in want],
                       atol=1e-9)


def test_funnel_missing_step_type_partition(ray_session):
    """A step type absent from a partition (or the whole corpus) must
    count zero conversions, not crash the composite searchsorted."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mhray.stages.events import funnel_counts

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b"], pa.string()),
    }))
    rows = funnel_counts(ds, "user_id", "ts", "event_type",
                         ("a", "zzz", "b"), num_parts=2).take_all()
    got = {r["step"]: r["n_keys"] for r in rows}
    assert got == {1: 2, 2: 0, 3: 0}


def test_grouped_mode_nullable_numeric_values(ray_session):
    """grouped_mode must handle numeric value columns containing nulls
    (they become sortable NaN via to_numpy, not an object array that
    makes np.lexsort raise) and string value columns on the same code
    path split."""
    import ray.data

    from mhray.rayutil import grouped_mode

    t = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "v": pa.array([5, 5, None, None, 7, None], pa.int64()),
    })
    out = grouped_mode(ray.data.from_arrow(t), "k", "v", 2,
                       "k", "mode_v", "n").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3]
    # k=1: 5 wins (count 2); k=2: 7 vs null tie -> 7 sorts before NaN;
    # k=3: only a null value -> the null itself is the mode
    assert out["mode_v"].tolist()[0] == 5
    assert out["mode_v"].tolist()[1] == 7
    assert out["n"].tolist() == [2, 1, 1]

    s = pa.table({
        "k": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "v": pa.array(["b", "a", "a", None, "z", None], pa.string()),
    })
    sout = grouped_mode(ray.data.from_arrow(s), "k", "v", 2,
                        "k", "mode_v", "n").to_pandas()
    sout = sout.sort_values("k").reset_index(drop=True)
    # k=1: "a" (count 2); k=2: "z" vs null tie -> non-null sorts
    # first; k=3: only a null value -> the null itself is the mode
    assert sout["mode_v"].tolist()[:2] == ["a", "z"]
    assert sout["mode_v"].isna().tolist() == [False, False, True]
    assert sout["n"].tolist() == [2, 1, 1]
