"""Query-vs-index incremental mode (AbstractMatchSearch.findMatches,
toSelf=false): matching new records against a stored sketch index must
equal the union-corpus self-join restricted to (new x old) pairs."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _cfg():
    from mhray.config import PRESETS

    return PRESETS["captions"]


def _split(small_corpus, n=400):
    imgs = pq.read_table(small_corpus["images"])
    captions = imgs.column("caption").to_pylist()[:n]
    ids = np.arange(len(captions))
    new_mask = ids % 4 == 0
    return captions, ids, new_mask


def _docs_ds(captions, ids):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(captions),
    }))


def test_find_matches_equals_restricted_self_join(ray_session, small_corpus):
    from mhray.stages.dedup import docs_as_images, minhash_text_pairs
    from mhray.stages.incremental import find_matches
    from mhray.stages.sketch import sketch_dataset

    cfg = _cfg()
    captions, ids, new_mask = _split(small_corpus)

    # self-join over the union corpus, restricted to cross pairs
    union = _docs_ds(captions, ids)
    self_pairs = minhash_text_pairs(union, cfg).take_all()
    expected = {frozenset((r["lo"], r["hi"])) for r in self_pairs
                if new_mask[r["lo"]] != new_mask[r["hi"]]}

    old_ds = _docs_ds([c for c, m in zip(captions, new_mask) if not m],
                      ids[~new_mask])
    new_ds = _docs_ds([c for c, m in zip(captions, new_mask) if m],
                      ids[new_mask])
    index = sketch_dataset(docs_as_images(old_ds), cfg)
    got_rows = find_matches(docs_as_images(new_ds), index, cfg).take_all()
    got = {frozenset((r["lo"], r["hi"])) for r in got_rows}

    assert expected, "no cross pairs in fixture; test is vacuous"
    assert got == expected, (len(got), len(expected))
    # orientation: lo is always the query (new) side, hi the index side
    for r in got_rows:
        assert new_mask[r["lo"]] and not new_mask[r["hi"]]


def test_find_matches_from_checkpoint_dir(ray_session, small_corpus,
                                          tmp_path):
    """The stored s1_sketches checkpoint of a previous run works as the
    index side without re-sketching (the -q to-files shape)."""
    from mhray.checkpoint import stage_checkpoint
    from mhray.stages.dedup import docs_as_images
    from mhray.stages.incremental import find_matches
    from mhray.stages.sketch import sketch_dataset

    cfg = _cfg()
    captions, ids, new_mask = _split(small_corpus, n=200)
    old_ds = _docs_ds([c for c, m in zip(captions, new_mask) if not m],
                      ids[~new_mask])
    new_ds = _docs_ds([c for c, m in zip(captions, new_mask) if m],
                      ids[new_mask])

    out = str(tmp_path / "indexrun")
    stage_checkpoint(
        "s1_sketches", out,
        lambda: sketch_dataset(docs_as_images(old_ds), cfg), cfg)

    from_dir = find_matches(docs_as_images(new_ds),
                            out + "/s1_sketches", cfg).take_all()
    from_ds = find_matches(docs_as_images(new_ds),
                           sketch_dataset(docs_as_images(old_ds), cfg),
                           cfg).take_all()
    key = lambda rows: sorted((r["lo"], r["hi"]) for r in rows)
    assert key(from_dir) == key(from_ds)
    assert from_dir, "no matches found from checkpoint index"


def test_index_rep_collapse_parity(ray_session, small_corpus):
    """An index carrying rep_iid (the s1 checkpoint shape) must yield
    EXACTLY the pairs+metrics of the same index without rep_iid — the
    rep-collapse exchange + member expansion is a pure optimization."""
    import ray.data

    from mhray.stages.dedup import docs_as_images
    from mhray.stages.incremental import find_matches
    from mhray.stages.sketch import sketch_dataset

    cfg = _cfg()
    captions, ids, new_mask = _split(small_corpus)
    # duplicate some OLD captions verbatim so index-side rep groups
    # have real multi-member cliques to expand
    old_caps = [c for c, m in zip(captions, new_mask) if not m]
    old_ids = list(ids[~new_mask])
    extra_base = max(ids) + 1
    for j, c in enumerate(old_caps[:40]):
        old_caps.append(c)
        old_ids.append(extra_base + j)
    old_ds = _docs_ds(old_caps, np.array(old_ids, np.int64))
    new_ds = _docs_ds([c for c, m in zip(captions, new_mask) if m],
                      ids[new_mask])

    plain = sketch_dataset(docs_as_images(old_ds), cfg).materialize()

    # rep_iid = min iid per caption_hash, computed exactly (driver side
    # — the fixture is tiny)
    tbl = pa.concat_tables([b for b in plain.iter_batches(
        batch_format="pyarrow")], promote_options="default")
    ch = np.asarray(tbl.column("caption_hash"), np.int64)
    iid = np.asarray(tbl.column("iid"), np.int64)
    order = np.lexsort((iid, ch))
    rep = np.empty(len(ch), np.int64)
    ch_s, iid_s = ch[order], iid[order]
    first = np.ones(len(ch_s), bool)
    first[1:] = np.diff(ch_s) != 0
    grp = np.cumsum(first) - 1
    rep[order] = iid_s[np.flatnonzero(first)][grp]
    with_rep = ray.data.from_arrow(
        tbl.append_column("rep_iid", pa.array(rep, pa.int64())))

    def canon(rows):
        return sorted((r["lo"], r["hi"], r["shared_slots"],
                       round(r["score"], 12)) for r in rows)

    got_plain = canon(find_matches(docs_as_images(new_ds), plain,
                                   cfg).take_all())
    got_rep = canon(find_matches(docs_as_images(new_ds), with_rep,
                                 cfg).take_all())
    assert got_plain, "no pairs in fixture; test is vacuous"
    assert got_rep == got_plain, (len(got_rep), len(got_plain))
