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
