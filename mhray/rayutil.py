"""Ray Data robustness utilities.

Ray's sort-based groupby/aggregate emits schema-less EMPTY blocks for
empty partitions; map_batches UDFs are skipped for them, so they
survive into downstream hash joins, whose per-partition pyarrow join
then fails with 'No match ... for key field'. ``safe_join`` scrubs
both sides:

- ``repartition(n)`` coalesces blocks, absorbing schema-less empties
  into typed neighbors (cheap: no key shuffle);
- when a side could be ENTIRELY empty (e.g. zero candidate pairs), a
  typed empty block is unioned in so the join can still resolve the
  schema.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def binary_flat_view(col, item_bytes: int, dtype: str):
    """Whole-column view of a binary column of fixed-width packed
    items: ``(flat, offs)`` where ``flat`` is the concatenated data
    viewed as ``dtype`` and ``offs[i]:offs[i+1]`` (in units of
    ``item_bytes``) spans element ``i``. Zero-copy when the Arrow
    buffer slice stays item-aligned; falls back to a per-row copy
    otherwise (shouldn't happen: blobs are whole items). Shared by
    the token-blob (8 B) and cluster-member (16 B) hot paths so the
    offsets/slicing logic lives in exactly one place."""
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # offsets buffer width depends on the Arrow type: binary stores
    # int32 offsets, large_binary int64. Anything else (a list type, a
    # fixed-size binary with no offsets buffer) must fail loudly here
    # rather than silently parse garbage offsets.
    if pa.types.is_binary(col.type):
        off_dtype = np.int32
    elif pa.types.is_large_binary(col.type):
        off_dtype = np.int64
    else:
        raise TypeError(
            f"binary_flat_view: expected binary/large_binary column, "
            f"got {col.type}")
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset:col.offset + len(col) + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    flat = data[offs[0]:offs[-1]]
    if len(flat) % item_bytes or (offs % item_bytes).any():
        blobs = col.to_pylist()
        lens = np.array([len(b) for b in blobs], np.int64)
        if (lens % item_bytes).any():
            # not a buffer-slice alignment quirk but corrupt data:
            # fail here with the cause, not downstream with a shape
            # mismatch between flat and offs
            raise ValueError(
                f"binary_flat_view: blob lengths not multiples of "
                f"{item_bytes} bytes (corrupt packed column)")
        off = np.zeros(len(blobs) + 1, np.int64)
        np.cumsum(lens // item_bytes, out=off[1:])
        flat = (np.concatenate(
            [np.frombuffer(b, dtype=np.uint8) for b in blobs])
            if blobs else np.empty(0, np.uint8))
        return flat.view(dtype), off
    return flat.view(dtype), (offs - offs[0]) // item_bytes


def _broadcast_fits(side_ds, threshold_rows: int,
                    threshold_bytes: int = 512 * 1024 * 1024) -> bool:
    """Small side -> broadcast once via ray.put and look up per batch
    (no shuffle at all); large side -> union + partition merge. The
    cutoff weighs BYTES as well as rows: a wide binary payload
    (sketches at ~KBs/row) hits driver memory long before the row
    threshold does."""
    try:
        n_side = side_ds.count()
    except Exception:
        return False
    side_bytes = None
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(side_ds, MaterializedDataset):
            # O(1) from block metadata; on a lazy dataset size_bytes()
            # could execute the plan — skip there and let the row
            # threshold govern
            side_bytes = side_ds.size_bytes()
    except Exception:
        side_bytes = None
    return (n_side is not None and n_side <= threshold_rows
            and (side_bytes is None or side_bytes <= threshold_bytes))


def _prepare_broadcast_side(side_ds, side_key, payload_cols):
    """ONE driver fetch + key sort + ray.put of the side payload,
    reusable across several lookup stages. A zero-block side (an empty
    MaterializedDataset yields NO arrow refs, so there is no schema to
    read columns from) degrades to an empty key set — the lookup side
    already handles len(keys)==0 without touching the payloads."""
    import numpy as np

    import ray

    tables = [ray.get(r) for r in side_ds.to_arrow_refs()]
    # filter on KEY PRESENCE only (same guard as anti_join_ids): a
    # schema-less empty block means "no keys", and a keyless non-empty
    # block must not be null-promoted into the key column
    tables = [t for t in tables if side_key in t.schema.names]
    if not tables:
        return ray.put((np.empty(0, np.int64),
                        {c: None for c in payload_cols}))
    side_tbl = pa.concat_tables(tables, promote_options="default")
    keys = np.asarray(side_tbl.column(side_key), dtype=np.int64)
    order = np.argsort(keys)
    payloads = {c: side_tbl.column(c).take(pa.array(order, pa.int64()))
                .combine_chunks() for c in payload_cols}
    return ray.put((keys[order], payloads))


def _attach_broadcast(pairs_ds, key_col, side_ds, side_key, payload_cols,
                      out_suffix, how, pair_names, payload_types,
                      ref=None):
    import numpy as np

    import ray

    if ref is None:
        ref = _prepare_broadcast_side(side_ds, side_key, payload_cols)

    def lookup(batch: pa.Table) -> pa.Table:
        ks, pl = ray.get(ref)
        k = np.asarray(batch.column(key_col), dtype=np.int64)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, k), len(ks) - 1)
            found = ks[pos] == k
        else:
            pos = np.zeros(len(k), np.int64)
            found = np.zeros(len(k), bool)
        out = {}
        if how == "inner":
            keep = pa.array(found)
            for name in pair_names:
                out[name] = batch.column(name).filter(keep)
            idx = pa.array(pos[found], pa.int64())
            for c in payload_cols:
                out[f"{c}_{out_suffix}"] = (
                    pl[c].take(idx) if len(ks)
                    else pa.nulls(0, payload_types[c]))
        else:
            for name in pair_names:
                out[name] = batch.column(name)
            for c in payload_cols:
                if len(ks):
                    col = pl[c].take(pa.array(pos, pa.int64()))
                    col = pa.compute.if_else(
                        pa.array(found), col,
                        pa.nulls(len(k), payload_types[c]))
                else:
                    col = pa.nulls(len(k), payload_types[c])
                out[f"{c}_{out_suffix}"] = col
        return pa.table(out)

    return pairs_ds.map_batches(lookup, batch_format="pyarrow",
                                zero_copy_batch=True)


def scrub_blocks(ds, schema: pa.Schema | None = None, num_blocks: int = 8):
    """Remove schema-less empty blocks; optionally guarantee a typed
    schema even for an all-empty dataset: a typed empty block is
    unioned in AFTER the repartition (repartition of an ALL-empty
    dataset strips every block's schema, so it must come first) so a
    downstream join always sees at least one TYPED bundle — an
    all-empty candidate set otherwise fails the acero join with
    'no match for key field'."""
    # repartition FIRST (absorbs schema-less empties into typed
    # neighbors when any data exists), then union the typed empty so
    # it survives — repartition of an ALL-empty dataset strips the
    # schema from every block, so the union must come after.
    out = ds.repartition(num_blocks)
    if schema is not None:
        out = out.union(ray.data.from_arrow(schema.empty_table()))
    return out


def safe_join(left, right, join_type: str, num_partitions: int,
              on: tuple, right_on: tuple,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """Dataset.join with empty-block scrubbing on both sides.

    Both sides materialize and then REBUILD from their non-empty block
    refs (metadata-only — no block is fetched to the driver): any
    schema-less empty block that reaches the join operator breaks its
    key-schema resolution ('no match or multiple matches for key
    field'), and neither union order nor repartition can remove them
    from an all-empty dataset (repartition strips the schema from
    every block of a zero-row dataset). safe_join is only used on
    candidate-scale tables, so the barrier is cheap."""
    left = _nonempty_blocks(left, left_schema, num_partitions)
    right = _nonempty_blocks(right, right_schema, num_partitions)
    if join_type == "inner" and (left.count() == 0 or right.count() == 0):
        # Ray's join operator cannot execute with a zero-row side (its
        # hash partitions arrive schema-less at the acero join); an
        # inner join with an empty side is just an empty table with
        # the combined schema
        def _schema_of(ds, override):
            if override is not None:
                return override
            s = ds.schema()
            return getattr(s, "base_schema", s)

        ls = _schema_of(left, left_schema)
        rs = _schema_of(right, right_schema)
        fields = list(ls) + [f for f in rs if f.name not in ls.names]
        return ray.data.from_arrow(pa.schema(fields).empty_table())
    return left.join(right, join_type=join_type,
                     num_partitions=num_partitions, on=on, right_on=right_on)


def _nonempty_blocks(ds, schema: pa.Schema | None, num_blocks: int):
    """Materialize and rebuild from refs to non-empty blocks only;
    an all-empty dataset becomes one typed empty block (or stays
    as-is when no schema is supplied)."""
    mat = ds.materialize()
    refs = []
    try:
        for bundle in mat.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                if meta.num_rows is None or meta.num_rows > 0:
                    refs.append(ref)
    except AttributeError:  # internal API moved: fall back to scrubbing
        return scrub_blocks(mat, schema, num_blocks)
    if not refs:
        if schema is not None:
            return ray.data.from_arrow(schema.empty_table())
        return mat
    return ray.data.from_arrow_refs(refs)


def anti_join_ids(ds, ids_ds, key_col: str, ids_key: str | None = None,
                  num_parts: int = 16,
                  broadcast_threshold_rows: int = 2_000_000,
                  ds_schema: pa.Schema | None = None,
                  keep_matches: bool = False):
    """Drop rows of ``ds`` whose ``key_col`` appears in ``ids_ds`` —
    the distributed anti-semi-join (``keep_matches=True`` flips it to
    the SEMI-join: keep only matching rows). Small id sets broadcast
    (one ``ray.put``, searchsorted per batch, NO shuffle); above the
    threshold the standard tagged-union + hash-partition merge runs
    (one shuffle, no driver materialization)."""
    import numpy as np

    ids_key = ids_key or key_col

    try:
        n_ids = ids_ds.count()
    except Exception:
        n_ids = None
    if n_ids is not None and n_ids <= broadcast_threshold_rows:
        import ray

        tables = [ray.get(r) for r in
                  ids_ds.select_columns([ids_key]).to_arrow_refs()]
        # a zero-row id set can arrive as zero refs or schema-less
        # blocks — both mean "no keys", not a missing column
        tables = [t for t in tables if ids_key in t.schema.names]
        if tables:
            ids_tbl = pa.concat_tables(tables, promote_options="default")
            key_arr = np.unique(np.asarray(ids_tbl.column(ids_key),
                                           dtype=np.int64))
        else:
            key_arr = np.empty(0, np.int64)
        ref = ray.put(key_arr)

        def drop(batch: pa.Table) -> pa.Table:
            k = ray.get(ref)
            v = np.asarray(batch.column(key_col), dtype=np.int64)
            if len(k) == 0:
                return batch.slice(0, 0) if keep_matches else batch
            pos = np.minimum(np.searchsorted(k, v), len(k) - 1)
            hit = k[pos] == v
            return batch.filter(pa.array(hit if keep_matches else ~hit))

        return ds.map_batches(drop, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _schema(d) -> pa.Schema:
        s = d.schema()
        return getattr(s, "base_schema", s)

    schema = ds_schema if ds_schema is not None else _schema(ds)
    names = schema.names

    def tag_left(batch: pa.Table) -> pa.Table:
        from mhray.stages.candidates import _part_of

        key = np.asarray(batch.column(key_col), dtype=np.int64)
        cols = {n: batch.column(n) for n in names}
        cols["__part"] = pa.array(_part_of(key, num_parts), pa.int32())
        cols["__role"] = pa.array(np.zeros(len(key), np.int8), pa.int8())
        cols["__key"] = pa.array(key, pa.int64())
        return pa.table(cols)

    def tag_ids(batch: pa.Table) -> pa.Table:
        from mhray.stages.candidates import _part_of

        key = np.asarray(batch.column(ids_key), dtype=np.int64)
        n = len(key)
        cols = {nm: pa.nulls(n, schema.field(nm).type) for nm in names}
        cols["__part"] = pa.array(_part_of(key, num_parts), pa.int32())
        cols["__role"] = pa.array(np.ones(n, np.int8), pa.int8())
        cols["__key"] = pa.array(key, pa.int64())
        return pa.table(cols)

    tagged = ds.map_batches(tag_left, batch_format="pyarrow",
                            zero_copy_batch=True).union(
        ids_ds.select_columns([ids_key]).map_batches(
            tag_ids, batch_format="pyarrow", zero_copy_batch=True))

    def merge(part: pa.Table) -> pa.Table:
        role = np.asarray(part.column("__role"))
        keys = np.asarray(part.column("__key"), dtype=np.int64)
        block = np.unique(keys[role == 1])
        left = np.flatnonzero(role == 0)
        lk = keys[left]
        if len(block):
            pos = np.minimum(np.searchsorted(block, lk), len(block) - 1)
            hit = block[pos] == lk
            keep = left[hit if keep_matches else ~hit]
        else:
            keep = left[:0] if keep_matches else left
        idx = pa.array(keep, pa.int64())
        return pa.table({n: part.column(n).take(idx) for n in names})

    return tagged.groupby("__part", num_partitions=num_parts).map_groups(
        merge, batch_format="pyarrow")


def semi_join_ids(ds, ids_ds, key_col: str, ids_key: str | None = None,
                  num_parts: int = 16,
                  broadcast_threshold_rows: int = 2_000_000,
                  ds_schema: pa.Schema | None = None):
    """Keep only rows of ``ds`` whose ``key_col`` appears in ``ids_ds``
    — the distributed semi-join (broadcast below the threshold,
    tagged-union hash-partition merge above; see anti_join_ids)."""
    return anti_join_ids(ds, ids_ds, key_col, ids_key, num_parts,
                         broadcast_threshold_rows, ds_schema,
                         keep_matches=True)


def attach_payload(pairs_ds, key_col: str, side_ds, side_key: str,
                   payload_cols: tuple, out_suffix: str,
                   num_parts: int = 16, how: str = "inner",
                   pairs_schema: pa.Schema | None = None,
                   side_schema: pa.Schema | None = None,
                   broadcast_threshold_rows: int = 1_500_000):
    """Equi-join expressed as ONE sort shuffle (union + groupby part +
    partition-local merge) instead of a join-operator actor pool —
    the cheap path for attaching per-key payloads (e.g. sketches) to a
    pair table. The side must have UNIQUE keys.

    Returns pairs columns + ``<payload>_<out_suffix>`` columns; with
    how='inner' pairs without a matching side key are dropped.
    """
    import numpy as np

    import pyarrow.compute as pc

    def _pa_schema(ds) -> pa.Schema:
        # NOTE: schema() on a lazy dataset triggers execution — callers
        # with non-trivial upstream plans should pass schemas explicitly
        s = ds.schema()
        return getattr(s, "base_schema", s)

    pair_schema = pairs_schema if pairs_schema is not None else _pa_schema(pairs_ds)
    pair_names = pair_schema.names
    side_schema = side_schema if side_schema is not None else _pa_schema(side_ds)
    payload_types = {c: side_schema.field(c).type for c in payload_cols}

    if _broadcast_fits(side_ds, broadcast_threshold_rows):
        return _attach_broadcast(pairs_ds, key_col, side_ds, side_key,
                                 payload_cols, out_suffix, how,
                                 pair_names, payload_types)

    def tag_pairs(batch: pa.Table) -> pa.Table:
        from mhray.stages.candidates import _part_of

        key = np.asarray(batch.column(key_col), dtype=np.int64)
        cols = {n: batch.column(n) for n in pair_names}
        cols["__part"] = pa.array(_part_of(key, num_parts), pa.int32())
        cols["__role"] = pa.array(np.zeros(len(key), np.int8), pa.int8())
        cols["__key"] = pa.array(key, pa.int64())
        for c in payload_cols:
            cols[f"__p_{c}"] = pa.nulls(len(key), payload_types[c])
        return pa.table(cols)

    def tag_side(batch: pa.Table) -> pa.Table:
        from mhray.stages.candidates import _part_of

        key = np.asarray(batch.column(side_key), dtype=np.int64)
        n = len(key)
        cols = {}
        for name in pair_names:
            cols[name] = pa.nulls(n, pair_schema.field(name).type)
        cols["__part"] = pa.array(_part_of(key, num_parts), pa.int32())
        cols["__role"] = pa.array(np.ones(n, np.int8), pa.int8())
        cols["__key"] = pa.array(key, pa.int64())
        for c in payload_cols:
            cols[f"__p_{c}"] = batch.column(c)
        return pa.table(cols)

    tagged = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow",
                                  zero_copy_batch=True).union(
        side_ds.map_batches(tag_side, batch_format="pyarrow",
                            zero_copy_batch=True))

    def merge(part: pa.Table) -> pa.Table:
        role = np.asarray(part.column("__role"))
        keys = np.asarray(part.column("__key"), dtype=np.int64)
        is_side = role == 1
        side_keys = keys[is_side]
        order = np.argsort(side_keys)
        side_sorted = side_keys[order]
        pr_mask = ~is_side
        pr_keys = keys[pr_mask]
        pos = np.searchsorted(side_sorted, pr_keys)
        pos_c = np.minimum(pos, max(0, len(side_sorted) - 1))
        found = (side_sorted[pos_c] == pr_keys) if len(side_sorted) \
            else np.zeros(len(pr_keys), bool)
        if how == "inner":
            keep_rows = np.flatnonzero(pr_mask)[found]
            gather = pos_c[found]
        else:
            keep_rows = np.flatnonzero(pr_mask)
            gather = np.where(found, pos_c, 0)
        out = {}
        for name in pair_names:
            out[name] = part.column(name).take(pa.array(keep_rows, pa.int64()))
        side_rows = np.flatnonzero(is_side)[order]
        for c in payload_cols:
            if len(side_rows) == 0:
                col = pa.nulls(len(keep_rows), payload_types[c])
            else:
                col = part.column(f"__p_{c}").take(
                    pa.array(side_rows[gather], pa.int64()))
                if how != "inner":
                    col = pc.if_else(pa.array(found), col,
                                     pa.nulls(len(found), payload_types[c]))
            out[f"{c}_{out_suffix}"] = col
        return pa.table(out)

    return tagged.groupby("__part", num_partitions=num_parts).map_groups(
        merge, batch_format="pyarrow")


def prepared_attacher(side_ds, side_key: str, payload_cols: tuple,
                      num_parts: int = 16,
                      side_schema: pa.Schema | None = None,
                      broadcast_threshold_rows: int = 1_500_000):
    """Factory owning the broadcast-vs-shuffle attach policy for a side
    consumed by SEVERAL pair tables: returns ``attach(pairs_ds,
    key_col, out_suffix, pairs_schema)``. On the broadcast path the
    side is fetched, key-sorted, and ``ray.put`` ONCE here and every
    call reuses the ref; above the thresholds each call is a
    threshold-guarded shuffling :func:`attach_payload`. Inner-join
    semantics."""
    if side_schema is None:
        s = side_ds.schema()
        side_schema = getattr(s, "base_schema", s)
    payload_types = {c: side_schema.field(c).type for c in payload_cols}

    if _broadcast_fits(side_ds, broadcast_threshold_rows):
        ref = _prepare_broadcast_side(side_ds, side_key, payload_cols)

        def attach(pairs_ds, key_col, out_suffix, pairs_schema):
            return _attach_broadcast(
                pairs_ds, key_col, side_ds, side_key, payload_cols,
                out_suffix, "inner", list(pairs_schema.names),
                payload_types, ref=ref)
    else:
        def attach(pairs_ds, key_col, out_suffix, pairs_schema):
            # Forward the caller's threshold so attach_payload doesn't
            # re-broadcast under its own (larger) default after this
            # factory already decided the side does NOT fit.
            return attach_payload(
                pairs_ds, key_col, side_ds, side_key, payload_cols,
                out_suffix, num_parts=num_parts,
                pairs_schema=pairs_schema, side_schema=side_schema,
                broadcast_threshold_rows=broadcast_threshold_rows)

    return attach


def attach_payload_both(pairs_ds, side_ds, side_key: str,
                        payload_cols: tuple,
                        num_parts: int = 16,
                        pairs_schema: pa.Schema | None = None,
                        side_schema: pa.Schema | None = None,
                        keys=(("lo", "lo"), ("hi", "hi")),
                        broadcast_threshold_rows: int = 1_500_000):
    """Attach the SAME side payload to two key columns of a pair table
    (the (lo, hi) text/sketch fetch) — :func:`prepared_attacher`
    applied twice to one table, so the broadcast copy is shared.
    Inner-join semantics on BOTH keys (a pair missing either side is
    dropped)."""
    if side_schema is None:
        s = side_ds.schema()
        side_schema = getattr(s, "base_schema", s)
    if pairs_schema is None:
        s = pairs_ds.schema()
        pairs_schema = getattr(s, "base_schema", s)
    att = prepared_attacher(side_ds, side_key, payload_cols, num_parts,
                            side_schema, broadcast_threshold_rows)
    out = pairs_ds
    schema = pairs_schema
    for key_col, suffix in keys:
        out = att(out, key_col, suffix, schema)
        schema = pa.schema(
            list(schema) + [pa.field(f"{c}_{suffix}",
                                     side_schema.field(c).type)
                            for c in payload_cols])
    return out


def grouped_mode(ds, key_col: str, val_col: str, num_parts: int,
                 out_key: str, out_val: str, out_n: str):
    """Most frequent ``val_col`` per ``key_col`` (ties to the SMALLEST
    value — lexical for strings, numeric otherwise): per-batch
    pre-counted (key, val) partials below ONE key-hash shuffle, then a
    partition-local vectorized argmax. Shared by ev_user_mode and
    knn_label_agreement so the mode kernel (and its reliance on
    pyarrow group_by().aggregate() emitting group keys first — stable
    on the pinned pyarrow) lives in exactly one place."""
    import numpy as np

    from mhray.stages.candidates import _part_of

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by([key_col, val_col]).aggregate(
            [([], "count_all")])
        t = t.rename_columns([key_col, val_col, "n"])
        k = np.asarray(t.column(key_col), dtype=np.int64)
        return pa.table({
            "__part": pa.array(_part_of(k, num_parts), pa.int32()),
            key_col: pa.array(k, pa.int64()),
            val_col: t.column(val_col),
            "n": t.column("n").cast(pa.int64()),
        })

    def mode(group: pa.Table) -> pa.Table:
        t = group.group_by([key_col, val_col]).aggregate([("n", "sum")])
        k = np.asarray(t.column(key_col), dtype=np.int64)
        # String values: to_pylist -> np.asarray yields a native
        # fixed-width '<U' dtype, keeping the lexsort vectorized
        # (to_numpy would give object dtype and per-element compares);
        # nulls are filled with "" and pushed last via an explicit
        # null-flag sort key (a None in the object array would make
        # np.lexsort raise). Numeric values: to_numpy keeps the native
        # dtype AND maps nulls to NaN, which numpy already sorts last.
        vcol = t.column(val_col)
        if pa.types.is_string(vcol.type) or pa.types.is_large_string(
                vcol.type):
            isnull = vcol.is_null().to_numpy(zero_copy_only=False)
            v = np.asarray(vcol.fill_null("").to_pylist())
        else:
            isnull = np.zeros(len(vcol), dtype=bool)
            v = vcol.to_numpy(zero_copy_only=False)
        n = np.asarray(t.column("n_sum"), dtype=np.int64)
        # per key: most counts first, then smallest value (nulls last)
        order = np.lexsort((v, isnull, -n, k))
        k_s = k[order]
        first = np.ones(len(k_s), dtype=bool)
        if len(k_s) > 1:
            first[1:] = k_s[1:] != k_s[:-1]
        sel = order[first]
        return pa.table({
            out_key: pa.array(k[sel], pa.int64()),
            out_val: t.column(val_col).take(pa.array(sel, pa.int64())),
            out_n: pa.array(n[sel], pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__part", num_partitions=num_parts) \
        .map_groups(mode, batch_format="pyarrow")
