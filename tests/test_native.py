"""Native host-packing extension + prefetch pipeline."""

import numpy as np
import pytest

from multiverse_tpu import native
from multiverse_tpu.data.prefetch import prefetch


def test_native_builds():
    # the image ships g++, so the extension must actually build here
    assert native.have_native()


def test_remap_first_seen_matches_python():
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 37, size=(16, 8)).astype(np.int32)
    out, table, n = native.remap_first_seen(ids, capacity=128, max_id=36)
    # first-seen order semantics
    old2new, expect = {}, np.zeros_like(ids)
    for i, old in enumerate(ids.reshape(-1).tolist()):
        if old not in old2new:
            old2new[old] = len(old2new)
        expect.reshape(-1)[i] = old2new[old]
    np.testing.assert_array_equal(out, expect)
    assert n == len(old2new)
    np.testing.assert_array_equal(
        table, np.asarray(
            sorted(old2new, key=lambda k: old2new[k]), np.int32))
    # round trip: table[out] == ids
    np.testing.assert_array_equal(table[out], ids)


def test_remap_capacity_overflow():
    ids = np.arange(10, dtype=np.int32)
    with pytest.raises(ValueError):
        native.remap_first_seen(ids, capacity=5, max_id=9)


def test_gather_rows_pads():
    rows = np.arange(5 * 3, dtype=np.uint8).reshape(5, 3)
    out = native.gather_rows(rows, np.asarray([4, 0], np.int32), 4)
    np.testing.assert_array_equal(out[0], rows[4])
    np.testing.assert_array_equal(out[1], rows[0])
    assert (out[2:] == 0).all()
    # non-uint8 takes the numpy path
    rows_f = rows.astype(np.float32)
    out_f = native.gather_rows(rows_f, np.asarray([1], np.int32), 2)
    np.testing.assert_array_equal(out_f[0], rows_f[1])


def test_batch_uses_native_and_matches(tmp_path):
    """Dataset batches are identical with and without the native lib."""
    from tests.synthetic import tiny_config, make_batch

    rng = np.random.RandomState(0)
    cfg = tiny_config()
    # simulate: remap equivalence on random obs_scene patterns
    ids = rng.randint(0, 7, size=(6, cfg.obs_len)).astype(np.int32)
    out_n, table_n, _ = native.remap_first_seen(ids, 48, max_id=6)
    # force fallback
    orig = native._LIB
    native._LIB, native._TRIED = None, True
    try:
        out_p, table_p, _ = native.remap_first_seen(ids, 48, max_id=6)
    finally:
        native._LIB, native._TRIED = orig, True
    np.testing.assert_array_equal(out_n, out_p)
    np.testing.assert_array_equal(table_n, table_p)


def test_prefetch_order_and_errors():
    assert list(prefetch(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        for _ in it:
            pass


def test_remap_rejects_out_of_range_ids():
    # the C kernel indexes a (max_id+1)-entry scratch with raw ids —
    # unvalidated out-of-range ids silently corrupted batches
    import pytest

    from multiverse_tpu import native

    with pytest.raises(ValueError, match="out of range"):
        native.remap_first_seen(
            np.asarray([0, 5, 9], np.int32), capacity=8, max_id=3)
    with pytest.raises(ValueError, match="out of range"):
        native.remap_first_seen(
            np.asarray([-1, 0], np.int32), capacity=8, max_id=3)


def test_gather_rows_rejects_bad_table():
    import pytest

    from multiverse_tpu import native

    rows = np.arange(12, dtype=np.uint8).reshape(3, 4)
    with pytest.raises(ValueError, match="outside rows"):
        native.gather_rows(rows, np.asarray([0, 7], np.int32), 4)
    with pytest.raises(ValueError, match="rows >"):
        native.gather_rows(rows, np.asarray([0, 1, 2], np.int32), 2)
