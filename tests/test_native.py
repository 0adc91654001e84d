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


def test_prefetch_exhaustion_and_close():
    """next() after exhaustion raises StopIteration (never blocks on
    the empty queue), and close() unblocks a producer stuck on the
    bounded queue so abandoning an iterator leaks nothing."""
    import time

    it = prefetch(iter(range(3)), depth=2)
    assert list(it) == [0, 1, 2]
    with pytest.raises(StopIteration):
        next(it)          # must not hang

    produced = []

    def slow_gen():
        for i in range(100):
            produced.append(i)
            yield i

    it2 = prefetch(slow_gen(), depth=2)
    assert next(it2) == 0
    it2.close()           # abandon early: producer must exit
    deadline = time.time() + 5
    while it2._thread.is_alive() and time.time() < deadline:
        time.sleep(0.01)
    assert not it2._thread.is_alive(), "producer thread leaked"
    assert len(produced) < 100
    with pytest.raises(StopIteration):
        next(it2)
    # context-manager form
    with prefetch(iter(range(5)), depth=1) as it3:
        assert next(it3) == 0


def test_remap_scratch_reuse_invariant():
    """A persistent scratch is restored to all -1 on every return —
    success AND the overflow-error path — so reuse across batches
    cannot leak stale first-seen entries."""
    if not native.have_native():
        pytest.skip("no native lib")
    scratch = np.full(40, -1, np.int32)
    ids = np.asarray([[7, 3, 7], [12, 3, 0]], np.int32)
    out1, table1, n1 = native.remap_first_seen(
        ids, capacity=8, max_id=39, scratch=scratch)
    assert (scratch == -1).all()
    # identical result to the scratch-free call
    out2, table2, n2 = native.remap_first_seen(ids, capacity=8,
                                               max_id=39)
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_array_equal(table1, table2)
    # overflow path restores the invariant wholesale
    with pytest.raises(ValueError, match="overflow"):
        native.remap_first_seen(np.arange(10, dtype=np.int32),
                                capacity=5, max_id=39, scratch=scratch)
    assert (scratch == -1).all()


def test_get_batches_empty_dataset_and_seed():
    """An empty dataset raises instead of spinning forever, and a new
    seed actually reshuffles (the cached order is keyed by seed)."""
    from multiverse_tpu.data.dataset import TrajectoryDataset
    from tests.synthetic import tiny_config

    cfg = tiny_config()
    rng = np.random.RandomState(3)
    n, T, Tp = 9, cfg.obs_len, cfg.pred_len
    h, w = cfg.scene_grids[0]
    S = cfg.num_scales
    data = {
        "obs_traj": rng.randn(n, T, 2).astype(np.float32),
        "pred_traj": rng.randn(n, Tp, 2).astype(np.float32),
        "obs_grid_class": rng.randint(0, h * w, (n, S, T)),
        "pred_grid_class": rng.randint(0, h * w, (n, S, Tp)),
        "obs_grid_target_all_0": rng.randn(
            n, T, h, w, 2).astype(np.float32),
        "pred_grid_target_all_0": rng.randn(
            n, Tp, h, w, 2).astype(np.float32),
        "obs_scene": rng.randint(0, 3, (n, T, 1)),
        "traj_key": np.asarray(["k%d" % i for i in range(n)]),
    }
    shared = {"scene_feat": np.zeros(
        (3, cfg.scene_h, cfg.scene_w, cfg.scene_class), np.uint8)}
    ds = TrajectoryDataset(data, shared, cfg, "train")
    b1 = [e["traj_key"] for _, e in ds.get_batches(4, num_steps=2,
                                                   seed=1)]
    b2 = [e["traj_key"] for _, e in ds.get_batches(4, num_steps=2,
                                                   seed=1)]
    assert b1 == b2                       # same seed -> same order
    b3 = [e["traj_key"] for _, e in ds.get_batches(4, num_steps=2,
                                                   seed=99)]
    assert b1 != b3                       # new seed -> new shuffle

    empty = {k: v[:0] for k, v in data.items()}
    ds0 = TrajectoryDataset(empty, shared, cfg, "train")
    with pytest.raises(ValueError, match="empty"):
        next(ds0.get_batches(4, num_steps=5))


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
