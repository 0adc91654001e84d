"""Serving subsystem tests: dynamic batcher correctness + HTTP layer.

The engine must be a pure batching wrapper — its padded, dynamically
assembled batches have to produce exactly what a direct beam_forward
call on the same inputs produces (same static shapes, same freeze
semantics).  All on the CPU test mesh with tiny configs.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiverse_tpu.models import init_params
from synthetic import tiny_config


def _engine(cfg, **kw):
    from multiverse_tpu.serving.engine import ServingEngine

    params = init_params(jax.random.PRNGKey(0), cfg)
    return params, ServingEngine(params, cfg, **kw)


def _random_obs(rng, cfg, n):
    return [
        np.stack([
            rng.uniform(0, cfg.video_w, cfg.obs_len),
            rng.uniform(0, cfg.video_h, cfg.obs_len),
        ], axis=1).astype(np.float32)
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def beam_setup():
    cfg = tiny_config(use_beam_search=True, beam_size=3,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    params, eng = _engine(cfg, max_batch=4, max_delay_ms=30.0, T_pred=5)
    eng.warmup()   # compile outside any per-test predict timeout
    yield cfg, params, eng
    eng.close()


def test_predict_matches_direct_beam_forward(rng, beam_setup):
    cfg, params, eng = beam_setup
    from multiverse_tpu.inference import beam_forward
    from multiverse_tpu.geometry import grid_centers, rasterize_traj_np
    from multiverse_tpu.models import Batch

    obs = _random_obs(rng, cfg, 1)[0]
    res = eng.predict(obs, pred_len=4)
    assert res.trajs.shape == (cfg.beam_size, 4, 2)
    assert res.logprobs.shape == (cfg.beam_size,)

    # direct forward on an identically padded batch
    i = cfg.active_scales[0]
    h, w = cfg.scene_grids[i]
    B, T_obs = eng.max_batch, cfg.obs_len
    cls, tgt = rasterize_traj_np(
        obs, cfg.video_h, cfg.video_w, cfg.scene_grids)
    scene_rows = np.zeros(
        (B * T_obs, cfg.scene_h, cfg.scene_w, cfg.scene_class),
        np.uint8)
    scene_rows[..., 0] = 1
    batch = Batch(
        obs_grid_class=np.tile(cls[None], (B, 1, 1)),
        obs_grid_target_all=(np.tile(tgt[i][None], (B, 1, 1, 1, 1)),),
        obs_scene=np.arange(B * T_obs, dtype=np.int32).reshape(B, T_obs),
        scene_feat=scene_rows,
        pred_length=np.full((B,), 4, np.int32),
    )
    beam, reg_out = jax.device_get(
        jax.jit(lambda p, b: beam_forward(p, b, cfg, T_pred=eng.T_pred))(
            params, batch))
    centers = grid_centers(cfg.video_h, cfg.video_w, h, w).reshape(-1, 2)
    reg = np.asarray(reg_out)[0, :4].reshape(4, h * w, 2)
    ids = np.asarray(beam.ids)[0, :, :4]
    want = centers[ids] + reg[np.arange(4)[None, :], ids]
    np.testing.assert_allclose(res.trajs, want, atol=1e-4)
    np.testing.assert_allclose(
        res.logprobs, np.asarray(beam.logprobs)[0], atol=1e-5)


def test_concurrent_requests_batch_together(rng, beam_setup):
    cfg, _, eng = beam_setup
    obs_list = _random_obs(rng, cfg, 4)
    results = [None] * 4
    before = eng.stats.snapshot()

    def call(k):
        results[k] = eng.predict(obs_list[k], pred_len=3)

    threads = [threading.Thread(target=call, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r is not None for r in results)
    for r in results:
        assert r.trajs.shape == (cfg.beam_size, 3, 2)
    after = eng.stats.snapshot()
    # 4 concurrent requests must NOT take 4 separate batches
    assert after["requests"] - before["requests"] == 4
    assert after["batches"] - before["batches"] <= 3

    # identical inputs through different slots give identical outputs
    r_same = eng.predict(obs_list[0], pred_len=3)
    np.testing.assert_allclose(r_same.trajs, results[0].trajs, atol=1e-4)


def test_bad_requests_rejected(beam_setup):
    cfg, _, eng = beam_setup
    with pytest.raises(ValueError):
        eng.submit(np.zeros((cfg.obs_len + 1, 2), np.float32))
    with pytest.raises(ValueError):
        eng.submit(np.zeros((cfg.obs_len, 2), np.float32),
                   pred_len=eng.T_pred + 1)
    with pytest.raises(ValueError):
        eng.submit(np.zeros((cfg.obs_len, 2), np.float32),
                   scene_class_map=np.zeros((3, 3), np.int32))


def test_scene_map_changes_prediction(rng, beam_setup):
    cfg, _, eng = beam_setup
    obs = _random_obs(rng, cfg, 1)[0]
    base = eng.predict(obs, pred_len=4)
    cm = rng.randint(1, cfg.scene_class,
                     (cfg.scene_h, cfg.scene_w)).astype(np.int32)
    seen = eng.predict(obs, scene_class_map=cm, pred_len=4)
    assert not np.allclose(base.logprobs, seen.logprobs)


def test_greedy_engine(rng):
    cfg = tiny_config(use_beam_search=False, beam_size=3)
    _, eng = _engine(cfg, max_batch=2, max_delay_ms=1.0, T_pred=4)
    try:
        eng.warmup()
        obs = _random_obs(rng, cfg, 1)[0]
        res = eng.predict(obs)
        # greedy replicates the single future K times (offline contract)
        assert res.trajs.shape == (cfg.beam_size, 4, 2)
        np.testing.assert_array_equal(res.trajs[0], res.trajs[1])
        np.testing.assert_array_equal(res.logprobs, 0.0)
    finally:
        eng.close()


def test_mesh_sharded_engine_matches_single_device(rng, beam_setup):
    """DP-sharded serving (mesh over the 8-virtual-CPU test devices)
    must produce the same predictions as the single-device engine."""
    from multiverse_tpu.parallel import make_mesh
    from multiverse_tpu.serving.engine import ServingEngine

    cfg, params, eng = beam_setup
    mesh = make_mesh(n_devices=4)
    eng_m = ServingEngine(params, cfg, max_batch=4, max_delay_ms=1.0,
                          T_pred=5, mesh=mesh)
    try:
        eng_m.warmup()
        obs = _random_obs(rng, cfg, 1)[0]
        single = eng.predict(obs, pred_len=4)
        sharded = eng_m.predict(obs, pred_len=4)
        np.testing.assert_allclose(
            sharded.trajs, single.trajs, atol=1e-4)
        np.testing.assert_allclose(
            sharded.logprobs, single.logprobs, atol=1e-5)
    finally:
        eng_m.close()

    with pytest.raises(ValueError):
        ServingEngine(params, cfg, max_batch=3, mesh=mesh)


def test_http_server_roundtrip(rng, beam_setup):
    cfg, _, eng = beam_setup
    from multiverse_tpu.serving.client import PredictionClient
    from multiverse_tpu.serving.server import PredictionServer

    server = PredictionServer(eng, host="127.0.0.1", port=0)
    server.start_background()
    try:
        client = PredictionClient(port=server.port)
        assert client.healthy()
        obs = _random_obs(rng, cfg, 1)[0]
        direct = eng.predict(obs, pred_len=4)
        out = client.predict(obs, pred_len=4)
        np.testing.assert_allclose(out["trajs"], direct.trajs, atol=1e-4)
        np.testing.assert_allclose(
            out["logprobs"], direct.logprobs, atol=1e-5)
        stats = client.stats()
        assert stats["requests"] >= 2
        # malformed request -> 400, server keeps serving
        import json
        import urllib.error
        import urllib.request
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/predict",
            data=json.dumps({"obs_traj": [[0, 0]]}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
        assert client.healthy()
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()


def test_http_binary_transport_and_keepalive(rng, beam_setup):
    """The binary tensor frame decodes to exactly the JSON payload, and
    the persistent connection is actually reused across requests."""
    cfg, _, eng = beam_setup
    from multiverse_tpu.serving.client import PredictionClient
    from multiverse_tpu.serving.server import PredictionServer

    server = PredictionServer(eng, host="127.0.0.1", port=0)
    server.start_background()
    try:
        client = PredictionClient(port=server.port, binary=True)
        obs = _random_obs(rng, cfg, 1)[0]
        out_json = client.predict(obs, pred_len=4, binary=False)
        sock = client._conn.sock
        assert sock is not None
        out_bin = client.predict(obs, pred_len=4)   # binary, same conn
        assert client._conn.sock is sock            # keep-alive reuse
        np.testing.assert_allclose(
            out_bin["trajs"], out_json["trajs"], atol=1e-6)
        np.testing.assert_allclose(
            out_bin["logprobs"], out_json["logprobs"], atol=1e-6)
        assert out_bin["pred_len"] == out_json["pred_len"] == 4
        # both transports return WRITABLE arrays (frombuffer over the
        # response bytes is read-only unless copied)
        out_bin["trajs"][0, 0, 0] += 1.0
        out_json["trajs"][0, 0, 0] += 1.0
        assert client.healthy()                     # GET on same conn
        client.close()
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()


def test_http_server_rejects_unframed_bodies_and_closes(rng, beam_setup):
    """Keep-alive body-framing guards on the THREADED server: a chunked
    Transfer-Encoding or malformed Content-Length leaves the body
    unread, so the server must answer 400 AND close the connection —
    otherwise the unread bytes desync every later request on the
    socket (the asyncio front end already rejects both)."""
    import socket

    cfg, _, eng = beam_setup
    from multiverse_tpu.serving.server import PredictionServer

    server = PredictionServer(eng, host="127.0.0.1", port=0)
    server.start_background()
    try:
        for head, body in (
                (b"POST /v1/predict HTTP/1.1\r\nHost: x\r\n"
                 b"Transfer-Encoding: chunked\r\n\r\n",
                 b"5\r\nhello\r\n0\r\n\r\n"),
                (b"POST /v1/predict HTTP/1.1\r\nHost: x\r\n"
                 b"Content-Length: abc\r\n\r\n", b"garbage"),
                (b"POST /v1/predict HTTP/1.1\r\nHost: x\r\n"
                 b"Content-Length: -7\r\n\r\n", b"")):
            with socket.create_connection(
                    ("127.0.0.1", server.port), timeout=10) as s:
                s.sendall(head + body)
                s.settimeout(10)
                resp = b""
                while True:
                    chunk = s.recv(65536)
                    if not chunk:
                        break   # server closed — required
                    resp += chunk
                assert resp.startswith(b"HTTP/1.1 400"), resp[:80]
        # the server still serves normal requests afterwards
        from multiverse_tpu.serving.client import PredictionClient
        client = PredictionClient(port=server.port)
        out = client.predict(_random_obs(rng, cfg, 1)[0], pred_len=4)
        assert out["trajs"].shape[0] == cfg.beam_size
        client.close()
    finally:
        server.httpd.shutdown()
        server.httpd.server_close()


def test_close_semantics_and_error_counting(rng):
    """close() fails queued + late-submitted requests fast, and errors
    are counted per REQUEST (comparable to stats['requests'])."""
    cfg = tiny_config(use_beam_search=True, beam_size=2,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    params, eng = _engine(cfg, max_batch=2, max_delay_ms=1.0, T_pred=3)
    eng.warmup()
    obs = _random_obs(rng, cfg, 1)[0]

    # failing step -> every request in the batch counted as an error
    orig = eng._step
    eng._step = lambda *_: (_ for _ in ()).throw(RuntimeError("boom"))
    h1, h2 = eng.submit(obs), eng.submit(obs)
    for h in (h1, h2):
        h.event.wait(10)
        assert isinstance(h.error, RuntimeError)
    assert eng.stats.snapshot()["errors"] == 2
    eng._step = orig

    eng.close()
    with pytest.raises(RuntimeError, match="closed"):
        eng.predict(obs, timeout=5)


def test_fail_skips_already_resolved_requests(rng):
    """_fail on a batch where some requests already resolved must not
    overwrite their results or count them as errors: a waiter holding a
    valid result would otherwise raise, and errors over-count."""
    from multiverse_tpu.serving.engine import _Pending

    cfg = tiny_config(use_beam_search=True, beam_size=2,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    _, eng = _engine(cfg, max_batch=2, max_delay_ms=1.0, T_pred=3)
    try:
        done = _Pending(np.zeros((cfg.obs_len, 2), np.float32), None, 3)
        done.result = "already-resolved"
        done.event.set()
        pending = _Pending(
            np.zeros((cfg.obs_len, 2), np.float32), None, 3)
        eng._fail([done, pending], RuntimeError("boom"))
        assert done.error is None
        assert done.result == "already-resolved"
        assert isinstance(pending.error, RuntimeError)
        assert eng.stats.snapshot()["errors"] == 1
    finally:
        eng.close()


def test_on_done_hook_failure_is_contained(rng):
    """A raising on_done hook (e.g. an event loop closed mid-shutdown)
    must not poison the batch it rides in or kill the resolver thread:
    the hook's own request still resolves, co-batched requests resolve,
    and the engine keeps serving afterwards."""
    cfg = tiny_config(use_beam_search=True, beam_size=2,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    _, eng = _engine(cfg, max_batch=2, max_delay_ms=20.0, T_pred=3)
    eng.warmup()
    obs = _random_obs(rng, cfg, 2)
    try:
        def bad_hook(pending):
            raise RuntimeError("loop closed")

        h1 = eng.submit(obs[0], on_done=bad_hook)
        h2 = eng.submit(obs[1])
        for h in (h1, h2):
            assert h.event.wait(10)
            assert h.error is None and h.result is not None
        assert eng._resolver.is_alive()
        assert eng.stats.snapshot()["errors"] == 0
        # and the resolver still lands later batches
        out = eng.predict(obs[0], timeout=10)
        assert out.trajs.shape[0] == cfg.beam_size
    finally:
        eng.close()


def test_tpu_serving_dtype_resolution_flag_spellings():
    """The TPU bf16+int8a serving default must yield to an explicit
    --compute_dtype/--decode_quant in EVERY argparse spelling
    ("--flag value", "--flag=value", abbreviated prefixes), and never
    fire off-TPU.  Explicitness is recorded by argparse itself
    (None-sentinel defaults), so this drives the real parser."""
    from multiverse_tpu.cli.serve import (
        build_parser,
        resolve_serving_dtypes,
    )

    base = ["out", "model", "--port", "8500"]

    def resolve(argv, backend):
        a = build_parser().parse_args(argv)
        return resolve_serving_dtypes(
            backend, a.compute_dtype, a.decode_quant)

    assert resolve(base, "tpu") == ("bfloat16", "int8a")
    assert resolve(base, "cpu") == ("float32", "none")
    for explicit, expect in (
            (["--compute_dtype", "float32"], ("float32", "none")),
            (["--compute_dtype=float32"], ("float32", "none")),
            (["--decode_quant", "none"], ("float32", "none")),
            (["--decode_quant=none"], ("float32", "none")),
            # argparse accepts unambiguous PREFIXES too — an
            # abbreviated explicit flag must still win over the TPU
            # default (it parses to the same dest)
            (["--decode_qua", "int8_dyn"], ("float32", "int8_dyn")),
            (["--decode_qua=int8_dyn"], ("float32", "int8_dyn")),
            (["--compute_dt", "float32"], ("float32", "none"))):
        assert resolve(base + explicit, "tpu") == expect
    # a flag whose VALUE merely mentions the name is not an override
    assert resolve(base + ["--load_from", "ckpt--compute_dtype"],
                   "tpu") == ("bfloat16", "int8a")


def test_serve_max_batch_tier_default():
    """mvt-serve's max_batch default follows the measured
    latency/throughput curve (BENCH_SERVE_r05.json): 8 for the beam
    tier (throughput-flat across the dial, lowest p50), 32 for
    --greedy (its knee); an explicit --max_batch always wins."""
    from multiverse_tpu.cli.serve import build_parser, resolve_max_batch

    def resolved(argv):
        a = build_parser().parse_args(["out", "model"] + argv)
        return resolve_max_batch(a.max_batch, a.greedy)

    assert resolved([]) == 8
    assert resolved(["--greedy"]) == 32
    assert resolved(["--max_batch", "64"]) == 64
    assert resolved(["--greedy", "--max_batch", "4"]) == 4


def test_close_fails_inflight_when_resolver_stuck(rng):
    """If the resolver cannot land in-flight batches before close()'s
    join timeout, their waiters are failed instead of being left to
    block out their full predict timeout."""
    cfg = tiny_config(use_beam_search=True, beam_size=2,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    _, eng = _engine(cfg, max_batch=1, max_delay_ms=1.0, T_pred=3)
    eng.warmup()
    rng_obs = _random_obs(rng, cfg, 2)
    picked, release = threading.Event(), threading.Event()

    def stuck_resolve(reqs, out, K):
        picked.set()
        release.wait(30)

    eng._resolve = stuck_resolve
    try:
        h1 = eng.submit(rng_obs[0])
        assert picked.wait(10)          # resolver is inside batch #1
        h2 = eng.submit(rng_obs[1])     # batch #2 stays in _inflight
        deadline = time.time() + 10
        while eng._inflight.qsize() == 0 and time.time() < deadline:
            time.sleep(0.01)
        assert eng._inflight.qsize() == 1
        eng.close(resolver_timeout_s=0.3)
        assert h2.event.is_set()
        assert isinstance(h2.error, RuntimeError)
        assert not h1.event.is_set()    # still held by the stuck batch
    finally:
        release.set()


def test_async_http_server_roundtrip(rng, beam_setup):
    """The asyncio front end serves the same wire contracts as the
    threaded one: JSON + binary predict, healthz/stats, 400 on bad
    input, concurrent clients coalescing through one engine — all on
    ONE event loop (no per-connection server threads)."""
    import json as _json
    import urllib.error
    import urllib.request

    cfg, _, eng = beam_setup
    from multiverse_tpu.serving.aserver import AsyncPredictionServer
    from multiverse_tpu.serving.client import PredictionClient

    server = AsyncPredictionServer(eng, port=0)
    server.start_background()
    try:
        client = PredictionClient(port=server.port, binary=True)
        assert client.healthy()
        obs = _random_obs(rng, cfg, 1)[0]
        direct = eng.predict(obs, pred_len=4)
        out_bin = client.predict(obs, pred_len=4)
        np.testing.assert_allclose(out_bin["trajs"], direct.trajs,
                                   atol=1e-4)
        sock = client._conn.sock
        out_json = client.predict(obs, pred_len=4, binary=False)
        assert client._conn.sock is sock        # keep-alive reuse
        np.testing.assert_allclose(out_json["trajs"], direct.trajs,
                                   atol=1e-4)
        np.testing.assert_allclose(
            out_bin["logprobs"], out_json["logprobs"], atol=1e-6)
        assert client.stats()["requests"] >= 2

        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/predict",
            data=_json.dumps({"obs_traj": [[0, 0]]}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=10)
        assert ei.value.code == 400
        assert client.healthy()                 # still serving

        outs, errs = [None] * 6, []

        def w(k):
            c = PredictionClient(port=server.port, binary=True)
            try:
                outs[k] = c.predict(_random_obs(rng, cfg, 1)[0],
                                    pred_len=4)
            except Exception as e:
                errs.append(e)

        ts = [threading.Thread(target=w, args=(k,)) for k in range(6)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs
        assert all(o is not None and o["trajs"].shape ==
                   (cfg.beam_size, 4, 2) for o in outs)
        client.close()

        # a malformed Content-Length gets a 400 (not a silent drop)
        # and the server keeps serving afterwards
        import socket as _socket
        with _socket.create_connection(
                ("127.0.0.1", server.port), timeout=10) as s:
            s.sendall(b"POST /v1/predict HTTP/1.1\r\n"
                      b"Content-Length: banana\r\n\r\n")
            assert b" 400 " in s.recv(4096)
        # a header line past the asyncio stream's 64 KB line limit
        # raises ValueError inside readline — must come back as a 400,
        # not an unhandled task exception
        with _socket.create_connection(
                ("127.0.0.1", server.port), timeout=10) as s:
            s.sendall(b"POST /v1/predict HTTP/1.1\r\n"
                      b"X-Junk: " + b"a" * (80 * 1024) + b"\r\n\r\n")
            assert b" 400 " in s.recv(4096)
        # unbounded DISTINCT header lines must be cut off inside the
        # read loop (not after it — the dict would grow without limit)
        with _socket.create_connection(
                ("127.0.0.1", server.port), timeout=10) as s:
            s.sendall(b"POST /v1/predict HTTP/1.1\r\n")
            for i in range(300):
                s.sendall(b"X-H%d: v\r\n" % i)
            s.sendall(b"\r\n")
            assert b" 400 " in s.recv(4096)
        # chunked bodies are unsupported: must 400 + close instead of
        # parsing the chunks as the next request line
        with _socket.create_connection(
                ("127.0.0.1", server.port), timeout=10) as s:
            s.sendall(b"POST /v1/predict HTTP/1.1\r\n"
                      b"Transfer-Encoding: chunked\r\n\r\n"
                      b"5\r\nhello\r\n0\r\n\r\n")
            assert b" 400 " in s.recv(4096)
        # an overlong REQUEST LINE (no newline at all): the 400 must
        # actually reach the client — the server drains the unread
        # bytes before closing so the response isn't destroyed by RST
        with _socket.create_connection(
                ("127.0.0.1", server.port), timeout=10) as s:
            s.sendall(b"B" * (80 * 1024))
            assert b" 400 " in s.recv(4096)
        # RFC 7230 §3.5: a stray CRLF between keep-alive requests is
        # skipped, not treated as end-of-connection
        with _socket.create_connection(
                ("127.0.0.1", server.port), timeout=10) as s:
            s.sendall(b"GET /healthz HTTP/1.1\r\n\r\n"
                      b"\r\n"
                      b"GET /healthz HTTP/1.1\r\n\r\n")
            buf = b""
            deadline = time.time() + 10
            while buf.count(b"HTTP/1.1 200") < 2 and time.time() < deadline:
                buf += s.recv(4096)
            assert buf.count(b"HTTP/1.1 200") == 2
        c2 = PredictionClient(port=server.port)
        assert c2.healthy()
        c2.close()
    finally:
        server.close(close_engine=False)   # the fixture owns the engine


def test_async_server_engine_failure_is_500(rng):
    """An ASYNC engine failure on a valid request must come back 500,
    not 400: jax device/trace errors are often ValueError/TypeError,
    and classifying them as client errors would stop clients from
    retrying through an outage."""
    import urllib.error
    import urllib.request
    import json as _json

    cfg = tiny_config(use_beam_search=True, beam_size=2,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    params, eng = _engine(cfg, max_batch=2, max_delay_ms=1.0, T_pred=3)
    from multiverse_tpu.serving.aserver import AsyncPredictionServer

    server = AsyncPredictionServer(eng, port=0)
    server.start_background()
    try:
        eng.warmup()

        def boom(p, b):
            raise ValueError("fake jax trace error")

        eng._step = boom
        obs = _random_obs(rng, cfg, 1)[0]
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/v1/predict",
            data=_json.dumps({"obs_traj": obs.tolist(),
                              "pred_len": 3}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=15)
        assert ei.value.code == 500, \
            "async engine ValueError must be 500, not 400"
    finally:
        server.close(close_engine=True)


def test_async_server_connection_churn_no_fd_leak(rng, beam_setup):
    """Sustained load with per-request connection churn must not leak
    file descriptors or waiter state: 120 short-lived connections (no
    keep-alive reuse) through the asyncio front end, then the process
    fd count and the engine's pending set return to baseline."""
    import os
    import socket as _socket

    cfg, _, eng = beam_setup
    from multiverse_tpu.serving.aserver import AsyncPredictionServer
    from multiverse_tpu.serving.client import PredictionClient

    def nfds():
        return len(os.listdir("/proc/self/fd"))

    server = AsyncPredictionServer(eng, port=0)
    server.start_background()
    try:
        # settle + baseline
        c0 = PredictionClient(port=server.port, binary=True)
        obs = _random_obs(rng, cfg, 1)[0]
        c0.predict(obs, pred_len=4)
        c0.close()
        time.sleep(0.2)
        base = nfds()

        errs = []

        def churn(k):
            for _ in range(20):
                c = PredictionClient(port=server.port, binary=True)
                try:
                    out = c.predict(obs, pred_len=4)
                    assert out["trajs"].shape == (cfg.beam_size, 4, 2)
                except Exception as e:
                    errs.append(e)
                finally:
                    c.close()

        ts = [threading.Thread(target=churn, args=(k,))
              for k in range(6)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs
        # closed-side sockets linger briefly in the loop's callbacks
        deadline = time.time() + 5
        while nfds() > base + 4 and time.time() < deadline:
            time.sleep(0.2)
        assert nfds() <= base + 4, (nfds(), base)
        snap = eng.stats.snapshot()
        assert snap["errors"] == 0 and snap["requests"] >= 121
    finally:
        server.close(close_engine=False)


def test_client_does_not_retry_on_timeout():
    """A slow server must surface TimeoutError after ~one timeout and
    ONE request — the stale-keep-alive retry must not re-enqueue the
    prediction on an engine that is merely saturated."""
    import socket

    from multiverse_tpu.serving.client import PredictionClient

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    accepted = []
    alive = threading.Event()
    alive.set()

    def sink():
        srv.settimeout(0.2)
        while alive.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            accepted.append(conn)   # read nothing, never respond

    t = threading.Thread(target=sink, daemon=True)
    t.start()
    try:
        c = PredictionClient(port=port, timeout=0.5)
        obs = np.zeros((8, 2), np.float32)
        t0 = time.perf_counter()
        with pytest.raises(TimeoutError):
            c.predict(obs)
        dt = time.perf_counter() - t0
        c.close()
        time.sleep(0.3)   # a (buggy) retry would reconnect by now
        assert dt < 1.0, f"timed out in {dt:.2f}s — retried the request"
        assert len(accepted) == 1, "client reconnected after timeout"
    finally:
        alive.clear()
        t.join()
        for conn in accepted:
            conn.close()
        srv.close()


def test_client_no_post_retry_on_fresh_connection():
    """A POST that dies on a FRESH connection must propagate, not
    re-submit: the server may already have admitted the prediction
    (the retry exists only for stale reused keep-alive sockets).  GETs
    are idempotent and may retry."""
    import socket

    from multiverse_tpu.serving.client import PredictionClient

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(4)
    port = srv.getsockname()[1]
    accepted = []
    alive = threading.Event()
    alive.set()

    def sink():
        srv.settimeout(0.2)
        while alive.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            accepted.append(conn)
            conn.recv(65536)   # read the request...
            conn.close()       # ...then die without responding

    t = threading.Thread(target=sink, daemon=True)
    t.start()
    try:
        c = PredictionClient(port=port, timeout=5.0)
        obs = np.zeros((8, 2), np.float32)
        with pytest.raises(Exception):
            c.predict(obs)
        time.sleep(0.3)
        assert len(accepted) == 1, \
            "client re-submitted a POST after a fresh-connection failure"
        # a GET retries once (idempotent): both attempts hit the server
        assert c.healthy() is False
        time.sleep(0.3)
        assert len(accepted) == 3
    finally:
        alive.clear()
        t.join()
        srv.close()


def test_submit_input_validation(rng, beam_setup):
    """Non-finite coordinates are rejected at the door (a NaN would
    silently decode as cell 0 and come back 200 OK), and max_queue=0
    is a loud ValueError instead of python's Queue(0)=unbounded."""
    cfg, _, eng = beam_setup
    obs = _random_obs(rng, cfg, 1)[0]
    bad = obs.copy()
    bad[3, 1] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        eng.submit(bad)
    bad[3, 1] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        eng.submit(bad)
    from multiverse_tpu.serving.engine import ServingEngine
    with pytest.raises(ValueError, match="max_queue"):
        ServingEngine(None, cfg, max_queue=0)


def test_update_params_hot_swap(rng):
    """update_params swaps weights without recompiling or dropping
    traffic: outputs change to match a fresh engine's, concurrent
    requests during swaps all succeed, and a mismatched pytree is
    rejected."""
    cfg = tiny_config(use_beam_search=True, beam_size=2,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    params_a, eng = _engine(cfg, max_batch=2, max_delay_ms=1.0, T_pred=3)
    try:
        eng.warmup()
        params_b = init_params(jax.random.PRNGKey(7), cfg)
        obs = _random_obs(rng, cfg, 1)[0]
        out_a = eng.predict(obs, timeout=15)
        eng.update_params(params_b)
        out_b = eng.predict(obs, timeout=15)
        assert not np.allclose(out_a.trajs, out_b.trajs), \
            "swap did not change the served weights"
        # oracle: a fresh engine on params_b produces the same output
        _, eng_b = _engine(cfg, max_batch=2, max_delay_ms=1.0, T_pred=3)
        try:
            eng_b.update_params(params_b)
            oracle = eng_b.predict(obs, timeout=30)
            np.testing.assert_allclose(out_b.trajs, oracle.trajs,
                                       atol=1e-5)
        finally:
            eng_b.close()
        # swaps under concurrent traffic: no failures
        errs = []

        def churn():
            try:
                for _ in range(5):
                    eng.predict(obs, timeout=15)
            except Exception as e:
                errs.append(e)

        ts = [threading.Thread(target=churn) for _ in range(4)]
        [t.start() for t in ts]
        for _ in range(6):
            eng.update_params(params_a)
            eng.update_params(params_b)
        [t.join() for t in ts]
        assert not errs
        # architecture mismatch is rejected, weights keep serving
        import jax.numpy as jnp
        bad = jax.tree.map(lambda x: jnp.zeros(x.shape + (1,)), params_b)
        with pytest.raises(ValueError, match="structure/shapes"):
            eng.update_params(bad)
        assert eng.predict(obs, timeout=15).trajs.shape[0] == 2
    finally:
        eng.close()


def test_abandoned_requests_are_dropped(rng):
    """A predict() whose waiter timed out must not consume a device
    batch row: the batcher drops it (counted in stats.abandoned) and
    fresh traffic proceeds."""
    cfg = tiny_config(use_beam_search=True, beam_size=2,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    params, eng = _engine(cfg, max_batch=2, max_delay_ms=1.0, T_pred=3)
    try:
        eng.warmup()
        gate = threading.Event()
        orig_step = eng._step

        def slow_step(p, b):
            gate.wait(10)
            return orig_step(p, b)

        eng._step = slow_step
        obs = _random_obs(rng, cfg, 1)[0]
        blocker = eng.submit(obs)     # batcher takes it, stalls in step
        deadline = time.time() + 5
        while not eng._queue.empty() and time.time() < deadline:
            time.sleep(0.005)
        # this one stays QUEUED behind the stalled batch; its waiter
        # gives up before the batcher ever sees it
        with pytest.raises(TimeoutError):
            eng.predict(obs, timeout=0.05)
        gate.set()
        assert blocker.event.wait(15) and blocker.error is None
        # fresh traffic still lands, and the zombie was dropped
        out = eng.predict(obs, timeout=15)
        assert out.trajs.shape[0] == cfg.beam_size
        assert eng.stats.snapshot()["abandoned"] == 1
    finally:
        eng.close()


def test_bounded_queue_overload(rng):
    """max_queue bounds admission deterministically: with the batcher
    blocked inside a stalled device step, queued requests beyond the
    bound raise EngineOverloadedError (counted in stats.rejected) and
    every admitted request still resolves once the step unblocks."""
    from multiverse_tpu.serving.engine import EngineOverloadedError

    cfg = tiny_config(use_beam_search=True, beam_size=2,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1)
    params, eng = _engine(cfg, max_batch=1, max_delay_ms=1.0,
                          T_pred=4, max_queue=2)
    try:
        eng.warmup()
        gate = threading.Event()
        orig_step = eng._step

        def slow_step(p, b):
            gate.wait(10)
            return orig_step(p, b)

        eng._step = slow_step
        obs = _random_obs(rng, cfg, 1)[0]
        p1 = eng.submit(obs)                  # batcher takes it, stalls
        deadline = time.time() + 5
        while not eng._queue.empty() and time.time() < deadline:
            time.sleep(0.005)
        assert eng._queue.empty(), "batcher never picked up p1"
        p2 = eng.submit(obs)
        p3 = eng.submit(obs)                  # queue now at max_queue=2
        with pytest.raises(EngineOverloadedError):
            eng.submit(obs)
        assert eng.stats.snapshot()["rejected"] == 1
        gate.set()
        for p in (p1, p2, p3):
            assert p.event.wait(15)
            assert p.error is None
            assert p.result.trajs.shape == (cfg.beam_size, 4, 2)
    finally:
        gate.set()
        eng.close()


@pytest.mark.parametrize("backend", ["threads", "asyncio"])
def test_http_503_on_overload(rng, beam_setup, monkeypatch, backend):
    """Both front ends map EngineOverloadedError to 503 + Retry-After."""
    import http.client
    import json

    from multiverse_tpu.serving.engine import EngineOverloadedError

    cfg, _, eng = beam_setup
    if backend == "threads":
        from multiverse_tpu.serving.server import PredictionServer
        server = PredictionServer(eng, port=0)
        server.start_background()
    else:
        from multiverse_tpu.serving.aserver import AsyncPredictionServer
        server = AsyncPredictionServer(eng, port=0)
        server.start_background()
    try:
        def overloaded(*a, **kw):
            raise EngineOverloadedError("request queue full (test)")

        monkeypatch.setattr(eng, "submit", overloaded)
        monkeypatch.setattr(
            eng, "predict",
            lambda *a, **kw: overloaded())
        obs = _random_obs(rng, cfg, 1)[0]
        conn = http.client.HTTPConnection("127.0.0.1", server.port,
                                          timeout=10)
        conn.request("POST", "/v1/predict",
                     body=json.dumps({"obs_traj": obs.tolist()}),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status == 503, (resp.status, body)
        assert resp.getheader("Retry-After") == "1"
        assert b"queue full" in body
        conn.close()
    finally:
        if backend == "asyncio":
            server.close(close_engine=False)
        else:
            server.httpd.shutdown()
            server.httpd.server_close()


def test_stats_latency_percentiles(rng, beam_setup):
    """After traffic, /stats carries p50/p99 with p50<=p99<=max."""
    cfg, _, eng = beam_setup
    obs = _random_obs(rng, cfg, 1)[0]
    for _ in range(3):
        eng.predict(obs, pred_len=4)
    snap = eng.stats.snapshot()
    assert "p50_latency_ms" in snap and "p99_latency_ms" in snap
    assert (0 < snap["p50_latency_ms"] <= snap["p99_latency_ms"]
            <= snap["max_latency_ms"])


def test_async_server_survives_protocol_fuzz(rng, beam_setup):
    """Deterministic protocol fuzz: 60 connections of seeded random
    garbage (random bytes, truncated requests, huge tokens, stray
    CRLFs) against the asyncio front end.  The server must never hang
    a connection past its own framing rules, and must still serve a
    well-formed request afterwards with zero engine errors.  (The
    client does not wait for replies to unframed garbage — the server
    side is legitimately still waiting for a complete line.)"""
    import socket as _socket

    from multiverse_tpu.serving.aserver import AsyncPredictionServer
    from multiverse_tpu.serving.client import PredictionClient

    cfg, _, eng = beam_setup
    server = AsyncPredictionServer(eng, port=0)
    server.start_background()
    fuzz_rng = np.random.RandomState(7)
    corpus = [
        b"",                                     # connect-and-close
        b"\r\n\r\n",
        b"GET\r\n\r\n",                          # too few tokens
        b"POST /v1/predict HTTP/1.1\r\nContent-Length: 10\r\n\r\nhi",
        b"POST /v1/predict HTTP/1.1\r\nContent-Length: -5\r\n\r\n",
        b"\x00\xff" * 512,
        b"POST /v1/predict HTTP/1.1\r\n" + b"A" * 70000,
        b"B" * 70000,   # overlong REQUEST LINE (no newline at all)
    ]
    try:
        for k in range(60):
            if k % 3 == 0:
                payload = corpus[k // 3 % len(corpus)]
                framed = payload.endswith(b"\r\n\r\n") or len(payload) > 4096
            else:
                payload = fuzz_rng.bytes(int(fuzz_rng.randint(1, 2048)))
                framed = False
            try:
                with _socket.create_connection(
                        ("127.0.0.1", server.port), timeout=5) as s:
                    s.sendall(payload)
                    # only wait for a reply when the payload is a
                    # complete frame (or oversized, which forces one);
                    # unframed garbage leaves the server correctly
                    # blocked on readline until we close
                    s.settimeout(5 if framed else 0.05)
                    try:
                        s.recv(4096)
                    except (_socket.timeout, ConnectionError):
                        pass
            except ConnectionError:
                pass        # server closed mid-send: acceptable
        # the loop is still alive and serving correctly
        c = PredictionClient(port=server.port, timeout=60)
        out = c.predict(_random_obs(np.random.RandomState(0), cfg, 1)[0],
                        pred_len=4)
        assert out["trajs"].shape == (cfg.beam_size, 4, 2)
        c.close()
        assert eng.stats.snapshot()["errors"] == 0
    finally:
        server.close(close_engine=False)


def test_mesh_engine_int8_default_matches_single_device(rng, monkeypatch):
    """The TPU serving default — bf16 + decode_quant="int8a" — over a
    DP mesh: the engine's own shard_map step (distinct wrapping from
    parallel.make_sharded_beam_step) must carry the quantized fused
    kernels per chip and equal the single-device int8a engine."""
    from multiverse_tpu.ops import pallas_decode
    from multiverse_tpu.parallel import make_mesh
    from multiverse_tpu.serving.engine import ServingEngine

    monkeypatch.setattr(pallas_decode, "FORCE_INTERPRET_FUSED", True)
    cfg = tiny_config(use_beam_search=True, beam_size=3,
                      diverse_beam=True, diverse_gamma=0.01,
                      fix_num_timestep=1, compute_dtype="bfloat16",
                      decode_quant="int8a")
    params = init_params(jax.random.PRNGKey(0), cfg)
    eng_1 = ServingEngine(params, cfg, max_batch=4, max_delay_ms=1.0,
                          T_pred=4)
    eng_m = ServingEngine(params, cfg, max_batch=4, max_delay_ms=1.0,
                          T_pred=4, mesh=make_mesh(n_devices=4))
    try:
        eng_1.warmup()
        eng_m.warmup()
        obs = _random_obs(rng, cfg, 1)[0]
        single = eng_1.predict(obs, pred_len=4, timeout=120)
        sharded = eng_m.predict(obs, pred_len=4, timeout=120)
        # same per-sample kernel math on every chip's slice: the padded
        # single-device batch and the padded shards quantize identically
        np.testing.assert_allclose(sharded.trajs, single.trajs,
                                   atol=1e-4)
        np.testing.assert_allclose(sharded.logprobs, single.logprobs,
                                   atol=1e-5)
    finally:
        eng_1.close()
        eng_m.close()
