"""Serving subsystem: batcher semantics, determinism, HTTP surface.

The fake-sampler tests pin the service contract (routing, padding,
per-slot determinism, rejection) without paying model compiles; one smoke
test runs the real tiny-UNet DDIM path end to end through the builder.
"""

import json
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm_tpu.serving import GenerationHTTPServer, GenerationService

NUM_CLASSES = 10
SHAPE = (4, 4, 1)


def class_coded_sampler(key, classes, x_init):
    """Every pixel of slot j = the class id, scaled into [-1, 1]."""
    v = (classes.astype(jnp.float32) + 0.5) / NUM_CLASSES * 2.0 - 1.0
    return jnp.broadcast_to(v[:, None, None, None], (classes.shape[0],) + SHAPE)


def xinit_sampler(key, classes, x_init):
    """Output depends ONLY on the per-slot x_T — the DDIM(eta=0) structure."""
    return jnp.tanh(x_init)


def expected_class_pixel(c: int) -> int:
    v = (c + 0.5) / NUM_CLASSES * 2.0 - 1.0
    return int(np.clip((v + 1.0) / 2.0, 0, 1) * 255)


def make_service(sampler=class_coded_sampler, **kw):
    kw.setdefault("image_shape", SHAPE)
    kw.setdefault("num_classes", NUM_CLASSES)
    kw.setdefault("batch_size", 4)
    kw.setdefault("max_delay_s", 0.05)
    return GenerationService(sampler, **kw)


@pytest.mark.parametrize("use_native", [True, False])
def test_routing_and_coalescing(use_native):
    """Concurrent requests each get THEIR class's images, coalesced into
    fewer batches than requests-worth of singleton dispatches.
    Parametrized over the C++ slot-queue path and the pure-Python
    fallback — identical contract."""
    with make_service(batch_size=8, use_native=use_native) as svc:
        futures = {c: svc.submit(c, n=3) for c in range(5)}
        for c, fut in futures.items():
            imgs = fut.result(timeout=30)
            assert imgs.shape == (3,) + SHAPE and imgs.dtype == np.uint8
            assert (imgs == expected_class_pixel(c)).all()
    s = svc.stats()
    assert s.requests == 5 and s.images == 15
    # 15 slots at batch 8 coalesce into a few batches, never 15 singletons
    assert s.batches - 1 <= 5  # minus the warmup batch
    assert s.latency_p50_s > 0


def test_mixed_class_request():
    with make_service() as svc:
        imgs = svc.submit([1, 7, 3], n=3).result(timeout=30)
    assert [int(i[0, 0, 0]) for i in imgs] == [
        expected_class_pixel(1), expected_class_pixel(7), expected_class_pixel(3)
    ]


def test_per_slot_determinism_across_batch_compositions():
    """The same (seed, n) request returns bit-identical images no matter what
    other traffic rode in its batches — the serving-DDIM invariant."""
    with make_service(xinit_sampler, batch_size=4) as svc:
        a = svc.submit(0, n=3, seed=123).result(timeout=30)
    # different service, different traffic mix, larger batch
    with make_service(xinit_sampler, batch_size=8) as svc2:
        noise = [svc2.submit(c % NUM_CLASSES, n=2, seed=c) for c in range(3)]
        b = svc2.submit(0, n=3, seed=123).result(timeout=30)
        for f in noise:
            f.result(timeout=30)
    np.testing.assert_array_equal(a, b)
    # different seed differs
    with make_service(xinit_sampler) as svc3:
        c = svc3.submit(0, n=3, seed=124).result(timeout=30)
    assert not np.array_equal(a, c)


def test_requests_larger_than_batch_span_batches():
    with make_service(batch_size=4) as svc:
        imgs = svc.submit(2, n=11).result(timeout=30)
    assert imgs.shape == (11,) + SHAPE
    assert (imgs == expected_class_pixel(2)).all()
    assert svc.stats().batches - 1 >= 3  # 11 slots / 4 per batch (+ warmup)


def test_validation_and_lifecycle():
    svc = make_service()
    with pytest.raises(RuntimeError, match="not running"):
        svc.submit(0)
    svc.start(warmup=False)
    with pytest.raises(ValueError, match="class ids"):
        svc.submit(NUM_CLASSES)
    with pytest.raises(ValueError, match="positive"):
        svc.submit(0, n=0)
    with pytest.raises(ValueError, match="length n"):
        svc.submit([1, 2], n=3)
    fut = svc.submit(4, n=2)
    assert fut.result(timeout=30).shape == (2,) + SHAPE
    svc.stop()
    with pytest.raises(RuntimeError, match="not running"):
        svc.submit(0)


@pytest.mark.parametrize("use_native", [True, False])
def test_queue_full_rejects_cleanly(use_native):
    svc = make_service(batch_size=1, queue_limit=1, use_native=use_native)
    blocker = threading.Event()
    compiled = svc._compiled

    def blocking(*args):  # hold the worker mid-batch so the queue backs up
        blocker.wait(30)
        return compiled(*args)

    svc._compiled = blocking
    svc.start(warmup=False)
    first = svc.submit(0, n=1)
    time.sleep(0.2)  # worker now blocked inside its first dispatch
    fut = svc.submit(1, n=8)  # 8 slots into a 1-slot queue
    with pytest.raises(RuntimeError, match="queue is full"):
        fut.result(timeout=30)
    blocker.set()
    assert first.result(timeout=30).shape == (1,) + SHAPE
    svc.stop()
    assert svc.stats().rejected == 1


@pytest.mark.parametrize("use_native", [True, False])
def test_worker_failure_fails_futures_not_hangs(use_native):
    """A sampler that raises must fail every pending future promptly (and
    mark the service dead) — not strand clients on futures nobody resolves."""
    svc = make_service(use_native=use_native)

    def exploding(*args):
        raise ValueError("device fell over")

    svc._compiled = exploding
    svc.start(warmup=False)
    futs = [svc.submit(c % NUM_CLASSES, n=2) for c in range(3)]
    for f in futs:
        with pytest.raises(RuntimeError, match="worker failed"):
            f.result(timeout=10)
    # the service is dead and says why
    deadline = time.monotonic() + 5
    while svc._failure is None and time.monotonic() < deadline:
        time.sleep(0.01)
    with pytest.raises(RuntimeError, match="service failed"):
        svc.submit(0)
    svc.stop()


def test_stop_drains_inflight_work():
    svc = make_service(batch_size=2)
    svc.start(warmup=False)
    futs = [svc.submit(c % NUM_CLASSES, n=2) for c in range(6)]
    svc.stop()
    for f in futs:
        assert f.result(timeout=5).shape == (2,) + SHAPE


# ------------------------------------------------------------------- HTTP


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_surface():
    with make_service() as svc, GenerationHTTPServer(svc) as server:
        url = server.address
        with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
            assert json.loads(r.read()) == {"ok": True}

        code, out = _post(url + "/generate",
                          {"class_id": 3, "n": 2, "seed": 7, "format": "npy"})
        assert code == 200 and len(out["images"]) == 2
        import base64
        import io

        arr = np.load(io.BytesIO(base64.b64decode(out["images"][0])))
        assert arr.shape == SHAPE and (arr == expected_class_pixel(3)).all()

        code, out = _post(url + "/generate", {"class_id": 5, "format": "png"})
        assert code == 200 and len(out["images"]) == 1
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
        assert img.size == (SHAPE[1], SHAPE[0])
        assert np.asarray(img)[0, 0] == expected_class_pixel(5)

        # stats reflect traffic
        with urllib.request.urlopen(url + "/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 2 and stats["images"] >= 3

        # error paths
        assert _post(url + "/generate", {"n": 1})[0] == 400  # no class_id
        assert _post(url + "/generate", {"class_id": 99})[0] == 400
        assert _post(url + "/generate", {"class_id": 0, "format": "gif"})[0] == 400
        assert _post(url + "/nope", {})[0] == 404


def test_http_concurrent_clients():
    """N client threads hammer the server; every response is correct."""
    with make_service(batch_size=8) as svc, GenerationHTTPServer(svc) as server:
        url = server.address + "/generate"
        results = {}

        def client(c):
            code, out = _post(url, {"class_id": c, "n": 2, "format": "npy"})
            results[c] = (code, out)

        threads = [threading.Thread(target=client, args=(c,)) for c in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(60)
        import base64
        import io

        for c, (code, out) in results.items():
            assert code == 200
            arr = np.load(io.BytesIO(base64.b64decode(out["images"][0])))
            assert (arr == expected_class_pixel(c)).all()
    assert svc.stats().batches - 1 <= 8  # coalesced, not 12 singleton batches


# ------------------------------------------------------- real-model smoke


def test_builder_real_model_smoke(tmp_path):
    """Tiny pixel UNet through the builder: checkpoint → service → images."""
    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.factory import build_model
    from ldm_tpu.serving.builder import build_generation_service
    from ldm_tpu.training import checkpoint as ckpt

    cfg = Config(
        project_name="serve", workdir=str(tmp_path), use_amp=False, seed=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=NUM_CLASSES,
        )),
        diffusion=DiffusionConfig(n_steps=8, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    cfg.create_dirs()
    model = build_model(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    ckpt.save_params(f"{cfg.checkpoints}/diffusion_model_ema.msgpack", params)

    with pytest.raises(FileNotFoundError):
        build_generation_service(cfg, checkpoint=str(tmp_path / "nope.msgpack"))

    with pytest.raises(ValueError):
        build_generation_service(cfg, sampler="euler")

    # both deterministic few-step samplers serve and are seed-reproducible
    for sampler in ("ddim", "dpmpp"):
        svc = build_generation_service(
            cfg, sampler=sampler, ddim_steps=2, batch_size=4, max_delay_s=0.01,
        )
        with svc:
            a = svc.submit(1, n=2, seed=5).result(timeout=120)
            b = svc.submit(1, n=2, seed=5).result(timeout=120)
        assert a.shape == (2, 8, 8, 1) and a.dtype == np.uint8
        np.testing.assert_array_equal(a, b)  # eta=0: seed-deterministic


# ------------------------------------------------------------ mesh serving


def test_mesh_serving_matches_single_device():
    """DP serving over the 8-device mesh: outputs bit-identical to the
    meshless service (per-slot determinism is placement-independent), and
    the compiled program's output is genuinely batch-sharded."""
    from ldm_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    n_dev = mesh.shape["data"] * mesh.shape["model"]
    assert n_dev == 8  # conftest's virtual CPU mesh

    reqs = [(c, 3, 100 + c) for c in range(5)]  # (class, n, seed)
    outs = {}
    for name, kw in (("plain", {}), ("mesh", {"mesh": mesh})):
        with make_service(xinit_sampler, batch_size=8, **kw) as svc:
            futs = [svc.submit(c, n=n, seed=s) for c, n, s in reqs]
            outs[name] = [f.result(timeout=60) for f in futs]
    for a, b in zip(outs["plain"], outs["mesh"]):
        np.testing.assert_array_equal(a, b)

    # the dispatch really shards: 8 slots over 8 devices
    svc = make_service(xinit_sampler, batch_size=8, mesh=mesh)
    out = svc._dispatch([])
    assert len(out.sharding.device_set) == 8


def test_mesh_serving_batch_divisibility():
    from ldm_tpu.parallel.mesh import create_mesh

    with pytest.raises(ValueError, match="divide"):
        make_service(batch_size=6, mesh=create_mesh())


def test_builder_mesh_smoke(tmp_path):
    """Tiny real UNet served over the mesh through the builder."""
    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.factory import build_model
    from ldm_tpu.parallel.mesh import create_mesh
    from ldm_tpu.serving.builder import build_generation_service
    from ldm_tpu.training import checkpoint as ckpt

    cfg = Config(
        project_name="serve_mesh", workdir=str(tmp_path), use_amp=False,
        seed=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=NUM_CLASSES,
        )),
        diffusion=DiffusionConfig(n_steps=8, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    cfg.create_dirs()
    model = build_model(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    ckpt.save_params(f"{cfg.checkpoints}/diffusion_model_ema.msgpack", params)

    single = build_generation_service(
        cfg, sampler="dpmpp", ddim_steps=2, batch_size=8, max_delay_s=0.01)
    meshed = build_generation_service(
        cfg, sampler="dpmpp", ddim_steps=2, batch_size=8, max_delay_s=0.01,
        mesh=create_mesh())
    with single:
        a = single.submit(1, n=2, seed=5).result(timeout=120)
    with meshed:
        b = meshed.submit(1, n=2, seed=5).result(timeout=120)
    np.testing.assert_array_equal(a, b)


# ---------------------------------------------------- per-slot-key samplers


def slotkey_sampler(key, classes, x_init, slot_keys):
    """Multistep-consistency-shaped fake: output mixes the slot's x_T with
    noise drawn from ITS slot key — batching-invariant only if the service
    really passes per-slot keys."""
    extra = jax.vmap(
        lambda k: jax.random.normal(jax.random.fold_in(k, 1), SHAPE)
    )(slot_keys)
    return jnp.tanh(x_init + 0.5 * extra)


def test_per_slot_keys_batching_invariance():
    """A request's images are identical whether it rode alone or packed
    with other traffic — even for samplers that draw noise mid-loop."""
    outs = {}
    for scenario in ("alone", "packed"):
        with make_service(slotkey_sampler, batch_size=8,
                          per_slot_keys=True) as svc:
            if scenario == "packed":
                svc.submit(7, n=5, seed=999)  # rides in the same batch
            outs[scenario] = svc.submit(2, n=3, seed=5).result(timeout=60)
    np.testing.assert_array_equal(outs["alone"], outs["packed"])


def test_builder_consistency_smoke(tmp_path):
    """Distilled-student serving through the builder: consistency checkpoint
    → 2-step guidance-free sampling, seed-deterministic."""
    from ldm_tpu.config import Config, DataConfig, DiffusionConfig, ModelConfig
    from ldm_tpu.factory import build_model
    from ldm_tpu.serving.builder import build_generation_service
    from ldm_tpu.training import checkpoint as ckpt

    cfg = Config(
        project_name="serve_cm", workdir=str(tmp_path), use_amp=False, seed=0,
        model=ModelConfig(params=dict(
            in_channels=1, out_channels=1, channels=8,
            channel_multipliers=[1], num_classes=NUM_CLASSES,
        )),
        diffusion=DiffusionConfig(n_steps=8, cfg_scale=3),
        data=DataConfig(dataset="SYNTHETIC", image_size=8, image_channels=1),
    )
    cfg.create_dirs()
    model = build_model(cfg)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 8, 8, 1)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
    )
    ckpt.save_params(f"{cfg.checkpoints}/consistency_model_ema.msgpack", params)

    svc = build_generation_service(
        cfg, sampler="consistency", ddim_steps=2, batch_size=4,
        max_delay_s=0.01,
    )
    with svc:
        a = svc.submit(1, n=2, seed=5).result(timeout=120)
        b = svc.submit(1, n=2, seed=5).result(timeout=120)
    assert a.shape == (2, 8, 8, 1) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)


def test_native_and_python_paths_bit_identical():
    """The C++ slot-queue path and the Python fallback produce bit-identical
    images for the same (seed, n) requests — the per-slot x_T contract is
    path-independent."""
    from ldm_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    outs = []
    for use_native in (True, False):
        with make_service(xinit_sampler, batch_size=4,
                          use_native=use_native) as svc:
            assert (svc._slotq is not None) == use_native
            outs.append(svc.submit(3, n=5, seed=42).result(timeout=30))
    np.testing.assert_array_equal(outs[0], outs[1])

@pytest.mark.parametrize("use_native", [True, False])
def test_backpressure_top_up_fills_pad_slots(use_native):
    """While the dispatch→fulfil handoff queue is full, the batcher keeps
    filling a partial batch instead of shipping pad slots (the probe40
    slow-cadence 19%-padding pathology).  Deterministic white-box setup:
    the handoff queue is pre-filled so the batcher is provably inside the
    top-up loop when the second request lands."""
    if use_native:
        from ldm_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
    svc = make_service(batch_size=4, max_delay_s=0.01, use_native=use_native)
    if use_native:
        assert svc._slotq is not None
    else:
        svc._slotq = None  # force the Python fallback path
    for _ in range(svc._fulfil_q.maxsize):  # saturate the handoff queue
        svc._fulfil_q.put("sentinel")
    batcher = threading.Thread(target=svc._run, daemon=True)
    svc._worker = batcher  # satisfy submit()'s liveness check
    svc.submit(1, n=2)
    batcher.start()
    time.sleep(0.2)  # initial collect window (10 ms) long expired
    svc.submit(2, n=2)  # lands while the batcher is in the top-up loop
    deadline = time.monotonic() + 5.0
    depth = (svc._slotq.depth if svc._slotq is not None
             else svc._queue.qsize)
    while depth() > 0 and time.monotonic() < deadline:
        time.sleep(0.005)
    assert depth() == 0, "top-up never drained the queued slots"
    # unblock the batcher's put(): drain sentinels, then take the real batch
    assert svc._fulfil_q.get(timeout=5) == "sentinel"
    assert svc._fulfil_q.get(timeout=5) == "sentinel"
    assert svc._fulfil_q.get(timeout=5) == "sentinel"
    item = svc._fulfil_q.get(timeout=5)
    if use_native:
        out, count, req_ids, slot_is = item
        assert count == 4
    else:
        out, slots = item
        assert len(slots) == 4
    s = svc.stats()
    assert s.batches == 1 and s.padded_slots == 0
    svc._stop.set()
    assert svc._fulfil_q.get(timeout=5) is None  # drain sentinel on exit
    batcher.join(timeout=5)
    assert not batcher.is_alive()


@pytest.mark.parametrize("use_native", [True, False])
def test_submit_racing_worker_death_fails_future(use_native):
    """ADVICE r4 race: a worker failure landing BETWEEN submit()'s liveness
    check and its enqueue must fail the future, not hang the client.  The
    failure sweep (_fail/_fail_native) only sees slots already in the queue,
    so without submit()'s post-enqueue re-check this request would be
    registered with both worker threads dead and nobody left to resolve it.
    Injected deterministically: the enqueue primitive runs the sweep first."""
    with make_service(use_native=use_native) as svc:
        svc.submit(0, n=1).result(timeout=30)  # service is demonstrably live
        boom = RuntimeError("boom")
        if svc._slotq is not None:
            real = svc._slotq.submit

            def racy(req_id, dst, seed, ids):
                svc._fail_native(boom, [])  # sweep runs BEFORE the slots land
                return real(req_id, dst, seed, ids)

            svc._slotq.submit = racy
        else:
            real_put = svc._queue.put_nowait
            fired = []

            def racy_put(item):
                if not fired:
                    fired.append(1)
                    svc._fail(boom, [])  # sweep drains BEFORE this slot lands
                real_put(item)

            svc._queue.put_nowait = racy_put
        fut = svc.submit(1, n=2)
        with pytest.raises(RuntimeError, match="died during submission|boom"):
            fut.result(timeout=5)  # pre-fix: hangs to timeout
