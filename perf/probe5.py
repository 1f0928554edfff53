"""Perf probe 5: multi-item Pallas linear-attention kernel vs the XLA path.

Round-1 finding: the single-item-per-program kernel lost to XLA (~8%) because
each program's matmul chain is fully data-dependent — the MXU idled between
small dots.  This probe measures the G-items-per-program redesign
(ops/linear_attention.py::_fused_kernel): big matmuls on the (G*N, .)
flattening, per-item contractions as independent batched dots.

Mosaic compile failures on some (shape, G) combinations SIGABRT the process,
so the sweep runs each case in a subprocess: `python probe5.py` drives;
`python probe5.py case <kind> <b> <n> <c> <g>` measures one cell and prints
one JSON line.

Methodology (see docs/perf_round2.md §1): the timed jit is a lax.scan chain
returning one scalar — no tunnel fetch, dependent steps like the sampler.
"""

import json
import subprocess
import sys

HEADS, DIM_HEAD, HIDDEN = 4, 32, 128
ITERS = 30
LEVELS = [(1024, 64), (256, 128), (64, 256), (16, 512)]


def run_case(kind, b, n, c, g):
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/runs/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    sys.path.insert(0, "/root/repo")
    from ldm_tpu.ops.linear_attention import (
        linear_attention_block_pallas,
        linear_attention_block_xla,
    )

    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (b, n, c), jnp.bfloat16)
    w = (
        jax.random.normal(ks[1], (c, 3 * HIDDEN), jnp.float32) * 0.2,
        jax.random.normal(ks[2], (HIDDEN, c), jnp.float32) * 0.2,
        jnp.zeros((c,), jnp.float32),
        jnp.ones((c,)), jnp.zeros((c,)), jnp.ones((c,)), jnp.zeros((c,)),
    )

    def xla_fn(x):
        return linear_attention_block_xla(
            x, *w, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16)

    def pallas_fn(x):
        return linear_attention_block_pallas(
            x, *w, heads=HEADS, dim_head=DIM_HEAD, compute_dtype=jnp.bfloat16,
            block_items=g)

    if kind == "agree":
        y_x = np.asarray(jax.jit(xla_fn)(x), np.float32)
        y_p = np.asarray(jax.jit(pallas_fn)(x), np.float32)
        err = float(np.abs(y_x - y_p).max() / max(np.abs(y_x).max(), 1e-6))
        print(json.dumps({"rel_err": err}))
        return

    fn = xla_fn if kind == "xla" else pallas_fn

    @jax.jit
    def run(x):
        def step(x, _):
            return fn(x), None
        y, _ = jax.lax.scan(step, x, None, length=ITERS)
        return y.astype(jnp.float32).mean()

    np.asarray(run(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x))
        times.append(time.perf_counter() - t0)
    print(json.dumps({"ms": min(times) / ITERS * 1e3}))


def drive(inproc=False):
    if inproc:
        # Post-fix mode: the Mosaic layout crash is gone, so run every case in
        # one process (a fresh subprocess pays ~80 s of Mosaic init each).
        # Results flush to probe5.json after every cell in case of an abort.
        import io
        from contextlib import redirect_stdout

        def cell(kind, b, n, c, g=0):
            buf = io.StringIO()
            try:
                with redirect_stdout(buf):
                    run_case(kind, b, n, c, g)
                return json.loads(buf.getvalue().strip().splitlines()[-1])
            except Exception as e:
                return {"fail": f"{type(e).__name__}: {str(e)[:160]}"}
    else:
        def cell(kind, b, n, c, g=0):
            r = subprocess.run(
                [sys.executable, __file__, "case", kind, str(b), str(n), str(c),
                 str(g)], capture_output=True, text=True, timeout=600)
            for line in r.stdout.splitlines():
                if line.startswith("{"):
                    return json.loads(line)
            return {"fail": (r.stderr or r.stdout).strip().splitlines()[-1][:200]
                    if (r.stderr or r.stdout).strip() else f"rc={r.returncode}"}

    results = {}

    def flush():
        with open("/root/repo/perf/probe5.json", "w") as f:
            json.dump(results, f, indent=2)

    for g in (1, 4, 8):
        results[f"agree_g{g}"] = cell("agree", 16, 256, 128, g)
        print(f"agree g={g}: {results[f'agree_g{g}']}", flush=True)
        flush()
    for b in (128, 512):
        for n, c in LEVELS:
            row = {"xla_ms": cell("xla", b, n, c).get("ms")}
            results[f"b{b}_n{n}_c{c}"] = row
            for g in (1, 2, 4, 8, 16, 32):
                if b % g:
                    continue
                out = cell("pallas", b, n, c, g)
                row[f"g{g}"] = out.get("ms", out.get("fail"))
                flush()
            best = min((v for k, v in row.items()
                        if k.startswith("g") and isinstance(v, float)), default=None)
            row["best_speedup"] = (
                round(row["xla_ms"] / best, 2) if best and row["xla_ms"] else None)
            print(f"b={b} N={n} C={c}: {row}", flush=True)
            flush()
    print("done", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "case":
        run_case(sys.argv[2], *map(int, sys.argv[3:7]))
    else:
        drive(inproc="--inproc" in sys.argv)
