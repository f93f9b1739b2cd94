#!/usr/bin/env python
"""Microbenchmark: TPU row-gather cost vs row width and row count,
plus a seeding-walk step sweep. Decides whether the occ-row layout
should shrink words-per-row (OCC_BLOCK) or row count."""

import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(HERE, "bench_cache", "jaxcache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print(jax.devices())

    rng = np.random.default_rng(0)
    n_rows_table = 80_000

    def probe(width, n_idx, iters=50):
        table = jnp.asarray(
            rng.integers(0, 2**31, (n_rows_table, width)).astype(np.uint32)
        )
        idx = jnp.asarray(
            rng.integers(0, n_rows_table, n_idx).astype(np.int32)
        )

        @jax.jit
        def go(t, ix):
            def body(i, acc):
                r = jnp.take(t, (ix + i) % n_rows_table, axis=0)
                return acc + r.sum(dtype=jnp.uint32)

            return jax.lax.fori_loop(0, iters, body, jnp.uint32(0))

        go(table, idx).block_until_ready()
        t0 = time.time()
        go(table, idx).block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"  width={width:3d} n_idx={n_idx:7d}: {dt*1e3:7.3f} ms/gather "
              f"({n_idx*width*4/dt/1e9:6.2f} GB/s, "
              f"{n_idx/dt/1e6:6.1f} Mrow/s)")

    print("[probe] row gathers")
    for width in (4, 8, 12, 16):
        probe(width, 163840)
    for n_idx in (40960, 81920, 163840, 327680):
        probe(12, n_idx)

    # elementwise baseline for per-step non-gather work
    def ew_probe(n, iters=50):
        a = jnp.asarray(rng.integers(0, 100, n).astype(np.int32))

        @jax.jit
        def go(a):
            def body(i, acc):
                x = acc + a
                x = jnp.where(x > 50, x - 3, x + 1)
                return x

            return jax.lax.fori_loop(0, iters, body, a)

        go(a).block_until_ready()
        t0 = time.time()
        go(a).block_until_ready()
        print(f"  elementwise n={n}: {(time.time()-t0)/iters*1e3:.3f} ms/step")

    print("[probe] elementwise")
    ew_probe(82000 * 15)  # ~walk state volume

    # walk step sweep: cost vs max_steps (per-step cost + fixed)
    import bench
    from megapath_tpu.align.params import MmpParams
    from megapath_tpu.align.seeding_jax import (
        DeviceFM, build_walkers, device_mmp_seed,
    )

    ref, fm, reads1, lens1, reads2, lens2 = bench.build_workload()
    dfm = DeviceFM.from_host(fm)
    allr = np.concatenate([reads1, reads2])
    all_lens = np.concatenate([lens1, lens2]).astype(np.int32)
    w, wl = build_walkers(jnp.asarray(allr), jnp.asarray(all_lens))
    mmp = MmpParams()
    print("[probe] walk step sweep")
    for ms in (64, 128, 192, 256, 364):
        out, st = device_mmp_seed(dfm, w, wl, mmp, max_seeds=8, max_steps=ms)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out, st = device_mmp_seed(
                dfm, w, wl, mmp, max_seeds=8, max_steps=ms
            )
            jax.block_until_ready(out)
        dt = (time.time() - t0) / 3
        print(f"  max_steps={ms:4d}: {dt:.3f}s "
              f"(active_end={int(np.asarray(st.active).sum())})")


if __name__ == "__main__":
    main()
