"""Measure achievable HBM stream rate vs DMA chunk depth on the real chip.

The capillogue's floor analysis (docs/PERFORMANCE.md) hinges on the rate
per-plane (C, 1, Y, X) ring DMAs actually achieve: CLAUDE.md records
~375 GB/s for that chunk shape at 256³ vs ~550 GB/s for large contiguous
transfers.  This probe streams the capillogue's dominant traffic pattern
— a 19-channel volume read once and written back in place through VMEM
ring buffers with a trivial VPU touch — at chunk depths of 1, 2 and 4
planes per DMA, isolating the chunk-size effect from everything else.
If depth 2+ recovers most of the gap, multi-plane ring slots are a real
round-5 lever for the fused kernels; if not, the per-plane rate IS the
achievable rate and the capillogue sits at its floor.

Usage: python tools/probe_dma_chunks.py [Z Y X] [dtype]
"""

from __future__ import annotations

import functools
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _stream_kernel(P, CH, PF, NS, *refs):
    """Read the volume plane-group-wise through a 4-slot input ring, add 1,
    write back through an NS-slot store ring — the fused kernels'
    steady-state DMA cadence with negligible compute.  ``PF`` is the
    input prefetch depth (DMAs in flight; 4-slot ring admits up to 3)."""
    in_ref, out_ref, in_ring, st_ring, sem_i, sem_o = refs

    def rem_(a, n):
        a = jnp.asarray(a)
        return jax.lax.rem(a, jnp.asarray(n, a.dtype))

    def in_cp(b):
        s = rem_(b, 4)
        return pltpu.make_async_copy(
            in_ref.at[:, pl.ds(b * CH, CH)],
            in_ring.at[:, pl.ds(s * CH, CH)],
            sem_i.at[s],
        )

    def out_cp(b):
        s = rem_(b, NS)
        return pltpu.make_async_copy(
            st_ring.at[:, pl.ds(s * CH, CH)],
            out_ref.at[:, pl.ds(b * CH, CH)],
            sem_o.at[s],
        )

    for b in range(PF):
        in_cp(b).start()

    def body(b, _):
        in_cp(b).wait()

        @pl.when(b + PF <= P - 1)
        def _():
            in_cp(b + PF).start()

        @pl.when(b - NS >= 0)
        def _():
            out_cp(b - NS).wait()

        s_in = rem_(b, 4)
        s_st = rem_(b, NS)
        for c in range(in_ring.shape[0]):
            for j in range(CH):
                st_ring[c, s_st * CH + j] = in_ring[c, s_in * CH + j] + 1.0
        out_cp(b).start()
        return 0

    jax.lax.fori_loop(0, P, body, 0)
    for d in range(NS, 0, -1):
        out_cp(P - d).wait()


@functools.partial(jax.jit, static_argnames=(
    "ch", "interpret", "pf", "ns", "alias",
))
def stream_pass(x, *, ch, interpret=False, pf=2, ns=2, alias=True):
    _, C, Z, Y, X = x.shape
    P = Z // ch
    call = pl.pallas_call(
        functools.partial(_stream_kernel, P, ch, pf, ns),
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((C, Z, Y, X), x.dtype)],
        scratch_shapes=[
            pltpu.VMEM((C, 4 * ch, Y, X), x.dtype),
            pltpu.VMEM((C, ns * ch, Y, X), x.dtype),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((ns,)),
        ],
        input_output_aliases={0: 0} if alias else {},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    return call(x[0])[0][None]


def main():
    res = (256, 256, 256)
    dtype = "bfloat16"
    args = sys.argv[1:]
    if len(args) >= 3:
        res = tuple(int(x) for x in args[:3])
        args = args[3:]
    if args:
        dtype = args[0]
    Z, Y, X = res
    dt = jnp.dtype(dtype)

    from lbm_ferrofluid_tpu.models.runner import sync
    from lbm_ferrofluid_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    print(f"devices: {jax.devices()}  res={res} dtype={dtype}", flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.uniform(-1, 1, (1, 19, Z, Y, X)).astype(np.float32)
    ).astype(dt)
    N = 10
    bytes_per_pass = 2 * 19 * Z * Y * X * dt.itemsize  # r + w

    for ch in (1, 2, 4):
        @jax.jit
        def reps(x, ch=ch):
            def body(c, _):
                return stream_pass(c, ch=ch), c[0, 0, 0, 0, 0]

            out, auxs = jax.lax.scan(body, x, None, length=N)
            return out, auxs[-1]

        try:
            t0 = time.time()
            out, a = reps(x)
            sync(a)
            tc = time.time() - t0
            t0 = time.time()
            out, a = reps(out)
            sync(a)
            dtm = (time.time() - t0) / N
            gbps = bytes_per_pass / dtm / 1e9
            print(f"chunk={ch} planes ({19 * ch * Y * X * dt.itemsize / 1e6:.2f}"
                  f" MB/DMA): {dtm * 1e3:.2f} ms/pass = {gbps:.0f} GB/s "
                  f"[compile {tc:.0f}s]", flush=True)
        except Exception as e:
            print(f"chunk={ch}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
