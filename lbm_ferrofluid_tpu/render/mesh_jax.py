"""On-device isosurface extraction: marching tetrahedra in JAX.

Closes the last host round-trip of the step->render loop (round-4 verdict
#4): ``render/mesh.py`` extracts on the host (numpy / native C++), so every
rendered frame was device -> host -> device.  This is the fixed-topology
twin: a jitted ``volume -> (verts, faces, count)`` whose output SHAPES are
static (a triangle budget), so the whole phi -> mesh -> soft-rasterize
pipeline compiles once and field data never leaves the device
(reference path: src/LBM/utils/io.py:50-84, mcubes.marching_cubes at
:59-61 with the same cell -> 6-tet decomposition as render/mesh.py).

Design:
* same 6-tet main-diagonal cell split and per-case triangle tables as
  ``render/mesh.py`` (flattened to dense [6, 16, 2-slot] arrays with a
  valid mask — compiler-friendly table lookup instead of per-case
  nonzero), same canonical (min-node-id) edge-interpolation order, so the
  emitted triangle SET matches the host extractor exactly (vertices are
  per-triangle here — no dedup — which is what the rasterizer consumes;
  OBJ export keeps the host path's deduped mesh),
* a ``lax.scan`` over z-slabs compacts active triangles into a static
  ``budget``-row buffer via prefix-sum scatter (the per-slab candidate
  set is small; the full-volume candidate tensor would be GBs),
* unused rows hold far-away degenerate triangles (the _bucket_mesh
  pattern) that the renderer's z clip rejects, so no mask is needed
  downstream; ``count`` reports the true triangle count (if
  ``count > budget`` the surface overflowed the budget and the caller
  should re-extract with a larger one).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import _CORNERS, _TABLE, _TETS

__all__ = ["marching_tetrahedra_jax", "phi_to_mesh_jax", "MT_FAR"]

MT_FAR = 1e6


def _dense_tables():
    """[6, 16, 2, 3, 2] cube-corner edge table + [6, 16, 2] valid mask."""
    tri = np.zeros((6, 16, 2, 3, 2), np.int32)
    valid = np.zeros((6, 16, 2), bool)
    for t, tet in enumerate(_TETS):
        for case in range(16):
            for s, edges in enumerate(_TABLE[case]):
                for e, (a, b) in enumerate(edges):
                    tri[t, case, s, e, 0] = tet[a]
                    tri[t, case, s, e, 1] = tet[b]
                valid[t, case, s] = True
    return tri, valid


_TRI_D, _VALID_D = _dense_tables()


@functools.partial(jax.jit, static_argnames=("level", "budget",
                                              "pad_vertex"))
def marching_tetrahedra_jax(volume, level: float = 0.0,
                            budget: int = 1 << 16,
                            pad_vertex: tuple | None = None):
    """Extract the ``volume == level`` isosurface on device.

    Args:
        volume: ``[D, H, W]`` scalar field (any float dtype; compute f32).
        level: iso value (static).
        budget: static triangle budget.

    Returns:
        verts ``[budget * 3, 3]`` f32 in index coords (i, j, k) —
        3 per-triangle vertices, unused rows at ``pad_vertex`` (default
        (MT_FAR,)*3).  Callers feeding a renderer should pick a pad
        point their camera CLIPS CHEAPLY (z beyond far, the
        render._bucket_mesh convention): a behind-camera point projects
        to garbage on-screen coordinates that overflow the tiled
        rasterizer's residual capacity and silently trigger its exact
        dense fallback — measured 13.6 s vs 2.0 s per 512-supersampled
        frame (phi_to_mesh_jax picks the right point);
        faces ``[budget, 3]`` int32 = arange (static topology);
        count ``[]`` int32 — true number of triangles found.
    """
    D, H, W = volume.shape
    vol = volume.astype(jnp.float32)
    lvl = jnp.float32(level)

    tri_t = jnp.asarray(_TRI_D)          # [6,16,2,3,2]
    valid_t = jnp.asarray(_VALID_D)
    corners = jnp.asarray(_CORNERS, jnp.int32)  # [8,3] (di,dj,dk)

    Hc, Wc = H - 1, W - 1
    jj = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 1)

    n_cand = Hc * Wc * 12  # 6 tets x up to 2 triangles per cell

    def slab(carry, planes):
        buf, cnt = carry
        i0, p0, p1 = planes  # cell-layer index + two z-planes [H, W]

        # corner values [Hc, Wc, 8] (corner index = di*4 + dj*2 + dk)
        planes2 = jnp.stack([p0, p1])
        c8 = jnp.stack(
            [
                planes2[int(c[0])][
                    int(c[1]):int(c[1]) + Hc, int(c[2]):int(c[2]) + Wc
                ]
                for c in _CORNERS
            ],
            axis=-1,
        )
        inside = (c8 < lvl).astype(jnp.int32)  # [Hc, Wc, 8]

        tris = []
        acts = []
        for t in range(6):
            tet = _TETS[t]
            case = (
                inside[..., int(tet[0])]
                + 2 * inside[..., int(tet[1])]
                + 4 * inside[..., int(tet[2])]
                + 8 * inside[..., int(tet[3])]
            )  # [Hc, Wc]
            for s in range(2):
                act = valid_t[t, case, s]                     # [Hc, Wc]
                edges = tri_t[t, case, s]                     # [Hc, Wc, 3, 2]
                # canonical (min node id) endpoint order — the host
                # extractor interpolates from the lower node id
                off = corners[edges]                          # [Hc,Wc,3,2,3]
                nid = (
                    (i0 + off[..., 0]) * H + (jj[..., None, None] + off[..., 1])
                ) * W + (kk[..., None, None] + off[..., 2])   # [Hc,Wc,3,2]
                swap = nid[..., 0] > nid[..., 1]
                ea = jnp.where(swap, edges[..., 1], edges[..., 0])
                eb = jnp.where(swap, edges[..., 0], edges[..., 1])
                va = jnp.take_along_axis(c8, ea, axis=-1)     # [Hc, Wc, 3]
                vb = jnp.take_along_axis(c8, eb, axis=-1)
                pa = corners[ea].astype(jnp.float32)          # [Hc,Wc,3,3]
                pb = corners[eb].astype(jnp.float32)
                tt = jnp.clip(
                    (lvl - va)
                    / jnp.where(vb == va, jnp.float32(1.0), vb - va),
                    0.0, 1.0,
                )[..., None]
                origin = jnp.stack(
                    [
                        jnp.broadcast_to(
                            jnp.float32(i0), (Hc, Wc)
                        ),
                        jj.astype(jnp.float32),
                        kk.astype(jnp.float32),
                    ],
                    axis=-1,
                )[..., None, :]                               # [Hc,Wc,1,3]
                p = origin + pa + tt * (pb - pa)              # [Hc,Wc,3,3]
                tris.append(p.reshape(-1, 3, 3))
                acts.append(act.reshape(-1))
        cand = jnp.concatenate(tris)                          # [n_cand,3,3]
        act = jnp.concatenate(acts)
        pos = jnp.cumsum(act.astype(jnp.int32)) - 1 + cnt
        ok = act & (pos < budget)
        dst = jnp.where(ok, pos, budget)                      # trash row
        buf = buf.at[dst].set(cand, mode="drop")
        return (buf, cnt + act.sum(dtype=jnp.int32)), None

    if pad_vertex is None:
        pad_vertex = (MT_FAR,) * 3
    buf0 = jnp.broadcast_to(
        jnp.asarray(pad_vertex, jnp.float32), (budget + 1, 3, 3)
    )
    idx = jnp.arange(D - 1, dtype=jnp.int32)
    (buf, count), _ = jax.lax.scan(
        slab, (buf0, jnp.int32(0)), (idx, vol[:-1], vol[1:])
    )
    verts = buf[:budget].reshape(budget * 3, 3)
    faces = jnp.arange(budget * 3, dtype=jnp.int32).reshape(budget, 3)
    return verts, faces, count


def phi_to_mesh_jax(phi, res, dx: float = 1.0, budget: int = 1 << 16):
    """Device twin of render.phi_to_mesh (reference utils/io.py:50-64):
    close the surface by padding the interior with phi.max, extract the
    -phi isosurface at 0, normalize vertices to [-1, 1].  Fully traced —
    usable inside a jitted step->render pipeline."""
    p = phi[0, 0] if phi.ndim == 5 else phi
    interior = p[1:-1, 1:-1, 1:-1]
    mx = jnp.max(p)
    closed = jnp.pad(interior, [(1, 1)] * 3, constant_values=0.0)
    edge = jnp.pad(
        jnp.zeros_like(interior), [(1, 1)] * 3, constant_values=1.0
    )
    closed = closed + edge * mx
    volume = -closed * (2.0 / max(res) / dx)
    # pad vertex chosen so the NORMALIZED pad lands at (0, 0, MT_FAR) —
    # the render._bucket_mesh convention, z-clipped by the renderer
    # (see marching_tetrahedra_jax docstring)
    m = max(res)
    pad = (res[0] / 2.0, res[1] / 2.0, MT_FAR * m / 2.0 + res[2] / 2.0)
    verts, faces, count = marching_tetrahedra_jax(
        volume, 0.0, budget, pad_vertex=pad
    )
    verts = (verts - jnp.asarray(res, jnp.float32) / 2.0) * (2.0 / max(res))
    return verts, faces, count
