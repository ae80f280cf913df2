"""HBM traffic model for the fused-kernel ferrofluid step.

This is the denominator of the bench's ``pct_roofline``: the minimum HBM
bytes one outer step moves per cell on the Pallas fast path, counting every
kernel's operand reads+writes at their storage widths and ignoring
VMEM-resident reuse inside a kernel.

It lives HERE, next to the dispatch logic it mirrors (ferrofluid.py /
ops/pallas gates), so kernel-structure changes and this model evolve in the
same review unit — bench.py only calls it.  Whenever a dispatch gate in
``ferrofluid_step_impl`` changes (mac-carry, capillogue, wavefront depth,
emission modes), update the matching branch below.
"""

from __future__ import annotations

B4 = 4  # f32 bytes


def model_bytes_per_cell(n_iters: int = 30, b_fg: int = 4, b_h: int = 4,
                         res=(256,) * 3, scalar: bool = True) -> float:
    """Minimum HBM traffic per cell per outer step for the fused-kernel path.

    ``scalar``: the tau==1 scalar Poisson collapse's PHYSICS gates hold
    (tau == 1, shell obstacles, axis-aligned H_ext — true for the
    flagship bench config); the shape gate is checked here.  The solve
    then moves the fused 2-channel f32 (s, s_prev) pair instead of
    19-channel h, in EVERY storage mode (s2 is f32 regardless of b_h).
    """
    import jax.numpy as jnp

    from ..ops.pallas.capillogue import capillogue_fits
    from ..ops.pallas.fused_step import emit_mac_fits
    from ..ops.pallas.poisson import _wf_plan
    from ..ops.pallas.scalar_poisson import (
        _sp_plan,
        scalar_wavefront_hint_ok,
    )

    total = 0.0
    fg_dtype = jnp.bfloat16 if b_fg == 2 else jnp.float32
    mac_carry = emit_mac_fits((1, 19, *res), fg_dtype)
    capillogue = capillogue_fits((1, 19, *res), fg_dtype) and mac_carry
    if mac_carry:
        # mac-carry (primed premac): NO prologue pass — the previous
        # epilogue's trailing stage wrote the 9 f32 macro channels; this
        # step only reads them (inside the consuming fusions / capmac).
        # The capillogue branch below already counts the premac reads in
        # its own 12-channel read term — don't count them twice.
        if not capillogue:
            total += 9 * B4
    else:
        # VMEM-gated (f32 storage at 256^2 planes): separate ring-pipelined
        # prologue — r 19f + 19g + flags + rho + 3 vel; w 9 f32 macro
        total += (38 * b_fg + 4 + 4 * B4) + 9 * B4

    # poisson — scalar tau==1 collapse when it engages (round 4: decoupled
    # from the capillogue gate, so ALL storage modes ride it): the 1-channel
    # wavefront does k sweeps per HBM pass over the fused 2-channel f32
    # (s, s_prev) pair.  Per pass: s2 r+w in place (+ wrap re-reads and the
    # k-plane seam stash), cmask(f32) + rhs(f32) streamed.
    Z = res[0]
    if scalar and scalar_wavefront_hint_ok((1, 2, *res), jnp.float32,
                                           n_iters):
        k = _sp_plan((1, 2, *res), n_iters)
        passes = n_iters / k
        total += passes * (
            2 * B4 * (2 + 3 * k / Z)        # s2 r+w + wrap re-read + seam w
            + (1 + 2 * k / Z) * 2 * B4      # cmask + rhs streams
        ) + 1 * B4  # emit="h2": the final pass writes the 1-ch Kelvin H2
    else:
        # channel form: per pass r 19h * (1 + 2k/Z) + flags(i32) + rhs;
        # w 19h (+ H2, last pass)
        h_dtype = jnp.bfloat16 if b_h == 2 else jnp.float32
        k = _wf_plan((1, 19, *res), h_dtype, n_iters)
        if k >= 2:
            passes = n_iters / k
            total += passes * (
                19 * b_h * (2 + 2 * k / Z) + (1 + 2 * k / Z) * (B4 + 4)
            ) + 1 * B4  # emit="h2": the 1-channel Kelvin H2 written by the
            # final pass — psi, the substitution pass, the grad launch AND
            # the 3-channel H_int all stay in VMEM (H_ext folded constant)
        else:
            total += n_iters * ((19 * b_h + B4 + 4) + (19 * b_h + B4))
            total += 4 * B4  # psi r1 + H_int w3 via the separate grad pass

    if capillogue:
        # capillogue (steady state): capillary stage + collide + emission
        # in ONE pass — the Laplacian, gradients, dfai/dprho and the
        # epilogue's macro ring all stay in VMEM; the rhs build glue is
        # gone (emit_rhs carries the next step's rhs as a premac leaf)
        # and phi/force are elided write-only diagnostics.
        # r: 19f + 19g + flags + 12 f32 capillary channels (premac 9 +
        #    pres_old + rho_ca + H2) + mflags(i32);
        # w: 19f + 19g + 5 f32 state channels (vel/pres/density) +
        #    10 f32 emission channels (9 macros + next-step rhs)
        total += (38 * b_fg + 2 * 4 + 12 * B4) + 38 * b_fg + 15 * B4
        # contact-angle kernel (contact3d): r rho + flags; w rho_ca
        total += 2 * B4 + 4
    else:
        # rhs build (un-padded staggered-diff of chi): ~r 2 + w 1 f32
        total += 3 * B4
        # phi + contact-angle glue: ~r 2 w 2 (H2 assembly is gone)
        total += 4 * B4
        # laplacian folded into capmac (lap=None): no separate pass
        # fused capillary gradmac: r 13 f32 channels + flags; w 13 f32
        # channels (gradients and recovery intermediates stay in VMEM)
        total += (13 * B4 + 4) + 13 * B4
        # epilogue (re-stream + fused collide of f and g, in place, + the
        # trailing emit_mac prologue stage when it fits): r 19f + 19g +
        # flags + 15 f32 macro channels DMA'd straight from their
        # producers; w 19f + 19g (+ 9 f32 next-step macro channels)
        total += (38 * b_fg + 4 + 15 * B4) + 38 * b_fg
        if mac_carry:
            total += 9 * B4
    return total
