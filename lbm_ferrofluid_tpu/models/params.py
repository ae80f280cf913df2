"""Simulation parameters: one frozen, hashable, JSON-serializable dataclass.

Replaces the reference's ``SimulationParameters`` object + per-class
constructor kwargs (src/LBM/simulation/simulation_parameters.py:6-83).
Being frozen/hashable it is passed as a *static* argument to jitted step
functions, so every physics constant folds into the compiled program.
"""

from __future__ import annotations

import dataclasses
import json
import math

import numpy as np

from ..lattice import Lattice, get_lattice

__all__ = ["SimulationParams"]


@dataclasses.dataclass(frozen=True)
class SimulationParams:
    """Physics + numerics configuration (all static)."""

    dim: int = 2
    dx: float = 1.0
    dt: float = 1.0

    # relaxation times
    tau: float = 1.0  # single-phase BGK/KBC and the magnetic Poisson solve
    tau_f: float = 0.7  # HCZ order-parameter distribution
    tau_g: float = 0.7  # HCZ pressure distribution

    # multiphase densities: physical (density_*) and order parameter (rho_*)
    density_gas: float = 0.038
    density_fluid: float = 0.265
    rho_gas: float = 0.038
    rho_fluid: float = 0.265

    kappa: float = 0.08  # surface tension coefficient
    contact_angle: float = 0.5 * math.pi
    gravity: float = 0.0  # magnitude; acts along -y as in the reference
    k: float = 0.33  # magnetic susceptibility scale

    kbc_type: int | None = None  # None/LBGK or a KBCType value
    # Axis gravity acts along (negative direction; channel order x=0, y=1,
    # z=2).  The reference hard-codes -y (LBM_collision_3d.py:124-131);
    # the transposed TPU-native scene layouts (scenes.rosensweig_3d_tpu)
    # map the physical vertical onto the array z axis so the lane/sublane
    # axes can be OBSTACLE-padded to fused-kernel alignment without
    # touching the open (periodic) field axis.
    gravity_axis: int = 1
    mag_strength: float = 0.0
    # axis of the constant external field H_ext = mag_strength * e_axis
    # (channel order x=0, y=1, z=2; the Rosensweig demos drive along y).
    # init_ferrofluid_state builds state.H_ext from this, which lets the
    # step fold H_ext as a compile-time constant (the fused Poisson
    # kernel emits H2 = |H_ext - grad(psi)|^2 directly, ops/magnetic.py).
    h_ext_axis: int = 1
    poisson_iters: int = 30
    # Ghost-zone depth for the multi-chip Poisson loop: exchange k planes
    # every k sweeps instead of 1 plane per sweep (30 ring rounds/step ->
    # 30/k), trading ICI bandwidth for latency.  Bit-identical results for
    # any k (parallel/step3d.py:poisson_sweeps_sharded).
    poisson_halo_depth: int = 5
    # Geometry declaration: True promises the obstacle set of
    # state.magnetic_flags is contained in the x-edge columns plus (3D) the
    # two global z-edge planes — the standard ferrofluid scene pattern
    # mflags[..., 1:-1, :, 1:-1] = FLUID (reference
    # demo_3d_LBM_Rosensweig_instability.py:120-121).  Validated against
    # the concrete flags in init_ferrofluid_state.  With tau == 1 (the
    # magnetic relaxation erases h history: post-collision h is a pure
    # function of psi and rhs) this lets the multi-chip Poisson loop
    # refresh its depth-G ghost zones from the 1-channel f32 psi field
    # plus a thin true-h slice instead of 19-channel h planes — results
    # equal to within 1-2 ulp (FMA-contraction freedom; not bit-exact) at
    # ~2.5x less ICI volume on the step's dominant exchange
    # (parallel/step3d.py:_psi_refresh_ghosts).
    mag_flags_shell: bool = False
    # Escape hatch / A-B knob for the psi ghost refresh above; only
    # effective when mag_flags_shell is set and tau == 1.
    poisson_psi_halo: bool = True
    # A/B knob: False keeps the magnetic solve in channel form even
    # where the tau==1 scalar collapse could engage (round 5 made the
    # collapse reach every grid via the concrete boundary-only gate, so
    # geometry/declaration tricks no longer force the channel form —
    # evidence tools need an explicit switch).
    scalar_carry: bool = True
    # Round-5 s_prev sliver exchange for the sharded SCALAR solve: ship
    # the ghost bands' s_prev channel as a 2-column sliver + <=2 full
    # planes (bit-identical under the shell geometry; halves the band
    # bytes 8.4 -> 4.5 MB/side/round at the flagship).  DEFAULT OFF —
    # measured NET NEGATIVE on-chip: the reconstruct glue + 2 extra
    # collective launches per band cost ~2 ms/step slab-forced (647.7
    # vs 706.3 MLUPS at 256^3) against a ~0.16 ms/step projected ICI
    # saving at N=8 (docs/PERFORMANCE.md).  Kept opt-in for
    # re-evaluation on a real slice (where ICI byte cost is real and
    # per-launch cost may differ).
    scalar_sliver: bool = False

    # Fused Pallas TPU kernels.  XLA's SPMD partitioner cannot split a
    # custom call, so multi-chip runs either pass a ('batch','z') Mesh to the
    # step (explicit shard_map slab decomposition with ring halo exchange,
    # parallel/step3d.py) or disable this and take the jnp path, whose
    # rolls/stencils GSPMD lowers to ICI collective-permutes automatically.
    use_pallas: bool = True

    # Physical domain extent (z, y, x array order) when the state arrays
    # are OBSTACLE-padded past it to reach fused-kernel lane/sublane
    # alignment (scenes.rosensweig_3d_tpu: 130x66x130 native ->
    # 66x136x256 transposed+padded).  Full-way bounce-back walls are
    # absorbing (the lag-2 self-reflection, ops/scalar_poisson.py), so
    # thickening a wall leaves interior physics exactly invariant — but
    # two reference behaviors are tied to ARRAY faces, not walls, and the
    # step reproduces them at the physical seams when this is set:
    # contact-angle surgery (applied on the physical box in its original
    # orientation) and the magnetic-gradient obstacle-psi substitution +
    # output replicate (applied on the box before H2 composition).
    # None = arrays are the physical domain (every other scene).
    phys_extent: tuple[int, ...] | None = None

    # Storage dtype for the magnetic Poisson distribution h.  "bfloat16"
    # halves the dominant HBM traffic of the 30-sweep inner loop (compute
    # stays f32 in-register); NOT bit-parity with the reference — opt-in for
    # production runs that tolerate ~1e-3 relative H_int noise.
    h_dtype: str = "float32"

    # Storage dtype for the hydrodynamic distributions f and g ("bfloat16"
    # = turbo mode).  The 2x19 channels of f+g dominate the remaining HBM
    # traffic of a step; all collision/streaming arithmetic stays f32
    # in-register and macro fields (rho/vel/density/pressure/force) stay
    # f32.  NOT bit-parity with the reference; long-horizon interface
    # dynamics tracking vs f32 is asserted in tests/test_bf16_physics.py.
    fg_dtype: str = "float32"

    @property
    def lattice(self) -> Lattice:
        return get_lattice(self.dim)

    @property
    def Q(self) -> int:
        return self.lattice.q

    @property
    def c(self) -> float:
        return self.dx / self.dt

    @property
    def cs2(self) -> float:
        return self.c * self.c / 3.0

    def gravity_vec(self, dtype=np.float32) -> np.ndarray:
        """Gravity vector [1, dim, 1...] acting along -gravity_axis
        (reference: -y, LBM_collision_2d.py:104-111 / _3d.py:124-131;
        transposed TPU layouts use -z)."""
        g = np.zeros((1, self.dim, *([1] * self.dim)), dtype=dtype)
        g[0, self.gravity_axis] = -self.gravity
        return g

    @staticmethod
    def tau_from_reynolds(
        re: float, vmax: float, lmax: float, dx: float = 1.0, dt: float = 1.0
    ) -> float:
        """tau = 0.5 + nu/cs2 with nu = Vmax * Lmax / Re (demo_2d_LBM.py:32-36)."""
        c = dx / dt
        cs2 = c * c / 3.0
        return 0.5 + (vmax * lmax / re) / cs2

    # ------------------------------------------------------------------
    # JSON round trip (the reference has no config files; we add one)
    # ------------------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "SimulationParams":
        d = json.loads(s)
        if d.get("phys_extent") is not None:
            d["phys_extent"] = tuple(d["phys_extent"])  # hashability
        return cls(**d)

    def replace(self, **kw) -> "SimulationParams":
        return dataclasses.replace(self, **kw)
