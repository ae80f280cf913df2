"""Pure-function LBM operators (stream, moments, equilibria, collisions, magnetics)."""

from .collide import (
    bgk_collide,
    contact_angle_boundary,
    hcz_capillary,
    hcz_collide,
    kbc_collide,
    kbc_moment_split,
    sc_collide,
    sc_force,
    smooth_phi,
)
from .equilibrium import feq, gamma_quadratic, geq, heq
from .magnetic import magnetic_sweep, solve_H_int
from .moments import eos_pressure, macro_moments, rho_to_density, vorticity_2d
from .stencils import (
    isotropic_grad,
    isotropic_laplacian,
    staggered,
    staggered_x,
    staggered_y,
    staggered_z,
)
from .stream import bounce_back, stream, stream_bounce_macro, stream_bounce_moments

__all__ = [
    "stream",
    "bounce_back",
    "stream_bounce_moments",
    "stream_bounce_macro",
    "feq",
    "geq",
    "gamma_quadratic",
    "heq",
    "macro_moments",
    "rho_to_density",
    "eos_pressure",
    "vorticity_2d",
    "isotropic_grad",
    "isotropic_laplacian",
    "staggered",
    "staggered_x",
    "staggered_y",
    "staggered_z",
    "bgk_collide",
    "kbc_collide",
    "kbc_moment_split",
    "sc_force",
    "sc_collide",
    "smooth_phi",
    "contact_angle_boundary",
    "hcz_capillary",
    "hcz_collide",
    "magnetic_sweep",
    "solve_H_int",
]
