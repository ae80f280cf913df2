"""Solver families (single-phase, multiphase, ferrofluid) built from ops."""

from . import ferrofluid, multiphase, singlephase
from .ferrofluid import (
    ferrofluid_step,
    ferrofluid_step_impl,
    init_ferrofluid_state,
    phi_field,
    prime_premac,
    make_H_ext,
)
from .multiphase import (
    hcz_step,
    hcz_step_impl,
    init_hcz_state,
    init_sc_state,
    sc_step,
    sc_step_impl,
)
from .params import SimulationParams
from .singlephase import init_state as init_singlephase_state
from .singlephase import step as singlephase_step
from .singlephase import step_impl as singlephase_step_impl
from .runner import SimulationRunner
from .state import FerrofluidState, HCZState, SinglePhaseState

__all__ = [
    "SimulationParams",
    "SinglePhaseState",
    "HCZState",
    "FerrofluidState",
    "singlephase",
    "multiphase",
    "ferrofluid",
    "init_singlephase_state",
    "singlephase_step",
    "singlephase_step_impl",
    "sc_step_impl",
    "hcz_step_impl",
    "ferrofluid_step_impl",
    "SimulationRunner",
    "init_sc_state",
    "sc_step",
    "init_hcz_state",
    "hcz_step",
    "init_ferrofluid_state",
    "phi_field",
    "ferrofluid_step",
    "prime_premac",
    "make_H_ext",
]
