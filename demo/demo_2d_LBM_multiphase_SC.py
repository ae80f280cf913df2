"""Shan-Chen multiphase square drop (reference: demo_2d_LBM_multiphase_SC.py)."""
from _driver import density_interior_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import scenes, sc_step_impl

if __name__ == "__main__":
    opt = parse_args((130, 130))
    opt.total_steps = opt.total_steps if opt.total_steps != 1000 else 4000
    params, state = scenes.multiphase_drop_sc(tuple(opt.res))
    run_demo("2d_LBM_multiphase_SC", params, state, sc_step_impl,
             opt.total_steps, opt.io_interval, density_interior_frame)
