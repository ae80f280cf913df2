"""Velocity-forced wave pool, HCZ + KBC_A (reference: demo_2d_wave.py)."""
from _driver import density_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import hcz_step_impl, scenes

if __name__ == "__main__":
    opt = parse_args((130, 130))
    params, state = scenes.wave(tuple(opt.res))
    run_demo("2d_wave", params, state, hcz_step_impl,
             opt.total_steps, opt.io_interval, density_frame)
