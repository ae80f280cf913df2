"""Wetting droplet spread, contact angle 0.75pi (reference: demo_2d_LBM_droplet_spread.py)."""
from _driver import density_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import hcz_step_impl, scenes

if __name__ == "__main__":
    opt = parse_args((130, 130), extra=[("gravity_strength", 1e-5, "Gravity")])
    opt.total_steps = opt.total_steps if opt.total_steps != 1000 else 4000
    params, state = scenes.droplet_spread_2d(tuple(opt.res), gravity=opt.gravity_strength)
    run_demo("2d_LBM_droplet_spread", params, state, hcz_step_impl,
             opt.total_steps, opt.io_interval, density_frame)
