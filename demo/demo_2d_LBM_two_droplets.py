"""Ferrofluid droplet merge under a vertical field (reference: demo_2d_LBM_two_droplets.py)."""
import numpy as np

from _driver import density_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import ferrofluid_step_impl, scenes
from lbm_ferrofluid_tpu.utils.io import dump_2d_plt


def frame_with_plt(state, filename):
    density_frame(state, filename)
    if int(state.step) == 400:  # Tecplot dump, as the reference at step 400
        dump_2d_plt(filename.replace(".png", ".plt"),
                    np.asarray(state.density), np.asarray(state.vel))

if __name__ == "__main__":
    opt = parse_args((98, 384), extra=[("mag_strength", 100.0, "Magnetic strength"),
                                       ("gravity_strength", 0.0, "Gravity")])
    opt.total_steps = opt.total_steps if opt.total_steps != 1000 else 8000
    params, state = scenes.two_droplets_2d(
        tuple(opt.res), mag_strength=opt.mag_strength, gravity=opt.gravity_strength)
    run_demo(f"2d_LBM_two_droplets_mag{int(opt.mag_strength)}", params, state,
             ferrofluid_step_impl, opt.total_steps, opt.io_interval, frame_with_plt)
