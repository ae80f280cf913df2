"""2D Rosensweig instability (reference: demo_2d_LBM_Rosensweig_instability.py)."""
from _driver import density_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import ferrofluid_step_impl, scenes

if __name__ == "__main__":
    opt = parse_args((130, 130), extra=[("mag_strength", 100.0, "Magnetic strength"),
                                        ("gravity_strength", 1e-4, "Gravity")])
    opt.total_steps = opt.total_steps if opt.total_steps != 1000 else 2000
    params, state = scenes.rosensweig_2d(
        tuple(opt.res), mag_strength=opt.mag_strength, gravity=opt.gravity_strength)
    run_demo(f"2d_LBM_Rosensweig_mag{int(opt.mag_strength)}", params, state,
             ferrofluid_step_impl, opt.total_steps, opt.io_interval, density_frame)
