"""3D ferrofluid two-droplet merge (reference: demo_3d_LBM_two_droplets.py)."""
from _driver import density_interior_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import ferrofluid_step_impl, scenes

if __name__ == "__main__":
    opt = parse_args((50, 50, 193), extra=[("mag_strength", 100.0, "Magnetic strength"),
                                           ("gravity_strength", 0.0, "Gravity")])
    opt.total_steps = opt.total_steps if opt.total_steps != 1000 else 8000
    params, state = scenes.two_droplets_3d(
        tuple(opt.res), mag_strength=opt.mag_strength, gravity=opt.gravity_strength)
    run_demo(f"3d_LBM_two_droplets_mag{int(opt.mag_strength)}", params, state,
             ferrofluid_step_impl, opt.total_steps, opt.io_interval,
             density_interior_frame)
