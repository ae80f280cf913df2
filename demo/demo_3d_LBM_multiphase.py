"""3D HCZ cube drop (reference: demo_3d_LBM_multiphase.py)."""
from _driver import density_interior_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import hcz_step_impl, scenes

if __name__ == "__main__":
    opt = parse_args((130, 130, 130))
    params, state = scenes.multiphase_3d(tuple(opt.res))
    run_demo("3d_LBM_multiphase", params, state, hcz_step_impl,
             opt.total_steps, opt.io_interval, density_interior_frame)
