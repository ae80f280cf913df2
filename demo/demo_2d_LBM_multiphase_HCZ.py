"""HCZ multiphase square drop (reference: demo_2d_LBM_multiphase_HCZ.py)."""
from _driver import density_interior_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import hcz_step_impl, scenes

if __name__ == "__main__":
    opt = parse_args((130, 130))
    opt.total_steps = opt.total_steps if opt.total_steps != 1000 else 4000
    params, state = scenes.multiphase_drop_hcz(tuple(opt.res))
    run_demo("2d_LBM_multiphase_HCZ", params, state, hcz_step_impl,
             opt.total_steps, opt.io_interval, density_interior_frame)
