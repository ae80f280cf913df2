"""2D single-phase shear layer, BGK (reference: demo/demo_2d_LBM.py)."""
from _driver import parse_args, run_demo
from lbm_ferrofluid_tpu.models import scenes, singlephase_step_impl
from lbm_ferrofluid_tpu.ops import vorticity_2d
from lbm_ferrofluid_tpu.utils.io import save_img


def vort_frame(state, filename):
    save_img(vorticity_2d(state.vel, 1.0), filename)


if __name__ == "__main__":
    opt = parse_args((130, 130))
    params, state = scenes.shear_layer(tuple(opt.res), kbc=False)
    run_demo("2d_LBM", params, state, singlephase_step_impl,
             opt.total_steps, opt.io_interval, vort_frame)
