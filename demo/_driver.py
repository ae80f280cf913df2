"""Shared demo-driver plumbing: argparse, step loop, PNG/mp4 artifacts.

Replaces the reference demos' open-coded loops (demo/demo_2d_LBM.py:101-134)
with the chunked SimulationRunner; artifacts (min-max normalized PNGs every
10 steps + an mp4) match the reference outputs.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from lbm_ferrofluid_tpu.models import SimulationRunner  # noqa: E402
from lbm_ferrofluid_tpu.utils.io import mkdir, save_img  # noqa: E402


def parse_args(default_res, extra=()):
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    p.add_argument("--res", type=int, nargs="+", default=list(default_res),
                   help="Simulation grid size")
    p.add_argument("--total_steps", type=int, default=1000)
    p.add_argument("--dt", type=float, default=1.0)
    p.add_argument("--dx", type=float, default=1.0)
    p.add_argument("--io_interval", type=int, default=10)
    for name, default, help_ in extra:
        p.add_argument(f"--{name}", type=float, default=default, help=help_)
    return p.parse_args()


def run_demo(name, params, state, step_impl, total_steps, io_interval,
             frame_fn, out_dir=None):
    """Run the loop, saving a PNG via ``frame_fn(state, filename)`` every
    ``io_interval`` steps, then assemble an mp4."""
    here = pathlib.Path(__file__).resolve().parent
    out = pathlib.Path(out_dir) if out_dir else here / f"demo_data_{name}"
    mkdir(str(out))
    frames = []

    def io_fn(state):
        step = int(state.step)
        filename = str(out / f"{step:05d}.png")
        frame_fn(state, filename)
        frames.append(filename)

    runner = SimulationRunner(params, step_impl)
    io_fn(state)
    state = runner.run(state, total_steps, io_interval=io_interval, io_fn=io_fn)

    try:
        import imageio

        with imageio.get_writer(str(here / f"{name}.mp4"), fps=25) as w:
            for f in frames:
                w.append_data(imageio.imread(f))
        print(f"wrote {here / f'{name}.mp4'} ({len(frames)} frames)")
    except Exception as e:  # imageio/codec may be absent headless
        print(f"mp4 skipped ({e}); {len(frames)} PNGs in {out}")
    return state


def density_frame(state, filename):
    save_img(state.density, filename)


def density_interior_frame(state, filename):
    dim = state.density.ndim - 2
    idx = (Ellipsis,) + tuple(slice(1, -1) for _ in range(dim))
    save_img(state.density[idx], filename)
