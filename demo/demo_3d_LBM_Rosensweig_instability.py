"""3D Rosensweig instability — the north-star demo
(reference: demo_3d_LBM_Rosensweig_instability.py).

``--tpu_layout 1`` runs the SAME physics in the padded transposed layout
(scenes.rosensweig_3d_tpu): the full fused fast path engages at the
native 130x66x130 resolution — measured 243.5 physical-cell MLUPS vs
32.6 for the plain layout (docs/PERFORMANCE.md); artifacts are sliced
back to the reference orientation via scenes.phys_view."""
from _driver import density_interior_frame, parse_args, run_demo
from lbm_ferrofluid_tpu.models import ferrofluid_step_impl, phi_field, scenes

if __name__ == "__main__":
    opt = parse_args((130, 66, 130), extra=[("mag_strength", 100.0, "Magnetic strength"),
                                            ("gravity_strength", 1e-4, "Gravity"),
                                            ("tpu_layout", 0.0, "1 = padded transposed fast-path layout")])
    opt.total_steps = opt.total_steps if opt.total_steps != 1000 else 8000
    scene = scenes.rosensweig_3d_tpu if opt.tpu_layout else scenes.rosensweig_3d
    params, state = scene(
        tuple(opt.res), mag_strength=opt.mag_strength, gravity=opt.gravity_strength)
    frame = density_interior_frame
    if opt.tpu_layout:
        def frame(state, filename, _base=density_interior_frame):
            import dataclasses
            den = scenes.phys_view(params, state.density)
            _base(dataclasses.replace(state, density=den), filename)
    try:  # rendered frames once the soft-rasterizer stack is available
        from lbm_ferrofluid_tpu.render import render_phi_frame  # noqa: F401

        def frame(state, filename):
            phi = scenes.phys_view(params, phi_field(params, state))
            render_phi_frame(phi, filename, phi.shape[2:], 1.0)
    except ImportError:
        pass
    state = run_demo(f"3d_LBM_Rosensweig_mag{int(opt.mag_strength)}", params, state,
                     ferrofluid_step_impl, opt.total_steps, opt.io_interval, frame)
    # final mesh export, as the reference (demo_3d_LBM_Rosensweig_instability.py:221-232)
    from lbm_ferrofluid_tpu.render import phi_to_mesh
    from lbm_ferrofluid_tpu.utils.io import export_obj

    phi = scenes.phys_view(params, phi_field(params, state))
    verts, faces = phi_to_mesh(phi, phi.shape[2:], opt.dx)
    export_obj("Rosensweig_instability.obj", verts, faces)
    print(f"exported Rosensweig_instability.obj ({len(faces)} faces)")
