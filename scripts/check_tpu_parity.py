"""On-TPU parity: fused Pallas kernels vs the pure-JAX path, end to end.

Renders the same small PO frame twice on the real chip — once with the
fused per-lens kernels engaged (default) and once with
``POTA_DISABLE_PALLAS`` semantics (use_pallas=False) — and compares.  The
interpret-mode unit tests (tests/test_po_pallas.py) pin the kernel math on
CPU; this script pins the *on-chip* compiled behavior, including the
name-keyed kernel resolution inside jit.

Run: ``python scripts/check_tpu_parity.py`` (needs the TPU backend).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from pota_tpu import CameraConfig, CameraType, RenderConfig
from pota_tpu.optics.fit import load_poly_lens
from pota_tpu.optics.focus import setup_po_camera
from pota_tpu.render import scene as sc
from pota_tpu.render.renderer import look_at, render_sample_stream, resolve_gaussian
from pota_tpu.render.splat import resolve_imager, splat_frame
from pota_tpu.utils.cache import enable_compilation_cache

FLAGSHIP = "angenieux__double_gauss__1953__49mm"


def main():
    enable_compilation_cache()
    assert jax.default_backend() != "cpu", "needs the TPU backend"
    poly = load_poly_lens(FLAGSHIP, degree=5)
    cfg = CameraConfig(
        camera_type=CameraType.POLYNOMIAL_OPTICS, lens_model=FLAGSHIP,
        fstop=2.8, focus_distance=20.0, vignetting_retries=2,
        splat_queue_mult=6,
    )
    state = setup_po_camera(poly, cfg)
    rc = RenderConfig(xres=96, yres=96, spp=2)
    scene = sc.lightgrid_scene(n=3, spacing=18.0, z=-150.0, radius=1.0,
                               intensity=40.0)
    m = look_at([0, 0, 0], [0, 0, -1])

    def render(use_pallas):
        @jax.jit
        def f(lens):
            stream = render_sample_stream(
                cfg, rc, scene, m, 0, po_lens=lens, po_state=state,
            )
            fb = splat_frame(cfg, rc, scene, stream, m, po_lens=lens,
                             po_state=state, use_pallas=use_pallas)
            return resolve_imager(rc, fb)

        return np.asarray(f(poly))

    img_kern = render(True)
    img_pure = render(False)
    finite = np.isfinite(img_kern).all() and np.isfinite(img_pure).all()
    diff = np.abs(img_kern - img_pure)
    denom = np.maximum(np.abs(img_pure), 1e-3)
    rel = (diff / denom).max()
    e_k, e_p = img_kern[..., :3].sum(), img_pure[..., :3].sum()
    print(f"finite={finite} max_abs={diff.max():.3e} max_rel={rel:.3e} "
          f"energy kern={e_k:.4f} pure={e_p:.4f} "
          f"ratio={e_k / max(e_p, 1e-9):.5f}")
    # the kernel runs the same math in a different fusion order: f32-level
    # agreement, not bit-exact.  Newton solves can put borderline splats on
    # different pixels, so gate on energy + typical-pixel agreement.
    assert finite
    assert abs(e_k - e_p) <= 0.02 * abs(e_p), (e_k, e_p)
    frac_off = (diff.max(-1) > 0.05).mean()
    print(f"pixels off by >0.05: {frac_off:.4%}")
    assert frac_off < 0.01, frac_off
    print("TPU kernel/pure parity OK")


if __name__ == "__main__":
    main()
