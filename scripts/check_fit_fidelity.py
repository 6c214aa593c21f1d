"""Measure held-out fidelity of every committed lens fit vs the ray-trace oracle.

For each ``data/lenses/*.npz``: draw FRESH sensor light-field rays (a seed the
fitter never saw), trace them through the element stack
(:func:`pota_tpu.optics.raytrace.trace_to_chart` — the TPU build's analog of
the reference's raytraced ground truth,
``/root/reference/src/deprecated/lentil_raytraced.cpp:79-128``), and report
the rms error of the polynomial's outer-pupil chart and iris-plane outputs.

Prints one line per fit + a python dict of results at the end; used to
calibrate the thresholds recorded in ``tests/test_fit_fidelity.py``.
"""
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)  # compile locally on CPU
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from pota_tpu.lens.database import get_lens_system
from pota_tpu.optics.fit import _CACHE_DIR, load_poly_lens, sample_fit_domain
from pota_tpu.optics.polynomial import poly_eval
from pota_tpu.optics.raytrace import trace_to_chart


def measure(name: str, degree: int, n: int = 4000, seed: int = 987):
    poly = load_poly_lens(name, degree)
    lens = get_lens_system(name)
    samples, _, _ = sample_fit_domain(lens, n, seed=seed)
    out, trans, ap_xy, valid = (
        np.asarray(a) for a in trace_to_chart(lens, jnp.asarray(samples))
    )
    pred_pt = np.asarray(poly_eval(poly.pt, jnp.asarray(samples)))
    pred_ap = np.asarray(poly_eval(poly.ap, jnp.asarray(samples)))
    v = valid
    rms_pos = float(np.sqrt(((pred_pt[v, :2] - out[v, :2]) ** 2).mean()))
    rms_dir = float(np.sqrt(((pred_pt[v, 2:4] - out[v, 2:4]) ** 2).mean()))
    rms_ap = float(np.sqrt(((pred_ap[v] - ap_xy[v]) ** 2).mean()))
    return {
        "rms_pos_mm": rms_pos,
        "rms_dir": rms_dir,
        "rms_ap_mm": rms_ap,
        "valid_frac": float(v.mean()),
    }


def main():
    results = {}
    for fname in sorted(os.listdir(_CACHE_DIR)):
        m = re.match(r"(.+)__deg(\d+)\.npz$", fname)
        if not m:
            continue
        name, degree = m.group(1), int(m.group(2))
        r = measure(name, degree)
        results[f"{name}__deg{degree}"] = r
        print(
            f"{name} deg{degree}: pos={r['rms_pos_mm']:.4f}mm "
            f"dir={r['rms_dir']:.5f} ap={r['rms_ap_mm']:.4f}mm "
            f"valid={r['valid_frac']:.2f}",
            flush=True,
        )
    print("\nRESULTS =", repr(results))


if __name__ == "__main__":
    main()
