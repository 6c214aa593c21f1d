"""Fit + cache every catalog lens at degree 5.

Degree 6 was measured WORSE for the fisheyes on held-out rays (0.14-0.27mm
pos rms vs 0.036-0.046mm at degree 5, even at 400k training samples and
220 terms — the larger monomial pool prunes to a worse-conditioned subset
in f32); degree 5 is canonical for every family.

Run offline: ``python scripts/fit_all_lenses.py``.  Fits are cached in
``data/lenses/*.npz`` and committed so renders never refit.  Prints one
line of held-out rms diagnostics per lens (mm / slope units).
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)  # compile locally on CPU

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pota_tpu.lens.database import get_lens_system, lens_names
from pota_tpu.optics.fit import fit_lens, load_poly_lens, save_poly_lens


def fit_one(name: str, degree: int) -> None:
    if load_poly_lens(name, degree) is not None:
        print(f"[skip] {name} deg{degree} cached", flush=True)
        return
    t0 = time.time()
    lens = get_lens_system(name)
    poly, diag = fit_lens(lens, degree=degree, return_diagnostics=True)
    save_poly_lens(poly, degree)
    print(
        f"[fit ] {name} deg{degree} {time.time()-t0:6.1f}s "
        f"rms_out=({diag['rms_out_x']:.4f},{diag['rms_out_y']:.4f},"
        f"{diag['rms_out_dx']:.5f},{diag['rms_out_dy']:.5f}) "
        f"ap=({diag['rms_ap_x']:.4f},{diag['rms_ap_y']:.4f}) "
        f"trans={diag['rms_trans']:.4f} valid={diag['valid_frac']:.2f} "
        f"terms={diag['n_terms']}",
        flush=True,
    )


def main():
    names = lens_names()
    shard = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    nshards = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    failed = []
    for i, name in enumerate(names):
        if i % nshards != shard:
            continue
        try:
            fit_one(name, 5)
        except Exception as e:  # keep going; report at the end
            print(f"[FAIL] {name}: {e}", flush=True)
            failed.append(name)
    if failed:
        print(f"[FAIL] {len(failed)} lens fits failed: {', '.join(failed)}",
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
