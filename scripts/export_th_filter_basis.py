"""Export a torch-harmonics DISCO filter basis as a dense (r, alpha) table.

Run this on ANY machine where torch-harmonics (the library the reference
binds at makani/models/networks/fourcastnet3.py:189-205) is installed:

    python scripts/export_th_filter_basis.py --basis-type morlet \
        --kernel-shape 3 3 --nlat 361 --output morlet_3x3_361.npz [--selfcheck]

Then on the TPU side, point the model config (or convert_checkpoint) at the
npz via ``filter_basis_table: morlet_3x3_361.npz`` — makani_tpu interpolates
the exported values (ops/disco.py tabulated basis), making checkpoint import
exact for *that install's* basis convention regardless of torch-harmonics
version drift. Interpolation error on the default 2048x512 grid is ~1e-6
for the smooth families and ~1e-4 (locally, at kinks) for piecewise linear.

The export grid covers geodesic radius r in [0, r_cutoff] and bearing
alpha in [0, 2pi). r_cutoff defaults to the reference's cutoff heuristic
(fourcastnet3.py:47-50) for --nlat; pass --theta-cutoff to override.

``--selfcheck`` additionally verifies the exported table against the live
torch-harmonics basis at random off-grid points and prints the max abs
interpolation error.
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def _cutoff(nlat, kernel_shape, basis_type):
    factor = {"zernike": math.sqrt(2.0)}.get(basis_type, 0.5)
    return (kernel_shape[0] + 1) * factor * math.pi / float(nlat - 1)


def _eval_dense(fb, r, alpha, r_cutoff):
    """Evaluate a torch-harmonics FilterBasis on a dense (r, alpha) grid.

    Handles both return conventions seen across versions:
      * a dense tensor (K, *grid)
      * sparse (index, values) pairs from compute_support_vals
    """
    import torch

    rt = torch.from_numpy(np.broadcast_to(r[:, None], (r.size, alpha.size)).copy())
    at = torch.from_numpy(np.broadcast_to(alpha[None, :], (r.size, alpha.size)).copy())
    out = fb.compute_support_vals(rt, at, r_cutoff=r_cutoff)
    if isinstance(out, tuple):
        idx, vals = out
        idx = idx.numpy()
        vals = vals.numpy()
        K = int(fb.kernel_size)
        dense = np.zeros((K, r.size, alpha.size), np.float64)
        # idx rows: (basis index, flat or (row, col) grid index)
        if idx.shape[0] == 3:
            dense[idx[0], idx[1], idx[2]] = vals
        else:
            dense.reshape(K, -1)[idx[0], idx[1]] = vals
        return dense
    return np.asarray(out.numpy(), np.float64)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--basis-type", required=True, help="torch-harmonics basis name, e.g. morlet")
    ap.add_argument("--kernel-shape", type=int, nargs="+", required=True)
    ap.add_argument("--nlat", type=int, default=361, help="target grid nlat for the cutoff heuristic")
    ap.add_argument("--theta-cutoff", type=float, default=None)
    ap.add_argument("--nr", type=int, default=2048, help="radial sample count")
    ap.add_argument("--nalpha", type=int, default=512, help="bearing sample count")
    ap.add_argument("--output", required=True)
    ap.add_argument("--selfcheck", action="store_true")
    args = ap.parse_args(argv)

    try:
        import torch_harmonics  # noqa: F401
        from torch_harmonics.filter_basis import get_filter_basis
    except ImportError:
        try:  # pre-0.8 location
            from torch_harmonics.convolution import get_filter_basis  # type: ignore
        except ImportError:
            print("torch-harmonics is not installed; run this script where it is", file=sys.stderr)
            return 1

    ks = list(args.kernel_shape)
    fb = get_filter_basis(kernel_shape=ks, basis_type=args.basis_type)
    r_cutoff = args.theta_cutoff or _cutoff(args.nlat, ks, args.basis_type)

    r = np.linspace(0.0, r_cutoff, args.nr)
    alpha = np.arange(args.nalpha) * (2.0 * np.pi / args.nalpha)
    vals = _eval_dense(fb, r, alpha, r_cutoff)

    import torch_harmonics as th

    np.savez_compressed(
        args.output,
        vals=vals,
        r=r,
        alpha=alpha,
        r_cutoff=np.float64(r_cutoff),
        basis_type=np.bytes_(args.basis_type.encode()),
        kernel_shape=np.asarray(ks),
        th_version=np.bytes_(getattr(th, "__version__", "unknown").encode()),
    )
    print(f"wrote {args.output}: K={vals.shape[0]}, grid {args.nr}x{args.nalpha}, r_cutoff={r_cutoff:.6f}")

    if args.selfcheck:
        rng = np.random.RandomState(0)
        rs = rng.uniform(0, r_cutoff, 4096)
        als = rng.uniform(0, 2 * np.pi, 4096)
        # evaluate pointwise (grid of shape (4096, 1))
        import torch

        rt = torch.from_numpy(rs[:, None])
        at = torch.from_numpy(als[:, None])
        out = fb.compute_support_vals(rt, at, r_cutoff=r_cutoff)
        if isinstance(out, tuple):
            idx, v = out
            K = int(fb.kernel_size)
            exact = np.zeros((K, 4096), np.float64)
            idx = idx.numpy()
            exact.reshape(K, -1)[idx[0], idx[1] if idx.shape[0] == 2 else idx[1] * 1 + idx[2]] = v.numpy()
        else:
            exact = np.asarray(out.numpy(), np.float64)[..., 0]
        # interpolate the table at the same points (same scheme as ops/disco.py)
        Nr, Na = args.nr, args.nalpha
        ri = np.interp(rs, r, np.arange(Nr))
        da = 2 * np.pi / Na
        ai = (np.mod(als, 2 * np.pi) - alpha[0]) / da
        r0 = np.clip(np.floor(ri).astype(int), 0, Nr - 2)
        a0 = np.floor(ai).astype(int)
        fr = np.clip(ri - r0, 0, 1)
        fa = ai - a0
        a0 = np.mod(a0, Na)
        a1 = np.mod(a0 + 1, Na)
        interp = (
            vals[:, r0, a0] * (1 - fr) * (1 - fa)
            + vals[:, r0, a1] * (1 - fr) * fa
            + vals[:, r0 + 1, a0] * fr * (1 - fa)
            + vals[:, r0 + 1, a1] * fr * fa
        )
        err = np.abs(interp - exact).max()
        print(f"selfcheck: max |interp - exact| = {err:.3e} over 4096 random points")
    return 0


if __name__ == "__main__":
    sys.exit(main())
