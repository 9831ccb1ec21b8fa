"""Closed-loop trajectory comparison of TPU.REFINE_RES=full vs stride8.

Unit-level stability (tests/test_refine_torch_parity.py) shows the stride-8
refine chain moves pseudo-labels only in a label-boundary band.  This tool
adds the closed-loop system check on the real flagship step: train on a
learnable synthetic segmentation task until the teacher is confident, then
continue the SAME state under both settings and print the self-supervision
metric trajectories side by side.

Protocol (no recompiles beyond the two cached bench graphs):
1. Build a blob task: smooth low-frequency field per image, all three
   channels carry it; label = field > 0.5 -> class 5 else 9.  A thresholding
   task the net learns in a few hundred steps, with region boundaries at
   realistic (tens of stride-8 px) scale.
2. Warm up N steps with the stride8 graph (the refine path is inert during
   warmup: the EMA teacher still tracks the random init, coverage = 0, so
   the warmup graph choice cannot bias the arms).
3. Host-swap the converged student into the teacher (the lazy-init copy the
   reference performs when resuming SAC from a baseline snapshot,
   models/sac.py:74-81), fork the state, and run both arms from
   bit-identical states on identical batches and per-step rng.
4. Compare: src_loss_ce must stay identical (the source branch never
   touches refine); pseudo_cover / self_ce / teacher_diff must track.

Usage:  python -m dasac_tpu.tools.compare_refine_res
            [--warmup N] [--steps N] [--every K] [--json PATH]
"""
from __future__ import annotations

import argparse
import json


def _blob_batch(rng, batch, groups, hw):
    """Smooth-field images + thresholded two-class labels."""
    import numpy as np

    def field(n):
        coarse = rng.rand(n, 8, 16).astype(np.float32)
        reps = (hw[0] + 7) // 8, (hw[1] + 15) // 16
        f = np.repeat(np.repeat(coarse, reps[0], 1), reps[1], 2)
        f = f[:, :hw[0], :hw[1]]
        # separable box blur so the threshold boundary is smooth, not blocky
        k = 31

        def blur(x, axis):
            pad = np.pad(x, [(k // 2, k - k // 2) if a == axis else (0, 0)
                             for a in range(3)], mode="edge")
            cs = np.cumsum(pad, axis=axis, dtype=np.float64)
            n = x.shape[axis]
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis], hi[axis] = slice(0, n), slice(k, k + n)
            return ((cs[tuple(hi)] - cs[tuple(lo)]) / k).astype(np.float32)

        return blur(blur(f, 1), 2)

    def render(f):
        img = (f[..., None] * 200 + 25 +
               rng.randn(*f.shape, 3) * 8).clip(0, 255)
        return img.astype(np.uint8)

    fs = field(batch)
    ft = field(groups)
    return (render(fs), np.where(fs > 0.5, 5, 9).astype(np.uint8),
            render(ft), np.where(ft > 0.5, 5, 9).astype(np.uint8))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--warmup", type=int, default=300)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--every", type=int, default=50)
    ap.add_argument("--batches", type=int, default=4,
                    help="distinct synthetic batches cycled through")
    ap.add_argument("--resize-method", choices=["matmul", "gather"],
                    default="matmul")  # match bench's adopted default
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    from dasac_tpu.core.cache import enable_repo_cache

    enable_repo_cache()

    rng = np.random.RandomState(0)
    batches = [tuple(jnp.asarray(x) for x in
                     _blob_batch(rng, bench.BATCH_SIZE, bench.NUM_GROUPS,
                                 bench.HW))
               for _ in range(args.batches)]

    state, step_s8 = bench._build(remat=False, refine_dtype="bfloat16",
                                  refine_res="stride8",
                                  resize_method=args.resize_method)
    m = None
    for i in range(args.warmup):
        state, m = step_s8(state, batches[i % len(batches)],
                           jax.random.PRNGKey(i))
    if m is not None:
        m = {k: float(jax.device_get(v)) for k, v in m.items()
             if not hasattr(v, "shape") or v.shape == ()}
        print("after warmup:", json.dumps({k: round(v, 5) for k, v in
                                           m.items()}))

    # the reference's resume-time lazy init: teacher <- student wholesale
    host = jax.device_get(state)
    host = host.replace(teacher_params=host.params,
                        teacher_stats=host.batch_stats)

    _, step_full = bench._build(remat=False, refine_dtype="bfloat16",
                                refine_res="full",
                                resize_method=args.resize_method)
    rows = {}
    for res, step in (("full", step_full), ("stride8", step_s8)):
        st = jax.device_put(host)
        traj = []
        for i in range(args.steps):
            st, metrics = step(st, batches[i % len(batches)],
                               jax.random.PRNGKey(args.warmup + i))
            if (i + 1) % args.every == 0 or i == 0:
                m = {k: float(jax.device_get(v))
                     for k, v in metrics.items()
                     if not hasattr(v, "shape") or v.shape == ()}
                m["step"] = i + 1
                traj.append(m)
        rows[res] = traj
        del st

    keys = [k for k in rows["full"][0] if k != "step"]
    worst = {k: 0.0 for k in keys}
    for a, b in zip(rows["full"], rows["stride8"]):
        cells = []
        for k in keys:
            d = abs(a[k] - b[k])
            worst[k] = max(worst[k], d)
            cells.append("%s %.5f/%.5f |Δ|=%.5f" % (k, a[k], b[k], d))
        print("%4d  %s" % (a["step"], "  ".join(cells)))
    print("worst |Δ|: " + json.dumps({k: round(v, 6) for k, v in
                                      worst.items()}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"trajectories": rows, "worst_abs_delta": worst}, f)


if __name__ == "__main__":
    main()
