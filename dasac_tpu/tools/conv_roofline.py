"""Conv roofline for the flagship step: measure XLA's achieved TF/s on each
dominant conv shape of DeepLabv2/ResNet-101 @512x1024 (fwd+bwd, bf16) and
derive the conv-bound step-time floor.

The SAC step is conv-dominated (~80% in the two gradient branches,
tools/profile_step.py).  This tool answers "how far is the step from the
compositional speed-of-light of XLA's own conv kernels?" — the data-backed
ceiling analysis behind the bench numbers.

Usage: python -m dasac_tpu.tools.conv_roofline [--batch 16] [--iters 10]

Each row: one conv shape, its per-STEP flop share (fwd student batch +
teacher fwd + 2 backwards where applicable), measured fwd+bwd TF/s, implied
per-step milliseconds.  Run on the real chip.
"""

import argparse
import time
from functools import partial

import numpy as np


# (name, spatial_hw, cin, cout, ksize, dilation, per_step_multiplicity)
# multiplicity: how many times this conv shape runs per SAC step counting
# student fwd+bwd (3x flops) over 16 images and teacher fwd (1x) over 8
# views — expressed as "equivalent forward passes at batch B".
def flagship_convs():
    hw4 = (128, 256)   # /4
    hw8 = (64, 128)    # /8
    convs = []
    # stem (B,512,1024,3)->(B,256,512,64): 7x7/2
    convs.append(("stem7x7s2", (256, 512), 3, 64, 7, 1, 1))
    # layer1 @ /4: 3 blocks (64,64,256), in 64/256
    convs.append(("l1_1x1a", hw4, 256, 64, 1, 1, 3))
    convs.append(("l1_3x3", hw4, 64, 64, 3, 1, 3))
    convs.append(("l1_1x1b", hw4, 64, 256, 1, 1, 3))
    # layer2 @ /8 (stride-2 edge shapes folded in): 4 blocks (128,128,512)
    convs.append(("l2_1x1a", hw8, 512, 128, 1, 1, 4))
    convs.append(("l2_3x3", hw8, 128, 128, 3, 1, 4))
    convs.append(("l2_1x1b", hw8, 128, 512, 1, 1, 4))
    # layer3 @ /8 d=2: 23 blocks (256,256,1024)
    convs.append(("l3_1x1a", hw8, 1024, 256, 1, 1, 23))
    convs.append(("l3_3x3d2", hw8, 256, 256, 3, 2, 23))
    convs.append(("l3_1x1b", hw8, 256, 1024, 1, 1, 23))
    # layer4 @ /8 d=4: 3 blocks (512,512,2048)
    convs.append(("l4_1x1a", hw8, 2048, 512, 1, 1, 3))
    convs.append(("l4_3x3d4", hw8, 512, 512, 3, 4, 3))
    convs.append(("l4_1x1b", hw8, 512, 2048, 1, 1, 3))
    # ASPP: 4x 3x3 dilated 2048 -> 19
    convs.append(("aspp3x3", hw8, 2048, 19, 3, 6, 4))
    return convs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="images per step (8 source + 8 target views)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--peak-tf", type=float, default=197.0,
                    help="chip bf16 peak (v5e=197)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    def conv(x, k, d):
        p = ((k.shape[0] // 2) * d, (k.shape[0] // 2) * d)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [p, p], rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def loss(x, k, d):
        return jnp.sum(conv(x, k, d).astype(jnp.float32) ** 2)

    rng = np.random.RandomState(0)
    rows = []
    total_flops = 0.0
    total_ms = 0.0
    for name, hw, cin, cout, ks, d, mult in flagship_convs():
        x = jnp.asarray(rng.randn(args.batch, *hw, cin) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.randn(ks, ks, cin, cout) / np.sqrt(ks * ks * cin),
                        jnp.bfloat16)
        g = jax.jit(jax.grad(partial(loss), argnums=(0, 1)), static_argnums=2)
        o = g(x, k, d)
        _ = float(o[1].ravel()[0])  # scalar readback = the only real fence
        t0 = time.monotonic()
        for _ in range(args.iters):
            o = g(x, k, d)
        _ = float(o[1].ravel()[0])
        dt = (time.monotonic() - t0) / args.iters
        # fwd + both grads = 3 conv applications
        fl = 3 * 2 * args.batch * hw[0] * hw[1] * ks * ks * cin * cout
        tf = fl / dt / 1e12
        # per step: student fwd+bwd (the measured 3x) * mult, plus teacher
        # fwd (1x of 8 views = 1/6 of the 3x16) — folded in as 9/8 scale
        step_fl = fl * mult * 9.0 / 8.0
        step_ms = step_fl / (tf * 1e12) * 1e3
        total_flops += step_fl
        total_ms += step_ms
        rows.append((name, fl / 3 / args.batch / 1e9, tf, step_ms))
        print("{:10s}  {:7.2f} GF/img  {:6.1f} TF/s ({:4.1f}% peak)  "
              "x{:2d} -> {:6.1f} ms/step".format(
                  name, rows[-1][1], tf, 100 * tf / args.peak_tf,
                  mult, step_ms), flush=True)

    print("-" * 66)
    print("conv-bound step floor: {:.0f} ms  ({:.1f} TF/step at these "
          "kernels' own speeds)".format(total_ms, total_flops / 1e12))
    print("=> max img/s/chip if everything else were free: {:.1f}".format(
        8.0 / (total_ms / 1e3)))


if __name__ == "__main__":
    main()
