"""Inference benchmark: throughput and per-frame latency of the
mesh-parallel inference forward (reference infer_val.py:118-170's per-image
loop, which the engine replaces with one jitted multi-scale program).

Modes (same mesh layouts as ``infer/engine.run_inference``):
  * batch   — frames shard over a 1-D 'data' mesh (throughput)
  * spatial — ONE frame's HEIGHT shards over the mesh, GSPMD conv halo
              exchanges (latency: all chips cooperate per frame)
  * single  — one device (the baseline)

Synthetic uint8 frames at a fixed shape (default Cityscapes val
1024x2048), so the number isolates the device program from host decode —
bench.py covers the train path and the host pipeline.  Timing uses a host
scalar readback as the fence (on the axon backend ``block_until_ready``
returns before execution finishes).  Prints ONE JSON line.
"""

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--arch", default="deeplabv2_resnet101")
    ap.add_argument("--hw", type=int, nargs=2, default=(1024, 2048),
                    help="frame size (default: Cityscapes val)")
    ap.add_argument("--mode", choices=["batch", "spatial", "single"],
                    default="batch")
    ap.add_argument("--sp", type=int, default=0,
                    help="spatial mode: chips per frame (0 = all devices; "
                         "N < devices = combined (devices/N, N) mesh with "
                         "devices/N frames in parallel)")
    ap.add_argument("--batch", type=int, default=0,
                    help="frames per step (0 = one per device; data-axis "
                         "size in spatial mode; 1 in single mode)")
    ap.add_argument("--scales", type=float, nargs="+", default=[1.0])
    ap.add_argument("--flip", action="store_true")
    ap.add_argument("--dtype", choices=["bfloat16", "float32"],
                    default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--num-classes", type=int, default=19)
    args = ap.parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dasac_tpu.core.config import cfg
    from dasac_tpu.infer.engine import make_infer_fn
    from dasac_tpu.nn.factory import build_model

    devices = jax.local_devices()
    if args.mode == "spatial":
        n_sp = args.sp or len(devices)
        assert len(devices) % n_sp == 0
        n_data = len(devices) // n_sp
        b = max(n_data, ((args.batch or n_data) // n_data) * n_data)
        mesh = Mesh(np.array(devices).reshape(n_data, n_sp), ("data", "sp"))
        shard = NamedSharding(mesh, P("data", "sp"))
    elif args.mode == "single":
        b = max(1, args.batch)
        mesh = Mesh(np.array(devices[:1]), ("data",))
        shard = NamedSharding(mesh, P("data"))
    else:
        b = args.batch or len(devices)
        b = max(len(devices), (b // len(devices)) * len(devices))
        mesh = Mesh(np.array(devices), ("data",))
        shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model(args.arch, args.num_classes, dtype=dtype)
    variables = jax.jit(
        lambda r: model.init({"params": r}, jnp.zeros((1, 64, 64, 3)),
                             train=False, update_stats=False)
    )(jax.random.PRNGKey(0))
    variables = jax.device_put(variables, repl)

    mean, std = tuple(cfg.DATASET.MEAN), tuple(cfg.DATASET.STD)
    infer_fn = jax.jit(make_infer_fn(model, mean, std, tuple(args.scales),
                                     args.flip),
                       in_shardings=(repl, shard), out_shardings=shard)

    h, w = args.hw
    if args.mode == "spatial":
        assert h % mesh.devices.shape[1] == 0, (
            "spatial mode: height %d must tile the %d-chip sp axis"
            % (h, mesh.devices.shape[1]))
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        (rng.rand(b, h, w, 3) * 255).astype(np.uint8), shard)

    probs = infer_fn(variables, frames)          # compile + warm
    _ = float(jnp.sum(probs[0, 0, 0]))           # readback = real fence
    probs = infer_fn(variables, frames)
    _ = float(jnp.sum(probs[0, 0, 0]))

    t0 = time.monotonic()
    for _i in range(args.iters):
        probs = infer_fn(variables, frames)
    _ = float(jnp.sum(probs[0, 0, 0]))           # fence the whole sequence
    dt = time.monotonic() - t0

    per_step = dt / args.iters
    out = {
        "metric": "infer_images_per_sec",
        "value": round(b / per_step, 4),
        "unit": "img/s",
        "latency_ms_per_frame": round(per_step * 1e3 / b, 3),
        "mode": args.mode,
        "devices": len(mesh.devices.reshape(-1)),
        "mesh": list(mesh.devices.shape),
        "batch": b,
        "hw": [h, w],
        "scales": args.scales,
        "flip": bool(args.flip),
        "arch": args.arch,
        "dtype": args.dtype,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
