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
    ap.add_argument("--fuse", choices=["full", "stride8"], default="full",
                    help="scale-fusion point (engine.make_infer_fn)")
    ap.add_argument("--dtype", choices=["bfloat16", "float32"],
                    default="bfloat16")
    ap.add_argument("--output", choices=["probs", "argmax"],
                    default="probs",
                    help="program result: probability volume or fused "
                         "on-device uint8 argmax (engine.make_infer_fn)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--dump-hlo", default=None,
                    help="save the optimized HLO text of the compiled "
                         "program (input for tools/hlo_traffic --hlo-file)")
    ap.add_argument("--compile-only", action="store_true",
                    help="lower + compile from abstract avals (no device "
                         "transfers, no execution) and exit after the "
                         "cost/HLO dump — safe while the chip is busy "
                         "training")
    args = ap.parse_args(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dasac_tpu.core.cache import enable_repo_cache
    from dasac_tpu.core.config import cfg
    from dasac_tpu.infer.engine import infer_mesh, make_infer_fn
    from dasac_tpu.nn.factory import build_model

    try:  # repo-root bench.py: the published peak-FLOPs/BW tables
        import bench as bench_lib
    except ImportError:
        class bench_lib:  # noqa: N801 — peaks unknown off-repo
            _bf16_peak_flops = staticmethod(lambda d: None)
            _hbm_peak_bw = staticmethod(lambda d: None)

    # shared .jax_cache: the flagship forward compiles in minutes through
    # the remote-compile tunnel; cached invocations start in seconds
    enable_repo_cache()

    # the SAME layout dispatch run_inference uses (engine.infer_mesh):
    # batch -> 1-D data mesh; spatial --sp N -> combined (devices/N, N);
    # single -> batch mode trimmed to one device
    mesh, shard, b, n_sp = infer_mesh(
        batch_size=(1 if args.mode == "single" else args.batch or None),
        spatial=(args.sp or -1) if args.mode == "spatial" else 0)
    repl = NamedSharding(mesh, P())

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_model(args.arch, args.num_classes, dtype=dtype)
    _init = lambda r: model.init({"params": r}, jnp.zeros((1, 64, 64, 3)),
                                 train=False, update_stats=False)  # noqa: E731
    if args.compile_only:
        # abstract avals all the way down: nothing is initialized,
        # transferred, or executed — only the compile service is used
        variables = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=repl),
            jax.eval_shape(_init, jax.random.PRNGKey(0)))
    else:
        variables = jax.device_put(jax.jit(_init)(jax.random.PRNGKey(0)),
                                   repl)

    mean, std = tuple(cfg.DATASET.MEAN), tuple(cfg.DATASET.STD)
    infer_fn = jax.jit(make_infer_fn(model, mean, std, tuple(args.scales),
                                     args.flip, args.fuse,
                                     output=args.output),
                       in_shardings=(repl, shard), out_shardings=shard)

    # falsifiable utilization numbers, same method as bench.py: XLA
    # cost_analysis FLOPs / bytes against the chip's published peaks
    flops = hbm_bytes = None

    h, w = args.hw
    if n_sp:
        assert h % n_sp == 0, (
            "spatial mode: height %d must tile the %d-chip sp axis"
            % (h, n_sp))
    rng = np.random.RandomState(0)
    if args.compile_only:
        frames = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8,
                                      sharding=shard)
    else:
        frames = jax.device_put(
            (rng.rand(b, h, w, 3) * 255).astype(np.uint8), shard)

    try:
        compiled = infer_fn.lower(variables, frames).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
        hbm_bytes = float(cost.get("bytes accessed", 0.0)) or None
        if args.dump_hlo:
            with open(args.dump_hlo, "w") as f:
                f.write(compiled.as_text())
        infer_fn = compiled  # reuse the AOT executable
    except Exception:
        if args.compile_only:
            raise
        pass

    if args.compile_only:
        out = {"metric": "infer_compile_only", "mode": args.mode,
               "batch": b, "hw": [h, w], "scales": args.scales,
               "flip": bool(args.flip), "fuse": args.fuse,
               "arch": args.arch, "dtype": args.dtype,
               "output": args.output}
        if flops:
            out["step_flops_tf"] = round(flops / 1e12, 2)
        if hbm_bytes:
            out["hbm_gb_per_step"] = round(hbm_bytes / 1e9, 1)
        print(json.dumps(out))
        return 0

    probs = infer_fn(variables, frames)          # compile + warm
    _ = float(jnp.sum(probs[0, 0, 0]))           # readback = real fence
    probs = infer_fn(variables, frames)
    _ = float(jnp.sum(probs[0, 0, 0]))

    # delayed one-step readback: fences step i-1 while step i executes, so
    # at most TWO full-res softmax outputs are live on device (async
    # dispatch of all iters would stack ~0.6 GB per step in HBM) while the
    # pipeline never stalls on the host
    prev = None
    t0 = time.monotonic()
    for _i in range(args.iters):
        probs = infer_fn(variables, frames)
        if prev is not None:
            _ = float(jnp.sum(prev[0, 0, 0]))
        prev = probs
    _ = float(jnp.sum(prev[0, 0, 0]))            # fence the last step
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
        "fuse": args.fuse,
        "arch": args.arch,
        "dtype": args.dtype,
        "output": args.output,
    }
    if flops:
        out["step_flops_tf"] = round(flops / 1e12, 2)
        peak = bench_lib._bf16_peak_flops(jax.devices()[0])
        if peak:
            out["mfu"] = round(flops / per_step / (
                peak * len(mesh.devices.reshape(-1))), 3)
    if hbm_bytes:
        out["hbm_gb_per_step"] = round(hbm_bytes / 1e9, 1)
        bw = bench_lib._hbm_peak_bw(jax.devices()[0])
        if bw:
            out["hbm_util"] = round(hbm_bytes / per_step / (
                bw * len(mesh.devices.reshape(-1))), 3)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
