"""Per-op HBM traffic attribution from compiled (optimized) HLO.

``bench.py`` proves the flagship SAC step is HBM-bound (cost_analysis: 476
GB accessed in 599 ms ~= 97% of v5e peak); this tool answers WHERE those
bytes go.  It walks the optimized HLO text of the compiled step and ranks
instructions/opcodes by their output-buffer size — the HBM WRITE side of
the traffic (each buffer is also read at least once by its consumers, so
writes ~ half of cost_analysis's read+write total; a ranking by writes is a
ranking by traffic).

Fusion-body computations are skipped (their interiors live in
registers/VMEM); while/cond bodies are counted (they execute).

Usage:
  python -m dasac_tpu.tools.hlo_traffic [--top 15] [--remat none]
  python -m dasac_tpu.tools.hlo_traffic --hlo-file step.txt
"""

import argparse
import json
import re
import sys

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "f8e4m3fn": 1, "f8e5m2": 1, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_INSTR_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?[a-z0-9]+\[[^=]*?)\s*"
    r"([\w\-]+)\(")


def _shape_bytes(type_str):
    """Total bytes of one result type (tuples: sum of elements)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        size = _DTYPE_BYTES.get(dtype)
        if size is None or size == 0:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                if d:
                    n *= int(d)
        total += n * size
    return total


_SKIP_OPS = {"parameter", "constant", "get-tuple-element", "tuple",
             "bitcast", "bitcast-convert", "after-all", "partition-id"}

# computation header: `[ENTRY ]%name (params...) -> type[, attrs...] {`
# — anchored on the `(...) -> ... {` signature shape so attribute strings
# containing '=' (e.g. execution_thread="...") can't hide a header, and
# instruction lines (always `name = type opcode(...)`) can't fake one
_HEADER_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*\)\s*->.*\{$")


def _fusion_body_names(hlo_text):
    """Names of computations called by `fusion(...)` instructions — their
    interiors live in registers/VMEM and must not be counted.  Collected
    from the call sites (robust to whatever the compiler names the bodies),
    not from the literal 'fused_computation' naming convention."""
    names = set()
    for line in hlo_text.splitlines():
        clean = re.sub(r"\{[^{}]*\}", "", line)
        m = _INSTR_RE.match(clean)
        if m and m.group(3) == "fusion":
            cm = re.search(r"calls=%?([\w.\-]+)", line)
            if cm:
                names.add(cm.group(1))
    return names


def traffic_table(hlo_text, top=15, opcode_filter=None):
    """-> (rows, by_opcode, total_bytes): per-instruction top list and
    per-opcode aggregation of output-buffer bytes in executed computations.
    ``by_opcode`` additionally carries 'dtype:<d>' pseudo-keys splitting the
    total by element type (the f32-vs-bf16 decision input)."""
    rows, by_op, by_dtype = [], {}, {}
    fusion_bodies = _fusion_body_names(hlo_text)
    in_fusion_body = False
    for line in hlo_text.splitlines():
        stripped = line.strip()
        hm = _HEADER_RE.match(stripped)
        if hm:
            # region_* computations back while/cond/reduce bodies — counted
            # (they execute); only pure fusion interiors are skipped
            in_fusion_body = hm.group(1) in fusion_bodies
            continue
        if in_fusion_body:
            continue
        # strip layout/tiling annotations ({3,1,2,0:T(8,128)(2,1)}) BEFORE
        # matching: the tiling's "T(...)" would otherwise parse as the opcode
        clean = re.sub(r"\{[^{}]*\}", "", line)
        m = _INSTR_RE.match(clean)
        if not m:
            continue
        name, type_str, opcode = m.groups()
        if opcode in _SKIP_OPS:
            continue
        b = _shape_bytes(type_str)
        if not b:
            continue
        # fusions carry a kind= tag worth surfacing
        kind = ""
        km = re.search(r"kind=k(\w+)", line)
        if km:
            kind = ":" + km.group(1)
        fused = re.search(r"calls=%?([\w.\-]+)", line)
        label = opcode + kind
        rows.append({"name": name, "op": label, "bytes": b,
                     "shape": type_str.strip()[:60],
                     "calls": fused.group(1) if fused else ""})
        by_op[label] = by_op.get(label, 0) + b
        for dt, dims in _SHAPE_RE.findall(type_str):
            sz = _DTYPE_BYTES.get(dt, 0)
            if sz:
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                by_dtype[dt] = by_dtype.get(dt, 0) + n * sz
    rows.sort(key=lambda r: -r["bytes"])
    if opcode_filter:
        rows = [r for r in rows if opcode_filter in r["op"]]
    total = sum(by_op.values())
    by_op = dict(sorted(by_op.items(), key=lambda kv: -kv[1]))
    for dt, b in sorted(by_dtype.items(), key=lambda kv: -kv[1]):
        by_op["dtype:" + dt] = b
    return rows[:top], by_op, total


def format_report(rows, by_op, total, top=15):
    ops = {k: v for k, v in by_op.items() if not k.startswith("dtype:")}
    dtypes = {k[6:]: v for k, v in by_op.items() if k.startswith("dtype:")}
    lines = ["output-buffer bytes by opcode (executed computations):"]
    for op, b in list(ops.items())[:top]:
        lines.append("  {:<28} {:>9.2f} GB  ({:4.1f}%)".format(
            op, b / 1e9, 100.0 * b / max(1, total)))
    lines.append("by element type: " + ", ".join(
        "%s %.1f GB (%.0f%%)" % (dt, b / 1e9, 100.0 * b / max(1, total))
        for dt, b in dtypes.items()))
    lines.append("total instruction output bytes: %.1f GB "
                 "(HBM writes; cost_analysis counts reads+writes)"
                 % (total / 1e9))
    lines.append("top instructions:")
    for r in rows:
        lines.append("  {:>8.2f} GB  {:<22} {}".format(
            r["bytes"] / 1e9, r["op"], r["shape"]))
    return "\n".join(lines)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--hlo-file", default=None,
                    help="analyze an HLO text dump instead of compiling")
    ap.add_argument("--remat", choices=["block", "none", "convs"],
                    default="none")
    ap.add_argument("--refine-dtype", choices=["float32", "bfloat16"],
                    default="bfloat16")  # match bench's adopted default
    ap.add_argument("--ce-impl", choices=["xla", "pallas"], default="xla")
    ap.add_argument("--refine-res", choices=["full", "stride8"],
                    default="stride8")  # match bench's adopted default
    ap.add_argument("--resize-method", choices=["matmul", "gather"],
                    default="matmul")  # match bench's adopted default
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--opcode", default=None,
                    help="restrict the top-instruction list to ops whose "
                         "label contains this substring (e.g. 'copy')")
    ap.add_argument("--json", default=None)
    ap.add_argument("--dump-hlo", default=None,
                    help="save the optimized HLO text here so later "
                         "analyses can use --hlo-file without recompiling")
    args = ap.parse_args(argv)

    if args.hlo_file:
        with open(args.hlo_file) as f:
            text = f.read()
    else:
        import jax

        import bench

        from dasac_tpu.core.cache import enable_repo_cache

        enable_repo_cache()
        state, step = bench._build(remat=args.remat,
                                   refine_dtype=args.refine_dtype,
                                   ce_impl=args.ce_impl,
                                   refine_res=args.refine_res,
                                   resize_method=args.resize_method)
        batch = bench._device_batch(__import__("numpy").random.RandomState(0))
        compiled = step.lower(state, batch,
                              jax.random.PRNGKey(0)).compile()
        text = compiled.as_text()

    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(text)

    rows, by_op, total = traffic_table(text, top=args.top,
                                       opcode_filter=args.opcode)
    print(format_report(rows, by_op, total, top=args.top))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "by_opcode": by_op, "total": total},
                      f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
