"""bench_infer CLI: all three mesh modes produce a positive throughput
JSON on the simulated 8-device mesh (tiny arch/shape — the tool's mesh
layouts mirror infer/engine.run_inference, whose numerical equivalence to
batch-1 is covered in tests/test_infer_tools.py)."""

import json

import pytest

from dasac_tpu.tools import bench_infer


@pytest.mark.parametrize("mode", ["batch", "spatial", "single"])
def test_bench_infer_modes(mode, capsys):
    rc = bench_infer.main(["--arch", "tiny", "--hw", "64", "64",
                           "--mode", mode, "--iters", "2",
                           "--dtype", "float32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metric"] == "infer_images_per_sec"
    assert out["value"] > 0
    assert out["latency_ms_per_frame"] > 0
    assert out["mode"] == mode
    if mode == "batch":
        assert out["devices"] == 8 and out["batch"] == 8
    if mode == "single":
        assert out["devices"] == 1


def test_bench_infer_combined_mesh(capsys):
    rc = bench_infer.main(["--arch", "tiny", "--hw", "64", "64",
                           "--mode", "spatial", "--sp", "4", "--iters", "2",
                           "--dtype", "float32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mesh"] == [2, 4] and out["batch"] == 2
    assert out["value"] > 0


def test_bench_infer_fuse_stride8(capsys):
    rc = bench_infer.main(["--arch", "tiny", "--hw", "64", "64",
                           "--mode", "batch", "--iters", "2",
                           "--scales", "0.5", "1.0", "--flip",
                           "--fuse", "stride8", "--dtype", "float32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] > 0 and out["fuse"] == "stride8"
