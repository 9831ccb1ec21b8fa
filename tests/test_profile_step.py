"""Smoke test for the stage-breakdown profiler (observability subsystem,
SURVEY.md §5): every stage of tools/profile_step runs on the tiny arch and
reports a positive per-stage time.  The flagship-shape numbers in PARITY.md
come from running the same tool on the real chip."""

import json

from dasac_tpu.tools import profile_step


def test_profile_step_stages(capsys):
    results = profile_step.main([
        "--arch", "tiny", "--hw", "32", "64",
        "--batch", "2", "--groups", "1", "--group-size", "2",
        "--iters", "1",
    ])
    assert set(results) == {"aug", "teacher", "refine", "src_grad",
                            "tgt_grad", "full"}
    assert all(v > 0 for v in results.values())
    lines = [json.loads(ln) for ln in
             capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    assert {row["stage"] for row in lines} == set(results)
    assert all(row["ms"] >= 0 for row in lines)


def test_profile_step_stage_subset(capsys):
    results = profile_step.main([
        "--arch", "tiny", "--hw", "32", "64",
        "--batch", "2", "--groups", "1", "--group-size", "2",
        "--iters", "1", "--stages", "aug", "refine",
        "--refine-res", "full", "--refine-dtype", "float32",
        "--resize-method", "gather",
    ])
    assert set(results) == {"aug", "refine"}
