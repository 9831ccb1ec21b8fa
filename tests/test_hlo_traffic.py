"""HLO traffic attribution parser (dasac_tpu/tools/hlo_traffic.py)."""

import jax
import jax.numpy as jnp

from dasac_tpu.tools.hlo_traffic import (_shape_bytes, format_report,
                                         traffic_table)


def test_shape_bytes():
    assert _shape_bytes("f32[8,512,1024,19]{3,2,1,0}") == 8 * 512 * 1024 * 19 * 4
    assert _shape_bytes("bf16[2,3]{1,0}") == 12
    assert _shape_bytes("(f32[4]{0}, u8[2]{0})") == 18
    assert _shape_bytes("pred[]") == 1


def test_traffic_table_on_compiled_function():
    def f(x, w):
        y = jnp.dot(x, w)
        return jax.nn.softmax(y.astype(jnp.float32), -1)

    x = jnp.zeros((128, 256), jnp.bfloat16)
    w = jnp.zeros((256, 512), jnp.bfloat16)
    text = jax.jit(f).lower(x, w).compile().as_text()
    rows, by_op, total = traffic_table(text, top=5)
    assert rows and total > 0
    # the dot's f32 [128,512] output (or the fusion holding it) dominates
    assert rows[0]["bytes"] >= 128 * 512 * 2
    # parameters/tuples never counted
    assert all(r["op"].split(":")[0] not in ("parameter", "tuple")
               for r in rows)
    report = format_report(rows, by_op, total, top=5)
    assert "output-buffer bytes by opcode" in report


def test_fusion_bodies_excluded():
    text = """\
HloModule m

%fused_computation.1 (p0: f32[1000000]) -> f32[1000000] {
  %p0 = f32[1000000]{0} parameter(0)
  ROOT %big = f32[1000000]{0} add(%p0, %p0)
}

ENTRY %main (a: f32[10]) -> f32[10] {
  %a = f32[10]{0} parameter(0)
  ROOT %out = f32[10]{0} fusion(%a), kind=kLoop, calls=%fused_computation.1
}
"""
    rows, by_op, total = traffic_table(text)
    # only the entry fusion's 40-byte output counts, not the body's interior
    assert total == 40, (total, by_op)
    assert [k for k in by_op if not k.startswith("dtype:")] == ["fusion:Loop"]
    assert by_op["dtype:f32"] == 40


def test_fusion_bodies_with_hostile_names_and_headers():
    # two regressions seen in real v5e dumps: (a) computation headers whose
    # tuple types carry /*index=N*/ comments (an '=' inside the header line
    # used to hide it from the parser), (b) fusion bodies NOT named
    # fused_computation (e.g. bitcast_fusion.N) whose interiors were counted
    text = """\
HloModule m

%bitcast_fusion.62 (bitcast_input.62: f32[1000000]) -> f32[1000000] {
  %p0 = f32[1000000]{0} parameter(0)
  ROOT %big = f32[1000000]{0} add(%p0, %p0)
}

%helper.1 (arg: (s32[], f32[1000000], /*index=5*/f32[8])) -> (u32[2], /*index=5*/u32[2]) {
  %p0 = (s32[], f32[1000000], /*index=5*/f32[8]) parameter(0)
  %huge = f32[1000000]{0} get-tuple-element(%p0), index=1
  %t0 = u32[2]{0} constant(0)
  ROOT %out = (u32[2]{0}, u32[2]{0}) tuple(%t0, %t0)
}

ENTRY %main (a: f32[10]) -> f32[10] {
  %a = f32[10]{0} parameter(0)
  %pair = (u32[2]{0}, u32[2]{0}) call(), to_apply=%helper.1
  ROOT %out = f32[10]{0} fusion(%a), kind=kLoop, calls=%bitcast_fusion.62
}
"""
    rows, by_op, total = traffic_table(text)
    # bitcast_fusion.62's 4 MB interior is skipped; helper.1 executes (it is
    # not a fusion body) so its add op would count — here only its tuple/
    # constant/gte interiors exist, all skipped ops; the entry contributes
    # the fusion's 40 B and the call's 16 B
    assert total == 40 + 16, (total, by_op)
    assert "add" not in {k.split(":")[0] for k in by_op}
