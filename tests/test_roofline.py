"""tools/roofline.py: HLO operand-I/O parser calibration.

The parser must count, at fusion granularity, one HBM read per operand
and one HBM write per output — the traffic LOWER bound the roofline
window stands on (PERF.md round 3). Calibrated here against handcrafted
HLO (exact arithmetic) and live compiled programs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from discogan_modernized_tpu.tools.roofline import (
    _array_hbm_bytes, _type_hbm_bytes, compiled_report, parse_entry_io)

HLO = """\
HloModule jit_f, entry_computation_layout={(bf16[256,256]{1,0})->bf16[256,256]{1,0}}

%fused_computation.1 (p0: bf16[256,256], p1: bf16[256,256]) -> bf16[256,256] {
  %p0 = bf16[256,256]{1,0} parameter(0)
  %p1 = bf16[256,256]{1,0} parameter(1)
  ROOT %add.0 = bf16[256,256]{1,0} add(%p0, %p1)
}

ENTRY %main.1 (a.1: bf16[256,256], b.1: bf16[256,256]) -> bf16[256,256] {
  %a.1 = bf16[256,256]{1,0:T(8,128)(2,1)} parameter(0)
  %copy-start = (bf16[256,256]{1,0:T(8,128)(2,1)S(1)}, bf16[256,256]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}) copy-start(%a.1), cross_program_prefetch_index=0
  %b.1 = bf16[256,256]{1,0:T(8,128)(2,1)} parameter(1)
  %copy-done = bf16[256,256]{1,0:T(8,128)(2,1)S(1)} copy-done(%copy-start)
  %c = bf16[256,256]{1,0:T(8,128)(2,1)} constant({...})
  %async-start.1 = ((bf16[256,256]{1,0:T(8,128)(2,1)}), bf16[256,256]{1,0:T(8,128)(2,1)}, u32[]{:S(2)}) async-start(%c), calls=%fused_computation.1
  %async-done.1 = bf16[256,256]{1,0:T(8,128)(2,1)} async-done(%async-start.1)
  ROOT %fusion = bf16[256,256]{1,0:T(8,128)(2,1)} fusion(%copy-done, %b.1, %async-done.1), kind=kOutput, calls=%fused_computation.1, metadata={op_name="jit(f)/dot" source_file="<stdin>" source_line=3}
}
"""

MB = 256 * 256 * 2  # one bf16[256,256]


def test_handcrafted_hlo_exact():
    io = parse_entry_io(HLO)
    # copy-start: reads %a.1 (1 buf), writes nothing (VMEM + alias).
    # copy-done: in-flight tuple read -> 0, S(1) output -> 0.
    # async-start: reads %c (constant buffer in HBM -> 1), alias tuple
    # output -> 0; async-done: reads 0, writes the result (1).
    # fusion: reads %copy-done (VMEM -> 0), %b.1 (1), %async-done.1 (1),
    # writes ROOT (1).
    assert io["io_bytes"] == 6 * MB
    assert io["n_while"] == 0
    assert io["n_instructions"] == 5


def test_array_bytes_spaces():
    assert _array_hbm_bytes("bf16[64,32,32,128]{3,2,1,0:T(8,128)(2,1)}") \
        == 2 * 64 * 32 * 32 * 128
    assert _array_hbm_bytes("f32[7]") == 28
    assert _array_hbm_bytes("pred[]") == 1
    assert _array_hbm_bytes("u32[]{:S(2)}") == 0          # SMEM
    assert _array_hbm_bytes("bf16[8,8]{1,0:S(1)}") == 0   # VMEM
    assert _array_hbm_bytes("token[]") == 0
    assert _type_hbm_bytes("(bf16[2,2]{1,0}, (f32[4]{0}, u32[]{:S(2)}))") \
        == 8 + 16


def test_live_matmul_io():
    a = jnp.asarray(np.random.RandomState(0).rand(256, 256), jnp.float32)
    compiled = jax.jit(lambda a, b: a @ b).lower(a, a).compile()
    io = parse_entry_io(compiled.as_text())
    exact = 3 * 256 * 256 * 4
    # Lower bound must hold; backend-inserted copies may add a little.
    assert exact <= io["io_bytes"] <= 2 * exact


def test_live_conv_io_and_report():
    x = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 32), jnp.float32)
    w = jnp.asarray(np.random.RandomState(1).rand(4, 4, 32, 64), jnp.float32)
    f = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    compiled = f.lower(x, w).compile()
    exact = (8 * 16 * 16 * 32 + 4 * 4 * 32 * 64 + 8 * 8 * 8 * 64) * 4
    io = parse_entry_io(compiled.as_text())
    assert exact <= io["io_bytes"] <= 2.5 * exact
    rep = compiled_report(compiled, measured_ms=1.0)
    assert rep["io_bytes_lo"] == io["io_bytes"]
    assert rep["roofline_hi_ms"] >= rep["roofline_lo_ms"] > 0
    assert 0 < rep["light_speed_hi"] <= 1.0
    if rep["flops"]:  # some CPU builds omit the flops counter
        ops = 8 * 8 * 8 * 64 * 4 * 4 * 32 * 2
        assert rep["flops"] == pytest.approx(ops, rel=0.15)


def test_while_flagged():
    def f(x):
        return jax.lax.fori_loop(0, 4, lambda i, v: v * 1.5 + i, x)

    compiled = jax.jit(f).lower(jnp.ones((128, 128))).compile()
    io = parse_entry_io(compiled.as_text())
    assert io["n_while"] >= 1


def _scan_matmul_compiled(k=8, n=256):
    a = jnp.ones((n, n))

    def f(a):
        def body(c, _):
            return c @ a, ()
        c, _ = jax.lax.scan(body, a, None, length=k)
        return c

    return jax.jit(f).lower(a).compile()


def test_cost_analysis_counts_while_body_once():
    """The compiled_report per-step normalization stands on this: XLA's
    cost model reports a while body's flops ONCE, not x trips."""
    one = jax.jit(lambda a: a @ a).lower(jnp.ones((256, 256))).compile()

    def fl(c):
        ca = c.cost_analysis()
        return float((ca[0] if isinstance(ca, list) else ca)["flops"])

    if not fl(one):  # backend omits the counter: nothing to validate
        pytest.skip("no flops counter on this backend")
    assert fl(_scan_matmul_compiled()) == pytest.approx(fl(one), rel=0.01)


def test_detect_trip_count_and_expansion():
    from discogan_modernized_tpu.tools.roofline import detect_trip_count

    compiled = _scan_matmul_compiled(k=8, n=256)
    text = compiled.as_text()
    assert detect_trip_count(text) == 8
    per_iter = 3 * 256 * 256 * 4  # read carry + weight, write result
    io = parse_entry_io(text, trip_count=8)
    # Expanded io >= 8 true iterations; carry copies may add ~2 buffers
    # per trip, entry adds a couple more.
    assert 8 * per_iter <= io["io_bytes"] <= 8 * (per_iter + 3 * 256 * 256 * 4)
    # Without expansion the body is counted zero times (opaque flag).
    assert parse_entry_io(text)["io_bytes"] < 8 * per_iter


def test_gather_counted_at_output_size():
    pool = jnp.ones((1024, 64))  # 256 KB pool
    idx = jnp.arange(8, dtype=jnp.int32)
    compiled = jax.jit(lambda p, i: jnp.take(p, i, axis=0)).lower(
        pool, idx).compile()
    io = parse_entry_io(compiled.as_text())
    out_bytes = 8 * 64 * 4
    # Must NOT count the whole 256 KB pool as read.
    assert io["io_bytes"] < pool.size * 4
    assert io["io_bytes"] >= out_bytes


@pytest.mark.slow
def test_scan_program_per_step_matches_weighted_branches():
    """The production fused-scan program's PER-STEP flops and operand-I/O
    lower bound must track the update-interval-weighted per-branch
    programs: flops within 10% (same math), io at or below (the scan body
    does not pay the standalone programs' whole-state write-out)."""
    from discogan_modernized_tpu.tools.roofline import (
        compiled_report, detect_trip_count)
    from discogan_modernized_tpu.train import TrainConfig, init_train_state
    from discogan_modernized_tpu.train.step import (
        make_scan_train_step, make_train_steps, scan_variant)

    cfg = TrainConfig(image_size=16, lean_dis=False)
    ts = jax.eval_shape(lambda k: init_train_state(k, cfg),
                        jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    B = jnp.asarray(rng.rand(8, 16, 16, 3), jnp.float32)
    gen_step, dis_step = make_train_steps(cfg)
    reps = {}
    for name, step in [("gen", gen_step), ("dis", dis_step)]:
        reps[name] = compiled_report(
            step.lower(ts, A, B, jnp.float32(0.5)).compile())

    k, ui = 6, cfg.update_interval
    variant = scan_variant(cfg, ui, k)
    pool = 4 * 8
    dA = jnp.asarray(rng.rand(pool, 16, 16, 3), jnp.float32)
    dB = jnp.asarray(rng.rand(pool, 16, 16, 3), jnp.float32)
    idx = jnp.asarray(rng.randint(0, pool, size=(2, k, 8)), jnp.int32)
    multi = make_scan_train_step(cfg, steps=k, variant=variant)
    compiled = multi.lower(ts, dA, dB, idx[0], idx[1],
                           jnp.int32(ui)).compile()
    trips = detect_trip_count(compiled.as_text())
    assert trips is not None
    steps_per_trip = k / trips
    rep = compiled_report(compiled, trip_count=trips)

    w = lambda key: ((ui - 1) * reps["gen"][key] + reps["dis"][key]) / ui
    flops_step = rep["flops"] / steps_per_trip
    io_step = rep["io_bytes_lo"] / steps_per_trip
    if flops_step and w("flops"):
        assert flops_step == pytest.approx(w("flops"), rel=0.10)
    # Small-shape CPU lowering adds per-trip carry copies; allow 1.3x.
    assert io_step <= 1.3 * w("io_bytes_lo")


def test_conditional_flagged():
    def f(p, x):
        return jax.lax.cond(p, lambda v: v * 2.0, lambda v: v + 1.0, x)

    compiled = jax.jit(f).lower(True, jnp.ones((64, 64))).compile()
    io = parse_entry_io(compiled.as_text())
    # CPU XLA may lower small conds to select; either flag or fold is fine,
    # but the key must exist and parsing must not crash.
    assert "n_conditional" in io
