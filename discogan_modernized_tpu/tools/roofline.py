"""Whole-program roofline accounting from the compiled executable.

Places each production step program on the v5e compute/bandwidth roofline
using two numbers XLA itself provides for the OPTIMIZED program:

  flops          — exact (calibrated to 1.000x on a known matmul,
                   tests/test_roofline.py);
  bytes accessed — an UPPER bound on HBM traffic: XLA counts algorithmic
                   re-reads (a k4s2 conv ~2.3x, a tiled matmul ~1.7x over
                   pure operand I/O) that VMEM serves in practice;

plus a third this tool derives by parsing the optimized HLO text:

  io_lo          — fusion-granularity operand I/O: every top-level
                   instruction reads each operand once and writes its
                   output once, counting only HBM-space buffers (layout
                   markers S(1)/S(2) = VMEM/SMEM are free). A LOWER bound:
                   tile padding, spills, and in-fusion re-reads that miss
                   VMEM are not counted.

The achievable step time then lives in the window

  [ max(flops/peak, io_lo/BW),  max(flops/peak, bytes_accessed/BW) ]

and a measured step inside (or near) that window is at the hardware
frontier — no kernel rewrite can beat physics. Reference analog: the
cuDNN hot loop the baseline's throughput rides (/root/reference/model.py:8-35);
this is the TPU-side accounting that PERF.md round-2/3 itemizations feed.

Run on the chip:
  python -m discogan_modernized_tpu.tools.roofline \
      [--image_size 64] [--batch 64] [--lean] [--slim mv] [--measure]
"""

from __future__ import annotations

import argparse
import json
import re

import numpy as np

V5E_PEAK_FLOPS = 197e12   # bf16 MXU peak, one v5e chip
V5E_HBM_BYTES_S = 819e9   # HBM bandwidth, one v5e chip

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "token": 0,
}

# Produce no data movement of their own (aliases / metadata).
_FREE_OPCODES = {"parameter", "constant", "tuple", "get-tuple-element",
                 "bitcast", "after-all", "async-update"}

# Two-phase ops: the start half reads the real operands and its tuple
# output merely ALIASES them (+ the eventual result + a sync flag), the
# done half publishes the result. Count reads at start, the result write
# at done, and nothing for consumers of the in-flight tuple — the TPU
# backend wraps most fusions/convolutions in async pairs, and counting
# the tuples verbatim triples the traffic (first calibration run of this
# tool read the 64px G step at 4.5 GB vs the true ~1.9 GB).
_START_OPCODES = {"copy-start", "async-start", "custom-call-start",
                  "all-reduce-start", "all-gather-start",
                  "collective-permute-start", "send", "recv"}


def _split_top_level(s: str) -> list[str]:
    """Split a comma-separated list, ignoring commas inside (), [], {}."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


_ARRAY_RE = re.compile(r"^(\w+)\[([\d,]*)\](\{[^}]*\})?$")


def _array_hbm_bytes(t: str) -> int:
    """HBM bytes of one HLO array type string; 0 for non-HBM spaces.

    `bf16[64,32,32,128]{3,2,1,0:T(8,128)(2,1)}` -> 2 * prod(dims).
    A layout space marker S(n) (VMEM/SMEM/scoped) means the buffer never
    lands in HBM -> 0.
    """
    t = t.strip()
    m = _ARRAY_RE.match(t)
    if not m:
        return 0
    dtype, dims, layout = m.groups()
    if layout and re.search(r"S\(\d+\)", layout):
        return 0
    bpe = _DTYPE_BYTES.get(dtype)
    if bpe is None:
        return 0
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return bpe * n


def _type_hbm_bytes(t: str) -> int:
    """HBM bytes of an HLO type: array, or (possibly nested) tuple."""
    t = t.strip()
    if t.startswith("("):
        inner = t[1:t.rindex(")")]
        return sum(_type_hbm_bytes(e) for e in _split_top_level(inner))
    return _array_hbm_bytes(t)


def _take_type(s: str) -> tuple[str, str]:
    """Split `s` = "<type> <rest>" at the end of the leading HLO type."""
    s = s.strip()
    if s.startswith("("):
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return s[: i + 1], s[i + 1:].strip()
        raise ValueError(f"unbalanced tuple type: {s[:80]}")
    # array type: dtype[dims]{layout}? — layout braces may nest parens.
    i = s.index("]") + 1
    if i < len(s) and s[i] == "{":
        depth = 0
        for j in range(i, len(s)):
            if s[j] == "{":
                depth += 1
            elif s[j] == "}":
                depth -= 1
                if depth == 0:
                    return s[: j + 1], s[j + 1:].strip()
        raise ValueError(f"unbalanced layout: {s[:80]}")
    return s[:i], s[i:].strip()


_INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=\s*(.*)$")
_REF_RE = re.compile(r"%([\w.\-]+)")


def parse_entry_io(hlo_text: str) -> dict:
    """Fusion-granularity HBM operand I/O of the ENTRY computation.

    Returns {"io_bytes": int, "n_instructions": int, "n_while": int}.
    `io_bytes` counts, for every top-level instruction, one read of each
    HBM operand plus one write of each HBM output. `while` bodies are NOT
    expanded (n_while flags them) — use on straight-line step programs.
    """
    lines = hlo_text.splitlines()
    try:
        start = next(i for i, l in enumerate(lines) if l.startswith("ENTRY"))
    except StopIteration:
        raise ValueError("no ENTRY computation in HLO text")
    body = []
    for line in lines[start + 1:]:
        if line.strip() == "}":
            break
        body.append(line)

    readable: dict[str, int] = {}
    total = 0
    n_instr = n_while = 0
    pending: list[tuple[str, str, str]] = []  # (name, opcode, operand str)
    for line in body:
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, rest = m.groups()
        out_type, rest = _take_type(rest)
        om = re.match(r"^([\w\-]+)\(", rest)
        if not om:
            continue
        opcode = om.group(1)
        # Operand list: balanced parens right after the opcode.
        depth, end = 0, None
        off = len(om.group(1))
        for i in range(off, len(rest)):
            if rest[i] == "(":
                depth += 1
            elif rest[i] == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        operands = rest[off + 1: end] if end is not None else ""
        # In-flight tuples of two-phase ops alias their operands:
        # consumers (the done half) re-read nothing.
        readable[name] = (0 if opcode in _START_OPCODES
                          else _type_hbm_bytes(out_type))
        pending.append((name, opcode, operands))

    for name, opcode, operands in pending:
        if opcode in _FREE_OPCODES:
            continue
        n_instr += 1
        if opcode == "while":
            n_while += 1
        reads = sum(readable.get(r, 0) for r in _REF_RE.findall(operands))
        # Start halves read their operands but write only aliases/VMEM;
        # the done half's output is the real result write.
        writes = 0 if opcode in _START_OPCODES else readable.get(name, 0)
        total += reads + writes
    return {"io_bytes": total, "n_instructions": n_instr, "n_while": n_while}


def compiled_report(compiled, *, peak_flops: float = V5E_PEAK_FLOPS,
                    hbm_bytes_s: float = V5E_HBM_BYTES_S,
                    measured_ms: float | None = None) -> dict:
    """Roofline window for one jax Compiled object."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_hi = float(ca.get("bytes accessed", 0.0))
    io = parse_entry_io(compiled.as_text())
    t_flops = flops / peak_flops * 1e3
    t_lo = max(t_flops, io["io_bytes"] / hbm_bytes_s * 1e3)
    t_hi = max(t_flops, bytes_hi / hbm_bytes_s * 1e3)
    rep = {
        "flops": flops,
        "bytes_accessed_hi": bytes_hi,
        "io_bytes_lo": io["io_bytes"],
        "n_while": io["n_while"],
        "t_flops_ms": round(t_flops, 4),
        "roofline_lo_ms": round(t_lo, 4),
        "roofline_hi_ms": round(t_hi, 4),
        "intensity_lo": round(flops / max(bytes_hi, 1), 1),
        "intensity_hi": round(flops / max(io["io_bytes"], 1), 1),
    }
    if measured_ms is not None:
        rep["measured_ms"] = round(measured_ms, 4)
        rep["light_speed_lo"] = round(t_lo / measured_ms, 3)
        rep["light_speed_hi"] = round(min(1.0, t_hi / measured_ms), 3)
    return rep


def _measure_pipelined_ms(step, ts, A, B, n: int = 24, warmup: int = 4):
    """Wall-clock ms/call over n pipelined dispatches, one chain-dependent
    scalar D2H sync at the end (block_until_ready does not block through
    this tunnel)."""
    import time

    import jax

    def run(ts, k):
        losses = None
        for _ in range(k):
            ts, losses = step(ts, A, B, 0.01)
        _ = float(next(iter(losses.values())))
        _ = float(jax.tree.leaves(ts["models"])[0].ravel()[0])
        return ts

    ts = run(ts, warmup)
    t0 = time.perf_counter()
    run(ts, n)
    return (time.perf_counter() - t0) / n * 1e3


def _measure_program_ms(cfg, name, A, B) -> float:
    """DEVICE ms/step for one branch program.

    Small sizes: chained-scan differencing (step_itemize harness) — a
    pipelined per-dispatch loop measures the tunnel's dispatch rate, not
    the device, when steps are a few ms (first version of this tool read
    the lean D-step at 4.4 ms vs its true 1.81 ms device time).

    >=256px: pipelined per-step dispatch — steps are hundreds of ms so
    dispatch overhead is <2%, and the measurement chain's scan would OOM
    on carry copies of the multi-GB train state (the same scan cost that
    makes the trainer route remat-on large sizes per-step, PERF.md)."""
    import dataclasses

    from .step_itemize import step_chain_time

    lean = name == "dis_step_lean"
    branch_cfg = cfg if name == "gen_step" else dataclasses.replace(
        cfg, lean_dis=lean)
    which = "gen" if name == "gen_step" else "dis"
    if cfg.image_size < 256:
        return step_chain_time(branch_cfg, which, A, B) * 1e3

    import jax

    from ..train import init_train_state, make_train_steps
    from ..train.step import make_lean_dis_step

    if lean:
        step = make_lean_dis_step(cfg)
    else:
        step = make_train_steps(branch_cfg)[0 if which == "gen" else 1]
    # Multi-GB state at these sizes: drain the dispatch queue and give
    # the allocator's async frees from the previous program time to land
    # before materializing a fresh train state (bench.py --full hazard).
    import time

    import jax.numpy as jnp

    _ = float(jnp.add(jnp.ones(()), 1.0))
    time.sleep(5)
    ts = init_train_state(jax.random.PRNGKey(0), cfg)
    return _measure_pipelined_ms(step, ts, A, B)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lean", action="store_true",
                   help="also report the lean D-step program")
    p.add_argument("--slim", default="mv", choices=["off", "mv", "all"])
    p.add_argument("--remat", default="auto", choices=["auto", "on", "off"])
    p.add_argument("--measure", action="store_true",
                   help="time each program on the chip (pipelined)")
    p.add_argument("--peak_tflops", type=float, default=V5E_PEAK_FLOPS / 1e12)
    p.add_argument("--hbm_gbs", type=float, default=V5E_HBM_BYTES_S / 1e9)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from ..train import TrainConfig, init_train_state, make_train_steps
    from ..train.step import make_lean_dis_step

    cfg = TrainConfig(image_size=args.image_size, lean_dis=args.lean,
                      slim_state=args.slim,
                      remat={"auto": None, "on": True,
                             "off": False}[args.remat])
    # Lower from abstract shapes: a live multi-GB train state here would
    # co-reside with the one each measurement materializes (OOM at 512px).
    ts = jax.eval_shape(lambda k: init_train_state(k, cfg),
                        jax.random.PRNGKey(0))
    gen_step, dis_step = make_train_steps(cfg)
    programs = {"gen_step": gen_step, "dis_step": dis_step}
    if args.lean:
        programs["dis_step_lean"] = make_lean_dis_step(cfg)

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.rand(args.batch, args.image_size, args.image_size, 3),
                    jnp.float32)
    B = jnp.asarray(rng.rand(args.batch, args.image_size, args.image_size, 3),
                    jnp.float32)
    rate = jnp.float32(0.5)

    peak = args.peak_tflops * 1e12
    bw = args.hbm_gbs * 1e9
    out = {"config": {"image_size": args.image_size, "batch": args.batch,
                      "lean": args.lean, "slim": args.slim,
                      "remat": args.remat},
           "peak_tflops": args.peak_tflops, "hbm_gbs": args.hbm_gbs,
           "programs": {}}
    for name, step in programs.items():
        compiled = step.lower(ts, A, B, rate).compile()
        measured = (_measure_program_ms(cfg, name, A, B)
                    if args.measure else None)
        rep = compiled_report(compiled, peak_flops=peak, hbm_bytes_s=bw,
                              measured_ms=measured)
        out["programs"][name] = rep
        if not args.json:
            w = (f"[{rep['roofline_lo_ms']:.3f}, {rep['roofline_hi_ms']:.3f}]")
            meas = (f"  measured {rep['measured_ms']:.3f} ms  "
                    f"light-speed {rep['light_speed_lo']:.0%}-"
                    f"{rep['light_speed_hi']:.0%}"
                    if measured is not None else "")
            print(f"{name:14s} flops {rep['flops']/1e9:8.1f} GF  "
                  f"io [{rep['io_bytes_lo']/1e9:.2f}, "
                  f"{rep['bytes_accessed_hi']/1e9:.2f}] GB  "
                  f"t_flops {rep['t_flops_ms']:.3f} ms  "
                  f"roofline {w} ms{meas}", flush=True)
            if rep["n_while"]:
                print(f"  note: {rep['n_while']} while op(s) not expanded "
                      f"(use per-step programs)", flush=True)
    if args.json:
        print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
