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
_COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s*(?:\(.*\))?\s*->.*\{\s*$")
_CALLS_RE = re.compile(r"(?:body|calls)=%?([\w.\-]+)")
_COND_COMP_RE = re.compile(r"condition=%?([\w.\-]+)")

# Index-driven slicing ops touch roughly their OUTPUT's worth of the big
# operand, not the whole buffer — counting the full (N,H,W,3) HBM-resident
# dataset for every per-step batch gather would overstate the LOWER bound.
_SLICE_OPCODES = {"gather", "dynamic-slice"}


def parse_computations(hlo_text: str) -> tuple[str, dict[str, list[str]]]:
    """All computations of an HLO module: (entry_name, {name: body lines})."""
    comps: dict[str, list[str]] = {}
    entry = None
    cur = None
    for line in hlo_text.splitlines():
        if cur is None:
            m = _COMP_RE.match(line)
            if m:
                cur = m.group(2)
                comps[cur] = []
                if m.group(1):
                    entry = cur
        elif line.strip() == "}":
            cur = None
        else:
            comps[cur].append(line)
    if entry is None:
        raise ValueError("no ENTRY computation in HLO text")
    return entry, comps


def _parse_instr(line: str):
    """(name, out_type, opcode, operands, attrs) of one HLO instruction
    line, or None."""
    m = _INSTR_RE.match(line)
    if not m:
        return None
    name, rest = m.groups()
    out_type, rest = _take_type(rest)
    om = re.match(r"^([\w\-]+)\(", rest)
    if not om:
        return None
    opcode = om.group(1)
    depth, end = 0, None
    for i in range(len(opcode), len(rest)):
        if rest[i] == "(":
            depth += 1
        elif rest[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    operands = rest[len(opcode) + 1: end] if end is not None else ""
    attrs = rest[end + 1:] if end is not None else ""
    return name, out_type, opcode, operands, attrs


def _fusion_slice_charges(body_lines: list[str]) -> dict[int, int]:
    """{parameter index: charged read bytes} for fusion parameters whose
    ONLY consumers inside the fused computation are gather/dynamic-slice
    ops slicing them — such a parameter's HBM read is ~the slices' output
    size, not the whole buffer (the per-step batch gather from the
    HBM-resident dataset)."""
    instrs = []
    param_name_to_idx: dict[str, int] = {}
    for line in body_lines:
        p = _parse_instr(line)
        if p is None:
            continue
        instrs.append(p)
        if p[2] == "parameter":
            pm = re.match(r"^\s*(\d+)", p[3])
            if pm:
                param_name_to_idx[p[0]] = int(pm.group(1))
    charges: dict[int, int] = {}
    for pname, idx in param_name_to_idx.items():
        users = [(op, operands, out_type)
                 for (n, out_type, op, operands, _) in instrs
                 if op != "parameter" and pname in _REF_RE.findall(operands)]
        if users and all(
                op in _SLICE_OPCODES and _REF_RE.findall(operands)[0] == pname
                for op, operands, _ in users):
            charges[idx] = sum(_type_hbm_bytes(t) for _, _, t in users)
    return charges


def _computation_io(name: str, comps: dict[str, list[str]],
                    trip_count: int | None, stats: dict) -> int:
    """Fusion-granularity HBM operand I/O of one computation.

    Counts one read per HBM operand + one write per HBM output for every
    top-level instruction. `while` ops recurse into their body×trip_count
    (+1 cond pass per trip) when trip_count is given; otherwise they are
    counted as opaque instructions and flagged in stats["n_while"].
    `conditional` branches are NOT expanded (flagged) — roofline the
    straight-line "phase" program instead.
    """
    readable: dict[str, int] = {}
    pending: list[tuple[str, str, str, str]] = []
    for line in comps[name]:
        p = _parse_instr(line)
        if p is None:
            continue
        iname, out_type, opcode, operands, attrs = p
        # In-flight tuples of two-phase ops alias their operands:
        # consumers (the done half) re-read nothing.
        readable[iname] = (0 if opcode in _START_OPCODES
                           else _type_hbm_bytes(out_type))
        pending.append((iname, opcode, operands, attrs))

    total = 0
    for iname, opcode, operands, attrs in pending:
        if opcode in _FREE_OPCODES:
            continue
        stats["n_instructions"] += 1
        if opcode == "while":
            stats["n_while"] += 1
            if trip_count is not None:
                bm = _CALLS_RE.search(attrs)
                cm = _COND_COMP_RE.search(attrs)
                if bm and bm.group(1) in comps:
                    body_io = _computation_io(bm.group(1), comps,
                                              trip_count, stats)
                    cond_io = (_computation_io(cm.group(1), comps,
                                               trip_count, stats)
                               if cm and cm.group(1) in comps else 0)
                    # The carry is aliased in place: charge the body (and
                    # cond read) per trip; init read/final write are the
                    # producer's/consumer's operand accounting.
                    total += trip_count * (body_io + cond_io)
                    continue
        if opcode == "conditional":
            stats["n_conditional"] += 1
        if opcode in _SLICE_OPCODES:
            # Touches ~output-size of the sliced operand (+ tiny indices).
            total += 2 * readable.get(iname, 0)
            continue
        if opcode == "dynamic-update-slice":
            # In-place: reads + writes only the update operand's bytes.
            refs = _REF_RE.findall(operands)
            upd = readable.get(refs[1], 0) if len(refs) > 1 else 0
            total += 2 * upd
            continue
        if opcode == "fusion":
            fm = _CALLS_RE.search(attrs)
            if fm and fm.group(1) in comps:
                charges = _fusion_slice_charges(comps[fm.group(1)])
                if charges:
                    reads = 0
                    for pos, r in enumerate(_REF_RE.findall(operands)):
                        full = readable.get(r, 0)
                        lim = charges.get(pos)
                        reads += full if lim is None else min(full, lim)
                    total += reads + readable.get(iname, 0)
                    continue
        reads = sum(readable.get(r, 0) for r in _REF_RE.findall(operands))
        # Start halves read their operands but write only aliases/VMEM;
        # the done half's output is the real result write.
        writes = 0 if opcode in _START_OPCODES else readable.get(iname, 0)
        total += reads + writes
    return total


def detect_trip_count(hlo_text: str) -> int | None:
    """Trip count of the module's single while loop, if it is the
    canonical counted-loop shape (cond: compare(iv, constant N), LT).
    Returns None when there is not exactly one while or no such constant.
    """
    entry, comps = parse_computations(hlo_text)
    whiles = []
    for body in comps.values():
        for line in body:
            if re.search(r"=\s*\(?[^=]*\bwhile\(", line):
                cm = _COND_COMP_RE.search(line)
                if cm:
                    whiles.append(cm.group(1))
    if len(whiles) != 1 or whiles[0] not in comps:
        return None
    consts = []
    for line in comps[whiles[0]]:
        m = re.search(r"=\s*[su]32\[\]\{?[^=]*constant\((\d+)\)", line)
        if m:
            consts.append(int(m.group(1)))
    return consts[0] if len(consts) == 1 else None


def parse_entry_io(hlo_text: str, *, trip_count: int | None = None) -> dict:
    """Fusion-granularity HBM operand I/O of the ENTRY computation.

    Returns {"io_bytes", "n_instructions", "n_while", "n_conditional"}.
    `io_bytes` counts, for every top-level instruction, one read of each
    HBM operand plus one write of each HBM output. With trip_count given,
    `while` bodies are expanded (body io × trips); without it they are
    flagged via n_while — use on straight-line step programs, or pass the
    scan length.
    """
    entry, comps = parse_computations(hlo_text)
    stats = {"n_instructions": 0, "n_while": 0, "n_conditional": 0}
    io = _computation_io(entry, comps, trip_count, stats)
    return {"io_bytes": io, **stats}


def compiled_report(compiled, *, peak_flops: float = V5E_PEAK_FLOPS,
                    hbm_bytes_s: float = V5E_HBM_BYTES_S,
                    measured_ms: float | None = None,
                    trip_count: int | None = None) -> dict:
    """Roofline window for one jax Compiled object.

    With trip_count (pass the scan length for fused-scan programs) the
    report is PER STEP: XLA's cost_analysis counts a while body exactly
    ONCE regardless of trips (validated in tests/test_roofline.py — a
    scan of 8 matmuls reports one matmul's flops), so the entry totals
    are already ~per-step (body once + negligible out-of-loop work),
    while the parsed operand-I/O expands the body×trips and divides
    back. measured_ms must then be per-step too."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_hi = float(ca.get("bytes accessed", 0.0))
    io = parse_entry_io(compiled.as_text(), trip_count=trip_count)
    if trip_count:
        io = dict(io, io_bytes=io["io_bytes"] / trip_count)
    t_flops = flops / peak_flops * 1e3
    t_lo = max(t_flops, io["io_bytes"] / hbm_bytes_s * 1e3)
    # CPU XLA's "bytes accessed" is pure operand I/O and can dip below the
    # parsed bound by small copies; keep the window well-formed.
    t_hi = max(t_flops, bytes_hi / hbm_bytes_s * 1e3, t_lo)
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
    p.add_argument("--scan", type=int, default=0, metavar="K",
                   help="also roofline the PRODUCTION fused-scan program "
                        "at K steps/call (per-step report; K should be a "
                        "whole number of update periods for the "
                        "straight-line phase variant)")
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
            _print_row(name, rep)

    if args.scan:
        rep = _scan_report(cfg, args, ts, peak, bw)
        out["programs"][f"scan_per_step_k{args.scan}"] = rep
        if not args.json:
            _print_row(f"scan/step k={args.scan}", rep)
    if args.json:
        print(json.dumps(out))
    return out


def _print_row(name: str, rep: dict) -> None:
    w = (f"[{rep['roofline_lo_ms']:.3f}, {rep['roofline_hi_ms']:.3f}]")
    meas = (f"  measured {rep['measured_ms']:.3f} ms  "
            f"light-speed {rep['light_speed_lo']:.0%}-"
            f"{rep['light_speed_hi']:.0%}"
            if rep.get("measured_ms") is not None else "")
    print(f"{name:16s} flops {rep['flops']/1e9:8.1f} GF  "
          f"io [{rep['io_bytes_lo']/1e9:.2f}, "
          f"{rep['bytes_accessed_hi']/1e9:.2f}] GB  "
          f"t_flops {rep['t_flops_ms']:.3f} ms  "
          f"roofline {w} ms{meas}", flush=True)
    if rep["n_while"] and "trips" not in rep:
        print(f"  note: {rep['n_while']} while op(s) not expanded "
              f"(use per-step programs or --scan)", flush=True)
    if rep.get("n_conditional"):
        print(f"  note: {rep['n_conditional']} conditional(s) counted "
              f"opaquely (use the straight-line phase program)", flush=True)


def _scan_report(cfg, args, ts_abstract, peak: float, bw: float) -> dict:
    """PER-STEP roofline of the production fused-scan program.

    The phase variant's while body is one whole [D, G, ..., G] update
    period, so trips = k/update_interval and per-step = per-trip /
    update_interval. XLA's cost_analysis counts the body once (== one
    trip, see compiled_report), and the parsed operand I/O expands
    body×trips; both normalize to per-step below. The gather from the
    HBM-resident dataset is counted at ~output size (a small pool keeps
    even a full-operand miscount bounded)."""
    import jax
    import jax.numpy as jnp

    from ..train.step import make_scan_train_step, scan_variant

    k, ui = args.scan, cfg.update_interval
    it0 = ui  # aligned, and skips the logged-D iteration at 0 (lean mode)
    variant = scan_variant(cfg, it0, k)
    pool = 4 * args.batch
    rng = np.random.RandomState(0)
    shape = (pool, args.image_size, args.image_size, 3)
    dA = jnp.asarray(rng.rand(*shape), jnp.float32)
    dB = jnp.asarray(rng.rand(*shape), jnp.float32)
    idx = jnp.asarray(rng.randint(0, pool, size=(2, k, args.batch)), jnp.int32)
    iters0 = jnp.int32(it0)
    multi = make_scan_train_step(cfg, steps=k, variant=variant)
    compiled = multi.lower(ts_abstract, dA, dB, idx[0], idx[1],
                           iters0).compile()
    n_trips = detect_trip_count(compiled.as_text())
    if n_trips is None:
        n_trips = k // ui if variant.startswith("phase") else k
    steps_per_trip = k / n_trips

    measured = None
    if args.measure:
        import time

        _ = float(jnp.add(jnp.ones(()), 1.0))
        time.sleep(5)
        from ..train import init_train_state
        ts = init_train_state(jax.random.PRNGKey(0), cfg)

        def run(ts, calls):
            losses = None
            for _ in range(calls):
                ts, losses = multi(ts, dA, dB, idx[0], idx[1], iters0)
            _ = float(next(iter(losses.values()))[-1])
            _ = float(jax.tree.leaves(ts["models"])[0].ravel()[0])
            return ts

        calls = max(2, 192 // k)
        ts = run(ts, max(1, calls // 2))
        t0 = time.perf_counter()
        run(ts, calls)
        measured = (time.perf_counter() - t0) / (calls * k) * 1e3

    rep = compiled_report(compiled, peak_flops=peak, hbm_bytes_s=bw,
                          trip_count=n_trips)
    # compiled_report's trip normalization is per-TRIP; go to per-step.
    for key in ("flops", "bytes_accessed_hi", "io_bytes_lo"):
        rep[key] = rep[key] / steps_per_trip
    rep["t_flops_ms"] = round(rep["flops"] / peak * 1e3, 4)
    rep["roofline_lo_ms"] = round(max(rep["t_flops_ms"],
                                      rep["io_bytes_lo"] / bw * 1e3), 4)
    rep["roofline_hi_ms"] = round(max(rep["t_flops_ms"],
                                      rep["bytes_accessed_hi"] / bw * 1e3,
                                      rep["roofline_lo_ms"]), 4)
    rep["intensity_lo"] = round(rep["flops"] / max(rep["bytes_accessed_hi"],
                                                   1), 1)
    rep["intensity_hi"] = round(rep["flops"] / max(rep["io_bytes_lo"], 1), 1)
    rep["trips"] = n_trips
    rep["variant"] = variant
    if measured is not None:
        rep["measured_ms"] = round(measured, 4)
        rep["light_speed_lo"] = round(rep["roofline_lo_ms"] / measured, 3)
        rep["light_speed_hi"] = round(min(1.0, rep["roofline_hi_ms"]
                                          / measured), 3)
    return rep


if __name__ == "__main__":
    main()
