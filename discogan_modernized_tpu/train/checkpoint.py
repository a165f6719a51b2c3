"""Checkpointing: reference-compatible .pth layout + full native train state.

The reference saves per-model raw state_dicts as
{gen_A,gen_B,dis_A,dis_B}_{<iters>|final}.pth under
<models_dir>/<task>[/<style_A>]/<arch>/<timestamp>/ (ref
image_translation.py:419-432) and its inference hardcodes those names
(inference.py:127-132). We keep that exact external layout — files written
with torch.save so the *reference itself* can load them — while fixing its
resume gap (weights-only, no optimizer/iteration/RNG state — SURVEY §5):
`save_train_state` persists the complete pytree (params, BN states, both
Adam states, iteration counter) alongside, and `load_train_state` resumes
exactly.
"""

from __future__ import annotations

import json
import pickle
from pathlib import Path

import numpy as np
import jax

from ..models.torch_compat import (
    generator_to_state_dict,
    generator_from_state_dict,
    discriminator_to_state_dict,
    discriminator_from_state_dict,
)

MODEL_NAMES = ("gen_A", "gen_B", "dis_A", "dis_B")


def _to_state_dict(name, params, state):
    if name.startswith("gen"):
        return generator_to_state_dict(params, state)
    return discriminator_to_state_dict(params, state)


def _from_state_dict(name, sd, image_size):
    if name.startswith("gen"):
        return generator_from_state_dict(sd, image_size)
    return discriminator_from_state_dict(sd, image_size)


def save_reference_layout(model_path, ts, tag):
    """Write the 4 .pth files for iteration `tag` (int or "final")."""
    model_path = Path(model_path)
    model_path.mkdir(parents=True, exist_ok=True)
    def as_f32_numpy(v):
        # Slim-state runs store bf16 master params; the reference layout
        # (and torch.from_numpy) is f32 — cast on export like torch would
        # save a .float() copy.
        v = np.array(v, copy=True)
        if str(v.dtype) == "bfloat16":
            v = v.astype(np.float32)
        return v

    try:
        import torch

        def dump(sd, path):
            torch.save({k: torch.from_numpy(as_f32_numpy(v))
                        for k, v in sd.items()}, path)
    except Exception:  # torch-free host: plain pickle of numpy arrays
        def dump(sd, path):
            with open(path, "wb") as f:
                pickle.dump({k: as_f32_numpy(v) for k, v in sd.items()}, f)

    for name in MODEL_NAMES:
        sd = _to_state_dict(name, ts["models"][name], ts["model_states"][name])
        dump(sd, model_path / f"{name}_{tag}.pth")


def load_reference_weights(path, name, image_size):
    """Load one reference-layout .pth into (params, state). Accepts real
    torch checkpoints (including ones produced by the PyTorch reference).

    Raw pickle is used only when torch is not importable (matching the
    torch-free save path above), or as an explicit opt-in FALLBACK with
    DISCOGAN_ALLOW_PICKLE=1 — torch.load(weights_only=True) is still
    tried first so genuine torch checkpoints keep loading, and a failed
    safe load is never silently retried through pickle without the
    opt-in (that would reopen the arbitrary-code-execution path
    weights_only exists to close)."""
    import os

    path = Path(path)
    try:
        import torch
    except ImportError:
        torch = None
    allow_pickle = os.environ.get("DISCOGAN_ALLOW_PICKLE") == "1"
    if torch is None:
        with open(path, "rb") as f:
            sd = pickle.load(f)
    else:
        try:
            raw = torch.load(path, map_location="cpu", weights_only=True)
            sd = {k: np.asarray(v) for k, v in raw.items()}
        except Exception:
            if not allow_pickle:
                raise
            with open(path, "rb") as f:
                sd = pickle.load(f)
    return _from_state_dict(name, sd, image_size)


def save_train_state(model_path, ts, iters: int, meta: dict | None = None,
                     backend: str = "npz"):
    """Full-fidelity internal checkpoint.

    backend="npz" (default): single-host numpy archive of the flattened
    pytree — simple, dependency-free, used for the unreplicated view.
    backend="orbax": sharded/async-capable OCDBT checkpoint — accepts a
    mesh-sharded train state directly (GSPMD runs) and restores with the
    original shardings on multi-host meshes.
    """
    import os
    import shutil

    model_path = Path(model_path)
    model_path.mkdir(parents=True, exist_ok=True)
    # Crash-safe ordering: this save runs from the SIGTERM preemption
    # path, so a kill mid-write must never destroy the previous good
    # checkpoint. Everything is written under a temp name and moved into
    # place with os.replace/rename (atomic within a filesystem). A crash
    # between the archive replace and the meta replace leaves the NEW
    # archive with the PREVIOUS meta's iters — benign (resume re-trains a
    # few iterations from newer weights); a truncated/corrupt archive can
    # never become the live one.
    if backend == "orbax":
        import orbax.checkpoint as ocp

        # Multi-host: orbax saves are COLLECTIVE — its internal
        # sync_global_processes barriers require EVERY process to enter
        # save() (a process-0-only call deadlocks the fleet: the other
        # tasks never join the barrier and the Gloo key-value lookups time
        # out — observed in tests/test_multihost.py). The surrounding
        # filesystem mutations (temp-dir cleanup, swap, meta) stay
        # primary-only, fenced so no process can race them.
        multiproc = jax.process_count() > 1
        primary = jax.process_index() == 0

        def _fence(tag):
            if multiproc:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(
                    f"discogan_ckpt_{tag}_{iters}")

        ckptr = ocp.StandardCheckpointer()
        ckpt_dir = (model_path / "train_state_orbax").absolute()
        tmp_dir = (model_path / "train_state_orbax.new").absolute()
        if primary and tmp_dir.exists():
            if not ckpt_dir.exists():
                # A previous crash landed between its rmtree and rename:
                # the fully-written .new dir is the ONLY checkpoint.
                # Promote it before reusing the temp name — rmtree'ing it
                # here would leave a second crash during this save with
                # no checkpoint at all.
                os.rename(tmp_dir, ckpt_dir)
            else:
                shutil.rmtree(tmp_dir)
        _fence("pre")
        ckptr.save(tmp_dir, ts)
        ckptr.wait_until_finished()
        # Swap: the only non-atomic window is between rmtree and rename;
        # load_train_state falls back to the .new dir if the final one
        # vanished there.
        if primary:
            if ckpt_dir.exists():
                shutil.rmtree(ckpt_dir)
            os.rename(tmp_dir, ckpt_dir)
        _fence("post")
        if not primary:
            return  # meta is primary-owned I/O
    else:
        leaves, treedef = jax.tree.flatten(ts)

        def storable(l):
            # npz can't hold ml_dtypes bf16; store as f32 (lossless) and
            # let load_train_state cast back to the template dtype.
            a = np.asarray(l)
            return a.astype(np.float32) if str(a.dtype) == "bfloat16" else a

        # NOTE: np.savez appends ".npz" to names that lack it — the temp
        # name must already end in .npz or the replace misses the file.
        tmp = model_path / "train_state.tmp.npz"
        np.savez(tmp, **{f"leaf_{i}": storable(l)
                         for i, l in enumerate(leaves)})
        os.replace(tmp, model_path / "train_state.npz")
    tmp_meta = model_path / "train_state_meta.json.tmp"
    with open(tmp_meta, "w") as f:
        json.dump({"iters": iters, "backend": backend,
                   **(meta or {})}, f)
    os.replace(tmp_meta, model_path / "train_state_meta.json")


def load_train_state(model_path, ts_template):
    """Restore a full checkpoint into the structure of `ts_template`.
    Returns (ts, iters). Backend auto-detected from the meta file."""
    model_path = Path(model_path)
    with open(model_path / "train_state_meta.json") as f:
        meta = json.load(f)
    if meta.get("backend") == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckpt_dir = (model_path / "train_state_orbax").absolute()
        if not ckpt_dir.exists():
            # A crash between save_train_state's rmtree and rename leaves
            # only the fully-written .new dir — recover from it, and
            # PROMOTE it to the final name so a later save cannot rmtree
            # the sole surviving checkpoint while reusing the temp name.
            new_dir = (model_path / "train_state_orbax.new").absolute()
            if new_dir.exists():
                import os

                try:
                    os.rename(new_dir, ckpt_dir)
                except OSError:
                    # Either a read-only fs (restore the .new dir in
                    # place) or we lost the promotion race to another
                    # resuming process on a shared fs (its rename already
                    # produced the final dir — use that; pointing at the
                    # renamed-away .new path would crash the resume).
                    if not ckpt_dir.exists():
                        ckpt_dir = new_dir
        ts = ckptr.restore(ckpt_dir, ts_template)
        # Normalize to HOST arrays like the npz branch returns: orbax
        # hands back COMMITTED per-device jax.Arrays, which a multi-host
        # mesh jit refuses to auto-reshard ("incompatible devices") —
        # the caller re-places the state (replicate/place_train_state)
        # exactly as it does a fresh init. np.asarray preserves bf16
        # (ml_dtypes) leaves.
        ts = jax.tree.map(
            lambda a: np.asarray(a) if isinstance(a, jax.Array) else a, ts)
        return ts, int(meta["iters"])
    with np.load(model_path / "train_state.npz") as z:
        leaves_t, treedef = jax.tree.flatten(ts_template)
        if len(leaves_t) != len(z.files):
            raise ValueError(
                f"checkpoint has {len(z.files)} leaves, template has "
                f"{len(leaves_t)} — config mismatch?"
            )
        leaves = [z[f"leaf_{i}"] for i in range(len(leaves_t))]
        # Slim-state templates hold bf16 leaves (stored as f32 in the
        # archive — bf16->f32->bf16 is lossless); restore template dtypes.
        # Read .dtype METADATA only — np.asarray(device_leaf) would D2H
        # the whole template state (~8GB at 512px, ~100ms/MB through the
        # tunnel) just to learn its dtype.
        def _dt(b):
            return b.dtype if hasattr(b, "dtype") else None

        leaves = [a.astype(_dt(b))
                  if _dt(b) is not None and a.dtype != _dt(b)
                  else a
                  for a, b in zip(leaves, leaves_t)]
        for i, (a, b) in enumerate(zip(leaves, leaves_t)):
            if tuple(a.shape) != tuple(np.shape(b)):
                raise ValueError(
                    f"checkpoint leaf {i} has shape {tuple(a.shape)}, current "
                    f"config expects {tuple(np.shape(b))} — was this "
                    f"checkpoint written with a different --image_size or "
                    f"--model_arch?"
                )
    ts = jax.tree.unflatten(treedef, leaves)
    return ts, int(meta["iters"])
