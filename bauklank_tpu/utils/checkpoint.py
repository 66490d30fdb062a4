"""Checkpoint / resume: engine state and schedules as plain files.

The reference persists only UI control values in localStorage (disabled in
the deployed app — SURVEY.md §5 "Checkpoint / resume"; app/app.mjs:35-47,
app/multi/app.mjs:85-97) and loses engine state on reload.  Here the whole
per-stream audio state (rotation accumulators, previous spectra, OLA tails)
is an explicit pytree, so checkpointing is one flatten + one npz — and a
StreamPool restores mid-playback with sample continuity.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

__all__ = ["save_pytree", "load_pytree", "save_pool", "load_pool"]


def _flatten(tree) -> dict[str, np.ndarray]:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def save_pytree(path: str | pathlib.Path, tree) -> None:
    """Save any pytree of arrays to an .npz (complex leaves stored as-is)."""
    np.savez(path, **_flatten(tree))


def load_pytree(path: str | pathlib.Path, template):
    """Load into the structure of ``template`` (same treedef as saved)."""
    import jax

    data = np.load(path, allow_pickle=False)
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in paths_leaves:
        key = jax.tree_util.keystr(p)
        arr = data[key]
        leaves.append(jax.numpy.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_pool(path: str | pathlib.Path, pool) -> None:
    """Checkpoint a StreamPool: device states + schedules + graph controls.

    Tracks themselves are not stored (the reference also reloads content on
    restart — app/multi/app.mjs:774-792); reload them before resuming.
    """
    import dataclasses

    path = pathlib.Path(path)
    save_pytree(path.with_suffix(".state.npz"), pool.states)
    meta = {
        "out_pos": pool.out_pos,
        "capacity": pool.capacity,
        "sample_rate": pool.sample_rate,
        "slots": [
            {
                "name": s.name,
                "volume": s.volume,
                "pan": s.pan,
                "track_len": s.track_len,
                "loaded": s.loaded,
                "segments": [dataclasses.asdict(seg) for seg in s.timemap.segments],
            }
            for s in pool.slots
        ],
    }
    path.with_suffix(".meta.json").write_text(json.dumps(meta))


def load_pool(path: str | pathlib.Path, pool) -> None:
    """Restore a checkpoint into a compatibly-configured StreamPool."""
    from bauklank_tpu.schedule.timemap import Segment

    path = pathlib.Path(path)
    meta = json.loads(path.with_suffix(".meta.json").read_text())
    if meta["capacity"] != pool.capacity:
        raise ValueError(f"capacity mismatch: {meta['capacity']} vs {pool.capacity}")
    pool.states = load_pytree(path.with_suffix(".state.npz"), pool.states)
    pool.out_pos = int(meta["out_pos"])
    for s, m in zip(pool.slots, meta["slots"]):
        s.name = m["name"]
        s.volume = s._prev_volume = float(m["volume"])
        s.pan = s._prev_pan = float(m["pan"])
        s.track_len = int(m["track_len"])
        s.loaded = bool(m["loaded"])
        s.timemap.segments = [Segment(**seg) for seg in m["segments"]]
    pool._by_name = {s.name: i for i, s in enumerate(pool.slots)}
