"""TPU-target lowering of the TPU-mode graphs, validated WITHOUT a TPU.

The engines pick their TPU specializations (Pallas bandchain + chainfetch
kernels, the fused matmul-MDFT) by `jax.default_backend()` at trace time,
so the CPU suite normally never lowers those branches.  `jax.export` can
lower for `platforms=["tpu"]` on any host: these tests patch the backend
probe to force the TPU-mode graph and assert the full serving steps lower
for the real target — catching Pallas/Mosaic lowering errors (block-shape
rules, layout constraints) and fused-MDFT shape bugs in CI, where
previously they could only surface on the tunneled device (VERDICT-r3
weak #4: TPU kernels exercised only in interpreter mode).

Mosaic's late compile passes still run on-device at XLA compile time —
benchmarks/check_tpu_golden.py covers those numerically on real hardware.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SR = 44100.0


@pytest.fixture
def tpu_mode_graph(monkeypatch):
    """Trace with jax.default_backend() == "tpu" (graph selection only —
    execution stays on CPU; nothing is run, only lowered)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_fidelity_step_lowers_for_tpu(tpu_mode_graph, monkeypatch):
    """batched_fidelity_chunk with the Pallas bandchain + chainfetch
    kernels in-graph must lower for the tpu platform (chainfetch is
    opt-in since the v5e measurements — forced on here so its Mosaic
    lowering stays covered)."""
    monkeypatch.setenv("BAUKLANK_CHAINFETCH", "1")
    from bauklank_tpu.engine.fidelity import (
        SpectralConfig,
        batched_fidelity_chunk,
        init_batched_fidelity_state,
    )

    s, h = 4, 2
    cfg = SpectralConfig(
        channels=2, block=round(0.12 * SR), interval=round(0.03 * SR))
    states = init_batched_fidelity_state(cfg, s)
    audios = jnp.zeros((s, 2, int(2 * SR)), jnp.float32)
    ends = jnp.full((s, h), 6000, jnp.int32)
    ones = jnp.ones((s,), jnp.float32)
    limit = jnp.full((s,), 0.18, jnp.float32)

    f = jax.jit(functools.partial(batched_fidelity_chunk, cfg))
    exp = jax.export.export(f, platforms=["tpu"])(
        states, audios, ends, ones, ones, limit, ones)
    assert len(exp.mlir_module_serialized) > 0
    # the TPU-mode graph must actually contain the Mosaic custom calls
    assert b"tpu_custom_call" in exp.mlir_module_serialized


def test_fidelity_step_default_lowers_for_tpu(tpu_mode_graph):
    """The DEFAULT fidelity serving graph (Pallas bandchain + the XLA
    window gather in the deterministic-regime cond branch) must lower
    for the tpu platform."""
    from bauklank_tpu.engine.fidelity import (
        SpectralConfig,
        batched_fidelity_chunk,
        init_batched_fidelity_state,
    )

    s, h = 4, 2
    cfg = SpectralConfig(
        channels=2, block=round(0.12 * SR), interval=round(0.03 * SR))
    states = init_batched_fidelity_state(cfg, s)
    audios = jnp.zeros((s, 2, int(2 * SR)), jnp.float32)
    ends = jnp.full((s, h), 6000, jnp.int32)
    ones = jnp.ones((s,), jnp.float32)
    limit = jnp.full((s,), 0.18, jnp.float32)

    f = jax.jit(functools.partial(batched_fidelity_chunk, cfg))
    exp = jax.export.export(f, platforms=["tpu"])(
        states, audios, ends, ones, ones, limit, ones)
    assert b"tpu_custom_call" in exp.mlir_module_serialized  # bandchain


def test_window_gather_pallas_optin_lowers_for_tpu(tpu_mode_graph):
    """The fused Pallas selection+taps kernel (ops/pallas/wintaps.py) is
    the TPU DEFAULT since the plane-major combine epilogue landed
    (49.02 vs 52.92 ms/step at S=128 H=8 on the v5e — the bm epilogue's
    32x-padded combine buffer was what sank it before); the TPU-mode
    default graph must therefore carry the kernel, and the einsum form
    must stay kernel-free (it remains the off-TPU / fallback path)."""
    import numpy as np

    from bauklank_tpu.ops.windowgather import window_gather_taps, window_t1

    n, b, c_n, L = 4, 192, 2, 5
    rng = np.random.default_rng(3)
    spec = jnp.asarray(rng.standard_normal((n, b, 2 * c_n)).astype(np.float32))
    prev = jnp.asarray(rng.standard_normal((n, b, 2 * c_n)).astype(np.float32))
    en = jnp.asarray(np.abs(rng.standard_normal((n, b, c_n))).astype(np.float32))
    ib = jnp.asarray(
        np.sort(rng.uniform(0, b - 1, (n, b))).astype(np.float32))
    c = jnp.asarray(np.full((n,), 1.25, np.float32))
    cc = np.asarray(c)[:, None]
    base = np.asarray(ib)
    us = np.concatenate([base[:, 1:], np.zeros((n, 1), np.float32)], 1) - cc
    ul = np.concatenate(
        [base[:, L:], np.zeros((n, L), np.float32)], 1) - cc * L
    pos5 = jnp.asarray(np.concatenate(
        [base, base - cc, base - cc * L, us, ul], 1))

    f = jax.jit(functools.partial(
        window_gather_taps, long_step=L, t1=window_t1(b, L),
        fetch="pallas"))
    exp = jax.export.export(f, platforms=["tpu"])(
        spec, prev, en, ib, pos5, c)
    assert b"tpu_custom_call" in exp.mlir_module_serialized

    # the default resolves to the kernel when tracing for TPU
    f_def = jax.jit(functools.partial(
        window_gather_taps, long_step=L, t1=window_t1(b, L)))
    exp_def = jax.export.export(f_def, platforms=["tpu"])(
        spec, prev, en, ib, pos5, c)
    assert b"tpu_custom_call" in exp_def.mlir_module_serialized

    # the einsum form stays kernel-free (off-TPU / fallback path)
    f_ein = jax.jit(functools.partial(
        window_gather_taps, long_step=L, t1=window_t1(b, L),
        fetch="einsum"))
    exp_ein = jax.export.export(f_ein, platforms=["tpu"])(
        spec, prev, en, ib, pos5, c)
    assert b"tpu_custom_call" not in exp_ein.mlir_module_serialized


def test_entry_lowers_for_tpu(tpu_mode_graph):
    """The flagship fast-engine step (Pallas frame fetch on the TPU-mode
    graph; jnp.fft MDFT — the measured-faster default, STATUS-r4 §6)
    must lower for the tpu platform."""
    import __graft_entry__ as g

    fn, args = g.entry()
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0


def test_entry_lowers_for_tpu_fused_mdft(tpu_mode_graph, monkeypatch):
    """The BAUKLANK_FUSED_MDFT=1 A/B variant (folded matmul-MDFT) must
    keep lowering for the tpu platform even though it is off by default."""
    import __graft_entry__ as g
    from bauklank_tpu.engine import core as core_mod

    monkeypatch.setattr(core_mod, "_FUSED_MDFT", True)
    fn, args = g.entry()
    exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module_serialized) > 0


def test_live_fidelity_step_lowers_for_tpu(tpu_mode_graph):
    """batched_live_fidelity_chunk (the blob-exact COUPLED mode, r5) must
    lower for the tpu platform with the TPU-default kernel set in-graph
    (wintaps window gather, Pallas frames fetch)."""
    from bauklank_tpu.engine.fidelity import (
        SpectralConfig,
        batched_live_fidelity_chunk,
        init_batched_live_fidelity_state,
    )

    s, h = 4, 2
    cfg = SpectralConfig(
        channels=2, block=round(0.12 * SR), interval=round(0.03 * SR))
    states = init_batched_live_fidelity_state(cfg, h, s)
    chunks = jnp.zeros((s, 2, h * cfg.interval), jnp.float32)
    ones = jnp.ones((s,), jnp.float32)
    limit = jnp.full((s,), 0.18, jnp.float32)

    f = jax.jit(functools.partial(batched_live_fidelity_chunk, cfg))
    exp = jax.export.export(f, platforms=["tpu"])(
        states, chunks, ones, limit, ones)
    assert len(exp.mlir_module_serialized) > 0
    assert b"tpu_custom_call" in exp.mlir_module_serialized


def test_fidelity_step_kiosk_geometry_lowers_for_tpu(tpu_mode_graph):
    """The deployed kiosk operating point (blockMs=200, overlap=1.0 ->
    interval == block, long_step == 1) must lower for tpu: r5 found the
    Pallas bandchain ring-shift tracing an empty slice at long_step == 1
    on the real chip — an edge the CPU suite's interpret-mode runs and
    the non-TPU graph never reach."""
    from bauklank_tpu.engine.fidelity import (
        SpectralConfig,
        batched_fidelity_chunk,
        init_batched_fidelity_state,
    )

    s, h = 2, 2
    blk = round(0.2 * SR)
    cfg = SpectralConfig(channels=2, block=blk, interval=blk)
    states = init_batched_fidelity_state(cfg, s)
    audios = jnp.zeros((s, 2, int(2 * SR)), jnp.float32)
    ends = jnp.full((s, h), blk + 600, jnp.int32)
    # rate 0.001 -> saturated tf (min(1/rate, interval)): the MINSTD
    # regime cond branch compiles in alongside the deterministic one
    tf = jnp.full((s,), min(1000.0, float(blk)), jnp.float32)
    ones = jnp.ones((s,), jnp.float32)
    limit = jnp.full((s,), 0.18, jnp.float32)

    f = jax.jit(functools.partial(batched_fidelity_chunk, cfg))
    exp = jax.export.export(f, platforms=["tpu"])(
        states, audios, ends, tf, ones, limit, ones)
    assert len(exp.mlir_module_serialized) > 0
    assert b"tpu_custom_call" in exp.mlir_module_serialized
