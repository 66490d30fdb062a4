"""Blob-exact spectral hop — the reference engine's algorithm in JAX.

This is the fidelity core: a jittable, batchable restatement of the
reverse-engineered reference DSP (docs/WASM-ALGO.md; the opaque WASM blob
at reference app/SignalsmithStretch.mjs:265, pinned hop-exact by
tools/golden_wasm/pymodel.py against live memory dumps).  One call maps
(carried state, two analyses, controls) -> (new state, output spectrum),
exactly like the blob's processSpectrum:

1. rotate carried spectra to the new frame position,
2. peak-based frequency map (channel-summed energy -> two-pass one-pole
   smoothing -> maximal runs -> smoothstep output map with gradient),
3. per-channel predictions (interpolated energy/input, time-twist against
   the previous-interval analysis, shared stale prediction buffer),
4. sequential Gauss-Seidel phase propagation over bands with short (1) and
   long (round(fft/interval)) neighbors, max-energy channel leading and the
   other channels phase-locked to it.

TPU mapping: steps 1-3 are elementwise/scan-free batched ops (the one-pole
smoother is an affine ``associative_scan``); step 4 is irreducibly
sequential in the band axis (each band's phase depends on finalized lower
bands), so it runs as one ``lax.scan`` over bands carrying a ring of the
last ``long_step`` outputs — the body is a handful of complex mul-adds that
vectorize across streams x channels, so a whole serving pool advances the
scan in lockstep.  No data-dependent shapes anywhere.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SpectralConfig",
    "SpectralState",
    "fft_size_for",
    "blob_window",
    "init_spectral_state",
    "spectral_hop",
]

EPS = 1e-15  # the blob's noise floor (measured; pymodel.EPS)


def fft_size_for(block: int) -> int:
    """Smallest ``2^a * m >= block`` with ``m in {1, 3, 5}`` — the blob's
    measured FFT-size rule (docs/WASM-ALGO.md "Sizes").  Note 3*2^a and
    2^a land on the TPU-friendly FFT grid; 5*2^a costs more on TPU but
    only arises for blocks in (2^a, 1.25*2^a] windows."""
    best = None
    for m in (1, 3, 5):
        size = m
        while size < block:
            size *= 2
        if best is None or size < best:
            best = size
    return best


@functools.lru_cache(maxsize=64)
def blob_window(block: int, interval: int) -> np.ndarray:
    """The blob's exact analysis/synthesis window (identical pair):
    periodic-centered Kaiser with the heuristic-optimal bandwidth law,
    per-sample forced-COLA normalized (sum_h w^2(n - h*interval) = 1).
    Machine-precision fit, err 1e-6..5e-8 across 14 configs
    (docs/WASM-ALGO.md "Window")."""
    try:
        from scipy.special import i0 as bessel_i0
    except ImportError:  # pragma: no cover
        def bessel_i0(x):
            x = np.asarray(x, np.float64)
            out = np.zeros_like(x)
            term = np.ones_like(x)
            for m in range(1, 40):
                out += term
                term = term * (x / (2 * m)) ** 2
            return out + term

    ov = block / interval
    bw = ov + 8.0 / (ov + 3.0) ** 2 + max(3.0 - ov, 0.0) / 4.0
    beta = np.pi * np.sqrt(bw * bw / 4.0 - 1.0)
    n = np.arange(block)
    x = 2.0 * (n + 0.5) / block - 1.0
    k = bessel_i0(beta * np.sqrt(np.maximum(0.0, 1.0 - x * x))) / bessel_i0(beta)
    s = np.zeros(block)
    hops = block // interval + 2
    for h in range(-hops, hops + 1):
        idx = n - h * interval
        ok = (idx >= 0) & (idx < block)
        s[ok] += k[idx[ok]] ** 2
    return (k / np.sqrt(s)).astype(np.float64)


class SpectralConfig(NamedTuple):
    """Static shapes for the fidelity core (hashable -> jit static arg)."""

    channels: int
    block: int
    interval: int

    @property
    def fft(self) -> int:
        return fft_size_for(self.block)

    @property
    def bands(self) -> int:
        return self.fft // 2

    @property
    def long_step(self) -> int:
        return int(round(self.fft / self.interval))


class SpectralState(NamedTuple):
    """Carried per-stream state (pytree; batch with leading axes)."""

    prev_output: jnp.ndarray       # [C, bands] complex64 — carried spectrum
    prev_pred_energy: jnp.ndarray  # [C, bands] float32 — stale pred buffer


def init_spectral_state(cfg: SpectralConfig) -> SpectralState:
    return SpectralState(
        prev_output=jnp.zeros((cfg.channels, cfg.bands), jnp.complex64),
        prev_pred_energy=jnp.zeros((cfg.channels, cfg.bands), jnp.float32),
    )


def _unit_phase(phase: np.ndarray) -> jnp.ndarray:
    """e^{i*phase} built on-device from real constants (complex h2d is
    unavailable on some TPU attachment paths — project invariant)."""
    p = np.asarray(phase, np.float32)
    return jax.lax.complex(jnp.cos(jnp.asarray(p)), jnp.sin(jnp.asarray(p)))


def _smooth_bidirectional(e: jnp.ndarray, coef: float, carry):
    """The blob's two-pass one-pole smoother (backward then forward) with
    the carry threaded between passes.  y_b = y_prev + coef*(e_b - y_prev)
    is affine, so each direction is one ``associative_scan``.

    e: [..., B] -> (smoothed [..., B], carry [...])
    """
    a = 1.0 - coef

    def compose(p, q):
        a1, b1 = p
        a2, b2 = q
        return a1 * a2, a2 * b1 + b2

    def affine_scan(vals, c0):
        # y_b = a*y_{b-1} + coef*vals_b, y_{-1} = c0
        coeffs = jnp.full_like(vals, a)
        offs = coef * vals
        aa, bb = jax.lax.associative_scan(compose, (coeffs, offs), axis=-1)
        return aa * c0[..., None] + bb

    bwd = affine_scan(e[..., ::-1], carry)[..., ::-1]
    c_mid = bwd[..., 0]
    fwd = affine_scan(bwd, c_mid)
    return fwd, fwd[..., -1]


def _find_peaks_map(energy: jnp.ndarray, smoothed: jnp.ndarray,
                    mult: jnp.ndarray, limit: jnp.ndarray, bands: int, fft: int):
    """Vectorized findPeaks + outputMap (docs/WASM-ALGO.md steps 4c-4d).

    energy, smoothed: [B].  Returns (input_bin [B], grad [B]).

    Peaks are maximal runs where energy > smoothed; each run's inputBin is
    its energy-weighted mean band.  The output position maps the peak
    frequency f=(bin+0.5)/fft through: f*mult below the tonality limit,
    f + (mult-1)*limit above; outputBin = f_out*fft - 0.5.  Between
    adjacent peaks the map is a smoothstep blend with analytic gradient;
    outside the end peaks it is a pure translation.
    """
    b_idx = jnp.arange(bands, dtype=jnp.float32)
    above = energy > smoothed
    prev_above = jnp.concatenate([jnp.zeros_like(above[:1]), above[:-1]])
    run_start = above & ~prev_above
    # run ids: 1-based id per band of the run it belongs to (0 = no run)
    run_id = jnp.cumsum(run_start.astype(jnp.int32)) * above.astype(jnp.int32)
    seg = jnp.where(above, run_id - 1, bands - 1)  # park non-run bands in a
    # scratch slot; they contribute zero weight anyway
    w = jnp.where(above, energy, 0.0)
    sum_e = jnp.zeros((bands,), energy.dtype).at[seg].add(w)
    sum_eb = jnp.zeros((bands,), energy.dtype).at[seg].add(w * b_idx)
    n_peaks = run_id.max()  # dynamic scalar (traced)
    valid = jnp.arange(bands) < n_peaks
    center = jnp.where(valid, sum_eb / jnp.maximum(sum_e, 1e-30), 0.0)  # [B]
    f_in = (center + 0.5) / fft
    f_out = jnp.where(f_in > limit, f_in + (mult - 1.0) * limit, f_in * mult)
    out_bin = f_out * fft - 0.5
    # pad invalid tail so searchsorted keeps every band below the sentinel
    out_sorted = jnp.where(valid, out_bin, jnp.inf)

    # per output band: the segment [p, q) it falls in
    idx = jnp.searchsorted(out_sorted, b_idx, side="right")  # in [0, n_peaks]
    has = n_peaks > 0
    i_p = jnp.clip(idx - 1, 0, jnp.maximum(n_peaks - 1, 0))
    i_q = jnp.clip(idx, 0, jnp.maximum(n_peaks - 1, 0))
    p_in, p_out = center[i_p], out_bin[i_p]
    q_in, q_out = center[i_q], out_bin[i_q]
    interior = (idx > 0) & (idx < n_peaks)
    # translation anchor for the exterior regions (first or last peak)
    a_in = jnp.where(idx <= 0, center[0], p_in)
    a_out = jnp.where(idx <= 0, out_bin[0], p_out)
    span = q_out - p_out
    safe_span = jnp.where(jnp.abs(span) > 1e-30, span, 1.0)
    t = (b_idx - p_out) / safe_span
    dd = (q_in - p_in) - span
    ib_mid = (p_in - p_out) + b_idx + t * t * (3.0 - 2.0 * t) * dd
    gr_mid = 1.0 + 6.0 * t * (1.0 - t) * dd / safe_span
    ib_ext = (a_in - a_out) + b_idx
    input_bin = jnp.where(interior, ib_mid, ib_ext)
    grad = jnp.where(interior, gr_mid, 1.0)
    input_bin = jnp.where(has, input_bin, b_idx)
    grad = jnp.where(has, grad, 1.0)
    return input_bin, grad


def _take_along_last(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(-1) that works for complex64 on the TPU backend
    (complex gather is unimplemented there — gather real/imag separately)."""
    if jnp.iscomplexobj(arr):
        re = jnp.take_along_axis(jnp.real(arr), idx, axis=-1)
        im = jnp.take_along_axis(jnp.imag(arr), idx, axis=-1)
        return jax.lax.complex(re, im)
    return jnp.take_along_axis(arr, idx, axis=-1)


def _get_fractional(arr: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Complex/real linear interpolation over the last axis with zeros
    outside [0, B) — the blob's getFractional.  arr [..., B], pos [..., B]."""
    b = arr.shape[-1]
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - i0).astype(jnp.float32)
    if jnp.iscomplexobj(arr):
        frac = frac.astype(jnp.complex64)

    def at(idx):
        ok = (idx >= 0) & (idx < b)
        v = _take_along_last(arr, jnp.clip(idx, 0, b - 1))
        return v * ok.astype(v.dtype)

    return at(i0) * (1.0 - frac) + at(i0 + 1) * frac


def spectral_hop(
    cfg: SpectralConfig,
    state: SpectralState,
    spec_in: jnp.ndarray,    # [C, bands] complex64 — analysis at the frame
    spec_prev: jnp.ndarray,  # [C, bands] complex64 — analysis one interval back
    time_factor: jnp.ndarray,  # scalar f32 (= 1/rate in the seek-driven path)
    mult: jnp.ndarray,         # scalar f32 — frequency multiplier 2^(st/12)
    limit: jnp.ndarray,        # scalar f32 — stored tonality limit
    formant_gain=None,         # optional [C, bands] f32 energy-gain (step 5)
):
    """One hop of the blob's processSpectrum.  Returns (state, out [C, B])."""
    c_n, b_n = cfg.channels, cfg.bands
    fft, interval, long_step = cfg.fft, cfg.interval, cfg.long_step
    b_idx = jnp.arange(b_n, dtype=jnp.float32)

    # -- step 3: re-reference carried spectra to the new frame position ----
    rot = _unit_phase(2.0 * np.pi * (np.arange(b_n) + 0.5) * interval / fft)
    p_out = state.prev_output * rot[None]
    spec_prev = spec_prev * rot[None]

    # -- step 4: frequency map ---------------------------------------------
    energy_c = jnp.square(jnp.abs(spec_in))          # [C, B] Band.energy
    energy = jnp.sum(energy_c, axis=0)               # [B]
    coef = 1.0 / (0.5 * (fft / interval) + 1.0)
    sm, carry = _smooth_bidirectional(energy, coef, jnp.zeros(()))
    sm, _ = _smooth_bidirectional(sm, coef, carry)
    ib_m, gr_m = _find_peaks_map(energy, sm, mult, limit, b_n, fft)
    mapping = mult != 1.0
    input_bin = jnp.where(mapping, ib_m, b_idx)
    grad = jnp.where(mapping, gr_m, 1.0)

    if formant_gain is not None:
        energy_c = energy_c * formant_gain

    # -- step 6: predictions + time-prediction ------------------------------
    bts = jnp.clip(time_factor, 0.5, 2.0)
    pos = input_bin[None].repeat(c_n, axis=0)        # [C, B]
    pred_energy = _get_fractional(energy_c, pos) * jnp.maximum(grad, 0.0)[None]
    pred_input = _get_fractional(spec_in, pos)
    prev_interp = _get_fractional(spec_prev, pos)
    tw = pred_input * jnp.conj(prev_interp)
    # the prediction buffer is PER CHANNEL (stereo memory dump at 6660):
    # each channel's denominator reads its own slot before overwriting it,
    # i.e. sees max(own energy this hop, own energy last hop)
    den = (jnp.maximum(pred_energy, state.prev_pred_energy) + EPS).astype(
        jnp.complex64
    )
    timepred = p_out * tw / den                       # [C, B]

    # -- step 7: sequential Gauss-Seidel over bands --------------------------
    down_s = _get_fractional(spec_in, pos - bts)
    down_l = _get_fractional(spec_in, pos - bts * long_step)
    mc = jnp.argmax(pred_energy, axis=0)              # [B] leading channel

    onehot_mc = (jnp.arange(c_n)[:, None] == mc[None, :])  # [C, B] bool

    def sel(arr):  # arr [C, B] -> [B] at channel mc[b] (complex-gather-free)
        return jnp.sum(arr * onehot_mc.astype(jnp.float32), axis=0)

    d1 = sel(pred_input * jnp.conj(down_s))           # lower, short
    d2 = sel(pred_input * jnp.conj(down_l))           # lower, long
    u_all = timepred * jnp.conj(pred_input * jnp.conj(down_s))
    u_all_l = timepred * jnp.conj(pred_input * jnp.conj(down_l))
    u1 = sel(jnp.concatenate([u_all[:, 1:], jnp.zeros((c_n, 1), u_all.dtype)], axis=1))
    u2 = sel(
        jnp.concatenate(
            [u_all_l[:, long_step:], jnp.zeros((c_n, long_step), u_all_l.dtype)],
            axis=1,
        )
    )
    pe_mc = sel(pred_energy)
    pi_mc = sel(pred_input)
    # cross-channel lock factors conj(tw_c) = conj(pi_mc * conj(pi_c))
    lock = jnp.conj(pi_mc[None] * jnp.conj(pred_input))  # [C, B]

    has_lower_s = jnp.arange(b_n) >= 1
    has_lower_l = jnp.arange(b_n) >= long_step

    xs = (
        d1, d2, u1 + u2, pe_mc, pi_mc, mc,
        lock.T, pred_energy.T, pred_input.T,           # [B, C]
        has_lower_s, has_lower_l,
    )

    def body(ring, x):
        d1b, d2b, ub, peb, pib, mcb, lockb, pec, pic, hs, hl = x
        # ring: [long_step, C] finalized outputs of the last long_step bands
        oh = (jnp.arange(c_n) == mcb).astype(jnp.float32)
        out_m1 = jnp.sum(ring[-1] * oh)  # band b-1, leader channel
        out_mL = jnp.sum(ring[0] * oh)   # band b-long_step
        ph = ub
        ph = ph + jnp.where(hs, out_m1 * d1b, 0.0)
        ph = ph + jnp.where(hl, out_mL * d2b, 0.0)
        p2 = jnp.square(jnp.abs(ph))
        tiny = p2 <= EPS
        ph = jnp.where(tiny, pib, ph)
        p2 = jnp.where(tiny, jnp.square(jnp.abs(pib)) + EPS, p2)
        out_mc = jnp.sqrt(peb / p2).astype(jnp.complex64) * ph
        # other channels lock to the leader's phase
        ph_c = out_mc[None] * lockb
        p2_c = jnp.square(jnp.abs(ph_c))
        tiny_c = p2_c <= EPS
        ph_c = jnp.where(tiny_c, pic, ph_c)
        p2_c = jnp.where(tiny_c, jnp.square(jnp.abs(pic)) + EPS, p2_c)
        out_c = jnp.sqrt(pec / p2_c).astype(jnp.complex64) * ph_c
        out_b = jnp.where(jnp.arange(c_n) == mcb, out_mc, out_c)
        ring = jnp.concatenate([ring[1:], out_b[None]], axis=0)
        return ring, out_b

    ring0 = jnp.zeros((long_step, c_n), jnp.complex64)
    _, outs = jax.lax.scan(body, ring0, xs, unroll=8)
    out = outs.T  # [C, B]

    return SpectralState(prev_output=out, prev_pred_energy=pred_energy), out
