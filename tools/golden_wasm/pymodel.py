"""Exact Python model of the reference WASM stretch engine's spectral core.

Every step here was verified against the live blob (wasm2c-compiled,
splitComputation=1 driven one output sample at a time so each pipeline
stage's memory state is observable — see docs/WASM-ALGO.md):

- analysis convention        rel err ~2e-7  (float32 floor)
- time-shift rotation        rel err ~2e-5
- time-prediction step       rel err ~2.5e-7
- vertical/makeOutput step   rel err ~1.1e-7

The model exists to (a) pin the algorithm for the JAX engine's fidelity
mode, and (b) serve as a fast hop-level oracle in tests.  It is written
for clarity, not speed.

Reference behavior cites: the blob at app/SignalsmithStretch.mjs:265;
worklet drive semantics at :826-954.
"""

from __future__ import annotations

import dataclasses

import numpy as np

try:
    from scipy.special import i0 as _bessel_i0
except ImportError:  # pragma: no cover
    def _bessel_i0(x):
        x = np.asarray(x, np.float64)
        out = np.zeros_like(x)
        term = np.ones_like(x)
        for m in range(1, 40):
            out += term
            term = term * (x / (2 * m)) ** 2
        return out + term

EPS = 1e-15  # the blob's noise floor (reint 0x268FEBBD... measured 1e-15)


def fft_size_for(block: int) -> int:
    """Smallest 2^a * m >= block with m in {1, 3, 5} (measured rule)."""
    best = None
    for m in (1, 3, 5):
        size = m
        while size < block:
            size *= 2
        if best is None or size < best:
            best = size
    return best


def blob_window(n_samples: int, interval: int) -> np.ndarray:
    """The blob's exact analysis/synthesis window (identical pair):
    periodic-centered Kaiser with the heuristic-optimal bandwidth law,
    per-sample forced-COLA normalized (sum_h w^2(n-hI) = 1)."""
    ov = n_samples / interval
    bw = ov + 8.0 / (ov + 3.0) ** 2 + max(3.0 - ov, 0.0) / 4.0
    beta = np.pi * np.sqrt(bw * bw / 4.0 - 1.0)
    n = np.arange(n_samples)
    x = 2.0 * (n + 0.5) / n_samples - 1.0
    k = _bessel_i0(beta * np.sqrt(np.maximum(0.0, 1.0 - x * x))) / _bessel_i0(beta)
    s = np.zeros(n_samples)
    hops = n_samples // interval + 2
    for h in range(-hops, hops + 1):
        idx = n - h * interval
        ok = (idx >= 0) & (idx < n_samples)
        s[ok] += k[idx[ok]] ** 2
    return (k / np.sqrt(s)).astype(np.float64)


def analyse(frame: np.ndarray, window: np.ndarray, fft_size: int) -> np.ndarray:
    """Blob analysis: Z[k] = e^{+2pi i(k+1/2)A/F} MDFT_-(frame*w)[k],
    A = len(window)//2.  `frame` must already be the window-length slice.

    MDFT_- via FFT: sum_n x[n] e^{-2pi i(k+0.5)n/F} = FFT(x * e^{-pi i n/F})[k].
    """
    win_n = len(window)
    a = win_n // 2
    fr = np.zeros(fft_size, complex)
    fr[:win_n] = frame * window
    n = np.arange(fft_size)
    k = np.arange(fft_size // 2)
    z = np.fft.fft(fr * np.exp(-1j * np.pi * n / fft_size))[: fft_size // 2]
    return z * np.exp(2j * np.pi * (k + 0.5) * a / fft_size)


def synthesise(spectrum: np.ndarray, window: np.ndarray, fft_size: int) -> np.ndarray:
    """Inverse of `analyse` up to the COLA identity: returns the
    window-length time block to overlap-add (already re-windowed).

    x[n] = (2/F) Re[e^{+pi i n/F} IFFT-sum_k spec'[k] e^{+2pi i k n/F}]
    computed with one inverse FFT over the zero-extended half spectrum.
    """
    win_n = len(window)
    a = win_n // 2
    k = np.arange(fft_size // 2)
    spec = spectrum * np.exp(-2j * np.pi * (k + 0.5) * a / fft_size)
    full = np.zeros(fft_size, complex)
    full[: fft_size // 2] = spec
    n = np.arange(fft_size)
    block = (2.0 / fft_size) * np.real(
        np.fft.ifft(full) * fft_size * np.exp(1j * np.pi * n / fft_size)
    )
    return block[:win_n] * window


def get_fractional(arr: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """Complex linear interpolation with zeros outside [0, len)."""
    pos = np.asarray(pos, np.float64)
    i0 = np.floor(pos).astype(int)
    frac = pos - i0

    def at(idx):
        v = np.zeros(len(idx), arr.dtype)
        ok = (idx >= 0) & (idx < len(arr))
        v[ok] = arr[idx[ok]]
        return v

    return at(i0) * (1 - frac) + at(i0 + 1) * frac


def smooth_bidirectional(e: np.ndarray, coef: float, carry: float) -> tuple[np.ndarray, float]:
    """The blob's two-pass one-pole smoother: backward then forward,
    with the carry threaded across hops (addr 6680)."""
    e = e.copy()
    c = carry
    for b in range(len(e) - 1, -1, -1):
        c = (e[b] - c) * coef + c
        e[b] = c
    for b in range(len(e)):
        c = (e[b] - c) * coef + c
        e[b] = c
    return e, c


def find_peaks(energy: np.ndarray, smoothed: np.ndarray, freq_map) -> list[tuple[float, float]]:
    """Maximal runs where energy > smoothed; energy-weighted center bin;
    returns [(input_bin, output_bin)] with output via freq_map (verified
    from the translated C, f48 L179-L206)."""
    bands = len(energy)
    f = len(energy) * 2  # fft size
    peaks = []
    b = 0
    while b < bands:
        if energy[b] > smoothed[b]:
            se = 0.0
            sb = 0.0
            while b < bands and energy[b] > smoothed[b]:
                se += energy[b]
                sb += energy[b] * b
                b += 1
            center = sb / se
            out_freq = freq_map((center + 0.5) / f)
            peaks.append((center, out_freq * f - 0.5))
        else:
            b += 1
    return peaks


def output_map_from_peaks(peaks, bands: int) -> tuple[np.ndarray, np.ndarray]:
    """outputMap: per output band {inputBin, freqGrad} (f48 L121 region).
    Identity when no peaks; translation outside the end peaks; smoothstep
    between adjacent peaks with the analytic gradient."""
    input_bin = np.arange(bands, dtype=np.float64)
    grad = np.ones(bands)
    if not peaks:
        return input_bin, grad
    first_in, first_out = peaks[0]
    hi = min(int(np.ceil(first_out)), bands)
    for b in range(0, max(hi, 0)):
        input_bin[b] = (first_in - first_out) + b
        grad[b] = 1.0
    for (p_in, p_out), (q_in, q_out) in zip(peaks, peaks[1:]):
        lo = max(int(np.ceil(p_out)), 0)
        hi = min(int(np.ceil(q_out)), bands)
        if hi <= lo:
            continue
        span = q_out - p_out
        dd = (q_in - p_in) - span
        for b in range(lo, hi):
            t = (b - p_out) / span
            input_bin[b] = (p_in - p_out) + b + t * t * (3 - 2 * t) * dd
            grad[b] = 1.0 + 6.0 * t * (1.0 - t) * dd / span
    last_in, last_out = peaks[-1]
    lo = max(int(np.ceil(last_out)), 0)
    for b in range(lo, bands):
        input_bin[b] = (last_in - last_out) + b
        grad[b] = 1.0
    return input_bin, grad


@dataclasses.dataclass
class ModelConfig:
    channels: int = 1
    block: int = 512
    interval: int = 128

    @property
    def fft_size(self) -> int:
        return fft_size_for(self.block)

    @property
    def bands(self) -> int:
        return self.fft_size // 2


class SpectralModel:
    """Hop-level model: state in, state out — mirrors the blob exactly.

    State: prev_output [C, bands] complex (the carried output spectrum),
    prev_pred_energy [C, bands] (the stale prediction-buffer contents),
    smoothing carry.
    """

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.prev_output = np.zeros((cfg.channels, cfg.bands), complex)
        self.prev_pred_energy = np.zeros((cfg.channels, cfg.bands))
        self.smooth_carry = 0.0
        self.rng_state = None  # MINSTD seed when timeFactor > 2 paths used
        # formant f0 EMA trackers (blob addrs 6688 / 6684, zeroed at init)
        self.formant_value_ema = np.float32(0.0)
        self.formant_weighted_ema = np.float32(0.0)

    def reset(self):
        self.prev_output[:] = 0
        self.prev_pred_energy[:] = 0
        self.smooth_carry = 0.0
        self.formant_value_ema = np.float32(0.0)
        self.formant_weighted_ema = np.float32(0.0)

    # MINSTD vertical-step randomization (timeFactor > 2, i.e. rate < 0.5 —
    # the kiosk regime).  Decoded from the translated blob (band loop, the
    # two draw sites around wasm2c offsets t1287/t1374):
    #   s' = 48271 * s mod 2147483647         (Schrage form in the blob)
    #   value = f32(v46 * f32(u32(s'-1)) + v45)
    #   v32 = max(f32(timeFactor), 0.5f)
    #   v45 = (v32 > 2 ? 4.0f : 0.0f) - v32   -> uniform over ~[4-tf, tf]
    #   v46 = (v32 - v45) * 2^-31f
    # Draw order per hop: band 0 draws only the UP value; interior bands
    # draw DOWN then UP; the last band draws only DOWN.  The down draw is
    # shared by the short and long down predictions (long uses value*L);
    # likewise the up draw.  Seeding: std::random_device bytes at startup
    # reduced mod 2^31-1 (clamped to >= 1); the native shim pins the device
    # bytes, and tests read the live state at address 6672.
    def _minstd_draws(self, tf32: np.float32):
        bands = self.cfg.bands
        m = 2147483647
        s = int(self.rng_state)
        v32 = np.float32(max(tf32, np.float32(0.5)))
        v45 = np.float32(
            (np.float32(4.0) if v32 > np.float32(2.0) else np.float32(0.0)) - v32
        )
        v46 = np.float32((v32 - v45) * np.float32(2.0 ** -31))
        d_down = np.zeros(bands)
        d_up = np.zeros(bands)

        def draw():
            nonlocal s
            s = (48271 * s) % m
            return float(np.float32(v46 * np.float32(np.uint32(s - 1)) + v45))

        for b in range(bands):
            if b > 0:
                d_down[b] = draw()
            if b < bands - 1:
                d_up[b] = draw()
        self.rng_state = s
        return d_down, d_up

    # ---- formant processing (step 5; decoded from the translated blob,
    # per-band gain block near wasm2c t826-t897, f0/width near t1038-t1086,
    # smoother near t899/L307, buffer resize to bands+2 at f-offset t229) --
    _FORMANT_TINY = np.frombuffer(
        np.uint32(228737632).tobytes(), np.float32
    )[0]  # the blob's epsilon constant (reint 0x0DA24260 ~ 1e-30)

    def _formant_width(self, env_energy: np.ndarray) -> float:
        """Auto f0 smoothing width (formantBase == 0): top-peak tracking +
        two harmonic folds + 1/16-coefficient EMA trackers (carried state
        at 6684/6688)."""
        b_n = len(env_energy)
        v2 = v5 = v4 = 0  # second / max / third peak indices
        for b in range(1, b_n - 1):
            v = env_energy[b]
            if v < env_energy[b - 1] or v <= env_energy[b + 1] or v <= env_energy[v4]:
                continue
            if env_energy[v2] >= v:
                v4 = b
            elif env_energy[v5] < v:
                v4, v2, v5 = v2, v5, b
            else:
                v4, v2 = v2, b
        peak_val = float(env_energy[v5])
        if env_energy[v2] > peak_val * 0.1:
            d = abs(v5 - v2)
            if not (d <= v5 // 8 or d >= (v5 * 7) // 8):
                v5 = v5 % d
            if env_energy[v4] > peak_val * 0.01:
                d = abs(v5 - v4)
                if not (d <= v5 // 8 or d >= (v5 * 7) // 8):
                    v5 = v5 % d
        pv = np.float32(peak_val)
        self.formant_value_ema = np.float32(
            (float(pv) - float(self.formant_value_ema)) * 0.0625
            + float(self.formant_value_ema)
        )
        self.formant_weighted_ema = np.float32(
            (float(np.float32(pv * np.float32(v5))) - float(self.formant_weighted_ema))
            * 0.0625
            + float(self.formant_weighted_ema)
        )
        return float(
            self.formant_weighted_ema
            / (self.formant_value_ema + self._FORMANT_TINY)
        )

    def _apply_formants(
        self,
        energy_c: np.ndarray,      # [C, bands] Band.energy (modified in place)
        mapping: bool,
        freq_multiplier: float,
        freq_tonality_limit: float,
        formant_factor: float,
        formant_compensation: bool,
        formant_base: float,
    ) -> None:
        cfg = self.cfg
        f, b_n = cfg.fft_size, cfg.bands
        env = np.zeros(b_n + 2)
        env[:b_n] = energy_c.sum(0)
        if formant_base > 0:
            width = float(np.float32(formant_base * f - 0.5))
        else:
            width = self._formant_width(env[:b_n])
        env[:b_n] = np.sqrt(env[:b_n])
        coef = float(np.float32(1.0 / (width * 0.5 + 1.0)))
        sm, carry = smooth_bidirectional(env[:b_n], coef, 0.0)
        sm, _ = smooth_bidirectional(sm, coef, carry)
        env[:b_n] = sm
        inv = 1.0 / formant_factor
        tiny = self._FORMANT_TINY
        lim = freq_tonality_limit
        for b in range(b_n):
            freq = (b + 0.5) / f
            if formant_compensation:
                # compensation: the envelope lookup happens in TRANSPOSE-
                # mapped space — output band b carries input content from
                # the unmapped position, so reading the envelope at the
                # transposed frequency undoes the spectral-shape shift
                if freq > lim:
                    freq = freq + (freq_multiplier - 1.0) * lim
                else:
                    freq = freq * freq_multiplier
            fm = inv * freq
            if fm > lim:
                fm = (1.0 - formant_factor) * lim + freq
            pos = fm * f - 0.5
            if pos >= 0:
                pos = min(float(b_n), pos)
                i = int(np.floor(pos))
                frac = pos - i
                env_m = env[i] + frac * (env[i + 1] - env[i])
            else:
                env_m = 0.0
            ratio = env_m / (env[b] + tiny)
            energy_c[:, b] *= ratio * ratio

    def hop(
        self,
        spec_in: np.ndarray,       # [C, bands] analysis at the current position
        spec_prev: np.ndarray,     # [C, bands] analysis one *interval* earlier
        time_factor: float,        # output interval / input advance (or seek rate semantics)
        freq_multiplier: float = 1.0,
        freq_tonality_limit: float = 0.0,  # normalized freq (stored form)
        formant_factor: float = 1.0,
        formant_compensation: bool = False,
        formant_base: float = 0.0,
    ) -> np.ndarray:
        """One hop of processSpectrum. Returns the output spectrum [C, bands]
        (which is also stored as the carried prev_output)."""
        cfg = self.cfg
        b_idx = np.arange(cfg.bands)
        f = cfg.fft_size
        interval = cfg.interval
        phi = 2 * np.pi * (b_idx + 0.5) * interval / f
        rot = np.exp(1j * phi)

        # step 3: re-reference carried output to the new frame position;
        # the fresh prev-analysis gets the same rotation (verified: both +phi)
        p_out = self.prev_output * rot[None, :]
        spec_prev = spec_prev * rot[None, :]

        # frequency map
        mapping = freq_multiplier != 1.0
        if mapping:
            energy_c = np.abs(spec_in) ** 2          # Band.energy per channel
            energy = energy_c.sum(0)
            coef = 1.0 / (0.5 * (f / interval) + 1.0)
            # the smoother runs TWICE per hop (work-steps 1 and 2 both hit
            # the same block); the carry is zeroed at the energy step and
            # threaded between the two passes (verified 1.2e-7)
            smoothed, carry = smooth_bidirectional(energy, coef, 0.0)
            smoothed, _ = smooth_bidirectional(smoothed, coef, carry)

            def freq_map(freq):
                if freq > freq_tonality_limit:
                    return freq + (freq_multiplier - 1.0) * freq_tonality_limit
                return freq * freq_multiplier

            peaks = find_peaks(energy, smoothed, freq_map)
            input_bin, grad = output_map_from_peaks(peaks, cfg.bands)
        else:
            energy_c = np.abs(spec_in) ** 2
            input_bin = b_idx.astype(np.float64)
            grad = np.ones(cfg.bands)

        # step 5: formants — run "when formantFactor != 1, or compensation
        # and mapping" (the blob's gate at wasm2c t173/b_174); scales
        # Band.energy in place before the predictions read it
        if formant_factor != 1.0 or (formant_compensation and mapping):
            self._apply_formants(
                energy_c, mapping, freq_multiplier, freq_tonality_limit,
                formant_factor, formant_compensation, formant_base,
            )

        tf32 = np.float32(time_factor)
        long_step = int(round(f / interval))
        if tf32 > np.float32(2.0) and self.rng_state is not None:
            d_down, d_up = self._minstd_draws(tf32)
        else:
            bts = float(min(max(tf32, np.float32(0.5)), np.float32(2.0)))
            d_down = np.full(cfg.bands, bts)
            d_up = np.full(cfg.bands, bts)

        # step 6: per-channel predictions + time-prediction into prev_output
        pred_energy = np.zeros((cfg.channels, cfg.bands))
        pred_input = np.zeros((cfg.channels, cfg.bands), complex)
        timepred = np.zeros((cfg.channels, cfg.bands), complex)
        for c in range(cfg.channels):
            e_interp = get_fractional(energy_c[c].astype(complex), input_bin).real
            pred_energy[c] = e_interp * np.maximum(grad, 0.0)
            pred_input[c] = get_fractional(spec_in[c], input_bin)
            prev_interp = get_fractional(spec_prev[c], input_bin)
            tw = pred_input[c] * np.conj(prev_interp)
            # the prediction buffer is PER CHANNEL ([C][B], verified by
            # stereo memory dump at 6660): the denominator reads it before
            # this hop overwrites it, i.e. each channel sees
            # max(own energy now, own energy last hop)
            den = np.maximum(pred_energy[c], self.prev_pred_energy[c]) + EPS
            timepred[c] = p_out[c] * tw / den

        # step 7: sequential vertical phase propagation + makeOutput.
        # Four gather-position families (b = the band doing the predicting):
        #   down-short: input_bin[b]   - d_down[b]
        #   down-long:  input_bin[b]   - d_down[b]*L   (same draw, scaled)
        #   up-short:   input_bin[b+1] - d_up[b]
        #   up-long:    input_bin[b+L] - d_up[b]*L
        # With the deterministic step (tf <= 2) these collapse to the shared
        # shifted arrays (us[b] == ds[b+1] etc.).
        out = timepred.copy()  # upper neighbors read time predictions
        us_pos = np.zeros(cfg.bands)
        us_pos[: cfg.bands - 1] = input_bin[1:] - d_up[: cfg.bands - 1]
        ul_pos = np.zeros(cfg.bands)
        ul_pos[: cfg.bands - long_step] = (
            input_bin[long_step:] - d_up[: cfg.bands - long_step] * long_step
        )
        ds = np.stack([get_fractional(spec_in[c], input_bin - d_down) for c in range(cfg.channels)])
        dl = np.stack([get_fractional(spec_in[c], input_bin - d_down * long_step) for c in range(cfg.channels)])
        us = np.stack([get_fractional(spec_in[c], us_pos) for c in range(cfg.channels)])
        ul = np.stack([get_fractional(spec_in[c], ul_pos) for c in range(cfg.channels)])
        max_ch = np.argmax(pred_energy, axis=0)
        for b in range(cfg.bands):
            mc = int(max_ch[b])
            ph = 0j
            if b > 0:
                ph += out[mc, b - 1] * (pred_input[mc, b] * np.conj(ds[mc, b]))
                if b >= long_step:
                    ph += out[mc, b - long_step] * (pred_input[mc, b] * np.conj(dl[mc, b]))
            if b < cfg.bands - 1:
                ph += timepred[mc, b + 1] * np.conj(
                    pred_input[mc, b + 1] * np.conj(us[mc, b])
                )
                if b < cfg.bands - long_step:
                    ph += timepred[mc, b + long_step] * np.conj(
                        pred_input[mc, b + long_step] * np.conj(ul[mc, b])
                    )
            p2 = abs(ph) ** 2
            if p2 <= EPS:
                ph = pred_input[mc, b]
                p2 = abs(ph) ** 2 + EPS
            out[mc, b] = np.sqrt(pred_energy[mc, b] / p2) * ph
            # other channels: lock to the max channel's output phase via the
            # inter-channel input phase difference
            for c in range(cfg.channels):
                if c == mc:
                    continue
                tw = pred_input[mc, b] * np.conj(pred_input[c, b])
                ph_c = out[mc, b] * np.conj(tw)
                p2c = abs(ph_c) ** 2
                if p2c <= EPS:
                    ph_c = pred_input[c, b]
                    p2c = abs(ph_c) ** 2 + EPS
                out[c, b] = np.sqrt(pred_energy[c, b] / p2c) * ph_c

        self.prev_output = out.copy()
        self.prev_pred_energy = pred_energy
        return out
