"""Shared test helpers."""

import threading

import numpy as np


def call_big_stack(fn, *args, stack_bytes=512 << 20, **kwargs):
    """Run ``fn`` in a worker thread with a 512 MB stack.

    The deepest trace/compile in the suite (the fidelity hop-scan body)
    segfaults the XLA CPU backend late in the full suite: the main
    thread's C stack is effectively capped at its exec-time 8 MB (raising
    RLIMIT_STACK at runtime cannot move the mmap regions already placed
    below the stack VMA), and the recursive trace + LLVM codegen overflow
    it once enough address space is in use.  Worker-thread stacks are
    mmapped at the requested size, so the depth is available
    deterministically regardless of suite context.
    """
    out = {}

    def target():
        try:
            out["val"] = fn(*args, **kwargs)
        except BaseException as e:  # propagate pytest assertions too
            out["exc"] = e

    old = threading.stack_size(stack_bytes)
    try:
        th = threading.Thread(target=target, name="big-stack-test")
        th.start()
        th.join()
    finally:
        threading.stack_size(old)
    if "exc" in out:
        raise out["exc"]
    return out.get("val")


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of `test` against `reference`, in dB."""
    reference = np.asarray(reference, np.float64)
    test = np.asarray(test, np.float64)
    noise = np.mean((reference - test) ** 2)
    signal = np.mean(reference**2)
    if noise == 0:
        return np.inf
    return float(10.0 * np.log10(signal / max(noise, 1e-300)))


def dominant_freq(x: np.ndarray, sample_rate: float = 1.0) -> float:
    """Frequency (cycles/sample * sample_rate) of the strongest spectral peak,
    refined by parabolic interpolation."""
    x = np.asarray(x, np.float64)
    w = np.hanning(len(x))
    spec = np.abs(np.fft.rfft(x * w))
    k = int(np.argmax(spec[1:-1])) + 1
    a, b, c = np.log(spec[k - 1] + 1e-30), np.log(spec[k] + 1e-30), np.log(spec[k + 1] + 1e-30)
    denom = a - 2 * b + c
    delta = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
    return (k + delta) / len(x) * sample_rate


def tone(freq: float, n: int, sample_rate: float = 1.0, phase: float = 0.3):
    t = np.arange(n, dtype=np.float64)
    return np.sin(2 * np.pi * freq / sample_rate * t + phase).astype(np.float32)
