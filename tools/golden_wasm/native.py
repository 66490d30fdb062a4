"""Drive the reference WASM stretch engine natively (no node required).

Pipeline: extract the base64 blob from the reference module
(app/SignalsmithStretch.mjs:265) -> translate to C with wasm2c.py ->
compile with gcc -> ctypes.  The renderer below replicates the worklet
processor's file-playback hot loop *exactly* (app/SignalsmithStretch.mjs:
826-954): per 128-frame quantum it advances the time map, pushes transpose/
formant settings, gathers a bufferLength input window ending at
round(inputTime*sr) + inputLatency (zero-padded), calls _seek(bufferLength,
rate) then _process(0, 128), and copies the output planes out.

The compiled library is cached by blob/translator hash, so repeat golden
renders cost milliseconds of Python and native DSP time only.
"""

from __future__ import annotations

import base64
import ctypes
import hashlib
import os
import pathlib
import re
import subprocess
import tempfile

import numpy as np

REFERENCE = pathlib.Path("/root/reference/app/SignalsmithStretch.mjs")
CACHE_DIR = pathlib.Path(
    os.environ.get("BAUKLANK_WASM2C_CACHE", tempfile.gettempdir() + "/bauklank_wasm2c")
)
QUANTUM = 128  # browser render quantum (reference :820-826)


def extract_blob(reference: pathlib.Path = REFERENCE) -> bytes:
    src = reference.read_text()
    m = re.search(r"data:application/octet-stream;base64,([A-Za-z0-9+/=]+)", src)
    if not m:
        raise RuntimeError(f"no wasm data URI found in {reference}")
    blob = base64.b64decode(m.group(1))
    if blob[:4] != b"\x00asm":
        raise RuntimeError("decoded blob is not wasm")
    return blob


def available() -> bool:
    if not REFERENCE.exists():
        return False
    import shutil

    return shutil.which("gcc") is not None or shutil.which("cc") is not None


def build(reference: pathlib.Path = REFERENCE) -> pathlib.Path:
    """Translate + compile the blob; returns the cached .so path."""
    from . import wasm2c

    blob = extract_blob(reference)
    tools_hash = hashlib.sha256(
        pathlib.Path(wasm2c.__file__).read_bytes()
    ).hexdigest()[:8]
    key = hashlib.sha256(blob).hexdigest()[:16] + "-" + tools_hash
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    so = CACHE_DIR / f"stretch-{key}.so"
    if so.exists():
        return so
    csrc = CACHE_DIR / f"stretch-{key}.c"
    csrc.write_text(wasm2c.translate(blob))
    import shutil

    cc = shutil.which("gcc") or shutil.which("cc")
    tmp = so.with_suffix(".so.tmp")
    subprocess.run(
        [cc, "-O2", "-fPIC", "-shared", "-fvisibility=hidden", "-w",
         "-o", str(tmp), str(csrc), "-lm"],
        check=True, capture_output=True,
    )
    tmp.replace(so)
    return so


class NativeStretch:
    """ctypes wrapper over the 17-export reference ABI
    (app/SignalsmithStretch.mjs:461-479; minified export names mapped
    back to their glue names)."""

    _EXPORTS = {
        # glue name: (minified, argtypes, restype)
        "setBuffers": ("h", ["u32", "u32"], "u32"),
        "blockSamples": ("i", [], "u32"),
        "intervalSamples": ("j", [], "u32"),
        "inputLatency": ("k", [], "u32"),
        "outputLatency": ("l", [], "u32"),
        "reset": ("m", [], None),
        "presetDefault": ("n", ["u32", "f32"], None),
        "presetCheaper": ("o", ["u32", "f32"], None),
        "configure": ("p", ["u32", "u32", "u32", "u32"], None),
        "setTransposeFactor": ("q", ["f32", "f32"], None),
        "setTransposeSemitones": ("r", ["f32", "f32"], None),
        "setFormantFactor": ("s", ["f32", "u32"], None),
        "setFormantSemitones": ("t", ["f32", "u32"], None),
        "setFormantBase": ("u", ["f32"], None),
        "seek": ("v", ["u32", "f64"], None),
        "process": ("w", ["u32", "u32"], None),
        "flush": ("x", ["u32"], None),
        "main": ("y", ["u32", "u32"], "u32"),
    }
    _CT = {"u32": ctypes.c_uint32, "f32": ctypes.c_float, "f64": ctypes.c_double}

    def __init__(self, reference: pathlib.Path = REFERENCE):
        self.lib = ctypes.CDLL(str(build(reference)))
        self.lib.wasm_init.restype = ctypes.c_int
        self.lib.wasm_mem_ptr.restype = ctypes.c_void_p
        self.lib.wasm_mem_size.restype = ctypes.c_uint32
        if self.lib.wasm_init() != 0:
            raise RuntimeError("wasm_init failed")
        self._trap = ctypes.c_int32.in_dll(self.lib, "wasm_trap_code")
        for name, (minified, argts, rest) in self._EXPORTS.items():
            fn = getattr(self.lib, f"wx_{minified}")
            fn.argtypes = [self._CT[a] for a in argts]
            fn.restype = self._CT[rest] if rest else None
            setattr(self, "_" + name, self._checked(name, fn))
        # ctors then main, like the glue (addOnInit(exports.f); _main())
        ctors = self.lib.wx_f
        ctors.restype = None
        ctors()
        self._main(0, 0)

    def _checked(self, name, fn):
        def call(*args):
            r = fn(*args)
            if self._trap.value != 0:
                raise RuntimeError(f"wasm trap {self._trap.value} in {name}{args}")
            return r

        return call

    def mem_f32(self, byte_offset: int, count: int) -> np.ndarray:
        """A live float32 view into wasm memory (re-fetch after any call
        that can allocate: memory may move on growth)."""
        ptr = self.lib.wasm_mem_ptr()
        size = self.lib.wasm_mem_size()
        if byte_offset + 4 * count > size:
            raise IndexError("view out of wasm memory bounds")
        buf = (ctypes.c_float * count).from_address(ptr + byte_offset)
        return np.ctypeslib.as_array(buf)

    def mem_u32(self, byte_offset: int) -> int:
        ptr = self.lib.wasm_mem_ptr()
        return int.from_bytes(
            bytes((ctypes.c_uint8 * 4).from_address(ptr + byte_offset)), "little"
        )

    def rng_state(self) -> int:
        """The engine's live MINSTD state (addr 6672) — consumed by the
        timeFactor > 2 vertical-step draws (docs/WASM-ALGO.md step 7).
        Read it before rendering to seed a replicating model."""
        return self.mem_u32(6672)

    # ---------------------------------------------------------- store trace
    _STORE_CB = ctypes.CFUNCTYPE(
        None, ctypes.c_uint64, ctypes.c_uint32, ctypes.c_uint64)
    _BULK_CB = ctypes.CFUNCTYPE(
        None, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int32)

    def watch_stores(self, lo: int, hi: int, sink: list, tag=None) -> None:
        """Log every store (and bulk copy/fill) whose destination falls in
        [lo, hi) into ``sink`` as ``(tag, kind, ...)`` tuples:
        ``("st", ea, size, bits)`` for scalar stores,
        ``("cp", dst, src, n)`` for copies, ``("fi", dst, byte, n)`` for
        fills.  ``tag`` may be a mutable cell (e.g. one-element list) whose
        current value labels each event — set it per quantum/call to read
        placement laws directly off the trace."""
        tag = tag if tag is not None else [None]

        def on_store(ea, size, bits):
            sink.append((tag[0], "st", int(ea), int(size), int(bits)))

        def on_bulk(dst, src, n, is_fill):
            sink.append(
                (tag[0], "fi" if is_fill else "cp", int(dst), int(src), int(n)))

        # keep callbacks alive (ctypes trampolines are GC-able)
        self._trace_refs = (self._STORE_CB(on_store), self._BULK_CB(on_bulk))
        ctypes.c_uint64.in_dll(self.lib, "wasm_watch_lo").value = lo
        ctypes.c_uint64.in_dll(self.lib, "wasm_watch_hi").value = hi
        ctypes.cast(
            ctypes.addressof(self._STORE_CB.in_dll(self.lib, "wasm_store_hook")),
            ctypes.POINTER(ctypes.c_void_p),
        )[0] = ctypes.cast(self._trace_refs[0], ctypes.c_void_p)
        ctypes.cast(
            ctypes.addressof(self._BULK_CB.in_dll(self.lib, "wasm_bulk_hook")),
            ctypes.POINTER(ctypes.c_void_p),
        )[0] = ctypes.cast(self._trace_refs[1], ctypes.c_void_p)

    def unwatch_stores(self) -> None:
        ctypes.cast(
            ctypes.addressof(self._STORE_CB.in_dll(self.lib, "wasm_store_hook")),
            ctypes.POINTER(ctypes.c_void_p),
        )[0] = None
        ctypes.cast(
            ctypes.addressof(self._BULK_CB.in_dll(self.lib, "wasm_bulk_hook")),
            ctypes.POINTER(ctypes.c_void_p),
        )[0] = None
        self._trace_refs = None


_DEFAULT_SEGMENT = {
    "active": False, "input": 0.0, "output": 0.0, "rate": 1.0,
    "semitones": 0.0, "tonalityHz": 8000.0, "formantSemitones": 0.0,
    "formantCompensation": False, "formantBaseHz": 0.0,
    "loopStart": 0.0, "loopEnd": 0.0,
}


class WorkletDriver:
    """Python re-statement of the reference WasmProcessor's state machine
    (app/SignalsmithStretch.mjs:569-954) over the native ABI."""

    def __init__(self, sample_rate: float, channels: int = 2,
                 reference: pathlib.Path = REFERENCE):
        self.sr = float(sample_rate)
        self.channels = channels
        self.wasm = NativeStretch(reference)
        self.time_map: list[dict] = [dict(_DEFAULT_SEGMENT)]
        self.audio: np.ndarray | None = None  # [C, N] float32
        self.audio_start = 0  # samples (audioBuffersStart)
        self.current_time = 0.0
        self.config: dict = {"preset": "default"}
        self.configure()

    # -- configure (reference :786-801) ------------------------------------
    def configure(self, **cfg) -> None:
        self.config.update(cfg)
        c = self.config
        if c.get("blockMs"):
            block = round(c["blockMs"] / 1000 * self.sr)
            interval = round(
                (c.get("intervalMs") or c["blockMs"] * 0.25) / 1000 * self.sr
            )
            self.wasm._configure(
                self.channels, block, interval, 1 if c.get("splitComputation") else 0
            )
            self.wasm._reset()
        elif c.get("preset") == "cheaper":
            self.wasm._presetCheaper(self.channels, self.sr)
        else:
            self.wasm._presetDefault(self.channels, self.sr)
        self._update_buffers()
        self.input_latency_sec = self.wasm._inputLatency() / self.sr
        self.output_latency_sec = self.wasm._outputLatency() / self.sr

    def _update_buffers(self) -> None:
        # reference :803-816: channels input planes then channels output
        # planes, each bufferLength floats, from one _setBuffers pointer
        self.buffer_len = self.wasm._inputLatency() + self.wasm._outputLatency()
        ptr = self.wasm._setBuffers(self.channels, self.buffer_len)
        self.buf_in = [ptr + 4 * self.buffer_len * c for c in range(self.channels)]
        self.buf_out = [
            ptr + 4 * self.buffer_len * (c + self.channels)
            for c in range(self.channels)
        ]

    # -- buffers + schedule (reference :737-743, :656-701) ------------------
    def add_buffers(self, planes) -> None:
        planes = [np.asarray(p, np.float32) for p in planes]
        self.audio = np.stack([planes[c % len(planes)] for c in range(self.channels)])

    def schedule(self, obj_in: dict, adjust_previous: bool = False) -> None:
        output_time = obj_in.get("outputTime", self.current_time)
        latest = self.time_map[-1]
        while self.time_map and self.time_map[-1]["output"] >= output_time:
            latest = self.time_map.pop()
        obj = {
            "active": latest["active"], "input": None, "output": output_time,
            "rate": latest["rate"], "semitones": latest["semitones"],
            "tonalityHz": latest["tonalityHz"],
            "formantSemitones": latest["formantSemitones"],
            "formantCompensation": latest["formantCompensation"],
            "formantBaseHz": latest["formantBaseHz"],
            "loopStart": latest["loopStart"], "loopEnd": latest["loopEnd"],
        }
        obj.update({k: v for k, v in obj_in.items() if k != "outputTime"})
        if obj.get("input") is None:
            rate = latest["rate"] if latest["active"] else 0.0
            obj["input"] = latest["input"] + (obj["output"] - latest["output"]) * rate
        self.time_map.append(obj)
        if adjust_previous and len(self.time_map) > 1:
            prev = self.time_map[-2]
            if prev["output"] < self.current_time:
                rate = prev["rate"] if prev["active"] else 0.0
                prev["input"] += (self.current_time - prev["output"]) * rate
                prev["output"] = self.current_time
            prev["rate"] = (obj["input"] - prev["input"]) / (obj["output"] - prev["output"])
        while len(self.time_map) > 1 and self.time_map[1]["output"] <= output_time:
            self.time_map.pop(0)

    # -- the hot loop (reference :826-954, file-playback branch) ------------
    def process_quantum(self, out: np.ndarray) -> None:
        """Render one quantum into out [C, QUANTUM]."""
        n = out.shape[1]
        output_time = self.current_time + self.output_latency_sec
        while len(self.time_map) > 1 and self.time_map[1]["output"] <= output_time:
            self.time_map.pop(0)
        seg = self.time_map[0]
        w = self.wasm
        w._setTransposeSemitones(seg["semitones"], seg["tonalityHz"] / self.sr)
        w._setFormantSemitones(
            seg["formantSemitones"], 1 if seg["formantCompensation"] else 0
        )
        w._setFormantBase(seg["formantBaseHz"] / self.sr)

        if not seg["active"]:
            for c in range(self.channels):
                w.mem_f32(self.buf_in[c], n)[:] = 0.0
            w._process(n, n)
        else:
            input_time = seg["input"] + (output_time - seg["output"]) * seg["rate"]
            loop_len = seg["loopEnd"] - seg["loopStart"]
            if loop_len > 0 and input_time >= seg["loopEnd"]:
                seg["input"] -= loop_len
                input_time -= loop_len
            input_time += self.input_latency_sec
            input_end = round(input_time * self.sr)
            start = input_end - self.buffer_len
            for c in range(self.channels):
                buf = w.mem_f32(self.buf_in[c], self.buffer_len)
                buf[:] = 0.0
                if self.audio is not None:
                    n_audio = self.audio.shape[1]
                    lo = max(start, self.audio_start)
                    hi = min(input_end, self.audio_start + n_audio)
                    if hi > lo:
                        buf[lo - start : hi - start] = self.audio[
                            c, lo - self.audio_start : hi - self.audio_start
                        ]
            w._seek(self.buffer_len, seg["rate"])
            w._process(0, n)

        for c in range(self.channels):
            out[c, :] = w.mem_f32(self.buf_out[c], n)
        self.current_time += n / self.sr


def render_reference_live(
    audio: np.ndarray,
    sample_rate: float,
    n_out: int,
    semitones: float = 0.0,
    tonality_hz: float = 8000.0,
    formant_semitones: float = 0.0,
    formant_compensation: bool = False,
    formant_base_hz: float = 0.0,
    block_ms: float = 120.0,
    interval_ms: float = 30.0,
    split_computation: bool = True,
) -> np.ndarray:
    """Drive the blob in COUPLED (live-input) mode: per 128-frame quantum,
    copy the next quantum of ``audio`` into the input planes and call
    ``_process(n, n)`` — the reference worklet's live branch verbatim
    (app/SignalsmithStretch.mjs:870-882; no ``_seek``).  Rate does not
    apply (input is consumed in lockstep with output); transpose/formant
    settings are pushed per quantum exactly like the file path."""
    audio = np.ascontiguousarray(audio, np.float32)
    channels = audio.shape[0]
    d = WorkletDriver(sample_rate, channels)
    d.configure(
        blockMs=block_ms, intervalMs=interval_ms, splitComputation=split_computation
    )
    w = d.wasm
    out = np.zeros((channels, n_out), np.float32)
    pos = 0
    while pos < n_out:
        n = QUANTUM
        w._setTransposeSemitones(semitones, tonality_hz / d.sr)
        w._setFormantSemitones(
            formant_semitones, 1 if formant_compensation else 0
        )
        w._setFormantBase(formant_base_hz / d.sr)
        for c in range(channels):
            buf = w.mem_f32(d.buf_in[c], n)
            buf[:] = 0.0
            hi = min(pos + n, audio.shape[1])
            if hi > pos:
                buf[: hi - pos] = audio[c, pos:hi]
        w._process(n, n)
        take = min(n, n_out - pos)
        for c in range(channels):
            out[c, pos : pos + take] = w.mem_f32(d.buf_out[c], n)[:take]
        pos += n
    return out


def render_reference(
    audio: np.ndarray,
    sample_rate: float,
    n_out: int,
    rate: float = 1.0,
    semitones: float = 0.0,
    tonality_hz: float = 8000.0,
    formant_semitones: float = 0.0,
    formant_compensation: bool = False,
    formant_base_hz: float = 0.0,
    block_ms: float = 120.0,
    interval_ms: float = 30.0,
    split_computation: bool = True,
    schedules: list[dict] | None = None,
    seed_out: list | None = None,
) -> np.ndarray:
    """Render n_out frames via the native reference engine (same signature
    as harness.render_reference, plus optional extra schedule segments).
    ``seed_out``: pass a list to receive the engine's MINSTD state before
    rendering (needed to replicate rate < 0.5 renders, which consume
    random vertical-step draws — docs/WASM-ALGO.md step 7)."""
    audio = np.ascontiguousarray(audio, np.float32)
    channels = audio.shape[0]
    d = WorkletDriver(sample_rate, channels)
    d.configure(
        blockMs=block_ms, intervalMs=interval_ms, splitComputation=split_computation
    )
    d.add_buffers(list(audio))
    d.schedule(
        {
            "active": True, "input": 0.0, "output": 0.0, "rate": rate,
            "semitones": semitones, "tonalityHz": tonality_hz,
            "formantSemitones": formant_semitones,
            "formantCompensation": formant_compensation,
            "formantBaseHz": formant_base_hz,
        }
    )
    for s in schedules or []:
        d.schedule(dict(s))
    if seed_out is not None:
        seed_out.append(d.wasm.rng_state())
    out = np.zeros((channels, n_out), np.float32)
    q = np.zeros((channels, QUANTUM), np.float32)
    pos = 0
    while pos < n_out:
        d.process_quantum(q)
        n = min(QUANTUM, n_out - pos)
        out[:, pos : pos + n] = q[:, :n]
        pos += n
    return out
