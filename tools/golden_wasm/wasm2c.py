"""WASM-MVP -> C ahead-of-time translator.

This image has no node / wasmtime / PyPI, yet the BASELINE fidelity bound
(>=40 dB SNR) is defined against the reference's opaque WASM DSP blob
(reference: app/SignalsmithStretch.mjs:265, a ~64.5 KB Emscripten module
with 4 imports and 21 exports, :454-479).  So we execute the blob
ourselves: translate the binary to C, compile with gcc, drive via ctypes
(tools/golden_wasm/native.py).  Native speed makes golden renders cheap
enough to regenerate at will.

Scope: the WebAssembly MVP plus the extensions Emscripten emits by
default — sign-extension ops, saturating float->int truncation, bulk
memory (memory.copy/fill), and typed ``select``.  No SIMD, threads,
reference types beyond funcref tables, or multi-value (the translator
asserts these are absent rather than miscompiling).

Translation style (classic wasm2c): one flat C function per wasm function,
structured control flow lowered to labels + gotos (legal in C — block
results live in pre-declared variables, so no initializer is ever jumped
over), every stack push materialized as a temp.  gcc -O2 recovers the
expression trees.  Traps (OOB, div-by-zero, unreachable) longjmp back to
the export wrapper, which reports failure through ``wasm_trap_code``.
"""

from __future__ import annotations

import struct

__all__ = ["parse_module", "translate", "Module"]

# ----------------------------------------------------------------- binary IO

VALTYPE = {0x7F: "i32", 0x7E: "i64", 0x7D: "f32", 0x7C: "f64"}
CTYPE = {"i32": "uint32_t", "i64": "uint64_t", "f32": "float", "f64": "double"}


class Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def u8(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def bytes(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def leb_u(self) -> int:
        r = s = 0
        while True:
            b = self.u8()
            r |= (b & 0x7F) << s
            s += 7
            if not (b & 0x80):
                return r

    def leb_s(self) -> int:
        r = s = 0
        while True:
            b = self.u8()
            r |= (b & 0x7F) << s
            s += 7
            if not (b & 0x80):
                if b & 0x40:
                    r -= 1 << s
                return r

    def f32(self) -> bytes:
        return self.bytes(4)

    def f64(self) -> bytes:
        return self.bytes(8)

    def name(self) -> str:
        return self.bytes(self.leb_u()).decode()

    def valtype(self) -> str:
        t = self.u8()
        if t not in VALTYPE:
            raise NotImplementedError(f"valtype {hex(t)} (SIMD/ref types unsupported)")
        return VALTYPE[t]


class Module:
    def __init__(self):
        self.types: list[tuple[list[str], list[str]]] = []
        self.import_funcs: list[tuple[str, str, int]] = []  # (mod, name, typeidx)
        self.func_types: list[int] = []  # defined funcs
        self.table_limits: tuple[int, int | None] | None = None
        self.mem_limits: tuple[int, int | None] | None = None
        self.globals: list[tuple[str, bool, tuple]] = []  # (valtype, mut, init const)
        self.exports: list[tuple[str, int, int]] = []  # (name, kind, idx)
        self.start: int | None = None
        self.elems: list[tuple[int, list[int]]] = []  # (offset const, func idxs)
        self.codes: list[tuple[list[str], bytes]] = []  # (locals flattened, body)
        self.datas: list[tuple[int, bytes]] = []  # (offset, bytes)

    def functype(self, fidx: int) -> tuple[list[str], list[str]]:
        n_imp = len(self.import_funcs)
        ti = self.import_funcs[fidx][2] if fidx < n_imp else self.func_types[fidx - n_imp]
        return self.types[ti]


def _limits(r: Reader) -> tuple[int, int | None]:
    flags = r.u8()
    mn = r.leb_u()
    mx = r.leb_u() if flags & 1 else None
    return mn, mx


def _const_expr(r: Reader) -> tuple:
    """Parse a constant initializer expression: (kind, value)."""
    op = r.u8()
    if op == 0x41:
        v = ("i32", r.leb_s() & 0xFFFFFFFF)
    elif op == 0x42:
        v = ("i64", r.leb_s() & 0xFFFFFFFFFFFFFFFF)
    elif op == 0x43:
        v = ("f32", r.f32())
    elif op == 0x44:
        v = ("f64", r.f64())
    elif op == 0x23:
        v = ("global", r.leb_u())
    else:
        raise NotImplementedError(f"const expr opcode {hex(op)}")
    end = r.u8()
    assert end == 0x0B, "malformed const expr"
    return v


def parse_module(data: bytes) -> Module:
    assert data[:8] == b"\x00asm\x01\x00\x00\x00", "not a wasm v1 module"
    m = Module()
    r = Reader(data, 8)
    while r.pos < len(data):
        sid = r.u8()
        size = r.leb_u()
        end = r.pos + size
        if sid == 1:  # types
            for _ in range(r.leb_u()):
                form = r.u8()
                assert form == 0x60, "non-func type"
                params = [r.valtype() for _ in range(r.leb_u())]
                results = [r.valtype() for _ in range(r.leb_u())]
                assert len(results) <= 1, "multi-value unsupported"
                m.types.append((params, results))
        elif sid == 2:  # imports
            for _ in range(r.leb_u()):
                mod, nm = r.name(), r.name()
                kind = r.u8()
                if kind == 0:
                    m.import_funcs.append((mod, nm, r.leb_u()))
                else:
                    raise NotImplementedError("only function imports supported")
        elif sid == 3:
            m.func_types = [r.leb_u() for _ in range(r.leb_u())]
        elif sid == 4:
            n = r.leb_u()
            assert n <= 1
            if n:
                et = r.u8()
                assert et == 0x70, "only funcref tables"
                m.table_limits = _limits(r)
        elif sid == 5:
            n = r.leb_u()
            assert n <= 1
            if n:
                m.mem_limits = _limits(r)
        elif sid == 6:
            for _ in range(r.leb_u()):
                vt = r.valtype()
                mut = bool(r.u8())
                m.globals.append((vt, mut, _const_expr(r)))
        elif sid == 7:
            for _ in range(r.leb_u()):
                nm = r.name()
                kind = r.u8()
                m.exports.append((nm, kind, r.leb_u()))
        elif sid == 8:
            m.start = r.leb_u()
        elif sid == 9:
            for _ in range(r.leb_u()):
                flags = r.leb_u()
                assert flags == 0, "only active elem segments"
                off = _const_expr(r)
                assert off[0] == "i32"
                m.elems.append((off[1], [r.leb_u() for _ in range(r.leb_u())]))
        elif sid == 10:
            for _ in range(r.leb_u()):
                body_size = r.leb_u()
                body_end = r.pos + body_size
                locs: list[str] = []
                for _ in range(r.leb_u()):
                    cnt = r.leb_u()
                    vt = r.valtype()
                    locs.extend([vt] * cnt)
                m.codes.append((locs, data[r.pos : body_end]))
                r.pos = body_end
        elif sid == 11:
            for _ in range(r.leb_u()):
                flags = r.leb_u()
                assert flags == 0, "only active data segments"
                off = _const_expr(r)
                assert off[0] == "i32"
                m.datas.append((off[1], r.bytes(r.leb_u())))
        # custom (0) / datacount (12): skip
        r.pos = end
    return m


# ------------------------------------------------------------- C translation

_PRELUDE = r"""
/* Generated by tools/golden_wasm/wasm2c.py — do not edit. */
#include <stdint.h>
#include <string.h>
#include <math.h>
#include <setjmp.h>
#include <stdlib.h>

#define WEXPORT __attribute__((visibility("default")))

static uint8_t *MEM = 0;
static uint32_t MEM_PAGES = 0;
static uint32_t MEM_MAX_PAGES = 32768; /* 2 GiB */
static jmp_buf TRAP_JMP;
static int TRAP_DEPTH = 0;
WEXPORT int32_t wasm_trap_code = 0; /* 0 = ok; set on trap */

static void trap(int code) {
    wasm_trap_code = code;
    if (TRAP_DEPTH) longjmp(TRAP_JMP, 1);
    abort();
}
/* trap codes: 1 unreachable, 2 oob memory, 3 div, 4 call_indirect,
   5 abort import, 6 trunc overflow, 7 oom */

static inline void *mptr(uint64_t ea, uint32_t n) {
    if (ea + n > (uint64_t)MEM_PAGES * 65536u) trap(2);
    return MEM + ea;
}
#define LD(ty, ea) ({ ty _v; memcpy(&_v, mptr((ea), sizeof(ty)), sizeof(ty)); _v; })

/* Store watchpoints: when wasm_store_hook is set, every store whose
   effective address falls in [wasm_watch_lo, wasm_watch_hi) reports
   (ea, size, raw bits) BEFORE the write lands.  Used to read memory-
   placement laws (e.g. the splitComputation=false ring layout) directly
   off an execution trace instead of hypothesis-testing them.  Zero
   overhead when unset (one predictable branch). */
typedef void (*wasm_store_cb)(uint64_t ea, uint32_t size, uint64_t bits);
WEXPORT wasm_store_cb wasm_store_hook = 0;
WEXPORT uint64_t wasm_watch_lo = 0;
WEXPORT uint64_t wasm_watch_hi = 0;

#define ST(ty, ea, v) do { ty _v = (v); uint64_t _ea = (uint64_t)(ea); \
    if (__builtin_expect(wasm_store_hook != 0, 0) \
        && _ea >= wasm_watch_lo && _ea < wasm_watch_hi) { \
        uint64_t _bits = 0; memcpy(&_bits, &_v, sizeof(ty)); \
        wasm_store_hook(_ea, (uint32_t)sizeof(ty), _bits); } \
    memcpy(mptr(_ea, sizeof(ty)), &_v, sizeof(ty)); } while (0)

/* Bulk-op watchpoints: memory.copy / memory.fill bypass ST, so they get
   their own hook (dst, src, n, is_fill) when the destination range
   intersects the watch window (src = fill byte for fills). */
typedef void (*wasm_bulk_cb)(uint64_t dst, uint64_t src, uint64_t n, int32_t is_fill);
WEXPORT wasm_bulk_cb wasm_bulk_hook = 0;
static inline void w2c_memcopy(uint64_t dst, uint64_t src, uint64_t n) {
    if (__builtin_expect(wasm_bulk_hook != 0, 0)
        && dst < wasm_watch_hi && dst + n > wasm_watch_lo)
        wasm_bulk_hook(dst, src, n, 0);
    memmove(mptr(dst, n), mptr(src, n), n);
}
static inline void w2c_memfill(uint64_t dst, uint32_t val, uint64_t n) {
    if (__builtin_expect(wasm_bulk_hook != 0, 0)
        && dst < wasm_watch_hi && dst + n > wasm_watch_lo)
        wasm_bulk_hook(dst, val, n, 1);
    memset(mptr(dst, n), (uint8_t)val, n);
}

static inline uint32_t rotl32(uint32_t x, uint32_t n) { n &= 31; return n ? (x << n) | (x >> (32 - n)) : x; }
static inline uint32_t rotr32(uint32_t x, uint32_t n) { n &= 31; return n ? (x >> n) | (x << (32 - n)) : x; }
static inline uint64_t rotl64(uint64_t x, uint64_t n) { n &= 63; return n ? (x << n) | (x >> (64 - n)) : x; }
static inline uint64_t rotr64(uint64_t x, uint64_t n) { n &= 63; return n ? (x >> n) | (x << (64 - n)) : x; }
static inline uint32_t clz32(uint32_t x) { return x ? (uint32_t)__builtin_clz(x) : 32; }
static inline uint32_t ctz32(uint32_t x) { return x ? (uint32_t)__builtin_ctz(x) : 32; }
static inline uint64_t clz64(uint64_t x) { return x ? (uint64_t)__builtin_clzll(x) : 64; }
static inline uint64_t ctz64(uint64_t x) { return x ? (uint64_t)__builtin_ctzll(x) : 64; }

static inline uint32_t div_s32(uint32_t a, uint32_t b) {
    int32_t sa = (int32_t)a, sb = (int32_t)b;
    if (sb == 0 || (sa == INT32_MIN && sb == -1)) trap(3);
    return (uint32_t)(sa / sb);
}
static inline uint32_t div_u32(uint32_t a, uint32_t b) { if (!b) trap(3); return a / b; }
static inline uint32_t rem_s32(uint32_t a, uint32_t b) {
    int32_t sa = (int32_t)a, sb = (int32_t)b;
    if (sb == 0) trap(3);
    if (sa == INT32_MIN && sb == -1) return 0;
    return (uint32_t)(sa % sb);
}
static inline uint32_t rem_u32(uint32_t a, uint32_t b) { if (!b) trap(3); return a % b; }
static inline uint64_t div_s64(uint64_t a, uint64_t b) {
    int64_t sa = (int64_t)a, sb = (int64_t)b;
    if (sb == 0 || (sa == INT64_MIN && sb == -1)) trap(3);
    return (uint64_t)(sa / sb);
}
static inline uint64_t div_u64(uint64_t a, uint64_t b) { if (!b) trap(3); return a / b; }
static inline uint64_t rem_s64(uint64_t a, uint64_t b) {
    int64_t sa = (int64_t)a, sb = (int64_t)b;
    if (sb == 0) trap(3);
    if (sa == INT64_MIN && sb == -1) return 0;
    return (uint64_t)(sa % sb);
}
static inline uint64_t rem_u64(uint64_t a, uint64_t b) { if (!b) trap(3); return a % b; }

/* wasm float min/max: NaN-propagating, -0 < +0 */
static inline float fmin32(float a, float b) {
    if (a != a) return a; if (b != b) return b;
    if (a == b) return signbit(a) ? a : b;
    return a < b ? a : b;
}
static inline float fmax32(float a, float b) {
    if (a != a) return a; if (b != b) return b;
    if (a == b) return signbit(a) ? b : a;
    return a > b ? a : b;
}
static inline double fmin64(double a, double b) {
    if (a != a) return a; if (b != b) return b;
    if (a == b) return signbit(a) ? a : b;
    return a < b ? a : b;
}
static inline double fmax64(double a, double b) {
    if (a != a) return a; if (b != b) return b;
    if (a == b) return signbit(a) ? b : a;
    return a > b ? a : b;
}

/* trapping float->int truncation */
static inline uint32_t trunc_s32_f32(float x) { if (!(x > -2147483904.0f && x < 2147483648.0f)) trap(6); return (uint32_t)(int32_t)x; }
static inline uint32_t trunc_u32_f32(float x) { if (!(x > -1.0f && x < 4294967296.0f)) trap(6); return (uint32_t)x; }
static inline uint32_t trunc_s32_f64(double x) { if (!(x > -2147483649.0 && x < 2147483648.0)) trap(6); return (uint32_t)(int32_t)x; }
static inline uint32_t trunc_u32_f64(double x) { if (!(x > -1.0 && x < 4294967296.0)) trap(6); return (uint32_t)x; }
static inline uint64_t trunc_s64_f32(float x) { if (!(x >= -9223372036854775808.0f && x < 9223372036854775808.0f)) trap(6); return (uint64_t)(int64_t)x; }
static inline uint64_t trunc_u64_f32(float x) { if (!(x > -1.0f && x < 18446744073709551616.0f)) trap(6); return (uint64_t)x; }
static inline uint64_t trunc_s64_f64(double x) { if (!(x >= -9223372036854775808.0 && x < 9223372036854775808.0)) trap(6); return (uint64_t)(int64_t)x; }
static inline uint64_t trunc_u64_f64(double x) { if (!(x > -1.0 && x < 18446744073709551616.0)) trap(6); return (uint64_t)x; }

/* saturating truncation (0xFC 0..7) */
static inline uint32_t sat_s32_f32(float x) { if (x != x) return 0; if (x <= -2147483648.0f) return 0x80000000u; if (x >= 2147483648.0f) return 0x7fffffffu; return (uint32_t)(int32_t)x; }
static inline uint32_t sat_u32_f32(float x) { if (x != x || x <= -1.0f) return 0; if (x >= 4294967296.0f) return 0xffffffffu; return (uint32_t)x; }
static inline uint32_t sat_s32_f64(double x) { if (x != x) return 0; if (x <= -2147483649.0) return 0x80000000u; if (x >= 2147483648.0) return 0x7fffffffu; return (uint32_t)(int32_t)x; }
static inline uint32_t sat_u32_f64(double x) { if (x != x || x <= -1.0) return 0; if (x >= 4294967296.0) return 0xffffffffu; return (uint32_t)x; }
static inline uint64_t sat_s64_f32(float x) { if (x != x) return 0; if (x < -9223372036854775808.0f) return 0x8000000000000000ull; if (x >= 9223372036854775808.0f) return 0x7fffffffffffffffull; return (uint64_t)(int64_t)x; }
static inline uint64_t sat_u64_f32(float x) { if (x != x || x <= -1.0f) return 0; if (x >= 18446744073709551616.0f) return 0xffffffffffffffffull; return (uint64_t)x; }
static inline uint64_t sat_s64_f64(double x) { if (x != x) return 0; if (x < -9223372036854775808.0) return 0x8000000000000000ull; if (x >= 9223372036854775808.0) return 0x7fffffffffffffffull; return (uint64_t)(int64_t)x; }
static inline uint64_t sat_u64_f64(double x) { if (x != x || x <= -1.0) return 0; if (x >= 18446744073709551616.0) return 0xffffffffffffffffull; return (uint64_t)x; }

static inline uint32_t reint_f32(float x) { uint32_t v; memcpy(&v, &x, 4); return v; }
static inline float reint_i32(uint32_t x) { float v; memcpy(&v, &x, 4); return v; }
static inline uint64_t reint_f64(double x) { uint64_t v; memcpy(&v, &x, 8); return v; }
static inline double reint_i64(uint64_t x) { double v; memcpy(&v, &x, 8); return v; }

static uint32_t mem_grow(uint32_t delta) {
    uint64_t want = (uint64_t)MEM_PAGES + delta;
    if (want > MEM_MAX_PAGES) return 0xffffffffu;
    uint8_t *p = realloc(MEM, want * 65536u);
    if (!p && want) return 0xffffffffu;
    memset(p + (uint64_t)MEM_PAGES * 65536u, 0, (uint64_t)delta * 65536u);
    MEM = p;
    uint32_t old = MEM_PAGES;
    MEM_PAGES = (uint32_t)want;
    return old;
}

/* ---- Emscripten/WASI import shims (reference glue :454-459) ---- */
static void imp_abort_js(void) { trap(5); }
static void imp_memcpy_js(uint32_t dest, uint32_t src, uint32_t num) {
    if (__builtin_expect(wasm_bulk_hook != 0, 0)
        && dest < wasm_watch_hi && (uint64_t)dest + num > wasm_watch_lo)
        wasm_bulk_hook(dest, src, num, 0);
    memmove(mptr(dest, num), mptr(src, num), num);
}
static uint32_t imp_resize_heap(uint32_t requested) {
    uint64_t pages = ((uint64_t)requested + 65535u) / 65536u;
    if (pages > MEM_MAX_PAGES) return 0;
    if (pages > MEM_PAGES && mem_grow((uint32_t)(pages - MEM_PAGES)) == 0xffffffffu) return 0;
    return 1;
}
static uint64_t RNG_STATE = 0x9E3779B97F4A7C15ull; /* deterministic: golden renders must be reproducible */
static uint32_t imp_random_get(uint32_t buf, uint32_t len) {
    for (uint32_t i = 0; i < len; i++) {
        RNG_STATE ^= RNG_STATE << 13; RNG_STATE ^= RNG_STATE >> 7; RNG_STATE ^= RNG_STATE << 17;
        *(uint8_t *)mptr(buf + i, 1) = (uint8_t)RNG_STATE;
    }
    return 0;
}
"""


class FuncEmitter:
    """Emit one wasm function body as flat C (labels + gotos)."""

    def __init__(self, mod: Module, fidx: int, c: "CEmitter"):
        self.m = mod
        self.c = c
        self.fidx = fidx
        n_imp = len(mod.import_funcs)
        self.params, self.results = mod.functype(fidx)
        self.local_types = list(self.params) + list(mod.codes[fidx - n_imp][0])
        self.body = mod.codes[fidx - n_imp][1]
        self.lines: list[str] = []
        self.stack: list[tuple[str, str]] = []  # (valtype, c-expr/var)
        self.tmp = 0
        self.label = 0
        # frame: dict(kind, label, results, result_vars, param_vars,
        #             snapshot, dead_entry)
        self.frames: list[dict] = []
        self.dead = False

    # ------------------------------------------------------------- plumbing
    def out(self, s: str) -> None:
        if not self.dead:
            self.lines.append("  " + s)

    def push(self, vt: str, expr: str) -> None:
        """Push a *pure* expression lazily (folded into its consumer).

        Purity caveats are handled by flush(): any side-effecting event
        (store, call, local/global mutation, memory growth, control flow)
        materializes all pending expressions first, so loads and
        local/global reads can safely stay symbolic in between.
        """
        if self.dead:
            return
        self.stack.append((vt, expr))

    def push_forced(self, vt: str, expr: str) -> None:
        """Materialize immediately (for impure producers like calls)."""
        if self.dead:
            return
        v = f"t{self.tmp}"
        self.tmp += 1
        self.lines.append(f"  {CTYPE[vt]} {v} = {expr};")
        self.stack.append((vt, v))

    _SIMPLE = None  # compiled regex cache

    def flush(self) -> None:
        """Materialize every pending stack expression into a temp, in order
        (preserves evaluation order across side-effect boundaries)."""
        if self.dead:
            return
        import re

        if FuncEmitter._SIMPLE is None:
            # only single-assignment names are stable across side effects:
            # temps (t) and block-result vars (b). Locals (v) and globals
            # (g) mutate, so pending reads of them must be copied out.
            FuncEmitter._SIMPLE = re.compile(r"^[tb][0-9_]+$|^[0-9]+u(ll)?$")
        for i, (vt, expr) in enumerate(self.stack):
            if FuncEmitter._SIMPLE.match(expr):
                continue  # already a var or literal
            v = f"t{self.tmp}"
            self.tmp += 1
            self.lines.append(f"  {CTYPE[vt]} {v} = {expr};")
            self.stack[i] = (vt, v)

    def pop(self) -> tuple[str, str]:
        if self.dead:
            return ("i32", "0")
        return self.stack.pop()

    def pop_v(self) -> str:
        return self.pop()[1]

    def new_label(self) -> int:
        self.label += 1
        return self.label

    def newvars(self, types: list[str], prefix: str) -> list[str]:
        vs = []
        for i, vt in enumerate(types):
            v = f"{prefix}_{self.tmp}_{i}"
            self.lines.append(f"  {CTYPE[vt]} {v};")
            vs.append(v)
        self.tmp += 1
        return vs

    # --------------------------------------------------------- control flow
    def block_type(self, r: Reader) -> tuple[list[str], list[str]]:
        # s33: 0x40 empty | valtype | type index
        b = r.data[r.pos]
        if b == 0x40:
            r.pos += 1
            return [], []
        if b in VALTYPE:
            r.pos += 1
            return [], [VALTYPE[b]]
        ti = r.leb_s()
        assert ti >= 0
        return self.m.types[ti]

    def enter_frame(self, kind: str, params: list[str], results: list[str]) -> dict:
        lbl = self.new_label()
        f = {
            "kind": kind,
            "label": lbl,
            "params": params,
            "results": results,
            "result_vars": [],
            "param_vars": [],
            "dead_entry": self.dead,
            "else_label": None,
        }
        if not self.dead:
            f["result_vars"] = self.newvars(results, "b")
            if kind == "loop":
                # loop branch targets receive the params (phi vars)
                f["param_vars"] = self.newvars(params, "p")
                args = [self.pop_v() for _ in params][::-1]
                for pv, a in zip(f["param_vars"], args):
                    self.lines.append(f"  {pv} = {a};")
                for vt, pv in zip(params, f["param_vars"]):
                    self.stack.append((vt, pv))
                self.lines.append(f"L{lbl}_start:;")
            f["snapshot"] = list(self.stack)
        else:
            f["snapshot"] = []
        self.frames.append(f)
        return f

    def branch(self, depth: int) -> None:
        """Emit the goto for a br to the frame `depth` levels up."""
        if self.dead:
            return
        f = self.frames[-1 - depth]
        if f["kind"] == "loop":
            vals = [self.stack[-(i + 1)][1] for i in range(len(f["params"]))][::-1]
            for pv, v in zip(f["param_vars"], vals):
                self.lines.append(f"  {pv} = {v};")
            self.lines.append(f"  goto L{f['label']}_start;")
        else:
            vals = [self.stack[-(i + 1)][1] for i in range(len(f["results"]))][::-1]
            for rv, v in zip(f["result_vars"], vals):
                self.lines.append(f"  {rv} = {v};")
            self.lines.append(f"  goto L{f['label']}_end;")

    def emit_return(self) -> None:
        if self.dead:
            return
        if self.results:
            self.lines.append(f"  return {self.stack[-1][1]};")
        else:
            self.lines.append("  return;")

    # --------------------------------------------------------------- opcodes
    def run(self) -> str:
        m, r = self.m, Reader(self.body)
        n_imp = len(m.import_funcs)
        # function pseudo-frame
        self.frames.append(
            {
                "kind": "func",
                "label": self.new_label(),
                "params": [],
                "results": list(self.results),
                "result_vars": self.newvars(self.results, "b"),
                "param_vars": [],
                "snapshot": [],
                "dead_entry": False,
                "else_label": None,
            }
        )

        while True:
            op = r.u8()
            if op == 0x00:  # unreachable
                self.out("trap(1);")
                self.dead = True
            elif op == 0x01:  # nop
                pass
            elif op in (0x02, 0x03):  # block / loop
                params, results = self.block_type(r)
                self.flush()
                self.enter_frame("block" if op == 0x02 else "loop", params, results)
            elif op == 0x04:  # if
                params, results = self.block_type(r)
                self.flush()
                cond = self.pop_v()
                f = self.enter_frame("if", params, results)
                if not self.dead:
                    f["else_label"] = self.new_label()
                    # snapshot must exclude the cond (popped) but include params
                    f["snapshot"] = list(self.stack)
                    self.lines.append(f"  if (!({cond})) goto L{f['else_label']}_else;")
            elif op == 0x05:  # else
                f = self.frames[-1]
                if not f["dead_entry"]:
                    if not self.dead:
                        vals = [self.pop_v() for _ in f["results"]][::-1]
                        for rv, v in zip(f["result_vars"], vals):
                            self.lines.append(f"  {rv} = {v};")
                        self.lines.append(f"  goto L{f['label']}_end;")
                    self.dead = False
                    self.stack = list(f["snapshot"])
                    self.lines.append(f"L{f['else_label']}_else:;")
                    f["else_label"] = None
            elif op == 0x0B:  # end
                f = self.frames.pop()
                if not self.frames:  # end of function
                    if not f["dead_entry"]:
                        if not self.dead:
                            vals = [self.pop_v() for _ in f["results"]][::-1]
                            for rv, v in zip(f["result_vars"], vals):
                                self.lines.append(f"  {rv} = {v};")
                        self.dead = False
                        self.lines.append(f"L{f['label']}_end:;")
                        if f["results"]:
                            self.lines.append(f"  return {f['result_vars'][0]};")
                        else:
                            self.lines.append("  return;")
                    break
                if not f["dead_entry"]:
                    if not self.dead:
                        vals = [self.pop_v() for _ in f["results"]][::-1]
                        for rv, v in zip(f["result_vars"], vals):
                            self.lines.append(f"  {rv} = {v};")
                    if f["else_label"] is not None:
                        # if with no else: params must flow to results
                        if not self.dead:
                            self.lines.append(f"  goto L{f['label']}_end;")
                        self.lines.append(f"L{f['else_label']}_else:;")
                        base = len(f["snapshot"]) - len(f["params"])
                        for rv, (vt, v) in zip(f["result_vars"], f["snapshot"][base:]):
                            self.lines.append(f"  {rv} = {v};")
                    self.dead = False
                    self.stack = f["snapshot"][: len(f["snapshot"]) - len(f["params"])]
                    self.lines.append(f"L{f['label']}_end:;")
                    for vt, rv in zip(f["results"], f["result_vars"]):
                        self.stack.append((vt, rv))
            elif op == 0x0C:  # br
                self.branch(r.leb_u())
                self.dead = True
            elif op == 0x0D:  # br_if
                depth = r.leb_u()
                cond = self.pop_v()
                if not self.dead:
                    lbl = self.new_label()
                    self.lines.append(f"  if (!({cond})) goto L{lbl}_skip;")
                    self.branch(depth)
                    self.lines.append(f"L{lbl}_skip:;")
            elif op == 0x0E:  # br_table
                depths = [r.leb_u() for _ in range(r.leb_u())]
                default = r.leb_u()
                sel = self.pop_v()
                if not self.dead:
                    self.lines.append(f"  switch ({sel}) {{")
                    for i, d in enumerate(depths):
                        self.lines.append(f"  case {i}:;")
                        self.branch(d)
                    self.lines.append("  default:;")
                    self.branch(default)
                    self.lines.append("  }")
                self.dead = True
            elif op == 0x0F:  # return
                self.emit_return()
                self.dead = True
            elif op == 0x10:  # call
                fi = r.leb_u()
                params, results = m.functype(fi)
                self.flush()
                args = [self.pop_v() for _ in params][::-1]
                callee = self.c.fname(fi)
                call = f"{callee}({', '.join(args)})"
                if results:
                    self.push_forced(results[0], call)
                else:
                    self.out(call + ";")
            elif op == 0x11:  # call_indirect
                ti = r.leb_u()
                tbl = r.u8()
                assert tbl == 0
                params, results = m.types[ti]
                self.flush()
                idx = self.pop_v()
                args = [self.pop_v() for _ in params][::-1]
                if not self.dead:
                    sig = self.c.sig_typedef(ti)
                    self.out(
                        f"if ({idx} >= TABLE_N || TABLE_TYPES[{idx}] != {ti}) trap(4);"
                    )
                    call = f"(({sig})TABLE[{idx}])({', '.join(args)})"
                    if results:
                        self.push_forced(results[0], call)
                    else:
                        self.out(call + ";")
            elif op == 0x1A:  # drop
                self.pop()
            elif op in (0x1B, 0x1C):  # select [typed]
                if op == 0x1C:
                    n = r.leb_u()
                    for _ in range(n):
                        r.valtype()
                cond = self.pop_v()
                vt2, b = self.pop()
                vt1, a = self.pop()
                self.push(vt1 if not self.dead else "i32", f"(({cond}) ? ({a}) : ({b}))")
            elif op == 0x20:  # local.get
                i = r.leb_u()
                # materialize a copy: a later local.set must not mutate
                # values still on the virtual stack
                self.push(self.local_types[i], f"v{i}")
            elif op == 0x21:  # local.set
                i = r.leb_u()
                self.flush()
                v = self.pop_v()
                self.out(f"v{i} = {v};")
            elif op == 0x22:  # local.tee
                i = r.leb_u()
                if not self.dead:
                    self.flush()
                    vt, v = self.stack[-1]
                    self.out(f"v{i} = {v};")
                    # keep the temp (not v{i}) on the stack: v{i} may be
                    # reassigned before this value is consumed
            elif op == 0x23:  # global.get
                i = r.leb_u()
                self.push(m.globals[i][0], f"g{i}")
            elif op == 0x24:  # global.set
                i = r.leb_u()
                self.flush()
                v = self.pop_v()
                self.out(f"g{i} = {v};")
            elif 0x28 <= op <= 0x3E:  # loads/stores
                r.leb_u()  # align
                offset = r.leb_u()
                self._memop(op, offset)
            elif op == 0x3F:  # memory.size
                r.u8()
                self.push("i32", "MEM_PAGES")
            elif op == 0x40:  # memory.grow
                r.u8()
                self.flush()
                d = self.pop_v()
                self.push_forced("i32", f"mem_grow({d})")
            elif op == 0x41:
                v = r.leb_s() & 0xFFFFFFFF
                self.push("i32", f"{v}u")
            elif op == 0x42:
                v = r.leb_s() & 0xFFFFFFFFFFFFFFFF
                self.push("i64", f"{v}ull")
            elif op == 0x43:
                (bits,) = struct.unpack("<I", r.f32())
                self.push("f32", f"reint_i32({bits}u)")
            elif op == 0x44:
                (bits,) = struct.unpack("<Q", r.f64())
                self.push("f64", f"reint_i64({bits}ull)")
            elif 0x45 <= op <= 0xC4:
                self._numeric(op)
            elif op == 0xFC:
                sub = r.leb_u()
                self._misc(sub, r)
            else:
                raise NotImplementedError(f"opcode {hex(op)} at func {self.fidx}")

        locals_decl = []
        n_params = len(self.params)
        for i, vt in enumerate(self.local_types[n_params:], start=n_params):
            locals_decl.append(f"  {CTYPE[vt]} v{i} = 0;")
        param_sig = ", ".join(
            f"{CTYPE[vt]} v{i}" for i, vt in enumerate(self.params)
        ) or "void"
        ret = CTYPE[self.results[0]] if self.results else "void"
        header = f"static {ret} {self.c.fname(self.fidx)}({param_sig}) {{"
        return "\n".join([header] + locals_decl + self.lines + ["}"])

    # ------------------------------------------------------------ memory ops
    def _memop(self, op: int, offset: int) -> None:
        loads = {
            0x28: ("i32", "uint32_t", ""),
            0x29: ("i64", "uint64_t", ""),
            0x2A: ("f32", "float", ""),
            0x2B: ("f64", "double", ""),
            0x2C: ("i32", "int8_t", "(uint32_t)(int32_t)"),
            0x2D: ("i32", "uint8_t", "(uint32_t)"),
            0x2E: ("i32", "int16_t", "(uint32_t)(int32_t)"),
            0x2F: ("i32", "uint16_t", "(uint32_t)"),
            0x30: ("i64", "int8_t", "(uint64_t)(int64_t)"),
            0x31: ("i64", "uint8_t", "(uint64_t)"),
            0x32: ("i64", "int16_t", "(uint64_t)(int64_t)"),
            0x33: ("i64", "uint16_t", "(uint64_t)"),
            0x34: ("i64", "int32_t", "(uint64_t)(int64_t)"),
            0x35: ("i64", "uint32_t", "(uint64_t)"),
        }
        stores = {
            0x36: ("uint32_t", ""),
            0x37: ("uint64_t", ""),
            0x38: ("float", ""),
            0x39: ("double", ""),
            0x3A: ("uint8_t", "(uint8_t)"),
            0x3B: ("uint16_t", "(uint16_t)"),
            0x3C: ("uint8_t", "(uint8_t)"),
            0x3D: ("uint16_t", "(uint16_t)"),
            0x3E: ("uint32_t", "(uint32_t)"),
        }
        if op in loads:
            vt, cty, cast = loads[op]
            base = self.pop_v()
            self.push(vt, f"{cast}LD({cty}, (uint64_t){base} + {offset}u)")
        else:
            cty, cast = stores[op]
            self.flush()
            val = self.pop_v()
            base = self.pop_v()
            self.out(f"ST({cty}, (uint64_t){base} + {offset}u, {cast}{val});")

    # ------------------------------------------------------------ numeric ops
    def _numeric(self, op: int) -> None:
        def un(vt_in, vt_out, fmt):
            a = self.pop_v()
            self.push(vt_out, fmt.format(a=a))

        def bin_(vt_in, vt_out, fmt):
            b = self.pop_v()
            a = self.pop_v()
            self.push(vt_out, fmt.format(a=a, b=b))

        T = {
            # i32 compare
            0x45: lambda: un("i32", "i32", "({a} == 0)"),
            0x46: lambda: bin_("i32", "i32", "({a} == {b})"),
            0x47: lambda: bin_("i32", "i32", "({a} != {b})"),
            0x48: lambda: bin_("i32", "i32", "((int32_t){a} < (int32_t){b})"),
            0x49: lambda: bin_("i32", "i32", "({a} < {b})"),
            0x4A: lambda: bin_("i32", "i32", "((int32_t){a} > (int32_t){b})"),
            0x4B: lambda: bin_("i32", "i32", "({a} > {b})"),
            0x4C: lambda: bin_("i32", "i32", "((int32_t){a} <= (int32_t){b})"),
            0x4D: lambda: bin_("i32", "i32", "({a} <= {b})"),
            0x4E: lambda: bin_("i32", "i32", "((int32_t){a} >= (int32_t){b})"),
            0x4F: lambda: bin_("i32", "i32", "({a} >= {b})"),
            # i64 compare
            0x50: lambda: un("i64", "i32", "({a} == 0)"),
            0x51: lambda: bin_("i64", "i32", "({a} == {b})"),
            0x52: lambda: bin_("i64", "i32", "({a} != {b})"),
            0x53: lambda: bin_("i64", "i32", "((int64_t){a} < (int64_t){b})"),
            0x54: lambda: bin_("i64", "i32", "({a} < {b})"),
            0x55: lambda: bin_("i64", "i32", "((int64_t){a} > (int64_t){b})"),
            0x56: lambda: bin_("i64", "i32", "({a} > {b})"),
            0x57: lambda: bin_("i64", "i32", "((int64_t){a} <= (int64_t){b})"),
            0x58: lambda: bin_("i64", "i32", "({a} <= {b})"),
            0x59: lambda: bin_("i64", "i32", "((int64_t){a} >= (int64_t){b})"),
            0x5A: lambda: bin_("i64", "i32", "({a} >= {b})"),
            # f32 compare
            0x5B: lambda: bin_("f32", "i32", "({a} == {b})"),
            0x5C: lambda: bin_("f32", "i32", "({a} != {b})"),
            0x5D: lambda: bin_("f32", "i32", "({a} < {b})"),
            0x5E: lambda: bin_("f32", "i32", "({a} > {b})"),
            0x5F: lambda: bin_("f32", "i32", "({a} <= {b})"),
            0x60: lambda: bin_("f32", "i32", "({a} >= {b})"),
            # f64 compare
            0x61: lambda: bin_("f64", "i32", "({a} == {b})"),
            0x62: lambda: bin_("f64", "i32", "({a} != {b})"),
            0x63: lambda: bin_("f64", "i32", "({a} < {b})"),
            0x64: lambda: bin_("f64", "i32", "({a} > {b})"),
            0x65: lambda: bin_("f64", "i32", "({a} <= {b})"),
            0x66: lambda: bin_("f64", "i32", "({a} >= {b})"),
            # i32 arith
            0x67: lambda: un("i32", "i32", "clz32({a})"),
            0x68: lambda: un("i32", "i32", "ctz32({a})"),
            0x69: lambda: un("i32", "i32", "(uint32_t)__builtin_popcount({a})"),
            0x6A: lambda: bin_("i32", "i32", "({a} + {b})"),
            0x6B: lambda: bin_("i32", "i32", "({a} - {b})"),
            0x6C: lambda: bin_("i32", "i32", "({a} * {b})"),
            0x6D: lambda: bin_("i32", "i32", "div_s32({a}, {b})"),
            0x6E: lambda: bin_("i32", "i32", "div_u32({a}, {b})"),
            0x6F: lambda: bin_("i32", "i32", "rem_s32({a}, {b})"),
            0x70: lambda: bin_("i32", "i32", "rem_u32({a}, {b})"),
            0x71: lambda: bin_("i32", "i32", "({a} & {b})"),
            0x72: lambda: bin_("i32", "i32", "({a} | {b})"),
            0x73: lambda: bin_("i32", "i32", "({a} ^ {b})"),
            0x74: lambda: bin_("i32", "i32", "({a} << ({b} & 31))"),
            0x75: lambda: bin_("i32", "i32", "(uint32_t)((int32_t){a} >> ({b} & 31))"),
            0x76: lambda: bin_("i32", "i32", "({a} >> ({b} & 31))"),
            0x77: lambda: bin_("i32", "i32", "rotl32({a}, {b})"),
            0x78: lambda: bin_("i32", "i32", "rotr32({a}, {b})"),
            # i64 arith
            0x79: lambda: un("i64", "i64", "clz64({a})"),
            0x7A: lambda: un("i64", "i64", "ctz64({a})"),
            0x7B: lambda: un("i64", "i64", "(uint64_t)__builtin_popcountll({a})"),
            0x7C: lambda: bin_("i64", "i64", "({a} + {b})"),
            0x7D: lambda: bin_("i64", "i64", "({a} - {b})"),
            0x7E: lambda: bin_("i64", "i64", "({a} * {b})"),
            0x7F: lambda: bin_("i64", "i64", "div_s64({a}, {b})"),
            0x80: lambda: bin_("i64", "i64", "div_u64({a}, {b})"),
            0x81: lambda: bin_("i64", "i64", "rem_s64({a}, {b})"),
            0x82: lambda: bin_("i64", "i64", "rem_u64({a}, {b})"),
            0x83: lambda: bin_("i64", "i64", "({a} & {b})"),
            0x84: lambda: bin_("i64", "i64", "({a} | {b})"),
            0x85: lambda: bin_("i64", "i64", "({a} ^ {b})"),
            0x86: lambda: bin_("i64", "i64", "({a} << ({b} & 63))"),
            0x87: lambda: bin_("i64", "i64", "(uint64_t)((int64_t){a} >> ({b} & 63))"),
            0x88: lambda: bin_("i64", "i64", "({a} >> ({b} & 63))"),
            0x89: lambda: bin_("i64", "i64", "rotl64({a}, {b})"),
            0x8A: lambda: bin_("i64", "i64", "rotr64({a}, {b})"),
            # f32 arith
            0x8B: lambda: un("f32", "f32", "fabsf({a})"),
            0x8C: lambda: un("f32", "f32", "(-{a})"),
            0x8D: lambda: un("f32", "f32", "ceilf({a})"),
            0x8E: lambda: un("f32", "f32", "floorf({a})"),
            0x8F: lambda: un("f32", "f32", "truncf({a})"),
            0x90: lambda: un("f32", "f32", "rintf({a})"),
            0x91: lambda: un("f32", "f32", "sqrtf({a})"),
            0x92: lambda: bin_("f32", "f32", "({a} + {b})"),
            0x93: lambda: bin_("f32", "f32", "({a} - {b})"),
            0x94: lambda: bin_("f32", "f32", "({a} * {b})"),
            0x95: lambda: bin_("f32", "f32", "({a} / {b})"),
            0x96: lambda: bin_("f32", "f32", "fmin32({a}, {b})"),
            0x97: lambda: bin_("f32", "f32", "fmax32({a}, {b})"),
            0x98: lambda: bin_("f32", "f32", "copysignf({a}, {b})"),
            # f64 arith
            0x99: lambda: un("f64", "f64", "fabs({a})"),
            0x9A: lambda: un("f64", "f64", "(-{a})"),
            0x9B: lambda: un("f64", "f64", "ceil({a})"),
            0x9C: lambda: un("f64", "f64", "floor({a})"),
            0x9D: lambda: un("f64", "f64", "trunc({a})"),
            0x9E: lambda: un("f64", "f64", "rint({a})"),
            0x9F: lambda: un("f64", "f64", "sqrt({a})"),
            0xA0: lambda: bin_("f64", "f64", "({a} + {b})"),
            0xA1: lambda: bin_("f64", "f64", "({a} - {b})"),
            0xA2: lambda: bin_("f64", "f64", "({a} * {b})"),
            0xA3: lambda: bin_("f64", "f64", "({a} / {b})"),
            0xA4: lambda: bin_("f64", "f64", "fmin64({a}, {b})"),
            0xA5: lambda: bin_("f64", "f64", "fmax64({a}, {b})"),
            0xA6: lambda: bin_("f64", "f64", "copysign({a}, {b})"),
            # conversions
            0xA7: lambda: un("i64", "i32", "(uint32_t){a}"),
            0xA8: lambda: un("f32", "i32", "trunc_s32_f32({a})"),
            0xA9: lambda: un("f32", "i32", "trunc_u32_f32({a})"),
            0xAA: lambda: un("f64", "i32", "trunc_s32_f64({a})"),
            0xAB: lambda: un("f64", "i32", "trunc_u32_f64({a})"),
            0xAC: lambda: un("i32", "i64", "(uint64_t)(int64_t)(int32_t){a}"),
            0xAD: lambda: un("i32", "i64", "(uint64_t){a}"),
            0xAE: lambda: un("f32", "i64", "trunc_s64_f32({a})"),
            0xAF: lambda: un("f32", "i64", "trunc_u64_f32({a})"),
            0xB0: lambda: un("f64", "i64", "trunc_s64_f64({a})"),
            0xB1: lambda: un("f64", "i64", "trunc_u64_f64({a})"),
            0xB2: lambda: un("i32", "f32", "(float)(int32_t){a}"),
            0xB3: lambda: un("i32", "f32", "(float){a}"),
            0xB4: lambda: un("i64", "f32", "(float)(int64_t){a}"),
            0xB5: lambda: un("i64", "f32", "(float){a}"),
            0xB6: lambda: un("f64", "f32", "(float){a}"),
            0xB7: lambda: un("i32", "f64", "(double)(int32_t){a}"),
            0xB8: lambda: un("i32", "f64", "(double){a}"),
            0xB9: lambda: un("i64", "f64", "(double)(int64_t){a}"),
            0xBA: lambda: un("i64", "f64", "(double){a}"),
            0xBB: lambda: un("f32", "f64", "(double){a}"),
            0xBC: lambda: un("f32", "i32", "reint_f32({a})"),
            0xBD: lambda: un("f64", "i64", "reint_f64({a})"),
            0xBE: lambda: un("i32", "f32", "reint_i32({a})"),
            0xBF: lambda: un("i64", "f64", "reint_i64({a})"),
            # sign extension
            0xC0: lambda: un("i32", "i32", "(uint32_t)(int32_t)(int8_t){a}"),
            0xC1: lambda: un("i32", "i32", "(uint32_t)(int32_t)(int16_t){a}"),
            0xC2: lambda: un("i64", "i64", "(uint64_t)(int64_t)(int8_t){a}"),
            0xC3: lambda: un("i64", "i64", "(uint64_t)(int64_t)(int16_t){a}"),
            0xC4: lambda: un("i64", "i64", "(uint64_t)(int64_t)(int32_t){a}"),
        }
        if op not in T:
            raise NotImplementedError(f"numeric opcode {hex(op)}")
        T[op]()

    def _misc(self, sub: int, r: Reader) -> None:
        sat = {
            0: ("f32", "i32", "sat_s32_f32"),
            1: ("f32", "i32", "sat_u32_f32"),
            2: ("f64", "i32", "sat_s32_f64"),
            3: ("f64", "i32", "sat_u32_f64"),
            4: ("f32", "i64", "sat_s64_f32"),
            5: ("f32", "i64", "sat_u64_f32"),
            6: ("f64", "i64", "sat_s64_f64"),
            7: ("f64", "i64", "sat_u64_f64"),
        }
        if sub in sat:
            _, out_t, fn = sat[sub]
            a = self.pop_v()
            self.push(out_t, f"{fn}({a})")
        elif sub == 10:  # memory.copy
            r.u8()
            r.u8()
            self.flush()
            n = self.pop_v()
            src = self.pop_v()
            dst = self.pop_v()
            self.out(f"w2c_memcopy((uint64_t){dst}, (uint64_t){src}, (uint64_t){n});")
        elif sub == 11:  # memory.fill
            r.u8()
            self.flush()
            n = self.pop_v()
            val = self.pop_v()
            dst = self.pop_v()
            self.out(f"w2c_memfill((uint64_t){dst}, (uint32_t){val}, (uint64_t){n});")
        else:
            raise NotImplementedError(f"0xFC subopcode {sub}")


class CEmitter:
    def __init__(self, mod: Module):
        self.m = mod
        self._sigs: dict[int, str] = {}
        self._sig_defs: list[str] = []

    def fname(self, fidx: int) -> str:
        n_imp = len(self.m.import_funcs)
        if fidx < n_imp:
            mod, nm, _ = self.m.import_funcs[fidx]
            shims = {
                ("a", "a"): "imp_random_get",
                ("a", "b"): "imp_resize_heap",
                ("a", "c"): "imp_memcpy_js",
                ("a", "d"): "imp_abort_js",
            }
            if (mod, nm) not in shims:
                raise NotImplementedError(f"unknown import {mod}.{nm}")
            return shims[(mod, nm)]
        return f"f{fidx}"

    def sig_typedef(self, ti: int) -> str:
        if ti not in self._sigs:
            params, results = self.m.types[ti]
            name = f"sig{ti}_t"
            ret = CTYPE[results[0]] if results else "void"
            args = ", ".join(CTYPE[p] for p in params) or "void"
            self._sig_defs.append(f"typedef {ret} (*{name})({args});")
            self._sigs[ti] = name
        return self._sigs[ti]

    def emit(self) -> str:
        m = self.m
        parts = [_PRELUDE]
        n_imp = len(m.import_funcs)

        # globals
        for i, (vt, mut, init) in enumerate(m.globals):
            kind, val = init
            if kind == "i32":
                expr = f"{val}u"
            elif kind == "i64":
                expr = f"{val}ull"
            elif kind == "f32":
                (bits,) = struct.unpack("<I", val)
                expr = f"reint_i32({bits}u)"  # not constant-foldable; init at runtime
                parts.append(f"static {CTYPE[vt]} g{i};")
                continue
            elif kind == "f64":
                (bits,) = struct.unpack("<Q", val)
                parts.append(f"static {CTYPE[vt]} g{i};")
                continue
            else:
                raise NotImplementedError("global-ref initializers")
            parts.append(f"static {CTYPE[vt]} g{i} = {expr};")

        # table
        tn = m.table_limits[0] if m.table_limits else 0
        parts.append(f"#define TABLE_N {max(tn, 1)}")
        parts.append("static void *TABLE[TABLE_N];")
        parts.append("static uint32_t TABLE_TYPES[TABLE_N] = { [0 ... TABLE_N-1] = 0xffffffffu };")

        # function prototypes
        protos = []
        for fidx in range(n_imp, n_imp + len(m.func_types)):
            params, results = m.functype(fidx)
            ret = CTYPE[results[0]] if results else "void"
            args = ", ".join(CTYPE[p] for p in params) or "void"
            protos.append(f"static {ret} f{fidx}({args});")
        parts.extend(protos)

        # bodies (also populates call_indirect typedefs)
        bodies = []
        for fidx in range(n_imp, n_imp + len(m.func_types)):
            bodies.append(FuncEmitter(m, fidx, self).run())
        parts.extend(self._sig_defs)
        parts.extend(bodies)

        # data segments
        for i, (off, blob) in enumerate(m.datas):
            hexed = ",".join(str(b) for b in blob)
            parts.append(f"static const uint8_t DATA{i}[{max(len(blob),1)}] = {{{hexed}}};")

        # init
        init_lines = [
            "WEXPORT int wasm_init(void) {",
            "  if (MEM) { free(MEM); MEM = 0; MEM_PAGES = 0; }",
        ]
        if m.mem_limits:
            mn, mx = m.mem_limits
            if mx:
                init_lines.append(f"  MEM_MAX_PAGES = {mx}u;")
            init_lines.append(f"  if (mem_grow({mn}u) == 0xffffffffu) return -1;")
        for i, (vt, mut, init) in enumerate(m.globals):
            kind, val = init
            if kind == "f32":
                (bits,) = struct.unpack("<I", val)
                init_lines.append(f"  g{i} = reint_i32({bits}u);")
            elif kind == "f64":
                (bits,) = struct.unpack("<Q", val)
                init_lines.append(f"  g{i} = reint_i64({bits}ull);")
        for i, (off, blob) in enumerate(m.datas):
            init_lines.append(f"  memcpy(mptr({off}u, {len(blob)}u), DATA{i}, {len(blob)}u);")
        for off, idxs in m.elems:
            for k, fi in enumerate(idxs):
                ti = (
                    m.import_funcs[fi][2]
                    if fi < n_imp
                    else m.func_types[fi - n_imp]
                )
                init_lines.append(f"  TABLE[{off + k}u] = (void *)&{self.fname(fi)};")
                init_lines.append(f"  TABLE_TYPES[{off + k}u] = {ti}u;")
        if m.start is not None:
            init_lines.append(f"  {self.fname(m.start)}();")
        init_lines.append("  wasm_trap_code = 0;")
        init_lines.append("  return 0;")
        init_lines.append("}")
        parts.append("\n".join(init_lines))

        # memory accessors for the ctypes host
        parts.append(
            "WEXPORT uint8_t *wasm_mem_ptr(void) { return MEM; }\n"
            "WEXPORT uint32_t wasm_mem_size(void) { return MEM_PAGES * 65536u; }"
        )

        # export wrappers with trap guard
        for nm, kind, idx in m.exports:
            if kind != 0:
                continue
            params, results = m.functype(idx)
            ret = CTYPE[results[0]] if results else "void"
            args = ", ".join(f"{CTYPE[p]} a{i}" for i, p in enumerate(params)) or "void"
            call_args = ", ".join(f"a{i}" for i in range(len(params)))
            body = [
                f"WEXPORT {ret} wx_{nm}({args}) {{",
                "  wasm_trap_code = 0;",
                "  TRAP_DEPTH = 1;",
                "  if (setjmp(TRAP_JMP)) { TRAP_DEPTH = 0; "
                + ("return 0; }" if results else "return; }"),
            ]
            if results:
                body.append(f"  {ret} r = {self.fname(idx)}({call_args});")
                body.append("  TRAP_DEPTH = 0;")
                body.append("  return r;")
            else:
                body.append(f"  {self.fname(idx)}({call_args});")
                body.append("  TRAP_DEPTH = 0;")
            body.append("}")
            parts.append("\n".join(body))

        return "\n".join(parts) + "\n"


def translate(wasm_bytes: bytes) -> str:
    return CEmitter(parse_module(wasm_bytes)).emit()


if __name__ == "__main__":
    import sys

    sys.stdout.write(translate(open(sys.argv[1], "rb").read()))
